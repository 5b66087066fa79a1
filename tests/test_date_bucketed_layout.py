"""Date-bucketed partition layout (scale posture, SURVEY.md §4): the
(exchange, symbol, timeframe) directory gains a ``dt=`` level so that
appends, the idempotent anti-join, compaction, and time-range reads all
prune to tail buckets — the unit of maintenance work becomes a bucket,
not all of history.
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.operators.ingest import (
    CandleDataset,
    project_ohlcv_rows,
)

DAY = 86_400_000
MIN = 60_000
# 2024-03-01T00:00:00Z, day-aligned
T0 = 1709251200000


def hourly_rows(n: int, t0: int = T0) -> list[list]:
    return [
        [t0 + i * 3600_000, 100.0 + i, 101.0 + i, 99.0 + i, 100.5 + i, 10.0]
        for i in range(n)
    ]


@pytest.fixture()
def ds(spark, tmp_path):
    return CandleDataset(spark, str(tmp_path / "candles"), date_bucket="day")


def _append(spark, ds, rows):
    return ds.append_idempotent(project_ohlcv_rows(spark, rows, "e", "S/X", "1h"))


def test_layout_has_dt_level_and_schema_is_unchanged(spark, ds):
    _append(spark, ds, hourly_rows(48))  # two days
    dirs = glob.glob(f"{ds.path}/exchange=e/symbol=SX/timeframe=1h/dt=*")
    assert sorted(d.rsplit("dt=", 1)[1] for d in dirs) == ["2024-03-01", "2024-03-02"]
    # logical schema identical to the legacy layout (dt is a layout detail)
    assert "dt" not in ds.read().columns
    assert ds.read().count() == 48


def test_idempotent_reappend_across_buckets(spark, ds):
    rows = hourly_rows(48)
    assert _append(spark, ds, rows) == 48
    assert _append(spark, ds, rows) == 0  # exact re-delivery is a no-op
    # overlap + new tail: only the genuinely new rows land
    assert _append(spark, ds, hourly_rows(24, T0 + 36 * 3600_000)) == 12
    assert ds.read().count() == 60


def test_time_range_read_prunes_dt_partitions(spark, ds):
    _append(spark, ds, hourly_rows(24 * 5))  # five day-buckets
    df = ds.read(since_ms=T0 + 3 * DAY, until_ms=T0 + 4 * DAY - 1)
    assert df.count() == 24
    plan = df._jdf.queryExecution().executedPlan().toString()
    # dt filter reached the scan's partition filters -> directory-level
    # prune (two of five buckets survive: >= rounds down to its bucket)
    assert "dt" in plan.split("PartitionFilters")[1].split("]")[0]


def test_bounded_compaction_leaves_old_buckets_untouched(spark, ds):
    import os

    rows = hourly_rows(24 * 3)
    for i in range(0, len(rows), 8):  # many small appends -> many files
        _append(spark, ds, rows[i : i + 8])
    day_glob = f"{ds.path}/exchange=e/symbol=SX/timeframe=1h/dt=2024-03-0{{}}/*.parquet"
    assert len(glob.glob(day_glob.format(1))) == 3
    old_files = {
        f: os.path.getmtime(f) for f in glob.glob(day_glob.format(1))
    }
    before = {r["timestamp"]: r for r in ds.read().collect()}

    # compact only from day 3 onward: day-1/day-2 files must not move
    assert ds.compact(since_ms=T0 + 2 * DAY) == 1
    assert {
        f: os.path.getmtime(f) for f in glob.glob(day_glob.format(1))
    } == old_files
    assert len(glob.glob(day_glob.format(3))) == 1  # tail bucket rewritten
    after = {r["timestamp"]: r for r in ds.read().collect()}
    assert before.keys() == after.keys()
    for k in before:
        assert before[k] == after[k]


def test_boundary_bucket_rewritten_whole(spark, ds):
    """since_ms mid-bucket rounds down: the boundary bucket keeps all
    its rows through the rewrite."""
    rows = hourly_rows(24 * 2)
    for i in range(0, len(rows), 8):
        _append(spark, ds, rows[i : i + 8])
    # mid-day-2 watermark: day-2 is the boundary bucket
    assert ds.compact(since_ms=T0 + DAY + 12 * 3600_000) == 1
    assert ds.read().count() == 48
    assert ds.read(since_ms=T0 + DAY, until_ms=T0 + 2 * DAY - 1).count() == 24


def test_resume_offset_and_legacy_parity(spark, ds, tmp_path):
    """Same logical contents as a legacy (unbucketed) dataset fed the
    same appends; resume offset agrees."""
    legacy = CandleDataset(spark, str(tmp_path / "legacy"))
    rows = hourly_rows(30)
    for chunk in (rows[:20], rows[15:]):  # overlapping appends
        _append(spark, ds, chunk)
        legacy.append_idempotent(project_ohlcv_rows(spark, chunk, "e", "S/X", "1h"))
    a = {tuple(r) for r in ds.read().collect()}
    b = {tuple(r) for r in legacy.read().collect()}
    assert a == b and len(a) == 30
    assert (
        ds.resume_offset("e", "S/X", "1h")
        == legacy.resume_offset("e", "S/X", "1h")
        == T0 + 29 * 3600_000
    )


def test_schema_evolution_merge_read(spark, tmp_path):
    """Dataset lifecycle: a column added by a later writer (e.g. trade
    count per candle) must not break readers of the mixed dataset —
    parquet mergeSchema unions the fields, old files read NULL for the
    new column. Pins the upgrade path for the candle schema."""
    from pyspark.sql import functions as F

    from ccxt_ohlcv_fetcher_spark.operators.ingest import (
        CandleDataset,
        project_ohlcv_rows,
    )

    ds = CandleDataset(spark, str(tmp_path / "c"))
    rows = hourly_rows(4)
    ds.append_idempotent(project_ohlcv_rows(spark, rows, "e", "S/X", "1h"))
    # later writer adds n_trades
    newer = project_ohlcv_rows(
        spark, hourly_rows(4, T0 + 4 * 3600_000), "e", "S/X", "1h"
    ).withColumn("n_trades", F.lit(17).cast("long"))
    ds.append_idempotent(newer)

    merged = spark.read.option("mergeSchema", True).parquet(ds.path)
    assert "n_trades" in merged.columns and merged.count() == 8
    by_ts = {r["timestamp"]: r["n_trades"] for r in merged.collect()}
    assert by_ts[T0] is None  # pre-evolution file -> NULL
    assert by_ts[T0 + 4 * 3600_000] == 17
