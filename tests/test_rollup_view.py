"""Incremental rollup maintenance (operators/rollup.py): incremental
refresh == full recompute, closed-bucket-only materialization, and
idempotent/no-op re-refresh — the continuous-aggregate invariants.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.operators.ingest import CandleDataset, project_ohlcv_rows
from ccxt_ohlcv_fetcher_spark.operators.resample import resample_candles
from ccxt_ohlcv_fetcher_spark.operators.rollup import MaterializedRollups

HOUR_ALIGNED_T0 = 1700000000 * 1000 - (1700000000 % 3600) * 1000
MIN = 60_000


DAY_ALIGNED_T0 = 1700000000000 - (1700000000000 % 86_400_000)


def grid(n: int, start: int = 0, base: float = 100.0, t0: int = HOUR_ALIGNED_T0) -> list[list]:
    return [
        [t0 + (start + i) * MIN, base + i, base + 1 + i, base - 1 + i, base + 0.5 + i, 10.0]
        for i in range(n)
    ]


@pytest.fixture()
def base(spark, tmp_path):
    ds = CandleDataset(spark, str(tmp_path / "base"))
    for sym, px in (("BTC/USD", 100.0), ("ETH/USD", 10.0)):
        # 2h30m of 1m candles: two closed hours + an open tail hour
        ds.append_idempotent(project_ohlcv_rows(spark, grid(150, base=px), "bitfinex", sym, "1m"))
    return ds


@pytest.fixture()
def rollups(spark, base, tmp_path):
    return MaterializedRollups(spark, base, str(tmp_path / "rollups"), levels=("1h",))


def _sorted_rows(df):
    return [
        tuple(r)
        for r in df.select("exchange", "symbol", "timestamp", "open", "high", "low", "close", "volume")
        .orderBy("exchange", "symbol", "timestamp")
        .collect()
    ]


def test_refresh_materializes_only_closed_buckets(spark, base, rollups):
    appended = rollups.refresh()
    assert appended == {"1h": 4}  # 2 closed hours x 2 symbols; open tail skipped
    got = rollups.read("1h")
    assert got.agg(F.max("timestamp")).collect()[0][0] == HOUR_ALIGNED_T0 + 3600_000
    # values match a from-scratch resample restricted to closed buckets
    expect = resample_candles(base.read(timeframe="1m"), "1h").filter(
        F.col("timestamp") < HOUR_ALIGNED_T0 + 2 * 3600_000
    )
    assert _sorted_rows(got) == _sorted_rows(expect)


def test_refresh_is_idempotent(spark, base, rollups):
    rollups.refresh()
    assert rollups.refresh() == {"1h": 0}


def test_incremental_equals_full_recompute(spark, base, rollups, tmp_path):
    rollups.refresh()
    # tail append: rest of hour 2 plus hour 3 and a sliver of hour 4
    for sym, px in (("BTC/USD", 100.0), ("ETH/USD", 10.0)):
        base.append_idempotent(
            project_ohlcv_rows(spark, grid(100, start=150, base=px), "bitfinex", sym, "1m")
        )
    assert rollups.refresh() == {"1h": 4}  # hours 2 and 3 now closed, x2 symbols
    fresh = MaterializedRollups(spark, base, str(tmp_path / "fresh"), levels=("1h",))
    fresh.refresh()
    assert _sorted_rows(rollups.read("1h")) == _sorted_rows(fresh.read("1h"))


def test_chained_level_matches_direct(spark, tmp_path):
    ds = CandleDataset(spark, str(tmp_path / "b2"))
    # 49h of day-aligned 1m candles -> 2 closed days at the 1d level
    ds.append_idempotent(
        project_ohlcv_rows(
            spark, grid(49 * 60, base=50.0, t0=DAY_ALIGNED_T0), "kraken", "XRP/USD", "1m"
        )
    )
    day0 = DAY_ALIGNED_T0
    r = MaterializedRollups(spark, ds, str(tmp_path / "r2"), levels=("1h", "1d"))
    appended = r.refresh()
    assert appended["1d"] == 2
    direct = resample_candles(ds.read(timeframe="1m"), "1d").filter(
        F.col("timestamp") < day0 + 2 * 86_400_000
    )
    assert _sorted_rows(r.read("1d")) == _sorted_rows(direct)


def test_read_with_live_tail_equals_full_resample(spark, base, rollups):
    from ccxt_ohlcv_fetcher_spark.operators.rollup import read_with_live_tail

    rollups.refresh()
    view = read_with_live_tail(rollups, "1h")
    full = resample_candles(base.read(timeframe="1m"), "1h")
    assert _sorted_rows(view) == _sorted_rows(full)
    # the open tail bucket is present in the view but not on disk
    assert view.count() == rollups.read("1h").count() + 2  # +1 open hour x 2 symbols


def test_read_with_live_tail_before_any_refresh(spark, base, rollups):
    from ccxt_ohlcv_fetcher_spark.operators.rollup import read_with_live_tail

    view = read_with_live_tail(rollups, "1h")
    full = resample_candles(base.read(timeframe="1m"), "1h")
    assert _sorted_rows(view) == _sorted_rows(full)


def test_bucketed_store_matches_legacy(spark, base, tmp_path):
    """Rollups over a date-bucketed store are logically identical to the
    legacy layout — the dt level is a layout detail."""
    legacy = MaterializedRollups(spark, base, str(tmp_path / "r_legacy"), levels=("1h",))
    bucketed = MaterializedRollups(
        spark, base, str(tmp_path / "r_bucketed"), levels=("1h",), date_bucket="month"
    )
    assert legacy.refresh() == bucketed.refresh()
    assert _sorted_rows(legacy.read("1h")) == _sorted_rows(bucketed.read("1h"))
    # idempotent on the bucketed layout too
    assert bucketed.refresh() == {"1h": 0}


def test_vacuum_drops_old_buckets(spark, tmp_path):
    import glob

    ds = CandleDataset(spark, str(tmp_path / "c"), date_bucket="day")
    DAY = 86_400_000
    # 3 days of hourly candles
    rows = [
        [DAY_ALIGNED_T0 + i * 3_600_000, 1.0, 2.0, 0.5, 1.5, 3.0] for i in range(72)
    ]
    ds.append_idempotent(project_ohlcv_rows(spark, rows, "e", "S/X", "1h"))
    assert len(glob.glob(f"{ds.path}/*/*/*/dt=*")) == 3
    # retention: keep >= day 2 (cutoff mid-day-2 rounds down -> keeps day 2)
    assert ds.vacuum(DAY_ALIGNED_T0 + DAY + 3_600_000) == 1
    assert len(glob.glob(f"{ds.path}/*/*/*/dt=*")) == 2
    assert ds.read().count() == 48
    assert ds.read().agg(F.min("timestamp")).collect()[0][0] == DAY_ALIGNED_T0 + DAY


def test_vacuum_requires_bucketed_layout(spark, tmp_path):
    ds = CandleDataset(spark, str(tmp_path / "legacy"))
    with pytest.raises(ValueError, match="date-bucketed"):
        ds.vacuum(0)
