"""Spark 4 Python DataSource form of the OHLCV ingest (R1/E28s):
``format("ccxt_ohlcv")`` batch (one task per symbol, overlap +
incomplete-tail semantics) and streaming (resume-cursor offsets across
restarts).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.sources.datasource import register

T0 = 1700000000 * 1000 - (1700000000 % 60) * 1000  # minute-aligned
MIN = 60_000


def grid(n: int, t0: int = T0, base: float = 100.0) -> list[list]:
    return [
        [t0 + i * MIN, base + i, base + 1 + i, base - 1 + i, base + 0.5 + i, 10.0 + i]
        for i in range(n)
    ]


@pytest.fixture()
def fixture_file(tmp_path):
    rows = {"XRPUSD": grid(120), "BTCUSD": grid(90, base=40_000.0)}
    path = str(tmp_path / "candles.json")
    with open(path, "w") as fh:
        json.dump(rows, fh)
    return path, rows


def _read(spark, fixture_file, now_ms, page_size=50, symbols="XRPUSD,BTCUSD"):
    register(spark)
    path, _rows = fixture_file
    return (
        spark.read.format("ccxt_ohlcv")
        .option("fixture", path)
        .option("symbols", symbols)
        .option("timeframe", "1m")
        .option("since", str(T0))
        .option("now", str(now_ms))
        .option("page_size", str(page_size))
        .load()
    )


def test_batch_read_all_complete_candles(spark, fixture_file):
    now = T0 + 200 * MIN  # everything complete
    df = _read(spark, fixture_file, now)
    assert df.count() == 120 + 90
    per_symbol = {r["symbol"]: r["n"] for r in df.groupBy("symbol").agg(F.count("*").alias("n")).collect()}
    assert per_symbol == {"XRPUSD": 120, "BTCUSD": 90}
    # no duplicate timestamps despite page-overlap rows (R9)
    assert df.select("symbol", "timestamp").distinct().count() == 210
    got = df.filter((F.col("symbol") == "XRPUSD") & (F.col("timestamp") == T0)).collect()[0]
    assert (got["open"], got["close"]) == (100.0, 100.5)


def test_batch_read_trims_incomplete_tail(spark, fixture_file):
    # "now" mid-bucket 119: candle 119 incomplete -> 119 complete rows
    now = T0 + 119 * MIN + 30_000
    df = _read(spark, fixture_file, now, symbols="XRPUSD")
    assert df.count() == 119
    assert df.agg(F.max("timestamp")).collect()[0][0] == T0 + 118 * MIN


def test_batch_read_one_partition_per_symbol(spark, fixture_file):
    df = _read(spark, fixture_file, T0 + 200 * MIN)
    # partition count == symbol count: the fetch parallelism unit
    assert df.rdd.getNumPartitions() == 2


def test_batch_matches_driver_loop_ingest(spark, fixture_file, tmp_path):
    """The DataSource and the paging-loop ingest must land identical
    rows (same R8/R9/R10 semantics, different execution shape)."""
    from ccxt_ohlcv_fetcher_spark.operators.ingest import CandleDataset
    from ccxt_ohlcv_fetcher_spark.sources.paging import (
        FixturePagingSource,
        ingest_candles,
    )

    path, rows = fixture_file
    now = T0 + 200 * MIN
    ds = CandleDataset(spark, str(tmp_path / "loop_candles"))
    for sym in ("XRPUSD", "BTCUSD"):
        ingest_candles(
            spark, FixturePagingSource(rows[sym], page_size=50), ds,
            "fixture", sym, "1m", now_ms=now, since_ms=T0,
        )
    loop_rows = {
        (r["symbol"], r["timestamp"], float(r["open"]), float(r["volume"]))
        for r in ds.read().collect()
    }
    src_rows = {
        (r["symbol"], r["timestamp"], r["open"], r["volume"])
        for r in _read(spark, fixture_file, now).collect()
    }
    assert src_rows == loop_rows


def test_stream_offsets_resume_across_restart(spark, fixture_file, tmp_path):
    register(spark)
    path, rows = fixture_file

    def start_stream(now_ms):
        stream = (
            spark.readStream.format("ccxt_ohlcv")
            .option("fixture", path)
            .option("symbols", "XRPUSD,BTCUSD")
            .option("timeframe", "1m")
            .option("since", str(T0))
            .option("now", str(now_ms))
            .option("page_size", "40")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # Python streaming sources run ONE micro-batch per availableNow run
    # (no AvailableNow support -> single-batch fallback), i.e. one page
    # (40 candles) per symbol per run. Offsets checkpoint between runs:
    # three restarts must drain everything exactly once.
    counts = []
    for _ in range(3):
        start_stream(T0 + 500 * MIN)  # all candles complete
        out = spark.read.parquet(str(tmp_path / "out"))
        counts.append(out.count())
    assert counts[0] < counts[1] < counts[2]  # monotone progress per run
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.filter(F.col("symbol") == "XRPUSD").count() == 120
    assert out.filter(F.col("symbol") == "BTCUSD").count() == 90
    # exactly-once per candle across all restarts
    assert out.select("symbol", "timestamp").distinct().count() == 210
    # a further run is a no-op (caught up; offset stable)
    start_stream(T0 + 500 * MIN)
    assert spark.read.parquet(str(tmp_path / "out")).count() == 210


def test_datasource_to_candle_sink_e2e(spark, fixture_file, tmp_path):
    """Full streaming path: ccxt_ohlcv source (checkpointed per-symbol
    offsets) -> idempotent candle sink on a date-bucketed dataset.
    Multiple restart-driven runs drain the feed exactly-once into
    storage — the reference's whole pipeline, Spark-native end to end."""
    from ccxt_ohlcv_fetcher_spark.operators.ingest import CandleDataset
    from ccxt_ohlcv_fetcher_spark.streaming.candles import start_candle_sink

    register(spark)
    path, rows = fixture_file
    ds = CandleDataset(spark, str(tmp_path / "sink"), date_bucket="month")

    def run_once():
        stream = (
            spark.readStream.format("ccxt_ohlcv")
            .option("fixture", path)
            .option("symbols", "XRPUSD,BTCUSD")
            .option("timeframe", "1m")
            .option("since", str(T0))
            .option("now", str(T0 + 500 * MIN))
            .option("page_size", "80")
            .load()
            .withColumn("exchange", F.lit("fixture"))
            .drop("timeframe")
        )
        q = start_candle_sink(stream, ds, "1m", str(tmp_path / "ckpt"))
        q.awaitTermination(120)

    for _ in range(3):  # one page per symbol per run (single-batch fallback)
        run_once()
    out = ds.read()
    assert out.count() == 210
    assert out.select("symbol", "timestamp").distinct().count() == 210
    # values survive the decimal cast: spot-check one candle
    row = out.filter(
        (F.col("symbol") == "XRPUSD") & (F.col("timestamp") == T0 + 5 * MIN)
    ).collect()[0]
    assert float(row["open"]) == 105.0 and float(row["volume"]) == 15.0
    # re-running when caught up appends nothing
    before = out.count()
    run_once()
    assert ds.read().count() == before


def test_unsorted_fixture_terminates_and_sorts(spark, tmp_path):
    """ADVICE r1: an unsorted fixture (or dup trailing timestamps) must
    never spin the cursor loop — the feed sorts rows on load and the
    reader breaks on any non-advancing cursor."""
    register(spark)
    rows = {"XRPUSD": list(reversed(grid(100)))}  # fully descending
    path = str(tmp_path / "unsorted.json")
    with open(path, "w") as fh:
        json.dump(rows, fh)
    out = (
        spark.read.format("ccxt_ohlcv")
        .option("fixture", path)
        .option("symbols", "XRPUSD")
        .option("timeframe", "1m")
        .option("since", str(T0))
        .option("now", str(T0 + 500 * MIN))
        .option("page_size", "30")
        .load()
        .collect()
    )
    assert len(out) == 100
    assert len({r["timestamp"] for r in out}) == 100


def test_duplicate_tail_timestamps_terminate(spark, tmp_path):
    """A page whose max ts equals the cursor (dup tail) breaks the loop
    instead of refetching the same page forever."""
    register(spark)
    base = grid(3)
    dup = list(base[-1])
    dup[1] += 999.0  # same ts, different values
    path = str(tmp_path / "dup.json")
    with open(path, "w") as fh:
        json.dump({"XRPUSD": base + [dup]}, fh)
    out = (
        spark.read.format("ccxt_ohlcv")
        .option("fixture", path)
        .option("symbols", "XRPUSD")
        .option("timeframe", "1m")
        .option("since", str(T0))
        .option("now", str(T0 + 500 * MIN))
        .option("page_size", "2")
        .load()
        .collect()
    )
    assert len({r["timestamp"] for r in out}) == 3


def test_stream_max_rows_per_batch_bounds_and_drains(spark, fixture_file, tmp_path):
    """maxRowsPerBatch (maxOffsetsPerTrigger analog). Contract level:
    each read() emits at most N candles per symbol and the returned
    offset resumes exactly after the emitted prefix. Pipeline level:
    the capped stream still drains the feed exactly-once."""
    from ccxt_ohlcv_fetcher_spark.sources.datasource import CandleStreamReader

    path, rows = fixture_file
    reader = CandleStreamReader(
        {
            "fixture": path,
            "symbols": "XRPUSD",
            "timeframe": "1m",
            "since": str(T0),
            "now": str(T0 + 500 * MIN),
            "page_size": "200",  # a page would deliver everything...
            "maxRowsPerBatch": "25",  # ...but admission caps each batch
        }
    )
    offset = reader.initialOffset()
    seen = []
    for _ in range(10):
        batch, offset = reader.read(offset)
        batch = list(batch)
        assert len(batch) <= 25, f"batch cap exceeded: {len(batch)}"
        if not batch:
            break
        # offset resumes exactly one bucket after the last emitted candle
        assert offset["XRPUSD"] == batch[-1][3] + 60_000
        seen.extend(batch)
    assert len(seen) == 120 and len({r[3] for r in seen}) == 120  # exactly-once

    # pipeline level: capped source -> parquet sink drains to 120 rows
    register(spark)
    stream = (
        spark.readStream.format("ccxt_ohlcv")
        .option("fixture", path)
        .option("symbols", "XRPUSD")
        .option("timeframe", "1m")
        .option("since", str(T0))
        .option("now", str(T0 + 500 * MIN))
        .option("page_size", "200")
        .option("maxRowsPerBatch", "25")
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.select("timestamp").distinct().count() == out.count()
