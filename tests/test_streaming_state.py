"""Stateful streaming operator: gap detection across micro-batches
(streaming/state.py). The cross-batch case is the point — lag() cannot
see a gap that spans a micro-batch boundary; keyed state can.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.streaming.state import streaming_gap_monitor

T0 = 1700000400000  # bucket-aligned epoch ms
MIN = 60_000


def _write_candles(spark, path, rows):
    spark.createDataFrame(
        [("bitfinex", "XRPUSD", "1m", t) for t in rows],
        "exchange string, symbol string, timeframe string, timestamp long",
    ).coalesce(1).write.mode("append").parquet(path)


def test_gap_monitor_within_and_across_batches(spark, tmp_path):
    src = str(tmp_path / "candles")
    # batch 1: 0,1,2 then hole (3,4 missing) then 5,6
    _write_candles(spark, src, [T0 + i * MIN for i in (0, 1, 2, 5, 6)])
    # batch 2: starts at 9 -> hole (7,8 missing) spans the batch boundary
    _write_candles(spark, src, [T0 + i * MIN for i in (9, 10)])

    stream = (
        spark.readStream.schema(
            "exchange string, symbol string, timeframe string, timestamp long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_gap_monitor(stream)
        .writeStream.format("memory")
        .queryName("gaps")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["gap_start"], r["gap_end"], r["n_missing"])
        for r in spark.table("gaps").collect()
    }
    assert got == {
        (T0 + 3 * MIN, T0 + 4 * MIN, 2),  # intra-batch hole
        (T0 + 7 * MIN, T0 + 8 * MIN, 2),  # hole across the batch boundary
    }


def test_gap_monitor_restart_resumes_state(spark, tmp_path):
    """State survives restart via the checkpoint: a run that sees only
    new files must still diff against the last candle of the first run."""
    src = str(tmp_path / "candles")
    ckpt = str(tmp_path / "ckpt")
    _write_candles(spark, src, [T0, T0 + MIN])
    collected: list = []

    def run():
        stream = (
            spark.readStream.schema(
                "exchange string, symbol string, timeframe string, timestamp long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            streaming_gap_monitor(stream)
            .writeStream.foreachBatch(
                lambda df, _bid: collected.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert collected == []
    _write_candles(spark, src, [T0 + 4 * MIN])  # 2,3 missing vs stored state
    run()
    assert {(r["gap_start"], r["gap_end"], r["n_missing"]) for r in collected} == {
        (T0 + 2 * MIN, T0 + 3 * MIN, 2)
    }
