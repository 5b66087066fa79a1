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


def test_streaming_funnel_matches_batch_over_prefix(spark, tmp_path):
    """The stateful funnel's final per-user stage must EQUAL the batch
    event_funnel_conversion staging over the same events, including a
    cross-batch conversion (stage event arriving batches later) and an
    out-of-order event absorbed by the min-fold."""
    from datetime import datetime, timedelta

    from ccxt_ohlcv_fetcher_spark.streaming.funnel import streaming_funnel

    src = str(tmp_path / "events")
    schema = "user_id long, event_type string, ts timestamp"

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    t = datetime(2024, 1, 1)
    s = timedelta(seconds=1)
    # user 1: full ordered funnel split across batches
    # user 2: view before signup (stage stalls at 1 after signup arrives)
    # user 3: signup only
    write([(1, "signup", t), (1, "view", t + s), (2, "view", t)])
    write([(1, "click", t + 2 * s), (3, "signup", t), (2, "signup", t + s)])
    write([(1, "purchase", t + 3 * s), (1, "view", t + 9 * s)])  # late dup view

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_funnel(stream)
        .writeStream.format("memory")
        .queryName("funnel")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # last emission per user wins (update mode appends one row per batch)
    import collections

    last: dict = collections.OrderedDict()
    for r in spark.table("funnel").collect():
        last[r["user_id"]] = r["max_stage"]
    assert last == {1: 4, 2: 1, 3: 1}
