"""Streaming candle sink -> snapshot-logged dataset, end to end.

The sink composes with `SnapshotCandleDataset` by duck-typing, and —
because the logged dataset is transactional — each micro-batch commits
with ``txn=(app_id, batch_id)`` (app_id derived from the checkpoint
location). This pins the composition the round-6 wishlist called for:

- stream -> logged dataset equals the batch resample (values);
- every streaming commit carries the txn stamp in the manifest;
- a re-delivered micro-batch (same checkpoint identity + batch id, the
  foreachBatch at-least-once case) is dropped from the LOG alone;
- rollups refresh off the logged dataset (duck-typed `_exists`/`read`);
- time travel sees the per-micro-batch history.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.operators.candle_log import SnapshotCandleDataset
from ccxt_ohlcv_fetcher_spark.operators.rollup import MaterializedRollups
from ccxt_ohlcv_fetcher_spark.streaming.candles import (
    read_tick_stream,
    start_candle_sink,
    streaming_ohlcv,
)

from tests.test_streaming import T0, make_ticks, tick_dir  # noqa: F401


def test_streaming_sink_commits_transactionally(spark, tmp_path, tick_dir):  # noqa: F811
    ds = SnapshotCandleDataset(spark, str(tmp_path / "log"))
    ckpt = str(tmp_path / "ckpt")
    rollups = MaterializedRollups(
        spark, ds, str(tmp_path / "rollups"), levels=("15m",), base_timeframe="5m"
    )
    q = start_candle_sink(
        streaming_ohlcv(read_tick_stream(spark, tick_dir), "5m"),
        ds,
        "5m",
        ckpt,
        rollups=rollups,
    )
    q.awaitTermination(120)

    got = ds.read("bitfinex", "XRPUSD", "5m").orderBy("timestamp").collect()
    assert len(got) == 11  # watermark close-out: open tail bucket held back
    batch = (
        make_ticks(spark, 360)
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(
            F.min_by("price", "ts").alias("open"),
            F.max("price").alias("high"),
            F.min("price").alias("low"),
            F.max_by("price", "ts").alias("close"),
            F.sum("amount").alias("volume"),
        )
        .select(F.unix_millis("w.start").alias("timestamp"), "open", "close", "volume")
        .orderBy("timestamp")
        .collect()
    )
    for s, b in zip(got, batch[:11]):
        assert s["timestamp"] == b["timestamp"]
        assert float(s["open"]) == b["open"]
        assert float(s["close"]) == b["close"]
        assert float(s["volume"]) == b["volume"]

    # every streaming append is a txn-stamped log commit
    import os

    app_id = "candle_sink:" + os.path.abspath(ckpt)
    appends = [h for h in ds.store.history() if h["operation"] == "append"]
    assert appends, "stream produced no commits"
    head = ds.store.manifest()
    assert app_id in head.get("txn", {})
    last_batch = head["txn"][app_id]

    # redelivery of an already-committed micro-batch: dropped from the
    # log's txn record alone (returns 0, no new version)
    v_before = ds.store.latest_version()
    replay = ds.read("bitfinex", "XRPUSD", "5m")
    assert ds.append_idempotent(replay, txn=(app_id, last_batch)) == 0
    assert ds.store.latest_version() == v_before

    # rollups refreshed off the logged dataset: 11 closed 5m buckets
    # cover 3 closed 15m buckets (the 4th is the open tail)
    r = rollups.read("15m", "bitfinex", "XRPUSD").orderBy("timestamp").collect()
    assert len(r) == 3
    assert float(r[0]["open"]) == float(got[0]["open"])

    # time travel: version 1 holds the first micro-batch only
    v1 = ds.read(version=1).count()
    assert 0 < v1 < len(got) or len(appends) == 1
