"""Stream-static z-score anomaly quarantine (streaming/anomaly.py):
the statistical candle gate — baseline from history, broadcast
stream-static join per micro-batch, anomalous candles quarantined
with their z-score, clean rows through the idempotent sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.operators.ingest import CandleDataset
from ccxt_ohlcv_fetcher_spark.streaming.anomaly import (
    baseline_stats,
    start_quarantined_candle_sink,
    zscore_flag,
)
from ccxt_ohlcv_fetcher_spark.streaming.candles import (
    read_tick_stream,
    streaming_ohlcv,
)

T0 = 1700000000 * 1000 - (1700000000 % 3600) * 1000  # hour-aligned ms


def _history(spark, n=50, mu=100.0):
    # close spread matches the tick generator's 100 + (i % 7) pattern,
    # so normal stream candles sit well inside the baseline
    rows = [
        (T0 - (n - i) * 300_000, mu, mu + 7, mu - 1, mu + (i % 7), 10.0,
         "bitfinex", "XRPUSD", "5m")
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "timestamp long, open double, high double, low double, close double, "
        "volume double, exchange string, symbol string, timeframe string",
    )


def test_zscore_flag_batch_semantics(spark):
    hist = _history(spark)
    base = baseline_stats(hist)
    batch = spark.createDataFrame(
        [
            (T0, 100.0, 101.0, 99.0, 100.5, 5.0, "bitfinex", "XRPUSD", "5m"),
            (T0 + 300_000, 100.0, 9000.0, 99.0, 9000.0, 5.0, "bitfinex", "XRPUSD", "5m"),
            # unknown series: must pass unflagged (no baseline)
            (T0, 1.0, 1.0, 1.0, 1.0, 1.0, "kraken", "BTCUSD", "5m"),
        ],
        "timestamp long, open double, high double, low double, close double, "
        "volume double, exchange string, symbol string, timeframe string",
    )
    out = {
        (r["symbol"], r["timestamp"]): r
        for r in zscore_flag(batch, base, threshold=4.0).collect()
    }
    assert out[("XRPUSD", T0)]["is_anomaly"] is False
    assert out[("XRPUSD", T0 + 300_000)]["is_anomaly"] is True
    assert abs(out[("XRPUSD", T0 + 300_000)]["zscore"]) > 4.0
    assert out[("BTCUSD", T0)]["is_anomaly"] is False
    assert out[("BTCUSD", T0)]["zscore"] is None


@pytest.fixture()
def spiky_tick_dir(spark, tmp_path):
    """One hour of calm 10s ticks around 100, with a wild print (9000)
    as the CLOSING tick of the 3rd 5-minute bucket (i=89 is the last
    10s tick of the bucket starting at T0+600s) — the gate z-scores the
    candle close."""
    data = [
        ((T0 + i * 10_000) / 1000.0, "bitfinex", "XRPUSD",
         9000.0 if i == 89 else 100.0 + (i % 7), 2.0)
        for i in range(360)
    ]
    df = spark.createDataFrame(
        [(float(ts), e, s, p, a) for ts, e, s, p, a in data],
        "ts double, exchange string, symbol string, price double, amount double",
    ).withColumn("ts", F.timestamp_seconds("ts"))
    path = str(tmp_path / "ticks")
    df.coalesce(2).write.mode("append").parquet(path)
    return path


def test_quarantined_sink_splits_clean_and_anomalous(
    spark, tmp_path, spiky_tick_dir
):
    ds = CandleDataset(spark, str(tmp_path / "candles"))
    base = baseline_stats(_history(spark))
    candles = streaming_ohlcv(read_tick_stream(spark, spiky_tick_dir), "5m")
    qpath = str(tmp_path / "quarantine")
    q = start_quarantined_candle_sink(
        candles, ds, base, "5m", str(tmp_path / "ckpt"), qpath, threshold=4.0
    )
    q.awaitTermination(120)

    clean = ds.read(exchange="bitfinex", symbol="XRPUSD", timeframe="5m")
    bad = spark.read.parquet(qpath)
    # exactly the spike bucket is quarantined, with its z-score
    assert bad.count() == 1
    row = bad.collect()[0]
    assert float(row["close"]) == 9000.0 and abs(row["zscore"]) > 4.0
    spike_bucket = (T0 + 89 * 10_000) // 300_000 * 300_000
    assert row["timestamp"] == spike_bucket
    # clean side: all other closed buckets, none anomalous
    got = {r["timestamp"] for r in clean.select("timestamp").collect()}
    assert spike_bucket not in got
    assert len(got) >= 9  # 11 closed 5m buckets in the hour, minus spike
    # restart with the same checkpoint: no duplicates on the clean side
    q2 = start_quarantined_candle_sink(
        candles, ds, base, "5m", str(tmp_path / "ckpt"), qpath, threshold=4.0
    )
    q2.awaitTermination(120)
    assert clean.count() == len(got)
