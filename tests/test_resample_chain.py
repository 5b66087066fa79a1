"""Hierarchical candle rollup (operators/resample.py:resample_candles):
the OHLC composition law makes rollups associative — chaining through an
intermediate timeframe must equal the direct rollup exactly.
"""

from __future__ import annotations

from ccxt_ohlcv_fetcher_spark.operators.ingest import project_ohlcv_rows
from ccxt_ohlcv_fetcher_spark.operators.resample import resample_candles

T0 = 1700000400000 - (1700000400000 % 3600000)  # hour-aligned


def _candles(spark, n=180):
    # 1m candles with non-monotonic prices so open/close picks matter
    rows = [
        [
            T0 + i * 60_000,
            100.0 + ((i * 7) % 13),
            105.0 + ((i * 5) % 11),
            95.0 - ((i * 3) % 7),
            100.0 + ((i * 11) % 9),
            1.0 + (i % 4),
        ]
        for i in range(n)
    ]
    return project_ohlcv_rows(spark, rows, "bitfinex", "XRP/USD", "1m")


def _key(r):
    return (r["exchange"], r["symbol"], r["timestamp"])


def test_rollup_chain_equals_direct(spark):
    c1m = _candles(spark)
    direct = resample_candles(c1m, "1h").collect()
    chained = resample_candles(
        resample_candles(c1m, "5m"), "1h"
    ).collect()
    assert len(direct) == 3
    d = {_key(r): r for r in direct}
    c = {_key(r): r for r in chained}
    assert d.keys() == c.keys()
    for k in d:
        for col in ("open", "high", "low", "close", "volume"):
            assert d[k][col] == c[k][col], (k, col)


def test_rollup_bucket_values(spark):
    c1m = _candles(spark, n=60)
    row = resample_candles(c1m, "1h").collect()[0]
    raw = {r["timestamp"]: r for r in c1m.collect()}
    assert row["timestamp"] == T0
    assert row["open"] == raw[T0]["open"]
    assert row["close"] == raw[T0 + 59 * 60_000]["close"]
    assert row["high"] == max(r["high"] for r in raw.values())
    assert row["low"] == min(r["low"] for r in raw.values())
    assert row["volume"] == sum(r["volume"] for r in raw.values())
