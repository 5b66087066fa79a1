"""§2.10 pandas_udf surface: the Arrow-vectorized scalar UDF path,
checked against a pure-Python reference implementation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.operators.multimodal import payload_entropy


def _ref_entropy(b: bytes) -> float:
    if not b:
        return 0.0
    n = len(b)
    counts = {}
    for x in b:
        counts[x] = counts.get(x, 0) + 1
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


def test_payload_entropy_matches_reference(spark):
    payloads = [
        (1, b"aaaaaaaa"),            # zero entropy
        (2, bytes(range(256))),      # max entropy = 8 bits
        (3, b"hello world, hello"),
        (4, b""),
        (5, None),
    ]
    df = spark.createDataFrame(payloads, "media_id long, payload binary")
    got = {
        r["media_id"]: r["e"]
        for r in df.select("media_id", payload_entropy()(F.col("payload")).alias("e")).collect()
    }
    assert got[1] == 0.0
    assert abs(got[2] - 8.0) < 1e-12
    assert abs(got[3] - _ref_entropy(b"hello world, hello")) < 1e-12
    assert got[4] == 0.0
    assert got[5] == 0.0
