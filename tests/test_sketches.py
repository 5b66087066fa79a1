"""Mergeable-sketch distinct counting (op E14 scale path): the
re-aggregation law (union of daily sketches == sketch of the raw span)
and estimate accuracy vs exact distinct counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.sources.tables import load_table


def test_sketch_union_equals_direct_sketch(spark, sf_dir):
    """HLL state is a register-max (coupon-set) structure: merging the
    daily sketches must give the SAME estimate as sketching the whole
    span directly — this equality is what makes persisted daily
    sketches a lossless substitute for raw re-scans at rollup time."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est")
    ).collect()[0]["est"]
    direct = events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0]["est"]
    assert merged == direct


def test_sketch_estimate_accuracy(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    est = events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0]["est"]
    exact = events.select("user_id").distinct().count()
    assert abs(est - exact) / exact < 0.05  # lgK=12 default: ~1.6% RSE


def test_approx_percentile_within_error_bound(spark, sf_dir):
    """accuracy=10000 -> rank error <= n/10000; on these group sizes the
    approx p50/p90 must land within 1% of the exact value."""
    li = load_table(spark, sf_dir, "lineitem")
    approx = {
        r["l_returnflag"]: (r["p50"], r["p90"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10_000)).alias("p50"),
            F.percentile_approx("l_extendedprice", F.lit(0.9), F.lit(10_000)).alias("p90"),
        )
        .collect()
    }
    exact = {
        r["l_returnflag"]: (r["p50"], r["p90"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
            F.percentile("l_extendedprice", F.lit(0.9)).alias("p90"),
        )
        .collect()
    }
    for flag, (a50, a90) in approx.items():
        e50, e90 = exact[flag]
        assert abs(a50 - e50) / e50 < 0.01, (flag, a50, e50)
        assert abs(a90 - e90) / e90 < 0.01, (flag, a90, e90)
