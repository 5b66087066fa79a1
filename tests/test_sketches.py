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
