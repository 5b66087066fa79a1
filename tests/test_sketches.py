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


def test_theta_overlap_accuracy_and_set_algebra(spark, sf_dir):
    """Theta sketches support intersection/difference (HLL cannot):
    estimates must track the exact set sizes, and the algebra must be
    consistent: |A| ~ |A-B| + |A&B| and |AuB| ~ |A| + |B| - |A&B|."""
    from ccxt_ohlcv_fetcher_spark.plans.analytics import theta_audience_overlap

    r = theta_audience_overlap(spark, sf_dir).collect()[0]
    events = load_table(spark, sf_dir, "events")
    view = {x["user_id"] for x in events.filter("event_type='view'").collect()}
    buy = {
        x["user_id"] for x in events.filter("event_type='purchase'").collect()
    }
    checks = [
        (r["est_view"], len(view)),
        (r["est_purchase"], len(buy)),
        (r["est_union"], len(view | buy)),
        (r["est_intersection"], len(view & buy)),
        (r["est_view_only"], len(view - buy)),
    ]
    for est, exact in checks:
        if exact == 0:
            assert est < 1
        else:
            assert abs(est - exact) / exact < 0.02, (est, exact)
    assert abs(r["est_view"] - (r["est_view_only"] + r["est_intersection"])) \
        <= 0.05 * max(r["est_view"], 1)


def test_kll_quantiles_rank_error_and_merge(spark, sf_dir):
    """KLL rank error (default k=200) is ~1.3%: the estimated quantile's
    TRUE rank must be within 2.5% of the requested rank. Also the
    mergeability law: per-day sketches merged == whole-span sketch."""
    from ccxt_ohlcv_fetcher_spark.plans.analytics import kll_value_quantiles

    rows = kll_value_quantiles(spark, sf_dir).collect()
    events = load_table(spark, sf_dir, "events")
    by_type = {}
    for r in events.select("event_type", "value").collect():
        by_type.setdefault(r["event_type"], []).append(r["value"])
    for r in rows:
        vals = sorted(by_type[r["event_type"]])
        n = len(vals)
        for q, est in ((0.5, r["p50"]), (0.9, r["p90"]), (0.99, r["p99"])):
            true_rank = sum(1 for v in vals if v <= est) / n
            assert abs(true_rank - q) < 0.025, (r["event_type"], q, est)
        # the in-output audit columns must agree with the local recompute
        assert r["within_bound"] is True
        assert r["max_rank_err"] <= r["err_bound"]
    # kll_sketch_merge_double is a binary scalar merge — fold the per-day
    # sketches pairwise (associative, so fold order is free)
    merged = (
        events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.kll_sketch_agg_double("value").alias("sk"))
        .agg(F.collect_list("sk").alias("sks"))
        .select(
            F.kll_sketch_get_quantile_double(
                F.aggregate(
                    F.slice("sks", 2, F.size("sks") - 1),
                    F.get("sks", 0),
                    lambda acc, x: F.kll_sketch_merge_double(acc, x),
                ),
                F.lit(0.5),
            ).alias("p50")
        )
        .collect()[0]["p50"]
    )
    vals = sorted(v for vs in by_type.values() for v in vs)
    n = len(vals)
    true_rank = sum(1 for v in vals if v <= merged) / n
    assert abs(true_rank - 0.5) < 0.025


def test_histogram_sketch_audit_columns(spark, sf_dir):
    """event_value_histogram's in-output invariants: bin mass sums to
    the exact row count, centroids lie inside [min, max]."""
    from ccxt_ohlcv_fetcher_spark.plans.breadth import event_value_histogram

    rows = event_value_histogram(spark, sf_dir).collect()
    assert len(rows) == 12
    assert all(r["mass_ok"] and r["range_ok"] for r in rows)
    events = load_table(spark, sf_dir, "events")
    n = events.count()
    assert abs(sum(r["bin_y"] for r in rows) - n) < 1e-6
