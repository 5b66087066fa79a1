"""Distributed exact-rank primitive (functions/rank.py) — the round-6
verdict's top item: global rank / running sum / ntile with NO
single-partition stage, bit-identical to the window forms."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ccxt_ohlcv_fetcher_spark.functions.rank import (
    adaptive_cumsum,
    adaptive_rank,
    global_cumsum,
    global_rank,
    ntile_from_rank,
)


def _messy(spark, n=5000, seed=7):
    """Values with heavy ties + a unique tie-break key, shuffled across
    many input partitions (the adversarial layout for range ranking)."""
    return (
        spark.range(n, numPartitions=13)
        .select(
            F.col("id").alias("k"),
            (F.xxhash64(F.col("id") + seed) % 50).alias("v"),
        )
        .repartition(11)  # destroy any incidental order
    )


def test_global_rank_matches_window_row_number(spark):
    df = _messy(spark)
    order = [F.col("v").asc(), F.col("k").asc()]
    got, total = global_rank(df, order, rank_name="rk", num_partitions=7)
    assert total == 5000
    want = df.withColumn("rk", F.row_number().over(W.orderBy(*order)))
    assert (
        got.select("k", "rk")
        .exceptAll(want.select("k", "rk").withColumn("rk", F.col("rk").cast("long")))
        .isEmpty()
    )
    # THE point: no single-partition stage anywhere
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "Window" not in plan


def test_global_rank_desc_order_and_empty(spark):
    df = _messy(spark, n=300)
    order = [F.col("v").desc(), F.col("k").desc()]
    got, total = global_rank(df, order, rank_name="rk", num_partitions=5)
    want = df.withColumn(
        "rk", F.row_number().over(W.orderBy(*order)).cast("long")
    )
    assert total == 300
    assert got.select("k", "rk").exceptAll(want.select("k", "rk")).isEmpty()
    empty, t0 = global_rank(df.filter("v > 1000"), order)
    assert t0 == 0 and empty.count() == 0


def test_ntile_from_rank_matches_sql_ntile(spark):
    for n, b in [(5000, 8), (97, 10), (96, 12), (5, 8), (1, 3)]:
        df = _messy(spark, n=n)
        order = [F.col("v").asc(), F.col("k").asc()]
        got, total = global_rank(df, order, rank_name="rk")
        assert total == n
        mine = got.select("k", ntile_from_rank("rk", total, b).alias("t"))
        ref = df.select(
            "k", F.ntile(b).over(W.orderBy(*order)).alias("t")
        )
        assert mine.exceptAll(ref).isEmpty(), (n, b)


def test_global_cumsum_decimal_exact_vs_window(spark):
    df = _messy(spark, n=2000)
    order = [F.col("v").desc(), F.col("k").asc()]
    val = (F.col("k") * 31 % 997).cast("decimal(18,6)")
    got = global_cumsum(df, order, val, sum_name="c", num_partitions=9)
    w = W.orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    want = df.withColumn("c", F.sum(val).over(w))
    # decimal-EXACT: compare as strings after normalizing precision
    g = {r["k"]: str(r["c"]) for r in got.select("k", "c").collect()}
    e = {r["k"]: str(r["c"]) for r in want.select("k", "c").collect()}
    assert g == e
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_adaptive_rank_branches_agree(spark):
    df = _messy(spark, n=400)
    order = [F.col("v").asc(), F.col("k").asc()]
    small, ns = adaptive_rank(df, order, rank_name="rk", threshold=10_000)
    large, nl = adaptive_rank(df, order, rank_name="rk", threshold=10)
    assert ns == nl == 400
    assert (
        small.select("k", "rk").exceptAll(large.select("k", "rk")).isEmpty()
    )
    # the large branch must be the distributed one
    plan = large._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_adaptive_cumsum_branches_agree(spark):
    df = _messy(spark, n=400)
    order = [F.col("v").asc(), F.col("k").asc()]
    val = F.col("k").cast("decimal(18,6)")
    small = adaptive_cumsum(df, order, val, sum_name="c", threshold=10_000)
    large = adaptive_cumsum(df, order, val, sum_name="c", threshold=10)
    g = {r["k"]: str(r["c"]) for r in small.collect()}
    e = {r["k"]: str(r["c"]) for r in large.collect()}
    assert g == e


def test_registry_rank_queries_branch_equal(spark, sf_dir, monkeypatch):
    """Every rank-gated registry query produces IDENTICAL results
    whether the adaptive primitives take the one-task-window branch
    (fixture scale) or the distributed two-pass branch (forced here by
    zeroing BOTH thresholds) — so the oracle greenness of the small
    branch certifies the big one. Covers the aggregate-input gates
    (RANK_WINDOW_MAX_ROWS) and the raw-table gates added by round-8
    verdict item 3 (RAW_RANK_WINDOW_MAX_ROWS)."""
    import ccxt_ohlcv_fetcher_spark.functions.rank as rank_mod
    from ccxt_ohlcv_fetcher_spark.plans import load_all

    reg = load_all()
    names = [
        "order_equidepth_hist",
        "event_key_skew_profile",
        "corpus_zipf_fit",
        "part_revenue_abc",
        "lineitem_exact_quantiles",
        "order_cumulative_revenue",
        "lineitem_weighted_median",
        "doc_seeded_shuffle",
        "part_price_size_skyline",
    ]
    small = {}
    for n in names:
        small[n] = sorted(
            map(str, reg[n].builder(spark, sf_dir).collect())
        )
    monkeypatch.setattr(rank_mod, "RANK_WINDOW_MAX_ROWS", 0)
    monkeypatch.setattr(rank_mod, "RAW_RANK_WINDOW_MAX_ROWS", 0)
    for n in names:
        big = sorted(map(str, reg[n].builder(spark, sf_dir).collect()))
        assert big == small[n], n


def test_raw_table_rank_queries_have_no_single_partition_stage(
    spark, sf_dir, monkeypatch
):
    """On the AT-SCALE branch (raw threshold forced to 0 — above the
    gate a real table takes exactly this path), the raw-table
    showcases (exact quantiles, cumulative revenue, equi-depth
    histogram) must never funnel the fact table through one task:
    zero Exchange SinglePartition in their plans."""
    import ccxt_ohlcv_fetcher_spark.functions.rank as rank_mod
    from ccxt_ohlcv_fetcher_spark.plans import load_all

    monkeypatch.setattr(rank_mod, "RAW_RANK_WINDOW_MAX_ROWS", 0)
    reg = load_all()
    for name in (
        "lineitem_exact_quantiles",
        "order_cumulative_revenue",
        "order_equidepth_hist",
        "lineitem_weighted_median",
    ):
        df = reg[name].builder(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange SinglePartition" not in plan, name


def test_adaptive_source_gate_picks_window_below_threshold(spark):
    """At fixture scale the raw-table gate must pick the one-task
    window (the whole point of round-8 item 3: don't pay the two-pass
    fixed cost on inputs a single task sorts in milliseconds) — and
    the two sides must agree exactly."""
    from ccxt_ohlcv_fetcher_spark.functions.rank import (
        adaptive_cumsum_source,
        adaptive_rank_source,
    )

    df = _messy(spark, n=500)
    order = [F.col("v").asc(), F.col("k").asc()]
    ranked, n = adaptive_rank_source(df, order, rank_name="rk")
    assert n == 500
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan  # the gate chose the window branch
    want = df.withColumn(
        "rk", F.row_number().over(W.orderBy(*order)).cast("long")
    )
    assert ranked.select("k", "rk").exceptAll(want.select("k", "rk")).isEmpty()
    cs = adaptive_cumsum_source(df, order, F.col("k").cast("bigint"), "c")
    w = W.orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    want_c = df.withColumn("c", F.sum(F.col("k").cast("bigint")).over(w))
    assert cs.select("k", "c").exceptAll(want_c.select("k", "c")).isEmpty()


def test_global_cummax_matches_window_both_frames(spark):
    from ccxt_ohlcv_fetcher_spark.functions.rank import global_cummax

    df = _messy(spark, n=2000)
    order = [F.col("v").asc(), F.col("k").asc()]
    val = (F.col("k") * 37 % 211).cast("bigint")
    for inclusive, end in [(True, 0), (False, -1)]:
        got = global_cummax(
            df, order, val, "m", inclusive=inclusive, num_partitions=9
        )
        w = W.orderBy(*order).rowsBetween(W.unboundedPreceding, end)
        want = df.withColumn("m", F.max(val).over(w))
        g = {r["k"]: r["m"] for r in got.select("k", "m").collect()}
        e = {r["k"]: r["m"] for r in want.select("k", "m").collect()}
        assert g == e, f"inclusive={inclusive}"
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "Exchange SinglePartition" not in plan
    # exclusive frame: the global first row has NO strict predecessor
    first = (
        global_cummax(df, order, val, "m", inclusive=False, num_partitions=9)
        .orderBy(*order)
        .first()
    )
    assert first["m"] is None


def test_global_cummax_empty_and_decimal(spark):
    from ccxt_ohlcv_fetcher_spark.functions.rank import global_cummax

    df = _messy(spark, n=200)
    order = [F.col("v").asc(), F.col("k").asc()]
    empty = global_cummax(
        df.filter("v > 10000"), order, F.col("k").cast("bigint"), "m"
    )
    assert empty.count() == 0
    # decimal values survive the driver prefix fold exactly
    val = (F.col("k") % 97).cast("decimal(12,4)")
    got = global_cummax(df, order, val, "m", num_partitions=5)
    w = W.orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    want = df.withColumn("m", F.max(val).over(w))
    g = {r["k"]: str(r["m"]) for r in got.select("k", "m").collect()}
    e = {r["k"]: str(r["m"]) for r in want.select("k", "m").collect()}
    assert g == e


def test_adaptive_cummax_branches_agree(spark):
    from ccxt_ohlcv_fetcher_spark.functions.rank import adaptive_cummax

    df = _messy(spark, n=400)
    order = [F.col("v").asc(), F.col("k").asc()]
    val = (F.col("k") * 13 % 59).cast("bigint")
    for inclusive in (True, False):
        small = adaptive_cummax(
            df, order, val, "m", inclusive=inclusive, threshold=10_000
        )
        large = adaptive_cummax(
            df, order, val, "m", inclusive=inclusive, threshold=10
        )
        g = {r["k"]: r["m"] for r in small.select("k", "m").collect()}
        e = {r["k"]: r["m"] for r in large.select("k", "m").collect()}
        assert g == e, f"inclusive={inclusive}"
        plan = large._jdf.queryExecution().executedPlan().toString()
        assert "Exchange SinglePartition" not in plan


def test_skyline_min_max_vs_brute_force(spark):
    """skyline_min_max == the O(n^2) dominance definition on an
    adversarial fixture: duplicated (min,max) pairs (co-survivors),
    same-min-different-max groups, same-max-different-min chains, and
    NULLs in either attribute (excluded)."""
    from ccxt_ohlcv_fetcher_spark.functions.rank import skyline_min_max

    rows = [
        # (key, price, size)
        (1, 10.0, 5), (2, 10.0, 5),      # tie pair: both survive
        (3, 10.0, 3),                    # dominated within group
        (4, 9.0, 5),                     # dominates 1/2 on price
        (5, 9.0, 5),                     # its tie twin
        (6, 8.0, 2), (7, 12.0, 9),
        (8, 12.0, 9), (9, 11.0, 9),      # 9 dominates 7/8
        (10, None, 7), (11, 7.5, None),  # null attrs: excluded
        (12, 20.0, 1),                   # dominated by everything cheap+big
        (13, 7.0, 1),                    # cheapest: survives
    ]
    df = spark.createDataFrame(rows, "k int, price double, size int")
    got = sorted(
        r["k"] for r in skyline_min_max(df, "price", "size").collect()
    )
    clean = [(k, p, s) for k, p, s in rows if p is not None and s is not None]
    want = sorted(
        k
        for k, p, s in clean
        if not any(
            (qp <= p and qs >= s and (qp < p or qs > s))
            for _, qp, qs in clean
        )
    )
    assert got == want
    # and the same through the forced two-pass branch
    got2 = sorted(
        r["k"]
        for r in skyline_min_max(df, "price", "size", threshold=1).collect()
    )
    assert got2 == want


def test_global_cummax_nan_matches_window(spark):
    """Spark orders NaN above every double in max/greatest; the driver
    prefix fold must agree (t > acc is always False for NaN — the
    review-caught divergence): once a partition's max is NaN, every
    later row's running max is NaN in BOTH branches."""
    import math

    from ccxt_ohlcv_fetcher_spark.functions.rank import global_cummax

    rows = [(i, float(i % 7)) for i in range(200)]
    rows[40] = (40, float("nan"))
    df = spark.createDataFrame(rows, "k int, x double").repartition(7)
    order = [F.col("k").asc()]
    got = global_cummax(df, order, F.col("x"), "m", num_partitions=6)
    w = W.orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    want = df.withColumn("m", F.max("x").over(w))
    g = {r["k"]: r["m"] for r in got.select("k", "m").collect()}
    e = {r["k"]: r["m"] for r in want.select("k", "m").collect()}
    assert set(g) == set(e)
    for k in g:
        if isinstance(e[k], float) and math.isnan(e[k]):
            assert math.isnan(g[k]), k
        else:
            assert g[k] == e[k], k
    assert math.isnan(g[199])  # NaN propagated across partitions


def test_skyline_randomized_vs_brute_force(spark):
    """Seeded randomized skyline trials (both branches) against the
    O(n^2) dominance definition — heavy duplicate mass so tie
    co-survivors, same-min groups, and null rows all occur by
    construction."""
    import random

    from ccxt_ohlcv_fetcher_spark.functions.rank import skyline_min_max

    for seed in (3, 17, 41):
        rng = random.Random(seed)
        rows = []
        for k in range(300):
            price = (
                None if rng.random() < 0.05
                else float(rng.choice([1, 2, 3, 5, 8, 13, 21]))
            )
            size = None if rng.random() < 0.05 else rng.randrange(1, 9)
            rows.append((k, price, size))
        df = spark.createDataFrame(rows, "k int, price double, size int")
        clean = [r for r in rows if r[1] is not None and r[2] is not None]
        want = sorted(
            k
            for k, p, s in clean
            if not any(
                qp <= p and qs >= s and (qp < p or qs > s)
                for _, qp, qs in clean
            )
        )
        for threshold in (None, 1):  # window branch, forced two-pass
            got = sorted(
                r["k"]
                for r in skyline_min_max(
                    df, "price", "size", threshold=threshold
                ).collect()
            )
            assert got == want, (seed, threshold)


def test_cummax_randomized_vs_window(spark):
    """Seeded randomized running-max trials across both frames and
    branches vs the window form, with null values mixed in."""
    import random

    from ccxt_ohlcv_fetcher_spark.functions.rank import adaptive_cummax

    for seed in (7, 29):
        rng = random.Random(seed)
        rows = [
            (
                k,
                rng.randrange(0, 40),  # heavy order ties
                None if rng.random() < 0.1 else rng.randrange(-50, 50),
            )
            for k in range(400)
        ]
        df = spark.createDataFrame(rows, "k int, v int, x int").repartition(9)
        order = [F.col("v").asc(), F.col("k").asc()]
        for inclusive in (True, False):
            small = adaptive_cummax(
                df, order, F.col("x"), "m",
                inclusive=inclusive, threshold=10_000,
            )
            large = adaptive_cummax(
                df, order, F.col("x"), "m",
                inclusive=inclusive, threshold=10,
            )
            g = {r["k"]: r["m"] for r in small.select("k", "m").collect()}
            e = {r["k"]: r["m"] for r in large.select("k", "m").collect()}
            assert g == e, (seed, inclusive)
