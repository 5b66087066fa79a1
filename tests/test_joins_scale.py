"""Scale-path join strategies: skew salting and bucketed co-located
joins (SURVEY.md §4 posture; PERFORMANCE.md §3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.operators.joins import salted_join


def test_salted_join_matches_plain_join(spark):
    # skewed big side: one hot key carries 90% of rows
    big = spark.createDataFrame(
        [("hot" if i % 10 else f"k{i}", i) for i in range(1000)],
        "key string, v long",
    )
    small = spark.createDataFrame(
        [("hot", 1.0)] + [(f"k{i}", float(i)) for i in range(0, 1000, 10)],
        "key string, w double",
    )
    plain = big.join(small, "key").select("key", "v", "w")
    salted = salted_join(big, small, ["key"], n_salts=8).select("key", "v", "w")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Pre-bucketing both sides on the join key removes the join-time
    Exchange entirely — the co-located join pattern for repeated joins
    of 100 TB facts on the same key."""
    left = spark.createDataFrame(
        [(i, f"a{i}") for i in range(1000)], "k long, a string"
    )
    right = spark.createDataFrame(
        [(i, f"b{i}") for i in range(0, 1000, 2)], "k long, b string"
    )
    for name, df in (("bkt_left", left), ("bkt_right", right)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "k")
            .sortBy("k")
            .option("path", str(tmp_path / name))
            .saveAsTable(name)
        )
    # disable auto-broadcast so the planner exercises the sort-merge
    # path a 100 TB x 100 TB join would take (a broadcastable side would
    # make bucketing moot anyway)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for name in ("bkt_left", "bkt_right"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_asof_join_tolerance_numeric_ts(spark):
    """tolerance on NUMERIC ts columns (epoch-ms bigints): the delta is
    in the column's native units; an in-window prior row matches, an
    older one nulls out, and tolerance=None keeps it (control)."""
    from ccxt_ohlcv_fetcher_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "k", 10_000), (2, "k", 50_000)], "id long, key string, ts long"
    )
    right = spark.createDataFrame(
        [("k", 9_000, 1.5), ("k", 20_000, 2.5)], "key string, rts long, px double"
    )
    out = {
        r["id"]: r["asof_px"]
        for r in asof_join(
            left, right, keys=["key"], left_ts="ts", right_ts="rts",
            right_payload=["px"], tolerance=5_000,
        ).collect()
    }
    assert out[1] == 1.5          # 10_000 - 9_000 = 1_000 <= 5_000
    assert out[2] is None         # 50_000 - 20_000 = 30_000 > 5_000
    unbounded = {
        r["id"]: r["asof_px"]
        for r in asof_join(
            left, right, keys=["key"], left_ts="ts", right_ts="rts",
            right_payload=["px"],
        ).collect()
    }
    assert unbounded == {1: 1.5, 2: 2.5}


def test_asof_join_forward_inclusive_strict_tolerance(spark):
    """direction='forward': earliest right at-or-after left; strict
    excludes the equal-ts row; tolerance bounds the look-AHEAD."""
    from ccxt_ohlcv_fetcher_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "k", 10_000), (2, "k", 30_000), (3, "k", 90_000)],
        "id long, key string, ts long",
    )
    right = spark.createDataFrame(
        [("k", 10_000, 1.0), ("k", 40_000, 2.0)],
        "key string, rts long, px double",
    )

    def run(**kw):
        return {
            r["id"]: r["asof_px"]
            for r in asof_join(
                left, right, keys=["key"], left_ts="ts", right_ts="rts",
                right_payload=["px"], direction="forward", **kw,
            ).collect()
        }

    assert run() == {1: 1.0, 2: 2.0, 3: None}  # inclusive: equal ts matches
    assert run(strict=True) == {1: 2.0, 2: 2.0, 3: None}  # equal ts excluded
    # tolerance: row 2 needs a 10_000-unit look-ahead; 5_000 cuts it off
    assert run(tolerance=5_000) == {1: 1.0, 2: None, 3: None}


def test_runtime_bloom_filter_injects_on_selective_dim_join(spark):
    """Spark's runtime row-level bloom filter (on by default) guards on
    applicationSideScanSizeThreshold=10GB — i.e. it exists FOR the
    100 TB regime and correctly stays out of the way on small scans.
    Pin both halves: (a) default thresholds -> no bloom at test scale,
    (b) thresholds simulating a big application-side scan -> Catalyst
    injects bloom_filter_agg on the filtered dim and probes it on the
    fact side before the shuffle, and the result is unchanged."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    thr = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    prev_thr = spark.conf.get(thr)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        part = spark.read.parquet(f"{sf_dir}/part.parquet").filter("p_size = 1")

        def build():
            return (
                li.join(part, li.l_partkey == part.p_partkey)
                .groupBy("p_brand")
                .count()
            )

        base = build()
        base_plan = base._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" not in base_plan  # small scan: guarded off
        expected = {(r["p_brand"], r["count"]) for r in base.collect()}

        spark.conf.set(thr, "0")
        boosted = build()
        plan = boosted._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan
        got = {(r["p_brand"], r["count"]) for r in boosted.collect()}
        assert got == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set(thr, prev_thr)
