"""AQE skew-join handling (SURVEY.md §4 scale posture): a deliberately
skewed shuffle join must come out of adaptive execution with the hot
partition split (``SortMergeJoin(skew=true)`` + ``AQEShuffleRead ...
skewed`` in the final plan).

Also pins the *negative* case every pipeline author trips over: a
downstream aggregation on the join key makes the join's output
partitioning load-bearing, so AQE (correctly) refuses to split — the
fix at scale is salting or ``forceOptimizeSkewedJoin``, not waiting for
AQE magic.

Thresholds are scaled down (256 KB "skewed", 128 KB advisory) so a
~25 MB hot key demonstrates at test size exactly what default thresholds
(256 MB / 64 MB) do to a hot key at cluster scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_CONF = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    # the skew-split pins below read "SortMergeJoin(skew=true)" out of
    # the final plan, so pin the SMJ regime explicitly (the engine
    # default prefers shuffled-hash since r12)
    "spark.sql.join.preferSortMergeJoin": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128KB",
}


@pytest.fixture()
def skew_conf(spark):
    old = {}
    for k, v in _CONF.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — unset key
            old[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_join(spark):
    # key 0 carries ~75% of rows (one hot symbol); keys 1..99 are uniform
    left = (
        spark.range(300_000)
        .withColumn("k", F.lit(0))
        .unionByName(
            spark.range(99_000).withColumn("k", (F.col("id") % 99 + 1).cast("long"))
        )
        .withColumn("payload", F.concat(F.lit("x" * 64), F.col("id").cast("string")))
    )
    right = spark.range(100).withColumnRenamed("id", "k").withColumn("v", F.col("k") * 2)
    return left.join(right, "k")


def _final_plan(df) -> str:
    df.collect()  # AQE finalizes the plan only at execution
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_splits_skewed_join_partition(spark, skew_conf):
    out = _skewed_join(spark).select(F.sum(F.length("payload")).alias("s"))
    plan = _final_plan(out)
    assert "isFinalPlan=true" in plan
    assert "SortMergeJoin(skew=true)" in plan, plan
    assert "skewed" in plan  # AQEShuffleRead ... skewed on the fat side


def test_same_key_agg_suppresses_skew_split(spark, skew_conf):
    """Downstream groupBy on the join key needs the join's hash
    partitioning intact, so AQE refuses to split — the documented
    trade-off, pinned here so a future Spark upgrade that changes the
    behavior gets noticed."""
    out = _skewed_join(spark).groupBy("k").agg(F.count("*").alias("n"))
    plan = _final_plan(out)
    assert "isFinalPlan=true" in plan
    assert "SortMergeJoin(skew=true)" not in plan
