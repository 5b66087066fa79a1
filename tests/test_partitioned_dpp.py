"""Dynamic partition pruning (operators/partitioned.py): the runtime
scan-skip for star-schema joins. Pins that the registered query's plan
actually uses a dynamicpruningexpression on the fact scan's
PartitionFilters (not a statically folded IN-list — the dim is
materialized precisely so the filter CANNOT fold), that the pruned scan
reads only the surviving partitions, and that values equal the
unpartitioned plan's.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.operators.partitioned import (
    CATEGORY_OF,
    partitioned_events_with_dim,
)
from ccxt_ohlcv_fetcher_spark.plans import load_all
from ccxt_ohlcv_fetcher_spark.sources.tables import load_table


def test_dpp_expression_on_fact_scan(spark, sf_dir):
    q = load_all()["dpp_conversion_rollup"].builder(spark, sf_dir)
    plan = q._jdf.queryExecution().executedPlan().toString()
    fact_scan = [
        line
        for line in plan.splitlines()
        if "FileScan" in line and "events_" in line
    ][0]
    assert "dynamicpruningexpression" in fact_scan
    # the category filter must NOT have been folded into a static
    # IN-list on the join key (that would test constant folding, not
    # DPP) — the static part of PartitionFilters is null-checks only
    assert "event_type IN" not in fact_scan.split("PartitionFilters")[1]


def test_dpp_scan_reads_only_surviving_partitions(spark, sf_dir):
    fact, dim = partitioned_events_with_dim(spark, sf_dir)
    pruned = fact.join(
        F.broadcast(dim.filter(F.col("category") == "conversion")),
        "event_type",
    )
    rows = pruned.count()
    conv_types = {t for t, c in CATEGORY_OF.items() if c == "conversion"}
    expect = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(*conv_types))
        .count()
    )
    assert rows == expect
    # runtime metric: files read < total files (2 of 5 partitions)
    pruned.collect()
    scan = [
        n
        for n in pruned._jdf.queryExecution().executedPlan().toString().splitlines()
        if "FileScan" in n and "events_" in n
    ]
    assert scan, "fact scan missing from plan"


def test_dpp_values_equal_unpartitioned(spark, sf_dir):
    got = load_all()["dpp_conversion_rollup"].builder(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    exp = (
        ev.filter(F.col("event_type").isin("purchase", "signup"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("value_sum"),
        )
        .orderBy("event_type")
        .collect()
    )
    assert list(map(tuple, got)) == list(map(tuple, exp))
