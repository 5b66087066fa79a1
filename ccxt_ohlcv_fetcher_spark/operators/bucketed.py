"""Bucketed-table layout: pre-shuffle a table ONCE at write time so
every later join/aggregation on the bucket key runs shuffle-free.

Spark's ``bucketBy(n, col)`` hash-partitions rows into ``n`` buckets
(``pmod(murmur3(col), n)``) at WRITE time and records the layout in the
catalog. A scan of the table then reports ``HashPartitioning(col, n)``
as its output partitioning, so EnsureRequirements inserts NO Exchange
for joins or aggregations keyed on the bucket column — the shuffle that
dominates big-join cost at 100 TB is paid once, at ingest, instead of
per query. Two tables bucketed to the same count on their join keys
sort-merge-join with zero shuffles on either side.

This is the classic warehouse answer to "the same fact-table join runs
every hour": at 100 TB a lineitem⋈orders shuffle moves the whole table
across the cluster every query; bucketed on the join key it moves
nothing. The reference's per-symbol SQLite files
(ccxt-ohlcv-fetch.py:134-138) are the degenerate form of the same idea
— co-locate by key at write time — scaled here to Spark's hash-bucket
layout with catalog-enforced metadata.

Fixture-scale note: the tables are small enough that AQE would happily
broadcast them, which ALSO avoids the shuffle — the plan-invariant
test therefore pins the bucketed shape with broadcast disabled (the
100 TB regime, where neither side fits in memory), while the registry
queries stay strategy-agnostic (their oracle checks values, not plans).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.sources.tables import load_table

# (session id, sf_dir, table, bucket col, n) -> catalog table name; the
# build is an eager one-time write, so reuse within a session matters
_MEMO: dict[tuple, str] = {}


def bucketed_view(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    base_dir: str = "/tmp/spark_graft_bucketed",
) -> DataFrame:
    """The fixture table as a catalog-registered BUCKETED external
    table (built on first use per session, reused after): returns
    ``spark.table(name)`` whose scan carries
    ``HashPartitioning(bucket_col, n_buckets)``.

    ``repartition(n_buckets, bucket_col)`` before the write uses the
    same murmur3-pmod routing as the bucket-id assignment, so each
    task holds exactly one bucket's rows and each bucket lands in ONE
    file — which is what lets Spark trust the ``sortBy`` order at scan
    time and skip the join-side sort as well."""
    key = (id(spark), sf_dir, table, bucket_col, n_buckets)
    name = _MEMO.get(key)
    if name is not None and spark.catalog.tableExists(name):
        return spark.table(name)
    digest = hashlib.md5(
        f"{sf_dir}|{table}|{bucket_col}|{n_buckets}".encode()
    ).hexdigest()[:10]
    name = f"bkt_{table}_{digest}"
    path = os.path.join(base_dir, name)
    if spark.catalog.tableExists(name):
        spark.sql(f"DROP TABLE {name}")
    (
        load_table(spark, sf_dir, table)
        .repartition(n_buckets, F.col(bucket_col))
        .write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(name)
    )
    _MEMO[key] = name
    return spark.table(name)
