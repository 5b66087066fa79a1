"""Persisted ANN index (op E35, the build-once/query-many shape).

`ann_cosine_topk` re-buckets the corpus on every query — right for
ad-hoc use, wrong for a served index over a 100 TB embedding store.
This module writes the sign-LSH layout to disk ONCE, Hive-partitioned
by bucket, so each query's probe set prunes to n_probe directories at
the SCAN (PartitionFilters, no shuffle, no full-corpus read):

- ``build_ann_index``: corpus -> (bucket=<b>/) parquet, vectors stored
  with their pre-computed norms (norm hoisting done at build time, not
  per query).
- ``query_ann_index``: load with a bucket IN (...) predicate from the
  queries' (multiprobe) bucket set, exact re-rank inside the probed
  partitions. The probed bucket ids are computed driver-side from the
  query vectors — a tiny collect (|Q| rows), which is what makes the
  partition pruning STATIC (visible in the plan as PartitionFilters)
  instead of a runtime join.

At 100 TB: the index write is one shuffle on bucket; a query touches
``|probes| / 2^n_planes`` of the directories. Rebuild = rerun build
(deterministic hyperplanes -> same layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.functions.arrays import dot_product
from ccxt_ohlcv_fetcher_spark.operators.similarity import (
    _with_norm,
    plane_dots,
    sign_lsh_buckets,
)


def build_ann_index(
    corpus: DataFrame,
    path: str,
    dim: int,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Write the bucket-partitioned LSH index; returns #buckets written."""
    indexed = sign_lsh_buckets(
        _with_norm(corpus, vec_col, "norm"), vec_col, n_planes, dim
    ).select(id_col, vec_col, "norm", "bucket")
    indexed.write.mode("overwrite").partitionBy("bucket").parquet(path)
    return 2**n_planes


def query_ann_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 4,
    multiprobe: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "q_id",
    query_vec: str = "q_vec",
) -> DataFrame:
    """Top-k against the stored index. The probe buckets (home + the
    ``multiprobe`` tightest-margin flips per query, same adaptive rule
    as ``ann_cosine_topk``) become a STATIC ``bucket IN (...)``
    predicate, so the parquet scan prunes to the probed directories."""
    q = sign_lsh_buckets(_with_norm(queries, query_vec, "_qn"), query_vec, n_planes, dim)
    if multiprobe:
        m = min(multiprobe, n_planes)
        dots = plane_dots(query_vec, n_planes, dim)
        margins = F.transform(
            dots, lambda d, i: F.struct(F.abs(d).alias("m"), i.alias("j"))
        )
        flips = F.slice(F.array_sort(margins), 1, m)["j"]
        probes = F.concat(
            F.array(F.col("bucket")),
            F.transform(
                flips,
                lambda j: F.col("bucket").bitwiseXOR(
                    F.pow(F.lit(2.0), j.cast("double")).cast("bigint")
                ),
            ),
        )
        q = q.withColumn("bucket", F.explode(probes))
    # driver-side probe set (|Q| * (1+m) longs) -> static partition filter
    probe_buckets = sorted(
        {r["bucket"] for r in q.select("bucket").distinct().collect()}
    )
    index = spark.read.parquet(path).filter(F.col("bucket").isin(probe_buckets))
    candidates = index.join(F.broadcast(q), "bucket").select(
        query_id,
        F.col(id_col),
        (dot_product(vec_col, query_vec) / (F.col("norm") * F.col("_qn"))).alias(
            "score"
        ),
    )
    item = F.struct((-F.col("score")).alias("neg"), F.col(id_col).alias("id"))
    return (
        candidates.groupBy(query_id)
        .agg(F.slice(F.array_sort(F.collect_list(item)), 1, k).alias("_top"))
        .select(query_id, F.posexplode("_top").alias("pos", "item"))
        .select(
            query_id,
            F.col("item.id").alias(id_col),
            (-F.col("item.neg")).alias("score"),
            (F.col("pos") + 1).alias("rank"),
        )
    )
