"""Training-shard writer (north-star pipeline op): the step after
cleaning/packing — write the corpus as JSONL shards of bounded token
size with a committed manifest, the layout tokenizer workers consume.

Sharding rule: within each language, docs are packed in doc_id order
(same deterministic cumulative-sum rule as the ``doc_sequence_packing``
query) and a shard holds ``shard_tokens`` worth of consecutive packs —
so shard membership is a pure expression (no shuffle beyond the one
per-lang window), reproducible across runs and cluster sizes, and
stable under append (old docs never change shard).

Output layout: ``{path}/lang=<l>/shard=<s>/*.json`` (one JSONL file
per shard — tokenizer workers map 1:1 onto shards) plus a parquet
manifest at ``{path}/_manifest`` with per-shard doc/token counts; a
consumer checks completeness against the manifest, not a directory
listing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ccxt_ohlcv_fetcher_spark.operators.text import token_count


def assign_shards(
    docs: DataFrame,
    shard_tokens: int = 1 << 14,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Adds (n_tokens, shard) columns; shard is per-language, bounded
    at ~``shard_tokens`` tokens (a shard may exceed it by at most one
    document — the concat-then-chunk rule)."""
    t = docs.withColumn("n_tokens", token_count(text_col))
    cum = F.sum("n_tokens").over(
        W.partitionBy(lang_col).orderBy(id_col).rowsBetween(W.unboundedPreceding, 0)
    )
    return t.withColumn(
        "shard", ((cum - F.col("n_tokens")) / shard_tokens).cast("bigint")
    )


def write_training_shards(
    docs: DataFrame,
    path: str,
    shard_tokens: int = 1 << 14,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Write JSONL shards + manifest; returns the manifest DataFrame."""
    sharded = assign_shards(docs, shard_tokens, lang_col, id_col, text_col)
    (
        sharded.repartition(lang_col, "shard")
        .sortWithinPartitions(lang_col, "shard", id_col)
        .write.mode("overwrite")
        .partitionBy(lang_col, "shard")
        .json(path)
    )
    manifest = sharded.groupBy(lang_col, "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min(id_col).alias("first_id"),
        F.max(id_col).alias("last_id"),
    )
    manifest.write.mode("overwrite").parquet(path.rstrip("/") + "/_manifest")
    return manifest
