"""Training-shard writer (operators/shards.py): bounded shard sizes,
one file per shard, manifest consistency, append stability.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.operators.shards import (
    assign_shards,
    write_training_shards,
)
from ccxt_ohlcv_fetcher_spark.sources.tables import load_table

SHARD_TOKENS = 2000


def test_write_training_shards_roundtrip_and_manifest(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    path = str(tmp_path / "shards")
    manifest = write_training_shards(docs, path, shard_tokens=SHARD_TOKENS)

    back = spark.read.json(path)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()

    # one JSONL file per shard directory (tokenizer workers map 1:1)
    for d in glob.glob(path + "/lang=*/shard=*"):
        assert len(glob.glob(d + "/*.json")) == 1, d

    # manifest matches a recount from the written data
    m = {(r["lang"], r["shard"]): (r["n_docs"], r["n_tokens"]) for r in manifest.collect()}
    recount = {
        (r["lang"], r["shard"]): (r["nd"], r["nt"])
        for r in back.groupBy("lang", "shard")
        .agg(F.count(F.lit(1)).alias("nd"), F.sum("n_tokens").alias("nt"))
        .collect()
    }
    assert m == recount

    # bounded: a shard exceeds the target by at most one document
    max_doc = {
        r["lang"]: r["mx"]
        for r in back.groupBy("lang").agg(F.max("n_tokens").alias("mx")).collect()
    }
    for (lang, _), (_, n_tokens) in m.items():
        assert n_tokens <= SHARD_TOKENS + max_doc[lang], (lang, n_tokens)


def test_assign_shards_deterministic_and_append_stable(spark, sf_dir):
    """Same input -> same shards; appending NEW docs (higher ids) never
    changes an existing doc's shard (cumulative sums only grow at the
    tail of each language's id order)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    a = {r["doc_id"]: r["shard"] for r in assign_shards(docs, SHARD_TOKENS).collect()}
    b = {r["doc_id"]: r["shard"] for r in assign_shards(docs, SHARD_TOKENS).collect()}
    assert a == b
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    grown = docs.unionByName(
        docs.limit(20).select(
            (F.col("doc_id") + max_id + 1).alias("doc_id"), "lang", "text"
        )
    )
    c = {r["doc_id"]: r["shard"] for r in assign_shards(grown, SHARD_TOKENS).collect()}
    assert all(c[k] == v for k, v in a.items()), "append moved an existing doc"
