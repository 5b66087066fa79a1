"""Streaming near-dup ingest gate (streaming/dedup.py): in-batch
keep-min, cross-batch drop against the persisted bucket store, and the
pure-batch gate function's semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.streaming.dedup import (
    batch_buckets,
    neardup_gate_batch,
    start_neardup_gate,
)

DOCS_SCHEMA = "doc_id long, text string"
TEXT_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
TEXT_B = "one two three four five six seven eight nine ten eleven twelve"
TEXT_C = "red orange yellow green blue indigo violet crimson teal navy"


def test_gate_batch_in_batch_and_cross_batch(spark):
    b1 = spark.createDataFrame([(1, TEXT_A), (2, TEXT_A), (3, TEXT_B)], DOCS_SCHEMA)
    acc1, buck1 = neardup_gate_batch(b1, None, "text", "doc_id")
    assert sorted(r["doc_id"] for r in acc1.collect()) == [1, 3]
    store = buck1
    assert sorted(set(r["doc_id"] for r in store.collect())) == [1, 3]

    b2 = spark.createDataFrame([(4, TEXT_A), (5, TEXT_C)], DOCS_SCHEMA)
    acc2, buck2 = neardup_gate_batch(b2, store, "text", "doc_id")
    assert [r["doc_id"] for r in acc2.collect()] == [5]
    assert set(r["doc_id"] for r in buck2.collect()) == {5}


def test_streaming_gate_end_to_end(spark, tmp_path):
    """Two micro-batches through the real stream: the second batch's
    near-dup of batch one's doc is dropped by the persisted store."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    store_dir = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(1, TEXT_A), (2, TEXT_A), (3, TEXT_B)], DOCS_SCHEMA
    ).coalesce(1).write.mode("append").parquet(in_dir)
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(in_dir)
    q = start_neardup_gate(stream, out_dir, store_dir, ckpt)
    q.awaitTermination(120)

    got1 = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    assert got1 == [1, 3]

    spark.createDataFrame([(4, TEXT_A), (5, TEXT_C)], DOCS_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(in_dir)
    q2 = start_neardup_gate(
        spark.readStream.schema(DOCS_SCHEMA).parquet(in_dir),
        out_dir,
        store_dir,
        ckpt,
    )
    q2.awaitTermination(120)

    got2 = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    assert got2 == [1, 3, 5], f"cross-batch near-dup leaked: {got2}"
    # store only ever holds accepted docs' buckets
    store_ids = set(r["doc_id"] for r in spark.read.parquet(store_dir).collect())
    assert store_ids == {1, 3, 5}


def test_bucket_keys_are_stable(spark):
    """Same content -> same (band, bucket) keys across calls (the store
    only works if bucketing is deterministic)."""
    df = spark.createDataFrame([(7, TEXT_A)], DOCS_SCHEMA)
    k1 = {(r["band"], r["bucket"]) for r in batch_buckets(df, "text", "doc_id").collect()}
    k2 = {(r["band"], r["bucket"]) for r in batch_buckets(df, "text", "doc_id").collect()}
    assert k1 == k2 and len(k1) == 4


def test_gate_absorbs_redelivered_batch(spark):
    """foreachBatch is at-least-once: a re-delivered batch must accept
    NOTHING (every accepted doc collides with its own stored buckets),
    so the output sink never double-appends."""
    b = spark.createDataFrame([(1, TEXT_A), (3, TEXT_B)], DOCS_SCHEMA)
    acc1, buck1 = neardup_gate_batch(b, None, "text", "doc_id")
    assert sorted(r["doc_id"] for r in acc1.collect()) == [1, 3]
    acc2, buck2 = neardup_gate_batch(b, buck1, "text", "doc_id")
    assert acc2.count() == 0 and buck2.count() == 0


def test_bucket_store_compaction(spark, tmp_path):
    """After two micro-batch appends each band dir holds 2 files;
    compaction rewrites to 1 file per band with identical rows, and the
    gate still dedupes against the compacted store."""
    import glob

    from ccxt_ohlcv_fetcher_spark.streaming.dedup import compact_bucket_store

    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    store_dir, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")

    for batch in ([(1, TEXT_A)], [(2, TEXT_B)]):
        spark.createDataFrame(batch, DOCS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        q = start_neardup_gate(
            spark.readStream.schema(DOCS_SCHEMA).parquet(in_dir),
            out_dir, store_dir, ckpt,
        )
        q.awaitTermination(120)

    def files_per_band():
        return {
            d: len(glob.glob(d + "/*.parquet"))
            for d in glob.glob(store_dir + "/band=*")
        }

    before_rows = sorted(
        (r["band"], r["bucket"], r["doc_id"])
        for r in spark.read.parquet(store_dir).collect()
    )
    assert all(n == 2 for n in files_per_band().values())
    assert compact_bucket_store(spark, store_dir) == 4
    assert all(n == 1 for n in files_per_band().values())
    after_rows = sorted(
        (r["band"], r["bucket"], r["doc_id"])
        for r in spark.read.parquet(store_dir).collect()
    )
    assert after_rows == before_rows
    # gate still dedupes against the compacted store
    store = spark.read.parquet(store_dir)
    acc, _ = neardup_gate_batch(
        spark.createDataFrame([(9, TEXT_A), (10, TEXT_C)], DOCS_SCHEMA),
        store, "text", "doc_id",
    )
    assert [r["doc_id"] for r in acc.collect()] == [10]
