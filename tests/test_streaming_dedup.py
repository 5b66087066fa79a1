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


def test_gate_retention_expires_old_buckets(spark, tmp_path):
    """With retention_ms set, a store match OLDER than the probe's
    event time minus retention no longer blocks admission, while a
    within-retention match still rejects — across a stream restart."""
    TS_SCHEMA = "doc_id long, text string, ts long"
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    store_dir, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")

    def run(rows):
        spark.createDataFrame(rows, TS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        q = start_neardup_gate(
            spark.readStream.schema(TS_SCHEMA).parquet(in_dir),
            out_dir, store_dir, ckpt,
            ts_col="ts", retention_ms=10_000,
        )
        q.awaitTermination(120)

    run([(1, TEXT_A, 1_000), (2, TEXT_B, 1_000)])
    # restart: doc 10 probes TEXT_A at ts 50k -> A's bucket (ingest 1k)
    # is outside the 10k window -> ADMITTED; doc 11 probes TEXT_B at
    # ts 5k -> B's bucket is within retention -> rejected
    run([(10, TEXT_A, 50_000), (11, TEXT_B, 5_000)])
    got = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    assert got == [1, 2, 10], got

    # vacuum physically drops expired rows; live rows survive
    from ccxt_ohlcv_fetcher_spark.streaming.dedup import vacuum_bucket_store

    vacuum_bucket_store(spark, store_dir, cutoff_ms=40_000)
    left = {r["doc_id"] for r in spark.read.parquet(store_dir).collect()}
    assert left == {10}, left


def test_gate_redelivery_is_idempotent_at_sink_level(spark, tmp_path):
    """Replay batch 0 through a FRESH checkpoint against the same
    out/store dirs (the crash-retry shape where any prefix of the
    previous attempt's writes landed): the output partition is
    overwritten, not double-appended, and the store gains no duplicate
    bucket rows."""
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    store_dir = str(tmp_path / "store")

    spark.createDataFrame(
        [(1, TEXT_A), (3, TEXT_B)], DOCS_SCHEMA
    ).coalesce(1).write.mode("append").parquet(in_dir)

    for attempt in ("ckpt1", "ckpt2"):
        q = start_neardup_gate(
            spark.readStream.schema(DOCS_SCHEMA).parquet(in_dir),
            out_dir, store_dir, str(tmp_path / attempt),
        )
        q.awaitTermination(120)

    out = [r["doc_id"] for r in spark.read.parquet(out_dir).collect()]
    assert sorted(out) == [1, 3], f"redelivered batch double-appended: {out}"
    store_rows = [
        (r["band"], r["bucket"], r["doc_id"])
        for r in spark.read.parquet(store_dir).collect()
    ]
    assert len(store_rows) == len(set(store_rows)), "duplicate store rows"


def test_store_recovery_after_failed_swap(spark, tmp_path):
    """A crash between the two swap renames leaves only '.old'; recovery
    restores it and the gate still dedupes. A stale '.old' NEXT TO a
    live store is cleaned up so the next swap cannot collide."""
    import os
    import shutil

    from ccxt_ohlcv_fetcher_spark.streaming.dedup import (
        compact_bucket_store,
        recover_bucket_store,
    )

    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    store_dir, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    spark.createDataFrame([(1, TEXT_A)], DOCS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    q = start_neardup_gate(
        spark.readStream.schema(DOCS_SCHEMA).parquet(in_dir),
        out_dir, store_dir, ckpt,
    )
    q.awaitTermination(120)

    # crash after the first rename: only .old exists
    os.rename(store_dir, store_dir + ".old")
    recover_bucket_store(store_dir)
    assert os.path.isdir(store_dir) and not os.path.exists(store_dir + ".old")
    acc, _ = neardup_gate_batch(
        spark.createDataFrame([(9, TEXT_A)], DOCS_SCHEMA),
        spark.read.parquet(store_dir), "text", "doc_id",
    )
    assert acc.count() == 0, "recovered store lost its buckets"

    # stale .old alongside a live store: compaction must clean and run
    shutil.copytree(store_dir, store_dir + ".old")
    assert compact_bucket_store(spark, store_dir) >= 1
    assert not os.path.exists(store_dir + ".old")


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
