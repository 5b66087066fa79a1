"""Streaming near-dup ingest gate (north star; E34 + E28s-E31s
composition): MinHash-LSH dedup AT INGEST, across micro-batches.

The batch dedup operators (operators/dedup.py) answer "which docs in
this corpus are near-dups of each other"; a live pipeline needs the
other formulation — "is this incoming doc a near-dup of ANYTHING
already ingested" — without re-scanning the corpus per batch. The
standard layout: persist only each accepted doc's (band, bucket) keys
(k·8 bytes per doc, not the doc), and gate each micro-batch with one
join against that bucket store.

Per micro-batch (foreachBatch):

1. in-batch: MinHash band buckets for the batch's docs; docs colliding
   with a smaller-id doc in any band are dropped (same keep-min rule as
   ``exact_dedup``).
2. cross-batch: surviving docs whose ANY band bucket already exists in
   the store are dropped (left-anti against the store, bucket-pruned).
3. survivors append to the output sink; their buckets append to the
   store — so the store grows only by accepted docs.

Scale posture: the store is keyed by (band, bucket) — the join is an
equi-join on that pair, partition-prunable by ``band`` (a Hive
partition), and the per-batch probe side is one micro-batch. The store
never stores text.

Exactly-once output under at-least-once redelivery: every store row
carries ``ingest_batch``; the gate reads only rows from PRIOR batches
(``ingest_batch < batch_id``), so a retried batch recomputes the same
accept decision regardless of how much of its own previous attempt
landed. Both writes are then idempotent — the output sink is
partitioned by ``ingest_batch`` and overwritten per-partition
(dynamic partition overwrite: a retry replaces its own partition, never
double-appends), and the store append is anti-joined against the
batch's own already-landed rows, filling only gaps. Any crash point
between the two writes converges on retry.

Retention (bounded state, the ``dropDuplicatesWithinWatermark``
analog): store rows carry ``ingest_ms`` (the accepted doc's event
time); with ``retention_ms`` set, a probe at event time T only matches
store rows with ``ingest_ms >= T - retention_ms`` — older buckets no
longer block re-admission — and :func:`vacuum_bucket_store` physically
drops expired rows so the store's size tracks the retention window,
not ingest history (the reference's bounded-state resume loop keeps
only ``max(timestamp)``, ccxt-ohlcv-fetch.py:86-91 — same idea).

Reference parity note: the reference has no document pipeline at all;
this is the north-star extension (BASELINE.json line 6) applied to its
streaming-ingest shape (`ccxt-ohlcv-fetch.py:110-130`'s loop).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window as W

from ccxt_ohlcv_fetcher_spark.operators.dedup import (
    minhash_band_buckets,
    minhash_signatures,
)

_STORE_SCHEMA = (
    "band int, bucket bigint, doc_id long, ingest_ms long, ingest_batch long"
)


def batch_buckets(
    docs: DataFrame,
    content_col: str,
    id_col: str,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """(id, band, bucket) keys for a batch of docs."""
    sigs = minhash_signatures(docs, content_col, id_col, k=k, n=n)
    return minhash_band_buckets(sigs, id_col, bands=bands, rows_per_band=k // bands)


def neardup_gate_batch(
    batch: DataFrame,
    store: DataFrame | None,
    content_col: str,
    id_col: str,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    ts_col: str | None = None,
    retention_ms: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """One gate step: returns (accepted docs, their bucket rows
    ``(band, bucket, id, ingest_ms)``).

    ``ts_col`` (an epoch-ms bigint column of ``batch``) stamps each
    accepted doc's buckets with its event time; with ``retention_ms``
    set, a store row only blocks a probe whose event time is within
    the retention window of the row's ``ingest_ms`` (older matches are
    expired — the bucket store's watermark semantics).

    Pure DataFrame logic so it is unit-testable without a stream; the
    streaming sink below calls it per micro-batch.
    """
    buckets = batch_buckets(batch, content_col, id_col, k, bands, n)
    if ts_col is not None:
        buckets = buckets.join(
            batch.select(id_col, F.col(ts_col).cast("long").alias("_ts")), id_col
        )
    else:
        buckets = buckets.withColumn("_ts", F.lit(0).cast("long"))
    # in-batch: keep the smallest id per (band, bucket); a doc losing in
    # ANY band is a near-dup candidate of a kept doc -> drop it
    losers = (
        buckets.withColumn(
            "_min", F.min(id_col).over(W.partitionBy("band", "bucket"))
        )
        .filter(F.col(id_col) != F.col("_min"))
        .select(id_col)
        .distinct()
    )
    survivors = batch.join(F.broadcast(losers), id_col, "left_anti")
    surv_buckets = buckets.join(F.broadcast(losers), id_col, "left_anti")
    # cross-batch: any live bucket already in the store -> drop. Equi on
    # (band, bucket); the retention bound is a residual predicate, so
    # the join stays hash-partitioned and band-prunable.
    if store is not None:
        probe, st = surv_buckets.alias("p"), store.alias("s")
        on = (F.col("p.band") == F.col("s.band")) & (
            F.col("p.bucket") == F.col("s.bucket")
        )
        if retention_ms is not None:
            on = on & (
                F.col("s.ingest_ms") >= F.col("p._ts") - F.lit(int(retention_ms))
            )
        hit = probe.join(st, on, "left_semi").select(id_col).distinct()
        survivors = survivors.join(F.broadcast(hit), id_col, "left_anti")
        surv_buckets = surv_buckets.join(F.broadcast(hit), id_col, "left_anti")
    return survivors, surv_buckets.select(
        "band", "bucket", id_col, F.col("_ts").alias("ingest_ms")
    )


def recover_bucket_store(store_dir: str) -> None:
    """Heal the store after a crash mid directory-swap: the swap is two
    renames (store -> .old, tmp -> store), so a crash between them
    leaves only ``.old`` — without recovery the next gate run would
    treat the store as empty and re-admit near-dups of everything. If
    ``store_dir`` is missing but ``.old`` exists, restore it; if BOTH
    exist, the swap completed and ``.old`` is stale — drop it so a
    later swap's ``os.rename`` cannot collide with it."""
    import shutil

    old = store_dir.rstrip("/") + ".old"
    if not os.path.exists(old):
        return
    if os.path.exists(store_dir):
        shutil.rmtree(old)
    else:
        os.rename(old, store_dir)


def _rewrite_store(spark, store_dir: str, keep=None) -> int:
    """Shared swap mechanics of compaction and vacuum: read, optionally
    filter, rewrite one file per band partition to a temp root, swap.
    Returns the number of band partitions written."""
    import shutil
    import tempfile

    recover_bucket_store(store_dir)
    df = spark.read.schema(_STORE_SCHEMA).parquet(store_dir)
    if keep is not None:
        df = df.filter(keep)
    bands = [r["band"] for r in df.select("band").distinct().collect()]
    tmp = tempfile.mkdtemp(dir=os.path.dirname(os.path.abspath(store_dir)))
    (
        df.repartition(len(bands) or 1, "band")
        .sortWithinPartitions("band", "bucket")
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(tmp)
    )
    old = store_dir.rstrip("/") + ".old"
    os.rename(store_dir, old)
    os.rename(tmp, store_dir)
    shutil.rmtree(old)
    return len(bands)


def compact_bucket_store(spark, store_dir: str) -> int:
    """Rewrite the bucket store to one file per ``band=`` partition.

    Every micro-batch appends one small parquet file per band, so a
    long-running gate accumulates thousands of tiny files and the
    per-batch probe join pays open/footer cost per file — the same
    small-file problem the candle dataset's ``compact()`` solves, with
    the same fix: read, coalesce(1) per partition, write to a temp
    root, directory swap (crash-healed by :func:`recover_bucket_store`).
    Run while the stream is stopped (the gate reads the store at batch
    start, so a swap mid-batch could serve a partial listing on
    non-atomic filesystems).

    Returns the number of band partitions rewritten.
    """
    return _rewrite_store(spark, store_dir)


def vacuum_bucket_store(spark, store_dir: str, cutoff_ms: int) -> int:
    """Physically drop store rows with ``ingest_ms < cutoff_ms`` — the
    retention compaction that keeps the store's size proportional to
    the retention window instead of all-time ingest history. The gate's
    ``retention_ms`` residual already EXPIRES old rows logically; this
    reclaims their bytes (and compacts files, same swap as
    :func:`compact_bucket_store`). Run while the stream is stopped.

    Returns the number of surviving band partitions.
    """
    return _rewrite_store(spark, store_dir, keep=F.col("ingest_ms") >= int(cutoff_ms))


def start_neardup_gate(
    docs_stream: DataFrame,
    out_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    ts_col: str | None = None,
    retention_ms: int | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Run the near-dup gate as a streaming sink: accepted docs land in
    ``out_dir`` (parquet, partitioned by ``ingest_batch``), their bucket
    keys in ``store_dir`` (parquet, Hive-partitioned by band for
    bucket-pruned probes).

    Idempotent under foreachBatch redelivery (see module docstring):
    the gate decides against PRIOR batches' store rows only, the output
    write is a dynamic per-partition overwrite keyed by the batch id,
    and the store append fills only the rows its previous attempt did
    not land. ``ts_col``/``retention_ms`` bound the store's effective
    state by event time (vacuum with :func:`vacuum_bucket_store`)."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        recover_bucket_store(store_dir)
        store = (
            spark.read.schema(_STORE_SCHEMA).parquet(store_dir)
            if os.path.isdir(store_dir) and os.listdir(store_dir)
            else None
        )
        prior = store.filter(F.col("ingest_batch") < batch_id) if store is not None else None
        accepted, buckets = neardup_gate_batch(
            batch, prior, content_col, id_col, k, bands, n, ts_col, retention_ms
        )
        # materialize the decision ONCE; both writes below reuse it
        accepted = accepted.localCheckpoint(eager=True)
        buckets = buckets.withColumn(
            "ingest_batch", F.lit(batch_id).cast("long")
        ).localCheckpoint(eager=True)
        (
            accepted.withColumn("ingest_batch", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(out_dir)
        )
        own = (
            store.filter(F.col("ingest_batch") == batch_id)
            if store is not None
            else None
        )
        if own is not None:
            # a retried batch appends only the bucket rows its previous
            # attempt did not land (candle-sink anti-join idempotency)
            buckets = buckets.join(
                own.select("band", "bucket", id_col),
                ["band", "bucket", id_col],
                "left_anti",
            )
        buckets.write.mode("append").partitionBy("band").parquet(store_dir)

    writer = (
        docs_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
