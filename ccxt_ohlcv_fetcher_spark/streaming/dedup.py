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
never stores text. At-least-once foreachBatch redelivery is absorbed:
a re-delivered doc collides with its own stored buckets and drops out;
its first delivery's output append already landed (same guarantee
structure as the candle sink's anti-join, streaming/candles.py:105).

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

_STORE_SCHEMA = "band int, bucket bigint, doc_id long"


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
) -> tuple[DataFrame, DataFrame]:
    """One gate step: returns (accepted docs, their bucket rows).

    Pure DataFrame logic so it is unit-testable without a stream; the
    streaming sink below calls it per micro-batch.
    """
    buckets = batch_buckets(batch, content_col, id_col, k, bands, n)
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
    # cross-batch: any bucket already in the store -> drop
    if store is not None:
        hit = (
            surv_buckets.join(store, ["band", "bucket"], "left_semi")
            .select(id_col)
            .distinct()
        )
        survivors = survivors.join(F.broadcast(hit), id_col, "left_anti")
        surv_buckets = surv_buckets.join(F.broadcast(hit), id_col, "left_anti")
    return survivors, surv_buckets.select("band", "bucket", id_col)


def compact_bucket_store(spark, store_dir: str) -> int:
    """Rewrite the bucket store to one file per ``band=`` partition.

    Every micro-batch appends one small parquet file per band, so a
    long-running gate accumulates thousands of tiny files and the
    per-batch probe join pays open/footer cost per file — the same
    small-file problem the candle dataset's ``compact()`` solves, with
    the same fix: read, coalesce(1) per partition, write to a temp
    root, atomic directory swap. Run while the stream is stopped (the
    gate reads the store at batch start, so a swap mid-batch could
    serve a partial listing on non-atomic filesystems).

    Returns the number of band partitions rewritten.
    """
    import shutil
    import tempfile

    df = spark.read.schema(_STORE_SCHEMA).parquet(store_dir)
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
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Run the near-dup gate as a streaming sink: accepted docs append
    to ``out_dir`` (parquet), their bucket keys to ``store_dir``
    (parquet, Hive-partitioned by band for bucket-pruned probes)."""

    def write_batch(batch: DataFrame, _batch_id: int) -> None:
        spark = batch.sparkSession
        store = (
            spark.read.schema(_STORE_SCHEMA).parquet(store_dir)
            if os.path.isdir(store_dir) and os.listdir(store_dir)
            else None
        )
        accepted, buckets = neardup_gate_batch(
            batch, store, content_col, id_col, k, bands, n
        )
        # materialize the decision BEFORE appending to the store: the
        # accepted set must not see this batch's own store writes
        accepted = accepted.localCheckpoint(eager=True)
        buckets = buckets.localCheckpoint(eager=True)
        accepted.write.mode("append").parquet(out_dir)
        buckets.write.mode("append").partitionBy("band").parquet(store_dir)

    writer = (
        docs_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
