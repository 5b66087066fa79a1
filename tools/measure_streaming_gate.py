"""Measured larger-batch run of the streaming near-dup ingest gate
(VERDICT r5 item 8): feed the sf0.1 documents table through
``neardup_gate_batch`` in micro-batches with an accumulating bucket
store and event-time retention, and report per-batch wall time, store
growth, accept/drop counts, and the retention-expiry effect.

Usage: python tools/measure_streaming_gate.py [sf_dir] [n_batches]

Numbers from a run are committed to PERFORMANCE.md §9 — this script
exists so the measurement is reproducible, not a one-off.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.session import get_spark
from ccxt_ohlcv_fetcher_spark.streaming.dedup import neardup_gate_batch


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("gate_measure")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    per = n // n_batches
    # synthetic event time: one "hour" per batch, so a retention window
    # of 2 hours expires batch b's buckets at batch b+2
    HOUR = 3_600_000
    retention = 2 * HOUR

    store = None
    total_in = total_kept = 0
    print(f"{n} docs, {n_batches} batches of ~{per}, retention={retention}ms")
    for b in range(n_batches):
        batch = docs.filter(
            (F.col("doc_id") % n_batches) == b
        ).withColumn("ts", F.lit(b * HOUR).cast("long"))
        t0 = time.time()
        kept, buckets = neardup_gate_batch(
            batch, store, "text", "doc_id",
            ts_col="ts", retention_ms=retention,
        )
        kept = kept.localCheckpoint(eager=True)
        buckets = buckets.localCheckpoint(eager=True)
        n_in, n_kept = batch.count(), kept.count()
        store = buckets if store is None else store.unionByName(buckets)
        store = store.localCheckpoint(eager=True)
        n_store = store.count()
        live = store.filter(
            F.col("ingest_ms") >= (b * HOUR) - retention
        ).count()
        wall = time.time() - t0
        total_in += n_in
        total_kept += n_kept
        print(
            f"batch {b}: in={n_in} kept={n_kept} "
            f"dropped={n_in - n_kept} store_rows={n_store} "
            f"live_rows={live} ({live / n_store:.0%} unexpired) "
            f"wall={wall:.2f}s"
        )
    print(
        f"total: in={total_in} kept={total_kept} "
        f"({total_kept / total_in:.1%} pass rate)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
