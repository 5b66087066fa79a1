"""Structured Streaming surface (SURVEY.md §2.9, ops E28s-E32s).

The reference's ingest loop is an unbounded micro-batch stream with a
persisted offset (`ccxt-ohlcv-fetch.py:110-130`; SURVEY.md §1.4). Two
equivalent Spark formulations live in this package:

- the *incremental batch* driver loop (``sources/paging.py``) — the
  literal analog, used for REST-paged sources where page N+1's request
  depends on page N's data;
- this module: *Structured Streaming* proper, for sources Spark can
  track offsets for (files landing in a directory, Kafka, rate...).

Semantics mapping:

- E28s trigger loop (`:113`, backoff `:27,:101`) -> ``trigger(...)`` /
  ``Trigger.AvailableNow`` + checkpointed offsets.
- E29s offset = max stored ts (`:86-91,:275`) -> ``checkpointLocation``
  (exactly-once source tracking instead of sink-derived resume).
- E30s incomplete-candle close-out (`last_candle_is_incomplete`,
  `:141-163`) -> ``withWatermark(ts, delay)`` + tumbling window in
  append mode: a bucket is emitted only once the watermark passes its
  end — the watermark IS the incomplete-candle rule.
- E31s duplicate/late handling (`:71-75,:104`) -> ``dropDuplicates``
  within the watermark + the idempotent foreachBatch sink.
- E32s sliding/session windows: beyond the reference's tumbling-only
  grammar (`:142`); ``window(ts, size, slide)`` / ``session_window``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ccxt_ohlcv_fetcher_spark.functions.timeframe import timeframe_to_spark_interval
from ccxt_ohlcv_fetcher_spark.operators.ingest import CandleDataset

# Tick stream schema: what a streaming exchange feed delivers (trade
# ticks; the streaming generalization of the reference's poll rows).
TICK_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("exchange", T.StringType(), False),
        T.StructField("symbol", T.StringType(), False),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("amount", T.DoubleType(), True),
    ]
)


def read_tick_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source tick stream: parquet files landing in ``input_dir``.
    Declared schema (no inference) per the engine's schema-on-write
    discipline; maxFilesPerTrigger bounds micro-batch size (the
    streaming analog of the reference's one-page-per-iteration)."""
    return (
        spark.readStream.schema(TICK_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )


def streaming_ohlcv(
    ticks: DataFrame,
    timeframe: str,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """E30s: tumbling OHLCV candles emitted only when complete.

    Append-mode semantics: a (symbol, bucket) row is produced exactly
    once, after the event-time watermark passes the bucket end — the
    declarative form of `last_candle_is_incomplete` + the tail-trim at
    `ccxt-ohlcv-fetch.py:122-124`. Late ticks within ``watermark_delay``
    still land in their bucket; later ones are dropped (E31s policy,
    matching the reference's drop-and-ignore)."""
    interval = timeframe_to_spark_interval(timeframe)
    return (
        ticks.withWatermark("ts", watermark_delay)
        .groupBy(
            F.col("exchange"),
            F.col("symbol"),
            F.window("ts", interval).alias("w"),
        )
        .agg(
            F.min_by("price", "ts").alias("open"),
            F.max("price").alias("high"),
            F.min("price").alias("low"),
            F.max_by("price", "ts").alias("close"),
            F.sum("amount").alias("volume"),
        )
        .select(
            "exchange",
            "symbol",
            F.unix_millis(F.col("w.start")).alias("timestamp"),
            "open",
            "high",
            "low",
            "close",
            "volume",
        )
    )


def start_candle_sink(
    candles: DataFrame,
    dataset: CandleDataset,
    timeframe: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    rollups=None,
) -> StreamingQuery:
    """E28s/E29s/E31s: write the candle stream into the partitioned
    dataset through the idempotent appender (foreachBatch). Offsets live
    in the checkpoint; re-delivered micro-batches (at-least-once
    foreachBatch) are absorbed by the anti-join dedup — end-to-end
    exactly-once on the sink.

    ``rollups`` (optional ``operators/rollup.py:MaterializedRollups``
    over ``dataset``): refreshed after each appended micro-batch, so
    coarse candles (1h/1d) stay current as the stream lands — the
    streaming form of continuous-aggregate maintenance. Refresh is
    itself idempotent (closed buckets only + anti-join), so a
    re-delivered batch refreshes into a no-op.

    When ``dataset`` is transactional (``append_idempotent`` accepts
    ``txn=``, i.e. ``SnapshotCandleDataset``), each micro-batch commits
    with ``txn=(app_id, batch_id)`` where app_id derives from the
    checkpoint location — the same identity Spark uses for offset
    tracking — so a re-delivered batch is recognized from the commit
    log alone (metadata read, zero data jobs) instead of being
    re-anti-joined. That is Delta's ``txnAppId/txnVersion`` pattern;
    the anti-join remains as defense in depth for rows that overlap
    across DIFFERENT writers (concurrent backfill + stream)."""
    import inspect
    import os as _os

    supports_txn = (
        "txn" in inspect.signature(dataset.append_idempotent).parameters
    )
    app_id = "candle_sink:" + _os.path.abspath(checkpoint_dir)

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        out = (
            batch.withColumn("timeframe", F.lit(timeframe))
            .withColumn("open", F.col("open").cast("decimal(38,12)"))
            .withColumn("high", F.col("high").cast("decimal(38,12)"))
            .withColumn("low", F.col("low").cast("decimal(38,12)"))
            .withColumn("close", F.col("close").cast("decimal(38,12)"))
            .withColumn("volume", F.col("volume").cast("decimal(38,12)"))
        )
        if supports_txn:
            appended = dataset.append_idempotent(out, txn=(app_id, batch_id))
        else:
            appended = dataset.append_idempotent(out)
        if appended and rollups is not None:
            rollups.refresh()

    writer = (
        candles.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sliding_volume(ticks: DataFrame, size: str, slide: str) -> DataFrame:
    """E32s sliding windows: overlapping volume aggregation."""
    return (
        ticks.withWatermark("ts", "0 seconds")
        .groupBy(F.col("symbol"), F.window("ts", size, slide).alias("w"))
        .agg(F.sum("amount").alias("volume"), F.count(F.lit(1)).alias("n_ticks"))
        .select(
            "symbol",
            F.unix_millis(F.col("w.start")).alias("win_start_ms"),
            F.unix_millis(F.col("w.end")).alias("win_end_ms"),
            "volume",
            "n_ticks",
        )
    )


def session_windows(ticks: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """E32s session windows: dynamic-gap sessions (native
    session_window — the streaming-capable form of the batch
    sessionization in plans/windows.py)."""
    return (
        ticks.withWatermark("ts", "0 seconds")
        .groupBy(F.col("symbol"), F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_ticks"), F.sum("amount").alias("volume"))
        .select(
            "symbol",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            F.unix_millis(F.col("w.end")).alias("session_end_ms"),
            "n_ticks",
            "volume",
        )
    )
