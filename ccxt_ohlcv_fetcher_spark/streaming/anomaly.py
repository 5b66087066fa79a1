"""Stream-static z-score anomaly quarantine on the candle sink
(ROUND_NOTES wishlist #4, second half).

A production ingest pipeline gates incoming candles against a BASELINE
learned from history: a candle whose close sits more than ``threshold``
standard deviations from its series' historical mean is quarantined
(exchange glitch, fat-finger print, unit change) instead of silently
joining the dataset the analytics read. The reference has no such gate
— bad exchange rows land verbatim (`ccxt-ohlcv-fetch.py:69-70`); this
is the warehouse-grade guard, composed from two pieces the engine
already has: the rule-based `operators/quality.py` gate (structural
invariants) and a STREAM-STATIC broadcast join (statistical baseline).

Shape notes for 100 TB:

- The baseline is per-(exchange, symbol, timeframe) mean/stddev — one
  row per series, thousands at most — computed ONCE from the historical
  dataset (a single partial-aggregated scan) and broadcast into every
  micro-batch: Structured Streaming's stream-static equi-join, no
  state, no shuffle of the stream side.
- Unknown series (no baseline row) pass through un-flagged: a new
  symbol's first candles cannot be anomalous against a baseline that
  does not exist (left join + null-safe predicate).
- The quarantine itself reuses the idempotent sink discipline: clean
  rows go through ``CandleDataset.append_idempotent`` exactly like
  `start_candle_sink`; quarantined rows append to a side dataset with
  the z-score attached, so they are auditable and replayable after the
  baseline is corrected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ccxt_ohlcv_fetcher_spark.operators.ingest import CandleDataset

SERIES_KEYS = ("exchange", "symbol", "timeframe")


def baseline_stats(history: DataFrame, value_col: str = "close") -> DataFrame:
    """Per-series mean/stddev of ``value_col`` from historical candles.
    One partial-aggregated scan; output is broadcast-sized (one row per
    series). Series with fewer than 2 points get a NULL stddev and
    never flag (can't z-score against no spread)."""
    return history.groupBy(*SERIES_KEYS).agg(
        F.avg(F.col(value_col).cast("double")).alias("_mu"),
        F.stddev_samp(F.col(value_col).cast("double")).alias("_sigma"),
        F.count(F.lit(1)).alias("_n_hist"),
    )


def zscore_flag(
    batch: DataFrame,
    baseline: DataFrame,
    value_col: str = "close",
    threshold: float = 4.0,
) -> DataFrame:
    """Input rows + ``zscore`` (double, NULL when no usable baseline)
    and ``is_anomaly`` (boolean, never NULL). Works identically on a
    static batch and on a streaming DataFrame (stream-static join)."""
    joined = batch.join(F.broadcast(baseline), list(SERIES_KEYS), "left")
    z = (F.col(value_col).cast("double") - F.col("_mu")) / F.col("_sigma")
    usable = F.col("_sigma").isNotNull() & (F.col("_sigma") > 0)
    return (
        joined.withColumn("zscore", F.when(usable, z))
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(F.col("zscore")) > threshold, F.lit(False)),
        )
        .drop("_mu", "_sigma", "_n_hist")
    )


def start_quarantined_candle_sink(
    candles: DataFrame,
    dataset: CandleDataset,
    baseline: DataFrame,
    timeframe: str,
    checkpoint_dir: str,
    quarantine_path: str,
    threshold: float = 4.0,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """`start_candle_sink` with the statistical gate in front: each
    micro-batch stream-static-joins the broadcast baseline, clean rows
    append idempotently to the dataset, anomalous rows (z-score
    attached) append to the quarantine path. Re-delivered batches stay
    exactly-once on the clean side (anti-join dedup); the quarantine
    side is an audit log, so duplicates there are acceptable and
    carry the batch id for reconciliation."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        flagged = zscore_flag(
            batch.withColumn("timeframe", F.lit(timeframe)),
            baseline,
            threshold=threshold,
        )
        for c in ("open", "high", "low", "close", "volume"):
            flagged = flagged.withColumn(c, F.col(c).cast("decimal(38,12)"))
        flagged = flagged.cache()
        try:
            bad = flagged.filter(F.col("is_anomaly"))
            if bad.limit(1).count():
                bad.withColumn("batch_id", F.lit(batch_id)).write.mode(
                    "append"
                ).parquet(quarantine_path)
            clean = flagged.filter(~F.col("is_anomaly")).drop(
                "zscore", "is_anomaly"
            )
            dataset.append_idempotent(clean)
        finally:
            flagged.unpersist()

    writer = (
        candles.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
