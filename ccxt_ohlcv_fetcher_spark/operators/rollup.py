"""Incremental candle-rollup maintenance — a tiny materialized-view layer
over ``CandleDataset`` (the continuous-aggregate / hypertable-rollup
analog for the reference's data model).

The reference stores only the finest timeframe it fetched
(`ccxt-ohlcv-fetch.py:134-138` — one SQLite file per (exchange, symbol,
timeframe)); any coarser view is recomputed from scratch by whoever
queries it. At 100 TB that re-scan is the bottleneck, so this module
maintains coarse candles (1m -> 1h -> 1d ...) **incrementally on
append**, exploiting two facts:

1. **OHLC rollup is associative** (tests/test_resample_chain.py): 1d
   candles built from stored 1h candles equal 1d candles built from raw
   1m — so each level refreshes from the *previous* level, touching
   ~1/60th the rows a raw re-scan would.
2. **Appends are tail-only and buckets close monotonically** (the
   reference's own incomplete-candle rule, `last_candle_is_incomplete`,
   `ccxt-ohlcv-fetch.py:141-163`): a bucket whose end lies at or before
   the source's coverage horizon can never change again. We therefore
   materialize **only closed buckets**, which makes refresh pure-append:
   no rewrite, no merge, no tombstones. Idempotency re-uses
   ``CandleDataset.append_idempotent``'s pruned anti-join, so a crashed
   or re-run refresh is safe.

Scale posture: every step is relational — per-key refresh cursors and
coverage horizons are tiny aggregates broadcast back against the source,
so one refresh is one shuffle per level over just the tail rows newer
than each key's last materialized bucket (parquet row-group min/max
stats skip the rest of history). No driver-side loop over symbols.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.functions.timeframe import timeframe_interval_expr
from ccxt_ohlcv_fetcher_spark.operators.ingest import CandleDataset
from ccxt_ohlcv_fetcher_spark.operators.resample import resample_candles
from ccxt_ohlcv_fetcher_spark.schemas import PRICE_TYPE

_COLS = ("timestamp", "open", "high", "low", "close", "volume")
_KEYS = ("exchange", "symbol")


class MaterializedRollups:
    """Maintains a ladder of coarser candle datasets over a base dataset.

    ``levels`` must coarsen monotonically with aligned buckets (each
    level's bucket width a whole multiple of the previous level's), so
    that level *i* can refresh from level *i-1* by associativity.
    All levels live in one Hive-partitioned dataset whose ``timeframe``
    partition value is the level — so a reader prunes straight to the
    granularity it wants, exactly like reading the base dataset.
    """

    def __init__(
        self,
        spark: SparkSession,
        base: CandleDataset,
        path: str,
        levels: tuple[str, ...] = ("1h", "1d"),
        base_timeframe: str = "1m",
        date_bucket: str | None = None,
        logged: bool = False,
    ):
        """``date_bucket`` gives the rollup store the same bounded-
        maintenance layout as the plain base dataset (see
        ``CandleDataset.__init__``): refresh appends prune at the
        directory level and retention is ``store.vacuum(...)`` — a
        directory delete, no rewrite. Coarse levels have few rows per
        bucket, so pick the bucket at least as coarse as the base's
        (typically ``month``).

        ``logged=True`` backs the rollup STORE with the snapshot log
        instead (the CLI default layout since round 7): refresh appends
        are atomic commits, retention is the metadata-only
        ``retention(older_than_ms)`` + ``vacuum()``, and readers get
        snapshot isolation + time travel over the rollup ladder. The
        refresh logic is layout-agnostic — both stores expose the same
        read / _exists / append_idempotent contract."""
        self.spark = spark
        self.base = base
        self.base_timeframe = base_timeframe
        self.levels = tuple(levels)
        if logged:
            if date_bucket:
                raise ValueError(
                    "logged rollup store prunes by manifest stats, "
                    "not dt= dirs — date_bucket and logged are exclusive"
                )
            from ccxt_ohlcv_fetcher_spark.operators.candle_log import (
                SnapshotCandleDataset,
            )

            self.store = SnapshotCandleDataset(spark, path)
        else:
            self.store = CandleDataset(spark, path, date_bucket=date_bucket)

    def read(
        self,
        timeframe: str,
        exchange: str | None = None,
        symbol: str | None = None,
    ) -> DataFrame:
        """Partition-pruned scan of one rollup level."""
        return self.store.read(exchange, symbol, timeframe)

    def refresh(self) -> dict[str, int]:
        """Bring every level up to date; returns rows appended per level.

        Levels refresh finest-first so each reads the just-refreshed
        previous level. Running refresh twice in a row appends nothing
        the second time (closed buckets never change; the anti-join
        drops re-derived rows).
        """
        appended: dict[str, int] = {}
        source_tf = self.base_timeframe
        for i, level in enumerate(self.levels):
            if i == 0:
                source = (
                    self.base.read(timeframe=source_tf)
                    if self.base._exists()
                    else None
                )
            else:
                source = (
                    self.store.read(timeframe=source_tf)
                    if self.store._exists()
                    else None
                )
            appended[level] = (
                0 if source is None else self._refresh_level(source, source_tf, level)
            )
            source_tf = level
        return appended

    def _refresh_level(self, source: DataFrame, source_tf: str, level: str) -> int:
        level_iv = timeframe_interval_expr(level)
        src_iv = timeframe_interval_expr(source_tf)
        ts_instant = F.timestamp_millis(F.col("timestamp"))

        # Refresh cursor: per key, the last materialized bucket. Source
        # rows at or before it are already rolled up — prune them out
        # (row-group stats make this skip, not scan, old history).
        if self.store._exists():
            last = (
                self.store.read(timeframe=level)
                .groupBy(*_KEYS)
                .agg(F.max("timestamp").alias("_last_ts"))
            )
            source = (
                source.join(F.broadcast(last), list(_KEYS), "left")
                .filter(
                    F.col("_last_ts").isNull()
                    | (ts_instant >= F.timestamp_millis(F.col("_last_ts")) + level_iv)
                )
                .drop("_last_ts")
            )

        # Coverage horizon: per key, data is final through
        # max(source ts) + source timeframe. Buckets ending at or before
        # the horizon are closed; the open tail bucket is NOT
        # materialized (it would need a rewrite when it grows — readers
        # wanting it union a live resample of the tail instead).
        cover = source.groupBy(*_KEYS).agg(F.max("timestamp").alias("_cover_ts"))
        rolled = (
            resample_candles(source, level, keys=_KEYS)
            .join(F.broadcast(cover), list(_KEYS))
            .filter(
                ts_instant + level_iv
                <= F.timestamp_millis(F.col("_cover_ts")) + src_iv
            )
            .drop("_cover_ts")
            .withColumn("timeframe", F.lit(level))
        )
        for c in _COLS[1:]:
            rolled = rolled.withColumn(c, F.col(c).cast(PRICE_TYPE))
        return self.store.append_idempotent(
            rolled.select(*_COLS, *_KEYS, "timeframe")
        )


def read_with_live_tail(
    rollups: MaterializedRollups,
    timeframe: str,
    exchange: str | None = None,
    symbol: str | None = None,
) -> DataFrame:
    """One coherent view per rollup level: materialized closed buckets
    UNION a live resample of base rows newer than each key's last
    materialized bucket — so the still-open bucket is served without
    ever being written (writing it would force a rewrite when it grows;
    see the module docstring's closed-bucket rule).

    Scale: the stored side is a pruned scan; the live side re-aggregates
    only the tail newer than the per-key refresh cursor (row-group
    min/max stats skip everything older), i.e. at most one open bucket's
    worth of base rows per key.
    """
    level_iv = timeframe_interval_expr(timeframe)
    base = rollups.base.read(exchange, symbol, rollups.base_timeframe)
    if not rollups.store._exists():
        # nothing materialized yet: the whole view is a live resample
        live = resample_candles(base, timeframe, keys=_KEYS).withColumn(
            "timeframe", F.lit(timeframe)
        )
        for c in _COLS[1:]:
            live = live.withColumn(c, F.col(c).cast(PRICE_TYPE))
        return live.select(*_COLS, *_KEYS, "timeframe")
    stored = rollups.read(timeframe, exchange, symbol)
    last = stored.groupBy(*_KEYS).agg(F.max("timestamp").alias("_last_ts"))
    tail = (
        base.join(F.broadcast(last), list(_KEYS), "left")
        .filter(
            F.col("_last_ts").isNull()
            | (
                F.timestamp_millis(F.col("timestamp"))
                >= F.timestamp_millis(F.col("_last_ts")) + level_iv
            )
        )
        .drop("_last_ts")
    )
    live = resample_candles(tail, timeframe, keys=_KEYS).withColumn(
        "timeframe", F.lit(timeframe)
    )
    for c in _COLS[1:]:
        live = live.withColumn(c, F.col(c).cast(PRICE_TYPE))
    return stored.select(*_COLS, *_KEYS, "timeframe").unionByName(
        live.select(*_COLS, *_KEYS, "timeframe")
    )
