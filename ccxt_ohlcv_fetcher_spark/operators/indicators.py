"""Technical indicators over candle series (the reference's users'
downstream workload on the data `ccxt-ohlcv-fetch.py` collects).

All indicators are frame/cumulative window expressions (E20/E21) with
the exact-decimal-sum discipline from plans/registry.py: every frame
aggregate folds through DECIMAL before any float arithmetic, so the
result is independent of Spark's window fold order (and bit-matches
the DuckDB oracle in the registry demo).

Keyed form: pass ``keys=("exchange", "symbol")`` and every window
partitions by the key — one independent series per key, parallel
across keys, state bounded by the frame width. The unkeyed form
(keys=()) is a single global series: inherently sequential, fine for
one symbol, a deliberate non-goal at 100 TB (Spark warns about the
single-partition window — that warning is the design feedback).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W, WindowSpec


def _dec(col: Column) -> Column:
    return col.cast("decimal(18,6)")


def candle_indicator_frame(
    candles: DataFrame,
    keys: tuple[str, ...] = ("exchange", "symbol"),
    close_col: str = "close",
    order_col: str = "timestamp",
    periods: int = 5,
) -> DataFrame:
    """Adds sma / boll_hw / rsi / drawdown columns over each key's
    candle series (``periods``-row frames; drawdown vs the running
    peak). Input must be one row per (keys..., order_col)."""

    def over(base: WindowSpec) -> WindowSpec:
        return base.partitionBy(*keys) if keys else base

    f = over(W.orderBy(order_col)).rowsBetween(-(periods - 1), 0)
    cum = over(W.orderBy(order_col)).rowsBetween(W.unboundedPreceding, 0)
    lag1 = over(W.orderBy(order_col))
    close = F.col(close_col).cast("double")

    w = candles.withColumns(
        {
            "_s": F.sum(_dec(close)).over(f).cast("double"),
            "_ss": F.sum(_dec(close * close)).over(f).cast("double"),
            "_n": F.count(F.lit(1)).over(f).cast("double"),
            "_diff": close - F.lag(close).over(lag1),
            "_peak": F.max(close).over(cum),
        }
    )
    d = F.col("_diff")
    g = w.withColumns(
        {
            "_gain": F.sum(_dec(F.greatest(d, F.lit(0.0)))).over(f).cast("double"),
            "_loss": F.sum(_dec(F.greatest(-d, F.lit(0.0)))).over(f).cast("double"),
        }
    )
    out = g.withColumns(
        {
            "sma": F.col("_s") / F.col("_n"),
            "boll_hw": F.sqrt(
                F.greatest(
                    (F.col("_ss") - F.col("_s") * F.col("_s") / F.col("_n"))
                    / F.nullif(F.col("_n") - 1, F.lit(0.0)),
                    F.lit(0.0),
                )
            ),
            "rsi": F.when(F.col("_loss") == 0, F.lit(100.0)).otherwise(
                F.lit(100.0)
                - F.lit(100.0) / (F.lit(1.0) + F.col("_gain") / F.col("_loss"))
            ),
            "drawdown": close / F.col("_peak") - F.lit(1.0),
        }
    )
    return out.drop("_s", "_ss", "_n", "_diff", "_peak", "_gain", "_loss")


def ema_fold(
    candles: DataFrame,
    keys: tuple[str, ...] = ("exchange", "symbol"),
    close_col: str = "close",
    order_col: str = "timestamp",
    alpha: float = 0.25,
) -> DataFrame:
    """Per-key exponential moving average — the one indicator a plain
    window frame cannot express (weights decay over the whole history).

    Shape: ONE shuffle (groupBy keys -> collect_list), then a row-local
    prefix LEFT FOLD of ``E = alpha*x + (1-alpha)*E`` per output row.
    Both Spark's ``aggregate`` and DuckDB's ``list_reduce`` fold
    sequentially left-to-right, so the float trajectory is bit-identical
    across engines (no pow(), whose libm rounding could differ).

    O(n^2) per key but parallel ACROSS keys — the per-series length n is
    bounded by the key's own history (per-(exchange,symbol) candles),
    never by corpus size, so the shape survives adding symbols (how a
    candle store grows at 100 TB). For a single key with unbounded
    history, slice the prefix to a truncation window W before folding:
    (1-alpha)^W underflows a double's ulp at W≈128 for alpha=0.25 —
    numerically exact, but no longer bit-pinnable against a full-prefix
    oracle, so it is a documented option rather than the default.
    """
    a, b = F.lit(float(alpha)), F.lit(1.0 - float(alpha))
    item = F.struct(
        F.col(order_col).alias("o"), F.col(close_col).cast("double").alias("c")
    )
    series = candles.groupBy(*keys).agg(
        F.array_sort(F.collect_list(item)).alias("_s")
    )
    rows = series.select(*keys, F.posexplode("_s").alias("_i", "_row"), "_s")
    prefix = F.transform(
        F.slice(F.col("_s"), 1, F.col("_i") + 1), lambda r: r["c"]
    )
    ema = F.aggregate(
        prefix,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(a * x + b * acc),
    )
    return rows.select(
        *keys,
        F.col("_row.o").alias(order_col),
        F.col("_row.c").alias(close_col),
        ema.alias("ema"),
    )


def holt_fold(
    candles: DataFrame,
    keys: tuple[str, ...] = ("exchange", "symbol"),
    close_col: str = "close",
    order_col: str = "timestamp",
    alpha: float = 0.25,
    gamma: float = 0.125,
) -> DataFrame:
    """Per-key Holt double-exponential smoothing (level + trend), the
    trend-aware sibling of :func:`ema_fold`:

        l' = alpha*x + (1-alpha)*(l + t)
        t' = gamma*(l' - l) + (1-gamma)*t        (l0 = x0, t0 = 0)

    plus the one-step-ahead forecast ``l + t`` per row. Like the EMA,
    the recurrence weights the whole history, so no window frame
    expresses it; the shape is the same ONE shuffle (groupBy keys ->
    sorted collect_list) followed by a row-local prefix fold — here the
    accumulator is the 2-state ``[level, trend]`` array.

    Cross-engine exactness: both Spark ``aggregate`` and DuckDB
    ``list_reduce`` fold strictly left-to-right, and the default
    coefficients (1/4 and 1/8) are binary-exact doubles, so the float
    trajectory is bit-identical to the oracle with the arithmetic
    written in the same association order. Same O(n^2)-per-key /
    parallel-across-keys scale posture as ema_fold (see its docstring
    for the truncation-window option on unbounded single series).
    """
    a, b = F.lit(float(alpha)), F.lit(1.0 - float(alpha))
    g, h = F.lit(float(gamma)), F.lit(1.0 - float(gamma))
    item = F.struct(
        F.col(order_col).alias("o"), F.col(close_col).cast("double").alias("c")
    )
    series = candles.groupBy(*keys).agg(
        F.array_sort(F.collect_list(item)).alias("_s")
    )
    rows = series.select(*keys, F.posexplode("_s").alias("_i", "_row"), "_s")
    prefix = F.transform(
        F.slice(F.col("_s"), 1, F.col("_i") + 1), lambda r: r["c"]
    )

    def step(acc, x):
        lvl, trd = F.element_at(acc, 1), F.element_at(acc, 2)
        new_lvl = a * x + b * (lvl + trd)
        new_trd = g * (new_lvl - lvl) + h * trd
        return F.when(
            F.size(acc) == 0, F.array(x, F.lit(0.0))
        ).otherwise(F.array(new_lvl, new_trd))

    state = F.aggregate(prefix, F.expr("CAST(array() AS ARRAY<DOUBLE>)"), step)
    return rows.select(
        *keys,
        F.col("_row.o").alias(order_col),
        F.col("_row.c").alias(close_col),
        F.element_at(state, 1).alias("level"),
        F.element_at(state, 2).alias("trend"),
        (F.element_at(state, 1) + F.element_at(state, 2)).alias("forecast"),
    )
