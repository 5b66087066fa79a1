"""Data-quality constraint checking (the dbt-test / Deequ-style gate a
production candle pipeline runs before publishing a dataset).

``check_rules`` evaluates named boolean predicates per row and returns
the violations in long format (one row per failed rule per input row)
— a single projection + filter per rule, unioned; no shuffle, fully
codegen. ``candle_rules`` encodes the OHLCV invariants implied by the
reference's data model (`ccxt-ohlcv-fetch.py:35-51` + the bucket
alignment rule `:141-163`): low <= min(open, close), high >= max(open,
close), non-negative volume, and timestamp alignment to the timeframe
grid.

At 100 TB: violations are rare, so each rule's filter scans once and
emits almost nothing — run it as part of the write job (same scan) or
as a cheap audit pass; the output is small enough to broadcast into a
quarantine anti-join.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def candle_rules(tf_ms: int) -> dict[str, Column]:
    """OHLCV invariants; each Column is TRUE when the row PASSES."""
    return {
        "low_le_body": F.col("low") <= F.least(F.col("open"), F.col("close")),
        "high_ge_body": F.col("high") >= F.greatest(F.col("open"), F.col("close")),
        "volume_non_negative": F.col("volume") >= 0,
        "ts_grid_aligned": F.col("timestamp") % tf_ms == 0,
    }


def check_rules(
    df: DataFrame, rules: dict[str, Column], id_cols: tuple[str, ...]
) -> DataFrame:
    """Violations in long format: (*id_cols, rule). A NULL predicate
    counts as a violation (unknown is not a pass)."""
    parts = [
        df.filter(~F.coalesce(pred, F.lit(False))).select(
            *id_cols, F.lit(name).alias("rule")
        )
        for name, pred in rules.items()
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def quarantine(
    df: DataFrame, rules: dict[str, Column], id_cols: tuple[str, ...]
) -> tuple[DataFrame, DataFrame]:
    """(clean rows, violating rows): the gate form — violating rows are
    anti-joined out by id so one bad rule removes the whole row."""
    bad_ids = check_rules(df, rules, id_cols).select(*id_cols).distinct()
    clean = df.join(F.broadcast(bad_ids), list(id_cols), "left_anti")
    bad = df.join(F.broadcast(bad_ids), list(id_cols), "left_semi")
    return clean, bad
