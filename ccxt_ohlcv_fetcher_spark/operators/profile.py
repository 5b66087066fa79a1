"""Schema-driven dataset profiler (the Deequ-analyzer / df.describe
shape, long format): one single-pass aggregation computing, per column,
row count, null count, distinct count, and typed min/max — numeric
columns (and timestamps, as epoch-ms) land in ``min_num``/``max_num``
doubles, strings land verbatim in ``min_str``/``max_str``.

Generalizes the hand-written events profile query to ANY DataFrame: the
measure list derives from ``df.schema``, the unpivot scaffold is a
generated ``stack``. One scan, one job. ``exact_distinct=False`` swaps
the exact COUNT(DISTINCT)s (which plan through Spark's Expand — one
duplicated pass per distinct column) for ``approx_count_distinct`` HLL
sketches, the 100 TB default: partial-aggregable, no Expand, ~2%% RSE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PROFILE_COLUMNS = (
    "col_name", "n_rows", "n_nulls", "n_distinct",
    "min_num", "max_num", "min_str", "max_str",
)

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_TS = (T.TimestampType, T.TimestampNTZType, T.DateType)


def _num_expr(name: str, dt: T.DataType) -> Column | None:
    if isinstance(dt, _NUMERIC):
        return F.col(name).cast("double")
    if isinstance(dt, _TS):
        return F.unix_millis(F.col(name).cast("timestamp")).cast("double")
    return None


def _bt(name: str) -> str:
    """Backtick-quote an identifier for interpolation into F.expr
    (embedded backticks double, Spark's own escape rule)."""
    return "`" + name.replace("`", "``") + "`"


def _str_lit(name: str) -> str:
    """Single-quoted SQL string literal with quote/backslash escapes."""
    return "'" + name.replace("\\", "\\\\").replace("'", "\\'") + "'"


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Long-format profile of ``cols`` (default: every column whose type
    is numeric, timestamp, or string; others are skipped). Column names
    may contain any character: internal aliases are positional and every
    interpolated identifier/literal in the generated stack() is quoted."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    if cols is None:
        cols = [
            n for n, dt in fields.items()
            if _num_expr(n, dt) is not None or isinstance(dt, T.StringType)
        ]
    cnt = F.count(F.lit(1))
    aggs = [cnt.alias("n_rows")]
    stack_rows = []
    for i, name in enumerate(cols):
        dt = fields[name]
        src = F.col(_bt(name))
        num = _num_expr(_bt(name), dt)
        distinct = (
            F.countDistinct(src)
            if exact_distinct
            else F.approx_count_distinct(src)
        )
        aggs.append((cnt - F.count(src)).alias(f"_null_{i}"))
        aggs.append(distinct.alias(f"_dist_{i}"))
        if num is not None:
            aggs.append(F.min(num).alias(f"_min_{i}"))
            aggs.append(F.max(num).alias(f"_max_{i}"))
            row = (
                f"{_str_lit(name)}, n_rows, _null_{i}, _dist_{i}, "
                f"_min_{i}, _max_{i}, "
                "CAST(NULL AS STRING), CAST(NULL AS STRING)"
            )
        else:
            aggs.append(F.min(src).alias(f"_min_{i}"))
            aggs.append(F.max(src).alias(f"_max_{i}"))
            row = (
                f"{_str_lit(name)}, n_rows, _null_{i}, _dist_{i}, "
                "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), "
                f"_min_{i}, _max_{i}"
            )
        stack_rows.append(row)
    agg = df.agg(*aggs)
    stack = (
        f"stack({len(cols)}, " + ", ".join(stack_rows)
        + f") AS ({', '.join(PROFILE_COLUMNS)})"
    )
    return agg.select(F.expr(stack))
