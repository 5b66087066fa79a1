"""Fixture-table scans (op E1) and view registration.

Plain ``spark.read.parquet`` — Catalyst handles predicate pushdown and
column pruning, so callers express filters/projections declaratively and
let the scan prune (SURVEY.md §4).

Nanosecond-timestamp note: the ``events`` fixture stores
``timestamp[ns]``, which Spark 4 refuses by default
(PARQUET_TYPE_ILLEGAL). We flip ``spark.sql.legacy.parquet.nanosAsLong``
(a runtime conf) so the scan yields epoch-nanos longs, then rebuild a
proper ``TimestampType`` with integer arithmetic
(``timestamp_micros(ts DIV 1000)`` — floor to microseconds, exactly what
DuckDB's µs timestamps do, and no double-precision loss on ~1e18 nanos).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ccxt_ohlcv_fetcher_spark.schemas import FIXTURE_SCHEMAS, TABLE_NAMES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table from ``{sf_dir}/{name}.parquet``."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # tz-proof every query: date_trunc & friends are session-tz dependent
    # and the driver's session may not be UTC (runtime conf, safe to set)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    expected = FIXTURE_SCHEMAS.get(name)
    if expected is not None:
        actual = {f.name: f.dataType for f in df.schema.fields}
        for f in expected.fields:
            if isinstance(f.dataType, T.TimestampType) and isinstance(
                actual.get(f.name), T.LongType
            ):
                # epoch-nanos long (nanosAsLong) -> microsecond timestamp
                df = df.withColumn(
                    f.name, F.timestamp_micros(F.expr(f"{f.name} DIV 1000"))
                )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> None:
    """Register every fixture table as a temp view (for the SQL API)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
