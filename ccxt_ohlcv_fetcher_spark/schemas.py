"""Declared schemas — the engine never infers schema at run time.

The reference declares its one table up front as a SQLAlchemy ORM model
(`ccxt-ohlcv-fetch.py:35-51`) and validates all inputs before running
(`:213-301`); we mirror that schema-on-write discipline with explicit
``StructType``s.

``CANDLES_SCHEMA`` mirrors the reference's `candles` table
(`ccxt-ohlcv-fetch.py:38-45`): epoch-ms integer primary key plus
decimal-as-string OHLCV columns (`:39-43` store prices as `String` for
lossless decimal preservation — we use DecimalType(38,12)). The three
partition columns encode the reference's directory layout
`ccxt/{exchange}/{symbol}/{timeframe}/...` (`gen_db_name`, `:134-138`).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Decimal faithful to the reference's string-stored prices (:39-43).
PRICE_TYPE = T.DecimalType(38, 12)

# --- Reference-derived table (SURVEY.md §1.1) ---------------------------
CANDLES_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.LongType(), False),  # epoch ms (:38,:60)
        T.StructField("open", PRICE_TYPE, True),
        T.StructField("high", PRICE_TYPE, True),
        T.StructField("low", PRICE_TYPE, True),
        T.StructField("close", PRICE_TYPE, True),
        T.StructField("volume", PRICE_TYPE, True),
        # partition columns (gen_db_name, :134-138)
        T.StructField("exchange", T.StringType(), False),
        T.StructField("symbol", T.StringType(), False),
        T.StructField("timeframe", T.StringType(), False),
    ]
)

# Raw 6-wide API row as returned by the paging source (SURVEY.md §1.2;
# `exchange.fetch_ohlcv` rows unpacked positionally at :57-66).
OHLCV_ROW_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("volume", T.DoubleType(), True),
    ]
)

# --- Driver fixture tables (FIXTURES.md §A) ------------------------------
FIXTURE_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES = tuple(FIXTURE_SCHEMAS)

# JSON schema of events.props (FIXTURES.md: `{"k": 87}`), op E26.
EVENT_PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])
