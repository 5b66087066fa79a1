"""Legacy SQLite ingestion (op E2) — migrate the reference's per-symbol
SQLite files into the partitioned parquet dataset.

The reference persists one SQLite file per (exchange, symbol, timeframe)
at ``ccxt/{exchange}/{symbol}/{timeframe}/{e}_{s}_{tf}.sqlite``
(`gen_db_name`, ``ccxt-ohlcv-fetch.py:134-138``) with schema
``candles(timestamp INTEGER PRIMARY KEY, open/high/low/close/volume
VARCHAR)`` (`:35-45` — prices are decimal-as-text). A user switching to
this engine runs :func:`migrate_sqlite_tree` once and their whole
history becomes one partition-pruned parquet dataset.

Spark-first shape: there is no SQLite JDBC driver in this environment,
and none is needed — SQLite files are single-node artifacts, so the
scalable read is *one task per file*: distribute the discovered file
paths as a DataFrame and open each file with stdlib ``sqlite3`` inside
an Arrow-batched ``mapInPandas`` kernel. A 10k-file tree becomes a
10k-task scan with no driver bottleneck (files must be on a shared
filesystem, as they would be for any migration). Values stay
decimal-as-text until a final ``cast(decimal(38,12))`` — lossless, per
the reference's string storage.
"""

from __future__ import annotations

import os
import re
import sqlite3

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.operators.ingest import CandleDataset

# {exchange}/{symbol}/{timeframe}/{exchange}_{symbol}_{timeframe}.sqlite
_LAYOUT_RE = re.compile(r"([^/]+)/([^/]+)/([^/]+)/[^/]+\.sqlite$")

_RAW_SCHEMA = (
    "exchange string, symbol string, timeframe string, timestamp long, "
    "open string, high string, low string, close string, volume string"
)

DECIMAL = "decimal(38,12)"


def discover_sqlite_files(root: str) -> list[dict[str, str]]:
    """Walk the reference layout -> one dict per file with its partition
    identity parsed from the path (the inverse of `gen_db_name`,
    `ccxt-ohlcv-fetch.py:134-138`)."""
    found = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in sorted(filenames):
            if not fn.endswith(".sqlite"):
                continue
            full = os.path.join(dirpath, fn)
            m = _LAYOUT_RE.search(full.replace(os.sep, "/"))
            if m:
                exchange, symbol, timeframe = m.groups()
                found.append(
                    {
                        "path": full,
                        "exchange": exchange,
                        "symbol": symbol,
                        "timeframe": timeframe,
                    }
                )
    return found


def read_sqlite_candles(spark: SparkSession, files: list[dict[str, str]]) -> DataFrame:
    """Distributed scan of legacy SQLite files: one executor-side
    ``sqlite3`` read per file, Arrow-batched back to the JVM.

    Output columns: partition identity + the reference's candle schema
    with prices as text (cast downstream; ``timestamp`` is epoch-ms).
    """
    import pandas as pd  # noqa: PLC0415 — imported in the kernel's closure

    meta = spark.createDataFrame(
        [(f["path"], f["exchange"], f["symbol"], f["timeframe"]) for f in files],
        "path string, exchange string, symbol string, timeframe string",
    ).repartition(max(len(files), 1))

    def kernel(batches):
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                con = sqlite3.connect(row.path)
                try:
                    candles = pd.read_sql_query(
                        "SELECT timestamp, open, high, low, close, volume "
                        "FROM candles ORDER BY timestamp",
                        con,
                    )
                finally:
                    con.close()
                candles.insert(0, "exchange", row.exchange)
                candles.insert(1, "symbol", row.symbol)
                candles.insert(2, "timeframe", row.timeframe)
                for c in ("open", "high", "low", "close", "volume"):
                    candles[c] = candles[c].astype(str)
                yield candles

    return meta.mapInPandas(kernel, _RAW_SCHEMA)


def migrate_sqlite_tree(
    spark: SparkSession, root: str, dataset: CandleDataset
) -> int:
    """E2 end-to-end: discover -> distributed read -> decimal cast ->
    idempotent append (re-running a partial migration never duplicates,
    same INSERT-OR-IGNORE net semantics as the reference's PK handler,
    `ccxt-ohlcv-fetch.py:71-75`). Returns rows appended."""
    files = discover_sqlite_files(root)
    if not files:
        return 0
    raw = read_sqlite_candles(spark, files)
    typed = raw.select(
        "exchange",
        "symbol",
        "timeframe",
        F.col("timestamp").cast("long").alias("timestamp"),
        *[F.col(c).cast(DECIMAL).alias(c) for c in ("open", "high", "low", "close", "volume")],
    )
    return dataset.append_idempotent(typed)
