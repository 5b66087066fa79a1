"""ccxt_ohlcv_fetcher_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of
``planet-winter/ccxt-ohlcv-fetcher`` (an incremental OHLCV ETL pipeline:
REST paging -> per-(exchange,symbol,timeframe) SQLite append, see
``/root/reference/ccxt-ohlcv-fetch.py``), re-expressed Spark-first:

- the per-symbol SQLite files become ONE Hive-partitioned columnar dataset
  (``partitionBy("exchange","symbol","timeframe")``),
- the imperative fetch loop becomes an incremental micro-batch ingest with
  idempotent (anti-join) appends,
- the implicit relational operators (resume max-offset scan, overlap drop,
  incomplete-tail filter, timeframe parsing) become declarative DataFrame
  expressions optimized by Catalyst,
- and the engine is extended with the relational + LLM-data-pipeline
  operator inventory in ``SURVEY.md §2`` (joins, aggregations, windows,
  dedup, similarity search, text analysis, multimodal columns), all
  designed for 100 TB scale (partition pruning, broadcast joins,
  map-side partial aggregation, no row-at-a-time Python UDFs in hot
  paths).
"""

__version__ = "0.1.0"

from ccxt_ohlcv_fetcher_spark.session import get_spark  # noqa: F401
