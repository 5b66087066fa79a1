from ccxt_ohlcv_fetcher_spark.sources.tables import load_table, load_tables, register_views
