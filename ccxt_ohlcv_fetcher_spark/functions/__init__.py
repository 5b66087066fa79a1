from ccxt_ohlcv_fetcher_spark.functions.timeframe import (
    parse_timeframe,
    timeframe_interval_expr,
    timeframe_to_spark_interval,
)
from ccxt_ohlcv_fetcher_spark.functions.arrays import (
    cosine_similarity,
    dot_product,
    l2_norm,
)
