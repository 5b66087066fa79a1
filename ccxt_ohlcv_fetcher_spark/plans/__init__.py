from ccxt_ohlcv_fetcher_spark.plans.registry import REGISTRY, QuerySpec, register


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY)."""
    from ccxt_ohlcv_fetcher_spark.plans import (  # noqa: F401
        aggregates,
        analytics,
        breadth,
        joins,
        llm,
        relational,
        scalar,
        timeseries,
        windows,
    )

    return REGISTRY
