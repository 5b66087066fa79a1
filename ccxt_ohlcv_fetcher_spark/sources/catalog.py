"""Catalog: dataset layout (R6) + validation predicates (R12) + symbol
discovery (R7) + export (R5).

The reference validates everything before running (`check_args`,
`ccxt-ohlcv-fetch.py:213-301`): exchange exists (`:218-224`), supports
OHLCV non-emulated (`:231-239`), timeframe is offered (`:242-249`),
symbol is listed (`:252-260`). Those checks consult the live ccxt
client; here the exchange metadata is a plain catalog structure the
caller supplies (tests build it from fixtures), and the checks are the
same membership predicates.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from ccxt_ohlcv_fetcher_spark.functions.timeframe import parse_timeframe
from ccxt_ohlcv_fetcher_spark.operators.ingest import normalize_symbol


@dataclass
class ExchangeMeta:
    """What ccxt's exchange object exposes to `check_args`."""

    name: str
    symbols: set[str] = field(default_factory=set)
    timeframes: set[str] = field(default_factory=set)
    has_fetch_ohlcv: bool | str = True  # True | False | 'emulated' (`:231-239`)


class Catalog:
    """Exchange/symbol/timeframe registry + path layout."""

    def __init__(self, exchanges: dict[str, ExchangeMeta] | None = None):
        self.exchanges = exchanges or {}

    def dataset_path(self, root: str, exchange: str, symbol: str, timeframe: str) -> str:
        """R6 (`gen_db_name`, `:134-138`): the Hive-partition directory for
        one (exchange, symbol, timeframe) — informational; reads should
        filter on partition columns and let Spark prune instead."""
        return (
            f"{root}/exchange={exchange}/symbol={normalize_symbol(symbol)}/"
            f"timeframe={timeframe}"
        )

    def validate(self, exchange: str, symbol: str, timeframe: str) -> None:
        """R12 (`check_args`, `:213-260`): fail fast, named errors."""
        meta = self.exchanges.get(exchange)
        if meta is None:  # `:218-224`
            raise ValueError(
                f"unknown exchange {exchange!r}; known: {sorted(self.exchanges)}"
            )
        if meta.has_fetch_ohlcv in (False, "emulated"):  # `:231-239`
            raise ValueError(f"exchange {exchange!r} does not support native OHLCV")
        parse_timeframe(timeframe)
        if meta.timeframes and timeframe not in meta.timeframes:  # `:242-249`
            raise ValueError(
                f"timeframe {timeframe!r} not offered by {exchange!r}; "
                f"available: {sorted(meta.timeframes)}"
            )
        if meta.symbols and symbol not in meta.symbols:  # `:252-260`
            raise ValueError(
                f"symbol {symbol!r} not listed on {exchange!r}; "
                f"available: {sorted(meta.symbols)}"
            )

    def symbols_of(self, exchange: str) -> list[str]:
        """R7 (`fetch_exchange.sh:13`): enumerate an exchange's symbols —
        first-class instead of scraping error output."""
        meta = self.exchanges.get(exchange)
        if meta is None:
            raise ValueError(f"unknown exchange {exchange!r}")
        return sorted(meta.symbols)


def export_csv(df: DataFrame, out_path: str) -> None:
    """R5 (`sqlite2csv.sh:11-17`): full-scan export -> headered CSV."""
    df.write.mode("overwrite").option("header", True).csv(out_path)
