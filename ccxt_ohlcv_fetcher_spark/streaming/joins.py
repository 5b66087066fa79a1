"""Stream-stream joins and streaming deduplication (ops E31s/E10 on the
streaming surface).

The reference never joins two live feeds — its one "join" is the
PK-conflict check (`ccxt-ohlcv-fetch.py:71-75`, a left-anti against the
sink). A real market-data pipeline constantly correlates two unbounded
streams (trades vs quotes, ticks vs reference prices). Spark-first
formulation: watermark both sides and put a *two-sided* time bound in
the join condition — the bound is what lets the engine expire buffered
state, so memory stays proportional to (watermark window × rate), not to
stream history. Without it a stream-stream join is an unbounded-state
plan and Spark (rightly) refuses it in append mode.

Streaming dedup: ``dropDuplicatesWithinWatermark`` — the declarative
form of the reference's INSERT-OR-IGNORE (`:71-75`): duplicates arriving
within the watermark delay are dropped, state for old keys is reclaimed
once the watermark passes. (Plain ``dropDuplicates`` on a stream keeps
ALL keys forever — correct but unbounded; the watermark variant is the
100 TB-safe shape.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_trades_quotes(
    trades: DataFrame,
    quotes: DataFrame,
    max_quote_age: str = "60 seconds",
    watermark_delay: str = "30 seconds",
) -> DataFrame:
    """Enrich each trade with quotes observed in the ``max_quote_age``
    window before it (inner stream-stream join).

    Both inputs are *streaming* DataFrames: trades with columns
    ``(ts, symbol, price, amount)``, quotes with ``(qts, symbol, bid,
    ask)``. The condition bounds each side's event time relative to the
    other (``qts ∈ [ts - max_quote_age, ts]``), which gives Spark an
    eviction rule for both state stores. Output carries both event times
    (epoch ms) plus the quote spread at trade time.
    """
    t = trades.withWatermark("ts", watermark_delay).alias("t")
    q = quotes.withWatermark("qts", watermark_delay).alias("q")
    cond = (
        (F.col("t.symbol") == F.col("q.symbol"))
        & (F.col("q.qts") <= F.col("t.ts"))
        & (F.col("q.qts") >= F.col("t.ts") - F.expr(f"INTERVAL {max_quote_age}"))
    )
    return t.join(q, cond, "inner").select(
        F.col("t.symbol").alias("symbol"),
        F.unix_millis("t.ts").alias("trade_ms"),
        F.unix_millis("q.qts").alias("quote_ms"),
        F.col("t.price").alias("price"),
        F.col("t.amount").alias("amount"),
        F.col("q.bid").alias("bid"),
        F.col("q.ask").alias("ask"),
        (F.col("q.ask") - F.col("q.bid")).alias("spread"),
    )


def join_trades_quotes_outer(
    trades: DataFrame,
    quotes: DataFrame,
    max_quote_age: str = "60 seconds",
    watermark_delay: str = "30 seconds",
) -> DataFrame:
    """LEFT OUTER stream-stream join: every trade is emitted, enriched
    with matching quotes when they exist, or with NULL quote columns
    otherwise — the "no quote was available" rows are exactly what a
    data-quality monitor wants, and an inner join silently drops them.

    Semantics under the hood: matched rows emit immediately; an
    *unmatched* trade is held in the state store until the watermark
    passes the end of its join window (only then can Spark prove no
    matching quote can still arrive), at which point it is emitted
    null-extended. So outer results trail the inner results by up to
    ``watermark_delay + max_quote_age`` of event time — eventual, not
    instant, completeness. State eviction follows the same two-sided
    time bound as the inner join; memory stays O(window × rate).
    """
    t = trades.withWatermark("ts", watermark_delay).alias("t")
    q = quotes.withWatermark("qts", watermark_delay).alias("q")
    cond = (
        (F.col("t.symbol") == F.col("q.symbol"))
        & (F.col("q.qts") <= F.col("t.ts"))
        & (F.col("q.qts") >= F.col("t.ts") - F.expr(f"INTERVAL {max_quote_age}"))
    )
    return t.join(q, cond, "leftOuter").select(
        F.col("t.symbol").alias("symbol"),
        F.unix_millis("t.ts").alias("trade_ms"),
        F.unix_millis("q.qts").alias("quote_ms"),
        F.col("t.price").alias("price"),
        F.col("t.amount").alias("amount"),
        F.col("q.bid").alias("bid"),
        F.col("q.ask").alias("ask"),
        (F.col("q.ask") - F.col("q.bid")).alias("spread"),
    )


def join_trades_quotes_full_outer(
    trades: DataFrame,
    quotes: DataFrame,
    max_quote_age: str = "60 seconds",
    watermark_delay: str = "30 seconds",
) -> DataFrame:
    """FULL OUTER stream-stream join: every trade AND every quote is
    eventually emitted — matched rows immediately, unmatched rows of
    EITHER side null-extended once the watermark proves their join
    window closed. Completes the E7 matrix on streams: left-outer
    answers "which trades had no quote", full-outer additionally
    answers "which quotes never served a trade" (stale-feed detection)
    in the same query. Spark requires a watermark on both sides and
    the two-sided time bound for state eviction — identical condition
    to the inner/left forms, so memory stays O(window x rate)."""
    t = trades.withWatermark("ts", watermark_delay).alias("t")
    q = quotes.withWatermark("qts", watermark_delay).alias("q")
    cond = (
        (F.col("t.symbol") == F.col("q.symbol"))
        & (F.col("q.qts") <= F.col("t.ts"))
        & (F.col("q.qts") >= F.col("t.ts") - F.expr(f"INTERVAL {max_quote_age}"))
    )
    return t.join(q, cond, "fullOuter").select(
        F.coalesce(F.col("t.symbol"), F.col("q.symbol")).alias("symbol"),
        F.unix_millis("t.ts").alias("trade_ms"),
        F.unix_millis("q.qts").alias("quote_ms"),
        F.col("t.price").alias("price"),
        F.col("t.amount").alias("amount"),
        F.col("q.bid").alias("bid"),
        F.col("q.ask").alias("ask"),
        (F.col("q.ask") - F.col("q.bid")).alias("spread"),
    )


def dedup_tick_stream(
    ticks: DataFrame,
    keys: tuple[str, ...] = ("symbol", "ts"),
    watermark_delay: str = "60 seconds",
) -> DataFrame:
    """E31s: drop re-delivered ticks within the watermark horizon.

    The streaming analog of the idempotent-append anti-join
    (`operators/ingest.py:append_idempotent`): same drop-newest policy as
    the reference's IntegrityError handler (`:71-75`), but applied
    in-flight with bounded state instead of at the storage layer.
    """
    return ticks.withWatermark("ts", watermark_delay).dropDuplicatesWithinWatermark(
        list(keys)
    )
