"""Custom stateful streaming operator (op E28s/E29s family):
per-symbol continuity monitoring with ``applyInPandasWithState``.

The reference trusts its cursor arithmetic to never skip candles
(`ccxt-ohlcv-fetch.py:119-120` advances ``since`` to the last row of
each page); nothing *verifies* continuity. This operator is that
verification as a first-class stream stage: it remembers the newest
candle timestamp per (exchange, symbol, timeframe) across micro-batches
(state outlives the batch — the streaming analog of the reference's
resume offset, `:86-91`) and emits one row per detected gap, i.e. a
hole of >= 1 missing bucket between consecutive candles.

Why ``applyInPandasWithState`` and not a window function: ``lag()``
(plans/timeseries.py, op E19) finds gaps *within* a batch; only
explicit keyed state finds a gap that spans micro-batch or restart
boundaries. State is per-key and tiny (one long), so the operator
scales with distinct keys, not rows — exactly-once via the checkpoint.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ccxt_ohlcv_fetcher_spark.functions.timeframe import timeframe_seconds

GAP_SCHEMA = T.StructType(
    [
        T.StructField("exchange", T.StringType(), False),
        T.StructField("symbol", T.StringType(), False),
        T.StructField("timeframe", T.StringType(), False),
        T.StructField("gap_start", T.LongType(), False),  # first missing bucket (epoch ms)
        T.StructField("gap_end", T.LongType(), False),  # last missing bucket (epoch ms)
        T.StructField("n_missing", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("last_ts", T.LongType())])


def _find_gaps(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    exchange, symbol, timeframe = key
    tf_ms = timeframe_seconds(timeframe) * 1000
    (last_ts,) = state.get if state.exists else (None,)

    ts = sorted(
        {int(t) for pdf in pdf_iter for t in pdf["timestamp"] if not pd.isna(t)}
    )
    gaps: list[dict[str, Any]] = []
    prev = last_ts
    for t in ts:
        if prev is not None and t - prev > tf_ms:
            gaps.append(
                {
                    "exchange": exchange,
                    "symbol": symbol,
                    "timeframe": timeframe,
                    "gap_start": prev + tf_ms,
                    "gap_end": t - tf_ms,
                    "n_missing": (t - prev) // tf_ms - 1,
                }
            )
        prev = t if prev is None else max(prev, t)
    if prev is not None:
        state.update((prev,))
    yield pd.DataFrame(gaps, columns=[f.name for f in GAP_SCHEMA.fields])


def streaming_gap_monitor(candles: DataFrame) -> DataFrame:
    """Detect missing buckets per (exchange, symbol, timeframe) across
    micro-batches. Input: a *streaming* DataFrame with columns exchange,
    symbol, timeframe, timestamp (epoch ms, bucket start). The batch
    equivalent of this check is ``lag()`` gap detection
    (plans/timeseries.py, op E19) — state is only needed when gaps can
    span micro-batch/restart boundaries."""
    return (
        candles.groupBy("exchange", "symbol", "timeframe")
        .applyInPandasWithState(
            _find_gaps,
            outputStructType=GAP_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- running VWAP: one operator, two stateful APIs ------------------------
#
# ``transformWithStateInPandas`` (Spark 4's richer API: typed state
# handles, timers, TTL) needs the protobuf-based Python state server,
# and ``google.protobuf`` is not installed in this container — so the
# TWS variant is the forward surface, import-gated and skip-tested,
# while an ``applyInPandasWithState`` variant with identical semantics
# carries the in-container tests.

import importlib.util

# find_spec raises (not returns None) when the parent package is absent
TRANSFORM_WITH_STATE_AVAILABLE = (
    importlib.util.find_spec("google") is not None
    and importlib.util.find_spec("google.protobuf") is not None
)

VWAP_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("cum_volume", T.DoubleType(), False),
        T.StructField("cum_notional", T.DoubleType(), False),
        T.StructField("vwap", T.DoubleType(), False),
    ]
)


class RunningVWAPProcessor:
    """Per-symbol running VWAP via ``transformWithStateInPandas`` —
    Spark 4's richer stateful API (typed state handles + timers) vs the
    single-blob state of ``applyInPandasWithState`` above.

    Maintains cumulative (volume, notional) per symbol across
    micro-batches and emits the updated VWAP once per batch per symbol
    with new data. State is two doubles per key — scales with distinct
    symbols, not ticks — and lives in the checkpointed store (RocksDB
    provider required by this API), surviving restarts like the
    reference's sink-derived resume offset (`ccxt-ohlcv-fetch.py:86-91`).
    """

    def init(self, handle) -> None:
        self._acc = handle.getValueState(
            "acc", "cum_volume double, cum_notional double"
        )

    def handleInputRows(self, key, rows, timerValues):
        volume, notional = self._acc.get() if self._acc.exists() else (0.0, 0.0)
        for pdf in rows:
            volume += float(pdf["amount"].sum())
            notional += float((pdf["price"] * pdf["amount"]).sum())
        self._acc.update((volume, notional))
        yield pd.DataFrame(
            {
                "symbol": [key[0]],
                "cum_volume": [volume],
                "cum_notional": [notional],
                "vwap": [notional / volume if volume else float("nan")],
            }
        )

    def close(self) -> None:
        pass


def running_vwap(ticks: DataFrame) -> DataFrame:
    """Streaming per-symbol cumulative VWAP (update-mode output) on the
    Spark 4 ``transformWithStateInPandas`` API.

    Requires (a) the RocksDB state-store provider
    (``spark.sql.streaming.stateStore.providerClass``) — the HDFS
    default does not support ``transformWithState`` — and (b)
    ``google.protobuf`` for the Python state server (absent in this
    container; see ``TRANSFORM_WITH_STATE_AVAILABLE``). Semantics are
    pinned by ``running_vwap_legacy``'s tests — the two variants share
    the accumulation law.
    """
    if not TRANSFORM_WITH_STATE_AVAILABLE:
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf; "
            "use running_vwap_legacy on this deployment"
        )
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # subclass at call time so module import never hard-depends on the API
    processor = type(
        "_RunningVWAP", (RunningVWAPProcessor, StatefulProcessor), {}
    )()
    return ticks.groupBy("symbol").transformWithStateInPandas(
        statefulProcessor=processor,
        outputStructType=VWAP_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


_VWAP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cum_volume", T.DoubleType()),
        T.StructField("cum_notional", T.DoubleType()),
    ]
)


def _vwap_apply(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    volume, notional = state.get if state.exists else (0.0, 0.0)
    for pdf in pdf_iter:
        volume += float(pdf["amount"].sum())
        notional += float((pdf["price"] * pdf["amount"]).sum())
    state.update((volume, notional))
    yield pd.DataFrame(
        {
            "symbol": [key[0]],
            "cum_volume": [volume],
            "cum_notional": [notional],
            "vwap": [notional / volume if volume else float("nan")],
        }
    )


def running_vwap_legacy(ticks: DataFrame) -> DataFrame:
    """Same running-VWAP semantics on ``applyInPandasWithState`` — the
    stateful API that runs everywhere (no protobuf state server, works
    on the default HDFS state store). One updated row per (symbol,
    micro-batch); state is two doubles per key."""
    return ticks.groupBy("symbol").applyInPandasWithState(
        _vwap_apply,
        outputStructType=VWAP_SCHEMA,
        stateStructType=_VWAP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
