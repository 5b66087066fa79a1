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
