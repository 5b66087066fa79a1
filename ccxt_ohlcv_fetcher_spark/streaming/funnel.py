"""Streaming funnel tracker: the incremental form of the batch
``event_funnel_conversion`` query (plans/analytics.py), as keyed state
over the event stream.

The batch definition is min-ts based: a user reaches stage k iff their
FIRST stage-k event strictly follows their first stage-(k-1) event.
Because per-stage minima are order- and duplicate-insensitive, the
incremental state is just the four per-stage min timestamps — late
events, replays, and out-of-order delivery are all absorbed by ``min``,
and the stage cascade is recomputed from the minima on every update.
After any prefix of the stream, emitted stages are EXACTLY the batch
query's answer over the events seen so far (pinned in
tests/test_streaming_state.py).

Scale: state is 4 longs per user (no timers, no growth with event
count); the shuffle is the same hash exchange on user_id the batch
groupBy plans. The reference analog is the resume loop's
``max(timestamp)``-per-key state (ccxt-ohlcv-fetch.py:86-91) — same
bounded-state pattern, different fold.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_STAGES = ("signup", "view", "click", "purchase")

FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("max_stage", T.IntegerType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [T.StructField(f"t{i + 1}", T.LongType()) for i in range(4)]
)


def _stage_from_mins(mins: list) -> int:
    stage = 0
    prev = None
    for t in mins:
        if t is None or (prev is not None and t <= prev):
            break
        stage += 1
        prev = t
    return stage


def _track(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    mins = list(state.get) if state.exists else [None] * 4
    for pdf in pdf_iter:
        for et, ts in zip(pdf["event_type"], pdf["ts_ms"]):
            try:
                i = FUNNEL_STAGES.index(et)
            except ValueError:
                continue
            t = int(ts)
            if mins[i] is None or t < mins[i]:
                mins[i] = t
    state.update(tuple(mins))
    yield pd.DataFrame(
        [{"user_id": user_id, "max_stage": _stage_from_mins(mins)}]
    )


def streaming_funnel(events: DataFrame) -> DataFrame:
    """Per-user funnel stage over a stream of (user_id, event_type, ts).

    Emits one (user_id, max_stage) row per user per micro-batch that
    touched the user; the LAST emission per user equals the batch
    funnel's staged value over the full prefix.
    """
    prepared = events.select(
        "user_id",
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _track,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
