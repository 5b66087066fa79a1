"""Stateful sessionization with event-time timeouts (op E32s, stateful
variant).

``session_window`` (plans/windows.py + streaming/candles.py) handles
declarative gap-sessions; this operator is the *custom-state* form for
when session close-out must produce exactly one row per finished
session, including sessions that end not with a gap in the data but
with silence — a user who stops sending events entirely. That requires
a timer, not a window: ``applyInPandasWithState`` with
``GroupStateTimeout.EventTimeTimeout`` registers a per-key timeout at
``session_end + gap``; when the watermark passes it, Spark invokes the
function once more with ``state.hasTimedOut`` set and no input rows,
and the open session is flushed.

The reference's closest analog is the incomplete-candle rule
(`ccxt-ohlcv-fetch.py:141-163`): "don't emit the bucket until time has
provably moved past it" — here generalized from fixed buckets to
data-defined session extents.

Scale: state is 3 longs per active key; keys expire with their timers,
so the store tracks *concurrently active* sessions, not history. The
shuffle is one hash exchange on the session key — identical to what
``groupBy(session_window)`` plans.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.LongType(), False),  # epoch ms
        T.StructField("session_end", T.LongType(), False),  # epoch ms
        T.StructField("n_events", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.LongType()),
        T.StructField("end", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _make_sessionizer(gap_ms: int):
    def _sessionize(
        key: tuple,
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cols = [f.name for f in SESSION_SCHEMA.fields]

        if state.hasTimedOut:
            # silence close-out: watermark passed end+gap with no new rows
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_start": start,
                        "session_end": end,
                        "n_events": n,
                    }
                ],
                columns=cols,
            )
            return

        start, end, n = state.get if state.exists else (None, None, 0)
        ts = sorted(
            int(t.value // 1_000_000)
            for pdf in pdf_iter
            for t in pd.to_datetime(pdf["ts"])
            if not pd.isna(t)
        )
        closed: list[dict] = []
        for t in ts:
            if start is None:
                start, end, n = t, t, 1
            elif t - end <= gap_ms:
                end, n = max(end, t), n + 1
            else:
                closed.append(
                    {
                        "user_id": user_id,
                        "session_start": start,
                        "session_end": end,
                        "n_events": n,
                    }
                )
                start, end, n = t, t, 1
        if start is not None:
            state.update((start, end, n))
            state.setTimeoutTimestamp(end + gap_ms)
        yield pd.DataFrame(closed, columns=cols)

    return _sessionize


# every fixed-duration unit spelling Spark's interval parser accepts
# (CalendarInterval: millisecond/second/minute/hour/day/week + shorthands)
_INTERVAL_UNIT_MS = {
    "millisecond": 1,
    "ms": 1,
    "second": 1000,
    "sec": 1000,
    "s": 1000,
    "minute": 60_000,
    "min": 60_000,
    "m": 60_000,
    "hour": 3_600_000,
    "h": 3_600_000,
    "day": 86_400_000,
    "d": 86_400_000,
    "week": 604_800_000,
    "w": 604_800_000,
}


def _interval_ms(interval: str) -> int:
    """Parse a fixed-duration Spark interval string ('30 mins', '2 days',
    '90 seconds') to milliseconds, raising ValueError (not KeyError) with
    the accepted spellings on bad input."""
    parts = interval.strip().split()
    if len(parts) == 2 and parts[0].lstrip("-").isdigit():
        raw = parts[1].lower()
        # exact spelling first ('ms', 's'), then de-pluralized ('mins' -> 'min')
        unit = raw if raw in _INTERVAL_UNIT_MS else raw.removesuffix("s")
        if unit in _INTERVAL_UNIT_MS:
            return int(parts[0]) * _INTERVAL_UNIT_MS[unit]
    raise ValueError(
        f"invalid interval {interval!r}: expected '<n> <unit>' with unit one of "
        + ", ".join(sorted(set(_INTERVAL_UNIT_MS)))
        + " (plural forms accepted)"
    )


def sessionize_events(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """One row per *finished* per-user session over a streaming
    ``(user_id, ts)`` DataFrame. A session closes either when a later
    event arrives past the gap (data-driven close, same rule as
    ``session_window``) or when the event-time watermark passes
    ``session_end + gap`` (timer-driven close — sessions ended by
    silence, which no windowed aggregation can flush)."""
    gap_ms = _interval_ms(gap)
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionizer(gap_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
