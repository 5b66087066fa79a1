"""Spark 4 Python DataSource for OHLCV ingest (op R1 as a *source*, not
a driver loop): ``spark.read.format("ccxt_ohlcv")`` /
``spark.readStream.format("ccxt_ohlcv")``.

Why this exists alongside ``sources/paging.py``: the paging loop is the
reference translated — a sequential driver loop per symbol
(`ccxt-ohlcv-fetch.py:110-130`), with fan-out as driver threads. The
DataSource form inverts that: each *symbol* becomes an
``InputPartition``, so page fetching for 500 symbols runs as 500
parallel executor tasks — the exchange-wide backfill
(``fetch_exchange.sh``'s 4 worker processes, `:14,18-23`) scales with
the cluster instead of the driver. Batch semantics per partition are
the reference's loop verbatim: ascending pages from ``since``
(`:98,:119-120`), overlap row dropped (`:104`), incomplete tail candle
excluded (`:141-163`, fixed to UTC).

The streaming reader implements Spark's offset contract on the same
pages: offset = per-symbol resume cursor — exactly the reference's
"resume from max stored timestamp" (`:86-91,:275`) made a first-class
checkpointed offset. ``SimpleDataSourceStreamReader`` reads
driver-side, the right trade for a rate-limited REST API (throughput is
bounded by the exchange, not by parallelism; partition-parallel
*backfill* is the batch reader's job).

Transport: options are strings; the offline/test path ships candles as
a JSON file (``fixture``) readable from driver and executors. The live
path (``exchange`` option without ``fixture``) imports ``ccxt`` lazily
inside the task — an optional dependency, like the CLI.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = (
    "exchange string, symbol string, timeframe string, timestamp long, "
    "open double, high double, low double, close double, volume double"
)


def _tf_ms(timeframe: str) -> int:
    # local import: this module is shipped to executors by value (pickled
    # reader), so module-level engine imports would drag the whole package
    from ccxt_ohlcv_fetcher_spark.functions.timeframe import (  # noqa: PLC0415
        timeframe_seconds,
    )

    return timeframe_seconds(timeframe) * 1000


class _FixtureFeed:
    """Pages from a JSON file {symbol: [[ts,o,h,l,c,v], ...]} — the
    offline stand-in for ``exchange.fetch_ohlcv`` (`:98`)."""

    def __init__(self, path: str, page_size: int):
        with open(path) as fh:
            self.rows = json.load(fh)
        # exchanges return ascending pages (`:98`); enforce it here so the
        # cursor-advance invariant (page[-1][0] is the max ts) holds even
        # for hand-written fixture files
        self.rows = {s: sorted(rs, key=lambda r: r[0]) for s, rs in self.rows.items()}
        self.page_size = page_size

    def fetch(self, symbol: str, since_ms: int) -> list[list]:
        page = [r for r in self.rows.get(symbol, ()) if r[0] >= since_ms]
        return page[: self.page_size]


class _CcxtFeed:  # pragma: no cover - needs live network + ccxt
    def __init__(self, exchange_name: str, timeframe: str, page_size: int):
        import ccxt  # noqa: PLC0415 — optional dependency, task-side

        self.exchange = getattr(ccxt, exchange_name)({"enableRateLimit": True})
        self.timeframe = timeframe
        self.page_size = page_size

    def fetch(self, symbol: str, since_ms: int) -> list[list]:
        return self.exchange.fetch_ohlcv(symbol, self.timeframe, since_ms)


def _make_feed(options: dict) -> _FixtureFeed | _CcxtFeed:
    page_size = int(options.get("page_size", "500"))
    fixture = options.get("fixture")
    if fixture:
        return _FixtureFeed(fixture, page_size)
    return _CcxtFeed(options["exchange"], options.get("timeframe", "1m"), page_size)


class SymbolPartition(InputPartition):
    def __init__(self, symbol: str):
        self.symbol = symbol


class CandleBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options
        self.exchange = options.get("exchange", "fixture")
        self.timeframe = options.get("timeframe", "1m")
        self.symbols = [s for s in options.get("symbols", "").split(",") if s]
        self.since_ms = int(options.get("since", "1388534400000"))  # `:26`
        self.now_ms = int(options["now"]) if "now" in options else None

    def partitions(self) -> Sequence[InputPartition]:
        # one task per symbol: the unit the reference shards by
        # (`fetch_exchange.sh:14`), now cluster-parallel
        return [SymbolPartition(s) for s in self.symbols]

    def read(self, partition: SymbolPartition) -> Iterator[tuple]:
        import time  # noqa: PLC0415

        feed = _make_feed(self.options)
        tf_ms = _tf_ms(self.timeframe)
        now_ms = self.now_ms if self.now_ms is not None else int(time.time() * 1000)
        symbol = partition.symbol
        cursor, first = self.since_ms, True
        while True:
            page = feed.fetch(symbol, cursor)
            if not page:
                break
            for ts, o, h, lo, c, v in page:
                if not first and ts == cursor:
                    continue  # overlap row (`:104`)
                if ts + tf_ms > now_ms:
                    continue  # incomplete tail (`:141-163`, UTC)
                yield (
                    self.exchange, symbol, self.timeframe,
                    int(ts), float(o), float(h), float(lo), float(c), float(v),
                )
            new_cursor = page[-1][0]  # `:119-120`
            if new_cursor <= cursor:
                # no forward progress: a sorted feed only hits this when the
                # page is the single candle at ``cursor`` (already emitted);
                # a misbehaving feed (dup/unsorted tail) must never spin
                break
            caught_up = len(page) < feed.page_size or new_cursor + tf_ms > now_ms
            cursor, first = new_cursor, False
            if caught_up:
                break


class CandleStreamReader(SimpleDataSourceStreamReader):
    """Offset = {symbol: next_since_ms}: the reference's sink-derived
    resume cursor (`:86-91,:275`) as a checkpointed streaming offset.
    Each micro-batch pulls at most one page per symbol.

    ``maxRowsPerBatch`` (per symbol, per micro-batch) additionally caps
    how far the cursor advances in one batch — the admission-control
    knob (Kafka's ``maxOffsetsPerTrigger`` analog, and the streaming
    face of the reference's rate-limit concern, `:219,:226-228`): a
    backfill over years of history proceeds in bounded batches instead
    of one giant first micro-batch."""

    def __init__(self, options: dict):
        self.options = options
        self.exchange = options.get("exchange", "fixture")
        self.timeframe = options.get("timeframe", "1m")
        self.symbols = [s for s in options.get("symbols", "").split(",") if s]
        self.since_ms = int(options.get("since", "1388534400000"))
        self.now_ms = int(options["now"]) if "now" in options else None
        self.max_rows = int(options.get("maxRowsPerBatch", "0")) or None
        self._feed = None

    def _get_feed(self):
        if self._feed is None:
            self._feed = _make_feed(self.options)
        return self._feed

    def initialOffset(self) -> dict:
        return {s: self.since_ms for s in self.symbols}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        import time  # noqa: PLC0415

        feed = self._get_feed()
        tf_ms = _tf_ms(self.timeframe)
        now_ms = self.now_ms if self.now_ms is not None else int(time.time() * 1000)
        rows: list[tuple] = []
        end: dict = {}
        for symbol in self.symbols:
            # offset invariant: every candle with ts < cursor is already
            # emitted, so emit [cursor, ...complete...] and advance to
            # last_emitted + tf — no overlap row can ever re-emit
            cursor = int(start.get(symbol, self.since_ms))
            advanced = cursor
            emitted = 0
            for ts, o, h, lo, c, v in feed.fetch(symbol, cursor):
                if self.max_rows is not None and emitted >= self.max_rows:
                    break  # admission control: cursor stops here; the
                    # next batch resumes from `advanced` exactly
                if ts < cursor:
                    continue
                if ts + tf_ms > now_ms:
                    break  # incomplete tail (`:141-163`): a later batch's
                emitted += 1
                rows.append(
                    (
                        self.exchange, symbol, self.timeframe,
                        int(ts), float(o), float(h), float(lo), float(c), float(v),
                    )
                )
                advanced = ts + tf_ms  # next bucket start
            end[symbol] = advanced
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # deterministic replay for recovery: page forward through
        # [start, end) only — same rows the original batch emitted
        feed = self._get_feed()
        tf_ms = _tf_ms(self.timeframe)
        for symbol in self.symbols:
            cursor = int(start.get(symbol, self.since_ms))
            hi = int(end.get(symbol, cursor))
            while cursor < hi:
                page = feed.fetch(symbol, cursor)
                if not page:
                    break
                progressed = False
                for ts, o, h, l_, c, v in page:
                    if ts < cursor or ts + tf_ms > hi:
                        continue
                    yield (
                        self.exchange, symbol, self.timeframe,
                        int(ts), float(o), float(h), float(l_), float(c), float(v),
                    )
                    cursor, progressed = ts + tf_ms, True
                if not progressed:
                    break

    def commit(self, end: dict) -> None:
        pass  # source is external/replayable; nothing to release


class CandleDataSource(DataSource):
    """``spark.read.format("ccxt_ohlcv")`` — options:

    - ``symbols``: comma-separated list (required)
    - ``timeframe``: reference grammar ``(\\d+)[smhdwMy]`` (default 1m)
    - ``since``: epoch ms start (default 2014-01-01, `:26`)
    - ``now``: epoch ms "current time" pin (tests; default wall clock)
    - ``fixture``: JSON file of candles (offline mode), else
      ``exchange``: ccxt exchange id (live mode, needs ccxt installed)
    - ``page_size``: rows per fetch (default 500)
    """

    @classmethod
    def name(cls) -> str:
        return "ccxt_ohlcv"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> CandleBatchReader:
        return CandleBatchReader(dict(self.options))

    def simpleStreamReader(self, schema) -> CandleStreamReader:
        return CandleStreamReader(dict(self.options))


def register(spark) -> None:
    """Idempotent format registration for the current session."""
    spark.dataSource.register(CandleDataSource)
