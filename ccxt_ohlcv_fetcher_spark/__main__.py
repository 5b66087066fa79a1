"""CLI — the reference's three entry points as one console surface.

Flag-for-flag parity with ``ccxt-ohlcv-fetch.py`` (`parse_args`,
`/root/reference/ccxt-ohlcv-fetch.py:175-210`):

    python -m ccxt_ohlcv_fetcher_spark fetch -s XRP/USD -e bitfinex -t 1m
    python -m ccxt_ohlcv_fetcher_spark fetch-exchange bitfinex -t 1m
    python -m ccxt_ohlcv_fetcher_spark export-csv --data-dir ... -e ... -s ... -t ... out/
    python -m ccxt_ohlcv_fetcher_spark migrate-sqlite ./ccxt --data-dir ...

`fetch` mirrors the reference CLI (`-s -e -t --since --debug -r -q`) and
adds `--data-dir` (the dataset root replacing the per-symbol SQLite
tree). `fetch-exchange` replaces ``fetch_exchange.sh`` (symbol
fan-out, default 4 workers, `:14,18-23` — without its bug of hardcoding
``-e bitfinex`` at `:21`). `export-csv` replaces ``sqlite2csv.sh``
(partition-pruned scan instead of a file pick). `migrate-sqlite` is the
one-shot bridge for existing users' SQLite trees.

Datasets are SNAPSHOT-LOGGED BY DEFAULT (`operators/candle_log.py`):
every append is an atomic commit-log transaction, so the 4-worker
fan-out commits lock-free, readers are snapshot-isolated, and delete /
history / changes / time travel work out of the box — the reference's
own concurrent-writer workload (`fetch_exchange.sh:18-23`) is exactly
what the log exists for. ``--plain-parquet`` (or ``--date-bucket``,
which implies it) selects the bare Hive-partitioned layout instead;
``--snapshot-log`` is accepted as a no-op for compatibility. A data
dir that already holds a bare-parquet dataset is refused under the
default (pass ``--plain-parquet``, or migrate it) rather than silently
shadowed by an empty log.

Live fetching needs the ``ccxt`` package, which is an *optional*
dependency (import-gated — everything else in the engine works without
it; tests drive the same loop with a fixture source).
"""

from __future__ import annotations

import argparse
import sys
import time

from ccxt_ohlcv_fetcher_spark.operators.ingest import CandleDataset
from ccxt_ohlcv_fetcher_spark.session import get_spark
from ccxt_ohlcv_fetcher_spark.sources.catalog import Catalog, ExchangeMeta, export_csv


class CcxtPagingSource:
    """Adapter: a live ccxt exchange object as a paging source for
    ``ingest_candles`` (duck-typed like ``FixturePagingSource``). Rate
    limiting stays inside the client (``enableRateLimit``, reference
    `:219`); ``-r`` scales the default limit (`:226-228`)."""

    page_size = 500  # typical ccxt page; only used for caught-up detection

    def __init__(self, exchange, symbol: str, timeframe: str):
        self.exchange = exchange
        self.symbol = symbol
        self.timeframe = timeframe

    def fetch_ohlcv(self, since_ms: int) -> list[list]:
        return self.exchange.fetch_ohlcv(self.symbol, self.timeframe, since_ms)


def _load_ccxt_exchange(name: str, rate_limit_pct: int | None):
    try:
        import ccxt  # noqa: PLC0415 — optional dependency
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise SystemExit(
            "live fetching requires the optional 'ccxt' package "
            "(pip install ccxt); offline commands (export-csv, "
            "migrate-sqlite) work without it"
        ) from e
    if name not in ccxt.exchanges:  # `:218-224`
        raise SystemExit(f"unknown exchange {name!r}")
    exchange = getattr(ccxt, name)({"enableRateLimit": True})  # `:219`
    if rate_limit_pct:  # `:226-228`
        exchange.rateLimit = int(exchange.rateLimit * (1 + rate_limit_pct / 100))
    return exchange


def _catalog_from_ccxt(exchange) -> Catalog:
    """`check_args` parity (`:231-260`): capability + market metadata."""
    exchange.load_markets()  # `:253`
    meta = ExchangeMeta(
        name=exchange.id,
        symbols=set(exchange.symbols or ()),
        timeframes=set(getattr(exchange, "timeframes", None) or ()),
        has_fetch_ohlcv=exchange.has.get("fetchOHLCV", False),  # `:231-239`
    )
    return Catalog({exchange.id: meta})


def _parse_since(iso: str | None) -> int | None:
    """`--since` ISO-8601 -> epoch ms (`exchange.parse8601`, `:287`)."""
    if iso is None:
        return None
    from datetime import datetime, timezone  # noqa: PLC0415

    dt = datetime.fromisoformat(iso.replace("Z", "+00:00"))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def _add_layout_flags(p, plain: bool = True) -> None:
    """Dataset-layout flags: the snapshot log is the DEFAULT;
    ``--snapshot-log`` stays accepted as a no-op for compatibility,
    ``--plain-parquet`` opts out to the bare Hive layout (log-only
    commands omit it)."""
    p.add_argument(
        "--snapshot-log",
        action="store_true",
        help="no-op: the commit log is the default dataset layout "
        "(kept for compatibility)",
    )
    if plain:
        p.add_argument(
            "--plain-parquet",
            action="store_true",
            help="bare Hive-partitioned parquet instead of the commit "
            "log (no time travel / delete / history; fan-out appends "
            "serialize behind a lock). Implied by --date-bucket.",
        )


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="ccxt_ohlcv_fetcher_spark",
        description="CCXT Market Data Downloader (PySpark engine)",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    fetch = sub.add_parser("fetch", help="download one (exchange, symbol, timeframe)")
    # reference flags, verbatim semantics (`:175-210`)
    fetch.add_argument("-s", "--symbol", type=str, required=True)
    fetch.add_argument("-e", "--exchange", type=str, required=True)
    fetch.add_argument("-t", "--timeframe", type=str, default="1d")
    fetch.add_argument("--since", type=str, default=None)
    fetch.add_argument("--debug", action="store_true")
    fetch.add_argument("-r", "--rate-limit", type=int, default=None)
    fetch.add_argument("-q", "--quit", action="store_true", dest="quit_")
    fetch.add_argument("--data-dir", type=str, default="./candles")
    fetch.add_argument(
        "--date-bucket",
        choices=["day", "month"],
        default=None,
        help="add a dt= partition level (bounded compaction/retention)",
    )
    _add_layout_flags(fetch)

    fx = sub.add_parser("fetch-exchange", help="all symbols of one exchange")
    fx.add_argument("exchange", type=str)
    fx.add_argument("-t", "--timeframe", type=str, default="1m")
    fx.add_argument("-w", "--workers", type=int, default=4)  # split -n l/4
    fx.add_argument("-r", "--rate-limit", type=int, default=None)
    fx.add_argument("-q", "--quit", action="store_true", dest="quit_")
    fx.add_argument("--data-dir", type=str, default="./candles")
    fx.add_argument("--date-bucket", choices=["day", "month"], default=None)
    _add_layout_flags(fx)

    ex = sub.add_parser("export-csv", help="dataset slice -> headered CSV")
    ex.add_argument("out", type=str)
    ex.add_argument("--data-dir", type=str, required=True)
    ex.add_argument("-e", "--exchange", type=str, default=None)
    ex.add_argument("-s", "--symbol", type=str, default=None)
    ex.add_argument("-t", "--timeframe", type=str, default=None)
    _add_layout_flags(ex)

    mig = sub.add_parser("migrate-sqlite", help="legacy SQLite tree -> dataset")
    mig.add_argument("root", type=str)
    mig.add_argument("--data-dir", type=str, required=True)
    mig.add_argument(
        "--distributed-discovery",
        action="store_true",
        help="walk the tree on executors (for very large trees)",
    )
    mig.add_argument("--date-bucket", choices=["day", "month"], default=None)
    _add_layout_flags(mig)

    cp = sub.add_parser("compact", help="rewrite small files (1 per partition)")
    cp.add_argument("--data-dir", type=str, required=True)
    cp.add_argument("--date-bucket", choices=["day", "month"], default=None)
    cp.add_argument("-e", "--exchange", type=str, default=None)
    cp.add_argument("-s", "--symbol", type=str, default=None)
    cp.add_argument("-t", "--timeframe", type=str, default=None)
    cp.add_argument(
        "--since",
        type=str,
        default=None,
        help="ISO-8601 watermark: only rewrite buckets at/after it "
        "(date-bucketed layouts)",
    )
    cp.add_argument(
        "--auto",
        action="store_true",
        help="policy mode (logged datasets): compact ONLY when "
        "merge-on-read deletion vectors exceed --dv-ratio (Delta "
        "auto-OPTIMIZE's trigger); no-op otherwise",
    )
    cp.add_argument(
        "--dv-ratio",
        type=float,
        default=0.1,
        help="deleted-position ratio that triggers --auto (default 0.1)",
    )
    cp.add_argument(
        "--max-files-per-key",
        type=int,
        default=8,
        help="small-file trigger for --auto: compact when any "
        "(exchange,symbol,timeframe) key spans more files than this "
        "(default 8; manifest-only check)",
    )
    cp.add_argument(
        "--partial",
        action="store_true",
        help="bin-packing partial compact (logged datasets): rewrite "
        "ONLY files under --small-file-mb, carrying big files by "
        "reference and rebasing over concurrent appends — the "
        "maintenance shape for very large tables (a full rewrite "
        "touches everything)",
    )
    cp.add_argument(
        "--small-file-mb",
        type=int,
        default=32,
        help="(--partial) files smaller than this are rewritten "
        "(default 32 MiB; also the output target size)",
    )
    _add_layout_flags(cp)

    vac = sub.add_parser("vacuum", help="drop date buckets past retention")
    _add_layout_flags(vac)
    vac.add_argument("--data-dir", type=str, required=True)
    vac.add_argument("--date-bucket", choices=["day", "month"], default=None)
    vac.add_argument(
        "--older-than", type=str, required=True, help="ISO-8601 retention cutoff"
    )

    ru = sub.add_parser(
        "rollup", help="refresh materialized coarse-candle rollups (1m->1h->1d)"
    )
    ru.add_argument("--data-dir", type=str, required=True, help="base candle dataset")
    ru.add_argument("--rollup-dir", type=str, required=True, help="rollup store root")
    ru.add_argument(
        "--levels",
        type=str,
        default="1h,1d",
        help="comma-separated coarsening ladder (each a multiple of the previous)",
    )
    ru.add_argument("--base-timeframe", type=str, default="1m")
    ru.add_argument(
        "--date-bucket",
        choices=["day", "month"],
        default=None,
        help="dt= layout of the ROLLUP store (bounded refresh + retention)",
    )
    ru.add_argument(
        "--base-date-bucket",
        choices=["day", "month"],
        default=None,
        help="dt= layout the BASE dataset was written with (implies "
        "the base is plain parquet)",
    )
    ru.add_argument(
        "--base-plain-parquet",
        action="store_true",
        help="the BASE dataset is bare Hive parquet (default: "
        "snapshot-logged)",
    )
    ru.add_argument(
        "--rollup-plain-parquet",
        action="store_true",
        help="the ROLLUP store is bare Hive parquet (escape hatch for "
        "pre-existing plain rollup stores; default: snapshot-logged "
        "unless --date-bucket)",
    )
    ru.add_argument(
        "--vacuum-older-than",
        type=str,
        default=None,
        help="ISO-8601 cutoff: after refreshing, drop rollup date buckets "
        "older than this (requires --date-bucket)",
    )

    de = sub.add_parser(
        "delete", help="row-level delete on a snapshot-logged dataset"
    )
    de.add_argument("--data-dir", type=str, required=True)
    de.add_argument(
        "--where", type=str, required=True,
        help="SQL predicate over the candle columns (rows where it is "
        "TRUE are removed; NULL keeps the row)",
    )
    _add_layout_flags(de, plain=False)
    de.add_argument(
        "--dv", action="store_true",
        help="merge-on-read: record deletion vectors instead of "
        "rewriting files (materialized by the next compact)",
    )

    hi = sub.add_parser(
        "history", help="commit log of a snapshot-logged dataset"
    )
    hi.add_argument("--data-dir", type=str, required=True)
    hi.add_argument(
        "--counts",
        action="store_true",
        help="append exact row counts per version (metadata-only: "
        "manifest _rows stats minus live deletion-vector positions; "
        "no data scan)",
    )
    _add_layout_flags(hi, plain=False)

    rs = sub.add_parser(
        "restore",
        help="roll a logged dataset back to an old version (one "
        "metadata-only commit; the bad versions stay for forensics)",
    )
    rs.add_argument("--data-dir", type=str, required=True)
    rs.add_argument("--version", type=int, required=True)
    _add_layout_flags(rs, plain=False)

    ch = sub.add_parser(
        "changes", help="signed row-level change feed of a logged dataset"
    )
    ch.add_argument("--data-dir", type=str, required=True)
    _add_layout_flags(ch, plain=False)
    ch.add_argument(
        "--from-version", type=int, default=None,
        help="emit changes AFTER this version (exclusive; required "
        "without --drain, default 0 with it)",
    )
    ch.add_argument(
        "--to-version", type=int, default=None,
        help="up to this version inclusive (default: head)",
    )
    ch.add_argument(
        "--limit", type=int, default=50, help="rows printed (default 50)"
    )
    ch.add_argument(
        "--drain",
        action="store_true",
        help="capped catch-up mode (drain_available): stream the feed "
        "through the snapshot_changes source into --out parquet, "
        "re-triggering rounds until the checkpoint converges on the "
        "source head; exactly-once across restarts via --checkpoint",
    )
    ch.add_argument(
        "--out", type=str, default=None,
        help="(--drain) parquet dir receiving the signed change rows",
    )
    ch.add_argument(
        "--checkpoint", type=str, default=None,
        help="(--drain) streaming checkpoint dir (resume cursor)",
    )
    ch.add_argument(
        "--max-versions-per-batch", type=int, default=0,
        help="(--drain) admission control: commits absorbed per round",
    )
    ch.add_argument(
        "--max-files-per-batch", type=int, default=0,
        help="(--drain) admission control: changed files per round",
    )

    mi = sub.add_parser(
        "mirror",
        help="CDC-replicate a logged dataset into another via the "
        "signed change feed (table mirroring incl. deletes/restates)",
    )
    mi.add_argument("--source-dir", type=str, required=True)
    mi.add_argument("--data-dir", type=str, required=True, help="target root")
    mi.add_argument("--checkpoint", type=str, required=True)
    mi.add_argument(
        "--keys",
        type=str,
        default="exchange,symbol,timeframe,timestamp",
        help="comma-separated key columns netted per batch "
        "(default: the candle PK)",
    )
    mi.add_argument("--starting-version", type=int, default=0)
    mi.add_argument(
        "--verify",
        action="store_true",
        help="after replication, compare order-independent content "
        "fingerprints (count + xxhash64 sum) of source and target "
        "live rows; non-zero exit on mismatch (anti-entropy check)",
    )
    mi.add_argument(
        "--max-versions-per-batch",
        type=int,
        default=0,
        help="admission control: bound commits per micro-batch; the "
        "command then DRAINS rounds until the checkpoint reaches the "
        "source head (drain_available)",
    )
    _add_layout_flags(mi, plain=False)

    sq = sub.add_parser(
        "sql", help="ad-hoc SQL over fixture tables and/or a candle dataset"
    )
    sq.add_argument("--query", type=str, required=True, help="ANSI SQL text")
    sq.add_argument(
        "--sf-dir",
        type=str,
        default=None,
        help="fixture dir: registers region/nation/customer/supplier/part/"
        "orders/lineitem/events/documents/embeddings as views",
    )
    sq.add_argument(
        "--data-dir",
        type=str,
        default=None,
        help="candle dataset root, registered as view `candles`",
    )
    _add_layout_flags(sq)
    sq.add_argument(
        "--version",
        type=int,
        default=None,
        help="time-travel: pin the `candles` view to this snapshot "
        "version (not available with --plain-parquet)",
    )
    sq.add_argument(
        "--timestamp",
        type=float,
        default=None,
        help="time-travel by wall clock (TIMESTAMP AS OF, epoch "
        "seconds): pin `candles` to the newest snapshot committed at "
        "or before this instant (logged layout only)",
    )
    sq.add_argument("--format", choices=["csv", "json"], default="csv")
    sq.add_argument(
        "--explain",
        action="store_true",
        help="print the formatted physical plan instead of rows "
        "(pushdown/pruning/codegen inspection without running the job)",
    )
    sq.add_argument(
        "--limit",
        type=int,
        default=1000,
        help="max rows printed (0 = unlimited; the query itself still "
        "runs distributed)",
    )
    return parser


def _is_bare_parquet_tree(path: str) -> bool:
    """True when ``path`` holds a CandleDataset-style Hive tree (has
    ``exchange=`` partition dirs) without a commit log — the shape the
    default must refuse rather than shadow with an empty log."""
    import os  # noqa: PLC0415

    if not os.path.isdir(path) or os.path.isdir(
        os.path.join(path, "_manifests")
    ):
        return False
    try:
        return any(e.startswith("exchange=") for e in os.listdir(path))
    except OSError:
        return False


def _make_dataset(spark, args, data_dir: str | None = None):
    """SnapshotCandleDataset (the DEFAULT) or the plain-parquet
    CandleDataset per --plain-parquet/--date-bucket. The two expose the
    same ingest contract (read / resume_offset / append_idempotent),
    so every downstream caller is agnostic."""
    data_dir = data_dir or args.data_dir
    plain = getattr(args, "plain_parquet", False) or bool(
        getattr(args, "date_bucket", None)
    )
    if getattr(args, "snapshot_log", False) and plain:
        raise SystemExit(
            "--snapshot-log conflicts with --plain-parquet/--date-bucket "
            "(the log prunes by manifest stats, not dt= dirs)"
        )
    if plain:
        return CandleDataset(
            spark, data_dir, date_bucket=getattr(args, "date_bucket", None)
        )
    if _is_bare_parquet_tree(data_dir):
        raise SystemExit(
            f"{data_dir} holds a plain-parquet dataset but the default "
            "layout is now the snapshot log — pass --plain-parquet to "
            "keep using it, or migrate it into a logged dataset"
        )
    from ccxt_ohlcv_fetcher_spark.operators.candle_log import (  # noqa: PLC0415
        SnapshotCandleDataset,
    )

    return SnapshotCandleDataset(spark, data_dir)


def main(argv: list[str] | None = None) -> int:
    from ccxt_ohlcv_fetcher_spark.sources.paging import (  # noqa: PLC0415
        ingest_candles,
        ingest_exchange,
    )

    args = build_parser().parse_args(argv)
    spark = get_spark("ccxt_ohlcv_fetcher_spark.cli")
    now_ms = int(time.time() * 1000)

    if args.command == "fetch":
        exchange = _load_ccxt_exchange(args.exchange, args.rate_limit)
        catalog = _catalog_from_ccxt(exchange)
        catalog.validate(args.exchange, args.symbol, args.timeframe)  # `:213-260`
        dataset = _make_dataset(spark, args)
        stats = ingest_candles(
            spark,
            CcxtPagingSource(exchange, args.symbol, args.timeframe),
            dataset,
            args.exchange,
            args.symbol,
            args.timeframe,
            now_ms=now_ms,
            since_ms=_parse_since(args.since),
            quit_when_caught_up=args.quit_,
        )
        print(f"pages={stats.pages} rows={stats.rows_appended} errors={stats.errors}")
        return 0

    if args.command == "fetch-exchange":
        exchange = _load_ccxt_exchange(args.exchange, args.rate_limit)
        catalog = _catalog_from_ccxt(exchange)
        sources = {
            s: CcxtPagingSource(exchange, s, args.timeframe)
            for s in catalog.symbols_of(args.exchange)
        }
        dataset = _make_dataset(spark, args)
        results = ingest_exchange(
            spark,
            catalog,
            sources,
            dataset,
            args.exchange,
            args.timeframe,
            now_ms=now_ms,
            max_workers=args.workers,
            quit_when_caught_up=args.quit_,
        )
        total = sum(s.rows_appended for s in results.values())
        print(f"symbols={len(results)} rows={total}")
        return 0

    if args.command == "export-csv":
        dataset = _make_dataset(spark, args)
        export_csv(
            dataset.read(args.exchange, args.symbol, args.timeframe), args.out
        )
        print(f"exported -> {args.out}")
        return 0

    if args.command == "migrate-sqlite":
        from ccxt_ohlcv_fetcher_spark.sources.sqlite_legacy import (  # noqa: PLC0415
            migrate_sqlite_tree,
        )

        dataset = _make_dataset(spark, args)
        n = migrate_sqlite_tree(
            spark,
            args.root,
            dataset,
            distributed_discovery=args.distributed_discovery,
        )
        print(f"migrated rows={n}")
        return 0

    if args.command == "compact":
        if not (args.plain_parquet or args.date_bucket):
            dataset = _make_dataset(spark, args)
            if args.partial:
                v = dataset.store.compact_partial(
                    small_file_bytes=args.small_file_mb * 1024 * 1024
                )
                if v is None:
                    print("no partial compaction needed (too few small files)")
                else:
                    print(f"partially compacted to version={v}")
                return 0
            v = dataset.compact(
                when_dv_ratio_above=args.dv_ratio if args.auto else None,
                when_files_per_key_above=(
                    args.max_files_per_key if args.auto else None
                ),
            )
            if v is None:
                print(
                    f"no compaction needed (dv_ratio <= {args.dv_ratio}, "
                    f"files/key <= {args.max_files_per_key})"
                )
            else:
                print(f"compacted to version={v}")
            return 0
        if args.auto:
            raise SystemExit("--auto needs the logged layout (drop "
                             "--plain-parquet/--date-bucket)")
        dataset = _make_dataset(spark, args)
        n = dataset.compact(
            args.exchange, args.symbol, args.timeframe,
            since_ms=_parse_since(args.since),
        )
        print(f"compacted partitions={n}")
        return 0

    if args.command == "vacuum":
        if not (args.plain_parquet or args.date_bucket):
            dataset = _make_dataset(spark, args)
            dropped = dataset.retention(_parse_since(args.older_than))
            reclaimed = len(dataset.vacuum())
            print(f"vacuumed files={dropped} reclaimed_dirs={reclaimed}")
            return 0
        if not args.date_bucket:
            raise SystemExit(
                "plain-parquet vacuum needs --date-bucket (or drop "
                "--plain-parquet for the logged default)"
            )
        dataset = _make_dataset(spark, args)
        n = dataset.vacuum(_parse_since(args.older_than))
        print(f"vacuumed buckets={n}")
        return 0

    if args.command == "rollup":
        from ccxt_ohlcv_fetcher_spark.operators.rollup import (  # noqa: PLC0415
            MaterializedRollups,
        )

        # log is the default rollup-store layout; --date-bucket or the
        # explicit escape hatch opt out
        rollup_logged = not (args.date_bucket or args.rollup_plain_parquet)
        if rollup_logged and _is_bare_parquet_tree(args.rollup_dir):
            # same refusal rule as every --data-dir path (ADVICE r7): a
            # pre-existing plain-parquet rollup store must not be
            # silently shadowed by a new empty log (orphaned files +
            # a full recompute)
            raise SystemExit(
                f"{args.rollup_dir} holds a plain-parquet rollup store "
                "but the default layout is now the snapshot log — pass "
                "--rollup-plain-parquet (with --date-bucket if it was "
                "date-bucketed) to keep using it"
            )
        if args.base_plain_parquet or args.base_date_bucket:
            base = CandleDataset(
                spark, args.data_dir, date_bucket=args.base_date_bucket
            )
        else:
            from ccxt_ohlcv_fetcher_spark.operators.candle_log import (  # noqa: PLC0415
                SnapshotCandleDataset,
            )

            if _is_bare_parquet_tree(args.data_dir):
                raise SystemExit(
                    f"{args.data_dir} holds a plain-parquet dataset — "
                    "pass --base-plain-parquet (or --base-date-bucket)"
                )
            base = SnapshotCandleDataset(spark, args.data_dir)
        rollups = MaterializedRollups(
            spark,
            base,
            args.rollup_dir,
            levels=tuple(s.strip() for s in args.levels.split(",") if s.strip()),
            base_timeframe=args.base_timeframe,
            date_bucket=args.date_bucket,
            logged=rollup_logged,
        )
        appended = rollups.refresh()
        parts = " ".join(f"{lvl}={n}" for lvl, n in appended.items())
        if args.vacuum_older_than:
            cutoff = _parse_since(args.vacuum_older_than)
            if rollup_logged:
                dropped = rollups.store.retention(cutoff)
                reclaimed = len(rollups.store.vacuum())
                parts += (
                    f" vacuumed_files={dropped} reclaimed_dirs={reclaimed}"
                )
            else:
                dropped = rollups.store.vacuum(cutoff)
                parts += f" vacuumed_buckets={dropped}"
        print(f"rollup rows appended: {parts}")
        return 0

    if args.command == "delete":
        dataset = _make_dataset(spark, args)
        version, n = (
            dataset.delete_where_dv(args.where)
            if args.dv
            else dataset.delete_where(args.where)
        )
        if version is None:
            print("deleted rows=0 (no match, no commit)")
        else:
            print(f"deleted rows={n} version={version}")
        return 0

    if args.command == "history":
        dataset = _make_dataset(spark, args)
        want_counts = getattr(args, "counts", False)
        # counts ride the same single forward walk as the listing
        # (store.history(counts=True)): one pass over the deltas, each
        # DV parquet read once — O(versions), not O(versions x files)
        for h in dataset.store.history(counts=want_counts):
            line = (
                f"v{h['version']:06d} parent=v{h['parent']:06d} "
                f"{h['operation']:<9} files={h['n_files']}"
            )
            if want_counts:
                if h["rows"] is None:
                    # the version is still LISTED (manifests survive)
                    # but vacuum reclaimed a live DV or legacy data
                    # file — the count is unknowable, the listing must
                    # not abort mid-log
                    line += " rows=? (data reclaimed)"
                else:
                    line += f" rows={h['rows']}"
            print(line)
        return 0

    if args.command == "restore":
        dataset = _make_dataset(spark, args)
        v = dataset.store.restore(args.version)
        print(f"restored to snapshot of v{args.version} as version={v}")
        return 0

    if args.command == "changes":
        dataset = _make_dataset(spark, args)
        if args.drain:
            if not (args.out and args.checkpoint):
                raise SystemExit("changes --drain needs --out and --checkpoint")
            from ccxt_ohlcv_fetcher_spark.sources.change_stream import (  # noqa: PLC0415
                drain_available,
                register as register_changes,
            )

            register_changes(spark)
            src_path = dataset.store.path

            def _start_drain():
                reader = (
                    spark.readStream.format("snapshot_changes")
                    .option("path", src_path)
                    .option(
                        "startingVersion", str(args.from_version or 0)
                    )
                )
                if args.max_versions_per_batch:
                    reader = reader.option(
                        "maxVersionsPerBatch",
                        str(args.max_versions_per_batch),
                    )
                if args.max_files_per_batch:
                    reader = reader.option(
                        "maxFilesPerBatch", str(args.max_files_per_batch)
                    )
                return (
                    reader.load()
                    .writeStream.format("parquet")
                    .option("path", args.out)
                    .option("checkpointLocation", args.checkpoint)
                    .trigger(availableNow=True)
                    .start()
                )

            rounds = drain_available(_start_drain)
            n = spark.read.parquet(args.out).count()
            print(f"drained rounds={rounds} rows_total={n} -> {args.out}")
            return 0
        if args.from_version is None:
            raise SystemExit("changes needs --from-version (or --drain)")
        feed = dataset.store.read_row_changes(
            args.from_version, args.to_version
        )
        n = feed.count()
        for r in feed.orderBy("_change", *feed.columns[:1]).limit(
            args.limit
        ).collect():
            print(dict(r.asDict()))
        print(f"changes rows={n} from=v{args.from_version}")
        return 0

    if args.command == "mirror":
        from ccxt_ohlcv_fetcher_spark.operators.snapshots import (  # noqa: PLC0415
            SnapshotStore,
        )
        from ccxt_ohlcv_fetcher_spark.sources.change_stream import (  # noqa: PLC0415
            apply_changes_batch,
            drain_available,
            register as register_changes,
            replicate_changes,
        )

        target = SnapshotStore(spark, args.data_dir)
        keys = [k.strip() for k in args.keys.split(",") if k.strip()]
        if args.max_versions_per_batch:
            register_changes(spark)

            def _start():
                return (
                    spark.readStream.format("snapshot_changes")
                    .option("path", args.source_dir)
                    .option("startingVersion", str(args.starting_version))
                    .option(
                        "maxVersionsPerBatch",
                        str(args.max_versions_per_batch),
                    )
                    .load()
                    .writeStream.foreachBatch(
                        lambda b, _bid: apply_changes_batch(b, target, keys)
                    )
                    .option("checkpointLocation", args.checkpoint)
                    .trigger(availableNow=True)
                    .start()
                )

            rounds = drain_available(_start)
            print(
                f"mirrored rounds={rounds} "
                f"target_version={target.latest_version()}"
            )
        else:
            q = replicate_changes(
                spark,
                args.source_dir,
                target,
                keys,
                args.checkpoint,
                args.starting_version,
            )
            q.awaitTermination()
            print(f"mirrored target_version={target.latest_version()}")
        if args.verify:
            from ccxt_ohlcv_fetcher_spark.sources.change_stream import (  # noqa: PLC0415
                content_fingerprint,
            )

            src_fp = content_fingerprint(
                SnapshotStore(spark, args.source_dir).read()
            )
            tgt_fp = content_fingerprint(target.read())
            if src_fp != tgt_fp:
                print(
                    f"VERIFY FAILED: source {src_fp} != target {tgt_fp}"
                )
                return 1
            print(f"verified: fingerprints match {src_fp}")
        return 0

    if args.command == "sql":
        if not args.sf_dir and not args.data_dir:
            raise SystemExit("sql needs --sf-dir and/or --data-dir")
        if args.sf_dir:
            from ccxt_ohlcv_fetcher_spark.sources.tables import (  # noqa: PLC0415
                register_views,
            )

            register_views(spark, args.sf_dir)
        if args.data_dir:
            # time travel works on any LOGGED dataset — the default
            # layout — so gate on the plain opt-out, not on the
            # compatibility no-op --snapshot-log flag (ADVICE r7)
            pin_version = args.version
            if (
                pin_version is not None
                or getattr(args, "timestamp", None) is not None
            ) and getattr(args, "plain_parquet", False):
                raise SystemExit(
                    "--version/--timestamp need the logged layout "
                    "(drop --plain-parquet)"
                )
            if pin_version is not None and args.timestamp is not None:
                raise SystemExit("pass --version or --timestamp, not both")
            ds = _make_dataset(spark, args)
            if getattr(args, "timestamp", None) is not None:
                pin_version = ds.store.version_at_timestamp(args.timestamp)
            candles = (
                ds.read(version=pin_version)
                if pin_version is not None
                else ds.read()
            )
            candles.createOrReplaceTempView("candles")
        df = spark.sql(args.query)
        if args.explain:
            print(
                df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
            )
            return 0
        if args.limit:
            df = df.limit(args.limit)
        pdf = df.toPandas()
        if args.format == "csv":
            pdf.to_csv(sys.stdout, index=False)
        else:
            pdf.to_json(sys.stdout, orient="records", lines=True)
            sys.stdout.write("\n")
        return 0

    raise AssertionError(f"unhandled command {args.command}")  # pragma: no cover


if __name__ == "__main__":
    sys.exit(main())
