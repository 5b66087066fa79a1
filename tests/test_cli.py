"""CLI parity (reference entry points 1-3, SURVEY.md §3):
flag surface of `parse_args` (`ccxt-ohlcv-fetch.py:175-210`), the
offline subcommands end-to-end, and the import-gated ccxt path.
"""

from __future__ import annotations

import pytest

from ccxt_ohlcv_fetcher_spark.__main__ import _parse_since, build_parser, main


def test_fetch_flags_match_reference():
    p = build_parser()
    ns = p.parse_args(
        [
            "fetch", "-s", "XRP/USD", "-e", "bitfinex", "-t", "1m",
            "--since", "2018-01-01T00:00:00Z", "--debug", "-r", "20", "-q",
        ]
    )
    assert (ns.symbol, ns.exchange, ns.timeframe) == ("XRP/USD", "bitfinex", "1m")
    assert ns.since == "2018-01-01T00:00:00Z"
    assert ns.debug and ns.quit_ and ns.rate_limit == 20


def test_fetch_requires_symbol_and_exchange():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["fetch", "-s", "XRP/USD"])
    with pytest.raises(SystemExit):
        build_parser().parse_args(["fetch", "-e", "bitfinex"])


def test_parse_since_is_utc():
    # `exchange.parse8601` parity (`:287`): Z and naive both UTC
    assert _parse_since("2018-01-01T00:00:00Z") == 1514764800000
    assert _parse_since("2018-01-01T00:00:00") == 1514764800000
    assert _parse_since(None) is None


def test_fetch_without_ccxt_fails_cleanly(tmp_path):
    # the container has no ccxt -> live fetch must exit with guidance,
    # not a traceback (import-gated optional dependency)
    try:
        import ccxt  # noqa: F401

        pytest.skip("ccxt unexpectedly present")
    except ImportError:
        pass
    with pytest.raises(SystemExit) as exc:
        main(["fetch", "-s", "XRP/USD", "-e", "bitfinex", "-t", "1m", "-q"])
    assert "ccxt" in str(exc.value)


def test_migrate_and_export_csv_offline(spark, tmp_path, capsys):
    from tests.test_sqlite_legacy import make_legacy_tree

    counts = make_legacy_tree(str(tmp_path / "legacy"))
    data_dir = str(tmp_path / "candles")
    assert (
        main(["migrate-sqlite", str(tmp_path / "legacy"), "--data-dir", data_dir]) == 0
    )
    assert f"rows={sum(counts.values())}" in capsys.readouterr().out

    out = str(tmp_path / "out_csv")
    assert (
        main(
            [
                "export-csv", out, "--data-dir", data_dir,
                "-e", "bitfinex", "-s", "XRPUSD", "-t", "1m",
            ]
        )
        == 0
    )
    exported = spark.read.option("header", True).csv(out)
    assert exported.count() == counts["bitfinex/XRPUSD/1m"]
    assert set(exported.columns) >= {"timestamp", "open", "close", "volume"}


def test_compact_and_vacuum_subcommands(spark, tmp_path, capsys):
    from ccxt_ohlcv_fetcher_spark.operators.ingest import (
        CandleDataset,
        project_ohlcv_rows,
    )

    DAY_T0 = 1700000000000 - (1700000000000 % 86_400_000)
    ds = CandleDataset(spark, str(tmp_path / "c"), date_bucket="day")
    rows = [[DAY_T0 + i * 3_600_000, 1.0, 2.0, 0.5, 1.5, 3.0] for i in range(48)]
    for i in range(0, 48, 12):
        ds.append_idempotent(project_ohlcv_rows(spark, rows[i : i + 12], "e", "S/X", "1h"))

    assert main(["compact", "--data-dir", ds.path, "--date-bucket", "day"]) == 0
    assert "compacted partitions=2" in capsys.readouterr().out

    import datetime

    cutoff = datetime.datetime.fromtimestamp(
        (DAY_T0 + 86_400_000) / 1000, tz=datetime.timezone.utc
    ).strftime("%Y-%m-%dT%H:%M:%SZ")
    assert main(
        ["vacuum", "--data-dir", ds.path, "--date-bucket", "day", "--older-than", cutoff]
    ) == 0
    assert "vacuumed buckets=1" in capsys.readouterr().out
    assert ds.read().count() == 24


def test_rollup_subcommand(spark, tmp_path, capsys):
    """`rollup` refreshes the 1m->1h ladder offline, is idempotent on a
    second run, and `--vacuum-older-than` drops old rollup buckets."""
    from ccxt_ohlcv_fetcher_spark.operators.ingest import (
        CandleDataset,
        project_ohlcv_rows,
    )

    DAY_T0 = 1700000000000 - (1700000000000 % 86_400_000)
    base = CandleDataset(spark, str(tmp_path / "base"))
    rows = [[DAY_T0 + i * 60_000, 1.0, 2.0, 0.5, 1.5, 3.0] for i in range(180)]
    base.append_idempotent(project_ohlcv_rows(spark, rows, "e", "S/X", "1m"))

    argv = [
        "rollup", "--data-dir", base.path, "--rollup-dir", str(tmp_path / "r"),
        "--levels", "1h", "--date-bucket", "month", "--base-plain-parquet",
    ]
    assert main(argv) == 0
    out = capsys.readouterr().out
    # 180 minutes: last candle opens at +179m, horizon = +180m, which is
    # exactly hour 3's bucket end -> all three hourly buckets are closed
    assert "1h=3" in out

    assert main(argv) == 0  # refresh is idempotent: nothing new appended
    assert "1h=0" in capsys.readouterr().out

    import datetime

    cutoff = datetime.datetime.fromtimestamp(
        (DAY_T0 + 40 * 86_400_000) / 1000, tz=datetime.timezone.utc
    ).strftime("%Y-%m-%dT%H:%M:%SZ")
    assert main(argv + ["--vacuum-older-than", cutoff]) == 0
    assert "vacuumed_buckets=1" in capsys.readouterr().out


def test_rollup_vacuum_older_than_flagless_is_logged_retention(tmp_path, capsys):
    """--vacuum-older-than no longer demands --date-bucket: the
    flagless rollup store is snapshot-logged, where the cutoff runs the
    metadata-only retention commit (a no-op on an empty store)."""
    assert main([
        "rollup", "--data-dir", str(tmp_path / "b"), "--rollup-dir",
        str(tmp_path / "r"), "--vacuum-older-than", "2024-01-01T00:00:00Z",
    ]) == 0
    assert "vacuumed_files=0" in capsys.readouterr().out


def test_fetch_exchange_date_bucket_flag():
    ns = build_parser().parse_args(
        ["fetch-exchange", "bitfinex", "-t", "1m", "--date-bucket", "month"]
    )
    assert ns.date_bucket == "month"


def test_rollup_subcommand_on_bucketed_base(spark, tmp_path, capsys):
    """`rollup --base-date-bucket`: refreshing from a date-bucketed BASE
    dataset works (the directory-pruned read path feeds the ladder)."""
    from ccxt_ohlcv_fetcher_spark.operators.ingest import (
        CandleDataset,
        project_ohlcv_rows,
    )

    DAY_T0 = 1700000000000 - (1700000000000 % 86_400_000)
    base = CandleDataset(spark, str(tmp_path / "base"), date_bucket="month")
    rows = [[DAY_T0 + i * 60_000, 1.0, 2.0, 0.5, 1.5, 3.0] for i in range(120)]
    base.append_idempotent(project_ohlcv_rows(spark, rows, "e", "S/X", "1m"))

    assert main([
        "rollup", "--data-dir", base.path, "--rollup-dir", str(tmp_path / "r"),
        "--levels", "1h", "--base-date-bucket", "month",
    ]) == 0
    # 120 minutes: horizon exactly closes both hourly buckets
    assert "1h=2" in capsys.readouterr().out


def test_snapshot_log_cli_roundtrip(spark, tmp_path, capsys):
    """--snapshot-log end-to-end offline: append via the dataset API,
    then export-csv / compact / vacuum subcommands against the logged
    dataset; --date-bucket is rejected alongside it."""
    from ccxt_ohlcv_fetcher_spark.operators.candle_log import (
        SnapshotCandleDataset,
    )
    from tests.test_candle_log import MIN, T0, batch

    data_dir = str(tmp_path / "logged")
    ds = SnapshotCandleDataset(spark, data_dir)
    ds.append_idempotent(batch(spark, 0, 6))
    ds.append_idempotent(batch(spark, 6, 9))

    out = str(tmp_path / "out_csv")
    assert main(
        ["export-csv", out, "--data-dir", data_dir, "--snapshot-log",
         "-e", "e", "-s", "XRP/USD", "-t", "1m"]
    ) == 0
    assert spark.read.option("header", True).csv(out).count() == 9

    assert main(["compact", "--data-dir", data_dir, "--snapshot-log"]) == 0
    assert "version=" in capsys.readouterr().out
    assert ds.read().count() == 9

    import datetime as dt

    cutoff = dt.datetime.fromtimestamp(
        (T0 + 9 * MIN) / 1000, tz=dt.timezone.utc
    ).isoformat()
    assert main(
        ["vacuum", "--data-dir", data_dir, "--snapshot-log",
         "--older-than", cutoff]
    ) == 0
    assert "vacuumed files=" in capsys.readouterr().out
    assert ds.read().count() == 0  # all candles older than the cutoff

    with pytest.raises(SystemExit, match="conflicts"):
        main(["compact", "--data-dir", data_dir, "--snapshot-log",
              "--date-bucket", "day"])
    # flagless vacuum hits the LOGGED default and succeeds
    assert main(["vacuum", "--data-dir", data_dir, "--older-than", cutoff]) == 0
    # the plain escape hatch still demands a date-bucketed layout
    with pytest.raises(SystemExit, match="date-bucket"):
        main(["vacuum", "--data-dir", data_dir, "--plain-parquet",
              "--older-than", cutoff])


def test_sql_subcommand(spark, tmp_path, capsys):
    """Ad-hoc `sql`: fixture views + the candles view from a logged
    dataset in one query surface; csv and json formats; needs at least
    one source."""
    from ccxt_ohlcv_fetcher_spark.operators.candle_log import (
        SnapshotCandleDataset,
    )
    from tests.test_candle_log import batch

    data_dir = str(tmp_path / "logged")
    SnapshotCandleDataset(spark, data_dir).append_idempotent(batch(spark, 0, 6))

    assert main(
        ["sql", "--sf-dir", "/root/testdata/sf0.001", "--data-dir", data_dir,
         "--snapshot-log", "--query",
         "SELECT (SELECT count(*) FROM region) AS regions, "
         "(SELECT count(*) FROM candles) AS candles"]
    ) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "regions,candles" and out[1] == "5,6"

    assert main(
        ["sql", "--sf-dir", "/root/testdata/sf0.001", "--format", "json",
         "--limit", "2", "--query",
         "SELECT n_name FROM nation ORDER BY n_name"]
    ) == 0
    import json

    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert lines == [{"n_name": "NATION_0"}, {"n_name": "NATION_1"}]

    with pytest.raises(SystemExit, match="sf-dir"):
        main(["sql", "--query", "SELECT 1"])


def test_delete_subcommand(spark, tmp_path, capsys):
    """Row-level delete from the CLI on a logged dataset; no-match is a
    commit-free no-op; works flagless (the log is the default)."""
    from ccxt_ohlcv_fetcher_spark.operators.candle_log import (
        SnapshotCandleDataset,
    )
    from tests.test_candle_log import MIN, T0, batch

    data_dir = str(tmp_path / "logged")
    ds = SnapshotCandleDataset(spark, data_dir)
    ds.append_idempotent(batch(spark, 0, 9))

    assert main(
        ["delete", "--data-dir", data_dir, "--snapshot-log",
         "--where", "close < 0"]
    ) == 0
    assert "rows=0" in capsys.readouterr().out  # no match, no commit
    assert ds.read().count() == 9

    assert main(
        ["delete", "--data-dir", data_dir, "--snapshot-log",
         "--where", f"timestamp < {T0 + 3 * MIN}"]
    ) == 0
    assert "deleted rows=3" in capsys.readouterr().out
    assert ds.read().count() == 6

    # flagless delete hits the logged default and works
    assert main(
        ["delete", "--data-dir", data_dir,
         "--where", f"timestamp < {T0 + 4 * MIN}"]
    ) == 0
    assert "deleted rows=1" in capsys.readouterr().out
    assert ds.read().count() == 5


def test_history_and_time_travel_sql(spark, tmp_path, capsys):
    """`history` prints the commit log; `sql --version` pins the
    candles view to a historical snapshot."""
    from ccxt_ohlcv_fetcher_spark.operators.candle_log import (
        SnapshotCandleDataset,
    )
    from tests.test_candle_log import batch

    data_dir = str(tmp_path / "logged")
    ds = SnapshotCandleDataset(spark, data_dir)
    ds.append_idempotent(batch(spark, 0, 6))   # v1
    ds.append_idempotent(batch(spark, 6, 9))   # v2

    assert main(["history", "--data-dir", data_dir, "--snapshot-log"]) == 0
    out = capsys.readouterr().out
    assert "v000001" in out and "v000002" in out and "append" in out

    assert main(
        ["sql", "--data-dir", data_dir, "--snapshot-log", "--version", "1",
         "--query", "SELECT count(*) AS n FROM candles"]
    ) == 0
    assert "6" in capsys.readouterr().out
    assert main(
        ["sql", "--data-dir", data_dir, "--snapshot-log",
         "--query", "SELECT count(*) AS n FROM candles"]
    ) == 0
    assert "9" in capsys.readouterr().out

    # --version without any layout flag hits the logged DEFAULT and
    # works (ADVICE r7: the old gate demanded the no-op --snapshot-log);
    # the refusal now applies to the plain opt-out only — see
    # test_sql_version_time_travels_default_logged_dataset.
    assert main(
        ["sql", "--data-dir", data_dir, "--version", "1",
         "--query", "SELECT count(*) AS n FROM candles"]
    ) == 0
    assert "6" in capsys.readouterr().out

    # --timestamp (TIMESTAMP AS OF): pin by the v1 commit's wall clock
    t1 = ds.store.manifest(1)["ts"]
    assert main(
        ["sql", "--data-dir", data_dir, "--timestamp", str(t1),
         "--query", "SELECT count(*) AS n FROM candles"]
    ) == 0
    assert "6" in capsys.readouterr().out
    assert main(
        ["sql", "--data-dir", data_dir, "--timestamp", str(t1 + 3600),
         "--query", "SELECT count(*) AS n FROM candles"]
    ) == 0
    assert "9" in capsys.readouterr().out
    with pytest.raises(SystemExit, match="not both"):
        main(
            ["sql", "--data-dir", data_dir, "--version", "1",
             "--timestamp", str(t1),
             "--query", "SELECT 1"]
        )


def test_delete_subcommand_dv_mode(spark, tmp_path, capsys):
    """--dv records deletion vectors (no file rewrite); compact
    materializes them; resume offsets reflect the live rows."""
    from ccxt_ohlcv_fetcher_spark.operators.candle_log import (
        SnapshotCandleDataset,
    )
    from tests.test_candle_log import MIN, T0, batch

    data_dir = str(tmp_path / "logged")
    ds = SnapshotCandleDataset(spark, data_dir)
    ds.append_idempotent(batch(spark, 0, 9))
    files_before = ds.store.manifest()["files"]

    assert main(
        ["delete", "--data-dir", data_dir, "--snapshot-log", "--dv",
         "--where", f"timestamp >= {T0 + 6 * MIN}"]
    ) == 0
    assert "deleted rows=3" in capsys.readouterr().out
    assert ds.read().count() == 6
    m = ds.store.manifest()
    assert m["files"] == files_before and m.get("dvs")
    ds.compact()
    assert "dvs" not in ds.store.manifest()
    assert ds.read().count() == 6


def test_changes_subcommand(spark, tmp_path, capsys):
    """Signed change feed from the CLI: appends +1, deletes -1."""
    from ccxt_ohlcv_fetcher_spark.operators.candle_log import (
        SnapshotCandleDataset,
    )
    from tests.test_candle_log import MIN, T0, batch

    data_dir = str(tmp_path / "logged")
    ds = SnapshotCandleDataset(spark, data_dir)
    ds.append_idempotent(batch(spark, 0, 6))
    ds.delete_where(f"timestamp < {T0 + 2 * MIN}")

    assert main(
        ["changes", "--data-dir", data_dir, "--snapshot-log",
         "--from-version", "0"]
    ) == 0
    out = capsys.readouterr().out
    assert "changes rows=8 from=v0" in out  # 6 adds + 2 removes
    assert "'_change': -1" in out and "'_change': 1" in out


def test_default_layout_is_snapshot_log(spark, tmp_path, capsys):
    """Round-7 flip: flagless CLI commands operate on a LOGGED dataset
    — migrate-sqlite writes a commit log, history works without any
    flag, and a pre-existing bare-parquet tree is refused under the
    default instead of silently shadowed by an empty log."""
    import os

    from tests.test_sqlite_legacy import make_legacy_tree

    counts = make_legacy_tree(str(tmp_path / "legacy"))
    data_dir = str(tmp_path / "candles")
    assert (
        main(["migrate-sqlite", str(tmp_path / "legacy"), "--data-dir", data_dir]) == 0
    )
    capsys.readouterr()
    assert os.path.isdir(os.path.join(data_dir, "_manifests"))
    assert main(["history", "--data-dir", data_dir]) == 0
    assert "append" in capsys.readouterr().out

    # time travel / delete work out of the box on the flagless dataset
    assert main(
        ["delete", "--data-dir", data_dir, "--where", "timestamp < 0"]
    ) == 0
    assert "deleted rows=0" in capsys.readouterr().out

    # bare-parquet tree under the default -> refused with guidance
    from ccxt_ohlcv_fetcher_spark.operators.ingest import (
        CandleDataset,
        project_ohlcv_rows,
    )

    plain_dir = str(tmp_path / "plain")
    plain = CandleDataset(spark, plain_dir)
    rows = [[1700000000000 - (1700000000000 % 60000), 1.0, 2.0, 0.5, 1.5, 3.0]]
    plain.append_idempotent(project_ohlcv_rows(spark, rows, "e", "S/X", "1m"))
    out = str(tmp_path / "o")
    with pytest.raises(SystemExit, match="plain-parquet"):
        main(["export-csv", out, "--data-dir", plain_dir])
    # ... and accepted with the escape hatch
    assert main(
        ["export-csv", out, "--data-dir", plain_dir, "--plain-parquet"]
    ) == 0
    assert spark.read.option("header", True).csv(out).count() == 1


def test_compact_auto_policy_cli(spark, tmp_path, capsys):
    """`compact --auto` on the (default) logged dataset: no-op below
    the DV threshold, compacts above it, and the DV report empties."""
    from ccxt_ohlcv_fetcher_spark.operators.candle_log import (
        SnapshotCandleDataset,
    )
    from tests.test_candle_log import MIN, T0, batch

    data_dir = str(tmp_path / "logged")
    ds = SnapshotCandleDataset(spark, data_dir)
    ds.append_idempotent(batch(spark, 0, 20))
    ds.delete_where_dv(f"timestamp < {T0 + 1 * MIN}")  # 5% deleted

    assert main(["compact", "--data-dir", data_dir, "--auto"]) == 0
    assert "no compaction needed" in capsys.readouterr().out

    ds.delete_where_dv(f"timestamp < {T0 + 10 * MIN}")  # 50% deleted
    assert main(
        ["compact", "--data-dir", data_dir, "--auto", "--dv-ratio", "0.3"]
    ) == 0
    assert "compacted to version=" in capsys.readouterr().out
    assert ds.store.dv_stats()["n_deleted"] == 0
    assert ds.read().count() == 10

    with pytest.raises(SystemExit, match="auto"):
        main(["compact", "--data-dir", data_dir, "--auto", "--plain-parquet"])


def test_mirror_subcommand_replicates_and_follows_deletes(spark, tmp_path, capsys):
    """`mirror`: CDC-replicate a logged candle dataset into another via
    the change feed — initial sync, incremental re-sync after appends
    AND a row-level delete, and the capped (--max-versions-per-batch)
    form drains rounds until converged."""
    from ccxt_ohlcv_fetcher_spark.operators.candle_log import (
        SnapshotCandleDataset,
    )
    from ccxt_ohlcv_fetcher_spark.operators.snapshots import SnapshotStore
    from tests.test_candle_log import MIN, T0, batch

    src_dir = str(tmp_path / "src")
    src = SnapshotCandleDataset(spark, src_dir)
    src.append_idempotent(batch(spark, 0, 6))

    tgt_dir = str(tmp_path / "tgt")
    cp = str(tmp_path / "cp")
    assert main(
        ["mirror", "--source-dir", src_dir, "--data-dir", tgt_dir,
         "--checkpoint", cp]
    ) == 0
    assert "mirrored target_version=" in capsys.readouterr().out
    tgt = SnapshotStore(spark, tgt_dir)
    assert tgt.read().count() == 6

    # source evolves: append + row-level delete; re-sync follows both
    src.append_idempotent(batch(spark, 6, 9))
    src.delete_where(f"timestamp < {T0 + 2 * MIN}")
    assert main(
        ["mirror", "--source-dir", src_dir, "--data-dir", tgt_dir,
         "--checkpoint", cp]
    ) == 0
    capsys.readouterr()
    got = sorted(r["timestamp"] for r in tgt.read().collect())
    want = sorted(
        r["timestamp"] for r in src.read().collect()
    )
    assert got == want and len(got) == 7

    # capped form on a fresh target: drains multiple rounds, same
    # state, and --verify's anti-entropy fingerprints match
    tgt2_dir = str(tmp_path / "tgt2")
    assert main(
        ["mirror", "--source-dir", src_dir, "--data-dir", tgt2_dir,
         "--checkpoint", str(tmp_path / "cp2"),
         "--max-versions-per-batch", "1", "--verify"]
    ) == 0
    out = capsys.readouterr().out
    assert "rounds=" in out and "fingerprints match" in out
    tgt2 = SnapshotStore(spark, tgt2_dir)
    assert sorted(r["timestamp"] for r in tgt2.read().collect()) == want

    # a corrupted replica fails the verify with exit 1
    tgt2.delete_where(f"timestamp = {T0 + 5 * MIN}")
    assert main(
        ["mirror", "--source-dir", src_dir, "--data-dir", tgt2_dir,
         "--checkpoint", str(tmp_path / "cp2"), "--verify"]
    ) == 1
    assert "VERIFY FAILED" in capsys.readouterr().out


def test_rollup_flagless_uses_logged_store_with_retention(spark, tmp_path, capsys):
    """Flagless `rollup`: both the BASE and the rollup STORE are
    snapshot-logged; refresh is idempotent; --vacuum-older-than runs
    the metadata-only retention commit + physical vacuum on the logged
    store (no --date-bucket needed)."""
    import datetime
    import os

    from ccxt_ohlcv_fetcher_spark.operators.candle_log import (
        SnapshotCandleDataset,
    )
    from ccxt_ohlcv_fetcher_spark.operators.ingest import project_ohlcv_rows

    DAY_T0 = 1700000000000 - (1700000000000 % 86_400_000)
    base = SnapshotCandleDataset(spark, str(tmp_path / "base"))
    rows = [[DAY_T0 + i * 60_000, 1.0, 2.0, 0.5, 1.5, 3.0] for i in range(180)]
    base.append_idempotent(project_ohlcv_rows(spark, rows, "e", "S/X", "1m"))

    rollup_dir = str(tmp_path / "r")
    argv = [
        "rollup", "--data-dir", base.path, "--rollup-dir", rollup_dir,
        "--levels", "1h",
    ]
    assert main(argv) == 0
    assert "1h=3" in capsys.readouterr().out
    assert os.path.isdir(os.path.join(rollup_dir, "_manifests"))  # logged
    store = SnapshotCandleDataset(spark, rollup_dir)
    assert store.read(timeframe="1h").count() == 3

    assert main(argv) == 0  # idempotent
    assert "1h=0" in capsys.readouterr().out

    # second refresh commit: hours 3-5 land in their own file(s), so
    # the metadata-only retention (whole-file drops by max timestamp)
    # can drop the first commit's file and keep the new one
    more = [
        [DAY_T0 + i * 60_000, 1.0, 2.0, 0.5, 1.5, 3.0]
        for i in range(180, 360)
    ]
    base.append_idempotent(project_ohlcv_rows(spark, more, "e", "S/X", "1m"))
    assert main(argv) == 0
    assert "1h=3" in capsys.readouterr().out

    cutoff = datetime.datetime.fromtimestamp(
        (DAY_T0 + 3 * 3_600_000) / 1000, tz=datetime.timezone.utc
    ).strftime("%Y-%m-%dT%H:%M:%SZ")
    assert main(argv + ["--vacuum-older-than", cutoff]) == 0
    out = capsys.readouterr().out
    assert "vacuumed_files=1" in out
    got = sorted(
        r["timestamp"] for r in store.read(timeframe="1h").collect()
    )
    assert got == [DAY_T0 + h * 3_600_000 for h in (3, 4, 5)]


def test_sql_explain_prints_plan_without_running(spark, tmp_path, capsys):
    """`sql --explain`: the formatted physical plan (PushedFilters /
    scan shape visible) with no row output — the pushdown-inspection
    surface for ad-hoc users."""
    import os

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    assert main([
        "sql", "--sf-dir", sf_dir, "--explain",
        "--query",
        "SELECT o_orderkey FROM orders WHERE o_totalprice > 1000",
    ]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out
    assert "PushedFilters" in out and "o_totalprice" in out
    assert "o_orderkey" not in out.splitlines()[-2]  # no row output


def test_changes_drain_converges_exactly_once(spark, tmp_path, capsys):
    """`changes --drain` (round-8 verdict item 5): capped catch-up over
    the snapshot_changes source — multiple admission-control rounds
    converge on the source head, the drained parquet holds exactly the
    feed's rows, and a re-run with the same checkpoint drains ZERO new
    rows (exactly-once). An append after convergence drains only the
    delta."""
    from ccxt_ohlcv_fetcher_spark.operators.candle_log import (
        SnapshotCandleDataset,
    )
    from tests.test_candle_log import batch

    data_dir = str(tmp_path / "logged")
    ds = SnapshotCandleDataset(spark, data_dir)
    for i in range(5):  # 5 commits, 3 rows each
        ds.append_idempotent(batch(spark, 3 * i, 3 * i + 3))
    out, ck = str(tmp_path / "feed"), str(tmp_path / "ck")

    drain = [
        "changes", "--data-dir", data_dir, "--drain", "--out", out,
        "--checkpoint", ck, "--max-versions-per-batch", "1",
    ]
    assert main(drain) == 0
    msg = capsys.readouterr().out
    rounds = int(msg.split("rounds=")[1].split()[0])
    total = int(msg.split("rows_total=")[1].split()[0])
    assert rounds >= 6  # 5 capped rounds + the final empty one
    assert total == 15
    feed = spark.read.parquet(out)
    assert feed.filter("_change = 1").count() == 15
    assert feed.select("_commit_version").distinct().count() == 5

    # exactly-once: a re-run against the same checkpoint adds nothing
    assert main(drain) == 0
    msg2 = capsys.readouterr().out
    assert int(msg2.split("rows_total=")[1].split()[0]) == 15

    # incremental: one more commit drains only its rows
    ds.append_idempotent(batch(spark, 15, 17))
    assert main(drain) == 0
    msg3 = capsys.readouterr().out
    assert int(msg3.split("rows_total=")[1].split()[0]) == 17

    # batch mode still demands --from-version
    with pytest.raises(SystemExit, match="from-version"):
        main(["changes", "--data-dir", data_dir])


def test_sql_version_time_travels_default_logged_dataset(
    spark, tmp_path, capsys
):
    """ADVICE r7: time travel must work on the DEFAULT logged layout
    without any flag — the old gate demanded --snapshot-log, a
    documented no-op."""
    from ccxt_ohlcv_fetcher_spark.operators.candle_log import (
        SnapshotCandleDataset,
    )
    from tests.test_candle_log import batch

    data_dir = str(tmp_path / "logged")
    ds = SnapshotCandleDataset(spark, data_dir)
    ds.append_idempotent(batch(spark, 0, 4))
    ds.append_idempotent(batch(spark, 4, 9))
    assert main([
        "sql", "--data-dir", data_dir, "--version", "1",
        "--query", "SELECT count(*) AS n FROM candles",
    ]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["n", "4"]
    with pytest.raises(SystemExit, match="logged layout"):
        main([
            "sql", "--data-dir", data_dir, "--plain-parquet",
            "--version", "1", "--query", "SELECT 1",
        ])


def test_rollup_refuses_bare_parquet_rollup_store(spark, tmp_path):
    """ADVICE r7: a pre-existing plain-parquet rollup store must be
    refused under the logged default (same rule as every --data-dir),
    not silently shadowed by a new empty log."""
    import os

    from ccxt_ohlcv_fetcher_spark.operators.candle_log import (
        SnapshotCandleDataset,
    )
    from tests.test_candle_log import batch

    data_dir = str(tmp_path / "base")
    SnapshotCandleDataset(spark, data_dir).append_idempotent(
        batch(spark, 0, 3)
    )
    rollup_dir = str(tmp_path / "rollups")
    os.makedirs(os.path.join(rollup_dir, "exchange=e"))  # bare Hive tree
    with pytest.raises(SystemExit, match="rollup store"):
        main([
            "rollup", "--data-dir", data_dir, "--rollup-dir", rollup_dir,
        ])


def test_compact_partial_subcommand(spark, tmp_path, capsys):
    """`compact --partial`: bin-packing rewrite of the logged dataset's
    small files only (the 100 TB maintenance shape)."""
    from ccxt_ohlcv_fetcher_spark.operators.candle_log import (
        SnapshotCandleDataset,
    )
    from tests.test_candle_log import batch

    data_dir = str(tmp_path / "logged")
    ds = SnapshotCandleDataset(spark, data_dir)
    for i in range(5):  # five tiny commits
        ds.append_idempotent(batch(spark, 2 * i, 2 * i + 2))
    files_before = len(ds.store.manifest()["files"])
    assert main([
        "compact", "--data-dir", data_dir, "--partial",
    ]) == 0
    out = capsys.readouterr().out
    assert "partially compacted to version=" in out
    assert len(ds.store.manifest()["files"]) < files_before
    assert ds.read().count() == 10
    # nothing small left under a 0-ish threshold -> clean no-op
    assert main([
        "compact", "--data-dir", data_dir, "--partial",
        "--small-file-mb", "0",
    ]) == 0
    assert "no partial compaction needed" in capsys.readouterr().out


def test_restore_subcommand(spark, tmp_path, capsys):
    """`restore`: one metadata-only rollback commit on the logged
    default layout."""
    from ccxt_ohlcv_fetcher_spark.operators.candle_log import (
        SnapshotCandleDataset,
    )
    from tests.test_candle_log import batch

    data_dir = str(tmp_path / "logged")
    ds = SnapshotCandleDataset(spark, data_dir)
    ds.append_idempotent(batch(spark, 0, 6))   # v1
    ds.append_idempotent(batch(spark, 6, 9))   # v2
    main(["delete", "--data-dir", data_dir, "--where", "close > 0"])
    assert ds.read().count() == 0
    assert main(["restore", "--data-dir", data_dir, "--version", "2"]) == 0
    assert "version=4" in capsys.readouterr().out
    assert ds.read().count() == 9


def test_sql_version_help_matches_gating():
    """Verdict r9 doc fix: the gating was corrected in r7 to key on the
    --plain-parquet opt-out, but the help text still said 'needs
    --snapshot-log'. The help must describe the actual rule."""
    parser = build_parser()
    sub = next(
        a for a in parser._subparsers._group_actions
    ).choices["sql"]
    help_text = sub.format_help()
    assert "not available with --plain-parquet" in help_text
    assert "needs --snapshot-log" not in help_text


def test_history_counts_flag_prints_metadata_row_counts(
    spark, tmp_path, capsys
):
    """`history --counts` appends exact per-version row counts from
    the manifest (count_rows: _rows stats minus live DV positions) —
    no data scan."""
    from ccxt_ohlcv_fetcher_spark.operators.candle_log import (
        SnapshotCandleDataset,
    )
    from tests.test_candle_log import batch

    data_dir = str(tmp_path / "logged")
    ds = SnapshotCandleDataset(spark, data_dir)
    ds.append_idempotent(batch(spark, 0, 6))   # v1
    ds.append_idempotent(batch(spark, 6, 9))   # v2
    assert main(
        ["history", "--data-dir", data_dir, "--counts"]
    ) == 0
    out = capsys.readouterr().out
    assert "rows=6" in out and "rows=9" in out
