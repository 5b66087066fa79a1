"""E2: legacy SQLite tree -> partitioned parquet migration.

Builds real SQLite files in the reference's exact layout and schema
(`gen_db_name` ``ccxt-ohlcv-fetch.py:134-138``; DDL `:35-45` — prices
as TEXT), migrates, and checks values, pruning, and idempotency.
"""

from __future__ import annotations

import os
import sqlite3
from decimal import Decimal

from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.operators.ingest import CandleDataset
from ccxt_ohlcv_fetcher_spark.sources.sqlite_legacy import (
    discover_sqlite_files,
    migrate_sqlite_tree,
)

T0 = 1388534400000  # 2014-01-01T00:00:00Z, the reference's DEFAULT_SINCE


def make_legacy_tree(root: str) -> dict[str, int]:
    """Two (exchange,symbol,timeframe) files, reference layout + schema."""
    spec = {
        ("bitfinex", "XRPUSD", "1m"): 120,
        ("kraken", "BTCUSD", "5m"): 50,
    }
    counts = {}
    for (exchange, symbol, timeframe), n in spec.items():
        d = os.path.join(root, "ccxt", exchange, symbol, timeframe)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"{exchange}_{symbol}_{timeframe}.sqlite")
        con = sqlite3.connect(path)
        con.execute(
            "CREATE TABLE candles (timestamp INTEGER NOT NULL, open VARCHAR, "
            "high VARCHAR, low VARCHAR, close VARCHAR, volume VARCHAR, "
            "PRIMARY KEY (timestamp))"
        )
        step = 60_000 if timeframe == "1m" else 300_000
        con.executemany(
            "INSERT INTO candles VALUES (?,?,?,?,?,?)",
            [
                (
                    T0 + i * step,
                    f"{100 + i}.5",
                    f"{101 + i}.25",
                    f"{99 + i}.75",
                    f"{100 + i}.125",
                    f"{i}.000000000001",  # needs decimal, not double
                )
                for i in range(n)
            ],
        )
        con.commit()
        con.close()
        counts[f"{exchange}/{symbol}/{timeframe}"] = n
    return counts


def test_discover_parses_layout(tmp_path):
    make_legacy_tree(str(tmp_path))
    files = discover_sqlite_files(str(tmp_path))
    assert {(f["exchange"], f["symbol"], f["timeframe"]) for f in files} == {
        ("bitfinex", "XRPUSD", "1m"),
        ("kraken", "BTCUSD", "5m"),
    }


def test_migrate_values_pruning_idempotency(spark, tmp_path):
    make_legacy_tree(str(tmp_path))
    ds = CandleDataset(spark, str(tmp_path / "dataset"))

    appended = migrate_sqlite_tree(spark, str(tmp_path), ds)
    assert appended == 170

    # partition-pruned read of one legacy file's worth
    xrp = ds.read("bitfinex", "XRPUSD", "1m").orderBy("timestamp")
    rows = xrp.collect()
    assert len(rows) == 120
    assert rows[0]["timestamp"] == T0
    # decimal-as-text survived losslessly (would be 3.0 as double)
    assert rows[3]["volume"] == Decimal("3.000000000001")
    assert rows[3]["open"] == Decimal("103.5")

    # re-running the migration is a no-op (INSERT OR IGNORE semantics)
    assert migrate_sqlite_tree(spark, str(tmp_path), ds) == 0
    assert ds.read().count() == 170


def test_distributed_manifest_matches_driver_walk(spark, tmp_path):
    from ccxt_ohlcv_fetcher_spark.sources.sqlite_legacy import (
        discover_sqlite_manifest,
    )

    make_legacy_tree(str(tmp_path))
    driver_side = {
        (f["path"], f["exchange"], f["symbol"], f["timeframe"])
        for f in discover_sqlite_files(str(tmp_path))
    }
    manifest = {
        tuple(r) for r in discover_sqlite_manifest(spark, str(tmp_path)).collect()
    }
    assert manifest == driver_side and len(manifest) == 2


def test_migration_via_distributed_discovery(spark, tmp_path):
    counts = make_legacy_tree(str(tmp_path / "legacy"))
    ds = CandleDataset(spark, str(tmp_path / "candles"))
    n = migrate_sqlite_tree(
        spark, str(tmp_path / "legacy"), ds, distributed_discovery=True
    )
    assert n == sum(counts.values())
    # idempotent re-run, still through the distributed path
    assert (
        migrate_sqlite_tree(
            spark, str(tmp_path / "legacy"), ds, distributed_discovery=True
        )
        == 0
    )
    got = ds.read(exchange="bitfinex", symbol="XRPUSD", timeframe="1m")
    assert got.count() == counts["bitfinex/XRPUSD/1m"]
    # lossless decimal survives the manifest path too
    row = got.filter(F.col("timestamp") == T0 + 60_000).collect()[0]
    assert row["volume"] == Decimal("1.000000000001")


def test_manifest_empty_tree(spark, tmp_path):
    from ccxt_ohlcv_fetcher_spark.sources.sqlite_legacy import (
        discover_sqlite_manifest,
    )

    (tmp_path / "empty" / "sub").mkdir(parents=True)
    assert discover_sqlite_manifest(spark, str(tmp_path / "empty")).count() == 0
    assert (
        migrate_sqlite_tree(
            spark,
            str(tmp_path / "empty"),
            CandleDataset(spark, str(tmp_path / "c")),
            distributed_discovery=True,
        )
        == 0
    )
