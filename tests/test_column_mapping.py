"""Column mapping (Delta column-mapping "name" mode) on the snapshot
log: rename/drop become metadata-only commits because files store
PHYSICAL column names and the manifest carries the logical->physical
map. Pins the invariants that make it sound:

- enabling freezes physical = current names (no file rewrite; old
  files, change files and checkpoints stay byte-valid),
- stats/blooms are keyed physical, so manifest pruning survives a
  rename with zero manifest rewrites,
- a dropped column's physical name is TOMBSTONED in the manifest —
  a re-added logical name binds to a fresh physical name, so old
  file data can never resurrect (the failure mode that makes drop
  unsound without mapping),
- every row-level operation (CoW delete, DV delete, merge, compact,
  change feed, restore) keeps working under the map,
- the bucketed store's zero-shuffle property survives renaming the
  bucket key (alias-aware output partitioning over the physical
  scan).

Reference parity note: the reference script has a fixed 8-column
OHLCV schema and no ALTER story (ccxt-ohlcv-fetch.py:69-93); this is
the warehouse-grade schema-evolution surface a long-lived 100 TB
table needs (renames happen; rewriting the table for one is not an
option)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.operators.bucketed_log import (
    BucketedSnapshotStore,
)
from ccxt_ohlcv_fetcher_spark.operators.snapshots import SnapshotStore


def _mk(spark, tmp_path, **kw):
    return SnapshotStore(spark, str(tmp_path / "tbl"), **kw)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b")
    )


def test_enable_freezes_current_names_and_is_idempotent(spark, tmp_path):
    st = _mk(spark, tmp_path)
    st.append(_df(spark, 0, 10))
    v = st.enable_column_mapping()
    assert v == 2
    m = st.manifest()
    assert m["column_mapping"] == {"a": "a", "b": "b"}
    # idempotent: no second commit
    assert st.enable_column_mapping() == 2
    assert st.latest_version() == 2
    # reads identical to pre-enable
    assert sorted(r["a"] for r in st.read().collect()) == list(range(10))


def test_enable_refuses_empty_table(spark, tmp_path):
    st = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="empty table"):
        st.enable_column_mapping()


def test_rename_is_metadata_only_and_reads_back(spark, tmp_path):
    st = _mk(spark, tmp_path)
    st.append(_df(spark, 0, 10))
    st.enable_column_mapping()
    files_before = list(st.manifest()["files"])
    mtimes = {
        f: os.path.getmtime(os.path.join(st.path, f)) for f in files_before
    }
    v = st.rename_column("a", "alpha")
    m = st.manifest()
    assert m["schema"] == [["alpha", "bigint"], ["b", "bigint"]]
    assert m["column_mapping"] == {"alpha": "a", "b": "b"}
    # metadata-only: same files, untouched bytes
    assert m["files"] == files_before
    assert all(
        os.path.getmtime(os.path.join(st.path, f)) == mtimes[f]
        for f in files_before
    )
    got = st.read()
    assert got.columns == ["alpha", "b"]
    assert sorted(r["alpha"] for r in got.collect()) == list(range(10))
    # time travel still shows the OLD logical name
    old = st.read(version=v - 1)
    assert old.columns == ["a", "b"]


def test_rename_requires_mapping_and_validates_names(spark, tmp_path):
    st = _mk(spark, tmp_path)
    st.append(_df(spark, 0, 5))
    with pytest.raises(ValueError, match="enable_column_mapping"):
        st.rename_column("a", "alpha")
    st.enable_column_mapping()
    with pytest.raises(ValueError, match="no such column"):
        st.rename_column("zzz", "alpha")
    with pytest.raises(ValueError, match="already exists"):
        st.rename_column("a", "b")
    with pytest.raises(ValueError, match="equal"):
        st.rename_column("a", "a")


def test_stats_and_bloom_pruning_survive_rename(spark, tmp_path):
    st = _mk(spark, tmp_path, stats_cols=["a"], bloom_cols=["a"])
    # two appends with disjoint ranges -> distinct per-file stats
    st.append(_df(spark, 0, 10).coalesce(1))
    st.append(_df(spark, 100, 110).coalesce(1))
    st.enable_column_mapping()
    st.rename_column("a", "alpha")
    m = st.manifest()
    # stats entries stayed keyed by the PHYSICAL name ("a")
    assert all("a" in s for s in dict(m["stats"]).values())
    pruned = st.pruned_files({"alpha": (100, None)})
    assert len(pruned) == 1
    assert st.pruned_files_eq("alpha", 105) == pruned
    assert st.pruned_files_eq("alpha", 5) != pruned
    # appends AFTER the rename stamp stats under the same physical key
    st.append(
        spark.range(200, 210)
        .select(F.col("id").alias("alpha"), (F.col("id") * 2).alias("b"))
        .coalesce(1)
    )
    assert len(st.pruned_files({"alpha": (200, None)})) == 1


def test_schema_guard_speaks_logical_names(spark, tmp_path):
    st = _mk(spark, tmp_path)
    st.append(_df(spark, 0, 5))
    st.enable_column_mapping()
    st.rename_column("a", "alpha")
    # old logical name refused
    with pytest.raises(ValueError, match="schema mismatch"):
        st.append(_df(spark, 5, 10))
    # new logical name accepted
    st.append(
        spark.range(5, 10).select(
            F.col("id").alias("alpha"), (F.col("id") * 2).alias("b")
        )
    )
    assert st.count_rows() == 10


def test_add_column_evolution_gets_generated_physical_name(spark, tmp_path):
    st = _mk(spark, tmp_path)
    st.append(_df(spark, 0, 5))
    st.enable_column_mapping()
    st.append(
        spark.range(5, 8).select(
            F.col("id").alias("a"),
            (F.col("id") * 2).alias("b"),
            F.lit("x").alias("c"),
        ),
        merge_schema=True,
    )
    m = st.manifest()
    assert m["column_mapping"]["c"].startswith("col-")
    got = st.read()
    assert got.filter(F.col("c").isNotNull()).count() == 3
    assert got.filter(F.col("c").isNull()).count() == 5


def test_drop_column_tombstones_physical_name(spark, tmp_path):
    st = _mk(spark, tmp_path)
    st.append(
        spark.range(3).select(
            F.col("id").alias("a"), F.lit("old-secret").alias("c")
        )
    )
    st.enable_column_mapping()
    st.drop_column("c")
    m = st.manifest()
    assert m["schema"] == [["a", "bigint"]]
    assert "c" not in m["column_mapping"]
    assert m["column_mapping_burned"] == ["c"]
    assert st.read().columns == ["a"]
    # re-add the same logical name: fresh physical, old values invisible
    st.append(
        spark.createDataFrame([(99, "fresh")], "a long, c string"),
        merge_schema=True,
    )
    m = st.manifest()
    assert m["column_mapping"]["c"].startswith("col-")
    vals = [
        r["c"]
        for r in st.read().filter(F.col("c").isNotNull()).collect()
    ]
    assert vals == ["fresh"]
    # a SECOND store instance respects the tombstone too
    st2 = SnapshotStore(spark, st.path)
    assert "old-secret" not in {
        r["c"] for r in st2.read().select("c").collect()
    }
    # time travel to the pre-drop version still reads the old values
    assert "old-secret" in {
        r["c"] for r in st2.read(version=2).select("c").collect()
    }


def test_drop_column_guards(spark, tmp_path):
    st = _mk(spark, tmp_path)
    st.append(_df(spark, 0, 5))
    with pytest.raises(ValueError, match="enable_column_mapping"):
        st.drop_column("b")
    st.enable_column_mapping()
    st.add_constraint("bpos", "b >= 0")
    with pytest.raises(ValueError, match="constraint"):
        st.drop_column("b")
    st.drop_constraint("bpos")
    st.drop_column("b")
    with pytest.raises(ValueError, match="only column"):
        st.drop_column("a")


def test_constraint_reference_blocks_rename(spark, tmp_path):
    st = _mk(spark, tmp_path)
    st.append(_df(spark, 0, 5))
    st.enable_column_mapping()
    st.add_constraint("apos", "a >= 0")
    with pytest.raises(ValueError, match="constraint 'apos'"):
        st.rename_column("a", "alpha")
    # unrelated column renames fine; constraints still enforce after
    st.rename_column("b", "beta")
    with pytest.raises(Exception, match="apos"):
        st.append(
            spark.createDataFrame([(-1, 0)], "a long, beta long")
        )


def test_row_level_ops_and_change_feed_under_mapping(spark, tmp_path):
    st = _mk(spark, tmp_path)
    st.append(_df(spark, 0, 10))
    st.enable_column_mapping()
    st.rename_column("a", "alpha")
    # CoW delete
    v0 = st.latest_version()
    _, n = st.delete_where("alpha >= 8")
    assert n == 2
    chg = st.read_row_changes(v0)
    assert sorted(
        r["alpha"] for r in chg.filter("_change = -1").collect()
    ) == [8, 9]
    # DV delete
    v1 = st.latest_version()
    _, n = st.delete_where_dv("alpha = 0")
    assert n == 1
    assert st.count_rows() == 7
    assert st.read().filter("alpha = 0").count() == 0
    assert st.read_row_changes(v1).filter("_change = -1").count() == 1
    # merge (update + insert)
    src = spark.createDataFrame([(1, 111), (50, 100)], "alpha long, b long")
    res = st.merge_into(src, on=["alpha"])
    assert (res["version"], res["matched"], res["inserted"]) == (
        st.latest_version(), 1, 1,
    )
    assert st.read().filter("alpha = 1").collect()[0]["b"] == 111
    # compact materializes DVs; data unchanged
    st.compact(order_by=["alpha"])
    assert st.count_rows() == 8
    assert not st.manifest().get("dvs")
    assert sorted(r["alpha"] for r in st.read().collect()) == [
        1, 2, 3, 4, 5, 6, 7, 50,
    ]


def test_restore_reverts_mapping_with_the_schema(spark, tmp_path):
    st = _mk(spark, tmp_path)
    st.append(_df(spark, 0, 5))
    st.enable_column_mapping()
    st.rename_column("a", "alpha")
    st.drop_column("b")
    # restore to the pre-mapping version: mapping + tombstones clear
    st.restore(1)
    m = st.manifest()
    assert m.get("column_mapping") is None
    assert m.get("column_mapping_burned") is None
    assert st.read().columns == ["a", "b"]
    # restore forward to the post-rename version: its mapping returns
    st.restore(3)
    m = st.manifest()
    assert m["column_mapping"] == {"alpha": "a", "b": "b"}
    assert st.read().columns == ["alpha", "b"]


def test_checkpoint_roundtrip_carries_mapping(spark, tmp_path):
    for fmt in ("json", "parquet"):
        path = str(tmp_path / f"ck_{fmt}")
        st = SnapshotStore(
            spark, path, checkpoint_interval=2, checkpoint_format=fmt
        )
        st.append(spark.range(5).select(F.col("id").alias("x")))
        st.enable_column_mapping()  # v2 -> checkpoint
        st.rename_column("x", "y")
        st.append(
            spark.range(5, 8).select(F.col("id").alias("y"))
        )  # v4 -> checkpoint
        fresh = SnapshotStore(spark, path, checkpoint_interval=2)
        m = fresh.manifest()
        assert m["column_mapping"] == {"y": "x"}
        # head really came from the checkpoint, not a delta replay
        assert fresh.last_head_read["checkpoint"] == 4
        assert sorted(r["y"] for r in fresh.read().collect()) == list(
            range(8)
        )


def test_bucketed_zero_shuffle_survives_bucket_key_rename(spark, tmp_path):
    st = BucketedSnapshotStore(
        spark, str(tmp_path / "bkt"), bucket_col="k", n_buckets=4
    )
    st.append(
        spark.range(100).select(
            (F.col("id") % 10).alias("k"), F.col("id").alias("v")
        )
    )
    st.enable_column_mapping()
    st.rename_column("k", "key")
    assert st.bucket_col == "key"
    assert st.manifest()["bucket_spec"] == {"col": "key", "n": 4}
    # appends after the rename route through the same physical layout
    st.append(
        spark.range(100, 120).select(
            (F.col("id") % 10).alias("key"), F.col("id").alias("v")
        )
    )
    b = st.read_bucketed()
    assert b.columns == ["key", "v"]
    agg = b.groupBy("key").agg(F.sum("v").alias("s"))
    joined = agg.join(
        b.groupBy("key").agg(F.count("*").alias("c")), "key"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # alias-aware output partitioning: no shuffle on either side
    assert "Exchange hashpartitioning" not in plan, plan
    rows = {r["key"]: (r["s"], r["c"]) for r in joined.collect()}
    assert len(rows) == 10
    assert all(c == 12 for _s, c in rows.values())


def test_min_reader_protocol_floor(spark, tmp_path):
    """Enabling column mapping stamps min_reader=3 (a mapping-blind
    reader would silently project NULLs over physical-named files);
    a future protocol raises a LOUD refusal in this reader."""
    import json
    import os

    from ccxt_ohlcv_fetcher_spark.operators import snapshots as S

    st = _mk(spark, tmp_path)
    st.append(_df(spark, 0, 5))
    assert st.manifest().get("min_reader") is None
    st.enable_column_mapping()
    assert st.manifest()["min_reader"] == 3
    # the floor survives a restore that clears the mapping (physical
    # files/burned names remain on disk)
    st.rename_column("a", "alpha")
    st.restore(1)
    assert st.manifest()["min_reader"] == 3
    # a manifest demanding a FUTURE protocol refuses loudly
    head = st.latest_version()
    delta = {
        "format": 2, "version": head + 1, "parent": head,
        "operation": "metadata", "add": [], "remove": [],
        "min_reader": S.READER_VERSION + 1,
    }
    with open(st._manifest_path(head + 1), "w") as fh:
        json.dump(delta, fh)
    fresh = SnapshotStore(spark, st.path)
    with pytest.raises(RuntimeError, match="requires reader protocol"):
        fresh.read()
    os.remove(st._manifest_path(head + 1))


def test_timestamp_time_travel(spark, tmp_path):
    """version_at_timestamp / read(timestamp=): commit stamps are
    monotonic per log, pre-stamp manifests fall back to file mtime,
    and a too-early timestamp refuses."""
    st = _mk(spark, tmp_path)
    st.append(_df(spark, 0, 5))
    t1 = st.manifest(1)["ts"]
    st.append(_df(spark, 5, 8))
    t2 = st.manifest(2)["ts"]
    assert t2 > t1
    assert st.version_at_timestamp(t1) == 1
    assert st.version_at_timestamp((t1 + t2) / 2) == 1
    assert st.version_at_timestamp(t2) == 2
    assert st.version_at_timestamp(t2 + 3600) == 2
    assert st.read(timestamp=t1).count() == 5
    assert st.read(timestamp=t2 + 1).count() == 8
    with pytest.raises(ValueError, match="predates"):
        st.version_at_timestamp(t1 - 1)
    with pytest.raises(ValueError, match="not both"):
        st.read(version=1, timestamp=t1)
    # legacy manifests without the stamp: mtime fallback
    import json

    p = st._manifest_path(1)
    with open(p) as fh:
        m = json.load(fh)
    m.pop("ts")
    with open(p, "w") as fh:
        json.dump(m, fh)
    st._state_cache.clear()
    assert st.version_at_timestamp(t2 + 3600) == 2
    assert st.version_at_timestamp(t2) in (1, 2)  # mtime >= t2 is fine


def test_streaming_sink_into_mapped_table(spark, tmp_path):
    """streaming_snapshot_sink appends into a column-mapped + renamed
    table: batches arrive under the NEW logical names, land physical,
    and read back correctly (the sink goes through store.append, so
    mapping-awareness is inherited — this pins the composition)."""
    from ccxt_ohlcv_fetcher_spark.operators.snapshots import (
        streaming_snapshot_sink,
    )

    st = _mk(spark, tmp_path)
    st.append(_df(spark, 0, 5))
    st.enable_column_mapping()
    st.rename_column("a", "alpha")
    src_files = str(tmp_path / "files")
    spark.range(5, 9).select(
        F.col("id").alias("alpha"), (F.col("id") * 2).alias("b")
    ).coalesce(1).write.parquet(src_files)
    stream = spark.readStream.schema("alpha long, b long").parquet(
        src_files
    )
    q = streaming_snapshot_sink(
        stream, st, app_id="cmsink", checkpoint_dir=str(tmp_path / "ck")
    )
    q.awaitTermination(120)
    assert sorted(r["alpha"] for r in st.read().collect()) == list(range(9))
    # the landed files really are physical-named ('a')
    import pyarrow.parquet as pq

    newest = st.manifest()["files"][-1]
    cols = pq.ParquetFile(
        os.path.join(st.path, newest)
    ).schema_arrow.names
    assert "a" in cols and "alpha" not in cols


def test_rename_and_drop_resolve_names_case_insensitively(spark, tmp_path):
    """ADVICE r11: Spark column resolution is case-insensitive, so the
    duplicate check must be too — renaming to 'B' beside existing 'b'
    would commit two logical names that collide at resolution time.
    Case-ONLY renames of the same column stay legal, and lookups bind
    to the committed casing."""
    st = _mk(spark, tmp_path)
    st.append(_df(spark, 0, 5))
    st.enable_column_mapping()
    with pytest.raises(ValueError, match="already exists"):
        st.rename_column("a", "B")
    # case-only rename of the SAME column is a legitimate rename
    st.rename_column("a", "A")
    assert [n for n, _ in st.manifest()["schema"]] == ["A", "b"]
    assert sorted(r["A"] for r in st.read().collect()) == list(range(5))
    # old-name lookup binds case-insensitively to the committed casing
    st.rename_column("a", "alpha")
    assert [n for n, _ in st.manifest()["schema"]] == ["alpha", "b"]
    # drop lookup too
    st.drop_column("B")
    assert [n for n, _ in st.manifest()["schema"]] == ["alpha"]
