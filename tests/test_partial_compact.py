"""Bin-packing partial compaction (SnapshotStore.compact_partial):
rewrite only the small files, carry big ones by reference, rebase over
concurrent appends, materialize only the touched files' deletion
vectors — the maintenance shape a 100 TB table can actually afford
(the full compact() rewrites the whole snapshot)."""

from __future__ import annotations

import os

import pytest

from ccxt_ohlcv_fetcher_spark.operators.snapshots import (
    CommitConflict,
    SnapshotStore,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id as v", "id % 7 as tag")


@pytest.fixture()
def fragmented(spark, tmp_path):
    """One big commit + 6 single-row trickle appends — the small-file
    problem in miniature."""
    store = SnapshotStore(spark, str(tmp_path / "t"), stats_cols=["v"])
    store.append(_df(spark, 0, 20_000).coalesce(1))  # the "big" file
    for i in range(6):
        store.append(_df(spark, 100_000 + i, 100_001 + i))
    return store


def test_partial_compact_touches_only_small_files(spark, fragmented):
    store = fragmented
    m = store.manifest()
    sizes = {f: m["stats"][f]["_bytes"] for f in m["files"]}
    big = max(sizes, key=sizes.get)
    threshold = sizes[big]  # strictly below the big file
    n_before = len(m["files"])
    rows_before = sorted(r["v"] for r in store.read().collect())

    v = store.compact_partial(small_file_bytes=threshold)
    assert v == store.latest_version()
    m2 = store.manifest()
    # the big file survived BY REFERENCE (same path), small ones merged
    assert big in m2["files"]
    assert len(m2["files"]) < n_before
    assert sorted(r["v"] for r in store.read().collect()) == rows_before
    # manifest sizes exist for the rewritten files too (stage-time)
    for f in m2["files"]:
        assert m2["stats"][f]["_bytes"] > 0
    # idempotent-ish: a second run with nothing small enough is a no-op
    assert store.compact_partial(small_file_bytes=1) is None
    assert store.latest_version() == v


def test_partial_compact_rebases_over_concurrent_append(spark, tmp_path):
    path = str(tmp_path / "t")
    store = SnapshotStore(spark, path, stats_cols=["v"])
    for i in range(4):
        store.append(_df(spark, 10 * i, 10 * i + 10))

    class RacingStore(SnapshotStore):
        def _stage(self, df, allow_schema_change=False):
            staged = super()._stage(df, allow_schema_change)
            if not getattr(self, "_raced", False):
                self._raced = True
                SnapshotStore(spark, path, stats_cols=["v"]).append(
                    _df(spark, 900, 905)
                )
            return staged

    racer = RacingStore(spark, path, stats_cols=["v"])
    v = racer.compact_partial(small_file_bytes=10**9)
    assert v is not None
    got = sorted(r["v"] for r in SnapshotStore(spark, path).read().collect())
    assert got == sorted(list(range(40)) + list(range(900, 905)))
    # the racing append's file carried over by reference
    m = SnapshotStore(spark, path).manifest()
    assert len(m["files"]) >= 2


def test_partial_compact_conflicts_with_rewrites(spark, tmp_path):
    path = str(tmp_path / "t")
    store = SnapshotStore(spark, path, stats_cols=["v"])
    for i in range(3):
        store.append(_df(spark, 10 * i, 10 * i + 10))

    class DeletingStore(SnapshotStore):
        def _stage(self, df, allow_schema_change=False):
            staged = super()._stage(df, allow_schema_change)
            if not getattr(self, "_raced", False):
                self._raced = True
                SnapshotStore(spark, path, stats_cols=["v"]).delete_where(
                    "v = 5"
                )
            return staged

    racer = DeletingStore(spark, path, stats_cols=["v"])
    with pytest.raises(CommitConflict, match="compact_partial"):
        racer.compact_partial(small_file_bytes=10**9)
    # the aborted rewrite left the table untouched
    assert SnapshotStore(spark, path).read().count() == 29


def test_partial_compact_materializes_touched_dvs_only(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "t"), stats_cols=["v"])
    store.append(_df(spark, 0, 10).coalesce(1))      # small file A
    store.append(_df(spark, 100, 50_000).coalesce(1))  # big file B
    store.delete_where_dv("v = 3")      # DV on A
    store.delete_where_dv("v = 200")    # DV on B
    assert len(store.manifest().get("dvs", {})) == 2
    sizes = {
        f: store.manifest()["stats"][f]["_bytes"]
        for f in store.manifest()["files"]
    }
    threshold = max(sizes.values())  # only A qualifies
    v = store.compact_partial(small_file_bytes=threshold, min_files=1)
    assert v is not None
    m = store.manifest()
    # A's vector materialized with the rewrite; B keeps its vector
    assert len(m.get("dvs", {})) == 1
    vals = {r["v"] for r in store.read().collect()}
    assert 3 not in vals and 200 not in vals
    assert 4 in vals and 201 in vals


def test_partial_compact_is_row_preserving_for_the_change_feed(
    spark, tmp_path
):
    store = SnapshotStore(spark, str(tmp_path / "t"))
    store.append(_df(spark, 0, 5))
    store.append(_df(spark, 5, 8))
    v = store.compact_partial(small_file_bytes=10**9)
    assert v is not None
    feed = store.read_row_changes(0, v)
    assert feed.filter("_change = 1").count() == 8
    assert feed.filter("_change = -1").count() == 0


def test_partial_compact_order_by_clusters_outputs(spark, tmp_path):
    """order_by gives the rewritten bins disjoint key ranges, so their
    fresh manifest stats prune range probes (scoped OPTIMIZE+sort)."""
    store = SnapshotStore(spark, str(tmp_path / "t"), stats_cols=["v"])
    for i in range(6):  # interleaved keys across tiny commits
        store.append(
            spark.range(6).selectExpr(f"id * 6 + {i} as v", "id as tag")
        )
    v = store.compact_partial(
        small_file_bytes=10**9,
        target_file_bytes=1,  # force several output bins
        order_by=["v"],
    )
    assert v is not None
    m = store.manifest()
    ranges = sorted(tuple(m["stats"][f]["v"]) for f in m["files"])
    assert len(ranges) >= 2
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, ranges  # disjoint: range pruning works
    probe = store.pruned_files({"v": (0, 3)})
    assert len(probe) < len(m["files"])
    assert store.read().count() == 36


def test_restore_of_recorded_in_history(spark, tmp_path):
    """restore commits carry their target version in the manifest so
    history explains WHAT the rollback restored."""
    store = SnapshotStore(spark, str(tmp_path / "t"))
    store.append(_df(spark, 0, 5))
    store.append(_df(spark, 5, 9))
    store.restore(1)
    assert store.manifest()["restore_of"] == 1
