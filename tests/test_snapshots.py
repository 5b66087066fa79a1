"""Snapshot/manifest table format (operators/snapshots.py): atomic
append via exclusive-manifest-create CAS, snapshot-isolated reads, time
travel, conflict rebase, overwrite, and vacuum safety."""

from __future__ import annotations

import os

import pytest

from ccxt_ohlcv_fetcher_spark.operators.snapshots import (
    CommitConflict,
    SnapshotStore,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "v")


def test_append_read_time_travel(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "t"))
    assert store.latest_version() == 0
    v1 = store.append(_df(spark, 0, 10))
    v2 = store.append(_df(spark, 10, 15))
    assert (v1, v2) == (1, 2)
    assert store.read().count() == 15
    assert store.read(version=1).count() == 10  # time travel
    assert [h["operation"] for h in store.history()] == ["append", "append"]


def test_concurrent_appends_both_survive_via_rebase(spark, tmp_path):
    """Two writers staging from the same base version: the loser's
    exclusive create fails, it rebases onto the winner's manifest, and
    BOTH appends land — no lost update, no serialization lock."""
    store_a = SnapshotStore(spark, str(tmp_path / "t"))
    store_b = SnapshotStore(spark, str(tmp_path / "t"))
    store_a.append(_df(spark, 0, 5))

    # interleave: both stage, then commit in turn from the same base
    files_a = store_a._stage(_df(spark, 100, 110))
    files_b = store_b._stage(_df(spark, 200, 220))
    base = store_a.latest_version()
    assert store_a._try_commit(base, store_a.manifest(base)["files"] + files_a, "append")
    # b's first attempt at the same version must LOSE
    assert not store_b._try_commit(base, store_b.manifest(base)["files"] + files_b, "append")
    # rebase: read the new head, merge, retry (what append() automates)
    head = store_b.latest_version()
    assert store_b._try_commit(head, store_b.manifest(head)["files"] + files_b, "append")
    assert store_b.read().count() == 5 + 10 + 20


def test_uncommitted_stage_is_invisible_and_vacuumable(spark, tmp_path):
    """A crashed writer = staged files with no manifest: readers never
    see them, vacuum reclaims them."""
    store = SnapshotStore(spark, str(tmp_path / "t"))
    store.append(_df(spark, 0, 5))
    store._stage(_df(spark, 50, 99))  # staged, never committed ("crash")
    assert store.read().count() == 5
    deleted = store.vacuum()
    assert len(deleted) == 1
    assert store.read().count() == 5  # referenced files untouched


def test_overwrite_and_vacuum_retention(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "t"))
    store.append(_df(spark, 0, 10))
    store.overwrite(_df(spark, 0, 3))
    assert store.read().count() == 3
    assert store.read(version=1).count() == 10  # history intact pre-vacuum
    deleted = store.vacuum(retain_versions=1)
    assert len(deleted) == 1  # v1's commit dir reclaimed
    assert store.read().count() == 3
    with pytest.raises(Exception):
        store.read(version=1).count()  # time travel past retention breaks


def test_cas_exhaustion_raises(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "t"))
    store.append(_df(spark, 0, 2))

    class Rigged(SnapshotStore):
        def _try_commit(self, base, files, op):  # always lose
            return False

    rigged = Rigged(spark, str(tmp_path / "t"))
    with pytest.raises(CommitConflict):
        rigged.append(_df(spark, 2, 4), max_retries=2)


def test_relative_paths_table_is_movable(spark, tmp_path):
    import shutil

    store = SnapshotStore(spark, str(tmp_path / "t"))
    store.append(_df(spark, 0, 7))
    shutil.move(str(tmp_path / "t"), str(tmp_path / "moved"))
    moved = SnapshotStore(spark, str(tmp_path / "moved"))
    assert moved.read().count() == 7
