"""RESTORE TO VERSION (SnapshotStore.restore): metadata-only rollback
commit — re-references an old snapshot's files/schema/stats/DVs with
zero data I/O, refuses when vacuum already reclaimed the target."""

from __future__ import annotations

import pytest

from ccxt_ohlcv_fetcher_spark.operators.snapshots import SnapshotStore


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id as v")


def test_restore_rolls_back_and_keeps_forensics(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "t"), stats_cols=["v"])
    store.append(_df(spark, 0, 10))          # v1
    store.append(_df(spark, 10, 20))         # v2
    store.delete_where("v >= 5 AND v < 15")  # v3: the "bad" op
    assert store.read().count() == 10
    v4 = store.restore(2)
    assert v4 == 4
    got = sorted(r["v"] for r in store.read().collect())
    assert got == list(range(20))            # v2's content, exactly
    # forensics: the bad version is still readable until vacuumed
    assert store.read(version=3).count() == 10
    assert [h["operation"] for h in store.history()] == [
        "append", "append", "delete", "restore",
    ]
    # manifest stats were re-carried: pruning works on restored files
    assert 0 < len(store.pruned_files({"v": (0, 3)})) < len(
        store.manifest()["files"]
    )
    # a restore rewrites history: the row-level feed refuses to cross it
    with pytest.raises(ValueError, match="restore"):
        store.read_row_changes(1, 4)


def test_restore_preserves_deletion_vectors(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "t"))
    store.append(_df(spark, 0, 10))     # v1
    store.delete_where_dv("v = 3")      # v2 (DV on the v1 file)
    store.append(_df(spark, 50, 60))    # v3
    store.delete_where_dv("v = 55")     # v4
    store.restore(2)                    # back before the second append
    vals = {r["v"] for r in store.read().collect()}
    assert vals == set(range(10)) - {3}  # DV of v2 still applies
    assert store.manifest().get("dvs")


def test_restore_refuses_vacuumed_target(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "t"))
    store.append(_df(spark, 0, 5))   # v1
    store.overwrite(_df(spark, 5, 9))  # v2 (v1's files now unreferenced)
    store.vacuum(retain_versions=1, min_age_seconds=0)
    with pytest.raises(ValueError, match="vacuumed"):
        store.restore(1)
    # and restoring to an un-vacuumed version still works
    assert store.restore(2) == 3


def test_restore_reverts_schema_evolution(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "t"))
    store.append(_df(spark, 0, 5))  # v1: (v)
    store.append(
        spark.range(5, 8).selectExpr("id as v", "'x' as tag"),
        merge_schema=True,
    )  # v2: (v, tag)
    store.restore(1)
    assert store.manifest()["schema"] == [["v", "bigint"]]
    assert store.read().columns == ["v"]
    assert store.read().count() == 5


def test_restore_conflicts_with_concurrent_commit(spark, tmp_path):
    """A restore racing ANY commit must conflict loudly — a rebase
    would silently discard the racer's rows (the restore manifest
    references only the target's files)."""
    path = str(tmp_path / "t")
    store = SnapshotStore(spark, path)
    store.append(_df(spark, 0, 5))   # v1
    store.append(_df(spark, 5, 9))   # v2
    # simulate the race: another writer wins the next version first
    other = SnapshotStore(spark, path)
    files = other._stage(_df(spark, 100, 103))
    head = other.latest_version()
    base_seen = store.latest_version()
    assert other._try_commit(
        head, other.manifest(head)["files"] + files, "append"
    )
    # the restore computed against base_seen loses the CAS and refuses
    from ccxt_ohlcv_fetcher_spark.operators.snapshots import CommitConflict

    class StaleStore(SnapshotStore):
        def latest_version(self):
            return base_seen  # sees the pre-race head

    with pytest.raises(CommitConflict, match="changed concurrently"):
        StaleStore(spark, path).restore(1)
    # nothing lost: the racer's rows are still in the head read
    vals = {r["v"] for r in SnapshotStore(spark, path).read().collect()}
    assert vals == set(range(9)) | {100, 101, 102}
