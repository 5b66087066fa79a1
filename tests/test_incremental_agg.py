"""Incremental materialized aggregate (operators/incremental.py):
equivalence to full recompute after every refresh, delta-only reads,
compaction fallback, and exactly-once refresh semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.operators.incremental import IncrementalAggView
from ccxt_ohlcv_fetcher_spark.operators.snapshots import SnapshotStore


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 4).alias("k"),
        F.col("id").alias("v"),
        (F.col("id") * 2.0).alias("w"),
    )


AGGS = {
    "cnt": ("count", None),
    "sum_v": ("sum", "v"),
    "min_w": ("min", "w"),
    "max_w": ("max", "w"),
}


def _expected(df):
    return {
        r["k"]: (r["cnt"], r["sum_v"], r["min_w"], r["max_w"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("v").cast("long").alias("sum_v"),
            F.min("w").alias("min_w"),
            F.max("w").alias("max_w"),
        )
        .collect()
    }


def _got(view):
    return {
        r["k"]: (r["cnt"], r["sum_v"], r["min_w"], r["max_w"])
        for r in view.read().collect()
    }


def test_incremental_equals_full_recompute_each_refresh(spark, tmp_path):
    src = SnapshotStore(spark, str(tmp_path / "src"))
    view = IncrementalAggView(
        spark, src, str(tmp_path / "state"), keys=["k"], aggs=AGGS
    )
    hi = 0
    for step in (7, 13, 1, 20):
        src.append(_batch(spark, hi, hi + step))
        hi += step
        assert view.refresh() is not None
        assert _got(view) == _expected(src.read())
    # already current: no state commit
    v = view.state.latest_version()
    assert view.refresh() is None
    assert view.state.latest_version() == v


def test_refresh_reads_only_the_delta(spark, tmp_path):
    """The refresh plan scans the delta files, not the whole source:
    the parquet relation under the partial-agg subtree must reference
    only the files added since the last sync."""
    src = SnapshotStore(spark, str(tmp_path / "src"))
    src.append(_batch(spark, 0, 1000))
    view = IncrementalAggView(
        spark, src, str(tmp_path / "state"), keys=["k"], aggs=AGGS
    )
    view.refresh()
    base_files = set(src.manifest()["files"])
    src.append(_batch(spark, 1000, 1010))
    delta_files = set(src.manifest()["files"]) - base_files
    delta = src.read_changes(view.last_synced())
    scanned = {
        f
        for f in delta.inputFiles()
    }
    assert all(any(d in s for s in scanned) for d in delta_files)
    assert not any(b in s for b in base_files for s in scanned)
    view.refresh()
    assert _got(view) == _expected(src.read())


def test_compaction_falls_back_to_full_recompute(spark, tmp_path):
    src = SnapshotStore(spark, str(tmp_path / "src"))
    view = IncrementalAggView(
        spark, src, str(tmp_path / "state"), keys=["k"], aggs=AGGS
    )
    src.append(_batch(spark, 0, 50))
    view.refresh()
    src.append(_batch(spark, 50, 80))
    src.compact(target_partitions=1)  # rewrites history mid-range
    assert view.refresh() is not None
    assert _got(view) == _expected(src.read())
    # and incremental refresh resumes cleanly after the fallback
    src.append(_batch(spark, 80, 90))
    view.refresh()
    assert _got(view) == _expected(src.read())


def test_refresh_is_exactly_once_per_source_version(spark, tmp_path):
    """A crashed-and-retried refresh of the same source version is
    recognized from the state log's txn stamp and skipped — two racing
    refreshers cannot double-apply a delta."""
    src = SnapshotStore(spark, str(tmp_path / "src"))
    src.append(_batch(spark, 0, 10))
    view = IncrementalAggView(
        spark, src, str(tmp_path / "state"), keys=["k"], aggs=AGGS
    )
    other = IncrementalAggView(
        spark, src, str(tmp_path / "state"), keys=["k"], aggs=AGGS
    )
    assert view.refresh() is not None
    assert other.refresh() is None  # same source version: skipped
    assert _got(other) == _expected(src.read())


def test_hll_distinct_merges_incrementally(spark, tmp_path):
    """'hll' state column: delta-merged sketches cover the union of all
    appended rows — the estimate after three incremental refreshes
    tracks the true distinct count within HLL error (lgK=12 default:
    ~1.6% relative), including across refreshes that only REVISIT
    existing users (estimate must not inflate: register-wise max)."""
    src = SnapshotStore(spark, str(tmp_path / "src"))
    view = IncrementalAggView(
        spark,
        src,
        str(tmp_path / "state"),
        keys=["k"],
        aggs={"users": ("hll", "u"), "cnt": ("count", None)},
    )

    def users_batch(lo, hi):
        return spark.range(lo, hi).select(
            F.lit(0).alias("k"), (F.col("id") % 500).alias("u")
        )

    src.append(users_batch(0, 400))
    view.refresh()
    src.append(users_batch(400, 900))   # adds users 400..499, revisits
    view.refresh()
    src.append(users_batch(0, 300))     # pure revisit: no new users
    view.refresh()
    row = view.read().select(
        F.hll_sketch_estimate("users").alias("est"), "cnt"
    ).collect()[0]
    assert row["cnt"] == 1200
    assert abs(row["est"] - 500) / 500 < 0.05, row["est"]


def test_streaming_continuous_aggregate(spark, tmp_path):
    """Stream -> snapshot source (exactly-once sink) -> per-commit
    IncrementalAggView.refresh() via on_commit: the streaming
    continuous aggregate. State after the stream equals the one-shot
    groupBy over everything streamed; a redelivered batch leaves both
    the source AND the state unchanged."""
    from ccxt_ohlcv_fetcher_spark.operators.snapshots import (
        streaming_snapshot_sink,
    )

    src_files = str(tmp_path / "files")
    for i in range(3):  # three files -> multiple micro-batches possible
        spark.range(i * 100, (i + 1) * 100).select(
            (F.col("id") % 4).alias("k"),
            F.col("id").alias("v"),
            (F.col("id") * 2.0).alias("w"),
        ).coalesce(1).write.mode("append").parquet(src_files)
    source = SnapshotStore(spark, str(tmp_path / "src"))
    view = IncrementalAggView(
        spark, source, str(tmp_path / "state"), keys=["k"], aggs=AGGS
    )
    stream = spark.readStream.schema("k long, v long, w double").parquet(
        src_files
    )
    refreshed = []
    q = streaming_snapshot_sink(
        stream,
        source,
        app_id="ca-test",
        checkpoint_dir=str(tmp_path / "ck"),
        on_commit=lambda v: refreshed.append(view.refresh()),
    )
    q.awaitTermination(120)
    assert refreshed and all(r is not None for r in refreshed)
    assert _got(view) == _expected(source.read())
    assert source.read().count() == 300

    # redelivery: same app_id + batch_id -> no source commit, no
    # on_commit fire, state untouched
    sv, stv = source.latest_version(), view.state.latest_version()
    source.append(
        spark.range(0, 5).select(
            (F.col("id") % 4).alias("k"),
            F.col("id").alias("v"),
            (F.col("id") * 2.0).alias("w"),
        ),
        txn=("ca-test", source.last_txn("ca-test")),
    )
    assert view.refresh() is None
    assert (source.latest_version(), view.state.latest_version()) == (sv, stv)


def test_deletes_stay_incremental_for_count_sum(spark, tmp_path):
    """Row-level deletes retract through the signed feed: a count/sum
    view stays equal to the full recompute across interleaved appends
    and deletes, a fully-deleted key LEAVES the state, and the refresh
    over a delete range is genuinely incremental (state commits are
    'overwrite' driven by the feed, pinned via ops observed)."""
    src = SnapshotStore(spark, str(tmp_path / "src"))
    view = IncrementalAggView(
        spark,
        src,
        str(tmp_path / "state"),
        keys=["k"],
        aggs={"cnt": ("count", None), "sum_v": ("sum", "v")},
    )

    def exp():
        return {
            r["k"]: (r["cnt"], r["sum_v"])
            for r in src.read()
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).cast("long").alias("cnt"),
                F.sum("v").cast("long").alias("sum_v"),
            )
            .collect()
        }

    def got():
        return {
            r["k"]: (r["cnt"], r["sum_v"]) for r in view.read().collect()
        }

    src.append(_batch(spark, 0, 40))
    view.refresh()
    src.delete_where("v % 4 = 1 AND v < 20")  # partial retraction
    assert view.refresh() is not None
    assert got() == exp()
    src.append(_batch(spark, 40, 60))
    src.delete_where("v % 4 = 3")  # key 3 fully deleted
    assert view.refresh() is not None
    assert 3 not in got()
    assert got() == exp()
    # compact in the range: row-preserving, still incremental-eligible
    src.compact(target_partitions=1)
    src.append(_batch(spark, 60, 70))
    assert view.refresh() is not None
    assert got() == exp()


def test_deletes_fall_back_for_non_mergeable_aggs(spark, tmp_path):
    """min/max cannot retract incrementally: a range containing a
    delete falls back to full recompute and is still exact."""
    src = SnapshotStore(spark, str(tmp_path / "src"))
    view = IncrementalAggView(
        spark, src, str(tmp_path / "state"), keys=["k"], aggs=AGGS
    )
    src.append(_batch(spark, 0, 30))
    view.refresh()
    # delete the rows holding the current max of w for every key
    src.delete_where("v >= 26")
    assert view.refresh() is not None
    assert _got(view) == _expected(src.read())


def test_upserts_stay_incremental_for_count_sum(spark, tmp_path):
    """MERGE commits flow through the signed feed: count/sum views
    absorb update (-old +new) and insert (+new) deltas incrementally
    and match the full recompute."""
    src = SnapshotStore(spark, str(tmp_path / "src"))
    view = IncrementalAggView(
        spark,
        src,
        str(tmp_path / "state"),
        keys=["k"],
        aggs={"cnt": ("count", None), "sum_v": ("sum", "v")},
    )

    def exp():
        return {
            r["k"]: (r["cnt"], r["sum_v"])
            for r in src.read()
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).cast("long").alias("cnt"),
                F.sum("v").cast("long").alias("sum_v"),
            )
            .collect()
        }

    def got():
        return {r["k"]: (r["cnt"], r["sum_v"]) for r in view.read().collect()}

    src.append(_batch(spark, 0, 30))
    view.refresh()
    # source keyed on v (unique): update rows 5..9, insert 100..104
    merge_src = spark.range(5, 10).select(
        (F.col("id") % 4).alias("k"),
        F.col("id").alias("v"),
        (F.col("id") * 100.0).alias("w"),
    ).unionByName(
        spark.range(100, 105).select(
            (F.col("id") % 4).alias("k"),
            F.col("id").alias("v"),
            (F.col("id") * 2.0).alias("w"),
        )
    )
    r = src.merge_into(merge_src, on=["v"])
    assert r["matched"] == 5 and r["inserted"] == 5
    assert view.refresh() is not None
    assert got() == exp()


# --- join views (delta-join maintenance) ----------------------------------


def _dim(spark, keys_vals):
    return spark.createDataFrame(keys_vals, "k long, grp string")


def _fact(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 6).alias("k"),
        F.col("id").alias("fv"),
    )


def _join_expected(left, right):
    return {
        r["grp"]: (r["cnt"], r["sum_fv"])
        for r in left.join(right, "k")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("fv").cast("long").alias("sum_fv"),
        )
        .collect()
    }


def _join_got(view):
    return {
        r["grp"]: (r["cnt"], r["sum_fv"]) for r in view.read().collect()
    }


def test_join_view_tracks_appends_and_deletes_both_sides(spark, tmp_path):
    """Delta-join maintenance: appends and row-level deletes on EITHER
    side retract exactly; every refresh equals the one-shot join +
    groupBy over the current heads; fully-deleted groups leave the
    state."""
    from ccxt_ohlcv_fetcher_spark.operators.incremental import (
        IncrementalJoinAggView,
    )

    fact = SnapshotStore(spark, str(tmp_path / "fact"))
    dim = SnapshotStore(spark, str(tmp_path / "dim"))
    view = IncrementalJoinAggView(
        spark,
        fact,
        dim,
        str(tmp_path / "state"),
        on=["k"],
        keys=["grp"],
        aggs={"cnt": ("count", None), "sum_fv": ("sum", "fv")},
    )
    # nothing to join yet: one side empty -> no state
    fact.append(_fact(spark, 0, 10))
    assert view.refresh() is None

    dim.append(_dim(spark, [(0, "a"), (1, "a"), (2, "b")]))      # dim v1
    assert view.refresh() is not None                             # full build
    assert _join_got(view) == _join_expected(fact.read(), dim.read())

    # fact-side append: ΔA ⋈ B_old
    fact.append(_fact(spark, 10, 30))
    assert view.refresh() is not None
    assert _join_got(view) == _join_expected(fact.read(), dim.read())

    # dim-side append: A_old ⋈ ΔB (new group appears)
    dim.append(_dim(spark, [(3, "c"), (4, "c")]))
    assert view.refresh() is not None
    assert _join_got(view) == _join_expected(fact.read(), dim.read())

    # simultaneous deltas on both sides: all three delta-join terms
    fact.append(_fact(spark, 30, 41))
    dim.append(_dim(spark, [(5, "d")]))
    assert view.refresh() is not None
    assert _join_got(view) == _join_expected(fact.read(), dim.read())

    # fact-side delete retracts; dim-side delete expels whole groups
    fact.delete_where("fv % 3 = 0")
    assert view.refresh() is not None
    assert _join_got(view) == _join_expected(fact.read(), dim.read())
    dim.delete_where("grp = 'c'")
    assert view.refresh() is not None
    got = _join_got(view)
    assert got == _join_expected(fact.read(), dim.read())
    assert "c" not in got

    # idempotent: nothing new -> no commit; replay leaves state alone
    v_before = view.state.latest_version()
    assert view.refresh() is None
    assert view.state.latest_version() == v_before


def test_join_view_full_fallback_on_overwrite_and_key_pruning(
    spark, tmp_path
):
    """A history-rewriting overwrite on one source forces (and
    survives via) the full-recompute path; with join keys in
    stats_cols, the old-side read is manifest-pruned to the delta's
    key range."""
    from ccxt_ohlcv_fetcher_spark.operators.incremental import (
        IncrementalJoinAggView,
    )

    fact = SnapshotStore(spark, str(tmp_path / "fact"), stats_cols=["k"])
    dim = SnapshotStore(spark, str(tmp_path / "dim"))
    view = IncrementalJoinAggView(
        spark,
        fact,
        dim,
        str(tmp_path / "state"),
        on=["k"],
        keys=["grp"],
        aggs={"cnt": ("count", None), "sum_fv": ("sum", "fv")},
    )
    # disjoint-key fact files (single-partition commits -> one file each)
    for lo in (0, 100, 200):
        fact.append(
            spark.range(lo, lo + 10)
            .coalesce(1)
            .select(F.col("id").alias("k"), (F.col("id") * 10).alias("fv"))
        )
    dim.append(
        spark.createDataFrame(
            [(k, "g%d" % (k // 100)) for k in range(0, 300, 5)],
            "k long, grp string",
        )
    )
    assert view.refresh() is not None
    assert _join_got(view) == _join_expected(fact.read(), dim.read())

    # dim delta touching ONLY the 200-file's key range: the A_old scan
    # must prune to candidate files (provable via pruned_files)
    dim.append(_dim(spark, [(205, "g2x")]))
    pruned = fact.pruned_files({"k": (205, 205)})
    assert len(pruned) == 1  # the machinery the refresh path uses
    assert view.refresh() is not None
    assert _join_got(view) == _join_expected(fact.read(), dim.read())

    # overwrite rewrites history row-lessly -> full recompute fallback
    dim.overwrite(
        spark.createDataFrame([(5, "z"), (205, "z")], "k long, grp string")
    )
    assert view.refresh() is not None
    assert _join_got(view) == _join_expected(fact.read(), dim.read())


def test_streaming_fact_feeds_join_view(spark, tmp_path):
    """Stream -> snapshot fact source -> per-commit
    IncrementalJoinAggView.refresh(): the streaming continuous
    JOIN aggregate. Dim-side commits between micro-batches are picked
    up by the same refreshes; the final state equals the one-shot
    join + groupBy over both heads."""
    from ccxt_ohlcv_fetcher_spark.operators.incremental import (
        IncrementalJoinAggView,
    )
    from ccxt_ohlcv_fetcher_spark.operators.snapshots import (
        streaming_snapshot_sink,
    )

    src_files = str(tmp_path / "files")
    for i in range(3):
        spark.range(i * 60, (i + 1) * 60).select(
            (F.col("id") % 6).alias("k"), F.col("id").alias("fv")
        ).coalesce(1).write.mode("append").parquet(src_files)
    fact = SnapshotStore(spark, str(tmp_path / "fact"))
    dim = SnapshotStore(spark, str(tmp_path / "dim"))
    dim.append(_dim(spark, [(0, "a"), (1, "a"), (2, "b"), (3, "b")]))
    view = IncrementalJoinAggView(
        spark,
        fact,
        dim,
        str(tmp_path / "state"),
        on=["k"],
        keys=["grp"],
        aggs={"cnt": ("count", None), "sum_fv": ("sum", "fv")},
    )
    stream = spark.readStream.schema("k long, fv long").parquet(src_files)
    q = streaming_snapshot_sink(
        stream,
        fact,
        app_id="jv-test",
        checkpoint_dir=str(tmp_path / "ck"),
        on_commit=lambda v: view.refresh(),
    )
    q.awaitTermination(120)
    assert _join_got(view) == _join_expected(fact.read(), dim.read())
    # a dim commit after the stream drains is one more delta refresh
    dim.append(_dim(spark, [(4, "c")]))
    assert view.refresh() is not None
    assert _join_got(view) == _join_expected(fact.read(), dim.read())


def test_dv_deletes_retract_through_incremental_view(spark, tmp_path):
    """Merge-on-read deletes emit the SAME signed feed as copy-on-write
    ones, so the incremental view retracts identically — including a
    compact that materializes the vectors mid-stream."""
    src = SnapshotStore(spark, str(tmp_path / "src"))
    view = IncrementalAggView(
        spark,
        src,
        str(tmp_path / "state"),
        keys=["k"],
        aggs={"cnt": ("count", None), "sum_v": ("sum", "v")},
    )

    def exp():
        return {
            r["k"]: (r["cnt"], r["sum_v"])
            for r in src.read()
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).cast("long").alias("cnt"),
                F.sum("v").cast("long").alias("sum_v"),
            )
            .collect()
        }

    def got():
        return {
            r["k"]: (r["cnt"], r["sum_v"]) for r in view.read().collect()
        }

    src.append(_batch(spark, 0, 40))
    view.refresh()
    src.delete_where_dv("v % 4 = 1 AND v < 20")
    assert view.refresh() is not None
    assert got() == exp()
    src.append(_batch(spark, 40, 50))
    src.delete_where_dv("v % 4 = 3")  # key 3 fully deleted, via vectors
    assert view.refresh() is not None
    assert 3 not in got()
    assert got() == exp()
    # compact materializes the vectors; row-preserving for the feed
    src.compact(target_partitions=1)
    src.append(_batch(spark, 50, 60))
    assert view.refresh() is not None
    assert got() == exp()
