"""Incremental materialized aggregates over the snapshot log (the
continuous-aggregate tier, generalized past the candle rollups).

``MaterializedRollups`` (operators/rollup.py) maintains OHLCV rollups
by closed-bucket anti-join — right for time-bucketed candles. This
module maintains an ARBITRARY mergeable groupBy aggregate
(count / sum / min / max, avg derived) for any append-only
``SnapshotStore`` table, Delta/Timescale continuous-aggregate style:

- ``refresh()`` reads ONLY the rows changed since the last sync
  (``read_changes`` for append ranges; the SIGNED ``read_row_changes``
  feed when row-level deletes are involved — never a table rescan),
  partially aggregates them, merges with the current state, and
  commits the new state in ONE atomic overwrite stamped
  ``txn=(view_id, source_version)``. A crashed-and-retried refresh is
  recognized from the state log alone and skipped (exactly-once).
- Row-level DELETEs stay incremental when every agg is
  delete-mergeable (count/sum — negative partials retract exactly)
  and a count agg exists to expel fully-deleted keys; min/max/hll are
  NOT delete-mergeable (a retracted extremum needs the remaining
  values), so ranges containing deletes fall back for them.
- A history-rewriting commit on the source (overwrite; compact when
  the signed path doesn't apply) breaks the diff contract; refresh
  detects it and falls back to a FULL recompute — still one atomic
  commit, still txn-stamped.

At 100 TB the state table is |groups| rows and each refresh touches
|delta| source rows + |groups| state rows — ingest-proportional, not
history-proportional. The mergeability requirement is the same one
that makes these aggregates partial-aggregatable inside Spark itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.operators.snapshots import SnapshotStore

# agg name -> (partial expr builder, merge expr builder)
_MERGEABLE = {
    "count": (
        lambda col: F.count(F.lit(1)),
        lambda name: F.sum(name),
    ),
    "sum": (
        lambda col: F.sum(col),
        lambda name: F.sum(name),
    ),
    "min": (
        lambda col: F.min(col),
        lambda name: F.min(name),
    ),
    "max": (
        lambda col: F.max(col),
        lambda name: F.max(name),
    ),
    # incremental DISTINCT counting: the state column is a Datasketches
    # HLL sketch (binary); merging is register-wise max, so delta-merged
    # state covers exactly the union of the inputs. Read the estimate
    # with F.hll_sketch_estimate(col). (An exact distinct is NOT
    # mergeable without keeping the full value set — this is the
    # standard continuous-aggregate answer.)
    "hll": (
        lambda col: F.hll_sketch_agg(col),
        lambda name: F.hll_union_agg(name),
    ),
}


class IncrementalAggView:
    """A materialized ``groupBy(keys).agg(...)`` maintained from a
    source ``SnapshotStore``'s change feed.

    ``aggs``: {output_col: (fn, input_col)} with fn in count / sum /
    min / max (input_col ignored for count). An optional third tuple
    element pins the output type (e.g. ``("sum", "v", "decimal(38,6)")``
    — REQUIRED for decimal sums, where Spark's sum widens precision and
    the state schema would otherwise drift between the first partial
    and later merges). Floating-point sums are rejected implicitly by
    the house rules: sum a decimal-cast column instead, or the merged
    result depends on merge order and can never hash-match an oracle.
    State lives in its own SnapshotStore at ``path``; the last synced
    source version is the txn batch id of ``view_id`` in the state log
    (no sidecar files).
    """

    def __init__(
        self,
        spark: SparkSession,
        source: SnapshotStore,
        path: str,
        keys: list[str],
        aggs: dict[str, tuple[str, str | None]],
        view_id: str = "incremental_agg",
    ) -> None:
        self.aggs: dict[str, tuple[str, str | None, str | None]] = {}
        for name, spec in aggs.items():
            fn, col, out = (*spec, None) if len(spec) == 2 else spec
            if fn not in _MERGEABLE:
                raise ValueError(f"{name}: {fn!r} is not mergeable")
            self.aggs[name] = (fn, col, out)
        self.spark = spark
        self.source = source
        self.state = SnapshotStore(spark, path)
        self.keys = list(keys)
        self.view_id = view_id

    # --- internals --------------------------------------------------------

    @staticmethod
    def _typed(fn: str, out: str | None, col):
        # counts/sums pinned to bigint (or the caller's type) so the
        # merge is exact and the state schema is stable across
        # partial/merged generations; min/max keep the input type
        if out is not None:
            return col.cast(out)
        return col.cast("long") if fn in ("count", "sum") else col

    def _partial(self, rows: DataFrame) -> DataFrame:
        exprs = [
            self._typed(fn, out, _MERGEABLE[fn][0](col)).alias(name)
            for name, (fn, col, out) in self.aggs.items()
        ]
        return rows.groupBy(*self.keys).agg(*exprs)

    def _merge(self, state: DataFrame, partial: DataFrame) -> DataFrame:
        exprs = [
            self._typed(fn, out, _MERGEABLE[fn][1](name)).alias(name)
            for name, (fn, _, out) in self.aggs.items()
        ]
        return state.unionByName(partial).groupBy(*self.keys).agg(*exprs)

    def last_synced(self) -> int:
        return self.state.last_txn(self.view_id) or 0

    # --- API --------------------------------------------------------------

    def _signed_partial(self, changes: DataFrame) -> DataFrame:
        """Partial aggregate of a SIGNED row-change feed (+1 inserts,
        -1 deletes): count folds the sign, sum folds value*sign. Only
        valid for the delete-mergeable aggs (count/sum)."""
        exprs = []
        for name, (fn, col, out) in self.aggs.items():
            if fn == "count":
                e = F.sum("_change")
            else:  # sum
                e = F.sum(F.col(col) * F.col("_change"))
            exprs.append(self._typed(fn, out, e).alias(name))
        return changes.groupBy(*self.keys).agg(*exprs)

    def _count_col(self) -> str | None:
        for name, (fn, _, _) in self.aggs.items():
            if fn == "count":
                return name
        return None

    def refresh(self) -> int | None:
        """Bring the state up to the source head. Returns the new state
        version, or None when already current (or another refresher
        won the race to this source version).

        Strategy by what happened in (last, head]:
        - appends only -> file-delta path (all agg fns);
        - appends + row-level DELETEs (+ row-preserving compactions)
          AND every agg is delete-mergeable (count/sum) AND a count
          agg exists (it identifies fully-deleted keys to drop) ->
          SIGNED feed path: negative partials retract, then keys whose
          count reaches zero leave the state — matching a fresh
          groupBy exactly;
        - anything else (overwrite, min/max/hll with deletes, pruned
          log) -> full recompute. Every path ends in the same atomic
          txn-stamped state overwrite.
        """
        head = self.source.latest_version()
        last = self.last_synced()
        if head <= last:
            return None
        try:
            ops = {
                self.source.manifest(v)["operation"]
                for v in range(last + 1, head + 1)
            }
        except FileNotFoundError:  # log pruned under us
            ops = {"?"}
        cnt = self._count_col()
        merged = None
        if ops == {"append"}:
            try:
                delta = self.source.read_changes(last, head)
                if last > 0:
                    merged = self._merge(self.state.read(), self._partial(delta))
                else:
                    merged = self._partial(delta)
            except ValueError:  # empty change set
                merged = None
        elif (
            ops <= {"append", "delete", "merge", "compact"}
            and cnt is not None
            and all(fn in ("count", "sum") for fn, _, _ in self.aggs.values())
        ):
            changes = self.source.read_row_changes(last, head)
            partial = self._signed_partial(changes)
            merged = (
                self._merge(self.state.read(), partial) if last > 0 else partial
            )
            merged = merged.filter(F.col(cnt) > 0)
        if merged is None:
            merged = self._partial(self.source.read(version=head))
        return self.state.overwrite(merged, txn=(self.view_id, head))

    def read(self) -> DataFrame:
        return self.state.read()


class IncrementalJoinAggView:
    """A materialized ``(A JOIN B ON keys).groupBy(keys_g).agg(...)``
    maintained incrementally from TWO snapshot-logged sources — the
    delta-join rule (DBSP/Materialize's bilinearity of join):

        Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    with every term's rows signed by the product of the input signs,
    so appends AND row-level deletes on EITHER side retract exactly.
    Aggregates are restricted to the retractable pair (count / sum,
    same rule as the single-source signed path), and a count agg must
    exist to expel fully-deleted groups.

    Scale shape: each refresh joins |ΔA| against the old B (and
    symmetrically), NEVER A_old ⋈ B_old — and when the join keys are in
    a source's ``stats_cols``, the old-side scan reads only files whose
    manifest min/max intersect the delta's key bounds (the same
    pushdown ``merge_into`` uses), so the touched fraction of a 100 TB
    table tracks the delta's key locality, not table size. History
    rewrites (overwrite / pruned log) fall back to one full recompute;
    every path commits the state in ONE atomic overwrite stamped with
    BOTH source watermarks (multi-txn), so a crashed-and-retried
    refresh is recognized and skipped.

    Non-key column names must be disjoint between the two sources
    (standard join-view hygiene; raises otherwise).
    """

    def __init__(
        self,
        spark: SparkSession,
        left: SnapshotStore,
        right: SnapshotStore,
        path: str,
        on: list[str],
        keys: list[str],
        aggs: dict[str, tuple],
        view_id: str = "incremental_join_agg",
    ) -> None:
        self.aggs: dict[str, tuple[str, str | None, str | None]] = {}
        for name, spec in aggs.items():
            fn, col, out = (*spec, None) if len(spec) == 2 else spec
            if fn not in ("count", "sum"):
                raise ValueError(
                    f"{name}: {fn!r} is not retractable — join views "
                    "support count/sum only"
                )
            self.aggs[name] = (fn, col, out)
        if not any(fn == "count" for fn, _, _ in self.aggs.values()):
            raise ValueError("join views need a count agg to expel "
                             "fully-deleted groups")
        self.spark = spark
        self.left = left
        self.right = right
        self.state = SnapshotStore(spark, path)
        self.on = list(on)
        self.keys = list(keys)
        self.view_id = view_id

    # --- internals ----------------------------------------------------------

    def _last(self, side: str) -> int:
        return self.state.last_txn(f"{self.view_id}:{side}") or 0

    def _signed_partial(self, rows: DataFrame) -> DataFrame:
        exprs = []
        for name, (fn, col, out) in self.aggs.items():
            e = (
                F.sum("_sign")
                if fn == "count"
                else F.sum(F.col(col) * F.col("_sign"))
            )
            exprs.append(IncrementalAggView._typed(fn, out, e).alias(name))
        return rows.groupBy(*self.keys).agg(*exprs)

    def _merge(self, state: DataFrame, partial: DataFrame) -> DataFrame:
        exprs = [
            IncrementalAggView._typed(fn, out, F.sum(name)).alias(name)
            for name, (fn, _, out) in self.aggs.items()
        ]
        return state.unionByName(partial).groupBy(*self.keys).agg(*exprs)

    def _old_side_pruned(
        self, store: SnapshotStore, version: int, delta_keys: DataFrame
    ) -> DataFrame | None:
        """The old snapshot of one source, manifest-stats-pruned to
        files that can contain the OTHER side's changed join keys.
        None = provably empty (version 0, or disjoint key bounds)."""
        if version == 0:
            return None
        m = store.manifest(version)
        files = m["files"]
        prune_cols = [c for c in self.on if c in store.stats_cols]
        if files and prune_cols:
            aggs = []
            for c in prune_cols:
                aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
            b = delta_keys.agg(*aggs).collect()[0]
            if b[f"lo_{prune_cols[0]}"] is None:
                return None  # empty delta
            files = store.pruned_files(
                {c: (b[f"lo_{c}"], b[f"hi_{c}"]) for c in prune_cols},
                version=version,
            )
        if not files:
            return None
        return store._read_files_live(files, m)

    # --- API ------------------------------------------------------------------

    def refresh(self) -> int | None:
        """Bring the state up to both source heads; returns the new
        state version or None when already current."""
        hl, hr = self.left.latest_version(), self.right.latest_version()
        ll, lr = self._last("left"), self._last("right")
        if hl <= ll and hr <= lr:
            return None
        if hl == 0 or hr == 0:
            return None  # inner join with a never-written side is empty
        dup = set(self.left.read(version=hl).columns) & set(
            self.right.read(version=hr).columns
        ) - set(self.on)
        if dup:
            raise ValueError(f"non-key columns overlap across sources: {dup}")

        def _row_ops(store: SnapshotStore, lo: int, hi: int) -> bool:
            try:
                return all(
                    store.manifest(v)["operation"]
                    in ("append", "delete", "merge", "compact")
                    for v in range(lo + 1, hi + 1)
                )
            except FileNotFoundError:  # log pruned under us
                return False

        incremental = (
            (ll > 0 or lr > 0)
            and _row_ops(self.left, ll, hl)
            and _row_ops(self.right, lr, hr)
        )
        if incremental:
            dA = (
                self.left.read_row_changes(ll, hl).withColumnRenamed(
                    "_change", "_ca"
                )
                if hl > ll
                else None
            )
            dB = (
                self.right.read_row_changes(lr, hr).withColumnRenamed(
                    "_change", "_cb"
                )
                if hr > lr
                else None
            )
            terms = []
            if dA is not None:
                B0 = self._old_side_pruned(self.right, lr, dA.select(*self.on))
                if B0 is not None:
                    terms.append(
                        dA.join(B0, self.on).withColumn(
                            "_sign", F.col("_ca")
                        )
                    )
            if dB is not None:
                A0 = self._old_side_pruned(self.left, ll, dB.select(*self.on))
                if A0 is not None:
                    terms.append(
                        A0.join(dB, self.on).withColumn(
                            "_sign", F.col("_cb")
                        )
                    )
            if dA is not None and dB is not None:
                terms.append(
                    dA.join(dB, self.on).withColumn(
                        "_sign", F.col("_ca") * F.col("_cb")
                    )
                )
            cnt = next(
                name for name, (fn, _, _) in self.aggs.items() if fn == "count"
            )
            if terms:
                delta = terms[0]
                for t in terms[1:]:
                    delta = delta.unionByName(t, allowMissingColumns=True)
                partial = self._signed_partial(delta)
                merged = (
                    self._merge(self.state.read(), partial)
                    if (ll > 0 or lr > 0)
                    else partial
                ).filter(F.col(cnt) > 0)
            else:
                merged = self.state.read()
        else:
            joined = self.left.read(version=hl).join(
                self.right.read(version=hr), self.on
            ).withColumn("_sign", F.lit(1))
            merged = self._signed_partial(joined)
        return self.state.overwrite(
            merged,
            txn=[
                (f"{self.view_id}:left", hl),
                (f"{self.view_id}:right", hr),
            ],
        )

    def read(self) -> DataFrame:
        return self.state.read()
