"""Deduplication operators (north star; SURVEY.md §2.11, E33/E34).

Five dedup families, all shuffle-economical at 100 TB:

- **exact** (E33): group by content hash, keep a deterministic
  representative (min id). One shuffle on a 60-bit key.
- **n-gram Jaccard** (exact near-dup): shingle inverted index ->
  self-join on shingle -> per-pair common counts -> Jaccard filter.
  Candidate generation touches only pairs sharing >=1 shingle (sparse),
  never the N^2 cross product.
- **MinHash** (E34): k independent md5-salted min-hashes per doc; docs
  agreeing on a (banded) signature slice are near-dup candidates.
  Signature computation is one explode + groupBy (map-side combine).
- **LSH banding** on the MinHash signature: band hash -> bucket join;
  probability of a pair sharing a band = 1-(1-s^r)^b.
- **SimHash**: 16-bit sign-aggregated word-hash sketch; near-dups have
  small Hamming distance (here: equal sketch, the scale-friendly form).

Everything is md5-based (functions/hashing.py) so each op is verifiable
against a DuckDB oracle — no engine-private hash in the result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ccxt_ohlcv_fetcher_spark.functions.hashing import (
    affine_hash,
    affine_params,
    md5_long,
)
from ccxt_ohlcv_fetcher_spark.operators.text import word_ngrams, words


def exact_dedup(
    df: DataFrame, content_col: str, id_col: str, keep: str = "min"
) -> DataFrame:
    """E33: keep one deterministic representative per distinct content.

    ``sha2/md5`` hash-groupBy rather than ``dropDuplicates([content])``:
    grouping on a 60-bit hash shuffles 8 bytes per row instead of the
    full document body.
    """
    h = md5_long(content_col)
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    winners = (
        df.withColumn("_h", h)
        .groupBy("_h")
        .agg(agg.alias(id_col))
        .select(id_col)
    )
    return df.join(winners, on=id_col, how="left_semi")


def shingle_sets(
    df: DataFrame, content_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """(id, shingle_hash) pairs, distinct per doc — the inverted-index
    input for Jaccard and MinHash."""
    return (
        df.select(
            F.col(id_col),
            F.explode(word_ngrams(words(F.col(content_col)), n)).alias("_sh"),
        )
        .select(id_col, md5_long("_sh").alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
    metric: str = "jaccard",
    shingles: DataFrame | None = None,
    containment_threshold: float | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard >= t).

    ``metric="containment"`` scores ``common / min(|A|, |B|)`` instead
    — the asymmetric-duplicate measure: a short doc wholly embedded in
    a long one has low Jaccard (the union is dominated by the long
    side) but containment 1.0. Same index, same join, same cost; only
    the final scalar differs. Standard practice runs BOTH: Jaccard for
    mirror dups, containment for quote/subset dups.

    ``metric="both"`` emits BOTH score columns from ONE inverted-index
    self-join, keeping a pair when ``jaccard >= threshold`` OR
    ``containment >= containment_threshold`` — the standard two-metric
    dedup pass at half the cost of running the metrics as separate
    queries (the shingle self-join, the expensive stage, is shared; at
    100 TB it is the difference between one shuffle of the pair list
    and two).

    Cost model: |pairs sharing a shingle| << N^2 for natural text; the
    heavy hitter is a skewed shingle (boilerplate). ``max_doc_freq``
    drops shingles appearing in more than that many documents *from the
    representation* (sizes and intersections alike — the metric becomes
    Jaccard over informative shingles, the stopword treatment). A
    boilerplate shingle in d docs otherwise contributes d^2/2 join
    pairs; the cap bounds per-shingle fan-out at max_doc_freq^2/2
    regardless of corpus size — the knob that keeps the inverted-index
    self-join linear-ish at 100 TB.

    ``shingles``: a pre-built ``shingle_sets(df, content_col, id_col,
    n)`` frame (e.g. a session-memoized checkpoint shared across the
    dedup family) — must match those arguments; the cap filter still
    applies on top.
    """
    sh = (
        shingles
        if shingles is not None
        else shingle_sets(df, content_col, id_col, n)
    )
    if max_doc_freq is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_doc_freq)
            .select("shingle")
        )
        # the capped table feeds THREE consumers (sizes + both join
        # sides); without the pin each re-runs the DF groupBy + the
        # semi-join (r12, guide §2.4)
        sh = sh.join(keep, "shingle", "left_semi").localCheckpoint(
            eager=False
        )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("_n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("_n").alias("n_b"))
    if containment_threshold is not None and metric != "both":
        # silently ignoring it would filter at the WRONG cutoff — the
        # single-metric forms take their cutoff via `threshold`
        raise ValueError(
            f"containment_threshold only applies to metric='both' "
            f"(got metric={metric!r}; single-metric forms use "
            "threshold=)"
        )
    jac = F.col("common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("common")
    )
    cont = F.col("common").cast("double") / F.least(
        F.col("n_a"), F.col("n_b")
    )
    joined = common.join(na, "id_a").join(nb, "id_b")
    if metric == "containment":
        return (
            joined.withColumn("containment", cont)
            .filter(F.col("containment") >= threshold)
            .select("id_a", "id_b", "common", "n_a", "n_b", "containment")
        )
    if metric == "jaccard":
        return (
            joined.withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "common", "n_a", "n_b", "jaccard")
        )
    if metric == "both":
        ct = (
            threshold
            if containment_threshold is None
            else containment_threshold
        )
        return (
            joined.withColumn("jaccard", jac)
            .withColumn("containment", cont)
            .filter(
                (F.col("jaccard") >= threshold)
                | (F.col("containment") >= ct)
            )
            .select(
                "id_a", "id_b", "common", "n_a", "n_b",
                "jaccard", "containment",
            )
        )
    raise ValueError(f"unknown metric {metric!r}")


def ngram_contamination_pairs(
    train: DataFrame,
    test: DataFrame,
    content_col: str,
    id_col: str,
    n: int = 13,
    broadcast_test: bool = True,
    train_shingles: DataFrame | None = None,
    test_shingles: DataFrame | None = None,
) -> DataFrame:
    """Train/test decontamination (north-star LLM-pipeline op): find
    training documents that contain n-grams from evaluation documents —
    the standard leakage check run before any model training (13-gram
    overlap is the common published choice; the fixture queries use
    n=3 so the synthetic corpus actually collides).

    Output: (test_id, train_id, n_shared, n_test, overlap_frac) where
    ``n_shared`` counts distinct shared shingles and ``overlap_frac`` =
    n_shared / |test doc's shingles| — 1.0 means the test doc is wholly
    contained (up to n-gram set equality) in the training doc.

    Scale posture: eval sets are small next to a 100 TB training corpus,
    so the test-side shingle index broadcasts (``broadcast_test=True``)
    and the training corpus is scanned ONCE with a map-side hash join —
    no shuffle of the train side at all. For giant test sets, flip to a
    shuffle join on the 60-bit shingle hash (8 bytes/row). Either way
    cost is |train shingles| + |collisions|, never |train| x |test|.

    ``train_shingles`` / ``test_shingles``: pre-built ``shingle_sets``
    frames for the two slices (e.g. filters of a session-memoized
    checkpoint) — must match ``(content_col, id_col, n)``; passing them
    skips re-tokenizing each slice per execution (r12).
    """
    tr = (
        train_shingles
        if train_shingles is not None
        else shingle_sets(train, content_col, id_col, n)
    ).withColumnRenamed(id_col, "train_id")
    te = (
        test_shingles
        if test_shingles is not None
        else shingle_sets(test, content_col, id_col, n)
    ).withColumnRenamed(id_col, "test_id")
    te_sizes = te.groupBy("test_id").agg(F.count(F.lit(1)).alias("n_test"))
    te_side = F.broadcast(te) if broadcast_test else te
    pairs = (
        tr.join(te_side, "shingle")
        .groupBy("test_id", "train_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sizes_side = F.broadcast(te_sizes) if broadcast_test else te_sizes
    return pairs.join(sizes_side, "test_id").select(
        "test_id",
        "train_id",
        "n_shared",
        "n_test",
        (F.col("n_shared").cast("double") / F.col("n_test")).alias("overlap_frac"),
    )


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    content_col: str,
    id_col: str,
    n: int = 13,
    min_overlap_frac: float = 0.0,
    min_shared: int = 1,
) -> DataFrame:
    """Drop training docs flagged by :func:`ngram_contamination_pairs`
    (>= ``min_shared`` shared n-grams AND >= ``min_overlap_frac`` of the
    test doc covered). One anti-join on the train id — the flagged-id
    set is small (it's bounded by |collisions|), so it broadcasts."""
    flagged = (
        ngram_contamination_pairs(train, test, content_col, id_col, n)
        .filter(
            (F.col("n_shared") >= min_shared)
            & (F.col("overlap_frac") >= min_overlap_frac)
        )
        .select(F.col("train_id").alias(id_col))
        .distinct()
    )
    return train.join(F.broadcast(flagged), id_col, "left_anti")


def minhash_signatures(
    df: DataFrame,
    content_col: str,
    id_col: str,
    k: int = 16,
    n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """E34: k-wide MinHash signature per doc (columns mh_0..mh_{k-1}).

    One explode + one groupBy with k min() aggregates — partial
    aggregation makes the shuffle k*8 bytes per doc regardless of doc
    size. The k hash functions are affine permutations of the ONE md5
    shingle hash (Carter-Wegman family, functions/hashing.py): k integer
    mul/add/mod per row instead of k salted md5s — ~2x wall-time on the
    signature stage, same collision theory, still bit-reproducible in
    the DuckDB oracle. ``shingles``: optional pre-built shingle frame
    (same contract as ngram_jaccard_pairs).
    """
    sh = (
        shingles
        if shingles is not None
        else shingle_sets(df, content_col, id_col, n)
    )
    aggs = [
        F.min(affine_hash("shingle", a, b)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(affine_params(k))
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_band_buckets(
    signatures: DataFrame, id_col: str, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: (band_id, bucket_hash, id) — docs sharing a bucket are
    candidates. bucket = md5 of the band's signature slice.

    One ``posexplode`` over an array of per-band bucket hashes (not a
    ``bands``-way union: each union branch would re-execute the whole
    upstream signature pipeline — ``bands``x the shingle+minhash work).
    """
    band_hashes = F.array(
        *[
            md5_long(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"mh_{b * rows_per_band + r}").cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )
    return signatures.select(
        F.col(id_col), F.posexplode(band_hashes).alias("band", "bucket")
    ).select("band", "bucket", id_col)


def minhash_candidate_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    k: int = 16,
    n: int = 3,
    bands: int = 4,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """E34 end-to-end: near-dup candidate pairs via MinHash + LSH banding
    (distinct id_a < id_b sharing >=1 band bucket)."""
    if k % bands != 0:
        raise ValueError(
            f"k={k} must be divisible by bands={bands}: rows_per_band = k/bands "
            "determines the LSH collision probability, and a remainder would "
            "silently drop trailing signature components"
        )
    sigs = minhash_signatures(
        df, content_col, id_col, k=k, n=n, shingles=shingles
    )
    buckets = minhash_band_buckets(sigs, id_col, bands=bands, rows_per_band=k // bands)
    # group-then-pair instead of a bucket self-join: the self-join would
    # re-execute the signature pipeline for each side; collect_list runs
    # it once and pairs within a bucket (bucket sizes are bounded by the
    # LSH design — a giant bucket means the banding is mis-parameterized
    # and would blow up a self-join identically).
    ids = F.array_sort(F.collect_list(id_col))
    pairs = (
        buckets.groupBy("band", "bucket")
        .agg(ids.alias("_ids"))
        .filter(F.size("_ids") > 1)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("_ids"),
                        lambda x, i: F.transform(
                            F.slice(
                                F.col("_ids"), i + 2, F.size(F.col("_ids"))
                            ),
                            lambda y: F.struct(
                                x.alias("id_a"), y.alias("id_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
    )
    return pairs.select(F.col("p.id_a"), F.col("p.id_b")).distinct()


SIMHASH_BITS = 16  # oracle-expressible width; production would use 64


def simhash(tokens: Column) -> Column:
    """16-bit SimHash over word hashes: bit j of the sketch is the sign
    of sum_w (+1 if bit j of md5_long(w) else -1).

    Single-pass formulation: ONE ``aggregate`` whose accumulator is a
    struct of 16 vote counters, so each token is md5-hashed exactly once
    (the naive 16-aggregate form re-hashes every token per bit — 16x the
    md5 work; HOF subtrees defeat Spark's common-subexpression
    elimination). Values are identical to the per-bit form.
    """
    hashes = F.transform(tokens, lambda w: md5_long(w))

    def _step(acc: Column, h: Column) -> Column:
        return F.struct(
            *[
                (
                    acc[f"c{j}"]
                    + F.when(
                        F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
                    ).otherwise(-1)
                ).alias(f"c{j}")
                for j in range(SIMHASH_BITS)
            ]
        )

    init = F.struct(
        *[F.lit(0).cast("bigint").alias(f"c{j}") for j in range(SIMHASH_BITS)]
    )
    votes = F.aggregate(hashes, init, _step)
    out = F.when(votes["c0"] > 0, F.lit(1)).otherwise(F.lit(0))
    for j in range(1, SIMHASH_BITS):
        out = out + F.when(votes[f"c{j}"] > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out.cast("bigint")


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    pointer_jumping: bool = False,
) -> DataFrame:
    """Connected components by min-label propagation — the step that
    turns near-dup PAIRS (Jaccard / MinHash / embedding threshold) into
    dedup GROUPS: every document labeled with the smallest id reachable
    through any chain of near-dup edges, so "keep one per component" is
    a single filter (id = component).

    Algorithm: labels start as each node's own id; each round every node
    takes the min of its label and its neighbors' labels; stop when a
    round changes nothing. Rounds needed = component diameter — small
    for dedup clusters (near-clique blobs), so this converges in a few
    rounds where a 100 TB web graph would want large-star/small-star
    (Kiveris et al.) to cut diameters first; the round body here IS the
    large-star primitive (min over neighborhood), so that upgrade slots
    in without changing the dataflow.

    ``pointer_jumping=True`` adds the other published accelerator: after
    each propagation, labels are resolved one hop through themselves
    (label <- label[label], the path-halving step of pointer-jumping /
    Shiloach-Vishkin). Label chains then collapse geometrically, so a
    path of length L converges in O(log L) rounds instead of O(L) — the
    variant to use when components may be long and thin (link chains,
    time-adjacent near-dups) rather than near-cliques. Cost: one extra
    self-join on the (small) label table per round.

    Scale notes: each round is one shuffle (explode edges both ways,
    groupBy node, min) plus a broadcast-back join; lineage is cut per
    round with localCheckpoint (iterative DataFrames otherwise stack
    plans); convergence check is a 1-row aggregate, the only driver
    value per round. Deterministic: min is order-insensitive.
    """
    und = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).union(
        edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d"))
    )
    labels = _cc_labels(und, max_iter, pointer_jumping)
    # no broadcast hint: the label table is |docs in any dup pair| —
    # usually tiny (stats/AQE will broadcast it), but unbounded in
    # principle, so the choice stays with the optimizer
    return nodes.select(F.col(id_col).alias("_n")).join(
        labels.withColumnRenamed("_n", "_ln"),
        F.col("_n") == F.col("_ln"),
        "left",
    ).select(
        F.col("_n").alias(id_col),
        F.coalesce(F.col("comp"), F.col("_n")).alias("comp"),
    )


def _cc_labels(
    und: DataFrame, max_iter: int, pointer_jumping: bool
) -> DataFrame:
    """Converged min-label table over an UNDIRECTED edge list
    (columns ``_s``, ``_d``; both directions present) — the iteration
    core of :func:`connected_components`, exposed separately so
    callers whose node set is exactly the edge-touching set
    (:func:`incremental_components`' contracted graph) skip the
    isolated-node join-back. Returns ``(_n, comp)`` for every node
    appearing in ``und``."""
    # materialize ONCE: the edge list is often an expensive upstream
    # pipeline (a Jaccard/MinHash candidate join) and every round
    # joins it twice — without the checkpoint each round re-executes
    # that pipeline (measured 5.4 s -> 2.9 s on dup_doc_components
    # at sf0.1; PERFORMANCE.md §7)
    und = und.localCheckpoint(eager=True)
    from ccxt_ohlcv_fetcher_spark.operators.graph import loop_conf

    # cheap count over the checkpoint's materialized blocks; sizes the
    # label loop's shuffles to the edge set (no-op at scale). AQE stays
    # ON here — measured neutral-to-better for the CC label loop
    # (0.86 s vs 0.93 s without, incremental_components sf0.1).
    n_edges = und.count()
    with loop_conf(und.sparkSession, n_edges, aqe_off=False):
        return _cc_labels_loop(und, max_iter, pointer_jumping)


def _cc_labels_loop(
    und: DataFrame, max_iter: int, pointer_jumping: bool
) -> DataFrame:
    # propagation only ever changes labels of nodes that touch an edge;
    # isolated nodes are their own component and join back at the end.
    # For a near-dup graph that shrinks the iterated table from |corpus|
    # to |docs in any dup pair| — orders of magnitude at clean corpora.
    # Round 1 folds into initialization (r12): with labels starting as
    # plain ids, the first propagation's output is exactly
    # min(own id, min neighbor id) — computable by the SAME groupBy
    # shuffle the old distinct() paid, skipping one full
    # join/checkpoint/convergence round per CC invocation.
    labels = (
        und.groupBy(F.col("_s").alias("_n"))
        .agg(F.min("_d").alias("_m"))
        .select("_n", F.least(F.col("_m"), F.col("_n")).alias("comp"))
    )
    changed = 0
    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, und["_d"] == labels["_n"])
            .groupBy("_s")
            .agg(F.min("comp").alias("_nc"))
        )
        new_labels = labels.join(
            neighbor_min, labels["_n"] == neighbor_min["_s"], "left"
        ).select(
            "_n",
            F.least(F.col("comp"), F.coalesce(F.col("_nc"), F.col("comp"))).alias(
                "comp"
            ),
            (F.col("_nc") < F.col("comp")).alias("_changed"),
        )
        if pointer_jumping:
            # path halving: comp <- comp[comp] (a node pointing at a
            # non-root label jumps to its label's label). comp ids ARE
            # node ids, so the hop is a self-join on the label table.
            hop = new_labels.select(
                F.col("_n").alias("_hn"), F.col("comp").alias("_hc")
            )
            new_labels = new_labels.join(
                hop, new_labels["comp"] == hop["_hn"], "left"
            ).select(
                "_n",
                F.coalesce(F.col("_hc"), F.col("comp")).alias("comp"),
                (F.col("_changed") | (F.col("_hc") < F.col("comp"))).alias(
                    "_changed"
                ),
            )
        # lazy checkpoint: the convergence aggregate right below is the
        # round's first action, so it materializes the checkpoint in
        # the SAME job — one scheduled job per round instead of two
        # (eager-materialize + count). r12 alternating A/B on
        # incremental_components at sf0.1: 3.73 -> 3.59 s best-of-3;
        # a 2-rounds-per-sync variant measured WORSE (4.26 s — the
        # extra idempotent propagation round costs more than the sync
        # it saves) and was rejected.
        new_labels = new_labels.localCheckpoint(eager=False)
        changed = new_labels.agg(
            F.sum(F.when(F.col("_changed"), 1).otherwise(0)).alias("c")
        ).collect()[0]["c"]
        labels = new_labels.drop("_changed")
        if not changed:
            break
    else:
        if changed:
            # exhausting max_iter with labels still moving means the
            # returned components are PARTIAL (possible for long chains
            # without pointer_jumping) — callers must not treat them as
            # a converged closure
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds "
                f"({changed} labels still changing); raise max_iter or use "
                "pointer_jumping=True for long chain-shaped components"
            )
    return labels


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the web-graph-scale variant: O(log^2 n) rounds on ANY
    graph shape, vs diameter-many rounds for plain min-label
    propagation (`connected_components`), with each round touching only
    the current edge set.

    - large-star: every node u connects its LARGER neighbors to
      m = min(neighborhood(u) + u) — long tails collapse toward small ids
      without ever growing the edge count;
    - small-star: u connects its smaller-or-equal neighbors (and
      itself) to m — stars re-root onto the minimum.

    Fixpoint: the edge set stops changing; it is then a star forest
    (child -> component-min root), which IS the label table. Each phase
    is one groupBy(min) + one join — two shuffles/round; the edge list
    is deduplicated and localCheckpoint'ed per round to cut lineage.

    Same contract as :func:`connected_components` (labels joined back
    onto ``nodes``; isolated nodes label themselves); raises on
    non-convergence rather than returning a partial closure.
    """
    e = (
        edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
        .filter(F.col("_u") != F.col("_v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def star(cur: DataFrame, large: bool) -> DataFrame:
        adj = cur.union(
            cur.select(F.col("_v").alias("_u"), F.col("_u").alias("_v"))
        )
        mins = adj.groupBy("_u").agg(
            F.least(F.min("_v"), F.first("_u")).alias("_m")
        )
        joined = adj.join(mins, "_u")
        if large:
            out = joined.filter(F.col("_v") > F.col("_u")).select(
                F.col("_v").alias("_u"), F.col("_m").alias("_v")
            )
        else:
            out = joined.filter(F.col("_v") <= F.col("_u")).select(
                F.col("_v").alias("_u"), F.col("_m").alias("_v")
            ).union(mins.select(F.col("_u"), F.col("_m").alias("_v")))
        return (
            out.filter(F.col("_u") != F.col("_v"))
            .distinct()
            .localCheckpoint(eager=True)
        )

    def signature(cur: DataFrame):
        # order-insensitive multiset fingerprint: one cheap aggregate
        row = cur.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.hash("_u", "_v").cast("long")).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    sig = signature(e)
    for _ in range(max_iter):
        prev = e
        e = star(star(e, large=True), large=False)
        new_sig = signature(e)
        # the (count, hash-sum) signature is a cheap PRE-check; a
        # hash-sum collision across rounds would end the loop early
        # with wrong labels, so confirm the fixpoint exactly: equal
        # counts (from the signature) + empty set difference — both
        # sides are .distinct(), so that proves set equality
        if new_sig == sig and e.exceptAll(prev).isEmpty():
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds — raise max_iter"
        )
    # converged: e is (child, root) with root = component minimum
    labels = e.select(F.col("_u").alias("_ln"), F.col("_v").alias("comp"))
    return nodes.select(F.col(id_col).alias("_n")).join(
        labels, F.col("_n") == F.col("_ln"), "left"
    ).select(
        F.col("_n").alias(id_col),
        F.coalesce(F.col("comp"), F.col("_n")).alias("comp"),
    )


def blocked_levenshtein_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    block_cols: list[str],
    prefix_len: int = 40,
    max_dist: int = 20,
) -> DataFrame:
    """Edit-distance near-dup pairs via blocking — the sixth dedup
    family (exact / Jaccard / MinHash / LSH / SimHash / **edit
    distance**). Classic record-linkage shape: a cheap equality block
    key bounds the candidate set, then ``levenshtein`` (JVM built-in,
    codegen'd) verifies each in-block pair on a fixed-length prefix.

    Cost model: |block|^2 pairs per block — the block key IS the knob.
    At 100 TB the key must bound block size by construction (add a
    length band, a shingle-prefix bucket, or use MinHash-LSH as the
    candidate generator and keep levenshtein purely as the verifier);
    prefix_len bounds per-pair cost at O(prefix_len^2) independent of
    document length. The self-join shuffles each side once on the block
    key; id_a < id_b halves the square and drops self-pairs.
    """
    pre = F.substring(F.col(content_col), 1, prefix_len)
    base = df.select(
        *block_cols, F.col(id_col).alias("_id"), pre.alias("_pre")
    )
    a = base.select(
        *block_cols, F.col("_id").alias("id_a"), F.col("_pre").alias("pre_a")
    )
    b = base.select(
        *block_cols, F.col("_id").alias("id_b"), F.col("_pre").alias("pre_b")
    )
    return (
        a.join(b, on=block_cols)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("lev", F.levenshtein("pre_a", "pre_b"))
        .filter(F.col("lev") <= max_dist)
        .select("id_a", "id_b", "lev")
    )


def boilerplate_stats(
    df: DataFrame,
    content_col: str,
    id_col: str,
    n: int = 3,
    df_permille: int = 10,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """C4-style boilerplate detection: shingles whose document frequency
    is >= ``df_permille``/1000 of the corpus are "boilerplate" (nav
    bars, license headers, cookie banners — text shared verbatim across
    many documents); each document is scored by the fraction of its
    distinct shingles that are boilerplate.

    Output: (id, n_shingles, n_boiler, boiler_ratio) — the ratio is the
    standard drop/scrub signal (C4 removes boilerplate *lines*; over
    word-soup fixtures the shingle granularity is the analog).

    Scale shape: document frequency is one groupBy over the shingle
    inverted index (map-side combine: the partial count per shingle is
    tiny); the boilerplate vocabulary (df above a corpus-relative
    threshold) is by construction small — at most 1000/df_permille
    distinct shingles can each cover >= that corpus fraction times the
    mean doc size, so the membership join broadcasts. The threshold is
    corpus-RELATIVE (df * 1000 >= N * df_permille, exact integer
    compare): the same query text scales from the 500-doc fixture to a
    100 TB corpus without retuning an absolute count. ``shingles``:
    optional pre-built shingle frame (same contract as
    ngram_jaccard_pairs).
    """
    sh = (
        shingles
        if shingles is not None
        else shingle_sets(df, content_col, id_col, n)
    )
    n_docs = df.select(id_col).count()
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    boiler = dfreq.filter(F.col("_df") * 1000 >= F.lit(n_docs * df_permille)).select(
        "shingle"
    )
    flagged = sh.join(
        F.broadcast(boiler).withColumn("_is_b", F.lit(1)), "shingle", "left"
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_is_b"), F.lit(0))).alias("n_boiler"),
        )
        .withColumn(
            "boiler_ratio",
            F.col("n_boiler") * F.lit(1.0) / F.col("n_shingles"),
        )
    )


def duplicate_span_stats(
    df: DataFrame,
    content_col: str,
    id_col: str,
    span_len: int = 40,
    stride: int = 20,
) -> DataFrame:
    """Repeated-substring detection (Lee et al., "Deduplicating Training
    Data Makes Language Models Better", 2022): find fixed-length
    character spans that recur VERBATIM across documents and score each
    document by the fraction of its spans that are so duplicated — the
    signal behind substring-level (as opposed to whole-document) dedup.

    The paper builds a corpus-wide suffix array; the Spark-native
    equivalent is a strided span inverted index: every document emits
    its ``span_len``-char substrings at ``stride`` offsets, spans are
    hashed to 60-bit keys (functions/hashing.py, so the DuckDB oracle
    reproduces every value), and one groupBy counts the distinct
    documents per span. A span seen in >= 2 documents is "duplicated";
    the per-document duplicated fraction is the scrub/drop signal.
    With stride <= span_len/2 any repeated region of length
    >= span_len + stride is guaranteed to contain at least one aligned
    strided span in both copies ONLY when copies start at compatible
    offsets; strided sampling trades the suffix array's exactness for
    a 1/stride-size index, the standard scale compromise.

    Documents shorter than ``span_len`` emit no spans and are excluded
    (no denominator). Within-document repeats do not count as
    duplication (dup = distinct-doc count >= 2); span counts are over
    DISTINCT spans per document.

    Output: (id, n_spans, n_dup_spans, dup_frac), dup_frac double.

    Scale shape: the exploded index is the only fan-out (len/stride
    rows per doc — ~2x the corpus in bytes at the defaults, hashed to
    8-byte keys before the shuffle); the document-frequency groupBy has
    map-side combine; the dup-span set joins back on the same hashed
    key. No all-pairs stage anywhere, so the shape survives 100 TB —
    unlike pairwise Jaccard, output size is linear in corpus size.
    """
    text = F.col(content_col)
    positions = F.when(
        F.length(text) >= span_len,
        F.sequence(
            F.lit(1), F.length(text) - F.lit(span_len - 1), F.lit(stride)
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<INT>)"))
    spans = df.select(
        F.col(id_col),
        F.explode(positions).alias("_pos"),
        text.alias("_text"),
    ).select(
        id_col,
        md5_long(F.col("_text").substr(F.col("_pos"), F.lit(span_len))).alias(
            "span_h"
        ),
    ).distinct().localCheckpoint(eager=False)
    # ^ feeds the dup-span DF filter AND the flag join probe side — pin
    # so the explode+hash+distinct runs once per execution (r12, §2.4);
    # linear in corpus size (8-byte hashed keys), never a pair fan-out
    dup = (
        spans.groupBy("span_h")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= 2)
        .select("span_h", F.lit(1).alias("_dup"))
    )
    flagged = spans.join(dup, "span_h", "left")
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.coalesce(F.col("_dup"), F.lit(0))).alias("n_dup_spans"),
        )
        .withColumn(
            "dup_frac", F.col("n_dup_spans") * F.lit(1.0) / F.col("n_spans")
        )
    )


def semantic_dedup(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    threshold: float = 0.88,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    keep: str = "first",
) -> DataFrame:
    """SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023, the
    8th signal of the dedup family): cluster the embedding space with
    k-means, then compare pairs ONLY within a cluster — the candidate
    bound that makes embedding near-dup tractable at corpus scale
    (pairs cost ~N^2/k instead of N^2; at 100 TB, k scales with the
    corpus so cluster populations stay bounded, and the within-cluster
    join is an EQUI join on the cluster id — shuffle-partitioned by
    cluster, never a broadcast of the corpus).

    Removal rule: a vector is a duplicate iff a HIGHER-PRIORITY
    cluster-mate has cosine >= ``threshold`` with it, where priority is
    a deterministic total order chosen by ``keep``:

    - ``"first"`` (default): priority = lower id — the
      first-occurrence-wins convention shared with the MinHash/SimHash
      tiers here;
    - ``"farthest"``: priority = larger squared distance to the
      assigned centroid (ties to the lower id) — SemDeDup's own keep
      rule (survive the most diverse example of each semantic
      neighborhood).

    Output one row per vector: (id, cluster, is_kept, dup_of = its
    highest-priority dominating neighbor or NULL, max_sim = its
    highest dominating-neighbor cosine or NULL).

    Boundary caveat (documented, inherent to SemDeDup): a pair
    straddling two clusters is never compared — recall vs the exact
    all-pairs tier is bounded by clustering quality, which is why the
    pinned test plants duplicate groups TIGHTER than the cluster
    radius.
    """
    from ccxt_ohlcv_fetcher_spark.functions.arrays import (
        dot_product,
        l2_norm,
    )
    from ccxt_ohlcv_fetcher_spark.operators.clustering import (
        _assign,
        kmeans_centroids,
    )

    if keep not in ("first", "farthest"):
        raise ValueError(f"keep must be 'first' or 'farthest', got {keep!r}")
    if centroids is None:
        centroids = kmeans_centroids(
            emb, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col
        )
    if keep == "farthest":
        # SemDeDup's own keep rule: survive = the member FARTHEST from
        # its centroid (most diverse example); priority = squared
        # distance to the assigned centroid, ties to the lower id
        d2_all = F.transform(
            F.lit(centroids),
            lambda c: F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    c,
                    lambda x, y: (x.cast("double") - y)
                    * (x.cast("double") - y),
                ),
                F.lit(0.0),
                lambda acc, d: acc + d,
            ),
        )
        pr = d2_all[_assign(vec_col, centroids)]
    else:
        pr = F.lit(0.0)  # constant priority -> ties -> lower id wins
    # cluster assignment rides the SAME projection as norm/priority —
    # a previous revision computed it in a separate frame and joined
    # back on id, which cost a full id-keyed shuffle for columns the
    # scan can produce side by side (the matrix-literal _assign is
    # row-local)
    v = emb.select(
        id_col,
        F.col(vec_col),
        l2_norm(vec_col).alias("_n"),
        pr.alias("_pr"),
        _assign(vec_col, centroids).alias("cluster"),
        # feeds both self-join sides (and the final per-vector output) —
        # pin so the norm + k-means assignment run once (r12, §2.4)
    ).localCheckpoint(eager=False)
    a = v.select(
        F.col("cluster"),
        F.col(id_col).alias("_id_a"),
        F.col(vec_col).alias("_va"),
        F.col("_n").alias("_na"),
        F.col("_pr").alias("_pr_a"),
    )
    b = v.select(
        F.col("cluster"),
        F.col(id_col).alias("_id_b"),
        F.col(vec_col).alias("_vb"),
        F.col("_n").alias("_nb"),
        F.col("_pr").alias("_pr_b"),
    )
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("_id_a") < F.col("_id_b"))
        .select(
            "_id_a",
            "_id_b",
            "_pr_a",
            "_pr_b",
            (
                dot_product("_va", "_vb") / (F.col("_na") * F.col("_nb"))
            ).alias("_sim"),
        )
        .filter(F.col("_sim") >= threshold)
    )
    # priority is a TOTAL order ((pr desc, id asc) with distinct ids),
    # so exactly one side of every similar pair dominates the other
    a_wins = (F.col("_pr_a") > F.col("_pr_b")) | (
        (F.col("_pr_a") == F.col("_pr_b"))
        & (F.col("_id_a") < F.col("_id_b"))
    )
    dominated = pairs.select(
        F.when(a_wins, F.col("_id_b")).otherwise(F.col("_id_a")).alias("_loser"),
        F.when(a_wins, F.col("_id_a")).otherwise(F.col("_id_b")).alias("_winner"),
        F.when(a_wins, F.col("_pr_a")).otherwise(F.col("_pr_b")).alias("_wpr"),
        "_sim",
    )
    # dup_of = the HIGHEST-priority dominating neighbor (ties -> lower
    # id): max over struct(priority, -id) then unwrap the id
    best = dominated.groupBy("_loser").agg(
        F.max(
            F.struct(
                F.col("_wpr").alias("p"),
                (-F.col("_winner")).alias("nid"),
                F.col("_winner").alias("id"),
            )
        )["id"].alias("dup_of"),
        F.max("_sim").alias("max_sim"),
    )
    return (
        v.select(id_col, "cluster")
        .join(best, v[id_col] == best["_loser"], "left")
        .select(
            id_col,
            "cluster",
            F.col("dup_of").isNull().alias("is_kept"),
            "dup_of",
            "max_sim",
        )
    )


# --- incremental MinHash-LSH dedup index (snapshot-logged) -----------------
#
# The continuous-crawl dedup workflow: a 100 TB corpus cannot be
# re-shingled every time a new batch arrives, so the corpus side of the
# LSH join is PRECOMPUTED ONCE and persisted — per-doc band-bucket rows
# on the snapshot log (operators/snapshots.py: atomic commits, time
# travel, exactly-once txn batches). Deduping a new batch then costs
# one signature pass over the NEW text only plus an equi-join against
# the stored buckets; appending the batch's own rows keeps the index
# current for the next batch. Signatures are the Carter-Wegman affine
# family over the md5 shingle hash (functions/hashing.py) — fully
# deterministic, so append == rebuild bit-for-bit and a DuckDB oracle
# can recompute the candidates exactly. Mirrors the logged ANN index
# (operators/similarity_index.py) for the text-dedup family; the
# reference's incremental-resume spirit (ccxt-ohlcv-fetch.py:86-91)
# applied to dedup state.


def _minhash_index_store(spark, path: str):
    from ccxt_ohlcv_fetcher_spark.operators.snapshots import SnapshotStore

    # band rides the manifest stats: a file holding only bands 0-1 is
    # skipped by a probe of band 3 without any I/O (bucket values are
    # uniform hashes — band is the only prunable axis)
    return SnapshotStore(spark, path, stats_cols=["band"])


def _band_bucket_rows(
    docs: DataFrame,
    content_col: str,
    id_col: str,
    k: int,
    n: int,
    bands: int,
    shingles: DataFrame | None = None,
) -> DataFrame:
    if k % bands != 0:
        raise ValueError(
            f"k={k} must be divisible by bands={bands} (rows_per_band "
            "= k/bands sets the LSH collision probability)"
        )
    sigs = minhash_signatures(
        docs, content_col, id_col, k=k, n=n, shingles=shingles
    )
    rows = minhash_band_buckets(
        sigs, id_col, bands=bands, rows_per_band=k // bands
    )
    # cluster by band so per-file manifest stats make band probes
    # log-only prunable; sort gives tight per-file bucket ranges too
    return rows.repartitionByRange(bands, "band", "bucket").sortWithinPartitions(
        "band", "bucket"
    )


def build_minhash_index_logged(
    docs: DataFrame,
    path: str,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    n: int = 3,
    bands: int = 4,
    txn: tuple[str, int] | None = None,
    shingles: DataFrame | None = None,
) -> int:
    """(Re)build the logged dedup index from scratch: one atomic
    overwrite commit holding every doc's (band, bucket, id) rows.
    Returns the committed version (None when ``txn`` says this batch
    already committed — exactly-once rebuilds). ``shingles``: optional
    pre-built shingle frame for the SAME docs (the session-memo
    pattern; must match content_col/id_col/n)."""
    store = _minhash_index_store(docs.sparkSession, path)
    return store.overwrite(
        _band_bucket_rows(
            docs, content_col, id_col, k, n, bands, shingles=shingles
        ),
        txn=txn,
    )


def append_minhash_index_logged(
    new_docs: DataFrame,
    path: str,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    n: int = 3,
    bands: int = 4,
    txn: tuple[str, int] | None = None,
    shingles: DataFrame | None = None,
) -> int:
    """Add a new batch's bucket rows in one atomic append — no existing
    file is read or rewritten, and the affine hash family guarantees
    the appended rows equal what a from-scratch rebuild would produce.
    ``txn=(app_id, batch_id)`` makes re-delivered batches commit
    exactly once (the streaming-crawl contract)."""
    store = _minhash_index_store(new_docs.sparkSession, path)
    return store.append(
        _band_bucket_rows(
            new_docs, content_col, id_col, k, n, bands, shingles=shingles
        ),
        txn=txn,
    )


def dedup_candidates_against_index(
    new_docs: DataFrame,
    path: str,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    n: int = 3,
    bands: int = 4,
    version: int | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Near-dup candidate pairs of a NEW batch: (id_a < id_b) sharing
    at least one LSH band bucket, where at least one side is new —
    new-vs-corpus pairs from an equi-join on (band, bucket) against
    the stored index, new-vs-new pairs from the same join against the
    batch's own rows. The corpus text is never re-read: its signature
    work was paid once at index time. ``version=`` pins a historical
    index snapshot (dedup against the corpus as-of a publication).

    Cost shape at 100 TB: one shingle+signature pass over the new
    batch (shuffle = k*8 bytes/doc), one shuffle join keyed on
    (band, bucket) whose corpus side is bands rows/doc of 20 bytes —
    NOT the corpus text; bucket fan-out is bounded by the banding
    design exactly as in minhash_candidate_pairs."""
    spark = new_docs.sparkSession
    store = _minhash_index_store(spark, path)
    new_rows = _band_bucket_rows(
        new_docs, content_col, id_col, k, n, bands, shingles=shingles
    ).localCheckpoint()
    corpus = store.read(version=version)
    both = corpus.unionByName(new_rows)
    a = new_rows.select(
        "band", "bucket", F.col(id_col).alias("_id_a")
    )
    b = both.select("band", "bucket", F.col(id_col).alias("_id_b"))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("_id_a") != F.col("_id_b"))
        .select(
            F.least("_id_a", "_id_b").alias("id_a"),
            F.greatest("_id_a", "_id_b").alias("id_b"),
        )
        .distinct()
    )


def incremental_components(
    prev: DataFrame,
    new_edges: DataFrame,
    new_nodes: DataFrame | None = None,
    id_col: str = "id",
    component_col: str = "comp",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    pointer_jumping: bool = True,
) -> DataFrame:
    """Incrementally maintain dedup components as batches arrive —
    the closure stage of the continuous-crawl pipeline
    (``dedup_candidates_against_index`` produces the batch's candidate
    edges; this folds them into the standing assignment without
    recomputing over the full pair history).

    Soundness (contraction form, r12): each old component is a single
    SUPER-NODE named by its label, because the previous assignment
    already IS the connectivity closure of the old edge history.
    Mapping every batch-edge endpoint through the standing labels
    (old node → its component label; unseen node → itself) yields a
    contracted graph whose connected components are exactly the
    merges the batch causes: two docs end up connected under the full
    history iff their super-nodes are connected by contracted batch
    edges. Min-labels also survive: a component's label is its
    smallest member id, so the min over a set of merged super-node
    labels (plus any new member ids) IS the min over all their
    members — labels stay stable across refreshes unless a merge
    genuinely joins components (then the joint minimum wins —
    deterministic). The CC iteration therefore runs on O(batch edges)
    rows — never O(labeled docs) per round, which the previous
    star-union form paid (its star edges re-entered every
    propagation round) — and the standing assignment is touched
    exactly twice: once to contract the endpoints, once to relabel
    through the (tiny) merge map.

    ``new_nodes``: the batch's doc ids (optional single-column frame;
    defaults to the ids appearing in ``new_edges``) — isolated new
    docs become their own singleton components.

    ``pointer_jumping`` (default True) passes through to the CC loop
    over the contracted graph: merges chained through many batch
    edges benefit; callers whose batches produce shallow merge
    chains can turn it off and save the per-round label self-join.
    """
    lab_a = prev.select(
        F.col(id_col).alias("_es"), F.col(component_col).alias("_ca")
    )
    lab_b = prev.select(
        F.col(id_col).alias("_ed"), F.col(component_col).alias("_cb")
    )
    e = new_edges.select(F.col(src).alias("_es"), F.col(dst).alias("_ed"))
    # contract: endpoint -> its standing label (itself when unseen);
    # edges inside one old component become self-loops and drop out
    ce = (
        e.join(lab_a, "_es", "left")
        .join(lab_b, "_ed", "left")
        .select(
            F.coalesce("_ca", F.col("_es")).alias("_cs"),
            F.coalesce("_cb", F.col("_ed")).alias("_cd"),
        )
        .filter(F.col("_cs") != F.col("_cd"))
    )
    # CC over super-nodes only: O(contracted batch edges) per round.
    # Every contracted node touches an edge by construction, so the
    # iteration core's label table IS the full delta — no node-set
    # distinct, no isolated-node join-back.
    und = ce.unionByName(
        ce.select(F.col("_cd").alias("_cs"), F.col("_cs").alias("_cd"))
    ).select(F.col("_cs").alias("_s"), F.col("_cd").alias("_d"))
    delta = _cc_labels(und, max_iter, pointer_jumping).select(
        F.col("_n").alias("_dn"), F.col("comp").alias("_dc")
    )
    # base assignment: old nodes keep prev labels; batch/edge nodes
    # unseen by prev start as their own singleton
    base = prev.select(F.col(id_col), F.col(component_col).alias("_bc"))
    extra = None
    if new_nodes is not None:
        extra = new_nodes.select(
            F.col(new_nodes.columns[0]).alias(id_col)
        )
    endpoints = e.select(F.col("_es").alias(id_col)).unionByName(
        e.select(F.col("_ed").alias(id_col))
    )
    extra = endpoints if extra is None else extra.unionByName(endpoints)
    extra = (
        extra.distinct()
        .join(prev.select(F.col(id_col)), id_col, "left_anti")
        .select(F.col(id_col), F.col(id_col).alias("_bc"))
    )
    # relabel through the merge map: only labels whose super-node the
    # batch touched can change, so the left join falls back to the
    # standing label for everything else
    return (
        base.unionByName(extra)
        .join(delta, F.col("_bc") == F.col("_dn"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_dc"), F.col("_bc")).alias(component_col),
        )
    )
