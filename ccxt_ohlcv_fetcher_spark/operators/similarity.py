"""Vector similarity search (north star; SURVEY.md §2.11, op E35).

- ``cosine_topk``: exact brute-force top-k, two-stage (partition-local
  top-k, then merge) so the shuffle carries ``|Q| * k`` rows per
  partition instead of ``|Q| * |corpus|`` — the 100 TB-safe exact path
  when the query set is broadcastable.
- ``sign_lsh_buckets``: deterministic random-hyperplane LSH (hyperplane
  components derived from md5, no RNG state) — the approximate scale
  path: bucket-join candidates, exact re-rank inside buckets.

Scoring is pure JVM array arithmetic (functions/arrays.py); embeddings
are pre-normalized once so top-k-by-cosine becomes top-k-by-dot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.functions.arrays import dot_product, l2_norm
from ccxt_ohlcv_fetcher_spark.functions.hashing import md5_long_py


def _with_norm(df: DataFrame, vec_col: str, out: str) -> DataFrame:
    """Hoist the vector's L2 norm to a per-row column BEFORE any pair
    join: norms then cost |rows| evaluations instead of |pairs|. The
    score stays ``dot/(na*nb)`` — bit-identical to the inline form, so
    DuckDB-oracle value hashes are unaffected (unlike pre-normalizing
    the components, which reorders float ops)."""
    return df.withColumn(out, l2_norm(vec_col))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "q_id",
    query_vec: str = "q_vec",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors. Output: (q_id, vec_id, score, rank), ties broken by vec_id.

    Plan shape: broadcast(queries) x corpus -> score -> per-shuffle-
    partition partial top-k (groupBy collect_list/slice with map-side
    combine) -> final merge. No global sort, no window over the full
    cross product.
    """
    scored = (
        _with_norm(corpus, corpus_vec, "_cn")
        .join(F.broadcast(_with_norm(queries, query_vec, "_qn")))
        .select(
            F.col(query_id),
            F.col(corpus_id),
            (
                dot_product(corpus_vec, query_vec) / (F.col("_cn") * F.col("_qn"))
            ).alias("score"),
        )
    )
    # sortable struct: ascending (neg_score, vec_id) == (score desc, id asc)
    item = F.struct((-F.col("score")).alias("neg"), F.col(corpus_id).alias("id"))
    partial = (
        scored.repartition(F.col(query_id))
        .groupBy(query_id, F.spark_partition_id().alias("_pid"))
        .agg(F.slice(F.array_sort(F.collect_list(item)), 1, k).alias("_top"))
    )
    merged = (
        partial.groupBy(query_id)
        .agg(
            F.slice(F.array_sort(F.flatten(F.collect_list("_top"))), 1, k).alias("_top")
        )
        .select(query_id, F.posexplode("_top").alias("pos", "item"))
    )
    return merged.select(
        query_id,
        F.col("item.id").alias(corpus_id),
        (-F.col("item.neg")).alias("score"),
        (F.col("pos") + 1).alias("rank"),
    )


def knn_graph(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mutual: bool = True,
) -> DataFrame:
    """Exact k-NN graph over one embedding set — the local-graph
    primitive under graph clustering and kNN-graph dedup: each vector's
    k nearest OTHER vectors by cosine (ties to the lower id), optionally
    restricted to MUTUAL edges (b in kNN(a) AND a in kNN(b)), the
    standard symmetrization that drops hub-to-outlier asymmetric links.

    Output: mutual -> (id_a, id_b, score) with id_a < id_b, one row per
    undirected edge; directed -> (src, dst, score, rank).

    Plan shape: broadcast(norms+vectors) x corpus self-join -> score ->
    per-scan-partition partial top-k (map-side combine; the shuffle
    carries k rows per (node, partition), never the N^2 pair set) ->
    final merge -> the mutual check is a LEFT SEMI join of the N*k edge
    list against its own reversal — O(N*k), corpus-size bounded.

    DEMO-SCALE pair generation (the broadcast side is the corpus):
    at 100 TB the candidate generator is the bucketed LSH self-join
    (ann_allpairs_topk) and this exact form is the per-bucket scorer;
    the top-k merge and mutual stages are identical in both regimes.
    Cosine is bit-symmetric (per-element products commute, one fold
    order), so the two directed scores of a mutual pair are equal and
    either may be reported."""
    n = _with_norm(emb, vec_col, "_n")
    a = n.select(
        F.col(id_col).alias("src"),
        F.col(vec_col).alias("_va"),
        F.col("_n").alias("_na"),
    )
    b = n.select(
        F.col(id_col).alias("dst"),
        F.col(vec_col).alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    scored = (
        a.join(F.broadcast(b), F.col("src") != F.col("dst"))
        .select(
            "src",
            "dst",
            (
                dot_product("_va", "_vb") / (F.col("_na") * F.col("_nb"))
            ).alias("score"),
        )
    )
    item = F.struct((-F.col("score")).alias("neg"), F.col("dst").alias("id"))
    partial = scored.groupBy(
        "src", F.spark_partition_id().alias("_pid")
    ).agg(F.slice(F.array_sort(F.collect_list(item)), 1, k).alias("_top"))
    knn = (
        partial.groupBy("src")
        .agg(
            F.slice(
                F.array_sort(F.flatten(F.collect_list("_top"))), 1, k
            ).alias("_top")
        )
        .select("src", F.posexplode("_top").alias("_pos", "item"))
        .select(
            "src",
            F.col("item.id").alias("dst"),
            (-F.col("item.neg")).alias("score"),
            (F.col("_pos") + 1).alias("rank"),
        )
    )
    if not mutual:
        return knn
    # the mutual check consumes the edge list TWICE (direct + reversed);
    # without a checkpoint the whole N^2 score+top-k subtree executes
    # once per side (the CC-loop lesson, ROUND_NOTES round 4). The
    # checkpointed frame is N*k rows — corpus-size bounded.
    knn = knn.localCheckpoint()
    rev = knn.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (
        knn.join(rev, ["src", "dst"], "left_semi")
        .filter(F.col("src") < F.col("dst"))
        .select(
            F.col("src").alias("id_a"), F.col("dst").alias("id_b"), "score"
        )
    )


def hyperplane(dim: int, plane_id: int, salt: str = "lsh") -> Column:
    """Deterministic pseudo-random hyperplane: component i is mapped from
    md5(salt|plane|i) into [-1, 1). No RNG state -> reproducible across
    runs, engines, and cluster sizes.

    Components are folded driver-side (md5 of literals) into one array
    literal — identical values to the previous md5-expression form, but
    the plan carries ``dim`` doubles instead of ``dim`` md5/conv
    subtrees, which dominated compile+codegen time for 64-dim vectors.
    """
    values = [
        float(md5_long_py(f"{salt}|{plane_id}|{i}")) / float(2**59) - 1.0
        for i in range(dim)
    ]
    return F.lit(values)


def plane_dots(vec_col: str, n_planes: int, dim: int, salt: str = "lsh") -> Column:
    """Array of the vector's dot products with the ``n_planes`` fixed
    hyperplanes — the shared kernel of bucket assignment (sign bits) and
    adaptive multiprobe (|dot| = distance to each cutting plane).

    All planes live in ONE array<array<double>> literal scored by a
    single nested HOF — one codegen'd aggregate loop regardless of
    ``n_planes``, instead of ``n_planes`` separate zip/aggregate
    subtrees (plan compile time was the dominant cost of the unrolled
    form; see PERFORMANCE.md §5)."""
    planes = F.lit(
        [
            [float(md5_long_py(f"{salt}|{j}|{i}")) / float(2**59) - 1.0 for i in range(dim)]
            for j in range(n_planes)
        ]
    )
    return F.transform(
        planes,
        lambda p: F.aggregate(
            F.zip_with(F.col(vec_col), p, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )


def sign_lsh_buckets(
    df: DataFrame,
    vec_col: str,
    n_planes: int,
    dim: int,
    salt: str = "lsh",
) -> DataFrame:
    """Random-hyperplane sign LSH: bucket id = sign bits of the vector's
    dot products with ``n_planes`` fixed hyperplanes (2^n_planes buckets).
    Cosine-similar vectors collide with probability (1 - theta/pi)^planes.
    """
    weights = F.lit([float(1 << j) for j in range(n_planes)])
    dots = plane_dots(vec_col, n_planes, dim, salt)
    bucket = F.aggregate(
        F.zip_with(dots, weights, lambda d, w: F.when(d >= 0, w).otherwise(F.lit(0.0))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ).cast("bigint")
    return df.withColumn("bucket", bucket)


def ann_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 8,
    multiprobe: int = 0,
    adaptive: bool = False,
    probe_depth: int = 1,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "q_id",
    query_vec: str = "q_vec",
) -> DataFrame:
    """Approximate top-k: LSH-bucket corpus and queries, exact re-rank
    within matching buckets only. Trades recall for touching
    ~|corpus|/2^planes candidates per query. Output schema matches
    :func:`cosine_topk` (rank within retrieved candidates).

    ``multiprobe=m`` additionally probes, per query, ``m`` buckets at
    Hamming distance 1 — the standard recall lever that beats lowering
    ``n_planes``: near misses concentrate in single-bit flips, so recall
    rises ~like having 1 fewer plane while candidate volume grows only
    (1+m)/2^planes of the corpus (vs 2x for one fewer plane).
    Corpus-side work and storage are unchanged; only the broadcast
    query side fans out.

    ``adaptive=True`` picks WHICH m bits to flip per query: the planes
    whose dot product with the query has the smallest magnitude — i.e.
    the cutting planes the query sits closest to, which are exactly
    where its near neighbors fall on the other side (multi-probe LSH,
    Lv et al., VLDB'07). Fixed-bit probing spends its budget on planes
    chosen blind; margin-ordered probing spends it where the miss
    probability actually is, so recall per probe is strictly better at
    identical cost/plan shape (measured in PERFORMANCE.md §6).

    ``probe_depth=2`` (adaptive only) draws the probe sequence from
    single-bit AND two-bit perturbations, ranked by total margin cost
    |d_a| (+ |d_b|) — the full probing-sequence construction of
    multi-probe LSH (Lv et al. §4.2). Single-bit probing saturates
    once every plane has been flipped (at 4 planes, recall plateaus at
    0.60 on the clustered fixture no matter the budget); the two-bit
    tail keeps buying recall at the same +1-bucket-per-probe cost:
    0.64 / 0.76 / 0.83 at m=4/6/8 with 4 planes. Curve + recommended
    operating points in PERFORMANCE.md §6."""
    c_b = sign_lsh_buckets(_with_norm(corpus, corpus_vec, "_cn"), corpus_vec, n_planes, dim)
    q_b = sign_lsh_buckets(_with_norm(queries, query_vec, "_qn"), query_vec, n_planes, dim)
    if multiprobe:
        max_probes = (
            n_planes + n_planes * (n_planes - 1) // 2
            if (adaptive and probe_depth >= 2)
            else n_planes
        )
        m = min(multiprobe, max_probes)
        if adaptive:
            # stage the dots once (one plane-matrix literal in the plan;
            # bucket already consumed its own — don't add a third)
            q_b = q_b.withColumn("_dots", plane_dots(query_vec, n_planes, dim))
            # planes sorted by |dot| ascending -> the m tightest margins
            margins = F.transform(
                F.col("_dots"),
                lambda d, i: F.struct(F.abs(d).alias("m"), i.alias("j")),
            )
            if probe_depth >= 2:
                srt = F.array_sort(margins)
                mask_of = lambda j: F.pow(  # noqa: E731
                    F.lit(2.0), j.cast("double")
                ).cast("bigint")
                singles = F.transform(
                    srt,
                    lambda s: F.struct(
                        s["m"].alias("c"), mask_of(s["j"]).alias("mask")
                    ),
                )
                # two-bit perturbations among the tightest planes (the
                # cheapest pairs by construction); t bounds the candidate
                # set to t*(t-1)/2 structs in the expression
                t = min(n_planes, 6)
                tight = F.slice(srt, 1, t)
                idx = F.sequence(F.lit(0), F.lit(t - 1))
                grid = F.flatten(
                    F.transform(
                        idx,
                        lambda i: F.transform(
                            idx, lambda l: F.struct(i.alias("i"), l.alias("l"))
                        ),
                    )
                )
                pairs = F.transform(
                    F.filter(grid, lambda p: p["l"] > p["i"]),
                    lambda p: F.struct(
                        (
                            F.element_at(tight, p["i"] + 1)["m"]
                            + F.element_at(tight, p["l"] + 1)["m"]
                        ).alias("c"),
                        (
                            mask_of(F.element_at(tight, p["i"] + 1)["j"])
                            + mask_of(F.element_at(tight, p["l"] + 1)["j"])
                        ).alias("mask"),
                    ),
                )
                ranked = F.array_sort(F.concat(singles, pairs))
                masks = F.slice(ranked, 1, m)["mask"]
                probes = F.concat(
                    F.array(F.col("bucket")),
                    F.transform(
                        masks, lambda msk: F.col("bucket").bitwiseXOR(msk)
                    ),
                )
            else:
                flip_bits = F.slice(F.array_sort(margins), 1, m)["j"]
                probes = F.concat(
                    F.array(F.col("bucket")),
                    F.transform(
                        flip_bits,
                        lambda j: F.col("bucket").bitwiseXOR(
                            F.pow(F.lit(2.0), j.cast("double")).cast("bigint")
                        ),
                    ),
                )
        else:
            probes = F.array(
                F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(m)],
            )
        q_b = q_b.withColumn("bucket", F.explode(probes))
        if adaptive:
            q_b = q_b.drop("_dots")  # don't ship the dots in the broadcast
    candidates = c_b.join(F.broadcast(q_b), "bucket").select(
        query_id,
        F.col(corpus_id),
        (dot_product(corpus_vec, query_vec) / (F.col("_cn") * F.col("_qn"))).alias(
            "score"
        ),
    )
    item = F.struct((-F.col("score")).alias("neg"), F.col(corpus_id).alias("id"))
    return (
        candidates.groupBy(query_id)
        .agg(F.slice(F.array_sort(F.collect_list(item)), 1, k).alias("_top"))
        .select(query_id, F.posexplode("_top").alias("pos", "item"))
        .select(
            query_id,
            F.col("item.id").alias(corpus_id),
            (-F.col("item.neg")).alias("score"),
            (F.col("pos") + 1).alias("rank"),
        )
    )


def allpairs_cosine_topk(
    corpus: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 4,
    multiprobe: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus x corpus all-k-NN (op E35, self-similarity form): for EVERY
    row, its k nearest neighbors by cosine — the whole-corpus workload
    (semantic dedup, graph construction) where the "query set" is the
    corpus itself and therefore NOT broadcastable.

    Plan shape: one ``sign_lsh_buckets`` pass over the corpus, then a
    shuffle-partitioned **self-join on the bucket id** (SortMergeJoin /
    shuffled hash — deliberately no ``F.broadcast`` anywhere), exact
    re-rank inside buckets, per-row top-k. Work is quadratic only within
    a bucket (~|corpus|/2^planes rows each), so total candidate volume
    is ~|corpus|^2 / 2^planes spread evenly across shuffle partitions —
    the standard blocked all-pairs formulation. At 100 TB you size
    ``n_planes`` so the expected bucket fits a task (PERFORMANCE.md §6
    discusses the recall/cost trade).

    ``multiprobe=m`` additionally probes, per row, its ``m``
    tightest-margin neighbor buckets (same adaptive rule as
    :func:`ann_cosine_topk`) on the LEFT side only — each candidate pair
    still appears at most once per direction because the right side
    keeps its single home bucket. Recall rises without touching
    corpus-side storage.

    Output: (vec_id, neighbor_id, score, rank), rank 1..k per vec_id,
    ties broken by neighbor id. Self-pairs are excluded.
    """
    # both self-join sides (and the multiprobe margin derivation) read
    # this — pin so the scan + plane dots + bucketing run once (r12)
    bucketed = sign_lsh_buckets(
        _with_norm(corpus, vec_col, "_n"), vec_col, n_planes, dim
    ).localCheckpoint(eager=False)
    right = bucketed.select(
        F.col("bucket"),
        F.col(id_col).alias("_rid"),
        F.col(vec_col).alias("_rvec"),
        F.col("_n").alias("_rn"),
    )
    left = bucketed
    if multiprobe:
        m = min(multiprobe, n_planes)
        dots = plane_dots(vec_col, n_planes, dim)
        margins = F.transform(
            dots, lambda d, i: F.struct(F.abs(d).alias("m"), i.alias("j"))
        )
        flip_bits = F.slice(F.array_sort(margins), 1, m)["j"]
        probes = F.concat(
            F.array(F.col("bucket")),
            F.transform(
                flip_bits,
                lambda j: F.col("bucket").bitwiseXOR(
                    F.pow(F.lit(2.0), j.cast("double")).cast("bigint")
                ),
            ),
        )
        left = left.withColumn("bucket", F.explode(probes))
    left = left.select(
        F.col("bucket"),
        F.col(id_col),
        F.col(vec_col).alias("_lvec"),
        F.col("_n").alias("_ln"),
    )
    candidates = (
        left.join(right, "bucket")  # NOT broadcast: co-partitioned self-join
        .filter(F.col(id_col) != F.col("_rid"))
        .select(
            id_col,
            F.col("_rid").alias("neighbor_id"),
            (dot_product("_lvec", "_rvec") / (F.col("_ln") * F.col("_rn"))).alias(
                "score"
            ),
        )
    )
    item = F.struct((-F.col("score")).alias("neg"), F.col("neighbor_id").alias("id"))
    return (
        candidates.groupBy(id_col)
        .agg(F.slice(F.array_sort(F.collect_set(item)), 1, k).alias("_top"))
        .select(id_col, F.posexplode("_top").alias("pos", "item"))
        .select(
            id_col,
            F.col("item.id").alias("neighbor_id"),
            (-F.col("item.neg")).alias("score"),
            (F.col("pos") + 1).alias("rank"),
        )
    )


def collect_seed_vectors(
    corpus: DataFrame,
    n: int,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """The ``n`` lowest-id corpus vectors — the shared deterministic
    seed set every untrained ANN tier derives its layout from (IVF
    centroids = first n_cells seeds, PQ codebooks = first n_codes
    seeds' subvectors). One TakeOrdered job. Callers running several
    tiers over the same corpus collect ONCE and pass ``seed_vectors=``
    to each — the cold-start fix for the per-query seed scan
    (round-5 perf item: the builder collect dominated IVF-PQ's
    driver-visible time)."""
    rows = (
        corpus.orderBy(corpus_id)
        .limit(n)
        .select(F.col(vec_col).alias("_v"))
        .collect()
    )
    return [[float(x) for x in r["_v"]] for r in rows]


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_cells: int = 16,
    n_probe: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    seed_vectors: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style ANN (op E35 scale path, complementing sign-LSH):
    partition the corpus into ``n_cells`` Voronoi cells around seed
    centroids; each query probes its ``n_probe`` nearest cells and
    re-ranks exactly inside them.

    Centroids are the ``n_cells`` lowest-id corpus vectors — a
    deterministic stand-in for k-means (real IVF trains centroids; the
    *query plan* is identical: assign = argmax over a broadcast centroid
    list, probe = equi-join on cell id). Touches ~n_probe/n_cells of the
    corpus per query; one shuffle on the cell id.
    """
    if seed_vectors is None:
        seed_vectors = collect_seed_vectors(corpus, n_cells, corpus_id, corpus_vec)
    centroids = [list(map(float, v)) for v in seed_vectors[:n_cells]]
    # one array<array<double>> literal + one nested HOF, not n_cells
    # unrolled aggregate subtrees: halves wall time at 16 cells (plan
    # compile dominated; PERFORMANCE.md §5)
    cmat = F.lit(centroids)
    cnorms = F.lit([float(_norm(c)) for c in centroids])

    def cell_scores(vec: str) -> Column:
        # cosine argmax doesn't need the row vector's own norm (constant
        # across cells) — only each centroid's, folded to a literal
        dots = F.transform(
            cmat,
            lambda c: F.aggregate(
                F.zip_with(F.col(vec), c, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        return F.zip_with(dots, cnorms, lambda s, n: s / n)

    def top_cells(vec: str, n: int) -> Column:
        # (score, cell) structs sorted desc -> first n cell ids
        pairs = F.transform(
            cell_scores(vec),
            lambda s, i: F.struct((-s).alias("neg"), i.alias("cell")),
        )
        return F.slice(F.array_sort(pairs), 1, n)["cell"]

    assigned = _with_norm(corpus, corpus_vec, "_cn").withColumn(
        "_cell", top_cells(corpus_vec, 1)[0]
    )
    probes = _with_norm(queries, query_vec, "_qn").withColumn(
        "_cell", F.explode(top_cells(query_vec, n_probe))
    )
    candidates = assigned.join(F.broadcast(probes), "_cell").select(
        query_id,
        F.col(corpus_id),
        (dot_product(corpus_vec, query_vec) / (F.col("_cn") * F.col("_qn"))).alias(
            "score"
        ),
    )
    item = F.struct((-F.col("score")).alias("neg"), F.col(corpus_id).alias("id"))
    return (
        candidates.groupBy(query_id)
        .agg(F.slice(F.array_sort(F.collect_list(item)), 1, k).alias("_top"))
        .select(query_id, F.posexplode("_top").alias("pos", "item"))
        .select(
            query_id,
            F.col("item.id").alias(corpus_id),
            (-F.col("item.neg")).alias("score"),
            (F.col("pos") + 1).alias("rank"),
        )
    )


def ivf_cosine_topk_scoreaware(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_cells: int = 16,
    n_probe: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    seed_vectors: list[list[float]] | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """IVF top-k with score-aware cell probing: SAME result as
    ``ivf_cosine_topk`` at equal ``n_probe``, fewer probed cells.

    The spherical triangle inequality gives the bound: every member x
    of cell c lies within the cell's angular radius r_c of the
    centroid (r_c = acos(min member-centroid cosine), computed at
    assignment time in one extra groupBy), so
    ``angle(q, x) >= angle(q, centroid_c) - r_c`` and
    ``cos(q, x) <= cos(max(0, theta_qc - r_c))``. Phase 1 probes each
    query's NEAREST cell exactly and takes its running k-th best
    cosine; phase 2 probes ranked cells 2..n_probe only while their
    bound could still displace it. Phase-1 scores are EXACT (this is
    the plain-IVF variant, not ADC), so the skip is sound and the
    equality contract holds — the PQ tier cannot use this rule because
    an over-estimated ADC s_k could prune a cell holding the true
    winner. Tight clusters (small r_c) and good matches (high s_k)
    prune hardest — the serving regime that matters.
    """
    import math

    if seed_vectors is None:
        seed_vectors = collect_seed_vectors(corpus, n_cells, corpus_id, corpus_vec)
    centroids = [list(map(float, v)) for v in seed_vectors[:n_cells]]
    cmat = F.lit(centroids)
    cnorms = F.lit([float(_norm(c)) for c in centroids])

    def cell_pairs(vec: str) -> Column:
        dots = F.transform(
            cmat,
            lambda c: F.aggregate(
                F.zip_with(F.col(vec), c, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        return F.array_sort(
            F.transform(
                F.zip_with(dots, cnorms, lambda s, n: s / n),
                lambda s, i: F.struct((-s).alias("neg"), i.alias("cell")),
            )
        )

    assigned = (
        _with_norm(corpus, corpus_vec, "_cn")
        .withColumn("_p", cell_pairs(corpus_vec)[0])
        .select(
            corpus_id,
            corpus_vec,
            "_cn",
            F.col("_p.cell").alias("_cell"),
            # member-centroid cosine: the argmax score / |x|
            (-F.col("_p.neg") / F.col("_cn")).alias("_ccos"),
        )
        .localCheckpoint(eager=False)  # consumed by radius + both probes
    )
    radius = assigned.groupBy("_cell").agg(
        F.acos(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), F.min("_ccos"))))
        .alias("_radius")
    )
    q = (
        _with_norm(queries, query_vec, "_qn")
        .withColumn("_pairs", F.slice(cell_pairs(query_vec), 1, n_probe))
        .localCheckpoint(eager=False)
    )
    home = q.select(
        query_id, "_qn", query_vec, F.col("_pairs")[0]["cell"].alias("_cell")
    )
    cand_home = (
        assigned.join(F.broadcast(home), "_cell")
        .select(
            query_id,
            F.col(corpus_id),
            (
                dot_product(corpus_vec, query_vec)
                / (F.col("_cn") * F.col("_qn"))
            ).alias("score"),
        )
        .localCheckpoint(eager=False)
    )
    sk = (
        cand_home.groupBy(query_id)
        .agg(F.slice(F.array_sort(F.collect_list(-F.col("score"))), 1, k).alias("_t"))
        .select(
            query_id,
            F.when(F.size("_t") >= k, -F.element_at("_t", k))
            .otherwise(F.lit(-1.0))
            .alias("_sk"),
        )
    )
    rest = (
        q.select(
            query_id,
            "_qn",
            query_vec,
            F.explode(F.slice(F.col("_pairs"), 2, n_probe - 1)).alias("_p"),
        )
        .join(sk, query_id, "left")
        .select(
            query_id,
            "_qn",
            query_vec,
            "_sk",
            F.col("_p.cell").alias("_cell"),
            F.acos(
                F.greatest(
                    F.lit(-1.0),
                    F.least(F.lit(1.0), -F.col("_p.neg") / F.col("_qn")),
                )
            ).alias("_theta"),
        )
        .join(F.broadcast(radius), "_cell")
        .withColumn(
            "_bound",
            F.cos(F.greatest(F.lit(0.0), F.col("_theta") - F.col("_radius"))),
        )
        .filter(F.col("_sk").isNull() | (F.col("_bound") >= F.col("_sk")))
        .select(query_id, "_qn", query_vec, "_cell")
    )
    if stats_out is not None:
        # pin only when the telemetry count adds a second consumer; on
        # the serving path cand_rest is rest's sole consumer (r13)
        rest = rest.localCheckpoint(eager=False)
        stats_out["rest_pairs"] = rest.count()
        stats_out["full_rest_pairs"] = queries.count() * (n_probe - 1)
        stats_out["radii"] = {
            int(r["_cell"]): float(math.degrees(r["_radius"]))
            for r in radius.collect()
        }
    cand_rest = assigned.join(F.broadcast(rest), "_cell").select(
        query_id,
        F.col(corpus_id),
        (
            dot_product(corpus_vec, query_vec) / (F.col("_cn") * F.col("_qn"))
        ).alias("score"),
    )
    candidates = cand_home.unionByName(cand_rest)
    item = F.struct((-F.col("score")).alias("neg"), F.col(corpus_id).alias("id"))
    return (
        candidates.groupBy(query_id)
        .agg(F.slice(F.array_sort(F.collect_list(item)), 1, k).alias("_top"))
        .select(query_id, F.posexplode("_top").alias("pos", "item"))
        .select(
            query_id,
            F.col("item.id").alias(corpus_id),
            (-F.col("item.neg")).alias("score"),
            (F.col("pos") + 1).alias("rank"),
        )
    )


def _fold_sumsq(xs: list[float]) -> float:
    """Left-fold sum of squares — the exact addition order of
    ``F.aggregate(F.transform(cw, x*x), 0.0, acc+s)``, so values
    computed driver-side stay bit-identical to the former in-plan form."""
    acc = 0.0
    for x in xs:
        acc += float(x) * float(x)
    return acc


def _codebook_row(
    spark,
    codebooks: list[list[list[float]]],
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """The PQ codebook as broadcastable DATA, not plan text: one row
    carrying ``_cb`` (m x n_codes x sub codewords) and ``_cwsq``
    (m x n_codes squared codeword norms), optionally ``_cent``/``_cnorm``
    (IVF centroids). Joined to corpus/queries on a constant key (a
    1-row BroadcastHashJoin), the codebook reaches every executor the
    way FAISS ships it — as bytes — while the query PLAN stays small:
    the former nested array literals (1024 doubles at m=8, n_codes=16,
    dim=64) dominated plan compile/codegen time on every PQ query
    (round-4 profile: ann_cosine_topk_pq/ivfpq were compile-bound)."""
    from pyspark.sql import types as T

    fields = [
        T.StructField(
            "_cb", T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))
        ),
        T.StructField("_cwsq", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ]
    cwsq = [[_fold_sumsq(cw) for cw in cb_j] for cb_j in codebooks]
    data: tuple = (codebooks, cwsq)
    if centroids is not None:
        fields += [
            T.StructField("_cent", T.ArrayType(T.ArrayType(T.DoubleType()))),
            T.StructField("_cnorm", T.ArrayType(T.DoubleType())),
        ]
        data = data + (centroids, [float(_norm(c)) for c in centroids])
    fields.append(T.StructField("_one", T.IntegerType()))
    return spark.createDataFrame([data + (1,)], T.StructType(fields))


def _pq_codes(vec_col: str, sub: int) -> Column:
    """Per-subspace argmin-by-L2 codeword index, as a HOF over the
    joined ``_cb`` COLUMN (see :func:`_codebook_row`) — identical values
    and tie-breaks to the former literal form, but the plan carries a
    column reference instead of the codebook."""
    v = F.col(vec_col)
    return F.transform(
        F.col("_cb"),
        lambda cbj, j: F.array_sort(
            F.transform(
                cbj,
                lambda cw, c: F.struct(
                    F.aggregate(
                        F.zip_with(
                            F.slice(v, j * sub + 1, sub),
                            cw,
                            lambda x, y: (x.cast("double") - y) ** 2,
                        ),
                        F.lit(0.0),
                        lambda acc, d: acc + d,
                    ).alias("d"),
                    c.alias("c"),
                ),
            )
        )[0]["c"].cast("int"),
    )


def _pq_recon_norm() -> Column:
    """Reconstructed corpus norm from the code table alone: ||concat_j
    codebook[j][codes[j]]|| — m lookups into the squared-norm table."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("codes"), F.col("_cwsq"), lambda c, sq: F.element_at(sq, c + 1)
            ),
            F.lit(0.0),
            lambda acc, s: acc + s,
        )
    )


def _top_cells(vec: str, n: int) -> Column:
    """Top-n IVF cells by cosine against the joined ``_cent``/``_cnorm``
    COLUMNS (broadcast data, not plan literals — same compile-cost fix
    as the PQ codebook)."""
    dots = F.transform(
        F.col("_cent"),
        lambda c: F.aggregate(
            F.zip_with(F.col(vec), c, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    pairs = F.transform(
        F.zip_with(dots, F.col("_cnorm"), lambda s, n_: s / n_),
        lambda s, i: F.struct((-s).alias("neg"), i.alias("cell")),
    )
    return F.slice(F.array_sort(pairs), 1, n)["cell"]


def _pq_query_lut(query_vec: str, sub: int) -> Column:
    """The classic ADC lookup table, per query: partial dot products of
    each query subvector against every codeword — m x n_codes doubles
    computed ONCE per query (not per candidate pair). Pair scoring then
    reduces to m array lookups + adds."""
    qv = F.col(query_vec)
    return F.transform(
        F.col("_cb"),
        lambda cbj, j: F.transform(
            cbj,
            lambda cw: F.aggregate(
                F.zip_with(
                    F.slice(qv, j * sub + 1, sub),
                    cw,
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, d: acc + d,
            ),
        ),
    )


def _pq_adc() -> Column:
    """ADC score from the per-query LUT: sum_j lut[j][codes[j]] — fold
    order over j matches the former inline form, so scores are
    bit-identical to scoring against the codebook directly."""
    return F.aggregate(
        F.zip_with(
            F.col("codes"), F.col("_lut"), lambda c, lj: F.element_at(lj, c + 1)
        ),
        F.lit(0.0),
        lambda acc, s: acc + s,
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization encode (op E35, compression tier): split each
    vector into ``m`` subspaces and store, per subspace, the index of
    the nearest codeword — ``m`` small ints instead of ``dim`` doubles
    (16 codewords -> 4 bits/subspace; 64-dim float64 -> 8 bytes at
    m=8, a 64x compression). The decoded approximation is the
    concatenation of chosen codewords; scoring against it never touches
    the original vector (Jégou et al., TPAMI'11 — public PQ/ADC method).

    The codebook travels as broadcast DATA (:func:`_codebook_row`), not
    as plan literals: a 1-row BroadcastHashJoin delivers it to every
    executor and the argmin HOF references the joined column. Adds a
    ``codes`` column.
    """
    sub = len(codebooks[0][0])
    cb_row = _codebook_row(corpus.sparkSession, codebooks)
    return (
        corpus.withColumn("_one", F.lit(1))
        .join(F.broadcast(cb_row), "_one")
        .withColumn("codes", _pq_codes(vec_col, sub))
        .drop("_one", "_cb", "_cwsq")
    )


def train_pq_codebooks(
    corpus: DataFrame,
    dim: int,
    m: int,
    n_codes: int,
    n_iter: int = 3,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train PQ codebooks with per-subspace Lloyd's k-means — ALL m
    subspaces jointly in one job per iteration (one explode to
    (subspace, subvector) rows; assignment keys on (subspace, code), so
    the m trainings share every scan and shuffle instead of running m
    separate k-means loops). Init and update rules match
    operators/clustering.py (lowest-id seeds, exact-decimal means,
    empty codes keep position) — deterministic trajectory.

    Driver traffic per iteration: m * n_codes * (dim/m) = n_codes * dim
    doubles — the same k-means synchronization point, independent of
    corpus size.
    """
    sub = dim // m
    rows = corpus.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: F.struct(
                    j.alias("s"), F.slice(F.col(vec_col), j * sub + 1, sub).alias("v")
                ),
            )
        ).alias("_e")
    ).select(F.col("_e.s").alias("_s"), F.col("_e.v").alias("_v"))
    # pin the exploded working set once: every Lloyd iteration re-reads
    # it (k-means' iterative shape), and without the pin each iteration
    # re-runs the explode over the corpus scan
    rows = rows.localCheckpoint()
    seeds = (
        corpus.orderBy(corpus_id).limit(n_codes).select(F.col(vec_col).alias("_c")).collect()
    )
    codebooks = [
        [[float(x) for x in r["_c"][j * sub : (j + 1) * sub]] for r in seeds]
        for j in range(m)
    ]
    spark = corpus.sparkSession
    for _ in range(n_iter):
        # codebooks travel as broadcast DATA (the _codebook_row lesson:
        # the m*n_codes*sub literal array dominated per-iteration plan
        # compile), joined on a constant key — same arithmetic, same
        # trajectory, small plan
        cb_row = F.broadcast(
            spark.createDataFrame(
                [(codebooks,)], "_cbt array<array<array<double>>>"
            ).withColumn("_one", F.lit(1))
        )
        it_rows = rows.withColumn("_one", F.lit(1)).join(cb_row, "_one")
        cbj = F.element_at(F.col("_cbt"), F.col("_s") + 1)
        dists = F.transform(
            cbj,
            lambda c: F.aggregate(
                F.zip_with(F.col("_v"), c, lambda x, y: (x.cast("double") - y) ** 2),
                F.lit(0.0),
                lambda acc, d: acc + d,
            ),
        )
        code = F.array_sort(
            F.transform(dists, lambda d, i: F.struct(d.alias("d"), i.alias("i")))
        )[0]["i"]
        means = (
            it_rows.select("_s", code.alias("_c"), "_v")
            .select("_s", "_c", F.posexplode("_v").alias("_j", "_x"))
            .groupBy("_s", "_c", "_j")
            .agg(
                (
                    F.sum(F.col("_x").cast("decimal(28,10)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("_m")
            )
            .groupBy("_s", "_c")
            .agg(F.array_sort(F.collect_list(F.struct("_j", "_m"))).alias("_ms"))
            .select("_s", "_c", F.col("_ms._m").alias("_mean"))
            .collect()
        )
        new = [[list(cw) for cw in cb_j] for cb_j in codebooks]
        for r in means:
            new[r["_s"]][r["_c"]] = [float(x) for x in r["_mean"]]
        codebooks = new
    return codebooks


def pq_quantization_error(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> float:
    """Total squared reconstruction error of a PQ codebook over the
    corpus (sum over rows and subspaces of the distance to the chosen
    codeword) — the objective k-means training minimizes. One scan, one
    scalar to the driver."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    cb = F.lit(codebooks)
    per_row = F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: F.array_min(
                F.transform(
                    F.element_at(cb, j + 1),
                    lambda cw: F.aggregate(
                        F.zip_with(
                            F.slice(F.col(vec_col), j * sub + 1, sub),
                            cw,
                            lambda x, y: (x.cast("double") - y) ** 2,
                        ),
                        F.lit(0.0),
                        lambda acc, d: acc + d,
                    ),
                )
            ),
        ),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )
    return corpus.agg(F.sum(per_row).alias("e")).collect()[0]["e"]


def pq_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    m: int = 8,
    n_codes: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    rerank: int = 0,
    train_iters: int = 0,
    seed_vectors: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC) over
    PQ codes: the query stays full-precision, the corpus side is its
    ``m`` codeword indices — score = dot(query_sub_j, codeword_j)
    summed over subspaces, normalized by the *reconstructed* corpus
    norm. The candidate scan reads |corpus| * m ints instead of
    |corpus| * dim doubles; at 100 TB that's the difference between
    scanning the full embedding store and an in-memory code table
    (the standard IVF-PQ layout pairs this with ivf_cosine_topk's cell
    pruning). Codebooks are the n_codes lowest-id corpus vectors'
    subvectors — deterministic stand-in for k-means training, same plan
    shape as trained codebooks.

    The codebook is broadcast DATA (:func:`_codebook_row`), and each
    query precomputes the classic ADC lookup table
    (:func:`_pq_query_lut`) — pair scoring is m table lookups, and the
    plan carries no codebook literals (the round-4 compile-cost fix).

    ``rerank=r`` adds the standard second stage: shortlist ``r*k`` by
    ADC, then score ONLY the shortlist exactly (one semi-join back to
    the full-precision vectors — touches r*k*|Q| vectors, not the
    corpus). Quantization error then only costs recall where the true
    neighbor fell out of the shortlist, not rank accuracy.

    Output schema matches :func:`cosine_topk`; scores are approximate
    (quantization error), so registry exposure is rows-only with a
    recall test against the exact path.
    """
    assert dim % m == 0
    sub = dim // m
    if codebooks is not None:
        # pre-trained codebooks (e.g. the OPQ tier's memoized training,
        # or an offline training job): skip all build-time work
        pass
    elif train_iters:
        # trained codebooks (``train_pq_codebooks``): lower quantization
        # error -> whole recall curve shifts up at identical query cost
        codebooks = train_pq_codebooks(
            corpus, dim, m, n_codes, n_iter=train_iters,
            corpus_id=corpus_id, vec_col=corpus_vec,
        )
    else:
        if seed_vectors is None:
            seed_vectors = collect_seed_vectors(corpus, n_codes, corpus_id, corpus_vec)
        codebooks = [
            [
                [float(x) for x in v[j * sub : (j + 1) * sub]]
                for v in seed_vectors[:n_codes]
            ]
            for j in range(m)
        ]
    cb_row = _codebook_row(corpus.sparkSession, codebooks)
    encoded = (
        corpus.withColumn("_one", F.lit(1))
        .join(F.broadcast(cb_row), "_one")
        .withColumn("codes", _pq_codes(corpus_vec, sub))
        .select("_one", corpus_id, "codes", _pq_recon_norm().alias("_rn"))
    )
    q = _with_norm(queries, query_vec, "_qn")
    q_lut = (
        q.withColumn("_one", F.lit(1))
        .join(F.broadcast(cb_row), "_one")
        .select("_one", query_id, "_qn", _pq_query_lut(query_vec, sub).alias("_lut"))
    )
    scored = encoded.join(F.broadcast(q_lut), "_one").select(
        query_id,
        F.col(corpus_id),
        (_pq_adc() / (F.col("_rn") * F.col("_qn"))).alias("score"),
    )

    def topk(df: DataFrame, n: int) -> DataFrame:
        item = F.struct((-F.col("score")).alias("neg"), F.col(corpus_id).alias("id"))
        return (
            df.groupBy(query_id)
            .agg(F.slice(F.array_sort(F.collect_list(item)), 1, n).alias("_top"))
            .select(query_id, F.posexplode("_top").alias("pos", "item"))
            .select(
                query_id,
                F.col("item.id").alias(corpus_id),
                (-F.col("item.neg")).alias("score"),
                (F.col("pos") + 1).alias("rank"),
            )
        )

    if not rerank:
        return topk(scored, k)
    shortlist = topk(scored, rerank * k).select(query_id, corpus_id)
    exact = shortlist.join(
        _with_norm(corpus, corpus_vec, "_cn"), corpus_id
    ).join(F.broadcast(q), query_id).select(
        query_id,
        F.col(corpus_id),
        (
            dot_product(corpus_vec, query_vec) / (F.col("_cn") * F.col("_qn"))
        ).alias("score"),
    )
    return topk(exact, k)


def ivf_pq_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    rerank: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    seed_vectors: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-PQ: Voronoi cell pruning (``ivf_cosine_topk``'s layout)
    composed with PQ/ADC scoring (``pq_cosine_topk``'s code table) —
    the standard billion-scale ANN index layout (FAISS's IVFPQ): a
    query touches ~n_probe/n_cells of the corpus, and what it touches
    is scored from m codeword indices, not full vectors; only the final
    ``rerank*k`` shortlist reads real embeddings.

    Plan shape improvement over pure PQ: the candidate join becomes an
    EQUI-join on the cell id (broadcast hash, not the broadcast
    nested-loop cross join a full ADC scan needs), so AQE/stats can
    pick the join strategy and the scan prunes by cell. At 100 TB the
    corpus side is (cell, codes, id, norm) — write it partitioned by
    cell and the probe reads only n_probe directories.
    """
    assert dim % m == 0
    sub = dim // m
    # ONE TakeOrdered job seeds both layouts (cell centroids = first
    # n_cells vectors, PQ codewords = first n_codes) — same deterministic
    # seeds as the separate collects; precomputed ``seed_vectors`` skips
    # even that (the shared-scan path callers use across ANN tiers)
    if seed_vectors is None:
        seed_vectors = collect_seed_vectors(
            corpus, max(n_cells, n_codes), corpus_id, corpus_vec
        )
    centroids = [list(map(float, v)) for v in seed_vectors[:n_cells]]
    top_cells = _top_cells

    # --- PQ code table (untrained seeds; pass through train_pq_codebooks
    # for structured corpora — identical downstream plan)
    codebooks = [
        [
            [float(x) for x in v[j * sub : (j + 1) * sub]]
            for v in seed_vectors[:n_codes]
        ]
        for j in range(m)
    ]
    cb_row = _codebook_row(corpus.sparkSession, codebooks, centroids=centroids)
    encoded = (
        corpus.withColumn("_one", F.lit(1))
        .join(F.broadcast(cb_row), "_one")
        .withColumn("codes", _pq_codes(corpus_vec, sub))
        .select(
            corpus_id,
            "codes",
            top_cells(corpus_vec, 1)[0].alias("_cell"),
            _pq_recon_norm().alias("_rn"),
        )
    )
    probes = (
        _with_norm(queries, query_vec, "_qn")
        .withColumn("_one", F.lit(1))
        .join(F.broadcast(cb_row), "_one")
        .select(
            query_id,
            "_qn",
            _pq_query_lut(query_vec, sub).alias("_lut"),
            F.explode(top_cells(query_vec, n_probe)).alias("_cell"),
        )
    )
    scored = encoded.join(F.broadcast(probes), "_cell").select(
        query_id,
        F.col(corpus_id),
        (_pq_adc() / (F.col("_rn") * F.col("_qn"))).alias("score"),
    )

    def topk(df: DataFrame, n: int) -> DataFrame:
        item = F.struct((-F.col("score")).alias("neg"), F.col(corpus_id).alias("id"))
        return (
            df.groupBy(query_id)
            .agg(F.slice(F.array_sort(F.collect_list(item)), 1, n).alias("_top"))
            .select(query_id, F.posexplode("_top").alias("pos", "item"))
            .select(
                query_id,
                F.col("item.id").alias(corpus_id),
                (-F.col("item.neg")).alias("score"),
                (F.col("pos") + 1).alias("rank"),
            )
        )

    if not rerank:
        return topk(scored, k)
    shortlist = topk(scored, rerank * k).select(query_id, corpus_id)
    exact = shortlist.join(
        _with_norm(corpus, corpus_vec, "_cn"), corpus_id
    ).join(F.broadcast(_with_norm(queries, query_vec, "_qn")), query_id).select(
        query_id,
        F.col(corpus_id),
        (
            dot_product(corpus_vec, query_vec) / (F.col("_cn") * F.col("_qn"))
        ).alias("score"),
    )
    return topk(exact, k)


def _norm(vec: list[float]) -> float:
    return sum(x * x for x in vec) ** 0.5


def truncated_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    trunc_dim: int,
    overfetch: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "q_id",
    query_vec: str = "q_vec",
) -> DataFrame:
    """Matryoshka-style adaptive retrieval (Kusupati et al. 2022 §4.3
    "funnel retrieval"): stage 1 scores every corpus vector with only
    the FIRST ``trunc_dim`` components and keeps ``k * overfetch``
    candidates per query; stage 2 re-scores just that shortlist with
    the full vector. Output matches :func:`cosine_topk`
    (q_id, vec_id, score, rank) with full-precision scores, ties by id.

    Scale shape: stage 1 is the same broadcast x corpus scan as the
    exact tier but arithmetic drops by dim/trunc_dim; stage 2 touches
    k * overfetch rows per query. In a real deployment the truncated
    prefix is MATERIALIZED as its own column so the stage-1 scan also
    reads dim/trunc_dim of the bytes — here it is sliced from the full
    vector (the fixture stores one column), which keeps the plan's
    shuffle/join shape identical while understating only the I/O win.
    Recall floor vs the exact tier is pinned in tests/test_llm_ops.py;
    a self-match (query vector present in the corpus) always survives
    stage 1 because its truncated cosine is exactly 1.0."""
    tslice = lambda c: F.slice(F.col(c), 1, trunc_dim)  # noqa: E731
    tcorpus = corpus.select(
        F.col(corpus_id), tslice(corpus_vec).alias(corpus_vec)
    )
    tqueries = queries.select(
        F.col(query_id), tslice(query_vec).alias(query_vec)
    )
    shortlist = cosine_topk(
        tcorpus, tqueries, k * overfetch,
        corpus_id=corpus_id, corpus_vec=corpus_vec,
        query_id=query_id, query_vec=query_vec,
    ).select(query_id, corpus_id)
    exact = (
        shortlist.join(_with_norm(corpus, corpus_vec, "_cn"), corpus_id)
        .join(F.broadcast(_with_norm(queries, query_vec, "_qn")), query_id)
        .select(
            F.col(query_id),
            F.col(corpus_id),
            (
                dot_product(corpus_vec, query_vec)
                / (F.col("_cn") * F.col("_qn"))
            ).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id).orderBy(
        F.desc("score"), F.col(corpus_id)
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "score", "rank")
    )
