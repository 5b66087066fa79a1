"""Embedding-matrix statistics and PCA (north-star pipeline tier: the
dimensionality-reduction / whitening step that precedes ANN indexing —
rotating embeddings into principal axes is what OPQ does before product
quantization, and a variance-ranked basis lets IVF cells cut along the
directions that matter).

Two tiers, same contract:

- **Exact relational Gram/covariance** (:func:`gram_moments`): each
  row expands to its own (i, j, x*y) upper triangle map-side (nested
  array transform — no explode + self-join), then order-pinned sums
  per (i, j) dim pair. Fully SQL-expressible -> DuckDB-oracled, every
  moment bit-checked. The i<=j triangle keeps the fan-out to
  d*(d+1)/2 per vector. This is the CORRECTNESS anchor.
- **Arrow-batched partial Gram** (:func:`gram_moments_partial`): one
  ``mapInPandas`` pass computing per-batch X^T X / column sums with
  numpy, then one tiny groupBy over d*(d+1)/2 keyed partials. This is
  the 100 TB SHAPE — per-row work is a BLAS rank-k update instead of a
  d^2 row fan-out, and the shuffle carries #partitions * d^2/2 rows
  regardless of corpus size. Float partials are summed in
  partition-dependent order, so it is equal to the exact tier only to
  ~1e-6 relative (pinned in tests), not bit-equal — which is why the
  oracle rides on the relational tier.

PCA itself (:func:`pca_components`, :func:`pca_project`) collects the
d x d covariance (d^2 doubles — driver-tiny at any corpus size), eigen-
decomposes with numpy (deterministic sign fix: largest-|component|
entry made positive), and projects distributed via per-row dot products
against broadcast component literals. Projection is rows-only in the
registry (eigendecomposition is not SQL), pinned against numpy's
reference PCA in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_dims(emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, i, x): one row per vector component, component cast double."""
    return emb.select(
        F.col(id_col),
        F.posexplode(vec_col).alias("i", "_x"),
    ).select(id_col, "i", F.col("_x").cast("double").alias("x"))


def _ordered_sum(order_col: str, val) -> F.Column:
    """Order-pinned double summation: sorted collect + left fold.

    The house decimal-cast trick (plans/registry.py dsum) is exact only
    when values are decimal-SHORT (fixture prices are). float32-derived
    embedding components are binary fractions whose decimal expansion
    routinely ends in ...5 at any fixed scale, and Spark rounds
    double->decimal ties HALF_UP while DuckDB rounds HALF_EVEN — 64 of
    2080 Gram moments flipped by 1e-12 when this used decimal(38,12).
    Folding the doubles in a pinned (id-sorted) order instead gives
    bit-exact cross-engine sums with NO rounding anywhere. Trade-off:
    no map-side combine — fine for the fixture-scale correctness
    anchor; the Arrow partial-Gram tier is the scale path."""
    return F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col(order_col).alias("o"), val.alias("v")))),
            lambda r: r["v"],
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def gram_moments(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bit-exact raw moments per dim pair (i <= j):
    (i, j, n, sum_xy, sum_x, sum_y) — enough to derive Gram, covariance
    and correlation downstream without touching the data again. Sums
    are order-pinned folds (see :func:`_ordered_sum`).

    Contract: ``id_col`` values must be UNIQUE. Each row contributes
    its own per-row products; rows sharing an id would each contribute
    independently (the sensible semantics), whereas the pre-r12
    explode+self-join form cross-multiplied same-id rows — so the two
    forms only agree on unique ids, which every caller guarantees."""
    # r12: the (i, j, x*y) upper triangle is generated PER ROW from the
    # array itself (nested transform, i <= j only) instead of exploding
    # to (id, i, x) and self-joining on the id — same multiset of
    # products (each x_i * x_j computed from the same double-cast
    # elements), so the id-ordered fold below is bit-identical, but the
    # plan drops the join, the broadcast of the exploded table and two
    # of the four scan+explode subtrees (guide §2.4: remove shuffles
    # outright; §3.3: explode before a join multiplies the work).
    dbl = emb.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda v: v.cast("double")).alias("_v"),
    )
    last = F.size("_v") - 1
    tri = F.flatten(
        F.transform(
            F.sequence(F.lit(0), last),
            lambda i: F.transform(
                F.sequence(i, last),
                lambda j: F.struct(
                    i.cast("int").alias("i"),
                    j.cast("int").alias("j"),
                    (F.get("_v", i) * F.get("_v", j)).alias("xy"),
                ),
            ),
        )
    )
    pairs = (
        dbl.filter(F.size("_v") > 0)
        .select(F.col(id_col), F.explode(tri).alias("p"))
        .select(id_col, F.col("p.i").alias("i"), F.col("p.j").alias("j"), F.col("p.xy").alias("xy"))
    )
    m = pairs.groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n"),
        _ordered_sum(id_col, F.col("xy")).alias("sum_xy"),
    )
    dims = explode_dims(emb, id_col, vec_col).groupBy("i").agg(
        _ordered_sum(id_col, F.col("x")).alias("s")
    )
    return (
        m.join(F.broadcast(dims.select(F.col("i"), F.col("s").alias("sum_x"))), "i")
        .join(
            F.broadcast(
                dims.select(F.col("i").alias("j"), F.col("s").alias("sum_y"))
            ),
            "j",
        )
        .select("i", "j", "n", "sum_xy", "sum_x", "sum_y")
    )


def gram_moments_partial(
    emb: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale-path Gram: per-partition numpy X^T X partials, one small
    shuffle of d*(d+1)/2 rows per input partition. Same output schema
    as :func:`gram_moments`; float64 partial sums (not decimal), so
    equality to the exact tier is ~1e-6 relative, not bitwise."""
    import numpy as np
    import pandas as pd

    schema = "i int, j int, n bigint, sum_xy double, sum_x double, sum_y double"

    def kernel(batches):
        for pdf in batches:
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if mat.size == 0:
                continue
            g = mat.T @ mat
            s = mat.sum(axis=0)
            n = mat.shape[0]
            iu, ju = np.triu_indices(dim)
            yield pd.DataFrame(
                {
                    "i": iu,
                    "j": ju,
                    "n": np.full(len(iu), n, dtype=np.int64),
                    "sum_xy": g[iu, ju],
                    "sum_x": s[iu],
                    "sum_y": s[ju],
                }
            )

    partials = emb.select(vec_col).mapInPandas(kernel, schema)
    return partials.groupBy("i", "j").agg(
        F.sum("n").alias("n"),
        F.sum("sum_xy").alias("sum_xy"),
        F.sum("sum_x").alias("sum_x"),
        F.sum("sum_y").alias("sum_y"),
    )


def covariance_from_moments(moments: DataFrame) -> DataFrame:
    """cov(i,j) = (sum_xy - sum_x*sum_y/n) / (n-1), written in one fixed
    association order so the DuckDB oracle reproduces the doubles."""
    return moments.select(
        F.col("i").cast("bigint").alias("i"),
        F.col("j").cast("bigint").alias("j"),
        "n",
        (
            (F.col("sum_xy") - F.col("sum_x") * F.col("sum_y") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("cov"),
    )


def pca_components(
    emb: DataFrame,
    dim: int,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> tuple[list[list[float]], list[float], list[float]]:
    """Top-k principal axes from the distributed covariance.

    Returns (components [k][dim], explained variance [k], mean [dim]).
    Driver-side work is the d x d eigendecomposition only — O(d^3),
    corpus-size independent. ``exact=True`` uses the decimal relational
    Gram (slower, bit-stable); default uses the Arrow partial tier.
    Sign convention: each component's largest-|entry| is made positive,
    so the basis is deterministic up to numerics.
    """
    import numpy as np

    moments = (
        gram_moments(emb, id_col, vec_col)
        if exact
        else gram_moments_partial(emb, dim, id_col, vec_col)
    )
    rows = moments.collect()
    n = rows[0]["n"]
    cov = np.zeros((dim, dim))
    mean = np.zeros(dim)
    for r in rows:
        c = (r["sum_xy"] - r["sum_x"] * r["sum_y"] / n) / (n - 1)
        cov[r["i"], r["j"]] = c
        cov[r["j"], r["i"]] = c
        if r["i"] == r["j"]:
            mean[r["i"]] = r["sum_x"] / n
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        comps.append([float(c) for c in v])
    return comps, [float(vals[i]) for i in order], [float(m) for m in mean]


def pca_project(
    emb: DataFrame,
    components: list[list[float]],
    mean: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project each centered vector onto the component basis: per-row
    dot products against plan-literal axes (the broadcast-codebook
    pattern from the PQ tier — no join, no shuffle, pure codegen)."""
    centered = F.zip_with(
        F.transform(F.col(vec_col), lambda x: x.cast("double")),
        F.array(*[F.lit(m) for m in mean]),
        lambda x, m: x - m,
    )
    cols = [F.col(id_col)]
    for ci, comp in enumerate(components):
        axis = F.array(*[F.lit(c) for c in comp])
        score = F.aggregate(
            F.zip_with(centered, axis, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        cols.append(score.alias(f"pc{ci + 1}"))
    return emb.select(*cols)


def opq_balanced_rotation(
    emb: DataFrame,
    dim: int,
    m: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], list[float]]:
    """OPQ-style variance-balanced rotation for product quantization
    (greedy static form of Ge et al.'s Optimized PQ): compute the full
    PCA basis, then deal the variance-RANKED axes round-robin across
    the m PQ subspaces (axis of rank i -> subspace i mod m), so each
    subspace receives an even share of the corpus variance.

    Why not plain PCA order: sorting axes by variance CONCENTRATES
    energy in the first subspace, which k-means codebooks then
    under-fit — measured on the fixture corpus (m=8, 16 codes,
    PERFORMANCE.md §10): raw 280.5, PCA-sorted 283.4 (worse),
    balanced 265.1 (-5.5% quantization error vs raw). The full
    pipeline is deterministic, so the ordering is pinned in tests.

    Returns (components [dim][dim] in subspace-slot order, mean):
    feed them to :func:`pca_project` and quantize the projected
    vectors. Rotation is orthonormal, so cosine/L2 geometry — and
    therefore exact re-rank scores — are unchanged.
    """
    if dim % m != 0:
        # same contract as pq_cosine_topk: an indivisible dim would
        # make the round-robin perm indices collide (overwritten /
        # defaulted slots -> a silently non-orthonormal "rotation")
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    comps, _, mean = pca_components(emb, dim=dim, k=dim, id_col=id_col, vec_col=vec_col)
    sub = dim // m
    perm = [0] * dim
    slot = [0] * m
    for i in range(dim):
        j = i % m
        perm[j * sub + slot[j]] = i
        slot[j] += 1
    return [comps[perm[p]] for p in range(dim)], mean


def rotate_partial(
    emb: DataFrame,
    components: list[list[float]],
    mean: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-batched rotation (numpy GEMV per row) — the INDEX-BUILD
    path. :func:`pca_project`'s plan-literal fold is the right serving
    shape (pure codegen, composes into any downstream plan), but for a
    build-once rotation of the whole corpus a BLAS kernel per Arrow
    batch is ~d times cheaper than d fold expressions. Per-ROW matvec
    (not one batch GEMM): BLAS GEMM blocking depends on the batch
    SHAPE, so the same vector rotated in different batches could differ
    in the last ulp — which would break the persisted OPQ index's
    append == rebuild bit-equality. A fixed-shape (d x d) @ (d,) matvec
    per row makes every row's rotation independent of batching. Output:
    (id, embedding: array<double>) in the rotated basis. Float64
    matvec vs the fold's sequential sums: equal to ~1e-9 relative
    (pinned), not bitwise."""
    import numpy as np
    import pandas as pd

    comp = np.asarray(components, dtype=np.float64)
    mu = np.asarray(mean, dtype=np.float64)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            proj = [
                comp @ (np.asarray(v, dtype=np.float64) - mu)
                for v in pdf[vec_col]
            ]
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, vec_col: proj}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        kernel, f"{id_col} bigint, {vec_col} array<double>"
    )
