"""Distributed generalized-linear fitting by aggregation: logistic
regression via iteratively reweighted least squares (IRLS / Newton).

Completes the in-engine ML family (k-means in plans/llm.py, PageRank in
plans/analytics.py, OLS in plans/breadth.py) with the CLASSIFIER class
every training-data pipeline eventually needs (quality scoring, filter
models): each Newton iteration is ONE aggregation job producing the
p-weighted normal equations — sufficient statistics, exactly like the
OLS query — and a driver-side 3x3 solve. No collect of data, no UDF,
no per-row Python; the table can be 100 TB and an iteration still
shuffles only (features+1)^2 numbers per partition.

Determinism: every per-row term is cast to DECIMAL(28,14) before SUM,
so the partial/final aggregation is associative and the fitted
coefficients are bit-identical run to run (a raw double sum varies in
the last bits with partitioning, which would make the registered
query's output flap). The sigmoid/log terms themselves are plain IEEE
libm calls evaluated per row — identical within an engine, pinned
against an independent numpy IRLS to 1e-6 in tests/test_mlfit.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _solve3(a: list[list[float]], b: list[float]) -> list[float]:
    """Cramer's-rule solve for the 3x3 Newton system (driver-side,
    nanoseconds — the data never leaves the cluster)."""

    def det3(m):
        return (
            m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
            - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
            + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
        )

    d = det3(a)
    out = []
    for i in range(3):
        m = [row[:] for row in a]
        for r in range(3):
            m[r][i] = b[r]
        out.append(det3(m) / d)
    return out


def logistic_irls(
    df: DataFrame,
    label_col: str,
    feature_cols: list[str],
    max_iter: int = 25,
    tol: float = 1e-9,
    ridge: float = 1e-6,
) -> dict:
    """Fit P(label=1) = sigmoid(b0 + b1*x1 + b2*x2) by Newton-Raphson.

    Exactly two features (3x3 system) — the shape the in-SQL Cramer
    solve keeps readable; the sufficient-statistic pattern extends to
    any width with a driver-side numpy solve. Returns
    {beta, n_iter, converged, log_lik, n}."""
    if len(feature_cols) != 2:
        raise ValueError("logistic_irls fits exactly 2 features + intercept")
    x1, x2 = feature_cols
    y = F.col(label_col).cast("double")
    beta = [0.0, 0.0, 0.0]
    dsum14 = lambda c: F.sum(c.cast("decimal(28,14)")).cast(  # noqa: E731
        "double"
    )
    n_iter, converged, log_lik, n_rows = 0, False, float("nan"), 0
    for n_iter in range(1, max_iter + 1):
        z = (
            F.lit(beta[0])
            + F.lit(beta[1]) * F.col(x1)
            + F.lit(beta[2]) * F.col(x2)
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        w = p * (F.lit(1.0) - p)
        r = y - p
        xs = [F.lit(1.0), F.col(x1).cast("double"), F.col(x2).cast("double")]
        aggs = []
        for i in range(3):
            for j in range(i, 3):
                aggs.append(dsum14(w * xs[i] * xs[j]).alias(f"s{i}{j}"))
        for i in range(3):
            aggs.append(dsum14(r * xs[i]).alias(f"g{i}"))
        aggs.append(
            dsum14(
                y * F.log(F.greatest(p, F.lit(1e-300)))
                + (F.lit(1.0) - y)
                * F.log(F.greatest(F.lit(1.0) - p, F.lit(1e-300)))
            ).alias("ll")
        )
        aggs.append(F.count(F.lit(1)).alias("n"))
        row = df.agg(*aggs).collect()[0]
        a = [[0.0] * 3 for _ in range(3)]
        for i in range(3):
            for j in range(i, 3):
                a[i][j] = a[j][i] = row[f"s{i}{j}"]
            a[i][i] += ridge
        delta = _solve3(a, [row[f"g{i}"] for i in range(3)])
        beta = [b + d for b, d in zip(beta, delta)]
        log_lik, n_rows = row["ll"], row["n"]
        if max(abs(d) for d in delta) < tol:
            converged = True
            break
    return {
        "beta": beta,
        "n_iter": n_iter,
        "converged": converged,
        "log_lik": log_lik,
        "n": n_rows,
    }


def doc_lang_features(docs: DataFrame) -> DataFrame:
    """The feature/label projection shared by the registered query and
    the numpy pin: y = (lang = 'en'), x1 = ln(n_chars), x2 = mean token
    length over single-space tokenization."""
    return docs.select(
        (F.col("lang") == "en").cast("int").alias("y"),
        F.log(F.col("n_chars").cast("double")).alias("x1"),
        (
            F.length("text").cast("double")
            / F.size(F.split(F.col("text"), " "))
        ).alias("x2"),
    )


def fit_glm(
    df: DataFrame,
    label_col: str,
    feature_cols: list[str],
    family: str = "gaussian",
    max_iter: int = 25,
    tol: float = 1e-9,
    ridge: float = 1e-6,
) -> dict:
    """Width-general GLM fit by sufficient-statistic aggregation:
    ``gaussian`` (identity link — one pass, the OLS normal equations)
    or ``binomial`` (logit link — IRLS, one aggregation per Newton
    step). Any feature width: the driver solves a (k+1)x(k+1) system
    with numpy per step while the cluster only ever shuffles
    O(k^2) numbers per partition — the same shape at 2 features or
    200, at 1 GB or 100 TB.

    Same determinism contract as :func:`logistic_irls`: every per-row
    term is summed as DECIMAL(28,14), so coefficients are
    bit-identical across partitionings. Returns
    {beta, n_iter, converged, n} (gaussian: n_iter=1, converged=True).
    """
    import numpy as np

    if family not in ("gaussian", "binomial"):
        raise ValueError(f"unsupported family {family!r}")
    k = len(feature_cols) + 1
    y = F.col(label_col).cast("double")
    xs = [F.lit(1.0)] + [F.col(c).cast("double") for c in feature_cols]
    dsum14 = lambda c: F.sum(c.cast("decimal(28,14)")).cast(  # noqa: E731
        "double"
    )

    def newton_stats(w, r):
        aggs = []
        for i in range(k):
            for j in range(i, k):
                aggs.append(dsum14(w * xs[i] * xs[j]).alias(f"s{i}{j}"))
        for i in range(k):
            aggs.append(dsum14(r * xs[i]).alias(f"g{i}"))
        aggs.append(F.count(F.lit(1)).alias("n"))
        row = df.agg(*aggs).collect()[0]
        a = np.zeros((k, k))
        for i in range(k):
            for j in range(i, k):
                a[i, j] = a[j, i] = row[f"s{i}{j}"]
        a += ridge * np.eye(k)
        g = np.array([row[f"g{i}"] for i in range(k)])
        return a, g, row["n"]

    if family == "gaussian":
        a, g, n = newton_stats(F.lit(1.0), y)
        beta = np.linalg.solve(a, g)
        return {
            "beta": [float(b) for b in beta],
            "n_iter": 1,
            "converged": True,
            "n": n,
        }
    beta = np.zeros(k)
    n_iter, converged, n = 0, False, 0
    for n_iter in range(1, max_iter + 1):
        z = xs[0] * F.lit(float(beta[0]))
        for bi, xc in zip(beta[1:], xs[1:]):
            z = z + F.lit(float(bi)) * xc
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        a, g, n = newton_stats(p * (F.lit(1.0) - p), y - p)
        delta = np.linalg.solve(a, g)
        beta = beta + delta
        if float(np.max(np.abs(delta))) < tol:
            converged = True
            break
    return {
        "beta": [float(b) for b in beta],
        "n_iter": n_iter,
        "converged": converged,
        "n": n,
    }
