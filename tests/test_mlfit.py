"""Distributed IRLS logistic regression (operators/mlfit.py): pinned
against an independent numpy Newton implementation on the identical
feature projection, plus the determinism and convergence contracts.
"""

from __future__ import annotations

import numpy as np

from ccxt_ohlcv_fetcher_spark.operators.mlfit import (
    doc_lang_features,
    logistic_irls,
)
from ccxt_ohlcv_fetcher_spark.sources.tables import load_table


def _numpy_irls(X, y, max_iter=25, tol=1e-9, ridge=1e-6):
    beta = np.zeros(X.shape[1])
    for it in range(1, max_iter + 1):
        p = 1.0 / (1.0 + np.exp(-X @ beta))
        W = p * (1 - p)
        a = (X * W[:, None]).T @ X + ridge * np.eye(X.shape[1])
        g = X.T @ (y - p)
        delta = np.linalg.solve(a, g)
        beta = beta + delta
        if np.max(np.abs(delta)) < tol:
            return beta, it, True
    return beta, max_iter, False


def test_irls_matches_numpy(spark, sf_dir):
    feats = doc_lang_features(load_table(spark, sf_dir, "documents"))
    fit = logistic_irls(feats, "y", ["x1", "x2"])
    pdf = feats.toPandas()
    X = np.column_stack([np.ones(len(pdf)), pdf.x1, pdf.x2])
    beta_np, it_np, conv_np = _numpy_irls(X, pdf.y.to_numpy().astype(float))
    assert fit["converged"] and conv_np
    for got, want in zip(fit["beta"], beta_np):
        assert abs(got - want) < 1e-6 * max(1.0, abs(want)), (
            fit["beta"],
            beta_np.tolist(),
        )
    # the fit must actually separate better than the null model
    p0 = pdf.y.mean()
    ll_null = len(pdf) * (p0 * np.log(p0) + (1 - p0) * np.log(1 - p0))
    assert fit["log_lik"] > ll_null


def test_irls_bit_deterministic_across_partitionings(spark, sf_dir):
    feats = doc_lang_features(load_table(spark, sf_dir, "documents"))
    a = logistic_irls(feats.repartition(1), "y", ["x1", "x2"])
    b = logistic_irls(feats.repartition(13), "y", ["x1", "x2"])
    assert a["beta"] == b["beta"], "decimal sums must kill order effects"
    assert a["n_iter"] == b["n_iter"] and a["log_lik"] == b["log_lik"]


def test_fit_glm_gaussian_matches_ols_query_and_numpy(spark, sf_dir):
    """fit_glm('gaussian') at 2 features must reproduce the oracled
    lineitem_ols_price_model coefficients (same integer-unit inputs),
    and at 3 features must match numpy lstsq — the width the in-SQL
    Cramer form can't reach."""
    from pyspark.sql import functions as F

    from ccxt_ohlcv_fetcher_spark.operators.mlfit import fit_glm
    from ccxt_ohlcv_fetcher_spark.plans import load_all

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("q"),
        F.round(F.col("l_discount") * 100).alias("d"),
        F.round(F.col("l_tax") * 100).alias("t"),
        F.round(F.col("l_extendedprice") * 100).alias("y"),
        "l_returnflag",
    )
    flag_a = li.filter(F.col("l_returnflag") == "A")
    fit2 = fit_glm(flag_a, "y", ["q", "d"])
    want = {
        r["l_returnflag"]: r
        for r in load_all()["lineitem_ols_price_model"]
        .builder(spark, sf_dir)
        .collect()
    }["A"]
    for got, name in zip(
        fit2["beta"], ("icept_usd", "beta_qty_usd", "beta_disc_usd")
    ):
        assert abs(got / 100 - want[name]) < 1e-4 * max(1, abs(want[name]))
    fit3 = fit_glm(flag_a, "y", ["q", "d", "t"])
    pdf = flag_a.toPandas()
    X = np.column_stack([np.ones(len(pdf)), pdf.q, pdf.d, pdf.t])
    beta, *_ = np.linalg.lstsq(X, pdf.y.to_numpy(), rcond=None)
    for got, want_b in zip(fit3["beta"], beta):
        assert abs(got - want_b) < 1e-5 * max(1.0, abs(want_b))


def test_fit_glm_binomial_equals_logistic_irls(spark, sf_dir):
    from ccxt_ohlcv_fetcher_spark.operators.mlfit import fit_glm

    feats = doc_lang_features(load_table(spark, sf_dir, "documents"))
    a = logistic_irls(feats, "y", ["x1", "x2"])
    b = fit_glm(feats, "y", ["x1", "x2"], family="binomial")
    assert a["n_iter"] == b["n_iter"] and a["converged"] and b["converged"]
    for x, y_ in zip(a["beta"], b["beta"]):
        assert abs(x - y_) < 1e-9 * max(1.0, abs(x))


def _numpy_glm_irls(X, y, family, max_iter=25, tol=1e-9, ridge=1e-6):
    """Independent IRLS with the SAME link formulas the Spark side
    documents (incl. the A&S 7.1.26 erf for probit) — pins the
    distributed aggregation, which is what the operator claims."""

    def erf(x):
        p, a = 0.3275911, (
            0.254829592, -0.284496736, 1.421413741,
            -1.453152027, 1.061405429,
        )
        ax = np.abs(x)
        t = 1.0 / (1.0 + p * ax)
        poly = a[4]
        for c in reversed(a[:4]):
            poly = poly * t + c
        return np.sign(x) * (1.0 - poly * t * np.exp(-ax * ax))

    beta = np.zeros(X.shape[1])
    if family == "poisson":
        beta[0] = np.log(max(y.mean(), 1e-12))
    for it in range(1, max_iter + 1):
        z = X @ beta
        if family == "binomial":
            pr = 1.0 / (1.0 + np.exp(-z))
            w, r = pr * (1 - pr), y - pr
        elif family == "poisson":
            mu = np.exp(np.clip(z, -20.0, 20.0))
            w, r = mu, y - mu
        else:  # probit
            pr = 0.5 * (1.0 + erf(z * 0.7071067811865476))
            d = 0.3989422804014327 * np.exp(-0.5 * z * z)
            v = np.maximum(pr * (1 - pr), 1e-12)
            w, r = d * d / v, (y - pr) * d / v
        a = (X * w[:, None]).T @ X + ridge * np.eye(X.shape[1])
        delta = np.linalg.solve(a, X.T @ r)
        beta = beta + delta
        if np.max(np.abs(delta)) < tol:
            return beta, it, True
    return beta, max_iter, False


def _cust_count_feats(spark, sf_dir):
    from pyspark.sql import functions as F

    cust = load_table(spark, sf_dir, "customer")
    cnt = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return cust.join(
        cnt, cust["c_custkey"] == cnt["o_custkey"], "left"
    ).select(
        F.coalesce("n_orders", F.lit(0)).cast("double").alias("y"),
        (F.col("c_acctbal") / 1000.0).alias("x1"),
        (F.col("c_mktsegment") == "BUILDING").cast("double").alias("x2"),
        (F.col("c_nationkey") / 10.0).alias("x3"),
    )


def test_fit_glm_poisson_matches_numpy_2_and_3_features(spark, sf_dir):
    from ccxt_ohlcv_fetcher_spark.operators.mlfit import fit_glm

    feats = _cust_count_feats(spark, sf_dir)
    pdf = feats.toPandas()
    y = pdf.y.to_numpy()
    for cols in (["x1", "x2"], ["x1", "x2", "x3"]):
        fit = fit_glm(feats, "y", cols, family="poisson")
        X = np.column_stack(
            [np.ones(len(pdf))] + [pdf[c].to_numpy() for c in cols]
        )
        beta_np, it_np, conv_np = _numpy_glm_irls(X, y, "poisson")
        assert fit["converged"] and conv_np
        for got, want in zip(fit["beta"], beta_np):
            assert abs(got - want) < 1e-6 * max(1.0, abs(want)), (
                cols, fit["beta"], beta_np.tolist(),
            )
    # the count model must see a positive mean rate: intercept near
    # ln(mean orders per customer), materially > 0
    assert fit["beta"][0] > 0.5


def test_fit_glm_probit_matches_numpy(spark, sf_dir):
    from ccxt_ohlcv_fetcher_spark.operators.mlfit import fit_glm

    feats = doc_lang_features(load_table(spark, sf_dir, "documents"))
    fit = fit_glm(feats, "y", ["x1", "x2"], family="probit")
    pdf = feats.dropna().toPandas()
    X = np.column_stack([np.ones(len(pdf)), pdf.x1, pdf.x2])
    beta_np, it_np, conv_np = _numpy_glm_irls(
        X, pdf.y.to_numpy().astype(float), "probit"
    )
    assert fit["converged"] and conv_np
    for got, want in zip(fit["beta"], beta_np):
        assert abs(got - want) < 1e-6 * max(1.0, abs(want)), (
            fit["beta"], beta_np.tolist(),
        )
    # probit and logit agree on direction (scaled ~1.6x apart)
    logit = logistic_irls(feats, "y", ["x1", "x2"])
    assert np.sign(fit["beta"][1]) == np.sign(logit["beta"][1])


def test_glm_skips_null_and_nonfinite_feature_rows(spark, sf_dir):
    """A null/NaN feature row (e.g. ln(0) from an empty doc) must be
    complete-case-filtered — previously it was skipped by the x-sums
    but still counted by s00/count, silently skewing the fit."""
    from pyspark.sql import functions as F

    from ccxt_ohlcv_fetcher_spark.operators.mlfit import fit_glm

    feats = doc_lang_features(load_table(spark, sf_dir, "documents"))
    poisoned = feats.unionByName(
        spark.createDataFrame(
            [(1, None, 4.0), (0, float("nan"), 4.0),
             (1, float("inf"), 4.0)],
            "y int, x1 double, x2 double",
        )
    )
    clean = logistic_irls(feats, "y", ["x1", "x2"])
    noisy = logistic_irls(poisoned, "y", ["x1", "x2"])
    assert clean["beta"] == noisy["beta"]
    assert clean["n"] == noisy["n"]
    g_clean = fit_glm(feats, "y", ["x1", "x2"], family="binomial")
    g_noisy = fit_glm(poisoned, "y", ["x1", "x2"], family="binomial")
    assert g_clean["beta"] == g_noisy["beta"]


def test_glm_empty_input_raises(spark):
    import pytest
    from pyspark.sql import functions as F

    from ccxt_ohlcv_fetcher_spark.operators.mlfit import fit_glm

    empty = spark.createDataFrame([], "y double, x1 double, x2 double")
    with pytest.raises(ValueError, match="no finite-featured rows"):
        logistic_irls(empty, "y", ["x1", "x2"])
    with pytest.raises(ValueError, match="no finite-featured rows"):
        fit_glm(empty, "y", ["x1", "x2"], family="poisson")
    with pytest.raises(ValueError, match="no finite-featured rows"):
        fit_glm(empty, "y", ["x1", "x2"], family="gaussian")


def test_fit_glm_poisson_wide_feature_magnitudes(spark):
    """Review r10: poisson sums widened to DECIMAL(38,9) — at (28,14)
    a clamped mu (~1e13) times x_i*x_j overflowed the per-row cast to
    NULL, silently dropping terms from the sums. Fit a count model
    with feature magnitudes up to ~50 and verify against the
    same-formula numpy IRLS."""
    import math

    rows = []
    for i in range(400):
        x = (i % 100) / 2.0  # 0..49.5
        lam = math.exp(0.3 + 0.04 * x)
        # deterministic pseudo-counts around lam
        rows.append((float(int(lam + (i % 7) - 3) if lam > 3 else 1), x))
    df = spark.createDataFrame(rows, "y double, x double")
    from ccxt_ohlcv_fetcher_spark.operators.mlfit import fit_glm

    pdf = df.toPandas()
    X = np.column_stack([np.ones(len(pdf)), pdf.x])
    fit1 = fit_glm(df, "y", ["x"], family="poisson")
    beta_np, it_np, conv_np = _numpy_glm_irls(
        X, pdf.y.to_numpy(), "poisson"
    )
    assert fit1["converged"] and conv_np
    for got, want in zip(fit1["beta"], beta_np):
        assert abs(got - want) < 1e-6 * max(1.0, abs(want)), (
            fit1["beta"], beta_np.tolist(),
        )


def test_glm_statistic_overflow_raises_loud(spark):
    """Review r10: a sum that saturates DECIMAL(38,12) (huge feature
    or label magnitudes x enough rows) must raise the
    standardize-your-features ValueError — never solve a garbage
    system or crash with a bare TypeError (incl. the poisson
    warm-start mean, which is computed before the Newton loop)."""
    import pytest

    from ccxt_ohlcv_fetcher_spark.operators.mlfit import fit_glm

    huge_y = spark.createDataFrame(
        [(1e25, float(i % 7)) for i in range(200)], "y double, x double"
    )
    with pytest.raises(ValueError, match="standardize"):
        fit_glm(huge_y, "y", ["x"], family="poisson")
    with pytest.raises(ValueError, match="standardize"):
        fit_glm(huge_y, "y", ["x"], family="gaussian")
    huge_x = spark.createDataFrame(
        [(float(i % 2), 1e14) for i in range(200)], "y double, x double"
    )
    with pytest.raises(ValueError, match="standardize"):
        fit_glm(huge_x, "y", ["x"], family="gaussian")
