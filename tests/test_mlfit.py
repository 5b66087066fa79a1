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
