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
