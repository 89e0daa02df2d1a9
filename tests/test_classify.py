"""Distributed IRLS logistic regression vs the single-node numpy
reference, plus scoring-pass semantics."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from kgray.stages.classify import (logistic_regression,
                                   logistic_regression_reference,
                                   logistic_score)


def _synthetic(n=4000, seed=3):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, 3)
    true_w = np.array([2.0, -1.0, 0.5])
    z = X @ true_w + 0.3 + rng.logistic(0, 1, n) * 0.5
    y = (z > 0).astype(np.float64)
    return X, y


def test_logreg_matches_reference(ray_session):
    X, y = _synthetic()
    df = pd.DataFrame({"f0": X[:, 0], "f1": X[:, 1], "f2": X[:, 2], "y": y})
    ds = ray.data.from_pandas(df).repartition(6)
    fit = logistic_regression(ds, ["f0", "f1", "f2"], "y", iters=8)
    ref = logistic_regression_reference(X, y, iters=8)
    assert np.allclose(fit["weights"], ref, atol=1e-6), (fit["weights"], ref)
    # loss decreases monotonically (Newton on a convex objective)
    h = fit["history"]
    assert all(h[i + 1] <= h[i] + 1e-9 for i in range(len(h) - 1))
    assert fit["n"] == len(y)


def test_logreg_separable_accuracy_and_scoring(ray_session):
    rng = np.random.RandomState(9)
    X = rng.randn(1500, 2)
    y = (X[:, 0] + 2 * X[:, 1] > 0).astype(np.float64)  # separable
    df = pd.DataFrame({"a": X[:, 0], "b": X[:, 1], "y": y,
                       "doc_id": range(len(y))})
    ds = ray.data.from_pandas(df).repartition(4)
    fit = logistic_regression(ds, ["a", "b"], "y", iters=10, l2=1e-3)
    scored = logistic_score(ds, fit["weights"], ["a", "b"]).to_pandas()
    scored = scored.sort_values("doc_id").reset_index(drop=True)
    pred = (scored["score"].to_numpy() >= 0.5).astype(np.float64)
    acc = float((pred == y).mean())
    assert acc >= 0.99, acc
    assert scored["score"].between(0, 1).all()


def test_logreg_l2_keeps_separable_hessian_sane(ray_session):
    # perfectly separable 1-D data: without ridge the weights diverge;
    # with it the solve stays finite for every iteration
    x = np.concatenate([np.full(50, -1.0), np.full(50, 1.0)])
    y = (x > 0).astype(np.float64)
    ds = ray.data.from_pandas(pd.DataFrame({"x": x, "y": y}))
    fit = logistic_regression(ds, ["x"], "y", iters=12, l2=1e-2)
    assert np.isfinite(fit["weights"]).all()
    assert fit["weights"][0] > 0
