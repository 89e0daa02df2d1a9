"""Distributed linear classification: logistic regression trained with
Newton–Raphson (IRLS) over algebraic partials — the "train a quality
filter" operator every curation pipeline eventually needs (fastText-
style quality classifiers, contamination detectors, language
discriminators) expressed Ray-Data-first.

Scale shape (the same contract as k-means / PCA / grouped_linear_fit):
each Newton iteration is ONE ``map_batches`` pass; every batch emits a
constant-size partial ``(gradient dR^d, Hessian dR^{d×d}, loss, n)``
computed by dense numpy kernels, partials SUM on the driver (O(d²)
floats per batch — no shuffle, the corpus never moves), and the driver
solves one d×d system. d is the FEATURE count (tens), not the corpus —
at 100 TB the pass is embarrassingly parallel and the driver state is
kilobytes. Newton converges in ≈6–10 iterations on logistic loss, so
the whole fit costs a handful of corpus passes.

Determinism: partials are float64 and the fold is a sum over blocks —
bit-order across blocks can vary run to run, so asserts are
tolerance-based (loss decrease, gradient norm), never bit-exact.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data import Dataset


def _design(t: pa.Table, feature_cols: Sequence[str], label_col: str):
    X = np.column_stack(
        [t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
         for c in feature_cols]
        + [np.ones(len(t), np.float64)]  # intercept
    )
    y = t.column(label_col).to_numpy(zero_copy_only=False).astype(np.float64)
    return X, y


def logistic_regression(
    ds: Dataset,
    feature_cols: Sequence[str],
    label_col: str,
    iters: int = 10,
    l2: float = 1e-6,
    tol: float = 1e-8,
) -> Dict[str, object]:
    """Fit ``P(y=1|x) = σ(w·x + b)`` by distributed IRLS.

    Returns ``{"weights": np.ndarray (d+1, intercept last), "history":
    [loss per iteration], "n": rows}``. ``l2`` is a ridge term on the
    weights (not the intercept) keeping the Hessian invertible on
    separable data.
    """
    feature_cols = list(feature_cols)
    d = len(feature_cols) + 1
    w = np.zeros(d, np.float64)
    pruned = ds.select_columns(feature_cols + [label_col])
    reg = np.eye(d) * l2
    reg[-1, -1] = 0.0  # do not shrink the intercept

    history: List[float] = []
    n_total = 0
    for _ in range(iters):
        wref = ray.put(w)

        def _partial(t: pa.Table) -> pa.Table:
            ww = ray.get(wref) if isinstance(wref, ray.ObjectRef) else wref
            X, y = _design(t, feature_cols, label_col)
            z = X @ ww
            # numerically stable σ and log-loss
            p = 0.5 * (1.0 + np.tanh(0.5 * z))
            loss = float(np.sum(np.logaddexp(0.0, z) - y * z))
            g = X.T @ (p - y)
            r = np.maximum(p * (1.0 - p), 1e-12)
            H = (X * r[:, None]).T @ X
            return pa.table({
                "g": pa.array([g.tolist()]),
                "h": pa.array([H.reshape(-1).tolist()]),
                "loss": pa.array([loss]),
                "n": pa.array([len(y)], pa.int64()),
            })

        g = np.zeros(d)
        H = np.zeros((d, d))
        loss = 0.0
        n_total = 0
        for b in pruned.map_batches(_partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            for gi, hi, li, ni in zip(b.column("g").to_pylist(),
                                      b.column("h").to_pylist(),
                                      b.column("loss").to_pylist(),
                                      b.column("n").to_pylist()):
                g += np.asarray(gi)
                H += np.asarray(hi).reshape(d, d)
                loss += li
                n_total += ni
        loss += 0.5 * l2 * float(w[:-1] @ w[:-1])
        g += reg @ w
        history.append(loss)
        step = np.linalg.solve(H + reg, g)
        w = w - step
        if float(np.abs(g).max()) < tol * max(1, n_total):
            break
    return {"weights": w, "history": history, "n": n_total}


def logistic_score(
    ds: Dataset,
    weights: np.ndarray,
    feature_cols: Sequence[str],
    out_col: str = "score",
) -> Dataset:
    """Map-only scoring pass: append ``σ(w·x + b)`` (float64). The
    weight vector broadcasts in the task closure — O(d) bytes."""
    feature_cols = list(feature_cols)
    w = np.asarray(weights, np.float64)

    def _score(t: pa.Table) -> pa.Table:
        X = np.column_stack(
            [t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
             for c in feature_cols]
            + [np.ones(len(t), np.float64)]
        )
        p = 0.5 * (1.0 + np.tanh(0.5 * (X @ w)))
        return t.append_column(out_col, pa.array(p, type=pa.float64()))

    return ds.map_batches(_score, batch_format="pyarrow")


def logistic_regression_reference(X: np.ndarray, y: np.ndarray,
                                  iters: int = 10, l2: float = 1e-6):
    """Single-node numpy IRLS on a dense matrix — the pytest ground
    truth (same update rule, same stabilized kernels)."""
    X = np.column_stack([X, np.ones(len(X))])
    d = X.shape[1]
    w = np.zeros(d)
    reg = np.eye(d) * l2
    reg[-1, -1] = 0.0
    for _ in range(iters):
        z = X @ w
        p = 0.5 * (1.0 + np.tanh(0.5 * z))
        g = X.T @ (p - y) + reg @ w
        r = np.maximum(p * (1.0 - p), 1e-12)
        H = (X * r[:, None]).T @ X
        w = w - np.linalg.solve(H + reg, g)
    return w
