"""Distributed linear decomposition over embedding columns.

The reference engine has no embedding operators; this extends the
engine's broadcast-partials pattern (see stages/cluster.py k-means,
stages/sketch.py) to exact PCA — the standard dimensionality-reduction
preprocessing step before clustering / ANN / SemDeDup in a training-
data pipeline.

Scale shape: the sufficient statistics of PCA are (n, Σx, ΣxxT) —
O(d²) doubles PER TASK regardless of corpus size (d=64 → 32 KB). Each
map task reduces its batches to one partial; the driver sums P partials
and eigendecomposes a d×d matrix; the k component vectors broadcast via
``ray.put`` and the projection pass is map-only. The corpus never
shuffles and never materializes.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data import Dataset


def _vecs(t: pa.Table, col: str) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> column, zero-copy flatten."""
    arr = t.column(col).combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    d = len(flat) // len(t) if len(t) else 0
    return flat.reshape(len(t), d)


def pca_fit(ds: Dataset, vec_col: str = "embedding", k: int = 8):
    """Exact PCA fit via distributed sufficient statistics.

    Returns ``(mean (d,), components (d, k), eigvals (k,), total_var)``.
    Components carry a deterministic sign (the largest-|coefficient|
    entry of each eigenvector is positive), so output is stable across
    runs and partitionings up to float summation order.
    """

    def _partial(t: pa.Table) -> pa.Table:
        x = _vecs(t, vec_col)
        d = x.shape[1]
        s = x.sum(axis=0)
        ss = x.T @ x  # (d, d) — one BLAS call per batch
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sum": pa.array([s.tolist()]),
            "ss": pa.array([ss.reshape(-1).tolist()]),
        })

    n_total = 0
    s_total = None
    ss_total = None
    for b in ds.select_columns([vec_col]).map_batches(
            _partial, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for i in range(len(b)):
            n_total += b.column("n")[i].as_py()
            s = np.asarray(b.column("sum")[i].as_py())
            ss = np.asarray(b.column("ss")[i].as_py())
            s_total = s if s_total is None else s_total + s
            ss_total = ss if ss_total is None else ss_total + ss
    if not n_total:
        raise ValueError("pca_fit: empty dataset")
    d = len(s_total)
    mean = s_total / n_total
    cov = (ss_total.reshape(d, d) - n_total * np.outer(mean, mean)) / max(n_total - 1, 1)
    cov = (cov + cov.T) / 2.0  # enforce symmetry against float drift
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    vals = eigvals[order]
    comps = eigvecs[:, order]
    # Deterministic sign: largest-|coefficient| entry positive.
    flip = comps[np.abs(comps).argmax(axis=0), np.arange(comps.shape[1])] < 0
    comps[:, flip] *= -1.0
    return mean, comps, vals, float(np.trace(cov))


def pca_project(
    ds: Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    round_digits: Optional[int] = 6,
) -> Dataset:
    """Project every vector onto the corpus's top-``k`` principal
    components: one statistics pass (:func:`pca_fit`), then a map-only
    projection against the broadcast ``(mean, components)``.

    Output: ``(id_col, pc0..pc{k-1})``.
    """
    mean, comps, _, _ = pca_fit(ds, vec_col=vec_col, k=k)
    state_ref = ray.put((mean, comps))

    def _project(t: pa.Table) -> pa.Table:
        from kgray.kernels.hashagg import stable_round

        m, w = ray.get(state_ref) if isinstance(state_ref, ray.ObjectRef) else state_ref
        x = _vecs(t, vec_col)
        proj = (x - m) @ w
        cols = {id_col: t.column(id_col)}
        for j in range(proj.shape[1]):
            col = pa.array(proj[:, j], type=pa.float64())
            cols[f"pc{j}"] = stable_round(col, round_digits) if round_digits else col
        return pa.table(cols)

    return ds.select_columns([id_col, vec_col]).map_batches(
        _project, batch_format="pyarrow")
