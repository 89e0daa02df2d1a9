"""Distributed PCA: sufficient-statistic partials must reproduce exact
numpy PCA, and the projection must satisfy the PCA invariants."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from kgray.stages.decomp import pca_fit, pca_project


def _toy(n=300, d=12, seed=7):
    rng = np.random.default_rng(seed)
    # Anisotropic cloud so eigenvalues are well separated.
    scales = np.linspace(5.0, 0.1, d)
    x = rng.normal(size=(n, d)) * scales + rng.normal(size=d)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [r.astype(np.float32).tolist() for r in x],
    })


def test_pca_fit_matches_numpy(ray_session):
    df = _toy()
    ds = ray.data.from_pandas(df).repartition(5)
    mean, comps, vals, total = pca_fit(ds, k=4)

    x = np.array([np.asarray(v, np.float64) for v in df["embedding"]])
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=1e-9, atol=1e-9)
    cov = np.cov(x, rowvar=False)
    ev, evec = np.linalg.eigh(cov)
    order = np.argsort(ev)[::-1][:4]
    np.testing.assert_allclose(vals, ev[order], rtol=1e-8)
    np.testing.assert_allclose(total, np.trace(cov), rtol=1e-9)
    # Same subspace regardless of sign: |cos| of matched vectors = 1.
    ref = evec[:, order]
    cos = np.abs((comps * ref).sum(axis=0))
    np.testing.assert_allclose(cos, 1.0, atol=1e-8)


def test_pca_project_invariants(ray_session):
    ds = ray.data.from_pandas(_toy()).repartition(4)
    out = pca_project(ds, k=3, round_digits=None).to_pandas()
    proj = out[["pc0", "pc1", "pc2"]].to_numpy()
    _, _, vals, _ = pca_fit(ds, k=3)
    cov = np.cov(proj, rowvar=False)
    # Projections decorrelated with variances = top eigenvalues.
    np.testing.assert_allclose(cov, np.diag(vals), atol=vals.max() * 1e-8)
