"""k-means: recovery of planted clusters, determinism, inertia monotonicity."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from kgray.stages.cluster import kmeans


def _planted(n_per=40, k=5, d=16, spread=0.05):
    rng = np.random.RandomState(3)
    centers = rng.randn(k, d) * 3
    rows = []
    for c in range(k):
        for i in range(n_per):
            rows.append({
                "vec_id": c * n_per + i,
                "embedding": (centers[c] + rng.randn(d) * spread).tolist(),
                "label": c,
            })
    return rows


def test_kmeans_recovers_planted_clusters(ray_session):
    rows = _planted()
    ds = ray.data.from_items(rows)
    assign, cents, hist = kmeans(ds, k=5, max_iters=15)
    df = assign.to_pandas().merge(pd.DataFrame(rows)[["vec_id", "label"]], on="vec_id")
    # Majority-label purity: each cluster should be one planted label.
    purity = df.groupby("cluster")["label"].agg(
        lambda s: s.value_counts().iloc[0]
    ).sum() / len(df)
    assert purity == 1.0
    assert all(b <= a * (1 + 1e-6) for a, b in zip(hist, hist[1:]))  # monotone
    assert cents.shape == (5, 16)


def test_kmeans_deterministic(ray_session):
    rows = _planted(n_per=20, k=3, d=8)
    a1, c1, h1 = kmeans(ray.data.from_items(rows), k=3, max_iters=10)
    a2, c2, h2 = kmeans(ray.data.from_items(rows), k=3, max_iters=10)
    assert np.allclose(c1, c2) and h1 == h2
    pd.testing.assert_frame_equal(
        a1.to_pandas().sort_values("vec_id").reset_index(drop=True),
        a2.to_pandas().sort_values("vec_id").reset_index(drop=True),
    )


def test_kmeans_k_too_large_raises(ray_session):
    rows = _planted(n_per=1, k=2, d=4)
    with pytest.raises(ValueError):
        kmeans(ray.data.from_items(rows), k=10)
