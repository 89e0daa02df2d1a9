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


def test_semantic_dedup_collapses_planted_dups(ray_session):
    from kgray.stages.cluster import semantic_dedup

    # spread=0.6 keeps natural within-cluster cosines ≈0.97 — clearly
    # below threshold — while planted rescaled copies are exactly 1.0;
    # the tight default spread (0.05) makes whole clusters mutual
    # near-dups at 0.999 and the planted structure unobservable.
    rows = _planted(n_per=30, k=4, d=8, spread=0.6)
    # Plant exact-direction duplicates: every 3rd vector rescaled ×5
    # under id+1000 (cosine 1.0 with its source after normalization).
    dups = [
        {"vec_id": r["vec_id"] + 1000,
         "embedding": [x * 5.0 for x in r["embedding"]], "label": r["label"]}
        for r in rows if r["vec_id"] % 3 == 0
    ]
    ds = ray.data.from_items(rows + dups)
    surv = semantic_dedup(ds, k=4, threshold=0.999)
    ids = set(surv.to_pandas()["vec_id"])
    planted = {r["vec_id"] for r in rows if r["vec_id"] % 3 == 0}
    # Each planted pair keeps exactly its min id (the original).
    assert all(i in ids and i + 1000 not in ids for i in planted)
    # Non-duplicated rows all survive unless they are natural near-dups
    # of one another — spread 0.05 makes that possible, so only check
    # the planted structure plus no-pair-survives.
    assert len(ids) <= len(rows)


def test_semantic_dedup_transitive(ray_session):
    """A chain a~b~c (a·b, b·c ≥ t but a·c < t) is ONE component —
    survivors keep only the min id, matching the recursive-CTE oracle."""
    import numpy as np
    from kgray.stages.cluster import semantic_dedup

    base = np.array([1.0, 0.0, 0.0, 0.0])
    rot = np.array([np.cos(0.1), np.sin(0.1), 0.0, 0.0])
    rot2 = np.array([np.cos(0.2), np.sin(0.2), 0.0, 0.0])
    far = np.array([0.0, 0.0, 1.0, 0.0])
    rows = [
        {"vec_id": 0, "embedding": base.tolist()},
        {"vec_id": 1, "embedding": rot.tolist()},
        {"vec_id": 2, "embedding": rot2.tolist()},
        {"vec_id": 3, "embedding": far.tolist()},
        {"vec_id": 4, "embedding": (-far).tolist()},
    ]
    # cos(0.1)≈0.995 ≥ t; cos(0.2)≈0.980 < t=0.99 → chain via 1.
    surv = semantic_dedup(
        ray.data.from_items(rows), k=2, threshold=0.99, max_iters=5
    )
    assert sorted(surv.to_pandas()["vec_id"]) == [0, 3, 4]
