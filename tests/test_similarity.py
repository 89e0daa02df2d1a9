import numpy as np
import pyarrow as pa
import ray.data

from kgray.stages.similarity import ann_topk_bruteforce, ann_topk_lsh, lsh_bucketed_near_dup


def _corpus(n=300, dim=32, seed=3):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dim)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], type=pa.list_(pa.float32())),
        }
    )
    return t, vecs


def _exact_topk(vecs, q, k):
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = qn @ vn.T
    out = {}
    for qi in range(q.shape[0]):
        order = sorted(range(vecs.shape[0]), key=lambda j: (-sims[qi, j], j))[:k]
        out[qi] = order
    return out


def test_ann_bruteforce_matches_numpy(ray_session):
    t, vecs = _corpus()
    # float32 storage: compute the oracle from the same float32 values
    vecs32 = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    q = vecs[:5]
    ds = ray.data.from_arrow(t)
    got = ann_topk_bruteforce(ds, q, k=10).take_all()
    expected = _exact_topk(vecs32, np.asarray(q, dtype=np.float64), 10)
    for qi in range(5):
        rows = sorted((r for r in got if r["q_id"] == qi), key=lambda r: r["rank"])
        assert [r["vec_id"] for r in rows] == expected[qi]


def test_ann_lsh_recall(ray_session):
    t, vecs = _corpus()
    vecs32 = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    q = vecs[:5]
    ds = ray.data.from_arrow(t)
    got = ann_topk_lsh(ds, q, k=10, n_bits=4, n_tables=8).take_all()
    expected = _exact_topk(vecs32, np.asarray(q, dtype=np.float64), 10)
    recalls = []
    for qi in range(5):
        rows = {r["vec_id"] for r in got if r["q_id"] == qi}
        recalls.append(len(rows & set(expected[qi])) / 10)
    # Random gaussian corpus = worst case for LSH (neighbors barely
    # closer than noise); 4-bit × 8 tables gives ~0.8 expected recall.
    assert sum(recalls) / len(recalls) >= 0.6


def test_lsh_bucketed_near_dup(ray_session):
    rng = np.random.RandomState(5)
    vecs = rng.randn(50, 16)
    all_vecs = np.vstack([vecs, vecs * 3.0])
    ids = list(range(50)) + [i + 100000 for i in range(50)]
    t = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array([v.tolist() for v in all_vecs], type=pa.list_(pa.float32())),
        }
    )
    pairs = lsh_bucketed_near_dup(ray.data.from_arrow(t), threshold=0.999, n_bits=6, n_tables=8).take_all()
    got = sorted((r["id_a"], r["id_b"]) for r in pairs)
    # identical directions always share every bucket → full recall here
    assert got == [(i, i + 100000) for i in range(50)]


def test_ann_ivf_recall(ray_session):
    """IVF probe covers the true neighbors: with n_probe = n_cells the
    scan is exhaustive (recall 1.0); with a partial probe recall stays
    usable on a random corpus."""
    from kgray.stages.similarity import ann_topk_ivf

    t, vecs = _corpus()
    vecs64 = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    q = vecs[:5]
    ds = ray.data.from_arrow(t)
    expected = _exact_topk(vecs64, np.asarray(q, dtype=np.float64), 10)

    # Exhaustive probe == exact (ordering ties broken identically).
    got_full = ann_topk_ivf(ds, q, k=10, n_cells=16, n_probe=16).take_all()
    for qi in range(5):
        rows = sorted((r for r in got_full if r["q_id"] == qi), key=lambda r: r["rank"])
        assert [r["vec_id"] for r in rows] == expected[qi]

    got = ann_topk_ivf(ds, q, k=10, n_cells=16, n_probe=6).take_all()
    recalls = []
    for qi in range(5):
        rows = {r["vec_id"] for r in got if r["q_id"] == qi}
        recalls.append(len(rows & set(expected[qi])) / 10)
    assert sum(recalls) / len(recalls) >= 0.5
