"""PageRank: model correctness vs the dense reference, dangling-node
handling, convergence policy."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from kgray.stages.graph import pagerank, pagerank_dense_reference


def _ds(pairs):
    return ray.data.from_arrow(pa.table({
        "src": pa.array([p[0] for p in pairs], pa.int64()),
        "dst": pa.array([p[1] for p in pairs], pa.int64()),
    }))


def test_pagerank_matches_dense_reference(ray_session):
    rng = np.random.default_rng(5)
    src = rng.integers(0, 40, 300)
    dst = rng.integers(0, 40, 300)
    t, _ = pagerank(_ds(list(zip(src.tolist(), dst.tolist()))), max_iters=200, tol=1e-12)
    got = t.to_pandas().set_index("node")["rank"]
    ref = pagerank_dense_reference(src, dst, max_iters=200, tol=1e-12)
    assert np.abs(got - ref.reindex(got.index)).max() < 1e-9
    assert abs(got.sum() - 1.0) < 1e-9


def test_pagerank_dangling_and_parallel_edges(ray_session):
    # 1→2 twice (parallel edges), 2 dangling: classic hand-checkable shape.
    t, _ = pagerank(_ds([(1, 2), (1, 2), (3, 1)]), max_iters=300, tol=1e-13)
    df = t.to_pandas().set_index("node")["rank"]
    assert abs(df.sum() - 1.0) < 1e-9
    # 2 receives all of 1's outflow; 3 only gets teleport + dangling share.
    assert df[2] > df[1] > df[3]
    ref = pagerank_dense_reference(
        np.array([1, 1, 3]), np.array([2, 2, 1]), max_iters=300, tol=1e-13
    )
    assert np.abs(df - ref.reindex(df.index)).max() < 1e-9


def test_pagerank_non_convergence_raises(ray_session):
    with pytest.raises(RuntimeError, match="did not converge"):
        pagerank(_ds([(i, i + 1) for i in range(30)]), max_iters=1, tol=0.0)


def test_pagerank_empty(ray_session):
    t, iters = pagerank(_ds([]), max_iters=5)
    assert len(t) == 0 and iters == 0
