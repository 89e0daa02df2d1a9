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


# ---------------------------------------------------------------------------
# bfs_distances: broadcast path vs exchange fallback
# ---------------------------------------------------------------------------

def _bfs_inputs(pairs, seed_nodes):
    edges = ray.data.from_arrow(pa.table({
        "u": pa.array([str(a) for a, _ in pairs]),
        "v": pa.array([str(b) for _, b in pairs]),
    }))
    seeds = ray.data.from_arrow(pa.table({"node": pa.array(seed_nodes)}))
    return edges, seeds


def _bfs_reference(pairs, seed_nodes, max_depth):
    adj = {}
    for a, b in pairs:
        adj.setdefault(str(a), set()).add(str(b))
        adj.setdefault(str(b), set()).add(str(a))
    dist = {s: 0 for s in seed_nodes}
    frontier = set(seed_nodes)
    for d in range(1, max_depth + 1):
        nxt = set()
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in dist:
                    dist[m] = d
                    nxt.add(m)
        frontier = nxt
    return dist


def test_bfs_broadcast_matches_reference(ray_session):
    from kgray.stages.graph import bfs_distances

    rng = np.random.default_rng(7)
    pairs = list(zip(rng.integers(0, 60, 400).tolist(),
                     rng.integers(0, 60, 400).tolist()))
    seeds = ["1", "2", "3"]
    got = bfs_distances(*_bfs_inputs(pairs, seeds), max_depth=3).to_pandas()
    ref = _bfs_reference(pairs, seeds, 3)
    got_map = dict(zip(got["node"], got["dist"]))
    assert got_map == ref


def test_bfs_exchange_fallback_matches_broadcast(ray_session):
    from kgray.stages.graph import bfs_distances

    rng = np.random.default_rng(11)
    pairs = list(zip(rng.integers(0, 50, 300).tolist(),
                     rng.integers(0, 50, 300).tolist()))
    seeds = ["0", "5"]
    edges, sds = _bfs_inputs(pairs, seeds)
    a = bfs_distances(edges, sds, max_depth=3).to_pandas()
    edges, sds = _bfs_inputs(pairs, seeds)
    # broadcast_limit=0 forces every round onto the exchange path.
    b = bfs_distances(edges, sds, max_depth=3, broadcast_limit=0,
                      num_partitions=4).to_pandas()
    am = dict(zip(a["node"], a["dist"]))
    bm = dict(zip(b["node"], b["dist"]))
    assert am == bm == _bfs_reference(pairs, seeds, 3)


def _peel_reference(edges, k):
    """Pure-python peeling reference for small graphs."""
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    return {n: len(s) for n, s in adj.items()}


def test_k_core_matches_reference_peeler(ray_session):
    import pandas as pd
    import ray.data

    from kgray.stages.graph import k_core

    rng = np.random.default_rng(17)
    n = 60
    edges = list({(f"n{a}", f"n{b}") for a, b in
                  zip(rng.integers(0, n, 300), rng.integers(0, n, 300)) if a != b})
    df = pd.DataFrame(edges, columns=["u", "v"])
    got = (k_core(ray.data.from_pandas(df), k=3)
           .to_pandas().sort_values("node").reset_index(drop=True))
    exp = _peel_reference(edges, 3)
    assert dict(zip(got["node"], got["degree"])) == exp
    assert (got["degree"] >= 3).all() or len(got) == 0


def test_k_core_empty_core_and_validation(ray_session):
    import pandas as pd
    import pytest
    import ray.data

    from kgray.stages.graph import k_core

    # A path graph has no 2-core.
    df = pd.DataFrame({"u": ["a", "b", "c"], "v": ["b", "c", "d"]})
    got = k_core(ray.data.from_pandas(df), k=2).to_pandas()
    assert len(got) == 0
    with pytest.raises(ValueError):
        k_core(ray.data.from_pandas(df), k=0)


def test_pagerank_exchange_matches_broadcast(ray_session):
    """Forced size-switch: the rank-exchange variant (Dataset ranks,
    nothing O(nodes) driver-side) must match the broadcast path and the
    dense reference on a random graph with dangling nodes and parallel
    edges."""
    from kgray.stages.graph import pagerank_exchange

    rng = np.random.default_rng(9)
    src = rng.integers(0, 35, 250)
    dst = rng.integers(0, 40, 250)  # nodes 35..39 likely dangling
    ds = _ds(list(zip(src.tolist(), dst.tolist())))
    # damping=0.5 halves the mixing time — the exchange variant pays
    # ~3 exchange barriers per iteration, so keep iterations ~30
    bt, _ = pagerank(ds, damping=0.5, max_iters=100, tol=1e-11)
    broad = bt.to_pandas().set_index("node")["rank"].sort_index()
    xd, _ = pagerank_exchange(ds, damping=0.5, max_iters=100, tol=1e-11,
                              num_partitions=4)
    exch = xd.to_pandas().set_index("node")["rank"].sort_index()
    assert list(exch.index) == list(broad.index)
    assert np.abs(exch - broad).max() < 1e-8
    ref = pagerank_dense_reference(src, dst, damping=0.5, max_iters=100,
                                   tol=1e-11)
    assert np.abs(exch - ref.reindex(exch.index)).max() < 1e-8
    assert abs(exch.sum() - 1.0) < 1e-9


def test_pagerank_size_switch_dispatch(ray_session):
    """pagerank() with broadcast_limit=0 must route to the exchange
    variant (returns a Dataset) and still produce the same ranks."""
    import ray.data as rd

    pairs = [(1, 2), (1, 2), (3, 1), (2, 3), (4, 1)]
    t, _ = pagerank(_ds(pairs), damping=0.5, max_iters=100, tol=1e-11)
    want = t.to_pandas().set_index("node")["rank"].sort_index()
    got_ds, _ = pagerank(_ds(pairs), damping=0.5, max_iters=100, tol=1e-11,
                         broadcast_limit=0)
    assert isinstance(got_ds, rd.Dataset)
    got = got_ds.to_pandas().set_index("node")["rank"].sort_index()
    assert np.abs(got - want).max() < 1e-8
