"""Spanning forest + connectivity-preserving edge holdout, both the
driver Kruskal path and the forced distributed Borůvka path, on
hand-computable graphs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from kgray.stages.holdout import canonical_edges, edge_holdout, spanning_forest


def _uf_components(pairs, nodes):
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def _hand_graph():
    # comp A: 4-cycle 1-2-3-4 + chord 1-3; comp B: edge 10-11;
    # comp C: triangle 20-21-22. 9 edges, 9 nodes, 3 components
    # -> forest 6 edges, 3 non-tree edges.
    e = [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3),
         (10, 11),
         (20, 21), (21, 22), (20, 22)]
    # feed messy input: both directions, duplicates, a self-loop, a null
    rows = e + [(b, a) for a, b in e] + [(1, 2), (5, 5)]
    df = pd.DataFrame(rows, columns=["src", "dst"]).astype("float64")
    df.loc[len(df)] = [7.0, np.nan]
    df = df.astype("Int64").astype("float64")
    t = pa.table({"src": pa.array(df["src"], pa.int64()),
                  "dst": pa.array(df["dst"], pa.int64())})
    return t, set(e), {n for ab in e for n in ab}


@pytest.mark.parametrize("limit", [2_000_000, 0])  # driver / forced Borůvka
def test_spanning_forest_properties(ray_session, limit):
    t, E, nodes = _hand_graph()
    ds = ray.data.from_arrow(t)
    F = {(r["u"], r["v"]) for r in
         spanning_forest(ds, edge_broadcast_limit=limit,
                         num_partitions=4).take_all()}
    assert F <= E                      # forest edges come from the graph
    assert len(F) == len(nodes) - 3    # nodes - components
    # acyclic: every edge merges two components
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in sorted(F):
        ra, rb = find(a), find(b)
        assert ra != rb, f"cycle through {(a, b)}"
        parent[max(ra, rb)] = min(ra, rb)
    # spans the same components as the full graph
    assert _uf_components(F, nodes) == _uf_components(E, nodes)


@pytest.mark.parametrize("limit", [2_000_000, 0])
def test_edge_holdout_contract(ray_session, limit):
    t, E, nodes = _hand_graph()
    ds = ray.data.from_arrow(t)
    out = edge_holdout(ds, train_fraction=0.6, seed=7, num_partitions=4,
                       edge_broadcast_limit=limit,
                       node_broadcast_limit=limit).to_pandas()
    by = {s: {(u, v) for u, v in zip(g["u"], g["v"])}
          for s, g in out.groupby("split")}
    k = int(0.4 * len(E))  # 3
    assert len(by["pos_test"]) == k
    assert by["pos_train"] | by["pos_test"] == E
    assert not (by["pos_train"] & by["pos_test"])
    # connectivity preserved after removing the test positives
    assert _uf_components(by["pos_train"], nodes) == _uf_components(E, nodes)
    # negatives: right count, absent from the graph, inside the node set
    assert len(by["neg_test"]) == k
    assert not (by["neg_test"] & E)
    assert all(u in nodes and v in nodes and u < v for u, v in by["neg_test"])
    # deterministic
    out2 = edge_holdout(ds, train_fraction=0.6, seed=7, num_partitions=4,
                        edge_broadcast_limit=limit,
                        node_broadcast_limit=limit).to_pandas()
    key = ["split", "u", "v"]
    assert (out.sort_values(key).reset_index(drop=True)[key]
            .equals(out2.sort_values(key).reset_index(drop=True)[key]))


@pytest.mark.parametrize("limit", [2_000_000])
def test_edge_holdout_negative_paths_equal(ray_session, limit):
    """The broadcast node-array path and the distributed node-index
    path assign the SAME index->node bijection, so the sampled
    negatives are identical."""
    t, E, nodes = _hand_graph()
    ds = ray.data.from_arrow(t)
    a = edge_holdout(ds, train_fraction=0.6, seed=7, num_partitions=4,
                     node_broadcast_limit=2_000_000).to_pandas()
    b = edge_holdout(ds, train_fraction=0.6, seed=7, num_partitions=4,
                     node_broadcast_limit=0).to_pandas()
    key = ["split", "u", "v"]
    assert (a.sort_values(key).reset_index(drop=True)[key]
            .equals(b.sort_values(key).reset_index(drop=True)[key]))


def test_edge_holdout_validation_split(ray_session):
    t, E, nodes = _hand_graph()
    out = edge_holdout(ray.data.from_arrow(t), train_fraction=0.6, seed=7,
                       validation=True, num_partitions=4).to_pandas()
    counts = out["split"].value_counts()
    k = int(0.4 * len(E))
    assert counts.get("pos_test", 0) + counts.get("pos_valid", 0) == k
    assert counts.get("neg_test", 0) + counts.get("neg_valid", 0) == k
    assert counts["pos_train"] == len(E) - k


@pytest.mark.parametrize("limit", [2_000_000, 0])
def test_spanning_forest_chain_graph(ray_session, limit):
    """A pure path graph: every edge is a tree edge (exercises long
    pointer-jump chains in the distributed path)."""
    n = 16
    t = pa.table({"src": pa.array(range(n - 1), pa.int64()),
                  "dst": pa.array(range(1, n), pa.int64())})
    ds = ray.data.from_arrow(t)
    F = {(r["u"], r["v"]) for r in
         spanning_forest(ds, edge_broadcast_limit=limit,
                         num_partitions=4).take_all()}
    assert F == {(i, i + 1) for i in range(n - 1)}


def test_edge_holdout_tree_only_graph(ray_session):
    """A tree-only graph has no removable positives: everything lands
    in pos_train and no negatives are emitted (k = 0)."""
    n = 16
    t = pa.table({"src": pa.array(range(n - 1), pa.int64()),
                  "dst": pa.array(range(1, n), pa.int64())})
    out = edge_holdout(ray.data.from_arrow(t), train_fraction=0.8,
                       num_partitions=4).to_pandas()
    assert set(out["split"]) == {"pos_train"}
    assert len(out) == n - 1


@pytest.mark.parametrize("limit", [2_000_000, 0])
def test_spanning_forest_string_nodes(ray_session, limit):
    t = pa.table({"src": pa.array(["a", "b", "c", "a"], pa.string()),
                  "dst": pa.array(["b", "c", "a", "c"], pa.string())})
    F = {(r["u"], r["v"]) for r in
         spanning_forest(ray.data.from_arrow(t), num_partitions=4,
                         edge_broadcast_limit=limit).take_all()}
    # triangle a-b-c (edge (a,c) duplicated): forest = 2 of the 3 edges
    assert len(F) == 2
    assert F <= {("a", "b"), ("b", "c"), ("a", "c")}


def test_canonical_edges_dedup_and_drop(ray_session):
    t, E, _ = _hand_graph()
    got = {(r["u"], r["v"]) for r in
           canonical_edges(ray.data.from_arrow(t)).take_all()}
    assert got == E  # self-loop and null row dropped, directions merged


@pytest.mark.parametrize("limit", [2_000_000, 0])
def test_boruvka_random_graph_matches_components(ray_session, limit):
    rng = np.random.RandomState(3)
    # two random blobs, no cross edges
    e = [(int(a), int(b)) for a, b in rng.randint(0, 40, (120, 2)) if a != b]
    e += [(int(a), int(b)) for a, b in rng.randint(100, 130, (60, 2)) if a != b]
    E = {(min(a, b), max(a, b)) for a, b in e}
    nodes = {n for ab in E for n in ab}
    t = pa.table({"src": pa.array([a for a, _ in e], pa.int64()),
                  "dst": pa.array([b for _, b in e], pa.int64())})
    F = {(r["u"], r["v"]) for r in
         spanning_forest(ray.data.from_arrow(t), num_partitions=4,
                         edge_broadcast_limit=limit).take_all()}
    comps = _uf_components(E, nodes)
    n_comp = len(set(comps.values()))
    assert len(F) == len(nodes) - n_comp
    assert _uf_components(F, nodes) == comps


def test_cli_holdouts(tmp_path):
    """Reference `kg holdouts` CLI surface — runs end-to-end and writes
    the documented file set (pos_train/pos_test edges + both negative
    files; the reference declares this command but raises)."""
    import json
    import subprocess
    import sys

    # a graph with cycles so non-tree edges exist
    edges = tmp_path / "edges.tsv"
    rows = ["subject\tpredicate\tobject"]
    for i in range(8):
        rows.append(f"N:{i}\tp\tN:{(i + 1) % 8}")   # 8-cycle
    rows += ["N:0\tp\tN:4", "N:1\tp\tN:5"]          # chords
    edges.write_text("\n".join(rows) + "\n")
    out = tmp_path / "holdouts"
    r = subprocess.run(
        [sys.executable, "-m", "kgray.cli", "--num-cpus", "4", "holdouts",
         "-e", str(edges), "-o", str(out), "-t", "0.8"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    counts = json.loads(r.stdout.strip().splitlines()[-1])
    assert counts["pos_test"] == 2  # int(0.2 * 10)
    assert counts["pos_train"] == 8
    assert counts["neg_test"] == 2 and counts["neg_train"] == 8
    got = (out / "pos_test_edges.tsv").read_text().splitlines()
    assert got[0] == "subject\tobject" and len(got) == 3
    for f in ("pos_train_edges.tsv", "neg_train.tsv", "neg_test.tsv"):
        assert (out / f).exists()


def test_edge_holdout_fastpath_matches_distributed_random(ray_session):
    """The driver fast-path (one collect, all-numpy) must reproduce the
    distributed structure's exact output — forest picks, splitmix64
    pos_test ranking, negative bijection/dedup/cut — on a random graph,
    including neg_train and validation splits."""
    rng = np.random.RandomState(11)
    src = rng.randint(0, 120, size=600)
    dst = rng.randint(0, 120, size=600)
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}))
    for kw in ({}, {"neg_train": True}, {"validation": True}):
        a = edge_holdout(ds, train_fraction=0.7, seed=3, num_partitions=4,
                         **kw).to_pandas()
        b = edge_holdout(ds, train_fraction=0.7, seed=3, num_partitions=4,
                         node_broadcast_limit=0, **kw).to_pandas()
        key = ["split", "u", "v"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True)[key],
            b.sort_values(key).reset_index(drop=True)[key])
