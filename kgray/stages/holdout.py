"""Graph-aware ML edge holdouts — the reference's ``holdouts`` CLI
contract (reference ``run.py:210-273``, a documented-but-
NotImplementedError command whose docstring pins the semantics):

* **positive test edges**: ``(1 − train_fraction) · |E|`` edges chosen
  from the edges NOT in a spanning forest of the input graph, so that
  removing all of them cannot create new components (the forest stays
  intact);
* **positive training edges**: the input graph minus the test
  positives;
* **negative edges**: node pairs NOT connected by any input edge,
  equal in number to the positives; optional validation flag halves
  test into test+valid.

The graph is treated as undirected and deduplicated to canonical
``(u < v)`` pairs first (self-loops and null endpoints dropped) — a
spanning structure is only defined on the simple undirected graph.

Ray shapes
----------
``spanning_forest`` is size-switched like the engine's BFS/CC family:

* **driver path** (edge count ≤ ``edge_broadcast_limit``): the same
  Borůvka, vectorized in numpy over factorized node codes — no
  per-edge Python loop, deterministic (value-ordered ties, never block
  arrival order).
* **distributed path**: textbook parallel Borůvka. Each round every
  current component picks its minimum inter-component edge (ONE
  grouped min-exchange over the still-live edges — the pick is an
  idempotent monoid, so batches pre-combine map-side), the picked
  edges join the forest, and components contract by resolving the
  pick pseudo-forest with POINTER JUMPING (path doubling — O(log
  depth) tiny self-joins over one row per component; min-label
  propagation would need O(depth) rounds on chain-shaped picks).
  Components at least halve per round, so the outer loop runs ≤
  log₂(n) rounds; the expensive part is the two label joins over the
  live edge set, which shrinks as edges become intra-component.

``edge_holdout`` samples deterministically (splitmix64 over the
representation-stable key hash + seed): test positives are the k
smallest-hash non-tree edges — selected by an exact distributed
k-th-element threshold (:func:`kgray.kernels.selection.kth_smallest`,
O(histogram) driver memory) plus a map-only filter, never a global
range-partitioning sort; negatives are hash-generated candidate
node-index pairs mapped through a distributed node index (two-pass
partition-offset ranking), anti-joined against the edge set, and cut
to exactly the positive count by the same k-th-element threshold on
their unique candidate ranks.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data import Dataset

from kgray.kernels.hashagg import (add_partition_column, arrow_types,
                                   auto_partitions, grouped_apply,
                                   register_schema, _key_hash)


def _pin(ds: Dataset, num_blocks: int) -> Dataset:
    """Bounded-block, lineage-severed materialize (see
    :func:`kgray.kernels.hashagg.pin_blocks`) — the checkpoint form
    every iteration of the Borůvka / pointer-jump loops must use."""
    from kgray.kernels.hashagg import pin_blocks

    return pin_blocks(ds, num_blocks)


def _arrowize(ds: Dataset) -> Dataset:
    """Normalize pandas-block output (grouped_apply's reduce side) to
    Arrow blocks. hash_join resolves column types from the dataset
    schema, and a pandas OBJECT column resolves to pa.null() — the
    identity Arrow pass re-infers real types (string) from the data."""
    return ds.map_batches(lambda t: t, batch_format="pyarrow")


def _cat2(x, y) -> pa.ChunkedArray:
    """Concatenate two Arrow columns (Array or ChunkedArray) zero-copy."""
    cx = list(x.chunks) if isinstance(x, pa.ChunkedArray) else [x]
    cy = list(y.chunks) if isinstance(y, pa.ChunkedArray) else [y]
    return pa.chunked_array(cx + cy)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — deterministic uint64 mixing (public
    domain constant set; unsigned wraparound intended)."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def canonical_edges(
    edges: Dataset,
    src: str = "src",
    dst: str = "dst",
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Distinct undirected edges as ``(u, v)`` with ``u < v`` — null
    endpoints and self-loops dropped. One (u, v)-keyed exchange."""
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _canon(t: pa.Table) -> pa.Table:
        a, b = t.column(src), t.column(dst)
        keep = pc.and_(pc.and_(pc.is_valid(a), pc.is_valid(b)),
                       pc.invert(pc.equal(a, b)))
        a, b = a.filter(keep), b.filter(keep)
        return pa.table({"u": pc.min_element_wise(a, b),
                         "v": pc.max_element_wise(a, b)})

    def _dd(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["u", "v"])

    e = edges.select_columns([src, dst]).map_batches(
        _canon, batch_format="pyarrow")
    return _arrowize(grouped_apply(e, ["u", "v"], _dd,
                                   num_partitions=num_partitions, map_side=_dd))


def _collect_factorize(E: Dataset):
    """Collect a (small, ≤ edge_broadcast_limit) canonical edge Dataset
    and factorize its endpoints to value-sorted int codes.  Returns
    ``(tbl, iu, iv, uniq)`` — code order equals value order, so code
    comparisons reproduce value comparisons (canonical u < v ⇒
    iu < iv)."""
    tbl = pa.concat_tables(
        E.select_columns(["u", "v"]).iter_batches(batch_format="pyarrow"),
        promote_options="default")
    if len(tbl) == 0:
        return tbl, None, None, None
    us = tbl.column("u").to_pandas()
    vs = tbl.column("v").to_pandas()
    codes, uniq = pd.factorize(pd.concat([us, vs], ignore_index=True),
                               sort=True)
    mm = len(tbl)
    return (tbl, codes[:mm].astype(np.int64), codes[mm:].astype(np.int64),
            np.asarray(uniq))


def _boruvka_np(iu: np.ndarray, iv: np.ndarray, n: int) -> np.ndarray:
    """Vectorized numpy Borůvka over int edge codes → boolean in-forest
    mask.  The same algorithm `_forest_boruvka` runs distributed, so
    both paths share pick semantics.  No per-edge Python loop: each
    round is a lexsort + first-per-group min-pick + pointer-jump
    contraction, all array ops.  Deterministic for a given distinct
    edge set: picks break ties by (nbr, u, v) code order (= value
    order), never by block arrival order."""
    mm = len(iu)
    labels = np.arange(n, dtype=np.int64)
    in_forest = np.zeros(mm, dtype=bool)
    eids = np.arange(mm, dtype=np.int64)
    n_jumps = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)

    live = eids
    while True:
        lu, lv = labels[iu[live]], labels[iv[live]]
        inter = lu != lv
        live, lu, lv = live[inter], lu[inter], lv[inter]
        if len(live) == 0:
            break
        # min-(nbr, u, v) pick per component, both directions
        comp = np.concatenate([lu, lv])
        nbr = np.concatenate([lv, lu])
        eid2 = np.concatenate([live, live])
        order = np.lexsort((iv[eid2], iu[eid2], nbr, comp))
        comp_s, first = comp[order], np.ones(len(order), bool)
        first[1:] = comp_s[1:] != comp_s[:-1]
        pick_c = comp_s[first]
        pick_p = nbr[order][first]
        in_forest[eid2[order][first]] = True
        # contract the pick pseudo-forest: break 2-cycles at the min
        # member, then pointer-jump to roots
        parent = np.arange(n, dtype=np.int64)
        parent[pick_c] = pick_p
        gp = parent[parent]
        idx = np.arange(n, dtype=np.int64)
        parent[(gp == idx) & (idx < parent)] = idx[(gp == idx) & (idx < parent)]
        for _ in range(n_jumps):
            parent = parent[parent]
        labels = parent[labels]

    return in_forest


def _forest_driver(E: Dataset) -> Dataset:
    """Driver-local spanning forest: one collect + :func:`_boruvka_np`."""
    tbl, iu, iv, uniq = _collect_factorize(E)
    if len(tbl) == 0:
        return E.limit(0)
    in_forest = _boruvka_np(iu, iv, len(uniq))
    if not in_forest.any():
        return E.limit(0)
    return ray.data.from_arrow(tbl.filter(pa.array(in_forest)))


def _rename(ds: Dataset, mapping, types=None) -> Dataset:
    """Lazy column rename; when ``types`` (``{new_name: pa.DataType}``)
    is given, the output schema is REGISTERED as a hint so a downstream
    ``hash_join`` never runs a ``.schema()`` probe — each probe spins
    up a partial streaming executor, and dozens of them per Borůvka
    round degrade the whole Ray session."""
    pairs = list(mapping)

    def _f(t: pa.Table) -> pa.Table:
        return pa.table({new: t.column(old) for old, new in pairs})

    out = ds.map_batches(_f, batch_format="pyarrow")
    if types is not None:
        out = register_schema(
            out, pa.schema([(new, types[new]) for _, new in pairs]))
    return out


def _resolve_pseudoforest(
    parents: Dataset, num_partitions: int, ntype: pa.DataType
) -> Dataset:
    """Pick pseudo-forest ``(comp → parent)`` (only mutual 2-cycles,
    the Borůvka invariant under min-neighbor picks on distinct ids) →
    ``(comp, root)`` via pointer jumping: break each 2-cycle at its min
    member, then SQUARE the parent pointers ``⌈log₂ C⌉ + 1`` times
    (path doubling reaches any root in that many rounds — no per-round
    change detection, each jump is exactly ONE join execution over one
    row per component). ``ntype`` is the component-id Arrow type, used
    to hint every lazy schema (see :func:`_rename`)."""
    from kgray.stages.relational import hash_join

    parents = _pin(parents, num_partitions)
    n_comps = parents.count()
    pair_t = {"comp": ntype, "parent": ntype, "gp": ntype}

    right = _rename(parents, [("comp", "parent"), ("parent", "gp")], pair_t)
    j = hash_join(parents, right, on="parent", how="inner",
                  num_partitions=num_partitions)

    def _break(t: pa.Table) -> pa.Table:
        comp, par, gp = t.column("comp"), t.column("parent"), t.column("gp")
        self_root = pc.and_(pc.equal(gp, comp), pc.less(comp, par))
        return pa.table({"comp": comp,
                         "parent": pc.if_else(self_root, comp, par)})

    parents = _pin(register_schema(
        j.map_batches(_break, batch_format="pyarrow"),
        pa.schema([("comp", ntype), ("parent", ntype)])), num_partitions)

    n_jumps = max(1, int(np.ceil(np.log2(max(n_comps, 2)))) + 1)
    for _ in range(n_jumps):
        right = _rename(parents, [("comp", "parent"), ("parent", "gp")], pair_t)
        j = hash_join(parents, right, on="parent", how="inner",
                      num_partitions=num_partitions)
        parents = _pin(_rename(j, [("comp", "comp"), ("gp", "parent")],
                               pair_t), num_partitions)
    return parents


def _forest_boruvka(
    E: Dataset, num_partitions: int, max_rounds: int = 50
) -> Dataset:
    """Distributed Borůvka over a materialized canonical edge set."""
    from kgray.stages.relational import hash_join

    def _endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"node": _cat2(t.column("u"), t.column("v"))})

    def _dd_node(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["node"])

    ntype = arrow_types(E.schema())["u"]
    nodes = grouped_apply(
        E.map_batches(_endpoints, batch_format="pyarrow"),
        ["node"], _dd_node, num_partitions=num_partitions, map_side=_dd_node)
    labels = nodes.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "label": t.column("node")}),
        batch_format="pyarrow").materialize()

    live = E  # edges not yet known to be intra-component
    tree_parts = []
    for _ in range(max_rounds):
        e1 = hash_join(
            register_schema(live.select_columns(["u", "v"]),
                            pa.schema([("u", ntype), ("v", ntype)])),
            _rename(labels, [("node", "u"), ("label", "lu")],
                    {"u": ntype, "lu": ntype}),
            on="u", how="inner", num_partitions=num_partitions)
        e2 = hash_join(e1,
                       _rename(labels, [("node", "v"), ("label", "lv")],
                               {"v": ntype, "lv": ntype}),
                       on="v", how="inner", num_partitions=num_partitions)
        Ec = _pin(e2.map_batches(
            lambda t: t.filter(pc.invert(pc.equal(t.column("lu"),
                                                  t.column("lv")))),
            batch_format="pyarrow"), num_partitions)
        if Ec.count() == 0:
            break
        live = Ec

        def _emit(t: pa.Table) -> pa.Table:
            u, v = t.column("u"), t.column("v")
            lu, lv = t.column("lu"), t.column("lv")
            return pa.table({
                "comp": _cat2(lu, lv),
                "nbr": _cat2(lv, lu),
                "u": _cat2(u, u),
                "v": _cat2(v, v),
            })

        def _min_pick(df: pd.DataFrame) -> pd.DataFrame:
            return df.sort_values(["comp", "nbr", "u", "v"],
                                  kind="mergesort").drop_duplicates("comp")

        picked = _pin(grouped_apply(
            Ec.map_batches(_emit, batch_format="pyarrow"),
            ["comp"], _min_pick, num_partitions=num_partitions,
            map_side=_min_pick), num_partitions)

        # Tree edges: picked (u, v) — an edge picked from both sides
        # appears twice, and never re-appears in a later round (its
        # endpoints merge). Dedup ONCE at the end (one exchange total
        # instead of one per round); picked is materialized, so the
        # deferred re-read is free.
        tree_parts.append(picked.map_batches(
            lambda t: t.select(["u", "v"]), batch_format="pyarrow"))

        croot = _resolve_pseudoforest(
            _rename(picked, [("comp", "comp"), ("nbr", "parent")],
                    {"comp": ntype, "parent": ntype}),
            num_partitions=num_partitions, ntype=ntype)
        j = hash_join(labels,
                      _rename(croot, [("comp", "label"), ("parent", "root")],
                              {"label": ntype, "root": ntype}),
                      on="label", how="left", num_partitions=num_partitions)
        labels = _pin(j.map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "label": pc.coalesce(t.column("root"), t.column("label")),
            }),
            batch_format="pyarrow"), num_partitions)
    else:
        raise RuntimeError(
            f"Borůvka did not terminate in {max_rounds} rounds — components "
            "must at least halve per round; this indicates a bug, not data.")

    if not tree_parts:
        return E.limit(0)
    out = tree_parts[0]
    for p in tree_parts[1:]:
        out = out.union(p)

    def _dd_edge(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["u", "v"])

    return _arrowize(grouped_apply(out, ["u", "v"], _dd_edge,
                                   num_partitions=num_partitions,
                                   map_side=_dd_edge))


def spanning_forest(
    edges: Dataset,
    src: str = "src",
    dst: str = "dst",
    edge_broadcast_limit: int = 2_000_000,
    num_partitions: Optional[int] = None,
    pre_canonical: bool = False,
) -> Dataset:
    """A spanning forest of the undirected simple graph → Dataset(u, v).

    Size-switched (see module docstring): vectorized driver Borůvka
    below ``edge_broadcast_limit`` distinct edges, distributed Borůvka
    above.
    Both produce A forest spanning every component (|F| = nodes −
    components); WHICH forest differs between paths — callers must
    depend only on forest properties, as :func:`edge_holdout` does.

    ``pre_canonical=True`` skips re-canonicalization when ``edges`` is
    already a MATERIALIZED distinct ``(u, v)`` / ``u < v`` set.
    """
    if num_partitions is None:
        num_partitions = auto_partitions()
    if pre_canonical:
        E = edges
    else:
        E = canonical_edges(edges, src, dst, num_partitions).materialize()
    m = E.count()
    if m <= edge_broadcast_limit:
        return _forest_driver(E)
    return _forest_boruvka(E, num_partitions)


def _node_index(
    nodes: Dataset, num_partitions: int
) -> Tuple[Dataset, int]:
    """Distinct single-column ``(node)`` dataset → ``(node, idx)`` with
    idx a bijection onto [0, n). Two passes: per-hash-partition counts
    fold to the driver (O(partitions) rows), cumulative offsets
    broadcast back, each partition ranks its nodes locally."""
    mapped = nodes.map_batches(
        lambda df: add_partition_column(df, ["node"], num_partitions),
        batch_format="pandas").materialize()
    sizes = mapped.map_batches(
        lambda df: df.groupby("__part").size().rename("c").reset_index(),
        batch_format="pandas").to_pandas()
    per_part = sizes.groupby("__part")["c"].sum() if len(sizes) else pd.Series(dtype="int64")
    total = int(per_part.sum())
    offs, acc = {}, 0
    for p in range(num_partitions):
        offs[p] = acc
        acc += int(per_part.get(p, 0))
    oref = ray.put(offs)

    def _rank(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(oref) if isinstance(oref, ray.ObjectRef) else oref
        p = int(df["__part"].iloc[0])
        df = df.sort_values("node", kind="mergesort")
        return pd.DataFrame({"node": df["node"].to_numpy(),
                             "idx": off[p] + np.arange(len(df), dtype=np.int64)})

    return _arrowize(mapped.groupby("__part").map_groups(
        _rank, batch_format="pandas")), total


def _edge_hash(t: pa.Table, seed: int) -> np.ndarray:
    """Representation-stable deterministic uint64 per (u, v) row."""
    return _mix64(_key_hash([t.column("u"), t.column("v")])
                  + np.uint64(seed & 0xFFFFFFFFFFFFFFFF))


def _edge_holdout_driver(
    E: Dataset,
    m: int,
    ntype: pa.DataType,
    train_fraction: float,
    seed: int,
    validation: bool,
    neg_oversample: float,
    neg_train: bool,
    num_partitions: int,
    node_broadcast_limit: int,
) -> Optional[Dataset]:
    """Driver fast-path for ``edge_holdout`` below the edge broadcast
    limit: ONE collect of the (already distributed-deduplicated)
    canonical edge set, then every remaining step — forest, non-tree
    hash ranking, negative candidate generation / dedup / anti-check /
    rank cut — is a vectorized numpy pass.  Semantically IDENTICAL to
    the distributed structure (same Borůvka picks, same splitmix64
    ranks, same partition-major node bijection, same min-i candidate
    dedup, same cut rule) — pinned by the path-equality pytest.  The
    distributed path it replaces spent ~5 exchange barriers moving
    ≤ 2 M rows; this spends zero.

    Returns ``None`` when the node set exceeds ``node_broadcast_limit``
    (caller falls through to the distributed structure)."""
    tbl, iu, iv, uniq = _collect_factorize(E)
    n_nodes = len(uniq) if uniq is not None else 0
    if n_nodes > node_broadcast_limit:
        return None

    in_forest = _boruvka_np(iu, iv, n_nodes)
    nt_idx = np.flatnonzero(~in_forest)
    k = min(int((1.0 - train_fraction) * m + 1e-9 + m * 1e-12), len(nt_idx))

    h_all = _edge_hash(tbl, seed)
    if k > 0:
        order = np.lexsort((iv[nt_idx], iu[nt_idx], h_all[nt_idx]))
        test_idx = nt_idx[order[:k]]
    else:
        test_idx = nt_idx[:0]
    test_mask = np.zeros(len(tbl), dtype=bool)
    test_mask[test_idx] = True

    # ---- negatives: same sampling pipeline, vectorized ------------------
    k_neg = k + (m - k if neg_train else 0)
    neg_u = neg_v = None
    nt_cut = k  # rows of the neg pool that go to neg_test
    if k_neg > 0 and n_nodes >= 2:
        # the distributed paths' index→node bijection: partition-major,
        # node-sorted within partition (built with the same helper)
        ndf = pd.DataFrame({"node": uniq})
        ndf = add_partition_column(ndf, ["node"], num_partitions)
        ndf = ndf.sort_values(["__part", "node"], kind="mergesort")
        perm = ndf.index.to_numpy(np.int64)  # position → factorize code

        n_cand = int(k_neg * neg_oversample) + 64
        s = np.uint64((seed * 0x9E3779B1 + 0xA5A5) & 0xFFFFFFFFFFFFFFFF)
        i = np.arange(n_cand, dtype=np.uint64)
        ia = (_mix64(i * np.uint64(2) + s) % np.uint64(n_nodes)).astype(np.int64)
        ib = (_mix64(i * np.uint64(2) + np.uint64(1) + s)
              % np.uint64(n_nodes)).astype(np.int64)
        keep = ia != ib
        i, ia, ib = i[keep].astype(np.int64), ia[keep], ib[keep]
        ca, cb = perm[ia], perm[ib]
        cu, cv = np.minimum(ca, cb), np.maximum(ca, cb)  # code order = value order
        key = cu * np.int64(n_nodes) + cv
        # dedup (u, v) keeping the min candidate id
        o = np.lexsort((i, key))
        key_s, i_s = key[o], i[o]
        first = np.ones(len(o), dtype=bool)
        first[1:] = key_s[1:] != key_s[:-1]
        key_d, i_d = key_s[first], i_s[first]
        cu_d, cv_d = cu[o][first], cv[o][first]
        # anti vs the edge set (code-keyed sorted membership)
        ekeys = np.sort(iu * np.int64(n_nodes) + iv)
        pos = np.searchsorted(ekeys, key_d)
        hit = (pos < len(ekeys)) & (ekeys[np.minimum(pos, len(ekeys) - 1)]
                                    == key_d)
        i_p, cu_p, cv_p = i_d[~hit], cu_d[~hit], cv_d[~hit]
        if len(i_p) < k_neg:
            raise ValueError(
                f"edge_holdout: only {len(i_p)} negative pairs found "
                f"for {k_neg} requested — graph too dense for neg_oversample="
                f"{neg_oversample}; raise it.")
        sel = np.argsort(i_p)[:k_neg]  # candidate ids are unique
        neg_u, neg_v = uniq[cu_p[sel]], uniq[cv_p[sel]]

    # ---- assemble --------------------------------------------------------
    def _col(vals) -> pa.Array:
        return pa.array(vals, type=ntype)

    def _split_tbl(u_vals, v_vals, names) -> pa.Table:
        return pa.table({"u": _col(u_vals), "v": _col(v_vals),
                         "split": pa.array(names, pa.string())})

    def _parity_names(u_vals, v_vals, even: str, odd: str) -> np.ndarray:
        t2 = pa.table({"u": _col(u_vals), "v": _col(v_vals)})
        h2 = _edge_hash(t2, seed + 101)
        return np.where((h2 & np.uint64(1)).astype(bool), odd, even)

    uu = tbl.column("u").to_numpy(zero_copy_only=False)
    vv = tbl.column("v").to_numpy(zero_copy_only=False)
    blocks = []
    tr_u, tr_v = uu[~test_mask], vv[~test_mask]
    blocks.append(_split_tbl(tr_u, tr_v, ["pos_train"] * len(tr_u)))
    te_u, te_v = uu[test_mask], vv[test_mask]
    if validation:
        blocks.append(_split_tbl(
            te_u, te_v, _parity_names(te_u, te_v, "pos_test", "pos_valid")))
    else:
        blocks.append(_split_tbl(te_u, te_v, ["pos_test"] * len(te_u)))
    if neg_u is not None and k > 0:
        nu, nv = neg_u[:nt_cut], neg_v[:nt_cut]
        if validation:
            blocks.append(_split_tbl(
                nu, nv, _parity_names(nu, nv, "neg_test", "neg_valid")))
        else:
            blocks.append(_split_tbl(nu, nv, ["neg_test"] * len(nu)))
    if neg_u is not None and neg_train and len(neg_u) > nt_cut:
        blocks.append(_split_tbl(neg_u[nt_cut:], neg_v[nt_cut:],
                                 ["neg_train"] * (len(neg_u) - nt_cut)))

    # bound block sizes so downstream stages parallelize
    out_blocks = []
    target = max(1, -(-sum(len(b) for b in blocks) // num_partitions))
    for b in blocks:
        for off in range(0, max(len(b), 1), target):
            sl = b.slice(off, target)
            if len(sl) or not out_blocks:
                out_blocks.append(sl)
    return ray.data.from_arrow(out_blocks)


def edge_holdout(
    edges: Dataset,
    src: str = "src",
    dst: str = "dst",
    train_fraction: float = 0.8,
    seed: int = 13,
    validation: bool = False,
    edge_broadcast_limit: int = 2_000_000,
    node_broadcast_limit: int = 5_000_000,
    num_partitions: Optional[int] = None,
    neg_oversample: float = 1.6,
    neg_train: bool = False,
) -> Dataset:
    """Connectivity-preserving positive/negative edge holdout (module
    docstring; reference ``run.py:210-273`` semantics). Output: one row
    per edge as ``(u, v, split)`` with split ∈ {pos_train, pos_test,
    neg_test} (+ pos_valid/neg_valid under ``validation=True``, test
    hash-parity-halved as the reference's "divided equally").
    ``neg_train=True`` additionally samples ``|pos_train|`` more
    negatives emitted as split ``neg_train`` — the reference CLI writes
    BOTH negative files.

    Guarantees (each pinned by pytest + the registry self-asserts):
    pos_train ∪ pos_test = the distinct canonical edge set, disjoint;
    pos_train keeps a full spanning forest, so its components equal the
    input graph's; every neg_* pair is absent from the input graph (as
    an undirected edge) and their count equals the positives'.

    Deterministic for a given (input multiset, seed, path): sampling
    ranks by splitmix64 of the representation-stable key hash, never by
    block arrival order.

    Negative candidates map index → node through a size switch: at or
    below ``node_broadcast_limit`` distinct nodes the sorted node array
    broadcasts (``ray.put`` once, candidates gather map-only — saves
    the node-index build and two inner joins); above it the distributed
    two-pass node index + joins run. Same output either way (the
    broadcast array IS the sorted order the distributed index assigns;
    forced-switch pytest pins equality).
    """
    if not 0.0 < train_fraction <= 1.0:
        raise ValueError(f"train_fraction must be in (0, 1], got {train_fraction}")
    from kgray.stages.relational import hash_join

    if num_partitions is None:
        num_partitions = auto_partitions()

    E = canonical_edges(edges, src, dst, num_partitions).materialize()
    m = E.count()
    if m == 0:
        raise ValueError("edge_holdout: no usable edges after canonicalization")
    ntype = arrow_types(E.schema())["u"]

    if m <= edge_broadcast_limit:
        # driver fast-path: one collect, zero further exchanges (falls
        # through to the distributed structure if the node set exceeds
        # node_broadcast_limit — forced-path tests exercise both)
        out = _edge_holdout_driver(E, m, ntype, train_fraction, seed,
                                   validation, neg_oversample, neg_train,
                                   num_partitions, node_broadcast_limit)
        if out is not None:
            return out

    F = spanning_forest(E, edge_broadcast_limit=edge_broadcast_limit,
                        num_partitions=num_partitions, pre_canonical=True)
    nontree = hash_join(E, F, on=["u", "v"], how="anti",
                        num_partitions=num_partitions).materialize()
    # floor of the exact fraction: the naive float product under-counts
    # ((1.0-0.8)*m = 0.19999...*m), so nudge by an epsilon before floor
    # Relative epsilon: float error in (1-f)*m scales with m, so an
    # absolute 1e-9 under-floors for m ≳ 1e8 (0.2*1e9 = 199999999.99...
    # would lose one edge vs the documented (1-f)*|E| count).
    n_nontree = nontree.count()
    k = min(int((1.0 - train_fraction) * m + 1e-9 + m * 1e-12), n_nontree)

    def _score(t: pa.Table) -> pa.Table:
        return t.append_column("__h", pa.array(_edge_hash(t, seed)))

    if k == 0:
        pos_test = E.limit(0)
    elif k == n_nontree:
        pos_test = nontree
    else:
        # k smallest-hash non-tree edges WITHOUT a global sort: exact
        # distributed k-th element gives the hash threshold, a map-only
        # filter takes everything under it; 64-bit-hash ties at the
        # threshold (≈ m²/2⁶⁴ expected, usually zero) resolve by (u, v)
        # on the driver.
        from kgray.kernels.selection import kth_smallest

        scored = nontree.map_batches(_score, batch_format="pyarrow").materialize()
        hstar = kth_smallest(scored, "__h", k, bounds=(0, 2**64 - 1))
        le = _pin(scored.map_batches(
            lambda t: t.filter(pc.less_equal(
                t.column("__h"), pa.scalar(hstar, pa.uint64()))),
            batch_format="pyarrow"), num_partitions)
        n_le = le.count()
        if n_le == k:
            pos_test = le.drop_columns(["__h"]).materialize()
        else:
            lt = le.map_batches(
                lambda t: t.filter(pc.less(
                    t.column("__h"), pa.scalar(hstar, pa.uint64()))),
                batch_format="pyarrow")
            ties = sorted(
                ((r["u"], r["v"]) for r in le.map_batches(
                    lambda t: t.filter(pc.equal(
                        t.column("__h"), pa.scalar(hstar, pa.uint64()))),
                    batch_format="pyarrow").take_all()))
            need = k - (n_le - len(ties))
            tie_tbl = pa.table({
                "u": pa.array([u for u, _ in ties[:need]], ntype),
                "v": pa.array([v for _, v in ties[:need]], ntype)})
            pos_test = (lt.drop_columns(["__h"])
                        .union(ray.data.from_arrow(tie_tbl)).materialize())
    pos_train = hash_join(E, pos_test, on=["u", "v"], how="anti",
                          num_partitions=num_partitions)

    # ---- negatives: k hash-generated non-edges -------------------------
    def _endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"node": _cat2(t.column("u"), t.column("v"))})

    def _dd_node(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["node"])

    nodes = grouped_apply(E.map_batches(_endpoints, batch_format="pyarrow"),
                          ["node"], _dd_node, num_partitions=num_partitions,
                          map_side=_dd_node).materialize()
    n_nodes = nodes.count()
    broadcast_nodes = n_nodes <= node_broadcast_limit
    if broadcast_nodes:
        # The SAME bijection the distributed index assigns: partition-
        # major, node-sorted within partition (pinned equal by pytest).
        ndf = nodes.to_pandas()
        ndf = add_partition_column(ndf, ["node"], num_partitions)
        ndf = ndf.sort_values(["__part", "node"], kind="mergesort")
        nodes_arr_ref = ray.put(pa.array(ndf["node"].to_numpy(), type=ntype))
        idx = None
    else:
        idx, n2 = _node_index(nodes, num_partitions)
        assert n2 == n_nodes
        idx = idx.materialize()  # joined twice (both candidate endpoints)

    k_neg = k + (m - k if neg_train else 0)
    if k_neg > 0 and n_nodes >= 2:
        n_cand = int(k_neg * neg_oversample) + 64
        s = np.uint64((seed * 0x9E3779B1 + 0xA5A5) & 0xFFFFFFFFFFFFFFFF)

        def _mk(t: pa.Table) -> pa.Table:
            i = t.column("id").to_numpy().astype(np.uint64)
            ia = (_mix64(i * np.uint64(2) + s) % np.uint64(n_nodes)).astype(np.int64)
            ib = (_mix64(i * np.uint64(2) + np.uint64(1) + s)
                  % np.uint64(n_nodes)).astype(np.int64)
            keep = ia != ib
            return pa.table({"i": pa.array(i[keep].astype(np.int64)),
                             "ia": pa.array(ia[keep]), "ib": pa.array(ib[keep])})

        cand = register_schema(
            ray.data.range(n_cand).map_batches(_mk, batch_format="pyarrow"),
            pa.schema([("i", pa.int64()), ("ia", pa.int64()),
                       ("ib", pa.int64())]))

        def _canon_ab(a, b, i):
            return pa.table({"u": pc.min_element_wise(a, b),
                             "v": pc.max_element_wise(a, b),
                             "i": i})

        if broadcast_nodes:
            def _gather(t: pa.Table) -> pa.Table:
                arr = ray.get(nodes_arr_ref) if isinstance(
                    nodes_arr_ref, ray.ObjectRef) else nodes_arr_ref
                a = pc.take(arr, t.column("ia"))
                b = pc.take(arr, t.column("ib"))
                return _canon_ab(a, b, t.column("i"))

            cand_pairs = register_schema(
                cand.map_batches(_gather, batch_format="pyarrow"),
                pa.schema([("u", ntype), ("v", ntype), ("i", pa.int64())]))
        else:
            c1 = hash_join(cand,
                           _rename(idx, [("node", "node_a"), ("idx", "ia")],
                                   {"node_a": ntype, "ia": pa.int64()}),
                           on="ia", how="inner", num_partitions=num_partitions)
            c2 = hash_join(c1,
                           _rename(idx, [("node", "node_b"), ("idx", "ib")],
                                   {"node_b": ntype, "ib": pa.int64()}),
                           on="ib", how="inner", num_partitions=num_partitions)
            cand_pairs = c2.map_batches(
                lambda t: _canon_ab(t.column("node_a"), t.column("node_b"),
                                    t.column("i")),
                batch_format="pyarrow")

        def _min_i(df: pd.DataFrame) -> pd.DataFrame:
            return df.sort_values(["u", "v", "i"],
                                  kind="mergesort").drop_duplicates(["u", "v"])

        cand_e = register_schema(
            _arrowize(grouped_apply(
                cand_pairs,
                ["u", "v"], _min_i, num_partitions=num_partitions,
                map_side=_min_i)),
            pa.schema([("u", ntype), ("v", ntype), ("i", pa.int64())]))
        neg_pool = _pin(hash_join(cand_e, E, on=["u", "v"], how="anti",
                                  num_partitions=num_partitions),
                        num_partitions)
        n_pool = neg_pool.count()
        if n_pool < k_neg:
            raise ValueError(
                f"edge_holdout: only {n_pool} negative pairs found "
                f"for {k_neg} requested — graph too dense for neg_oversample="
                f"{neg_oversample}; raise it.")
        # deterministic split by candidate rank: the k lowest-rank
        # negatives are the test pool, ranks k+1..k_neg the train pool.
        # Ranks i are UNIQUE (one candidate pair per id, dedup keeps the
        # min id per pair), so the exact distributed k-th element +
        # map-only range filters select exact counts — no global sort,
        # no driver materialization of the pool.
        from kgray.kernels.selection import kth_smallest

        cut = (kth_smallest(neg_pool, "i", k, bounds=(0, n_cand - 1))
               if k > 0 else -1)
        cut_all = (kth_smallest(neg_pool, "i", k_neg,
                               bounds=(0, n_cand - 1))
                   if n_pool > k_neg else None)
        negs = (neg_pool.filter(expr=f"i <= {cut}").drop_columns(["i"])
                .materialize() if k > 0 else E.limit(0))
        if neg_train and k_neg > k:
            tail = (f"i > {cut} and i <= {cut_all}" if cut_all is not None
                    else f"i > {cut}")
            negs_train = (neg_pool.filter(expr=tail).drop_columns(["i"])
                          .materialize())
        else:
            negs_train = None
    else:
        negs = E.limit(0)
        negs_train = None

    # ---- assemble -------------------------------------------------------
    def _tag(name: str):
        def _f(t: pa.Table) -> pa.Table:
            return pa.table({"u": t.column("u"), "v": t.column("v"),
                             "split": pa.array([name] * len(t), pa.string())})
        return _f

    def _tag_parity(even: str, odd: str, parity_seed: int):
        def _f(t: pa.Table) -> pa.Table:
            h = _edge_hash(t, parity_seed)
            names = np.where((h & np.uint64(1)).astype(bool), odd, even)
            return pa.table({"u": t.column("u"), "v": t.column("v"),
                             "split": pa.array(names, pa.string())})
        return _f

    parts = [pos_train.map_batches(_tag("pos_train"), batch_format="pyarrow")]
    if validation:
        parts.append(pos_test.map_batches(
            _tag_parity("pos_test", "pos_valid", seed + 101),
            batch_format="pyarrow"))
        parts.append(negs.map_batches(
            _tag_parity("neg_test", "neg_valid", seed + 101),
            batch_format="pyarrow"))
    else:
        parts.append(pos_test.map_batches(_tag("pos_test"), batch_format="pyarrow"))
        parts.append(negs.map_batches(_tag("neg_test"), batch_format="pyarrow"))
    if negs_train is not None:
        parts.append(negs_train.map_batches(_tag("neg_train"),
                                            batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
