"""Iterative graph algorithms over edge Datasets: PageRank.

Connected components (the other iterative op) lives in
``stages/canonical.py``; PageRank shares its scale discipline but a
different data-movement shape. Per iteration nothing shuffles at all:
the rank vector is ``ray.put`` ONCE (zero-copy numpy in plasma, one
physical copy per node — the same broadcast pattern as the entity
linker state and the CC label map), each map task folds its edge
batch's contributions into a DENSE length-N partial vector with one
``np.add.at``, and partials merge by elementwise SUM on the driver —
the mergeable-sketch pattern (cf. ``stages/sketch.py``) applied to a
vector instead of a grid. Cost per iteration: one streaming pass over
the (materialized-once) edge list + O(N) per task for the partial.

Scale bound: the node count N must fit a worker's heap twice
(rank vector + partial), i.e. N ≲ 500M at 8 bytes — the documented
broadcast limit. Beyond it the size switch routes to
:func:`pagerank_exchange` (edges joined with ranks on src, grouped sum
by dst, state join back) — exactly like `construct`'s giant-KB back
half vs its broadcast front; it trades ~3 exchanges/iteration for
unbounded N, and returns the ranks as a Dataset so nothing driver-side
is ever sized O(nodes).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data import Dataset


def pagerank(
    edges: Dataset,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iters: int = 50,
    tol: float = 1e-10,
    broadcast_limit: int = 100_000_000,
) -> Tuple[pa.Table, int]:
    """PageRank over a directed edge Dataset → (Table(node, rank), iters).

    Standard random-surfer model: duplicate edges count as parallel
    edges (a node linking twice contributes twice), dangling mass is
    redistributed uniformly, ranks sum to 1. Terminates at L1 delta
    < ``tol`` or raises at ``max_iters`` (a non-converged rank vector
    is silently wrong for downstream consumers — same loud-failure
    policy as ``connected_components_distributed``).
    """
    if max_iters < 1:
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")

    # Materialize once: the edge list is re-scanned every iteration and
    # may carry join-heavy lineage (see canonical.py:108 for why).
    e = edges.select_columns([src, dst]).materialize()

    # ---- size switch BEFORE any O(nodes) driver fold ---------------------
    # The broadcast path's node/out-degree fold is itself O(nodes) on
    # the driver, so the dispatch must precede it.  2·|edge rows| bounds
    # the node count; when that bound exceeds the limit, one distributed
    # distinct-count pass decides exactly (negligible next to the
    # exchange variant's per-iteration cost).
    if 2 * e.count() > broadcast_limit:
        from kgray.kernels.hashagg import auto_partitions, grouped_apply

        def _nodes_only(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc
            return pa.table({"node": pa.concat_arrays([
                _pc.unique(t.column(src).combine_chunks()),
                _pc.unique(t.column(dst).combine_chunks())])})

        def _dd(df: "pd.DataFrame") -> "pd.DataFrame":
            return df.drop_duplicates(["node"])

        n_exact = grouped_apply(
            e.map_batches(_nodes_only, batch_format="pyarrow"), ["node"],
            _dd, num_partitions=auto_partitions(), map_side=_dd).count()
        if n_exact > broadcast_limit:
            # rank-exchange variant: ranks stay a Dataset, ~3 exchanges
            # per iteration, nothing driver-side sized O(nodes)
            return pagerank_exchange(e, src=src, dst=dst, damping=damping,
                                     max_iters=max_iters, tol=tol)

    # ---- node index + out-degree: one streaming pass --------------------
    # Node ids must be integers on this (broadcast) path: the rank
    # vector is indexed by searchsorted over a fixed-width id array.
    def _ends(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        # per-batch out-degree partials (map-side combine)
        vc = t.column(src).combine_chunks().value_counts()
        du = _pc.unique(t.column(dst)).cast(pa.int64())
        return pa.table({
            "node": pa.concat_arrays([vc.field("values").cast(pa.int64()), du]),
            "outdeg": pa.concat_arrays(
                [vc.field("counts"), pa.nulls(len(du), pa.int64())]
            ),
        })

    node_parts = [
        b for b in e.map_batches(_ends, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    if not node_parts:
        return pa.table({"node": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.float64())}), 0
    nd = pa.concat_tables(node_parts).to_pandas()
    deg = nd.groupby("node", sort=True)["outdeg"].sum().astype(np.int64)
    nodes = deg.index.to_numpy(np.int64)  # sorted → searchsorted probes
    outdeg = deg.to_numpy()
    n = len(nodes)
    if n == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.float64())}), 0
    nodes_ref = ray.put(nodes)

    # ---- power iteration: one shuffle-free pass per round ----------------
    dangling = outdeg == 0
    ranks = np.full(n, 1.0 / n)
    it = 0
    for it in range(1, max_iters + 1):
        # Pre-divide by out-degree so the map side is a pure gather+add.
        w = np.where(dangling, 0.0, ranks / np.maximum(outdeg, 1))
        w_ref = ray.put(w)

        def _contrib(t: pa.Table) -> pa.Table:
            idx = ray.get(nodes_ref)  # zero-copy plasma
            wv = ray.get(w_ref)
            si = np.searchsorted(idx, t.column(src).to_numpy())
            di = np.searchsorted(idx, t.column(dst).to_numpy())
            part = np.zeros(len(idx))
            np.add.at(part, di, wv[si])
            return pa.table({"part": pa.array([part.tobytes()], pa.binary())})

        sums = np.zeros(n)
        for b in e.map_batches(
            _contrib, batch_format="pyarrow", batch_size=65536
        ).iter_batches(batch_format="pyarrow"):
            for buf in b.column("part").to_pylist():
                sums += np.frombuffer(buf)
        dangling_mass = float(ranks[dangling].sum())
        new_ranks = (1.0 - damping) / n + damping * (sums + dangling_mass / n)
        delta = float(np.abs(new_ranks - ranks).sum())
        ranks = new_ranks
        if delta < tol:
            break
    else:
        raise RuntimeError(
            f"pagerank did not converge in {max_iters} iterations "
            f"(last L1 delta {delta:.3e} >= tol {tol:.1e}); raise max_iters."
        )
    return pa.table({"node": pa.array(nodes), "rank": pa.array(ranks)}), it


def pagerank_exchange(
    edges: Dataset,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iters: int = 50,
    tol: float = 1e-10,
    num_partitions: Optional[int] = None,
) -> Tuple[Dataset, int]:
    """Rank-exchange PageRank — the size-switched sibling of the
    broadcast path for graphs whose NODE SET outgrows a worker's heap.
    Identical model (parallel edges, uniform dangling redistribution,
    L1/tol termination, loud non-convergence); returns the ranks as a
    ``Dataset(node, rank)`` — nothing driver-side or broadcast is ever
    sized O(nodes), only O(1) scalars (n, dangling mass, L1 delta) fold
    to the driver.

    Data movement per iteration (the documented trade vs the broadcast
    path's zero): ① edges ⋈ state on src (exchange over edges + n state
    rows) → per-edge contributions, ② grouped SUM by dst with map-side
    combine (exchange over combined per-node rows), ③ state ⋈ sums on
    node (two O(n) sides).  Every iterate is block-pinned and
    lineage-severed (``pin_blocks``) — the iterative-Dataset discipline
    from the Borůvka/CC family.
    """
    import pyarrow.compute as pc

    from kgray.kernels.hashagg import (arrow_types, auto_partitions,
                                       grouped_apply, pin_blocks,
                                       register_schema)
    from kgray.stages.relational import hash_join

    if max_iters < 1:
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    if num_partitions is None:
        num_partitions = auto_partitions()

    e = edges.select_columns([src, dst]).materialize()
    if e.count() == 0:
        return e.map_batches(
            lambda t: pa.table({"node": pa.array([], pa.int64()),
                                "rank": pa.array([], pa.float64())}),
            batch_format="pyarrow"), 0
    ntype = arrow_types(e.schema())[src]

    # ---- state: (node, deg, rank) — one exchange to build ---------------
    def _ends(t: pa.Table) -> pa.Table:
        vc = t.column(src).combine_chunks().value_counts()
        du = pc.unique(t.column(dst).combine_chunks())
        return pa.table({
            "node": pa.concat_arrays([
                vc.field("values").cast(ntype), du.cast(ntype)]),
            "deg": pa.concat_arrays([vc.field("counts").cast(pa.int64()),
                                     pa.nulls(len(du), pa.int64())]),
        })

    def _sumdeg(df: "pd.DataFrame") -> "pd.DataFrame":
        return df.groupby("node", as_index=False, sort=False)["deg"].sum(
            min_count=0).fillna({"deg": 0})

    deg_ds = grouped_apply(
        e.map_batches(_ends, batch_format="pyarrow"), ["node"], _sumdeg,
        num_partitions=num_partitions, map_side=_sumdeg)
    deg_ds = pin_blocks(deg_ds.map_batches(
        lambda t: pa.table({"node": t.column("node").cast(ntype),
                            "deg": t.column("deg").cast(pa.int64())}),
        batch_format="pyarrow"), num_partitions)
    n = deg_ds.count()
    r0 = 1.0 / n
    state = pin_blocks(deg_ds.map_batches(
        lambda t: t.append_column(
            "rank", pa.array(np.full(len(t), r0, np.float64))),
        batch_format="pyarrow"), num_partitions)

    def _fold2(ds: Dataset, fn) -> Tuple[float, float]:
        """Fold two float partials per batch to the driver (O(blocks))."""
        a = b = 0.0
        for blk in ds.map_batches(fn, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            a += float(blk.column("a").to_numpy().sum())
            b += float(blk.column("b").to_numpy().sum())
        return a, b

    def _dangling_partial(t: pa.Table) -> pa.Table:
        r = t.column("rank").to_numpy(zero_copy_only=False)
        d = t.column("deg").to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array([float(r[d == 0].sum())]),
                         "b": pa.array([0.0])})

    dangling_mass, _ = _fold2(state, _dangling_partial)
    state_t = {"node": ntype, "deg": pa.int64(), "rank": pa.float64()}

    it = 0
    for it in range(1, max_iters + 1):
        # ① per-edge contributions: join src → w = rank/deg (deg > 0)
        w_src = register_schema(state.map_batches(
            lambda t: pa.table({
                src: t.column("node"),
                "__w": pc.divide(
                    t.column("rank"),
                    pc.cast(pc.max_element_wise(
                        t.column("deg"), pa.scalar(1, pa.int64())),
                        pa.float64())),
            }).filter(pc.greater(t.column("deg"), pa.scalar(0, pa.int64()))),
            batch_format="pyarrow"),
            pa.schema([(src, ntype), ("__w", pa.float64())]))
        contrib = hash_join(e, w_src, on=src, how="inner",
                            num_partitions=num_partitions)

        # ② grouped SUM by destination (map-side combined)
        def _to_node(t: pa.Table) -> pa.Table:
            return pa.table({"node": t.column(dst), "c": t.column("__w")})

        def _sumc(df: "pd.DataFrame") -> "pd.DataFrame":
            return df.groupby("node", as_index=False, sort=False)["c"].sum()

        sums = register_schema(
            grouped_apply(
                contrib.map_batches(_to_node, batch_format="pyarrow"),
                ["node"], _sumc, num_partitions=num_partitions,
                map_side=_sumc
            ).map_batches(
                lambda t: pa.table({"node": t.column("node").cast(ntype),
                                    "c": t.column("c").cast(pa.float64())}),
                batch_format="pyarrow"),
            pa.schema([("node", ntype), ("c", pa.float64())]))

        # ③ rank update: state LEFT JOIN sums
        base = (1.0 - damping) / n + damping * dangling_mass / n
        j = hash_join(register_schema(
            state, pa.schema(list(state_t.items()))), sums,
            on="node", how="left", num_partitions=num_partitions)

        def _update(t: pa.Table) -> pa.Table:
            c = pc.fill_null(t.column("c"), 0.0)
            new = pc.add(pc.multiply(c, pa.scalar(damping, pa.float64())),
                         pa.scalar(base, pa.float64()))
            return pa.table({"node": t.column("node"), "deg": t.column("deg"),
                             "rank": new, "prev": t.column("rank")})

        new_state = pin_blocks(j.map_batches(_update, batch_format="pyarrow"),
                               num_partitions)

        # fold |Δ| and the NEXT round's dangling mass in one pass
        def _delta_dangling(t: pa.Table) -> pa.Table:
            r = t.column("rank").to_numpy(zero_copy_only=False)
            p = t.column("prev").to_numpy(zero_copy_only=False)
            d = t.column("deg").to_numpy(zero_copy_only=False)
            return pa.table({"a": pa.array([float(np.abs(r - p).sum())]),
                             "b": pa.array([float(r[d == 0].sum())])})

        delta, dangling_mass = _fold2(new_state, _delta_dangling)
        state = pin_blocks(new_state.map_batches(
            lambda t: t.drop_columns(["prev"]), batch_format="pyarrow"),
            num_partitions)
        if delta < tol:
            break
    else:
        raise RuntimeError(
            f"pagerank_exchange did not converge in {max_iters} iterations "
            f"(last L1 delta {delta:.3e} >= tol {tol:.1e}); raise max_iters."
        )
    return state.select_columns(["node", "rank"]), it


def pagerank_dense_reference(
    src: np.ndarray, dst: np.ndarray, damping: float = 0.85,
    max_iters: int = 50, tol: float = 1e-10,
) -> "pd.Series":
    """Exact dense-numpy PageRank over an in-memory edge list — the
    oracle for the distributed operator (identical model: parallel
    edges, uniform dangling redistribution, L1/tol termination)."""
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    outdeg = np.bincount(si, minlength=n)
    dangling = outdeg == 0
    ranks = np.full(n, 1.0 / n)
    for _ in range(max_iters):
        w = np.where(dangling, 0.0, ranks / np.maximum(outdeg, 1))
        sums = np.zeros(n)
        np.add.at(sums, di, w[si])
        new_ranks = (1 - damping) / n + damping * (sums + ranks[dangling].sum() / n)
        if np.abs(new_ranks - ranks).sum() < tol:
            ranks = new_ranks
            break
        ranks = new_ranks
    return pd.Series(ranks, index=nodes)


def degree_distribution(
    edges: Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions=None,
) -> Dataset:
    """Out-degree distribution: distinct-neighbor degree per source
    node, then node counts per degree — the first structural profile of
    any graph build (skew detection BEFORE choosing join salts).

    Scale shape: exchange 1 hash-partitions edges by src with a
    map-side (src, dst) drop_duplicates combiner; the per-partition
    reduce is a vectorized nunique emitting one (degree) row per node;
    exchange 2 moves O(nodes-per-degree) combined counts only.
    """
    import pandas as pd

    from kgray.kernels.hashagg import auto_partitions, grouped_apply

    if num_partitions is None:
        num_partitions = auto_partitions()

    def _dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=[src_col, dst_col])

    def _degree(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(subset=[src_col, dst_col])
        g = df.groupby(src_col, sort=False)[dst_col].nunique().rename("degree")
        return g.reset_index()[["degree"]]

    per_node = grouped_apply(
        edges.select_columns([src_col, dst_col]), [src_col], _degree,
        num_partitions=num_partitions, map_side=_dedup,
    )

    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("degree", sort=False).size().rename("n").reset_index()

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("degree", sort=False)["n"].sum().rename("n_nodes").reset_index()
        out["n_nodes"] = out["n_nodes"].astype("int64")
        return out

    return grouped_apply(per_node, ["degree"], _reduce,
                         num_partitions=num_partitions, map_side=_combine)


def triangle_count(
    edges: Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions=None,
) -> "pa.Table":
    """Exact global triangle count of an undirected graph — the
    clustering-structure statistic (community density, spam-graph
    detection) — via the classic wedge-join in TWO exchanges.

    1. Exchange 1 (keyed by the lower endpoint ``a``): edges
       canonicalize to a<b map-side (self-loops dropped, per-batch
       dedup combiner); a partition holds every edge of its ``a`` keys,
       so the in-partition dedup is global. Each partition then emits
       its edges tagged kind=0 plus every wedge (b, c), b<c, from each
       a's neighbor set (vectorized self-merge, no Python loop) tagged
       kind=1.
    2. Exchange 2 (keyed by the (x, y) pair): a triangle {a<b<c} is
       counted exactly once — its wedge (b, c) generated at ``a`` meets
       its closing edge (b, c). Per-partition count partials fold to
       the driver (O(partitions) ints).

    Scale note: wedge volume is Σ_a C(deg(a), 2) — the standard bound.
    For skewed graphs the known upgrade is degree-ordered orientation
    (generate wedges at the LOWEST-degree endpoint), which caps wedge
    volume by arboricity; this implementation uses id-orientation,
    which is exact and fine for bounded-degree graphs.
    """
    import pandas as pd

    from kgray.kernels.hashagg import auto_partitions, grouped_apply

    if num_partitions is None:
        num_partitions = auto_partitions()

    def _canon(df: pd.DataFrame) -> pd.DataFrame:
        s = df[src_col].to_numpy()
        d = df[dst_col].to_numpy()
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        out = pd.DataFrame({"a": a, "b": b})
        return out[out["a"] != out["b"]].drop_duplicates()

    def _wedges(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        m = df.merge(df, on="a")  # C hash join: all neighbor pairs per a
        w = m[m["b_x"] < m["b_y"]]
        wedges = pd.DataFrame({"x": w["b_x"].to_numpy(), "y": w["b_y"].to_numpy()})
        wedges["kind"] = np.int8(1)
        es = pd.DataFrame({"x": df["a"].to_numpy(), "y": df["b"].to_numpy()})
        es["kind"] = np.int8(0)
        return pd.concat([es, wedges], ignore_index=True)

    tagged = grouped_apply(
        edges.select_columns([src_col, dst_col]), ["a"], _wedges,
        num_partitions=num_partitions, map_side=_canon,
    )

    def _close(df: pd.DataFrame) -> pd.DataFrame:
        es = df[df["kind"] == 0][["x", "y"]].drop_duplicates()
        ws = df[df["kind"] == 1].groupby(["x", "y"], sort=False).size().rename("n").reset_index()
        n = int(ws.merge(es, on=["x", "y"])["n"].sum())
        return pd.DataFrame({"n": [n]})

    partials = grouped_apply(tagged, ["x", "y"], _close, num_partitions=num_partitions)
    total = 0
    for b in partials.iter_batches(batch_format="pandas"):
        total += int(b["n"].sum())
    return pa.table({"n_triangles": pa.array([total], pa.int64())})


def bfs_distances(
    edges: Dataset,
    seeds: Dataset,
    max_depth: int = 4,
    src_col: str = "u",
    dst_col: str = "v",
    node_col: str = "node",
    num_partitions: Optional[int] = None,
    broadcast_limit: int = 2_000_000,
) -> Dataset:
    """Multi-source BFS: for every node reachable from ``seeds`` within
    ``max_depth`` UNDIRECTED hops, its minimum hop distance → rows
    ``(node, dist)``. The graph query behind "context within k hops of
    these entities" (neighborhood extraction for GraphRAG-style
    training samples).

    Level-synchronous frontier expansion with the engine's standard
    size switch:

    - **Broadcast path** (visited set ≤ ``broadcast_limit`` nodes — the
      typical neighborhood query, where the k-hop ball is tiny next to
      the edge table): frontier and visited sets ride ``ray.put`` once
      per round and every edge batch filters with one vectorized
      ``pc.is_in`` — the edge table STREAMS map-only, zero shuffles,
      and only candidate neighbors (per-batch pre-deduplicated) reach
      the driver. This is the 100-TB shape when the answer fits a
      broadcast; the edge table itself never moves.
    - **Exchange fallback** (frontier outgrows the limit mid-search):
      the round falls back to hash semi-join frontier⋈edges plus an
      anti-join against the visited set — all-to-all but unbounded.

    Distances are exact minima by construction (a node is visited the
    first round it is reachable). Rounds are bounded by ``max_depth``;
    an exhausted frontier stops early.
    """
    import pyarrow.compute as pc

    from kgray.kernels.hashagg import auto_partitions, grouped_apply
    from kgray.stages.relational import hash_join

    if num_partitions is None:
        num_partitions = auto_partitions()

    # Symmetrize once and MATERIALIZE: the edge list is probed by every
    # BFS round — without pinning it in the object store the upstream
    # (read + symmetrize) would re-execute per round. Both directions
    # are emitted inside ONE map pass (not a union of two selections
    # from the same dataset), so the input is consumed exactly once.
    def _both_dirs(t: pa.Table) -> pa.Table:
        s, d = t.column(src_col), t.column(dst_col)
        return pa.table({
            src_col: pa.chunked_array(s.chunks + d.chunks),
            dst_col: pa.chunked_array(d.chunks + s.chunks),
        })

    und = edges.select_columns([src_col, dst_col]).map_batches(
        _both_dirs, batch_format="pyarrow"
    ).materialize()

    def _dist_tag(d: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                node_col: t.column(node_col),
                "dist": pa.array(np.full(len(t), d, dtype=np.int64)),
            })
        return fn

    frontier = seeds.select_columns([node_col]).map_batches(
        lambda t: t.to_pandas().drop_duplicates(), batch_format="pyarrow"
    ).materialize()
    visited = [frontier.map_batches(_dist_tag(0), batch_format="pyarrow").materialize()]
    seen_nodes = frontier  # exchange-path visited set (Dataset)
    # Broadcast-path driver state: the visited set as a numpy array.
    # Held ONLY while it fits broadcast_limit — the documented small
    # side; beyond that the loop switches to the exchange path and the
    # driver copy is dropped.
    seen_np: Optional[np.ndarray] = None
    if frontier.count() <= broadcast_limit:
        seen_np = np.unique(np.concatenate([
            b[node_col].to_numpy()
            for b in frontier.iter_batches(batch_format="pandas")
        ] or [np.array([], dtype=object)]))

    for depth in range(1, max_depth + 1):
        n_frontier = frontier.count()
        if n_frontier == 0:
            break
        if seen_np is not None and len(seen_np) <= broadcast_limit:
            # ---- broadcast round: edges stream, zero shuffles ----
            f_np = np.concatenate([
                b[node_col].to_numpy()
                for b in frontier.iter_batches(batch_format="pandas")
            ])
            f_ref = ray.put(pa.array(f_np))
            s_ref = ray.put(pa.array(seen_np))

            def _expand(t: pa.Table, f_ref=f_ref, s_ref=s_ref) -> pa.Table:
                fset, sset = ray.get(f_ref), ray.get(s_ref)
                hit = t.filter(pc.is_in(t.column(src_col), value_set=fset))
                nxt = hit.column(dst_col)
                nxt = nxt.filter(pc.invert(pc.is_in(nxt, value_set=sset)))
                return pa.table({node_col: pc.unique(
                    nxt.combine_chunks() if isinstance(nxt, pa.ChunkedArray) else nxt)})

            cand = und.map_batches(_expand, batch_format="pyarrow")
            parts = [b[node_col].to_numpy()
                     for b in cand.iter_batches(batch_format="pandas")]
            fresh_np = (np.setdiff1d(np.unique(np.concatenate(parts)), seen_np)
                        if parts else np.array([], dtype=object))
            seen_np = np.concatenate([seen_np, fresh_np])
            ntype = pa.array(f_np[:1]).type  # pin node dtype for empty rounds
            frontier = ray.data.from_arrow(
                pa.table({node_col: pa.array(fresh_np, type=ntype)})).materialize()
        else:
            # ---- exchange round: frontier too large to broadcast ----
            seen_np = None
            probe = frontier.map_batches(
                lambda t: t.rename_columns([src_col]), batch_format="pyarrow"
            )
            neigh = hash_join(und, probe, on=src_col, how="semi",
                              num_partitions=num_partitions)
            neigh = neigh.select_columns([dst_col]).map_batches(
                lambda t: pa.table({node_col: t.column(dst_col)}),
                batch_format="pyarrow",
            )
            fresh = hash_join(neigh, seen_nodes, on=node_col, how="anti",
                              num_partitions=num_partitions)

            def _dedup(part: "pd.DataFrame") -> "pd.DataFrame":
                return part.drop_duplicates(subset=[node_col])

            frontier = grouped_apply(fresh, [node_col], _dedup,
                                     num_partitions=num_partitions,
                                     map_side=_dedup).materialize()
        visited.append(
            frontier.map_batches(_dist_tag(depth), batch_format="pyarrow").materialize()
        )
        seen_nodes = seen_nodes.union(frontier).materialize()

    out = visited[0]
    for v in visited[1:]:
        out = out.union(v)
    return out


def k_core(
    edges: Dataset,
    k: int,
    u_col: str = "u",
    v_col: str = "v",
    max_iters: int = 50,
    broadcast_limit: int = 2_000_000,
) -> Dataset:
    """Maximal k-core of an undirected graph: the unique largest node
    set whose induced subgraph has minimum degree ≥ k, by distributed
    peeling — each round drops every node whose current degree < k
    and the edges touching it, until a round removes nothing.

    Scale shape (mirrors bfs_distances' size switch): per round, ONE
    degree exchange (map-side (node, nbr) dedup combiner, vectorized
    nunique); the below-k node set — which SHRINKS every round — rides
    ``ray.put`` while it fits ``broadcast_limit`` and edge batches
    filter with a vectorized ``is_in``; past the limit the filter
    falls back to a hash anti-join on both endpoints. Input edges are
    symmetrized once; the working edge set is materialized per round
    (it is the loop-carried state — re-deriving it would re-run every
    earlier round's filter).

    Non-convergence within ``max_iters`` RAISES (a partially peeled
    graph is NOT a k-core; silent return would hand the caller a
    superset). Peeling terminates in ≤ rounds-to-degeneracy; raise
    ``max_iters`` for pathological chains.
    """
    import logging

    import pandas as pd

    from kgray.kernels.hashagg import auto_partitions, grouped_apply
    from kgray.stages.relational import hash_join

    logger = logging.getLogger(__name__)
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_iters < 1:
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    num_partitions = auto_partitions()

    def _sym(t: pa.Table) -> pa.Table:
        a, b = t.column(u_col), t.column(v_col)
        return pa.table({
            "u": pa.concat_arrays([a.combine_chunks().cast(pa.string()),
                                   b.combine_chunks().cast(pa.string())]),
            "v": pa.concat_arrays([b.combine_chunks().cast(pa.string()),
                                   a.combine_chunks().cast(pa.string())]),
        })

    work = edges.select_columns([u_col, v_col]).map_batches(
        _sym, batch_format="pyarrow").materialize()

    def _dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    def _below_k(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        deg = df.groupby("u", sort=False)["v"].nunique()
        return deg[deg < k].rename("deg").reset_index()[["u"]]

    removed_any = True
    for it in range(max_iters):
        below = grouped_apply(work, ["u"], _below_k,
                              num_partitions=num_partitions, map_side=_dedup)
        n_below = below.count()
        if n_below == 0:
            removed_any = False
            break
        if n_below <= broadcast_limit:
            drop = np.unique(below.to_pandas()["u"].to_numpy())
            dref = ray.put(drop.astype(object))

            def _filter(t: pa.Table, _ref=dref) -> pa.Table:
                import pyarrow.compute as pc

                ds_arr = ray.get(_ref)
                bad = pa.array(ds_arr, type=pa.string())
                keep = pc.and_(
                    pc.invert(pc.is_in(t.column("u"), value_set=bad)),
                    pc.invert(pc.is_in(t.column("v"), value_set=bad)),
                )
                return t.filter(keep)

            work = work.map_batches(_filter, batch_format="pyarrow").materialize()
        else:
            logger.warning("k_core: below-k set %d exceeds broadcast_limit; "
                           "anti-join fallback round", n_below)
            work = hash_join(work, below, on="u", how="anti",
                             num_partitions=num_partitions)
            work = hash_join(
                work.map_batches(lambda t: t.rename_columns(["v", "u"]),
                                 batch_format="pyarrow"),
                below, on="u", how="anti", num_partitions=num_partitions,
            ).map_batches(lambda t: t.rename_columns(["v", "u"]),
                          batch_format="pyarrow").materialize()
    else:
        raise RuntimeError(
            f"k_core did not converge in {max_iters} rounds (last round "
            f"still removed nodes); raise max_iters")
    if removed_any:
        raise RuntimeError("k_core: internal invariant violated")

    def _nodes(df: pd.DataFrame) -> pd.DataFrame:
        deg = df.drop_duplicates().groupby("u", sort=False)["v"].nunique()
        return pd.DataFrame({"node": deg.index.to_numpy(),
                             "degree": deg.to_numpy().astype("int64")})

    return grouped_apply(work, ["u"], _nodes,
                         num_partitions=num_partitions, map_side=_dedup)
