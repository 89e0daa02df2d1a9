"""Canonicalization: resolve equivalent ids to one canonical id.

Reimplements kg-microbe-merge's merge-by-id semantics as the north rule
demands for web scale: equivalences (sameAs edges / CURIE
normalization) become connected components, and every component is
labeled by its lexicographic-min member. Two execution paths:

* ``union_find`` — driver-side, for equivalence sets that fit in one
  process (the alias/sameAs table is the *small* side of the pipeline
  by construction; even a 10^8-node KB's sameAs pairs are ~GBs). The
  resulting map is ``ray.put`` once and applied inside ``map_batches``
  — broadcast join, no shuffle.
* ``connected_components_distributed`` — iterative min-label
  propagation over a Dataset of edges, one hash-shuffle groupby per
  round, converging in O(component diameter) rounds (each round also
  propagates the best-known label transitively through the join, so
  star-shaped sameAs sets converge in 1-2 rounds). For when the
  equivalence graph itself outgrows a single node.

Partitioning assumption (documented per SURVEY §7.3): label
propagation shuffles on node id each round; skew is bounded because a
component's messages distribute over its member nodes, not one key.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data import Dataset


def sameas_pairs_from_alias_table(aliases: pa.Table) -> List[Tuple[str, str]]:
    """(curie, same_as) equivalence pairs; same_as may be '|'-joined.

    The non-empty filter runs in Arrow first — sameAs rows are a small
    fraction of a web KB, so the Python pair loop touches only those
    instead of the whole alias table."""
    t = aliases.select(["curie", "same_as"])
    sa = pc.fill_null(t.column("same_as"), "")
    t = t.filter(pc.greater(pc.utf8_length(sa), 0))
    curies = t.column("curie").to_pylist()
    sames = t.column("same_as").to_pylist()
    out = []
    for c, s in zip(curies, sames):
        if not s:
            continue
        for other in s.split("|"):
            if other:
                out.append((c, other))
    return out


def union_find(pairs: Iterable[Tuple[str, str]]) -> Dict[str, str]:
    """Driver-side union-find → {node: canonical_min_label}.

    Only nodes that appear in a pair are present in the map; absent
    nodes are their own canonical id (apply with ``.get(x, x)``).
    """
    parent: Dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def connected_components_distributed(
    edges: Dataset,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 25,
    num_partitions: Optional[int] = None,
    cast_ids: bool = True,
) -> Dataset:
    """Min-label propagation over an edge Dataset → Dataset(node, label).

    Each round: every node sends its current label to its neighbors
    (hash join on the edge endpoint), takes the min over received and
    own labels (groupby-min — an algebraic aggregate, so the shuffle
    moves partial minima, not raw messages), then POINTER-JUMP
    shortcuts ``label ← min(label, label[label])`` with one self-join.
    Terminates when a round changes no label or at ``max_iters``;
    star-shaped equivalence sets converge in 2 rounds, chains in
    O(log diameter) (the shortcut doubles how far the min label has
    travelled each round — plain propagation would need O(diameter)).

    ``cast_ids=False`` keeps the endpoints' NATIVE dtype (caller
    guarantees src/dst share one comparable type): min-label then means
    NUMERIC min for integer ids — matching :func:`union_find` run on
    the same pairs — instead of the lexicographic string min the
    default cast would impose ("10" < "9").
    """
    from kgray.kernels.kgx_agg import MinAny

    if max_iters < 1:
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    if num_partitions is None:
        from kgray.kernels.hashagg import auto_partitions

        num_partitions = auto_partitions()

    # Emit both directions inside ONE map pass (no union of two
    # selections from the same dataset — a fork would execute the edge
    # list's lazy lineage twice, e.g. a verified-near-dup-pairs join
    # pipeline, and doubles its shuffle-aggregator actors — enough to
    # starve a small cluster into deadlock). Materialized because the
    # symmetrized list is re-read every propagation round.
    def _both_dirs(t: pa.Table) -> pa.Table:
        s, d = t.column(src), t.column(dst)
        if cast_ids:
            s, d = s.cast(pa.string()), d.cast(pa.string())
        return pa.table({
            src: pa.chunked_array(s.chunks + d.chunks),
            dst: pa.chunked_array(d.chunks + s.chunks),
        })

    both = edges.select_columns([src, dst]).map_batches(
        _both_dirs, batch_format="pyarrow"
    ).materialize()

    labels = (
        both.groupby(src)
        .aggregate(MinAny(dst, alias_name="nbr_min"))
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t.column(src),
                    "label": pc.min_element_wise(t.column(src), t.column("nbr_min")),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def _as_arrow(cols):
        # Normalize block format: Ray's aggregate can emit pandas
        # blocks, and the Project op behind rename_columns/select
        # assumes Arrow — route every rename through an Arrow
        # map_batches instead.
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({name: t.column(old) for old, name in cols})

        return fn

    for _ in range(max_iters):
        # Neighbor messages: node u's label travels to each neighbor v.
        msgs = both.join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=(src,),
            right_on=("node",),
        ).map_batches(
            lambda t: pa.table({"node": t.column(dst), "label": t.column("label")}),
            batch_format="pyarrow",
        )
        # pin_blocks, not bare materialize: each round consumes `labels`
        # twice (message join + changed-count join) and unions with
        # msgs — without bounding blocks and severing stats lineage the
        # loop doubles block count AND stats-tree size per round (the
        # measured exponential from the Borůvka work; see
        # hashagg.pin_blocks).
        from kgray.kernels.hashagg import pin_blocks

        prop = pin_blocks(
            labels.union(msgs)
            .groupby("node")
            .aggregate(MinAny("label", alias_name="label"))
            .map_batches(_as_arrow([("node", "node"), ("label", "label")]), batch_format="pyarrow"),
            num_partitions,
        )
        # Pointer-jump SHORTCUT: label ← min(label, label[label]) — one
        # self-join per round turns plain min-label propagation's
        # O(diameter) rounds into O(log diameter) (a chain's min label
        # otherwise travels ONE hop per round; squaring the pointer
        # doubles the hop). Labels are themselves node ids, so every
        # label resolves in the label table (inner join is total).
        short = prop.join(
            prop.map_batches(_as_arrow([("node", "lnode"), ("label", "llabel")]),
                             batch_format="pyarrow"),
            join_type="inner",
            num_partitions=num_partitions,
            on=("label",),
            right_on=("lnode",),
        ).map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "label": pc.min_element_wise(t.column("label"),
                                             t.column("llabel")),
            }),
            batch_format="pyarrow",
        )
        new_labels = pin_blocks(short, num_partitions)
        changed = (
            new_labels.map_batches(
                _as_arrow([("node", "node"), ("label", "new_label")]), batch_format="pyarrow"
            )
            .join(
                labels,
                join_type="inner",
                num_partitions=num_partitions,
                on=("node",),
                right_on=("node",),
            )
            .filter(expr="new_label != label")
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # Loop exhausted max_iters without a zero-change round: labels
        # are NOT a fixpoint (a chain longer than max_iters would split
        # one component into several). Fail loudly instead of emitting
        # silently-wrong canonical ids.
        raise RuntimeError(
            f"connected_components_distributed did not converge in "
            f"{max_iters} rounds (last round changed {changed} labels); "
            "raise max_iters (log2 of the component diameter exceeds it)."
        )
    return labels


def canonical_map_from_aliases(aliases: pa.Table) -> Dict[str, str]:
    return union_find(sameas_pairs_from_alias_table(aliases))


def canonical_state(cmap: Dict[str, str]) -> Optional[Dict[str, "np.ndarray"]]:
    """{id: canonical} dict → sorted fixed-width numpy byte arrays for
    ``ray.put`` + ZERO-COPY ``ray.get`` in every actor (a dict would
    deserialize one private heap copy per actor — the same per-actor
    contention the linker state rewrite eliminated; ADVICE r2).
    Returns None for an empty map (callers skip the rewrite)."""
    import numpy as np

    from kgray.stages.linking import _string_array_to_S

    if not cmap:
        return None
    keys = sorted(cmap)
    key_S = _string_array_to_S(pa.array(keys, type=pa.string()))
    val_S = _string_array_to_S(pa.array([cmap[k] for k in keys], type=pa.string()))
    return {"key": key_S, "val": val_S}


def probe_rewrite_column(col: pa.ChunkedArray, key_S, val_S) -> pa.Array:
    """Vectorized canonical rewrite of ONE Arrow string column via a
    sorted binary-search probe against the shared ``canonical_state``
    arrays — the per-batch form of ``build_node_table``'s rewrite.
    Values absent from the map keep themselves. All work is O(batch):
    the (large, shared) key/val arrays are only read, never copied."""
    import numpy as np

    from kgray.stages.linking import _string_array_to_S

    cur_S = _string_array_to_S(col)
    if not len(cur_S) or not len(key_S):
        return pa.array(cur_S).cast(pa.string()) if len(cur_S) else pa.array([], type=pa.string())
    w = key_S.dtype.itemsize
    # Values longer than the key width cannot match; mask them so the
    # truncating astype below cannot produce false hits.
    ok = np.char.str_len(cur_S) <= w
    arr = cur_S.astype(f"S{w}")
    idx = np.searchsorted(key_S, arr)
    idx_c = np.minimum(idx, len(key_S) - 1)
    hit = (key_S[idx_c] == arr) & ok
    wo = max(val_S.dtype.itemsize, cur_S.dtype.itemsize)
    out = np.where(hit, val_S[idx_c].astype(f"S{wo}"), cur_S.astype(f"S{wo}"))
    return pa.array(out).cast(pa.string())


def apply_canonical_join(
    ds: Dataset,
    labels: Dataset,
    columns: Iterable[str],
    num_partitions: int = 16,
) -> Dataset:
    """Rewrite id columns through a ``(node, label)`` label Dataset via
    LEFT OUTER hash joins — the scale path of :func:`apply_canonical_map`
    for label maps too large to ``ray.put`` (north-rule giant-KB case).
    Ids absent from the map keep their value. One shuffle of ``ds`` per
    rewritten column; use the broadcast path whenever the map fits a
    node's object store — it is strictly cheaper.
    """
    cols = list(columns)

    for c in cols:
        lab_c = f"__label_{c}"

        def _ren(t: pa.Table, _c=c, _lc=lab_c) -> pa.Table:
            return pa.table({_c: t.column("node"), _lc: t.column("label")})

        joined = ds.join(
            labels.map_batches(_ren, batch_format="pyarrow"),
            join_type="left_outer",
            num_partitions=num_partitions,
            on=(c,),
        )

        def _coalesce(t: pa.Table, _c=c, _lc=lab_c) -> pa.Table:
            val = pc.if_else(pc.is_valid(t.column(_lc)), t.column(_lc), t.column(_c))
            t = t.drop_columns([_lc])
            return t.set_column(t.column_names.index(_c), _c, val)

        ds = joined.map_batches(_coalesce, batch_format="pyarrow")
    return ds


def apply_canonical_map(
    ds: Dataset,
    mapping_ref,
    columns: Iterable[str],
) -> Dataset:
    """Rewrite id columns through the canonical map (broadcast join).

    ``mapping_ref``: ray.ObjectRef of the {id: canonical} dict —
    ``ray.put`` once on the driver; each task/actor reads it from the
    object store (zero-copy within a node), never re-shipped per batch.
    """
    cols = list(columns)

    def _apply(df):
        mapping = ray.get(mapping_ref) if isinstance(mapping_ref, ray.ObjectRef) else mapping_ref
        for c in cols:
            mapped = df[c].map(mapping)  # C hashtable lookup
            df[c] = mapped.where(mapped.notna(), df[c])
        return df

    return ds.map_batches(_apply, batch_format="pandas")
