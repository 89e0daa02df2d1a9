"""Edge↔node referential-integrity check + stub-node repair.

Reimplements the reference's repair loop (utils/edge_vs_node_check.py):
J1 — collect distinct edge endpoints, anti-join against the node table
to find dangling ids (:45-58); M5 — infer a category from the CURIE
prefix (:7-20); J2 — fabricate typed stub node rows and union them into
the node table (:61-78, Makefile:27-33).

The anti-join runs as a broadcast semi-filter when the node-id set fits
in the object store (``ray.put`` once, membership test per batch —
no shuffle), with a hash-join fallback for when it doesn't.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data import Dataset


from kgray.constants import CATEGORY_PREFIX_MAP, UNKNOWN_CATEGORY


def infer_category(curie: Optional[str], prefix_map: Sequence[Tuple[str, str]] = None) -> str:
    """M5: first matching CURIE prefix wins; no match → 'Unknown'."""
    prefix_map = prefix_map or CATEGORY_PREFIX_MAP
    if curie:
        for prefix, category in prefix_map:
            if curie.startswith(prefix):
                return category
    return UNKNOWN_CATEGORY


def infer_category_batch(t: pa.Table, col: str = "id", prefix_map=None) -> pa.Table:
    """Vectorized M5: cascade of pc.starts_with masks."""
    prefix_map = prefix_map or CATEGORY_PREFIX_MAP
    ids = t.column(col)
    cat = pa.nulls(len(t), type=pa.string())
    # Build from the LAST prefix backwards so the FIRST match wins.
    for prefix, category in reversed(list(prefix_map)):
        mask = pc.fill_null(pc.starts_with(ids, prefix), False)
        cat = pc.if_else(mask, pa.scalar(category, type=pa.string()), cat)
    cat = pc.fill_null(cat, UNKNOWN_CATEGORY)
    return t.append_column("category", cat)


def edge_endpoints(edges: Dataset, num_partitions: int = 32) -> Dataset:
    """Distinct(subject ∪ object) (reference :46-50) as one column 'id' —
    hash-partitioned vectorized distinct.

    Both endpoint columns are stacked inside ONE ``map_batches`` pass
    (with a batch-local dedup as the combiner), not a union of two
    selections from the same dataset — the edge list is consumed
    exactly once and its lazy upstream never forks."""
    from kgray.kernels.hashagg import distinct

    def _stack(t: pa.Table) -> pa.Table:
        ids = pa.chunked_array(t.column("subject").chunks + t.column("object").chunks)
        return pa.table({"id": pc.unique(ids)})

    stacked = edges.select_columns(["subject", "object"]).map_batches(
        _stack, batch_format="pyarrow"
    )
    return distinct(stacked, ["id"], num_partitions=num_partitions)


def missing_endpoints(
    edges: Dataset,
    nodes: Dataset,
    broadcast_limit: int = 50_000_000,
) -> Dataset:
    """J1 anti-join: endpoint ids with no node row.

    Broadcast path: ``ray.put`` the node-id set once, filter endpoint
    batches by membership. Falls back to a hash left-join + null filter
    when the node table is too large to broadcast.
    """
    endpoints = edge_endpoints(edges)
    n_nodes = nodes.count()
    if n_nodes <= broadcast_limit:
        known_ids = pa.concat_arrays(
            [
                b.column("id").combine_chunks()
                for b in nodes.select_columns(["id"]).iter_batches(
                    batch_format="pyarrow", batch_size=1 << 20
                )
            ]
        )
        ref = ray.put(known_ids)

        def _anti(t: pa.Table) -> pa.Table:
            known = ray.get(ref)
            mask = pc.invert(pc.is_in(t.column("id"), value_set=known))
            return t.filter(mask)

        return endpoints.map_batches(_anti, batch_format="pyarrow")
    def _mark(t: pa.Table) -> pa.Table:
        # Sentinel column: the hash join merges the key columns, so a
        # match is only observable via a non-key right-side column.
        return pa.table(
            {"id": t.column("id"), "__hit": pa.array([1] * t.num_rows, type=pa.int8())}
        )

    joined = endpoints.join(
        nodes.select_columns(["id"]).map_batches(_mark, batch_format="pyarrow"),
        join_type="left_outer",
        num_partitions=max(8, n_nodes // 5_000_000),
        on=("id",),
    )

    def _null_only(t: pa.Table) -> pa.Table:
        # Ray's string-expr parser has no `is null`; Arrow kernel instead.
        return t.filter(pc.is_null(t.column("__hit"))).select(["id"])

    return joined.map_batches(_null_only, batch_format="pyarrow")


def stub_nodes(
    missing: Dataset,
    node_columns: Iterable[str],
    prefix_map=None,
) -> Dataset:
    """J2: typed stub node rows matching the node table's schema."""
    cols: List[str] = list(node_columns)

    def _build(t: pa.Table) -> pa.Table:
        t2 = infer_category_batch(t, "id", prefix_map)
        arrays, names = [], []
        for c in cols:
            names.append(c)
            if c == "id":
                arrays.append(t2.column("id"))
            elif c == "category":
                arrays.append(t2.column("category"))
            else:
                arrays.append(pa.nulls(len(t2), type=pa.string()))
        return pa.Table.from_arrays(arrays, names=names)

    return missing.map_batches(_build, batch_format="pyarrow")


def repair_graph(edges: Dataset, nodes: Dataset, prefix_map=None) -> Dataset:
    """Full reference repair loop: nodes ∪ typed stubs for dangling ids."""
    missing = missing_endpoints(edges, nodes)
    stubs = stub_nodes(missing, nodes.schema().names, prefix_map)
    return nodes.union(stubs)
