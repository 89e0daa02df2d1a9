"""KGX merge pipelines (the reference's core capability, Ray-Data-first).

Implements SURVEY.md §2.3/§2.4/§2.5:

* ``merge_nodes``  — GROUP BY id with the reference's exact per-column
  rules (duckdb_utils.py:267-385): priority-name COALESCE-MAX + sorted
  distinct pipe-join for every other column.
* ``merge_edges``  — DISTINCT (subject, predicate, object)
  (duckdb_utils.py:442-448) or the provenance-preserving variant
  (commented-out reference block :450-485 — re-enabled here because the
  two-phase Ray aggregation makes it tractable at scale).
* ``priority_merge_two_tables`` — the base⊕subset windowed-dedup path
  (merge_kg_tables / get_table_duplicates, duckdb_utils.py:84-188):
  keep-first-by-source-rank per key, duplicates as a side output.
* ``merge_kg`` — conformance entry point: N node files + N edge files →
  sorted nodes.tsv / edges.tsv byte-identical to the reference goldens.

Every groupby here is a two-phase algebraic aggregation (partial per
block → combine), so the shuffle moves accumulators, not raw rows, and
hot ids are absorbed in the partial phase.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import pandas as pd
import pyarrow as pa
import ray.data
from ray.data import Dataset
from ray.data.aggregate import Count

from kgray.constants import EDGE_KEY
from kgray.kernels.hashagg import distinct, grouped_apply, sorted_unique_join_frame
from kgray.sources.kgx_tsv import dataset_to_sorted_tsv, load_kgx_files, priority_sniff


def merge_nodes(
    nodes: Dataset,
    priority_sources: Sequence[str] = (),
    id_col: str = "id",
    name_col: str = "name",
    source_col: str = "provided_by",
    num_partitions: int = 64,
    salted: bool = False,
) -> Dataset:
    """§2.3 node merge: GROUP BY id, reference column rules, unsorted.

    Executed as a hash-partitioned vectorized aggregation
    (kernels/hashagg.grouped_apply): per-batch whole-row dedup combiner
    → exchange on H(id) → per-partition pandas reduce implementing the
    exact reference semantics — priority-name COALESCE-MAX
    (duckdb_utils.py:329-331) and sorted distinct pipe-join per other
    column (:332). Id-cardinality-independent: Ray sees only
    ``num_partitions`` groups. Output columns keep the input's order;
    sorting is the caller's concern (conformance mode sorts).

    ``salted=True`` is the skewed-head-entity path (north rule): a
    whole-row-hash DISTINCT exchange runs first, so a hot id's
    duplicate rows are eliminated spread across partitions by VALUE
    hash (the implicit salt) before any single partition must hold the
    id's group; the keyed exchange then only moves distinct rows.
    """
    schema_names = nodes.schema().names
    if salted:
        nodes = distinct(nodes, schema_names, num_partitions=num_partitions)

    def _reduce(part: pd.DataFrame) -> pd.DataFrame:
        return merge_nodes_frame(part, schema_names, priority_sources, id_col, name_col, source_col)

    return grouped_apply(
        nodes,
        [id_col],
        _reduce,
        num_partitions=num_partitions,
        map_side=lambda df: df.drop_duplicates(),
    )


def merge_nodes_table(
    t: pa.Table,
    schema_names: Sequence[str],
    priority_sources: Sequence[str] = (),
    id_col: str = "id",
    name_col: str = "name",
    source_col: str = "provided_by",
) -> pa.Table:
    """§2.3 node merge over one in-memory Arrow table — all pyarrow
    C kernels (group_by distinct/list/max, binary_join, hash joins).
    Used as the per-partition reduce of ``merge_nodes`` and directly
    for driver-side merges of small (KB-bounded) node tables."""
    import pyarrow.compute as pc

    from kgray.kernels.hashagg import sorted_unique_join_table

    priority = sorted(frozenset(priority_sources))
    other_cols = [c for c in schema_names if c not in (id_col, name_col)]
    out = sorted_unique_join_table(t, [id_col], other_cols)
    if name_col in schema_names:
        named = t.select(
            [id_col, name_col] + ([source_col] if source_col in t.column_names else [])
        ).filter(pc.is_valid(t.column(name_col)))
        overall = named.group_by(id_col).aggregate([(name_col, "max")])
        if priority and source_col in named.column_names:
            mask = pc.fill_null(
                pc.is_in(named.column(source_col), value_set=pa.array(priority, type=pa.string())),
                False,
            )
            prio = named.filter(mask).group_by(id_col).aggregate([(name_col, "max")])
            prio = prio.rename_columns([id_col, "__prio_max"])
            overall = overall.join(prio, keys=[id_col], join_type="left outer")
            name_val = pc.if_else(
                pc.is_valid(overall.column("__prio_max")),
                overall.column("__prio_max"),
                overall.column(f"{name_col}_max"),
            )
            names = pa.table({id_col: overall.column(id_col), name_col: name_val})
        else:
            names = pa.table(
                {id_col: overall.column(id_col), name_col: overall.column(f"{name_col}_max")}
            )
        out = out.join(names, keys=[id_col], join_type="left outer")
    return out.select(list(schema_names))


def merge_nodes_frame(
    part: pd.DataFrame,
    schema_names: Sequence[str],
    priority_sources: Sequence[str] = (),
    id_col: str = "id",
    name_col: str = "name",
    source_col: str = "provided_by",
) -> pd.DataFrame:
    """Pandas wrapper over :func:`merge_nodes_table`."""
    t = pa.Table.from_pandas(part, preserve_index=False)
    for i, f in enumerate(t.schema):
        if pa.types.is_null(f.type):
            t = t.set_column(i, f.name, t.column(f.name).cast(pa.string()))
    return merge_nodes_table(
        t, schema_names, priority_sources, id_col, name_col, source_col
    ).to_pandas()


def merge_edges(
    edges: Dataset,
    provenance: bool = False,
    key: Optional[List[str]] = None,
    num_partitions: int = 64,
    salted: bool = False,
    spill_dir: Optional[str] = None,
) -> Dataset:
    """§2.4 edge merge (hash-partitioned vectorized dedup).

    ``spill_dir`` switches the exchange to the spill-based hash
    exchange (kernels/hashagg.grouped_apply_spill — faster than the
    Sort op and checkpoint-friendly).

    ``provenance=False`` (reference current behavior): exact dedup on
    the triple, all non-key columns dropped (duckdb_utils.py:442-448) —
    per-batch ``drop_duplicates`` combiner, exchange on the triple
    hash, per-partition ``drop_duplicates`` reduce.
    ``provenance=True``: non-key columns merged as sorted distinct
    pipe-join (the reference's disabled-as-too-slow variant, golden
    ``expected_edges_merged_full.tsv``) — the two-phase form makes it
    tractable at scale.
    """
    key = key or list(EDGE_KEY)
    if not provenance:
        # DISTINCT partitions on the full triple hash, so hot subjects
        # already spread by (predicate, object) — inherently salted.
        return distinct(edges.select_columns(key), key, num_partitions=num_partitions)
    other = [c for c in edges.schema().names if c not in key]
    if salted:
        # Skew path: whole-row distinct first (hot triples' duplicate
        # provenance rows eliminated spread by value hash), then the
        # keyed exchange moves only distinct rows.
        edges = distinct(edges, key + other, num_partitions=num_partitions)

    if spill_dir is not None:
        from kgray.kernels.hashagg import grouped_apply_spill, sorted_unique_join_table

        def _table_reduce(t: pa.Table) -> pa.Table:
            return sorted_unique_join_table(t, key, other).select(key + other)

        return grouped_apply_spill(
            edges,
            key,
            _table_reduce,
            spill_dir=spill_dir,
            num_partitions=num_partitions,
            map_side=lambda df: df.drop_duplicates(),
        )

    def _reduce(part: pd.DataFrame) -> pd.DataFrame:
        return sorted_unique_join_frame(part, key, other).reset_index()[key + other]

    return grouped_apply(
        edges,
        key,
        _reduce,
        num_partitions=num_partitions,
        map_side=lambda df: df.drop_duplicates(),
    )


def priority_merge_two_tables(
    base: Dataset,
    subset: Dataset,
    key: Sequence[str],
    base_tag: str = "base",
    subset_tag: str = "subset",
    tag_column: str = "source_table",
    num_partitions: int = 64,
) -> Tuple[Dataset, Dataset]:
    """§2.5 two-table priority merge (duckdb_utils.py:84-188).

    Tags both inputs, unions them, then per key ranks base rows before
    subset rows (``ROW_NUMBER() OVER (PARTITION BY key ORDER BY CASE
    WHEN source_table = base THEN 1 ELSE 2 END)``, duckdb_utils.py:172-187)
    and splits rank 1 → merged, rank > 1 → duplicates.

    Returned datasets carry the ``source_table`` lineage column.
    Within-source rank ties are broken deterministically by the full row
    (the reference's ROW_NUMBER tie order is unspecified; we pin it so
    retries are idempotent). Ranking runs hash-partitioned and fully
    vectorized (sort + per-key cumcount per partition).
    """

    def _tag(tag: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(tag_column, pa.array([tag] * len(t), type=pa.string()))

        return fn

    tagged = base.map_batches(_tag(base_tag), batch_format="pyarrow").union(
        subset.map_batches(_tag(subset_tag), batch_format="pyarrow")
    )
    keys = list(key)

    def _rank(part: pd.DataFrame) -> pd.DataFrame:
        cols = list(part.columns)
        order = (part[tag_column] != base_tag).astype("int8")
        part = part.assign(__order=order).sort_values(
            keys + ["__order"] + cols, kind="mergesort"
        )
        part["__rank"] = part.groupby(keys, sort=False).cumcount() + 1
        return part.drop(columns="__order")

    ranked = grouped_apply(tagged, keys, _rank, num_partitions=num_partitions)
    merged = ranked.filter(expr="__rank == 1").drop_columns(["__rank"])
    duplicates = ranked.filter(expr="__rank > 1").drop_columns(["__rank"])
    return merged, duplicates


def dedup_whole_rows(ds: Dataset, num_partitions: int = 64) -> Dataset:
    """O5 (reference utils/pandas_utils.py:8-17 drop_duplicates): exact
    whole-row dedup — hash-partitioned vectorized distinct."""
    cols = ds.schema().names
    return distinct(ds, cols, num_partitions=num_partitions)


def _facet_counts(ds: Dataset, cols: List[str]) -> Tuple[int, dict]:
    """One streaming pass: total rows + value counts per facet column.
    Facet cardinalities are small (categories/predicates/provenances);
    per-batch value_counts is C-speed, the driver merges tiny dicts.
    NULL values are counted under the empty string (KGX convention)."""
    from collections import Counter

    total = 0
    counters = {c: Counter() for c in cols}
    for b in ds.select_columns(cols).iter_batches(batch_format="pandas", batch_size=1 << 16):
        total += len(b)
        for c in cols:
            for k, v in b[c].value_counts(dropna=False).items():
                key = "" if (k is None or (isinstance(k, float) and pd.isna(k))) else k
                counters[c][key] += int(v)
    return total, {c: dict(counters[c]) for c in cols}


def graph_stats(nodes: Dataset, edges: Dataset) -> dict:
    """O7 graph-stats summary (reference run.py:159-167 KGX operation):
    node counts per category, edge counts per predicate, per-facet
    provenance counts. Small results — plain dicts."""
    node_facets = [c for c in ("category", "provided_by") if c in nodes.schema().names]
    total_nodes, node_counts = _facet_counts(nodes, node_facets)
    total_edges, edge_counts = _facet_counts(edges, ["predicate"])
    out = {
        "total_nodes": total_nodes,
        "total_edges": total_edges,
        "nodes_by_category": node_counts.get("category", {}),
        "edges_by_predicate": edge_counts.get("predicate", {}),
    }
    if "provided_by" in node_counts:
        out["nodes_by_provided_by"] = node_counts["provided_by"]
    return out


def merge_kg(
    node_paths: Sequence[str],
    edge_paths: Sequence[str],
    nodes_out_tsv: str,
    edges_out_tsv: str,
    priority_sources: Optional[Sequence[str]] = None,
    ontology_node_paths: Optional[dict] = None,
    edge_provenance: bool = False,
) -> None:
    """Conformance-mode merge: reproduces the reference's
    ``duckdb_merge`` outputs byte-identically (merge.py:63-106).

    ``priority_sources`` defaults to sniffing the first row of each
    ontology node file (merge.py:81-92) when ``ontology_node_paths``
    is given.
    """
    if priority_sources is None:
        priority_sources = priority_sniff(ontology_node_paths or {})

    nodes = load_kgx_files(node_paths)
    node_cols = nodes.schema().names
    merged_nodes = merge_nodes(nodes, priority_sources=priority_sources)
    dataset_to_sorted_tsv(merged_nodes, nodes_out_tsv, node_cols, ["id"])

    # Edge `id` is dropped on load (duckdb_utils.py:432).
    edges = load_kgx_files(edge_paths, exclude_columns=("id",))
    merged_edges = merge_edges(edges, provenance=edge_provenance)
    out_cols = merged_edges.schema().names
    dataset_to_sorted_tsv(merged_edges, edges_out_tsv, out_cols, list(EDGE_KEY))
