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

import pyarrow as pa
import ray.data
from ray.data import Dataset
from ray.data.aggregate import Count

from kgray.constants import EDGE_KEY
from kgray.kernels.kgx_agg import PriorityCoalesceMax, SortedUniqueConcat
from kgray.sources.kgx_tsv import dataset_to_sorted_tsv, load_kgx_files, priority_sniff


def merge_nodes(
    nodes: Dataset,
    priority_sources: Sequence[str] = (),
    id_col: str = "id",
    name_col: str = "name",
    source_col: str = "provided_by",
) -> Dataset:
    """§2.3 node merge: GROUP BY id, reference column rules, unsorted.

    Output columns keep the input's names/order (id first). Sorting is
    the caller's concern (conformance mode sorts; web-scale mode keeps
    the hash-partitioned layout).
    """
    schema_names = nodes.schema().names
    aggs = []
    if name_col in schema_names:
        aggs.append(
            PriorityCoalesceMax(priority_sources, on=name_col, source_col=source_col, alias_name=name_col)
        )
    for c in schema_names:
        if c in (id_col, name_col):
            continue
        aggs.append(SortedUniqueConcat(c, alias_name=c))
    merged = nodes.groupby(id_col).aggregate(*aggs)
    return merged.select_columns([c for c in schema_names])


def merge_edges(
    edges: Dataset,
    provenance: bool = False,
    key: Optional[List[str]] = None,
) -> Dataset:
    """§2.4 edge merge.

    ``provenance=False`` (reference current behavior): exact dedup on
    the triple, all non-key columns dropped (duckdb_utils.py:442-448).
    ``provenance=True``: non-key columns merged as sorted distinct
    pipe-join (the reference's disabled-as-too-slow variant, golden
    ``expected_edges_merged_full.tsv``).
    """
    key = key or list(EDGE_KEY)
    if provenance:
        other = [c for c in edges.schema().names if c not in key]
        aggs = [SortedUniqueConcat(c, alias_name=c) for c in other]
        if not aggs:
            aggs = [Count(alias_name="__n")]
        out = edges.groupby(key).aggregate(*aggs)
        return out.select_columns(key + other)
    out = edges.select_columns(key).groupby(key).aggregate(Count(alias_name="__n"))
    return out.select_columns(key)


def priority_merge_two_tables(
    base: Dataset,
    subset: Dataset,
    key: Sequence[str],
    base_tag: str = "base",
    subset_tag: str = "subset",
    tag_column: str = "source_table",
) -> Tuple[Dataset, Dataset]:
    """§2.5 two-table priority merge (duckdb_utils.py:84-188).

    Tags both inputs, unions them, then per key ranks base rows before
    subset rows (``ROW_NUMBER() OVER (PARTITION BY key ORDER BY CASE
    WHEN source_table = base THEN 1 ELSE 2 END)``, duckdb_utils.py:172-187)
    and splits rank 1 → merged, rank > 1 → duplicates.

    Returned datasets carry the ``source_table`` lineage column.
    Within-source rank ties are broken deterministically by the full row
    (the reference's ROW_NUMBER tie order is unspecified; we pin it so
    retries are idempotent).
    """
    import pandas as pd

    def _tag(tag: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(tag_column, pa.array([tag] * len(t), type=pa.string()))

        return fn

    tagged = base.map_batches(_tag(base_tag), batch_format="pyarrow").union(
        subset.map_batches(_tag(subset_tag), batch_format="pyarrow")
    )
    keys = list(key)

    def _rank(g: pd.DataFrame) -> pd.DataFrame:
        order = (g[tag_column] != base_tag).astype(int)
        tie_cols = [c for c in g.columns]
        g = g.assign(__order=order).sort_values(["__order"] + tie_cols, kind="mergesort")
        g = g.drop(columns="__order")
        g["__rank"] = range(1, len(g) + 1)
        return g

    ranked = tagged.groupby(keys).map_groups(_rank, batch_format="pandas")
    merged = ranked.filter(expr="__rank == 1").drop_columns(["__rank"])
    duplicates = ranked.filter(expr="__rank > 1").drop_columns(["__rank"])
    return merged, duplicates


def dedup_whole_rows(ds: Dataset) -> Dataset:
    """O5 (reference utils/pandas_utils.py:8-17 drop_duplicates): exact
    whole-row dedup, distributed as a groupby over all columns."""
    cols = ds.schema().names
    return ds.groupby(cols).aggregate(Count(alias_name="__n")).select_columns(cols)


def graph_stats(nodes: Dataset, edges: Dataset) -> dict:
    """O7 graph-stats summary (reference run.py:159-167 KGX operation):
    node counts per category, edge counts per predicate, per-facet
    provenance counts. Small results — materialized to plain dicts."""
    out = {
        "total_nodes": nodes.count(),
        "total_edges": edges.count(),
    }
    node_cat = nodes.groupby("category").aggregate(Count(alias_name="n")).take_all()
    out["nodes_by_category"] = {r["category"]: r["n"] for r in node_cat}
    edge_pred = edges.groupby("predicate").aggregate(Count(alias_name="n")).take_all()
    out["edges_by_predicate"] = {r["predicate"]: r["n"] for r in edge_pred}
    if "provided_by" in nodes.schema().names:
        prov = nodes.groupby("provided_by").aggregate(Count(alias_name="n")).take_all()
        out["nodes_by_provided_by"] = {r["provided_by"]: r["n"] for r in prov}
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
