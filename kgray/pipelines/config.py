"""Pipeline configuration (the reference's LinkML MergeKG surface).

Mirrors the shape of the reference's merge-config YAML
(schema/merge_schema.yaml:11-109; generated classes
schema/merge_datamodel.py:44-283; example tmp.yaml:1-45):

```yaml
configuration:
  output_directory: data/merged/my-kg
  checkpoint: false
merged_graph:
  name: my-kg
  sources:
    - name: src_a
      input:
        nodes: data/raw/src_a/nodes.tsv
        edges: data/raw/src_a/edges.tsv
  ontologies:            # priority sources for the name rule (M3)
    - name: chebi
      nodes: data/raw/ontologies/chebi_nodes.tsv
  operations:
    - graph_stats        # named ops from the registry below
  destinations:
    - format: tsv        # sorted conformance TSVs
    - format: parquet    # predicate-partitioned parquet
```

``merge_from_config`` executes it with the engine's merge pipelines.
Named operations dispatch through ``OPERATIONS`` — the engine's
equivalent of the reference's dotted-name KGX operation dispatch
(run.py:158-167); register custom callables there.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional


@dataclass
class SourceConfig:
    name: str
    nodes: Optional[str] = None
    edges: Optional[str] = None


@dataclass
class MergeConfig:
    name: str
    output_directory: str
    sources: List[SourceConfig] = field(default_factory=list)
    ontologies: List[SourceConfig] = field(default_factory=list)
    operations: List[str] = field(default_factory=list)
    destinations: List[str] = field(default_factory=lambda: ["tsv"])
    checkpoint: bool = False
    edge_provenance: bool = False


def load_config(path: str) -> MergeConfig:
    import yaml

    with open(path, "r", encoding="utf-8") as f:
        raw = yaml.safe_load(f)
    conf = raw.get("configuration", {})
    mg = raw.get("merged_graph", {})

    def _sources(entries):
        out = []
        for e in entries or []:
            inp = e.get("input", e)
            nodes, edges = inp.get("nodes"), inp.get("edges")
            # Reference form (tests/data/test_merge_schema.yaml): the
            # input is a `filename:` list classified by suffix, exactly
            # as the reference globs *_nodes.tsv / *_edges.tsv
            # (merge.py:70-80).
            for f in inp.get("filename") or []:
                if str(f).endswith("_nodes.tsv") or "nodes" in os.path.basename(str(f)):
                    nodes = nodes or f
                elif str(f).endswith("_edges.tsv") or "edges" in os.path.basename(str(f)):
                    edges = edges or f
            out.append(SourceConfig(name=e.get("name", ""), nodes=nodes, edges=edges))
        return out

    # `source`/`destination` (singular) are the reference schema's key
    # names (merge_schema.yaml); the plural forms are this engine's.
    destinations = mg.get("destinations", mg.get("destination")) or ["tsv"]
    return MergeConfig(
        name=mg.get("name", "merged-kg"),
        output_directory=conf.get("output_directory", "data/merged"),
        sources=_sources(mg.get("sources", mg.get("source"))),
        ontologies=_sources(mg.get("ontologies")),
        operations=[o if isinstance(o, str) else o.get("name", "") for o in mg.get("operations", [])],
        destinations=[d if isinstance(d, str) else d.get("format", "tsv") for d in destinations],
        checkpoint=bool(conf.get("checkpoint", False)),
        edge_provenance=bool(mg.get("edge_provenance", False)),
    )


def _op_graph_stats(nodes_ds, edges_ds, out_dir: str) -> Dict[str, Any]:
    from kgray.pipelines.kgx_merge import graph_stats

    stats = graph_stats(nodes_ds, edges_ds)
    import json

    with open(os.path.join(out_dir, "graph_stats.json"), "w") as f:
        json.dump(stats, f, indent=1, sort_keys=True)
    return stats


OPERATIONS: Dict[str, Callable] = {
    "graph_stats": _op_graph_stats,
}


def merge_from_config(config: MergeConfig) -> Dict[str, Any]:
    """Execute a configured merge: load sources → node/edge merge →
    destinations (+ named operations). Returns a result summary."""
    import ray.data

    from kgray.constants import EDGE_KEY
    from kgray.pipelines.kgx_merge import merge_edges, merge_nodes
    from kgray.sources.kgx_tsv import dataset_to_sorted_tsv, load_kgx_files, priority_sniff

    out_dir = os.path.join(config.output_directory, config.name)
    os.makedirs(out_dir, exist_ok=True)

    node_paths = [s.nodes for s in config.sources + config.ontologies if s.nodes]
    edge_paths = [s.edges for s in config.sources + config.ontologies if s.edges]
    priority = priority_sniff({s.name: s.nodes for s in config.ontologies if s.nodes})

    nodes = load_kgx_files(node_paths)
    node_cols = nodes.schema().names
    merged_nodes = merge_nodes(nodes, priority_sources=priority)
    edges = load_kgx_files(edge_paths, exclude_columns=("id",))
    merged_edges = merge_edges(edges, provenance=config.edge_provenance)

    result: Dict[str, Any] = {"output_dir": out_dir, "priority_sources": priority}
    for dest in config.destinations:
        if dest == "tsv":
            dataset_to_sorted_tsv(merged_nodes, os.path.join(out_dir, "nodes.tsv"), node_cols, ["id"])
            dataset_to_sorted_tsv(
                merged_edges,
                os.path.join(out_dir, "edges.tsv"),
                merged_edges.schema().names,
                list(EDGE_KEY),
            )
        elif dest == "parquet":
            merged_nodes.write_parquet(os.path.join(out_dir, "nodes_parquet"))
            merged_edges.write_parquet(
                os.path.join(out_dir, "edges_parquet"), partition_cols=["predicate"]
            )
        else:
            raise ValueError(f"unknown destination format: {dest}")

    # Destinations run before operations so ops can read materialized
    # outputs; stats ops consume the (lazy) merged datasets directly.
    for op in config.operations:
        if op not in OPERATIONS:
            raise ValueError(f"unknown operation: {op} (register it in kgray.pipelines.config.OPERATIONS)")
        result[op] = OPERATIONS[op](merged_nodes, merged_edges, out_dir)
    return result
