"""Source discovery by naming convention (S8).

Mirrors the reference's path planners (utils/file_utils.py:48-162):
walk a raw-data directory, pick each source's ``nodes.tsv``/``edges.tsv``
pair; an ``ontologies`` directory holds per-ontology files named
``<name>_nodes.tsv`` / ``<name>_edges.tsv``, matched by substring
against requested transform names; macOS ``._*`` junk skipped.

Pure driver-side planning (no Ray) — it produces the (source,
nodes_path, edges_path) list the merge pipelines consume.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple


@dataclass
class SourcePaths:
    name: str
    nodes: Optional[str]
    edges: Optional[str]
    is_ontology: bool = False


def collect_paths_from_directory(directory: str) -> List[SourcePaths]:
    """One subdirectory per source, each holding nodes.tsv/edges.tsv
    (reference file_utils.py:48-88). Ontology dirs are handled by
    :func:`collect_ontology_paths`."""
    out: List[SourcePaths] = []
    if not os.path.isdir(directory):
        return out
    for entry in sorted(os.listdir(directory)):
        if entry.startswith("._"):
            continue
        sub = os.path.join(directory, entry)
        if not os.path.isdir(sub) or entry == "ontologies":
            continue
        nodes = os.path.join(sub, "nodes.tsv")
        edges = os.path.join(sub, "edges.tsv")
        out.append(
            SourcePaths(
                name=entry,
                nodes=nodes if os.path.exists(nodes) else None,
                edges=edges if os.path.exists(edges) else None,
            )
        )
    return out


def collect_ontology_paths(
    directory: str, transform_names: Optional[Sequence[str]] = None
) -> List[SourcePaths]:
    """``ontologies/<name>_{nodes,edges}.tsv`` matched by substring
    against requested transform names (reference file_utils.py:77-82,
    148-160); no filter → all ontologies."""
    onto_dir = os.path.join(directory, "ontologies")
    out: Dict[str, SourcePaths] = {}
    if not os.path.isdir(onto_dir):
        return []
    for entry in sorted(os.listdir(onto_dir)):
        if entry.startswith("._") or not entry.endswith(".tsv"):
            continue
        for suffix, attr in (("_nodes.tsv", "nodes"), ("_edges.tsv", "edges")):
            if entry.endswith(suffix):
                name = entry[: -len(suffix)]
                if transform_names and not any(t in name or name in t for t in transform_names):
                    continue
                sp = out.setdefault(name, SourcePaths(name=name, nodes=None, edges=None, is_ontology=True))
                setattr(sp, attr, os.path.join(onto_dir, entry))
    return list(out.values())


def collect_kg_paths(
    data_dir: str,
    subset_transforms: Optional[Sequence[str]] = None,
) -> Tuple[List[str], List[str], Dict[str, str]]:
    """Full plan: (node_paths, edge_paths, ontology_nodes_by_source).

    ``subset_transforms`` restricts the plan to matching source names
    (reference collect_subset_kg_paths :91-132); None → everything
    (collect_all_kg_paths :135-162). The ontology node map feeds
    priority sniffing (M3)."""
    sources = collect_paths_from_directory(data_dir)
    if subset_transforms:
        sources = [
            s for s in sources if any(t in s.name or s.name in t for t in subset_transforms)
        ]
    ontologies = collect_ontology_paths(data_dir, subset_transforms)
    node_paths = [s.nodes for s in sources + ontologies if s.nodes]
    edge_paths = [s.edges for s in sources + ontologies if s.edges]
    onto_nodes = {s.name: s.nodes for s in ontologies if s.nodes}
    return node_paths, edge_paths, onto_nodes
