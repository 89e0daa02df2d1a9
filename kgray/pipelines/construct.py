"""End-to-end KG construction (the north-rule flagship pipeline).

pages parquet (url, warc_ts, html, text, lang)
  → filter lang                      [pushed to the read where possible]
  → extract_text  (stateless map_batches — pure spec'd function)
  → TripleExtractor (actor pool — pinned "model" state)
  → EntityLinker    (actor pool — broadcast alias KB + MinHash index)
  → per-shard triples parquet  + manifest entry        (resumable half)
  ---- global half ----
  → canonicalize (union-find over sameAs; broadcast map or distributed
    label propagation)
  → KGX edge merge with provenance (groupby (s,p,o) — hash shuffle)
  → KGX node merge (groupby id)   + integrity stub repair
  → parquet: edges partitioned by predicate, nodes sorted-by-hash

Merge semantics are exactly the reference's (SURVEY §2.3/§2.4) via the
same kernels the conformance tests pin down.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional
from urllib.parse import urlparse

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data import Dataset

from kgray.pipelines.kgx_merge import merge_edges, merge_nodes_frame
from kgray.stages.canonical import (
    apply_canonical_map,
    canonical_map_from_aliases,
    connected_components_distributed,
    sameas_pairs_from_alias_table,
)
from kgray.stages.extract import extract_text_batch
from kgray.stages.integrity import infer_category
from kgray.stages.linking import EntityLinker
from kgray.stages.triples import TripleExtractor
from kgray.state.manifest import (
    Manifest,
    atomic_output_dir,
    file_fingerprint,
    list_page_shards,
)

NODE_COLUMNS = ["id", "name", "category", "provided_by", "same_as"]
EDGE_COLUMNS = ["subject", "predicate", "object", "primary_knowledge_source"]

_PREFIX_CATEGORIES = [
    ("TAX:", "biolink:OrganismTaxon"),
    ("CHEM:", "biolink:ChemicalEntity"),
    ("GENE:", "biolink:Gene"),
]


def _dir_rows(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(root, f)).num_rows
    return total


def extract_and_link_shard(
    files: List[str],
    alias_ref,
    out_dir: str,
    lang: str = "en",
    extract_batch_size: int = 512,
    link_batch_size: int = 2048,
    actor_concurrency=(1, 8),
) -> int:
    """Front half over one input shard → triples parquet. Returns rows."""
    ds = ray.data.read_parquet(files)
    if lang:
        ds = ds.filter(expr=f"lang == '{lang}'")
    ds = ds.map_batches(extract_text_batch, batch_format="pyarrow", batch_size=extract_batch_size)
    ds = ds.map_batches(
        TripleExtractor,
        batch_format="pyarrow",
        batch_size=extract_batch_size,
        concurrency=actor_concurrency,
    )
    ds = ds.map_batches(
        EntityLinker,
        fn_constructor_kwargs={"alias_ref": alias_ref},
        batch_format="pyarrow",
        batch_size=link_batch_size,
        concurrency=actor_concurrency,
    )
    with atomic_output_dir(out_dir) as tmp:
        ds.write_parquet(tmp)
    return _dir_rows(out_dir)


def _host_provenance(t: pa.Table) -> pa.Table:
    hosts = [urlparse(u).netloc if u else None for u in t.column("url").to_pylist()]
    return t.append_column("primary_knowledge_source", pa.array(hosts, type=pa.string()))


def build_node_table(aliases: pa.Table, canonical_map: Dict[str, str]) -> pa.Table:
    """Alias KB → KGX node rows (id = canonical CURIE)."""
    alias = aliases.column("alias").to_pylist()
    curie = aliases.column("curie").to_pylist()
    same = aliases.column("same_as").to_pylist()
    prov = aliases.column("provided_by").to_pylist()

    def _cat(c: str, s: str) -> str:
        probe = c if not c.startswith("ALT:") else (s.split("|")[0] if s else c)
        for prefix, category in _PREFIX_CATEGORIES:
            if probe.startswith(prefix):
                return category
        return "biolink:NamedThing"

    ids = [canonical_map.get(c, c) for c in curie]
    cats = [_cat(c, s) for c, s in zip(curie, same)]
    return pa.table(
        {
            "id": pa.array(ids, type=pa.string()),
            "name": pa.array(alias, type=pa.string()),
            "category": pa.array(cats, type=pa.string()),
            "provided_by": pa.array(prov, type=pa.string()),
            "same_as": pa.array([s if s else None for s in same], type=pa.string()),
        }
    )


def construct_kg(
    pages_dir: str,
    aliases_path: str,
    out_dir: str,
    lang: str = "en",
    resume: bool = True,
    shard_group_size: Optional[int] = None,
    extract_batch_size: int = 512,
    actor_concurrency=(1, 8),
    distributed_cc: bool = False,
    num_partitions: int = 8,
) -> Dict:
    """Run the full construction pipeline. Returns the manifest counters.

    Outputs under ``out_dir``:
      triples/shard=NNNN/   per-shard linked triples (resume units)
      edges/predicate=*/    merged KGX edges, provenance-preserving
      nodes/                merged KGX nodes
      manifest.json         per-partition lineage + per-stage counters
    """
    manifest = Manifest(os.path.join(out_dir, "manifest.json"))
    alias_table = pq.read_table(aliases_path)
    alias_ref = ray.put(alias_table.select(["alias", "curie"]))

    # ---- front half: per-shard, resumable -------------------------------
    # Each shard group is one Ray Data execution (one actor-pool spin-up,
    # ~seconds of fixed cost). Auto-grouping bounds a run to ≤4
    # executions; pass shard_group_size=1 for per-file resume
    # granularity when shards are big enough to amortize the startup.
    if shard_group_size is None:
        n_files = len(list_page_shards(pages_dir, 1))
        shard_group_size = max(1, -(-n_files // 4))
    shards = list_page_shards(pages_dir, shard_group_size)
    triples_root = os.path.join(out_dir, "triples")
    for i, files in enumerate(shards):
        key = f"shard={i:04d}"
        fp = "|".join(file_fingerprint(f) for f in files)
        shard_out = os.path.join(triples_root, key)
        if resume and manifest.shard_done(key, fp) and os.path.exists(shard_out):
            continue
        rows = extract_and_link_shard(
            files,
            alias_ref,
            shard_out,
            lang=lang,
            extract_batch_size=extract_batch_size,
            actor_concurrency=actor_concurrency,
        )
        manifest.mark_shard(key, fp, triples_rows=rows, input_files=len(files))

    # ---- global half ----------------------------------------------------
    stage_fp = "|".join(
        f"{k}:{v.get('fingerprint', '')}" for k, v in sorted(manifest.data["shards"].items())
    )
    edges_out = os.path.join(out_dir, "edges")
    nodes_out = os.path.join(out_dir, "nodes")
    if resume and manifest.stage_done("materialize", stage_fp) and os.path.exists(edges_out):
        return manifest.counters()

    triples = ray.data.read_parquet(triples_root)

    if distributed_cc:
        pairs = sameas_pairs_from_alias_table(alias_table)
        pairs_ds = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([p[0] for p in pairs], type=pa.string()),
                    "dst": pa.array([p[1] for p in pairs], type=pa.string()),
                }
            )
        )
        labels = connected_components_distributed(pairs_ds, num_partitions=num_partitions)
        cmap = {r["node"]: r["label"] for r in labels.take_all()}
    else:
        cmap = canonical_map_from_aliases(alias_table)
    cref = ray.put(cmap)

    canon = apply_canonical_map(triples, cref, ["subject", "object"])
    canon = canon.map_batches(_host_provenance, batch_format="pyarrow")
    edges = merge_edges(
        canon.select_columns(EDGE_COLUMNS), provenance=True, num_partitions=num_partitions
    )

    with atomic_output_dir(edges_out) as tmp:
        edges.write_parquet(tmp, partition_cols=["predicate"])

    # Node side. The KB (alias table) is the pipeline's small side by
    # construction — merge it driver-side with the same vectorized
    # frame kernel the distributed path uses. The integrity endpoint
    # set is KB-bounded (the linker only emits KB CURIEs), so stream
    # per-batch uniques to a driver set — one pass, no exchange; for a
    # non-KB-bounded edge source use stages.integrity.edge_endpoints
    # (distributed distinct) instead.
    endpoints: set = set()
    eps_ds = ray.data.read_parquet(edges_out, columns=["subject", "object"])
    for b in eps_ds.iter_batches(batch_format="pyarrow", batch_size=1 << 17):
        import pyarrow.compute as _pc

        endpoints.update(_pc.unique(b.column("subject")).to_pylist())
        endpoints.update(_pc.unique(b.column("object")).to_pylist())

    nodes_df = build_node_table(alias_table, cmap).to_pandas()
    missing = sorted(endpoints - set(nodes_df["id"]))
    n_missing = len(missing)
    if n_missing:
        stub_df = pd.DataFrame({c: [None] * n_missing for c in NODE_COLUMNS})
        stub_df["id"] = missing
        stub_df["category"] = [infer_category(i) for i in missing]
        nodes_df = pd.concat([nodes_df, stub_df], ignore_index=True)
    merged_nodes = merge_nodes_frame(nodes_df, NODE_COLUMNS, priority_sources=["kb_primary"])
    with atomic_output_dir(nodes_out) as tmp:
        pq.write_table(pa.Table.from_pandas(merged_nodes, preserve_index=False), os.path.join(tmp, "nodes.parquet"))

    manifest.mark_stage(
        "materialize",
        stage_fp,
        edges_rows=_dir_rows(edges_out),
        nodes_rows=_dir_rows(nodes_out),
        stub_nodes=n_missing,
    )
    return manifest.counters()


def triple_prf(edges_dir: str, expected_triples_path: str) -> Dict[str, float]:
    """P/R/F1 of distinct materialized (s,p,o) vs the oracle set."""
    got_t = pq.read_table(edges_dir, columns=["subject", "predicate", "object"])
    # partition col `predicate` comes back as dictionary; normalize.
    got = {
        (s, str(p), o)
        for s, p, o in zip(
            got_t.column("subject").to_pylist(),
            got_t.column("predicate").to_pylist(),
            got_t.column("object").to_pylist(),
        )
    }
    exp_t = pq.read_table(expected_triples_path, columns=["subject", "predicate", "object"])
    exp = set(
        zip(
            exp_t.column("subject").to_pylist(),
            exp_t.column("predicate").to_pylist(),
            exp_t.column("object").to_pylist(),
        )
    )
    tp = len(got & exp)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(exp) if exp else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"precision": precision, "recall": recall, "f1": f1, "got": len(got), "expected": len(exp)}
