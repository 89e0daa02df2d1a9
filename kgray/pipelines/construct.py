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
from typing import Any, Dict, List, Optional
from urllib.parse import urlparse

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data import Dataset

from kgray.pipelines.kgx_merge import merge_nodes_frame
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


class PageToTriples:
    """Fused front-half actor: extract → mention/triple extract → link.

    One actor pool instead of three stages: no intermediate object-store
    hops for the (large) page batches, and the pool can be sized to the
    whole machine. The pieces remain the standalone classes
    (extract_text_batch / TripleExtractor / EntityLinker) — this class
    just composes them with state pinned once per actor.
    """

    def __init__(self, alias_ref):
        self._triples = TripleExtractor()
        self._linker = EntityLinker(alias_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = extract_text_batch(batch)
        mentions = self._triples(batch)
        return self._linker(mentions)


def extract_and_link_shard(
    files: List[str],
    alias_ref,
    out_dir: str,
    lang: str = "en",
    extract_batch_size: int = 512,
    actor_concurrency=(1, 8),
) -> int:
    """Front half over one input shard → triples parquet. Returns rows."""
    ds = ray.data.read_parquet(files)
    if lang:
        ds = ds.filter(expr=f"lang == '{lang}'")
    ds = ds.map_batches(
        PageToTriples,
        fn_constructor_kwargs={"alias_ref": alias_ref},
        batch_format="pyarrow",
        batch_size=extract_batch_size,
        concurrency=actor_concurrency,
    )
    with atomic_output_dir(out_dir) as tmp:
        # Consolidate output files: tiny per-task files multiply block
        # count (and per-block fixed costs) in every downstream stage.
        ds.write_parquet(tmp, min_rows_per_file=200_000)
    return _dir_rows(out_dir)


def _host_provenance(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    # Vectorized scheme://host extraction (urlparse costs ~4 µs/row in
    # Python — 8 CPU-s per 2M edges); rows without a scheme get null.
    m = pc.extract_regex(t.column("url"), r"^[a-z][a-z0-9+.-]*://(?P<host>[^/]+)")
    hosts = pc.struct_field(m, "host")
    return t.append_column("primary_knowledge_source", hosts)


def build_node_table(aliases: pa.Table, canonical_map: Dict[str, str]) -> pa.Table:
    """Alias KB → KGX node rows (id = canonical CURIE). Vectorized:
    pandas hashtable map for the canonical rewrite, prefix cascade for
    the category."""
    df = aliases.to_pandas()
    mapped = df["curie"].map(canonical_map)
    ids = mapped.where(mapped.notna(), df["curie"])
    # Category from the CURIE prefix; ALT: rows take their sameAs
    # partner's prefix (first '|' segment).
    probe = df["curie"].where(
        ~df["curie"].str.startswith("ALT:"),
        df["same_as"].str.split("|").str[0].where(df["same_as"].astype(bool), df["curie"]),
    )
    cat = pd.Series("biolink:NamedThing", index=df.index)
    for prefix, category in reversed(_PREFIX_CATEGORIES):
        cat = cat.mask(probe.str.startswith(prefix), category)
    same = df["same_as"].where(df["same_as"].astype(bool), None)
    return pa.table(
        {
            "id": pa.array(ids, type=pa.string()),
            "name": pa.array(df["alias"], type=pa.string()),
            "category": pa.array(cat, type=pa.string()),
            "provided_by": pa.array(df["provided_by"], type=pa.string()),
            "same_as": pa.array(same, type=pa.string()),
        }
    )


def _merge_edges_spill_fused(
    edges_input: Dataset,
    out_root: str,
    spill_dir: str,
    num_partitions: int,
) -> None:
    """Edges exchange with fused reduce+write: map batches spill to
    ``__part``-partitioned parquet (parallel, no Sort op), then ONE Ray
    task per partition reduces (provenance-preserving (s,p,o) merge —
    same arrow kernel as merge_edges) AND writes its rows straight into
    the predicate-partitioned output layout. Removes the extra Dataset
    execution a collect-then-write would cost.
    """
    import shutil
    from urllib.parse import quote

    import pyarrow.compute as _pc

    from kgray.kernels.hashagg import add_partition_column, sorted_unique_join_table

    key = ["subject", "predicate", "object"]
    other = [c for c in EDGE_COLUMNS if c not in key]

    def _map(df: pd.DataFrame) -> pd.DataFrame:
        return add_partition_column(df.drop_duplicates(), key, num_partitions)

    shutil.rmtree(spill_dir, ignore_errors=True)
    edges_input.map_batches(_map, batch_format="pandas").write_parquet(
        spill_dir, partition_cols=["__part"]
    )

    @ray.remote
    def _reduce_write(part_dir: str, part_id: int) -> int:
        t = pq.read_table(part_dir)
        if "__part" in t.column_names:
            t = t.drop_columns(["__part"])
        r = sorted_unique_join_table(t, key, other).select(key + other)
        for pred in _pc.unique(r.column("predicate")).to_pylist():
            sub = r.filter(_pc.equal(r.column("predicate"), pred)).drop_columns(["predicate"])
            d = os.path.join(out_root, f"predicate={quote(str(pred), safe='')}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(sub, os.path.join(d, f"part-{part_id:05d}.parquet"))
        return r.num_rows

    part_dirs = sorted(
        os.path.join(spill_dir, d) for d in os.listdir(spill_dir) if d.startswith("__part=")
    )
    ray.get([_reduce_write.remote(d, i) for i, d in enumerate(part_dirs)])


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
    import time as _time

    timings: Dict[str, float] = {}
    t_start = _time.perf_counter()
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
    timings["front_sec"] = round(_time.perf_counter() - t_start, 3)

    # ---- global half ----------------------------------------------------
    stage_fp = "|".join(
        f"{k}:{v.get('fingerprint', '')}" for k, v in sorted(manifest.data["shards"].items())
    )
    edges_out = os.path.join(out_dir, "edges")
    nodes_out = os.path.join(out_dir, "nodes")
    if resume and manifest.stage_done("materialize", stage_fp) and os.path.exists(edges_out):
        return manifest.counters()

    t_mark = _time.perf_counter()
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

    timings["canonical_map_sec"] = round(_time.perf_counter() - t_mark, 3)
    t_mark = _time.perf_counter()
    canon = apply_canonical_map(triples, cref, ["subject", "object"])
    canon = canon.map_batches(_host_provenance, batch_format="pyarrow")
    edges_input = canon.select_columns(EDGE_COLUMNS)

    # Node-side prep overlaps with the cluster-side edges exchange: the
    # KB (alias table) is the pipeline's small side by construction, so
    # its node-row build runs on the (otherwise idle) driver thread
    # while the edges merge executes.
    import threading

    _node_build: Dict[str, Any] = {}

    def _build_nodes():
        _node_build["df"] = build_node_table(alias_table, cmap).to_pandas()

    nb_thread = threading.Thread(target=_build_nodes)
    nb_thread.start()

    with atomic_output_dir(edges_out) as tmp:
        _merge_edges_spill_fused(
            edges_input,
            tmp,
            spill_dir=os.path.join(out_dir, ".exchange-edges"),
            num_partitions=num_partitions,
        )
    timings["edges_merge_write_sec"] = round(_time.perf_counter() - t_mark, 3)
    t_mark = _time.perf_counter()

    nb_thread.join()
    nodes_df = _node_build["df"]
    # Integrity anti-join stays distributed end-to-end: broadcast the
    # node-id set once, filter edge endpoints per batch (C-speed isin),
    # and only the (normally empty) missing set reaches the driver.
    known_ref = ray.put(frozenset(nodes_df["id"]))

    def _missing_batch(df: pd.DataFrame) -> pd.DataFrame:
        known = ray.get(known_ref) if isinstance(known_ref, ray.ObjectRef) else known_ref
        vals = pd.unique(pd.concat([df["subject"], df["object"]], ignore_index=True))
        ser = pd.Series(vals)
        return pd.DataFrame({"id": ser[~ser.isin(known)]})

    missing_rows = (
        ray.data.read_parquet(edges_out, columns=["subject", "object"])
        .map_batches(_missing_batch, batch_format="pandas")
        .take_all()
    )
    missing = sorted({r["id"] for r in missing_rows})
    n_missing = len(missing)
    if n_missing:
        stub_df = pd.DataFrame({c: [None] * n_missing for c in NODE_COLUMNS})
        stub_df["id"] = missing
        stub_df["category"] = [infer_category(i) for i in missing]
        nodes_df = pd.concat([nodes_df, stub_df], ignore_index=True)
    if len(nodes_df) <= 50_000:
        merged_nodes = merge_nodes_frame(nodes_df, NODE_COLUMNS, priority_sources=["kb_primary"])
        with atomic_output_dir(nodes_out) as tmp:
            pq.write_table(
                pa.Table.from_pandas(merged_nodes, preserve_index=False),
                os.path.join(tmp, "nodes.parquet"),
            )
    else:
        # Big KB: run the same merge distributed (same frame kernel as
        # the per-partition reduce) instead of on the driver. Split the
        # input frame so the map side parallelizes (from_pandas of one
        # frame = one block = one map task).
        import numpy as np

        from kgray.pipelines.kgx_merge import merge_nodes

        chunks = np.array_split(nodes_df, max(8, num_partitions))
        nodes_ds = ray.data.from_pandas([c for c in chunks if len(c)])
        merged = merge_nodes(nodes_ds, priority_sources=["kb_primary"], num_partitions=num_partitions)
        with atomic_output_dir(nodes_out) as tmp:
            merged.write_parquet(tmp)

    timings["nodes_sec"] = round(_time.perf_counter() - t_mark, 3)
    # The exchange spill served its checkpoint purpose once outputs are
    # committed; reclaim the space.
    import shutil as _shutil

    _shutil.rmtree(os.path.join(out_dir, ".exchange-edges"), ignore_errors=True)
    manifest.mark_stage(
        "materialize",
        stage_fp,
        edges_rows=_dir_rows(edges_out),
        nodes_rows=_dir_rows(nodes_out),
        stub_nodes=n_missing,
        **timings,
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
