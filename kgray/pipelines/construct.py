"""End-to-end KG construction (the north-rule flagship pipeline).

pages parquet (url, warc_ts, html, text, lang)
  → filter lang                      [pushed to the read where possible]
  → PageToEdges actor pool (ONE fused stage, state pinned per actor):
      extract_text → triple extract → entity link → canonical rewrite
      → host provenance → project to KGX edge columns → per-batch
      dedup (combiner) → hash-partition on (s,p,o)
  → per-shard __part-partitioned parquet + manifest entry (resumable)
  ---- reduce half ----
  → ONE Ray task per hash partition: provenance-preserving (s,p,o)
    merge (same kernel as merge_edges) + write straight into the
    predicate-partitioned output layout + report endpoints missing
    from the node table (integrity check piggybacks on the reduce —
    no extra pass over the edges)
  → nodes: alias KB → node rows → KGX node merge, built and merged
    CONCURRENTLY with the front half / reduce on a driver thread
    (the KB is the pipeline's small side by construction); stub nodes
    for missing endpoints appended after the reduce reports them.

Why this shape: the canonical map and the node table depend only on
the alias KB — not on the extracted triples — so canonicalization and
partitioning fuse into the front half and the per-shard checkpoint IS
the exchange spill. One pass over the pages, one pass over the spilled
edge partials; no intermediate re-read, no separate integrity pass.

Merge semantics are exactly the reference's (SURVEY §2.3/§2.4) via the
same kernels the conformance tests pin down.

Cluster note (single-node sandbox): the per-shard spill and the reduce
tasks communicate through the filesystem at ``out_dir``. On a
multi-node cluster this path MUST be shared storage (object store /
NFS); construct_kg fails fast if it detects multiple nodes with a
path that is not declared shared (see ``shared_fs_ok``).
"""

from __future__ import annotations

import os
import threading
import time as _time
from typing import Any, Dict, List, Optional

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data import Dataset

# shared_fs_ok: the spill/reduce-through-filesystem constraint is owned
# by the exchange kernel; construct_kg enforces it for its own spill too.
from kgray.kernels.hashagg import shared_fs_ok
from kgray.pipelines.kgx_merge import merge_nodes_frame
from kgray.stages.canonical import (
    apply_canonical_join,
    canonical_map_from_aliases,
    canonical_state,
    connected_components_distributed,
    sameas_pairs_from_alias_table,
)
from kgray.stages.extract import extract_text_batch
from kgray.stages.integrity import infer_category
from kgray.stages.linking import EntityLinker, build_linker_state
from kgray.stages.triples import TripleExtractor
from kgray.state.manifest import (
    Manifest,
    atomic_output_dir,
    file_fingerprint,
    list_page_shards,
)

NODE_COLUMNS = ["id", "name", "category", "provided_by", "same_as"]
EDGE_COLUMNS = ["subject", "predicate", "object", "primary_knowledge_source"]
_EDGE_KEY = ["subject", "predicate", "object"]

_PREFIX_CATEGORIES = [
    ("TAX:", "biolink:OrganismTaxon"),
    ("CHEM:", "biolink:ChemicalEntity"),
    ("GENE:", "biolink:Gene"),
]


def _dir_rows(path: str) -> int:
    """Row count of a parquet tree from footer metadata only. The spill
    tree holds one file per (write task × partition) — thousands of
    small files — so the footer reads go through a thread pool (I/O
    bound; serial driver-side reads cost seconds per shard)."""
    from concurrent.futures import ThreadPoolExecutor

    paths = [
        os.path.join(root, f)
        for root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    ]
    if not paths:
        return 0
    try:
        # C++-parallel footer scan (no GIL): ~3x the thread pool on
        # thousands-of-files spill trees. Explicit file list — directory
        # discovery misreads the hive layout's __part= dirs.
        import pyarrow.dataset as pads

        return pads.dataset(paths).count_rows()
    except Exception:
        with ThreadPoolExecutor(min(32, max(4, len(paths) // 64 + 1))) as ex:
            return sum(ex.map(lambda p: pq.read_metadata(p).num_rows, paths))


def _host_provenance(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    # Vectorized scheme://host extraction (urlparse costs ~4 µs/row in
    # Python — 8 CPU-s per 2M edges); rows without a scheme get null.
    m = pc.extract_regex(t.column("url"), r"^[a-z][a-z0-9+.-]*://(?P<host>[^/]+)")
    hosts = pc.struct_field(m, "host")
    return t.append_column("primary_knowledge_source", hosts)


class PageToEdges:
    """Fused front-half actor: pages → partitioned canonical edge partials.

    One actor pool instead of five stages: no intermediate object-store
    hops for the (large) page batches, and each batch leaves the actor
    already canonicalized, deduplicated and tagged with its exchange
    partition — the downstream write is the shuffle's map-side spill.
    The pieces remain the standalone units (extract_text_batch /
    TripleExtractor / EntityLinker / canonical map) — this class just
    composes them with state pinned once per actor in ``__init__``.
    """

    def __init__(self, alias_ref, cmap_ref, num_partitions: int, lang: str = ""):
        from kgray.kernels.hashagg import add_partition_column  # noqa: F401 (bound below)

        # Arrow's per-process thread pool is deliberately left at its
        # default: the pool's threads soak up cycles the actor's
        # GIL-bound phases leave idle (measured: capping it to 1-4
        # threads costs 10-60% wall at both 8 and 32 CPUs).
        self._triples = TripleExtractor()
        self._linker = EntityLinker(alias_ref)
        # Canonical map arrives as canonical_state() sorted numpy byte
        # arrays — zero-copy from plasma, one physical copy per NODE
        # (ray.get of a dict would deserialize a private heap copy per
        # actor; ADVICE r2). None → no rewrite.
        cstate = ray.get(cmap_ref) if isinstance(cmap_ref, ray.ObjectRef) else cmap_ref
        self._ckey = cstate["key"] if cstate else None
        self._cval = cstate["val"] if cstate else None
        from kgray.stages.canonical import probe_rewrite_column

        self._probe = probe_rewrite_column
        self._nparts = num_partitions
        self._add_part = add_partition_column
        self._lang = lang

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        if self._lang:
            # Fused lang filter: a standalone Filter operator costs one
            # extra full block materialization through the object store.
            import pyarrow.compute as pc

            batch = batch.filter(pc.equal(batch.column("lang"), self._lang))
        batch = extract_text_batch(batch)
        linked = self._linker(self._triples(batch))
        linked = _host_provenance(linked)
        edges = linked.select(EDGE_COLUMNS)
        if self._ckey is not None:
            for c in ("subject", "object"):
                edges = edges.set_column(
                    edges.column_names.index(c),
                    c,
                    self._probe(edges.column(c).combine_chunks(), self._ckey, self._cval),
                )
        df = edges.to_pandas().drop_duplicates()
        out = self._add_part(df, _EDGE_KEY, self._nparts)
        # Hand Ray an Arrow block directly — its own pandas→Arrow block
        # conversion (with index handling) costs more per batch.
        return pa.Table.from_pandas(out, preserve_index=False)


def extract_and_link_shard(
    files: List[str],
    alias_ref,
    cmap_ref,
    out_dir: str,
    num_partitions: int,
    lang: str = "en",
    extract_batch_size: int = 512,
    actor_concurrency=(1, 8),
    actor_num_cpus: float = 1.0,
    defer_count: bool = False,
):
    """Front half over one input shard → ``__part``-partitioned canonical
    edge partials (the exchange spill AND the resume checkpoint).
    Returns rows written — or, with ``defer_count=True``, a
    ``concurrent.futures.Future`` resolving to that count (the footer
    scan runs on a thread off the critical path).
    ``actor_num_cpus < 1`` oversubscribes the
    actor pool slightly so read/write tasks interleave with the
    CPU-bound actors instead of starving behind them."""
    # Bound the block count explicitly: Ray's size-based splitting makes
    # ~6 MB blocks here, so every shard becomes hundreds of write tasks
    # and (tasks × num_partitions) tiny spill files — footer-scan and
    # file-create overhead then rival the compute. Target ~64 MiB of
    # in-memory input per block (≈4x on-disk), floored at 2 blocks per
    # CPU so the actor pool stays saturated.
    in_bytes = sum(os.path.getsize(f) for f in files)
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    # Floor the task count at 8 per ACTOR, not just 2 per CPU: blocks are
    # the actor stage's task quanta, and with only ~3 chunky (~7 s) tasks
    # per actor the ramp-down tail leaves a third of a 31-actor pool idle
    # (measured: 96 tasks / 31 actors ran the stage at effective
    # parallelism 21; the same corpus at 7 actors packed fine — the loss
    # is exactly what the two-level scaling ratio measures).
    # ... but don't shatter a small shard into confetti chasing that
    # floor: blocks below ~16 MiB in-memory turn the spill into
    # hundreds-of-rows files whose create/footer cost dominates
    # (measured: the bare 8/actor floor cost ~25% wall on a 2M-page
    # corpus where it forced 6 MB blocks). The floor therefore yields
    # to a 16 MiB-per-block ceiling on the task count.
    pool = actor_concurrency if isinstance(actor_concurrency, int) else max(actor_concurrency)
    size64 = -(-in_bytes * 4 // (64 << 20))
    size16 = -(-in_bytes * 4 // (16 << 20))
    nblocks = max(2 * ncpu, size64, min(8 * pool, size16))
    if os.environ.get("KGRAY_NO_OVERRIDE"):
        ds = ray.data.read_parquet(files)
    else:
        ds = ray.data.read_parquet(files, override_num_blocks=nblocks)
    ds = ds.map_batches(
        PageToEdges,
        fn_constructor_kwargs={
            "alias_ref": alias_ref,
            "cmap_ref": cmap_ref,
            "num_partitions": num_partitions,
            "lang": lang,
        },
        batch_format="pyarrow",
        batch_size=extract_batch_size,
        concurrency=actor_concurrency,
        num_cpus=actor_num_cpus,
    )
    with atomic_output_dir(out_dir) as tmp:
        ds.write_parquet(tmp, partition_cols=["__part"])
    if os.environ.get("KGRAY_STATS"):
        import sys as _sys

        print(ds.stats(), file=_sys.stderr)
    if defer_count:
        # The spill row count is a footer-metadata scan over thousands of
        # small files — ~6 s of SERIAL driver wall on an 8-partition
        # 8M-page shard, sitting on the front half's critical path for a
        # number that is purely informational. Hand back a future instead;
        # construct_kg resolves it while the driver idles in the reduce
        # fleet's ray.get.
        from concurrent.futures import ThreadPoolExecutor

        ex = ThreadPoolExecutor(1)
        fut = ex.submit(_dir_rows, out_dir)
        ex.shutdown(wait=False)
        return fut
    return _dir_rows(out_dir)


def build_node_table(aliases: pa.Table, canonical_map: Optional[Dict[str, str]]) -> pa.Table:
    """Alias KB → KGX node rows (id = canonical CURIE). Fully Arrow/
    numpy vectorized (a pandas version cost ~4.4 s of serial driver CPU
    at a 1.6M-alias KB — racing the front half for cores).
    ``canonical_map=None`` skips the rewrite (the giant-KB path rewrites
    ids by hash join afterwards instead)."""
    import numpy as np
    import pyarrow.compute as pc

    from kgray.stages.linking import _string_array_to_S

    curie = aliases.column("curie").combine_chunks()
    same = aliases.column("same_as").combine_chunks()
    if canonical_map:
        # Sorted-probe rewrite (same trick as the linker's exact path).
        keys = sorted(canonical_map)
        key_S = _string_array_to_S(pa.chunked_array([pa.array(keys, type=pa.string())]))
        val_S = _string_array_to_S(
            pa.chunked_array([pa.array([canonical_map[k] for k in keys], type=pa.string())])
        )
        cur_S = _string_array_to_S(curie)
        w = max(cur_S.dtype.itemsize, key_S.dtype.itemsize, val_S.dtype.itemsize)
        cur_S = cur_S.astype(f"S{w}")
        idx = np.searchsorted(key_S.astype(f"S{w}"), cur_S)
        idx_c = np.minimum(idx, len(key_S) - 1)
        hit = key_S.astype(f"S{w}")[idx_c] == cur_S
        ids_S = np.where(hit, val_S.astype(f"S{w}")[idx_c], cur_S)
        ids = pa.array(ids_S).cast(pa.string())
    else:
        ids = curie
    # Category from the CURIE prefix; ALT: rows take their sameAs
    # partner's prefix (first '|' segment).
    same = pc.fill_null(same, "")
    has_same = pc.greater(pc.utf8_length(same), 0)
    first_seg = pc.if_else(
        has_same, pc.list_element(pc.split_pattern(same, "|"), 0), curie
    )
    probe = pc.if_else(pc.starts_with(curie, "ALT:"), first_seg, curie)
    cat = pa.array(["biolink:NamedThing"] * len(curie), type=pa.string())
    for prefix, category in reversed(_PREFIX_CATEGORIES):
        cat = pc.if_else(pc.starts_with(probe, prefix), pa.scalar(category), cat)
    same_out = pc.if_else(has_same, same, pa.scalar(None, type=pa.string()))
    return pa.table(
        {
            "id": ids,
            "name": aliases.column("alias").combine_chunks().cast(pa.string()),
            "category": cat,
            "provided_by": aliases.column("provided_by").combine_chunks().cast(pa.string()),
            "same_as": same_out,
        }
    )


@ray.remote
def _reduce_partition_write(
    files: List[str], part_id: int, out_root: str, known_ids: Optional[pa.Array]
) -> Dict[str, Any]:
    """Reduce ONE hash partition: read its spilled partials from every
    shard, run the provenance-preserving (s,p,o) merge, write straight
    into the predicate-partitioned output layout, and return the
    endpoint ids absent from the node table (the integrity check rides
    the reduce — the merged partition is already in memory, so the
    missing-nodes pass costs zero extra I/O)."""
    from urllib.parse import quote

    import pyarrow.compute as pc

    from kgray.kernels.hashagg import provenance_merge_table

    t = pq.read_table(files)
    if "__part" in t.column_names:
        t = t.drop_columns(["__part"])
    (other,) = [c for c in EDGE_COLUMNS if c not in _EDGE_KEY]
    r = provenance_merge_table(t, _EDGE_KEY, other).select(EDGE_COLUMNS)
    for pred in pc.unique(r.column("predicate")).to_pylist():
        sub = r.filter(pc.equal(r.column("predicate"), pred)).drop_columns(["predicate"])
        d = os.path.join(out_root, f"predicate={quote(str(pred), safe='')}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(sub, os.path.join(d, f"part-{part_id:05d}.parquet"))
    if known_ids is None:
        return {"rows": r.num_rows, "missing": []}
    ends = pc.unique(
        pa.chunked_array(
            [r.column("subject").combine_chunks(), r.column("object").combine_chunks()]
        )
    )
    missing = ends.filter(pc.invert(pc.is_in(ends, value_set=known_ids)))
    return {"rows": r.num_rows, "missing": missing.to_pylist()}


@ray.remote(num_cpus=1)
def _merge_nodes_part_write(
    sub: pa.Table, schema_names: List[str], part_id: int, out_dir: str
) -> int:
    """Merge ONE driver-made hash partition of the node table (same
    pure-Arrow kernel as the small-KB path) and write its parquet file
    directly — no driver collection of the merged output."""
    from kgray.pipelines.kgx_merge import merge_nodes_table

    r = merge_nodes_table(sub, schema_names, priority_sources=["kb_primary"])
    pq.write_table(r, os.path.join(out_dir, f"part-{part_id:05d}.parquet"))
    return len(r)


def _partition_files(triples_root: str) -> Dict[int, List[str]]:
    """{partition id: [spilled parquet files across all shards]}."""
    out: Dict[int, List[str]] = {}
    for shard in sorted(os.listdir(triples_root)):
        sdir = os.path.join(triples_root, shard)
        if not os.path.isdir(sdir):
            continue
        for pdir in os.listdir(sdir):
            if not pdir.startswith("__part="):
                continue
            p = int(pdir.split("=", 1)[1])
            full = os.path.join(sdir, pdir)
            out.setdefault(p, []).extend(
                os.path.join(full, f) for f in sorted(os.listdir(full)) if f.endswith(".parquet")
            )
    return out


def _backhalf_giant(
    out_dir: str,
    triples_root: str,
    labels_ds: Dataset,
    nodes_t: pa.Table,
    edges_out: str,
    nodes_out: str,
    num_partitions: int,
) -> tuple:
    """Back half for label maps too large to broadcast: canonical ids
    are applied by hash join against the label Dataset (never collected
    to the driver), followed by a second exchange on the now-canonical
    triple. Costs one extra shuffle of the edge partials vs the fused
    path — the price of a KB that outgrows a node's object store.
    Returns (edges_rows, nodes_rows, n_stubs)."""
    import numpy as np

    from kgray.kernels.hashagg import add_partition_column
    from kgray.pipelines.kgx_merge import merge_nodes
    from kgray.stages.integrity import missing_endpoints

    all_files = [f for files in _partition_files(triples_root).values() for f in files]
    raw = ray.data.read_parquet(all_files, columns=EDGE_COLUMNS)
    canon = apply_canonical_join(raw, labels_ds, ["subject", "object"], num_partitions)

    def _map(df: pd.DataFrame) -> pd.DataFrame:
        return add_partition_column(df.drop_duplicates(), _EDGE_KEY, num_partitions)

    spill = os.path.join(out_dir, ".exchange-edges")
    import shutil

    shutil.rmtree(spill, ignore_errors=True)
    canon.map_batches(_map, batch_format="pandas").write_parquet(
        spill, partition_cols=["__part"]
    )
    part_files = {
        int(d.split("=", 1)[1]): [
            os.path.join(spill, d, f)
            for f in sorted(os.listdir(os.path.join(spill, d)))
            if f.endswith(".parquet")
        ]
        for d in os.listdir(spill)
        if d.startswith("__part=")
    }
    edges_rows = 0
    n_missing = 0
    with atomic_output_dir(edges_out) as edges_tmp:
        refs = [
            _reduce_partition_write.remote(files_p, p, edges_tmp, None)
            for p, files_p in sorted(part_files.items())
        ]

        # Nodes: raw rows → join-rewrite id → distributed merge, running
        # concurrently with the edge reduce.
        with atomic_output_dir(nodes_out) as nodes_tmp:
            step = -(-len(nodes_t) // max(8, num_partitions))
            chunks = [nodes_t.slice(o, step) for o in range(0, len(nodes_t), step)]
            nodes_ds = ray.data.from_arrow([c for c in chunks if len(c)])
            nodes_ds = apply_canonical_join(nodes_ds, labels_ds, ["id"], num_partitions)
            merged = merge_nodes(
                nodes_ds, priority_sources=["kb_primary"], num_partitions=num_partitions
            )
            merged.write_parquet(nodes_tmp)
            edges_rows = sum(r["rows"] for r in ray.get(refs))

            # Stub repair via the distributed anti-join operator (the
            # node-id set is as large as the KB here — no broadcast).
            edges_ds = ray.data.read_parquet(edges_tmp, columns=["subject", "object"])
            nodes_ids = ray.data.read_parquet(nodes_tmp, columns=["id"])
            missing = sorted(
                r["id"]
                for r in missing_endpoints(edges_ds, nodes_ids, broadcast_limit=0).take_all()
            )
            n_missing = len(missing)
            if n_missing:
                stub_table = pa.table(
                    {
                        c: (
                            pa.array(missing, type=pa.string())
                            if c == "id"
                            else pa.array([infer_category(i) for i in missing], type=pa.string())
                            if c == "category"
                            else pa.array([None] * n_missing, type=pa.string())
                        )
                        for c in NODE_COLUMNS
                    }
                )
                pq.write_table(stub_table, os.path.join(nodes_tmp, "stubs.parquet"))
    shutil.rmtree(spill, ignore_errors=True)
    return edges_rows, _dir_rows(nodes_out), n_missing




def construct_kg(
    pages_dir: str,
    aliases_path: str,
    out_dir: str,
    lang: str = "en",
    resume: bool = True,
    shard_group_size: Optional[int] = None,
    extract_batch_size: int = 512,
    actor_concurrency=(1, 8),
    actor_num_cpus: float = 1.0,
    distributed_cc: bool = False,
    num_partitions: int = 8,
    cc_broadcast_limit: int = 5_000_000,
) -> Dict:
    """Run the full construction pipeline. Returns the manifest counters.

    Outputs under ``out_dir``:
      triples/shard=NNNN/__part=P/  per-shard partitioned edge partials
                                    (resume units AND exchange spill)
      edges/predicate=*/            merged KGX edges, provenance-preserving
      nodes/                        merged KGX nodes
      manifest.json                 per-partition lineage + stage counters
    """
    timings: Dict[str, float] = {}
    t_start = _time.perf_counter()
    if not shared_fs_ok(out_dir):
        raise RuntimeError(
            f"construct_kg spills its exchange under {out_dir!r}, but this is a "
            "multi-node cluster and the path is not declared shared storage; "
            "point out_dir at a shared mount and list its prefix in "
            "$KGRAY_SHARED_FS (colon-separated) to proceed."
        )
    manifest = Manifest(os.path.join(out_dir, "manifest.json"))
    alias_table = pq.read_table(aliases_path)
    alias_fp = file_fingerprint(aliases_path)
    # Linker lookup state: built ONCE here, ray.put once; every linker
    # actor maps the sorted numpy arrays zero-copy from the object
    # store (one physical copy per node — NOT one heap copy per actor).
    # Built on a thread so it overlaps the canonical map (independent
    # driver-side preps — together they are the pipeline's serial head).
    _ls: Dict[str, Any] = {}

    def _build_state():
        _ls["ref"] = ray.put(build_linker_state(alias_table))

    ls_thread = threading.Thread(target=_build_state)
    ls_thread.start()

    # ---- canonical map (depends only on the alias KB) -------------------
    # Giant-KB escape hatch: when the distributed label map exceeds
    # ``cc_broadcast_limit`` entries it is NEVER collected to the driver
    # or broadcast — the front half then skips the fused rewrite and the
    # back half rewrites ids by hash join against the label Dataset
    # (one extra exchange; see _backhalf_giant).
    labels_ds: Optional[Dataset] = None
    giant_kb = False
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
        labels_ds = connected_components_distributed(pairs_ds, num_partitions=num_partitions)
        if labels_ds.count() > cc_broadcast_limit:
            giant_kb = True
            cmap = None
        else:
            cmap = {r["node"]: r["label"] for r in labels_ds.take_all()}
    else:
        cmap = canonical_map_from_aliases(alias_table)
    cref = ray.put(canonical_state(cmap) if cmap else None)
    timings["canonical_map_sec"] = round(_time.perf_counter() - t_start, 3)

    # ---- node-side build overlaps the front half (driver thread): the
    # KB is the pipeline's small side by construction, and the node
    # table needs only aliases + cmap. Small KBs also merge here (a
    # driver-side Arrow merge, trivial). The BIG-KB distributed merge is
    # deliberately NOT overlapped with the front half: the front's actor
    # pool saturates the cluster, so any concurrent cluster work —
    # a second Ray Data execution (resource-manager split) or even raw
    # tasks — steals slots 1:1 (measured: front 45→54 s at 32 CPUs).
    # It launches in the reduce phase instead, interleaving with the
    # edge-reduce task fleet (see _launch_node_merge_tasks below).
    _nb: Dict[str, Any] = {}
    _nodes_built = threading.Event()
    nodes_stage = os.path.join(out_dir, ".nodes_stage")

    def _build_nodes():
        _nb["t0"] = _time.perf_counter()
        try:
            _nb["t"] = build_node_table(alias_table, cmap)
            _nodes_built.set()
            if not giant_kb and len(_nb["t"]) <= 50_000:
                _nb["frame"] = merge_nodes_frame(
                    _nb["t"].to_pandas(), NODE_COLUMNS, priority_sources=["kb_primary"]
                )
        except BaseException as e:  # surfaced at join/wait on the main thread
            _nb["err"] = e
        finally:
            _nb["t1"] = _time.perf_counter()
            _nodes_built.set()

    def _launch_node_merge_tasks(nodes_t: pa.Table) -> List:
        """Big-KB node merge as RAW 1-CPU Ray tasks, launched alongside
        the edge-reduce fleet (the cluster interleaves the two). The
        node table is already driver-resident, so hash-partition it
        here (vectorized) and let each task run the pure-Arrow merge
        kernel and write its own file — no driver collection."""
        import shutil as _sh

        import pyarrow.compute as _pc

        from kgray.kernels.hashagg import add_partition_column_arrow

        # Cap the node fleet WELL below the edge fleet: these tasks run
        # while every core is busy with edge reduces, and each extra
        # queued raw task can spawn a fresh worker process whose kgray
        # import costs ~1-2 s — measured: P=64 node tasks alongside 64
        # edge tasks ballooned the reduce half 8.8 → 28.7 s purely in
        # worker spawn/import storm. 8 tasks × tens of kilorows is
        # sub-second compute each.
        P = 8
        tp = add_partition_column_arrow(nodes_t, ["id"], P)
        part_col = tp.column("__part")
        tp = tp.drop_columns(["__part"])
        _sh.rmtree(nodes_stage, ignore_errors=True)
        os.makedirs(nodes_stage, exist_ok=True)
        schema_names = list(nodes_t.column_names)
        return [
            _merge_nodes_part_write.remote(sub, schema_names, p, nodes_stage)
            for p in range(P)
            if len(sub := tp.filter(_pc.equal(part_col, p)))
        ]

    nb_thread = threading.Thread(target=_build_nodes)
    nb_thread.start()

    # ---- front half: per-shard, resumable -------------------------------
    # Each shard group is one Ray Data execution (one actor-pool spin-up,
    # ~seconds of fixed cost). Auto-grouping bounds a run to ≤4
    # executions; pass shard_group_size=1 for per-file resume
    # granularity when shards are big enough to amortize the startup.
    t_mark = _time.perf_counter()
    if shard_group_size is None:
        n_files = len(list_page_shards(pages_dir, 1))
        shard_group_size = max(1, -(-n_files // 4))
    shards = list_page_shards(pages_dir, shard_group_size)
    triples_root = os.path.join(out_dir, "triples")
    ls_thread.join()
    alias_ref = _ls["ref"]
    deferred_counts: List[Any] = []

    def _backfill_counts() -> None:
        for _key, _fp, _nf, _fut in deferred_counts:
            manifest.mark_shard(_key, _fp, triples_rows=int(_fut.result()), input_files=_nf)
    for i, files in enumerate(shards):
        key = f"shard={i:04d}"
        # The spilled partials depend on the pages AND on the alias KB
        # (canonical map) AND on the partition count — fingerprint all
        # three so resume never reuses stale spill.
        fp = (
            "|".join(file_fingerprint(f) for f in files)
            + f"|aliases:{alias_fp}|P{num_partitions}"
        )
        shard_out = os.path.join(triples_root, key)
        if resume and manifest.shard_done(key, fp) and os.path.exists(shard_out):
            continue
        rows_fut = extract_and_link_shard(
            files,
            alias_ref,
            cref,
            shard_out,
            num_partitions,
            lang=lang,
            extract_batch_size=extract_batch_size,
            actor_concurrency=actor_concurrency,
            actor_num_cpus=actor_num_cpus,
            defer_count=True,
        )
        # Resume-critical fields (fingerprint, status) land immediately;
        # the informational spill row count backfills once its footer
        # scan resolves (overlapped with the next shard / the reduce
        # fleet — it was ~6 s of serial driver wall per 8M-page shard).
        manifest.mark_shard(key, fp, input_files=len(files))
        deferred_counts.append((key, fp, len(files), rows_fut))
    timings["front_sec"] = round(_time.perf_counter() - t_mark, 3)
    if "t1" in _nb:  # node thread already finished: report its span
        timings["node_thread_sec"] = round(_nb["t1"] - _nb["t0"], 3)

    # ---- reduce half ----------------------------------------------------
    stage_fp = "|".join(
        f"{k}:{v.get('fingerprint', '')}" for k, v in sorted(manifest.data["shards"].items())
    )
    edges_out = os.path.join(out_dir, "edges")
    nodes_out = os.path.join(out_dir, "nodes")
    if resume and manifest.stage_done("materialize", stage_fp) and os.path.exists(edges_out):
        return manifest.counters()

    t_mark = _time.perf_counter()
    _nodes_built.wait()
    if "err" in _nb:
        raise _nb["err"]
    nodes_t: pa.Table = _nb["t"]

    if giant_kb:
        nb_thread.join()
        assert labels_ds is not None
        _backfill_counts()
        edges_rows, nodes_rows, n_missing = _backhalf_giant(
            out_dir, triples_root, labels_ds, nodes_t, edges_out, nodes_out, num_partitions
        )
        timings["reduce_half_sec"] = round(_time.perf_counter() - t_mark, 3)
        manifest.mark_stage(
            "materialize",
            stage_fp,
            edges_rows=edges_rows,
            nodes_rows=nodes_rows,
            stub_nodes=n_missing,
            **timings,
        )
        return manifest.counters()

    # Known-node broadcast for the in-reduce integrity check: a pyarrow
    # array is zero-copy out of the object store per worker.
    import pyarrow.compute as pc

    known_ref = ray.put(pc.unique(nodes_t.column("id")).cast(pa.string()))

    part_files = _partition_files(triples_root)
    n_missing = 0
    with atomic_output_dir(edges_out) as edges_tmp:
        refs = [
            _reduce_partition_write.remote(files_p, p, edges_tmp, known_ref)
            for p, files_p in sorted(part_files.items())
        ]
        _backfill_counts()  # resolves while the reduce fleet runs

        # Node side: small KBs merged on the node thread already; big
        # KBs launch their raw merge tasks HERE so they interleave with
        # the edge-reduce fleet. Only the stub append (needs the
        # reduce's missing-endpoint report) is on the critical path.
        with atomic_output_dir(nodes_out) as nodes_tmp:
            nb_thread.join()
            if "err" in _nb:
                raise _nb["err"]
            timings.setdefault("node_thread_sec", round(_nb["t1"] - _nb["t0"], 3))
            merged_frame: Optional[pd.DataFrame] = _nb.get("frame")
            if merged_frame is None:
                t_nm = _time.perf_counter()
                ray.get(_launch_node_merge_tasks(_nb["t"]))
                timings["node_merge_sec"] = round(_time.perf_counter() - t_nm, 3)
                for f in os.listdir(nodes_stage):
                    os.replace(os.path.join(nodes_stage, f), os.path.join(nodes_tmp, f))
                os.rmdir(nodes_stage)

            results = ray.get(refs)
            missing = sorted({m for r in results for m in r["missing"]})
            n_missing = len(missing)
            # Stub nodes: missing endpoint ids are by definition disjoint
            # from the KB's ids (and one row per id), so appending them
            # AFTER the merge is identical to merging them in.
            stub_table = None
            if n_missing:
                stub_table = pa.table(
                    {
                        c: (
                            pa.array(missing, type=pa.string())
                            if c == "id"
                            else pa.array([infer_category(i) for i in missing], type=pa.string())
                            if c == "category"
                            else pa.array([None] * n_missing, type=pa.string())
                        )
                        for c in NODE_COLUMNS
                    }
                )
            if merged_frame is not None:
                out_table = pa.Table.from_pandas(merged_frame, preserve_index=False)
                for i, f in enumerate(out_table.schema):
                    if pa.types.is_null(f.type):
                        out_table = out_table.set_column(
                            i, f.name, out_table.column(f.name).cast(pa.string())
                        )
                if stub_table is not None:
                    out_table = pa.concat_tables(
                        [out_table.select(NODE_COLUMNS), stub_table], promote_options="default"
                    )
                pq.write_table(out_table, os.path.join(nodes_tmp, "nodes.parquet"))
            elif stub_table is not None:
                pq.write_table(stub_table, os.path.join(nodes_tmp, "stubs.parquet"))
    timings["reduce_half_sec"] = round(_time.perf_counter() - t_mark, 3)

    manifest.mark_stage(
        "materialize",
        stage_fp,
        edges_rows=sum(r["rows"] for r in results),
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
