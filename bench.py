#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default: run the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(num_cpus=$RAY_GRAFT_CPUS or 32)``
and print ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ...}

``--scaling``: run the identical job twice in fresh processes at
num_cpus=8 and num_cpus=32 on the same input and print throughput at
both plus scaling efficiency = (t_8 / t_32) / 4 — the sandbox proxy for
the north rule's two-cluster-size criterion (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# Corpus size = documents_rows × pages-per-doc. The scaling run uses a
# 4× corpus (8M pages at sf0.1) so the job is compute-dominated at both
# parallelism levels — at 2M pages the 32-CPU run is ~1/3 fixed cost
# (actor spin-up, execution startup) and the ratio measures overhead,
# not the pipeline.
PAGES_PER_DOC = int(os.environ.get("GRAFT_BENCH_PPD", "400"))


def construct_config(num_cpus: int) -> dict:
    """Uniform tuning rule in cluster size N (measured sweep, 8M pages):
    actor pool = N-1 actors at 0.95 CPU (reads/writes interleave in the
    fractional slack), 8192-row batches (4096 leaves ~30% of the actor
    stage in per-batch overhead at N=32), exchange partitions =
    max(16, N). The same formula is applied at every parallelism level
    — per-level hand-tuning would distort the scaling measurement."""
    return dict(
        shard_group_size=16,
        actor_concurrency=max(2, num_cpus - 1),
        actor_num_cpus=0.95,
        extract_batch_size=8192,
        num_partitions=max(16, num_cpus),
    )

# Per-query benchmarks (a representative slice of the operator surface).
BENCH_QUERIES = [
    "kgx_node_merge",
    "kgx_edge_provenance",
    "dedup_minhash_pairs",
    "dedup_jaccard_pairs",
    "dedup_exact",
    "ann_topk",
    "ann_ivf",
    "lineitem_agg",
    "sessionize",
    "token_count",
    "asof_join",
    "range_join",
]


def _consume(res) -> int:
    """Fully execute a query result; return row count."""
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.count()
    if isinstance(res, pa.Table):
        return len(res)
    return len(res)


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    from kgray.pipelines.construct import construct_kg
    from kgray.pipelines.queries import QUERIES, construct_corpus_for_sf

    # ---- headline: end-to-end KG construction over the pages corpus ----
    paths = construct_corpus_for_sf(SF_DIR, pages_per_doc=PAGES_PER_DOC)  # cached, untimed synthesis
    # Warm the page cache (measure compute+shuffle, not first disk read).
    ray.data.read_parquet(paths["pages"]).count()

    out_dir = f"/tmp/kgray_bench/kg_out_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    construct_kg(paths["pages"], paths["aliases"], out_dir, **construct_config(NUM_CPUS))
    headline = time.perf_counter() - t0
    import json as _json

    try:
        mf = _json.load(open(os.path.join(out_dir, "manifest.json")))
        phase = {k: v for k, v in mf["stages"]["materialize"].items() if k.endswith("_sec")}
    except Exception:
        phase = {}
    n_pages = paths["n_pages"]

    # ---- per-operator timings (skipped in scaling children: only the
    # headline feeds the efficiency ratio) ----
    qtimes = {}
    for name in [] if os.environ.get("GRAFT_SKIP_QUERIES") else BENCH_QUERIES:
        t0 = time.perf_counter()
        _consume(QUERIES[name](SF_DIR))
        qtimes[name] = round(time.perf_counter() - t0, 3)

    result = {
        "metric": "kg_construct_e2e_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_pages": n_pages,
        "docs_per_sec": round(n_pages / headline, 1),
        "phases": phase,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def run_at(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_PPD=os.environ.get("GRAFT_SCALING_PPD", "1600"),
            GRAFT_SKIP_QUERIES="1",
        )
        # Drain the previous leg's dirty-page writeback before timing —
        # back-to-back legs otherwise pay each other's 4+ GB flush.
        subprocess.run(["sync"], check=False)
        time.sleep(5)
        cmd = [sys.executable, os.path.join(_REPO, "bench.py")]
        # Cage the whole process tree to ncpu physical cores: Ray's
        # num_cpus only limits LOGICAL task slots — raylet, plasma
        # memcpy, the driver and Arrow's threadpools would otherwise
        # leak onto the host's idle cores and flatter the small leg.
        # taskset makes "8 CPUs" mean an actual 8-core node.
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        out = subprocess.run(
            cmd,
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    # Best-of-N per leg: this sandbox is a VM with time-varying
    # hypervisor steal (measured ±25% on identical runs); the min is
    # the least-contended sample of the same job. Both legs get the
    # same treatment, so the ratio stays fair.
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "2"))
    # Interleave the legs ([lo, hi, lo, hi, ...]) so a drifting host
    # window cannot systematically favor whichever leg ran last.
    r_los, r_his = [], []
    for _ in range(reps):
        r_los.append(run_at(lo))
        r_his.append(run_at(hi))
    r_lo = min(r_los, key=lambda r: r["value"])
    r_hi = min(r_his, key=lambda r: r["value"])
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        f"sec_{lo}": r_lo["value"],
        f"sec_{hi}": r_hi["value"],
        f"docs_per_sec_{lo}": r_lo["docs_per_sec"],
        f"docs_per_sec_{hi}": r_hi["docs_per_sec"],
        "sf": SF_DIR,
        "n_pages": r_hi.get("n_pages"),
        "reps_per_leg": reps,
        "caged": bool(shutil.which("taskset")),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
