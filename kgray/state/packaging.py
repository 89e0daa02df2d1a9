"""Tar/untar packaging utilities (S7).

Mirrors the reference's release packaging (utils/file_utils.py:12-45;
merge.py:104-106): extract ``*.tar.gz`` source archives idempotently
(skip when the target dir already exists) and tar merged outputs.
Driver-side file ops — no Ray.
"""

from __future__ import annotations

import os
import tarfile
from typing import List


def untar_sources(directory: str) -> List[str]:
    """Extract every ``*.tar.gz`` in ``directory`` next to itself,
    skipping archives whose target dir already exists (idempotent —
    reference file_utils.py:12-30). Returns extracted dir names.

    Members are validated to stay inside ``directory`` (no path
    traversal)."""
    out = []
    for entry in sorted(os.listdir(directory)):
        if not entry.endswith(".tar.gz"):
            continue
        target = os.path.join(directory, entry[: -len(".tar.gz")])
        if os.path.isdir(target):
            continue
        with tarfile.open(os.path.join(directory, entry), "r:gz") as tf:
            base = os.path.realpath(directory)
            for m in tf.getmembers():
                dest = os.path.realpath(os.path.join(directory, m.name))
                if not dest.startswith(base + os.sep) and dest != base:
                    raise ValueError(f"unsafe tar member path: {m.name}")
            tf.extractall(directory)
        out.append(target)
    return out


def tar_output(output_dir: str, archive_path: str) -> str:
    """Package a merged-output directory as ``.tar.gz`` (reference
    file_utils.py:33-45)."""
    os.makedirs(os.path.dirname(archive_path) or ".", exist_ok=True)
    with tarfile.open(archive_path, "w:gz") as tf:
        tf.add(output_dir, arcname=os.path.basename(output_dir.rstrip("/")))
    return archive_path


def compact_parquet(in_dir: str, out_dir: str, target_bytes: int = 128 << 20) -> int:
    """Small-file compaction: rewrite a fragmented parquet directory
    (the natural residue of many-task writes and per-shard resume) into
    ~``target_bytes`` files. Returns the output file count.

    The file-count choice is the on-disk analog of auto_partitions:
    total on-disk bytes / target, floored at 1. The rewrite streams —
    ``repartition`` + ``write_parquet``, no driver materialization.
    """
    import os

    import ray.data

    total = 0
    for root, _, files in os.walk(in_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, -(-total // target_bytes))
    ds = ray.data.read_parquet(in_dir)
    ds.repartition(n_files).write_parquet(out_dir)
    return n_files
