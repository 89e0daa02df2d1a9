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
