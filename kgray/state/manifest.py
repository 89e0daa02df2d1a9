"""Per-partition checkpoint manifest → idempotent resume.

The reference carries an (unused) ``checkpoint`` config slot
(merge_schema.yaml:28-29, run.py:129) and has no resume; the north rule
makes it mandatory: *each partition carries lineage metadata and
per-stage counters to a checkpoint manifest so any failed partition
resumes idempotently*.

Design: the embarrassingly-parallel front half (extract → triples →
link) is sharded by input file group; each shard's triple output is
written to its own directory and committed ATOMICALLY — written to a
``.tmp-`` dir, fsync'd, renamed — and only then recorded in the
manifest with its input fingerprint and row counters. The global back
half (canonicalize → merge → materialize) is one unit with its own
entry. A rerun skips shards whose fingerprint matches; a crash
mid-shard leaves only a ``.tmp-`` dir that the rerun clears.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from typing import Any, Dict, List, Optional


def file_fingerprint(path: str) -> str:
    """Cheap, stable input identity: (basename, size, mtime_ns)."""
    st = os.stat(path)
    return f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}"


class Manifest:
    """JSON manifest with atomic writes (tmp + os.replace)."""

    def __init__(self, path: str):
        self.path = path
        self.data: Dict[str, Any] = {"shards": {}, "stages": {}, "counters": {}}
        if os.path.exists(path):
            with open(path, "r", encoding="utf-8") as f:
                self.data = json.load(f)

    def save(self) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path) or ".", suffix=".manifest")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                json.dump(self.data, f, indent=1, sort_keys=True)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self.path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    # -- shards (front half) ------------------------------------------------
    def shard_done(self, key: str, fingerprint: Optional[str] = None) -> bool:
        info = self.data["shards"].get(key)
        if not info or info.get("status") != "done":
            return False
        return fingerprint is None or info.get("fingerprint") == fingerprint

    def mark_shard(self, key: str, fingerprint: str, **counters: Any) -> None:
        self.data["shards"][key] = {"status": "done", "fingerprint": fingerprint, **counters}
        self.save()

    # -- global stages (back half) -----------------------------------------
    def stage_done(self, name: str, fingerprint: Optional[str] = None) -> bool:
        info = self.data["stages"].get(name)
        if not info or info.get("status") != "done":
            return False
        return fingerprint is None or info.get("fingerprint") == fingerprint

    def mark_stage(self, name: str, fingerprint: str = "", **counters: Any) -> None:
        self.data["stages"][name] = {"status": "done", "fingerprint": fingerprint, **counters}
        self.save()

    def counters(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for info in self.data["shards"].values():
            for k, v in info.items():
                if isinstance(v, (int, float)) and k != "status":
                    out[k] = out.get(k, 0) + v
        for name, info in self.data["stages"].items():
            for k, v in info.items():
                if isinstance(v, (int, float)):
                    out[f"{name}.{k}"] = v
        return out


def atomic_output_dir(final_dir: str):
    """Context manager: yield a temp dir; on success rename to final.

    If ``final_dir`` already exists it is left untouched and the caller
    should have skipped via the manifest; a stale ``.tmp-`` sibling from
    a crashed run is removed first.
    """

    class _Ctx:
        def __enter__(self):
            parent = os.path.dirname(final_dir.rstrip("/")) or "."
            os.makedirs(parent, exist_ok=True)
            base = os.path.basename(final_dir.rstrip("/"))
            self.tmp = os.path.join(parent, f".tmp-{base}")
            if os.path.exists(self.tmp):
                shutil.rmtree(self.tmp)
            os.makedirs(self.tmp)
            return self.tmp

        def __exit__(self, exc_type, exc, tb):
            if exc_type is None:
                if os.path.exists(final_dir):
                    shutil.rmtree(final_dir)
                os.replace(self.tmp, final_dir)
            else:
                shutil.rmtree(self.tmp, ignore_errors=True)
            return False

    return _Ctx()


def list_page_shards(pages_dir: str, group_size: int = 1) -> List[List[str]]:
    """Input shards = sorted parquet files grouped by ``group_size``."""
    files = sorted(
        os.path.join(pages_dir, f)
        for f in os.listdir(pages_dir)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    return [files[i : i + group_size] for i in range(0, len(files), group_size)]
