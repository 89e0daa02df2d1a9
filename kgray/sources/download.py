"""Download planner shim (S6).

The reference's ``kg download`` is a YAML-driven URL fetcher
(download.py:6-27 over kghub_downloader; config download.yaml) with a
``snippet_only`` mode (first 5 kB). No network exists here, so the
fetch is gated; the config parsing/planning half is real so pipelines
can validate their download manifests offline.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional


@dataclass
class DownloadItem:
    url: str
    local_name: Optional[str] = None
    tag: Optional[str] = None


def plan_downloads(yaml_path: str) -> List[DownloadItem]:
    """Parse a kghub-style download YAML (list of {url, local_name,
    tag}) into a download plan — validation/planning only."""
    import yaml

    with open(yaml_path, "r", encoding="utf-8") as f:
        entries = yaml.safe_load(f) or []
    out = []
    for e in entries:
        if not isinstance(e, dict) or "url" not in e:
            continue
        out.append(DownloadItem(url=e["url"], local_name=e.get("local_name"), tag=e.get("tag")))
    return out


def download(yaml_path: str, output_dir: str, snippet_only: bool = False) -> None:
    """Gated: fetching needs network access, unavailable here."""
    raise NotImplementedError(
        "downloads need network access; synthesize fixtures locally (driver rule: no external data)"
    )


def holdout_split(*args, **kwargs):
    """O8 parity: the reference declares a spanning-tree-preserving
    positive/negative edge holdout split and raises NotImplementedError
    (run.py:210-273). Kept unimplemented here too, faithfully — a real
    deterministic hash-based split operator exists separately as
    ``kgray.stages.split.hash_split``."""
    raise NotImplementedError(
        "edge holdout splitting is declared but unimplemented in the reference "
        "(run.py:273); for a working deterministic split use "
        "kgray.stages.split.hash_split"
    )
