"""Download source (S6).

The reference's ``kg download`` is a YAML-driven URL fetcher
(download.py:6-27 over kghub_downloader; config download.yaml) with a
``snippet_only`` mode (first 5 kB). The planner half parses/validates
manifests offline; the fetch half is a real stdlib-urllib HTTP client
— exercised in pytest against a localhost fixture server (this sandbox
has no external network, and the driver rule forbids external data, so
tests never leave loopback)."""

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


SNIPPET_BYTES = 5 * 1024  # reference parity: snippet_only keeps 5 kB


def fetch(url: str, out_path: str, snippet_only: bool = False,
          timeout: float = 30.0) -> str:
    """Fetch ONE http(s) URL to ``out_path`` (streaming, 64 kB chunks;
    ``snippet_only`` stops after the first 5 kB, reference parity).
    Only http/https schemes are accepted — a file:// or custom scheme
    in a downloaded manifest must fail loudly, not read local disk."""
    import os
    import urllib.request
    from urllib.parse import urlparse

    scheme = urlparse(url).scheme
    if scheme not in ("http", "https"):
        raise ValueError(f"fetch: unsupported URL scheme {scheme!r} in {url!r}")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    limit = SNIPPET_BYTES if snippet_only else None
    got = 0
    with urllib.request.urlopen(url, timeout=timeout) as resp, \
            open(out_path, "wb") as f:
        while True:
            want = 65536 if limit is None else min(65536, limit - got)
            if want <= 0:
                break
            chunk = resp.read(want)
            if not chunk:
                break
            f.write(chunk)
            got += len(chunk)
    return out_path


def download(yaml_path: str, output_dir: str, snippet_only: bool = False) -> List[str]:
    """Reference ``kg download``: fetch every manifest entry into
    ``output_dir`` (named by ``local_name`` or the URL basename).
    Returns the written paths."""
    import os
    from urllib.parse import urlparse

    out = []
    for item in plan_downloads(yaml_path):
        name = item.local_name or os.path.basename(urlparse(item.url).path)
        if not name:
            raise ValueError(f"download: cannot derive a file name from {item.url!r}")
        out.append(fetch(item.url, os.path.join(output_dir, name),
                         snippet_only=snippet_only))
    return out


def holdout_split(*args, **kwargs):
    """O8 parity: the reference declares a spanning-tree-preserving
    positive/negative edge holdout split and raises NotImplementedError
    (run.py:210-273). This shim mirrors the reference's raise; the
    WORKING implementation of the declared contract is
    ``kgray.stages.holdout.edge_holdout`` (distributed spanning forest
    + sampled negatives), and a plain deterministic doc split is
    ``kgray.stages.split.hash_split``."""
    raise NotImplementedError(
        "edge holdout splitting is declared but unimplemented in the reference "
        "(run.py:273); the working implementation here is "
        "kgray.stages.holdout.edge_holdout (or kgray.stages.split.hash_split "
        "for a plain deterministic split)"
    )
