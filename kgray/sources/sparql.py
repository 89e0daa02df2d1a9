"""SPARQL source (S9).

The reference's ``kg query`` runs a SPARQL query against a remote
endpoint and converts the JSON bindings to TSV (query.py:9-23
run_query, :36-59 result_dict_to_tsv). Both halves are real here: the
endpoint call is a stdlib SPARQL-1.1-protocol POST (tested against a
localhost fixture endpoint — this sandbox has no external network),
and the bindings→TSV conversion is pure data processing."""

from __future__ import annotations

import os
from typing import Any, Dict, List


def result_dict_to_tsv(result: Dict[str, Any], out_path: str) -> str:
    """SPARQL JSON results → TSV (reference query.py:36-59 semantics:
    header from ``head.vars``; one row per binding; missing variables
    → empty field; values taken from each binding's ``value``)."""
    variables: List[str] = result.get("head", {}).get("vars", [])
    bindings = result.get("results", {}).get("bindings", [])
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w", encoding="utf-8", newline="") as f:
        f.write("\t".join(variables) + "\n")
        for b in bindings:
            row = [str(b.get(v, {}).get("value", "")) for v in variables]
            f.write("\t".join(row) + "\n")
    return out_path


def run_query(query: str, endpoint: str, timeout: float = 60.0) -> Dict[str, Any]:
    """Execute a SPARQL query against an endpoint (SPARQL 1.1 protocol:
    form-encoded POST, ``Accept: application/sparql-results+json``) and
    return the parsed JSON results dict — feed it to
    :func:`result_dict_to_tsv`. Exercised in pytest against a localhost
    fixture endpoint (no external network in this sandbox)."""
    import json
    import urllib.request
    from urllib.parse import urlencode, urlparse

    scheme = urlparse(endpoint).scheme
    if scheme not in ("http", "https"):
        raise ValueError(f"run_query: unsupported endpoint scheme {scheme!r}")
    req = urllib.request.Request(
        endpoint,
        data=urlencode({"query": query}).encode("utf-8"),
        headers={"Accept": "application/sparql-results+json",
                 "Content-Type": "application/x-www-form-urlencoded"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read().decode("utf-8"))
