"""SPARQL source shim (S9).

The reference's ``kg query`` runs a SPARQL query against a remote
endpoint and converts the JSON bindings to TSV (query.py:9-23 run_query,
:36-59 result_dict_to_tsv). This environment has no network, so the
endpoint call is gated behind ``NotImplementedError``; the pure
bindings→TSV conversion — the data-processing part — is implemented
and tested.
"""

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


def run_query(query: str, endpoint: str) -> Dict[str, Any]:
    """Remote SPARQL execution — requires network access, unavailable
    in this environment. The conversion half (result_dict_to_tsv) is
    fully functional on saved/synthesized result JSON."""
    raise NotImplementedError(
        "SPARQL endpoints need network access; feed saved JSON results to result_dict_to_tsv instead"
    )
