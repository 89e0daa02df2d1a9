"""Queryable KG store — the data half of the reference's kg-chat CLI
surface (reference ``run.py:276-381``: ``import`` / ``test-query`` /
``show-schema`` over a DuckDB or Neo4j backend).

The reference delegates to the external kg-chat package's
``DuckDBImplementation.load_kg()`` — semantically: load the merged KGX
``nodes.tsv`` / ``edges.tsv`` from a data directory into ``nodes`` /
``edges`` tables of a persistent database next to the data.  That is
pure data-processing, so it is implemented natively here (DuckDB is a
public, in-sandbox dependency); only the LLM chat wrapper stays gated
on the external package, exactly as the reference gates it.

The store is a driver-side convenience for interactive inspection of a
MERGED graph (the reference's use case — its largest merged outputs are
single-digit GB); the distributed query path for web-scale graphs is
the Ray registry, not this file.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List

DB_NAME = "kgchat.duckdb"


def _find(data_dir: str, kind: str) -> List[str]:
    pats = [f"*{kind}*.tsv", f"*{kind}*.tsv.gz"]
    out: List[str] = []
    for pat in pats:
        out.extend(sorted(glob.glob(os.path.join(data_dir, pat))))
    return out


def _connect(data_dir: str):
    import duckdb

    return duckdb.connect(os.path.join(data_dir, DB_NAME))


def import_kg_duckdb(data_dir: str) -> Dict[str, int]:
    """Load the data directory's KGX TSVs into ``nodes`` / ``edges``
    tables of ``<data_dir>/kgchat.duckdb`` (idempotent: re-import
    replaces).  All columns VARCHAR, union-by-name across files — the
    same read contract as the engine's KGX TSV source."""
    con = _connect(data_dir)
    counts: Dict[str, int] = {}
    try:
        for kind in ("nodes", "edges"):
            paths = _find(data_dir, kind)
            if not paths:
                raise FileNotFoundError(
                    f"no *{kind}*.tsv under {data_dir!r} — point --data-dir "
                    "at a directory of merged KGX files")
            con.execute(f"DROP TABLE IF EXISTS {kind}")
            con.execute(
                f"CREATE TABLE {kind} AS SELECT * FROM read_csv(?, "
                "delim='\t', header=true, all_varchar=true, "
                "union_by_name=true)", [paths])
            counts[kind] = con.execute(
                f"SELECT COUNT(*) FROM {kind}").fetchone()[0]
    finally:
        con.close()
    return counts


def _ensure_imported(data_dir: str):
    if not os.path.exists(os.path.join(data_dir, DB_NAME)):
        import_kg_duckdb(data_dir)


def sample_query(data_dir: str, limit: int = 10) -> List[dict]:
    """The reference's ``test-query``: ``SELECT * FROM nodes LIMIT 10``
    as a list of dict rows (auto-imports on first use)."""
    _ensure_imported(data_dir)
    con = _connect(data_dir)
    try:
        cur = con.execute(f"SELECT * FROM nodes LIMIT {int(limit)}")
        cols = [d[0] for d in cur.description]
        return [dict(zip(cols, row)) for row in cur.fetchall()]
    finally:
        con.close()


def show_schema(data_dir: str) -> Dict[str, Dict[str, str]]:
    """The reference's ``show-schema``: ``{table: {column: type}}``
    for the imported store (auto-imports on first use)."""
    _ensure_imported(data_dir)
    con = _connect(data_dir)
    try:
        out: Dict[str, Dict[str, str]] = {}
        for kind in ("nodes", "edges"):
            rows = con.execute(f"DESCRIBE {kind}").fetchall()
            out[kind] = {r[0]: r[1] for r in rows}
        return out
    finally:
        con.close()
