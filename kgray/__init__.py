"""kgray — a Ray-Data-native knowledge-graph construction + merge engine.

Re-implements the query/data-processing capabilities of
Knowledge-Graph-Hub/kg-microbe-merge (KGX node/edge merge semantics,
referential-integrity repair, graph stats) as idiomatic Ray Data
pipelines, and extends them — per the project north rule — into a full
web-scale KG-construction pipeline: Common-Crawl-style pages →
deterministic HTML→text extraction → mention/triple extraction →
entity linking → distributed canonicalization (union-find) → KGX merge
→ predicate-partitioned Parquet with a checkpoint manifest.

Nothing in this package calls ``ray.init()`` — the caller owns the Ray
session (driver contract).
"""

__version__ = "0.1.0"
