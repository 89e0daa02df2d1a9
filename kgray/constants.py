"""Shared column vocabularies for the KGX exchange format.

Semantics mirror the reference's column lists
(kg_microbe_merge/constants.py:9-24) — the canonical KGX nodes/edges
column sets the merge operates over. The engine's schema handling is
dynamic (union-by-name, see sources/kgx_tsv.py), so these lists are
defaults / documentation, not hard requirements.
"""

# Canonical KGX node columns (reference constants.py:9-23; test fixtures
# additionally carry `iri`, which union-by-name picks up dynamically).
NODES_COLUMNS = [
    "id",
    "name",
    "description",
    "category",
    "xref",
    "provided_by",
    "synonym",
    "object",
    "predicate",
    "relation",
    "same_as",
    "subject",
    "subsets",
]

# Canonical KGX edge columns (reference constants.py:24). Edge identity
# is the triple (subject, predicate, object); the `id` column present in
# some sources is dropped on load (reference utils/duckdb_utils.py:432).
EDGES_COLUMNS = [
    "subject",
    "predicate",
    "object",
    "relation",
    "primary_knowledge_source",
]

EDGE_KEY = ["subject", "predicate", "object"]

# Multi-valued properties are pipe-joined inside a single string value
# (reference utils/duckdb_utils.py:332).
MULTIVALUE_SEP = "|"

# CURIE-prefix → biolink category map used for stub-node repair
# (reference utils/edge_vs_node_check.py:7-20, `determine_category`).
# Order matters: first matching prefix wins; no match → "Unknown".
CATEGORY_PREFIX_MAP = [
    ("EC:", "biolink:Enzyme"),
    ("assay:", "biolink:PhenotypicQuality"),
    ("trophic_type:", "biolink:BiologicalProcess"),
    ("cell_shape:", "biolink:PhenotypicQuality"),
    ("UniprotKB:", "biolink:Enzyme"),
    ("medium:", "biolink:ChemicalEntity"),
    ("carbon_substrates:", "biolink:ChemicalEntity"),
]
UNKNOWN_CATEGORY = "Unknown"
