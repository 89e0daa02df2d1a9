"""Driver-contract query registry: every operator from SURVEY.md §2 (plus
the training-data operators) as a ``(sf_dir) -> Dataset/Table`` callable
with, where expressible, an exact DuckDB oracle over the same parquet.

The KGX operators run over KGX-shaped tables DERIVED from the driver
tables (documents/events/customer/…) with derivations simple enough to
mirror in ANSI SQL, so the oracle exercises the real merge semantics
(priority-name rule, sorted distinct pipe-join, triple dedup, windowed
priority merge, anti-join repair) end-to-end.

Column names in each Ray result match the oracle's aliases exactly
(driver compares order-insensitively by sorted column name).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data import Dataset
from ray.data.aggregate import Count, Mean, Sum

from kgray.kernels.hashagg import stable_round

# ---------------------------------------------------------------------------
# shared derivations (Ray side). Each has a matching SQL fragment below.
# ---------------------------------------------------------------------------

_PRIORITY = ["src3", "src7"]


def _docs(sf_dir: str, columns=None) -> Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _events(sf_dir: str, columns=None) -> Dataset:
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def _mod(arr, m: int):
    """Elementwise modulo (pyarrow 16 has no pc.mod kernel) — zero-copy
    to numpy for int columns, back to Arrow."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pa.array(np.mod(arr.to_numpy(zero_copy_only=False), m))


def _concat(prefix: str, ints) -> pa.Array:
    return pc.binary_join_element_wise(
        pa.array([prefix] * len(ints), type=pa.string()),
        ints.cast(pa.string()),
        "",
    )


def _doc_nodes_batch(t: pa.Table) -> pa.Table:
    """documents → KGX node rows (two hundred fifty overlapping ids)."""
    doc_id = t.column("doc_id")
    return pa.table(
        {
            "id": _concat("DOC:", _mod(doc_id, 250)),
            "name": pc.utf8_slice_codeunits(t.column("text"), 0, 24),
            "category": _concat("biolink:", t.column("lang")),
            "provided_by": t.column("source"),
            "synonym": pc.if_else(
                pc.greater_equal(t.column("n_chars"), 200),
                pa.scalar("long", type=pa.string()),
                pa.scalar(None, type=pa.string()),
            ),
        }
    )


_DOC_NODES_SQL = (
    "SELECT 'DOC:' || CAST(doc_id % 250 AS VARCHAR) AS id, "
    "substr(text, 1, 24) AS name, "
    "'biolink:' || lang AS category, "
    "source AS provided_by, "
    "CASE WHEN n_chars >= 200 THEN 'long' ELSE NULL END AS synonym "
    "FROM documents"
)


def _event_edges_batch(t: pa.Table) -> pa.Table:
    """events → KGX edge rows with M5-recognizable object prefixes."""
    ev = t.column("event_type")
    suffix = _mod(t.column("event_id"), 500)
    prefix = pc.if_else(
        pc.equal(ev, "view"),
        pa.scalar("EC:", type=pa.string()),
        pc.if_else(
            pc.equal(ev, "click"),
            pa.scalar("UniprotKB:", type=pa.string()),
            pa.scalar("medium:", type=pa.string()),
        ),
    )
    obj = pc.binary_join_element_wise(prefix, suffix.cast(pa.string()), "")
    return pa.table(
        {
            "subject": _concat("U:", _mod(t.column("user_id"), 200)),
            "predicate": ev,
            "object": obj,
            "provenance": _concat("prov_", _mod(t.column("event_id"), 7)),
            "suffix": suffix,
        }
    )


_EVENT_EDGES_SQL = (
    "SELECT 'U:' || CAST(user_id % 200 AS VARCHAR) AS subject, "
    "event_type AS predicate, "
    "(CASE WHEN event_type = 'view' THEN 'EC:' WHEN event_type = 'click' "
    "THEN 'UniprotKB:' ELSE 'medium:' END) || CAST(event_id % 500 AS VARCHAR) AS object, "
    "'prov_' || CAST(event_id % 7 AS VARCHAR) AS provenance, "
    "event_id % 500 AS suffix "
    "FROM events"
)


def _dup_docs(sf_dir: str, suffix: str = "") -> Dataset:
    """documents ∪ copies (doc_id+100000, text [|| ' ' || suffix])."""

    def _dup(t: pa.Table) -> pa.Table:
        text = t.column("text")
        if suffix:
            text2 = pc.binary_join_element_wise(text, pa.array([suffix] * len(t), type=pa.string()), " ")
        else:
            text2 = text
        t1 = pa.table({"doc_id": t.column("doc_id"), "text": t.column("text")})
        t2 = pa.table({"doc_id": pc.add(t.column("doc_id"), 100000), "text": text2})
        return pa.concat_tables([t1, t2])

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(_dup, batch_format="pyarrow")


def _dup_docs_sql(suffix: str = "") -> str:
    extra = f"text || ' {suffix}'" if suffix else "text"
    return (
        "SELECT doc_id, text FROM documents "
        f"UNION ALL SELECT doc_id + 100000 AS doc_id, {extra} AS text FROM documents"
    )


# ---------------------------------------------------------------------------
# KGX operator queries
# ---------------------------------------------------------------------------

def q_kgx_node_merge(sf_dir: str):
    from kgray.pipelines.kgx_merge import merge_nodes

    nodes = _docs(sf_dir).map_batches(_doc_nodes_batch, batch_format="pyarrow")
    return merge_nodes(nodes, priority_sources=_PRIORITY)


SQL_KGX_NODE_MERGE = f"""
SELECT id,
  COALESCE(MAX(CASE WHEN provided_by IN ('src3','src7') THEN name END), MAX(name)) AS name,
  STRING_AGG(DISTINCT category, '|' ORDER BY category) AS category,
  STRING_AGG(DISTINCT provided_by, '|' ORDER BY provided_by) AS provided_by,
  STRING_AGG(DISTINCT synonym, '|' ORDER BY synonym) AS synonym
FROM ({_DOC_NODES_SQL}) GROUP BY id
"""


def q_kgx_edge_dedup(sf_dir: str):
    from kgray.pipelines.kgx_merge import merge_edges

    edges = _events(sf_dir).map_batches(_event_edges_batch, batch_format="pyarrow")
    return merge_edges(edges.select_columns(["subject", "predicate", "object"]))


SQL_KGX_EDGE_DEDUP = f"SELECT DISTINCT subject, predicate, object FROM ({_EVENT_EDGES_SQL})"


def q_kgx_edge_provenance(sf_dir: str):
    from kgray.pipelines.kgx_merge import merge_edges

    edges = _events(sf_dir).map_batches(_event_edges_batch, batch_format="pyarrow")
    return merge_edges(
        edges.select_columns(["subject", "predicate", "object", "provenance"]), provenance=True
    )


SQL_KGX_EDGE_PROVENANCE = f"""
SELECT subject, predicate, object,
  STRING_AGG(DISTINCT provenance, '|' ORDER BY provenance) AS provenance
FROM ({_EVENT_EDGES_SQL}) GROUP BY subject, predicate, object
"""


def _base_subset(sf_dir: str):
    def _cust(t: pa.Table) -> pa.Table:
        return pa.table(
            {"id": _concat("K:", _mod(t.column("c_custkey"), 100)), "name": t.column("c_name")}
        )

    def _supp(t: pa.Table) -> pa.Table:
        return pa.table(
            {"id": _concat("K:", _mod(t.column("s_suppkey"), 100)), "name": t.column("s_name")}
        )

    base = ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]).map_batches(
        _cust, batch_format="pyarrow"
    )
    subset = ray.data.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]).map_batches(
        _supp, batch_format="pyarrow"
    )
    return base, subset


_PRIORITY_MERGE_SQL_CTE = """
WITH t AS (
  SELECT 'K:' || CAST(c_custkey % 100 AS VARCHAR) AS id, c_name AS name, 'base' AS source_table FROM customer
  UNION ALL
  SELECT 'K:' || CAST(s_suppkey % 100 AS VARCHAR) AS id, s_name AS name, 'subset' AS source_table FROM supplier
), r AS (
  SELECT id, name, source_table,
    ROW_NUMBER() OVER (
      PARTITION BY id
      ORDER BY CASE WHEN source_table = 'base' THEN 0 ELSE 1 END, id, name, source_table
    ) AS rn
  FROM t
)
"""


def q_kgx_priority_merge(sf_dir: str):
    from kgray.pipelines.kgx_merge import priority_merge_two_tables

    base, subset = _base_subset(sf_dir)
    merged, _dups = priority_merge_two_tables(base, subset, key=["id"])
    return merged


SQL_KGX_PRIORITY_MERGE = _PRIORITY_MERGE_SQL_CTE + "SELECT id, name, source_table FROM r WHERE rn = 1"


def q_kgx_priority_merge_duplicates(sf_dir: str):
    from kgray.pipelines.kgx_merge import priority_merge_two_tables

    base, subset = _base_subset(sf_dir)
    _merged, dups = priority_merge_two_tables(base, subset, key=["id"])
    return dups


SQL_KGX_PRIORITY_MERGE_DUPLICATES = (
    _PRIORITY_MERGE_SQL_CTE + "SELECT id, name, source_table FROM r WHERE rn > 1"
)


_NODE_IDS_SQL = f"""
SELECT DISTINCT subject AS id FROM ({_EVENT_EDGES_SQL})
UNION
SELECT DISTINCT object AS id FROM ({_EVENT_EDGES_SQL}) WHERE suffix % 3 = 0
"""


def _integrity_inputs(sf_dir: str):
    edges = _events(sf_dir).map_batches(_event_edges_batch, batch_format="pyarrow")

    def _nodes(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.equal(_mod(t.column("suffix"), 3), 0))
        subj = pa.table({"id": t.column("subject")})
        obj = pa.table({"id": keep.column("object")})
        return pa.concat_tables([subj, obj])

    nodes = edges.map_batches(_nodes, batch_format="pyarrow")
    from kgray.pipelines.kgx_merge import dedup_whole_rows

    return edges.select_columns(["subject", "predicate", "object"]), dedup_whole_rows(nodes)


def q_integrity_missing_nodes(sf_dir: str):
    from kgray.stages.integrity import missing_endpoints

    edges, nodes = _integrity_inputs(sf_dir)
    return missing_endpoints(edges, nodes)


SQL_INTEGRITY_MISSING = f"""
SELECT id FROM (
  SELECT DISTINCT subject AS id FROM ({_EVENT_EDGES_SQL})
  UNION SELECT DISTINCT object AS id FROM ({_EVENT_EDGES_SQL})
) e WHERE id NOT IN ({_NODE_IDS_SQL})
"""


def q_integrity_stub_repair(sf_dir: str):
    from kgray.stages.integrity import missing_endpoints, stub_nodes

    edges, nodes = _integrity_inputs(sf_dir)
    missing = missing_endpoints(edges, nodes)
    return stub_nodes(missing, ["id", "category"])


SQL_INTEGRITY_STUBS = f"""
SELECT id,
  CASE WHEN starts_with(id, 'EC:') THEN 'biolink:Enzyme'
       WHEN starts_with(id, 'assay:') THEN 'biolink:PhenotypicQuality'
       WHEN starts_with(id, 'trophic_type:') THEN 'biolink:BiologicalProcess'
       WHEN starts_with(id, 'cell_shape:') THEN 'biolink:PhenotypicQuality'
       WHEN starts_with(id, 'UniprotKB:') THEN 'biolink:Enzyme'
       WHEN starts_with(id, 'medium:') THEN 'biolink:ChemicalEntity'
       WHEN starts_with(id, 'carbon_substrates:') THEN 'biolink:ChemicalEntity'
       ELSE 'Unknown' END AS category
FROM (
  SELECT id FROM (
    SELECT DISTINCT subject AS id FROM ({_EVENT_EDGES_SQL})
    UNION SELECT DISTINCT object AS id FROM ({_EVENT_EDGES_SQL})
  ) e WHERE id NOT IN ({_NODE_IDS_SQL})
)
"""


def q_whole_row_dedup(sf_dir: str):
    from kgray.pipelines.kgx_merge import dedup_whole_rows

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderstatus", "o_orderpriority"]
    )
    return dedup_whole_rows(ds)


SQL_WHOLE_ROW_DEDUP = "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"


def q_graph_stats(sf_dir: str):
    nodes = _docs(sf_dir).map_batches(_doc_nodes_batch, batch_format="pyarrow")
    return nodes.groupby("category").aggregate(Count(alias_name="n"))


SQL_GRAPH_STATS = f"SELECT category, COUNT(*) AS n FROM ({_DOC_NODES_SQL}) GROUP BY category"


def q_union_by_name(sf_dir: str):
    from kgray.sources.kgx_tsv import align_to_columns, union_columns

    def _a(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": _concat("DOC:", t.column("doc_id")),
                "name": pc.utf8_slice_codeunits(t.column("text"), 0, 8),
            }
        )

    def _b(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": _concat("CUST:", t.column("c_custkey")),
                "segment": t.column("c_mktsegment"),
            }
        )

    da = _docs(sf_dir, ["doc_id", "text"]).map_batches(_a, batch_format="pyarrow")
    db = ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]).map_batches(
        _b, batch_format="pyarrow"
    )
    cols = union_columns([["id", "name"], ["id", "segment"]])
    return align_to_columns(da, cols).union(align_to_columns(db, cols))


SQL_UNION_BY_NAME = """
SELECT 'DOC:' || CAST(doc_id AS VARCHAR) AS id, substr(text, 1, 8) AS name, NULL AS segment FROM documents
UNION ALL BY NAME
SELECT 'CUST:' || CAST(c_custkey AS VARCHAR) AS id, NULL AS name, c_mktsegment AS segment FROM customer
"""


# ---------------------------------------------------------------------------
# Training-data operator queries
# ---------------------------------------------------------------------------

def q_dedup_exact(sf_dir: str):
    from kgray.stages.dedup import exact_dedup

    return exact_dedup(_dup_docs(sf_dir))


SQL_DEDUP_EXACT = f"SELECT MIN(doc_id) AS doc_id, text FROM ({_dup_docs_sql()}) GROUP BY text"


def q_dedup_minhash_pairs(sf_dir: str):
    from kgray.stages.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold=0.7)


# Brute-force word-3-gram Jaccard in SQL — the exact ground truth the
# (probabilistically near-exhaustive, exactly-verified) LSH must match.
SQL_DEDUP_MINHASH_PAIRS = """
WITH words AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
  FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
  WHERE len(w) >= 3
), counts AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS m
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b
FROM inter JOIN counts ca ON ca.doc_id = id_a JOIN counts cb ON cb.doc_id = id_b
WHERE m * 1.0 / (ca.n + cb.n - m) >= 0.7
"""


def q_dedup_minhash(sf_dir: str):
    """Near-dup SURVIVORS: min doc_id per verified near-dup component
    (the full dedup, not just the pair list). Oracled end-to-end by a
    recursive CTE: brute-force Jaccard pairs → transitive closure →
    drop every node whose component min is smaller."""
    from kgray.stages.dedup import minhash_lsh_dedup

    return minhash_lsh_dedup(_docs(sf_dir, ["doc_id", "text"]), threshold=0.7)


SQL_DEDUP_MINHASH_SURVIVORS = """
WITH RECURSIVE words AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
  FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
  WHERE len(w) >= 3
), counts AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS m
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b
  FROM inter JOIN counts ca ON ca.doc_id = id_a JOIN counts cb ON cb.doc_id = id_b
  WHERE m * 1.0 / (ca.n + cb.n - m) >= 0.7
), edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs
), walk(u, label) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.v, w.label FROM walk w JOIN edges e ON w.u = e.u
), labels AS (
  SELECT u, MIN(label) AS label FROM walk GROUP BY u
)
SELECT d.doc_id, d.text FROM documents d
WHERE d.doc_id NOT IN (SELECT u FROM labels WHERE label < u)
"""


def q_dedup_jaccard_pairs(sf_dir: str):
    """Exact inverted-index n-gram Jaccard (no sketch): must equal the
    same brute-force SQL the MinHash+LSH path is only *probably* equal
    to — the deterministic member of the dedup family."""
    from kgray.stages.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold=0.7)


# Same ground truth as SQL_DEDUP_MINHASH_PAIRS: the exact operator and
# the sketch-based one answer the same question.
SQL_DEDUP_JACCARD_PAIRS = SQL_DEDUP_MINHASH_PAIRS


def q_dedup_embedding_pairs(sf_dir: str):
    """Embedding near-dup via the LSH-bucketed SCALE path (no matrix
    broadcast); the brute-force scan stays the test baseline inside
    embedding_near_dup's size switch. n_tables is raised until the
    banding is exact at threshold 0.99 on this fixture (exact-direction
    duplicates always collide — hyperplane hashes depend only on
    direction)."""
    from kgray.stages.similarity import lsh_bucketed_near_dup

    def _dup(t: pa.Table) -> pa.Table:
        emb = t.column("embedding").combine_chunks()
        # Vectorized ×2 on the flat child values; list offsets unchanged.
        scaled = pa.ListArray.from_arrays(
            emb.offsets, pc.multiply(emb.values, pa.scalar(2.0, type=pa.float32()))
        ).cast(pa.list_(pa.float32()))
        t1 = pa.table({"vec_id": t.column("vec_id"), "embedding": emb})
        t2 = pa.table({"vec_id": pc.add(t.column("vec_id"), 100000), "embedding": scaled})
        return pa.concat_tables([t1, t2])

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]).map_batches(
        _dup, batch_format="pyarrow"
    )
    return lsh_bucketed_near_dup(ds, threshold=0.99, n_tables=12)


SQL_DEDUP_EMBEDDING_PAIRS = """
WITH all_v AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, list_transform(embedding, x -> x * 2.0) AS embedding FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM all_v a JOIN all_v b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.99
"""


def _query_matrix(sf_dir: str, n: int = 5) -> np.ndarray:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    order = pc.sort_indices(t.column("vec_id"))
    emb = t.column("embedding").take(order[:n])
    return np.asarray(emb.to_pylist(), dtype=np.float64)


def q_ann_topk(sf_dir: str):
    from kgray.stages.similarity import ann_topk_bruteforce

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = ann_topk_bruteforce(ds, _query_matrix(sf_dir), k=10)
    return out.select_columns(["q_id", "vec_id", "rank"])


SQL_ANN_TOPK = """
SELECT q_id, vec_id, rank FROM (
  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
    ROW_NUMBER() OVER (
      PARTITION BY q.vec_id
      ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id
    ) AS rank
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 5
) WHERE rank <= 10
"""


def _ann_recall_check(approx, sf_dir: str, floor: float, name: str):
    """Self-assertion for the approximate-ANN queries (same contract as
    construct_kg's in-query P/R gate): mean recall@k vs the exact
    brute-force top-k must clear ``floor`` or the query RAISES instead
    of returning plausible-but-bad rows. Both result sets are tiny
    (num_queries × k), so the check is a driver-side set compare."""
    from kgray.stages.similarity import ann_topk_bruteforce

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    exact = ann_topk_bruteforce(ds, _query_matrix(sf_dir), k=10).take_all()
    got = approx.take_all()
    truth: dict = {}
    for r in exact:
        truth.setdefault(r["q_id"], set()).add(r["vec_id"])
    recalls = []
    for qi, tset in truth.items():
        rows = {r["vec_id"] for r in got if r["q_id"] == qi}
        recalls.append(len(rows & tset) / max(1, len(tset)))
    mean = sum(recalls) / max(1, len(recalls))
    if mean < floor:
        raise RuntimeError(
            f"{name}: recall@10 self-check failed — mean {mean:.3f} < floor {floor} "
            f"(per-query {sorted(recalls)})"
        )
    return pa.table(
        {
            "q_id": pa.array([r["q_id"] for r in got], type=pa.int32()),
            "vec_id": pa.array([r["vec_id"] for r in got], type=pa.int64()),
            "rank": pa.array([r["rank"] for r in got], type=pa.int64()),
        }
    )


def _dump_ann_candidates(pairs, sf_dir: str, name: str) -> None:
    """Persist an approximate-ANN query's (q_id, vec_id) candidate set
    to a deterministic per-sf path so its ORACLE can brute-force-rank
    the SAME subset in SQL (the hashing/quantization is seed-fixed, so
    the subset — and therefore the ranked result — is deterministic;
    this turns the formerly rows-only queries into rows+hash-checkable
    ones). Oracle-harness support, not operator work: the collect is
    O(candidates) at the fixed correctness sf."""
    import os

    os.makedirs("/tmp/kgray_oracle", exist_ok=True)
    tag = os.path.basename(os.path.normpath(sf_dir))
    t = pa.concat_tables(pairs.iter_batches(batch_format="pyarrow"),
                         promote_options="default")
    pq.write_table(t, f"/tmp/kgray_oracle/{name}_cand_{tag}.parquet")
    # The oracle SQL is one static string shared by every harness (the
    # driver at sf0.01, pytest at sf0.001), so it cannot carry an sf
    # tag: it reads this last-written untagged copy instead. Safe under
    # the documented query-before-oracle contract; the tagged copy
    # above is kept for cross-sf debugging.
    pq.write_table(t, f"/tmp/kgray_oracle/{name}_cand_latest.parquet")


def q_ann_lsh(sf_dir: str):
    """LSH ANN — self-asserting (raises unless mean recall@10 vs the
    exact brute force clears the pinned floor) AND oracle-checked: the
    seed-fixed candidate set is dumped for SQL_ANN_CAND to brute-force
    rank, so the deterministic part (candidate membership + ranking)
    rows+hash-matches DuckDB."""
    from kgray.stages.similarity import ann_topk_lsh, lsh_candidate_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qm = _query_matrix(sf_dir)
    _dump_ann_candidates(lsh_candidate_pairs(ds, qm), sf_dir, "ann_lsh")
    ds2 = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    approx = ann_topk_lsh(ds2, qm, k=10).select_columns(["q_id", "vec_id", "rank"])
    return _ann_recall_check(approx, sf_dir, floor=0.5, name="ann_lsh")


def q_ann_ivf(sf_dir: str):
    """IVF coarse-quantizer ANN — self-asserting like ann_lsh, and
    oracle-checked the same way (seed-fixed candidate dump +
    brute-force SQL ranking of the subset)."""
    from kgray.stages.similarity import ann_topk_ivf, ivf_candidate_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qm = _query_matrix(sf_dir)
    _dump_ann_candidates(ivf_candidate_pairs(ds, qm), sf_dir, "ann_ivf")
    ds2 = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    approx = ann_topk_ivf(ds2, qm, k=10).select_columns(["q_id", "vec_id", "rank"])
    return _ann_recall_check(approx, sf_dir, floor=0.5, name="ann_ivf")


def _sql_ann_cand(name: str) -> str:
    """Brute-force SQL ranking of the candidate subset dumped by the
    matching query. The query must run before its oracle — the driver,
    pytest's oracle board and the mirror sweep all do — and the dump is
    deterministic per sf, so the last-written untagged copy is exactly
    the running harness's candidate set."""
    return f"""
SELECT q_id, vec_id, rank FROM (
  SELECT c.q_id, c.vec_id,
    ROW_NUMBER() OVER (
      PARTITION BY c.q_id
      ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, c.vec_id
    ) AS rank
  FROM read_parquet('/tmp/kgray_oracle/{name}_cand_latest.parquet') c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN embeddings q ON q.vec_id = c.q_id
) WHERE rank <= 10
"""


def q_dedup_simhash(sf_dir: str):
    from kgray.stages.dedup import simhash_pairs

    return simhash_pairs(_dup_docs(sf_dir, suffix="zz"), max_hamming=10)


# Exact SQL reproduction of simhash_pairs (stages/dedup.py): per-word
# md5-first-8-bytes-little-endian hash, ±1 bit accumulation → 64-bit
# simhash; 8 bands × 8 bits banding for candidates (buckets larger than
# max_bucket=200 members are skipped, modeled by the bsize filter —
# the cap is pinned operator semantics, not an approximation); Hamming
# ≤ 10 verify.
SQL_DEDUP_SIMHASH = f"""
WITH docs AS ({_dup_docs_sql('zz')}),
words AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w FROM docs
), uwh AS (
  SELECT w,
    CAST(SUM(CAST(CAST(concat('0x', substr(md5(w), i*2+1, 2)) AS UBIGINT) AS HUGEINT)
             * (1::HUGEINT << (8*i))) AS HUGEINT) AS h
  FROM (SELECT DISTINCT w FROM words) CROSS JOIN range(8) t(i) GROUP BY w
), bitsum AS (
  SELECT doc_id, b,
    SUM(CASE WHEN (o.h // (1::HUGEINT << b)) % 2 = 1 THEN 1 ELSE -1 END) AS s
  FROM (SELECT doc_id, h FROM words JOIN uwh USING (w)) o
  CROSS JOIN range(64) t(b) GROUP BY doc_id, b
), sh AS (
  SELECT doc_id,
    CAST(SUM(CASE WHEN s > 0 THEN (1::HUGEINT << b) ELSE 0::HUGEINT END) AS HUGEINT) AS uh
  FROM bitsum GROUP BY doc_id
), allsh AS (
  SELECT d.doc_id, COALESCE(sh.uh, 0::HUGEINT) AS uh
  FROM (SELECT DISTINCT doc_id FROM docs) d LEFT JOIN sh USING (doc_id)
), bands AS (
  SELECT doc_id, uh, band, CAST((uh // (1::HUGEINT << (8*band))) % 256 AS INT) AS bucket
  FROM allsh CROSS JOIN range(8) t(band)
), bsize AS (
  SELECT band, bucket, COUNT(*) AS n FROM bands GROUP BY band, bucket
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.uh AS ha, b.uh AS hb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
  JOIN bsize s ON s.band = a.band AND s.bucket = a.bucket AND s.n <= 200
)
SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 10
"""


def q_token_count(sf_dir: str):
    from kgray.stages.text import token_count_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: token_count_batch(t).select(["doc_id", "n_tokens"]), batch_format="pyarrow"
    )


SQL_TOKEN_COUNT = "SELECT doc_id, CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens FROM documents"


def q_bpe_token_count(sf_dir: str):
    """LLM-budget proxy: GPT-2-style pre-tokenizer segment count (the
    regex is RE2-restricted so DuckDB reproduces it exactly)."""
    from kgray.stages.text import bpe_token_count_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: bpe_token_count_batch(t).select(["doc_id", "n_bpe_tokens"]),
        batch_format="pyarrow",
    )


SQL_BPE_TOKEN_COUNT = (
    "SELECT doc_id, CAST(len(regexp_extract_all(text, "
    "'''s|''t|''re|''ve|''m|''ll|''d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+'"
    ")) AS BIGINT) AS n_bpe_tokens FROM documents"
)


def q_text_stats(sf_dir: str):
    def _stats(t: pa.Table) -> pa.Table:
        text = t.column("text")
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_chars": pc.utf8_length(text).cast(pa.int64()),
                "n_tokens": pc.count_substring_regex(text, r"\S+").cast(pa.int64()),
                "n_punct": pc.count_substring_regex(text, r"[.,;:!?]").cast(pa.int64()),
                "n_digits": pc.count_substring_regex(text, r"[0-9]").cast(pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(_stats, batch_format="pyarrow")


SQL_TEXT_STATS = """
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
  CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
  CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits
FROM documents
"""


def q_fingerprint(sf_dir: str):
    from kgray.stages.text import fingerprint_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: fingerprint_batch(t).select(["doc_id", "fingerprint"]), batch_format="pyarrow"
    )


SQL_FINGERPRINT = (
    "SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint FROM documents"
)


def q_langid(sf_dir: str):
    from kgray.stages.text import LangId

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 4)
    ).select_columns(["doc_id", "lang_pred"])


# Exact SQL reproduction of stages/text.LangId: letter-run word regex,
# per-language stopword hit counts, winner = first language in sorted
# order (de,en,es,fr) with STRICTLY more hits than any earlier one —
# i.e. the first to reach the max; all-zero → 'und'.
SQL_LANGID = """
WITH words AS (
  SELECT doc_id, lower(w) AS w FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '[a-zA-ZäöüßéèêàçñÁ-ÿ]+')) AS w
    FROM documents
  )
), hits AS (
  SELECT doc_id,
    COUNT(*) FILTER (WHERE w IN ('der','die','das','und','ist','von','mit','für','auf','nicht')) AS de,
    COUNT(*) FILTER (WHERE w IN ('the','and','of','to','is','in','that','for','with','are','was')) AS en,
    COUNT(*) FILTER (WHERE w IN ('el','la','los','y','es','de','que','para','con','una')) AS es,
    COUNT(*) FILTER (WHERE w IN ('le','la','les','et','est','des','que','pour','dans','une')) AS fr
  FROM words GROUP BY doc_id
)
SELECT d.doc_id,
  CASE WHEN COALESCE(greatest(h.de, h.en, h.es, h.fr), 0) = 0 THEN 'und'
       WHEN h.de = greatest(h.de, h.en, h.es, h.fr) THEN 'de'
       WHEN h.en = greatest(h.de, h.en, h.es, h.fr) THEN 'en'
       WHEN h.es = greatest(h.de, h.en, h.es, h.fr) THEN 'es'
       ELSE 'fr' END AS lang_pred
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
"""


# ---------------------------------------------------------------------------
# Relational coverage (partial-agg groupby, broadcast join, window)
# ---------------------------------------------------------------------------

def q_lineitem_agg(sf_dir: str):
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def _rev(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return t.append_column("disc_price", rev)

    out = (
        ds.map_batches(_rev, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Mean("l_quantity", alias_name="avg_qty"),
            Count(alias_name="count_order"),
        )
    )

    def _round(t: pa.Table) -> pa.Table:
        t = t.set_column(t.column_names.index("sum_qty"), "sum_qty", stable_round(t.column("sum_qty"), 2))
        t = t.set_column(
            t.column_names.index("sum_disc_price"), "sum_disc_price", stable_round(t.column("sum_disc_price"), 2)
        )
        return t.set_column(t.column_names.index("avg_qty"), "avg_qty", stable_round(t.column("avg_qty"), 4))

    return out.map_batches(_round, batch_format="pyarrow")


SQL_LINEITEM_AGG = """
SELECT l_returnflag, l_linestatus,
  ROUND(SUM(l_quantity), 2) AS sum_qty,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  ROUND(AVG(l_quantity), 4) AS avg_qty,
  COUNT(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_orders_by_nation(sf_dir: str):
    """Broadcast join: orders ⋈ customer ⋈ nation (small sides ray.put once)."""
    import pandas as pd

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    # custkey -> n_name as a single pandas Series (vectorized .map per batch;
    # the composed lookup is built ONCE on the driver and ray.put ONCE).
    n2name = pd.Series(
        nation.column("n_name").to_pandas().values,
        index=nation.column("n_nationkey").to_pandas().values,
    )
    ck2name = pd.Series(
        cust.column("c_nationkey").to_pandas().map(n2name).values,
        index=cust.column("c_custkey").to_pandas().values,
    )
    ref = ray.put(ck2name)

    def _tag(t: pa.Table) -> pa.Table:
        lut = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        names = pd.Series(t.column("o_custkey").to_pandas().values).map(lut)
        return pa.table({"n_name": pa.array(names, type=pa.string())})

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    return orders.map_batches(_tag, batch_format="pyarrow").groupby("n_name").aggregate(
        Count(alias_name="n_orders")
    )


SQL_ORDERS_BY_NATION = """
SELECT n_name, COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_filter_prune(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type", "value"])
    return ds.filter(expr="event_type == 'click' and value > 100.0").select_columns(["event_id", "user_id"])


SQL_FILTER_PRUNE = "SELECT event_id, user_id FROM events WHERE event_type = 'click' AND value > 100.0"


def q_sessionize(sf_dir: str):
    """Stream-shaped: per-user event sequence numbers by (ts, event_id).
    Hash-partitioned on user; per-partition vectorized sort + cumcount."""
    import pandas as pd

    from kgray.kernels.hashagg import grouped_apply

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])

    def _seq(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        part["seq"] = part.groupby("user_id", sort=False).cumcount() + 1
        return part[["event_id", "user_id", "seq"]]

    from kgray.kernels.hashagg import auto_partitions

    return grouped_apply(
        ds, ["user_id"], _seq,
        num_partitions=auto_partitions(files=[f"{sf_dir}/events.parquet"]),
    )


SQL_SESSIONIZE = """
SELECT event_id, user_id,
  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
FROM events
"""


def q_sliding_window(sf_dir: str):
    """2-hour windows sliding hourly: each event contributes to TWO
    windows (emitted vectorized, one extra row per event), then the
    usual partial-aggregated groupby — the sliding member of the
    window family (tumbling / session / gap are registered separately)."""

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])

    def _explode(t: pa.Table) -> pa.Table:
        epoch = t.column("ts").cast(pa.int64())  # µs since epoch
        hour = pc.multiply(pc.divide(epoch, 3_600_000_000), 3600)
        t1 = pa.table(
            {"user_id": t.column("user_id"), "win_start": hour, "value": t.column("value")}
        )
        t2 = pa.table(
            {
                "user_id": t.column("user_id"),
                "win_start": pc.subtract(hour, 3600),
                "value": t.column("value"),
            }
        )
        return pa.concat_tables([t1, t2])

    out = (
        ds.map_batches(_explode, batch_format="pyarrow")
        .groupby(["user_id", "win_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )

    def _round(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.column_names.index("sum_value"), "sum_value", stable_round(t.column("sum_value"), 4)
        )

    return out.map_batches(_round, batch_format="pyarrow")


SQL_SLIDING_WINDOW = """
WITH h AS (
  SELECT user_id, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour, value FROM events
), x AS (
  SELECT user_id, hour AS win_start, value FROM h
  UNION ALL
  SELECT user_id, hour - 3600 AS win_start, value FROM h
)
SELECT user_id, win_start, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
FROM x GROUP BY 1, 2
"""


def q_holdout_split(sf_dir: str):
    """Deterministic md5-hash train/holdout assignment — the operator
    the reference's unimplemented holdout_split hook promises
    (reference run.py:273 raises NotImplementedError)."""
    from kgray.stages.split import hash_split

    return hash_split(_docs(sf_dir, ["doc_id"]), id_col="doc_id", holdout_pct=10)


SQL_HOLDOUT_SPLIT = """
SELECT doc_id,
  CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100 < 10
       THEN 'holdout' ELSE 'train' END AS split
FROM documents
"""


def q_tumbling_window(sf_dir: str):
    """Hour-bucket counts per user (epoch-second buckets, exact ints)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])

    def _bucket(t: pa.Table) -> pa.Table:
        epoch = t.column("ts").cast(pa.int64())  # µs since epoch
        hour = pc.multiply(pc.divide(epoch, 3_600_000_000), 3600)
        return pa.table(
            {"user_id": t.column("user_id"), "hour_epoch": hour, "value": t.column("value")}
        )

    out = ds.map_batches(_bucket, batch_format="pyarrow").groupby(["user_id", "hour_epoch"]).aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value"),
    )

    def _round(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.column_names.index("sum_value"), "sum_value", stable_round(t.column("sum_value"), 4)
        )

    return out.map_batches(_round, batch_format="pyarrow")


SQL_TUMBLING_WINDOW = """
SELECT user_id,
  CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
  COUNT(*) AS n_events,
  ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_asof_join(sf_dir: str):
    """As-of join (an operator Ray Data lacks natively): every click
    enriched with the latest view at-or-before it per user — composed
    as one tagged-union hash exchange on user + per-partition C-speed
    merge_asof. Oracle: DuckDB's native ASOF LEFT JOIN."""
    from kgray.stages.joins import asof_join

    ev = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    clicks = ev.filter(expr="event_type == 'click'").select_columns(
        ["user_id", "ts", "event_id"]
    )

    # Right side must be unique per (user, ts) — MAX event_id — so the
    # as-of match is deterministic on both engines. The dedup rides the
    # as-of exchange itself (per-batch combiner + right_prepare inside
    # the co-located partition) instead of costing its own exchange.
    def _vmax(df):
        return (
            df.groupby(["user_id", "ts"], sort=False)["view_id"].max().reset_index()
        )

    views = (
        ev.filter(expr="event_type == 'view'")
        .select_columns(["user_id", "ts", "event_id"])
        .map_batches(
            lambda df: df.rename(columns={"event_id": "view_id"}).pipe(_vmax),
            batch_format="pandas",
        )
    )
    return asof_join(
        clicks, views, by="user_id", on="ts", right_cols=["view_id"],
        right_prepare=_vmax,
    )


SQL_ASOF_JOIN = """
WITH clicks AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
), views AS (
  SELECT user_id, ts, MAX(event_id) AS view_id
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
)
SELECT c.user_id, c.ts, c.event_id, v.view_id
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND v.ts <= c.ts
"""


def q_range_join(sf_dir: str):
    """Range (interval-containment) join: orders priced into overlapping
    nation-derived bands — bucket co-partitioning + vectorized
    containment, no all-pairs blow-up."""
    from kgray.stages.joins import range_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def _bands(t: pa.Table) -> pa.Table:
        k = t.column("n_nationkey").cast(pa.float64())
        lo = pc.multiply(k, 10_000.0)
        return pa.table(
            {
                "band": t.column("n_nationkey").cast(pa.int64()),
                "lo": lo,
                "hi": pc.add(lo, 15_000.0),
            }
        )

    bands = ray.data.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey"]).map_batches(
        _bands, batch_format="pyarrow"
    )
    return range_join(
        orders, bands, value_col="o_totalprice", lo_col="lo", hi_col="hi",
        right_cols=["band"], bucket_width=10_000.0,
    )


SQL_RANGE_JOIN = """
SELECT o.o_orderkey, o.o_totalprice, b.lo, b.hi, b.band
FROM orders o
JOIN (
  SELECT n_nationkey AS band,
         n_nationkey * 10000.0 AS lo,
         n_nationkey * 10000.0 + 15000.0 AS hi
  FROM nation
) b ON o.o_totalprice BETWEEN b.lo AND b.hi
"""


def q_filter_prefix(sf_dir: str):
    """M4 grep-style prefix row filter (reference Makefile:16-34)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        lambda t: t.filter(pc.starts_with(t.column("text"), "key")), batch_format="pyarrow"
    )


SQL_FILTER_PREFIX = "SELECT doc_id, text FROM documents WHERE starts_with(text, 'key')"


def q_session_gap(sf_dir: str):
    """Gap-based sessionization: a >30-min silence starts a new session.
    Hash-partitioned on user; per-partition vectorized lag/cumsum."""
    import pandas as pd

    from kgray.kernels.hashagg import grouped_apply

    GAP_US = 1_800_000_000
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])

    def _sessions(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        us = part["ts"].astype("int64")
        gap = us - us.groupby(part["user_id"]).shift()
        new_sess = gap.isna() | (gap > GAP_US)
        part["session_id"] = new_sess.groupby(part["user_id"]).cumsum().astype("int64")
        return part[["event_id", "user_id", "session_id"]]

    from kgray.kernels.hashagg import auto_partitions

    return grouped_apply(
        ds, ["user_id"], _sessions,
        num_partitions=auto_partitions(files=[f"{sf_dir}/events.parquet"]),
    )


SQL_SESSION_GAP = """
SELECT event_id, user_id,
  CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM (
  SELECT event_id, user_id, ts,
    epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
"""


def q_connected_components(sf_dir: str):
    """Distributed min-label propagation over the real near-dup pair
    graph of the documents table → (node, label). The scale path of
    canonicalization (north rule), oracled by a recursive CTE."""
    from kgray.stages.canonical import connected_components_distributed
    from kgray.stages.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold=0.7)
    edges = pairs.map_batches(
        lambda t: pa.table(
            {
                "src": t.column("id_a").cast(pa.string()),
                "dst": t.column("id_b").cast(pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    # The verified pair graph is orders of magnitude smaller than the
    # corpus — size the propagation exchange down from the corpus width.
    from kgray.kernels.hashagg import auto_partitions

    labels = connected_components_distributed(
        edges, num_partitions=max(4, auto_partitions() // 8)
    )

    def _to_int(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node").cast(pa.int64()),
                "label": t.column("label").cast(pa.int64()),
            }
        )

    return labels.map_batches(_to_int, batch_format="pyarrow")


# NB: the pair graph is the same brute-force Jaccard set as
# SQL_DEDUP_MINHASH_PAIRS; min-label components via recursive CTE.
# String-typed Ray labels compare lexicographically, so the Ray side
# casts to int64 and the numeric SQL MIN matches only because doc_ids
# in a component share magnitude... to be exact the Ray side ALSO
# computes min over STRING labels. We therefore zero-pad nothing and
# instead make the oracle take MIN over the same string ordering.
SQL_CONNECTED_COMPONENTS = """
WITH RECURSIVE words AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
  FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
  WHERE len(w) >= 3
), counts AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS m
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b
  FROM inter JOIN counts ca ON ca.doc_id = id_a JOIN counts cb ON cb.doc_id = id_b
  WHERE m * 1.0 / (ca.n + cb.n - m) >= 0.7
), edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs
), nodes AS (
  SELECT DISTINCT u AS id FROM edges
), walk(u, label) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.v, w.label FROM walk w JOIN edges e ON w.u = e.u
)
SELECT CAST(u AS BIGINT) AS node,
       CAST(MIN(CAST(label AS VARCHAR)) AS BIGINT) AS label
FROM walk GROUP BY u
"""


def q_multimodal_features(sf_dir: str):
    """Multimodal plumbing over binary payloads (rows-only: the decode
    is the deterministic stub). Uses the page corpus html bytes."""
    from kgray.stages.multimodal import FeatureExtract, ImageDecode

    paths = construct_corpus_for_sf(sf_dir)
    ds = ray.data.read_parquet(paths["pages"], columns=["url", "html"])
    ds = ds.map_batches(
        ImageDecode, fn_constructor_kwargs={"payload_col": "html"},
        batch_format="pyarrow", batch_size=256, concurrency=(1, 4),
    )
    ds = ds.map_batches(
        FeatureExtract, fn_constructor_kwargs={"payload_col": "html", "dim": 16},
        batch_format="pyarrow", batch_size=256, concurrency=(1, 4),
    )
    return ds.select_columns(["url", "width", "height", "mode"])


# ---------------------------------------------------------------------------
# Flagship construction pipeline as a query (rows-only check)
# ---------------------------------------------------------------------------

def _corpus_cache_dir(sf_dir: str, n_pages: int) -> str:
    import hashlib as _h

    key = _h.md5(f"{sf_dir}:{n_pages}:v2".encode()).hexdigest()[:12]
    return f"/tmp/kgray_corpus/{key}"


def construct_corpus_for_sf(sf_dir: str, pages_per_doc: int = 4):
    """Deterministic pages corpus sized from the sf's documents table."""
    import os

    from kgray.sources.pages import write_corpus

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    n_pages = n_docs * pages_per_doc
    d = _corpus_cache_dir(sf_dir, n_pages)
    marker = os.path.join(d, "_done")
    if not os.path.exists(marker):
        paths = write_corpus(d, n_pages, seed=42, n_files=16)
        with open(marker, "w") as f:
            f.write("ok")
    return {
        "pages": f"{d}/pages",
        "aliases": f"{d}/aliases.parquet",
        "expected_text": f"{d}/expected_text.parquet",
        "expected_triples": f"{d}/expected_triples.parquet",
        "n_pages": n_pages,
    }


def q_construct_kg(sf_dir: str):
    """Flagship: full construction; returns distinct canonical triples.

    Self-checking: asserts P/R ≥ 0.95 against the generator oracle
    before returning, so even the driver's rows-only record implies the
    north-rule correctness target held."""
    import shutil

    from kgray.pipelines.construct import construct_kg, triple_prf

    paths = construct_corpus_for_sf(sf_dir)
    out = _corpus_cache_dir(sf_dir, paths["n_pages"]) + "/kg_out"
    shutil.rmtree(out, ignore_errors=True)
    construct_kg(paths["pages"], paths["aliases"], out, shard_group_size=4, actor_concurrency=(1, 4))
    prf = triple_prf(out + "/edges", paths["expected_triples"])
    if prf["precision"] < 0.95 or prf["recall"] < 0.95:
        raise AssertionError(f"triple P/R below target: {prf}")
    edges = pq.read_table(out + "/edges", columns=["subject", "predicate", "object"])
    pred = pa.array([str(p) for p in edges.column("predicate").to_pylist()], type=pa.string())
    return pa.table(
        {"subject": edges.column("subject"), "predicate": pred, "object": edges.column("object")}
    )


def q_extract_text(sf_dir: str):
    """Extraction stage alone over the synthetic corpus (rows-only).

    Self-checking: every extracted text is verified byte-identical to
    the expected_text golden per url (the input_hint per-row invariant)
    before rows are returned."""
    from kgray.stages.extract import extract_text_batch

    paths = construct_corpus_for_sf(sf_dir)
    expected = pq.read_table(paths["expected_text"])
    exp_ref = ray.put(
        dict(zip(expected.column("url").to_pylist(), expected.column("expected_text").to_pylist()))
    )

    def _check(t: pa.Table) -> pa.Table:
        exp = ray.get(exp_ref) if isinstance(exp_ref, ray.ObjectRef) else exp_ref
        for url, text in zip(t.column("url").to_pylist(), t.column("text").to_pylist()):
            if exp.get(url) != text:
                raise AssertionError(f"extracted text not byte-identical for {url}")
        return t

    ds = ray.data.read_parquet(paths["pages"])
    out = ds.map_batches(extract_text_batch, batch_format="pyarrow", batch_size=256)
    out = out.select_columns(["url", "text"]).map_batches(_check, batch_format="pyarrow")
    return out


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

def q_pii_scrub(sf_dir: str):
    """PII redaction (emails / IPv4s / SSNs / phone numbers → typed
    placeholders, plus per-kind counts). The synthetic documents are
    PII-free word salad, so the query first APPENDS a deterministic
    doc_id-derived PII suffix on BOTH the Ray and SQL sides — every row
    then exercises every pattern."""
    from kgray.stages.text import pii_scrub_batch

    def _aug(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").combine_chunks()
        s = lambda a: a.cast(pa.string())  # noqa: E731
        p4 = s(pc.add(_mod(d, 9000), pa.scalar(1000, type=pa.int64())))
        text = pc.binary_join_element_wise(
            pc.fill_null(t.column("text"), "").combine_chunks(),
            " contact user",
            s(d),
            "@mail.example.com call 555-010-",
            p4,
            " or +1555010",
            s(_mod(d, 1000)),
            " ip 10.0.",
            s(_mod(d, 200)),
            ".",
            s(_mod(d, 250)),
            " ssn 123-45-",
            p4,
            ".",
            "",
        )
        return pii_scrub_batch(t.set_column(1, "text", text)).select(
            ["doc_id", "text_clean", "n_email", "n_ip", "n_ssn", "n_phone"]
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(_aug, batch_format="pyarrow")


# Nested CTEs mirror the stage's pattern ORDER: each count sees the
# text after the previous redactions, exactly like pii_scrub_batch.
SQL_PII_SCRUB = """
WITH aug AS (
  SELECT doc_id, COALESCE(text, '')
    || ' contact user' || CAST(doc_id AS VARCHAR)
    || '@mail.example.com call 555-010-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
    || ' or +1555010' || CAST(doc_id % 1000 AS VARCHAR)
    || ' ip 10.0.' || CAST(doc_id % 200 AS VARCHAR) || '.' || CAST(doc_id % 250 AS VARCHAR)
    || ' ssn 123-45-' || CAST(1000 + doc_id % 9000 AS VARCHAR) || '.' AS t
  FROM documents
), s1 AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
    regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
  FROM aug
), s2 AS (
  SELECT doc_id, n_email,
    CAST(len(regexp_extract_all(t, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ip,
    regexp_replace(t, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') AS t
  FROM s1
), s3 AS (
  SELECT doc_id, n_email, n_ip,
    CAST(len(regexp_extract_all(t, '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS BIGINT) AS n_ssn,
    regexp_replace(t, '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g') AS t
  FROM s2
), s4 AS (
  SELECT doc_id, n_email, n_ip, n_ssn,
    CAST(len(regexp_extract_all(t, '\\+\\d{7,15}|\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b')) AS BIGINT) AS n_phone,
    regexp_replace(t, '\\+\\d{7,15}|\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g') AS t
  FROM s3
)
SELECT doc_id, t AS text_clean, n_email, n_ip, n_ssn, n_phone FROM s4
"""


def q_repetition_filter(sf_dir: str):
    """Gopher-style repetition quality metrics + keep flag per doc."""
    from kgray.stages.text import repetition_stats_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: repetition_stats_batch(t).select(
            ["doc_id", "top_word_frac", "dup_2gram_frac", "keep"]
        ),
        batch_format="pyarrow",
    )


SQL_REPETITION_FILTER = """
WITH d AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM documents),
w AS (SELECT doc_id, unnest(ws) AS w FROM d),
wc AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY doc_id, w),
tw AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS twf FROM wc GROUP BY doc_id),
g AS (
  SELECT doc_id, unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bg
  FROM d WHERE len(ws) >= 2
), gc AS (
  SELECT doc_id, 1.0 - CAST(COUNT(DISTINCT bg) AS DOUBLE) / COUNT(*) AS dgf FROM g GROUP BY doc_id
)
SELECT d.doc_id,
  ROUND(COALESCE(twf, 0), 6) AS top_word_frac,
  ROUND(COALESCE(dgf, 0), 6) AS dup_2gram_frac,
  CAST(ROUND(COALESCE(twf, 0), 6) <= 0.2 AND ROUND(COALESCE(dgf, 0), 6) <= 0.2 AS BIGINT) AS keep
FROM d LEFT JOIN tw USING (doc_id) LEFT JOIN gc USING (doc_id)
"""


def q_topk_tokens(sf_dir: str):
    """Global vocabulary heavy hitters: top-50 most frequent tokens."""
    from kgray.stages.corpus import topk_tokens

    return topk_tokens(_docs(sf_dir, ["text"]), k=50)


SQL_TOPK_TOKENS = """
WITH toks AS (SELECT unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents)
SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok ORDER BY n DESC, tok LIMIT 50
"""


def q_chunk_dedup(sf_dir: str):
    """CCNet-style segment dedup: 20-word chunks, first occurrence
    wins globally, documents reassembled from surviving chunks."""
    from kgray.stages.corpus import chunk_dedup

    return chunk_dedup(_docs(sf_dir, ["doc_id", "text"]), chunk_words=20)


SQL_CHUNK_DEDUP = """
WITH words AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
chunks AS (
  SELECT doc_id, i AS pos, array_to_string(w[(i-1)*20+1:least(i*20, len(w))], ' ') AS chunk
  FROM words, UNNEST(generate_series(1, CAST(ceil(len(w)/20.0) AS BIGINT))) t(i)
  WHERE len(w) > 0
),
ranked AS (SELECT *, row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn FROM chunks)
SELECT d.doc_id,
  COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY pos), '') AS text,
  CAST(COUNT(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
  CAST(COUNT(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_dropped
FROM documents d LEFT JOIN ranked r USING (doc_id) GROUP BY d.doc_id
"""


def q_decontaminate(sf_dir: str):
    """Training-set decontamination: flag corpus docs sharing any word
    5-gram with the 'benchmark' slice (every 50th doc id)."""
    from kgray.stages.corpus import decontaminate

    ds = _docs(sf_dir, ["doc_id", "text"])

    def _is_bench(t: pa.Table, flag: bool) -> pa.Table:
        is_b = (t.column("doc_id").to_numpy() % 50) == 0
        return t.filter(pa.array(is_b if flag else ~is_b))

    bench = ds.map_batches(lambda t: _is_bench(t, True), batch_format="pyarrow")
    corpus = ds.map_batches(lambda t: _is_bench(t, False), batch_format="pyarrow")
    return decontaminate(corpus, bench, n=5)


SQL_DECONTAMINATE = """
WITH words AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS g
  FROM words, UNNEST(generate_series(1, len(w) - 4)) t(i) WHERE len(w) >= 5
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
hits AS (
  SELECT doc_id, COUNT(*) AS cnt FROM grams JOIN bench USING (g)
  WHERE doc_id % 50 <> 0 GROUP BY doc_id
)
SELECT d.doc_id, CAST(COALESCE(cnt, 0) AS BIGINT) AS n_contaminated,
       COALESCE(cnt, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits USING (doc_id) WHERE d.doc_id % 50 <> 0
"""


def q_group_quantiles(sf_dir: str):
    """Exact per-source p50/p90/p99 of document length."""
    from kgray.stages.corpus import group_quantiles

    return group_quantiles(
        _docs(sf_dir, ["source", "n_chars"]), "source", "n_chars", qs=(0.5, 0.9, 0.99)
    )


SQL_GROUP_QUANTILES = """
WITH r AS (
  SELECT source, n_chars,
    row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
    COUNT(*) OVER (PARTITION BY source) AS cnt
  FROM documents
)
SELECT source, CAST(MAX(cnt) AS BIGINT) AS n,
  MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.50 * cnt) AS BIGINT), 1) THEN n_chars END) AS p50,
  MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.90 * cnt) AS BIGINT), 1) THEN n_chars END) AS p90,
  MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.99 * cnt) AS BIGINT), 1) THEN n_chars END) AS p99
FROM r GROUP BY source
"""


def q_stratified_sample(sf_dir: str):
    """Deterministic per-language downsampling (data mixing): keep 10%
    of 'en', 50% of de/fr/es, all of 'zh' — by id content hash."""
    from kgray.stages.split import stratified_sample

    rates = {"en": 0.1, "de": 0.5, "fr": 0.5, "es": 0.5, "zh": 1.0}
    return stratified_sample(_docs(sf_dir, ["doc_id", "lang"]), "lang", rates)


SQL_STRATIFIED_SAMPLE = """
SELECT doc_id, lang FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10000 <
  CASE lang WHEN 'en' THEN 1000 WHEN 'de' THEN 5000 WHEN 'fr' THEN 5000
            WHEN 'es' THEN 5000 WHEN 'zh' THEN 10000 ELSE 0 END
"""


def q_pack_sequences(sf_dir: str):
    """GPT-style sequence packing: global ordered token prefix sum →
    (seq_id, seq_offset) per document for a 2048-token window."""
    from kgray.stages.pack import pack_sequences

    return pack_sequences(_docs(sf_dir, ["doc_id", "text"]), window=2048)


def q_bestfit_pack(sf_dir: str):
    """Whole-doc best-fit-decreasing bin packing (histogram-packing
    formulation, Krell et al. 2021) into 256-token bins — no document
    ever splits across sequences. SELF-ASSERTS (rows-only; the packer
    is sequential-stateful, not SQL-expressible): every doc packed
    exactly once, no bin overflows, and every partition stripe is
    either within the BFD ``11/9·LB + 1`` bound against the token-sum
    lower bound OR leaves at most one bin ≤ half full (the standard
    any-fit argument — BFD's 11/9 guarantee is relative to OPT, and for
    length mixes dominated by (window/2, window] docs OPT ≈ N while the
    volume LB ≈ N/2, so the LB-relative bound alone would spuriously
    fail a perfectly valid packing)."""
    import pandas as pd

    from kgray.stages.pack import bestfit_pack

    window, stripe = 256, 1 << 33
    out = bestfit_pack(_docs(sf_dir, ["doc_id", "text"]), window=window,
                       stripe=stripe).to_pandas()
    clipped = np.minimum(out["n_tokens"].to_numpy(), window)
    fills = pd.Series(clipped).groupby(out["seq_id"].to_numpy()).sum()
    assert out["doc_id"].is_unique, "bestfit_pack: doc packed twice"
    assert int(fills.max()) <= window, "bestfit_pack: bin overflow"
    assert (out["seq_offset"].to_numpy() + clipped <= window).all(), (
        "bestfit_pack: doc overruns its bin")
    pk = out["seq_id"].to_numpy() // stripe
    for p in np.unique(pk):
        sel = pk == p
        seq_ids = out["seq_id"].to_numpy()[sel]
        n_bins = len(np.unique(seq_ids))
        lb = -(-int(clipped[sel].sum()) // window)  # ceil
        if n_bins <= (11 * lb) // 9 + 1:
            continue
        # any-fit fallback: a packing where every bin but one is more
        # than half full is within 2·LB of optimal — valid regardless
        # of the length mix (BFD never opens a bin while a half-empty
        # one could take the item).
        bin_fill = pd.Series(clipped[sel]).groupby(seq_ids).sum()
        n_light = int((bin_fill.to_numpy() * 2 <= window).sum())
        assert n_light <= 1, (
            f"bestfit_pack: stripe {p} used {n_bins} bins vs BFD bound "
            f"{(11 * lb) // 9 + 1} (LB {lb}) with {n_light} bins ≤ half full")
    return out


SQL_PACK_SEQUENCES = """
WITH t AS (
  SELECT doc_id, CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
  FROM t
)
SELECT doc_id, n_tokens, CAST(prev // 2048 AS BIGINT) AS seq_id,
       CAST(prev % 2048 AS BIGINT) AS seq_offset
FROM c
"""


def q_hash_join(sf_dir: str):
    """Generic distributed LEFT hash join: orders enriched with their
    customer (right side filtered to acctbal > 5000 so the NULL-fill
    path is exercised)."""
    from kgray.stages.relational import hash_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(lambda t: t.rename_columns(["o_orderkey", "custkey", "o_totalprice"]),
                  batch_format="pyarrow")
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_acctbal"]
    ).map_batches(
        lambda t: t.filter(pc.greater(t.column("c_acctbal"), 5000.0)).rename_columns(
            ["custkey", "c_name", "c_acctbal"]
        ),
        batch_format="pyarrow",
    )
    return hash_join(orders, cust, on="custkey", how="left")


SQL_HASH_JOIN = """
SELECT o_orderkey, o_custkey AS custkey, o_totalprice, c_name, c_acctbal
FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000)
  ON o_custkey = c_custkey
"""


def q_top_n_per_group(sf_dir: str):
    """Top-3 orders by totalprice per order priority (deterministic
    row_number semantics, ties by orderkey)."""
    from kgray.stages.relational import top_n_per_group

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderkey", "o_totalprice"],
    )
    return top_n_per_group(ds, "o_orderpriority", "o_totalprice", n=3,
                           ascending=False, tie_cols=["o_orderkey"])


SQL_TOP_N_PER_GROUP = """
SELECT o_orderpriority, o_orderkey, o_totalprice FROM orders
QUALIFY row_number() OVER (
  PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) <= 3
"""


def q_grouped_distinct_count(sf_dir: str):
    """Exact COUNT(DISTINCT custkey) per order status."""
    from kgray.stages.relational import grouped_distinct_count

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderstatus", "o_custkey"]
    )
    return grouped_distinct_count(ds, "o_orderstatus", "o_custkey",
                                  out_col="n_distinct_cust")


SQL_GROUPED_DISTINCT_COUNT = """
SELECT o_orderstatus, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct_cust
FROM orders GROUP BY o_orderstatus
"""


def q_approx_distinct(sf_dir: str):
    """SELF-ASSERTING (rows-only): HyperLogLog approximate distinct
    token count over the corpus, checked in-query against the exact
    distributed distinct count (|est − exact| / exact ≤ 5% — 3σ for
    b=12). The sketch is the 100-TB path: constant 4 KiB per map task
    instead of one exchange row per distinct value."""
    from kgray.stages.corpus import flat_words
    from kgray.stages.sketch import approx_distinct

    ds = _docs(sf_dir, ["text"])

    def _toks(t: pa.Table) -> pa.Table:
        flat, _ = flat_words(t.column("text"))
        return pa.table({"tok": flat})

    toks = ds.map_batches(_toks, batch_format="pyarrow")
    est = approx_distinct(toks, "tok", b=12)

    # Exact check rides the topk machinery's exchange (map-side dedup).
    from kgray.kernels.hashagg import auto_partitions, grouped_apply

    def _dedup(df):
        return df.drop_duplicates()

    exact = grouped_apply(
        toks, ["tok"], _dedup,
        num_partitions=auto_partitions(files=[f"{sf_dir}/documents.parquet"]),
        map_side=_dedup,
    ).count()
    assert exact > 0 and abs(est - exact) / exact <= 0.05, (est, exact)
    return pa.table({"n_distinct_est": pa.array([round(est, 2)]),
                     "n_distinct_exact": pa.array([int(exact)], pa.int64())})


def q_kmeans(sf_dir: str):
    """SELF-ASSERTING (rows-only): distributed k-means over the
    embeddings table — the SemDeDup-style clustering building block.
    Asserts (a) Lloyd's inertia is monotone (inside kmeans), and
    (b) final inertia beats the k=1 baseline (total variance) by ≥4%
    — a collapsed/degenerate clustering gains ~0%, so this catches it.
    The bar is pinned below the measured gain on the near-isotropic
    generator data (6.0–8.4% across sf0.001/sf0.01/sf0.1 at k=10; the
    embeddings are close to an isotropic Gaussian, so large gains are
    impossible by construction). The generator's `label` column is NOT
    geometrically separable — within-label spread ≈5× the centroid
    separation — so label purity is not a valid oracle here; the
    planted-cluster recovery test lives in tests/test_cluster."""
    from kgray.stages.cluster import kmeans

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    assign, _cents, hist = kmeans(ds, k=10, max_iters=15)

    # k=1 baseline: total variance = Σ‖v‖² − n·‖mean‖², one map pass.
    def _moments(t: pa.Table) -> pa.Table:
        col = t.column("embedding").combine_chunks()
        v = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(len(col), -1)
        return pa.table({
            "sumsq": pa.array([float((v * v).sum())]),
            "n": pa.array([len(v)], pa.int64()),
            "vsum": pa.array([v.sum(axis=0)]),
        })

    sumsq, n, vsum = 0.0, 0, None
    for b in ds.map_batches(_moments, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        sumsq += float(np.sum(b.column("sumsq").to_numpy()))
        n += int(np.sum(b.column("n").to_numpy()))
        vs = np.stack(b.column("vsum").to_pylist()).sum(axis=0)
        vsum = vs if vsum is None else vsum + vs
    inertia_1 = sumsq - n * float((vsum / n) @ (vsum / n))
    assert hist[-1] <= 0.96 * inertia_1, (
        f"k-means inertia {hist[-1]:.1f} did not beat the k=1 baseline "
        f"{inertia_1:.1f} by 4% — degenerate clustering")
    return assign


def q_semantic_dedup(sf_dir: str):
    """SemDeDup (cluster-then-dedup) over the embeddings corpus with
    planted exact-direction duplicates (each vector also appears x2.0
    scaled under vec_id+100000 — cosine exactly 1.0 with its source,
    same derivation as `dedup_embedding_pairs`). Exact-direction dups
    L2-normalize to identical unit vectors, so they always share a
    k-means cluster and the within-cluster pass is EXACT on this pair
    graph — which the sf fixtures' natural geometry never enters (max
    natural cosine 0.60 at every sf, measured) — so the recursive-CTE
    min-id-per-component oracle is a full value oracle, not approximate."""
    from kgray.stages.cluster import semantic_dedup

    def _dup(t: pa.Table) -> pa.Table:
        emb = t.column("embedding").combine_chunks()
        scaled = pa.ListArray.from_arrays(
            emb.offsets, pc.multiply(emb.values, pa.scalar(2.0, type=pa.float32()))
        ).cast(pa.list_(pa.float32()))
        t1 = pa.table({"vec_id": t.column("vec_id"), "embedding": emb})
        t2 = pa.table({"vec_id": pc.add(t.column("vec_id"), 100000), "embedding": scaled})
        return pa.concat_tables([t1, t2])

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(_dup, batch_format="pyarrow")
    surv = semantic_dedup(ds, k=10, threshold=0.99).materialize()
    # Self-assert (recall on the planted dups): never keep both halves
    # of a planted pair — the oracle would also catch this, but the
    # assert localizes the failure for pytest runs without DuckDB.
    ids = set()
    for b in surv.iter_batches(batch_format="pyarrow"):
        ids.update(b.column("vec_id").to_pylist())
    both = [i for i in ids if i < 100000 and i + 100000 in ids]
    assert not both, f"planted duplicates not collapsed: {both[:5]}"
    return surv


SQL_SEMANTIC_DEDUP = """
WITH RECURSIVE all_v AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, list_transform(embedding, x -> x * 2.0) AS embedding FROM embeddings
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM all_v a JOIN all_v b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.99
), edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs
), walk(u, label) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.v, w.label FROM walk w JOIN edges e ON w.u = e.u
), labels AS (
  SELECT u, MIN(label) AS label FROM walk GROUP BY u
)
SELECT vec_id FROM all_v
WHERE vec_id NOT IN (SELECT u FROM labels WHERE label < u)
"""


def q_shuffle_rank(sf_dir: str):
    """Deterministic global shuffle rank over documents: pos = rank of
    md5(doc_id) ascending — a global sort expressed as range-bucket
    histogram + offset broadcast + one exchange (no Ray sort). Exact
    ROW_NUMBER oracle."""
    from kgray.stages.split import shuffle_rank

    return shuffle_rank(_docs(sf_dir, ["doc_id"]), id_col="doc_id")


SQL_SHUFFLE_RANK = """
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR))) - 1 AS BIGINT) AS pos
FROM documents
"""


def q_gopher_filter(sf_dir: str):
    """Gopher-style rule-based quality filtering: every rule is an RE2
    regex count (pyarrow and DuckDB share RE2, so the oracle is exact,
    including the IEEE float ratio comparisons at rule boundaries)."""
    from kgray.stages.text import gopher_filter

    return gopher_filter(_docs(sf_dir, ["doc_id", "text"]))


SQL_GOPHER_FILTER = """
WITH m AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '\\S+')) AS words,
    GREATEST(len(regexp_extract_all(text, '\\S+')), 1) AS words_safe,
    len(regexp_extract_all(text, '\\S')) AS nonws,
    len(regexp_extract_all(text, '#|\\.\\.\\.')) AS symbols,
    len(regexp_extract_all(text, '\\n')) + 1 AS nlines,
    len(regexp_extract_all(text, '(?m)^\\s*[-*•]')) AS bullets,
    len(regexp_extract_all(text, '(?m)(\\.\\.\\.|…)$')) AS ellipsis,
    len(regexp_extract_all(text, '\\S*[A-Za-z]\\S*')) AS alpha_words,
    len(regexp_extract_all(text, '(?i)\\b(the|be|to|of|and|that|have|with)\\b')) AS stops
  FROM documents
), r AS (
  SELECT doc_id,
    CAST(words BETWEEN 30 AND 90 AS BIGINT) AS r_word_count,
    CAST(nonws * 1.0 / words_safe BETWEEN 3.0 AND 10.0 AS BIGINT) AS r_mean_word_len,
    CAST(symbols * 1.0 / words_safe <= 0.1 AS BIGINT) AS r_symbol_ratio,
    CAST(bullets * 1.0 / nlines <= 0.9 AS BIGINT) AS r_bullet_ratio,
    CAST(ellipsis * 1.0 / nlines <= 0.3 AS BIGINT) AS r_ellipsis_ratio,
    CAST(alpha_words * 1.0 / words_safe >= 0.8 AS BIGINT) AS r_alpha_words,
    CAST(stops >= 2 AS BIGINT) AS r_stopwords
  FROM m
)
SELECT *,
  r_word_count * r_mean_word_len * r_symbol_ratio * r_bullet_ratio
    * r_ellipsis_ratio * r_alpha_words * r_stopwords AS keep
FROM r
"""


def q_tfidf_topk(sf_dir: str):
    """Per-document top-3 TF-IDF terms (smoothed idf), ordered on the
    UNROUNDED score then rounded to 6 for the value hash — same as the
    oracle's ROW_NUMBER over the raw expression."""
    from kgray.stages.corpus import tfidf_topk

    return tfidf_topk(_docs(sf_dir, ["doc_id", "text"]), k=3)


SQL_TFIDF_TOPK = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
), dfreq AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
), n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok, tf.tf, dfreq.df,
         tf.tf * (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0) AS raw
  FROM tf JOIN dfreq USING (tok) CROSS JOIN n
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY raw DESC, tok ASC) AS rk
  FROM scored
)
SELECT doc_id, tok, tf, df, ROUND(raw, 6) AS score FROM ranked WHERE rk <= 3
"""


def q_unigram_nll(sf_dir: str):
    """CCNet-style unigram LM quality score (mean NLL per doc, top-1000
    vocab, add-1 smoothing) — corpus-statistic broadcast + map-only
    scoring; exact SQL oracle over the same pinned model."""
    from kgray.stages.corpus import unigram_nll

    return unigram_nll(_docs(sf_dir, ["doc_id", "text"]), vocab_size=1000)


SQL_UNIGRAM_NLL = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents
), cnt AS (
  SELECT tok, COUNT(*) AS c FROM toks GROUP BY 1
), v AS (
  SELECT tok, c FROM cnt ORDER BY c DESC, tok ASC LIMIT 1000
), tot AS (SELECT COUNT(*) AS n FROM toks)
SELECT t.doc_id,
       ROUND(-AVG(ln((COALESCE(v.c, 0) + 1.0) / (tot.n + 1001.0))), 6) AS nll
FROM toks t LEFT JOIN v USING (tok) CROSS JOIN tot
GROUP BY t.doc_id
"""


def q_top_orders(sf_dir: str):
    """TPC-H-Q3-shaped composition: segment semi-filter (broadcast) →
    map-side partial revenue per order → ONE orderkey exchange that
    joins order metadata and finishes the sum → per-partition exact
    top-10 (an orderkey lives in one partition) → driver merge of P·10
    candidate rows. The big table (lineitem) moves once, pre-combined."""
    import pandas as pd

    from kgray.kernels.hashagg import auto_partitions, grouped_apply

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    keys = pc.filter(
        cust.column("c_custkey"), pc.equal(cust.column("c_mktsegment"), "BUILDING")
    ).combine_chunks()
    kref = ray.put(keys)

    def _orders(t: pa.Table) -> pa.Table:
        ks = ray.get(kref) if isinstance(kref, ray.ObjectRef) else kref
        t = t.filter(pc.is_in(t.column("o_custkey"), value_set=ks))
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "o_orderdate": t.column("o_orderdate"),
            "o_orderpriority": t.column("o_orderpriority"),
            "rev": pa.nulls(len(t), pa.float64()),
        })

    def _li_partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        g = (
            pd.DataFrame({"k": t.column("l_orderkey").to_numpy(), "rev": rev.to_numpy()})
            .groupby("k", sort=False)["rev"].sum().reset_index()
        )
        return pa.table({
            "o_orderkey": pa.array(g["k"].to_numpy(), type=pa.int64()),
            "o_orderdate": pa.nulls(len(g), pa.timestamp("us")),
            "o_orderpriority": pa.nulls(len(g), pa.string()),
            "rev": pa.array(g["rev"].to_numpy(), type=pa.float64()),
        })

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(_orders, batch_format="pyarrow")
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(_li_partial, batch_format="pyarrow")
    tagged = orders.union(li)

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        meta = df[df["o_orderdate"].notna()][
            ["o_orderkey", "o_orderdate", "o_orderpriority"]]
        rev = (
            df.groupby("o_orderkey", sort=False)["rev"].sum(min_count=1)
            .dropna().rename("revenue").reset_index()
        )
        j = meta.merge(rev, on="o_orderkey")  # inner: both sides present
        j["revenue"] = j["revenue"].round(2)
        return j.sort_values(["revenue", "o_orderkey"],
                             ascending=[False, True], kind="mergesort").head(10)

    nparts = auto_partitions(files=[f"{sf_dir}/lineitem.parquet"])
    cand = grouped_apply(tagged, ["o_orderkey"], _finish,
                         num_partitions=nparts, map_format="pyarrow")
    top = (
        cand.to_pandas()
        .sort_values(["revenue", "o_orderkey"], ascending=[False, True],
                     kind="mergesort").head(10).reset_index(drop=True)
    )
    return pa.Table.from_pandas(top, preserve_index=False)


SQL_TOP_ORDERS = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q_approx_quantiles(sf_dir: str):
    """SELF-ASSERTING (rows-only): mergeable-histogram approximate
    quantiles of events.value, checked in-query against the exact
    discrete quantile (`group_quantiles` over a single group) within
    the sketch's own bin-width guarantee. The sketch is the 100-TB
    path: O(bins) per map task, zero shuffles, vs the exact operator's
    full-column exchange."""
    from kgray.stages.corpus import group_quantiles
    from kgray.stages.sketch import approx_quantiles

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    approx = approx_quantiles(ds, "value", qs=(0.5, 0.9, 0.99), bins=4096)

    one = ds.map_batches(
        lambda t: t.append_column("g", pa.array(np.zeros(len(t), np.int64))),
        batch_format="pyarrow",
    )
    exact = group_quantiles(one, "g", "value", qs=(0.5, 0.9, 0.99)).to_pandas()
    for _, row in approx.iterrows():
        ex = float(exact[f"p{int(row['q'] * 100)}"].iloc[0])
        assert abs(row["value"] - ex) <= row["max_err"] + 1e-9, (
            f"approx quantile q={row['q']}: {row['value']} vs exact {ex} "
            f"exceeds guaranteed error {row['max_err']}")
    out = approx.copy()
    out["value"] = out["value"].round(6)
    out["max_err"] = out["max_err"].round(6)
    return pa.Table.from_pandas(out, preserve_index=False)


def _urgent_orderkeys(sf_dir: str):
    """Right side for the semi/anti queries: custkeys of URGENT orders
    (filtered at the read so both match and no-match sets are
    non-trivial — the generator gives every customer SOME order)."""
    return ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).map_batches(
        lambda t: t.filter(
            pc.equal(t.column("o_orderpriority"), "1-URGENT")
        ).select(["o_custkey"]).rename_columns(["c_custkey"]),
        batch_format="pyarrow",
    )


def q_semi_join(sf_dir: str):
    """Distributed semi join (SQL EXISTS): customers with ≥1 URGENT
    order. Only the right side's DISTINCT keys ride the exchange."""
    from kgray.stages.relational import hash_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_acctbal"]
    )
    return hash_join(cust, _urgent_orderkeys(sf_dir), on="c_custkey", how="semi")


SQL_SEMI_JOIN = """
SELECT c_custkey, c_name, c_acctbal FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""


def q_anti_join(sf_dir: str):
    """Distributed anti join (SQL NOT EXISTS): customers with no
    URGENT order — the TPC-H Q22 shape."""
    from kgray.stages.relational import hash_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_acctbal"]
    )
    return hash_join(cust, _urgent_orderkeys(sf_dir), on="c_custkey", how="anti")


SQL_ANTI_JOIN = """
SELECT c_custkey, c_name, c_acctbal FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""


def q_running_total(sf_dir: str):
    """Per-user running value total ordered by (ts, event_id) — the
    cumulative member of the window family (row_number, gap, tumbling
    and sliding are registered separately). Same shape as sessionize:
    one user-keyed exchange, per-partition mergesort + C cumsum; the
    accumulation order is the sort order, so the doubles match the SQL
    running window bit-for-bit before the shared ROUND."""
    import pandas as pd

    from kgray.kernels.hashagg import auto_partitions, grouped_apply

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )

    def _cum(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        rv = part.groupby("user_id", sort=False)["value"].cumsum()
        part["running_value"] = np.round(rv.to_numpy() * 1e4) / 1e4
        return part[["event_id", "user_id", "running_value"]]

    return grouped_apply(
        ds, ["user_id"], _cum,
        num_partitions=auto_partitions(files=[f"{sf_dir}/events.parquet"]),
    )


SQL_RUNNING_TOTAL = """
SELECT event_id, user_id,
  ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
FROM events
"""


def q_normalize_text(sf_dir: str):
    """Canonical pre-dedup text normalization (lower → strip accents →
    collapse whitespace → trim): five vectorized Arrow kernels,
    map-only."""
    from kgray.stages.text import normalize_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: normalize_batch(t).drop_columns(["text"]), batch_format="pyarrow"
    )


SQL_NORMALIZE_TEXT = """
SELECT doc_id,
  trim(regexp_replace(strip_accents(lower(text)), '\\s+', ' ', 'g'), ' ') AS text_norm
FROM documents
"""


def q_decontaminate_bloom(sf_dir: str):
    """SELF-ASSERTING (rows-only): Bloom-filter decontamination — the
    constant-memory scale path (partial bitmaps merged by OR; no
    shuffle, no sorted-gram broadcast). Asserted in-query against the
    exact operator on the same benchmark split: ZERO false negatives
    (the bloom guarantee) and a false-positive doc rate within 0.1%
    (fpr=1e-6 × ~200 grams/doc leaves orders of magnitude of slack)."""
    from kgray.stages.corpus import decontaminate, decontaminate_bloom

    ds = _docs(sf_dir, ["doc_id", "text"])

    def _is_bench(t: pa.Table, flag: bool) -> pa.Table:
        is_b = (t.column("doc_id").to_numpy() % 50) == 0
        return t.filter(pa.array(is_b if flag else ~is_b))

    bench = ds.map_batches(lambda t: _is_bench(t, True), batch_format="pyarrow")
    corpus = ds.map_batches(lambda t: _is_bench(t, False), batch_format="pyarrow")

    bloom_t = pa.concat_tables(
        [b for b in decontaminate_bloom(corpus, bench, n=5, fpr=1e-6).iter_batches(
            batch_format="pyarrow")]
    )
    exact_t = pa.concat_tables(
        [b for b in decontaminate(corpus, bench, n=5).iter_batches(batch_format="pyarrow")]
    )
    bl = bloom_t.select(["doc_id", "contaminated"]).to_pandas().set_index("doc_id")
    ex = exact_t.select(["doc_id", "contaminated"]).to_pandas().set_index("doc_id")
    both = bl.join(ex, lsuffix="_bloom", rsuffix="_exact")
    fn = int((both["contaminated_exact"] & ~both["contaminated_bloom"]).sum())
    fp = int((both["contaminated_bloom"] & ~both["contaminated_exact"]).sum())
    assert fn == 0, f"bloom false negatives: {fn}"
    assert fp <= max(5, len(both) // 1000), f"bloom false positives: {fp}/{len(both)}"
    return bloom_t.sort_by("doc_id")


def q_approx_topk_freq(sf_dir: str):
    """SELF-ASSERTING (rows-only): Count-Min-sketch corpus frequencies
    for the exact top-20 tokens. The CMS guarantee is checked in-query
    against the exact counts from the topk exchange: every estimate
    ≥ exact (CMS never undercounts) and overshoot ≤ eps·N with eps=1e-4
    (N = total corpus tokens, computed exactly in the same pass as the
    probe list). The sketch is the 100-TB path for point frequencies:
    a constant d×w grid per map task merged by SUM — no per-token
    exchange at all."""
    from kgray.stages.corpus import topk_tokens
    from kgray.stages.sketch import approx_token_counts

    ds = _docs(sf_dir, ["text"])
    exact = topk_tokens(ds, k=20).to_pandas()
    eps = 1e-4
    est = approx_token_counts(ds, exact["tok"].tolist(), eps=eps, delta=1e-3)
    merged = exact.rename(columns={"tok": "token", "n": "n_exact"}).merge(
        est, on="token"
    )
    n_total = int(
        q_token_count(sf_dir).to_pandas()["n_tokens"].sum()
    )
    over = merged["n_est"] - merged["n_exact"]
    assert (over >= 0).all(), merged[over < 0]
    assert (over <= max(5, int(eps * n_total) + 1)).all(), (n_total, merged)
    merged["n_est"] = merged["n_est"].astype("int64")
    merged["n_exact"] = merged["n_exact"].astype("int64")
    return merged[["token", "n_exact", "n_est"]].sort_values("token").reset_index(drop=True)


def q_rollup(sf_dir: str):
    """GROUP BY ROLLUP (status, priority) over orders: count + sum at
    every rollup level from ONE exchange — coarser levels derived from
    the finest aggregate, not re-shuffled."""
    from kgray.kernels.hashagg import stable_round
    from kgray.stages.relational import rollup_aggregate

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )
    t = rollup_aggregate(ds, ["o_orderstatus", "o_orderpriority"], "o_totalprice")
    return t.set_column(
        t.column_names.index("sum_value"), "sum_value",
        stable_round(t.column("sum_value"), 2),
    )


SQL_ROLLUP = """
SELECT o_orderstatus, o_orderpriority,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  ROUND(SUM(o_totalprice), 2) AS sum_value
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_pagerank(sf_dir: str):
    """SELF-ASSERTING (rows-only): distributed PageRank over the
    customer→supplier graph (lineitem ⋈ orders; supplier ids offset
    into their own namespace). Per iteration nothing shuffles: ranks
    broadcast zero-copy, per-batch dense contribution partials merge by
    sum. Asserted in-query against an exact dense-numpy PageRank on the
    same edge list (identical model) to 1e-9, plus Σrank = 1."""
    from kgray.stages.graph import pagerank, pagerank_dense_reference
    from kgray.stages.relational import hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_custkey"]), batch_format="pyarrow"
    )

    def _edge(t: pa.Table) -> pa.Table:
        # customer → supplier; suppliers shifted into a disjoint id space
        return pa.table({
            "src": t.column("o_custkey"),
            "dst": pc.add(t.column("l_suppkey"), 10_000_000),
        })

    edges = hash_join(li, orders, on="l_orderkey", how="inner").map_batches(
        _edge, batch_format="pyarrow"
    )
    ranks, _iters = pagerank(edges, damping=0.85, max_iters=200, tol=1e-10)

    # Exact dense oracle over the same (small at bench scale) edge list.
    et = pa.concat_tables(
        [b for b in edges.iter_batches(batch_format="pyarrow")]
    )
    ref = pagerank_dense_reference(
        et.column("src").to_numpy(), et.column("dst").to_numpy(),
        damping=0.85, max_iters=200, tol=1e-10,
    )
    got = ranks.to_pandas().set_index("node")["rank"]
    assert abs(got.sum() - 1.0) < 1e-9, got.sum()
    assert np.abs(got - ref.reindex(got.index)).max() < 1e-9
    out = ranks.to_pandas()
    out["rank"] = np.round(out["rank"], 12)
    return out.sort_values("node").reset_index(drop=True)


def q_lead_lag(sf_dir: str):
    """Per-key LAG features — previous event's value and the gap to it
    in microseconds, per user ordered by (ts, event_id). The lookback
    member of the window family (running_total is the cumulative one):
    one user-keyed exchange, per-partition mergesort + vectorized
    ``shift`` — a user's history lives in exactly one partition, so the
    LAG is exact without any cross-partition boundary exchange."""
    import pandas as pd

    from kgray.kernels.hashagg import auto_partitions, grouped_apply

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )

    def _lag(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = part.groupby("user_id", sort=False)
        part["prev_value"] = g["value"].shift()
        gap = (part["ts"] - g["ts"].shift()).dt.total_seconds() * 1e6
        # float64 (NaN for each user's first event): a nullable-int
        # column arrives as float64 from the SQL side too, so both
        # representations agree bit-for-bit under the value hash.
        part["gap_us"] = np.round(gap)
        return part[["event_id", "user_id", "prev_value", "gap_us"]]

    return grouped_apply(
        ds, ["user_id"], _lag,
        num_partitions=auto_partitions(files=[f"{sf_dir}/events.parquet"]),
    )


SQL_LEAD_LAG = """
SELECT event_id, user_id,
  LAG(value) OVER w AS prev_value,
  date_diff('microsecond', LAG(ts) OVER w, ts) AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_pivot_status(sf_dir: str):
    """Wide (pivoted) aggregate: per order priority, one COLUMN per
    order status carrying its count and revenue. Map side combines each
    batch to ≤ |priorities|×|statuses| partial rows (a few dozen), so
    the exchange is constant-size no matter the corpus; the reduce
    pivots per-partition (a priority lives in one partition). The
    status domain is pinned up front (TPC-H's F/O/P) — at 100 TB an
    unknown-domain pivot needs a distinct-values pass first, which
    `grouped_distinct_count` provides."""
    import pandas as pd

    from kgray.kernels.hashagg import grouped_apply

    STATUSES = ["F", "O", "P"]
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["o_orderpriority", "o_orderstatus"], sort=False)
               .agg(n=("o_totalprice", "size"), price=("o_totalprice", "sum")))
        return g.reset_index()

    def _pivot(df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa_

        from kgray.kernels.hashagg import stable_round

        g = (df.groupby(["o_orderpriority", "o_orderstatus"], sort=False)
               .agg(n=("n", "sum"), price=("price", "sum")).reset_index())
        out = {"o_orderpriority": sorted(g["o_orderpriority"].unique())}
        base = pd.DataFrame(out).set_index("o_orderpriority")
        for s in STATUSES:
            sub = g[g["o_orderstatus"] == s].set_index("o_orderpriority")
            base[f"n_{s}"] = sub["n"].reindex(base.index).fillna(0).astype(np.int64)
            price = sub["price"].reindex(base.index).fillna(0.0).to_numpy(np.float64)
            base[f"price_{s}"] = stable_round(
                pa_.array(price, pa_.float64()), 2).to_numpy(zero_copy_only=False)
        return base.reset_index()

    partials = ds.map_batches(_partial, batch_format="pandas")
    return grouped_apply(partials, ["o_orderpriority"], _pivot, num_partitions=4)


SQL_PIVOT_STATUS = """
SELECT o_orderpriority,
  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_F,
  ROUND(COALESCE(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 0), 2) AS price_F,
  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_O,
  ROUND(COALESCE(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 0), 2) AS price_O,
  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_P,
  ROUND(COALESCE(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 0), 2) AS price_P
FROM orders GROUP BY o_orderpriority
"""


def q_boilerplate(sf_dir: str):
    """C4/CCNet-style boilerplate removal: drop every occurrence of any
    20-word chunk appearing in ≥3 distinct documents, reassemble."""
    from kgray.stages.corpus import boilerplate_filter

    return boilerplate_filter(_docs(sf_dir, ["doc_id", "text"]),
                              min_docs=3, chunk_words=20)


SQL_BOILERPLATE = """
WITH words AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
chunks AS (
  SELECT doc_id, i AS pos, array_to_string(w[(i-1)*20+1:least(i*20, len(w))], ' ') AS chunk
  FROM words, UNNEST(generate_series(1, CAST(ceil(len(w)/20.0) AS BIGINT))) t(i)
  WHERE len(w) > 0
),
freq AS (SELECT chunk, COUNT(DISTINCT doc_id) AS df FROM chunks GROUP BY 1),
flagged AS (SELECT c.*, f.df < 3 AS keep FROM chunks c JOIN freq f USING (chunk))
SELECT d.doc_id,
  COALESCE(string_agg(CASE WHEN keep THEN chunk END, ' ' ORDER BY pos), '') AS text,
  CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
  CAST(COUNT(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_dropped
FROM documents d LEFT JOIN flagged r USING (doc_id) GROUP BY d.doc_id
"""


def q_corpus_diff(sf_dir: str):
    """Snapshot diff between the corpus and a derived second version
    (every 10th doc removed, every 7th surviving doc upper-cased =
    changed, every 13th doc re-added under id+1,000,000): classify
    added/removed/changed by text digest — the incremental-curation
    work list. Digests-only exchange; documents never move."""
    from kgray.stages.corpus import corpus_diff

    # Materialized base: both versions derive from the same read —
    # pinning it keeps the DAG fork-free (consumption-contract rule).
    docs = _docs(sf_dir, ["doc_id", "text"]).materialize()

    def _version_b(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        keep = ids % 10 != 0
        kept = t.filter(pa.array(keep))
        kids = kept.column("doc_id").to_numpy()
        text = pc.if_else(pa.array(kids % 7 == 0),
                          pc.utf8_upper(kept.column("text")),
                          kept.column("text"))
        base = pa.table({"doc_id": kept.column("doc_id"), "text": text})
        add = t.filter(pa.array(ids % 13 == 0))
        added = pa.table({
            "doc_id": pc.add(add.column("doc_id"), pa.scalar(1_000_000)),
            "text": add.column("text"),
        })
        return pa.concat_tables([base, added.cast(base.schema)])

    ds_b = docs.map_batches(_version_b, batch_format="pyarrow")
    return corpus_diff(docs, ds_b)


SQL_CORPUS_DIFF = """
WITH a AS (SELECT doc_id, md5(coalesce(text, '')) AS h FROM documents),
b_src AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END AS text
  FROM documents WHERE doc_id % 10 <> 0
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 13 = 0
),
b AS (SELECT doc_id, md5(coalesce(text, '')) AS h FROM b_src)
SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
       CASE WHEN a.h IS NULL THEN 'added'
            WHEN b.h IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
WHERE a.h IS NULL OR b.h IS NULL OR a.h <> b.h
"""


def q_dsir(sf_dir: str):
    """DSIR-style importance weight vs the English slice as the target
    domain: mean per-token log-ratio of smoothed unigram models
    (target / raw), vocab = raw-corpus top-1000."""
    import pyarrow.compute as pc_

    from kgray.stages.corpus import dsir_score

    ds = _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        lambda t: t.append_column("is_target", pc_.equal(t.column("lang"), "en")),
        batch_format="pyarrow",
    )
    return dsir_score(ds, target_mask_col="is_target", vocab_size=1000)


SQL_DSIR = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents
), tgt AS (SELECT doc_id FROM documents WHERE lang = 'en'),
cnt AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY 1),
v AS (SELECT tok, c FROM cnt ORDER BY c DESC, tok ASC LIMIT 1000),
tc AS (SELECT tok, COUNT(*) AS ct FROM toks JOIN tgt USING (doc_id) GROUP BY 1),
nr AS (SELECT COUNT(*) AS n FROM toks),
nt AS (SELECT COUNT(*) AS n FROM toks JOIN tgt USING (doc_id))
SELECT t.doc_id,
  ROUND(AVG(
    ln((CASE WHEN v.tok IS NOT NULL THEN COALESCE(tc.ct, 0) ELSE 0 END + 1.0)
       / (nt.n + 1001.0))
    - ln((COALESCE(v.c, 0) + 1.0) / (nr.n + 1001.0))
  ), 6) AS dsir_score
FROM toks t LEFT JOIN v USING (tok) LEFT JOIN tc
  ON v.tok = tc.tok CROSS JOIN nr CROSS JOIN nt
GROUP BY t.doc_id
"""


def q_pca(sf_dir: str):
    """Distributed exact PCA of the embeddings table (top-8 components
    from O(d²) sufficient-statistic partials; map-only projection).

    Self-checking before returning rows: the projections' sample
    covariance must equal diag(top-k eigenvalues) — the defining
    invariant of a PCA basis — to 1e-6 relative, and the captured
    variance must not exceed the total."""
    from kgray.stages.decomp import pca_fit, pca_project

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    mean, comps, vals, total_var = pca_fit(ds, k=8)
    if not 0.0 < vals.sum() <= total_var * (1 + 1e-9):
        raise AssertionError(f"PCA variance accounting broken: {vals.sum()} vs {total_var}")
    out = pca_project(ds, k=8, round_digits=6)
    # Verify the PCA invariant distributively: the projections' sample
    # covariance (same O(d²) sufficient-statistic partials — nothing
    # materializes on the driver) must equal diag(eigvals).
    def _as_vec(t):
        import pyarrow as pa_
        cols = [t.column(f"pc{j}") for j in range(8)]
        n = len(t)
        flat = np.empty(n * 8, np.float32)
        for j, c in enumerate(cols):
            flat[j::8] = c.to_numpy(zero_copy_only=False)
        return pa_.table({
            "vec_id": t.column("vec_id"),
            "embedding": pa_.FixedSizeListArray.from_arrays(pa_.array(flat), 8).cast(
                pa_.list_(pa_.float32())),
        })

    _, _, pvals, ptotal = pca_fit(out.map_batches(_as_vec, batch_format="pyarrow"), k=8)
    err = np.abs(np.sort(pvals)[::-1] - np.sort(vals)[::-1]).max() / max(vals.max(), 1e-12)
    if err > 1e-4:
        raise AssertionError(f"projection covariance deviates from eigvals: {err}")
    return out


def q_outlier_filter(sf_dir: str):
    """Per-language p99 length-outlier flag: exact grouped discrete
    quantile (one (group,value)-pair exchange) broadcast as a threshold
    map; the corpus itself is flagged map-only."""
    from kgray.stages.corpus import quantile_outlier_flag

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    return quantile_outlier_flag(ds, "lang", "n_chars", q=0.99)


SQL_OUTLIER_FILTER = """
WITH ranked AS (
  SELECT lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents
),
thr AS (
  SELECT lang, n_chars AS p99 FROM ranked
  WHERE rn = GREATEST(CAST(ceil(0.99 * n) AS BIGINT), 1)
)
SELECT d.doc_id, d.lang, d.n_chars, d.n_chars > t.p99 AS is_outlier
FROM documents d JOIN thr t USING (lang)
"""


def q_value_rank(sf_dir: str):
    """Exact global rank + NTILE(10) by (n_chars, doc_id) — a global
    sort without a sort: value-histogram fold (O(distinct), no shuffle)
    → broadcast offsets → one value-keyed exchange with local id-sort."""
    from kgray.stages.split import value_rank

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    return value_rank(ds, "n_chars", "doc_id", ntiles=10)


SQL_VALUE_RANK = """
SELECT doc_id, n_chars,
  CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1 AS BIGINT) AS rnk,
  CAST(NTILE(10) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS tile
FROM documents
"""


def q_group_sample(sf_dir: str):
    """Deterministic k-per-group sample: order within each group by a
    content hash of the id (epoch-stable, cluster-size-independent —
    the same md5 convention as holdout_split/shuffle_rank) and keep the
    first 5. Rides top_n_per_group's candidate-pruning exchange: each
    batch pre-truncates to its own per-group top-5 before the shuffle."""
    import hashlib

    from kgray.stages.relational import top_n_per_group

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def _hash(t):
        import pyarrow as pa_
        # doc ids are unique (the table key): one md5 per distinct id —
        # the documented md5-for-oracle-parity convention.
        h = [hashlib.md5(str(i).encode()).hexdigest()
             for i in t.column("doc_id").to_pylist()]
        return t.append_column("__h", pa_.array(h, pa_.string()))

    out = top_n_per_group(
        ds.map_batches(_hash, batch_format="pyarrow"),
        "lang", "__h", n=5, ascending=True, tie_cols=["doc_id"],
    )
    return out.select_columns(["doc_id", "lang"])


SQL_GROUP_SAMPLE = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents) WHERE rn <= 5
"""


def q_zscore(sf_dir: str):
    """Per-language length standardization: O(groups) moment partials
    fold on the driver, broadcast, map-only scoring (integer input →
    float64 moments are exact, matching the SQL window form)."""
    from kgray.stages.relational import grouped_zscore

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    return grouped_zscore(ds, "lang", "n_chars", id_cols="doc_id")


SQL_ZSCORE = """
SELECT doc_id, lang, n_chars,
  ROUND((n_chars - AVG(n_chars) OVER (PARTITION BY lang))
        / STDDEV_SAMP(n_chars) OVER (PARTITION BY lang), 6) AS z
FROM documents
"""


def q_funnel(sf_dir: str):
    """Sequential funnel per user (view → click → purchase, each stage
    strictly after the previous one's earliest completion): one
    user-keyed exchange; per-partition vectorized stage-min joins (a
    user's history is co-resident, so the funnel is exact)."""
    import pandas as pd

    from kgray.kernels.hashagg import auto_partitions, grouped_apply

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )

    def _funnel(part: pd.DataFrame) -> pd.DataFrame:
        v = (part[part["event_type"] == "view"]
             .groupby("user_id")["ts"].min().rename("t1").reset_index())
        d = part.merge(v, on="user_id")
        c = (d[(d["event_type"] == "click") & (d["ts"] > d["t1"])]
             .groupby("user_id")["ts"].min().rename("t2").reset_index())
        d2 = d.merge(c, on="user_id", how="left")
        p = (d2[(d2["event_type"] == "purchase") & (d2["ts"] > d2["t2"])]
             .groupby("user_id")["ts"].min().rename("t3").reset_index())
        return (v.merge(c, on="user_id", how="left")
                 .merge(p, on="user_id", how="left"))

    return grouped_apply(
        ds, ["user_id"], _funnel,
        num_partitions=auto_partitions(files=[f"{sf_dir}/events.parquet"]),
    )


SQL_FUNNEL = """
WITH a AS (SELECT user_id, MIN(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY 1),
b AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN a USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > a.t1 GROUP BY 1),
c AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN b USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > b.t2 GROUP BY 1)
SELECT a.user_id, t1, t2, t3
FROM a LEFT JOIN b USING (user_id) LEFT JOIN c USING (user_id)
"""


def q_curate_corpus(sf_dir: str):
    """Composed flagship: the full web-curation chain (langid → Gopher
    rules → boilerplate removal → exact dedup → MinHash near-dedup →
    token count) as one lazy Dataset.

    Self-checking before returning rows: stage survivor counts must be
    monotone non-increasing, the output must contain no exact-duplicate
    texts, and every output doc must have tokens."""
    import hashlib

    from kgray.pipelines.curate import curate_corpus

    ds = _docs(sf_dir, ["doc_id", "text"])
    # Exact counters via materialize-at-boundary: counts are metadata,
    # and pinning each stage stops the multi-consumer stages (minhash
    # band+verify, boilerplate's two exchanges) from silently
    # re-executing the whole upstream prefix (lazy recount was
    # O(stages²): 60 s vs ~14 s at sf0.1).
    out, counters = curate_corpus(ds, lang="en", count_stages=True)
    t = out.to_pandas()

    order = ["input", "after_langid", "after_quality", "after_boilerplate",
             "after_exact_dedup", "after_near_dedup", "output"]
    seq = [counters[k] for k in order if k in counters]
    if len(seq) < 7:
        raise AssertionError(f"missing stage counters: {counters}")
    if any(b > a for a, b in zip(seq, seq[1:])):
        raise AssertionError(f"curation counters not monotone: {counters}")

    digests = {hashlib.md5(x.encode()).hexdigest() for x in t["text"]}
    if len(digests) != len(t):
        raise AssertionError("exact duplicates survived curation")
    if (t["n_tokens"] <= 0).any():
        raise AssertionError("token-less document survived curation")
    return t.sort_values("doc_id").reset_index(drop=True)


def q_cross_dedup(sf_dir: str):
    """Cross-corpus near-dedup: flag corpus docs (doc_id % 10 != 0)
    whose true 3-gram Jaccard vs ANY reference doc (the % 10 == 0
    slice) reaches 0.7 — dedup-a-new-crawl-against-the-training-set."""
    from kgray.stages.dedup import cross_minhash_flag

    def _slice(want_ref: bool):
        def _f(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            is_ref = pa.array(ids % 10 == 0)
            return t.filter(is_ref if want_ref else pc.invert(is_ref))
        return _f

    docs = _docs(sf_dir, ["doc_id", "text"])
    corpus = docs.map_batches(_slice(False), batch_format="pyarrow")
    reference = docs.map_batches(_slice(True), batch_format="pyarrow")
    return cross_minhash_flag(corpus, reference, threshold=0.7)


SQL_CROSS_DEDUP = """
WITH words AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
  FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
  WHERE len(w) >= 3
), counts AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS m
  FROM sh a JOIN sh b ON a.s = b.s
  WHERE a.doc_id % 10 != 0 AND b.doc_id % 10 = 0
  GROUP BY 1, 2
), hits AS (
  SELECT DISTINCT id_a AS doc_id
  FROM inter JOIN counts ca ON ca.doc_id = id_a JOIN counts cb ON cb.doc_id = id_b
  WHERE m * 1.0 / (ca.n + cb.n - m) >= 0.7
)
SELECT d.doc_id, (h.doc_id IS NOT NULL) AS is_dup
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 10 != 0
"""


def q_moving_average(sf_dir: str):
    """ROWS-frame moving average (window 3) of event value per user,
    ordered by (ts, event_id): one auto-sized hash exchange on user,
    per-partition shift-and-add frame sums — no pandas rolling-update
    drift, no row loops."""
    from kgray.stages.analytics import grouped_moving_avg

    ds = _events(sf_dir, ["user_id", "ts", "event_id", "value"])
    return grouped_moving_avg(
        ds, key="user_id", order_cols=["ts", "event_id"], value_col="value",
        window=3, out_col="mavg", round_digits=4,
    )


SQL_MOVING_AVERAGE = """
SELECT user_id, ts, event_id, value,
  ROUND(AVG(value) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mavg
FROM events
"""


def q_daily_active(sf_dir: str):
    """Daily active users + event volume: map-side (day, user) combine
    shrinks the exchange to O(days x users) rows before the per-day
    exact distinct count."""
    from kgray.stages.analytics import daily_active_users

    return daily_active_users(_events(sf_dir, ["ts", "user_id"]))


SQL_DAILY_ACTIVE = """
SELECT CAST(epoch(date_trunc('day', ts)) / 86400 AS BIGINT) AS day,
  COUNT(DISTINCT user_id) AS n_users,
  COUNT(*) AS n_events
FROM events GROUP BY 1
"""


def q_retention_cohorts(sf_dir: str):
    """Cohort retention triangle: first-active-day cohort x age distinct
    user counts — two combiner-fronted exchanges, distinct applied at
    (user, day) granularity before anything moves."""
    from kgray.stages.analytics import retention_cohorts

    return retention_cohorts(_events(sf_dir, ["ts", "user_id"]))


SQL_RETENTION_COHORTS = """
WITH e AS (
  SELECT DISTINCT user_id,
    CAST(epoch(date_trunc('day', ts)) / 86400 AS BIGINT) AS day
  FROM events
), f AS (
  SELECT user_id, MIN(day) AS cohort FROM e GROUP BY 1
)
SELECT cohort, day - cohort AS age, COUNT(*) AS n_users
FROM e JOIN f USING (user_id) GROUP BY 1, 2
"""


def q_mode_per_group(sf_dir: str):
    """Most frequent event_type per user (ties -> lexicographically
    smallest), counts combined map-side so the exchange moves distinct
    (user, type) pairs only."""
    from kgray.stages.analytics import mode_per_group

    return mode_per_group(_events(sf_dir, ["user_id", "event_type"]),
                          key="user_id", value_col="event_type")


SQL_MODE_PER_GROUP = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
), r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
  FROM c
)
SELECT user_id, event_type AS mode_value, CAST(n AS BIGINT) AS n_rows
FROM r WHERE rn = 1
"""


def q_cube_agg(sf_dir: str):
    """GROUP BY CUBE (returnflag, linestatus) over lineitem: all four
    grouping subsets from ONE exchange — coarser subsets derived from
    the finest aggregate like ROLLUP, never re-shuffled."""
    from kgray.stages.relational import cube_aggregate

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )
    t = cube_aggregate(ds, ["l_returnflag", "l_linestatus"], "l_quantity")
    return t.set_column(
        t.column_names.index("sum_value"), "sum_value",
        stable_round(t.column("sum_value"), 2),
    )


SQL_CUBE_AGG = """
SELECT l_returnflag, l_linestatus,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  ROUND(SUM(l_quantity), 2) AS sum_value
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_grouped_corr(sf_dir: str):
    """Pearson corr(quantity, extendedprice) per returnflag from
    algebraic partials — O(groups) driver fold, zero shuffles; agrees
    with DuckDB's streaming corr() to ~1e-16 (shared ROUND 6)."""
    from kgray.stages.relational import grouped_corr

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    return grouped_corr(ds, "l_returnflag", "l_quantity", "l_extendedprice")


SQL_GROUPED_CORR = """
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
  ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_xy
FROM lineitem GROUP BY 1
"""


def q_topk_bigrams(sf_dir: str):
    """Corpus top-20 word bigrams: grams built from offset-shifted views
    of the flat word array (no per-row Python), combined map-side,
    exact per-partition top-k."""
    from kgray.stages.corpus import topk_ngrams

    return topk_ngrams(_docs(sf_dir, ["text"]), n=2, k=20)


SQL_TOPK_BIGRAMS = """
WITH words AS (SELECT regexp_extract_all(text, '\\S+') AS w FROM documents),
grams AS (
  SELECT w[i] || ' ' || w[i+1] AS gram
  FROM words, UNNEST(generate_series(1, len(w) - 1)) t(i)
  WHERE len(w) >= 2
)
SELECT gram, COUNT(*) AS n FROM grams GROUP BY 1 ORDER BY n DESC, gram LIMIT 20
"""


def q_keyword_search(sf_dir: str):
    """Conjunctive token search (docs containing ALL of three terms):
    pure map-side scan, one match_substring kernel per term per batch,
    nothing shuffles."""
    from kgray.stages.corpus import keyword_search

    return keyword_search(_docs(sf_dir, ["doc_id", "text"]),
                          terms=["hash", "merge", "window"])


SQL_KEYWORD_SEARCH = """
SELECT doc_id, text FROM documents
WHERE ' ' || text || ' ' LIKE '% hash %'
  AND ' ' || text || ' ' LIKE '% merge %'
  AND ' ' || text || ' ' LIKE '% window %'
"""


def q_length_histogram(sf_dir: str):
    """Document-length histogram (width-32 buckets of n_chars):
    map-side bucket value_counts, O(buckets) exchange rows per block."""
    from kgray.stages.corpus import length_histogram

    return length_histogram(_docs(sf_dir, ["n_chars"]), "n_chars", width=32)


SQL_LENGTH_HISTOGRAM = """
SELECT (n_chars // 32) * 32 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_rows
FROM documents GROUP BY 1
"""


def q_knn_graph(sf_dir: str):
    """Exact k-NN self-join over the embeddings table (top-5 cosine
    neighbors per vector, self excluded): corpus broadcast once via
    ray.put, queries stream, one matmul + one flattened lexsort per
    batch. IVF-bucketed variant is the 100-TB path."""
    from kgray.stages.similarity import knn_graph

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return knn_graph(ds, k=5)


SQL_KNN_GRAPH = """
SELECT src_id, dst_id, rank FROM (
  SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
    ROW_NUMBER() OVER (
      PARTITION BY a.vec_id
      ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id
    ) AS rank
  FROM embeddings a, embeddings b
  WHERE a.vec_id != b.vec_id
) WHERE rank <= 5
"""


def q_degree_distribution(sf_dir: str):
    """Degree distribution of the customer->supplier graph (same edge
    derivation as pagerank): distinct-neighbor degree per customer,
    node counts per degree — combiner-fronted both exchanges."""
    from kgray.stages.graph import degree_distribution
    from kgray.stages.relational import hash_join

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_suppkey"])
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"]).map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_custkey"]), batch_format="pyarrow")
    edges = hash_join(li, orders, on="l_orderkey", how="inner")
    return degree_distribution(edges, src_col="o_custkey", dst_col="l_suppkey")


SQL_DEGREE_DISTRIBUTION = """
WITH e AS (
  SELECT DISTINCT o_custkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), d AS (
  SELECT o_custkey, COUNT(*) AS degree FROM e GROUP BY 1
)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM d GROUP BY 1
"""


def q_weighted_sample(sf_dir: str):
    """Deterministic A-Res weighted sample (top-50 by u^(1/w), u from
    md5(doc_id), w = n_chars): per-batch local top-k, driver merges
    O(batches x k) candidates, nothing shuffles."""
    from kgray.stages.split import weighted_sample

    return weighted_sample(_docs(sf_dir, ["doc_id", "n_chars"]),
                           id_col="doc_id", weight_col="n_chars", k=50)


SQL_WEIGHTED_SAMPLE = """
WITH keyed AS (
  SELECT doc_id, n_chars,
    POWER(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
          / 1152921504606846976.0, 1.0 / n_chars) AS key
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, n_chars FROM keyed ORDER BY key DESC, doc_id LIMIT 50
"""


def q_bpe_train(sf_dir: str):
    """Distributed BPE tokenizer training (Sennrich et al. 2016): learn
    20 merges over the corpus word histogram. Rows-only (iterative;
    SQL cannot express the merge loop) with structural SELF-ASSERTS:
    contiguous ranks, sequential new ids, every merge operand either a
    code point or a previously created symbol, counts above the floor
    and bounded by the corpus pair budget. Merge-for-merge equality
    with a pure-Python reference trainer is pinned in tests/test_bpe.py."""
    from kgray.stages.bpe import _MERGED_BASE, bpe_train

    out = bpe_train(_docs(sf_dir, ["doc_id", "text"]), num_merges=20).to_pandas()
    n = len(out)
    assert list(out["rank"]) == list(range(n)), "bpe_train: ranks not contiguous"
    assert list(out["new_id"]) == [_MERGED_BASE + i for i in range(n)], (
        "bpe_train: new ids not sequential")
    known = set()
    for _, row in out.iterrows():
        for s in (int(row["left"]), int(row["right"])):
            assert s < _MERGED_BASE or s in known, (
                f"bpe_train: merge references unknown symbol {s}")
        known.add(int(row["new_id"]))
        assert int(row["count"]) >= 2, "bpe_train: merge below min_pair_count"
    return out


def q_bpe_encode(sf_dir: str):
    """Train 10 BPE merges, then tokenize the corpus under them —
    per-doc token counts (rows-only; iterative). SELF-ASSERTS the
    count sandwich every valid BPE encoding satisfies: word count ≤
    n_tokens ≤ total word characters, with equality-at-the-top for
    docs the merges never touch; exact per-word parity vs the
    pure-Python encoder is pinned in tests/test_bpe.py."""
    import pyarrow.compute as pc_

    from kgray.stages.bpe import bpe_encode_count, bpe_train

    docs = _docs(sf_dir, ["doc_id", "text"])
    merges = bpe_train(docs, num_merges=10)
    assert len(merges) > 0, "bpe_encode: training produced no merges"
    out = bpe_encode_count(docs, merges).to_pandas()

    def _bounds(t):
        words = pc_.count_substring_regex(
            pc_.coalesce(t.column("text"), pa.scalar("")), r"\S+")
        chars = pc_.subtract(
            pc_.utf8_length(pc_.coalesce(t.column("text"), pa.scalar(""))),
            pc_.count_substring_regex(
                pc_.coalesce(t.column("text"), pa.scalar("")), r"\s"))
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_words": words.cast(pa.int64()),
                         "n_chars": chars.cast(pa.int64())})

    b = docs.map_batches(_bounds, batch_format="pyarrow").to_pandas()
    m = out.merge(b, on="doc_id")
    assert (m["n_tokens"] >= m["n_words"]).all(), "bpe_encode: below word count"
    assert (m["n_tokens"] <= m["n_chars"]).all(), "bpe_encode: above char count"
    return out


def q_bpe_tokenize(sf_dir: str):
    """Train 10 merges, then emit ACTUAL token-id sequences per doc
    (the training artifact). Rows-only; SELF-ASSERTS internal
    consistency: each list's length equals its n_tokens column AND the
    independent bpe_encode_count pass, and every id is a code point or
    a learned merge id; exact sequence parity vs the pure-Python
    encoder is pinned in tests/test_bpe.py."""
    from kgray.stages.bpe import _MERGED_BASE, bpe_encode_count, bpe_encode_ids, bpe_train

    docs = _docs(sf_dir, ["doc_id", "text"])
    merges = bpe_train(docs, num_merges=10)
    out = bpe_encode_ids(docs, merges).to_pandas()
    lens = out["token_ids"].map(len)
    assert (lens == out["n_tokens"]).all(), "bpe_tokenize: length/count mismatch"
    counts = bpe_encode_count(docs, merges).to_pandas()
    m = out.merge(counts, on="doc_id", suffixes=("", "_c"))
    assert (m["n_tokens"] == m["n_tokens_c"]).all(), (
        "bpe_tokenize: disagrees with bpe_encode_count")
    valid_hi = _MERGED_BASE + len(merges)
    for ids in out["token_ids"].head(50):
        for s in ids:
            assert s < 0x110000 or (_MERGED_BASE <= s < valid_hi), (
                f"bpe_tokenize: invalid id {s}")
    return out[["doc_id", "n_tokens"]].assign(
        first_id=out["token_ids"].map(lambda x: int(x[0]) if len(x) else -1))


def q_vocab_build(sf_dir: str):
    """Tokenizer vocabulary: distinct tokens -> (count, contiguous
    frequency-ranked token_id) via the combiner token exchange + the
    negated-count histogram rank (no global sort)."""
    from kgray.stages.corpus import vocab_build

    out = vocab_build(_docs(sf_dir, ["text"]))
    return out.select_columns(["tok", "n", "token_id"])


SQL_VOCAB_BUILD = """
WITH toks AS (SELECT unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents),
c AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY 1)
SELECT tok, CAST(n AS BIGINT) AS n,
  CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok) - 1 AS BIGINT) AS token_id
FROM c
"""


def q_linear_fit(sf_dir: str):
    """Per-returnflag least-squares fit of extendedprice on quantity:
    regr_slope/regr_intercept from algebraic partials, O(groups) driver
    fold, zero shuffles."""
    from kgray.stages.relational import grouped_linear_fit

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    return grouped_linear_fit(ds, "l_returnflag", "l_quantity", "l_extendedprice")


SQL_LINEAR_FIT = """
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
  ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
  ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept
FROM lineitem GROUP BY 1
"""


def q_triangle_count(sf_dir: str):
    """Exact triangle count of the user co-occurrence graph (users
    sharing an (event_type, hour) bucket): pair generation and the
    wedge-join each ride one combiner-fronted exchange."""
    import pandas as pd

    from kgray.kernels.hashagg import grouped_apply
    from kgray.stages.graph import triangle_count

    ds = _events(sf_dir, ["user_id", "event_type", "ts"])

    def _bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        hr = df["ts"].to_numpy().astype("datetime64[us]").view("int64") // 3_600_000_000
        out = pd.DataFrame(
            {"user_id": df["user_id"], "event_type": df["event_type"], "hr": hr}
        )
        return out.drop_duplicates()

    def _pairs(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.drop_duplicates()
        m = df.merge(df, on=["event_type", "hr"])
        m = m[m["user_id_x"] < m["user_id_y"]]
        return pd.DataFrame(
            {"src": m["user_id_x"].to_numpy(), "dst": m["user_id_y"].to_numpy()}
        ).drop_duplicates()

    edges = grouped_apply(ds, ["event_type", "hr"], _pairs, map_side=_bucket)
    return triangle_count(edges, "src", "dst")


SQL_TRIANGLE_COUNT = """
WITH b AS (
  SELECT DISTINCT user_id, event_type,
    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hr
  FROM events
), e AS (
  SELECT DISTINCT x.user_id AS a, y.user_id AS b2
  FROM b x JOIN b y ON x.event_type = y.event_type AND x.hr = y.hr
  WHERE x.user_id < y.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e2.a = e1.a AND e2.b2 > e1.b2
JOIN e e3 ON e3.a = e1.b2 AND e3.b2 = e2.b2
"""


def q_revenue_by_nation(sf_dir: str):
    """TPC-H Q5-shaped star join: revenue per ASIA nation for 1996
    orders where the supplier sits in the customer's nation. Join
    strategy mixes the two scale tools deliberately: region+nation and
    supplier broadcast (small dims, ray.put once, probed zero-copy);
    orders⋈customer and lineitem⋈orders ride key exchanges; the date
    filter prunes orders BEFORE its exchange; the final aggregate is a
    map-side partial + tiny groupby."""
    from datetime import datetime

    from kgray.stages.relational import broadcast_join, hash_join, project

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    asia = nation.join(region.filter(pc.equal(region.column("r_name"), "ASIA")),
                       keys="n_regionkey", right_keys="r_regionkey",
                       join_type="inner").select(["n_nationkey", "n_name"])
    supplier = pq.read_table(f"{sf_dir}/supplier.parquet",
                             columns=["s_suppkey", "s_nationkey"])

    lo, hi = datetime(1996, 1, 1), datetime(1997, 1, 1)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(pc.and_(pc.greater_equal(t.column("o_orderdate"), pa.scalar(lo)),
                                   pc.less(t.column("o_orderdate"), pa.scalar(hi))))
        .select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_nationkey"]), batch_format="pyarrow")
    # customers in ASIA only (pre-filter via the broadcast dim)
    cust = broadcast_join(cust, asia.rename_columns(["c_nationkey", "n_name"]),
                          on="c_nationkey", how="inner")
    ord_c = project(hash_join(orders, cust, on="o_custkey", how="inner"),
                    ["o_orderkey", "c_nationkey", "n_name"],
                    rename={"o_orderkey": "l_orderkey"})
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    joined = hash_join(li, ord_c, on="l_orderkey", how="inner")
    joined = broadcast_join(joined, supplier.rename_columns(["l_suppkey", "s_nationkey"]),
                            on="l_suppkey", how="inner")

    def _partial(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("c_nationkey"), t.column("s_nationkey"))
        t = t.filter(keep)
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        df = pd.DataFrame({"n_name": t.column("n_name").to_pandas(),
                           "rev": rev.to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(
            df.groupby("n_name", sort=False)["rev"].sum().rename("revenue").reset_index(),
            preserve_index=False)

    import pandas as pd

    # The per-batch partials leave O(batches × nations) tiny rows — a
    # driver-side fold replaces the Ray Aggregate's sort barrier (the
    # third all-to-all in this plan; the two join exchanges are the
    # semantic floor).
    acc: dict = {}
    for b in (joined.map_batches(_partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        for k, v in zip(b.column("n_name").to_pylist(),
                        b.column("revenue").to_pylist()):
            acc[k] = acc.get(k, 0.0) + v
    out = pa.table({
        "n_name": pa.array(sorted(acc), pa.string()),
        "revenue": pa.array([acc[k] for k in sorted(acc)], pa.float64()),
    })
    return out.set_column(1, "revenue", stable_round(out.column("revenue"), 2))


SQL_REVENUE_BY_NATION = """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q_embedding_centroids(sf_dir: str):
    """Per-label mean embedding (class centroids), flattened to (label,
    dim, mean_val): O(labels x d) partial sums fold to the driver, no
    shuffle, one division at the end."""
    from kgray.stages.cluster import label_centroids

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["label", "embedding"])
    return label_centroids(ds)


SQL_EMBEDDING_CENTROIDS = """
SELECT label, i AS dim, ROUND(AVG(embedding[i]), 6) AS mean_val
FROM embeddings, UNNEST(generate_series(1, 64)) t(i)
GROUP BY 1, 2
"""


def q_event_trigrams(sf_dir: str):
    """Top-10 per-user event-type trigrams (time-ordered behavioral
    n-grams): one user exchange + shifted-view gram build, counts ride
    the combiner exchange with exact per-partition top-k."""
    from kgray.stages.analytics import event_ngrams

    return event_ngrams(_events(sf_dir, ["user_id", "ts", "event_id", "event_type"]),
                        key="user_id", order_cols=["ts", "event_id"],
                        value_col="event_type", n=3, k=10)


SQL_EVENT_TRIGRAMS = """
WITH s AS (
  SELECT user_id, event_type,
    LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
    LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
  FROM events
)
SELECT event_type || '>' || e2 || '>' || e3 AS gram, COUNT(*) AS n
FROM s WHERE e3 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, gram LIMIT 10
"""


def q_edit_distance_pairs(sf_dir: str):
    """Fuzzy short-string self-join: pairs of 12-char document key
    prefixes within Levenshtein distance 1, over the corpus keys plus
    a deterministically mutated copy (char 6 substituted, ids +100000)
    so true near-matches exist at every scale. Oracled by DuckDB's
    exact ``levenshtein`` cross join."""
    from kgray.stages.joins import edit_distance_pairs

    def _keys(t: pa.Table) -> pa.Table:
        long_enough = pc.greater_equal(pc.utf8_length(t.column("text")), 12)
        t = t.filter(long_enough)
        k = pc.utf8_lower(pc.utf8_slice_codeunits(t.column("text"), 0, 12))
        mut = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(k, 0, 5), "x", pc.utf8_slice_codeunits(k, 6, 12), ""
        )
        ids = t.column("doc_id")
        return pa.concat_tables([
            pa.table({"doc_id": ids, "k": k}),
            pa.table({"doc_id": pc.add(ids, 100000), "k": mut}),
        ])

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(_keys, batch_format="pyarrow")
    return edit_distance_pairs(ds, text_col="k", id_col="doc_id")


SQL_EDIT_DISTANCE_PAIRS = """
WITH base AS (
  SELECT doc_id, lower(substr(text, 1, 12)) AS k
  FROM documents WHERE length(text) >= 12
), allk AS (
  SELECT doc_id, k FROM base
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, substr(k, 1, 5) || 'x' || substr(k, 7) AS k FROM base
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM allk a JOIN allk b ON a.doc_id < b.doc_id AND levenshtein(a.k, b.k) <= 1
"""


def _orders_custkeys(sf_dir: str, status: str) -> Dataset:
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderstatus"]
    )
    return ds.filter(expr=f"o_orderstatus == '{status}'").select_columns(["o_custkey"])


def q_set_intersect(sf_dir: str):
    """ANSI INTERSECT: customers with BOTH a finished and an open
    order — one side-tagged whole-row exchange with map-side distinct
    combiners."""
    from kgray.stages.relational import set_op

    return set_op(_orders_custkeys(sf_dir, "F"), _orders_custkeys(sf_dir, "O"), how="intersect")


SQL_SET_INTERSECT = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


def q_set_except(sf_dir: str):
    """ANSI EXCEPT: customers with a finished order and no open one."""
    from kgray.stages.relational import set_op

    return set_op(_orders_custkeys(sf_dir, "F"), _orders_custkeys(sf_dir, "O"), how="except")


SQL_SET_EXCEPT = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


def q_grouped_rank(sf_dir: str):
    """Tie-aware RANK / DENSE_RANK per order by quantity (descending):
    the window-function family member row_number shapes can't express."""
    from kgray.stages.relational import grouped_rank

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
    )
    return grouped_rank(ds, key="l_orderkey", order_col="l_quantity", ascending=False)


SQL_GROUPED_RANK = """
SELECT l_orderkey, l_linenumber, l_quantity,
  RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC) AS rnk,
  DENSE_RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC) AS dense_rnk
FROM lineitem
"""


def q_big_orders(sf_dir: str):
    """TPC-H-Q18-shaped composition (large-volume customers): map-side
    partial SUM(l_quantity) per order → one orderkey exchange finishing
    the sum → HAVING filter (sum > 200) → distributed hash join back
    to orders (survivor count scales with the data, so no broadcast).
    The big table moves once, pre-combined; the join ships only
    survivors."""
    import pandas as pd

    from kgray.kernels.hashagg import auto_partitions, grouped_apply
    from kgray.stages.relational import hash_join

    def _partial(t: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame({
                "o_orderkey": t.column("l_orderkey").to_numpy(),
                "sum_qty": t.column("l_quantity").to_numpy(),
            })
            .groupby("o_orderkey", sort=False)["sum_qty"].sum().reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    ).map_batches(_partial, batch_format="pyarrow")

    def _having(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("o_orderkey", sort=False)["sum_qty"].sum().reset_index()
        return g[g["sum_qty"] > 200.0]

    from kgray.kernels.hashagg import register_schema

    big = register_schema(
        grouped_apply(li, ["o_orderkey"], _having, num_partitions=auto_partitions()),
        pa.schema([("o_orderkey", pa.int64()), ("sum_qty", pa.float64())]),
    )  # static hint: the join's schema probe must not re-run the exchange
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    return hash_join(orders, big, on="o_orderkey", how="inner")


SQL_BIG_ORDERS = """
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice, s.sum_qty
FROM orders o
JOIN (
  SELECT l_orderkey AS o_orderkey, SUM(l_quantity) AS sum_qty
  FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 200
) s USING (o_orderkey)
"""


def q_dup_spans(sf_dir: str):
    """Span-level exact-substring duplicate flagging: every word-5-gram
    occurrence whose gram repeats anywhere in the corpus."""
    from kgray.stages.corpus import dup_spans

    return dup_spans(_docs(sf_dir, ["doc_id", "text"]), n=5)


SQL_DUP_SPANS = """
WITH words AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents
), g AS (
  SELECT doc_id, i - 1 AS pos,
    w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS gram
  FROM words, UNNEST(generate_series(1, len(w) - 4)) t(i)
)
SELECT doc_id, pos FROM g
WHERE gram IN (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) > 1)
"""


def q_pmi_bigrams(sf_dir: str):
    """Top-20 bigram collocations by PMI (support floor 5)."""
    from kgray.stages.corpus import pmi_topk

    return pmi_topk(_docs(sf_dir, ["text"]), k=20, min_count=5)


SQL_PMI_BIGRAMS = """
WITH words AS (
  SELECT regexp_extract_all(text, '\\S+') AS w FROM documents
), tok AS (
  SELECT w[i] AS word FROM words, UNNEST(generate_series(1, len(w))) t(i)
), uni AS (
  SELECT word, COUNT(*) AS c FROM tok GROUP BY 1
), big AS (
  SELECT w[i] AS w1, w[i+1] AS w2, COUNT(*) AS c
  FROM words, UNNEST(generate_series(1, len(w) - 1)) t(i) GROUP BY 1, 2
), tot AS (
  SELECT (SELECT SUM(c) FROM uni) AS n_words, (SELECT SUM(c) FROM big) AS n_bigrams
)
SELECT b.w1 || ' ' || b.w2 AS gram, b.c AS n,
  ROUND(LN((CAST(b.c AS DOUBLE) / CAST(t.n_bigrams AS DOUBLE))
           / ((CAST(a.c AS DOUBLE) / CAST(t.n_words AS DOUBLE))
              * (CAST(c2.c AS DOUBLE) / CAST(t.n_words AS DOUBLE)))), 6) AS pmi
FROM big b
CROSS JOIN tot t
JOIN uni a ON a.word = b.w1
JOIN uni c2 ON c2.word = b.w2
WHERE b.c >= 5
ORDER BY pmi DESC, gram
LIMIT 20
"""


def q_bm25_search(sf_dir: str):
    """BM25 top-10 against a fixed 3-term query."""
    from kgray.stages.corpus import bm25_topk

    return bm25_topk(_docs(sf_dir, ["doc_id", "text"]),
                     terms=["join", "hash", "customer"], k=10)


SQL_BM25_SEARCH = """
WITH words AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents
), d AS (
  SELECT doc_id, len(w) AS dl,
    len(list_filter(w, x -> x = 'join')) AS tf0,
    len(list_filter(w, x -> x = 'hash')) AS tf1,
    len(list_filter(w, x -> x = 'customer')) AS tf2
  FROM words
), s AS (
  SELECT COUNT(*) AS n,
    SUM(CAST(dl AS DOUBLE)) / COUNT(*) AS avgdl,
    SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
    SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
    SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
  FROM d
), scored AS (
  SELECT doc_id, ROUND(
      LN(1.0::DOUBLE + (s.n - s.df0 + 0.5::DOUBLE) / (s.df0 + 0.5::DOUBLE))
        * tf0 * 2.2::DOUBLE / (tf0 + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * dl / s.avgdl))
    + LN(1.0::DOUBLE + (s.n - s.df1 + 0.5::DOUBLE) / (s.df1 + 0.5::DOUBLE))
        * tf1 * 2.2::DOUBLE / (tf1 + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * dl / s.avgdl))
    + LN(1.0::DOUBLE + (s.n - s.df2 + 0.5::DOUBLE) / (s.df2 + 0.5::DOUBLE))
        * tf2 * 2.2::DOUBLE / (tf2 + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * dl / s.avgdl)),
    6) AS score
  FROM d CROSS JOIN s
)
SELECT doc_id, score FROM scored WHERE score > 0
ORDER BY score DESC, doc_id LIMIT 10
"""


def q_range_window(sf_dir: str):
    """Time-RANGE-frame window aggregate: per event, the user's event
    count and integerized value sum over the trailing hour (equal-ts
    peer rows included — the RANGE-vs-ROWS distinction). One user-keyed
    exchange; frame bounds for every row in a partition come from two
    global ``searchsorted`` calls on a group-offset-combined time axis,
    sums from one prefix-sum — no per-group Python loop."""
    from kgray.stages.analytics import range_window_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )
    out = range_window_agg(
        ds, key="user_id", ts_col="ts", window_us=3_600_000_000,
        value_col="value", value_scale=100.0, id_col="event_id",
    )
    return out.map_batches(
        lambda t: t.select(["event_id", "user_id", "n_w", "sum_w"]),
        batch_format="pyarrow",
    )


SQL_RANGE_WINDOW = """
SELECT event_id, user_id,
  CAST(COUNT(*) OVER w AS BIGINT) AS n_w,
  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER w AS BIGINT) AS sum_w
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


def q_bfs(sf_dir: str):
    """Multi-source BFS: minimum hop distance within 2 undirected hops
    of the nation-3 suppliers over the supplier–order bipartite graph
    (an edge per lineitem (orderkey, suppkey); node ids namespaced
    'o:'/'s:'). Level-synchronous frontier expansion — each round one
    frontier⋈edges semi-join exchange plus one visited anti-join."""
    from kgray.stages.graph import bfs_distances

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"])

    def _edges(t: pa.Table) -> pa.Table:
        o = pc.binary_join_element_wise(
            pa.array(["o"] * len(t), type=pa.string()),
            pc.cast(t.column("l_orderkey"), pa.string()), ":")
        s = pc.binary_join_element_wise(
            pa.array(["s"] * len(t), type=pa.string()),
            pc.cast(t.column("l_suppkey"), pa.string()), ":")
        return pa.table({"u": o, "v": s})

    edges = li.map_batches(_edges, batch_format="pyarrow")

    def _seeds(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("s_nationkey"), 3))
        return pa.table({"node": pc.binary_join_element_wise(
            pa.array(["s"] * len(t), type=pa.string()),
            pc.cast(t.column("s_suppkey"), pa.string()), ":")})

    seeds = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(_seeds, batch_format="pyarrow")
    return bfs_distances(edges, seeds, max_depth=2)


SQL_BFS_DISTANCES = """
WITH RECURSIVE und AS (
  SELECT DISTINCT 'o:' || CAST(l_orderkey AS VARCHAR) AS u,
                  's:' || CAST(l_suppkey AS VARCHAR) AS v
  FROM lineitem
  UNION
  SELECT DISTINCT 's:' || CAST(l_suppkey AS VARCHAR),
                  'o:' || CAST(l_orderkey AS VARCHAR)
  FROM lineitem
), walk AS (
  SELECT 's:' || CAST(s_suppkey AS VARCHAR) AS node, 0 AS dist
  FROM supplier WHERE s_nationkey = 3
  UNION ALL
  SELECT und.v, walk.dist + 1
  FROM walk JOIN und ON und.u = walk.node
  WHERE walk.dist < 2
)
SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM walk GROUP BY 1
"""


def q_quantiles_cont(sf_dir: str):
    """EXACT interpolated global quantiles (SQL percentile_cont) by
    distributed selection — iterative bucket refinement, one streaming
    histogram pass per round, never a global sort and never more than
    ``collect_limit`` driver rows per rank. The exact sibling of the
    one-pass `approx_quantiles` sketch."""
    from kgray.stages.sketch import exact_quantiles_cont

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    df = exact_quantiles_cont(ds, "value", qs=(0.25, 0.5, 0.9, 0.99),
                              collect_limit=4096)
    return pa.Table.from_pandas(df, preserve_index=False)


SQL_QUANTILES_CONT = """
SELECT CAST(0.25 AS DOUBLE) AS q, ROUND(quantile_cont(value, 0.25), 6) AS value FROM events
UNION ALL
SELECT CAST(0.5 AS DOUBLE), ROUND(quantile_cont(value, 0.5), 6) FROM events
UNION ALL
SELECT CAST(0.9 AS DOUBLE), ROUND(quantile_cont(value, 0.9), 6) FROM events
UNION ALL
SELECT CAST(0.99 AS DOUBLE), ROUND(quantile_cont(value, 0.99), 6) FROM events
"""


def q_merge_intervals(sf_dir: str):
    """Per-user interval coalescing (gaps-and-islands): each event
    spans [ts, ts+30min); overlapping/touching spans merge into one
    coalesced interval with its row count. One user-keyed exchange,
    C-speed grouped cummax/shift island detection — no per-group loop."""
    from kgray.stages.analytics import merge_intervals

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def _spans(t: pa.Table) -> pa.Table:
        hi = pc.add(t.column("ts"), pa.scalar(1_800_000_000, pa.duration("us")))
        return pa.table({"user_id": t.column("user_id"), "lo": t.column("ts"), "hi": hi})

    spans = ds.map_batches(_spans, batch_format="pyarrow")
    return merge_intervals(spans, key="user_id", lo_col="lo", hi_col="hi")


SQL_MERGE_INTERVALS = """
WITH iv AS (
  SELECT user_id, ts AS lo, ts + INTERVAL 30 MINUTE AS hi FROM events
), m AS (
  SELECT user_id, lo, hi,
    CASE WHEN lo > MAX(hi) OVER (PARTITION BY user_id ORDER BY lo, hi
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) THEN 1 ELSE 0 END AS ni
  FROM iv
), g AS (
  SELECT user_id, lo, hi,
    SUM(ni) OVER (PARTITION BY user_id ORDER BY lo, hi ROWS UNBOUNDED PRECEDING) AS island
  FROM m
)
SELECT user_id, MIN(lo) AS start_ts, MAX(hi) AS end_ts,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM g GROUP BY user_id, island
"""


def q_grouped_quantiles(sf_dir: str):
    """Exact per-group INTERPOLATED quantiles (grouped percentile_cont
    — the continuous sibling of the discrete corpus.group_quantiles):
    p50/p90 of order totalprice per order priority. One key exchange;
    every group's order statistics come from offset arithmetic on one
    shared sorted array (see sketch.grouped_quantiles_cont)."""
    from kgray.stages.sketch import grouped_quantiles_cont

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"])
    return grouped_quantiles_cont(
        ds, key="o_orderpriority", value_col="o_totalprice", qs=(0.5, 0.9))


SQL_GROUPED_QUANTILES = """
SELECT o_orderpriority, CAST(0.5 AS DOUBLE) AS q,
       ROUND(quantile_cont(o_totalprice, 0.5), 6) AS value
FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT o_orderpriority, CAST(0.9 AS DOUBLE),
       ROUND(quantile_cont(o_totalprice, 0.9), 6)
FROM orders GROUP BY o_orderpriority
"""


def q_percent_rank(sf_dir: str):
    """PERCENT_RANK + CUME_DIST per group (the relative window ranks,
    tie-aware): events ranked by value within their event_type. Same
    single-exchange shape as grouped_rank."""
    from kgray.stages.relational import grouped_percent_rank

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"])
    out = grouped_percent_rank(ds, key="event_type", order_col="value")
    return out.map_batches(
        lambda t: t.select(["event_id", "event_type", "pct_rank", "cume_dist"]),
        batch_format="pyarrow",
    )


SQL_PERCENT_RANK = """
SELECT event_id, event_type,
  ROUND(PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY value), 6) AS pct_rank,
  ROUND(CUME_DIST() OVER (PARTITION BY event_type ORDER BY value), 6) AS cume_dist
FROM events
"""


def q_skyline(sf_dir: str):
    """2-criteria Pareto frontier over part (cheapest-for-its-size):
    minimize retail price, maximize size. SQL expresses this as an
    O(n²) NOT-EXISTS dominance anti-join; the operator is two linear
    map passes around a tiny candidate merge (relational.skyline)."""
    from kgray.stages.relational import skyline

    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_retailprice", "p_size"])
    out = skyline(ds, x_col="p_retailprice", y_col="p_size", x_dir="min", y_dir="max")
    return out.map_batches(
        lambda t: t.select(["p_partkey", "p_retailprice", "p_size"]),
        batch_format="pyarrow",
    )


SQL_SKYLINE = """
SELECT p.p_partkey, p.p_retailprice, p.p_size FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
"""


def q_json_extract_agg(sf_dir: str):
    """Vectorized JSON field extraction + grouped aggregate: pull the
    integer ``k`` out of the events ``props`` JSON string with ONE RE2
    ``pc.extract_regex`` kernel per batch (no per-row json.loads), then
    a two-phase grouped sum/count per event_type."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"])

    def _ext(t: pa.Table) -> pa.Table:
        s = pc.extract_regex(t.column("props"), pattern=r'"k":\s*(?P<k>\d+)')
        k = pc.cast(pc.struct_field(s, "k"), pa.int64())
        return pa.table({"event_type": t.column("event_type"), "k": k})

    return (
        ds.map_batches(_ext, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("k", alias_name="sum_k"), Count(alias_name="n"))
    )


SQL_JSON_EXTRACT_AGG = r"""
SELECT event_type,
  CAST(SUM(CAST(NULLIF(regexp_extract(props, '"k":\s*(\d+)', 1), '') AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type
"""


def q_window_dedup(sf_dir: str):
    """Debounce dedup: drop an event when the same (user, event_type)
    fired within the preceding 5 minutes (LAG definition — measured to
    the previous row, order-insensitive and SQL-checkable). One keyed
    exchange + vectorized shift (analytics.window_dedup)."""
    from kgray.stages.analytics import window_dedup

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"])
    return window_dedup(ds, keys=["user_id", "event_type"], ts_col="ts",
                        window_us=300_000_000, tiebreak_col="event_id")


SQL_WINDOW_DEDUP = """
SELECT event_id, user_id, event_type, ts FROM (
  SELECT event_id, user_id, event_type, ts,
    LAG(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS pts
  FROM events) s
WHERE pts IS NULL OR date_diff('microsecond', pts, ts) > 300000000
"""


def q_doc_entropy(sf_dir: str):
    """Per-document word-distribution Shannon entropy (repetition /
    quality signal). Map-only: np.unique over a combined (row, word)
    key + one reduceat segment sum per batch (corpus.doc_entropy)."""
    from kgray.stages.corpus import doc_entropy

    return doc_entropy(_docs(sf_dir, ["doc_id", "text"]))


SQL_DOC_ENTROPY = r"""
WITH w AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS word FROM documents
), c AS (
  SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY doc_id, word
), n AS (
  SELECT doc_id, SUM(c) AS n FROM c GROUP BY doc_id
)
SELECT c.doc_id,
       ROUND(SUM(-(CAST(c.c AS DOUBLE) / CAST(n.n AS DOUBLE))
                 * LN(CAST(c.c AS DOUBLE) / CAST(n.n AS DOUBLE))), 6) AS entropy
FROM c JOIN n USING (doc_id) GROUP BY c.doc_id
"""


def q_max_by(sf_dir: str):
    """Per-user ARGMAX event (highest value, event_id tie-break): the
    O(groups)-partial monoid form — only one row per (batch, key) ever
    enters the exchange (relational.max_by)."""
    from kgray.stages.relational import max_by

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "value"])
    out = max_by(ds, key="user_id", order_cols=["value", "event_id"])
    return out.map_batches(
        lambda t: t.select(["user_id", "event_id", "value"]),
        batch_format="pyarrow")


SQL_MAX_BY = """
SELECT user_id, event_id, value FROM (
  SELECT user_id, event_id, value,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id DESC) AS rn
  FROM events) s WHERE rn = 1
"""


def q_min_by(sf_dir: str):
    """Per-user ARGMIN event (lowest value, event_id tie-break): the
    mirror of max_by — same O(groups)-partial monoid, one row per
    (batch, key) enters the exchange (relational.min_by)."""
    from kgray.stages.relational import min_by

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "value"])
    out = min_by(ds, key="user_id", order_cols=["value", "event_id"])
    return out.map_batches(
        lambda t: t.select(["user_id", "event_id", "value"]),
        batch_format="pyarrow")


SQL_MIN_BY = """
SELECT user_id, event_id, value FROM (
  SELECT user_id, event_id, value,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value ASC, event_id ASC) AS rn
  FROM events) s WHERE rn = 1
"""


def q_ntile(sf_dir: str):
    """Global NTILE(7) quantile bucketing over a continuous column
    (curriculum binning): rides range_rank's boundary-sampled rank
    exchange — never a global sort — and maps the exact global row
    number to its bucket in closed form, using the total the rank's
    count pre-pass already folded (split.ntile)."""
    from kgray.stages.split import ntile

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "value"])
    out = ntile(ds, value_col="value", id_col="event_id", n=7)
    return out.map_batches(
        lambda t: t.select(["event_id", "bucket"]), batch_format="pyarrow")


SQL_NTILE = """
SELECT event_id,
       CAST(NTILE(7) OVER (ORDER BY value, event_id) AS BIGINT) AS bucket
FROM events WHERE value IS NOT NULL
"""


def q_grouped_covar(sf_dir: str):
    """Per-flag sample/population covariance cov(l_quantity,
    l_discount): mergeable centered partials (Chan et al. pairwise
    merge — no raw-moment cancellation), O(groups) rows to the driver,
    zero shuffle (relational.grouped_covar)."""
    from kgray.stages.relational import grouped_covar

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_discount"])
    return grouped_covar(ds, "l_returnflag", "l_quantity", "l_discount")


SQL_GROUPED_COVAR = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       ROUND(COVAR_SAMP(l_quantity, l_discount), 6) AS covar_samp,
       ROUND(COVAR_POP(l_quantity, l_discount), 6) AS covar_pop
FROM lineitem GROUP BY l_returnflag
"""


def q_spearman(sf_dir: str):
    """Global Spearman rank correlation of (l_quantity,
    l_extendedprice) with SQL average-rank tie handling: size-switched
    — broadcast value→avg-rank maps from one histogram fold (zero
    shuffles) below distinct_limit; range_rank + per-value mean + id
    joins above it (distributed path pinned equal by the forced-switch
    test in tests/test_relational.py) (relational.spearman_corr)."""
    from kgray.stages.relational import spearman_corr

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice"])
    return spearman_corr(ds, "l_quantity", "l_extendedprice")


def q_grouped_ntile(sf_dir: str):
    """Per-language length quartiles (NTILE(4) within each lang by
    n_chars): one exchange on lang, vectorized closed form per
    partition — the grouped sibling of the global ntile
    (relational.grouped_ntile)."""
    from kgray.stages.relational import grouped_ntile

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "n_chars"])
    out = grouped_ntile(ds, key="lang", order_col="n_chars", n=4,
                        tie_col="doc_id")
    return out.map_batches(
        lambda t: t.select(["doc_id", "lang", "bucket"]),
        batch_format="pyarrow")


SQL_GROUPED_NTILE = """
SELECT doc_id, lang,
       CAST(NTILE(4) OVER (PARTITION BY lang
                           ORDER BY n_chars, doc_id) AS BIGINT) AS bucket
FROM documents
"""


SQL_SPEARMAN = """
SELECT COUNT(*) AS n_rows, ROUND(CORR(r_x, r_y), 6) AS spearman
FROM (
  SELECT RANK() OVER (ORDER BY l_quantity)
           + (COUNT(*) OVER (PARTITION BY l_quantity) - 1) / 2.0 AS r_x,
         RANK() OVER (ORDER BY l_extendedprice)
           + (COUNT(*) OVER (PARTITION BY l_extendedprice) - 1) / 2.0 AS r_y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL) s
"""


def q_unpivot(sf_dir: str):
    """Wide → long melt of three lineitem measures (SQL UNPIVOT as a
    UNION ALL of per-column selects) — map-only, zero shuffle."""
    from kgray.stages.relational import unpivot

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice", "l_discount"])
    return unpivot(ds, id_cols=["l_orderkey", "l_linenumber"],
                   value_cols=["l_quantity", "l_extendedprice", "l_discount"])


SQL_UNPIVOT = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
       CAST(l_quantity AS DOUBLE) AS value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice',
       CAST(l_extendedprice AS DOUBLE) FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount',
       CAST(l_discount AS DOUBLE) FROM lineitem
"""


def q_containment_pairs(sf_dir: str):
    """Exact n-gram CONTAINMENT near-dup pairs (m / min(|A|,|B|) ≥ 0.8):
    catches a short doc embedded in a long one, which the Jaccard union
    denominator structurally dilutes. Same inverted-index exchanges as
    dedup_jaccard_pairs, different keep rule."""
    from kgray.stages.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]),
                               threshold=0.8, score="containment")


SQL_CONTAINMENT_PAIRS = """
WITH words AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
  FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
  WHERE len(w) >= 3
), counts AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS m
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b
FROM inter JOIN counts ca ON ca.doc_id = id_a JOIN counts cb ON cb.doc_id = id_b
WHERE m * 1.0 / LEAST(ca.n, cb.n) >= 0.8
"""


def q_grouped_topk_tokens(sf_dir: str):
    """Grouped heavy hitters: top-3 tokens per language (count desc,
    token asc). Combined (group, token) count exchange + candidate-
    pruned per-group top-k — raw text never shuffles."""
    from kgray.stages.corpus import grouped_topk_tokens

    return grouped_topk_tokens(_docs(sf_dir, ["lang", "text"]),
                               group_col="lang", k=3)


SQL_GROUPED_TOPK_TOKENS = r"""
WITH w AS (
  SELECT lang, unnest(regexp_extract_all(text, '\S+')) AS tok FROM documents
), c AS (
  SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY lang, tok
), r AS (
  SELECT lang, tok, n,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, tok) AS rn
  FROM c
)
SELECT lang, tok, n FROM r WHERE rn <= 3
"""


def q_ewma(sf_dir: str):
    """Truncated EWMA per user (decay 0.5, last 8 rows by ts): the
    bounded-frame form that stays SQL-checkable (untruncated needs a
    recursive CTE or overflowing POWER terms). One keyed exchange +
    8 shifted weighted adds (analytics.grouped_ewma)."""
    from kgray.stages.analytics import grouped_ewma

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "value"])
    out = grouped_ewma(ds, key="user_id", ts_col="ts", value_col="value",
                       tiebreak_col="event_id", decay=0.5, window=8)
    return out.map_batches(
        lambda t: t.select(["user_id", "event_id", "ewma"]),
        batch_format="pyarrow")


SQL_EWMA = """
WITH r AS (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT a.user_id, a.event_id,
  ROUND(SUM(b.value * POWER(0.5, a.rn - b.rn)) / SUM(POWER(0.5, a.rn - b.rn)), 4) AS ewma
FROM r a JOIN r b ON b.user_id = a.user_id AND b.rn BETWEEN a.rn - 7 AND a.rn
GROUP BY a.user_id, a.event_id
"""


def q_explode_embedding(sf_dir: str):
    """UNNEST WITH ORDINALITY over the embedding list column: one row
    per (vector, dimension). Map-only zero-copy flatten — ids from one
    np.repeat, positions from one arange subtraction."""
    from kgray.stages.relational import explode_list

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = explode_list(ds, id_cols=["vec_id"], list_col="embedding")

    def _cast(t: pa.Table) -> pa.Table:
        return pa.table({
            "vec_id": t.column("vec_id"),
            "pos": t.column("pos"),
            "val": pc.cast(t.column("val"), pa.float64()),
        })

    return out.map_batches(_cast, batch_format="pyarrow")


SQL_EXPLODE_EMBEDDING = """
SELECT vec_id, CAST(i AS BIGINT) AS pos,
       CAST(list_extract(embedding, i + 1) AS DOUBLE) AS val
FROM embeddings, range(64) t(i)
WHERE i < len(embedding)
"""


def q_top_returns(sf_dir: str):
    """TPC-H Q10-shaped composed query: top-20 customers by returned-
    item revenue, in the MINIMUM two exchanges the semantics allow:
    (1) lineitem revenue partials (combined per batch) hash-join orders
    on orderkey; (2) per-batch custkey partial sums ride one keyed
    exchange whose reduce both totals the group and emits only its
    partition-local tie-aware top-20 candidates — O(partitions × 20)
    rows reach the driver for the final merge (the documented
    topk_tokens/weighted_sample small side). Customer+nation attributes
    attach at the driver to just the 20 winners. (First cut used Ray's
    native Aggregate + a third exchange for top-k: 3 all-to-all
    barriers, 17 s at sf0.1/32; this shape is the same answer with the
    barrier count at its semantic floor.)"""
    import pandas as pd

    from kgray.kernels.hashagg import grouped_apply
    from kgray.stages.relational import hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"])

    def _rev_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("l_returnflag"), "R"))
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        df = pd.DataFrame({"o_orderkey": t.column("l_orderkey").to_pandas(),
                           "rev": rev.to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(
            df.groupby("o_orderkey", sort=False)["rev"].sum().reset_index(),
            preserve_index=False)

    rev = li.map_batches(_rev_partial, batch_format="pyarrow")
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])
    joined = hash_join(rev, orders, on="o_orderkey", how="inner")

    def _cust_partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("o_custkey", sort=False)["rev"].sum()
                .rename("revenue").reset_index())

    def _total_and_prune(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("o_custkey", sort=False)["revenue"].sum()
             .reset_index())
        # Partition-local tie-aware top-20: a custkey hashes to exactly
        # one partition, so the global top-20 is within the union of
        # per-partition top-20s.
        g = g.sort_values(["revenue", "o_custkey"], ascending=[False, True],
                          kind="mergesort")
        return g.head(20)

    cand = grouped_apply(
        joined.map_batches(lambda t: t.select(["o_custkey", "rev"]),
                           batch_format="pyarrow"),
        ["o_custkey"], _total_and_prune, map_side=_cust_partial,
    ).to_pandas()
    top = (cand.sort_values(["revenue", "o_custkey"], ascending=[False, True],
                            kind="mergesort").head(20))

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    dim = cust.join(nation, keys="c_nationkey", right_keys="n_nationkey",
                    join_type="inner").select(["c_custkey", "c_name", "n_name"])
    out = pa.Table.from_pandas(
        top.rename(columns={"o_custkey": "c_custkey"}), preserve_index=False
    ).join(dim, keys="c_custkey", join_type="inner")
    return pa.table({
        "c_custkey": out.column("c_custkey"),
        "c_name": out.column("c_name"),
        "n_name": out.column("n_name"),
        "revenue": stable_round(out.column("revenue"), 2),
    })


SQL_TOP_RETURNS = """
SELECT c_custkey, c_name, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, c_custkey
LIMIT 20
"""


def q_weighted_avg(sf_dir: str):
    """Grouped weighted average (Σ w·v / Σ w per event_type, weight =
    the JSON props field k): two algebraic sums ride one tiny grouped
    aggregate — map-side numerator/denominator partials, no row
    exchange."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value", "props"])

    def _parts(t: pa.Table) -> pa.Table:
        s = pc.extract_regex(t.column("props"), pattern=r'"k":\s*(?P<k>\d+)')
        k = pc.cast(pc.cast(pc.struct_field(s, "k"), pa.int64()), pa.float64())
        wv = pc.multiply(t.column("value"), k)
        return pa.table({"event_type": t.column("event_type"), "wv": wv, "w": k})

    agg = (ds.map_batches(_parts, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("wv", alias_name="swv"), Sum("w", alias_name="sw")))

    def _div(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t.column("event_type"),
            "wavg": stable_round(pc.divide(t.column("swv"), t.column("sw")), 4),
        })

    return agg.map_batches(_div, batch_format="pyarrow")


SQL_WEIGHTED_AVG = r"""
WITH e AS (
  SELECT event_type, value,
         CAST(NULLIF(regexp_extract(props, '"k":\s*(\d+)', 1), '') AS DOUBLE) AS k
  FROM events
)
SELECT event_type, ROUND(SUM(value * k) / SUM(k), 4) AS wavg
FROM e GROUP BY event_type
"""


def q_robust_scale(sf_dir: str):
    """Robust (median/IQR) normalization of document length per
    language — the outlier-insensitive feature scaler. Composition:
    exact per-group quantiles (one exchange over (lang, n_chars) only)
    broadcast as a tiny map, then a map-only scale pass over the
    corpus. Quantiles of integer inputs are exact halves, so the
    broadcast introduces no rounding skew vs the SQL oracle."""
    from kgray.stages.sketch import grouped_quantiles_cont

    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    qt = grouped_quantiles_cont(ds, key="lang", value_col="n_chars",
                                qs=(0.25, 0.5, 0.75), round_digits=9).to_pandas()
    med = {r["lang"]: r["value"] for _, r in qt[qt["q"] == 0.5].iterrows()}
    iqr = {}
    q1 = {r["lang"]: r["value"] for _, r in qt[qt["q"] == 0.25].iterrows()}
    for _, r in qt[qt["q"] == 0.75].iterrows():
        iqr[r["lang"]] = r["value"] - q1[r["lang"]]
    sref = ray.put((med, iqr))

    def _scale(t: pa.Table) -> pa.Table:
        m, i = ray.get(sref) if isinstance(sref, ray.ObjectRef) else sref
        import pandas as pd
        lang = t.column("lang").to_pandas()
        x = t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.float64)
        mm = lang.map(m).to_numpy(np.float64)
        ii = lang.map(i).to_numpy(np.float64)
        z = np.where(ii == 0.0, 0.0, (x - mm) / ii)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "lang": t.column("lang"),
            "robust_z": pa.array(np.round(z, 6)),
        })

    return ds.map_batches(_scale, batch_format="pyarrow")


SQL_ROBUST_SCALE = """
WITH s AS (
  SELECT lang,
         quantile_cont(n_chars, 0.25) AS q1,
         quantile_cont(n_chars, 0.5)  AS med,
         quantile_cont(n_chars, 0.75) AS q3
  FROM documents GROUP BY lang
)
SELECT doc_id, d.lang,
  ROUND(CASE WHEN q3 - q1 = 0 THEN 0
             ELSE (n_chars - med) / (q3 - q1) END, 6) AS robust_z
FROM documents d JOIN s ON d.lang = s.lang
"""


def q_grouped_approx_quantiles(sf_dir: str):
    """SELF-ASSERTING (rows-only): mergeable per-group histogram
    quantile sketch — the giant-group path grouped_quantiles_cont
    points at. The in-query check is the sketch's distribution-free
    guarantee: the estimate's exact RANK in its group (counted by one
    extra streaming pass, only O(groups × qs) threshold counters move)
    must sit within ``bin_n + 1`` of the target rank ``(n−1)·q``."""
    from kgray.stages.sketch import grouped_approx_quantiles

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    approx = grouped_approx_quantiles(ds, key="event_type", value_col="value",
                                      qs=(0.5, 0.9), n_bins=2048)
    # Exact rank of each estimate: broadcast the O(groups × qs)
    # thresholds, fold per-batch (n_lt, n_le) partial counts.
    thr = {g: grp[["q", "value_est"]].to_numpy()
           for g, grp in approx.groupby("event_type", sort=False)}
    tref = ray.put(thr)

    def _ranks(t: pa.Table) -> pa.Table:
        th = ray.get(tref) if isinstance(tref, ray.ObjectRef) else tref
        et = t.column("event_type").to_pandas().to_numpy()
        v = t.column("value").to_numpy(zero_copy_only=False)
        gs, qs_, lt, le = [], [], [], []
        for g, pairs in th.items():  # groups × qs — a handful
            m = v[et == g]
            for q, est in pairs:
                gs.append(g); qs_.append(float(q))
                lt.append(int((m < est).sum())); le.append(int((m <= est).sum()))
        return pa.table({"event_type": pa.array(gs, pa.string()),
                         "q": pa.array(qs_, pa.float64()),
                         "n_lt": pa.array(lt, pa.int64()),
                         "n_le": pa.array(le, pa.int64())})

    ranks = (ds.map_batches(_ranks, batch_format="pyarrow").to_pandas()
             .groupby(["event_type", "q"], as_index=False)[["n_lt", "n_le"]].sum())
    rk = {(r["event_type"], r["q"]): (r["n_lt"], r["n_le"])
          for _, r in ranks.iterrows()}
    for _, r in approx.iterrows():
        g, q = r["event_type"], r["q"]
        target = (r["n"] - 1) * q
        n_lt, n_le = rk[(g, q)]
        slack = r["bin_n"] + 1
        assert n_lt - slack <= target <= n_le + slack, (
            f"grouped approx quantile ({g}, q={q}): est {r['value_est']} has "
            f"rank interval [{n_lt}, {n_le}], target {target:.1f} outside "
            f"± bin_n+1 = {slack}")
    out = approx[["event_type", "q", "value_est", "bin_n", "n"]].copy()
    out["value_est"] = out["value_est"].round(6)
    return pa.Table.from_pandas(out, preserve_index=False)


def q_grouped_approx_distinct(sf_dir: str):
    """SELF-ASSERTING (rows-only): per-group HyperLogLog distinct count
    (distinct users per event_type) — O(groups × 2^b) bytes move, never
    a row per distinct pair. Asserted in-query against the exact
    grouped_distinct_count exchange within 5% (b=12 → RSE ≈ 1.6%)."""
    from kgray.stages.relational import grouped_distinct_count
    from kgray.stages.sketch import grouped_approx_distinct

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    est = grouped_approx_distinct(ds, key="event_type", col="user_id", b=12)
    exact = grouped_distinct_count(ds, "event_type", "user_id").to_pandas()
    ex = dict(zip(exact["event_type"], exact["n_distinct"]))
    assert set(est["event_type"]) == set(ex)
    for _, r in est.iterrows():
        e = ex[r["event_type"]]
        assert e > 0 and abs(r["n_distinct_est"] - e) / e <= 0.05, (
            r["event_type"], r["n_distinct_est"], e)
    out = est.copy()
    out["n_distinct_est"] = out["n_distinct_est"].round(2)
    out["n_distinct_exact"] = out["event_type"].map(ex).astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def q_chunk_text(sf_dir: str):
    """Sliding token-window chunker (window 32, stride 16): the
    training-data preprocessing step that fans documents out into
    overlapping fixed-size chunks. Map-only — one take gather + one
    Arrow binary_join per batch, no Python string assembly."""
    from kgray.stages.corpus import chunk_text

    return chunk_text(_docs(sf_dir, ["doc_id", "text"]), window=32, stride=16)


SQL_CHUNK_TEXT = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents
)
SELECT doc_id,
       CAST((s - 1) / 16 AS BIGINT) AS chunk_idx,
       CAST(LEAST(s + 31, len(w)) - s + 1 AS BIGINT) AS n_words,
       array_to_string(list_slice(w, s, LEAST(s + 31, len(w))), ' ') AS chunk_text
FROM w, UNNEST(generate_series(1, len(w), 16)) AS t(s)
WHERE len(w) >= 1
"""


def q_first_last(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE per user over the full (ts, event_id)
    frame — the remaining standard window-function family member, as an
    O(groups)-partial monoid (≤ 2 rows per batch-key enter the
    exchange; relational.first_last_by)."""
    from kgray.stages.relational import first_last_by

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "value"])
    return first_last_by(ds, key="user_id", order_cols=["ts", "event_id"],
                         value_col="value")


SQL_FIRST_LAST = """
WITH r AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS cnt
  FROM events
)
SELECT user_id,
       MAX(CASE WHEN rn = 1 THEN value END) AS first_value,
       MAX(CASE WHEN rn = cnt THEN value END) AS last_value
FROM r GROUP BY user_id
"""


def q_dedup_within_lang(sf_dir: str):
    """Near-dup pairs scoped WITHIN language (the standard curation
    setup — cross-lang lookalikes are translations, not duplicates):
    the group value is mixed into every shingle key, so cross-group
    shingles never meet a postings list. On this corpus 3/4 of the
    unscoped pairs are cross-lang — the scoped result is materially
    different, not a re-labeling."""
    from kgray.stages.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(sf_dir, ["doc_id", "lang", "text"]),
                               threshold=0.7, group_col="lang")


SQL_DEDUP_WITHIN_LANG = """
WITH words AS (
  SELECT doc_id, lang, regexp_extract_all(text, '\\S+') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id, lang, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
  FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
  WHERE len(w) >= 3
), counts AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS m
  FROM sh a JOIN sh b ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b
FROM inter JOIN counts ca ON ca.doc_id = id_a JOIN counts cb ON cb.doc_id = id_b
WHERE m * 1.0 / (ca.n + cb.n - m) >= 0.7
"""


def q_cumulative_users(sf_dir: str):
    """Cumulative distinct users per day (growth curve) WITHOUT a
    windowed COUNT DISTINCT: first-seen-day trick — one user exchange
    for min-day, O(days) combiner rows, final cumsum on one tiny
    partition (analytics.cumulative_users)."""
    from kgray.stages.analytics import cumulative_users

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id"])
    return cumulative_users(ds)


SQL_CUMULATIVE_USERS = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(epoch(date_trunc('day', ts)) / 86400 AS BIGINT) AS day
  FROM events
), f AS (
  SELECT user_id, MIN(day) AS day FROM d GROUP BY user_id
), c AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS c FROM f GROUP BY day
)
SELECT day,
       CAST(SUM(c) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS n_users_cum
FROM c
"""


def q_grouped_mad(sf_dir: str):
    """Median absolute deviation of document length per language —
    robust spread (sketch.grouped_mad): exact per-group medians
    broadcast, deviations ride the same grouped-quantile kernel."""
    from kgray.stages.sketch import grouped_mad

    return grouped_mad(_docs(sf_dir, ["lang", "n_chars"]),
                       key="lang", value_col="n_chars")


SQL_GROUPED_MAD = """
WITH m AS (
  SELECT lang, quantile_cont(n_chars, 0.5) AS med FROM documents GROUP BY lang
)
SELECT d.lang, ROUND(quantile_cont(ABS(n_chars - med), 0.5), 6) AS mad
FROM documents d JOIN m USING (lang) GROUP BY d.lang
"""


def q_hash_features(sf_dir: str):
    """Feature hashing (hashing trick) to 256 dims: sparse long-format
    (doc, feat_idx, count) rows for hashed-ngram models. Map-only; md5
    once per unique token per batch (corpus.hash_features)."""
    from kgray.stages.corpus import hash_features

    return hash_features(_docs(sf_dir, ["doc_id", "text"]), n_features=256)


SQL_HASH_FEATURES = r"""
WITH w AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok FROM documents
)
SELECT doc_id,
       CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT % 256 AS BIGINT) AS feat_idx,
       CAST(COUNT(*) AS BIGINT) AS n
FROM w GROUP BY doc_id, feat_idx
"""


def q_k_core(sf_dir: str):
    """SELF-ASSERTING (rows-only): maximal 3-core of the supplier–order
    bipartite graph by distributed peeling (graph.k_core — size-switched
    removal broadcast, one degree exchange per round; exact equality vs
    a pure-python peeler is pinned in tests/test_graph.py). In-query
    assert: the induced min degree ≥ k — the defining k-core property."""
    from kgray.stages.graph import k_core

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"])

    def _edges(t: pa.Table) -> pa.Table:
        o = pc.binary_join_element_wise(
            pa.array(["o"] * len(t), type=pa.string()),
            pc.cast(t.column("l_orderkey"), pa.string()), ":")
        s = pc.binary_join_element_wise(
            pa.array(["s"] * len(t), type=pa.string()),
            pc.cast(t.column("l_suppkey"), pa.string()), ":")
        return pa.table({"u": o, "v": s})

    core = k_core(li.map_batches(_edges, batch_format="pyarrow"), k=3)

    def _assert_core(t: pa.Table) -> pa.Table:
        # degree >= k is ROW-local — the self-check streams; the core
        # never materializes on the driver.
        if len(t) and pc.min(t.column("degree")).as_py() < 3:
            raise AssertionError(
                f"k_core: induced min degree {pc.min(t.column('degree')).as_py()} < 3")
        return t

    return core.map_batches(_assert_core, batch_format="pyarrow")


def q_quantile_transform(sf_dir: str):
    """Quantile (rank-to-uniform) transform of document length: each
    doc's global percentile in [0, 1] — the distribution-free
    normalizer. Rides value_rank's histogram trick (exact global
    ROW_NUMBER without a sort; boundary: distinct values fit the
    driver — true for lengths/counts, not raw floats)."""
    from kgray.stages.split import value_rank

    ds = _docs(sf_dir, ["doc_id", "n_chars"])
    n = ds.count()
    ranked = value_rank(ds, value_col="n_chars", id_col="doc_id")

    def _q(t: pa.Table) -> pa.Table:
        q = pc.divide(pc.cast(t.column("rnk"), pa.float64()),
                      pa.scalar(float(n - 1)))
        return pa.table({"doc_id": t.column("doc_id"),
                         "q": stable_round(q, 6)})

    return ranked.map_batches(_q, batch_format="pyarrow")


SQL_QUANTILE_TRANSFORM = """
SELECT doc_id,
       ROUND((ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1)
             / (COUNT(*) OVER () - 1.0), 6) AS q
FROM documents
"""


def q_range_rank(sf_dir: str):
    """Exact global ROW_NUMBER over a CONTINUOUS column (events.value)
    by range-partitioned rank — sampled boundaries + count offsets +
    one exchange, never a global sort, no distinct-fit-driver boundary
    (split.range_rank — the continuous sibling of value_rank)."""
    from kgray.stages.split import range_rank

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "value"])
    out = range_rank(ds, value_col="value", id_col="event_id")
    return out.map_batches(
        lambda t: t.select(["event_id", "rnk"]), batch_format="pyarrow")


SQL_RANGE_RANK = """
SELECT event_id,
       CAST(ROW_NUMBER() OVER (ORDER BY value, event_id) - 1 AS BIGINT) AS rnk
FROM events WHERE value IS NOT NULL
"""


def q_collect_set(sf_dir: str):
    """Generic sorted-distinct collect (the reference's STRING_AGG
    DISTINCT '|' rule — duckdb_utils.py:332 — outside the KGX schema):
    each user's distinct event types, sorted and pipe-joined. Map-side
    (user, type) distinct combiner → one keyed exchange."""
    from kgray.kernels.hashagg import auto_partitions, grouped_apply

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])

    def _distinct(df):
        return df.drop_duplicates()

    def _join(df):
        df = df.drop_duplicates().sort_values(["user_id", "event_type"],
                                              kind="mergesort")
        g = df.groupby("user_id", sort=False)["event_type"].agg("|".join)
        return g.rename("event_types").reset_index()

    return grouped_apply(ds, ["user_id"], _join,
                         num_partitions=auto_partitions(
                             files=[f"{sf_dir}/events.parquet"]),
                         map_side=_distinct)


SQL_COLLECT_SET = """
SELECT user_id,
       STRING_AGG(DISTINCT event_type, '|' ORDER BY event_type) AS event_types
FROM events GROUP BY user_id
"""


def q_mix_corpus(sf_dir: str):
    """Deterministic corpus mixing to target domain proportions (50%
    en / 25% de / 25% fr; es+zh dropped): T = min_d(n_d / w_d), each
    domain keeps its first floor(w_d·T) docs in md5(id) order — the
    pretraining data-recipe primitive (split.mix_corpus)."""
    from kgray.stages.split import mix_corpus

    return mix_corpus(_docs(sf_dir, ["doc_id", "lang"]),
                      domain_col="lang", id_col="doc_id",
                      weights={"en": 0.5, "de": 0.25, "fr": 0.25})


SQL_MIX_CORPUS = """
WITH w(lang, w) AS (VALUES ('en', 0.5), ('de', 0.25), ('fr', 0.25)),
cnt AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
t AS (SELECT MIN(n / w) AS T FROM cnt JOIN w USING (lang)),
k AS (SELECT w.lang, CAST(FLOOR(w.w * (SELECT T FROM t)) AS BIGINT) AS k FROM w),
r AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents)
SELECT doc_id, lang FROM r JOIN k USING (lang) WHERE rn <= k
"""


def q_rolling_zscore(sf_dir: str):
    """Trailing-window anomaly score per user (z vs the 10 PRECEDING
    events, current row excluded from its own baseline). Bit-exact vs
    SQL via integerized frame sums (analytics.rolling_zscore)."""
    from kgray.stages.analytics import rolling_zscore

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "value"])
    out = rolling_zscore(ds, key="user_id", ts_col="ts", value_col="value",
                         tiebreak_col="event_id", window=10)
    return out.map_batches(
        lambda t: t.select(["event_id", "user_id", "z"]),
        batch_format="pyarrow")


SQL_ROLLING_ZSCORE = """
WITH f AS (
  SELECT event_id, user_id,
         CAST(FLOOR(value * 100) AS BIGINT) AS vi,
         CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER w AS BIGINT) AS s,
         CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)
                  * CAST(FLOOR(value * 100) AS BIGINT)) OVER w AS BIGINT) AS sq,
         CAST(COUNT(*) OVER w AS BIGINT) AS n
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id,
  CASE WHEN n >= 2 AND sq - CAST(s AS DOUBLE) * s / n > 0
       THEN ROUND((vi - CAST(s AS DOUBLE) / n)
                  / SQRT((sq - CAST(s AS DOUBLE) * s / n) / (n - 1.0)), 6)
       ELSE NULL END AS z
FROM f
"""


def q_markov_transitions(sf_dir: str):
    """First-order Markov transition probabilities between consecutive
    event types per user (the behavioral-model fit): one user-keyed
    exchange emits adjacent-pair partial counts, a tiny (from, to)
    combiner exchange totals them, probabilities divide by from-totals
    derived from the SAME aggregate (no second pass)."""
    from kgray.kernels.hashagg import auto_partitions, grouped_apply

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type"])

    def _pairs(df):
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same = df["user_id"].to_numpy()[1:] == df["user_id"].to_numpy()[:-1]
        frm = df["event_type"].to_numpy()[:-1][same]
        to = df["event_type"].to_numpy()[1:][same]
        out = pd.DataFrame({"efrom": frm, "eto": to})
        return (out.groupby(["efrom", "eto"], sort=False).size()
                .rename("n").reset_index())

    import pandas as pd

    pairs = grouped_apply(ds, ["user_id"], _pairs,
                          num_partitions=auto_partitions(
                              files=[f"{sf_dir}/events.parquet"]))

    def _sum(df):
        return df.groupby(["efrom", "eto"], as_index=False, sort=False)["n"].sum()

    def _prob(df):
        g = df.groupby(["efrom", "eto"], as_index=False, sort=False)["n"].sum()
        tot = g.groupby("efrom", sort=False)["n"].transform("sum")
        g["p"] = (g["n"] / tot).round(6)
        g["n"] = g["n"].astype("int64")
        return g

    return grouped_apply(pairs, ["efrom"], _prob,
                         num_partitions=auto_partitions(
                             files=[f"{sf_dir}/events.parquet"]),
                         map_side=_sum)


SQL_MARKOV_TRANSITIONS = """
WITH p AS (
  SELECT event_type AS efrom,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS eto
  FROM events
), c AS (
  SELECT efrom, eto, CAST(COUNT(*) AS BIGINT) AS n
  FROM p WHERE eto IS NOT NULL GROUP BY efrom, eto
)
SELECT efrom, eto, n,
       ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY efrom), 6) AS p
FROM c
"""


def q_inverted_index(sf_dir: str):
    """Materialized inverted index: token → document frequency +
    sorted distinct postings list (pipe-joined at the exchange
    boundary, the KGX multivalue convention). Map side explodes each
    batch to DISTINCT (token, doc) pairs; one token-keyed exchange
    builds every postings list vectorized — the persistent-index
    counterpart of the scan-based keyword_search."""
    from kgray.kernels.hashagg import auto_partitions, grouped_apply
    from kgray.stages.corpus import flat_words

    ds = _docs(sf_dir, ["doc_id", "text"])

    def _pairs(t: pa.Table) -> pa.Table:
        flat, off = flat_words(t.column("text"))
        counts = np.diff(off)
        row = np.repeat(np.arange(len(t), dtype=np.int64), counts)
        df = pd.DataFrame({
            "tok": flat.to_pandas().to_numpy(),
            "doc": t.column("doc_id").to_pandas().to_numpy()[row].astype(str),
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    import pandas as pd

    pairs = ds.map_batches(_pairs, batch_format="pyarrow")

    def _dedup(df):
        return df.drop_duplicates()

    def _index(df):
        df = df.drop_duplicates().sort_values(["tok", "doc"], kind="mergesort")
        g = df.groupby("tok", sort=False)["doc"]
        out = pd.DataFrame({
            "tok": g.count().index,
            "df": g.count().to_numpy().astype("int64"),
            "postings": g.agg("|".join).to_numpy(),
        })
        return out

    return grouped_apply(pairs, ["tok"], _index,
                         num_partitions=auto_partitions(
                             files=[f"{sf_dir}/documents.parquet"]),
                         map_side=_dedup)


SQL_INVERTED_INDEX = r"""
WITH w AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok FROM documents
), d AS (
  SELECT DISTINCT tok, CAST(doc_id AS VARCHAR) AS doc FROM w
)
SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
       STRING_AGG(doc, '|' ORDER BY doc) AS postings
FROM d GROUP BY tok
"""


def q_langid_confusion(sf_dir: str):
    """Language-ID confusion matrix: predicted (stopword-scored actor
    pool, same operator as `langid`) × labeled lang, with counts — the
    quality report for the classifier stage. Composition: map-only
    prediction + one tiny (lang, lang_pred) combiner exchange."""
    from kgray.stages.text import LangId

    ds = _docs(sf_dir, ["doc_id", "lang", "text"])
    pred = ds.map_batches(LangId, fn_constructor_kwargs=dict(text_col="text"),
                          batch_format="pyarrow", concurrency=(1, 4))

    def _pairs(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = (pd.DataFrame({"lang": t.column("lang").to_pandas(),
                            "lang_pred": t.column("lang_pred").to_pandas()})
              .groupby(["lang", "lang_pred"], sort=False).size()
              .rename("n").reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    from kgray.kernels.hashagg import grouped_apply

    def _sum(df):
        out = df.groupby(["lang", "lang_pred"], as_index=False, sort=False)["n"].sum()
        out["n"] = out["n"].astype("int64")
        return out

    return grouped_apply(pred.map_batches(_pairs, batch_format="pyarrow"),
                         ["lang", "lang_pred"], _sum, num_partitions=8,
                         map_side=_sum)


SQL_LANGID_CONFUSION = """
WITH words AS (
  SELECT doc_id, lower(w) AS w FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '[a-zA-ZäöüßéèêàçñÁ-ÿ]+')) AS w
    FROM documents
  )
), hits AS (
  SELECT doc_id,
    COUNT(*) FILTER (WHERE w IN ('der','die','das','und','ist','von','mit','für','auf','nicht')) AS de,
    COUNT(*) FILTER (WHERE w IN ('the','and','of','to','is','in','that','for','with','are','was')) AS en,
    COUNT(*) FILTER (WHERE w IN ('el','la','los','y','es','de','que','para','con','una')) AS es,
    COUNT(*) FILTER (WHERE w IN ('le','la','les','et','est','des','que','pour','dans','une')) AS fr
  FROM words GROUP BY doc_id
), pred AS (
  SELECT d.doc_id, d.lang,
    CASE WHEN COALESCE(greatest(h.de, h.en, h.es, h.fr), 0) = 0 THEN 'und'
         WHEN h.de = greatest(h.de, h.en, h.es, h.fr) THEN 'de'
         WHEN h.en = greatest(h.de, h.en, h.es, h.fr) THEN 'en'
         WHEN h.es = greatest(h.de, h.en, h.es, h.fr) THEN 'es'
         ELSE 'fr' END AS lang_pred
  FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
)
SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
FROM pred GROUP BY lang, lang_pred
"""


def q_journey_prefixes(sf_dir: str):
    """Entry-path distribution: users per FIRST-3-event-type sequence
    (onboarding-funnel shape; identical-prefix mass is the bot/dup
    signal). Per-user prefixes built in one keyed exchange, counts via
    a second tiny sequence-keyed combiner exchange."""
    from kgray.kernels.hashagg import auto_partitions, grouped_apply

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type"])

    def _seq(df):
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        head = df.groupby("user_id", sort=False).head(3)
        g = head.groupby("user_id", sort=False)["event_type"].agg(">".join)
        return g.rename("seq").reset_index()[["seq"]]

    seqs = grouped_apply(ds, ["user_id"], _seq,
                         num_partitions=auto_partitions(
                             files=[f"{sf_dir}/events.parquet"]))

    def _cnt(df):
        out = df.groupby("seq", as_index=False, sort=False).size()
        return out.rename(columns={"size": "n"})

    def _sum(df):
        g = df.groupby("seq", as_index=False, sort=False)["n"].sum()
        g["n"] = g["n"].astype("int64")
        return g.rename(columns={"n": "n_users"})

    return grouped_apply(seqs, ["seq"], _sum, num_partitions=8, map_side=_cnt)


SQL_JOURNEY_PREFIXES = """
WITH r AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), s AS (
  SELECT user_id, STRING_AGG(event_type, '>' ORDER BY rn) AS seq
  FROM r WHERE rn <= 3 GROUP BY user_id
)
SELECT seq, CAST(COUNT(*) AS BIGINT) AS n_users
FROM s GROUP BY seq
"""


def q_lexical_diversity(sf_dir: str):
    """Distinct-3-gram ratio per document (lexical diversity / n-gram
    type-token ratio) — low ratio flags templated or repetitive text.
    Map-only vectorized gram construction (corpus.lexical_diversity)."""
    from kgray.stages.corpus import lexical_diversity

    return lexical_diversity(_docs(sf_dir, ["doc_id", "text"]), n=3)


SQL_LEXICAL_DIVERSITY = r"""
WITH g AS (
  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
  FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents),
       UNNEST(generate_series(1, len(w) - 2)) AS t(i)
  WHERE len(w) >= 3
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(DISTINCT s) AS BIGINT) AS n_distinct,
       ROUND(COUNT(DISTINCT s) * 1.0 / COUNT(*), 6) AS diversity
FROM g GROUP BY doc_id
"""


def q_attribution(sf_dir: str):
    """Last-touch conversion attribution: each purchase joins its
    user's most recent click at-or-before it (as-of semantics, clicks
    per (user, ts) deduped to max id for a total order), attributed
    iff within a 1-hour lookback. Pure composition: the asof_join
    exchange + one map — no new machinery."""
    from kgray.stages.joins import asof_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"])

    def _purch(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "purchase"))
        return pa.table({"purchase_id": t.column("event_id"),
                         "user_id": t.column("user_id"), "ts": t.column("ts")})

    def _clicks(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "click"))
        return pa.table({"user_id": t.column("user_id"), "ts": t.column("ts"),
                         "click_id": t.column("event_id"),
                         "cts": t.column("ts")})

    def _dedup_clicks(df):
        df = df.sort_values(["user_id", "ts", "click_id"], kind="mergesort")
        return df.drop_duplicates(subset=["user_id", "ts"], keep="last")

    j = asof_join(ev.map_batches(_purch, batch_format="pyarrow"),
                  ev.map_batches(_clicks, batch_format="pyarrow"),
                  by="user_id", on="ts", right_cols=["click_id", "cts"],
                  right_prepare=_dedup_clicks)

    def _attr(t: pa.Table) -> pa.Table:
        gap = pc.subtract(
            pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()),
            pc.cast(pc.cast(t.column("cts"), pa.timestamp("us")), pa.int64()))
        ok = pc.and_(pc.is_valid(t.column("cts")),
                     pc.less_equal(gap, pa.scalar(3_600_000_000)))
        attributed = pc.cast(pc.coalesce(ok, pa.scalar(False)), pa.int64())
        return pa.table({
            "purchase_id": t.column("purchase_id"),
            "user_id": t.column("user_id"),
            "click_id": t.column("click_id"),
            "attributed": attributed,
        })

    return j.map_batches(_attr, batch_format="pyarrow")


SQL_ATTRIBUTION = """
WITH c AS (
  SELECT user_id, ts AS cts, MAX(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
), p AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id, c.click_id,
  CAST(CASE WHEN c.cts IS NOT NULL
             AND date_diff('microsecond', c.cts, p.ts) <= 3600000000
        THEN 1 ELSE 0 END AS BIGINT) AS attributed
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.cts <= p.ts
"""


def q_multimodal_dedup(sf_dir: str):
    """SELF-ASSERTING (rows-only): the multimodal near-dup path —
    binary payloads → actor-pool feature extraction (deterministic
    stub model) → LSH-bucketed embedding near-dup at cosine ≥ 0.99.
    Every 10th payload is planted as an exact duplicate under a new
    id; the assert is zero false negatives on the planted pairs
    (identical payloads → identical unit vectors → every hyperplane
    table buckets them together)."""
    from kgray.stages.multimodal import FeatureExtract
    from kgray.stages.similarity import lsh_bucketed_near_dup

    paths = construct_corpus_for_sf(sf_dir)
    ds = ray.data.read_parquet(paths["pages"], columns=["url", "html"])

    def _plant(t: pa.Table) -> pa.Table:
        import numpy as np
        idx = np.arange(len(t))
        keep = idx % 10 == 0
        dup = t.filter(pa.array(keep))
        dup = dup.set_column(
            dup.column_names.index("url"), "url",
            pc.binary_join_element_wise(dup.column("url"),
                                        pa.scalar("#dup"), ""))
        return pa.concat_tables([t, dup])

    planted = ds.map_batches(_plant, batch_format="pyarrow")
    feats = planted.map_batches(
        FeatureExtract,
        fn_constructor_kwargs={"payload_col": "html", "dim": 16,
                               "out_col": "embedding"},
        batch_format="pyarrow", batch_size=256, concurrency=(1, 4),
    ).map_batches(
        lambda t: pa.table({
            "vec_id": t.column("url"),
            "embedding": t.column("embedding").combine_chunks().cast(
                pa.list_(pa.float32())),
        }),
        batch_format="pyarrow",
    )
    # Two consumers (pair generation + planted-id enumeration): pin the
    # feature table once so the actor-pool model stage runs once.
    feats = feats.materialize()
    pairs = lsh_bucketed_near_dup(feats, threshold=0.99, n_tables=12).to_pandas()
    found = {(str(a), str(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    # Zero false negatives on the planted exact duplicates: EVERY
    # planted id in the feature table must be paired with its source
    # (identical payloads → identical unit vectors → same bucket in
    # every hyperplane table).
    planted = [str(r["vec_id"]) for r in feats.select_columns(["vec_id"]).take_all()
               if str(r["vec_id"]).endswith("#dup")]
    assert planted, "no duplicates were planted"
    missing = [p for p in planted
               if tuple(sorted((p[:-4], p))) not in found]
    assert not missing, f"planted duplicates not recovered: {missing[:5]}"
    return pa.Table.from_pandas(
        pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True),
        preserve_index=False)


def q_shipping_delay(sf_dir: str):
    """Composed operations report: order→ship delay percentiles (p50 /
    p95 in days) per order priority — one orderkey hash-join exchange
    feeding the grouped percentile_cont kernel. Integer day deltas keep
    the quantile interpolation exact across engines."""
    from kgray.stages.relational import hash_join
    from kgray.stages.sketch import grouped_quantiles_cont

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(lambda t: t.rename_columns(
        ["l_orderkey", "o_orderdate", "o_orderpriority"]), batch_format="pyarrow")
    j = hash_join(li, orders, on="l_orderkey", how="inner")

    def _delay(t: pa.Table) -> pa.Table:
        d = pc.subtract(
            pc.cast(pc.cast(t.column("l_shipdate"), pa.timestamp("us")), pa.int64()),
            pc.cast(pc.cast(t.column("o_orderdate"), pa.timestamp("us")), pa.int64()))
        days = pc.cast(pc.divide(d, pa.scalar(86_400_000_000)), pa.int64())
        return pa.table({"o_orderpriority": t.column("o_orderpriority"),
                         "delay_days": days})

    delays = j.map_batches(_delay, batch_format="pyarrow")
    return grouped_quantiles_cont(delays, key="o_orderpriority",
                                  value_col="delay_days", qs=(0.5, 0.95))


SQL_SHIPPING_DELAY = """
WITH d AS (
  SELECT o_orderpriority,
         CAST(date_diff('microsecond', o_orderdate, l_shipdate) // 86400000000
              AS BIGINT) AS delay_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT o_orderpriority, CAST(0.5 AS DOUBLE) AS q,
       ROUND(quantile_cont(delay_days, 0.5), 6) AS value
FROM d GROUP BY o_orderpriority
UNION ALL
SELECT o_orderpriority, CAST(0.95 AS DOUBLE),
       ROUND(quantile_cont(delay_days, 0.95), 6)
FROM d GROUP BY o_orderpriority
"""


def q_edge_holdout(sf_dir: str):
    """Graph-aware ML edge holdout (reference run.py:210-273 semantics):
    spanning-forest-preserving positive test edges + matched negative
    non-edges over the order–part bipartite graph (orderkey ↔ partkey
    via lineitem — plenty of cycles, so non-tree edges exist).

    SELF-ASSERTS (rows-only; the forest choice and hash sampling are
    sequential/stateful, not SQL-expressible) — count-based + sampled
    so the bench measures the pipeline, not a verifier (the full
    invariants — exact partition of E, forest-preserving components,
    every negative a non-edge — are pinned in tests/test_holdout.py):
    1. split sizes plausible: pos_test ≤ (1−0.8)·(pos_train+pos_test);
    2. |neg_test| = |pos_test|;
    3. a 256-row negative sample is canonical (u < v) and disjoint
       from the input edge set (one vectorized streaming pass).
    """
    import pandas as pd

    from kgray.stages.holdout import edge_holdout

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_partkey"])
    OFF = 1_000_000_000  # disjoint id namespaces for the two sides

    def _mk_edges(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t.column("l_orderkey"),
            "dst": pc.add(t.column("l_partkey"), pa.scalar(OFF, pa.int64())),
        })

    edges = li.map_batches(_mk_edges, batch_format="pyarrow")
    out = edge_holdout(edges, train_fraction=0.8, seed=13).materialize()

    # Count-based + SAMPLED self-asserts only — the full invariants
    # (exact partition of E, forest-preserving components, every
    # negative absent from E) live in tests/test_holdout.py on hand
    # graphs and forced paths; an O(E) driver-side union-find verifier
    # here would dominate the benched query (it did: 78 s at sf0.1).
    sizes: dict = {}
    for b in out.map_batches(
            lambda t: t.group_by("split").aggregate([("split", "count")]),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            sizes[r["split"]] = sizes.get(r["split"], 0) + r["split_count"]
    m = sizes.get("pos_train", 0) + sizes.get("pos_test", 0)
    k = sizes.get("pos_test", 0)
    assert m > 0 and 0 < k <= int(0.2 * m + 1e-9 + m * 1e-12), (
        f"edge_holdout: implausible split sizes {sizes}")
    assert sizes.get("neg_test", 0) == k, (
        f"edge_holdout: negatives {sizes.get('neg_test', 0)} != positives {k}")

    # sampled membership check: no sampled negative may be a real edge,
    # every sampled negative is canonical (u < v)
    neg_sample = out.filter(expr="split == 'neg_test'").limit(256).take_all()
    assert all(r["u"] < r["v"] for r in neg_sample), (
        "edge_holdout: non-canonical negative pair")
    sample_set = {(r["u"], r["v"]) for r in neg_sample}

    sample_u = np.unique(np.array([u for u, _ in sample_set], np.int64))

    def _hits(t: pa.Table) -> pa.Table:
        u = t.column("l_orderkey").to_numpy()
        v = t.column("l_partkey").to_numpy() + OFF
        # vectorized prefilter on u (expected ~0 survivors), exact
        # pair check only on the survivors
        pre = np.isin(u, sample_u)
        n = sum((int(a), int(b)) in sample_set
                for a, b in zip(u[pre], v[pre]))
        return pa.table({"hits": pa.array([n], pa.int64())})

    li2 = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                columns=["l_orderkey", "l_partkey"])
    n_hits = 0
    for b in li2.map_batches(_hits, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        n_hits += int(b.column("hits").to_numpy().sum())
    assert n_hits == 0, f"edge_holdout: {n_hits} sampled negatives are real edges"
    return out


def q_profile(sf_dir: str):
    """Data-profiling summary per column (null count, exact distinct,
    native-typed min/max rendered as strings): algebraic partials for
    the scalar stats + ONE melted (column, value) exchange for the
    exact distincts — shuffle volume O(distinct pairs), never
    rows × columns (relational.profile_columns)."""
    from kgray.stages.relational import profile_columns

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_orderkey"])
    return profile_columns(ds, ["l_returnflag", "l_quantity", "l_orderkey"])


SQL_PROFILE = """
SELECT 'l_returnflag' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(*) - COUNT(l_returnflag) AS BIGINT) AS n_null,
  CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_distinct,
  CAST(MIN(l_returnflag) AS VARCHAR) AS min_str,
  CAST(MAX(l_returnflag) AS VARCHAR) AS max_str
FROM lineitem
UNION ALL
SELECT 'l_quantity', CAST(COUNT(*) AS BIGINT),
  CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT),
  CAST(COUNT(DISTINCT l_quantity) AS BIGINT),
  CAST(MIN(l_quantity) AS VARCHAR), CAST(MAX(l_quantity) AS VARCHAR)
FROM lineitem
UNION ALL
SELECT 'l_orderkey', CAST(COUNT(*) AS BIGINT),
  CAST(COUNT(*) - COUNT(l_orderkey) AS BIGINT),
  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT),
  CAST(MIN(l_orderkey) AS VARCHAR), CAST(MAX(l_orderkey) AS VARCHAR)
FROM lineitem
"""


def q_bigram_nll(sf_dir: str):
    """Interpolated bigram LM quality score (the CCNet filter one order
    up from unigram_nll): two combiner-fronted model exchanges, then a
    size-switched scoring pass — broadcast map-only here, three-join
    path above the model limit (corpus.bigram_nll)."""
    from kgray.stages.corpus import bigram_nll

    return bigram_nll(_docs(sf_dir, ["doc_id", "text"]))


SQL_BIGRAM_NLL = """
WITH words AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents
), tok AS (
  SELECT doc_id, unnest(w) AS tok FROM words
), uni AS (
  SELECT tok, CAST(COUNT(*) AS DOUBLE) AS c FROM tok GROUP BY 1
), tot AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tok
), bg AS (
  SELECT doc_id, w[i] AS cur, w[i+1] AS nxt
  FROM words, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
), bc AS (
  SELECT cur, nxt, CAST(COUNT(*) AS DOUBLE) AS c12 FROM bg GROUP BY 1, 2
)
SELECT bg.doc_id,
       ROUND(-AVG(LN(0.9 * (bc.c12 / u1.c) + 0.1 * (u2.c / tot.n))), 6) AS nll
FROM bg JOIN bc USING (cur, nxt)
        JOIN uni u1 ON u1.tok = bg.cur
        JOIN uni u2 ON u2.tok = bg.nxt
        CROSS JOIN tot
GROUP BY bg.doc_id
"""


def q_string_agg(sf_dir: str):
    """Per-user ORDERED event-type concatenation (SQL string_agg with
    ORDER BY): one key exchange, partition-wide sort, vectorized
    group-offset join (relational.string_agg_by)."""
    from kgray.stages.relational import string_agg_by

    ds = _events(sf_dir, ["user_id", "event_id", "event_type", "ts"])
    return string_agg_by(ds, key="user_id", value_col="event_type",
                         order_cols=["ts", "event_id"], sep="|",
                         out_col="events")


SQL_STRING_AGG = """
SELECT user_id, string_agg(event_type, '|' ORDER BY ts, event_id) AS events
FROM events GROUP BY user_id
"""


def q_percentile_disc(sf_dir: str):
    """Per-event-type DISCRETE percentiles (always an actual member of
    the group, unlike quantile_cont's interpolation): index arithmetic
    over the sorted partition's group offsets
    (relational.percentile_disc_by)."""
    from kgray.stages.relational import percentile_disc_by

    ds = _events(sf_dir, ["event_type", "value"])
    return percentile_disc_by(ds, key="event_type", value_col="value",
                              qs=(0.25, 0.9))


SQL_PERCENTILE_DISC = """
SELECT event_type, CAST(0.25 AS DOUBLE) AS q,
       quantile_disc(value, 0.25) AS value
FROM events GROUP BY event_type
UNION ALL
SELECT event_type, CAST(0.9 AS DOUBLE), quantile_disc(value, 0.9)
FROM events GROUP BY event_type
"""


def q_cume_dist(sf_dir: str):
    """CUME_DIST window function per event type over value — the tie
    blocks resolve with one reverse-cummax over run ends, no per-group
    Python (relational.cume_dist_by)."""
    from kgray.stages.relational import cume_dist_by

    ds = _events(sf_dir, ["event_type", "value"])
    return cume_dist_by(ds, key="event_type", value_col="value")


SQL_CUME_DIST = """
SELECT event_type, value,
       ROUND(cume_dist() OVER (PARTITION BY event_type ORDER BY value), 6) AS cd
FROM events
"""


def q_quality_classifier(sf_dir: str):
    """Distributed quality-classifier TRAINING (fastText-style filter
    models): logistic regression fit by Newton/IRLS where every
    iteration is one map pass emitting O(d²) algebraic partials — the
    corpus never shuffles (kgray.stages.classify). Labels here are a
    PLANTED linear rule over real per-doc features (log tokens, mean
    word length, 'the'-rate) — the synthetic corpus carries no genuine
    quality signal, so recovering the plant is the honest test of the
    TRAINER, like the k-means / PCA self-asserts.

    SELF-ASSERTS (rows-only; iterative optimization, not
    SQL-expressible): Newton loss decreases monotonically, training
    accuracy ≥ 0.97 against the planted rule, weights finite with the
    plant's signs. Output: one row per coefficient + summary rows."""
    import numpy as np

    from kgray.stages.classify import logistic_regression, logistic_score

    docs = _docs(sf_dir, ["doc_id", "text"])

    def _feat(t: pa.Table) -> pa.Table:
        text = t.column("text")
        toks = pc.count_substring_regex(text, r"\S+").cast(pa.float64())
        safe_t = pc.max_element_wise(toks, pa.scalar(1.0))
        lt = pc.ln(pc.add(toks, pa.scalar(1.0)))
        nonspace = pc.subtract(pc.utf8_length(text).cast(pa.float64()),
                               pc.count_substring(text, " ").cast(pa.float64()))
        awl = pc.divide(nonspace, safe_t)
        tr = pc.divide(
            pc.count_substring_regex(text, r"\bthe\b").cast(pa.float64()), safe_t)
        z = (3.0 * lt.to_numpy(zero_copy_only=False)
             + 2.0 * awl.to_numpy(zero_copy_only=False)
             + 30.0 * tr.to_numpy(zero_copy_only=False) - 21.1)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "lt": lt, "awl": awl, "tr": tr,
            "y": pa.array((z > 0).astype(np.float64)),
        })

    # materialized: consumed once per Newton iteration + once to score
    feats = docs.map_batches(_feat, batch_format="pyarrow").materialize()
    cols = ["lt", "awl", "tr"]
    fit = logistic_regression(feats, cols, "y", iters=10, l2=1e-3)
    w = fit["weights"]
    h = fit["history"]
    assert all(h[i + 1] <= h[i] + 1e-9 for i in range(len(h) - 1)), (
        "quality_classifier: Newton loss not monotone")
    assert np.isfinite(w).all(), "quality_classifier: non-finite weights"
    assert w[0] > 0 and w[1] > 0, "quality_classifier: plant signs lost"

    # training accuracy via one distributed scoring pass + partial sums
    def _acc(t: pa.Table) -> pa.Table:
        pred = pc.greater_equal(t.column("score"), pa.scalar(0.5)).cast(pa.float64())
        hit = pc.equal(pred, t.column("y")).cast(pa.int64())
        return pa.table({"hits": pa.array([pc.sum(hit).as_py() or 0], pa.int64()),
                         "n": pa.array([len(t)], pa.int64())})

    parts = logistic_score(feats, w, cols).map_batches(
        _acc, batch_format="pyarrow").to_pandas()
    acc = float(parts["hits"].sum()) / max(int(parts["n"].sum()), 1)
    assert acc >= 0.97, f"quality_classifier: train accuracy {acc:.3f} < 0.97"

    names = cols + ["__intercept", "__train_accuracy", "__iters"]
    vals = list(np.round(w, 6)) + [round(acc, 6), float(len(h))]
    return pa.table({"name": pa.array(names, pa.string()),
                     "value": pa.array(vals, pa.float64())})


QUERIES = {
    "kgx_node_merge": q_kgx_node_merge,
    "kgx_edge_dedup": q_kgx_edge_dedup,
    "kgx_edge_provenance": q_kgx_edge_provenance,
    "kgx_priority_merge": q_kgx_priority_merge,
    "kgx_priority_merge_duplicates": q_kgx_priority_merge_duplicates,
    "integrity_missing_nodes": q_integrity_missing_nodes,
    "integrity_stub_repair": q_integrity_stub_repair,
    "whole_row_dedup": q_whole_row_dedup,
    "graph_stats": q_graph_stats,
    "union_by_name": q_union_by_name,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_pairs": q_dedup_minhash_pairs,
    "dedup_minhash": q_dedup_minhash,
    "dedup_jaccard_pairs": q_dedup_jaccard_pairs,
    "dedup_embedding_pairs": q_dedup_embedding_pairs,
    "dedup_simhash": q_dedup_simhash,
    "ann_topk": q_ann_topk,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "token_count": q_token_count,
    "bpe_token_count": q_bpe_token_count,
    "text_stats": q_text_stats,
    "fingerprint": q_fingerprint,
    "langid": q_langid,
    "lineitem_agg": q_lineitem_agg,
    "orders_by_nation": q_orders_by_nation,
    "filter_prune": q_filter_prune,
    "sessionize": q_sessionize,
    "tumbling_window": q_tumbling_window,
    "sliding_window": q_sliding_window,
    "holdout_split": q_holdout_split,
    "construct_kg": q_construct_kg,
    "extract_text": q_extract_text,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "filter_prefix": q_filter_prefix,
    "session_gap": q_session_gap,
    "connected_components": q_connected_components,
    "multimodal_features": q_multimodal_features,
    "pii_scrub": q_pii_scrub,
    "repetition_filter": q_repetition_filter,
    "topk_tokens": q_topk_tokens,
    "chunk_dedup": q_chunk_dedup,
    "decontaminate": q_decontaminate,
    "group_quantiles": q_group_quantiles,
    "stratified_sample": q_stratified_sample,
    "pack_sequences": q_pack_sequences,
    "bestfit_pack": q_bestfit_pack,
    "hash_join": q_hash_join,
    "top_n_per_group": q_top_n_per_group,
    "grouped_distinct_count": q_grouped_distinct_count,
    "approx_distinct": q_approx_distinct,
    "kmeans": q_kmeans,
    "semantic_dedup": q_semantic_dedup,
    "shuffle_rank": q_shuffle_rank,
    "gopher_filter": q_gopher_filter,
    "tfidf_topk": q_tfidf_topk,
    "unigram_nll": q_unigram_nll,
    "top_orders": q_top_orders,
    "approx_quantiles": q_approx_quantiles,
    "semi_join": q_semi_join,
    "anti_join": q_anti_join,
    "running_total": q_running_total,
    "normalize_text": q_normalize_text,
    "decontaminate_bloom": q_decontaminate_bloom,
    "approx_topk_freq": q_approx_topk_freq,
    "pagerank": q_pagerank,
    "rollup": q_rollup,
    "lead_lag": q_lead_lag,
    "pivot_status": q_pivot_status,
    "boilerplate": q_boilerplate,
    "dsir": q_dsir,
    "corpus_diff": q_corpus_diff,
    "pca": q_pca,
    "outlier_filter": q_outlier_filter,
    "value_rank": q_value_rank,
    "group_sample": q_group_sample,
    "zscore": q_zscore,
    "funnel": q_funnel,
    "curate_corpus": q_curate_corpus,
    "cross_dedup": q_cross_dedup,
    "moving_average": q_moving_average,
    "daily_active": q_daily_active,
    "retention_cohorts": q_retention_cohorts,
    "mode_per_group": q_mode_per_group,
    "cube_agg": q_cube_agg,
    "grouped_corr": q_grouped_corr,
    "topk_bigrams": q_topk_bigrams,
    "keyword_search": q_keyword_search,
    "length_histogram": q_length_histogram,
    "knn_graph": q_knn_graph,
    "degree_distribution": q_degree_distribution,
    "weighted_sample": q_weighted_sample,
    "vocab_build": q_vocab_build,
    "bpe_train": q_bpe_train,
    "bpe_encode": q_bpe_encode,
    "bpe_tokenize": q_bpe_tokenize,
    "linear_fit": q_linear_fit,
    "triangle_count": q_triangle_count,
    "revenue_by_nation": q_revenue_by_nation,
    "embedding_centroids": q_embedding_centroids,
    "event_trigrams": q_event_trigrams,
    "edit_distance_pairs": q_edit_distance_pairs,
    "set_intersect": q_set_intersect,
    "set_except": q_set_except,
    "grouped_rank": q_grouped_rank,
    "big_orders": q_big_orders,
    "dup_spans": q_dup_spans,
    "pmi_bigrams": q_pmi_bigrams,
    "bm25_search": q_bm25_search,
    "range_window": q_range_window,
    "bfs_distances": q_bfs,
    "quantiles_cont": q_quantiles_cont,
    "merge_intervals": q_merge_intervals,
    "grouped_quantiles_cont": q_grouped_quantiles,
    "percent_rank": q_percent_rank,
    "skyline": q_skyline,
    "json_extract_agg": q_json_extract_agg,
    "window_dedup": q_window_dedup,
    "doc_entropy": q_doc_entropy,
    "max_by": q_max_by,
    "unpivot": q_unpivot,
    "containment_pairs": q_containment_pairs,
    "grouped_topk_tokens": q_grouped_topk_tokens,
    "ewma": q_ewma,
    "explode_embedding": q_explode_embedding,
    "top_returns": q_top_returns,
    "weighted_avg": q_weighted_avg,
    "robust_scale": q_robust_scale,
    "grouped_approx_quantiles": q_grouped_approx_quantiles,
    "grouped_approx_distinct": q_grouped_approx_distinct,
    "chunk_text": q_chunk_text,
    "first_last": q_first_last,
    "dedup_within_lang": q_dedup_within_lang,
    "cumulative_users": q_cumulative_users,
    "grouped_mad": q_grouped_mad,
    "hash_features": q_hash_features,
    "k_core": q_k_core,
    "quantile_transform": q_quantile_transform,
    "range_rank": q_range_rank,
    "collect_set": q_collect_set,
    "mix_corpus": q_mix_corpus,
    "rolling_zscore": q_rolling_zscore,
    "markov_transitions": q_markov_transitions,
    "inverted_index": q_inverted_index,
    "langid_confusion": q_langid_confusion,
    "journey_prefixes": q_journey_prefixes,
    "lexical_diversity": q_lexical_diversity,
    "attribution": q_attribution,
    "multimodal_dedup": q_multimodal_dedup,
    "shipping_delay": q_shipping_delay,
    "edge_holdout": q_edge_holdout,
    "quality_classifier": q_quality_classifier,
    "string_agg": q_string_agg,
    "bigram_nll": q_bigram_nll,
    "profile": q_profile,
    "percentile_disc": q_percentile_disc,
    "cume_dist": q_cume_dist,
    "min_by": q_min_by,
    "ntile": q_ntile,
    "grouped_covar": q_grouped_covar,
    "spearman": q_spearman,
    "grouped_ntile": q_grouped_ntile,
}

ORACLES = {
    "kgx_node_merge": SQL_KGX_NODE_MERGE,
    "kgx_edge_dedup": SQL_KGX_EDGE_DEDUP,
    "kgx_edge_provenance": SQL_KGX_EDGE_PROVENANCE,
    "kgx_priority_merge": SQL_KGX_PRIORITY_MERGE,
    "kgx_priority_merge_duplicates": SQL_KGX_PRIORITY_MERGE_DUPLICATES,
    "integrity_missing_nodes": SQL_INTEGRITY_MISSING,
    "integrity_stub_repair": SQL_INTEGRITY_STUBS,
    "whole_row_dedup": SQL_WHOLE_ROW_DEDUP,
    "graph_stats": SQL_GRAPH_STATS,
    "union_by_name": SQL_UNION_BY_NAME,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_minhash_pairs": SQL_DEDUP_MINHASH_PAIRS,
    "dedup_minhash": SQL_DEDUP_MINHASH_SURVIVORS,
    "dedup_jaccard_pairs": SQL_DEDUP_JACCARD_PAIRS,
    "dedup_embedding_pairs": SQL_DEDUP_EMBEDDING_PAIRS,
    "semantic_dedup": SQL_SEMANTIC_DEDUP,
    "shuffle_rank": SQL_SHUFFLE_RANK,
    "gopher_filter": SQL_GOPHER_FILTER,
    "tfidf_topk": SQL_TFIDF_TOPK,
    "unigram_nll": SQL_UNIGRAM_NLL,
    "top_orders": SQL_TOP_ORDERS,
    "dedup_simhash": SQL_DEDUP_SIMHASH,
    "ann_topk": SQL_ANN_TOPK,
    "ann_lsh": _sql_ann_cand("ann_lsh"),
    "ann_ivf": _sql_ann_cand("ann_ivf"),
    "token_count": SQL_TOKEN_COUNT,
    "bpe_token_count": SQL_BPE_TOKEN_COUNT,
    "text_stats": SQL_TEXT_STATS,
    "fingerprint": SQL_FINGERPRINT,
    "langid": SQL_LANGID,
    "lineitem_agg": SQL_LINEITEM_AGG,
    "orders_by_nation": SQL_ORDERS_BY_NATION,
    "filter_prune": SQL_FILTER_PRUNE,
    "sessionize": SQL_SESSIONIZE,
    "tumbling_window": SQL_TUMBLING_WINDOW,
    "sliding_window": SQL_SLIDING_WINDOW,
    "holdout_split": SQL_HOLDOUT_SPLIT,
    "asof_join": SQL_ASOF_JOIN,
    "range_join": SQL_RANGE_JOIN,
    "filter_prefix": SQL_FILTER_PREFIX,
    "session_gap": SQL_SESSION_GAP,
    "connected_components": SQL_CONNECTED_COMPONENTS,
    "pii_scrub": SQL_PII_SCRUB,
    "repetition_filter": SQL_REPETITION_FILTER,
    "topk_tokens": SQL_TOPK_TOKENS,
    "chunk_dedup": SQL_CHUNK_DEDUP,
    "decontaminate": SQL_DECONTAMINATE,
    "group_quantiles": SQL_GROUP_QUANTILES,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "hash_join": SQL_HASH_JOIN,
    "top_n_per_group": SQL_TOP_N_PER_GROUP,
    "grouped_distinct_count": SQL_GROUPED_DISTINCT_COUNT,
    "semi_join": SQL_SEMI_JOIN,
    "anti_join": SQL_ANTI_JOIN,
    "running_total": SQL_RUNNING_TOTAL,
    "normalize_text": SQL_NORMALIZE_TEXT,
    "rollup": SQL_ROLLUP,
    "lead_lag": SQL_LEAD_LAG,
    "pivot_status": SQL_PIVOT_STATUS,
    "boilerplate": SQL_BOILERPLATE,
    "dsir": SQL_DSIR,
    "corpus_diff": SQL_CORPUS_DIFF,
    "outlier_filter": SQL_OUTLIER_FILTER,
    "value_rank": SQL_VALUE_RANK,
    "group_sample": SQL_GROUP_SAMPLE,
    "zscore": SQL_ZSCORE,
    "funnel": SQL_FUNNEL,
    "cross_dedup": SQL_CROSS_DEDUP,
    "moving_average": SQL_MOVING_AVERAGE,
    "daily_active": SQL_DAILY_ACTIVE,
    "retention_cohorts": SQL_RETENTION_COHORTS,
    "mode_per_group": SQL_MODE_PER_GROUP,
    "cube_agg": SQL_CUBE_AGG,
    "grouped_corr": SQL_GROUPED_CORR,
    "topk_bigrams": SQL_TOPK_BIGRAMS,
    "keyword_search": SQL_KEYWORD_SEARCH,
    "length_histogram": SQL_LENGTH_HISTOGRAM,
    "knn_graph": SQL_KNN_GRAPH,
    "degree_distribution": SQL_DEGREE_DISTRIBUTION,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
    "vocab_build": SQL_VOCAB_BUILD,
    "linear_fit": SQL_LINEAR_FIT,
    "triangle_count": SQL_TRIANGLE_COUNT,
    "revenue_by_nation": SQL_REVENUE_BY_NATION,
    "embedding_centroids": SQL_EMBEDDING_CENTROIDS,
    "event_trigrams": SQL_EVENT_TRIGRAMS,
    "edit_distance_pairs": SQL_EDIT_DISTANCE_PAIRS,
    "set_intersect": SQL_SET_INTERSECT,
    "set_except": SQL_SET_EXCEPT,
    "grouped_rank": SQL_GROUPED_RANK,
    "big_orders": SQL_BIG_ORDERS,
    "dup_spans": SQL_DUP_SPANS,
    "pmi_bigrams": SQL_PMI_BIGRAMS,
    "bm25_search": SQL_BM25_SEARCH,
    "range_window": SQL_RANGE_WINDOW,
    "bfs_distances": SQL_BFS_DISTANCES,
    "quantiles_cont": SQL_QUANTILES_CONT,
    "merge_intervals": SQL_MERGE_INTERVALS,
    "grouped_quantiles_cont": SQL_GROUPED_QUANTILES,
    "percent_rank": SQL_PERCENT_RANK,
    "skyline": SQL_SKYLINE,
    "json_extract_agg": SQL_JSON_EXTRACT_AGG,
    "window_dedup": SQL_WINDOW_DEDUP,
    "doc_entropy": SQL_DOC_ENTROPY,
    "max_by": SQL_MAX_BY,
    "min_by": SQL_MIN_BY,
    "ntile": SQL_NTILE,
    "grouped_covar": SQL_GROUPED_COVAR,
    "spearman": SQL_SPEARMAN,
    "grouped_ntile": SQL_GROUPED_NTILE,
    "unpivot": SQL_UNPIVOT,
    "containment_pairs": SQL_CONTAINMENT_PAIRS,
    "grouped_topk_tokens": SQL_GROUPED_TOPK_TOKENS,
    "ewma": SQL_EWMA,
    "explode_embedding": SQL_EXPLODE_EMBEDDING,
    "top_returns": SQL_TOP_RETURNS,
    "weighted_avg": SQL_WEIGHTED_AVG,
    "robust_scale": SQL_ROBUST_SCALE,
    "chunk_text": SQL_CHUNK_TEXT,
    "first_last": SQL_FIRST_LAST,
    "dedup_within_lang": SQL_DEDUP_WITHIN_LANG,
    "cumulative_users": SQL_CUMULATIVE_USERS,
    "grouped_mad": SQL_GROUPED_MAD,
    "hash_features": SQL_HASH_FEATURES,
    "quantile_transform": SQL_QUANTILE_TRANSFORM,
    "range_rank": SQL_RANGE_RANK,
    "collect_set": SQL_COLLECT_SET,
    "mix_corpus": SQL_MIX_CORPUS,
    "rolling_zscore": SQL_ROLLING_ZSCORE,
    "markov_transitions": SQL_MARKOV_TRANSITIONS,
    "inverted_index": SQL_INVERTED_INDEX,
    "langid_confusion": SQL_LANGID_CONFUSION,
    "journey_prefixes": SQL_JOURNEY_PREFIXES,
    "lexical_diversity": SQL_LEXICAL_DIVERSITY,
    "attribution": SQL_ATTRIBUTION,
    "shipping_delay": SQL_SHIPPING_DELAY,
    "string_agg": SQL_STRING_AGG,
    "bigram_nll": SQL_BIGRAM_NLL,
    "profile": SQL_PROFILE,
    "percentile_disc": SQL_PERCENTILE_DISC,
    "cume_dist": SQL_CUME_DIST,
    # rows-only (non-SQL-expressible): ann_lsh (LSH recall is
    # probabilistic), construct_kg / extract_text (self-checking
    # against generator goldens), multimodal_features (decode stub)
}
