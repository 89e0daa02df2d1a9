"""Property-based equivalence: the distributed merge paths vs the pure
pandas oracle kernels on random KGX-shaped inputs (the reference has no
property tests — SURVEY §5 — so this is strictly stronger coverage)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kgray.kernels.kgx_agg import merge_edges_pandas, merge_nodes_pandas
from kgray.pipelines.kgx_merge import merge_edges, merge_nodes

_ids = st.sampled_from(["A:1", "A:2", "B:1", "B:2", "C:9"])
_vals = st.one_of(st.none(), st.sampled_from(["", "x", "y", "a|b", "Z ", "ü"]))
_srcs = st.one_of(st.none(), st.sampled_from(["onto.json", "other", "third"]))


def _node_frames(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    return pd.DataFrame(
        {
            "id": [draw(_ids) for _ in range(n)],
            "name": [draw(_vals) for _ in range(n)],
            "category": [draw(_vals) for _ in range(n)],
            "provided_by": [draw(_srcs) for _ in range(n)],
        }
    )


node_frames = st.composite(_node_frames)()


def _normalize(df: pd.DataFrame) -> list:
    df = df.copy()
    for c in df.columns:
        df[c] = df[c].where(df[c].notna(), "\x00")
    return sorted(map(tuple, df.to_numpy().tolist()))


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(df=node_frames, use_priority=st.booleans())
def test_merge_nodes_matches_pandas_oracle(df, use_priority, ray_session):
    # Empty-string values are legal VARCHAR content (≠ NULL) — the TSV
    # boundary maps ''→NULL at read, but parquet-borne data may carry ''.
    priority = ["onto.json"] if use_priority else []
    expected = merge_nodes_pandas(df, priority_sources=priority)
    got = merge_nodes(ray.data.from_pandas(df), priority_sources=priority, num_partitions=3).to_pandas()
    assert _normalize(got) == _normalize(expected)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(df=node_frames, use_priority=st.booleans())
def test_merge_nodes_matches_duckdb(df, use_priority, ray_session):
    """Triangulate against DuckDB's own STRING_AGG/MAX/COALESCE."""
    priority = ["onto.json"] if use_priority else []
    con = duckdb.connect()
    con.register("nodes", df)
    prio_sql = "'onto.json'" if priority else "''"
    sql = f"""
    SELECT id,
      COALESCE(MAX(CASE WHEN provided_by IN ({prio_sql}) THEN name END), MAX(name)) AS name,
      STRING_AGG(DISTINCT category, '|' ORDER BY category) AS category,
      STRING_AGG(DISTINCT provided_by, '|' ORDER BY provided_by) AS provided_by
    FROM nodes GROUP BY id
    """
    expected = con.execute(sql).df()
    got = merge_nodes(ray.data.from_pandas(df), priority_sources=priority, num_partitions=3).to_pandas()
    assert _normalize(got[["id", "name", "category", "provided_by"]]) == _normalize(expected)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(_ids, st.sampled_from(["p", "q"]), _ids, st.sampled_from(["k1", "k2", "k3"])),
        min_size=1,
        max_size=30,
    ),
    provenance=st.booleans(),
)
def test_merge_edges_matches_pandas_oracle(rows, provenance, ray_session):
    df = pd.DataFrame(rows, columns=["subject", "predicate", "object", "knowledge_source"])
    expected = merge_edges_pandas(df, provenance=provenance)
    got = merge_edges(ray.data.from_pandas(df), provenance=provenance, num_partitions=3).to_pandas()
    assert _normalize(got) == _normalize(expected[got.columns.tolist()])


def test_aggregatefnv2_kernels_smoke(ray_session):
    """The AggregateFnV2 forms (small-cardinality path) agree with the
    frame kernels."""
    from kgray.kernels.kgx_agg import MinAny, PriorityCoalesceMax, SortedUniqueConcat

    df = pd.DataFrame(
        {
            "id": ["a", "a", "b"],
            "name": ["n2", "n1", "n3"],
            "provided_by": ["other", "onto.json", "other"],
            "category": ["c2", "c1", None],
        }
    )
    ds = ray.data.from_pandas(df)
    # NB: PriorityCoalesceMax needs provided_by present in the
    # projected aggregation input → aggregate it too (see kernel
    # docstring; the full KGX merge always does).
    out = (
        ds.groupby("id")
        .aggregate(
            PriorityCoalesceMax(["onto.json"], alias_name="name"),
            SortedUniqueConcat("category", alias_name="category"),
            SortedUniqueConcat("provided_by", alias_name="provided_by"),
            MinAny("name", alias_name="min_name"),
        )
        .to_pandas()
        .set_index("id")
    )
    assert out.loc["a", "name"] == "n1"  # priority beats max
    assert out.loc["a", "category"] == "c1|c2"
    assert out.loc["b", "name"] == "n3"
    assert pd.isna(out.loc["b", "category"]) or out.loc["b", "category"] is None
    assert out.loc["a", "min_name"] == "n1"


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=50,
    ),
    st.integers(min_value=0, max_value=6),
)
@settings(max_examples=60, deadline=None)
def test_stable_round_matches_duckdb(xs, nd):
    """stable_round lands on the same double as SQL ROUND for arbitrary
    float64 inputs (pc.round does not — see the helper's docstring)."""
    import duckdb
    import pyarrow as pa

    from kgray.kernels.hashagg import stable_round

    got = stable_round(pa.array(xs, type=pa.float64()), nd).to_pylist()
    want = [
        duckdb.sql(f"SELECT ROUND(CAST({x!r} AS DOUBLE), {nd})").fetchone()[0] for x in xs
    ]
    assert got == want


_pm_keys = st.sampled_from(["s:1", "s:2", "s:3", "ü:1"])
_pm_vals = st.one_of(st.none(), st.sampled_from(["src_a", "src_b", "", "x|y", "ü"]))


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(st.tuples(_pm_keys, _pm_keys, _pm_vals), min_size=0, max_size=40),
)
def test_provenance_merge_matches_general_kernel(rows):
    """provenance_merge_table (the edge-reduce fast kernel) is row-for-row
    equal to sorted_unique_join_table on arbitrary inputs: single-value
    groups, multi-value groups, all-null groups, empties, unicode."""
    import pyarrow as pa

    from kgray.kernels.hashagg import provenance_merge_table, sorted_unique_join_table

    t = pa.table(
        {
            "subject": pa.array([r[0] for r in rows], type=pa.string()),
            "object": pa.array([r[1] for r in rows], type=pa.string()),
            "src": pa.array([r[2] for r in rows], type=pa.string()),
        }
    )
    keys = ["subject", "object"]
    want = sorted_unique_join_table(t, keys, ["src"]).select(keys + ["src"])
    got = provenance_merge_table(t, keys, "src")

    def norm(tbl):
        return sorted(
            tuple("\x00" if v is None else v for v in d.values())
            for d in tbl.select(keys + ["src"]).to_pylist()
        )

    assert norm(got) == norm(want)


def test_value_rank_matches_row_number(ray_session):
    import duckdb
    import ray.data

    from kgray.stages.split import value_rank

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "id": np.arange(200, dtype=np.int64),
        "v": rng.integers(0, 12, 200),  # heavy ties
    })
    got = (
        value_rank(ray.data.from_pandas(df), "v", "id", ntiles=7, num_partitions=3)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    want = duckdb.sql(
        """SELECT id, v, ROW_NUMBER() OVER (ORDER BY v, id) - 1 AS rnk,
                  NTILE(7) OVER (ORDER BY v, id) AS tile FROM df"""
    ).df().sort_values("id").reset_index(drop=True)
    assert got["rnk"].tolist() == want["rnk"].tolist()
    assert got["tile"].tolist() == want["tile"].tolist()


def test_empty_block_schema_filter_targets_only_empty_schemas():
    import logging

    from kgray.kernels.hashagg import _EmptyBlockSchemaFilter

    f = _EmptyBlockSchemaFilter()

    def rec(msg):
        return logging.LogRecord("x", logging.WARNING, "f.py", 1, msg, (), None)

    # Dropped: the empty-schema variants + the schema-hash notice.
    assert not f.filter(rec(
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: PandasBlockSchema(names=['a'], "
        "types=[dtype('int64')]), new schema: PandasBlockSchema(names=[], "
        "types=[]). This may lead to unexpected behavior."))
    assert not f.filter(rec(
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: a: int64, new schema: . This may "
        "lead to unexpected behavior."))
    assert not f.filter(rec(
        "Failed to hash the schemas (for deduplication): unhashable type: 'dict'"))
    # Kept: a GENUINE non-empty schema conflict and unrelated warnings.
    assert f.filter(rec(
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: a: int64, new schema: a: string. "
        "This may lead to unexpected behavior."))
    assert f.filter(rec("some other warning"))


@given(
    lengths=st.lists(st.integers(min_value=1, max_value=64), min_size=0, max_size=200),
    window=st.sampled_from([16, 64]),
)
@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_bfd_histogram_pack_properties(lengths, window):
    """Invariants for ANY input: every doc assigned once, no bin
    overflow, bins within the BFD 11/9·OPT+1 bound, deterministic."""
    import numpy as np

    from kgray.stages.pack import _bfd_histogram_pack

    arr = np.minimum(np.array(lengths, dtype=np.int64), window)
    bin_of, off_of, n_bins = _bfd_histogram_pack(arr, window)
    assert len(bin_of) == len(arr) and len(off_of) == len(arr)
    if len(arr) == 0:
        assert n_bins == 0
        return
    fills = np.zeros(n_bins, dtype=np.int64)
    np.add.at(fills, bin_of, arr)
    assert fills.max(initial=0) <= window
    assert (off_of + arr <= window).all()
    # per-bin offsets are consistent: sorting a bin's docs by offset
    # reconstructs a prefix sum of its lengths
    for b in range(n_bins):
        sel = np.flatnonzero(bin_of == b)
        o = np.sort(off_of[sel])
        ln = arr[sel][np.argsort(off_of[sel], kind="stable")]
        assert (o == np.concatenate([[0], np.cumsum(ln)[:-1]])).all()
    lb = -(-int(arr.sum()) // window)
    assert n_bins <= (11 * lb) // 9 + 1
    b2, o2, n2 = _bfd_histogram_pack(arr, window)
    assert n2 == n_bins and (b2 == bin_of).all() and (o2 == off_of).all()


@given(
    word_lens=st.lists(st.integers(min_value=1, max_value=6), min_size=1, max_size=30),
    alphabet=st.sampled_from([2, 3]),
    seed=st.integers(min_value=0, max_value=99),
)
@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_apply_merge_matches_python_greedy(word_lens, alphabet, seed):
    """_apply_merge == per-word leftmost-greedy python replacement for
    random small-alphabet words (maximizes self-overlap cases)."""
    import numpy as np

    from kgray.stages.bpe import _apply_merge

    rng = np.random.RandomState(seed)
    words = [rng.randint(97, 97 + alphabet, size=n).tolist() for n in word_lens]
    flat = np.array([s for w in words for s in w], dtype=np.int32)
    offsets = np.concatenate([[0], np.cumsum([len(w) for w in words])]).astype(np.int64)
    a, b = int(rng.randint(97, 97 + alphabet)), int(rng.randint(97, 97 + alphabet))
    Z = 70000
    got_flat, got_off = _apply_merge(flat, offsets, a, b, Z)

    def merge_word(w):
        out, i = [], 0
        while i < len(w):
            if i + 1 < len(w) and w[i] == a and w[i + 1] == b:
                out.append(Z); i += 2
            else:
                out.append(w[i]); i += 1
        return out

    ref = [merge_word(w) for w in words]
    ref_flat = [s for w in ref for s in w]
    ref_off = np.concatenate([[0], np.cumsum([len(w) for w in ref])])
    assert got_flat.tolist() == ref_flat
    assert got_off.tolist() == ref_off.tolist()


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_kth_smallest_matches_sorted(ray_session, data):
    """kth_smallest (histogram-refinement selection) equals the sorted
    answer with multiplicity, across duplicates, skew, and tiny
    collect limits that force multiple refinement rounds."""
    from kgray.kernels.selection import kth_smallest

    n = data.draw(st.integers(min_value=1, max_value=400))
    vals = data.draw(st.lists(
        st.integers(min_value=-10**12, max_value=10**12),
        min_size=n, max_size=n))
    k = data.draw(st.integers(min_value=1, max_value=n))
    ds = ray.data.from_pandas(
        pd.DataFrame({"x": np.array(vals, np.int64)})).repartition(3)
    got = kth_smallest(ds, "x", k, n_buckets=7, collect_limit=5)
    assert got == sorted(vals)[k - 1]


def test_kth_smallest_uint64_hashes(ray_session):
    """Full-range uint64 values (hash columns): driver arithmetic must
    stay arbitrary-precision, batch arithmetic rebases before casting."""
    from kgray.kernels.selection import kth_smallest

    rng = np.random.RandomState(5)
    vals = rng.randint(0, 2**63, size=1000, dtype=np.int64).astype(
        np.uint64) * np.uint64(2) + np.uint64(1)
    ds = ray.data.from_arrow(
        pa.table({"h": pa.array(vals, pa.uint64())})).repartition(4)
    for k in (1, 17, 500, 1000):
        assert kth_smallest(ds, "h", k, n_buckets=16,
                            collect_limit=32) == int(np.sort(vals)[k - 1])
