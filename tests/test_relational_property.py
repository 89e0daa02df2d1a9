"""Property-based equivalence for the round-3 relational operators:
semi/anti join and ROLLUP vs DuckDB on random inputs (NULL keys,
duplicate keys, empty sides all reachable by generation)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kgray.stages.relational import hash_join, rollup_aggregate

_keys = st.one_of(st.none(), st.integers(min_value=0, max_value=6))


@st.composite
def _sides(draw):
    nl = draw(st.integers(min_value=0, max_value=20))
    nr = draw(st.integers(min_value=0, max_value=20))
    left = pd.DataFrame({
        "k": pd.array([draw(_keys) for _ in range(nl)], dtype="Int64"),
        "lv": np.arange(nl, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": pd.array([draw(_keys) for _ in range(nr)], dtype="Int64"),
        "rv": np.arange(nr, dtype=np.int64),
    })
    return left, right


def _rows(df: pd.DataFrame) -> list:
    df = df.copy()
    for c in df.columns:
        df[c] = df[c].astype("float64")  # NULL-safe uniform compare
    return sorted(map(tuple, df.fillna(-1.0).to_numpy().tolist()))


@pytest.mark.parametrize("how,sql", [
    ("semi", "SELECT l.* FROM l WHERE EXISTS (SELECT 1 FROM r WHERE r.k = l.k)"),
    ("anti", "SELECT l.* FROM l WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.k = l.k)"),
])
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(sides=_sides())
def test_semi_anti_matches_duckdb(ray_session, how, sql, sides):
    left, right = sides
    got = hash_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        on="k", how=how, num_partitions=3,
    ).to_pandas()
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute(sql).df()
    if len(got) == 0 and len(want) == 0:
        return
    assert _rows(got[["k", "lv"]]) == _rows(want[["k", "lv"]])


@st.composite
def _grouped(draw):
    n = draw(st.integers(min_value=0, max_value=40))
    return pd.DataFrame({
        "a": [draw(st.sampled_from(["x", "y", "z"])) for _ in range(n)],
        "b": [draw(st.sampled_from(["p", "q"])) for _ in range(n)],
        "v": [draw(st.integers(min_value=-50, max_value=50)) for _ in range(n)],
    }).astype({"v": "float64"})


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(df=_grouped())
def test_rollup_matches_duckdb(ray_session, df):
    got = rollup_aggregate(
        ray.data.from_pandas(df) if len(df) else ray.data.from_pandas(df.head(0)),
        ["a", "b"], "v", num_partitions=3,
    ).to_pandas() if len(df) else None
    if got is None:
        return  # empty-input shape covered by unit tests
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_rows, SUM(v) AS sum_value "
        "FROM t GROUP BY ROLLUP (a, b)"
    ).df()
    key = ["a", "b", "n_rows", "sum_value"]
    ga = got[key].fillna("~").sort_values(key).reset_index(drop=True)
    wa = want[key].fillna("~").sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(ga, wa, check_dtype=False)


def test_semi_anti_nullable_int64_keys(ray_session):
    """Regression: pandas nullable Int64 keys — Ray's Schema.types drops
    the extension dtype (None), and pa.from_numpy_dtype(None) is float64,
    so the right side's keys used to hash into different partitions than
    the left's int64 keys (semi returned empty, anti returned everything)."""
    left = pd.DataFrame({"k": pd.array([1, 2, None], dtype="Int64"),
                         "lv": np.arange(3, dtype=np.int64)})
    right = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"),
                          "rv": np.arange(2, dtype=np.int64)})
    semi = hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                     on="k", how="semi", num_partitions=3).to_pandas()
    anti = hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                     on="k", how="anti", num_partitions=3).to_pandas()
    assert _rows(semi[["k", "lv"]]) == [(1.0, 0.0)]
    # NULL left keys match nothing -> kept by anti (NOT EXISTS semantics).
    assert _rows(anti[["k", "lv"]]) == [(-1.0, 2.0), (2.0, 1.0)]


@st.composite
def _intervals(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    lo = [draw(st.integers(min_value=0, max_value=50)) for _ in range(n)]
    length = [draw(st.integers(min_value=0, max_value=20)) for _ in range(n)]
    return pd.DataFrame({
        "k": [draw(st.integers(min_value=0, max_value=3)) for _ in range(n)],
        "lo": np.asarray(lo, dtype=np.int64),
        "hi": np.asarray(lo, dtype=np.int64) + np.asarray(length, dtype=np.int64),
    })


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(df=_intervals())
def test_merge_intervals_matches_duckdb(ray_session, df):
    from kgray.stages.analytics import merge_intervals

    got = (merge_intervals(ray.data.from_pandas(df), key="k", lo_col="lo",
                           hi_col="hi", num_partitions=3)
           .to_pandas())
    con = duckdb.connect()
    con.register("iv", df)
    want = con.execute("""
        WITH m AS (
          SELECT k, lo, hi,
            CASE WHEN lo > MAX(hi) OVER (PARTITION BY k ORDER BY lo, hi
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            THEN 1 ELSE 0 END AS ni
          FROM iv
        ), g AS (
          SELECT k, lo, hi,
            SUM(ni) OVER (PARTITION BY k ORDER BY lo, hi
                          ROWS UNBOUNDED PRECEDING) AS island
          FROM m
        )
        SELECT k, MIN(lo) AS start_ts, MAX(hi) AS end_ts,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM g GROUP BY k, island
    """).df()
    assert _rows(got) == _rows(want)


@st.composite
def _events(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    return pd.DataFrame({
        "k": [draw(st.integers(min_value=0, max_value=3)) for _ in range(n)],
        "t": np.asarray([draw(st.integers(min_value=0, max_value=100))
                         for _ in range(n)], dtype=np.int64),
        "i": np.arange(n, dtype=np.int64),
    })


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(df=_events())
def test_window_dedup_matches_duckdb(ray_session, df):
    from kgray.stages.analytics import window_dedup

    got = (window_dedup(ray.data.from_pandas(df), keys=["k"], ts_col="t",
                        window_us=10, tiebreak_col="i", num_partitions=3)
           .to_pandas())
    con = duckdb.connect()
    con.register("e", df)
    want = con.execute("""
        SELECT k, t, i FROM (
          SELECT k, t, i,
                 LAG(t) OVER (PARTITION BY k ORDER BY t, i) AS pt
          FROM e) s
        WHERE pt IS NULL OR t - pt > 10
    """).df()
    assert _rows(got[["k", "t", "i"]]) == _rows(want)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(df=_events())
def test_rolling_zscore_matches_duckdb(ray_session, df):
    from kgray.stages.analytics import rolling_zscore

    df = df.assign(v=(df["t"] * 7 % 53).astype("float64") / 2.0)
    got = (rolling_zscore(ray.data.from_pandas(df), key="k", ts_col="t",
                          value_col="v", tiebreak_col="i", window=4,
                          num_partitions=3)
           .to_pandas())
    con = duckdb.connect()
    con.register("e", df)
    want = con.execute("""
        WITH f AS (
          SELECT i, CAST(FLOOR(v * 100) AS BIGINT) AS vi,
                 CAST(SUM(CAST(FLOOR(v * 100) AS BIGINT)) OVER w AS BIGINT) AS s,
                 CAST(SUM(CAST(FLOOR(v * 100) AS BIGINT)
                          * CAST(FLOOR(v * 100) AS BIGINT)) OVER w AS BIGINT) AS sq,
                 CAST(COUNT(*) OVER w AS BIGINT) AS n
          FROM e WINDOW w AS (PARTITION BY k ORDER BY t, i
                              ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING)
        )
        SELECT i, CASE WHEN n >= 2 AND sq - CAST(s AS DOUBLE) * s / n > 0
               THEN ROUND((vi - CAST(s AS DOUBLE) / n)
                          / SQRT((sq - CAST(s AS DOUBLE) * s / n) / (n - 1.0)), 6)
               ELSE NULL END AS z
        FROM f
    """).df()
    g = got.sort_values("i")["z"].to_numpy()
    w = want.sort_values("i")["z"].to_numpy()
    both_nan = np.isnan(g) & np.isnan(w)
    assert (both_nan | (g == w)).all()


def test_rolling_zscore_huge_values_no_int64_wrap(ray_session):
    """Values with |floor(v·100)| > ~9.6e8 would wrap the int64
    sum-of-squares under the old accumulator; the float64 fallback must
    produce the mathematically correct z, not wraparound garbage."""
    from kgray.stages.analytics import rolling_zscore

    base = 2.5e7  # vi ≈ 2.5e9, vi² ≈ 6.25e18 — two terms overflow int64
    vals = np.array([base, base * 1.1, base * 0.9, base * 1.05, base])
    df = pd.DataFrame({"k": [1] * 5, "t": range(5), "i": range(5), "v": vals})
    got = (rolling_zscore(ray.data.from_pandas(df), key="k", ts_col="t",
                          value_col="v", tiebreak_col="i", window=10,
                          num_partitions=1)
           .to_pandas().sort_values("i"))
    vi = np.floor(vals * 100.0)
    z = got["z"].to_numpy()
    assert np.isnan(z[0]) and np.isnan(z[1])  # history < 2
    for j in range(2, 5):
        hist = vi[:j]
        want = (vi[j] - hist.mean()) / hist.std(ddof=1)
        assert abs(z[j] - want) < 1e-4, (j, z[j], want)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(df=_events())
def test_grouped_ewma_matches_duckdb(ray_session, df):
    from kgray.stages.analytics import grouped_ewma

    df = df.assign(v=(df["t"] * 3 % 17).astype("float64"))
    got = (grouped_ewma(ray.data.from_pandas(df), key="k", ts_col="t",
                        value_col="v", tiebreak_col="i", decay=0.5,
                        window=4, num_partitions=3)
           .to_pandas())
    con = duckdb.connect()
    con.register("e", df)
    want = con.execute("""
        WITH r AS (SELECT k, i, v,
                   ROW_NUMBER() OVER (PARTITION BY k ORDER BY t, i) AS rn FROM e)
        SELECT a.i,
          ROUND(SUM(b.v * POWER(0.5, a.rn - b.rn)) / SUM(POWER(0.5, a.rn - b.rn)), 4) AS ewma
        FROM r a JOIN r b ON b.k = a.k AND b.rn BETWEEN a.rn - 3 AND a.rn
        GROUP BY a.i
    """).df()
    g = got.sort_values("i")["ewma"].to_numpy()
    w = want.sort_values("i")["ewma"].to_numpy()
    assert np.allclose(g, w, atol=1e-9)
