"""asof_join / range_join vs brute-force references."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from kgray.stages.joins import asof_join, range_join


def _asof_corpus(seed=3, n_left=400, n_right=300, n_keys=20):
    rng = np.random.RandomState(seed)
    left = pa.table(
        {
            "u": pa.array(rng.randint(0, n_keys, n_left), type=pa.int64()),
            "ts": pa.array(rng.randint(0, 10_000, n_left), type=pa.int64()),
            "cid": pa.array(np.arange(n_left), type=pa.int64()),
        }
    )
    # unique (u, ts) on the right → deterministic as-of match
    seen = set()
    u, ts, vid = [], [], []
    while len(u) < n_right:
        k = (int(rng.randint(0, n_keys)), int(rng.randint(0, 10_000)))
        if k in seen:
            continue
        seen.add(k)
        u.append(k[0])
        ts.append(k[1])
        vid.append(1000 + len(vid))
    right = pa.table(
        {
            "u": pa.array(u, type=pa.int64()),
            "ts": pa.array(ts, type=pa.int64()),
            "vid": pa.array(vid, type=pa.int64()),
        }
    )
    return left, right


def test_asof_join_matches_bruteforce(ray_session):
    left, right = _asof_corpus()
    got = (
        asof_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            by="u",
            on="ts",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("cid")
        .reset_index(drop=True)
    )
    ld, rd = left.to_pandas(), right.to_pandas()
    want_vid = []
    for _, row in ld.iterrows():
        cand = rd[(rd["u"] == row["u"]) & (rd["ts"] <= row["ts"])]
        want_vid.append(None if len(cand) == 0 else int(cand.loc[cand["ts"].idxmax(), "vid"]))
    want = ld.assign(vid=pd.array(want_vid, dtype="Int64")).sort_values("cid").reset_index(drop=True)
    assert list(got.columns) == ["u", "ts", "cid", "vid"]
    assert got["cid"].tolist() == want["cid"].tolist()
    got_v = [None if pd.isna(v) else int(v) for v in got["vid"]]
    want_v = [None if pd.isna(v) else int(v) for v in want["vid"]]
    assert got_v == want_v


def test_range_join_matches_bruteforce(ray_session):
    rng = np.random.RandomState(11)
    left = pa.table(
        {
            "lid": pa.array(np.arange(200), type=pa.int64()),
            "value": pa.array(rng.uniform(0, 100, 200), type=pa.float64()),
        }
    )
    lo = rng.uniform(0, 90, 30)
    right = pa.table(
        {
            "band": pa.array(np.arange(30), type=pa.int64()),
            "lo": pa.array(lo, type=pa.float64()),
            "hi": pa.array(lo + rng.uniform(1, 15, 30), type=pa.float64()),
        }
    )
    got = (
        range_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            value_col="value",
            lo_col="lo",
            hi_col="hi",
            bucket_width=8.0,
            num_partitions=4,
        )
        .to_pandas()
    )
    pairs = sorted(zip(got["lid"], got["band"]))
    assert len(pairs) == len(set(pairs))  # no duplicate matches across buckets? see below
    ld, rd = left.to_pandas(), right.to_pandas()
    want = sorted(
        (int(l.lid), int(r.band))
        for _, l in ld.iterrows()
        for _, r in rd.iterrows()
        if r.lo <= l.value <= r.hi
    )
    assert pairs == want


def test_asof_join_empty_right(ray_session):
    """No right rows at all → every left row keeps NULL enrichment."""
    left = pa.table(
        {
            "u": pa.array([1, 2], type=pa.int64()),
            "ts": pa.array([10, 20], type=pa.int64()),
            "cid": pa.array([0, 1], type=pa.int64()),
        }
    )
    right = pa.table(
        {
            "u": pa.array([], type=pa.int64()),
            "ts": pa.array([], type=pa.int64()),
            "vid": pa.array([], type=pa.int64()),
        }
    )
    got = (
        asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right), by="u", on="ts", num_partitions=2)
        .to_pandas()
        .sort_values("cid")
    )
    assert len(got) == 2 and got["vid"].isna().all()


def test_range_join_negative_values(ray_session):
    """Bucketing uses floor (not truncation): negative values/intervals
    land in the right buckets."""
    left = pa.table(
        {
            "lid": pa.array([0, 1, 2], type=pa.int64()),
            "value": pa.array([-5.5, -0.1, 3.0], type=pa.float64()),
        }
    )
    right = pa.table(
        {
            "band": pa.array([0, 1], type=pa.int64()),
            "lo": pa.array([-6.0, -1.0], type=pa.float64()),
            "hi": pa.array([-5.0, 4.0], type=pa.float64()),
        }
    )
    got = range_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        value_col="value", lo_col="lo", hi_col="hi", bucket_width=2.0, num_partitions=2,
    ).to_pandas()
    pairs = sorted(zip(got["lid"], got["band"]))
    assert pairs == [(0, 0), (1, 1), (2, 1)]


def test_range_join_colliding_right_cols(ray_session):
    """Right value columns sharing a left column's name come back
    suffixed (ADVICE r2: a silent overwrite produced wrong values)."""
    left = pa.table(
        {
            "v": pa.array([5.0, 15.0], type=pa.float64()),
            "tag": pa.array(["L0", "L1"], type=pa.string()),
        }
    )
    right = pa.table(
        {
            "lo": pa.array([0.0, 10.0], type=pa.float64()),
            "hi": pa.array([9.0, 19.0], type=pa.float64()),
            "tag": pa.array(["R0", "R1"], type=pa.string()),
        }
    )
    out = range_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        value_col="v",
        lo_col="lo",
        hi_col="hi",
        bucket_width=10.0,
        num_partitions=2,
    ).to_pandas().sort_values("v").reset_index(drop=True)
    assert list(out.columns) == ["v", "tag", "lo", "hi", "tag_right"]
    assert out["tag"].tolist() == ["L0", "L1"]
    assert out["tag_right"].tolist() == ["R0", "R1"]


def test_range_join_bound_collision_raises(ray_session):
    left = pa.table({"lo": pa.array([1.0]), "x": pa.array([2.0])})
    right = pa.table({"lo": pa.array([0.0]), "hi": pa.array([5.0])})
    import pytest

    with pytest.raises(ValueError, match="collide"):
        range_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            value_col="x",
            lo_col="lo",
            hi_col="hi",
        )


def test_edit_distance_pairs_vs_duckdb(ray_session):
    """Randomized check vs DuckDB's exact levenshtein: substitutions,
    insertions, deletions, exact dups, and ed=2 decoys all covered."""
    import random
    import string

    import duckdb

    from kgray.stages.joins import edit_distance_pairs

    random.seed(7)
    rows, i = [], 0
    for _ in range(250):
        s = "".join(random.choices(string.ascii_lowercase, k=random.randint(1, 14)))
        rows.append((i, s)); i += 1
        r = random.random()
        if r < 0.25:
            p = random.randrange(len(s))
            rows.append((i, s[:p] + random.choice(string.ascii_lowercase) + s[p + 1:])); i += 1
        elif r < 0.45:
            p = random.randrange(len(s))
            rows.append((i, s[:p] + s[p + 1:])); i += 1
        elif r < 0.65:
            p = random.randrange(len(s) + 1)
            rows.append((i, s[:p] + random.choice(string.ascii_lowercase) + s[p:])); i += 1
        elif r < 0.75:
            rows.append((i, s)); i += 1
        elif r < 0.9:
            t = list(s + "QZ")
            rows.append((i, "".join(t[::-1]))); i += 1
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    got = (
        edit_distance_pairs(ray.data.from_pandas(df), num_partitions=4)
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    exp = duckdb.sql(
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM df a JOIN df b "
        "ON a.doc_id < b.doc_id AND levenshtein(a.text, b.text) <= 1 ORDER BY 1, 2"
    ).df()
    assert got.astype("int64").equals(exp.astype("int64"))
    assert len(exp) > 100


def test_merge_intervals_touching_and_nested(ray_session):
    import ray.data

    from kgray.stages.analytics import merge_intervals

    df = pd.DataFrame({
        "k": ["a", "a", "a", "a", "b", "b"],
        # a: [0,10) [10,20) touch-merge; [2,5) nested (no island);
        #    [30,40) separate. b: one interval + disjoint second.
        "lo": [0, 10, 2, 30, 100, 200],
        "hi": [10, 20, 5, 40, 150, 210],
    })
    got = (
        merge_intervals(ray.data.from_pandas(df), key="k", lo_col="lo",
                        hi_col="hi", num_partitions=3)
        .to_pandas().sort_values(["k", "start_ts"]).reset_index(drop=True)
    )
    exp = pd.DataFrame({
        "k": ["a", "a", "b", "b"],
        "start_ts": [0, 30, 100, 200],
        "end_ts": [20, 40, 150, 210],
        "n_rows": [3, 1, 1, 1],
    })
    pd.testing.assert_frame_equal(
        got.astype({"n_rows": "int64"}), exp.astype({"n_rows": "int64"}),
        check_dtype=False)


def test_window_dedup_lag_rule(ray_session):
    import ray.data

    from kgray.stages.analytics import window_dedup

    df = pd.DataFrame({
        "k": ["a"] * 4 + ["b"],
        "t": pd.to_datetime([0, 100, 150, 400, 0], unit="s"),
        "i": [0, 1, 2, 3, 4],
    })
    got = (
        window_dedup(ray.data.from_pandas(df), keys=["k"], ts_col="t",
                     window_us=200_000_000, tiebreak_col="i", num_partitions=2)
        .to_pandas().sort_values("i").reset_index(drop=True)
    )
    # LAG rule: row1 (100s after row0) dropped, row2 (50s after row1)
    # dropped even though row1 itself was dropped, row3 (250s) kept.
    assert got["i"].tolist() == [0, 3, 4]
