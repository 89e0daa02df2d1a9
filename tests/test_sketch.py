"""HyperLogLog sketch: error bound, merge associativity, determinism."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from kgray.stages.sketch import approx_distinct, hll_estimate, hll_registers


@pytest.mark.parametrize("true_n", [100, 5_000, 100_000])
def test_hll_error_bound(true_n):
    h = pd.util.hash_pandas_object(
        pd.Series(np.arange(true_n)), index=False
    ).to_numpy().astype(np.uint64)
    est = hll_estimate(hll_registers(h, 12))
    assert abs(est - true_n) / true_n < 0.05  # 3σ for b=12 is ~4.9%


def test_hll_merge_equals_whole():
    h = pd.util.hash_pandas_object(
        pd.Series([f"v{i}" for i in range(10_000)]), index=False
    ).to_numpy().astype(np.uint64)
    whole = hll_registers(h, 12)
    parts = np.maximum.reduce([hll_registers(p, 12) for p in np.array_split(h, 7)])
    assert (whole == parts).all()


def test_approx_distinct_dataset(ray_session):
    rows = [{"v": i % 1000} for i in range(20_000)]
    ds = ray.data.from_items(rows)
    est = approx_distinct(ds, "v", b=12)
    assert abs(est - 1000) / 1000 < 0.05
    # Deterministic: same input -> identical estimate.
    assert est == approx_distinct(ray.data.from_items(rows), "v", b=12)


def test_approx_distinct_ignores_nulls(ray_session):
    ds = ray.data.from_items([{"v": None}] * 50 + [{"v": 1}, {"v": 2}])
    est = approx_distinct(ds, "v", b=12)
    assert 1.5 < est < 2.5


def test_approx_quantiles_error_bound(ray_session):
    import numpy as np
    import ray.data

    from kgray.stages.sketch import approx_quantiles

    rng = np.random.RandomState(7)
    vals = rng.lognormal(3.0, 1.0, size=20000)
    ds = ray.data.from_items([{"v": float(x)} for x in vals])
    out = approx_quantiles(ds, "v", qs=(0.1, 0.5, 0.9, 0.99), bins=2048)
    srt = np.sort(vals)
    for _, row in out.iterrows():
        exact = srt[max(1, int(np.ceil(row["q"] * len(vals)))) - 1]
        assert abs(row["value"] - exact) <= row["max_err"] + 1e-9
    assert (out["n"] == len(vals)).all()


def test_approx_quantiles_constant_column(ray_session):
    import ray.data

    from kgray.stages.sketch import approx_quantiles

    ds = ray.data.from_items([{"v": 5.0}] * 100)
    out = approx_quantiles(ds, "v", qs=(0.5,), bins=64)
    # zero range → width falls back to 1.0; estimate within one bin.
    assert abs(out["value"].iloc[0] - 5.0) <= out["max_err"].iloc[0] + 1e-9


def test_bloom_no_false_negatives_and_fpr():
    import numpy as np

    from kgray.stages.sketch import bloom_fold, bloom_params, bloom_probe

    rng = np.random.default_rng(7)
    members = rng.integers(0, 2**63, 20_000, dtype=np.uint64)
    m, k = bloom_params(len(members), fpr=1e-3)
    bm = bloom_fold(members, m, k)
    assert bloom_probe(members, bm, k).all()  # zero false negatives
    probes = rng.integers(0, 2**63, 50_000, dtype=np.uint64)
    fresh = probes[~np.isin(probes, members)]
    fp = bloom_probe(fresh, bm, k).mean()
    assert fp <= 5e-3, fp  # ~1e-3 nominal; 5x slack


def test_bloom_partials_merge_by_or():
    import numpy as np

    from kgray.stages.sketch import bloom_fold, bloom_params, bloom_probe

    rng = np.random.default_rng(11)
    a = rng.integers(0, 2**63, 5_000, dtype=np.uint64)
    b = rng.integers(0, 2**63, 5_000, dtype=np.uint64)
    m, k = bloom_params(10_000, fpr=1e-4)
    merged = np.bitwise_or(bloom_fold(a, m, k), bloom_fold(b, m, k))
    whole = bloom_fold(np.concatenate([a, b]), m, k)
    assert np.array_equal(merged, whole)
    assert bloom_probe(np.concatenate([a, b]), merged, k).all()


def test_count_min_never_undercounts_and_merges():
    import numpy as np
    import pandas as pd

    from kgray.stages.sketch import count_min_fold, count_min_params, count_min_query

    rng = np.random.default_rng(3)
    # Zipf-ish multiset of 50k draws over 5k distinct keys.
    keys = rng.zipf(1.5, 50_000) % 5_000
    h = pd.util.hash_pandas_object(pd.Series(keys), index=False).to_numpy().astype(np.uint64)
    w, d = count_min_params(eps=1e-3, delta=1e-3)
    half = len(h) // 2
    vc1 = pd.Series(h[:half]).value_counts()
    vc2 = pd.Series(h[half:]).value_counts()
    merged = count_min_fold(vc1.index.to_numpy(np.uint64), vc1.to_numpy(), w, d) + \
        count_min_fold(vc2.index.to_numpy(np.uint64), vc2.to_numpy(), w, d)
    whole_vc = pd.Series(h).value_counts()
    whole = count_min_fold(whole_vc.index.to_numpy(np.uint64), whole_vc.to_numpy(), w, d)
    assert np.array_equal(merged, whole)  # partials merge by sum
    est = count_min_query(whole_vc.index.to_numpy(np.uint64), whole)
    true = whole_vc.to_numpy()
    assert (est >= true).all()
    # eps*N additive bound (allow the delta failure fraction)
    frac_bad = ((est - true) > 1e-3 * len(h)).mean()
    assert frac_bad <= 1e-2, frac_bad


def test_grouped_quantiles_cont_vs_duckdb(ray_session):
    import duckdb
    import ray.data

    from kgray.stages.sketch import grouped_quantiles_cont

    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "g": rng.integers(0, 12, 600),
        "v": rng.normal(50, 20, 600),
    })
    # Singleton group: every quantile = the single value.
    df = pd.concat([df, pd.DataFrame({"g": [77], "v": [42.0]})], ignore_index=True)
    got = (
        grouped_quantiles_cont(ray.data.from_pandas(df), key="g", value_col="v",
                               qs=(0.25, 0.5, 0.99), num_partitions=4)
        .to_pandas().sort_values(["g", "q"]).reset_index(drop=True)
    )
    exp = duckdb.sql("""
        SELECT g, CAST(0.25 AS DOUBLE) AS q, ROUND(quantile_cont(v, 0.25), 6) AS value FROM df GROUP BY g
        UNION ALL SELECT g, 0.5, ROUND(quantile_cont(v, 0.5), 6) FROM df GROUP BY g
        UNION ALL SELECT g, 0.99, ROUND(quantile_cont(v, 0.99), 6) FROM df GROUP BY g
        ORDER BY g, q
    """).df()
    assert np.allclose(got["value"], exp["value"])
    assert (got[got["g"] == 77]["value"] == 42.0).all()


def test_grouped_approx_quantiles_rank_guarantee(ray_session):
    import ray.data

    from kgray.stages.sketch import grouped_approx_quantiles

    rng = np.random.default_rng(21)
    # Heavy-tailed + a sparse group: the case where value-space bounds
    # break but the rank guarantee must hold.
    df = pd.DataFrame({
        "g": np.concatenate([np.zeros(5000, np.int64), np.ones(40, np.int64)]),
        "v": np.concatenate([rng.exponential(10, 5000), rng.normal(0, 1, 40)]),
    })
    got = grouped_approx_quantiles(ray.data.from_pandas(df), key="g",
                                   value_col="v", qs=(0.5, 0.99), n_bins=512,
                                   num_partitions=3)
    for _, r in got.iterrows():
        sub = np.sort(df.loc[df["g"] == r["g"], "v"].to_numpy())
        target = (len(sub) - 1) * r["q"]
        n_lt = int((sub < r["value_est"]).sum())
        n_le = int((sub <= r["value_est"]).sum())
        assert n_lt - r["bin_n"] - 1 <= target <= n_le + r["bin_n"] + 1
    # Dense group: value error within ~1 bin width too.
    dense = got[(got["g"] == 0) & (got["q"] == 0.5)].iloc[0]
    exact = np.quantile(df.loc[df["g"] == 0, "v"].to_numpy(), 0.5)
    width = (df.loc[df["g"] == 0, "v"].max() - df.loc[df["g"] == 0, "v"].min()) / 512
    assert abs(dense["value_est"] - exact) <= 2 * width


def test_grouped_approx_quantiles_ignores_nulls(ray_session):
    """Nulls carry no rank information: a group with 50% NaN must
    estimate quantiles of its non-null values only (not a low tail
    inflated by NaN→bin-0 casts), and an all-null group vanishes —
    matching grouped_quantiles_cont's dropna semantics."""
    import ray.data

    from kgray.stages.sketch import grouped_approx_quantiles

    rng = np.random.default_rng(77)
    vals = rng.uniform(100, 200, 2000)
    df = pd.DataFrame({
        "g": np.concatenate([np.zeros(4000, np.int64), np.full(30, 9, np.int64)]),
        "v": np.concatenate([vals, np.full(2000, np.nan), np.full(30, np.nan)]),
    })
    got = grouped_approx_quantiles(ray.data.from_pandas(df), key="g",
                                   value_col="v", qs=(0.1, 0.5), n_bins=256,
                                   num_partitions=3)
    assert set(got["g"]) == {0}  # all-null group 9 emits nothing
    for _, r in got.iterrows():
        assert r["n"] == 2000  # non-null count, not group size
        exact = np.quantile(vals, r["q"])
        width = (vals.max() - vals.min()) / 256
        assert abs(r["value_est"] - exact) <= 2 * width, (r["q"], r["value_est"], exact)


def test_grouped_approx_distinct_accuracy(ray_session):
    import ray.data

    from kgray.stages.sketch import grouped_approx_distinct

    rng = np.random.default_rng(31)
    df = pd.DataFrame({
        "g": np.repeat(["a", "b"], 20000),
        "v": np.concatenate([rng.integers(0, 5000, 20000),
                             rng.integers(0, 37, 20000)]),
    })
    got = grouped_approx_distinct(ray.data.from_pandas(df), key="g", col="v", b=12)
    exact = df.groupby("g")["v"].nunique()
    for _, r in got.iterrows():
        e = exact[r["g"]]
        assert abs(r["n_distinct_est"] - e) / e <= 0.05, (r["g"], r["n_distinct_est"], e)
