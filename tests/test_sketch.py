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
