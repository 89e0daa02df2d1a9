"""Skew handling: the salted (pre-distinct) merge path produces output
identical to the plain path on a corpus with a pathological hot key."""

import numpy as np
import pyarrow as pa
import ray.data

from kgray.pipelines.kgx_merge import merge_edges, merge_nodes


def _hot_nodes(n_hot=20000, n_cold=500):
    rng = np.random.RandomState(3)
    ids = ["HOT:1"] * n_hot + [f"C:{i}" for i in range(n_cold)]
    names = [f"name{rng.randint(0, 50)}" for _ in range(n_hot)] + [f"n{i}" for i in range(n_cold)]
    cats = [f"cat{rng.randint(0, 10)}" for _ in range(n_hot + n_cold)]
    prov = [f"src{rng.randint(0, 5)}" for _ in range(n_hot + n_cold)]
    return pa.table(
        {
            "id": pa.array(ids),
            "name": pa.array(names),
            "category": pa.array(cats),
            "provided_by": pa.array(prov),
        }
    )


def _rows(ds):
    return sorted(tuple(sorted(r.items())) for r in ds.take_all())


def test_salted_node_merge_identical(ray_session):
    t = _hot_nodes()
    ds = ray.data.from_arrow(t)
    plain = merge_nodes(ds, priority_sources=["src1"], num_partitions=8)
    salted = merge_nodes(
        ray.data.from_arrow(t), priority_sources=["src1"], num_partitions=8, salted=True
    )
    assert _rows(plain) == _rows(salted)
    hot = [r for r in plain.take_all() if r["id"] == "HOT:1"]
    assert len(hot) == 1 and hot[0]["category"].count("|") == 9  # 10 distinct cats


def test_salted_edge_provenance_identical(ray_session):
    rng = np.random.RandomState(5)
    n = 30000
    t = pa.table(
        {
            "subject": pa.array(["S:hot"] * n),
            "predicate": pa.array(["p"] * n),
            "object": pa.array(["O:1"] * n),
            "knowledge_source": pa.array([f"k{rng.randint(0, 40)}" for _ in range(n)]),
        }
    )
    plain = merge_edges(ray.data.from_arrow(t), provenance=True, num_partitions=8)
    salted = merge_edges(ray.data.from_arrow(t), provenance=True, num_partitions=8, salted=True)
    assert _rows(plain) == _rows(salted)
    out = plain.take_all()
    assert len(out) == 1 and out[0]["knowledge_source"].count("|") == 39


def test_range_rank_multiblock_and_duplicates(ray_session):
    """Multi-block input (the np.add.at regression: concatenated count
    tables repeat partition ids) + heavy duplicate values (boundary
    tie-refine by id)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from kgray.stages.split import range_rank

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "id": np.arange(2000),
        "v": np.round(rng.normal(0, 3, 2000), 0),  # few distinct → ties
    })
    ds = ray.data.from_pandas(df).repartition(13)
    got = (range_rank(ds, value_col="v", id_col="id", num_partitions=7)
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = df.sort_values(["v", "id"], kind="mergesort").reset_index(drop=True)
    exp_rnk = pd.Series(range(len(exp)), index=exp["id"]).sort_index().to_numpy()
    assert (got["rnk"].to_numpy() == exp_rnk).all()


def test_ntile_matches_sql_buckets(ray_session):
    """NTILE closed form vs DuckDB on an uneven total (total % n != 0
    → big and small buckets both exercised), multi-block input."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data

    from kgray.stages.split import ntile

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"id": np.arange(1003), "v": rng.normal(0, 1, 1003)})
    ds = ray.data.from_pandas(df).repartition(9)
    got = (ntile(ds, value_col="v", id_col="id", n=7, num_partitions=5)
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT id, CAST(NTILE(7) OVER (ORDER BY v, id) AS BIGINT) AS bucket
        FROM df ORDER BY id
    """).df()
    assert (got["bucket"].to_numpy() == exp["bucket"].to_numpy()).all()


def test_ntile_more_buckets_than_rows(ray_session):
    """total < n: SQL gives each row its own bucket 1..total — the
    closed form's divmod edge (size_small == 0)."""
    import pandas as pd
    import ray.data

    from kgray.stages.split import ntile

    df = pd.DataFrame({"id": [3, 1, 2], "v": [30.0, 10.0, 20.0]})
    got = (ntile(ray.data.from_pandas(df), value_col="v", id_col="id",
                 n=10, num_partitions=2)
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert got["bucket"].tolist() == [1, 2, 3]


def test_mix_corpus_proportions_and_determinism(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from kgray.stages.split import mix_corpus

    rng = np.random.default_rng(23)
    df = pd.DataFrame({
        "id": np.arange(3000),
        "d": rng.choice(["web", "code", "books"], 3000, p=[0.7, 0.2, 0.1]),
    })
    w = {"web": 0.5, "code": 0.3, "books": 0.2}
    got = (mix_corpus(ray.data.from_pandas(df), domain_col="d", id_col="id",
                      weights=w, num_partitions=4)
           .to_pandas().sort_values("id").reset_index(drop=True))
    nd = df["d"].value_counts()
    T = min(nd[d] / ww for d, ww in w.items())
    for d, ww in w.items():
        assert (got["d"] == d).sum() == int(ww * T // 1)
    # Deterministic: second run identical.
    again = (mix_corpus(ray.data.from_pandas(df), domain_col="d", id_col="id",
                        weights=w, num_partitions=7)
             .to_pandas().sort_values("id").reset_index(drop=True))
    assert got["id"].tolist() == again["id"].tolist()


def test_hot_key_exchange_correctness(ray_session):
    """A single key holding 90% of rows must survive the keyed
    exchanges unchanged (the combiner absorbs duplicate mass before
    the shuffle; the reduce sees the whole key)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from kgray.kernels.hashagg import grouped_apply

    rng = np.random.default_rng(41)
    n = 20000
    hot = rng.random(n) < 0.9
    df = pd.DataFrame({
        "k": np.where(hot, 7, rng.integers(0, 50, n)),
        "v": rng.integers(0, 5, n),
    })

    def _distinct(d):
        return d.drop_duplicates()

    def _agg(d):
        d = d.drop_duplicates().sort_values(["k", "v"], kind="mergesort")
        g = d.groupby("k", sort=False)["v"].agg(lambda s: "|".join(map(str, s)))
        return g.rename("vs").reset_index()

    got = (grouped_apply(ray.data.from_pandas(df).repartition(16), ["k"], _agg,
                         num_partitions=8, map_side=_distinct)
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = (df.drop_duplicates().sort_values(["k", "v"])
           .groupby("k")["v"].agg(lambda s: "|".join(map(str, s)))
           .rename("vs").reset_index())
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True))
