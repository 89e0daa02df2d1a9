"""Deterministic dataset splitting for training pipelines.

The reference's ``holdout_split`` CLI hook is unimplemented upstream
(run.py:273 raises) — this is the operator it promises: a stable,
shuffle-free train/holdout assignment by content hash of the id, so the
same row lands in the same split on every run, on any cluster, with no
coordination. One ``map_batches`` pass; SQL-expressible
(``('0x' || substr(md5(id), 1, 8))::UBIGINT % 100``) so the driver
oracle checks it exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset


def hash_split(
    ds: Dataset,
    id_col: str,
    holdout_pct: int = 10,
    split_col: str = "split",
    salt: str = "",
) -> Dataset:
    """Append ``split`` ∈ {'holdout', 'train'}: rows whose
    ``md5(salt + str(id))`` first-8-hex-digit value mod 100 falls below
    ``holdout_pct`` go to the holdout. Pure per-row function of the id —
    resumable, cluster-size-independent, join-free."""

    def _assign(t: pa.Table) -> pa.Table:
        # md5 is pinned by the oracle; run it once per DISTINCT id and
        # broadcast the verdicts back with a take (ids repeat across
        # epochs/shards more often than not, and the factorize +
        # boolean-select path avoids a Python branch per row).
        import numpy as np
        import pandas as pd

        ids = t.column(id_col).to_pylist()
        codes, uniques = pd.factorize(np.asarray(ids, dtype=object))
        hold = np.fromiter(
            (
                int(hashlib.md5((salt + str(i)).encode("utf-8")).hexdigest()[:8], 16) % 100
                < holdout_pct
                for i in uniques.tolist()
            ),
            dtype=bool,
            count=len(uniques),
        )
        # factorize maps None → code -1; hash str(None) for those rows
        # (same as the per-row form did).
        if (codes < 0).any():
            none_hold = (
                int(hashlib.md5((salt + str(None)).encode("utf-8")).hexdigest()[:8], 16) % 100
                < holdout_pct
            )
            per_row = hold[np.clip(codes, 0, None)]
            per_row = np.where(codes < 0, none_hold, per_row)
        else:
            per_row = hold[codes]
        labels = np.where(per_row, "holdout", "train")
        return t.append_column(split_col, pa.array(labels.tolist(), type=pa.string()))

    return ds.map_batches(_assign, batch_format="pyarrow")


def stratified_sample(
    ds: Dataset,
    strata_col: str,
    rates: dict,
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "",
) -> Dataset:
    """Deterministic per-stratum downsampling — the data-mixing
    primitive of a web-scale curation pipeline (e.g. keep 10% of 'en',
    50% of every low-resource language).

    A row survives iff ``md5(salt + str(id))`` first-8-hex mod 10000 <
    ``rates[stratum] * 10000``. Same hash family as :func:`hash_split`,
    so samples are stable across runs/clusters, nested (a 0.1 sample is
    a subset of a 0.5 sample), and disjointness with holdout splits can
    be arranged via the salt. One map_batches pass, shuffle-free; the
    md5 runs once per distinct id per batch.
    """

    def _keep(t: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        ids = t.column(id_col).to_pylist()
        codes, uniques = pd.factorize(np.asarray(ids, dtype=object))
        hv = np.fromiter(
            (
                int(hashlib.md5((salt + str(i)).encode("utf-8")).hexdigest()[:8], 16) % 10000
                for i in uniques.tolist()
            ),
            dtype=np.int64,
            count=len(uniques),
        )
        per_row = hv[np.clip(codes, 0, None)]
        strata = np.asarray(t.column(strata_col).to_pylist(), dtype=object)
        thresh = np.fromiter(
            (int(rates.get(s, default_rate) * 10000) for s in strata.tolist()),
            dtype=np.int64,
            count=len(strata),
        )
        return t.filter(pa.array(per_row < thresh))

    return ds.map_batches(_keep, batch_format="pyarrow")


def shuffle_rank(
    ds: Dataset,
    id_col: str,
    salt: str = "",
    pos_col: str = "pos",
    num_buckets: int = 4096,
    num_partitions=None,
) -> Dataset:
    """Deterministic global shuffle for training-data ordering:
    ``pos_col`` = 0-based rank of ``md5(salt + str(id))`` ascending — the
    epoch-stable, cluster-size-independent permutation a pre-packing
    shuffle needs (rerun anywhere, same order; change ``salt`` for a new
    epoch). Requires unique ids (ties would make the rank ill-defined —
    the same caveat as SQL ``ROW_NUMBER`` over a non-key).

    Scale shape — a global sort WITHOUT a global sort:

    1. one map pass computes the hash (once per distinct id) and its
       range bucket (first 3 hex digits — md5 is uniform, so buckets are
       balanced by construction, no sampling/skew pass needed);
    2. per-batch bucket histograms (``num_buckets`` ints) stream to the
       driver and fold — O(buckets), not O(rows), and NO shuffle;
    3. the cumsum offsets broadcast back (one small ``ray.put``);
    4. ONE hash exchange groups whole buckets; each task sorts its
       buckets locally and emits ``offset[bucket] + local_rank``.

    Total: the corpus moves once; driver state is ``num_buckets`` ints.
    """
    import numpy as np

    from kgray.kernels.hashagg import auto_partitions, grouped_apply

    hexw = 3
    assert num_buckets == 16 ** hexw, "num_buckets pinned to 16^3 (uniform md5 prefix)"

    def _hashed(t: pa.Table) -> pa.Table:
        import pandas as pd

        ids = t.column(id_col).to_pylist()
        codes, uniques = pd.factorize(np.asarray(ids, dtype=object))
        hx = np.asarray(
            [hashlib.md5((salt + str(i)).encode("utf-8")).hexdigest() for i in uniques.tolist()],
            dtype=object,
        )
        per_row = hx[codes]
        bucket = np.asarray([int(h[:hexw], 16) for h in per_row.tolist()], dtype=np.int64)
        return pa.table({
            id_col: t.column(id_col),
            "__hash": pa.array(per_row.tolist(), type=pa.string()),
            "__bucket": pa.array(bucket),
        })

    hashed = ds.select_columns([id_col]).map_batches(
        _hashed, batch_format="pyarrow"
    ).materialize()

    def _hist(t: pa.Table) -> pa.Table:
        counts = np.bincount(t.column("__bucket").to_numpy(), minlength=num_buckets)
        nz = np.nonzero(counts)[0]
        # (bucket, count) pairs — batch-boundary-independent, so the
        # driver fold survives iter_batches re-chunking.
        return pa.table({"b": pa.array(nz, type=pa.int64()),
                         "c": pa.array(counts[nz], type=pa.int64())})

    total = np.zeros(num_buckets, dtype=np.int64)
    for b in hashed.map_batches(_hist, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        np.add.at(total, b.column("b").to_numpy(), b.column("c").to_numpy())
    offsets = np.concatenate([[0], np.cumsum(total)[:-1]])
    oref = ray.put(offsets)

    def _rank(df):
        import pandas as pd

        off = ray.get(oref)
        out = []
        for b, g in df.groupby("__bucket", sort=False):
            g = g.sort_values("__hash", kind="stable")
            out.append(pd.DataFrame({
                id_col: g[id_col].to_numpy(),
                pos_col: off[int(b)] + np.arange(len(g), dtype=np.int64),
            }))
        return pd.concat(out) if out else pd.DataFrame(
            {id_col: df[id_col].iloc[:0], pos_col: np.array([], dtype=np.int64)})

    nparts = num_partitions or auto_partitions(hashed.size_bytes())
    return grouped_apply(hashed, ["__bucket"], _rank, num_partitions=nparts)


def value_rank(
    ds: Dataset,
    value_col: str,
    id_col: str,
    rank_col: str = "rnk",
    ntiles: int | None = None,
    tile_col: str = "tile",
    num_partitions=None,
) -> Dataset:
    """Exact global 0-based rank by ``(value_col, id_col)`` ascending —
    ``ROW_NUMBER() - 1`` — plus optional SQL-exact ``NTILE(ntiles)``
    bucketing, without a global sort.

    Scale shape (:func:`shuffle_rank`'s histogram trick, range-keyed):

    1. one map pass folds per-batch VALUE histograms to the driver —
       O(distinct values), not O(rows), and no shuffle. This is the
       documented boundary: exact value-rank this way requires the
       value's distinct-count to fit driver memory (lengths, scores,
       counts, dates — yes; unique floats — use a sampled range
       partition instead);
    2. cumsum offsets broadcast back (one ``ray.put``);
    3. ONE value-keyed exchange; each partition holds whole value
       groups, sorts each by id, and emits ``offset[value] + local``.

    NTILE follows SQL semantics exactly: the first ``n % k`` tiles get
    ``n // k + 1`` rows, the rest ``n // k`` (1-based tile ids).
    """
    import numpy as np
    import pandas as pd

    from kgray.kernels.hashagg import auto_partitions, grouped_apply

    src = ds.select_columns([id_col, value_col])

    def _hist(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vc = pc.value_counts(t.column(value_col).combine_chunks())
        if len(vc) == 0:
            return pa.table({"v": pa.array([], t.column(value_col).type),
                             "c": pa.array([], pa.int64())})
        return pa.table({"v": vc.field("values"), "c": vc.field("counts")})

    counts: dict = {}
    for b in src.map_batches(_hist, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for v, c in zip(b.column("v").to_pylist(), b.column("c").to_pylist()):
            counts[v] = counts.get(v, 0) + c
    vals = sorted(counts)
    n_total = int(sum(counts.values()))
    cum = np.concatenate([[0], np.cumsum([counts[v] for v in vals])[:-1]]).astype(np.int64)
    offset_map = dict(zip(vals, cum.tolist()))
    oref = ray.put(offset_map)

    if ntiles:
        size, rem = divmod(n_total, ntiles)
        big_span = rem * (size + 1)

        def _tile(r: "np.ndarray") -> "np.ndarray":
            big = r < big_span
            t = np.where(big, r // max(size + 1, 1) + 1,
                         rem + (r - big_span) // max(size, 1) + 1)
            return t.astype(np.int64)

    def _rank(df: "pd.DataFrame") -> "pd.DataFrame":
        off = ray.get(oref) if isinstance(oref, ray.ObjectRef) else oref
        df = df.sort_values([value_col, id_col], kind="mergesort")
        v = df[value_col].to_numpy()
        starts = np.concatenate([[0], 1 + np.flatnonzero(v[1:] != v[:-1])]) \
            if len(v) else np.zeros(0, np.int64)
        grp_first = np.zeros(len(v), dtype=np.int64)
        if len(v):
            grp_first[starts] = 1
            grp = grp_first.cumsum() - 1
            local = np.arange(len(v), dtype=np.int64) - starts[grp]
            base = df[value_col].map(off).to_numpy(np.int64)
            rnk = base + local
        else:
            rnk = np.zeros(0, np.int64)
        out = pd.DataFrame({id_col: df[id_col].to_numpy(),
                            value_col: v, rank_col: rnk})
        if ntiles:
            out[tile_col] = _tile(rnk)
        return out

    nparts = num_partitions or auto_partitions(src.size_bytes())
    return grouped_apply(src, [value_col], _rank, num_partitions=nparts)


def weighted_sample(
    ds: Dataset,
    id_col: str,
    weight_col: str,
    k: int = 50,
    salt: str = "",
) -> "pa.Table":
    """Deterministic weighted sampling without replacement (A-Res /
    Efraimidis-Spirakis): each row gets key ``u ** (1 / w)`` where ``u``
    is a uniform from ``md5(salt + str(id))`` and ``w`` its weight; the
    global top-k keys ARE a weighted sample without replacement — the
    data-mixing primitive for importance-weighted corpus subsetting.

    Deterministic (hash-seeded, cluster-size-independent, rerunnable)
    and SQL-expressible, so the driver oracle pins it exactly. Scale
    shape: top-k is a monoid — each batch reduces to its local top-k
    vectorized (one argpartition), the driver merges O(batches x k)
    candidate rows, and nothing shuffles. Rows with weight <= 0 are
    excluded (their key is ill-defined), matching the oracle's WHERE.
    """
    import numpy as np
    import pandas as pd

    def _local_topk(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        codes, uniques = pd.factorize(np.asarray(ids, dtype=object))
        hv = np.fromiter(
            (int(hashlib.md5((salt + str(i)).encode("utf-8")).hexdigest()[:15], 16)
             for i in uniques.tolist()),
            dtype=np.int64, count=len(uniques),
        )
        u = hv[np.clip(codes, 0, None)].astype(np.float64) / float(1 << 60)
        pos = w > 0
        safe_w = np.where(pos, w, 1.0)
        key = np.where(pos, u ** (1.0 / safe_w), -1.0)
        kk = min(k, int(pos.sum()))
        if kk == 0:
            return pa.table({id_col: pa.array([], t.column(id_col).type),
                             weight_col: pa.array([], t.column(weight_col).type),
                             "__key": pa.array([], pa.float64())})
        idx = np.argpartition(-key, kk - 1)[:kk]
        return pa.table({
            id_col: t.column(id_col).take(pa.array(idx)),
            weight_col: t.column(weight_col).take(pa.array(idx)),
            "__key": pa.array(key[idx], pa.float64()),
        })

    cand = ds.select_columns([id_col, weight_col]).map_batches(
        _local_topk, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["__key", id_col], ascending=[False, True],
                            kind="mergesort").head(k)
    return pa.Table.from_pandas(
        cand.drop(columns="__key").reset_index(drop=True), preserve_index=False)


def range_rank(
    ds: Dataset,
    value_col: str,
    id_col: str,
    rank_col: str = "rnk",
    num_partitions=None,
    sample_per_part: int = 64,
    ntile_n=None,
    ntile_col: str = "bucket",
) -> Dataset:
    """Exact global 0-based rank by ``(value_col, id_col)`` ascending
    (``ROW_NUMBER() − 1``) for CONTINUOUS / unbounded-cardinality
    values — the other half of :func:`value_rank`'s documented
    boundary (whose histogram trick needs the distinct values to fit
    the driver). NULL values are excluded (mirror in the oracle).

    Range-partitioned rank without a global sort operator:

    1. a deterministic sample (md5(id)-keyed smallest-k per batch, the
       weighted_sample monoid with equal weights) picks P−1 boundary
       ``(value, id)`` pairs on the driver — O(P·sample_per_part) rows
       move, never the data;
    2. one map pass assigns each row its range partition (vectorized
       searchsorted on boundary values, id tie-refine) and folds
       per-partition COUNTS to the driver (O(batches × P) tiny rows);
       prefix-summed offsets broadcast back;
    3. ONE exchange co-locates each range partition; the reduce sorts
       its partitions locally and emits ``offset[part] + local_pos``.

    Unlike a Ray ``Dataset.sort``, nothing is globally materialized in
    sorted order — callers get the rank COLUMN, data stays put.
    Boundary skew note: boundaries are distinct by value, so a single
    value duplicated across many rows lands in one partition — the
    standard range-partition hot-value caveat (acceptable for ranks
    because the reduce is O(n log n) local).
    """
    import hashlib

    import ray

    from kgray.kernels.hashagg import auto_partitions, grouped_apply

    if num_partitions is None:
        num_partitions = auto_partitions()
    target = num_partitions * sample_per_part

    src = ds.select_columns([id_col, value_col]).map_batches(
        lambda t: t.filter(pc.is_valid(t.column(value_col))),
        batch_format="pyarrow")

    def _cand(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        key = np.fromiter(
            (int(hashlib.md5(str(i).encode("utf-8")).hexdigest()[:15], 16)
             for i in ids), dtype=np.int64, count=len(ids))
        kk = min(target, len(ids))
        take = np.argpartition(key, kk - 1)[:kk] if kk < len(ids) else np.arange(len(ids))
        idx = pa.array(take)
        return pa.table({
            id_col: t.column(id_col).take(idx),
            value_col: t.column(value_col).take(idx),
            "__key": pa.array(key[take]),
        })

    cand = src.map_batches(_cand, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values("__key", kind="mergesort").head(target)
    cand = cand.sort_values([value_col, id_col], kind="mergesort")
    # P-1 boundaries, distinct by VALUE (duplicate sample values would
    # make the composite searchsorted ambiguous).
    pos = np.linspace(0, len(cand) - 1, num_partitions + 1)[1:-1].astype(int)
    b = cand.iloc[pos].drop_duplicates(subset=[value_col])
    b_vals = b[value_col].to_numpy()
    b_ids = b[id_col].to_numpy()
    nb = len(b_vals)
    bref = ray.put((b_vals, b_ids))

    def _assign(t: pa.Table) -> np.ndarray:
        bv, bi = ray.get(bref) if not isinstance(bref, tuple) else bref
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        part = np.searchsorted(bv, v, side="left").astype(np.int64)
        if nb:
            safe = np.minimum(part, nb - 1)
            eq = (part < nb) & (v == bv[safe])
            if eq.any():
                part[eq] += (ids[eq] >= bi[part[eq]]).astype(np.int64)
        return part

    # Counts pre-pass: O(batches × P) rows fold on the driver.
    def _counts(t: pa.Table) -> pa.Table:
        c = np.bincount(_assign(t), minlength=nb + 1)
        return pa.table({"p": pa.array(np.arange(nb + 1, dtype=np.int64)),
                         "n": pa.array(c.astype(np.int64))})

    counts = np.zeros(nb + 1, dtype=np.int64)
    for batch in src.map_batches(_counts, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        # np.add.at, NOT fancy-index +=: iter_batches concatenates the
        # per-task count tables, so partition ids REPEAT within one
        # batch and += would keep only the last occurrence.
        np.add.at(counts, batch.column("p").to_numpy(),
                  batch.column("n").to_numpy())
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    oref = ray.put(offsets)
    # NTILE rides for free: the counts pre-pass already knows the
    # global total, and SQL's NTILE(n) is a closed-form map of the
    # 0-based ROW_NUMBER — the first (total % n) buckets get
    # ceil(total/n) rows, the rest floor(total/n).
    total = int(counts.sum())

    def _tag(t: pa.Table) -> pa.Table:
        return t.append_column("__rpart", pa.array(_assign(t)))

    tagged = src.map_batches(_tag, batch_format="pyarrow")

    def _rank(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(oref) if not isinstance(oref, np.ndarray) else oref
        df = df.sort_values(["__rpart", value_col, id_col],
                            kind="mergesort").reset_index(drop=True)
        p = df["__rpart"].to_numpy(np.int64)
        new = np.empty(len(df), dtype=bool)
        if len(df):
            new[0] = True
            new[1:] = p[1:] != p[:-1]
        local = np.arange(len(df)) - np.maximum.accumulate(
            np.where(new, np.arange(len(df)), 0))
        out = df.drop(columns="__rpart")
        out[rank_col] = off[p] + local
        if ntile_n is not None:
            size_small, n_big = divmod(total, int(ntile_n))
            size_big = size_small + 1
            cutoff = n_big * size_big  # rows living in the big buckets
            r = out[rank_col].to_numpy(np.int64)
            out[ntile_col] = np.where(
                r < cutoff,
                r // size_big,
                n_big + (r - cutoff) // max(size_small, 1),
            ).astype(np.int64) + 1
        return out

    return grouped_apply(tagged, ["__rpart"], _rank,
                         num_partitions=num_partitions)


def ntile(
    ds: Dataset,
    value_col: str,
    id_col: str,
    n: int,
    bucket_col: str = "bucket",
    **kwargs,
) -> Dataset:
    """Global ``NTILE(n)`` quantile bucketing over a continuous column
    — the curriculum-binning / difficulty-stratification primitive.

    Rides :func:`range_rank`'s boundary-sampled rank exchange (no
    global sort, data never moves in sorted order); the bucket id is a
    closed-form function of the exact global row number, using the
    total count the rank's O(batches × P) pre-pass already folded.
    SQL tie semantics match ``NTILE(n) OVER (ORDER BY value, id)``
    because the underlying rank IS that ROW_NUMBER.
    """
    return range_rank(ds, value_col, id_col, ntile_n=n,
                      ntile_col=bucket_col, **kwargs)


def mix_corpus(
    ds: Dataset,
    domain_col: str,
    id_col: str,
    weights: dict,
    num_partitions=None,
) -> Dataset:
    """Deterministic data mixing: down-sample to target DOMAIN
    PROPORTIONS — the corpus-mixture primitive (e.g. 40% web / 30%
    code / 30% books) behind every pretraining data recipe.

    Semantics (pinned, SQL-checkable): with per-domain counts ``n_d``
    and weights ``w_d``, the largest achievable mixture size is ``T =
    min_d(n_d / w_d)``; each domain keeps its first ``k_d = floor(w_d ·
    T)`` documents in md5(id) order (the package's epoch-stable,
    cluster-size-independent sampling convention). Domains absent from
    ``weights`` are dropped; a weighted domain with no rows empties the
    mixture (T = 0) rather than silently rebalancing.

    Scale shape: per-domain counts are O(domains) map partials folded
    on the driver; selection rides ONE keyed exchange with the
    top_n_per_group-style map-side pruning (each batch pre-truncates to
    its own per-domain k_d, so the shuffle carries candidates only).
    """
    import hashlib
    import math

    from kgray.kernels.hashagg import auto_partitions, grouped_apply

    if num_partitions is None:
        num_partitions = auto_partitions()
    src = ds.select_columns([id_col, domain_col])

    def _cnt(t: pa.Table) -> pa.Table:
        vc = t.column(domain_col).value_counts()
        return pa.table({domain_col: vc.field("values"),
                         "n": vc.field("counts")})

    nd: dict = {}
    for batch in src.map_batches(_cnt, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for d, n in zip(batch.column(domain_col).to_pylist(),
                        batch.column("n").to_pylist()):
            nd[d] = nd.get(d, 0) + n
    T = min((nd.get(d, 0) / w for d, w in weights.items() if w > 0),
            default=0.0)
    kd = {d: int(math.floor(w * T)) for d, w in weights.items() if w > 0}
    kref = ray.put(kd)

    def _prune(df: pd.DataFrame) -> pd.DataFrame:
        k = ray.get(kref) if not isinstance(kref, dict) else kref
        df = df[df[domain_col].isin(k)]
        if len(df) == 0:
            return df.drop(columns=["__h"], errors="ignore")
        if "__h" not in df.columns:
            df = df.assign(__h=[hashlib.md5(str(i).encode("utf-8")).hexdigest()
                                for i in df[id_col]])
        df = df.sort_values([domain_col, "__h", id_col], kind="mergesort")
        keep = df.groupby(domain_col, sort=False).cumcount() < df[domain_col].map(k).to_numpy()
        return df[keep.to_numpy()]

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        return _prune(df).drop(columns=["__h"], errors="ignore")

    return grouped_apply(src, [domain_col], _reduce,
                         num_partitions=num_partitions, map_side=_prune)
