"""Mergeable sketches for cardinality at scale.

:func:`approx_distinct` — HyperLogLog over any column. The exact
counterpart (`relational.grouped_distinct_count`) moves one row per
distinct value through an exchange; at 100 TB-scale cardinalities the
sketch replaces that shuffle with a CONSTANT 2^b bytes per map task:
every batch folds into a local register array, register arrays merge by
elementwise max (associative + commutative, so Ray can combine them in
any order), and only the m-byte sketches ever travel.

Determinism: the value hash is pandas' fixed-key SipHash-ish C hash, so
the estimate is a pure function of the value multiset — the same
estimate on every run, any cluster, any partitioning (the property the
self-asserting query relies on).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

# Standard HLL bias constants.
_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1 + 1.079 / m))


def hll_registers(values: np.ndarray, b: int) -> np.ndarray:
    """Fold an array of uint64 hashes into a 2^b register array."""
    m = 1 << b
    reg = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return reg
    j = (values >> np.uint64(64 - b)).astype(np.int64)
    w = values & np.uint64((1 << (64 - b)) - 1)
    # rho = leading-zero count within the (64-b)-bit suffix, + 1.
    # 64-b <= 52 bits fits a double exactly, so frexp is exact.
    nz = w > 0
    rho = np.full(len(w), 64 - b + 1, dtype=np.uint8)
    if nz.any():
        # frexp: w = f·2^e with f∈[0.5,1) → e = floor(log2 w)+1, so the
        # leading-zero count within the (64-b)-bit suffix is (64-b)-e.
        _, e = np.frexp(w[nz].astype(np.float64))
        rho[nz] = ((64 - b) - e + 1).astype(np.uint8)
    np.maximum.at(reg, j, rho)
    return reg


def hll_estimate(reg: np.ndarray) -> float:
    """Estimate cardinality from a register array (with the standard
    small-range linear-counting correction)."""
    m = len(reg)
    est = _alpha(m) * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds: Dataset, col: str, b: int = 12) -> float:
    """Approximate COUNT(DISTINCT col) via HyperLogLog (2^b registers;
    relative standard error ≈ 1.04/√(2^b) — b=12 → ~1.6%).

    One map pass emits a 2^b-byte sketch per batch; sketches merge by
    elementwise max. No shuffle, no per-distinct-value data movement —
    the constant-size alternative to the exact exchange when the
    cardinality itself is web-scale (URLs, n-grams, user ids).
    """
    m = 1 << b

    def _sketch(t: pa.Table) -> pa.Table:
        vals = t.column(col).to_pandas()
        h = pd.util.hash_pandas_object(vals.dropna(), index=False).to_numpy().astype(np.uint64)
        reg = hll_registers(h, b)
        return pa.table({"reg": pa.FixedSizeListArray.from_arrays(pa.array(reg), m)})

    merged = np.zeros(m, dtype=np.uint8)
    # Per-batch sketches are m bytes each — the driver-side fold is over
    # O(num_batches) tiny rows, not the data.
    for batch in ds.map_batches(_sketch, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        regs = batch.column("reg").combine_chunks()
        flat = regs.flatten().to_numpy().reshape(-1, m)
        merged = np.maximum(merged, flat.max(axis=0))
    return hll_estimate(merged)


def bloom_params(n_items: int, fpr: float = 1e-3) -> tuple[int, int]:
    """(m_bits, k) for a Bloom filter sized to ``n_items`` at ``fpr``.
    m is rounded up to a multiple of 64; k = ln2 · m/n."""
    n = max(1, n_items)
    m = int(np.ceil(-n * np.log(fpr) / (np.log(2) ** 2)))
    m = max(64, (m + 63) // 64 * 64)
    k = max(1, int(round(m / n * np.log(2))))
    return m, k


def _bloom_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """k bit positions per uint64 hash via double hashing
    (h1 + i·h2) mod m — one (k, n) vectorized grid, no per-item loop."""
    h1 = h % np.uint64(m_bits)
    h2 = (h >> np.uint64(33)) | np.uint64(1)  # odd → full-period stride
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)).astype(np.int64)


def bloom_fold(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Fold uint64 hashes into an m_bits/8-byte bitmap (uint8)."""
    bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
    if len(h):
        pos = _bloom_positions(h, m_bits, k).ravel()
        np.bitwise_or.at(bitmap, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bitmap


def bloom_probe(h: np.ndarray, bitmap: np.ndarray, k: int) -> np.ndarray:
    """Boolean membership per hash: all k bits set."""
    if len(h) == 0:
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(h, len(bitmap) * 8, k)
    bits = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=0)


def count_min_params(eps: float = 1e-4, delta: float = 1e-3) -> tuple[int, int]:
    """(width, depth) for a Count-Min sketch with additive error
    ≤ eps·N at probability ≥ 1−delta: w = ⌈e/eps⌉, d = ⌈ln(1/delta)⌉."""
    w = int(np.ceil(np.e / eps))
    d = max(1, int(np.ceil(np.log(1.0 / delta))))
    return w, d


def count_min_fold(h: np.ndarray, counts: np.ndarray, w: int, d: int) -> np.ndarray:
    """Fold uint64 hashes (with multiplicity ``counts``) into a (d, w)
    int64 Count-Min grid. Rows merge by elementwise SUM (associative +
    commutative) — the frequency member of the mergeable-sketch family
    (HLL: max, bloom: or, histogram: sum)."""
    cms = np.zeros((d, w), dtype=np.int64)
    if len(h):
        h1 = h % np.uint64(w)
        h2 = (h >> np.uint64(33)) | np.uint64(1)
        for r in range(d):
            idx = ((h1 + np.uint64(r) * h2) % np.uint64(w)).astype(np.int64)
            np.add.at(cms[r], idx, counts)
    return cms


def count_min_query(h: np.ndarray, cms: np.ndarray) -> np.ndarray:
    """Point-frequency estimates: min over the d rows. Never
    underestimates; overestimates by ≤ eps·N w.p. ≥ 1−delta."""
    d, w = cms.shape
    if len(h) == 0:
        return np.zeros(0, np.int64)
    h1 = h % np.uint64(w)
    h2 = (h >> np.uint64(33)) | np.uint64(1)
    est = np.full(len(h), np.iinfo(np.int64).max)
    for r in range(d):
        idx = ((h1 + np.uint64(r) * h2) % np.uint64(w)).astype(np.int64)
        est = np.minimum(est, cms[r][idx])
    return est


def approx_token_counts(
    ds: Dataset, probe_tokens, text_col: str = "text",
    eps: float = 1e-4, delta: float = 1e-3,
) -> pd.DataFrame:
    """Approximate corpus-wide frequencies of ``probe_tokens`` via a
    Count-Min sketch: one map pass folds each batch's token hashes into
    a (d, w) grid; grids merge by elementwise sum — constant
    d·w·8 bytes per map task, no shuffle (the exact counterpart,
    `corpus.topk_tokens`, exchanges one row per distinct token).
    Returns (token, n_est) with n_est ≥ true count, ≤ true + eps·N
    w.p. ≥ 1−delta per probe."""
    from kgray.stages.corpus import flat_words

    w, d = count_min_params(eps, delta)

    def _h(arr: pa.Array) -> np.ndarray:
        return pd.util.hash_pandas_object(
            pd.Series(arr.to_pandas()), index=False
        ).to_numpy().astype(np.uint64)

    def _fold(t: pa.Table) -> pa.Table:
        flat, _ = flat_words(t.column(text_col))
        # batch-local combine: count duplicates before folding
        vc = pd.Series(_h(flat)).value_counts()
        cms = count_min_fold(vc.index.to_numpy(np.uint64), vc.to_numpy(), w, d)
        return pa.table({"cms": pa.array([cms.tobytes()], pa.binary())})

    total = np.zeros((d, w), dtype=np.int64)
    for b in ds.map_batches(_fold, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for buf in b.column("cms").to_pylist():
            total += np.frombuffer(buf, dtype=np.int64).reshape(d, w)

    ph = _h(pa.array(list(probe_tokens)))
    est = count_min_query(ph, total)
    return pd.DataFrame({"token": list(probe_tokens), "n_est": est.astype(np.int64)})


def approx_quantiles(
    ds: Dataset, col: str, qs=(0.5, 0.9, 0.99), bins: int = 4096
) -> pd.DataFrame:
    """Approximate quantiles via a mergeable fixed-bin histogram — the
    shuffle-free companion to :func:`approx_distinct` (the exact
    counterpart, `corpus.group_quantiles`, exchanges the whole column).

    Two streaming passes, zero shuffles:

    1. a (min, max) pass — two scalars per batch to the driver;
    2. a histogram pass — each batch folds into a ``bins``-long int64
       count array; arrays merge by elementwise sum (associative +
       commutative), so only O(bins) ever travels regardless of rows.

    The returned estimate is the upper edge of the bin containing the
    target rank, so the error is bounded by one bin width
    ``(max - min) / bins`` — an explicit, data-independent guarantee
    the caller (and the self-asserting registry query) can check
    against the exact quantile.
    """
    lo, hi = None, None

    def _minmax(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "lo": pa.array([pc.min(t.column(col)).as_py()], pa.float64()),
            "hi": pa.array([pc.max(t.column(col)).as_py()], pa.float64()),
        })

    for b in ds.map_batches(_minmax, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        blo = np.nanmin(b.column("lo").to_numpy(zero_copy_only=False))
        bhi = np.nanmax(b.column("hi").to_numpy(zero_copy_only=False))
        lo = blo if lo is None else min(lo, blo)
        hi = bhi if hi is None else max(hi, bhi)
    if lo is None or not np.isfinite(lo):
        raise ValueError(f"approx_quantiles: column {col!r} has no finite values")
    width = (hi - lo) / bins or 1.0

    def _hist(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, bins - 1)
        counts = np.bincount(idx, minlength=bins)
        nz = np.nonzero(counts)[0]
        return pa.table({"b": pa.array(nz, type=pa.int64()),
                         "c": pa.array(counts[nz], type=pa.int64())})

    total = np.zeros(bins, dtype=np.int64)
    for b in ds.map_batches(_hist, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        np.add.at(total, b.column("b").to_numpy(), b.column("c").to_numpy())
    n = int(total.sum())
    cum = np.cumsum(total)
    out = []
    for q in qs:
        rank = max(1, int(np.ceil(q * n)))
        bi = int(np.searchsorted(cum, rank))
        out.append({"q": q, "value": lo + (bi + 1) * width,
                    "max_err": width, "n": n})
    return pd.DataFrame(out)


# ---------------------------------------------------------------------------
# Exact interpolated quantiles (percentile_cont) by bucketed selection
# ---------------------------------------------------------------------------

def exact_quantiles_cont(
    ds: Dataset,
    col: str,
    qs,
    n_buckets: int = 1024,
    collect_limit: int = 65536,
    max_refine: int = 8,
    round_digits: int = 6,
) -> pd.DataFrame:
    """EXACT linear-interpolated quantiles (SQL ``percentile_cont`` /
    DuckDB ``quantile_cont``) of a numeric column, without ever sorting
    or collecting the data.

    Distributed selection: the order statistics needed (``k =
    floor/ceil((n-1)·q)``) are located by iterative bucket refinement —
    each round is ONE streaming histogram pass (per-batch
    ``searchsorted`` partials, O(n_buckets) rows per batch move to the
    driver) that narrows every unresolved rank's value bracket by
    ``n_buckets``×; when a bracket holds ≤ ``collect_limit`` rows, one
    final filter pass collects just those rows. For uniform-ish data
    this is 3 passes total (stats, one histogram, collect); pathological
    point masses terminate via the degenerate-bracket check. Nothing
    driver-side ever exceeds ``collect_limit`` rows per rank — the
    100-TB-safe form of a global percentile.

    The approximate one-pass counterpart is :func:`approx_quantiles`
    (bin-width error guarantee); this operator is its exact sibling.
    """
    import pyarrow.compute as pc

    qs = list(qs)

    def _stats(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        return pa.table({"n": pa.array([len(v)]),
                         "lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())])})

    st = ds.map_batches(_stats, batch_format="pyarrow").to_pandas()
    n = int(st["n"].sum())
    if n == 0:
        return pd.DataFrame({"q": qs, "value": [np.nan] * len(qs)})
    glo, ghi = float(st["lo"].min()), float(st["hi"].max())

    # Target ranks (0-based order statistics) for interpolation.
    targets = {}
    for q in qs:
        r = (n - 1) * float(q)
        targets.setdefault(int(np.floor(r)), None)
        targets.setdefault(int(np.ceil(r)), None)
    ranks = sorted(targets)
    # Per-rank bracket: (value_lo, value_hi, count_below_lo).
    bracket = {k: (glo, ghi, 0, n) for k in ranks}  # (lo, hi, below, size)
    resolved: dict = {}

    for _ in range(max_refine):
        todo = {k: b for k, b in bracket.items()
                if k not in resolved and b[3] > collect_limit and b[0] < b[1]}
        for k, b in list(bracket.items()):
            if k not in resolved and b[0] == b[1]:
                resolved[k] = b[0]
        if not todo:
            break
        # One histogram pass for ALL unresolved brackets.
        brs = sorted({(b[0], b[1]) for b in todo.values()})
        edges = [np.linspace(lo, hi, n_buckets + 1) for lo, hi in brs]

        def _hist(t: pa.Table, edges=edges, brs=brs) -> pa.Table:
            v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            bids, buckets, cnts = [], [], []
            for bi, ((lo, hi), e) in enumerate(zip(brs, edges)):
                m = v[(v >= lo) & (v <= hi)]
                if len(m) == 0:
                    continue
                idx = np.clip(np.searchsorted(e, m, side="right") - 1, 0, n_buckets - 1)
                c = np.bincount(idx, minlength=n_buckets)
                nz = np.flatnonzero(c)
                bids.append(np.full(len(nz), bi, dtype=np.int64))
                buckets.append(nz.astype(np.int64))
                cnts.append(c[nz].astype(np.int64))
            if not bids:
                return pa.table({"bid": pa.array([], pa.int64()),
                                 "bucket": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            return pa.table({"bid": pa.array(np.concatenate(bids)),
                             "bucket": pa.array(np.concatenate(buckets)),
                             "cnt": pa.array(np.concatenate(cnts))})

        hist = (
            ds.map_batches(_hist, batch_format="pyarrow")
            .to_pandas().groupby(["bid", "bucket"], as_index=False)["cnt"].sum()
        )
        for k, (blo, bhi, below, _size) in todo.items():
            bi = brs.index((blo, bhi))
            h = hist[hist["bid"] == bi].sort_values("bucket")
            cum = np.concatenate([[0], np.cumsum(h["cnt"].to_numpy())])
            # bucket containing local rank (k - below)
            local = k - below
            j = int(np.searchsorted(cum, local, side="right") - 1)
            j = min(j, len(h) - 1)
            bkt = int(h["bucket"].to_numpy()[j])
            e = edges[bi]
            new_lo, new_hi = float(e[bkt]), float(e[bkt + 1] if bkt + 1 <= n_buckets else bhi)
            if bkt == n_buckets - 1:
                new_hi = bhi
            bracket[k] = (new_lo, new_hi, below + int(cum[j]), int(h["cnt"].to_numpy()[j]))

    # Collect pass: gather rows for every still-unresolved bracket.
    pend = {k: b for k, b in bracket.items() if k not in resolved}
    if pend:
        brs = sorted({(b[0], b[1]) for b in pend.values()})

        def _collect(t: pa.Table, brs=brs) -> pa.Table:
            v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            bids, vals = [], []
            for bi, (lo, hi) in enumerate(brs):
                # hi-inclusive: the bracket's top edge is the true max of
                # its bucket range (last bucket absorbs the boundary).
                m = v[(v >= lo) & (v <= hi)]
                if len(m):
                    bids.append(np.full(len(m), bi, dtype=np.int64))
                    vals.append(m)
            if not bids:
                return pa.table({"bid": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.float64())})
            return pa.table({"bid": pa.array(np.concatenate(bids)),
                             "v": pa.array(np.concatenate(vals))})

        got = ds.map_batches(_collect, batch_format="pyarrow").to_pandas()
        for k, (blo, bhi, below, _sz) in pend.items():
            bi = brs.index((blo, bhi))
            vs = np.sort(got.loc[got["bid"] == bi, "v"].to_numpy())
            local = k - below
            # Rows < blo are 'below'; vs may include rows equal to bhi
            # that belong to the NEXT bracket only when bhi is an
            # interior edge — but interior edges are exclusive on the
            # right by searchsorted(side='right'), matching this filter
            # except at exact-edge values, which sort identically.
            resolved[k] = float(vs[local])

    out = []
    for q in qs:
        r = (n - 1) * float(q)
        k0, k1 = int(np.floor(r)), int(np.ceil(r))
        v0, v1 = resolved[k0], resolved[k1]
        val = v0 + (v1 - v0) * (r - k0)
        out.append({"q": float(q), "value": float(np.round(val, round_digits))})
    return pd.DataFrame(out)


def grouped_quantiles_cont(
    ds: Dataset,
    key: str,
    value_col: str,
    qs,
    num_partitions=None,
    round_digits: int = 6,
) -> Dataset:
    """EXACT per-group linear-interpolated quantiles (SQL
    ``percentile_cont(q) WITHIN GROUP ... GROUP BY key`` / DuckDB
    grouped ``quantile_cont``).

    Scale shape: one hash exchange on ``key``; per partition a single
    stable sort of ``(key, value)`` puts every group's values
    contiguous, then for each requested ``q`` the interpolated order
    statistic of EVERY group comes from group-offset arithmetic on the
    shared sorted array (``lo/hi = offset + floor/ceil((n_g-1)·q)``,
    DuckDB's ``lower + frac·(upper-lower)`` form) — no per-group Python
    loop, the only loop is over the handful of requested quantiles.

    Partitioning assumption: one key's rows fit a worker's heap. For a
    single giant group use :func:`exact_quantiles_cont` (the iterative
    bucket-refinement selection) filtered to that group instead.
    """
    from kgray.kernels.hashagg import auto_partitions, grouped_apply

    if num_partitions is None:
        num_partitions = auto_partitions()
    qs = [float(q) for q in qs]

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[key, value_col]].dropna()
        if len(df) == 0:
            return pd.DataFrame(
                {key: df[key], "q": pd.Series([], dtype="float64"),
                 "value": pd.Series([], dtype="float64")}
            )
        df = df.sort_values([key, value_col], kind="mergesort")
        vals = df[value_col].to_numpy(np.float64)
        gid, uniq = pd.factorize(df[key], sort=False)
        counts = np.bincount(gid)
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
        out = []
        for q in qs:
            h = (counts - 1) * q
            base = np.floor(h).astype(np.int64)
            frac = h - base
            v_lo = vals[offsets + base]
            v_hi = vals[offsets + np.ceil(h).astype(np.int64)]
            v = v_lo + frac * (v_hi - v_lo)
            out.append(pd.DataFrame({key: uniq, "q": q, "value": np.round(v, round_digits)}))
        return pd.concat(out, ignore_index=True)

    return grouped_apply(ds, [key], _reduce, num_partitions=num_partitions)


def grouped_approx_quantiles(
    ds: Dataset,
    key: str,
    value_col: str,
    qs,
    n_bins: int = 2048,
    num_partitions=None,
) -> "pd.DataFrame":
    """Mergeable per-group quantile sketch — the GIANT-group scale path
    that :func:`grouped_quantiles_cont` (which needs one group to fit a
    partition) documents as its escape hatch. Distribution-free
    guarantee (self-asserted by the registry query): the estimate's
    RANK within its group is within ``bin_n + 1`` of the target rank
    ``(n−1)·q``, where ``bin_n`` (returned per row) is the count of the
    bin the estimate interpolates inside — value-space error is one bin
    width ``(group_max − group_min)/n_bins`` whenever the neighborhood
    is dense, but a sparse group's empty-bin gaps make rank, not value,
    the honest error metric (the standard histogram-sketch caveat).

    Two streaming passes, neither moves data rows:
    1. per-group min/max — per-batch algebraic partials (O(groups) rows
       each) through one tiny exchange, collected and broadcast;
    2. per-group fixed-bin histograms — each batch contributes
       O(groups_in_batch × bins) count rows, SUM-combined map-side,
       one tiny exchange; the per-group quantile then interpolates
       within its bin from cumulative counts.

    The histogram partials are SUM-mergeable in any order (like
    count-min / HLL in this module), so no group ever needs to be
    co-located — only its O(n_bins) counters do.
    """
    import ray

    from kgray.kernels.hashagg import auto_partitions, grouped_apply

    if num_partitions is None:
        num_partitions = auto_partitions()
    qs = [float(q) for q in qs]

    def _mm_partial(df: pd.DataFrame) -> pd.DataFrame:
        # Nulls carry no rank information: drop them BEFORE counting so
        # n, lo/hi and the histogram all describe non-null values only
        # (an all-null group vanishes, matching grouped_quantiles_cont).
        df = df.dropna(subset=[value_col])
        g = df.groupby(key, sort=False)[value_col]
        out = g.agg(lo="min", hi="max", n="size").reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    def _mm_reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, sort=False)
        out = pd.DataFrame({
            key: g[key].first(),
            "lo": g["lo"].min(),
            "hi": g["hi"].max(),
            "n": g["n"].sum().astype("int64"),
        }).reset_index(drop=True)
        return out

    pruned = ds.select_columns([key, value_col])
    stats = grouped_apply(pruned, [key], _mm_reduce,
                          num_partitions=num_partitions,
                          map_side=_mm_partial).to_pandas()
    lo_map = dict(zip(stats[key], stats["lo"]))
    w_map = {k: max((h - l) / n_bins, 1e-300)
             for k, l, h in zip(stats[key], stats["lo"], stats["hi"])}
    n_map = dict(zip(stats[key], stats["n"]))
    bref = ray.put((lo_map, w_map))

    def _hist(df: pd.DataFrame) -> pd.DataFrame:
        lo_m, w_m = ray.get(bref) if not isinstance(bref, tuple) else bref
        # same null rule as _mm_partial — a NaN would otherwise cast to
        # INT64_MIN and clip into bin 0, inflating the low tail
        df = df.dropna(subset=[value_col])
        x = df[value_col].to_numpy(np.float64)
        lo = df[key].map(lo_m).to_numpy(np.float64)
        w = df[key].map(w_m).to_numpy(np.float64)
        b = np.clip(((x - lo) / w).astype(np.int64), 0, n_bins - 1)
        g = (pd.DataFrame({key: df[key], "bin": b})
             .groupby([key, "bin"], sort=False).size().rename("n").reset_index())
        return g

    def _sum(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby([key, "bin"], as_index=False, sort=False)["n"].sum()
        out["n"] = out["n"].astype("int64")
        return out

    hist = grouped_apply(pruned, [key], _sum, num_partitions=num_partitions,
                         map_side=_hist).to_pandas()

    rows = []
    for k, grp in hist.groupby(key, sort=False):
        grp = grp.sort_values("bin")
        bins = grp["bin"].to_numpy(np.int64)
        cnt = grp["n"].to_numpy(np.int64)
        cum = np.cumsum(cnt)
        n = n_map[k]
        lo, w = lo_map[k], w_map[k]
        for q in qs:
            rank = (n - 1) * q  # 0-based interpolated rank
            i = int(np.searchsorted(cum, rank + 1.0 - 1e-9, side="left"))
            i = min(i, len(bins) - 1)
            before = cum[i - 1] if i > 0 else 0
            within = (rank - before + 0.5) / max(cnt[i], 1)
            est = lo + (bins[i] + min(max(within, 0.0), 1.0)) * w
            rows.append({key: k, "q": q, "value_est": est,
                         "bin_n": int(cnt[i]), "n": int(n)})
    return pd.DataFrame(rows)


def grouped_approx_distinct(
    ds: Dataset,
    key: str,
    col: str,
    b: int = 12,
) -> "pd.DataFrame":
    """Approximate ``COUNT(DISTINCT col) GROUP BY key`` via one
    HyperLogLog sketch PER GROUP (same registers/estimator as
    :func:`approx_distinct`; RSE ≈ 1.04/√(2^b)).

    The 100-TB shape for low-cardinality keys × web-scale value
    cardinality (distinct users per day, distinct URLs per domain
    bucket): each batch emits one 2^b-byte register row per group it
    touches, rows merge by per-group elementwise max — O(groups ×
    batches × 2^b) bytes move, never one row per distinct value (the
    exact operator `relational.grouped_distinct_count` exchanges a row
    per distinct pair). Driver-side fold is over sketch rows only.
    """
    m = 1 << b

    def _sketch(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({key: t.column(key).to_pandas(),
                           "v": t.column(col).to_pandas()}).dropna(subset=["v"])
        ks, regs = [], []
        for k, grp in df.groupby(key, sort=False):
            h = pd.util.hash_pandas_object(grp["v"], index=False).to_numpy().astype(np.uint64)
            ks.append(k)
            regs.append(hll_registers(h, b))
        if not ks:
            return pa.table({key: t.column(key).slice(0, 0),
                             "reg": pa.FixedSizeListArray.from_arrays(
                                 pa.array([], pa.uint8()), m)})
        return pa.table({key: pa.array(ks, type=t.column(key).type),
                         "reg": pa.FixedSizeListArray.from_arrays(
                             pa.array(np.concatenate(regs)), m)})

    # O(groups × batches) sketch rows fold on the driver: per-group
    # elementwise max + estimate.
    acc: dict = {}
    for batch in ds.select_columns([key, col]).map_batches(
            _sketch, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        ks = batch.column(key).to_pylist()
        flat = batch.column("reg").combine_chunks().flatten().to_numpy().reshape(-1, m)
        for i, k in enumerate(ks):
            prev = acc.get(k)
            acc[k] = flat[i].copy() if prev is None else np.maximum(prev, flat[i])
    return pd.DataFrame({key: list(acc), "n_distinct_est":
                         [hll_estimate(r) for r in acc.values()]})


def grouped_mad(
    ds: Dataset,
    key: str,
    value_col: str,
    num_partitions=None,
    round_digits: int = 6,
) -> Dataset:
    """Median absolute deviation per group — the robust spread
    statistic (pairs with grouped median/IQR in q_robust_scale):
    ``MAD = median(|x − median_g|)``.

    Two passes over the column, both exchange only ``(key, value)``:
    the per-group medians (exact, from grouped_quantiles_cont's shared
    sorted array) broadcast as a tiny map, then the deviations ride the
    same grouped-quantile kernel. Same partitioning assumption; same
    giant-group escape hatch (grouped_approx_quantiles).
    """
    import ray

    from kgray.kernels.hashagg import auto_partitions

    if num_partitions is None:
        num_partitions = auto_partitions()
    med = grouped_quantiles_cont(ds, key, value_col, qs=(0.5,),
                                 num_partitions=num_partitions,
                                 round_digits=12).to_pandas()
    mref = ray.put(dict(zip(med[key], med["value"])))

    def _dev(t: pa.Table) -> pa.Table:
        m = ray.get(mref) if not isinstance(mref, dict) else mref
        ks = t.column(key).to_pandas()
        x = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        dev = np.abs(x - ks.map(m).to_numpy(np.float64))
        return pa.table({key: t.column(key), "dev": pa.array(dev)})

    devs = ds.select_columns([key, value_col]).map_batches(
        _dev, batch_format="pyarrow")
    out = grouped_quantiles_cont(devs, key, "dev", qs=(0.5,),
                                 num_partitions=num_partitions,
                                 round_digits=round_digits)
    return out.map_batches(
        lambda t: pa.table({key: t.column(key), "mad": t.column("value")}),
        batch_format="pyarrow")
