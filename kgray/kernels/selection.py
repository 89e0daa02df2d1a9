"""Exact distributed order-statistic selection — the k-th smallest
value of an integer column without a global sort.

``ds.sort(col).limit(k)`` range-partitions EVERY row of the dataset to
find the first k — an all-to-all exchange whose cost is O(rows), not
O(k).  For selection-style consumers (top-k cuts, holdout rank
thresholds) the exact k-th element is enough: filter ``col <= kth`` is
then a map-only pass.

``kth_smallest`` finds it by iterative histogram refinement:

* each round is ONE streaming pass over the (materialized) dataset
  that folds a fixed-size ``np.bincount`` histogram per batch down to
  the driver (O(buckets) driver memory, map-side combined per batch);
* the bucket containing the k-th value becomes the new ``[lo, hi]``
  range and k is rebased; rounds repeat while more than
  ``collect_limit`` values remain in range;
* the final ≤ ``collect_limit`` in-range values are collected and the
  answer picked exactly (duplicates counted with multiplicity).

Rounds needed: ``log_buckets(n / collect_limit) + 1`` — 2 passes for
anything up to ~10¹² uniformly-spread rows at the defaults.  Skewed
value distributions only add rounds (a bucket never grows), they never
break exactness.  Works for int64 and uint64 (hash columns) alike —
driver arithmetic is arbitrary-precision Python int, batch arithmetic
rebases to ``value - lo`` before any numpy cast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

__all__ = ["kth_smallest"]


def kth_smallest(
    ds: Dataset,
    col: str,
    k: int,
    n_buckets: int = 4096,
    collect_limit: int = 65536,
    bounds: "tuple[int, int] | None" = None,
) -> int:
    """Exact k-th smallest (1-based, with multiplicity) value of integer
    column ``col``.  ``ds`` should be materialized — it is scanned once
    per refinement round (usually 2).  Raises if ``k`` exceeds the
    number of non-null values.

    ``bounds=(lo, hi)``: a-priori inclusive value range — skips the
    min/max scan (use for hash columns, candidate ids, any column whose
    range the caller constructed).  Must contain every value."""
    if k < 1:
        raise ValueError(f"kth_smallest: k must be >= 1, got {k}")
    if bounds is not None:
        lo, hi = int(bounds[0]), int(bounds[1])
        return _refine(ds, col, k, lo, hi, n_buckets, collect_limit)

    # Ray's min()/max() aggregates round-trip values through Python
    # ints and overflow on uint64 hash columns — fold typed Arrow
    # scalars instead (one streaming pass, O(1) rows per batch).
    def _minmax(t: pa.Table) -> pa.Table:
        v = t.column(col).drop_null()
        if len(v) == 0:
            return pa.table({"mn": pa.array([], v.type),
                             "mx": pa.array([], v.type)})
        return pa.table({"mn": pa.array([pa.compute.min(v).as_py()], v.type),
                         "mx": pa.array([pa.compute.max(v).as_py()], v.type)})

    lo = hi = None
    for b in ds.map_batches(_minmax, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for r in b.to_pylist():
            lo = r["mn"] if lo is None else min(lo, r["mn"])
            hi = r["mx"] if hi is None else max(hi, r["mx"])
    if lo is None:
        raise ValueError("kth_smallest: column has no non-null values")
    return _refine(ds, col, k, int(lo), int(hi), n_buckets, collect_limit)


def _refine(ds: Dataset, col: str, k: int, lo: int, hi: int,
            n_buckets: int, collect_limit: int) -> int:
    remaining = k

    while True:
        span = hi - lo + 1
        width = max(1, -(-span // n_buckets))  # ceil div
        nb = -(-span // width)
        lo_ = lo  # bind loop-variant values for the batch closure

        def _hist(t: pa.Table) -> pa.Table:
            v = t.column(col).drop_null()
            if len(v) == 0:
                counts = np.zeros(nb, np.int64)
            else:
                # rebase BEFORE casting: uint64 hash values overflow
                # int64, but (v - lo) fits once lo is the running min
                off = pa.compute.subtract(
                    v, pa.scalar(lo_, v.type)).to_numpy(zero_copy_only=False)
                idx = (off.astype(np.uint64) // np.uint64(width)).astype(np.int64)
                idx = idx[(idx >= 0) & (idx < nb)]
                counts = np.bincount(idx, minlength=nb)
            return pa.table({"h": pa.array([counts.tobytes()], pa.binary())})

        counts = np.zeros(nb, np.int64)
        for b in ds.map_batches(_hist, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            for buf in b.column("h").to_pylist():
                counts += np.frombuffer(buf, np.int64)

        cum = np.cumsum(counts)
        if remaining > int(cum[-1]):
            raise ValueError(
                f"kth_smallest: k={k} exceeds in-range count {int(cum[-1])}")
        bucket = int(np.searchsorted(cum, remaining))
        if bucket > 0:
            remaining -= int(cum[bucket - 1])
        lo = lo + bucket * width
        hi = min(hi, lo + width - 1)
        in_bucket = int(counts[bucket])

        if in_bucket <= collect_limit or lo == hi:
            break
        ds = _range_filter(ds, col, lo, hi).materialize()

    vals = _range_filter(ds, col, lo, hi).select_columns([col]).take_all()
    arr = sorted(int(r[col]) for r in vals)
    return arr[remaining - 1]


def _range_filter(ds: Dataset, col: str, lo: int, hi: int) -> Dataset:
    def _f(t: pa.Table) -> pa.Table:
        c = t.column(col)
        keep = pa.compute.and_(
            pa.compute.greater_equal(c, pa.scalar(lo, c.type)),
            pa.compute.less_equal(c, pa.scalar(hi, c.type)))
        return t.filter(pa.compute.fill_null(keep, False))

    return ds.map_batches(_f, batch_format="pyarrow")
