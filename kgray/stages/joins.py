"""Relational operators Ray Data lacks natively, built by composition.

* :func:`asof_join` — for every left row, the LATEST right row with
  ``right.time <= left.time`` within the same key group (the classic
  time-series enrichment join; DuckDB's ``ASOF JOIN`` is the oracle).
* :func:`range_join` — left rows matched to right rows whose
  ``[lo, hi]`` interval contains the left value, via integer bucket
  co-partitioning (each interval is exploded to the buckets it covers,
  so the join is a hash join on ``(key?, bucket)`` plus a vectorized
  in-bucket containment filter — no all-pairs blow-up).

Partitioning assumption (documented per the custom-operator rule): both
operators hash-partition on the join key (as-of) or on value buckets
(range); one key's/bucket's rows must fit a worker's heap — size
``num_partitions`` accordingly. Within a partition everything is
pandas/numpy C kernels (``merge_asof``, interval masks), no per-row
Python.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data import Dataset

from kgray.kernels.hashagg import arrow_types, auto_partitions, grouped_apply

_TAG = "__asof_side"


def asof_join(
    left: Dataset,
    right: Dataset,
    by: str,
    on: str,
    right_cols: Optional[Sequence[str]] = None,
    suffix: str = "_right",
    num_partitions: Optional[int] = None,
    right_prepare=None,
) -> Dataset:
    """Left as-of join: latest right row with ``right.on <= left.on``
    per ``by`` group. Left rows with no prior right row keep NULLs.

    Shape: tag both sides, ONE hash exchange on ``by``; each partition
    splits by tag, sorts by ``on`` and runs pandas ``merge_asof``
    (C-speed, backward direction) — the composition-of-primitives form
    of an operator Ray Data has no native node for.

    ``right_prepare``: optional per-partition frame transform applied to
    the right slice before the merge (columns ``[by, on] + right_cols``)
    — e.g. a (by, on)-dedup. Because the exchange already co-locates by
    ``by``, any by-local preparation rides this exchange for free
    instead of costing its own.
    """
    if num_partitions is None:
        num_partitions = auto_partitions()
    rcols = list(right_cols) if right_cols is not None else [
        c for c in right.schema().names if c not in (by, on)
    ]

    def _tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(_TAG, pa.array([side] * len(t), type=pa.string()))

        return fn

    lt = left.map_batches(_tag("l"), batch_format="pyarrow")
    rt = right.select_columns([by, on] + rcols).map_batches(_tag("r"), batch_format="pyarrow")
    # union-by-name with TYPED NULL fill: the union requires identical
    # schemas, so absent columns are filled with nulls of the column's
    # real type from whichever side defines it.
    lschema, rschema = left.schema(), right.schema()
    lcols = lschema.names
    types = arrow_types(rschema)
    types.update(arrow_types(lschema))
    all_cols = list(dict.fromkeys(lcols + [by, on] + rcols)) + [_TAG]
    types[_TAG] = pa.string()

    def _align(t: pa.Table) -> pa.Table:
        arrays = []
        for c in all_cols:
            if c in t.column_names:
                arrays.append(t.column(c).cast(types[c]))
            else:
                arrays.append(pa.nulls(len(t), type=types[c]))
        return pa.table(dict(zip(all_cols, arrays)))

    tagged = lt.map_batches(_align, batch_format="pyarrow").union(
        rt.map_batches(_align, batch_format="pyarrow")
    )

    out_rcols = [f"{c}{suffix}" if c in lcols else c for c in rcols]

    # Output schema: left columns keep their exact input types (the
    # tagged union's NULL fill upcasts pandas ints to float64 — cast
    # back); right value columns keep the right input's types, nullable.
    out_schema = pa.schema(
        [(c, types[c]) for c in lcols]
        + [(oc, types[c]) for oc, c in zip(out_rcols, rcols)]
    )

    def _asof(part: pd.DataFrame) -> pa.Table:
        lp = part[part[_TAG] == "l"]
        rp = part[part[_TAG] == "r"]
        lp = lp[lcols].sort_values(on, kind="mergesort")
        rp = rp[[by, on] + rcols]
        if right_prepare is not None:
            rp = right_prepare(rp)[[by, on] + rcols]
        rp = rp.sort_values(on, kind="mergesort")
        rp = rp.rename(columns=dict(zip(rcols, out_rcols)))
        if len(lp) == 0:
            merged = pd.DataFrame(columns=lcols + out_rcols)
        else:
            merged = pd.merge_asof(lp, rp, on=on, by=by, direction="backward")
        return pa.Table.from_pandas(
            merged[lcols + out_rcols], preserve_index=False
        ).cast(out_schema)

    # Arrow map side: the aligned union must NOT round-trip through
    # pandas before the exchange — NULL-filled int columns would upcast
    # to float64 on one branch only and spam block-schema warnings.
    return grouped_apply(
        tagged, [by], _asof, num_partitions=num_partitions, map_format="pyarrow"
    )


def range_join(
    left: Dataset,
    right: Dataset,
    value_col: str,
    lo_col: str,
    hi_col: str,
    right_cols: Optional[Sequence[str]] = None,
    bucket_width: float = 1.0,
    num_partitions: Optional[int] = None,
    suffix: str = "_right",
) -> Dataset:
    """Inner range join: every (left, right) pair with
    ``right.lo <= left.value <= right.hi``.

    Each right interval explodes to the integer buckets it covers
    (``floor(lo/w) .. floor(hi/w)``); left rows go to their single
    bucket; the exchange co-locates by bucket and a vectorized
    containment mask finishes the match. Worst case degrades with
    interval length / bucket_width — pick ``bucket_width`` near the
    median interval length so explosion stays O(1) per interval.

    Right value columns whose names collide with left columns come back
    suffixed (as in :func:`asof_join`); ``lo_col``/``hi_col`` colliding
    with a left column is an error (they cannot be renamed — the
    containment filter needs them by name).
    """
    if num_partitions is None:
        num_partitions = auto_partitions()
    rcols = list(right_cols) if right_cols is not None else [
        c for c in right.schema().names if c not in (lo_col, hi_col)
    ]
    lcols = left.schema().names
    if lo_col in lcols or hi_col in lcols:
        raise ValueError(
            f"range_join: bound columns {lo_col!r}/{hi_col!r} collide with a left "
            "column — rename one side before joining"
        )
    out_rcols = [f"{c}{suffix}" if c in lcols else c for c in rcols]

    def _lbucket(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df["__bucket"] = np.floor(df[value_col].to_numpy() / bucket_width).astype(np.int64)
        df[_TAG] = "l"
        return df

    def _rbucket(t: pa.Table) -> pd.DataFrame:
        df = t.select([lo_col, hi_col] + rcols).to_pandas()
        df = df.rename(columns=dict(zip(rcols, out_rcols)))
        lo_b = np.floor(df[lo_col].to_numpy() / bucket_width).astype(np.int64)
        hi_b = np.floor(df[hi_col].to_numpy() / bucket_width).astype(np.int64)
        reps = (hi_b - lo_b + 1).clip(min=1)
        out = df.loc[df.index.repeat(reps)].reset_index(drop=True)
        # bucket sequence per interval: lo_b[i] .. hi_b[i]
        starts = np.repeat(lo_b, reps)
        offs = np.arange(reps.sum()) - np.repeat(np.cumsum(reps) - reps, reps)
        out["__bucket"] = starts + offs
        out[_TAG] = "r"
        return out

    lschema, rschema = left.schema(), right.schema()
    rtypes = arrow_types(rschema)
    types = arrow_types(lschema)
    types[lo_col] = rtypes[lo_col]
    types[hi_col] = rtypes[hi_col]
    types.update({oc: rtypes[c] for oc, c in zip(out_rcols, rcols)})
    types["__bucket"] = pa.int64()
    types[_TAG] = pa.string()
    ordered = [*lcols, lo_col, hi_col, *out_rcols, "__bucket", _TAG]

    def _align(df: pd.DataFrame) -> pa.Table:
        # Explicitly typed Arrow output so both sides union cleanly
        # (None-filled pandas columns would infer null/object types).
        arrays = {}
        for c in ordered:
            if c in df.columns:
                arrays[c] = pa.array(df[c], type=types[c])
            else:
                arrays[c] = pa.nulls(len(df), type=types[c])
        return pa.table(arrays)

    # Bucket-explode and align fused in one Arrow-out stage per side so
    # no intermediate pandas blocks (with per-side NULL upcasts) ever
    # reach the executor — both union branches emit one identical
    # Arrow schema.
    lt = left.map_batches(lambda t: _align(_lbucket(t)), batch_format="pyarrow")
    rt = right.map_batches(lambda t: _align(_rbucket(t)), batch_format="pyarrow")
    tagged = lt.union(rt)

    out_schema = pa.schema([(c, types[c]) for c in lcols + [lo_col, hi_col] + out_rcols])

    def _match(part: pd.DataFrame) -> pa.Table:
        out = []
        for _, g in part.groupby("__bucket", sort=False):
            lp = g[g[_TAG] == "l"]
            rp = g[g[_TAG] == "r"]
            if len(lp) == 0 or len(rp) == 0:
                continue
            m = lp[lcols].merge(rp[[lo_col, hi_col] + out_rcols], how="cross")
            v = m[value_col].to_numpy()
            mask = (m[lo_col].to_numpy() <= v) & (v <= m[hi_col].to_numpy())
            out.append(m[mask])
        if not out:
            df = pd.DataFrame(columns=lcols + [lo_col, hi_col] + out_rcols)
        else:
            df = pd.concat(out, ignore_index=True)
        # Cast back to the input types (the union's NULL fill upcasts).
        return pa.Table.from_pandas(df, preserve_index=False).cast(out_schema)

    return grouped_apply(
        tagged, ["__bucket"], _match, num_partitions=num_partitions, map_format="pyarrow"
    )

def edit_distance_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 2000,
    num_partitions: Optional[int] = None,
) -> Dataset:
    """EXACT edit-distance-≤1 similarity self-join: every pair
    ``(id_a < id_b)`` whose strings are within Levenshtein distance 1
    (including exact duplicates). The short-string member of the
    similarity-join family (entity names, codes, titles, URL slugs) —
    the fuzzy-matching primitive the reference's CURIE-prefix matching
    (reference duplicate_utils.py) stops short of.

    Deletion-neighborhood blocking (SymSpell / FastSS shape, public):
    each string emits its identity key plus every single-character-
    deletion variant. Any pair with ed ≤ 1 shares at least one key
    (substitution at i ⇒ equal del_i variants; insert/delete ⇒ the
    longer string's deletion variant equals the shorter string), so the
    block is COMPLETE; sharing a key is not sufficient ("ab"/"ba"), so
    candidates are verified exactly.

    Distributed shape:

    1. map (vectorized): per deletion position ``p`` a pandas C-speed
       ``str.slice(0,p) + str.slice(p+1)`` over the whole batch; all
       variants hashed once with ``pd.util.hash_array`` → rows
       ``(kh, id, s)``. O(L) key expansion — sized for short strings
       (the operator's domain), NOT whole documents.
    2. exchange on ``kh``: per-partition postings self-merge (id_a <
       id_b), postings lists > ``max_postings`` skipped AND logged
       (a hot key is a degenerate token), in-partition pair dedup,
       then vectorized byte-matrix verification: equal-length pairs
       count positional mismatches; length-diff-1 pairs check the
       one-gap alignment via a prefix-mismatch index + shifted-suffix
       compare. No per-pair Python DP.
    3. exchange on ``(id_a, id_b)``: global pair distinct (the same
       pair can surface under several keys in different partitions).

    Partitioning assumption: one key-hash partition's postings fit a
    worker's heap; ``num_partitions`` auto-sizes from input bytes.
    """
    import logging

    logger = logging.getLogger(__name__)

    if num_partitions is None:
        num_partitions = auto_partitions()

    def _emit(t: pa.Table) -> pa.Table:
        s = t.column(text_col).to_pandas().astype(object)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        valid = s.notna().to_numpy()
        s, ids = s[valid].reset_index(drop=True), ids[valid]
        n = len(s)
        id_type = t.column(id_col).type
        if n == 0:
            return pa.table(
                {
                    "kh": pa.array([], type=pa.uint64()),
                    "id": pa.array([], type=id_type),
                    "s": pa.array([], type=pa.string()),
                }
            )
        lens = s.str.len().to_numpy()
        variants = [s]  # identity key
        rowsel = [np.arange(n)]
        for p in range(int(lens.max())):
            has = lens > p
            if not has.any():
                break
            sp = s[has]
            variants.append(sp.str.slice(0, p) + sp.str.slice(p + 1))
            rowsel.append(np.flatnonzero(has))
        flat = pd.concat(variants, ignore_index=True)
        rows = np.concatenate(rowsel)
        kh = pd.util.hash_array(flat.to_numpy())
        return pa.table(
            {
                "kh": pa.array(kh),
                "id": pa.array(ids[rows], type=id_type),
                "s": pa.array(np.asarray(s, dtype=object)[rows], type=pa.string()),
            }
        )

    posted = ds.select_columns([id_col, text_col]).map_batches(_emit, batch_format="pyarrow")

    def _verify(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Vectorized ed≤1 check for two same-shape object arrays of
        strings; returns a boolean mask. Strings are padded into fixed-
        width little-endian uint32 codepoint matrices (NUL padding —
        NUL inside a value would alias, documented)."""
        if len(a) == 0:
            return np.zeros(0, dtype=bool)
        la = np.fromiter((len(x) for x in a), count=len(a), dtype=np.int64)
        lb = np.fromiter((len(x) for x in b), count=len(b), dtype=np.int64)
        ok = np.zeros(len(a), dtype=bool)
        diff = la - lb
        # Equal length: substitution — positional mismatches ≤ 1.
        eqm = diff == 0
        if eqm.any():
            W = max(1, int(la[eqm].max()))
            A = np.asarray(a[eqm], dtype=f"<U{W}").view(np.uint32).reshape(-1, W)
            B = np.asarray(b[eqm], dtype=f"<U{W}").view(np.uint32).reshape(-1, W)
            ok[eqm] = (A != B).sum(axis=1) <= 1
        # Length differs by 1: one-gap alignment of the longer over the
        # shorter. p = first mismatch; suffix must match shifted by 1.
        for sign in (1, -1):
            dm = diff == sign
            if not dm.any():
                continue
            lo, sh = (a[dm], b[dm]) if sign == 1 else (b[dm], a[dm])
            L = int(max(len(x) for x in lo))
            Wl = max(1, L)
            A = np.asarray(lo, dtype=f"<U{Wl}").view(np.uint32).reshape(-1, Wl)
            B = np.asarray(sh, dtype=f"<U{Wl}").view(np.uint32).reshape(-1, Wl)
            ne = A != B
            p = np.where(ne.any(axis=1), ne.argmax(axis=1), Wl)
            if Wl > 1:
                eq_shift = A[:, 1:] == B[:, :-1]
                cols = np.arange(Wl - 1)
                ok[dm] = np.all(eq_shift | (cols[None, :] < p[:, None]), axis=1)
            else:
                ok[dm] = True
        return ok

    def _candidates(part: pd.DataFrame) -> pd.DataFrame:
        cnt = part.groupby("kh")["kh"].transform("size")
        over = cnt > max_postings
        if over.any():
            sizes = part.loc[over].groupby("kh")["kh"].size()
            logger.warning(
                "edit_distance_pairs: skipped %d oversized postings lists "
                "(> %d entries; sizes %s) — pairs joined only by those keys are lost",
                len(sizes), max_postings, sorted(sizes.tolist(), reverse=True)[:10],
            )
        part = part[(cnt >= 2) & ~over]
        m = part.merge(part, on="kh", suffixes=("_a", "_b"))
        m = m[m["id_a"] < m["id_b"]]
        m = m.drop_duplicates(subset=["id_a", "id_b"])
        if len(m) == 0:
            return pd.DataFrame({"id_a": m["id_a"], "id_b": m["id_b"]})
        keep = _verify(m["s_a"].to_numpy(), m["s_b"].to_numpy())
        return m.loc[keep, ["id_a", "id_b"]]

    cand = grouped_apply(posted, ["kh"], _candidates, num_partitions=num_partitions)

    def _distinct(part: pd.DataFrame) -> pd.DataFrame:
        return part.drop_duplicates(subset=["id_a", "id_b"])

    return grouped_apply(
        cand, ["id_a", "id_b"], _distinct,
        num_partitions=max(2, num_partitions // 4),
        map_side=_distinct,
    )
