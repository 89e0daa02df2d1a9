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
