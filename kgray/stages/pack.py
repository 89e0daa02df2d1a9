"""Sequence packing: assign documents to fixed-size token windows by a
GLOBAL ordered prefix sum — the layout step between a curated corpus
and a training-shard writer (documents concatenated in id order, split
into ``window``-token sequences).

The interesting part at 100 TB is the global cumulative sum. Ray Data
has no scan operator, so it is built from its primitives in three
cheap passes over a TINY (id, n_tokens) projection:

1. **Count** (one map pass over the text, the only pass that touches
   it): ``(id, n_tokens)`` — 16 bytes/row — is materialized; at 100 TB
   of text this projection is ~0.01% of the input and the
   materialization is what lets passes 2–3 avoid re-reading the text.
2. **Range-partition + per-bucket sums**: rows bucket by id range
   (order-preserving, P contiguous buckets); per-bucket token sums —
   P numbers — come to the driver, which prefix-sums them into
   per-bucket offsets (O(P) driver work).
3. **Per-bucket cumsum + offset**: a hash exchange on the bucket id
   brings each bucket to one reduce task, which sorts by id, local
   cumsums, and adds its bucket's offset — exactly the classic
   two-level parallel scan.

Output: ``(id_col, n_tokens, seq_id, seq_offset)`` where ``seq_id =
floor(exclusive_cumsum / window)`` and ``seq_offset = exclusive_cumsum
% window`` — i.e. doc d starts in training sequence ``seq_id`` at
position ``seq_offset`` (documents spanning a boundary continue into
the next sequence, the standard GPT-style packing).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data import Dataset
from ray.data.aggregate import Max, Min

from kgray.kernels.hashagg import auto_partitions, grouped_apply

_TOKEN_RE = r"\S+"


def pack_sequences(
    ds: Dataset,
    window: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: Optional[int] = None,
) -> Dataset:
    """See module docstring. ``id_col`` must be unique; packing order is
    ascending id (deterministic — re-running yields byte-identical
    shard layouts, which is what makes a packed corpus resumable)."""
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _count(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            pc.coalesce(t.column(text_col), pa.scalar("")), _TOKEN_RE
        ).cast(pa.int64())
        return pa.table({id_col: t.column(id_col), "n_tokens": n})

    # Pass 1: tiny projection, materialized once so the id-range probe
    # and the two downstream passes never re-read the text column.
    counts = ds.select_columns([id_col, text_col]).map_batches(
        _count, batch_format="pyarrow"
    ).materialize()

    agg = counts.aggregate(Min(id_col), Max(id_col))
    lo, hi = agg[f"min({id_col})"], agg[f"max({id_col})"]
    span = max(int(hi) - int(lo) + 1, 1)
    P = num_partitions

    def _bucket(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy()
        b = ((ids.astype(np.int64) - int(lo)) * P // span).astype(np.int32)
        return t.append_column("__bucket", pa.array(b))

    bucketed = counts.map_batches(_bucket, batch_format="pyarrow")

    # Pass 2: per-bucket sums -> driver prefix offsets (P numbers).
    sums = bucketed.groupby("__bucket").aggregate(
        ray.data.aggregate.Sum("n_tokens", alias_name="s")
    ).to_pandas().sort_values("__bucket")
    bucket_base = np.zeros(P, dtype=np.int64)
    bucket_base[sums["__bucket"].to_numpy()] = np.concatenate(
        [[0], np.cumsum(sums["s"].to_numpy())]
    )[:-1]

    # Pass 3: bucket-local ordered cumsum + global offset. A reduce
    # partition holds one or more COMPLETE buckets (the exchange hashes
    # the bucket id), so the scan is segmented: global cumsum minus the
    # cumsum at each bucket's first row.
    def _scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["__bucket", id_col], kind="mergesort")
        n = df["n_tokens"].to_numpy()
        b = df["__bucket"].to_numpy()
        excl = np.concatenate([[0], np.cumsum(n)[:-1]])
        seg_start = np.concatenate([[0], 1 + np.flatnonzero(b[1:] != b[:-1])])
        # Subtract each segment's starting cumsum, add its global base.
        ind = np.zeros(len(b), np.int64)
        ind[seg_start] = 1
        seg_id = np.cumsum(ind) - 1
        excl = excl - excl[seg_start][seg_id] + bucket_base[b]
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_tokens": n,
            "seq_id": (excl // window).astype(np.int64),
            "seq_offset": (excl % window).astype(np.int64),
        })

    return grouped_apply(bucketed, ["__bucket"], _scan, num_partitions=P)
