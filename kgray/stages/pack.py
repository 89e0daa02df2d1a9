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


def _bfd_histogram_pack(lengths: np.ndarray, window: int):
    """Best-fit-decreasing bin packing on the LENGTH HISTOGRAM — the
    scalable formulation of Krell et al. 2021's histogram packing
    ("Efficient Sequence Packing without Cross-contamination",
    arXiv:2107.02027): all packing decisions operate on counts per
    length, so the decision loop is O(window·distinct_lengths) —
    independent of document count — and the doc→bin assignment is
    replayed afterwards with one vectorized slice per decision event.

    Input: ``lengths`` (int64, each in [1, window]) in the DOC ORDER
    that assignment should consume (caller sorts by id for
    determinism). Returns ``(bin_id, offset, n_bins)`` aligned with
    ``lengths``: ``bin_id`` in [0, n_bins), ``offset`` = bin fill
    before the doc. Longest lengths pack first; each batch takes the
    TIGHTEST remaining capacity (best fit); capacity queues are FIFO.
    """
    cnt = np.bincount(lengths, minlength=window + 1).astype(np.int64)
    # remaining-capacity histogram: rem_cnt[r] = open bins with r left.
    # FIFO bin-id queue per capacity (replay state lives alongside the
    # decision state so batching and assignment can't diverge).
    rem_cnt = np.zeros(window + 1, dtype=np.int64)
    queues: dict = {}  # remaining capacity -> FIFO list of bin ids

    order = np.argsort(-lengths, kind="stable")  # longest first, stable
    cursor = 0  # docs of each length consumed in `order` sequence
    bin_of = np.empty(len(lengths), dtype=np.int64)
    off_of = np.empty(len(lengths), dtype=np.int64)
    n_bins = 0

    def _fill(bin_ids: np.ndarray, r: int, j: int, t: int, length: int):
        """Assign the next ``len(bin_ids)`` bins (all at remaining
        ``r``): ``j`` docs each, last bin ``t`` (0 < t <= j). Bins with
        remaining >= length after the fill keep absorbing same-length
        docs ONLY while docs remain — equal to per-doc tightest-fit
        because a partially filled bin is strictly tighter than its
        peers at ``r``."""
        nonlocal cursor
        b = len(bin_ids)
        counts = np.full(b, j, dtype=np.int64)
        counts[-1] = t
        total = int(counts.sum())
        docs = order[cursor:cursor + total]
        cursor += total
        per_doc_bin = np.repeat(bin_ids, counts)
        first = np.repeat(np.cumsum(counts) - counts, counts)
        within = np.arange(total, dtype=np.int64) - first
        bin_of[docs] = per_doc_bin
        off_of[docs] = (window - r) + within * length
        for bid, c_i in zip(bin_ids.tolist(), counts.tolist()):
            nr = r - int(c_i) * length
            rem_cnt[nr] += 1
            queues.setdefault(nr, []).append(bid)

    for length in range(window, 0, -1):
        c = int(cnt[length])
        while c > 0:
            fits = np.flatnonzero(rem_cnt[length:]) + length
            if len(fits):
                r = int(fits[0])
                j = r // length  # docs this bin absorbs before r < length
                use = min(int(rem_cnt[r]), -(-c // j))  # bins needed at r
                rem_cnt[r] -= use
                q = queues[r]
                ids, queues[r] = np.asarray(q[:use], dtype=np.int64), q[use:]
                took = min(c, use * j)
                t = took - (use - 1) * j  # docs in the LAST used bin
            else:
                r = window
                j = r // length
                use = -(-c // j)
                ids = np.arange(n_bins, n_bins + use, dtype=np.int64)
                n_bins += use
                took = c
                t = took - (use - 1) * j
            _fill(ids, r, j, t, length)
            c -= took
    return bin_of, off_of, n_bins


def bestfit_pack(
    ds: Dataset,
    window: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: Optional[int] = None,
    stripe: int = 1 << 33,
) -> Dataset:
    """Whole-document bin packing into ``window``-token bins — the
    padding-minimizing alternative to :func:`pack_sequences`' GPT-style
    contiguous split: a document is NEVER split across sequences
    (no cross-document attention contamination), and best-fit-decreasing
    keeps padding waste within the classic ``11/9·OPT + 6/9`` bound.

    Output: ``(id_col, n_tokens, seq_id, seq_offset)`` — same schema as
    :func:`pack_sequences`; ``seq_offset`` is the bin fill before the
    doc, so pad = window − bin total. Token-less docs drop; docs with
    ``n_tokens ≥ window`` get a bin of their own (offset 0; the shard
    writer truncates).

    Scale shape: one text pass compacts to the tiny ``(id, n_tokens)``
    projection; docs hash-partition by id and each partition packs
    INDEPENDENTLY with :func:`_bfd_histogram_pack` — the decision loop
    is on the length histogram (O(window·distinct) regardless of doc
    count) and assignment replays with one vectorized slice per
    decision. ``seq_id = partition·stripe + local_bin`` keeps ids
    globally unique without coordination. Partition-local packing is
    the documented approximation: each partition independently meets
    the BFD bound and hash partitions are statistically identical, so
    the global utilization matches single-node BFD to O(P·window)
    wasted tokens — while a global packer would serialize the corpus
    through one node.
    """
    if num_partitions is None:
        num_partitions = auto_partitions()
    P = num_partitions

    def _count(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            pc.coalesce(t.column(text_col), pa.scalar("")), _TOKEN_RE
        ).cast(pa.int64())
        out = pa.table({id_col: t.column(id_col), "n_tokens": n})
        return out.filter(pc.greater(n, 0))

    counts = ds.select_columns([id_col, text_col]).map_batches(
        _count, batch_format="pyarrow"
    )

    def _pack(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pk, g in df.groupby("__pk", sort=True):
            g = g.sort_values(id_col, kind="mergesort")
            n = g["n_tokens"].to_numpy()
            clipped = np.minimum(n, window)
            bin_of, off_of, _ = _bfd_histogram_pack(clipped, window)
            out.append(pd.DataFrame({
                id_col: g[id_col].to_numpy(),
                "n_tokens": n,
                "seq_id": int(pk) * stripe + bin_of,
                "seq_offset": off_of,
            }))
        return (pd.concat(out, ignore_index=True) if out else
                pd.DataFrame({id_col: [], "n_tokens": [], "seq_id": [],
                              "seq_offset": []}).astype(np.int64, errors="ignore"))

    def _pk(t: pa.Table) -> pa.Table:
        import pandas as _pd

        h = _pd.util.hash_array(
            t.column(id_col).to_numpy(zero_copy_only=False)).astype(np.uint64)
        return t.append_column("__pk", pa.array((h % np.uint64(P)).astype(np.int64)))

    keyed = counts.map_batches(_pk, batch_format="pyarrow")
    return grouped_apply(keyed, ["__pk"], _pack, num_partitions=P)
