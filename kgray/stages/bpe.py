"""Distributed BPE tokenizer TRAINING (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — the engine's
``vocab_build`` assigns ids to whole words and ``bpe_token_count``
counts tokens under a FIXED GPT-2-style pre-tokenizer; this module
learns the merge table itself, the remaining core step of a
training-data pipeline that owns its tokenizer.

Algorithm (classic corpus-level BPE over ``\\S+`` words, character
symbols to start):

    repeat k times:
        count adjacent symbol pairs across the corpus
        merge the most frequent pair (ties: lexicographically
        smallest) everywhere, leftmost-first within each word

Ray shape per iteration — the corpus is held as a MATERIALIZED
integer-symbol dataset and re-written in place-style passes:

1. **Pair count**: ``map_batches`` computes per-batch pair counts from
   the flat symbol array with one ``np.unique`` over a combined
   ``(left << 32) | right`` key — no Python per symbol; partials are
   one row per DISTINCT pair seen in the batch and fold on the driver
   (documented small side: the pair vocabulary, bounded by the symbol
   vocabulary's adjacency — the same contract as ``topk_tokens``'s
   P·k driver fold).
2. **Merge apply**: the chosen pair broadcasts (two ints); one
   ``map_batches`` pass rewrites each batch's symbol arrays with a
   vectorized leftmost-non-overlapping merge (run detection + parity
   selection — no Python loop over symbols).

So training k merges costs k pair-count passes + k rewrite passes over
a corpus that lives in the object store as int32 arrays (~4 bytes per
character initially, shrinking as merges apply). That IS the canonical
data movement of distributed BPE — each pass is embarrassingly
parallel and the only global state is the O(k) merge table plus the
O(distinct pairs) count fold.

Determinism: symbol ids are assigned by FIRST-SEEN order scanning the
initial corpus in ascending ``(doc_id)`` batch order? No — initial
symbol ids are UNICODE CODE POINTS (stable regardless of data order),
merged symbols get ids ``0x110000 + rank`` — strictly above every
possible code point, so raw characters and learned merges can never
collide. Pair-count ties break on the
SMALLEST ``(left_id, right_id)`` pair, making the whole merge table a
pure function of the corpus multiset.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data import Dataset

from kgray.stages.corpus import flat_words

# First merged-symbol id. Must sit ABOVE the entire Unicode code-point
# range (0x10FFFF): initial symbols are raw code points from a utf-32
# decode, so a smaller base (e.g. 1<<16) would collide merge ids with
# supplementary-plane characters (emoji, CJK Ext-B), silently corrupting
# pair counts and making emitted token ids ambiguous. 0x110000 + rank
# still fits comfortably in int32.
_MERGED_BASE = 0x110000


def _words_to_symbol_table(t: pa.Table, text_col: str, max_word_len: int) -> pa.Table:
    """One batch → the (word_id-local) symbol representation: distinct
    words WITH MULTIPLICITY collapsed per batch (classic BPE trains on
    the word histogram, not the running text — pairs never cross word
    boundaries). Output columns: ``word`` (string, for cross-batch
    fold), ``freq`` (int64)."""
    flat, _ = flat_words(t.column(text_col))
    if len(flat) == 0:
        return pa.table({"word": pa.array([], pa.string()),
                         "freq": pa.array([], pa.int64())})
    vc = pc.value_counts(flat)
    words = vc.field("values")
    lens = pc.utf8_length(words)
    keep = pc.and_(pc.greater(lens, 0), pc.less_equal(lens, max_word_len))
    words = words.filter(keep)
    freq = vc.field("counts").filter(keep).cast(pa.int64())
    return pa.table({"word": words, "freq": freq})


def _explode_codepoints(words: np.ndarray, freqs: np.ndarray):
    """(flat_symbols int32, offsets int64, freqs) for the word list —
    symbols start as unicode code points."""
    if len(words) == 0:
        return (np.zeros(0, np.int32), np.zeros(1, np.int64),
                np.zeros(0, np.int64))
    lens = np.fromiter((len(w) for w in words), dtype=np.int64, count=len(words))
    offsets = np.concatenate([[0], np.cumsum(lens)])
    joined = "".join(words)
    flat = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.int32)
    return flat, offsets, freqs.astype(np.int64)


def _pair_counts(flat: np.ndarray, offsets: np.ndarray, freqs: np.ndarray):
    """Weighted adjacent-pair counts, word-boundary aware, vectorized:
    one combined ``left<<32|right`` key + ``np.unique``."""
    n = len(flat)
    if n < 2:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    left, right = flat[:-1].astype(np.int64), flat[1:].astype(np.int64)
    # a pair at position i is INSIDE a word unless i+1 is a word start
    starts = np.zeros(n, dtype=bool)
    starts[offsets[:-1][offsets[:-1] < n]] = True
    inside = ~starts[1:]
    word_of = np.cumsum(starts) - 1
    w = freqs[word_of[:-1]]
    key = (left << 32) | right
    key = key[inside]
    w = w[inside]
    if len(key) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    uniq, inv = np.unique(key, return_inverse=True)
    cnt = np.bincount(inv, weights=w.astype(np.float64)).astype(np.int64)
    return uniq, cnt


def _apply_merge(flat: np.ndarray, offsets: np.ndarray, a: int, b: int, new_id: int):
    """Leftmost-non-overlapping replacement of (a, b) → new_id, word-
    boundary aware, no Python loop: candidate positions → consecutive
    runs (only consecutive candidates can overlap, and only when
    a == b) → keep even parity within each run."""
    n = len(flat)
    if n < 2:
        return flat, offsets
    starts = np.zeros(n, dtype=bool)
    starts[offsets[:-1][offsets[:-1] < n]] = True
    cand = np.flatnonzero((flat[:-1] == a) & (flat[1:] == b) & ~starts[1:])
    if len(cand) == 0:
        return flat, offsets
    if a == b:
        # runs of consecutive candidates: aaa → merge positions 0, 2, ...
        run_start = np.concatenate([[True], np.diff(cand) > 1])
        run_id = np.cumsum(run_start) - 1
        first = cand[np.flatnonzero(run_start)][run_id]
        keep = ((cand - first) % 2) == 0
        sel = cand[keep]
    else:
        sel = cand  # distinct symbols cannot produce overlapping pairs
    out = flat.copy()
    out[sel] = np.int32(new_id)
    drop = np.zeros(n, dtype=bool)
    drop[sel + 1] = True
    # re-aim offsets: each word's start shifts by the merges before it
    removed_before = np.concatenate([[0], np.cumsum(drop)])
    new_offsets = offsets - removed_before[offsets]
    return out[~drop], new_offsets


class _WordSymbols:
    """Per-batch training state rewritten each merge pass: the batch's
    word histogram in flat-symbol form, carried through the iterations
    as plain Arrow columns (word kept for the final vocab report)."""

    @staticmethod
    def init_batch(t: pa.Table, max_word_len: int) -> pa.Table:
        words = t.column("word").to_pandas().to_numpy()
        freqs = t.column("freq").to_numpy()
        flat, offsets, freqs = _explode_codepoints(words, freqs)
        lens = np.diff(offsets)
        return pa.table({
            "word": pa.array(words, pa.string()),
            "freq": pa.array(freqs),
            "syms": pa.ListArray.from_arrays(
                pa.array(np.concatenate([[0], np.cumsum(lens)]), type=pa.int32()),
                pa.array(flat, type=pa.int32())),
        })

    @staticmethod
    def count_batch(t: pa.Table) -> pa.Table:
        lst = t.column("syms")
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        flat = lst.flatten().to_numpy(zero_copy_only=False).astype(np.int32)
        offs = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        freqs = t.column("freq").to_numpy()
        key, cnt = _pair_counts(flat, offs, freqs)
        return pa.table({"pair": pa.array(key), "n": pa.array(cnt)})

    @staticmethod
    def merge_batch(t: pa.Table, a: int, b: int, new_id: int) -> pa.Table:
        lst = t.column("syms")
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        flat = lst.flatten().to_numpy(zero_copy_only=False).astype(np.int32)
        offs = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        new_flat, new_offs = _apply_merge(flat, offs, a, b, new_id)
        return pa.table({
            "word": t.column("word"),
            "freq": t.column("freq"),
            "syms": pa.ListArray.from_arrays(
                pa.array(new_offs, type=pa.int32()),
                pa.array(new_flat, type=pa.int32())),
        })


def bpe_train(
    ds: Dataset,
    num_merges: int = 30,
    text_col: str = "text",
    max_word_len: int = 64,
    min_pair_count: int = 2,
    num_partitions: Optional[int] = None,
    driver_vocab_limit: int = 2_000_000,
) -> pa.Table:
    """Learn ``num_merges`` BPE merges over the corpus (see module
    docstring). Returns the merge table ``(rank, left, right, new_id,
    count)`` — ``left``/``right`` are symbol ids (code points <
    0x110000, merged ids ≥ 0x110000), ``count`` the pair frequency at
    selection
    time. Stops early when no pair reaches ``min_pair_count``.

    The word histogram (already folded per batch) is the training
    state. The only corpus-scale pass is the fold itself: the
    histogram is orders of magnitude smaller than the corpus (word
    TYPES, not tokens), so when its distinct-word count fits
    ``driver_vocab_limit`` the whole merge loop runs driver-local with
    the same vectorized kernels — zero per-iteration Dataset overhead
    (measured 9.0 s → sub-second for 20 merges at sf0.1). Above the
    limit each iteration runs one distributed count pass and one merge
    pass over the materialized state. ``max_word_len`` drops
    pathological unsplittable tokens (URLs, DNA strings) exactly as
    production BPE trainers cap word length.
    """
    hist = ds.select_columns([text_col]).map_batches(
        lambda t: _words_to_symbol_table(t, text_col, max_word_len),
        batch_format="pyarrow",
    )

    # Cross-batch fold of the word histogram: one word-keyed combiner
    # exchange, then each reduced batch becomes independent training
    # state (a word lives in exactly one batch afterwards).
    from kgray.kernels.hashagg import auto_partitions, grouped_apply

    if num_partitions is None:
        num_partitions = auto_partitions()

    def _sum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("word", as_index=False, sort=False)["freq"].sum()

    folded = grouped_apply(hist, ["word"], _sum,
                           num_partitions=num_partitions, map_side=_sum).materialize()

    if folded.count() <= driver_vocab_limit:
        # Driver-local loop over the folded histogram: same kernels,
        # no Dataset execution per iteration.
        df = folded.to_pandas()
        flat, offsets, freqs = _explode_codepoints(
            df["word"].to_numpy(), df["freq"].to_numpy())
        merges: List[Tuple[int, int, int, int, int]] = []
        next_id = _MERGED_BASE
        for rank in range(num_merges):
            key, cnt = _pair_counts(flat, offsets, freqs)
            if len(key) == 0:
                break
            best_n = int(cnt.max())
            if best_n < min_pair_count:
                break
            pair = int(key[cnt == best_n].min())
            a, b = pair >> 32, pair & 0xFFFFFFFF
            merges.append((rank, a, b, next_id, best_n))
            flat, offsets = _apply_merge(flat, offsets, a, b, next_id)
            next_id += 1
        return pa.table({
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.int64()),
            "right": pa.array([m[2] for m in merges], pa.int64()),
            "new_id": pa.array([m[3] for m in merges], pa.int64()),
            "count": pa.array([m[4] for m in merges], pa.int64()),
        })

    state = folded.map_batches(
        lambda t: _WordSymbols.init_batch(t, max_word_len),
        batch_format="pyarrow",
    ).materialize()

    merges: List[Tuple[int, int, int, int, int]] = []
    next_id = _MERGED_BASE
    for rank in range(num_merges):
        parts = state.map_batches(
            _WordSymbols.count_batch, batch_format="pyarrow").to_pandas()
        if not len(parts):
            break
        agg = parts.groupby("pair", as_index=False, sort=False)["n"].sum()
        best_n = int(agg["n"].max()) if len(agg) else 0
        if best_n < min_pair_count:
            break
        cand = agg[agg["n"] == best_n]["pair"].to_numpy()
        pair = int(cand.min())  # lexicographic (left, right) tie-break
        a, b = pair >> 32, pair & 0xFFFFFFFF
        merges.append((rank, a, b, next_id, best_n))
        na, nb, nn = a, b, next_id

        state = state.map_batches(
            lambda t, _a=na, _b=nb, _n=nn: _WordSymbols.merge_batch(t, _a, _b, _n),
            batch_format="pyarrow",
        ).materialize()
        next_id += 1

    return pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.int64()),
        "right": pa.array([m[2] for m in merges], pa.int64()),
        "new_id": pa.array([m[3] for m in merges], pa.int64()),
        "count": pa.array([m[4] for m in merges], pa.int64()),
    })


def bpe_encode_count(
    ds: Dataset,
    merges: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Tokenize the corpus under a learned merge table (the consumer
    side of :func:`bpe_train`): per-document token count after applying
    every merge in rank order. Output: ``(id_col, n_tokens)``, one row
    per input doc (token-less docs count 0).

    Map-only, ONE Dataset pass — the merge table (O(k) ints) broadcasts
    in the task closure and all k merge applications run in-memory per
    batch over the batch's DISTINCT words (the per-batch uniq trick:
    tokenize each unique word once, scatter counts back by inverse
    index). No cap on word length here — training capped pathological
    words away from the LEARNED merges, but encoding must still count
    every word (worst case it stays at character granularity)."""
    mlist = list(zip(
        merges.column("left").to_pylist(),
        merges.column("right").to_pylist(),
        merges.column("new_id").to_pylist(),
    ))

    def _count(t: pa.Table) -> pa.Table:
        flat_w, off_w = flat_words(t.column(text_col))
        n_docs = len(t)
        if len(flat_w) == 0:
            return pa.table({
                id_col: t.column(id_col),
                "n_tokens": pa.array(np.zeros(n_docs, np.int64)),
            })
        inv, uniques = pd.factorize(flat_w.to_pandas(), sort=False)
        flat, offsets, _ = _explode_codepoints(
            uniques.to_numpy() if hasattr(uniques, "to_numpy") else np.asarray(uniques),
            np.ones(len(uniques), np.int64))
        for a, b, new_id in mlist:
            flat, offsets = _apply_merge(flat, offsets, a, b, new_id)
        per_word = np.diff(offsets)
        per_instance = per_word[inv]
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(off_w))
        n_tokens = np.bincount(doc_of, weights=per_instance.astype(np.float64),
                               minlength=n_docs).astype(np.int64)
        return pa.table({
            id_col: t.column(id_col),
            "n_tokens": pa.array(n_tokens),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        _count, batch_format="pyarrow")


def bpe_encode_ids(
    ds: Dataset,
    merges: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Tokenize to ACTUAL token-id sequences — the training artifact
    :func:`bpe_encode_count` only sizes. Output: ``(id_col, token_ids
    list<int32>, n_tokens)``; word tokens concatenate in document
    order (no between-word separator id — add one downstream if the
    model wants it). Same map-only one-pass shape and unique-word
    trick as the count variant; the per-instance id gather is a single
    vectorized ``take`` built from repeat/cumsum arithmetic."""
    mlist = list(zip(
        merges.column("left").to_pylist(),
        merges.column("right").to_pylist(),
        merges.column("new_id").to_pylist(),
    ))

    def _encode(t: pa.Table) -> pa.Table:
        flat_w, off_w = flat_words(t.column(text_col))
        n_docs = len(t)
        if len(flat_w) == 0:
            empty = pa.ListArray.from_arrays(
                pa.array(np.zeros(n_docs + 1, np.int32)),
                pa.array([], type=pa.int32()))
            return pa.table({id_col: t.column(id_col), "token_ids": empty,
                             "n_tokens": pa.array(np.zeros(n_docs, np.int64))})
        inv, uniques = pd.factorize(flat_w.to_pandas(), sort=False)
        flat, offsets, _ = _explode_codepoints(
            uniques.to_numpy() if hasattr(uniques, "to_numpy") else np.asarray(uniques),
            np.ones(len(uniques), np.int64))
        for a, b, new_id in mlist:
            flat, offsets = _apply_merge(flat, offsets, a, b, new_id)
        per_word = np.diff(offsets)
        # gather indices: for instance j (word u = inv[j]), the range
        # offsets[u] .. offsets[u]+per_word[u]
        inst_len = per_word[inv]
        inst_start = offsets[:-1][inv]
        total = int(inst_len.sum())
        first = np.repeat(np.cumsum(inst_len) - inst_len, inst_len)
        within = np.arange(total, dtype=np.int64) - first
        take = np.repeat(inst_start, inst_len) + within
        ids_flat = flat[take]
        # doc offsets: token count per doc = sum of instance lengths
        n_words_per_doc = np.diff(off_w)
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_words_per_doc)
        n_tokens = np.bincount(doc_of, weights=inst_len.astype(np.float64),
                               minlength=n_docs).astype(np.int64)
        doc_offsets = np.concatenate([[0], np.cumsum(n_tokens)])
        return pa.table({
            id_col: t.column(id_col),
            "token_ids": pa.ListArray.from_arrays(
                pa.array(doc_offsets, type=pa.int32()),
                pa.array(ids_flat, type=pa.int32())),
            "n_tokens": pa.array(n_tokens),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        _encode, batch_format="pyarrow")


def bpe_train_reference(texts, num_merges=30, max_word_len=64, min_pair_count=2):
    """Pure-Python per-word BPE trainer (the pytest ground truth) —
    same symbol ids, same tie rule, naive dict counting."""
    from collections import Counter
    import re

    words = Counter()
    for t in texts:
        for w in re.findall(r"\S+", t or ""):
            if 0 < len(w) <= max_word_len:
                words[w] += 1
    state = {w: [ord(c) for c in w] for w in words}
    merges = []
    next_id = _MERGED_BASE
    for rank in range(num_merges):
        pairs = Counter()
        for w, syms in state.items():
            f = words[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best_n = max(pairs.values())
        if best_n < min_pair_count:
            break
        a, b = min(p for p, n in pairs.items() if n == best_n)
        merges.append((rank, a, b, next_id, best_n))
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(next_id)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
        next_id += 1
    return merges
