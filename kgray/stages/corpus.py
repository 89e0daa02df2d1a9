"""Corpus-level text operators: vocabulary heavy hitters, chunk
(paragraph-style) dedup, benchmark decontamination, grouped exact
quantiles.

These are the corpus-wide passes of a web-scale curation pipeline
(the reference engine stops at per-file KGX ops; these extend the same
exchange machinery to whole-corpus text statistics — see
reference merge_utils.py:260-320 for its closest analog, the grouped
DISTINCT aggregations, which `grouped_apply` generalizes).

Scale shape shared by every operator here:

* the map side is pure Arrow/numpy over zero-copy batches — words come
  from ONE `utf8_split_whitespace` kernel per batch, chunk/gram
  assembly is `ListArray.from_arrays` + `binary_join` (no per-row
  Python), hashing is one `hash_pandas_object`/`hash_array` C call
  over the flattened token array;
* the exchange key is a fixed-width hash (token/chunk/gram), never the
  document — at 100 TB only tokens or chunk strings move, and a
  map-side combiner shrinks them before the shuffle;
* reduce sides are pandas/numpy C-speed per-partition kernels.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data import Dataset

from kgray.kernels.hashagg import auto_partitions, grouped_apply

# Mix constants for rolling n-gram hashes (odd, full-width).
_MIX = np.uint64(0x9E3779B97F4A7C15)


def flat_words(text: pa.ChunkedArray | pa.Array) -> Tuple[pa.Array, np.ndarray]:
    """``\\S+`` tokenization of a string column, vectorized.

    Returns ``(flat, offsets)`` where ``flat`` is the concatenated word
    array (one Arrow StringArray) and ``offsets[i]:offsets[i+1]`` is
    row i's slice of it. NULL text behaves as empty. One Arrow split
    kernel + one boolean filter — the empty edge tokens that
    ``utf8_split_whitespace`` emits for leading/trailing whitespace are
    masked out so the result matches ``regexp_extract_all(text,'\\S+')``
    exactly (the SQL-oracle definition used across this package).
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.utf8_split_whitespace(pc.coalesce(text, pa.scalar("")))
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    raw_off = words.offsets.to_numpy().astype(np.int64)
    keep = pc.greater(pc.utf8_length(flat), 0)
    keep_np = keep.to_numpy(zero_copy_only=False)
    # Per-row nonempty counts -> new offsets.
    if len(flat) == 0:
        counts = np.zeros(len(words), dtype=np.int64)
    else:
        cum = np.concatenate([[0], np.cumsum(keep_np.astype(np.int64))])
        counts = cum[raw_off[1:]] - cum[raw_off[:-1]]
    offsets = np.concatenate([[0], np.cumsum(counts)])
    return flat.filter(keep), offsets


def _chunk_offsets(doc_offsets: np.ndarray, chunk_words: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Chunk boundaries every ``chunk_words`` words within each doc.

    Returns (chunk_start_word, doc_index_per_chunk, pos_per_chunk) —
    all numpy, no Python loop. The trailing partial chunk is kept.
    """
    n_words = doc_offsets[1:] - doc_offsets[:-1]
    n_chunks = -(-n_words // chunk_words)  # ceil; 0 for empty docs
    doc_idx = np.repeat(np.arange(len(n_words), dtype=np.int64), n_chunks)
    total = int(n_chunks.sum())
    if total == 0:
        return np.zeros(0, np.int64), doc_idx, np.zeros(0, np.int64)
    # Position of each chunk within its doc: global arange minus each
    # doc's first-chunk index.
    first = np.concatenate([[0], np.cumsum(n_chunks)])[:-1]
    pos = np.arange(total, dtype=np.int64) - np.repeat(first, n_chunks)
    start = doc_offsets[:-1][doc_idx] + pos * chunk_words
    return start, doc_idx, pos


def chunk_strings(
    text: pa.ChunkedArray | pa.Array, chunk_words: int
) -> Tuple[pa.Array, np.ndarray, np.ndarray]:
    """Split each document into consecutive ``chunk_words``-word chunks
    (last chunk partial), fully vectorized.

    Returns ``(chunks, doc_idx, pos)``: chunk strings (words re-joined
    with single spaces via one ``binary_join`` kernel), the row index
    each chunk came from, and its 0-based position within the doc.
    """
    flat, doc_off = flat_words(text)
    start, doc_idx, pos = _chunk_offsets(doc_off, chunk_words)
    end = np.minimum(start + chunk_words, doc_off[1:][doc_idx] if len(doc_idx) else start)
    # ListArray offsets must be monotone over a single values array:
    # chunks tile the word array contiguously, so starts are sorted and
    # end[i] == start[i+1] within a doc; across docs they're contiguous
    # too. offsets = [start..., last end].
    offs = np.concatenate([start, end[-1:]]) if len(start) else np.zeros(1, np.int64)
    lst = pa.ListArray.from_arrays(pa.array(offs, type=pa.int32()), flat)
    return pc.binary_join(lst, pa.scalar(" ")), doc_idx, pos


# ---------------------------------------------------------------------------
# Top-k vocabulary heavy hitters
# ---------------------------------------------------------------------------

def topk_tokens(ds: Dataset, k: int = 50, text_col: str = "text",
                num_partitions: Optional[int] = None) -> pa.Table:
    """Global top-k most frequent ``\\S+`` tokens (count desc, token asc).

    Map side: one split kernel + one ``value_counts`` per batch — the
    exchange carries (token, partial_count), already combined, never
    raw text. Reduce side: per-partition sum + LOCAL top-k (a token
    hashes to exactly one partition, so per-partition top-k is exact);
    only P·k rows reach the driver for the final merge.
    """
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _count(t: pa.Table) -> pa.Table:
        flat, _ = flat_words(t.column(text_col))
        vc = pc.value_counts(flat)
        if len(vc) == 0:
            return pa.table({"tok": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        return pa.table({"tok": vc.field("values"), "n": vc.field("counts")})

    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("tok", as_index=False, sort=False)["n"].sum()

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("tok", as_index=False, sort=False)["n"].sum()
        agg = agg.sort_values(["n", "tok"], ascending=[False, True], kind="mergesort")
        return agg.head(k)

    counted = ds.map_batches(_count, batch_format="pyarrow")
    partial = grouped_apply(counted, ["tok"], _reduce, num_partitions=num_partitions,
                            map_side=_combine)
    # P·k candidate rows: tiny, final merge on the driver.
    top = partial.to_pandas().sort_values(["n", "tok"], ascending=[False, True],
                                          kind="mergesort").head(k)
    return pa.Table.from_pandas(top.reset_index(drop=True), preserve_index=False)


# ---------------------------------------------------------------------------
# Chunk-level (paragraph-style) exact dedup
# ---------------------------------------------------------------------------

def chunk_dedup(
    ds: Dataset,
    chunk_words: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: Optional[int] = None,
) -> Dataset:
    """CCNet-style segment dedup: split every document into consecutive
    ``chunk_words``-word chunks, keep only the globally FIRST occurrence
    of each distinct chunk (min ``(doc_id, pos)``), and reassemble each
    document from its surviving chunks in order.

    Output: ``(id_col, text_col, n_kept, n_dropped)`` — one row per
    input document, ``text_col`` rebuilt from kept chunks (``''`` when
    everything was dropped).

    Scale shape: two hash exchanges, each moving a chunk at most once —
    (1) partition by chunk text, per-partition vectorized first-wins;
    (2) partition survivors + per-doc chunk counts by doc id,
    per-partition ordered reassembly via one ``binary_join``. The doc
    text never travels whole; chunk-less (empty/whitespace) docs ride
    sentinel rows through the same two exchanges, so the input is
    consumed exactly ONCE — no DAG fork (a fork re-runs the whole lazy
    upstream prefix a second time and can deadlock Ray's sort-boundary
    sampling on small CPU budgets).
    """
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _explode(t: pa.Table) -> pa.Table:
        return _explode_chunks(t, id_col, text_col, chunk_words)

    def _first_wins(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([ "chunk", id_col, "pos"], kind="mergesort")
        keep = ~df["chunk"].duplicated()
        # Sentinel rows (pos=-1, chunk-less docs) are never "kept" as
        # text; _reassemble_kept turns them into empty-output rows.
        keep &= df["pos"].to_numpy() >= 0
        df = df.assign(__keep=keep)
        return df

    exploded = ds.select_columns([id_col, text_col]).map_batches(
        _explode, batch_format="pyarrow"
    )
    flagged = grouped_apply(exploded, ["chunk"], _first_wins,
                            num_partitions=num_partitions)
    return grouped_apply(
        flagged, [id_col],
        lambda df: _reassemble_kept(df, id_col, text_col),
        num_partitions=num_partitions,
    )


def _explode_chunks(t: pa.Table, id_col: str, text_col: str, chunk_words: int) -> pa.Table:
    """Explode docs into ``(id, pos, chunk)`` rows (shared map side of
    :func:`chunk_dedup` and :func:`boilerplate_filter`).

    Docs that produce ZERO chunks (empty/whitespace text) emit one
    sentinel row ``(pos=-1, chunk='')`` so they ride the same exchanges
    as real chunks and come back as empty-output rows from
    ``_reassemble_kept``. This keeps the operator single-consumption:
    no second corpus scan for the empty-doc side table, no DAG fork —
    a fork re-executes the whole lazy upstream prefix and can deadlock
    Ray's sort-boundary sampling when idle upstream actors hold every
    CPU slot (observed at num_cpus=4)."""
    chunks, doc_idx, pos = chunk_strings(t.column(text_col), chunk_words)
    ids_all = t.column(id_col).combine_chunks()
    tbl = pa.table({
        id_col: ids_all.take(pa.array(doc_idx)),
        "pos": pa.array(pos),
        "chunk": chunks,
    })
    has_chunks = np.zeros(len(t), dtype=bool)
    if len(doc_idx):
        has_chunks[doc_idx] = True
    empty_rows = np.flatnonzero(~has_chunks)
    if len(empty_rows):
        sent = pa.table({
            id_col: ids_all.take(pa.array(empty_rows)),
            "pos": pa.array(np.full(len(empty_rows), -1, dtype=np.int64)),
            "chunk": pa.array([""] * len(empty_rows), type=tbl.schema.field("chunk").type),
        })
        tbl = pa.concat_tables([tbl, sent.cast(tbl.schema)]).combine_chunks()
    return tbl


def _reassemble_kept(df: pd.DataFrame, id_col: str, text_col: str) -> pd.DataFrame:
    """Rebuild each document from its ``__keep``-flagged chunks in
    ``pos`` order (shared reduce side of :func:`chunk_dedup` and
    :func:`boilerplate_filter`). Vectorized join via ``binary_join``.

    Sentinel rows (``pos=-1`` — chunk-less docs, see
    :func:`_explode_chunks`) come back as ``('', 0, 0)`` output rows."""
    pos_np = df["pos"].to_numpy()
    sentinel_ids = df.loc[pos_np < 0, id_col].to_numpy()
    if len(sentinel_ids):
        df = df[pos_np >= 0]
    df = df.sort_values([id_col, "pos"], kind="mergesort")
    kept = df[df["__keep"]]
    gk = kept.groupby(id_col, sort=False)
    # Vectorized join of kept chunks per doc via Arrow binary_join.
    sizes = gk.size()
    offs = np.concatenate([[0], np.cumsum(sizes.to_numpy())]).astype(np.int64)
    lst = pa.ListArray.from_arrays(
        pa.array(offs, type=pa.int32()), pa.array(kept["chunk"].to_numpy(), pa.string())
    )
    texts = pc.binary_join(lst, pa.scalar(" ")).to_pandas()
    n_tot = df.groupby(id_col, sort=False).size()
    out = pd.DataFrame({id_col: sizes.index, text_col: texts.to_numpy(),
                        "n_kept": sizes.to_numpy().astype(np.int64)})
    # Docs whose every chunk was dropped:
    dropped_only = n_tot.index.difference(sizes.index)
    if len(dropped_only):
        out = pd.concat([out, pd.DataFrame({
            id_col: dropped_only, text_col: "", "n_kept": np.int64(0)})],
            ignore_index=True)
    out = out.merge(n_tot.rename("n_total").reset_index(), on=id_col)
    out["n_dropped"] = (out.pop("n_total") - out["n_kept"]).astype(np.int64)
    if len(sentinel_ids):
        out = pd.concat([out, pd.DataFrame({
            id_col: sentinel_ids, text_col: "",
            "n_kept": np.int64(0), "n_dropped": np.int64(0)})],
            ignore_index=True)
    return out


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap)
# ---------------------------------------------------------------------------

def _gram_hashes(text: pa.ChunkedArray | pa.Array, n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Rolling word-``n``-gram hashes per row, vectorized.

    Words are hashed with pandas' C string hash ONCE over the flattened
    token array; each gram hash is a fixed polynomial mix of its n word
    hashes computed by n shifted-array multiplies (no per-gram loop).
    Returns ``(gram_hash_u64, row_index_per_gram)``. Rows with fewer
    than n words emit nothing. Matching on 64-bit hashes instead of
    gram strings is this operator's documented approximation — at any
    corpus size the expected false-hit count is ~(grams²)/2⁶⁴.
    """
    flat, off = flat_words(text)
    n_words = off[1:] - off[:-1]
    if len(flat) == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    wh = pd.util.hash_array(np.asarray(flat.to_pandas(), dtype=object)).astype(np.uint64)
    total = len(wh)
    # Polynomial rolling mix across n shifted views.
    gh = np.zeros(max(total - n + 1, 0), dtype=np.uint64)
    for j in range(n):
        gh = gh * _MIX + wh[j : total - n + 1 + j]
    # A gram starting at word i is valid iff all n words lie in one row:
    # i >= row_start and i + n <= row_end.
    n_grams = np.maximum(n_words - n + 1, 0)
    row_idx = np.repeat(np.arange(len(n_words), dtype=np.int64), n_grams)
    first = off[:-1][row_idx] + (
        np.arange(len(row_idx), dtype=np.int64)
        - np.repeat(np.concatenate([[0], np.cumsum(n_grams)])[:-1], n_grams)
    )
    return gh[first], row_idx


def corpus_diff(
    ds_a: Dataset,
    ds_b: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Snapshot diff for INCREMENTAL curation: classify every id across
    two corpus versions as ``added`` (only in b), ``removed`` (only in
    a) or ``changed`` (present in both with different text digest);
    unchanged ids are dropped. Output: ``(id_col, status)`` — the work
    list a re-run actually needs, so a 100-TB refresh re-curates only
    the delta instead of the snapshot.

    Scale shape: each side compacts map-side to ``(id, md5, side)`` —
    32 hex chars per row regardless of document size — then ONE
    id-keyed exchange classifies per partition with a vectorized outer
    merge. The documents themselves never move.
    """
    import hashlib as _hashlib

    from kgray.kernels.hashagg import auto_partitions as _ap
    from kgray.kernels.hashagg import grouped_apply as _ga

    if num_partitions is None:
        num_partitions = _ap()

    def _digest(side: str):
        def f(t: pa.Table) -> pa.Table:
            hs = [
                _hashlib.md5((x or "").encode("utf-8")).hexdigest()
                for x in t.column(text_col).to_pylist()
            ]
            return pa.table({
                id_col: t.column(id_col),
                "h": pa.array(hs, pa.string()),
                "side": pa.array([side] * len(t), pa.string()),
            })
        return f

    tagged = ds_a.select_columns([id_col, text_col]).map_batches(
        _digest("a"), batch_format="pyarrow"
    ).union(ds_b.select_columns([id_col, text_col]).map_batches(
        _digest("b"), batch_format="pyarrow"))

    def _classify(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["side"] == "a"][[id_col, "h"]]
        b = df[df["side"] == "b"][[id_col, "h"]]
        m = a.merge(b, on=id_col, how="outer", suffixes=("_a", "_b"))
        status = np.where(
            m["h_a"].isna(), "added",
            np.where(m["h_b"].isna(), "removed",
                     np.where(m["h_a"] != m["h_b"], "changed", "same")))
        out = m.assign(status=status)
        return out.loc[out["status"] != "same", [id_col, "status"]]

    return _ga(tagged, [id_col], _classify, num_partitions=num_partitions)


def decontaminate(
    corpus: Dataset,
    benchmark: Dataset,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_limit: int = 5_000_000,
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Flag corpus documents sharing any word-``n``-gram with a
    benchmark/eval set (GPT-3-style training-set decontamination).

    Output: ``(id_col, n_contaminated, contaminated)`` — the number of
    DISTINCT benchmark-overlapping n-grams per corpus doc and a flag.

    Two paths, size-switched like the embedding near-dup operator:

    * **broadcast** (benchmark gram count ≤ ``broadcast_limit``): the
      distinct benchmark gram hashes are sorted into one uint64 numpy
      array, put in the object store ONCE, and every map task probes it
      zero-copy with ``np.searchsorted`` — no shuffle at all.
    * **join** (giant benchmark): corpus (gram, doc) and benchmark
      (gram) both hash-exchange on the gram; the per-partition reduce
      counts matches. Only gram hashes move, never text.
    """
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _bench_grams(t: pa.Table) -> pa.Table:
        gh, _ = _gram_hashes(t.column(text_col), n)
        return pa.table({"g": pa.array(np.unique(gh))})

    bench_ds = benchmark.select_columns([text_col]).map_batches(
        _bench_grams, batch_format="pyarrow"
    )

    def _corpus_grams(t: pa.Table) -> pa.Table:
        gh, ridx = _gram_hashes(t.column(text_col), n)
        ids = t.column(id_col).combine_chunks().take(pa.array(ridx))
        # Distinct (doc, gram) within the batch — map-side combine.
        sub = pa.table({id_col: ids, "g": pa.array(gh)})
        return sub.group_by([id_col, "g"]).aggregate([])

    # Size probe: count benchmark grams (cheap — hashes only).
    n_bench = bench_ds.count()
    if n_bench <= broadcast_limit:
        parts = [b.column("g").to_numpy() for b in bench_ds.iter_batches(batch_format="pyarrow")]
        bench_sorted = np.sort(np.unique(np.concatenate(parts))) if parts else np.zeros(0, np.uint64)
        ref = ray.put(bench_sorted)

        def _probe(t: pa.Table) -> pa.Table:
            bs = ray.get(ref)  # zero-copy plasma numpy
            gh, ridx = _gram_hashes(t.column(text_col), n)
            if len(gh):
                # distinct per doc before probing
                key = pd.DataFrame({"i": ridx, "g": gh}).drop_duplicates()
                pos = np.searchsorted(bs, key["g"].to_numpy())
                pos = np.minimum(pos, max(len(bs) - 1, 0))
                hits = (bs[pos] == key["g"].to_numpy()) if len(bs) else np.zeros(len(key), bool)
                cnt = np.zeros(t.num_rows, np.int64)
                np.add.at(cnt, key["i"].to_numpy()[hits], 1)
            else:
                cnt = np.zeros(t.num_rows, np.int64)
            return pa.table({
                id_col: t.column(id_col),
                "n_contaminated": pa.array(cnt),
                "contaminated": pa.array(cnt > 0),
            })

        return corpus.select_columns([id_col, text_col]).map_batches(
            _probe, batch_format="pyarrow"
        )

    # Join path: tag benchmark grams, exchange both sides on the gram.
    def _tag_bench(t: pa.Table) -> pa.Table:
        nn = pa.nulls(t.num_rows, pa.int64())
        return pa.table({id_col: nn, "g": t.column("g")})

    corpus_grams = corpus.select_columns([id_col, text_col]).map_batches(
        _corpus_grams, batch_format="pyarrow"
    )
    tagged = corpus_grams.union(bench_ds.map_batches(_tag_bench, batch_format="pyarrow"))

    def _match(df: pd.DataFrame) -> pd.DataFrame:
        bench_g = df.loc[df[id_col].isna(), "g"].unique()
        hits = df[df[id_col].notna() & df["g"].isin(bench_g)]
        out = hits.groupby(id_col, sort=False).size().rename("n_contaminated").reset_index()
        out[id_col] = out[id_col].astype(np.int64)
        out["n_contaminated"] = out["n_contaminated"].astype(np.int64)
        return out

    counts = grouped_apply(tagged, ["g"], _match, num_partitions=num_partitions,
                           map_format="pyarrow")
    # Per-doc totals (a doc's grams span partitions), then left-join the
    # full id list so zero-hit docs appear.
    def _sum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(id_col, as_index=False, sort=False)["n_contaminated"].sum()

    totals = grouped_apply(counts, [id_col], _sum, num_partitions=num_partitions)
    tot_tbl = pa.concat_tables(
        [b for b in totals.iter_batches(batch_format="pyarrow")]
        or [pa.table({id_col: pa.array([], pa.int64()),
                      "n_contaminated": pa.array([], pa.int64())})]
    )
    # The totals table is O(contaminated docs) — broadcast it and left
    # join in the map side (contamination is rare by construction; a
    # giant hit set would use another hash-join exchange).
    ref = ray.put(tot_tbl)

    def _attach(t: pa.Table) -> pa.Table:
        tt = ray.get(ref)
        ids = tt.column(id_col).to_numpy()
        order = np.argsort(ids, kind="stable")
        ids_s, cnt_s = ids[order], tt.column("n_contaminated").to_numpy()[order]
        mine = t.column(id_col).to_numpy()
        pos = np.searchsorted(ids_s, mine)
        pos = np.minimum(pos, max(len(ids_s) - 1, 0))
        hit = (ids_s[pos] == mine) if len(ids_s) else np.zeros(len(mine), bool)
        cnt = np.where(hit, cnt_s[pos] if len(ids_s) else 0, 0).astype(np.int64)
        return pa.table({id_col: t.column(id_col),
                         "n_contaminated": pa.array(cnt),
                         "contaminated": pa.array(cnt > 0)})

    return corpus.select_columns([id_col]).map_batches(_attach, batch_format="pyarrow")


def decontaminate_bloom(
    corpus: Dataset,
    benchmark: Dataset,
    n: int = 5,
    fpr: float = 1e-6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Bloom-filter decontamination: the constant-memory scale path.

    :func:`decontaminate`'s broadcast path ships 8 bytes per distinct
    benchmark gram (sorted uint64 array); its join path exchanges every
    corpus gram. The bloom variant replaces both with a bitmap of
    ~1.44·log2(1/fpr) bits per gram (~3.6 bytes at fpr=1e-6) built
    shuffle-free: each map task folds its batch's gram hashes into a
    partial bitmap, partials merge by bitwise OR (associative +
    commutative), and only O(num_batches) bitmaps ever travel. The
    merged bitmap is ``ray.put`` once and probed zero-copy per batch.

    Guarantees: **zero false negatives** — every doc sharing a word
    n-gram with the benchmark is flagged; a non-contaminated doc is
    falsely flagged with probability ≤ grams_per_doc · fpr. Output:
    ``(id_col, n_flagged, contaminated)`` where ``n_flagged`` counts
    bloom-positive distinct grams (≥ the exact count).
    """
    from kgray.stages.sketch import bloom_fold, bloom_params, bloom_probe

    bench_text = benchmark.select_columns([text_col])

    def _count(t: pa.Table) -> pa.Table:
        gh, _ = _gram_hashes(t.column(text_col), n)
        return pa.table({"c": pa.array([len(np.unique(gh))], pa.int64())})

    # Sizing pass: per-batch-distinct gram count (an upper bound on the
    # true distinct count — oversizes m slightly, never undersizes fpr).
    n_bench = sum(
        b.column("c").to_numpy().sum()
        for b in bench_text.map_batches(_count, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    m_bits, k = bloom_params(int(n_bench), fpr)

    def _fold(t: pa.Table) -> pa.Table:
        gh, _ = _gram_hashes(t.column(text_col), n)
        bm = bloom_fold(np.unique(gh), m_bits, k)
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
    for b in bench_text.map_batches(
        _fold, batch_format="pyarrow", batch_size=65536
    ).iter_batches(batch_format="pyarrow"):
        for buf in b.column("bm").to_pylist():
            np.bitwise_or(bitmap, np.frombuffer(buf, dtype=np.uint8), out=bitmap)
    ref = ray.put(bitmap)

    def _probe(t: pa.Table) -> pa.Table:
        bm = ray.get(ref)  # zero-copy plasma numpy
        gh, ridx = _gram_hashes(t.column(text_col), n)
        cnt = np.zeros(t.num_rows, np.int64)
        if len(gh):
            key = pd.DataFrame({"i": ridx, "g": gh}).drop_duplicates()
            hits = bloom_probe(key["g"].to_numpy(), bm, k)
            np.add.at(cnt, key["i"].to_numpy()[hits], 1)
        return pa.table({
            id_col: t.column(id_col),
            "n_flagged": pa.array(cnt),
            "contaminated": pa.array(cnt > 0),
        })

    return corpus.select_columns([id_col, text_col]).map_batches(
        _probe, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Grouped exact quantiles
# ---------------------------------------------------------------------------

def group_quantiles(
    ds: Dataset,
    group_col: str,
    value_col: str,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Exact per-group discrete quantiles: for each group the value at
    1-based sorted index ``ceil(q·n)`` (the classic discrete quantile —
    an actual element, never interpolated, so integer columns stay
    integers and a SQL oracle reproduces it with a window row_number).

    Hash-exchange on the group key; each partition sorts its complete
    groups once (numpy argsort) and gathers all quantile indices in one
    take. Exact quantiles require a group's values co-resident — for
    groups that outgrow a partition, switch to a mergeable sketch
    (t-digest); this operator documents that boundary rather than
    silently approximating.
    """
    if num_partitions is None:
        num_partitions = auto_partitions()
    qs = list(qs)

    def _quant(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_col, value_col], kind="mergesort")
        v = df[value_col].to_numpy()
        starts = np.concatenate([[0], 1 + np.flatnonzero(
            df[group_col].to_numpy()[1:] != df[group_col].to_numpy()[:-1])])
        ends = np.concatenate([starts[1:], [len(df)]])
        n = ends - starts
        out = {group_col: df[group_col].to_numpy()[starts],
               "n": n.astype(np.int64)}
        for q in qs:
            idx = starts + np.maximum(np.ceil(q * n).astype(np.int64), 1) - 1
            out[f"p{int(q * 100)}"] = v[idx]
        return pd.DataFrame(out)

    return grouped_apply(ds.select_columns([group_col, value_col]), [group_col],
                         _quant, num_partitions=num_partitions)


def tfidf_topk(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Top-``k`` TF-IDF terms per document (score desc, token asc):
    ``score = tf * (ln((N+1)/(df+1)) + 1)`` — the smoothed-idf form.

    Scale shape — two hash exchanges, both on pre-aggregated rows:

    1. The map side explodes text ONCE and combines to one
       ``(doc, token, tf)`` row per distinct (doc, token) pair inside
       the batch, so the token-keyed exchange never carries raw text.
    2. Reduce #1 (token-keyed) sees every row of its tokens: it both
       counts df AND scores the rows in place — the df table never
       materializes anywhere, and idf needs only the scalar N.
    3. Reduce #2 (doc-keyed) takes the per-doc top-k (score desc, token
       asc). Output is N*k rows.

    Scores are ``stable_round``-ed to 6 so the DuckDB ROUND oracle
    matches bit-for-bit.
    """
    from kgray.kernels.hashagg import stable_round

    n_docs = ds.count()
    nparts = num_partitions or auto_partitions()

    def _tf(t: pa.Table) -> pa.Table:
        flat, off = flat_words(t.column(text_col))
        doc_idx = np.repeat(np.arange(len(off) - 1), np.diff(off))
        g = (
            pd.DataFrame({"d": doc_idx, "tok": flat.to_pandas()})
            .groupby(["d", "tok"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        ids = t.column(id_col).to_pandas().iloc[g["d"].to_numpy()].to_numpy()
        return pa.table({
            id_col: pa.array(ids),
            "tok": pa.array(g["tok"].to_numpy(), type=pa.string()),
            "tf": pa.array(g["tf"].to_numpy(), type=pa.int64()),
        })

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        dfreq = df.groupby("tok", sort=False)["tok"].transform("size")
        out = df.copy()
        out["df"] = dfreq.astype("int64")
        out["score"] = out["tf"] * (
            np.log((n_docs + 1.0) / (out["df"] + 1.0)) + 1.0
        )
        return out

    def _topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["score", "tok"], ascending=[False, True], kind="mergesort")
        return df.groupby(id_col, sort=False).head(k)

    tf_rows = ds.map_batches(_tf, batch_format="pyarrow")
    scored = grouped_apply(tf_rows, ["tok"], _score, num_partitions=nparts)
    top = grouped_apply(scored, [id_col], _topk, num_partitions=nparts)
    return top.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("score"), "score", stable_round(t.column("score"), 6)
        ),
        batch_format="pyarrow",
    )


def unigram_nll(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
    num_partitions: Optional[int] = None,
) -> Dataset:
    """CCNet-style LM quality proxy: per-document mean negative
    log-likelihood under a corpus-estimated smoothed unigram model
    (CCNet, Wenzek et al. 2020, uses a KenLM 5-gram; the unigram form
    keeps the exact same pipeline shape — corpus statistics pass →
    broadcast model → one scoring map — with a SQL-checkable model).

    Pinned definition: vocabulary = top-``vocab_size`` tokens by
    (count desc, token asc); ``p(tok) = (c+1)/(N + vocab_size + 1)``
    with c = 0 for out-of-vocabulary; ``nll = -mean(ln p)`` over the
    doc's tokens; docs with no tokens are dropped (SQL GROUP BY
    semantics).

    Scale shape: the vocab (V rows) comes from :func:`topk_tokens`'s
    combined exchange; N is one streaming count; both broadcast via
    ``ray.put`` — the scoring pass is map-only, corpus never shuffles.
    """
    top = topk_tokens(ds, k=vocab_size, text_col=text_col,
                      num_partitions=num_partitions)

    def _ntok(t: pa.Table) -> pa.Table:
        flat, _ = flat_words(t.column(text_col))
        return pa.table({"n": pa.array([len(flat)], pa.int64())})

    n_total = sum(
        b.column("n").to_numpy().sum()
        for b in ds.map_batches(_ntok, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow")
    )
    denom = float(n_total + vocab_size + 1)
    vref = ray.put(dict(zip(top.column("tok").to_pylist(),
                            top.column("n").to_pylist())))

    def _score(t: pa.Table) -> pa.Table:
        from kgray.kernels.hashagg import stable_round

        vocab = ray.get(vref) if isinstance(vref, ray.ObjectRef) else vref
        flat, off = flat_words(t.column(text_col))
        c = pd.Series(flat.to_pandas()).map(vocab).fillna(0).to_numpy(np.float64)
        logp = np.log((c + 1.0) / denom)
        cum = np.concatenate([[0.0], np.cumsum(logp)])
        counts = np.diff(off)
        keep = counts > 0
        sums = cum[off[1:]] - cum[off[:-1]]
        nll = -(sums[keep] / counts[keep])
        return pa.table({
            id_col: t.column(id_col).filter(pa.array(keep)),
            "nll": stable_round(pa.array(nll, type=pa.float64()), 6),
        })

    return ds.map_batches(_score, batch_format="pyarrow")


def boilerplate_filter(
    ds: Dataset,
    min_docs: int = 3,
    chunk_words: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Corpus-frequency boilerplate removal (the C4/CCNet companion to
    :func:`chunk_dedup`): drop EVERY occurrence of any ``chunk_words``-
    word chunk that appears in ``min_docs`` or more DISTINCT documents
    (navigation bars, cookie banners, license footers), then reassemble
    each document from its surviving chunks in order.

    Differs from :func:`chunk_dedup` (first occurrence wins) in the keep
    rule only: a boilerplate chunk is removed everywhere INCLUDING its
    first occurrence, while a chunk repeated within one document
    survives intact (document frequency 1).

    Output: ``(id_col, text_col, n_kept, n_dropped)`` — one row per
    input document.

    Scale shape: identical to :func:`chunk_dedup` — two hash exchanges
    (by chunk text, then by doc id); the chunk-keyed reduce computes a
    per-chunk distinct-doc count with one sort + one ``duplicated``
    scan, so the exchange carries each chunk occurrence exactly once
    and nothing is re-shipped for the frequency pass. Chunk-less docs
    ride sentinel rows (see :func:`_explode_chunks`) — the input is
    consumed exactly once, no DAG fork.
    """
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _explode(t: pa.Table) -> pa.Table:
        return _explode_chunks(t, id_col, text_col, chunk_words)

    def _flag_frequent(df: pd.DataFrame) -> pd.DataFrame:
        # Distinct-doc count per chunk without a nunique() hash pass:
        # sort by (chunk, id), count first-(chunk,id) occurrences per
        # chunk, broadcast the keep decision back to every occurrence.
        df = df.sort_values(["chunk", id_col], kind="mergesort")
        first_pair = ~df[["chunk", id_col]].duplicated().to_numpy()
        grp = (~df["chunk"].duplicated()).to_numpy().cumsum() - 1
        doc_freq = np.bincount(grp[first_pair], minlength=grp[-1] + 1 if len(grp) else 0)
        # Sentinels (pos=-1) are never kept as text; the reassembly
        # reduce turns them into empty-output rows.
        df["__keep"] = (doc_freq[grp] < min_docs) & (df["pos"].to_numpy() >= 0)
        return df

    exploded = ds.select_columns([id_col, text_col]).map_batches(
        _explode, batch_format="pyarrow"
    )
    flagged = grouped_apply(exploded, ["chunk"], _flag_frequent,
                            num_partitions=num_partitions)
    return grouped_apply(
        flagged, [id_col],
        lambda df: _reassemble_kept(df, id_col, text_col),
        num_partitions=num_partitions,
    )


def dsir_score(
    ds: Dataset,
    target_mask_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
    num_partitions: Optional[int] = None,
) -> Dataset:
    """DSIR-style importance weight for data selection (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    per-document mean log-likelihood RATIO between a smoothed unigram
    model of the TARGET slice and one of the RAW corpus. Documents that
    look like the target domain score high; resampling by this weight
    (e.g. keep top-q) is the DSIR selection step. DSIR uses hashed
    bigram features; the unigram form keeps the identical pipeline
    shape — two corpus-statistics passes → broadcast models → one
    map-only scoring pass — with a SQL-checkable model.

    Pinned definition (mirrors :func:`unigram_nll` conventions):
    vocabulary = top-``vocab_size`` tokens of the RAW corpus by
    (count desc, token asc); ``p(tok|model) = (c+1)/(N + vocab_size+1)``
    with c = 0 for out-of-vocabulary tokens in BOTH models (target
    counts are vocab-restricted); ``score = mean(ln p_target −
    ln p_raw)`` over the doc's tokens, rounded to 6; token-less docs
    are dropped.

    ``target_mask_col`` is a boolean column marking the target-domain
    rows (computed upstream — e.g. ``lang == 'en'`` or a benchmark id
    set); both models come from the same single corpus pass family.

    Scale shape: the raw vocab rides :func:`topk_tokens`' combined
    exchange; target counts for the V vocab tokens are map-side
    ``value_counts`` filtered against the broadcast vocab and reduced
    as tiny (≤V-row) partials — the corpus text never shuffles, and the
    scoring pass is map-only against two broadcast count maps.
    """
    top = topk_tokens(ds, k=vocab_size, text_col=text_col,
                      num_partitions=num_partitions)
    vocab_toks = top.column("tok").to_pylist()
    raw_counts = dict(zip(vocab_toks, top.column("n").to_pylist()))
    vset_ref = ray.put(set(vocab_toks))

    # One pass: total raw tokens, total target tokens, and per-vocab-token
    # target counts (each batch emits ≤V+2 combined rows).
    def _partials(t: pa.Table) -> pa.Table:
        vset = ray.get(vset_ref) if isinstance(vset_ref, ray.ObjectRef) else vset_ref
        flat, off = flat_words(t.column(text_col))
        mask = t.column(target_mask_col).to_numpy(zero_copy_only=False).astype(bool)
        counts = off[1:] - off[:-1]
        n_raw = len(flat)
        n_tgt = int(counts[mask].sum())
        tgt_rows = np.repeat(mask, counts)
        vc = pd.Series(flat.to_pandas())[tgt_rows].value_counts()
        vc = vc[vc.index.isin(vset)]
        return pa.table({
            "tok": pa.array(["\x00N_RAW", "\x00N_TGT"] + vc.index.tolist(), pa.string()),
            "n": pa.array([n_raw, n_tgt] + vc.to_numpy().tolist(), pa.int64()),
        })

    tgt_counts: Dict[str, int] = {}
    n_raw_total = n_tgt_total = 0
    parts = ds.select_columns([id_col, text_col, target_mask_col]).map_batches(
        _partials, batch_format="pyarrow")
    for b in parts.iter_batches(batch_format="pyarrow"):
        for tok, n in zip(b.column("tok").to_pylist(), b.column("n").to_pylist()):
            if tok == "\x00N_RAW":
                n_raw_total += n
            elif tok == "\x00N_TGT":
                n_tgt_total += n
            else:
                tgt_counts[tok] = tgt_counts.get(tok, 0) + n

    denom_raw = float(n_raw_total + vocab_size + 1)
    denom_tgt = float(n_tgt_total + vocab_size + 1)
    # log((c_t+1)/denom_t) - log((c_r+1)/denom_r) per vocab token; OOV
    # tokens use c=0 in both models.
    llr = {tok: float(np.log((tgt_counts.get(tok, 0) + 1.0) / denom_tgt)
                      - np.log((raw_counts[tok] + 1.0) / denom_raw))
           for tok in vocab_toks}
    oov = float(np.log(1.0 / denom_tgt) - np.log(1.0 / denom_raw))
    lref = ray.put(llr)

    def _score(t: pa.Table) -> pa.Table:
        from kgray.kernels.hashagg import stable_round

        lmap = ray.get(lref) if isinstance(lref, ray.ObjectRef) else lref
        flat, off = flat_words(t.column(text_col))
        v = pd.Series(flat.to_pandas()).map(lmap).fillna(oov).to_numpy(np.float64)
        cum = np.concatenate([[0.0], np.cumsum(v)])
        counts = np.diff(off)
        keep = counts > 0
        sums = cum[off[1:]] - cum[off[:-1]]
        score = sums[keep] / counts[keep]
        return pa.table({
            id_col: t.column(id_col).filter(pa.array(keep)),
            "dsir_score": stable_round(pa.array(score, type=pa.float64()), 6),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        _score, batch_format="pyarrow")


def quantile_outlier_flag(
    ds: Dataset,
    group_col: str,
    value_col: str,
    q: float = 0.99,
    id_col: str = "doc_id",
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Per-group quantile-threshold outlier flag: mark every row whose
    ``value_col`` exceeds its group's discrete ``q``-quantile (the
    standard "drop documents longer than their language's p99" curation
    rule). Composes :func:`group_quantiles` (exact, one exchange over
    (group, value) pairs only) with a broadcast threshold map and a
    map-only flag pass — the corpus itself never shuffles.

    Output: ``(id_col, group_col, value_col, is_outlier)``.

    The threshold table is one row per group — broadcast via ``ray.put``
    under the same small-side contract as every other lookup here.
    """
    qcol = f"p{int(q * 100)}"
    qt = group_quantiles(ds.select_columns([group_col, value_col]),
                         group_col, value_col, qs=(q,),
                         num_partitions=num_partitions)
    thr: Dict = {}
    for b in qt.iter_batches(batch_format="pyarrow"):
        for g, v in zip(b.column(group_col).to_pylist(), b.column(qcol).to_pylist()):
            thr[g] = v
    tref = ray.put(thr)

    def _flag(t: pa.Table) -> pa.Table:
        m = ray.get(tref) if isinstance(tref, ray.ObjectRef) else tref
        lim = pd.Series(t.column(group_col).to_pylist()).map(m).to_numpy(np.float64)
        vals = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            id_col: t.column(id_col),
            group_col: t.column(group_col),
            value_col: t.column(value_col),
            "is_outlier": pa.array(vals > lim),
        })

    return ds.select_columns([id_col, group_col, value_col]).map_batches(
        _flag, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Top-k n-gram heavy hitters
# ---------------------------------------------------------------------------

def ngram_strings(text: pa.ChunkedArray | pa.Array, n: int) -> pa.Array:
    """All word n-grams of a string column as space-joined strings,
    fully vectorized: one split kernel, then n-1 element-wise binary
    joins over offset-shifted views of the flat word array (grams never
    cross a document boundary). No per-row Python."""
    flat, off = flat_words(text)
    n_words = off[1:] - off[:-1]
    n_grams = np.maximum(n_words - (n - 1), 0)
    total = int(n_grams.sum())
    if total == 0:
        return pa.array([], pa.string())
    doc_idx = np.repeat(np.arange(len(n_words), dtype=np.int64), n_grams)
    first = np.concatenate([[0], np.cumsum(n_grams)])[:-1]
    pos = np.arange(total, dtype=np.int64) - np.repeat(first, n_grams)
    start = off[:-1][doc_idx] + pos  # word index of each gram's first word
    parts = [flat.take(pa.array(start + j)) for j in range(n)]
    sep = pa.scalar(" ")
    out = parts[0]
    for p in parts[1:]:
        out = pc.binary_join_element_wise(out, p, sep)
    return out


def topk_ngrams(ds: Dataset, n: int = 2, k: int = 20, text_col: str = "text",
                num_partitions: Optional[int] = None) -> pa.Table:
    """Global top-k most frequent word n-grams (count desc, gram asc) —
    the collocation statistic (phrase mining, tokenizer-merge corpora).

    Same scale shape as :func:`topk_tokens`: per-batch value_counts
    combine before the exchange (only distinct grams move), grams hash
    to exactly one partition so per-partition top-k is exact, and P·k
    candidate rows reach the driver.
    """
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _count(t: pa.Table) -> pa.Table:
        grams = ngram_strings(t.column(text_col), n)
        vc = pc.value_counts(grams)
        if len(vc) == 0:
            return pa.table({"gram": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        return pa.table({"gram": vc.field("values"), "n": vc.field("counts")})

    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("gram", as_index=False, sort=False)["n"].sum()

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("gram", as_index=False, sort=False)["n"].sum()
        agg = agg.sort_values(["n", "gram"], ascending=[False, True], kind="mergesort")
        return agg.head(k)

    counted = ds.map_batches(_count, batch_format="pyarrow")
    partial = grouped_apply(counted, ["gram"], _reduce, num_partitions=num_partitions,
                            map_side=_combine)
    top = partial.to_pandas().sort_values(["n", "gram"], ascending=[False, True],
                                          kind="mergesort").head(k)
    return pa.Table.from_pandas(top.reset_index(drop=True), preserve_index=False)


# ---------------------------------------------------------------------------
# Conjunctive keyword search
# ---------------------------------------------------------------------------

def keyword_search(ds: Dataset, terms: Sequence[str], id_col: str = "doc_id",
                   text_col: str = "text") -> Dataset:
    """Documents whose whitespace token stream contains ALL of ``terms``
    (exact token match, not substring) — the conjunctive boolean query
    of a corpus search / targeted-subset extraction.

    Scale shape: a pure map-side scan — per batch, the text is wrapped
    in single spaces once and each term becomes ONE Arrow
    ``match_substring`` kernel over the batch (`' term '`), ANDed
    vectorized. No index is built and nothing shuffles; at 100 TB this
    is the streaming full-scan path (an inverted index is only worth
    materializing for repeated query workloads — see `tfidf_topk` for
    the token-exchange machinery that would back one).
    """
    terms = list(terms)

    def _scan(t: pa.Table) -> pa.Table:
        wrapped = pc.binary_join_element_wise(
            pa.scalar(" "), pc.coalesce(t.column(text_col), pa.scalar("")), pa.scalar(" "), ""
        )
        mask = None
        for term in terms:
            m = pc.match_substring(wrapped, f" {term} ")
            mask = m if mask is None else pc.and_(mask, m)
        return t.filter(mask) if mask is not None else t

    return ds.select_columns([id_col, text_col]).map_batches(_scan, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Length histogram
# ---------------------------------------------------------------------------

def length_histogram(ds: Dataset, value_col: str, width: int,
                     num_partitions: Optional[int] = None) -> Dataset:
    """Fixed-width histogram of an integer column (bucket = floor(v /
    width) * width → count) — the length/size profile every curation
    run reports before choosing filter thresholds.

    Scale shape: per-batch bucket value_counts combine map-side, so the
    exchange carries O(buckets) rows per block regardless of input
    rows; the reduce is a per-partition sum.
    """
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        b = (df[value_col].to_numpy(np.int64) // width) * width
        g = pd.DataFrame({"bucket": b}).groupby("bucket", sort=False).size()
        return g.rename("n_rows").reset_index()

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("bucket", sort=False)["n_rows"].sum().reset_index()
        out["n_rows"] = out["n_rows"].astype(np.int64)
        return out

    pruned = ds.select_columns([value_col])
    return grouped_apply(pruned, ["bucket"], _reduce, num_partitions=num_partitions,
                         map_side=_combine)


# ---------------------------------------------------------------------------
# Vocabulary build (token -> contiguous frequency-ranked id)
# ---------------------------------------------------------------------------

def vocab_build(ds: Dataset, text_col: str = "text",
                num_partitions: Optional[int] = None) -> Dataset:
    """Tokenizer-vocabulary construction: every distinct ``\\S+`` token
    with its corpus count and a contiguous 0-based ``token_id`` assigned
    by (count desc, token asc) — the word↔id table an LLM data pipeline
    materializes before numericalizing.

    Scale shape: counts ride the combiner-fronted token exchange (only
    distinct tokens move); the global rank then reuses
    :func:`kgray.stages.split.value_rank`'s histogram trick keyed on
    the NEGATED count — the count histogram folds to the driver
    (O(distinct counts), tiny by Zipf), offsets broadcast, ONE more
    exchange emits ranks. No global sort, no driver token table.
    """
    from kgray.stages.split import value_rank

    if num_partitions is None:
        num_partitions = auto_partitions()

    def _count(t: pa.Table) -> pa.Table:
        flat, _ = flat_words(t.column(text_col))
        vc = pc.value_counts(flat)
        if len(vc) == 0:
            return pa.table({"tok": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        return pa.table({"tok": vc.field("values"), "n": vc.field("counts")})

    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("tok", as_index=False, sort=False)["n"].sum()

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("tok", as_index=False, sort=False)["n"].sum()
        out["neg_n"] = -out["n"].astype(np.int64)
        return out

    counted = ds.map_batches(_count, batch_format="pyarrow")
    totals = grouped_apply(counted, ["tok"], _reduce,
                           num_partitions=num_partitions, map_side=_combine)
    ranked = value_rank(totals, value_col="neg_n", id_col="tok",
                        rank_col="token_id", num_partitions=num_partitions)

    def _out(t: pa.Table) -> pa.Table:
        return pa.table({
            "tok": t.column("tok"),
            "n": pc.negate(t.column("neg_n")).cast(pa.int64()),
            "token_id": t.column("token_id"),
        })

    return ranked.map_batches(_out, batch_format="pyarrow")


def ngram_strings_pos(
    text: pa.ChunkedArray | pa.Array, n: int
) -> Tuple[pa.Array, np.ndarray, np.ndarray]:
    """Like :func:`ngram_strings` but also returns each gram's source
    row index and 0-based word position — the inputs a span-level
    operator needs. Same vectorized shape (n shifted takes + one join
    chain)."""
    flat, off = flat_words(text)
    n_words = off[1:] - off[:-1]
    n_grams = np.maximum(n_words - (n - 1), 0)
    total = int(n_grams.sum())
    if total == 0:
        return pa.array([], pa.string()), np.zeros(0, np.int64), np.zeros(0, np.int64)
    doc_idx = np.repeat(np.arange(len(n_words), dtype=np.int64), n_grams)
    first = np.concatenate([[0], np.cumsum(n_grams)])[:-1]
    pos = np.arange(total, dtype=np.int64) - np.repeat(first, n_grams)
    start = off[:-1][doc_idx] + pos
    parts = [flat.take(pa.array(start + j)) for j in range(n)]
    sep = pa.scalar(" ")
    out = parts[0]
    for p in parts[1:]:
        out = pc.binary_join_element_wise(out, p, sep)
    return out, doc_idx, pos


# ---------------------------------------------------------------------------
# Duplicate n-gram span flagging (exact-substring dedup at span level)
# ---------------------------------------------------------------------------

def dup_spans(
    ds: Dataset,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Every word-``n``-gram OCCURRENCE whose gram appears more than
    once in the corpus (within or across documents) → rows
    ``(doc_id, pos)``. This is the span-level primitive of exact
    substring deduplication (flag-then-excise repeated passages), the
    finer-grained sibling of ``chunk_dedup``'s paragraph granularity.

    Scale shape: map side emits ``(gram, id, pos)`` rows vectorized
    (:func:`ngram_strings_pos` — one split + n take kernels per batch);
    one exchange on the gram STRING (exact — no hash approximation, so
    the operator is oracle-identical); per-partition vectorized
    group-size filter. Output is occurrence-level and shuffles gram
    strings — at 100 TB run it per-shard or switch the gram column to
    ``_gram_hashes`` and accept the documented 2⁻⁶⁴ false-hit rate.
    """
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _emit(t: pa.Table) -> pa.Table:
        grams, row_idx, pos = ngram_strings_pos(t.column(text_col), n)
        ids = t.column(id_col).take(pa.array(row_idx))
        return pa.table({
            "gram": grams,
            id_col: ids,
            "pos": pa.array(pos, type=pa.int64()),
        })

    posted = ds.select_columns([id_col, text_col]).map_batches(_emit, batch_format="pyarrow")

    def _dups(part: pd.DataFrame) -> pd.DataFrame:
        cnt = part.groupby("gram", sort=False)["gram"].transform("size")
        return part.loc[cnt > 1, [id_col, "pos"]]

    return grouped_apply(posted, ["gram"], _dups, num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------

def pmi_topk(
    ds: Dataset,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
    num_partitions: Optional[int] = None,
) -> pa.Table:
    """Top-``k`` bigram collocations by pointwise mutual information
    ``PMI(a,b) = ln((c_ab/B) / ((c_a/N)(c_b/N)))`` with a
    ``min_count`` support floor (the classic phrase-mining statistic;
    raw PMI without the floor just surfaces hapax pairs).

    Scale shape: ONE combiner-fronted exchange for bigram counts and
    one for unigram counts (only distinct grams/words move); the
    min_count floor shrinks bigrams to collocation-candidate scale
    BEFORE the two word-keyed hash joins that attach ``c_a``/``c_b``
    (no vocabulary broadcast); N and B are two scalar folds. PMI is
    rounded to 6 decimals for a stable cross-engine ordering.
    """
    from kgray.stages.relational import hash_join

    if num_partitions is None:
        num_partitions = auto_partitions()

    def _count_uni(t: pa.Table) -> pa.Table:
        flat, _ = flat_words(t.column(text_col))
        vc = pc.value_counts(flat)
        if len(vc) == 0:
            return pa.table({"word": pa.array([], pa.string()), "c": pa.array([], pa.int64())})
        return pa.table({"word": vc.field("values"), "c": vc.field("counts")})

    def _count_big(t: pa.Table) -> pa.Table:
        grams = ngram_strings(t.column(text_col), 2)
        vc = pc.value_counts(grams)
        if len(vc) == 0:
            return pa.table({"gram": pa.array([], pa.string()), "c": pa.array([], pa.int64())})
        return pa.table({"gram": vc.field("values"), "c": vc.field("counts")})

    def _sum_by(key: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby(key, as_index=False, sort=False)["c"].sum()
        return fn

    text_only = ds.select_columns([text_col])
    uni = grouped_apply(
        text_only.map_batches(_count_uni, batch_format="pyarrow"),
        ["word"], _sum_by("word"), num_partitions=num_partitions, map_side=_sum_by("word"),
    )
    big = grouped_apply(
        text_only.map_batches(_count_big, batch_format="pyarrow"),
        ["gram"], _sum_by("gram"), num_partitions=num_partitions, map_side=_sum_by("gram"),
    )
    # Vocab-sized intermediates, each consumed twice (scalar fold + join).
    uni, big = uni.materialize(), big.materialize()
    n_words = int(uni.sum("c"))
    n_bigrams = int(big.sum("c"))

    def _floor_split(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("c"), min_count))
        g = t.column("gram")
        sp = pc.split_pattern(g, " ")
        if isinstance(sp, pa.ChunkedArray):
            sp = sp.combine_chunks()
        flat = sp.flatten()
        return pa.table({
            "gram": g,
            "c_ab": t.column("c"),
            "w1": flat.take(pa.array(np.arange(0, 2 * len(t), 2))),
            "w2": flat.take(pa.array(np.arange(1, 2 * len(t), 2))),
        })

    cand = big.map_batches(_floor_split, batch_format="pyarrow")
    # Size switch (the bfs/embedding-dedup pattern): a vocabulary that
    # fits the broadcast limit attaches c_a/c_b map-only — two
    # all-to-all join barriers disappear; a web-scale vocabulary falls
    # back to the hash joins (the documented no-vocab-broadcast path).
    n_vocab = uni.count()
    if n_vocab <= 1_000_000:
        from kgray.stages.relational import broadcast_join

        uni_tbl = pa.Table.from_pandas(uni.to_pandas(), preserve_index=False)
        j1 = broadcast_join(cand, uni_tbl.rename_columns(["w1", "c_a"]),
                            on="w1", how="inner")
        j2 = broadcast_join(j1, uni_tbl.rename_columns(["w2", "c_b"]),
                            on="w2", how="inner")
    else:
        j1 = hash_join(cand, uni.map_batches(lambda t: t.rename_columns(["w1", "c_a"]),
                                             batch_format="pyarrow"),
                       on="w1", num_partitions=num_partitions)
        j2 = hash_join(j1, uni.map_batches(lambda t: t.rename_columns(["w2", "c_b"]),
                                           batch_format="pyarrow"),
                       on="w2", num_partitions=num_partitions)

    def _score(t: pa.Table) -> pa.Table:
        c_ab = t.column("c_ab").to_numpy().astype(np.float64)
        c_a = t.column("c_a").to_numpy().astype(np.float64)
        c_b = t.column("c_b").to_numpy().astype(np.float64)
        pmi = np.round(
            np.log((c_ab / n_bigrams) / ((c_a / n_words) * (c_b / n_words))), 6
        )
        df = pd.DataFrame({
            "gram": t.column("gram").to_pandas(),
            "n": t.column("c_ab").to_pandas(),
            "pmi": pmi,
        }).sort_values(["pmi", "gram"], ascending=[False, True], kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    part_top = j2.map_batches(_score, batch_format="pyarrow").to_pandas()
    top = part_top.sort_values(["pmi", "gram"], ascending=[False, True],
                               kind="mergesort").head(k)
    return pa.Table.from_pandas(top.reset_index(drop=True), preserve_index=False)


# ---------------------------------------------------------------------------
# BM25 ranked keyword search
# ---------------------------------------------------------------------------

def bm25_topk(
    ds: Dataset,
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Top-``k`` documents by BM25 against a fixed term set (Robertson/
    Lucene idf ``ln(1 + (N - df + .5)/(df + .5))``) — the ranked
    counterpart of :func:`keyword_search`'s boolean scan.

    Scale shape: one pass over the text compacts each doc to
    ``(id, dl, tf_0..tf_m)`` (term frequencies via ONE is_in pass over
    the flat token array per batch — no per-term rescan); corpus stats
    (N, avgdl, df per term) fold from that compact dataset as scalar
    aggregates; scoring is then map-only and the global top-k merges
    P·k candidates on the driver. Scores rounded to 6 decimals for a
    stable cross-engine ordering.
    """
    terms = list(terms)
    m = len(terms)
    tf_cols = [f"tf_{i}" for i in range(m)]

    def _compact(t: pa.Table) -> pa.Table:
        flat, off = flat_words(t.column(text_col))
        n_rows = len(t)
        dl = off[1:] - off[:-1]
        cols = {id_col: t.column(id_col), "dl": pa.array(dl, type=pa.int64())}
        row_of_tok = np.repeat(np.arange(n_rows, dtype=np.int64), dl)
        for i, term in enumerate(terms):
            hit = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            tf = np.bincount(row_of_tok[hit], minlength=n_rows)
            cols[tf_cols[i]] = pa.array(tf.astype(np.int64))
        return pa.table(cols)

    compact = ds.select_columns([id_col, text_col]).map_batches(
        _compact, batch_format="pyarrow"
    ).materialize()  # tiny doc-level table (id, dl, m tf ints); reused 2×

    n_docs = compact.count()
    sum_dl = compact.sum("dl")
    avgdl = (sum_dl / n_docs) if n_docs else 1.0
    df_counts = [
        compact.filter(expr=f"{c} > 0").count() for c in tf_cols
    ]
    idf = np.array([
        float(np.log(1.0 + (n_docs - dfc + 0.5) / (dfc + 0.5))) for dfc in df_counts
    ])

    def _score(t: pa.Table) -> pa.Table:
        dl = t.column("dl").to_numpy().astype(np.float64)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        score = np.zeros(len(t), dtype=np.float64)
        for i in range(m):
            tf = t.column(tf_cols[i]).to_numpy().astype(np.float64)
            score += idf[i] * tf * (k1 + 1.0) / (tf + norm)
        df = pd.DataFrame({
            id_col: t.column(id_col).to_pandas(),
            "score": np.round(score, 6),
        })
        df = df[df["score"] > 0]
        return pa.Table.from_pandas(
            df.sort_values(["score", id_col], ascending=[False, True],
                           kind="mergesort").head(k),
            preserve_index=False,
        )

    cand = compact.map_batches(_score, batch_format="pyarrow").to_pandas()
    top = cand.sort_values(["score", id_col], ascending=[False, True],
                           kind="mergesort").head(k)
    return pa.Table.from_pandas(top.reset_index(drop=True), preserve_index=False)


def doc_entropy(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> Dataset:
    """Per-document Shannon entropy (nats) of the word distribution —
    a repetition/quality signal (low entropy = repetitive doc): ``H =
    -Σ_w p_w ln p_w`` over the doc's ``\\S+`` tokens. Docs with no
    tokens are dropped (SQL post-unnest GROUP BY semantics).

    Map-only, zero shuffle: within each batch the per-(row, word)
    counts come from one ``np.unique`` over a combined (row, word-code)
    key and the per-row entropy from one ``np.add.reduceat`` segment
    sum — the corpus never moves, no per-row Python.
    """
    def _ent(t: pa.Table) -> pa.Table:
        flat, off = flat_words(t.column(text_col))
        counts = np.diff(off)
        if len(flat) == 0:
            return pa.table({
                id_col: t.column(id_col).slice(0, 0),
                "entropy": pa.array([], pa.float64()),
            })
        row = np.repeat(np.arange(len(t), dtype=np.int64), counts)
        codes, _ = pd.factorize(flat.to_pandas(), sort=False)
        width = np.int64(codes.max()) + 1
        comb = row * width + codes
        uniq, cnt = np.unique(comb, return_counts=True)
        urow = (uniq // width).astype(np.int64)
        p = cnt / counts[urow].astype(np.float64)
        contrib = -p * np.log(p)
        seg = np.concatenate([[0], np.nonzero(np.diff(urow))[0] + 1])
        ent = np.add.reduceat(contrib, seg)
        out_rows = urow[seg]
        return pa.table({
            id_col: t.column(id_col).take(pa.array(out_rows)),
            "entropy": pa.array(np.round(ent, round_digits), pa.float64()),
        })

    return ds.map_batches(_ent, batch_format="pyarrow")


def grouped_topk_tokens(
    ds: Dataset,
    group_col: str,
    k: int = 3,
    text_col: str = "text",
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Top-``k`` most frequent ``\\S+`` tokens PER GROUP (count desc,
    token asc) — grouped heavy hitters (e.g. signature vocabulary per
    language / per domain).

    Same shape as :func:`topk_tokens` but keyed: the map side combines
    each batch to one row per (group, token) partial count, ONE
    exchange on (group, token) sums them exactly, and the final
    per-group top-k is a second tiny exchange over the already-
    aggregated (group, token, n) rows via ``top_n_per_group``'s
    candidate-pruned shape. Raw text never shuffles.
    """
    from kgray.kernels.hashagg import auto_partitions, grouped_apply
    from kgray.stages.relational import top_n_per_group

    if num_partitions is None:
        num_partitions = auto_partitions()

    def _count(t: pa.Table) -> pa.Table:
        flat, off = flat_words(t.column(text_col))
        if len(flat) == 0:
            return pa.table({
                group_col: t.column(group_col).slice(0, 0),
                "tok": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            })
        counts = np.diff(off)
        row = np.repeat(np.arange(len(t), dtype=np.int64), counts)
        df = pd.DataFrame({
            group_col: t.column(group_col).to_pandas().take(row).to_numpy(),
            "tok": flat.to_pandas().to_numpy(),
        })
        g = df.groupby([group_col, "tok"], sort=False).size().rename("n").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def _sum(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby([group_col, "tok"], as_index=False, sort=False)["n"].sum()
        out["n"] = out["n"].astype("int64")
        return out

    counted = ds.select_columns([group_col, text_col]).map_batches(
        _count, batch_format="pyarrow")
    sums = grouped_apply(counted, [group_col, "tok"], _sum,
                         num_partitions=num_partitions, map_side=_sum)
    return top_n_per_group(sums, group_col, order_col="n", n=k,
                           ascending=False, tie_cols=["tok"],
                           num_partitions=num_partitions)


def chunk_text(
    ds: Dataset,
    window: int = 64,
    stride: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Sliding token-window chunker — the training-data preprocessor
    that turns documents into overlapping fixed-size word chunks
    (window ``window`` words, hop ``stride``; chunk starts at 0, S,
    2S, … < n_words, tail chunks run short). Emits ``(id, chunk_idx,
    n_words, chunk_text)``.

    Map-only, zero shuffle, zero per-row Python: per batch, chunk
    start/length arrays come from offset arithmetic, the word gather is
    ONE ``take`` over the flat word array, and chunk strings come from
    ONE Arrow ``binary_join`` over a rebuilt ListArray — no Python
    string assembly.
    """
    def _chunks(t: pa.Table) -> pa.Table:
        flat, off = flat_words(t.column(text_col))
        n = np.diff(off)  # words per doc
        n_chunks = np.where(n > 0, (n + stride - 1) // stride, 0)
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table({
                id_col: t.column(id_col).slice(0, 0),
                "chunk_idx": pa.array([], pa.int64()),
                "n_words": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
            })
        doc = np.repeat(np.arange(len(t), dtype=np.int64), n_chunks)
        cidx = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(n_chunks) - n_chunks, n_chunks)
        start = cidx * stride
        length = np.minimum(start + window, n[doc]) - start
        # Word gather: one flat index array over all chunks.
        w_total = int(length.sum())
        chunk_row = np.repeat(np.arange(total, dtype=np.int64), length)
        pos_in_chunk = np.arange(w_total, dtype=np.int64) - np.repeat(
            np.cumsum(length) - length, length)
        widx = off[:-1][doc[chunk_row]] + start[chunk_row] + pos_in_chunk
        words = flat.take(pa.array(widx))
        ch_off = np.concatenate([[0], np.cumsum(length)]).astype(np.int32)
        chunks = pa.ListArray.from_arrays(pa.array(ch_off), words)
        text = pc.binary_join(chunks, pa.scalar(" "))
        return pa.table({
            id_col: t.column(id_col).take(pa.array(doc)),
            "chunk_idx": pa.array(cidx),
            "n_words": pa.array(length.astype(np.int64)),
            "chunk_text": text,
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        _chunks, batch_format="pyarrow")


def hash_features(
    ds: Dataset,
    n_features: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Feature hashing (the hashing trick): every ``\\S+`` token maps to
    ``md5(token) first-8-hex % n_features`` and per-document counts
    accumulate per feature index (collisions merge — that is the
    trick). Long output ``(id, feat_idx, n)`` — the sparse-matrix
    feed for linear/hashed-ngram models.

    Map-only, zero shuffle: md5 runs once per UNIQUE token per batch
    (factorize then hash the distinct set — the package's md5
    convention, pinned by the SQL oracle), counts from one pandas
    groupby per batch.
    """
    import hashlib

    def _feat(t: pa.Table) -> pa.Table:
        flat, off = flat_words(t.column(text_col))
        if len(flat) == 0:
            return pa.table({
                id_col: t.column(id_col).slice(0, 0),
                "feat_idx": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        counts = np.diff(off)
        row = np.repeat(np.arange(len(t), dtype=np.int64), counts)
        codes, uniques = pd.factorize(flat.to_pandas(), sort=False)
        uidx = np.empty(len(uniques), dtype=np.int64)
        for i, s in enumerate(uniques.tolist()):
            uidx[i] = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16) % n_features
        g = (pd.DataFrame({"r": row, "f": uidx[codes]})
             .groupby(["r", "f"], sort=False).size().rename("n").reset_index())
        return pa.table({
            id_col: t.column(id_col).take(pa.array(g["r"].to_numpy())),
            "feat_idx": pa.array(g["f"].to_numpy(np.int64)),
            "n": pa.array(g["n"].to_numpy(np.int64)),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        _feat, batch_format="pyarrow")


def lexical_diversity(
    ds: Dataset,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> Dataset:
    """Distinct-n-gram ratio per document (type/token ratio over
    n-grams) — the lexical-diversity quality signal complementing
    doc_entropy (low ratio = templated/repetitive text). Docs with
    fewer than ``n`` words emit no row (they have no n-gram).

    Map-only, zero shuffle: the gram construction is ngram_strings'
    offset-shifted element-wise joins with the doc index retained; the
    per-doc distinct count is one np.unique over a combined
    (doc, gram-code) key; totals come from the offsets.
    """
    def _div(t: pa.Table) -> pa.Table:
        flat, off = flat_words(t.column(text_col))
        n_words = off[1:] - off[:-1]
        n_grams = np.maximum(n_words - (n - 1), 0)
        total = int(n_grams.sum())
        if total == 0:
            return pa.table({
                id_col: t.column(id_col).slice(0, 0),
                "n_grams": pa.array([], pa.int64()),
                "n_distinct": pa.array([], pa.int64()),
                "diversity": pa.array([], pa.float64()),
            })
        doc_idx = np.repeat(np.arange(len(n_words), dtype=np.int64), n_grams)
        first = np.concatenate([[0], np.cumsum(n_grams)])[:-1]
        pos = np.arange(total, dtype=np.int64) - np.repeat(first, n_grams)
        start = off[:-1][doc_idx] + pos
        parts = [flat.take(pa.array(start + j)) for j in range(n)]
        sep = pa.scalar(" ")
        grams = parts[0]
        for p in parts[1:]:
            grams = pc.binary_join_element_wise(grams, p, sep)
        codes, _ = pd.factorize(grams.to_pandas(), sort=False)
        width = np.int64(codes.max()) + 1
        # distinct (doc, gram) pairs → per-doc distinct counts;
        # uniq_docs is exactly the gram-bearing docs, ascending.
        pair = np.unique(doc_idx * width + codes)
        uniq_docs, n_distinct = np.unique((pair // width).astype(np.int64),
                                          return_counts=True)
        totals = n_grams[uniq_docs]
        div = np.round(n_distinct / totals.astype(np.float64), round_digits)
        return pa.table({
            id_col: t.column(id_col).take(pa.array(uniq_docs)),
            "n_grams": pa.array(totals.astype(np.int64)),
            "n_distinct": pa.array(n_distinct.astype(np.int64)),
            "diversity": pa.array(div),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        _div, batch_format="pyarrow")


def bigram_nll(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.9,
    num_partitions: Optional[int] = None,
    model_broadcast_limit: int = 2_000_000,
) -> Dataset:
    """Interpolated BIGRAM LM quality score (the CCNet/KenLM filter one
    order up from :func:`unigram_nll`): per-doc mean negative
    log-likelihood of its adjacent word pairs under the corpus-trained
    model ``p(w2|w1) = λ·c12/c1 + (1−λ)·c2/N``. Docs with < 2 tokens
    are dropped (no bigrams — SQL GROUP BY semantics). Self-trained on
    the scored corpus, so every doc bigram has c12 ≥ 1 and the model is
    total.

    Two model-statistics exchanges (unigram counts keyed by token,
    bigram counts keyed by the pair — both combiner-fronted), then a
    SIZE-SWITCHED scoring pass:

    * model rows ≤ ``model_broadcast_limit``: counts broadcast via one
      ``ray.put`` each and scoring is map-only — the corpus never
      shuffles (the sf-scale and modest-vocab path);
    * above the limit (web-scale vocabularies): the corpus's exploded
      ``(doc_id, cur, nxt)`` bigram rows ride THREE hash joins against
      the count Datasets (pair, left unigram, right unigram) and a
      final doc-keyed grouped mean with a (sum, count) map-side monoid
      — nothing driver-side. Both paths pinned equal by the
      forced-switch pytest.
    """
    import ray

    from kgray.kernels.hashagg import (auto_partitions, grouped_apply,
                                       register_schema, stable_round)

    if num_partitions is None:
        num_partitions = auto_partitions()

    def _bigrams(t: pa.Table, with_doc: bool) -> pa.Table:
        flat, off = flat_words(t.column(text_col))
        words = flat.to_numpy(zero_copy_only=False)
        n = len(words)
        if n < 1:
            cols = {"cur": pa.array([], pa.string()),
                    "nxt": pa.array([], pa.string())}
            if with_doc:
                cols[id_col] = t.column(id_col).slice(0, 0)
            return pa.table(cols)
        starts = np.zeros(n, dtype=bool)
        starts[off[:-1][off[:-1] < n]] = True
        inside = ~starts[1:]
        cur, nxt = words[:-1][inside], words[1:][inside]
        cols = {"cur": pa.array(cur, pa.string()),
                "nxt": pa.array(nxt, pa.string())}
        if with_doc:
            # Per-word doc index via repeat over doc lengths: a zero-token
            # doc shares its offset with the next doc, which collapses the
            # start-flag cumsum trick (offsets [0,2,2,4] would attribute
            # doc 2's words to doc 1); np.repeat over np.diff(off) is
            # immune to empty docs.
            counts = np.asarray(off[1:], np.int64) - np.asarray(off[:-1],
                                                                np.int64)
            doc_of = np.repeat(np.arange(len(counts)), counts)[:-1][inside]
            cols[id_col] = t.column(id_col).take(pa.array(doc_of))
        return pa.table(cols)

    def _uni_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("tok", as_index=False, sort=False)["c"].sum()

    def _toks(t: pa.Table) -> pa.Table:
        flat, _ = flat_words(t.column(text_col))
        return pa.table({"tok": flat, "c": pa.array(np.ones(len(flat), np.int64))})

    pruned = ds.select_columns([id_col, text_col])
    uni = grouped_apply(pruned.map_batches(_toks, batch_format="pyarrow"),
                        ["tok"], _uni_partial, num_partitions=num_partitions,
                        map_side=_uni_partial).materialize()

    def _bi_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["cur", "nxt"], as_index=False, sort=False)["c"].sum()

    bi = grouped_apply(
        pruned.map_batches(lambda t: _bigrams(t, False), batch_format="pyarrow")
        .map_batches(lambda t: t.append_column(
            "c", pa.array(np.ones(len(t), np.int64))), batch_format="pyarrow"),
        ["cur", "nxt"], _bi_partial, num_partitions=num_partitions,
        map_side=_bi_partial).materialize()

    n_total = 0
    for b in uni.map_batches(
            lambda df: pd.DataFrame({"n": [int(df["c"].sum())]}),
            batch_format="pandas").iter_batches(batch_format="pyarrow"):
        n_total += int(b.column("n").to_numpy().sum())
    N = float(n_total)

    if uni.count() + bi.count() <= model_broadcast_limit:
        uref = ray.put({r["tok"]: r["c"] for r in uni.take_all()})
        bref = ray.put({f'{r["cur"]}\x1f{r["nxt"]}': r["c"] for r in bi.take_all()})

        def _score(t: pa.Table) -> pa.Table:
            um = ray.get(uref) if isinstance(uref, ray.ObjectRef) else uref
            bm = ray.get(bref) if isinstance(bref, ray.ObjectRef) else bref
            bt = _bigrams(t, True)
            if len(bt) == 0:
                return pa.table({id_col: t.column(id_col).slice(0, 0),
                                 "nll": pa.array([], pa.float64())})
            cur = bt.column("cur").to_pandas()
            nxt = bt.column("nxt").to_pandas()
            keys = cur.str.cat(nxt, sep="\x1f")
            c12 = keys.map(bm).to_numpy(np.float64)
            c1 = cur.map(um).to_numpy(np.float64)
            c2 = nxt.map(um).to_numpy(np.float64)
            logp = np.log(lam * (c12 / c1) + (1.0 - lam) * (c2 / N))
            df = pd.DataFrame({id_col: bt.column(id_col).to_pandas(), "lp": logp})
            g = df.groupby(id_col, sort=False)["lp"].agg(["sum", "size"])
            return pa.table({
                id_col: pa.array(g.index.to_numpy(),
                                 type=t.column(id_col).type),
                "nll": stable_round(
                    pa.array(-(g["sum"] / g["size"]).to_numpy(), pa.float64()), 6),
            })

        return pruned.map_batches(_score, batch_format="pyarrow")

    # ---- join path (model too large to broadcast) -----------------------
    from kgray.stages.relational import hash_join

    id_type = None  # resolved lazily from the first join's schema hints
    bg = pruned.map_batches(lambda t: _bigrams(t, True), batch_format="pyarrow")
    bi_j = bi.map_batches(
        lambda df: df.rename(columns={"c": "c12"}), batch_format="pandas")
    j1 = hash_join(bg, bi_j, on=["cur", "nxt"], how="inner",
                   num_partitions=num_partitions)
    u1 = uni.map_batches(lambda df: df.rename(columns={"tok": "cur", "c": "c1"}),
                         batch_format="pandas")
    j2 = hash_join(j1, u1, on="cur", how="inner", num_partitions=num_partitions)
    u2 = uni.map_batches(lambda df: df.rename(columns={"tok": "nxt", "c": "c2"}),
                         batch_format="pandas")
    j3 = hash_join(j2, u2, on="nxt", how="inner", num_partitions=num_partitions)

    def _lp(t: pa.Table) -> pa.Table:
        c12 = t.column("c12").to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = t.column("c1").to_numpy(zero_copy_only=False).astype(np.float64)
        c2 = t.column("c2").to_numpy(zero_copy_only=False).astype(np.float64)
        lp = np.log(lam * (c12 / c1) + (1.0 - lam) * (c2 / N))
        return pa.table({id_col: t.column(id_col),
                         "lp_sum": pa.array(lp, pa.float64()),
                         "n": pa.array(np.ones(len(t), np.int64))})

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(id_col, as_index=False, sort=False).agg(
            lp_sum=("lp_sum", "sum"), n=("n", "sum"))

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df = _fold(df)
        out = pd.DataFrame({id_col: df[id_col],
                            "nll": -(df["lp_sum"] / df["n"])})
        out["nll"] = out["nll"].round(6)
        return out

    return grouped_apply(j3.map_batches(_lp, batch_format="pyarrow"),
                         [id_col], _finish, num_partitions=num_partitions,
                         map_side=_fold)
