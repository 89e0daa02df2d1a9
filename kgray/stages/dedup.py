"""Deduplication operators for large-scale training-data pipelines.

All operators are Dataset→Dataset and scale-shaped:

* ``exact_dedup``     — content-hash partition + per-group min-id keep.
  The shuffle key is the 16-byte digest, not the document — at 100 TB
  the groupby moves hashes + ids only (text is re-read at the survivor
  join or, as here, carried once per group via an algebraic MinAny).
* ``minhash_lsh_pairs`` / ``minhash_lsh_dedup`` — word-shingle MinHash
  → banded LSH bucket groupby → candidate pairs → exact-Jaccard verify
  → connected components → keep min id per cluster.
* ``simhash_pairs`` — 64-bit SimHash, banded into 16-bit chunks for
  candidate generation, verified by Hamming distance.
* ``embedding_near_dup`` — cosine ≥ threshold pairs over an embedding
  column; batched matmul against a broadcast matrix (small-side) —
  the LSH-bucketed variant for two large sides is in similarity.py.

Candidate verification needs both documents of a pair. The corpus text
is NEVER materialized on the driver: the (small) candidate-id set is
broadcast to semi-filter the corpus down to pair-relevant rows, then
the candidate pairs hash-join that filtered slice on (id_a) and (id_b)
and Jaccard is verified per batch with shingle-hash sets computed once
per unique text. Only O(pairs) text ever moves.
"""

from __future__ import annotations

import hashlib
import re
import zlib
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data import Dataset


from kgray.kernels.kgx_agg import MinAny
from kgray.stages.canonical import union_find

_WORD = re.compile(r"\S+")
_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id",
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Keep the min-id row per distinct text. Output: (id_col, text_col).

    Hash-partition on a 64-bit vectorized content hash
    (``pd.util.hash_array`` — one C pass per batch, no per-row Python;
    the md5-hexdigest list comprehension this replaced was the stage's
    wall-clock) — the exchange key is 8 bytes regardless of document
    size. COLLISION-SAFE despite the short key: the combiner/reduce
    deduplicate on ``(hash, text)``, so two distinct texts that share a
    64-bit hash merely co-locate in one partition and both survive;
    the hash only routes, equality is always decided on the full text.
    Combiner keeps the min-id row per (hash, text) within each batch;
    the per-partition reduce repeats the same C-speed sort +
    drop_duplicates. Fully vectorized end to end.
    """

    def _hash(t: pa.Table) -> pa.Table:
        if len(t):
            arr = t.column(text_col).to_pandas().to_numpy(dtype=object)
            h = pd.util.hash_array(arr).astype(np.uint64)
        else:
            h = np.array([], dtype=np.uint64)
        return t.select([id_col, text_col]).append_column(
            "__h", pa.array(h, type=pa.uint64()))

    def _keep_min(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["__h", id_col],
                              kind="mergesort").drop_duplicates(["__h", text_col])

    from kgray.kernels.hashagg import auto_partitions, grouped_apply

    if num_partitions is None:
        num_partitions = auto_partitions()
    hashed = ds.map_batches(_hash, batch_format="pyarrow")
    out = grouped_apply(hashed, ["__h"], _keep_min, num_partitions=num_partitions, map_side=_keep_min)
    return out.drop_columns(["__h"])


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

def _shingles(text: str, k: int = 3) -> List[str]:
    words = _WORD.findall(text or "")
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


class _MinHasher:
    """Per-actor state: permutation coefficients (seeded, deterministic)."""

    def __init__(self, num_perm: int = 64, seed: int = 23):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)

    def signature(self, shingles: List[str]) -> Optional[np.ndarray]:
        if not shingles:
            return None
        h = np.array([zlib.crc32(s.encode("utf-8")) for s in shingles], dtype=np.uint64)
        # (a*h + b) mod p vectorized over (perm, shingle)
        mat = (self.a[:, None] * h[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return mat.min(axis=1)


class _BandEmitter:
    """map_batches actor: docs → (band, bucket, id) rows.

    Fully batch-vectorized: shingle hashing is ONE pandas C hash over
    the batch's flattened shingle list, signatures are one
    (perm × shingles) matmul-shaped op with per-doc ``minimum.reduceat``
    segment-mins, and band buckets are a vectorized polynomial mix of
    each band's signature rows (the per-doc Python loop + per-shingle
    crc32 version cost ~3× the wall at 10⁶ shingles/batch)."""

    def __init__(self, text_col: str, id_col: str, num_perm: int, band_rows: int, shingle_k: int):
        self.mh = _MinHasher(num_perm)
        self.text_col, self.id_col = text_col, id_col
        self.band_rows = band_rows
        self.num_bands = num_perm // band_rows
        self.shingle_k = shingle_k

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column(self.text_col).to_pylist()
        ids = t.column(self.id_col).to_pylist()
        flat: List[str] = []
        counts: List[int] = []
        kept_rows: List[int] = []
        for r, text in enumerate(texts):
            sh = _shingles(text, self.shingle_k)
            if not sh:
                continue
            flat.extend(sh)
            counts.append(len(sh))
            kept_rows.append(r)
        if not flat:
            # Empty output keeps the id column's NATIVE type — a
            # fully-filtered batch must not emit a schema (int64) that
            # conflicts with non-empty batches for string-id corpora.
            return pa.table(
                {
                    "band": pa.array([], type=pa.int32()),
                    "bucket": pa.array([], type=pa.int64()),
                    self.id_col: pa.array([], type=t.column(self.id_col).type),
                }
            )
        import pandas as _pd

        h = _pd.util.hash_array(np.array(flat, dtype=object)).astype(np.uint64)
        # (perm, shingle) permutation values; uint64 wraparound is fine —
        # it is a deterministic mix and candidates are exactly verified.
        mat = (self.mh.a[:, None] * h[None, :] + self.mh.b[:, None]) % np.uint64(_MERSENNE)
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
        sig = np.minimum.reduceat(mat, offsets, axis=1)  # (perm, docs)
        n_docs = sig.shape[1]
        # Band bucket: polynomial mix of the band's signature rows.
        buckets = np.empty((self.num_bands, n_docs), dtype=np.uint64)
        mult = np.uint64(0x9E3779B97F4A7C15)
        for band in range(self.num_bands):
            acc = np.zeros(n_docs, dtype=np.uint64)
            for rr in range(band * self.band_rows, (band + 1) * self.band_rows):
                acc = acc * mult + sig[rr]
            buckets[band] = acc
        kept_ids = np.asarray([ids[r] for r in kept_rows])
        return pa.table(
            {
                "band": pa.array(
                    np.repeat(np.arange(self.num_bands, dtype=np.int32), n_docs)
                ),
                "bucket": pa.array(
                    (buckets >> np.uint64(1)).astype(np.int64).reshape(-1)
                ),
                self.id_col: pa.array(np.tile(kept_ids, self.num_bands)),
            }
        )


def _true_jaccard(a: str, b: str, k: int) -> float:
    sa, sb = set(_shingles(a, k)), set(_shingles(b, k))
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def _shingle_set(text: str, k: int) -> frozenset:
    return frozenset(_shingles(text, k))


def minhash_lsh_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_perm: int = 64,
    band_rows: int = 2,
    shingle_k: int = 3,
    max_bucket: int = 200,
    verify_broadcast_limit: int = 100_000,
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Verified near-dup pairs (id_a < id_b, true Jaccard ≥ threshold).

    Buckets larger than ``max_bucket`` are skipped and LOGGED (warning
    with bucket sizes) from the pair-generation partition — no silent
    caps: giant buckets mean a degenerate bucket (e.g. empty docs) and
    quadratic pair blowup; the log makes the recall loss visible.

    Verification is join-based (100-TB-safe): the distinct candidate
    ids (tiny — that is the point of LSH) are broadcast to semi-filter
    the corpus, then the pairs hash-join the filtered slice on id_a
    and id_b; true Jaccard runs per batch with shingle sets computed
    once per unique text. The full corpus text never reaches the
    driver and never broadcasts. When the candidate set fits
    ``verify_broadcast_limit`` the semi-filtered slice (still
    O(candidates), never the corpus) is broadcast instead of joined —
    same results, none of the joins' fixed aggregator cost.
    """
    import logging

    from kgray.kernels.hashagg import auto_partitions, distinct, grouped_apply

    logger = logging.getLogger(__name__)

    if num_partitions is None:
        num_partitions = auto_partitions()
    bands = ds.map_batches(
        _BandEmitter,
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, num_perm=num_perm,
            band_rows=band_rows, shingle_k=shingle_k,
        ),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    # Pair generation per (band, bucket), hash-partitioned on the bucket
    # so Ray sees only P groups (LSH makes ~N·bands near-singleton
    # buckets — per-group scheduling would dominate). Within a
    # partition: C-speed filter to multi-member buckets, then a Python
    # loop over only those.
    def _pairs_partition(part: pd.DataFrame) -> pd.DataFrame:
        multi = part[part.duplicated(["band", "bucket"], keep=False)]
        out_a, out_b = [], []
        skipped: List[int] = []
        for _, g in multi.groupby(["band", "bucket"], sort=False):
            ids = sorted(set(g[id_col]))
            if len(ids) < 2:
                continue
            if len(ids) > max_bucket:
                skipped.append(len(ids))
                continue
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        if skipped:
            logger.warning(
                "minhash_lsh_pairs: skipped %d oversized buckets (> %d members; "
                "sizes %s) — candidate recall for those buckets is lost",
                len(skipped), max_bucket, sorted(skipped, reverse=True)[:10],
            )
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    cand = grouped_apply(bands, ["band", "bucket"], _pairs_partition, num_partitions=num_partitions)
    # Per-batch dedup is shuffle-free; cross-partition duplicates are
    # handled per path below. Materialized: feeds the id gather AND the
    # verify/join stage.
    cand = cand.map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas"
    ).materialize()

    # 1) Gather the DISTINCT candidate ids (tiny: ≤ 2·|pairs| — the
    # point of LSH) and the pair chunks in the same single pass.
    id_arrays: List[pa.Array] = []
    pair_tables: List[pa.Table] = []
    for b in cand.iter_batches(batch_format="pyarrow", batch_size=1 << 18):
        id_arrays.extend(b.column("id_a").chunks)
        id_arrays.extend(b.column("id_b").chunks)
        pair_tables.append(b)
    if not id_arrays:
        return cand  # no candidates: empty (id_a, id_b) dataset
    cand_ids = pc.unique(pa.chunked_array(id_arrays))
    idref = ray.put(cand_ids)

    # 2) Broadcast semi-filter: corpus → only pair-relevant (id, text).
    def _semi(t: pa.Table) -> pa.Table:
        wanted = ray.get(idref) if isinstance(idref, ray.ObjectRef) else idref
        return t.filter(pc.is_in(t.column(id_col), value_set=wanted))

    relevant = ds.select_columns([id_col, text_col]).map_batches(
        _semi, batch_format="pyarrow"
    )

    # 2b) Small-candidate fast path: when the DISTINCT candidate ids fit
    # the broadcast budget (the normal LSH regime — candidates are tiny
    # by design), broadcast the SEMI-FILTERED slice (O(candidates), NOT
    # the corpus) and verify directly over the pair set; two hash joins
    # cost seconds of fixed aggregator spin-up that dwarf the work at
    # this size. The join path below remains the large-candidate route.
    if len(cand_ids) <= verify_broadcast_limit:
        # The pair set is the same small side already on the driver —
        # dedup it here (C-speed) instead of a distributed distinct.
        pairs_df = (
            pa.concat_tables(pair_tables).to_pandas().drop_duplicates(["id_a", "id_b"])
        )
        n_blocks = max(1, min(8, len(pairs_df) // 4096))
        cand = ray.data.from_pandas(list(np.array_split(pairs_df, n_blocks)))
        texts: Dict = {}
        for b in relevant.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
            texts.update(zip(b.column(id_col).to_pylist(), b.column(text_col).to_pylist()))
        tref = ray.put(texts)

        def _verify_small(t: pa.Table) -> pa.Table:
            tx = ray.get(tref) if isinstance(tref, ray.ObjectRef) else tref
            cache: Dict = {}

            def sset(key):
                s = cache.get(key)
                if s is None:
                    s = cache[key] = _shingle_set(tx.get(key, ""), shingle_k)
                return s

            keep = []
            for i, (ai, bi) in enumerate(
                zip(t.column("id_a").to_pylist(), t.column("id_b").to_pylist())
            ):
                sa, sb = sset(ai), sset(bi)
                if sa and sb and len(sa & sb) / len(sa | sb) >= threshold:
                    keep.append(i)
            return t.take(pa.array(keep, type=pa.int64())).select(["id_a", "id_b"])

        return cand.map_batches(_verify_small, batch_format="pyarrow")

    # 3) Double hash-join of the pair set against the filtered slice.
    # Cross-partition duplicate pairs are removed by a distributed
    # distinct first — at this size the joins would amplify them.
    cand = distinct(cand, ["id_a", "id_b"], num_partitions=max(2, num_partitions // 2))

    def _as(a_name: str, t_name: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({a_name: t.column(id_col), t_name: t.column(text_col)})
        return fn

    join_parts = max(2, num_partitions // 4)
    with_a = cand.join(
        relevant.map_batches(_as("id_a", "__text_a"), batch_format="pyarrow"),
        join_type="inner", num_partitions=join_parts, on=("id_a",), right_on=("id_a",),
    )
    with_ab = with_a.join(
        relevant.map_batches(_as("id_b", "__text_b"), batch_format="pyarrow"),
        join_type="inner", num_partitions=join_parts, on=("id_b",), right_on=("id_b",),
    )

    # 4) Verify per batch; shingle each unique text once (cached by id).
    def _verify(t: pa.Table) -> pa.Table:
        cache: Dict = {}

        def sset(key, text):
            s = cache.get(key)
            if s is None:
                s = cache[key] = _shingle_set(text, shingle_k)
            return s

        keep = []
        for i, (ai, bi, ta, tb) in enumerate(
            zip(
                t.column("id_a").to_pylist(),
                t.column("id_b").to_pylist(),
                t.column("__text_a").to_pylist(),
                t.column("__text_b").to_pylist(),
            )
        ):
            sa, sb = sset(ai, ta), sset(bi, tb)
            if sa and sb and len(sa & sb) / len(sa | sb) >= threshold:
                keep.append(i)
        return t.take(pa.array(keep, type=pa.int64())).select(["id_a", "id_b"])

    return with_ab.map_batches(_verify, batch_format="pyarrow")


def minhash_lsh_dedup(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    pair_broadcast_limit: int = 1_000_000,
    **kw,
) -> Dataset:
    """Survivors after near-dup clustering: min id per connected component.

    The verified pair set is usually tiny relative to the corpus (that
    is the point of LSH), so the default path closes components on the
    driver with union-find and broadcasts the drop set. But a 100-TB
    corpus with a high duplicate rate gives no such guarantee — when
    the verified-pair COUNT (cheap: metadata of the materialized pairs
    dataset) exceeds ``pair_broadcast_limit``, clustering size-switches
    to :func:`kgray.stages.canonical.connected_components_distributed`
    (min-label propagation; ``cast_ids=False`` so integer ids take the
    NUMERIC min exactly like union-find) and the survivor filter
    becomes a distributed anti-join — the corpus rides ONE hash
    exchange on ``id_col`` instead of a broadcast lookup. Same output
    either way (pinned by the forced-switch pytest).

    CONSUMPTION CONTRACT: ``ds`` is consumed three times (band pass,
    verify semi-filter, survivor filter). Pass a materialized /
    checkpointed dataset when the upstream is an expensive lazy chain —
    otherwise the whole prefix re-executes per consumer
    (``curate_corpus(checkpoint=True)`` does this for you; a bare
    ``read_parquet`` input is fine as-is, re-reading is streaming and
    cheap).
    """
    pairs = minhash_lsh_pairs(ds, text_col, id_col, threshold, **kw).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ds

    if n_pairs <= pair_broadcast_limit:
        plist = [(r["id_a"], r["id_b"]) for r in pairs.take_all()]
        labels = union_find(plist)
        drop_ids = [n for n, lab in labels.items() if lab != n]
        if not drop_ids:
            return ds
        drop = pa.array(drop_ids)
        dref = ray.put(drop)

        def _filter(t: pa.Table) -> pa.Table:
            d = ray.get(dref) if isinstance(dref, ray.ObjectRef) else dref
            mask = pc.invert(pc.is_in(t.column(id_col), value_set=d))
            return t.filter(mask)

        return ds.map_batches(_filter, batch_format="pyarrow")

    # Distributed path: pair set too large for a driver fold.
    from kgray.stages.canonical import connected_components_distributed
    from kgray.stages.relational import hash_join

    labels = connected_components_distributed(
        pairs, src="id_a", dst="id_b", cast_ids=False)

    def _drops(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(t.column("node"), t.column("label")))
        return pa.table({id_col: t.column("node").filter(keep)})

    drop_ds = labels.map_batches(_drops, batch_format="pyarrow")
    return hash_join(ds, drop_ds, on=id_col, how="anti")


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (inverted-index join — no sketching)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    shingle_k: int = 3,
    max_postings: int = 1000,
    num_partitions: Optional[int] = None,
    score: str = "jaccard",
    group_col: Optional[str] = None,
) -> Dataset:
    """EXACT near-dup pairs (id_a < id_b, word-``shingle_k``-gram Jaccard
    ≥ threshold) — the deterministic sibling of ``minhash_lsh_pairs``.

    ``group_col`` scopes the dedup WITHIN groups (e.g. per-language —
    the standard curation setup): the group value is mixed into every
    shingle key before hashing, so cross-group shingles can never meet
    in a postings list — scoping costs nothing and removes the
    cross-group pair blowup of shared boilerplate.

    ``score="containment"`` switches the keep rule to set containment
    ``m / min(sz_a, sz_b) ≥ threshold`` — catches a short document
    embedded inside a long one, which Jaccard structurally misses (the
    union denominator dilutes it); the standard complement in
    suffix/copy detection. Same exchanges, same exactness caveat.

    Distributed inverted-index shape (nothing broadcast, no driver
    materialization):

    1. map: each doc → one row per DISTINCT shingle
       ``(sh = 64-bit shingle hash, id, sz = |shingle set|)``; only
       hashes + ids shuffle, never text.
    2. exchange on ``sh``: per-partition C-speed self-merge of the
       postings lists → co-occurrence rows ``(id_a, id_b, sz_a, sz_b)``
       (one per shared shingle). Postings longer than ``max_postings``
       are skipped AND logged — a shingle shared by >1000 docs is
       boilerplate, and its pair blowup is quadratic.
    3. exchange on ``(id_a, id_b)``: sum co-occurrences → intersection
       ``m``; keep pairs with ``m / (sz_a + sz_b − m) ≥ threshold``.

    Exactness caveat: shingles are compared by 64-bit md5 prefix; a
    hash collision (P ≈ n²/2⁶⁴) could overcount one intersection.
    """
    import logging

    from kgray.kernels.hashagg import auto_partitions, grouped_apply

    logger = logging.getLogger(__name__)

    if num_partitions is None:
        num_partitions = auto_partitions()

    def _emit(t: pa.Table) -> pa.Table:
        # Vectorized map side (mirrors _SimHasher/_BandEmitter): per-doc
        # distinct shingles are flattened across the batch, md5 runs once
        # per UNIQUE shingle (factorize is a C hash pass), ids/sizes are
        # np.repeat'ed — no per-shingle Python hashing in the hot loop.
        texts = t.column(text_col).to_pylist()
        ids_py = t.column(id_col).to_pylist()
        groups = t.column(group_col).to_pylist() if group_col else None
        flat: List[str] = []
        counts: List[int] = []
        kept: List[int] = []
        for r, text in enumerate(texts):
            ss = _shingle_set(text, shingle_k)
            if not ss:
                continue
            if groups is not None:
                # "\n" separator: newline is whitespace, so it can never
                # occur inside a \S+-word shingle — and unlike "\x00" it
                # survives pandas' C-string factorize (which TRUNCATES
                # object strings at an embedded NUL, collapsing every
                # group-prefixed key to just the group).
                g = str(groups[r])
                flat.extend(g + "\n" + s for s in ss)
            else:
                flat.extend(ss)
            counts.append(len(ss))
            kept.append(r)
        if not flat:
            return pa.table(
                {
                    "sh": pa.array([], type=pa.int64()),
                    id_col: pa.array([], type=t.column(id_col).type),
                    "sz": pa.array([], type=pa.int32()),
                }
            )
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
        uh = np.empty(len(uniques), dtype=np.uint64)
        for i, s in enumerate(uniques.tolist()):
            uh[i] = np.frombuffer(hashlib.md5(s.encode("utf-8")).digest()[:8], dtype="<u8")[0]
        cnt = np.asarray(counts, dtype=np.int64)
        ids_np = np.asarray([ids_py[r] for r in kept])
        return pa.table(
            {
                "sh": pa.array(uh[codes].view(np.int64)),
                id_col: pa.array(np.repeat(ids_np, cnt)),
                "sz": pa.array(np.repeat(cnt.astype(np.int32), cnt)),
            }
        )

    in_cols = [id_col, text_col] + ([group_col] if group_col else [])
    posted = ds.select_columns(in_cols).map_batches(_emit, batch_format="pyarrow")

    def _cooccur(part: pd.DataFrame) -> pd.DataFrame:
        cnt = part.groupby("sh")["sh"].transform("size")
        over = cnt > max_postings
        if over.any():
            sizes = part.loc[over].groupby("sh")["sh"].size()
            logger.warning(
                "ngram_jaccard_pairs: skipped %d oversized postings lists "
                "(> %d docs; sizes %s) — pairs joined only by those "
                "shingles are lost",
                len(sizes), max_postings, sorted(sizes.tolist(), reverse=True)[:10],
            )
        part = part[(cnt >= 2) & ~over]
        m = part.merge(part, on="sh", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        return pd.DataFrame(
            {
                "id_a": m[f"{id_col}_a"].to_numpy(),
                "id_b": m[f"{id_col}_b"].to_numpy(),
                "sz_a": m["sz_a"].to_numpy(),
                "sz_b": m["sz_b"].to_numpy(),
            }
        )

    co = grouped_apply(posted, ["sh"], _cooccur, num_partitions=num_partitions)

    # Combiner: collapse per-batch duplicates of a pair into partial
    # counts so the second exchange moves one row per (pair, batch).
    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        if "m" not in df.columns:
            df = df.assign(m=1)
        return (
            df.groupby(["id_a", "id_b", "sz_a", "sz_b"], sort=False)["m"]
            .sum()
            .reset_index()
        )

    def _jaccard(part: pd.DataFrame) -> pd.DataFrame:
        g = _partial(part)
        if score == "containment":
            s = g["m"] / np.minimum(g["sz_a"], g["sz_b"])
        else:
            s = g["m"] / (g["sz_a"] + g["sz_b"] - g["m"])
        return g.loc[s >= threshold, ["id_a", "id_b"]]

    return grouped_apply(
        co, ["id_a", "id_b"], _jaccard, num_partitions=num_partitions, map_side=_partial
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class _SimHasher:
    """Batch-vectorized 64-bit SimHash (mirrors the ``_BandEmitter``
    rewrite): words are flattened across the batch, each UNIQUE word is
    md5-hashed once (hashlib only over the distinct set — the oracle
    pins md5 exactly), bit expansion is one ``np.unpackbits`` and the
    per-document ±1 accumulation is one ``np.add.reduceat`` segment sum.
    The per-row/per-word reference implementation stays as
    :meth:`simhash64` (tests assert batch == reference)."""

    def __init__(self, text_col: str, id_col: str):
        self.text_col, self.id_col = text_col, id_col

    @staticmethod
    def simhash64(text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for w in _WORD.findall(text or ""):
            h = int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[:8], "little")
            bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8)).astype(np.int64)
            acc += 2 * bits - 1
        out = 0
        for i, v in enumerate(acc):
            if v > 0:
                out |= 1 << i
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column(self.text_col).to_pylist()
        flat: List[str] = []
        counts = np.zeros(len(texts), dtype=np.int64)
        for r, text in enumerate(texts):
            ws = _WORD.findall(text or "")
            flat.extend(ws)
            counts[r] = len(ws)
        sims = np.zeros(len(texts), dtype=np.int64)  # wordless rows → 0
        if flat:
            # md5 once per DISTINCT word; factorize is a C hash pass.
            codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
            uh = np.empty(len(uniques), dtype=np.uint64)
            for i, w in enumerate(uniques.tolist()):
                uh[i] = np.frombuffer(hashlib.md5(w.encode("utf-8")).digest()[:8], dtype="<u8")[0]
            h = uh[codes]
            # Little-endian byte view + big-bitorder unpack == the
            # reference's to_bytes('little')/unpackbits layout exactly.
            bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1).astype(np.int64)
            pm = 2 * bits - 1
            kept = np.flatnonzero(counts)
            offsets = np.concatenate([[0], np.cumsum(counts[kept])[:-1]]).astype(np.int64)
            sums = np.add.reduceat(pm, offsets, axis=0)  # (kept, 64)
            powers = np.uint64(1) << np.arange(64, dtype=np.uint64)
            vals = ((sums > 0).astype(np.uint64) * powers[None, :]).sum(axis=1)
            sims[kept] = vals.view(np.int64)
        return pa.table(
            {
                self.id_col: t.column(self.id_col),
                "simhash": pa.array(sims),
            }
        )


def simhash_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    max_bucket: int = 200,
    n_bands: int = 8,
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Near-dup pairs by SimHash: banded buckets → Hamming verify.

    Pigeonhole guarantee: a pair at Hamming distance d is ALWAYS a
    candidate when d < n_bands (d flips cannot touch every band);
    beyond that, recall is probabilistic. Default 8 bands of 8 bits →
    guaranteed recall for d ≤ 7, verified cutoff ``max_hamming``.
    """
    assert 64 % n_bands == 0, "n_bands must divide 64"
    band_bits = 64 // n_bands
    band_mask = (1 << band_bits) - 1
    sh = ds.map_batches(
        _SimHasher, fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow", concurrency=(1, 8),
    )

    def _bands(t: pa.Table) -> pa.Table:
        # Band-major explode, fully vectorized: (n_bands, n) bucket
        # matrix from one shift+mask, ids/simhash tiled — no Python loop.
        h = t.column("simhash").combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        uh = h.view(np.uint64)
        shifts = (np.arange(n_bands, dtype=np.uint64) * np.uint64(band_bits))[:, None]
        buckets = ((uh[None, :] >> shifts) & np.uint64(band_mask)).astype(np.int32)
        n = len(h)
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(n_bands, dtype=np.int32), n)),
                "bucket": pa.array(buckets.reshape(-1)),
                id_col: pa.array(np.tile(t.column(id_col).combine_chunks().to_numpy(zero_copy_only=False), n_bands)),
                "simhash": pa.array(np.tile(h, n_bands)),
            }
        )

    banded = sh.map_batches(_bands, batch_format="pyarrow")

    from kgray.kernels.hashagg import auto_partitions, grouped_apply

    if num_partitions is None:
        num_partitions = auto_partitions()

    def _pairs_partition(part: pd.DataFrame) -> pd.DataFrame:
        multi = part[part.duplicated(["band", "bucket"], keep=False)]
        a_o, b_o, h_o = [], [], []
        for _, g in multi.groupby(["band", "bucket"], sort=False):
            rows = sorted(set(zip(g[id_col], g["simhash"])))
            if len(rows) < 2 or len(rows) > max_bucket:
                continue
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    ham = bin((rows[i][1] ^ rows[j][1]) & ((1 << 64) - 1)).count("1")
                    if ham <= max_hamming:
                        a_o.append(rows[i][0])
                        b_o.append(rows[j][0])
                        h_o.append(ham)
        return pd.DataFrame(
            {
                "id_a": pd.Series(a_o, dtype="int64"),
                "id_b": pd.Series(b_o, dtype="int64"),
                "hamming": pd.Series(h_o, dtype="int32"),
            }
        )

    pairs = grouped_apply(banded, ["band", "bucket"], _pairs_partition, num_partitions=num_partitions)

    def _min_ham(part: pd.DataFrame) -> pd.DataFrame:
        return part.sort_values(["id_a", "id_b", "hamming"], kind="mergesort").drop_duplicates(
            ["id_a", "id_b"]
        )

    return grouped_apply(
        pairs, ["id_a", "id_b"], _min_ham,
        num_partitions=max(2, num_partitions // 2), map_side=_min_ham,
    )


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup(
    ds: Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.99,
    broadcast_limit: int = 200_000,
    **lsh_kw,
) -> Dataset:
    """Pairs (id_a < id_b) with cosine ≥ threshold.

    Size-based switch: corpora up to ``broadcast_limit`` rows use the
    brute-force broadcast-matrix scan below (exact; the test
    baseline); larger corpora automatically route to the LSH-bucketed
    path (``similarity.lsh_bucketed_near_dup``) where nothing is
    broadcast or driver-materialized and each vector shuffles
    ``n_tables`` times instead of the matrix shipping to every batch.
    """
    n = ds.count()
    if n > broadcast_limit:
        from kgray.stages.similarity import lsh_bucketed_near_dup

        return lsh_bucketed_near_dup(
            ds, threshold=threshold, vec_col=vec_col, id_col=id_col, **lsh_kw
        )
    ids_all: List = []
    vecs: List = []
    for b in ds.select_columns([id_col, vec_col]).iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        ids_all.extend(b.column(id_col).to_pylist())
        vecs.extend(b.column(vec_col).to_pylist())
    mat = np.asarray(vecs, dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    order = np.argsort(np.asarray(ids_all))
    mat = mat[order]
    ids_sorted = [ids_all[i] for i in order]
    ref = ray.put((ids_sorted, mat))

    def _scan(t: pa.Table) -> pa.Table:
        ids_s, m = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        q = np.asarray(t.column(vec_col).to_pylist(), dtype=np.float64)
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        sims = q @ m.T
        qa, qb = [], []
        batch_ids = t.column(id_col).to_pylist()
        pos = {v: i for i, v in enumerate(ids_s)}
        for r, qid in enumerate(batch_ids):
            hits = np.nonzero(sims[r] >= threshold)[0]
            for c in hits:
                other = ids_s[c]
                if qid < other:
                    qa.append(qid)
                    qb.append(other)
        return pa.table({"id_a": pa.array(qa), "id_b": pa.array(qb)})

    return ds.map_batches(_scan, batch_format="pyarrow", batch_size=1024)


def cross_minhash_flag(
    corpus: Dataset,
    reference: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    flag_col: str = "is_dup",
    hit_broadcast_limit: int = 1_000_000,
    **kw,
) -> Dataset:
    """Cross-corpus near-dup flagging: mark every ``corpus`` document
    whose true shingle Jaccard with ANY ``reference`` document reaches
    ``threshold`` (deduplicating a fresh crawl against an existing
    training set — the near-dup analog of ``decontaminate``'s exact
    n-gram overlap).

    Implementation: side-tag the ids (``c|``/``r|`` string prefixes),
    union, run the standard banded MinHash + exact-verify pipeline once
    over the union, and keep only CROSS-side verified pairs. Reusing
    :func:`minhash_lsh_pairs` whole means within-side candidate pairs
    are also generated and verified — wasted verify work bounded by the
    corpora's own near-dup rates; a dedicated cross-side bucket filter
    inside pair generation is the optimization if a profile ever shows
    it binding. The verified cross-pair list is USUALLY small, and the
    corpus is then flagged map-only against the broadcast hit set; when
    the cross-hit row count exceeds ``hit_broadcast_limit`` (a heavily
    contaminated crawl at 100 TB) the flag size-switches to a
    distributed LEFT join — distinct hit ids ride one hash exchange
    with the corpus's id column, nothing driver-side (same pattern as
    :func:`minhash_lsh_dedup`'s anti-join path, pinned equal by the
    forced-switch pytest).

    Output: every corpus row as ``(id_col, flag_col)``.
    """

    def _tag(prefix: str):
        def _f(t: pa.Table) -> pa.Table:
            tagged = pc.binary_join_element_wise(
                pa.scalar(prefix), pc.cast(t.column(id_col), pa.string()), "|")
            return pa.table({id_col: tagged, text_col: t.column(text_col)})
        return _f

    # Materialized: minhash_lsh_pairs consumes its input twice (band
    # pass + verify semi-filter) — pin the tagged union once instead of
    # re-executing both sides' upstreams per consumer (the same
    # CONSUMPTION CONTRACT as minhash_lsh_dedup).
    union = corpus.select_columns([id_col, text_col]).map_batches(
        _tag("c"), batch_format="pyarrow"
    ).union(reference.select_columns([id_col, text_col]).map_batches(
        _tag("r"), batch_format="pyarrow")).materialize()

    pairs = minhash_lsh_pairs(union, text_col=text_col, id_col=id_col,
                              threshold=threshold, **kw)

    # 'c|' < 'r|' lexicographically, so a cross pair is exactly
    # (id_a startswith c|, id_b startswith r|). Strip the tag back off.
    def _cross_hits(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column("id_a"), pa.string())
        b = pc.cast(t.column("id_b"), pa.string())
        mask = pc.and_(pc.starts_with(a, "c|"), pc.starts_with(b, "r|"))
        return pa.table({"__sid": pc.utf8_slice_codeunits(
            a.filter(mask), 2, 2_147_483_647)})

    hits = pairs.map_batches(_cross_hits, batch_format="pyarrow").materialize()

    if hits.count() <= hit_broadcast_limit:
        hit_ids = {r["__sid"] for r in hits.take_all()}
        href = ray.put(pa.array(sorted(hit_ids), type=pa.string()))

        def _flag(t: pa.Table) -> pa.Table:
            h = ray.get(href) if isinstance(href, ray.ObjectRef) else href
            mask = pc.is_in(pc.cast(t.column(id_col), pa.string()), value_set=h)
            return pa.table({id_col: t.column(id_col), flag_col: mask})

        return corpus.select_columns([id_col]).map_batches(
            _flag, batch_format="pyarrow")

    # Distributed path: hit set too large for a driver fold / broadcast.
    # Distinct the hits (a doc near-dup to many reference docs emits
    # many rows), then LEFT-join the corpus's stringified id against
    # them — one hash exchange of ids only, flag = matched.
    from kgray.kernels.hashagg import grouped_apply
    from kgray.stages.relational import hash_join

    def _distinct(df):
        return df.drop_duplicates(subset=["__sid"])

    hits_d = grouped_apply(hits, ["__sid"], _distinct, map_side=_distinct)
    hits_d = hits_d.map_batches(
        lambda t: pa.table({"__sid": t.column("__sid"),
                            "__hit": pa.array(np.ones(len(t), np.int8))}),
        batch_format="pyarrow")

    ids = corpus.select_columns([id_col]).map_batches(
        lambda t: pa.table({id_col: t.column(id_col),
                            "__sid": pc.cast(t.column(id_col), pa.string())}),
        batch_format="pyarrow")
    joined = hash_join(ids, hits_d, on="__sid", how="left")

    def _finish(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t.column(id_col),
                         flag_col: pc.is_valid(t.column("__hit"))})

    return joined.map_batches(_finish, batch_format="pyarrow")
