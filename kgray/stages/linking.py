"""Entity linking: mention string → canonical-KB CURIE.

North-rule stage 3: candidate generation via alias lookup tables +
character n-gram MinHash blocking, then scoring. The "cross-encoder"
scorer is a deterministic stand-in (true n-gram Jaccard between mention
and candidate alias) with the same plumbing a learned scorer would have.

Scale design (this is the hot stage of the construction pipeline):

* The heavy state — the exact alias→CURIE map and the digit-tuple
  candidate index — is built ONCE on the driver by
  :func:`build_linker_state` as SORTED FIXED-WIDTH numpy byte arrays
  and ``ray.put`` once. Every linker actor maps them zero-copy from
  the object store: one physical copy per NODE, not one ~GB heap copy
  per actor. (28 private dict copies of a 1.6M-alias KB measurably
  halved per-actor throughput via cache/bandwidth contention — see
  BASELINE.md round-2 notes.)
* Exact resolution is a vectorized ``np.searchsorted`` probe over the
  shared sorted alias array — C-speed for the whole distinct-mention
  set of a batch, no per-row Python and no per-actor hash table.
* Fuzzy resolution (the rare path) stays per-mention Python over a
  handful of candidates: digit-bearing mentions probe the shared
  digit-key array (binary search slice); digit-less mentions go
  through a per-actor MinHash band index built over only the
  digit-less aliases (small by construction in web KBs where surface
  forms carry identifiers). Results are memoized per actor.

Unlinkable mentions (below ``fuzzy_threshold`` against every candidate)
are DROPPED — precision over recall, per the north rule's P/R target.
"""

from __future__ import annotations

import zlib
from typing import Dict, FrozenSet, List, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray

_MERSENNE = (1 << 61) - 1

_DIGIT_RUNS = __import__("re").compile(r"\d+")


def _grams(s: str, n: int = 3) -> FrozenSet[str]:
    if len(s) < n:
        return frozenset([s])
    return frozenset(s[i : i + n] for i in range(len(s) - n + 1))


class MinHashIndex:
    """Banded MinHash (LSH) index over short strings. Deterministic.

    num_perm=64 / band_rows=2 → 32 bands: for Jaccard ≥ 0.5 the
    candidate-recall of banding is ≈ 1 - (1 - 0.5²)³² ≈ 0.9999, so
    misspelled aliases reliably reach verification; false bucket hits
    are filtered by the exact-Jaccard scorer.
    """

    # 31-bit Mersenne prime: a, b < 2^31 and crc32 hashes < 2^32, so
    # a*h + b < 2^63 fits uint64 exactly — the whole signature is one
    # vectorized uint64 matmul-shaped op, no Python bigints.
    _P31 = np.uint64((1 << 31) - 1)

    def __init__(self, num_perm: int = 64, band_rows: int = 2, seed: int = 17):
        self.num_perm = num_perm
        self.band_rows = band_rows
        self.num_bands = num_perm // band_rows
        rng = np.random.RandomState(seed)
        self._a = rng.randint(1, int(self._P31), size=num_perm, dtype=np.int64).astype(np.uint64)
        self._b = rng.randint(0, int(self._P31), size=num_perm, dtype=np.int64).astype(np.uint64)
        self._buckets: Dict[Tuple[int, Tuple[int, ...]], List[str]] = {}
        # Verification uses 2-gram Jaccard: tolerant to single
        # transpositions/substitutions (a swapped letter pair disturbs
        # three 3-grams but only two 2-grams) yet still ranks the true
        # alias above near-misses like an extra trailing digit.
        self._gram2_sets: Dict[str, FrozenSet[str]] = {}

    def signature(self, grams: FrozenSet[str]) -> np.ndarray:
        hashes = np.array([zlib.crc32(g.encode("utf-8")) for g in grams], dtype=np.uint64)
        hashes %= self._P31
        # (a*h + b) mod p, elementwise min over grams per permutation.
        mat = (self._a[:, None] * hashes[None, :] + self._b[:, None]) % self._P31
        return mat.min(axis=1)

    def add(self, key: str) -> None:
        g = _grams(key)
        self._gram2_sets[key] = _grams(key, 2)
        sig = self.signature(g)
        for band in range(self.num_bands):
            rows = tuple(sig[band * self.band_rows : (band + 1) * self.band_rows])
            self._buckets.setdefault((band, rows), []).append(key)

    def candidates(self, query: str) -> List[str]:
        sig = self.signature(_grams(query))
        out: Dict[str, None] = {}
        for band in range(self.num_bands):
            rows = tuple(sig[band * self.band_rows : (band + 1) * self.band_rows])
            for k in self._buckets.get((band, rows), ()):
                out[k] = None
        return list(out)

    def jaccard(self, query: str, key: str) -> float:
        # Numeric tokens are entity identity, not fuzzy-matchable
        # surface: "Taxon 999999" must NOT link to "Taxon 9". Require
        # digit runs to agree exactly before scoring the letters.
        if _DIGIT_RUNS.findall(query) != _DIGIT_RUNS.findall(key):
            return 0.0
        qg, kg = _grams(query, 2), self._gram2_sets[key]
        inter = len(qg & kg)
        if not inter:
            return 0.0
        return inter / (len(qg) + len(kg) - inter)


def _string_array_to_S(arr: pa.ChunkedArray) -> np.ndarray:
    """Arrow string array → numpy fixed-width ``S`` array, fully
    vectorized from the raw offsets/data buffers (no per-element Python
    objects — ~50× faster than ``np.array(to_pylist())`` at 10⁶ rows).
    Nulls become b''. Width = max value length (min 1)."""
    ca = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if isinstance(ca, pa.ChunkedArray):  # zero chunks → empty
        return np.array([], dtype="S1")
    n = len(ca)
    if n == 0:
        return np.array([], dtype="S1")
    ca = ca.cast(pa.string())
    bufs = ca.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int32, count=n + 1 + ca.offset)[ca.offset :]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.array([], np.uint8)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    w = max(int(lens.max()), 1)
    out = np.zeros((n, w), dtype=np.uint8)
    tot = int(lens.sum())
    if tot:
        # Row-major boolean scatter: mask selects each row's first
        # len(i) cells in order, and `data` holds exactly those bytes
        # concatenated in row order (values buffer sliced to the
        # array's window) — a single C-level assignment pads the lot.
        start = int(offsets[0])
        mask = np.arange(w, dtype=np.int64)[None, :] < lens[:, None]
        out[mask] = data[start : start + tot]
    return out.reshape(-1).view(f"S{w}")


def build_linker_state(alias_table: pa.Table) -> Dict[str, np.ndarray]:
    """Driver-side (once per job): alias KB → the linker's shared lookup
    state as plain numpy arrays, suitable for ``ray.put`` + zero-copy
    ``ray.get`` in every actor.

    Layout (all fixed-width ``S`` byte arrays, UTF-8):
      alias_sorted / alias_curie    exact map, sorted by alias bytes;
                                    duplicate aliases keep the MIN curie
                                    (deterministic, as before)
      dkey_sorted / dkey_alias /    candidate index for digit-bearing
      dkey_curie                    mentions, sorted by the mention's
                                    digit-run tuple key ("12|7" style);
                                    a binary-search slice IS the
                                    candidate list
      nodigit_alias                 digit-less aliases (MinHash band
                                    index is built per actor over these
                                    — small by construction)
    """
    import pyarrow.compute as pc

    t = alias_table.select(["alias", "curie"]).combine_chunks()
    # Duplicate aliases keep the MIN curie (deterministic, as before).
    t = t.sort_by([("alias", "ascending"), ("curie", "ascending")])
    alias_col = t.column("alias").combine_chunks()
    if t.num_rows > 1:
        n = t.num_rows
        eq = pc.equal(alias_col.slice(1), alias_col.slice(0, n - 1))
        if isinstance(eq, pa.ChunkedArray):
            eq = eq.combine_chunks()
        keep = np.ones(n, dtype=bool)
        keep[1:] = ~eq.to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(keep))
        alias_col = t.column("alias").combine_chunks()

    alias_arr = _string_array_to_S(alias_col)
    curie_arr = _string_array_to_S(t.column("curie").combine_chunks())
    # utf-8 bytewise order == codepoint order, so the Arrow sort above
    # already ordered alias_arr; assert-free because S-compare agrees.
    order = np.argsort(alias_arr, kind="stable")
    alias_sorted = alias_arr[order]
    alias_curie = curie_arr[order]

    # Digit-run key per alias, vectorized: every maximal non-digit run →
    # '|', then trim boundary '|' — exactly "|".join(re.findall(r"\d+")).
    dkey_col = pc.utf8_trim(
        pc.replace_substring_regex(alias_col, r"\D+", "|"), characters="|"
    )
    dkey_full = _string_array_to_S(dkey_col)
    has_d = dkey_full != b""
    dkey_arr = dkey_full[has_d]
    d_alias = alias_arr[has_d]
    d_curie = curie_arr[has_d]
    dorder = np.argsort(dkey_arr, kind="stable") if len(dkey_arr) else np.array([], dtype=np.int64)

    return {
        "alias_sorted": alias_sorted,
        "alias_curie": alias_curie,
        "dkey_sorted": dkey_arr[dorder],
        "dkey_alias": d_alias[dorder],
        "dkey_curie": d_curie[dorder],
        "nodigit_alias": alias_arr[~has_d],
    }


class EntityLinker:
    """Actor-pool map_batches stage: mention triples → linked CURIE triples.

    ``state_ref``: ``ray.ObjectRef`` of :func:`build_linker_state` output
    (preferred — zero-copy shared across every actor on a node), or an
    alias ``pa.Table`` / its ObjectRef (compat path: the state is then
    built locally, costing one private copy per actor).
    """

    def __init__(self, state_ref, fuzzy_threshold: float = 0.4):
        obj = ray.get(state_ref) if isinstance(state_ref, ray.ObjectRef) else state_ref
        if isinstance(obj, pa.Table):
            obj = build_linker_state(obj)
        self._alias = obj["alias_sorted"]
        self._curie = obj["alias_curie"]
        self._dkey = obj["dkey_sorted"]
        self._dalias = obj["dkey_alias"]
        self._dcurie = obj["dkey_curie"]
        self._awidth = self._alias.dtype.itemsize
        self._kwidth = self._dkey.dtype.itemsize if len(self._dkey) else 0
        # Per-actor: only the (small) digit-less MinHash index + the
        # fuzzy-miss memo. The big arrays above are plasma-shared.
        self._index = MinHashIndex()
        self._nodigit: Dict[str, str] = {}
        probe = np.searchsorted(self._alias, obj["nodigit_alias"])
        for a, i in zip(obj["nodigit_alias"], probe):
            s = a.decode("utf-8")
            self._nodigit[s] = self._curie[i].decode("utf-8")
            self._index.add(s)
        self._threshold = fuzzy_threshold
        self._memo: Dict[str, Optional[str]] = {}

    # ---- exact path (vectorized) ----------------------------------------
    def _exact_many(self, mentions: List[str]) -> List[Optional[str]]:
        if not len(self._alias) or not mentions:
            return [None] * len(mentions)
        enc = [m.encode("utf-8") for m in mentions]
        ok = np.fromiter((len(e) <= self._awidth for e in enc), dtype=bool, count=len(enc))
        arr = np.array(enc, dtype=f"S{self._awidth}")
        idx = np.searchsorted(self._alias, arr)
        idx_c = np.minimum(idx, len(self._alias) - 1)
        hit = (self._alias[idx_c] == arr) & ok
        out: List[Optional[str]] = [None] * len(mentions)
        where = np.flatnonzero(hit)
        # Vectorized bytes→str for the hit curies (no per-row .decode).
        # np.char.decode, NOT .astype(str): astype decodes as ASCII and
        # raises UnicodeDecodeError on any non-ASCII UTF-8 curie.
        decoded = np.char.decode(self._curie[idx_c[where]], "utf-8")
        for j, s in zip(where.tolist(), decoded.tolist()):
            out[j] = s
        return out

    # ---- fuzzy path (per miss, memoized) --------------------------------
    def _candidates(self, mention: str) -> List[Tuple[str, str]]:
        d = _DIGIT_RUNS.findall(mention)
        if d:
            if not len(self._dkey):
                return []
            key = "|".join(d).encode("utf-8")
            if len(key) > self._kwidth:
                return []
            k = np.array([key], dtype=f"S{self._kwidth}")
            lo = np.searchsorted(self._dkey, k, side="left")[0]
            hi = np.searchsorted(self._dkey, k, side="right")[0]
            return [
                (self._dalias[i].decode("utf-8"), self._dcurie[i].decode("utf-8"))
                for i in range(lo, hi)
            ]
        return [(a, self._nodigit[a]) for a in self._index.candidates(mention)]

    @staticmethod
    def _jaccard2(a: str, b: str) -> float:
        ga, gb = _grams(a, 2), _grams(b, 2)
        inter = len(ga & gb)
        if not inter:
            return 0.0
        return inter / (len(ga) + len(gb) - inter)

    def _fuzzy(self, mention: str) -> Optional[str]:
        if mention in self._memo:
            return self._memo[mention]
        best: Tuple[float, str, str] = (0.0, "", "")
        for cand, curie in self._candidates(mention):
            j = self._jaccard2(mention, cand)
            if j < self._threshold:
                continue
            # Higher jaccard wins; ties break on lexicographic min CURIE.
            if j > best[0] or (j == best[0] and best[1] and curie < best[2]):
                best = (j, cand, curie)
        out = best[2] or None
        self._memo[mention] = out
        return out

    def resolve(self, mention: str) -> Optional[str]:
        out = self._exact_many([mention])[0]
        if out is None:
            out = self._fuzzy(mention)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        subs = batch.column("subject_mention").to_pylist()
        objs = batch.column("object_mention").to_pylist()
        distinct = list(set(subs) | set(objs))
        exact = self._exact_many(distinct)
        res = {
            m: (e if e is not None else self._fuzzy(m)) for m, e in zip(distinct, exact)
        }
        s_lnk = [res[m] for m in subs]
        o_lnk = [res[m] for m in objs]
        keep = [i for i, (s, o) in enumerate(zip(s_lnk, o_lnk)) if s is not None and o is not None]
        idx = pa.array(keep, type=pa.int64())
        out = batch.take(idx)
        out = out.drop_columns(["subject_mention", "object_mention"])
        out = out.append_column("subject", pa.array([s_lnk[i] for i in keep], type=pa.string()))
        out = out.append_column("object", pa.array([o_lnk[i] for i in keep], type=pa.string()))
        return out.select(["subject", "predicate", "object", "url", "warc_ts", "lang"])
