"""Entity linking: mention string → canonical-KB CURIE.

North-rule stage 3: candidate generation via alias hash tables +
character n-gram MinHash blocking, then scoring. The "cross-encoder"
scorer is a deterministic stand-in (true n-gram Jaccard between mention
and candidate alias) with the same plumbing a learned scorer would
have: all heavy state — alias hash map, MinHash band index, per-alias
gram sets — is built ONCE per actor in ``__init__`` from a
``ray.put``-broadcast alias table (read once per actor, never
re-shipped per batch), and ``__call__`` resolves batches with a
per-actor memo cache (resolution is a pure function of the mention, so
caching is safe under retries).

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


class EntityLinker:
    """Actor-pool map_batches stage: mention triples → linked CURIE triples.

    ``alias_ref``: ``ray.ObjectRef`` of the alias table (pa.Table with
    columns alias/curie) put in the object store once by the driver.
    """

    def __init__(self, alias_ref, fuzzy_threshold: float = 0.4):
        table = ray.get(alias_ref) if isinstance(alias_ref, ray.ObjectRef) else alias_ref
        aliases = table.column("alias").to_pylist()
        curies = table.column("curie").to_pylist()
        self._exact: Dict[str, str] = {}
        for a, c in zip(aliases, curies):
            # Deterministic on duplicate aliases: keep the min CURIE.
            if a not in self._exact or c < self._exact[a]:
                self._exact[a] = c
        # Digit-token blocking: the scorer REQUIRES digit runs to agree
        # exactly (entity identity), so for mentions that carry digits
        # the candidate set is exactly the aliases with the same digit
        # tuple — a dict hit, usually a handful of aliases. The MinHash
        # index covers only digit-less aliases (general surface forms);
        # at web-scale KBs this keeps fuzzy resolution O(1) per mention
        # instead of O(bucket) where popular-name buckets hold 10^3+.
        self._digits_index: Dict[Tuple[str, ...], List[str]] = {}
        self._index = MinHashIndex()
        for a in self._exact:
            d = tuple(_DIGIT_RUNS.findall(a))
            if d:
                self._digits_index.setdefault(d, []).append(a)
            else:
                self._index.add(a)
        self._threshold = fuzzy_threshold
        self._memo: Dict[str, Optional[str]] = {}

    def _candidates(self, mention: str) -> List[str]:
        d = tuple(_DIGIT_RUNS.findall(mention))
        if d:
            return self._digits_index.get(d, [])
        return self._index.candidates(mention)

    @staticmethod
    def _jaccard2(a: str, b: str) -> float:
        ga, gb = _grams(a, 2), _grams(b, 2)
        inter = len(ga & gb)
        if not inter:
            return 0.0
        return inter / (len(ga) + len(gb) - inter)

    def resolve(self, mention: str) -> Optional[str]:
        if mention in self._memo:
            return self._memo[mention]
        out = self._exact.get(mention)
        if out is None:
            best: Tuple[float, str, str] = (0.0, "", "")
            for cand in self._candidates(mention):
                j = self._jaccard2(mention, cand)
                if j < self._threshold:
                    continue
                curie = self._exact[cand]
                # Higher jaccard wins; ties break on lexicographic min CURIE.
                if j > best[0] or (j == best[0] and best[1] and curie < best[2]):
                    best = (j, cand, curie)
            out = best[2] or None
        self._memo[mention] = out
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        subs = batch.column("subject_mention").to_pylist()
        objs = batch.column("object_mention").to_pylist()
        distinct = set(subs) | set(objs)
        res = {m: self.resolve(m) for m in distinct}
        s_lnk = [res[m] for m in subs]
        o_lnk = [res[m] for m in objs]
        keep = [i for i, (s, o) in enumerate(zip(s_lnk, o_lnk)) if s is not None and o is not None]
        idx = pa.array(keep, type=pa.int64())
        out = batch.take(idx)
        out = out.drop_columns(["subject_mention", "object_mention"])
        out = out.append_column("subject", pa.array([s_lnk[i] for i in keep], type=pa.string()))
        out = out.append_column("object", pa.array([o_lnk[i] for i in keep], type=pa.string()))
        return out.select(["subject", "predicate", "object", "url", "warc_ts", "lang"])
