"""Text-analysis operators for training-data curation.

All vectorized: pyarrow.compute regex kernels per batch, no per-row
Python in the hot paths (langid keeps a tiny per-row loop over
precomputed token sets — stopword tables compiled once per actor).
Definitions are pinned so a SQL oracle can reproduce them exactly:

* token_count    = number of ``\\S+`` runs
* punct_ratio    = count of ``[.,;:!?]`` / n_chars (0 for empty)
* digit_ratio    = count of ``[0-9]`` / n_chars
* quality_score  = round(1/(1+exp(-(tokens/100))) - punct_ratio, 6)
  (a toy logistic length prior minus punctuation noise — deterministic
  and SQL-expressible; swap for a model scorer via the same stage shape)
* fingerprint    = md5 of lowercased, whitespace-collapsed, stripped text
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from kgray.kernels.hashagg import stable_round

_PUNCT_RE = r"[.,;:!?]"
_DIGIT_RE = r"[0-9]"
_TOKEN_RE = r"\S+"
_WS_COLLAPSE = re.compile(r"\s+")


def token_count_batch(t: pa.Table, text_col: str = "text", out_col: str = "n_tokens") -> pa.Table:
    n = pc.count_substring_regex(t.column(text_col), _TOKEN_RE)
    return t.append_column(out_col, n.cast(pa.int64()))


# GPT-2-style pre-tokenizer, restricted to RE2 (no lookahead) so the
# Arrow kernel and a SQL oracle count identically: contractions, then
# optionally-space-prefixed letter runs / digit runs / other-symbol
# runs, then residual whitespace.
_BPE_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count_batch(
    t: pa.Table, text_col: str = "text", out_col: str = "n_bpe_tokens"
) -> pa.Table:
    """BPE-ish token count: the number of pre-tokenizer segments — the
    standard fast proxy for LLM token budgeting when the merge table
    itself isn't needed. One vectorized RE2 count per batch."""
    n = pc.count_substring_regex(t.column(text_col), _BPE_RE)
    return t.append_column(out_col, n.cast(pa.int64()))


def normalize_batch(
    t: pa.Table, text_col: str = "text", out_col: str = "text_norm"
) -> pa.Table:
    """Canonical pre-dedup text normalization (CCNet-style fold):
    lowercase → accents/diacritics stripped (NFD, combining marks
    dropped) → whitespace runs collapsed to one space → edge spaces
    trimmed. Five vectorized Arrow kernels per batch (utf8proc + RE2),
    byte-identical to DuckDB's ``strip_accents(lower(...))`` chain.
    Accent-strip rather than NFC because Arrow's ``utf8_normalize``
    (pyarrow 16) does not recompose — NFC of a decomposed sequence
    comes back decomposed — while decomposition + ``\\p{Mn}`` removal
    is exact on both engines (verified incl. ligatures, Greek tonos,
    ø/đ non-decomposables, and pre-decomposed NFD input)."""
    s = pc.utf8_lower(t.column(text_col))
    s = pc.utf8_normalize(s, form="NFD")
    s = pc.replace_substring_regex(s, r"\p{Mn}+", "")
    s = pc.replace_substring_regex(s, r"\s+", " ")
    s = pc.utf8_trim(s, " ")
    return t.append_column(out_col, s)


def quality_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    text = t.column(text_col)
    n_chars = pc.utf8_length(text).cast(pa.float64())
    safe = pc.max_element_wise(n_chars, pa.scalar(1.0))
    tokens = pc.count_substring_regex(text, _TOKEN_RE).cast(pa.float64())
    punct = pc.count_substring_regex(text, _PUNCT_RE).cast(pa.float64())
    digit = pc.count_substring_regex(text, _DIGIT_RE).cast(pa.float64())
    punct_ratio = pc.divide(punct, safe)
    digit_ratio = pc.divide(digit, safe)
    q = pc.subtract(
        pc.divide(pa.scalar(1.0), pc.add(pa.scalar(1.0), pc.exp(pc.negate(pc.divide(tokens, pa.scalar(100.0)))))),
        punct_ratio,
    )
    t = t.append_column("n_tokens", tokens.cast(pa.int64()))
    t = t.append_column("punct_ratio", stable_round(punct_ratio, 6))
    t = t.append_column("digit_ratio", stable_round(digit_ratio, 6))
    return t.append_column("quality_score", stable_round(q, 6))


# PII redaction patterns, applied IN ORDER (earlier replacements hide
# their text from later patterns — the SQL oracle nests identically).
# RE2-only syntax so pyarrow's kernel and DuckDB's regexp_replace agree
# byte-for-byte. Counts are taken on the text as seen by that pattern
# (i.e. after the previous redactions).
PII_PATTERNS: List = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\+\d{7,15}|\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
]


def pii_scrub_batch(t: pa.Table, text_col: str = "text", out_col: str = "text_clean") -> pa.Table:
    """PII scrub for LLM corpus prep: redact emails / IPv4s / SSNs /
    phone numbers with typed placeholders and count each kind. Pure
    pyarrow RE2 kernels — two C passes per pattern per batch, zero
    per-row Python."""
    text = pc.fill_null(t.column(text_col), "")
    counts = {}
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}"] = pc.count_substring_regex(text, pat).cast(pa.int64())
        text = pc.replace_substring_regex(text, pat, repl)
    t = t.append_column(out_col, text)
    for k, v in counts.items():
        t = t.append_column(k, v)
    return t


def repetition_stats_batch(
    t: pa.Table, text_col: str = "text", id_col: str = "doc_id", max_frac: float = 0.2
) -> pa.Table:
    """Gopher-style repetition quality metrics per document:

    * ``top_word_frac``  — count of the most frequent word / total words
    * ``dup_2gram_frac`` — 1 − distinct word-bigrams / total bigrams
    * ``keep``           — 1 iff both metrics ≤ ``max_frac``

    Fully vectorized: one whitespace-collapse + split (Arrow C kernels),
    one ``dictionary_encode`` for word ids, then numpy
    ``unique``/``reduceat``/``bincount`` segment math — no per-row
    Python. Zero-word documents score 0.0 / 0.0 (kept)."""
    n = len(t)
    text = pc.fill_null(t.column(text_col), "")
    clean = pc.utf8_trim_whitespace(pc.replace_substring_regex(text, r"\s+", " "))
    la = pc.split_pattern(clean, " ").combine_chunks()
    offsets = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offsets)
    # '' splits to [''] — treat as zero words.
    nonempty = pc.not_equal(clean, "").to_numpy(zero_copy_only=False)
    enc = pc.dictionary_encode(la.values)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    V = max(1, len(enc.dictionary))
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    wmask = nonempty[doc_idx]
    codes, doc_idx = codes[wmask], doc_idx[wmask]

    twf = np.zeros(n, dtype=np.float64)
    dgf = np.zeros(n, dtype=np.float64)
    if len(codes):
        key = doc_idx * V + codes
        uk, cnt = np.unique(key, return_counts=True)
        udoc = (uk // V).astype(np.int64)
        starts = np.flatnonzero(np.r_[True, udoc[1:] != udoc[:-1]])
        twf[udoc[starts]] = np.maximum.reduceat(cnt, starts) / np.add.reduceat(cnt, starts)

        same = doc_idx[:-1] == doc_idx[1:]
        if same.any():
            bdoc = doc_idx[:-1][same]
            b1, b2 = codes[:-1][same], codes[1:][same]
            if n * V * V < (1 << 62):
                key2 = np.unique((bdoc * V + b1) * V + b2)
                kdoc = (key2 // (V * V)).astype(np.int64)
            else:  # huge batch vocabulary: 2-D unique, no key overflow
                tri = np.unique(np.stack([bdoc, b1, b2], axis=1), axis=0)
                kdoc = tri[:, 0]
            total = np.bincount(bdoc, minlength=n).astype(np.float64)
            dist = np.bincount(kdoc, minlength=n).astype(np.float64)
            has = total > 0
            dgf[has] = 1.0 - dist[has] / total[has]

    twf_r = stable_round(pa.array(twf, type=pa.float64()), 6)
    dgf_r = stable_round(pa.array(dgf, type=pa.float64()), 6)
    keep = pc.and_(
        pc.less_equal(twf_r, pa.scalar(max_frac)), pc.less_equal(dgf_r, pa.scalar(max_frac))
    ).cast(pa.int64())
    t = t.append_column("top_word_frac", twf_r)
    t = t.append_column("dup_2gram_frac", dgf_r)
    return t.append_column("keep", keep)


def fingerprint_batch(t: pa.Table, text_col: str = "text", out_col: str = "fingerprint") -> pa.Table:
    # md5 + Python-regex normalization pinned by the oracle — but both
    # run once per DISTINCT text (duplicate documents are the whole
    # reason to fingerprint) and map back through a factorize gather.
    import numpy as np
    import pandas as pd

    texts = t.column(text_col).to_pylist()
    codes, uniques = pd.factorize(np.asarray(texts, dtype=object))
    ufps = np.asarray(
        [
            hashlib.md5(_WS_COLLAPSE.sub(" ", (x or "").lower()).strip().encode("utf-8")).hexdigest()
            for x in uniques.tolist()
        ],
        dtype=object,
    )
    # factorize maps None → code -1; hash the empty-normal form for it.
    if (codes < 0).any():
        none_fp = hashlib.md5(b"").hexdigest()
        fps = np.where(codes < 0, none_fp, ufps[np.clip(codes, 0, None)])
    else:
        fps = ufps[codes]
    return t.append_column(out_col, pa.array(fps.tolist(), type=pa.string()))


class RollingFingerprint:
    """Winnowing-style document fingerprint: k-gram rolling hashes,
    keep the min hash per window → sorted distinct joined hex.

    Actor-pool stage (precomputed powers in __init__)."""

    def __init__(self, k: int = 8, window: int = 16, text_col: str = "text", out_col: str = "winnow"):
        self.k, self.window = k, window
        self.text_col, self.out_col = text_col, out_col
        self.base = 257
        self.mod = (1 << 61) - 1
        self.pow_k = pow(self.base, k - 1, self.mod)

    def _hashes(self, s: str) -> List[int]:
        if len(s) < self.k:
            return []
        h = 0
        out = []
        for i, ch in enumerate(s):
            h = (h * self.base + ord(ch)) % self.mod
            if i >= self.k - 1:
                out.append(h)
                h = (h - ord(s[i - self.k + 1]) * self.pow_k) % self.mod
        return out

    def fingerprint(self, s: str) -> str:
        hs = self._hashes(s)
        if not hs:
            return ""
        picks = set()
        arr = np.asarray(hs, dtype=np.uint64)
        for i in range(0, max(1, len(arr) - self.window + 1)):
            picks.add(int(arr[i : i + self.window].min()))
        return "|".join(f"{p:x}" for p in sorted(picks)[:32])

    def __call__(self, t: pa.Table) -> pa.Table:
        fps = [self.fingerprint(x or "") for x in t.column(self.text_col).to_pylist()]
        return t.append_column(self.out_col, pa.array(fps, type=pa.string()))


_STOPWORDS: Dict[str, frozenset] = {
    "en": frozenset("the and of to is in that for with are was".split()),
    "de": frozenset("der die das und ist von mit für auf nicht".split()),
    "fr": frozenset("le la les et est des que pour dans une".split()),
    "es": frozenset("el la los y es de que para con una".split()),
}


class LangId:
    """n-gram/stopword language-ID heuristic (actor pool: tables compiled once)."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col, self.out_col = text_col, out_col
        self.word = re.compile(r"[a-zA-ZäöüßéèêàçñÁ-ÿ]+")
        self.tables = {k: v for k, v in _STOPWORDS.items()}

    def __call__(self, t: pa.Table) -> pa.Table:
        preds = []
        for text in t.column(self.text_col).to_pylist():
            words = [w.lower() for w in self.word.findall(text or "")]
            best, best_hits = "und", 0
            for lang, stop in sorted(self.tables.items()):
                hits = sum(1 for w in words if w in stop)
                if hits > best_hits:
                    best, best_hits = lang, hits
            preds.append(best)
        return t.append_column(self.out_col, pa.array(preds, type=pa.string()))


# Gopher-style rule thresholds (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", table A1 — adapted: bounds re-centered for the
# synthetic corpus, rule SET kept). Every rule is an RE2 regex count —
# pyarrow and DuckDB both run RE2, so the SQL oracle matches exactly.
GOPHER_RULES: Dict[str, float] = {
    "min_words": 30,
    "max_words": 90,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_ratio": 0.1,       # '#' or '...' per word
    "max_bullet_ratio": 0.9,       # lines starting with -, *, •
    "max_ellipsis_ratio": 0.3,     # lines ending with ... or …
    "min_alpha_word_ratio": 0.8,   # words containing ≥1 [A-Za-z]
    "min_stopword_hits": 2,        # the|be|to|of|and|that|have|with
}

_GOPHER_STOPWORD_RE = r"(?i)\b(the|be|to|of|and|that|have|with)\b"


def gopher_quality_batch(
    t: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Gopher-style document quality rules, one Arrow regex-count kernel
    per rule (no Python per row). Emits int64 0/1 per rule plus ``keep``
    = AND of all — downstream filters on ``keep`` but the per-rule flags
    are what curation dashboards aggregate."""
    text = t.column(text_col)
    f64 = pa.float64()
    words = pc.count_substring_regex(text, _TOKEN_RE).cast(f64)
    words_safe = pc.max_element_wise(words, pa.scalar(1.0))
    nonws = pc.count_substring_regex(text, r"\S").cast(f64)
    mean_wl = pc.divide(nonws, words_safe)
    symbols = pc.count_substring_regex(text, r"#|\.\.\.").cast(f64)
    nlines = pc.add(pc.count_substring_regex(text, r"\n").cast(f64), pa.scalar(1.0))
    bullets = pc.count_substring_regex(text, r"(?m)^\s*[-*•]").cast(f64)
    ellipsis = pc.count_substring_regex(text, r"(?m)(\.\.\.|…)$").cast(f64)
    alpha_words = pc.count_substring_regex(text, r"\S*[A-Za-z]\S*").cast(f64)
    stops = pc.count_substring_regex(text, _GOPHER_STOPWORD_RE).cast(f64)

    R = GOPHER_RULES
    rules = {
        "r_word_count": pc.and_(
            pc.greater_equal(words, pa.scalar(float(R["min_words"]))),
            pc.less_equal(words, pa.scalar(float(R["max_words"]))),
        ),
        "r_mean_word_len": pc.and_(
            pc.greater_equal(mean_wl, pa.scalar(R["min_mean_word_len"])),
            pc.less_equal(mean_wl, pa.scalar(R["max_mean_word_len"])),
        ),
        "r_symbol_ratio": pc.less_equal(
            pc.divide(symbols, words_safe), pa.scalar(R["max_symbol_ratio"])),
        "r_bullet_ratio": pc.less_equal(
            pc.divide(bullets, nlines), pa.scalar(R["max_bullet_ratio"])),
        "r_ellipsis_ratio": pc.less_equal(
            pc.divide(ellipsis, nlines), pa.scalar(R["max_ellipsis_ratio"])),
        "r_alpha_words": pc.greater_equal(
            pc.divide(alpha_words, words_safe), pa.scalar(R["min_alpha_word_ratio"])),
        "r_stopwords": pc.greater_equal(
            stops, pa.scalar(float(R["min_stopword_hits"]))),
    }
    out = pa.table({id_col: t.column(id_col)})
    keep = None
    for name, cond in rules.items():
        out = out.append_column(name, cond.cast(pa.int64()))
        keep = cond if keep is None else pc.and_(keep, cond)
    return out.append_column("keep", keep.cast(pa.int64()))


def gopher_filter(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """One streaming map pass; column-pruned by the caller's read."""
    return ds.map_batches(
        lambda t: gopher_quality_batch(t, text_col, id_col), batch_format="pyarrow"
    )
