"""Mention detection + relation (triple) extraction.

North-rule stage 2: "SpanBERT-style mention detection and
relation/triple extraction on actor pools with pinned model state".
Real transformer weights are not available in this container, so the
"model" is a deterministic stand-in with the same *plumbing*: a
callable class whose expensive state (compiled patterns — in
production, tokenizer + weights) is built once per actor in
``__init__`` and applied vectorized per batch in ``__call__``. Swap
``MENTION_PATTERN``/sentence scoring for a real model without touching
the pipeline.

The deterministic grammar below is the engine's extraction spec; the
synthetic corpus generator (kgray/sources/pages.py) imports it so the
expected-triple oracle and the extractor agree by construction.
"""

from __future__ import annotations

import re
from typing import Dict, List

import pyarrow as pa

# Predicate phrase → biolink CURIE (the relation vocabulary).
PREDICATE_PHRASES: Dict[str, str] = {
    "produces": "biolink:produces",
    "consumes": "biolink:consumes",
    "interacts with": "biolink:interacts_with",
    "is found in": "biolink:located_in",
    "is a type of": "biolink:subclass_of",
}

# Mention grammar — the deterministic "mention detector". Covers the
# primary alias forms, short forms, and the misspelled variants the
# fuzzy linker must recover (Taxxon/Chemcial).
MENTION_PATTERN = (
    r"(?:Taxon|Taxxon|Chemical|Chemcial|Gene) \d+"
    r"|T-\d+|chem-\d+|g\d+p"
)

_SENT_SPLIT = re.compile(r"(?<=\.)\s+")


class TripleExtractor:
    """Actor-pool map_batches stage: text → mention-level triples.

    Emits one row per extracted (subject_mention, predicate,
    object_mention) with lineage columns (url, warc_ts, lang).
    """

    def __init__(self) -> None:
        phrase_alt = "|".join(re.escape(p) for p in sorted(PREDICATE_PHRASES, key=len, reverse=True))
        self._fact = re.compile(
            rf"(?P<s>{MENTION_PATTERN}) (?P<p>{phrase_alt}) (?P<o>{MENTION_PATTERN})\."
        )
        self._phrases = dict(PREDICATE_PHRASES)

    def extract_from_text(self, text: str) -> List[tuple]:
        out = []
        for sent in _SENT_SPLIT.split(text):
            for m in self._fact.finditer(sent):
                out.append((m.group("s"), self._phrases[m.group("p")], m.group("o")))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        urls = batch.column("url").to_pylist()
        ts = batch.column("warc_ts").to_pylist()
        langs = batch.column("lang").to_pylist() if "lang" in batch.column_names else [None] * len(batch)
        s_out, p_out, o_out, u_out, t_out, l_out = [], [], [], [], [], []
        for text, url, wts, lang in zip(texts, urls, ts, langs):
            if not text:
                continue
            for s, p, o in self.extract_from_text(text):
                s_out.append(s)
                p_out.append(p)
                o_out.append(o)
                u_out.append(url)
                t_out.append(wts)
                l_out.append(lang)
        return pa.table(
            {
                "subject_mention": pa.array(s_out, type=pa.string()),
                "predicate": pa.array(p_out, type=pa.string()),
                "object_mention": pa.array(o_out, type=pa.string()),
                "url": pa.array(u_out, type=pa.string()),
                "warc_ts": pa.array(t_out, type=pa.timestamp("us")),
                "lang": pa.array(l_out, type=pa.string()),
            }
        )
