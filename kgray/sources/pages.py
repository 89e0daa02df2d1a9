"""Deterministic synthetic Common-Crawl-style page corpus + oracles.

Synthesizes the exact ``input_hint`` table shape from BASELINE.json —
``(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)`` — at any scale, seed-fixed, with no external data
(driver rule). Alongside the pages it emits the ground-truth tables
that make the construction pipeline testable end-to-end:

* ``expected_text``    (url, expected_text) — byte-exact extractor goldens.
  The generator assembles each page's HTML *from* its clean text lines,
  such that applying the pinned extractor spec (kgray/stages/extract.py)
  is the identity on those lines. The expected text is computed
  independently from the line list, not by running the extractor.
* ``aliases``          (alias, curie, same_as, provided_by) — the entity
  KB for linking + canonicalization (FIXTURES.md §B2).
* ``expected_triples`` (subject, predicate, object, url) — canonical
  triples per English page, after sameAs resolution (min-CURIE label per
  equivalence class). P/R of the pipeline is measured against the
  distinct set of these.

Corpus design notes (what each knob exercises):
* entity mentions use the primary alias, a short alias, or a misspelled
  variant (Taxxon/Chemcial) — the misspellings are NOT in the KB, so the
  MinHash-blocked fuzzy linker must recover them;
* every 5th entity has an ``ALT:`` CURIE equivalence (short alias links
  to ``ALT:k`` with ``same_as`` → primary), so triples surface two ids
  for one entity and only canonicalization unifies them;
* ~10% of fact sentences reference unknown entities — extracted as
  mentions but unlinkable; the linker must drop them (precision);
* non-English pages carry facts too but the pipeline filters lang=='en',
  so the oracle excludes them (read-side filter coverage).
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta
from typing import Dict, List, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

from kgray.stages.triples import PREDICATE_PHRASES

_PREFIXES = ["TAX", "CHEM", "GENE"]
_PRIMARY = ["Taxon {k}", "Chemical {k}", "Gene {k}"]
_SHORT = ["T-{k}", "chem-{k}", "g{k}p"]
_MISSPELLED = ["Taxxon {k}", "Chemcial {k}", None]  # GENE has no misspelling

_BASE_TS = datetime(2024, 1, 1)


def entity_curie(k: int) -> str:
    return f"{_PREFIXES[k % 3]}:{k}"


def entity_alt_curie(k: int) -> str:
    return f"ALT:{k}"


def has_alt(k: int) -> bool:
    return k % 5 == 0


def canonical_curie(k: int) -> str:
    """Oracle canonical id: lexicographic min over the sameAs component."""
    if has_alt(k):
        return min(entity_curie(k), entity_alt_curie(k))
    return entity_curie(k)


def build_alias_table(num_entities: int) -> pa.Table:
    alias, curie, same_as, provided_by = [], [], [], []
    for k in range(num_entities):
        kind = k % 3
        alias.append(_PRIMARY[kind].format(k=k))
        curie.append(entity_curie(k))
        same_as.append("")
        provided_by.append("kb_primary")
        alias.append(_SHORT[kind].format(k=k))
        if has_alt(k):
            curie.append(entity_alt_curie(k))
            same_as.append(entity_curie(k))
        else:
            curie.append(entity_curie(k))
            same_as.append("")
        provided_by.append("kb_alt")
    return pa.table(
        {
            "alias": pa.array(alias, type=pa.string()),
            "curie": pa.array(curie, type=pa.string()),
            "same_as": pa.array(same_as, type=pa.string()),
            "provided_by": pa.array(provided_by, type=pa.string()),
        }
    )


def _mention_surface(rng: random.Random, k: int) -> Tuple[str, str]:
    """Pick a surface form for entity k → (surface, linked_curie)."""
    kind = k % 3
    r = rng.random()
    if r < 0.60:
        return _PRIMARY[kind].format(k=k), entity_curie(k)
    if r < 0.85 or _MISSPELLED[kind] is None:
        link = entity_alt_curie(k) if has_alt(k) else entity_curie(k)
        return _SHORT[kind].format(k=k), link
    # Misspelled variant: fuzzy linker resolves to the PRIMARY alias.
    return _MISSPELLED[kind].format(k=k), entity_curie(k)


_DISTRACTORS = [
    "The crawl survey of region {x} looks complete.",
    "Archive snapshot {x} was fetched without errors.",
    "This summary covers batch {x} of the corpus.",
]

_PHRASES = sorted(PREDICATE_PHRASES)


def generate_page(i: int, num_entities: int, seed: int = 42) -> Dict:
    """One deterministic page → dict with html/expected text/facts."""
    rng = random.Random(f"{seed}:{i}")
    lang = "en" if rng.random() < 0.85 else rng.choice(["de", "fr", "es"])
    title = f"Findings page {i}"

    n_facts = rng.randint(1, 4)
    sentences: List[str] = []
    oracle: List[Tuple[str, str, str]] = []
    for _ in range(n_facts):
        if rng.random() < 0.10:
            # Unknown entities: extracted but unlinkable → dropped.
            a = num_entities + rng.randint(0, 500)
            b = num_entities + rng.randint(0, 500)
            phrase = rng.choice(_PHRASES)
            sentences.append(f"Taxon {a} {phrase} Taxon {b}.")
            continue
        s_k = rng.randrange(num_entities)
        o_k = rng.randrange(num_entities)
        if o_k == s_k:
            o_k = (o_k + 1) % num_entities
        phrase = rng.choice(_PHRASES)
        s_surface, _s_link = _mention_surface(rng, s_k)
        o_surface, _o_link = _mention_surface(rng, o_k)
        sentences.append(f"{s_surface} {phrase} {o_surface}.")
        if lang == "en":
            oracle.append((canonical_curie(s_k), PREDICATE_PHRASES[phrase], canonical_curie(o_k)))
        if rng.random() < 0.4:
            sentences.append(rng.choice(_DISTRACTORS).format(x=rng.randint(1, 9999)))

    body = " ".join(sentences)
    meta_line = f"Crawl id {i} & section {rng.randint(1, 99)}"
    footer_line = "© 2024 Example Corp"
    lines = [title, "Home | About | Contact", title, body, meta_line, footer_line]
    expected_text = "\n".join(lines)

    return {
        "i": i,
        "url": f"https://host{i % 50:02d}.example/p/{i}",
        "warc_ts": _BASE_TS + timedelta(seconds=i),
        "lang": lang,
        "title": title,
        "body": body,
        "meta_line": meta_line,
        "footer_line": footer_line,
        "expected_text": expected_text,
        "oracle_triples": oracle,
    }


def _render_html(p: Dict) -> bytes:
    meta_html = p["meta_line"].replace("&", "&amp;")
    return (
        f"<!DOCTYPE html><html><head><title>{p['title']}</title>\n"
        f'<script type="text/javascript">var t = {p["i"]} * 3; console.log("noise {p["i"]}");</script>\n'
        "<style>body { margin: 0; } .x { color: #fff; }</style>\n"
        "</head>\n<body>\n"
        "<nav>Home | About | Contact</nav>\n"
        f"<h1>{p['title']}</h1>\n"
        f"<!-- generated page {p['i']} -->\n"
        f"<p>{p['body']}</p>\n"
        f'<div class="meta">{meta_html}</div>\n'
        "<footer>&copy; 2024 Example Corp</footer>\n"
        "</body></html>"
    ).encode("utf-8")


def write_corpus(
    out_dir: str,
    n_pages: int,
    num_entities: int = 0,
    seed: int = 42,
    n_files: int = 16,
    prefill_text_every: int = 13,
) -> Dict[str, str]:
    """Materialize the corpus as parquet. Deterministic in all args.

    ``pages/`` is written as ``n_files`` part files — these are the
    resume shards of the construction pipeline. Every
    ``prefill_text_every``-th page ships with ``text`` pre-filled (the
    input_hint allows either), exercising the extract-stage passthrough.
    """
    num_entities = num_entities or max(50, n_pages // 10)
    os.makedirs(os.path.join(out_dir, "pages"), exist_ok=True)

    exp_url, exp_text = [], []
    tri_s, tri_p, tri_o, tri_u = [], [], [], []
    per_file = (n_pages + n_files - 1) // n_files
    for f in range(n_files):
        lo, hi = f * per_file, min((f + 1) * per_file, n_pages)
        if lo >= hi:
            break
        url, ts, html, text, lang = [], [], [], [], []
        for i in range(lo, hi):
            p = generate_page(i, num_entities, seed)
            url.append(p["url"])
            ts.append(p["warc_ts"])
            html.append(_render_html(p))
            text.append(p["expected_text"] if i % prefill_text_every == 0 else "")
            lang.append(p["lang"])
            exp_url.append(p["url"])
            exp_text.append(p["expected_text"])
            for s, pr, o in p["oracle_triples"]:
                tri_s.append(s)
                tri_p.append(pr)
                tri_o.append(o)
                tri_u.append(p["url"])
        table = pa.table(
            {
                "url": pa.array(url, type=pa.string()),
                "warc_ts": pa.array(ts, type=pa.timestamp("us")),
                "html": pa.array(html, type=pa.binary()),
                "text": pa.array(text, type=pa.string()),
                "lang": pa.array(lang, type=pa.string()),
            }
        )
        # Small row groups: Ray's parquet reader can split a file no
        # finer than its row groups — one giant row group per file caps
        # downstream parallelism at n_files tasks.
        pq.write_table(
            table,
            os.path.join(out_dir, "pages", f"part-{f:05d}.parquet"),
            row_group_size=4096,
        )

    paths = {
        "pages": os.path.join(out_dir, "pages"),
        "aliases": os.path.join(out_dir, "aliases.parquet"),
        "expected_text": os.path.join(out_dir, "expected_text.parquet"),
        "expected_triples": os.path.join(out_dir, "expected_triples.parquet"),
    }
    pq.write_table(build_alias_table(num_entities), paths["aliases"])
    pq.write_table(
        pa.table({"url": pa.array(exp_url), "expected_text": pa.array(exp_text)}),
        paths["expected_text"],
    )
    pq.write_table(
        pa.table(
            {
                "subject": pa.array(tri_s, type=pa.string()),
                "predicate": pa.array(tri_p, type=pa.string()),
                "object": pa.array(tri_o, type=pa.string()),
                "url": pa.array(tri_u, type=pa.string()),
            }
        ),
        paths["expected_triples"],
    )
    return paths
