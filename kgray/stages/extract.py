"""Deterministic HTML → text extraction (north-rule stage 1).

The reference engine has no HTML stage (its inputs are KGX TSVs); this
stage is specified by BASELINE.json's north rule: *deterministic
HTML-to-text extraction, byte-identical per url*. The extractor is a
pure function with a pinned spec, so the same html bytes always yield
the same text bytes — the per-row invariant the goldens check.

EXTRACTOR SPEC (pinned; the synthetic corpus generator in
kgray/sources/pages.py builds pages whose expected text follows from
this spec exactly):

1. Decode bytes as UTF-8 (``errors="replace"``).
2. Drop ``<script>…</script>``, ``<style>…</style>`` (case-insensitive,
   non-greedy, dotall) and ``<!-- … -->`` comments.
3. Replace block-level tags (open or close: p div br h1-h6 li ul ol tr
   td th table nav header footer section article title head body html
   blockquote) with a newline; every other tag with the empty string.
4. Unescape HTML entities.
5. Per line: collapse runs of spaces/tabs to one space, strip; drop
   empty lines; join the remaining lines with ``\n``.

Run as a stateless ``map_batches`` stage — regexes are module-level
compiled constants, so there is no per-actor state to pin and plain
Ray tasks are cheaper than an actor pool here.
"""

from __future__ import annotations

import html as _html
import re
from typing import Union

import pyarrow as pa

_NOISE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.S | re.I)
_COMMENT = re.compile(r"<!--.*?-->", re.S)
_BLOCK = re.compile(
    r"</?(?:p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|nav|header|footer|"
    r"section|article|title|head|body|html|blockquote)\b[^>]*/?>",
    re.I,
)
_TAG = re.compile(r"<[^>]+>")
_WS = re.compile(r"[ \t]+")


def extract_text(html: Union[bytes, str]) -> str:
    """Pure deterministic HTML→text per the spec above."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        s = bytes(html).decode("utf-8", errors="replace")
    else:
        s = html
    s = _NOISE.sub("", s)
    s = _COMMENT.sub("", s)
    s = _BLOCK.sub("\n", s)
    s = _TAG.sub("", s)
    if "&" in s:  # unescape is the identity without an ampersand
        s = _html.unescape(s)
    lines = []
    for line in s.split("\n"):
        line = _WS.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


# NOTE on vectorization: an Arrow-RE2 column implementation of the
# stripping passes (pc.replace_substring_regex ×5) was measured 3.5×
# SLOWER than the compiled-Python-re per-row path on this corpus
# (0.39 s vs 0.11 s / 3k pages) — RE2 alternation + five full-column
# materializations lose to one fused Python pass. The per-row path
# below is the fast one; ~50 µs/page keeps extraction a minor share of
# the fused front-half actor.


def extract_text_batch(batch: pa.Table, html_col: str = "html", text_col: str = "text") -> pa.Table:
    """map_batches body: fill ``text`` from ``html`` where text is empty.

    Rows that already carry extracted text (per input_hint, ``text`` may
    be pre-filled) are passed through untouched.
    """
    htmls = batch.column(html_col).to_pylist()
    texts = batch.column(text_col).to_pylist() if text_col in batch.column_names else [None] * len(batch)
    out = [t if t else extract_text(h) for t, h in zip(texts, htmls)]
    idx = batch.column_names.index(text_col) if text_col in batch.column_names else None
    arr = pa.array(out, type=pa.string())
    if idx is None:
        return batch.append_column(text_col, arr)
    return batch.set_column(idx, text_col, arr)
