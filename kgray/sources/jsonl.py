"""JSONL source/sink — the web-corpus interchange format next to the
reference's KGX TSV (kg-microbe-merge reads TSV only, `utils/
duckdb_utils.py:68-81`; web-text pipelines overwhelmingly move JSONL).

Same loader contract as ``kgx_tsv.load_kgx_files`` (S2): N files →
one Dataset, intended union-by-name + NULL fill, every column cast to
string at the KGX boundary (the reference's all-VARCHAR model, §1.2),
optional ``source_table`` lineage tag per file (M2). Schema discovery
reads each file's inferred Arrow schema (one block), not the whole
file.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

import pyarrow as pa
import ray.data

from kgray.sources.kgx_tsv import align_to_columns, union_columns


def jsonl_columns(path: str) -> list:
    """Column names of a JSONL file from its inferred Arrow schema
    (reads one block, not the file)."""
    return list(ray.data.read_json(path).schema().names)


def read_jsonl_kgx(
    path: str,
    exclude_columns: Iterable[str] = (),
    source_tag: Optional[str] = None,
) -> ray.data.Dataset:
    """One JSONL file → all-string Dataset (KGX boundary types);
    ``exclude_columns`` dropped at the read (S2's exclusion rule),
    ``source_tag`` appended as the ``source_table`` lineage column."""
    excl = set(exclude_columns)
    ds = ray.data.read_json(path)

    def _to_string(t: pa.Table) -> pa.Table:
        arrays, names = [], []
        for name in t.column_names:
            if name in excl:
                continue
            col = t.column(name)
            if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
                col = col.cast(pa.string())
            arrays.append(col)
            names.append(name)
        if source_tag is not None:
            arrays.append(pa.array([source_tag] * t.num_rows, pa.string()))
            names.append("source_table")
        return pa.Table.from_arrays(arrays, names=names)

    return ds.map_batches(_to_string, batch_format="pyarrow")


def load_jsonl_files(
    paths: Sequence[str],
    exclude_columns: Iterable[str] = (),
    tag_sources: bool = False,
    source_tags: Optional[Sequence[str]] = None,
) -> ray.data.Dataset:
    """N JSONL files → one Dataset, union-by-name + NULL fill — the
    JSONL twin of ``load_kgx_files`` (implements the reference's
    INTENDED union, not its last-file-wins bug; SURVEY §1.2)."""
    excl = set(exclude_columns)
    headers = [[c for c in jsonl_columns(p) if c not in excl] for p in paths]
    canonical = union_columns(headers)
    if tag_sources and "source_table" not in canonical:
        canonical = canonical + ["source_table"]
    parts = []
    for i, p in enumerate(paths):
        tag = None
        if tag_sources:
            tag = source_tags[i] if source_tags else p
        parts.append(align_to_columns(
            read_jsonl_kgx(p, exclude_columns=excl, source_tag=tag), canonical))
    out = parts[0]
    if len(parts) > 1:
        out = out.union(*parts[1:])
    return out


def write_jsonl(ds: ray.data.Dataset, out_dir: str) -> None:
    """Sharded JSONL sink (one file per block — the resumable layout;
    a single global file would serialize the write)."""
    ds.write_json(out_dir)
