"""KGX TSV sources/sinks for Ray Data.

Mirrors the reference's load/write semantics
(kg_microbe_merge/utils/duckdb_utils.py):

* S1/S2 — multi-file TSV load with all-string schema, empty→NULL,
  union-by-name with NULL fill, and an ``exclude_columns`` drop list
  (duckdb_utils.py:68-81, 215-264). NOTE: the reference's column-union
  loop is buggy (the LAST file's column set wins and first-file-only
  columns are dropped — duckdb_utils.py:233,241); this engine
  implements the *intended* true union-by-name. The reference's own
  test fixtures have identical schemas so goldens are unaffected.
* M2 — constant source-tag column append (duckdb_utils.py:35-44).
* S3/S4 — globally sorted single-file TSV writer for conformance mode
  (duckdb_utils.py:190-212, batched append :363-375, :487-510). At
  scale, use parquet sinks instead (pipelines/construct.py).

All hot paths are Arrow-native: CSV parsing is pyarrow.csv inside Ray's
read tasks; schema alignment is a zero-copy column shuffle per batch.
"""

from __future__ import annotations

import csv
from typing import Dict, Iterable, List, Optional, Sequence

import pyarrow as pa
import pyarrow.csv as pacsv
import ray.data

_TSV_PARSE = pacsv.ParseOptions(delimiter="\t")


def tsv_header(path: str) -> List[str]:
    """Column names from a TSV header line (driver-side, reads one line)."""
    with open(path, "r", encoding="utf-8") as f:
        return f.readline().rstrip("\n").split("\t")


def _convert_options(columns: Sequence[str]) -> pacsv.ConvertOptions:
    # All columns VARCHAR (reference duckdb_utils.py:247-248); empty
    # string → NULL to match DuckDB's CSV reader, so aggregates skip
    # missing values exactly like STRING_AGG/MAX do.
    return pacsv.ConvertOptions(
        column_types={c: pa.string() for c in columns},
        strings_can_be_null=True,
        null_values=[""],
    )


def read_kgx_tsv(
    path: str,
    exclude_columns: Iterable[str] = (),
    source_tag: Optional[str] = None,
    tag_column: str = "source_table",
) -> ray.data.Dataset:
    """One KGX TSV file → Dataset of all-string, null-capable columns."""
    cols = tsv_header(path)
    keep = [c for c in cols if c not in set(exclude_columns)]
    ds = ray.data.read_csv(
        path,
        parse_options=_TSV_PARSE,
        convert_options=_convert_options(cols),
    )
    if len(keep) != len(cols):
        ds = ds.select_columns(keep)
    if source_tag is not None:
        tag = source_tag

        def _tag(t: pa.Table) -> pa.Table:
            return t.append_column(tag_column, pa.array([tag] * len(t), type=pa.string()))

        ds = ds.map_batches(_tag, batch_format="pyarrow")
    return ds


def union_columns(per_file_columns: Sequence[Sequence[str]]) -> List[str]:
    """True union-by-name in first-appearance order (intended S2 semantics)."""
    out: List[str] = []
    seen = set()
    for cols in per_file_columns:
        for c in cols:
            if c not in seen:
                seen.add(c)
                out.append(c)
    return out


def align_to_columns(ds: ray.data.Dataset, columns: Sequence[str]) -> ray.data.Dataset:
    """Project a Dataset to exactly ``columns`` (NULL-fill missing ones)."""
    cols = list(columns)

    def _align(t: pa.Table) -> pa.Table:
        arrays = []
        n = len(t)
        for c in cols:
            if c in t.column_names:
                col = t.column(c)
                if col.type != pa.string():
                    col = col.cast(pa.string())
                arrays.append(col)
            else:
                arrays.append(pa.nulls(n, type=pa.string()))
        return pa.Table.from_arrays(arrays, names=cols)

    return ds.map_batches(_align, batch_format="pyarrow")


def load_kgx_files(
    paths: Sequence[str],
    exclude_columns: Iterable[str] = (),
    tag_sources: bool = False,
    source_tags: Optional[Sequence[str]] = None,
) -> ray.data.Dataset:
    """S2: N TSV files → one Dataset, union-by-name + NULL fill.

    ``tag_sources`` appends a ``source_table`` lineage column per file
    (M2, reference duckdb_utils.py:35-44,102-103), tag defaulting to the
    file path.
    """
    excl = set(exclude_columns)
    headers = [[c for c in tsv_header(p) if c not in excl] for p in paths]
    canonical = union_columns(headers)
    if tag_sources and "source_table" not in canonical:
        canonical = canonical + ["source_table"]
    parts = []
    for i, p in enumerate(paths):
        tag = None
        if tag_sources:
            tag = source_tags[i] if source_tags else p
        ds = read_kgx_tsv(p, exclude_columns=excl, source_tag=tag)
        parts.append(align_to_columns(ds, canonical))
    out = parts[0]
    if len(parts) > 1:
        out = out.union(*parts[1:])
    return out


def dataset_to_sorted_tsv(
    ds: ray.data.Dataset,
    path: str,
    columns: Sequence[str],
    sort_keys: Sequence[str],
) -> None:
    """S3 conformance sink: one globally sorted TSV file, NULL → ''.

    The reference emits a single globally ordered file via a
    LIMIT/OFFSET loop (duckdb_utils.py:348-375, :487-510); here the sort
    is a distributed range-partitioned ``ds.sort`` and the driver
    streams ordered batches straight to disk — no full materialization.
    Only for conformance-mode outputs; web-scale materialization is
    partitioned parquet.
    """
    cols = list(columns)
    ds = ds.select_columns(cols).sort(list(sort_keys))
    ctx = ray.data.DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        with open(path, "w", encoding="utf-8", newline="") as f:
            f.write("\t".join(cols) + "\n")
            for batch in ds.iter_batches(batch_size=65536, batch_format="pandas"):
                batch = batch.fillna("")
                # QUOTE_NONE would make to_csv raise on embedded
                # tabs/newlines (free-text description columns in real
                # KGX dumps); collapse them to spaces so the writer
                # degrades predictably — KGX TSV has no quoting
                # convention to round-trip them anyway.
                for c in batch.columns:
                    if batch[c].dtype == object:
                        s = batch[c]
                        mask = s.str.contains(r"[\t\n\r]", regex=True, na=False)
                        if mask.any():
                            batch[c] = s.str.replace(r"[\t\n\r]+", " ", regex=True)
                batch.to_csv(
                    f,
                    sep="\t",
                    header=False,
                    index=False,
                    quoting=csv.QUOTE_NONE,
                    lineterminator="\n",
                )
    finally:
        ctx.execution_options.preserve_order = prev


def priority_sniff(node_paths_by_source: Dict[str, str]) -> List[str]:
    """M3 (reference merge.py:81-92): per ontology node file, read the
    first data row's ``provided_by`` → the priority-source list.

    Driver-side: reads one row per file with pyarrow (no Ray needed —
    this is metadata planning, exactly like the reference)."""
    out: List[str] = []
    for _source, path in node_paths_by_source.items():
        cols = tsv_header(path)
        if "provided_by" not in cols:
            continue
        # Streaming reader: pull ONE batch and stop — a first-row peek
        # must not pay for the whole file.
        with pacsv.open_csv(
            path,
            parse_options=_TSV_PARSE,
            convert_options=_convert_options(cols),
        ) as reader:
            try:
                batch = reader.read_next_batch()
            except StopIteration:
                continue
        if batch.num_rows == 0:
            continue
        val = batch.column(batch.schema.get_field_index("provided_by"))[0].as_py()
        if val:
            out.append(val)
    return out
