"""KGX merge aggregate kernels.

These implement — exactly — the reference's node/edge merge semantics
(kg_microbe_merge/utils/duckdb_utils.py:267-385 `duckdb_nodes_merge`,
:388-518 `duckdb_edges_merge`) as Ray Data ``AggregateFnV2`` kernels:

* ``SortedUniqueConcat(col)``  ==  ``STRING_AGG(DISTINCT col, '|' ORDER BY col)``
  (duckdb_utils.py:332): sorted distinct pipe-join over non-null values;
  all-null group → NULL. Distinctness is at the *value* level — values
  that themselves contain ``|`` are kept verbatim (e.g. xref
  ``GC_ID:11|PMID:28056223``), matching DuckDB.

* ``PriorityCoalesceMax(priority_sources)``  ==
  ``COALESCE(MAX(CASE WHEN provided_by IN (prio) THEN name END), MAX(name))``
  (duckdb_utils.py:329-331): if any row of the group came from a
  priority (ontology) source, take the lexicographic MAX name over
  those rows; otherwise the MAX over all names. String comparison is
  binary/codepoint order in both DuckDB (default collation) and Python.

Both kernels are algebraic (block-partial → combine → finalize), so the
groupby is a two-phase aggregation: Ray computes one partial accumulator
per (group, block) and merges accumulators — no per-row Python in the
shuffle, and id-level skew is absorbed by the partial phase. They work
under both the sort-based and hash-shuffle groupby strategies.

Pure-pandas reference implementations (``merge_nodes_pandas`` /
``merge_edges_pandas``) are provided as the in-process oracle for unit
tests and for small driver-side merges without a Ray session.
"""

from __future__ import annotations

from typing import Any, Iterable, List, Optional, Set, Tuple

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import AggregateFnV2
from ray.data.block import Block, BlockAccessor

from kgray.constants import MULTIVALUE_SEP


def _arrow_column(block: Block, col: str) -> pa.ChunkedArray:
    table = BlockAccessor.for_block(block).to_arrow()
    return table.column(col)


class SortedUniqueConcat(AggregateFnV2):
    """``STRING_AGG(DISTINCT col, sep ORDER BY col)`` with NULLs ignored.

    Accumulator: ``set[str]`` of distinct non-null values seen.
    Finalize: ``sep.join(sorted(values))``; empty set → ``None`` (SQL NULL).
    """

    def __init__(self, on: str, sep: str = MULTIVALUE_SEP, alias_name: Optional[str] = None):
        self._sep = sep
        super().__init__(alias_name or on, on=on, ignore_nulls=True, zero_factory=set)

    def aggregate_block(self, block: Block) -> Set[str]:
        col = _arrow_column(block, self._target_col_name)
        uniq = pc.unique(pc.drop_null(col))
        return set(uniq.to_pylist())

    def combine(self, current_accumulator: Any, new: Any) -> Set[str]:
        cur = current_accumulator if isinstance(current_accumulator, set) else set(current_accumulator)
        add = new if isinstance(new, set) else set(new) if isinstance(new, (list, frozenset)) else {new}
        return cur | add

    def finalize(self, accumulator: Set[str]) -> Optional[str]:
        if not accumulator:
            return None
        return self._sep.join(sorted(accumulator))


class PriorityCoalesceMax(AggregateFnV2):
    """The reference's priority-name rule (duckdb_utils.py:329-331).

    ``COALESCE(MAX(CASE WHEN provided_by IN priority THEN name END), MAX(name))``

    Accumulator: ``(priority_max, overall_max)`` — each a str or None.
    The priority source list is tiny (one entry per ontology source,
    reference merge.py:81-92) and travels in the kernel closure; no
    shuffle or broadcast needed.

    CAVEAT: Ray projects aggregation inputs to the union of the
    aggregated columns — this kernel reads ``source_col`` from the
    block, so the same ``groupby().aggregate(...)`` call MUST also
    carry an aggregate over ``source_col`` (as the full KGX merge
    always does, e.g. ``SortedUniqueConcat("provided_by")``).
    If ``source_col`` is absent from the aggregated block, the kernel
    raises rather than silently degrading to the overall MAX.
    """

    def __init__(
        self,
        priority_sources: Iterable[str],
        on: str = "name",
        source_col: str = "provided_by",
        alias_name: Optional[str] = None,
    ):
        self._priority = frozenset(priority_sources)
        self._source_col = source_col
        super().__init__(
            alias_name or on,
            on=on,
            ignore_nulls=True,
            zero_factory=lambda: (None, None),
        )

    @staticmethod
    def _max_nonnull(col: pa.ChunkedArray) -> Optional[str]:
        col = pc.drop_null(col)
        if len(col) == 0:
            return None
        return pc.max(col).as_py()

    def aggregate_block(self, block: Block) -> Tuple[Optional[str], Optional[str]]:
        table = BlockAccessor.for_block(block).to_arrow()
        names = table.column(self._target_col_name)
        overall = self._max_nonnull(names)
        prio: Optional[str] = None
        if self._priority:
            if self._source_col not in table.column_names:
                raise ValueError(
                    f"PriorityCoalesceMax requires '{self._source_col}' in the "
                    f"aggregated block (got {table.column_names}); co-aggregate "
                    f"it (e.g. SortedUniqueConcat('{self._source_col}')) so Ray "
                    "projects it into the aggregation input."
                )
            sources = table.column(self._source_col)
            mask = pc.is_in(sources, value_set=pa.array(sorted(self._priority), type=pa.string()))
            mask = pc.fill_null(mask, False)
            prio = self._max_nonnull(names.filter(mask))
        return (prio, overall)

    @staticmethod
    def _max2(a: Optional[str], b: Optional[str]) -> Optional[str]:
        if a is None:
            return b
        if b is None:
            return a
        return a if a >= b else b

    def combine(self, current_accumulator: Any, new: Any) -> Tuple[Optional[str], Optional[str]]:
        ca = current_accumulator if isinstance(current_accumulator, tuple) else tuple(current_accumulator)
        nb = new if isinstance(new, tuple) else tuple(new)
        return (self._max2(ca[0], nb[0]), self._max2(ca[1], nb[1]))

    def finalize(self, accumulator: Tuple[Optional[str], Optional[str]]) -> Optional[str]:
        prio, overall = accumulator
        return prio if prio is not None else overall


class MinAny(AggregateFnV2):
    """Min over any ordered type incl. strings, NULLs ignored.

    (Ray's built-in ``Min`` seeds its accumulator with ``float("+inf")``
    which cannot be compared against strings; this kernel seeds with
    ``None`` and handles it explicitly.)
    """

    def __init__(self, on: str, alias_name: Optional[str] = None):
        super().__init__(alias_name or f"min({on})", on=on, ignore_nulls=True, zero_factory=lambda: None)

    def aggregate_block(self, block: Block) -> Any:
        col = pc.drop_null(_arrow_column(block, self._target_col_name))
        if len(col) == 0:
            return None
        return pc.min(col).as_py()

    def combine(self, current_accumulator: Any, new: Any) -> Any:
        if current_accumulator is None:
            return new
        if new is None:
            return current_accumulator
        return current_accumulator if current_accumulator <= new else new

    def finalize(self, accumulator: Any) -> Any:
        return accumulator


# ---------------------------------------------------------------------------
# Pure-pandas reference kernels (unit-test oracle; small driver-side merges)
# ---------------------------------------------------------------------------


def _sorted_unique_concat_series(s: pd.Series, sep: str = MULTIVALUE_SEP) -> Optional[str]:
    vals = sorted({v for v in s if v is not None and not (isinstance(v, float) and pd.isna(v))})
    return sep.join(vals) if vals else None


def merge_nodes_pandas(
    df: pd.DataFrame,
    priority_sources: Iterable[str] = (),
    id_col: str = "id",
    name_col: str = "name",
    source_col: str = "provided_by",
) -> pd.DataFrame:
    """In-process KGX node merge with the exact §2.3 semantics, sorted by id."""
    priority = frozenset(priority_sources)
    other_cols = [c for c in df.columns if c not in (id_col, name_col)]

    def _merge_group(g: pd.DataFrame) -> pd.Series:
        out = {}
        names = g[name_col].dropna() if name_col in g else pd.Series([], dtype=object)
        prio_names = (
            g.loc[g[source_col].isin(priority), name_col].dropna()
            if priority and source_col in g
            else pd.Series([], dtype=object)
        )
        if len(prio_names):
            out[name_col] = prio_names.max()
        elif len(names):
            out[name_col] = names.max()
        else:
            out[name_col] = None
        for c in other_cols:
            out[c] = _sorted_unique_concat_series(g[c])
        return pd.Series(out)

    merged = df.groupby(id_col, sort=True).apply(_merge_group, include_groups=False)
    merged = merged.reset_index()
    cols = [id_col] + [c for c in df.columns if c != id_col]
    return merged[cols]


def merge_edges_pandas(
    df: pd.DataFrame,
    key: Optional[List[str]] = None,
    provenance: bool = False,
) -> pd.DataFrame:
    """In-process KGX edge merge (§2.4): DISTINCT on the triple, sorted.

    ``provenance=True`` activates the provenance-preserving variant
    (reference's commented-out block, duckdb_utils.py:450-485): non-key
    columns merged as sorted distinct pipe-join.
    """
    key = key or ["subject", "predicate", "object"]
    if not provenance:
        out = df[key].drop_duplicates()
        return out.sort_values(key, kind="mergesort").reset_index(drop=True)
    other = [c for c in df.columns if c not in key]
    agg = {c: _sorted_unique_concat_series for c in other}
    out = df.groupby(key, sort=True, dropna=False).agg(agg).reset_index()
    return out[key + other]
