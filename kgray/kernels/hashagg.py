"""Hash-partitioned grouped execution — the engine's exchange primitive.

Ray Data's built-in ``groupby(key).aggregate(...)`` and ``map_groups``
invoke Python once PER GROUP (~70 µs/group measured on this Ray build,
both sort- and hash-shuffle strategies). For high-cardinality keys —
node ids, (s,p,o) triples, LSH buckets, user sessions — that is the
difference between a vectorized engine and a row-at-a-time one.

``grouped_apply`` restores vectorization:

  1. **Map side**: every batch gets a ``__part = H(key) % P`` column
     (one vectorized ``hash_pandas_object`` call); an optional
     ``map_side`` pre-reduce (combiner) shrinks data before the
     exchange — e.g. per-batch ``drop_duplicates`` for distinct-style
     aggregations, partial sums for algebraic ones.
  2. **Exchange**: ``groupby("__part")`` — only P groups, so Ray's
     per-group overhead is P · 70 µs ≈ nothing, while rows with equal
     keys land in the same partition.
  3. **Reduce side**: ``reduce_fn(pandas_partition) -> pandas`` runs
     once per partition and does its own in-process C-speed grouping
     (pandas groupby / drop_duplicates / sort_values).

P sizing: each partition must fit one worker's heap. Rule of thumb
P ≈ input_bytes / 256 MiB, floor 2·num_cpus; callers pass it
explicitly for the big pipelines. Skewed keys distribute across
partitions by hash; a single pathological hot KEY still lands in one
partition — for those, the caller salts the key (see
merge_edges_fast's salt option).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import pandas as pd
import ray.data
from ray.data import Dataset


def add_partition_column(
    df: pd.DataFrame, keys: Sequence[str], num_partitions: int, col: str = "__part"
) -> pd.DataFrame:
    """Deterministic vectorized key-hash partition id."""
    h = pd.util.hash_pandas_object(
        df[list(keys)].astype(str).agg("\x1f".join, axis=1) if len(keys) > 1 else df[keys[0]],
        index=False,
    )
    df = df.copy(deep=False)
    df[col] = (h % num_partitions).astype("int32")
    return df


def grouped_apply(
    ds: Dataset,
    keys: Sequence[str],
    reduce_fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_partitions: int = 64,
    map_side: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None,
) -> Dataset:
    """Vectorized grouped execution: see module docstring.

    ``reduce_fn`` receives one full hash-partition (all rows whose key
    hashes there, every key complete) WITHOUT the ``__part`` column and
    must do its own per-key grouping vectorized.
    """
    keys = list(keys)

    def _map(df: pd.DataFrame) -> pd.DataFrame:
        if map_side is not None:
            df = map_side(df)
        return add_partition_column(df, keys, num_partitions)

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        return reduce_fn(g.drop(columns="__part"))

    return ds.map_batches(_map, batch_format="pandas").groupby("__part").map_groups(
        _reduce, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Common vectorized reducers
# ---------------------------------------------------------------------------

def distinct(ds: Dataset, keys: Sequence[str], num_partitions: int = 64) -> Dataset:
    """DISTINCT over ``keys`` — per-batch combiner + per-partition dedup,
    both C-speed ``drop_duplicates``."""
    keys = list(keys)
    return grouped_apply(
        ds,
        keys,
        lambda g: g.drop_duplicates(keys),
        num_partitions=num_partitions,
        map_side=lambda df: df[keys].drop_duplicates(),
    )


def sorted_unique_join_frame(
    df: pd.DataFrame,
    keys: Sequence[str],
    cols: Sequence[str],
    sep: str = "|",
) -> pd.DataFrame:
    """Per-partition KGX aggregate: for each col, sorted distinct
    ``sep``-join of non-null values per key group (STRING_AGG DISTINCT
    semantics, reference duckdb_utils.py:332). One row per key tuple;
    groups whose values are all-null in a column get NaN there.

    Everything is C-speed except the final per-group str.join, which
    runs in-process (no scheduler round-trips)."""
    keys = list(keys)
    base = df[keys].drop_duplicates().set_index(keys)
    out = base
    for c in cols:
        sub = df[keys + [c]].dropna(subset=[c]).drop_duplicates()
        sub = sub.sort_values(keys + [c], kind="mergesort")
        agg = sub.groupby(keys, sort=False)[c].agg(sep.join)
        out = out.join(agg, how="left")
    return out
