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

import os
import weakref
from typing import Callable, List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data import Dataset

# ---------------------------------------------------------------------------
# Static schema propagation
#
# ``Dataset.schema()`` on a pipeline whose upstream contains an
# all-to-all exchange (groupby/sort) EXECUTES that upstream to produce
# the first block — so a chain of relational operators (join → join →
# aggregate), each of which must know its input schema to build its
# map functions, re-runs every upstream exchange once per downstream
# operator. Operators whose output schema is statically known (the
# joins, projections) register it here; consumers read the hint and
# fall back to ``Dataset.schema()`` only when none exists. Keyed by
# Dataset identity via weakref — hints die with the dataset object.
# ---------------------------------------------------------------------------

_SCHEMA_HINTS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def register_schema(ds: Dataset, schema: pa.Schema) -> Dataset:
    """Attach a statically-known Arrow schema to ``ds`` (see module
    note above); returns ``ds`` for chaining."""
    try:
        _SCHEMA_HINTS[ds] = schema
    except TypeError:  # non-weakref-able stand-in (tests)
        pass
    return ds


def known_schema(ds: Dataset) -> Optional[pa.Schema]:
    """The registered schema hint for ``ds``, or None."""
    try:
        return _SCHEMA_HINTS.get(ds)
    except TypeError:
        return None


def dataset_schema(ds: Dataset):
    """``ds``'s schema WITHOUT forcing upstream execution when a hint
    is registered. Returns a ``pa.Schema`` (hint) or Ray's ``Schema``
    (fallback) — both offer ``.names`` / ``.types`` and both are
    accepted by :func:`arrow_types`."""
    hint = known_schema(ds)
    return hint if hint is not None else ds.schema()


def arrow_type(t) -> pa.DataType:
    """Normalize a Dataset.schema() column type to an Arrow DataType.

    Ray reports pandas-backed blocks with numpy/pandas-extension dtypes;
    pandas extension dtypes (e.g. ``Int64Dtype``) are resolved through an
    empty-Series Arrow conversion. ``None`` is rejected loudly —
    ``pa.from_numpy_dtype(None)`` would silently yield float64 (numpy's
    default dtype) and corrupt hash-partition keys downstream.
    """
    if isinstance(t, pa.DataType):
        return t
    if t is None:
        raise TypeError(
            "column type is None (Ray's Schema.types drops dtypes it cannot "
            "convert) — resolve types via arrow_types(), which reads the "
            "underlying block schema"
        )
    try:
        return pa.from_numpy_dtype(t)
    except (TypeError, pa.lib.ArrowNotImplementedError):
        return pa.Table.from_pandas(
            pd.DataFrame({"x": pd.Series([], dtype=t)})
        ).schema.field("x").type


def arrow_types(schema) -> dict:
    """``{column: pa.DataType}`` for a ``Dataset.schema()``.

    Prefers ``schema.base_schema`` (the raw block schema): for
    pandas-backed datasets Ray's ``Schema.types`` replaces extension
    dtypes it cannot convert (``Int64Dtype`` etc.) with ``None``, while
    the block schema retains them.
    """
    types = schema.types
    base = getattr(schema, "base_schema", None)
    if base is not None and not isinstance(base, pa.Schema):
        types = base.types
    return {n: arrow_type(t) for n, t in zip(schema.names, types)}


class _EmptyBlockSchemaFilter:
    """Logging filter dropping ONLY the known-harmless empty-block
    schema notices a fixed-width hash exchange produces: a ``__part``
    partition that received zero rows makes Ray emit an empty block
    with an EMPTY schema (``names=[]`` / a blank Arrow schema), and the
    streaming executor warns about the mismatch on every such block.
    The blocks are empty, so nothing downstream can misinterpret them —
    but the warning floods benchmark/driver tails. Genuine mismatches
    (a non-empty conflicting schema) are left untouched. Ray's
    schema-hash-for-dedup failure notice ("unhashable type") is dropped
    for the same reason: metadata-only, fires per empty block."""

    def filter(self, record) -> bool:  # logging.Filter protocol
        m = record.getMessage()
        if "produced a RefBundle with a different schema" in m:
            if "new schema: PandasBlockSchema(names=[]" in m:
                return False
            if "new schema: ." in m:  # blank Arrow schema renders as ''
                return False
        if "Failed to hash the schemas (for deduplication)" in m:
            return False
        return True


def quiet_empty_block_warnings() -> None:
    """Install :class:`_EmptyBlockSchemaFilter` on the two Ray Data
    loggers that emit per-empty-block noise. Idempotent; call from
    benchmark / pipeline entry points that tolerate empty exchange
    partitions by design (``grouped_apply`` with num_partitions >
    distinct keys)."""
    import logging

    for name in (
        "ray.data._internal.execution.streaming_executor_state",
        "ray.data._internal.planner.plan_udf_map_op",
        "ray.data._internal.arrow_ops.transform_pyarrow",
    ):
        lg = logging.getLogger(name)
        if not any(isinstance(f, _EmptyBlockSchemaFilter) for f in lg.filters):
            lg.addFilter(_EmptyBlockSchemaFilter())


def pin_blocks(ds: "Dataset", num_blocks: int) -> "Dataset":
    """Materialize with a BOUNDED block count and a SEVERED lineage —
    the mandatory checkpoint form for ITERATIVE Dataset algorithms
    (label propagation, pointer jumping, Borůvka, k-core peeling).

    Two exponential blowups bite loops that re-join their own previous
    iterate (both measured in the spanning-forest work):

    * a tagged-union exchange doubles its inputs' block count and the
      sort preserves it — blocks double per iteration (3 → 768 over 8
      pointer jumps on a 70-row table); ``repartition(n)`` (local block
      merge, not an exchange) bounds them;
    * a join consumes the previous iterate on BOTH sides, so the
      stats/lineage parents form a BINARY TREE of depth = iterations —
      2^k stats nodes that every later execution walks (wall time
      doubled per jump even with blocks pinned). Rebuilding from the
      materialized block refs (zero-copy, same objects) severs the
      parent chain.
    """
    import ray.data as _rd

    m = ds.repartition(num_blocks).materialize()
    return _rd.from_arrow_refs(m.to_arrow_refs())


def auto_partitions(
    input_bytes: Optional[int] = None,
    target_bytes: int = 256 << 20,
    floor: Optional[int] = None,
    files: Optional[Sequence[str]] = None,
) -> int:
    """Partition count from the module's documented sizing rule:
    P ≈ input_bytes / 256 MiB, floored at 2 × cluster CPUs — so the
    exchange width scales with BOTH the data and the cluster instead of
    a hardcoded constant (a hidden scale parameter at 1000×).

    ``files``: convenience — sum parquet file sizes instead of passing
    ``input_bytes`` (on-disk compressed bytes understate heap bytes,
    but the CPU floor dominates for small inputs either way).
    """
    import ray

    if input_bytes is None and files:
        input_bytes = sum(os.path.getsize(f) for f in files if os.path.exists(f))
    if floor is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        floor = 2 * ncpu
    return max(floor, -(-int(input_bytes or 0) // target_bytes))


_MIX = np.uint64(0x9E3779B97F4A7C15)


def _hash_key_array(col) -> np.ndarray:
    """uint64 partition hash of ONE key column, stable across the
    physical representations a logical column takes batch to batch.

    The raw ``hash_pandas_object(batch[key])`` form is a correctness
    trap: an int64 column converts to pandas as float64-NaN in batches
    that happen to contain a NULL and stays int64 in batches that don't
    — equal keys then hash to DIFFERENT partitions and the reduce side
    silently misses matches. Numeric/temporal keys therefore hash
    through a canonical float64 image (a hash collision from the
    2^53 mantissa only affects partition balance — the reduce side
    regroups exactly); strings/objects hash through pandas object
    hashing, whose dtype cannot drift.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pd.Series):
        if col.dtype == object or isinstance(col.dtype, pd.CategoricalDtype):
            return pd.util.hash_pandas_object(col, index=False).to_numpy()
        try:
            col = pa.Array.from_pandas(col)
        except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
            return pd.util.hash_pandas_object(col, index=False).to_numpy()
    t = col.type
    if pa.types.is_dictionary(t):
        col = col.cast(t.value_type)
        t = col.type
    if pa.types.is_boolean(t):
        col = col.cast(pa.int8())
        t = col.type
    if pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_temporal(t):
        vals = col.to_numpy(zero_copy_only=False)
        if vals.dtype.kind in "mM":  # datetime64/timedelta64 (NaT = int64 min)
            vals = vals.view("int64").astype(np.float64)
        else:
            vals = vals.astype(np.float64, copy=False)
        nan = np.isnan(vals)
        if nan.any():  # normalize NaN bit patterns (NULL fill is np.nan)
            vals = np.where(nan, np.nan, vals)
        return pd.util.hash_array(vals)
    return pd.util.hash_pandas_object(
        pd.Series(col.to_numpy(zero_copy_only=False)), index=False
    ).to_numpy()


def _key_hash(cols) -> np.ndarray:
    """Mix per-column hashes with distinct odd multipliers — no row-wise
    string concatenation (uint64 wraparound is the intended mixing)."""
    h = _hash_key_array(cols[0])
    for i, c in enumerate(cols[1:], start=1):
        h = h * _MIX + _hash_key_array(c) + np.uint64(i)
    return h


def add_partition_column(
    df: pd.DataFrame, keys: Sequence[str], num_partitions: int, col: str = "__part"
) -> pd.DataFrame:
    """Deterministic vectorized key-hash partition id (representation-
    stable: see :func:`_hash_key_array`)."""
    keys = list(keys)
    h = _key_hash([df[k] for k in keys])
    df = df.copy(deep=False)
    df[col] = (h % np.uint64(num_partitions)).astype("int32")
    return df


def add_partition_column_arrow(
    t: "pa.Table", keys: Sequence[str], num_partitions: int, col: str = "__part"
) -> "pa.Table":
    """Arrow-block variant of :func:`add_partition_column`: the block
    stays a (zero-copy) Arrow table — no pandas conversion of the value
    columns, and no NaN-driven int→float upcast that makes union
    branches disagree on block schema."""
    keys = list(keys)
    h = _key_hash([t.column(k) for k in keys])
    part = (h % np.uint64(num_partitions)).astype("int32")
    if col in t.column_names:
        t = t.drop_columns([col])
    return t.append_column(col, pa.array(part))


def grouped_apply(
    ds: Dataset,
    keys: Sequence[str],
    reduce_fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_partitions: int = 64,
    map_side: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None,
    map_format: str = "pandas",
) -> Dataset:
    """Vectorized grouped execution: see module docstring.

    ``reduce_fn`` receives one full hash-partition (all rows whose key
    hashes there, every key complete) WITHOUT the ``__part`` column and
    must do its own per-key grouping vectorized.

    ``map_format="pyarrow"`` keeps the map side zero-copy Arrow (the
    optional ``map_side`` then takes/returns ``pa.Table``): use it when
    the input is a tagged union whose NULL-filled columns would upcast
    under pandas and emit block-schema-mismatch warnings.
    """
    keys = list(keys)

    if map_format == "pyarrow":
        def _map_arrow(t):
            if map_side is not None:
                t = map_side(t)
            return add_partition_column_arrow(t, keys, num_partitions)

        mapped = ds.map_batches(_map_arrow, batch_format="pyarrow")
    else:
        def _map(df: pd.DataFrame) -> pd.DataFrame:
            if map_side is not None:
                df = map_side(df)
            return add_partition_column(df, keys, num_partitions)

        mapped = ds.map_batches(_map, batch_format="pandas")

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        return reduce_fn(g.drop(columns="__part"))

    return mapped.groupby("__part").map_groups(_reduce, batch_format="pandas")


def stable_round(col, ndigits: int):
    """Round a float64 Arrow array the way SQL engines do.

    ``pc.round`` can return its input unchanged when the input is a
    near-miss of a representable decimal (e.g. 62.699999999999996 with
    ndigits=4 — a float-summation-order artifact), while DuckDB's ROUND
    returns the double nearest 62.7 — a one-ulp difference that breaks
    value-hash comparison. multiply→round→divide lands on the same
    double as SQL ROUND."""
    import pyarrow.compute as pc

    scale = float(10**ndigits)
    # half_towards_infinity = SQL's half-away-from-zero tie rule
    # (Arrow's default half_to_even differs at exact .5 ties).
    return pc.divide(
        pc.round(pc.multiply(col, scale), round_mode="half_towards_infinity"), scale
    )


def shared_fs_ok(path: str) -> bool:
    """True when ``path`` is usable as an exchange spill across the
    cluster: single-node, or an explicitly shared mount (a prefix listed
    in ``$KGRAY_SHARED_FS``, colon-separated). The spill/reduce protocol
    reads partitions through the filesystem, so on a multi-node cluster
    a node-local path would silently reduce over partial data — callers
    fail fast instead (ADVICE r1)."""
    import ray

    alive = [n for n in ray.nodes() if n.get("Alive", False)]
    if len(alive) <= 1:
        return True
    shared_prefixes = tuple(p for p in os.environ.get("KGRAY_SHARED_FS", "").split(":") if p)
    return path.startswith(shared_prefixes) if shared_prefixes else False


def grouped_apply_spill(
    ds: Dataset,
    keys: Sequence[str],
    table_reduce: Callable,
    spill_dir: str,
    num_partitions: int = 64,
    map_side: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None,
) -> Dataset:
    """Spill-based hash exchange: ``map_batches`` writes the mapped
    batches as parquet partitioned by ``__part`` (a fully parallel
    write, no Sort operator), then one Ray task per partition reads its
    directory and applies ``table_reduce(pa.Table) -> pa.Table``.

    Measured ~1.7× faster than the Sort-op exchange on this node for
    500 MB shuffles, and the spill directory is a natural checkpoint
    boundary (a crashed reduce rereads it). Each partition must fit a
    worker's heap — size ``num_partitions`` to input_bytes/256 MiB.
    """
    import shutil

    import pyarrow.parquet as pq
    import ray

    if not shared_fs_ok(spill_dir):
        raise RuntimeError(
            f"grouped_apply_spill spills its exchange under {spill_dir!r}, but this "
            "is a multi-node cluster and the path is not declared shared storage; "
            "point spill_dir at a shared mount and list its prefix in "
            "$KGRAY_SHARED_FS (colon-separated) to proceed."
        )
    keys = list(keys)

    def _map(df: pd.DataFrame) -> pd.DataFrame:
        if map_side is not None:
            df = map_side(df)
        return add_partition_column(df, keys, num_partitions)

    shutil.rmtree(spill_dir, ignore_errors=True)
    ds.map_batches(_map, batch_format="pandas").write_parquet(
        spill_dir, partition_cols=["__part"]
    )

    @ray.remote
    def _reduce_part(d: str, fn):
        t = pq.read_table(d)
        if "__part" in t.column_names:
            t = t.drop_columns(["__part"])
        return fn(t)

    part_dirs = sorted(
        os.path.join(spill_dir, d) for d in os.listdir(spill_dir) if d.startswith("__part=")
    )
    refs = [_reduce_part.remote(d, table_reduce) for d in part_dirs]
    return ray.data.from_arrow_refs(refs)


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


def sorted_unique_join_table(
    t: "pa.Table",
    keys: Sequence[str],
    cols: Sequence[str],
    sep: str = "|",
) -> "pa.Table":
    """Fully C-speed KGX aggregate (pyarrow kernels): for each col, the
    sorted distinct ``sep``-join of non-null values per key group
    (STRING_AGG DISTINCT semantics, reference duckdb_utils.py:332).
    Returns one row per key tuple (keys + joined cols); groups whose
    values are all-null in a column get null.

    Pipeline per column: filter-null → group_by(keys+[c]) distinct →
    sort_by(keys+[c]) → group_by(keys) "list" (single-threaded scan
    keeps sorted order) → pc.binary_join(sep) → hash join onto the
    accumulator. No per-group Python anywhere."""
    import pyarrow as pa
    import pyarrow.compute as pc

    # All-null columns infer as Arrow `null` type (e.g. NULL-padded KGX
    # columns) — unsupported by the hash aggregates; treat as string.
    for i, f in enumerate(t.schema):
        if pa.types.is_null(f.type):
            t = t.set_column(i, f.name, t.column(f.name).cast(pa.string()))

    keys = list(keys)
    out = t.select(keys).group_by(keys).aggregate([])
    sort_spec = [(k, "ascending") for k in keys]
    for c in cols:
        sub = t.select(keys + [c]).filter(pc.is_valid(t.column(c)))
        sub = sub.group_by(keys + [c]).aggregate([])
        # Fast path — the dominant case after map-side combining: every
        # key group holds exactly ONE distinct non-null value, so the
        # sorted pipe-join of the group is the value itself. Proof of
        # the condition: |sub| == |out| means (key,value)-distinct rows
        # equal key groups, and a second distinct over keys alone
        # confirms no key appears twice — together: one value per key,
        # every key covered. Skips the sort + list-agg (and, on a
        # keys-only accumulator, the hash join too — `sub` IS the
        # answer). Falls through to the general sorted-join otherwise.
        if len(sub) == len(out):
            kd = sub.select(keys).group_by(keys).aggregate([])
            if len(kd) == len(sub):
                if out.num_columns == len(keys):
                    out = sub
                else:
                    out = out.join(sub, keys=keys, join_type="left outer")
                continue
        sub = sub.sort_by(sort_spec + [(c, "ascending")])
        g = sub.group_by(keys, use_threads=False).aggregate([(c, "list")])
        joined = pc.binary_join(g.column(f"{c}_list"), sep)
        g = g.drop_columns([f"{c}_list"]).append_column(c, joined)
        out = out.join(g, keys=keys, join_type="left outer")
    return out


def provenance_merge_table(
    t: "pa.Table",
    keys: Sequence[str],
    col: str,
    sep: str = "|",
) -> "pa.Table":
    """Single-column specialization of :func:`sorted_unique_join_table`
    for the edge-reduce hot path (provenance merge: per (s,p,o), the
    sorted distinct ``sep``-join of sources).

    After map-side combining, almost every key group holds ONE distinct
    value — so instead of the general sort + ordered-list-agg + hash
    join (three passes keyed on strings), this does one (keys+col)
    distinct, one hash list-agg, joins the single-value groups with a
    C-speed ``binary_join``, and sorts only the rare multi-value lists
    in Python (bounded by the number of genuinely multi-source keys).
    ~3× the general kernel on measured reduce partitions. Falls back to
    the general kernel when ``col`` has nulls (all-null groups must
    surface as null rows — the general path's left join handles that).
    Output rows/values are identical to the general kernel in all
    cases; order is unspecified (callers sort)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    keys = list(keys)
    if t.column(col).null_count or any(
        pa.types.is_null(t.schema.field(c).type) for c in [*keys, col]
    ):
        return sorted_unique_join_table(t, keys, [col], sep).select(keys + [col])
    sub = t.select(keys + [col]).group_by(keys + [col]).aggregate([])
    g = sub.group_by(keys).aggregate([(col, "list")])
    lists = g.column(f"{col}_list").combine_chunks()
    lens = pc.list_value_length(lists)
    multi = pc.greater(lens, 1)
    n_multi = pc.sum(multi).as_py() or 0
    gk = g.drop_columns([f"{col}_list"])
    if n_multi == 0:
        return gk.append_column(col, pc.binary_join(lists, sep))
    single = gk.filter(pc.invert(multi)).append_column(
        col, pc.binary_join(lists.filter(pc.invert(multi)), sep)
    )
    fixed = pa.array(
        [sep.join(sorted(v)) for v in lists.filter(multi).to_pylist()],
        type=pa.string(),
    )
    return pa.concat_tables([single, gk.filter(multi).append_column(col, fixed)])


def sorted_unique_join_frame(
    df: pd.DataFrame,
    keys: Sequence[str],
    cols: Sequence[str],
    sep: str = "|",
) -> pd.DataFrame:
    """Pandas-frame wrapper over :func:`sorted_unique_join_table`,
    returning a frame indexed by ``keys``."""
    import pyarrow as pa

    t = pa.Table.from_pandas(df[list(keys) + list(cols)], preserve_index=False)
    out = sorted_unique_join_table(t, keys, cols, sep)
    return out.to_pandas().set_index(list(keys))
