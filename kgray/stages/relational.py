"""Generic relational building blocks Ray Data lacks natively:
distributed hash join, top-N per group, exact grouped distinct count.

These generalize the one-off join/aggregate shapes used by the KGX
pipelines (reference duckdb_utils.py expresses them as SQL strings —
here each is a reusable Dataset→Dataset operator on the same
``grouped_apply`` exchange primitive).

Shared scale shape: ONE hash exchange on the join/group key; the
per-partition reduce is a pandas/numpy C kernel (``pd.merge``,
segmented sorts, ``drop_duplicates``). Skew note: one key's rows must
fit a worker's heap — for a pathological hot key, pre-aggregate or salt
(see kgx_merge.merge_edges_fast). A SMALL right side should broadcast
instead (``broadcast_join``): ``ray.put`` once, probe zero-copy in
every map task, no shuffle at all.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data import Dataset

from kgray.kernels.hashagg import arrow_types as _arrow_types
from kgray.kernels.hashagg import (
    auto_partitions,
    dataset_schema,
    grouped_apply,
    register_schema,
)

_SIDE = "__join_side"


def hash_join(
    left: Dataset,
    right: Dataset,
    on: Sequence[str] | str,
    how: str = "inner",
    suffix: str = "_right",
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Distributed hash join (inner/left/semi/anti) on equality keys.

    Both sides are tagged and ride ONE exchange hash-partitioned on the
    key; each partition splits by tag and runs pandas ``merge``. Right
    columns colliding with left names get ``suffix``. NULL join keys
    never match (SQL semantics — pandas merge would match NaN to NaN,
    so null-keyed right rows are dropped and null-keyed left rows are
    preserved only under ``how='left'``).

    ``how='semi'`` / ``how='anti'`` return left rows with ≥1 / 0 key
    matches on the right (SQL ``EXISTS`` / ``NOT EXISTS`` with equality
    predicates: a NULL left key matches nothing, so it is dropped by
    semi and KEPT by anti). Only the right side's keys ride the
    exchange — projected and per-batch deduplicated map-side, so the
    shuffled right volume is O(distinct keys), not O(rows).
    """
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"hash_join supports inner/left/semi/anti, got {how!r}")
    on = [on] if isinstance(on, str) else list(on)
    if num_partitions is None:
        num_partitions = auto_partitions()

    lschema, rschema = dataset_schema(left), dataset_schema(right)
    lcols = lschema.names
    if how in ("semi", "anti"):
        return _semi_anti_join(left, right, on, how, num_partitions, lcols,
                               lschema=lschema)
    rcols = [c for c in rschema.names if c not in on]
    ltypes = _arrow_types(lschema)
    rtypes = _arrow_types(rschema)
    rename = {c: (c + suffix if c in lcols else c) for c in rcols}
    out_cols = lcols + [rename[c] for c in rcols]
    out_types = {**{c: ltypes[c] for c in lcols},
                 **{rename[c]: rtypes[c] for c in rcols}}
    all_cols = lcols + [rename[c] for c in rcols]

    def _align(t: pa.Table, side: str) -> pa.Table:
        # Union-ready layout: every output column present, absent side
        # filled with typed NULLs — aligned in Arrow so both branches
        # emit identical block schemas (no pandas upcast warnings).
        arrays, names = [], []
        present = dict(zip(t.column_names, t.columns))
        for c in all_cols + [_SIDE]:
            if c == _SIDE:
                arrays.append(pa.array([side] * t.num_rows, pa.string()))
            elif side == "l" and c in lcols:
                arrays.append(present[c])
            elif side == "r" and c in rename.values():
                orig = next(k for k, v in rename.items() if v == c)
                arrays.append(present[orig])
            else:
                arrays.append(pa.nulls(t.num_rows, out_types[c]))
            names.append(c)
        # Join keys ride under their own names from BOTH sides.
        for k in on:
            arrays.append(present[k])
            names.append("__k_" + k)
        return pa.Table.from_arrays(arrays, names=names)

    lt = left.map_batches(lambda t: _align(t, "l"), batch_format="pyarrow")
    rt = right.map_batches(lambda t: _align(t, "r"), batch_format="pyarrow")
    keys = ["__k_" + k for k in on]
    out_schema = pa.schema([(c, out_types[c]) for c in out_cols])

    def _merge(df: pd.DataFrame) -> pa.Table:
        ldf = df[df[_SIDE] == "l"]
        rdf = df[df[_SIDE] == "r"]
        # SQL NULL semantics: null keys never match.
        rdf = rdf.dropna(subset=keys)
        lkeep = [c for c in lcols] + keys
        rkeep = [rename[c] for c in rcols] + keys
        merged = ldf[lkeep].merge(rdf[rkeep], on=keys, how=how, sort=False)
        # Column-wise typed conversion: a left join's unmatched rows
        # upcast int right columns to float-NaN in pandas; pa.array with
        # the target type + from_pandas=True turns NaN back into typed
        # NULLs instead of failing a table-level cast.
        arrays = [pa.array(merged[c], type=out_types[c], from_pandas=True)
                  for c in out_cols]
        return pa.Table.from_arrays(arrays, names=out_cols)

    joined = grouped_apply(
        lt.union(rt), keys, _merge, num_partitions=num_partitions,
        map_format="pyarrow",
    )
    return register_schema(joined, out_schema)


def _semi_anti_join(
    left: Dataset,
    right: Dataset,
    on: List[str],
    how: str,
    num_partitions: int,
    lcols: List[str],
    lschema=None,
) -> Dataset:
    """Semi/anti join body: left rows + right DISTINCT keys share one
    exchange on the key; each partition probes with an indicator merge.
    Output schema = the left schema, unchanged."""
    if lschema is None:
        lschema = dataset_schema(left)
    out_types = _arrow_types(lschema)
    keys = ["__k_" + k for k in on]

    def _ltag(t: pa.Table) -> pa.Table:
        arrays = list(t.columns) + [t.column(k) for k in on]
        arrays.append(pa.array(["l"] * t.num_rows, pa.string()))
        return pa.Table.from_arrays(arrays, names=lcols + keys + [_SIDE])

    def _rtag(t: pa.Table) -> pa.Table:
        # Keys only, per-batch distinct, non-null (NULL never matches) —
        # map-side combine so the shuffled right side is O(distinct keys).
        sub = t.select(on).drop_null().group_by(on).aggregate([])
        arrays = [pa.nulls(sub.num_rows, out_types[c]) for c in lcols]
        arrays += [sub.column(k).cast(out_types[k]) for k in on]
        arrays.append(pa.array(["r"] * sub.num_rows, pa.string()))
        return pa.Table.from_arrays(arrays, names=lcols + keys + [_SIDE])

    lt = left.map_batches(_ltag, batch_format="pyarrow")
    rt = right.map_batches(_rtag, batch_format="pyarrow")

    def _probe(df: pd.DataFrame) -> pa.Table:
        ldf = df[df[_SIDE] == "l"]
        rk = df.loc[df[_SIDE] == "r", keys].drop_duplicates()
        probed = ldf[lcols + keys].merge(rk, on=keys, how="left", indicator=True)
        # NaN left keys never match NaN right keys here: rk is non-null
        # by construction, so they land in 'left_only' (correct for both
        # EXISTS and NOT EXISTS semantics).
        mask = probed["_merge"] == "both"
        out = probed[mask if how == "semi" else ~mask]
        arrays = [pa.array(out[c], type=out_types[c], from_pandas=True) for c in lcols]
        return pa.Table.from_arrays(arrays, names=lcols)

    out = grouped_apply(
        lt.union(rt), keys, _probe, num_partitions=num_partitions,
        map_format="pyarrow",
    )
    return register_schema(out, pa.schema([(c, out_types[c]) for c in lcols]))


def broadcast_join(
    left: Dataset,
    right_table: pa.Table,
    on: Sequence[str] | str,
    how: str = "inner",
    suffix: str = "_right",
) -> Dataset:
    """Map-side join against a SMALL right table: ``ray.put`` once,
    every map task probes the plasma copy zero-copy — no shuffle. The
    100-TB form of enriching a corpus with a lookup table (the KGX
    category map, a domain allowlist, license metadata)."""
    if how not in ("inner", "left"):
        raise ValueError(f"broadcast_join supports inner/left, got {how!r}")
    on = [on] if isinstance(on, str) else list(on)
    ref = ray.put(right_table)
    lschema = dataset_schema(left)
    lcols = lschema.names
    ltypes = _arrow_types(lschema)
    rename = {c: (c + suffix if c in lcols and c not in on else c)
              for c in right_table.column_names}
    radd = [rename[c] for c in right_table.column_names if c not in on]
    rtypes = {rename[c]: right_table.schema.field(c).type
              for c in right_table.column_names if c not in on}
    out_schema = pa.schema(
        [(c, ltypes[c]) for c in lcols] + [(c, rtypes[c]) for c in radd])

    def _probe(t: pa.Table) -> pa.Table:
        rt = ray.get(ref)
        # An all-NULL block types its columns pa.null() → pandas object;
        # align such key columns to the other side before merging.
        for k in on:
            if pa.types.is_null(t.schema.field(k).type):
                idx = t.column_names.index(k)
                t = t.set_column(idx, k, t.column(k).cast(rt.schema.field(k).type))
        r = rt.to_pandas()
        r = r.rename(columns=rename).dropna(subset=on)
        out = t.to_pandas().merge(r, on=on, how=how, sort=False)
        # Typed column-wise conversion (NaN from left-join misses →
        # typed NULLs) so every block carries the static out_schema.
        arrays = [pa.array(out[f.name], type=f.type, from_pandas=True)
                  for f in out_schema]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return register_schema(
        left.map_batches(_probe, batch_format="pyarrow"), out_schema)


def project(
    ds: Dataset,
    columns: Sequence[str],
    rename: Optional[dict] = None,
) -> Dataset:
    """Arrow select(+rename) that PROPAGATES the static schema hint:
    chains of relational operators interleaved with projections keep
    their downstream ``dataset_schema()`` free (a plain ``map_batches``
    between two joins would otherwise force the first join's exchange
    to execute just to answer the second join's schema probe)."""
    columns = list(columns)
    new_names = [rename.get(c, c) for c in columns] if rename else columns

    def _proj(t: pa.Table) -> pa.Table:
        return t.select(columns).rename_columns(new_names)

    out = ds.map_batches(_proj, batch_format="pyarrow")
    from kgray.kernels.hashagg import known_schema

    hint = known_schema(ds)
    if hint is not None:
        types = _arrow_types(hint)
        out = register_schema(
            out, pa.schema([(n, types[c]) for c, n in zip(columns, new_names)]))
    return out


def top_n_per_group(
    ds: Dataset,
    group_cols: Sequence[str] | str,
    order_col: str,
    n: int,
    ascending: bool = False,
    tie_cols: Optional[Sequence[str]] = None,
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Top-``n`` rows per group by ``order_col`` (``row_number() <= n``
    semantics — deterministic: ties broken by ``tie_cols``).

    Map-side combine: each batch keeps only its own per-group top-n
    before the exchange, so at most ``n × groups_in_batch`` rows move —
    the shuffle carries candidates, not the table.
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    tie_cols = list(tie_cols or [])
    if num_partitions is None:
        num_partitions = auto_partitions()
    sort_cols = group_cols + [order_col] + tie_cols
    asc = [True] * len(group_cols) + [ascending] + [True] * len(tie_cols)

    def _local_top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, ascending=asc, kind="mergesort")
        return df.groupby(group_cols, sort=False, dropna=False).head(n)

    return grouped_apply(ds, group_cols, _local_top,
                         num_partitions=num_partitions, map_side=_local_top)


def grouped_distinct_count(
    ds: Dataset,
    group_cols: Sequence[str] | str,
    value_col: str,
    out_col: str = "n_distinct",
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Exact COUNT(DISTINCT value) per group.

    Map-side combine drops duplicate (group, value) pairs per batch, so
    the exchange moves at most one row per distinct pair; the reduce is
    one ``drop_duplicates`` + ``groupby.size`` per partition. (The
    approximate counterpart at extreme cardinality is a mergeable HLL
    sketch; this operator is the exact path.)
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if num_partitions is None:
        num_partitions = auto_partitions()
    sub = list(dict.fromkeys(group_cols + [value_col]))

    def _dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df[sub].drop_duplicates()

    def _count(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        # SQL COUNT(DISTINCT v): NULL values don't count, but a group
        # whose values are ALL NULL still appears (with 0).
        nonnull = d.dropna(subset=[value_col])
        sizes = nonnull.groupby(group_cols, sort=False, dropna=False).size().rename(out_col)
        groups = d[group_cols].drop_duplicates()
        out = groups.merge(sizes.reset_index(), on=group_cols, how="left")
        out[out_col] = out[out_col].fillna(0).astype(np.int64)
        return out

    pruned = ds.select_columns(sub)
    return grouped_apply(pruned, group_cols, _count,
                         num_partitions=num_partitions, map_side=_dedup)


def rollup_aggregate(
    ds: Dataset,
    group_cols: Sequence[str],
    value_col: str,
    num_partitions: Optional[int] = None,
) -> pa.Table:
    """SQL ``GROUP BY ROLLUP (a, b, …)``: COUNT(*) + SUM(value) at every
    rollup level, higher levels NULL-filled (plus the grand total).

    One exchange total: the finest level aggregates through the usual
    hash exchange with a map-side combiner; every coarser level is then
    derived FROM the finest aggregate (sums of sums, sums of counts) —
    a table of O(distinct finest groups) rows, so the rollup costs the
    same shuffle as a plain GROUP BY regardless of how many levels it
    emits. Scale bound: the finest aggregate must fit the driver (the
    standard rollup assumption — a rollup whose finest level is
    data-sized is just the input).
    """
    group_cols = list(group_cols)
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_cols, sort=False, dropna=False)[value_col]
        out = g.agg(["count", "sum"]).reset_index()
        return out.rename(columns={"count": "n_rows", "sum": "sum_value"})

    def _map_side(df: pd.DataFrame) -> pd.DataFrame:
        return _combine(df)

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_cols, sort=False, dropna=False)
        out = g.agg(n_rows=("n_rows", "sum"), sum_value=("sum_value", "sum")).reset_index()
        return out

    pruned = ds.select_columns(group_cols + [value_col])
    finest = grouped_apply(pruned, group_cols, _reduce,
                           num_partitions=num_partitions, map_side=_map_side)
    ft = pa.concat_tables(
        [b for b in finest.iter_batches(batch_format="pyarrow")]
        or [pa.table({c: pa.array([], pa.string()) for c in group_cols}
                     | {"n_rows": pa.array([], pa.int64()),
                        "sum_value": pa.array([], pa.float64())})]
    ).to_pandas()

    levels = [ft]
    cur = ft
    for k in range(len(group_cols) - 1, -1, -1):
        keep = group_cols[:k]
        if keep:
            agg = cur.groupby(keep, sort=False, dropna=False).agg(
                n_rows=("n_rows", "sum"), sum_value=("sum_value", "sum")
            ).reset_index()
        else:
            agg = pd.DataFrame({"n_rows": [cur["n_rows"].sum()],
                                "sum_value": [cur["sum_value"].sum()]})
        for c in group_cols[k:]:
            agg[c] = None
        levels.append(agg[group_cols + ["n_rows", "sum_value"]])
        cur = agg
    out = pd.concat(levels, ignore_index=True)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def grouped_zscore(
    ds: Dataset,
    group_cols: Sequence[str] | str,
    value_col: str,
    id_cols: Sequence[str] | str,
    out_col: str = "z",
    round_digits: int = 6,
) -> Dataset:
    """Per-group standardization: ``z = (x − mean_g) / stddev_samp_g``
    (NULL for groups with fewer than two rows, SQL semantics).

    Scale shape: one map pass folds per-group ``(n, Σx, Σx²)`` partials
    to the driver — O(groups), not O(rows), no shuffle — the moment
    table broadcasts via ``ray.put``, and scoring is map-only. For
    integer inputs the moments are exact in float64, so the result
    matches the SQL window form bit-for-bit before the shared ROUND.
    """
    import pyarrow as pa

    from kgray.kernels.hashagg import stable_round

    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    id_cols = [id_cols] if isinstance(id_cols, str) else list(id_cols)

    def _moments(df: pd.DataFrame) -> pd.DataFrame:
        x = df[value_col].astype(np.float64)
        g = df.assign(__x=x, __xx=x * x).groupby(group_cols, sort=False)
        out = g.agg(n=("__x", "size"), s=("__x", "sum"), ss=("__xx", "sum"))
        return out.reset_index()

    stats: dict = {}
    parts = ds.select_columns(group_cols + [value_col]).map_batches(
        _moments, batch_format="pandas")
    for b in parts.iter_batches(batch_format="pandas"):
        for row in b.itertuples(index=False):
            key = tuple(getattr(row, c) for c in group_cols)
            n, s, ss = stats.get(key, (0, 0.0, 0.0))
            stats[key] = (n + row.n, s + row.s, ss + row.ss)
    rows = []
    for key, (n, s, ss) in stats.items():
        mean = s / n
        var = (ss - n * mean * mean) / (n - 1) if n > 1 else None
        sd = float(np.sqrt(var)) if var is not None and var > 0 else np.nan
        rows.append((*key, mean, sd))
    model_df = pd.DataFrame(rows, columns=group_cols + ["__mean", "__sd"])
    mref = ray.put(model_df)

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(mref) if isinstance(mref, ray.ObjectRef) else mref
        j = df.merge(m, on=group_cols, how="left")  # C hash join, no row loop
        z = (j[value_col].to_numpy(np.float64) - j["__mean"].to_numpy(np.float64)) \
            / j["__sd"].to_numpy(np.float64)
        out = j[id_cols + group_cols + [value_col]].copy(deep=False)
        out[out_col] = stable_round(
            pa.array(z, pa.float64()), round_digits).to_numpy(zero_copy_only=False)
        return out

    return ds.select_columns(id_cols + group_cols + [value_col]).map_batches(
        _score, batch_format="pandas")


def cube_aggregate(
    ds: Dataset,
    group_cols: Sequence[str],
    value_col: str,
    num_partitions: Optional[int] = None,
) -> pa.Table:
    """SQL ``GROUP BY CUBE (a, b, …)``: COUNT(*) + SUM(value) at every
    subset of the grouping columns, absent columns NULL-filled.

    Same one-exchange design as :func:`rollup_aggregate`: only the
    finest level (all columns) aggregates through the hash exchange
    with a map-side combiner; all 2^k − 1 coarser subsets are derived
    FROM the finest aggregate on the driver — sums of sums over a table
    of O(distinct finest groups) rows. The cube therefore costs exactly
    one plain GROUP BY shuffle no matter how many subsets it emits.
    Scale bound: the finest aggregate must fit the driver (the standard
    cube assumption; a cube whose finest level is data-sized is the
    input itself).
    """
    from itertools import combinations

    group_cols = list(group_cols)
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_cols, sort=False, dropna=False)[value_col]
        out = g.agg(["count", "sum"]).reset_index()
        return out.rename(columns={"count": "n_rows", "sum": "sum_value"})

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_cols, sort=False, dropna=False)
        return g.agg(n_rows=("n_rows", "sum"), sum_value=("sum_value", "sum")).reset_index()

    pruned = ds.select_columns(group_cols + [value_col])
    finest = grouped_apply(pruned, group_cols, _reduce,
                           num_partitions=num_partitions, map_side=_combine)
    ft = pa.concat_tables(
        [b for b in finest.iter_batches(batch_format="pyarrow")]
        or [pa.table({c: pa.array([], pa.string()) for c in group_cols}
                     | {"n_rows": pa.array([], pa.int64()),
                        "sum_value": pa.array([], pa.float64())})]
    ).to_pandas()

    levels = [ft]
    for k in range(len(group_cols) - 1, -1, -1):
        for keep in combinations(group_cols, k):
            keep = list(keep)
            if keep:
                agg = ft.groupby(keep, sort=False, dropna=False).agg(
                    n_rows=("n_rows", "sum"), sum_value=("sum_value", "sum")
                ).reset_index()
            else:
                agg = pd.DataFrame({"n_rows": [ft["n_rows"].sum()],
                                    "sum_value": [ft["sum_value"].sum()]})
            for c in group_cols:
                if c not in keep:
                    agg[c] = None
            levels.append(agg[group_cols + ["n_rows", "sum_value"]])
    out = pd.concat(levels, ignore_index=True)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def grouped_corr(
    ds: Dataset,
    group_cols: Sequence[str] | str,
    x_col: str,
    y_col: str,
    out_col: str = "corr_xy",
    round_digits: int = 6,
) -> pa.Table:
    """Per-group Pearson correlation ``corr(x, y)`` from algebraic
    partials — the co-movement statistic behind feature selection and
    drift monitors.

    Scale shape: one map pass folds per-group ``(n, Σx, Σy, Σx², Σy²,
    Σxy)`` to the driver — O(groups) rows, no shuffle at all — and the
    closed form ``(nΣxy − ΣxΣy) / √((nΣx²−Σx²̂)(nΣy²−Σy²̂))`` runs once
    per group. Measured against DuckDB's streaming ``corr()`` the
    partial form agrees to ~1e-16 on the bench tables, far inside the
    shared ROUND.
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)

    def _partials(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(np.float64)
        y = df[y_col].to_numpy(np.float64)
        d = df[group_cols].copy(deep=False)
        d["__x"], d["__y"] = x, y
        d["__xx"], d["__yy"], d["__xy"] = x * x, y * y, x * y
        g = d.groupby(group_cols, sort=False)
        return g.agg(
            n=("__x", "size"), sx=("__x", "sum"), sy=("__y", "sum"),
            sxx=("__xx", "sum"), syy=("__yy", "sum"), sxy=("__xy", "sum"),
        ).reset_index()

    stats: dict = {}
    parts = ds.select_columns(group_cols + [x_col, y_col]).map_batches(
        _partials, batch_format="pandas")
    for b in parts.iter_batches(batch_format="pandas"):
        for row in b.itertuples(index=False):
            key = tuple(getattr(row, c) for c in group_cols)
            n, sx, sy, sxx, syy, sxy = stats.get(key, (0, 0.0, 0.0, 0.0, 0.0, 0.0))
            stats[key] = (n + row.n, sx + row.sx, sy + row.sy,
                          sxx + row.sxx, syy + row.syy, sxy + row.sxy)
    rows = []
    for key in sorted(stats):
        n, sx, sy, sxx, syy, sxy = stats[key]
        den = (n * sxx - sx * sx) * (n * syy - sy * sy)
        c = (n * sxy - sx * sy) / np.sqrt(den) if den > 0 else None
        rows.append((*key, n, c))
    out = pd.DataFrame(rows, columns=group_cols + ["n_rows", out_col])
    out["n_rows"] = out["n_rows"].astype(np.int64)
    tbl = pa.Table.from_pandas(out, preserve_index=False)
    idx = tbl.column_names.index(out_col)
    from kgray.kernels.hashagg import stable_round
    return tbl.set_column(idx, out_col,
                          stable_round(tbl.column(out_col).cast(pa.float64()), round_digits))


def grouped_linear_fit(
    ds: Dataset,
    group_cols: Sequence[str] | str,
    x_col: str,
    y_col: str,
    round_digits: int = 6,
) -> pa.Table:
    """Per-group simple linear regression (least squares): SQL's
    ``regr_slope(y, x)`` / ``regr_intercept(y, x)`` from the same
    algebraic partials as :func:`grouped_corr` — the distributed
    closed-form fit behind per-segment trend features.

    Scale shape: one map pass folds per-group ``(n, Σx, Σy, Σx², Σxy)``
    to the driver — O(groups), no shuffle; slope = (nΣxy − ΣxΣy) /
    (nΣx² − (Σx)²), intercept = (Σy − slope·Σx)/n.
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)

    def _partials(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(np.float64)
        y = df[y_col].to_numpy(np.float64)
        d = df[group_cols].copy(deep=False)
        d["__x"], d["__y"], d["__xx"], d["__xy"] = x, y, x * x, x * y
        g = d.groupby(group_cols, sort=False)
        return g.agg(
            n=("__x", "size"), sx=("__x", "sum"), sy=("__y", "sum"),
            sxx=("__xx", "sum"), sxy=("__xy", "sum"),
        ).reset_index()

    stats: dict = {}
    parts = ds.select_columns(group_cols + [x_col, y_col]).map_batches(
        _partials, batch_format="pandas")
    for b in parts.iter_batches(batch_format="pandas"):
        for row in b.itertuples(index=False):
            key = tuple(getattr(row, c) for c in group_cols)
            n, sx, sy, sxx, sxy = stats.get(key, (0, 0.0, 0.0, 0.0, 0.0))
            stats[key] = (n + row.n, sx + row.sx, sy + row.sy,
                          sxx + row.sxx, sxy + row.sxy)
    rows = []
    for key in sorted(stats):
        n, sx, sy, sxx, sxy = stats[key]
        den = n * sxx - sx * sx
        slope = (n * sxy - sx * sy) / den if den != 0 else None
        intercept = (sy - slope * sx) / n if slope is not None else None
        rows.append((*key, n, slope, intercept))
    out = pd.DataFrame(rows, columns=group_cols + ["n_rows", "slope", "intercept"])
    out["n_rows"] = out["n_rows"].astype(np.int64)
    tbl = pa.Table.from_pandas(out, preserve_index=False)
    from kgray.kernels.hashagg import stable_round
    for c in ("slope", "intercept"):
        idx = tbl.column_names.index(c)
        tbl = tbl.set_column(idx, c, stable_round(tbl.column(c).cast(pa.float64()),
                                                  round_digits))
    return tbl


def set_op(
    left: Dataset,
    right: Dataset,
    how: str = "intersect",
    num_partitions: Optional[int] = None,
) -> Dataset:
    """SQL set operations on whole rows: ``INTERSECT`` / ``EXCEPT``
    (both DISTINCT semantics, as in ANSI SQL). ``UNION`` needs no
    operator (``Dataset.union`` + :func:`whole-row dedup`); these two
    need co-location of equal rows from BOTH inputs, so they are one
    side-tagged hash exchange on all columns.

    Scale shape: map side pre-dedups each batch per side (combiner —
    at most one row per (side, row-value) leaves each batch), then the
    exchange co-locates equal rows; the reduce is a vectorized
    per-partition groupby on the row value. NULLs compare equal within
    a column, matching SQL set-op (NOT join) semantics.
    """
    how = how.lower()
    if how not in ("intersect", "except"):
        raise ValueError(f"set_op: how must be 'intersect' or 'except', got {how!r}")
    if num_partitions is None:
        num_partitions = auto_partitions()
    cols = dataset_schema(left).names
    rnames = dataset_schema(right).names
    if rnames != cols:
        raise ValueError(f"set_op: column mismatch {cols} vs {rnames}")
    _SIDE = "__setop_side"

    def _tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            # Map-side combiner: per-batch distinct before the shuffle.
            df = t.to_pandas().drop_duplicates()
            df[_SIDE] = np.int8(side)
            return pa.Table.from_pandas(df, preserve_index=False)
        return fn

    tagged = left.map_batches(_tag(0), batch_format="pyarrow").union(
        right.map_batches(_tag(1), batch_format="pyarrow")
    )

    def _reduce(part: pd.DataFrame) -> pd.DataFrame:
        sides = part.groupby(cols, dropna=False, sort=False)[_SIDE].agg(["min", "max"])
        if how == "intersect":
            keep = sides[(sides["min"] == 0) & (sides["max"] == 1)]
        else:
            keep = sides[sides["max"] == 0]
        return keep.reset_index()[cols]

    return grouped_apply(tagged, cols, _reduce, num_partitions=num_partitions)


def grouped_rank(
    ds: Dataset,
    key: str,
    order_col: str,
    ascending: bool = True,
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Per-group ``RANK`` and ``DENSE_RANK`` (tie-aware, unlike the
    row_number shapes in sessionize/value_rank): one exchange on
    ``key``, per-partition vectorized ``pd.Series.rank(method='min')``
    / ``rank(method='dense')`` inside each group.

    Partitioning assumption: one key's rows fit a worker's heap (the
    standard grouped-window assumption documented across this module).
    """
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _reduce(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(key, sort=False)[order_col]
        part = part.copy(deep=False)
        part["rnk"] = g.rank(method="min", ascending=ascending).astype("int64")
        part["dense_rnk"] = g.rank(method="dense", ascending=ascending).astype("int64")
        return part

    return grouped_apply(ds, [key], _reduce, num_partitions=num_partitions)


def grouped_percent_rank(
    ds: Dataset,
    key: str,
    order_col: str,
    ascending: bool = True,
    num_partitions: Optional[int] = None,
    round_digits: int = 6,
) -> Dataset:
    """Per-group ``PERCENT_RANK`` and ``CUME_DIST`` — the relative
    window ranks: ``percent_rank = (RANK − 1) / (n − 1)`` (0 for a
    singleton group, SQL's convention) and ``cume_dist = (# peers ≤
    current) / n`` (= tie-aware ``rank(method='max') / n``).

    Same shape as :func:`grouped_rank`: one exchange on ``key``,
    per-partition C-speed ``pd.Series.rank``; group sizes from one
    ``transform('size')``. Partitioning assumption: one key's rows fit
    a worker's heap.
    """
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _reduce(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(key, sort=False)[order_col]
        n = part.groupby(key, sort=False)[order_col].transform("size").to_numpy(np.float64)
        rnk_min = g.rank(method="min", ascending=ascending).to_numpy(np.float64)
        rnk_max = g.rank(method="max", ascending=ascending).to_numpy(np.float64)
        part = part.copy(deep=False)
        denom = np.maximum(n - 1.0, 1.0)  # singleton group → percent_rank 0
        part["pct_rank"] = np.round((rnk_min - 1.0) / denom, round_digits)
        part["cume_dist"] = np.round(rnk_max / n, round_digits)
        return part

    return grouped_apply(ds, [key], _reduce, num_partitions=num_partitions)


def grouped_ntile(
    ds: Dataset,
    key: str,
    order_col: str,
    n: int,
    tie_col: Optional[str] = None,
    bucket_col: str = "bucket",
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Per-group ``NTILE(n)`` — the last member of the grouped window
    family (rank / dense_rank / percent_rank / cume_dist live in the
    sibling functions; the GLOBAL ntile is ``split.ntile``).

    SQL semantics: within each group, rows ordered by ``(order_col,
    tie_col)`` land in buckets 1..n where the first ``size % n``
    buckets get ``ceil(size/n)`` rows. Same shape as
    :func:`grouped_rank`: one exchange on ``key``, vectorized closed
    form per partition. Partitioning assumption: one key's rows fit a
    worker's heap (the standard grouped-window assumption).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if num_partitions is None:
        num_partitions = auto_partitions()
    order = [order_col] + ([tie_col] if tie_col else [])

    def _reduce(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values([key] + order, kind="mergesort")
        sizes = part.groupby(key, sort=False)[order_col].transform("size") \
                    .to_numpy(np.int64)
        pos = part.groupby(key, sort=False).cumcount().to_numpy(np.int64)
        size_small, n_big = np.divmod(sizes, n)
        size_big = size_small + 1
        cutoff = n_big * size_big
        part = part.copy(deep=False)
        part[bucket_col] = np.where(
            pos < cutoff,
            pos // np.maximum(size_big, 1),
            n_big + (pos - cutoff) // np.maximum(size_small, 1),
        ).astype(np.int64) + 1
        return part

    return grouped_apply(ds, [key], _reduce, num_partitions=num_partitions)


def _skyline_pairs(x: np.ndarray, y: np.ndarray) -> tuple:
    """Pareto frontier of 2-D points (both dims MAX-oriented): the
    distinct (x, y) pairs not dominated (x' ≥ x ∧ y' ≥ y, one strict).
    Classic sort-scan: collapse to per-x max y, sort x descending, keep
    while y strictly exceeds the running max. O(n log n), fully
    vectorized, returns x strictly descending / y strictly ascending.
    """
    if len(x) == 0:
        return x, y
    order = np.lexsort((-y, -x))  # x desc, y desc within ties
    xs, ys = x[order], y[order]
    first = np.concatenate([[True], xs[1:] != xs[:-1]])  # per-x max y
    xs, ys = xs[first], ys[first]
    run = np.maximum.accumulate(ys)
    keep = np.concatenate([[True], ys[1:] > run[:-1]])
    return xs[keep], ys[keep]


def skyline(
    ds: Dataset,
    x_col: str,
    y_col: str,
    x_dir: str = "min",
    y_dir: str = "max",
) -> Dataset:
    """2-criteria Pareto frontier (skyline): the rows no other row
    dominates — SQL's ``NOT EXISTS`` dominance anti-join, which is
    O(n²) as written; here it is two linear passes.

    Scale shape: (1) map-side local skyline per batch — the skyline of
    a union is contained in the union of the per-part skylines, so the
    frontier candidates shrink to O(batches · |local frontier|) rows
    before anything moves; (2) the tiny candidate union reduces to the
    global frontier pairs on the driver (same documented small-side
    pattern as weighted_sample's top-k merge); (3) the frontier pairs
    broadcast back (``ray.put`` once) and one map-only pass keeps the
    rows whose pair sits on the frontier (membership via searchsorted —
    a row is undominated iff its (x, y) is a frontier pair, since any
    dominator is itself dominated by a frontier point). NULL rows in
    either criterion are dropped up front (three-valued-logic dominance
    is undefined; mirror the filter in the oracle).
    """
    sx = -1.0 if x_dir == "min" else 1.0
    sy = -1.0 if y_dir == "min" else 1.0

    def _local(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column(x_col)), pc.is_valid(t.column(y_col)))
        )
        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64) * sx
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64) * sy
        kx, ky = _skyline_pairs(x, y)
        return pa.table({"__sx": pa.array(kx), "__sy": pa.array(ky)})

    cand = ds.map_batches(_local, batch_format="pyarrow").take_all()
    cx = np.array([r["__sx"] for r in cand], dtype=np.float64)
    cy = np.array([r["__sy"] for r in cand], dtype=np.float64)
    fx, fy = _skyline_pairs(cx, cy)
    # Frontier x strictly descending → flip for searchsorted membership.
    pairs_ref = ray.put((fx[::-1].copy(), fy[::-1].copy()))

    def _filter(t: pa.Table) -> pa.Table:
        gx, gy = ray.get(pairs_ref)
        if len(t) == 0 or len(gx) == 0:
            return t.slice(0, 0)
        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64) * sx
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64) * sy
        pos = np.searchsorted(gx, x)
        hit = (pos < len(gx)) & (gx[np.minimum(pos, len(gx) - 1)] == x)
        keep = hit & (gy[np.minimum(pos, len(gx) - 1)] == y)
        valid = pc.and_(pc.is_valid(t.column(x_col)), pc.is_valid(t.column(y_col)))
        keep = keep & valid.to_numpy(zero_copy_only=False)
        return t.filter(pa.array(keep))

    return ds.map_batches(_filter, batch_format="pyarrow")


def max_by(
    ds: Dataset,
    key: str,
    order_cols: Sequence[str],
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Per-group ARGMAX row (SQL ``arg_max`` / ``ROW_NUMBER ... DESC =
    1``) with a deterministic lexicographic tie-break over
    ``order_cols`` — give it a unique final column and the winner is
    total-order unique.

    NULL semantics match the SQL ``ORDER BY ... DESC`` under DuckDB's
    default NULLS LAST: a NULL in any order column sorts as SMALLEST,
    so it can never beat a non-null value (pandas would otherwise place
    NaN last regardless of direction and let it win the argmax). A key
    whose rows are all-NULL in the leading order column still emits its
    rn=1 row, tie-broken by the remaining columns.

    Scale shape: the per-batch best-row-per-key partial is the SAME
    idempotent kernel as the reduce (a monoid), so only O(groups) rows
    per batch enter the exchange — unlike ``top_n_per_group`` this
    never moves more than one row per (batch, key).
    """
    order_cols = list(order_cols)
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _best(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        df = df.sort_values([key] + order_cols, kind="mergesort",
                            na_position="first")
        return df.drop_duplicates(subset=[key], keep="last")

    return grouped_apply(ds, [key], _best, num_partitions=num_partitions,
                         map_side=_best)


def min_by(
    ds: Dataset,
    key: str,
    order_cols: Sequence[str],
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Per-group ARGMIN row (SQL ``arg_min`` / ``ROW_NUMBER ... ASC =
    1``) — the mirror of :func:`max_by`, same O(groups)-partial monoid
    (one row per (batch, key) enters the exchange).

    NULL semantics match ``ORDER BY ... ASC`` under DuckDB's default
    NULLS LAST: a NULL in an order column sorts as LARGEST, so it can
    never beat a non-null value for the argmin; an all-NULL key still
    emits its rn=1 row, tie-broken by the remaining columns.
    """
    order_cols = list(order_cols)
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _best(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        df = df.sort_values([key] + order_cols, kind="mergesort",
                            na_position="last")
        return df.drop_duplicates(subset=[key], keep="first")

    return grouped_apply(ds, [key], _best, num_partitions=num_partitions,
                         map_side=_best)


def grouped_covar(
    ds: Dataset,
    group_cols: Sequence[str] | str,
    x_col: str,
    y_col: str,
    round_digits: int = 6,
) -> pa.Table:
    """Per-group sample AND population covariance from mergeable
    ``(n, mean_x, mean_y, C)`` partials, where ``C = Σ(x−x̄)(y−ȳ)`` —
    the numerically robust parallel form (Chan/Golub/LeVeque pairwise
    merge), not the cancellation-prone ``Σxy − ΣxΣy/n`` raw-moment
    fold: partials center within each batch, and the driver merge adds
    the exact cross-term ``Δx·Δy·n_a·n_b/(n_a+n_b)``.

    Scale shape: identical to :func:`grouped_corr` — one map pass
    folds O(groups) partial rows to the driver, no shuffle at all.
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)

    def _partials(df: pd.DataFrame) -> pd.DataFrame:
        d = df[group_cols].copy(deep=False)
        d["__x"] = df[x_col].to_numpy(np.float64)
        d["__y"] = df[y_col].to_numpy(np.float64)
        g = d.groupby(group_cols, sort=False)
        d["__c"] = ((d["__x"] - g["__x"].transform("mean"))
                    * (d["__y"] - g["__y"].transform("mean")))
        out = g.agg(n=("__x", "size"), mx=("__x", "mean"), my=("__y", "mean"))
        out["c"] = d.groupby(group_cols, sort=False)["__c"].sum()
        return out.reset_index()

    stats: dict = {}
    parts = ds.select_columns(group_cols + [x_col, y_col]).map_batches(
        _partials, batch_format="pandas")
    for b in parts.iter_batches(batch_format="pandas"):
        for row in b.itertuples(index=False):
            key = tuple(getattr(row, c) for c in group_cols)
            if key not in stats:
                stats[key] = (int(row.n), row.mx, row.my, row.c)
                continue
            n0, mx0, my0, c0 = stats[key]
            n1 = int(row.n)
            n = n0 + n1
            dx, dy = row.mx - mx0, row.my - my0
            stats[key] = (n,
                          mx0 + dx * n1 / n,
                          my0 + dy * n1 / n,
                          c0 + row.c + dx * dy * n0 * n1 / n)
    rows = []
    for key in sorted(stats):
        n, _, _, c = stats[key]
        rows.append((*key, n, c / (n - 1) if n > 1 else None, c / n))
    out = pd.DataFrame(rows, columns=group_cols + ["n_rows", "covar_samp",
                                                   "covar_pop"])
    out["n_rows"] = out["n_rows"].astype(np.int64)
    tbl = pa.Table.from_pandas(out, preserve_index=False)
    from kgray.kernels.hashagg import stable_round
    for col in ("covar_samp", "covar_pop"):
        idx = tbl.column_names.index(col)
        tbl = tbl.set_column(
            idx, col, stable_round(tbl.column(col).cast(pa.float64()),
                                   round_digits))
    return tbl


def _co_moment_merge(a: tuple, b: tuple) -> tuple:
    """Pairwise merge of centered co-moment partials
    ``(n, mx, my, Cxx, Cyy, Cxy)`` (Chan et al.) — exact cross terms,
    no raw-moment cancellation."""
    n0, mx0, my0, cxx0, cyy0, cxy0 = a
    n1, mx1, my1, cxx1, cyy1, cxy1 = b
    n = n0 + n1
    dx, dy = mx1 - mx0, my1 - my0
    f = n0 * n1 / n
    return (n, mx0 + dx * n1 / n, my0 + dy * n1 / n,
            cxx0 + cxx1 + dx * dx * f,
            cyy0 + cyy1 + dy * dy * f,
            cxy0 + cxy1 + dx * dy * f)


def spearman_corr(
    ds: Dataset,
    x_col: str,
    y_col: str,
    id_col: Optional[str] = None,
    round_digits: int = 6,
    distinct_limit: int = 2_000_000,
    num_partitions: Optional[int] = None,
) -> pa.Table:
    """Global Spearman rank correlation with SQL average-rank tie
    handling (``RANK() + (tie_count − 1) / 2``) — the monotone-
    association statistic behind feature screening and drift monitors.
    Rows with a NULL in either column are excluded (mirror in SQL).

    Size-switched like the rest of the engine:

    * **broadcast path** (combined distinct values ≤ ``distinct_limit``):
      one combiner-fronted map pass folds both per-value histograms to
      the driver (O(distinct) rows), the value→average-rank maps come
      from prefix sums over the sorted distinct values, broadcast once
      via ``ray.put``, and ONE more map pass emits centered co-moment
      partials — zero shuffles.
    * **distributed path** (above the limit): per column,
      ``split.range_rank`` assigns exact global row numbers (boundary-
      sampled, never a global sort); a per-value grouped mean turns
      them into average ranks (the mean of a tie run's consecutive row
      numbers IS the SQL average rank); two hash joins pair the
      per-row ranks back up on ``id_col`` (required here: unique,
      non-null). Exchanges are O(rows) on value/id — no structure
      sized O(distinct) ever lands on one worker or the driver.

    Both paths fold the same ``(n, mx, my, Cxx, Cyy, Cxy)`` centered
    partials (pairwise merge) and emit one row ``(n_rows, spearman)``.
    """
    cols = [x_col, y_col] + ([id_col] if id_col else [])

    def _flt(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(pc.is_valid(t.column(x_col)),
                                pc.is_valid(t.column(y_col))))

    src = ds.select_columns(cols).map_batches(_flt, batch_format="pyarrow")

    def _hist(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for tag, col in (("x", x_col), ("y", y_col)):
            vc = df[col].value_counts()
            out.append(pd.DataFrame({
                "t": tag,
                "v": vc.index.to_numpy(np.float64),
                "c": vc.to_numpy(np.int64)}))
        return pd.concat(out, ignore_index=True)

    # Vectorized, MEMORY-BOUNDED driver fold of the per-batch
    # histograms: buffer partial frames, refold with one groupby-sum C
    # pass whenever the buffer exceeds ~4× the limit, and bail to the
    # distributed path as soon as the folded distinct count crosses
    # distinct_limit — the driver never holds more than O(limit) rows
    # and never runs a per-row Python loop.
    frames: list = []
    buffered = 0
    small = True

    def _refold() -> pd.DataFrame:
        return (pd.concat(frames, ignore_index=True)
                .groupby(["t", "v"], sort=False)["c"].sum().reset_index())

    for b in src.map_batches(_hist, batch_format="pandas").iter_batches(
            batch_format="pandas"):
        frames.append(b)
        buffered += len(b)
        if buffered > 4 * distinct_limit:
            frames = [_refold()]
            buffered = len(frames[0])
            if buffered > distinct_limit:
                small = False
                break
    if small:
        folded = _refold()
        small = len(folded) <= distinct_limit
        if len(folded) == 0:  # no non-null pairs at all
            return pa.table({"n_rows": pa.array([], pa.int64()),
                             "spearman": pa.array([], pa.float64())})
        agg = folded.sort_values("v").set_index(["t", "v"])["c"]

    def _partials(df: pd.DataFrame, rx: np.ndarray, ry: np.ndarray
                  ) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(columns=["n", "mx", "my", "cxx", "cyy",
                                         "cxy"])
        mx, my = rx.mean(), ry.mean()
        dx, dy = rx - mx, ry - my
        return pd.DataFrame({"n": [len(df)], "mx": [mx], "my": [my],
                             "cxx": [(dx * dx).sum()],
                             "cyy": [(dy * dy).sum()],
                             "cxy": [(dx * dy).sum()]})

    if small:
        maps = {}
        for tag in ("x", "y"):
            s = agg.loc[tag]  # sorted by value (groupby sort=True)
            vals = s.index.to_numpy(np.float64)
            cnts = s.to_numpy(np.int64)
            prev = np.concatenate([[0], np.cumsum(cnts)[:-1]])
            maps[tag] = (vals, prev + (cnts + 1) / 2.0)  # 1-based avg rank
        mref = ray.put(maps)

        def _score(df: pd.DataFrame) -> pd.DataFrame:
            m = ray.get(mref) if not isinstance(mref, dict) else mref
            vx, ax = m["x"]
            vy, ay = m["y"]
            rx = ax[np.searchsorted(vx, df[x_col].to_numpy(np.float64))]
            ry = ay[np.searchsorted(vy, df[y_col].to_numpy(np.float64))]
            return _partials(df, rx, ry)

        parts = src.map_batches(_score, batch_format="pandas")
    else:
        if id_col is None:
            raise ValueError(
                f"spearman_corr: distinct values exceed distinct_limit="
                f"{distinct_limit}; the distributed path needs a unique "
                f"id_col to pair per-row ranks")
        from kgray.stages.split import range_rank

        if num_partitions is None:
            num_partitions = auto_partitions()
        flt = src.materialize()  # 2-3 pruned columns, consumed 2×

        sides = {}
        for col in (x_col, y_col):
            rr = range_rank(flt.select_columns([id_col, col]),
                            value_col=col, id_col=id_col,
                            num_partitions=num_partitions)

            def _vp(df: pd.DataFrame, _c=col) -> pd.DataFrame:
                g = df.groupby(_c, sort=False)["rnk"]
                return g.agg(s="sum", c="size").reset_index()

            def _ar(df: pd.DataFrame, _c=col) -> pd.DataFrame:
                g = df.groupby(_c, sort=False)[["s", "c"]].sum()
                # mean of a tie run's consecutive 0-based row numbers,
                # +1 → the SQL 1-based average rank
                return pd.DataFrame({
                    _c: g.index.to_numpy(),
                    f"__ar_{_c}": (g["s"] / g["c"] + 1.0).to_numpy()})

            avg = grouped_apply(
                rr.map_batches(_vp, batch_format="pandas"), [col], _ar,
                num_partitions=num_partitions)
            sides[col] = hash_join(
                rr, avg, on=col, num_partitions=num_partitions,
            ).select_columns([id_col, f"__ar_{col}"])

        paired = hash_join(sides[x_col], sides[y_col], on=id_col,
                           num_partitions=num_partitions)

        def _score_j(df: pd.DataFrame) -> pd.DataFrame:
            return _partials(df, df[f"__ar_{x_col}"].to_numpy(np.float64),
                             df[f"__ar_{y_col}"].to_numpy(np.float64))

        parts = paired.map_batches(_score_j, batch_format="pandas")

    acc = None
    for b in parts.iter_batches(batch_format="pandas"):
        for row in b.itertuples(index=False):
            cur = (int(row.n), row.mx, row.my, row.cxx, row.cyy, row.cxy)
            acc = cur if acc is None else _co_moment_merge(acc, cur)
    if acc is None:
        return pa.table({"n_rows": pa.array([], pa.int64()),
                         "spearman": pa.array([], pa.float64())})
    n, _, _, cxx, cyy, cxy = acc
    den = np.sqrt(cxx * cyy)
    rho = float(cxy / den) if den > 0 else None
    tbl = pa.table({"n_rows": pa.array([n], pa.int64()),
                    "spearman": pa.array([rho], pa.float64())})
    from kgray.kernels.hashagg import stable_round
    return tbl.set_column(1, "spearman",
                          stable_round(tbl.column("spearman"), round_digits))


def unpivot(
    ds: Dataset,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "measure",
    value_name: str = "value",
) -> Dataset:
    """Wide → long melt (SQL UNPIVOT / UNION ALL of per-column
    selects): one output row per (input row, value column), measures
    cast to float64 into one column. Map-only, zero shuffle — the loop
    is over the handful of value columns, never over rows."""
    id_cols, value_cols = list(id_cols), list(value_cols)

    def _melt(t: pa.Table) -> pa.Table:
        out = []
        for c in value_cols:
            cols = {ic: t.column(ic) for ic in id_cols}
            cols[var_name] = pa.array([c] * len(t), pa.string())
            cols[value_name] = pc.cast(t.column(c), pa.float64())
            out.append(pa.table(cols))
        return pa.concat_tables(out)

    return ds.map_batches(_melt, batch_format="pyarrow")


def explode_list(
    ds: Dataset,
    id_cols: Sequence[str],
    list_col: str,
    pos_col: str = "pos",
    value_col: str = "val",
) -> Dataset:
    """UNNEST WITH ORDINALITY: one output row per list element, with
    its 0-based position. Map-only, zero-copy flatten: the Arrow list
    column's values buffer IS the output value column; ids come from
    one ``np.repeat`` over the offsets, positions from one arange
    subtraction — no per-row Python, no shuffle. NULL lists and empty
    lists emit no rows (SQL UNNEST semantics)."""
    id_cols = list(id_cols)

    def _ex(t: pa.Table) -> pa.Table:
        arr = t.column(list_col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        off = arr.offsets.to_numpy().astype(np.int64)
        counts = np.diff(off)
        # NULL lists emit no rows; their offset spans (which MAY still
        # advance in Arrow) are excluded by indexing values explicitly.
        if arr.null_count:
            valid = ~np.asarray(arr.is_null())
            counts = np.where(valid, counts, 0)
        total = int(counts.sum())
        row = np.repeat(np.arange(len(t), dtype=np.int64), counts)
        pos = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts)
        val_idx = np.repeat(off[:-1], counts) + pos
        cols = {c: t.column(c).take(pa.array(row)) for c in id_cols}
        cols[pos_col] = pa.array(pos)
        cols[value_col] = arr.values.take(pa.array(val_idx))
        return pa.table(cols)

    return ds.map_batches(_ex, batch_format="pyarrow")


def first_last_by(
    ds: Dataset,
    key: str,
    order_cols: Sequence[str],
    value_col: str,
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Per-group FIRST_VALUE and LAST_VALUE of ``value_col`` in
    ``order_cols`` order (full-frame window semantics, deterministic
    when the order is total — give it a unique final column).

    NULL semantics: ascending order with NULLS LAST (DuckDB's default
    for ``ORDER BY ... ASC`` — and pandas' default NaN placement, kept
    deliberately): a NULL order value sorts LARGEST, so it can claim
    LAST_VALUE but never FIRST_VALUE, exactly as the ROW_NUMBER oracle
    ranks it.

    Same O(groups)-partial monoid shape as :func:`max_by`: each batch
    keeps only its per-key first+last rows, the exchange moves ≤ 2 rows
    per (batch, key), the reduce re-applies the same kernel and emits
    one ``(key, first_value, last_value)`` row per group.
    """
    order_cols = list(order_cols)
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _ends(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        df = df.sort_values([key] + order_cols, kind="mergesort")
        first = df.drop_duplicates(subset=[key], keep="first")
        last = df.drop_duplicates(subset=[key], keep="last")
        return pd.concat([first, last], ignore_index=True).drop_duplicates()

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            # Empty block keeps the value column's NATIVE dtype — a
            # hardcoded float64 would conflict with non-empty blocks
            # for int/string value columns (the _BandEmitter lesson).
            return pd.DataFrame({key: df[key],
                                 "first_value": df[value_col],
                                 "last_value": df[value_col]})
        df = df.sort_values([key] + order_cols, kind="mergesort")
        g = df.groupby(key, sort=False)[value_col]
        return pd.DataFrame({
            key: df.drop_duplicates(subset=[key])[key].to_numpy(),
            "first_value": g.first().to_numpy(),
            "last_value": g.last().to_numpy(),
        })

    return grouped_apply(ds, [key], _reduce, num_partitions=num_partitions,
                         map_side=_ends)


def string_agg_by(
    ds: Dataset,
    key: str,
    value_col: str,
    order_cols: Sequence[str],
    sep: str = "|",
    out_col: str = "agg",
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Per-group ORDERED string concatenation (SQL ``string_agg(v, sep
    ORDER BY ...)``) — give ``order_cols`` a unique final column and the
    output is total-order deterministic.

    One key-hash exchange moves ``(key, order_cols, value)`` rows; the
    reduce sorts its whole partition once (C mergesort) and joins each
    group's values via one vectorized offset pass (np.add.reduceat-
    style building through ''.join over precomputed slices — no
    per-group Python re-dispatch beyond the final join calls). Ordered
    concat is NOT a monoid without carrying the order key, so there is
    deliberately no map-side combiner — the rows must meet sorted.
    """
    order_cols = list(order_cols)
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _agg(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: df[key], out_col: df[value_col]})
        df = df.sort_values([key] + order_cols, kind="mergesort")
        vals = df[value_col].astype(str).to_numpy()
        keys = df[key].to_numpy()
        starts = np.concatenate([[0], 1 + np.flatnonzero(keys[1:] != keys[:-1])])
        ends = np.concatenate([starts[1:], [len(keys)]])
        return pd.DataFrame({
            key: keys[starts],
            out_col: [sep.join(vals[s:e]) for s, e in zip(starts, ends)],
        })

    pruned = ds.select_columns([key] + order_cols + [value_col])
    return grouped_apply(pruned, [key], _agg, num_partitions=num_partitions)


def percentile_disc_by(
    ds: Dataset,
    key: str,
    value_col: str,
    qs: Sequence[float] = (0.5,),
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Per-group DISCRETE percentile (SQL ``quantile_disc`` /
    ``percentile_disc``): the element at 1-based rank ``ceil(q·n)`` of
    the sorted group — always an actual group member, never an
    interpolation. One key-hash exchange; the reduce sorts its
    partition once and gathers every (group, q) answer with pure index
    arithmetic over the group offsets."""
    qs = [float(q) for q in qs]
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _disc(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: df[key], "q": pd.Series(dtype="float64"),
                                 "value": df[value_col]})
        df = df.sort_values([key, value_col], kind="mergesort")
        keys = df[key].to_numpy()
        vals = df[value_col].to_numpy()
        starts = np.concatenate([[0], 1 + np.flatnonzero(keys[1:] != keys[:-1])])
        ends = np.concatenate([starts[1:], [len(keys)]])
        n = ends - starts
        out_k, out_q, out_v = [], [], []
        for q in qs:
            # epsilon guards the exact-integer products against float
            # drift (0.7·10 must stay rank 7, not ceil to 8)
            idx = starts + np.maximum(
                np.ceil(q * n - 1e-9).astype(np.int64), 1) - 1
            out_k.append(keys[starts])
            out_q.append(np.full(len(starts), q))
            out_v.append(vals[idx])
        return pd.DataFrame({key: np.concatenate(out_k),
                             "q": np.concatenate(out_q),
                             "value": np.concatenate(out_v)})

    pruned = ds.select_columns([key, value_col])
    return grouped_apply(pruned, [key], _disc, num_partitions=num_partitions)


def cume_dist_by(
    ds: Dataset,
    key: str,
    value_col: str,
    out_col: str = "cd",
    round_digits: int = 6,
    num_partitions: Optional[int] = None,
) -> Dataset:
    """SQL ``CUME_DIST() OVER (PARTITION BY key ORDER BY value)``: for
    each row, (number of peers with value ≤ its value) / group size —
    ties share one value (the count of the LAST peer in the tie). One
    key-hash exchange; the reduce sorts once and resolves every tie
    block with one reverse-cummax over the run-end positions."""
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _cd(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            out = df.copy()
            out[out_col] = pd.Series(dtype="float64")
            return out
        df = df.sort_values([key, value_col], kind="mergesort").reset_index(drop=True)
        keys = df[key].to_numpy()
        vals = df[value_col].to_numpy()
        m = len(df)
        gstart = np.concatenate([[0], 1 + np.flatnonzero(keys[1:] != keys[:-1])])
        gid = np.zeros(m, np.int64)
        gid[gstart] = 1
        gid = np.cumsum(gid) - 1
        gends = np.concatenate([gstart[1:], [m]])
        n = (gends - gstart)[gid].astype(np.float64)
        # position of the LAST row of each tie run, +1 = "<= count"
        new_run = np.ones(m, bool)
        new_run[1:] = (vals[1:] != vals[:-1]) | (keys[1:] != keys[:-1])
        run_id = np.cumsum(new_run) - 1
        run_last = np.zeros(run_id[-1] + 1, np.int64)
        np.maximum.at(run_last, run_id, np.arange(m))
        le_count = (run_last[run_id] + 1 - gstart[gid]).astype(np.float64)
        out = df
        out[out_col] = np.round(le_count / n, round_digits)
        return out

    pruned = ds.select_columns([key, value_col])
    return grouped_apply(pruned, [key], _cd, num_partitions=num_partitions)


def profile_columns(
    ds: Dataset,
    columns: Sequence[str],
    num_partitions: Optional[int] = None,
) -> "pd.DataFrame":
    """Data-profiling summary — one row per column: ``(column, n_rows,
    n_null, n_distinct, min_str, max_str)`` with min/max computed on
    the NATIVE type first and then rendered as strings (ISO dates,
    repr'd numbers — matching SQL ``CAST(MIN(col) AS VARCHAR)``).

    Scale shape: null counts and native min/max are algebraic partials
    (O(columns) rows per batch, driver fold); the exact distinct counts
    ride ONE melted exchange — every batch emits its DISTINCT
    ``(column, value-as-string)`` pairs (map-side combine), the reduce
    deduplicates and counts per column. Shuffle volume is O(distinct
    pairs), never O(rows × columns).
    """
    import pyarrow.compute as _pc

    from kgray.kernels.hashagg import auto_partitions, grouped_apply

    columns = list(columns)
    if num_partitions is None:
        num_partitions = auto_partitions()
    pruned = ds.select_columns(columns)

    # ---- algebraic partials: n_rows / n_null / native min / max --------
    # Per-batch extrema are pickled NATIVE values (type-agnostic binary
    # column); the driver fold compares natively and renders to string
    # once at the end.  Folding on the rendered strings would give
    # lexicographic results for numeric columns (max('9999','60000') =
    # '9999').
    import pickle as _pkl

    def _stats(t: pa.Table) -> pa.Table:
        rows = []
        for c in columns:
            col = t.column(c)
            mn = _pc.min(col).as_py()
            mx = _pc.max(col).as_py()
            rows.append({
                "column": c,
                "n_rows": len(t),
                "n_null": col.null_count,
                "min_pkl": None if mn is None else _pkl.dumps(mn),
                "max_pkl": None if mx is None else _pkl.dumps(mx),
            })
        return pa.Table.from_pylist(rows)

    agg: dict = {}
    for b in pruned.map_batches(_stats, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for r in b.to_pylist():
            a = agg.setdefault(r["column"], {"n_rows": 0, "n_null": 0,
                                             "min": None, "max": None})
            a["n_rows"] += r["n_rows"]
            a["n_null"] += r["n_null"]
            for pk, k, op in (("min_pkl", "min", min), ("max_pkl", "max", max)):
                if r[pk] is not None:
                    v = _pkl.loads(r[pk])
                    a[k] = v if a[k] is None else op(a[k], v)
    for a in agg.values():
        a["min_str"] = None if a["min"] is None else str(a["min"])
        a["max_str"] = None if a["max"] is None else str(a["max"])

    # ---- exact distinct: one melted (column, value) exchange ------------
    def _melt(t: pa.Table) -> pa.Table:
        cols, vals = [], []
        for c in columns:
            v = _pc.unique(_pc.cast(t.column(c), pa.string()).drop_null())
            cols.append(pa.array([c] * len(v), pa.string()))
            vals.append(v)
        return pa.table({"column": pa.chunked_array(cols),
                         "value": pa.chunked_array([v if isinstance(v, pa.Array)
                                                    else v.combine_chunks()
                                                    for v in vals])})

    def _dd(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["column", "value"])

    def _count(df: pd.DataFrame) -> pd.DataFrame:
        df = _dd(df)
        return df.groupby("column", as_index=False, sort=False).size().rename(
            columns={"size": "n_distinct"})

    parts = grouped_apply(pruned.map_batches(_melt, batch_format="pyarrow"),
                          ["column", "value"], _count,
                          num_partitions=num_partitions, map_side=_dd).to_pandas()
    nd = parts.groupby("column")["n_distinct"].sum().to_dict()

    out = pd.DataFrame([
        {"column": c, "n_rows": agg.get(c, {}).get("n_rows", 0),
         "n_null": agg.get(c, {}).get("n_null", 0),
         "n_distinct": int(nd.get(c, 0)),
         "min_str": agg.get(c, {}).get("min_str"),
         "max_str": agg.get(c, {}).get("max_str")}
        for c in columns
    ])
    return out
