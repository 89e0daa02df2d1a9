"""Event-stream analytics operators: windowed-frame moving average,
daily-active-users, retention cohorts, per-group mode.

These are the sequential/behavioral analytics a web-scale event table
needs next to the window family already in ``pipelines/queries.py``
(sessionize / gap / tumbling / sliding / funnel / lead-lag). Shared
scale shape: ONE hash exchange on the entity key (every row of a user
lands in one partition), vectorized pandas/numpy inside the partition,
partial aggregation (combiners) on the map side wherever the reduce is
algebraic — no driver-side row loops, no full materialization.

Reference anchor: the reference engine exposes its analytics through
SQL over DuckDB (kg-microbe-merge `duckdb_utils.py` query builders);
here each is a first-class distributed operator with the identical SQL
kept as the oracle.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from kgray.kernels.hashagg import auto_partitions, grouped_apply, stable_round

__all__ = [
    "grouped_moving_avg",
    "daily_active_users",
    "retention_cohorts",
    "mode_per_group",
    "range_window_agg",
    "merge_intervals",
    "window_dedup",
    "grouped_ewma",
    "rolling_zscore",
    "cumulative_users",
]

_US_PER_DAY = 86_400_000_000


def _epoch_days(ts: pd.Series) -> np.ndarray:
    """timestamp[us] → int64 epoch days (floor), vectorized."""
    return (ts.to_numpy().astype("datetime64[us]").view("int64") // _US_PER_DAY).astype(np.int64)


def grouped_moving_avg(
    ds: Dataset,
    key: str,
    order_cols: Sequence[str],
    value_col: str,
    window: int = 3,
    out_col: str = "mavg",
    round_digits: int = 4,
    num_partitions: Optional[int] = None,
) -> Dataset:
    """ROWS-frame moving average: SQL ``AVG(value) OVER (PARTITION BY
    key ORDER BY order_cols ROWS BETWEEN window-1 PRECEDING AND CURRENT
    ROW)`` — the per-entity feature every sequential / time-series
    training set wants (short-horizon behavior smoothing).

    Scale shape: one hash exchange on ``key`` (auto-sized), then a
    per-partition mergesort + shift-and-add — the frame sum is built
    from ``window`` explicitly shifted copies added in a FIXED order
    (matching the oracle's in-order frame sum to the last bit for small
    windows) rather than pandas' online rolling update, so the shared
    ROUND is deterministic. O(window) temporaries per partition;
    ``window`` is a constant, never data-sized.
    """
    order_cols = list(order_cols)
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, *order_cols], kind="mergesort").reset_index(drop=True)
        v = df[value_col].to_numpy(np.float64)
        gid = df[key].to_numpy()
        # group-change boundary: rows before a boundary must not leak
        # into the next group's frame.
        new_grp = np.empty(len(df), dtype=bool)
        if len(df):
            new_grp[0] = True
            new_grp[1:] = gid[1:] != gid[:-1]
        pos = np.arange(len(df)) - np.maximum.accumulate(
            np.where(new_grp, np.arange(len(df)), 0)
        )
        s = v.copy()
        cnt = np.ones(len(df), dtype=np.int64)
        for k in range(1, window):
            shifted = np.empty_like(v)
            shifted[:k] = 0.0
            shifted[k:] = v[:-k]
            valid = pos >= k
            s = np.where(valid, s + shifted, s)
            cnt = np.where(valid, cnt + 1, cnt)
        out = df[[key, *order_cols, value_col]].copy(deep=False)
        out[out_col] = stable_round(
            pa.array(s / cnt, pa.float64()), round_digits
        ).to_numpy(zero_copy_only=False)
        return out

    pruned = ds.select_columns([key, *order_cols, value_col])
    return grouped_apply(pruned, [key], _score, num_partitions=num_partitions)


def daily_active_users(
    ds: Dataset,
    ts_col: str = "ts",
    user_col: str = "user_id",
    num_partitions: Optional[int] = None,
) -> Dataset:
    """DAU: per UTC day, distinct active users + total events.

    Scale shape: map side combines each batch to one row per (day,
    user) carrying a partial event count — the exchange then moves
    O(days × users) rows, not O(events); the reduce per day is an
    exact nunique + sum. Day is an int64 epoch-day so the oracle
    comparison is representation-free.
    """
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        day = _epoch_days(df[ts_col])
        g = (
            pd.DataFrame({"day": day, user_col: df[user_col]})
            .groupby(["day", user_col], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        return g

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("day", sort=False)
        out = g.agg(
            n_users=(user_col, "nunique"), n_events=("n", "sum")
        ).reset_index()
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    pruned = ds.select_columns([ts_col, user_col])
    return grouped_apply(
        pruned, ["day"], _reduce, num_partitions=num_partitions, map_side=_combine
    )


def retention_cohorts(
    ds: Dataset,
    ts_col: str = "ts",
    user_col: str = "user_id",
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Cohort retention triangle: users bucketed by first-active day
    (cohort), counted distinct at each age = day − cohort — the classic
    growth-analytics output.

    Scale shape: exchange 1 hash-partitions distinct (user, day) rows
    by user (map side pre-distincts per batch), the per-user cohort is
    a vectorized min inside the partition, and the (cohort, age, user)
    rows it emits are already distinct per user — so exchange 2 is a
    plain partial-combined count, never a distinct over raw events.
    """
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _days(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({user_col: df[user_col], "day": _epoch_days(df[ts_col])})
        return out.drop_duplicates()

    def _ages(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()  # across-batch duplicates of (user, day)
        cohort = df.groupby(user_col, sort=False)["day"].transform("min")
        return pd.DataFrame(
            {
                "cohort": cohort.to_numpy(np.int64),
                "age": (df["day"] - cohort).to_numpy(np.int64),
            }
        )

    pruned = ds.select_columns([ts_col, user_col])
    per_user = grouped_apply(
        pruned, [user_col], _ages, num_partitions=num_partitions, map_side=_days
    )

    def _count_combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["cohort", "age"], sort=False).size().rename("n").reset_index()
        return g

    def _count_reduce(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["cohort", "age"], sort=False)["n"].sum().rename("n_users").reset_index()
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    return grouped_apply(
        per_user,
        ["cohort", "age"],
        _count_reduce,
        num_partitions=num_partitions,
        map_side=_count_combine,
    )


def mode_per_group(
    ds: Dataset,
    key: str,
    value_col: str,
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Per-key mode (most frequent value; ties broken by smallest
    value) with its count — SQL's ``ROW_NUMBER() OVER (ORDER BY n DESC,
    value)`` idiom as a combinable aggregate.

    Scale shape: counts are algebraic, so the map side combines each
    batch to (key, value, partial n) and the exchange moves O(distinct
    pairs); the reduce sums then takes the first row per key of a
    (n DESC, value ASC) mergesort — vectorized ``drop_duplicates``,
    no per-key loop.
    """
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby([key, value_col], sort=False).size().rename("n").reset_index()
        )

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([key, value_col], sort=False)["n"].sum().reset_index()
        g = g.sort_values(
            ["n", value_col], ascending=[False, True], kind="mergesort"
        ).sort_values([key], kind="mergesort")
        out = g.drop_duplicates(subset=[key], keep="first").reset_index(drop=True)
        out = out.rename(columns={value_col: "mode_value", "n": "n_rows"})
        out["n_rows"] = out["n_rows"].astype(np.int64)
        return out

    pruned = ds.select_columns([key, value_col])
    return grouped_apply(
        pruned, [key], _reduce, num_partitions=num_partitions, map_side=_combine
    )


def event_ngrams(
    ds: Dataset,
    key: str,
    order_cols: Sequence[str],
    value_col: str,
    n: int = 3,
    k: int = 10,
    sep: str = ">",
    num_partitions: Optional[int] = None,
) -> pa.Table:
    """Top-k most frequent length-``n`` event-type sequences per the
    corpus (behavioral n-grams over each entity's time-ordered stream)
    — the sequence-mining primitive behind next-action models and
    funnel discovery. Ties break lexicographically.

    Scale shape: one hash exchange on the entity key; inside each
    partition the stream sorts once (mergesort) and the n-gram strings
    come from n shifted views joined vectorized — grams never cross an
    entity boundary. Counts then ride the same combiner-fronted
    exchange + exact per-partition top-k as ``topk_tokens``.
    """
    order_cols = list(order_cols)
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _grams(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, *order_cols], kind="mergesort").reset_index(drop=True)
        vals = df[value_col].astype(str).to_numpy(dtype=object)
        gid = df[key].to_numpy()
        gram = vals.copy()
        same = np.ones(len(df), dtype=bool)
        for j in range(1, n):
            shifted = np.empty_like(vals)
            shifted[:-j] = vals[j:]
            shifted[-j:] = ""
            gid_ok = np.zeros(len(df), dtype=bool)
            gid_ok[:-j] = gid[j:] == gid[:-j]
            same &= gid_ok
            gram = np.char.add(np.char.add(gram.astype(str), sep), shifted.astype(str))
        g = pd.DataFrame({"gram": gram[same]})
        return g.groupby("gram", sort=False).size().rename("n").reset_index()

    per_entity = grouped_apply(
        ds.select_columns([key, *order_cols, value_col]), [key], _grams,
        num_partitions=num_partitions,
    )

    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("gram", as_index=False, sort=False)["n"].sum()

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("gram", as_index=False, sort=False)["n"].sum()
        agg = agg.sort_values(["n", "gram"], ascending=[False, True], kind="mergesort")
        return agg.head(k)

    partial = grouped_apply(per_entity, ["gram"], _reduce,
                            num_partitions=num_partitions, map_side=_combine)
    top = partial.to_pandas().sort_values(
        ["n", "gram"], ascending=[False, True], kind="mergesort").head(k)
    top["n"] = top["n"].astype(np.int64)
    return pa.Table.from_pandas(top.reset_index(drop=True), preserve_index=False)


def range_window_agg(
    ds: Dataset,
    key: str,
    ts_col: str,
    window_us: int,
    value_col: Optional[str] = None,
    value_scale: float = 100.0,
    id_col: Optional[str] = None,
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Time-based RANGE-frame window aggregates: per row, COUNT and
    (optionally) SUM over the key's rows with ``ts ∈ [ts − window_us,
    ts]`` — SQL ``... OVER (PARTITION BY key ORDER BY ts RANGE BETWEEN
    <window> PRECEDING AND CURRENT ROW)``, including the equal-``ts``
    peer rows the RANGE frame (unlike ROWS) must count.

    The summed value is integerized (``floor(value·value_scale)`` as
    int64) so the frame sum is associativity-free and bit-exact against
    any SQL engine — the documented contract of this operator (a float
    RANGE sum has no canonical association across engines).

    Scale shape: one hash exchange on ``key``; per partition the frame
    bounds for EVERY row come from two global ``searchsorted`` calls on
    a group-offset-combined timestamp axis (each group shifted onto a
    disjoint numeric range — no per-group Python loop), and sums are
    prefix-sum differences on int64. Partitioning assumption: one key's
    rows fit a worker's heap.
    """
    if num_partitions is None:
        num_partitions = auto_partitions()
    out_cols = [key, ts_col] + ([id_col] if id_col else []) + (
        [value_col] if value_col else []
    )

    def _win(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            out = df[out_cols].copy()
            out["n_w"] = np.array([], dtype=np.int64)
            if value_col:
                out["sum_w"] = np.array([], dtype=np.int64)
            return out
        df = df.sort_values([key, ts_col], kind="mergesort").reset_index(drop=True)
        ts = df[ts_col].to_numpy()
        # µs normalization regardless of datetime resolution (ns inputs
        # from pd.to_datetime would silently mis-window otherwise).
        ts = ts.astype("datetime64[us]").view("int64") if ts.dtype.kind == "M" else ts.astype(np.int64)
        ts = ts - ts.min()
        gid, _ = pd.factorize(df[key], sort=False)  # sorted → groups contiguous
        span = int(ts.max()) + int(window_us) + 2
        if (int(gid.max()) + 1) * span > 2**62:
            raise ValueError(
                "range_window_agg: combined key axis would overflow int64 "
                f"(groups={gid.max()+1}, span_us={span}); widen partitioning"
            )
        comb = gid.astype(np.int64) * span + ts
        lo = np.searchsorted(comb, comb - window_us, side="left")
        hi = np.searchsorted(comb, comb, side="right")
        out = df[out_cols].copy()
        out["n_w"] = (hi - lo).astype(np.int64)
        if value_col:
            v = np.floor(df[value_col].to_numpy(np.float64) * value_scale).astype(np.int64)
            cs = np.concatenate([[0], np.cumsum(v)])
            out["sum_w"] = cs[hi] - cs[lo]
        return out

    return grouped_apply(ds, [key], _win, num_partitions=num_partitions)


def merge_intervals(
    ds: Dataset,
    key: str,
    lo_col: str,
    hi_col: str,
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Per-key coalescing of overlapping/touching intervals — the
    gaps-and-islands shape (SQL: island detection via ``lo >
    MAX(hi) OVER (... ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)``,
    then MIN/MAX/COUNT per island). Unlike ``sessionize`` (point
    events + gap), inputs here carry their own extent, so islands are
    decided against the running MAX of interval ends — an interval
    fully inside an earlier long one opens no island. Touching
    intervals (``lo == running_max_hi``) merge (strict ``>`` opens).

    Scale shape: one hash exchange on ``key``; per partition a stable
    sort + two C-speed grouped cumulative kernels (cummax + shift) find
    island boundaries for EVERY key at once, one groupby aggregates the
    islands. Partitioning assumption: one key's rows fit a worker's
    heap (the documented grouped-window assumption).
    """
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    key: df[key],
                    "start_ts": df[lo_col],
                    "end_ts": df[hi_col],
                    "n_rows": pd.Series([], dtype="int64"),
                }
            )
        df = df.sort_values([key, lo_col, hi_col], kind="mergesort").reset_index(drop=True)
        # Running MAX of interval ends within the key, EXCLUDING the
        # current row (shift) — the island test per the SQL window.
        cm = df.groupby(key, sort=False)[hi_col].cummax()
        prev_cm = cm.groupby(df[key], sort=False).shift(1)
        new_island = df[lo_col].gt(prev_cm) | prev_cm.isna()
        island = new_island.cumsum().to_numpy()
        grp = df.groupby(island, sort=False)
        return pd.DataFrame(
            {
                key: grp[key].first().to_numpy(),
                "start_ts": grp[lo_col].min().to_numpy(),
                "end_ts": grp[hi_col].max().to_numpy(),
                "n_rows": grp.size().to_numpy().astype("int64"),
            }
        )

    return grouped_apply(ds, [key], _reduce, num_partitions=num_partitions)


def window_dedup(
    ds: Dataset,
    keys: Sequence[str],
    ts_col: str,
    window_us: int,
    tiebreak_col: str,
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Debounce: drop an event when the key's previous event (by
    ``ts``, ties broken by ``tiebreak_col``) is within ``window_us`` —
    SQL ``LAG(ts) OVER (PARTITION BY keys ORDER BY ts, tiebreak)`` with
    a strict ``>`` keep rule (an exact-duplicate timestamp always
    drops). Note the window is measured to the previous ROW, not the
    previous KEPT row — the LAG definition is order-insensitive and
    SQL-checkable; a greedy kept-chain variant is not.

    One hash exchange on ``keys``; per partition a stable sort +
    vectorized shift — no per-group loop.
    """
    keys = list(keys)
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        df = df.sort_values(keys + [ts_col, tiebreak_col], kind="mergesort")
        ts = df[ts_col].to_numpy()
        # Normalize any datetime resolution (ns from pd.to_datetime, us
        # from Arrow) to MICROSECONDS — window_us is defined in µs.
        ts = ts.astype("datetime64[us]").view("int64") if ts.dtype.kind == "M" else ts.astype(np.int64)
        same_key = (df[keys] == df[keys].shift()).all(axis=1).to_numpy()
        prev_ts = np.concatenate([ts[:1], ts[:-1]])
        keep = (~same_key) | (ts - prev_ts > window_us)
        return df[keep]

    return grouped_apply(ds, keys, _reduce, num_partitions=num_partitions)


def grouped_ewma(
    ds: Dataset,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    decay: float = 0.5,
    window: int = 8,
    out_col: str = "ewma",
    round_digits: int = 4,
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Truncated exponentially-weighted moving average per key: per
    row, ``Σ decay^j · v_{t−j} / Σ decay^j`` over the last ``window``
    rows in (ts, tiebreak) order. Truncation (``j < window``) is what
    keeps it SQL-checkable: the untruncated recursion needs either a
    recursive CTE or ``POWER(decay, −rn)`` terms that overflow for long
    keys; a bounded frame is also the batch-friendly form (O(window)
    shifted adds, same shape as :func:`grouped_moving_avg`).

    One hash exchange on ``key``; per partition a mergesort + ``window``
    shifted weighted adds in fixed order. Partitioning assumption: one
    key's rows fit a worker's heap.
    """
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, tiebreak_col], kind="mergesort").reset_index(drop=True)
        v = df[value_col].to_numpy(np.float64)
        gid = df[key].to_numpy()
        new_grp = np.empty(len(df), dtype=bool)
        if len(df):
            new_grp[0] = True
            new_grp[1:] = gid[1:] != gid[:-1]
        pos = np.arange(len(df)) - np.maximum.accumulate(
            np.where(new_grp, np.arange(len(df)), 0))
        num = v.copy()
        den = np.ones(len(df), dtype=np.float64)
        for j in range(1, window):
            w = decay ** j
            shifted = np.empty_like(v)
            shifted[:j] = 0.0
            shifted[j:] = v[:-j]
            valid = pos >= j
            num = np.where(valid, num + w * shifted, num)
            den = np.where(valid, den + w, den)
        out = df.copy(deep=False)
        out[out_col] = stable_round(pa.array(num / den, pa.float64()),
                                    round_digits).to_numpy(zero_copy_only=False)
        return out

    return grouped_apply(ds, [key], _score, num_partitions=num_partitions)


def cumulative_users(
    ds: Dataset,
    ts_col: str = "ts",
    user_col: str = "user_id",
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Cumulative distinct users per UTC day (the growth curve): the
    windowed COUNT(DISTINCT) OVER (ORDER BY day) that SQL engines
    refuse or quadratic-scan, computed by the first-seen trick — a
    user contributes exactly once, on their first active day, and the
    cumulative count is a running sum of first-seen counts.

    Scale shape: map side pre-distincts (user, day) per batch; one
    exchange on user computes each user's min day vectorized; the
    per-day first-seen counts (O(days) rows) fold through a second
    tiny combiner exchange; the final cumsum runs over the O(days)
    result on one partition. Events never move twice.
    """
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _days(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({user_col: df[user_col], "day": _epoch_days(df[ts_col])})
        return out.drop_duplicates()

    def _first(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        first = df.groupby(user_col, sort=False)["day"].min().rename("day").reset_index()
        return first[["day"]].groupby("day", sort=False).size().rename("c").reset_index()

    pruned = ds.select_columns([ts_col, user_col])
    per_day = grouped_apply(pruned, [user_col], _first,
                            num_partitions=num_partitions, map_side=_days)

    def _csum_combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("day", as_index=False, sort=False)["c"].sum()

    def _csum(df: pd.DataFrame) -> pd.DataFrame:
        df = df.groupby("day", as_index=False, sort=False)["c"].sum()
        df = df.sort_values("day", kind="mergesort").reset_index(drop=True)
        return pd.DataFrame({
            "day": df["day"].astype("int64"),
            "n_users_cum": df["c"].cumsum().astype("int64"),
        })

    # O(days) rows: one partition is correct AND cheap for the scan.
    return grouped_apply(per_day, ["__all"], _csum, num_partitions=1,
                         map_side=lambda df: _csum_combine(df).assign(__all=0))


def rolling_zscore(
    ds: Dataset,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    window: int = 10,
    value_scale: float = 100.0,
    out_col: str = "z",
    round_digits: int = 6,
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Trailing-window anomaly score: each event's z-score against the
    key's PRECEDING ``window`` rows (frame excludes the current row —
    the value being scored must not contaminate its own baseline).
    NULL where the history has < 2 rows or zero variance.

    Bit-exact against SQL by construction: values integerize
    (``floor(value·scale)`` int64) so the frame's SUM / SUM-of-squares /
    COUNT are exact integers in BOTH engines; mean, sample variance and
    z then derive from identical ints via one pinned closed form —
    no float-summation-order hazard at all (the same integerization
    contract as range_window_agg). The exact-int path requires
    ``window · max(vi)² ≤ INT64_MAX`` (|vi| ≲ 9.6e8 at window=10);
    above that bound the sum-of-squares accumulates in float64 instead
    of silently wrapping — values that large exceed float64's 2^53
    integer range anyway, so the bit-exact property is already gone and
    the float path is the honest best effort.

    One hash exchange on ``key``; the frame sums are ``window`` shifted
    int64 adds — O(window) temporaries, no per-group loop.
    """
    if num_partitions is None:
        num_partitions = auto_partitions()

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, tiebreak_col],
                            kind="mergesort").reset_index(drop=True)
        vi = np.floor(df[value_col].to_numpy(np.float64) * value_scale).astype(np.int64)
        gid = df[key].to_numpy()
        new_grp = np.empty(len(df), dtype=bool)
        if len(df):
            new_grp[0] = True
            new_grp[1:] = gid[1:] != gid[:-1]
        pos = np.arange(len(df)) - np.maximum.accumulate(
            np.where(new_grp, np.arange(len(df)), 0))
        # int64 sq is exact only while window·vi² can't wrap; beyond the
        # bound switch the squares to float64 (per-term exact up to 2^53)
        # instead of silently overflowing.
        max_abs = int(np.abs(vi).max()) if len(vi) else 0
        int_exact = max_abs <= int(np.sqrt((2**63 - 1) / max(window, 1)))
        sq_dtype = np.int64 if int_exact else np.float64
        s = np.zeros(len(df), dtype=np.int64)
        sq = np.zeros(len(df), dtype=sq_dtype)
        n = np.zeros(len(df), dtype=np.int64)
        for j in range(1, window + 1):
            shifted = np.zeros(len(df), dtype=np.int64)
            shifted[j:] = vi[:-j]
            valid = pos >= j
            s = np.where(valid, s + shifted, s)
            sh = shifted if int_exact else shifted.astype(np.float64)
            sq = np.where(valid, sq + sh * sh, sq)
            n = np.where(valid, n + 1, n)
        nf = n.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = s / nf
            var = (sq - s.astype(np.float64) * s / nf) / (nf - 1.0)
            z = (vi - mean) / np.sqrt(var)
        ok = (n >= 2) & np.isfinite(z)
        out = df.copy(deep=False)
        out[out_col] = np.where(ok, np.round(z, round_digits), np.nan)
        return out

    pruned = ds.select_columns([key, ts_col, tiebreak_col, value_col])
    return grouped_apply(pruned, [key], _score, num_partitions=num_partitions)
