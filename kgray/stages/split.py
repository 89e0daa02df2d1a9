"""Deterministic dataset splitting for training pipelines.

The reference's ``holdout_split`` CLI hook is unimplemented upstream
(run.py:273 raises) — this is the operator it promises: a stable,
shuffle-free train/holdout assignment by content hash of the id, so the
same row lands in the same split on every run, on any cluster, with no
coordination. One ``map_batches`` pass; SQL-expressible
(``('0x' || substr(md5(id), 1, 8))::UBIGINT % 100``) so the driver
oracle checks it exactly.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
from ray.data import Dataset


def hash_split(
    ds: Dataset,
    id_col: str,
    holdout_pct: int = 10,
    split_col: str = "split",
    salt: str = "",
) -> Dataset:
    """Append ``split`` ∈ {'holdout', 'train'}: rows whose
    ``md5(salt + str(id))`` first-8-hex-digit value mod 100 falls below
    ``holdout_pct`` go to the holdout. Pure per-row function of the id —
    resumable, cluster-size-independent, join-free."""

    def _assign(t: pa.Table) -> pa.Table:
        # md5 is pinned by the oracle; run it once per DISTINCT id and
        # broadcast the verdicts back with a take (ids repeat across
        # epochs/shards more often than not, and the factorize +
        # boolean-select path avoids a Python branch per row).
        import numpy as np
        import pandas as pd

        ids = t.column(id_col).to_pylist()
        codes, uniques = pd.factorize(np.asarray(ids, dtype=object))
        hold = np.fromiter(
            (
                int(hashlib.md5((salt + str(i)).encode("utf-8")).hexdigest()[:8], 16) % 100
                < holdout_pct
                for i in uniques.tolist()
            ),
            dtype=bool,
            count=len(uniques),
        )
        # factorize maps None → code -1; hash str(None) for those rows
        # (same as the per-row form did).
        if (codes < 0).any():
            none_hold = (
                int(hashlib.md5((salt + str(None)).encode("utf-8")).hexdigest()[:8], 16) % 100
                < holdout_pct
            )
            per_row = hold[np.clip(codes, 0, None)]
            per_row = np.where(codes < 0, none_hold, per_row)
        else:
            per_row = hold[codes]
        labels = np.where(per_row, "holdout", "train")
        return t.append_column(split_col, pa.array(labels.tolist(), type=pa.string()))

    return ds.map_batches(_assign, batch_format="pyarrow")


def stratified_sample(
    ds: Dataset,
    strata_col: str,
    rates: dict,
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "",
) -> Dataset:
    """Deterministic per-stratum downsampling — the data-mixing
    primitive of a web-scale curation pipeline (e.g. keep 10% of 'en',
    50% of every low-resource language).

    A row survives iff ``md5(salt + str(id))`` first-8-hex mod 10000 <
    ``rates[stratum] * 10000``. Same hash family as :func:`hash_split`,
    so samples are stable across runs/clusters, nested (a 0.1 sample is
    a subset of a 0.5 sample), and disjointness with holdout splits can
    be arranged via the salt. One map_batches pass, shuffle-free; the
    md5 runs once per distinct id per batch.
    """

    def _keep(t: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        ids = t.column(id_col).to_pylist()
        codes, uniques = pd.factorize(np.asarray(ids, dtype=object))
        hv = np.fromiter(
            (
                int(hashlib.md5((salt + str(i)).encode("utf-8")).hexdigest()[:8], 16) % 10000
                for i in uniques.tolist()
            ),
            dtype=np.int64,
            count=len(uniques),
        )
        per_row = hv[np.clip(codes, 0, None)]
        strata = np.asarray(t.column(strata_col).to_pylist(), dtype=object)
        thresh = np.fromiter(
            (int(rates.get(s, default_rate) * 10000) for s in strata.tolist()),
            dtype=np.int64,
            count=len(strata),
        )
        return t.filter(pa.array(per_row < thresh))

    return ds.map_batches(_keep, batch_format="pyarrow")
