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
        ids = t.column(id_col).to_pylist()
        labels = [
            "holdout"
            if int(hashlib.md5((salt + str(i)).encode("utf-8")).hexdigest()[:8], 16) % 100
            < holdout_pct
            else "train"
            for i in ids
        ]
        return t.append_column(split_col, pa.array(labels, type=pa.string()))

    return ds.map_batches(_assign, batch_format="pyarrow")
