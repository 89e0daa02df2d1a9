"""Streaming pipeline WORK meters: per-stage rows-processed counters
collected during execution, zero extra passes, zero pinning.

The reference prints progress counts by re-querying its DuckDB tables
(`duckdb_utils.py:12-22` `get_table_count`, called between stages).
Here a counter actor + pass-through ``map_batches`` taps meter the
rows each stage PROCESSES as the stream flows — progress telemetry.

Semantics caveat (load-bearing): in a lazy DAG a tap counts every
CONSUMPTION — a stage whose output is read k times by downstream
operators (e.g. MinHash's band + verify passes) counts k×, and task
retries re-increment. That makes this a WORK meter (and a detector of
hidden prefix re-execution — inflation means an un-materialized fan
point), NOT an exact survivor count. For exact per-stage survivor
counts, materialize at stage boundaries and ``count()`` the pinned
blocks (curate_corpus ``count_stages=True`` does exactly this).
"""

from __future__ import annotations

from typing import Dict

import pyarrow as pa
import ray
from ray.data import Dataset


@ray.remote(num_cpus=0)
class StageCounters:
    """Tiny accumulator actor; ``num_cpus=0`` so it never competes with
    data tasks for a slot."""

    def __init__(self):
        self._c: Dict[str, int] = {}

    def incr(self, stage: str, n: int) -> None:
        self._c[stage] = self._c.get(stage, 0) + int(n)

    def get(self) -> Dict[str, int]:
        return dict(self._c)


def counted(ds: Dataset, stage: str, counters) -> Dataset:
    """Pass-through tap: adds zero-copy ``map_batches`` that fire-and-
    forget increments ``counters`` (a ``StageCounters`` handle) with
    each batch's row count under ``stage``."""

    def _tap(t: pa.Table) -> pa.Table:
        counters.incr.remote(stage, t.num_rows)
        return t

    return ds.map_batches(_tap, batch_format="pyarrow")
