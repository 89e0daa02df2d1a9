"""End-to-end web-corpus curation pipeline.

The composition a CCNet/C4/Gopher-style 100-TB pretraining-data run
actually executes, chained from this engine's individually-oracled
operators (each stage keeps its own `queries()` entry; this pipeline is
the product surface that strings them together the way the reference's
`merge_kg` strings together its KGX operators — reference run.py:81-135
is the analogous composed CLI pipeline):

    language-ID filter → Gopher quality rules → boilerplate removal →
    exact dedup → MinHash near-dup dedup → token counting

Scale shape: stages 1-2 and 6 are map-only (actor pool for the
stateful language tables); stage 3 is two chunk/doc-keyed exchanges;
stage 4 one digest-keyed exchange; stage 5 moves only band signatures
and verified candidate pairs. The document text crosses the wire only
where an exchange is semantically required. Two stage boundaries
checkpoint by default (``checkpoint=True`` — see
:func:`curate_corpus`): the near-dup stage consumes its input three
times, so pinning its input is strictly cheaper than re-executing the
upstream prefix per consumer, and splitting the actor-pool front from
the sort-based exchanges avoids a small-cluster scheduling deadlock.
Everything between checkpoints streams with backpressure.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data import Dataset

from kgray.stages.corpus import boilerplate_filter
from kgray.stages.dedup import exact_dedup, minhash_lsh_dedup
from kgray.stages.text import LangId, gopher_quality_batch, token_count_batch


def curate_corpus(
    ds: Dataset,
    lang: str = "en",
    boilerplate_min_docs: int = 3,
    chunk_words: int = 20,
    minhash_threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: Optional[int] = None,
    count_stages: bool = False,
    stream_counters=None,
    checkpoint: bool = True,
) -> Tuple[Dataset, Dict[str, int]]:
    """Run the full curation chain over ``(id_col, text_col)`` rows.

    Returns ``(curated, counters)`` where ``curated`` has columns
    ``(id_col, text_col, n_tokens)``.

    ``checkpoint=True`` (default) materializes two stage boundaries —
    after the map-only langid+quality front and after exact dedup.
    Both are load-bearing, not a convenience: ``minhash_lsh_dedup``
    consumes its input three times (band pass, verify semi-filter,
    survivor filter), so a fully lazy chain re-executes the whole
    upstream prefix per consumer (measured 60.5 s vs 13.1 s at
    sf0.1/32 CPUs); and separating the LangId actor pool from the
    downstream sort-based exchanges into distinct executions removes a
    real small-cluster deadlock (Ray's sort-boundary sampling blocks
    the scheduling loop while still-reserved upstream actors hold every
    CPU slot — reproduced at num_cpus=4). The pinned blocks live in the
    object store and spill to disk; at 100-TB scale prefer writing the
    boundary to partitioned parquet (a resumable checkpoint) — set
    ``checkpoint=False`` and persist externally when composing that.

    Two counting modes:
    - ``count_stages=True`` — exact survivor counts: each stage
      boundary MATERIALIZES, so the count is metadata (no prefix
      re-execution) AND later stages that consume their input more
      than once (minhash's band+verify passes, boilerplate's two
      exchanges) read the pinned blocks instead of silently re-running
      the whole upstream chain. Costs object-store residency for each
      stage's survivors — a diagnostics mode, not the 100-TB default
      (first cut re-counted lazily: O(stages²) stage executions, 60 s
      vs 13 s at sf0.1).
    - ``stream_counters=<state.metrics.StageCounters handle>`` — zero
      extra executions and zero pinning: pass-through taps meter WORK
      (rows processed; a stage consumed k times counts k×) — progress
      telemetry, not exact survivor counts (see metrics.py).
    """
    counters: Dict[str, int] = {}

    _CHECKPOINTS = ("after_quality", "after_exact_dedup")

    def _mark(stage: str, d: Dataset) -> Dataset:
        if count_stages:
            d = d.materialize()
            counters[stage] = d.count()
        elif checkpoint and stage in _CHECKPOINTS:
            d = d.materialize()
        if stream_counters is not None:
            from kgray.state.metrics import counted

            d = counted(d, stage, stream_counters)
        return d

    src = ds.select_columns([id_col, text_col])
    if count_stages:
        counters["input"] = src.count()
    if stream_counters is not None:
        src = _mark("input", src)

    # 1. language filter (stateful actor pool; tables compiled once).
    by_lang = src.map_batches(
        LangId, fn_constructor_kwargs=dict(text_col=text_col),
        batch_format="pyarrow", concurrency=(1, 4),
    ).filter(expr=f"lang_pred == '{lang}'").drop_columns(["lang_pred"])
    by_lang = _mark("after_langid", by_lang)

    # 2. Gopher quality rules (pure Arrow regex kernels, map-only).
    def _quality(t: pa.Table) -> pa.Table:
        flags = gopher_quality_batch(t, text_col=text_col, id_col=id_col)
        return t.filter(pc.equal(flags.column("keep"), 1)).select([id_col, text_col])

    quality = _mark("after_quality", by_lang.map_batches(_quality, batch_format="pyarrow"))

    # 3. boilerplate removal (drop chunks in >= min_docs distinct docs),
    #    then drop documents the removal emptied out.
    cleaned = boilerplate_filter(
        quality, min_docs=boilerplate_min_docs, chunk_words=chunk_words,
        id_col=id_col, text_col=text_col, num_partitions=num_partitions,
    ).filter(expr="n_kept > 0").drop_columns(["n_kept", "n_dropped"])
    cleaned = _mark("after_boilerplate", cleaned)

    # 4. exact dedup on the cleaned text (digest-keyed exchange).
    exact = _mark("after_exact_dedup", exact_dedup(
        cleaned, text_col=text_col, id_col=id_col, num_partitions=num_partitions))

    # 5. near-dup dedup (MinHash LSH bands -> verified pairs -> min-id
    #    survivors; the pair list is the documented small side).
    near = _mark("after_near_dedup", minhash_lsh_dedup(
        exact, text_col=text_col, id_col=id_col, threshold=minhash_threshold))

    # 6. token counting for the packing/batching stages downstream.
    out = near.map_batches(
        lambda t: token_count_batch(t, text_col=text_col), batch_format="pyarrow")
    if count_stages:
        counters["output"] = out.count()
    if stream_counters is not None:
        out = _mark("output", out)
    return out, counters
