"""Composed curation pipeline: each stage must bite on a corpus crafted
to trigger it, and the final output must satisfy the pipeline's own
invariants."""

import numpy as np
import pandas as pd
import ray.data

from kgray.pipelines.curate import curate_corpus

# Build "good" English documents (>=30 words, stopwords present, mean
# word length in range) whose CONTENT words are doc-specific, so
# distinct docs are far apart in shingle space and only the crafted
# near-duplicate pair exceeds the MinHash threshold.
_STOPS = "the be to of and that have with"


def _good(i: int, flip_last: bool = False) -> str:
    body = " ".join(f"{w}{i}" for w in (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray".split()))
    tail = "yankeeX" if flip_last else f"yankee{i}"
    return f"{_STOPS} {body} {tail}"


def _corpus():
    rows = []
    # Ten good docs, each with its own content vocabulary, all English.
    for i in range(10):
        rows.append((i, _good(i)))
    # Near-duplicate of doc 0 (one word changed) -> minhash drop.
    rows.append((100, _good(0, flip_last=True)))
    # Exact duplicate of doc 1 -> exact-dedup drop.
    rows.append((101, _good(1)))
    # Non-English -> langid drop.
    rows.append((102, "der die das und nicht mit sich auf für ist im dem "
                      "ein eine als auch es an werden aus er hat dass sie "
                      "nach wird bei einer um am sind noch wie einem über"))
    # Too short -> gopher drop.
    rows.append((103, "the tiny doc"))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_curate_corpus_stages_bite(ray_session):
    out, counters = curate_corpus(
        ray.data.from_pandas(_corpus()), lang="en",
        boilerplate_min_docs=30,  # no chunk reaches 30 docs: stage is a no-op here
        minhash_threshold=0.7, num_partitions=2, count_stages=True,
    )
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert counters["after_langid"] == counters["input"] - 1          # 102 out
    assert counters["after_quality"] == counters["after_langid"] - 1  # 103 out
    assert counters["after_exact_dedup"] == counters["after_boilerplate"] - 1  # 101 out
    assert counters["after_near_dedup"] == counters["after_exact_dedup"] - 1   # 100 out
    assert set(df["doc_id"]) == set(range(10))
    assert (df["n_tokens"] > 0).all()


def test_curate_corpus_boilerplate_bites(ray_session):
    # With 4-word chunks, every doc's stopword prefix ("the be to of" /
    # "and that have with") is shared by all docs -> boilerplate,
    # stripped everywhere; the doc-specific chunks survive.
    out, counters = curate_corpus(
        ray.data.from_pandas(_corpus()), lang="en",
        boilerplate_min_docs=3, chunk_words=4, minhash_threshold=0.95,
        num_partitions=2, count_stages=True,
    )
    df = out.to_pandas()
    assert counters["after_boilerplate"] <= counters["after_quality"]
    # Boilerplate chunks are gone from every surviving text.
    assert not df["text"].str.startswith("the be to of").any()
    assert df["text"].str.contains("alpha").all()
    assert (df["n_tokens"] > 0).all()


def test_stream_counters_match_exact_recount(ray_session):
    import pandas as pd
    import ray
    import ray.data

    from kgray.pipelines.curate import curate_corpus
    from kgray.state.metrics import StageCounters

    rng = __import__("numpy").random.default_rng(3)
    words = ["the", "fast", "data", "merge", "spark", "row"]
    texts = [" ".join(rng.choice(words, 40)) for _ in range(120)]
    texts += texts[:10]  # exact dups
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})

    _, exact = curate_corpus(ray.data.from_pandas(df), lang="en",
                             count_stages=True)
    # Work meter: counts every consumption, so each stage's metered
    # rows are >= the exact survivor count (multi-consumer stages
    # re-read their input) — and the FINAL stage, consumed exactly
    # once by materialize(), must match exactly.
    ctr = StageCounters.remote()
    out, _ = curate_corpus(ray.data.from_pandas(df), lang="en",
                           stream_counters=ctr)
    out.materialize()
    import time
    streamed, prev = ray.get(ctr.get.remote()), None
    for _ in range(50):
        if streamed == prev and len(streamed) >= 7:
            break
        prev = streamed
        time.sleep(0.1)
        streamed = ray.get(ctr.get.remote())
    assert set(exact) <= set(streamed)
    for k, v in exact.items():
        assert streamed[k] >= v, (k, streamed[k], v)
    assert streamed["output"] == exact["output"]
