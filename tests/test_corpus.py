"""Unit tests for corpus-level operators: tokenization helper edges,
chunk dedup reassembly, decontamination (both size-switched paths),
grouped quantiles, packing prefix-sum correctness."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from kgray.stages.corpus import (
    chunk_dedup,
    chunk_strings,
    decontaminate,
    flat_words,
    group_quantiles,
    topk_tokens,
)
from kgray.stages.pack import pack_sequences
from kgray.stages.split import stratified_sample


def test_flat_words_matches_regex_semantics(ray_session):
    texts = pa.array(["  a  b c ", "x", "", None, "\t\n", "one two"])
    flat, off = flat_words(texts)
    import re

    expect = [re.findall(r"\S+", t or "") for t in texts.to_pylist()]
    got = [flat.to_pylist()[off[i] : off[i + 1]] for i in range(len(texts))]
    assert got == expect


def test_chunk_strings_partial_tail(ray_session):
    texts = pa.array(["a b c d e", "x y", ""])
    chunks, doc_idx, pos = chunk_strings(texts, 2)
    assert chunks.to_pylist() == ["a b", "c d", "e", "x y"]
    assert doc_idx.tolist() == [0, 0, 0, 1]
    assert pos.tolist() == [0, 1, 2, 0]


def test_chunk_dedup_first_wins_and_empty_docs(ray_session):
    rows = [
        {"doc_id": 1, "text": "a b c d"},   # chunks: "a b", "c d"
        {"doc_id": 2, "text": "c d a b"},   # both chunks dupes of doc 1's
        {"doc_id": 3, "text": "  "},        # empty -> rides the side table
        {"doc_id": 4, "text": "c d x"},     # "c d" dropped, "x" kept
    ]
    out = chunk_dedup(ray.data.from_items(rows), chunk_words=2).to_pandas()
    out = out.set_index("doc_id").sort_index()
    assert out.loc[1, "text"] == "a b c d" and out.loc[1, "n_dropped"] == 0
    assert out.loc[2, "text"] == "" and out.loc[2, "n_dropped"] == 2
    assert out.loc[3, "text"] == "" and out.loc[3, "n_kept"] == 0
    assert out.loc[4, "text"] == "x" and out.loc[4, "n_kept"] == 1


def test_decontaminate_paths_agree(ray_session):
    docs = [{"doc_id": i, "text": f"w{i} " + "alpha beta gamma delta epsilon"}
            for i in range(0, 10)]
    docs += [{"doc_id": 100 + i, "text": f"unique{i} only tokens here none match at all {i}"}
             for i in range(5)]
    ds = ray.data.from_items(docs)
    bench = ray.data.from_items([{"doc_id": -1, "text": "alpha beta gamma delta epsilon"}])
    a = decontaminate(ds, bench, n=5).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = decontaminate(ds, bench, n=5, broadcast_limit=0).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert a[a.doc_id < 100]["contaminated"].all()
    assert not a[a.doc_id >= 100]["contaminated"].any()


def test_decontaminate_short_docs_emit_nothing(ray_session):
    ds = ray.data.from_items([{"doc_id": 1, "text": "too short"}])
    bench = ray.data.from_items([{"doc_id": 2, "text": "too short as well ok"}])
    out = decontaminate(ds, bench, n=5).to_pandas()
    assert out["n_contaminated"].tolist() == [0]


def test_group_quantiles_exact(ray_session):
    rows = [{"g": "a", "v": i} for i in range(1, 11)] + [{"g": "b", "v": 7}]
    out = group_quantiles(ray.data.from_items(rows), "g", "v").to_pandas()
    out = out.set_index("g").sort_index()
    # group a: n=10 -> p50 = 5th element = 5, p90 = 9, p99 = ceil(9.9)=10th = 10
    assert out.loc["a", ["p50", "p90", "p99"]].tolist() == [5, 9, 10]
    assert out.loc["b", ["n", "p50"]].tolist() == [1, 7]


def test_topk_ties_break_lexicographically(ray_session):
    ds = ray.data.from_items([{"text": "b a b a c"}])
    top = topk_tokens(ds, k=2).to_pandas()
    assert top["tok"].tolist() == ["a", "b"]


def test_pack_sequences_matches_serial_cumsum(ray_session):
    rng = np.random.RandomState(7)
    rows = [{"doc_id": int(i), "text": " ".join(["w"] * int(rng.randint(1, 40)))}
            for i in rng.permutation(200)]
    out = pack_sequences(ray.data.from_items(rows), window=64, num_partitions=8).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    serial = out["n_tokens"].to_numpy()
    excl = np.concatenate([[0], np.cumsum(serial)[:-1]])
    assert (out["seq_id"].to_numpy() == excl // 64).all()
    assert (out["seq_offset"].to_numpy() == excl % 64).all()


def test_stratified_sample_nested(ray_session):
    rows = [{"doc_id": i, "lang": "en"} for i in range(500)]
    ds = ray.data.from_items(rows)
    small = set(stratified_sample(ds, "lang", {"en": 0.1}).to_pandas()["doc_id"])
    big = set(stratified_sample(ds, "lang", {"en": 0.5}).to_pandas()["doc_id"])
    assert small <= big  # nested samples: same hash, higher threshold
    assert 0 < len(small) < len(big) < 500
    # default_rate drops unknown strata entirely
    zh = ray.data.from_items([{"doc_id": 1, "lang": "zh"}])
    assert stratified_sample(zh, "lang", {"en": 1.0}).count() == 0


def test_shuffle_rank_permutation_string_ids(ray_session):
    """shuffle_rank must emit an exact permutation 0..n-1 matching the
    md5-ascending order, for string ids (the oracle covers int ids)."""
    import hashlib

    import ray.data

    from kgray.stages.split import shuffle_rank

    ids = [f"doc-{i:04d}" for i in range(777)]
    ds = ray.data.from_items([{"id": i} for i in ids])
    out = shuffle_rank(ds, id_col="id").to_pandas()
    assert sorted(out["pos"]) == list(range(777))
    expect = {
        i: r
        for r, i in enumerate(
            sorted(ids, key=lambda s: hashlib.md5(s.encode()).hexdigest())
        )
    }
    assert all(expect[t.id] == t.pos for t in out.itertuples())
    # Salted epoch: different permutation, still a permutation.
    out2 = shuffle_rank(ds, id_col="id", salt="epoch1").to_pandas()
    assert sorted(out2["pos"]) == list(range(777))
    merged = out.merge(out2, on="id")
    assert (merged["pos_x"] != merged["pos_y"]).any()


def test_tfidf_topk_hand_computed(ray_session):
    import math

    from kgray.stages.corpus import tfidf_topk

    docs = [
        {"doc_id": 1, "text": "apple apple banana"},
        {"doc_id": 2, "text": "banana cherry"},
        {"doc_id": 3, "text": "cherry cherry cherry durian"},
    ]
    out = (
        tfidf_topk(ray.data.from_items(docs), k=2)
        .to_pandas()
        .sort_values(["doc_id", "score", "tok"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    idf = lambda df: math.log(4.0 / (df + 1.0)) + 1.0
    # doc 1: apple tf=2 df=1 → 2*idf(1); banana tf=1 df=2 → idf(2)
    r = out[out.doc_id == 1]
    assert list(r.tok) == ["apple", "banana"]
    assert abs(r.score.iloc[0] - round(2 * idf(1), 6)) < 1e-9
    # doc 3: cherry tf=3 df=2 beats durian tf=1 df=1
    r = out[out.doc_id == 3]
    assert list(r.tok) == ["cherry", "durian"]
    assert abs(r.score.iloc[0] - round(3 * idf(2), 6)) < 1e-9
    assert (out.groupby("doc_id").size() <= 2).all()


def test_unigram_nll_hand_computed(ray_session):
    import math

    from kgray.stages.corpus import unigram_nll

    docs = [
        {"doc_id": 1, "text": "a a b"},
        {"doc_id": 2, "text": "b zz"},
        {"doc_id": 3, "text": ""},  # no tokens → dropped
    ]
    # N=5 tokens; vocab cap 2 → top-2 by (count desc, tok asc): a(2), b(2).
    # denom = 5 + 2 + 1 = 8. p(a)=3/8, p(b)=3/8, p(oov)=1/8.
    out = unigram_nll(
        ray.data.from_items(docs), vocab_size=2
    ).to_pandas().set_index("doc_id")
    assert sorted(out.index) == [1, 2]
    exp1 = -(2 * math.log(3 / 8) + math.log(3 / 8)) / 3
    exp2 = -(math.log(3 / 8) + math.log(1 / 8)) / 2
    assert abs(out.loc[1, "nll"] - round(exp1, 6)) < 1e-9
    assert abs(out.loc[2, "nll"] - round(exp2, 6)) < 1e-9


def test_boilerplate_filter_drops_frequent_chunks(ray_session):
    from kgray.stages.corpus import boilerplate_filter

    # "b1 b2" appears in 3 distinct docs (one of them twice) -> dropped
    # everywhere; "u1 u2" repeated WITHIN doc 3 (doc freq 1) -> kept.
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            "b1 b2 k1 k2",
            "b1 b2 k3 k4",
            "b1 b2 b1 b2",
            "u1 u2 u1 u2",
            "",
        ],
    })
    out = (
        boilerplate_filter(ray.data.from_pandas(docs), min_docs=3,
                           chunk_words=2, num_partitions=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["text"].tolist() == ["k1 k2", "k3 k4", "", "u1 u2 u1 u2", ""]
    assert out["n_kept"].tolist() == [1, 1, 0, 2, 0]
    assert out["n_dropped"].tolist() == [1, 1, 2, 0, 0]


def test_dsir_score_prefers_target_like_docs(ray_session):
    from kgray.stages.corpus import dsir_score

    # Target docs say "good"; raw background says "noise". A fresh doc
    # full of "good" must outscore one full of "noise".
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": ["good good good", "good good", "noise noise noise",
                 "noise noise", "good good good good", "noise noise noise noise"],
        "is_target": [True, True, False, False, False, False],
    })
    out = (
        dsir_score(ray.data.from_pandas(docs), target_mask_col="is_target",
                   vocab_size=10, num_partitions=2)
        .to_pandas().set_index("doc_id")["dsir_score"]
    )
    assert out[4] > out[5]
    assert out[0] == out[4] and out[2] == out[5]  # single-token docs: same mean


def test_quantile_outlier_flag(ray_session):
    from kgray.stages.corpus import quantile_outlier_flag

    df = pd.DataFrame({
        "doc_id": range(12),
        "lang": ["en"] * 10 + ["fr"] * 2,
        "n_chars": [1, 2, 3, 4, 5, 6, 7, 8, 9, 100, 5, 50],
    })
    out = (
        quantile_outlier_flag(ray.data.from_pandas(df), "lang", "n_chars",
                              q=0.5, num_partitions=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # en p50 (discrete, ceil(.5*10)=5th value) = 5 -> values >5 flagged.
    assert out["is_outlier"].tolist() == [
        False, False, False, False, False, True, True, True, True, True,
        # fr p50 = 5 -> 50 flagged
        False, True,
    ]


def test_dup_spans_basic(ray_session):
    from kgray.stages.corpus import dup_spans

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "a b c d e f",          # gram "a b c d e" & "b c d e f"
            "x a b c d e y",        # shares "a b c d e" at pos 1
            "unique words only here now",
            "sh",                    # too short: no 5-grams
        ],
    })
    got = (
        dup_spans(ray.data.from_pandas(df), n=5, num_partitions=2)
        .to_pandas().sort_values(["doc_id", "pos"]).reset_index(drop=True)
    )
    assert got.values.tolist() == [[1, 0], [2, 1]]


def test_pmi_topk_matches_brute_force(ray_session):
    from kgray.stages.corpus import pmi_topk

    rng = np.random.default_rng(3)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 30)))
             for _ in range(200)]
    df = pd.DataFrame({"text": texts})
    got = pmi_topk(ray.data.from_pandas(df), k=5, min_count=3).to_pandas()

    # brute force
    from collections import Counter
    uni, big = Counter(), Counter()
    for t in texts:
        w = t.split()
        uni.update(w)
        big.update(" ".join(p) for p in zip(w, w[1:]))
    N, B = sum(uni.values()), sum(big.values())
    rows = [
        (g, c, round(float(np.log((c / B) / ((uni[g.split()[0]] / N) * (uni[g.split()[1]] / N)))), 6))
        for g, c in big.items() if c >= 3
    ]
    rows.sort(key=lambda r: (-r[2], r[0]))
    exp = pd.DataFrame(rows[:5], columns=["gram", "n", "pmi"])
    pd.testing.assert_frame_equal(got, exp)


def test_bm25_ranks_relevant_docs_first(ray_session):
    from kgray.stages.corpus import bm25_topk

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "join join join hash",           # heavy on query terms
            "join filler filler filler filler filler filler",
            "nothing relevant at all",
            "hash customer",
        ],
    })
    got = bm25_topk(ray.data.from_pandas(df), terms=["join", "hash", "customer"], k=4).to_pandas()
    assert got["doc_id"].tolist()[0] in (1, 4)
    assert 3 not in got["doc_id"].tolist()  # zero score filtered
    assert (got["score"].to_numpy()[:-1] >= got["score"].to_numpy()[1:]).all()


def test_doc_entropy_known_values(ray_session):
    import math

    import ray.data

    from kgray.stages.corpus import doc_entropy

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a a a a", "a b a b", "  ", "x y z"],
    })
    got = (
        doc_entropy(ray.data.from_pandas(df))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # Empty doc (id 3) dropped; uniform 1-symbol → 0; 2 even symbols →
    # ln 2; 3 even → ln 3.
    assert got["doc_id"].tolist() == [1, 2, 4]
    assert np.allclose(got["entropy"], [0.0, round(math.log(2), 6), round(math.log(3), 6)])


def test_chunk_text_windows_and_tails(ray_session):
    import ray.data

    from kgray.stages.corpus import chunk_text

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b c d e f g", "x y", ""],
    })
    got = (
        chunk_text(ray.data.from_pandas(df), window=4, stride=2)
        .to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    )
    # doc 1 (7 words, starts 0,2,4,6): windows of 4, tails run short.
    d1 = got[got["doc_id"] == 1]
    assert d1["chunk_text"].tolist() == ["a b c d", "c d e f", "e f g", "g"]
    assert d1["n_words"].tolist() == [4, 4, 3, 1]
    assert got[got["doc_id"] == 2]["chunk_text"].tolist() == ["x y"]
    assert (got["doc_id"] != 3).all()  # empty doc emits nothing


def _bfd_reference(lengths, window):
    """Naive PER-DOC best-fit-decreasing (longest first, tightest bin,
    FIFO within each equal-remaining-capacity class) — the O(n·window)
    ground truth the histogram formulation must reproduce bin-for-bin:
    the histogram version only BATCHES identical lengths, so with the
    same capacity-class FIFO discipline the assignments must be equal."""
    order = np.argsort(-np.asarray(lengths), kind="stable")
    queues = {}  # remaining capacity -> FIFO list of bin ids
    assign = {}
    n_bins = 0
    for i in order:
        n = int(lengths[i])
        fits = sorted(r for r, q in queues.items() if r >= n and q)
        if not fits:
            assign[i] = (n_bins, 0)
            queues.setdefault(window - n, []).append(n_bins)
            n_bins += 1
        else:
            r = fits[0]
            bid = queues[r].pop(0)
            assign[i] = (bid, window - r)
            queues.setdefault(r - n, []).append(bid)
    return assign, n_bins


def test_bestfit_histogram_matches_naive_bfd():
    from kgray.stages.pack import _bfd_histogram_pack

    rng = np.random.RandomState(11)
    for trial in range(20):
        window = int(rng.choice([16, 64, 256]))
        n = int(rng.randint(1, 120))
        lengths = rng.randint(1, window + 1, size=n).astype(np.int64)
        bin_of, off_of, n_bins = _bfd_histogram_pack(lengths, window)
        ref_assign, ref_bins = _bfd_reference(lengths, window)
        assert n_bins == ref_bins, (trial, window, lengths.tolist())
        for i in range(n):
            assert (bin_of[i], off_of[i]) == ref_assign[i], (
                trial, i, lengths.tolist())


def test_bestfit_pack_invariants_and_determinism(ray_session):
    from kgray.stages.pack import bestfit_pack

    rng = np.random.RandomState(3)
    rows = [{"doc_id": int(i), "text": " ".join(["w"] * int(rng.randint(1, 90)))}
            for i in rng.permutation(300)]
    # one doc longer than the window -> its own bin at offset 0
    rows.append({"doc_id": 300, "text": " ".join(["w"] * 100)})
    ds = ray.data.from_items(rows)
    a = bestfit_pack(ds, window=64, num_partitions=4).to_pandas()
    b = bestfit_pack(ds, window=64, num_partitions=4).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)  # deterministic rerun
    clipped = np.minimum(a["n_tokens"].to_numpy(), 64)
    fills = pd.Series(clipped).groupby(a["seq_id"].to_numpy()).sum()
    assert int(fills.max()) <= 64
    assert a["doc_id"].is_unique and len(a) == 301
    long = a[a["doc_id"] == 300]
    assert long["seq_offset"].iloc[0] == 0
    assert (fills[long["seq_id"]] == 64).all()  # clipped own bin


def test_corpus_diff_classifies(ray_session):
    import ray.data

    from kgray.stages.corpus import corpus_diff

    a = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                      "text": ["one", "two", "three", "four"]})
    b = pd.DataFrame({"doc_id": [2, 3, 5],
                      "text": ["two", "THREE", "five"]})
    out = corpus_diff(ray.data.from_pandas(a), ray.data.from_pandas(b),
                      num_partitions=4).to_pandas()
    got = dict(zip(out["doc_id"], out["status"]))
    assert got == {1: "removed", 3: "changed", 4: "removed", 5: "added"}
    # unchanged id 2 dropped entirely
    assert 2 not in got


def test_bigram_nll_hand_example_and_forced_join_path(ray_session):
    """Interpolated bigram NLL: hand-computed on a 3-doc corpus, and the
    forced join path (model_broadcast_limit=0) equals the broadcast
    path to float tolerance."""
    import numpy as np
    import pandas as pd
    import ray.data

    from kgray.stages.corpus import bigram_nll

    texts = ["a b a b", "a b", "c"]  # doc 2 has no bigrams -> dropped
    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": texts})
    ds = ray.data.from_pandas(df)
    got = (bigram_nll(ds, model_broadcast_limit=2_000_000)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # model: tokens a:3 b:3 c:1, N=7; bigrams: (a,b):3 (b,a):1
    N = 7.0
    p_ab = 0.9 * (3 / 3) + 0.1 * (3 / N)
    p_ba = 0.9 * (1 / 3) + 0.1 * (3 / N)
    want0 = -(2 * np.log(p_ab) + np.log(p_ba)) / 3
    want1 = -np.log(p_ab)
    assert got["doc_id"].tolist() == [0, 1]
    assert np.allclose(got["nll"], [round(want0, 6), round(want1, 6)], atol=2e-6)

    joined = (bigram_nll(ds, model_broadcast_limit=0)
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert joined["doc_id"].tolist() == got["doc_id"].tolist()
    assert np.allclose(joined["nll"], got["nll"], atol=2e-6)


def test_bigram_nll_empty_doc_mid_batch_attribution(ray_session):
    """Regression: a zero-token doc in the MIDDLE of a batch must not
    shift bigram attribution of every later doc (the start-flag cumsum
    collapsed when an empty doc shared its offset with its successor)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from kgray.stages.corpus import bigram_nll

    # offsets [0,2,2,4,4,6]: empty + whitespace + None docs interleaved
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": ["a b", "", "c d", "   ", "a b", None],
    })
    ds = ray.data.from_pandas(df)
    got = (bigram_nll(ds, model_broadcast_limit=2_000_000)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # model: tokens a:2 b:2 c:1 d:1, N=6; bigrams (a,b):2 (c,d):1
    N = 6.0
    p_ab = 0.9 * (2 / 2) + 0.1 * (2 / N)
    p_cd = 0.9 * (1 / 1) + 0.1 * (1 / N)
    assert got["doc_id"].tolist() == [0, 2, 4]
    assert np.allclose(
        got["nll"],
        [round(-np.log(p_ab), 6), round(-np.log(p_cd), 6),
         round(-np.log(p_ab), 6)], atol=2e-6)
    joined = (bigram_nll(ds, model_broadcast_limit=0)
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert joined["doc_id"].tolist() == got["doc_id"].tolist()
    assert np.allclose(joined["nll"], got["nll"], atol=2e-6)


def test_bigram_nll_join_path_matches_broadcast_random(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from kgray.stages.corpus import bigram_nll

    rng = np.random.RandomState(8)
    vocab = [f"w{j}" for j in range(30)]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(2, 40)))
             for _ in range(150)]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = ray.data.from_pandas(df).repartition(4)
    a = (bigram_nll(ds).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (bigram_nll(ds, model_broadcast_limit=0).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert np.allclose(a["nll"], b["nll"], atol=2e-6)
