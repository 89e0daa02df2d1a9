"""Dedup-family operator tests on constructed corpora with known answers."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from kgray.stages.dedup import (
    embedding_near_dup,
    exact_dedup,
    minhash_lsh_dedup,
    minhash_lsh_pairs,
    simhash_pairs,
)


def _docs_with_near_dups(n=60, seed=7):
    rng = np.random.RandomState(seed)
    vocab = [f"word{j}" for j in range(80)]
    ids, texts = [], []
    for i in range(n):
        words = [vocab[j] for j in rng.randint(0, len(vocab), 40)]
        ids.append(i)
        texts.append(" ".join(words))
        # near-dup copy: one word appended
        ids.append(i + 100000)
        texts.append(" ".join(words) + " omega")
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)})


def test_exact_dedup(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array([3, 1, 2, 5], type=pa.int64()),
            "text": pa.array(["aa", "aa", "bb", "bb"]),
        }
    )
    out = exact_dedup(ray.data.from_arrow(t)).take_all()
    got = sorted((r["doc_id"], r["text"]) for r in out)
    assert got == [(1, "aa"), (2, "bb")]


def test_minhash_lsh_pairs_and_dedup(ray_session):
    t = _docs_with_near_dups()
    ds = ray.data.from_arrow(t)
    pairs = minhash_lsh_pairs(ds, threshold=0.7).take_all()
    got = sorted((r["id_a"], r["id_b"]) for r in pairs)
    assert got == [(i, i + 100000) for i in range(60)]

    # Join-based verify (the large-candidate scale path) must agree
    # with the broadcast fast path exactly.
    pairs_join = minhash_lsh_pairs(ds, threshold=0.7, verify_broadcast_limit=0).take_all()
    assert sorted((r["id_a"], r["id_b"]) for r in pairs_join) == got

    survivors = minhash_lsh_dedup(ds, threshold=0.7)
    ids = sorted(r["doc_id"] for r in survivors.select_columns(["doc_id"]).take_all())
    assert ids == list(range(60))


def test_minhash_dedup_distributed_cc_matches_driver_path(ray_session):
    """Forced size-switch (pair_broadcast_limit=0): survivor clustering
    through the distributed connected-components + anti-join must equal
    the driver union-find + broadcast path exactly — including numeric
    min-id semantics for integer ids (cast_ids=False; lexicographic
    string min would pick a different survivor for ids like 9 vs 10)."""
    t = _docs_with_near_dups(30)
    ds = ray.data.from_arrow(t)
    broadcast = sorted(
        r["doc_id"] for r in minhash_lsh_dedup(ds, threshold=0.7)
        .select_columns(["doc_id"]).take_all())
    distributed = sorted(
        r["doc_id"] for r in minhash_lsh_dedup(
            ds, threshold=0.7, pair_broadcast_limit=0)
        .select_columns(["doc_id"]).take_all())
    assert broadcast == distributed == list(range(30))


def test_cross_minhash_flag_distributed_join_matches_broadcast(ray_session):
    """Forced size-switch (hit_broadcast_limit=0): the distributed
    distinct-hits LEFT join must flag exactly the same corpus docs as
    the broadcast hit-set path."""
    from kgray.stages.dedup import cross_minhash_flag

    t = _docs_with_near_dups(25)
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    # corpus = originals, reference = the near-dup copies -> every
    # corpus doc is contaminated; plus 5 clean corpus docs.
    corpus = pa.table({
        "doc_id": pa.array([i for i in ids if i < 100000]
                           + [900 + j for j in range(5)], type=pa.int64()),
        "text": pa.array([x for i, x in zip(ids, texts) if i < 100000]
                         + [f"unique doc {j} " + " ".join(
                             f"tok{j}{k}" for k in range(30)) for j in range(5)]),
    })
    reference = pa.table({
        "doc_id": pa.array([i for i in ids if i >= 100000], type=pa.int64()),
        "text": pa.array([x for i, x in zip(ids, texts) if i >= 100000]),
    })
    cds, rds = ray.data.from_arrow(corpus), ray.data.from_arrow(reference)

    def _flags(**kw):
        out = cross_minhash_flag(cds, rds, threshold=0.7, **kw).take_all()
        return sorted((r["doc_id"], r["is_dup"]) for r in out)

    broadcast = _flags()
    distributed = _flags(hit_broadcast_limit=0)
    assert broadcast == distributed
    assert len(broadcast) == len(corpus)
    flagged = {d for d, f in broadcast if f}
    assert flagged == {i for i in ids if i < 100000}  # clean docs unflagged


def test_simhash_pairs(ray_session):
    from kgray.stages.dedup import _SimHasher

    t = _docs_with_near_dups()
    got = {(r["id_a"], r["id_b"]) for r in simhash_pairs(ray.data.from_arrow(t), max_hamming=10).take_all()}
    dup_pairs = {(i, i + 100000) for i in range(60)}
    # No false positives on this corpus (random pairs measured ≥ 12).
    assert got <= dup_pairs
    # Pigeonhole guarantee: every dup pair within hamming < n_bands(=8)
    # MUST be found; pairs at 8-10 are probabilistic extras.
    texts = dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    for i in range(60):
        d = bin(_SimHasher.simhash64(texts[i]) ^ _SimHasher.simhash64(texts[i + 100000])).count("1")
        if d < 8:
            assert (i, i + 100000) in got, (i, d)


def test_embedding_near_dup(ray_session):
    rng = np.random.RandomState(11)
    vecs = rng.randn(40, 16)
    ids = list(range(40)) + [i + 100000 for i in range(40)]
    all_vecs = np.vstack([vecs, vecs * 2.0])  # scaled copies: cosine == 1
    t = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array([v.tolist() for v in all_vecs], type=pa.list_(pa.float32())),
        }
    )
    pairs = embedding_near_dup(ray.data.from_arrow(t), threshold=0.999).take_all()
    got = sorted((r["id_a"], r["id_b"]) for r in pairs)
    assert got == [(i, i + 100000) for i in range(40)]


def test_ngram_jaccard_pairs_exact_vs_bruteforce(ray_session):
    """The inverted-index operator equals brute-force all-pairs Jaccard
    exactly (it is the deterministic member of the dedup family)."""
    from kgray.stages.dedup import _shingles, ngram_jaccard_pairs

    t = _docs_with_near_dups(40)
    ds = ray.data.from_arrow(t)
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(ds, threshold=0.7, num_partitions=4).take_all()
    )
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    sets = {i: set(_shingles(x, 3)) for i, x in zip(ids, texts)}
    want = sorted(
        (a, b)
        for ai, a in enumerate(ids)
        for b in ids[ai + 1 :]
        if sets[a] and sets[b]
        and len(sets[a] & sets[b]) / len(sets[a] | sets[b]) >= 0.7
        and a < b
    )
    assert got == want and len(want) >= 40  # every (i, i+100000) clone pair


def test_ngram_jaccard_postings_cap(ray_session):
    """Oversized postings lists are skipped (warning logged in-worker —
    see _cooccur): a shingle shared by more docs than max_postings
    contributes no pairs."""
    from kgray.stages.dedup import ngram_jaccard_pairs

    # 30 docs sharing one identical text → every 3-gram's postings list
    # has 30 members; cap at 10 → all pairs lost.
    t = pa.table(
        {
            "doc_id": pa.array(list(range(30)), type=pa.int64()),
            "text": pa.array(["alpha beta gamma delta epsilon"] * 30),
        }
    )
    ds = ray.data.from_arrow(t)
    out = ngram_jaccard_pairs(ds, threshold=0.5, max_postings=10, num_partitions=2).take_all()
    assert out == []


def test_band_emitter_empty_batch_keeps_id_type(ray_session):
    """A fully-filtered batch must emit the id column with its native
    type (ADVICE r2: hardcoded int64 broke string-id corpora)."""
    import pyarrow as pa

    from kgray.stages.dedup import _BandEmitter

    em = _BandEmitter(text_col="text", id_col="doc_id", num_perm=8, band_rows=2, shingle_k=3)
    empty = em(pa.table({"doc_id": pa.array(["a"], type=pa.string()), "text": pa.array([""], type=pa.string())}))
    assert empty.schema.field("doc_id").type == pa.string()
    full = em(pa.table({"doc_id": pa.array(["a"], type=pa.string()), "text": pa.array(["one two three four"], type=pa.string())}))
    assert full.schema.field("doc_id").type == pa.string()
    assert empty.schema == full.schema


def test_simhash_batch_matches_reference():
    """The vectorized batch SimHash must equal the per-row reference
    implementation bit-for-bit (the SQL oracle pins the reference)."""
    import numpy as np
    import pyarrow as pa

    from kgray.stages.dedup import _SimHasher

    rng = np.random.RandomState(5)
    words = ["alpha", "beta", "gamma", "δέλτα", "x1", "longer-token_9"]
    texts = [
        " ".join(rng.choice(words, size=rng.randint(0, 12)).tolist()) for _ in range(50)
    ] + ["", "   ", None]
    sh = _SimHasher(text_col="text", id_col="doc_id")
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    got = sh(t).column("simhash").to_pylist()
    exp = [
        (lambda u: u - (1 << 64) if u >= (1 << 63) else u)(sh.simhash64(x or ""))
        for x in texts
    ]
    assert got == exp


def test_containment_catches_what_jaccard_misses(ray_session):
    import pandas as pd
    import ray.data

    from kgray.stages.dedup import ngram_jaccard_pairs

    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"w{i}" for i in range(60))
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": [short, long, "totally different words here now"]})
    ds = ray.data.from_pandas(df)
    # Short doc fully inside long: containment(1,2) = 1.0, but Jaccard
    # = 4/62 — the union denominator dilutes it.
    cont = ngram_jaccard_pairs(ds, threshold=0.8, score="containment",
                               num_partitions=2).to_pandas()
    jac = ngram_jaccard_pairs(ds, threshold=0.8,
                              num_partitions=2).to_pandas()
    assert [(1, 2)] == list(zip(cont["id_a"], cont["id_b"]))
    assert len(jac) == 0


def test_group_scoped_jaccard_excludes_cross_group(ray_session):
    import pandas as pd
    import ray.data

    from kgray.stages.dedup import ngram_jaccard_pairs

    text = "alpha beta gamma delta epsilon zeta eta theta"
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "lang": ["en", "de", "en"],
        "text": [text, text, text],  # identical — unscoped finds all 3 pairs
    })
    ds = ray.data.from_pandas(df)
    scoped = ngram_jaccard_pairs(ds, threshold=0.7, group_col="lang",
                                 num_partitions=2).to_pandas()
    unscoped = ngram_jaccard_pairs(ds, threshold=0.7,
                                   num_partitions=2).to_pandas()
    assert sorted(zip(scoped["id_a"], scoped["id_b"])) == [(1, 3)]
    assert len(unscoped) == 3
