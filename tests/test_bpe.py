"""Distributed BPE training vs the pure-Python reference trainer:
merge-for-merge equality (ids, tie-breaks, counts) on random corpora,
plus the vectorized merge-application edge cases."""

import numpy as np
import pandas as pd
import pytest


def test_apply_merge_overlap_and_boundaries():
    from kgray.stages.bpe import _apply_merge

    # "aaaa" + "aaa" as two words; merge (a,a) -> Z: leftmost pairs
    # only, never across the word boundary.
    a, Z = ord("a"), 70000
    flat = np.array([a] * 7, dtype=np.int32)
    offsets = np.array([0, 4, 7], dtype=np.int64)
    out, offs = _apply_merge(flat, offsets, a, a, Z)
    assert out.tolist() == [Z, Z, Z, a]
    assert offs.tolist() == [0, 2, 4]

    # distinct pair, no candidates crossing boundary: "ab|ba"
    b = ord("b")
    flat = np.array([a, b, b, a], dtype=np.int32)
    offsets = np.array([0, 2, 4], dtype=np.int64)
    out, offs = _apply_merge(flat, offsets, b, a, Z)
    assert out.tolist() == [a, b, Z]
    assert offs.tolist() == [0, 2, 3]


@pytest.mark.parametrize("seed,vocab_limit", [(0, 2_000_000), (1, 2_000_000),
                                               (2, 2_000_000), (0, 0), (2, 0)])
def test_bpe_train_matches_reference(ray_session, seed, vocab_limit):
    import ray.data

    from kgray.stages.bpe import bpe_train, bpe_train_reference

    rng = np.random.RandomState(seed)
    vocab = ["the", "quick", "brown", "fox", "foxes", "quicker",
             "aaa", "aaaa", "ab", "abab", "ababab", "ba"]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(3, 12)))
             for _ in range(200)]
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts}))
    got = bpe_train(ds, num_merges=12, num_partitions=4,
                    driver_vocab_limit=vocab_limit).to_pandas()
    ref = bpe_train_reference(texts, num_merges=12)
    assert len(got) == len(ref)
    for i, (rank, a, b, new_id, n) in enumerate(ref):
        row = got.iloc[i]
        assert (row["rank"], row["left"], row["right"], row["new_id"],
                row["count"]) == (rank, a, b, new_id, n), (i, ref[i], dict(row))


def test_bpe_train_early_stop_and_word_cap(ray_session):
    import ray.data

    from kgray.stages.bpe import bpe_train

    # Every word unique and short: after exhausting pairs >= 2 the
    # trainer stops early rather than padding out num_merges.
    ds = ray.data.from_pandas(pd.DataFrame({
        "text": ["xy xy xy", "very-long-" + "z" * 100]}))
    out = bpe_train(ds, num_merges=50, max_word_len=16, num_partitions=2).to_pandas()
    # "xy" dominates: first merge is (x, y); the 100-char word is capped
    # away so its z-runs never train.
    assert len(out) >= 1
    assert (out.iloc[0]["left"], out.iloc[0]["right"]) == (ord("x"), ord("y"))
    assert not ((out["left"] == ord("z")) & (out["right"] == ord("z"))).any()
    assert len(out) < 50  # early stop fired


def test_bpe_astral_codepoints_never_collide_with_merge_ids(ray_session):
    """Supplementary-plane characters (code points ≥ 0x10000, e.g. emoji)
    are valid initial symbols; merge ids must start ABOVE 0x10FFFF so a
    raw astral code point can never be mistaken for a learned merge
    (the old base of 1<<16 collided)."""
    import ray.data

    from kgray.stages.bpe import (_MERGED_BASE, bpe_encode_ids, bpe_train,
                                  bpe_train_reference)

    assert _MERGED_BASE == 0x110000

    emoji = "\U0001F600\U0001F680"  # two astral chars, frequent pair
    texts = [f"{emoji} ab ab" for _ in range(20)] + [f"{emoji} cd"] * 5
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = ray.data.from_pandas(df)
    merges_t = bpe_train(ds, num_merges=4, num_partitions=2)
    got = [tuple(r) for r in merges_t.to_pandas().itertuples(index=False)]
    ref = bpe_train_reference(texts, num_merges=4)
    assert got == ref
    # the emoji pair trains (25 occurrences): its LEFT/RIGHT are raw
    # astral code points, its new_id is above the whole Unicode range
    assert any(a == 0x1F600 and b == 0x1F680 for _, a, b, _, _ in got)
    for _, a, b, new_id, _n in got:
        assert new_id >= 0x110000
        assert a < 0x110000 or a >= _MERGED_BASE  # no ambiguous band
    # encoded ids partition cleanly: raw code point XOR learned merge
    enc = bpe_encode_ids(ds, merges_t).to_pandas()
    valid_hi = _MERGED_BASE + len(got)
    for ids in enc["token_ids"]:
        for s in ids:
            assert s < 0x110000 or (_MERGED_BASE <= s < valid_hi)


def test_bpe_encode_count_matches_reference(ray_session):
    import pyarrow as pa
    import ray.data

    from kgray.stages.bpe import bpe_encode_count, bpe_train, bpe_train_reference

    rng = np.random.RandomState(5)
    vocab = ["low", "lower", "lowest", "new", "newer", "wider", "aaa a"]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(1, 8)))
             for _ in range(120)] + ["", "   "]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = ray.data.from_pandas(df)
    merges = bpe_train(ds, num_merges=10, num_partitions=4)
    got = bpe_encode_count(ds, merges).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)

    # reference encode: apply reference merges per word
    ref_merges = bpe_train_reference(texts, num_merges=10)
    assert [tuple(r) for r in merges.to_pandas().itertuples(index=False)] == ref_merges

    def enc(word):
        syms = [ord(c) for c in word]
        for _, a, b, new_id, _n in ref_merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(new_id); i += 2
                else:
                    out.append(syms[i]); i += 1
            syms = out
        return len(syms)

    import re
    for _, row in got.iterrows():
        text = texts[int(row["doc_id"])]
        want = sum(enc(w) for w in re.findall(r"\S+", text))
        assert row["n_tokens"] == want, (row["doc_id"], text)
    assert (got[got["doc_id"] >= 120]["n_tokens"] == 0).all()  # empty docs


def test_bpe_encode_ids_matches_reference(ray_session):
    import ray.data

    from kgray.stages.bpe import bpe_encode_ids, bpe_train, bpe_train_reference

    rng = np.random.RandomState(9)
    vocab = ["aa", "aab", "ab", "b", "abab", "aaaa"]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(1, 6)))
             for _ in range(80)] + [""]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = ray.data.from_pandas(df)
    merges = bpe_train(ds, num_merges=8, num_partitions=4)
    got = bpe_encode_ids(ds, merges).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    ref_merges = bpe_train_reference(texts, num_merges=8)

    def enc(word):
        syms = [ord(c) for c in word]
        for _, a, b, new_id, _n in ref_merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(new_id); i += 2
                else:
                    out.append(syms[i]); i += 1
            syms = out
        return syms

    import re
    for _, row in got.iterrows():
        text = texts[int(row["doc_id"])]
        want = [s for w in re.findall(r"\S+", text) for s in enc(w)]
        assert list(row["token_ids"]) == want, (row["doc_id"], text)
        assert row["n_tokens"] == len(want)
    assert list(got[got["doc_id"] == len(texts) - 1]["token_ids"].iloc[0]) == []
