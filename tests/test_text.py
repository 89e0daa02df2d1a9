import pyarrow as pa
import ray.data

from kgray.stages.text import (
    LangId,
    RollingFingerprint,
    fingerprint_batch,
    quality_batch,
    token_count_batch,
)


def _t(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": pa.array(texts)})


def test_token_count():
    out = token_count_batch(_t(["a b  c", "", "one"]))
    assert out.column("n_tokens").to_pylist() == [3, 0, 1]


def test_quality_columns():
    out = quality_batch(_t(["Hello, world! 42", ""]))
    assert out.column("n_tokens").to_pylist()[0] == 3
    assert out.column("punct_ratio").to_pylist()[0] > 0
    assert out.column("digit_ratio").to_pylist()[1] == 0.0


def test_fingerprint_normalization():
    out = fingerprint_batch(_t(["Hello   World", "hello world", "other"]))
    fps = out.column("fingerprint").to_pylist()
    assert fps[0] == fps[1] != fps[2]


def test_rolling_fingerprint_stability():
    rf = RollingFingerprint()
    a = rf.fingerprint("the quick brown fox jumps over the lazy dog")
    b = rf.fingerprint("the quick brown fox jumps over the lazy dog")
    c = rf.fingerprint("a completely different sentence here")
    assert a == b != c
    out = rf(_t(["abcdefghijklmnop"]))
    assert out.column("winnow").to_pylist()[0]


def test_langid(ray_session):
    ds = ray.data.from_arrow(
        _t(
            [
                "the cat and the dog are in the house",
                "der Hund und die Katze ist nicht da",
                "le chat est dans la maison pour une nuit",
                "xyzzy qwerty",
            ]
        )
    )
    out = ds.map_batches(LangId, batch_format="pyarrow", concurrency=1).take_all()
    preds = [r["lang_pred"] for r in sorted(out, key=lambda r: r["doc_id"])]
    assert preds == ["en", "de", "fr", "und"]


def test_hash_split_stable_and_proportional(ray_session):
    """hash_split is a pure function of the id (stable across runs and
    partitionings) and lands near the requested holdout fraction."""
    import pyarrow as pa
    import ray.data

    from kgray.stages.split import hash_split

    ids = pa.table({"doc_id": pa.array(list(range(5000)), type=pa.int64())})
    a = {r["doc_id"]: r["split"] for r in hash_split(ray.data.from_arrow(ids), "doc_id", 10).take_all()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            ray.data.from_arrow(ids).repartition(7), "doc_id", 10
        ).take_all()
    }
    assert a == b
    frac = sum(1 for v in a.values() if v == "holdout") / len(a)
    assert 0.07 <= frac <= 0.13


def test_pii_scrub_redacts_and_counts():
    from kgray.stages.text import pii_scrub_batch

    out = pii_scrub_batch(
        _t(
            [
                "mail me at jo.doe+x@sub.example.org today",
                "call +4915551234567 or 555-010-1234, ssn 123-45-6789, host 192.168.0.1",
                "",
                "no pii here",
            ]
        )
    )
    clean = out.column("text_clean").to_pylist()
    assert clean[0] == "mail me at <EMAIL> today"
    assert clean[1] == "call <PHONE> or <PHONE>, ssn <SSN>, host <IP>"
    assert clean[3] == "no pii here"
    assert out.column("n_email").to_pylist() == [1, 0, 0, 0]
    assert out.column("n_phone").to_pylist() == [0, 2, 0, 0]
    assert out.column("n_ssn").to_pylist() == [0, 1, 0, 0]
    assert out.column("n_ip").to_pylist() == [0, 1, 0, 0]


def test_repetition_stats_exact_fractions():
    from kgray.stages.text import repetition_stats_batch

    out = repetition_stats_batch(
        _t(
            [
                "a a a a",  # top word 4/4, bigrams: 3 total 1 distinct
                "a b c d",  # all distinct: top 1/4, 3/3 bigrams distinct
                "",  # zero words
                "x y x y x",  # top 3/5; bigrams: x y, y x, x y, y x -> 2/4 distinct
            ]
        )
    )
    assert out.column("top_word_frac").to_pylist() == [1.0, 0.25, 0.0, 0.6]
    assert out.column("dup_2gram_frac").to_pylist() == [
        round(1 - 1 / 3, 6),
        0.0,
        0.0,
        0.5,
    ]
    # keep: both metrics must be <= 0.2; "a b c d" has top_word_frac 0.25
    assert out.column("keep").to_pylist() == [0, 0, 1, 0]


def test_repetition_stats_batch_invariant():
    # metrics are per-row: one batch == two half batches
    from kgray.stages.text import repetition_stats_batch

    texts = ["a b a b", "c c c", "d e f", "g g h h"]
    whole = repetition_stats_batch(_t(texts))
    parts = pa.concat_tables(
        [repetition_stats_batch(_t(texts[:2])), repetition_stats_batch(_t(texts[2:]))]
    )
    assert whole.column("top_word_frac").to_pylist() == parts.column("top_word_frac").to_pylist()
    assert whole.column("dup_2gram_frac").to_pylist() == parts.column("dup_2gram_frac").to_pylist()


def test_gopher_rules_edges():
    """Rule-by-rule edge cases through the batch kernel (the oracle test
    covers the corpus path; this pins the per-rule semantics)."""
    import pyarrow as pa

    from kgray.stages.text import gopher_quality_batch

    # 39 words, stopword-rich, mean word length ≈ 4.2 (inside [3, 10])
    filler = "the black cat sat and the brown dog ran to the green mat with a round hat today " * 3
    docs = {
        "ok": filler,
        "too_short": "the and of",
        "bullety": "\n".join(f"- item {i} the and" for i in range(10)) + "\n" + filler,
        "elliptic": "\n".join(f"wait for it{'.'*3}" for i in range(9)) + "\n" + filler.replace("\n", " "),
        "symbols": ("# " * 20) + filler,
        "no_alpha": ("123 456 789 " * 12) + "the and",
        "empty": "",
    }
    t = pa.table({"doc_id": list(docs), "text": list(docs.values())})
    out = gopher_quality_batch(t).to_pandas().set_index("doc_id")
    assert out.loc["ok", "keep"] == 1
    assert out.loc["too_short", "r_word_count"] == 0
    assert out.loc["bullety", "r_bullet_ratio"] == 0  # 10/11 lines bulleted > 0.9
    assert out.loc["elliptic", "r_ellipsis_ratio"] == 0  # 9/10 > 0.3
    assert out.loc["symbols", "r_symbol_ratio"] == 0  # 20/56 > 0.1
    assert out.loc["no_alpha", "r_alpha_words"] == 0  # 2/38 < 0.8
    assert out.loc["empty", "keep"] == 0 and out.loc["empty", "r_word_count"] == 0


def test_normalize_batch_matches_duckdb_on_unicode():
    # The normalize kernel chain must agree with the SQL oracle chain
    # byte-for-byte on non-ASCII input: Unicode lowercase, accent strip
    # (NFD + \p{Mn} removal vs DuckDB strip_accents), RE2 \s collapse,
    # ASCII-space trim — including pre-decomposed (NFD) input.
    import duckdb
    import pyarrow as pa

    from kgray.stages.text import normalize_batch

    cases = [
        "Café  au   LAIT",        # NFD e + combining acute
        "\tTabs\nand\r\nnewlines  ",
        "ÉLÄN vs élan",
        "ΣΟΦΌΣ",                        # Greek sigma lowering + tonos strip
        "naïve façade søster 日本語 Ångström",
        "\u0065\u0301lan vs \u00e9lan",   # decomposed vs precomposed é
        "  already clean  ",
        "",
    ]
    t = pa.table({"text": pa.array(cases)})
    got = normalize_batch(t).column("text_norm").to_pylist()
    want = [
        duckdb.sql(
            "SELECT trim(regexp_replace(strip_accents(lower(?)), '\\s+', ' ', 'g'), ' ')",
            params=[s],
        ).fetchone()[0]
        for s in cases
    ]
    assert got == want
