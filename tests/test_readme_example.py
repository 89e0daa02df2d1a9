"""The README's end-to-end library example, executed verbatim — doc
drift protection: if an API in the snippet changes shape, this fails
before a user does."""


def test_readme_pretraining_example(ray_session, tmp_path):
    import ray.data

    from kgray.pipelines.curate import curate_corpus
    from kgray.stages.pack import pack_sequences
    from kgray.stages.split import hash_split

    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    clean, _ = curate_corpus(docs)
    split = hash_split(clean, id_col="doc_id", holdout_pct=1)
    train = split.filter(expr="split == 'train'").drop_columns(["split"])
    packed = pack_sequences(train, window=4096)
    out = str(tmp_path / "train")
    packed.write_parquet(out)
    back = ray.data.read_parquet(out)
    assert back.count() > 0
    assert {"seq_id", "seq_offset"} <= set(back.schema().names)

    # the README's tokenizer-ownership snippet (smaller merge count)
    from kgray.stages.bpe import bpe_encode_ids, bpe_train

    merges = bpe_train(train, num_merges=8)
    tokens = bpe_encode_ids(train, merges)
    tout = str(tmp_path / "tokens")
    tokens.write_parquet(tout)
    tback = ray.data.read_parquet(tout)
    assert tback.count() == train.count()
    assert {"doc_id", "token_ids", "n_tokens"} <= set(tback.schema().names)
