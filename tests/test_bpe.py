"""BPE induction/encoding: known-merge training, deterministic
encoding, exact round-trip, and the vocabulary-bound guard."""

from __future__ import annotations

import pytest

from etl_pack_spark.operators.bpe import (
    END,
    MAX_TRAIN_VOCAB,
    bpe_encode,
    decode_pieces,
    train_bpe,
    word_counts,
)
from etl_pack_spark.sources.reader import read_table


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_trains_expected_first_merge(spark):
    # "ab" dominates: the first merge must be ('a', 'b</w>') or ('a','b')
    # depending on boundary; with 2-char words it's ('a', 'b</w>')
    df = _df(spark, [(1, "ab ab ab ab cd"), (2, "ab ab cd")])
    merges = train_bpe(df, "text", num_merges=1)
    assert merges == [("a", "b" + END)]


def test_encode_applies_merges_greedily(spark):
    df = _df(spark, [(1, "aaab aaab"), (2, "ab")])
    merges = train_bpe(df, "text", num_merges=3)
    enc = {r["id"]: r["pieces"] for r in
           bpe_encode(df, "doc_id", "text", merges).collect()}
    # every piece sequence must rebuild its source text exactly
    assert decode_pieces(enc[1]) == "aaab aaab"
    assert decode_pieces(enc[2]) == "ab"


def test_deterministic_under_repartition(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(100)
    m1 = train_bpe(docs, "text", num_merges=20)
    m2 = train_bpe(docs.repartition(7), "text", num_merges=20)
    assert m1 == m2 and len(m1) == 20
    e1 = sorted((r["id"], tuple(r["pieces"])) for r in
                bpe_encode(docs, "doc_id", "text", m1).collect())
    e2 = sorted((r["id"], tuple(r["pieces"])) for r in
                bpe_encode(docs.repartition(5), "doc_id", "text", m2).collect())
    assert e1 == e2


def test_roundtrip_on_fixture(spark, sf_dir):
    import re

    docs = read_table(spark, sf_dir, "documents").limit(50)
    merges = train_bpe(docs, "text", num_merges=30)
    enc = bpe_encode(docs, "doc_id", "text", merges)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in enc.collect():
        # decode reproduces the TOKEN stream (same normalization train
        # and encode share: lowercase [a-z0-9]+)
        norm = " ".join(t for t in re.split("[^a-z0-9]+", texts[r["id"]].lower()) if t)
        assert decode_pieces(r["pieces"]) == norm
        assert r["n_pieces"] == len(r["pieces"])


def test_encode_matches_training_tokenization(spark):
    """Capitalized/punctuated words must hit the learned merges (the
    encode path tokenizes identically to training)."""
    df = _df(spark, [(1, "The cat. THE CAT! the cat")])
    merges = train_bpe(df, "text", num_merges=10)
    enc = bpe_encode(df, "doc_id", "text", merges).collect()[0]
    assert decode_pieces(enc["pieces"]) == "the cat the cat the cat"
    # 'the' and 'cat' fully merge into single pieces -> 6 pieces total
    assert enc["n_pieces"] == 6


def test_vocab_guard_raises(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="distinct words"):
        train_bpe(docs, "text", num_merges=1, max_vocab=3)


def test_word_counts_shape(spark):
    df = _df(spark, [(1, "x y x"), (2, "y")])
    wc = {r["word"]: r["cnt"] for r in word_counts(df, "text").collect()}
    assert wc == {"x": 2, "y": 2}


def test_encode_preserves_string_id_type(spark):
    """bpe_encode derives the id field type from the input frame — a
    hardcoded LongType crashed Arrow conversion for string doc ids."""
    df = spark.createDataFrame(
        [("doc-a", "ab ab ab"), ("doc-b", "ab cd")], "doc_id string, text string"
    )
    merges = train_bpe(df, "text", num_merges=2)
    out = bpe_encode(df, "doc_id", "text", merges)
    assert dict(out.dtypes)["id"] == "string"
    got = {r["id"]: r["pieces"] for r in out.collect()}
    assert decode_pieces(got["doc-a"]) == "ab ab ab"
    assert decode_pieces(got["doc-b"]) == "ab cd"
