"""BPE tokenizer (ops/bpe.py): hand-derived merge order, greedy encode
semantics, Spark application, artifact roundtrip."""

import pytest
from pyspark.sql import functions as F

from smcchecker_spark.ops import bpe


def _mkdf(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_train_merge_order_hand_derived(spark):
    # corpus: "aa" x3, "ab" x2 → pair counts round 1:
    # (a,a)=3, (a,</w>)=3, (a,b)=2, (b,</w>)=2; tie at 3 breaks pair-ASC
    # ("</w>" < "a"), so (a,</w>) merges first, then (a,a</w>), then the
    # 2-count tie (a,b) < (b,</w>)
    df = _mkdf(spark, ["aa aa", "aa ab", "ab"])
    merges = bpe.train_bpe(df, n_merges=3, sample_docs=10)
    assert merges == [("a", "</w>"), ("a", "a</w>"), ("a", "b")]


def test_encode_word_greedy_rank_order():
    ranks = {("a", "</w>"): 0, ("a", "a</w>"): 1, ("a", "b"): 2}
    assert bpe.encode_word("aa", ranks) == ["aa</w>"]
    # (a,b) merges before the un-ranked (ab,</w>) can exist
    assert bpe.encode_word("ab", ranks) == ["ab", "</w>"]
    # only the suffix rule applies
    assert bpe.encode_word("ba", ranks) == ["b", "a</w>"]
    # unseen word degrades to characters + sentinel
    assert bpe.encode_word("xyz", {}) == ["x", "y", "z", "</w>"]


def test_apply_bpe_spark_end_to_end(spark):
    train = _mkdf(spark, ["the cat sat", "the cat", "the"] * 10)
    merges = bpe.train_bpe(train, n_merges=30, sample_docs=100)
    target = _mkdf(spark, ["the cat sat on the mat", "", None])
    out = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe.apply_bpe(target, merges).collect()
    }
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    exp = []
    for w in "the cat sat on the mat".split():
        exp.extend(bpe.encode_word(w, ranks))
    assert out[0] == exp
    # frequent training words collapse to single tokens
    assert bpe.encode_word("the", ranks) == ["the</w>"]
    assert out[1] == [] and out[2] == []
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_token_count(target, merges).collect()
    }
    assert counts == {0: len(exp), 1: 0, 2: 0}


def test_train_deterministic_and_artifact_roundtrip(spark, tmp_path):
    df = _mkdf(spark, ["banana bandana cabana", "ban can man", "a ba na"])
    m1 = bpe.train_bpe(df, n_merges=25, sample_docs=10)
    m2 = bpe.train_bpe(df, n_merges=25, sample_docs=10)
    assert m1 == m2
    p = str(tmp_path / "merges.txt")
    bpe.save_merges(m1, p)
    assert bpe.load_merges(p) == m1


def test_bpe_compresses_real_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = bpe.train_bpe(docs, n_merges=150, sample_docs=200)
    out = bpe.bpe_token_count(docs.limit(50), merges)
    rows = out.select(
        "n_bpe_tokens",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_words"),
        F.length("text").alias("n_chars"),
    ).collect()
    for r in rows:
        # at least one token per word (each word ends in its own
        # sentinel-bearing token), never more than chars + words
        assert r["n_words"] <= r["n_bpe_tokens"] <= r["n_chars"] + r["n_words"]
    # merges must actually compress: far fewer tokens than characters
    tot_tok = sum(r["n_bpe_tokens"] for r in rows)
    tot_chr = sum(r["n_chars"] for r in rows)
    assert tot_tok < 0.6 * tot_chr
