"""Tests for the DataFrame-native Bloom prefilter (ops/bloom.py)."""

import pytest
from pyspark.sql import functions as F

from smcchecker_spark.ops import bloom


def test_bloom_no_false_negatives_and_low_fp(spark):
    members = spark.range(0, 500).select(F.col("id").alias("k"))
    words = bloom.bloom_build(members, "k", num_bits=1 << 14, num_hashes=4)
    # every member must flag True
    flagged = bloom.might_contain(members, "k", words, 1 << 14, 4)
    assert flagged.filter(~F.col("__maybe")).count() == 0
    # non-members: 16384 bits / 500 keys x 4 hashes → fp well under 10%
    others = spark.range(10_000, 12_000).select(F.col("id").alias("k"))
    fp = (
        bloom.might_contain(others, "k", words, 1 << 14, 4)
        .filter(F.col("__maybe"))
        .count()
    )
    assert fp < 200


def test_prefilter_anti_join_is_exact(spark):
    df = spark.range(0, 1000).select(
        F.when(F.col("id") % 97 == 0, F.lit(None)).otherwise(F.col("id")).alias("k"),
        (F.col("id") * 2).alias("payload"),
    )
    existing = spark.range(0, 2000, 3).select(F.col("id").alias("k"))
    got = bloom.prefilter_anti_join(df, "k", existing, num_bits=1 << 14)
    want = df.join(existing, "k", "left_anti")
    assert sorted(repr(tuple(r)) for r in got.collect()) == sorted(
        repr(tuple(r)) for r in want.collect()
    )
    # NULL keys pass through (anti-join semantics)
    assert got.filter(F.col("k").isNull()).count() == df.filter(
        F.col("k").isNull()
    ).count()


def test_probe_never_shuffles_the_corpus(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    members = spark.range(0, 100).select(F.col("id").alias("k"))
    words = bloom.bloom_build(members, "k", 1 << 12, 4)
    flagged = bloom.might_contain(df, "k", words, 1 << 12, 4)
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    # probe side: broadcast joins only — the corpus is never hash-shuffled
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning(k" not in plan


def test_bloom_validates_params(spark):
    members = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        bloom.bloom_build(members, "k", num_bits=100)
    with pytest.raises(ValueError):
        bloom.bloom_build(members, "k", num_bits=64, num_hashes=0)


def test_prefilter_accepts_stored_words(spark, tmp_path):
    df = spark.range(0, 500).select(F.col("id").alias("k"))
    existing = spark.range(0, 1000, 3).select(F.col("id").alias("k"))
    words = bloom.bloom_build(existing, "k", 1 << 14, 4)
    words.write.parquet(str(tmp_path / "bloom"))
    stored = spark.read.parquet(str(tmp_path / "bloom"))
    got = bloom.prefilter_anti_join(
        df, "k", existing, num_bits=1 << 14, words=stored
    )
    want = df.join(existing, "k", "left_anti")
    assert sorted(r["k"] for r in got.collect()) == sorted(
        r["k"] for r in want.collect()
    )
