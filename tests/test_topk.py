"""Tests for skew-safe exact top-k per key (ops/topk.py)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from smcchecker_spark.ops.topk import topk_per_key


def _window_reference(df, key, order, idc, k):
    w = Window.partitionBy(key).orderBy(F.desc_nulls_last(order), F.asc(idc))
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def test_topk_matches_plain_window(spark):
    df = spark.range(0, 5000).select(
        F.col("id"),
        (F.col("id") % 7).alias("key"),
        (F.xxhash64("id") % 1000).alias("v"),
    )
    got = sorted(map(tuple, topk_per_key(df, "key", "v", "id", 5).collect()))
    want = sorted(map(tuple, _window_reference(df, "key", "v", "id", 5).collect()))
    assert got == want and len(got) == 7 * 5

    # invariant to input partitioning (the local-reduction phase)
    again = sorted(
        map(tuple, topk_per_key(df.repartition(13), "key", "v", "id", 5).collect())
    )
    assert again == got


def test_topk_ties_and_nulls(spark):
    rows = [
        (1, "a", 10.0), (2, "a", 10.0), (3, "a", 10.0),  # three-way tie
        (4, "a", None), (5, "a", 5.0),
        (6, "b", None), (7, "b", None),  # all-null key
    ]
    df = spark.createDataFrame(rows, "id long, key string, v double")
    got = {(r["id"], r["rank"]) for r in topk_per_key(df, "key", "v", "id", 2).collect()}
    # ties break by id asc; NULL orders lose to any value
    assert got == {(1, 1), (2, 2), (6, 1), (7, 2)}
    with pytest.raises(ValueError):
        topk_per_key(df, "key", "v", "id", 0)
    with pytest.raises(ValueError):
        topk_per_key(df, "nope", "v", "id", 1)
