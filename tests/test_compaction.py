"""Tests for small-file compaction (tables.file_census / compact_path)."""

from pyspark.sql import functions as F

from smcchecker_spark import tables


def test_compact_path_merges_small_files(spark, tmp_path):
    path = str(tmp_path / "t")
    # two hive partitions, each fragmented into 8 tiny files
    df = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 2).alias("p")
    )
    df.repartition(8).write.partitionBy("p").parquet(path)

    before = tables.file_census(spark, path)
    assert len(before) == 2 and all(r["n_files"] == 8 for r in before)

    actions = tables.compact_path(spark, path, target_file_bytes=1 << 30)
    assert len(actions) == 2
    assert all(a["files_before"] == 8 and a["files_after"] == 1 for a in actions)

    after = tables.file_census(spark, path)
    assert all(r["n_files"] == 1 for r in after)

    # data identical (partition column included via the hive layout)
    got = spark.read.parquet(path)
    assert got.count() == 2000
    assert got.select(F.sum("id")).first()[0] == sum(range(2000))
    assert got.select(F.sum("p")).first()[0] == 1000

    # idempotent: nothing left to compact
    assert tables.compact_path(spark, path, target_file_bytes=1 << 30) == []


def test_compact_path_respects_target_size(spark, tmp_path):
    path = str(tmp_path / "t2")
    spark.range(0, 50_000).repartition(10).write.parquet(path)
    rec = tables.file_census(spark, path)[0]
    # target = ~half the partition bytes → 2 output files, not 1
    actions = tables.compact_path(
        spark, path, target_file_bytes=max(rec["bytes"] // 2, 1)
    )
    assert len(actions) == 1
    assert actions[0]["files_after"] in (2, 3)  # ceil(bytes/target)
    assert spark.read.parquet(path).count() == 50_000


# ---------------------------------------------------------------------------
# merge_upsert
# ---------------------------------------------------------------------------


def test_merge_upsert_partition_scoped(spark, tmp_path):
    path = str(tmp_path / "m")
    base = spark.createDataFrame(
        [(i, i % 4, f"v{i}") for i in range(40)], "k long, p long, v string"
    )
    base.write.partitionBy("p").parquet(path)
    untouched = {
        r["f"]
        for r in spark.read.parquet(path)
        .filter(F.col("p").isin(2, 3))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }

    updates = spark.createDataFrame(
        [(0, 0, "NEW0"), (5, 1, "NEW5"), (100, 0, "INS100")],
        "k long, p long, v string",
    )
    res = tables.merge_upsert(spark, path, updates, ["k"], partition_col="p")
    assert res == {
        "partitions_rewritten": 2, "rows_updated": 2, "rows_inserted": 1
    }

    got = {r["k"]: (r["p"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert len(got) == 41
    assert got[0] == (0, "NEW0") and got[5] == (1, "NEW5")
    assert got[100] == (0, "INS100")
    assert got[7] == (3, "v7")  # untouched partition intact

    # untouched partitions: the very same files (no rewrite)
    after = {
        r["f"]
        for r in spark.read.parquet(path)
        .filter(F.col("p").isin(2, 3))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert after == untouched


def test_merge_upsert_whole_table_and_duplicate_rejection(spark, tmp_path):
    import pytest

    path = str(tmp_path / "m2")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    ).write.parquet(path)
    res = tables.merge_upsert(
        spark, path,
        spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"),
        ["k"],
    )
    assert res["rows_updated"] == 1 and res["rows_inserted"] == 1
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}

    with pytest.raises(ValueError):
        tables.merge_upsert(
            spark, path,
            spark.createDataFrame([(9, "x"), (9, "y")], "k long, v string"),
            ["k"],
        )


def test_row_diff_semantics(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0),      # unchanged → absent from the diff
         (2, "b", 99.0),     # update
         (3, "c", 3.0),      # NULL → value: update
         (5, "e", 5.0)],     # insert; k=4 deleted
        "k long, s string, v double",
    )
    got = {(r["k"], r["change"]) for r in tables.row_diff(old, new, ["k"]).collect()}
    assert got == {(2, "update"), (3, "update"), (4, "delete"), (5, "insert")}

    # compare_cols scoping: ignoring v sees only membership changes
    got2 = {
        (r["k"], r["change"])
        for r in tables.row_diff(old, new, ["k"], compare_cols=["s"]).collect()
    }
    assert got2 == {(4, "delete"), (5, "insert")}

    import pytest
    with pytest.raises(ValueError):
        tables.row_diff(old, new, [])
    with pytest.raises(ValueError):
        tables.row_diff(old.drop("v"), new, ["k"])


# ---------------------------------------------------------------------------
# tables.union_with_evolution
# ---------------------------------------------------------------------------


def test_union_evolution_widens_and_fills(spark):
    a = spark.createDataFrame([(1, 10, "x")], "id int, v int, s string")
    b = spark.createDataFrame([(2, 3.5)], "id bigint, v double")
    out = tables.union_with_evolution({"a": a, "b": b})
    assert dict(out.dtypes) == {
        "source": "string", "id": "bigint", "v": "double", "s": "string",
    }
    rows = {r["source"]: r for r in out.collect()}
    assert rows["a"]["id"] == 1 and rows["a"]["v"] == 10.0
    assert rows["b"]["s"] is None
    # column order: provenance first, then first-seen order
    assert out.columns == ["source", "id", "v", "s"]


def test_union_evolution_incompatible_raises_then_folds(spark):
    import pytest as _pytest

    a = spark.createDataFrame([(1,)], "k int")
    b = spark.createDataFrame([("x",)], "k string")
    with _pytest.raises(ValueError, match="k: a=int, b=string"):
        tables.union_with_evolution({"a": a, "b": b})
    out = tables.union_with_evolution({"a": a, "b": b}, cast_to_string=True)
    assert dict(out.dtypes)["k"] == "string"
    assert {r["k"] for r in out.collect()} == {"1", "x"}
    with _pytest.raises(ValueError, match="non-empty"):
        tables.union_with_evolution({})


def test_union_evolution_date_widens_to_timestamp(spark):
    import datetime

    a = spark.createDataFrame(
        [(datetime.date(2026, 1, 2),)], "d date"
    )
    b = spark.createDataFrame(
        [(datetime.datetime(2026, 1, 3, 4, 5),)], "d timestamp"
    )
    out = tables.union_with_evolution({"a": a, "b": b}, source_col=None)
    assert dict(out.dtypes) == {"d": "timestamp"}
    assert out.count() == 2


def test_union_evolution_map_only_plan(spark):
    a = spark.createDataFrame([(1, 10)], "id int, v int")
    b = spark.createDataFrame([(2, 3.5)], "id bigint, v double")
    out = tables.union_with_evolution({"a": a, "b": b})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_vacuum_path(spark, tmp_path):
    root = str(tmp_path / "tbl")
    df = spark.range(0, 100).withColumn("part_id", (F.col("id") % 2).cast("int"))
    df.write.partitionBy("part_id").parquet(root)
    # plant debris: a tmp dir, an old dir WITH live partition (deletable),
    # and an old dir WHOSE partition is missing (must be restored)
    spark.range(5).write.parquet(root + "/part_id=0.compact_tmp")
    spark.range(5).write.parquet(root + "/part_id=1.compact_old")
    spark.range(7).write.parquet(root + "/part_id=9.compact_old")
    import os

    assert not os.path.exists(root + "/part_id=9")
    listed = tables.vacuum_path(spark, root, dry_run=True)
    assert len(listed) == 3
    assert os.path.exists(root + "/part_id=1.compact_old")  # dry run
    acted = tables.vacuum_path(spark, root)
    assert any(a.startswith("restored:") for a in acted)
    assert os.path.exists(root + "/part_id=9")              # rollback finished
    assert not os.path.exists(root + "/part_id=1.compact_old")
    assert not os.path.exists(root + "/part_id=0.compact_tmp")
    # table still reads clean (debris never counted as data)
    assert spark.read.parquet(root).count() == 100 + 7  # part_id=9 restored
    # idempotent
    assert tables.vacuum_path(spark, root) == []
