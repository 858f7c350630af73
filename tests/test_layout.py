"""Tests for Z-order layout (ops/layout.py): z-value bit math vs a
python reference, and the pruning property — z-clustered partitions
bound BOTH dimensions, so a box filter touches few of them."""

import pytest
from pyspark.sql import functions as F

from smcchecker_spark.ops.layout import zorder_layout, zvalue


def _z_ref(vals, bits):
    out = 0
    for b in range(bits):
        for j, v in enumerate(vals):
            out |= ((v >> b) & 1) << (b * len(vals) + j)
    return out


def test_zvalue_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 256, (i * 91) % 256) for i in range(200)],
        "id long, x long, y long",
    )
    out = df.select(
        "x", "y", zvalue([F.col("x"), F.col("y")], bits=8).alias("z")
    ).collect()
    for r in out:
        assert r["z"] == _z_ref([r["x"], r["y"]], 8)


def test_zvalue_validates(spark):
    with pytest.raises(ValueError):
        zvalue([], 8)
    with pytest.raises(ValueError):
        zvalue([F.col("a"), F.col("b")], 32)


def test_zorder_layout_bounds_both_dimensions(spark, tmp_path):
    # 64x64 grid, one row per cell. WRITE it in 16 files two ways: sorted
    # by x alone, and z-ordered on (x, y). A filter on the OTHER
    # dimension (y < 8) has matching rows in every x-sorted file but in
    # only a fraction of the z-ordered ones — the file-skipping property
    # footer stats exploit. (The layout must be materialized: on a live
    # plan Catalyst pushes the filter BELOW the repartition.)
    grid = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], "x long, y long"
    )

    def files_touched(path):
        df = spark.read.parquet(path)
        n_files = (
            df.select(F.input_file_name().alias("f")).distinct().count()
        )
        hit = (
            df.filter(F.col("y") < 8)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )
        return n_files, hit

    grid.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(
        str(tmp_path / "by_x")
    )
    by_z = zorder_layout(grid, [F.col("x"), F.col("y")], bits=6,
                         num_partitions=16)
    by_z.write.parquet(str(tmp_path / "by_z"))

    nx, hx = files_touched(str(tmp_path / "by_x"))
    nz, hz = files_touched(str(tmp_path / "by_z"))
    assert nx == 16 and hx == 16  # x-sorted: every file has y<8 rows
    # y < 8 is 1/8 of the curve's y-extent; contiguous z segments keep it
    # in a minority of files (exactly 4 of 16 for a perfect grid)
    assert nz == 16 and hz <= 6

    # layout preserves the row multiset
    z_read = spark.read.parquet(str(tmp_path / "by_z"))
    assert z_read.count() == 64 * 64
    assert z_read.select(F.sum(F.col("x") * 64 + F.col("y"))).first()[0] == sum(
        x * 64 + y for x in range(64) for y in range(64)
    )
