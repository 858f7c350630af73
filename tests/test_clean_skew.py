"""Preprocess (trim/fix_case, proj/preprocess.py) and skew helpers."""

import pytest
from pyspark.sql import functions as F

from smcchecker_spark import clean, skew
from smcchecker_spark.constraints import InLookup, Suite, ValidationContext
from smcchecker_spark.compile import compile_suite


def test_strip_whitespace(spark):
    df = spark.createDataFrame(
        [("a", "  x  ", 1), ("b", None, 2)], "id string, v string, n int"
    )
    out = {r["id"]: r["v"] for r in clean.strip_whitespace(df).collect()}
    assert out == {"a": "x", "b": None}


def test_fix_case(spark):
    df = spark.createDataFrame(
        [("a", "PNG"), ("b", "png"), ("c", "Jpeg"), ("d", "bmp"), ("e", None)],
        "id string, fmt string",
    )
    lu = spark.createDataFrame([("png",), ("jpeg",)], "fmt string")
    out = {r["id"]: r["fmt"] for r in clean.fix_case(df, "fmt", lu, "fmt").collect()}
    # case-insensitive matches canonicalize; non-matches pass through
    assert out == {"a": "png", "b": "png", "c": "jpeg", "d": "bmp", "e": None}


def test_clean_then_lookup_pipeline(spark):
    """'PNG' is a lookup failure raw, but passes after preprocess —
    the reference's preprocess-before-checks contract."""
    df = spark.createDataFrame(
        [("a", " PNG "), ("b", "bmp")], "image_id string, fmt string"
    )
    lu = spark.createDataFrame([("png",), ("jpeg",)], "fmt string")
    cleaned = clean.clean_data(df, case_fix_lookups={"fmt": (lu, "fmt")})
    ctx = ValidationContext(lookups={"lu_fmt": lu})
    suite = Suite(
        name="t", table="t",
        constraints=[InLookup("fmt", lookup="lu_fmt", lookup_key="fmt")],
    )
    v = compile_suite(cleaned, suite, ctx, row_id_col="image_id", part_id_col=None)
    assert {r["row_id"] for r in v.collect()} == {"b"}


def test_salted_count_matches_plain(spark):
    # 90% of rows share one hot key — the fixture's fmt skew shape
    rows = [(i, "hot" if i % 10 else "cold") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, k string")
    got = {r["k"]: r["count"] for r in skew.salted_count(df, ["k"], "id").collect()}
    want = {
        r["k"]: r["cnt"]
        for r in df.groupBy("k").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == want


def test_salted_repartition_spreads_hot_key(spark):
    rows = [(i, "hot") for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, k string")
    out = skew.salted_repartition(df, ["k"], "id", num_partitions=8, salt_buckets=8)
    sizes = (
        out.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .collect()
    )
    nonempty = [r["count"] for r in sizes if r["count"] > 0]
    # a plain repartition("k") would put all 2000 rows in ONE partition
    assert len(nonempty) >= 4
    assert max(nonempty) < 2000


def test_heavy_hitters(spark):
    from smcchecker_spark import skew

    df = spark.createDataFrame(
        [(i, "hot" if i % 10 < 8 else ("warm" if i % 10 == 8 else None))
         for i in range(1000)],
        "id int, k string",
    )
    rows = skew.heavy_hitters(df, "k", top=2).collect()
    # warm and NULL tie at 100; the documented tie-break is value-asc,
    # and 'NULL' < 'warm'
    assert [(r["value"], r["n"]) for r in rows] == [("hot", 800), ("NULL", 100)]
    assert abs(rows[0]["share"] - 0.8) < 1e-9
    # NULL keys surface as a reportable value; min_share trims the tail
    all3 = skew.heavy_hitters(df, "k", top=5).collect()
    assert ("NULL", 100) in {(r["value"], r["n"]) for r in all3}
    trimmed = skew.heavy_hitters(df, "k", top=5, min_share=0.5).collect()
    assert [r["value"] for r in trimmed] == ["hot"]
    import pytest as _p
    with _p.raises(ValueError, match="top"):
        skew.heavy_hitters(df, "k", top=0)


def test_replicated_skew_join_matches_plain_join(spark):
    from smcchecker_spark.skew import replicated_skew_join

    left = spark.range(0, 2000).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") < 1500, "hot").otherwise(
            F.concat(F.lit("k"), (F.col("id") % 20).cast("string"))
        ).alias("k"),
    )
    right = spark.createDataFrame(
        [("hot", 1), ("hot", 2), ("k3", 30), ("k7", 70), ("absent", 99)],
        "k string, payload int",
    )
    plain = left.join(right, "k", "inner").select("rid", "k", "payload")
    salted = replicated_skew_join(
        left, right, "k", "rid", salt_buckets=8
    ).select("rid", "k", "payload")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )

    # hot-key-restricted replication + left join semantics
    lplain = left.join(right, "k", "left").select("rid", "k", "payload")
    lsalted = replicated_skew_join(
        left, right, "k", "rid", salt_buckets=8, hot_keys=["hot"], how="left"
    ).select("rid", "k", "payload")
    got = sorted((r["rid"], r["k"], r["payload"]) for r in lsalted.collect())
    want = sorted((r["rid"], r["k"], r["payload"]) for r in lplain.collect())
    assert got == want

    import pytest
    with pytest.raises(ValueError):
        replicated_skew_join(left, right, "k", "rid", salt_buckets=1)
    with pytest.raises(ValueError):
        replicated_skew_join(left, right, ["k", "k"], "rid", hot_keys=["hot"])


# ---------------------------------------------------------------------------
# clean.impute_numeric
# ---------------------------------------------------------------------------


def test_impute_numeric_per_key_median(spark):
    from smcchecker_spark import clean

    rows = [
        (0, "a", 1.0), (1, "a", 3.0), (2, "a", None),
        (3, "b", 10.0), (4, "b", None),
        (5, "c", None),          # all-NULL group stays NULL
        (6, None, None),         # NULL key stays NULL
    ]
    df = spark.createDataFrame(rows, "id long, k string, v double")
    out = {r["id"]: r for r in clean.impute_numeric(
        df, ["v"], per_key=["k"]
    ).collect()}
    assert out[2]["v"] == 2.0 and out[2]["v__imputed"] is True
    assert out[4]["v"] == 10.0 and out[4]["v__imputed"] is True
    assert out[5]["v"] is None and out[5]["v__imputed"] is False
    assert out[6]["v"] is None and out[6]["v__imputed"] is False
    assert out[0]["v"] == 1.0 and out[0]["v__imputed"] is False


def test_impute_numeric_global_mean_and_validation(spark):
    import pytest as _pytest

    from smcchecker_spark import clean

    df = spark.createDataFrame(
        [(0, 1.0), (1, 3.0), (2, None)], "id long, v double"
    )
    out = {r["id"]: r["v"] for r in clean.impute_numeric(
        df, ["v"], strategy="mean", indicator=False
    ).collect()}
    assert out[2] == 2.0
    with _pytest.raises(ValueError, match="median|mean"):
        clean.impute_numeric(df, ["v"], strategy="mode")


def test_pca_model_roundtrip(spark, tmp_path):
    import numpy as np

    from smcchecker_spark.ops import pca

    rng = np.random.default_rng(3)
    X = rng.normal(size=(50, 6))
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    m = pca.fit_pca(df, "embedding", k=3)
    pca.save_pca_model(spark, m, str(tmp_path / "pca"))
    m2 = pca.load_pca_model(spark, str(tmp_path / "pca"))
    assert np.allclose(m.mean, m2.mean)
    assert np.allclose(m.components, m2.components)
    assert np.allclose(m.explained_variance, m2.explained_variance)
    a = pca.project_pca(df, m, "embedding").collect()
    b = pca.project_pca(df, m2, "embedding").collect()
    assert [r["pca"] for r in a] == [r["pca"] for r in b]


def test_impute_categorical_mode(spark):
    from smcchecker_spark import clean

    rows = [
        (0, "a", "x"), (1, "a", "x"), (2, "a", "y"), (3, "a", None),
        (4, "b", "z"), (5, "b", None),
        (6, "c", None),              # all-NULL group
    ]
    df = spark.createDataFrame(rows, "id long, k string, v string")
    out = {r["id"]: r for r in clean.impute_categorical(
        df, ["v"], per_key=["k"]
    ).collect()}
    assert out[3]["v"] == "x" and out[3]["v__imputed"] is True
    assert out[5]["v"] == "z" and out[5]["v__imputed"] is True
    assert out[6]["v"] is None and out[6]["v__imputed"] is False
    # tie -> smallest value, global mode
    df2 = spark.createDataFrame(
        [(0, "m"), (1, "m"), (2, "l"), (3, "l"), (4, None)], "id long, v string"
    )
    got = {r["id"]: r["v"] for r in clean.impute_categorical(df2, ["v"]).collect()}
    assert got[4] == "l"


# ---------------------------------------------------------------------------
# winsorize_numeric — clamp to data-derived percentile bounds
# ---------------------------------------------------------------------------


def test_winsorize_global_bounds(spark):
    # 1..10: p10 = 1.9, p90 = 9.1 (percentile_cont interpolation);
    # 1 clamps up, 10 clamps down, the middle is untouched
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 11)] + [(99, None)],
        "id long, v double",
    )
    out = clean.winsorize_numeric(df, ["v"], p_lo=0.1, p_hi=0.9)
    got = {r.id: (r.v, r.v__winsorized) for r in out.collect()}
    assert got[1] == (pytest.approx(1.9), True)
    assert got[10] == (pytest.approx(9.1), True)
    assert got[5] == (5.0, False)
    assert got[99] == (None, False)  # NULL stays NULL, never flagged


def test_winsorize_per_key_and_all_null_group(spark):
    rows = (
        [("a", float(i)) for i in range(1, 11)]
        + [("b", 1000.0 * i) for i in range(1, 11)]
        + [("c", None), ("c", None)]  # all-NULL group: no bounds, no-op
    )
    df = spark.createDataFrame(rows, "k string, v double")
    out = clean.winsorize_numeric(
        df, ["v"], p_lo=0.1, p_hi=0.9, per_key=["k"]
    )
    rows = out.collect()
    a_max = max(r.v for r in rows if r.k == "a")
    b_max = max(r.v for r in rows if r.k == "b")
    assert a_max == pytest.approx(9.1)      # a's own scale
    assert b_max == pytest.approx(9100.0)   # b's own scale
    assert all(r.v is None and not r.v__winsorized
               for r in rows if r.k == "c")


def test_winsorize_validates_band(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="p_lo < p_hi"):
        clean.winsorize_numeric(df, ["v"], p_lo=0.9, p_hi=0.1)
