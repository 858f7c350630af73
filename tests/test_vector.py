"""Embedding-vector constraints (vector.py): exact violation sets over a
hand-built corpus covering every edge the planted entry-query corrupts plus
the ones it can't (NULL vector, empty vector, +/-Inf, NULL element), and a
plan assertion that a vector suite stays a pure-JVM single pass (no
Arrow/Python stage — HOF expressions only)."""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    StringType,
    StructField,
    StructType,
)

from smcchecker_spark.compile import compile_suite
from smcchecker_spark.constraints import Suite
from smcchecker_spark.vector import (
    VectorFinite,
    VectorNormRange,
    VectorShape,
    l2_norm,
)

NAN = float("nan")
INF = float("inf")

ROWS = [
    ("ok", [0.6, 0.8]),                # norm 1.0, dim 2 — clean
    ("null_vec", None),                # NotNull's business: no vector flags
    ("empty", []),                     # norm 0 < lo -> norm flag; size 0 -> shape
    ("short", [1.0]),                  # shape flag only (norm 1.0 in range)
    ("long", [0.5, 0.5, 0.5, 0.5]),    # shape flag only (norm 1.0)
    ("nan_el", [NAN, 1.0]),            # finite flag ONLY (NaN norm excluded)
    ("pos_inf", [INF, 0.0]),           # finite flag; norm Inf > hi -> norm flag too
    ("neg_inf", [-INF, 0.0]),          # finite flag; norm Inf -> norm flag
    ("null_el", [None, 1.0]),          # finite flag (null element)
    ("scaled", [30.0, 40.0]),          # norm 50 > hi -> norm flag
    ("tiny", [0.01, 0.0]),             # norm 0.01 < lo -> norm flag
]

SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("v", ArrayType(FloatType(), containsNull=True)),
    ]
)


@pytest.fixture(scope="module")
def violations(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    suite = Suite(
        name="vec",
        table="emb",
        constraints=[
            VectorShape("v", dim=2),
            VectorFinite("v"),
            VectorNormRange("v", lo=0.1, hi=10.0),
        ],
    )
    out = compile_suite(df, suite, row_id_col="id", part_id_col=None)
    rows = out.select("row_id", "check_name").collect()
    by_check = {}
    for r in rows:
        by_check.setdefault(r.check_name, set()).add(r.row_id)
    return by_check


def test_shape_flags_exactly_wrong_dims(violations):
    assert violations.get("vectorshape_v", set()) == {"empty", "short", "long"}


def test_finite_flags_nan_inf_and_null_elements(violations):
    assert violations.get("vectorfinite_v", set()) == {
        "nan_el",
        "pos_inf",
        "neg_inf",
        "null_el",
    }


def test_norm_range_flags_misscaled_but_not_nan(violations):
    # nan_el is excluded (NaN norm -> VectorFinite's flag, not a range flag);
    # pos_inf/neg_inf have norm +Inf which IS out of range; null_el's norm is
    # NULL (null element poisons the fold) so it cannot range-flag.
    assert violations.get("vectornormrange_v", set()) == {
        "empty",
        "pos_inf",
        "neg_inf",
        "scaled",
        "tiny",
    }


def test_null_vector_never_flags(violations):
    flagged = set().union(*violations.values()) if violations else set()
    assert "null_vec" not in flagged
    assert "ok" not in flagged


def test_l2_norm_matches_python(spark):
    df = spark.createDataFrame(
        [(r[0], r[1]) for r in ROWS if r[1] and all(
            x is not None and math.isfinite(x) for x in r[1]
        )],
        SCHEMA,
    )
    got = {r.id: r.n for r in df.select("id", l2_norm(F.col("v")).alias("n")).collect()}
    for rid, vec in [(r[0], r[1]) for r in ROWS]:
        if rid in got:
            exact = math.sqrt(sum(float(x) ** 2 for x in vec))
            assert got[rid] == pytest.approx(exact, rel=1e-6), rid


def test_vector_suite_plan_is_pure_jvm(spark):
    """The fused row pass with vector constraints must carry NO Python
    stage: size/exists/aggregate are JVM-side HOF expressions."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    suite = Suite(
        name="vec",
        table="emb",
        constraints=[
            VectorShape("v", dim=2),
            VectorFinite("v"),
            VectorNormRange("v", lo=0.1, hi=10.0),
        ],
    )
    out = compile_suite(df, suite, row_id_col="id", part_id_col=None)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


# ---------------------------------------------------------------------------
# IVF index persistence
# ---------------------------------------------------------------------------


def test_ivf_index_roundtrip_matches_unindexed(spark, sf_dir, tmp_path):
    from smcchecker_spark.ops import similarity as SIM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 61 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cent = SIM.train_centroids(emb, k=8, sample=256)
    path = str(tmp_path / "ivf")
    SIM.save_ivf_index(emb, cent, path)

    # same results as the in-line ivf_topk with identical centroids
    want = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in SIM.ivf_topk(emb, queries, cent, k=5, n_probe=3).collect()
    )
    got_df = SIM.ivf_search(spark, path, queries, k=5, n_probe=3)
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"]) for r in got_df.collect()
    )
    assert got == want and len(got) > 0

    # the corpus scan is pruned to the probed cells (partition filter):
    # with ONE query probing 2 of 8 cells, the scan's PartitionFilters
    # carries a 2-value IN list — unprobed cells' files are never read
    one = queries.limit(1)
    narrow = SIM.ivf_search(spark, path, one, k=5, n_probe=2)
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    seg = plan[plan.find("PartitionFilters"):][:120]
    import re
    m = re.search(r"IN \(([0-9,]+)\)", seg)
    assert m and len(m.group(1).split(",")) == 2, seg


# ---------------------------------------------------------------------------
# ops/pca.py — covariance-sketch PCA
# ---------------------------------------------------------------------------


def _pca_df(spark, n=240, d=8, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    # anisotropic data: known dominant directions
    base = rng.normal(size=(n, d)) * np.array([5, 3, 1, 1, 0.5, 0.5, 0.1, 0.1])
    rows = [(i, base[i].tolist()) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        base,
    )


def test_fit_pca_matches_numpy(spark):
    import numpy as np

    from smcchecker_spark.ops import pca

    df, X = _pca_df(spark)
    m = pca.fit_pca(df, "embedding", k=4)
    mu = X.mean(axis=0)
    cov = (X - mu).T @ (X - mu) / X.shape[0]
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:4]
    ref = vecs[:, order].T
    for i in range(4):
        j = int(np.argmax(np.abs(ref[i])))
        if ref[i, j] < 0:
            ref[i] = -ref[i]
    assert np.allclose(m.mean, mu, atol=1e-9)
    assert np.allclose(m.components, ref, atol=1e-8)
    assert np.allclose(m.explained_variance, vals[order], atol=1e-8)
    assert (np.diff(m.explained_variance) <= 1e-12).all()


def test_fit_pca_partition_invariant(spark):
    import numpy as np

    from smcchecker_spark.ops import pca

    df, _ = _pca_df(spark)
    a = pca.fit_pca(df.repartition(1), "embedding", k=3)
    b = pca.fit_pca(df.repartition(16), "embedding", k=3)
    assert np.allclose(a.components, b.components, atol=1e-9)
    assert np.allclose(a.mean, b.mean, atol=1e-12)


def test_project_pca_matches_numpy_and_nulls(spark):
    import numpy as np

    from smcchecker_spark.ops import pca

    df, X = _pca_df(spark, n=60)
    m = pca.fit_pca(df, "embedding", k=3)
    bad = spark.createDataFrame(
        [(1000, None), (1001, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    out = {
        r["vec_id"]: r["pca"]
        for r in pca.project_pca(df.unionByName(bad), m, "embedding").collect()
    }
    want = np.round((X - m.mean) @ m.components.T, 9)
    for i in range(60):
        assert np.allclose(out[i], want[i], atol=1e-9)
    assert out[1000] is None and out[1001] is None


def test_fit_pca_validation_and_no_center(spark):
    import numpy as np
    import pytest as _pytest

    from smcchecker_spark.ops import pca

    df, X = _pca_df(spark, n=40)
    with _pytest.raises(ValueError, match="exceeds dim"):
        pca.fit_pca(df, "embedding", k=99)
    m = pca.fit_pca(df, "embedding", k=2, center=False)
    assert np.allclose(m.mean, 0)
    cov = X.T @ X / X.shape[0]
    vals, vecs = np.linalg.eigh(cov)
    assert np.allclose(
        sorted(m.explained_variance, reverse=True),
        sorted(vals, reverse=True)[:2],
        atol=1e-8,
    )


def test_project_pca_whiten_unit_variance(spark):
    import numpy as np

    from smcchecker_spark.ops import pca

    df, X = _pca_df(spark, n=300)
    m = pca.fit_pca(df, "embedding", k=4)
    out = np.array([
        r["pca"] for r in pca.project_pca(
            df, m, "embedding", whiten=True, round_dp=None
        ).collect()
    ])
    # per-dimension variance ~= 1 after whitening (population variance)
    var = out.var(axis=0)
    assert np.allclose(var, 1.0, atol=1e-6)
    # plain projection variance equals the eigenvalues instead
    raw = np.array([
        r["pca"] for r in pca.project_pca(
            df, m, "embedding", round_dp=None
        ).collect()
    ])
    assert np.allclose(raw.var(axis=0), m.explained_variance, rtol=1e-8)
