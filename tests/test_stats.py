"""Column stats, histograms, KS/PSI drift, t-digest (north-star §stats)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from smcchecker_spark import stats


@pytest.fixture(scope="module")
def num_df(spark):
    rng = np.random.default_rng(42)
    vals = rng.normal(50, 10, 2000).tolist()
    rows = [(i, float(v), f"s{i % 7}") for i, v in enumerate(vals)]
    rows += [(9000 + j, None, None) for j in range(100)]
    return spark.createDataFrame(rows, "id long, x double, s string").cache()


def test_column_stats_one_pass(spark, num_df):
    st = stats.column_stats(num_df, ["x", "s"])
    rows = {r["column"]: r for r in st.collect()}
    assert rows["x"]["n_rows"] == 2100
    assert rows["x"]["null_count"] == 100
    assert abs(rows["x"]["null_rate"] - 100 / 2100) < 1e-9
    assert rows["s"]["approx_ndv"] == pytest.approx(7, abs=1)
    med = rows["x"]["quantiles"][3]  # 0.5
    assert 48 < med < 52
    # one aggregate pass → no Exchange beyond the final single-row agg
    assert float(rows["x"]["min"]) < 20


def test_histogram_and_psi_self_is_zero(spark, num_df):
    h = stats.histogram(num_df, "x", lo=0, hi=100, bins=20)
    total = h.agg(F.sum("count")).collect()[0][0]
    assert total == 2000  # nulls excluded
    assert stats.psi(h, h) == pytest.approx(0.0, abs=1e-9)
    assert stats.ks_stat(h, h) == pytest.approx(0.0, abs=1e-12)


def test_drift_detects_shift(spark, num_df):
    shifted = num_df.withColumn("x", F.col("x") + F.lit(15.0))
    spec = stats.DriftSpec(column="x", metric="psi", threshold=0.2, lo=0, hi=100, bins=20)
    v, measured = stats.drift_violations(shifted, num_df, [spec], table="t")
    assert measured["x"] > 0.2
    rows = v.collect()
    assert len(rows) == 1
    assert rows[0]["error_type"] == "Distribution Drift"
    assert rows[0]["row_id"] == "__TABLE__"

    # no drift vs itself
    v2, m2 = stats.drift_violations(num_df, num_df, [spec])
    assert v2.count() == 0 and m2["x"] < 0.01


def test_ks_detects_shift(spark, num_df):
    shifted = num_df.withColumn("x", F.col("x") + F.lit(10.0))
    cur = stats.histogram(shifted, "x", 0, 100, 40)
    base = stats.histogram(num_df, "x", 0, 100, 40)
    ks = stats.ks_stat(cur, base)
    # normal(50,10) vs normal(60,10): true KS ≈ 0.38
    assert 0.25 < ks < 0.5


def test_tdigest_merge_and_quantiles():
    rng = np.random.default_rng(1)
    a, b = rng.normal(0, 1, 5000), rng.normal(0, 1, 5000)
    ta, tb = stats.TDigest(), stats.TDigest()
    ta.add(a)
    tb.add(b)
    merged = ta.merge(tb)
    allv = np.concatenate([a, b])
    for q in (0.1, 0.5, 0.9):
        assert merged.quantile(q) == pytest.approx(
            float(np.quantile(allv, q)), abs=0.08
        )
    # serialization roundtrip
    back = stats.TDigest.from_bytes(merged.to_bytes())
    assert back.quantile(0.5) == pytest.approx(merged.quantile(0.5), abs=1e-9)


def test_tdigest_exact_regime():
    """delta >> n: the k-scale width between adjacent singletons
    (2*delta/(pi*n)) stays > 1, so _compress never merges and the
    quantile is EXACTLY midpoint interpolation over the sorted values —
    the property q_tdigest_exact_quantiles' SQL oracle relies on.
    Exercised through the partial→serialize→merge path (7 chunks)."""
    rng = np.random.default_rng(7)
    v = rng.normal(50, 10, 500)
    merged = stats.TDigest(100_000)
    for chunk in np.array_split(v, 7):
        p = stats.TDigest(100_000)
        p.add(chunk)
        merged = merged.merge(stats.TDigest.from_bytes(p.to_bytes()))
    n = v.size
    sv = np.sort(v)
    cum = np.arange(1, n + 1) - 0.5
    for q in (0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0):
        assert merged.quantile(q) == float(np.interp(q * n, cum, sv))
    assert merged.means.size == n  # every point is its own centroid


def test_tdigest_distributed(spark, num_df):
    td = stats.tdigest_sketch(num_df, "x")
    assert td.total == 2000
    assert td.quantile(0.5) == pytest.approx(50, abs=1.5)
    assert td.quantile(0.99) == pytest.approx(50 + 2.326 * 10, abs=2.5)


def test_metrics_drift(spark):
    """Sketch-level drift between two runs' per-partition metrics rows."""
    from smcchecker_spark.stats import metrics_drift

    base = spark.createDataFrame(
        [(0, "lang", 0.0, 10), (0, "txt", 0.01, 100), (1, "lang", 0.0, 10)],
        "part_id int, column string, null_rate double, approx_ndv long",
    )
    cur = spark.createDataFrame(
        [(0, "lang", 0.2, 10), (0, "txt", 0.01, 500), (1, "lang", 0.01, 11)],
        "part_id int, column string, null_rate double, approx_ndv long",
    )
    got = {
        (r["part_id"], r["column"]): r
        for r in metrics_drift(cur, base, 0.05, 2.0).collect()
    }
    assert got[(0, "lang")]["drifted"]          # null rate jumped 0 -> 0.2
    assert got[(0, "txt")]["drifted"]           # ndv x5
    assert not got[(1, "lang")]["drifted"]      # both deltas inside bounds
    assert got[(0, "txt")]["ndv_ratio"] == 5.0


def test_column_stats_binary_payload(spark):
    """Binary columns report payload-SIZE stats (min/max/quantiles over
    length, ndv over content hash) instead of mojibake string min/max."""
    from smcchecker_spark import fixtures
    from smcchecker_spark.stats import column_stats, column_stats_by

    df = fixtures.generate_images(spark, n_rows=80, n_parts=4, seed=42, clean=True)
    st = {r["column"]: r for r in column_stats(df, ["bytes", "caption"]).collect()}
    b = st["bytes"]
    assert int(b["min"]) > 0 and int(b["max"]) >= int(b["min"])
    assert b["null_count"] == 0 and b["approx_ndv"] > 60  # ~distinct payloads
    assert b["quantiles"] is not None and all(
        int(b["min"]) <= q <= int(b["max"]) for q in b["quantiles"]
    )
    # grouped variant carries the same semantics per partition
    by = column_stats_by(df, "part_id", ["bytes"]).collect()
    assert len(by) == 4 and all(int(r["min"]) > 0 for r in by)


def test_embedding_drift_invariants(spark):
    """Identical snapshots -> zero drift; pure rescaling -> norm shift
    with (near-)zero direction drift; a directional shift moves the
    centroid cosine. Value parity vs SQL is the driver-gate
    embedding_drift oracle."""
    from pyspark.sql import functions as F

    from smcchecker_spark.stats import embedding_drift

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")

    same = embedding_drift(emb, emb, dim=64).first()
    assert abs(same.mean_cosine_distance) < 1e-12
    assert same.norm_shift == 0.0

    scaled = emb.withColumn(
        "embedding",
        F.transform("embedding", lambda x: x * F.lit(2.0).cast("float")),
    )
    s = embedding_drift(scaled, emb, dim=64).first()
    assert s.norm_shift == pytest.approx(1.0, rel=1e-3)  # norms ~1 -> ~2
    assert abs(s.mean_cosine_distance) < 1e-6  # direction preserved

    shifted = emb.withColumn(
        "embedding",
        F.concat(
            F.array(F.col("embedding")[0] + F.lit(0.5).cast("float")),
            F.slice("embedding", 2, 63),
        ),
    )
    d = embedding_drift(shifted, emb, dim=64).first()
    assert d.mean_cosine_distance > 0.01


# ------------------------------------------------------ mergeable HLL

def test_hll_sketches_merge_equals_global(spark):
    """THE mergeability contract: the NDV estimated from unioning the
    per-partition sketches matches the estimate of one global sketch over
    the same data to well within the sketch's rsd (the union's internal
    register representation differs — HLL_8 target vs HLL_4 sketches —
    so estimates are statistically, not bit-, identical: measured
    701 vs 703 on 700 true). This is what makes stored sketches a
    substitute for rescans."""
    from smcchecker_spark import stats

    df = spark.range(20000).select(
        (F.col("id") % 700).alias("v"),
        (F.col("id") % 6).alias("part_id"),
    )
    sk = stats.partition_hll_sketches(df, "part_id", ["v"])
    assert sk.count() == 6
    merged = {
        r["column"]: r["ndv_est"]
        for r in stats.merged_ndv(sk).collect()
    }
    direct = df.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("v").cast("string"), 12)
        ).alias("ndv")
    ).collect()[0]["ndv"]
    assert abs(merged["v"] - direct) / direct < 0.01
    # and the estimate honors the documented rsd against the exact NDV
    assert abs(merged["v"] - 700) / 700 < 0.05


def test_hll_ndv_drift_new_values(spark):
    from smcchecker_spark import stats

    base_df = spark.range(5000).select(
        (F.col("id") % 300).alias("v"), (F.col("id") % 4).alias("part_id")
    )
    # current adds 200 never-seen values on top of the same 300
    cur_df = spark.range(5000).select(
        (F.col("id") % 500).alias("v"), (F.col("id") % 4).alias("part_id")
    )
    base = stats.partition_hll_sketches(base_df, "part_id", ["v"])
    cur = stats.partition_hll_sketches(cur_df, "part_id", ["v"])
    row = stats.ndv_drift_from_sketches(cur, base).collect()[0]
    assert abs(row["ndv_base"] - 300) / 300 < 0.05
    assert abs(row["ndv_cur"] - 500) / 500 < 0.05
    # union == cur here (base values are a subset of cur's)
    assert abs(row["ndv_union"] - 500) / 500 < 0.05
    assert abs(row["new_values_est"] - 200) / 200 < 0.25
    # a column absent from the baseline: everything is new
    only_cur = stats.ndv_drift_from_sketches(
        cur, base.filter(F.lit(False))
    ).collect()[0]
    assert only_cur["ndv_base"] == 0
    assert only_cur["new_values_est"] == only_cur["ndv_cur"]


def test_sketch_drift_violations(spark):
    from smcchecker_spark import stats

    base_df = spark.range(4000).select(
        (F.col("id") % 100).alias("stable"),
        (F.col("id") % 100).alias("growing"),
        (F.col("id") % 4).alias("part_id"),
    )
    cur_df = spark.range(4000).select(
        (F.col("id") % 100).alias("stable"),
        (F.col("id") % 400).alias("growing"),  # 300 never-seen values
        (F.col("id") % 4).alias("part_id"),
    )
    base = stats.partition_hll_sketches(base_df, "part_id", ["stable", "growing"])
    cur = stats.partition_hll_sketches(cur_df, "part_id", ["stable", "growing"])
    v, drift = stats.sketch_drift_violations(cur, base, max_new_ratio=0.5,
                                             table="t")
    rows = {r["columns"]: r for r in v.collect()}
    assert set(rows) == {"growing"}
    r = rows["growing"]
    assert r["check_name"] == "ndv_drift_growing"
    assert r["severity"] == "warning" and r["row_id"] == "__TABLE__"
    # a column with no baseline sketch always flags
    v2, _ = stats.sketch_drift_violations(
        cur, base.filter(F.col("column") == "stable"), max_new_ratio=0.5
    )
    assert {r["columns"] for r in v2.collect()} == {"growing"}


# ---------------------------------------------------------------------------
# Expectations (table-level aggregate assertions)
# ---------------------------------------------------------------------------


def test_check_expectations_one_pass(spark):
    from smcchecker_spark.stats import Expectation, check_expectations

    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, None, "a"), (4, 40.0, None)],
        "id long, v double, s string",
    )
    out = check_expectations(
        df,
        [
            Expectation("row_count", lo=4, hi=4),
            Expectation("null_rate", "v", hi=0.2),       # 0.25 → fail
            Expectation("null_rate", "s", hi=0.5),       # 0.25 → ok
            Expectation("ndv", "s", lo=2, hi=2),
            Expectation("min", "v", lo=0),
            Expectation("max", "v", hi=30),              # 40 → fail
            Expectation("mean", "id", lo=2.5, hi=2.5),
        ],
    )
    got = {r["check"]: (r["value"], r["ok"]) for r in out.collect()}
    assert got["row_count"] == (4.0, True)
    assert got["null_rate(v)"] == (0.25, False)
    assert got["null_rate(s)"] == (0.25, True)
    assert got["ndv(s)"] == (2.0, True)
    assert got["min(v)"] == (10.0, True)
    assert got["max(v)"] == (40.0, False)
    assert got["mean(id)"] == (2.5, True)

    # ONE scan, ONE aggregate — expectations never multiply I/O
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Scan ExistingRDD") == 1

    # all-null column: NULL metric fails closed
    df2 = spark.createDataFrame([(1, None), (2, None)], "id long, v double")
    out2 = check_expectations(df2, [Expectation("min", "v", lo=0)])
    assert out2.first()["ok"] is False


def test_check_expectations_validates(spark):
    from smcchecker_spark.stats import Expectation, check_expectations

    import pytest as _pt

    with _pt.raises(ValueError):
        Expectation("median", "v", lo=0)
    with _pt.raises(ValueError):
        Expectation("row_count", "v", lo=0)
    with _pt.raises(ValueError):
        Expectation("min", "v")
    df = spark.range(3)
    with _pt.raises(ValueError):
        check_expectations(df, [])
    with _pt.raises(ValueError):
        check_expectations(
            df, [Expectation("min", "id", lo=0), Expectation("min", "id", hi=9)]
        )


def test_check_expectations_timestamp_freshness(spark):
    """min/max/mean on timestamp columns compare in epoch seconds —
    a freshness gate is max(ts) >= epoch(as_of - max_age)."""
    import datetime as dt

    from smcchecker_spark.stats import Expectation, check_expectations

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 0, 0)),
         (2, dt.datetime(2024, 1, 2, 0, 0, 0))],
        "id long, ts timestamp",
    )
    as_of = dt.datetime(2024, 1, 2, 6, 0, 0, tzinfo=dt.timezone.utc)
    floor = (as_of - dt.timedelta(days=1)).timestamp()
    fresh = check_expectations(df, [Expectation("max", "ts", lo=floor)])
    assert fresh.first()["ok"] is True
    stale = check_expectations(
        df, [Expectation("max", "ts", lo=floor + 86400.0)]
    )
    assert stale.first()["ok"] is False


# ---------------------------------------------------------------------------
# stats.categorical_drift / categorical_psi / js_divergence
# ---------------------------------------------------------------------------


def test_categorical_drift_hand_computed(spark):
    import math

    cur = spark.createDataFrame([("a",), ("a",), ("b",)], "v string")
    base = spark.createDataFrame([("a",), ("c",), (None,)], "v string")
    rows = {r["value"]: r for r in stats.categorical_drift(cur, base, "v").collect()}
    assert set(rows) == {"a", "b", "c", "NULL"}
    eps = 1e-6
    p_a, q_a = 2 / 3 + eps, 1 / 3 + eps
    assert rows["a"]["p"] == round(p_a, 9) and rows["a"]["q"] == round(q_a, 9)
    assert rows["a"]["psi_term"] == round((p_a - q_a) * math.log(p_a / q_a), 9)
    js_a = (p_a * math.log(2 * p_a / (p_a + q_a))
            + q_a * math.log(2 * q_a / (p_a + q_a))) / 2
    assert rows["a"]["js_term"] == round(js_a, 9)
    # value only in base ('c') and NULL-as-category both present
    assert rows["c"]["p"] == round(eps, 9)
    assert rows["NULL"]["q"] == round(1 / 3 + eps, 9)


def test_categorical_scalars_bounds(spark):
    import math

    same = spark.createDataFrame([("x",), ("y",)], "v string")
    assert abs(stats.categorical_psi(same, same, "v")) < 1e-9
    assert abs(stats.js_divergence(same, same, "v")) < 1e-9
    a = spark.createDataFrame([("x",)] * 5, "v string")
    b = spark.createDataFrame([("y",)] * 5, "v string")
    # disjoint supports: JS ~= ln 2, PSI huge but finite
    assert abs(stats.js_divergence(a, b, "v") - math.log(2)) < 1e-3
    assert stats.categorical_psi(a, b, "v") > 10


def test_expectation_percentile_metric(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    out = {r["check"]: r for r in stats.check_expectations(
        df,
        [
            stats.Expectation("p50", "v", lo=40.0, hi=60.0),
            stats.Expectation("p99", "v", hi=95.0),           # 99.01 > 95 -> fail
            stats.Expectation("p95", "v", hi=99.0, approx=True),
        ],
    ).collect()}
    assert out["p50(v)"]["value"] == 50.5 and out["p50(v)"]["ok"] is True
    assert out["p99(v)"]["ok"] is False
    assert out["p95(v)"]["ok"] is True
    import pytest as _pytest
    with _pytest.raises(ValueError, match="percentile"):
        stats.Expectation("p0", "v", lo=1.0)
    with _pytest.raises(ValueError, match="percentile"):
        stats.Expectation("q50", "v", lo=1.0)


# ---------------------------------------------------------------------------
# suggest_fds — functional-dependency discovery (feeds FunctionalDep)
# ---------------------------------------------------------------------------


def test_suggest_fds_exact(spark):
    df = spark.createDataFrame(
        # k determines c (pure function); k does NOT determine v;
        # NULL dep values are counted null-safely (k=3 twice with NULL c
        # stays consistent)
        [(1, "a", 10), (1, "a", 20), (2, "b", 10), (2, "b", 30),
         (3, None, 1), (3, None, 2)],
        "k int, c string, v int",
    )
    out = stats.suggest_fds(
        df, determinants=["k"], dependents=["c", "v"], approx=False
    )
    got = {(r.determinant, r.dependent): (r.ndv_lhs, r.ndv_pair, r.holds)
           for r in out.collect()}
    assert got[("k", "c")] == (3, 3, True)
    assert got[("k", "v")] == (3, 6, False)


def test_suggest_fds_skips_self_and_approx_mode(spark):
    df = spark.createDataFrame(
        [(i, i % 5) for i in range(200)], "k int, c int"
    )
    out = stats.suggest_fds(
        df, determinants=["k", "c"], dependents=["k", "c"], approx=True
    ).collect()
    # self-pairs skipped: only (k->c) and (c->k)
    assert {(r.determinant, r.dependent) for r in out} == {
        ("k", "c"), ("c", "k")
    }
    got = {(r.determinant, r.dependent): r.holds for r in out}
    assert got[("k", "c")] is True    # k -> k%5 holds (within HLL tolerance)
    assert got[("c", "k")] is False   # 5 values can't determine 200 keys


def test_column_entropy_hand_computed(spark):
    # 4 values of a: {x:2, y:1, z:1} -> H = ln4 - (2 ln2)/4 = 1.5 ln2 - ... compute directly
    df = spark.createDataFrame(
        [("x", 1), ("x", 1), ("y", 1), ("z", None)], "a string, b int"
    )
    rows = {r["column"]: r for r in stats.column_entropy(df, ["a", "b"]).collect()}
    n = 4
    expected_a = math.log(n) - (2 * math.log(2) + 1 * math.log(1) + 1 * math.log(1)) / n
    assert rows["a"]["n_values"] == 4
    assert rows["a"]["ndv"] == 3
    assert rows["a"]["entropy"] == pytest.approx(expected_a, abs=1e-8)
    # b: three non-null 1s -> entropy 0 (constant column), nulls excluded
    assert rows["b"]["n_values"] == 3
    assert rows["b"]["ndv"] == 1
    assert rows["b"]["entropy"] == pytest.approx(0.0, abs=1e-9)


def test_column_entropy_uniform_is_ln_ndv(spark):
    df = spark.createDataFrame([(i % 8,) for i in range(800)], "v int")
    row = stats.column_entropy(df, ["v"]).collect()[0]
    assert row["entropy"] == pytest.approx(math.log(8), abs=1e-8)


def test_mutual_information_determined_and_independent(spark):
    # b = f(a): MI == H(a) == H(b); nmi == 1
    df = spark.createDataFrame(
        [(i % 4, (i % 4) * 10) for i in range(400)], "a int, b int"
    )
    row = stats.mutual_information(df, "a", "b").collect()[0]
    assert row["n_pairs"] == 400
    assert row["mi"] == pytest.approx(math.log(4), abs=1e-8)
    assert row["nmi"] == pytest.approx(1.0, abs=1e-8)

    # independent uniform columns (complete cross product): MI == 0
    ind = spark.createDataFrame(
        [(i % 4, (i // 4) % 5) for i in range(400)], "a int, b int"
    )
    row2 = stats.mutual_information(ind, "a", "b").collect()[0]
    assert row2["mi"] == pytest.approx(0.0, abs=1e-9)

    # constant column: H == 0 -> nmi NULL, MI 0
    const = spark.createDataFrame([(i % 4, 7) for i in range(40)], "a int, b int")
    row3 = stats.mutual_information(const, "a", "b").collect()[0]
    assert row3["mi"] == pytest.approx(0.0, abs=1e-9)
    assert row3["nmi"] is None


def test_correlation_matrix_exact_pairs(spark):
    # y = 2x exactly -> corr 1; z = -x -> corr -1 with both; nulls pairwise-skipped
    rows = [(float(i), 2.0 * i, -float(i)) for i in range(50)]
    rows.append((None, 1.0, 2.0))
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = {
        (r["col_a"], r["col_b"]): r
        for r in stats.correlation_matrix(df, ["x", "y", "z"]).collect()
    }
    assert set(out) == {("x", "y"), ("x", "z"), ("y", "z")}
    assert out[("x", "y")]["n_pairs"] == 50  # null row skipped
    assert out[("x", "y")]["corr"] == pytest.approx(1.0, abs=1e-6)
    assert out[("x", "z")]["corr"] == pytest.approx(-1.0, abs=1e-6)
    assert out[("y", "z")]["n_pairs"] == 51  # both non-null in the extra row


def test_correlation_matrix_constant_is_null(spark):
    df = spark.createDataFrame([(float(i), 3.0) for i in range(20)], "x double, c double")
    row = stats.correlation_matrix(df, ["x", "c"]).collect()[0]
    assert row["corr"] is None


def test_expectation_distinctness(spark):
    df = spark.createDataFrame(
        [(i, i % 5) for i in range(100)], "k int, c int"
    )
    out = {
        r["check"]: r
        for r in stats.check_expectations(
            df,
            [
                stats.Expectation("distinctness", "k", lo=0.99),
                stats.Expectation("distinctness", "c", hi=0.10),
            ],
        ).collect()
    }
    assert out["distinctness(k)"]["value"] == pytest.approx(1.0)
    assert out["distinctness(k)"]["ok"] is True
    assert out["distinctness(c)"]["value"] == pytest.approx(0.05)
    assert out["distinctness(c)"]["ok"] is True
    # failing bound: c is not key-like
    bad = stats.check_expectations(
        df, [stats.Expectation("distinctness", "c", lo=0.99)]
    ).collect()[0]
    assert bad["ok"] is False


def test_metric_anomalies_flags_spike(spark):
    # stable series 100±2, then a spike; z-flag fires only on the spike
    rows = [("m", i, 100.0 + (i % 3)) for i in range(8)]
    rows.append(("m", 8, 500.0))       # spike
    rows.append(("m", 9, 101.0))       # back to normal
    df = spark.createDataFrame(rows, "metric string, run int, value double")
    out = {
        r["run"]: r
        for r in stats.metric_anomalies(
            df, value_col="value", order_col="run",
            series_cols=["metric"], window=5, k=3.0,
        ).collect()
    }
    assert out[8]["anomalous"] is True
    assert abs(out[8]["zscore"]) > 3.0
    # cold start: first min_history points never z-flag
    assert out[0]["zscore"] is None and out[0]["anomalous"] is False
    assert out[1]["zscore"] is None
    # normal points unflagged; post-spike point judged against a window
    # that now CONTAINS the spike (std blew up) -> not flagged either
    assert all(not out[i]["anomalous"] for i in range(8))
    assert out[9]["anomalous"] is False


def test_metric_anomalies_rel_change_and_zero_variance(spark):
    # constant history: zero variance -> no z flag even on a jump,
    # but the relative-change bound catches it
    rows = [("m", i, 50.0) for i in range(6)] + [("m", 6, 200.0)]
    df = spark.createDataFrame(rows, "metric string, run int, value double")
    plain = stats.metric_anomalies(
        df, value_col="value", order_col="run",
        series_cols=["metric"], window=5, k=3.0,
    ).collect()
    assert all(r["zscore"] is None for r in plain)
    assert all(r["anomalous"] is False for r in plain)
    with_rel = {
        r["run"]: r
        for r in stats.metric_anomalies(
            df, value_col="value", order_col="run",
            series_cols=["metric"], window=5, k=3.0, max_rel_change=1.0,
        ).collect()
    }
    assert with_rel[6]["anomalous"] is True
    assert with_rel[6]["rel_change"] == pytest.approx(3.0)
    assert all(not with_rel[i]["anomalous"] for i in range(6))


def test_metric_anomalies_requires_series_cols(spark):
    df = spark.createDataFrame([(0, 1.0)], "run int, value double")
    with pytest.raises(ValueError, match="series_cols"):
        stats.metric_anomalies(df, order_col="run", series_cols=None)
