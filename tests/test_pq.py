"""Product quantization (ops/pq.py): integer-exact encode/ADC vs
numpy brute force, partial-vs-full top-k parity, trained-codebook
quality, and plan shape (LUT scoring is a native expression)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from smcchecker_spark.ops import pq, quant


@pytest.fixture(scope="module")
def qdf(spark):
    rng = np.random.default_rng(11)
    rows = [
        (i, [int(x) for x in rng.integers(-127, 128, 64)])
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "vec_id long, q array<int>").cache()


def _np_encode(X, CB):
    m, k, ds = CB.shape
    codes = np.empty((len(X), m), dtype=np.int64)
    for j in range(m):
        S = X[:, j * ds : (j + 1) * ds]
        d2 = ((S[:, None, :] - CB[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


def test_formula_codebooks_deterministic():
    a = pq.formula_codebooks()
    b = pq.formula_codebooks()
    assert a.shape == (8, 16, 8) and np.array_equal(a, b)
    assert a.min() >= -15 and a.max() <= 15
    # every code's subvector is distinct within each subspace — a
    # degenerate all-equal codebook would silently test nothing
    for j in range(8):
        assert len({tuple(v) for v in a[j]}) == 16


def test_encode_matches_numpy(spark, qdf):
    CB = pq.formula_codebooks()
    got = {
        r["vec_id"]: list(r["pq_codes"])
        for r in pq.pq_encode(qdf, CB).collect()
    }
    X = np.array(
        [r["q"] for r in qdf.orderBy("vec_id").collect()], dtype=np.int64
    )
    want = _np_encode(X, CB)
    for i in range(len(X)):
        assert got[i] == list(want[i]), i


def test_encode_tie_takes_lowest_code(spark):
    # a codebook with two identical entries: argmin must pick index 0
    CB = np.zeros((1, 4, 4), dtype=np.int64)
    CB[0, 1] = CB[0, 0]  # duplicate of code 0
    CB[0, 2] = 9
    CB[0, 3] = -9
    df = spark.createDataFrame(
        [(1, [0, 0, 0, 0])], "vec_id long, q array<int>"
    )
    assert pq.pq_encode(df, CB).first()["pq_codes"] == [0]


def test_adc_equals_reconstruction_distance(spark, qdf):
    """ADC distance of a row == exact squared L2 between the query and
    the row's PQ reconstruction (the identity ADC is built on)."""
    CB = pq.formula_codebooks()
    enc = pq.pq_encode(qdf, CB)
    rng = np.random.default_rng(3)
    query = rng.integers(-127, 128, 64).astype(np.int64)
    lut = pq.adc_lut(query, CB)
    got = {
        r["vec_id"]: r["d"]
        for r in enc.select(
            "vec_id",
            pq.adc_distance_expr(F.col("pq_codes"), lut).alias("d"),
        ).collect()
    }
    for r in enc.collect():
        rec = np.concatenate(
            [CB[j][r["pq_codes"][j]] for j in range(8)]
        )
        assert got[r["vec_id"]] == int(((query - rec) ** 2).sum())


def test_topk_matches_numpy_and_partial_parity(spark, qdf):
    CB = pq.formula_codebooks()
    enc = pq.pq_encode(qdf, CB).cache()
    rng = np.random.default_rng(4)
    query = rng.integers(-127, 128, 64).astype(np.int64)
    full = pq.pq_topk(enc, query, CB, k=10).collect()
    part = pq.pq_topk_partial(
        enc.repartition(7), query, CB, k=10
    ).collect()
    f = [(r["neighbor_id"], r["adc_dist"], r["rank"]) for r in full]
    p = [(r["neighbor_id"], r["adc_dist"], r["rank"]) for r in part]
    assert sorted(f) == sorted(p) and len(f) == 10
    # numpy brute force
    X = np.array(
        [r["q"] for r in qdf.orderBy("vec_id").collect()], dtype=np.int64
    )
    codes = _np_encode(X, CB)
    lut = pq.adc_lut(query, CB)
    dists = lut[np.arange(8)[None, :], codes].sum(axis=1)
    order = sorted(range(len(X)), key=lambda i: (dists[i], i))[:10]
    assert [(n, d) for n, d, _ in sorted(f, key=lambda t: t[2])] == [
        (i, int(dists[i])) for i in order
    ]


def test_trained_codebooks_beat_formula_on_clustered_data(spark):
    """k-means codebooks must reconstruct clustered vectors better
    than the closed-form grid — the point of training."""
    rng = np.random.default_rng(9)
    centers = rng.integers(-100, 101, (4, 64))
    rows = []
    for i in range(256):
        v = centers[i % 4] + rng.integers(-3, 4, 64)
        rows.append((i, [int(x) for x in np.clip(v, -127, 127)]))
    df = spark.createDataFrame(rows, "vec_id long, q array<int>")
    trained = pq.train_pq_codebooks(df, m=8, k=16, sample=256)
    base = pq.formula_codebooks()

    def total_err(CB):
        enc = pq.pq_encode(df, CB)
        return (
            pq.reconstruction_error(enc, CB)
            .agg(F.sum("pq_sq_err"))
            .first()[0]
        )

    assert total_err(trained) < total_err(base) / 4


def test_pq_compression_shape(spark, qdf):
    CB = pq.formula_codebooks()
    row = pq.pq_encode(qdf, CB).first()
    assert len(row["pq_codes"]) == 8  # 64 dims -> 8 codes (16x vs int8)
    assert all(0 <= c < 16 for c in row["pq_codes"])


def test_adc_scoring_has_no_python_stage(spark, qdf):
    """The scoring scan must stay JVM-side: only the one-time encode is
    an Arrow stage; pq_topk over an encoded table plans zero Python."""
    import io
    from contextlib import redirect_stdout

    CB = pq.formula_codebooks()
    enc = spark.createDataFrame(
        [(r["vec_id"], list(r["pq_codes"]))
         for r in pq.pq_encode(qdf, CB).collect()],
        "vec_id long, pq_codes array<int>",
    )
    query = np.zeros(64, dtype=np.int64)
    buf = io.StringIO()
    with redirect_stdout(buf):
        pq.pq_topk(enc, query, CB, k=5).explain("formatted")
    plan = buf.getvalue()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_ivfpq_exhaustive_equals_pq_and_pruned_is_subset(spark):
    """n_probe = n_cells makes IVF-PQ identical to exact PQ top-k over
    the whole index; a pruned probe returns a subset ranking whose
    entries keep their ADC distances; recall@10 of 4/16 probes on
    clustered data stays useful (>= 0.5)."""
    from smcchecker_spark.ops import similarity

    rng = np.random.default_rng(21)
    centers = rng.standard_normal((16, 64))
    rows = []
    for i in range(400):
        v = centers[i % 16] + rng.normal(0, 0.05, 64)
        q = np.clip(np.rint(v / max(np.abs(v).max(), 1e-12) * 127),
                    -127, 127)
        rows.append((i, [float(x) for x in v], [int(x) for x in q]))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, q array<int>"
    ).cache()
    cents = similarity.train_centroids(df, k=16, sample=400)
    CB = pq.train_pq_codebooks(df, m=8, k=16, sample=400)
    index = pq.ivfpq_encode(df, cents, CB).cache()
    qv = np.array(rows[5][1])
    qq = np.array(rows[5][2], dtype=np.int64)
    exact = pq.pq_topk(
        index.select("vec_id", "pq_codes"), qq, CB, k=10
    ).collect()
    exh = pq.ivfpq_topk(index, qv, qq, cents, CB, k=10, n_probe=16
                        ).collect()
    assert [(r["neighbor_id"], r["adc_dist"]) for r in exh] == \
           [(r["neighbor_id"], r["adc_dist"]) for r in exact]
    pruned = pq.ivfpq_topk(index, qv, qq, cents, CB, k=10, n_probe=4
                           ).collect()
    exact_d = {r["neighbor_id"]: r["adc_dist"] for r in exact}
    hit = sum(1 for r in pruned if r["neighbor_id"] in exact_d)
    assert hit >= 5
    for r in pruned:
        if r["neighbor_id"] in exact_d:
            assert r["adc_dist"] == exact_d[r["neighbor_id"]]
