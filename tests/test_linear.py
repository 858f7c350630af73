"""Distributed logistic regression (ops/linear.py): numpy-reference
parity, separable-data accuracy, NULL handling, artifact roundtrip,
map-only scoring plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from smcchecker_spark.ops import linear


def _numpy_logreg(X, y, iters, lr, l2):
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    sd[sd == 0] = 1.0
    Xs = (X - mu) / sd
    w = np.zeros(X.shape[1])
    b = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xs @ w + b)))
        err = p - y
        w = w - lr * ((Xs.T @ err) / len(y) + l2 * w)
        b = b - lr * err.mean()
    return mu, sd, w, b


def _mkdf(spark, X, y):
    rows = [
        (i, float(x[0]), float(x[1]), int(t))
        for i, (x, t) in enumerate(zip(X, y))
    ]
    return spark.createDataFrame(rows, "id long, f1 double, f2 double, label int")


def test_matches_numpy_reference(spark):
    rng = np.random.default_rng(5)
    X = rng.normal(0, 2, (400, 2))
    y = (X[:, 0] + 0.5 * X[:, 1] + rng.normal(0, 0.3, 400) > 0).astype(int)
    df = _mkdf(spark, X, y)
    m = linear.train_logreg(df, ["f1", "f2"], "label", iters=40, lr=0.8, l2=1e-3)
    mu, sd, w, b = _numpy_logreg(X, y.astype(float), 40, 0.8, 1e-3)
    # float aggregation order differs between engines: tolerances, not
    # equality (this is the quality path, not the correctness path)
    assert np.allclose(m.means, mu, atol=1e-9)
    assert np.allclose(m.weights, w, rtol=1e-6, atol=1e-8)
    assert abs(m.bias - b) < 1e-7


def test_separable_data_high_accuracy(spark):
    rng = np.random.default_rng(7)
    X = rng.normal(0, 1, (600, 2))
    y = (2 * X[:, 0] - X[:, 1] > 0).astype(int)
    df = _mkdf(spark, X, y)
    m = linear.train_logreg(df, ["f1", "f2"], "label", iters=80, lr=1.0)
    scored = linear.score_quality(df, m)
    acc = scored.select(
        F.avg(((F.col("quality_prob") > 0.5).cast("int") == F.col("label"))
              .cast("double")).alias("a")
    ).collect()[0]["a"]
    assert acc > 0.97
    # weight DIRECTION matches the generating rule (2, -1)
    assert m.weights[0] > 0 > m.weights[1]


def test_null_features_impute_to_mean(spark):
    df = spark.createDataFrame(
        [(1.0, 0.0, 1), (3.0, 0.0, 1), (None, 0.0, 0), (-1.0, 0.0, 0)],
        "f1 double, f2 double, label int",
    )
    m = linear.train_logreg(df, ["f1", "f2"], "label", iters=10, lr=0.5)
    scored = {r["f1"]: r["quality_prob"] for r in linear.score_quality(df, m).collect()}
    # NULL scores at the standardized origin's feature contribution
    assert scored[None] is not None
    with pytest.raises(ValueError):
        linear.train_logreg(df, [], "label")


def test_artifact_roundtrip_and_plan(spark, tmp_path):
    df = spark.createDataFrame(
        [(float(i % 7), float(i % 3), i % 2) for i in range(60)],
        "f1 double, f2 double, label int",
    )
    m = linear.train_logreg(df, ["f1", "f2"], "label", iters=5)
    p = str(tmp_path / "model.json")
    linear.save_model(m, p)
    m2 = linear.load_model(p)
    assert m2 == m
    plan = linear.score_quality(df, m)._jdf.queryExecution().executedPlan().toString()
    # scoring is a pure projection: no exchange, no Python stage
    assert "Exchange" not in plan and "ArrowEvalPython" not in plan


def test_empty_or_unlabeled_input_raises_cleanly(spark):
    df = spark.createDataFrame([], "f1 double, f2 double, label int")
    with pytest.raises(ValueError, match="non-null label"):
        linear.train_logreg(df, ["f1", "f2"], "label", iters=2)
    df2 = spark.createDataFrame(
        [(1.0, 2.0, None)], "f1 double, f2 double, label int"
    )
    with pytest.raises(ValueError, match="non-null label"):
        linear.train_logreg(df2, ["f1", "f2"], "label", iters=2)
