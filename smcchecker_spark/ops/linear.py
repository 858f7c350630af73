"""Distributed logistic-regression quality classifier.

The standard corpus-curation move (CCNet, GPT-3, LLaMA data pipelines):
train a cheap linear classifier that separates a trusted reference
corpus from the raw crawl, then keep/downsample by predicted quality.
The features are whatever numeric columns the pipeline already
computes (``text.quality_score`` components, LM scores, repetition
fractions, URL features...).

Spark-first training shape: full-batch gradient descent where EACH
ITERATION IS ONE AGGREGATION — the executors compute
``avg((sigmoid(x·w) − y) · x_j)`` per feature as native Column
expressions (JVM-side, map-side combined), and the driver receives
d+2 scalars per step (d gradients, bias gradient, loss) regardless of
corpus size. No MLlib dependency, no per-row Python, no data movement:
at 10^12 rows each step is a column-pruned scan with a partial-agg
shuffle of P·(d+2) doubles. Features are standardized once (another
single aggregation) so one learning rate fits all columns.

Determinism note: floating-point aggregation order varies with
partitioning, so trained weights are reproducible to ~1e-12 relative,
not bit-exact — this is a QUALITY model, not a correctness path (the
engine's correctness-path operators are integer-exact by design).
Tests therefore compare against a numpy reference with tolerances.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class LinearModel:
    feature_cols: tuple[str, ...]
    means: tuple[float, ...]
    stds: tuple[float, ...]
    weights: tuple[float, ...]  # one per feature, on standardized scale
    bias: float

    def score_expr(self) -> Column:
        """sigmoid(w·(x−μ)/σ + b) as a native Column — map-only scoring."""
        z = F.lit(float(self.bias))
        for c, m, s, w in zip(
            self.feature_cols, self.means, self.stds, self.weights
        ):
            z = z + F.lit(float(w)) * (
                (F.coalesce(F.col(c).cast("double"), F.lit(float(m)))
                 - F.lit(float(m))) / F.lit(float(s))
            )
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def _standardization(df: DataFrame, cols: list[str]) -> tuple[list, list]:
    """One aggregation: per-feature mean and (population) std; zero-
    variance features get σ=1 so they contribute nothing rather than
    dividing by zero."""
    aggs = []
    for c in cols:
        x = F.col(c).cast("double")
        aggs.append(F.avg(x).alias(f"m_{c}"))
        aggs.append(F.stddev_pop(x).alias(f"s_{c}"))
    row = df.agg(*aggs).collect()[0]
    means = [float(row[f"m_{c}"] or 0.0) for c in cols]
    stds = [
        float(row[f"s_{c}"]) if row[f"s_{c}"] and row[f"s_{c}"] > 0 else 1.0
        for c in cols
    ]
    return means, stds


def train_logreg(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 60,
    lr: float = 1.0,
    l2: float = 1e-4,
) -> LinearModel:
    """Full-batch GD; see module docstring for the per-iteration plan
    shape. ``label_col`` must be 0/1 (or boolean). NULL features are
    imputed to the feature mean (standardized 0). Returns the model;
    persist it as plain columns if you train once and score often."""
    if not feature_cols:
        raise ValueError("need at least one feature column")
    means, stds = _standardization(df, feature_cols)

    y = F.col(label_col).cast("double")
    xs = [
        (F.coalesce(F.col(c).cast("double"), F.lit(m)) - F.lit(m))
        / F.lit(s)
        for c, m, s in zip(feature_cols, means, stds)
    ]
    # cache the standardized projection: every iteration scans this
    # narrow (d+1)-column frame, not the corpus
    proj = df.select(
        y.alias("_y"), *[xj.alias(f"_x{j}") for j, xj in enumerate(xs)]
    )
    proj = proj.where(F.col("_y").isNotNull()).cache()
    try:
        if proj.limit(1).count() == 0:
            raise ValueError(
                "train_logreg needs at least one row with a non-null label"
            )
        d = len(feature_cols)
        w = np.zeros(d)
        b = 0.0
        for _ in range(iters):
            z = F.lit(float(b))
            for j in range(d):
                z = z + F.lit(float(w[j])) * F.col(f"_x{j}")
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            err = p - F.col("_y")
            aggs = [F.avg(err * F.col(f"_x{j}")).alias(f"g{j}")
                    for j in range(d)]
            aggs.append(F.avg(err).alias("gb"))
            row = proj.agg(*aggs).collect()[0]
            g = np.array([row[f"g{j}"] for j in range(d)]) + l2 * w
            w = w - lr * g
            b = b - lr * float(row["gb"])
    finally:
        proj.unpersist()
    return LinearModel(
        feature_cols=tuple(feature_cols),
        means=tuple(means),
        stds=tuple(stds),
        weights=tuple(float(v) for v in w),
        bias=float(b),
    )


def score_quality(
    df: DataFrame, model: LinearModel, out_col: str = "quality_prob"
) -> DataFrame:
    """Attach the model's probability — map-only, whole-stage codegen
    (the model is a handful of literals folded into the projection)."""
    return df.withColumn(out_col, model.score_expr())


def save_model(model: LinearModel, path: str) -> None:
    """Persist as a small JSON artifact."""
    import json

    with open(path, "w", encoding="utf-8") as fh:
        json.dump(
            {
                "feature_cols": list(model.feature_cols),
                "means": list(model.means),
                "stds": list(model.stds),
                "weights": list(model.weights),
                "bias": model.bias,
            },
            fh,
        )


def load_model(path: str) -> LinearModel:
    import json

    with open(path, encoding="utf-8") as fh:
        d = json.load(fh)
    return LinearModel(
        feature_cols=tuple(d["feature_cols"]),
        means=tuple(d["means"]),
        stds=tuple(d["stds"]),
        weights=tuple(d["weights"]),
        bias=d["bias"],
    )
