"""Distributed PCA over embedding columns — the dimensionality-reduction
step of embedding dedup/ANN pipelines (SemDeDup's cluster space, IVF cell
spaces, 4x-compressed vector storage on top of ``ops/quant.py``).

Shape (the classic covariance-sketch PCA, scalable because the corpus
never shuffles):

1. ONE Arrow pass computes per-partition moment partials — (count,
   sum-vector d, outer-product sum d*d) — a pure map; the driver
   receives #partitions tiny rows (d=64 → 4 KB each), never data rows.
2. The d*d covariance eigendecomposition runs on the driver with numpy
   (d up to a few thousand is milliseconds — the corpus size is
   irrelevant to this step).
3. Projection is a map-only Arrow GEMM against the broadcast component
   matrix — again zero shuffles.

Determinism: component signs are normalized (largest-|value| coordinate
positive), so re-runs and resumes produce identical projections.

Reference parity: no analogue (the reference validates tabular rows);
part of the beyond-reference embedding toolkit (SURVEY §2 data-pipeline
ops) next to similarity.py and ops/quant.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@dataclass(frozen=True)
class PcaModel:
    mean: np.ndarray          # (d,) — zeros when center=False
    components: np.ndarray    # (k, d), rows orthonormal, variance-desc
    explained_variance: np.ndarray  # (k,), eigenvalues (desc)

    @property
    def k(self) -> int:
        return self.components.shape[0]

    @property
    def dim(self) -> int:
        return self.components.shape[1]


def fit_pca(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    center: bool = True,
) -> PcaModel:
    """Fit PCA from one pass of moment partials (see module docstring).

    Null/wrong-length vectors are skipped (count what reaches the
    partials). Raises on an empty corpus or k > d."""
    first = df.select(F.size(F.col(vec_col)).alias("d")).filter(
        F.col("d") > 0
    ).first()
    if first is None:
        raise ValueError("fit_pca: no non-empty vectors")
    d = first["d"]
    if k > d:
        raise ValueError(f"k={k} exceeds dim={d}")

    schema = "n long, s array<double>, m array<double>"

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(d)
        m = np.zeros((d, d))
        for pdf in batches:
            vecs = [
                v for v in pdf["_v"].values
                if v is not None and len(v) == d
            ]
            if not vecs:
                continue
            X = np.array([list(v) for v in vecs], dtype=np.float64)
            n += X.shape[0]
            s += X.sum(axis=0)
            m += X.T @ X
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "m": [m.reshape(-1).tolist()]}
        )

    part = df.select(F.col(vec_col).alias("_v")).mapInPandas(
        partials, schema
    )
    # second-level reduction IN SPARK: the per-partition moment rows are
    # d*d-sized (32 KB at d=64), so collecting one per partition puts
    # #partitions x d^2 on the driver — GBs at 100k-partition corpus
    # scale. Explode each row to (cell, value) and sum per cell instead:
    # the shuffle moves #partitions x (d^2+d+1) tiny rows and the driver
    # receives exactly d^2 + d + 1 scalars regardless of corpus size.
    reduced = (
        part.select(
            F.explode(
                F.concat(
                    F.array(F.struct(F.lit(-1).alias("i"),
                                     F.col("n").cast("double").alias("v"))),
                    F.transform(
                        "s",
                        lambda x, i: F.struct(i.alias("i"), x.alias("v")),
                    ),
                    F.transform(
                        "m",
                        lambda x, i: F.struct(
                            (i + d).alias("i"), x.alias("v")
                        ),
                    ),
                )
            ).alias("c")
        )
        .groupBy("c.i")
        .agg(F.sum("c.v").alias("v"))
        .collect()
    )
    cells = {r["i"]: r["v"] for r in reduced}
    n = int(cells.get(-1, 0))
    if n == 0:
        raise ValueError("fit_pca: no valid vectors")
    s = np.array([cells.get(i, 0.0) for i in range(d)])
    m = np.array(
        [cells.get(d + i, 0.0) for i in range(d * d)]
    ).reshape(d, d)
    mean = s / n if center else np.zeros(d)
    cov = m / n - np.outer(mean, mean)
    # symmetrize against float drift before eigh
    cov = (cov + cov.T) / 2
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    # sign convention: the largest-|value| coordinate of each component
    # is positive (ties broken by lowest index via argmax)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PcaModel(
        mean=mean,
        components=comps,
        explained_variance=np.maximum(vals[order], 0.0),
    )


def project_pca(
    df: DataFrame,
    model: PcaModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
    round_dp: int | None = 9,
    whiten: bool = False,
) -> DataFrame:
    """Project ``vec_col`` onto the model's components — map-only Arrow
    GEMM against the broadcast (k, d) matrix; output ``out_col`` is
    ``array<double>`` length k (rounded to ``round_dp`` dp for cross-run
    portability; None keeps raw float64 — use when deriving invariants
    like norms downstream). Null/wrong-length vectors project to NULL.
    ``whiten=True`` scales each coordinate by 1/sqrt(eigenvalue) so the
    output has unit variance per dimension — the preconditioning
    cosine-similarity and k-means stages (SemDeDup cells, IVF training)
    want when leading components dominate; near-zero-variance
    components (< 1e-12) scale by 0 rather than exploding noise."""
    C = model.components.T.copy()  # (d, k)
    if whiten:
        ev = model.explained_variance
        scale = np.where(ev > 1e-12, 1.0 / np.sqrt(np.maximum(ev, 1e-30)), 0.0)
        C = C * scale  # column-wise
    mu = model.mean.copy()
    d = model.dim

    @pandas_udf("array<double>")
    def proj(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            out = []
            vals = s.values
            ok = [
                i for i, v in enumerate(vals)
                if v is not None and len(v) == d
            ]
            proj_ok = None
            if ok:
                X = np.array(
                    [list(vals[i]) for i in ok], dtype=np.float64
                ) - mu
                proj_ok = X @ C
                if round_dp is not None:
                    proj_ok = np.round(proj_ok, round_dp)
            pos = {idx: row for idx, row in zip(ok, proj_ok if ok else [])}
            for i in range(len(vals)):
                out.append(pos[i].tolist() if i in pos else None)
            yield pd.Series(out)

    return df.withColumn(out_col, proj(F.col(vec_col)))


def save_pca_model(spark, model: PcaModel, path: str) -> None:
    """Persist the model as one tiny parquet table (k+1 rows): row -1 is
    the mean, rows 0..k-1 the components with their eigenvalues —
    fit once on a reference snapshot, project every future batch
    (the build-once/probe-many contract of ``save_ivf_index``)."""
    rows = [(-1, model.mean.tolist(), 0.0)] + [
        (i, model.components[i].tolist(), float(model.explained_variance[i]))
        for i in range(model.k)
    ]
    spark.createDataFrame(
        rows, "idx int, vec array<double>, variance double"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_pca_model(spark, path: str) -> PcaModel:
    rows = sorted(
        spark.read.parquet(path).collect(), key=lambda r: r["idx"]
    )
    mean = np.array(rows[0]["vec"])
    comps = np.array([list(r["vec"]) for r in rows[1:]])
    var = np.array([r["variance"] for r in rows[1:]])
    return PcaModel(mean=mean, components=comps, explained_variance=var)
