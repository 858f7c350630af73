"""Product quantization (PQ) for memory-bounded ANN over vector columns.

Jégou, Douze, Schmid — "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011), re-expressed Spark-first and INTEGER-EXACT:

- the vector is split into ``m`` subspaces of ``dim/m`` dims; each
  subspace is vector-quantized against its own ``k``-entry codebook;
  a row stores only the ``m`` code indices (4-bit codes → m/2 bytes:
  a 10^12-row 64-dim float32 embedding column shrinks 256 TB → 4 TB);
- queries score rows WITHOUT reconstructing: per query, an m×k lookup
  table of subspace distances is built once, and a row's asymmetric
  distance (ADC) is the sum of m table entries picked by its codes —
  a native Column expression over the codes array, no Python stage,
  broadcast LUT, one corpus scan.

Everything runs over the INT8 quantized storage form
(``ops.quant.quantize_embeddings``) with INTEGER codebooks, so every
distance — training assignments, encode argmins, ADC scores — is exact
int64 arithmetic: bit-reproducible across engines and summation orders,
which is what makes the encode/top-k queries value-checkable against a
SQL oracle (float PQ would hash-mismatch on ulp-level argmin ties).

Scale shape (the 10^12-row part): codebooks are tiny (m·k·ds ints) and
broadcast; encode is map-only (one Arrow-batched GEMM pass riding the
table's write projection); ADC top-k is one scan + per-query rank
window, with a partial-aggregate variant for many queries. Training is
driver-side k-means on a bounded deterministic sample — at corpus
scale you train once and persist the codebooks like the IVF centroids.

Reference scope: beyond-reference training-pipeline layer (the brief's
similarity-search axis); no counterpart in SCCWRP/smcchecker.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def formula_codebooks(m: int = 8, k: int = 16, ds: int = 8) -> np.ndarray:
    """Deterministic closed-form integer codebooks (m, k, ds) in
    [-15, 15] — the exact-regime fixture for oracle-checked queries
    (every entry is a pure function of its indices, reproducible in
    one SQL expression). Trained codebooks are for quality; formula
    codebooks are for proving the encode/ADC machinery value-exact."""
    j, c, d = np.meshgrid(
        np.arange(m), np.arange(k), np.arange(ds), indexing="ij"
    )
    # multipliers coprime with the modulus, so distinct (j, c, d) cells
    # actually differ (c·17 mod 17 would collapse every code to one)
    return ((j * 29 + c * 5 + d * 11) % 31 - 15).astype(np.int64)


def train_pq_codebooks(
    df: DataFrame,
    q_col: str = "q",
    m: int = 8,
    k: int = 16,
    sample: int = 2048,
    iters: int = 10,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Driver-side k-means per subspace on an id-ordered bounded sample
    of the int8 vectors; centroids ROUNDED to integers so downstream
    distances stay exact. (m, k, ds) int64. Same train-once-persist
    pattern as ``similarity.train_centroids``."""
    rows = df.orderBy(id_col).limit(sample).select(q_col).collect()
    X = np.array([list(r[0]) for r in rows], dtype=np.int64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    ds = dim // m
    books = np.empty((m, k, ds), dtype=np.int64)
    for j in range(m):
        S = X[:, j * ds : (j + 1) * ds].astype(np.float64)
        C = S[:k].copy()
        if len(S) < k:  # degenerate tiny sample: pad with zeros
            C = np.vstack([C, np.zeros((k - len(S), ds))])
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books[j] = np.rint(C).astype(np.int64)
    return books


def _encode_udf(codebooks: np.ndarray):
    """Arrow-batched PQ encode: per subspace, integer argmin over the
    codebook via the expanded form |x|² − 2x·c + |c|² (int64 GEMM —
    exact). Ties take the LOWEST code index (np.argmin), mirrored in
    the SQL oracle."""
    m, k, ds = codebooks.shape
    CB = codebooks  # (m, k, ds)
    cb_sq = (CB * CB).sum(axis=2)  # (m, k)

    @pandas_udf("array<int>")
    def encode(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            X = np.array([list(v) for v in s.values], dtype=np.int64)
            n = X.shape[0]
            codes = np.empty((n, m), dtype=np.int32)
            for j in range(m):
                S = X[:, j * ds : (j + 1) * ds]  # (n, ds)
                # −2·S·Cᵀ + |c|² suffices for argmin (|x|² constant/row)
                d2 = cb_sq[j][None, :] - 2 * (S @ CB[j].T)
                codes[:, j] = np.argmin(d2, axis=1)
            yield pd.Series(list(codes))

    return encode


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    q_col: str = "q",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """Add the ``m``-entry code-index array. Map-only: rides the write
    projection, no shuffle; codebooks travel in the UDF closure
    (broadcast by Spark's task serialization — they are m·k·ds ints)."""
    return df.withColumn(codes_col, _encode_udf(codebooks)(F.col(q_col)))


def adc_lut(query_q: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(m, k) int64 table: squared L2 of the query's j-th subvector to
    codebook entry (j, c) — built once per query, exact integers."""
    m, k, ds = codebooks.shape
    Q = np.asarray(query_q, dtype=np.int64).reshape(m, 1, ds)
    return ((Q - codebooks) ** 2).sum(axis=2)


def adc_distance_expr(codes: Column, lut: np.ndarray) -> Column:
    """Native-Column ADC: sum_j lut[j][codes[j]] over the literal LUT —
    JVM-side, no Python stage, one pass over the codes array. The
    two-arg transform lambda receives (element, index) per Spark's HOF
    contract — exactly the (code, subspace) pair ADC needs."""
    lit_lut = F.array(
        *[
            F.array(*[F.lit(int(v)) for v in row])
            for row in lut
        ]
    )
    picked = F.transform(
        codes,
        lambda c, j: F.element_at(
            F.element_at(lit_lut, (j + 1).cast("int")), c + 1
        ).cast("long"),
    )
    return F.aggregate(
        picked, F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def pq_topk(
    corpus: DataFrame,
    query_q: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """ADC top-k for one query over the encoded corpus: one scan, the
    LUT folded into the projection as literals, one per-partition
    ascending sort bounded by the rank window. Output (neighbor_id,
    adc_dist, rank) — distance ascending, id tie-break (deterministic,
    SQL-reproducible)."""
    from pyspark.sql import Window

    lut = adc_lut(query_q, codebooks)
    scored = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        adc_distance_expr(F.col(codes_col), lut).alias("adc_dist"),
    )
    # single-group rank with an explicit derived-constant key:
    # pmod(hash(id), 1) is always 0 but not foldable, so the optimizer
    # cannot strip it back to an empty partition spec (a bare lit(0)
    # IS stripped, and an empty spec makes WindowExec warn on every
    # run and — worse — disables WindowGroupLimit's rank-filter
    # pushdown, which with the key prunes each partition to its local
    # top-k before the exchange)
    w = Window.partitionBy(
        F.pmod(F.hash("neighbor_id"), F.lit(1))
    ).orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def pq_topk_partial(
    corpus: DataFrame,
    query_q: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """Scale form of :func:`pq_topk`: per-partition top-k first (map
    side), then the global rank over ≤ k·partitions survivors — the
    single-partition window sort never sees the corpus. Same output."""
    from pyspark.sql import Window

    lut = adc_lut(query_q, codebooks)
    scored = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        adc_distance_expr(F.col(codes_col), lut).alias("adc_dist"),
    )
    part = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    pruned = scored.withColumn(
        "__pr", F.row_number().over(part)
    ).filter(F.col("__pr") <= k).drop("__pr")
    # same derived-constant single-group key as pq_topk (see there)
    w = Window.partitionBy(
        F.pmod(F.hash("neighbor_id"), F.lit(1))
    ).orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return pruned.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def reconstruction_error(
    df: DataFrame,
    codebooks: np.ndarray,
    q_col: str = "q",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """Per-row squared L2 between the int8 vector and its PQ
    reconstruction — the quantization-quality audit column. Exact
    integer arithmetic via one Arrow pass."""
    m, k, ds = codebooks.shape
    CB = codebooks

    @pandas_udf("long")
    def err(
        batches: Iterator[tuple[pd.Series, pd.Series]]
    ) -> Iterator[pd.Series]:
        for qs, cs in batches:
            X = np.array([list(v) for v in qs.values], dtype=np.int64)
            C = np.array([list(v) for v in cs.values], dtype=np.int64)
            rec = np.concatenate(
                [CB[j][C[:, j]] for j in range(m)], axis=1
            )
            yield pd.Series(((X - rec) ** 2).sum(axis=1))

    return df.withColumn(
        "pq_sq_err", err(F.col(q_col), F.col(codes_col))
    )


def ivfpq_encode(
    df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    q_col: str = "q",
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
    cell_col: str = "cell",
) -> DataFrame:
    """Build the IVF-PQ index projection: (id, cell, codes) — the
    canonical billion-scale ANN layout (FAISS IVFADC): coarse cell for
    partition pruning, 4-bit codes for in-cell scoring, the float
    vector DROPPED from the search path entirely. Map-only; at corpus
    scale write it partitioned by ``cell`` so probes prune at the
    source."""
    from smcchecker_spark.ops.similarity import _cell_udf

    return df.select(
        F.col(id_col),
        _cell_udf(centroids)(F.col(vec_col)).alias(cell_col),
        _encode_udf(codebooks)(F.col(q_col)).alias(codes_col),
    )


def ivfpq_topk(
    index: DataFrame,
    query_vec: np.ndarray,
    query_q: np.ndarray,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
    cell_col: str = "cell",
) -> DataFrame:
    """IVF-PQ ANN: probe the query's ``n_probe`` nearest cells (cosine
    to the coarse centroids, computed driver-side — the query is one
    vector), then ADC top-k inside the probed slice. The cell filter is
    a literal IN list, so a cell-partitioned index prunes at the
    source; scoring touches only the codes column. n_probe = n_cells
    degenerates to exact :func:`pq_topk` over the whole index (the
    oracle regime). ADC distances live in the symmetric-int8 q-space
    (per-row max-abs normalization) — the storage form's metric, which
    the recall tests measure against exact q-space distance."""
    qv = np.asarray(query_vec, dtype=np.float64)
    qv = qv / max(np.linalg.norm(qv), 1e-12)
    C = np.asarray(centroids, dtype=np.float64)
    n_probe = min(n_probe, len(C))
    probe = np.argsort(-(C @ qv))[:n_probe]
    sliced = index.filter(
        F.col(cell_col).isin([int(c) for c in probe])
    )
    return pq_topk_partial(
        sliced, query_q, codebooks, k=k,
        id_col=id_col, codes_col=codes_col,
    )
