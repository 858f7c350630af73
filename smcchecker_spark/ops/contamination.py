"""Benchmark decontamination: flag training documents that share word
k-shingles with an evaluation/benchmark set.

The standard pre-training hygiene step (GPT-3 appendix C / PaLM §C:
n-gram overlap against eval sets): any training doc containing an
n-gram that also appears in a benchmark must be dropped or audited,
or eval numbers are contaminated.

Shape at 10^12 rows: the benchmark side is SMALL by nature (eval sets
are MBs, the corpus is TBs) — so its distinct shingle set is broadcast
and the corpus makes ONE pass: project shingles → explode → broadcast
left join → per-doc count. One scan, one broadcast hash join, one
groupBy on the doc id (map-side partial agg absorbs long docs). The
corpus is never shuffled by shingle. For a benchmark too big to
broadcast, ``broadcast_bench=False`` falls back to a shuffle join on
the shingle — still ids+shingles only, never payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smcchecker_spark.ops import text as T


def benchmark_shingles(
    bench: DataFrame, text_col: str = "text", k: int = 3
) -> DataFrame:
    """Distinct word-k-shingles of the benchmark set, one per row
    (column ``s``). Empty-doc sentinel shingles ('') are dropped — an
    empty training doc does not "contaminate" against an empty eval row.
    Compute once, reuse across corpus partitions/waves."""
    return (
        bench.select(F.explode(T.word_shingles(F.col(text_col), k)).alias("s"))
        .filter(F.col("s") != "")
        .distinct()
    )


def shingle_overlap(
    df: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str = "text",
    bench_text_col: str = "text",
    k: int = 3,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-document contamination against a benchmark set.

    Returns (id, n_shingles, n_hits, overlap): distinct word-k-shingle
    count, how many of them appear in the benchmark, and the hit
    fraction in [0,1]. Every input doc appears in the output (docs with
    no shingles score 0), so callers can threshold (`overlap > 0` for
    strict decontamination) without re-joining the corpus.

    ``df`` ids must be unique. See module docstring for the plan shape.
    """
    from smcchecker_spark.ops.dedup import shingles_udf

    bs = benchmark_shingles(bench, bench_text_col, k).withColumn(
        "hit", F.lit(1)
    )
    if broadcast_bench:
        bs = F.broadcast(bs)
    # corpus-side shingling through the Arrow UDF, not the Column
    # expression: the HOF form runs interpreted per row and measured
    # ~20x slower on the 2M-doc soak (same semantics, same outputs)
    sh = df.select(
        F.col(id_col).alias("id"),
        shingles_udf(k)(F.col(text_col)).alias("arr"),
    ).select(
        "id",
        F.size("arr").alias("n_shingles"),
        # explode_outer: a doc whose only shingle is the empty sentinel
        # must still reach the groupBy (with 0 hits), not vanish
        F.explode_outer("arr").alias("s"),
    )
    joined = sh.join(bs, "s", "left")
    return (
        joined.groupBy("id", "n_shingles")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("int").alias("n_hits"))
        .select(
            "id",
            "n_shingles",
            "n_hits",
            F.round(
                F.col("n_hits") / F.greatest("n_shingles", F.lit(1)), 6
            ).alias("overlap"),
        )
    )


def decontaminate(
    df: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str = "text",
    bench_text_col: str = "text",
    k: int = 3,
    max_overlap: float = 0.0,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Drop documents whose benchmark shingle overlap exceeds
    ``max_overlap`` (default: any hit). Two corpus scans — one to score
    (see :func:`shingle_overlap`), one for the keep-filter (broadcast
    anti-join on the contaminated-id sliver); kept rows keep their
    original columns."""
    scores = shingle_overlap(
        df, bench, id_col, text_col, bench_text_col, k, broadcast_bench
    )
    bad = scores.filter(F.col("overlap") > max_overlap).select(
        F.col("id").alias("_bad_id")
    )
    # contaminated ids are a sliver of the corpus → broadcast anti-join
    return df.join(
        F.broadcast(bad), df[id_col] == F.col("_bad_id"), "left_anti"
    )
