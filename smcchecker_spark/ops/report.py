"""Corpus-level dataset card: the one-page datasheet a training-data
drop ships with (size, composition, duplication, token budget).

One aggregation over one scan produces every metric (count-distinct
aggregates ride the same pass as distinct-aggregate paths); output is
(metric, value) rows so the card lands in the same metrics/lineage
tables the checkpoint protocol already writes. All metrics are exact
and deterministic — a plain-SQL oracle reproduces the card bit-for-bit
(contrast a sketch-based profile, which column_stats covers).

Reference parity note: the closest reference artifact is the submission
receipt/row-count checksum (proj/load.py:124-145); the card is its
corpus-scale generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smcchecker_spark.ops import text as T


def dataset_card(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """(metric, value) rows — value is double for uniform storage:

    - ``n_docs``, ``n_sources``, ``n_langs``
    - ``n_empty`` (NULL/whitespace-only docs)
    - ``exact_dup_rate``: fraction of NON-EMPTY docs whose normalized
      fingerprint repeats an earlier one — (n - distinct fp) / n, the
      same md5 fingerprint the dedup ops use
    - ``total_tokens`` (whitespace), ``mean_tokens``
    - ``mean_chars``
    """
    txt = F.col(text_col)
    nonempty = T.token_count(txt) > 0
    fp = F.when(nonempty, T.fingerprint(txt))
    n_nonempty = F.count(fp)
    agg = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.col(source_col)).alias("n_sources"),
        F.count_distinct(F.col(lang_col)).alias("n_langs"),
        F.sum((~nonempty).cast("long")).alias("n_empty"),
        n_nonempty.alias("n_ne"),
        F.count_distinct(fp).alias("n_fp"),
        F.sum(T.token_count(txt)).alias("total_tokens"),
        F.avg(T.token_count(txt)).alias("mean_tokens"),
        F.avg(F.length(F.coalesce(txt, F.lit("")))).alias("mean_chars"),
    )
    rows = [
        ("n_docs", F.col("n_docs")),
        ("n_sources", F.col("n_sources")),
        ("n_langs", F.col("n_langs")),
        ("n_empty", F.col("n_empty")),
        (
            "exact_dup_rate",
            F.round(
                (F.col("n_ne") - F.col("n_fp"))
                / F.greatest(F.col("n_ne"), F.lit(1)),
                6,
            ),
        ),
        ("total_tokens", F.col("total_tokens")),
        ("mean_tokens", F.round(F.col("mean_tokens"), 6)),
        ("mean_chars", F.round(F.col("mean_chars"), 6)),
    ]
    return agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("metric"),
                        expr.cast("double").alias("value"),
                    )
                    for name, expr in rows
                ]
            )
        ).alias("m")
    ).select("m.metric", "m.value")
