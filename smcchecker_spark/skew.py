"""Skew handling: salted repartitioning + two-phase aggregation.

North rule: "salted repartitioning to defuse phash/fmt skew" — the
fixture's fmt column is ≥80% one value by design, and phash clusters on
near-duplicate images, so any stage keyed on them would send most rows to
one reducer. The defusal is standard: spread each hot key over S salt
buckets, aggregate partially per (key, salt), then finish per key — the
second exchange moves only S rows per key.

AQE's skew-join handling (enabled in session.py) covers the join side;
these helpers cover groupBy/repartition stages, which AQE does not split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(row_key: Column, buckets: int) -> Column:
    """Deterministic salt derived from a row-identity column (NOT rand() —
    resume/retry must re-derive identical salts for identical rows)."""
    return F.pmod(F.hash(row_key), F.lit(buckets)).cast("int")


def salted_repartition(
    df: DataFrame,
    key_cols: list[str],
    row_id_col: str,
    num_partitions: int,
    salt_buckets: int = 16,
) -> DataFrame:
    """Hash-repartition on (keys..., salt) so a hot key spreads over
    ``salt_buckets`` tasks instead of one."""
    return df.withColumn("__salt", salt_col(F.col(row_id_col), salt_buckets)).repartition(
        num_partitions, *[F.col(c) for c in key_cols], F.col("__salt")
    )


def salted_count(
    df: DataFrame,
    key_cols: list[str],
    row_id_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase count per key: partial count per (key, salt) — the wide
    exchange sees ≤ salt_buckets rows per hot key — then final sum per
    key. Output: key_cols + count."""
    partial = (
        df.withColumn("__salt", salt_col(F.col(row_id_col), salt_buckets))
        .groupBy(*key_cols, "__salt")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("__c").alias("count"))
