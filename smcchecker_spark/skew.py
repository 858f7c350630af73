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


def heavy_hitters(
    df: DataFrame,
    column: str,
    top: int = 20,
    min_share: float = 0.0,
) -> DataFrame:
    """The salting-decision diagnostic: the ``top`` most frequent values
    of a column with their corpus share — the numbers that tell you
    whether a key needs ``salted_repartition`` / a hot-bucket guard
    before it becomes a shuffle key. Output: (value:string, n, share),
    share-descending, value-ascending tie-break; ``min_share`` drops the
    long tail (0.01 = report only keys holding ≥1% of rows).

    Shape: one column-pruned scan for the per-value counts (map-side
    partials absorb the hot keys — that is the point), top-k via
    TakeOrderedAndProject (per-partition top-k, no global sort shuffle,
    ``top`` rows to the driver), plus one count() scan for the share
    denominator. Deliberately NOT an unpartitioned window over the
    counts — a high-NDV column would sort its whole distinct-value set
    in one task. NULL is reported as the literal string 'NULL' (a NULL
    hot key is still a hot key — groupBy groups them)."""
    if top <= 0:
        raise ValueError(f"top must be positive, got {top}")
    total = df.count()
    counts = (
        df.select(
            F.coalesce(F.col(column).cast("string"), F.lit("NULL")).alias(
                "value"
            )
        )
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = (
        counts.orderBy(F.desc("n"), F.asc("value"))
        .limit(top)
        .select(
            "value", "n",
            F.round(F.col("n") / F.lit(max(total, 1)), 6).alias("share"),
        )
    )
    if min_share > 0:
        out = out.filter(F.col("share") >= min_share)
    return out


def replicated_skew_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    row_id_col: str,
    salt_buckets: int = 16,
    hot_keys: list | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the LEFT side is huge with hot keys and the RIGHT
    side is also too big to broadcast — the one shape AQE's skew-join
    split cannot always fix (it splits a skewed partition's files, but a
    single hot KEY's rows still co-locate after the split when the
    build side must match them).

    Salt-replicate: left rows get a deterministic salt in [0, S) derived
    from their row identity; right rows are REPLICATED S times (one per
    salt value); the join key becomes (keys…, salt), so one hot key's
    matches spread over S tasks. Cost: the right side shuffles S× — so
    pass ``hot_keys`` (e.g. from :func:`heavy_hitters`) to restrict
    salting to the hot sliver: non-hot keys join normally (salt 0, one
    replica), and the replication multiplier applies only to right rows
    whose key is hot. Results are identical to the plain join (each left
    row meets each matching right row exactly once — its own salt's
    replica). ``how``: inner or left (semantics preserved; a left row
    with no match survives with nulls either way).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if salt_buckets < 2:
        raise ValueError("salt_buckets must be >= 2")
    if hot_keys is not None and len(keys) != 1:
        raise ValueError("hot_keys restriction supports single-key joins")

    if hot_keys is None:
        is_hot_l = F.lit(True)
        is_hot_r = F.lit(True)
    else:
        is_hot_l = F.col(keys[0]).isin(list(hot_keys))
        is_hot_r = F.col(keys[0]).isin(list(hot_keys))

    l_salted = left.withColumn(
        "__salt",
        F.when(is_hot_l, salt_col(F.col(row_id_col), salt_buckets))
        .otherwise(F.lit(0)),
    )
    r_salted = right.withColumn(
        "__salt",
        F.explode(
            F.when(
                is_hot_r,
                F.sequence(F.lit(0), F.lit(salt_buckets - 1)),
            ).otherwise(F.array(F.lit(0)))
        ),
    )
    return l_salted.join(r_salted, keys + ["__salt"], how).drop("__salt")
