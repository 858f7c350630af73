"""Sequence packing: assign documents to fixed-capacity training bins
(context windows) by global prefix sum — distributed, deterministic,
oracle-checkable.

Semantics: rows are laid out in ``order_col`` order; each row's bin is

    bin_id = floor(exclusive_prefix_sum(size) / capacity)

i.e. a document lands in the bin where its first token would fall if
documents were concatenated in order. Bins are contiguous runs, every
bin except possibly each boundary-straddling one holds ≤ capacity
tokens, and the assignment is a pure function of (order, sizes,
capacity) — independent of partitioning, parallelism, and resume. This
is the "concatenate then chop" packing used by most pre-training data
loaders (documents straddle bin boundaries; the loader masks across the
seam), NOT first-fit bin packing (whose greedy recursion is inherently
sequential and partition-dependent).

Why not one big window: ``sum() over (order by ...)`` with no partition
key plans as a SINGLE-PARTITION sort — one task sorts 10^12 rows. The
classic fix is the two-pass distributed prefix sum:

1. split the key space into P ranges with ``approxQuantile`` boundaries
   (driver holds P-1 doubles);
2. pass 1 scans ONLY (order, size) — column pruning makes this a
   two-column parquet read — and computes per-range totals (P rows to
   the driver);
3. pass 2 computes the within-range running sum (window partitioned by
   range id: P-way parallel sort, streaming frame) and adds the
   exclusive range offset via a literal CASE — no join, no second
   shuffle of the data beyond the one hash exchange the window needs.

Both passes derive the range id from the SAME literal boundaries, so
they agree by construction (spark_partition_id after repartitionByRange
would tie correctness to two physical plans picking identical
boundaries — it doesn't have to at 10^12 rows, where AQE re-plans).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _range_id(col: Column, boundaries: list[float]) -> Column:
    """0-based range index from sorted literal boundaries: number of
    boundaries ≤ value, as a codegen'd CASE chain (boundaries are ≤ a
    few hundred; an interpreted HOF over a literal array would drop the
    whole projection out of whole-stage codegen)."""
    expr = F.lit(0)
    for b in boundaries:
        expr = expr + F.when(col >= F.lit(b), 1).otherwise(0)
    return expr.alias("_rid")


def pack_sequences(
    df: DataFrame,
    order_col: str,
    size_col: str,
    capacity: int,
    num_ranges: int | None = None,
    bin_col: str = "bin_id",
    offset_col: str | None = "bin_offset",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Add ``bin_id`` (and the within-stream start ``bin_offset``) to
    every row — see module docstring for semantics and plan shape.

    ``order_col`` must be numeric and non-null, and UNIQUE unless
    ``tiebreak_col`` (a second column making the order total) is given —
    ties make the concatenation order, and thus the prefix sum,
    ambiguous. Range assignment only ever reads ``order_col``, so tied
    rows always share a range and the tiebreak affects the within-range
    window order alone.
    ``size_col`` must be non-negative; nulls count as 0. Rows larger
    than ``capacity`` start in their natural bin and straddle as many
    bins as they need — the loader seam, not the packer, handles them.

    ``num_ranges`` defaults to the session's shuffle partitions: at
    corpus scale set it so a range's rows fit one task's sort spill
    budget (the running-sum frame itself is streaming, O(1) memory).
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    spark = df.sparkSession
    p = num_ranges or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    quantiles = [i / p for i in range(1, p)]
    # deterministic (Greenwald-Khanna, no RNG); pass 0 prunes to 1 column
    bounds = (
        df.select(F.col(order_col).cast("double").alias("o"))
        .approxQuantile("o", quantiles, 0.001)
        if p > 1
        else []
    )
    # skewed quantiles can repeat a boundary — collapse, empty ranges are fine
    boundaries = sorted(set(bounds))

    rid = _range_id(F.col(order_col).cast("double"), boundaries)
    size = F.coalesce(F.col(size_col).cast("long"), F.lit(0))

    # pass 1: per-range totals over a 2-column scan; |ranges| rows collected
    totals = {
        r["_rid"]: r["_t"]
        for r in df.select(rid, size.alias("_s"))
        .groupBy("_rid")
        .agg(F.sum("_s").alias("_t"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for i in range(len(boundaries) + 1):
        offsets[i] = acc
        acc += totals.get(i, 0)

    # pass 2: within-range exclusive running sum + literal offset
    order_by = (
        [order_col, tiebreak_col] if tiebreak_col else [order_col]
    )
    w = (
        Window.partitionBy("_rid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset_expr = reduce(
        lambda e, i: e.when(F.col("_rid") == i, F.lit(offsets[i])),
        range(1, len(boundaries) + 1),
        F.when(F.col("_rid") == 0, F.lit(offsets[0])),
    ).otherwise(F.lit(0))
    start = offset_expr + F.coalesce(F.sum(size).over(w), F.lit(0))
    out = df.withColumn("_rid", rid).withColumn(
        bin_col, F.floor(start / F.lit(capacity)).cast("long")
    )
    if offset_col:
        out = out.withColumn(offset_col, start.cast("long"))
    return out.drop("_rid")


def bin_fill_stats(
    packed: DataFrame, size_col: str, bin_col: str = "bin_id", capacity: int | None = None
) -> DataFrame:
    """Per-bin fill report: docs per bin and summed size — one groupBy
    on the bin id (bins are dense integers: uniform keys, no skew).
    With ``capacity``, adds the fill fraction of non-straddling mass."""
    agg = packed.groupBy(bin_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.coalesce(F.col(size_col).cast("long"), F.lit(0))).alias("total_size"),
    )
    if capacity:
        agg = agg.withColumn(
            "fill", F.round(F.col("total_size") / F.lit(capacity), 6)
        )
    return agg
