"""Z-order (Morton-curve) data layout for multi-dimensional scan pruning.

At 100 TB the cheapest byte is the one never read: min/max footer stats
(parquet row groups, Iceberg manifest entries) prune whole files when the
data is CLUSTERED so each file covers a narrow value range. Sorting by
one column prunes filters on that column only; interleaving the bits of
several columns (the Morton / Z curve) bounds EVERY interleaved column's
range per file, so box predicates on any subset of the dimensions skip
most files. This is the same layout `OPTIMIZE ... ZORDER BY` performs in
lakehouse engines, expressed as plain DataFrame ops: compute the z-value,
range-partition on it, sort within partitions, write.

The z-value here interleaves the low ``bits`` bits of non-negative
integer columns — callers quantize floats/strings into integer buckets
first (rank, hash-bucket, or fixed-width binning); the engine's
``sample.hash_bucket`` and ``stats`` histograms are natural sources.
Everything is a pure Column expression (codegen'd bit math, map-only) so
an ANSI-SQL oracle reproduces every z-value bit-for-bit.

Reference parity note: the reference (SCCWRP/smcchecker) has no storage
layout surface; this is part of the beyond-reference scale layer.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column], bits: int = 8) -> Column:
    """Morton interleave of the low ``bits`` bits of each column.

    Bit b of column j lands at output bit ``b * len(cols) + j``, so the
    result is a space-filling curve position: rows close in z are close
    in every input dimension. Inputs must be non-negative integers below
    ``2**bits`` — values at-or-above contribute only their low bits
    (the curve wraps), so quantize FIRST. ``bits * len(cols)`` must fit
    a signed long.
    """
    if not cols:
        raise ValueError("zvalue needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(
            f"{bits} bits x {len(cols)} cols = {bits * len(cols)} output "
            "bits; must be <= 63 (signed long)"
        )
    terms = [
        F.shiftleft(
            F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)),
            b * len(cols) + j,
        )
        for b in range(bits)
        for j, c in enumerate(cols)
    ]
    return reduce(lambda a, b2: a + b2, terms)


def zorder_layout(
    df: DataFrame,
    cols: list[Column],
    bits: int = 8,
    num_partitions: int | None = None,
    z_col: str | None = None,
) -> DataFrame:
    """Cluster ``df`` along the Z curve of ``cols``: range-partition on
    the z-value (one shuffle — contiguous curve segments per output
    partition/file) and sort within partitions (contiguous row groups
    within a file). Write the result with any sink; every written file
    then covers a narrow box in all interleaved dimensions, which is
    exactly what footer-stats pruning needs.

    ``num_partitions`` defaults to the session shuffle parallelism. Pass
    ``z_col`` to keep the z-value as a named output column (useful as an
    explicit partition/bucket key); by default it is dropped after
    layout. Range partitioning samples the z distribution, so skewed
    inputs still yield balanced files.
    """
    z = zvalue(cols, bits)
    tmp = "__z" if z_col is None else z_col
    out = df.withColumn(tmp, z)
    parts = [num_partitions] if num_partitions else []
    out = out.repartitionByRange(*parts, F.col(tmp)).sortWithinPartitions(tmp)
    return out.drop(tmp) if z_col is None else out
