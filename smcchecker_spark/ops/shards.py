"""Training-shard assembly: group corpus rows into fixed-byte-budget
shards (the WebDataset / packed-parquet export layout) with a manifest,
deterministically and without a single-partition sort.

A training job wants the corpus as N shard files of ~``target_bytes``
each, in an order that is (a) stable under re-runs, resume, and
repartitioning, and (b) decorrelated from ingest order (so one source
or crawl day doesn't own a shard — shard-sequential readers would see
it as a correlated slice). The assignment here is:

    order    = 60-bit md5 key of (salt || id)   [or a caller's column]
    shard_id = floor(exclusive_prefix_sum(size) / target_bytes)

computed with the same two-pass distributed prefix sum as
:func:`..pack.pack_sequences` (range boundaries from approxQuantile,
per-range totals, P-way parallel windows — the driver only ever holds
P scalars). Rows are ATOMIC: a sample never splits across shards, so a
shard's byte total lands within one max-row-size of the target on
either side. The classic greedy writer ("close the shard when the next
row would overflow") keeps hard ≤ target bounds but is inherently
sequential — each boundary depends on the exact fill state left by
every prior row, which no per-range summary can carry — so it cannot
be computed distributedly without a serial pass; the prefix-sum form
trades that hard cap for full parallelism and SQL-checkable
determinism, which is the right trade at 10^12 rows.

Reference scope: the reference checker exports validated data as flat
CSV (SURVEY §2.1 S9); shard assembly is the web-scale analogue of that
export step for training consumers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .pack import bin_fill_stats, pack_sequences

_ORDER = "_shard_order"


def _shard_order_key(id_col: str, salt: str) -> Column:
    """60-bit deterministic shuffle key: first 15 hex chars of
    md5(salt || id) — the same portable idiom as ``sample.hash_bucket``
    and ``batching._sort_key``, reproducible in any SQL engine as
    ('0x' || substr(md5(salt || id), 1, 15))::UBIGINT."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def assign_shards(
    df: DataFrame,
    size_col: str,
    target_bytes: int,
    id_col: str = "doc_id",
    order_col: str | None = None,
    salt: str = "",
    shard_col: str = "shard_id",
    offset_col: str | None = None,
    num_ranges: int | None = None,
) -> DataFrame:
    """Add ``shard_col`` (and optionally the row's byte offset in the
    concatenated stream) to every row.

    Default order is the md5 shuffle key over ``id_col`` — pass
    ``order_col`` to shard in a curated order instead (e.g. a
    curriculum score). ``id_col`` breaks md5-key ties (60-bit keys
    collide ~2^19 times at 10^12 rows; the tiebreak keeps the order
    total and the assignment deterministic). ``size_col`` is whatever
    budget the shards target — serialized bytes, token counts — nulls
    count 0.
    """
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    ordered = order_col
    out_df = df
    if ordered is None:
        out_df = df.withColumn(_ORDER, _shard_order_key(id_col, salt))
        ordered = _ORDER
    out = pack_sequences(
        out_df,
        order_col=ordered,
        size_col=size_col,
        capacity=target_bytes,
        num_ranges=num_ranges,
        bin_col=shard_col,
        offset_col=offset_col,
        tiebreak_col=id_col,
    )
    return out.drop(_ORDER) if order_col is None else out


def shard_manifest(
    assigned: DataFrame,
    size_col: str,
    target_bytes: int | None = None,
    shard_col: str = "shard_id",
) -> DataFrame:
    """Per-shard manifest: row count, byte total, and (with
    ``target_bytes``) the fill fraction — the index a shard writer or
    reader wants. One groupBy on the dense integer shard id (uniform
    keys, no skew)."""
    return bin_fill_stats(
        assigned, size_col, bin_col=shard_col, capacity=target_bytes
    )


def write_shards(
    assigned: DataFrame,
    path: str,
    shard_col: str = "shard_id",
    order_col: str = "doc_id",
) -> None:
    """Materialize assigned shards as one hive partition per shard,
    rows stored in the deterministic order. ``repartition(shard_col)``
    hash-distributes shard construction across the cluster (each task
    builds whole shards — a shard never splits across files);
    ``partitionBy`` names the directories so a reader opens exactly
    the shards it wants."""
    (
        assigned.repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, order_col)
        .write.mode("overwrite")
        .partitionBy(shard_col)
        .parquet(path)
    )
