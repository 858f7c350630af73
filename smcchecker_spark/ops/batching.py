"""Aspect-ratio bucketing + deterministic training-batch assembly for
image tables — the image-payload analogue of sequence packing
(``ops/pack.py``).

Image-model training (SDXL-style) groups images into a small set of
target (w, h) resolution buckets of roughly constant area so a batch
can be stacked into one tensor without destructive cropping, then draws
each batch from a single bucket. At 10^12 rows both halves have
scale traps this module avoids:

- **Bucket assignment** is a pure map-only Column expression: the
  argmin over the bucket list is an ``array_min`` over literal structs
  (distance, index) — no explode, no join, whole-stage codegen. The
  distance is |w/h − bw/bh| in 2^-20 FIXED POINT, exact 64-bit integer
  arithmetic (``(|w·bh − h·bw| · 2^20) div bh``): floating-point log/
  division would make near-tie argmins engine- and libm-dependent,
  breaking both determinism and the SQL oracle.
- **Batch numbering** needs a per-bucket global row index, but
  ``row_number() over (partition by bucket)`` plans ONE task per
  bucket — with ~20 buckets that is a 20-way sort of the corpus. We
  reuse the two-pass distributed prefix idiom from ``pack_sequences``:
  split the (md5-derived) sort-key space into P literal ranges, count
  per (bucket, range) in one pruned aggregate scan (|buckets|·P rows
  to the driver), then window per (bucket, range) — P-way parallel per
  bucket — and add the exclusive offset via a broadcast join against
  the tiny offset table. The assignment is a pure function of
  (id, salt, buckets, batch_size): independent of partitioning,
  parallelism, and resume, and reproducible row-for-row in ANSI SQL.

Reference scope: the reference checker (SCCWRP/smcchecker) stops at
validation; batching is part of the beyond-reference training-data
pipeline surface the brief asks for (brief: multimodal/training ops as
first-class components).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from smcchecker_spark.ops.pack import _range_id

_FIXED = 1 << 20  # fixed-point scale for the AR distance


def generate_aspect_buckets(
    max_area: int = 512 * 512,
    step: int = 64,
    min_side: int = 256,
    max_side: int = 1024,
) -> list[tuple[int, int]]:
    """SDXL-style bucket enumeration: for each width that is a multiple
    of ``step`` in [min_side, max_side], the tallest height multiple of
    ``step`` with w·h ≤ max_area; plus transposes; sorted, deduped.
    Driver-side, deterministic — the list is a handful of literals that
    compile into the assignment expression."""
    if min_side % step or min_side <= 0 or max_side < min_side:
        raise ValueError("sides must be positive multiples of step")
    buckets: set[tuple[int, int]] = set()
    for w in range(min_side, max_side + 1, step):
        h = min(max_side, (max_area // w) // step * step)
        if h >= min_side:
            buckets.add((w, h))
            buckets.add((h, w))
    return sorted(buckets)


def _bucket_struct(w_col: str, h_col: str, buckets: list[tuple[int, int]]) -> Column:
    """struct(bucket_id, bucket_w, bucket_h) of the nearest-AR bucket.

    Exact integer fixed-point distance; ties go to the lower bucket
    index (struct comparison is field-order: distance, then index).
    ``w_col``/``h_col`` must be plain column names (the constant integer
    division uses SQL ``div``, the only exact 64-bit quotient both
    Spark and ANSI engines share)."""
    entries = []
    for i, (bw, bh) in enumerate(buckets):
        dist = F.expr(
            f"(abs(cast({w_col} as bigint) * {bh} - "
            f"cast({h_col} as bigint) * {bw}) * {_FIXED}) div {bh}"
        )
        entries.append(
            F.struct(
                dist.alias("d"),
                F.lit(i).alias("bucket_id"),
                F.lit(bw).alias("bucket_w"),
                F.lit(bh).alias("bucket_h"),
            )
        )
    return F.array_min(F.array(*entries))


def assign_aspect_bucket(
    df: DataFrame,
    w_col: str = "w",
    h_col: str = "h",
    buckets: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Add ``bucket_id``/``bucket_w``/``bucket_h`` — nearest-aspect-ratio
    bucket per row, map-only (see module docstring). Rows with NULL
    dimensions get NULL bucket columns (gate them upstream with the
    image-policy constraints)."""
    if buckets is None:
        buckets = generate_aspect_buckets()
    if not buckets:
        raise ValueError("bucket list is empty")
    best = _bucket_struct(w_col, h_col, buckets)
    return df.select(
        "*", best["bucket_id"].alias("bucket_id"),
        best["bucket_w"].alias("bucket_w"), best["bucket_h"].alias("bucket_h"),
    )


def _sort_key(id_col: str, salt: str) -> Column:
    """60-bit deterministic shuffle key: first 15 hex chars of
    md5(salt || id) — same portable idiom as ``sample.hash_bucket``,
    reproducible in any SQL engine."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def image_batches(
    df: DataFrame,
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
    buckets: list[tuple[int, int]] | None = None,
    batch_size: int = 64,
    salt: str = "batch",
    num_ranges: int | None = None,
    drop_partial: bool = False,
) -> DataFrame:
    """Assign every image a training batch: nearest-AR bucket, then
    ``batch_id`` / ``idx_in_batch`` from the row's rank within its
    bucket under the deterministic md5 shuffle order (ties broken by
    id; ids must be unique and non-null). ``drop_partial=True`` removes
    each bucket's trailing under-filled batch (the usual loader
    behavior). Plan shape: one map-only assignment, one pruned
    per-(bucket, range) count scan, one hash exchange for the P-way
    parallel per-range window, broadcast offset join — no per-bucket
    single-task sort, no driver data rows (only |buckets|·P counts)."""
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    if buckets is None:
        buckets = generate_aspect_buckets()
    spark = df.sparkSession
    p = num_ranges or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    assigned = assign_aspect_bucket(df, w_col, h_col, buckets).withColumn(
        "_k", _sort_key(id_col, salt)
    )

    quantiles = [i / p for i in range(1, p)]
    bounds = (
        assigned.select(F.col("_k").cast("double").alias("o"))
        .approxQuantile("o", quantiles, 0.001)
        if p > 1
        else []
    )
    boundaries = sorted(set(bounds))
    rid = _range_id(F.col("_k").cast("double"), boundaries)

    # pass 1: per-(bucket, range) counts — |buckets|·P rows to the driver
    counts = (
        assigned.select(F.col("bucket_id").alias("_b"), rid)
        .groupBy("_b", "_rid")
        .count()
        .collect()
    )
    per_bucket: dict[int, dict[int, int]] = {}
    for r in counts:
        per_bucket.setdefault(r["_b"], {})[r["_rid"]] = r["count"]
    offset_rows = []
    bucket_totals: dict[int, int] = {}
    for b, by_rid in per_bucket.items():
        acc = 0
        for i in range(len(boundaries) + 1):
            offset_rows.append((b, i, acc))
            acc += by_rid.get(i, 0)
        bucket_totals[b] = acc
    offsets = spark.createDataFrame(
        offset_rows, "_ob int, _orid int, _off long"
    )

    # pass 2: P-way parallel per-(bucket, range) rank + broadcast offset
    w = Window.partitionBy("bucket_id", "_rid").orderBy("_k", id_col)
    out = (
        assigned.withColumn("_rid", rid)
        .join(
            F.broadcast(offsets),
            on=(F.col("bucket_id") == F.col("_ob"))
            & (F.col("_rid") == F.col("_orid")),
        )
        .withColumn("_idx", F.row_number().over(w) - 1 + F.col("_off"))
        .withColumn("batch_id", F.expr(f"_idx div {batch_size}"))
        .withColumn("idx_in_batch", (F.col("_idx") % batch_size).cast("int"))
        .drop("_k", "_rid", "_ob", "_orid", "_off", "_idx")
    )
    if drop_partial:
        full = {
            b: total // batch_size for b, total in bucket_totals.items()
        }
        keep = spark.createDataFrame(
            [(b, n) for b, n in full.items()], "_b int, _full long"
        )
        out = (
            out.join(F.broadcast(keep), on=F.col("bucket_id") == F.col("_b"))
            .filter(F.col("batch_id") < F.col("_full"))
            .drop("_b", "_full")
        )
    return out
