"""Distributed as-of (point-in-time) join.

``asof_join(left, right, ...)`` attaches, to every left row, the single
right row nearest in event time within the same key — at-or-before
(``backward``, the default), at-or-after (``forward``), or whichever is
closer (``nearest``) — the "latest snapshot as of t" lookup that
training-data pipelines need for feature attachment (latest
label/price/profile before an example's timestamp) and that Spark has
no native operator for.

Execution shape (the part that matters at 10^12 rows): the naive
formulations are a range join (O(|L|·|R|) per key after the equi part —
a cross-join blow-up on hot keys) or a per-key ``collect_list`` +
binary-search UDF (one giant row per hot key). Instead both sides are
UNIONED into one stream, shuffled ONCE on the key, sorted within
partitions by (event time, side), and running carry windows over that
single sort produce the backward (``last ignorenulls`` up to the
current row) and forward (``first ignorenulls`` after it) matches.
Cost = one exchange + one sort FOR EVERY DIRECTION — identical to a
plain sort-merge join on the key — and a hot key degrades to a sort,
never to a quadratic pair enumeration. This is the standard
union-stream as-of plan (same shape Flink's temporal join and pandas
``merge_asof`` use, distributed).

Reference parity note: the reference (SCCWRP/smcchecker) has no temporal
operators; this is part of the beyond-reference pipeline layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, TimestampNTZType, TimestampType


def _epoch_seconds(expr: Column, dtype: DataType) -> Column:
    """Double epoch seconds from a timestamp/timestamp_ntz/numeric column.
    ANSI mode forbids a direct timestamp→double cast; micros-precision
    division preserves ordering exactly (doubles hold 2^53 integers and
    epoch micros stay below that until year ~2255)."""
    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        # ntz → timestamp interprets in the session TZ (pinned UTC) —
        # applied to BOTH sides, so comparisons are consistent either way
        return F.unix_micros(expr.cast("timestamp")) / F.lit(1e6)
    return expr.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str | None = None,
    tolerance_s: float | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the right row with the nearest
    ``right_ts`` within the same ``on`` key, by ``direction``:

    - ``backward`` (default): greatest right_ts <= left_ts,
    - ``forward``: smallest right_ts >= left_ts,
    - ``nearest``: whichever of the two is closer in time (exact ties
      → the backward match).

    Output: every left column, plus each non-key right column as
    ``{prefix}{col}`` (NULL when no right row qualifies, or when the
    match is farther than ``tolerance_s`` seconds — "no match", not
    "next-nearer match", identical to pandas ``merge_asof``).

    Semantics notes:

    - **inclusive**: a right row at exactly ``left_ts`` matches every
      direction.
    - **deterministic ties**: several right rows sharing (key, ts) would
      make "the" match ambiguous; payload struct order decides
      (greatest for backward/equal-ts matches, smallest for
      strictly-forward ones), so results are stable across retries and
      partitionings. Pre-aggregate the right side if you need a
      specific tie rule.

    Both event-time columns must be castable to double epoch seconds
    (timestamps or numerics).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    payload_cols = [c for c in right.columns if c not in keys]
    if right_ts not in payload_cols:
        raise ValueError(f"right_ts {right_ts!r} must be a non-key right column")
    for c in payload_cols:
        if c in left.columns:
            # the carried payload lands as {prefix}{c}; forbid collisions
            if f"{prefix}{c}" in left.columns:
                raise ValueError(f"output column {prefix}{c!r} collides with left")

    # ts FIRST in the payload struct: the deterministic tie-break by
    # struct order then orders by ts before anything else
    ordered_payload = [right_ts] + [c for c in payload_cols if c != right_ts]
    rts_dtype = right.schema[right_ts].dataType
    r_stream = right.select(
        *keys,
        _epoch_seconds(F.col(right_ts), rts_dtype).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in ordered_payload]).alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
    )
    l_stream = left.select(
        *keys,
        _epoch_seconds(F.col(left_ts), left.schema[left_ts].dataType).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_stream.schema["__r"].dataType).alias("__r"),
        *[c for c in left.columns if c not in keys],
    )
    # ONE shuffle on the key; within a key the sort is (t, side, payload):
    # right rows precede left rows at equal t, so the backward frame
    # (unbounded → current) is at-or-before INCLUSIVE and the forward
    # frame (current+1 → unbounded) is strictly-after — equal-ts forward
    # matches come from the backward carry (see below)
    base = Window.partitionBy(*keys).orderBy(
        F.col("__t").asc(), F.col("__side").asc(), F.col("__r").asc()
    )
    bw = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stream = r_stream.unionByName(l_stream).withColumn(
        "__mb", F.last("__r", ignorenulls=True).over(bw)
    )

    def epoch_of(m: Column) -> Column:
        return _epoch_seconds(m[right_ts], rts_dtype)

    if direction == "backward":
        stream = stream.withColumn("__m", F.col("__mb"))
    else:
        fw = base.rowsBetween(1, Window.unboundedFollowing)
        stream = stream.withColumn(
            "__mf", F.first("__r", ignorenulls=True).over(fw)
        )
        mb, mf = F.col("__mb"), F.col("__mf")
        eq = mb.isNotNull() & (epoch_of(mb) == F.col("__t"))
        if direction == "forward":
            m = F.when(eq, mb).otherwise(mf)
        else:  # nearest: closer side wins; exact tie → backward
            bd = F.col("__t") - epoch_of(mb)
            fd = epoch_of(mf) - F.col("__t")
            m = F.when(
                mb.isNotNull() & (mf.isNull() | (bd <= fd)), mb
            ).otherwise(mf)
        stream = stream.withColumn("__m", m)

    out = stream.filter(F.col("__side") == 1)
    match = F.col("__m")
    if tolerance_s is not None:
        match = F.when(
            F.abs(F.col("__t") - epoch_of(F.col("__m")))
            <= F.lit(float(tolerance_s)),
            F.col("__m"),
        )
    return out.select(
        *keys,
        *[c for c in left.columns if c not in keys],
        *[match[c].alias(f"{prefix}{c}") for c in ordered_payload],
    )
