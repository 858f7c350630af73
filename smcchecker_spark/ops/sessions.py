"""Gap-based event sessionization + per-session rollups.

The reference's timeseries dataset (proj/custom/timeseries_custom.py —
template-only, no logic shipped) implies event streams per station; the
web-scale analogue is sessionizing user/event tables: consecutive events
of the same key belong to one session until a silence gap exceeds
``gap``. This is the canonical "windows can't express it, but
lag + running-sum can" pattern:

    new_session = (ts - lag(ts) > gap)          per-key event order
    session_seq = running_sum(new_session)       same window

Scale shape: ONE shuffle, partitioned by the session key (the window
partition), events ordered within partitions only — no global sort. A
pathologically hot key serializes its own partition (inherent to
per-key ordering); shard such keys upstream by coarse time range (day)
before sessionizing if needed — the seams compose because session
boundaries never cross a silence gap larger than ``gap``, so any time
shard cut inside a gap is exact.

Timestamps are compared in integer microseconds (``unix_micros`` /
DuckDB ``epoch_us``) so engines agree exactly; ordering ties on equal
timestamps are broken by ``tiebreak_col`` to keep lag deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign each row a ``session_seq`` (1-based per key, in time order).

    A new session starts at the first event of a key and whenever the
    silence since the previous event exceeds ``gap_seconds`` (strictly
    greater). Returns the input columns plus ``ts_us`` and
    ``session_seq``.
    """
    order = [F.col("ts_us")]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(key_col).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = int(gap_seconds) * 1_000_000
    # NTZ columns (parquet timestamp[us]) cast through TIMESTAMP first;
    # the session TZ is pinned UTC (session.py) so the cast is identity
    # and matches DuckDB's epoch_us on the naive value
    out = df.withColumn(
        "ts_us", F.unix_micros(F.col(ts_col).cast("timestamp"))
    )
    prev = F.lag("ts_us").over(w)
    new_sess = (
        prev.isNull() | ((F.col("ts_us") - prev) > F.lit(gap_us))
    ).cast("long")
    return out.withColumn("session_seq", F.sum(new_sess).over(run))


def session_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
    agg_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Per-session rollup: (key, session_seq, n_events, start_us, end_us,
    duration_us) plus optional ``{column: 'sum'|'avg'|'min'|'max'}``
    aggregates. The rollup groupBy keys are a superset of the window
    partition key, so AQE reuses the sessionize shuffle — one exchange
    end-to-end (asserted in tests/test_plans idiom via the entry query's
    plan audit)."""
    s = sessionize(df, key_col, ts_col, gap_seconds, tiebreak_col)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    ]
    for col, how in (agg_cols or {}).items():
        aggs.append(getattr(F, how)(col).alias(f"{how}_{col}"))
    return s.groupBy(key_col, "session_seq").agg(*aggs)


def sliding_window_stats(
    df: DataFrame,
    ts_col: str = "ts",
    window_seconds: int = 86400,
    slide_seconds: int = 21600,
    group_cols: tuple[str, ...] | list[str] = (),
    agg_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Overlapping (sliding) time-window rollup via Spark's native
    ``window()`` generator: every event is replicated map-side into the
    ``window/slide`` windows that contain it, then ONE shuffle on
    (window, group) aggregates — the moving-average/trend view a drift
    monitor reads next to the tumbling histograms in ``stats``.

    Scale shape: the replication factor IS the cost knob — a 1-day
    window sliding every 6 hours writes each event 4×, map-side, before
    the (partial-agg-combined) exchange; there is no per-key ordering
    and no window function, so no hot-entity serialization. Requires
    ``slide_seconds`` to divide ``window_seconds`` (keeps the per-event
    window count uniform and both engines' window sets identical).
    Windows are [start, end) half-open, starts aligned to the epoch
    modulo ``slide`` (Spark's native alignment); NULL timestamps are
    dropped (a windowless event has no window to count in). Boundaries
    are compared in integer microseconds like ``sessionize``.

    Output: (window_start_us, window_end_us, *group_cols, n_events,
    optional ``{col: how}`` aggregates named ``{how}_{col}``).
    """
    if window_seconds % slide_seconds != 0:
        raise ValueError(
            "slide_seconds must divide window_seconds "
            f"({slide_seconds} does not divide {window_seconds})"
        )
    ts = F.col(ts_col).cast("timestamp")
    win = F.window(
        ts, f"{int(window_seconds)} seconds", f"{int(slide_seconds)} seconds"
    )
    aggs = [F.count(F.lit(1)).alias("n_events")]
    for col, how in (agg_cols or {}).items():
        aggs.append(getattr(F, how)(col).alias(f"{how}_{col}"))
    return (
        df.filter(ts.isNotNull())
        .groupBy(win.alias("__w"), *group_cols)
        .agg(*aggs)
        .select(
            F.unix_micros(F.col("__w.start")).alias("window_start_us"),
            F.unix_micros(F.col("__w.end")).alias("window_end_us"),
            *group_cols,
            "n_events",
            *[f"{how}_{col}" for col, how in (agg_cols or {}).items()],
        )
    )


def streaming_session_stats(
    stream_df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
    agg_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Streaming analogue via Spark's native ``session_window``: state is
    one open session per key, merged as events arrive, finalized and
    evicted once the watermark passes the session end — O(active keys)
    state, the exact contract a 10^12-event stream needs.

    Boundary semantics differ from batch ``sessionize`` by a half-open
    edge: the native session window spans [ts, last_ts + gap), so an
    event arriving EXACTLY ``gap`` after the previous one starts a new
    session, where the batch path's strict ``> gap`` keeps it. With
    continuous (microsecond) timestamps the boundary case has measure
    zero; tests assert parity away from it.

    Output: (key, session struct(start, end), n_events, optional aggs).
    ``session.end`` is last event + gap by the native definition.
    """
    gap = f"{int(gap_seconds)} seconds"
    aggs = [F.count(F.lit(1)).alias("n_events")]
    for col, how in (agg_cols or {}).items():
        aggs.append(getattr(F, how)(col).alias(f"{how}_{col}"))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), gap).alias("session"),
        )
        .agg(*aggs)
    )
