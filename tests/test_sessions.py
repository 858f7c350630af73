"""ops/sessions.py — gap-based sessionization semantics (strict-gap
boundary, tie-break determinism, per-key isolation) against a hand-built
event log, plus the one-exchange plan claim (the stats rollup reuses the
window's key partitioning). Value parity vs SQL is the driver-gate
``sessionize_events`` oracle."""

from datetime import datetime

import pytest

from smcchecker_spark.ops import sessions

GAP = 60  # seconds


def _ts(s: float) -> datetime:
    return datetime(2024, 1, 1, 0, 0, 0).fromtimestamp(1704067200 + s)


ROWS = [
    # (event_id, user, seconds-offset)  — u1: 3 sessions
    (1, "u1", 0.0),
    (2, "u1", 30.0),
    (3, "u1", 90.0),       # 60s gap exactly -> NOT a new session (strict >)
    (4, "u1", 150.5),      # 60.5s gap -> new session
    (5, "u1", 400.0),      # new session
    # u2: single session, duplicate timestamps (tie-break by event_id)
    (6, "u2", 10.0),
    (7, "u2", 10.0),
    (8, "u2", 20.0),
]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        [(i, u, _ts(s)) for i, u, s in ROWS],
        "event_id long, user_id string, ts timestamp",
    )


def test_session_assignment(events):
    got = {
        r.event_id: r.session_seq
        for r in sessions.sessionize(
            events, key_col="user_id", ts_col="ts", gap_seconds=GAP,
            tiebreak_col="event_id",
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 3, 6: 1, 7: 1, 8: 1}


def test_session_stats(events):
    out = sessions.session_stats(
        events, key_col="user_id", ts_col="ts", gap_seconds=GAP,
        tiebreak_col="event_id",
    )
    rows = {(r.user_id, r.session_seq): r for r in out.collect()}
    assert len(rows) == 4
    s1 = rows[("u1", 1)]
    assert s1.n_events == 3 and s1.duration_us == 90_000_000
    assert rows[("u1", 3)].n_events == 1
    assert rows[("u2", 1)].n_events == 3


def test_rollup_reuses_window_partitioning(events):
    """groupBy(user, session_seq) clusters a superset of the window's
    HashPartitioning(user) — EnsureRequirements must add no second
    exchange."""
    out = sessions.session_stats(
        events, key_col="user_id", ts_col="ts", gap_seconds=GAP,
        tiebreak_col="event_id",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1, plan


def test_streaming_sessions_match_batch(spark, events, tmp_path):
    """Native session_window streaming path == batch sessionize away
    from the half-open gap boundary: same sessions per key, same event
    counts, same session starts. One micro-batch (availableNow) in
    complete mode emits every session's final state (session merging
    rules out update mode)."""
    # drop the exact-gap-boundary event (id 3): the two paths define it
    # differently (documented in streaming_session_stats)
    df = events.filter("event_id <> 3")
    src = str(tmp_path / "src")
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    out = sessions.streaming_session_stats(
        stream, key_col="user_id", ts_col="ts", gap_seconds=GAP,
        watermark="10 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session.start, r.n_events)
        for r in spark.sql("select * from sess_stream").collect()
    }

    batch = sessions.session_stats(
        df, key_col="user_id", ts_col="ts", gap_seconds=GAP,
        tiebreak_col="event_id",
    )
    want = {
        (r.user_id, datetime.fromtimestamp(r.start_us / 1e6), r.n_events)
        for r in batch.collect()
    }
    assert got == want and len(want) == 4


# ---------------------------------------------------------------------------
# sliding_window_stats — overlapping windows via the native generator
# ---------------------------------------------------------------------------


def test_sliding_window_stats_membership_and_aggs(spark):
    from datetime import datetime

    # window 40s, slide 10s -> every event lands in exactly 4 windows;
    # epoch-aligned starts. Event at t=25s belongs to starts {-10,0,10,20}.
    rows = [
        (1, datetime.utcfromtimestamp(25), "a", 2.0),
        (2, datetime.utcfromtimestamp(30), "a", 3.0),  # starts {0,10,20,30}
        (3, datetime.utcfromtimestamp(5), "b", 1.0),   # starts {-30..0}
        (4, None, "a", 99.0),                          # dropped
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = sessions.sliding_window_stats(
        df, ts_col="ts", window_seconds=40, slide_seconds=10,
        group_cols=["event_type"], agg_cols={"value": "sum"},
    )
    got = {
        (r.window_start_us, r.event_type): (r.n_events, r.sum_value)
        for r in out.collect()
    }
    # every event appears in exactly window/slide = 4 windows
    assert sum(n for n, _ in got.values()) == 12
    # overlap: both 'a' events share starts {0,10,20} (sum 5.0), only
    # t=25 has start -10, only t=30 has start 30
    us = 1_000_000
    assert got[(0 * us, "a")] == (2, 5.0)
    assert got[(20 * us, "a")] == (2, 5.0)
    assert got[(-10 * us, "a")] == (1, 2.0)
    assert got[(30 * us, "a")] == (1, 3.0)
    # window_end - window_start == window for every row
    assert all(
        r.window_end_us - r.window_start_us == 40 * us for r in out.collect()
    )
    # NULL ts contributed nowhere
    assert all(v[1] < 99.0 for v in got.values())


def test_sliding_window_requires_divisible_slide(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1,)], "x long")
    with _pytest.raises(ValueError, match="must divide"):
        sessions.sliding_window_stats(
            df, window_seconds=100, slide_seconds=33
        )
