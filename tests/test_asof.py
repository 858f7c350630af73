"""Tests for the distributed as-of join (ops/asof.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from smcchecker_spark.ops.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),  # before any right → NULL
            (2, "u1", _ts("2024-01-01 12:00:00")),  # tie with right @12 → match
            (3, "u1", _ts("2024-01-01 15:00:00")),  # after 12 and 14 → 14
            (4, "u2", _ts("2024-01-01 15:00:00")),  # other key → u2's 11
            (5, "u3", _ts("2024-01-01 15:00:00")),  # key with no right → NULL
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 12:00:00"), 100.0),
            ("u1", _ts("2024-01-01 14:00:00"), 200.0),
            ("u2", _ts("2024-01-01 11:00:00"), 300.0),
        ],
        "user_id string, ts timestamp, price double",
    )
    return left, right


def test_asof_backward_semantics(spark, sides):
    left, right = sides
    out = asof_join(left, right, "user_id", left_ts="ts").collect()
    got = {r["event_id"]: (r["asof_ts"], r["asof_price"]) for r in out}
    assert len(got) == 5
    assert got[1] == (None, None)
    assert got[2] == (_ts("2024-01-01 12:00:00"), 100.0)  # at-or-before
    assert got[3] == (_ts("2024-01-01 14:00:00"), 200.0)
    assert got[4] == (_ts("2024-01-01 11:00:00"), 300.0)
    assert got[5] == (None, None)


def test_asof_tolerance_and_tie_break(spark, sides):
    left, right = sides
    out = asof_join(left, right, "user_id", left_ts="ts", tolerance_s=3600).collect()
    got = {r["event_id"]: r["asof_price"] for r in out}
    # event 3 (15:00) is 1h after 14:00 → still in window; event 4 (15:00)
    # is 4h after u2's 11:00 → nulled, NOT matched to anything older
    assert got[3] == 200.0
    assert got[4] is None

    # deterministic tie: two right rows at the same (key, ts) — greatest
    # payload struct (ts first, then price) wins
    dup = right.union(
        right.filter(F.col("price") == 100.0).withColumn("price", F.lit(50.0))
    )
    out2 = asof_join(left, dup, "user_id", left_ts="ts").collect()
    got2 = {r["event_id"]: r["asof_price"] for r in out2}
    assert got2[2] == 100.0


def test_asof_is_partitioning_independent_and_single_exchange(spark, sides):
    left, right = sides
    a = asof_join(left.repartition(7), right.coalesce(1), "user_id")
    b = asof_join(left.coalesce(1), right.repartition(5), "user_id")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # plan shape: ONE hash exchange (on the key), no join operator at all —
    # the as-of is a union + window, so hot keys degrade to a sort, never
    # to a pair enumeration
    plan = a._jdf.queryExecution().executedPlan().toString()
    # executed adaptive plans print Final + Initial sections — count the final
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1
    for bad in ("SortMergeJoin", "CartesianProduct", "BroadcastNestedLoop"):
        assert bad not in plan


def test_asof_validates_columns(spark, sides):
    left, right = sides
    with pytest.raises(ValueError):
        asof_join(left, right.select("user_id", "price"), "user_id")


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized parity vs pandas.merge_asof (seeded): same backward
    at-or-before semantics on multi-key data with duplicate left
    timestamps and unique (key, ts) right rows."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    left_pd = pd.DataFrame(
        {
            "eid": np.arange(300),
            "k": rng.integers(0, 8, 300),
            "t": rng.integers(0, 1000, 300).astype("float64"),
        }
    )
    right_rows = sorted(
        {(int(k), float(t)) for k, t in zip(rng.integers(0, 8, 120),
                                            rng.integers(0, 1000, 120))}
    )
    right_pd = pd.DataFrame(right_rows, columns=["k", "t"])
    right_pd["price"] = rng.normal(size=len(right_pd)).round(6)

    want = pd.merge_asof(
        left_pd.sort_values("t", kind="mergesort"),
        right_pd.sort_values("t", kind="mergesort"),
        on="t", by="k", direction="backward", suffixes=("", "_r"),
    )
    expected = {
        int(r.eid): (None if pd.isna(r.price) else round(float(r.price), 6))
        for r in want.itertuples()
    }

    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)
    got = {
        r["eid"]: (None if r["asof_price"] is None else round(r["asof_price"], 6))
        for r in asof_join(left, right, "k", left_ts="t").collect()
    }
    assert got == expected


def test_asof_tolerance_matches_pandas(spark):
    """Tolerance semantics == pandas merge_asof(tolerance=...): too-old
    matches become NULL, not next-older."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    left_pd = pd.DataFrame({
        "eid": np.arange(150),
        "k": rng.integers(0, 5, 150),
        "t": rng.integers(0, 500, 150).astype("float64"),
    })
    right_rows = sorted({(int(k), float(t)) for k, t in
                         zip(rng.integers(0, 5, 60), rng.integers(0, 500, 60))})
    right_pd = pd.DataFrame(right_rows, columns=["k", "t"])
    right_pd["price"] = np.arange(len(right_pd), dtype="float64")

    want = pd.merge_asof(
        left_pd.sort_values("t", kind="mergesort"),
        right_pd.sort_values("t", kind="mergesort"),
        on="t", by="k", direction="backward", tolerance=25.0,
        suffixes=("", "_r"),
    )
    expected = {
        int(r.eid): (None if pd.isna(r.price) else float(r.price))
        for r in want.itertuples()
    }
    got = {
        r["eid"]: r["asof_price"]
        for r in asof_join(
            spark.createDataFrame(left_pd),
            spark.createDataFrame(right_pd),
            "k", left_ts="t", tolerance_s=25.0,
        ).collect()
    }
    assert got == expected


def test_asof_forward_and_nearest_match_pandas(spark):
    """direction='forward'/'nearest' parity vs pandas merge_asof on
    seeded random data (odd/even timestamps — no equidistant-nearest
    ties, whose resolution pandas leaves unspecified)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(23)
    left_pd = pd.DataFrame({
        "eid": np.arange(200),
        "k": rng.integers(0, 6, 200),
        # odd left timestamps, even right timestamps → |bd| != |fd| always
        "t": (rng.integers(0, 400, 200) * 2 + 1).astype("float64"),
    })
    right_rows = sorted({(int(k), float(t * 2)) for k, t in
                         zip(rng.integers(0, 6, 80), rng.integers(0, 400, 80))})
    right_pd = pd.DataFrame(right_rows, columns=["k", "t"])
    right_pd["price"] = np.arange(len(right_pd), dtype="float64")

    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)
    for direction in ("forward", "nearest"):
        want = pd.merge_asof(
            left_pd.sort_values("t", kind="mergesort"),
            right_pd.sort_values("t", kind="mergesort"),
            on="t", by="k", direction=direction, suffixes=("", "_r"),
        )
        expected = {
            int(r.eid): (None if pd.isna(r.price) else float(r.price))
            for r in want.itertuples()
        }
        got = {
            r["eid"]: r["asof_price"]
            for r in asof_join(left, right, "k", left_ts="t",
                               direction=direction).collect()
        }
        assert got == expected, direction


def test_asof_direction_edges(spark):
    left = spark.createDataFrame(
        [(1, "u", 10.0), (2, "u", 25.0)], "eid long, k string, t double"
    )
    right = spark.createDataFrame(
        [("u", 10.0, 100.0), ("u", 20.0, 200.0), ("u", 30.0, 300.0)],
        "k string, t double, price double",
    )

    def run(direction, tol=None):
        return {
            r["eid"]: r["asof_price"]
            for r in asof_join(left, right, "k", left_ts="t",
                               direction=direction, tolerance_s=tol).collect()
        }

    # equal-ts right matches every direction
    assert run("backward") == {1: 100.0, 2: 200.0}
    assert run("forward") == {1: 100.0, 2: 300.0}
    # nearest: eid2 at 25 is equidistant to 20 and 30 → backward wins
    assert run("nearest") == {1: 100.0, 2: 200.0}
    # tolerance applies as absolute distance in every direction
    assert run("forward", tol=4.0) == {1: 100.0, 2: None}
    import pytest
    with pytest.raises(ValueError):
        asof_join(left, right, "k", left_ts="t", direction="sideways")


def test_asof_nearest_still_single_exchange(spark, sides):
    left, right = sides
    df = asof_join(left, right, "user_id", direction="nearest")
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    # both carry windows ride the same (key) partitioning + (t, side,
    # payload) sort — adding directions must not add exchanges
    assert plan.count("Exchange hashpartitioning") == 1
