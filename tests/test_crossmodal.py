"""Cross-modal consistency ops: boilerplate captions, conflicting images.

Beyond-reference curation layer for image+caption pair tables (task
brief); plan discipline mirrors ops/crossmodal.py docstrings.
"""

import pytest
from pyspark.sql import functions as F

from smcchecker_spark.ops import crossmodal as XM


@pytest.fixture(scope="module")
def pairs(spark):
    rows = []
    # boilerplate: one caption on 30 distinct images
    rows += [(f"b{i}", "stock photo", 1000 + i) for i in range(30)]
    # conflicting: one image under 8 distinct captions
    rows += [(f"c{i}", f"caption variant {i}", 77) for i in range(8)]
    # clean 1:1 pairs
    rows += [(f"ok{i}", f"a unique caption {i}", 2000 + i) for i in range(20)]
    # duplicates of ONE clean pair (must not inflate distinct fan-outs)
    rows += [(f"dup{i}", "a unique caption 0", 2000) for i in range(5)]
    # NULLs drop out of pairing entirely
    rows += [("n1", None, 3000), ("n2", "has caption", None)]
    return spark.createDataFrame(
        rows, "image_id string, caption string, phash long"
    )


def test_pair_counts_collapse_duplicates(spark, pairs):
    pc = XM.pair_counts(pairs).collect()
    by_key = {(r["caption_fp"], r["phash"]): r["n_rows"] for r in pc}
    fp0 = XM.caption_fingerprint(F.lit("a unique caption 0"))
    fp0_val = spark.range(1).select(fp0.alias("f")).first()["f"]
    # the duplicated clean pair is ONE pair row with n_rows = 6
    assert by_key[(fp0_val, 2000)] == 6
    # NULL rows never pair
    assert all(k[1] is not None for k in by_key)


def test_caption_fingerprint_normalizes(spark):
    vals = spark.range(1).select(
        XM.caption_fingerprint(F.lit("  Stock   Photo ")).alias("a"),
        XM.caption_fingerprint(F.lit("stock photo")).alias("b"),
        XM.caption_fingerprint(F.lit("stock photos")).alias("c"),
    ).first()
    assert vals["a"] == vals["b"] != vals["c"]


def test_stats_fanouts(spark, pairs):
    caps = {r["caption_fp"]: r for r in XM.caption_stats(pairs).collect()}
    boiler_fp = spark.range(1).select(
        XM.caption_fingerprint(F.lit("stock photo")).alias("f")
    ).first()["f"]
    assert caps[boiler_fp]["n_phashes"] == 30
    assert caps[boiler_fp]["n_rows"] == 30
    phs = {r["phash"]: r for r in XM.phash_stats(pairs).collect()}
    assert phs[77]["n_captions"] == 8
    # duplicates don't inflate the DISTINCT caption fan-out
    assert phs[2000]["n_captions"] == 1 and phs[2000]["n_rows"] == 6


def test_flag_crossmodal(spark, pairs):
    got = {
        r["image_id"]: (r["boilerplate_caption"], r["conflicting_image"])
        for r in XM.flag_crossmodal(
            pairs, "image_id",
            max_phashes_per_caption=10, max_captions_per_phash=5,
        ).collect()
    }
    assert all(got[f"b{i}"] == (True, False) for i in range(30))
    assert all(got[f"c{i}"] == (False, True) for i in range(8))
    assert all(got[f"ok{i}"] == (False, False) for i in range(20))
    assert all(got[f"dup{i}"] == (False, False) for i in range(5))
    # NULL-bearing rows are excluded from the flag table
    assert "n1" not in got and "n2" not in got


def test_flag_plan_shape(spark, pairs):
    """The flag attach must be broadcast joins — the corpus never
    shuffles for the attach (only the pair agg exchanges)."""
    plan = XM.flag_crossmodal(pairs, "image_id")._jdf.queryExecution(
    ).explainString(
        pairs._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
