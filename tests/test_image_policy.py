"""Decode-free image-policy gates (image.py: MinResolution /
AspectRatioRange / BytesPerPixelRange) against REAL generated payloads:
expected flag sets are recomputed in pandas from the fixture's own
metadata, so the test verifies the compiled Column arithmetic (including
the true binary length() path) rather than a planted distribution. The
arithmetic is also value-oracled at the driver gate via the
engine_image_policy query."""

import pytest

from smcchecker_spark import fixtures
from smcchecker_spark.compile import compile_suite
from smcchecker_spark.constraints import Suite
from smcchecker_spark.image import (
    AspectRatioRange,
    BytesPerPixelRange,
    MinResolution,
)

MIN_W, MIN_H = 16, 16
AR_LO, AR_HI = 0.5, 2.0
BPP_LO, BPP_HI = 1.0, 3.5


@pytest.fixture(scope="module")
def corpus(spark):
    df = fixtures.generate_images(spark, n_rows=400, n_parts=8, seed=7,
                                  clean=True)
    pdf = df.selectExpr(
        "image_id", "w", "h", "length(bytes) AS nb"
    ).toPandas()
    return df, pdf


@pytest.fixture(scope="module")
def flagged(spark, corpus):
    df, _ = corpus
    suite = Suite(
        name="policy",
        table="images",
        constraints=[
            MinResolution("w", h_col="h", min_w=MIN_W, min_h=MIN_H),
            AspectRatioRange("w", h_col="h", lo=AR_LO, hi=AR_HI),
            BytesPerPixelRange("bytes", w_col="w", h_col="h",
                               lo=BPP_LO, hi=BPP_HI),
        ],
    )
    out = compile_suite(df, suite, row_id_col="image_id",
                        part_id_col="part_id")
    rows = out.select("row_id", "check_name").collect()
    by_check = {}
    for r in rows:
        by_check.setdefault(r.check_name, set()).add(r.row_id)
    return by_check


def test_min_resolution_matches_recompute(corpus, flagged):
    _, pdf = corpus
    want = set(pdf[(pdf.w < MIN_W) | (pdf.h < MIN_H)].image_id)
    assert flagged.get("minresolution_w_h", set()) == want
    assert want, "fixture should contain sub-16px images"


def test_aspect_ratio_matches_recompute(corpus, flagged):
    _, pdf = corpus
    want = set(pdf[(pdf.w < AR_LO * pdf.h) | (pdf.w > AR_HI * pdf.h)].image_id)
    assert flagged.get("aspectratio_w_h", set()) == want
    assert want, "fixture should contain >2:1 aspect ratios"


def test_bytes_per_pixel_matches_recompute(corpus, flagged):
    _, pdf = corpus
    px = pdf.w * pdf.h
    want = set(pdf[(pdf.nb < BPP_LO * px) | (pdf.nb > BPP_HI * px)].image_id)
    assert flagged.get("bytesperpixel_bytes", set()) == want


def test_policy_only_suite_has_no_python_stage(spark, corpus):
    """The whole point of the policy gates: a curation pre-pass with no
    decode — the plan must carry no Arrow/Python eval at all."""
    df, _ = corpus
    suite = Suite(
        name="policy",
        table="images",
        constraints=[
            MinResolution("w", h_col="h", min_w=MIN_W, min_h=MIN_H),
            AspectRatioRange("w", h_col="h", lo=AR_LO, hi=AR_HI),
            BytesPerPixelRange("bytes", w_col="w", h_col="h",
                               lo=BPP_LO, hi=BPP_HI),
        ],
    )
    out = compile_suite(df, suite, row_id_col="image_id",
                        part_id_col="part_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the fixture generator itself is mapInPandas (one Python stage);
    # the POLICY pass must add none beyond it
    assert plan.count("ArrowEvalPython") == 0, plan
    assert plan.count("BatchEvalPython") == 0, plan


def test_suggested_policy_passes_own_snapshot(spark, corpus):
    from smcchecker_spark.image import suggest_image_policy

    df, pdf = corpus
    cons = suggest_image_policy(df)
    suite = Suite(name="auto_policy", table="images", constraints=cons)
    out = compile_suite(df, suite, row_id_col="image_id",
                        part_id_col="part_id")
    assert out.count() == 0
    # derived bounds reflect the observed envelope
    mr = next(c for c in cons if c.name.startswith("minresolution"))
    assert mr.min_w == pdf.w.min() and mr.min_h == pdf.h.min()


def test_suggested_policy_flags_outliers(spark, corpus):
    from pyspark.sql import functions as F

    from smcchecker_spark.image import suggest_image_policy

    df, _ = corpus
    cons = suggest_image_policy(df)
    suite = Suite(name="auto_policy", table="images", constraints=cons)
    # a banner-shaped, tiny, and truncated row — outside every observed bound
    outlier = df.limit(1).select(
        F.lit("outlier").alias("image_id"),
        F.col("bytes").substr(1, 8).alias("bytes"),
        F.lit(2).cast("int").alias("w"),
        F.lit(500).cast("int").alias("h"),
        "fmt", "caption", "phash", "part_id",
    )
    dirty = df.select("image_id", "bytes", "w", "h", "fmt", "caption",
                      "phash", "part_id").unionByName(outlier)
    out = compile_suite(dirty, suite, row_id_col="image_id",
                        part_id_col="part_id")
    got = {r.check_name for r in out.select("check_name").distinct().collect()}
    assert {"minresolution_w_h", "aspectratio_w_h",
            "bytesperpixel_bytes"} <= got
    flagged = {r.row_id for r in out.select("row_id").distinct().collect()}
    assert flagged == {"outlier"}


def test_image_near_dups_from_raw_bytes(spark):
    """dedup.image_near_dups: no stored phash — one decode pass computes
    it, then banding pairs lossy re-encodes with their originals and
    nothing else; a corrupt payload is excluded, not fatal."""
    import numpy as np

    from smcchecker_spark import imagecodec as ic
    from smcchecker_spark.ops import dedup

    rng = np.random.default_rng(11)
    rows = []
    for i in range(40):
        arr = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        rows.append((f"orig{i}", ic.encode_png(arr)))
        if i % 2 == 0:  # lossy re-encode twin (phash moves <= 2 bits)
            rows.append((f"twin{i}", ic.encode_fake_lossy(arr)))
    rows.append(("corrupt", b"\x89PNG but not really"))
    df = spark.createDataFrame(rows, "image_id string, bytes binary")

    pairs = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in dedup.image_near_dups(df, max_hamming=3).collect()
    }
    want = {(f"orig{i}", f"twin{i}") for i in range(0, 40, 2)}
    assert pairs == want


def test_decontaminate_images_real_payloads(spark):
    """contamination.decontaminate_images drops exactly the corpus
    images whose phash near-matches a benchmark image (here: the
    benchmark holds lossy re-encodes of 10 corpus images)."""
    import numpy as np

    from smcchecker_spark import imagecodec as ic
    from smcchecker_spark.ops import contamination

    rng = np.random.default_rng(23)
    corpus_rows, bench_rows = [], []
    for i in range(50):
        arr = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        corpus_rows.append((f"img{i}", int(ic.phash64(arr))))
        if i < 10:  # benchmark contains a lossy re-encode of img0..img9
            twin = ic.decode_fake_lossy(ic.encode_fake_lossy(arr))
            bench_rows.append((int(ic.phash64(twin)),))
    corpus = spark.createDataFrame(corpus_rows, "image_id string, phash long")
    bench = spark.createDataFrame(bench_rows, "phash long")

    flagged = contamination.phash_overlap(corpus, bench, max_hamming=3)
    assert {r.image_id for r in flagged.collect()} == {
        f"img{i}" for i in range(10)
    }
    kept = contamination.decontaminate_images(corpus, bench, max_hamming=3)
    assert {r.image_id for r in kept.collect()} == {
        f"img{i}" for i in range(10, 50)
    }
