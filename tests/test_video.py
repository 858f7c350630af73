"""VideoConsistent (video.py): AVI-MJPEG demux + first-frame metadata
validation — facts core, engine golden vs planted rules, messages."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from smcchecker_spark import avicodec, fixtures, jpegcodec
from smcchecker_spark.compile import compile_suite
from smcchecker_spark.constraints import NotNull, Suite, Unique
from smcchecker_spark.video import VideoConsistent, video_facts_batches


def _facts(payloads):
    (out,) = list(video_facts_batches(iter([pd.Series(payloads)])))
    return out


def test_video_facts_core():
    rng = np.random.default_rng(2)
    jpegs = [
        jpegcodec.encode_jpeg(
            rng.integers(0, 256, (16, 24, 3), dtype=np.uint8), quality=95
        )
        for _ in range(3)
    ]
    avi = avicodec.encode_avi_mjpeg(jpegs, 24, 16)
    out = _facts([avi, avi[:40], b"\x00" * 60, None])
    assert out.iloc[0]["ok"]
    assert (out.iloc[0]["n_frames"], out.iloc[0]["w"], out.iloc[0]["h"]) == (3, 24, 16)
    assert not out.iloc[1]["ok"] and "AVI" in out.iloc[1]["err"]
    assert not out.iloc[2]["ok"] and out.iloc[2]["err"] == "not an AVI payload"
    assert not out.iloc[3]["ok"] and out.iloc[3]["err"] == "null payload"


def test_video_corrupt_first_frame_falls_through():
    # frame 0 is garbage: the witness decode uses the NEXT frame; an
    # all-corrupt container is a violation, not a crash
    rng = np.random.default_rng(3)
    good = jpegcodec.encode_jpeg(
        rng.integers(0, 256, (8, 8, 3), dtype=np.uint8), quality=95
    )
    avi_mixed = avicodec.encode_avi_mjpeg([b"\xff\xd8junk", good], 8, 8)
    avi_allbad = avicodec.encode_avi_mjpeg([b"\xff\xd8junk"] * 2, 8, 8)
    out = _facts([avi_mixed, avi_allbad])
    assert out.iloc[0]["ok"] and out.iloc[0]["n_frames"] == 2
    assert not out.iloc[1]["ok"]
    assert out.iloc[1]["err"] == "no decodable frame"


def test_video_fixture_suite_golden(spark):
    from tests.test_jpeg import expected_codec_violation_rows
    import __spark_entry__ as entry

    got = sorted(
        (r["row_id"], r["check_name"])
        for r in entry.q_video_validate(spark, "").collect()
    )
    assert got == expected_codec_violation_rows(
        300, "avi", "videoconsistent_bytes", "video_id",
        fixtures.expected_avi_flags,
        ("truncated", "bitflip", "nframes_off", "w_off"),
    )


def test_video_violation_messages(spark):
    df = fixtures.generate_avi_rows(spark, n_rows=100, n_parts=4, seed=17)
    suite = Suite(name="v", table="video", constraints=[VideoConsistent()])
    v = compile_suite(df, suite, row_id_col="video_id", part_id_col="part_id")
    msgs = {r["row_id"]: r["error_message"] for r in v.collect()}
    assert "demux/decode failed" in msgs["avi000000003"]  # truncated
    assert "n_frames mismatch" in msgs["avi000000005"]    # nframes_off
    assert "width mismatch" in msgs["avi000000007"]       # w_off


def test_video_clean_fixture_validates_clean(spark):
    df = fixtures.generate_avi_rows(
        spark, n_rows=90, n_parts=4, seed=17, clean=True
    )
    suite = Suite(
        name="v",
        table="video",
        constraints=[NotNull("caption"), Unique(["video_id"]), VideoConsistent()],
    )
    v = compile_suite(df, suite, row_id_col="video_id", part_id_col="part_id")
    assert v.count() == 0
