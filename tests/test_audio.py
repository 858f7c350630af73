"""AudioConsistent (audio.py): decoded-WAV metadata validation —
facts core, engine golden vs the planted rules, messages, plan shape."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from smcchecker_spark import fixtures, wavcodec
from smcchecker_spark.audio import AudioConsistent, audio_facts_batches
from smcchecker_spark.compile import compile_suite
from smcchecker_spark.constraints import NotNull, Suite, Unique


def _facts(payloads):
    (out,) = list(audio_facts_batches(iter([pd.Series(payloads)])))
    return out


def test_audio_facts_core():
    tone = (np.sin(np.linspace(0, 40, 2400)) * 9000).astype(np.int16)
    wav = wavcodec.encode_wav(tone, sample_rate=8000)
    out = _facts([wav, wav[:30], b"\x00" * 50, None])
    assert out.iloc[0]["ok"] and out.iloc[0]["n_samples"] == 2400
    assert out.iloc[0]["sample_rate"] == 8000
    assert not out.iloc[1]["ok"] and "WAV" in out.iloc[1]["err"]
    assert not out.iloc[2]["ok"] and out.iloc[2]["err"] == "not a WAV payload"
    assert not out.iloc[3]["ok"] and out.iloc[3]["err"] == "null payload"


def test_audio_fixture_suite_golden(spark):
    from tests.test_jpeg import expected_codec_violation_rows
    import __spark_entry__ as entry

    got = sorted(
        (r["row_id"], r["check_name"])
        for r in entry.q_audio_validate(spark, "").collect()
    )
    assert got == expected_codec_violation_rows(
        500, "wav", "audioconsistent_bytes", "audio_id",
        fixtures.expected_wav_flags,
        ("truncated", "bitflip", "n_off", "rate_off"),
    )


def test_audio_violation_messages(spark):
    df = fixtures.generate_wav_rows(spark, n_rows=200, n_parts=4, seed=13)
    suite = Suite(name="a", table="audio", constraints=[AudioConsistent()])
    v = compile_suite(df, suite, row_id_col="audio_id", part_id_col="part_id")
    msgs = {r["row_id"]: r["error_message"] for r in v.collect()}
    assert "decode failed" in msgs["wav000000003"]  # i=3 truncated
    assert "n_samples mismatch" in msgs["wav000000005"]  # i=5 n_off
    assert "sample_rate mismatch" in msgs["wav000000007"]  # i=7 rate_off


def test_audio_decode_single_arrow_stage(spark):
    df = fixtures.generate_wav_rows(spark, n_rows=50, n_parts=4, seed=13)
    suite = Suite(name="a", table="audio", constraints=[AudioConsistent()])
    v = compile_suite(df, suite, row_id_col="audio_id", part_id_col="part_id")
    plan = v._jdf.queryExecution().executedPlan().toString()
    # the fixture generator itself is one Arrow stage; the constraint
    # must add exactly ONE more (each payload decoded once)
    assert plan.count("ArrowEvalPython") == 1, plan


def test_audio_clean_fixture_validates_clean(spark):
    df = fixtures.generate_wav_rows(
        spark, n_rows=120, n_parts=4, seed=13, clean=True
    )
    suite = Suite(
        name="a",
        table="audio",
        constraints=[NotNull("caption"), Unique(["audio_id"]), AudioConsistent()],
    )
    v = compile_suite(df, suite, row_id_col="audio_id", part_id_col="part_id")
    assert v.count() == 0
