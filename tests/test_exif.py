"""EXIF APP1/TIFF metadata (smcchecker_spark/exif.py) + the ExifSane
engine constraint: build/parse roundtrip, both byte orders, hostile
bounds, orientation geometry, and the planted-fixture golden."""

import struct

import numpy as np
import pytest

from smcchecker_spark import exif as ex
from smcchecker_spark import jpegcodec as jc


def _jpg(seed=0, h=12, w=16):
    a = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    return jc.encode_jpeg(a, quality=95)


def test_build_parse_roundtrip_all_tags():
    app1 = ex.build_exif_app1(
        orientation=6,
        datetime_original="2024:05:01 10:11:12",
        make="ACME",
        model="Cam 9000",
        datetime="2024:05:02 01:02:03",
    )
    tagged = ex.inject_app1(_jpg(), app1)
    got = ex.parse_exif(tagged)
    assert got == {
        "orientation": 6,
        "datetime_original": "2024:05:01 10:11:12",
        "make": "ACME",
        "model": "Cam 9000",
        "datetime": "2024:05:02 01:02:03",
    }
    # APP1 is metadata-only: decoded pixels unchanged
    assert np.array_equal(jc.decode_jpeg(tagged), jc.decode_jpeg(_jpg()))


def test_absent_exif_is_empty_not_error():
    assert ex.parse_exif(_jpg()) == {}
    assert ex.parse_exif(b"") == {}
    assert ex.parse_exif(b"\x89PNG") == {}


def test_big_endian_tiff_parses():
    # hand-build an MM (big-endian) TIFF with just Orientation=3
    tiff = (
        b"MM" + struct.pack(">HI", 42, 8)
        + struct.pack(">H", 1)
        + struct.pack(">HHI", ex.TAG_ORIENTATION, 3, 1)
        + struct.pack(">H", 3) + b"\0\0"
        + struct.pack(">I", 0)
    )
    payload = b"Exif\0\0" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    got = ex.parse_exif(ex.inject_app1(_jpg(), app1))
    assert got == {"orientation": 3}


def test_hostile_bounds_raise_valueerror_only():
    app1 = ex.build_exif_app1(orientation=1, make="A LONG MAKER NAME X")
    jpg = _jpg()
    # entry-count bomb
    ba = bytearray(app1)
    ba[18:20] = struct.pack("<H", 0xFFFF)
    with pytest.raises(ValueError, match="entry count"):
        ex.parse_exif(ex.inject_app1(jpg, bytes(ba)))
    # overflow-value offset past the segment
    i = app1.find(struct.pack("<HHI", ex.TAG_MAKE, 2, 20))
    ba = bytearray(app1)
    ba[i + 8 : i + 12] = struct.pack("<I", 1 << 30)
    with pytest.raises(ValueError, match="offset past"):
        ex.parse_exif(ex.inject_app1(jpg, bytes(ba)))
    # random bitflip fuzz: ValueError or a parse, nothing else
    import random

    random.seed(7)
    tagged = ex.inject_app1(jpg, app1)
    for _ in range(1500):
        fuzz = bytearray(tagged)
        for _ in range(3):
            fuzz[random.randrange(2, 2 + len(app1))] = random.randrange(256)
        try:
            ex.parse_exif(bytes(fuzz))
        except ValueError:
            pass


def test_oriented_dims_and_apply_orientation():
    assert ex.oriented_dims(24, 16, 1) == (24, 16)
    for o in (5, 6, 7, 8):
        assert ex.oriented_dims(24, 16, o) == (16, 24)
    arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    # identity
    assert np.array_equal(ex.apply_orientation(arr, 1), arr)
    # each transform preserves the pixel multiset and 5-8 transpose dims
    for o in range(2, 9):
        out = ex.apply_orientation(arr, o)
        assert sorted(out.reshape(-1, 3).tolist()) == sorted(
            arr.reshape(-1, 3).tolist()
        )
        assert out.shape == ((3, 2, 3) if o >= 5 else (2, 3, 3))
    # rot90 CW then rot90 CCW is identity
    assert np.array_equal(
        ex.apply_orientation(ex.apply_orientation(arr, 6), 8), arr
    )
    # flip-H twice is identity
    assert np.array_equal(
        ex.apply_orientation(ex.apply_orientation(arr, 2), 2), arr
    )


def test_exifsane_fixture_golden(spark):
    from smcchecker_spark import fixtures
    import __spark_entry__ as entry

    got = sorted(
        (r["row_id"], r["check_name"])
        for r in entry.q_exif_validate(spark, "").collect()
    )
    kinds = [fixtures.expected_exif_kind(i) for i in range(500)]
    exp = sorted(
        (f"exf{i:09d}", "exifsane_bytes")
        for i, k in enumerate(kinds)
        if k in ("corrupt", "bad_orientation", "bad_datetime")
    )
    assert got == exp
    # the fixture actually exercises every kind
    assert {"corrupt", "bad_orientation", "bad_datetime", "rot90",
            "plain", "tagged"} <= set(kinds)


def test_exifsane_untagged_and_valid_pass(spark):
    from smcchecker_spark.compile import compile_suite
    from smcchecker_spark.constraints import Suite
    from smcchecker_spark.image import ExifSane

    rows = [
        ("a", _jpg(1)),  # no EXIF
        ("b", ex.inject_app1(_jpg(2), ex.build_exif_app1(orientation=8))),
        ("c", ex.inject_app1(_jpg(3), ex.build_exif_app1(orientation=9))),
        ("d", None),     # NULL payload: NotNull's job, not ExifSane's
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    suite = Suite("s", "images", [ExifSane()])
    v = compile_suite(df, suite, row_id_col="image_id")
    bad = sorted(r["row_id"] for r in v.collect())
    assert bad == ["c"]
    msg = v.collect()[0]["error_message"]
    assert "orientation out of range: 9" in msg


def test_imageconsistent_orientation_aware(spark):
    from smcchecker_spark.compile import compile_suite
    from smcchecker_spark.constraints import Suite
    from smcchecker_spark import imagecodec as ic
    from smcchecker_spark.image import ImageConsistent

    a = np.random.default_rng(4).integers(0, 256, (12, 20, 3), dtype=np.uint8)
    raw = jc.encode_jpeg(a, quality=98)
    phash = int(ic.phash64(jc.decode_jpeg(raw)))
    rot = ex.inject_app1(raw, ex.build_exif_app1(orientation=6))
    rows = [
        # raw dims stored: always fine
        ("raw", raw, 20, 12, "jpeg", phash),
        # display (transposed) dims + orientation 6 tag
        ("disp", rot, 12, 20, "jpeg", phash),
        # transposed dims WITHOUT an orientation tag: genuinely wrong
        ("wrong", raw, 12, 20, "jpeg", phash),
    ]
    schema = (
        "image_id string, bytes binary, w int, h int, fmt string, "
        "phash long"
    )
    df = spark.createDataFrame(rows, schema)

    strict = compile_suite(
        df, Suite("s", "images", [ImageConsistent()]), row_id_col="image_id"
    )
    assert sorted({r["row_id"] for r in strict.collect()}) == ["disp", "wrong"]

    aware = compile_suite(
        df,
        Suite("s", "images", [ImageConsistent(orientation_aware=True)]),
        row_id_col="image_id",
    )
    assert sorted({r["row_id"] for r in aware.collect()}) == ["wrong"]
