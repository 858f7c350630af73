"""Externally-produced JPEG interop vectors.

The VP8L field-order bug (commit 2edd8ca) proved self-consistent
roundtrips can hide spec misreadings — an encoder and decoder sharing
one wrong assumption still roundtrip perfectly. These vectors break
that symmetry with the JDK's javax.imageio JPEG codec (an
implementation with zero shared code), generated once by
tools/JpegVectors.java and committed under tests/vectors/:

- ``ext_*.jpg``  : bitstreams ImageIO ENCODED (bytes our encoder never
  produced — different table choices, subsampling decisions, marker
  layout), paired with ImageIO's own decoded RGB (``.rgb``: 8-byte h/w
  header + row-major pixels).
- ``ours_*.jpg`` : bitstreams OUR encoder produced, paired with what
  ImageIO decoded them to — proving external decoders open our output
  and agree on the pixels.

Decoder agreement tolerances are decoder freedom, not slack: T.81
specifies IDCT accuracy bounds, not bit-exact output, and chroma
upsampling interpolation is unspecified (ImageIO interpolates, we
replicate) — so 4:4:4 files must agree within ±2 per sample and
subsampled files within PSNR ≥ 40 dB.
"""

import glob
import os

import numpy as np
import pytest

from smcchecker_spark import jpegcodec as jc

VEC = os.path.join(os.path.dirname(__file__), "vectors")


def _read_rgb(path):
    raw = open(path, "rb").read()
    h = int.from_bytes(raw[0:4], "big")
    w = int.from_bytes(raw[4:8], "big")
    return np.frombuffer(raw[8:], dtype=np.uint8).reshape(h, w, 3)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


def _is_444(jpg: bytes) -> bool:
    at = jpg.find(b"\xff\xc0")
    if at == -1:
        at = jpg.index(b"\xff\xc2")  # progressive SOF
    n = jpg[at + 9]
    return all(jpg[at + 11 + 3 * c] == 0x11 for c in range(n))


@pytest.mark.parametrize(
    "name", sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(VEC, "ext_*.jpg"))
    )
)
def test_decode_external_bitstreams(name):
    """Files ImageIO encoded: our decoder must open them and agree with
    ImageIO's own decode."""
    jpg = open(os.path.join(VEC, name), "rb").read()
    ref = _read_rgb(os.path.join(VEC, name.replace(".jpg", ".rgb")))
    ours = jc.decode_jpeg(jpg)
    assert ours.shape == ref.shape
    if _is_444(jpg):
        assert int(np.abs(ours.astype(int) - ref.astype(int)).max()) <= 2
    else:
        assert _psnr(ours, ref) >= 38.0


@pytest.mark.parametrize(
    "name", sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(VEC, "ours_*.jpg"))
    )
)
def test_external_decoder_reads_our_bitstreams(name):
    """Files our encoder produced: ImageIO opened them (the .rgb dump
    exists) and its pixels must agree with our own decode."""
    jpg = open(os.path.join(VEC, name), "rb").read()
    jdec = _read_rgb(os.path.join(VEC, name.replace(".jpg", ".rgb")))
    ours = jc.decode_jpeg(jpg)
    assert ours.shape == jdec.shape
    if _is_444(jpg):
        assert int(np.abs(ours.astype(int) - jdec.astype(int)).max()) <= 2
    else:
        assert _psnr(ours, jdec) >= 40.0


def test_our_committed_bitstreams_still_reproduce():
    """The committed ours_* payloads pin the encoder's determinism: the
    same source arrays must re-encode to the identical bytes (if this
    breaks, regenerate the vectors with tools/JpegVectors.java and
    re-verify interop)."""
    specs = [
        (16, 16, 11, 95, "444"),
        (24, 17, 12, 90, "420"),
        (9, 31, 13, 98, "444"),
    ]
    for h, w, seed, q, sub in specs:
        rng = np.random.default_rng(seed)
        y, x = np.mgrid[0:h, 0:w]
        base = (x * 5 + y * 3) & 0xFF
        arr = np.clip(
            np.stack([base] * 3, -1) + rng.integers(0, 32, (h, w, 3)),
            0, 255,
        ).astype(np.uint8)
        enc = jc.encode_jpeg(arr, quality=q, subsampling=sub)
        committed = open(
            os.path.join(VEC, f"ours_{h}x{w}_{sub}_q{q}.jpg"), "rb"
        ).read()
        assert enc == committed, (h, w, sub, q)
