"""Real baseline JPEG (JFIF) encode/decode in pure numpy + stdlib.

The container has no libjpeg/PIL, and the engine's lossy image path
(decode → PSNR ≥ 40 dB gate; BASELINE.json input_hint) needs an actual
lossy bitstream, not the FAKE-LOSSY stand-in. This module implements
ITU-T T.81 baseline sequential DCT from the public spec:

- **Encode**: RGB → Rec.601 YCbCr, optional 4:2:0 chroma subsampling
  (2×2 box mean), 8×8 blocks, orthonormal 2-D DCT (T.81's FDCT), IJG
  quality-scaled Annex-K quantization tables, zigzag, DC-differential +
  AC run-length symbols, Annex-K canonical Huffman codes, vectorized
  bit packing, 0xFF byte stuffing, full JFIF header set
  (SOI/APP0/DQT/SOF0/DHT/SOS/EOI). Output is a spec-valid JPEG any
  external decoder can open.
- **Decode**: marker walk, arbitrary quant/Huffman table slots,
  baseline (SOF0/SOF1) AND progressive (SOF2) frames with 1 or 3
  components and sampling factors up to 2×2 (so 4:4:4, 4:2:2, 4:4:0,
  4:2:0 and grayscale all decode), restart (DRI/RSTn) intervals, 2^16
  Huffman LUT entropy decode over a precomputed sliding 16-bit window
  (baseline) or a per-bit reader (progressive spectral-selection +
  successive-approximation scans, T.81 G.2 — verified against
  ImageIO-produced multi-scan files in tests/vectors/ext_prog_*),
  vectorized dequantize + IDCT + upsample + color convert. Lossless /
  arithmetic coding and 12-bit precision raise ``ValueError`` — the
  validation engine reports those payloads as violations rather than
  mis-decoding them.

Determinism: everything is fixed-point-free numpy float64 with
``np.rint`` rounding — identical output across hosts, which the
engine's stored-phash consistency checks rely on. PIL is deliberately
NOT consulted even when present: two decoders (libjpeg's fancy chroma
upsampling vs our replication) would make stored phash values
environment-dependent.

Scale notes: these functions run inside Arrow-batched pandas UDFs on
executors. Entropy decode is a per-symbol Python loop over a 2^16 LUT
(the one inherently sequential part of JPEG); everything before and
after it is vectorized numpy over whole blocks. At validation-thumbnail
sizes the cost is a few ms/image — the engine parallelizes across
images, never within one.

Reference semantics: SMC Checker validates uploaded payloads and
reports undecodable/corrupt files as violations
(/root/reference/proj/core_checks.py digit/format gates); this codec is
the image-payload analogue demanded by BASELINE.json's north star
(decoded-pixel PSNR ≥ 40 dB for lossy formats).
"""

from __future__ import annotations

import struct

import numpy as np

from smcchecker_spark import native as _native

# ---------------------------------------------------------------------------
# Public-spec constants (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

# natural (row-major) order quantization tables
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)

# ZIGZAG[k] = natural index of the k-th zigzag-scan element
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K Huffman table definitions: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix — T.81's FDCT/IDCT scaling exactly
    (the 1/4·C_u·C_v normalization of the 2-D transform equals the
    orthonormal 1-D matrix applied on both sides)."""
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    d = np.cos((2 * n + 1) * k * np.pi / 16)
    d[0] *= np.sqrt(1 / 8)
    d[1:] *= np.sqrt(2 / 8)
    return d


_DCT = _dct_matrix()

# Decode-side IDCT runs in FIXED-POINT integer arithmetic so the native
# kernel (native/jpegrecon.c) and this numpy reference are bit-exact on
# every host — the same doctrine as the entropy-decode kernel: phash
# values must not depend on which path (or which libm/BLAS) decoded the
# image. Constants are round(_dct_matrix() * 2^18) frozen as literals
# (a test pins them against the cos() derivation); stage 1 keeps 6
# guard bits (shift 12 of 18), stage 2 descales the rest (shift 24).
# Error vs the exact real-valued IDCT is < 0.05 of a pixel step —
# comfortably inside IEEE-1180-class accuracy — and every intermediate
# fits int64 even for hostile streams (|coef| ≤ 32767 enforced by the
# scan decoder, qt ≤ 255 ⇒ stage-2 sums ≤ 2.2e15 « 2^63).
_IDCT_BITS = 18
_IDCT_PASS1_SHIFT = 12  # 2^6 scale kept between the passes
_IDCT_PASS2_SHIFT = 2 * _IDCT_BITS - _IDCT_PASS1_SHIFT
_IDCT_M = np.array(
    [
        (92682, 92682, 92682, 92682, 92682, 92682, 92682, 92682),
        (128553, 108982, 72820, 25571, -25571, -72820, -108982, -128553),
        (121095, 50159, -50159, -121095, -121095, -50159, 50159, 121095),
        (108982, -25571, -128553, -72820, 72820, 128553, 25571, -108982),
        (92682, -92682, -92682, 92682, 92682, -92682, -92682, 92682),
        (72820, -128553, 25571, 108982, -108982, -25571, 128553, -72820),
        (50159, -121095, 121095, -50159, -50159, 121095, -121095, 50159),
        (25571, -72820, 108982, -128553, 128553, -108982, 72820, -25571),
    ],
    dtype=np.int64,
)
_IDCT_MT = np.ascontiguousarray(_IDCT_M.T)

# JFIF YCbCr → RGB in 16.16 fixed point (round(c * 65536) of the
# Rec.601 inverse coefficients); same per-term round-half-up in both
# paths. Chroma products use int64: a hostile stream's unclipped plane
# samples can reach ~1.3e8, so 116130 * cr would wrap int32.
_FIX_CR_R = 91881  # 1.402
_FIX_CB_G = 22554  # 0.344136286
_FIX_CR_G = 46802  # 0.714136286
_FIX_CB_B = 116130  # 1.772


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling (public libjpeg convention): 1..100 →
    (luma, chroma) tables in natural order, entries clipped to 1..255
    (baseline requires 8-bit table entries)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 / q if q < 50 else 200 - 2 * q
    lum = np.clip(np.floor((QT_LUMA * scale + 50) / 100), 1, 255)
    chm = np.clip(np.floor((QT_CHROMA * scale + 50) / 100), 1, 255)
    return lum, chm


# ---------------------------------------------------------------------------
# Huffman code construction (canonical, T.81 Annex C)
# ---------------------------------------------------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) by canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_LUT_CACHE: dict[tuple, list[int]] = {}


def _build_lut(bits: tuple[int, ...], vals: tuple[int, ...], is_dc: bool):
    """2^16 COMBINED decode LUT: next-16-bits (MSB-aligned) → one packed
    int that resolves the Huffman code AND, whenever code+magnitude fit
    in the window (the overwhelmingly common case), the EXTENDed signed
    coefficient value — so the per-symbol loop pays ONE list index and
    one branch instead of two window reads plus EXTEND arithmetic.

    Entry layout (0 = invalid prefix / corrupt stream)::

        op = e >> 22
        op 1  combined:  advance = e & 31 (code+magnitude bits),
                         run = (e >> 5) & 15, value = ((e >> 9) & 8191) - 2048
        op 2  fallback (code+size don't fit 16 bits): code len = e & 31,
                         size s = (e >> 5) & 15, run = (e >> 9) & 15
        op 3  EOB,  op 4  ZRL: advance = e & 31

    Cached per table content — files reusing the Annex-K tables (ours,
    most encoders) build each LUT once per process."""
    key = (bits, vals, is_dc)
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    packed = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            if hi > (1 << 16):
                raise ValueError("corrupt JPEG: Huffman BITS overflow")
            run, s = (0, sym) if is_dc else (sym >> 4, sym & 15)
            if s > (11 if is_dc else 10):
                raise ValueError("corrupt JPEG: bad Huffman size symbol")
            if s == 0:
                if is_dc:  # zero DC diff: combined, value 0
                    packed[lo:hi] = (1 << 22) | (2048 << 9) | length
                elif sym == 0xF0:
                    packed[lo:hi] = (4 << 22) | length  # ZRL
                else:
                    # EOB (run 0) / EOBn (run 1..14, progressive AC
                    # scans: EOB-run of (1<<run)+extra-bits(run) blocks).
                    # The baseline scan loop ignores the run bits — a
                    # sequential scan referencing an EOBn symbol is
                    # spec-invalid and simply ends the block early.
                    packed[lo:hi] = (3 << 22) | (run << 5) | length
            elif length + s <= 16:
                idx = np.arange(lo, hi, dtype=np.int32)
                mag = (idx >> (16 - length - s)) & ((1 << s) - 1)
                val = np.where(mag >> (s - 1), mag, mag - (1 << s) + 1)
                packed[lo:hi] = (
                    (1 << 22) | ((val + 2048) << 9) | (run << 5) | (length + s)
                )
            else:
                packed[lo:hi] = (2 << 22) | (run << 9) | (s << 5) | length
            code += 1
            k += 1
        code <<= 1
    if k != len(vals):
        raise ValueError("corrupt JPEG: Huffman BITS/HUFFVAL mismatch")
    # both forms cached: the Python loop indexes the list (list indexing
    # beats np scalars), the native kernel reads the int32 array directly
    out = (packed.tolist(), packed)
    _LUT_CACHE[key] = out
    return out


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

# RGB -> YCbCr (Rec.601 full-range, JFIF)
_RGB2Y = np.array([0.299, 0.587, 0.114])
_RGB2CB = np.array([-0.168735892, -0.331264108, 0.5])
_RGB2CR = np.array([0.5, -0.418687589, -0.081312411])


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W multiples of 8 → (nb, 8, 8) in block-raster order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """(bh*bw, 8, 8) block-raster → (bh*8, bw*8)."""
    return (
        blocks.reshape(bh, bw, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(bh * 8, bw * 8)
    )


def _pack_bits(vals: np.ndarray, lens: np.ndarray) -> bytes:
    """Vectorized MSB-first bit packer: (values, bit lengths) → bytes,
    1-padded to a byte boundary (T.81 F.1.2.3), 0xFF bytes stuffed with
    0x00. Max symbol length here is 16 (Huffman) + 11 (magnitude) = 27
    bits, so uint32 values suffice."""
    if len(vals) == 0:
        return b""
    maxlen = int(lens.max())
    ar = np.arange(maxlen, dtype=np.int64)
    # bit j of symbol i (MSB first) = (val >> (len-1-j)) & 1, valid j < len
    shifts = lens[:, None].astype(np.int64) - 1 - ar[None, :]
    mask = shifts >= 0
    bits = (
        vals[:, None].astype(np.uint64)
        >> np.where(mask, shifts, 0).astype(np.uint64)
    ) & np.uint64(1)
    flat = bits[mask].astype(np.uint8)  # row-major → stream order
    pad = (-len(flat)) % 8
    if pad:
        flat = np.concatenate([flat, np.ones(pad, dtype=np.uint8)])
    raw = np.packbits(flat).tobytes()
    return raw.replace(b"\xff", b"\xff\x00")


def _magnitude(v: int) -> tuple[int, int]:
    """T.81 F.1.2.1: value → (size category, appended bits). Scalar
    reference for :func:`_size_mag` (property-tested parity); the
    encoder itself uses the vectorized form."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, v if v > 0 else v + (1 << s) - 1


_CODE_ARRAYS: list | None = None


def _code_arrays():
    """Annex-K Huffman codes as numpy lookup arrays, per class
    (0 = luma, 1 = chroma): (dc_code[12], dc_len[12], ac_code[256],
    ac_len[256]). Built once per process."""
    global _CODE_ARRAYS
    if _CODE_ARRAYS is None:
        out = []
        for dcb, dcv, acb, acv in (
            (DC_LUMA_BITS, DC_LUMA_VALS, AC_LUMA_BITS, AC_LUMA_VALS),
            (DC_CHROMA_BITS, DC_CHROMA_VALS, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ):
            dc = _build_codes(dcb, dcv)
            ac = _build_codes(acb, acv)
            dc_code = np.zeros(12, dtype=np.uint64)
            dc_len = np.zeros(12, dtype=np.int64)
            for s, (c, l) in dc.items():
                dc_code[s], dc_len[s] = c, l
            ac_code = np.zeros(256, dtype=np.uint64)
            ac_len = np.zeros(256, dtype=np.int64)
            for s, (c, l) in ac.items():
                ac_code[s], ac_len[s] = c, l
            out.append((dc_code, dc_len, ac_code, ac_len))
        _CODE_ARRAYS = out
    return _CODE_ARRAYS


_POW2_12 = (1 << np.arange(12, dtype=np.int64))


def _size_mag(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized T.81 F.1.2.1: values → (size category, appended
    magnitude bits). bit_length(|v|) = searchsorted over powers of two
    (exact — no float log)."""
    a = np.abs(v)
    s = np.searchsorted(_POW2_12, a, side="right").astype(np.int64)
    mag = np.where(v >= 0, v, v + (1 << s) - 1).astype(np.int64)
    return s, mag


def _entropy_tokens(
    zz_per_comp: list[np.ndarray],
    grids: list[tuple[int, int]],
    sampling: list[tuple[int, int]],
    classes: list[int],
    mcux: int,
    mcuy: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Whole-image entropy-token stream as (values, bit lengths) arrays,
    fully vectorized — no per-coefficient Python (the loop form was ~75%
    of encode time). Stream order is reconstructed with one lexsort:
    every token carries (scan-slot of its block, zigzag position,
    ZRL-before-symbol sub-key). DC diffs, magnitude categories, AC
    run-lengths (incl. ZRL expansion via np.repeat) and EOB flags are
    all array expressions."""
    slots_per_mcu = sum(hi * vi for hi, vi in sampling)
    Zs, slots, clss, cids = [], [], [], []
    offset = 0
    for c, (zz, (bh, bw), (hi, vi)) in enumerate(
        zip(zz_per_comp, grids, sampling)
    ):
        byg, bxg = np.divmod(np.arange(bh * bw, dtype=np.int64), bw)
        mcu_id = (byg // vi) * mcux + (bxg // hi)
        ordinal = offset + (byg % vi) * hi + (bxg % hi)
        slots.append(mcu_id * slots_per_mcu + ordinal)
        Zs.append(zz)
        clss.append(np.full(bh * bw, classes[c], dtype=np.int64))
        cids.append(np.full(bh * bw, c, dtype=np.int64))
        offset += hi * vi
    Z = np.concatenate(Zs)
    order = np.argsort(np.concatenate(slots), kind="stable")
    Z = Z[order]
    cls = np.concatenate(clss)[order]
    cid = np.concatenate(cids)[order]
    N = Z.shape[0]
    tabs = _code_arrays()

    # DC: per-component differential in scan order
    dc = Z[:, 0]
    diff = np.empty_like(dc)
    for c in range(len(zz_per_comp)):
        m = cid == c
        diff[m] = np.diff(dc[m], prepend=0)
    s_dc, mag_dc = _size_mag(diff)
    dcode = np.where(cls == 0, tabs[0][0][s_dc], tabs[1][0][s_dc])
    dlen = np.where(cls == 0, tabs[0][1][s_dc], tabs[1][1][s_dc])
    dc_vals = (dcode << s_dc.astype(np.uint64)) | mag_dc.astype(np.uint64)
    dc_lens = dlen + s_dc

    # AC: run-lengths from nonzero positions (row-major nonzero ⇒ per
    # block in zigzag order)
    AC = Z[:, 1:]
    nzb, nzk = np.nonzero(AC)
    if len(nzb):
        v = AC[nzb, nzk]
        prev = np.concatenate([[np.int64(-1)], nzk[:-1]])
        first = np.concatenate([[True], nzb[1:] != nzb[:-1]])
        prev[first] = -1
        run = nzk - prev - 1
        zrl_n = run >> 4
        s_ac, mag_ac = _size_mag(v)
        sym = ((run & 15) << 4) | s_ac
        ac_cls = cls[nzb]
        accode = np.where(ac_cls == 0, tabs[0][2][sym], tabs[1][2][sym])
        aclen = np.where(ac_cls == 0, tabs[0][3][sym], tabs[1][3][sym])
        ac_vals = (accode << s_ac.astype(np.uint64)) | mag_ac.astype(
            np.uint64
        )
        ac_lens = aclen + s_ac
        zrl_rows = np.repeat(nzb, zrl_n)
        zrl_keys = np.repeat(nzk, zrl_n)
        zrl_cls = cls[zrl_rows]
        zrl_vals = np.where(
            zrl_cls == 0, tabs[0][2][0xF0], tabs[1][2][0xF0]
        ).astype(np.uint64)
        zrl_lens = np.where(zrl_cls == 0, tabs[0][3][0xF0], tabs[1][3][0xF0])
        last_k = np.full(N, -1, dtype=np.int64)
        last_k[nzb] = nzk  # row-major ⇒ last write per block is its max
    else:
        nzb = nzk = ac_vals = ac_lens = np.empty(0, dtype=np.int64)
        zrl_rows = zrl_keys = zrl_vals = zrl_lens = np.empty(
            0, dtype=np.int64
        )
        last_k = np.full(N, -1, dtype=np.int64)

    eob_rows = np.nonzero(last_k < 62)[0]
    eob_cls = cls[eob_rows]
    eob_vals = np.where(eob_cls == 0, tabs[0][2][0], tabs[1][2][0]).astype(
        np.uint64
    )
    eob_lens = np.where(eob_cls == 0, tabs[0][3][0], tabs[1][3][0])

    rows = np.concatenate(
        [np.arange(N, dtype=np.int64), zrl_rows, nzb, eob_rows]
    )
    keys = np.concatenate(
        [
            np.full(N, -1, dtype=np.int64),
            zrl_keys,
            nzk,
            np.full(len(eob_rows), 63, dtype=np.int64),
        ]
    )
    subs = np.concatenate(
        [
            np.ones(N, dtype=np.int64),
            np.zeros(len(zrl_rows), dtype=np.int64),
            np.ones(len(nzb), dtype=np.int64),
            np.ones(len(eob_rows), dtype=np.int64),
        ]
    )
    vals = np.concatenate(
        [dc_vals, zrl_vals.astype(np.uint64), ac_vals.astype(np.uint64),
         eob_vals]
    )
    lens = np.concatenate([dc_lens, zrl_lens, ac_lens, eob_lens])
    o = np.lexsort((subs, keys, rows))
    return vals[o], lens[o]


def encode_jpeg(
    arr: np.ndarray, quality: int = 95, subsampling: str = "444"
) -> bytes:
    """8-bit RGB HxWx3 array → baseline JFIF JPEG bytes.

    ``subsampling``: "444" (default — every component full resolution;
    highest PSNR, what the validation fixtures want) or "420" (2×2
    box-mean chroma — the common web layout; exercises the decoder's
    generic MCU path)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected HxWx3 uint8, got {arr.shape}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("JPEG has zero-pixel dimensions")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    hv = (2, 2) if subsampling == "420" else (1, 1)
    hmax, vmax = hv

    rgb = arr.astype(np.float64)
    y = rgb @ _RGB2Y
    cb = rgb @ _RGB2CB + 128.0
    cr = rgb @ _RGB2CR + 128.0
    if subsampling == "420":
        # 2x2 box mean; pad odd dims by edge replication first
        ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
        cb = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
        cr = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
        cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    lum_qt, chm_qt = quality_tables(quality)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    comps = []  # (plane, (hi, vi), qtable natural)
    comps.append((y, (hmax, vmax), lum_qt))
    comps.append((cb, (1, 1), chm_qt))
    comps.append((cr, (1, 1), chm_qt))

    zz_per_comp = []
    grid_per_comp = []  # (block rows, block cols)
    for plane, (hi, vi), qt in comps:
        bw, bh = mcux * hi, mcuy * vi  # blocks across / down
        padded = np.pad(
            plane,
            ((0, bh * 8 - plane.shape[0]), (0, bw * 8 - plane.shape[1])),
            mode="edge",
        )
        blocks = _to_blocks(padded) - 128.0
        coef = _DCT @ blocks @ _DCT.T
        q = np.rint(coef / qt.reshape(8, 8)).astype(np.int64)
        zz_per_comp.append(q.reshape(-1, 64)[:, ZIGZAG])
        grid_per_comp.append((bh, bw))

    # interleaved MCU scan (T.81 A.2.3), tokenized fully vectorized
    tok_vals, tok_lens = _entropy_tokens(
        zz_per_comp,
        grid_per_comp,
        [hv_c for _, hv_c, _ in comps],
        [0, 1, 1],
        mcux,
        mcuy,
    )
    scan = _pack_bits(tok_vals, tok_lens)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    app0 = seg(
        0xFFE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    )
    dqt = seg(
        0xFFDB,
        b"\x00"
        + bytes(lum_qt.astype(np.uint8)[ZIGZAG])
        + b"\x01"
        + bytes(chm_qt.astype(np.uint8)[ZIGZAG]),
    )
    sof_comps = b""
    for cid, (_, (hi, vi), _) in enumerate(comps, start=1):
        sof_comps += struct.pack(">BBB", cid, (hi << 4) | vi, 0 if cid == 1 else 1)
    sof0 = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3) + sof_comps)

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(
            0xFFC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        )

    dhts = (
        dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    )
    sos = seg(
        0xFFDA,
        b"\x03"
        + struct.pack(">BB", 1, 0x00)
        + struct.pack(">BB", 2, 0x11)
        + struct.pack(">BB", 3, 0x11)
        + b"\x00\x3f\x00",
    )
    return (
        b"\xff\xd8" + app0 + dqt + sof0 + dhts + sos + scan + b"\xff\xd9"
    )


def _dc_scan_tokens(
    zz_per_comp: list[np.ndarray],
    grids: list[tuple[int, int]],
    sampling: list[tuple[int, int]],
    classes: list[int],
    mcux: int,
) -> tuple[np.ndarray, np.ndarray]:
    """DC-only token stream for a progressive DC first scan (Ss=0,
    Se=0, Ah=Al=0): blocks interleaved per MCU via the same slot math
    as ``_entropy_tokens`` (so any sampling layout works), each
    component's differential sequence following its own scan order."""
    tabs = _code_arrays()
    slots_per_mcu = sum(hi * vi for hi, vi in sampling)
    vals_all, lens_all, slots_all = [], [], []
    offset = 0
    for c, (zz, (bh, bw), (hi, vi)) in enumerate(
        zip(zz_per_comp, grids, sampling)
    ):
        byg, bxg = np.divmod(np.arange(bh * bw, dtype=np.int64), bw)
        mcu_id = (byg // vi) * mcux + (bxg // hi)
        ordinal = offset + (byg % vi) * hi + (bxg % hi)
        slot = mcu_id * slots_per_mcu + ordinal
        order = np.argsort(slot, kind="stable")
        diff = np.diff(zz[:, 0][order], prepend=0)
        s, mag = _size_mag(diff)
        tab = tabs[classes[c]]
        vals_all.append(
            (tab[0][s].astype(np.uint64) << s.astype(np.uint64))
            | mag.astype(np.uint64)
        )
        lens_all.append(tab[1][s] + s)
        slots_all.append(slot[order])
        offset += hi * vi
    slots = np.concatenate(slots_all)
    o = np.argsort(slots, kind="stable")
    return np.concatenate(vals_all)[o], np.concatenate(lens_all)[o]


def _ac_scan_tokens(
    zz: np.ndarray, cls: int
) -> tuple[np.ndarray, np.ndarray]:
    """AC-only token stream for one component's progressive spectral
    scan over the full 1..63 band (Ah=Al=0): identical run-length /
    ZRL / EOB coding as the baseline AC part (an all-zero tail is a
    plain EOB — an EOB-run of one block), blocks in raster order."""
    tabs = _code_arrays()
    tab = tabs[cls]
    N = zz.shape[0]
    AC = zz[:, 1:]
    nzb, nzk = np.nonzero(AC)
    if len(nzb):
        v = AC[nzb, nzk]
        prev = np.concatenate([[np.int64(-1)], nzk[:-1]])
        first = np.concatenate([[True], nzb[1:] != nzb[:-1]])
        prev[first] = -1
        run = nzk - prev - 1
        zrl_n = run >> 4
        s_ac, mag_ac = _size_mag(v)
        sym = ((run & 15) << 4) | s_ac
        ac_vals = (tab[2][sym].astype(np.uint64) << s_ac.astype(np.uint64)) \
            | mag_ac.astype(np.uint64)
        ac_lens = tab[3][sym] + s_ac
        zrl_rows = np.repeat(nzb, zrl_n)
        zrl_keys = np.repeat(nzk, zrl_n)
        zrl_vals = np.full(len(zrl_rows), tab[2][0xF0], dtype=np.uint64)
        zrl_lens = np.full(len(zrl_rows), tab[3][0xF0], dtype=np.int64)
        last_k = np.full(N, -1, dtype=np.int64)
        last_k[nzb] = nzk
    else:
        nzb = nzk = np.empty(0, dtype=np.int64)
        ac_vals = np.empty(0, dtype=np.uint64)
        ac_lens = zrl_rows = zrl_keys = np.empty(0, dtype=np.int64)
        zrl_vals = np.empty(0, dtype=np.uint64)
        zrl_lens = np.empty(0, dtype=np.int64)
        last_k = np.full(N, -1, dtype=np.int64)
    eob_rows = np.nonzero(last_k < 62)[0]
    eob_vals = np.full(len(eob_rows), tab[2][0], dtype=np.uint64)
    eob_lens = np.full(len(eob_rows), tab[3][0], dtype=np.int64)
    rows = np.concatenate([zrl_rows, nzb, eob_rows])
    keys = np.concatenate(
        [zrl_keys, nzk, np.full(len(eob_rows), 63, dtype=np.int64)]
    )
    subs = np.concatenate(
        [
            np.zeros(len(zrl_rows), dtype=np.int64),
            np.ones(len(nzb), dtype=np.int64),
            np.ones(len(eob_rows), dtype=np.int64),
        ]
    )
    vals = np.concatenate([zrl_vals, ac_vals, eob_vals])
    lens = np.concatenate([zrl_lens, ac_lens, eob_lens])
    o = np.lexsort((subs, keys, rows))
    return vals[o], lens[o]


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 95, subsampling: str = "444"
) -> bytes:
    """8-bit RGB HxWx3 → PROGRESSIVE (SOF2) JFIF JPEG using the
    simplest spec-valid spectral-selection script: one interleaved DC
    first scan (Ss=0, Se=0) then one full-band AC scan per component
    (Ss=1, Se=63, non-interleaved over the component's own T.81 A.2
    grid), no successive approximation. Same DCT / Annex-K
    quantization as the baseline encoder, so decoded pixels equal the
    baseline encoder's (same subsampling) bit-for-bit — the
    progression only reorders the entropy stream (asserted in tests).
    External decoders (ImageIO) open the output; see
    tests/test_jpeg_vectors.py."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected HxWx3 uint8, got {arr.shape}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("JPEG has zero-pixel dimensions")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    hmax, vmax = (2, 2) if subsampling == "420" else (1, 1)
    rgb = arr.astype(np.float64)
    y = rgb @ _RGB2Y
    cb = rgb @ _RGB2CB + 128.0
    cr = rgb @ _RGB2CR + 128.0
    if subsampling == "420":
        ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
        cb = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
        cr = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
        cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    lum_qt, chm_qt = quality_tables(quality)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comps = [
        (y, (hmax, vmax), lum_qt),
        (cb, (1, 1), chm_qt),
        (cr, (1, 1), chm_qt),
    ]
    zz_per_comp, grids = [], []
    for plane, (hi, vi), qt in comps:
        gw, gh = mcux * hi, mcuy * vi
        padded = np.pad(
            plane,
            ((0, gh * 8 - plane.shape[0]), (0, gw * 8 - plane.shape[1])),
            mode="edge",
        )
        blocks = _to_blocks(padded) - 128.0
        q = np.rint((_DCT @ blocks @ _DCT.T) / qt.reshape(8, 8)).astype(
            np.int64
        )
        zz_per_comp.append(q.reshape(-1, 64)[:, ZIGZAG])
        grids.append((gh, gw))

    classes = [0, 1, 1]
    sampling = [(hmax, vmax), (1, 1), (1, 1)]
    scans = [
        _pack_bits(
            *_dc_scan_tokens(zz_per_comp, grids, sampling, classes, mcux)
        )
    ]
    for c in range(3):
        # non-interleaved AC scan: the component's OWN ceil(dims/8)
        # grid in raster order (pad-only MCU blocks are not coded)
        hi, vi = sampling[c]
        xi = -(-w * hi // hmax)
        yi = -(-h * vi // vmax)
        gw_s, gh_s = -(-xi // 8), -(-yi // 8)
        bw = grids[c][1]
        sel = (
            np.arange(gh_s, dtype=np.int64)[:, None] * bw
            + np.arange(gw_s, dtype=np.int64)[None, :]
        ).reshape(-1)
        scans.append(
            _pack_bits(
                *_ac_scan_tokens(zz_per_comp[c][sel], classes[c])
            )
        )

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    app0 = seg(
        0xFFE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    )
    dqt = seg(
        0xFFDB,
        b"\x00"
        + bytes(lum_qt.astype(np.uint8)[ZIGZAG])
        + b"\x01"
        + bytes(chm_qt.astype(np.uint8)[ZIGZAG]),
    )
    sof_comps = b""
    for cid, (hi, vi) in zip((1, 2, 3), sampling):
        sof_comps += struct.pack(
            ">BBB", cid, (hi << 4) | vi, 0 if cid == 1 else 1
        )
    sof2 = seg(0xFFC2, struct.pack(">BHHB", 8, h, w, 3) + sof_comps)

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xFFC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    dhts = (
        dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    )
    sos_dc = seg(
        0xFFDA,
        b"\x03"
        + struct.pack(">BB", 1, 0x00)
        + struct.pack(">BB", 2, 0x11)
        + struct.pack(">BB", 3, 0x11)
        + b"\x00\x00\x00",
    )
    out = b"\xff\xd8" + app0 + dqt + sof2 + dhts + sos_dc + scans[0]
    for c in range(3):
        ta = 0 if c == 0 else 1
        out += seg(
            0xFFDA,
            b"\x01" + struct.pack(">BB", c + 1, ta) + b"\x01\x3f\x00",
        ) + scans[c + 1]
    return out + b"\xff\xd9"


def encode_jpeg_gray(arr: np.ndarray, quality: int = 95) -> bytes:
    """8-bit grayscale HxW array → single-component baseline JFIF JPEG.
    Web corpora carry grayscale JPEGs; the engine decodes them through
    the same dispatch (replicated to HxWx3 — the table schema is RGB)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError(f"expected HxW uint8, got {arr.shape}")
    h, w = arr.shape
    if h == 0 or w == 0:
        raise ValueError("JPEG has zero-pixel dimensions")
    lum_qt, _ = quality_tables(quality)
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(
        arr.astype(np.float64), ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge"
    )
    blocks = _to_blocks(padded) - 128.0
    q = np.rint((_DCT @ blocks @ _DCT.T) / lum_qt.reshape(8, 8)).astype(np.int64)
    zz = q.reshape(-1, 64)[:, ZIGZAG]

    # non-interleaved 1-component scan: MCU = one block in raster order,
    # which _entropy_tokens reproduces with 1x1 sampling over a bw x bh
    # MCU grid
    tok_vals, tok_lens = _entropy_tokens(
        [zz], [(bh, bw)], [(1, 1)], [0], bw, bh
    )
    scan = _pack_bits(tok_vals, tok_lens)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    app0 = seg(
        0xFFE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    )
    dqt = seg(0xFFDB, b"\x00" + bytes(lum_qt.astype(np.uint8)[ZIGZAG]))
    sof0 = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dhts = seg(
        0xFFC4, b"\x00" + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
    ) + seg(0xFFC4, b"\x10" + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    sos = seg(0xFFDA, b"\x01" + bytes([1, 0x00]) + b"\x00\x3f\x00")
    return b"\xff\xd8" + app0 + dqt + sof0 + dhts + sos + scan + b"\xff\xd9"


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


# entropy-data window slab: windows are materialized for at most this many
# bytes at a time (~8x36 B of Python ints per byte), so a multi-megabyte
# scan costs a bounded ~40 MB of transient window memory per task instead
# of hundreds of MB — the rest of the scan is windowed on demand.
_WINDOW_CHUNK_BYTES = 1 << 17

# T.81 worst case per 8x8 data unit: 64 coefficients, each ≤16 code bits
# + ≤11 magnitude bits → < 216 bytes. A segment longer than its block
# budget cannot be a valid scan — reject before windowing (hostile
# tiny-dims JPEGs with huge scans would otherwise cost GBs of windows).
_MAX_BYTES_PER_BLOCK = 216


def _window16(seg: bytes, b0: int, b1: int) -> list[int]:
    """Sliding MSB-first 16-bit window at every bit offset in byte range
    [b0, b1) of ``seg`` (16-bit lookahead reads seg[b1:b1+2]; zero-padded
    past the segment end) — 16 vectorized shift-ors, then one tolist()
    so the per-symbol loop indexes Python ints."""
    chunk = seg[b0 : b1 + 2]
    bits = np.unpackbits(np.frombuffer(chunk, dtype=np.uint8))
    nb = 8 * (b1 - b0)
    b = np.concatenate([bits, np.zeros(16, dtype=np.uint8)]).astype(np.uint32)
    w = np.zeros(nb, dtype=np.uint32)
    for k in range(16):
        w |= b[k : k + nb] << (15 - k)
    return w.tolist()


def _extend(mag: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: s appended bits → signed value."""
    return mag if mag >= (1 << (s - 1)) else mag - (1 << s) + 1


# block-count threshold where coefficient storage switches from fast
# list-of-lists (~28 B/coeff) to a compact int32 matrix (4 B/coeff);
# 65536 blocks ≈ a 2048x2048 4:4:4 frame per component
_COMPACT_COEF_BLOCKS = 65536


class _Frame:
    __slots__ = ("h", "w", "comps", "progressive")


# natural-order quant tables cached by DQT payload bytes: a corpus
# reuses a handful of quality-scaled tables, so the unzigzag scatter is
# paid once per distinct table per process (the arrays are shared and
# never mutated; the cap guards hostile one-table-per-image corpora)
_DQT_CACHE: dict[bytes, np.ndarray] = {}


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF JPEG bytes → HxWx3 uint8 (grayscale is replicated
    to 3 channels — the engine's table schema is RGB). Handles
    interleaved and non-interleaved (single-component, T.81 A.2) scans,
    including sequential multi-scan baseline files. Raises
    ``ValueError`` on anything corrupt or non-baseline."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    n = len(data)
    qts: dict[int, np.ndarray] = {}
    luts: dict[tuple[int, int], list[int]] = {}
    frame: _Frame | None = None
    restart = 0
    covered: set[int] = set()
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before the
        # marker code — skip them rather than misreading 0xFF as a marker
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # RSTn/TEM: no payload
            continue
        if pos + 2 > n:
            raise ValueError("truncated JPEG segment")
        seglen = int.from_bytes(data[pos : pos + 2], "big")
        payload = data[pos + 2 : pos + seglen]
        if len(payload) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        pos += seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables not baseline")
                raw = payload[p + 1 : p + 65]
                if len(raw) != 64:
                    raise ValueError("corrupt JPEG: short DQT")
                nat = _DQT_CACHE.get(raw)
                if nat is None:
                    if len(_DQT_CACHE) >= 1024:
                        _DQT_CACHE.clear()
                    nat = np.zeros(64, dtype=np.int32)
                    nat[ZIGZAG] = np.frombuffer(raw, dtype=np.uint8)
                    _DQT_CACHE[raw] = nat
                qts[tq] = nat
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 15
                bits = tuple(payload[p + 1 : p + 17])
                if len(bits) != 16:
                    raise ValueError("corrupt JPEG: short DHT")
                nv = sum(bits)
                vals = tuple(payload[p + 17 : p + 17 + nv])
                if len(vals) != nv:
                    raise ValueError("corrupt JPEG: short DHT")
                if tc > 1:
                    raise ValueError("corrupt JPEG: bad Huffman table class")
                luts[(tc, th)] = _build_lut(bits, vals, is_dc=(tc == 0))
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext seq / progressive
            if frame is not None:
                raise ValueError("corrupt JPEG: multiple SOF markers")
            prec, fh, fw, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            if nc not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {nc}")
            if fh == 0 or fw == 0:
                raise ValueError("JPEG has zero-pixel dimensions")
            if fh * fw * 3 > (1 << 30):
                raise ValueError("JPEG dimensions exceed the decoded-size cap")
            frame = _Frame()
            frame.h, frame.w = fh, fw
            frame.progressive = marker == 0xC2
            frame.comps = []
            for c in range(nc):
                cid, hvs, tq = payload[6 + 3 * c : 9 + 3 * c]
                hi, vi = hvs >> 4, hvs & 15
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise ValueError(f"unsupported sampling {hi}x{vi}")
                frame.comps.append({"id": cid, "hi": hi, "vi": vi, "tq": tq})
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "lossless/arithmetic/hierarchical JPEG not supported"
            )
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(payload[:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = payload[0]
            if not (1 <= ns <= len(frame.comps)):
                raise ValueError("corrupt JPEG: bad scan component count")
            scan_list = []  # (cid, dc table id, ac table id) in SOS order
            for c in range(ns):
                cid, tt = payload[1 + 2 * c : 3 + 2 * c]
                scan_list.append((cid, tt >> 4, tt & 15))
            if len(payload) < 4 + 2 * ns:
                raise ValueError("corrupt JPEG: short SOS header")
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ahal = payload[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            # entropy data runs to the next non-RST/non-stuffed marker.
            # Unstuffing hops between 0xFF positions with bytes.find and
            # slice-copies the (overwhelmingly non-FF) runs in between —
            # the per-byte Python loop this replaces was ~20% of decode.
            segs: list[bytes] = []
            cur = bytearray()
            p = pos
            while p < n:
                f = data.find(b"\xff", p)
                if f == -1:
                    cur += data[p:]
                    p = n
                    break
                cur += data[p:f]
                b1 = data[f + 1] if f + 1 < n else 0xD9
                if b1 == 0x00:
                    cur.append(0xFF)
                    p = f + 2
                elif 0xD0 <= b1 <= 0xD7:
                    segs.append(bytes(cur))
                    cur = bytearray()
                    p = f + 2
                else:
                    p = f
                    break
            segs.append(bytes(cur))
            pos = p
            if frame.progressive:
                _decode_prog_scan_into(
                    frame, luts, scan_list, segs, restart, covered,
                    ss, se, ah, al,
                )
            else:
                _decode_scan_into(
                    frame, luts, scan_list, segs, restart, covered
                )
        # APPn/COM/other: skipped
    if frame is None or not covered:
        raise ValueError("corrupt JPEG: no decoded scan")
    if covered != {c["id"] for c in frame.comps}:
        raise ValueError("corrupt JPEG: component never scanned")
    return _reconstruct(frame, qts)


def _ensure_coef(
    frame, mcux: int, mcuy: int, force_compact: bool = False
) -> None:
    """Allocate per-component coefficient stores once per frame (shared
    across the scans of a multi-scan file).

    Storage: list-of-lists is the fastest thing the PYTHON symbol loop
    can write into, but costs ~28 bytes/int — a hostile header claiming
    max-cap dims would transiently need >20 GB on an executor. Above a
    block threshold, store rows in a compact int32 matrix (4 B/coeff,
    ~1.3x the decoded-pixel bytes); thumbnails keep the fast path. The
    native kernel writes int32 directly, so it forces compact stores at
    every size."""
    comps = frame.comps
    if "coef" in comps[0]:
        return
    compact = force_compact or (
        sum(mcux * c["hi"] * mcuy * c["vi"] for c in comps)
        > _COMPACT_COEF_BLOCKS
    )
    for c in comps:
        c["bw"] = mcux * c["hi"]
        c["bh"] = mcuy * c["vi"]
        nb = c["bw"] * c["bh"]
        if compact:
            c["coef"] = np.zeros((nb, 64), dtype=np.int32)
            # raw pointer recorded once: the scan and reconstruct
            # kernels both reuse it (ndarray.ctypes is ~1 µs a pop)
            c["coef_ptr"] = c["coef"].ctypes.data
        else:
            c["coef"] = [[0] * 64 for _ in range(nb)]


def _decode_scan_into(frame, luts, scan_list, segs, restart, covered):
    """Decode one scan's entropy data into the frame's coefficient
    stores. Interleaved (multi-component) scans walk the full-frame MCU
    grid; a single-component scan is non-interleaved per T.81 A.2 — one
    data unit per MCU over the component's own ceil(x_i/8) x ceil(y_i/8)
    block grid."""
    h, w = frame.h, frame.w
    comps = frame.comps
    byid = {c["id"]: c for c in comps}
    hmax = max(c["hi"] for c in comps)
    vmax = max(c["vi"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    native = _native.jpegscan()
    _ensure_coef(frame, mcux, mcuy, force_compact=native is not None)
    # a python-path frame of a multi-scan file may hold list stores;
    # the native kernel needs int32 matrices — fall back in that case
    if native is not None and not isinstance(
        comps[0]["coef"], np.ndarray
    ):
        native = None
    interleaved = len(scan_list) > 1

    # per-component template: block index = my*rowstep + mx*colstep + off
    tmpl = []
    scan_mcux, scan_total = mcux, mcux * mcuy
    for cid, td, ta in scan_list:
        c = byid.get(cid)
        if c is None:
            raise ValueError("corrupt JPEG: scan component not in frame")
        if cid in covered:
            raise ValueError("corrupt JPEG: component scanned twice")
        covered.add(cid)
        dc = luts.get((0, td))
        ac = luts.get((1, ta))
        if dc is None or ac is None:
            raise ValueError("corrupt JPEG: missing Huffman table")
        bw = c["bw"]
        if interleaved:
            hi_, vi_ = c["hi"], c["vi"]
            offs = [by * bw + bx for by in range(vi_) for bx in range(hi_)]
            tmpl.append((dc[0], ac[0], c["coef"], vi_ * bw, hi_, offs,
                         dc[1], ac[1], c.get("coef_ptr")))
        else:
            xi = -(-w * c["hi"] // hmax)  # T.81 A.1.1 component dims
            yi = -(-h * c["vi"] // vmax)
            scan_mcux = -(-xi // 8)
            scan_total = scan_mcux * (-(-yi // 8))
            tmpl.append((dc[0], ac[0], c["coef"], bw, 1, [0],
                         dc[1], ac[1], c.get("coef_ptr")))

    blocks_per_mcu = sum(len(t[5]) for t in tmpl)
    per_seg = restart if restart else scan_total
    if native is not None:
        call = _native_call_args(native, tmpl)
    mcu = 0
    for seg_bytes in segs:
        if mcu >= scan_total:
            break
        seg_end = min(mcu + per_seg, scan_total)
        # reject segments beyond the worst-case entropy budget BEFORE
        # windowing: bounded window memory is only meaningful if a
        # hostile scan can't make us walk gigabytes of it
        if len(seg_bytes) > (seg_end - mcu) * blocks_per_mcu * \
                _MAX_BYTES_PER_BLOCK + 64:
            raise ValueError(
                "corrupt JPEG: entropy segment exceeds worst-case budget"
            )
        if native is not None:
            rc = call(seg_bytes, mcu, seg_end, scan_mcux)
            if rc < 0:
                raise ValueError(_NATIVE_ERRORS.get(
                    rc, f"corrupt JPEG: native decode error {rc}"
                ))
        else:
            _decode_segment_py(seg_bytes, mcu, seg_end, scan_mcux, tmpl)
        mcu = seg_end
    if mcu < scan_total:
        raise ValueError("corrupt JPEG: missing MCUs")


class _SegReader:
    """MSB-first bit reader over one unstuffed entropy segment for the
    progressive path. The accumulator never holds more than ~24 bits
    (Python ints, no windows) — progressive scans are decoded per-bit
    anyway, so the baseline path's 16-bit window slabs buy nothing here.
    Reads past the segment end see zero bits (byte-alignment padding);
    more than 64 phantom bits means the stream truly underran."""

    __slots__ = ("data", "n", "pos", "acc", "cnt", "pad")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 0
        self.acc = 0
        self.cnt = 0
        self.pad = 0

    def _fill(self, k: int) -> None:
        while self.cnt < k:
            if self.pos < self.n:
                self.acc = (self.acc << 8) | self.data[self.pos]
                self.pos += 1
            else:
                self.acc <<= 8
                self.pad += 8
                if self.pad > 64:
                    raise ValueError("corrupt JPEG: scan underrun")
            self.cnt += 8

    def peek16(self) -> int:
        if self.cnt < 16:
            self._fill(16)
        return (self.acc >> (self.cnt - 16)) & 0xFFFF

    def skip(self, k: int) -> None:  # only after peek16, so cnt >= 16 >= k
        self.cnt -= k
        self.acc &= (1 << self.cnt) - 1

    def receive(self, k: int) -> int:
        if k == 0:
            return 0
        if self.cnt < k:
            self._fill(k)
        self.cnt -= k
        v = (self.acc >> self.cnt) & ((1 << k) - 1)
        self.acc &= (1 << self.cnt) - 1
        return v


def _decode_prog_scan_into(
    frame, luts, scan_list, segs, restart, covered, ss, se, ah, al
):
    """Decode one PROGRESSIVE scan (T.81 G.2) into the shared
    coefficient stores. Four scan kinds: DC first (Ss=0, Ah=0 —
    Huffman-coded high-order DC bits, interleaved allowed), DC
    refinement (Ah>0 — one appended bit per block), AC first (Ss>0,
    Ah=0 — spectral band with EOB-run coding, single component only),
    AC refinement (correction bits, libjpeg jdphuff-equivalent
    algorithm). Always the Python path: progressive inputs are decoded
    for validation parity, not bulk throughput (the native kernels
    cover the baseline hot path); reconstruction still goes native."""
    h, w = frame.h, frame.w
    comps = frame.comps
    byid = {c["id"]: c for c in comps}
    hmax = max(c["hi"] for c in comps)
    vmax = max(c["vi"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    _ensure_coef(
        frame, mcux, mcuy,
        force_compact=(
            _native.jpegprog() is not None
            or _native.jpegrecon() is not None
        ),
    )
    if ss > se or se > 63 or al > 13 or (ah and ah != al + 1):
        raise ValueError("corrupt JPEG: bad progressive scan header")
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("corrupt JPEG: bad progressive scan header")
    if not is_dc and len(scan_list) > 1:
        raise ValueError("corrupt JPEG: interleaved progressive AC scan")

    interleaved = len(scan_list) > 1
    tmpl = []  # (lut_list, lut_arr, coef, rowstep, colstep, offs, ptr)
    scan_mcux, scan_total = mcux, mcux * mcuy
    for cid, td, ta in scan_list:
        c = byid.get(cid)
        if c is None:
            raise ValueError("corrupt JPEG: scan component not in frame")
        lut = lut_arr = None
        if is_dc:
            covered.add(cid)
            if ah == 0:  # DC refinement needs no Huffman table
                pair = luts.get((0, td))
                if pair is None:
                    raise ValueError("corrupt JPEG: missing Huffman table")
                lut, lut_arr = pair
        else:
            pair = luts.get((1, ta))
            if pair is None:
                raise ValueError("corrupt JPEG: missing Huffman table")
            lut, lut_arr = pair
        bw = c["bw"]
        if interleaved:
            hi_, vi_ = c["hi"], c["vi"]
            offs = [by * bw + bx for by in range(vi_) for bx in range(hi_)]
            tmpl.append((lut, lut_arr, c["coef"], vi_ * bw, hi_, offs,
                         c.get("coef_ptr")))
        else:
            xi = -(-w * c["hi"] // hmax)  # T.81 A.1.1 component dims
            yi = -(-h * c["vi"] // vmax)
            scan_mcux = -(-xi // 8)
            scan_total = scan_mcux * (-(-yi // 8))
            tmpl.append((lut, lut_arr, c["coef"], bw, 1, [0],
                         c.get("coef_ptr")))

    native = _native.jpegprog()
    if native is not None and not isinstance(comps[0]["coef"], np.ndarray):
        native = None
    if native is not None:
        call = _prog_native_call_args(native, tmpl, ss, se, ah, al, is_dc)

    zz = ZIGZAG.tolist()
    blocks_per_mcu = sum(len(t[5]) for t in tmpl)
    per_seg = restart if restart else scan_total
    p1, m1 = 1 << al, -1 << al
    mcu = 0
    for seg_bytes in segs:
        if mcu >= scan_total:
            break
        seg_end = min(mcu + per_seg, scan_total)
        if len(seg_bytes) > (seg_end - mcu) * blocks_per_mcu * \
                _MAX_BYTES_PER_BLOCK + 64:
            raise ValueError(
                "corrupt JPEG: entropy segment exceeds worst-case budget"
            )
        if native is not None:
            rc = call(seg_bytes, mcu, seg_end, scan_mcux)
            if rc < 0:
                raise ValueError(_NATIVE_ERRORS.get(
                    rc, f"corrupt JPEG: native decode error {rc}"
                ))
            mcu = seg_end
            continue
        rd = _SegReader(seg_bytes)
        preds = [0] * len(tmpl)  # DC predictors reset at restart
        eobrun = 0  # EOB run resets at restart
        while mcu < seg_end:
            my, mx = divmod(mcu, scan_mcux)
            for ti, (lut, _la, coef, rowstep, colstep, offs, _cp) \
                    in enumerate(tmpl):
                base = my * rowstep + mx * colstep
                for off in offs:
                    blk = coef[base + off]
                    if is_dc:
                        if ah == 0:  # DC first scan
                            e = lut[rd.peek16()]
                            if e == 0:
                                raise ValueError(
                                    "corrupt JPEG: bad Huffman code"
                                )
                            rd.skip(e & 31)
                            if e >> 22 == 1:
                                d = ((e >> 9) & 8191) - 2048
                            else:
                                s = (e >> 5) & 15
                                d = _extend(rd.receive(s), s)
                            pred = preds[ti] + d
                            if not (-32768 <= pred <= 32767):
                                raise ValueError(
                                    "corrupt JPEG: DC predictor overflow"
                                )
                            preds[ti] = pred
                            blk[0] = pred << al
                        else:  # DC refinement: append one bit
                            if rd.receive(1):
                                blk[0] = int(blk[0]) | p1
                    elif ah == 0:  # AC first scan (spectral band)
                        if eobrun:
                            eobrun -= 1
                            continue
                        k = ss
                        while k <= se:
                            e = lut[rd.peek16()]
                            if e == 0:
                                raise ValueError(
                                    "corrupt JPEG: bad Huffman code"
                                )
                            op = e >> 22
                            rd.skip(e & 31)
                            if op == 1:  # combined run/value
                                k += (e >> 5) & 15
                                if k > se:
                                    raise ValueError(
                                        "corrupt JPEG: AC overrun"
                                    )
                                blk[zz[k]] = (
                                    (((e >> 9) & 8191) - 2048) << al
                                )
                                k += 1
                            elif op == 3:  # EOB / EOBn
                                r = (e >> 5) & 15
                                eobrun = (1 << r) - 1 + rd.receive(r)
                                break
                            elif op == 4:  # ZRL
                                k += 16
                            else:  # fallback: magnitude past window
                                s = (e >> 5) & 15
                                k += (e >> 9) & 15
                                if k > se:
                                    raise ValueError(
                                        "corrupt JPEG: AC overrun"
                                    )
                                blk[zz[k]] = _extend(rd.receive(s), s) << al
                                k += 1
                    else:  # AC refinement (T.81 G.2.2 / jdphuff)
                        k = ss
                        if eobrun == 0:
                            while k <= se:
                                e = lut[rd.peek16()]
                                if e == 0:
                                    raise ValueError(
                                        "corrupt JPEG: bad Huffman code"
                                    )
                                op = e >> 22
                                rd.skip(e & 31)
                                if op == 3:  # EOB / EOBn run begins
                                    r = (e >> 5) & 15
                                    eobrun = (1 << r) + rd.receive(r)
                                    break
                                if op == 4:  # ZRL: 16 zero-history slots
                                    run, newval = 15, 0
                                elif op == 1:
                                    run = (e >> 5) & 15
                                    v = ((e >> 9) & 8191) - 2048
                                    if v not in (1, -1):
                                        raise ValueError(
                                            "corrupt JPEG: bad refinement "
                                            "coefficient"
                                        )
                                    newval = p1 if v > 0 else m1
                                else:  # fallback form of (run, s=1)
                                    s = (e >> 5) & 15
                                    run = (e >> 9) & 15
                                    if s != 1:
                                        raise ValueError(
                                            "corrupt JPEG: bad refinement "
                                            "coefficient"
                                        )
                                    newval = p1 if rd.receive(1) else m1
                                # advance over `run` zero-history slots,
                                # appending correction bits to nonzero ones
                                while k <= se:
                                    z = zz[k]
                                    cur = int(blk[z])
                                    if cur:
                                        if rd.receive(1) and not (cur & p1):
                                            blk[z] = cur + (
                                                p1 if cur > 0 else m1
                                            )
                                    else:
                                        if run == 0:
                                            break
                                        run -= 1
                                    k += 1
                                if op != 4:
                                    if k > se:
                                        raise ValueError(
                                            "corrupt JPEG: AC overrun"
                                        )
                                    blk[zz[k]] = newval
                                k += 1
                        if eobrun:
                            # EOB region: correction bits only
                            while k <= se:
                                z = zz[k]
                                cur = int(blk[z])
                                if cur:
                                    if rd.receive(1) and not (cur & p1):
                                        blk[z] = cur + (
                                            p1 if cur > 0 else m1
                                        )
                                k += 1
                            eobrun -= 1
            mcu += 1
    if mcu < scan_total:
        raise ValueError("corrupt JPEG: missing MCUs")


_NATIVE_ERRORS = {
    -1: "corrupt JPEG: bad Huffman code",
    -2: "corrupt JPEG: scan underrun",
    -3: "corrupt JPEG: AC overrun",
    -4: "corrupt JPEG: DC predictor overflow",
    -5: "corrupt JPEG: bad scan component count",
    -6: "corrupt JPEG: bad refinement coefficient",
}


# progressive scan-structure cache: a corpus reuses one progression
# script (same Huffman tables, geometry, and Ss/Se/Ah/Al per scan), so
# the numpy/ctypes marshalling is paid once per distinct scan shape per
# process — only the per-image coefficient-store pointers rebuild.
_PROG_STRUCT_CACHE: dict[tuple, tuple] = {}


def _prog_native_call_args(native, tmpl, ss, se, ah, al, is_dc):
    """Marshal one progressive scan's template into a closure over the
    native kernel (the progressive sibling of ``_native_call_args``)."""
    import ctypes

    global _ZIGZAG_U8
    if _ZIGZAG_U8 is None:
        _ZIGZAG_U8 = np.ascontiguousarray(ZIGZAG.astype(np.uint8))
    n = len(tmpl)
    key = (
        tuple((id(t[1]), t[3], t[4], tuple(t[5])) for t in tmpl),
        ss, se, ah, al, is_dc,
    )
    hit = _PROG_STRUCT_CACHE.get(key)
    if hit is None:
        lut_ptrs = (ctypes.c_void_p * n)(
            *[(t[1].ctypes.data if t[1] is not None else None)
              for t in tmpl]
        )
        rowstep = np.array([t[3] for t in tmpl], dtype=np.int64)
        colstep = np.array([t[4] for t in tmpl], dtype=np.int64)
        offs_flat = np.array(
            [o for t in tmpl for o in t[5]], dtype=np.int64
        )
        noffs = np.array([len(t[5]) for t in tmpl], dtype=np.int64)
        offbase = np.concatenate([[0], np.cumsum(noffs)[:-1]]).astype(
            np.int64
        )
        hit = (
            lut_ptrs,
            rowstep.ctypes.data, colstep.ctypes.data,
            offs_flat.ctypes.data, offbase.ctypes.data,
            noffs.ctypes.data, _ZIGZAG_U8.ctypes.data,
            # keep every referenced array alive with the cache entry
            (rowstep, colstep, offs_flat, noffs, offbase, _ZIGZAG_U8,
             [t[1] for t in tmpl]),
        )
        _PROG_STRUCT_CACHE[key] = hit
    (lut_ptrs, p_rowstep, p_colstep, p_offs, p_offbase, p_noffs,
     p_zz, _keep) = hit
    coef_ptrs = (ctypes.c_void_p * n)(*[t[6] for t in tmpl])
    dc_flag = 1 if is_dc else 0

    def call(seg_bytes: bytes, mcu: int, seg_end: int, scan_mcux: int):
        return native(
            seg_bytes, len(seg_bytes), mcu, seg_end, scan_mcux, n,
            lut_ptrs, coef_ptrs,
            p_rowstep, p_colstep, p_offs, p_offbase, p_noffs, p_zz,
            ss, se, ah, al, dc_flag,
        )

    return call

_ZIGZAG_U8 = None  # built lazily: contiguous uint8 view for the kernel

# scan-structure marshalling cache: every field of the kernel call
# except the coefficient-store pointers depends only on the Huffman
# tables and the scan geometry — which repeat across a whole corpus
# (Annex-K tables, a handful of sampling layouts) — so the numpy/ctypes
# marshalling (~40 µs) is paid once per distinct structure per process,
# not once per image. Values referenced by the cache stay alive with it.
_SCAN_STRUCT_CACHE: dict[tuple, tuple] = {}


def _native_call_args(native, tmpl):
    """Marshal one scan's template into a closure over the native
    kernel — per-segment calls then only pass (bytes, mcu range)."""
    import ctypes

    global _ZIGZAG_U8
    if _ZIGZAG_U8 is None:
        _ZIGZAG_U8 = np.ascontiguousarray(ZIGZAG.astype(np.uint8))
    n = len(tmpl)
    key = tuple(
        (id(t[6]), id(t[7]), t[3], t[4], tuple(t[5])) for t in tmpl
    )
    hit = _SCAN_STRUCT_CACHE.get(key)
    if hit is None:
        dc_ptrs = (ctypes.c_void_p * n)(
            *[t[6].ctypes.data for t in tmpl]
        )
        ac_ptrs = (ctypes.c_void_p * n)(
            *[t[7].ctypes.data for t in tmpl]
        )
        rowstep = np.array([t[3] for t in tmpl], dtype=np.int64)
        colstep = np.array([t[4] for t in tmpl], dtype=np.int64)
        offs_flat = np.array(
            [o for t in tmpl for o in t[5]], dtype=np.int64
        )
        noffs = np.array([len(t[5]) for t in tmpl], dtype=np.int64)
        offbase = np.concatenate([[0], np.cumsum(noffs)[:-1]]).astype(
            np.int64
        )
        # lut arrays are cached forever in _LUT_CACHE, so holding their
        # ids in the key and the arrays in the value is stable
        hit = (
            dc_ptrs, ac_ptrs,
            rowstep.ctypes.data, colstep.ctypes.data,
            offs_flat.ctypes.data, offbase.ctypes.data,
            noffs.ctypes.data, _ZIGZAG_U8.ctypes.data,
            (tmpl[0][6], tmpl[0][7], rowstep, colstep, offs_flat,
             noffs, offbase, _ZIGZAG_U8),
        )
        _SCAN_STRUCT_CACHE[key] = hit
    (dc_ptrs, ac_ptrs, p_rowstep, p_colstep, p_offs, p_offbase,
     p_noffs, p_zz, _keep) = hit
    coef_ptrs = (ctypes.c_void_p * n)(
        *[t[8] for t in tmpl]
    )

    def call(seg_bytes: bytes, mcu: int, seg_end: int, scan_mcux: int):
        return native(
            seg_bytes, len(seg_bytes), mcu, seg_end, scan_mcux, n,
            dc_ptrs, ac_ptrs, coef_ptrs,
            p_rowstep, p_colstep, p_offs, p_offbase, p_noffs, p_zz,
        )

    return call


def _decode_segment_py(seg_bytes, mcu, seg_end, scan_mcux, tmpl):
    """Reference Python symbol loop over one entropy segment — the
    always-available fallback the native kernel is property-tested
    against (bit-exact coefficient parity)."""
    zz = ZIGZAG.tolist()
    npreds = len(tmpl)
    chunk = _WINDOW_CHUNK_BYTES
    if True:  # (kept indentation: body shared verbatim with history)
        nbits = 8 * len(seg_bytes)
        # window slab state: wv covers bits [lo, hi_b); refilled on demand
        lo = hi_b = 0
        wv: list[int] = []
        p = 0
        preds = [0] * npreds
        while mcu < seg_end:
            my, mx = divmod(mcu, scan_mcux)
            ti = 0
            for dc_lut, ac_lut, coef, rowstep, colstep, offs, *_ \
                    in tmpl:
                base = my * rowstep + mx * colstep
                for off in offs:
                    blk = coef[base + off]
                    # ---- DC ----
                    if p >= hi_b:
                        if p >= nbits:
                            raise ValueError("corrupt JPEG: scan underrun")
                        b0 = p >> 3
                        b1 = min(b0 + chunk, len(seg_bytes))
                        lo, hi_b = 8 * b0, 8 * b1
                        wv = _window16(seg_bytes, b0, b1)
                    e = dc_lut[wv[p - lo]]
                    if e == 0:
                        raise ValueError("corrupt JPEG: bad Huffman code")
                    op = e >> 22
                    p += e & 31
                    if op == 1:
                        d = ((e >> 9) & 8191) - 2048
                    else:  # fallback: magnitude bits beyond the window
                        s = (e >> 5) & 15
                        if p >= hi_b:
                            if p >= nbits:
                                raise ValueError(
                                    "corrupt JPEG: scan underrun"
                                )
                            b0 = p >> 3
                            b1 = min(b0 + chunk, len(seg_bytes))
                            lo, hi_b = 8 * b0, 8 * b1
                            wv = _window16(seg_bytes, b0, b1)
                        mag = wv[p - lo] >> (16 - s)
                        p += s
                        d = mag if mag >> (s - 1) else mag - (1 << s) + 1
                    pred = preds[ti] + d
                    # valid 8-bit baseline DC stays within ±2048; a
                    # runaway predictor only happens on corrupt streams
                    # and would overflow the compact int32 store
                    # (OverflowError ≠ the ValueError contract)
                    if not (-32768 <= pred <= 32767):
                        raise ValueError(
                            "corrupt JPEG: DC predictor overflow"
                        )
                    preds[ti] = pred
                    blk[0] = pred
                    # ---- AC ----
                    k = 1
                    while k < 64:
                        if p >= hi_b:
                            if p >= nbits:
                                raise ValueError(
                                    "corrupt JPEG: scan underrun"
                                )
                            b0 = p >> 3
                            b1 = min(b0 + chunk, len(seg_bytes))
                            lo, hi_b = 8 * b0, 8 * b1
                            wv = _window16(seg_bytes, b0, b1)
                        e = ac_lut[wv[p - lo]]
                        if e == 0:
                            raise ValueError(
                                "corrupt JPEG: bad Huffman code"
                            )
                        op = e >> 22
                        p += e & 31
                        if op == 1:  # combined code+value
                            k += (e >> 5) & 15
                            if k > 63:
                                raise ValueError("corrupt JPEG: AC overrun")
                            blk[zz[k]] = ((e >> 9) & 8191) - 2048
                            k += 1
                        elif op == 3:  # EOB
                            break
                        elif op == 4:  # ZRL
                            k += 16
                        else:  # fallback
                            s = (e >> 5) & 15
                            k += (e >> 9) & 15
                            if k > 63:
                                raise ValueError("corrupt JPEG: AC overrun")
                            if p >= hi_b:
                                if p >= nbits:
                                    raise ValueError(
                                        "corrupt JPEG: scan underrun"
                                    )
                                b0 = p >> 3
                                b1 = min(b0 + chunk, len(seg_bytes))
                                lo, hi_b = 8 * b0, 8 * b1
                                wv = _window16(seg_bytes, b0, b1)
                            mag = wv[p - lo] >> (16 - s)
                            p += s
                            blk[zz[k]] = (
                                mag if mag >> (s - 1)
                                else mag - (1 << s) + 1
                            )
                            k += 1
                ti += 1
            mcu += 1


def _reconstruct(frame, qts):
    """Coefficient stores → HxWx3 uint8 via the fixed-point integer
    pipeline (dequant → two-pass integer IDCT → +128 → replication
    upsample → 16.16 integer color convert → clip). Dispatches to the
    native kernel when available; this numpy body is the bit-exact
    reference it is property-tested against."""
    comps = frame.comps
    for c in comps:
        if c["tq"] not in qts:
            raise ValueError("corrupt JPEG: missing quant table")
    native = _native.jpegrecon()
    if native is not None and isinstance(comps[0]["coef"], np.ndarray):
        return _reconstruct_native(native, frame, qts)
    h, w = frame.h, frame.w
    hmax = max(c["hi"] for c in comps)
    vmax = max(c["vi"] for c in comps)
    planes = []
    for c in comps:
        coef = np.asarray(c["coef"], dtype=np.int64) * qts[c["tq"]]
        t1 = (
            np.matmul(_IDCT_MT, coef.reshape(-1, 8, 8))
            + (1 << (_IDCT_PASS1_SHIFT - 1))
        ) >> _IDCT_PASS1_SHIFT
        blocks = (
            (np.matmul(t1, _IDCT_M) + (1 << (_IDCT_PASS2_SHIFT - 1)))
            >> _IDCT_PASS2_SHIFT
        ) + 128
        plane = _from_blocks(blocks, c["bh"], c["bw"])
        # crop to the component's own sampled dims, then upsample by
        # replication to full frame size
        ch = -(-h * c["vi"] // vmax)
        cw = -(-w * c["hi"] // hmax)
        plane = plane[:ch, :cw]
        if c["vi"] != vmax or c["hi"] != hmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["vi"], axis=0),
                hmax // c["hi"],
                axis=1,
            )
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = planes[0]
        rgb = np.stack([y, y, y], axis=-1)
    else:
        y, cb, cr = planes
        cb = cb - 128
        cr = cr - 128
        rgb = np.stack(
            [
                y + ((_FIX_CR_R * cr + 32768) >> 16),
                y - ((_FIX_CB_G * cb + _FIX_CR_G * cr + 32768) >> 16),
                y + ((_FIX_CB_B * cb + 32768) >> 16),
            ],
            axis=-1,
        )
    return np.clip(rgb, 0, 255).astype(np.uint8)


# quant tables marshalled once per table content for the native kernel
# (real corpora reuse a handful of quality-scaled tables; the cap only
# guards against a hostile corpus minting a new table per image)
_QT_I32_CACHE: dict[bytes, np.ndarray] = {}
_QT_I32_CACHE_MAX = 1024


# frame-geometry marshalling cache: (geo ptr, offs ptr, scratch size)
# per (bw, bh, sx, sy)-tuple — a corpus repeats a handful of layouts
_GEO_CACHE: dict[tuple, tuple] = {}


def _reconstruct_native(native, frame, qts):
    """Marshal one frame into the jpegrecon kernel. The kernel computes
    the identical integer pipeline in one call: per-component IDCT into
    an int32 scratch plane, then the fused upsample + color-convert +
    clip pass straight into the uint8 output. Everything reusable
    (geometry arrays, int32 quant tables, the IDCT constant table) is
    marshalled once per distinct structure per process; only the
    coefficient/scratch/output pointers are per-image."""
    import ctypes

    h, w = frame.h, frame.w
    comps = frame.comps
    n = len(comps)
    hmax = max(c["hi"] for c in comps)
    vmax = max(c["vi"] for c in comps)
    coef_ptrs = (ctypes.c_void_p * n)(
        *[c["coef_ptr"] for c in comps]
    )
    qt_ptrs = (ctypes.c_void_p * n)()
    for i, c in enumerate(comps):
        qkey = qts[c["tq"]].tobytes()
        hit = _QT_I32_CACHE.get(qkey)
        if hit is None:
            if len(_QT_I32_CACHE) >= _QT_I32_CACHE_MAX:
                _QT_I32_CACHE.clear()
            qt = np.ascontiguousarray(qts[c["tq"]], dtype=np.int32)
            hit = (qt, qt.ctypes.data)
            _QT_I32_CACHE[qkey] = hit
        qt_ptrs[i] = hit[1]
    gkey = tuple(
        (c["bw"], c["bh"], hmax // c["hi"], vmax // c["vi"])
        for c in comps
    )
    ghit = _GEO_CACHE.get(gkey)
    if ghit is None:
        if len(_GEO_CACHE) >= 4096:
            _GEO_CACHE.clear()
        geo = np.empty(4 * n, dtype=np.int64)  # bw, bh, sx, sy per comp
        offs = np.empty(n + 1, dtype=np.int64)
        offs[0] = 0
        for i, (bw_, bh_, fx, fy) in enumerate(gkey):
            geo[4 * i] = bw_
            geo[4 * i + 1] = bh_
            # replication factors are 1 or 2 (enforced at SOF), stored
            # as shifts: x >> sx / y >> sy index the component plane
            geo[4 * i + 2] = fx - 1
            geo[4 * i + 3] = fy - 1
            offs[i + 1] = offs[i] + (bh_ * 8) * (bw_ * 8)
        ghit = (geo.ctypes.data, offs.ctypes.data, int(offs[n]),
                geo, offs)
        _GEO_CACHE[gkey] = ghit
    p_geo, p_offs, scratch_n = ghit[0], ghit[1], ghit[2]
    scratch = np.empty(scratch_n, dtype=np.int32)
    out = np.empty((h, w, 3), dtype=np.uint8)
    rc = native(
        coef_ptrs, qt_ptrs, p_geo, p_offs, n, h, w,
        scratch.ctypes.data, _IDCT_M.ctypes.data, out.ctypes.data,
    )
    if rc != 0:
        raise ValueError(f"corrupt JPEG: native reconstruct error {rc}")
    return out
