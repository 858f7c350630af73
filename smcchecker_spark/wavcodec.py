"""WAV (RIFF/WAVE PCM) encode/decode — stdlib + numpy only.

Upgrades the engine's audio column from a raw-PCM stand-in to a REAL
container format: WAV is a public trivial spec (RIFF 'WAVE' with an
``fmt `` chunk describing PCM layout and a ``data`` chunk of samples),
so the same from-scratch treatment the image codecs got applies here.
Supports integer PCM at 8 bits (unsigned) and 16 bits (signed
little-endian), mono or multichannel.

Contract (shared with the image codecs): every input either decodes or
raises ``ValueError`` — executors validating untrusted payloads must
emit violation rows, not die on stray exception types. Sizes are
validated against the header before any allocation; the data chunk is
truncated to whole frames exactly like common decoders do.

Reference semantics: SMC Checker reports undecodable uploads as
violations (/root/reference/proj/core_checks.py); the multimodal brief
asks for audio as an opaque binary column with typed metadata — this
gives that metadata (channels, rate, samples) a real on-disk format.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_SAMPLE_BYTES = 1 << 28  # 256 MiB of samples — hostile-header cap


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000
) -> bytes:
    """int16 samples, shape (n,) or (n, channels) → WAV bytes
    (16-bit PCM little-endian, interleaved)."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2 or samples.shape[1] < 1:
        raise ValueError(f"expected (n,) or (n, ch) samples, got {samples.shape}")
    n, ch = samples.shape
    if not (1 <= sample_rate <= 10_000_000):
        raise ValueError(f"bad sample rate {sample_rate}")
    data = np.ascontiguousarray(samples).tobytes()
    block = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    if len(data) % 2:
        body += b"\x00"  # RIFF chunks are even-padded
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples shaped (n, channels), sample_rate).
    8-bit unsigned PCM is widened to int16 (centered). Raises
    ``ValueError`` on anything that is not integer-PCM WAV."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    n = len(data)
    fmt = None
    raw = None
    while pos + 8 <= n:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        if len(payload) != size:
            raise ValueError("truncated WAV chunk")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("corrupt WAV: short fmt chunk")
            fmt = struct.unpack("<HHIIHH", payload[:16])
        elif tag == b"data":
            raw = payload
            if fmt is not None:
                break  # common layout: fmt before data
        pos += 8 + size + (size % 2)  # chunks are even-padded
    if fmt is None or raw is None:
        raise ValueError("corrupt WAV: missing fmt/data chunk")
    audio_fmt, ch, rate, _byte_rate, _block, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"non-PCM WAV (format tag {audio_fmt}) not supported")
    if ch < 1 or ch > 64:
        raise ValueError(f"bad WAV channel count {ch}")
    if bits not in (8, 16):
        raise ValueError(f"unsupported WAV bit depth {bits}")
    if len(raw) > MAX_SAMPLE_BYTES:
        raise ValueError("WAV data exceeds the decoded-size cap")
    width = bits // 8
    frame = ch * width
    usable = len(raw) // frame * frame
    if usable == 0:
        raise ValueError("WAV has no complete sample frames")
    if bits == 16:
        flat = np.frombuffer(raw[:usable], dtype="<i2")
    else:
        flat = (
            np.frombuffer(raw[:usable], dtype=np.uint8).astype(np.int16)
            - 128
        ) * 256
    return flat.reshape(-1, ch), int(rate)


def sniff_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"
