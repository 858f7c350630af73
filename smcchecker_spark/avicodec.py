"""AVI (RIFF) MJPEG mux/demux — stdlib only.

Makes the video column REAL end-to-end without ffmpeg: AVI is a public
RIFF container, MJPEG stores each frame as an independent baseline JPEG
— which :mod:`smcchecker_spark.jpegcodec` decodes. So a from-scratch
minimal muxer (spec-shaped ``hdrl``/``avih``/``strl`` headers + a
``movi`` LIST of ``00dc`` frame chunks + an ``idx1`` index) plus a
tolerant demuxer (walks any RIFF layout, collects ``..dc``/``..db``
chunks) gives the engine genuine video-frame sampling: demux → per-frame
JPEG decode → PNG re-encode, all with this repo's own codecs.

Contract (shared with the other codecs): decode either succeeds or
raises ``ValueError`` — nothing else escapes to a Spark task.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_AVI_BYTES = 1 << 30  # per-payload ceiling before any chunk walk


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """JPEG frame payloads → minimal spec-shaped AVI (one MJPG video
    stream, ``00dc`` chunks, idx1 index)."""
    if not frames:
        raise ValueError("AVI needs at least one frame")
    nf = len(frames)
    maxbuf = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1),  # usec/frame
        maxbuf * fps,              # max bytes/sec
        0,                         # padding granularity
        0x10,                      # AVIF_HASINDEX
        nf, 0, 1, maxbuf,          # frames, initial, streams, bufsize
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        # flags, priority, language, initialFrames, scale, rate, start,
        # length, bufsize, quality, samplesize (56-byte strh with rcFrame)
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, nf,
                      maxbuf, 0xFFFFFFFF, 0)
        + struct.pack("<HHHH", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_payload)
    # idx1: one entry per frame, offsets relative to the start of the
    # movi LIST payload tag area (the common convention: offset of the
    # chunk counted from 'movi' + 4)
    idx = b""
    off = 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) % 2)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def demux_avi_mjpeg(data: bytes) -> list[bytes]:
    """AVI bytes → list of JPEG frame payloads (scan order). Walks RIFF
    LISTs with an explicit stack of (start, end) ranges — hostile inputs
    with thousands of nested LISTs cannot trigger RecursionError, so the
    ValueError-only contract holds. Raises ``ValueError`` on non-AVI or
    structurally corrupt input."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF header)")
    if len(data) > MAX_AVI_BYTES:
        raise ValueError("AVI exceeds the payload-size cap")
    frames: list[bytes] = []

    # Depth-first walk over (pos, end) ranges into `data` (no payload
    # copies). A LIST pushes the remainder of the current range, then its
    # own payload, preserving scan order. Each LIST strictly shrinks the
    # range, so the stack is bounded by nesting depth but never recurses
    # in Python frames.
    stack: list[tuple[int, int]] = [(12, len(data))]
    while stack:
        pos, end = stack.pop()
        while pos + 8 <= end:
            tag = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            if body_start + size > end:
                raise ValueError("truncated AVI chunk")
            nxt = body_start + size + (size % 2)
            if tag == b"LIST":
                if size < 4:
                    raise ValueError("corrupt AVI: LIST shorter than kind")
                stack.append((nxt, end))       # resume siblings after
                pos, end = body_start + 4, body_start + size
                continue                        # descend (skip list kind)
            if tag[2:4] in (b"dc", b"db"):
                frames.append(bytes(data[body_start : body_start + size]))
            pos = nxt
    if not frames:
        raise ValueError("AVI contains no video frames")
    return frames


def sniff_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "
