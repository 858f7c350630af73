"""EXIF (APP1/TIFF) metadata: build, parse, orient — from the public
TIFF 6.0 / EXIF 2.3 structures, no third-party libs.

Why a validation engine cares (no reference analogue — the reference
never sees binary payloads; this generalizes its dtype-coercion check,
/root/reference/proj/core/functions.py:62-75, to payload metadata):

- **Orientation** (tag 0x0112) changes DISPLAY geometry: values 5-8
  transpose width/height, so stored (w, h) that match the raw decoded
  array still disagree with every orientation-honoring viewer.
  ``oriented_dims`` / ``apply_orientation`` make the policy explicit,
  and the ``ExifSane`` constraint (image.py) flags out-of-range values.
- **Structural corruption** in the TIFF directory (offsets past the
  segment, entry-count bombs) is a payload-quality signal on crawled
  corpora; the parser raises ``ValueError`` only — same hostile-input
  contract as the codecs — with absent EXIF simply returning ``{}``.
- **DateTime fields** get the same literal-pattern treatment as the
  reference's timestamp regex check (proj/core/functions.py:73):
  ``EXIF_DATETIME_RE`` is the spec's "YYYY:MM:DD HH:MM:SS".

Only the tags validation uses are implemented (Orientation, Make,
Model, DateTime, DateTimeOriginal via the Exif sub-IFD pointer); the
parser walks at most IFD0 + one sub-IFD with capped entry counts, so a
hostile payload costs O(entries), never O(claimed offsets).
"""

from __future__ import annotations

import re
import struct

import numpy as np

# IFD type sizes (TIFF 6.0 §2); only the ones we read/write
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_DATETIME_ORIGINAL = 0x9003

_MAX_IFD_ENTRIES = 256

EXIF_DATETIME_RE = re.compile(r"^\d{4}:\d{2}:\d{2} \d{2}:\d{2}:\d{2}$")


def build_exif_app1(
    orientation: int | None = None,
    datetime_original: str | None = None,
    make: str | None = None,
    model: str | None = None,
    datetime: str | None = None,
) -> bytes:
    """Minimal valid APP1 segment (marker + length + "Exif\\0\\0" +
    little-endian TIFF with IFD0 and, when ``datetime_original`` is
    given, an Exif sub-IFD) — the fixture-side counterpart of
    ``parse_exif`` for planting metadata in test payloads."""
    ifd0: list[tuple[int, int, bytes]] = []  # (tag, type, raw value bytes)
    if make is not None:
        ifd0.append((TAG_MAKE, 2, make.encode("ascii") + b"\0"))
    if model is not None:
        ifd0.append((TAG_MODEL, 2, model.encode("ascii") + b"\0"))
    if orientation is not None:
        ifd0.append((TAG_ORIENTATION, 3, struct.pack("<H", orientation)))
    if datetime is not None:
        ifd0.append((TAG_DATETIME, 2, datetime.encode("ascii") + b"\0"))

    sub: list[tuple[int, int, bytes]] = []
    if datetime_original is not None:
        sub.append(
            (
                TAG_DATETIME_ORIGINAL,
                2,
                datetime_original.encode("ascii") + b"\0",
            )
        )

    n0 = len(ifd0) + (1 if sub else 0)
    ifd0_off = 8
    sub_off = ifd0_off + 2 + 12 * n0 + 4 if sub else 0
    data_off = (sub_off + 2 + 12 * len(sub) + 4) if sub else (
        ifd0_off + 2 + 12 * n0 + 4
    )

    overflow = bytearray()

    def entry(tag: int, typ: int, raw: bytes) -> bytes:
        count = len(raw) // _TYPE_SIZES[typ]
        if len(raw) <= 4:
            return struct.pack("<HHI", tag, typ, count) + raw.ljust(4, b"\0")
        off = data_off + len(overflow)
        overflow.extend(raw)
        return struct.pack("<HHII", tag, typ, count, off)

    body = bytearray()
    body += b"II" + struct.pack("<HI", 42, ifd0_off)
    body += struct.pack("<H", n0)
    for tag, typ, raw in sorted(ifd0):
        body += entry(tag, typ, raw)
    if sub:
        body += struct.pack("<HHII", TAG_EXIF_IFD, 4, 1, sub_off)
    body += struct.pack("<I", 0)  # next-IFD
    if sub:
        body += struct.pack("<H", len(sub))
        for tag, typ, raw in sorted(sub):
            body += entry(tag, typ, raw)
        body += struct.pack("<I", 0)
    body += overflow

    payload = b"Exif\0\0" + bytes(body)
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def inject_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert a prebuilt APP1 segment right after SOI (spec position)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    return jpeg[:2] + app1 + jpeg[2:]


def _read_ifd(tiff: bytes, off: int, bo: str, out: dict) -> int | None:
    """Parse one IFD at ``off``; fill ``out`` with known tags; return
    the Exif sub-IFD offset if pointed to."""
    if off + 2 > len(tiff):
        raise ValueError("corrupt EXIF: IFD offset past segment")
    (n,) = struct.unpack_from(bo + "H", tiff, off)
    if n > _MAX_IFD_ENTRIES:
        raise ValueError("corrupt EXIF: IFD entry count too large")
    if off + 2 + 12 * n + 4 > len(tiff):
        raise ValueError("corrupt EXIF: IFD truncated")
    sub_off = None
    for k in range(n):
        tag, typ, count = struct.unpack_from(bo + "HHI", tiff, off + 2 + 12 * k)
        val_off = off + 2 + 12 * k + 8
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue  # unknown type: skip per TIFF §2 readers' rule
        total = size * count
        if total > len(tiff):
            raise ValueError("corrupt EXIF: value size past segment")
        if total <= 4:
            raw = tiff[val_off : val_off + total]
        else:
            (p,) = struct.unpack_from(bo + "I", tiff, val_off)
            if p + total > len(tiff):
                raise ValueError("corrupt EXIF: value offset past segment")
            raw = tiff[p : p + total]
        if tag == TAG_ORIENTATION and typ == 3 and count >= 1:
            out["orientation"] = struct.unpack_from(bo + "H", raw)[0]
        elif tag == TAG_MAKE and typ == 2:
            out["make"] = raw.split(b"\0")[0].decode("ascii", "replace")
        elif tag == TAG_MODEL and typ == 2:
            out["model"] = raw.split(b"\0")[0].decode("ascii", "replace")
        elif tag == TAG_DATETIME and typ == 2:
            out["datetime"] = raw.split(b"\0")[0].decode("ascii", "replace")
        elif tag == TAG_DATETIME_ORIGINAL and typ == 2:
            out["datetime_original"] = raw.split(b"\0")[0].decode(
                "ascii", "replace"
            )
        elif tag == TAG_EXIF_IFD and typ == 4 and count == 1:
            sub_off = struct.unpack_from(bo + "I", raw)[0]
    return sub_off


def parse_exif(jpeg: bytes) -> dict:
    """Extract known EXIF tags from a JPEG's APP1 segment. Returns ``{}``
    when there is no Exif APP1; raises ``ValueError`` when an Exif APP1
    exists but its TIFF structure is corrupt. Never raises anything
    else (hostile-input contract)."""
    if jpeg[:2] != b"\xff\xd8":
        return {}
    pos, n = 2, len(jpeg)
    while pos + 4 <= n:
        if jpeg[pos] != 0xFF:
            return {}
        while pos + 1 < n and jpeg[pos + 1] == 0xFF:
            pos += 1
        marker = jpeg[pos + 1]
        pos += 2
        if marker in (0xD8, 0xD9, 0xDA) or 0xD0 <= marker <= 0xD7:
            return {}  # into entropy data / end: no APP1 seen
        if pos + 2 > n:
            return {}
        seglen = int.from_bytes(jpeg[pos : pos + 2], "big")
        payload = jpeg[pos + 2 : pos + seglen]
        pos += seglen
        if marker != 0xE1 or not payload.startswith(b"Exif\0\0"):
            continue
        tiff = payload[6:]
        if len(tiff) < 8:
            raise ValueError("corrupt EXIF: TIFF header truncated")
        if tiff[:2] == b"II":
            bo = "<"
        elif tiff[:2] == b"MM":
            bo = ">"
        else:
            raise ValueError("corrupt EXIF: bad TIFF byte order")
        magic, ifd0 = struct.unpack_from(bo + "HI", tiff, 2)
        if magic != 42:
            raise ValueError("corrupt EXIF: bad TIFF magic")
        out: dict = {}
        sub = _read_ifd(tiff, ifd0, bo, out)
        if sub is not None:
            _read_ifd(tiff, sub, bo, out)
        return out
    return {}


def oriented_dims(w: int, h: int, orientation: int) -> tuple[int, int]:
    """Display (w, h) for an EXIF orientation: 5-8 transpose."""
    return (h, w) if orientation in (5, 6, 7, 8) else (w, h)


def apply_orientation(arr: np.ndarray, orientation: int) -> np.ndarray:
    """Transform raw decoded pixels to display orientation (EXIF 2.3
    §4.6.4 table): 1=identity, 2=flip-H, 3=rot180, 4=flip-V,
    5=transpose, 6=rot90 CW, 7=transverse, 8=rot90 CCW."""
    if orientation == 2:
        return arr[:, ::-1]
    if orientation == 3:
        return arr[::-1, ::-1]
    if orientation == 4:
        return arr[::-1]
    if orientation == 5:
        return np.swapaxes(arr, 0, 1)
    if orientation == 6:
        return np.swapaxes(arr, 0, 1)[:, ::-1]
    if orientation == 7:
        return np.swapaxes(arr, 0, 1)[::-1, ::-1]
    if orientation == 8:
        return np.swapaxes(arr, 0, 1)[::-1]
    return arr
