"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched UDFs.

What's REAL here (tested): the Spark-side plumbing — schemas, batch
iteration, partition behavior, UDF signatures — plus, via the engine's
own from-scratch codecs: image decode / resize / feature-extraction /
format transcoding (PNG, baseline JPEG via :mod:`..jpegcodec`, lossless
WebP via :mod:`..webpcodec`), WAV audio metadata (RIFF/WAVE integer PCM
via :mod:`..wavcodec`), and AVI-MJPEG video frame sampling
(:mod:`..avicodec` RIFF demux feeding the JPEG decoder). What's STUBBED
(no PIL/ffmpeg/librosa in this container): lossy-VP8 WebP, compressed
audio (mp3/flac/ogg), inter-frame-coded video (mp4/h264) — reported as
not-ok / no-rows, with deterministic fakes available for pipeline
testing (``deterministic_fake=True``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from smcchecker_spark import imagecodec as ic

IMAGE_META_SCHEMA = "ok boolean, w int, h int, fmt string, n_pixels long"
IMAGE_FEATURES_SCHEMA = (
    "ok boolean, mean_r double, mean_g double, mean_b double, luma_std double"
)

_UDFS: dict[str, object] = {}


def _resize_block_mean(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic nearest-block-mean resize (pure numpy)."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w, 3), dtype=np.float64)
    for i in range(out_h):
        for j in range(out_w):
            out[i, j] = arr[
                ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)
            ].mean(axis=(0, 1))
    return out.round().clip(0, 255).astype(np.uint8)


def image_meta_udf():
    """bytes → (ok, w, h, fmt, n_pixels) — decode metadata extraction."""
    if "meta" not in _UDFS:

        @pandas_udf(IMAGE_META_SCHEMA)
        def meta(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
            for s in batches:
                rows = []
                for b in s.values:
                    try:
                        arr, fmt = ic.decode_image(bytes(b) if b is not None else None)
                        h, w = arr.shape[:2]
                        rows.append((True, w, h, fmt, int(w) * int(h)))
                    except ValueError:
                        rows.append((False, None, None, None, None))
                yield pd.DataFrame(
                    rows, columns=["ok", "w", "h", "fmt", "n_pixels"]
                )

        _UDFS["meta"] = meta
    return _UDFS["meta"]


def image_features_udf():
    """bytes → channel means + luma std (the feature-extraction stage)."""
    if "features" not in _UDFS:

        @pandas_udf(IMAGE_FEATURES_SCHEMA)
        def features(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
            for s in batches:
                rows = []
                for b in s.values:
                    try:
                        arr, _ = ic.decode_image(bytes(b) if b is not None else None)
                        m = arr.reshape(-1, 3).mean(axis=0)
                        rows.append(
                            (
                                True,
                                round(float(m[0]), 4),
                                round(float(m[1]), 4),
                                round(float(m[2]), 4),
                                round(float(ic.luma(arr).std()), 4),
                            )
                        )
                    except ValueError:
                        rows.append((False, None, None, None, None))
                yield pd.DataFrame(
                    rows,
                    columns=["ok", "mean_r", "mean_g", "mean_b", "luma_std"],
                )

        _UDFS["features"] = features
    return _UDFS["features"]


IMAGE_QUALITY_SCHEMA = (
    "ok boolean, blur double, luma_mean double, luma_std double, "
    "colorfulness double, err string"
)


def image_quality_vector(arr: np.ndarray) -> tuple[float, float, float, float]:
    """Decode-free-of-libraries image quality gates over decoded HxWx3
    pixels — the standard curation signals:

    - ``blur``: variance of the 4-neighbor Laplacian of the luma plane
      (low → blurry/flat; screenshots of solid UI and defocused photos
      score near 0, textured photos score high);
    - ``luma_mean`` / ``luma_std``: exposure and contrast;
    - ``colorfulness``: Hasler–Süsstrunk metric over the rg/yb opponent
      channels (grayscale ≈ 0).

    Pure numpy; thresholds belong to the caller's policy (these are
    features, not verdicts). Sub-3x3 images have no Laplacian interior
    → blur 0.0."""
    lum = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    if lum.shape[0] >= 3 and lum.shape[1] >= 3:
        lap = (
            4.0 * lum[1:-1, 1:-1]
            - lum[:-2, 1:-1]
            - lum[2:, 1:-1]
            - lum[1:-1, :-2]
            - lum[1:-1, 2:]
        )
        blur = float(lap.var())
    else:
        blur = 0.0
    r = arr[..., 0].astype(np.float64)
    g = arr[..., 1].astype(np.float64)
    b = arr[..., 2].astype(np.float64)
    rg = r - g
    yb = 0.5 * (r + g) - b
    colorfulness = float(
        np.sqrt(rg.std() ** 2 + yb.std() ** 2)
        + 0.3 * np.sqrt(rg.mean() ** 2 + yb.mean() ** 2)
    )
    return blur, float(lum.mean()), float(lum.std()), colorfulness


def image_quality_udf():
    """bytes → curation quality features (see
    :func:`image_quality_vector`); undecodable payloads fail their
    row with the decode error, never the task."""
    if "image_quality" not in _UDFS:

        @pandas_udf(IMAGE_QUALITY_SCHEMA)
        def quality(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
            cols = ["ok", "blur", "luma_mean", "luma_std",
                    "colorfulness", "err"]
            for s in batches:
                arrs, _, errs = ic.decode_image_batch(s.values)
                rows = []
                for arr, err in zip(arrs, errs):
                    if arr is None:
                        rows.append((False, None, None, None, None, err))
                        continue
                    blur, lm, ls, cf = image_quality_vector(arr)
                    rows.append((
                        True, round(blur, 4), round(lm, 4),
                        round(ls, 4), round(cf, 4), None,
                    ))
                yield pd.DataFrame(rows, columns=cols)

        _UDFS["image_quality"] = quality
    return _UDFS["image_quality"]


def with_image_quality(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    return df.withColumn(
        "img_quality", image_quality_udf()(F.col(bytes_col))
    )


def image_resize_udf(out_w: int, out_h: int):
    """bytes → re-encoded PNG bytes at (out_w, out_h). Undecodable → NULL."""
    key = f"resize_{out_w}x{out_h}"
    if key not in _UDFS:

        @pandas_udf("binary")
        def resize(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for s in batches:
                out = []
                for b in s.values:
                    try:
                        arr, _ = ic.decode_image(bytes(b) if b is not None else None)
                        out.append(
                            ic.encode_png(_resize_block_mean(arr, out_w, out_h))
                        )
                    except ValueError:
                        out.append(None)
                yield pd.Series(out, dtype=object)

        _UDFS[key] = resize
    return _UDFS[key]


TRANSCODE_SCHEMA = (
    "bytes binary, fmt string, w int, h int, phash long, err string"
)


def transcode_udf(target: str = "png", quality: int = 95):
    """bytes (any supported format) → re-encoded payload in ``target``
    ("png" | "jpeg" | "webp") with refreshed metadata. A curation
    pipeline normalizes heterogeneous web-crawled payloads to ONE
    canonical format before training-batch assembly; this is that stage
    as a single Arrow-batched map (no shuffle, no driver involvement).

    The returned ``phash`` is recomputed from a DECODE of the NEW
    payload (not the source pixels), so downstream consistency
    validation — which recomputes from stored bytes — always agrees even
    across a lossy target. For lossless targets the re-decode is skipped
    (pixels are bit-identical by construction; locked by
    tests/test_ops.py). Undecodable inputs set ``err`` and NULL fields —
    flagged, never silently dropped."""
    if target not in ("png", "jpeg", "webp"):
        raise ValueError(f"unsupported transcode target {target!r}")
    key = f"transcode_{target}_{quality}"
    if key not in _UDFS:

        @pandas_udf(TRANSCODE_SCHEMA)
        def transcode(
            batches: Iterator[pd.Series],
        ) -> Iterator[pd.DataFrame]:
            from smcchecker_spark import jpegcodec as jc
            from smcchecker_spark import webpcodec as wc

            for s in batches:
                rows = []
                for b in s.values:
                    try:
                        arr, _ = ic.decode_image(
                            bytes(b) if b is not None else None
                        )
                        if target == "png":
                            payload = ic.encode_png(arr)
                            ph = ic.phash64(arr)  # lossless: same pixels
                        elif target == "webp":
                            payload = wc.encode_webp(arr)
                            ph = ic.phash64(arr)  # VP8L is lossless too
                        else:
                            payload = jc.encode_jpeg(arr, quality=quality)
                            ph = ic.phash64(jc.decode_jpeg(payload))
                        h, w = arr.shape[:2]
                        rows.append(
                            (payload, target, int(w), int(h), int(ph), None)
                        )
                    except ValueError as e:
                        rows.append((None, None, None, None, None, str(e)))
                # explicit nullable dtypes: a plain DataFrame would
                # coerce phash to float64 whenever the batch holds an
                # error row's None, silently rounding int64 hashes past
                # 2^53 (caught by tests/test_ops.py transcode golden)
                yield pd.DataFrame(
                    {
                        "bytes": pd.Series(
                            [r[0] for r in rows], dtype=object
                        ),
                        "fmt": pd.Series([r[1] for r in rows], dtype=object),
                        "w": pd.Series([r[2] for r in rows], dtype="Int32"),
                        "h": pd.Series([r[3] for r in rows], dtype="Int32"),
                        "phash": pd.Series(
                            [r[4] for r in rows], dtype="Int64"
                        ),
                        "err": pd.Series([r[5] for r in rows], dtype=object),
                    }
                )

        _UDFS[key] = transcode
    return _UDFS[key]


def transcode_images(
    df: DataFrame,
    bytes_col: str = "bytes",
    target: str = "png",
    quality: int = 95,
) -> DataFrame:
    """Replace (bytes, fmt, w, h, phash) with the transcoded payload's
    values; append ``transcode_err`` (NULL on success). Columns the
    input lacks are simply added. ONE Python stage, map-only."""
    t = transcode_udf(target, quality)(F.col(bytes_col))
    out = df.withColumn("_tc", t)
    for field in ("bytes", "fmt", "w", "h", "phash"):
        out = out.withColumn(field, F.col("_tc").getField(field))
    return out.withColumn(
        "transcode_err", F.col("_tc").getField("err")
    ).drop("_tc")


def with_image_meta(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    return df.withColumn("img_meta", image_meta_udf()(F.col(bytes_col)))


def with_image_features(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    return df.withColumn("img_feat", image_features_udf()(F.col(bytes_col)))


# ---------------------------------------------------------------------------
# Audio / video: real Spark plumbing, stubbed decoders
# ---------------------------------------------------------------------------

AUDIO_META_SCHEMA = "ok boolean, n_samples long, sample_rate int, rms double"
VIDEO_FRAMES_SCHEMA = "frame_idx int, frame_png binary"

try:  # pragma: no cover - not present in this container
    import librosa  # noqa: F401

    HAVE_AUDIO = True
except ImportError:
    HAVE_AUDIO = False


def audio_meta_udf(deterministic_fake: bool = False):
    """Audio metadata extraction. REAL for WAV (RIFF/WAVE integer PCM —
    decoded by the from-scratch :mod:`smcchecker_spark.wavcodec`, no
    librosa needed). Compressed formats (mp3/flac/ogg) still need
    librosa/soundfile, absent here; with ``deterministic_fake=True``
    non-WAV payloads fall back to the raw-int16-PCM-at-16kHz stand-in
    instead of reporting a violation — otherwise a non-WAV payload is
    simply not ok (the honest behavior for an undecodable format).
    """
    key = f"audio_{deterministic_fake}"
    if key not in _UDFS:

        @pandas_udf(AUDIO_META_SCHEMA)
        def audio_meta(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
            from smcchecker_spark import wavcodec

            for s in batches:
                rows = []
                for b in s.values:
                    if b is None or len(b) < 2:
                        rows.append((False, None, None, None))
                        continue
                    b = bytes(b)
                    if wavcodec.sniff_wav(b):
                        try:
                            samples, rate = wavcodec.decode_wav(b)
                        except ValueError:
                            rows.append((False, None, None, None))
                            continue
                        rms = float(
                            np.sqrt(np.mean(samples.astype(np.float64) ** 2))
                        )
                        rows.append(
                            (True, int(samples.shape[0]), rate, round(rms, 4))
                        )
                    elif deterministic_fake:
                        pcm = np.frombuffer(b[: len(b) // 2 * 2], dtype="<i2")
                        rms = float(
                            np.sqrt(np.mean(pcm.astype(np.float64) ** 2))
                        )
                        rows.append((True, int(pcm.size), 16000, round(rms, 4)))
                    else:
                        rows.append((False, None, None, None))
                yield pd.DataFrame(
                    rows, columns=["ok", "n_samples", "sample_rate", "rms"]
                )

        _UDFS[key] = audio_meta
    return _UDFS[key]


AUDIO_FEATURES_SCHEMA = (
    "ok boolean, n_samples long, sample_rate int, duration_s double, "
    "rms double, zcr double, centroid_hz double, rolloff_hz double, "
    "peak_hz double, err string"
)

# spectral analysis window cap: features come from the first ~1M samples
# (65 s at 16 kHz) so a multi-hour WAV costs bounded FFT memory per row;
# the cap is part of the feature definition (documented, deterministic)
AUDIO_ANALYSIS_MAX_SAMPLES = 1 << 20


def audio_feature_vector(
    samples: np.ndarray, rate: int
) -> tuple[float, float, float, float, float, float]:
    """Real signal features from integer PCM (channels mean-mixed,
    normalized to [-1, 1]): duration, RMS, zero-crossing rate, and the
    magnitude-spectrum centroid / 85% rolloff / peak frequencies from
    one rfft over the (capped) signal. These are the standard cheap
    quality gates for an audio corpus: silence (rms≈0), clipping/tone
    artifacts (peak dominance), hiss vs speech (centroid), bandwidth
    (rolloff). Pure numpy — testable without Spark; values are floats,
    so consumers compare with tolerances, never equality (unlike the
    image phash path there is no bit-exactness contract here)."""
    x = samples.astype(np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    x = x / 32768.0
    n_total = x.shape[0]
    duration = n_total / float(rate)
    rms = float(np.sqrt(np.mean(x**2)))
    # sign changes per sample; zeros count as positive (branchless, and
    # a silent signal then has zcr 0 as expected)
    s = np.where(x >= 0, 1, -1)
    zcr = float(np.mean(s[1:] != s[:-1])) if n_total > 1 else 0.0
    xa = x[:AUDIO_ANALYSIS_MAX_SAMPLES]
    mag = np.abs(np.fft.rfft(xa))
    mag[0] = 0.0  # DC offset is a recording artifact, not content
    freqs = np.fft.rfftfreq(xa.shape[0], 1.0 / rate)
    total = float(mag.sum())
    if total <= 0.0:
        return duration, rms, zcr, 0.0, 0.0, 0.0
    centroid = float((freqs * mag).sum() / total)
    roll_at = int(np.searchsorted(np.cumsum(mag), 0.85 * total))
    rolloff = float(freqs[min(roll_at, len(freqs) - 1)])
    peak = float(freqs[int(np.argmax(mag))])
    return duration, rms, zcr, centroid, rolloff, peak


def audio_features_udf():
    """Spectral/signal features per WAV payload — REAL DSP over the
    from-scratch :mod:`..wavcodec` decode (no librosa). Non-WAV or
    corrupt payloads come back ok=false with the decode error string;
    a crafted payload can fail its row, never the executor."""
    if "audio_features" not in _UDFS:

        @pandas_udf(AUDIO_FEATURES_SCHEMA)
        def audio_features(
            batches: Iterator[pd.Series],
        ) -> Iterator[pd.DataFrame]:
            from smcchecker_spark import wavcodec

            cols = [
                "ok", "n_samples", "sample_rate", "duration_s", "rms",
                "zcr", "centroid_hz", "rolloff_hz", "peak_hz", "err",
            ]
            bad = (False,) + (None,) * 8
            for s in batches:
                rows = []
                for b in s.values:
                    if b is None or len(b) < 12 or not wavcodec.sniff_wav(
                        bytes(b[:12])
                    ):
                        rows.append(bad + ("not a WAV payload",))
                        continue
                    try:
                        samples, rate = wavcodec.decode_wav(bytes(b))
                    except ValueError as e:
                        rows.append(bad + (str(e),))
                        continue
                    dur, rms, zcr, cen, roll, peak = audio_feature_vector(
                        samples, rate
                    )
                    rows.append((
                        True, int(samples.shape[0]), rate, round(dur, 6),
                        round(rms, 6), round(zcr, 6), round(cen, 3),
                        round(roll, 3), round(peak, 3), None,
                    ))
                yield pd.DataFrame(rows, columns=cols)

        _UDFS["audio_features"] = audio_features
    return _UDFS["audio_features"]


def with_audio_features(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    return df.withColumn(
        "audio_feat", audio_features_udf()(F.col(bytes_col))
    )


FAKE_VIDEO_MAGIC = b"FVID"


def encode_fake_video(frames: list[np.ndarray]) -> bytes:
    """Deterministic video stand-in: FVID magic + frame count + length-
    prefixed PNG frames. Exists so the demux *plumbing* (one row in → k
    frame rows out) is real and testable without ffmpeg."""
    import struct

    parts = [FAKE_VIDEO_MAGIC, struct.pack(">I", len(frames))]
    for f in frames:
        png = ic.encode_png(f)
        parts.append(struct.pack(">I", len(png)))
        parts.append(png)
    return b"".join(parts)


def decode_fake_video(data: bytes) -> list[bytes]:
    """FVID container → list of PNG payloads (no pixel decode)."""
    import struct

    if data is None or data[:4] != FAKE_VIDEO_MAGIC:
        raise ValueError("not a FVID payload")
    (n,) = struct.unpack(">I", data[4:8])
    pos, out = 8, []
    for _ in range(n):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        out.append(bytes(data[pos + 4 : pos + 4 + ln]))
        pos += 4 + ln
    if len(out) != n:
        raise ValueError("truncated FVID payload")
    return out


def video_frame_sample(
    df: DataFrame,
    id_col: str = "video_id",
    bytes_col: str = "video_bytes",
    every_n: int = 10,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Sample every ``every_n``-th frame: one input row explodes into k
    ``(video_id, frame_idx, frame_png)`` rows via ``mapInPandas`` (the
    1-to-many batch shape ffmpeg demux would use; partitioning of the
    input carries over, so a salted repartition upstream defuses
    long-video skew).

    REAL for AVI-MJPEG payloads: the RIFF demux
    (:mod:`smcchecker_spark.avicodec`) yields per-frame baseline JPEGs,
    decoded by the engine's own :mod:`smcchecker_spark.jpegcodec` and
    re-encoded to PNG — no ffmpeg anywhere. Inter-frame-coded containers
    (mp4/h264 etc.) still need ffmpeg/pyav, absent here; the FVID
    stand-in container also demuxes (its frames are already PNG).
    Undecodable payloads emit no rows (a validation suite catches them
    upstream). ``deterministic_fake`` is kept for call-site
    compatibility; both container formats decode regardless."""
    del deterministic_fake  # both supported containers are always real
    out_schema = f"{id_col} string, frame_idx int, frame_png binary"

    def demux(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from smcchecker_spark import avicodec, jpegcodec

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for vid, b in zip(pdf[id_col].values, pdf[bytes_col].values):
                try:
                    b = bytes(b) if b is not None else b""
                    if avicodec.sniff_avi(b):
                        jpegs = avicodec.demux_avi_mjpeg(b)
                        pngs = None
                    else:
                        pngs = decode_fake_video(b)
                        jpegs = None
                except ValueError:
                    continue
                payloads = pngs if pngs is not None else jpegs
                for i in range(0, len(payloads), every_n):
                    if jpegs is not None:
                        try:
                            arr = jpegcodec.decode_jpeg(jpegs[i])
                        except ValueError:
                            continue  # skip the corrupt frame, keep the video
                        frame = ic.encode_png(arr)
                    else:
                        frame = pngs[i]
                    ids.append(vid)
                    idxs.append(i)
                    frames.append(frame)
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame_png": frames}
            )

    return df.select(id_col, bytes_col).mapInPandas(demux, out_schema)


def majority_phash(phashes: "list[int] | np.ndarray") -> int:
    """Per-bit majority vote over 64-bit frame phashes → one video
    fingerprint (ties set the bit — deterministic). Robust where any
    single frame's hash is not: a re-encode perturbs a few bits on a
    few frames, and the vote absorbs it; temporal trims shift which
    frames vote but most voters stay. The result is an ordinary stored
    64-bit fingerprint, so video near-dup runs through the SAME
    chunk-banded `dedup.hamming_near_dups` path as images — no new
    shuffle machinery."""
    ph = np.asarray(phashes, dtype=np.uint64)
    if ph.size == 0:
        raise ValueError("majority_phash needs at least one hash")
    ones = (
        (ph[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
    ).sum(axis=0)
    maj = (2 * ones >= ph.size).astype(np.uint64)
    return int((maj << np.arange(64, dtype=np.uint64)).sum().astype(np.int64))


def video_fingerprint(
    df: DataFrame,
    id_col: str = "video_id",
    bytes_col: str = "video_bytes",
    every_n: int = 10,
) -> DataFrame:
    """One row per video: decode-sampled frame phashes and the
    majority-vote video fingerprint (see :func:`majority_phash`).
    REAL for AVI-MJPEG via the engine's own demux + JPEG decode; FVID
    stand-ins also work (frames are PNG). Corrupt frames are skipped;
    a video with NO decodable sampled frame comes back ok=false with
    the reason — a crafted payload fails its row, never the task.

    Output: (id, ok, n_frames, n_sampled, video_phash, frame_phashes,
    err). ``video_phash`` feeds `dedup.phash_near_dups` /
    `incremental.save_phash_index` unchanged; ``frame_phashes`` (in
    frame order) supports fine-grained verify of candidate pairs."""
    out_schema = (
        f"{id_col} string, ok boolean, n_frames int, n_sampled int, "
        "video_phash long, frame_phashes array<long>, err string"
    )

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from smcchecker_spark import avicodec, jpegcodec
        from smcchecker_spark.imagecodec import decode_png, phash64_batch

        cols = [
            id_col, "ok", "n_frames", "n_sampled", "video_phash",
            "frame_phashes", "err",
        ]
        for pdf in batches:
            rows = []
            for vid, b in zip(pdf[id_col].values, pdf[bytes_col].values):
                try:
                    b = bytes(b) if b is not None else b""
                    if avicodec.sniff_avi(b):
                        payloads, is_png = avicodec.demux_avi_mjpeg(b), False
                    else:
                        payloads, is_png = decode_fake_video(b), True
                except ValueError as e:
                    rows.append((vid, False, None, None, None, None, str(e)))
                    continue
                arrs = []
                for i in range(0, len(payloads), every_n):
                    try:
                        arrs.append(
                            decode_png(payloads[i]) if is_png
                            else jpegcodec.decode_jpeg(payloads[i])
                        )
                    except ValueError:
                        continue  # corrupt frame: skip, keep the video
                if not arrs:
                    rows.append((
                        vid, False, len(payloads), 0, None, None,
                        "no decodable sampled frames",
                    ))
                    continue
                phs = [int(p) for p in phash64_batch(arrs)]
                rows.append((
                    vid, True, len(payloads), len(arrs),
                    majority_phash(phs), phs, None,
                ))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, bytes_col).mapInPandas(fp, out_schema)
