"""Multimodal column plumbing: binary payloads + typed metadata.

The reference's media handling is image-byte parsing and thumbnailing
(``utils/ImageParse.java:89-193``: dimension checks, ≤200×200 resize,
gif/svg skip; F9 MIME sniffing ``WARCInformationParser.java:124-138``).

What is REAL here (no imaging library needed):
- magic-byte MIME sniffing (F9), including audio containers;
- image DIMENSION extraction (``parse_image_dims``): PNG IHDR, GIF
  logical-screen descriptor, BMP info header, JPEG SOF marker scan, and
  SVG width/height attributes are all plain header arithmetic — the part
  of ``ImageParse`` the size gates (P2) actually consume.

What is STUBBED (this container has no PIL/torchaudio/pyav): full pixel
decode, byte-level thumbnail resize, audio DSP, video frame decode. Those
kernels are deterministic stand-ins behind the exact Arrow batch shape a
real decoder would use — swap the body for the library call and nothing
else changes.
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_THUMB_SIDE = 200  # ImageParse.java thumbnail bound
MIN_WIDTH = 51  # ImageParse.java:41-56 size gates
MIN_HEIGHT = 51
MAX_AREA = 15000 * 15000

_MAGIC = [
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"BM", "image/bmp"),
    (b"RIFF", "image/webp"),  # + 'WEBP'/'WAVE' at offset 8, checked below
    (b"\x00\x00\x01\x00", "image/x-icon"),
    (b"II*\x00", "image/tiff"),
    (b"MM\x00*", "image/tiff"),
    (b"ID3", "audio/mpeg"),
    (b"\xff\xfb", "audio/mpeg"),
    (b"OggS", "audio/ogg"),
    (b"fLaC", "audio/flac"),
]


def sniff_mime(data: bytes | None) -> str | None:
    """Magic-byte MIME detection (F9 analog — real, no stub)."""
    if data is None:
        return None
    for magic, mime in _MAGIC:
        if data.startswith(magic):
            if mime == "image/webp":
                if data[8:12] == b"WAVE":
                    return "audio/wav"
                if data[8:12] != b"WEBP":
                    continue
            return mime
    if data[:5] in (b"<?xml", b"<svg ") or data.lstrip()[:4] == b"<svg":
        return "image/svg+xml"
    return "application/octet-stream"


@F.pandas_udf(T.StringType())
def sniff_mime_udf(data: pd.Series) -> pd.Series:
    return data.map(sniff_mime)


def _jpeg_dims(data: bytes) -> tuple[int | None, int | None]:
    """JPEG (width, height) via SOFn marker scan — header-only, no decode."""
    sof = frozenset(
        (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
    )
    i, n = 2, len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # standalone
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(data[i + 2 : i + 4], "big")
        if marker in sof:
            if i + 9 <= n:
                h = int.from_bytes(data[i + 5 : i + 7], "big")
                w = int.from_bytes(data[i + 7 : i + 9], "big")
                return w, h
            return None, None
        if seglen < 2:
            break
        i += 2 + seglen
    return None, None


_SVG_W = re.compile(rb'\swidth="(\d+)(?:px)?"')
_SVG_H = re.compile(rb'\sheight="(\d+)(?:px)?"')


def parse_image_dims(data: bytes | None) -> tuple[int | None, int | None]:
    """REAL dimension extraction from image headers (F10/P2 input) —
    PNG IHDR (big-endian u32 at 16/20), GIF logical screen (little-endian
    u16 at 6/8), BMP BITMAPINFOHEADER (signed LE i32 at 18/22, top-down
    negatives folded), JPEG SOF scan, SVG width/height attributes. Plain
    byte arithmetic, no imaging library — the part of ``ImageParse.java``
    the size gates consume. ``(None, None)`` = unknown container or
    truncated header; callers treat that as a parse failure (the
    reference's ``ImageParse`` returning null → image skipped)."""
    if data is None or len(data) < 10:
        return None, None
    try:
        if data[:8] == b"\x89PNG\r\n\x1a\n":
            if len(data) >= 24 and data[12:16] == b"IHDR":
                return (
                    int.from_bytes(data[16:20], "big"),
                    int.from_bytes(data[20:24], "big"),
                )
            return None, None
        if data[:6] in (b"GIF87a", b"GIF89a"):
            return (
                int.from_bytes(data[6:8], "little"),
                int.from_bytes(data[8:10], "little"),
            )
        if data[:2] == b"BM" and len(data) >= 26:
            w = int.from_bytes(data[18:22], "little", signed=True)
            h = int.from_bytes(data[22:26], "little", signed=True)
            return abs(w), abs(h)
        if data[:3] == b"\xff\xd8\xff":
            return _jpeg_dims(data)
        head = data[:4096]
        if head[:5] in (b"<?xml", b"<svg ") or head.lstrip()[:4] == b"<svg":
            tag_end = head.find(b">")
            tag = head if tag_end < 0 else head[: tag_end + 1]
            mw, mh = _SVG_W.search(tag), _SVG_H.search(tag)
            if mw and mh:
                return int(mw.group(1)), int(mh.group(1))
            return None, None
    except Exception:
        return None, None
    return None, None


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("mime_detected", T.StringType()),
    ]
)


def decode_image_meta(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """Attach (width, height, n_bytes, mime) per binary payload.

    MIME sniffing and dimension parsing are REAL (header arithmetic, see
    ``parse_image_dims``); width/height are NULL when the container is
    unknown or the header is malformed — downstream gates treat
    payload-present-but-unparseable as a dropped image (``ImageParse``
    null). A full pixel decode (PIL) would slot into the same batch loop
    without changing the schema or the Arrow batching.
    """

    def _decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payload = pdf[binary_col]
            dims = [parse_image_dims(b) for b in payload]
            out = pdf.copy()
            out["width"] = pd.array([d[0] for d in dims], dtype="Int32")
            out["height"] = pd.array([d[1] for d in dims], dtype="Int32")
            out["n_bytes"] = pd.array(
                [len(b) if b is not None else 0 for b in payload], dtype="Int32"
            )
            out["mime_detected"] = payload.map(sniff_mime)
            yield out

    schema = T.StructType(df.schema.fields + list(DECODE_SCHEMA.fields))
    return df.mapInPandas(_decode_batch, schema)


def size_gate(df: DataFrame) -> DataFrame:
    """P2 size gates (ImageParse.java:41-56): drop tiny/huge images."""
    return df.where(
        (F.col("width") >= MIN_WIDTH)
        & (F.col("height") >= MIN_HEIGHT)
        & (F.col("width").cast("long") * F.col("height") <= MAX_AREA)
    )


def thumbnail_dims(width: Column, height: Column, max_side: int = MAX_THUMB_SIDE):
    """imgscalr-style ratio-preserving ≤200×200 resize dims (F10 analog,
    pure built-ins — the byte-level resize itself is the stubbed part)."""
    scale = F.least(
        F.lit(float(max_side)) / width, F.lit(float(max_side)) / height, F.lit(1.0)
    )
    return (
        F.greatest(F.round(width * scale).cast("int"), F.lit(1)),
        F.greatest(F.round(height * scale).cast("int"), F.lit(1)),
    )


AUDIO_SCHEMA = (
    "media_id string, mime_detected string, n_bytes int, "
    "duration_ms_est long, n_windows int, loudness_fp long"
)


def extract_audio_features(
    df: DataFrame, media_id: str = "media_id", payload: str = "payload",
    window_ms: int = 1000, bitrate_bps: int = 128_000,
) -> DataFrame:
    """Audio feature-extraction plumbing (stubbed DSP kernel).

    Real impl: torchaudio/librosa decode → per-window loudness/MFCC. The
    sandbox has no audio libs, so duration is estimated from byte length at
    an assumed bitrate and the per-window "loudness" fingerprint is a
    deterministic xxhash-style fold of the window's bytes — the Arrow
    batch shape, schema and windowing arithmetic are the real contract.
    MIME sniffing is real (magic bytes).
    """

    def _features(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        bytes_per_window = max(1, bitrate_bps // 8 * window_ms // 1000)
        for pdf in it:
            rows = []
            for mid, buf in zip(pdf[media_id], pdf[payload]):
                if buf is None:
                    continue
                n = len(buf)
                dur = n * 8000 // bitrate_bps  # ms at the assumed bitrate
                n_win = max(1, (n + bytes_per_window - 1) // bytes_per_window)
                fp = 0
                for w in range(n_win):  # per-window fold (stub DSP kernel)
                    chunk = buf[w * bytes_per_window : (w + 1) * bytes_per_window]
                    fp ^= int.from_bytes(hashlib.md5(chunk).digest()[:8], "big") >> 1
                rows.append((mid, sniff_mime(bytes(buf)), n, dur, n_win, fp))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "mime_detected", "n_bytes",
                    "duration_ms_est", "n_windows", "loudness_fp",
                ],
            )

    return df.mapInPandas(_features, AUDIO_SCHEMA)


FRAME_SCHEMA = "media_id string, frame_idx int, ts_ms long, frame binary"


def sample_frames(df: DataFrame, media_id: str = "media_id", payload: str = "payload",
                  every_ms: int = 1000, max_frames: int = 8) -> DataFrame:
    """Video frame-sampling plumbing (stubbed decode).

    Real impl: pyav demux/decode keyframes every `every_ms`. Stub emits
    deterministic placeholder frames derived from the payload bytes, with
    the exact output schema/batching a real sampler uses."""

    def _sample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows = []
            for mid, buf in zip(pdf[media_id], pdf[payload]):
                if buf is None:
                    continue
                n = min(max_frames, 1 + len(buf) % max_frames)
                for i in range(n):
                    tag = hashlib.md5(buf + i.to_bytes(4, "big")).digest()
                    rows.append((mid, i, i * every_ms, tag))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "ts_ms", "frame"])

    return df.mapInPandas(_sample, FRAME_SCHEMA)
