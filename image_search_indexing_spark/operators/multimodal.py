"""Multimodal column plumbing: binary payloads + typed metadata.

The reference's media handling is image-byte parsing and thumbnailing
(``utils/ImageParse.java:89-193``: dimension checks, ≤200×200 resize,
gif/svg skip; F9 MIME sniffing ``WARCInformationParser.java:124-138``).
This container has no imaging/audio libraries, so the DECODE KERNELS ARE
DETERMINISTIC STUBS — but the Spark-side plumbing is real and tested:
binary columns travel as ``BinaryType``, metadata as typed structs, and
every kernel is an Arrow-batched ``mapInPandas``/``pandas_udf`` with the
exact batch shape a real decoder (PIL / torchaudio / pyav) would use —
swap the stub body for the real library call and nothing else changes.

Magic-byte MIME sniffing (F9) IS real — it needs no imaging library.
"""

from __future__ import annotations

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

    STUB decode: real deployments replace `_decode_batch`'s body with
    PIL.Image.open over the byte buffer; here dimensions are derived
    deterministically from the payload hash so tests exercise the full
    plumbing (schema, nulls, Arrow batching, size gates) with stable
    values.
    """

    def _decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payload = pdf[binary_col]
            n_bytes = payload.map(lambda b: len(b) if b is not None else 0)
            # DETERMINISTIC FAKE (no imaging libs in this container): real
            # impl -> `img = PIL.Image.open(io.BytesIO(b)); img.size`
            h64 = payload.map(
                lambda b: int.from_bytes(hashlib_md5(b)[:8], "big") if b is not None else 0
            )
            width = (h64 % 2000).astype("int32")
            height = ((h64 // 2000) % 2000).astype("int32")
            mime = payload.map(sniff_mime)
            out = pdf.copy()
            out["width"] = width
            out["height"] = height
            out["n_bytes"] = n_bytes.astype("int32")
            out["mime_detected"] = mime
            yield out

    import hashlib

    def hashlib_md5(b: bytes) -> bytes:
        return hashlib.md5(b).digest()

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
