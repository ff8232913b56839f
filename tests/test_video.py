"""AVI container walk + real video frame pixel decode.

The writer here is INDEPENDENT of sources/mediagen.synthetic_media_avi
(struct-packed, not hex-concatenated), so generator and parser can't
share a bug. MJPEG frames come from test_kernels' independent minimal
JPEG encoder — the same encoder the JPEG decoder round-trip pins use."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from image_search_indexing_spark.operators.multimodal import (
    decode_dib_frame,
    extract_video_frames,
    iter_avi_frames,
    parse_avi_meta,
    sample_frames,
    sniff_mime,
)


def _chunk(cc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cc + struct.pack("<I", len(body)) + body + pad


def _avi(frames, w, h, upf=40000, codec=b"DIB ", frame_cc=b"00db") -> bytes:
    fs = len(frames[0]) if frames else 0
    avih = struct.pack("<14I", upf, 0, 0, 0, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0)
    strh = (
        b"vids" + codec
        + struct.pack("<IHH", 0, 0, 0)
        + struct.pack("<8I", 0, upf, 1_000_000, 0, len(frames), fs, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, fs, 0, 0, 0, 0)
    hdrl = b"hdrl" + _chunk(b"avih", avih) + _chunk(
        b"LIST", b"strl" + _chunk(b"strh", strh) + _chunk(b"strf", strf)
    )
    movi = b"movi" + b"".join(_chunk(frame_cc, f) for f in frames)
    body = b"AVI " + _chunk(b"LIST", hdrl) + _chunk(b"LIST", movi)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _dib(rgb: np.ndarray) -> bytes:
    """Pack an HxWx3 RGB array as a bottom-up padded BGR DIB body."""
    h, w = rgb.shape[:2]
    row_len = (3 * w + 3) & ~3
    out = bytearray()
    for y in range(h - 1, -1, -1):
        row = bytearray()
        for x in range(w):
            r, g, b = rgb[y, x]
            row += bytes([b, g, r])
        row += b"\x00" * (row_len - len(row))
        out += row
    return bytes(out)


def test_parse_avi_meta_and_sniff():
    data = _avi([b"\x00" * 24], w=2, h=3, upf=33333)
    assert parse_avi_meta(data) == (33333, 1, 1, 2, 3)
    assert sniff_mime(data) == "video/x-msvideo"
    assert parse_avi_meta(b"RIFF\x00\x00\x00\x00WAVE") is None


def test_dib_decode_orientation_and_padding():
    # w=2 -> row padding 2 bytes; distinct corner colors pin both the
    # bottom-up flip and the BGR->RGB swap
    rgb = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8
    )
    got = decode_dib_frame(_dib(rgb), 2, 2)
    assert np.array_equal(got, rgb)
    assert decode_dib_frame(b"\x00" * 3, 2, 2) is None  # truncated


def test_extract_video_frames_dib_exact(spark):
    f0 = np.full((4, 4, 3), (10, 200, 30), dtype=np.uint8)
    f1 = np.full((4, 4, 3), (99, 1, 255), dtype=np.uint8)
    data = _avi([_dib(f0), _dib(f1)], w=4, h=4, upf=50000)
    df = spark.createDataFrame([("v1", bytearray(data))], "media_id string, payload binary")
    rows = sorted(extract_video_frames(df).collect(), key=lambda r: r.frame_idx)
    assert [(r.frame_idx, r.ts_ms, r.width, r.height, r.decoded) for r in rows] == [
        (0, 0, 4, 4, True), (1, 50, 4, 4, True)
    ]
    assert (rows[0].mean_r, rows[0].mean_g, rows[0].mean_b) == (10.0, 200.0, 30.0)
    assert (rows[1].mean_r, rows[1].mean_g, rows[1].mean_b) == (99.0, 1.0, 255.0)


def test_extract_video_frames_mjpeg_real_decode(spark):
    from test_kernels import _enc_jpeg

    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:, :, 0] = 120
    img[:, :, 1] = 60
    img[:, :, 2] = 200
    data = _avi([_enc_jpeg(img, quality=95)], w=16, h=16, codec=b"MJPG", frame_cc=b"00dc")
    df = spark.createDataFrame([("m1", bytearray(data))], "media_id string, payload binary")
    r = extract_video_frames(df).collect()[0]
    assert r.decoded and (r.width, r.height) == (16, 16)
    assert r.mean_r == pytest.approx(120, abs=3)
    assert r.mean_g == pytest.approx(60, abs=3)
    assert r.mean_b == pytest.approx(200, abs=3)


def test_extract_video_frames_unknown_codec_counted(spark):
    # h264-ish opaque frame: the row is emitted with decoded=false,
    # never silently dropped
    data = _avi([b"\x00\x00\x01\x65 not-jpeg"], w=8, h=8, codec=b"H264", frame_cc=b"00dc")
    df = spark.createDataFrame([("x", bytearray(data))], "media_id string, payload binary")
    r = extract_video_frames(df).collect()[0]
    assert not r.decoded and r.mean_r is None and (r.width, r.height) == (8, 8)


def test_sample_frames_avi_real_bytes_and_timeline(spark):
    frames = [b"AAAA" * 12, b"BBBB" * 12, b"CCCC" * 12]
    data = _avi(frames, w=4, h=4, upf=100000)  # 10 fps
    df = spark.createDataFrame([("s1", bytearray(data))], "media_id string, payload binary")
    rows = sorted(sample_frames(df).collect(), key=lambda r: r.frame_idx)
    assert [r.ts_ms for r in rows] == [0, 100, 200]
    assert [bytes(r.frame) for r in rows] == frames  # the ACTUAL chunk bytes


def test_iter_avi_frames_skips_audio_chunks():
    both = _avi([b"\x01" * 48], w=4, h=4)
    # splice an audio chunk into the movi list
    movi_at = both.index(b"movi")
    data = both[: movi_at + 4] + _chunk(b"01wb", b"\x07" * 10) + both[movi_at + 4 :]
    # (sizes now inconsistent, but the walk is bounded by len(data))
    kinds = [(sno, code) for sno, code, _ in iter_avi_frames(data)]
    assert (1, "wb") in kinds and (0, "db") in kinds


def test_video_phash_frames_and_pairs(spark):
    """Closed-form AVI bytes → REAL movi walk + DIB decode → per-frame
    pHash equals the hash of the directly-constructed frame; same-
    content docs pair on every frame, frame-0-perturbed variants on all
    later frames, and no cross-content pair reaches 2 matched frames."""
    import numpy as np

    from image_search_indexing_spark.operators.multimodal import (
        phash64,
        video_phash_frames,
        video_phash_pairs,
    )
    from image_search_indexing_spark.sources.mediagen import synthetic_media_avi_pixels

    docs = spark.range(0, 48).withColumnRenamed("id", "doc_id")
    media = synthetic_media_avi_pixels(docs)
    got = {}
    for r in video_phash_frames(media).collect():
        got.setdefault(r["doc_id"], {})[r["frame_idx"]] = r["fp"]
    for doc_id in range(48):
        kk, v = doc_id % 23, doc_id % 2
        w, h, nf = 8 + 4 * (kk % 3), 8 + 8 * (kk % 2), 3 + kk % 2
        want = {}
        for f in range(nf):
            y, x = np.mgrid[0:h, 0:w]
            img = np.stack(
                [(11 * kk + 2 * x + 7 * y + 29 * f + 3 * y * y
                  + (v if f == 0 else 0)) % 256,
                 (7 * kk + 13 * x + 3 * y + 23 * f + 2 * x * x) % 256,
                 (3 * kk + 5 * x + 11 * y + 17 * f + x * y) % 256],
                axis=2,
            ).astype(np.uint8)
            want[f] = phash64(img)
        assert got[doc_id] == want
    pairs = {(r["id_a"], r["id_b"]): r["n_matched"]
             for r in video_phash_pairs(video_phash_frames(media)).collect()}
    for (a, b), nm in pairs.items():
        assert a % 23 == b % 23, f"cross-content video pair {(a, b)}"
        nf = 3 + (a % 23) % 2
        if a % 2 == b % 2:
            assert nm == nf  # identical videos: every frame matches
        else:
            # the +1 R perturbation on frame 0 is sub-luma-quantum for
            # most pixels (luma >> 8), so frame 0 may or may not move
            assert nm in (nf - 1, nf)
    assert pairs, "same-content videos must pair"
