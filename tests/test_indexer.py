"""Caption semantics pins + indexer pipeline invariants.

Mirrors the reference's CaptionExtractTest (three scenarios: parent-walk
adjacent caption, sibling fallback, >250-char trim —
``CaptionExtractTest.java:47-154``) re-encoded as span sequences per
FIXTURES.md §1, plus invariants of the two-job indexer plan.
"""

import pytest
from pyspark.sql import functions as F

from image_search_indexing_spark.frontier.extract import extract_refs

SPANS_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)
META_SCHEMA = "doc_id string, base_url string, fetch_ts string"


def _run(spark, spans_rows):
    docs = spark.createDataFrame(spans_rows, SPANS_SCHEMA)
    meta = spark.createDataFrame(
        [(r[0], "http://www.iol.pt/multimedia/page.html", "20160701120000") for r in spans_rows],
        META_SCHEMA,
    )
    refs = extract_refs(docs, meta).where(F.col("drop_reason").isNull())
    return {r["doc_id"]: r for r in refs.collect()}


def _t(text, off):
    return ("text", text, None, off)


def _img(url, off):
    return ("img", None, url, off)


def test_caption_adjacent(spark):
    """An immediately-adjacent non-empty text span wins (parent-walk analog);
    ties (both neighbors adjacent) go to the earlier span."""
    rows = [
        ("d1", [_t("Image 1 This is caption 1", 0), _img("/m/a.jpg", 1), _t("Page 2", 2)]),
        ("d2", [_img("/m/b.jpg", 0), _t("caption after", 1)]),
    ]
    out = _run(spark, rows)
    assert out["d1"]["caption"] == "Image 1 This is caption 1"
    assert out["d2"]["caption"] == "caption after"
    # SURT pin, CaptionExtractTest.java:47 style
    assert out["d1"]["surt"] == "(pt,iol,)/m/a.jpg"


def test_caption_sibling_fallback(spark):
    """Empty adjacent neighbors → nearest non-empty text both sides joined
    by newline (getImgCaptionSibling, ImageInformationExtractor.java:758-788)."""
    rows = [
        (
            "d1",
            [
                _t("before text", 0),
                _t("  ", 1),  # empty neighbor
                _img("/m/c.jpg", 2),
                _t("", 3),  # empty neighbor
                _t("after text", 4),
            ],
        ),
        ("d2", [_t(" ", 0), _img("/m/d.jpg", 1)]),  # nothing non-empty anywhere
    ]
    out = _run(spark, rows)
    assert out["d1"]["caption"] == "before text\nafter text"
    assert out["d2"]["caption"] == ""


def test_caption_trim_250(spark):
    """>250-char caption → head+tail word-aligned trim
    (trimCaption, ImageInformationExtractor.java:779-794)."""
    long_text = " ".join(f"w{i:03d}" for i in range(80))  # 479 chars
    rows = [("d1", [_t(long_text, 0), _img("/m/e.jpg", 1)])]
    out = _run(spark, rows)
    got = out["d1"]["caption"]
    s = long_text
    ls = s[:125].rfind(" ")
    ls = 125 if ls == -1 else ls
    ts = (len(s) - 125) + s[len(s) - 125 :].find(" ")
    expected = (s[:ls].strip() + "\n" + s[ts:].strip()).strip()
    assert got == expected
    assert len(got) <= 252


def test_caption_nearest_wins(spark):
    """Non-adjacent: the closer non-empty side alone is NOT chosen — both
    sides join (sibling semantics) since neither is adjacent."""
    rows = [("d1", [_t("far before", 0), _t(" ", 1), _img("/m/f.jpg", 2), _t(" ", 3), _t("far after", 4)])]
    out = _run(spark, rows)
    assert out["d1"]["caption"] == "far before\nfar after"


def test_indexer_full_and_compact(spark):
    from image_search_indexing_spark.plans.indexer import indexer_compact, indexer_full

    sf = "/root/testdata/sf0.001"
    full = indexer_full(spark, sf)
    compact = indexer_compact(spark, sf)
    frows = full.collect()
    crows = compact.collect()
    assert len(frows) > 0 and len(crows) > 0

    # every page record carries an assigned capture that exists in its
    # image's timestamp list (J3: FullImageMetadata.java:124-128)
    bad = full.where(
        F.col("digest").isNotNull() & ~F.array_contains(F.col("timestamps"), F.col("page_ts"))
    )
    # nearest-capture ts must be IN the digest's list; page_ts equals it in
    # this closed world (capture ts == observing page's ts)
    assert bad.count() == 0

    # COMPACT: one row per digest; dedup across hosts occurred (some digest
    # has >1 distinct capture count)
    assert compact.select("digest").distinct().count() == len(crows)
    assert compact.where(F.col("total_captures") > F.size("all_timestamps") - 1000).count() >= 0
    assert compact.where(F.col("total_captures") > 1).count() > 0

    # timestamps sorted (O1/O2 determinism)
    unsorted = compact.where(
        F.col("all_timestamps") != F.array_sort("all_timestamps")
    ).count()
    assert unsorted == 0


def test_indexer_partition_invariance(spark):
    from image_search_indexing_spark.plans.indexer import indexer_compact

    sf = "/root/testdata/sf0.001"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    rows_a = {r["digest"]: r for r in indexer_compact(spark, sf).collect()}
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        rows_b = {r["digest"]: r for r in indexer_compact(spark, sf).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert rows_a.keys() == rows_b.keys()
    for k in rows_a:
        assert rows_a[k] == rows_b[k], k
