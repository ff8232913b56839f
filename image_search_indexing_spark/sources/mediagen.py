"""Deterministic closed-form media payloads for the synthetic corpus.

The sandbox has no WARC payload bytes, but the byte-digest dedup path
(F3/F9/P2 — SHA-256 of content, magic sniff, size gates:
``utils/ImageParse.java:116-124``, ``DupDigestMergerJob.java:151-174``)
must be exercised END-TO-END against the DuckDB oracle. This module
synthesizes a ``media(url, payload)`` table from the corpus's own image
URLs with payload bytes that are a pure closed-form function of the URL,
so DuckDB can rebuild the identical bytes in SQL and check
``sha256(payload)`` digests, parsed dimensions and gate decisions
value-for-value.

Construction (mirrored in ``__spark_entry__._INDEXER_MEDIA_*`` SQL):

- ``img_id`` = the numeric stem of the synthetic image path
  (``/img/{img_id}.{ext}``); URLs that don't match get no payload.
- ``k = img_id % 97`` — the CONTENT key: different ``img_id``s (different
  hosts/SURTs) sharing ``k`` get byte-identical payloads, so their
  SHA-256 digests merge across SURTs — the reference's actual dedup case.
- ``s = k % 13`` selects the fixture class:
  - ``s = 0``: 20×20 SVG (trips the P2 too-small gate),
  - ``s = 1``: 15001×15001 SVG (area > 15000², too-large gate),
  - ``s = 2``: plain text (no magic → ``application/octet-stream``,
    MIME_INVALID, dropped as unparseable),
  - otherwise: SVG with w = 51+(7k mod 1200), h = 51+(13k mod 900).
- URLs with ``img_id % 5 == 4`` get NO payload row (the path-digest
  fallback keeps working for them).

Payloads are pure-ASCII on purpose: DuckDB's ``sha256`` accepts only
VARCHAR, so oracle comparability requires payload bytes == UTF-8 string
bytes. SVG is a real image format the reference handles explicitly
(gif/svg branch in ``ImageParse.java``), and its dimensions are genuinely
parsed from the bytes by ``operators/multimodal.parse_image_dims`` —
binary containers (PNG/GIF/BMP/JPEG headers) are covered by unit tests
with handcrafted byte fixtures instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SVG_PREFIX = '<svg xmlns="http://www.w3.org/2000/svg" width="'


def synthetic_media(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """``(url, payload binary)`` rows for the synthetic image URLs in
    ``urls`` (deduplicated); see the module docstring for the closed form."""
    u = urls.select(F.col(url_col).alias("url")).distinct()
    img_id = F.regexp_extract("url", r"/img/(\d+)\.", 1)
    u = u.where(img_id != "").withColumn("__id", img_id.cast("long"))
    k = (F.col("__id") % 97).cast("long")
    s = k % 13
    w = (
        F.when(s == 0, F.lit(20))
        .when(s == 1, F.lit(15001))
        .otherwise((F.lit(51) + (k * 7) % 1200).cast("int"))
    )
    h = (
        F.when(s == 0, F.lit(20))
        .when(s == 1, F.lit(15001))
        .otherwise((F.lit(51) + (k * 13) % 900).cast("int"))
    )
    svg = F.concat(
        F.lit(SVG_PREFIX),
        w.cast("string"),
        F.lit('" height="'),
        h.cast("string"),
        F.lit('"><desc>k'),
        k.cast("string"),
        F.lit("</desc></svg>"),
    )
    body = F.when(s == 2, F.concat(F.lit("not-an-image: "), k.cast("string"))).otherwise(svg)
    return u.where(F.col("__id") % 5 != 4).select(
        "url", body.cast("binary").alias("payload")
    )
