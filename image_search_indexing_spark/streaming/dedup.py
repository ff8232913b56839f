"""Streaming URL-seen dedup: state-store-backed first-occurrence filter.

The batch frontier keeps the seen set exact via bucket-partitioned tables
+ Bloom routing (``frontier/seen.py``). The streaming complement uses
Structured Streaming's keyed state store: ``dropDuplicates`` on the URL
hash emits only the first occurrence of each URL in the stream, with an
event-time watermark bounding state (URLs older than the watermark are
evicted — the streaming analog of re-crawl invalidation windows).

For exact long-horizon semantics the batch path remains authoritative;
this operator serves the live-ingest view (e.g. "new URLs discovered in
the last 24h, deduped") where bounded state is the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def first_occurrence_urls(refs: DataFrame, watermark: str = "24 hours") -> DataFrame:
    """First sighting of each url_hash within the watermark horizon.

    ``refs`` is a *streaming* frame from ``streaming.ingest.streaming_refs``
    (must carry ``url_hash`` and event-time ``page_ts``).
    """
    return refs.withWatermark("page_ts", watermark).dropDuplicates(["url_hash"])


def run_streaming_seen(spark, src_path: str, query_name: str = "seen_live"):
    """Drive the streaming dedup synchronously (test/demo harness)."""
    from .ingest import read_document_stream, streaming_refs

    refs = streaming_refs(read_document_stream(spark, src_path))
    deduped = first_occurrence_urls(refs)
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
