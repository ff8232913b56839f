"""Seen-set integration: bloom routing exactness + cuckoo deletion resurrects."""

from pyspark.sql import functions as F

from image_search_indexing_spark.frontier.seen import (
    build_bloom_table,
    build_cuckoo_table,
    filter_new_urls,
    with_hashes,
)


def _urls(spark, lo, hi):
    return with_hashes(
        spark.range(lo, hi).select(F.md5(F.col("id").cast("string")).alias("url_hash")),
        "url_hash",
        16,
    )


def test_bloom_routing_is_exact(spark):
    seen = _urls(spark, 0, 3000)
    cand = _urls(spark, 2000, 6000)
    bloom = build_bloom_table(seen, 16)
    new = filter_new_urls(spark, cand, seen, bloom, n_buckets=16)
    assert new.count() == 3000  # ids 3000..5999; bloom fp never drops a URL
    # without bloom, identical result (bloom is routing only)
    new2 = filter_new_urls(spark, cand, seen, None, n_buckets=16)
    assert {r["url_hash"] for r in new.collect()} == {r["url_hash"] for r in new2.collect()}


def test_cuckoo_deletions_resurrect(spark):
    seen = _urls(spark, 0, 3000)
    cand = _urls(spark, 2000, 6000)
    bloom = build_bloom_table(seen, 16)
    tomb = _urls(spark, 2500, 3000)  # re-crawl invalidation of 500 URLs
    cuckoo = build_cuckoo_table(tomb)
    new = filter_new_urls(spark, cand, seen, bloom, tomb, cuckoo, n_buckets=16)
    assert new.count() == 3500  # 3000 unseen + 500 resurrected
    # tombstones remain ground truth even without the cuckoo accelerator
    new2 = filter_new_urls(spark, cand, seen, bloom, tomb, None, n_buckets=16)
    assert {r["url_hash"] for r in new.collect()} == {r["url_hash"] for r in new2.collect()}
