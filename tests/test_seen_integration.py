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


def test_cuckoo_probe_runs_on_candidate_slice_not_seen_table(spark):
    """Scale-shape regression guard: with tombstones active, the cuckoo
    cogroup must probe the (tiny) in-seen candidate slice, NOT the full
    seen table — an earlier shape piped O(seen) rows through Arrow every
    round once any tombstone existed. Witness: exactly three Python
    cogroups (the Bloom probe in each of the fresh/maybe union branches +
    one cuckoo probe over the maybe slice), and the cuckoo cogroup's
    subtree contains the ``__in_seen`` membership flag — proving it
    consumes the flagged candidate slice, not the seen relation."""
    seen = _urls(spark, 0, 3000)
    cand = _urls(spark, 2000, 6000)
    bloom = build_bloom_table(seen, 16)
    tomb = _urls(spark, 2500, 3000)
    cuckoo = build_cuckoo_table(tomb)
    new = filter_new_urls(spark, cand, seen, bloom, tomb, cuckoo, n_buckets=16)
    plan = new._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("FlatMapCoGroupsInPandas") == 3, plan
    assert "__in_seen" in plan, plan
    # the cuckoo cogroup sits ABOVE the membership join (printed first,
    # children indented below): the text after it must still contain the
    # __in_seen flag, i.e. the flag join is inside its subtree
    tail = plan[plan.index("FlatMapCoGroupsInPandas"):]
    assert "__in_seen" in tail, tail


def test_bloom_rebuild_keeps_fpp_bounded(spark, corpus, tmpdir_path):
    """Capacity policy (rounds.py): filters sized for ~8 items/bucket get
    ~50x that inserted across rounds; overfull buckets must be rebuilt at a
    larger m from the exact seen table, keeping the false-positive rate of
    fresh probes under 2% (without rebuild it would be ~99% here)."""
    from image_search_indexing_spark.frontier.rounds import FrontierConfig, FrontierDriver
    from image_search_indexing_spark.frontier.seen import bloom_probe

    cfg = FrontierConfig(
        n_rounds=3, n_buckets=2, expected_per_bucket=8, default_budget=1 << 30
    )
    drv = FrontierDriver(spark, f"{tmpdir_path}/bloomcap", cfg)
    counters = drv.run(corpus["docs"], corpus["meta"], None, None, None, n_rounds=3)
    assert any(c.get("bloom_rebuilt_buckets", 0) > 0 for c in counters)

    bloom = drv.catalog.read_table(spark, "bloom")
    stats = {int(r["bucket"]): (int(r["m"]), int(r["n_items"])) for r in bloom.collect()}
    # every bucket ends within its load budget (n * bits_per_key <= load * m)
    for b, (m, n) in stats.items():
        assert n * cfg.bits_per_key <= cfg.bloom_rebuild_load * m, (b, m, n)

    fresh = with_hashes(
        spark.range(50_000).select(
            F.md5(F.concat(F.lit("fresh-"), F.col("id").cast("string"))).alias("url_hash")
        ),
        "url_hash",
        cfg.n_buckets,
    )
    marked = bloom_probe(spark, fresh, bloom)
    fpp = marked.where(F.col("maybe_seen")).count() / 50_000
    assert fpp < 0.02, fpp
