"""Edge rounds: empty document slices must still commit clean checkpoints."""

from pyspark.sql import functions as F


def test_empty_round_slice(spark, corpus, tmpdir_path):
    """n_rounds larger than the corpus hash range → some rounds see zero
    docs; they must commit empty batches + unchanged seen, not crash."""
    from image_search_indexing_spark.frontier.rounds import FrontierConfig, FrontierDriver

    docs = corpus["docs"].limit(0)  # force an empty slice everywhere
    drv = FrontierDriver(spark, f"{tmpdir_path}/er", FrontierConfig(n_rounds=2, n_buckets=8))
    counters = drv.run(docs, corpus["meta"], None, None, None, n_rounds=2)
    assert [c["scheduled"] for c in counters] == [0, 0]
    assert counters[1]["seen_total"] == 0
    assert drv.fetch_batch(1).count() == 0
    snap = drv.catalog.snapshot()
    assert snap["round"] == 1


def test_round_after_empty_round_continues(spark, corpus, tmpdir_path):
    """An empty round followed by a full corpus round behaves like round 0."""
    from image_search_indexing_spark.frontier.rounds import FrontierConfig, FrontierDriver

    cfg = FrontierConfig(n_rounds=2, n_buckets=8, default_budget=3)
    drv = FrontierDriver(spark, f"{tmpdir_path}/er2", cfg)
    drv.run_round(0, corpus["docs"].limit(0), corpus["meta"], None, corpus["politeness"], None)
    c1 = drv.run_round(1, corpus["docs"], corpus["meta"], None, corpus["politeness"], None)
    assert c1["scheduled"] > 0
    assert drv.seen_table().count() == c1["scheduled"]
