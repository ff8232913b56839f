"""Custom stateful streaming operator: per-host cumulative budget.

State (URLs already granted per host) must carry ACROSS micro-batches —
a host exhausting its budget early emits nothing later, which a stateless
per-batch top-k cannot do.
"""

from pyspark.sql import functions as F


def test_stateful_host_budget_across_batches(spark, corpus, tmpdir_path):
    from image_search_indexing_spark.frontier.extract import extract_refs
    from image_search_indexing_spark.streaming.politeness import run_streaming_budget

    src = f"{tmpdir_path}/sp_src"
    # 4 files + maxFilesPerTrigger=1 → 4 micro-batches
    corpus["docs"].join(corpus["meta"], "doc_id").repartition(4).write.mode(
        "overwrite"
    ).parquet(src)

    budget = 3
    got = run_streaming_budget(spark, src, budget=budget, query_name="t_budget_live")
    rows = got.collect()
    assert rows, "stream emitted nothing"

    per_host: dict[str, list[int]] = {}
    for r in rows:
        per_host.setdefault(r["host"], []).append(r["queue_pos"])
    for h, qs in per_host.items():
        assert len(qs) <= budget, (h, qs)
        # cumulative 1-based positions, contiguous across micro-batches
        assert sorted(qs) == list(range(1, len(qs) + 1)), (h, qs)

    # every host with >= budget distinct URLs must have hit the cap exactly
    refs = extract_refs(corpus["docs"], corpus["meta"], features="frontier").where(
        F.col("drop_reason").isNull()
    )
    distinct_per_host = {
        r["host"]: r["n"]
        for r in refs.groupBy("host")
        .agg(F.countDistinct("url_hash").alias("n"))
        .collect()
    }
    capped = [h for h, n in distinct_per_host.items() if n >= budget]
    assert capped, "corpus should contain hosts with enough candidates"
    for h in capped:
        assert len(per_host.get(h, [])) == budget, h
