"""JSONL sink goldens: byte-equal output with pinned field order.

Reference pattern: ``FullPipelineTest.java:84-105`` string-compares the
final JSONL against a checked-in golden whose key order is fixed by the
Gson serializer (``MultiPageImageDataSerializer.java:26-76``). Here the
golden is checked in under ``tests/golden/`` and the comparison is sorted
line-by-line, so it is partition-count invariant (the reference used one
reducer instead). Regenerate with ``python tools/gen_jsonl_golden.py``
after an intentional output-contract change.
"""

import os

import pytest

GOLD_DIR = os.path.join(os.path.dirname(__file__), "golden")
SF = "/root/testdata/sf0.001"


def _gold(name: str) -> list[str]:
    with open(os.path.join(GOLD_DIR, name)) as f:
        return f.read().splitlines()


def test_compact_jsonl_golden(spark):
    from image_search_indexing_spark.plans.indexer import indexer_compact, jsonl_lines

    got = jsonl_lines(indexer_compact(spark, SF))
    assert got == _gold("indexer_compact_sf0001.jsonl")


def test_full_jsonl_golden(spark):
    from image_search_indexing_spark.plans.indexer import indexer_full, jsonl_lines

    got = jsonl_lines(indexer_full(spark, SF))
    assert got == _gold("indexer_full_sf0001.jsonl")


def test_jsonl_partition_count_invariant(spark):
    """Same bytes regardless of how the plan was partitioned."""
    from image_search_indexing_spark.plans.indexer import indexer_compact, jsonl_lines

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        got = jsonl_lines(indexer_compact(spark, SF).repartition(5))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert got == _gold("indexer_compact_sf0001.jsonl")


def test_to_jsonl_field_order_pinned(spark, tmpdir_path):
    """The written file's key order follows the requested field order, not
    the plan's column order."""
    import json

    from image_search_indexing_spark.plans.indexer import to_jsonl

    df = spark.createDataFrame([(1, "x")], "a int, b string")
    to_jsonl(df, f"{tmpdir_path}/out", field_order=["b", "a"])
    lines = []
    for fn in os.listdir(f"{tmpdir_path}/out"):
        if fn.startswith("part-"):
            lines += open(f"{tmpdir_path}/out/{fn}").read().splitlines()
    assert lines == ['{"b":"x","a":1}']
    assert list(json.loads(lines[0])) == ["b", "a"]
