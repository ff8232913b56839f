"""Regenerate the JSONL sink goldens under tests/golden/.

Run after an INTENTIONAL output-contract change (new fields, changed
field order), review the diff, and commit the new goldens alongside the
change — the same workflow as the reference's golden JSONL files.
"""

import os
import sys

sys.path.insert(0, ".")

from image_search_indexing_spark.plans.indexer import (  # noqa: E402
    indexer_compact,
    indexer_full,
    jsonl_lines,
)
from image_search_indexing_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"
GOLD_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "golden")


def main() -> None:
    os.makedirs(GOLD_DIR, exist_ok=True)
    spark = get_spark(master="local[8]")
    for name, df in (
        ("indexer_compact_sf0001.jsonl", indexer_compact(spark, SF)),
        ("indexer_full_sf0001.jsonl", indexer_full(spark, SF)),
    ):
        lines = jsonl_lines(df)
        with open(os.path.join(GOLD_DIR, name), "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"{name}: {len(lines)} lines")
    spark.stop()


if __name__ == "__main__":
    main()
