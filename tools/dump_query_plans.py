"""Dump `.explain("formatted")` for named declared queries into a directory.

Usage: python tools/dump_query_plans.py OUTDIR [--sf DIR] [--suffix _before] q1 q2 ...
With no query names: all queries().
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()

    import __spark_entry__ as E
    from image_search_indexing_spark.session import get_spark

    spark = get_spark(app_name="dump-plans", master="local[8]", shuffle_partitions=16)
    qs = E.queries()
    names = args.queries or list(qs)
    os.makedirs(args.outdir, exist_ok=True)
    for name in names:
        try:
            buf = io.StringIO()
            with redirect_stdout(buf):
                qs[name](spark, args.sf).explain("formatted")
            plan = buf.getvalue()
            with open(os.path.join(args.outdir, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
            ex = plan.count("Exchange") - plan.count("ReusedExchange")
            print(f"{name}: exchanges~{ex} batchEvalPython={plan.count('BatchEvalPython')}",
                  flush=True)
        except Exception as e:  # keep going — a single bad query shouldn't kill the dump
            print(f"{name}: FAILED {e}", flush=True)


if __name__ == "__main__":
    main()
