"""Extra benchmarks for optimization work (guide §1) — NOT the frozen bench.

Times individual declared queries in isolation, with either the bench's
`.count()` methodology (comparable to bench.py numbers) or the noop sink
(guide §1.4: computes every column, so projection pruning can't hide work).
Optionally dumps `.explain("formatted")` per query to a directory.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--noop] [--plan-dir DIR] q1 q2 ...

Env: SPARK_GRAFT_CPUS (master local[N], default 32).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true", help="noop sink instead of .count()")
    ap.add_argument("--plan-dir", default=None, help="dump explain('formatted') per query here")
    args = ap.parse_args()

    import __spark_entry__ as E
    from image_search_indexing_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(16, cpus))
    qs = E.queries()
    results = {}
    for name in args.queries:
        fn = qs[name]
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, args.sf).explain("formatted")
            with open(os.path.join(args.plan_dir, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        times = []
        n = None
        for _ in range(args.reps):
            df = fn(spark, args.sf)
            t0 = time.time()
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                n = df.count()
            times.append(round(time.time() - t0, 3))
        results[name] = min(times)
        print(f"{name}: min={min(times)}s of {times} rows={n}", flush=True)
    print("TOTAL(min):", round(sum(results.values()), 3))


if __name__ == "__main__":
    main()
