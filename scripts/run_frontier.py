"""spark-submit entrypoint for the frontier crawl.

Usage (local two-size evidence, per BASELINE.md):

    cd /root/repo && zip -qr /tmp/isis.zip image_search_indexing_spark
    spark-submit --master local[8]  --py-files /tmp/isis.zip \
        scripts/run_frontier.py --docs 200000 --rounds 2 --workdir /tmp/crawl8
    spark-submit --master local[32] --py-files /tmp/isis.zip \
        scripts/run_frontier.py --docs 200000 --rounds 2 --workdir /tmp/crawl32

On a real cluster the same invocation takes --master yarn/k8s and the
corpus/workdir move to HDFS/S3/Iceberg paths; the driver code is unchanged.
Prints one JSON line with counters + throughput; rerunning with the same
--workdir resumes after the last committed snapshot.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--corpus", default=None, help="existing corpus dir (else generated)")
    ap.add_argument("--budget", type=int, default=1 << 30)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument(
        "--invalidate",
        default=None,
        help="path to a parquet/text table of url_hash values to mark "
        "no-longer-seen (re-crawl invalidation) before running rounds",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from image_search_indexing_spark.frontier.datagen import GenConfig, write_corpus
    from image_search_indexing_spark.frontier.rounds import FrontierConfig, FrontierDriver

    # spark-submit owns master/conf; only fill engine-required defaults
    spark = SparkSession.builder.appName("frontier-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.files.maxPartitionBytes": "16m",
    }.items():
        spark.conf.set(k, v)

    corpus = args.corpus
    if corpus is None:
        corpus = f"{args.workdir}-corpus"
        write_corpus(spark, GenConfig(n_docs=args.docs, n_hosts=2000), corpus)

    docs = spark.read.parquet(f"{corpus}/documents.parquet")
    meta = spark.read.parquet(f"{corpus}/docmeta.parquet")
    seeds = spark.read.parquet(f"{corpus}/seeds.parquet")
    robots = spark.read.parquet(f"{corpus}/robots.parquet")

    drv = FrontierDriver(
        spark,
        args.workdir,
        FrontierConfig(
            n_rounds=args.rounds, n_buckets=args.buckets, default_budget=args.budget
        ),
    )
    if args.invalidate:
        if args.invalidate.endswith(".txt"):
            inv = spark.read.text(args.invalidate).withColumnRenamed("value", "url_hash")
        else:
            inv = spark.read.parquet(args.invalidate)
        print(json.dumps({"invalidate": drv.invalidate(inv)}))

    t0 = time.time()
    counters = drv.run(docs, meta, seeds, None, robots, n_rounds=args.rounds)
    dt = time.time() - t0
    scheduled = sum(c["scheduled"] for c in counters)
    print(
        json.dumps(
            {
                "rounds_run": len(counters),
                "scheduled": scheduled,
                "seconds": round(dt, 2),
                "urls_per_sec": round(scheduled / dt, 1) if dt > 0 else None,
                "counters": counters,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
