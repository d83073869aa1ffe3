"""spark-submit entry point (north rule: "runs via spark-submit
--py-files on multi-executor clusters").

Usage:
  # package the engine
  python scripts/package_pyfiles.py                 # -> dist/otd_spark.zip
  # run (cluster: --master yarn/k8s + real executor confs)
  spark-submit --master local[8] \
      --py-files dist/otd_spark.zip \
      scripts/submit_pipeline.py \
      --input /path/to/transcripts.parquet \
      --run-dir /tmp/otd_run --mode fast

The script only uses SparkSession.builder.getOrCreate() so all
master/executor configuration comes from spark-submit, as on a real
cluster.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=False,
                    help="transcripts parquet path (omit with --gen-convs)")
    ap.add_argument("--gen-convs", type=int, default=0,
                    help="generate a corpus of N conversations instead of reading --input")
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--mode", choices=["fast", "checkpointed"], default="fast")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("otd-kg-submit").getOrCreate()

    from otd_semantic_framework_spark.plans.pipeline import (
        build_triples_fast, run_pipeline)
    from otd_semantic_framework_spark.sources.fixtures import transcripts_spark

    if args.gen_convs:
        transcripts = transcripts_spark(spark, args.gen_convs)
    else:
        transcripts = spark.read.parquet(args.input)

    t0 = time.time()
    if args.mode == "fast":
        triples = build_triples_fast(spark, transcripts)
        triples.write.mode("overwrite").parquet(f"{args.run_dir}/triples.parquet")
        n = spark.read.parquet(f"{args.run_dir}/triples.parquet").count()
    else:
        res = run_pipeline(spark, transcripts, args.run_dir)
        n = res.triples.count()
    print(json.dumps({"triples": n, "sec": round(time.time() - t0, 2),
                      "mode": args.mode}))
    spark.stop()


if __name__ == "__main__":
    main()
