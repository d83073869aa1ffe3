"""Corpus-size scale sweep of the headline KG pipeline: run
build_triples_fast on generated corpora of increasing size at the same
parallelism and report throughput at each — the evidence that
triples/sec HOLDS as data grows (a linear-scan pipeline; throughput
sagging with corpus size would reveal a hidden super-linear stage).

Usage: python scripts/scale_sweep.py [n_convs ...]   (default 360k/1.44M/5.76M
≈ 4M/16M/64M turns). Prints one JSON line per size plus a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from otd_semantic_framework_spark.session import get_spark  # noqa: E402

SIZES = [int(x) for x in sys.argv[1:]] or [360000, 1440000, 5760000]


def main() -> None:
    from otd_semantic_framework_spark.plans.pipeline import build_triples_fast
    from otd_semantic_framework_spark.sources.fixtures import transcripts_spark

    results = []
    for n_convs in SIZES:
        path = f"/tmp/bench_transcripts_{n_convs}.parquet"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            spark = get_spark("sweep-gen", master="local[32]")
            transcripts_spark(spark, n_convs).write.mode("overwrite") \
                .parquet(path)
            spark.stop()
        spark = get_spark("sweep", master="local[32]")
        try:
            transcripts = spark.read.parquet(path)
            n_turns = transcripts.count()  # warm scan
            out = f"/tmp/sweep_triples_{n_convs}"
            walls = []
            for _ in range(3):
                t0 = time.time()
                build_triples_fast(spark, transcripts) \
                    .write.mode("overwrite").parquet(out)
                walls.append(time.time() - t0)
            wall = min(walls)
            n_triples = spark.read.parquet(out).count()
            r = {"n_convs": n_convs, "turns": n_turns,
                 "triples": n_triples, "sec": round(wall, 2),
                 "all_runs_sec": [round(w, 2) for w in walls],
                 "triples_per_sec": round(n_triples / wall, 1),
                 "turns_per_sec": round(n_turns / wall, 1)}
            print(json.dumps(r), flush=True)
            results.append(r)
        finally:
            spark.stop()
    if len(results) >= 2:
        base = results[0]["turns_per_sec"]
        print(json.dumps({
            "sweep": [(r["turns"], r["turns_per_sec"]) for r in results],
            "throughput_vs_smallest": [
                round(r["turns_per_sec"] / base, 3) for r in results],
        }), flush=True)


if __name__ == "__main__":
    main()
