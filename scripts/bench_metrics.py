"""Shared instrumentation for the round-5 bench legs: peak JVM memory
and per-stage shuffle/spill/task-time metrics, all from public local
surfaces (the /proc filesystem and Spark's own loopback REST API — no
external services).

Requires the session be built with ``spark.ui.enabled=true`` (the repo
default is false; bench scripts opt in via ``extra_conf``).
"""

from __future__ import annotations

import glob
import json
import os
import urllib.request


def jvm_peak_rss_mb() -> int | None:
    """Peak resident set size (VmHWM) of the local-mode Spark JVM —
    the single-process stand-in for 'peak executor memory'. Scans
    /proc for the java child running this session's gateway."""
    best = None
    for status in glob.glob("/proc/[0-9]*/status"):
        pid = status.split("/")[2]
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read()
            if b"java" not in cmd.split(b"\x00")[0]:
                continue
            if b"pyspark" not in cmd and b"spark" not in cmd:
                continue
            with open(status) as f:
                for line in f:
                    if line.startswith("VmHWM:"):
                        kb = int(line.split()[1])
                        best = max(best or 0, kb // 1024)
        except (OSError, ValueError):
            continue
    return best


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}{path}", timeout=30) as r:
        return json.loads(r.read())


def stage_totals(spark) -> dict:
    """Sum spill/shuffle bytes over every completed stage so far."""
    t = {"memory_spill_mb": 0, "disk_spill_mb": 0,
         "shuffle_write_mb": 0, "shuffle_read_mb": 0, "n_stages": 0}
    for s in _api(spark, "/stages?status=COMPLETE"):
        t["memory_spill_mb"] += s.get("memoryBytesSpilled", 0) // 2**20
        t["disk_spill_mb"] += s.get("diskBytesSpilled", 0) // 2**20
        t["shuffle_write_mb"] += s.get("shuffleWriteBytes", 0) // 2**20
        t["shuffle_read_mb"] += s.get("shuffleReadBytes", 0) // 2**20
        t["n_stages"] += 1
    return t


def straggler_profile(spark, min_tasks: int = 8,
                      min_stage_ms: int = 500) -> list[dict]:
    """Per-stage task-time skew: (median, max, max/median) of
    executorRunTime over each completed stage with enough tasks to make
    a ratio meaningful. The north-rule skew claim is exactly
    'max-task/median-task < 3 on the adversarial corpus'."""
    out = []
    for s in _api(spark, "/stages?status=COMPLETE"):
        sid, att = s["stageId"], s["attemptId"]
        if s.get("numCompleteTasks", 0) < min_tasks:
            continue
        try:
            q = _api(spark, f"/stages/{sid}/{att}/taskSummary"
                            "?quantiles=0.5,1.0")
        except Exception:
            continue
        med, mx = q["executorRunTime"]
        if mx < min_stage_ms:
            continue
        out.append({
            "stage": sid, "name": s.get("name", "")[:60],
            "tasks": s["numCompleteTasks"],
            "task_ms_median": int(med), "task_ms_max": int(mx),
            "max_over_median": round(mx / med, 2) if med else None,
        })
    return out


def dump(path: str, obj) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=1)
    print(json.dumps(obj))
