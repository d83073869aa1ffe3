"""Watermarked stream-stream interval join (streaming/joins.py):
cross-micro-batch state, batch equivalence, and late-row dropping."""

from __future__ import annotations

import time
from datetime import datetime

from pyspark.sql import functions as F

from otd_semantic_framework_spark.streaming.joins import (
    run_interval_join, stage_time_ordered)

_SCHEMA = ("event_id bigint, ts timestamp, user_id bigint, "
           "event_type string, value double, props string")


def _ev(i, h, m, user, etype, value=1.0):
    return (i, datetime(2024, 1, 1, h, m), user, etype, value, "{}")


def _run(spark, tmp_path, src_name="src"):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / src_name)
    return lambda: run_interval_join(
        spark, src, spark.createDataFrame([], _SCHEMA).schema,
        left_filter="event_type = 'signup'",
        right_filter="event_type = 'purchase'",
        key="user_id", out=out, ckpt=ckpt,
        window="1 hour", delay="2 hours")


def test_match_across_micro_batch_boundary(spark, tmp_path):
    """A signup in one staged file matched by a purchase in a LATER
    file: join state must survive across micro-batches (4 files ×
    maxFilesPerTrigger=1 → 4 batches). Events span 4 hours so each
    staged file covers ~1 hour."""
    rows = [
        _ev(0, 0, 5, 1, "signup"),            # bucket 0
        _ev(1, 0, 50, 2, "signup"),           # bucket 0, near boundary
        _ev(2, 1, 20, 2, "purchase", 7.0),    # bucket 1 — CROSS-BATCH match
        _ev(3, 1, 30, 1, "purchase", 9.0),    # >1h after u1 signup: no match
        _ev(4, 2, 10, 3, "signup"),           # bucket 2
        _ev(5, 2, 40, 3, "purchase", 5.0),    # bucket 2 — in-batch match
        _ev(6, 3, 50, 4, "purchase", 2.0),    # purchase w/o signup
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    stage_time_ordered(df, str(tmp_path / "src"), "ts", n_files=4)
    got = {(r.l_user_id, r.r_ts.minute, r.value)
           for r in _run(spark, tmp_path)().collect()}
    assert got == {(2, 20, 7.0), (3, 40, 5.0)}


def test_streaming_equals_batch_interval_join(spark, tmp_path):
    """On a time-ordered staged feed the drained streaming result must
    equal the batch interval join row for row."""
    rows = []
    for i in range(26):  # every 9 min over ~4 h; same user every 36 min
        h, m = (9 * i) // 60, (9 * i) % 60
        user = i % 4
        etype = ["signup", "purchase", "purchase"][i % 3]
        rows.append(_ev(i, h, m, user, etype, float(i)))
    df = spark.createDataFrame(rows, _SCHEMA)
    stage_time_ordered(df, str(tmp_path / "src"), "ts", n_files=4)
    streamed = {(r.l_user_id, r.l_ts, r.r_ts, r.value)
                for r in _run(spark, tmp_path)().collect()}
    s = df.filter("event_type = 'signup'").select(
        F.col("user_id").alias("l_user_id"), F.col("ts").alias("l_ts"))
    p = df.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("r_user_id"), F.col("ts").alias("r_ts"),
        "value")
    batch = {(r.l_user_id, r.l_ts, r.r_ts, r.value) for r in
             s.join(p, F.expr(
                 "l_user_id = r_user_id AND r_ts >= l_ts "
                 "AND r_ts <= l_ts + INTERVAL 1 HOUR")).collect()}
    assert streamed == batch
    assert len(batch) > 0  # corpus actually exercises the join


def test_out_of_order_row_behind_watermark_is_dropped(spark, tmp_path):
    """A purchase replayed hours out of order arrives behind the 2-hour
    watermark (advanced by file 1's 09:5x events) AND its signup's join
    state has been expired — the streaming answer excludes the pair a
    batch join would emit. This is watermark semantics doing its job:
    bounded state in exchange for declared-late data."""
    f1 = spark.createDataFrame([
        _ev(0, 0, 0, 1, "signup"),
        _ev(1, 9, 50, 9, "signup"),
        _ev(2, 9, 55, 9, "purchase", 3.0),   # in-batch match, advances wm
    ], _SCHEMA)
    # watermark eviction lags one batch: f2 is a carrier batch during
    # which the 07:50 watermark (from f1) evicts u1's signup state
    f2 = spark.createDataFrame([
        _ev(3, 10, 0, 8, "signup"),
        _ev(4, 10, 1, 8, "purchase", 4.0),
    ], _SCHEMA)
    f3 = spark.createDataFrame([
        _ev(5, 0, 30, 1, "purchase", 8.0),   # LATE: behind watermark
    ], _SCHEMA)
    src = tmp_path / "src"
    for f in (f1, f2, f3):
        f.coalesce(1).sortWithinPartitions("ts") \
         .write.mode("append").parquet(str(src))
        time.sleep(0.05)
    got = {(r.l_user_id, r.value) for r in _run(spark, tmp_path)().collect()}
    assert got == {(9, 3.0), (8, 4.0)}  # the late (1, 8.0) pair is dropped


def test_empty_join_returns_typed_empty(spark, tmp_path):
    df = spark.createDataFrame(
        [_ev(0, 0, 0, 1, "click"), _ev(1, 1, 0, 2, "view")], _SCHEMA)
    stage_time_ordered(df, str(tmp_path / "src"), "ts", n_files=2)
    out = _run(spark, tmp_path)()
    assert out.count() == 0
    assert set(out.columns) == {"l_user_id", "l_ts", "r_user_id", "r_ts",
                                "value"}


def test_redrain_with_same_checkpoint_is_exactly_once(spark, tmp_path):
    """Draining again against the same checkpoint re-processes nothing:
    the sink output is unchanged (exactly-once under availableNow +
    checkpointLocation), and new files appended AFTER the first drain
    are picked up exactly once."""
    rows = [
        _ev(0, 0, 5, 1, "signup"),
        _ev(1, 0, 30, 1, "purchase", 7.0),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    stage_time_ordered(df, str(tmp_path / "src"), "ts", n_files=2)
    run = _run(spark, tmp_path)
    first = sorted((r.l_user_id, r.value) for r in run().collect())
    assert first == [(1, 7.0)]
    second = sorted((r.l_user_id, r.value) for r in run().collect())
    assert second == first  # no reprocessing, no duplicates
    # append a new file: only IT is processed on the next drain
    extra = spark.createDataFrame([
        _ev(2, 1, 0, 2, "signup"),
        _ev(3, 1, 20, 2, "purchase", 4.0),
    ], _SCHEMA)
    extra.coalesce(1).sortWithinPartitions("ts") \
         .write.mode("append").parquet(str(tmp_path / "src"))
    third = sorted((r.l_user_id, r.value) for r in run().collect())
    assert third == [(1, 7.0), (2, 4.0)]
