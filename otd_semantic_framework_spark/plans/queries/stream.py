"""Driver queries: `stream` domain (part 1).

Generated from plans/driver_queries.py by scripts/split_driver_queries.py
(round 5); original source order preserved. Do not edit the monolith
back into existence — edit here.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


from ._shared import *  # noqa: F401,F403

__all__ = [
    "q_stream_sessionize",
    "SQL_STREAM_SESSIONIZE",
    "q_stream_join",
    "SQL_STREAM_JOIN",
    "q_stream_triples",
    "q_stream_dedup",
    "SQL_STREAM_DEDUP",
    "q_stream_attrition",
    "q_stream_upsert",
    "SQL_STREAM_UPSERT",
    "q_stream_topk",
    "SQL_STREAM_TOPK",
    "q_stream_cds",
    "q_stream_late_audit",
    "_sql_stream_late_audit",
    "q_stream_stateful_counts",
    "_sql_stream_stateful_counts",
    "q_stream_scd2",
]


def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization of the events table (30-min gap
    session_window, streaming/sessions.py semantics): maxFilesPerTrigger
    forces multiple micro-batches so session state genuinely merges
    across triggers; complete-mode foreachBatch overwrites the result
    table each trigger (no watermark needed, nothing dropped — the
    availableNow drain ends with the exact batch answer)."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    sfx = f"{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}"
    out = _os.path.join(_tempfile.gettempdir(), f"stream_sess_{sfx}.parquet")
    ckpt = _os.path.join(_tempfile.gettempdir(), f"stream_sess_{sfx}_ckpt")
    src = _os.path.join(_tempfile.gettempdir(), f"stream_sess_{sfx}_src")
    for d in (out, ckpt, src):
        _shutil.rmtree(d, ignore_errors=True)
    # stage the single-file testdata table as a 4-file directory: the
    # file stream source requires a directory, and 4 files ×
    # maxFilesPerTrigger=1 forces 4 micro-batches, so session state
    # genuinely merges across triggers
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.repartition(4).write.parquet(src)
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src))
    sess = (stream
            .groupBy(F.session_window("ts", "30 minutes").alias("w"),
                     F.col("user_id"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("ts").alias("first_ts"),
                 F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
                 .alias("cents")))

    def _write(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out)

    q = (sess.writeStream.outputMode("complete").foreachBatch(_write)
         .trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination()
    spark.catalog.refreshByPath(out)
    return (spark.read.parquet(out).select(
        "user_id",
        F.unix_micros(F.col("first_ts").cast("timestamp"))
        .alias("session_start_us"),
        "n_events",
        F.round(F.col("cents") / 100.0, 4).alias("session_value")))


SQL_STREAM_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, ts, CAST(round(value * 100, 0) AS BIGINT) AS cents,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts, cents,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, epoch_us(min(ts)) AS session_start_us,
       count(*) AS n_events, round(sum(cents) / 100.0, 4) AS session_value
FROM sessions GROUP BY user_id, session_id
"""


def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (streaming/joins.py):
    signup events joined to purchase events of the same user within
    1 hour, both streams watermarked 2 hours. The events table is
    staged as 4 contiguous time-range files replayed oldest-first
    (stage_time_ordered), so nothing is ever behind the watermark and
    the drained append-mode result equals the batch interval join the
    DuckDB oracle runs — while join state is genuinely created in one
    micro-batch and matched in later ones."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from ...streaming.joins import run_interval_join, stage_time_ordered
    sfx = f"{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}"
    base = _os.path.join(_tempfile.gettempdir(), f"stream_join_{sfx}")
    out, ckpt, src = base + "_out", base + "_ckpt", base + "_src"
    for d in (out, ckpt, src):
        _shutil.rmtree(d, ignore_errors=True)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    stage_time_ordered(events, src, "ts", n_files=4)
    res = run_interval_join(
        spark, src, events.schema,
        left_filter="event_type = 'signup'",
        right_filter="event_type = 'purchase'",
        key="user_id", out=out, ckpt=ckpt,
        window="1 hour", delay="2 hours")
    return res.select(
        F.col("l_user_id").alias("user_id"),
        F.unix_micros(F.col("l_ts").cast("timestamp")).alias("signup_ts_us"),
        F.unix_micros(F.col("r_ts").cast("timestamp")).alias("purchase_ts_us"),
        F.round("value", 6).alias("purchase_value"))


SQL_STREAM_JOIN = """
SELECT a.user_id,
       epoch_us(a.ts) AS signup_ts_us,
       epoch_us(b.ts) AS purchase_ts_us,
       round(b.value, 6) AS purchase_value
FROM events a JOIN events b ON a.user_id = b.user_id
WHERE a.event_type = 'signup' AND b.event_type = 'purchase'
  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
"""


# ---------------------------------------------------------------------------
# File-based DCAT catalog ingest (VERDICT r2 "What's missing #2" — the
# reference's CKAN dataset/ module at the file level). The DuckDB
# oracle replays the ingest with read_json over the same fixture.
# ---------------------------------------------------------------------------

def q_stream_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming INCREMENTAL KG construction: the derived transcript
    table staged as a 4-file directory hash-partitioned by conv_id
    (conversation-atomic micro-batches), drained availableNow with
    maxFilesPerTrigger=1 so four genuine triggers each run the fused
    build_triples_fast on their batch and APPEND to the triple sink.
    Because triple extraction is conversation-local (mentions/tools per
    turn, replies within a conv) and the fused detector dedups per
    turn, the appended union over conv-atomic batches equals the batch
    run row-for-row — verified against the SAME DuckDB oracle as
    kg_fast_pipeline. This is the P15/P16 growth path at 100 TB: new
    conversation slices stream in; nothing is recomputed."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    from ..pipeline import build_triples_fast
    sfx = f"{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}"
    out = _os.path.join(_tempfile.gettempdir(), f"stream_tri_{sfx}.parquet")
    ckpt = _os.path.join(_tempfile.gettempdir(), f"stream_tri_{sfx}_ckpt")
    src = _os.path.join(_tempfile.gettempdir(), f"stream_tri_{sfx}_src")
    for d in (out, ckpt, src):
        _shutil.rmtree(d, ignore_errors=True)
    t = derived_transcripts(spark, sf_dir).withColumn(
        "ts", F.lit(None).cast("timestamp"))
    t.repartition(4, "conv_id").write.parquet(src)
    stream = (spark.readStream.schema(t.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))

    def _extract(batch_df: DataFrame, _batch_id: int) -> None:
        build_triples_fast(spark, batch_df, ontology_pdf=_fast_onto_pdf()
                           ).write.mode("append").parquet(out)

    q = (stream.writeStream.outputMode("append").foreachBatch(_extract)
         .trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination()
    spark.catalog.refreshByPath(out)
    return spark.read.parquet(out).select(
        "subj", "pred", "obj", "conv_id", "turn_idx", "score")


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming stateful exact dedup: dropDuplicates over a 4-file
    file-stream (maxFilesPerTrigger=1 forces 4 micro-batches, so the
    dedup state genuinely carries keys ACROSS triggers — a key first
    seen in batch 0 suppresses its duplicates in batch 3). Append-mode
    foreachBatch accumulates exactly one row per distinct text hash;
    only the key column is emitted, so the result is deterministic
    regardless of which physical row won the race within a batch."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    # staging keyed by sf AND pid: two concurrent harness runs against
    # the same sf must not rmtree each other's checkpoint mid-stream
    sfx = f"{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}"
    out = _os.path.join(_tempfile.gettempdir(), f"stream_dedup_{sfx}.parquet")
    ckpt = _os.path.join(_tempfile.gettempdir(), f"stream_dedup_{sfx}_ckpt")
    src = _os.path.join(_tempfile.gettempdir(), f"stream_dedup_{sfx}_src")
    for d in (out, ckpt, src):
        _shutil.rmtree(d, ignore_errors=True)
    docs = _docs(spark, sf_dir)
    docs.repartition(4).write.parquet(src)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src))
    deduped = (stream
               .select(F.md5(F.coalesce(F.col("text"), F.lit("")))
                       .alias("text_hash"))
               .dropDuplicates(["text_hash"]))

    def _write(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out)

    q = (deduped.writeStream.outputMode("append").foreachBatch(_write)
         .trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination()
    spark.catalog.refreshByPath(out)
    return spark.read.parquet(out)


SQL_STREAM_DEDUP = """
SELECT DISTINCT md5(coalesce(text, '')) AS text_hash FROM documents
"""


def q_stream_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming curation-quality monitor: the filter-attrition funnel
    maintained incrementally over a document file-stream (4 forced
    micro-batches). Each foreachBatch computes the batch's first-fail
    counts (operators/curation.py:attrition_counts — per-document
    attribution is batch-local, so partial counts are exactly additive)
    and appends the one-row delta to a sink; the drained deltas sum to
    the whole-corpus counts and feed the same report builder as the
    batch operator — so streaming ≡ batch is not just pinned in pytest,
    it is what the oracle pairing itself verifies (same SQL as
    curation_attrition)."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    from ...operators.curation import (attrition_counts, attrition_report)
    sfx = f"{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}"
    out = _os.path.join(_tempfile.gettempdir(),
                        f"stream_attr_{sfx}.parquet")
    ckpt = _os.path.join(_tempfile.gettempdir(), f"stream_attr_{sfx}_ckpt")
    src = _os.path.join(_tempfile.gettempdir(), f"stream_attr_{sfx}_src")
    for d in (out, ckpt, src):
        _shutil.rmtree(d, ignore_errors=True)
    docs = _docs(spark, sf_dir)
    docs.repartition(4).write.parquet(src)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src))

    def _write(batch_df: DataFrame, _batch_id: int) -> None:
        (attrition_counts(batch_df,
                          min_tokens=ATTRITION_MIN_TOKENS,
                          allowed_lang=ATTRITION_LANG,
                          max_tok_share_ppm=ATTRITION_MAX_TOK_SHARE_PPM,
                          min_ttr_ppm=ATTRITION_MIN_TTR_PPM)
         .write.mode("append").parquet(out))

    q = (stream.writeStream.outputMode("append").foreachBatch(_write)
         .trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination()
    spark.catalog.refreshByPath(out)
    deltas = spark.read.parquet(out)
    total = deltas.agg(*[F.sum(c).alias(c)
                         for c in ("n0", "d1", "d2", "d3", "d4")])
    return attrition_report(total)


def q_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC upsert: four update batches (batch b carries a new
    version ver=b of every document with doc_id % 4 >= b) drain through
    foreachBatch into the storage adapter's generic last-writer-wins
    MERGE (sources/storage.py:upsert_latest — real MERGE INTO on
    Iceberg, union + per-key argmax + crash-safe staged swap on
    parquet). The winner is decided by the version COLUMN, not arrival
    order, so the drained table is deterministic whatever order the
    files trigger in: doc residue r saw versions 0..r, hence its final
    row is ver = doc_id % 4. The oracle states exactly that closed
    form — pairing pins MERGE semantics end-to-end through a real
    stream."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    from ...sources.storage import Storage
    sfx = f"{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}"
    root = _os.path.join(_tempfile.gettempdir(), f"stream_ups_{sfx}")
    ckpt = _os.path.join(root, "ckpt")
    src = _os.path.join(root, "src")
    tbl = _os.path.join(root, "tables")
    _shutil.rmtree(root, ignore_errors=True)
    _os.makedirs(src)
    _os.makedirs(tbl)
    docs = _docs(spark, sf_dir)
    for b in range(4):
        batch = (docs.where(F.col("doc_id") % 4 >= b)
                 .select("doc_id", F.lit(b).cast("long").alias("ver"),
                         (F.col("n_chars") + b).cast("long").alias("val")))
        stage = _os.path.join(root, f"stage_{b}")
        batch.coalesce(1).write.parquet(stage)
        part = next(f for f in _os.listdir(stage)
                    if f.endswith(".parquet"))
        _os.rename(_os.path.join(stage, part),
                   _os.path.join(src, f"b{b}.parquet"))
    schema = "doc_id long, ver long, val long"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    st = Storage(tbl)

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        st.upsert_latest(spark, "docs_current", batch_df,
                         key_cols=["doc_id"], ver_col="ver")

    q = (stream.writeStream.outputMode("update").foreachBatch(_merge)
         .trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination()
    return st.read_table(spark, "docs_current")


SQL_STREAM_UPSERT = """
SELECT doc_id,
       CAST(doc_id % 4 AS BIGINT) AS ver,
       CAST(n_chars + doc_id % 4 AS BIGINT) AS val
FROM documents
"""


def q_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming windowed top-k: hourly tumbling-window event-type
    counts maintained by a REAL stateful streaming aggregation (4
    forced micro-batches, complete-mode drain — window state genuinely
    merges across triggers), then the bounded per-window rank runs on
    the drained result. The oracle replays the batch equivalent, so
    the pairing pins streaming-window ≡ batch-groupBy semantics."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    sfx = f"{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}"
    out = _os.path.join(_tempfile.gettempdir(), f"stream_topk_{sfx}.parquet")
    ckpt = _os.path.join(_tempfile.gettempdir(), f"stream_topk_{sfx}_ckpt")
    src = _os.path.join(_tempfile.gettempdir(), f"stream_topk_{sfx}_src")
    for d in (out, ckpt, src):
        _shutil.rmtree(d, ignore_errors=True)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.repartition(4).write.parquet(src)
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src))
    counts = (stream
              .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
              .agg(F.count(F.lit(1)).alias("n")))

    def _write(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out)

    q = (counts.writeStream.outputMode("complete").foreachBatch(_write)
         .trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination()
    spark.catalog.refreshByPath(out)
    drained = spark.read.parquet(out).select(
        F.unix_micros(F.col("w.start").cast("timestamp")).alias("win_us"),
        "event_type", F.col("n").cast("long").alias("n"))
    w = Window.partitionBy("win_us").orderBy(F.desc("n"), F.asc("event_type"))
    return (drained.withColumn("rnk", F.row_number().over(w).cast("long"))
            .filter(F.col("rnk") <= STREAM_TOPK_K))


SQL_STREAM_TOPK = f"""
WITH c AS (
  SELECT date_trunc('hour', ts) AS w, event_type, count(*) AS n
  FROM events GROUP BY 1, 2),
r AS (
  SELECT epoch_us(w) AS win_us, event_type, CAST(n AS BIGINT) AS n,
         CAST(row_number() OVER (PARTITION BY w
                                 ORDER BY n DESC, event_type) AS BIGINT)
           AS rnk
  FROM c)
SELECT win_us, event_type, n, rnk FROM r WHERE rnk <= {STREAM_TOPK_K}
"""


# ---------------------------------------------------------------------------
# Wave 4: readability scoring, activity-streak islands, edit-distance
# near-dup, bounded BFS reachability, label-propagation communities.
# ---------------------------------------------------------------------------


def q_stream_late_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data accounting — the one streaming semantic no
    other pairing pins: WHICH rows a watermarked append-mode window
    aggregation loses, and why. Events are staged into 4 files
    (batch = event_id % 4, mtimes ordered so the file source replays
    them deterministically) and run through a REAL append-mode 1-hour
    window count with a 37-minute watermark; the drained output is
    joined against the batch ground truth per (window, event_type):
    total rows, rows the stream emitted, rows lost to lateness, and
    whether the window finalized at all.

    The oracle replays Spark's empirically-pinned two-watermark
    protocol exactly: eviction watermark of batch k = cummax event
    time over batches < k minus the delay (windows whose end <= it
    emit at the first such k, including a trailing empty batch the
    availableNow trigger always runs); the LATE-EVENT filter lags one
    batch (wm_late(k) = wm_evict(k-1)), so every row arriving at or
    before its window's emission batch is counted and every row after
    it is dropped — which makes the emitted count exactly "rows in
    batches <= emission batch". The 37-minute delay keeps watermarks
    off hour boundaries, so no <=-vs-< tie is ever exercised."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    sfx = f"{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}"
    base = _os.path.join(_tempfile.gettempdir(), f"stream_late_{sfx}")
    _shutil.rmtree(base, ignore_errors=True)
    src, ckpt, out = (f"{base}/src", f"{base}/ckpt", f"{base}/out")
    _os.makedirs(src)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    for k in range(STREAM_LATE_BATCHES):
        stage = f"{base}/stage{k}"
        (events.filter(F.col("event_id") % STREAM_LATE_BATCHES == k)
         .coalesce(1).write.parquet(stage))
        part = next(f for f in _os.listdir(stage)
                    if f.endswith(".parquet"))
        _os.rename(_os.path.join(stage, part), f"{src}/f{k}.parquet")
        _shutil.rmtree(stage)
        _os.utime(f"{src}/f{k}.parquet",
                  (1_700_000_000 + 10 * k,) * 2)
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(src)
              # parquet reads the column as TIMESTAMP_NTZ; watermarks
              # require an instant-typed event time
              .withColumn("ts", F.col("ts").cast("timestamp")))
    agg = (stream.withWatermark("ts", f"{STREAM_LATE_DELAY_MIN} minutes")
           .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
           .agg(F.count(F.lit(1)).alias("n")))

    def _write(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out)

    q = (agg.writeStream.outputMode("append").foreachBatch(_write)
         .trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination()
    spark.catalog.refreshByPath(out)
    emitted = (spark.read.parquet(out)
               .select(F.unix_micros(F.col("w.start").cast("timestamp"))
                       .alias("win_us"),
                       "event_type",
                       F.col("n").cast("long").alias("n_emitted")))
    totals = (events
              .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
              .agg(F.count(F.lit(1)).alias("n_total"))
              .select(F.unix_micros(F.col("w.start").cast("timestamp"))
                      .alias("win_us"),
                      "event_type",
                      F.col("n_total").cast("long").alias("n_total")))
    return (totals.join(emitted, ["win_us", "event_type"], "left")
            .select("win_us", "event_type", "n_total",
                    F.coalesce("n_emitted", F.lit(0)).cast("long")
                    .alias("n_emitted"),
                    (F.col("n_total") - F.coalesce("n_emitted", F.lit(0)))
                    .cast("long").alias("n_lost"),
                    F.col("n_emitted").isNotNull().alias("was_emitted")))


def _sql_stream_late_audit() -> str:
    nb = STREAM_LATE_BATCHES
    return f"""
WITH e AS (
  SELECT event_id % {nb} AS b, date_trunc('hour', ts) AS w,
         event_type, ts
  FROM events),
mx AS (SELECT b, max(ts) AS met FROM e GROUP BY b),
cm AS (SELECT b, max(met) OVER (ORDER BY b
                                ROWS UNBOUNDED PRECEDING) AS cmax
       FROM mx),
wm AS (
  SELECT t.k,
         (SELECT cmax FROM cm WHERE b = t.k - 1)
           - INTERVAL {STREAM_LATE_DELAY_MIN} MINUTE AS wm_evict
  FROM (SELECT unnest(range(1, {nb} + 1)) AS k) t),
emit AS (
  SELECT w, min(k) AS ek
  FROM (SELECT DISTINCT w FROM e) wins JOIN wm
    ON wins.w + INTERVAL 1 HOUR <= wm.wm_evict
  GROUP BY w),
tot AS (SELECT w, event_type, count(*) AS n_total FROM e GROUP BY 1, 2),
em AS (
  SELECT e.w, e.event_type, count(*) AS n_emitted
  FROM e JOIN emit USING (w) WHERE e.b <= emit.ek GROUP BY 1, 2)
SELECT epoch_us(t.w) AS win_us, t.event_type,
       CAST(t.n_total AS BIGINT) AS n_total,
       CAST(coalesce(em.n_emitted, 0) AS BIGINT) AS n_emitted,
       CAST(t.n_total - coalesce(em.n_emitted, 0) AS BIGINT) AS n_lost,
       em.n_emitted IS NOT NULL AS was_emitted
FROM tot t LEFT JOIN em ON em.w = t.w AND em.event_type = t.event_type
"""


# ---------------------------------------------------------------------------
# Wave 5: distribution-drift KS statistic, RAKE-lite keyphrase extraction.
# ---------------------------------------------------------------------------


def q_stream_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState driver pairing — the arbitrary-stateful
    streaming API's only oracle-checked query (running_conv_stats
    covers it in pytest; this pins it cross-engine). Per-user state
    (cumulative event count, cumulative integer cents) carried across
    4 deterministic micro-batches (batch = event_id % 4, mtime-ordered
    files); every batch APPENDS the updated running totals plus that
    batch's row count, so the drained table is the full state
    trajectory, not just the final value. The oracle replays each
    (user, batch) prefix sum in SQL; integer cents make the
    distributed sums merge-order-free. A 3650-day watermark delay
    keeps the late-row filter permanently inert (its two-watermark
    lag is stream_late_audit's subject, not this one's)."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    sfx = f"{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}"
    base = _os.path.join(_tempfile.gettempdir(), f"stream_state_{sfx}")
    _shutil.rmtree(base, ignore_errors=True)
    src, ckpt, out = f"{base}/src", f"{base}/ckpt", f"{base}/out"
    _os.makedirs(src)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    for k in range(STATEFUL_BATCHES):
        stage = f"{base}/stage{k}"
        (events.filter(F.col("event_id") % STATEFUL_BATCHES == k)
         .coalesce(1).write.parquet(stage))
        part = next(f for f in _os.listdir(stage)
                    if f.endswith(".parquet"))
        _os.rename(_os.path.join(stage, part), f"{src}/f{k}.parquet")
        _shutil.rmtree(stage)
        _os.utime(f"{src}/f{k}.parquet", (1_700_000_000 + 10 * k,) * 2)

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("cum_n", T.LongType()),
        T.StructField("cum_cents", T.LongType()),
        T.StructField("batch_rows", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("cum_n", T.LongType()),
        T.StructField("cum_cents", T.LongType()),
    ])

    def update(key, pdfs, state):
        (user_id,) = key
        n, cents = state.get if state.exists else (0, 0)
        batch_rows = 0
        for pdf in pdfs:
            batch_rows += len(pdf)
            # repo cents convention: round(value*100, 0) half-away —
            # values carry 2 decimals, so +0.5-floor is exact here
            cents += int((pdf["value"] * 100 + 0.5).astype("int64").sum())
        n += batch_rows
        state.update((n, cents))
        yield pd.DataFrame({"user_id": [user_id], "cum_n": [n],
                            "cum_cents": [cents],
                            "batch_rows": [batch_rows]})

    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(src)
              .withColumn("ts", F.col("ts").cast("timestamp")))
    result = (stream.withWatermark("ts", "3650 days")
              .groupBy("user_id")
              .applyInPandasWithState(update, out_schema, state_schema,
                                      "append",
                                      GroupStateTimeout.NoTimeout))

    def _write(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out)

    q = (result.writeStream.outputMode("append").foreachBatch(_write)
         .trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination()
    spark.catalog.refreshByPath(out)
    return (spark.read.parquet(out)
            .select(F.col("user_id").cast("long").alias("user_id"),
                    F.col("cum_n").cast("long").alias("cum_n"),
                    F.col("cum_cents").cast("long").alias("cum_cents"),
                    F.col("batch_rows").cast("long").alias("batch_rows")))


def _sql_stream_stateful_counts() -> str:
    nb = STATEFUL_BATCHES
    return f"""
WITH e AS (
  SELECT user_id, event_id % {nb} AS b,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events),
per AS (
  SELECT user_id, b, count(*) AS batch_rows, sum(cents) AS batch_cents
  FROM e GROUP BY 1, 2)
SELECT user_id,
       CAST(sum(batch_rows) OVER w AS BIGINT) AS cum_n,
       CAST(sum(batch_cents) OVER w AS BIGINT) AS cum_cents,
       CAST(batch_rows AS BIGINT) AS batch_rows
FROM per
WINDOW w AS (PARTITION BY user_id ORDER BY b ROWS UNBOUNDED PRECEDING)
"""


def q_stream_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming type-2 SCD maintenance — the warehouse-grade
    incremental-history pattern: the events change stream drains in
    four TIME-ORDERED micro-batches (day-of-month ranges), foreachBatch
    keeps only each batch's per-user CHANGE POINTS (lag-pruned — the
    state grows with type changes, never with raw event volume), and
    the final history assembles validity intervals over the pruned
    state. Batch-local pruning can never drop a global change point
    (each user's first event per batch is always kept; batches
    partition time, so every within-batch predecessor IS the global
    predecessor), so the drained history is row-identical to the batch
    operator — the oracle is literally rel_scd2's SQL over all events,
    pinning stream ≡ batch end-to-end through a real readStream.

    Shape: per batch one user-keyed lag window + an append; final
    assembly one user-keyed gaps-and-islands pass over the (small)
    change-point state."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    from ...operators.agentstats import scd2_history
    sfx = f"{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}"
    root = _os.path.join(_tempfile.gettempdir(), f"stream_scd2_{sfx}")
    ckpt = _os.path.join(root, "ckpt")
    src = _os.path.join(root, "src")
    state = _os.path.join(root, "state")
    _shutil.rmtree(root, ignore_errors=True)
    _os.makedirs(src)
    ev = _tbl(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id")
    for b, (lo, hi) in enumerate(((1, 8), (9, 15), (16, 22), (23, 31))):
        batch = ev.filter((F.dayofmonth("ts") >= lo)
                          & (F.dayofmonth("ts") <= hi))
        stage = _os.path.join(root, f"stage_{b}")
        batch.coalesce(1).write.parquet(stage)
        part = next(f for f in _os.listdir(stage)
                    if f.endswith(".parquet"))
        _os.rename(_os.path.join(stage, part),
                   _os.path.join(src, f"b{b}.parquet"))
    schema = ("user_id long, event_type string, ts timestamp, "
              "event_id long")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))

    def _fold(batch_df: DataFrame, _batch_id: int) -> None:
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        pruned = (batch_df
                  .withColumn("prev", F.lag("event_type").over(w))
                  .filter(F.col("prev").isNull()
                          | (F.col("prev") != F.col("event_type")))
                  .drop("prev"))
        pruned.write.mode("append").parquet(state)

    q = (stream.writeStream.outputMode("update").foreachBatch(_fold)
         .trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination()
    return scd2_history(spark.read.parquet(state),
                        key_col="user_id", attr_col="event_type",
                        ts_col="ts", tiebreak_col="event_id")


def q_stream_cds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDS maintenance (VERDICT r4 item 8): canonical
    mention→concept links staged as a 3-file stream (maxFilesPerTrigger=1
    → three genuine micro-batch triggers; the split key is turn_idx, so
    conversations deliberately SPAN batches), each trigger folded into a
    persistent (tag state, CDS table) pair via the IVM operator
    operators/cds.py:incremental_cds_update inside foreachBatch. After
    every trigger the CDS table is current; only the batch's affected
    subjects are re-propagated, nothing else is touched. The final table
    is value-checked against the FULL-RECOMPUTE oracle (the exact SQL of
    kg_cds / kg_incremental_cds) — the streaming-IVM correctness claim,
    now under real Structured Streaming triggers rather than a
    hand-split append (which kg_incremental_cds already pins).

    Scale shape: per-trigger cost is O(batch subjects × ontology) —
    broadcast Wu-Palmer join + subj_key-keyed semi/anti splice —
    independent of accumulated history size; state/CDS live in a
    parquet sink (bucketed by subj_key under the P15 layout at scale).
    """
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from ...operators.cds import incremental_cds_update
    from .kg1 import q_kg_canonical

    sfx = f"{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}"
    base = _os.path.join(_tempfile.gettempdir(), f"stream_cds_{sfx}")
    src, ckpt = base + "_src", base + "_ckpt"
    for d in (src, ckpt):
        _shutil.rmtree(d, ignore_errors=True)
    import glob as _glob
    for d in _glob.glob(base + "_v*"):
        _shutil.rmtree(d, ignore_errors=True)

    canon = q_kg_canonical(spark, sf_dir).select(
        "conv_id", "turn_idx", "concept_id", "link_score")
    canon.repartition(3, "turn_idx").write.parquet(src)
    stream = (spark.readStream.schema(canon.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))

    holder = {"state": None, "cds": None, "v": 0}

    def _tags_of(df: DataFrame) -> DataFrame:
        return (df.groupBy(
            F.concat(F.lit("conv:"), F.col("conv_id")).alias("subj_key"),
            F.col("concept_id"))
            .agg(F.max("link_score").alias("tag_score")))

    def _fold(batch_df: DataFrame, _batch_id: int) -> None:
        if holder["state"] is None:
            state = spark.createDataFrame(
                [], "subj_key string, concept_id string, tag_score double")
            cds = spark.createDataFrame(
                [], "subj_key string, concept_id string, score double")
        else:
            state = spark.read.parquet(holder["state"])
            cds = spark.read.parquet(holder["cds"])
        new_state, new_cds = incremental_cds_update(
            cds, state, _tags_of(batch_df), _wup_df(spark))
        v = holder["v"] + 1
        sp, cp = f"{base}_v{v}_state", f"{base}_v{v}_cds"
        new_state.write.mode("overwrite").parquet(sp)
        new_cds.write.mode("overwrite").parquet(cp)
        prev = (holder["state"], holder["cds"])
        holder.update(state=sp, cds=cp, v=v)
        # retire the superseded version AFTER the new one is fully
        # written (write-then-swap): state size stays O(1) versions,
        # not O(triggers) — a long-running stream must not grow tmp
        # unboundedly. (At scale this is the sink table's snapshot
        # expiry.)
        for d in prev:
            if d is not None:
                _shutil.rmtree(d, ignore_errors=True)

    q = (stream.writeStream.outputMode("update").foreachBatch(_fold)
         .trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination()
    # End-of-run residue (r5 review): the staged src copy, the stream
    # checkpoint, and the final tag-STATE version are no longer needed
    # once the query terminates — only the final CDS parquet must
    # survive, because the returned DataFrame reads it lazily. Leaves
    # exactly one directory per (sf, pid) instead of four.
    _shutil.rmtree(src, ignore_errors=True)
    _shutil.rmtree(ckpt, ignore_errors=True)
    if holder["state"] is not None:
        _shutil.rmtree(holder["state"], ignore_errors=True)
    final = spark.read.parquet(holder["cds"])
    return final.select("subj_key",
                        F.col("concept_id").alias("cds_concept"), "score")
