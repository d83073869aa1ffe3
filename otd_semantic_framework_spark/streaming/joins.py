"""Watermarked stream-stream interval join (SURVEY.md §2B S-ops).

Production shape: two ``readStream`` sources (e.g. the signup CDC feed
and the purchase CDC feed), each ``withWatermark`` on its event time,
inner-joined on the key plus a bounded time-range condition
(``r.ts BETWEEN l.ts AND l.ts + window``). The range bound + both
watermarks let Spark expire join state: left rows are dropped from
state once the right watermark passes ``l.ts + window + delay``, so
state is O(events within the window), not O(stream) — the property
that makes this viable on an unbounded 10^12-row feed.

Locally the feeds are file sources drained with
``trigger(availableNow=True)``. Exactness contract: if the staged
files are CONTIGUOUS TIME RANGES replayed oldest-first (see
``stage_time_ordered``), no event is ever behind the watermark when it
arrives, so the streaming result equals the batch interval join row
for row — pinned by the kg driver pairing (stream_join vs a plain
DuckDB join) and by tests that straddle matches across micro-batch
boundaries. Rows that ARE late beyond the watermark lose their match
once the partner's state is evicted — note eviction lags one
micro-batch (the batch-N watermark is computed from batch N-1's max
event time and applied at end-of-batch), which the late-row test
accounts for with a carrier batch.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stage_time_ordered(df: DataFrame, src_dir: str, ts_col: str = "ts",
                       n_files: int = 4) -> None:
    """Write ``df`` as ``n_files`` contiguous time-range parquet files,
    oldest range first, each sorted on ``ts_col``. The file stream
    source orders files by (modification time, path), so sequential
    writes replay event time monotonically across micro-batches —
    the local stand-in for a time-ordered CDC feed."""
    lo, hi = df.agg(F.min(ts_col), F.max(ts_col)).first()
    span_us = int((hi - lo).total_seconds() * 1_000_000) + 1
    bucket = (F.floor(
        (F.unix_micros(F.col(ts_col).cast("timestamp"))
         - F.unix_micros(F.lit(lo).cast("timestamp")))
        * n_files / span_us)).cast("int")
    staged = df.withColumn("_bucket", bucket)
    for i in range(n_files):
        (staged.filter(F.col("_bucket") == i).drop("_bucket")
         .coalesce(1).sortWithinPartitions(ts_col)
         .write.mode("append").parquet(src_dir))
        time.sleep(0.05)  # strictly increasing mtimes for source ordering


def interval_join_streams(left: DataFrame, right: DataFrame,
                          key: str, left_ts: str, right_ts: str,
                          window: str = "1 hour",
                          delay: str = "2 hours") -> DataFrame:
    """Inner stream-stream join: right event within [left_ts,
    left_ts + window] for the same key, both sides watermarked by
    ``delay``. Column names must already be disambiguated."""
    cond = F.expr(
        f"l_{key} = r_{key} AND {right_ts} >= {left_ts} "
        f"AND {right_ts} <= {left_ts} + INTERVAL {window}")
    return (left.withWatermark(left_ts, delay)
            .join(right.withWatermark(right_ts, delay), cond, "inner"))


def drain_stream(joined: DataFrame, out: str, ckpt: str) -> None:
    """availableNow drain of an append-mode streaming DF into parquet
    via foreachBatch (idempotent per checkpoint)."""
    def _write(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out)

    q = (joined.writeStream.outputMode("append").foreachBatch(_write)
         .trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination()


def run_interval_join(spark: SparkSession, src: str, schema,
                      left_filter: str, right_filter: str, key: str,
                      out: str, ckpt: str, window: str = "1 hour",
                      delay: str = "2 hours",
                      max_files_per_trigger: int = 1,
                      state_partitions: int | None = 8) -> DataFrame:
    """File-source wiring of the interval join: two readStream scans of
    the same staged directory, one filtered to each side. Returns the
    drained result (empty-but-typed if the join produced no rows).

    ``state_partitions`` caps spark.sql.shuffle.partitions FOR THIS
    DRAIN (restored after): the state store allocates one store per
    shuffle partition per stateful operator per micro-batch, so a
    batch-tuned 96-partition setting turns a small drain into
    thousands of near-empty state tasks + checkpoint files. On a real
    cluster size this to the stateful load, not the batch default."""
    def _stream():
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", max_files_per_trigger)
                .parquet(src))

    left = (_stream().filter(left_filter)
            .select(F.col(key).alias(f"l_{key}"),
                    F.col("ts").cast("timestamp").alias("l_ts")))
    right = (_stream().filter(right_filter)
             .select(F.col(key).alias(f"r_{key}"),
                     F.col("ts").cast("timestamp").alias("r_ts"),
                     "value"))
    joined = interval_join_streams(left, right, key, "l_ts", "r_ts",
                                   window=window, delay=delay)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions",
                           str(state_partitions))
        drain_stream(joined, out, ckpt)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.catalog.refreshByPath(out)
    if not os.path.isdir(out) or not any(
            f.endswith(".parquet") for f in os.listdir(out)):
        return spark.createDataFrame(
            [], f"l_{key} bigint, l_ts timestamp, r_{key} bigint, "
                "r_ts timestamp, value double")
    return spark.read.parquet(out)
