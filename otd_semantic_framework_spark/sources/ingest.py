"""P1 ingest variants: enforced-schema readers for parquet / JSON lines /
CSV transcript drops (the reference ingests DCAT records from CKAN
portals as JSON [K]; here any export of the transcript shape loads the
same way). Schema is always ENFORCED, never inferred — inference at
10^12 rows means sampling I/O and nondeterministic types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TRANSCRIPTS


def read_transcripts(spark: SparkSession, path: str, fmt: str = "parquet",
                     ts_format: str | None = None) -> DataFrame:
    if fmt == "parquet":
        df = spark.read.schema(TRANSCRIPTS).parquet(path)
    elif fmt == "json":
        df = spark.read.schema(TRANSCRIPTS).json(path)
    elif fmt == "csv":
        df = spark.read.schema(TRANSCRIPTS).option("header", "true").csv(
            path, timestampFormat=ts_format or "yyyy-MM-dd HH:mm:ss")
    else:
        raise ValueError(f"unknown format {fmt!r}")
    return df


def validate_transcripts(df: DataFrame) -> DataFrame:
    """Input contract checks as a filter stage: non-null keys,
    non-negative turn_idx, known roles. Violations are dropped and
    counted via observe() so lineage metrics surface them."""
    from pyspark.sql import Observation
    cond = (F.col("conv_id").isNotNull()
            & F.col("turn_idx").isNotNull() & (F.col("turn_idx") >= 0)
            & F.col("role").isin("user", "assistant", "tool", "system"))
    obs = Observation("ingest_validation")
    return df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(F.when(~cond, 1).otherwise(0)).alias("rows_dropped"),
    ).filter(cond)
