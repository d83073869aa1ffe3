"""Storage adapter — Iceberg in production, partitioned Parquet locally.

The north rule (BASELINE.json) requires Iceberg input/output tables. The
sandbox has no Iceberg runtime jar (SURVEY.md §0 [L]), so the format is a
config boundary: identical DataFrame code calls ``read_table`` /
``write_table`` and only this module knows whether that means
``spark.read.table("cat.db.x")`` (Iceberg, partitioned by
``bucket(conv_id), days(ts)``) or ``spark.read.parquet(path)``.

Production partitioning (design-for-100TB):
- transcripts:  bucket(1024, conv_id) + days(ts) — co-locates each
  conversation so the P2 window needs no extra shuffle (storage-partitioned
  join / cluster-by), and day pruning serves incremental runs.
- triples out:  bucket(256, subj) — point lookups by subject and
  MERGE INTO idempotent incremental materialization.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Storage:
    """mode='parquet' (local/test) or 'iceberg' (cluster)."""

    root: str
    mode: str = "parquet"
    catalog: str = "otd"

    def _path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.parquet")

    def read_table(self, spark: SparkSession, name: str) -> DataFrame:
        if self.mode == "iceberg":
            return spark.read.table(f"{self.catalog}.db.{name}")
        return spark.read.parquet(self._path(name))

    def write_table(self, df: DataFrame, name: str,
                    partition_by: list[str] | None = None,
                    mode: str = "overwrite") -> None:
        if self.mode == "iceberg":
            w = df.writeTo(f"{self.catalog}.db.{name}")
            if mode == "overwrite":
                w.createOrReplace()
            else:
                w.append()
            return
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))

    def exists(self, spark: SparkSession, name: str) -> bool:
        if self.mode == "iceberg":
            return spark.catalog.tableExists(f"{self.catalog}.db.{name}")
        p = self._path(name)
        return os.path.exists(os.path.join(p, "_SUCCESS")) or (
            os.path.isdir(p) and any(f.endswith(".parquet") for f in os.listdir(p))
        )
