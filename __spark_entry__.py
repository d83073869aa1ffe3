"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship KG-construction query on sf0.001.
``queries()`` / ``oracle_sql()`` — operator inventory per SURVEY.md §2,
implemented in ``otd_semantic_framework_spark.plans.driver_queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from otd_semantic_framework_spark.plans import driver_queries as DQ  # noqa: E402
from otd_semantic_framework_spark.plans import spark_only_queries as SOQ  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG triple extraction (mention linking +
    canonicalization + tool/reply rules + dedup) over transcripts derived
    from /root/testdata/sf0.001."""
    return DQ.q_kg_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = dict(DQ.build_queries())
    out.update(SOQ.build_queries())
    return out


def oracle_sql() -> dict[str, str]:
    # Spark-only ops (MinHash-LSH, SimHash, vectorized-UDF paths,
    # multimodal stubs, streaming) are intentionally absent here →
    # the driver records its weaker rows-only check for them.
    return dict(DQ.build_oracle_sql())
