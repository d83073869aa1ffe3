"""queries() entries with no DuckDB-expressible oracle — the driver
records rows-only checks for these (noted in ``__spark_entry__``).

Each is still deterministic (stable under re-run and repartitioning) so
row counts are reproducible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_fake_media, decode_media, frame_sample
def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_dedup_minhash_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production MinHash-LSH flavor (xxhash64 signatures — the fast JVM
    path, what a 100 TB run uses). Same layout as the oracle-paired md5
    flavor (`dedup_minhash_lsh`); rows-only here because DuckDB has no
    xxhash64-with-seed."""
    from ..operators.dedup import minhash_dedup_pairs
    return minhash_dedup_pairs(_docs(spark, sf_dir), threshold=0.5)


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing projection: the operator's `features array<float>` is
    stringified (CSV of %.6f) because the driver's row canonicalizer
    cannot sort list cells; the array-returning operator stays as-is for
    pipeline use."""
    decoded = decode_media(attach_fake_media(_docs(spark, sf_dir)))
    return decoded.select(
        "doc_id", "media_type", "n_bytes", "width", "height",
        F.concat_ws(
            ",", F.transform("features", lambda x: F.format_string("%.6f", x))
        ).alias("features_csv"))


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_sample(attach_fake_media(_docs(spark, sf_dir)), every_n=40)


def build_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "dedup_minhash_fast": q_dedup_minhash_fast,
        "multimodal_decode": q_multimodal_decode,
        "multimodal_frames": q_multimodal_frames,
        "stats_approx_distinct": q_stats_approx_distinct,
        "kg_fast_pipeline": q_kg_fast_pipeline,
    }


def q_stats_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — approximate by design, so
    rows-only check (exact value differs from DuckDB's approx impl)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.count_distinct("l_orderkey").alias("exact_orders"))


def q_kg_fast_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRUE production hot path (regex pandas-UDF mention detection →
    broadcast canonical → dedup) on transcripts derived from testdata,
    using an ontology over the testdata vocabulary. Rows-only (the UDF
    span semantics are pinned against the pandas oracle in pytest; the
    containment variant has the SQL oracle)."""
    import pandas as pd

    from .. import semantics as S
    from ..plans.driver_ontology import driver_concepts
    from ..plans.driver_queries import derived_transcripts
    from ..plans.pipeline import build_triples_fast

    concepts = list(driver_concepts())
    onto_pdf = pd.DataFrame({
        "concept_id": [c.concept_id for c in concepts],
        "pref_label": [c.pref_label for c in concepts],
        "alt_labels": [list(c.alt_labels) for c in concepts],
        "parent_id": [c.parent_id for c in concepts],
        "depth": [c.depth for c in concepts],
        "path": [list(c.path) for c in concepts],
        "embedding": [[float(x) for x in S.phrase_vector(S.normalize_text(c.pref_label))]
                      for c in concepts],
    })
    t = derived_transcripts(spark, sf_dir).withColumn(
        "ts", F.lit(None).cast("timestamp"))
    return build_triples_fast(spark, t, ontology_pdf=onto_pdf)
