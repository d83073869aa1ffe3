"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: higher-order functions, JVM-side; correct
  baseline, O(Q x N) — fine when one side is broadcast-small.
- LSH-bucketed ANN: deterministic random-hyperplane signatures; the
  scale path — candidates only form inside buckets, so the join is
  equi on bucket id and shuffles by bucket instead of cross-joining.
  Multi-probe = several independent plane sets OR'd together.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import semantics as S


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(col):
    return F.sqrt(F.aggregate(F.transform(col, lambda x: x * x),
                              F.lit(0.0), lambda a, v: a + v))


def cosine_topk(queries: DataFrame, candidates: DataFrame, k: int = 10,
                q_id: str = "qid", c_id: str = "cid",
                q_vec: str = "qv", c_vec: str = "cv") -> DataFrame:
    """Brute-force cosine top-k (broadcast the smaller candidate side)."""
    sim = (queries.crossJoin(F.broadcast(candidates))
           .withColumn("cos", F.round(
               _dot(_as_double(F.col(q_vec)), _as_double(F.col(c_vec)))
               / (_norm(_as_double(F.col(q_vec))) * _norm(_as_double(F.col(c_vec)))), 6)))
    w = Window.partitionBy(q_id).orderBy(F.desc("cos"), F.asc(c_id))
    return (sim.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k).select(q_id, c_id, "cos", "rk"))


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic hash-derived hyperplane normals."""
    return [[float(x) for x in S.token_vector(f"hyperplane-{i}", dim)]
            for i in range(n_planes)]


def lsh_bucket(df: DataFrame, vec_col: str, planes: list[list[float]]) -> DataFrame:
    """Add a sign-bucket id: bit i = 1 iff dot(v, plane_i) >= 0."""
    bucket = None
    v = _as_double(F.col(vec_col))
    for i, p in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(v, lit) >= 0, F.lit(1 << i)).otherwise(0)
        bucket = bit if bucket is None else bucket + bit
    return df.withColumn("bucket", bucket.cast("long"))


def ann_lsh_topk(queries: DataFrame, candidates: DataFrame, k: int = 10,
                 n_planes: int = 8, dim: int = 64,
                 q_id: str = "qid", c_id: str = "cid",
                 q_vec: str = "qv", c_vec: str = "cv") -> DataFrame:
    """ANN: equi-join on LSH bucket, exact cosine within bucket, top-k.
    Approximate — recall depends on n_planes (fewer planes → bigger
    buckets → higher recall, more compute)."""
    planes = hyperplanes(n_planes, dim)
    qb = lsh_bucket(queries, q_vec, planes)
    cb = lsh_bucket(candidates, c_vec, planes)
    sim = (qb.join(cb, "bucket")
           .withColumn("cos", F.round(
               _dot(_as_double(F.col(q_vec)), _as_double(F.col(c_vec)))
               / (_norm(_as_double(F.col(q_vec))) * _norm(_as_double(F.col(c_vec)))), 6)))
    w = Window.partitionBy(q_id).orderBy(F.desc("cos"), F.asc(c_id))
    return (sim.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k).select(q_id, c_id, "cos", "rk"))
