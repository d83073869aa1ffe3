"""Similarity search + embedding-cosine near-dup over embedding columns
(array<float>).

- brute-force cosine top-k: higher-order functions, JVM-side; correct
  baseline, O(Q x N) — fine when one side is broadcast-small.
- LSH-bucketed ANN: deterministic random-hyperplane signatures; the
  scale path — candidates only form inside buckets, so the join is
  equi on bucket id and shuffles by bucket instead of cross-joining.
  Multi-probe = several independent plane sets OR'd together.
- IVF ANN: coarse quantizer (deterministic centroids) assigns each
  candidate to one cell; queries probe their n_probe nearest cells —
  the candidate join is equi on cell id (shuffle by cell, no cross
  join), recall tuned by n_probe.
- embedding near-dup: exact all-pairs cosine above a threshold via ONE
  blocked numpy matmul per Arrow batch against a broadcast matrix.

Bucket/cell assignment runs as a vectorized pandas UDF (one numpy
matmul per Arrow batch) rather than per-plane higher-order-function
expressions: the HOF formulation built a 64-literal array tree per
plane, which dominated wall time with plan compile + interpreted
per-element eval. The UDF keeps the plan tiny and the math in BLAS.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .. import semantics as S
from ..functions.vector import as_double as _as_double
from ..functions.vector import dot as _dot
from ..functions.vector import l2_norm as _norm


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


def _stack(vecs: pd.Series) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in vecs])


def lsh_bucket(df: DataFrame, vec_col: str, planes: list[list[float]]) -> DataFrame:
    """Add a sign-bucket id: bit i = 1 iff dot(v, plane_i) >= 0.
    Vectorized: one (batch x dim) @ (dim x planes) matmul per Arrow
    batch; the plane matrix ships in the UDF closure (tiny)."""
    P = np.asarray(planes, dtype=np.float64)

    @pandas_udf(T.LongType())
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        bits = (_stack(vecs) @ P.T) >= 0  # N x n_planes
        out = np.zeros(bits.shape[0], dtype=np.int64)
        for i in range(P.shape[0]):
            out |= bits[:, i].astype(np.int64) << i
        return pd.Series(out)

    return df.withColumn("bucket", bucket_udf(F.col(vec_col)))


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


def ivf_centroids(n_cells: int, dim: int) -> np.ndarray:
    """Deterministic hash-derived coarse-quantizer centroids, L2-normed.
    (A production build would k-means these; determinism matters more
    here — see SURVEY §7 risk 2.)"""
    C = np.stack([np.asarray(S.token_vector(f"ivf-centroid-{i}", dim),
                             dtype=np.float64) for i in range(n_cells)])
    return C / np.linalg.norm(C, axis=1, keepdims=True)


def ivf_centroids_kmeans(candidates: DataFrame, vec_col: str = "cv",
                         n_cells: int = 16, seed: int = 42) -> np.ndarray:
    """Data-driven coarse quantizer: MLlib KMeans centers, L2-normed.
    FLAGGED path (SURVEY §7 risk 2): k-means is seed-stable but
    partitioning-sensitive, so the hash-derived ``ivf_centroids`` stays
    the reproducibility default; use this when recall matters more than
    bit-stable re-runs. IVF correctness is centroid-independent — with
    n_probe == n_cells the result equals brute force for ANY centroid
    set (test-pinned), so swapping quantizers only moves recall."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = candidates.select(
        array_to_vector(_as_double(F.col(vec_col))).alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=20).fit(feats)
    C = np.stack([np.asarray(c, dtype=np.float64)
                  for c in model.clusterCenters()])
    norms = np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C / norms


def ann_ivf_topk(queries: DataFrame, candidates: DataFrame, k: int = 10,
                 n_cells: int = 16, n_probe: int = 4, dim: int = 64,
                 q_id: str = "qid", c_id: str = "cid",
                 q_vec: str = "qv", c_vec: str = "cv",
                 centroids: np.ndarray | None = None) -> DataFrame:
    """IVF-style ANN: candidates partition into their nearest-centroid
    cell; each query probes its n_probe nearest cells; exact cosine only
    inside probed cells. The join is equi on cell id → shuffle by cell,
    never a cross join; n_probe=n_cells degrades gracefully to exact.
    ``centroids`` overrides the deterministic hash-derived quantizer
    (e.g. with ``ivf_centroids_kmeans`` output)."""
    C = centroids if centroids is not None else ivf_centroids(n_cells, dim)
    n_cells = C.shape[0]

    @pandas_udf(T.IntegerType())
    def cell_udf(vecs: pd.Series) -> pd.Series:
        V = _stack(vecs)
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        return pd.Series((V @ C.T).argmax(axis=1).astype(np.int32))

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_udf(vecs: pd.Series) -> pd.Series:
        V = _stack(vecs)
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        sims = V @ C.T
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    cb = candidates.withColumn("cell", cell_udf(F.col(c_vec)))
    qb = (queries.withColumn("cells", probe_udf(F.col(q_vec)))
          .select(q_id, q_vec, F.explode("cells").alias("cell")))
    sim = (qb.join(cb, "cell")
           .withColumn("cos", F.round(
               _dot(_as_double(F.col(q_vec)), _as_double(F.col(c_vec)))
               / (_norm(_as_double(F.col(q_vec))) * _norm(_as_double(F.col(c_vec)))), 6)))
    w = Window.partitionBy(q_id).orderBy(F.desc("cos"), F.asc(c_id))
    return (sim.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k).select(q_id, c_id, "cos", "rk"))


def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.38,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Exact embedding-cosine near-dup pairs (id_a < id_b, rounded cos >=
    threshold) — the task-addendum 'embedding-cosine near-dup'.

    Broadcast-matmul layout: the full (id, vector) set broadcasts once
    as a numpy float64 matrix; every Arrow batch does ONE blocked
    ``B @ M.T`` against it and emits only above-threshold pairs. No
    per-row Python, no shuffle, map-only after the scan. Valid while one
    side fits in executor memory (same regime as the broadcast ontology
    matrix in P7/P10); for unbounded N the scale paths are ann_lsh_topk
    / ann_ivf_topk (bucketed candidates) or MinHash-LSH on text.
    """
    sc = embeddings.sparkSession.sparkContext
    pdf = embeddings.select(id_col, vec_col).toPandas()
    ids_all = pdf[id_col].to_numpy()
    M = _stack(pdf[vec_col])
    n_all = np.linalg.norm(M, axis=1)
    bc = sc.broadcast((ids_all, M, n_all))

    out_schema = T.StructType([
        T.StructField("vec_a", T.LongType()),
        T.StructField("vec_b", T.LongType()),
        T.StructField("cos", T.DoubleType()),
    ])

    def gen(batches):
        ids_r, M_r, n_r = bc.value
        for b in batches:
            if len(b) == 0:
                continue
            B = _stack(b[vec_col])
            bn = np.linalg.norm(B, axis=1)
            cos = S.round_half_away((B @ M_r.T) / np.outer(bn, n_r), 6)
            bi = b[id_col].to_numpy()
            mask = (cos >= threshold) & (bi[:, None] < ids_r[None, :])
            r, c = np.nonzero(mask)
            yield pd.DataFrame({"vec_a": bi[r].astype("int64"),
                                "vec_b": ids_r[c].astype("int64"),
                                "cos": cos[r, c]})

    return embeddings.select(id_col, vec_col).mapInPandas(gen, schema=out_schema)
