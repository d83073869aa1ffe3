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
    """Stack an Arrow batch of array<float> into an (n, dim) float64
    matrix. NULL vectors are rejected with a clear message (instead of
    an opaque np.asarray(None) executor error); an empty batch returns
    a (0, 0) matrix — callers guard for n == 0 before any matmul."""
    out = []
    for v in vecs:
        if v is None:
            raise ValueError(
                "NULL embedding vector in similarity-operator input; "
                "filter NULLs upstream (.filter(col(vec).isNotNull()))")
        out.append(np.asarray(v, dtype=np.float64))
    if not out:
        return np.zeros((0, 0), dtype=np.float64)
    return np.stack(out)


def lsh_bucket(df: DataFrame, vec_col: str, planes: list[list[float]]) -> DataFrame:
    """Add a sign-bucket id: bit i = 1 iff dot(v, plane_i) >= 0.
    Vectorized: one (batch x dim) @ (dim x planes) matmul per Arrow
    batch; the plane matrix ships in the UDF closure (tiny)."""
    P = np.asarray(planes, dtype=np.float64)

    @pandas_udf(T.LongType())
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
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

    # No L2 normalization of V here: argmax/argsort of V @ C.T over a
    # row is invariant under positive row scaling, and the DuckDB oracle
    # ranks raw dot products — computing the identical quantity avoids
    # float tie-flips and saves a division (ADVICE r1).
    @pandas_udf(T.IntegerType())
    def cell_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        V = _stack(vecs)
        return pd.Series((V @ C.T).argmax(axis=1).astype(np.int32))

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        V = _stack(vecs)
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


_NEAR_DUP_SCHEMA = T.StructType([
    T.StructField("vec_a", T.LongType()),
    T.StructField("vec_b", T.LongType()),
    T.StructField("cos", T.DoubleType()),
])

# Broadcast fast path only below this row count — above it, the driver
# round-trip (toPandas + broadcast) becomes the scale-killer VERDICT r1
# flagged, so the grid self-join is used instead.
NEAR_DUP_BROADCAST_LIMIT = 200_000


def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.38,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             n_blocks: int | None = None) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (vec_a < vec_b, rounded cos
    >= threshold) — the task-addendum 'embedding-cosine near-dup'.

    DEFAULT (``n_blocks`` set, or table > NEAR_DUP_BROADCAST_LIMIT rows):
    **grid self-join** — fully distributed, no driver collect. Rows hash
    into ``n_blocks`` blocks; each unordered block pair (i <= j) is one
    shuffle group, and ``applyInPandas`` does a chunked numpy matmul of
    side-i against side-j inside the group. Every id pair lands in
    exactly one group, so the result is EXACT (same as all-pairs), with
    shuffle volume N x n_blocks rows and the O(N^2) compute spread over
    n_blocks*(n_blocks+1)/2 independent tasks. This is the classic
    blocked all-pairs layout; at 100 TB you cap compute with the
    *approximate* bucketed paths instead (ann_lsh_topk / ann_ivf_topk,
    MinHash-LSH on text) — exact all-pairs is inherently quadratic.

    SMALL-N FAST PATH (table known small): broadcast the whole (id,
    vector) matrix and do one blocked matmul per Arrow batch — map-only,
    zero shuffle. Guarded by NEAR_DUP_BROADCAST_LIMIT so the driver
    round-trip stays bounded; the count() probe is a cheap parquet
    metadata job.
    """
    e = embeddings.select(id_col, vec_col)
    if n_blocks is None:
        n = e.count()
        if n <= NEAR_DUP_BROADCAST_LIMIT:
            return _near_dup_broadcast(e, threshold, id_col, vec_col)
        n_blocks = max(2, int(np.ceil(n / 50_000)))
    return _near_dup_grid(e, threshold, id_col, vec_col, n_blocks)


def _near_dup_broadcast(e: DataFrame, threshold: float,
                        id_col: str, vec_col: str) -> DataFrame:
    """Small-N fast path: broadcast matrix + per-batch blocked matmul.
    Only call with a bounded table (see NEAR_DUP_BROADCAST_LIMIT)."""
    sc = e.sparkSession.sparkContext
    pdf = e.toPandas()
    ids_all = pdf[id_col].to_numpy()
    M = _stack(pdf[vec_col])
    n_all = np.linalg.norm(M, axis=1)
    bc = sc.broadcast((ids_all, M, n_all))

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

    return e.mapInPandas(gen, schema=_NEAR_DUP_SCHEMA)


def _near_dup_grid(e: DataFrame, threshold: float, id_col: str,
                   vec_col: str, n_blocks: int,
                   chunk: int = 2048) -> DataFrame:
    """Distributed exact all-pairs: block-pair grid via applyInPandas.

    Replication map (broadcast, n_blocks^2 rows): a row in block b joins
    group (b, j) as the LEFT side for j in [b, n_blocks) and group
    (i, b) as the RIGHT side for i in [0, b) — n_blocks entries per row.
    Diagonal groups (i == j) hold only LEFT rows and compare id < id;
    off-diagonal groups cross LEFT x RIGHT (block assignment is a hash
    of the id, so each unordered id pair appears in exactly one group).
    The in-group matmul is chunked so the cosine sub-matrix stays
    ~chunk x |block| regardless of block size."""
    spark = e.sparkSession
    rep_rows = [(b, b * n_blocks + j, 0)
                for b in range(n_blocks) for j in range(b, n_blocks)]
    rep_rows += [(b, i * n_blocks + b, 1)
                 for b in range(n_blocks) for i in range(b)]
    rep = spark.createDataFrame(rep_rows, "block int, pair_key int, side int")

    blocked = e.withColumn(
        "block",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int"))
    fanned = blocked.join(F.broadcast(rep), "block").select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
        "pair_key", "side")

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                {"vec_a": pd.Series(dtype="int64"),
                 "vec_b": pd.Series(dtype="int64"),
                 "cos": pd.Series(dtype="float64")})
        key = int(pdf["pair_key"].iloc[0])
        diag = (key // n_blocks) == (key % n_blocks)
        left = pdf if diag else pdf[pdf["side"] == 0]
        right = pdf if diag else pdf[pdf["side"] == 1]
        if left.empty or right.empty:
            return pd.DataFrame(
                {"vec_a": pd.Series(dtype="int64"),
                 "vec_b": pd.Series(dtype="int64"),
                 "cos": pd.Series(dtype="float64")})
        R = _stack(right["_v"])
        rn = np.linalg.norm(R, axis=1)
        rid = right["_id"].to_numpy()
        lid_all = left["_id"].to_numpy()
        outs = []
        for lo in range(0, len(left), chunk):
            L = _stack(left["_v"].iloc[lo:lo + chunk])
            ln = np.linalg.norm(L, axis=1)
            lid = lid_all[lo:lo + chunk]
            cos = S.round_half_away((L @ R.T) / np.outer(ln, rn), 6)
            mask = (cos >= threshold) & (lid[:, None] != rid[None, :])
            r, c = np.nonzero(mask)
            a, b = lid[r], rid[c]
            keep = a < b if diag else np.ones(len(a), dtype=bool)
            outs.append(pd.DataFrame({
                "vec_a": np.minimum(a, b)[keep].astype("int64"),
                "vec_b": np.maximum(a, b)[keep].astype("int64"),
                "cos": cos[r, c][keep]}))
        return pd.concat(outs, ignore_index=True)

    return fanned.groupBy("pair_key").applyInPandas(
        emit, schema=_NEAR_DUP_SCHEMA)


# ---------------------------------------------------------------------------
# int8 embedding quantization (round 3) — the standard ANN memory/IO
# lever: 4x smaller vector shards, integer dot products. Symmetric
# per-vector scaling keeps the math engine-portable: every quantized
# component is an exact small integer, so similarity scores are
# integer-exact on any engine/parallelism (no float accumulation
# order), which is also why the driver can hash-check this path.
# ---------------------------------------------------------------------------

def quantize_embeddings(vecs: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """(id, qvec array<int> in [-127,127], scale double): q_i =
    round(x_i * 127 / max|x|), scale = max|x| / 127 (dequantize:
    x ≈ q * scale). Zero vectors quantize to zeros with scale 0.
    Pure higher-order functions — JVM-side, map-only."""
    dbl = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(dbl, lambda x: F.abs(x)))
    q = F.when(maxabs == 0.0,
               F.transform(dbl, lambda x: F.lit(0))) \
         .otherwise(F.transform(
             dbl, lambda x: F.round(x * 127.0 / maxabs, 0).cast("int")))
    return vecs.select(F.col(id_col), q.alias("qvec"),
                       (maxabs / 127.0).alias("scale"))


def quantized_topk(queries: DataFrame, candidates: DataFrame, k: int = 10,
                   q_id: str = "qid", c_id: str = "cid",
                   q_vec: str = "qv", c_vec: str = "cv") -> DataFrame:
    """Brute-force top-k by integer quantized dot product (broadcast
    the candidate side, same shape as cosine_topk). Output
    (qid, cid, qdot bigint, rk) — qdot is exact, so ranking is
    deterministic across engines and parallelism."""
    qdot = F.aggregate(
        F.zip_with(q_vec, c_vec, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    sim = queries.crossJoin(F.broadcast(candidates)).withColumn("qdot", qdot)
    w = Window.partitionBy(q_id).orderBy(F.desc("qdot"), F.asc(c_id))
    return (sim.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k).select(q_id, c_id, "qdot", "rk"))


# ---------------------------------------------------------------------------
# Multi-vector late interaction (round 4) — the ColBERT-style retrieval
# shape: a document is T token vectors, not one pooled vector, and
# relevance is sum-over-query-tokens of max-over-doc-tokens dot product
# (MaxSim). Re-expressed Spark-first: token vectors are int8-quantized
# slices, the scoring expression is pure JVM higher-order functions
# (aggregate / transform / zip_with) over a broadcast candidate side, so
# every score is an exact integer — deterministic ranking on any engine
# and any parallelism, hash-checkable against DuckDB.
# ---------------------------------------------------------------------------

def token_slices(vecs: DataFrame, n_tokens: int,
                 vec_col: str = "qvec") -> DataFrame:
    """Split an int-quantized vector into ``n_tokens`` equal contiguous
    sub-vectors ("token vectors"), kept as one array<array<int>> column
    ``toks`` — map-only, no explode, so downstream MaxSim never shuffles
    to reassemble a document."""
    width = F.size(F.col(vec_col)) / n_tokens
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(n_tokens - 1)),
        lambda t: F.slice(F.col(vec_col),
                          (t * width + 1).cast("int"), width.cast("int")))
    return vecs.withColumn("toks", toks).drop(vec_col)


def maxsim_topk(queries: DataFrame, candidates: DataFrame, k: int = 10,
                q_id: str = "qid", c_id: str = "cid") -> DataFrame:
    """Late-interaction top-k: score(q, c) = sum over query tokens qt of
    max over candidate tokens ct of dot(qt, ct), all integer math.

    Both inputs carry (id, toks array<array<int>>). The candidate side
    is broadcast (this is the re-rank stage of a retrieval stack — at
    100 TB the first stage is the LSH/IVF candidate generator in this
    module, and MaxSim re-ranks the per-query shortlist, so the
    broadcast side stays small by construction). The whole score is one
    nested higher-order-function expression — JVM codegen, no Python.
    Output (qid, cid, maxsim bigint, rk)."""
    qt = F.col("q_toks")
    ct = F.col("c_toks")
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    score = F.aggregate(
        qt, F.lit(0).cast("long"),
        lambda acc, q_tok: acc + F.array_max(
            F.transform(ct, lambda c_tok: dot(q_tok, c_tok))))
    q = queries.select(F.col(q_id), F.col("toks").alias("q_toks"))
    c = candidates.select(F.col(c_id), F.col("toks").alias("c_toks"))
    sim = q.crossJoin(F.broadcast(c)).withColumn("maxsim", score)
    w = Window.partitionBy(q_id).orderBy(F.desc("maxsim"), F.asc(c_id))
    return (sim.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k).select(q_id, c_id, "maxsim", "rk"))


def kmeans_lloyd_exact(vecs: DataFrame, k: int = 8, iters: int = 2,
                       id_col: str = "vec_id",
                       vec_col: str = "qvec",
                       with_centroids: bool = False):
    """Deterministic distributed k-means: ``iters`` synchronous Lloyd
    updates over int-quantized vectors in EXACT integer arithmetic,
    then a final assignment — the coarse-quantizer training step an IVF
    index needs, expressed so the result is bit-identical on any engine
    and any partitioning (unlike the flagged MLlib path,
    ``ivf_centroids_kmeans``, which is seed-stable but
    partitioning-sensitive). Seeds are the ``k`` smallest ids (
    deterministic); distances are integer squared-L2; centroid updates
    are the elementwise integer mean computed as
    ``(sum + 127*n) DIV n - 127`` — the +127 shift keeps the numerator
    non-negative so floor-vs-truncate division semantics can never
    diverge between engines; ties in assignment break to the smaller
    centroid id via a single min(struct(dist, cid)) aggregate.

    Scale shape per round: centroids are k tiny rows — broadcast
    crossJoin (k-fan-out map, no shuffle of the big side beyond the
    argmin agg keyed on the vector id); the update is one
    (cluster, dim) hash agg over the posexploded assignment (k*dim
    output rows) + a k-row rebuild. Empty clusters keep their previous
    centroid (left-join coalesce), so k never silently shrinks.
    Everything is JVM built-ins — zip_with/aggregate for the distance,
    posexplode for the update; no Python in the plan.
    """
    seeds = vecs.select(id_col, vec_col).orderBy(id_col).limit(k)
    cents = seeds.select(
        F.row_number().over(Window.orderBy(id_col)).alias("cid"),
        F.col(vec_col).alias("cvec"))

    def assign(cs: DataFrame) -> DataFrame:
        return (vecs.select(id_col, vec_col)
                .crossJoin(F.broadcast(cs))
                .withColumn("sq", F.expr(
                    f"aggregate(zip_with({vec_col}, cvec,"
                    " (a, b) -> CAST(a - b AS BIGINT) * (a - b)),"
                    " 0L, (acc, x) -> acc + x)"))
                .groupBy(id_col)
                .agg(F.min(F.struct("sq", "cid")).alias("m"))
                .select(F.col(id_col),
                        F.col("m.cid").alias("cluster"),
                        F.col("m.sq").alias("sq_dist")))

    for _ in range(iters):
        a = assign(cents)
        sums = (a.join(vecs.select(id_col, vec_col), id_col)
                .select("cluster", F.posexplode(vec_col))
                .groupBy("cluster", "pos")
                .agg(F.sum("col").alias("s"), F.count(F.lit(1)).alias("n")))
        new = (sums.select("cluster", "pos",
                           F.expr("(s + 127L * n) DIV n - 127L")
                           .cast("int").alias("v"))
               .groupBy("cluster")
               .agg(F.expr("transform(array_sort(collect_list("
                           "struct(pos, v))), x -> x.v)").alias("nvec")))
        cents = (cents.join(new.withColumnRenamed("cluster", "cid"),
                            "cid", "left")
                 .select("cid", F.coalesce("nvec", "cvec").alias("cvec")))
    if with_centroids:
        return assign(cents), cents
    return assign(cents)


def silhouette_simplified(vecs: DataFrame, k: int = 8, iters: int = 2,
                          id_col: str = "vec_id",
                          vec_col: str = "qvec") -> DataFrame:
    """Simplified silhouette over the exact-integer Lloyd clustering:
    per point, a = squared distance to its own centroid, b = minimum
    squared distance to any OTHER centroid, s = (b − a) / max(a, b)
    (0 when both are 0). The "simplified" variant replaces the
    textbook all-pairs mean distances — O(n²) per cluster, impossible
    at corpus scale — with distances to the k centroids: O(n·k),
    broadcast crossJoin, no shuffle of the big side beyond the
    per-point argmin/min aggs. a/b stay exact BIGINT (merge-order
    free); only the final ratio is a double, under the repo's
    round(x, 6) + 0.0 cross-engine convention (plain /, not integer
    DIV — Spark truncates negative integer division where DuckDB
    floors, so the signed ratio must never touch integer division).
    """
    assign_df, cents = kmeans_lloyd_exact(vecs, k, iters, id_col, vec_col,
                                          with_centroids=True)
    alld = (vecs.select(id_col, vec_col)
            .crossJoin(F.broadcast(cents))
            .withColumn("sq", F.expr(
                f"aggregate(zip_with({vec_col}, cvec,"
                " (a, b) -> CAST(a - b AS BIGINT) * (a - b)),"
                " 0L, (acc, x) -> acc + x)")))
    b = (alld.join(assign_df.select(id_col, "cluster"), id_col)
         .filter(F.col("cid") != F.col("cluster"))
         .groupBy(id_col).agg(F.min("sq").alias("b_sq")))
    return (assign_df
            .join(b, id_col)
            .select(F.col(id_col),
                    F.col("cluster").cast("long").alias("cluster"),
                    F.col("sq_dist").cast("long").alias("a_sq"),
                    F.col("b_sq").cast("long").alias("b_sq"),
                    (F.round((F.col("b_sq") - F.col("sq_dist"))
                             / F.greatest("sq_dist", "b_sq", F.lit(1)),
                             6) + 0.0).alias("s")))


# ---------------------------------------------------------------------------
# Product quantization (round 4, wave 7) — the billion-scale ANN memory
# format: a D-dim vector becomes M tiny codes (one per contiguous
# subspace), queries scan codes through a precomputed per-query lookup
# table (ADC — asymmetric distance computation) instead of touching raw
# vectors. Re-expressed Spark-first over int8-quantized vectors so every
# distance is an exact integer: the codebook is a deterministic sample
# (the lowest-id candidates — the stand-in for trained sub-kmeans, same
# convention as kmeans_lloyd_exact's lowest-id seeding), encoding is one
# map-side projection against a single broadcast codebook row, and the
# ADC scan is a broadcast join of the tiny (query × M × K) LUT onto the
# code table. Nothing exceeds M·K integer ops per vector; the raw
# vectors are never shipped to the scoring stage.
# ---------------------------------------------------------------------------

def _sq_l2(a, b):
    """Exact integer squared L2 between two int arrays (JVM HOFs)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: ((x - y).cast("long")
                                       * (x - y).cast("long"))),
        F.lit(0).cast("long"), lambda acc, v: acc + v)


def pq_codebook(candidates: DataFrame, n_subs: int, n_codes: int,
                c_id: str = "cid", c_vec: str = "cv") -> DataFrame:
    """One-row broadcastable codebook: the ``n_codes`` lowest-id
    candidates sliced into ``n_subs`` contiguous subspaces, collected
    as a sorted array<struct(m, code, cent)> column ``cb`` (length
    n_subs·n_codes — bounded by construction, so the collect_list is a
    constant-size agg, not a data-scale one). orderBy+limit first
    (TakeOrdered — parallel), rank only the bounded result."""
    w = F.size(F.col(c_vec)) / n_subs
    low = candidates.orderBy(c_id).limit(n_codes)
    wn = Window.orderBy(c_id)
    coded = low.withColumn("code", F.row_number().over(wn) - 1)
    slices = coded.select(
        "code",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(n_subs - 1)),
            lambda m: F.struct(
                m.alias("m"),
                F.slice(F.col(c_vec), (m * w + 1).cast("int"),
                        w.cast("int")).alias("cent")))).alias("s")) \
        .select("code", F.col("s.m").alias("m"), F.col("s.cent").alias("cent"))
    return slices.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("m", "code", "cent")))
        .alias("cb"))


def pq_encode(candidates: DataFrame, codebook: DataFrame,
              n_subs: int, n_codes: int,
              c_id: str = "cid", c_vec: str = "cv") -> DataFrame:
    """Encode every candidate as ``codes`` array<int> of length
    ``n_subs``: codes[m] = argmin over the n_codes codewords of the
    exact integer squared L2 between the candidate's m-th subspace
    slice and the codeword (first-index tie-break — array_position
    returns the FIRST occurrence of the min, so ties go to the lowest
    code on every engine). One crossJoin against the single broadcast
    codebook row; the whole encoding is a map-side projection."""
    w = F.size(F.col(c_vec)) / n_subs
    cb = F.col("cb")

    def _code_for(m):
        sl = F.slice(F.col(c_vec), (m * w + 1).cast("int"), w.cast("int"))
        dl = F.transform(
            F.sequence(F.lit(0), F.lit(n_codes - 1)),
            lambda c: _sq_l2(sl, F.element_at(cb, (m * n_codes + c + 1)
                                              .cast("int")).getField("cent")))
        return (F.array_position(dl, F.array_min(dl)) - 1).cast("int")

    codes = F.transform(F.sequence(F.lit(0), F.lit(n_subs - 1)), _code_for)
    return (candidates.crossJoin(F.broadcast(codebook))
            .select(F.col(c_id), codes.alias("codes")))


def pq_adc_topk(queries: DataFrame, encoded: DataFrame,
                codebook: DataFrame, n_subs: int, n_codes: int, k: int = 10,
                q_id: str = "qid", q_vec: str = "qv",
                c_id: str = "cid") -> DataFrame:
    """ADC top-k: per query, lut[m][c] = exact integer squared L2
    between the query's m-th slice and codeword c (an n_subs×n_codes
    array built in one projection against the broadcast codebook row);
    the approximate distance of a candidate is Σ_m lut[m][codes[m]],
    one broadcast join of the tiny per-query LUT table onto the code
    table — the raw vectors never reach this stage. Output
    (qid, cid, adc_dist bigint, rk), ranked ascending (ties by cid) —
    exact integers, so deterministic on any engine."""
    w = F.size(F.col(q_vec)) / n_subs
    cb = F.col("cb")
    lut = F.transform(
        F.sequence(F.lit(0), F.lit(n_subs - 1)),
        lambda m: F.transform(
            F.sequence(F.lit(0), F.lit(n_codes - 1)),
            lambda c: _sq_l2(
                F.slice(F.col(q_vec), (m * w + 1).cast("int"),
                        w.cast("int")),
                F.element_at(cb, (m * n_codes + c + 1).cast("int"))
                .getField("cent"))))
    qlut = (queries.crossJoin(F.broadcast(codebook))
            .select(F.col(q_id), lut.alias("lut")))
    dist = F.aggregate(
        F.zip_with("lut", "codes",
                   lambda row, code: F.element_at(row, code + 1)),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    scored = (encoded.crossJoin(F.broadcast(qlut))
              .withColumn("adc_dist", dist))
    wr = Window.partitionBy(q_id).orderBy(F.asc("adc_dist"), F.asc(c_id))
    return (scored.withColumn("rk", F.row_number().over(wr))
            .filter(F.col("rk") <= k)
            .select(q_id, c_id, "adc_dist", "rk"))


def knn_graph(vecs: DataFrame, k: int = 5, n_planes: int = 3,
              dim: int = 64, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Approximate k-NN graph construction [K: the edge-list artifact
    GNN trainers, label-propagation clusterers and semantic-dedup
    passes consume — NN-Descent/LSH-based kNN-graph building is the
    standard scale path, all-pairs being quadratic]: every node's
    top-k cosine neighbors WITHIN its LSH sign-bucket, plus the
    mutuality flag (mutual kNN edges are the high-precision subset a
    clustering pass keeps).

    Shape: bucket once (one vectorized matmul pandas_udf), bucket-key
    self-join (never all-pairs), exact cosine on candidates, top-k by
    a src-partitioned rank window (bounded by bucket size), and one
    (src,dst)-keyed self-join for the mutual flag. At 10^9 vectors:
    more planes (smaller buckets) + multi-probe for recall, and
    bucket-bucket co-partitioning makes the self-join shuffle-local.
    Approximate by design — cross-bucket true neighbors are missed;
    recall/compute trades via n_planes exactly as ann_lsh_topk."""
    planes = hyperplanes(n_planes, dim)
    b = lsh_bucket(vecs.select(F.col(id_col).alias("nid"),
                               F.col(vec_col).alias("nv")),
                   "nv", planes)
    a = b.select(F.col("nid").alias("src"), F.col("nv").alias("sv"),
                 "bucket")
    c = b.select(F.col("nid").alias("dst"), F.col("nv").alias("dv"),
                 "bucket")
    sim = (a.join(c, "bucket")
           .filter(F.col("src") != F.col("dst"))
           .withColumn("cos", F.round(
               _dot(_as_double(F.col("sv")), _as_double(F.col("dv")))
               / (_norm(_as_double(F.col("sv")))
                  * _norm(_as_double(F.col("dv")))), 6)))
    w = Window.partitionBy("src").orderBy(F.desc("cos"), F.asc("dst"))
    topk = (sim.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k).select("src", "dst", "cos", "rk"))
    rev = topk.select(F.col("dst").alias("src"),
                      F.col("src").alias("dst"),
                      F.lit(1).alias("mutual"))
    return (topk.join(rev, ["src", "dst"], "left")
            .select("src", "dst", "cos", "rk",
                    F.coalesce("mutual", F.lit(0)).cast("int")
                    .alias("mutual")))


def knn_outliers(vecs: DataFrame, k: int = 5, n_planes: int = 3,
                 dim: int = 64, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """kNN-distance embedding outlier detection [K: the classic
    distance-based outlier score — a vector whose top-k neighbors are
    all far away is mislabeled, corrupted, or out-of-distribution;
    embedding-space QA runs this before training on the vectors]:
    per node, the mean cosine to its knn_graph neighbors, robust-
    fenced with the median/MAD idiom (|dev| > 3*1.4826*MAD, one-sided
    — only BELOW-median scores flag, far-from-neighbors is the
    outlier direction). The per-node mean is computed over EXACT
    integer ppm cosines (cos is already round6, so cos*1e6 rounds to
    an exact BIGINT) — summing raw doubles across neighbors would be
    engine-order-dependent. MAD=0 degenerate falls back to flagging
    any deviation (standard MAD behavior, documented). Nodes with no
    in-bucket neighbor are emitted with score NULL and flagged — an
    isolated node is the strongest outlier signal the graph has.

    Shape: the kNN graph's bucketed join, one per-node hash agg, two
    O(1) percentile aggs broadcast back, one map-side fence. Bounded
    by the graph's |V|*k edges; at 100 TB swap percentile for
    approx_percentile and keep the shape."""
    g = knn_graph(vecs, k=k, n_planes=n_planes, dim=dim,
                  id_col=id_col, vec_col=vec_col)
    score = (g.groupBy("src")
             .agg(F.count(F.lit(1)).cast("long").alias("k_used"),
                  F.expr("sum(CAST(round(cos * 1000000, 0) AS BIGINT))"
                         " DIV count(1)").cast("long")
                  .alias("mean_cos_ppm")))
    nodes = vecs.select(F.col(id_col).alias("src"))
    s = nodes.join(score, "src", "left")
    have = s.filter(F.col("mean_cos_ppm").isNotNull())
    m1 = have.agg(F.expr(
        "CAST(percentile(mean_cos_ppm * 2, 0.5) AS BIGINT)")
        .alias("med2"))
    dv = (have.crossJoin(F.broadcast(m1))
          .withColumn("dev2",
                      F.abs(F.col("mean_cos_ppm") * 2 - F.col("med2"))))
    m2 = dv.agg(F.expr(
        "CAST(percentile(2 * dev2, 0.5) AS BIGINT)").alias("mad4"))
    fenced = (dv.crossJoin(F.broadcast(m2))
              .select("src", "k_used", "mean_cos_ppm",
                      (F.expr("dev2 * 10000 > 22239 * mad4")
                       & (F.col("mean_cos_ppm") * 2 < F.col("med2")))
                      .cast("int").alias("is_outlier")))
    isolated = (s.filter(F.col("mean_cos_ppm").isNull())
                .select("src", F.lit(0).cast("long").alias("k_used"),
                        F.lit(None).cast("long").alias("mean_cos_ppm"),
                        F.lit(1).cast("int").alias("is_outlier")))
    return (fenced.unionByName(isolated)
            .select(F.col("src").alias(id_col), "k_used",
                    "mean_cos_ppm", "is_outlier"))


def triplet_mining(vecs: DataFrame, n_planes: int = 3, dim: int = 64,
                   margin_ppm: int = 50000, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   label_col: str = "label") -> DataFrame:
    """Hard-example triplet mining over a labeled embedding corpus
    [K: the batch-hard mining step of metric-learning / contrastive
    fine-tuning (FaceNet-style): per anchor, the hardest POSITIVE
    (same label, LOWEST cosine — the most distant example the model
    must still pull in) and the hardest NEGATIVE (different label,
    HIGHEST cosine — the impostor it must push away), plus the margin
    violation flag that selects which triplets carry gradient].
    Candidates come from the anchor's LSH sign-bucket only — mining
    against the full corpus is quadratic; in-bucket mining is the
    standard scale shape and biases toward NEAR candidates, which is
    exactly where hard negatives live (hard positives are mined
    within whatever the bucket retains — approximate by design,
    same recall/compute trade as ann_lsh_topk via n_planes).

    Per anchor: (pos_id, cos_pos), (neg_id, cos_neg), in-bucket
    candidate counts, and violation = cos_neg + margin > cos_pos on
    EXACT ppm integers (cosines are round6, so *1e6 re-rounded is an
    exact BIGINT — a raw double compare would be a cross-engine hash
    hazard). Anchors lacking a same-label or different-label bucket
    mate are dropped (inner semantics — no gradient without both).

    Shape: one vectorized bucket matmul pandas_udf, bucket-key
    equi-self-join (never all-pairs), then ONE hash agg per anchor —
    the hardest pos/neg fall out of min/max over (cos, id) structs,
    no rank window at all. Deterministic ties: lowest candidate id
    (the negative side orders a min-struct by (-cos_ppm, cid), so the
    tie-break never negates the id itself). NOTE: ``id_col`` must be
    castable to BIGINT — the output pins pos_id/neg_id to LongType
    for the cross-engine hash; non-numeric ids come out NULL there.
    At 10^9 vectors: more planes + multi-probe, and co-partition the
    two join sides by bucket."""
    planes = hyperplanes(n_planes, dim)
    b = lsh_bucket(vecs.select(F.col(id_col).alias("aid"),
                               F.col(vec_col).alias("av"),
                               F.col(label_col).alias("albl")),
                   "av", planes)
    a = b.select("aid", "av", "albl", "bucket")
    c = b.select(F.col("aid").alias("cid"), F.col("av").alias("cv"),
                 F.col("albl").alias("clbl"), "bucket")
    sim = (a.join(c, "bucket")
           .filter(F.col("aid") != F.col("cid"))
           .withColumn("cos", F.round(
               _dot(_as_double(F.col("av")), _as_double(F.col("cv")))
               / (_norm(_as_double(F.col("av")))
                  * _norm(_as_double(F.col("cv")))), 6))
           .withColumn("cos_ppm", F.expr(
               "CAST(round(cos * 1000000, 0) AS BIGINT)")))
    same = F.col("albl") == F.col("clbl")
    agg = (sim.groupBy("aid", "albl")
           .agg(F.min(F.when(same, F.struct(F.col("cos_ppm"),
                                            F.col("cid"))))
                .alias("pos"),
                F.min(F.when(~same, F.struct(
                    (-F.col("cos_ppm")).alias("inv_ppm"),
                    F.col("cid"))))
                .alias("neg"),
                F.sum(same.cast("long")).alias("n_pos_cand"),
                F.sum((~same).cast("long")).alias("n_neg_cand")))
    return (agg.filter(F.col("pos").isNotNull()
                       & F.col("neg").isNotNull())
            .select(F.col("aid").alias(id_col),
                    F.col("albl").alias(label_col),
                    F.col("pos.cid").cast("long").alias("pos_id"),
                    F.col("pos.cos_ppm").cast("long").alias("pos_ppm"),
                    F.col("neg.cid").cast("long").alias("neg_id"),
                    (-F.col("neg.inv_ppm")).cast("long").alias("neg_ppm"),
                    F.col("n_pos_cand").cast("long").alias("n_pos_cand"),
                    F.col("n_neg_cand").cast("long").alias("n_neg_cand"),
                    (-F.col("neg.inv_ppm") + F.lit(margin_ppm)
                     > F.col("pos.cos_ppm")).cast("int")
                    .alias("violation")))
