"""P6 — embedding providers.

Default (deterministic, production-recommended): the hash-derived
token-embedding table from ``semantics.token_vector`` — broadcast
gather + mean-pool, reproducible at any parallelism.

Optional (flagged, SURVEY.md §7 risk 2): ``pyspark.ml.feature.Word2Vec``
trained on the corpus. MLlib Word2Vec is seed-able but its negative
sampling is parallelism-sensitive — two cluster layouts can give
slightly different vectors — so it must never feed the
correctness-gated path; it exists for parity with the reference's
word2vec autotagging and for offline experimentation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_embedding_table(spark, dim: int = 64) -> DataFrame:
    """The deterministic vocab embedding table (token, vector)."""
    from .. import semantics as S
    rows = [(t, [float(x) for x in S.token_vector(t, dim)]) for t in S.VOCAB]
    return spark.createDataFrame(rows, f"token string, vector array<float>")


def train_word2vec(transcripts: DataFrame, dim: int = 64, seed: int = 42,
                   min_count: int = 2, num_partitions: int = 1):
    """Corpus-trained Word2Vec (flagged path). num_partitions=1 maximizes
    determinism at the cost of parallel training speed.

    Returns (model, token_vectors_df: token string, vector array<float>).
    """
    from pyspark.ml.feature import Word2Vec
    from pyspark.ml.functions import vector_to_array

    from .normalize import normalize_turns
    corpus = (normalize_turns(transcripts)
              .select(F.split(F.col("norm_text"), " ").alias("tokens"))
              .filter(F.size("tokens") > 0))
    w2v = Word2Vec(vectorSize=dim, seed=seed, minCount=min_count,
                   numPartitions=num_partitions,
                   inputCol="tokens", outputCol="vec")
    model = w2v.fit(corpus)
    vecs = model.getVectors().select(
        F.col("word").alias("token"),
        F.transform(vector_to_array(F.col("vector")),
                    lambda x: x.cast("float")).alias("vector"))
    return model, vecs


def mention_embeddings(mentions: DataFrame, token_vectors: DataFrame,
                       dim: int = 64) -> DataFrame:
    """Mean-pooled, L2-normalized mention embeddings from a token-vector
    table — pure DataFrame algebra (explode tokens → broadcast join →
    positional mean via aggregate), no Python.
    """
    toks = mentions.withColumn(
        "tok", F.explode(F.split(F.col("surface"), " ")))
    joined = toks.join(F.broadcast(token_vectors),
                       toks.tok == token_vectors.token, "left")
    zeros = F.array_repeat(F.lit(0.0).cast("float"), dim)
    summed = (joined
              .withColumn("v", F.coalesce(F.col("vector"), zeros))
              .groupBy("mention_id")
              .agg(
                  F.aggregate(
                      F.collect_list("v"), zeros,
                      lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
                  ).alias("sum_vec"),
                  F.count(F.lit(1)).alias("n_toks"),
              ))
    mean = F.transform(F.col("sum_vec"),
                       lambda x: x / F.col("n_toks").cast("float"))
    norm = F.sqrt(F.aggregate(
        F.transform(mean, lambda x: (x * x).cast("double")),
        F.lit(0.0), lambda a, v: a + v))
    unit = F.transform(mean, lambda x: F.when(norm > 0, (x / norm).cast("float"))
                       .otherwise(F.lit(0.0).cast("float")))
    return (summed.select("mention_id", unit.alias("embedding")))
