"""KG-embedding triple plausibility scoring (TransE-style [K]).

TransE models a fact (h, r, t) as a translation h + r ≈ t in embedding
space and scores plausibility by -||h + r - t||₁; training evaluates by
ranking the true tail against corrupted tails [K: Bordes et al. 2013,
public]. This module implements the SCORING/EVALUATION dataflow — the
part that runs at corpus scale — over deterministic hash-initialized
fixed-point embeddings: each entity/relation component is a signed byte
decoded from a pair of md5 hex digits, so the whole computation is
exact integer arithmetic that replays bit-identically in ANSI SQL
(the repo's oracle convention). A trained model swaps in real vectors
via the same column contract; the hash init is the documented stand-in
(same seam as the hash embeddings in ``operators/embed.py``).

Scale shape: map-only — three md5s per triple, a fixed ``dim``-term
integer expression, then ONE predicate-keyed hash aggregation with
algebraic (sum/count) partials. No joins, no windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000
TRANSE_DIM = 4


def _component(key: Column, j: int) -> Column:
    """Signed-byte component j of the hash embedding of ``key``: md5
    hex digits (2j+1, 2j+2) decoded to 0..255, centered to -128..127."""
    return (F.conv(F.substring(F.md5(key), 2 * j + 1, 2), 16, 10)
            .cast("int") - 128)


def transe_margins(triples: DataFrame, dim: int = TRANSE_DIM) -> DataFrame:
    """Per-predicate TransE evaluation summary over distinct triples.

    For each (subj, pred, obj): h = emb('ent:'+subj), r = emb('rel:'+
    pred), t = emb('ent:'+obj), and a corrupted tail t' = emb('corrupt:'
    +subj+pred+obj) (deterministic negative sampling — unique per
    triple, engine-portable). true_score = Σ|h+r−t|, corrupt_score =
    Σ|h+r−t'| (lower = more plausible). Output per predicate:

    - n_triples, sum_true_score, sum_corrupt_score (exact integers),
    - n_true_better — triples where the true tail outranks the
      corrupted one (strict),
    - hits_ppm = n_true_better · 1e6 DIV n_triples (the hits@1-style
      rate against one negative),
    - margin_sum = Σ(corrupt − true) — positive when the scorer
      separates true facts from corruptions.
    """
    t3 = triples.select("subj", "pred", "obj").distinct()
    h_key = F.concat(F.lit("ent:"), F.col("subj"))
    r_key = F.concat(F.lit("rel:"), F.col("pred"))
    t_key = F.concat(F.lit("ent:"), F.col("obj"))
    c_key = F.concat(F.lit("corrupt:"), F.col("subj"), F.col("pred"),
                     F.col("obj"))
    true_score = sum(
        (F.abs(_component(h_key, j) + _component(r_key, j)
               - _component(t_key, j)) for j in range(1, dim)),
        F.abs(_component(h_key, 0) + _component(r_key, 0)
              - _component(t_key, 0)))
    corrupt_score = sum(
        (F.abs(_component(h_key, j) + _component(r_key, j)
               - _component(c_key, j)) for j in range(1, dim)),
        F.abs(_component(h_key, 0) + _component(r_key, 0)
              - _component(c_key, 0)))
    scored = t3.select(
        "pred",
        true_score.cast("long").alias("true_score"),
        corrupt_score.cast("long").alias("corrupt_score"))
    agg = (scored.groupBy("pred")
           .agg(F.count(F.lit(1)).cast("long").alias("n_triples"),
                F.sum("true_score").cast("long").alias("sum_true_score"),
                F.sum("corrupt_score").cast("long")
                 .alias("sum_corrupt_score"),
                F.sum(F.when(F.col("true_score") < F.col("corrupt_score"),
                             1).otherwise(0))
                 .cast("long").alias("n_true_better"),
                F.sum(F.col("corrupt_score") - F.col("true_score"))
                 .cast("long").alias("margin_sum")))
    return agg.select(
        "pred", "n_triples", "sum_true_score", "sum_corrupt_score",
        "n_true_better",
        F.expr(f"n_true_better * {PPM} DIV n_triples").cast("long")
         .alias("hits_ppm"),
        "margin_sum")
