"""P14 — CDS (concept–subject similarity) score table.

The reference multiplies its tagging matrix by the concept–concept
Wu-Palmer matrix and thresholds, caching the result (the "CDS/autotag
score tables" the north star names) [K]. Relationally:

    tag(s, c)   = max over turns of link_score for (conv s, concept c)
    cds(s, c')  = max over c of tag(s, c) * wup(c, c')     , >= θ

Implemented as: conv-level tag aggregation (map-side partial agg), then
a broadcast join against the tiny concept_similarity table (the matrix
"multiply" becomes a broadcast hash join + re-aggregation — no shuffle
of the big side beyond the tag groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import semantics as S


def cds_scores(triples: DataFrame, concept_sim: DataFrame,
               threshold: float = S.CDS_THRESHOLD) -> DataFrame:
    tags = (
        triples.filter(F.col("pred") == "mentions")
        .groupBy("conv_id", F.col("obj").alias("concept_id"))
        .agg(F.max("score").alias("tag_score"))
    )
    return (
        tags.join(F.broadcast(concept_sim),
                  tags.concept_id == concept_sim.concept_a, "inner")
        .groupBy(
            F.concat(F.lit("conv:"), F.col("conv_id")).alias("subj_key"),
            F.col("concept_b").alias("concept_id"),
        )
        .agg(F.round(F.max(F.col("tag_score") * F.col("wup")),
                     S.SCORE_DECIMALS).alias("score"))
        .filter(F.col("score") >= threshold)
    )
