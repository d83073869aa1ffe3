"""P17 — the reference's read path: free-text query → ranked subjects.

Reference lifecycle [K] (`ontosearch search "<query>"`): tokenize the
query, score it against concept labels by word-vector cosine, then rank
datasets by the cached CDS matrix. Here: reuse P3/P4/P7 on the single
query string driver-side (numpy — one row, no cluster work), then one
broadcast semi-join + aggregation over the distributed ``cds_scores``
table, per-group top-n via window rank (never a global sort).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import semantics as S
from ..operators.linking import concept_matrix, score_surfaces


def search(query: str, cds: DataFrame, ontology_pdf: pd.DataFrame,
           top_n: int = 10) -> DataFrame:
    """Rank conversation subjects for a free-text query.

    Returns (subj_key, rank, search_score, matched_concepts).
    """
    spark = cds.sparkSession
    norm = S.normalize_text(query)
    gaz = {S.normalize_text(c): c for c in ontology_pdf["pref_label"]}
    surfaces = [m[0] for m in S.find_mentions(norm, gaz)] or norm.split()
    ids, cmat = concept_matrix(ontology_pdf)
    scores = score_surfaces(sorted(set(surfaces)), ids, cmat,
                            top_k=S.TOP_K, threshold=S.COS_THRESHOLD)
    if scores.empty:
        return spark.createDataFrame(
            [], "subj_key string, rank int, search_score double, matched_concepts array<string>")
    qvec = (
        scores.groupby("concept_id", as_index=False)["cos_sim"].max()
        .rename(columns={"cos_sim": "q_score"})
    )
    q_df = spark.createDataFrame(qvec, schema="concept_id string, q_score double")
    ranked = (
        cds.join(F.broadcast(q_df), "concept_id", "inner")
        .groupBy("subj_key")
        .agg(
            F.round(F.sum(F.col("score") * F.col("q_score")), S.SCORE_DECIMALS)
            .alias("search_score"),
            F.array_sort(F.collect_set("concept_id")).alias("matched_concepts"),
        )
        .orderBy(F.desc("search_score"), F.asc("subj_key"))
        .limit(top_n)
        .withColumn("rank", F.row_number().over(
            Window.orderBy(F.desc("search_score"), F.asc("subj_key"))))
        .select("subj_key", "rank", "search_score", "matched_concepts")
    )
    return ranked
