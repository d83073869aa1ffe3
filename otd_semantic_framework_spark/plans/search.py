"""P17 — the reference's read path: free-text query → ranked subjects.

Reference lifecycle [K] (`ontosearch search "<query>"`): tokenize the
query, score it against concept labels by word-vector cosine AND a
taxonomy path measure, then rank datasets by the cached CDS matrix.
Here: reuse P3/P4/P7 on the single query string driver-side (numpy —
one row, no cluster work), then one broadcast semi-join + aggregation
over the distributed ``cds_scores`` table, per-group top-n via window
rank (never a global sort).

``wup_pdf`` enables the reference's lexical+taxonomic blend on the
QUERY side (VERDICT r1 "What's missing" #3): each surface's candidate
concepts are rescored α·cos + (1−α)·wup(c, cos-top anchor) — the exact
P9 canonicalization blend — before the per-concept max. Without it the
scoring is pure cosine (round-1 behavior).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import semantics as S
from ..operators.linking import concept_matrix, score_surfaces


def blend_query_scores(scores: pd.DataFrame, wup_pdf: pd.DataFrame,
                       alpha: float = S.LINK_ALPHA) -> pd.DataFrame:
    """Per-surface taxonomy blend of query candidate scores (driver-side
    pandas — the query is one row). For each surface: anchor = cos-top
    concept (ties → smallest id); every candidate's score becomes
    round(α·cos + (1−α)·wup(candidate, anchor), 6)."""
    wup = {(r.concept_a, r.concept_b): r.wup for r in wup_pdf.itertuples()}
    out = []
    for surface, grp in scores.groupby("surface"):
        g = grp.sort_values(["cos_sim", "concept_id"],
                            ascending=[False, True])
        anchor = g.iloc[0]["concept_id"]
        for r in g.itertuples():
            # round_half_away, NOT builtin round: the blended value is
            # hash-compared against SQL ROUND (half-away) in the oracle
            blended = float(S.round_half_away(
                alpha * r.cos_sim
                + (1 - alpha) * wup.get((r.concept_id, anchor), 0.0),
                S.SCORE_DECIMALS))
            out.append((surface, r.concept_id, blended))
    return pd.DataFrame(out, columns=["surface", "concept_id", "cos_sim"])


def search(query: str, cds: DataFrame, ontology_pdf: pd.DataFrame,
           top_n: int = 10, wup_pdf: pd.DataFrame | None = None,
           alpha: float = S.LINK_ALPHA) -> DataFrame:
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
    if wup_pdf is not None:
        scores = blend_query_scores(scores, wup_pdf, alpha)
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
