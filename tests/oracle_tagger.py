"""Pinned mini-oracle: pure pandas/numpy reimplementation of the
reference tagger semantics (SURVEY.md §5.2.1).

This stands in for "the reference implementation's tagger outputs"
(BASELINE.json) because /root/reference is EMPTY in this sandbox
(SURVEY.md §0). It deliberately shares only the *data* definitions
(vocabulary, ontology, embeddings, normalization, n-gram matching) with
the engine via ``otd_semantic_framework_spark.semantics``; every
*pipeline* step — candidate scoring, canonicalization, triple rules,
dedup, CDS propagation — is re-implemented here in independent
row-iterating pandas code, so an algorithmic bug in the Spark DataFrame
implementation cannot be mirrored here.

Formulas (SURVEY.md P4/P7/P8/P9/P12, FIXTURES.md B4):
  cos threshold 0.8, top-k 5, link = 0.5*cos + 0.5*wup(c, c_top),
  CDS: max_c tag(s,c)*wup(c,c'), threshold 0.8.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from otd_semantic_framework_spark import semantics as S


def oracle_concept_similarity(concepts: list[S.Concept]) -> pd.DataFrame:
    rows = []
    for a in concepts:
        for b in concepts:
            rows.append((a.concept_id, b.concept_id, S.wup_similarity(a, b)))
    return pd.DataFrame(rows, columns=["concept_a", "concept_b", "wup"])


def oracle_triples(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Full tagger: transcripts → deduped (subj,pred,obj,conv,turn,score)."""
    concepts = S.build_ontology()
    gaz = S.build_gazetteer(concepts)
    wup = {
        (r.concept_a, r.concept_b): r.wup
        for r in oracle_concept_similarity(concepts).itertuples()
    }
    cvecs = {c.concept_id: S.phrase_vector(S.normalize_text(c.pref_label)).astype(np.float64)
             for c in concepts}

    triples: list[tuple] = []

    # --- mentions rule (P3→P9→P12) -------------------------------------
    for row in transcripts.itertuples():
        norm = S.normalize_text(row.text)
        for surface, _start, _end in S.find_mentions(norm, gaz):
            mvec = S.phrase_vector(surface).astype(np.float64)
            sims = []
            for cid, cvec in cvecs.items():
                cos = round(float(mvec @ cvec), S.SCORE_DECIMALS)
                if cos >= S.COS_THRESHOLD:
                    sims.append((cid, cos))
            if not sims:
                continue
            sims.sort(key=lambda x: (-x[1], x[0]))
            sims = sims[:S.TOP_K]
            top_cid = sims[0][0]
            best = None
            for cid, cos in sims:
                link = round(S.LINK_ALPHA * cos
                             + (1 - S.LINK_ALPHA) * wup.get((cid, top_cid), 0.0),
                             S.SCORE_DECIMALS)
                key = (-link, cid)
                if best is None or key < best[0]:
                    best = (key, cid, link)
            _, cid, link = best
            triples.append((f"turn:{row.conv_id}:{row.turn_idx}", "mentions",
                            cid, row.conv_id, row.turn_idx, link))

    # --- uses_tool rule -------------------------------------------------
    for row in transcripts.itertuples():
        if row.tool is not None and not (isinstance(row.tool, float) and pd.isna(row.tool)):
            triples.append((f"turn:{row.conv_id}:{row.turn_idx}", "uses_tool",
                            f"tool:{row.tool}", row.conv_id, row.turn_idx, 1.0))

    # --- replies_to rule ------------------------------------------------
    for conv_id, grp in transcripts.sort_values(["conv_id", "turn_idx"]).groupby("conv_id"):
        prev = None
        for row in grp.itertuples():
            if prev is not None:
                triples.append((f"turn:{conv_id}:{row.turn_idx}", "replies_to",
                                f"turn:{conv_id}:{prev}", conv_id, row.turn_idx, 1.0))
            prev = row.turn_idx

    df = pd.DataFrame(triples, columns=["subj", "pred", "obj", "conv_id",
                                        "turn_idx", "score"])
    # dedup: set semantics, max score
    return (
        df.groupby(["subj", "pred", "obj"], as_index=False)
        .agg(conv_id=("conv_id", "min"), turn_idx=("turn_idx", "min"),
             score=("score", "max"))
        .round({"score": S.SCORE_DECIMALS})
        [["subj", "pred", "obj", "conv_id", "turn_idx", "score"]]
        .sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    )


def oracle_cds(triples: pd.DataFrame) -> pd.DataFrame:
    concepts = S.build_ontology()
    wup_df = oracle_concept_similarity(concepts)
    tags = (
        triples[triples.pred == "mentions"]
        .groupby(["conv_id", "obj"], as_index=False)["score"].max()
        .rename(columns={"obj": "concept_id", "score": "tag_score"})
    )
    j = tags.merge(wup_df, left_on="concept_id", right_on="concept_a")
    j["score"] = j.tag_score * j.wup
    out = (
        j.assign(subj_key="conv:" + j.conv_id)
        .groupby(["subj_key", "concept_b"], as_index=False)["score"].max()
        .rename(columns={"concept_b": "concept_id"})
    )
    out["score"] = out["score"].round(S.SCORE_DECIMALS)
    return out[out.score >= S.CDS_THRESHOLD].sort_values(
        ["subj_key", "concept_id"]).reset_index(drop=True)
