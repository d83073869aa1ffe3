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

Round 2 split: the propagation is exposed standalone
(:func:`propagate_cds`) so it can run over ANY tag table — pure autotag
(:func:`cds_scores`), the manual∪auto merge (operators/manual.py), or a
multi-configuration tag graph (a ``config_id`` column is picked up
automatically and configurations never bleed into each other — the
groupBy key includes it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import semantics as S


def conv_tags(triples: DataFrame) -> DataFrame:
    """Autotag tags at conversation granularity: tag(s, c) = max over
    the conv's turns of the mention link score. Output
    (subj_key, concept_id, tag_score)."""
    return (
        triples.filter(F.col("pred") == "mentions")
        .groupBy(
            F.concat(F.lit("conv:"), F.col("conv_id")).alias("subj_key"),
            F.col("obj").alias("concept_id"),
        )
        .agg(F.max("score").alias("tag_score"))
    )


def propagate_cds(tags: DataFrame, concept_sim: DataFrame,
                  threshold: float = S.CDS_THRESHOLD) -> DataFrame:
    """Wu-Palmer propagation over a (subj_key, concept_id, tag_score)
    table: cds(s, c') = max over c of tag(s, c) * wup(c, c'), >= θ.

    A ``config_id`` column, when present, joins the grouping key — one
    physical table holds several named tagging graphs with no bleed
    (pytest-pinned by tests/test_manual_tags.py)."""
    keys = ["config_id"] if "config_id" in tags.columns else []
    return (
        tags.join(F.broadcast(concept_sim),
                  tags.concept_id == concept_sim.concept_a, "inner")
        .groupBy(*keys, "subj_key", F.col("concept_b"))
        .agg(F.round(F.max(F.col("tag_score") * F.col("wup")),
                     S.SCORE_DECIMALS).alias("score"))
        .filter(F.col("score") >= threshold)
        .select(*keys, "subj_key",
                F.col("concept_b").alias("concept_id"), "score")
    )


def cds_scores(triples: DataFrame, concept_sim: DataFrame,
               threshold: float = S.CDS_THRESHOLD,
               manual_tags: DataFrame | None = None) -> DataFrame:
    """CDS from autotag triples, optionally merged with a curated manual
    tag table (the reference's second first-class tagging input [K]) —
    the merge is set-semantics max per (subj, concept)."""
    tags = conv_tags(triples)
    if manual_tags is not None:
        from .manual import merge_tag_sources
        tags = merge_tag_sources(tags, manual_tags).drop("sources")
    return propagate_cds(tags, concept_sim, threshold)


def merge_tag_state(state: DataFrame, delta_tags: DataFrame) -> DataFrame:
    """Incremental-view-maintenance merge for the tag state: tag(s, c)
    is a MAX aggregate, so any append batch folds in with one set-
    semantic max per (subj_key, concept_id) — order- and
    batch-boundary-independent (merging batch A then B equals one merge
    of A∪B, even when a conversation spans batches)."""
    return (state.unionByName(delta_tags)
            .groupBy("subj_key", "concept_id")
            .agg(F.max("tag_score").alias("tag_score")))


def incremental_cds_update(cds: DataFrame, state: DataFrame,
                           delta_tags: DataFrame, concept_sim: DataFrame,
                           threshold: float = S.CDS_THRESHOLD,
                           ) -> tuple[DataFrame, DataFrame]:
    """Maintain the CDS table under an append of new tag evidence
    WITHOUT full recomputation — the P14/P16 growth path.

    CDS is conversation-local: cds(s, ·) depends only on tag(s, ·), so
    an append touching the subject set A requires re-propagating ONLY
    A's rows. Steps: (1) max-merge the delta into the tag state;
    (2) re-run the broadcast Wu-Palmer propagation over the merged
    state restricted to A (a semi join — the big side is filtered
    before the propagate work); (3) splice: keep every CDS row whose
    subject is outside A (anti join), union the recomputed rows.
    Rows that newly cross the threshold appear, and none can vanish
    (tag maxes are monotone under appends), but the splice is correct
    either way. Returns (new_state, new_cds); equality with a full
    recompute over the union is pytest- and driver-oracle-pinned.

    Scale shape: the delta's subject set A is tiny next to the
    accumulated state, and every join here is keyed on subj_key — with
    the state and CDS tables bucketed by subj_key (the P15 sink
    layout), the semi/anti joins are co-partitioned and the recompute
    cost is O(|A| × ontology), independent of history size.
    """
    affected = delta_tags.select("subj_key").distinct()
    new_state = merge_tag_state(state, delta_tags)
    recomputed = propagate_cds(
        new_state.join(affected, "subj_key", "semi"),
        concept_sim, threshold)
    new_cds = (cds.join(affected, "subj_key", "anti")
               .unionByName(recomputed))
    return new_state, new_cds
