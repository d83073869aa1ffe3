"""P6/P7/P9/P10 — linking: both physical strategies agree; candidates
respect threshold/top-k; canonicalization is deterministic."""

from pyspark.sql import functions as F

from otd_semantic_framework_spark import semantics as S
from otd_semantic_framework_spark.operators.linking import (
    canonicalize, link_candidates_arrow, link_candidates_broadcast)
from otd_semantic_framework_spark.operators.mentions import (
    detect_mentions, explode_mentions)
from otd_semantic_framework_spark.operators.normalize import normalize_turns
from otd_semantic_framework_spark.operators.wup import concept_similarity
from otd_semantic_framework_spark.sources.fixtures import ontology_spark


def _mentions(tiny_df):
    gaz = S.build_gazetteer(S.build_ontology())
    return explode_mentions(detect_mentions(normalize_turns(tiny_df), gaz)), gaz


def _key(rows):
    return sorted((r.mention_id, r.concept_id, round(r.cos_sim, 6)) for r in rows)


def test_arrow_and_broadcast_paths_agree(spark, tiny_df, ontology_pdf):
    mentions, gaz = _mentions(tiny_df)
    a = _key(link_candidates_arrow(mentions, ontology_pdf).collect())
    b = _key(link_candidates_broadcast(mentions, ontology_pdf, gaz).collect())
    assert a == b
    assert len(a) > 0


def test_candidates_threshold_topk(spark, tiny_df, ontology_pdf):
    mentions, gaz = _mentions(tiny_df)
    cands = link_candidates_broadcast(mentions, ontology_pdf, gaz)
    rows = cands.collect()
    assert all(r.cos_sim >= S.COS_THRESHOLD for r in rows)
    counts = cands.groupBy("mention_id").count().collect()
    assert all(r["count"] <= S.TOP_K for r in counts)
    # every gazetteer mention must self-match its own concept label (cos≈1)
    self_hits = cands.filter(F.col("cos_sim") >= 0.999999).count()
    assert self_hits > 0


def test_canonicalize_one_per_mention(spark, tiny_df, ontology_pdf):
    mentions, gaz = _mentions(tiny_df)
    cands = link_candidates_broadcast(mentions, ontology_pdf, gaz)
    sim = concept_similarity(ontology_spark(spark))
    canon = canonicalize(cands, sim)
    n_mentions = mentions.select("mention_id").distinct().count()
    n_linked = cands.select("mention_id").distinct().count()
    assert canon.count() == n_linked <= n_mentions
    assert canon.select("mention_id").distinct().count() == n_linked
    # deterministic across partitionings
    canon2 = canonicalize(
        link_candidates_broadcast(mentions.repartition(13), ontology_pdf, gaz), sim)
    k1 = sorted((r.mention_id, r.concept_id, r.link_score) for r in canon.collect())
    k2 = sorted((r.mention_id, r.concept_id, r.link_score) for r in canon2.collect())
    assert k1 == k2


def test_precomputed_canonical_equals_compute_path(spark, tiny_df, ontology_pdf):
    """The zero-shuffle broadcast canonical table (P7→P9 precomputed)
    must equal the full compute path (arrow candidates → windows → wup
    join) mention for mention."""
    from otd_semantic_framework_spark.operators.linking import (
        canonicalize_broadcast, surface_canonical_table)
    from tests.oracle_tagger import oracle_concept_similarity

    mentions, gaz = _mentions(tiny_df)
    sim = concept_similarity(ontology_spark(spark))
    compute = canonicalize(link_candidates_arrow(mentions, ontology_pdf), sim)
    table = surface_canonical_table(
        ontology_pdf, gaz, oracle_concept_similarity(S.build_ontology()))
    fast = canonicalize_broadcast(mentions, table)
    k1 = sorted((r.mention_id, r.concept_id, round(r.link_score, 6))
                for r in compute.collect())
    k2 = sorted((r.mention_id, r.concept_id, round(r.link_score, 6))
                for r in fast.collect())
    assert k1 == k2
