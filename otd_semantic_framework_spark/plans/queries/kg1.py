"""Driver queries: `kg` domain (part 1).

Generated from plans/driver_queries.py by scripts/split_driver_queries.py
(round 5); original source order preserved. Do not edit the monolith
back into existence — edit here.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ... import semantics as S
from ...operators.linking import canonicalize
from ...operators.wup import concept_similarity
from ..driver_ontology import (driver_ancestors, driver_concepts,
                              driver_gazetteer, driver_scores, driver_wup,
                              values_sql)


from ._shared import *  # noqa: F401,F403

__all__ = [
    "q_kg_transcripts",
    "SQL_KG_TRANSCRIPTS",
    "q_kg_turn_assembly",
    "SQL_KG_TURN_ASSEMBLY",
    "q_kg_mentions",
    "SQL_KG_MENTIONS",
    "q_kg_candidates",
    "_sql_kg_candidates_body",
    "q_kg_canonical",
    "_sql_kg_canonical_body",
    "q_kg_triples",
    "_sql_kg_triples_body",
    "q_kg_inferred_triples",
    "_sql_kg_inferred_triples",
    "q_kg_cds",
    "_sql_kg_cds_body",
    "q_kg_wup_matrix",
    "_sql_kg_wup_matrix",
    "q_kg_search",
    "_sql_kg_search",
    "q_kg_ontology_diff",
    "_sql_kg_ontology_diff",
    "q_kg_branch_rollup",
    "_sql_kg_branch_rollup",
    "q_kg_search_closure",
    "_sql_kg_search_closure",
    "q_kg_nt_export",
    "_sql_kg_nt_export",
    "q_kg_batch_search",
    "_sql_kg_batch_search",
    "_auto_tags_df",
    "_merged_tags_df",
    "q_kg_manual_merge",
    "_sql_manual_merge_ctes",
    "_sql_kg_manual_merge",
    "q_kg_manual_cds",
    "_sql_kg_manual_cds",
    "q_kg_config_cds",
    "_sql_kg_config_cds",
    "q_kg_config_search",
    "_sql_kg_config_search",
    "q_kg_search_wup",
    "_sql_kg_search_wup",
    "q_kg_two_hop",
    "_sql_kg_two_hop",
    "q_kg_mentions_regex",
    "_sql_kg_mentions_regex",
    "q_kg_fast_pipeline",
    "_sql_kg_fast_pipeline",
    "q_kg_materialize",
    "q_kg_ontology_ingest",
    "_sql_kg_ontology_ingest",
    "q_kg_resume_manifest",
    "_sql_kg_resume_manifest",
    "q_kg_dcat_ingest",
    "_sql_kg_dcat_ingest",
    "q_kg_eval_pr",
    "_sql_kg_eval_pr",
    "q_kg_pagerank",
    "_sql_kg_pagerank",
    "q_kg_concept_lift",
    "_sql_kg_concept_lift",
    "q_kg_bgp_query",
    "_sql_kg_bgp_query",
    "q_kg_construct_query",
    "_sql_kg_construct_query",
    "q_kg_validate",
    "_sql_kg_validate",
    "q_kg_path_query",
    "_sql_kg_path_query",
    "q_kg_bgp_optional",
    "_sql_kg_bgp_optional",
    "q_kg_incremental_cds",
    "q_kg_negative_samples",
    "_sql_kg_negative_samples",
    "q_kg_tool_sequences",
    "SQL_KG_TOOL_SEQUENCES",
    "q_kg_tool_latency",
    "SQL_KG_TOOL_LATENCY",
    "q_kg_triangles",
    "SQL_KG_TRIANGLES",
    "q_kg_conv_rollup",
    "SQL_KG_CONV_ROLLUP",
    "q_kg_episodes",
    "_sql_kg_episodes",
    "q_kg_search_ndcg",
    "_sql_kg_search_ndcg",
    "q_kg_degree_dist",
    "_sql_kg_degree_dist",
    "q_kg_coverage",
    "_sql_kg_coverage",
    "q_kg_clustering",
    "SQL_KG_CLUSTERING",
    "q_kg_concept_drift",
    "SQL_KG_CONCEPT_DRIFT",
    "q_kg_related",
    "SQL_KG_RELATED",
    "q_kg_resnik",
    "_sql_kg_resnik",
    "q_kg_kcore",
    "_sql_kg_kcore",
    "q_kg_lin_jc",
    "_sql_kg_lin_jc",
    "q_kg_hits",
    "_sql_kg_hits",
    "q_kg_ask",
    "_sql_kg_ask",
    "q_kg_bfs",
    "_sql_kg_bfs",
    "q_kg_community",
    "_sql_kg_community",
    "q_kg_shortest_path",
    "_sql_kg_shortest_path",
    "q_kg_snapshot_asof",
    "_sql_kg_snapshot_asof",
    "q_kg_sparql_agg",
    "_sql_kg_sparql_agg",
    "q_kg_link_predict",
    "_sql_kg_link_predict",
    "q_kg_random_walks",
    "_sql_kg_random_walks",
    "q_kg_describe",
    "_sql_kg_describe",
    "q_kg_walk_pairs",
    "_sql_kg_walk_pairs",
    "q_kg_direct_mapping",
    "SQL_KG_DIRECT_MAPPING",
    "q_kg_fact_fusion",
    "_sql_kg_fact_fusion",
    "q_kg_open_relations",
    "_sql_kg_open_relations",
    "q_kg_dialogue_acts",
    "_sql_kg_dialogue_acts",
    "q_kg_property_stats",
    "_sql_kg_property_stats",
    "q_kg_coref_lite",
    "SQL_KG_COREF_LITE",
    "q_kg_entity_salience",
]


def q_kg_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derived_transcripts(spark, sf_dir)


SQL_KG_TRANSCRIPTS = f"WITH transcripts AS ({TRANSCRIPTS_CTE}) SELECT * FROM transcripts"


def q_kg_turn_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = derived_transcripts(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return t.select(
        "conv_id", "turn_idx", "role",
        F.row_number().over(w).alias("pos"),
        F.lag("turn_idx", 1).over(w).alias("prev_turn_idx"),
        F.lag("role", 1).over(w).alias("prev_role"),
        F.lead("turn_idx", 1).over(w).alias("next_turn_idx"),
        F.count(F.lit(1)).over(Window.partitionBy("conv_id")).alias("conv_len"),
    )


SQL_KG_TURN_ASSEMBLY = f"""
WITH transcripts AS ({TRANSCRIPTS_CTE})
SELECT conv_id, turn_idx, role,
       row_number() OVER w AS pos,
       lag(turn_idx, 1) OVER w AS prev_turn_idx,
       lag(role, 1) OVER w AS prev_role,
       lead(turn_idx, 1) OVER w AS next_turn_idx,
       count(*) OVER (PARTITION BY conv_id) AS conv_len
FROM transcripts
WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
"""


def q_kg_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _mentions_df(spark, sf_dir)


SQL_KG_MENTIONS = f"WITH {_MENTIONS_CTE} SELECT * FROM mentions"


def q_kg_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _mentions_df(spark, sf_dir).drop("concept_id")
    scores = _scores_df(spark)
    w = Window.partitionBy("conv_id", "turn_idx", "surface").orderBy(
        F.desc("cos_sim"), F.asc("concept_id"))
    return (
        m.join(F.broadcast(scores), "surface", "inner")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= S.TOP_K)
        .select("conv_id", "turn_idx", "surface", "concept_id",
                F.round("cos_sim", 6).alias("cos_sim"), "rnk")
    )


def _sql_kg_candidates_body() -> str:
    sc = values_sql(driver_scores().round({"cos_sim": 6}), "s")
    return f"""
WITH {_MENTIONS_CTE},
cand AS (
  SELECT m.conv_id, m.turn_idx, m.surface, s.concept_id,
         round(s.cos_sim, 6) AS cos_sim,
         row_number() OVER (PARTITION BY m.conv_id, m.turn_idx, m.surface
                            ORDER BY s.cos_sim DESC, s.concept_id ASC) AS rnk
  FROM (SELECT DISTINCT conv_id, turn_idx, surface FROM mentions) m
  JOIN {sc} ON m.surface = s.surface
)
SELECT * FROM cand WHERE rnk <= {S.TOP_K}
"""


def q_kg_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full P9 canonicalization over the derived corpus, reusing the
    production operator (linking.canonicalize) with a mention_id built
    from the (conv,turn,surface) key."""
    cands = q_kg_candidates(spark, sf_dir).withColumn(
        "mention_id", F.xxhash64("conv_id", "turn_idx", "surface"))
    canon = canonicalize(cands.select(
        "conv_id", "turn_idx", "mention_id", "surface", "concept_id", "cos_sim"),
        _wup_df(spark))
    return canon.select(
        "conv_id", "turn_idx", "surface", "concept_id",
        F.round("link_score", 6).alias("link_score"))


def _sql_kg_canonical_body(select: str = "SELECT conv_id, turn_idx, surface, concept_id, link_score FROM best WHERE rn = 1") -> str:
    sc = values_sql(driver_scores().round({"cos_sim": 6}), "s")
    wu = values_sql(driver_wup(), "w")
    return f"""
WITH {_MENTIONS_CTE},
cand AS (
  SELECT m.conv_id, m.turn_idx, m.surface, s.concept_id,
         round(s.cos_sim, 6) AS cos_sim,
         row_number() OVER (PARTITION BY m.conv_id, m.turn_idx, m.surface
                            ORDER BY s.cos_sim DESC, s.concept_id ASC) AS rnk
  FROM (SELECT DISTINCT conv_id, turn_idx, surface FROM mentions) m
  JOIN {sc} ON m.surface = s.surface
),
cand_k AS (SELECT * FROM cand WHERE rnk <= {S.TOP_K}),
top1 AS (SELECT conv_id, turn_idx, surface, concept_id AS top_concept_id
         FROM cand_k WHERE rnk = 1),
best AS (
  SELECT c.conv_id, c.turn_idx, c.surface, c.concept_id,
         round({S.LINK_ALPHA} * c.cos_sim + {1 - S.LINK_ALPHA} * coalesce(w.wup, 0.0), 6) AS link_score,
         row_number() OVER (PARTITION BY c.conv_id, c.turn_idx, c.surface
                            ORDER BY round({S.LINK_ALPHA} * c.cos_sim + {1 - S.LINK_ALPHA} * coalesce(w.wup, 0.0), 6) DESC,
                                     c.concept_id ASC) AS rn
  FROM cand_k c
  JOIN top1 t ON c.conv_id = t.conv_id AND c.turn_idx = t.turn_idx AND c.surface = t.surface
  LEFT JOIN {wu} ON w.concept_a = c.concept_id AND w.concept_b = t.top_concept_id
)
{select}
"""


def q_kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = derived_transcripts(spark, sf_dir)
    canon = q_kg_canonical(spark, sf_dir)
    subj = F.concat(F.lit("turn:"), F.col("conv_id"), F.lit(":"),
                    F.col("turn_idx").cast("string"))
    m = canon.select(subj.alias("subj"), F.lit("mentions").alias("pred"),
                     F.col("concept_id").alias("obj"),
                     F.col("link_score").alias("score"))
    u = t.filter(F.col("tool").isNotNull()).select(
        subj.alias("subj"), F.lit("uses_tool").alias("pred"),
        F.concat(F.lit("tool:"), F.col("tool")).alias("obj"),
        F.lit(1.0).alias("score"))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    r = (t.withColumn("prev_turn_idx", F.lag("turn_idx", 1).over(w))
         .filter(F.col("prev_turn_idx").isNotNull())
         .select(subj.alias("subj"), F.lit("replies_to").alias("pred"),
                 F.concat(F.lit("turn:"), F.col("conv_id"), F.lit(":"),
                          F.col("prev_turn_idx").cast("string")).alias("obj"),
                 F.lit(1.0).alias("score")))
    return (m.unionByName(u).unionByName(r)
            .groupBy("subj", "pred", "obj")
            .agg(F.round(F.max("score"), 6).alias("score")))


def _sql_kg_triples_body() -> str:
    canon = _sql_kg_canonical_body(
        "SELECT conv_id, turn_idx, surface, concept_id, link_score FROM best WHERE rn = 1")
    return f"""
WITH canon AS ({canon}),
transcripts2 AS ({TRANSCRIPTS_CTE}),
alltr AS (
  SELECT 'turn:' || conv_id || ':' || cast(turn_idx AS STRING) AS subj,
         'mentions' AS pred, concept_id AS obj, link_score AS score
  FROM canon
  UNION ALL
  SELECT 'turn:' || conv_id || ':' || cast(turn_idx AS STRING) AS subj,
         'uses_tool' AS pred, 'tool:' || tool AS obj, 1.0 AS score
  FROM transcripts2 WHERE tool IS NOT NULL
  UNION ALL
  SELECT 'turn:' || conv_id || ':' || cast(turn_idx AS STRING) AS subj,
         'replies_to' AS pred,
         'turn:' || conv_id || ':' || cast(prev_turn_idx AS STRING) AS obj,
         1.0 AS score
  FROM (SELECT conv_id, turn_idx,
               lag(turn_idx, 1) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_turn_idx
        FROM transcripts2) x
  WHERE prev_turn_idx IS NOT NULL
)
SELECT subj, pred, obj, round(max(score), 6) AS score
FROM alltr GROUP BY subj, pred, obj
"""


def q_kg_inferred_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12b SKOS-subsumption inference over the derived corpus: the
    production operator (operators/triples.py:infer_broader_triples)
    run on the canonical mention triples against the driver ontology —
    every asserted turn→concept edge also asserts the concept's strict
    ancestors at decay**levels_up. The ancestor expansion comes from
    the ontology frame's materialized root→self path (posexplode), and
    the oracle replays the same expansion as a Python-computed VALUES
    table joined in DuckDB."""
    import pandas as pd

    from ...operators.triples import infer_broader_triples, mention_triples
    cs = driver_concepts()
    onto = spark.createDataFrame(pd.DataFrame({
        "concept_id": [c.concept_id for c in cs],
        "depth": [c.depth for c in cs],
        "path": [list(c.path) for c in cs],
    }), "concept_id string, depth int, path array<string>")
    canon = q_kg_canonical(spark, sf_dir)
    inferred = infer_broader_triples(mention_triples(canon), onto)
    return inferred.select("subj", "pred", "obj", "score")


def _sql_kg_inferred_triples() -> str:
    from ..driver_ontology import driver_ancestors
    canon = _sql_kg_canonical_body(
        "SELECT conv_id, turn_idx, surface, concept_id, link_score FROM best WHERE rn = 1")
    av = values_sql(driver_ancestors(), "a")
    return f"""
WITH canon AS ({canon})
SELECT 'turn:' || conv_id || ':' || cast(turn_idx AS STRING) AS subj,
       'mentions_broader' AS pred, a.anc_id AS obj,
       round(max(link_score * a.decay), 6) AS score
FROM canon JOIN {av} ON a.concept_id = canon.concept_id
GROUP BY subj, pred, obj
"""


def q_kg_cds(spark: SparkSession, sf_dir: str) -> DataFrame:
    canon = q_kg_canonical(spark, sf_dir)
    tags = (canon.groupBy("conv_id", "concept_id")
            .agg(F.max("link_score").alias("tag_score")))
    wup = _wup_df(spark)
    return (
        tags.join(F.broadcast(wup), tags.concept_id == wup.concept_a, "inner")
        .groupBy(F.concat(F.lit("conv:"), F.col("conv_id")).alias("subj_key"),
                 F.col("concept_b").alias("cds_concept"))
        .agg(F.round(F.max(F.col("tag_score") * F.col("wup")), 6).alias("score"))
        .filter(F.col("score") >= S.CDS_THRESHOLD)
    )


def _sql_kg_cds_body() -> str:
    canon = _sql_kg_canonical_body(
        "SELECT conv_id, turn_idx, surface, concept_id, link_score FROM best WHERE rn = 1")
    wu = values_sql(driver_wup(), "w")
    return f"""
WITH canon AS ({canon}),
tags AS (
  SELECT conv_id, concept_id, max(link_score) AS tag_score
  FROM canon GROUP BY conv_id, concept_id
)
SELECT 'conv:' || t.conv_id AS subj_key, w.concept_b AS cds_concept,
       round(max(t.tag_score * w.wup), 6) AS score
FROM tags t JOIN {wu} ON w.concept_a = t.concept_id
GROUP BY subj_key, cds_concept
HAVING round(max(t.tag_score * w.wup), 6) >= {S.CDS_THRESHOLD}
"""


def q_kg_wup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 DataFrame algebra vs an independent SQL formulation in DuckDB."""
    import pandas as pd
    cs = driver_concepts()
    onto = spark.createDataFrame(pd.DataFrame({
        "concept_id": [c.concept_id for c in cs],
        "depth": [c.depth for c in cs],
        "path": [list(c.path) for c in cs],
    }), "concept_id string, depth int, path array<string>")
    return concept_similarity(onto).select(
        "concept_a", "concept_b", F.round("wup", 6).alias("wup"))


def _sql_kg_wup_matrix() -> str:
    import pandas as pd
    rows = []
    for c in driver_concepts():
        for pos, anc in enumerate(c.path, start=1):
            rows.append((c.concept_id, c.depth, anc, pos))
    anc = values_sql(pd.DataFrame(rows, columns=["concept_id", "depth", "anc_id", "anc_depth"]), "an")
    return f"""
WITH anc AS (SELECT * FROM {anc})
SELECT a.concept_id AS concept_a, b.concept_id AS concept_b,
       round(2.0 * max(a.anc_depth) / (a.depth + b.depth), 6) AS wup
FROM anc a JOIN anc b ON a.anc_id = b.anc_id AND a.anc_depth = b.anc_depth
GROUP BY a.concept_id, b.concept_id, a.depth, b.depth
"""


def q_kg_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P17 read path over the derived corpus, top-20."""
    scores = driver_scores()
    gaz = driver_gazetteer()
    norm = S.normalize_text(SEARCH_QUERY)
    surfaces = sorted({m[0] for m in S.find_mentions(norm, gaz)})
    q = (scores[scores.surface.isin(surfaces)]
         .groupby("concept_id", as_index=False)["cos_sim"].max()
         .rename(columns={"cos_sim": "q_score"}).round({"q_score": 6}))
    q_df = spark.createDataFrame(q, "concept_id string, q_score double")
    cds = q_kg_cds(spark, sf_dir)
    ranked = (
        cds.join(F.broadcast(q_df), cds.cds_concept == q_df.concept_id, "inner")
        .groupBy("subj_key")
        .agg(F.round(F.sum(F.col("score") * F.col("q_score")), 6).alias("search_score"))
    )
    # limit-then-rank (the plans/search.py:83 shape): orderBy+limit is
    # TakeOrderedAndProject (parallel per-partition heaps); the
    # partitionless rank window then runs over <= 20 rows, never the
    # full subject table.
    top = ranked.orderBy(F.desc("search_score"), F.asc("subj_key")).limit(20)
    w = Window.orderBy(F.desc("search_score"), F.asc("subj_key"))
    return (top.withColumn("rank", F.row_number().over(w))
            .select("subj_key", "rank", "search_score"))


def _sql_kg_search() -> str:
    import pandas as pd
    scores = driver_scores()
    gaz = driver_gazetteer()
    norm = S.normalize_text(SEARCH_QUERY)
    surfaces = sorted({m[0] for m in S.find_mentions(norm, gaz)})
    q = (scores[scores.surface.isin(surfaces)]
         .groupby("concept_id", as_index=False)["cos_sim"].max()
         .rename(columns={"cos_sim": "q_score"}).round({"q_score": 6}))
    qv = values_sql(pd.DataFrame(q), "q")
    cds = _sql_kg_cds_body()
    return f"""
WITH cds AS ({cds}),
ranked AS (
  SELECT c.subj_key, round(sum(c.score * q.q_score), 6) AS search_score
  FROM cds c JOIN {qv} ON q.concept_id = c.cds_concept
  GROUP BY c.subj_key
)
SELECT subj_key, rank, search_score FROM (
  SELECT subj_key, search_score,
         row_number() OVER (ORDER BY search_score DESC, subj_key ASC) AS rank
  FROM ranked
) WHERE rank <= 20
"""


def q_kg_ontology_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Taxonomy evolution diff (sources/rdf.py ontology_diff) between
    two deterministic ontology versions — the ops companion of the
    pipeline's ontology content fingerprint (the fingerprint says a
    checkpoint is stale; the diff says why). Corpus-independent like
    kg_ontology_ingest."""
    from ...sources.rdf import ontology_diff
    v1, v2 = _onto_versions_pdf()
    return ontology_diff(spark.createDataFrame(v1),
                         spark.createDataFrame(v2))


def _sql_kg_ontology_diff() -> str:
    v1, v2 = _onto_versions_pdf()
    ov = values_sql(v1, "o")
    nv = values_sql(v2, "n")
    return f"""
SELECT coalesce(o.concept_id, n.concept_id) AS concept_id,
       CASE WHEN o.concept_id IS NULL THEN 'added'
            WHEN n.concept_id IS NULL THEN 'removed'
            WHEN o.pref_label <> n.pref_label
                 AND o.parent_id IS DISTINCT FROM n.parent_id
              THEN 'relabeled+moved'
            WHEN o.pref_label <> n.pref_label THEN 'relabeled'
            WHEN o.parent_id IS DISTINCT FROM n.parent_id THEN 'moved'
       END AS status,
       o.pref_label AS old_label, n.pref_label AS new_label,
       o.parent_id AS old_parent, n.parent_id AS new_parent
FROM {ov} FULL OUTER JOIN {nv} ON o.concept_id = n.concept_id
WHERE CASE WHEN o.concept_id IS NULL THEN 'added'
           WHEN n.concept_id IS NULL THEN 'removed'
           WHEN o.pref_label <> n.pref_label
                AND o.parent_id IS DISTINCT FROM n.parent_id
             THEN 'relabeled+moved'
           WHEN o.pref_label <> n.pref_label THEN 'relabeled'
           WHEN o.parent_id IS DISTINCT FROM n.parent_id THEN 'moved'
      END IS NOT NULL
"""


def q_kg_branch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Taxonomy OLAP rollup: conversation tag mass aggregated to the
    ontology's depth-2 branches through the (concept → branch) ancestor
    mapping — 'which subsystem does the corpus talk about'. Broadcast
    ontology-sized map join, then one hash agg; tag mass in exact ppm
    integers so distributed partial-agg merge order cannot flip the
    hash."""
    canon = q_kg_canonical(spark, sf_dir)
    tags = (canon.groupBy("conv_id", "concept_id")
            .agg(F.max("link_score").alias("tag")))
    bmap = spark.createDataFrame(_branch_map_pdf())
    return (tags.join(F.broadcast(bmap), "concept_id", "inner")
            .groupBy("branch")
            .agg(F.countDistinct("conv_id").alias("n_convs"),
                 F.sum(F.round(F.col("tag") * 1_000_000, 0).cast("bigint"))
                 .alias("tag_mass_ppm")))


def _sql_kg_branch_rollup() -> str:
    canon = _sql_kg_canonical_body(
        "SELECT conv_id, turn_idx, surface, concept_id, link_score FROM best WHERE rn = 1")
    bv = values_sql(_branch_map_pdf(), "b")
    return f"""
WITH canon AS ({canon}),
tags AS (
  SELECT conv_id, concept_id, max(link_score) AS tag
  FROM canon GROUP BY conv_id, concept_id
)
SELECT b.branch,
       count(DISTINCT t.conv_id) AS n_convs,
       CAST(sum(CAST(round(t.tag * 1000000, 0) AS BIGINT)) AS BIGINT)
         AS tag_mass_ppm
FROM tags t JOIN {bv} ON b.concept_id = t.concept_id
GROUP BY b.branch
"""


def q_kg_search_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subsumption-based retrieval through the MATERIALIZED closure —
    the payoff of kg_inferred_triples: a query concept matches every
    conversation that mentions it OR any descendant (whose decayed
    mentions_broader edge lands on it), with NO taxonomy math at query
    time. Contrast kg_search, which propagates through the full
    CDS/Wu-Palmer matrix at tag time: closure search trades weaker
    (ancestor-only, decay^levels) semantics for a query plan that is
    one broadcast join + two hash aggs over precomputed edges.
    Limit-then-rank top-20."""
    scores = driver_scores()
    gaz = driver_gazetteer()
    norm = S.normalize_text(SEARCH_QUERY)
    surfaces = sorted({m[0] for m in S.find_mentions(norm, gaz)})
    q = (scores[scores.surface.isin(surfaces)]
         .groupby("concept_id", as_index=False)["cos_sim"].max()
         .rename(columns={"cos_sim": "q_score"}).round({"q_score": 6}))
    q_df = spark.createDataFrame(q, "concept_id string, q_score double")
    asserted = q_kg_canonical(spark, sf_dir).select(
        "conv_id", "concept_id", F.col("link_score").alias("score"))
    inferred = q_kg_inferred_triples(spark, sf_dir).select(
        F.split(F.col("subj"), ":").getItem(1).alias("conv_id"),
        F.col("obj").alias("concept_id"), "score")
    tags = (asserted.unionByName(inferred)
            .groupBy("conv_id", "concept_id")
            .agg(F.max("score").alias("tag_score")))
    ranked = (
        tags.join(F.broadcast(q_df), "concept_id", "inner")
        .groupBy(F.concat(F.lit("conv:"), F.col("conv_id")).alias("subj_key"))
        .agg(F.round(F.sum(F.col("tag_score") * F.col("q_score")), 6)
             .alias("search_score")))
    top = ranked.orderBy(F.desc("search_score"), F.asc("subj_key")).limit(20)
    w = Window.orderBy(F.desc("search_score"), F.asc("subj_key"))
    return (top.withColumn("rank", F.row_number().over(w))
            .select("subj_key", "rank", "search_score"))


def _sql_kg_search_closure() -> str:
    import pandas as pd
    scores = driver_scores()
    gaz = driver_gazetteer()
    norm = S.normalize_text(SEARCH_QUERY)
    surfaces = sorted({m[0] for m in S.find_mentions(norm, gaz)})
    q = (scores[scores.surface.isin(surfaces)]
         .groupby("concept_id", as_index=False)["cos_sim"].max()
         .rename(columns={"cos_sim": "q_score"}).round({"q_score": 6}))
    qv = values_sql(pd.DataFrame(q), "q")
    canon = _sql_kg_canonical_body(
        "SELECT conv_id, turn_idx, surface, concept_id, link_score FROM best WHERE rn = 1")
    return f"""
WITH canon AS ({canon}),
inferred AS ({_sql_kg_inferred_triples()}),
tags AS (
  SELECT conv_id, concept_id, max(score) AS tag_score FROM (
    SELECT conv_id, concept_id, link_score AS score FROM canon
    UNION ALL
    SELECT string_split(subj, ':')[2] AS conv_id, obj AS concept_id, score
    FROM inferred
  ) GROUP BY conv_id, concept_id
),
ranked AS (
  SELECT 'conv:' || t.conv_id AS subj_key,
         round(sum(t.tag_score * q.q_score), 6) AS search_score
  FROM tags t JOIN {qv} ON q.concept_id = t.concept_id
  GROUP BY subj_key
)
SELECT subj_key, rank, search_score FROM (
  SELECT subj_key, search_score,
         row_number() OVER (ORDER BY search_score DESC, subj_key ASC) AS rank
  FROM ranked
) WHERE rank <= 20
"""


def q_kg_nt_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDF graph-materialize parity (r4): the corpus triple graph
    rendered as N-Triples lines (sources/rdf.py:format_ntriples — the
    write twin of the paired Turtle/N-Triples ingest). The reference
    dumps its rdflib graph the same way [K]; here it's a map-only
    expression over the triple table, and the oracle replays the IRI
    percent-encoding + literal escaping character-for-character."""
    from ...sources.rdf import format_ntriples
    return format_ntriples(q_kg_triples(spark, sf_dir))


def _sql_kg_nt_export() -> str:
    base = "http://example.org/kg/"
    return rf"""
WITH triples AS ({_sql_kg_triples_body()}),
fmt AS (
  SELECT concat('<', '{base}', replace(subj, ':', '%3A'), '>') AS s,
         concat('<', '{base}', replace(pred, ':', '%3A'), '>') AS p,
         CASE
           WHEN regexp_matches(obj, '^https?://')
             THEN concat('<', obj, '>')
           WHEN regexp_matches(obj, '^[A-Za-z][\w.-]*:')
             THEN concat('<', '{base}', replace(obj, ':', '%3A'), '>')
           ELSE concat('"', replace(replace(obj, '\', '\\'), '"', '\"'),
                       '"')
         END AS o
  FROM triples
)
SELECT concat_ws(' ', s, p, o, '.') AS line FROM fmt
"""


def q_kg_batch_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P17 batch / multi-tenant read path (r4): N queries resolved in
    ONE pass over the CDS table — the scale shape for a search service
    draining a query queue. At 10^12 subjects you never rescan per
    query: every query vector lives in one broadcast (query_id,
    concept_id, q_score) table, one broadcast join + one
    (query_id, subj_key) partial agg scores every sharing pair, and the
    per-query top-10 rank window partitions by query_id (never
    partitionless — each partition is one query's candidate set)."""
    qv = _batch_query_vectors()
    q_df = spark.createDataFrame(
        qv, "query_id int, concept_id string, q_score double")
    cds = q_kg_cds(spark, sf_dir)
    ranked = (
        cds.join(F.broadcast(q_df), cds.cds_concept == q_df.concept_id)
        .groupBy("query_id", "subj_key")
        .agg(F.round(F.sum(F.col("score") * F.col("q_score")), 6)
             .alias("search_score")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("search_score"), F.asc("subj_key"))
    return (ranked.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .select("query_id", "subj_key", "rank", "search_score"))


def _sql_kg_batch_search() -> str:
    qv = values_sql(_batch_query_vectors(), "q")
    cds = _sql_kg_cds_body()
    return f"""
WITH cds AS ({cds}),
ranked AS (
  SELECT q.query_id, c.subj_key,
         round(sum(c.score * q.q_score), 6) AS search_score
  FROM cds c JOIN {qv} ON q.concept_id = c.cds_concept
  GROUP BY q.query_id, c.subj_key
)
SELECT query_id, subj_key, rank, search_score FROM (
  SELECT query_id, subj_key, search_score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY search_score DESC, subj_key ASC) AS rank
  FROM ranked
) WHERE rank <= 10
"""


# ---------------------------------------------------------------------------
# Manual-tagging ingest/merge, per-configuration graphs, WuP-blended
# search (VERDICT r1 items 4/5/7) — all exercising the production
# operators in operators/manual.py, operators/cds.py, plans/search.py.
# ---------------------------------------------------------------------------

def _auto_tags_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    canon = q_kg_canonical(spark, sf_dir)
    return (canon.groupBy(
        F.concat(F.lit("conv:"), F.col("conv_id")).alias("subj_key"),
        "concept_id")
        .agg(F.max("link_score").alias("tag_score")))


def _merged_tags_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lives HERE (not _shared) because it composes _auto_tags_df, a kg1
    # def: _shared must never import from chunk modules — a chunk can be
    # imported first, at which point _shared's bottom import would see a
    # partially initialized chunk (caught by
    # tests/test_registry_hash.py::test_each_query_module_imports_standalone).
    from ...operators.manual import ingest_manual_tags, merge_tag_sources
    valid = ingest_manual_tags(_manual_raw_df(spark), _onto_ids_df(spark))
    return merge_tag_sources(_auto_tags_df(spark, sf_dir), valid)

def q_kg_manual_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated-tag ingestion: validate an external manual tag table
    against the ontology (bogus concept ids dropped), merge with
    autotag conversation tags (set semantics, max weight, provenance)."""
    return _merged_tags_df(spark, sf_dir)


def _sql_manual_merge_ctes() -> str:
    """CTEs shared by the kg_manual_* oracles: canon → auto tags,
    manual VALUES → validated, union → merged."""
    from ..driver_ontology import driver_manual_tags
    import pandas as pd
    canon = _sql_kg_canonical_body()
    manual = values_sql(driver_manual_tags(), "mr")
    onto = values_sql(
        pd.DataFrame({"concept_id": [c.concept_id for c in driver_concepts()]}),
        "oc")
    return f"""
canon AS ({canon}),
auto_tags AS (
  SELECT 'conv:' || conv_id AS subj_key, concept_id,
         max(link_score) AS tag_score, 'auto' AS source
  FROM canon GROUP BY subj_key, concept_id
),
manual_valid AS (
  SELECT mr.subj_key, mr.concept_id,
         round(greatest(0.0, least(1.0, max(mr.weight))), 6) AS tag_score,
         'manual' AS source
  FROM (SELECT 'conv:' || conv_id AS subj_key, concept_id, weight
        FROM {manual}) mr
  JOIN (SELECT DISTINCT concept_id FROM {onto}) oc
    ON oc.concept_id = mr.concept_id
  GROUP BY mr.subj_key, mr.concept_id
),
merged AS (
  SELECT subj_key, concept_id, round(max(tag_score), 6) AS tag_score,
         string_agg(DISTINCT source, '+' ORDER BY source) AS sources
  FROM (SELECT * FROM auto_tags UNION ALL SELECT * FROM manual_valid)
  GROUP BY subj_key, concept_id
)
"""


def _sql_kg_manual_merge() -> str:
    return (f"WITH {_sql_manual_merge_ctes()} "
            "SELECT subj_key, concept_id, tag_score, sources FROM merged")


def q_kg_manual_cds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDS propagation fed from the manual∪auto tag union (the
    reference propagates its curated graph identically to autotag)."""
    from ...operators.cds import propagate_cds
    merged = _merged_tags_df(spark, sf_dir).drop("sources")
    return propagate_cds(merged, _wup_df(spark))


def _sql_kg_manual_cds() -> str:
    wu = values_sql(driver_wup(), "w")
    return f"""
WITH {_sql_manual_merge_ctes()}
SELECT m.subj_key, w.concept_b AS concept_id,
       round(max(m.tag_score * w.wup), 6) AS score
FROM merged m JOIN {wu} ON w.concept_a = m.concept_id
GROUP BY m.subj_key, w.concept_b
HAVING round(max(m.tag_score * w.wup), 6) >= {S.CDS_THRESHOLD}
"""


def q_kg_config_cds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two named tagging configurations ('auto_only' and 'curated') in
    one physical graph; CDS grouped per config_id — configurations must
    not bleed (isolation pytest-pinned in tests/test_manual_tags.py)."""
    from ...operators.cds import propagate_cds
    from ...operators.manual import tag_graph
    graph = tag_graph({
        "auto_only": _auto_tags_df(spark, sf_dir),
        "curated": _merged_tags_df(spark, sf_dir).drop("sources"),
    })
    return propagate_cds(graph, _wup_df(spark))


def _sql_kg_config_cds() -> str:
    wu = values_sql(driver_wup(), "w")
    return f"""
WITH {_sql_manual_merge_ctes()},
graph AS (
  SELECT 'auto_only' AS config_id, subj_key, concept_id, tag_score
  FROM auto_tags
  UNION ALL
  SELECT 'curated' AS config_id, subj_key, concept_id, tag_score
  FROM merged
)
SELECT g.config_id, g.subj_key, w.concept_b AS concept_id,
       round(max(g.tag_score * w.wup), 6) AS score
FROM graph g JOIN {wu} ON w.concept_a = g.concept_id
GROUP BY g.config_id, g.subj_key, w.concept_b
HAVING round(max(g.tag_score * w.wup), 6) >= {S.CDS_THRESHOLD}
"""


def q_kg_config_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-configuration search (the reference selects one named
    tagging graph at query time [K]): the same free-text query ranked
    independently against each configuration's CDS — one window
    partitioned by config_id, top-10 each, no bleed."""
    scores = driver_scores()
    gaz = driver_gazetteer()
    norm = S.normalize_text(SEARCH_QUERY)
    surfaces = sorted({m[0] for m in S.find_mentions(norm, gaz)})
    q = (scores[scores.surface.isin(surfaces)]
         .groupby("concept_id", as_index=False)["cos_sim"].max()
         .rename(columns={"cos_sim": "q_score"}).round({"q_score": 6}))
    q_df = spark.createDataFrame(q, "concept_id string, q_score double")
    cds = q_kg_config_cds(spark, sf_dir)
    ranked = (
        cds.join(F.broadcast(q_df), "concept_id")
        .groupBy("config_id", "subj_key")
        .agg(F.round(F.sum(F.col("score") * F.col("q_score")), 6)
             .alias("search_score")))
    w = Window.partitionBy("config_id").orderBy(
        F.desc("search_score"), F.asc("subj_key"))
    return (ranked.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .select("config_id", "subj_key", "rank", "search_score"))


def _sql_kg_config_search() -> str:
    import pandas as pd
    scores = driver_scores()
    gaz = driver_gazetteer()
    norm = S.normalize_text(SEARCH_QUERY)
    surfaces = sorted({m[0] for m in S.find_mentions(norm, gaz)})
    q = (scores[scores.surface.isin(surfaces)]
         .groupby("concept_id", as_index=False)["cos_sim"].max()
         .rename(columns={"cos_sim": "q_score"}).round({"q_score": 6}))
    qv = values_sql(pd.DataFrame(q), "q")
    cds = _sql_kg_config_cds()
    return f"""
WITH cds AS ({cds}),
ranked AS (
  SELECT c.config_id, c.subj_key,
         round(sum(c.score * q.q_score), 6) AS search_score
  FROM cds c JOIN {qv} ON q.concept_id = c.concept_id
  GROUP BY c.config_id, c.subj_key
)
SELECT config_id, subj_key, rank, search_score FROM (
  SELECT config_id, subj_key, search_score,
         row_number() OVER (PARTITION BY config_id
                            ORDER BY search_score DESC, subj_key ASC) AS rank
  FROM ranked
) WHERE rank <= 10
"""


def q_kg_search_wup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P17 with the reference's lexical+taxonomic query scoring [K]:
    each query surface's candidates rescored by the P9 blend
    (α·cos + (1−α)·wup vs the cos-top anchor) before the per-concept
    max — exercising plans/search.blend_query_scores."""
    from ..search import blend_query_scores
    scores = driver_scores()
    gaz = driver_gazetteer()
    norm = S.normalize_text(SEARCH_QUERY)
    surfaces = sorted({m[0] for m in S.find_mentions(norm, gaz)})
    qs = scores[scores.surface.isin(surfaces)].round({"cos_sim": 6})
    blended = blend_query_scores(qs, driver_wup())
    q = (blended.groupby("concept_id", as_index=False)["cos_sim"].max()
         .rename(columns={"cos_sim": "q_score"}))
    q_df = spark.createDataFrame(q, "concept_id string, q_score double")
    cds = q_kg_cds(spark, sf_dir)
    ranked = (
        cds.join(F.broadcast(q_df), cds.cds_concept == q_df.concept_id, "inner")
        .groupBy("subj_key")
        .agg(F.round(F.sum(F.col("score") * F.col("q_score")), 6)
             .alias("search_score"))
    )
    # limit-then-rank (the plans/search.py:83 shape): orderBy+limit is
    # TakeOrderedAndProject (parallel per-partition heaps); the
    # partitionless rank window then runs over <= 20 rows, never the
    # full subject table.
    top = ranked.orderBy(F.desc("search_score"), F.asc("subj_key")).limit(20)
    w = Window.orderBy(F.desc("search_score"), F.asc("subj_key"))
    return (top.withColumn("rank", F.row_number().over(w))
            .select("subj_key", "rank", "search_score"))


def _sql_kg_search_wup() -> str:
    scores = driver_scores()
    gaz = driver_gazetteer()
    norm = S.normalize_text(SEARCH_QUERY)
    surfaces = sorted({m[0] for m in S.find_mentions(norm, gaz)})
    qs = values_sql(
        scores[scores.surface.isin(surfaces)].round({"cos_sim": 6}), "qs")
    wu = values_sql(driver_wup(), "w")
    cds = _sql_kg_cds_body()
    return f"""
WITH cds AS ({cds}),
qsc AS (SELECT * FROM {qs}),
anchor AS (
  SELECT surface, concept_id AS anchor_id FROM (
    SELECT surface, concept_id,
           row_number() OVER (PARTITION BY surface
                              ORDER BY cos_sim DESC, concept_id ASC) AS rn
    FROM qsc) WHERE rn = 1
),
blended AS (
  SELECT q.surface, q.concept_id,
         round({S.LINK_ALPHA} * q.cos_sim
               + {1 - S.LINK_ALPHA} * coalesce(w.wup, 0.0), 6) AS bscore
  FROM qsc q
  JOIN anchor a ON a.surface = q.surface
  LEFT JOIN {wu} ON w.concept_a = q.concept_id AND w.concept_b = a.anchor_id
),
qvec AS (SELECT concept_id, max(bscore) AS q_score FROM blended
         GROUP BY concept_id),
ranked AS (
  SELECT c.subj_key, round(sum(c.score * q.q_score), 6) AS search_score
  FROM cds c JOIN qvec q ON q.concept_id = c.cds_concept
  GROUP BY c.subj_key
)
SELECT subj_key, rank, search_score FROM (
  SELECT subj_key, search_score,
         row_number() OVER (ORDER BY search_score DESC, subj_key ASC) AS rank
  FROM ranked
) WHERE rank <= 20
"""


# ---------------------------------------------------------------------------
# §2B relational surface — shared SQL text where both dialects agree;
# engine-specific variants otherwise. Spark runs via spark.sql over temp
# views so Catalyst sees one declarative plan (scan pushdown + AQE).
# ---------------------------------------------------------------------------

def q_kg_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph read path over the materialized triple store: 2-hop
    traversal turn→replies_to→turn→mentions, emitting
    concept-follows-concept edges with path counts — the kind of
    neighborhood query a KG consumer runs on the P15 output. Three
    equi-joins on the subject key + one hash agg; no traversal loop."""
    t = q_kg_triples(spark, sf_dir)
    m = (t.filter(F.col("pred") == "mentions")
         .select(F.col("subj").alias("turn"), F.col("obj").alias("concept")))
    r = (t.filter(F.col("pred") == "replies_to")
         .select(F.col("subj").alias("turn"),
                 F.col("obj").alias("prev_turn")))
    pm = m.select(F.col("turn").alias("prev_turn"),
                  F.col("concept").alias("concept_prev"))
    return (r.join(m, "turn").join(pm, "prev_turn")
            .groupBy("concept_prev", F.col("concept").alias("concept_next"))
            .agg(F.count(F.lit(1)).alias("n_paths")))


def _sql_kg_two_hop() -> str:
    return f"""
WITH triples AS ({_sql_kg_triples_body()}),
m AS (SELECT subj AS turn, obj AS concept FROM triples
      WHERE pred = 'mentions'),
r AS (SELECT subj AS turn, obj AS prev_turn FROM triples
      WHERE pred = 'replies_to')
SELECT pm.concept AS concept_prev, m.concept AS concept_next,
       count(*) AS n_paths
FROM r JOIN m ON m.turn = r.turn
       JOIN m pm ON pm.turn = r.prev_turn
GROUP BY pm.concept, m.concept
"""


def q_kg_mentions_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRUE production mention path (P4: fused mega-string regex
    mapInPandas, operators/mentions.py) oracle-paired — upgrading it
    from the rows-only check: DuckDB replays the identical
    longest-first alternation with RE2 ``regexp_extract_all`` (both
    engines use leftmost-position, first-alternative semantics, and
    the alternation is ordered longest-first, so matches coincide;
    prototype-verified byte-equal before pairing). Surfaces are
    aggregated per turn; token offsets stay pytest-pinned against the
    pure-python walk."""
    from ...operators.mentions import detect_mentions_exploded
    t = derived_transcripts(spark, sf_dir)
    m = detect_mentions_exploded(t, driver_gazetteer(), norm_col="text")
    return (m.groupBy("conv_id", "turn_idx", "surface")
            .agg(F.count(F.lit(1)).alias("n")))


def _sql_kg_mentions_regex() -> str:
    from ... import semantics as S
    gaz = driver_gazetteer()
    keys = sorted((k for k in gaz if len(k.split()) <= S.MAX_NGRAM),
                  key=lambda s: (-len(s.split()), s))
    assert all(set(k) <= set("abcdefghijklmnopqrstuvwxyz0123456789 ")
               for k in keys)  # escape-free alternation precondition
    pattern = r"\b(?:" + "|".join(keys) + r")\b"
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE})
SELECT conv_id, turn_idx, m.surface, count(*) AS n
FROM transcripts,
     unnest(regexp_extract_all(text, '{pattern}')) AS m(surface)
GROUP BY conv_id, turn_idx, m.surface
"""


def q_kg_fast_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRUE production hot path END-TO-END (normalize → fused regex
    mention UDF → broadcast precomputed canonical → 3-rule union → one
    dedup shuffle), oracle-paired since r2: the DuckDB oracle replays
    mentions with the RE2 alternation (see kg_mentions_regex) and joins
    the SAME precomputed canonical table as literals — the exact
    surface→(concept, link_score) function build_triples_fast
    broadcasts. What a 100 TB run executes is what gets value-checked."""
    from ..pipeline import build_triples_fast
    t = derived_transcripts(spark, sf_dir).withColumn(
        "ts", F.lit(None).cast("timestamp"))
    return build_triples_fast(spark, t, ontology_pdf=_fast_onto_pdf())


def _sql_kg_fast_pipeline() -> str:
    gaz = driver_gazetteer()
    keys = sorted((k for k in gaz if len(k.split()) <= S.MAX_NGRAM),
                  key=lambda s: (-len(s.split()), s))
    pattern = r"\b(?:" + "|".join(keys) + r")\b"
    canon = values_sql(
        _fast_canon_pdf()[["surface", "concept_id", "link_score"]], "c")
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
mentions AS (
  SELECT DISTINCT conv_id, turn_idx, m.surface
  FROM transcripts,
       unnest(regexp_extract_all(text, '{pattern}')) AS m(surface)
),
alltr AS (
  SELECT 'turn:' || mm.conv_id || ':' || cast(mm.turn_idx AS STRING) AS subj,
         'mentions' AS pred, c.concept_id AS obj,
         mm.conv_id, mm.turn_idx, c.link_score AS score
  FROM mentions mm JOIN {canon} ON c.surface = mm.surface
  UNION ALL
  SELECT 'turn:' || conv_id || ':' || cast(turn_idx AS STRING) AS subj,
         'uses_tool' AS pred, 'tool:' || tool AS obj,
         conv_id, turn_idx, 1.0 AS score
  FROM transcripts WHERE tool IS NOT NULL
  UNION ALL
  SELECT 'turn:' || conv_id || ':' || cast(turn_idx AS STRING) AS subj,
         'replies_to' AS pred,
         'turn:' || conv_id || ':' || cast(prev_turn_idx AS STRING) AS obj,
         conv_id, turn_idx, 1.0 AS score
  FROM (SELECT conv_id, turn_idx,
               lag(turn_idx, 1) OVER (PARTITION BY conv_id
                                      ORDER BY turn_idx) AS prev_turn_idx
        FROM transcripts) x
  WHERE prev_turn_idx IS NOT NULL
)
SELECT subj, pred, obj, conv_id, turn_idx, round(max(score), 6) AS score
FROM alltr GROUP BY subj, pred, obj, conv_id, turn_idx
"""


def q_kg_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P15 sink fidelity, driver-paired: the triple graph written to a
    subject-bucketed partitioned parquet sink (the local stand-in for
    Iceberg bucket(256, subj)) and READ BACK must hash-equal the direct
    computation — the oracle is the same SQL as kg_triples, so any
    type/row loss through the sink shows up as a mismatch."""
    import os as _os
    import tempfile as _tf
    t = q_kg_triples(spark, sf_dir)
    out = _os.path.join(
        _tf.gettempdir(),
        f"kg_mat_{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}.parquet")
    (t.withColumn("bucket", F.pmod(F.xxhash64("subj"), F.lit(16)).cast("int"))
     .write.mode("overwrite").partitionBy("bucket").parquet(out))
    spark.catalog.refreshByPath(out)
    return spark.read.parquet(out).drop("bucket")


# Statistical aggregates over SMALL-magnitude columns (discount/tax in
# [0, 0.1]): partial-aggregation merge order makes large-magnitude
# moment sums diverge across engines in the low bits, but at these
# magnitudes the 6dp rounding is stable. Spark's skewness/kurtosis use
# different bias corrections than DuckDB's — deliberately excluded.
# Every rounded column gets `+ 0.0`: a tiny negative value (e.g.
# covar_samp ~ -2.4e-07) rounds to IEEE -0.0 in DuckDB but +0.0 in
# Spark; adding 0.0 maps -0.0 -> +0.0 identically on both engines
# (VERDICT r2 "What's wrong #1").
def q_kg_ontology_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turtle(SKOS) → ontology_concepts: sources/rdf.py parse_turtle +
    skos_concepts over the committed fixture .ttl (input is the file,
    not sf_dir — ontology ingest is corpus-independent). Arrays emitted
    as joined strings for hash portability."""
    from ...sources.rdf import FIXTURE_TTL, parse_turtle, skos_concepts
    c = skos_concepts(parse_turtle(spark, FIXTURE_TTL))
    return c.select(
        "concept_id", "pref_label",
        F.concat_ws("+", "alt_labels").alias("alt_labels"),
        "parent_id", "depth",
        F.concat_ws("/", "path").alias("path"))


def _sql_kg_ontology_ingest() -> str:
    from ...sources.rdf import (FIXTURE_TTL, RDF_TYPE, RX_CONT, RX_LITERAL,
                               RX_PREFIX, RX_STMT_START, SKOS)
    expand = r"^[A-Za-z][\w.-]*:(.*)$"
    pfx_of = r"^([A-Za-z][\w.-]*):"
    iri = r"^<([^>]*)>$"
    return f"""
WITH RECURSIVE
f AS (SELECT string_split(content, chr(10)) AS ls
      FROM read_text('{FIXTURE_TTL}')),
raw AS (SELECT unnest(range(1, len(ls) + 1)) AS ln,
               unnest(list_transform(ls, x -> trim(x))) AS line FROM f),
lines AS (SELECT ln, line FROM raw
          WHERE line <> '' AND NOT starts_with(line, '#')),
prefixes AS (SELECT regexp_extract(line, '{RX_PREFIX}', 1) AS pfx,
                    regexp_extract(line, '{RX_PREFIX}', 2) AS iri
             FROM lines WHERE starts_with(line, '@prefix')),
stmts AS (SELECT ln, line, regexp_matches(line, '\\.$') AS ends_dot
          FROM lines WHERE NOT starts_with(line, '@prefix')),
st2 AS (SELECT ln, line,
               coalesce(lag(ends_dot) OVER (ORDER BY ln), true) AS is_start
        FROM stmts),
parsed AS (SELECT ln,
  CASE WHEN is_start THEN regexp_extract(line, '{RX_STMT_START}', 1) END AS subj_tok,
  CASE WHEN is_start THEN regexp_extract(line, '{RX_STMT_START}', 2)
       ELSE regexp_extract(line, '{RX_CONT}', 1) END AS pred_tok,
  CASE WHEN is_start THEN regexp_extract(line, '{RX_STMT_START}', 3)
       ELSE regexp_extract(line, '{RX_CONT}', 2) END AS obj_seg
  FROM st2),
ff AS (SELECT ln,
         last_value(subj_tok IGNORE NULLS) OVER (ORDER BY ln
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS subj_tok,
         pred_tok, obj_seg FROM parsed),
objs AS (SELECT ln, subj_tok, pred_tok,
                unnest(regexp_split_to_array(obj_seg, '\\s*,\\s*')) AS obj_tok
         FROM ff),
triples AS (
  SELECT
    CASE WHEN starts_with(subj_tok, '<')
           THEN regexp_extract(subj_tok, '{iri}', 1)
         ELSE ps.iri || regexp_extract(subj_tok, '{expand}', 1) END AS subj,
    CASE WHEN pred_tok = 'a' THEN '{RDF_TYPE}'
         WHEN starts_with(pred_tok, '<')
           THEN regexp_extract(pred_tok, '{iri}', 1)
         ELSE pp.iri || regexp_extract(pred_tok, '{expand}', 1) END AS pred,
    CASE WHEN starts_with(obj_tok, '"')
           THEN regexp_extract(obj_tok, '{RX_LITERAL}', 1)
         WHEN starts_with(obj_tok, '<')
           THEN regexp_extract(obj_tok, '{iri}', 1)
         ELSE po.iri || regexp_extract(obj_tok, '{expand}', 1) END AS obj
  FROM objs
  LEFT JOIN prefixes ps ON ps.pfx = regexp_extract(subj_tok, '{pfx_of}', 1)
  LEFT JOIN prefixes pp ON pp.pfx = regexp_extract(pred_tok, '{pfx_of}', 1)
  LEFT JOIN prefixes po ON po.pfx = regexp_extract(obj_tok, '{pfx_of}', 1)
  WHERE obj_tok <> ''
),
pref AS (SELECT subj, min(obj) AS pref_label FROM triples
         WHERE pred = '{SKOS}prefLabel' GROUP BY subj),
alts AS (SELECT subj, string_agg(DISTINCT obj, '+' ORDER BY obj) AS alt_labels
         FROM triples WHERE pred = '{SKOS}altLabel' GROUP BY subj),
par AS (SELECT subj, min(obj) AS parent_id FROM triples
        WHERE pred = '{SKOS}broader' GROUP BY subj),
c AS (SELECT p.subj AS concept_id, p.pref_label,
             coalesce(a.alt_labels, '') AS alt_labels, par.parent_id
      FROM pref p LEFT JOIN alts a ON a.subj = p.subj
      LEFT JOIN par ON par.subj = p.subj),
tree AS (
  SELECT concept_id, 1 AS depth, concept_id AS path
  FROM c WHERE parent_id IS NULL
  UNION ALL
  SELECT c2.concept_id, t.depth + 1, t.path || '/' || c2.concept_id
  FROM c c2 JOIN tree t ON c2.parent_id = t.concept_id)
SELECT c.concept_id, c.pref_label, c.alt_labels, c.parent_id,
       tree.depth, tree.path
FROM c JOIN tree ON tree.concept_id = c.concept_id
"""


# ---------------------------------------------------------------------------
# P16 checkpoint/lineage/resume, paired for the driver (VERDICT r2 #5):
# run the checkpointed fused pipeline TWICE into a fresh run dir; the
# second run must resume every stage from the manifest. The returned
# manifest summary — per-stage rows_out (sum of the bucket-level
# lineage counters) + the second run's resumed flag — is value-checked
# against a DuckDB recompute of each stage's row count.
# ---------------------------------------------------------------------------

def q_kg_resume_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-run checkpoint/resume probe over the derived corpus + driver
    ontology (plans/pipeline.py CheckpointedRun). Output
    (stage, rows_out, resumed): rows_out read back from the persisted
    manifest, resumed from the SECOND run's metrics (must be all true,
    and is — the oracle pins it as a literal)."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    import pandas as _pd

    from ..pipeline import run_pipeline
    run_dir = _os.path.join(
        _tempfile.gettempdir(),
        f"kg_resume_{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}")
    _shutil.rmtree(run_dir, ignore_errors=True)
    t = derived_transcripts(spark, sf_dir).withColumn(
        "ts", F.lit(None).cast("timestamp"))
    onto = _fast_onto_pdf()
    run_pipeline(spark, t, run_dir, ontology_pdf=onto, fused_linking=True)
    r2 = run_pipeline(spark, t, run_dir, ontology_pdf=onto,
                      fused_linking=True)
    m = _pd.read_parquet(_os.path.join(run_dir, "checkpoint_manifest.parquet"))
    summary = (m.groupby("stage", as_index=False)["rows_out"].sum()
               .sort_values("stage"))
    summary["resumed"] = [bool(r2.metrics[s]["resumed"])
                          for s in summary["stage"]]
    return spark.createDataFrame(
        summary, "stage string, rows_out bigint, resumed boolean")


def _sql_kg_resume_manifest() -> str:
    """DuckDB recompute of every fused-pipeline stage's row count:
    mentions occurrences joined to the precomputed canonical table
    (canonical), the 3-rule triple union (triples — same body as
    kg_fast_pipeline), Wu-Palmer matrix size (concept_similarity), and
    CDS propagation (cds_scores) with wup computed UNROUNDED from path
    literals — bit-identical to Spark's concept_similarity() doubles,
    unlike the 6dp-rounded driver_wup VALUES."""
    import pandas as pd
    gaz = driver_gazetteer()
    keys = sorted((k for k in gaz if len(k.split()) <= S.MAX_NGRAM),
                  key=lambda s: (-len(s.split()), s))
    pattern = r"\b(?:" + "|".join(keys) + r")\b"
    canon = values_sql(
        _fast_canon_pdf()[["surface", "concept_id", "link_score"]], "c")
    rows = []
    for c in driver_concepts():
        for pos, anc in enumerate(c.path, start=1):
            rows.append((c.concept_id, c.depth, anc, pos))
    anc = values_sql(pd.DataFrame(
        rows, columns=["concept_id", "depth", "anc_id", "anc_depth"]), "an")
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
occ AS (
  SELECT conv_id, turn_idx, m.surface
  FROM transcripts,
       unnest(regexp_extract_all(text, '{pattern}')) AS m(surface)
),
canonical AS (
  SELECT o.conv_id, o.turn_idx, o.surface, c.concept_id, c.link_score
  FROM occ o JOIN {canon} ON c.surface = o.surface
),
alltr AS (
  SELECT 'turn:' || conv_id || ':' || cast(turn_idx AS STRING) AS subj,
         'mentions' AS pred, concept_id AS obj, conv_id, turn_idx,
         link_score AS score
  FROM (SELECT DISTINCT conv_id, turn_idx, surface, concept_id, link_score
        FROM canonical) d
  UNION ALL
  SELECT 'turn:' || conv_id || ':' || cast(turn_idx AS STRING) AS subj,
         'uses_tool' AS pred, 'tool:' || tool AS obj, conv_id, turn_idx,
         1.0 AS score
  FROM transcripts WHERE tool IS NOT NULL
  UNION ALL
  SELECT 'turn:' || conv_id || ':' || cast(turn_idx AS STRING) AS subj,
         'replies_to' AS pred,
         'turn:' || conv_id || ':' || cast(prev_turn_idx AS STRING) AS obj,
         conv_id, turn_idx, 1.0 AS score
  FROM (SELECT conv_id, turn_idx,
               lag(turn_idx, 1) OVER (PARTITION BY conv_id
                                      ORDER BY turn_idx) AS prev_turn_idx
        FROM transcripts) x
  WHERE prev_turn_idx IS NOT NULL
),
triples AS (
  SELECT subj, pred, obj, conv_id, turn_idx, round(max(score), 6) AS score
  FROM alltr GROUP BY subj, pred, obj, conv_id, turn_idx
),
ancs AS (SELECT * FROM {anc}),
wup AS (
  SELECT a.concept_id AS concept_a, b.concept_id AS concept_b,
         2.0 * max(a.anc_depth) / (a.depth + b.depth) AS wup
  FROM ancs a JOIN ancs b
       ON a.anc_id = b.anc_id AND a.anc_depth = b.anc_depth
  GROUP BY a.concept_id, b.concept_id, a.depth, b.depth
),
tags AS (
  SELECT 'conv:' || conv_id AS subj_key, obj AS concept_id,
         max(score) AS tag_score
  FROM triples WHERE pred = 'mentions' GROUP BY conv_id, obj
),
cds AS (
  SELECT t.subj_key, w.concept_b,
         round(max(t.tag_score * w.wup), 6) AS score
  FROM tags t JOIN wup w ON w.concept_a = t.concept_id
  GROUP BY t.subj_key, w.concept_b
  HAVING round(max(t.tag_score * w.wup), 6) >= {S.CDS_THRESHOLD}
)
SELECT 'canonical' AS stage,
       (SELECT count(*) FROM canonical) AS rows_out, true AS resumed
UNION ALL SELECT 'cds_scores', (SELECT count(*) FROM cds), true
UNION ALL SELECT 'concept_similarity', (SELECT count(*) FROM wup), true
UNION ALL SELECT 'triples', (SELECT count(*) FROM triples), true
"""


# ---------------------------------------------------------------------------
# Structured Streaming paired for the driver (VERDICT r2 #6): a REAL
# readStream → session_window aggregation → writeStream run, drained
# with availableNow, whose final table is value-checked against the
# DuckDB gaps-and-islands oracle. Sums go through exact integer cents
# (the rel_range_frame trick): streaming state merges partial sums in a
# different order than any batch plan, so double accumulation would
# flip low bits; integer addition is associative everywhere.
# ---------------------------------------------------------------------------

def q_kg_dcat_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DCAT-JSONL dump → catalog table (sources/dcat.py, explicit
    schema, line-parallel). Arrays emitted joined for hash
    portability; issued as epoch micros."""
    from ...sources.dcat import FIXTURE_DCAT, read_dcat_jsonl
    c = read_dcat_jsonl(spark, FIXTURE_DCAT)
    return c.select(
        "dataset_id", "title", "description",
        F.concat_ws("+", "keywords").alias("keywords"),
        "publisher",
        F.unix_micros(F.col("issued")).alias("issued_us"),
        F.concat_ws("+", "formats").alias("formats"),
        "n_distributions")


def _sql_kg_dcat_ingest() -> str:
    from ...sources.dcat import FIXTURE_DCAT
    return f"""
SELECT identifier AS dataset_id, title, description,
       coalesce(array_to_string(list_sort(keyword), '+'), '') AS keywords,
       publisher.name AS publisher,
       epoch_us(issued) AS issued_us,
       coalesce(array_to_string(list_sort(
           list_transform(distribution, d -> d.format)), '+'), '') AS formats,
       coalesce(len(distribution), 0) AS n_distributions
FROM read_json('{FIXTURE_DCAT}', format='newline_delimited', columns={{
    'identifier': 'VARCHAR', 'title': 'VARCHAR', 'description': 'VARCHAR',
    'keyword': 'VARCHAR[]', 'publisher': 'STRUCT(name VARCHAR)',
    'issued': 'TIMESTAMP',
    'distribution': 'STRUCT(format VARCHAR, accessURL VARCHAR)[]'}})
"""


# ---------------------------------------------------------------------------
# Round-3 training-pipeline widening: PII redaction, int8 embedding
# quantization, sequence packing.
# ---------------------------------------------------------------------------

def q_kg_eval_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P18 as relational algebra: P/R of the top-cos-only tagger variant
    vs the canonical tagger (inner join = TP, anti joins = FP/FN)."""
    canon = q_kg_canonical(spark, sf_dir).select(
        "conv_id", "turn_idx", "concept_id").distinct()
    top_cos = (q_kg_candidates(spark, sf_dir).filter(F.col("rnk") == 1)
               .select("conv_id", "turn_idx", "concept_id").distinct())
    key = ["conv_id", "turn_idx", "concept_id"]
    tp = top_cos.join(canon, key, "inner").count()
    fp = top_cos.join(canon, key, "left_anti").count()
    fn = canon.join(top_cos, key, "left_anti").count()
    return spark.createDataFrame(
        [(tp, fp, fn,
          round(tp / (tp + fp), 6) if tp + fp else 1.0,
          round(tp / (tp + fn), 6) if tp + fn else 1.0)],
        "tp long, fp long, fn long, precision double, recall double")


def _sql_kg_eval_pr() -> str:
    canon = _sql_kg_canonical_body(
        "SELECT DISTINCT conv_id, turn_idx, concept_id FROM best WHERE rn = 1")
    cand = _sql_kg_candidates_body()
    return f"""
WITH canon AS ({canon}),
top_cos AS (SELECT DISTINCT conv_id, turn_idx, concept_id FROM ({cand}) WHERE rnk = 1),
tp AS (SELECT count(*) AS v FROM top_cos t JOIN canon c USING (conv_id, turn_idx, concept_id)),
fp AS (SELECT count(*) AS v FROM top_cos t ANTI JOIN canon c USING (conv_id, turn_idx, concept_id)),
fn AS (SELECT count(*) AS v FROM canon c ANTI JOIN top_cos t USING (conv_id, turn_idx, concept_id))
SELECT tp.v AS tp, fp.v AS fp, fn.v AS fn,
       round(CASE WHEN tp.v + fp.v = 0 THEN 1.0 ELSE cast(tp.v AS DOUBLE) / (tp.v + fp.v) END, 6) AS precision,
       round(CASE WHEN tp.v + fn.v = 0 THEN 1.0 ELSE cast(tp.v AS DOUBLE) / (tp.v + fn.v) END, 6) AS recall
FROM tp, fp, fn
"""


def q_kg_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the full heterogeneous KG
    (operators/graph.py) — node importance on the P15 output, the
    classic KG read-side analytic. Pure BIGINT arithmetic, so the
    distributed aggregation is bit-exact against DuckDB's unrolled
    replay of the same four synchronous rounds."""
    from ...operators.graph import pagerank_exact
    return (pagerank_exact(q_kg_triples(spark, sf_dir),
                           iterations=PAGERANK_ITERS)
            .select("node", F.col("rank").alias("rank_ppm")))


def _sql_kg_pagerank() -> str:
    its, prev = [], "r0"
    for i in range(1, PAGERANK_ITERS + 1):
        its.append(f"""i{i} AS (
  SELECT n.node,
         CAST(150000 + (850 * coalesce(f.inflow, 0)) // 1000 AS BIGINT) AS pr
  FROM nodes n LEFT JOIN (
    SELECT s.obj AS node, CAST(sum(r.pr // s.out_deg) AS BIGINT) AS inflow
    FROM send s JOIN {prev} r ON r.node = s.subj
    GROUP BY s.obj) f ON f.node = n.node)""")
        prev = f"i{i}"
    return f"""
WITH triples AS ({_sql_kg_triples_body()}),
edges AS (SELECT DISTINCT subj, obj FROM triples),
outd AS (SELECT subj, count(*) AS out_deg FROM edges GROUP BY subj),
nodes AS (SELECT subj AS node FROM edges UNION SELECT obj FROM edges),
send AS (SELECT e.subj, e.obj, o.out_deg
         FROM edges e JOIN outd o ON o.subj = e.subj),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM nodes),
{', '.join(its)}
SELECT node, pr AS rank_ppm FROM {prev}
"""


def q_kg_concept_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concept-association lift from conversation-level co-occurrence
    (operators/graph.py) — the monotone core of PMI as an exact ppm
    integer, over the canonical entity links."""
    from ...operators.graph import concept_lift
    return concept_lift(q_kg_canonical(spark, sf_dir), min_pair=2)


def _sql_kg_concept_lift() -> str:
    canon = _sql_kg_canonical_body(
        "SELECT conv_id, turn_idx, surface, concept_id, link_score FROM best WHERE rn = 1")
    return f"""
WITH canon AS ({canon}),
cc AS (SELECT DISTINCT conv_id, concept_id AS concept FROM canon),
nconv AS (SELECT count(DISTINCT conv_id) AS n FROM cc),
marg AS (SELECT concept, count(*) AS n_docs FROM cc GROUP BY concept),
pairs AS (
  SELECT a.concept AS concept_a, b.concept AS concept_b, count(*) AS n_ab
  FROM cc a JOIN cc b ON b.conv_id = a.conv_id AND a.concept < b.concept
  GROUP BY a.concept, b.concept
  HAVING count(*) >= 2)
SELECT p.concept_a, p.concept_b, ma.n_docs AS n_a, mb.n_docs AS n_b,
       p.n_ab,
       CAST((p.n_ab * nc.n * 1000000) // (ma.n_docs * mb.n_docs) AS BIGINT)
         AS lift_ppm
FROM pairs p JOIN marg ma ON ma.concept = p.concept_a
     JOIN marg mb ON mb.concept = p.concept_b CROSS JOIN nconv nc
"""


def q_kg_bgp_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL-style basic graph pattern over the KG
    (operators/graph.py bgp_match): find turns that mention a fixed
    concept AND used a tool AND reply to a turn, binding the tool and
    the predecessor's concepts — four triple patterns compiled to
    pushed-down filters + natural joins, the rdflib graph.query()
    analog. Oracle: the same conjunctive query as explicit SQL joins."""
    from ...operators.graph import bgp_match
    return bgp_match(q_kg_triples(spark, sf_dir), [
        ("?t", "mentions", BGP_CONCEPT),
        ("?t", "uses_tool", "?tool"),
        ("?t", "replies_to", "?u"),
        ("?u", "mentions", "?c2"),
    ])


def _sql_kg_bgp_query() -> str:
    return f"""
WITH triples AS ({_sql_kg_triples_body()})
SELECT DISTINCT p0.subj AS t, p1.obj AS tool, p2.obj AS u, p3.obj AS c2
FROM triples p0
JOIN triples p1 ON p1.subj = p0.subj AND p1.pred = 'uses_tool'
JOIN triples p2 ON p2.subj = p0.subj AND p2.pred = 'replies_to'
JOIN triples p3 ON p3.subj = p2.obj AND p3.pred = 'mentions'
WHERE p0.pred = 'mentions' AND p0.obj = '{BGP_CONCEPT}'
"""


def q_kg_construct_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL CONSTRUCT (operators/graph.py construct_triples): derive
    a NEW edge type from a BGP match — a turn `continues_topic` c when
    it mentions the same concept c as the turn it replies to. The
    constructed rows are (subj, pred, obj) and merge back into the
    graph via the storage layer. Oracle: the same conjunctive join +
    DISTINCT projection."""
    from ...operators.graph import construct_triples
    return construct_triples(
        q_kg_triples(spark, sf_dir),
        [("?t", "mentions", "?c"),
         ("?t", "replies_to", "?u"),
         ("?u", "mentions", "?c")],
        ("?t", "continues_topic", "?c"))


def _sql_kg_construct_query() -> str:
    return f"""
WITH triples AS ({_sql_kg_triples_body()})
SELECT DISTINCT p0.subj AS subj, 'continues_topic' AS pred, p0.obj AS obj
FROM triples p0
JOIN triples p1 ON p1.subj = p0.subj AND p1.pred = 'replies_to'
JOIN triples p2 ON p2.subj = p1.obj AND p2.pred = 'mentions'
                AND p2.obj = p0.obj
WHERE p0.pred = 'mentions'
"""


#: deterministic corrupt rows injected by kg_validate on BOTH engines so
#: every constraint class demonstrably fires (the derived corpus itself
#: only dangles replies_to targets of triple-less opening turns)
def q_kg_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHACL-lite KG shape validation (operators/graph.py
    validate_graph) over the derived graph plus three injected corrupt
    rows: per-constraint violation counts. The un-corrupted corpus
    already yields a natural nonzero `replies_to_target_exists` count —
    opening turns that emit no triples are replied to but absent as
    subjects."""
    from ...operators.graph import validate_graph
    import pandas as pd
    bad = spark.createDataFrame(
        pd.DataFrame(VALIDATE_BAD_ROWS, columns=[
            "subj", "pred", "obj", "conv_id", "turn_idx", "score"]),
        "subj string, pred string, obj string, conv_id string, "
        "turn_idx int, score double")
    g = (q_kg_triples(spark, sf_dir)
         .withColumn("conv_id", F.lit("x")).withColumn("turn_idx", F.lit(0))
         .unionByName(bad))
    cs = driver_concepts()
    concepts = spark.createDataFrame(
        pd.DataFrame({"concept_id": [c.concept_id for c in cs]}))
    from ..driver_ontology import driver_ancestors
    ancestors = spark.createDataFrame(
        driver_ancestors()[["concept_id", "anc_id"]])
    return validate_graph(g, concepts, ancestors=ancestors)


def _sql_kg_validate() -> str:
    import pandas as pd
    bad = " UNION ALL ".join(
        f"SELECT '{s}' AS subj, '{p}' AS pred, '{o}' AS obj, "
        f"{float(sc)} AS score"
        for s, p, o, _c, _t, sc in VALIDATE_BAD_ROWS)
    cv = values_sql(
        pd.DataFrame({"concept_id":
                      [c.concept_id for c in driver_concepts()]}), "c")
    from ..driver_ontology import driver_ancestors
    av = values_sql(driver_ancestors()[["concept_id", "anc_id"]], "a")
    return f"""
WITH triples0 AS ({_sql_kg_triples_body()}),
triples AS (SELECT subj, pred, obj, score FROM triples0
            UNION ALL {bad}),
scalar AS (
  SELECT * FROM (
    SELECT
      sum(CASE WHEN pred = 'mentions' AND (score <= 0 OR score > 1)
               THEN 1 ELSE 0 END) AS mentions_score_in_unit_range,
      sum(CASE WHEN pred = 'uses_tool' AND NOT starts_with(obj, 'tool:')
               THEN 1 ELSE 0 END) AS uses_tool_obj_prefixed,
      sum(CASE WHEN pred = 'replies_to' AND obj = subj
               THEN 1 ELSE 0 END) AS no_self_reply,
      sum(CASE WHEN NOT regexp_matches(subj, '^turn:.+:[0-9]+$')
               THEN 1 ELSE 0 END) AS subj_wellformed
    FROM triples)
  UNPIVOT (violations FOR "constraint" IN (
      mentions_score_in_unit_range, uses_tool_obj_prefixed,
      no_self_reply, subj_wellformed))
),
bad_concept AS (
  SELECT 'mentions_obj_in_ontology' AS "constraint",
         count(*) AS violations
  FROM triples m
  WHERE m.pred = 'mentions'
    AND NOT EXISTS (SELECT 1 FROM {cv} WHERE c.concept_id = m.obj)
),
dangling AS (
  SELECT 'replies_to_target_exists' AS "constraint",
         count(DISTINCT r.obj) AS violations
  FROM triples r
  WHERE r.pred = 'replies_to'
    AND NOT EXISTS (SELECT 1 FROM triples s WHERE s.subj = r.obj)
),
justified AS (
  SELECT DISTINCT m.subj, a.anc_id FROM triples m
  JOIN {av} ON a.concept_id = m.obj
  WHERE m.pred = 'mentions'
),
unjustified AS (
  SELECT 'broader_edge_justified' AS "constraint", count(*) AS violations
  FROM triples b
  WHERE b.pred = 'mentions_broader'
    AND NOT EXISTS (SELECT 1 FROM justified j
                    WHERE j.subj = b.subj AND j.anc_id = b.obj)
)
SELECT "constraint", CAST(violations AS BIGINT) AS violations FROM scalar
UNION ALL SELECT "constraint", CAST(violations AS BIGINT) AS violations FROM bad_concept
UNION ALL SELECT "constraint", CAST(violations AS BIGINT) AS violations FROM dangling
UNION ALL SELECT "constraint", CAST(violations AS BIGINT) AS violations FROM unjustified
"""


def q_kg_path_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded property path replies_to{{1,3}} (SPARQL p+ with a depth
    cap, operators/graph.py bounded_path): every turn's reply ancestors
    up to 3 hops with minimum hop count. Oracle: the same closure
    unrolled as chained SQL joins."""
    from ...operators.graph import bounded_path
    return bounded_path(q_kg_triples(spark, sf_dir), "replies_to",
                        max_depth=PATH_DEPTH)


def _sql_kg_path_query() -> str:
    return f"""
WITH triples AS ({_sql_kg_triples_body()}),
e AS (SELECT DISTINCT subj AS src, obj AS dst FROM triples
      WHERE pred = 'replies_to'),
d1 AS (SELECT src, dst, 1 AS depth FROM e),
d2 AS (SELECT a.src, b.dst, 2 AS depth FROM d1 a JOIN e b ON b.src = a.dst),
d3 AS (SELECT a.src, b.dst, 3 AS depth FROM d2 a JOIN e b ON b.src = a.dst),
lv AS (SELECT * FROM d1 UNION ALL SELECT * FROM d2 UNION ALL
       SELECT * FROM d3)
SELECT src, dst, CAST(min(depth) AS INTEGER) AS depth
FROM lv GROUP BY src, dst
"""


def q_kg_bgp_optional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BGP with OPTIONAL and FILTER NOT EXISTS (operators/graph.py
    bgp_query): conversation-OPENING turns (no replies_to edge — anti
    join) that mention a fixed concept, with the tool they used if any
    (left join). Oracle: LEFT JOIN + NOT EXISTS in SQL."""
    from ...operators.graph import bgp_query
    return bgp_query(
        q_kg_triples(spark, sf_dir),
        [("?t", "mentions", BGP_CONCEPT)],
        optional=[[("?t", "uses_tool", "?tool")]],
        not_exists=[[("?t", "replies_to", "?u")]])


def _sql_kg_bgp_optional() -> str:
    return f"""
WITH triples AS ({_sql_kg_triples_body()})
SELECT DISTINCT p0.subj AS t, p1.obj AS tool
FROM triples p0
LEFT JOIN triples p1 ON p1.subj = p0.subj AND p1.pred = 'uses_tool'
WHERE p0.pred = 'mentions' AND p0.obj = '{BGP_CONCEPT}'
  AND NOT EXISTS (SELECT 1 FROM triples p2
                  WHERE p2.subj = p0.subj AND p2.pred = 'replies_to')
"""


def q_kg_incremental_cds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental CDS maintenance (operators/cds.py
    incremental_cds_update): the canonical links are split by TURN
    parity — so conversations deliberately span both batches — batch 1
    builds the tag state + CDS table, batch 2 arrives as an append and
    only its affected subjects are re-propagated and spliced in. The
    returned final CDS is value-checked against the ORACLE OF A FULL
    RECOMPUTE (the same SQL as kg_cds), which is exactly the IVM
    correctness claim."""
    from ...operators.cds import incremental_cds_update
    canon = q_kg_canonical(spark, sf_dir)

    def tags_of(df):
        return (df.groupBy(
            F.concat(F.lit("conv:"), F.col("conv_id")).alias("subj_key"),
            F.col("concept_id"))
            .agg(F.max("link_score").alias("tag_score")))

    batch1 = canon.filter(F.col("turn_idx") % 2 == 0)
    batch2 = canon.filter(F.col("turn_idx") % 2 == 1)
    state = tags_of(batch1)
    from ...operators.cds import propagate_cds
    cds = propagate_cds(state, _wup_df(spark))
    _, final = incremental_cds_update(cds, state, tags_of(batch2),
                                      _wup_df(spark))
    return final.select("subj_key",
                        F.col("concept_id").alias("cds_concept"), "score")


def q_kg_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corrupted-tail negative sampling over the KG's
    mention edges (operators/graph.py negative_samples) — the
    KG-embedding training-data generator. Oracle: digit-by-digit md5
    index replay + the same cyclic collision shift in SQL."""
    from ...operators.graph import negative_samples
    return negative_samples(q_kg_triples(spark, sf_dir),
                            n_neg=N_NEG_SAMPLES)


def _sql_kg_negative_samples() -> str:
    dig = " + ".join(
        f"(instr('0123456789abcdef', substring(k, {i + 1}, 1)) - 1) "
        f"* {16 ** (7 - i)}" for i in range(8))
    return f"""
WITH triples AS ({_sql_kg_triples_body()}),
m AS (SELECT DISTINCT subj, obj FROM triples WHERE pred = 'mentions'),
pool AS (
  SELECT concept, row_number() OVER (ORDER BY concept) - 1 AS idx
  FROM (SELECT DISTINCT obj AS concept FROM triples
        WHERE pred = 'mentions')),
pc AS (SELECT count(*) AS p FROM pool),
e AS (SELECT m.subj, m.obj, j.j AS neg_idx
      FROM m, unnest(range(1, {N_NEG_SAMPLES} + 1)) AS j(j)),
h AS (
  SELECT subj, obj, neg_idx, p,
         CAST(({dig}) AS BIGINT) % p AS h0
  FROM (SELECT e.*, pc.p,
               md5(subj || '|' || obj || '|' || cast(neg_idx AS VARCHAR))
                 AS k
        FROM e CROSS JOIN pc) x)
SELECT h.subj, h.obj AS obj_pos, CAST(h.neg_idx AS INTEGER) AS neg_idx,
       CASE WHEN p0.concept = h.obj THEN p1.concept
            ELSE p0.concept END AS obj_neg
FROM h JOIN pool p0 ON p0.idx = h.h0
     JOIN pool p1 ON p1.idx = (h.h0 + 1) % h.p
"""


def q_kg_tool_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tool-call bigram transition counts over the agent transcripts
    (operators/agentstats.py:tool_transitions)."""
    from ...operators.agentstats import tool_transitions
    return tool_transitions(derived_transcripts(spark, sf_dir))


SQL_KG_TOOL_SEQUENCES = f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
t AS (SELECT conv_id, turn_idx, tool FROM transcripts WHERE tool IS NOT NULL),
p AS (
  SELECT conv_id, tool,
         lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_tool
  FROM t
)
SELECT prev_tool, tool, count(*) AS n_pairs,
       count(DISTINCT conv_id) AS n_convs
FROM p WHERE prev_tool IS NOT NULL
GROUP BY prev_tool, tool
"""


def q_kg_tool_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tool latency stats from per-conversation ts deltas
    (operators/agentstats.py:tool_latency)."""
    from ...operators.agentstats import tool_latency
    return tool_latency(_transcripts_with_ts(spark, sf_dir))


SQL_KG_TOOL_LATENCY = f"""
WITH t AS ({_TS_TRANSCRIPTS_CTE}),
lat AS (
  SELECT tool,
         ts_s - lag(ts_s) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS lat_s
  FROM t
)
SELECT tool, count(*) AS n_calls,
       round(avg(lat_s), 6) + 0.0 AS avg_lat_s,
       min(lat_s) AS min_lat_s, max(lat_s) AS max_lat_s
FROM lat WHERE tool IS NOT NULL AND lat_s IS NOT NULL
GROUP BY tool
"""


def q_kg_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle participation counts over the concept co-occurrence
    graph (edges = concept pairs tagged in the same turn;
    operators/agentstats.py:triangle_count)."""
    from ...operators.agentstats import triangle_count
    tags = (_mentions_df(spark, sf_dir)
            .select("conv_id", "turn_idx", "concept_id").distinct())
    a = tags.alias("ta")
    b = tags.alias("tb")
    edges = (a.join(b, (F.col("ta.conv_id") == F.col("tb.conv_id"))
                    & (F.col("ta.turn_idx") == F.col("tb.turn_idx"))
                    & (F.col("ta.concept_id") < F.col("tb.concept_id")))
             .select(F.col("ta.concept_id").alias("src"),
                     F.col("tb.concept_id").alias("dst")))
    return triangle_count(edges)


SQL_KG_TRIANGLES = f"""
WITH {_MENTIONS_CTE},
tags AS (SELECT DISTINCT conv_id, turn_idx, concept_id FROM mentions),
edges AS (
  SELECT DISTINCT a.concept_id AS a, b.concept_id AS b
  FROM tags a JOIN tags b
    ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
   AND a.concept_id < b.concept_id
),
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM edges e1
  JOIN edges e2 ON e2.a = e1.b
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT a AS v FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT v AS concept_id, count(*) AS n_triangles FROM corners GROUP BY v
"""


def q_kg_conv_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation KG rollup — the read-side summary a transcript
    dashboard needs: turns, tool calls, distinct tagged concepts, and
    the conversation's dominant concept (max mention count, id
    tiebreak). Joins the transcript table against the mention tags on
    conv_id; both sides cluster by conv_id, so at scale this rides the
    pipeline's existing partitioning."""
    t = derived_transcripts(spark, sf_dir)
    base = t.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.col("tool").isNotNull().cast("long")).alias("n_tool_calls"))
    m = _mentions_df(spark, sf_dir)
    per_concept = (m.groupBy("conv_id", "concept_id")
                   .agg(F.count(F.lit(1)).alias("n_mentions")))
    # n_concepts and the arg-max concept in ONE aggregation pass — the
    # min-struct((-count, id)) trick gives (max count, min id) without a
    # window or a second evaluation of the mentions join
    summary = per_concept.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_concepts"),
        F.min(F.struct((-F.col("n_mentions")).alias("neg"),
                       F.col("concept_id"))).alias("_top"))
    return (base.join(summary, "conv_id", "left")
            .select("conv_id", "n_turns", "n_tool_calls",
                    F.coalesce(F.col("n_concepts"), F.lit(0))
                    .alias("n_concepts"),
                    F.col("_top.concept_id").alias("top_concept"),
                    F.coalesce(-F.col("_top.neg"), F.lit(0))
                    .alias("top_mentions")))


SQL_KG_CONV_ROLLUP = f"""
WITH {_MENTIONS_CTE},
base AS (
  SELECT conv_id, count(*) AS n_turns,
         CAST(sum(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_tool_calls
  FROM transcripts GROUP BY conv_id
),
per_concept AS (
  SELECT conv_id, concept_id, count(*) AS n_mentions
  FROM mentions GROUP BY conv_id, concept_id
),
top AS (
  SELECT conv_id, concept_id AS top_concept, n_mentions AS top_mentions
  FROM (SELECT *, row_number() OVER (PARTITION BY conv_id
                                     ORDER BY n_mentions DESC, concept_id ASC)
                    AS rnk
        FROM per_concept)
  WHERE rnk = 1
),
nc AS (SELECT conv_id, count(*) AS n_concepts FROM per_concept GROUP BY conv_id)
SELECT b.conv_id, b.n_turns, b.n_tool_calls,
       coalesce(nc.n_concepts, 0) AS n_concepts,
       t.top_concept,
       coalesce(t.top_mentions, 0) AS top_mentions
FROM base b
LEFT JOIN nc ON b.conv_id = nc.conv_id
LEFT JOIN top t ON b.conv_id = t.conv_id
"""


def q_kg_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation episode segmentation by concept drift: a new episode
    starts when a tagged turn's concept set overlaps its conversation's
    PREVIOUS tagged turn at Jaccard < 0.5 (or at the first tagged turn).
    The topic-shift detector a transcript-analytics user runs on agent
    logs; all joins keyed by conv_id (+concept), episode ids via a
    running boundary cumsum — one window pass, no iteration.

    Jaccard here is a ratio of exact intersection/union counts, so the
    boundary decision is engine-deterministic."""
    tags = (_mentions_df(spark, sf_dir)
            .select("conv_id", "turn_idx", "concept_id").distinct())
    sizes = (tags.groupBy("conv_id", "turn_idx")
             .agg(F.count(F.lit(1)).alias("sz")))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    seq = (sizes
           .withColumn("prev_turn", F.lag("turn_idx").over(w))
           .withColumn("prev_sz", F.lag("sz").over(w)))
    a = tags.alias("a")
    b = tags.select(F.col("conv_id").alias("b_conv"),
                    F.col("turn_idx").alias("b_turn"),
                    F.col("concept_id").alias("b_concept"))
    inter = (a.join(seq.select("conv_id", "turn_idx", "prev_turn"),
                    ["conv_id", "turn_idx"])
             .join(b, (F.col("conv_id") == F.col("b_conv"))
                   & (F.col("prev_turn") == F.col("b_turn"))
                   & (F.col("concept_id") == F.col("b_concept")))
             .groupBy("conv_id", "turn_idx")
             .agg(F.count(F.lit(1)).alias("inter")))
    scored = (seq.join(inter, ["conv_id", "turn_idx"], "left")
              .withColumn("inter", F.coalesce(F.col("inter"), F.lit(0)))
              .withColumn(
                  "jac",
                  F.when(F.col("prev_turn").isNull(), F.lit(None))
                   .otherwise(F.round(
                       F.col("inter")
                       / (F.col("sz") + F.col("prev_sz") - F.col("inter")),
                       6))))
    boundary = (F.col("jac").isNull()
                | (F.col("jac") < EPISODE_JACCARD)).cast("long")
    return (scored
            .withColumn("episode",
                        F.sum(boundary).over(
                            w.rowsBetween(Window.unboundedPreceding, 0)))
            .select("conv_id", "turn_idx", "sz",
                    (F.col("jac") + F.lit(0.0)).alias("jac_prev"),
                    "episode"))


def _sql_kg_episodes() -> str:
    return f"""
WITH {_MENTIONS_CTE},
tags AS (SELECT DISTINCT conv_id, turn_idx, concept_id FROM mentions),
sizes AS (
  SELECT conv_id, turn_idx, count(*) AS sz
  FROM tags GROUP BY conv_id, turn_idx
),
seq AS (
  SELECT conv_id, turn_idx, sz,
         lag(turn_idx) OVER w AS prev_turn,
         lag(sz) OVER w AS prev_sz
  FROM sizes
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
inter AS (
  SELECT s.conv_id, s.turn_idx, count(*) AS inter
  FROM seq s
  JOIN tags a ON a.conv_id = s.conv_id AND a.turn_idx = s.turn_idx
  JOIN tags b ON b.conv_id = s.conv_id AND b.turn_idx = s.prev_turn
             AND b.concept_id = a.concept_id
  GROUP BY s.conv_id, s.turn_idx
),
scored AS (
  SELECT s.conv_id, s.turn_idx, s.sz, s.prev_turn, s.prev_sz,
         coalesce(i.inter, 0) AS inter,
         CASE WHEN s.prev_turn IS NULL THEN NULL
              ELSE round(CAST(coalesce(i.inter, 0) AS DOUBLE)
                         / (s.sz + s.prev_sz - coalesce(i.inter, 0)), 6)
         END AS jac
  FROM seq s LEFT JOIN inter i
    ON i.conv_id = s.conv_id AND i.turn_idx = s.turn_idx
)
SELECT conv_id, turn_idx, sz, jac + 0.0 AS jac_prev,
       CAST(sum(CASE WHEN jac IS NULL OR jac < {EPISODE_JACCARD}
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY conv_id ORDER BY turn_idx
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS episode
FROM scored
"""


def q_kg_search_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the kg_search ranking against a deterministic graded
    relevance oracle (first md5 hex digit of the subject, mod 4 — the
    labels are synthetic; the METRIC machinery is the operator).
    Contributions are exact-ppm integers (floor((2^rel - 1) * 1e6 /
    log2(pos + 1))), so the sums are merge-order independent; the only
    cross-engine float surface is one log2 per position (the repo's
    accepted ulp class)."""
    top = (q_kg_search(spark, sf_dir)
           .filter(F.col("rank") <= NDCG_K)
           .withColumn("rel",
                       F.conv(F.substring(F.md5("subj_key"), 1, 1), 16, 10)
                       .cast("int") % 4))
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1.0) * 1000000.0
    top = top.withColumn(
        "contrib_ppm",
        F.floor(gain / F.log2(F.col("rank") + 1)).cast("bigint"))
    wi = Window.orderBy(F.desc("rel"), F.asc("subj_key"))
    ideal = (top.withColumn("ipos", F.row_number().over(wi))
             .withColumn("icontrib_ppm",
                         F.floor(gain / F.log2(F.col("ipos") + 1))
                         .cast("bigint")))
    return ideal.agg(
        F.lit(NDCG_K).cast("int").alias("k"),
        F.sum("contrib_ppm").alias("dcg_ppm"),
        F.sum("icontrib_ppm").alias("idcg_ppm"),
        F.floor(F.sum("contrib_ppm") * 1000000.0
                / F.nullif(F.sum("icontrib_ppm"), F.lit(0)))
        .cast("bigint").alias("ndcg_ppm"))


def _sql_kg_search_ndcg() -> str:
    rel = ("(strpos('0123456789abcdef', substring(md5(subj_key), 1, 1)) - 1)"
           " % 4")
    return f"""
WITH base AS ({_sql_kg_search()}),
top AS (
  SELECT subj_key, rank, {rel} AS rel FROM base WHERE rank <= {NDCG_K}
),
scored AS (
  SELECT subj_key, rank, rel,
         CAST(floor((pow(2.0, rel) - 1.0) * 1000000.0
                    / log2(rank + 1)) AS BIGINT) AS contrib_ppm,
         row_number() OVER (ORDER BY rel DESC, subj_key ASC) AS ipos
  FROM top
),
ideal AS (
  SELECT *, CAST(floor((pow(2.0, rel) - 1.0) * 1000000.0
                       / log2(ipos + 1)) AS BIGINT) AS icontrib_ppm
  FROM scored
)
SELECT CAST({NDCG_K} AS INT) AS k,
       CAST(sum(contrib_ppm) AS BIGINT) AS dcg_ppm,
       CAST(sum(icontrib_ppm) AS BIGINT) AS idcg_ppm,
       CAST(floor(sum(contrib_ppm) * 1000000.0
                  / nullif(sum(icontrib_ppm), 0)) AS BIGINT) AS ndcg_ppm
FROM ideal
"""


def q_kg_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the materialized KG — the first graph
    health check a KG consumer runs (hubs, orphans, power-law shape):
    out-degree per subject over all predicates, then the histogram
    (degree -> node count). Two hash aggs, both partial-aggregating;
    never a collect."""
    t = q_kg_triples(spark, sf_dir)
    deg = t.groupBy("subj").agg(F.count(F.lit(1)).alias("degree"))
    return (deg.groupBy("degree")
            .agg(F.count(F.lit(1)).alias("n_nodes")))


def _sql_kg_degree_dist() -> str:
    return f"""
WITH triples AS ({_sql_kg_triples_body()}),
deg AS (SELECT subj, count(*) AS degree FROM triples GROUP BY subj)
SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree
"""


def q_kg_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ontology coverage QA: per taxonomy depth, how many concepts the
    corpus actually tags (mention triples) vs how many the ontology
    defines, with the untagged count — the gap report that tells an
    ontology maintainer which branches the corpus never exercises.
    Broadcast-sized concept table left-joined against the distinct
    tagged-concept set."""
    import pandas as pd
    cs = driver_concepts()
    onto = spark.createDataFrame(
        pd.DataFrame({"concept_id": [c.concept_id for c in cs],
                      "depth": [c.depth for c in cs]}),
        "concept_id string, depth int")
    tagged = (q_kg_triples(spark, sf_dir)
              .filter(F.col("pred") == "mentions")
              .select(F.regexp_replace("obj", "^concept:", "")
                      .alias("concept_id"))
              .distinct()
              .withColumn("is_tagged", F.lit(1)))
    return (onto.join(tagged, "concept_id", "left")
            .groupBy("depth")
            .agg(F.count(F.lit(1)).alias("n_concepts"),
                 F.coalesce(F.sum("is_tagged"), F.lit(0)).cast("bigint")
                 .alias("n_tagged"))
            .withColumn("n_untagged",
                        (F.col("n_concepts") - F.col("n_tagged"))
                        .cast("bigint")))


def _sql_kg_coverage() -> str:
    import pandas as pd
    cs = driver_concepts()
    onto = values_sql(pd.DataFrame(
        {"concept_id": [c.concept_id for c in cs],
         "depth": [c.depth for c in cs]}), "o")
    return f"""
WITH triples AS ({_sql_kg_triples_body()}),
tagged AS (
  SELECT DISTINCT regexp_replace(obj, '^concept:', '') AS concept_id
  FROM triples WHERE pred = 'mentions'
)
SELECT o.depth, count(*) AS n_concepts,
       CAST(sum(CASE WHEN t.concept_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_tagged,
       CAST(count(*) - sum(CASE WHEN t.concept_id IS NOT NULL
                                THEN 1 ELSE 0 END) AS BIGINT) AS n_untagged
FROM {onto} LEFT JOIN tagged t ON o.concept_id = t.concept_id
GROUP BY o.depth
"""


# ---------------------------------------------------------------------------
# round-4 continuation: graph density, semantic dedup, funnel analytics,
# concept drift.
# ---------------------------------------------------------------------------

def q_kg_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per concept over the co-mention
    graph (operators/graph.py:clustering_coefficient) — exact-integer
    ppm; which concepts sit in tight co-mention cliques vs stars."""
    from ...operators.graph import clustering_coefficient
    return clustering_coefficient(_comention_edges(spark, sf_dir))


SQL_KG_CLUSTERING = f"""
WITH {_MENTIONS_CTE},
tags AS (SELECT DISTINCT conv_id, turn_idx, concept_id FROM mentions),
edges AS (
  SELECT DISTINCT a.concept_id AS a, b.concept_id AS b
  FROM tags a JOIN tags b
    ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
   AND a.concept_id < b.concept_id
),
deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT a AS node FROM edges UNION ALL SELECT b FROM edges
  ) GROUP BY node
),
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM edges e1
  JOIN edges e2 ON e2.a = e1.b
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
tric AS (
  SELECT v, count(*) AS n_tri FROM (
    SELECT a AS v FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY v
)
SELECT d.node AS concept_id, d.degree,
       CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_triangles,
       CAST(CASE WHEN d.degree >= 2
                 THEN (2 * coalesce(t.n_tri, 0) * 1000000)
                      // (d.degree * (d.degree - 1))
                 ELSE 0 END AS BIGINT) AS cc_ppm
FROM deg d LEFT JOIN tric t ON t.v = d.node
"""


def q_kg_concept_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concept-share drift across conversation stages: mention share of
    each concept per turn-depth bucket (stage = turn_idx DIV 4, capped
    at 11) in exact ppm, with the delta vs the concept's previous stage
    — the data-side topic-drift twin of kg_ontology_diff's schema-side
    evolution. Window is partitioned by concept_id (bounded stages per
    concept), never partitionless."""
    m = _mentions_df(spark, sf_dir)
    st = m.select("concept_id",
                  F.expr("least(turn_idx DIV 4, 11)").cast("int")
                  .alias("stage"))
    per = st.groupBy("concept_id", "stage").agg(
        F.count(F.lit(1)).alias("n"))
    tot = st.groupBy("stage").agg(F.count(F.lit(1)).alias("t"))
    sh = (per.join(tot, "stage")
          .select("concept_id", "stage",
                  F.expr("(n * 1000000) DIV t").cast("long")
                  .alias("share_ppm")))
    w = Window.partitionBy("concept_id").orderBy("stage")
    prev = F.lag("share_ppm").over(w)
    return sh.select(
        "concept_id", "stage", "share_ppm",
        prev.alias("prev_share_ppm"),
        F.abs(F.col("share_ppm") - prev).alias("drift_ppm"))


SQL_KG_CONCEPT_DRIFT = f"""
WITH {_MENTIONS_CTE},
st AS (
  SELECT concept_id,
         CAST(least(turn_idx // 4, 11) AS INTEGER) AS stage
  FROM mentions
),
per AS (SELECT concept_id, stage, count(*) AS n FROM st GROUP BY 1, 2),
tot AS (SELECT stage, count(*) AS t FROM st GROUP BY 1),
sh AS (
  SELECT p.concept_id, p.stage,
         CAST((p.n * 1000000) // t.t AS BIGINT) AS share_ppm
  FROM per p JOIN tot t USING (stage)
)
SELECT concept_id, stage, share_ppm,
       lag(share_ppm) OVER w AS prev_share_ppm,
       abs(share_ppm - lag(share_ppm) OVER w) AS drift_ppm
FROM sh
WINDOW w AS (PARTITION BY concept_id ORDER BY stage)
"""


def q_kg_related(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Related-concept mining: co-occurrence Jaccard over turn posting
    lists (operators/graph.py:concept_jaccard) — which taxonomy nodes
    the corpus treats as near-synonyms, exact-integer ppm."""
    from ...operators.graph import concept_jaccard
    tags = (_mentions_df(spark, sf_dir)
            .select("conv_id", "turn_idx", "concept_id").distinct())
    return concept_jaccard(tags)


SQL_KG_RELATED = f"""
WITH {_MENTIONS_CTE},
tags AS (
  SELECT DISTINCT conv_id || ':' || CAST(turn_idx AS VARCHAR) AS unit,
         concept_id
  FROM mentions
),
per_concept AS (
  SELECT concept_id, count(*) AS n_units FROM tags GROUP BY concept_id
),
pairs AS (
  SELECT a.concept_id AS concept_a, b.concept_id AS concept_b,
         count(*) AS n_ab
  FROM tags a JOIN tags b
    ON a.unit = b.unit AND a.concept_id < b.concept_id
  GROUP BY 1, 2
)
SELECT p.concept_a, p.concept_b,
       ca.n_units AS n_a, cb.n_units AS n_b, p.n_ab,
       CAST(p.n_ab * 1000000 // (ca.n_units + cb.n_units - p.n_ab)
            AS BIGINT) AS jaccard_ppm
FROM pairs p
JOIN per_concept ca ON ca.concept_id = p.concept_a
JOIN per_concept cb ON cb.concept_id = p.concept_b
"""


def q_kg_resnik(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resnik-style Most-Informative-Common-Subsumer similarity for
    co-tagged concept pairs (operators/graph.py:resnik_mics):
    corpus-derived information content in exact fixed point — the
    classic taxonomy similarity family (Resnik/Lin) re-expressed
    rank-equivalently without float logs."""
    from ...operators.graph import resnik_mics
    from ..driver_ontology import driver_ancestors
    tags = (_mentions_df(spark, sf_dir)
            .select("conv_id", "turn_idx", "concept_id").distinct())
    anc = spark.createDataFrame(driver_ancestors()[["concept_id", "anc_id"]])
    return resnik_mics(tags, anc)


def _sql_kg_resnik() -> str:
    av = values_sql(driver_ancestors()[["concept_id", "anc_id"]], "a")
    return f"""
WITH {_MENTIONS_CTE},
anc AS (SELECT concept_id, anc_id FROM {av}),
closure AS (
  SELECT concept_id, anc_id FROM anc
  UNION
  SELECT x, x FROM (
    SELECT concept_id AS x FROM anc UNION SELECT anc_id FROM anc
  )
),
tags AS (
  SELECT DISTINCT conv_id || ':' || CAST(turn_idx AS VARCHAR) AS unit,
         concept_id
  FROM mentions
),
total AS (SELECT count(*) AS total_mass FROM tags),
mass AS (
  SELECT c.anc_id, count(*) AS mass
  FROM tags t JOIN closure c USING (concept_id)
  GROUP BY c.anc_id
),
pairs AS (
  SELECT DISTINCT a.concept_id AS concept_a, b.concept_id AS concept_b
  FROM tags a JOIN tags b
    ON a.unit = b.unit AND a.concept_id < b.concept_id
),
common AS (
  SELECT p.concept_a, p.concept_b, ca.anc_id, m.mass,
         row_number() OVER (PARTITION BY p.concept_a, p.concept_b
                            ORDER BY m.mass ASC, ca.anc_id ASC) AS rn
  FROM pairs p
  JOIN closure ca ON ca.concept_id = p.concept_a
  JOIN closure cb ON cb.concept_id = p.concept_b
                 AND cb.anc_id = ca.anc_id
  JOIN mass m ON m.anc_id = ca.anc_id
)
SELECT concept_a, concept_b, anc_id AS mics_id, mass AS mics_mass,
       CAST(mass * 1000000 // total_mass AS BIGINT) AS p_mics_ppm
FROM common, total WHERE rn = 1
"""


def q_kg_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round k-core decomposition of the KG
    (operators/graph.py:kcore_peel) — the density skeleton separating
    the connected conceptual core from pendant turns. Six synchronous
    peeling rounds, fixpoint-within-rounds pytest-pinned on every test
    corpus; the oracle replays the identical unrolled rounds so the
    pairing is exact whether or not peeling has converged."""
    from ...operators.graph import kcore_peel
    return kcore_peel(q_kg_triples(spark, sf_dir),
                      k=KCORE_K, rounds=KCORE_ROUNDS)


def _sql_kg_kcore() -> str:
    rounds, prev = [], "a0"
    for i in range(1, KCORE_ROUNDS + 1):
        rounds.append(f"""d{i} AS (
  SELECT e.src, count(*) AS deg
  FROM adj e JOIN {prev} s ON e.src = s.node JOIN {prev} t ON e.dst = t.node
  GROUP BY e.src),
a{i} AS (SELECT src AS node FROM d{i} WHERE deg >= {KCORE_K})""")
        prev = f"a{i}"
    return f"""
WITH triples AS MATERIALIZED ({_sql_kg_triples_body()}),
und AS MATERIALIZED (SELECT DISTINCT subj, obj FROM triples),
adj AS MATERIALIZED (SELECT subj AS src, obj AS dst FROM und
        UNION SELECT obj, subj FROM und),
a0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM adj),
{', '.join(rounds)}
SELECT src AS node, CAST(deg AS BIGINT) AS core_deg
FROM d{KCORE_ROUNDS} WHERE deg >= {KCORE_K}
"""


def q_kg_lin_jc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lin similarity + Jiang-Conrath distance for co-tagged concept
    pairs (operators/graph.py:lin_jc) — completes the taxonomy
    similarity family next to Wu-Palmer (kg_wup_matrix) and Resnik
    (kg_resnik), the trio the ontology-retrieval literature evaluates
    together [K]. Same corpus-IC masses as kg_resnik; the ln/division
    float math follows the repo's round(x, 6) + 0.0 convention."""
    from ...operators.graph import lin_jc
    from ..driver_ontology import driver_ancestors
    tags = (_mentions_df(spark, sf_dir)
            .select("conv_id", "turn_idx", "concept_id").distinct())
    anc = spark.createDataFrame(driver_ancestors()[["concept_id", "anc_id"]])
    return lin_jc(tags, anc)


def _sql_kg_lin_jc() -> str:
    av = values_sql(driver_ancestors()[["concept_id", "anc_id"]], "a")
    ic_a = "(ln(t.total_mass) - ln(ma.mass))"
    ic_b = "(ln(t.total_mass) - ln(mb.mass))"
    ic_m = "(ln(t.total_mass) - ln(m.mics_mass))"
    return f"""
WITH {_MENTIONS_CTE},
anc AS (SELECT concept_id, anc_id FROM {av}),
closure AS (
  SELECT concept_id, anc_id FROM anc
  UNION
  SELECT x, x FROM (
    SELECT concept_id AS x FROM anc UNION SELECT anc_id FROM anc
  )
),
tags AS (
  SELECT DISTINCT conv_id || ':' || CAST(turn_idx AS VARCHAR) AS unit,
         concept_id
  FROM mentions
),
total AS (SELECT count(*) AS total_mass FROM tags),
mass AS (
  SELECT c.anc_id, count(*) AS mass
  FROM tags t JOIN closure c USING (concept_id)
  GROUP BY c.anc_id
),
pairs AS (
  SELECT DISTINCT a.concept_id AS concept_a, b.concept_id AS concept_b
  FROM tags a JOIN tags b
    ON a.unit = b.unit AND a.concept_id < b.concept_id
),
common AS (
  SELECT p.concept_a, p.concept_b, ca.anc_id, m.mass,
         row_number() OVER (PARTITION BY p.concept_a, p.concept_b
                            ORDER BY m.mass ASC, ca.anc_id ASC) AS rn
  FROM pairs p
  JOIN closure ca ON ca.concept_id = p.concept_a
  JOIN closure cb ON cb.concept_id = p.concept_b
                 AND cb.anc_id = ca.anc_id
  JOIN mass m ON m.anc_id = ca.anc_id
),
mics AS (
  SELECT concept_a, concept_b, anc_id AS mics_id, mass AS mics_mass
  FROM common WHERE rn = 1
)
SELECT m.concept_a, m.concept_b, m.mics_id,
       CASE WHEN ({ic_a} + {ic_b}) > 0
            THEN round(2 * {ic_m} / ({ic_a} + {ic_b}), 6) + 0.0 END
         AS lin_sim,
       round(({ic_a} + {ic_b}) - 2 * {ic_m}, 6) + 0.0 AS jc_dist
FROM mics m
JOIN mass ma ON ma.anc_id = m.concept_a
JOIN mass mb ON mb.anc_id = m.concept_b
CROSS JOIN total t
"""


def q_kg_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the full heterogeneous KG
    (operators/graph.py:hits_exact) — the second classic link-analysis
    read next to kg_pagerank, with a semantically real hub/authority
    split (turns point, concepts/tools collect). Pure BIGINT ppm with
    L1 renormalization each half-step, so the distributed sums are
    bit-exact against DuckDB's unrolled replay of the same rounds."""
    from ...operators.graph import hits_exact
    return hits_exact(q_kg_triples(spark, sf_dir), iterations=HITS_ITERS)


def _sql_kg_hits() -> str:
    steps, prev_hub = [], "h0"
    prev_auth = None
    for i in range(1, HITS_ITERS + 1):
        steps.append(f"""a{i}_raw AS MATERIALIZED (
  SELECT e.obj AS node, CAST(sum(h.score) AS BIGINT) AS raw
  FROM edges e JOIN {prev_hub} h ON h.node = e.subj GROUP BY e.obj),
a{i} AS MATERIALIZED (
  SELECT n.node, CAST(coalesce(r.raw, 0) * 1000000 // t.tot AS BIGINT)
           AS score
  FROM nodes n LEFT JOIN a{i}_raw r ON r.node = n.node
  CROSS JOIN (SELECT sum(raw) AS tot FROM a{i}_raw) t),
h{i}_raw AS MATERIALIZED (
  SELECT e.subj AS node, CAST(sum(a.score) AS BIGINT) AS raw
  FROM edges e JOIN a{i} a ON a.node = e.obj GROUP BY e.subj),
h{i} AS MATERIALIZED (
  SELECT n.node, CAST(coalesce(r.raw, 0) * 1000000 // t.tot AS BIGINT)
           AS score
  FROM nodes n LEFT JOIN h{i}_raw r ON r.node = n.node
  CROSS JOIN (SELECT sum(raw) AS tot FROM h{i}_raw) t)""")
        prev_hub, prev_auth = f"h{i}", f"a{i}"
    return f"""
WITH triples AS MATERIALIZED ({_sql_kg_triples_body()}),
edges AS MATERIALIZED (SELECT DISTINCT subj, obj FROM triples),
nodes AS MATERIALIZED (SELECT subj AS node FROM edges UNION SELECT obj FROM edges),
h0 AS MATERIALIZED (SELECT node, CAST(1000000 AS BIGINT) AS score FROM nodes),
{', '.join(steps)}
SELECT n.node, a.score AS auth_ppm, h.score AS hub_ppm
FROM nodes n JOIN {prev_auth} a ON a.node = n.node
             JOIN {prev_hub} h ON h.node = n.node
"""


def q_kg_ask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL ASK battery over the constructed KG — boolean existence
    for four fixed patterns (simple triple, bound-object triple, a
    conjunctive two-pattern BGP sharing ?turn, and a guaranteed-false
    probe), completing the SPARQL verb surface next to SELECT
    (kg_bgp_query) and CONSTRUCT (kg_construct_query). Each ASK is one
    aggregate over a pushed-down predicate filter — no result
    materialization, which is the point of ASK at scale."""
    t = q_kg_triples(spark, sf_dir)
    a1 = t.agg((F.sum(F.when(F.col("pred") == "mentions", 1)
                      .otherwise(0)) > 0).alias("answer")) \
        .select(F.lit("any_mention").alias("ask_id"), "answer")
    a2 = t.agg((F.sum(F.when((F.col("pred") == "uses_tool")
                             & (F.col("obj") == ASK_TOOL), 1)
                      .otherwise(0)) > 0).alias("answer")) \
        .select(F.lit("uses_tool3").alias("ask_id"), "answer")
    m = (t.filter((F.col("pred") == "mentions")
                  & (F.col("obj") == ASK_CONCEPT))
         .select(F.col("subj").alias("turn")))
    r = (t.filter(F.col("pred") == "replies_to")
         .select(F.col("subj").alias("turn")))
    a3 = (m.join(r, "turn", "left_semi")
          .agg((F.count(F.lit(1)) > 0).alias("answer"))
          .select(F.lit("mention_and_reply").alias("ask_id"), "answer"))
    a4 = t.agg((F.sum(F.when(F.col("obj") == ASK_MISSING, 1)
                      .otherwise(0)) > 0).alias("answer")) \
        .select(F.lit("missing_concept").alias("ask_id"), "answer")
    return a1.unionByName(a2).unionByName(a3).unionByName(a4)


def _sql_kg_ask() -> str:
    return f"""
WITH triples AS ({_sql_kg_triples_body()})
SELECT 'any_mention' AS ask_id,
       EXISTS (SELECT 1 FROM triples WHERE pred = 'mentions') AS answer
UNION ALL
SELECT 'uses_tool3',
       EXISTS (SELECT 1 FROM triples
               WHERE pred = 'uses_tool' AND obj = '{ASK_TOOL}')
UNION ALL
SELECT 'mention_and_reply',
       EXISTS (SELECT 1 FROM triples m JOIN triples r
                 ON r.subj = m.subj AND r.pred = 'replies_to'
               WHERE m.pred = 'mentions' AND m.obj = '{ASK_CONCEPT}')
UNION ALL
SELECT 'missing_concept',
       EXISTS (SELECT 1 FROM triples WHERE obj = '{ASK_MISSING}')
"""


def q_kg_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded multi-source BFS reachability over the undirected KG
    (operators/graph.py:bfs_depths): minimum hop distance from the
    seed set {concept dq:L27, tool:tool3}, capped at 3 hops — the
    neighborhood-expansion read behind "what conversations sit near
    these capabilities". Spark explores level-by-level (anti-join
    blocks re-discovery, so first-found depth IS min depth); the
    oracle re-derives it as min(depth) over a depth-bounded recursive
    CTE — two genuinely different algorithms, one answer."""
    from ...operators.graph import bfs_depths
    seeds = spark.createDataFrame([(s,) for s in BFS_SEEDS], "node string")
    return bfs_depths(q_kg_triples(spark, sf_dir), seeds,
                      max_hops=BFS_MAX_HOPS)


def _sql_kg_bfs() -> str:
    seed_rows = ", ".join(f"('{s}')" for s in BFS_SEEDS)
    return f"""
WITH RECURSIVE triples AS MATERIALIZED ({_sql_kg_triples_body()}),
e AS MATERIALIZED (
  SELECT subj AS src, obj AS dst FROM (SELECT DISTINCT subj, obj FROM triples)
  UNION
  SELECT obj, subj FROM (SELECT DISTINCT subj, obj FROM triples)),
r(node, depth) AS (
  SELECT node, 0 FROM (VALUES {seed_rows}) s(node)
  UNION
  SELECT e.dst, r.depth + 1
  FROM r JOIN e ON e.src = r.node
  WHERE r.depth < {BFS_MAX_HOPS}
)
SELECT node, CAST(min(depth) AS BIGINT) AS depth FROM r GROUP BY node
"""


def q_kg_community(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation community detection over the undirected KG
    (operators/graph.py:label_propagation): 2 synchronous rounds,
    neighbor-majority relabeling with min-label tie-break — fully
    deterministic, so the DuckDB oracle replays the unrolled rounds
    exactly. Communities in the heterogeneous graph read as
    conversation-topic basins (turns pulled toward the concepts they
    mention)."""
    from ...operators.graph import label_propagation
    return label_propagation(q_kg_triples(spark, sf_dir),
                             rounds=LP_ROUNDS)


def _sql_kg_community() -> str:
    steps = []
    for i in range(1, LP_ROUNDS + 1):
        steps.append(f"""n{i} AS MATERIALIZED (
  SELECT e.dst AS node, l.lab, count(*) AS c
  FROM e JOIN l{i - 1} l ON l.node = e.src GROUP BY e.dst, l.lab),
p{i} AS MATERIALIZED (
  SELECT node, lab FROM (
    SELECT node, lab,
           row_number() OVER (PARTITION BY node
                              ORDER BY c DESC, lab ASC) AS rk
    FROM n{i}) WHERE rk = 1),
l{i} AS MATERIALIZED (
  SELECT l.node, coalesce(p.lab, l.lab) AS lab
  FROM l{i - 1} l LEFT JOIN p{i} p ON p.node = l.node)""")
    return f"""
WITH triples AS MATERIALIZED ({_sql_kg_triples_body()}),
e AS MATERIALIZED (
  SELECT subj AS src, obj AS dst FROM (SELECT DISTINCT subj, obj FROM triples)
  UNION
  SELECT obj, subj FROM (SELECT DISTINCT subj, obj FROM triples)),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
l0 AS MATERIALIZED (SELECT node, node AS lab FROM nodes),
{', '.join(steps)}
SELECT node, lab AS community FROM l{LP_ROUNDS}
"""


def q_kg_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded multi-source WEIGHTED shortest paths over the KG
    (operators/graph.py:shortest_paths): min total edge cost from the
    BFS seed set within 3 relaxation rounds, predicates priced
    mentions=3 / uses_tool=2 / replies_to=1 — "how semantically close
    is this turn to these capabilities", the weighted refinement of
    kg_bfs's hop counts. Spark runs 3 synchronous Bellman-Ford rounds
    (join + min-agg per round, integer weights so min is
    merge-order-free); the oracle re-derives the same answer as
    min(cost) over a depth-bounded recursive CTE — two genuinely
    different algorithms, one answer."""
    from ...operators.graph import shortest_paths
    seeds = spark.createDataFrame([(s,) for s in BFS_SEEDS], "node string")
    return shortest_paths(q_kg_triples(spark, sf_dir), seeds,
                          SP_WEIGHTS, rounds=SP_ROUNDS)


def _sql_kg_shortest_path() -> str:
    seed_rows = ", ".join(f"('{s}')" for s in BFS_SEEDS)
    case = ("CASE pred "
            + " ".join(f"WHEN '{p}' THEN {w}"
                       for p, w in sorted(SP_WEIGHTS.items()))
            + " END")
    return f"""
WITH RECURSIVE triples AS MATERIALIZED ({_sql_kg_triples_body()}),
we AS MATERIALIZED (
  SELECT src, dst, min(w) AS w FROM (
    SELECT subj AS src, obj AS dst, {case} AS w FROM triples
    UNION ALL
    SELECT obj AS src, subj AS dst, {case} AS w FROM triples)
  WHERE w IS NOT NULL GROUP BY src, dst),
r(node, d, hops) AS (
  SELECT node, CAST(0 AS BIGINT), 0 FROM (VALUES {seed_rows}) s(node)
  UNION
  SELECT e.dst, r.d + e.w, r.hops + 1
  FROM r JOIN we e ON e.src = r.node
  WHERE r.hops < {SP_ROUNDS}
)
SELECT node, CAST(min(d) AS BIGINT) AS dist FROM r GROUP BY node
"""


def q_kg_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal KG: every triple observation carries the turn's
    timestamp, and the graph is queried AS OF a point in time — the
    time-travel read a continuously-ingested KG needs ("what did we
    know at T?"). The as-of instant is derived from the data (min +
    3/5 of the span, exact integer DIV) so the same query text runs at
    every sf. Output: every triple ever observed up to T with its
    first observation time, last observation ≤ T, and observation
    count ≤ T — i.e. the snapshot plus the recency/support metadata an
    incremental re-tagger reads. One union of three map-side
    observation streams, one broadcast of the 1-row as-of instant, one
    (subj,pred,obj) agg — no windows except the replies_to lag, which
    partitions by conv_id."""
    canon = q_kg_canonical(spark, sf_dir)
    tts = _transcripts_with_ts(spark, sf_dir)
    subj = F.concat(F.lit("turn:"), F.col("conv_id"), F.lit(":"),
                    F.col("turn_idx").cast("string"))
    m = (canon.join(tts.select("conv_id", "turn_idx", "ts_s"),
                    ["conv_id", "turn_idx"])
         .select(subj.alias("subj"), F.lit("mentions").alias("pred"),
                 F.col("concept_id").alias("obj"), "ts_s"))
    u = (tts.filter(F.col("tool").isNotNull())
         .select(subj.alias("subj"), F.lit("uses_tool").alias("pred"),
                 F.concat(F.lit("tool:"), F.col("tool")).alias("obj"),
                 "ts_s"))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    r = (tts.withColumn("prev_turn_idx", F.lag("turn_idx", 1).over(w))
         .filter(F.col("prev_turn_idx").isNotNull())
         .select(subj.alias("subj"), F.lit("replies_to").alias("pred"),
                 F.concat(F.lit("turn:"), F.col("conv_id"), F.lit(":"),
                          F.col("prev_turn_idx").cast("string"))
                 .alias("obj"), "ts_s"))
    obs = m.unionByName(u).unionByName(r)
    t_row = obs.agg(F.expr(
        "min(ts_s) + (max(ts_s) - min(ts_s)) * 3 DIV 5").alias("t_asof"))
    return (obs.crossJoin(F.broadcast(t_row))
            .groupBy("subj", "pred", "obj")
            .agg(F.min("ts_s").cast("long").alias("first_seen_s"),
                 F.max(F.when(F.col("ts_s") <= F.col("t_asof"),
                              F.col("ts_s"))).cast("long")
                 .alias("last_seen_s"),
                 F.sum((F.col("ts_s") <= F.col("t_asof")).cast("long"))
                 .cast("long").alias("n_obs"),
                 F.max("t_asof").cast("long").alias("t_asof"))
            .filter(F.col("first_seen_s") <= F.col("t_asof")))


def _sql_kg_snapshot_asof() -> str:
    canon = _sql_kg_canonical_body(
        "SELECT conv_id, turn_idx, surface, concept_id, link_score "
        "FROM best WHERE rn = 1")
    return f"""
WITH canon AS ({canon}),
tts AS ({_TS_TRANSCRIPTS_CTE}),
obs AS (
  SELECT 'turn:' || c.conv_id || ':' || cast(c.turn_idx AS STRING) AS subj,
         'mentions' AS pred, c.concept_id AS obj, t.ts_s
  FROM canon c JOIN tts t
    ON t.conv_id = c.conv_id AND t.turn_idx = c.turn_idx
  UNION ALL
  SELECT 'turn:' || conv_id || ':' || cast(turn_idx AS STRING),
         'uses_tool', 'tool:' || tool, ts_s
  FROM tts WHERE tool IS NOT NULL
  UNION ALL
  SELECT 'turn:' || conv_id || ':' || cast(turn_idx AS STRING),
         'replies_to',
         'turn:' || conv_id || ':' || cast(prev_ti AS STRING), ts_s
  FROM (SELECT conv_id, turn_idx, ts_s,
               lag(turn_idx) OVER (PARTITION BY conv_id
                                   ORDER BY turn_idx) AS prev_ti
        FROM tts)
  WHERE prev_ti IS NOT NULL),
tt AS (SELECT min(ts_s) + (max(ts_s) - min(ts_s)) * 3 // 5 AS t_asof
       FROM obs)
SELECT subj, pred, obj,
       CAST(min(ts_s) AS BIGINT) AS first_seen_s,
       CAST(max(CASE WHEN ts_s <= t.t_asof THEN ts_s END) AS BIGINT)
         AS last_seen_s,
       CAST(sum(CASE WHEN ts_s <= t.t_asof THEN 1 ELSE 0 END) AS BIGINT)
         AS n_obs,
       CAST(max(t.t_asof) AS BIGINT) AS t_asof
FROM obs, tt t
GROUP BY 1, 2, 3
HAVING min(ts_s) <= max(t.t_asof)
"""


def q_kg_sparql_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL SELECT-aggregate over BGP bindings — the GROUP BY /
    HAVING half of the SPARQL 1.1 query surface (kg_bgp_query covers
    the pattern-matching half):

        SELECT ?concept (COUNT(DISTINCT ?turn)  AS n_turns)
                        (COUNT(DISTINCT ?tool)  AS n_tools)
                        (COUNT(*)               AS n_bindings)
        WHERE {{ ?turn <mentions>  ?concept .
                 ?turn <uses_tool> ?tool }}
        GROUP BY ?concept
        HAVING (COUNT(DISTINCT ?turn) >= 2)

    The BGP compiles to pushed-down-filtered self-joins of the triple
    table (operators/graph.py:bgp_query — SPARQL set semantics, so
    bindings are DISTINCT before aggregation, exactly like the SQL
    twin's SELECT DISTINCT subquery); the aggregate is one keyed hash
    agg with map-side partials. Grouped distinct counts expand via
    Expand (one pass), never a self-join per distinct."""
    from ...operators.graph import bgp_query
    b = bgp_query(q_kg_triples(spark, sf_dir),
                  [("?turn", "mentions", "?concept"),
                   ("?turn", "uses_tool", "?tool")])
    return (b.groupBy("concept")
            .agg(F.countDistinct("turn").cast("long").alias("n_turns"),
                 F.countDistinct("tool").cast("long").alias("n_tools"),
                 F.count(F.lit(1)).cast("long").alias("n_bindings"))
            .filter(F.col("n_turns") >= SPARQL_AGG_MIN_TURNS))


def _sql_kg_sparql_agg() -> str:
    return f"""
WITH triples AS MATERIALIZED ({_sql_kg_triples_body()}),
b AS (
  SELECT DISTINCT m.subj AS turn, m.obj AS concept, u.obj AS tool
  FROM triples m JOIN triples u ON u.subj = m.subj
  WHERE m.pred = 'mentions' AND u.pred = 'uses_tool')
SELECT concept,
       CAST(count(DISTINCT turn) AS BIGINT) AS n_turns,
       CAST(count(DISTINCT tool) AS BIGINT) AS n_tools,
       CAST(count(*) AS BIGINT) AS n_bindings
FROM b GROUP BY concept
HAVING count(DISTINCT turn) >= {SPARQL_AGG_MIN_TURNS}
"""


def q_kg_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-Jaccard link prediction over the KG — the
    graph-completion read ("which un-linked node pairs probably belong
    together?") behind candidate generation for KG enrichment.
    score(a,b) = |N(a)∩N(b)| / |N(a)∪N(b)| in exact ppm for node pairs
    that share ≥ 2 neighbors but have NO edge (left-anti against the
    edge set), per-node top-5 by a qid-partitioned rank window.

    Shape: one 2-path self-join keyed on the middle node, with middle
    nodes ABOVE LINKPRED_HUB_CAP degree excluded from pair generation
    — the d² blowup lives entirely in the hubs (a concept mentioned by
    d turns links all d² of those turn pairs), and a neighbor shared
    via a hub is near-zero evidence anyway (the same reasoning that
    weights Adamic-Adar by 1/log deg; measured: the uncapped join was
    153 s at sf0.1, capped ~3 s). The cap is part of the operator's
    SEMANTICS, replayed identically by the oracle, so parity is
    exact. Degree joins stay broadcast-sized; no global operations."""
    from ...operators.graph import undirected_edges
    e = undirected_edges(q_kg_triples(spark, sf_dir))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    mid = (deg.filter(F.col("deg") <= LINKPRED_HUB_CAP)
           .select(F.col("src").alias("n")))
    p1 = (e.select(F.col("src").alias("a"), F.col("dst").alias("n"))
          .join(mid, "n"))
    p2 = (e.select(F.col("src").alias("n"), F.col("dst").alias("b"))
          .join(mid, "n"))
    two = (p1.join(p2, "n").filter(F.col("a") < F.col("b"))
           .groupBy("a", "b").agg(F.count(F.lit(1)).alias("common")))
    cand = two.join(
        e.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        ["a", "b"], "left_anti")
    j = (cand
         .join(deg.select(F.col("src").alias("a"),
                          F.col("deg").alias("deg_a")), "a")
         .join(deg.select(F.col("src").alias("b"),
                          F.col("deg").alias("deg_b")), "b")
         .filter(F.col("common") >= LINKPRED_MIN_COMMON)
         .withColumn("jaccard_ppm", F.expr(
             "common * 1000000 DIV (deg_a + deg_b - common)")))
    w = Window.partitionBy("a").orderBy(F.desc("jaccard_ppm"), F.asc("b"))
    return (j.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= LINKPRED_TOP)
            .select("a", "b", F.col("common").cast("long").alias("common"),
                    F.col("jaccard_ppm").cast("long").alias("jaccard_ppm"),
                    "rk"))


def _sql_kg_link_predict() -> str:
    return f"""
WITH triples AS MATERIALIZED ({_sql_kg_triples_body()}),
e AS MATERIALIZED (
  SELECT subj AS src, obj AS dst FROM (SELECT DISTINCT subj, obj FROM triples)
  UNION
  SELECT obj, subj FROM (SELECT DISTINCT subj, obj FROM triples)),
deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
mid AS (SELECT src AS n FROM deg WHERE deg <= {LINKPRED_HUB_CAP}),
two AS (
  SELECT p1.src AS a, p2.dst AS b, count(*) AS common
  FROM e p1 JOIN e p2 ON p2.src = p1.dst
  JOIN mid m ON m.n = p1.dst
  WHERE p1.src < p2.dst
  GROUP BY 1, 2),
cand AS (
  SELECT t.* FROM two t
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = t.a AND e.dst = t.b)),
j AS (
  SELECT c.a, c.b, c.common,
         c.common * 1000000 // (da.deg + db.deg - c.common) AS jaccard_ppm
  FROM cand c JOIN deg da ON da.src = c.a JOIN deg db ON db.src = c.b
  WHERE c.common >= {LINKPRED_MIN_COMMON})
SELECT a, b, CAST(common AS BIGINT) AS common,
       CAST(jaccard_ppm AS BIGINT) AS jaccard_ppm, rk
FROM (SELECT a, b, common, jaccard_ppm,
             row_number() OVER (PARTITION BY a
                                ORDER BY jaccard_ppm DESC, b ASC) AS rk
      FROM j)
WHERE rk <= {LINKPRED_TOP}
"""


def q_kg_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic DeepWalk-style walk corpus over the KG — the
    training-data generator for graph-embedding models (each walk is a
    "sentence" of nodes for the skip-gram stage). One walk of length 4
    starts at every concept node; the "random" step is a deterministic
    hash choice — next = the neighbor minimizing
    md5(cur || ':' || step || ':' || neighbor) — so the corpus is
    reproducible on any engine and any parallelism (the md5-replay
    convention this repo's oracles use throughout). Walks that hit a
    dead end stop early (absent rows, never NULL padding).

    Shape: per step one frontier⋈edges equi-join on the current node
    plus one per-(start)-partitioned rank window over candidate
    neighbors (bounded by degree). Step count is the constant WALK_LEN
    — no convergence probe, no driver state."""
    from ...operators.graph import undirected_edges
    tr = q_kg_triples(spark, sf_dir)
    e = undirected_edges(tr)
    starts = (tr.filter(F.col("pred") == "mentions")
              .select(F.col("obj").alias("start")).distinct())
    frontier = starts.select("start", F.col("start").alias("node"))
    walks = frontier.select("start", F.lit(0).cast("long").alias("step"),
                            "node")
    for step in range(1, WALK_LEN + 1):
        score = F.md5(F.concat(F.col("node"), F.lit(f":{step}:"),
                               F.col("dst")))
        w = Window.partitionBy("start").orderBy(score.asc(),
                                                F.col("dst").asc())
        frontier = (frontier.join(e, frontier.node == e.src)
                    .withColumn("rk", F.row_number().over(w))
                    .filter(F.col("rk") == 1)
                    .select("start", F.col("dst").alias("node")))
        walks = walks.unionByName(
            frontier.select("start", F.lit(step).cast("long").alias("step"),
                            "node"))
    return walks


def _sql_kg_random_walks() -> str:
    steps = []
    for i in range(1, WALK_LEN + 1):
        steps.append(f"""w{i} AS MATERIALIZED (
  SELECT start, node FROM (
    SELECT w.start, e.dst AS node,
           row_number() OVER (PARTITION BY w.start
                              ORDER BY md5(w.node || ':{i}:' || e.dst) ASC,
                                       e.dst ASC) AS rk
    FROM w{i - 1} w JOIN e ON e.src = w.node) WHERE rk = 1)""")
    selects = ["SELECT start, CAST(0 AS BIGINT) AS step, node FROM w0"]
    selects += [f"SELECT start, CAST({i} AS BIGINT) AS step, node FROM w{i}"
                for i in range(1, WALK_LEN + 1)]
    steps_sql = ",\n".join(steps)
    union_sql = " UNION ALL ".join(selects)
    return f"""
WITH triples AS MATERIALIZED ({_sql_kg_triples_body()}),
e AS MATERIALIZED (
  SELECT subj AS src, obj AS dst FROM (SELECT DISTINCT subj, obj FROM triples)
  UNION
  SELECT obj, subj FROM (SELECT DISTINCT subj, obj FROM triples)),
w0 AS MATERIALIZED (
  SELECT obj AS start, obj AS node
  FROM (SELECT DISTINCT obj FROM triples WHERE pred = 'mentions')),
{steps_sql}
{union_sql}
"""


def q_kg_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL DESCRIBE — the last of the four SPARQL 1.1 query verbs
    (SELECT / ASK / CONSTRUCT already paired): a concise bounded
    description of a resource. DESCRIBE's exact extent is
    implementation-defined; this engine's CBD is (a) every triple
    incident to the node in either role, plus (b) the 'mentions'
    attribute triples of the adjacent TURN nodes (turns act as the
    anonymous intermediates of this graph, the role blank nodes play
    in rdflib's CBD [K]). Two pushed-down filters of the triple table
    + one semi-join for the neighbor attributes — no traversal state."""
    from ...operators.graph import describe_cbd
    return describe_cbd(q_kg_triples(spark, sf_dir), DESCRIBE_NODE)


def _sql_kg_describe() -> str:
    return f"""
WITH triples AS MATERIALIZED ({_sql_kg_triples_body()}),
incident AS (
  SELECT subj, pred, obj, 'incident' AS via FROM triples
  WHERE subj = '{DESCRIBE_NODE}' OR obj = '{DESCRIBE_NODE}'),
nbr AS (
  SELECT DISTINCT subj AS nbr FROM triples
  WHERE obj = '{DESCRIBE_NODE}' AND subj LIKE 'turn:%'),
attrs AS (
  SELECT t.subj, t.pred, t.obj, 'neighbor' AS via
  FROM triples t JOIN nbr n ON n.nbr = t.subj
  WHERE t.pred = 'mentions' AND t.obj <> '{DESCRIBE_NODE}')
SELECT DISTINCT subj, pred, obj, via FROM (
  SELECT * FROM incident UNION ALL SELECT * FROM attrs)
"""


def q_kg_walk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeepWalk stage 2 — skip-gram (center, context) NODE pairs over
    the deterministic walk corpus (kg_random_walks), window ±2 within
    a walk, symmetric: exactly what curation_skipgram does for tokens,
    applied to the graph's "sentences". The two queries compose into
    the complete DeepWalk training-data pipeline (walks → pairs →
    embedding trainer). Same equi-join shape: each center explodes
    into W forward (start, step+o) keys — never a range join. No
    min-count cut: the walk corpus is one bounded sentence per concept,
    so every co-visit is signal."""
    walks = q_kg_random_walks(spark, sf_dir)
    ctr = walks.select("start", "step", F.col("node").alias("center"))
    off = (ctr.withColumn("o", F.explode(F.array(
        *[F.lit(i) for i in range(1, WALK_PAIR_WINDOW + 1)])))
        .select("start", (F.col("step") + F.col("o")).alias("step"),
                "center"))
    pairs = (off.join(walks, ["start", "step"])
             .select("center", F.col("node").alias("context")))
    sym = pairs.unionByName(
        pairs.select(F.col("context").alias("center"),
                     F.col("center").alias("context")))
    return (sym.groupBy("center", "context")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs")))


def _sql_kg_walk_pairs() -> str:
    walks = _sql_kg_random_walks()
    return f"""
WITH walks AS MATERIALIZED ({walks}),
pairs AS (
  SELECT a.node AS center, b.node AS context
  FROM walks a JOIN walks b
    ON b.start = a.start
   AND b.step - a.step BETWEEN 1 AND {WALK_PAIR_WINDOW}),
sym AS (SELECT center, context FROM pairs
        UNION ALL
        SELECT context, center FROM pairs)
SELECT center, context, CAST(count(*) AS BIGINT) AS n_pairs
FROM sym GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Round-4 wave 11: KG-construction extensions — relational→RDF direct
# mapping, knowledge fusion, open relation extraction, dialogue acts,
# predicate QA profile, blocking-quality audit (operators/construct.py,
# operators/dedup.py:blocking_audit)
# ---------------------------------------------------------------------------

def q_kg_direct_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3C-Direct-Mapping-lite [K]: a deterministic orders slice
    (o_orderkey % 10 == 0) mapped to RDF triples — row IRIs, literal
    columns, FK reference triples — plus the FK closure
    (customer → nation → region) for exactly the referenced rows.
    The second structured-data ingest front door next to DCAT: a KG
    builder bootstraps its ABox from existing warehouse tables.
    Union of map-only projections; closure pruning via broadcast
    semi-joins on slice-sized key sets."""
    from ...operators.construct import direct_mapping_triples
    return direct_mapping_triples(
        _tbl(spark, sf_dir, "orders"), _tbl(spark, sf_dir, "customer"),
        _tbl(spark, sf_dir, "nation"), _tbl(spark, sf_dir, "region"),
        modulus=DIRECT_MAP_MODULUS)


SQL_KG_DIRECT_MAPPING = f"""
WITH o AS (SELECT * FROM orders WHERE o_orderkey % {DIRECT_MAP_MODULUS} = 0),
c AS (SELECT * FROM customer
      WHERE c_custkey IN (SELECT DISTINCT o_custkey FROM o)),
n AS (SELECT * FROM nation
      WHERE n_nationkey IN (SELECT DISTINCT c_nationkey FROM c)),
r AS (SELECT * FROM region
      WHERE r_regionkey IN (SELECT DISTINCT n_regionkey FROM n))
SELECT DISTINCT subj, pred, obj FROM (
  SELECT 'order:' || CAST(o_orderkey AS VARCHAR) AS subj,
         'rdf:type' AS pred, 'tpch:Order' AS obj FROM o
  UNION ALL
  SELECT 'order:' || CAST(o_orderkey AS VARCHAR), 'tpch:status',
         o_orderstatus FROM o
  UNION ALL
  SELECT 'order:' || CAST(o_orderkey AS VARCHAR), 'tpch:priority',
         o_orderpriority FROM o
  UNION ALL
  SELECT 'order:' || CAST(o_orderkey AS VARCHAR), 'tpch:price_cents',
         CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR) FROM o
  UNION ALL
  SELECT 'order:' || CAST(o_orderkey AS VARCHAR), 'tpch:orderdate',
         CAST(CAST(o_orderdate AS DATE) AS VARCHAR) FROM o
  UNION ALL
  SELECT 'order:' || CAST(o_orderkey AS VARCHAR), 'tpch:customer',
         'customer:' || CAST(o_custkey AS VARCHAR) FROM o
  UNION ALL
  SELECT 'customer:' || CAST(c_custkey AS VARCHAR), 'rdf:type',
         'tpch:Customer' FROM c
  UNION ALL
  SELECT 'customer:' || CAST(c_custkey AS VARCHAR), 'tpch:mktsegment',
         c_mktsegment FROM c
  UNION ALL
  SELECT 'customer:' || CAST(c_custkey AS VARCHAR), 'tpch:nation',
         'nation:' || CAST(c_nationkey AS VARCHAR) FROM c
  UNION ALL
  SELECT 'nation:' || CAST(n_nationkey AS VARCHAR), 'tpch:name',
         n_name FROM n
  UNION ALL
  SELECT 'nation:' || CAST(n_nationkey AS VARCHAR), 'tpch:region',
         'region:' || CAST(n_regionkey AS VARCHAR) FROM n
  UNION ALL
  SELECT 'region:' || CAST(r_regionkey AS VARCHAR), 'tpch:name',
         r_name FROM r
)
"""


def q_kg_fact_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Knowledge fusion (Knowledge Vault-style support counting [K]):
    repeated observations of the same conversation-level fact
    (conv discusses concept) collapse into one row with raw / distinct-
    turn / role-weighted support, the provenance span, and a saturating
    exact-integer confidence. Two-level hash agg, map-side partials."""
    from ...operators.construct import fuse_facts
    t = derived_transcripts(spark, sf_dir)
    gaz = _gaz_df(spark)
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    m = (t.join(F.broadcast(gaz),
                padded.contains(F.concat(F.lit(" "), gaz.surface,
                                         F.lit(" "))), "inner")
         .select("conv_id", "turn_idx", "role", "concept_id"))
    return fuse_facts(m)


def _sql_kg_fact_fusion() -> str:
    from ...operators.construct import FUSION_PRIOR, FUSION_ROLE_WEIGHTS
    wu, wa, wt = (FUSION_ROLE_WEIGHTS["user"],
                  FUSION_ROLE_WEIGHTS["assistant"],
                  FUSION_ROLE_WEIGHTS["tool"])
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
mentions AS (
  SELECT t.conv_id, t.turn_idx, t.role, g.concept_id
  FROM transcripts t JOIN {_gaz_values()} ON
    (' ' || t.text || ' ') LIKE ('% ' || g.surface || ' %')
),
per_turn AS (
  SELECT conv_id, concept_id, turn_idx, count(*) AS n_obs,
         max(CASE role WHEN 'user' THEN {wu} WHEN 'assistant' THEN {wa}
             ELSE {wt} END) AS w_turn
  FROM mentions GROUP BY 1, 2, 3),
fused AS (
  SELECT conv_id, concept_id,
         sum(n_obs) AS n_mentions, count(*) AS n_turns,
         sum(w_turn) AS w_support,
         min(turn_idx) AS first_turn, max(turn_idx) AS last_turn
  FROM per_turn GROUP BY 1, 2)
SELECT 'conv:' || conv_id AS subj, 'discusses' AS pred,
       'concept:' || concept_id AS obj,
       CAST(n_mentions AS BIGINT) AS n_mentions,
       CAST(n_turns AS BIGINT) AS n_turns,
       CAST(w_support AS BIGINT) AS w_support,
       CAST(first_turn AS BIGINT) AS first_turn,
       CAST(last_turn AS BIGINT) AS last_turn,
       CAST(w_support * 1000000 // (w_support + {FUSION_PRIOR}) AS BIGINT)
         AS conf_ppm
FROM fused
"""


def q_kg_open_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern-based open relation extraction (ReVerb-lite [K]): mine
    (arg, trigger, arg) adjacency triples outside the gazetteer, with
    corpus-level support counts — how a KG grows predicates it was
    never configured for. Position-preserving tokenization; two
    equi-joins on (conv, turn, position); one support hash-agg."""
    from ...operators.construct import open_relation_triples
    return open_relation_triples(derived_transcripts(spark, sf_dir))


def _sql_kg_open_relations() -> str:
    from ...operators.construct import (OPENIE_MIN_SUPPORT, OPENIE_STOP,
                                       OPENIE_TRIGGERS)
    trig = ", ".join(f"'{t}'" for t in OPENIE_TRIGGERS)
    stop = ", ".join(f"'{t}'" for t in OPENIE_STOP)
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
toks AS (
  SELECT conv_id, turn_idx, tl[CAST(i AS INT) + 1] AS tok,
         CAST(i AS INT) AS pos
  FROM (SELECT conv_id, turn_idx, string_split(text, ' ') AS tl
        FROM transcripts),
       unnest(range(0, len(tl))) AS r(i)),
v AS (SELECT conv_id, turn_idx, pos AS vpos, tok AS rel
      FROM toks WHERE tok IN ({trig})),
args AS (
  SELECT conv_id, turn_idx, pos, tok FROM toks
  WHERE regexp_full_match(tok, '[a-z]{{3,}}')
    AND tok NOT IN ({trig}) AND tok NOT IN ({stop})),
trip AS (
  SELECT l.tok AS subj_tok, v.rel, r.tok AS obj_tok
  FROM v
  JOIN args l ON l.conv_id = v.conv_id AND l.turn_idx = v.turn_idx
             AND l.pos = v.vpos - 1
  JOIN args r ON r.conv_id = v.conv_id AND r.turn_idx = v.turn_idx
             AND r.pos = v.vpos + 1)
SELECT subj_tok, rel, obj_tok, CAST(count(*) AS BIGINT) AS n_support
FROM trip GROUP BY 1, 2, 3
HAVING count(*) >= {OPENIE_MIN_SUPPORT}
"""


def q_kg_dialogue_acts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dialogue-act tagging (cue-phrase heuristic [K]) + first-order
    act-transition matrix with exact-integer row-normalized
    probabilities — the conversation-structure profile of a transcript
    corpus. Lag window PARTITIONED BY conv_id; final normalization
    windows over the |acts|²-sized aggregate only."""
    from ...operators.construct import dialogue_act_transitions
    return dialogue_act_transitions(derived_transcripts(spark, sf_dir))


def _sql_kg_dialogue_acts() -> str:
    from ...operators.construct import ACT_DIRECTIVE_CUES, ACT_QUESTION_CUES
    qc = ", ".join(f"'{t}'" for t in ACT_QUESTION_CUES)
    dc = ", ".join(f"'{t}'" for t in ACT_DIRECTIVE_CUES)
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
tagged AS (
  SELECT conv_id, turn_idx,
         CASE WHEN contains(text, '?')
                   OR string_split(text, ' ')[1] IN ({qc}) THEN 'question'
              WHEN string_split(text, ' ')[1] IN ({dc}) THEN 'directive'
              ELSE 'inform' END AS act
  FROM transcripts),
tr AS (
  SELECT coalesce(lag(act) OVER (PARTITION BY conv_id ORDER BY turn_idx),
                  '<start>') AS prev_act, act
  FROM tagged),
counts AS (SELECT prev_act, act, count(*) AS n_trans FROM tr GROUP BY 1, 2)
SELECT prev_act, act, CAST(n_trans AS BIGINT) AS n_trans,
       CAST(n_trans * 1000000 //
            sum(n_trans) OVER (PARTITION BY prev_act) AS BIGINT) AS p_ppm
FROM counts
"""


def q_kg_property_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LODStats-style predicate QA profile [K] over the extracted graph:
    per predicate — triple count, subject/object cardinalities, max
    subject fan-out, functional-property violations. The report that
    tells a curator which predicates are functional and where
    extraction over-fires. Two-level hash agg + one distinct agg."""
    from ...operators.construct import predicate_profile
    return predicate_profile(
        q_kg_triples(spark, sf_dir).select("subj", "pred", "obj"))


def _sql_kg_property_stats() -> str:
    return f"""
WITH triples AS MATERIALIZED ({_sql_kg_triples_body()}),
per_subj AS (
  SELECT pred, subj, count(*) AS n, count(DISTINCT obj) AS n_obj_subj
  FROM triples GROUP BY 1, 2),
prof AS (
  SELECT pred, sum(n) AS n_triples, count(*) AS n_subj,
         max(n) AS max_fanout,
         sum(CASE WHEN n_obj_subj > 1 THEN 1 ELSE 0 END) AS nfv
  FROM per_subj GROUP BY 1),
nobj AS (
  SELECT pred, count(*) AS n_obj
  FROM (SELECT DISTINCT pred, obj FROM triples) GROUP BY 1)
SELECT p.pred, CAST(p.n_triples AS BIGINT) AS n_triples,
       CAST(p.n_subj AS BIGINT) AS n_subj,
       CAST(o.n_obj AS BIGINT) AS n_obj,
       CAST(p.max_fanout AS BIGINT) AS max_fanout,
       CAST(p.nfv AS BIGINT) AS n_functional_violations
FROM prof p JOIN nobj o ON o.pred = p.pred
"""


def q_kg_coref_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-based antecedent propagation (centering-theory baseline
    [K]) for the FOCUS concepts — the sparse multi-word compound terms
    of the gazetteer: a turn that does not explicitly name a compound
    concept inherits the conversation's most recently named one (topic
    carry-over — single-token references keep discussing the last
    explicitly-named compound). The coref layer's contribution to KG
    construction without an NLP model. Windows are PARTITIONED BY
    conv_id (conversation-bounded)."""
    from ...operators.construct import recency_antecedents
    focus = (_mentions_df(spark, sf_dir)
             .filter(F.col("surface").contains(" "))
             .select("conv_id", "turn_idx", "concept_id"))
    return recency_antecedents(derived_transcripts(spark, sf_dir), focus)


SQL_KG_COREF_LITE = f"""
WITH {_MENTIONS_CTE},
tc AS (
  SELECT conv_id, turn_idx, max(concept_id) AS turn_concept
  FROM mentions WHERE surface LIKE '% %' GROUP BY 1, 2),
spine AS (
  SELECT t.conv_id, t.turn_idx, tc.turn_concept
  FROM transcripts t LEFT JOIN tc USING (conv_id, turn_idx)),
w AS (
  SELECT conv_id, turn_idx, turn_concept,
         last_value(turn_concept IGNORE NULLS) OVER
           (PARTITION BY conv_id ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS antecedent_concept,
         last_value(CASE WHEN turn_concept IS NOT NULL THEN turn_idx END
                    IGNORE NULLS) OVER
           (PARTITION BY conv_id ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS antecedent_turn
  FROM spine)
SELECT conv_id, turn_idx, antecedent_concept,
       CAST(antecedent_turn AS BIGINT) AS antecedent_turn,
       CAST(turn_idx - antecedent_turn AS BIGINT) AS gap
FROM w WHERE turn_concept IS NULL AND antecedent_concept IS NOT NULL
"""


def q_kg_entity_salience(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation entity salience (turn coverage + earliness,
    exact-integer ppm) with a top-3 rank window PARTITIONED BY conv_id
    — the head-entity pick for summary nodes and indexing [K]."""
    from ...operators.construct import entity_salience
    return entity_salience(
        derived_transcripts(spark, sf_dir),
        _mentions_df(spark, sf_dir).select("conv_id", "turn_idx",
                                           "concept_id"))
