"""The driver ``queries()`` / ``oracle_sql()`` contract (SURVEY.md §2).

Each entry pairs a Spark implementation (DataFrame API for the KG
operators — exercising the same operator modules the production pipeline
uses — or shared ANSI SQL for the relational surface) with a DuckDB
oracle SQL string over the same parquet tables.

Conventions for hash-stable comparison:
- every computed column is aliased identically on both sides;
- every float is ``round(x, 6)``;
- timestamps are emitted as epoch microseconds
  (Spark ``unix_micros`` ≡ DuckDB ``epoch_us``);
- the ``transcripts`` input for KG queries is DERIVED deterministically
  from the ``documents`` table with engine-portable arithmetic (the
  BASELINE.json transcript shape synthesized at small scale — no
  external data).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import semantics as S
from ..operators.linking import canonicalize
from ..operators.wup import concept_similarity
from ..schemas import CONCEPT_SIMILARITY
from .driver_ontology import (driver_ancestors, driver_concepts,
                              driver_gazetteer, driver_scores, driver_wup,
                              values_sql)

# ---------------------------------------------------------------------------
# Derived transcripts (portable across Spark SQL and DuckDB)
# ---------------------------------------------------------------------------

N_CONVS = 50

TRANSCRIPTS_CTE = f"""
  SELECT 'conv-' || lpad(cast(cast(doc_id % {N_CONVS} AS INT) AS STRING), 4, '0') AS conv_id,
         cast(floor(doc_id / {N_CONVS}) AS INT) AS turn_idx,
         CASE cast(doc_id % 3 AS INT) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
         lower(text) AS text,
         CASE WHEN doc_id % 3 = 2 THEN 'tool' || cast(cast(doc_id % 8 AS INT) AS STRING) END AS tool
  FROM documents
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def derived_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        F.concat(F.lit("conv-"), F.lpad((F.col("doc_id") % N_CONVS).cast("int").cast("string"), 4, "0")).alias("conv_id"),
        F.floor(F.col("doc_id") / N_CONVS).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 3 == 0, "user")
         .when(F.col("doc_id") % 3 == 1, "assistant")
         .otherwise("tool").alias("role"),
        F.lower(F.col("text")).alias("text"),
        F.when(F.col("doc_id") % 3 == 2,
               F.concat(F.lit("tool"), (F.col("doc_id") % 8).cast("int").cast("string"))).alias("tool"),
    )


def _gaz_df(spark: SparkSession) -> DataFrame:
    gaz = driver_gazetteer()
    return spark.createDataFrame(
        sorted(gaz.items()), "surface string, concept_id string")


def _scores_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        driver_scores(), "surface string, concept_id string, cos_sim double")


def _wup_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(driver_wup(), schema=CONCEPT_SIMILARITY)


def _gaz_values() -> str:
    import pandas as pd
    gaz = driver_gazetteer()
    pdf = pd.DataFrame(sorted(gaz.items()), columns=["surface", "concept_id"])
    return values_sql(pdf, "g")


# containment mention semantics (SQL-checkable variant of P4, SURVEY.md §2A):
# a gazetteer phrase is mentioned in a turn iff it appears as a
# whitespace-delimited token run.
def _mentions_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = derived_transcripts(spark, sf_dir)
    gaz = _gaz_df(spark)
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    return (
        t.join(F.broadcast(gaz),
               padded.contains(F.concat(F.lit(" "), gaz.surface, F.lit(" "))),
               "inner")
        .select("conv_id", "turn_idx", "surface", "concept_id")
    )


_MENTIONS_CTE = f"""
transcripts AS ({TRANSCRIPTS_CTE}),
mentions AS (
  SELECT t.conv_id, t.turn_idx, g.surface, g.concept_id
  FROM transcripts t JOIN {_gaz_values()} ON
    (' ' || t.text || ' ') LIKE ('% ' || g.surface || ' %')
)
"""


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

    from ..operators.triples import infer_broader_triples, mention_triples
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
    from .driver_ontology import driver_ancestors
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


SEARCH_QUERY = "fast hash join on a big table"


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


def _onto_versions_pdf():
    """Two deterministic ontology versions for the diff pairing: v2
    removes the last leaf, adds one, relabels dq:L00 and re-parents
    dq:L01 — every diff status class fires."""
    import pandas as pd
    base = [(c.concept_id, c.pref_label, c.parent_id)
            for c in driver_concepts()]
    cols = ["concept_id", "pref_label", "parent_id"]
    v1 = pd.DataFrame(base, columns=cols)
    rows = [r for r in base if r[0] != "dq:L32"]
    v2 = []
    for cid, label, parent in rows:
        if cid == "dq:L00":
            label = "hash join v2"
        if cid == "dq:L01":
            parent = "dq:B3"
        v2.append((cid, label, parent))
    v2.append(("dq:L99", "vector scan", "dq:B2"))
    return v1, pd.DataFrame(v2, columns=cols)


def q_kg_ontology_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Taxonomy evolution diff (sources/rdf.py ontology_diff) between
    two deterministic ontology versions — the ops companion of the
    pipeline's ontology content fingerprint (the fingerprint says a
    checkpoint is stale; the diff says why). Corpus-independent like
    kg_ontology_ingest."""
    from ..sources.rdf import ontology_diff
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


def _branch_map_pdf():
    """(concept_id, branch) — each concept's depth-2 ancestor (itself if
    it IS a branch); the root maps to nothing. Shared by the Spark
    broadcast side and the DuckDB VALUES replay."""
    import pandas as pd
    return pd.DataFrame(
        [(c.concept_id, c.path[1]) for c in driver_concepts()
         if len(c.path) >= 2],
        columns=["concept_id", "branch"])


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


BATCH_SEARCH_QUERIES = [
    "fast hash join on a big table",
    "sort merge join for the slow scan",
    "window agg over key value column",
]


def _batch_query_vectors():
    """(query_id, concept_id, q_score) for the fixed query batch — a
    pure function of ontology + query strings, computed once
    driver-side (|queries| x top-k rows: tiny, broadcastable)."""
    import pandas as pd
    scores = driver_scores()
    gaz = driver_gazetteer()
    rows = []
    for qid, qtext in enumerate(BATCH_SEARCH_QUERIES):
        norm = S.normalize_text(qtext)
        surfaces = sorted({m[0] for m in S.find_mentions(norm, gaz)})
        q = (scores[scores.surface.isin(surfaces)]
             .groupby("concept_id", as_index=False)["cos_sim"].max()
             .rename(columns={"cos_sim": "q_score"}).round({"q_score": 6}))
        rows.extend((qid, r.concept_id, float(r.q_score))
                    for r in q.itertuples(index=False))
    return pd.DataFrame(rows, columns=["query_id", "concept_id", "q_score"])


def q_kg_nt_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDF graph-materialize parity (r4): the corpus triple graph
    rendered as N-Triples lines (sources/rdf.py:format_ntriples — the
    write twin of the paired Turtle/N-Triples ingest). The reference
    dumps its rdflib graph the same way [K]; here it's a map-only
    expression over the triple table, and the oracle replays the IRI
    percent-encoding + literal escaping character-for-character."""
    from ..sources.rdf import format_ntriples
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


HH_PHI_INV = 100  # heavy hitter = token holding >= 1% of all tokens:
# the synthetic vocabulary has 30 tokens near 3.3% and one ('dup') at
# ~0.1%, so the threshold genuinely separates at every sf. (The MG
# counter budget 2*phi_inv exceeds this corpus's 31 distinct tokens;
# the real decrement machinery is exercised by the 502-key pytest.)


def q_rel_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact bounded-memory heavy hitters over the documents token
    stream (operators/skew.py:heavy_hitters — per-partition Misra-Gries
    candidates + exact recount). The RESULT is exact (integer
    cross-multiplied threshold), so it pairs even though the candidate
    superset is partitioning-dependent."""
    from ..operators.skew import heavy_hitters
    toks = (_docs(spark, sf_dir)
            .select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
            .filter(F.col("tok") != ""))
    return heavy_hitters(toks, "tok", HH_PHI_INV)


SQL_REL_HEAVY_HITTERS = f"""
WITH toks AS (
  SELECT t.tok
  FROM documents, unnest(string_split(text, ' ')) AS t(tok)
  WHERE t.tok <> ''
),
tot AS (SELECT count(*) AS n FROM toks)
SELECT tok, count(*) AS freq
FROM toks, tot
GROUP BY tok, tot.n
HAVING count(*) * {HH_PHI_INV} >= tot.n
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


def _manual_raw_df(spark: SparkSession) -> DataFrame:
    from .driver_ontology import driver_manual_tags
    m = driver_manual_tags()
    return spark.createDataFrame(
        m, "conv_id string, concept_id string, weight double").select(
        F.concat(F.lit("conv:"), F.col("conv_id")).alias("subj_key"),
        "concept_id", "weight")


def _onto_ids_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(c.concept_id,) for c in driver_concepts()], "concept_id string")


def _merged_tags_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.manual import ingest_manual_tags, merge_tag_sources
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
    from .driver_ontology import driver_manual_tags
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
    from ..operators.cds import propagate_cds
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
    from ..operators.cds import propagate_cds
    from ..operators.manual import tag_graph
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
    from .search import blend_query_scores
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

def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        _tbl(spark, sf_dir, n).createOrReplaceTempView(n)


SQL_REL_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-06-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_rel_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem")
    return spark.sql(SQL_REL_PRICING)


SQL_REL_NATION_REVENUE = """
SELECT n.n_name AS nation, r.r_name AS region,
       count(DISTINCT o.o_orderkey) AS n_orders,
       round(sum(o.o_totalprice), 2) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
"""


def q_rel_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "customer", "nation", "region")
    return spark.sql(SQL_REL_NATION_REVENUE)


SQL_REL_SEMI_ANTI = """
SELECT c.c_mktsegment AS segment,
       CAST(sum(CASE WHEN o.has_order THEN 1 ELSE 0 END) AS BIGINT) AS with_orders,
       CAST(sum(CASE WHEN o.has_order THEN 0 ELSE 1 END) AS BIGINT) AS without_orders
FROM customer c
LEFT JOIN (SELECT DISTINCT o_custkey, true AS has_order FROM orders) o
  ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
"""


def q_rel_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DataFrame path: real left_semi / left_anti joins (SURVEY.md §2B),
    # result reconciled to the portable SQL shape above.
    c = _tbl(spark, sf_dir, "customer")
    o = _tbl(spark, sf_dir, "orders").select(F.col("o_custkey")).distinct()
    semi = (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
            .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("with_orders")))
    anti = (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("without_orders")))
    return (c.select("c_mktsegment").distinct()
            .join(semi, "c_mktsegment", "left").join(anti, "c_mktsegment", "left")
            .select(F.col("c_mktsegment").alias("segment"),
                    F.coalesce("with_orders", F.lit(0)).alias("with_orders"),
                    F.coalesce("without_orders", F.lit(0)).alias("without_orders")))


SQL_REL_WINDOW_TOPK = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
) WHERE rk <= 3
"""


def q_rel_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(SQL_REL_WINDOW_TOPK)


SQL_REL_ROLLUP = """
SELECT coalesce(l_returnflag, '<all>') AS returnflag,
       coalesce(l_linestatus, '<all>') AS linestatus,
       grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid,
       count(*) AS n, round(sum(l_quantity), 2) AS qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_rel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem")
    return spark.sql(SQL_REL_ROLLUP)


SQL_REL_SETOPS = """
SELECT src, cnt FROM (
  SELECT 'both' AS src, count(*) AS cnt FROM (
    SELECT p_brand FROM part WHERE p_size > 25
    INTERSECT
    SELECT p_brand FROM part WHERE p_retailprice > 1500
  )
  UNION ALL
  SELECT 'only_large' AS src, count(*) AS cnt FROM (
    SELECT p_brand FROM part WHERE p_size > 25
    EXCEPT
    SELECT p_brand FROM part WHERE p_retailprice > 1500
  )
  UNION ALL
  SELECT 'all_brands' AS src, count(*) AS cnt FROM (
    SELECT DISTINCT p_brand FROM part
  )
)
"""


def q_rel_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "part")
    return spark.sql(SQL_REL_SETOPS)


SQL_REL_STRINGS = """
SELECT p_brand,
       count(*) AS n,
       min(length(p_name)) AS min_name_len,
       max(upper(substring(p_type, 1, 5))) AS max_type_prefix,
       min(levenshtein(p_brand, 'Brand#11')) AS lev_to_b11,
       max(concat_ws('|', p_brand, cast(p_size AS STRING))) AS max_concat
FROM part
GROUP BY p_brand
"""


def q_rel_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "part")
    return spark.sql(SQL_REL_STRINGS)


def q_rel_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _tbl(spark, sf_dir, "orders")
    return (o.groupBy(F.unix_micros(F.date_trunc("month", "o_orderdate")).alias("month_us"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue"),
                 F.count_distinct("o_custkey").alias("n_customers")))


SQL_REL_MONTHLY_ORDERS = """
SELECT epoch_us(date_trunc('month', o_orderdate)) AS month_us,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue,
       count(DISTINCT o_custkey) AS n_customers
FROM orders GROUP BY 1
"""


def q_rel_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _tbl(spark, sf_dir, "events")
    return (e.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("k"), 6).alias("avg_k"),
                 F.max("k").alias("max_k"),
                 F.round(F.sum("value"), 4).alias("sum_value")))


SQL_REL_JSON = """
SELECT event_type,
       count(*) AS n,
       round(avg(cast(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k,
       max(cast(json_extract_string(props, '$.k') AS INT)) AS max_k,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY event_type
"""


def q_rel_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native session_window (batch mode) vs DuckDB gaps-and-islands."""
    e = _tbl(spark, sf_dir, "events")
    return (e.groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("session_value"))
            .select("user_id",
                    F.unix_micros(F.col("w.start").cast("timestamp")).alias("session_start_us"),
                    "n_events", "session_value"))


SQL_REL_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, epoch_us(min(ts)) AS session_start_us,
       count(*) AS n_events, round(sum(value), 4) AS session_value
FROM sessions GROUP BY user_id, session_id
"""


# 200k day buckets = a 547-year calendar span, a hard physical bound on
# the carry table's cardinality (it is keyed by distinct DAYS, not rows —
# 10^12 rows still yield only span-many buckets).
ASOF_MAX_BUCKETS = 200_000


def q_rel_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY.md §2B): for each event, the latest order ts at
    or before it — no native as-of in Spark SQL, so: deterministic
    day-bucketed two-pass union+window (VERDICT r4 item 2 replaced the
    sampled repartitionByRange + eager localCheckpoint pin + pid
    collect: range identity now comes from `datediff(ts, epoch)` — a
    pure calendar column function (no unix conversion: the input is
    TIMESTAMP_NTZ and must stay timezone-free) — so the carry pass and
    the window pass agree
    on partition identity BY CONSTRUCTION — nothing to pin, nothing to
    collect, zero extra materialization of the input).

    Shape at scale: unionByName -> running last(o_ts) window partitioned
    by epoch-day bucket (equal ts never straddles a bucket boundary, and
    each day runs as an independent parallel task). Cross-bucket carry:
    per-bucket max(o_ts) is one tiny hash agg (≤ calendar-span rows —
    the explicit .limit(ASOF_MAX_BUCKETS) states that invariant in the
    plan itself, which also lets the repo-wide plan gate PROVE the
    prefix-max window's input bounded), prefix-maxed over bucket order
    with an exclusive frame, broadcast back; coalesce(local_last,
    carry_ts) is exact because buckets are ts-ordered."""
    e = _tbl(spark, sf_dir, "events").select(
        "event_id", "ts", F.lit(1).alias("is_event"),
        F.lit(None).cast("timestamp").alias("o_ts"))
    o = _tbl(spark, sf_dir, "orders").select(
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderdate").alias("ts"), F.lit(0).alias("is_event"),
        F.col("o_orderdate").alias("o_ts"))
    u = (e.unionByName(o)
         .withColumn("bkt", F.datediff(
             F.to_date("ts"), F.to_date(F.lit("1970-01-01")))
             .cast("long")))
    # carry[b] = max o_ts over all buckets strictly before b
    per = (u.groupBy("bkt").agg(F.max("o_ts").alias("bkt_max"))
           .limit(ASOF_MAX_BUCKETS))
    wc = (Window.orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1))
    carry = per.select(
        "bkt", F.max("bkt_max").over(wc).alias("carry_ts"))
    w = (Window.partitionBy("bkt").orderBy("ts", "is_event")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (u
            .withColumn("local_last",
                        F.last("o_ts", ignorenulls=True).over(w))
            .filter(F.col("is_event") == 1)
            .join(F.broadcast(carry), "bkt")
            .select("event_id",
                    F.unix_micros(F.coalesce("local_last", "carry_ts"))
                    .alias("asof_order_us")))


SQL_REL_ASOF = """
SELECT e.event_id,
       epoch_us((SELECT max(o.o_orderdate) FROM orders o
                 WHERE o.o_orderdate <= e.ts)) AS asof_order_us
FROM events e
"""


# ---------------------------------------------------------------------------
# Training-data pipeline operators over documents / embeddings
# ---------------------------------------------------------------------------

SQL_DEDUP_EXACT = """
SELECT md5(text) AS text_hash, count(*) AS n_copies,
       min(doc_id) AS canonical_doc
FROM documents GROUP BY md5(text)
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return (d.groupBy(F.md5("text").alias("text_hash"))
            .agg(F.count(F.lit(1)).alias("n_copies"),
                 F.min("doc_id").alias("canonical_doc")))


JACCARD_THRESHOLD = 0.84
JACCARD_MAX_DOC = 500  # bounded pair set: the testdata vocabulary is only
# ~31 tokens, so nearly every doc pair shares tokens and the posting-list
# self-join is quadratic in practice here. Cap the doc subset (portable in
# both engines); the unbounded scale path is dedup_minhash_lsh, whose LSH
# bucketing prunes candidates instead.


JACCARD_DF_CAP = 450  # stop-token prune for candidate generation: the
# synthetic 31-token vocabulary maxes out near df=415 on the capped doc
# subset, so 450 is inert HERE (results identical to the uncapped join)
# while the plan carries the scale-correct shape — candidates from
# sub-cap tokens only, jaccard verified over ALL tokens. At web scale
# set the cap to the hot-key budget (e.g. 1e5). Skew bound pinned in
# tests/test_datapipeline_ops.py.


def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard near-dup pairs (SURVEY: n-gram Jaccard dedup,
    operators/dedup.py:jaccard_near_dup_pairs). Inverted-index join on
    shared sub-cap tokens (hot-token hygiene), exact verify on
    candidates — never a full cross join."""
    from ..operators.dedup import jaccard_near_dup_pairs
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < JACCARD_MAX_DOC)
    return jaccard_near_dup_pairs(d, JACCARD_THRESHOLD,
                                  df_cap=JACCARD_DF_CAP)


SQL_DEDUP_JACCARD = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, t.tok
  FROM documents, unnest(string_split(text, ' ')) AS t(tok)
  WHERE t.tok <> '' AND doc_id < {JACCARD_MAX_DOC}
),
sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
rare AS (
  SELECT tok FROM toks GROUP BY tok HAVING count(*) <= {JACCARD_DF_CAP}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM (SELECT t.* FROM toks t JOIN rare r ON r.tok = t.tok) a
  JOIN (SELECT t.* FROM toks t JOIN rare r ON r.tok = t.tok) b
    ON a.tok = b.tok AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN toks a ON a.doc_id = c.doc_a
  JOIN toks b ON b.doc_id = c.doc_b AND b.tok = a.tok
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       round(cast(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE round(cast(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) >= {JACCARD_THRESHOLD}
"""

def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact TF-IDF top-3 terms per document (operators/curation.py) —
    relevance scoring for corpus curation."""
    from ..operators.curation import tfidf_top_terms
    return tfidf_top_terms(_docs(spark, sf_dir), k=3)


SQL_TEXT_TFIDF = """
WITH toks AS (
  SELECT doc_id, t.tok
  FROM documents, unnest(string_split(text, ' ')) AS t(tok)
  WHERE t.tok <> ''
),
tf AS (SELECT doc_id, tok, count(*) AS tf_raw FROM toks GROUP BY doc_id, tok),
dlen AS (SELECT doc_id, count(*) AS dlen FROM toks GROUP BY doc_id),
dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok,
         round((cast(tf.tf_raw AS DOUBLE) / dlen.dlen)
               * ln(cast(n.n_docs AS DOUBLE) / dfreq.df), 6) AS tfidf
  FROM tf JOIN dlen USING (doc_id) JOIN dfreq USING (tok) CROSS JOIN n
)
SELECT doc_id, tok, tfidf, rk FROM (
  SELECT doc_id, tok, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, tok ASC) AS rk
  FROM scored) WHERE rk <= 3
"""

SAMPLE_PER_STRATUM = 20


def q_curation_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: md5-ranked top-20 per lang
    (operators/curation.py — seedless, engine-portable, unlike
    rand(seed) whose stream is engine/partitioning-specific)."""
    from ..operators.curation import stratified_sample
    return stratified_sample(_docs(spark, sf_dir), "lang",
                             k=SAMPLE_PER_STRATUM)


SQL_CURATION_SAMPLE = f"""
SELECT doc_id, stratum, rk FROM (
  SELECT doc_id, lang AS stratum,
         row_number() OVER (PARTITION BY lang
             ORDER BY md5(cast(doc_id AS VARCHAR) || ':' || coalesce(text, '')),
                      doc_id ASC) AS rk
  FROM documents) WHERE rk <= {SAMPLE_PER_STRATUM}
"""


def q_curation_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware curation decision per document: exact-dup clusters
    keep min doc_id; each near-dup (Jaccard) pair drops its
    shorter/larger-id member (operators/curation.py keep_best)."""
    from ..operators.curation import keep_best
    docs = _docs(spark, sf_dir)
    return keep_best(docs, q_dedup_jaccard(spark, sf_dir))


def _sql_curation_keep_best() -> str:
    return f"""
WITH d AS (SELECT doc_id, md5(text) AS h, n_chars FROM documents),
canon AS (SELECT h, min(doc_id) AS canonical FROM d GROUP BY h),
pairs AS ({SQL_DEDUP_JACCARD}),
near_losers AS (
  SELECT DISTINCT CASE WHEN a.n_chars < b.n_chars THEN p.doc_a
                       WHEN b.n_chars < a.n_chars THEN p.doc_b
                       ELSE greatest(p.doc_a, p.doc_b) END AS doc_id
  FROM pairs p
  JOIN d a ON a.doc_id = p.doc_a
  JOIN d b ON b.doc_id = p.doc_b
),
exact_losers AS (
  SELECT d.doc_id FROM d JOIN canon ON canon.h = d.h
  WHERE d.doc_id != canon.canonical
)
SELECT d.doc_id,
       CASE WHEN e.doc_id IS NOT NULL THEN 'drop_exact'
            WHEN nl.doc_id IS NOT NULL THEN 'drop_near'
            ELSE 'keep' END AS status
FROM d
LEFT JOIN (SELECT DISTINCT doc_id FROM exact_losers) e ON e.doc_id = d.doc_id
LEFT JOIN near_losers nl ON nl.doc_id = d.doc_id
"""


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


_MEDIA_CTE = """
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image/png'
              WHEN doc_id % 3 = 1 THEN 'audio/wav'
              ELSE 'video/mp4' END AS media_type,
         strlen(text) AS n_bytes
  FROM documents
"""


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary media columns (operators/multimodal) —
    paired since r2: the synthetic media attachment and the relational
    frame explode are deterministic arithmetic, so DuckDB replays them
    exactly (only the byte-DECODING inside a frame stays behind the
    documented stub seam)."""
    from ..operators.multimodal import attach_fake_media, frame_sample
    return frame_sample(attach_fake_media(_docs(spark, sf_dir)), every_n=40)


SQL_MULTIMODAL_FRAMES = f"""
WITH media AS ({_MEDIA_CTE})
SELECT doc_id, media_type, f.frame_idx,
       doc_id || ':' || cast(f.frame_idx AS VARCHAR) AS frame_key
FROM media, unnest(generate_series(0,
     greatest(cast(floor(n_bytes / 40) AS INT) - 1, 0))) AS f(frame_idx)
"""


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas media decode (operators/multimodal.py) — paired
    since r2: the deterministic fake decode is md5 arithmetic, so the
    oracle replays it digit-by-digit (hex decode → byte values →
    width/height mod; features = byte/255 CAST AS FLOAT so DuckDB
    reproduces the float32 rounding — verified identical for all 256
    byte values before pairing). A REAL codec stays behind the stub
    seam and would return this query to rows-only."""
    from ..operators.multimodal import attach_fake_media, decode_media
    decoded = decode_media(attach_fake_media(_docs(spark, sf_dir)))
    return decoded.select(
        "doc_id", "media_type", "n_bytes", "width", "height",
        F.concat_ws(
            ",", F.transform("features", lambda x: F.format_string("%.6f", x))
        ).alias("features_csv"))


def _sql_multimodal_decode() -> str:
    digits = ", ".join(
        f"instr('0123456789abcdef', substring(h, {p + 1}, 1)) - 1 AS d{p}"
        for p in range(16))
    feats = ", ".join(
        f"printf('%.6f', CAST((16 * d{2 * i} + d{2 * i + 1}) / 255.0 AS FLOAT))"
        for i in range(8))
    return f"""
WITH hx AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image/png'
              WHEN doc_id % 3 = 1 THEN 'audio/wav'
              ELSE 'video/mp4' END AS media_type,
         strlen(text) AS n_bytes,
         md5(text) AS h
  FROM documents
),
d AS (SELECT doc_id, media_type, n_bytes, {digits} FROM hx)
SELECT doc_id, media_type, n_bytes,
       16 + (16 * d0 + d1) % 64 AS width,
       16 + (16 * d2 + d3) % 64 AS height,
       concat_ws(',', {feats}) AS features_csv
FROM d
"""


def q_multimodal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata rollup over the media table: per-type counts and
    exact byte-size stats — the catalog view a media-curation pipeline
    maintains; pure relational over the binary column's metadata."""
    from ..operators.multimodal import attach_fake_media
    m = attach_fake_media(_docs(spark, sf_dir))
    return (m.groupBy(F.col("meta.media_type").alias("media_type"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg(F.col("meta.n_bytes")), 6).alias("avg_bytes"),
                 F.round(F.percentile(F.col("meta.n_bytes"), F.lit(0.5)), 6)
                 .alias("median_bytes")))


SQL_MULTIMODAL_STATS = f"""
WITH media AS ({_MEDIA_CTE})
SELECT media_type, count(*) AS n,
       round(avg(n_bytes), 6) AS avg_bytes,
       round(quantile_cont(n_bytes, 0.5), 6) AS median_bytes
FROM media GROUP BY media_type
"""


_STOPWORDS = "('a', 'the', 'of', 'and', 'to', 'in', 'is')"


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    stop_list = F.array(*[F.lit(w) for w in
                          ["a", "the", "of", "and", "to", "in", "is"]])
    return d.select(
        "doc_id", "lang",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("ttr"),
        F.round(
            F.size(F.filter(toks, lambda t: F.array_contains(stop_list, t)))
            / F.size(toks), 6).alias("stopword_ratio"),
        F.round(F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
                / F.size(toks), 6).alias("avg_tok_len"),
        F.length("text").alias("n_chars"),
    )


SQL_TEXT_QUALITY = f"""
WITH toks AS (
  SELECT doc_id, lang, text, t.tok
  FROM documents, unnest(string_split(text, ' ')) AS t(tok)
  WHERE t.tok <> ''
)
SELECT doc_id, any_value(lang) AS lang,
       count(*) AS n_tokens,
       count(DISTINCT tok) AS n_distinct,
       round(cast(count(DISTINCT tok) AS DOUBLE) / count(*), 6) AS ttr,
       round(cast(sum(CASE WHEN tok IN {_STOPWORDS} THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS stopword_ratio,
       round(cast(sum(length(tok)) AS DOUBLE) / count(*), 6) AS avg_tok_len,
       any_value(length(text)) AS n_chars
FROM toks GROUP BY doc_id
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of the sorted distinct-token set — an
    order-insensitive content fingerprint (bag-of-words dedup key)."""
    d = _docs(spark, sf_dir)
    toks = F.array_sort(F.array_distinct(
        F.filter(F.split(F.col("text"), " "), lambda t: t != "")))
    return d.select(
        "doc_id",
        F.md5(F.col("text")).alias("exact_fp"),
        F.md5(F.array_join(toks, " ")).alias("bow_fp"),
    )


SQL_TEXT_FINGERPRINT = """
WITH toks AS (
  SELECT doc_id, list_sort(list_distinct(list_filter(
           string_split(text, ' '), x -> x <> ''))) AS tl
  FROM documents
)
SELECT d.doc_id, md5(d.text) AS exact_fp,
       md5(array_to_string(t.tl, ' ')) AS bow_fp
FROM documents d JOIN toks t ON d.doc_id = t.doc_id
"""


N_QUERY_VECS = 5
SIM_TOP_K = 5


def q_sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k with pure higher-order functions
    (JVM-side — SURVEY §2B array fns; the scale path is the LSH variant)."""
    e = _tbl(spark, sf_dir, "embeddings")
    dbl = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    q = (e.filter(F.col("vec_id") < N_QUERY_VECS)
         .select(F.col("vec_id").alias("qid"), dbl("embedding").alias("qv")))
    c = (e.filter(F.col("vec_id") >= N_QUERY_VECS)
         .select(F.col("vec_id").alias("cid"), dbl("embedding").alias("cv")))
    dot = F.aggregate(F.zip_with("qv", "cv", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    norm = lambda col: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(F.col(col), lambda x: x * x), F.lit(0.0), lambda a, v: a + v))
    sim = (q.crossJoin(F.broadcast(c))
           .withColumn("cos", F.round(dot / (norm("qv") * norm("cv")), 6)))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (sim.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= SIM_TOP_K)
            .select("qid", "cid", "cos", "rk"))


SQL_SIM_TOPK = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERY_VECS}),
c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id >= {N_QUERY_VECS}),
pairs AS (
  SELECT q.qid, c.cid,
         round(
           (SELECT sum(cast(x AS DOUBLE) * cast(y AS DOUBLE))
            FROM (SELECT unnest(q.qv) AS x, unnest(c.cv) AS y))
           / (sqrt((SELECT sum(cast(x AS DOUBLE) * cast(x AS DOUBLE)) FROM (SELECT unnest(q.qv) AS x)))
              * sqrt((SELECT sum(cast(y AS DOUBLE) * cast(y AS DOUBLE)) FROM (SELECT unnest(c.cv) AS y)))),
           6) AS cos
  FROM q CROSS JOIN c
)
SELECT qid, cid, cos, rk FROM (
  SELECT qid, cid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rk
  FROM pairs
) WHERE rk <= {SIM_TOP_K}
"""

ANN_N_PLANES = 4
ANN_K = 5
IVF_N_CELLS = 16
IVF_N_PROBE = 4


def _sql_vec_lit(vec) -> str:
    return "[" + ",".join(repr(float(x)) for x in vec) + "]"


def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN. Paired: the hyperplanes are deterministic
    hash-derived constants, so DuckDB recomputes the identical sign
    buckets via list_dot_product with the plane vectors as literals
    (decision margins are ~1e-4, far above float noise)."""
    from ..operators.simsearch import ann_lsh_topk
    e = _tbl(spark, sf_dir, "embeddings")
    q = (e.filter(F.col("vec_id") < N_QUERY_VECS)
         .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")))
    c = (e.filter(F.col("vec_id") >= N_QUERY_VECS)
         .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")))
    return ann_lsh_topk(q, c, k=ANN_K, n_planes=ANN_N_PLANES)


def _sql_sim_ann_lsh() -> str:
    from ..operators.simsearch import hyperplanes
    planes = hyperplanes(ANN_N_PLANES, 64)

    def bucket(col: str) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product({col}, {_sql_vec_lit(p)}) >= 0"
            f" THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes))

    return f"""
WITH q AS (SELECT vec_id AS qid, cast(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < {N_QUERY_VECS}),
c AS (SELECT vec_id AS cid, cast(embedding AS DOUBLE[]) AS cv
      FROM embeddings WHERE vec_id >= {N_QUERY_VECS}),
qb AS (SELECT qid, qv, {bucket('qv')} AS bucket FROM q),
cb AS (SELECT cid, cv, {bucket('cv')} AS bucket FROM c),
pairs AS (
  SELECT qb.qid, cb.cid,
         round(list_cosine_similarity(qb.qv, cb.cv), 6) AS cos
  FROM qb JOIN cb USING (bucket)
)
SELECT qid, cid, cos, rk FROM (
  SELECT qid, cid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rk
  FROM pairs
) WHERE rk <= {ANN_K}
"""


def q_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN. Paired: centroids are deterministic constants;
    cell assignment (argmax dot, first-wins ties) and n_probe cell
    selection (stable argsort) replay in SQL as rank-over-unpivoted
    dot products with index tie-break."""
    from ..operators.simsearch import ann_ivf_topk
    e = _tbl(spark, sf_dir, "embeddings")
    q = (e.filter(F.col("vec_id") < N_QUERY_VECS)
         .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")))
    c = (e.filter(F.col("vec_id") >= N_QUERY_VECS)
         .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")))
    return ann_ivf_topk(q, c, k=ANN_K, n_cells=IVF_N_CELLS,
                        n_probe=IVF_N_PROBE)


def _sql_sim_ann_ivf(k: int = ANN_K) -> str:
    from ..operators.simsearch import ivf_centroids
    C = ivf_centroids(IVF_N_CELLS, 64)
    cent_rows = ",\n    ".join(
        f"({i}, {_sql_vec_lit(C[i])}::DOUBLE[])" for i in range(IVF_N_CELLS))
    return f"""
WITH cent(cell, cvec) AS (
  VALUES
    {cent_rows}
),
q AS (SELECT vec_id AS qid, cast(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < {N_QUERY_VECS}),
c AS (SELECT vec_id AS cid, cast(embedding AS DOUBLE[]) AS cv
      FROM embeddings WHERE vec_id >= {N_QUERY_VECS}),
cc AS (
  SELECT cid, cv, cell,
         row_number() OVER (PARTITION BY cid
             ORDER BY list_dot_product(cv, cvec) DESC, cell ASC) AS rnk
  FROM c CROSS JOIN cent
),
cassign AS (SELECT cid, cv, cell FROM cc WHERE rnk = 1),
qc AS (
  SELECT qid, qv, cell,
         row_number() OVER (PARTITION BY qid
             ORDER BY list_dot_product(qv, cvec) DESC, cell ASC) AS rnk
  FROM q CROSS JOIN cent
),
qprobe AS (SELECT qid, qv, cell FROM qc WHERE rnk <= {IVF_N_PROBE}),
pairs AS (
  SELECT p.qid, a.cid,
         round(list_cosine_similarity(p.qv, a.cv), 6) AS cos
  FROM qprobe p JOIN cassign a USING (cell)
)
SELECT qid, cid, cos, rk FROM (
  SELECT qid, cid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rk
  FROM pairs
) WHERE rk <= {k}
"""


EMB_DEDUP_THRESHOLD = 0.38


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (task addendum): exact all-pairs
    cosine >= threshold via the distributed grid self-join (n_blocks
    forced so the scale path — not the small-N broadcast shortcut — is
    what the oracle verifies). See operators/simsearch.py."""
    from ..operators.simsearch import embedding_near_dup_pairs
    e = _tbl(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(e, threshold=EMB_DEDUP_THRESHOLD,
                                    n_blocks=8)


SQL_DEDUP_EMBEDDING = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(cast(a.embedding AS DOUBLE[]),
                                    cast(b.embedding AS DOUBLE[])), 6) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(cast(a.embedding AS DOUBLE[]),
                                   cast(b.embedding AS DOUBLE[])), 6)
      >= {EMB_DEDUP_THRESHOLD}
"""


def q_text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (ws split + BPE-ish regex pandas_udf) — the UDF
    path is value-hash-pinned against the DuckDB regex oracle."""
    from ..operators.textstats import token_counts
    return token_counts(_docs(spark, sf_dir)).select(
        "doc_id", "ws_tokens", "bpe_ish_tokens")


SQL_TEXT_TOKEN_COUNTS = r"""
SELECT doc_id,
  len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS ws_tokens,
  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_ish_tokens
FROM documents
"""


def q_rel_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (DataFrame.unpivot / melt): per-returnflag
    aggregate metrics unpivoted to (l_returnflag, metric, value)."""
    li = _tbl(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"))
    return wide.unpivot(["l_returnflag"],
                        ["sum_qty", "sum_price", "avg_disc"],
                        "metric", "value")


SQL_REL_UNPIVOT = """
WITH wide AS (
  SELECT l_returnflag,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_price,
         round(avg(l_discount), 6) AS avg_disc
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
UNION ALL
SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM wide
UNION ALL
SELECT l_returnflag, 'avg_disc' AS metric, avg_disc AS value FROM wide
"""


SQL_REL_PERCENTILES = """
SELECT l_returnflag,
  round(median(l_quantity), 6) AS med_qty,
  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
  round(quantile_cont(l_extendedprice, 0.25), 6) AS q1_price,
  round(quantile_cont(l_discount, 0.75), 6) AS q3_disc
FROM lineitem GROUP BY l_returnflag
"""


def q_rel_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles / median (SURVEY §2B aggregations).
    Spark's exact `percentile` matches DuckDB's `quantile_cont` (linear
    interpolation); at 10^12 rows you'd switch to `approx_percentile`
    (t-digest, one pass, mergeable) — paired here via the exact form."""
    li = _tbl(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("med_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("q1_price"),
        F.round(F.expr("percentile(l_discount, 0.75)"), 6).alias("q3_disc")))


# One SQL string serves BOTH engines (Spark temp views + DuckDB views):
# scalar subquery (avg benchmark), correlated EXISTS, uncorrelated IN —
# Catalyst decorrelates these into joins (SURVEY §4 "subquery
# decorrelation: free").
SQL_REL_SUBQUERIES = """
WITH tot AS (
  SELECT o_custkey, sum(o_totalprice) AS total
  FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey, round(t.total, 2) AS total_spend
FROM customer c JOIN tot t ON c.c_custkey = t.o_custkey
WHERE t.total > (SELECT 1.5 * avg(total) FROM tot)
  AND EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
  AND c.c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey < 3)
"""


def q_rel_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "customer", "nation")
    return spark.sql(SQL_REL_SUBQUERIES)


MINHASH_THRESHOLD = 0.5


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup (shingle → 64 min-hashes → 16 bands →
    bucket join → exact Jaccard verify). Uses the engine-portable md5
    hash flavor so DuckDB replays the identical signature math; the
    production default is the faster xxhash64 flavor (same layout,
    covered by pytest)."""
    from ..operators.dedup import minhash_dedup_pairs
    return minhash_dedup_pairs(_docs(spark, sf_dir),
                               threshold=MINHASH_THRESHOLD, portable=True)


def _sql_minhash_prefix(k: int = 3, n_hashes: int = 64, n_bands: int = 16,
                        max_doc: int | None = None) -> str:
    """Shared CTE body: documents → shingles → portable md5 signature →
    LSH bands → candidate pairs (``cand``) + shingle table (``sh``).
    Replays operators/dedup.py minhash_signatures(portable=True) /
    lsh_candidate_pairs digit-by-digit. ``max_doc`` bounds the corpus
    (the audit sample); None = all documents (the LSH pair query)."""
    from .. import semantics as S
    rpb = n_hashes // n_bands
    mersenne = (1 << 31) - 1
    where = f"WHERE doc_id < {max_doc}" if max_doc is not None else ""
    digits = ", ".join(
        f"strpos('0123456789abcdef', substr(h, {p + 1}, 1)) - 1 AS d{p}"
        for p in range(16))
    x1 = " + ".join(f"d{p} * {16 ** (7 - p)}" for p in range(8))
    x2 = " + ".join(f"d{p} * {16 ** (15 - p)}" for p in range(8, 16))
    mins = []
    for i in range(n_hashes):
        a = S.stable_hash("minhash-a", i, mod=1 << 16) | 1
        b = S.stable_hash("minhash-b", i, mod=1 << 16) | 1
        c = S.stable_hash("minhash-c", i, mod=mersenne)
        mins.append(f"min((x1 * {a} + x2 * {b} + {c}) % {mersenne}) AS h{i}")
    band_selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5("
        + " || ',' || ".join(f"CAST(h{b * rpb + j} AS VARCHAR)"
                             for j in range(rpb))
        + ") AS band_hash FROM sig"
        for b in range(n_bands))
    return f"""tokd AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM documents {where}
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i + 1:i + {k}], ' ') AS shingle
  FROM tokd, unnest(range(0, greatest(len(toks) - {k}, 0) + 1)) AS r(i)
),
hd AS (SELECT doc_id, {digits} FROM (SELECT doc_id, md5(shingle) AS h FROM sh)),
hx AS (SELECT doc_id, {x1} AS x1, {x2} AS x2 FROM hd),
sig AS (SELECT doc_id, {', '.join(mins)} FROM hx GROUP BY doc_id),
bands AS (
  {band_selects}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
)"""


def _sql_dedup_minhash(threshold: float = MINHASH_THRESHOLD, k: int = 3,
                       n_hashes: int = 64, n_bands: int = 16) -> str:
    prefix = _sql_minhash_prefix(k=k, n_hashes=n_hashes, n_bands=n_bands)
    return f"""
WITH {prefix},
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       round(cast(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE round(cast(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) >= {threshold}
"""


SIMHASH_MAX_HAMMING = 16


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup via the engine-portable md5-bit flavor (four
    16-bit chunks; candidates share a chunk, hamming <= threshold). The
    xxhash64 packed-long flavor is the prod default (pytest-covered)."""
    from ..operators.dedup import (simhash_chunks_portable,
                                   simhash_near_pairs_chunks)
    return simhash_near_pairs_chunks(
        simhash_chunks_portable(_docs(spark, sf_dir)),
        max_hamming=SIMHASH_MAX_HAMMING)


def _sql_dedup_simhash(max_hamming: int = SIMHASH_MAX_HAMMING) -> str:
    digits = ", ".join(
        f"strpos('0123456789abcdef', substr(h, {p + 1}, 1)) - 1 AS d{p}"
        for p in range(16))
    votes = ",\n    ".join(
        f"sum(CASE WHEN (d{b // 4} >> {b % 4}) & 1 = 1"
        f" THEN 1 ELSE -1 END) AS b{b}"
        for b in range(64))
    chunk_exprs = ", ".join(
        "(" + " + ".join(f"CASE WHEN b{i * 16 + j} > 0 THEN {1 << j} ELSE 0 END"
                         for j in range(16)) + f")::INT AS c{i}"
        for i in range(4))
    band_selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, {i} AS chunk_idx, c{i} AS chunk, c0, c1, c2, c3 FROM chunks"
        for i in range(4))
    ham = " + ".join(f"bit_count(xor(a{i}, b{i}))" for i in range(4))
    return f"""
WITH tokd AS (
  SELECT doc_id, t.tok
  FROM documents,
       unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS t(tok)
),
hx AS (SELECT doc_id, md5(tok) AS h FROM tokd),
hd AS (SELECT doc_id, {digits} FROM hx),
votes AS (
  SELECT doc_id,
    {votes}
  FROM hd GROUP BY doc_id
),
chunks AS (SELECT doc_id, {chunk_exprs} FROM votes),
bands AS (
  {band_selects}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.c0 AS a0, a.c1 AS a1, a.c2 AS a2, a.c3 AS a3,
         b.c0 AS b0, b.c1 AS b1, b.c2 AS b2, b.c3 AS b3
  FROM bands a JOIN bands b
    ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, ({ham})::INT AS hamming
FROM cand WHERE ({ham}) <= {max_hamming}
"""


def q_text_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling-hash) fingerprints — the numpy-vectorized
    pandas UDF, hash-pinned against a DuckDB oracle that replays the
    full scheme (HUGEINT Rabin-Karp mod 2^64, window-of-w minimum with
    rightmost tie-break, short-document single window)."""
    from ..operators.textstats import winnow_fingerprints
    return winnow_fingerprints(_docs(spark, sf_dir))


def _sql_text_winnow() -> str:
    from ..operators.textstats import _WINNOW_BASE, WINNOW_K, WINNOW_W
    B, K, W = int(_WINNOW_BASE), WINNOW_K, WINNOW_W
    M = 1 << 64
    h = "unicode(substr(t, i+1, 1))::HUGEINT"
    for j in range(1, K):
        h = f"(({h}) * {B} + unicode(substr(t, i+1+{j}, 1))) % {M}::HUGEINT"
    return f"""
WITH base AS (SELECT doc_id, lower(coalesce(text, '')) AS t FROM documents),
kgram AS (
  SELECT doc_id, r.i AS i, ({h}) AS h
  FROM base, lateral unnest(range(0, greatest(length(t) - {K} + 1, 0))) AS r(i)
  WHERE length(t) >= {K}
),
stats AS (SELECT doc_id, count(*) AS n_h FROM kgram GROUP BY doc_id),
starts AS (
  SELECT k.doc_id, k.i AS s
  FROM kgram k JOIN stats st USING (doc_id)
  WHERE k.i <= greatest(st.n_h - {W}, 0)
),
winners AS (
  SELECT s.doc_id AS doc_id, s.s, max(k.i) AS pos
  FROM starts s
  JOIN kgram k ON k.doc_id = s.doc_id AND k.i BETWEEN s.s AND s.s + {W - 1}
  JOIN (
    SELECT s2.doc_id AS doc_id, s2.s AS s, min(k2.h) AS wmin
    FROM starts s2 JOIN kgram k2
      ON k2.doc_id = s2.doc_id AND k2.i BETWEEN s2.s AND s2.s + {W - 1}
    GROUP BY s2.doc_id, s2.s
  ) m ON m.doc_id = s.doc_id AND m.s = s.s AND k.h = m.wmin
  GROUP BY s.doc_id, s.s
)
SELECT DISTINCT w.doc_id AS doc_id, w.pos AS pos, (k.h // 2)::BIGINT AS fp
FROM winners w JOIN kgram k ON k.doc_id = w.doc_id AND k.i = w.pos
"""


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID: the Spark side is the vectorized bigram-profile
    pandas UDF (operators/textstats.py); the oracle re-derives the same
    scores in pure SQL (replace-based non-overlapping bigram counts ==
    the UDF's regex counts — both count greedily left-to-right), pinning
    the UDF batch math to 6 decimals."""
    from ..operators.textstats import language_id
    return language_id(_docs(spark, sf_dir)).select(
        "doc_id", "lang", "pred_lang", "lang_score")


def _sql_text_langid() -> str:
    from ..operators.textstats import _PROFILES
    langs = list(_PROFILES)  # tie-break order == UDF argmax first-wins

    def count_expr(bg: str) -> str:
        return f"(length(t) - length(replace(t, '{bg}', ''))) / 2"

    score_cols = ", ".join(
        "(" + " + ".join(count_expr(bg) for bg in prof)
        + f") / greatest(length(t) - 1, 1) AS sc_{lang}"
        for lang, prof in _PROFILES.items())
    best = "greatest(" + ", ".join(f"sc_{lg}" for lg in langs) + ")"
    pred_cases = " ".join(
        "WHEN " + " AND ".join(f"sc_{lg} >= sc_{other}"
                               for other in langs[i + 1:])
        + f" THEN '{lg}'"
        for i, lg in enumerate(langs[:-1]))
    return f"""
WITH base AS (SELECT doc_id, lang, lower(coalesce(text, '')) AS t FROM documents),
scored AS (SELECT doc_id, lang, {score_cols} FROM base)
SELECT doc_id, lang,
  CASE WHEN {best} <= 0 THEN 'und' {pred_cases} ELSE '{langs[-1]}' END AS pred_lang,
  round({best}, 6) AS lang_score
FROM scored
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
    from ..operators.mentions import detect_mentions_exploded
    t = derived_transcripts(spark, sf_dir)
    m = detect_mentions_exploded(t, driver_gazetteer(), norm_col="text")
    return (m.groupBy("conv_id", "turn_idx", "surface")
            .agg(F.count(F.lit(1)).alias("n")))


def _sql_kg_mentions_regex() -> str:
    from .. import semantics as S
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


def _fast_onto_pdf():
    """Ontology frame for the fast-pipeline query (same construction as
    the production fixtures: driver concepts + hash embeddings)."""
    import pandas as pd
    concepts = list(driver_concepts())
    return pd.DataFrame({
        "concept_id": [c.concept_id for c in concepts],
        "pref_label": [c.pref_label for c in concepts],
        "alt_labels": [list(c.alt_labels) for c in concepts],
        "parent_id": [c.parent_id for c in concepts],
        "depth": [c.depth for c in concepts],
        "path": [list(c.path) for c in concepts],
        "embedding": [
            [float(x) for x in S.phrase_vector(S.normalize_text(c.pref_label))]
            for c in concepts],
    })


def q_kg_fast_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRUE production hot path END-TO-END (normalize → fused regex
    mention UDF → broadcast precomputed canonical → 3-rule union → one
    dedup shuffle), oracle-paired since r2: the DuckDB oracle replays
    mentions with the RE2 alternation (see kg_mentions_regex) and joins
    the SAME precomputed canonical table as literals — the exact
    surface→(concept, link_score) function build_triples_fast
    broadcasts. What a 100 TB run executes is what gets value-checked."""
    from .pipeline import build_triples_fast
    t = derived_transcripts(spark, sf_dir).withColumn(
        "ts", F.lit(None).cast("timestamp"))
    return build_triples_fast(spark, t, ontology_pdf=_fast_onto_pdf())


def _fast_canon_pdf():
    """The precomputed surface→canonical table build_triples_fast uses,
    recomputed with the same driver-side functions for the oracle."""
    import pandas as pd

    from ..operators.linking import surface_canonical_table
    concepts = list(driver_concepts())
    gaz = S.build_gazetteer(concepts)
    wup_pdf = pd.DataFrame(
        [(a.concept_id, b.concept_id, S.wup_similarity(a, b))
         for a in concepts for b in concepts],
        columns=["concept_a", "concept_b", "wup"])
    return surface_canonical_table(_fast_onto_pdf(), gaz, wup_pdf)


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


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-dup pair graph (iterative
    min-label propagation, operators/dedup.py) — the cluster view that
    turns pairwise dedup verdicts into canonical groups. Oracle:
    DuckDB recursive-CTE transitive closure + min label."""
    from ..operators.dedup import connected_components
    pairs = q_dedup_jaccard(spark, sf_dir)
    nodes = (_docs(spark, sf_dir)
             .filter(F.col("doc_id") < JACCARD_MAX_DOC).select("doc_id"))
    return connected_components(pairs, nodes)


def _sql_dedup_components() -> str:
    return f"""
WITH RECURSIVE pairs AS ({SQL_DEDUP_JACCARD}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
nodes AS (SELECT doc_id FROM documents WHERE doc_id < {JACCARD_MAX_DOC}),
reach(a, b) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
)
SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a
"""


def q_rel_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 two-phase salted aggregation, driver-paired: the oracle is
    the plain single-phase GROUP BY — salting must be result-invariant
    (partial by (key, salt), merge by key; counts merge by summing)."""
    from ..operators.skew import salted_agg
    o = _tbl(spark, sf_dir, "orders")
    out = salted_agg(o, ["o_orderstatus"], {
        "n_orders": ("count", "o_orderkey"),
        "max_price": ("max", "o_totalprice"),
        "sum_price": ("sum", "o_totalprice"),
    }, n_salt=16)
    return out.select(
        F.col("o_orderstatus").alias("status"), "n_orders",
        F.round("max_price", 2).alias("max_price"),
        F.round("sum_price", 2).alias("sum_price"))


SQL_REL_SALTED_AGG = """
SELECT o_orderstatus AS status,
       count(o_orderkey) AS n_orders,
       round(max(o_totalprice), 2) AS max_price,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders GROUP BY o_orderstatus
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
SQL_REL_STATS_AGG = """
SELECT l_returnflag AS flag,
       round(corr(l_discount, l_tax), 6) + 0.0 AS corr_disc_tax,
       round(covar_samp(l_discount, l_tax), 6) + 0.0 AS covar_disc_tax,
       round(stddev_samp(l_discount), 6) + 0.0 AS sd_disc,
       round(var_samp(l_tax), 6) + 0.0 AS var_tax,
       round(regr_slope(l_discount, l_tax), 6) + 0.0 AS slope,
       round(regr_intercept(l_discount, l_tax), 6) + 0.0 AS intercept,
       round(regr_r2(l_discount, l_tax), 6) + 0.0 AS r2
FROM lineitem GROUP BY l_returnflag
"""


def q_rel_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (correlation, sample covariance/stddev/
    variance, linear-regression slope/intercept/R²) — shared SQL, both
    engines implement the textbook definitions."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(SQL_REL_STATS_AGG)


SQL_REL_GROUPING_SETS = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       grouping(o_orderstatus) AS g_status,
       grouping(o_orderpriority) AS g_prio,
       count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def q_rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube specialize)
    with grouping() indicators — shared SQL in both dialects."""
    _views(spark, sf_dir, "orders")
    return spark.sql(SQL_REL_GROUPING_SETS)


SQL_REL_LATERAL = """
SELECT c.c_custkey, t.o_orderkey AS top_order,
       round(t.o_totalprice, 2) AS top_price
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
         WHERE o.o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1) t
WHERE c.c_custkey < 100
"""


def q_rel_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL derived table (top order per customer) —
    Catalyst decorrelates it into a ranked join; the bounded customer
    subset keeps the query small while exercising the operator. At
    scale the equivalent per-group top-k is the window-rank pattern
    (rel_window_topk), which this must agree with semantically."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(SQL_REL_LATERAL)


# The windowed sum runs over integer cents: double sums over sliding
# windows associate differently per engine (Spark running-accumulate vs
# DuckDB segment tree), which flipped 6dp rounding on ~0.01% of rows at
# sf0.1. Integer addition is associative, so the window math is exact
# and sum/avg derive from one stable quantity.
SQL_REL_RANGE_FRAME = """
SELECT event_id,
       count(*) OVER w AS n_last_hour,
       round(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w
             / CAST(100 AS DOUBLE), 2) AS sum_last_hour,
       round(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w
             / (CAST(100 AS DOUBLE) * count(*) OVER w), 6) AS avg_last_hour
FROM events
WINDOW w AS (PARTITION BY date_trunc('day', ts) ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


def q_rel_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE window frame (trailing 1 hour per event) —
    the window-frame flavor rel_window_analytics doesn't cover. Day
    partitioning keeps the sort partition-local at scale (the trailing
    window truncates at day boundaries by design — a scale-sane
    convention; the exact cross-boundary variant is rel_range_join)."""
    _views(spark, sf_dir, "events")
    return spark.sql(SQL_REL_RANGE_FRAME)


def q_text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID quality evaluation: confusion counts of predicted vs
    the corpus truth column — the model-eval rollup a curation pipeline
    runs after any classifier stage."""
    pred = q_text_langid(spark, sf_dir)
    return (pred.groupBy(F.col("lang").alias("truth"), "pred_lang")
            .agg(F.count(F.lit(1)).alias("n")))


def _sql_text_langid_eval() -> str:
    return f"""
WITH pred AS ({_sql_text_langid()})
SELECT lang AS truth, pred_lang, count(*) AS n
FROM pred GROUP BY lang, pred_lang
"""


# ---------------------------------------------------------------------------
# RDF/Turtle (SKOS) ontology ingestion — the reference's first-class
# ontology input (rdflib .ttl load [K]; VERDICT r2 "What's missing #1"),
# re-expressed as a Spark text scan + regexp_extract parse. The DuckDB
# oracle replays the EXACT parse (same RE2-safe regex constants, same
# forward-fill/termination semantics) over the same fixture file, then
# derives depth/path with a recursive CTE vs Spark's level-wise joins.
# ---------------------------------------------------------------------------

def q_kg_ontology_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turtle(SKOS) → ontology_concepts: sources/rdf.py parse_turtle +
    skos_concepts over the committed fixture .ttl (input is the file,
    not sf_dir — ontology ingest is corpus-independent). Arrays emitted
    as joined strings for hash portability."""
    from ..sources.rdf import FIXTURE_TTL, parse_turtle, skos_concepts
    c = skos_concepts(parse_turtle(spark, FIXTURE_TTL))
    return c.select(
        "concept_id", "pref_label",
        F.concat_ws("+", "alt_labels").alias("alt_labels"),
        "parent_id", "depth",
        F.concat_ws("/", "path").alias("path"))


def _sql_kg_ontology_ingest() -> str:
    from ..sources.rdf import (FIXTURE_TTL, RDF_TYPE, RX_CONT, RX_LITERAL,
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

    from .pipeline import run_pipeline
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

def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization of the events table (30-min gap
    session_window, streaming/sessions.py semantics): maxFilesPerTrigger
    forces multiple micro-batches so session state genuinely merges
    across triggers; complete-mode foreachBatch overwrites the result
    table each trigger (no watermark needed, nothing dropped — the
    availableNow drain ends with the exact batch answer)."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    sfx = f"{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}"
    out = _os.path.join(_tempfile.gettempdir(), f"stream_sess_{sfx}.parquet")
    ckpt = _os.path.join(_tempfile.gettempdir(), f"stream_sess_{sfx}_ckpt")
    src = _os.path.join(_tempfile.gettempdir(), f"stream_sess_{sfx}_src")
    for d in (out, ckpt, src):
        _shutil.rmtree(d, ignore_errors=True)
    # stage the single-file testdata table as a 4-file directory: the
    # file stream source requires a directory, and 4 files ×
    # maxFilesPerTrigger=1 forces 4 micro-batches, so session state
    # genuinely merges across triggers
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.repartition(4).write.parquet(src)
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src))
    sess = (stream
            .groupBy(F.session_window("ts", "30 minutes").alias("w"),
                     F.col("user_id"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("ts").alias("first_ts"),
                 F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
                 .alias("cents")))

    def _write(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out)

    q = (sess.writeStream.outputMode("complete").foreachBatch(_write)
         .trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination()
    spark.catalog.refreshByPath(out)
    return (spark.read.parquet(out).select(
        "user_id",
        F.unix_micros(F.col("first_ts").cast("timestamp"))
        .alias("session_start_us"),
        "n_events",
        F.round(F.col("cents") / 100.0, 4).alias("session_value")))


SQL_STREAM_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, ts, CAST(round(value * 100, 0) AS BIGINT) AS cents,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts, cents,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, epoch_us(min(ts)) AS session_start_us,
       count(*) AS n_events, round(sum(cents) / 100.0, 4) AS session_value
FROM sessions GROUP BY user_id, session_id
"""


def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (streaming/joins.py):
    signup events joined to purchase events of the same user within
    1 hour, both streams watermarked 2 hours. The events table is
    staged as 4 contiguous time-range files replayed oldest-first
    (stage_time_ordered), so nothing is ever behind the watermark and
    the drained append-mode result equals the batch interval join the
    DuckDB oracle runs — while join state is genuinely created in one
    micro-batch and matched in later ones."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from ..streaming.joins import run_interval_join, stage_time_ordered
    sfx = f"{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}"
    base = _os.path.join(_tempfile.gettempdir(), f"stream_join_{sfx}")
    out, ckpt, src = base + "_out", base + "_ckpt", base + "_src"
    for d in (out, ckpt, src):
        _shutil.rmtree(d, ignore_errors=True)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    stage_time_ordered(events, src, "ts", n_files=4)
    res = run_interval_join(
        spark, src, events.schema,
        left_filter="event_type = 'signup'",
        right_filter="event_type = 'purchase'",
        key="user_id", out=out, ckpt=ckpt,
        window="1 hour", delay="2 hours")
    return res.select(
        F.col("l_user_id").alias("user_id"),
        F.unix_micros(F.col("l_ts").cast("timestamp")).alias("signup_ts_us"),
        F.unix_micros(F.col("r_ts").cast("timestamp")).alias("purchase_ts_us"),
        F.round("value", 6).alias("purchase_value"))


SQL_STREAM_JOIN = """
SELECT a.user_id,
       epoch_us(a.ts) AS signup_ts_us,
       epoch_us(b.ts) AS purchase_ts_us,
       round(b.value, 6) AS purchase_value
FROM events a JOIN events b ON a.user_id = b.user_id
WHERE a.event_type = 'signup' AND b.event_type = 'purchase'
  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
"""


# ---------------------------------------------------------------------------
# File-based DCAT catalog ingest (VERDICT r2 "What's missing #2" — the
# reference's CKAN dataset/ module at the file level). The DuckDB
# oracle replays the ingest with read_json over the same fixture.
# ---------------------------------------------------------------------------

def q_kg_dcat_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DCAT-JSONL dump → catalog table (sources/dcat.py, explicit
    schema, line-parallel). Arrays emitted joined for hash
    portability; issued as epoch micros."""
    from ..sources.dcat import FIXTURE_DCAT, read_dcat_jsonl
    c = read_dcat_jsonl(spark, FIXTURE_DCAT)
    return c.select(
        "dataset_id", "title", "description",
        F.concat_ws("+", "keywords").alias("keywords"),
        "publisher",
        F.unix_micros(F.col("issued")).alias("issued_us"),
        F.concat_ws("+", "formats").alias("formats"),
        "n_distributions")


def _sql_kg_dcat_ingest() -> str:
    from ..sources.dcat import FIXTURE_DCAT
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

def q_text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass (operators/textstats.redact_pii — JVM regexes,
    map-only). The testdata vocabulary contains no PII, so each doc
    gets deterministic synthetic contact strings appended (id-derived —
    no external data, per the north rule) before redaction; the oracle
    synthesizes identically and replays the same RE2 patterns."""
    from ..operators.textstats import redact_pii
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"),
            F.col("doc_id").cast("string"), F.lit("@example.com or +1 555 0"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("00 see https://example.org/d/"),
            F.col("doc_id").cast("string")).alias("text"))
    return redact_pii(d).select("doc_id", "redacted",
                                "n_emails", "n_urls", "n_phones")


def _sql_text_redact() -> str:
    from ..operators.textstats import RX_EMAIL, RX_PHONE, RX_URL
    return f"""
WITH base AS (
  SELECT doc_id,
         text || ' contact user' || cast(doc_id AS VARCHAR)
              || '@example.com or +1 555 0'
              || lpad(cast(doc_id % 1000 AS VARCHAR), 3, '0')
              || '00 see https://example.org/d/' || cast(doc_id AS VARCHAR)
         AS text
  FROM documents),
e AS (SELECT doc_id, text,
             CAST(len(regexp_extract_all(text, '{RX_EMAIL}')) AS INT) AS n_emails,
             regexp_replace(text, '{RX_EMAIL}', '<EMAIL>', 'g') AS t1
      FROM base),
u AS (SELECT doc_id, n_emails,
             CAST(len(regexp_extract_all(t1, '{RX_URL}')) AS INT) AS n_urls,
             regexp_replace(t1, '{RX_URL}', '<URL>', 'g') AS t2
      FROM e)
SELECT doc_id,
       regexp_replace(t2, '{RX_PHONE}', '<PHONE>', 'g') AS redacted,
       n_emails, n_urls,
       CAST(len(regexp_extract_all(t2, '{RX_PHONE}')) AS INT) AS n_phones
FROM u
"""


def q_sim_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8-quantized brute-force top-k (operators/simsearch.py
    quantize_embeddings + quantized_topk): integer dot products are
    exact, so the ranking is fully deterministic — the 4x-smaller
    shard format ANN sweeps ship at scale."""
    from ..operators.simsearch import quantize_embeddings, quantized_topk
    e = _tbl(spark, sf_dir, "embeddings")
    qz = quantize_embeddings(e)
    q = (qz.filter(F.col("vec_id") < N_QUERY_VECS)
         .select(F.col("vec_id").alias("qid"), F.col("qvec").alias("qv")))
    c = (qz.filter(F.col("vec_id") >= N_QUERY_VECS)
         .select(F.col("vec_id").alias("cid"), F.col("qvec").alias("cv")))
    return quantized_topk(q, c, k=SIM_TOP_K)


MAXSIM_TOKENS = 4          # 64-dim vectors -> 4 token slices of width 16


def q_sim_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-vector late-interaction top-k (operators/simsearch.py
    token_slices + maxsim_topk): each int8-quantized vector is split
    into MAXSIM_TOKENS contiguous token slices and relevance is the
    ColBERT-style MaxSim — sum over query tokens of max over candidate
    tokens of the integer dot product. The whole score is one nested
    JVM higher-order-function expression over a broadcast candidate
    shortlist (the re-rank stage of a retrieval stack), so ranking is
    exact-integer deterministic on any engine."""
    from ..operators.simsearch import quantize_embeddings, token_slices
    from ..operators.simsearch import maxsim_topk
    qz = token_slices(quantize_embeddings(_tbl(spark, sf_dir, "embeddings")),
                      n_tokens=MAXSIM_TOKENS)
    q = (qz.filter(F.col("vec_id") < N_QUERY_VECS)
         .select(F.col("vec_id").alias("qid"), "toks"))
    c = (qz.filter(F.col("vec_id") >= N_QUERY_VECS)
         .select(F.col("vec_id").alias("cid"), "toks"))
    return maxsim_topk(q, c, k=SIM_TOP_K)


SQL_SIM_MAXSIM_TOPK_TMPL = """
WITH q8 AS (
  SELECT vec_id,
         CASE WHEN ma = 0 THEN list_transform(d, x -> 0)
              ELSE list_transform(d, x -> CAST(round(x * 127.0 / ma, 0) AS INT))
         END AS qvec
  FROM (SELECT vec_id, d,
               list_max(list_transform(d, x -> abs(x))) AS ma
        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS d
              FROM embeddings))),
sim AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         CAST(list_sum(list_transform(range(0, {t}), t ->
           list_max(list_transform(range(0, {t}), s ->
             list_dot_product(
               CAST(list_slice(q.qvec, t*{w} + 1, (t+1)*{w}) AS DOUBLE[]),
               CAST(list_slice(c.qvec, s*{w} + 1, (s+1)*{w}) AS DOUBLE[]))))))
              AS BIGINT) AS maxsim
  FROM q8 q, q8 c
  WHERE q.vec_id < {n_query} AND c.vec_id >= {n_query})
SELECT qid, cid, maxsim, rk FROM (
  SELECT qid, cid, maxsim,
         row_number() OVER (PARTITION BY qid
                            ORDER BY maxsim DESC, cid ASC) AS rk
  FROM sim) WHERE rk <= {k}
"""


SQL_SIM_QUANTIZED_TOPK_TMPL = """
WITH q8 AS (
  SELECT vec_id,
         CASE WHEN ma = 0 THEN list_transform(d, x -> 0)
              ELSE list_transform(d, x -> CAST(round(x * 127.0 / ma, 0) AS INT))
         END AS qvec
  FROM (SELECT vec_id, d,
               list_max(list_transform(d, x -> abs(x))) AS ma
        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS d
              FROM embeddings))),
sim AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         CAST(list_dot_product(CAST(q.qvec AS DOUBLE[]),
                               CAST(c.qvec AS DOUBLE[])) AS BIGINT) AS qdot
  FROM q8 q, q8 c
  WHERE q.vec_id < {n_query} AND c.vec_id >= {n_query})
SELECT qid, cid, qdot, rk FROM (
  SELECT qid, cid, qdot,
         row_number() OVER (PARTITION BY qid
                            ORDER BY qdot DESC, cid ASC) AS rk
  FROM sim) WHERE rk <= {k}
"""


PACK_BUDGET = 512


def q_curation_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (operators/curation.pack_sequences,
    concat-and-chunk): per-bin packing stats over the documents table,
    sharded by source."""
    from ..operators.curation import pack_sequences
    packed = pack_sequences(_docs(spark, sf_dir), budget=PACK_BUDGET)
    return (packed.groupBy("shard", "bin")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc")))


SQL_CURATION_PACK = f"""
WITH toks AS (
  SELECT doc_id, source AS shard,
         len(list_filter(string_split(coalesce(text, ''), ' '),
                         t -> t <> '')) AS n_tokens
  FROM documents),
binned AS (
  SELECT doc_id, shard, n_tokens,
         CAST(floor(coalesce(sum(n_tokens) OVER (
             PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             / {PACK_BUDGET}) AS INT) AS bin
  FROM toks)
SELECT shard, bin, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM binned GROUP BY shard, bin
"""


CONTAM_N = 8
CONTAM_PROBE_MOD = 7


def q_text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination (operators/curation.ngram_contamination):
    flag corpus docs sharing any 8-token n-gram with the probe subset
    (doc_id % 7 == 0 — a deterministic eval-set stand-in sized so the
    corpus' dup structure produces non-trivial matches: 9 flagged docs
    at sf0.01)."""
    from ..operators.curation import ngram_contamination
    d = _docs(spark, sf_dir)
    probes = d.filter(F.col("doc_id") % CONTAM_PROBE_MOD == 0)
    corpus = d.filter(F.col("doc_id") % CONTAM_PROBE_MOD != 0)
    return ngram_contamination(corpus, probes, n=CONTAM_N)


SQL_TEXT_CONTAMINATION = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(coalesce(text, ''), ' '),
                     t -> t <> '') AS tk
  FROM documents),
grams AS (
  SELECT doc_id,
         md5(array_to_string(tk[i:i + {CONTAM_N} - 1], ' ')) AS gram
  FROM (SELECT doc_id, tk,
               unnest(range(1, greatest(len(tk) - {CONTAM_N} + 2, 1))) AS i
        FROM toks)),
pg AS (SELECT DISTINCT gram FROM grams WHERE doc_id % {CONTAM_PROBE_MOD} = 0)
SELECT g.doc_id, count(DISTINCT g.gram) AS n_grams_matched
FROM grams g JOIN pg ON pg.gram = g.gram
WHERE g.doc_id % {CONTAM_PROBE_MOD} <> 0
GROUP BY g.doc_id
"""


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality metrics
    (operators/textstats.repetition_stats): unique-token / top-bigram /
    duplicated-trigram fractions per document."""
    from ..operators.textstats import repetition_stats
    return repetition_stats(_docs(spark, sf_dir))


SQL_TEXT_REPETITION = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(coalesce(text, ''), ' '),
                     t -> t <> '') AS tk
  FROM documents),
grams AS (
  SELECT doc_id, n, array_to_string(tk[i:i + n - 1], ' ') AS gram
  FROM (SELECT doc_id, tk, n,
               unnest(range(1, greatest(len(tk) - n + 2, 1))) AS i
        FROM toks, (SELECT unnest([1, 2, 3]) AS n))),
counts AS (
  SELECT doc_id, n, gram, count(*) AS c
  FROM grams GROUP BY doc_id, n, gram),
agg AS (
  SELECT doc_id,
         CAST(sum(c) FILTER (WHERE n = 1) AS BIGINT) AS n_tokens,
         count(*) FILTER (WHERE n = 1) AS n_uniq,
         max(c) FILTER (WHERE n = 2) AS top2,
         CAST(sum(c) FILTER (WHERE n = 2) AS BIGINT) AS tot2,
         CAST(coalesce(sum(c) FILTER (WHERE n = 3 AND c >= 2), 0)
              AS BIGINT) AS dup3,
         CAST(sum(c) FILTER (WHERE n = 3) AS BIGINT) AS tot3
  FROM counts GROUP BY doc_id)
SELECT doc_id, n_tokens,
       round(CAST(n_uniq AS DOUBLE)
             / CAST(nullif(n_tokens, 0) AS DOUBLE), 6) + 0.0
           AS uniq_token_frac,
       round(CAST(top2 AS DOUBLE)
             / CAST(nullif(tot2, 0) AS DOUBLE), 6) + 0.0
           AS top_bigram_frac,
       round(CAST(dup3 AS DOUBLE)
             / CAST(nullif(tot3, 0) AS DOUBLE), 6) + 0.0
           AS dup_trigram_frac
FROM agg
"""


SPAN_N = 8


def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-lite repeated-span coverage
    (operators/dedup.repeated_span_coverage): per-doc fraction of token
    positions covered by an 8-gram occurring >= 2 times in the
    corpus."""
    from ..operators.dedup import repeated_span_coverage
    return repeated_span_coverage(_docs(spark, sf_dir), n=SPAN_N)


SQL_DEDUP_SPANS = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(coalesce(text, ''), ' '),
                     t -> t <> '') AS tk
  FROM documents),
grams AS (
  SELECT doc_id, len(tk) AS n_tokens, i,
         md5(array_to_string(tk[i:i + {SPAN_N} - 1], ' ')) AS gram
  FROM (SELECT doc_id, tk,
               unnest(range(1, greatest(len(tk) - {SPAN_N} + 2, 1))) AS i
        FROM toks)),
shared AS (
  SELECT doc_id, n_tokens, i
  FROM grams
  QUALIFY count(*) OVER (PARTITION BY gram) >= 2),
spans AS (
  SELECT doc_id, n_tokens,
         least({SPAN_N},
               coalesce(lead(i) OVER (PARTITION BY doc_id ORDER BY i),
                        i + {SPAN_N}) - i) AS cov
  FROM shared)
SELECT doc_id, n_tokens, count(*) AS n_repeated_spans,
       CAST(sum(cov) AS BIGINT) AS covered_tokens,
       round(CAST(sum(cov) AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) + 0.0
           AS coverage_frac
FROM spans GROUP BY doc_id, n_tokens
"""


MIXTURE_TARGET = 120
MIXTURE_SCALE = 1_000_000


def q_curation_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.5) domain-mixture sampling over the
    lang column (operators/curation.mixture_sample): per-domain quotas
    proportional to sqrt(count), exact integer quota math, md5-rank row
    selection."""
    from ..operators.curation import mixture_sample
    return mixture_sample(_docs(spark, sf_dir), "lang",
                          target=MIXTURE_TARGET,
                          weight_scale=MIXTURE_SCALE)


SQL_CURATION_MIXTURE = f"""
WITH c AS (SELECT lang AS domain, count(*) AS cnt FROM documents
           GROUP BY lang),
w AS (SELECT domain,
             CAST(floor(sqrt(CAST(cnt AS DOUBLE)) * {MIXTURE_SCALE})
                  AS BIGINT) AS w
      FROM c),
q AS (SELECT domain,
             CAST(({MIXTURE_TARGET} * w)
                  // (SELECT CAST(sum(w) AS BIGINT) FROM w)
                  AS BIGINT) AS quota
      FROM w),
r AS (SELECT doc_id, lang AS domain,
             row_number() OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR) || ':'
                              || coalesce(text, '')),
                          doc_id ASC) AS rnk
      FROM documents)
SELECT r.domain, r.doc_id, r.rnk, q.quota
FROM r JOIN q ON q.domain = r.domain
WHERE r.rnk <= q.quota
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

def build_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kg_transcripts": q_kg_transcripts,
        "kg_turn_assembly": q_kg_turn_assembly,
        "kg_mentions": q_kg_mentions,
        "kg_candidates": q_kg_candidates,
        "kg_canonical": q_kg_canonical,
        "kg_triples": q_kg_triples,
        "kg_cds": q_kg_cds,
        "kg_wup_matrix": q_kg_wup_matrix,
        "kg_search": q_kg_search,
        "rel_pricing": q_rel_pricing,
        "rel_nation_revenue": q_rel_nation_revenue,
        "rel_semi_anti": q_rel_semi_anti,
        "rel_window_topk": q_rel_window_topk,
        "rel_rollup": q_rel_rollup,
        "rel_setops": q_rel_setops,
        "rel_strings": q_rel_strings,
        "rel_monthly_orders": q_rel_monthly_orders,
        "rel_json": q_rel_json,
        "rel_sessionize": q_rel_sessionize,
        "rel_asof_join": q_rel_asof_join,
        "dedup_exact": q_dedup_exact,
        "dedup_jaccard": q_dedup_jaccard,
        "text_quality": q_text_quality,
        "text_fingerprint": q_text_fingerprint,
        "sim_topk_cosine": q_sim_topk_cosine,
        "dedup_embedding": q_dedup_embedding,
        "kg_manual_merge": q_kg_manual_merge,
        "kg_manual_cds": q_kg_manual_cds,
        "kg_config_cds": q_kg_config_cds,
        "kg_config_search": q_kg_config_search,
        "kg_search_wup": q_kg_search_wup,
        "kg_two_hop": q_kg_two_hop,
        "kg_inferred_triples": q_kg_inferred_triples,
        "kg_construct_query": q_kg_construct_query,
        "kg_search_closure": q_kg_search_closure,
        "kg_branch_rollup": q_kg_branch_rollup,
        "kg_ontology_diff": q_kg_ontology_diff,
        "kg_validate": q_kg_validate,
        "text_langid_eval": q_text_langid_eval,
        "kg_ontology_ingest": q_kg_ontology_ingest,
        "kg_resume_manifest": q_kg_resume_manifest,
        "stream_sessionize": q_stream_sessionize,
        "stream_join": q_stream_join,
        "kg_dcat_ingest": q_kg_dcat_ingest,
        "text_redact": q_text_redact,
        "sim_quantized_topk": q_sim_quantized_topk,
        "sim_maxsim_topk": q_sim_maxsim_topk,
        "curation_pack": q_curation_pack,
        "text_contamination": q_text_contamination,
        "text_repetition": q_text_repetition,
        "dedup_spans": q_dedup_spans,
        "curation_mixture": q_curation_mixture,
        "rel_range_frame": q_rel_range_frame,
        "rel_grouping_sets": q_rel_grouping_sets,
        "rel_lateral": q_rel_lateral,
        "rel_stats_agg": q_rel_stats_agg,
        "rel_salted_agg": q_rel_salted_agg,
        "kg_materialize": q_kg_materialize,
        "kg_mentions_regex": q_kg_mentions_regex,
        "multimodal_frames": q_multimodal_frames,
        "multimodal_decode": q_multimodal_decode,
        "multimodal_stats": q_multimodal_stats,
        "kg_fast_pipeline": q_kg_fast_pipeline,
        "dedup_components": q_dedup_components,
        "text_tfidf": q_text_tfidf,
        "curation_sample": q_curation_sample,
        "curation_keep_best": q_curation_keep_best,
        "text_token_counts": q_text_token_counts,
        "text_langid": q_text_langid,
        "text_winnow": q_text_winnow,
        "dedup_minhash_lsh": q_dedup_minhash,
        "dedup_simhash": q_dedup_simhash,
        "sim_ann_lsh": q_sim_ann_lsh,
        "sim_ann_ivf": q_sim_ann_ivf,
        "rel_percentiles": q_rel_percentiles,
        "rel_subqueries": q_rel_subqueries,
        "rel_unpivot": q_rel_unpivot,
        "rel_pivot": q_rel_pivot,
        "rel_window_analytics": q_rel_window_analytics,
        "rel_range_join": q_rel_range_join,
        "rel_datefns": q_rel_datefns,
        "rel_collect_list": q_rel_collect_list,
        "kg_eval_pr": q_kg_eval_pr,
        "rel_cube": q_rel_cube,
        "rel_misc_fns": q_rel_misc_fns,
        "rel_array_fns": q_rel_array_fns,
        "kg_pagerank": q_kg_pagerank,
        "kg_concept_lift": q_kg_concept_lift,
        "text_bm25": q_text_bm25,
        "text_perplexity": q_text_perplexity,
        "stream_triples": q_stream_triples,
        "kg_bgp_query": q_kg_bgp_query,
        "kg_path_query": q_kg_path_query,
        "kg_bgp_optional": q_kg_bgp_optional,
        "kg_incremental_cds": q_kg_incremental_cds,
        "rel_profile": q_rel_profile,
        "kg_negative_samples": q_kg_negative_samples,
        "curation_deciles": q_curation_deciles,
        "sim_recall": q_sim_recall,
        "curation_weighted": q_curation_weighted,
        "kg_tool_sequences": q_kg_tool_sequences,
        "kg_tool_latency": q_kg_tool_latency,
        "rel_scd2": q_rel_scd2,
        "kg_triangles": q_kg_triangles,
        "text_hash_classifier": q_text_hash_classifier,
        "curation_shards": q_curation_shards,
        "curation_source_filter": q_curation_source_filter,
        "stream_dedup": q_stream_dedup,
        "dedup_incremental": q_dedup_incremental,
        "kg_conv_rollup": q_kg_conv_rollup,
        "rel_skew_profile": q_rel_skew_profile,
        "rel_pit_join": q_rel_pit_join,
        "kg_episodes": q_kg_episodes,
        "kg_search_ndcg": q_kg_search_ndcg,
        "curation_interleave": q_curation_interleave,
        "multimodal_resize": q_multimodal_resize,
        "kg_degree_dist": q_kg_degree_dist,
        "kg_coverage": q_kg_coverage,
        "kg_batch_search": q_kg_batch_search,
        "kg_nt_export": q_kg_nt_export,
        "rel_heavy_hitters": q_rel_heavy_hitters,
        "kg_clustering": q_kg_clustering,
        "dedup_semantic": q_dedup_semantic,
        "rel_funnel": q_rel_funnel,
        "kg_concept_drift": q_kg_concept_drift,
        "kg_related": q_kg_related,
        "kg_resnik": q_kg_resnik,
        "rel_window_dist": q_rel_window_dist,
        "rel_funnel_latency": q_rel_funnel_latency,
        "rel_retention": q_rel_retention,
        "curation_dsir": q_curation_dsir,
        "text_ttr": q_text_ttr,
        "text_boilerplate": q_text_boilerplate,
        "kg_kcore": q_kg_kcore,
        "text_vocab": q_text_vocab,
        "text_source_overlap": q_text_source_overlap,
        "curation_attrition": q_curation_attrition,
        "sim_kmeans": q_sim_kmeans,
        "curation_chunks": q_curation_chunks,
        "multimodal_phash": q_multimodal_phash,
        "stream_attrition": q_stream_attrition,
        "stream_upsert": q_stream_upsert,
        "text_zipf": q_text_zipf,
        "rel_kanon": q_rel_kanon,
        "kg_lin_jc": q_kg_lin_jc,
        "kg_hits": q_kg_hits,
        "dedup_bloom": q_dedup_bloom,
        "kg_ask": q_kg_ask,
        "curation_split": q_curation_split,
        "stream_topk": q_stream_topk,
        "text_readability": q_text_readability,
        "rel_islands": q_rel_islands,
        "dedup_edit": q_dedup_edit,
        "kg_bfs": q_kg_bfs,
        "kg_community": q_kg_community,
        "stream_late_audit": q_stream_late_audit,
        "rel_ks_drift": q_rel_ks_drift,
        "text_keyphrase": q_text_keyphrase,
        "rel_benford": q_rel_benford,
        "stream_stateful_counts": q_stream_stateful_counts,
        "sim_silhouette": q_sim_silhouette,
        "rel_gapfill": q_rel_gapfill,
        "kg_shortest_path": q_kg_shortest_path,
        "kg_snapshot_asof": q_kg_snapshot_asof,
        "kg_sparql_agg": q_kg_sparql_agg,
        "sim_pq_topk": q_sim_pq_topk,
        "curation_skipgram": q_curation_skipgram,
        "kg_link_predict": q_kg_link_predict,
        "text_collocations": q_text_collocations,
        "rel_changepoint": q_rel_changepoint,
        "rel_concurrency": q_rel_concurrency,
        "kg_random_walks": q_kg_random_walks,
        "dedup_canonical": q_dedup_canonical,
        "dedup_containment": q_dedup_containment,
        "kg_describe": q_kg_describe,
        "sim_two_stage": q_sim_two_stage,
        "kg_walk_pairs": q_kg_walk_pairs,
        "kg_direct_mapping": q_kg_direct_mapping,
        "kg_fact_fusion": q_kg_fact_fusion,
        "kg_open_relations": q_kg_open_relations,
        "kg_dialogue_acts": q_kg_dialogue_acts,
        "kg_property_stats": q_kg_property_stats,
        "dedup_blocking_audit": q_dedup_blocking_audit,
        "kg_coref_lite": q_kg_coref_lite,
        "kg_entity_salience": q_kg_entity_salience,
        "kg_turn_novelty": q_kg_turn_novelty,
        "kg_alias_table": q_kg_alias_table,
        "kg_transe_score": q_kg_transe_score,
        "kg_rule_mining": q_kg_rule_mining,
        "kg_completeness_est": q_kg_completeness_est,
        "kg_fact_conflicts": q_kg_fact_conflicts,
        "dedup_savings": q_dedup_savings,
        "kg_sparql_setops": q_kg_sparql_setops,
        "kg_reify": q_kg_reify,
        "kg_void_stats": q_kg_void_stats,
        "rel_outliers": q_rel_outliers,
        "rel_seq_patterns": q_rel_seq_patterns,
        "curation_token_budget": q_curation_token_budget,
        "kg_closeness": q_kg_closeness,
        "stats_cms_tokens": q_stats_cms_tokens,
        "kg_decay_cds": q_kg_decay_cds,
        "rel_skyline": q_rel_skyline,
        "kg_pred_cooccur": q_kg_pred_cooccur,
        "stats_binned_quantiles": q_stats_binned_quantiles,
        "kg_collective_linking": q_kg_collective_linking,
        "rel_nearest_event": q_rel_nearest_event,
        "kg_concept_transitions": q_kg_concept_transitions,
        "stats_kmv_distinct": q_stats_kmv_distinct,
        "rel_fk_discovery": q_rel_fk_discovery,
        "kg_entity_cards": q_kg_entity_cards,
        "curation_contrastive_pairs": q_curation_contrastive_pairs,
        "rel_chisq": q_rel_chisq,
        "kg_graph_summary": q_kg_graph_summary,
        "kg_surface_ambiguity": q_kg_surface_ambiguity,
        "kg_transitive_reduction": q_kg_transitive_reduction,
        "kg_event_extraction": q_kg_event_extraction,
        "kg_fact_intervals": q_kg_fact_intervals,
        "kg_snapshot_diff": q_kg_snapshot_diff,
        "kg_ppr": q_kg_ppr,
        "kg_search_prf": q_kg_search_prf,
        "kg_linkpred_eval": q_kg_linkpred_eval,
        "kg_type_inference": q_kg_type_inference,
        "kg_assortativity": q_kg_assortativity,
        "kg_sameas_closure": q_kg_sameas_closure,
        "kg_search_mmr": q_kg_search_mmr,
        "sim_rrf_fusion": q_sim_rrf_fusion,
        "rel_attribution": q_rel_attribution,
        "rel_basket_rules": q_rel_basket_rules,
        "sim_cluster_ari": q_sim_cluster_ari,
        "rel_rfm": q_rel_rfm,
        "sim_prefix_recall": q_sim_prefix_recall,
        "curation_keep_list": q_curation_keep_list,
        "sim_conv_pool": q_sim_conv_pool,
        "kg_property_table": q_kg_property_table,
        "text_jsd_sources": q_text_jsd_sources,
        "kg_powerlaw_alpha": q_kg_powerlaw_alpha,
        "text_burstiness": q_text_burstiness,
        "multimodal_patches": q_multimodal_patches,
        "stream_scd2": q_stream_scd2,
        "kg_impact_analysis": q_kg_impact_analysis,
        "text_vocab_coverage": q_text_vocab_coverage,
        "kg_mention_contexts": q_kg_mention_contexts,
        "curation_domain_weights": q_curation_domain_weights,
        "kg_neighbor_sampling": q_kg_neighbor_sampling,
        "stats_bootstrap_ci": q_stats_bootstrap_ci,
        "dedup_threshold_sweep": q_dedup_threshold_sweep,
        "kg_degree_anomaly": q_kg_degree_anomaly,
        "kg_calibration": q_kg_calibration,
        "sim_centroid_drift": q_sim_centroid_drift,
        "kg_truss": q_kg_truss,
        "rel_abtest": q_rel_abtest,
        "sim_knn_graph": q_sim_knn_graph,
        "text_gini": q_text_gini,
        "kg_pathsim": q_kg_pathsim,
        "stats_welch": q_stats_welch,
        "stats_autocorr": q_stats_autocorr,
        "curation_anneal": q_curation_anneal,
        "sim_semantic_clusters": q_sim_semantic_clusters,
        "stats_runs": q_stats_runs,
        "rel_ltv": q_rel_ltv,
        "stats_seasonality": q_stats_seasonality,
        "sim_outliers": q_sim_outliers,
        "stats_evt": q_stats_evt,
        "rel_ri_audit": q_rel_ri_audit,
        "kg_rank_corr": q_kg_rank_corr,
        "sim_ann_sweep": q_sim_ann_sweep,
        "kg_diameter_est": q_kg_diameter_est,
        "text_heaps": q_text_heaps,
        "sim_bucket_balance": q_sim_bucket_balance,
        "stats_chao1": q_stats_chao1,
        "kg_topic_focus": q_kg_topic_focus,
        "dedup_cluster_quality": q_dedup_cluster_quality,
        "stats_jackknife": q_stats_jackknife,
        "sim_pq_recall": q_sim_pq_recall,
        "curation_fertility": q_curation_fertility,
        "rel_new_returning": q_rel_new_returning,
        "sim_label_calibration": q_sim_label_calibration,
        "text_code_detect": q_text_code_detect,
        "stats_ewma": q_stats_ewma,
        "stats_backtest": q_stats_backtest,
        "sim_dim_variance": q_sim_dim_variance,
        "text_blocklist": q_text_blocklist,
        "stats_anomaly_days": q_stats_anomaly_days,
        "sim_triplet_mining": q_sim_triplet_mining,
        "stats_mannwhitney": q_stats_mannwhitney,
        "stats_trend": q_stats_trend,
        "text_class_entropy": q_text_class_entropy,
        "kg_cardinality_profile": q_kg_cardinality_profile,
        "curation_curriculum": q_curation_curriculum,
        "stats_friedman": q_stats_friedman,
        "sim_hubness": q_sim_hubness,
        "stats_dispersion": q_stats_dispersion,
        "rel_user_entropy": q_rel_user_entropy,
        "rel_velocity": q_rel_velocity,
        "curation_dataset_card": q_curation_dataset_card,
        "rel_stickiness": q_rel_stickiness,
        "dedup_population_est": q_dedup_population_est,
        "stats_control_chart": q_stats_control_chart,
        "curation_pii_audit": q_curation_pii_audit,
        "kg_join_cardinality": q_kg_join_cardinality,
        "stats_ccf": q_stats_ccf,
        "curation_apportion": q_curation_apportion,
        "stats_interarrival": q_stats_interarrival,
        "stats_psi": q_stats_psi,
        "rel_dormancy": q_rel_dormancy,
        "rel_growth_accounting": q_rel_growth_accounting,
        "stats_records": q_stats_records,
        "stats_mix_shift": q_stats_mix_shift,
        "sim_norm_audit": q_sim_norm_audit,
        "kg_rich_club": q_kg_rich_club,
        "rel_anova": q_rel_anova,
        "rel_error_cascade": q_rel_error_cascade,
        "rel_fulfillment": q_rel_fulfillment,
        "sim_knn_label_smooth": q_sim_knn_label_smooth,
        "rel_hhi_trend": q_rel_hhi_trend,
        "stats_entropy_rate": q_stats_entropy_rate,
        "stats_transition_drift": q_stats_transition_drift,
        "sim_intrinsic_dim": q_sim_intrinsic_dim,
        "kg_domain_range_audit": q_kg_domain_range_audit,
        "dedup_hash_collision_audit": q_dedup_hash_collision_audit,
        "rel_sla_inversion": q_rel_sla_inversion,
        "stats_circadian": q_stats_circadian,
        "curation_sample_audit": q_curation_sample_audit,
        "sim_ivf_sweep": q_sim_ivf_sweep,
        "kg_reciprocity": q_kg_reciprocity,
        "kg_salt_planner": q_kg_salt_planner,
        "text_memorization": q_text_memorization,
        "stats_survival": q_stats_survival,
        "dedup_attribution": q_dedup_attribution,
        "kg_thread_stats": q_kg_thread_stats,
        "text_instruction_detect": q_text_instruction_detect,
        "rel_simpson": q_rel_simpson,
        "rel_pvm_bridge": q_rel_pvm_bridge,
        "sim_anisotropy": q_sim_anisotropy,
        "kg_storage_model": q_kg_storage_model,
        "rel_interaction": q_rel_interaction,
        "stats_qq_shift": q_stats_qq_shift,
        "sim_mahalanobis_ood": q_sim_mahalanobis_ood,
        "rel_calendar_effects": q_rel_calendar_effects,
        "stats_longmemory": q_stats_longmemory,
        "curation_ablation": q_curation_ablation,
        "stats_cusum": q_stats_cusum,
        "dedup_truncation": q_dedup_truncation,
    }


def build_oracle_sql() -> dict[str, str]:
    return {
        "kg_transcripts": SQL_KG_TRANSCRIPTS,
        "kg_turn_assembly": SQL_KG_TURN_ASSEMBLY,
        "kg_mentions": SQL_KG_MENTIONS,
        "kg_candidates": _sql_kg_candidates_body(),
        "kg_canonical": "WITH x AS (" + _sql_kg_canonical_body() + ") SELECT * FROM x",
        "kg_triples": _sql_kg_triples_body(),
        "kg_cds": _sql_kg_cds_body(),
        "kg_wup_matrix": _sql_kg_wup_matrix(),
        "kg_search": _sql_kg_search(),
        "rel_pricing": SQL_REL_PRICING,
        "rel_nation_revenue": SQL_REL_NATION_REVENUE,
        "rel_semi_anti": SQL_REL_SEMI_ANTI,
        "rel_window_topk": SQL_REL_WINDOW_TOPK,
        "rel_rollup": SQL_REL_ROLLUP,
        "rel_setops": SQL_REL_SETOPS,
        "rel_strings": SQL_REL_STRINGS,
        "rel_monthly_orders": SQL_REL_MONTHLY_ORDERS,
        "rel_json": SQL_REL_JSON,
        "rel_sessionize": SQL_REL_SESSIONIZE,
        "rel_asof_join": SQL_REL_ASOF,
        "dedup_exact": SQL_DEDUP_EXACT,
        "dedup_jaccard": SQL_DEDUP_JACCARD,
        "text_quality": SQL_TEXT_QUALITY,
        "text_fingerprint": SQL_TEXT_FINGERPRINT,
        "sim_topk_cosine": SQL_SIM_TOPK,
        "dedup_embedding": SQL_DEDUP_EMBEDDING,
        "kg_manual_merge": _sql_kg_manual_merge(),
        "kg_manual_cds": _sql_kg_manual_cds(),
        "kg_config_cds": _sql_kg_config_cds(),
        "kg_config_search": _sql_kg_config_search(),
        "kg_search_wup": _sql_kg_search_wup(),
        "kg_two_hop": _sql_kg_two_hop(),
        "kg_inferred_triples": _sql_kg_inferred_triples(),
        "kg_construct_query": _sql_kg_construct_query(),
        "kg_search_closure": _sql_kg_search_closure(),
        "kg_branch_rollup": _sql_kg_branch_rollup(),
        "kg_ontology_diff": _sql_kg_ontology_diff(),
        "kg_validate": _sql_kg_validate(),
        "text_langid_eval": _sql_text_langid_eval(),
        "kg_ontology_ingest": _sql_kg_ontology_ingest(),
        "kg_resume_manifest": _sql_kg_resume_manifest(),
        "stream_sessionize": SQL_STREAM_SESSIONIZE,
        "stream_join": SQL_STREAM_JOIN,
        "kg_dcat_ingest": _sql_kg_dcat_ingest(),
        "text_redact": _sql_text_redact(),
        "sim_quantized_topk": SQL_SIM_QUANTIZED_TOPK_TMPL.format(
            n_query=N_QUERY_VECS, k=SIM_TOP_K),
        "sim_maxsim_topk": SQL_SIM_MAXSIM_TOPK_TMPL.format(
            t=MAXSIM_TOKENS, w=64 // MAXSIM_TOKENS,
            n_query=N_QUERY_VECS, k=SIM_TOP_K),
        "curation_pack": SQL_CURATION_PACK,
        "text_contamination": SQL_TEXT_CONTAMINATION,
        "text_repetition": SQL_TEXT_REPETITION,
        "dedup_spans": SQL_DEDUP_SPANS,
        "curation_mixture": SQL_CURATION_MIXTURE,
        "rel_range_frame": SQL_REL_RANGE_FRAME,
        "rel_grouping_sets": SQL_REL_GROUPING_SETS,
        "rel_lateral": SQL_REL_LATERAL,
        "rel_stats_agg": SQL_REL_STATS_AGG,
        "rel_salted_agg": SQL_REL_SALTED_AGG,
        "kg_materialize": _sql_kg_triples_body(),
        "kg_mentions_regex": _sql_kg_mentions_regex(),
        "multimodal_frames": SQL_MULTIMODAL_FRAMES,
        "multimodal_decode": _sql_multimodal_decode(),
        "multimodal_stats": SQL_MULTIMODAL_STATS,
        "kg_fast_pipeline": _sql_kg_fast_pipeline(),
        "dedup_components": _sql_dedup_components(),
        "text_tfidf": SQL_TEXT_TFIDF,
        "curation_sample": SQL_CURATION_SAMPLE,
        "curation_keep_best": _sql_curation_keep_best(),
        "text_token_counts": SQL_TEXT_TOKEN_COUNTS,
        "text_langid": _sql_text_langid(),
        "text_winnow": _sql_text_winnow(),
        "dedup_minhash_lsh": _sql_dedup_minhash(),
        "dedup_simhash": _sql_dedup_simhash(),
        "sim_ann_lsh": _sql_sim_ann_lsh(),
        "sim_ann_ivf": _sql_sim_ann_ivf(),
        "rel_percentiles": SQL_REL_PERCENTILES,
        "rel_subqueries": SQL_REL_SUBQUERIES,
        "rel_unpivot": SQL_REL_UNPIVOT,
        "rel_pivot": SQL_REL_PIVOT,
        "rel_window_analytics": SQL_REL_WINDOW_ANALYTICS,
        "rel_range_join": SQL_REL_RANGE_JOIN,
        "rel_datefns": SQL_REL_DATEFNS,
        "rel_collect_list": SQL_REL_COLLECT_LIST,
        "kg_eval_pr": _sql_kg_eval_pr(),
        "rel_cube": SQL_REL_CUBE,
        "rel_misc_fns": _SQL_REL_MISC_FNS_DUCK,
        "rel_array_fns": _SQL_REL_ARRAY_FNS_DUCK,
        "kg_pagerank": _sql_kg_pagerank(),
        "kg_concept_lift": _sql_kg_concept_lift(),
        "text_bm25": _sql_text_bm25(),
        "text_perplexity": SQL_TEXT_PERPLEXITY,
        "stream_triples": _sql_kg_fast_pipeline(),
        "kg_bgp_query": _sql_kg_bgp_query(),
        "kg_path_query": _sql_kg_path_query(),
        "kg_bgp_optional": _sql_kg_bgp_optional(),
        "kg_incremental_cds": _sql_kg_cds_body(),
        "rel_profile": _sql_rel_profile(),
        "kg_negative_samples": _sql_kg_negative_samples(),
        "curation_deciles": _sql_curation_deciles(),
        "sim_recall": _sql_sim_recall(),
        "curation_weighted": _sql_curation_weighted(),
        "kg_tool_sequences": SQL_KG_TOOL_SEQUENCES,
        "kg_tool_latency": SQL_KG_TOOL_LATENCY,
        "rel_scd2": SQL_REL_SCD2,
        "kg_triangles": SQL_KG_TRIANGLES,
        "text_hash_classifier": _sql_text_hash_classifier(),
        "curation_shards": _sql_curation_shards(),
        "curation_source_filter": _sql_curation_source_filter(),
        "stream_dedup": SQL_STREAM_DEDUP,
        "dedup_incremental": SQL_DEDUP_INCREMENTAL,
        "kg_conv_rollup": SQL_KG_CONV_ROLLUP,
        "rel_skew_profile": SQL_REL_SKEW_PROFILE,
        "rel_pit_join": SQL_REL_PIT_JOIN,
        "kg_episodes": _sql_kg_episodes(),
        "kg_search_ndcg": _sql_kg_search_ndcg(),
        "curation_interleave": _sql_curation_interleave(),
        "multimodal_resize": _sql_multimodal_resize(),
        "kg_degree_dist": _sql_kg_degree_dist(),
        "kg_coverage": _sql_kg_coverage(),
        "kg_batch_search": _sql_kg_batch_search(),
        "kg_nt_export": _sql_kg_nt_export(),
        "rel_heavy_hitters": SQL_REL_HEAVY_HITTERS,
        "kg_clustering": SQL_KG_CLUSTERING,
        "dedup_semantic": SQL_DEDUP_SEMANTIC,
        "rel_funnel": SQL_REL_FUNNEL,
        "kg_concept_drift": SQL_KG_CONCEPT_DRIFT,
        "kg_related": SQL_KG_RELATED,
        "kg_resnik": _sql_kg_resnik(),
        "rel_window_dist": SQL_REL_WINDOW_DIST,
        "rel_funnel_latency": SQL_REL_FUNNEL_LATENCY,
        "rel_retention": SQL_REL_RETENTION,
        "curation_dsir": SQL_CURATION_DSIR,
        "text_ttr": SQL_TEXT_TTR,
        "text_boilerplate": SQL_TEXT_BOILERPLATE,
        "kg_kcore": _sql_kg_kcore(),
        "text_vocab": SQL_TEXT_VOCAB,
        "text_source_overlap": SQL_TEXT_SOURCE_OVERLAP,
        "curation_attrition": SQL_CURATION_ATTRITION,
        "sim_kmeans": _sql_sim_kmeans(),
        "curation_chunks": SQL_CURATION_CHUNKS,
        "multimodal_phash": _sql_multimodal_phash(),
        "stream_attrition": SQL_CURATION_ATTRITION,
        "stream_upsert": SQL_STREAM_UPSERT,
        "text_zipf": SQL_TEXT_ZIPF,
        "rel_kanon": SQL_REL_KANON,
        "kg_lin_jc": _sql_kg_lin_jc(),
        "kg_hits": _sql_kg_hits(),
        "dedup_bloom": _sql_dedup_bloom(),
        "kg_ask": _sql_kg_ask(),
        "curation_split": _sql_curation_split(),
        "stream_topk": SQL_STREAM_TOPK,
        "text_readability": SQL_TEXT_READABILITY,
        "rel_islands": SQL_REL_ISLANDS,
        "dedup_edit": _sql_dedup_edit(),
        "kg_bfs": _sql_kg_bfs(),
        "kg_community": _sql_kg_community(),
        "stream_late_audit": _sql_stream_late_audit(),
        "rel_ks_drift": _sql_rel_ks_drift(),
        "text_keyphrase": _sql_text_keyphrase(),
        "rel_benford": _sql_rel_benford(),
        "stream_stateful_counts": _sql_stream_stateful_counts(),
        "sim_silhouette": _sql_sim_silhouette(),
        "rel_gapfill": SQL_REL_GAPFILL,
        "kg_shortest_path": _sql_kg_shortest_path(),
        "kg_snapshot_asof": _sql_kg_snapshot_asof(),
        "kg_sparql_agg": _sql_kg_sparql_agg(),
        "sim_pq_topk": SQL_SIM_PQ_TOPK_TMPL.format(
            n_query=N_QUERY_VECS, K=PQ_CODES, M=PQ_SUBS,
            w=64 // PQ_SUBS, k=SIM_TOP_K),
        "curation_skipgram": _sql_curation_skipgram(),
        "kg_link_predict": _sql_kg_link_predict(),
        "text_collocations": _sql_text_collocations(),
        "rel_changepoint": SQL_REL_CHANGEPOINT,
        "rel_concurrency": SQL_REL_CONCURRENCY,
        "kg_random_walks": _sql_kg_random_walks(),
        "dedup_canonical": _sql_dedup_canonical(),
        "dedup_containment": SQL_DEDUP_CONTAINMENT,
        "kg_describe": _sql_kg_describe(),
        "sim_two_stage": _sql_sim_two_stage(),
        "kg_walk_pairs": _sql_kg_walk_pairs(),
        "kg_direct_mapping": SQL_KG_DIRECT_MAPPING,
        "kg_fact_fusion": _sql_kg_fact_fusion(),
        "kg_open_relations": _sql_kg_open_relations(),
        "kg_dialogue_acts": _sql_kg_dialogue_acts(),
        "kg_property_stats": _sql_kg_property_stats(),
        "dedup_blocking_audit": _sql_dedup_blocking_audit(),
        "kg_coref_lite": SQL_KG_COREF_LITE,
        "kg_entity_salience": _sql_kg_entity_salience(),
        "kg_turn_novelty": SQL_KG_TURN_NOVELTY,
        "kg_alias_table": _sql_kg_alias_table(),
        "kg_transe_score": _sql_kg_transe_score(),
        "kg_rule_mining": _sql_kg_rule_mining(),
        "kg_completeness_est": SQL_KG_COMPLETENESS_EST,
        "kg_fact_conflicts": _sql_kg_fact_conflicts(),
        "dedup_savings": _sql_dedup_savings(),
        "kg_sparql_setops": _sql_kg_sparql_setops(),
        "kg_reify": _sql_kg_reify(),
        "kg_void_stats": _sql_kg_void_stats(),
        "rel_outliers": SQL_REL_OUTLIERS,
        "rel_seq_patterns": SQL_REL_SEQ_PATTERNS,
        "curation_token_budget": SQL_CURATION_TOKEN_BUDGET,
        "kg_closeness": SQL_KG_CLOSENESS,
        "stats_cms_tokens": _sql_stats_cms_tokens(),
        "kg_decay_cds": _sql_kg_decay_cds(),
        "rel_skyline": SQL_REL_SKYLINE,
        "kg_pred_cooccur": _sql_kg_pred_cooccur(),
        "stats_binned_quantiles": SQL_STATS_BINNED_QUANTILES,
        "kg_collective_linking": _sql_kg_collective_linking(),
        "rel_nearest_event": SQL_REL_NEAREST_EVENT,
        "kg_concept_transitions": _sql_kg_concept_transitions(),
        "stats_kmv_distinct": _sql_stats_kmv_distinct(),
        "rel_fk_discovery": _sql_rel_fk_discovery(),
        "kg_entity_cards": _sql_kg_entity_cards(),
        "curation_contrastive_pairs": _sql_curation_contrastive_pairs(),
        "rel_chisq": SQL_REL_CHISQ,
        "kg_graph_summary": _sql_kg_graph_summary(),
        "kg_surface_ambiguity": _sql_kg_surface_ambiguity(),
        "kg_transitive_reduction": _sql_kg_transitive_reduction(),
        "kg_event_extraction": _sql_kg_event_extraction(),
        "kg_fact_intervals": _sql_kg_fact_intervals(),
        "kg_snapshot_diff": _sql_kg_snapshot_diff(),
        "kg_ppr": _sql_kg_ppr(),
        "kg_search_prf": _sql_kg_search_prf(),
        "kg_linkpred_eval": _sql_kg_linkpred_eval(),
        "kg_type_inference": _sql_kg_type_inference(),
        "kg_assortativity": _sql_kg_assortativity(),
        "kg_sameas_closure": _sql_kg_sameas_closure(),
        "kg_search_mmr": _sql_kg_search_mmr(),
        "sim_rrf_fusion": _sql_sim_rrf_fusion(),
        "rel_attribution": _sql_rel_attribution(),
        "rel_basket_rules": _sql_rel_basket_rules(),
        "sim_cluster_ari": _sql_sim_cluster_ari(),
        "rel_rfm": _sql_rel_rfm(),
        "sim_prefix_recall": _sql_sim_prefix_recall(),
        "curation_keep_list": _sql_curation_keep_list(),
        "sim_conv_pool": _sql_sim_conv_pool(),
        "kg_property_table": _sql_kg_property_table(),
        "text_jsd_sources": _sql_text_jsd_sources(),
        "kg_powerlaw_alpha": _sql_kg_powerlaw_alpha(),
        "text_burstiness": _sql_text_burstiness(),
        "multimodal_patches": _sql_multimodal_patches(),
        "stream_scd2": SQL_REL_SCD2,
        "kg_impact_analysis": _sql_kg_impact_analysis(),
        "text_vocab_coverage": _sql_text_vocab_coverage(),
        "kg_mention_contexts": _sql_kg_mention_contexts(),
        "curation_domain_weights": _sql_curation_domain_weights(),
        "kg_neighbor_sampling": _sql_kg_neighbor_sampling(),
        "stats_bootstrap_ci": _sql_stats_bootstrap_ci(),
        "dedup_threshold_sweep": _sql_dedup_threshold_sweep(),
        "kg_degree_anomaly": _sql_kg_degree_anomaly(),
        "kg_calibration": _sql_kg_calibration(),
        "sim_centroid_drift": _sql_sim_centroid_drift(),
        "kg_truss": _sql_kg_truss(),
        "rel_abtest": _sql_rel_abtest(),
        "sim_knn_graph": _sql_sim_knn_graph(),
        "text_gini": _sql_text_gini(),
        "kg_pathsim": _sql_kg_pathsim(),
        "stats_welch": _sql_stats_welch(),
        "stats_autocorr": _sql_stats_autocorr(),
        "curation_anneal": _sql_curation_anneal(),
        "sim_semantic_clusters": _sql_sim_semantic_clusters(),
        "stats_runs": _sql_stats_runs(),
        "rel_ltv": _sql_rel_ltv(),
        "stats_seasonality": _sql_stats_seasonality(),
        "sim_outliers": _sql_sim_outliers(),
        "stats_evt": _sql_stats_evt(),
        "rel_ri_audit": _sql_rel_ri_audit(),
        "kg_rank_corr": _sql_kg_rank_corr(),
        "sim_ann_sweep": _sql_sim_ann_sweep(),
        "kg_diameter_est": _sql_kg_diameter_est(),
        "text_heaps": _sql_text_heaps(),
        "sim_bucket_balance": _sql_sim_bucket_balance(),
        "stats_chao1": _sql_stats_chao1(),
        "kg_topic_focus": _sql_kg_topic_focus(),
        "dedup_cluster_quality": _sql_dedup_cluster_quality(),
        "stats_jackknife": _sql_stats_jackknife(),
        "sim_pq_recall": _sql_sim_pq_recall(),
        "curation_fertility": _sql_curation_fertility(),
        "rel_new_returning": _sql_rel_new_returning(),
        "sim_label_calibration": _sql_sim_label_calibration(),
        "text_code_detect": _sql_text_code_detect(),
        "stats_ewma": _sql_stats_ewma(),
        "stats_backtest": _sql_stats_backtest(),
        "sim_dim_variance": _sql_sim_dim_variance(),
        "text_blocklist": _sql_text_blocklist(),
        "stats_anomaly_days": _sql_stats_anomaly_days(),
        "sim_triplet_mining": _sql_sim_triplet_mining(),
        "stats_mannwhitney": _sql_stats_mannwhitney(),
        "stats_trend": _sql_stats_trend(),
        "text_class_entropy": _sql_text_class_entropy(),
        "kg_cardinality_profile": _sql_kg_cardinality_profile(),
        "curation_curriculum": _sql_curation_curriculum(),
        "stats_friedman": _sql_stats_friedman(),
        "sim_hubness": _sql_sim_hubness(),
        "stats_dispersion": _sql_stats_dispersion(),
        "rel_user_entropy": _sql_rel_user_entropy(),
        "rel_velocity": _sql_rel_velocity(),
        "curation_dataset_card": _sql_curation_dataset_card(),
        "rel_stickiness": _sql_rel_stickiness(),
        "dedup_population_est": _sql_dedup_population_est(),
        "stats_control_chart": _sql_stats_control_chart(),
        "curation_pii_audit": _sql_curation_pii_audit(),
        "kg_join_cardinality": _sql_kg_join_cardinality(),
        "stats_ccf": _sql_stats_ccf(),
        "curation_apportion": _sql_curation_apportion(),
        "stats_interarrival": _sql_stats_interarrival(),
        "stats_psi": _sql_stats_psi(),
        "rel_dormancy": _sql_rel_dormancy(),
        "rel_growth_accounting": _sql_rel_growth_accounting(),
        "stats_records": _sql_stats_records(),
        "stats_mix_shift": _sql_stats_mix_shift(),
        "sim_norm_audit": _sql_sim_norm_audit(),
        "kg_rich_club": _sql_kg_rich_club(),
        "rel_anova": _sql_rel_anova(),
        "rel_error_cascade": _sql_rel_error_cascade(),
        "rel_fulfillment": _sql_rel_fulfillment(),
        "sim_knn_label_smooth": _sql_sim_knn_label_smooth(),
        "rel_hhi_trend": _sql_rel_hhi_trend(),
        "stats_entropy_rate": _sql_stats_entropy_rate(),
        "stats_transition_drift": _sql_stats_transition_drift(),
        "sim_intrinsic_dim": _sql_sim_intrinsic_dim(),
        "kg_domain_range_audit": _sql_kg_domain_range_audit(),
        "dedup_hash_collision_audit": _sql_dedup_hash_collision_audit(),
        "rel_sla_inversion": _sql_rel_sla_inversion(),
        "stats_circadian": _sql_stats_circadian(),
        "curation_sample_audit": _sql_curation_sample_audit(),
        "sim_ivf_sweep": _sql_sim_ivf_sweep(),
        "kg_reciprocity": _sql_kg_reciprocity(),
        "kg_salt_planner": _sql_kg_salt_planner(),
        "text_memorization": _sql_text_memorization(),
        "stats_survival": _sql_stats_survival(),
        "dedup_attribution": _sql_dedup_attribution(),
        "kg_thread_stats": _sql_kg_thread_stats(),
        "text_instruction_detect": _sql_text_instruction_detect(),
        "rel_simpson": _sql_rel_simpson(),
        "rel_pvm_bridge": _sql_rel_pvm_bridge(),
        "sim_anisotropy": _sql_sim_anisotropy(),
        "kg_storage_model": _sql_kg_storage_model(),
        "rel_interaction": _sql_rel_interaction(),
        "stats_qq_shift": _sql_stats_qq_shift(),
        "sim_mahalanobis_ood": _sql_sim_mahalanobis_ood(),
        "rel_calendar_effects": _sql_rel_calendar_effects(),
        "stats_longmemory": _sql_stats_longmemory(),
        "curation_ablation": _sql_curation_ablation(),
        "stats_cusum": _sql_stats_cusum(),
        "dedup_truncation": _sql_dedup_truncation(),
    }


# ---------------------------------------------------------------------------
# §2B widening: pivot, window analytics, range join, date fns,
# collect_list, and the P18 evaluation as relational algebra.
# ---------------------------------------------------------------------------

def q_rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() — DuckDB oracle uses conditional aggregation."""
    o = _tbl(spark, sf_dir, "orders")
    piv = (o.groupBy("o_orderstatus")
           .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM"])
           .agg(F.count(F.lit(1))))
    return piv.select(
        F.col("o_orderstatus").alias("status"),
        F.coalesce(F.col("`1-URGENT`"), F.lit(0)).alias("urgent_n"),
        F.coalesce(F.col("`2-HIGH`"), F.lit(0)).alias("high_n"),
        F.coalesce(F.col("`3-MEDIUM`"), F.lit(0)).alias("medium_n"))


SQL_REL_PIVOT = """
SELECT o_orderstatus AS status,
       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_n,
       CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high_n,
       CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS medium_n
FROM orders GROUP BY o_orderstatus
"""


SQL_REL_WINDOW_ANALYTICS = """
SELECT o_custkey, o_orderkey,
       dense_rank() OVER w AS drk,
       ntile(4) OVER w AS quartile,
       round(o_totalprice - lag(o_totalprice, 1, 0.0) OVER w, 2) + 0.0 AS diff_prev,
       round(nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS second_price,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_sum
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
"""


def q_rel_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(SQL_REL_WINDOW_ANALYTICS)


def q_rel_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/interval join at scale (SURVEY §2B; VERDICT r1 #6): for
    each event, count the OTHER events in the preceding hour — the full
    table, no row bound. The epoch-hour equi-conjunct (probe side
    exploded to its 2 covering buckets; each prior event lands in
    exactly one, so no double counting) lets Spark plan a shuffled HASH
    join with the range predicate as residual instead of a
    broadcast-nested-loop over the whole table (plan-asserted in
    tests/test_plans.py). The DuckDB oracle runs its native IEJoin on
    the pure range predicate — same result, independent plan."""
    e = _tbl(spark, sf_dir, "events").select("event_id", "ts")
    hour = F.floor(F.unix_timestamp("ts") / F.lit(3600)).cast("long")
    probe = e.select(
        "event_id", "ts",
        F.explode(F.array(hour, hour - 1)).alias("bkt"))
    build = e.select(F.col("event_id").alias("p_id"),
                     F.col("ts").alias("p_ts"), hour.alias("p_bkt"))
    joined = probe.join(
        build,
        (F.col("bkt") == F.col("p_bkt"))
        & (F.col("p_ts") <= F.col("ts"))
        & (F.col("p_ts") > F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("p_id") != F.col("event_id")),
        "left")
    return (joined.groupBy("event_id")
            .agg(F.count("p_id").alias("n_prior_1h")))


SQL_REL_RANGE_JOIN = """
SELECT e.event_id, count(p.event_id) AS n_prior_1h
FROM events e
LEFT JOIN events p
  ON p.ts <= e.ts AND p.ts > e.ts - INTERVAL 1 HOUR
 AND p.event_id != e.event_id
GROUP BY e.event_id
"""


def q_rel_datefns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _tbl(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.datediff(F.lit("2025-01-01").cast("date"),
                   F.col("o_orderdate").cast("date")).alias("days_to_2025"),
        F.unix_micros(F.date_trunc("week", "o_orderdate")).alias("week_us"),
    )


SQL_REL_DATEFNS = """
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       day(o_orderdate) AS dom,
       date_diff('day', cast(o_orderdate AS DATE), DATE '2025-01-01') AS days_to_2025,
       epoch_us(date_trunc('week', o_orderdate)) AS week_us
FROM orders
"""


def q_rel_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _tbl(spark, sf_dir, "customer")
    n = _tbl(spark, sf_dir, "nation")
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.array_join(F.array_sort(F.collect_set("c_mktsegment")), "|")
                 .alias("segments"),
                 F.count(F.lit(1)).alias("n_customers")))


SQL_REL_COLLECT_LIST = """
SELECT n.n_name, array_to_string(list_sort(list(DISTINCT c.c_mktsegment)), '|') AS segments,
       count(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


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


SQL_REL_CUBE = """
SELECT coalesce(l_returnflag, '<all>') AS returnflag,
       coalesce(l_linestatus, '<all>') AS linestatus,
       grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid,
       count(*) AS n,
       round(sum(l_extendedprice), 2) AS revenue
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_rel_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem")
    return spark.sql(SQL_REL_CUBE)


SQL_REL_MISC_FNS = """
SELECT p_partkey,
       format_string('%s/%02d', p_brand, cast(p_size AS INT)) AS brand_size,
       repeat(substring(p_brand, 1, 2), 2) AS rep2,
       reverse(p_brand) AS rev,
       position('#' IN p_brand) AS hash_pos,
       greatest(p_size, 25) AS size_floor,
       least(cast(floor(p_retailprice) AS INT), 1500) AS price_cap,
       round(log(2.0, cast(p_size + 1 AS DOUBLE)), 6) AS log2_size,
       round(pow(p_size, 0.5), 6) AS sqrt_size,
       cast(p_size % 5 AS INT) AS size_mod
FROM part
"""

# DuckDB dialect variant: format_string -> printf, position syntax shared
_SQL_REL_MISC_FNS_DUCK = """
SELECT p_partkey,
       printf('%s/%02d', p_brand, cast(p_size AS INT)) AS brand_size,
       repeat(substring(p_brand, 1, 2), 2) AS rep2,
       reverse(p_brand) AS rev,
       position('#' IN p_brand) AS hash_pos,
       greatest(p_size, 25) AS size_floor,
       least(cast(floor(p_retailprice) AS INT), 1500) AS price_cap,
       round(log2(cast(p_size + 1 AS DOUBLE)), 6) AS log2_size,
       round(pow(p_size, 0.5), 6) AS sqrt_size,
       cast(p_size % 5 AS INT) AS size_mod
FROM part
"""


def q_rel_misc_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "part")
    return spark.sql(SQL_REL_MISC_FNS)


SQL_REL_ARRAY_FNS = """
SELECT doc_id,
       element_at(toks, 1) AS first_tok,
       element_at(toks, len) AS last_tok,
       len AS n_toks,
       array_contains(toks, 'the') AS has_the,
       size(filter(toks, t -> length(t) > 5)) AS n_long
FROM (
  SELECT doc_id, toks, size(toks) AS len
  FROM (SELECT doc_id, split(text, ' ') AS toks FROM documents)
) WHERE len > 0
"""

_SQL_REL_ARRAY_FNS_DUCK = """
SELECT doc_id,
       toks[1] AS first_tok,
       toks[len] AS last_tok,
       len AS n_toks,
       list_contains(toks, 'the') AS has_the,
       n_long
FROM (
  SELECT doc_id, toks, len(toks) AS len,
         len(list_filter(toks, t -> length(t) > 5)) AS n_long
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
) x WHERE len > 0
"""


def q_rel_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "documents")
    return spark.sql(SQL_REL_ARRAY_FNS)


# ---------------------------------------------------------------------------
# Round-3 tail: graph analytics over the KG (PageRank, concept lift),
# retrieval + LM curation scoring (BM25, bigram perplexity), and
# streaming incremental KG construction.
# ---------------------------------------------------------------------------

PAGERANK_ITERS = 4


def q_kg_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the full heterogeneous KG
    (operators/graph.py) — node importance on the P15 output, the
    classic KG read-side analytic. Pure BIGINT arithmetic, so the
    distributed aggregation is bit-exact against DuckDB's unrolled
    replay of the same four synchronous rounds."""
    from ..operators.graph import pagerank_exact
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
    from ..operators.graph import concept_lift
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


BM25_TERMS = ["join", "filter", "dup", "spark"]
BM25_K = 25


def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval for a fixed query over the documents corpus
    (operators/curation.py) — per-term scores rounded to exact ppm
    integers BEFORE the per-doc sum, so only elementwise IEEE
    arithmetic (plus one ln per distinct df, the tfidf-accepted ulp
    class) crosses engines."""
    from ..operators.curation import bm25_topk
    return bm25_topk(_docs(spark, sf_dir), BM25_TERMS, k=BM25_K)


def _sql_text_bm25() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
WITH toks AS (
  SELECT doc_id, t.tok
  FROM documents, unnest(string_split(text, ' ')) AS t(tok)
  WHERE t.tok <> ''),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
dlen AS (SELECT doc_id, count(*) AS dlen FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, CAST(sum(dlen) AS BIGINT) AS tot
          FROM dlen),
qtf AS (SELECT doc_id, tok, tf FROM tf WHERE tok IN ({terms})),
dfreq AS (SELECT tok, count(*) AS df FROM qtf GROUP BY tok),
scored AS (
  SELECT q.doc_id,
         CAST(round(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (q.tf * (CAST(1.2 AS DOUBLE) + 1.0))
           / (q.tf + CAST(1.2 AS DOUBLE)
              * (1.0 - CAST(0.75 AS DOUBLE)
                 + CAST(0.75 AS DOUBLE) * dl.dlen
                   / (CAST(s.tot AS DOUBLE) / s.n_docs)))
           * CAST(1000000 AS DOUBLE), 0) AS BIGINT) AS term_ppm
  FROM qtf q JOIN dfreq d ON d.tok = q.tok
       JOIN dlen dl ON dl.doc_id = q.doc_id CROSS JOIN stats s)
SELECT doc_id, CAST(sum(term_ppm) AS BIGINT) AS score_ppm,
       count(*) AS n_terms
FROM scored GROUP BY doc_id
ORDER BY score_ppm DESC, doc_id
LIMIT {BM25_K}
"""


def q_text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained add-one bigram LM scoring (operators/curation.py
    bigram_lm_cost) — CCNet-style quality signal; per-bigram costs are
    exact micro-nat integers so sums and the integer-division average
    are merge-order independent."""
    from ..operators.curation import bigram_lm_cost
    return bigram_lm_cost(_docs(spark, sf_dir))


SQL_TEXT_PERPLEXITY = """
WITH tl AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents),
toks AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos
         FROM tl),
big AS (
  SELECT doc_id, w1, w2 FROM (
    SELECT doc_id, tok AS w1,
           lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM toks) x
  WHERE w2 IS NOT NULL),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2),
c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1),
voc AS (SELECT count(DISTINCT tok) AS v FROM toks),
lm AS (
  SELECT a.w1, a.w2,
         CAST(round(-ln((a.c12 + 1.0) / (b.c1 + CAST(voc.v AS DOUBLE)))
                    * CAST(1000000 AS DOUBLE), 0) AS BIGINT) AS cost_micro
  FROM c12 a JOIN c1 b ON b.w1 = a.w1 CROSS JOIN voc)
SELECT g.doc_id, count(*) AS n_bigrams,
       CAST(sum(l.cost_micro) AS BIGINT) // count(*) AS avg_cost_micro
FROM big g JOIN lm l ON l.w1 = g.w1 AND l.w2 = g.w2
GROUP BY g.doc_id
"""


def q_stream_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming INCREMENTAL KG construction: the derived transcript
    table staged as a 4-file directory hash-partitioned by conv_id
    (conversation-atomic micro-batches), drained availableNow with
    maxFilesPerTrigger=1 so four genuine triggers each run the fused
    build_triples_fast on their batch and APPEND to the triple sink.
    Because triple extraction is conversation-local (mentions/tools per
    turn, replies within a conv) and the fused detector dedups per
    turn, the appended union over conv-atomic batches equals the batch
    run row-for-row — verified against the SAME DuckDB oracle as
    kg_fast_pipeline. This is the P15/P16 growth path at 100 TB: new
    conversation slices stream in; nothing is recomputed."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    from .pipeline import build_triples_fast
    sfx = f"{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}"
    out = _os.path.join(_tempfile.gettempdir(), f"stream_tri_{sfx}.parquet")
    ckpt = _os.path.join(_tempfile.gettempdir(), f"stream_tri_{sfx}_ckpt")
    src = _os.path.join(_tempfile.gettempdir(), f"stream_tri_{sfx}_src")
    for d in (out, ckpt, src):
        _shutil.rmtree(d, ignore_errors=True)
    t = derived_transcripts(spark, sf_dir).withColumn(
        "ts", F.lit(None).cast("timestamp"))
    t.repartition(4, "conv_id").write.parquet(src)
    stream = (spark.readStream.schema(t.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))

    def _extract(batch_df: DataFrame, _batch_id: int) -> None:
        build_triples_fast(spark, batch_df, ontology_pdf=_fast_onto_pdf()
                           ).write.mode("append").parquet(out)

    q = (stream.writeStream.outputMode("append").foreachBatch(_extract)
         .trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination()
    spark.catalog.refreshByPath(out)
    return spark.read.parquet(out).select(
        "subj", "pred", "obj", "conv_id", "turn_idx", "score")


BGP_CONCEPT = "dq:L17"
PATH_DEPTH = 3


def q_kg_bgp_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL-style basic graph pattern over the KG
    (operators/graph.py bgp_match): find turns that mention a fixed
    concept AND used a tool AND reply to a turn, binding the tool and
    the predecessor's concepts — four triple patterns compiled to
    pushed-down filters + natural joins, the rdflib graph.query()
    analog. Oracle: the same conjunctive query as explicit SQL joins."""
    from ..operators.graph import bgp_match
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
    from ..operators.graph import construct_triples
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
VALIDATE_BAD_ROWS = [
    ("turn:c-0000:0", "mentions", "bogus:nope", "c-0000", 0, 1.5),
    ("badsubj", "uses_tool", "hammer", "c-0000", 0, 1.0),
    ("turn:c-0001:1", "replies_to", "turn:c-0001:1", "c-0001", 1, 1.0),
    # inference-soundness pair: a JUSTIFIED broader edge (dq:L00's path
    # runs through dq:B1) plus an UNJUSTIFIED one (no asserted mention
    # for that subject at all)
    ("turn:c-9999:0", "mentions", "dq:L00", "c-9999", 0, 0.9),
    ("turn:c-9999:0", "mentions_broader", "dq:B1", "c-9999", 0, 0.72),
    ("turn:c-9998:0", "mentions_broader", "dq:B0", "c-9998", 0, 0.8),
]


def q_kg_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHACL-lite KG shape validation (operators/graph.py
    validate_graph) over the derived graph plus three injected corrupt
    rows: per-constraint violation counts. The un-corrupted corpus
    already yields a natural nonzero `replies_to_target_exists` count —
    opening turns that emit no triples are replied to but absent as
    subjects."""
    from ..operators.graph import validate_graph
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
    from .driver_ontology import driver_ancestors
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
    from .driver_ontology import driver_ancestors
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
    from ..operators.graph import bounded_path
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
    from ..operators.graph import bgp_query
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
    from ..operators.cds import incremental_cds_update
    canon = q_kg_canonical(spark, sf_dir)

    def tags_of(df):
        return (df.groupBy(
            F.concat(F.lit("conv:"), F.col("conv_id")).alias("subj_key"),
            F.col("concept_id"))
            .agg(F.max("link_score").alias("tag_score")))

    batch1 = canon.filter(F.col("turn_idx") % 2 == 0)
    batch2 = canon.filter(F.col("turn_idx") % 2 == 1)
    state = tags_of(batch1)
    from ..operators.cds import propagate_cds
    cds = propagate_cds(state, _wup_df(spark))
    _, final = incremental_cds_update(cds, state, tags_of(batch2),
                                      _wup_df(spark))
    return final.select("subj_key",
                        F.col("concept_id").alias("cds_concept"), "score")


PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_rel_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiler (operators/profile.py): one
    aggregation over one scan computes n / nulls / distinct / min /
    max / exact median for every requested column, unpivoted
    driver-free. Oracle: per-column UNION ALL of the same aggregates."""
    from ..operators.profile import profile_columns
    return profile_columns(_tbl(spark, sf_dir, "lineitem"), PROFILE_COLS)


def _sql_rel_profile() -> str:
    parts = [f"""
SELECT '{c}' AS col_name, count(*) AS n,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       count(DISTINCT {c}) AS n_distinct,
       round(CAST(min({c}) AS DOUBLE), 6) AS min_v,
       round(CAST(max({c}) AS DOUBLE), 6) AS max_v,
       round(quantile_cont({c}, 0.5), 6) AS median_v
FROM lineitem""" for c in PROFILE_COLS]
    return "\nUNION ALL\n".join(parts)


N_NEG_SAMPLES = 2


def q_kg_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corrupted-tail negative sampling over the KG's
    mention edges (operators/graph.py negative_samples) — the
    KG-embedding training-data generator. Oracle: digit-by-digit md5
    index replay + the same cyclic collision shift in SQL."""
    from ..operators.graph import negative_samples
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


def q_curation_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-decile curriculum bucketing (operators/curation.py
    quantile_buckets over bigram_lm_cost): every document gets a 1..10
    tier by exact LM-cost quantile thresholds — broadcast-threshold
    comparison chain, never a single-partition global ntile."""
    from ..operators.curation import bigram_lm_cost, quantile_buckets
    scored = bigram_lm_cost(_docs(spark, sf_dir))
    return (quantile_buckets(scored, "avg_cost_micro", n_buckets=10)
            .select("doc_id", "avg_cost_micro",
                    F.col("bucket").alias("decile")))


def _sql_curation_deciles() -> str:
    cases = " + ".join(
        f"(CASE WHEN avg_cost_micro > t.q{i} THEN 1 ELSE 0 END)"
        for i in range(9))
    qcols = ", ".join(
        f"quantile_cont(avg_cost_micro, {(i + 1) / 10!r}) AS q{i}"
        for i in range(9))
    return f"""
WITH scored AS ({SQL_TEXT_PERPLEXITY}),
th AS (SELECT {qcols} FROM scored)
SELECT s.doc_id, s.avg_cost_micro,
       CAST(1 + {cases} AS INTEGER) AS decile
FROM scored s CROSS JOIN th t
"""


def q_sim_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN self-evaluation: recall@k of the LSH ANN against the exact
    brute-force top-k, per query vector — the metric that justifies the
    approximate path's bucket-join plan at scale. Pure composition of
    the two paired queries; recall emitted as an exact ppm integer."""
    bf = q_sim_topk_cosine(spark, sf_dir).select("qid", "cid")
    ann = q_sim_ann_lsh(spark, sf_dir).select(
        F.col("qid").alias("aqid"), F.col("cid").alias("acid"))
    hits = (bf.join(ann, (F.col("qid") == F.col("aqid"))
                    & (F.col("cid") == F.col("acid")))
            .groupBy("qid").agg(F.count(F.lit(1)).alias("n_hits")))
    return (bf.select("qid").distinct()
            .join(hits, "qid", "left")
            .select("qid",
                    F.coalesce(F.col("n_hits"), F.lit(0).cast("long"))
                    .alias("n_hits"))
            .withColumn("recall_ppm",
                        F.expr(f"(n_hits * 1000000L) DIV {SIM_TOP_K}")))


def _sql_sim_recall() -> str:
    return f"""
WITH bf AS ({SQL_SIM_TOPK}),
ann AS ({_sql_sim_ann_lsh()}),
hits AS (
  SELECT bf.qid, count(*) AS n_hits
  FROM bf JOIN ann ON ann.qid = bf.qid AND ann.cid = bf.cid
  GROUP BY bf.qid)
SELECT q.qid, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST((coalesce(h.n_hits, 0) * 1000000) // {SIM_TOP_K} AS BIGINT)
         AS recall_ppm
FROM (SELECT DISTINCT qid FROM bf) q LEFT JOIN hits h ON h.qid = q.qid
"""


WEIGHTED_SAMPLE_N = 50


def q_curation_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (operators/curation.py weighted_sample, Efraimidis–Spirakis keys
    from md5 uniforms): 50 docs drawn proportional to length. Oracle:
    digit-by-digit md5 uniform replay + the same key arithmetic."""
    from ..operators.curation import weighted_sample
    return weighted_sample(_docs(spark, sf_dir), "n_chars",
                           n=WEIGHTED_SAMPLE_N)


def _sql_curation_weighted() -> str:
    dig = " + ".join(
        f"(instr('0123456789abcdef', substring(k, {i + 1}, 1)) - 1) "
        f"* {16 ** (7 - i)}" for i in range(8))
    return f"""
WITH keyed AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
         round(-ln((CAST(({dig}) AS DOUBLE) + 1.0) / 4294967297.0)
               / CAST(n_chars AS DOUBLE), 6) AS es_key
  FROM (SELECT doc_id, n_chars,
               md5(cast(doc_id AS VARCHAR)) AS k FROM documents) x)
SELECT doc_id, weight, es_key FROM keyed
ORDER BY es_key ASC, doc_id ASC
LIMIT {WEIGHTED_SAMPLE_N}
"""


# ---------------------------------------------------------------------------
# Agent-transcript analytics (tool sequences / latency), CDC SCD2,
# triangle counting, hashed quality classifier (round 3, second wave)
# ---------------------------------------------------------------------------

TS_BASE_S = 1735689600  # 2025-01-01T00:00:00Z, engine-portable integer


def _transcripts_with_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived transcripts plus a deterministic integer epoch-seconds
    column (the BASELINE.json ts field, kept as bigint so the paired
    hash never depends on timestamp formatting)."""
    d = _docs(spark, sf_dir)
    return d.select(
        F.concat(F.lit("conv-"),
                 F.lpad((F.col("doc_id") % N_CONVS).cast("int").cast("string"),
                        4, "0")).alias("conv_id"),
        F.floor(F.col("doc_id") / N_CONVS).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 3 == 2,
               F.concat(F.lit("tool"),
                        (F.col("doc_id") % 8).cast("int").cast("string")))
         .alias("tool"),
        (F.lit(TS_BASE_S) + F.col("doc_id") * 7 + F.col("doc_id") % 13)
        .alias("ts_s"))


_TS_TRANSCRIPTS_CTE = f"""
  SELECT 'conv-' || lpad(cast(cast(doc_id % {N_CONVS} AS INT) AS STRING), 4, '0') AS conv_id,
         cast(floor(doc_id / {N_CONVS}) AS INT) AS turn_idx,
         CASE WHEN doc_id % 3 = 2 THEN 'tool' || cast(cast(doc_id % 8 AS INT) AS STRING) END AS tool,
         {TS_BASE_S} + doc_id * 7 + doc_id % 13 AS ts_s
  FROM documents
"""


def q_kg_tool_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tool-call bigram transition counts over the agent transcripts
    (operators/agentstats.py:tool_transitions)."""
    from ..operators.agentstats import tool_transitions
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
    from ..operators.agentstats import tool_latency
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


def q_rel_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD dimension history from the events change stream
    (operators/agentstats.py:scd2_history): gaps-and-islands collapse of
    consecutive identical event_type per user, half-open validity
    intervals via lead(), deterministic (ts, event_id) tiebreak."""
    from ..operators.agentstats import scd2_history
    return scd2_history(_tbl(spark, sf_dir, "events"),
                        key_col="user_id", attr_col="event_type",
                        ts_col="ts", tiebreak_col="event_id")


SQL_REL_SCD2 = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
changes AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type,
       epoch_us(ts) AS eff_from_us,
       epoch_us(lead(ts) OVER w) AS eff_to_us,
       CAST(row_number() OVER w AS BIGINT) AS version,
       CAST(CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS INT)
         AS is_current
FROM changes
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_kg_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle participation counts over the concept co-occurrence
    graph (edges = concept pairs tagged in the same turn;
    operators/agentstats.py:triangle_count)."""
    from ..operators.agentstats import triangle_count
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


def q_text_hash_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed bag-of-words linear quality classifier
    (operators/textstats.py:hashed_quality_classifier)."""
    from ..operators.textstats import hashed_quality_classifier
    return hashed_quality_classifier(_docs(spark, sf_dir))


def _sql_text_hash_classifier() -> str:
    from ..operators.textstats import HASHCLF_N_BUCKETS
    # bucket = first two md5 hex digits of the token, mod n_buckets —
    # digit-by-digit replay of Spark's conv(substring(md5, 1, 2), 16, 10)
    bucket = ("(strpos('0123456789abcdef', substr(md5(t), 1, 1)) - 1) * 16"
              " + strpos('0123456789abcdef', substr(md5(t), 2, 1)) - 1")
    return f"""
WITH tokd AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'),
                     t -> t <> '') AS toks
  FROM documents
),
scored AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN len(toks) > 0 THEN
           round(list_sum(list_transform(toks, t ->
             CAST((({bucket}) % {HASHCLF_N_BUCKETS}) % 9 - 4 AS DOUBLE) / 4.0))
             / len(toks), 6) + 0.0
         ELSE 0.0 END AS quality_logit
  FROM tokd
)
SELECT doc_id, n_tokens, quality_logit,
       round(1.0 / (1.0 + exp(-quality_logit)), 6) + 0.0 AS quality_prob,
       CAST(CASE WHEN round(1.0 / (1.0 + exp(-quality_logit)), 6) + 0.0 >= 0.5
                 THEN 1 ELSE 0 END AS INT) AS keep
FROM scored
"""


def q_curation_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment
    (operators/curation.py:assign_shards) — map-only, no shuffle."""
    from ..operators.curation import assign_shards
    return assign_shards(_docs(spark, sf_dir))


def _sql_curation_shards() -> str:
    from ..operators.curation import N_SHARDS
    dig = " + ".join(
        f"(instr('0123456789abcdef', substring(k, {i + 1}, 1)) - 1) "
        f"* {16 ** (7 - i)}" for i in range(8))
    return f"""
SELECT doc_id,
       CAST(({dig}) % {N_SHARDS} AS INT) AS shard,
       substring(k, 9, 8) AS order_key
FROM (SELECT doc_id, md5(cast(doc_id AS VARCHAR)) AS k FROM documents) x
"""


SOURCE_FILTER_BLOCKLIST = ("src13",)


def q_curation_source_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level quality gate (operators/curation.py:source_filter):
    per-source mean-length score vs the corpus mean (relative gate, so
    the filter genuinely drops sources at every sf), broadcast-joined
    back as a filter; one source blocklisted on top."""
    from ..operators.curation import source_filter
    return source_filter(_docs(spark, sf_dir),
                         blocklist=SOURCE_FILTER_BLOCKLIST)


def _sql_curation_source_filter() -> str:
    bl = ", ".join(f"'{s}'" for s in SOURCE_FILTER_BLOCKLIST)
    return f"""
WITH stats AS (
  SELECT source,
         round(avg(n_chars), 6) + 0.0 AS source_score,
         count(*) AS source_docs
  FROM documents GROUP BY source
),
corpus AS (SELECT round(avg(n_chars), 6) + 0.0 AS corpus_mean FROM documents),
gate AS (
  SELECT s.* FROM stats s, corpus c
  WHERE s.source_score >= c.corpus_mean AND s.source NOT IN ({bl})
)
SELECT d.doc_id, d.source, g.source_score, g.source_docs
FROM documents d JOIN gate g ON d.source = g.source
"""


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming stateful exact dedup: dropDuplicates over a 4-file
    file-stream (maxFilesPerTrigger=1 forces 4 micro-batches, so the
    dedup state genuinely carries keys ACROSS triggers — a key first
    seen in batch 0 suppresses its duplicates in batch 3). Append-mode
    foreachBatch accumulates exactly one row per distinct text hash;
    only the key column is emitted, so the result is deterministic
    regardless of which physical row won the race within a batch."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    # staging keyed by sf AND pid: two concurrent harness runs against
    # the same sf must not rmtree each other's checkpoint mid-stream
    sfx = f"{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}"
    out = _os.path.join(_tempfile.gettempdir(), f"stream_dedup_{sfx}.parquet")
    ckpt = _os.path.join(_tempfile.gettempdir(), f"stream_dedup_{sfx}_ckpt")
    src = _os.path.join(_tempfile.gettempdir(), f"stream_dedup_{sfx}_src")
    for d in (out, ckpt, src):
        _shutil.rmtree(d, ignore_errors=True)
    docs = _docs(spark, sf_dir)
    docs.repartition(4).write.parquet(src)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src))
    deduped = (stream
               .select(F.md5(F.coalesce(F.col("text"), F.lit("")))
                       .alias("text_hash"))
               .dropDuplicates(["text_hash"]))

    def _write(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out)

    q = (deduped.writeStream.outputMode("append").foreachBatch(_write)
         .trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination()
    spark.catalog.refreshByPath(out)
    return spark.read.parquet(out)


SQL_STREAM_DEDUP = """
SELECT DISTINCT md5(coalesce(text, '')) AS text_hash FROM documents
"""


INCR_DEDUP_MOD = 10  # doc_id % 10 == 0 -> the "incoming batch"


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental batch-vs-corpus near-dup flagging
    (operators/dedup.py:incremental_near_dup): docs with
    doc_id % 10 == 0 play the incoming batch, the rest the existing
    corpus; capped to the dedup_jaccard doc range so posting lists stay
    bounded on the synthetic vocabulary."""
    from ..operators.dedup import incremental_near_dup
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < JACCARD_MAX_DOC)
    new = d.filter(F.col("doc_id") % INCR_DEDUP_MOD == 0)
    old = d.filter(F.col("doc_id") % INCR_DEDUP_MOD != 0)
    return incremental_near_dup(new, old, threshold=JACCARD_THRESHOLD)


SQL_DEDUP_INCREMENTAL = f"""
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < {JACCARD_MAX_DOC}),
toks AS (
  SELECT DISTINCT doc_id, t.tok
  FROM d, unnest(string_split(coalesce(text, ''), ' ')) AS t(tok)
  WHERE t.tok <> ''
),
nt AS (SELECT * FROM toks WHERE doc_id % {INCR_DEDUP_MOD} = 0),
ot AS (SELECT * FROM toks WHERE doc_id % {INCR_DEDUP_MOD} <> 0),
n_sizes AS (SELECT doc_id, count(*) AS sz_n FROM nt GROUP BY doc_id),
o_sizes AS (SELECT doc_id, count(*) AS sz_o FROM ot GROUP BY doc_id),
inter AS (
  SELECT n.doc_id AS new_id, o.doc_id AS old_id, count(*) AS inter
  FROM nt n JOIN ot o ON n.tok = o.tok
  GROUP BY n.doc_id, o.doc_id
),
scored AS (
  SELECT i.new_id, i.old_id,
         round(cast(i.inter AS DOUBLE) / (ns.sz_n + os.sz_o - i.inter), 6)
           AS jaccard
  FROM inter i
  JOIN n_sizes ns ON i.new_id = ns.doc_id
  JOIN o_sizes os ON i.old_id = os.doc_id
),
best AS (
  SELECT new_id, old_id AS best_match, jaccard AS best_jaccard
  FROM (SELECT *, row_number() OVER (PARTITION BY new_id
                                     ORDER BY jaccard DESC, old_id ASC) AS rnk
        FROM scored)
  WHERE rnk = 1
)
SELECT d.doc_id, b.best_match,
       coalesce(b.best_jaccard, 0.0) AS best_jaccard,
       CAST(coalesce(b.best_jaccard, 0.0) >= {JACCARD_THRESHOLD} AS INT)
         AS is_dup
FROM (SELECT doc_id FROM d WHERE doc_id % {INCR_DEDUP_MOD} = 0) d
LEFT JOIN best b ON d.doc_id = b.new_id
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


def q_rel_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic over the mention surfaces — the naturally
    skewed key in this corpus (operators/skew.py:skew_profile)."""
    from ..operators.skew import skew_profile
    return skew_profile(_mentions_df(spark, sf_dir), "surface")


SQL_REL_SKEW_PROFILE = f"""
WITH {_MENTIONS_CTE},
counts AS (SELECT surface AS key, count(*) AS n_rows
           FROM mentions GROUP BY surface),
total AS (SELECT count(*) AS _total FROM mentions),
top AS (
  SELECT key, n_rows,
         CAST(row_number() OVER (ORDER BY n_rows DESC, key ASC) AS INT)
           AS rank
  FROM counts
  ORDER BY n_rows DESC, key ASC LIMIT 10
)
SELECT t.key, t.n_rows, t.rank,
       CAST(floor((t.n_rows * 1000000) / tt._total) AS BIGINT) AS share_ppm
FROM top t, total tt
"""


def q_rel_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of-version) join: each event looks up the SCD2
    dimension version (rel_scd2) valid AT its timestamp — the
    training-data / feature-store correctness join that prevents
    leakage from future attribute values. Equi-join on the key plus a
    half-open interval predicate; the per-key version list is small, so
    the range conjunct filters a handful of candidate rows after the
    hash join (never a BNL: the equi key carries the join).

    Each event matches EXACTLY one version by construction (the
    intervals partition [first_event_ts, inf) per user), pinned in
    tests/test_agentstats.py."""
    from ..operators.agentstats import scd2_history
    ev = _tbl(spark, sf_dir, "events")
    dim = scd2_history(ev, key_col="user_id", attr_col="event_type",
                       ts_col="ts", tiebreak_col="event_id")
    e = ev.select("event_id", "user_id",
                  F.unix_micros(F.col("ts").cast("timestamp"))
                  .alias("ts_us"))
    return (e.join(dim, (e.user_id == dim.user_id)
                   & (e.ts_us >= dim.eff_from_us)
                   & (dim.eff_to_us.isNull()
                      | (e.ts_us < dim.eff_to_us)))
            .select("event_id", e.user_id.alias("user_id"), "ts_us",
                    F.col("event_type").alias("type_at_ts"), "version",
                    "eff_from_us"))


SQL_REL_PIT_JOIN = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
changes AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
),
dim AS (
  SELECT user_id, event_type,
         epoch_us(ts) AS eff_from_us,
         epoch_us(lead(ts) OVER w) AS eff_to_us,
         CAST(row_number() OVER w AS BIGINT) AS version
  FROM changes
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
       d.event_type AS type_at_ts, d.version, d.eff_from_us
FROM events e
JOIN dim d ON e.user_id = d.user_id
          AND epoch_us(e.ts) >= d.eff_from_us
          AND (d.eff_to_us IS NULL OR epoch_us(e.ts) < d.eff_to_us)
"""


EPISODE_JACCARD = 0.5  # boundary when concept overlap with prev turn < this


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


NDCG_K = 10


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


def q_curation_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic SHARDED round-robin domain interleaving for
    training order (operators/curation.py:interleave_domains), domains
    = source. Global order is shard-major concatenation of per-shard
    interleaved schedules — no global sort in the Spark plan."""
    from ..operators.curation import interleave_domains
    return interleave_domains(_docs(spark, sf_dir), "source")


def _sql_curation_interleave() -> str:
    from ..operators.curation import N_SHARDS
    dig = " + ".join(
        f"(instr('0123456789abcdef', substring(sh, {i + 1}, 1)) - 1) "
        f"* {16 ** (7 - i)}" for i in range(8))
    return f"""
WITH keyed AS (
  SELECT doc_id, source AS domain,
         CAST(({dig}) % {N_SHARDS} AS INT) AS shard,
         md5(cast(doc_id AS VARCHAR) || ':' || coalesce(text, '')) AS k
  FROM (SELECT *, md5(cast(doc_id AS VARCHAR)) AS sh FROM documents) d
),
pos AS (
  SELECT doc_id, domain, shard,
         CAST(row_number() OVER (PARTITION BY shard, domain
                                 ORDER BY k, doc_id) AS BIGINT)
           AS pos_in_domain
  FROM keyed
),
localp AS (
  SELECT doc_id, domain, shard, pos_in_domain,
         CAST(row_number() OVER (PARTITION BY shard
                                 ORDER BY pos_in_domain, domain, doc_id)
              AS BIGINT) AS local_pos
  FROM pos
),
offs AS (
  SELECT shard,
         CAST(coalesce(sum(count(*)) OVER (
                ORDER BY shard ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM keyed GROUP BY shard
)
SELECT l.doc_id, l.domain, l.shard, l.pos_in_domain,
       CAST(o.off + l.local_pos AS BIGINT) AS global_pos
FROM localp l JOIN offs o ON o.shard = l.shard
"""


RESIZE_MAX_SIDE = 32


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize over the media table
    (operators/multimodal.py:resize_media): exact-integer target dims,
    pixel resample stubbed behind the decode seam. Oracle replays the
    md5-derived source dims digit-by-digit and the same integer math."""
    from ..operators.multimodal import attach_fake_media, resize_media
    return resize_media(attach_fake_media(_docs(spark, sf_dir)),
                        max_side=RESIZE_MAX_SIDE)


def _sql_multimodal_resize() -> str:
    digits = ", ".join(
        f"instr('0123456789abcdef', substring(h, {p + 1}, 1)) - 1 AS d{p}"
        for p in range(4))
    return f"""
WITH hx AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image/png'
              WHEN doc_id % 3 = 1 THEN 'audio/wav'
              ELSE 'video/mp4' END AS media_type,
         md5(text) AS h
  FROM documents
),
d AS (SELECT doc_id, media_type, {digits} FROM hx),
dims AS (
  SELECT doc_id, media_type,
         CAST(16 + (16 * d0 + d1) % 64 AS INT) AS width,
         CAST(16 + (16 * d2 + d3) % 64 AS INT) AS height
  FROM d
),
resized AS (
  SELECT *,
         CAST(greatest(1, (width * least({RESIZE_MAX_SIDE},
                                         greatest(width, height)))
                          // greatest(width, height)) AS INT) AS out_w,
         CAST(greatest(1, (height * least({RESIZE_MAX_SIDE},
                                          greatest(width, height)))
                          // greatest(width, height)) AS INT) AS out_h
  FROM dims
)
SELECT doc_id, media_type, width, height, out_w, out_h,
       md5(cast(doc_id AS VARCHAR) || ':' || cast(out_w AS VARCHAR)
           || ':' || cast(out_h AS VARCHAR)) AS resized_fp
FROM resized
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

def _comention_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concept co-occurrence edges (pairs tagged in the same turn) —
    shared by q_kg_triangles-style graph analytics."""
    tags = (_mentions_df(spark, sf_dir)
            .select("conv_id", "turn_idx", "concept_id").distinct())
    a = tags.alias("ta")
    b = tags.alias("tb")
    return (a.join(b, (F.col("ta.conv_id") == F.col("tb.conv_id"))
                   & (F.col("ta.turn_idx") == F.col("tb.turn_idx"))
                   & (F.col("ta.concept_id") < F.col("tb.concept_id")))
            .select(F.col("ta.concept_id").alias("src"),
                    F.col("tb.concept_id").alias("dst")))


def q_kg_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per concept over the co-mention
    graph (operators/graph.py:clustering_coefficient) — exact-integer
    ppm; which concepts sit in tight co-mention cliques vs stars."""
    from ..operators.graph import clustering_coefficient
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


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ontology-aware semantic dedup: cluster turns by their exact
    linked-concept set (operators/dedup.py:semantic_fingerprint_dedup)
    — duplicates by WHAT is discussed, not by surface text."""
    from ..operators.dedup import semantic_fingerprint_dedup
    tags = (_mentions_df(spark, sf_dir)
            .select("conv_id", "turn_idx", "concept_id").distinct())
    return semantic_fingerprint_dedup(tags)


SQL_DEDUP_SEMANTIC = f"""
WITH {_MENTIONS_CTE},
tags AS (SELECT DISTINCT conv_id, turn_idx, concept_id FROM mentions),
per_unit AS (
  SELECT conv_id || ':' || CAST(turn_idx AS VARCHAR) AS unit,
         string_agg(concept_id, ',' ORDER BY concept_id) AS fingerprint,
         count(*) AS set_size
  FROM tags GROUP BY conv_id, turn_idx
)
SELECT fingerprint,
       CAST(max(set_size) AS BIGINT) AS set_size,
       count(*) AS n_units,
       min(unit) AS keeper
FROM per_unit GROUP BY fingerprint
"""


def q_rel_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the events stream: earliest view,
    first click strictly after it, first purchase strictly after that —
    per-step user counts + exact-integer conversion ratios. All steps
    are keyed equi-joins + hash aggs on user_id (map-side partial);
    the final combine is a grouping-free Aggregate (exactly one row),
    so no window and nothing partitionless touches unbounded data."""
    e = _tbl(spark, sf_dir, "events")
    v = (e.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t1")))
    c = (e.filter(F.col("event_type") == "click")
         .join(v, "user_id")
         .filter(F.col("ts") > F.col("t1"))
         .groupBy("user_id").agg(F.min("ts").alias("t2")))
    p = (e.filter(F.col("event_type") == "purchase")
         .join(c, "user_id")
         .filter(F.col("ts") > F.col("t2"))
         .groupBy("user_id").agg(F.min("ts").alias("t3")))
    funnel = (v.join(c.select("user_id", "t2"), "user_id", "left")
              .join(p.select("user_id", "t3"), "user_id", "left")
              .agg(F.count("t1").alias("n_view"),
                   F.count("t2").alias("n_click"),
                   F.count("t3").alias("n_purchase")))
    return funnel.select(
        "n_view", "n_click", "n_purchase",
        F.expr("CASE WHEN n_view > 0 THEN (n_click * 1000000) DIV n_view"
               " ELSE 0 END").cast("long").alias("click_conv_ppm"),
        F.expr("CASE WHEN n_click > 0 THEN (n_purchase * 1000000) DIV"
               " n_click ELSE 0 END").cast("long").alias("purchase_conv_ppm"),
        F.expr("CASE WHEN n_view > 0 THEN (n_purchase * 1000000) DIV n_view"
               " ELSE 0 END").cast("long").alias("overall_conv_ppm"))


SQL_REL_FUNNEL = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
),
j AS (
  SELECT v.user_id, v.t1, c.t2, p.t3
  FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
),
agg AS (
  SELECT count(t1) AS n_view, count(t2) AS n_click,
         count(t3) AS n_purchase
  FROM j
)
SELECT n_view, n_click, n_purchase,
       CAST(CASE WHEN n_view > 0 THEN (n_click * 1000000) // n_view
                 ELSE 0 END AS BIGINT) AS click_conv_ppm,
       CAST(CASE WHEN n_click > 0 THEN (n_purchase * 1000000) // n_click
                 ELSE 0 END AS BIGINT) AS purchase_conv_ppm,
       CAST(CASE WHEN n_view > 0 THEN (n_purchase * 1000000) // n_view
                 ELSE 0 END AS BIGINT) AS overall_conv_ppm
FROM agg
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
    from ..operators.graph import concept_jaccard
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
    from ..operators.graph import resnik_mics
    from .driver_ontology import driver_ancestors
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


def q_rel_window_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window distribution functions per nation: rank, quartile
    (ntile), and exact-integer percent-rank / cume-dist in ppm over
    customers ordered by balance. The ordering key is made total with
    the custkey tiebreak, so pct/cume reduce to pure rank arithmetic —
    identical BIGINT math on both engines, no float window funcs. All
    windows are PARTITIONED BY nation (bounded per key)."""
    c = _tbl(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    wn = Window.partitionBy("c_nationkey")
    return (c.select("c_custkey", "c_nationkey", "c_acctbal")
            .withColumn("rnk", F.row_number().over(w))
            .withColumn("n", F.count(F.lit(1)).over(wn))
            .withColumn("quartile", F.ntile(4).over(w))
            .select("c_custkey", "c_nationkey", "c_acctbal",
                    F.col("rnk").cast("long").alias("rnk"),
                    F.col("quartile").cast("long").alias("quartile"),
                    F.expr("CASE WHEN n > 1 THEN (rnk - 1) * 1000000"
                           " DIV (n - 1) ELSE 0 END").cast("long")
                    .alias("pct_rank_ppm"),
                    F.expr("rnk * 1000000 DIV n").cast("long")
                    .alias("cume_ppm")))


SQL_REL_WINDOW_DIST = """
WITH r AS (
  SELECT c_custkey, c_nationkey, c_acctbal,
         row_number() OVER w AS rnk,
         count(*) OVER (PARTITION BY c_nationkey) AS n,
         ntile(4) OVER w AS quartile
  FROM customer
  WINDOW w AS (PARTITION BY c_nationkey
               ORDER BY c_acctbal DESC, c_custkey ASC)
)
SELECT c_custkey, c_nationkey, c_acctbal,
       CAST(rnk AS BIGINT) AS rnk,
       CAST(quartile AS BIGINT) AS quartile,
       CAST(CASE WHEN n > 1 THEN (rnk - 1) * 1000000 // (n - 1)
                 ELSE 0 END AS BIGINT) AS pct_rank_ppm,
       CAST(rnk * 1000000 // n AS BIGINT) AS cume_ppm
FROM r
"""


def q_rel_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert histogram for the view->click->purchase funnel:
    per-user end-to-end latency in 10-minute bands (capped at 48),
    band counts, and the cumulative converted share in exact ppm. The
    cumulative window is partitionless BUT runs after orderBy+limit
    over the band table (<= 49 rows by construction) — the
    GlobalLimit proves the input bounded, same shape the repo-wide
    plan gate requires."""
    e = _tbl(spark, sf_dir, "events")
    v = (e.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t1")))
    c = (e.filter(F.col("event_type") == "click")
         .join(v, "user_id").filter(F.col("ts") > F.col("t1"))
         .groupBy("user_id").agg(F.min("ts").alias("t2"),
                                 F.first("t1").alias("t1")))
    p = (e.filter(F.col("event_type") == "purchase")
         .join(c, "user_id").filter(F.col("ts") > F.col("t2"))
         .groupBy("user_id").agg(F.min("ts").alias("t3"),
                                 F.first("t1").alias("t1")))
    lat = p.select(
        (F.unix_timestamp("t3") - F.unix_timestamp("t1")).alias("secs"))
    bands = (lat.select(F.least(F.expr("secs DIV 600"), F.lit(48))
                        .cast("int").alias("band"))
             .groupBy("band").agg(F.count(F.lit(1)).alias("n_users"))
             .orderBy("band").limit(49))
    wcum = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    total = bands.agg(F.sum("n_users").alias("total"))
    return (bands
            .withColumn("cum_users", F.sum("n_users").over(wcum))
            .crossJoin(F.broadcast(total))
            .select("band", "n_users",
                    F.col("cum_users").cast("long").alias("cum_users"),
                    F.expr("cum_users * 1000000 DIV total").cast("long")
                    .alias("cum_share_ppm")))


SQL_REL_FUNNEL_LATENCY = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2, any_value(v.t1) AS t1
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3, any_value(c.t1) AS t1
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
),
bands AS (
  SELECT least(CAST(epoch(t3) - epoch(t1) AS BIGINT) // 600, 48) AS band,
         count(*) AS n_users
  FROM p GROUP BY 1
),
tot AS (SELECT sum(n_users) AS total FROM bands)
SELECT CAST(band AS INTEGER) AS band, n_users,
       CAST(sum(n_users) OVER (ORDER BY band
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users,
       CAST(sum(n_users) OVER (ORDER BY band ROWS UNBOUNDED PRECEDING)
            * 1000000 // total AS BIGINT) AS cum_share_ppm
FROM bands, tot
"""


def q_rel_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    retained share at each week offset in exact ppm — the standard
    cohort triangle. Two hash aggs + one broadcast-able join on the
    cohort key; window-free, shuffle keys are (user) then
    (cohort_week, offset)."""
    e = _tbl(spark, sf_dir, "events")
    wk = (F.floor(F.unix_timestamp("ts") / (7 * 86400))).cast("long")
    act = (e.select("user_id", wk.alias("week")).distinct())
    first = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size"))
    ret = (act.join(first, "user_id")
           .groupBy("cohort_week",
                    (F.col("week") - F.col("cohort_week"))
                    .cast("int").alias("week_offset"))
           .agg(F.count(F.lit(1)).alias("n_active")))
    return (ret.join(F.broadcast(sizes), "cohort_week")
            .select("cohort_week", "week_offset", "n_active",
                    "cohort_size",
                    F.expr("n_active * 1000000 DIV cohort_size")
                    .cast("long").alias("retained_ppm")))


SQL_REL_RETENTION = """
WITH act AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week
  FROM events
),
first AS (
  SELECT user_id, min(week) AS cohort_week FROM act GROUP BY user_id
),
sizes AS (
  SELECT cohort_week, count(*) AS cohort_size FROM first GROUP BY 1
),
ret AS (
  SELECT f.cohort_week,
         CAST(a.week - f.cohort_week AS INTEGER) AS week_offset,
         count(*) AS n_active
  FROM act a JOIN first f USING (user_id)
  GROUP BY 1, 2
)
SELECT r.cohort_week, r.week_offset, r.n_active, s.cohort_size,
       CAST(r.n_active * 1000000 // s.cohort_size AS BIGINT)
         AS retained_ppm
FROM ret r JOIN sizes s USING (cohort_week)
"""


def q_curation_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights against the English slice as the
    target distribution (operators/curation.py:dsir_importance) —
    fixed-point likelihood-ratio scoring of every raw document."""
    from ..operators.curation import dsir_importance
    d = _docs(spark, sf_dir).withColumn(
        "is_en", (F.col("lang") == "en").cast("int"))
    return dsir_importance(d, "is_en")


SQL_CURATION_DSIR = """
WITH tokd AS (
  SELECT doc_id, CAST(lang = 'en' AS INTEGER) AS is_target,
         unnest(list_filter(string_split_regex(lower(coalesce(text, '')),
                                               '\\s+'),
                            t -> t <> '')) AS tok
  FROM documents
),
stream AS (
  SELECT doc_id, is_target,
         (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
         + strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1 AS bucket
  FROM tokd
),
counts AS (
  SELECT bucket, count(*) AS raw_cnt, sum(is_target) AS tgt_cnt
  FROM stream GROUP BY 1
),
totals AS (
  SELECT sum(raw_cnt) AS raw_total, sum(tgt_cnt) AS tgt_total FROM counts
),
ratios AS (
  SELECT bucket,
         CAST(((tgt_cnt + 1) * 1000000 // (raw_cnt + 1))
              * (raw_total + 256) // (tgt_total + 256) AS BIGINT)
           AS ratio_ppm
  FROM counts, totals
)
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(max(s.is_target) AS INTEGER) AS is_target,
       CAST(sum(r.ratio_ppm) // count(*) AS BIGINT) AS dsir_score_ppm
FROM stream s JOIN ratios r USING (bucket)
GROUP BY s.doc_id
"""


def q_text_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per document
    (operators/textstats.py:lexical_diversity): type-token and hapax
    ratios in exact ppm."""
    from ..operators.textstats import lexical_diversity
    return lexical_diversity(_docs(spark, sf_dir))


SQL_TEXT_TTR = """
WITH per_tok AS (
  SELECT doc_id, tok, count(*) AS n FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(coalesce(text, '')),
                                                 '\\s+'),
                              t -> t <> '')) AS tok
    FROM documents)
  GROUP BY 1, 2
),
per_doc AS (
  SELECT doc_id, sum(n) AS n_tokens, count(*) AS n_types,
         sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS n_hapax
  FROM per_tok GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(p.n_types, 0) AS BIGINT) AS n_types,
       CAST(coalesce(p.n_hapax, 0) AS BIGINT) AS n_hapax,
       CAST(CASE WHEN coalesce(p.n_tokens, 0) > 0
                 THEN p.n_types * 1000000 // p.n_tokens
                 ELSE 0 END AS BIGINT) AS ttr_ppm,
       CAST(CASE WHEN coalesce(p.n_tokens, 0) > 0
                 THEN p.n_hapax * 1000000 // p.n_tokens
                 ELSE 0 END AS BIGINT) AS hapax_ppm
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Late-r4 wave 2: boilerplate removal, k-core, vocabulary build,
# cross-source overlap.
# ---------------------------------------------------------------------------

BOILER_SEG_WORDS = 3
BOILER_DF_CAP = 5


def q_text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style duplicated-segment (boilerplate) removal
    (operators/dedup.py:boilerplate_segments) — drop from every document
    the fixed-width token segments that occur verbatim in more than
    df_cap distinct documents. The hot-segment set is small by
    construction and broadcast anti-joined, so the corpus shuffles on
    the segment key exactly once (the df agg)."""
    from ..operators.dedup import boilerplate_segments
    return boilerplate_segments(_docs(spark, sf_dir),
                                seg_words=BOILER_SEG_WORDS,
                                df_cap=BOILER_DF_CAP)


SQL_TEXT_BOILERPLATE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'),
                     t -> t <> '') AS tk
  FROM documents
),
segs AS (
  SELECT doc_id, r.i AS pos,
         list_aggregate(tk[r.i * {BOILER_SEG_WORDS} + 1 :
                           r.i * {BOILER_SEG_WORDS} + {BOILER_SEG_WORDS}],
                        'string_agg', ' ') AS seg
  FROM toks, lateral unnest(
    range(0, greatest(len(tk) - 1, 0) // {BOILER_SEG_WORDS} + 1)) AS r(i)
  WHERE len(tk) > 0
),
hot AS (
  SELECT seg FROM (SELECT DISTINCT doc_id, seg FROM segs)
  GROUP BY seg HAVING count(*) > {BOILER_DF_CAP}
),
kept AS (
  SELECT s.doc_id,
         count(*) AS n_kept,
         coalesce(string_agg(s.seg, ' ' ORDER BY s.pos), '') AS clean_text
  FROM segs s ANTI JOIN hot h ON s.seg = h.seg
  GROUP BY s.doc_id
),
totals AS (SELECT doc_id, count(*) AS n_segs FROM segs GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(t.n_segs, 0) AS BIGINT) AS n_segs,
       CAST(coalesce(t.n_segs, 0) - coalesce(k.n_kept, 0) AS BIGINT)
         AS n_dropped,
       coalesce(k.clean_text, '') AS clean_text,
       CAST(length(coalesce(k.clean_text, '')) AS BIGINT) AS clean_chars
FROM documents d
LEFT JOIN totals t USING (doc_id)
LEFT JOIN kept k USING (doc_id)
"""


KCORE_K = 20
KCORE_ROUNDS = 6


def q_kg_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round k-core decomposition of the KG
    (operators/graph.py:kcore_peel) — the density skeleton separating
    the connected conceptual core from pendant turns. Six synchronous
    peeling rounds, fixpoint-within-rounds pytest-pinned on every test
    corpus; the oracle replays the identical unrolled rounds so the
    pairing is exact whether or not peeling has converged."""
    from ..operators.graph import kcore_peel
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


VOCAB_TOP = 200


def q_text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary build: the top-200 tokens by frequency with
    rank and CUMULATIVE corpus-coverage share in exact ppm — the first
    artifact of any tokenizer/vocab pipeline (what fraction of the
    token stream the top-k vocabulary explains). One map-side-partial
    hash agg over the exploded token stream; the global order is
    orderBy+limit (TakeOrdered, parallel), and the running sum ranks
    AFTER the GlobalLimit, so the partitionless window only ever sees
    the 200-row result — the bounded-input shape the repo plan gate
    requires. Corpus total is a lazy one-row aggregate, broadcast by
    construction."""
    toks = F.filter(F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))),
                            r"\s+"),
                    lambda t: t != "")
    counts = (_docs(spark, sf_dir)
              .select(F.explode(toks).alias("tok"))
              .groupBy("tok").agg(F.count(F.lit(1)).alias("n")))
    top = counts.orderBy(F.desc("n"), F.asc("tok")).limit(VOCAB_TOP)
    total = counts.agg(F.sum("n").alias("total_toks"))
    w = Window.orderBy(F.desc("n"), F.asc("tok")) \
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (top.crossJoin(F.broadcast(total))
            .withColumn("cum_n", F.sum("n").over(w))
            .select("tok", F.col("n").cast("long").alias("n"),
                    F.row_number().over(
                        Window.orderBy(F.desc("n"), F.asc("tok")))
                    .cast("long").alias("rank"),
                    F.expr("cum_n * 1000000L DIV total_toks")
                    .cast("long").alias("cum_share_ppm")))


SQL_TEXT_VOCAB = f"""
WITH counts AS (
  SELECT tok, count(*) AS n FROM (
    SELECT unnest(list_filter(
             string_split_regex(lower(coalesce(text, '')), '\\s+'),
             t -> t <> '')) AS tok
    FROM documents)
  GROUP BY tok
),
total AS (SELECT sum(n) AS total_toks FROM counts),
top AS (SELECT tok, n FROM counts ORDER BY n DESC, tok LIMIT {VOCAB_TOP})
SELECT tok, CAST(n AS BIGINT) AS n,
       CAST(row_number() OVER (ORDER BY n DESC, tok) AS BIGINT) AS rank,
       CAST(sum(n) OVER (ORDER BY n DESC, tok
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            * 1000000 // t.total_toks AS BIGINT) AS cum_share_ppm
FROM top, total t
"""


OVERLAP_SHINGLE = 3


def q_text_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: pairwise token-shingle
    Jaccard between every pair of corpus sources — the audit that
    catches one crawl slice being a mirror of another before both are
    upsampled into a training mix. Scale shape: the corpus collapses to
    DISTINCT (source, shingle) FIRST (one map-side-partial agg), so the
    shingle posting list is bounded by the number of SOURCES (tens),
    never by document count — the self-join fan-out per shingle is at
    most C(n_sources, 2) and the pair agg key space is n_sources²."""
    toks = F.filter(F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))),
                            r"\s+"),
                    lambda t: t != "")
    sh = (_docs(spark, sf_dir)
          .select("source", toks.alias("tk"))
          .where(F.size("tk") >= OVERLAP_SHINGLE)
          .select("source", F.explode(F.expr(
              f"transform(sequence(1, size(tk) - {OVERLAP_SHINGLE} + 1),"
              f" i -> concat_ws(' ', slice(tk, i, {OVERLAP_SHINGLE})))"))
              .alias("shingle"))
          .distinct())
    per_src = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("source").alias("source_a"), "shingle")
    b = sh.select(F.col("source").alias("source_b"), "shingle")
    common = (a.join(b, "shingle")
              .where(F.col("source_a") < F.col("source_b"))
              .groupBy("source_a", "source_b")
              .agg(F.count(F.lit(1)).alias("n_common")))
    pa = per_src.select(F.col("source").alias("source_a"),
                        F.col("n_sh").alias("n_a"))
    pb = per_src.select(F.col("source").alias("source_b"),
                        F.col("n_sh").alias("n_b"))
    return (common.join(F.broadcast(pa), "source_a")
            .join(F.broadcast(pb), "source_b")
            .select("source_a", "source_b",
                    F.col("n_a").cast("long").alias("n_a"),
                    F.col("n_b").cast("long").alias("n_b"),
                    F.col("n_common").cast("long").alias("n_common"),
                    F.expr("n_common * 1000000L DIV"
                           " (n_a + n_b - n_common)")
                    .cast("long").alias("jaccard_ppm")))


SQL_TEXT_SOURCE_OVERLAP = f"""
WITH sh AS (
  SELECT DISTINCT source,
         list_aggregate(tk[i : i + {OVERLAP_SHINGLE} - 1],
                        'string_agg', ' ') AS shingle
  FROM (SELECT source,
               list_filter(string_split_regex(lower(coalesce(text, '')),
                                              '\\s+'),
                           t -> t <> '') AS tk
        FROM documents),
       lateral unnest(range(1, len(tk) - {OVERLAP_SHINGLE} + 2)) AS r(i)
  WHERE len(tk) >= {OVERLAP_SHINGLE}
),
per_src AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY source),
common AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
  GROUP BY 1, 2
)
SELECT c.source_a, c.source_b,
       CAST(pa.n_sh AS BIGINT) AS n_a,
       CAST(pb.n_sh AS BIGINT) AS n_b,
       CAST(c.n_common AS BIGINT) AS n_common,
       CAST(c.n_common * 1000000 // (pa.n_sh + pb.n_sh - c.n_common)
            AS BIGINT) AS jaccard_ppm
FROM common c
JOIN per_src pa ON pa.source = c.source_a
JOIN per_src pb ON pb.source = c.source_b
"""


ATTRITION_MIN_TOKENS = 20
ATTRITION_LANG = "en"
ATTRITION_MAX_TOK_SHARE_PPM = 150_000
ATTRITION_MIN_TTR_PPM = 500_000


def q_curation_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential quality-filter funnel with per-rule attrition
    accounting (operators/curation.py:filter_attrition) — the
    RefinedWeb/Dolma-style drop report: min-tokens, language,
    repetition, diversity, each document charged to the FIRST rule it
    fails. One signal pass + one grouping-free Aggregate; constant-size
    output."""
    from ..operators.curation import filter_attrition
    return filter_attrition(_docs(spark, sf_dir),
                            min_tokens=ATTRITION_MIN_TOKENS,
                            allowed_lang=ATTRITION_LANG,
                            max_tok_share_ppm=ATTRITION_MAX_TOK_SHARE_PPM,
                            min_ttr_ppm=ATTRITION_MIN_TTR_PPM)


SQL_CURATION_ATTRITION = f"""
WITH per_tok AS (
  SELECT doc_id, tok, count(*) AS n FROM (
    SELECT doc_id,
           unnest(list_filter(
             string_split_regex(lower(coalesce(text, '')), '\\s+'),
             t -> t <> '')) AS tok
    FROM documents)
  GROUP BY 1, 2
),
sig AS (
  SELECT d.lang,
         coalesce(sum(p.n), 0) AS n_toks,
         coalesce(count(p.tok), 0) AS n_types,
         coalesce(max(p.n), 0) AS max_n
  FROM documents d LEFT JOIN per_tok p USING (doc_id)
  GROUP BY d.doc_id, d.lang
),
flags AS (
  SELECT n_toks >= {ATTRITION_MIN_TOKENS} AS p1,
         lang = '{ATTRITION_LANG}' AS p2,
         CASE WHEN n_toks > 0 THEN max_n * 1000000 // n_toks
              ELSE NULL END <= {ATTRITION_MAX_TOK_SHARE_PPM} AS p3,
         CASE WHEN n_toks > 0 THEN n_types * 1000000 // n_toks
              ELSE NULL END >= {ATTRITION_MIN_TTR_PPM} AS p4
  FROM sig
),
agg AS (
  SELECT count(*) AS n0,
         coalesce(sum(CASE WHEN NOT p1 THEN 1 ELSE 0 END), 0) AS d1,
         coalesce(sum(CASE WHEN p1 AND NOT p2 THEN 1 ELSE 0 END), 0) AS d2,
         coalesce(sum(CASE WHEN p1 AND p2 AND NOT p3 THEN 1 ELSE 0 END),
                  0) AS d3,
         coalesce(sum(CASE WHEN p1 AND p2 AND p3 AND NOT p4
                           THEN 1 ELSE 0 END), 0) AS d4
  FROM flags
),
rows_ AS (
  SELECT 1 AS stage, 'min_tokens' AS rule, n0 AS n_in, d1 AS n_dropped
    FROM agg
  UNION ALL SELECT 2, 'language', n0 - d1, d2 FROM agg
  UNION ALL SELECT 3, 'repetition', n0 - d1 - d2, d3 FROM agg
  UNION ALL SELECT 4, 'diversity', n0 - d1 - d2 - d3, d4 FROM agg
  UNION ALL SELECT 5, 'survived', n0 - d1 - d2 - d3 - d4, 0 FROM agg
)
SELECT CAST(stage AS BIGINT) AS stage, rule,
       CAST(n_in AS BIGINT) AS n_in,
       CAST(n_dropped AS BIGINT) AS n_dropped,
       CAST(n_in - n_dropped AS BIGINT) AS n_out,
       CAST(CASE WHEN n_in > 0 THEN n_dropped * 1000000 // n_in
                 ELSE 0 END AS BIGINT) AS drop_ppm
FROM rows_
"""


KMEANS_K = 8
KMEANS_ITERS = 2
KMEANS_DIM = 64


def q_sim_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact-integer Lloyd k-means over the quantized
    embedding table (operators/simsearch.py:kmeans_lloyd_exact) — the
    IVF coarse-quantizer training step as pure DataFrame algebra,
    bit-identical on any engine/partitioning. Two synchronous updates
    + final assignment; the oracle replays the identical unrolled
    rounds."""
    from ..operators.simsearch import kmeans_lloyd_exact, \
        quantize_embeddings
    qz = quantize_embeddings(_tbl(spark, sf_dir, "embeddings"))
    return kmeans_lloyd_exact(qz, k=KMEANS_K, iters=KMEANS_ITERS)


def _sql_kmeans_dist() -> str:
    """Integer squared-L2 between q8 row alias ``v`` and centroid
    alias ``c`` — shared by the kmeans and silhouette oracles."""
    return (f"CAST(list_sum(list_transform(range(1, {KMEANS_DIM + 1}),"
            f" i -> CAST(v.qvec[i] - c.cvec[i] AS BIGINT)"
            f" * (v.qvec[i] - c.cvec[i]))) AS BIGINT)")


def _sql_kmeans_ctes() -> tuple[str, str]:
    """The unrolled-Lloyd CTE block (quantize → seed → KMEANS_ITERS
    synchronous updates). Returns (with_body, final_centroid_cte) so
    both the kmeans and silhouette oracles replay the identical
    training."""
    k, dim = KMEANS_K, KMEANS_DIM
    dist = _sql_kmeans_dist()
    rounds = []
    prev = "c0"
    for i in range(1, KMEANS_ITERS + 1):
        rounds.append(f"""a{i} AS MATERIALIZED (
  SELECT v.vec_id, c.cid AS cluster, {dist} AS sq
  FROM q8 v, {prev} c
  QUALIFY row_number() OVER (PARTITION BY v.vec_id
                             ORDER BY sq, c.cid) = 1),
sums{i} AS (
  SELECT a.cluster, r.i AS pos, sum(v.qvec[r.i]) AS s, count(*) AS n
  FROM a{i} a JOIN q8 v USING (vec_id),
       lateral unnest(range(1, {dim + 1})) AS r(i)
  GROUP BY 1, 2),
newc{i} AS (
  SELECT cluster AS cid,
         list(CAST((s + 127 * n) // n - 127 AS INT) ORDER BY pos) AS cvec
  FROM sums{i} GROUP BY cluster),
c{i} AS MATERIALIZED (
  SELECT c.cid, coalesce(n.cvec, c.cvec) AS cvec
  FROM {prev} c LEFT JOIN newc{i} n USING (cid))""")
        prev = f"c{i}"
    body = f"""q8 AS MATERIALIZED (
  SELECT vec_id,
         CASE WHEN ma = 0 THEN list_transform(d, x -> 0)
              ELSE list_transform(d, x -> CAST(round(x * 127.0 / ma, 0)
                                               AS INT))
         END AS qvec
  FROM (SELECT vec_id, d,
               list_max(list_transform(d, x -> abs(x))) AS ma
        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS d
              FROM embeddings))),
c0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY vec_id) AS cid, qvec AS cvec
  FROM (SELECT vec_id, qvec FROM q8 ORDER BY vec_id LIMIT {k})),
{', '.join(rounds)}"""
    return body, prev


def _sql_sim_kmeans() -> str:
    body, prev = _sql_kmeans_ctes()
    dist = _sql_kmeans_dist()
    return f"""
WITH {body}
SELECT v.vec_id, c.cid AS cluster, {dist} AS sq_dist
FROM q8 v, {prev} c
QUALIFY row_number() OVER (PARTITION BY v.vec_id
                           ORDER BY sq_dist, c.cid) = 1
"""


CHUNK_TOKENS = 16
CHUNK_STRIDE = 12


def q_curation_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking for embedding/RAG prep
    (operators/curation.py:chunk_documents) — 16-token chunks every 12
    tokens, short tail kept. Pure map: JVM array HOFs + one explode, no
    shuffle anywhere in the plan."""
    from ..operators.curation import chunk_documents
    return chunk_documents(_docs(spark, sf_dir),
                           chunk_tokens=CHUNK_TOKENS, stride=CHUNK_STRIDE)


SQL_CURATION_CHUNKS = f"""
WITH base AS (
  SELECT doc_id, tk, len(tk) AS n,
         CASE WHEN len(tk) = 0 THEN 0
              WHEN len(tk) <= {CHUNK_TOKENS} THEN 1
              ELSE (len(tk) - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1)
                   // {CHUNK_STRIDE} + 1 END AS nc
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(coalesce(text, '')),
                                              '\\s+'),
                           t -> t <> '') AS tk
        FROM documents)
)
SELECT doc_id,
       CAST(r.c AS BIGINT) AS chunk_idx,
       CAST(r.c * {CHUNK_STRIDE} + 1 AS BIGINT) AS tok_from,
       CAST(least(r.c * {CHUNK_STRIDE} + {CHUNK_TOKENS}, n) AS BIGINT)
         AS tok_to,
       list_aggregate(tk[r.c * {CHUNK_STRIDE} + 1 :
                         r.c * {CHUNK_STRIDE} + {CHUNK_TOKENS}],
                      'string_agg', ' ') AS chunk
FROM base, lateral unnest(range(0, nc)) AS r(c)
"""


PHASH_MAX_HAMMING = 24


def q_multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup over media payloads
    (operators/multimodal.py:phash_media +
    operators/dedup.py:simhash_near_pairs_chunks): 64-bit pHash from
    the deterministic stub decode, pigeonhole candidate join on equal
    16-bit chunks, exact hamming verify on candidates only. With a real
    codec the pixels become an 8x8 grayscale downsample behind the same
    seam; the join shape is unchanged. The demo threshold (24) is set
    where the synthetic corpus has signal — the stub's pixels are
    hash-noise, so truly-near payloads only exist as exact duplicates
    (hamming 0, present at sf0.1)."""
    from ..operators.dedup import simhash_near_pairs_chunks
    from ..operators.multimodal import attach_fake_media, phash_media
    chunks = phash_media(attach_fake_media(_docs(spark, sf_dir)))
    return simhash_near_pairs_chunks(chunks,
                                     max_hamming=PHASH_MAX_HAMMING)


def _sql_multimodal_phash() -> str:
    # pixel p (0..63) = byte p%8 of md5(text || chr(p//8 + 1)); byte b
    # is hex digits 2b, 2b+1. Decode each digit via instr like the
    # portable simhash oracle.
    px_cols = []
    for k in range(1, 9):
        px_cols.append(f"md5(coalesce(text, '') || chr({k})) AS h{k}")
    px_exprs = []
    for p in range(64):
        h = f"h{p // 8 + 1}"
        j = (p % 8) * 2
        px_exprs.append(
            f"((instr('0123456789abcdef', substring({h}, {j + 1}, 1)) - 1)"
            f" * 16 +"
            f" instr('0123456789abcdef', substring({h}, {j + 2}, 1)) - 1)"
            f" AS p{p}")
    total = " + ".join(f"p{p}" for p in range(64))
    chunk_exprs = []
    for i in range(4):
        terms = " + ".join(
            f"CASE WHEN p{i * 16 + j} * 64 > total"
            f" THEN {1 << j} ELSE 0 END" for j in range(16))
        chunk_exprs.append(f"CAST({terms} AS INT) AS c{i}")
    return f"""
WITH hx AS MATERIALIZED (
  SELECT doc_id, {', '.join(px_cols)} FROM documents),
px AS MATERIALIZED (
  SELECT doc_id, {', '.join(px_exprs)} FROM hx),
tot AS (SELECT *, {total} AS total FROM px),
ch AS MATERIALIZED (
  SELECT doc_id, {', '.join(chunk_exprs)} FROM tot),
bands AS (
  SELECT doc_id, c0, c1, c2, c3, r.i AS chunk_idx,
         CASE r.i WHEN 0 THEN c0 WHEN 1 THEN c1
                  WHEN 2 THEN c2 ELSE c3 END AS chunk
  FROM ch, lateral unnest(range(0, 4)) AS r(i)),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.c0 AS a0, a.c1 AS a1, a.c2 AS a2, a.c3 AS a3,
         b.c0 AS b0, b.c1 AS b1, b.c2 AS b2, b.c3 AS b3
  FROM bands a JOIN bands b
    ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk
   AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(a0, b0)) + bit_count(xor(a1, b1))
            + bit_count(xor(a2, b2)) + bit_count(xor(a3, b3)) AS INT)
         AS hamming
FROM pairs
WHERE bit_count(xor(a0, b0)) + bit_count(xor(a1, b1))
      + bit_count(xor(a2, b2)) + bit_count(xor(a3, b3))
      <= {PHASH_MAX_HAMMING}
"""


def q_stream_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming curation-quality monitor: the filter-attrition funnel
    maintained incrementally over a document file-stream (4 forced
    micro-batches). Each foreachBatch computes the batch's first-fail
    counts (operators/curation.py:attrition_counts — per-document
    attribution is batch-local, so partial counts are exactly additive)
    and appends the one-row delta to a sink; the drained deltas sum to
    the whole-corpus counts and feed the same report builder as the
    batch operator — so streaming ≡ batch is not just pinned in pytest,
    it is what the oracle pairing itself verifies (same SQL as
    curation_attrition)."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    from ..operators.curation import (attrition_counts, attrition_report)
    sfx = f"{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}"
    out = _os.path.join(_tempfile.gettempdir(),
                        f"stream_attr_{sfx}.parquet")
    ckpt = _os.path.join(_tempfile.gettempdir(), f"stream_attr_{sfx}_ckpt")
    src = _os.path.join(_tempfile.gettempdir(), f"stream_attr_{sfx}_src")
    for d in (out, ckpt, src):
        _shutil.rmtree(d, ignore_errors=True)
    docs = _docs(spark, sf_dir)
    docs.repartition(4).write.parquet(src)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src))

    def _write(batch_df: DataFrame, _batch_id: int) -> None:
        (attrition_counts(batch_df,
                          min_tokens=ATTRITION_MIN_TOKENS,
                          allowed_lang=ATTRITION_LANG,
                          max_tok_share_ppm=ATTRITION_MAX_TOK_SHARE_PPM,
                          min_ttr_ppm=ATTRITION_MIN_TTR_PPM)
         .write.mode("append").parquet(out))

    q = (stream.writeStream.outputMode("append").foreachBatch(_write)
         .trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination()
    spark.catalog.refreshByPath(out)
    deltas = spark.read.parquet(out)
    total = deltas.agg(*[F.sum(c).alias(c)
                         for c in ("n0", "d1", "d2", "d3", "d4")])
    return attrition_report(total)


def q_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC upsert: four update batches (batch b carries a new
    version ver=b of every document with doc_id % 4 >= b) drain through
    foreachBatch into the storage adapter's generic last-writer-wins
    MERGE (sources/storage.py:upsert_latest — real MERGE INTO on
    Iceberg, union + per-key argmax + crash-safe staged swap on
    parquet). The winner is decided by the version COLUMN, not arrival
    order, so the drained table is deterministic whatever order the
    files trigger in: doc residue r saw versions 0..r, hence its final
    row is ver = doc_id % 4. The oracle states exactly that closed
    form — pairing pins MERGE semantics end-to-end through a real
    stream."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    from ..sources.storage import Storage
    sfx = f"{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}"
    root = _os.path.join(_tempfile.gettempdir(), f"stream_ups_{sfx}")
    ckpt = _os.path.join(root, "ckpt")
    src = _os.path.join(root, "src")
    tbl = _os.path.join(root, "tables")
    _shutil.rmtree(root, ignore_errors=True)
    _os.makedirs(src)
    _os.makedirs(tbl)
    docs = _docs(spark, sf_dir)
    for b in range(4):
        batch = (docs.where(F.col("doc_id") % 4 >= b)
                 .select("doc_id", F.lit(b).cast("long").alias("ver"),
                         (F.col("n_chars") + b).cast("long").alias("val")))
        stage = _os.path.join(root, f"stage_{b}")
        batch.coalesce(1).write.parquet(stage)
        part = next(f for f in _os.listdir(stage)
                    if f.endswith(".parquet"))
        _os.rename(_os.path.join(stage, part),
                   _os.path.join(src, f"b{b}.parquet"))
    schema = "doc_id long, ver long, val long"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    st = Storage(tbl)

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        st.upsert_latest(spark, "docs_current", batch_df,
                         key_cols=["doc_id"], ver_col="ver")

    q = (stream.writeStream.outputMode("update").foreachBatch(_merge)
         .trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination()
    return st.read_table(spark, "docs_current")


SQL_STREAM_UPSERT = """
SELECT doc_id,
       CAST(doc_id % 4 AS BIGINT) AS ver,
       CAST(n_chars + doc_id % 4 AS BIGINT) AS val
FROM documents
"""


def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit over the corpus vocabulary: regression
    of ln(count) on ln(rank) for the top-200 tokens — the corpus-health
    statistic (natural language sits near slope -1; synthetic or
    templated corpora flatten). Slope/intercept/R² via the textbook
    regr_* aggregates both engines implement; floats carry the repo's
    round(x, 6) + 0.0 convention. The rank window runs AFTER
    orderBy+limit (GlobalLimit-bounded input), and the fit itself is
    one grouping-free Aggregate."""
    toks = F.filter(F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))),
                            r"\s+"),
                    lambda t: t != "")
    counts = (_docs(spark, sf_dir)
              .select(F.explode(toks).alias("tok"))
              .groupBy("tok").agg(F.count(F.lit(1)).alias("n")))
    top = (counts.orderBy(F.desc("n"), F.asc("tok")).limit(VOCAB_TOP)
           .withColumn("rank", F.row_number().over(
               Window.orderBy(F.desc("n"), F.asc("tok")))))
    return top.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        (F.round(F.expr("regr_slope(ln(n), ln(rank))"), 6)
         + 0.0).alias("zipf_slope"),
        (F.round(F.expr("regr_intercept(ln(n), ln(rank))"), 6)
         + 0.0).alias("zipf_intercept"),
        (F.round(F.expr("regr_r2(ln(n), ln(rank))"), 6)
         + 0.0).alias("zipf_r2"))


SQL_TEXT_ZIPF = f"""
WITH counts AS (
  SELECT tok, count(*) AS n FROM (
    SELECT unnest(list_filter(
             string_split_regex(lower(coalesce(text, '')), '\\s+'),
             t -> t <> '')) AS tok
    FROM documents)
  GROUP BY tok
),
top AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rank
  FROM (SELECT tok, n FROM counts ORDER BY n DESC, tok LIMIT {VOCAB_TOP})
)
SELECT CAST(count(*) AS BIGINT) AS n_points,
       round(regr_slope(ln(n), ln(rank)), 6) + 0.0 AS zipf_slope,
       round(regr_intercept(ln(n), ln(rank)), 6) + 0.0 AS zipf_intercept,
       round(regr_r2(ln(n), ln(rank)), 6) + 0.0 AS zipf_r2
FROM top
"""


KANON_K = 5


def q_rel_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (lang, source) quasi-identifier pair:
    group sizes, at-risk flag (n < k), and the share of DOCUMENTS whose
    equivalence class is below k in exact ppm — the governance read
    that must precede any per-group release of a corpus. Two hash aggs
    (group sizes, then the one-row risk rollup exploded back as a
    constant-size summary join); no windows."""
    g = (_docs(spark, sf_dir)
         .groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n")))
    tot = g.agg(
        F.sum("n").alias("n_docs"),
        F.sum(F.when(F.col("n") < KANON_K, F.col("n")).otherwise(0))
        .alias("n_risky"))
    return (g.crossJoin(F.broadcast(tot))
            .select("lang", "source", F.col("n").cast("long").alias("n"),
                    (F.col("n") < KANON_K).alias("is_risky"),
                    F.expr("n_risky * 1000000L DIV n_docs")
                    .cast("long").alias("risky_share_ppm")))


SQL_REL_KANON = f"""
WITH g AS (
  SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
tot AS (
  SELECT sum(n) AS n_docs,
         sum(CASE WHEN n < {KANON_K} THEN n ELSE 0 END) AS n_risky
  FROM g)
SELECT g.lang, g.source, CAST(g.n AS BIGINT) AS n,
       g.n < {KANON_K} AS is_risky,
       CAST(t.n_risky * 1000000 // t.n_docs AS BIGINT) AS risky_share_ppm
FROM g, tot t
"""


# ---------------------------------------------------------------------------
# Wave 3: IC-similarity family completion, HITS, Bloom decontamination,
# SPARQL ASK, hash split audit, streaming windowed top-k.
# ---------------------------------------------------------------------------


def q_kg_lin_jc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lin similarity + Jiang-Conrath distance for co-tagged concept
    pairs (operators/graph.py:lin_jc) — completes the taxonomy
    similarity family next to Wu-Palmer (kg_wup_matrix) and Resnik
    (kg_resnik), the trio the ontology-retrieval literature evaluates
    together [K]. Same corpus-IC masses as kg_resnik; the ln/division
    float math follows the repo's round(x, 6) + 0.0 convention."""
    from ..operators.graph import lin_jc
    from .driver_ontology import driver_ancestors
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


HITS_ITERS = 2


def q_kg_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the full heterogeneous KG
    (operators/graph.py:hits_exact) — the second classic link-analysis
    read next to kg_pagerank, with a semantically real hub/authority
    split (turns point, concepts/tools collect). Pure BIGINT ppm with
    L1 renormalization each half-step, so the distributed sums are
    bit-exact against DuckDB's unrolled replay of the same rounds."""
    from ..operators.graph import hits_exact
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


BLOOM_N = 6


def q_dedup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination (operators/sketch.py): the probe
    subset's 6-gram set folds into a fixed 65536-bit filter (the scale
    path when the membership set outgrows an exact broadcast), the
    corpus probes it map-side, and the exact audit columns pin the
    sketch's false-positive behavior as deterministic — both engines
    rebuild the identical bit set digit-by-digit from md5."""
    from ..operators.sketch import bloom_decontaminate
    d = _docs(spark, sf_dir)
    probes = d.filter(F.col("doc_id") % CONTAM_PROBE_MOD == 0)
    corpus = d.filter(F.col("doc_id") % CONTAM_PROBE_MOD != 0)
    return bloom_decontaminate(corpus, probes, n=BLOOM_N)


def _sql_dedup_bloom() -> str:
    def pos(h: str) -> str:
        return " + ".join(
            f"(strpos('0123456789abcdef', substr({h}, {p + 1}, 1)) - 1)"
            f" * {16 ** (3 - p)}" for p in range(4))

    salted = pos("md5(gram || ':' || CAST(i AS VARCHAR))")
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(coalesce(text, ''), ' '),
                     t -> t <> '') AS tk
  FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         md5(array_to_string(tk[i:i + {BLOOM_N} - 1], ' ')) AS gram
  FROM (SELECT doc_id, tk,
               unnest(range(1, greatest(len(tk) - {BLOOM_N} + 2, 1))) AS i
        FROM toks)),
pg AS (SELECT DISTINCT gram FROM grams
       WHERE doc_id % {CONTAM_PROBE_MOD} = 0),
bits AS (
  SELECT DISTINCT {salted} AS pos
  FROM pg CROSS JOIN (SELECT unnest(range(0, 3)) AS i)),
cg AS (SELECT doc_id, gram FROM grams
       WHERE doc_id % {CONTAM_PROBE_MOD} <> 0),
cpos AS (
  SELECT doc_id, gram, {salted} AS pos
  FROM cg CROSS JOIN (SELECT unnest(range(0, 3)) AS i)),
bhit AS (
  SELECT doc_id, gram FROM cpos JOIN bits USING (pos)
  GROUP BY doc_id, gram HAVING count(*) = 3),
bloom AS (SELECT doc_id, count(*) AS n_bloom_hits FROM bhit
          GROUP BY doc_id),
tru AS (SELECT doc_id, count(*) AS n_true_hits FROM cg JOIN pg USING (gram)
        GROUP BY doc_id),
perdoc AS (SELECT doc_id, count(*) AS n_grams FROM cg GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(b.n_bloom_hits, 0) AS BIGINT) AS n_bloom_hits,
       CAST(coalesce(t.n_true_hits, 0) AS BIGINT) AS n_true_hits,
       CAST(coalesce(b.n_bloom_hits, 0) - coalesce(t.n_true_hits, 0)
            AS BIGINT) AS n_false_pos,
       coalesce(b.n_bloom_hits, 0) > 0 AS is_flagged
FROM (SELECT DISTINCT doc_id FROM documents
      WHERE doc_id % {CONTAM_PROBE_MOD} <> 0) d
LEFT JOIN perdoc p ON p.doc_id = d.doc_id
LEFT JOIN bloom b ON b.doc_id = d.doc_id
LEFT JOIN tru t ON t.doc_id = d.doc_id
"""


ASK_CONCEPT = "dq:L27"
ASK_TOOL = "tool:tool3"
ASK_MISSING = "dq:NO_SUCH_CONCEPT"


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


SPLIT_TRAIN_MAX = 204  # of 256 two-hex-digit buckets → ~80 %
SPLIT_VAL_MAX = 230    # next ~10 %; rest is test


def q_curation_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split audit: assignment by the
    first two md5 hex digits of doc_id (stable under corpus growth —
    a doc never changes split when new data arrives, the property that
    makes hash splits the standard at pipeline scale), with per
    (split, source) counts, the split's corpus share in exact ppm, and
    a leakage audit — documents whose exact text hash appears in MORE
    THAN ONE split (the cross-split dup leak a random split silently
    ships). Two hash aggs + one broadcast-sized leak join."""
    d = _docs(spark, sf_dir)
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                                1, 2), 16, 10).cast("long")
    split = (F.when(bucket < SPLIT_TRAIN_MAX, "train")
             .when(bucket < SPLIT_VAL_MAX, "val")
             .otherwise("test"))
    t = d.select(F.col("doc_id"), F.col("source"), split.alias("split"),
                 F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("h"))
    leaky = (t.groupBy("h")
             .agg(F.count_distinct("split").alias("n_splits"))
             .filter(F.col("n_splits") > 1).select("h"))
    flagged = t.join(F.broadcast(leaky), "h", "left_semi") \
        .select("doc_id").withColumn("is_leaky", F.lit(1))
    g = (t.join(flagged, "doc_id", "left")
         .groupBy("split", "source")
         .agg(F.count(F.lit(1)).alias("n_docs"),
              F.sum(F.coalesce("is_leaky", F.lit(0))).alias("n_leaky_docs")))
    tot = g.agg(F.sum("n_docs").alias("n_total"))
    w_split = g.groupBy("split").agg(F.sum("n_docs").alias("n_split"))
    return (g.join(w_split, "split").crossJoin(F.broadcast(tot))
            .select("split", "source",
                    F.col("n_docs").cast("long").alias("n_docs"),
                    F.col("n_leaky_docs").cast("long").alias("n_leaky_docs"),
                    F.col("n_split").cast("long").alias("n_split"),
                    F.expr("n_split * 1000000L DIV n_total")
                    .cast("long").alias("split_share_ppm")))


def _sql_curation_split() -> str:
    bucket = ("(strpos('0123456789abcdef',"
              " substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16"
              " + strpos('0123456789abcdef',"
              " substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1")
    return f"""
WITH t AS (
  SELECT doc_id, source,
         CASE WHEN ({bucket}) < {SPLIT_TRAIN_MAX} THEN 'train'
              WHEN ({bucket}) < {SPLIT_VAL_MAX} THEN 'val'
              ELSE 'test' END AS split,
         md5(coalesce(text, '')) AS h
  FROM documents),
leaky AS (
  SELECT h FROM (SELECT h, count(DISTINCT split) AS c FROM t GROUP BY h)
  WHERE c > 1),
g AS (
  SELECT split, source, count(*) AS n_docs,
         sum(CASE WHEN h IN (SELECT h FROM leaky) THEN 1 ELSE 0 END)
           AS n_leaky_docs
  FROM t GROUP BY split, source),
ws AS (SELECT split, sum(n_docs) AS n_split FROM g GROUP BY split),
tot AS (SELECT sum(n_docs) AS n_total FROM g)
SELECT g.split, g.source, CAST(g.n_docs AS BIGINT) AS n_docs,
       CAST(g.n_leaky_docs AS BIGINT) AS n_leaky_docs,
       CAST(ws.n_split AS BIGINT) AS n_split,
       CAST(ws.n_split * 1000000 // t.n_total AS BIGINT)
         AS split_share_ppm
FROM g JOIN ws ON ws.split = g.split CROSS JOIN tot t
"""


STREAM_TOPK_K = 3


def q_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming windowed top-k: hourly tumbling-window event-type
    counts maintained by a REAL stateful streaming aggregation (4
    forced micro-batches, complete-mode drain — window state genuinely
    merges across triggers), then the bounded per-window rank runs on
    the drained result. The oracle replays the batch equivalent, so
    the pairing pins streaming-window ≡ batch-groupBy semantics."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    sfx = f"{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}"
    out = _os.path.join(_tempfile.gettempdir(), f"stream_topk_{sfx}.parquet")
    ckpt = _os.path.join(_tempfile.gettempdir(), f"stream_topk_{sfx}_ckpt")
    src = _os.path.join(_tempfile.gettempdir(), f"stream_topk_{sfx}_src")
    for d in (out, ckpt, src):
        _shutil.rmtree(d, ignore_errors=True)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.repartition(4).write.parquet(src)
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src))
    counts = (stream
              .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
              .agg(F.count(F.lit(1)).alias("n")))

    def _write(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out)

    q = (counts.writeStream.outputMode("complete").foreachBatch(_write)
         .trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination()
    spark.catalog.refreshByPath(out)
    drained = spark.read.parquet(out).select(
        F.unix_micros(F.col("w.start").cast("timestamp")).alias("win_us"),
        "event_type", F.col("n").cast("long").alias("n"))
    w = Window.partitionBy("win_us").orderBy(F.desc("n"), F.asc("event_type"))
    return (drained.withColumn("rnk", F.row_number().over(w).cast("long"))
            .filter(F.col("rnk") <= STREAM_TOPK_K))


SQL_STREAM_TOPK = f"""
WITH c AS (
  SELECT date_trunc('hour', ts) AS w, event_type, count(*) AS n
  FROM events GROUP BY 1, 2),
r AS (
  SELECT epoch_us(w) AS win_us, event_type, CAST(n AS BIGINT) AS n,
         CAST(row_number() OVER (PARTITION BY w
                                 ORDER BY n DESC, event_type) AS BIGINT)
           AS rnk
  FROM c)
SELECT win_us, event_type, n, rnk FROM r WHERE rnk <= {STREAM_TOPK_K}
"""


# ---------------------------------------------------------------------------
# Wave 4: readability scoring, activity-streak islands, edit-distance
# near-dup, bounded BFS reachability, label-propagation communities.
# ---------------------------------------------------------------------------


def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease readability per document — the classic
    corpus quality signal next to text_quality's ratio battery.
    Sentences = runs of [.!?], words = the repo's space-token
    convention, syllables approximated as vowel-letter groups
    ([aeiouy]+ in the lowered text — a group can never span a space,
    so the whole-text count equals the per-word sum without an
    explode). Entirely map-side JVM regex: zero shuffles, the shape a
    100 TB quality scan needs. Floats follow round(x, 6) + 0.0."""
    d = _docs(spark, sf_dir)
    low = F.lower(F.coalesce(F.col("text"), F.lit("")))
    words = F.size(F.filter(F.split(low, " "), lambda t: t != ""))
    sents = F.greatest(F.regexp_count(low, F.lit(r"[.!?]+")), F.lit(1))
    syll = F.regexp_count(low, F.lit(r"[aeiouy]+"))
    flesch = (F.lit(206.835)
              - 1.015 * words / sents
              - 84.6 * syll / F.greatest(words, F.lit(1)))
    return d.select(
        "doc_id", "lang",
        words.cast("long").alias("n_words"),
        sents.cast("long").alias("n_sents"),
        syll.cast("long").alias("n_syll"),
        (F.round(flesch, 6) + 0.0).alias("flesch"),
    )


SQL_TEXT_READABILITY = """
WITH t AS (
  SELECT doc_id, lang, lower(coalesce(text, '')) AS low FROM documents),
m AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(low, ' '), x -> x <> '')) AS n_words,
         greatest(len(regexp_extract_all(low, '[.!?]+')), 1) AS n_sents,
         len(regexp_extract_all(low, '[aeiouy]+')) AS n_syll
  FROM t)
SELECT doc_id, lang,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sents AS BIGINT) AS n_sents,
       CAST(n_syll AS BIGINT) AS n_syll,
       round(206.835 - 1.015 * n_words / n_sents
             - 84.6 * n_syll / greatest(n_words, 1), 6) + 0.0 AS flesch
FROM m
"""


STREAK_MAX_EVENTS = None  # full events table; islands keyed per user


def q_rel_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user runs of consecutive ACTIVE DAYS (the
    retention streak read). The classic date-minus-row_number trick —
    distinct (user, day), rank days within user, group by the
    island anchor day_sub(day, rn); every window is PARTITIONED BY
    user_id so the shape scales with users, never serializing one
    task. Output: per-user streak count, longest/total days, and the
    longest streak's start day (epoch days, exact integers)."""
    e = _tbl(spark, sf_dir, "events")
    days = (e.select("user_id", F.to_date("ts").alias("day")).distinct())
    w = Window.partitionBy("user_id").orderBy("day")
    isl = (days.withColumn("rn", F.row_number().over(w))
           .withColumn("anchor", F.date_sub(F.col("day"), F.col("rn")))
           .groupBy("user_id", "anchor")
           .agg(F.count(F.lit(1)).alias("len"),
                F.min("day").alias("start")))
    best = Window.partitionBy("user_id").orderBy(
        F.desc("len"), F.asc("start"))
    return (isl.withColumn("rk", F.row_number().over(best))
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_streaks"),
                 F.max("len").cast("long").alias("longest_streak"),
                 F.sum("len").cast("long").alias("total_active_days"),
                 F.max(F.when(F.col("rk") == 1,
                              F.datediff(F.col("start"),
                                         F.lit("1970-01-01"))))
                 .cast("long").alias("longest_start_epoch_day")))


SQL_REL_ISLANDS = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
isl AS (
  SELECT user_id, anch, count(*) AS len, min(day) AS start
  FROM (SELECT user_id, day,
               day - CAST(row_number() OVER (PARTITION BY user_id
                                             ORDER BY day) AS INTEGER)
                 AS anch
        FROM days)
  GROUP BY user_id, anch),
rk AS (
  SELECT user_id, len, start,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY len DESC, start ASC) AS rk
  FROM isl)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(sum(len) AS BIGINT) AS total_active_days,
       CAST(max(CASE WHEN rk = 1
                     THEN date_diff('day', DATE '1970-01-01', start) END)
            AS BIGINT) AS longest_start_epoch_day
FROM rk GROUP BY user_id
"""


EDIT_PREFIX_TOKS = 4     # block key: md5 of the first 4 tokens
EDIT_BLOCK_CAP = 64      # drop hot blocks (candidate recall tradeoff)
EDIT_VERIFY_CHARS = 120  # Levenshtein window — bounds per-pair cost
EDIT_MAX_DIST = 20


def q_dedup_edit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup: record-linkage prefix blocking (md5 of
    the first 4 tokens) generates candidates, exact Levenshtein over a
    bounded 120-char window verifies — O(block²) only inside blocks,
    with hot blocks (> EDIT_BLOCK_CAP docs, e.g. a boilerplate
    preamble shared corpus-wide) dropped from candidate generation
    the same way dedup_jaccard df-caps hot shingles. The 120-char
    verify window caps the O(n·m) DP per pair; both engines run the
    identical character-level Levenshtein, so the pairing pins the
    distance itself."""
    d = _docs(spark, sf_dir)
    toks = F.filter(F.split(F.coalesce(F.col("text"), F.lit("")), " "),
                    lambda t: t != "")
    t = d.select(
        "doc_id",
        F.md5(F.array_join(F.slice(toks, 1, EDIT_PREFIX_TOKS), " "))
        .alias("blk"),
        F.substring(F.coalesce(F.col("text"), F.lit("")),
                    1, EDIT_VERIFY_CHARS).alias("head"))
    sizes = t.groupBy("blk").agg(F.count(F.lit(1)).alias("n"))
    cold = t.join(F.broadcast(sizes.filter(F.col("n") <= EDIT_BLOCK_CAP)
                              .select("blk")), "blk")
    a = cold.select(F.col("blk"), F.col("doc_id").alias("doc_a"),
                    F.col("head").alias("head_a"))
    b = cold.select(F.col("blk"), F.col("doc_id").alias("doc_b"),
                    F.col("head").alias("head_b"))
    return (a.join(b, "blk")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .withColumn("lev", F.levenshtein("head_a", "head_b"))
            .filter(F.col("lev") <= EDIT_MAX_DIST)
            .select("doc_a", "doc_b", F.col("lev").cast("long").alias("lev"))
            )


def _sql_dedup_edit() -> str:
    return f"""
WITH t AS (
  SELECT doc_id,
         md5(array_to_string(list_filter(
             string_split(coalesce(text, ''), ' '),
             x -> x <> '')[1:{EDIT_PREFIX_TOKS}], ' ')) AS blk,
         substr(coalesce(text, ''), 1, {EDIT_VERIFY_CHARS}) AS head
  FROM documents),
cold AS (
  SELECT t.* FROM t
  JOIN (SELECT blk FROM t GROUP BY blk
        HAVING count(*) <= {EDIT_BLOCK_CAP}) c USING (blk))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.head, b.head) AS BIGINT) AS lev
FROM cold a JOIN cold b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.head, b.head) <= {EDIT_MAX_DIST}
"""


BFS_SEEDS = ("dq:L27", "tool:tool3")
BFS_MAX_HOPS = 3


def q_kg_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded multi-source BFS reachability over the undirected KG
    (operators/graph.py:bfs_depths): minimum hop distance from the
    seed set {concept dq:L27, tool:tool3}, capped at 3 hops — the
    neighborhood-expansion read behind "what conversations sit near
    these capabilities". Spark explores level-by-level (anti-join
    blocks re-discovery, so first-found depth IS min depth); the
    oracle re-derives it as min(depth) over a depth-bounded recursive
    CTE — two genuinely different algorithms, one answer."""
    from ..operators.graph import bfs_depths
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


LP_ROUNDS = 2


def q_kg_community(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation community detection over the undirected KG
    (operators/graph.py:label_propagation): 2 synchronous rounds,
    neighbor-majority relabeling with min-label tie-break — fully
    deterministic, so the DuckDB oracle replays the unrolled rounds
    exactly. Communities in the heterogeneous graph read as
    conversation-topic basins (turns pulled toward the concepts they
    mention)."""
    from ..operators.graph import label_propagation
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


STREAM_LATE_DELAY_MIN = 37   # odd delay: watermarks never tie a window end
STREAM_LATE_BATCHES = 4


def q_stream_late_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data accounting — the one streaming semantic no
    other pairing pins: WHICH rows a watermarked append-mode window
    aggregation loses, and why. Events are staged into 4 files
    (batch = event_id % 4, mtimes ordered so the file source replays
    them deterministically) and run through a REAL append-mode 1-hour
    window count with a 37-minute watermark; the drained output is
    joined against the batch ground truth per (window, event_type):
    total rows, rows the stream emitted, rows lost to lateness, and
    whether the window finalized at all.

    The oracle replays Spark's empirically-pinned two-watermark
    protocol exactly: eviction watermark of batch k = cummax event
    time over batches < k minus the delay (windows whose end <= it
    emit at the first such k, including a trailing empty batch the
    availableNow trigger always runs); the LATE-EVENT filter lags one
    batch (wm_late(k) = wm_evict(k-1)), so every row arriving at or
    before its window's emission batch is counted and every row after
    it is dropped — which makes the emitted count exactly "rows in
    batches <= emission batch". The 37-minute delay keeps watermarks
    off hour boundaries, so no <=-vs-< tie is ever exercised."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    sfx = f"{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}"
    base = _os.path.join(_tempfile.gettempdir(), f"stream_late_{sfx}")
    _shutil.rmtree(base, ignore_errors=True)
    src, ckpt, out = (f"{base}/src", f"{base}/ckpt", f"{base}/out")
    _os.makedirs(src)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    for k in range(STREAM_LATE_BATCHES):
        stage = f"{base}/stage{k}"
        (events.filter(F.col("event_id") % STREAM_LATE_BATCHES == k)
         .coalesce(1).write.parquet(stage))
        part = next(f for f in _os.listdir(stage)
                    if f.endswith(".parquet"))
        _os.rename(_os.path.join(stage, part), f"{src}/f{k}.parquet")
        _shutil.rmtree(stage)
        _os.utime(f"{src}/f{k}.parquet",
                  (1_700_000_000 + 10 * k,) * 2)
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(src)
              # parquet reads the column as TIMESTAMP_NTZ; watermarks
              # require an instant-typed event time
              .withColumn("ts", F.col("ts").cast("timestamp")))
    agg = (stream.withWatermark("ts", f"{STREAM_LATE_DELAY_MIN} minutes")
           .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
           .agg(F.count(F.lit(1)).alias("n")))

    def _write(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out)

    q = (agg.writeStream.outputMode("append").foreachBatch(_write)
         .trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination()
    spark.catalog.refreshByPath(out)
    emitted = (spark.read.parquet(out)
               .select(F.unix_micros(F.col("w.start").cast("timestamp"))
                       .alias("win_us"),
                       "event_type",
                       F.col("n").cast("long").alias("n_emitted")))
    totals = (events
              .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
              .agg(F.count(F.lit(1)).alias("n_total"))
              .select(F.unix_micros(F.col("w.start").cast("timestamp"))
                      .alias("win_us"),
                      "event_type",
                      F.col("n_total").cast("long").alias("n_total")))
    return (totals.join(emitted, ["win_us", "event_type"], "left")
            .select("win_us", "event_type", "n_total",
                    F.coalesce("n_emitted", F.lit(0)).cast("long")
                    .alias("n_emitted"),
                    (F.col("n_total") - F.coalesce("n_emitted", F.lit(0)))
                    .cast("long").alias("n_lost"),
                    F.col("n_emitted").isNotNull().alias("was_emitted")))


def _sql_stream_late_audit() -> str:
    nb = STREAM_LATE_BATCHES
    return f"""
WITH e AS (
  SELECT event_id % {nb} AS b, date_trunc('hour', ts) AS w,
         event_type, ts
  FROM events),
mx AS (SELECT b, max(ts) AS met FROM e GROUP BY b),
cm AS (SELECT b, max(met) OVER (ORDER BY b
                                ROWS UNBOUNDED PRECEDING) AS cmax
       FROM mx),
wm AS (
  SELECT t.k,
         (SELECT cmax FROM cm WHERE b = t.k - 1)
           - INTERVAL {STREAM_LATE_DELAY_MIN} MINUTE AS wm_evict
  FROM (SELECT unnest(range(1, {nb} + 1)) AS k) t),
emit AS (
  SELECT w, min(k) AS ek
  FROM (SELECT DISTINCT w FROM e) wins JOIN wm
    ON wins.w + INTERVAL 1 HOUR <= wm.wm_evict
  GROUP BY w),
tot AS (SELECT w, event_type, count(*) AS n_total FROM e GROUP BY 1, 2),
em AS (
  SELECT e.w, e.event_type, count(*) AS n_emitted
  FROM e JOIN emit USING (w) WHERE e.b <= emit.ek GROUP BY 1, 2)
SELECT epoch_us(t.w) AS win_us, t.event_type,
       CAST(t.n_total AS BIGINT) AS n_total,
       CAST(coalesce(em.n_emitted, 0) AS BIGINT) AS n_emitted,
       CAST(t.n_total - coalesce(em.n_emitted, 0) AS BIGINT) AS n_lost,
       em.n_emitted IS NOT NULL AS was_emitted
FROM tot t LEFT JOIN em ON em.w = t.w AND em.event_type = t.event_type
"""


# ---------------------------------------------------------------------------
# Wave 5: distribution-drift KS statistic, RAKE-lite keyphrase extraction.
# ---------------------------------------------------------------------------


KS_BINS = 256
_PY_STOPWORDS = ["a", "the", "of", "and", "to", "in", "is"]


def q_rel_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between the value
    distributions of every event-type pair — the data-drift gate a
    training pipeline runs before trusting a new slice. Exact KS needs
    a global ordered scan (one partition at 10^12 rows), so this is
    the scale-correct binned variant: values map into 256 fixed
    min-max bins, per-(type, bin) counts aggregate map-side, the
     256-row-per-type cumulative window is PARTITIONED BY type, and
    D = max |cdf_a − cdf_b| in exact ppm over an equi-join of the two
    bounded cdf tables. Bin edges use one double multiply + divide in
    the same order on both engines, so IEEE bit-parity holds."""
    e = _tbl(spark, sf_dir, "events")
    rng = e.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = (e.crossJoin(F.broadcast(rng))
              .select("event_type",
                      F.least(F.lit(KS_BINS - 1),
                              F.floor((F.col("value") - F.col("lo"))
                                      * KS_BINS
                                      / (F.col("hi") - F.col("lo"))))
                      .cast("long").alias("bin")))
    cnt = binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("c"))
    w = (Window.partitionBy("event_type").orderBy("bin")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = Window.partitionBy("event_type")
    cdf = cnt.select("event_type", "bin",
                     F.sum("c").over(w).alias("cum"),
                     F.sum("c").over(tot).alias("n"))
    # bins with no rows for a type are absent from its cdf table; the
    # step function must still carry the previous cumulative value, so
    # densify against the full (type, bin) grid and forward-fill with
    # a max-over-prefix (cum is nondecreasing).
    types = cdf.select("event_type", "n").distinct()
    grid = types.crossJoin(
        spark.range(KS_BINS).select(F.col("id").alias("bin")))
    dense = (grid.join(cdf.select("event_type", "bin", "cum"),
                       ["event_type", "bin"], "left")
             .select("event_type", "bin", "n",
                     F.max("cum").over(w).alias("cum")))
    a = dense.select(F.col("event_type").alias("type_a"), "bin",
                     F.col("cum").alias("cum_a"), F.col("n").alias("n_a"))
    b = dense.select(F.col("event_type").alias("type_b"), "bin",
                     F.col("cum").alias("cum_b"), F.col("n").alias("n_b"))
    return (a.join(b, "bin")
            .filter(F.col("type_a") < F.col("type_b"))
            .groupBy("type_a", "type_b")
            .agg(F.max(F.abs(F.expr("coalesce(cum_a, 0L) * 1000000 DIV n_a")
                             - F.expr("coalesce(cum_b, 0L) * 1000000"
                                      " DIV n_b")))
                 .cast("long").alias("ks_d_ppm"),
                 F.max("n_a").cast("long").alias("n_a"),
                 F.max("n_b").cast("long").alias("n_b")))


def _sql_rel_ks_drift() -> str:
    return f"""
WITH rng AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
binned AS (
  SELECT event_type,
         least({KS_BINS} - 1,
               CAST(floor((value - r.lo) * {KS_BINS} / (r.hi - r.lo))
                    AS BIGINT)) AS bin
  FROM events, rng r),
cnt AS (SELECT event_type, bin, count(*) AS c FROM binned GROUP BY 1, 2),
cdf AS (
  SELECT event_type, bin,
         sum(c) OVER (PARTITION BY event_type ORDER BY bin
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM cnt),
types AS (SELECT DISTINCT event_type, n FROM cdf),
grid AS (SELECT t.event_type, t.n, g.bin
         FROM types t CROSS JOIN
              (SELECT unnest(range(0, {KS_BINS})) AS bin) g),
dense AS (
  SELECT g.event_type, g.bin, g.n,
         max(c.cum) OVER (PARTITION BY g.event_type ORDER BY g.bin
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM grid g LEFT JOIN cdf c
    ON c.event_type = g.event_type AND c.bin = g.bin)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(max(abs(coalesce(a.cum, 0) * 1000000 // a.n
                    - coalesce(b.cum, 0) * 1000000 // b.n)) AS BIGINT)
         AS ks_d_ppm,
       CAST(max(a.n) AS BIGINT) AS n_a,
       CAST(max(b.n) AS BIGINT) AS n_b
FROM dense a JOIN dense b ON a.bin = b.bin
WHERE a.event_type < b.event_type
GROUP BY 1, 2
"""


KEYPHRASE_TOP = 50


def q_text_keyphrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE-lite keyphrase extraction — candidate phrases are maximal
    stopword-free token runs; each word scores degree/frequency
    (degree = Σ length of phrases containing it) and a phrase scores
    the sum of its words, in exact ppm integers so distributed
    aggregation is merge-order-free. The KG-construction adjunct:
    phrase candidates feed concept discovery when the ontology is
    still being built.

    Shape: one doc-partitioned window assigns phrase groups (stop
    count before each position), two hash aggs build the corpus word
    table, the per-phrase re-join is token-keyed, and the final top-50
    is orderBy+limit (GlobalLimit) — rank only after the cut."""
    d = _docs(spark, sf_dir)
    tok = (d.select(
        "doc_id",
        F.posexplode(F.filter(
            F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), " "),
            lambda t: t != "")).alias("pos", "raw"))
        .select("doc_id", "pos",
                F.regexp_replace("raw", r"[.!?,;:]", "").alias("tok")))
    stop = (F.col("tok").isin(*_PY_STOPWORDS)) | (F.col("tok") == "")
    wdoc = Window.partitionBy("doc_id").orderBy("pos") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grp = (tok.withColumn("is_stop", stop.cast("int"))
           .withColumn("grp", F.sum("is_stop").over(wdoc))
           .filter(~stop))
    phrases = (grp.groupBy("doc_id", "grp")
               .agg(F.array_join(F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("pos", "tok"))),
                        lambda s: s.getField("tok")), " ").alias("phrase"),
                    F.count(F.lit(1)).alias("plen")))
    words = (phrases.select("plen",
                            F.explode(F.split("phrase", " ")).alias("tok"))
             .groupBy("tok")
             .agg(F.sum("plen").alias("degree"),
                  F.count(F.lit(1)).alias("freq"))
             .withColumn("wscore_ppm",
                         F.expr("degree * 1000000 DIV freq")))
    ptext = (phrases.groupBy("phrase")
             .agg(F.count(F.lit(1)).alias("n_occurrences"),
                  F.max("plen").alias("n_words")))
    scored = (ptext.select("phrase", "n_occurrences", "n_words",
                           F.explode(F.split("phrase", " ")).alias("tok"))
              .join(words.select("tok", "wscore_ppm"), "tok")
              .groupBy("phrase")
              .agg(F.max("n_occurrences").cast("long")
                   .alias("n_occurrences"),
                   F.max("n_words").cast("long").alias("n_words"),
                   F.sum("wscore_ppm").cast("long").alias("score_ppm")))
    top = scored.orderBy(F.desc("score_ppm"), F.asc("phrase")) \
        .limit(KEYPHRASE_TOP)
    wr = Window.orderBy(F.desc("score_ppm"), F.asc("phrase"))
    return top.withColumn("rnk", F.row_number().over(wr).cast("long"))


def _sql_text_keyphrase() -> str:
    stop_sql = "(" + ", ".join(f"'{w}'" for w in _PY_STOPWORDS) + ")"
    return f"""
WITH tok AS (
  SELECT doc_id, u.pos,
         regexp_replace(tk[u.pos], '[.!?,;:]', '', 'g') AS tok
  FROM (SELECT doc_id,
               list_filter(string_split(lower(coalesce(text, '')), ' '),
                           x -> x <> '') AS tk
        FROM documents),
       unnest(range(1, len(tk) + 1)) AS u(pos)),
grp AS (
  SELECT doc_id, pos, tok,
         sum(CASE WHEN tok IN {stop_sql} OR tok = '' THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS g,
         (tok IN {stop_sql} OR tok = '') AS is_stop
  FROM tok),
phrases AS (
  SELECT doc_id, g,
         string_agg(tok, ' ' ORDER BY pos) AS phrase,
         count(*) AS plen
  FROM grp WHERE NOT is_stop GROUP BY doc_id, g),
words AS (
  SELECT w.tok, CAST(sum(p.plen) AS BIGINT) * 1000000
           // count(*) AS wscore_ppm
  FROM phrases p, unnest(string_split(p.phrase, ' ')) AS w(tok)
  GROUP BY w.tok),
ptext AS (
  SELECT phrase, count(*) AS n_occurrences, max(plen) AS n_words
  FROM phrases GROUP BY phrase),
scored AS (
  SELECT p.phrase,
         max(p.n_occurrences) AS n_occurrences,
         max(p.n_words) AS n_words,
         sum(w.wscore_ppm) AS score_ppm
  FROM ptext p, unnest(string_split(p.phrase, ' ')) AS t(tok)
  JOIN words w ON w.tok = t.tok
  GROUP BY p.phrase)
SELECT phrase,
       CAST(n_occurrences AS BIGINT) AS n_occurrences,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(score_ppm AS BIGINT) AS score_ppm,
       CAST(row_number() OVER (ORDER BY score_ppm DESC, phrase ASC)
            AS BIGINT) AS rnk
FROM scored
ORDER BY score_ppm DESC, phrase ASC LIMIT {KEYPHRASE_TOP}
"""


# ---------------------------------------------------------------------------
# Wave 6: Benford first-digit audit, applyInPandasWithState pairing,
# simplified silhouette.
# ---------------------------------------------------------------------------


import math as _math

#: Benford expected share of first significant digit d, in exact ppm —
#: computed ONCE here and inlined into both engines as the same integer
#: literal, so no cross-engine transcendental is ever compared.
BENFORD_PPM = {d: round(_math.log10(1 + 1 / d) * 1_000_000)
               for d in range(1, 10)}


def q_rel_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit per event type — the
    fraud/data-generation forensics read: observed digit shares in
    exact ppm against the Benford expectation (inlined as shared
    integer literals), with the absolute deviation. First digit =
    value / 10^floor(log10(value)) — both engines run the identical
    IEEE double ops in the same order. One hash agg + a per-type
    window over ≤9 rows; map-everything-else."""
    e = _tbl(spark, sf_dir, "events").filter(F.col("value") > 0)
    digit = F.floor(F.col("value")
                    / F.pow(F.lit(10.0),
                            F.floor(F.log10("value")))).cast("long")
    cnt = (e.select("event_type", digit.alias("digit"))
           .groupBy("event_type", "digit")
           .agg(F.count(F.lit(1)).alias("n")))
    tot = Window.partitionBy("event_type")
    bexp = F.create_map(*[x for d, p in BENFORD_PPM.items()
                          for x in (F.lit(d), F.lit(p))])
    return (cnt.select("event_type", "digit",
                       F.col("n").cast("long").alias("n"),
                       F.expr("n * 1000000 DIV sum(n) OVER"
                              " (PARTITION BY event_type)")
                       .cast("long").alias("share_ppm"),
                       bexp[F.col("digit")].cast("long")
                       .alias("benford_ppm"))
            .withColumn("abs_dev_ppm",
                        F.abs(F.col("share_ppm")
                              - F.col("benford_ppm")).cast("long")))


def _sql_rel_benford() -> str:
    cases = " ".join(f"WHEN {d} THEN {p}"
                     for d, p in BENFORD_PPM.items())
    return f"""
WITH e AS (
  SELECT event_type,
         CAST(floor(value / pow(10.0, floor(log10(value)))) AS BIGINT)
           AS digit
  FROM events WHERE value > 0),
cnt AS (SELECT event_type, digit, count(*) AS n FROM e GROUP BY 1, 2)
SELECT event_type, digit, CAST(n AS BIGINT) AS n,
       CAST(n * 1000000 // sum(n) OVER (PARTITION BY event_type)
            AS BIGINT) AS share_ppm,
       CAST(CASE digit {cases} END AS BIGINT) AS benford_ppm,
       CAST(abs(n * 1000000 // sum(n) OVER (PARTITION BY event_type)
                - CASE digit {cases} END) AS BIGINT) AS abs_dev_ppm
FROM cnt
"""


STATEFUL_BATCHES = 4


def q_stream_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState driver pairing — the arbitrary-stateful
    streaming API's only oracle-checked query (running_conv_stats
    covers it in pytest; this pins it cross-engine). Per-user state
    (cumulative event count, cumulative integer cents) carried across
    4 deterministic micro-batches (batch = event_id % 4, mtime-ordered
    files); every batch APPENDS the updated running totals plus that
    batch's row count, so the drained table is the full state
    trajectory, not just the final value. The oracle replays each
    (user, batch) prefix sum in SQL; integer cents make the
    distributed sums merge-order-free. A 3650-day watermark delay
    keeps the late-row filter permanently inert (its two-watermark
    lag is stream_late_audit's subject, not this one's)."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    sfx = f"{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}"
    base = _os.path.join(_tempfile.gettempdir(), f"stream_state_{sfx}")
    _shutil.rmtree(base, ignore_errors=True)
    src, ckpt, out = f"{base}/src", f"{base}/ckpt", f"{base}/out"
    _os.makedirs(src)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    for k in range(STATEFUL_BATCHES):
        stage = f"{base}/stage{k}"
        (events.filter(F.col("event_id") % STATEFUL_BATCHES == k)
         .coalesce(1).write.parquet(stage))
        part = next(f for f in _os.listdir(stage)
                    if f.endswith(".parquet"))
        _os.rename(_os.path.join(stage, part), f"{src}/f{k}.parquet")
        _shutil.rmtree(stage)
        _os.utime(f"{src}/f{k}.parquet", (1_700_000_000 + 10 * k,) * 2)

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("cum_n", T.LongType()),
        T.StructField("cum_cents", T.LongType()),
        T.StructField("batch_rows", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("cum_n", T.LongType()),
        T.StructField("cum_cents", T.LongType()),
    ])

    def update(key, pdfs, state):
        (user_id,) = key
        n, cents = state.get if state.exists else (0, 0)
        batch_rows = 0
        for pdf in pdfs:
            batch_rows += len(pdf)
            # repo cents convention: round(value*100, 0) half-away —
            # values carry 2 decimals, so +0.5-floor is exact here
            cents += int((pdf["value"] * 100 + 0.5).astype("int64").sum())
        n += batch_rows
        state.update((n, cents))
        yield pd.DataFrame({"user_id": [user_id], "cum_n": [n],
                            "cum_cents": [cents],
                            "batch_rows": [batch_rows]})

    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(src)
              .withColumn("ts", F.col("ts").cast("timestamp")))
    result = (stream.withWatermark("ts", "3650 days")
              .groupBy("user_id")
              .applyInPandasWithState(update, out_schema, state_schema,
                                      "append",
                                      GroupStateTimeout.NoTimeout))

    def _write(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out)

    q = (result.writeStream.outputMode("append").foreachBatch(_write)
         .trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination()
    spark.catalog.refreshByPath(out)
    return (spark.read.parquet(out)
            .select(F.col("user_id").cast("long").alias("user_id"),
                    F.col("cum_n").cast("long").alias("cum_n"),
                    F.col("cum_cents").cast("long").alias("cum_cents"),
                    F.col("batch_rows").cast("long").alias("batch_rows")))


def _sql_stream_stateful_counts() -> str:
    nb = STATEFUL_BATCHES
    return f"""
WITH e AS (
  SELECT user_id, event_id % {nb} AS b,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events),
per AS (
  SELECT user_id, b, count(*) AS batch_rows, sum(cents) AS batch_cents
  FROM e GROUP BY 1, 2)
SELECT user_id,
       CAST(sum(batch_rows) OVER w AS BIGINT) AS cum_n,
       CAST(sum(batch_cents) OVER w AS BIGINT) AS cum_cents,
       CAST(batch_rows AS BIGINT) AS batch_rows
FROM per
WINDOW w AS (PARTITION BY user_id ORDER BY b ROWS UNBOUNDED PRECEDING)
"""


def q_sim_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette per point over the deterministic Lloyd
    clustering (operators/simsearch.py:silhouette_simplified) — the
    clustering-quality read an IVF index build should gate on. Exact
    BIGINT a/b distances; the oracle re-trains the identical unrolled
    kmeans (shared CTE block with sim_kmeans) and replays the same
    ratio."""
    from ..operators.simsearch import quantize_embeddings, \
        silhouette_simplified
    qz = quantize_embeddings(_tbl(spark, sf_dir, "embeddings"))
    return silhouette_simplified(qz, k=KMEANS_K, iters=KMEANS_ITERS)


def _sql_sim_silhouette() -> str:
    body, prev = _sql_kmeans_ctes()
    dist = _sql_kmeans_dist()
    return f"""
WITH {body},
asg AS MATERIALIZED (
  SELECT v.vec_id, c.cid AS cluster, {dist} AS a_sq
  FROM q8 v, {prev} c
  QUALIFY row_number() OVER (PARTITION BY v.vec_id
                             ORDER BY a_sq, c.cid) = 1),
alld AS (
  SELECT v.vec_id, c.cid, {dist} AS sq FROM q8 v, {prev} c),
bb AS (
  SELECT d.vec_id, min(d.sq) AS b_sq
  FROM alld d JOIN asg a ON a.vec_id = d.vec_id AND d.cid <> a.cluster
  GROUP BY d.vec_id)
SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
       CAST(a.a_sq AS BIGINT) AS a_sq, CAST(b.b_sq AS BIGINT) AS b_sq,
       round((b.b_sq - a.a_sq)
             / greatest(a.a_sq, b.b_sq, 1), 6) + 0.0 AS s
FROM asg a JOIN bb b USING (vec_id)
"""


# ---------------------------------------------------------------------------
# Round-4 wave 7: time-series gap-fill, weighted shortest paths, temporal
# KG snapshot, SPARQL aggregates, product-quantization ANN
# ---------------------------------------------------------------------------

GAPFILL_PPM = 1_000_000


def q_rel_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densify + gap-fill + linear interpolation — the
    resample step every metrics/feature pipeline needs before a model
    sees regularly-spaced input. Per user: daily observations (last
    event value of the day, arg-max by event_id — deterministic), a
    dense daily grid spanning the user's own observed range
    (sequence+explode — grid size is bounded by the span, never by the
    event count), forward-fill, and exact-integer linear
    interpolation: the blend weight is ppm integer
    (day−prev)·1e6 DIV (next−prev), interp = (prev·(1e6−w) +
    next·w) DIV 1e6 — no float arithmetic after the single
    floor(value·1e6) quantization both engines share, so distributed
    aggregation order can't perturb the hash.

    Scale shape: every window is PARTITIONED BY user_id (per-key
    series are the natural partition unit; hot users bound the task,
    not the stage), the grid explode is map-side, and the obs⋈grid
    join is keyed on (user_id, day). No global sorts, no driver state."""
    e = _tbl(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01")))
    obs = (e.groupBy("user_id", day.cast("long").alias("day"))
           .agg(F.floor(F.max_by("value", "event_id") * GAPFILL_PPM)
                .cast("long").alias("obs_ppm")))
    span = obs.groupBy("user_id").agg(F.min("day").alias("d0"),
                                      F.max("day").alias("d1"))
    grid = span.select("user_id",
                       F.explode(F.sequence("d0", "d1")).alias("day"))
    j = grid.join(obs, ["user_id", "day"], "left")
    wp = (Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wn = (Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    obs_day = F.when(F.col("obs_ppm").isNotNull(), F.col("day"))
    f = j.select(
        "user_id", "day", "obs_ppm",
        F.last("obs_ppm", ignorenulls=True).over(wp).alias("ffill_ppm"),
        F.last(obs_day, ignorenulls=True).over(wp).alias("prev_day"),
        F.first("obs_ppm", ignorenulls=True).over(wn).alias("next_ppm"),
        F.first(obs_day, ignorenulls=True).over(wn).alias("next_day"))
    f = f.withColumn(
        "frac_ppm",
        F.when(F.col("next_day") == F.col("prev_day"),
               F.lit(0).cast("long"))
        .otherwise(F.expr(
            "(day - prev_day) * 1000000 DIV (next_day - prev_day)")))
    return f.select(
        "user_id",
        F.col("day").cast("long").alias("day"),
        "obs_ppm", "ffill_ppm",
        F.expr("(ffill_ppm * (1000000 - frac_ppm) + next_ppm * frac_ppm)"
               " DIV 1000000").alias("interp_ppm"),
        F.col("obs_ppm").isNull().cast("long").alias("is_gap"))


SQL_REL_GAPFILL = f"""
WITH obs AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS day,
         CAST(floor(arg_max(value, event_id) * {GAPFILL_PPM}) AS BIGINT)
           AS obs_ppm
  FROM events GROUP BY 1, 2),
span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
         FROM obs GROUP BY 1),
grid AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM span),
j AS (SELECT g.user_id, g.day, o.obs_ppm
      FROM grid g LEFT JOIN obs o USING (user_id, day)),
f AS (
  SELECT user_id, day, obs_ppm,
         last_value(obs_ppm IGNORE NULLS) OVER wp AS ffill_ppm,
         last_value(CASE WHEN obs_ppm IS NOT NULL THEN day END
                    IGNORE NULLS) OVER wp AS prev_day,
         first_value(obs_ppm IGNORE NULLS) OVER wn AS next_ppm,
         first_value(CASE WHEN obs_ppm IS NOT NULL THEN day END
                     IGNORE NULLS) OVER wn AS next_day
  FROM j
  WINDOW wp AS (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT user_id, CAST(day AS BIGINT) AS day, obs_ppm, ffill_ppm,
       CAST((ffill_ppm * ({GAPFILL_PPM} - frac_ppm)
             + next_ppm * frac_ppm) // {GAPFILL_PPM} AS BIGINT)
         AS interp_ppm,
       CAST(CASE WHEN obs_ppm IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS is_gap
FROM (SELECT *,
             CASE WHEN next_day = prev_day THEN 0
                  ELSE (day - prev_day) * {GAPFILL_PPM}
                       // (next_day - prev_day) END AS frac_ppm
      FROM f)
"""


SP_WEIGHTS = {"mentions": 3, "uses_tool": 2, "replies_to": 1}
SP_ROUNDS = 3


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
    from ..operators.graph import shortest_paths
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


SPARQL_AGG_MIN_TURNS = 2


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
    from ..operators.graph import bgp_query
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


PQ_SUBS = 4    # 64-dim vectors -> 4 subspaces of width 16
PQ_CODES = 8   # codewords per subspace -> 1 byte of code per subspace


def q_sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN top-k (operators/simsearch.py
    pq_codebook + pq_encode + pq_adc_topk): candidates collapse to
    PQ_SUBS tiny codes against a deterministic sampled codebook, and
    each query scans codes through its precomputed integer
    squared-L2 lookup table (ADC) — the memory-bound billion-vector
    serving shape, where the scoring stage never touches a raw
    vector. Exact integer math end to end (int8 slices, integer
    squared distances, first-index argmin tie-break), so the DuckDB
    replay is bit-identical."""
    from ..operators.simsearch import (pq_adc_topk, pq_codebook, pq_encode,
                                       quantize_embeddings)
    qz = quantize_embeddings(_tbl(spark, sf_dir, "embeddings"))
    q = (qz.filter(F.col("vec_id") < N_QUERY_VECS)
         .select(F.col("vec_id").alias("qid"), F.col("qvec").alias("qv")))
    c = (qz.filter(F.col("vec_id") >= N_QUERY_VECS)
         .select(F.col("vec_id").alias("cid"), F.col("qvec").alias("cv")))
    cb = pq_codebook(c, PQ_SUBS, PQ_CODES)
    enc = pq_encode(c, cb, PQ_SUBS, PQ_CODES)
    return pq_adc_topk(q, enc, cb, PQ_SUBS, PQ_CODES, k=SIM_TOP_K)


SQL_SIM_PQ_TOPK_TMPL = """
WITH q8 AS (
  SELECT vec_id,
         CASE WHEN ma = 0 THEN list_transform(d, x -> 0)
              ELSE list_transform(d, x -> CAST(round(x * 127.0 / ma, 0) AS INT))
         END AS qvec
  FROM (SELECT vec_id, d,
               list_max(list_transform(d, x -> abs(x))) AS ma
        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS d
              FROM embeddings))),
cand AS (SELECT vec_id AS cid, qvec FROM q8 WHERE vec_id >= {n_query}),
qry AS (SELECT vec_id AS qid, qvec FROM q8 WHERE vec_id < {n_query}),
cb AS (SELECT row_number() OVER (ORDER BY cid) - 1 AS code, qvec
       FROM (SELECT cid, qvec FROM cand ORDER BY cid LIMIT {K})),
ms AS (SELECT unnest(range(0, {M})) AS m),
cbs AS (SELECT cb.code, ms.m,
               list_slice(cb.qvec, ms.m * {w} + 1, (ms.m + 1) * {w}) AS cent
        FROM cb, ms),
encd AS (
  SELECT c.cid, s.m, s.code,
         CAST(list_sum(list_transform(range(1, {w} + 1), i ->
           CAST(c.qvec[s.m * {w} + i] - s.cent[i] AS BIGINT)
           * CAST(c.qvec[s.m * {w} + i] - s.cent[i] AS BIGINT)))
           AS BIGINT) AS d
  FROM cand c, cbs s),
codes AS (
  SELECT cid, m, code FROM (
    SELECT cid, m, code,
           row_number() OVER (PARTITION BY cid, m
                              ORDER BY d ASC, code ASC) AS rk
    FROM encd) WHERE rk = 1),
lut AS (
  SELECT q.qid, s.m, s.code,
         CAST(list_sum(list_transform(range(1, {w} + 1), i ->
           CAST(q.qvec[s.m * {w} + i] - s.cent[i] AS BIGINT)
           * CAST(q.qvec[s.m * {w} + i] - s.cent[i] AS BIGINT)))
           AS BIGINT) AS d
  FROM qry q, cbs s),
dist AS (
  SELECT l.qid, cd.cid, CAST(sum(l.d) AS BIGINT) AS adc_dist
  FROM codes cd JOIN lut l ON l.m = cd.m AND l.code = cd.code
  GROUP BY 1, 2)
SELECT qid, cid, adc_dist, rk FROM (
  SELECT qid, cid, adc_dist,
         row_number() OVER (PARTITION BY qid
                            ORDER BY adc_dist ASC, cid ASC) AS rk
  FROM dist) WHERE rk <= {k}
"""


# ---------------------------------------------------------------------------
# Round-4 wave 8: skip-gram training pairs, KG link prediction,
# collocation lift, CUSUM changepoint
# ---------------------------------------------------------------------------

SKIPGRAM_WINDOW = 2
SKIPGRAM_MIN_PAIRS = 2


def q_curation_skipgram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context) pair generation — the training-data
    prep for the word2vec embeddings the reference's autotagger runs
    on [K]: every token pairs with its neighbors within ±2 positions,
    symmetric, counted over the corpus. The join is EQUI by
    construction: instead of a non-equi |pos_a − pos_b| ≤ W predicate
    (a range join), each center explodes into W forward target keys
    (doc_id, pos+o) and equi-joins the token table — so Catalyst plans
    an ordinary keyed shuffle join that partitions by doc at any
    scale, and symmetry is restored by emitting each pair both ways.
    The HAVING ≥ 2 cut drops the singleton long tail (the same
    min-count every word2vec implementation applies)."""
    d = _docs(spark, sf_dir)
    tok = (d.select(
        "doc_id",
        F.posexplode(F.filter(
            F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), " "),
            lambda t: t != "")).alias("pos", "raw"))
        .select("doc_id", "pos",
                F.regexp_replace("raw", r"[.!?,;:]", "").alias("tok"))
        .filter(F.col("tok") != ""))
    off = (tok.select("doc_id", "pos", F.col("tok").alias("center"))
           .withColumn("o", F.explode(F.array(
               *[F.lit(i) for i in range(1, SKIPGRAM_WINDOW + 1)])))
           .select("doc_id", (F.col("pos") + F.col("o")).alias("pos"),
                   "center"))
    pairs = (off.join(tok, ["doc_id", "pos"])
             .select("center", F.col("tok").alias("context")))
    sym = pairs.unionByName(
        pairs.select(F.col("context").alias("center"),
                     F.col("center").alias("context")))
    return (sym.groupBy("center", "context")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
            .filter(F.col("n_pairs") >= SKIPGRAM_MIN_PAIRS))


def _sql_curation_skipgram() -> str:
    return f"""
WITH tok0 AS (
  SELECT doc_id, u.pos,
         regexp_replace(tk[u.pos], '[.!?,;:]', '', 'g') AS tok
  FROM (SELECT doc_id,
               list_filter(string_split(lower(coalesce(text, '')), ' '),
                           x -> x <> '') AS tk
        FROM documents),
       unnest(range(1, len(tk) + 1)) AS u(pos)),
tok AS (SELECT doc_id, pos, tok FROM tok0 WHERE tok <> ''),
pairs AS (
  SELECT a.tok AS center, b.tok AS context
  FROM tok a JOIN tok b
    ON b.doc_id = a.doc_id
   AND b.pos - a.pos BETWEEN 1 AND {SKIPGRAM_WINDOW}),
sym AS (SELECT center, context FROM pairs
        UNION ALL
        SELECT context, center FROM pairs)
SELECT center, context, CAST(count(*) AS BIGINT) AS n_pairs
FROM sym GROUP BY 1, 2
HAVING count(*) >= {SKIPGRAM_MIN_PAIRS}
"""


LINKPRED_MIN_COMMON = 2
LINKPRED_TOP = 5
LINKPRED_HUB_CAP = 64  # middle nodes above this degree generate no pairs


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
    from ..operators.graph import undirected_edges
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


COLLOC_MIN_COUNT = 3
COLLOC_TOP = 100


def q_text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram collocation mining by pointwise-lift — which adjacent
    token pairs co-occur far above unigram independence (the PMI
    family without the cross-engine transcendental: lift_ppm =
    P(xy)/(P(x)P(y)) · 1e6 = c_xy·N·1e6 DIV (c_x·c_y), exact
    integers). Corpus-level phrase discovery for tokenizer/vocab
    curation; the keyphrase op scores within-document runs, this one
    scores corpus-wide association. Two hash aggs (bigrams, unigrams),
    two broadcast-sized joins of the unigram table, top-100 via
    orderBy+limit (GlobalLimit) then rank over the bounded result."""
    d = _docs(spark, sf_dir)
    tok = (d.select(
        "doc_id",
        F.posexplode(F.filter(
            F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), " "),
            lambda t: t != "")).alias("pos", "raw"))
        .select("doc_id", "pos",
                F.regexp_replace("raw", r"[.!?,;:]", "").alias("tok"))
        .filter(F.col("tok") != ""))
    nxt = tok.select("doc_id", (F.col("pos") - 1).alias("pos"),
                     F.col("tok").alias("t2"))
    big = (tok.join(nxt, ["doc_id", "pos"])
           .groupBy(F.col("tok").alias("t1"), "t2")
           .agg(F.count(F.lit(1)).alias("c12")))
    uni = tok.groupBy(F.col("tok").alias("t")) \
        .agg(F.count(F.lit(1)).alias("c"))
    n_row = big.agg(F.sum("c12").alias("n_bigrams"))
    scored = (big.filter(F.col("c12") >= COLLOC_MIN_COUNT)
              .join(uni.select(F.col("t").alias("t1"),
                               F.col("c").alias("c1")), "t1")
              .join(uni.select(F.col("t").alias("t2"),
                               F.col("c").alias("c2")), "t2")
              .crossJoin(F.broadcast(n_row))
              .withColumn("lift_ppm", F.expr(
                  "c12 * n_bigrams * 1000000 DIV (c1 * c2)")))
    top = scored.orderBy(F.desc("lift_ppm"), F.asc("t1"), F.asc("t2")) \
        .limit(COLLOC_TOP)
    wr = Window.orderBy(F.desc("lift_ppm"), F.asc("t1"), F.asc("t2"))
    return (top.withColumn("rk", F.row_number().over(wr))
            .select("t1", "t2", F.col("c12").cast("long").alias("c12"),
                    F.col("lift_ppm").cast("long").alias("lift_ppm"),
                    "rk"))


def _sql_text_collocations() -> str:
    return f"""
WITH tok0 AS (
  SELECT doc_id, u.pos,
         regexp_replace(tk[u.pos], '[.!?,;:]', '', 'g') AS tok
  FROM (SELECT doc_id,
               list_filter(string_split(lower(coalesce(text, '')), ' '),
                           x -> x <> '') AS tk
        FROM documents),
       unnest(range(1, len(tk) + 1)) AS u(pos)),
tok AS (SELECT doc_id, pos, tok FROM tok0 WHERE tok <> ''),
big AS (
  SELECT a.tok AS t1, b.tok AS t2, count(*) AS c12
  FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  GROUP BY 1, 2),
uni AS (SELECT tok AS t, count(*) AS c FROM tok GROUP BY 1),
n AS (SELECT sum(c12) AS n_bigrams FROM big),
scored AS (
  SELECT g.t1, g.t2, g.c12,
         g.c12 * n.n_bigrams * 1000000 // (u1.c * u2.c) AS lift_ppm
  FROM big g JOIN uni u1 ON u1.t = g.t1 JOIN uni u2 ON u2.t = g.t2, n
  WHERE g.c12 >= {COLLOC_MIN_COUNT})
SELECT t1, t2, CAST(c12 AS BIGINT) AS c12,
       CAST(lift_ppm AS BIGINT) AS lift_ppm, rk
FROM (SELECT t1, t2, c12, lift_ppm,
             row_number() OVER (ORDER BY lift_ppm DESC, t1 ASC, t2 ASC)
               AS rk
      FROM (SELECT * FROM scored
            ORDER BY lift_ppm DESC, t1 ASC, t2 ASC LIMIT {COLLOC_TOP}))
WHERE rk <= {COLLOC_TOP}
"""


def q_rel_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type — where did this
    metric's level shift? Daily means in exact ppm (integer DIV of the
    per-day floor(value·1e6) sum), deviations from the type's mean of
    daily means, cumulative-sum under a type-partitioned window, and
    the changepoint is the day of max |CUSUM| (ties → earliest day).
    The textbook offline CUSUM estimator, integer end to end; every
    window partitions by event_type, so the per-type series is the
    task unit at any scale."""
    e = _tbl(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01")))
    daily = (e.groupBy("event_type", day.cast("long").alias("day"))
             .agg(F.expr("sum(cast(floor(value * 1000000) AS BIGINT))"
                         " DIV count(*)").alias("mean_ppm")))
    wt = Window.partitionBy("event_type")
    wc = (Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c = (daily
         .withColumn("gm_ppm", F.expr(
             "sum(mean_ppm) OVER (PARTITION BY event_type)"
             " DIV count(*) OVER (PARTITION BY event_type)"))
         .withColumn("cusum", F.sum(F.col("mean_ppm") - F.col("gm_ppm"))
                     .over(wc))
         .withColumn("n_days", F.count(F.lit(1)).over(wt)))
    wr = Window.partitionBy("event_type").orderBy(
        F.desc(F.abs(F.col("cusum"))), F.asc("day"))
    return (c.withColumn("rk", F.row_number().over(wr))
            .filter(F.col("rk") == 1)
            .select("event_type", F.col("day").alias("cp_day"),
                    F.col("cusum").cast("long").alias("cusum_at_cp"),
                    F.abs(F.col("cusum")).cast("long")
                    .alias("max_abs_cusum"),
                    F.col("n_days").cast("long").alias("n_days")))


SQL_REL_CHANGEPOINT = """
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS day,
         sum(CAST(floor(value * 1000000) AS BIGINT)) // count(*)
           AS mean_ppm
  FROM events GROUP BY 1, 2),
c AS (
  SELECT event_type, day, mean_ppm,
         sum(mean_ppm) OVER (PARTITION BY event_type)
           // count(*) OVER (PARTITION BY event_type) AS gm_ppm,
         count(*) OVER (PARTITION BY event_type) AS n_days
  FROM daily),
cs AS (
  SELECT event_type, day, n_days,
         sum(mean_ppm - gm_ppm) OVER (PARTITION BY event_type
                                      ORDER BY day
                                      ROWS UNBOUNDED PRECEDING) AS cusum
  FROM c)
SELECT event_type, day AS cp_day,
       CAST(cusum AS BIGINT) AS cusum_at_cp,
       CAST(abs(cusum) AS BIGINT) AS max_abs_cusum,
       CAST(n_days AS BIGINT) AS n_days
FROM (SELECT event_type, day, cusum, n_days,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(cusum) DESC, day ASC) AS rk
      FROM cs)
WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# Round-4 wave 9: concurrency profile, deterministic walk corpus,
# canonical doc per dup-cluster
# ---------------------------------------------------------------------------

CONC_TTL_MIN = 10


def q_rel_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-concurrency profile per event type — "how many sessions
    were active at once, and when?", the capacity-planning read. Each
    event is active for a 10-minute TTL; concurrency is evaluated at
    minute resolution, which makes this the SCALE-CORRECT variant: the
    textbook sweep-line (+1/−1 ordered scan) is a total order per type
    — one task per type at 10^12 rows — whereas the minute grid is a
    map-side ×10 explode into a (type, minute) keyed agg, bounded by
    the time span, and the per-type argmax window runs over at most
    span-minutes rows. Earliest-minute tie-break keeps the peak
    deterministic."""
    e = _tbl(spark, sf_dir, "events")
    # tz-free epoch minutes: NTZ timestamps decompose into date + clock
    # parts identically on both engines (no session-timezone coupling)
    m0 = (F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01")))
          .cast("long") * 1440
          + F.hour("ts").cast("long") * 60 + F.minute("ts").cast("long"))
    act = e.select(
        "event_type",
        F.explode(F.sequence(m0, m0 + F.lit(CONC_TTL_MIN - 1)))
        .alias("minute"))
    cnt = (act.groupBy("event_type", "minute")
           .agg(F.count(F.lit(1)).alias("active")))
    wt = Window.partitionBy("event_type")
    wr = Window.partitionBy("event_type").orderBy(
        F.desc("active"), F.asc("minute"))
    return (cnt.withColumn("n_minutes", F.count(F.lit(1)).over(wt))
            .withColumn("rk", F.row_number().over(wr))
            .filter(F.col("rk") == 1)
            .select("event_type",
                    F.col("minute").cast("long").alias("peak_minute"),
                    F.col("active").cast("long").alias("peak_active"),
                    F.col("n_minutes").cast("long").alias("n_minutes")))


SQL_REL_CONCURRENCY = f"""
WITH act AS (
  SELECT event_type,
         unnest(generate_series(m0, m0 + {CONC_TTL_MIN - 1})) AS minute
  FROM (SELECT event_type,
               CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) * 1440
               + CAST(hour(ts) AS BIGINT) * 60
               + CAST(minute(ts) AS BIGINT) AS m0
        FROM events)),
cnt AS (SELECT event_type, minute, count(*) AS active
        FROM act GROUP BY 1, 2)
SELECT event_type, CAST(minute AS BIGINT) AS peak_minute,
       CAST(active AS BIGINT) AS peak_active,
       CAST(n_minutes AS BIGINT) AS n_minutes
FROM (SELECT event_type, minute, active,
             count(*) OVER (PARTITION BY event_type) AS n_minutes,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY active DESC, minute ASC) AS rk
      FROM cnt)
WHERE rk = 1
"""


WALK_LEN = 4


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
    from ..operators.graph import undirected_edges
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


def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical document per near-dup cluster — the end product of
    the fuzzy-dedup stack: connected components over the verified
    Jaccard pair graph, then per cluster keep the LONGEST member
    (ties → lowest doc_id), the standard "keep best version" rule.
    One row per cluster with the survivor and the cluster size — what
    a curation pipeline joins back to drop the other members. The
    rank window partitions by component (cluster sizes are bounded by
    the dup-graph's diameter, not the corpus)."""
    comp = q_dedup_components(spark, sf_dir)
    docs = (_docs(spark, sf_dir)
            .filter(F.col("doc_id") < JACCARD_MAX_DOC)
            .select("doc_id", "n_chars"))
    j = comp.join(docs, "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.desc("n_chars"), F.asc("doc_id"))
    return (j.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(F.col("component").cast("long").alias("component"),
                    F.col("doc_id").cast("long").alias("canonical_doc_id"),
                    F.col("n_chars").cast("long").alias("canonical_n_chars"))
            .join(comp.groupBy("component")
                  .agg(F.count(F.lit(1)).cast("long").alias("n_docs")),
                  "component"))


def _sql_dedup_canonical() -> str:
    comp = _sql_dedup_components()
    return f"""
WITH comp AS MATERIALIZED ({comp}),
j AS (
  SELECT c.component, c.doc_id, d.n_chars
  FROM comp c JOIN documents d ON d.doc_id = c.doc_id),
keep AS (
  SELECT component, doc_id AS canonical_doc_id,
         n_chars AS canonical_n_chars
  FROM (SELECT component, doc_id, n_chars,
               row_number() OVER (PARTITION BY component
                                  ORDER BY n_chars DESC, doc_id ASC) AS rk
        FROM j) WHERE rk = 1)
SELECT CAST(k.component AS BIGINT) AS component,
       CAST(k.canonical_doc_id AS BIGINT) AS canonical_doc_id,
       CAST(k.canonical_n_chars AS BIGINT) AS canonical_n_chars,
       CAST(s.n_docs AS BIGINT) AS n_docs
FROM keep k JOIN (SELECT component, count(*) AS n_docs
                  FROM comp GROUP BY 1) s ON s.component = k.component
"""


# ---------------------------------------------------------------------------
# Round-4 wave 10: containment near-dup, SPARQL DESCRIBE, two-stage retrieval
# ---------------------------------------------------------------------------

CONTAIN_THRESHOLD_PPM = 800_000


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set containment near-dup (operators/dedup.py
    containment_pairs) — the subset/quote detector: a short document
    fully embedded in a long one has tiny Jaccard (the union is
    dominated by the long side) but containment |A∩B|/min(|A|,|B|) ≈ 1.
    Same posting-list candidate shape + df-cap hot-token hygiene as
    dedup_jaccard, exact-ppm scores, pairs oriented small→big, and ONE
    row per contained doc — its best container (highest containment,
    most-asymmetric tie-break)."""
    from ..operators.dedup import containment_pairs
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < JACCARD_MAX_DOC)
    return containment_pairs(d, CONTAIN_THRESHOLD_PPM,
                             df_cap=JACCARD_DF_CAP)


SQL_DEDUP_CONTAINMENT = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, t.tok
  FROM documents, unnest(string_split(text, ' ')) AS t(tok)
  WHERE t.tok <> '' AND doc_id < {JACCARD_MAX_DOC}
),
sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
rare AS (
  SELECT tok FROM toks GROUP BY tok HAVING count(*) <= {JACCARD_DF_CAP}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM (SELECT t.* FROM toks t JOIN rare r ON r.tok = t.tok) a
  JOIN (SELECT t.* FROM toks t JOIN rare r ON r.tok = t.tok) b
    ON a.tok = b.tok AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN toks a ON a.doc_id = c.doc_a
  JOIN toks b ON b.doc_id = c.doc_b AND b.tok = a.tok
  GROUP BY c.doc_a, c.doc_b
),
j AS (
  SELECT i.doc_a, i.doc_b, i.inter, sa.sz AS sz_a, sb.sz AS sz_b
  FROM inter i
  JOIN sizes sa ON i.doc_a = sa.doc_id
  JOIN sizes sb ON i.doc_b = sb.doc_id),
pairs AS (
  SELECT CAST(CASE WHEN sz_a <= sz_b THEN doc_a ELSE doc_b END AS BIGINT)
           AS doc_small,
         CAST(CASE WHEN sz_a <= sz_b THEN doc_b ELSE doc_a END AS BIGINT)
           AS doc_big,
         inter * 1000000 // least(sz_a, sz_b) AS containment_ppm,
         inter * 1000000 // (sz_a + sz_b - inter) AS jaccard_ppm
  FROM j
  WHERE inter * 1000000 // least(sz_a, sz_b) >= {CONTAIN_THRESHOLD_PPM})
SELECT doc_small, doc_big, containment_ppm, jaccard_ppm
FROM (SELECT *, row_number() OVER (PARTITION BY doc_small
                                   ORDER BY containment_ppm DESC,
                                            jaccard_ppm ASC,
                                            doc_big ASC) AS rk
      FROM pairs)
WHERE rk = 1
"""


DESCRIBE_NODE = "dq:L27"


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
    from ..operators.graph import describe_cbd
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


TWO_STAGE_SHORTLIST = 15


def q_sim_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval — THE production ANN architecture: a cheap
    recall stage (IVF-probed cells, float dots against deterministic
    centroids) produces a per-query shortlist of 15, and an exact
    integer re-rank stage (int8 quantized dot product over the
    BROADCAST shortlist) picks the final top-5. Composes the paired
    building blocks end-to-end; the re-rank is exact integers, so the
    final ranking is deterministic even though stage 1 scores are
    floats (stage-1 SET membership replays in SQL, stage-2 order is
    integer math). At scale stage 1 touches only probed cells and
    stage 2 only k₁ candidates per query — neither stage ever sees the
    full corpus per query."""
    from ..operators.simsearch import ann_ivf_topk, quantize_embeddings
    e = _tbl(spark, sf_dir, "embeddings")
    q = (e.filter(F.col("vec_id") < N_QUERY_VECS)
         .select(F.col("vec_id").alias("qid"),
                 F.col("embedding").alias("qv")))
    c = (e.filter(F.col("vec_id") >= N_QUERY_VECS)
         .select(F.col("vec_id").alias("cid"),
                 F.col("embedding").alias("cv")))
    shortlist = (ann_ivf_topk(q, c, k=TWO_STAGE_SHORTLIST,
                              n_cells=IVF_N_CELLS, n_probe=IVF_N_PROBE)
                 .select("qid", "cid"))
    qz = quantize_embeddings(e)
    q8 = qz.select(F.col("vec_id").alias("qid"),
                   F.col("qvec").alias("q8"))
    c8 = qz.select(F.col("vec_id").alias("cid"),
                   F.col("qvec").alias("c8"))
    qdot = F.aggregate(
        F.zip_with("q8", "c8", lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    scored = (shortlist.join(q8, "qid").join(c8, "cid")
              .withColumn("qdot", qdot))
    w = Window.partitionBy("qid").orderBy(F.desc("qdot"), F.asc("cid"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= SIM_TOP_K)
            .select("qid", "cid", "qdot", "rk"))


def _sql_sim_two_stage() -> str:
    ivf = _sql_sim_ann_ivf(k=TWO_STAGE_SHORTLIST)
    return f"""
WITH stage1 AS MATERIALIZED (
  SELECT qid, cid FROM ({ivf})
),
q8 AS (
  SELECT vec_id,
         CASE WHEN ma = 0 THEN list_transform(d, x -> 0)
              ELSE list_transform(d, x -> CAST(round(x * 127.0 / ma, 0) AS INT))
         END AS qvec
  FROM (SELECT vec_id, d,
               list_max(list_transform(d, x -> abs(x))) AS ma
        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS d
              FROM embeddings))),
scored AS (
  SELECT s.qid, s.cid,
         CAST(list_dot_product(CAST(a.qvec AS DOUBLE[]),
                               CAST(b.qvec AS DOUBLE[])) AS BIGINT) AS qdot
  FROM stage1 s
  JOIN q8 a ON a.vec_id = s.qid
  JOIN q8 b ON b.vec_id = s.cid)
SELECT qid, cid, qdot, rk FROM (
  SELECT qid, cid, qdot,
         row_number() OVER (PARTITION BY qid
                            ORDER BY qdot DESC, cid ASC) AS rk
  FROM scored) WHERE rk <= {SIM_TOP_K}
"""


WALK_PAIR_WINDOW = 2


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

DIRECT_MAP_MODULUS = 10


def q_kg_direct_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3C-Direct-Mapping-lite [K]: a deterministic orders slice
    (o_orderkey % 10 == 0) mapped to RDF triples — row IRIs, literal
    columns, FK reference triples — plus the FK closure
    (customer → nation → region) for exactly the referenced rows.
    The second structured-data ingest front door next to DCAT: a KG
    builder bootstraps its ABox from existing warehouse tables.
    Union of map-only projections; closure pruning via broadcast
    semi-joins on slice-sized key sets."""
    from ..operators.construct import direct_mapping_triples
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
    from ..operators.construct import fuse_facts
    t = derived_transcripts(spark, sf_dir)
    gaz = _gaz_df(spark)
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    m = (t.join(F.broadcast(gaz),
                padded.contains(F.concat(F.lit(" "), gaz.surface,
                                         F.lit(" "))), "inner")
         .select("conv_id", "turn_idx", "role", "concept_id"))
    return fuse_facts(m)


def _sql_kg_fact_fusion() -> str:
    from ..operators.construct import FUSION_PRIOR, FUSION_ROLE_WEIGHTS
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
    from ..operators.construct import open_relation_triples
    return open_relation_triples(derived_transcripts(spark, sf_dir))


def _sql_kg_open_relations() -> str:
    from ..operators.construct import (OPENIE_MIN_SUPPORT, OPENIE_STOP,
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
    from ..operators.construct import dialogue_act_transitions
    return dialogue_act_transitions(derived_transcripts(spark, sf_dir))


def _sql_kg_dialogue_acts() -> str:
    from ..operators.construct import ACT_DIRECTIVE_CUES, ACT_QUESTION_CUES
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
    from ..operators.construct import predicate_profile
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


def q_dedup_blocking_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality audit of the MinHash-LSH blocker on the bounded
    audit sample: pairs completeness (blocker recall vs exact
    shingle-Jaccard truth), pairwise precision, and reduction ratio —
    the ER metrics [K] that justify trusting LSH before a 100-TB run.
    One summary row, exact-integer ppm."""
    from ..operators.dedup import blocking_audit
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < JACCARD_MAX_DOC)
    return blocking_audit(d, threshold=MINHASH_THRESHOLD)


def _sql_dedup_blocking_audit() -> str:
    prefix = _sql_minhash_prefix(max_doc=JACCARD_MAX_DOC)
    return f"""
WITH {prefix},
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON b.shingle = a.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
truth AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes sa ON i.doc_a = sa.doc_id
  JOIN sizes sb ON i.doc_b = sb.doc_id
  WHERE round(cast(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6)
        >= {MINHASH_THRESHOLD}),
m AS (
  SELECT sum(CASE WHEN in_cand THEN 1 ELSE 0 END) AS n_cand,
         sum(CASE WHEN in_true THEN 1 ELSE 0 END) AS n_true,
         sum(CASE WHEN in_cand AND in_true THEN 1 ELSE 0 END) AS n_hit
  FROM (SELECT coalesce(c.doc_a, t.doc_a) AS doc_a,
               c.doc_a IS NOT NULL AS in_cand,
               t.doc_a IS NOT NULL AS in_true
        FROM cand c
        FULL OUTER JOIN truth t
          ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)),
nd AS (SELECT count(*) AS n_docs FROM sizes)
SELECT CAST(nd.n_docs AS BIGINT) AS n_docs,
       CAST(m.n_cand AS BIGINT) AS n_cand,
       CAST(m.n_true AS BIGINT) AS n_true,
       CAST(m.n_hit AS BIGINT) AS n_hit,
       CAST(m.n_hit * 1000000 // m.n_true AS BIGINT)
         AS pairs_completeness_ppm,
       CAST(m.n_hit * 1000000 // m.n_cand AS BIGINT) AS precision_ppm,
       CAST(1000000 - m.n_cand * 1000000 // (nd.n_docs * (nd.n_docs - 1) // 2)
            AS BIGINT) AS reduction_ratio_ppm
FROM m, nd
"""


# ---------------------------------------------------------------------------
# Wave 12: discourse-layer construction (recency antecedents, entity
# salience, turn novelty), the entity-linking alias dictionary, and
# TransE-style triple plausibility scoring.
# ---------------------------------------------------------------------------

def q_kg_coref_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-based antecedent propagation (centering-theory baseline
    [K]) for the FOCUS concepts — the sparse multi-word compound terms
    of the gazetteer: a turn that does not explicitly name a compound
    concept inherits the conversation's most recently named one (topic
    carry-over — single-token references keep discussing the last
    explicitly-named compound). The coref layer's contribution to KG
    construction without an NLP model. Windows are PARTITIONED BY
    conv_id (conversation-bounded)."""
    from ..operators.construct import recency_antecedents
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
    from ..operators.construct import entity_salience
    return entity_salience(
        derived_transcripts(spark, sf_dir),
        _mentions_df(spark, sf_dir).select("conv_id", "turn_idx",
                                           "concept_id"))


def _sql_kg_entity_salience() -> str:
    from ..operators.construct import SALIENCE_TOP_K
    return f"""
WITH {_MENTIONS_CTE},
conv_len AS (
  SELECT conv_id, count(*) AS conv_len FROM transcripts GROUP BY 1),
per AS (
  SELECT conv_id, concept_id, count(*) AS n_mentions,
         count(DISTINCT turn_idx) AS n_turns, min(turn_idx) AS first_turn
  FROM mentions GROUP BY 1, 2),
scored AS (
  SELECT p.conv_id, p.concept_id, p.n_mentions, p.n_turns, p.first_turn,
         500000 * p.n_turns // c.conv_len
           + 500000 // (1 + p.first_turn) AS salience_ppm
  FROM per p JOIN conv_len c USING (conv_id)),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id
             ORDER BY salience_ppm DESC, concept_id ASC) AS rank
  FROM scored)
SELECT conv_id, concept_id, CAST(n_mentions AS BIGINT) AS n_mentions,
       CAST(n_turns AS BIGINT) AS n_turns,
       CAST(first_turn AS BIGINT) AS first_turn,
       CAST(salience_ppm AS BIGINT) AS salience_ppm,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {SALIENCE_TOP_K}
"""


def q_kg_turn_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turn-level novelty: distinct concepts per turn, first
    introductions, running distinct-concept count, exact novelty ratio
    — the new-information-rate curve an incremental KG builder reads.
    All windows partitioned by (conv) or (conv, concept)."""
    from ..operators.construct import turn_novelty
    return turn_novelty(
        _mentions_df(spark, sf_dir).select("conv_id", "turn_idx",
                                           "concept_id"))


SQL_KG_TURN_NOVELTY = f"""
WITH {_MENTIONS_CTE},
cm AS (SELECT DISTINCT conv_id, turn_idx, concept_id FROM mentions),
flagged AS (
  SELECT conv_id, turn_idx,
         CASE WHEN row_number() OVER (PARTITION BY conv_id, concept_id
              ORDER BY turn_idx) = 1 THEN 1 ELSE 0 END AS is_new
  FROM cm),
per_turn AS (
  SELECT conv_id, turn_idx, count(*) AS n_concepts, sum(is_new) AS n_new
  FROM flagged GROUP BY 1, 2)
SELECT conv_id, turn_idx, CAST(n_concepts AS BIGINT) AS n_concepts,
       CAST(n_new AS BIGINT) AS n_new,
       CAST(sum(n_new) OVER (PARTITION BY conv_id ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_concepts,
       CAST(n_new * 1000000 // n_concepts AS BIGINT) AS novelty_ppm
FROM per_turn
"""


def q_kg_alias_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-linking alias dictionary: per corpus surface form —
    mention frequency, candidate fan-out, best candidate, best-vs-
    runner-up margin (half-up ppm), ambiguity flag. Candidate ranking
    windows over the broadcast-sized score table only."""
    from ..operators.construct import alias_table
    return alias_table(_mentions_df(spark, sf_dir), _scores_df(spark))


def _sql_kg_alias_table() -> str:
    from ..operators.construct import ALIAS_AMBIGUITY_MARGIN_PPM
    sc = values_sql(driver_scores().round({"cos_sim": 6}), "s")
    return f"""
WITH {_MENTIONS_CTE},
freq AS (
  SELECT surface, count(*) AS n_mentions FROM mentions GROUP BY 1),
ranked AS (
  SELECT surface, concept_id,
         CAST(floor(cos_sim * 1000000 + 0.5) AS BIGINT) AS cos_ppm,
         row_number() OVER (PARTITION BY surface
                            ORDER BY cos_sim DESC, concept_id ASC) AS rn
  FROM {sc}),
n_cand AS (SELECT surface, count(*) AS n_candidates FROM ranked GROUP BY 1),
prof AS (
  SELECT b.surface, b.concept_id AS best_concept,
         b.cos_ppm AS best_cos_ppm,
         b.cos_ppm - coalesce(s2.cos_ppm, 0) AS margin_ppm
  FROM (SELECT * FROM ranked WHERE rn = 1) b
  LEFT JOIN (SELECT * FROM ranked WHERE rn = 2) s2 USING (surface))
SELECT f.surface, CAST(f.n_mentions AS BIGINT) AS n_mentions,
       CAST(n.n_candidates AS BIGINT) AS n_candidates,
       p.best_concept, p.best_cos_ppm,
       CAST(p.margin_ppm AS BIGINT) AS margin_ppm,
       CAST(CASE WHEN p.margin_ppm < {ALIAS_AMBIGUITY_MARGIN_PPM}
            THEN 1 ELSE 0 END AS INT) AS is_ambiguous
FROM freq f JOIN prof p USING (surface) JOIN n_cand n USING (surface)
"""


def q_kg_transe_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TransE-style triple plausibility evaluation [K: Bordes 2013]
    over the extracted graph with deterministic hash-initialized
    fixed-point embeddings (operators/kgembed.py) — per-predicate true
    vs corrupted-tail L1 scores, strict-win rate, margin sum. Map-only
    scoring + one predicate-keyed hash agg; exact integers end to
    end."""
    from ..operators.kgembed import transe_margins
    return transe_margins(
        q_kg_triples(spark, sf_dir).select("subj", "pred", "obj"))


def _sql_kg_transe_score() -> str:
    from ..operators.kgembed import TRANSE_DIM

    def comp(key: str, j: int) -> str:
        p1, p2 = 2 * j + 1, 2 * j + 2
        return (f"((strpos('0123456789abcdef', substr(md5({key}), {p1}, 1))"
                f" - 1) * 16"
                f" + strpos('0123456789abcdef', substr(md5({key}), {p2}, 1))"
                f" - 1 - 128)")

    def l1(tail_key: str) -> str:
        return " + ".join(
            f"abs({comp('h_key', j)} + {comp('r_key', j)}"
            f" - {comp(tail_key, j)})"
            for j in range(TRANSE_DIM))

    return f"""
WITH triples AS MATERIALIZED ({_sql_kg_triples_body()}),
keyed AS (
  SELECT pred, 'ent:' || subj AS h_key, 'rel:' || pred AS r_key,
         'ent:' || obj AS t_key,
         'corrupt:' || subj || pred || obj AS c_key
  FROM (SELECT DISTINCT subj, pred, obj FROM triples)),
scored AS (
  SELECT pred, {l1('t_key')} AS true_score, {l1('c_key')} AS corrupt_score
  FROM keyed)
SELECT pred, CAST(count(*) AS BIGINT) AS n_triples,
       CAST(sum(true_score) AS BIGINT) AS sum_true_score,
       CAST(sum(corrupt_score) AS BIGINT) AS sum_corrupt_score,
       CAST(sum(CASE WHEN true_score < corrupt_score THEN 1 ELSE 0 END)
            AS BIGINT) AS n_true_better,
       CAST(sum(CASE WHEN true_score < corrupt_score THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS hits_ppm,
       CAST(sum(corrupt_score - true_score) AS BIGINT) AS margin_sum
FROM scored GROUP BY pred
"""


# ---------------------------------------------------------------------------
# Wave 13: rule mining, completeness estimation, the conflict queue,
# and the dedup savings report.
# ---------------------------------------------------------------------------

def q_kg_rule_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMIE-lite horn-rule mining [K: Galárraga 2013] over the
    extracted graph: 2-atom forward chains p(x,y) ∧ q(y,z) ⇒ r(x,z)
    with support and standard confidence (exact ppm), middle nodes
    hub-capped (cap-as-semantics, replayed by the oracle). Discovers
    e.g. "a reply stays on topic" (replies_to ∧ mentions ⇒ mentions)
    from the triples alone."""
    from ..operators.construct import mine_rules
    return mine_rules(q_kg_triples(spark, sf_dir).select(
        "subj", "pred", "obj"))


def _sql_kg_rule_mining() -> str:
    from ..operators.construct import RULE_HUB_CAP, RULE_MIN_SUPPORT
    return f"""
WITH triples AS MATERIALIZED (
  SELECT DISTINCT subj, pred, obj FROM ({_sql_kg_triples_body()})),
deg AS (
  SELECT n, count(*) AS deg FROM (
    SELECT subj AS n FROM triples UNION ALL SELECT obj AS n FROM triples)
  GROUP BY 1),
mid AS (SELECT n FROM deg WHERE deg <= {RULE_HUB_CAP}),
body AS (
  SELECT DISTINCT t1.pred AS p, t2.pred AS q, t1.subj AS x, t2.obj AS z
  FROM triples t1
  JOIN mid m ON m.n = t1.obj
  JOIN triples t2 ON t2.subj = t1.obj
  WHERE t1.subj <> t2.obj),
body_count AS (SELECT p, q, count(*) AS n_body FROM body GROUP BY 1, 2),
support AS (
  SELECT b.p, b.q, h.pred AS r, count(*) AS support
  FROM body b JOIN triples h ON h.subj = b.x AND h.obj = b.z
  GROUP BY 1, 2, 3)
SELECT s.p AS body_p, s.q AS body_q, s.r AS head_r,
       CAST(s.support AS BIGINT) AS support,
       CAST(c.n_body AS BIGINT) AS n_body,
       CAST(s.support * 1000000 // c.n_body AS BIGINT) AS conf_ppm
FROM support s JOIN body_count c ON c.p = s.p AND c.q = s.q
WHERE s.support >= {RULE_MIN_SUPPORT}
"""


def q_kg_completeness_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KB completeness via capture-recapture [K: Lincoln-Petersen;
    Razniewski et al. apply it to KB recall]: user turns and assistant
    turns as two independent observers of the (conv discusses concept)
    fact space; their overlap estimates the unobserved remainder. One
    summary row, exact integers."""
    from ..operators.construct import estimate_completeness
    t = derived_transcripts(spark, sf_dir)
    gaz = _gaz_df(spark)
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    obs = (t.join(F.broadcast(gaz),
                  padded.contains(F.concat(F.lit(" "), gaz.surface,
                                           F.lit(" "))), "inner")
           .select("conv_id", "concept_id", "role"))
    return estimate_completeness(obs)


SQL_KG_COMPLETENESS_EST = f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
obs AS (
  SELECT t.conv_id, g.concept_id, t.role
  FROM transcripts t JOIN {_gaz_values()} ON
    (' ' || t.text || ' ') LIKE ('% ' || g.surface || ' %')
),
per_fact AS (
  SELECT conv_id, concept_id,
         max(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS saw_user,
         max(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS saw_asst
  FROM obs GROUP BY 1, 2),
agg AS (
  SELECT CAST(sum(saw_user) AS BIGINT) AS n_user,
         CAST(sum(saw_asst) AS BIGINT) AS n_assistant,
         CAST(sum(saw_user * saw_asst) AS BIGINT) AS n_overlap,
         CAST(count(*) AS BIGINT) AS n_observed
  FROM per_fact)
SELECT n_user, n_assistant, n_overlap, n_observed,
       CAST(CASE WHEN n_overlap > 0
            THEN n_user * n_assistant // n_overlap END AS BIGINT)
         AS est_total,
       CAST(CASE WHEN n_overlap > 0
                  AND n_user * n_assistant // n_overlap > 0
            THEN n_observed * 1000000 //
                 (n_user * n_assistant // n_overlap) END AS BIGINT)
         AS coverage_ppm
FROM agg
"""


def q_kg_fact_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conflict-resolution queue for the conversation-level uses_tool
    predicate (functional at conv granularity by policy): convs using
    multiple tools, per-tool support/share, winner pick — the evidence
    list behind predicate_profile's violation COUNTS. Windows
    PARTITIONED BY subj."""
    from ..operators.construct import fact_conflicts
    facts = (q_kg_triples(spark, sf_dir)
             .filter(F.col("pred") == "uses_tool")
             .select(F.concat(F.lit("conv:"),
                              F.split(F.col("subj"), ":").getItem(1))
                      .alias("subj"),
                     F.col("obj")))
    return fact_conflicts(facts)


def _sql_kg_fact_conflicts() -> str:
    return f"""
WITH triples AS MATERIALIZED ({_sql_kg_triples_body()}),
facts AS (
  SELECT 'conv:' || string_split(subj, ':')[2] AS subj, obj
  FROM triples WHERE pred = 'uses_tool'),
sup AS (SELECT subj, obj, count(*) AS support FROM facts GROUP BY 1, 2),
ranked AS (
  SELECT subj, obj, support,
         row_number() OVER (PARTITION BY subj
                            ORDER BY support DESC, obj ASC) AS rank,
         count(*) OVER (PARTITION BY subj) AS n_alternatives,
         sum(support) OVER (PARTITION BY subj) AS total_support
  FROM sup)
SELECT subj, obj, CAST(support AS BIGINT) AS support,
       CAST(n_alternatives AS BIGINT) AS n_alternatives,
       CAST(support * 1000000 // total_support AS BIGINT) AS share_ppm,
       CAST(CASE WHEN rank = 1 THEN 1 ELSE 0 END AS INT) AS is_winner,
       CAST(rank AS INT) AS rank
FROM ranked WHERE n_alternatives >= 2
"""


def q_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup savings report over the near-dup components: per multi-doc
    cluster — size, survivor, total vs duplicate bytes, exact savings
    ratio. The go/no-go artifact for a 100-TB dedup pass. One join +
    one component-keyed hash agg on top of dedup_components."""
    from ..operators.dedup import dedup_savings
    comp = q_dedup_components(spark, sf_dir)
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < JACCARD_MAX_DOC)
    return dedup_savings(comp, docs)


def _sql_dedup_savings() -> str:
    return f"""
WITH comp AS MATERIALIZED ({_sql_dedup_components()}),
labeled AS (
  SELECT c.component, c.doc_id, d.n_chars
  FROM comp c JOIN documents d USING (doc_id)
  WHERE d.doc_id < {JACCARD_MAX_DOC}),
agg AS (
  SELECT component, count(*) AS n_docs, min(doc_id) AS rep_doc,
         sum(n_chars) AS total_chars,
         arg_min(n_chars, doc_id) AS rep_chars
  FROM labeled GROUP BY 1)
SELECT CAST(component AS BIGINT) AS component,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(rep_doc AS BIGINT) AS rep_doc,
       CAST(total_chars AS BIGINT) AS total_chars,
       CAST(total_chars - rep_chars AS BIGINT) AS dup_chars,
       CAST((total_chars - rep_chars) * 1000000 // total_chars AS BIGINT)
         AS savings_ppm
FROM agg WHERE n_docs >= 2
"""


# ---------------------------------------------------------------------------
# Wave 14: SPARQL set-operator surface and the RDF publishing layer
# (reification + VoID self-description).
# ---------------------------------------------------------------------------

def q_kg_sparql_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL UNION / MINUS / FILTER-regex in one algebra tree —
    the set-operator half of the SPARQL 1.1 surface (BGP/OPTIONAL/
    NOT-EXISTS/paths/aggregates/ASK/DESCRIBE/CONSTRUCT are covered by
    their own paired queries):

        SELECT ?t ?c ?src WHERE {
          { ?t <mentions> ?c }  UNION  { ?t <uses_tool> ?c }
          MINUS { ?t <replies_to> ?u }          # opening turns only
          FILTER regex(?c, '^(dq:B|tool:)')     # branch concepts/tools
        }

    Shape: two filtered projections UNION ALL'd, one left-anti join
    (MINUS on the shared binding), one JVM regex filter — no windows,
    no cross joins."""
    t = q_kg_triples(spark, sf_dir).select("subj", "pred", "obj")
    m = (t.filter(F.col("pred") == "mentions")
         .select(F.col("subj").alias("t"), F.col("obj").alias("c"),
                 F.lit("mentions").alias("src")))
    u = (t.filter(F.col("pred") == "uses_tool")
         .select(F.col("subj").alias("t"), F.col("obj").alias("c"),
                 F.lit("uses_tool").alias("src")))
    openers_minus = (t.filter(F.col("pred") == "replies_to")
                     .select(F.col("subj").alias("t")).distinct())
    return (m.unionByName(u)
            .filter(F.col("c").rlike("^(dq:B|tool:)"))
            .join(openers_minus, "t", "left_anti")
            .distinct())


def _sql_kg_sparql_setops() -> str:
    return f"""
WITH triples AS MATERIALIZED ({_sql_kg_triples_body()}),
branches AS (
  SELECT subj AS t, obj AS c, 'mentions' AS src
  FROM triples WHERE pred = 'mentions'
  UNION ALL
  SELECT subj AS t, obj AS c, 'uses_tool' AS src
  FROM triples WHERE pred = 'uses_tool')
SELECT DISTINCT t, c, src
FROM branches b
WHERE regexp_matches(c, '^(dq:B|tool:)')
  AND NOT EXISTS (SELECT 1 FROM triples r
                  WHERE r.pred = 'replies_to' AND r.subj = b.t)
"""


def q_kg_reify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDF reification of the extracted graph [K: rdf:Statement]:
    content-addressed statement IRIs + the four standard triples per
    fact — the provenance attachment point. Map-only."""
    from ..operators.construct import reify_triples
    return reify_triples(q_kg_triples(spark, sf_dir).select(
        "subj", "pred", "obj"))


def _sql_kg_reify() -> str:
    return f"""
WITH triples AS (
  SELECT DISTINCT subj, pred, obj FROM ({_sql_kg_triples_body()})),
stmt AS (
  SELECT 'stmt:' || substr(md5(subj || '#' || pred || '#' || obj), 1, 16)
           AS stmt,
         subj, pred, obj
  FROM triples)
SELECT stmt AS subj, 'rdf:type' AS pred, 'rdf:Statement' AS obj FROM stmt
UNION ALL
SELECT stmt, 'rdf:subject', subj FROM stmt
UNION ALL
SELECT stmt, 'rdf:predicate', pred FROM stmt
UNION ALL
SELECT stmt, 'rdf:object', obj FROM stmt
"""


def q_kg_void_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VoID self-description of the extracted graph [K: W3C VoID]:
    dataset-level triple/subject/object/property counts plus one
    property partition per predicate, emitted as triples. One global
    distinct agg + one predicate-keyed hash agg."""
    from ..operators.construct import void_description
    return void_description(q_kg_triples(spark, sf_dir).select(
        "subj", "pred", "obj"))


def _sql_kg_void_stats() -> str:
    return f"""
WITH triples AS MATERIALIZED (
  SELECT DISTINCT subj, pred, obj FROM ({_sql_kg_triples_body()})),
g AS (
  SELECT count(*) AS n_triples, count(DISTINCT subj) AS n_subj,
         count(DISTINCT obj) AS n_obj, count(DISTINCT pred) AS n_pred
  FROM triples),
pp AS (SELECT pred, count(*) AS n FROM triples GROUP BY 1)
SELECT 'dataset:kg' AS subj, 'rdf:type' AS pred, 'void:Dataset' AS obj
FROM g
UNION ALL
SELECT 'dataset:kg', 'void:triples', CAST(n_triples AS VARCHAR) FROM g
UNION ALL
SELECT 'dataset:kg', 'void:distinctSubjects', CAST(n_subj AS VARCHAR) FROM g
UNION ALL
SELECT 'dataset:kg', 'void:distinctObjects', CAST(n_obj AS VARCHAR) FROM g
UNION ALL
SELECT 'dataset:kg', 'void:properties', CAST(n_pred AS VARCHAR) FROM g
UNION ALL
SELECT 'dataset:kg' || '#' || pred, 'void:property', pred FROM pp
UNION ALL
SELECT 'dataset:kg' || '#' || pred, 'void:triples', CAST(n AS VARCHAR) FROM pp
UNION ALL
SELECT 'dataset:kg', 'void:propertyPartition', 'dataset:kg' || '#' || pred
FROM pp
"""


# ---------------------------------------------------------------------------
# wave 15: robust outliers, sequential patterns, token-budgeted mixture,
# closeness centrality over the concept co-occurrence projection
# ---------------------------------------------------------------------------

#: rel_seq_patterns: minimum support for a reported trigram
SEQ_MIN_SUPPORT = 3
#: curation_token_budget: per-domain whitespace-token budget
TOKEN_BUDGET = 800
#: kg_closeness: co-occurrence edge floor / BFS hop bound
CLOSENESS_MIN_CONVS = 2
CLOSENESS_MAX_HOPS = 4


def q_rel_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection (median / MAD, the textbook
    3-sigma-equivalent rule |x - med| > 3·1.4826·MAD) on event values.
    Exact integers end to end: values in doubled micro-units so both
    engines' linear-interpolated medians land on integers (midpoint of
    two even bigints), and the outlier predicate cross-multiplies
    (dev2·10000 > 22239·mad4) instead of dividing. Three passes over
    events (median, MAD, flag) — each a hash agg + broadcast join of a
    type-cardinality-sized table back onto the scan; at 100 TB swap
    the exact percentile for approx_percentile and keep the shape."""
    e = _tbl(spark, sf_dir, "events")
    v = e.select("event_type", F.expr(
        "2 * CAST(floor(value * 1000000) AS BIGINT)").alias("v2"))
    g1 = v.groupBy("event_type").agg(
        F.expr("CAST(percentile(v2, 0.5) AS BIGINT)").alias("med2"),
        F.count(F.lit(1)).alias("n"))
    d = (v.join(F.broadcast(g1), "event_type")
         .withColumn("dev2", F.abs(F.col("v2") - F.col("med2"))))
    g2 = d.groupBy("event_type").agg(
        F.expr("CAST(percentile(2 * dev2, 0.5) AS BIGINT)").alias("mad4"))
    return (d.join(F.broadcast(g2), "event_type")
            .groupBy("event_type")
            .agg(F.max("n").cast("long").alias("n"),
                 F.max("med2").cast("long").alias("med2_micro"),
                 F.max("mad4").cast("long").alias("mad4_micro"),
                 F.sum(F.expr(
                     "CASE WHEN dev2 * 10000 > 22239 * mad4"
                     " THEN 1 ELSE 0 END")).cast("long")
                 .alias("n_outliers"))
            .withColumn("outlier_ppm", F.expr(
                "n_outliers * 1000000 DIV n").cast("long")))


SQL_REL_OUTLIERS = """
WITH v AS (
  SELECT event_type,
         2 * CAST(floor(value * 1000000) AS BIGINT) AS v2
  FROM events),
g1 AS (
  SELECT event_type, CAST(quantile_cont(v2, 0.5) AS BIGINT) AS med2,
         count(*) AS n
  FROM v GROUP BY 1),
d AS (
  SELECT v.event_type, abs(v2 - med2) AS dev2, n, med2
  FROM v JOIN g1 USING (event_type)),
g2 AS (
  SELECT event_type,
         CAST(quantile_cont(2 * dev2, 0.5) AS BIGINT) AS mad4
  FROM d GROUP BY 1)
SELECT d.event_type, CAST(max(d.n) AS BIGINT) AS n,
       CAST(max(d.med2) AS BIGINT) AS med2_micro,
       CAST(max(g2.mad4) AS BIGINT) AS mad4_micro,
       CAST(sum(CASE WHEN dev2 * 10000 > 22239 * mad4
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(sum(CASE WHEN dev2 * 10000 > 22239 * mad4
                THEN 1 ELSE 0 END) * 1000000 // max(d.n) AS BIGINT)
         AS outlier_ppm
FROM d JOIN g2 USING (event_type)
GROUP BY 1
"""


def q_rel_seq_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-3 sequential pattern mining over per-user event streams
    (the contiguous-trigram special case of PrefixSpan [K: Pei 2001]):
    lead() twice under a user-partitioned window, hash-agg support and
    distinct-user counts, floor at SEQ_MIN_SUPPORT. The window
    partitions by user_id, so the per-user history is the task unit at
    any scale; the pattern table is |types|^3-bounded."""
    e = _tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (e.select("user_id", F.col("event_type").alias("e1"),
                  F.lead("event_type", 1).over(w).alias("e2"),
                  F.lead("event_type", 2).over(w).alias("e3"))
         .filter(F.col("e2").isNotNull() & F.col("e3").isNotNull()))
    return (t.groupBy("e1", "e2", "e3")
            .agg(F.count(F.lit(1)).cast("long").alias("support"),
                 F.countDistinct("user_id").cast("long").alias("n_users"))
            .filter(F.col("support") >= SEQ_MIN_SUPPORT))


SQL_REL_SEQ_PATTERNS = f"""
WITH t AS (
  SELECT user_id, event_type AS e1,
         lead(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e2,
         lead(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e3
  FROM events)
SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS support,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM t WHERE e2 IS NOT NULL AND e3 IS NOT NULL
GROUP BY 1, 2, 3
HAVING count(*) >= {SEQ_MIN_SUPPORT}
"""


def q_curation_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted domain mixture (operators/curation.
    token_budget_mix): greedy longest-first prefix under a hard
    per-domain whitespace-token budget, reported as per-domain
    kept/dropped counts and exact-ppm budget fill."""
    from ..operators.curation import token_budget_mix
    return token_budget_mix(_docs(spark, sf_dir), TOKEN_BUDGET)


SQL_CURATION_TOKEN_BUDGET = rf"""
WITH toks AS (
  SELECT doc_id, source AS domain,
         len(list_filter(string_split_regex(trim(text), '\s+'),
                         t -> t <> '')) AS n_toks
  FROM documents),
c AS (
  SELECT domain, doc_id, n_toks,
         sum(n_toks) OVER (PARTITION BY domain
                           ORDER BY n_toks DESC, doc_id ASC
                           ROWS UNBOUNDED PRECEDING) AS cum
  FROM toks),
k AS (
  SELECT domain, n_toks,
         CASE WHEN cum <= {TOKEN_BUDGET} THEN 1 ELSE 0 END AS kept
  FROM c)
SELECT domain, CAST(sum(kept) AS BIGINT) AS n_kept,
       CAST(count(*) - sum(kept) AS BIGINT) AS n_dropped,
       CAST(sum(n_toks * kept) AS BIGINT) AS tokens_kept,
       CAST(sum(n_toks * (1 - kept)) AS BIGINT) AS tokens_dropped,
       CAST(sum(n_toks * kept) * 1000000 // {TOKEN_BUDGET} AS BIGINT)
         AS fill_ppm
FROM k GROUP BY 1
"""


def q_kg_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closeness + harmonic centrality of concepts over the
    co-occurrence projection (operators/graph.cooccurrence_edges →
    closeness_centrality): which concepts sit nearest the center of
    what the corpus talks about. The projection join is the
    distributed stage (keyed by conv_id); the all-pairs bounded BFS
    runs on the ontology-sized edge list. Oracle recomputes min
    distance as a depth-bounded recursive CTE."""
    from ..operators.graph import closeness_centrality, cooccurrence_edges
    edges = cooccurrence_edges(_mentions_df(spark, sf_dir),
                               min_convs=CLOSENESS_MIN_CONVS)
    return closeness_centrality(edges, max_hops=CLOSENESS_MAX_HOPS)


SQL_KG_CLOSENESS = f"""
WITH RECURSIVE {_MENTIONS_CTE},
cm AS (SELECT DISTINCT conv_id, concept_id FROM mentions),
edges AS (
  SELECT a.concept_id AS src, b.concept_id AS dst
  FROM cm a JOIN cm b USING (conv_id)
  WHERE a.concept_id <> b.concept_id
  GROUP BY 1, 2 HAVING count(*) >= {CLOSENESS_MIN_CONVS}),
nodes AS (SELECT DISTINCT src AS node FROM edges),
walk(bfs_src, node, d) AS (
  SELECT node, node, 0 FROM nodes
  UNION
  SELECT w.bfs_src, e.dst, w.d + 1
  FROM walk w JOIN edges e ON w.node = e.src
  WHERE w.d < {CLOSENESS_MAX_HOPS}),
dist AS (SELECT bfs_src, node, min(d) AS d FROM walk GROUP BY 1, 2),
per AS (
  SELECT bfs_src AS node, count(*) AS n_reach, sum(d) AS sum_dist,
         sum(1000000 // d) AS harmonic_ppm
  FROM dist WHERE d > 0 GROUP BY 1)
SELECT n.node, CAST(coalesce(p.n_reach, 0) AS BIGINT) AS n_reach,
       CAST(coalesce(p.sum_dist, 0) AS BIGINT) AS sum_dist,
       CAST(CASE WHEN coalesce(p.sum_dist, 0) > 0
            THEN p.n_reach * 1000000 // p.sum_dist ELSE 0 END AS BIGINT)
         AS closeness_ppm,
       CAST(coalesce(p.harmonic_ppm, 0) AS BIGINT) AS harmonic_ppm
FROM nodes n LEFT JOIN per p USING (node)
"""


# ---------------------------------------------------------------------------
# wave 16: count-min sketch frequency estimation, recency-decayed CDS
# ---------------------------------------------------------------------------


def q_stats_cms_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch token-frequency estimation
    (operators/sketch.cms_estimate) over the documents vocabulary:
    exact count, sketch estimate (min over 4 md5-bucketed counter
    rows of width 64), and the never-negative overestimate. The
    counter table is fixed-size regardless of vocabulary — the
    bounded-memory path for frequency queries over unbounded key
    domains; the vocabulary here is small enough that the oracle
    verifies every key's estimate, collisions included."""
    from ..operators.sketch import cms_estimate
    toks = _docs(spark, sf_dir).select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"))
    return cms_estimate(toks, "tok")


def _sql_stats_cms_tokens() -> str:
    from ..operators.sketch import CMS_DEPTH, CMS_WIDTH

    def b(i: int, key: str) -> str:
        h = f"md5('cms{i}:' || {key})"
        d0 = f"(strpos('0123456789abcdef', substr({h}, 1, 1)) - 1)"
        d1 = f"(strpos('0123456789abcdef', substr({h}, 2, 1)) - 1)"
        return f"(({d0} * 16 + {d1}) % {CMS_WIDTH})"

    pairs = "\n  UNION ALL ".join(
        f"SELECT {i} AS r, {b(i, 'tok')} AS bucket, tok FROM toks"
        for i in range(CMS_DEPTH))
    probe = "\n  UNION ALL ".join(
        f"SELECT tok, exact_n, {i} AS r, {b(i, 'tok')} AS bucket FROM exact"
        for i in range(CMS_DEPTH))
    return rf"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                            t -> t <> '')) AS tok
  FROM documents),
pairs AS (
  {pairs}),
sketch AS (SELECT r, bucket, count(*) AS c FROM pairs GROUP BY 1, 2),
exact AS (SELECT tok, count(*) AS exact_n FROM toks GROUP BY 1),
probe AS (
  {probe})
SELECT p.tok, CAST(p.exact_n AS BIGINT) AS exact_n,
       CAST(min(s.c) AS BIGINT) AS est_n,
       CAST(min(s.c) - p.exact_n AS BIGINT) AS overestimate
FROM probe p JOIN sketch s USING (r, bucket)
GROUP BY p.tok, p.exact_n
"""


def q_kg_decay_cds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed CDS: the conversation-level concept score where
    each canonical mention is discounted by how far it sits from the
    conversation's last turn (weight_ppm = 1e6 DIV (1 + age)) — the
    freshness-weighted variant of kg_cds for tagging what a LIVE
    conversation is about NOW rather than everything it ever touched.
    Exact integers: link_score enters as half-up ppm, the decay
    product is integer-divided back to ppm, max/count per (conv,
    concept). The last-turn window partitions by conv_id, so the
    per-conversation history is the task unit at any scale."""
    canon = q_kg_canonical(spark, sf_dir)
    w = Window.partitionBy("conv_id")
    x = (canon
         .withColumn("score_ppm", F.expr(
             "CAST(floor(link_score * 1000000 + 0.5) AS BIGINT)"))
         .withColumn("last_turn", F.max("turn_idx").over(w))
         .withColumn("dscore", F.expr(
             "(score_ppm * (1000000 DIV (1 + last_turn - turn_idx)))"
             " DIV 1000000")))
    return (x.groupBy(
        F.concat(F.lit("conv:"), F.col("conv_id")).alias("subj_key"),
        "concept_id")
        .agg(F.max("score_ppm").cast("long").alias("raw_ppm"),
             F.max("dscore").cast("long").alias("decayed_ppm"),
             F.count(F.lit(1)).cast("long").alias("n_mentions")))


def _sql_kg_decay_cds() -> str:
    return f"""
WITH canon AS ({_sql_kg_canonical_body()}),
x AS (
  SELECT conv_id, concept_id,
         CAST(floor(link_score * 1000000 + 0.5) AS BIGINT) AS score_ppm,
         (CAST(floor(link_score * 1000000 + 0.5) AS BIGINT)
          * (1000000 // (1 + max(turn_idx) OVER (PARTITION BY conv_id)
                         - turn_idx))) // 1000000 AS dscore
  FROM canon)
SELECT 'conv:' || conv_id AS subj_key, concept_id,
       CAST(max(score_ppm) AS BIGINT) AS raw_ppm,
       CAST(max(dscore) AS BIGINT) AS decayed_ppm,
       CAST(count(*) AS BIGINT) AS n_mentions
FROM x GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# wave 17: 2-D skyline (Pareto front) and predicate co-occurrence summary
# ---------------------------------------------------------------------------


def q_rel_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source 2-D skyline (Pareto front) over documents, maximizing
    (n_chars, distinct whitespace tokens): a doc survives unless some
    other doc in its source is >= on both dimensions and > on one.
    No quadratic self-join: sorted running aggregates decide dominance
    exactly — a RANGE frame bounded at 1 PRECEDING on n_chars DESC
    captures 'strictly longer' dominators' best token count, and a
    (source, n_chars) group max captures equal-length dominators; ties
    on both dimensions are co-skyline (no strict edge). Both windows
    partition by source, so the per-source frontier is the task unit
    at any scale."""
    d = _docs(spark, sf_dir)
    base = d.select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"),
        F.size(F.array_distinct(
            F.split(F.trim(F.col("text")), r"\s+")))
        .cast("long").alias("distinct_toks"))
    w_strict = (Window.partitionBy("source")
                .orderBy(F.desc("n_chars"))
                .rangeBetween(Window.unboundedPreceding, -1))
    w_equal = Window.partitionBy("source", "n_chars")
    x = (base
         .withColumn("best_dt_longer", F.max("distinct_toks").over(w_strict))
         .withColumn("best_dt_equal", F.max("distinct_toks").over(w_equal)))
    return (x.filter(
        (F.col("best_dt_longer").isNull()
         | (F.col("best_dt_longer") < F.col("distinct_toks")))
        & (F.col("best_dt_equal") <= F.col("distinct_toks")))
        .select("source", "doc_id", "n_chars", "distinct_toks"))


SQL_REL_SKYLINE = r"""
WITH base AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
         CAST(len(list_distinct(list_filter(
             string_split_regex(trim(text), '\s+'), t -> t <> '')))
           AS BIGINT) AS distinct_toks
  FROM documents),
x AS (
  SELECT *,
         max(distinct_toks) OVER (
             PARTITION BY source ORDER BY n_chars DESC
             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_dt_longer,
         max(distinct_toks) OVER (PARTITION BY source, n_chars)
           AS best_dt_equal
  FROM base)
SELECT source, doc_id, n_chars, distinct_toks
FROM x
WHERE (best_dt_longer IS NULL OR best_dt_longer < distinct_toks)
  AND best_dt_equal <= distinct_toks
"""


def q_kg_pred_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate co-occurrence schema summary: for every unordered
    predicate pair, how many subjects carry BOTH (the LODStats-style
    'which properties travel together' profile), with exact-ppm
    Jaccard over the per-predicate subject sets. One subj-keyed
    self-join of the distinct (subj, pred) table — per-subject
    predicate sets are rule-bounded (3 predicates here), so the join
    fan-out is constant per subject at any corpus size."""
    sp = (q_kg_triples(spark, sf_dir)
          .select("subj", "pred").distinct())
    a = sp.alias("a")
    b = sp.alias("b")
    co = (a.join(b, "subj")
          .filter(F.col("a.pred") < F.col("b.pred"))
          .groupBy(F.col("a.pred").alias("pred_a"),
                   F.col("b.pred").alias("pred_b"))
          .agg(F.count(F.lit(1)).cast("long").alias("n_both")))
    per = sp.groupBy("pred").agg(F.count(F.lit(1)).alias("n_subj"))
    return (co
            .join(F.broadcast(per.select(F.col("pred").alias("pred_a"),
                                         F.col("n_subj").alias("n_a"))),
                  "pred_a")
            .join(F.broadcast(per.select(F.col("pred").alias("pred_b"),
                                         F.col("n_subj").alias("n_b"))),
                  "pred_b")
            .select("pred_a", "pred_b", "n_both",
                    F.col("n_a").cast("long").alias("n_a"),
                    F.col("n_b").cast("long").alias("n_b"),
                    F.expr("n_both * 1000000"
                           " DIV (n_a + n_b - n_both)").cast("long")
                    .alias("jaccard_ppm")))


def _sql_kg_pred_cooccur() -> str:
    return f"""
WITH triples AS MATERIALIZED ({_sql_kg_triples_body()}),
sp AS (SELECT DISTINCT subj, pred FROM triples),
co AS (
  SELECT a.pred AS pred_a, b.pred AS pred_b, count(*) AS n_both
  FROM sp a JOIN sp b USING (subj)
  WHERE a.pred < b.pred
  GROUP BY 1, 2),
per AS (SELECT pred, count(*) AS n_subj FROM sp GROUP BY 1)
SELECT co.pred_a, co.pred_b, CAST(co.n_both AS BIGINT) AS n_both,
       CAST(pa.n_subj AS BIGINT) AS n_a,
       CAST(pb.n_subj AS BIGINT) AS n_b,
       CAST(co.n_both * 1000000
            // (pa.n_subj + pb.n_subj - co.n_both) AS BIGINT)
         AS jaccard_ppm
FROM co
JOIN per pa ON pa.pred = co.pred_a
JOIN per pb ON pb.pred = co.pred_b
"""


# ---------------------------------------------------------------------------
# Wave 18: histogram-sketch quantiles, collective entity linking,
# nearest-event temporal join.
# ---------------------------------------------------------------------------

BINQ_WIDTH_CENTS = 10_000        # $100 bins over l_extendedprice
BINQ_SHARD_BINS = 64             # bins per cumulative-sum shard
BINQ_QUANTILES_PPM = (250_000, 500_000, 750_000, 900_000, 990_000)
COLLECTIVE_TOP_K = 5             # candidate set: self + 4 wup-nearest
COLLECTIVE_W_PRIOR = 2           # linker-prior weight in the blend
COLLECTIVE_W_CTX = 5             # conversation-coherence weight
# (2,5) flips ~11% of fixture picks: a neighbor wins only when its
# average-wup coherence advantage exceeds 2/5 of its prior deficit.


def q_stats_binned_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable histogram-sketch quantiles — the 100-TB quantile path.

    ``rel_percentiles`` is the exact sort-based answer; at 10^12 rows
    you ship a SKETCH instead: one map-side-combinable groupBy builds a
    fixed-width histogram (O(bins) state per executor, mergeable across
    any partitioning — the same contract as approx_percentile, but
    engine-portable and exactly replayable in SQL). Quantile readout is
    a prefix sum over the O(bins) histogram: cumulated per bin-shard
    with a KEYED window, cross-shard offsets collected to the driver at
    O(shards) rows — never O(data) — and rebroadcast (the
    interleave_domains pattern). Each requested quantile then selects
    the first bin whose cumulative count reaches ceil(q*N) via a
    5-row broadcast join. Answer granularity = one bin width, the
    sketch's documented contract."""
    li = _tbl(spark, sf_dir, "lineitem")
    base = li.select(F.round(F.col("l_extendedprice") * 100)
                     .cast("long").alias("cents"))
    hist = (base.select(F.expr(f"cents DIV {BINQ_WIDTH_CENTS}").alias("bin"))
            .groupBy("bin").agg(F.count(F.lit(1)).alias("n")))
    sh = hist.withColumn(
        "shard", F.expr(f"bin DIV {BINQ_SHARD_BINS}").cast("int"))
    w = Window.partitionBy("shard").orderBy("bin")
    cum_local = sh.withColumn("cum_in_shard", F.sum("n").over(w))
    # O(shards) driver state, exactly like interleave_domains' offsets
    totals = {r["shard"]: r["t"] for r in
              sh.groupBy("shard").agg(F.sum("n").alias("t")).collect()}
    offsets, acc = [], 0
    for s in sorted(totals):
        offsets.append((s, acc))
        acc += totals[s]
    total = acc
    off = spark.createDataFrame(offsets, "shard int, _off long")
    cum = (cum_local.join(F.broadcast(off), "shard")
           .select("bin", "n",
                   (F.col("_off") + F.col("cum_in_shard")).alias("cum")))
    qdf = spark.createDataFrame([(q,) for q in BINQ_QUANTILES_PPM],
                                "q_ppm long").withColumn(
        "thresh", F.expr(f"(q_ppm * {total}L + 999999) DIV 1000000"))
    sel = (cum.join(F.broadcast(qdf), F.col("cum") >= F.col("thresh"))
           .groupBy("q_ppm").agg(F.min("bin").alias("bin")))
    return (sel.join(cum, "bin")
            .select("q_ppm", "bin",
                    (F.col("bin") * BINQ_WIDTH_CENTS).alias("lo_cents"),
                    ((F.col("bin") + 1) * BINQ_WIDTH_CENTS - 1)
                    .alias("hi_cents"),
                    F.col("cum").cast("long").alias("cum_n"),
                    F.lit(total).cast("long").alias("total_n")))


SQL_STATS_BINNED_QUANTILES = f"""
WITH base AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem),
hist AS (
  SELECT cents // {BINQ_WIDTH_CENTS} AS bin, count(*) AS n
  FROM base GROUP BY 1),
cumu AS (
  SELECT bin, n, sum(n) OVER (ORDER BY bin) AS cum FROM hist),
tot AS (SELECT sum(n) AS total FROM hist),
q(q_ppm) AS (VALUES {', '.join(f'({v})' for v in BINQ_QUANTILES_PPM)}),
sel AS (
  SELECT q.q_ppm, min(c.bin) AS bin
  FROM q, tot, cumu c
  WHERE c.cum >= (q.q_ppm * tot.total + 999999) // 1000000
  GROUP BY 1)
SELECT CAST(s.q_ppm AS BIGINT) AS q_ppm, s.bin,
       s.bin * {BINQ_WIDTH_CENTS} AS lo_cents,
       (s.bin + 1) * {BINQ_WIDTH_CENTS} - 1 AS hi_cents,
       CAST(c.cum AS BIGINT) AS cum_n,
       CAST(t.total AS BIGINT) AS total_n
FROM sel s JOIN cumu c ON c.bin = s.bin CROSS JOIN tot t
"""


def q_kg_collective_linking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collective entity disambiguation (document-coherence re-rank —
    the Cucerzan / Milne-Witten shape [K]): a candidate concept is
    scored by its TAXONOMY COHERENCE with the conversation's other
    top-1 links — the sum of Wu-Palmer similarity (exact-integer ppm)
    to every other mention's independent pick, its own contribution
    excluded — and the final pick maximizes (coherence, cos_sim,
    concept_id). An ambiguous surface is thus pulled toward the
    ontology branch the conversation is actually about instead of
    being linked in isolation. Shapes: the per-conversation concept
    profile is a two-level hash agg; both wup joins broadcast the
    O(|ontology|²) similarity table; the candidate × profile join keys
    on conv_id, whose fan-out is bounded by concepts-per-conversation
    (ontology-bounded) — the conversation is the task unit at any
    scale. ``changed`` marks mentions the context flipped.

    Candidate generation: the exact-match linker is single-point
    (driver_scores maps each surface to ONE concept at sim 1.0), so the
    candidate set is widened by taxonomy neighborhood — the gazetteer
    concept plus its top-(K-1) WuP-nearest concepts, each carrying its
    wup as the candidate prior (``sim_ppm``; the direct hit scores the
    full 10^6). This is the standard recall-widening move when the
    entity linker emits point estimates."""
    mentions = (_mentions_df(spark, sf_dir)
                .select("conv_id", "turn_idx", "surface",
                        F.col("concept_id").alias("base_concept"))
                .distinct())
    wupp = _wup_df(spark).select(
        "concept_a", "concept_b",
        F.round(F.col("wup") * 1_000_000).cast("long").alias("wup_ppm"))
    wk = Window.partitionBy("concept_a").orderBy(
        F.desc("wup_ppm"), F.asc("concept_b"))
    # wup(a,a)=1.0 ranks first, so self is always in the candidate set
    wupk = (wupp.withColumn("krnk", F.row_number().over(wk))
            .filter(F.col("krnk") <= COLLECTIVE_TOP_K))
    cands = (mentions
             .join(F.broadcast(wupk.select(
                 F.col("concept_a").alias("base_concept"),
                 F.col("concept_b").alias("concept_id"),
                 F.col("wup_ppm").alias("sim_ppm"))), "base_concept"))
    profile = (mentions.groupBy("conv_id", F.col("base_concept")
                                .alias("ctx_concept"))
               .agg(F.count(F.lit(1)).alias("n")))
    coh = (cands
           .join(profile, "conv_id")
           .join(F.broadcast(wupp),
                 (F.col("concept_id") == F.col("concept_a"))
                 & (F.col("ctx_concept") == F.col("concept_b")))
           .groupBy("conv_id", "turn_idx", "surface", "base_concept",
                    "concept_id", "sim_ppm")
           .agg(F.sum(F.col("n") * F.col("wup_ppm")).alias("coh_all")))
    own = wupp.select(F.col("concept_a").alias("concept_id"),
                      F.col("concept_b").alias("base_concept"),
                      F.col("wup_ppm").alias("own_ppm"))
    nm = mentions.groupBy("conv_id").agg(F.count(F.lit(1)).alias("nm"))
    scored = (coh
              .join(F.broadcast(own), ["concept_id", "base_concept"])
              .join(nm, "conv_id")
              .withColumn("vote", F.col("coh_all") - F.col("own_ppm"))
              .withColumn("coh_ppm", F.when(
                  F.col("nm") > 1,
                  F.expr("vote DIV (nm - 1)")).otherwise(F.lit(0)))
              .withColumn("score",
                          COLLECTIVE_W_PRIOR * F.col("sim_ppm")
                          + COLLECTIVE_W_CTX * F.col("coh_ppm")))
    w = Window.partitionBy("conv_id", "turn_idx", "surface").orderBy(
        F.desc("score"), F.desc("sim_ppm"), F.asc("concept_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("conv_id", "turn_idx", "surface", "concept_id",
                    F.col("sim_ppm").cast("long").alias("sim_ppm"),
                    F.col("coh_ppm").cast("long").alias("coh_ppm"),
                    F.col("score").cast("long").alias("score"),
                    (F.col("concept_id") != F.col("base_concept"))
                    .cast("long").alias("changed")))


def _sql_kg_collective_linking() -> str:
    wu = values_sql(driver_wup(), "w")
    return f"""
WITH {_MENTIONS_CTE},
m AS (
  SELECT DISTINCT conv_id, turn_idx, surface,
         concept_id AS base_concept
  FROM mentions),
wupp AS (
  SELECT concept_a, concept_b,
         CAST(round(wup * 1000000) AS BIGINT) AS wup_ppm
  FROM {wu}),
wupk AS (
  SELECT * FROM (
    SELECT concept_a, concept_b, wup_ppm,
           row_number() OVER (PARTITION BY concept_a
                              ORDER BY wup_ppm DESC, concept_b ASC) AS krnk
    FROM wupp)
  WHERE krnk <= {COLLECTIVE_TOP_K}),
cands AS (
  SELECT m.conv_id, m.turn_idx, m.surface, m.base_concept,
         k.concept_b AS concept_id, k.wup_ppm AS sim_ppm
  FROM m JOIN wupk k ON k.concept_a = m.base_concept),
profile AS (
  SELECT conv_id, base_concept AS ctx_concept, count(*) AS n
  FROM m GROUP BY 1, 2),
coh AS (
  SELECT c.conv_id, c.turn_idx, c.surface, c.base_concept,
         c.concept_id, c.sim_ppm,
         sum(p.n * w.wup_ppm) AS coh_all
  FROM cands c
  JOIN profile p ON p.conv_id = c.conv_id
  JOIN wupp w ON w.concept_a = c.concept_id
             AND w.concept_b = p.ctx_concept
  GROUP BY 1, 2, 3, 4, 5, 6),
nm AS (SELECT conv_id, count(*) AS nm FROM m GROUP BY 1),
scored AS (
  SELECT coh.*,
         CASE WHEN nm.nm > 1
              THEN (coh.coh_all - w2.wup_ppm) // (nm.nm - 1)
              ELSE 0 END AS coh_ppm
  FROM coh
  JOIN wupp w2 ON w2.concept_a = coh.concept_id
              AND w2.concept_b = coh.base_concept
  JOIN nm ON nm.conv_id = coh.conv_id),
pick AS (
  SELECT *, {COLLECTIVE_W_PRIOR} * sim_ppm
              + {COLLECTIVE_W_CTX} * coh_ppm AS score,
         row_number() OVER (
      PARTITION BY conv_id, turn_idx, surface
      ORDER BY {COLLECTIVE_W_PRIOR} * sim_ppm
                 + {COLLECTIVE_W_CTX} * coh_ppm DESC,
               sim_ppm DESC, concept_id ASC) AS rn
  FROM scored)
SELECT conv_id, turn_idx, surface, concept_id,
       CAST(sim_ppm AS BIGINT) AS sim_ppm,
       CAST(coh_ppm AS BIGINT) AS coh_ppm,
       CAST(score AS BIGINT) AS score,
       CAST(CASE WHEN concept_id <> base_concept THEN 1 ELSE 0 END
            AS BIGINT) AS changed
FROM pick WHERE rn = 1
"""


def q_rel_nearest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-event temporal join (pandas merge_asof
    direction='nearest', distributed): each click pairs with the SAME
    user's closest purchase in absolute time — backward carry via
    last(ignorenulls) over the preceding frame, forward via
    first(ignorenulls) over the following frame, nearer one wins, tie
    to the earlier purchase. Both windows partition by user_id (the
    task unit), so unlike the global as-of this never needs a range
    repartition: per-user event streams are the natural shard."""
    ev = _tbl(spark, sf_dir, "events")
    x = (ev.filter(F.col("event_type").isin("click", "purchase"))
         .select("event_id", "user_id", "event_type",
                 F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"))
         .withColumn("pid", F.when(F.col("event_type") == "purchase",
                                   F.col("event_id")))
         .withColumn("pts", F.when(F.col("event_type") == "purchase",
                                   F.col("ts_us"))))
    order = [F.col("ts_us"), F.col("event_id")]
    w_prev = (Window.partitionBy("user_id").orderBy(*order)
              .rowsBetween(Window.unboundedPreceding, 0))
    w_next = (Window.partitionBy("user_id").orderBy(*order)
              .rowsBetween(0, Window.unboundedFollowing))
    y = (x.withColumn("prev_pid", F.last("pid", True).over(w_prev))
         .withColumn("prev_pts", F.last("pts", True).over(w_prev))
         .withColumn("next_pid", F.first("pid", True).over(w_next))
         .withColumn("next_pts", F.first("pts", True).over(w_next)))
    clicks = y.filter(F.col("event_type") == "click")
    d_prev = F.col("ts_us") - F.col("prev_pts")
    d_next = F.col("next_pts") - F.col("ts_us")
    take_prev = F.col("prev_pid").isNotNull() & (
        F.col("next_pid").isNull() | (d_prev <= d_next))
    return (clicks
            .withColumn("purchase_id",
                        F.when(take_prev, F.col("prev_pid"))
                        .otherwise(F.col("next_pid")))
            .withColumn("purchase_ts_us",
                        F.when(take_prev, F.col("prev_pts"))
                        .otherwise(F.col("next_pts")))
            .filter(F.col("purchase_id").isNotNull())
            .select("event_id", "user_id", "ts_us",
                    "purchase_id", "purchase_ts_us",
                    F.abs(F.col("purchase_ts_us") - F.col("ts_us"))
                    .alias("delta_us"),
                    F.when(take_prev, F.lit("backward"))
                    .otherwise(F.lit("forward")).alias("direction")))


SQL_REL_NEAREST_EVENT = """
WITH x AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
         CASE WHEN event_type = 'purchase' THEN event_id END AS pid,
         CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END AS pts
  FROM events WHERE event_type IN ('click', 'purchase')),
y AS (
  SELECT *,
         last_value(pid IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_pid,
         last_value(pts IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_pts,
         first_value(pid IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_pid,
         first_value(pts IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_pts
  FROM x),
clicks AS (
  SELECT *,
         (prev_pid IS NOT NULL AND (next_pid IS NULL
              OR ts_us - prev_pts <= next_pts - ts_us)) AS take_prev
  FROM y WHERE event_type = 'click')
SELECT event_id, user_id, ts_us,
       CASE WHEN take_prev THEN prev_pid ELSE next_pid END AS purchase_id,
       CASE WHEN take_prev THEN prev_pts ELSE next_pts END AS purchase_ts_us,
       abs(CASE WHEN take_prev THEN prev_pts ELSE next_pts END - ts_us)
         AS delta_us,
       CASE WHEN take_prev THEN 'backward' ELSE 'forward' END AS direction
FROM clicks
WHERE CASE WHEN take_prev THEN prev_pid ELSE next_pid END IS NOT NULL
"""


# ---------------------------------------------------------------------------
# Wave 19: concept transition graph, KMV distinct sketch, FK discovery.
# ---------------------------------------------------------------------------

KMV_K = 64                       # k-minimum-values sketch size
KMV_PREFIX_HEX = 12              # 48-bit hash prefix (exact in BIGINT)
KMV_SPACE = 16 ** KMV_PREFIX_HEX


def q_kg_concept_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order concept transition graph over conversations: how
    often concept A in turn t is followed by concept B in turn t+1 —
    the Markov chain a dialogue planner or next-topic recommender
    trains on. Turn-adjacent equi-join keyed on (conv_id, turn_idx+1)
    (the conversation is the join's task unit), two-level hash agg for
    the edge counts, and the per-source totals rejoin keyed on the
    source concept; transition probability in exact ppm."""
    m = (_mentions_df(spark, sf_dir)
         .select("conv_id", "turn_idx", "concept_id").distinct())
    a = m.alias("a")
    b = m.alias("b")
    trans = (a.join(b, (F.col("a.conv_id") == F.col("b.conv_id"))
                    & (F.col("b.turn_idx") == F.col("a.turn_idx") + 1))
             .groupBy(F.col("a.concept_id").alias("src"),
                      F.col("b.concept_id").alias("dst"))
             .agg(F.count(F.lit(1)).alias("n")))
    tot = trans.groupBy("src").agg(F.sum("n").alias("n_out"))
    return (trans.join(tot, "src")
            .select("src", "dst", F.col("n").cast("long").alias("n"),
                    F.col("n_out").cast("long").alias("n_out"),
                    F.expr("n * 1000000 DIV n_out").cast("long")
                    .alias("p_ppm")))


def _sql_kg_concept_transitions() -> str:
    return f"""
WITH {_MENTIONS_CTE},
m AS (SELECT DISTINCT conv_id, turn_idx, concept_id FROM mentions),
trans AS (
  SELECT a.concept_id AS src, b.concept_id AS dst, count(*) AS n
  FROM m a JOIN m b ON b.conv_id = a.conv_id
                   AND b.turn_idx = a.turn_idx + 1
  GROUP BY 1, 2),
tot AS (SELECT src, sum(n) AS n_out FROM trans GROUP BY 1)
SELECT t.src, t.dst, CAST(t.n AS BIGINT) AS n,
       CAST(o.n_out AS BIGINT) AS n_out,
       CAST(t.n * 1000000 // o.n_out AS BIGINT) AS p_ppm
FROM trans t JOIN tot o ON o.src = t.src
"""


def q_stats_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-cardinality sketch [K], the
    mergeable bounded-state estimator — unlike HLL++ it is exactly
    replayable cross-engine because its state is just the K smallest
    md5 values: est = (K-1) * HASH_SPACE / v_K. The k-smallest scan is
    TakeOrdered (per-partition partial top-k, no full sort); the
    distinct pre-step is a hash agg on the hash itself (O(distinct)
    shuffle). Emitted next to the exact count as a QA row so the
    sketch's error is part of the record."""
    o = _tbl(spark, sf_dir, "orders")
    h = (o.select(F.md5(F.col("o_custkey").cast("string")).alias("h"))
         .distinct())
    kth = (h.orderBy("h").limit(KMV_K)
           .orderBy(F.desc("h")).limit(1)
           .select(F.conv(F.substring("h", 1, KMV_PREFIX_HEX), 16, 10)
                   .cast("long").alias("vk")))
    exact = h.agg(F.count(F.lit(1)).alias("exact_distinct"))
    return (kth.join(exact)
            .select(F.lit(KMV_K).cast("long").alias("k"),
                    F.col("vk"),
                    F.expr(f"{(KMV_K - 1) * KMV_SPACE}L DIV vk")
                    .cast("long").alias("est_distinct"),
                    F.col("exact_distinct").cast("long")
                    .alias("exact_distinct"),
                    F.expr(f"(({(KMV_K - 1) * KMV_SPACE}L DIV vk)"
                           " * 1000000) DIV exact_distinct")
                    .cast("long").alias("ratio_ppm")))


def _sql_stats_kmv_distinct() -> str:
    dig = " + ".join(
        f"(instr('0123456789abcdef', substring(h, {i + 1}, 1)) - 1) "
        f"* {16 ** (KMV_PREFIX_HEX - 1 - i)}::BIGINT"
        for i in range(KMV_PREFIX_HEX))
    return f"""
WITH h AS (
  SELECT DISTINCT md5(CAST(o_custkey AS VARCHAR)) AS h FROM orders),
topk AS (SELECT h FROM h ORDER BY h LIMIT {KMV_K}),
kth AS (SELECT max(h) AS h FROM topk),
dec AS (SELECT {dig} AS vk FROM kth),
ex AS (SELECT count(*) AS exact_distinct FROM h)
SELECT CAST({KMV_K} AS BIGINT) AS k,
       CAST(d.vk AS BIGINT) AS vk,
       CAST({(KMV_K - 1) * KMV_SPACE} // d.vk AS BIGINT) AS est_distinct,
       CAST(e.exact_distinct AS BIGINT) AS exact_distinct,
       CAST(({(KMV_K - 1) * KMV_SPACE} // d.vk) * 1000000
            // e.exact_distinct AS BIGINT) AS ratio_ppm
FROM dec d CROSS JOIN ex e
"""


# candidate inclusion dependencies: (child table, child col, parent
# table, parent col). The last is a deliberate non-FK control pair.
FK_CANDIDATES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("orders", "o_custkey", "supplier", "s_suppkey"),
]


def q_rel_fk_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency mining (the FK-discovery profile a
    relational-to-KG direct mapping runs first [K]): for each candidate
    (child.col → parent.col) pair, the fraction of DISTINCT child
    values contained in the parent — containment 10^6 ppm == a foreign
    key holds. Each pair is a distinct-project + one left-semi equi
    join (shuffle O(distinct values), the profiling lower bound); the
    per-pair outputs are 1-row aggregates unioned together. The last
    candidate is a deliberate negative control so the report proves it
    can reject."""
    from functools import reduce
    rows = []
    for ct, cc, pt, pc in FK_CANDIDATES:
        child = (_tbl(spark, sf_dir, ct)
                 .select(F.col(cc).cast("long").alias("v")).distinct())
        parent = (_tbl(spark, sf_dir, pt)
                  .select(F.col(pc).cast("long").alias("v")).distinct())
        contained = child.join(parent, "v", "left_semi")
        stats = (child.agg(F.count(F.lit(1)).alias("n_child"))
                 .join(contained.agg(
                     F.count(F.lit(1)).alias("n_contained"))))
        rows.append(stats.select(
            F.lit(f"{ct}.{cc}").alias("child_col"),
            F.lit(f"{pt}.{pc}").alias("parent_col"),
            F.col("n_child").cast("long").alias("n_child"),
            F.col("n_contained").cast("long").alias("n_contained"),
            F.expr("n_contained * 1000000 DIV n_child").cast("long")
            .alias("containment_ppm"),
            (F.col("n_contained") == F.col("n_child")).cast("long")
            .alias("is_fk")))
    return reduce(lambda x, y: x.unionByName(y), rows)


def _sql_rel_fk_discovery() -> str:
    parts = []
    for ct, cc, pt, pc in FK_CANDIDATES:
        parts.append(f"""
SELECT '{ct}.{cc}' AS child_col, '{pt}.{pc}' AS parent_col,
       CAST(n_child AS BIGINT) AS n_child,
       CAST(n_contained AS BIGINT) AS n_contained,
       CAST(n_contained * 1000000 // n_child AS BIGINT)
         AS containment_ppm,
       CAST(CASE WHEN n_contained = n_child THEN 1 ELSE 0 END AS BIGINT)
         AS is_fk
FROM (
  SELECT (SELECT count(DISTINCT {cc}) FROM {ct}) AS n_child,
         (SELECT count(*) FROM (SELECT DISTINCT {cc} FROM {ct}) c
          WHERE c.{cc} IN (SELECT {pc} FROM {pt})) AS n_contained)""")
    return "\nUNION ALL\n".join(parts)


# ---------------------------------------------------------------------------
# Wave 20: per-concept entity cards, contrastive training triplets.
# ---------------------------------------------------------------------------


def q_kg_entity_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity card materialization — the per-concept profile a KG
    browser or entity-page service precomputes: mention volume,
    conversation reach, surface-form diversity, and the concept's
    strongest co-occurring neighbor (by shared-conversation count,
    deterministic tie to the smaller id). Two-level hash aggs
    throughout; the neighbor rank is a window PARTITIONED BY concept —
    the concept is the task unit at any scale."""
    m = (_mentions_df(spark, sf_dir)
         .select("conv_id", "turn_idx", "surface", "concept_id"))
    base = (m.groupBy("concept_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_mentions"),
        F.countDistinct("conv_id").cast("long").alias("n_convs"),
        F.countDistinct("surface").cast("long").alias("n_surfaces")))
    cc = m.select("conv_id", "concept_id").distinct()
    a = cc.alias("a")
    b = cc.alias("b")
    co = (a.join(b, (F.col("a.conv_id") == F.col("b.conv_id"))
                 & (F.col("a.concept_id") != F.col("b.concept_id")))
          .groupBy(F.col("a.concept_id").alias("concept_id"),
                   F.col("b.concept_id").alias("co_concept"))
          .agg(F.count(F.lit(1)).cast("long").alias("n_shared")))
    w = Window.partitionBy("concept_id").orderBy(
        F.desc("n_shared"), F.asc("co_concept"))
    top_co = (co.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") == 1)
              .select("concept_id", F.col("co_concept").alias("top_co"),
                      F.col("n_shared").alias("top_co_n")))
    return (base.join(top_co, "concept_id", "left")
            .select("concept_id", "n_mentions", "n_convs", "n_surfaces",
                    "top_co", F.coalesce("top_co_n", F.lit(0))
                    .cast("long").alias("top_co_n")))


def _sql_kg_entity_cards() -> str:
    return f"""
WITH {_MENTIONS_CTE},
m AS (SELECT conv_id, turn_idx, surface, concept_id FROM mentions),
base AS (
  SELECT concept_id, count(*) AS n_mentions,
         count(DISTINCT conv_id) AS n_convs,
         count(DISTINCT surface) AS n_surfaces
  FROM m GROUP BY 1),
cc AS (SELECT DISTINCT conv_id, concept_id FROM m),
co AS (
  SELECT a.concept_id, b.concept_id AS co_concept, count(*) AS n_shared
  FROM cc a JOIN cc b ON a.conv_id = b.conv_id
                     AND a.concept_id <> b.concept_id
  GROUP BY 1, 2),
top_co AS (
  SELECT concept_id, co_concept AS top_co, n_shared AS top_co_n
  FROM (SELECT *, row_number() OVER (
            PARTITION BY concept_id
            ORDER BY n_shared DESC, co_concept ASC) AS rn FROM co)
  WHERE rn = 1)
SELECT b.concept_id, CAST(b.n_mentions AS BIGINT) AS n_mentions,
       CAST(b.n_convs AS BIGINT) AS n_convs,
       CAST(b.n_surfaces AS BIGINT) AS n_surfaces,
       t.top_co, CAST(COALESCE(t.top_co_n, 0) AS BIGINT) AS top_co_n
FROM base b LEFT JOIN top_co t ON t.concept_id = b.concept_id
"""


def q_curation_contrastive_pairs(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Contrastive training triplets for embedding-model training:
    (anchor, positive, negative) where positives are verified Jaccard
    near-dups (the dedup_jaccard pair set) and negatives are drawn
    deterministically from the anchor's 16-way md5 bucket — the
    next-larger hash in the bucket, wrapping to the bucket minimum.
    Hash-random negatives are the standard in-batch-negative
    approximation, made replayable: no RNG, no driver state, the
    bucket window partitions by the hash prefix. Singleton-bucket
    anchors (no distinct neighbor) are dropped."""
    pairs = q_dedup_jaccard(spark, sf_dir)
    docs = (_docs(spark, sf_dir)
            .filter(F.col("doc_id") < JACCARD_MAX_DOC)
            .select("doc_id",
                    F.md5(F.col("doc_id").cast("string")).alias("h")))
    docs = docs.withColumn("bkt", F.substring("h", 1, 1))
    wb = Window.partitionBy("bkt").orderBy("h")
    wall = Window.partitionBy("bkt").orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    neg = (docs
           .withColumn("nxt", F.lead("doc_id", 1).over(wb))
           .withColumn("wrap", F.first("doc_id").over(wall))
           .select(F.col("doc_id").alias("anchor_id"),
                   F.coalesce("nxt", "wrap").alias("neg_id"))
           .filter(F.col("neg_id") != F.col("anchor_id")))
    return (pairs
            .select(F.col("doc_a").alias("anchor_id"),
                    F.col("doc_b").alias("pos_id"), "jaccard")
            .join(neg, "anchor_id")
            .select("anchor_id", "pos_id", "neg_id", "jaccard"))


def _sql_curation_contrastive_pairs() -> str:
    return f"""
WITH pairs AS ({SQL_DEDUP_JACCARD}),
d AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
         substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bkt
  FROM documents WHERE doc_id < {JACCARD_MAX_DOC}),
neg AS (
  SELECT doc_id AS anchor_id,
         COALESCE(
             lead(doc_id, 1) OVER (PARTITION BY bkt ORDER BY h),
             first_value(doc_id) OVER (
                 PARTITION BY bkt ORDER BY h
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)) AS neg_id
  FROM d)
SELECT p.doc_a AS anchor_id, p.doc_b AS pos_id, n.neg_id, p.jaccard
FROM pairs p
JOIN neg n ON n.anchor_id = p.doc_a
WHERE n.neg_id <> n.anchor_id
"""


# ---------------------------------------------------------------------------
# Wave 21: chi-square independence test, SNAP-style graph summarization.
# ---------------------------------------------------------------------------


def q_rel_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence profile of event_type ×
    day-of-week — the categorical drift test next to rel_ks_drift's
    numeric one. Emits the full contingency diagnostics per cell
    (observed, expected, contribution), so the analyst sees WHERE
    independence breaks, not just the statistic. One hash agg for the
    cells; the two marginals are broadcast-sized rejoins. Day-of-week
    via epoch-day mod 7 (engine-neutral — Spark and DuckDB disagree on
    dayofweek numbering). Doubles follow the repo round(x,6)+0.0
    convention (rel_stats_agg precedent)."""
    ev = _tbl(spark, sf_dir, "events")
    cells = (ev.select(
        "event_type",
        (F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")
                    .cast("date")) % 7).cast("long").alias("dow"))
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).cast("long").alias("o")))
    rows = cells.groupBy("event_type").agg(F.sum("o").alias("r"))
    cols = cells.groupBy("dow").agg(F.sum("o").alias("c"))
    tot = cells.agg(F.sum("o").alias("t"))
    e = (F.col("r") * F.col("c") / F.col("t"))
    contrib = (F.col("o") - e) * (F.col("o") - e) / e
    return (cells.join(F.broadcast(rows), "event_type")
            .join(F.broadcast(cols), "dow")
            .join(F.broadcast(tot))
            .select("event_type", "dow", "o",
                    (F.round(e, 6) + 0.0).alias("expected"),
                    (F.round(contrib, 6) + 0.0).alias("chi2_contrib")))


SQL_REL_CHISQ = """
WITH cells AS (
  SELECT event_type,
         CAST((CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS BIGINT)
           AS dow,
         count(*) AS o
  FROM events GROUP BY 1, 2),
r AS (SELECT event_type, sum(o) AS r FROM cells GROUP BY 1),
c AS (SELECT dow, sum(o) AS c FROM cells GROUP BY 1),
t AS (SELECT sum(o) AS t FROM cells)
SELECT cells.event_type, cells.dow, CAST(cells.o AS BIGINT) AS o,
       round(CAST(r.r AS DOUBLE) * c.c / t.t, 6) + 0.0 AS expected,
       round((cells.o - CAST(r.r AS DOUBLE) * c.c / t.t)
             * (cells.o - CAST(r.r AS DOUBLE) * c.c / t.t)
             / (CAST(r.r AS DOUBLE) * c.c / t.t), 6) + 0.0
         AS chi2_contrib
FROM cells
JOIN r ON r.event_type = cells.event_type
JOIN c ON c.dow = cells.dow
CROSS JOIN t
"""


def q_kg_graph_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAP-style graph summarization [K]: collapse the triple graph
    onto (node-type, degree-bucket) super-nodes and count edges
    between super-node pairs per predicate — the compact structural
    fingerprint an operator dashboards instead of the 10^12-edge
    graph. Degree = total (in+out) over distinct edges; buckets are
    exact power-of-two ranges (a CASE chain, not float log2 -- an
    engine-parity hazard at boundaries), capped at 256+. Two hash
    aggs for degrees,
    node-keyed rejoins of the edge list, one super-edge agg — every
    join keys on the node id."""
    t = q_kg_triples(spark, sf_dir).select("subj", "pred", "obj").distinct()
    deg = (t.select(F.col("subj").alias("node"))
           .unionAll(t.select(F.col("obj").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("degree")))
    bucket = F.when(F.col("degree") <= 1, 0)
    for i in range(1, 8):
        bucket = bucket.when(F.col("degree") <= (1 << (i + 1)) - 1, i)
    bucket = bucket.otherwise(8)
    ntype = F.when(F.col("node").startswith("turn:"), "turn") \
             .when(F.col("node").startswith("tool:"), "tool") \
             .otherwise("concept")
    groups = deg.select(
        "node", F.concat(ntype, F.lit(":d"), bucket.cast("string"))
        .alias("grp"))
    return (t.join(groups.withColumnRenamed("grp", "src_grp"),
                   t.subj == groups.node).drop("node")
            .join(groups.withColumnRenamed("grp", "dst_grp")
                  .withColumnRenamed("node", "node2"),
                  F.col("obj") == F.col("node2")).drop("node2")
            .groupBy("src_grp", "pred", "dst_grp")
            .agg(F.count(F.lit(1)).cast("long").alias("n_edges")))


def _sql_kg_graph_summary() -> str:
    return f"""
WITH triples AS MATERIALIZED ({_sql_kg_triples_body()}),
t AS (SELECT DISTINCT subj, pred, obj FROM triples),
deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT subj AS node FROM t
    UNION ALL
    SELECT obj AS node FROM t) GROUP BY 1),
groups AS (
  SELECT node,
         (CASE WHEN node LIKE 'turn:%' THEN 'turn'
               WHEN node LIKE 'tool:%' THEN 'tool'
               ELSE 'concept' END
          || ':d' ||
          CASE WHEN degree <= 1 THEN 0
               WHEN degree <= 3 THEN 1
               WHEN degree <= 7 THEN 2
               WHEN degree <= 15 THEN 3
               WHEN degree <= 31 THEN 4
               WHEN degree <= 63 THEN 5
               WHEN degree <= 127 THEN 6
               WHEN degree <= 255 THEN 7
               ELSE 8 END) AS grp
  FROM deg)
SELECT gs.grp AS src_grp, t.pred, gd.grp AS dst_grp,
       CAST(count(*) AS BIGINT) AS n_edges
FROM t
JOIN groups gs ON gs.node = t.subj
JOIN groups gd ON gd.node = t.obj
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Wave 22: surface ambiguity QA, taxonomy transitive reduction.
# ---------------------------------------------------------------------------


def q_kg_surface_ambiguity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface-form ambiguity QA over the COLLECTIVE linker's output:
    per surface — mention volume, how many distinct concepts the
    context-aware linker actually assigned it across the corpus, the
    dominant concept, and its share in exact ppm. The report that
    tells a KG curator which surfaces are genuinely polysemous in this
    corpus (under the isolated linker every surface is 1 concept by
    construction; only context creates spread). Two hash aggs + a
    surface-partitioned rank window."""
    coll = q_kg_collective_linking(spark, sf_dir)
    per = (coll.groupBy("surface", "concept_id")
           .agg(F.count(F.lit(1)).alias("n")))
    tot = per.groupBy("surface").agg(
        F.sum("n").alias("n_mentions"),
        F.count(F.lit(1)).alias("n_concepts"))
    w = Window.partitionBy("surface").orderBy(
        F.desc("n"), F.asc("concept_id"))
    top = (per.withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") == 1)
           .select("surface", F.col("concept_id").alias("top_concept"),
                   F.col("n").alias("top_n")))
    return (tot.join(top, "surface")
            .select("surface",
                    F.col("n_mentions").cast("long").alias("n_mentions"),
                    F.col("n_concepts").cast("long").alias("n_concepts"),
                    "top_concept",
                    F.expr("top_n * 1000000 DIV n_mentions").cast("long")
                    .alias("top_share_ppm")))


def _sql_kg_surface_ambiguity() -> str:
    return f"""
WITH coll AS MATERIALIZED ({_sql_kg_collective_linking()}),
per AS (
  SELECT surface, concept_id, count(*) AS n
  FROM coll GROUP BY 1, 2),
tot AS (
  SELECT surface, sum(n) AS n_mentions, count(*) AS n_concepts
  FROM per GROUP BY 1),
top AS (
  SELECT surface, concept_id AS top_concept, n AS top_n
  FROM (SELECT *, row_number() OVER (
            PARTITION BY surface ORDER BY n DESC, concept_id ASC) AS rn
        FROM per)
  WHERE rn = 1)
SELECT t.surface, CAST(t.n_mentions AS BIGINT) AS n_mentions,
       CAST(t.n_concepts AS BIGINT) AS n_concepts,
       p.top_concept,
       CAST(p.top_n * 1000000 // t.n_mentions AS BIGINT)
         AS top_share_ppm
FROM tot t JOIN top p ON p.surface = t.surface
"""


def q_kg_transitive_reduction(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Transitive reduction of the ancestor CLOSURE back to the Hasse
    diagram (operators/graph.py transitive_reduction): drop every
    closure edge with a 2-step witness — the exact inverse of the
    inference stage's ancestor_expansion, pinned as such in pytest.
    Self-join keyed on the middle node + left-anti on the edge."""
    from ..operators.graph import transitive_reduction
    av = driver_ancestors()
    closure = spark.createDataFrame(
        av[["concept_id", "anc_id"]],
        "concept_id string, anc_id string")
    return (transitive_reduction(closure, "concept_id", "anc_id")
            .select(F.col("concept_id"), F.col("anc_id").alias("parent_id")))


def _sql_kg_transitive_reduction() -> str:
    import pandas as pd
    av = values_sql(driver_ancestors()[["concept_id", "anc_id"]], "a")
    return f"""
WITH closure AS (SELECT concept_id, anc_id FROM {av}),
witnessed AS (
  SELECT DISTINCT ab.concept_id, bc.anc_id
  FROM closure ab JOIN closure bc ON bc.concept_id = ab.anc_id),
red AS (
  SELECT c.concept_id, c.anc_id
  FROM closure c
  LEFT JOIN witnessed w
    ON w.concept_id = c.concept_id AND w.anc_id = c.anc_id
  WHERE w.concept_id IS NULL)
SELECT concept_id, anc_id AS parent_id FROM red
"""


# ---------------------------------------------------------------------------
# Wave 23: n-ary event extraction, temporal fact-validity intervals.
# ---------------------------------------------------------------------------


def q_kg_event_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-ary event extraction (the reified-event-node pattern n-ary
    relations need [K: W3C n-ary relations note]): every turn that
    BOTH uses a tool AND mentions a concept yields a tool-application
    event — a content-addressed event node with actor (role), action
    (tool), theme (concept) and location (turn) edges. Binary triples
    can't hold a 4-way relation; the event node is the KG-native
    encoding. One conv/turn-keyed equi-join of the tool turns with
    their canonical mentions, then a map-only 4-way edge projection
    (posexplode of a literal-4 array — no unions of separate scans)."""
    t = derived_transcripts(spark, sf_dir).filter(F.col("tool").isNotNull())
    m = (_mentions_df(spark, sf_dir)
         .select("conv_id", "turn_idx", "concept_id").distinct())
    ev = (t.join(m, ["conv_id", "turn_idx"])
          .select(
              F.concat(
                  F.lit("event:"),
                  F.substring(F.md5(F.concat_ws(
                      "#", "conv_id", F.col("turn_idx").cast("string"),
                      "tool", "concept_id")), 1, 16)).alias("event"),
              "conv_id", "turn_idx", "role", "tool", "concept_id"))
    edge = F.array(
        F.struct(F.lit("kg:actor").alias("pred"),
                 F.col("role").alias("obj")),
        F.struct(F.lit("kg:action").alias("pred"),
                 F.concat(F.lit("tool:"), F.col("tool")).alias("obj")),
        F.struct(F.lit("kg:theme").alias("pred"),
                 F.col("concept_id").alias("obj")),
        F.struct(F.lit("kg:at_turn").alias("pred"),
                 F.concat(F.lit("turn:"), F.col("conv_id"), F.lit(":"),
                          F.col("turn_idx").cast("string")).alias("obj")))
    return (ev.select("event", F.explode(edge).alias("e"))
            .select(F.col("event").alias("subj"),
                    F.col("e.pred").alias("pred"),
                    F.col("e.obj").alias("obj")))


def _sql_kg_event_extraction() -> str:
    return f"""
WITH {_MENTIONS_CTE},
m AS (SELECT DISTINCT conv_id, turn_idx, concept_id FROM mentions),
ev AS (
  SELECT 'event:' || substr(md5(t.conv_id || '#' ||
             CAST(t.turn_idx AS VARCHAR) || '#' || t.tool || '#' ||
             m.concept_id), 1, 16) AS event,
         t.conv_id, t.turn_idx, t.role, t.tool, m.concept_id
  FROM transcripts t
  JOIN m ON m.conv_id = t.conv_id AND m.turn_idx = t.turn_idx
  WHERE t.tool IS NOT NULL)
SELECT event AS subj, 'kg:actor' AS pred, role AS obj FROM ev
UNION ALL
SELECT event, 'kg:action', 'tool:' || tool FROM ev
UNION ALL
SELECT event, 'kg:theme', concept_id FROM ev
UNION ALL
SELECT event, 'kg:at_turn',
       'turn:' || conv_id || ':' || CAST(turn_idx AS VARCHAR) FROM ev
"""


def q_kg_fact_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal validity intervals for conversation-level facts: per
    (conv, concept), collapse the turns that mention the concept into
    maximal runs of CONSECUTIVE turns (gaps-and-islands via the
    turn_idx − dense-position anchor) — the validity spans a temporal
    KG stores instead of per-turn observations. Every window
    partitions by (conv_id, concept_id); spans carry start/end turn,
    length, and the per-fact span count."""
    m = (_mentions_df(spark, sf_dir)
         .select("conv_id", "turn_idx", "concept_id").distinct())
    w = Window.partitionBy("conv_id", "concept_id").orderBy("turn_idx")
    spans = (m.withColumn("anchor",
                          F.col("turn_idx") - F.row_number().over(w))
             .groupBy("conv_id", "concept_id", "anchor")
             .agg(F.min("turn_idx").alias("from_turn"),
                  F.max("turn_idx").alias("to_turn"),
                  F.count(F.lit(1)).cast("long").alias("n_turns")))
    wn = Window.partitionBy("conv_id", "concept_id")
    return (spans
            .withColumn("n_spans",
                        F.count(F.lit(1)).over(wn).cast("long"))
            .select("conv_id", "concept_id", "from_turn", "to_turn",
                    "n_turns", "n_spans"))


def _sql_kg_fact_intervals() -> str:
    return f"""
WITH {_MENTIONS_CTE},
m AS (SELECT DISTINCT conv_id, turn_idx, concept_id FROM mentions),
anch AS (
  SELECT conv_id, concept_id, turn_idx,
         turn_idx - row_number() OVER (
             PARTITION BY conv_id, concept_id ORDER BY turn_idx)
           AS anchor
  FROM m),
spans AS (
  SELECT conv_id, concept_id, anchor,
         min(turn_idx) AS from_turn, max(turn_idx) AS to_turn,
         count(*) AS n_turns
  FROM anch GROUP BY 1, 2, 3)
SELECT conv_id, concept_id, from_turn, to_turn,
       CAST(n_turns AS BIGINT) AS n_turns,
       CAST(count(*) OVER (PARTITION BY conv_id, concept_id) AS BIGINT)
         AS n_spans
FROM spans
"""


# ---------------------------------------------------------------------------
# Wave 24: graph diff between snapshot states.
# ---------------------------------------------------------------------------


def q_kg_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph diff between two KG snapshot states — the change report a
    nightly rebuild publishes next to the storage layer's time travel:
    v1 and v2 are two overlapping md5-slices of the extracted graph
    (so added, removed AND unchanged all fire). Per predicate: triples
    added, removed, unchanged, plus churn in exact ppm of the v2 size. A
    null-safe full outer join on the whole triple key (the
    ontology_diff pattern applied to the instance graph) feeding one
    pred-keyed conditional agg — both shuffles key on (subj,pred,obj)
    / pred."""
    full = q_kg_triples(spark, sf_dir).select("subj", "pred", "obj")
    h = (F.conv(F.substring(F.md5(F.col("subj")), 1, 2), 16, 10)
         .cast("long"))
    # two overlapping hash slices so the diff exercises ALL THREE
    # classes: v1-only (removed), v2-only (added), both (unchanged)
    v1 = full.filter(h < 160)
    v2 = full.filter(h >= 32)
    j = (v1.withColumn("_v1", F.lit(1))
         .join(v2.withColumn("_v2", F.lit(1)),
               ["subj", "pred", "obj"], "full_outer"))
    per = (j.groupBy("pred").agg(
        F.sum(F.when(F.col("_v1").isNull(), 1).otherwise(0))
        .cast("long").alias("added"),
        F.sum(F.when(F.col("_v2").isNull(), 1).otherwise(0))
        .cast("long").alias("removed"),
        F.sum(F.when(F.col("_v1").isNotNull() & F.col("_v2").isNotNull(),
                     1).otherwise(0)).cast("long").alias("unchanged")))
    return per.select(
        "pred", "added", "removed", "unchanged",
        F.expr("(added + removed) * 1000000"
               " DIV (added + unchanged)").cast("long")
        .alias("churn_ppm"))


def _sql_kg_snapshot_diff() -> str:
    dig = ("(instr('0123456789abcdef', substring(md5(subj), 1, 1)) - 1)"
           " * 16 + instr('0123456789abcdef', substring(md5(subj), 2, 1))"
           " - 1")
    return f"""
WITH full_g AS (
  SELECT subj, pred, obj FROM ({_sql_kg_triples_body()})),
v1 AS (SELECT * FROM full_g WHERE {dig} < 160),
v2 AS (SELECT * FROM full_g WHERE {dig} >= 32),
j AS (
  SELECT COALESCE(a.subj, b.subj) AS subj,
         COALESCE(a.pred, b.pred) AS pred,
         COALESCE(a.obj, b.obj) AS obj,
         a.subj IS NOT NULL AS in_v1, b.subj IS NOT NULL AS in_v2
  FROM v1 a FULL OUTER JOIN v2 b
    ON a.subj = b.subj AND a.pred = b.pred AND a.obj = b.obj)
SELECT pred,
       CAST(sum(CASE WHEN NOT in_v1 THEN 1 ELSE 0 END) AS BIGINT)
         AS added,
       CAST(sum(CASE WHEN NOT in_v2 THEN 1 ELSE 0 END) AS BIGINT)
         AS removed,
       CAST(sum(CASE WHEN in_v1 AND in_v2 THEN 1 ELSE 0 END) AS BIGINT)
         AS unchanged,
       CAST((sum(CASE WHEN NOT in_v1 THEN 1 ELSE 0 END)
             + sum(CASE WHEN NOT in_v2 THEN 1 ELSE 0 END)) * 1000000
            // (sum(CASE WHEN NOT in_v1 THEN 1 ELSE 0 END)
                + sum(CASE WHEN in_v1 AND in_v2 THEN 1 ELSE 0 END))
            AS BIGINT) AS churn_ppm
FROM j GROUP BY 1
"""


PPR_ITERS = 4


def q_kg_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank / random-walk-with-restart
    (operators/graph.py) seeded on every tool-using turn — "which
    nodes does the tool-using activity region of the KG concentrate
    on". Restart mass returns only to the seeds; pure BIGINT fixed
    point, so the distributed aggregation is bit-exact against
    DuckDB's unrolled replay of the same four synchronous rounds.
    Zero-rank (seed-unreachable) nodes are dropped in BOTH engines."""
    from ..operators.graph import personalized_pagerank_exact
    triples = q_kg_triples(spark, sf_dir)
    seeds = (triples.filter(F.col("pred") == "uses_tool")
             .select(F.col("subj").alias("node")).distinct())
    return (personalized_pagerank_exact(triples, seeds,
                                        iterations=PPR_ITERS)
            .select("node", F.col("rank").alias("rank_ppm")))


def _sql_kg_ppr() -> str:
    its, prev = [], "r0"
    for i in range(1, PPR_ITERS + 1):
        its.append(f"""i{i} AS (
  SELECT n.node,
         CAST(n.is_seed * 150000
              + (850 * coalesce(f.inflow, 0)) // 1000 AS BIGINT) AS pr
  FROM sn n LEFT JOIN (
    SELECT s.obj AS node, CAST(sum(r.pr // s.out_deg) AS BIGINT) AS inflow
    FROM send s JOIN {prev} r ON r.node = s.subj
    GROUP BY s.obj) f ON f.node = n.node)""")
        prev = f"i{i}"
    return f"""
WITH triples AS ({_sql_kg_triples_body()}),
edges AS (SELECT DISTINCT subj, obj FROM triples),
outd AS (SELECT subj, count(*) AS out_deg FROM edges GROUP BY subj),
nodes AS (SELECT subj AS node FROM edges UNION SELECT obj FROM edges),
seeds AS (SELECT DISTINCT subj AS node FROM triples
          WHERE pred = 'uses_tool'),
sn AS (SELECT n.node,
              CASE WHEN s.node IS NULL THEN 0 ELSE 1 END AS is_seed
       FROM nodes n LEFT JOIN seeds s ON s.node = n.node),
send AS (SELECT e.subj, e.obj, o.out_deg
         FROM edges e JOIN outd o ON o.subj = e.subj),
r0 AS (SELECT node, CAST(is_seed * 1000000 AS BIGINT) AS pr FROM sn),
{', '.join(its)}
SELECT node, pr AS rank_ppm FROM {prev} WHERE pr > 0
"""


PRF_FB_DOCS = 10   # pseudo-relevant subjects fed back
PRF_FB_TERMS = 3   # expansion concepts taken from the feedback set
PRF_BETA = 0.05    # Rocchio beta / |FB|: expansion weight multiplier


def q_kg_search_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback search (Rocchio query expansion [K]):
    run the P17 scorer, take the top-``PRF_FB_DOCS`` subjects as
    pseudo-relevant, mine their CDS rows for the ``PRF_FB_TERMS``
    strongest concepts NOT already in the query, append them with a
    damped weight (``round(mass * PRF_BETA, 6)``), and re-score. The
    round-to-6-then-rank discipline (deterministic ties on id) keeps
    both the feedback selection and the final ranking engine-portable.

    Scale shape: the feedback set is a broadcast-bounded constant
    (10 subjects → semi-join, 3 concepts → broadcast weights); both
    scoring passes are one subject-keyed hash agg over CDS followed by
    limit-then-rank (TakeOrdered, never a partitionless window over an
    unbounded input)."""
    import pandas as pd
    scores = driver_scores()
    gaz = driver_gazetteer()
    norm = S.normalize_text(SEARCH_QUERY)
    surfaces = sorted({m[0] for m in S.find_mentions(norm, gaz)})
    q = (scores[scores.surface.isin(surfaces)]
         .groupby("concept_id", as_index=False)["cos_sim"].max()
         .rename(columns={"cos_sim": "weight"}).round({"weight": 6}))
    q_df = spark.createDataFrame(
        pd.DataFrame(q), "concept_id string, weight double")
    q_concepts = sorted(q["concept_id"])
    cds = q_kg_cds(spark, sf_dir)
    base = (
        cds.join(F.broadcast(q_df), cds.cds_concept == q_df.concept_id,
                 "inner")
        .groupBy("subj_key")
        .agg(F.round(F.sum(F.col("score") * F.col("weight")), 6)
             .alias("base_score")))
    fb = (base.orderBy(F.desc("base_score"), F.asc("subj_key"))
          .limit(PRF_FB_DOCS).select("subj_key"))
    expansion = (
        cds.join(F.broadcast(fb), "subj_key", "left_semi")
        .filter(~F.col("cds_concept").isin(q_concepts))
        .groupBy("cds_concept")
        .agg(F.round(F.sum("score"), 6).alias("mass"))
        .orderBy(F.desc("mass"), F.asc("cds_concept"))
        .limit(PRF_FB_TERMS)
        .select(F.col("cds_concept").alias("concept_id"),
                F.round(F.col("mass") * F.lit(PRF_BETA), 6)
                .alias("weight")))
    weights = q_df.unionByName(expansion)
    final = (
        cds.join(F.broadcast(weights),
                 cds.cds_concept == weights.concept_id, "inner")
        .groupBy("subj_key")
        .agg(F.round(F.sum(F.col("score") * F.col("weight")), 6)
             .alias("prf_score")))
    top = final.orderBy(F.desc("prf_score"), F.asc("subj_key")).limit(20)
    w = Window.orderBy(F.desc("prf_score"), F.asc("subj_key"))
    return (top.withColumn("rank", F.row_number().over(w))
            .select("subj_key", "rank", "prf_score"))


def _sql_kg_search_prf() -> str:
    import pandas as pd
    scores = driver_scores()
    gaz = driver_gazetteer()
    norm = S.normalize_text(SEARCH_QUERY)
    surfaces = sorted({m[0] for m in S.find_mentions(norm, gaz)})
    q = (scores[scores.surface.isin(surfaces)]
         .groupby("concept_id", as_index=False)["cos_sim"].max()
         .rename(columns={"cos_sim": "weight"}).round({"weight": 6}))
    qv = values_sql(pd.DataFrame(q), "q")
    q_list = ", ".join(f"'{c}'" for c in sorted(q["concept_id"]))
    return f"""
WITH cds AS ({_sql_kg_cds_body()}),
base AS (
  SELECT c.subj_key,
         round(sum(c.score * q.weight), 6) AS base_score
  FROM cds c JOIN {qv} ON q.concept_id = c.cds_concept
  GROUP BY c.subj_key),
fb AS (SELECT subj_key FROM base
       ORDER BY base_score DESC, subj_key ASC LIMIT {PRF_FB_DOCS}),
expansion AS (
  SELECT cds_concept AS concept_id,
         round(round(sum(score), 6) * {PRF_BETA}, 6) AS weight
  FROM cds
  WHERE subj_key IN (SELECT subj_key FROM fb)
    AND cds_concept NOT IN ({q_list})
  GROUP BY cds_concept
  ORDER BY round(sum(score), 6) DESC, cds_concept ASC
  LIMIT {PRF_FB_TERMS}),
weights AS (SELECT concept_id, weight FROM {qv}
            UNION ALL SELECT concept_id, weight FROM expansion),
final AS (
  SELECT c.subj_key, round(sum(c.score * w.weight), 6) AS prf_score
  FROM cds c JOIN weights w ON w.concept_id = c.cds_concept
  GROUP BY c.subj_key),
top AS (SELECT subj_key, prf_score FROM final
        ORDER BY prf_score DESC, subj_key ASC LIMIT 20)
SELECT subj_key,
       CAST(row_number() OVER (ORDER BY prf_score DESC, subj_key ASC)
            AS INT) AS rank,
       prf_score
FROM top
"""


LINKPRED_EVAL_HITS_K = 5


def q_kg_linkpred_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-prediction ranking evaluation — MRR and Hits@{1,k} of the
    neighbor-Jaccard scorer (q_kg_link_predict) measured against the
    graph's own edge set ("raw" setting: every 2-path candidate is
    ranked, true edges are NOT filtered out of the candidate pool but
    labeled). For every node `a` whose candidate list contains at
    least one true edge, the reciprocal rank of the FIRST true edge is
    taken; the summary row reports the node count, the exact-integer
    mean reciprocal rank and hit rates in ppm (sum//n — both engines
    share BIGINT floor semantics, so the distributed agg is bit-exact
    against DuckDB).

    Scale shape: identical candidate generation to kg_link_predict
    (hub-capped 2-path self-join keyed on the middle node — the d²
    blowup is excluded by LINKPRED_HUB_CAP as part of the SEMANTICS);
    the label join is an equi-join against the edge set; the ranking
    window is PARTITIONED BY a (keyed, never global); the final
    summary is one partial-aggregating reduce to a single row."""
    from ..operators.graph import undirected_edges
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
    edges_ab = (e.filter(F.col("src") < F.col("dst"))
                .select(F.col("src").alias("a"), F.col("dst").alias("b"),
                        F.lit(1).alias("is_edge")))
    j = (two.filter(F.col("common") >= LINKPRED_MIN_COMMON)
         .join(deg.select(F.col("src").alias("a"),
                          F.col("deg").alias("deg_a")), "a")
         .join(deg.select(F.col("src").alias("b"),
                          F.col("deg").alias("deg_b")), "b")
         .withColumn("jaccard_ppm", F.expr(
             "common * 1000000 DIV (deg_a + deg_b - common)"))
         .join(edges_ab, ["a", "b"], "left")
         .withColumn("label", F.coalesce(F.col("is_edge"), F.lit(0))))
    w = Window.partitionBy("a").orderBy(F.desc("jaccard_ppm"), F.asc("b"))
    per_a = (j.withColumn("rk", F.row_number().over(w))
             .groupBy("a")
             .agg(F.min(F.when(F.col("label") == 1, F.col("rk")))
                  .alias("first_true"))
             .filter(F.col("first_true").isNotNull()))
    k = LINKPRED_EVAL_HITS_K
    return per_a.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.expr("sum(1000000 DIV first_true) DIV count(*)")
        .alias("mrr_ppm"),
        F.expr("sum(CASE WHEN first_true <= 1 THEN 1 ELSE 0 END)"
               " * 1000000 DIV count(*)").alias("hits1_ppm"),
        F.expr(f"sum(CASE WHEN first_true <= {k} THEN 1 ELSE 0 END)"
               " * 1000000 DIV count(*)").alias("hitsk_ppm"))


def _sql_kg_linkpred_eval() -> str:
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
j AS (
  SELECT t.a, t.b,
         t.common * 1000000 // (da.deg + db.deg - t.common) AS jaccard_ppm,
         CASE WHEN ed.src IS NULL THEN 0 ELSE 1 END AS label
  FROM two t
  JOIN deg da ON da.src = t.a
  JOIN deg db ON db.src = t.b
  LEFT JOIN e ed ON ed.src = t.a AND ed.dst = t.b
  WHERE t.common >= {LINKPRED_MIN_COMMON}),
rk AS (
  SELECT a, label,
         row_number() OVER (PARTITION BY a
                            ORDER BY jaccard_ppm DESC, b ASC) AS rk
  FROM j),
per_a AS (
  SELECT a, min(CASE WHEN label = 1 THEN rk END) AS first_true
  FROM rk GROUP BY a
  HAVING min(CASE WHEN label = 1 THEN rk END) IS NOT NULL)
SELECT count(*) AS n_nodes,
       CAST(sum(1000000 // first_true) // count(*) AS BIGINT) AS mrr_ppm,
       CAST(sum(CASE WHEN first_true <= 1 THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS hits1_ppm,
       CAST(sum(CASE WHEN first_true <= {LINKPRED_EVAL_HITS_K}
                THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS hitsk_ppm
FROM per_a
"""


def q_kg_type_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate-signature node typing — RDFS-style domain/range
    inference [K]: each predicate of the derived KG carries an implied
    (subject-type, object-type) signature (mentions: turn->concept,
    uses_tool: turn->tool, replies_to: turn->turn); every incident
    edge casts one vote at each endpoint, and a node's inferred type
    is its majority vote with confidence = votes*1e6//total ppm
    (deterministic tie on type name). On a clean graph confidence is
    1e6 everywhere; the operator exists to FLAG the dirty case (a node
    id reused across roles) and to materialize the typing a downstream
    consumer joins against.

    Shape: one projection + union (no shuffle), one (node, type) hash
    agg, then a keyed rank window over the per-node handful of type
    rows. Nothing global."""
    t = q_kg_triples(spark, sf_dir)
    obj_type = (F.when(F.col("pred") == "mentions", F.lit("concept"))
                .when(F.col("pred") == "uses_tool", F.lit("tool"))
                .otherwise(F.lit("turn")))
    votes = (t.select(F.col("subj").alias("node"),
                      F.lit("turn").alias("node_type"))
             .unionAll(t.select(F.col("obj").alias("node"),
                                obj_type.alias("node_type"))))
    counts = (votes.groupBy("node", "node_type")
              .agg(F.count(F.lit(1)).alias("votes")))
    wt = Window.partitionBy("node")
    wr = Window.partitionBy("node").orderBy(F.desc("votes"),
                                            F.asc("node_type"))
    return (counts
            .withColumn("total", F.sum("votes").over(wt))
            .withColumn("rk", F.row_number().over(wr))
            .filter(F.col("rk") == 1)
            .select("node", "node_type", "votes", "total",
                    F.expr("votes * 1000000 DIV total")
                    .alias("confidence_ppm")))


def _sql_kg_type_inference() -> str:
    return f"""
WITH triples AS ({_sql_kg_triples_body()}),
votes AS (
  SELECT subj AS node, 'turn' AS node_type FROM triples
  UNION ALL
  SELECT obj,
         CASE pred WHEN 'mentions' THEN 'concept'
                   WHEN 'uses_tool' THEN 'tool'
                   ELSE 'turn' END
  FROM triples),
counts AS (
  SELECT node, node_type, count(*) AS votes
  FROM votes GROUP BY 1, 2),
ranked AS (
  SELECT node, node_type, votes,
         sum(votes) OVER (PARTITION BY node) AS total,
         row_number() OVER (PARTITION BY node
                            ORDER BY votes DESC, node_type ASC) AS rk
  FROM counts)
SELECT node, node_type, votes, CAST(total AS BIGINT) AS total,
       CAST(votes * 1000000 // total AS BIGINT) AS confidence_ppm
FROM ranked WHERE rk = 1
"""


def q_kg_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-correlation profile of the undirected KG — knn(k), the
    mean degree of neighbors of degree-k nodes (Pastor-Satorras
    degree-correlation function [K]): rising knn(k) = assortative
    mixing, falling = disassortative hub-periphery (the typical KG
    shape — leaf turns attach to hub concepts). Exact ppm via
    sum*1e6//count so the agg is engine-portable.

    Shape: degree table joined onto both edge endpoints (the degree
    table is concept-scale — broadcastable on a real cluster), then
    ONE hash agg keyed by degree. No windows, nothing global."""
    from ..operators.graph import undirected_edges
    e = undirected_edges(q_kg_triples(spark, sf_dir))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    j = (e.join(deg.select(F.col("src"), F.col("deg").alias("deg_src")),
                "src")
         .join(deg.select(F.col("src").alias("dst"),
                          F.col("deg").alias("deg_dst")), "dst"))
    return (j.groupBy(F.col("deg_src").alias("degree"))
            .agg(F.count(F.lit(1)).alias("endpoints"),
                 F.expr("sum(deg_dst) * 1000000 DIV count(*)")
                 .alias("avg_nbr_deg_ppm")))


def _sql_kg_assortativity() -> str:
    return f"""
WITH triples AS MATERIALIZED ({_sql_kg_triples_body()}),
e AS MATERIALIZED (
  SELECT subj AS src, obj AS dst FROM (SELECT DISTINCT subj, obj FROM triples)
  UNION
  SELECT obj, subj FROM (SELECT DISTINCT subj, obj FROM triples)),
deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src)
SELECT ds.deg AS degree,
       count(*) AS endpoints,
       CAST(sum(dd.deg) * 1000000 // count(*) AS BIGINT)
         AS avg_nbr_deg_ppm
FROM e
JOIN deg ds ON ds.src = e.src
JOIN deg dd ON dd.src = e.dst
GROUP BY 1
"""


SAMEAS_PREFIX = 32  # utterance-fingerprint length (chars of normalized text)


def q_kg_sameas_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """owl:sameAs consolidation of the constructed KG — the standard
    post-extraction step that collapses equivalent entity nodes and
    rewrites the triple table onto canonical ids [K]. Equivalence here
    comes from an utterance fingerprint (first SAMEAS_PREFIX chars of
    the normalized text — a deliberately coarse blocking key standing
    in for a fuzzy matcher; the seam where a production matcher plugs
    in). Because the fingerprint is a FUNCTION of the node, the
    transitive closure is exactly the group-by on the fingerprint — no
    iteration — and the canonical member is the lexicographic min node
    id. Every triple's turn endpoints are remapped, merge-induced
    self-loops are dropped, and the rewritten table is re-deduplicated
    under the same (subj, pred, obj) -> max(score) rule as P13.

    Shape: one hash agg for the mapping (turn-scale, keyed by
    fingerprint), one equi-join per endpoint (subj always; obj only on
    the replies_to branch), one final dedup agg. All keyed; at cluster
    scale the mapping table co-partitions with the triple table on the
    node id."""
    t = derived_transcripts(spark, sf_dir)
    node = F.concat(F.lit("turn:"), F.col("conv_id"), F.lit(":"),
                    F.col("turn_idx").cast("string"))
    tm = t.select(node.alias("node"),
                  F.substring("text", 1, SAMEAS_PREFIX).alias("fp"))
    mapping = (tm.groupBy("fp").agg(F.min("node").alias("canon_node"))
               .join(tm, "fp")
               .select("node", "canon_node"))
    triples = q_kg_triples(spark, sf_dir)
    m1 = mapping.select(F.col("node").alias("subj"),
                        F.col("canon_node").alias("subj_c"))
    m2 = mapping.select(F.col("node").alias("obj"),
                        F.col("canon_node").alias("obj_c"))
    rw = (triples.join(m1, "subj")
          .join(m2, "obj", "left")
          .select(F.col("subj_c").alias("subj"), "pred",
                  F.when(F.col("pred") == "replies_to", F.col("obj_c"))
                  .otherwise(F.col("obj")).alias("obj"),
                  "score"))
    return (rw.filter(F.col("subj") != F.col("obj"))
            .groupBy("subj", "pred", "obj")
            .agg(F.round(F.max("score"), 6).alias("score")))


def _sql_kg_sameas_closure() -> str:
    return f"""
WITH triples AS MATERIALIZED ({_sql_kg_triples_body()}),
transcripts3 AS ({TRANSCRIPTS_CTE}),
tm AS (
  SELECT 'turn:' || conv_id || ':' || cast(turn_idx AS STRING) AS node,
         substr(text, 1, {SAMEAS_PREFIX}) AS fp
  FROM transcripts3),
mapping AS (
  SELECT tm.node, g.canon_node
  FROM tm JOIN (SELECT fp, min(node) AS canon_node FROM tm GROUP BY fp) g
       ON g.fp = tm.fp),
rw AS (
  SELECT m1.canon_node AS subj, t.pred,
         CASE WHEN t.pred = 'replies_to' THEN m2.canon_node
              ELSE t.obj END AS obj,
         t.score
  FROM triples t
  JOIN mapping m1 ON m1.node = t.subj
  LEFT JOIN mapping m2 ON m2.node = t.obj)
SELECT subj, pred, obj, round(max(score), 6) AS score
FROM rw WHERE subj <> obj
GROUP BY 1, 2, 3
"""


MMR_K = 20       # candidate pool = the P17 top-K
MMR_SELECT = 5   # reranked results returned
MMR_LAMBDA_NUM = 7   # lambda = 0.7 as the integer pair (7, 3)/10


def q_kg_search_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance rerank of the P17 search results
    (Carbonell-Goldstein MMR [K]) — diversify the top-20 into 5 picks
    that balance relevance against redundancy. Pure-integer variant:
    relevance is rank-normalized ((K-rank+1)*1e6//K ppm), redundancy
    is the concept-set Jaccard between candidates (inter*1e6//union
    ppm over their CDS concept sets), and each greedy step takes
    argmax of (7*rel + 3*(1e6 - max_sim_to_selected))//10 with
    deterministic ties on subj_key — every quantity BIGINT, so the
    greedy trace is bit-identical across engines.

    Shape: candidates are the distributed TakeOrdered top-K; concept
    sets are semi-joined down to those K subjects before the pairwise
    step, so the similarity join touches K(K-1)/2 <= 190 pairs
    regardless of corpus size. The greedy head runs on the collected
    K-row result — driver-CONSTANT work (like presenting the result
    page), not a driver-side data path."""
    cand = q_kg_search(spark, sf_dir)
    cds = q_kg_cds(spark, sf_dir)
    csets = (cds.join(F.broadcast(cand.select("subj_key")),
                      "subj_key", "left_semi")
             .select("subj_key", "cds_concept").distinct())
    sizes = csets.groupBy("subj_key").agg(F.count(F.lit(1)).alias("n"))
    pa = csets.select(F.col("subj_key").alias("a"), "cds_concept")
    pb = csets.select(F.col("subj_key").alias("b"), "cds_concept")
    inter = (pa.join(pb, "cds_concept").filter(F.col("a") < F.col("b"))
             .groupBy("a", "b").agg(F.count(F.lit(1)).alias("i")))
    sims = (inter
            .join(sizes.select(F.col("subj_key").alias("a"),
                               F.col("n").alias("na")), "a")
            .join(sizes.select(F.col("subj_key").alias("b"),
                               F.col("n").alias("nb")), "b")
            .withColumn("sim_ppm",
                        F.expr("i * 1000000 DIV (na + nb - i)"))
            .select("a", "b", "sim_ppm"))
    rel = {r.subj_key: (MMR_K - r.rank + 1) * 1_000_000 // MMR_K
           for r in cand.collect()}
    sim: dict[tuple[str, str], int] = {}
    for r in sims.collect():
        sim[(r.a, r.b)] = r.sim_ppm
        sim[(r.b, r.a)] = r.sim_ppm
    lam, lam_c = MMR_LAMBDA_NUM, 10 - MMR_LAMBDA_NUM
    selected: list[str] = []
    out = []
    remaining = sorted(rel)
    for step in range(1, MMR_SELECT + 1):
        best = None
        for c in remaining:
            ms = max((sim.get((c, s), 0) for s in selected), default=0)
            mmr = (lam * rel[c] + lam_c * (1_000_000 - ms)) // 10
            key = (-mmr, c)
            if best is None or key < best[0]:
                best = (key, c, mmr)
        _, c, mmr = best
        selected.append(c)
        remaining.remove(c)
        out.append((c, step, mmr))
    return spark.createDataFrame(
        out, "subj_key string, mmr_rank int, mmr_ppm bigint")


def _sql_kg_search_mmr() -> str:
    import pandas as pd
    scores = driver_scores()
    gaz = driver_gazetteer()
    norm = S.normalize_text(SEARCH_QUERY)
    surfaces = sorted({m[0] for m in S.find_mentions(norm, gaz)})
    q = (scores[scores.surface.isin(surfaces)]
         .groupby("concept_id", as_index=False)["cos_sim"].max()
         .rename(columns={"cos_sim": "q_score"}).round({"q_score": 6}))
    qv = values_sql(pd.DataFrame(q), "q")
    lam, lam_c = MMR_LAMBDA_NUM, 10 - MMR_LAMBDA_NUM
    steps = []
    for i in range(2, MMR_SELECT + 1):
        steps.append(f"""c{i} AS (
  SELECT r.subj_key, r.rel_ppm, coalesce(max(s.sim_ppm), 0) AS ms
  FROM rel r
  LEFT JOIN sims2 s ON s.a = r.subj_key
       AND s.b IN (SELECT subj_key FROM sel{i - 1})
  WHERE r.subj_key NOT IN (SELECT subj_key FROM sel{i - 1})
  GROUP BY 1, 2),
s{i} AS (
  SELECT subj_key,
         ({lam} * rel_ppm + {lam_c} * (1000000 - ms)) // 10 AS mmr_ppm
  FROM c{i} ORDER BY mmr_ppm DESC, subj_key ASC LIMIT 1),
sel{i} AS (SELECT * FROM sel{i - 1}
           UNION ALL SELECT subj_key, {i}, mmr_ppm FROM s{i})""")
    return f"""
WITH cds AS MATERIALIZED ({_sql_kg_cds_body()}),
ranked AS (
  SELECT c.subj_key, round(sum(c.score * q.q_score), 6) AS search_score
  FROM cds c JOIN {qv} ON q.concept_id = c.cds_concept
  GROUP BY c.subj_key),
cand AS (
  SELECT subj_key,
         row_number() OVER (ORDER BY search_score DESC, subj_key ASC)
           AS rnk
  FROM ranked ORDER BY search_score DESC, subj_key ASC LIMIT {MMR_K}),
rel AS (SELECT subj_key,
               ({MMR_K} - rnk + 1) * 1000000 // {MMR_K} AS rel_ppm
        FROM cand),
csets AS (
  SELECT DISTINCT c.subj_key, c.cds_concept
  FROM cds c JOIN cand ON cand.subj_key = c.subj_key),
sizes AS (SELECT subj_key, count(*) AS n FROM csets GROUP BY 1),
inter AS (
  SELECT a.subj_key AS a, b.subj_key AS b, count(*) AS i
  FROM csets a JOIN csets b
       ON a.cds_concept = b.cds_concept AND a.subj_key < b.subj_key
  GROUP BY 1, 2),
sims AS (
  SELECT i.a, i.b, i.i * 1000000 // (sa.n + sb.n - i.i) AS sim_ppm
  FROM inter i JOIN sizes sa ON sa.subj_key = i.a
               JOIN sizes sb ON sb.subj_key = i.b),
sims2 AS (SELECT a, b, sim_ppm FROM sims
          UNION ALL SELECT b, a, sim_ppm FROM sims),
s1 AS (
  SELECT subj_key,
         ({lam} * rel_ppm + {lam_c} * 1000000) // 10 AS mmr_ppm
  FROM rel ORDER BY rel_ppm DESC, subj_key ASC LIMIT 1),
sel1 AS (SELECT subj_key, 1 AS mmr_rank, mmr_ppm FROM s1),
{', '.join(steps)}
SELECT subj_key, CAST(mmr_rank AS INT) AS mmr_rank,
       CAST(mmr_ppm AS BIGINT) AS mmr_ppm
FROM sel{MMR_SELECT}
"""


RRF_C = 60    # the standard RRF damping constant [K]
RRF_N = 25    # per-leg candidate depth
RRF_TOP = 10  # fused results returned


def q_sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval reciprocal-rank fusion (Cormack-Clarke RRF
    [K]): fuse the lexical BM25 ranking (operators/curation.py
    bm25_topk over the fixed BM25_TERMS query) with the semantic
    embedding-cosine ranking (query vector = vec_id 0 against the
    candidate corpus) by rrf = sum over legs of 1e6 // (C + rank) —
    pure BIGINT once each leg's rank is fixed, so fusion is bit-exact
    cross-engine. Docs surfaced by only one leg keep that leg's term
    (standard union semantics); the fused top-RRF_TOP is returned with
    both leg ranks for audit.

    Shape: each leg is a distributed score + TakeOrdered limit; rank
    windows run over the <= RRF_N-row limited result only (the
    limit-then-rank discipline); the fusion join is a full outer join
    of two constant-size rank lists."""
    from ..operators.curation import bm25_topk
    lex = bm25_topk(_docs(spark, sf_dir), BM25_TERMS, k=RRF_N)
    wl = Window.orderBy(F.desc("score_ppm"), F.asc("doc_id"))
    lex_rk = (lex.withColumn("lex_rk", F.row_number().over(wl))
              .select("doc_id", "lex_rk"))
    e = _tbl(spark, sf_dir, "embeddings")
    dbl = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    q = (e.filter(F.col("vec_id") == 0)
         .select(dbl("embedding").alias("qv")))
    c = (e.filter(F.col("vec_id") >= N_QUERY_VECS)
         .select(F.col("vec_id").alias("doc_id"), dbl("embedding").alias("cv")))
    dot = F.aggregate(F.zip_with("qv", "cv", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    norm = lambda col: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(F.col(col), lambda x: x * x), F.lit(0.0),
        lambda a, v: a + v))
    sem_top = (c.crossJoin(F.broadcast(q))
               .withColumn("cos", F.round(dot / (norm("qv") * norm("cv")), 6))
               .orderBy(F.desc("cos"), F.asc("doc_id")).limit(RRF_N))
    ws = Window.orderBy(F.desc("cos"), F.asc("doc_id"))
    sem_rk = (sem_top.withColumn("sem_rk", F.row_number().over(ws))
              .select("doc_id", "sem_rk"))
    fused = (lex_rk.join(sem_rk, "doc_id", "full_outer")
             .withColumn("rrf_ppm", F.expr(
                 f"coalesce(1000000 DIV ({RRF_C} + lex_rk), 0)"
                 f" + coalesce(1000000 DIV ({RRF_C} + sem_rk), 0)")))
    top = fused.orderBy(F.desc("rrf_ppm"), F.asc("doc_id")).limit(RRF_TOP)
    wf = Window.orderBy(F.desc("rrf_ppm"), F.asc("doc_id"))
    return (top.withColumn("fused_rank", F.row_number().over(wf))
            .select("doc_id", "lex_rk", "sem_rk", "rrf_ppm", "fused_rank"))


def _sql_sim_rrf_fusion() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
WITH toks AS (
  SELECT doc_id, t.tok
  FROM documents, unnest(string_split(text, ' ')) AS t(tok)
  WHERE t.tok <> ''),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
dlen AS (SELECT doc_id, count(*) AS dlen FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, CAST(sum(dlen) AS BIGINT) AS tot
          FROM dlen),
qtf AS (SELECT doc_id, tok, tf FROM tf WHERE tok IN ({terms})),
dfreq AS (SELECT tok, count(*) AS df FROM qtf GROUP BY tok),
scored AS (
  SELECT q.doc_id,
         CAST(round(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
           * (q.tf * (CAST(1.2 AS DOUBLE) + 1.0))
           / (q.tf + CAST(1.2 AS DOUBLE)
              * (1.0 - CAST(0.75 AS DOUBLE)
                 + CAST(0.75 AS DOUBLE) * dl.dlen
                   / (CAST(s.tot AS DOUBLE) / s.n_docs)))
           * CAST(1000000 AS DOUBLE), 0) AS BIGINT) AS term_ppm
  FROM qtf q JOIN dfreq d ON d.tok = q.tok
       JOIN dlen dl ON dl.doc_id = q.doc_id CROSS JOIN stats s),
lex AS (
  SELECT doc_id, CAST(sum(term_ppm) AS BIGINT) AS score_ppm
  FROM scored GROUP BY doc_id
  ORDER BY score_ppm DESC, doc_id ASC LIMIT {RRF_N}),
lex_rk AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_ppm DESC, doc_id ASC)
           AS lex_rk
  FROM lex),
qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
sem AS (
  SELECT c.vec_id AS doc_id,
         round(
           (SELECT sum(cast(x AS DOUBLE) * cast(y AS DOUBLE))
            FROM (SELECT unnest(q.qv) AS x, unnest(c.embedding) AS y))
           / (sqrt((SELECT sum(cast(x AS DOUBLE) * cast(x AS DOUBLE))
                    FROM (SELECT unnest(q.qv) AS x)))
              * sqrt((SELECT sum(cast(y AS DOUBLE) * cast(y AS DOUBLE))
                      FROM (SELECT unnest(c.embedding) AS y)))),
           6) AS cos
  FROM embeddings c CROSS JOIN qv q
  WHERE c.vec_id >= {N_QUERY_VECS}
  ORDER BY cos DESC, doc_id ASC LIMIT {RRF_N}),
sem_rk AS (
  SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id ASC)
           AS sem_rk
  FROM sem),
fused AS (
  SELECT coalesce(l.doc_id, s.doc_id) AS doc_id, l.lex_rk, s.sem_rk,
         coalesce(1000000 // ({RRF_C} + l.lex_rk), 0)
         + coalesce(1000000 // ({RRF_C} + s.sem_rk), 0) AS rrf_ppm
  FROM lex_rk l FULL OUTER JOIN sem_rk s ON s.doc_id = l.doc_id),
top AS (SELECT * FROM fused ORDER BY rrf_ppm DESC, doc_id ASC
        LIMIT {RRF_TOP})
SELECT doc_id, CAST(lex_rk AS INT) AS lex_rk,
       CAST(sem_rk AS INT) AS sem_rk,
       CAST(rrf_ppm AS BIGINT) AS rrf_ppm,
       CAST(row_number() OVER (ORDER BY rrf_ppm DESC, doc_id ASC) AS INT)
         AS fused_rank
FROM top
"""


ATTR_CONV_TYPE = "purchase"   # the conversion event
ATTR_U_END_PPM = 400_000      # U-shaped: 40% first, 40% last, 20% middle


def q_rel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution [K] over the
    events stream: each purchase's value is attributed to the same
    user's PRECEDING non-purchase touches — 40% to the first touch,
    40% to the last, the middle 20% split evenly (exact ppm; integer
    remainder goes to the first touch; 1 touch takes 100%, 2 take
    50/50). Conversion value enters as exact cents and every weight is
    BIGINT ppm, so the per-channel rollup is bit-exact cross-engine.

    Shape: the touch-to-conversion match is a user-keyed equi-join
    with a timestamp predicate (per-user interval join — the same
    shape as sessionized attribution at warehouse scale); position
    and touch-count windows partition BY CONVERSION (keyed, bounded by
    a user's history, never global); the rollup is one hash agg."""
    ev = _tbl(spark, sf_dir, "events")
    conv = (ev.filter(F.col("event_type") == ATTR_CONV_TYPE)
            .select(F.col("event_id").alias("conv_id"),
                    F.col("user_id"), F.col("ts").alias("conv_ts"),
                    F.round(F.col("value") * 100, 0).cast("long")
                    .alias("conv_cents")))
    touch = (ev.filter(F.col("event_type") != ATTR_CONV_TYPE)
             .select("user_id", F.col("event_id").alias("touch_id"),
                     F.col("event_type"), F.col("ts").alias("touch_ts")))
    pairs = conv.join(touch, "user_id").filter(
        (F.col("touch_ts") < F.col("conv_ts"))
        | ((F.col("touch_ts") == F.col("conv_ts"))
           & (F.col("touch_id") < F.col("conv_id"))))
    wp = Window.partitionBy("conv_id").orderBy("touch_ts", "touch_id")
    wn = Window.partitionBy("conv_id")
    mid = 1_000_000 - 2 * ATTR_U_END_PPM
    weighted = (pairs
                .withColumn("pos", F.row_number().over(wp))
                .withColumn("n", F.count(F.lit(1)).over(wn))
                .withColumn("w_ppm", F.expr(f"""
        CASE WHEN n = 1 THEN 1000000
             WHEN n = 2 THEN 500000
             WHEN pos = 1 THEN {ATTR_U_END_PPM} + {mid} % (n - 2)
             WHEN pos = n THEN {ATTR_U_END_PPM}
             ELSE {mid} DIV (n - 2) END""")))
    return (weighted.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("touches"),
                 F.countDistinct("conv_id").alias("conversions"),
                 F.sum(F.col("conv_cents") * F.col("w_ppm"))
                 .alias("attr_micro"))
            .withColumn("attr_cents",
                        F.expr("attr_micro DIV 1000000")))


def _sql_rel_attribution() -> str:
    mid = 1_000_000 - 2 * ATTR_U_END_PPM
    return f"""
WITH conv AS (
  SELECT event_id AS conv_id, user_id, ts AS conv_ts,
         CAST(round(value * 100, 0) AS BIGINT) AS conv_cents
  FROM events WHERE event_type = '{ATTR_CONV_TYPE}'),
touch AS (
  SELECT user_id, event_id AS touch_id, event_type, ts AS touch_ts
  FROM events WHERE event_type <> '{ATTR_CONV_TYPE}'),
pairs AS (
  SELECT c.conv_id, c.conv_cents, t.touch_id, t.event_type,
         row_number() OVER (PARTITION BY c.conv_id
                            ORDER BY t.touch_ts, t.touch_id) AS pos,
         count(*) OVER (PARTITION BY c.conv_id) AS n
  FROM conv c JOIN touch t ON t.user_id = c.user_id
       AND (t.touch_ts < c.conv_ts
            OR (t.touch_ts = c.conv_ts AND t.touch_id < c.conv_id))),
weighted AS (
  SELECT conv_id, conv_cents, event_type,
         CASE WHEN n = 1 THEN 1000000
              WHEN n = 2 THEN 500000
              WHEN pos = 1 THEN {ATTR_U_END_PPM} + {mid} % (n - 2)
              WHEN pos = n THEN {ATTR_U_END_PPM}
              ELSE {mid} // (n - 2) END AS w_ppm
  FROM pairs)
SELECT event_type,
       count(*) AS touches,
       count(DISTINCT conv_id) AS conversions,
       CAST(sum(conv_cents * w_ppm) AS BIGINT) AS attr_micro,
       CAST(sum(conv_cents * w_ppm) // 1000000 AS BIGINT) AS attr_cents
FROM weighted GROUP BY 1
"""


BASKET_MIN_SUP = 3  # minimum pair support for an emitted rule


def q_rel_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over the order line items
    (Agrawal-Srikant support/confidence/lift [K]): baskets are the
    distinct parts of an order; every co-bought part pair with support
    >= BASKET_MIN_SUP emits both directed rules with confidence =
    sup*1e6//sup(antecedent) and lift = sup*N*1e6//(sup_a*sup_c) in
    exact ppm — the classic cross-sell read, and the relational twin
    of the KG's concept-lift operator.

    Shape: the pair generation is a self-join keyed on the order key,
    quadratic only in BASKET SIZE (TPC-H-shaped orders hold <= ~10
    parts — the same bounded-key argument as the concept-lift join);
    item supports join back part-keyed; the order count enters as a
    broadcast 1-row aggregate. No windows, nothing global."""
    li = _tbl(spark, sf_dir, "lineitem")
    b = li.select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("p")).distinct()
    n_orders = b.select("o").distinct().agg(
        F.count(F.lit(1)).alias("n_orders"))
    item = b.groupBy("p").agg(F.count(F.lit(1)).alias("sup_item"))
    pa = b.select(F.col("o"), F.col("p").alias("pa"))
    pb = b.select(F.col("o"), F.col("p").alias("pb"))
    pairs = (pa.join(pb, "o").filter(F.col("pa") < F.col("pb"))
             .groupBy("pa", "pb").agg(F.count(F.lit(1)).alias("support"))
             .filter(F.col("support") >= BASKET_MIN_SUP))
    rules = (pairs.select(F.col("pa").alias("antecedent"),
                          F.col("pb").alias("consequent"), "support")
             .unionByName(
                 pairs.select(F.col("pb").alias("antecedent"),
                              F.col("pa").alias("consequent"), "support")))
    return (rules
            .join(item.select(F.col("p").alias("antecedent"),
                              F.col("sup_item").alias("sup_a")),
                  "antecedent")
            .join(item.select(F.col("p").alias("consequent"),
                              F.col("sup_item").alias("sup_c")),
                  "consequent")
            .crossJoin(F.broadcast(n_orders))
            .select("antecedent", "consequent", "support",
                    F.expr("support * 1000000 DIV sup_a")
                    .alias("conf_ppm"),
                    F.expr("support * n_orders * 1000000"
                           " DIV (sup_a * sup_c)").alias("lift_ppm")))


def _sql_rel_basket_rules() -> str:
    return f"""
WITH b AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
n AS (SELECT count(DISTINCT o) AS n_orders FROM b),
item AS (SELECT p, count(*) AS sup_item FROM b GROUP BY p),
pairs AS (
  SELECT a.p AS pa, c.p AS pb, count(*) AS support
  FROM b a JOIN b c ON c.o = a.o AND a.p < c.p
  GROUP BY 1, 2
  HAVING count(*) >= {BASKET_MIN_SUP}),
rules AS (
  SELECT pa AS antecedent, pb AS consequent, support FROM pairs
  UNION ALL
  SELECT pb, pa, support FROM pairs)
SELECT r.antecedent, r.consequent, r.support,
       CAST(r.support * 1000000 // ia.sup_item AS BIGINT) AS conf_ppm,
       CAST(r.support * n.n_orders * 1000000
            // (ia.sup_item * ic.sup_item) AS BIGINT) AS lift_ppm
FROM rules r
JOIN item ia ON ia.p = r.antecedent
JOIN item ic ON ic.p = r.consequent
CROSS JOIN n
"""


def q_sim_cluster_ari(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-stability evaluation via the Adjusted Rand Index
    (Hubert-Arabie ARI [K]) between the 1-round and KMEANS_ITERS-round
    exact-integer Lloyd clusterings — "how much does one more
    synchronous update reshuffle the partition", the convergence
    diagnostic an IVF-training pipeline watches. Both clusterings
    share the deterministic seed and training prefix, so the
    contingency table is reproducible bit-for-bit; all pair counts
    (C(x,2)) are exact BIGINT and only the final signed ratio is a
    double under the repo's round(x,6) + 0.0 convention (plain /,
    never integer DIV — the sign makes floor-vs-truncate an engine
    hazard). The BIGINT sums are promoted to DOUBLE before the big
    products so the formula stays overflow-safe at corpus scale.

    Shape: two broadcast-centroid assignments, one (c1, c2)-keyed
    contingency agg (at most k*k rows), margin aggs over k rows, and a
    crossJoin of four 1-row aggregates. Nothing global, no windows."""
    from ..operators.simsearch import kmeans_lloyd_exact, \
        quantize_embeddings
    qz = quantize_embeddings(_tbl(spark, sf_dir, "embeddings"))
    f1 = (kmeans_lloyd_exact(qz, k=KMEANS_K, iters=1)
          .select("vec_id", F.col("cluster").alias("ca")))
    f2 = (kmeans_lloyd_exact(qz, k=KMEANS_K, iters=KMEANS_ITERS)
          .select("vec_id", F.col("cluster").alias("cb")))
    j = f1.join(f2, "vec_id")
    ct = j.groupBy("ca", "cb").agg(F.count(F.lit(1)).alias("nij"))
    idx = ct.agg(F.sum(F.expr("nij * (nij - 1) DIV 2")).alias("idx"))
    a2 = (j.groupBy("ca").agg(F.count(F.lit(1)).alias("cnt"))
          .agg(F.sum(F.expr("cnt * (cnt - 1) DIV 2")).alias("a2")))
    b2 = (j.groupBy("cb").agg(F.count(F.lit(1)).alias("cnt"))
          .agg(F.sum(F.expr("cnt * (cnt - 1) DIV 2")).alias("b2")))
    nn = j.agg(F.count(F.lit(1)).alias("n"))
    return (idx.crossJoin(a2).crossJoin(b2).crossJoin(nn)
            .select("n", "idx", "a2", "b2",
                    F.expr("""
        round((2.0 * (CAST(idx AS DOUBLE) * (CAST(n AS DOUBLE)
                      * (n - 1.0) / 2.0)
                      - CAST(a2 AS DOUBLE) * CAST(b2 AS DOUBLE)))
              / ((CAST(a2 AS DOUBLE) + CAST(b2 AS DOUBLE))
                 * (CAST(n AS DOUBLE) * (n - 1.0) / 2.0)
                 - 2.0 * CAST(a2 AS DOUBLE) * CAST(b2 AS DOUBLE)),
              6) + 0.0""").alias("ari")))


def _sql_sim_cluster_ari() -> str:
    body, prev = _sql_kmeans_ctes()
    dist = _sql_kmeans_dist()
    prev1 = f"c{KMEANS_ITERS - 1}"
    return f"""
WITH {body},
fa AS (
  SELECT v.vec_id, c.cid AS ca, {dist} AS sq
  FROM q8 v, {prev1} c
  QUALIFY row_number() OVER (PARTITION BY v.vec_id
                             ORDER BY sq, c.cid) = 1),
fb AS (
  SELECT v.vec_id, c.cid AS cb, {dist} AS sq
  FROM q8 v, {prev} c
  QUALIFY row_number() OVER (PARTITION BY v.vec_id
                             ORDER BY sq, c.cid) = 1),
jj AS (SELECT fa.vec_id, fa.ca, fb.cb FROM fa JOIN fb USING (vec_id)),
ctab AS (SELECT ca, cb, count(*) AS nij FROM jj GROUP BY 1, 2),
s_idx AS (SELECT CAST(sum(nij * (nij - 1) // 2) AS BIGINT) AS idx FROM ctab),
s_a2 AS (SELECT CAST(sum(cnt * (cnt - 1) // 2) AS BIGINT) AS a2
       FROM (SELECT ca, count(*) AS cnt FROM jj GROUP BY ca)),
s_b2 AS (SELECT CAST(sum(cnt * (cnt - 1) // 2) AS BIGINT) AS b2
       FROM (SELECT cb, count(*) AS cnt FROM jj GROUP BY cb)),
s_nn AS (SELECT count(*) AS n FROM jj)
SELECT n, idx, a2, b2,
       round((2.0 * (CAST(idx AS DOUBLE) * (CAST(n AS DOUBLE)
                     * (n - 1.0) / 2.0)
                     - CAST(a2 AS DOUBLE) * CAST(b2 AS DOUBLE)))
             / ((CAST(a2 AS DOUBLE) + CAST(b2 AS DOUBLE))
                * (CAST(n AS DOUBLE) * (n - 1.0) / 2.0)
                - 2.0 * CAST(a2 AS DOUBLE) * CAST(b2 AS DOUBLE)),
             6) + 0.0 AS ari
FROM s_idx CROSS JOIN s_a2 CROSS JOIN s_b2 CROSS JOIN s_nn
"""


RFM_R_DAYS = (90, 180, 365, 730)           # recency score breakpoints
RFM_F_ORDERS = (15, 12, 9, 6)              # frequency breakpoints
RFM_M_CENTS = (450_000_000, 350_000_000,   # monetary breakpoints
               250_000_000, 150_000_000)


def _rfm_case(col: str, breaks: tuple, asc: bool) -> str:
    """5..1 CASE score; asc=True means smaller is better (recency)."""
    op = "<=" if asc else ">="
    arms = " ".join(f"WHEN {col} {op} {b} THEN {5 - i}"
                    for i, b in enumerate(breaks))
    return f"CASE {arms} ELSE 1 END"


def q_rel_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation [K: recency/frequency/monetary] over
    the orders table — days since last order (vs the corpus max date),
    order count, lifetime spend in exact cents, each scored 1..5 on
    FIXED documented breakpoints (rank-free on purpose: quantile
    scoring would need a partitionless ntile over every customer — the
    exact window shape this repo bans — and fixed breaks are what a
    production scorecard pins anyway), plus the classic named segment.

    Shape: one customer-keyed hash agg, the corpus max date as a
    broadcast 1-row aggregate, then pure map-side CASE scoring. All
    arithmetic integer (days, counts, cents)."""
    o = _tbl(spark, sf_dir, "orders")
    maxd = o.agg(F.max("o_orderdate").alias("corpus_max"))
    per_c = (o.groupBy("o_custkey")
             .agg(F.max("o_orderdate").alias("last_order"),
                  F.count(F.lit(1)).alias("frequency"),
                  F.sum(F.round(F.col("o_totalprice") * 100, 0)
                        .cast("long")).alias("monetary_cents")))
    scored = (per_c.crossJoin(F.broadcast(maxd))
              .withColumn("recency_days",
                          F.datediff("corpus_max", "last_order"))
              .withColumn("r_score", F.expr(
                  _rfm_case("recency_days", RFM_R_DAYS, asc=True)))
              .withColumn("f_score", F.expr(
                  _rfm_case("frequency", RFM_F_ORDERS, asc=False)))
              .withColumn("m_score", F.expr(
                  _rfm_case("monetary_cents", RFM_M_CENTS, asc=False))))
    return scored.select(
        F.col("o_custkey").alias("custkey"), "recency_days",
        "frequency", "monetary_cents", "r_score", "f_score", "m_score",
        F.expr("""
            CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
                 WHEN r_score >= 4 THEN 'recent'
                 WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
                 WHEN r_score <= 2 AND f_score <= 2 THEN 'lost'
                 ELSE 'regular' END""").alias("segment"))


def _sql_rel_rfm() -> str:
    return f"""
WITH maxd AS (SELECT max(o_orderdate) AS corpus_max FROM orders),
per_c AS (
  SELECT o_custkey AS custkey, max(o_orderdate) AS last_order,
         count(*) AS frequency,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS monetary_cents
  FROM orders GROUP BY 1),
scored AS (
  SELECT custkey,
         CAST(date_diff('day', last_order, corpus_max) AS INT)
           AS recency_days,
         frequency, monetary_cents
  FROM per_c CROSS JOIN maxd),
s2 AS (
  SELECT *,
         {_rfm_case("recency_days", RFM_R_DAYS, asc=True)} AS r_score,
         {_rfm_case("frequency", RFM_F_ORDERS, asc=False)} AS f_score,
         {_rfm_case("monetary_cents", RFM_M_CENTS, asc=False)} AS m_score
  FROM scored)
SELECT custkey, recency_days, frequency, monetary_cents,
       CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
       CAST(m_score AS INT) AS m_score,
       CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
            WHEN r_score >= 4 THEN 'recent'
            WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
            WHEN r_score <= 2 AND f_score <= 2 THEN 'lost'
            ELSE 'regular' END AS segment
FROM s2
"""


PREFIX_DIMS = 16       # truncated head of the 64-dim embedding
PREFIX_RECALL_K = 10   # top-k depth compared


def q_sim_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation evaluation [K: MRL]: recall@k of
    cosine top-k computed on the first PREFIX_DIMS dimensions against
    the full-dimension top-k, per query — the measurement that decides
    how many dimensions a cheap first-pass ANN index can drop. Overlap
    and recall are exact integers (ppm); both rankings share the
    deterministic (cos desc, cid asc) tie discipline.

    Shape: identical to the brute cosine baseline — the tiny query set
    broadcast against the corpus, per-query keyed rank windows, then
    one equi-join of the two k-row-per-query lists and a qid-keyed
    count. The prefix leg reads the SAME column sliced, so no second
    scan materializes at the storage layer."""
    e = _tbl(spark, sf_dir, "embeddings")
    dbl = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    q = (e.filter(F.col("vec_id") < N_QUERY_VECS)
         .select(F.col("vec_id").alias("qid"),
                 dbl(F.col("embedding")).alias("qv"),
                 dbl(F.slice("embedding", 1, PREFIX_DIMS)).alias("qp")))
    c = (e.filter(F.col("vec_id") >= N_QUERY_VECS)
         .select(F.col("vec_id").alias("cid"),
                 dbl(F.col("embedding")).alias("cv"),
                 dbl(F.slice("embedding", 1, PREFIX_DIMS)).alias("cp")))

    def cos(a, b):
        dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                          F.lit(0.0), lambda acc, v: acc + v)
        nrm = lambda col: F.sqrt(F.aggregate(  # noqa: E731
            F.transform(col, lambda x: x * x), F.lit(0.0),
            lambda acc, v: acc + v))
        return F.round(dot / (nrm(a) * nrm(b)), 6)

    pairs = (q.crossJoin(F.broadcast(c))
             .withColumn("cos_full", cos(F.col("qv"), F.col("cv")))
             .withColumn("cos_pre", cos(F.col("qp"), F.col("cp"))))
    wf = Window.partitionBy("qid").orderBy(F.desc("cos_full"),
                                           F.asc("cid"))
    wp = Window.partitionBy("qid").orderBy(F.desc("cos_pre"),
                                           F.asc("cid"))
    full_k = (pairs.withColumn("rk", F.row_number().over(wf))
              .filter(F.col("rk") <= PREFIX_RECALL_K)
              .select("qid", "cid"))
    pre_k = (pairs.withColumn("rk", F.row_number().over(wp))
             .filter(F.col("rk") <= PREFIX_RECALL_K)
             .select("qid", "cid"))
    hits = (full_k.join(pre_k, ["qid", "cid"], "left_semi")
            .groupBy("qid").agg(F.count(F.lit(1)).alias("overlap")))
    return (full_k.select("qid").distinct()
            .join(hits, "qid", "left")
            .select("qid",
                    F.coalesce(F.col("overlap"), F.lit(0))
                    .cast("long").alias("overlap"))
            .withColumn("recall_ppm", F.expr(
                f"overlap * 1000000 DIV {PREFIX_RECALL_K}")))


def _sql_sim_prefix_recall() -> str:
    def cos_sql(qcol, ccol):
        return f"""round(
           (SELECT sum(cast(x AS DOUBLE) * cast(y AS DOUBLE))
            FROM (SELECT unnest({qcol}) AS x, unnest({ccol}) AS y))
           / (sqrt((SELECT sum(cast(x AS DOUBLE) * cast(x AS DOUBLE))
                    FROM (SELECT unnest({qcol}) AS x)))
              * sqrt((SELECT sum(cast(y AS DOUBLE) * cast(y AS DOUBLE))
                      FROM (SELECT unnest({ccol}) AS y)))), 6)"""
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv,
                  embedding[1:{PREFIX_DIMS}] AS qp
           FROM embeddings WHERE vec_id < {N_QUERY_VECS}),
c AS (SELECT vec_id AS cid, embedding AS cv,
             embedding[1:{PREFIX_DIMS}] AS cp
      FROM embeddings WHERE vec_id >= {N_QUERY_VECS}),
pairs AS MATERIALIZED (
  SELECT q.qid, c.cid,
         {cos_sql('q.qv', 'c.cv')} AS cos_full,
         {cos_sql('q.qp', 'c.cp')} AS cos_pre
  FROM q CROSS JOIN c),
full_k AS (
  SELECT qid, cid FROM (
    SELECT qid, cid, row_number() OVER (PARTITION BY qid
           ORDER BY cos_full DESC, cid ASC) AS rk FROM pairs)
  WHERE rk <= {PREFIX_RECALL_K}),
pre_k AS (
  SELECT qid, cid FROM (
    SELECT qid, cid, row_number() OVER (PARTITION BY qid
           ORDER BY cos_pre DESC, cid ASC) AS rk FROM pairs)
  WHERE rk <= {PREFIX_RECALL_K}),
hits AS (
  SELECT f.qid, count(*) AS overlap
  FROM full_k f JOIN pre_k p ON p.qid = f.qid AND p.cid = f.cid
  GROUP BY 1)
SELECT f.qid, CAST(coalesce(h.overlap, 0) AS BIGINT) AS overlap,
       CAST(coalesce(h.overlap, 0) * 1000000 // {PREFIX_RECALL_K}
            AS BIGINT) AS recall_ppm
FROM (SELECT DISTINCT qid FROM full_k) f
LEFT JOIN hits h ON h.qid = f.qid
"""


KEEP_MIN_TOKENS = 20   # short-doc gate
KEEP_TTR_PCT = 35      # lexical-diversity gate: distinct*100 < n*35


def q_curation_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation decision — the keep/drop list with reason
    codes that an ingestion pipeline actually ships [K: RefinedWeb /
    FineWeb-style gate cascades]. Gates fire in a fixed documented
    order and the FIRST failure names the reason: (1) near-dup
    non-survivor (the SAMEAS_PREFIX fingerprint group, canonical = min
    doc_id keeps), (2) too short (< KEEP_MIN_TOKENS whitespace
    tokens), (3) low lexical diversity (distinct*100 < n*KEEP_TTR_PCT
    — integer cross-multiply, no float ratio crosses engines), else
    kept. One row per document, keep flag + reason.

    Shape: the dup gate is one fingerprint-keyed hash agg joined back
    doc-keyed; every other gate is map-side token arithmetic. No
    windows, nothing global — the exact cascade shape that runs as one
    pass over a 100-TB corpus."""
    d = _docs(spark, sf_dir)
    fp = d.select("doc_id",
                  F.substring(F.lower("text"), 1, SAMEAS_PREFIX)
                  .alias("fp"))
    canon = fp.groupBy("fp").agg(F.min("doc_id").alias("canon_doc"))
    toks = F.filter(F.split(F.lower(F.col("text")), " "),
                    lambda t: t != "")
    gated = (d.select("doc_id",
                      F.size(toks).alias("n_tokens"),
                      F.size(F.array_distinct(toks)).alias("n_distinct"))
             .join(fp, "doc_id").join(canon, "fp"))
    reason = F.when(F.col("doc_id") != F.col("canon_doc"),
                    F.lit("near_dup")) \
        .when(F.col("n_tokens") < KEEP_MIN_TOKENS, F.lit("too_short")) \
        .when(F.col("n_distinct") * 100
              < F.col("n_tokens") * KEEP_TTR_PCT, F.lit("low_ttr")) \
        .otherwise(F.lit("kept"))
    return (gated.select("doc_id", reason.alias("reason"))
            .withColumn("keep", (F.col("reason") == "kept").cast("int")))


def _sql_curation_keep_list() -> str:
    return f"""
WITH fp AS (
  SELECT doc_id, substr(lower(text), 1, {SAMEAS_PREFIX}) AS fp,
         list_filter(string_split(lower(text), ' '), x -> x <> '')
           AS toks
  FROM documents),
canon AS (SELECT fp, min(doc_id) AS canon_doc FROM fp GROUP BY fp),
gated AS (
  SELECT f.doc_id, len(f.toks) AS n_tokens,
         len(list_distinct(f.toks)) AS n_distinct, c.canon_doc
  FROM fp f JOIN canon c ON c.fp = f.fp)
SELECT doc_id,
       CASE WHEN doc_id <> canon_doc THEN 'near_dup'
            WHEN n_tokens < {KEEP_MIN_TOKENS} THEN 'too_short'
            WHEN n_distinct * 100 < n_tokens * {KEEP_TTR_PCT}
              THEN 'low_ttr'
            ELSE 'kept' END AS reason,
       CAST(CASE WHEN doc_id <> canon_doc THEN 0
                 WHEN n_tokens < {KEEP_MIN_TOKENS} THEN 0
                 WHEN n_distinct * 100 < n_tokens * {KEEP_TTR_PCT}
                   THEN 0 ELSE 1 END AS INT) AS keep
FROM gated
"""


POOL_SIGN_BITS = 4   # sign-bucket width for the pooled-neighbor join
POOL_TOP = 3         # neighbors returned per conversation


def q_sim_conv_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical embedding pooling + bucketed neighbor join: mean-
    pool the int8-quantized document embeddings per conversation
    (exact integer mean via the (sum+127*n)//n-127 shift — the same
    engine-portable trick as the Lloyd update), then find each
    conversation's POOL_TOP nearest conversations by integer dot
    product among SIGN-BUCKET collisions (first POOL_SIGN_BITS pooled
    dims) — the doc->passage->corpus rollup a retrieval pipeline runs
    to build coarse conversation-level routing.

    Shape: pooling is one (conv, dim)-keyed hash agg + one conv-keyed
    re-assembly; the candidate join is an equi-join on the sign bucket
    (never all-pairs — the LSH-family argument every ANN path in this
    repo uses); ranking windows are conv-keyed."""
    from ..operators.simsearch import quantize_embeddings
    qz = quantize_embeddings(_tbl(spark, sf_dir, "embeddings"))
    dims = (qz.select((F.col("vec_id") % N_CONVS).cast("int")
                      .alias("conv"),
                      F.posexplode("qvec").alias("pos", "v"))
            .groupBy("conv", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")))
    pool = (dims.withColumn("pv", F.expr("(s + 127 * n) DIV n - 127"))
            .groupBy("conv")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "pv"))),
                lambda x: x.pv).alias("pvec")))
    bucket = sum((F.when(F.element_at("pvec", i + 1) >= 0, 2 ** i)
                  .otherwise(0)) for i in range(POOL_SIGN_BITS))
    pb = pool.withColumn("bucket", bucket.cast("int"))
    a = pb.select(F.col("conv").alias("ca"), F.col("pvec").alias("va"),
                  "bucket")
    b = pb.select(F.col("conv").alias("cb"), F.col("pvec").alias("vb"),
                  "bucket")
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0).cast("long"), lambda acc, v: acc + v)
    pairs = (a.join(b, "bucket").filter(F.col("ca") < F.col("cb"))
             .withColumn("dot", dot).select("ca", "cb", "dot"))
    both = (pairs.select(F.col("ca").alias("conv"),
                         F.col("cb").alias("neighbor"), "dot")
            .unionByName(pairs.select(F.col("cb").alias("conv"),
                                      F.col("ca").alias("neighbor"),
                                      "dot")))
    w = Window.partitionBy("conv").orderBy(F.desc("dot"),
                                           F.asc("neighbor"))
    return (both.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= POOL_TOP)
            .select("conv", "neighbor", "dot", "rk"))


def _sql_sim_conv_pool() -> str:
    bits = " + ".join(
        f"CASE WHEN pvec[{i + 1}] >= 0 THEN {2 ** i} ELSE 0 END"
        for i in range(POOL_SIGN_BITS))
    return f"""
WITH q8 AS (
  SELECT vec_id,
         CASE WHEN ma = 0 THEN list_transform(d, x -> 0)
              ELSE list_transform(d, x -> CAST(round(x * 127.0 / ma, 0)
                                               AS INT))
         END AS qvec
  FROM (SELECT vec_id, d,
               list_max(list_transform(d, x -> abs(x))) AS ma
        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS d
              FROM embeddings))),
dims AS (
  SELECT CAST(vec_id % {N_CONVS} AS INT) AS conv, r.i AS pos,
         sum(qvec[r.i]) AS s, count(*) AS n
  FROM q8, lateral unnest(range(1, {KMEANS_DIM + 1})) AS r(i)
  GROUP BY 1, 2),
pool AS (
  SELECT conv,
         list(CAST((s + 127 * n) // n - 127 AS BIGINT) ORDER BY pos)
           AS pvec
  FROM dims GROUP BY conv),
pb AS (SELECT conv, pvec, CAST({bits} AS INT) AS bucket FROM pool),
pairs AS (
  SELECT a.conv AS ca, b.conv AS cb,
         CAST(list_sum(list_transform(range(1, {KMEANS_DIM + 1}),
              i -> a.pvec[i] * b.pvec[i])) AS BIGINT) AS dot
  FROM pb a JOIN pb b ON b.bucket = a.bucket AND a.conv < b.conv),
sym AS (
  SELECT ca AS conv, cb AS neighbor, dot FROM pairs
  UNION ALL
  SELECT cb, ca, dot FROM pairs)
SELECT conv, neighbor, dot, rk FROM (
  SELECT conv, neighbor, dot,
         CAST(row_number() OVER (PARTITION BY conv
              ORDER BY dot DESC, neighbor ASC) AS INT) AS rk
  FROM sym)
WHERE rk <= {POOL_TOP}
"""


def q_kg_property_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-centric property-table denormalization [K: the classic
    RDF property-table / entity-card storage layout]: one wide row per
    subject with per-predicate counts, the max link score, and the
    DISTINCT object lists flattened to '|'-joined sorted strings
    (engine-portable — array hashing is not) — the materialization a
    serving layer reads instead of re-aggregating the triple table per
    request.

    Shape: one subject-keyed hash agg over the triple table (the
    conditional aggregates all fold into the same Expand-free agg);
    the list columns come from two DISTINCT sub-aggs keyed the same
    way, left-joined back. Partial aggregation everywhere; at cluster
    scale the table buckets by subj exactly like the triple sink."""
    t = q_kg_triples(spark, sf_dir)
    base = (t.groupBy("subj").agg(
        F.sum(F.when(F.col("pred") == "mentions", 1).otherwise(0))
        .alias("n_mentions"),
        F.sum(F.when(F.col("pred") == "uses_tool", 1).otherwise(0))
        .alias("n_tools"),
        F.sum(F.when(F.col("pred") == "replies_to", 1).otherwise(0))
        .alias("n_replies"),
        F.round(F.max("score"), 6).alias("max_score")))
    concepts = (t.filter(F.col("pred") == "mentions")
                .select("subj", "obj").distinct()
                .groupBy("subj")
                .agg(F.concat_ws("|", F.array_sort(F.collect_set("obj")))
                     .alias("concept_list")))
    tools = (t.filter(F.col("pred") == "uses_tool")
             .select("subj", "obj").distinct()
             .groupBy("subj")
             .agg(F.concat_ws("|", F.array_sort(F.collect_set("obj")))
                  .alias("tool_list")))
    return (base.join(concepts, "subj", "left")
            .join(tools, "subj", "left")
            .select("subj", "n_mentions", "n_tools", "n_replies",
                    "max_score",
                    F.coalesce("concept_list", F.lit(""))
                    .alias("concept_list"),
                    F.coalesce("tool_list", F.lit(""))
                    .alias("tool_list")))


def _sql_kg_property_table() -> str:
    return f"""
WITH triples AS MATERIALIZED ({_sql_kg_triples_body()}),
base AS (
  SELECT subj,
         CAST(sum(CASE WHEN pred = 'mentions' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_mentions,
         CAST(sum(CASE WHEN pred = 'uses_tool' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_tools,
         CAST(sum(CASE WHEN pred = 'replies_to' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_replies,
         round(max(score), 6) AS max_score
  FROM triples GROUP BY subj),
concepts AS (
  SELECT subj, string_agg(obj, '|' ORDER BY obj) AS concept_list
  FROM (SELECT DISTINCT subj, obj FROM triples WHERE pred = 'mentions')
  GROUP BY subj),
tools AS (
  SELECT subj, string_agg(obj, '|' ORDER BY obj) AS tool_list
  FROM (SELECT DISTINCT subj, obj FROM triples WHERE pred = 'uses_tool')
  GROUP BY subj)
SELECT b.subj, b.n_mentions, b.n_tools, b.n_replies, b.max_score,
       coalesce(c.concept_list, '') AS concept_list,
       coalesce(t.tool_list, '') AS tool_list
FROM base b
LEFT JOIN concepts c ON c.subj = b.subj
LEFT JOIN tools t ON t.subj = b.subj
"""


def q_text_jsd_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distribution shift: Jensen-Shannon divergence [K]
    between each language slice's unigram distribution and the REST of
    the corpus — the curation dashboard's "which slice is drifting
    away from the mixture" read. Per-token JSD contributions are
    rounded to micro-nat INTEGERS before the sum (the same
    merge-order-independence discipline as the bigram-LM perplexity
    operator), so the per-slice totals are bit-exact cross-engine.

    Shape: one (lang, token) hash agg, one token hash agg, per-lang
    totals as a 5-row broadcast join, and the contribution scan is
    map-side CASE arithmetic. Nothing global, no windows."""
    d = _docs(spark, sf_dir)
    toks = d.select("lang",
                    F.explode(F.filter(
                        F.split(F.lower("text"), " "),
                        lambda t: t != "")).alias("tok"))
    lt = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c_lt"))
    tot_l = lt.groupBy("lang").agg(F.sum("c_lt").alias("n_l"),
                                   F.count(F.lit(1)).alias("vocab_l"))
    tot_t = lt.groupBy("tok").agg(F.sum("c_lt").alias("c_t"))
    gtot = lt.agg(F.sum("c_lt").alias("n_all"))
    # token grid per lang: every (lang, token-in-corpus) cell so the
    # q-only side (token absent from the slice) still contributes
    grid = (tot_l.select("lang").crossJoin(tot_t)
            .join(lt, ["lang", "tok"], "left")
            .withColumn("c_lt", F.coalesce("c_lt", F.lit(0))))
    j = (grid.join(tot_l.select("lang", "n_l"), "lang")
         .crossJoin(F.broadcast(gtot)))
    term = F.expr("""
        CAST(round((
          CASE WHEN c_lt > 0 THEN
            0.5 * (CAST(c_lt AS DOUBLE) / n_l)
                * ln((CAST(c_lt AS DOUBLE) / n_l)
                     / (0.5 * (CAST(c_lt AS DOUBLE) / n_l)
                        + 0.5 * (CAST(c_t - c_lt AS DOUBLE)
                                 / (n_all - n_l))))
          ELSE 0.0 END
          +
          CASE WHEN c_t - c_lt > 0 THEN
            0.5 * (CAST(c_t - c_lt AS DOUBLE) / (n_all - n_l))
                * ln((CAST(c_t - c_lt AS DOUBLE) / (n_all - n_l))
                     / (0.5 * (CAST(c_lt AS DOUBLE) / n_l)
                        + 0.5 * (CAST(c_t - c_lt AS DOUBLE)
                                 / (n_all - n_l))))
          ELSE 0.0 END) * 1000000, 0) AS BIGINT)""")
    return (j.withColumn("term_micro", term)
            .groupBy("lang")
            .agg(F.sum("term_micro").alias("jsd_micro"))
            .join(tot_l, "lang")
            .select("lang", F.col("n_l").alias("n_tokens"),
                    F.col("vocab_l").alias("vocab"), "jsd_micro"))


def _sql_text_jsd_sources() -> str:
    return """
WITH toks AS (
  SELECT lang, t.tok
  FROM documents, unnest(string_split(lower(text), ' ')) AS t(tok)
  WHERE t.tok <> ''),
lt AS (SELECT lang, tok, count(*) AS c_lt FROM toks GROUP BY 1, 2),
tot_l AS (SELECT lang, CAST(sum(c_lt) AS BIGINT) AS n_l,
                 count(*) AS vocab_l
          FROM lt GROUP BY lang),
tot_t AS (SELECT tok, CAST(sum(c_lt) AS BIGINT) AS c_t
          FROM lt GROUP BY tok),
gtot AS (SELECT CAST(sum(c_lt) AS BIGINT) AS n_all FROM lt),
grid AS (
  SELECT l.lang, t.tok, t.c_t, coalesce(x.c_lt, 0) AS c_lt
  FROM (SELECT lang FROM tot_l) l
  CROSS JOIN tot_t t
  LEFT JOIN lt x ON x.lang = l.lang AND x.tok = t.tok),
j AS (
  SELECT g.lang, g.c_lt, g.c_t, l.n_l, a.n_all
  FROM grid g JOIN tot_l l ON l.lang = g.lang CROSS JOIN gtot a),
terms AS (
  SELECT lang,
         CAST(round((
           CASE WHEN c_lt > 0 THEN
             0.5 * (CAST(c_lt AS DOUBLE) / n_l)
                 * ln((CAST(c_lt AS DOUBLE) / n_l)
                      / (0.5 * (CAST(c_lt AS DOUBLE) / n_l)
                         + 0.5 * (CAST(c_t - c_lt AS DOUBLE)
                                  / (n_all - n_l))))
           ELSE 0.0 END
           +
           CASE WHEN c_t - c_lt > 0 THEN
             0.5 * (CAST(c_t - c_lt AS DOUBLE) / (n_all - n_l))
                 * ln((CAST(c_t - c_lt AS DOUBLE) / (n_all - n_l))
                      / (0.5 * (CAST(c_lt AS DOUBLE) / n_l)
                         + 0.5 * (CAST(c_t - c_lt AS DOUBLE)
                                  / (n_all - n_l))))
           ELSE 0.0 END) * 1000000, 0) AS BIGINT) AS term_micro
  FROM j)
SELECT t.lang, l.n_l AS n_tokens, l.vocab_l AS vocab,
       CAST(sum(t.term_micro) AS BIGINT) AS jsd_micro
FROM terms t JOIN tot_l l ON l.lang = t.lang
GROUP BY t.lang, l.n_l, l.vocab_l
"""


HILL_DMIN = 16  # tail threshold for the Hill estimator


def q_kg_powerlaw_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law tail exponent of the KG degree distribution — the
    Hill maximum-likelihood estimator [K: Clauset-Shalizi-Newman]:
    alpha = 1 + n / sum(ln(d / d_min)) over undirected degrees
    d >= HILL_DMIN. The one-number answer to "how hub-dominated is
    this graph", which decides whether degree-capped joins (the
    LINKPRED_HUB_CAP family) are mandatory at scale. Per-node ln terms
    are rounded to micro-nat INTEGERS before the sum (the repo's
    merge-order-independence discipline) and alpha comes out in exact
    micro units via BIGINT division, so the estimate is bit-identical
    cross-engine.

    Shape: the degree table (one hash agg over the undirected edge
    set), a map-side filter + ln, one 1-row reduce."""
    from ..operators.graph import undirected_edges
    e = undirected_edges(q_kg_triples(spark, sf_dir))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    tail = (deg.filter(F.col("deg") >= HILL_DMIN)
            .withColumn("ln_micro", F.expr(
                f"CAST(round(ln(CAST(deg AS DOUBLE) / {HILL_DMIN})"
                f" * 1000000, 0) AS BIGINT)")))
    return (tail.agg(F.count(F.lit(1)).alias("n_tail"),
                     F.sum("ln_micro").alias("sum_ln_micro"))
            .select("n_tail", "sum_ln_micro",
                    F.expr("1000000 + n_tail * 1000000000000"
                           " DIV sum_ln_micro").alias("alpha_micro")))


def _sql_kg_powerlaw_alpha() -> str:
    return f"""
WITH triples AS MATERIALIZED ({_sql_kg_triples_body()}),
e AS (
  SELECT subj AS src, obj AS dst FROM (SELECT DISTINCT subj, obj FROM triples)
  UNION
  SELECT obj, subj FROM (SELECT DISTINCT subj, obj FROM triples)),
deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
tail AS (
  SELECT CAST(round(ln(CAST(deg AS DOUBLE) / {HILL_DMIN}) * 1000000, 0)
              AS BIGINT) AS ln_micro
  FROM deg WHERE deg >= {HILL_DMIN})
SELECT count(*) AS n_tail,
       CAST(sum(ln_micro) AS BIGINT) AS sum_ln_micro,
       CAST(1000000 + count(*) * 1000000000000 // sum(ln_micro)
            AS BIGINT) AS alpha_micro
FROM tail
"""


BURST_MIN_TOTAL = 100  # corpus-count floor for emitted tokens


def q_text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token burstiness — the variance-to-mean ratio (index of
    dispersion [K: Church-Gale burstiness]) of each frequent token's
    per-document count across the WHOLE corpus (absent docs count as
    zero): VMR 1e6 = Poisson-like spread, higher = the token clumps
    into few documents — the signal that separates content words from
    function words and drives stop-shingle pruning in the dedup stack.
    Computed entirely from integer sums: vmr_ppm =
    (N*sum(c^2) - sum(c)^2) * 1e6 // (N*sum(c)).

    Shape: one (doc, token) hash agg, one token hash agg (sum, sum of
    squares, df all in the same partial agg), the doc count as a 1-row
    broadcast. No windows, nothing global."""
    d = _docs(spark, sf_dir)
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    toks = d.select("doc_id",
                    F.explode(F.filter(F.split(F.lower("text"), " "),
                                       lambda t: t != "")).alias("tok"))
    dt = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    per_tok = (dt.groupBy("tok")
               .agg(F.count(F.lit(1)).alias("df"),
                    F.sum("c").alias("total"),
                    F.sum(F.col("c") * F.col("c")).alias("sum_sq"))
               .filter(F.col("total") >= BURST_MIN_TOTAL))
    return (per_tok.crossJoin(F.broadcast(n_docs))
            .select("tok", "df", "total",
                    F.expr("(n_docs * sum_sq - total * total) * 1000000"
                           " DIV (n_docs * total)").alias("vmr_ppm")))


def _sql_text_burstiness() -> str:
    return f"""
WITH n AS (SELECT count(*) AS n_docs FROM documents),
toks AS (
  SELECT doc_id, t.tok
  FROM documents, unnest(string_split(lower(text), ' ')) AS t(tok)
  WHERE t.tok <> ''),
dt AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
per_tok AS (
  SELECT tok, count(*) AS df, CAST(sum(c) AS BIGINT) AS total,
         CAST(sum(c * c) AS BIGINT) AS sum_sq
  FROM dt GROUP BY tok
  HAVING sum(c) >= {BURST_MIN_TOTAL})
SELECT tok, df, total,
       CAST((n.n_docs * sum_sq - total * total) * 1000000
            // (n.n_docs * total) AS BIGINT) AS vmr_ppm
FROM per_tok CROSS JOIN n
"""


MM_PATCH = 16  # ViT-style square patch side


def q_multimodal_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style patch-grid extraction plumbing: run the mapInPandas
    decode seam (stub decoder — a real codec drops in behind the same
    seam), then explode each media item into its ceil(w/P) x ceil(h/P)
    patch grid with edge patches clipped to the image bounds — the
    exact (batching, shape, clip) arithmetic a vision preprocessor
    ships to the trainer. Every output is integer; the oracle replays
    the stub's md5-derived dimensions digit-by-digit like the other
    multimodal pairings.

    Shape: decode is one Arrow-batched mapInPandas pass; the grid is a
    map-side sequence explode (fan-out bounded by n_patches <= 25 at
    the stub's max 80x80); no shuffle at all after the scan."""
    from ..operators.multimodal import attach_fake_media, decode_media
    dec = decode_media(attach_fake_media(_docs(spark, sf_dir)))
    p = MM_PATCH
    g = dec.select(
        "doc_id", "width", "height",
        F.expr(f"CAST((width + {p - 1}) DIV {p} AS INT)").alias("px"),
        F.expr(f"CAST((height + {p - 1}) DIV {p} AS INT)").alias("py"))
    e = g.withColumn("pid", F.explode(F.expr("sequence(0, px * py - 1)")))
    return e.select(
        "doc_id",
        F.col("pid").cast("int").alias("patch_id"),
        F.expr("CAST(pid DIV px AS INT)").alias("prow"),
        F.expr("CAST(pid % px AS INT)").alias("pcol"),
        F.expr(f"CAST(least({p}, width - (pid % px) * {p}) AS INT)")
        .alias("pw"),
        F.expr(f"CAST(least({p}, height - (pid DIV px) * {p}) AS INT)")
        .alias("ph"),
        F.expr("CAST(px * py AS INT)").alias("n_patches"))


def _sql_multimodal_patches() -> str:
    p = MM_PATCH
    digits = ", ".join(
        f"instr('0123456789abcdef', substring(h, {i + 1}, 1)) - 1 AS d{i}"
        for i in range(4))
    return f"""
WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
dims AS (
  SELECT doc_id,
         16 + (16 * d0 + d1) % 64 AS width,
         16 + (16 * d2 + d3) % 64 AS height
  FROM (SELECT doc_id, {digits} FROM hx)),
grid AS (
  SELECT doc_id, width, height,
         (width + {p - 1}) // {p} AS px,
         (height + {p - 1}) // {p} AS py
  FROM dims)
SELECT g.doc_id,
       CAST(r.pid AS INT) AS patch_id,
       CAST(r.pid // g.px AS INT) AS prow,
       CAST(r.pid % g.px AS INT) AS pcol,
       CAST(least({p}, g.width - (r.pid % g.px) * {p}) AS INT) AS pw,
       CAST(least({p}, g.height - (r.pid // g.px) * {p}) AS INT) AS ph,
       CAST(g.px * g.py AS INT) AS n_patches
FROM grid g, lateral unnest(range(0, g.px * g.py)) AS r(pid)
"""


def q_stream_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming type-2 SCD maintenance — the warehouse-grade
    incremental-history pattern: the events change stream drains in
    four TIME-ORDERED micro-batches (day-of-month ranges), foreachBatch
    keeps only each batch's per-user CHANGE POINTS (lag-pruned — the
    state grows with type changes, never with raw event volume), and
    the final history assembles validity intervals over the pruned
    state. Batch-local pruning can never drop a global change point
    (each user's first event per batch is always kept; batches
    partition time, so every within-batch predecessor IS the global
    predecessor), so the drained history is row-identical to the batch
    operator — the oracle is literally rel_scd2's SQL over all events,
    pinning stream ≡ batch end-to-end through a real readStream.

    Shape: per batch one user-keyed lag window + an append; final
    assembly one user-keyed gaps-and-islands pass over the (small)
    change-point state."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    from ..operators.agentstats import scd2_history
    sfx = f"{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}"
    root = _os.path.join(_tempfile.gettempdir(), f"stream_scd2_{sfx}")
    ckpt = _os.path.join(root, "ckpt")
    src = _os.path.join(root, "src")
    state = _os.path.join(root, "state")
    _shutil.rmtree(root, ignore_errors=True)
    _os.makedirs(src)
    ev = _tbl(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id")
    for b, (lo, hi) in enumerate(((1, 8), (9, 15), (16, 22), (23, 31))):
        batch = ev.filter((F.dayofmonth("ts") >= lo)
                          & (F.dayofmonth("ts") <= hi))
        stage = _os.path.join(root, f"stage_{b}")
        batch.coalesce(1).write.parquet(stage)
        part = next(f for f in _os.listdir(stage)
                    if f.endswith(".parquet"))
        _os.rename(_os.path.join(stage, part),
                   _os.path.join(src, f"b{b}.parquet"))
    schema = ("user_id long, event_type string, ts timestamp, "
              "event_id long")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))

    def _fold(batch_df: DataFrame, _batch_id: int) -> None:
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        pruned = (batch_df
                  .withColumn("prev", F.lag("event_type").over(w))
                  .filter(F.col("prev").isNull()
                          | (F.col("prev") != F.col("event_type")))
                  .drop("prev"))
        pruned.write.mode("append").parquet(state)

    q = (stream.writeStream.outputMode("update").foreachBatch(_fold)
         .trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination()
    return scd2_history(spark.read.parquet(state),
                        key_col="user_id", attr_col="event_type",
                        ts_col="ts", tiebreak_col="event_id")


IMPACT_CONV_SUFFIX = "1"  # the "changed since last build" conv set


def q_kg_impact_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineage impact analysis for incremental rebuilds [K: the
    warehouse "what do I have to recompute" read]: given a changed
    source-conversation set (deterministic here: conv ids ending in
    IMPACT_CONV_SUFFIX — in production the manifest diff supplies it),
    report what fraction of every downstream artifact derives from the
    changed sources — triples, CDS rows, concepts touched, and the
    current search top-20. Exact-integer shares in ppm.

    Shape: each leg is the artifact's own (already keyed) plan plus a
    map-side provenance predicate on the conv id embedded in the key —
    no new shuffles; the four 1-row aggregates union into the report."""
    changed = lambda c: c.endswith(IMPACT_CONV_SUFFIX)  # noqa: E731
    t = q_kg_triples(spark, sf_dir).withColumn(
        "conv", F.split(F.col("subj"), ":").getItem(1))
    is_ch = F.col("conv").endswith(IMPACT_CONV_SUFFIX)
    leg_t = t.agg(F.sum(F.when(is_ch, 1).otherwise(0)).alias("affected"),
                  F.count(F.lit(1)).alias("total")) \
        .select(F.lit("triples").alias("artifact"), "affected", "total")
    cds = q_kg_cds(spark, sf_dir).withColumn(
        "conv", F.split(F.col("subj_key"), ":").getItem(1))
    leg_c = cds.agg(F.sum(F.when(is_ch, 1).otherwise(0))
                    .alias("affected"),
                    F.count(F.lit(1)).alias("total")) \
        .select(F.lit("cds_rows").alias("artifact"), "affected", "total")
    conc = (t.filter(F.col("pred") == "mentions")
            .groupBy("obj")
            .agg(F.max(F.when(is_ch, 1).otherwise(0)).alias("touched")))
    leg_k = conc.agg(F.sum("touched").alias("affected"),
                     F.count(F.lit(1)).alias("total")) \
        .select(F.lit("concepts").alias("artifact"), "affected", "total")
    srch = q_kg_search(spark, sf_dir).withColumn(
        "conv", F.split(F.col("subj_key"), ":").getItem(1))
    leg_s = srch.agg(F.sum(F.when(is_ch, 1).otherwise(0))
                     .alias("affected"),
                     F.count(F.lit(1)).alias("total")) \
        .select(F.lit("search_top20").alias("artifact"), "affected",
                "total")
    rep = leg_t.unionByName(leg_c).unionByName(leg_k).unionByName(leg_s)
    return rep.select("artifact",
                      F.col("affected").cast("long").alias("affected"),
                      F.col("total").cast("long").alias("total"),
                      F.expr("affected * 1000000 DIV total")
                      .alias("share_ppm"))


def _sql_kg_impact_analysis() -> str:
    import pandas as pd
    scores = driver_scores()
    gaz = driver_gazetteer()
    norm = S.normalize_text(SEARCH_QUERY)
    surfaces = sorted({m[0] for m in S.find_mentions(norm, gaz)})
    q = (scores[scores.surface.isin(surfaces)]
         .groupby("concept_id", as_index=False)["cos_sim"].max()
         .rename(columns={"cos_sim": "q_score"}).round({"q_score": 6}))
    qv = values_sql(pd.DataFrame(q), "q")
    sfx = IMPACT_CONV_SUFFIX
    return f"""
WITH triples AS MATERIALIZED ({_sql_kg_triples_body()}),
cds AS MATERIALIZED ({_sql_kg_cds_body()}),
tt AS (
  SELECT CASE WHEN string_split(subj, ':')[2] LIKE '%{sfx}'
              THEN 1 ELSE 0 END AS ch, pred, obj
  FROM triples),
leg_t AS (
  SELECT 'triples' AS artifact, CAST(sum(ch) AS BIGINT) AS affected,
         count(*) AS total
  FROM tt),
leg_c AS (
  SELECT 'cds_rows' AS artifact,
         CAST(sum(CASE WHEN string_split(subj_key, ':')[2] LIKE '%{sfx}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS affected,
         count(*) AS total
  FROM cds),
leg_k AS (
  SELECT 'concepts' AS artifact, CAST(sum(touched) AS BIGINT) AS affected,
         count(*) AS total
  FROM (SELECT obj, max(ch) AS touched FROM tt
        WHERE pred = 'mentions' GROUP BY obj)),
ranked AS (
  SELECT c.subj_key, round(sum(c.score * q.q_score), 6) AS search_score
  FROM cds c JOIN {qv} ON q.concept_id = c.cds_concept
  GROUP BY c.subj_key),
top AS (SELECT subj_key FROM ranked
        ORDER BY search_score DESC, subj_key ASC LIMIT 20),
leg_s AS (
  SELECT 'search_top20' AS artifact,
         CAST(sum(CASE WHEN string_split(subj_key, ':')[2] LIKE '%{sfx}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS affected,
         count(*) AS total
  FROM top),
rep AS (
  SELECT * FROM leg_t UNION ALL SELECT * FROM leg_c
  UNION ALL SELECT * FROM leg_k UNION ALL SELECT * FROM leg_s)
SELECT artifact, affected, CAST(total AS BIGINT) AS total,
       CAST(affected * 1000000 // total AS BIGINT) AS share_ppm
FROM rep
"""


VOCAB_COV_SIZES = (1, 2, 4, 8, 16, 32)  # candidate vocabulary sizes


def q_text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage / OOV-rate curve [K: the tokenizer-design
    measurement]: for each candidate vocab size N (top-N tokens by
    corpus count, deterministic ties), the fraction of total token
    mass covered — 1e6 minus this is the OOV rate a size-N vocabulary
    pays. Exact-integer cumulative sums in ppm.

    Shape: one token hash agg, orderBy+limit to the largest N
    (TakeOrdered — the rank window sees only the limited head), then a
    tiny size-grid join. The corpus-total is a 1-row broadcast."""
    d = _docs(spark, sf_dir)
    counts = (d.select(F.explode(F.filter(
        F.split(F.lower("text"), " "), lambda t: t != "")).alias("tok"))
        .groupBy("tok").agg(F.count(F.lit(1)).alias("n")))
    total = counts.agg(F.sum("n").alias("total"))
    mx = max(VOCAB_COV_SIZES)
    top = counts.orderBy(F.desc("n"), F.asc("tok")).limit(mx)
    w = Window.orderBy(F.desc("n"), F.asc("tok"))
    ranked = top.withColumn("rk", F.row_number().over(w))
    sizes = spark.createDataFrame([(n,) for n in VOCAB_COV_SIZES],
                                  "vocab_n int")
    return (ranked.join(F.broadcast(sizes),
                        F.col("rk") <= F.col("vocab_n"))
            .groupBy("vocab_n")
            .agg(F.sum("n").alias("covered"))
            .crossJoin(F.broadcast(total))
            .select("vocab_n",
                    F.col("covered").cast("long").alias("covered"),
                    F.col("total").cast("long").alias("total"),
                    F.expr("covered * 1000000 DIV total")
                    .alias("coverage_ppm")))


def _sql_text_vocab_coverage() -> str:
    sizes = ", ".join(str(n) for n in VOCAB_COV_SIZES)
    mx = max(VOCAB_COV_SIZES)
    return f"""
WITH toks AS (
  SELECT t.tok
  FROM documents, unnest(string_split(lower(text), ' ')) AS t(tok)
  WHERE t.tok <> ''),
counts AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
total AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM counts),
ranked AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, tok ASC) AS rk
  FROM (SELECT tok, n FROM counts ORDER BY n DESC, tok ASC LIMIT {mx})),
sizes AS (SELECT unnest([{sizes}]) AS vocab_n)
SELECT s.vocab_n,
       CAST(sum(r.n) AS BIGINT) AS covered,
       t.total,
       CAST(sum(r.n) * 1000000 // t.total AS BIGINT) AS coverage_ppm
FROM ranked r JOIN sizes s ON r.rk <= s.vocab_n
CROSS JOIN total t
GROUP BY s.vocab_n, t.total
"""


def q_kg_mention_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG training-pair constructor: for every canonical (conversation,
    turn, concept) link, the +/-1-turn context window — the
    (query=concept, context=turn neighborhood) rows a retrieval-
    augmented trainer consumes. Window ids come from the P2 turn
    assembly (conv-keyed lag/lead), ctx_size counts the turns actually
    present (edge turns get 2), and the link score is the mention's
    max.

    Shape: one (conv, turn, concept) hash agg over the canonical
    mentions joined to the turn-assembly frame on its natural
    (conv, turn) key — both sides already partition by conversation;
    no new shuffle shapes, no windows beyond P2's own keyed ones."""
    canon = (q_kg_canonical(spark, sf_dir)
             .groupBy("conv_id", "turn_idx", "concept_id")
             .agg(F.round(F.max("link_score"), 6).alias("link_score")))
    turns = q_kg_turn_assembly(spark, sf_dir).select(
        "conv_id", "turn_idx", "prev_turn_idx", "next_turn_idx")
    j = canon.join(turns, ["conv_id", "turn_idx"])
    ctx = (F.lit(1)
           + F.when(F.col("prev_turn_idx").isNotNull(), 1).otherwise(0)
           + F.when(F.col("next_turn_idx").isNotNull(), 1).otherwise(0))
    return j.select("conv_id", "turn_idx", "concept_id", "link_score",
                    "prev_turn_idx", "next_turn_idx",
                    ctx.cast("int").alias("ctx_size"))


def _sql_kg_mention_contexts() -> str:
    canon = _sql_kg_canonical_body()
    return f"""
WITH canon AS ({canon}),
cm AS (
  SELECT conv_id, turn_idx, concept_id,
         round(max(link_score), 6) AS link_score
  FROM canon GROUP BY 1, 2, 3),
ta AS ({SQL_KG_TURN_ASSEMBLY.strip()})
SELECT c.conv_id, c.turn_idx, c.concept_id, c.link_score,
       t.prev_turn_idx, t.next_turn_idx,
       CAST(1 + CASE WHEN t.prev_turn_idx IS NULL THEN 0 ELSE 1 END
              + CASE WHEN t.next_turn_idx IS NULL THEN 0 ELSE 1 END
            AS INT) AS ctx_size
FROM cm c JOIN ta t ON t.conv_id = c.conv_id AND t.turn_idx = c.turn_idx
"""


DOMAIN_WEIGHT_CAP_PPM = 3_000_000  # max upweight any domain receives


def q_curation_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain loss/sampling reweighting table [K: the uniform-
    target rebalancing every mixture trainer ships]: weight(d) =
    (corpus_total / (n_domains * count(d))) in exact ppm, capped at
    DOMAIN_WEIGHT_CAP_PPM so a rare domain can never explode the loss
    — over-represented domains land below 1e6, under-represented above.
    Exact BIGINT throughout.

    Shape: one domain hash agg, the corpus totals as a broadcast 1-row
    aggregate, map-side arithmetic. Nothing else."""
    d = _docs(spark, sf_dir)
    per = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per.agg(F.sum("n_docs").alias("total"),
                  F.count(F.lit(1)).alias("n_domains"))
    return (per.crossJoin(F.broadcast(tot))
            .select("lang", "n_docs",
                    F.expr(f"""least(CAST({DOMAIN_WEIGHT_CAP_PPM} AS BIGINT),
                        total * 1000000 DIV (n_domains * n_docs))""")
                    .alias("weight_ppm"))
            .withColumn("capped",
                        (F.col("weight_ppm") == DOMAIN_WEIGHT_CAP_PPM)
                        .cast("int")))


def _sql_curation_domain_weights() -> str:
    return f"""
WITH per AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total,
               count(*) AS n_domains FROM per)
SELECT lang, n_docs,
       least(CAST({DOMAIN_WEIGHT_CAP_PPM} AS BIGINT),
             CAST(t.total * 1000000 // (t.n_domains * n_docs)
                  AS BIGINT)) AS weight_ppm,
       CAST(CASE WHEN least(CAST({DOMAIN_WEIGHT_CAP_PPM} AS BIGINT),
                 CAST(t.total * 1000000 // (t.n_domains * n_docs)
                      AS BIGINT)) = {DOMAIN_WEIGHT_CAP_PPM}
            THEN 1 ELSE 0 END AS INT) AS capped
FROM per CROSS JOIN tot t
"""


NBR_FANOUT_H1 = 3  # hop-1 sampled neighbors per seed
NBR_FANOUT_H2 = 2  # hop-2 sampled neighbors per hop-1 node


def q_kg_neighbor_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphSAGE-style bounded-fanout neighborhood sampler [K: the
    minibatch constructor every GNN trainer runs over a graph]: for
    each seed concept, sample <=NBR_FANOUT_H1 hop-1 neighbors, then
    <=NBR_FANOUT_H2 hop-2 neighbors per hop-1 node (never stepping
    straight back to the seed). The "random" draw is the repo's
    md5-replay convention — rank neighbors by
    md5(seed:hop:[src:]dst) — so any engine, at any parallelism, draws
    the identical neighborhood. One edge row per sampled step.

    Shape: two frontier⋈edges equi-joins; rank windows keyed by seed
    (hop 1) / (seed, src) (hop 2) — bounded by node degree, never
    global. Output <= |seeds| * F1 * (1 + F2) rows by construction:
    the fanout caps are exactly what makes 10^12-edge GNN minibatch
    sampling tractable (the joins stay equi-keyed and the expansion is
    a constant factor, not a degree power)."""
    from ..operators.graph import undirected_edges
    tr = q_kg_triples(spark, sf_dir)
    e = undirected_edges(tr)
    seeds = (tr.filter(F.col("pred") == "mentions")
             .select(F.col("obj").alias("seed")).distinct())
    s1 = F.md5(F.concat(F.col("seed"), F.lit(":1:"), F.col("dst")))
    w1 = Window.partitionBy("seed").orderBy(s1.asc(), F.col("dst").asc())
    hop1 = (seeds.join(e, seeds.seed == e.src)
            .withColumn("rk", F.row_number().over(w1))
            .filter(F.col("rk") <= NBR_FANOUT_H1)
            .select("seed", "src", "dst", "rk"))
    h1n = hop1.select("seed", F.col("dst").alias("node"))
    e2 = e.select(F.col("src").alias("node"), F.col("dst").alias("dst2"))
    s2 = F.md5(F.concat(F.col("seed"), F.lit(":2:"), F.col("node"),
                        F.lit(":"), F.col("dst2")))
    w2 = Window.partitionBy("seed", "node").orderBy(s2.asc(),
                                                    F.col("dst2").asc())
    hop2 = (h1n.join(e2, "node")
            .filter(F.col("dst2") != F.col("seed"))
            .withColumn("rk", F.row_number().over(w2))
            .filter(F.col("rk") <= NBR_FANOUT_H2)
            .select("seed", F.col("node").alias("src"),
                    F.col("dst2").alias("dst"), "rk"))
    return (hop1.select("seed", F.lit(1).alias("hop"), "src", "dst", "rk")
            .unionByName(hop2.select("seed", F.lit(2).alias("hop"),
                                     "src", "dst", "rk"))
            .select("seed", F.col("hop").cast("int").alias("hop"),
                    "src", "dst", F.col("rk").cast("int").alias("rk")))


def _sql_kg_neighbor_sampling() -> str:
    return f"""
WITH triples AS MATERIALIZED ({_sql_kg_triples_body()}),
e AS MATERIALIZED (
  SELECT subj AS src, obj AS dst FROM (SELECT DISTINCT subj, obj FROM triples)
  UNION
  SELECT obj, subj FROM (SELECT DISTINCT subj, obj FROM triples)),
seeds AS (SELECT DISTINCT obj AS seed FROM triples WHERE pred = 'mentions'),
h1 AS (
  SELECT seed, src, dst, rk FROM (
    SELECT s.seed, e.src, e.dst,
           row_number() OVER (PARTITION BY s.seed
                              ORDER BY md5(s.seed || ':1:' || e.dst) ASC,
                                       e.dst ASC) AS rk
    FROM seeds s JOIN e ON e.src = s.seed)
  WHERE rk <= {NBR_FANOUT_H1}),
h2 AS (
  SELECT seed, src, dst, rk FROM (
    SELECT h.seed, e.src, e.dst,
           row_number() OVER (PARTITION BY h.seed, e.src
                              ORDER BY md5(h.seed || ':2:' || e.src
                                           || ':' || e.dst) ASC,
                                       e.dst ASC) AS rk
    FROM h1 h JOIN e ON e.src = h.dst
    WHERE e.dst <> h.seed)
  WHERE rk <= {NBR_FANOUT_H2})
SELECT seed, CAST(1 AS INT) AS hop, src, dst, CAST(rk AS INT) AS rk FROM h1
UNION ALL
SELECT seed, CAST(2 AS INT) AS hop, src, dst, CAST(rk AS INT) AS rk FROM h2
"""


BOOT_REPLICATES = 48
# floor(CDF_Poisson(lambda=1)(k) * 2^24) for k = 0..6; a draw whose
# 24-bit hash point falls below threshold[k] gets weight k (ELSE 7
# caps the tail). Integer thresholds make the inverse-CDF comparison
# EXACT on every engine — no float CDF evaluation at query time.
BOOT_POISSON_THRESH = (6171992, 12343985, 15429982, 16458647,
                       16715813, 16767247, 16775819)


def q_stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap confidence interval for the corpus mean doc
    length [K: the resampling scheme for CIs over datasets too large
    to multinomial-resample — each element enters each replicate
    Poisson(1) times, so replicates stream in one scan with no global
    coordination]. Replicate weights come from a 24-bit md5 point per
    (doc, replicate) pushed through integer inverse-CDF thresholds
    (BOOT_POISSON_THRESH), per-replicate means use exact BIGINT
    sum(w*x)/sum(w) arithmetic, and the interval is the rank-2 /
    rank-(B-1) order statistics of the B=48 replicate means (the
    (1/48, 47/48) empirical quantiles, a ~95.8% interval).

    Shape: one documents scan exploded by the constant replicate
    dimension (48x, map-side), one 48-group hash agg (partial agg
    collapses each task to <=48 rows before the shuffle), then the
    order statistics via orderBy+limit(48) — a TakeOrdered, after
    which the rank window runs over a plan-provably bounded input."""
    d = _docs(spark, sf_dir).select("doc_id", "n_chars")
    b = BOOT_REPLICATES
    rep = d.select(
        "doc_id", "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("r"))
    v = F.conv(F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                       F.col("r").cast("string"))), 1, 6), 16, 10)
    cases = "CASE " + " ".join(
        f"WHEN v < {t} THEN {k}"
        for k, t in enumerate(BOOT_POISSON_THRESH)
    ) + f" ELSE {len(BOOT_POISSON_THRESH)} END"
    rep = (rep.withColumn("v", v.cast("long"))
           .withColumn("w", F.expr(cases).cast("long")))
    per = rep.groupBy("r").agg(
        F.sum(F.col("w") * F.col("n_chars")).alias("wx"),
        F.sum("w").alias("wn"))
    means = per.select(
        "r", F.round(F.col("wx").cast("double") / F.col("wn"), 6)
        .alias("m"))
    wrk = Window.orderBy(F.col("m").asc(), F.col("r").asc())
    ranked = (means.orderBy(F.col("m").asc(), F.col("r").asc()).limit(b)
              .withColumn("rk", F.row_number().over(wrk)))
    ci = ranked.agg(
        F.max(F.when(F.col("rk") == 2, F.col("m"))).alias("ci_lo"),
        F.max(F.when(F.col("rk") == b - 1, F.col("m"))).alias("ci_hi"))
    point = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6)
        .alias("point_mean"))
    return (point.crossJoin(F.broadcast(ci))
            .select("n_docs",
                    F.lit(b).cast("int").alias("b_replicates"),
                    "point_mean", "ci_lo", "ci_hi"))


def _sql_stats_bootstrap_ci() -> str:
    b = BOOT_REPLICATES
    cases = "CASE " + " ".join(
        f"WHEN v < {t} THEN {k}"
        for k, t in enumerate(BOOT_POISSON_THRESH)
    ) + f" ELSE {len(BOOT_POISSON_THRESH)} END"
    return f"""
WITH rep AS (
  SELECT d.n_chars,
         r.rv AS r,
         CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':'
                                  || CAST(r.rv AS VARCHAR)), 1, 6))
              AS BIGINT) AS v
  FROM documents d CROSS JOIN range({b}) r(rv)),
wrep AS (SELECT r, n_chars, CAST({cases} AS BIGINT) AS w FROM rep),
per AS (SELECT r, sum(w * n_chars) AS wx, sum(w) AS wn
        FROM wrep GROUP BY r),
means AS (SELECT r, round(CAST(wx AS DOUBLE) / wn, 6) AS m FROM per),
ranked AS (SELECT m, row_number() OVER (ORDER BY m ASC, r ASC) AS rk
           FROM means),
pt AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
              round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6)
              AS point_mean
       FROM documents)
SELECT pt.n_docs, CAST({b} AS INT) AS b_replicates, pt.point_mean,
       (SELECT m FROM ranked WHERE rk = 2) AS ci_lo,
       (SELECT m FROM ranked WHERE rk = {b - 1}) AS ci_hi
FROM pt
"""


SWEEP_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9)


def q_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold calibration sweep [K: the curve every team plots
    before committing to a near-dup cutoff — too low deletes real
    content, too high ships duplicates]: score the Jaccard candidate
    pairs ONCE (threshold 0 = keep every verified candidate), then for
    each grid threshold report surviving pair count and the number of
    distinct documents touched by >=1 surviving pair (the upper bound
    on removals a downstream canonical-survivor pass could make).

    Shape: the one posting-list candidate join + exact verify from
    dedup_jaccard (df-capped hot-token hygiene included), then a
    constant 5-wide threshold explode over the SCORED PAIRS (not the
    corpus) and two tiny hash aggs keyed by threshold. The expensive
    pair scoring is shared across all grid points — the whole point of
    sweeping offline instead of re-running dedup per threshold."""
    from ..operators.dedup import jaccard_near_dup_pairs
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < JACCARD_MAX_DOC)
    pairs = jaccard_near_dup_pairs(d, 0.0, df_cap=JACCARD_DF_CAP)
    grid_col = F.explode(F.array(*[F.lit(float(t))
                                   for t in SWEEP_THRESHOLDS]))
    surv = (pairs.select("doc_a", "doc_b", "jaccard",
                         grid_col.alias("threshold"))
            .filter(F.col("jaccard") >= F.col("threshold")))
    per_pairs = surv.groupBy("threshold").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"))
    docs_in = (surv.select(
        "threshold", F.explode(F.array("doc_a", "doc_b")).alias("doc_id"))
        .groupBy("threshold")
        .agg(F.countDistinct("doc_id").cast("long")
             .alias("n_docs_in_pairs")))
    base = spark.createDataFrame([(float(t),) for t in SWEEP_THRESHOLDS],
                                 "threshold double")
    return (base.join(per_pairs, "threshold", "left")
            .join(docs_in, "threshold", "left")
            .select("threshold",
                    F.coalesce("n_pairs", F.lit(0)).cast("long")
                    .alias("n_pairs"),
                    F.coalesce("n_docs_in_pairs", F.lit(0)).cast("long")
                    .alias("n_docs_in_pairs")))


def _sql_dedup_threshold_sweep() -> str:
    grid = ", ".join(f"CAST({t} AS DOUBLE)" for t in SWEEP_THRESHOLDS)
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, t.tok
  FROM documents, unnest(string_split(text, ' ')) AS t(tok)
  WHERE t.tok <> '' AND doc_id < {JACCARD_MAX_DOC}),
sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
rare AS (
  SELECT tok FROM toks GROUP BY tok HAVING count(*) <= {JACCARD_DF_CAP}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM (SELECT t.* FROM toks t JOIN rare r ON r.tok = t.tok) a
  JOIN (SELECT t.* FROM toks t JOIN rare r ON r.tok = t.tok) b
    ON a.tok = b.tok AND a.doc_id < b.doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN toks a ON a.doc_id = c.doc_a
  JOIN toks b ON b.doc_id = c.doc_b AND b.tok = a.tok
  GROUP BY c.doc_a, c.doc_b),
scored AS (
  SELECT i.doc_a, i.doc_b,
         round(cast(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6)
           AS jaccard
  FROM inter i
  JOIN sizes sa ON i.doc_a = sa.doc_id
  JOIN sizes sb ON i.doc_b = sb.doc_id),
grid AS (SELECT unnest([{grid}]) AS threshold),
surv AS (
  SELECT g.threshold, s.doc_a, s.doc_b
  FROM grid g JOIN scored s ON s.jaccard >= g.threshold),
pp AS (SELECT threshold, count(*) AS n_pairs FROM surv GROUP BY 1),
di AS (
  SELECT threshold, count(DISTINCT doc_id) AS n_docs_in_pairs
  FROM (SELECT threshold, doc_a AS doc_id FROM surv
        UNION ALL SELECT threshold, doc_b FROM surv)
  GROUP BY 1)
SELECT g.threshold,
       CAST(coalesce(pp.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(coalesce(di.n_docs_in_pairs, 0) AS BIGINT) AS n_docs_in_pairs
FROM grid g
LEFT JOIN pp ON pp.threshold = g.threshold
LEFT JOIN di ON di.threshold = g.threshold
"""


def q_kg_degree_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hub-anomaly QA over the constructed KG [K: bot/spam sweep — a
    subject whose per-predicate out-degree is a robust outlier is a
    runaway conversation or a scraper, and KG QA flags it before the
    graph ships]: per predicate, compute the median and MAD of subject
    out-degree in exact doubled/quadrupled integer units (the
    rel_outliers idiom — interpolated medians of even bigints stay
    integral) and emit every subject beyond the 3-sigma-equivalent
    |deg - med| > 3*1.4826*MAD fence, cross-multiplied so no division
    ever leaves integers. Degenerate MAD=0 (over half the subjects
    share the median degree) falls back to flagging any deviation —
    the standard MAD behavior, documented rather than patched.

    Shape: one (pred, subj) hash agg over the deduped triple set, two
    pred-keyed percentile aggs broadcast back (|preds| rows), one
    map-side filter. No windows, no self-joins; at 100 TB swap
    percentile for approx_percentile and keep the shape."""
    tr = q_kg_triples(spark, sf_dir)
    deg = (tr.groupBy("pred", "subj")
           .agg(F.count(F.lit(1)).alias("deg")))
    v = deg.withColumn("v2", (F.col("deg") * 2).cast("long"))
    g1 = v.groupBy("pred").agg(
        F.expr("CAST(percentile(v2, 0.5) AS BIGINT)").alias("med2"),
        F.count(F.lit(1)).cast("long").alias("n_subj"))
    dv = (v.join(F.broadcast(g1), "pred")
          .withColumn("dev2", F.abs(F.col("v2") - F.col("med2"))))
    g2 = dv.groupBy("pred").agg(
        F.expr("CAST(percentile(2 * dev2, 0.5) AS BIGINT)").alias("mad4"))
    return (dv.join(F.broadcast(g2), "pred")
            .filter(F.expr("dev2 * 10000 > 22239 * mad4"))
            .select("pred", "subj", F.col("deg").cast("long").alias("deg"),
                    F.col("med2").cast("long").alias("med_deg2"),
                    F.col("mad4").cast("long").alias("mad4"),
                    "n_subj"))


def _sql_kg_degree_anomaly() -> str:
    return f"""
WITH triples AS MATERIALIZED ({_sql_kg_triples_body()}),
deg AS (
  SELECT pred, subj, count(*) AS deg FROM triples GROUP BY 1, 2),
v AS (SELECT pred, subj, deg, CAST(deg * 2 AS BIGINT) AS v2 FROM deg),
g1 AS (
  SELECT pred, CAST(quantile_cont(v2, 0.5) AS BIGINT) AS med2,
         CAST(count(*) AS BIGINT) AS n_subj
  FROM v GROUP BY 1),
dv AS (
  SELECT v.pred, v.subj, v.deg, abs(v2 - med2) AS dev2, med2, n_subj
  FROM v JOIN g1 USING (pred)),
g2 AS (
  SELECT pred, CAST(quantile_cont(2 * dev2, 0.5) AS BIGINT) AS mad4
  FROM dv GROUP BY 1)
SELECT dv.pred, dv.subj, CAST(dv.deg AS BIGINT) AS deg,
       CAST(dv.med2 AS BIGINT) AS med_deg2,
       CAST(g2.mad4 AS BIGINT) AS mad4, dv.n_subj
FROM dv JOIN g2 USING (pred)
WHERE dev2 * 10000 > 22239 * mad4
"""


def q_kg_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table for the Wu-Palmer metric [K: the calibration
    diagram every ML eval ships — here: does a higher WuP score
    actually mean two concepts sit in the same taxonomy branch?]: bin
    every concept pair of the P8 all-pairs matrix by WuP in 0.2-wide
    bins and report, per bin, how many pairs share a depth-2 branch,
    the same-branch rate, and the mean in-bin WuP — all in exact ppm
    integers so the table replays bit-identically on any engine. A
    well-calibrated metric shows the rate rising with the bin; pairs
    involving the root (outside the branch map) are excluded by the
    inner joins, which is the honest denominator.

    Shape: the wup matrix (ontology-sized) joined twice against the
    broadcast (concept -> branch) map, one <=5-row hash agg on the
    bin. Everything after P8 is broadcast-sized."""
    wup = q_kg_wup_matrix(spark, sf_dir)
    bmap = spark.createDataFrame(_branch_map_pdf())
    ba = bmap.select(F.col("concept_id").alias("concept_a"),
                     F.col("branch").alias("branch_a"))
    bb = bmap.select(F.col("concept_id").alias("concept_b"),
                     F.col("branch").alias("branch_b"))
    j = (wup.join(F.broadcast(ba), "concept_a")
         .join(F.broadcast(bb), "concept_b"))
    binned = j.select(
        F.least(F.lit(4), F.floor(F.col("wup") * 5).cast("int"))
        .alias("bin"),
        F.floor(F.col("wup") * 1000000).cast("long").alias("wup_ppm"),
        (F.col("branch_a") == F.col("branch_b")).cast("int").alias("same"))
    return (binned.groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                 F.sum("same").cast("long").alias("n_same_branch"),
                 F.expr("sum(same) * 1000000 DIV count(1)").cast("long")
                 .alias("same_rate_ppm"),
                 F.expr("sum(wup_ppm) DIV count(1)").cast("long")
                 .alias("mean_wup_ppm")))


def _sql_kg_calibration() -> str:
    bv = values_sql(_branch_map_pdf(), "m")
    return f"""
WITH wup AS ({_sql_kg_wup_matrix()}),
bmap AS (SELECT concept_id, branch FROM {bv}),
j AS (
  SELECT least(4, CAST(floor(w.wup * 5) AS INT)) AS bin,
         CAST(floor(w.wup * 1000000) AS BIGINT) AS wup_ppm,
         CASE WHEN a.branch = b.branch THEN 1 ELSE 0 END AS same
  FROM wup w
  JOIN bmap a ON a.concept_id = w.concept_a
  JOIN bmap b ON b.concept_id = w.concept_b)
SELECT bin, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(same) AS BIGINT) AS n_same_branch,
       CAST(sum(same) * 1000000 // count(*) AS BIGINT) AS same_rate_ppm,
       CAST(sum(wup_ppm) // count(*) AS BIGINT) AS mean_wup_ppm
FROM j GROUP BY bin
"""


DRIFT_SCALE = 1000  # fixed-point quantization for centroid sums: small
# enough that per-(label, half) component sums and their squared dots
# stay far inside BIGINT at the test scales (re-scale when a single
# stratum exceeds ~10^8 rows), large enough that a drift metric loses
# nothing that matters.


def q_sim_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor [K: the snapshot-vs-snapshot
    centroid check a feature-store QA job runs — if a class centroid
    rotates, the upstream encoder or the data mix changed]: split each
    label's vectors into two deterministic halves (vec_id parity),
    quantize components to DRIFT_SCALE fixed-point integers, and report
    the cosine between the two half-centroids per label. Cosine is
    scale-invariant, so the component SUMS stand in for the centroids
    and no division ever happens before the final double cosine of
    exact integers — bit-identical on any engine, any row order.

    Shape: one posexplode scan -> one (label, half, pos) hash agg
    (64*2*|labels| rows) -> one pos-keyed self-join of that tiny table
    -> one |labels|-row agg. The explode is the standard columnar
    unpivot for component-wise math; everything after the first agg is
    broadcast-sized."""
    e = _tbl(spark, sf_dir, "embeddings")
    q = (e.select("vec_id", "label",
                  F.posexplode(F.col("embedding")).alias("pos", "x"))
         .select("label", (F.col("vec_id") % 2).cast("int").alias("half"),
                 "pos",
                 F.floor(F.col("x").cast("double") * DRIFT_SCALE)
                 .cast("long").alias("qv")))
    s = q.groupBy("label", "half", "pos").agg(
        F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n"))
    a = (s.filter(F.col("half") == 0)
         .select("label", "pos", F.col("s").alias("sa"),
                 F.col("n").alias("na_rows")))
    b = (s.filter(F.col("half") == 1)
         .select("label", "pos", F.col("s").alias("sb"),
                 F.col("n").alias("nb_rows")))
    j = a.join(b, ["label", "pos"])
    agg = j.groupBy("label").agg(
        F.sum(F.col("sa") * F.col("sb")).alias("dot"),
        F.sum(F.col("sa") * F.col("sa")).alias("na"),
        F.sum(F.col("sb") * F.col("sb")).alias("nb"),
        F.max("na_rows").cast("long").alias("n_a"),
        F.max("nb_rows").cast("long").alias("n_b"))
    return agg.select(
        F.col("label").cast("int").alias("label"), "n_a", "n_b",
        F.round(F.col("dot").cast("double")
                / (F.sqrt(F.col("na").cast("double"))
                   * F.sqrt(F.col("nb").cast("double"))), 6)
        .alias("drift_cos"))


def _sql_sim_centroid_drift() -> str:
    return f"""
WITH q AS (
  SELECT label, CAST(vec_id % 2 AS INT) AS half,
         generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {DRIFT_SCALE})
              AS BIGINT) AS qv
  FROM embeddings),
s AS (
  SELECT label, half, pos, sum(qv) AS s, count(*) AS n
  FROM q GROUP BY 1, 2, 3),
j AS (
  SELECT a.label, a.s AS sa, b.s AS sb, a.n AS na_rows, b.n AS nb_rows
  FROM (SELECT * FROM s WHERE half = 0) a
  JOIN (SELECT * FROM s WHERE half = 1) b
    ON a.label = b.label AND a.pos = b.pos)
SELECT CAST(label AS INT) AS label,
       CAST(max(na_rows) AS BIGINT) AS n_a,
       CAST(max(nb_rows) AS BIGINT) AS n_b,
       round(CAST(sum(sa * sb) AS DOUBLE)
             / (sqrt(CAST(sum(sa * sa) AS DOUBLE))
                * sqrt(CAST(sum(sb * sb) AS DOUBLE))), 6) AS drift_cos
FROM j GROUP BY label
"""


def q_kg_truss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge triangle support / k-truss pre-peel over the constructed
    KG (operators/graph.py:edge_triangle_support) [K: support(u,v) =
    common-neighbor count; k-truss membership needs support >= k-2].
    One row per canonical undirected edge with exact support and the
    k=3/k=4 flags — the dense-subgraph QA read and the first round of
    the truss peel.

    Shape: wedge-closure equi-joins + one hash agg; see the operator
    docstring for the 100-TB orientation/bucketing notes."""
    from ..operators.graph import edge_triangle_support
    return edge_triangle_support(q_kg_triples(spark, sf_dir))


def _sql_kg_truss() -> str:
    return f"""
WITH triples AS MATERIALIZED ({_sql_kg_triples_body()}),
e0 AS (SELECT DISTINCT subj AS src, obj AS dst FROM triples),
und AS (
  SELECT src, dst FROM e0 WHERE src <> dst
  UNION
  SELECT dst AS src, src AS dst FROM e0 WHERE src <> dst),
canon AS (SELECT src, dst FROM und WHERE src < dst),
sup AS (
  SELECT e.src, e.dst, count(*) AS support
  FROM canon e
  JOIN und a ON a.src = e.src
  JOIN und b ON b.src = e.dst AND b.dst = a.dst
  GROUP BY 1, 2)
SELECT c.src, c.dst,
       CAST(coalesce(s.support, 0) AS BIGINT) AS support,
       CAST(CASE WHEN coalesce(s.support, 0) >= 1 THEN 1 ELSE 0 END
            AS INT) AS in_truss3,
       CAST(CASE WHEN coalesce(s.support, 0) >= 2 THEN 1 ELSE 0 END
            AS INT) AS in_truss4
FROM canon c LEFT JOIN sup s ON s.src = c.src AND s.dst = c.dst
"""


def q_rel_abtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted A/B experiment readout [K: Deng et al.'s
    controlled-experiment variance reduction — adjust the metric by a
    pre-experiment covariate, Y' = Y - theta*(X - mean(X)) with
    theta = cov(X,Y)/var(X), shrinking the variance by the squared
    X-Y correlation at zero bias]: unit = customer (units with no
    orders are unexposed and excluded, documented), variant = md5
    parity of the customer key (the deterministic hash assignment a
    real experiment platform uses), metric Y = the customer's total
    order value in floored dollars, covariate X = the pre-experiment
    account balance in floored dollars. All SUMS (n, Sx, Sy, Sxx,
    Sxy, Syy) are exact BIGINTs; theta and the adjusted means are
    computed from those sums through an IDENTICAL double expression
    tree on both engines, so the rounded outputs replay bit-identically
    (the drift_cos convention). Per variant: unit count, raw mean,
    CUPED-adjusted mean, the pooled theta, and the pooled variance
    reduction rho^2 — the fraction of metric variance the covariate
    removes.

    Shape: one orders hash agg (map-side partial) + one broadcast-able
    customer join -> one global 1-row agg crossJoined back + one
    2-row variant agg. No windows, no driver state; the 1-row global
    is the only barrier and it is O(1)."""
    c = _tbl(spark, sf_dir, "customer")
    o = _tbl(spark, sf_dir, "orders")
    bucket = F.conv(F.substring(F.md5(F.col("c_custkey").cast("string")),
                                1, 2), 16, 10).cast("long")
    units = (o.groupBy("o_custkey")
             .agg(F.sum(F.floor("o_totalprice")).cast("long").alias("y"))
             .join(c.select(
                 "c_custkey",
                 F.floor("c_acctbal").cast("long").alias("x"),
                 (bucket % 2).cast("int").alias("variant")),
                 F.col("o_custkey") == F.col("c_custkey")))
    gl = units.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"))
    pv = units.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("x").cast("long").alias("sx_v"),
        F.sum("y").cast("long").alias("sy_v"))
    d = F.col  # noqa: E741 - local alias for the double expression tree
    num = (d("n").cast("double") * d("sxy").cast("double")
           - d("sx").cast("double") * d("sy").cast("double"))
    den = (d("n").cast("double") * d("sxx").cast("double")
           - d("sx").cast("double") * d("sx").cast("double"))
    vy = (d("n").cast("double") * d("syy").cast("double")
          - d("sy").cast("double") * d("sy").cast("double"))
    theta = num / den
    j = pv.crossJoin(F.broadcast(gl))
    return (j.select(
        "variant", "n_units",
        F.round(d("sy_v").cast("double") / d("n_units").cast("double"), 6)
        .alias("mean_y"),
        F.round(d("sy_v").cast("double") / d("n_units").cast("double")
                - theta * (d("sx_v").cast("double")
                           / d("n_units").cast("double")
                           - d("sx").cast("double")
                           / d("n").cast("double")), 6)
        .alias("mean_y_adj"),
        F.round(theta, 6).alias("theta"),
        F.round(num * num / (den * vy), 6).alias("var_reduction")))


def _sql_rel_abtest() -> str:
    bucket = ("(strpos('0123456789abcdef',"
              " substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1)) - 1) * 16"
              " + strpos('0123456789abcdef',"
              " substr(md5(CAST(c_custkey AS VARCHAR)), 2, 1)) - 1")
    return f"""
WITH ou AS (
  SELECT o_custkey, CAST(sum(CAST(floor(o_totalprice) AS BIGINT))
                         AS BIGINT) AS y
  FROM orders GROUP BY 1),
units AS (
  SELECT CAST(floor(c_acctbal) AS BIGINT) AS x, ou.y,
         CAST(({bucket}) % 2 AS INT) AS variant
  FROM ou JOIN customer ON c_custkey = o_custkey),
gl AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM units),
pv AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n_units,
         CAST(sum(x) AS BIGINT) AS sx_v, CAST(sum(y) AS BIGINT) AS sy_v
  FROM units GROUP BY 1)
SELECT variant, n_units,
       round(CAST(sy_v AS DOUBLE) / CAST(n_units AS DOUBLE), 6) AS mean_y,
       round(CAST(sy_v AS DOUBLE) / CAST(n_units AS DOUBLE)
             - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
               * (CAST(sx_v AS DOUBLE) / CAST(n_units AS DOUBLE)
                  - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6)
         AS mean_y_adj,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS theta,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS var_reduction
FROM pv CROSS JOIN gl
"""


KNNG_K = 5
KNNG_N_PLANES = 3


def q_sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate k-NN graph over the embedding corpus
    (operators/simsearch.py:knn_graph) [K: LSH-bucketed kNN-graph
    construction — the edge artifact GNN training / semantic clustering
    consumes]. Paired: the 3 hyperplanes are deterministic constants,
    so DuckDB recomputes identical sign buckets and the identical
    (cos DESC, dst ASC) rank; the mutual flag replays as a reversed
    self-join of the top-k set."""
    from ..operators.simsearch import knn_graph
    return knn_graph(_tbl(spark, sf_dir, "embeddings"),
                     k=KNNG_K, n_planes=KNNG_N_PLANES)


def _sql_sim_knn_graph() -> str:
    from ..operators.simsearch import hyperplanes
    planes = hyperplanes(KNNG_N_PLANES, 64)

    def bucket(col: str) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product({col}, {_sql_vec_lit(p)}) >= 0"
            f" THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes))

    return f"""
WITH v AS (SELECT vec_id AS nid, cast(embedding AS DOUBLE[]) AS nv
           FROM embeddings),
b AS (SELECT nid, nv, {bucket('nv')} AS bucket FROM v),
pairs AS (
  SELECT a.nid AS src, c.nid AS dst,
         round(list_cosine_similarity(a.nv, c.nv), 6) AS cos
  FROM b a JOIN b c USING (bucket)
  WHERE a.nid <> c.nid),
topk AS (
  SELECT src, dst, cos, rk FROM (
    SELECT src, dst, cos,
           row_number() OVER (PARTITION BY src
                              ORDER BY cos DESC, dst ASC) AS rk
    FROM pairs) WHERE rk <= {KNNG_K})
SELECT t.src, t.dst, t.cos, t.rk,
       CAST(CASE WHEN r.src IS NULL THEN 0 ELSE 1 END AS INT) AS mutual
FROM topk t
LEFT JOIN (SELECT dst AS src, src AS dst FROM topk) r
  ON r.src = t.src AND r.dst = t.dst
"""


def q_text_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mass-concentration profile: binned Lorenz curve + Gini
    coefficient over per-document character mass [K: the concentration
    read a curation team does before sampling — if 1% of documents
    hold 50% of the corpus mass, uniform-by-document sampling and
    uniform-by-token sampling are very different datasets]. Bins are
    power-of-two mass buckets computed WITHOUT libm — bin =
    len(bin(mass+1)) - 1, exact integer bit-length on both engines —
    because floor(log2(x)) through two different libm builds is a
    cross-engine hash hazard. Per bin (ascending = Lorenz order):
    doc count, mass, exact cumulative counts and ppm shares, plus the
    trapezoid Gini of the binned curve with an EXACT BIGINT numerator
    (sum n_i*(2*cumM_i - m_i)) over an exact n*S denominator — one
    double division at the very end. Binned-not-exact is the honest
    scale contract: exact Gini needs a global value sort (one
    partition at 10^12 rows); the histogram approximation is what a
    scan-shaped pipeline ships, and the bin width is the documented
    error bound.

    Shape: one map-side bin projection -> one <=40-row hash agg ->
    triangular self-join of that tiny table for cumulatives -> two
    1-row aggs crossJoined back. Everything after the first agg is
    broadcast-sized."""
    d = _docs(spark, sf_dir)
    b = d.select(
        (F.length(F.bin(F.length(F.coalesce(F.col("text"), F.lit("")))
                        .cast("long") + 1)) - 1).cast("int").alias("bin"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long")
        .alias("mass"))
    g = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("mass").cast("long").alias("bin_mass"))
    cum = (g.alias("a").join(F.broadcast(g.alias("c")),
                             F.col("c.bin") <= F.col("a.bin"))
           .groupBy(F.col("a.bin").alias("bin"))
           .agg(F.max(F.col("a.n_docs")).cast("long").alias("n_docs"),
                F.max(F.col("a.bin_mass")).cast("long").alias("bin_mass"),
                F.sum(F.col("c.n_docs")).cast("long").alias("cum_docs"),
                F.sum(F.col("c.bin_mass")).cast("long").alias("cum_mass")))
    tot = g.agg(F.sum("n_docs").cast("long").alias("n"),
                F.sum("bin_mass").cast("long").alias("s"))
    gn = cum.agg(F.sum(F.col("n_docs")
                       * (2 * F.col("cum_mass") - F.col("bin_mass")))
                 .cast("long").alias("bsum"))
    return (cum.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(gn))
            .select("bin", "n_docs", "bin_mass", "cum_docs", "cum_mass",
                    F.expr("cum_docs * 1000000L DIV n").cast("long")
                    .alias("cum_pop_ppm"),
                    F.expr("cum_mass * 1000000L DIV s").cast("long")
                    .alias("cum_mass_ppm"),
                    F.round(F.lit(1.0) - F.col("bsum").cast("double")
                            / (F.col("n").cast("double")
                               * F.col("s").cast("double")), 6)
                    .alias("gini")))


def _sql_text_gini() -> str:
    return """
WITH m AS (
  SELECT length(coalesce(text, '')) AS mass,
         CAST(length(bin(CAST(length(coalesce(text, '')) AS BIGINT) + 1))
              - 1 AS INT) AS bin
  FROM documents),
g AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(mass) AS BIGINT) AS bin_mass
  FROM m GROUP BY 1),
cum AS (
  SELECT a.bin, max(a.n_docs) AS n_docs, max(a.bin_mass) AS bin_mass,
         CAST(sum(c.n_docs) AS BIGINT) AS cum_docs,
         CAST(sum(c.bin_mass) AS BIGINT) AS cum_mass
  FROM g a JOIN g c ON c.bin <= a.bin
  GROUP BY a.bin),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n,
               CAST(sum(bin_mass) AS BIGINT) AS s FROM g),
gn AS (SELECT CAST(sum(n_docs * (2 * cum_mass - bin_mass)) AS BIGINT)
         AS bsum FROM cum)
SELECT bin, n_docs, bin_mass, cum_docs, cum_mass,
       CAST(cum_docs * 1000000 // n AS BIGINT) AS cum_pop_ppm,
       CAST(cum_mass * 1000000 // s AS BIGINT) AS cum_mass_ppm,
       round(1.0 - CAST(bsum AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)), 6) AS gini
FROM cum CROSS JOIN tot CROSS JOIN gn
"""


def q_kg_pathsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PathSim metapath similarity over the heterogeneous KG [K: Sun
    et al., VLDB'11 — similarity of two same-typed nodes along a
    symmetric metapath; here concept-turn-concept: s(a,b) =
    2*|paths a~t~b| / (|a~t~a| + |b~t~b|), which for binary incidence
    is 2*co-mentions / (n_turns_a + n_turns_b). The normalization is
    what distinguishes it from raw co-occurrence: a hub concept that
    co-occurs with everything is discounted by its own path mass].
    Exact-ppm integers; only co-mentioning pairs (co > 0) are emitted
    — the equi-join on the shared turn IS the sparsity, never
    all-pairs.

    Shape: one distinct (turn, concept) projection, one turn-keyed
    self-join (a < b) + pair hash agg, one per-concept count agg
    joined back twice (broadcast — ontology-sized). At 100 TB the
    turn-keyed join salts hot turns (bounded: a turn mentions <=
    |ontology| concepts), and the per-concept side is always tiny."""
    tags = (_mentions_df(spark, sf_dir)
            .select("conv_id", "turn_idx", "concept_id").distinct())
    co = (tags.alias("a")
          .join(tags.alias("b"),
                (F.col("a.conv_id") == F.col("b.conv_id"))
                & (F.col("a.turn_idx") == F.col("b.turn_idx"))
                & (F.col("a.concept_id") < F.col("b.concept_id")))
          .groupBy(F.col("a.concept_id").alias("concept_a"),
                   F.col("b.concept_id").alias("concept_b"))
          .agg(F.count(F.lit(1)).cast("long").alias("co_turns")))
    n = tags.groupBy("concept_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"))
    na = n.select(F.col("concept_id").alias("concept_a"),
                  F.col("n_turns").alias("n_a"))
    nb = n.select(F.col("concept_id").alias("concept_b"),
                  F.col("n_turns").alias("n_b"))
    return (co.join(F.broadcast(na), "concept_a")
            .join(F.broadcast(nb), "concept_b")
            .select("concept_a", "concept_b", "co_turns", "n_a", "n_b",
                    F.expr("2 * co_turns * 1000000L DIV (n_a + n_b)")
                    .cast("long").alias("pathsim_ppm")))


def _sql_kg_pathsim() -> str:
    return f"""
WITH {_MENTIONS_CTE},
tags AS (SELECT DISTINCT conv_id, turn_idx, concept_id FROM mentions),
co AS (
  SELECT a.concept_id AS concept_a, b.concept_id AS concept_b,
         CAST(count(*) AS BIGINT) AS co_turns
  FROM tags a JOIN tags b
    ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
   AND a.concept_id < b.concept_id
  GROUP BY 1, 2),
n AS (SELECT concept_id, CAST(count(*) AS BIGINT) AS n_turns
      FROM tags GROUP BY 1)
SELECT co.concept_a, co.concept_b, co.co_turns,
       na.n_turns AS n_a, nb.n_turns AS n_b,
       CAST(2 * co.co_turns * 1000000 // (na.n_turns + nb.n_turns)
            AS BIGINT) AS pathsim_ppm
FROM co
JOIN n na ON na.concept_id = co.concept_a
JOIN n nb ON nb.concept_id = co.concept_b
"""


def q_stats_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test, each source vs the rest of the
    corpus [K: the two-sample location test that doesn't assume equal
    variances — the standard "is this source's doc-length distribution
    shifted?" QA read; Welch-Satterthwaite approximates the degrees of
    freedom]. Metric = per-document character mass. All per-source
    sums (n, S, SS) are exact BIGINTs; the rest-group sums are exact
    differences against the 1-row global; t and df are computed from
    those integers through an identical double expression tree on both
    engines (the drift_cos convention).

    Shape: one map-side projection -> one |sources|-row hash agg ->
    crossJoin against the 1-row global -> map arithmetic. No windows,
    no self-joins; the only barrier is the O(1) global row."""
    d = _docs(spark, sf_dir)
    m = d.select("source",
                 F.length(F.coalesce(F.col("text"), F.lit("")))
                 .cast("long").alias("mass"))
    g = m.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n1"),
        F.sum("mass").cast("long").alias("s1"),
        F.sum(F.col("mass") * F.col("mass")).cast("long").alias("ss1"))
    tot = g.agg(F.sum("n1").cast("long").alias("nt"),
                F.sum("s1").cast("long").alias("st"),
                F.sum("ss1").cast("long").alias("sst"))
    j = (g.crossJoin(F.broadcast(tot))
         .withColumn("n2", (F.col("nt") - F.col("n1")).cast("long"))
         .withColumn("s2", (F.col("st") - F.col("s1")).cast("long"))
         .withColumn("ss2", (F.col("sst") - F.col("ss1")).cast("long")))
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    v1 = ((n1d * F.col("ss1").cast("double")
           - F.col("s1").cast("double") * F.col("s1").cast("double"))
          / (n1d * (n1d - 1)))
    v2 = ((n2d * F.col("ss2").cast("double")
           - F.col("s2").cast("double") * F.col("s2").cast("double"))
          / (n2d * (n2d - 1)))
    se1, se2 = v1 / n1d, v2 / n2d
    t = ((F.col("s1").cast("double") / n1d
          - F.col("s2").cast("double") / n2d)
         / F.sqrt(se1 + se2))
    df = ((se1 + se2) * (se1 + se2)
          / (se1 * se1 / (n1d - 1) + se2 * se2 / (n2d - 1)))
    return j.select(
        "source", F.col("n1").alias("n_docs"),
        F.round(F.col("s1").cast("double") / n1d, 6).alias("mean_mass"),
        F.round(t, 6).alias("t_stat"),
        F.round(df, 6).alias("welch_df"))


def _sql_stats_welch() -> str:
    v1 = ("(CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)"
          " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))"
          " / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1))")
    v2 = ("(CAST(n2 AS DOUBLE) * CAST(ss2 AS DOUBLE)"
          " - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))"
          " / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1))")
    se1 = f"(({v1}) / CAST(n1 AS DOUBLE))"
    se2 = f"(({v2}) / CAST(n2 AS DOUBLE))"
    return f"""
WITH m AS (
  SELECT source, CAST(length(coalesce(text, '')) AS BIGINT) AS mass
  FROM documents),
g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n1,
         CAST(sum(mass) AS BIGINT) AS s1,
         CAST(sum(mass * mass) AS BIGINT) AS ss1
  FROM m GROUP BY 1),
tot AS (SELECT CAST(sum(n1) AS BIGINT) AS nt,
               CAST(sum(s1) AS BIGINT) AS st,
               CAST(sum(ss1) AS BIGINT) AS sst FROM g),
j AS (
  SELECT source, n1, s1, ss1,
         CAST(nt - n1 AS BIGINT) AS n2,
         CAST(st - s1 AS BIGINT) AS s2,
         CAST(sst - ss1 AS BIGINT) AS ss2
  FROM g CROSS JOIN tot)
SELECT source, n1 AS n_docs,
       round(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS mean_mass,
       round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
             / sqrt({se1} + {se2}), 6) AS t_stat,
       round(({se1} + {se2}) * ({se1} + {se2})
             / ({se1} * {se1} / (CAST(n1 AS DOUBLE) - 1)
                + {se2} * {se2} / (CAST(n2 AS DOUBLE) - 1)), 6)
         AS welch_df
FROM j
"""


ACF_MAX_LAG = 7


def q_stats_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily order-count series at
    lags 1..ACF_MAX_LAG [K: the ACF diagnostic behind seasonality /
    ingest-anomaly detection — a weekly pipeline rhythm shows as a
    lag-7 peak]. Uses the full-series mean and variance as the
    normalizer (the textbook biased-denominator ACF); missing calendar
    days simply contribute no pair, which is documented rather than
    gap-filled (rel_gapfill is the composition point). All pair sums
    (n_k, Sxy_k, Sa_k, Sb_k) and the global (n, S, SS) are exact
    BIGINTs; r_k is assembled in one identical double expression on
    both engines.

    Shape: one day hash agg (map-side partial over the orders scan),
    one constant 7-wide lag explode of that tiny daily table, one
    date-keyed equi-join of daily vs daily, one 7-row agg + the O(1)
    global crossJoined back. Nothing here grows with row count except
    the first agg."""
    o = _tbl(spark, sf_dir, "orders")
    daily = (o.select(F.to_date("o_orderdate").alias("day"))
             .groupBy("day")
             .agg(F.count(F.lit(1)).cast("long").alias("x")))
    tot = daily.agg(F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum("x").cast("long").alias("s"),
                    F.sum(F.col("x") * F.col("x")).cast("long")
                    .alias("ss"))
    lags = F.explode(F.array(*[F.lit(k)
                               for k in range(1, ACF_MAX_LAG + 1)]))
    a = daily.select("day", F.col("x").alias("xa"), lags.alias("lag")) \
        .withColumn("day_b", F.expr("date_add(day, lag)"))
    b = daily.select(F.col("day").alias("day_b"), F.col("x").alias("xb"))
    pairs = a.join(b, "day_b")
    g = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("xa") * F.col("xb")).cast("long").alias("sxy"),
        F.sum("xa").cast("long").alias("sa"),
        F.sum("xb").cast("long").alias("sb"))
    nd = F.col("n").cast("double")
    m = F.col("s").cast("double") / nd
    denom = F.col("ss").cast("double") - nd * m * m
    num = (F.col("sxy").cast("double")
           - m * (F.col("sa").cast("double") + F.col("sb").cast("double"))
           + F.col("n_pairs").cast("double") * m * m)
    return (g.crossJoin(F.broadcast(tot))
            .select(F.col("lag").cast("int").alias("lag"), "n_pairs",
                    F.round(num / denom, 6).alias("acf")))


def _sql_stats_autocorr() -> str:
    lag_rows = ", ".join(f"({k})" for k in range(1, ACF_MAX_LAG + 1))
    return f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s,
               CAST(sum(x * x) AS BIGINT) AS ss FROM daily),
lags(lag) AS (VALUES {lag_rows}),
pairs AS (
  SELECT l.lag, a.x AS xa, b.x AS xb
  FROM daily a CROSS JOIN lags l
  JOIN daily b ON b.day = a.day + l.lag),
g AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(xa * xb) AS BIGINT) AS sxy,
         CAST(sum(xa) AS BIGINT) AS sa,
         CAST(sum(xb) AS BIGINT) AS sb
  FROM pairs GROUP BY 1)
SELECT CAST(lag AS INT) AS lag, n_pairs,
       round((CAST(sxy AS DOUBLE)
              - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE))
              + CAST(n_pairs AS DOUBLE)
                * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
             / (CAST(ss AS DOUBLE)
                - CAST(n AS DOUBLE)
                  * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS acf
FROM g CROSS JOIN tot
"""


ANNEAL_EPOCHS = 4
ANNEAL_WEIGHT_SCALE = 1000


def q_curation_anneal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch mixture-annealing schedule over LANGUAGES [K: the
    two-phase data schedule multilingual pretraining runs use — start
    at a uniform language mix, anneal to the sqrt-smoothed target by
    the final epoch, so early training sees diversity and late
    training sees the deployment distribution]: for each (epoch 0..3,
    domain), weight_ppm interpolates uniform -> sqrt-smoothed target
    in EXACT integer arithmetic — uniform_ppm = 1e6 div D, target_ppm
    = w_d * 1e6 div W with w_d = floor(sqrt(c_d) * 1000) (sqrt is
    IEEE correctly-rounded, identical on every engine — the
    mixture_sample convention), and the interpolation is the
    NONNEGATIVE convex combination ((E-1-e)*uniform + e*target) div
    (E-1) — a signed delta*epoch form would hit the Spark-DIV
    (truncate) vs DuckDB-// (floor) divergence on negative deltas,
    and every term here stays >= 0 by construction. Per-epoch sums
    may differ from 1e6 by <= D ppm of floor slack — documented, the
    loader renormalizes.

    Shape: one |domains|-row hash agg, crossJoined against a constant
    4-row epoch spine and the O(1) totals row; pure map arithmetic
    after the agg."""
    d = _docs(spark, sf_dir)
    g = (d.groupBy("lang")
         .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
         .withColumn("w", F.floor(F.sqrt(F.col("n_docs").cast("double"))
                                  * ANNEAL_WEIGHT_SCALE).cast("long")))
    tot = g.agg(F.count(F.lit(1)).cast("long").alias("n_domains"),
                F.sum("w").cast("long").alias("w_total"))
    epochs = F.explode(F.array(*[F.lit(e)
                                 for e in range(ANNEAL_EPOCHS)]))
    j = (g.crossJoin(F.broadcast(tot))
         .select("lang", "n_docs", "w", "n_domains", "w_total",
                 epochs.alias("epoch")))
    return (j.select(
        F.col("epoch").cast("int").alias("epoch"), "lang", "n_docs",
        F.expr("1000000L DIV n_domains").cast("long")
        .alias("uniform_ppm"),
        F.expr("w * 1000000L DIV w_total").cast("long")
        .alias("target_ppm"),
        F.expr(f"(({ANNEAL_EPOCHS - 1} - epoch)"
               " * (1000000L DIV n_domains)"
               " + epoch * (w * 1000000L DIV w_total))"
               f" DIV {ANNEAL_EPOCHS - 1}").cast("long")
        .alias("weight_ppm")))


def _sql_curation_anneal() -> str:
    epoch_rows = ", ".join(f"({e})" for e in range(ANNEAL_EPOCHS))
    return f"""
WITH g AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(floor(sqrt(CAST(count(*) AS DOUBLE))
                    * {ANNEAL_WEIGHT_SCALE}) AS BIGINT) AS w
  FROM documents GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_domains,
               CAST(sum(w) AS BIGINT) AS w_total FROM g),
epochs(epoch) AS (VALUES {epoch_rows})
SELECT CAST(epoch AS INT) AS epoch, lang, n_docs,
       CAST(1000000 // n_domains AS BIGINT) AS uniform_ppm,
       CAST(w * 1000000 // w_total AS BIGINT) AS target_ppm,
       CAST((({ANNEAL_EPOCHS - 1} - epoch) * (1000000 // n_domains)
             + epoch * (w * 1000000 // w_total))
            // {ANNEAL_EPOCHS - 1} AS BIGINT) AS weight_ppm
FROM g CROSS JOIN tot CROSS JOIN epochs
"""


def q_sim_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic clustering of the embedding corpus [K: the SemDeDup /
    semantic-dedup family — build a mutual-kNN graph, take connected
    components, treat each component as one semantic group]: the
    mutual subset of the wave-41 kNN graph (high-precision edges —
    both endpoints chose each other) fed through the iterative
    min-label connected-components operator, with each vector's
    cluster id (= min reachable vec_id) and cluster size. Isolated
    vectors form singletons — the honest denominator for "how much
    would semantic dedup collapse".

    Shape: the kNN graph's bucketed self-join, a map-side mutual
    filter, then O(diameter) rounds of join + min-agg (mutual-kNN
    components are near-cliques, so the diameter is tiny), and one
    broadcast size join back. Oracle: DuckDB recursive-CTE transitive
    closure + min label (the dedup_components convention)."""
    from ..operators.dedup import connected_components
    g = q_sim_knn_graph(spark, sf_dir)
    pairs = (g.filter((F.col("mutual") == 1)
                      & (F.col("src") < F.col("dst")))
             .select(F.col("src").alias("doc_a"),
                     F.col("dst").alias("doc_b")))
    nodes = _tbl(spark, sf_dir, "embeddings").select("vec_id")
    comp = connected_components(pairs, nodes)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size"))
    return (comp.select(F.col("doc_id").alias("vec_id"),
                        F.col("component").cast("long").alias("cluster"))
            .join(F.broadcast(sizes.select(
                F.col("component").cast("long").alias("cluster"),
                "cluster_size")), "cluster")
            .select("vec_id", "cluster", "cluster_size"))


def _sql_sim_semantic_clusters() -> str:
    knn = _sql_sim_knn_graph().strip().rstrip(";")
    return f"""
WITH RECURSIVE knn AS MATERIALIZED ({knn}),
medges AS (
  SELECT src, dst FROM knn WHERE mutual = 1
  UNION
  SELECT dst AS src, src AS dst FROM knn WHERE mutual = 1),
nodes AS (SELECT vec_id FROM embeddings),
reach(a, b) AS (
  SELECT vec_id, vec_id FROM nodes
  UNION
  SELECT r.a, e.dst FROM reach r JOIN medges e ON e.src = r.b),
comp AS (SELECT a AS vec_id, min(b) AS cluster FROM reach GROUP BY a),
sizes AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size
          FROM comp GROUP BY 1)
SELECT c.vec_id, CAST(c.cluster AS BIGINT) AS cluster, s.cluster_size
FROM comp c JOIN sizes s USING (cluster)
"""


def q_stats_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily order-count series [K:
    the nonparametric randomness check — too FEW runs of above/below-
    median days means positive serial dependence (trend/regime), too
    MANY means oscillation; the companion read to the ACF]: days are
    signed by an above/below-GLOBAL-MEDIAN cut (exact doubled-integer
    MEAN cut — cross-multiplied exact integers x*n_days vs sum(x), so
    no division; the mean variant instead of the median one because a
    discrete low-count series can put over half its days AT the
    median, emptying one side (observed on the fixture); at-mean days
    are dropped — the standard treatment, documented), runs are
    counted WITHOUT a global
    sort as 1 + sign-changes over calendar-consecutive day pairs
    (missing-day gaps conservatively count as a boundary, documented),
    and the z-statistic against the exact run-count mean/variance
    formula is one identical double expression on both engines.

    Shape: one daily hash agg, one O(1) median agg, one map-side sign
    projection, one calendar-keyed self-join (day+1) + O(1) counts —
    no windows, no global sort, nothing single-partition."""
    o = _tbl(spark, sf_dir, "orders")
    daily = (o.select(F.to_date("o_orderdate").alias("day"))
             .groupBy("day")
             .agg(F.count(F.lit(1)).cast("long").alias("x")))
    tot0 = daily.agg(F.count(F.lit(1)).cast("long").alias("nd"),
                     F.sum("x").cast("long").alias("sx"))
    signed = (daily.crossJoin(F.broadcast(tot0))
              .filter(F.col("x") * F.col("nd") != F.col("sx"))
              .select("day",
                      (F.col("x") * F.col("nd") > F.col("sx"))
                      .cast("int").alias("sgn")))
    cnt = signed.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("sgn").cast("long").alias("n_plus"))
    b = signed.select(F.col("day").alias("day_b"),
                      F.col("sgn").alias("sgn_b"))
    adj = (signed.withColumn("day_b", F.expr("date_add(day, 1)"))
           .join(b, "day_b"))
    trans = adj.agg(
        F.count(F.lit(1)).cast("long").alias("n_adj"),
        F.sum((F.col("sgn") != F.col("sgn_b")).cast("long"))
        .cast("long").alias("n_changes"))
    j = cnt.crossJoin(trans)
    nd = F.col("n").cast("double")
    p = F.col("n_plus").cast("double")
    q = nd - p
    # runs = segments over the adjacency graph: N nodes minus the
    # same-sign consecutive links (gaps break runs by construction)
    runs = (F.col("n") - (F.col("n_adj") - F.col("n_changes"))) \
        .cast("double")
    mu = 2.0 * p * q / nd + 1.0
    var = (2.0 * p * q * (2.0 * p * q - nd)) / (nd * nd * (nd - 1.0))
    return j.select(
        "n", "n_plus", F.col("n_changes").alias("n_sign_changes"),
        runs.cast("long").alias("n_runs"),
        F.round(mu, 6).alias("expected_runs"),
        F.round((runs - mu) / F.sqrt(var), 6).alias("z"))


def _sql_stats_runs() -> str:
    return """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1),
tot0 AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                CAST(sum(x) AS BIGINT) AS sx FROM daily),
signed AS (
  SELECT day, CAST(CASE WHEN x * nd > sx THEN 1 ELSE 0 END AS INT)
           AS sgn
  FROM daily CROSS JOIN tot0
  WHERE x * nd <> sx),
cnt AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(sgn) AS BIGINT) AS n_plus FROM signed),
adj AS (
  SELECT a.sgn, b.sgn AS sgn_b
  FROM signed a JOIN signed b ON b.day = a.day + 1),
trans AS (
  SELECT CAST(count(*) AS BIGINT) AS n_adj,
         CAST(sum(CASE WHEN sgn <> sgn_b THEN 1 ELSE 0 END) AS BIGINT)
           AS n_changes
  FROM adj)
SELECT n, n_plus, n_changes AS n_sign_changes,
       CAST(n - (n_adj - n_changes) AS BIGINT) AS n_runs,
       round(2.0 * CAST(n_plus AS DOUBLE)
             * (CAST(n AS DOUBLE) - CAST(n_plus AS DOUBLE))
             / CAST(n AS DOUBLE) + 1.0, 6) AS expected_runs,
       round((CAST(n - (n_adj - n_changes) AS DOUBLE)
              - (2.0 * CAST(n_plus AS DOUBLE)
                 * (CAST(n AS DOUBLE) - CAST(n_plus AS DOUBLE))
                 / CAST(n AS DOUBLE) + 1.0))
             / sqrt((2.0 * CAST(n_plus AS DOUBLE)
                     * (CAST(n AS DOUBLE) - CAST(n_plus AS DOUBLE))
                     * (2.0 * CAST(n_plus AS DOUBLE)
                        * (CAST(n AS DOUBLE) - CAST(n_plus AS DOUBLE))
                        - CAST(n AS DOUBLE)))
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                       * (CAST(n AS DOUBLE) - 1.0))), 6) AS z
FROM cnt CROSS JOIN trans
"""


def q_rel_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve [K: the (cohort, age) -> cumulative
    revenue triangle behind every retention-economics dashboard;
    rel_retention's revenue twin]: cohort = calendar month of the
    customer's FIRST order (min-agg, no window), age = exact integer
    month index delta (year*12+month arithmetic, no date subtraction
    semantics to disagree on), revenue in floored dollars. Emits per
    (cohort, age): active customers, period revenue, exact cumulative
    revenue (triangular self-join over the tiny cohort-age agg — never
    over raw orders), and cumulative revenue per cohort customer in
    exact ppm-free integer division (whole dollars).

    Shape: one orders hash agg for first-order months (map-side
    partial), one broadcast-able join back, one (cohort, age) hash
    agg, then the triangular join + final agg over the agg's ~(months
    x ages) rows. At 100 TB only the first two steps touch data; the
    triangle is always tiny."""
    o = _tbl(spark, sf_dir, "orders")
    om = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long").alias("m"),
        F.floor("o_totalprice").cast("long").alias("rev"))
    first = om.groupBy("o_custkey").agg(F.min("m").alias("cohort_m"))
    j = om.join(first, "o_custkey")
    g = (j.groupBy(F.col("cohort_m"),
                   (F.col("m") - F.col("cohort_m")).alias("age_months"))
         .agg(F.count_distinct("o_custkey").cast("long")
              .alias("n_active"),
              F.sum("rev").cast("long").alias("revenue")))
    cohort_n = (first.groupBy("cohort_m")
                .agg(F.count(F.lit(1)).cast("long").alias("n_cohort")))
    cum = (g.alias("a")
           .join(F.broadcast(g.alias("c")),
                 (F.col("c.cohort_m") == F.col("a.cohort_m"))
                 & (F.col("c.age_months") <= F.col("a.age_months")))
           .groupBy(F.col("a.cohort_m").alias("cohort_m"),
                    F.col("a.age_months").alias("age_months"))
           .agg(F.max(F.col("a.n_active")).cast("long").alias("n_active"),
                F.max(F.col("a.revenue")).cast("long").alias("revenue"),
                F.sum(F.col("c.revenue")).cast("long")
                .alias("cum_revenue")))
    return (cum.join(F.broadcast(cohort_n), "cohort_m")
            .select(F.col("cohort_m").cast("long").alias("cohort_month"),
                    F.col("age_months").cast("long").alias("age_months"),
                    "n_active", "revenue", "cum_revenue", "n_cohort",
                    F.expr("cum_revenue DIV n_cohort").cast("long")
                    .alias("cum_rev_per_customer")))


def _sql_rel_ltv() -> str:
    return """
WITH om AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
              AS BIGINT) AS m,
         CAST(floor(o_totalprice) AS BIGINT) AS rev
  FROM orders),
first AS (SELECT o_custkey, min(m) AS cohort_m FROM om GROUP BY 1),
g AS (
  SELECT f.cohort_m, om.m - f.cohort_m AS age_months,
         CAST(count(DISTINCT om.o_custkey) AS BIGINT) AS n_active,
         CAST(sum(om.rev) AS BIGINT) AS revenue
  FROM om JOIN first f ON f.o_custkey = om.o_custkey
  GROUP BY 1, 2),
cohort_n AS (SELECT cohort_m, CAST(count(*) AS BIGINT) AS n_cohort
             FROM first GROUP BY 1),
cum AS (
  SELECT a.cohort_m, a.age_months,
         max(a.n_active) AS n_active, max(a.revenue) AS revenue,
         CAST(sum(c.revenue) AS BIGINT) AS cum_revenue
  FROM g a JOIN g c
    ON c.cohort_m = a.cohort_m AND c.age_months <= a.age_months
  GROUP BY 1, 2)
SELECT CAST(cum.cohort_m AS BIGINT) AS cohort_month,
       CAST(cum.age_months AS BIGINT) AS age_months,
       cum.n_active, cum.revenue, cum.cum_revenue, cn.n_cohort,
       CAST(cum.cum_revenue // cn.n_cohort AS BIGINT)
         AS cum_rev_per_customer
FROM cum JOIN cohort_n cn ON cn.cohort_m = cum.cohort_m
"""


def q_stats_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality decomposition of the daily order-count
    series [K: the additive-profile read that pairs with the ACF —
    how much of the series' variance is explained by the weekly
    profile alone, i.e. the R^2 of the 7-level dow-mean model]: per
    dow (1=Mon..7=Sun, ISO — computed portably from the epoch-day
    number, NOT from engine-specific dayofweek() conventions): day
    count, order sum, mean, and the corpus-constant variance_explained
    = 1 - SSE/SST where SSE = SS_total - sum_d(S_d^2/n_d). All sums
    exact BIGINTs; the one cross-row rational sum (fit_ss) is
    quantized per-dow to micro-unit integers BEFORE summing so no
    engine-dependent double-addition order exists, and the final
    ratio is one identical double expression on both engines.

    Shape: one daily hash agg -> one 7-row dow agg -> two O(1)
    crossJoins. The dow-mean model needs no window and no sort."""
    o = _tbl(spark, sf_dir, "orders")
    daily = (o.select(F.to_date("o_orderdate").alias("day"))
             .groupBy("day")
             .agg(F.count(F.lit(1)).cast("long").alias("x")))
    # epoch day 0 = 1970-01-01 = a Thursday = ISO dow 4
    dowed = daily.select(
        ((F.datediff(F.col("day"), F.lit("1970-01-01")) + 3) % 7 + 1)
        .cast("int").alias("dow"), "x")
    g = dowed.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("ss"))
    tot = g.agg(F.sum("n_days").cast("long").alias("n"),
                F.sum("s").cast("long").alias("st"),
                F.sum("ss").cast("long").alias("sst"))
    # fit_ss = sum_d S_d^2/n_d is a cross-row sum of RATIONALS — as
    # doubles its engine-dependent summation order could flip round(),
    # so each term is quantized to an exact micro-unit integer first
    # (S_d^2*1e6 DIV n_d) and the BIGINT sum is order-invariant.
    fit = g.agg(F.sum(F.expr("s * s * 1000000L DIV n_days"))
                .cast("long").alias("fit_ss_u"))
    sse_u = F.col("sst") * F.lit(1000000) - F.col("fit_ss_u")
    sst_u = (F.col("sst") * F.lit(1000000)
             - F.expr("st * st * 1000000L DIV n"))
    return (g.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(fit))
            .select("dow", "n_days", F.col("s").alias("n_orders"),
                    F.round(F.col("s").cast("double")
                            / F.col("n_days").cast("double"), 6)
                    .alias("mean_orders"),
                    F.round(F.lit(1.0)
                            - sse_u.cast("double") / sst_u.cast("double"),
                            6).alias("variance_explained")))


def _sql_stats_seasonality() -> str:
    return """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1),
dowed AS (
  SELECT CAST((datediff('day', DATE '1970-01-01', day) + 3) % 7 + 1
              AS INT) AS dow, x
  FROM daily),
g AS (
  SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(x) AS BIGINT) AS s,
         CAST(sum(x * x) AS BIGINT) AS ss
  FROM dowed GROUP BY 1),
tot AS (SELECT CAST(sum(n_days) AS BIGINT) AS n,
               CAST(sum(s) AS BIGINT) AS st,
               CAST(sum(ss) AS BIGINT) AS sst FROM g),
fit AS (SELECT CAST(sum(s * s * 1000000 // n_days) AS BIGINT)
                 AS fit_ss_u FROM g)
SELECT dow, n_days, s AS n_orders,
       round(CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
         AS mean_orders,
       round(1.0 - CAST(sst * 1000000 - fit_ss_u AS DOUBLE)
             / CAST(sst * 1000000 - st * st * 1000000 // n AS DOUBLE),
             6) AS variance_explained
FROM g CROSS JOIN tot CROSS JOIN fit
"""


def q_sim_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-distance embedding outlier detection
    (operators/simsearch.py:knn_outliers) over the corpus embeddings:
    per-node mean cosine to its wave-41 kNN-graph neighbors, robust
    MAD-fenced one-sided (far-from-neighbors only); isolated nodes
    (no in-bucket neighbor) are flagged with a NULL score. See the
    operator docstring for the determinism and scale notes."""
    from ..operators.simsearch import knn_outliers
    return knn_outliers(_tbl(spark, sf_dir, "embeddings"),
                        k=KNNG_K, n_planes=KNNG_N_PLANES)


def _sql_sim_outliers() -> str:
    knn = _sql_sim_knn_graph().strip().rstrip(";")
    return f"""
WITH knn AS MATERIALIZED ({knn}),
score AS (
  SELECT src, CAST(count(*) AS BIGINT) AS k_used,
         CAST(sum(CAST(round(cos * 1000000, 0) AS BIGINT))
              // count(*) AS BIGINT) AS mean_cos_ppm
  FROM knn GROUP BY 1),
s AS (
  SELECT e.vec_id AS src, score.k_used, score.mean_cos_ppm
  FROM embeddings e LEFT JOIN score ON score.src = e.vec_id),
have AS (SELECT * FROM s WHERE mean_cos_ppm IS NOT NULL),
m1 AS (SELECT CAST(quantile_cont(mean_cos_ppm * 2, 0.5) AS BIGINT)
         AS med2 FROM have),
dv AS (
  SELECT src, k_used, mean_cos_ppm,
         abs(mean_cos_ppm * 2 - med2) AS dev2, med2
  FROM have CROSS JOIN m1),
m2 AS (SELECT CAST(quantile_cont(2 * dev2, 0.5) AS BIGINT) AS mad4
       FROM dv)
SELECT src AS vec_id, k_used, mean_cos_ppm,
       CAST(CASE WHEN dev2 * 10000 > 22239 * mad4
                  AND mean_cos_ppm * 2 < med2
                 THEN 1 ELSE 0 END AS INT) AS is_outlier
FROM dv CROSS JOIN m2
UNION ALL
SELECT src AS vec_id, CAST(0 AS BIGINT) AS k_used,
       CAST(NULL AS BIGINT) AS mean_cos_ppm, CAST(1 AS INT) AS is_outlier
FROM s WHERE mean_cos_ppm IS NULL
"""


GUMBEL_EULER = 0.5772156649015329


def q_stats_evt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value capacity estimate for the daily order load [K:
    Gumbel block-maxima with method-of-moments fit — the capacity-
    planning read "what daily peak should the system be sized for":
    monthly maxima of the daily series, mu/beta from the maxima's
    mean and standard deviation (beta = sd*sqrt(6)/pi, mu = mean -
    Euler*beta), and the 99% / 99.9% return levels mu -
    beta*ln(-ln(p))]. Block maxima and their (n, S, SS) are exact
    BIGINTs; the fit and return levels are one identical double
    expression tree on both engines (sqrt is IEEE-exact; ln at these
    magnitudes is ulp-stable under round6 — the text_perplexity
    precedent).

    Shape: one daily hash agg -> one monthly max agg -> one O(1)
    moments agg. One summary row; nothing unbounded anywhere."""
    o = _tbl(spark, sf_dir, "orders")
    daily = (o.select(F.to_date("o_orderdate").alias("day"))
             .groupBy("day")
             .agg(F.count(F.lit(1)).cast("long").alias("x")))
    blocks = (daily.groupBy(
        (F.year("day") * 12 + F.month("day") - 1).cast("long")
        .alias("block_m"))
        .agg(F.max("x").cast("long").alias("mx")))
    mom = blocks.agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum("mx").cast("long").alias("s"),
        F.sum(F.col("mx") * F.col("mx")).cast("long").alias("ss"),
        F.max("mx").cast("long").alias("observed_max"))
    nd = F.col("n_blocks").cast("double")
    mean = F.col("s").cast("double") / nd
    var = ((nd * F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double"))
           / (nd * (nd - 1.0)))
    beta = F.sqrt(var) * _math.sqrt(6.0) / _math.pi
    mu = mean - GUMBEL_EULER * beta
    lvl99 = mu - beta * F.log(-F.log(F.lit(0.99)))
    lvl999 = mu - beta * F.log(-F.log(F.lit(0.999)))
    return mom.select(
        "n_blocks", "observed_max",
        F.round(mean, 6).alias("block_max_mean"),
        F.round(mu, 6).alias("gumbel_mu"),
        F.round(beta, 6).alias("gumbel_beta"),
        F.round(lvl99, 6).alias("return_level_99"),
        F.round(lvl999, 6).alias("return_level_999"))


def _sql_stats_evt() -> str:
    nd = "CAST(n_blocks AS DOUBLE)"
    mean = f"(CAST(s AS DOUBLE) / {nd})"
    var = (f"(({nd} * CAST(ss AS DOUBLE)"
           f" - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
           f" / ({nd} * ({nd} - 1.0)))")
    beta = f"(sqrt({var}) * sqrt(6.0) / pi())"
    mu = f"({mean} - {GUMBEL_EULER} * {beta})"
    return f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1),
blocks AS (
  SELECT CAST(year(day) * 12 + month(day) - 1 AS BIGINT) AS block_m,
         CAST(max(x) AS BIGINT) AS mx
  FROM daily GROUP BY 1),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n_blocks,
         CAST(sum(mx) AS BIGINT) AS s,
         CAST(sum(mx * mx) AS BIGINT) AS ss,
         CAST(max(mx) AS BIGINT) AS observed_max
  FROM blocks)
SELECT n_blocks, observed_max,
       round({mean}, 6) AS block_max_mean,
       round({mu}, 6) AS gumbel_mu,
       round({beta}, 6) AS gumbel_beta,
       round({mu} - {beta} * ln(-ln(0.99)), 6) AS return_level_99,
       round({mu} - {beta} * ln(-ln(0.999)), 6) AS return_level_999
FROM mom
"""


def q_rel_ri_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the warehouse FK surface
    [K: the orphan scan every DQ framework ships — an orphaned fact
    row silently vanishes from every inner-join report, so the audit
    quantifies the blast radius BEFORE analysts hit it]: for each
    declared child->parent relation, the child row count, orphan
    count (left-anti against the parent key), and orphan share in
    exact ppm. A 0-orphan table is the PASS record, not a skipped
    check.

    Shape: per relation one map-side child projection + one anti-join
    against the (usually broadcast-able) parent key set + one 1-row
    count agg; the union of the per-relation rows is constant-sized.
    At 100 TB each anti-join shuffles only the child keys (project
    first), and dimension parents broadcast."""
    o = _tbl(spark, sf_dir, "orders")
    li = _tbl(spark, sf_dir, "lineitem")
    c = _tbl(spark, sf_dir, "customer")
    su = _tbl(spark, sf_dir, "supplier")
    pa = _tbl(spark, sf_dir, "part")
    na = _tbl(spark, sf_dir, "nation")

    def audit(name, child, ck, parent, pk):
        ch = child.select(F.col(ck).alias("k"))
        orphans = ch.join(F.broadcast(parent.select(
            F.col(pk).alias("k")).distinct()), "k", "left_anti")
        return (ch.agg(F.count(F.lit(1)).cast("long").alias("n_child"))
                .crossJoin(orphans.agg(F.count(F.lit(1)).cast("long")
                                       .alias("n_orphans")))
                .select(F.lit(name).alias("relation"), "n_child",
                        "n_orphans",
                        F.expr("n_orphans * 1000000L DIV n_child")
                        .cast("long").alias("orphan_ppm")))

    parts = [
        audit("orders->customer", o, "o_custkey", c, "c_custkey"),
        audit("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
        audit("lineitem->part", li, "l_partkey", pa, "p_partkey"),
        audit("lineitem->supplier", li, "l_suppkey", su, "s_suppkey"),
        audit("customer->nation", c, "c_nationkey", na, "n_nationkey"),
        audit("supplier->nation", su, "s_nationkey", na, "n_nationkey"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _sql_rel_ri_audit() -> str:
    def block(name, child, ck, parent, pk):
        return f"""
SELECT '{name}' AS relation,
       CAST((SELECT count(*) FROM {child}) AS BIGINT) AS n_child,
       CAST((SELECT count(*) FROM {child}
             WHERE {ck} NOT IN (SELECT {pk} FROM {parent})) AS BIGINT)
         AS n_orphans,
       CAST((SELECT count(*) FROM {child}
             WHERE {ck} NOT IN (SELECT {pk} FROM {parent}))
            * 1000000 // (SELECT count(*) FROM {child}) AS BIGINT)
         AS orphan_ppm"""
    blocks = [
        block("orders->customer", "orders", "o_custkey",
              "customer", "c_custkey"),
        block("lineitem->orders", "lineitem", "l_orderkey",
              "orders", "o_orderkey"),
        block("lineitem->part", "lineitem", "l_partkey",
              "part", "p_partkey"),
        block("lineitem->supplier", "lineitem", "l_suppkey",
              "supplier", "s_suppkey"),
        block("customer->nation", "customer", "c_nationkey",
              "nation", "n_nationkey"),
        block("supplier->nation", "supplier", "s_nationkey",
              "nation", "n_nationkey"),
    ]
    return "\nUNION ALL\n".join(blocks)


def q_kg_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank agreement between PageRank and raw degree over the KG's
    concept layer [K: the Kendall-tau sanity read behind "can we use
    the cheap degree proxy instead of iterating PageRank" — high tau
    means degree-based pruning is safe, low tau means the link
    structure carries information degree misses]: exact integer
    Kendall counts (concordant / discordant / ties) over all concept
    pairs, tau-a as one double division at the end. Restricted to the
    ontology-sized concept layer ON PURPOSE: all-pairs over every KG
    node is a banned BNL shape at scale, while |ontology|^2 is a
    constant; the rank_ppm and degree inputs are both exact BIGINTs
    so every comparison is engine-invariant.

    Shape: the pagerank fixed point + one degree hash agg, both
    filtered to 'dq:' concept nodes (tiny), one broadcast inequality
    self-join over that tiny table, one O(1) count agg."""
    pr = q_kg_pagerank(spark, sf_dir) \
        .filter(F.col("node").startswith("dq:"))
    tr = q_kg_triples(spark, sf_dir)
    deg = (tr.select(F.col("subj").alias("node"))
           .unionByName(tr.select(F.col("obj").alias("node")))
           .filter(F.col("node").startswith("dq:"))
           .groupBy("node")
           .agg(F.count(F.lit(1)).cast("long").alias("degree")))
    t = pr.join(deg, "node", "left") \
        .select("node", "rank_ppm",
                F.coalesce("degree", F.lit(0)).cast("long")
                .alias("degree"))
    pairs = (t.alias("a")
             .join(F.broadcast(t.alias("b")),
                   F.col("a.node") < F.col("b.node"))
             .select(
                 ((F.col("a.rank_ppm") > F.col("b.rank_ppm"))
                  & (F.col("a.degree") > F.col("b.degree"))
                  | (F.col("a.rank_ppm") < F.col("b.rank_ppm"))
                  & (F.col("a.degree") < F.col("b.degree")))
                 .cast("long").alias("conc"),
                 ((F.col("a.rank_ppm") > F.col("b.rank_ppm"))
                  & (F.col("a.degree") < F.col("b.degree"))
                  | (F.col("a.rank_ppm") < F.col("b.rank_ppm"))
                  & (F.col("a.degree") > F.col("b.degree")))
                 .cast("long").alias("disc")))
    n = t.agg(F.count(F.lit(1)).cast("long").alias("n_concepts"))
    g = pairs.agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                  F.sum("conc").cast("long").alias("concordant"),
                  F.sum("disc").cast("long").alias("discordant"))
    return (g.crossJoin(F.broadcast(n))
            .select("n_concepts", "n_pairs", "concordant", "discordant",
                    (F.col("n_pairs") - F.col("concordant")
                     - F.col("discordant")).cast("long").alias("ties"),
                    F.round((F.col("concordant").cast("double")
                             - F.col("discordant").cast("double"))
                            / F.col("n_pairs").cast("double"), 6)
                    .alias("tau_a")))


def _sql_kg_rank_corr() -> str:
    pr = _sql_kg_pagerank().strip().rstrip(";")
    return f"""
WITH pr_all AS MATERIALIZED ({pr}),
pr AS (SELECT node, rank_ppm FROM pr_all WHERE node LIKE 'dq:%'),
triples AS MATERIALIZED ({_sql_kg_triples_body()}),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT subj AS node FROM triples
    UNION ALL SELECT obj AS node FROM triples)
  WHERE node LIKE 'dq:%' GROUP BY 1),
t AS (
  SELECT pr.node, pr.rank_ppm,
         CAST(coalesce(deg.degree, 0) AS BIGINT) AS degree
  FROM pr LEFT JOIN deg USING (node)),
pairs AS (
  SELECT CAST(CASE WHEN (a.rank_ppm > b.rank_ppm AND a.degree > b.degree)
                    OR (a.rank_ppm < b.rank_ppm AND a.degree < b.degree)
              THEN 1 ELSE 0 END AS BIGINT) AS conc,
         CAST(CASE WHEN (a.rank_ppm > b.rank_ppm AND a.degree < b.degree)
                    OR (a.rank_ppm < b.rank_ppm AND a.degree > b.degree)
              THEN 1 ELSE 0 END AS BIGINT) AS disc
  FROM t a JOIN t b ON a.node < b.node),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_concepts FROM t),
g AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(conc) AS BIGINT) AS concordant,
             CAST(sum(disc) AS BIGINT) AS discordant FROM pairs)
SELECT n_concepts, n_pairs, concordant, discordant,
       CAST(n_pairs - concordant - discordant AS BIGINT) AS ties,
       round((CAST(concordant AS DOUBLE) - CAST(discordant AS DOUBLE))
             / CAST(n_pairs AS DOUBLE), 6) AS tau_a
FROM g CROSS JOIN n
"""


ANN_SWEEP_PLANES = (2, 3, 4, 5)


def q_sim_ann_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH plane-count tuning sweep [K: the recall-vs-cost curve every
    ANN deployment plots before fixing its index parameters — more
    hyperplanes mean smaller buckets, fewer candidates, lower recall]:
    for each plane count in the grid, the candidate-pair count (the
    cost axis) and recall@k of the bucketed ANN against the exact
    brute-force top-k (the quality axis), as one row per grid point
    in exact ppm. The expensive exact truth is computed ONCE and
    shared across the grid (the dedup_threshold_sweep philosophy).

    Shape: per grid point one bucket pandas_udf pass + one bucket
    equi-join + the standard per-query rank; the grid is a compile-
    time constant so the union is a fixed-width plan. Nothing beyond
    the ann_lsh_topk machinery itself."""
    from ..operators.simsearch import ann_lsh_topk, hyperplanes, \
        lsh_bucket
    e = _tbl(spark, sf_dir, "embeddings")
    q = (e.filter(F.col("vec_id") < N_QUERY_VECS)
         .select(F.col("vec_id").alias("qid"),
                 F.col("embedding").alias("qv")))
    c = (e.filter(F.col("vec_id") >= N_QUERY_VECS)
         .select(F.col("vec_id").alias("cid"),
                 F.col("embedding").alias("cv")))
    bf = q_sim_topk_cosine(spark, sf_dir).select("qid", "cid")
    parts = []
    for np_ in ANN_SWEEP_PLANES:
        planes = hyperplanes(np_, 64)
        cand = (lsh_bucket(q, "qv", planes)
                .join(lsh_bucket(c, "cv", planes), "bucket"))
        n_cand = cand.agg(F.count(F.lit(1)).cast("long")
                          .alias("n_candidates"))
        topk = ann_lsh_topk(q, c, k=ANN_K, n_planes=np_) \
            .select(F.col("qid").alias("aqid"),
                    F.col("cid").alias("acid"))
        hits = (bf.join(topk, (F.col("qid") == F.col("aqid"))
                        & (F.col("cid") == F.col("acid")))
                .agg(F.count(F.lit(1)).cast("long").alias("total_hits")))
        parts.append(
            n_cand.crossJoin(hits).select(
                F.lit(np_).cast("int").alias("n_planes"),
                "n_candidates", "total_hits",
                F.expr(f"total_hits * 1000000L"
                       f" DIV {N_QUERY_VECS * ANN_K}").cast("long")
                .alias("recall_ppm")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _sql_sim_ann_sweep() -> str:
    from ..operators.simsearch import hyperplanes
    bf = SQL_SIM_TOPK.strip().rstrip(";")
    blocks = []
    for np_ in ANN_SWEEP_PLANES:
        planes = hyperplanes(np_, 64)

        def bucket(col):
            return " + ".join(
                f"(CASE WHEN list_dot_product({col}, {_sql_vec_lit(p)})"
                f" >= 0 THEN {1 << i} ELSE 0 END)"
                for i, p in enumerate(planes))

        blocks.append(f"""
SELECT {np_} AS n_planes,
  (SELECT CAST(count(*) AS BIGINT)
   FROM (SELECT qid, qv, {bucket('qv')} AS bucket FROM q) qb
   JOIN (SELECT cid, cv, {bucket('cv')} AS bucket FROM c) cb
     USING (bucket)) AS n_candidates,
  (SELECT CAST(count(*) AS BIGINT) FROM bf
   JOIN (
     SELECT qid, cid FROM (
       SELECT qb.qid, cb.cid,
              row_number() OVER (
                PARTITION BY qb.qid
                ORDER BY round(list_cosine_similarity(qb.qv, cb.cv), 6)
                  DESC, cb.cid ASC) AS rk
       FROM (SELECT qid, qv, {bucket('qv')} AS bucket FROM q) qb
       JOIN (SELECT cid, cv, {bucket('cv')} AS bucket FROM c) cb
         USING (bucket))
     WHERE rk <= {ANN_K}) ann
   ON ann.qid = bf.qid AND ann.cid = bf.cid) AS total_hits""")
    body = "\nUNION ALL\n".join(
        f"SELECT n_planes, n_candidates, total_hits,"
        f" CAST(total_hits * 1000000 // {N_QUERY_VECS * ANN_K}"
        f" AS BIGINT) AS recall_ppm FROM ({b})" for b in blocks)
    return f"""
WITH q AS (SELECT vec_id AS qid, cast(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < {N_QUERY_VECS}),
c AS (SELECT vec_id AS cid, cast(embedding AS DOUBLE[]) AS cv
      FROM embeddings WHERE vec_id >= {N_QUERY_VECS}),
bf AS MATERIALIZED (SELECT qid, cid FROM ({bf}))
{body}
"""


DIAM_MAX_HOPS = 12


def q_kg_diameter_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph diameter lower bound by double-BFS [K: the standard
    2-sweep heuristic — BFS from an arbitrary node, then BFS from the
    farthest node found; the second eccentricity is a (often tight)
    diameter lower bound]: seed = lexicographically smallest KG node
    (deterministic), both sweeps capped at DIAM_MAX_HOPS (the bound
    stays a valid LOWER bound under the cap, documented), farthest-
    node ties broken by smallest node id so both engines pick the
    identical endpoint. Reports the seed, its eccentricity, the
    peripheral node, and the second-sweep diameter bound. Reads the
    seed's component only — unreachable nodes can't contribute to a
    path through the seed anyway.

    Shape: two bounded level-synchronous BFS passes (the bfs_depths
    operator: per-hop equi-join + anti-join, localCheckpoint per
    level) and two O(1) argmax collects (TakeOrdered over the depth
    table) to choose the next seed — 1-row driver actions, the
    convergence-probe convention, not data movement."""
    from ..operators.graph import bfs_depths
    tr = q_kg_triples(spark, sf_dir)
    nodes = (tr.select(F.col("subj").alias("node"))
             .unionByName(tr.select(F.col("obj").alias("node"))))
    seed = nodes.agg(F.min("node").alias("node")).collect()[0].node
    b1 = bfs_depths(tr, spark.createDataFrame([(seed,)], "node string"),
                    max_hops=DIAM_MAX_HOPS)
    far = b1.orderBy(F.desc("depth"), F.asc("node")).limit(1) \
        .collect()[0]
    b2 = bfs_depths(tr,
                    spark.createDataFrame([(far.node,)], "node string"),
                    max_hops=DIAM_MAX_HOPS)
    end = b2.orderBy(F.desc("depth"), F.asc("node")).limit(1) \
        .collect()[0]
    return spark.createDataFrame(
        [(seed, int(far.depth), far.node, int(end.depth), end.node)],
        "seed string, ecc_seed bigint, peripheral string,"
        " diameter_lb bigint, endpoint string")


def _sql_kg_diameter_est() -> str:
    return f"""
WITH RECURSIVE triples AS MATERIALIZED ({_sql_kg_triples_body()}),
e AS MATERIALIZED (
  SELECT subj AS src, obj AS dst
  FROM (SELECT DISTINCT subj, obj FROM triples)
  UNION
  SELECT obj, subj FROM (SELECT DISTINCT subj, obj FROM triples)),
seed AS (SELECT min(node) AS node FROM (
  SELECT subj AS node FROM triples
  UNION ALL SELECT obj FROM triples)),
r1(node, depth) AS (
  SELECT node, 0 FROM seed
  UNION
  SELECT e.dst, r1.depth + 1 FROM r1 JOIN e ON e.src = r1.node
  WHERE r1.depth < {DIAM_MAX_HOPS}),
d1 AS (SELECT node, CAST(min(depth) AS BIGINT) AS depth
       FROM r1 GROUP BY node),
far1 AS (SELECT node, depth FROM d1
         ORDER BY depth DESC, node ASC LIMIT 1),
r2(node, depth) AS (
  SELECT node, 0 FROM far1
  UNION
  SELECT e.dst, r2.depth + 1 FROM r2 JOIN e ON e.src = r2.node
  WHERE r2.depth < {DIAM_MAX_HOPS}),
d2 AS (SELECT node, CAST(min(depth) AS BIGINT) AS depth
       FROM r2 GROUP BY node),
far2 AS (SELECT node, depth FROM d2
         ORDER BY depth DESC, node ASC LIMIT 1)
SELECT (SELECT node FROM seed) AS seed,
       (SELECT depth FROM far1) AS ecc_seed,
       (SELECT node FROM far1) AS peripheral,
       (SELECT depth FROM far2) AS diameter_lb,
       (SELECT node FROM far2) AS endpoint
"""


HEAPS_GRID_PPM = (125000, 250000, 500000, 1000000)


def q_text_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps' law) series [K: V(N) ~ K*N^beta —
    the sublinear type-vs-token curve every tokenizer-budget and
    dedup-health review reads; a corpus whose vocabulary grows LINEARLY
    is full of junk tokens or unseen boilerplate]: corpus prefixes are
    deterministic doc_id cuts at fixed ppm fractions of the id space
    (stable under engine/partitioning, unlike "first N rows" which has
    no order), and each grid row reports docs, exact TOKEN-TRIGRAM
    mass and distinct-trigram type count (a type enters at its MIN
    doc_id — one vocabulary-sized agg, computed once and shared
    across the grid), plus the Heaps beta of the point against the
    smallest prefix, beta = ln(V/V0)/ln(N/N0), as one identical
    double expression. Trigrams, not unigrams, ON PURPOSE: the
    synthetic fixture has a closed word list (unigram V saturates at
    the first prefix, beta = 0 — verified), while its 3-gram space
    exhibits the genuine Heaps regime (~0.81) the operator exists to
    measure; on a real corpus both units work and the unit is one
    line to change.

    Shape: one token explode -> one vocabulary-sized min-agg + one
    per-doc count agg (both map-side-partial), then a constant 4-row
    grid broadcast-joined against those two tiny-keyed tables. The
    grid share is the dedup_threshold_sweep philosophy: the expensive
    pass happens once."""
    d = _docs(spark, sf_dir)
    maxid = d.agg((F.max("doc_id") + 1).cast("long").alias("mx"))
    grid = spark.createDataFrame([(g,) for g in HEAPS_GRID_PPM],
                                 "g_ppm long")
    thr = (grid.crossJoin(F.broadcast(maxid))
           .select("g_ppm", F.expr("mx * g_ppm DIV 1000000")
                   .cast("long").alias("thr")))
    arr = d.select(
        "doc_id",
        F.filter(F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))),
                 r"\s+"), lambda t: t != "").alias("t"))
    # sequence(0, size-3) would run DESCENDING for short docs (Spark
    # defaults step to -1 when start > stop) — guard explicitly
    tri_arr = arr.select("doc_id", F.when(
        F.size("t") >= 3,
        F.expr("transform(sequence(0, size(t) - 3),"
               " i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"))
        .otherwise(F.array().cast("array<string>")).alias("g"))
    toks = tri_arr.select("doc_id", F.explode("g").alias("tok"))
    first_seen = toks.groupBy("tok").agg(
        F.min("doc_id").cast("long").alias("first_doc"))
    doc_counts = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_toks"))
    types = (first_seen.crossJoin(F.broadcast(thr))
             .filter(F.col("first_doc") < F.col("thr"))
             .groupBy("g_ppm")
             .agg(F.count(F.lit(1)).cast("long").alias("n_types")))
    mass = (doc_counts.crossJoin(F.broadcast(thr))
            .filter(F.col("doc_id") < F.col("thr"))
            .groupBy("g_ppm")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_toks").cast("long").alias("n_grams")))
    base = (thr.join(types, "g_ppm").join(mass, "g_ppm"))
    b0 = (base.orderBy("g_ppm").limit(1)
          .select(F.col("n_grams").alias("n0"),
                  F.col("n_types").alias("v0")))
    return (base.crossJoin(F.broadcast(b0))
            .select("g_ppm", "thr", "n_docs", "n_grams", "n_types",
                    F.when(F.col("n_grams") == F.col("n0"),
                           F.lit(None).cast("double"))
                    .otherwise(F.round(
                        F.log(F.col("n_types").cast("double")
                              / F.col("v0").cast("double"))
                        / F.log(F.col("n_grams").cast("double")
                                / F.col("n0").cast("double")), 6))
                    .alias("heaps_beta")))


def _sql_text_heaps() -> str:
    grid_rows = ", ".join(f"({g})" for g in HEAPS_GRID_PPM)
    return f"""
WITH mx AS (SELECT CAST(max(doc_id) + 1 AS BIGINT) AS mx
            FROM documents),
grid(g_ppm) AS (VALUES {grid_rows}),
thr AS (SELECT g_ppm, CAST(mx * g_ppm // 1000000 AS BIGINT) AS thr
        FROM grid CROSS JOIN mx),
arr AS (
  SELECT doc_id, list_filter(string_split_regex(
      lower(coalesce(text, '')), '\\s+'), x -> x <> '') AS t
  FROM documents),
toks AS (
  SELECT doc_id, g AS tok FROM arr,
  UNNEST(list_transform(generate_series(1, len(t) - 2),
      i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS u(g)),
first_seen AS (
  SELECT tok, CAST(min(doc_id) AS BIGINT) AS first_doc
  FROM toks GROUP BY 1),
doc_counts AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks
  FROM toks GROUP BY 1),
types AS (
  SELECT g_ppm, CAST(count(*) AS BIGINT) AS n_types
  FROM first_seen CROSS JOIN thr WHERE first_doc < thr GROUP BY 1),
mass AS (
  SELECT g_ppm, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_toks) AS BIGINT) AS n_grams
  FROM doc_counts CROSS JOIN thr WHERE doc_id < thr GROUP BY 1),
base AS (
  SELECT thr.g_ppm, thr.thr, mass.n_docs, mass.n_grams, types.n_types
  FROM thr JOIN types USING (g_ppm) JOIN mass USING (g_ppm)),
b0 AS (SELECT n_grams AS n0, n_types AS v0 FROM base
       ORDER BY g_ppm LIMIT 1)
SELECT g_ppm, thr, n_docs, n_grams, n_types,
       CASE WHEN n_grams = n0 THEN NULL
            ELSE round(ln(CAST(n_types AS DOUBLE) / CAST(v0 AS DOUBLE))
                       / ln(CAST(n_grams AS DOUBLE)
                            / CAST(n0 AS DOUBLE)), 6) END AS heaps_beta
FROM base CROSS JOIN b0
"""


def q_sim_bucket_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket-balance audit for the ANN index [K: the skew read
    that decides whether an index config ships — a hot bucket is a
    hot-task straggler at query time, and empty buckets are wasted
    selectivity]: occupancy of every 2^ANN_N_PLANES sign bucket over
    the full embedding corpus (a constant bucket spine keeps EMPTY
    buckets in the result — they are the signal groupBy would drop),
    per-bucket share in exact ppm, and the chi-square statistic
    against the uniform ideal computed with an EXACT BIGINT numerator:
    chi2 = sum_b (n_b*B - n)^2 / (B*n) — the algebraic form whose
    cross-row sum is integer, leaving one double division at the end.

    Shape: one bucket pandas_udf pass + one <=2^planes-row hash agg +
    a constant spine left join + two O(1) crossJoins. The audit costs
    one corpus scan."""
    from ..operators.simsearch import hyperplanes, lsh_bucket
    e = _tbl(spark, sf_dir, "embeddings") \
        .select("vec_id", F.col("embedding").alias("nv"))
    planes = hyperplanes(ANN_N_PLANES, 64)
    b = lsh_bucket(e, "nv", planes)
    g = b.groupBy("bucket").agg(F.count(F.lit(1)).cast("long")
                                .alias("n_vecs"))
    spine = spark.createDataFrame(
        [(i,) for i in range(1 << ANN_N_PLANES)], "bucket long")
    full = (spine.join(g, "bucket", "left")
            .select("bucket",
                    F.coalesce("n_vecs", F.lit(0)).cast("long")
                    .alias("n_vecs")))
    nb = 1 << ANN_N_PLANES
    chi = (full.crossJoin(F.broadcast(
        full.agg(F.sum("n_vecs").cast("long").alias("n"))))
        .select(((F.col("n_vecs") * nb - F.col("n"))
                 * (F.col("n_vecs") * nb - F.col("n")))
                .cast("long").alias("dev2"), F.col("n"))
        .groupBy("n")
        .agg(F.sum("dev2").cast("long").alias("chi_num")))
    return (full.crossJoin(F.broadcast(chi))
            .select("bucket", "n_vecs",
                    F.expr("n_vecs * 1000000L DIV n").cast("long")
                    .alias("share_ppm"),
                    F.round(F.col("chi_num").cast("double")
                            / (F.lit(float(nb))
                               * F.col("n").cast("double")), 6)
                    .alias("chi2_uniform")))


def _sql_sim_bucket_balance() -> str:
    from ..operators.simsearch import hyperplanes
    planes = hyperplanes(ANN_N_PLANES, 64)
    nb = 1 << ANN_N_PLANES
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(nv, {_sql_vec_lit(p)}) >= 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes))
    spine_rows = ", ".join(f"({i})" for i in range(nb))
    return f"""
WITH v AS (SELECT cast(embedding AS DOUBLE[]) AS nv FROM embeddings),
b AS (SELECT {bucket} AS bucket FROM v),
g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_vecs
      FROM b GROUP BY 1),
spine(bucket) AS (VALUES {spine_rows}),
occ AS (
  SELECT CAST(spine.bucket AS BIGINT) AS bucket,
         CAST(coalesce(g.n_vecs, 0) AS BIGINT) AS n_vecs
  FROM spine LEFT JOIN g ON g.bucket = spine.bucket),
tot AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS n FROM occ),
chi AS (
  SELECT CAST(sum((n_vecs * {nb} - n) * (n_vecs * {nb} - n))
              AS BIGINT) AS chi_num
  FROM occ CROSS JOIN tot)
SELECT bucket, n_vecs,
       CAST(n_vecs * 1000000 // n AS BIGINT) AS share_ppm,
       round(CAST(chi_num AS DOUBLE)
             / (CAST({nb} AS DOUBLE) * CAST(n AS DOUBLE)), 6)
         AS chi2_uniform
FROM occ CROSS JOIN tot CROSS JOIN chi
"""


def q_stats_chao1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 species-richness estimate of the unseen vocabulary [K:
    the capture-recapture estimator — from the counts of singleton
    (f1) and doubleton (f2) types, estimate how many types the FULL
    population holds: Chao1 = V + f1*(f1-1)/(2*(f2+1)), the
    bias-corrected form that stays defined at f2=0 — plus Good-Turing
    coverage 1 - f1/N, the "what mass of the next shard will be
    unseen types" read a tokenizer/vocab planner wants before
    committing]. Types are token TRIGRAMS (the same unit and
    rationale as text_heaps: the fixture's unigram space is closed).
    V, f1, f2, N are exact BIGINTs from two nested aggs; the two
    estimates are one double expression each.

    Shape: token explode -> type hash agg -> frequency-of-frequency
    hash agg (tiny) -> one O(1) summary row. The classic two-level
    agg; nothing unbounded."""
    d = _docs(spark, sf_dir)
    arr = d.select(
        F.filter(F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))),
                 r"\s+"), lambda t: t != "").alias("t"))
    tri = arr.select(F.when(
        F.size("t") >= 3,
        F.expr("transform(sequence(0, size(t) - 3),"
               " i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"))
        .otherwise(F.array().cast("array<string>")).alias("g"))
    toks = tri.select(F.explode("g").alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long")
                                   .alias("c"))
    summ = freq.agg(
        F.count(F.lit(1)).cast("long").alias("v_obs"),
        F.sum("c").cast("long").alias("n_grams"),
        F.sum((F.col("c") == 1).cast("long")).cast("long").alias("f1"),
        F.sum((F.col("c") == 2).cast("long")).cast("long").alias("f2"))
    f1d = F.col("f1").cast("double")
    return summ.select(
        "v_obs", "n_grams", "f1", "f2",
        F.round(F.col("v_obs").cast("double")
                + f1d * (f1d - 1.0)
                / (2.0 * (F.col("f2").cast("double") + 1.0)), 6)
        .alias("chao1"),
        F.round(F.lit(1.0) - f1d / F.col("n_grams").cast("double"), 6)
        .alias("coverage_gt"))


def _sql_stats_chao1() -> str:
    return """
WITH arr AS (
  SELECT list_filter(string_split_regex(
      lower(coalesce(text, '')), '\\s+'), x -> x <> '') AS t
  FROM documents),
toks AS (
  SELECT g AS tok FROM arr,
  UNNEST(list_transform(generate_series(1, len(t) - 2),
      i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS u(g)),
freq AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
         FROM toks GROUP BY 1),
summ AS (
  SELECT CAST(count(*) AS BIGINT) AS v_obs,
         CAST(sum(c) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM freq)
SELECT v_obs, n_grams, f1, f2,
       round(CAST(v_obs AS DOUBLE)
             + CAST(f1 AS DOUBLE) * (CAST(f1 AS DOUBLE) - 1.0)
               / (2.0 * (CAST(f2 AS DOUBLE) + 1.0)), 6) AS chao1,
       round(1.0 - CAST(f1 AS DOUBLE) / CAST(n_grams AS DOUBLE), 6)
         AS coverage_gt
FROM summ
"""


HHI_SCALE = 1000


def q_kg_topic_focus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation topical-concentration profile [K: the
    Herfindahl-Hirschman / inverse-Simpson read a topic router and a
    curation mixer both consume — effective_topics = 1/HHI is "how
    many topics is this conversation REALLY about"; 1.0 = laser
    focus, near the concept count = diffuse]: CDS scores quantized to
    exact milli-integers (round-stable), HHI = sum(s_i^2) over
    (sum s_i)^2 with BOTH sums exact BIGINTs (the milli scale keeps
    sum(s^2)*1e6 far inside int64 — a ppm scale would overflow at
    ontology fan-outs), hhi_ppm by integer cross-multiplied division,
    and one double reciprocal at the end. A margin-style top1-top2
    read is degenerate on this pipeline (max-propagated CDS ties the
    head at 1.0 corpus-wide — verified), so concentration over the
    WHOLE score mass is the read with signal.

    Shape: one (conv) hash agg over the P14 table + map arithmetic.
    Nothing beyond the CDS plan itself."""
    cds = q_kg_cds(spark, sf_dir)
    q = cds.select("subj_key",
                   F.expr(f"CAST(round(score * {HHI_SCALE}, 0)"
                          " AS BIGINT)").alias("s"))
    g = q.groupBy("subj_key").agg(
        F.count(F.lit(1)).cast("long").alias("n_concepts"),
        F.sum("s").cast("long").alias("mass"),
        F.sum(F.col("s") * F.col("s")).cast("long").alias("mass2"))
    return g.select(
        "subj_key", "n_concepts", "mass",
        F.expr("mass2 * 1000000L DIV (mass * mass)").cast("long")
        .alias("hhi_ppm"),
        F.round(F.col("mass").cast("double")
                * F.col("mass").cast("double")
                / F.col("mass2").cast("double"), 6)
        .alias("effective_topics"))


def _sql_kg_topic_focus() -> str:
    return f"""
WITH cds AS ({_sql_kg_cds_body()}),
q AS (
  SELECT subj_key,
         CAST(round(score * {HHI_SCALE}, 0) AS BIGINT) AS s
  FROM cds),
g AS (
  SELECT subj_key, CAST(count(*) AS BIGINT) AS n_concepts,
         CAST(sum(s) AS BIGINT) AS mass,
         CAST(sum(s * s) AS BIGINT) AS mass2
  FROM q GROUP BY 1)
SELECT subj_key, n_concepts, mass,
       CAST(mass2 * 1000000 // (mass * mass) AS BIGINT) AS hhi_ppm,
       round(CAST(mass AS DOUBLE) * CAST(mass AS DOUBLE)
             / CAST(mass2 AS DOUBLE), 6) AS effective_topics
FROM g
"""


def q_dedup_cluster_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster quality audit [K: the post-clustering check an
    ER/dedup pipeline ships before deleting anything — transitive
    closure can chain A~B~C into one cluster even when A and C are
    dissimilar, and the per-cluster MINIMUM pair similarity is exactly
    the chaining-damage signal]: the verified Jaccard pairs joined to
    their connected component, then per multi-doc cluster: member
    count, in-cluster verified-pair count, pair density vs the
    complete graph in exact ppm, and min / mean pair similarity as
    exact ppm integers (jaccard is round6, so *1e6 rounds exactly; the
    mean is an integer DIV — no cross-row double sums).

    Shape: the jaccard posting-list join + the iterative components
    (both existing paired plans), one broadcast-able component-id join
    onto the pairs, two hash aggs. Singleton components carry no pair
    and are excluded (nothing to audit)."""
    pairs = q_dedup_jaccard(spark, sf_dir)
    comp = q_dedup_components(spark, sf_dir)
    ca = comp.select(F.col("doc_id").alias("doc_a"),
                     F.col("component").alias("cluster"))
    j = (pairs.join(F.broadcast(ca), "doc_a")
         .select("cluster",
                 F.expr("CAST(round(jaccard * 1000000, 0) AS BIGINT)")
                 .alias("jac_ppm")))
    pg = j.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.min("jac_ppm").cast("long").alias("min_jac_ppm"),
        F.expr("sum(jac_ppm) DIV count(1)").cast("long")
        .alias("mean_jac_ppm"))
    sizes = (comp.groupBy("component")
             .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
             .filter(F.col("n_docs") > 1)
             .select(F.col("component").alias("cluster"), "n_docs"))
    return (sizes.join(pg, "cluster", "left")
            .select("cluster", "n_docs",
                    F.coalesce("n_pairs", F.lit(0)).cast("long")
                    .alias("n_pairs"),
                    F.expr("coalesce(n_pairs, 0) * 2000000L"
                           " DIV (n_docs * (n_docs - 1))").cast("long")
                    .alias("density_ppm"),
                    "min_jac_ppm", "mean_jac_ppm"))


def _sql_dedup_cluster_quality() -> str:
    return f"""
WITH RECURSIVE pairs AS MATERIALIZED ({SQL_DEDUP_JACCARD}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs),
nodes AS (SELECT doc_id FROM documents WHERE doc_id < {JACCARD_MAX_DOC}),
reach(a, b) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
comp AS (SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a),
j AS (
  SELECT c.component AS cluster,
         CAST(round(p.jaccard * 1000000, 0) AS BIGINT) AS jac_ppm
  FROM pairs p JOIN comp c ON c.doc_id = p.doc_a),
pg AS (
  SELECT cluster, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(min(jac_ppm) AS BIGINT) AS min_jac_ppm,
         CAST(sum(jac_ppm) // count(*) AS BIGINT) AS mean_jac_ppm
  FROM j GROUP BY 1),
sizes AS (
  SELECT component AS cluster, CAST(count(*) AS BIGINT) AS n_docs
  FROM comp GROUP BY 1 HAVING count(*) > 1)
SELECT s.cluster, s.n_docs,
       CAST(coalesce(pg.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(coalesce(pg.n_pairs, 0) * 2000000
            // (s.n_docs * (s.n_docs - 1)) AS BIGINT) AS density_ppm,
       pg.min_jac_ppm, pg.mean_jac_ppm
FROM sizes s LEFT JOIN pg ON pg.cluster = s.cluster
"""


def q_stats_jackknife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-source jackknife for the corpus mean doc length [K:
    the grouped-jackknife SE — when observations cluster by source,
    resampling DOCUMENTS understates the variance; deleting whole
    sources measures the between-source sensitivity a mixture change
    would actually cause]: per source the leave-that-source-out mean
    (exact global minus per-source sums), then the jackknife variance
    (g-1)/g * sum((m_i - mean(m_i))^2) assembled WITHOUT a cross-row
    double sum — the loo means are quantized to exact MILLI-unit
    integers before the final g-row sum (the stats_seasonality
    convention; milli not micro so sum(m^2) stays inside int64).

    Shape: one |sources|-row hash agg, one O(1) global crossJoin, one
    g-row agg. Emits the corpus mean, the jackknife SE, and g."""
    d = _docs(spark, sf_dir)
    g = (d.groupBy("source")
         .agg(F.count(F.lit(1)).cast("long").alias("n1"),
              F.sum(F.length(F.coalesce(F.col("text"), F.lit(""))))
              .cast("long").alias("s1")))
    tot = g.agg(F.count(F.lit(1)).cast("long").alias("gs"),
                F.sum("n1").cast("long").alias("nt"),
                F.sum("s1").cast("long").alias("st"))
    # loo mean in MILLI-units, exact: (st - s1)*1e3 DIV (nt - n1) —
    # micro-units would push sum(m^2) past int64 at ~20 sources
    loo = (g.crossJoin(F.broadcast(tot))
           .select("gs", "nt", "st",
                   F.expr("(st - s1) * 1000L DIV (nt - n1)")
                   .cast("long").alias("m_u")))
    # jackknife: var = (g-1)/g * sum((m_i - mbar)^2); mbar over the
    # loo means, all in exact micro-unit integers (mbar floor-DIV —
    # identical on both engines, documented quantization)
    agg = loo.groupBy("gs", "nt", "st").agg(
        F.count(F.lit(1)).cast("long").alias("g_rows"),
        F.sum("m_u").cast("long").alias("sm"),
        F.sum(F.col("m_u") * F.col("m_u")).cast("long").alias("sm2"))
    gd = F.col("gs").cast("double")
    var_u2 = ((gd * F.col("sm2").cast("double")
               - F.col("sm").cast("double") * F.col("sm").cast("double"))
              / gd) * ((gd - 1.0) / gd)
    return agg.select(
        F.col("gs").alias("n_sources"),
        F.col("nt").alias("n_docs"),
        F.round(F.col("st").cast("double") / F.col("nt").cast("double"),
                6).alias("mean_len"),
        F.round(F.sqrt(var_u2) / F.lit(1000.0), 6)
        .alias("jackknife_se"))


def _sql_stats_jackknife() -> str:
    return """
WITH g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n1,
         CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS s1
  FROM documents GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS gs,
               CAST(sum(n1) AS BIGINT) AS nt,
               CAST(sum(s1) AS BIGINT) AS st FROM g),
loo AS (
  SELECT gs, nt, st,
         CAST((st - s1) * 1000 // (nt - n1) AS BIGINT) AS m_u
  FROM g CROSS JOIN tot),
agg AS (
  SELECT gs, nt, st, CAST(count(*) AS BIGINT) AS g_rows,
         CAST(sum(m_u) AS BIGINT) AS sm,
         CAST(sum(m_u * m_u) AS BIGINT) AS sm2
  FROM loo GROUP BY 1, 2, 3)
SELECT gs AS n_sources, nt AS n_docs,
       round(CAST(st AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS mean_len,
       round(sqrt(((CAST(gs AS DOUBLE) * CAST(sm2 AS DOUBLE)
                    - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))
                   / CAST(gs AS DOUBLE))
                  * ((CAST(gs AS DOUBLE) - 1.0) / CAST(gs AS DOUBLE)))
             / 1000.0, 6) AS jackknife_se
FROM agg
"""


def q_sim_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ANN self-evaluation: recall@k of the product-quantized ADC
    path against the exact brute-force cosine top-k, per query, exact
    ppm [K: the eval that decides whether the memory-bound PQ serving
    shape is accurate enough to ship — the sim_recall read for the PQ
    index instead of the LSH one]. Pure composition of two paired
    queries; the truth and the approximate path each keep their own
    plan."""
    bf = q_sim_topk_cosine(spark, sf_dir).select("qid", "cid")
    pq = q_sim_pq_topk(spark, sf_dir).select(
        F.col("qid").alias("aqid"), F.col("cid").alias("acid"))
    hits = (bf.join(pq, (F.col("qid") == F.col("aqid"))
                    & (F.col("cid") == F.col("acid")))
            .groupBy("qid").agg(F.count(F.lit(1)).alias("n_hits")))
    return (bf.select("qid").distinct()
            .join(hits, "qid", "left")
            .select("qid",
                    F.coalesce(F.col("n_hits"), F.lit(0).cast("long"))
                    .cast("long").alias("n_hits"))
            .withColumn("recall_ppm",
                        F.expr(f"n_hits * 1000000L DIV {SIM_TOP_K}")
                        .cast("long")))


def _sql_sim_pq_recall() -> str:
    bf = SQL_SIM_TOPK.strip().rstrip(";")
    pq = SQL_SIM_PQ_TOPK_TMPL.format(
        n_query=N_QUERY_VECS, K=PQ_CODES, M=PQ_SUBS,
        w=64 // PQ_SUBS, k=SIM_TOP_K).strip().rstrip(";")
    return f"""
WITH bf AS MATERIALIZED (SELECT qid, cid FROM ({bf})),
pq AS MATERIALIZED (SELECT qid, cid FROM ({pq})),
hits AS (
  SELECT bf.qid, CAST(count(*) AS BIGINT) AS n_hits
  FROM bf JOIN pq ON pq.qid = bf.qid AND pq.cid = bf.cid
  GROUP BY 1)
SELECT q.qid, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(h.n_hits, 0) * 1000000 // {SIM_TOP_K} AS BIGINT)
         AS recall_ppm
FROM (SELECT DISTINCT qid FROM bf) q
LEFT JOIN hits h ON h.qid = q.qid
"""


def q_curation_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer-fertility table [K: the chars-per-token
    and token-share read a multilingual budget plan starts from — a
    language whose script packs more chars per whitespace token will
    claim a different subword budget than its raw char share
    suggests]: per lang — doc count, exact char mass, exact
    whitespace-token mass, chars-per-token in exact ppm (cross-
    multiplied integer division), and the language's share of the
    corpus TOKEN budget in exact ppm.

    Shape: one map-side projection (size(split()) needs no explode —
    the cheapest token count there is) -> one |langs|-row hash agg ->
    one O(1) total crossJoined back."""
    d = _docs(spark, sf_dir)
    m = d.select(
        "lang",
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long")
        .alias("n_chars"),
        F.size(F.filter(
            F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))),
                    r"\s+"), lambda t: t != "")).cast("long")
        .alias("n_toks"))
    g = m.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars"),
        F.sum("n_toks").cast("long").alias("tokens"))
    tot = g.agg(F.sum("tokens").cast("long").alias("t_total"))
    return (g.crossJoin(F.broadcast(tot))
            .select("lang", "n_docs", "chars", "tokens",
                    F.expr("chars * 1000000L DIV tokens").cast("long")
                    .alias("chars_per_token_ppm"),
                    F.expr("tokens * 1000000L DIV t_total").cast("long")
                    .alias("token_share_ppm")))


def _sql_curation_fertility() -> str:
    return """
WITH m AS (
  SELECT lang,
         CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars,
         CAST(len(list_filter(string_split_regex(
             lower(coalesce(text, '')), '\\s+'), x -> x <> ''))
              AS BIGINT) AS n_toks
  FROM documents),
g AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS chars,
         CAST(sum(n_toks) AS BIGINT) AS tokens
  FROM m GROUP BY 1),
tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS t_total FROM g)
SELECT lang, n_docs, chars, tokens,
       CAST(chars * 1000000 // tokens AS BIGINT)
         AS chars_per_token_ppm,
       CAST(tokens * 1000000 // t_total AS BIGINT) AS token_share_ppm
FROM g CROSS JOIN tot
"""


def q_rel_new_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly new-vs-returning customer mix [K: the acquisition-vs-
    retention read on every growth dashboard — a month's demand is
    healthy only if returning demand holds while new demand adds]:
    an order is NEW iff its calendar month equals its customer's
    first-order month (exact integer month index, min-agg — no
    window), per month: order counts and distinct-customer counts on
    both sides plus the new share in exact ppm.

    Shape: one per-customer min-agg (map-side partial), one broadcast-
    able join back, one per-month hash agg. Nothing sorted, nothing
    single-partition."""
    o = _tbl(spark, sf_dir, "orders")
    om = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long").alias("m"))
    first = om.groupBy("o_custkey").agg(F.min("m").alias("first_m"))
    j = om.join(first, "o_custkey") \
        .withColumn("is_new", (F.col("m") == F.col("first_m"))
                    .cast("int"))
    return (j.groupBy(F.col("m").alias("month_idx"))
            .agg(F.sum("is_new").cast("long").alias("new_orders"),
                 F.sum(1 - F.col("is_new")).cast("long")
                 .alias("returning_orders"),
                 F.count_distinct(
                     F.when(F.col("is_new") == 1, F.col("o_custkey")))
                 .cast("long").alias("new_customers"),
                 F.count_distinct(
                     F.when(F.col("is_new") == 0, F.col("o_custkey")))
                 .cast("long").alias("returning_customers"),
                 F.expr("sum(is_new) * 1000000L DIV count(1)")
                 .cast("long").alias("new_share_ppm")))


def _sql_rel_new_returning() -> str:
    return """
WITH om AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
              AS BIGINT) AS m
  FROM orders),
first AS (SELECT o_custkey, min(m) AS first_m FROM om GROUP BY 1),
j AS (
  SELECT om.m, om.o_custkey,
         CASE WHEN om.m = f.first_m THEN 1 ELSE 0 END AS is_new
  FROM om JOIN first f ON f.o_custkey = om.o_custkey)
SELECT m AS month_idx,
       CAST(sum(is_new) AS BIGINT) AS new_orders,
       CAST(sum(1 - is_new) AS BIGINT) AS returning_orders,
       CAST(count(DISTINCT CASE WHEN is_new = 1 THEN o_custkey END)
            AS BIGINT) AS new_customers,
       CAST(count(DISTINCT CASE WHEN is_new = 0 THEN o_custkey END)
            AS BIGINT) AS returning_customers,
       CAST(sum(is_new) * 1000000 // count(*) AS BIGINT)
         AS new_share_ppm
FROM j GROUP BY 1
"""


CAL_BIN_W = 1  # cosine bin width in tenths: [-1,1] -> 20 bins of 0.1


def q_sim_label_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-metric calibration against labels [K: the kg_
    calibration read for the VECTOR space — if higher cosine between
    neighbors doesn't raise the same-label rate, the embedding
    carries no class signal and every cosine-thresholded pipeline
    downstream is noise]: the wave-41 kNN edges joined to both
    endpoints' labels, binned by cosine (exact integer binning over
    the round6 ppm cosine), per bin: edge count, same-label count and
    rate in exact ppm.

    Shape: the kNN graph + two broadcast label joins + one <=8-row
    hash agg. Nothing beyond the graph build itself."""
    g = q_sim_knn_graph(spark, sf_dir)
    e = _tbl(spark, sf_dir, "embeddings")
    la = e.select(F.col("vec_id").alias("src"),
                  F.col("label").alias("label_a"))
    lb = e.select(F.col("vec_id").alias("dst"),
                  F.col("label").alias("label_b"))
    j = (g.join(F.broadcast(la), "src").join(F.broadcast(lb), "dst")
         .select(
             F.expr(f"CAST(floor((round(cos * 1000000, 0) + 1000000)"
                    f" / ({CAL_BIN_W} * 100000)) AS INT)").alias("bin"),
             (F.col("label_a") == F.col("label_b")).cast("long")
             .alias("same")))
    return (j.groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n_edges"),
                 F.sum("same").cast("long").alias("n_same_label"),
                 F.expr("sum(same) * 1000000 DIV count(1)")
                 .cast("long").alias("same_rate_ppm")))


def _sql_sim_label_calibration() -> str:
    knn = _sql_sim_knn_graph().strip().rstrip(";")
    return f"""
WITH knn AS MATERIALIZED ({knn}),
j AS (
  SELECT CAST(floor((round(k.cos * 1000000, 0) + 1000000)
              / ({CAL_BIN_W} * 100000)) AS INT) AS bin,
         CASE WHEN a.label = b.label THEN 1 ELSE 0 END AS same
  FROM knn k
  JOIN embeddings a ON a.vec_id = k.src
  JOIN embeddings b ON b.vec_id = k.dst)
SELECT bin, CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(same) AS BIGINT) AS n_same_label,
       CAST(sum(same) * 1000000 // count(*) AS BIGINT)
         AS same_rate_ppm
FROM j GROUP BY 1
"""


CODE_SYMBOLS = "{}();=<>[]"


def q_text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose detection heuristics [K: the classifier every
    pretraining curation pipeline runs to route text into the code or
    the prose mix — symbol density, indented-line share, and keyword
    hits are the standard cheap signals (the fasttext classifier's
    feature floor)]: per document — exact symbol count (one pass per
    symbol char via length-difference, pure JVM), indented and total
    line counts, a code-keyword hit count (word-boundary regexp), the
    two densities in exact ppm, and the routing flag (symbol density
    > 3% OR >= 2 keywords AND >= 1 indented line — thresholds are
    demo constants, documented). Per-doc rows so downstream mixes can
    join directly.

    Shape: map-only projection over the documents scan — no shuffle
    at all; the cheapest full-corpus filter shape there is."""
    d = _docs(spark, sf_dir)
    txt = F.coalesce(F.col("text"), F.lit(""))
    sym = sum((F.length(txt)
               - F.length(F.replace(txt, F.lit(c), F.lit(""))))
              for c in CODE_SYMBOLS)
    lines = F.split(txt, "\n")
    n_lines = F.size(lines)
    indented = F.size(F.filter(lines, lambda x: x.startswith(" ")))
    kw = F.size(F.filter(
        F.split(F.lower(txt), r"\s+"),
        lambda t: t.isin("def", "class", "import", "return", "function",
                         "var", "const", "if", "else", "for")))
    base = d.select(
        "doc_id", "lang",
        F.length(txt).cast("long").alias("n_chars"),
        sym.cast("long").alias("n_symbols"),
        n_lines.cast("long").alias("n_lines"),
        indented.cast("long").alias("n_indented"),
        kw.cast("long").alias("n_keywords"))
    return base.select(
        "doc_id", "lang", "n_chars", "n_symbols", "n_lines",
        "n_indented", "n_keywords",
        F.expr("n_symbols * 1000000L DIV greatest(n_chars, 1)")
        .cast("long").alias("symbol_ppm"),
        F.expr("n_indented * 1000000L DIV greatest(n_lines, 1)")
        .cast("long").alias("indent_ppm"),
        F.expr("CAST(n_symbols * 1000000L DIV greatest(n_chars, 1)"
               " > 30000 OR (n_keywords >= 2 AND n_indented >= 1)"
               " AS INT)").alias("is_code"))


def _sql_text_code_detect() -> str:
    sym = " + ".join(
        "(length(t) - length(replace(t, '{}', '')))".format(c)
        for c in CODE_SYMBOLS)
    return f"""
WITH base AS (
  SELECT doc_id, lang, coalesce(text, '') AS t FROM documents),
feat AS (
  SELECT doc_id, lang,
         CAST(length(t) AS BIGINT) AS n_chars,
         CAST({sym} AS BIGINT) AS n_symbols,
         CAST(len(string_split(t, chr(10))) AS BIGINT) AS n_lines,
         CAST(len(list_filter(string_split(t, chr(10)),
                              x -> x LIKE ' %')) AS BIGINT)
           AS n_indented,
         CAST(len(list_filter(string_split_regex(lower(t), '\\s+'),
              x -> x IN ('def', 'class', 'import', 'return',
                         'function', 'var', 'const', 'if', 'else',
                         'for'))) AS BIGINT) AS n_keywords
  FROM base)
SELECT doc_id, lang, n_chars, n_symbols, n_lines, n_indented,
       n_keywords,
       CAST(n_symbols * 1000000 // greatest(n_chars, 1) AS BIGINT)
         AS symbol_ppm,
       CAST(n_indented * 1000000 // greatest(n_lines, 1) AS BIGINT)
         AS indent_ppm,
       CAST(CASE WHEN n_symbols * 1000000 // greatest(n_chars, 1)
                      > 30000
                  OR (n_keywords >= 2 AND n_indented >= 1)
            THEN 1 ELSE 0 END AS INT) AS is_code
FROM feat
"""


EWMA_HORIZON = 30  # days; weights below 2^-30 are exactly zero


def q_stats_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-decayed daily-load smoother, half-life = 1 day [K:
    the EWMA-style monitor read — recent days dominate, every past
    day contributes 2^-age]: per event_type the decayed load
    sum_t x_t * 2^-age_t and the decay-weighted mean rate. The
    cross-row weighted sum — normally an engine-order double hazard —
    is EXACT here by construction: each term is the INTEGER
    x_t * 2^(H - age_t) (H = EWMA_HORIZON, ages beyond H contribute
    exactly zero, documented), the BIGINT sum is order-invariant, and
    one division by 2^H at the end recovers the dyadic value with no
    rounding at all. Also reports the final-day raw count and the
    plain mean for contrast.

    Shape: one (type, day) hash agg -> per-type max-day broadcast
    back -> map-side integer weight -> one per-type agg. No windows,
    no recursion at runtime — the closed form is the whole point."""
    e = _tbl(spark, sf_dir, "events")
    daily = (e.select("event_type", F.to_date("ts").alias("day"))
             .groupBy("event_type", "day")
             .agg(F.count(F.lit(1)).cast("long").alias("x")))
    rng = daily.groupBy("event_type").agg(
        F.max("day").alias("dT"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("total"))
    j = (daily.join(F.broadcast(rng), "event_type")
         .withColumn("age", F.datediff(F.col("dT"), F.col("day"))
                     .cast("int"))
         .filter(F.col("age") <= EWMA_HORIZON)
         .withColumn("scale",
                     F.expr(f"shiftleft(CAST(1 AS BIGINT),"
                            f" {EWMA_HORIZON} - age)")))
    g = j.groupBy("event_type").agg(
        F.sum(F.col("x") * F.col("scale")).cast("long").alias("num"),
        F.sum("scale").cast("long").alias("den"),
        F.max(F.when(F.col("age") == 0, F.col("x"))).cast("long")
        .alias("last_day"))
    two_h = float(1 << EWMA_HORIZON)
    return (g.join(F.broadcast(rng), "event_type")
            .select("event_type", "n_days", "total", "last_day",
                    F.round(F.col("total").cast("double")
                            / F.col("n_days").cast("double"), 6)
                    .alias("mean_daily"),
                    F.round(F.col("num").cast("double") / two_h, 6)
                    .alias("decayed_load"),
                    F.round(F.col("num").cast("double")
                            / F.col("den").cast("double"), 6)
                    .alias("decayed_rate")))


def _sql_stats_ewma() -> str:
    h = EWMA_HORIZON
    return f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2),
rng AS (
  SELECT event_type, max(day) AS dT,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(x) AS BIGINT) AS total
  FROM daily GROUP BY 1),
j AS (
  SELECT d.event_type, d.x,
         datediff('day', d.day, r.dT) AS age,
         CAST(1 AS BIGINT) << ({h} - datediff('day', d.day, r.dT))
           AS scale
  FROM daily d JOIN rng r USING (event_type)
  WHERE datediff('day', d.day, r.dT) <= {h}),
g AS (
  SELECT event_type,
         CAST(sum(x * scale) AS BIGINT) AS num,
         CAST(sum(scale) AS BIGINT) AS den,
         CAST(max(CASE WHEN age = 0 THEN x END) AS BIGINT) AS last_day
  FROM j GROUP BY 1)
SELECT g.event_type, r.n_days, r.total, g.last_day,
       round(CAST(r.total AS DOUBLE) / CAST(r.n_days AS DOUBLE), 6)
         AS mean_daily,
       round(CAST(g.num AS DOUBLE) / {float(1 << h)}, 6)
         AS decayed_load,
       round(CAST(g.num AS DOUBLE) / CAST(g.den AS DOUBLE), 6)
         AS decayed_rate
FROM g JOIN rng r USING (event_type)
"""


def q_stats_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest [K: the baseline every
    forecasting effort must beat — predict month t with month t-12 —
    and the backtest table that says whether fancier models earn
    their keep]: per month with a year-ago observation, actual vs
    predicted order counts, absolute error, and error in exact ppm of
    the actual; plus the corpus sMAPE assembled from EXACT integer
    sums (sum|a-p| and sum(a+p) — the ratio-of-sums sMAPE variant is
    chosen PRECISELY because it needs no cross-row double sum; the
    per-row-mean variant would, documented).

    Shape: one monthly hash agg -> one self-join on month-12 (tiny
    keyed table) -> one O(1) summary crossJoined back."""
    o = _tbl(spark, sf_dir, "orders")
    monthly = (o.select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long").alias("m"))
        .groupBy("m").agg(F.count(F.lit(1)).cast("long").alias("x")))
    prev = monthly.select((F.col("m") + 12).alias("m"),
                          F.col("x").alias("pred"))
    j = monthly.join(prev, "m") \
        .withColumn("abs_err", F.abs(F.col("x") - F.col("pred")))
    summ = j.agg(F.sum("abs_err").cast("long").alias("sae"),
                 F.sum(F.col("x") + F.col("pred")).cast("long")
                 .alias("sap"))
    return (j.crossJoin(F.broadcast(summ))
            .select(F.col("m").alias("month_idx"),
                    F.col("x").alias("actual"), "pred",
                    F.col("abs_err").cast("long").alias("abs_err"),
                    F.expr("abs_err * 1000000L DIV x").cast("long")
                    .alias("err_ppm"),
                    F.expr("2 * sae * 1000000L DIV sap").cast("long")
                    .alias("smape_ppm")))


def _sql_stats_backtest() -> str:
    return """
WITH monthly AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
              AS BIGINT) AS m,
         CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1),
j AS (
  SELECT a.m, a.x, p.x AS pred, abs(a.x - p.x) AS abs_err
  FROM monthly a JOIN monthly p ON p.m = a.m - 12),
summ AS (SELECT CAST(sum(abs_err) AS BIGINT) AS sae,
                CAST(sum(x + pred) AS BIGINT) AS sap FROM j)
SELECT m AS month_idx, x AS actual, pred,
       CAST(abs_err AS BIGINT) AS abs_err,
       CAST(abs_err * 1000000 // x AS BIGINT) AS err_ppm,
       CAST(2 * sae * 1000000 // sap AS BIGINT) AS smape_ppm
FROM j CROSS JOIN summ
"""


DIMVAR_SCALE = 1000
DIMVAR_DEAD_PPM = 100000  # flag dims with < 10% of the mean variance


def q_sim_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding variance profile [K: the dead-unit /
    collapsed-dimension check an embedding QA job runs — a dimension
    whose variance is a tiny fraction of the mean carries no signal
    and hints at training collapse or a truncation bug]: components
    quantized to DIMVAR_SCALE fixed-point integers (the centroid-
    drift convention), per-position exact (n, S, SS) BIGINTs, sample
    variance in micro-units via integer cross-multiplied division so
    the 64-row mean-variance reference is itself an exact integer
    mean, and the dead flag compares each dim against
    DIMVAR_DEAD_PPM of that reference without ever leaving integers.

    Shape: one posexplode scan -> one 64-row hash agg -> one O(1)
    reference agg crossJoined back. The columnar unpivot is the whole
    cost."""
    e = _tbl(spark, sf_dir, "embeddings")
    q = (e.select(F.posexplode(F.col("embedding")).alias("pos", "v"))
         .select("pos",
                 F.floor(F.col("v").cast("double") * DIMVAR_SCALE)
                 .cast("long").alias("qv")))
    g = q.groupBy("pos").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("qv").cast("long").alias("s"),
        F.sum(F.col("qv") * F.col("qv")).cast("long").alias("ss"))
    # sample variance in exact micro-units of DIMVAR_SCALE^2:
    # var_u = (n*SS - S^2) * 1e6 DIV (n*(n-1))
    gv = g.select("pos", "n",
                  F.expr("(n * ss - s * s) * 1000000L"
                         " DIV (n * (n - 1))").cast("long")
                  .alias("var_u"))
    ref = gv.agg(F.count(F.lit(1)).cast("long").alias("dims"),
                 F.expr("sum(var_u) DIV count(1)").cast("long")
                 .alias("mean_var_u"))
    return (gv.crossJoin(F.broadcast(ref))
            .select(F.col("pos").cast("int").alias("pos"),
                    "var_u", "mean_var_u",
                    F.expr("var_u * 1000000L DIV greatest(mean_var_u, 1)")
                    .cast("long").alias("var_share_ppm"),
                    F.expr(f"CAST(var_u * 1000000L"
                           f" DIV greatest(mean_var_u, 1)"
                           f" < {DIMVAR_DEAD_PPM} AS INT)")
                    .alias("is_dead")))


def _sql_sim_dim_variance() -> str:
    return f"""
WITH q AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {DIMVAR_SCALE})
              AS BIGINT) AS qv
  FROM embeddings),
g AS (
  SELECT pos, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(qv) AS BIGINT) AS s,
         CAST(sum(qv * qv) AS BIGINT) AS ss
  FROM q GROUP BY 1),
gv AS (
  SELECT pos, n,
         CAST((n * ss - s * s) * 1000000 // (n * (n - 1)) AS BIGINT)
           AS var_u
  FROM g),
ref AS (SELECT CAST(count(*) AS BIGINT) AS dims,
               CAST(sum(var_u) // count(*) AS BIGINT) AS mean_var_u
        FROM gv)
SELECT CAST(pos AS INT) AS pos, var_u, mean_var_u,
       CAST(var_u * 1000000 // greatest(mean_var_u, 1) AS BIGINT)
         AS var_share_ppm,
       CAST(CASE WHEN var_u * 1000000 // greatest(mean_var_u, 1)
                      < {DIMVAR_DEAD_PPM}
            THEN 1 ELSE 0 END AS INT) AS is_dead
FROM gv CROSS JOIN ref
"""


BLOCKLIST_TERMS = ("casino", "lottery", "viagra", "warez", "xxx")
LEET_SRC = "013457@$"
LEET_DST = "oieastas"


def q_text_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Obfuscation-resistant blocklist filter [K: the safety/spam
    gate every web-corpus pipeline runs — naive term matching misses
    'c4sino' and 'v1agra', so terms are matched on a LEET-NORMALIZED
    shadow of the text (0->o, 1->i, 3->e, 4->a, 5->s, 7->t, @->a,
    $->s — the standard substitution table), while the reported
    surface stays the original token]: per document the blocklist hit
    count, the distinct terms hit, and the keep/drop flag; the terms
    ship as a broadcast list and matching is one translate + token
    scan, map-only.

    Shape: pure map-side projection (translate + split + filter-HOF)
    — no shuffle, no UDF; the gate costs one corpus scan. The demo
    list is tiny; a real deployment swaps in a broadcast DataFrame
    exactly like the curation keep-list gate."""
    d = _docs(spark, sf_dir)
    norm = F.translate(F.lower(F.coalesce(F.col("text"), F.lit(""))),
                       LEET_SRC, LEET_DST)
    toks = F.filter(F.split(norm, r"\s+"), lambda t: t != "")
    hits = F.filter(toks, lambda t: t.isin(*BLOCKLIST_TERMS))
    return d.select(
        "doc_id",
        F.size(hits).cast("long").alias("n_hits"),
        F.array_sort(F.array_distinct(hits)).alias("terms_hit"),
        (F.size(hits) == 0).cast("int").alias("keep"))


def _sql_text_blocklist() -> str:
    terms = ", ".join(f"'{t}'" for t in BLOCKLIST_TERMS)
    return f"""
WITH norm AS (
  SELECT doc_id,
         translate(lower(coalesce(text, '')),
                   '{LEET_SRC}', '{LEET_DST}') AS t
  FROM documents),
hits AS (
  SELECT doc_id,
         list_filter(list_filter(string_split_regex(t, '\\s+'),
                                 x -> x <> ''),
                     x -> x IN ({terms})) AS h
  FROM norm)
SELECT doc_id, CAST(len(h) AS BIGINT) AS n_hits,
       list_sort(list_distinct(h)) AS terms_hit,
       CAST(CASE WHEN len(h) = 0 THEN 1 ELSE 0 END AS INT) AS keep
FROM hits
"""


def q_stats_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomalous-day detection over the daily order series [K: the
    median/MAD robust fence applied to the TIME axis — the ops read
    that catches ingest outages (collapsed days) and bot storms
    (spiked days) that a mean/stddev fence misses because the anomaly
    itself inflates the stddev]: exact doubled/quadrupled-integer
    median and MAD (the rel_outliers idiom), a cross-multiplied
    |x - med| > 3*1.4826*MAD fence, and per flagged day the direction
    (spike/collapse) plus the deviation in exact per-mille of the
    median. The kg_degree_anomaly shape pointed at the calendar.

    Shape: one daily hash agg, two O(1) percentile aggs broadcast
    back, one map-side fence. No windows, no sort."""
    o = _tbl(spark, sf_dir, "orders")
    daily = (o.select(F.to_date("o_orderdate").alias("day"))
             .groupBy("day")
             .agg(F.count(F.lit(1)).cast("long").alias("x")))
    v = daily.withColumn("v2", (F.col("x") * 2).cast("long"))
    m1 = v.agg(F.expr("CAST(percentile(v2, 0.5) AS BIGINT)")
               .alias("med2"),
               F.count(F.lit(1)).cast("long").alias("n_days"))
    dv = (v.crossJoin(F.broadcast(m1))
          .withColumn("dev2", F.abs(F.col("v2") - F.col("med2"))))
    m2 = dv.agg(F.expr("CAST(percentile(2 * dev2, 0.5) AS BIGINT)")
                .alias("mad4"))
    return (dv.crossJoin(F.broadcast(m2))
            .filter(F.expr("dev2 * 10000 > 22239 * mad4"))
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    "x",
                    F.col("med2").cast("long").alias("med2"),
                    F.col("mad4").cast("long").alias("mad4"),
                    F.when(F.col("v2") > F.col("med2"), F.lit("spike"))
                    .otherwise(F.lit("collapse")).alias("direction"),
                    F.expr("dev2 * 1000 DIV med2").cast("long")
                    .alias("dev_permille"),
                    "n_days"))


def _sql_stats_anomaly_days() -> str:
    return """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1),
v AS (SELECT day, x, CAST(x * 2 AS BIGINT) AS v2 FROM daily),
m1 AS (SELECT CAST(quantile_cont(v2, 0.5) AS BIGINT) AS med2,
              CAST(count(*) AS BIGINT) AS n_days FROM v),
dv AS (
  SELECT day, x, v2, abs(v2 - med2) AS dev2, med2, n_days
  FROM v CROSS JOIN m1),
m2 AS (SELECT CAST(quantile_cont(2 * dev2, 0.5) AS BIGINT) AS mad4
       FROM dv)
SELECT strftime(day, '%Y-%m-%d') AS day, x,
       CAST(med2 AS BIGINT) AS med2,
       CAST(mad4 AS BIGINT) AS mad4,
       CASE WHEN v2 > med2 THEN 'spike' ELSE 'collapse' END
         AS direction,
       CAST(dev2 * 1000 // med2 AS BIGINT) AS dev_permille,
       n_days
FROM dv CROSS JOIN m2
WHERE dev2 * 10000 > 22239 * mad4
"""


TRIPLET_MARGIN_PPM = 50000
TRIPLET_N_PLANES = 3


def q_sim_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-example triplet mining over the labeled embedding corpus
    (operators/simsearch.py:triplet_mining) [K: batch-hard mining of
    metric-learning — per anchor the hardest same-label positive
    (lowest cosine) and hardest different-label negative (highest
    cosine) within the anchor's LSH bucket, plus the margin-violation
    flag that selects gradient-carrying triplets]. Paired: the 3
    hyperplanes are deterministic constants, so DuckDB recomputes the
    identical sign buckets, round-6 cosines, exact ppm integers, and
    the identical (cos, id) tiebreaks."""
    from ..operators.simsearch import triplet_mining
    return triplet_mining(_tbl(spark, sf_dir, "embeddings"),
                          n_planes=TRIPLET_N_PLANES,
                          margin_ppm=TRIPLET_MARGIN_PPM)


def _sql_sim_triplet_mining() -> str:
    from ..operators.simsearch import hyperplanes
    planes = hyperplanes(TRIPLET_N_PLANES, 64)
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(nv, {_sql_vec_lit(p)}) >= 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes))
    return f"""
WITH v AS (SELECT vec_id AS nid, cast(embedding AS DOUBLE[]) AS nv,
                  label FROM embeddings),
b AS (SELECT nid, nv, label, {bucket} AS bucket FROM v),
pairs AS (
  SELECT a.nid AS aid, a.label AS albl, c.nid AS cid,
         c.label AS clbl,
         CAST(round(round(list_cosine_similarity(a.nv, c.nv), 6)
                    * 1000000, 0) AS BIGINT) AS cos_ppm
  FROM b a JOIN b c USING (bucket)
  WHERE a.nid <> c.nid),
pos AS (
  SELECT aid, cid AS pos_id, cos_ppm AS pos_ppm FROM (
    SELECT aid, cid, cos_ppm,
           row_number() OVER (PARTITION BY aid
                              ORDER BY cos_ppm ASC, cid ASC) AS rk
    FROM pairs WHERE albl = clbl) WHERE rk = 1),
neg AS (
  SELECT aid, cid AS neg_id, cos_ppm AS neg_ppm FROM (
    SELECT aid, cid, cos_ppm,
           row_number() OVER (PARTITION BY aid
                              ORDER BY cos_ppm DESC, cid ASC) AS rk
    FROM pairs WHERE albl <> clbl) WHERE rk = 1),
cnt AS (
  SELECT aid, max(albl) AS label,
         CAST(sum(CASE WHEN albl = clbl THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pos_cand,
         CAST(sum(CASE WHEN albl <> clbl THEN 1 ELSE 0 END) AS BIGINT)
           AS n_neg_cand
  FROM pairs GROUP BY aid)
SELECT cnt.aid AS vec_id, cnt.label, pos.pos_id, pos.pos_ppm,
       neg.neg_id, neg.neg_ppm, cnt.n_pos_cand, cnt.n_neg_cand,
       CAST(CASE WHEN neg.neg_ppm + {TRIPLET_MARGIN_PPM} > pos.pos_ppm
            THEN 1 ELSE 0 END AS INT) AS violation
FROM cnt JOIN pos USING (aid) JOIN neg USING (aid)
"""


def q_stats_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test: weekday vs weekend daily order
    volume [K: the standard nonparametric two-sample test — unlike
    stats_welch's t-test it makes no normality assumption, which is
    the right tool for heavy-tailed daily counts; ops teams run it to
    answer 'is weekend traffic a genuinely different distribution or
    just noisier?']. Exact DOUBLED integer rank sums (average ranks
    are half-integers, so everything carries a factor 2), the exact
    tie-correction term sum(t^3 - t), and the normal-approximation
    z-score with ONE double sqrt + division at the very end (round 6)
    — identical integer inputs make the double math engine-identical.
    Weekend = ISO day-of-week in {6, 7} (Spark weekday() >= 5,
    DuckDB isodow >= 6 — both Monday-anchored, no locale hazard).

    Shape: one distributed daily hash agg (calendar-bounded output),
    one distinct-count-value hash agg, a triangular broadcast
    self-join of that tiny value table for cumulative below-counts
    (the text_gini idiom — no partitionless window anywhere), and a
    1-row final agg. At 10^12 turns only the first agg touches the
    corpus."""
    o = _tbl(spark, sf_dir, "orders")
    daily = (o.select(F.to_date("o_orderdate").alias("day"))
             .groupBy("day")
             .agg(F.count(F.lit(1)).cast("long").alias("x")))
    lab = daily.select(
        "x", (F.expr("weekday(day)") >= 5).cast("int").alias("wk"))
    g = lab.groupBy("x").agg(
        F.sum(F.when(F.col("wk") == 0, 1).otherwise(0)).cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("wk") == 1, 1).otherwise(0)).cast("long")
        .alias("c2"))
    cum = (g.alias("a").join(F.broadcast(g.alias("c")),
                             F.col("c.x") < F.col("a.x"), "left")
           .groupBy(F.col("a.x").alias("x"))
           .agg(F.max(F.col("a.c1")).cast("long").alias("c1"),
                F.max(F.col("a.c2")).cast("long").alias("c2"),
                F.coalesce(F.sum(F.col("c.c1") + F.col("c.c2")),
                           F.lit(0)).cast("long").alias("below")))
    # doubled avg rank for value x: 2*below + t + 1, t = c1 + c2
    stats = cum.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
        F.sum(F.col("c1") * (2 * F.col("below") + F.col("c1")
                             + F.col("c2") + 1)).cast("long")
        .alias("r1_x2"),
        F.sum((F.col("c1") + F.col("c2")) * (F.col("c1") + F.col("c2"))
              * (F.col("c1") + F.col("c2"))
              - (F.col("c1") + F.col("c2"))).cast("long")
        .alias("tie_term"))
    return stats.select(
        "n1", "n2",
        (F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)).cast("long")
        .alias("u1_x2"),
        (2 * F.col("n1") * F.col("n2")
         - (F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)))
        .cast("long").alias("u2_x2"),
        F.col("tie_term").alias("tie_term"),
        F.round(F.when(
            F.col("n1") * F.col("n2")
            * ((F.col("n1") + F.col("n2") + 1)
               * (F.col("n1") + F.col("n2"))
               * (F.col("n1") + F.col("n2") - 1) - F.col("tie_term"))
            > 0,
            ((F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1))
             .cast("double") - (F.col("n1") * F.col("n2"))
             .cast("double"))
            / (F.lit(2.0) * F.sqrt(
                (F.col("n1") * F.col("n2")
                 * ((F.col("n1") + F.col("n2") + 1)
                    * (F.col("n1") + F.col("n2"))
                    * (F.col("n1") + F.col("n2") - 1)
                    - F.col("tie_term"))).cast("double")
                / (F.lit(12.0)
                   * (F.col("n1") + F.col("n2")).cast("double")
                   * (F.col("n1") + F.col("n2") - 1).cast("double"))))
        ), 6).alias("z"))


def _sql_stats_mannwhitney() -> str:
    return """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1),
lab AS (
  SELECT x, CAST(CASE WHEN isodow(day) >= 6 THEN 1 ELSE 0 END AS INT)
           AS wk
  FROM daily),
g AS (
  SELECT x,
         CAST(sum(CASE WHEN wk = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN wk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM lab GROUP BY 1),
cum AS (
  SELECT a.x, max(a.c1) AS c1, max(a.c2) AS c2,
         CAST(coalesce(sum(c.c1 + c.c2), 0) AS BIGINT) AS below
  FROM g a LEFT JOIN g c ON c.x < a.x
  GROUP BY a.x),
s AS (
  SELECT CAST(sum(c1) AS BIGINT) AS n1,
         CAST(sum(c2) AS BIGINT) AS n2,
         CAST(sum(c1 * (2 * below + c1 + c2 + 1)) AS BIGINT) AS r1_x2,
         CAST(sum((c1 + c2) * (c1 + c2) * (c1 + c2) - (c1 + c2))
              AS BIGINT) AS tie_term
  FROM cum)
SELECT n1, n2,
       CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
       CAST(2 * n1 * n2 - (r1_x2 - n1 * (n1 + 1)) AS BIGINT) AS u2_x2,
       tie_term,
       round(CASE WHEN n1 * n2 * ((n1 + n2 + 1) * (n1 + n2)
                                  * (n1 + n2 - 1) - tie_term) > 0
             THEN (CAST(r1_x2 - n1 * (n1 + 1) AS DOUBLE)
                   - CAST(n1 * n2 AS DOUBLE))
                  / (2.0 * sqrt(
                      CAST(n1 * n2 * ((n1 + n2 + 1) * (n1 + n2)
                                      * (n1 + n2 - 1) - tie_term)
                           AS DOUBLE)
                      / (12.0 * CAST(n1 + n2 AS DOUBLE)
                         * CAST(n1 + n2 - 1 AS DOUBLE))))
             ELSE NULL END, 6) AS z
FROM s
"""


def q_stats_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test + Theil-Sen slope over the daily order
    series [K: THE standard monotonic-trend pair for noisy time
    series — MK gives a distribution-free 'is there a trend' z-score,
    Theil-Sen a slope robust to 29% outliers; capacity planners run
    exactly this pair on daily volume]. S = #concordant - #discordant
    pairs (exact BIGINT), tie-corrected variance numerator
    n(n-1)(2n+5) - sum t(t-1)(2t+5) (exact, /18 deferred into the one
    final double sqrt), continuity-corrected z (round 6), and the
    doubled-integer median (percentile idiom) of per-pair slopes
    quantized to exact ppm-per-day BIGINTs — the quantization is the
    documented honesty trade: exact rational medians need cross-
    multiplied comparisons, and 1e-6/day resolution is far below any
    actionable trend.

    Shape: one distributed daily hash agg (calendar-bounded output),
    one triangular self-join of that tiny table (n^2/2 pairs of a
    ~thousand-row series — broadcast-sized, NOT corpus-sized), two
    O(1) aggs. At 10^12 turns only the first agg touches the corpus."""
    o = _tbl(spark, sf_dir, "orders")
    daily = (o.select(F.to_date("o_orderdate").alias("day"))
             .groupBy("day")
             .agg(F.count(F.lit(1)).cast("long").alias("x")))
    d = daily.select(
        F.datediff("day", F.lit("1970-01-01").cast("date"))
        .cast("long").alias("d"), "x")
    pr = (d.alias("a").join(F.broadcast(d.alias("b")),
                            F.col("a.d") < F.col("b.d"))
          .select((F.col("b.x") - F.col("a.x")).alias("dx"),
                  (F.col("b.d") - F.col("a.d")).alias("dd")))
    slope = pr.select(F.expr(
        "CAST(round(CAST(dx AS DOUBLE) * 1000000.0"
        " / CAST(dd AS DOUBLE), 0) AS BIGINT)").alias("s_ppm"))
    med = slope.agg(F.expr(
        "CAST(percentile(s_ppm * 2, 0.5) AS BIGINT)")
        .alias("slope_med2_ppm"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"))
    sstat = pr.agg(
        (F.sum(F.when(F.col("dx") > 0, 1).otherwise(0))
         - F.sum(F.when(F.col("dx") < 0, 1).otherwise(0)))
        .cast("long").alias("s"))
    ties = (d.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("t"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_values"),
                 F.sum("t").cast("long").alias("n_days"),
                 F.sum(F.col("t") * (F.col("t") - 1)
                       * (2 * F.col("t") + 5)).cast("long")
                 .alias("tie18")))
    base = (ties.crossJoin(F.broadcast(sstat))
            .crossJoin(F.broadcast(med))
            .withColumn("var18",
                        (F.col("n_days") * (F.col("n_days") - 1)
                         * (2 * F.col("n_days") + 5)
                         - F.col("tie18")).cast("long")))
    return base.select(
        "n_days", "n_values", "n_pairs", "s", "var18",
        "slope_med2_ppm",
        F.round(F.when(F.col("var18") <= 0, None)
                .when(F.col("s") > 0,
                      (F.col("s") - 1).cast("double")
                      / F.sqrt(F.col("var18").cast("double") / 18.0))
                .when(F.col("s") < 0,
                      (F.col("s") + 1).cast("double")
                      / F.sqrt(F.col("var18").cast("double") / 18.0))
                .otherwise(0.0), 6).alias("z"))


def _sql_stats_trend() -> str:
    return """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1),
d AS (
  SELECT CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT) AS d,
         x
  FROM daily),
pr AS (
  SELECT b.x - a.x AS dx, b.d - a.d AS dd
  FROM d a JOIN d b ON a.d < b.d),
slope AS (
  SELECT CAST(round(CAST(dx AS DOUBLE) * 1000000.0
                    / CAST(dd AS DOUBLE), 0) AS BIGINT) AS s_ppm
  FROM pr),
med AS (
  SELECT CAST(quantile_cont(s_ppm * 2, 0.5) AS BIGINT)
           AS slope_med2_ppm,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM slope),
sstat AS (
  SELECT CAST(sum(CASE WHEN dx > 0 THEN 1 ELSE 0 END)
              - sum(CASE WHEN dx < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS s
  FROM pr),
ties AS (
  SELECT CAST(count(*) AS BIGINT) AS n_values,
         CAST(sum(t) AS BIGINT) AS n_days,
         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
  FROM (SELECT x, CAST(count(*) AS BIGINT) AS t FROM d GROUP BY 1)),
base AS (
  SELECT n_days, n_values, n_pairs, s,
         CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie18
              AS BIGINT) AS var18,
         slope_med2_ppm
  FROM ties CROSS JOIN sstat CROSS JOIN med)
SELECT n_days, n_values, n_pairs, s, var18, slope_med2_ppm,
       round(CASE WHEN var18 <= 0 THEN NULL
             WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
                             / sqrt(CAST(var18 AS DOUBLE) / 18.0)
             WHEN s < 0 THEN CAST(s + 1 AS DOUBLE)
                             / sqrt(CAST(var18 AS DOUBLE) / 18.0)
             ELSE 0.0 END, 6) AS z
FROM base
"""


# ASCII punctuation, brackets escaped for both RE2 (DuckDB) and Java
# (Spark) character-class syntax.
_PUNCT_CC = r"[!-/:-@\[-`{-~]"


def q_text_class_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-CLASS Shannon entropy per document [K: the gibberish
    / keyboard-mash / base64-blob detector quality pipelines run —
    natural prose mixes lowercase, spaces and punctuation at a
    characteristic ~0.9-1.6 bits over the 6 ASCII classes, while
    hex dumps, minified JS and repeated-char spam collapse toward one
    class]: per doc the 6 class counts (lower / upper / digit /
    whitespace / ASCII-punct / other), the class entropy in bits, the
    dominant-class ratio in exact ppm, and a deterministic suspect
    flag (entropy < 0.6 bits over >= 20 chars — prose sits well above, one-class collapse well below). The entropy is a
    FIXED-ORDER sum of 6 closed-form terms — no fold over a variable-
    length aggregation, so there is no cross-engine float-order
    hazard; class counts come from regexp_replace lengths (JVM regex,
    map-only).

    Shape: pure map-side projection — one corpus scan, zero shuffle,
    zero UDF. The 100-TB cost is the scan itself."""
    d = _docs(spark, sf_dir)
    t = F.coalesce(F.col("text"), F.lit(""))

    def cnt(rx: str):
        return (F.length(t)
                - F.length(F.regexp_replace(t, rx, ""))).cast("long")

    e = (d.select(
        "doc_id", F.length(t).cast("long").alias("n_chars"),
        cnt("[a-z]").alias("n_lower"), cnt("[A-Z]").alias("n_upper"),
        cnt("[0-9]").alias("n_digit"),
        cnt(r"[ \t\n\r]").alias("n_space"),
        cnt(_PUNCT_CC).alias("n_punct"))
        .withColumn("n_other",
                    (F.col("n_chars") - F.col("n_lower")
                     - F.col("n_upper") - F.col("n_digit")
                     - F.col("n_space") - F.col("n_punct"))
                    .cast("long")))

    def term(c: str):
        p = F.col(c).cast("double") / F.col("n_chars").cast("double")
        return F.when(F.col(c) > 0, -p * F.log2(p)).otherwise(0.0)

    classes = ["n_lower", "n_upper", "n_digit", "n_space", "n_punct",
               "n_other"]
    ent = term(classes[0])
    for c in classes[1:]:
        ent = ent + term(c)
    return (e.withColumn(
        "entropy",
        F.when(F.col("n_chars") > 0, F.round(ent, 6)))
        .withColumn(
            "dom_ppm",
            F.when(F.col("n_chars") > 0, F.expr(
                "greatest(n_lower, n_upper, n_digit, n_space,"
                " n_punct, n_other) * 1000000 DIV n_chars"))
            .cast("long"))
        .withColumn(
            "is_suspect",
            ((F.col("n_chars") >= 20) & (F.col("entropy") < 0.6))
            .cast("int")))


def _sql_text_class_entropy() -> str:
    punct = _PUNCT_CC.replace("'", "''")
    terms = " + ".join(
        f"(CASE WHEN {c} > 0 THEN -(CAST({c} AS DOUBLE)"
        f" / CAST(n_chars AS DOUBLE))"
        f" * log2(CAST({c} AS DOUBLE) / CAST(n_chars AS DOUBLE))"
        f" ELSE 0.0 END)"
        for c in ("n_lower", "n_upper", "n_digit", "n_space",
                  "n_punct", "n_other"))
    return f"""
WITH t AS (SELECT doc_id, coalesce(text, '') AS s FROM documents),
c AS (
  SELECT doc_id, CAST(length(s) AS BIGINT) AS n_chars,
         CAST(length(s) - length(regexp_replace(s, '[a-z]', '', 'g'))
              AS BIGINT) AS n_lower,
         CAST(length(s) - length(regexp_replace(s, '[A-Z]', '', 'g'))
              AS BIGINT) AS n_upper,
         CAST(length(s) - length(regexp_replace(s, '[0-9]', '', 'g'))
              AS BIGINT) AS n_digit,
         CAST(length(s) - length(regexp_replace(s, '[ \\t\\n\\r]', '',
                                                'g'))
              AS BIGINT) AS n_space,
         CAST(length(s) - length(regexp_replace(s, '{punct}', '', 'g'))
              AS BIGINT) AS n_punct
  FROM t),
e AS (
  SELECT doc_id, n_chars, n_lower, n_upper, n_digit, n_space, n_punct,
         CAST(n_chars - n_lower - n_upper - n_digit - n_space - n_punct
              AS BIGINT) AS n_other
  FROM c)
SELECT doc_id, n_chars, n_lower, n_upper, n_digit, n_space, n_punct,
       n_other,
       CASE WHEN n_chars > 0 THEN round({terms}, 6) END AS entropy,
       CASE WHEN n_chars > 0 THEN CAST(
         greatest(n_lower, n_upper, n_digit, n_space, n_punct, n_other)
         * 1000000 // n_chars AS BIGINT) END AS dom_ppm,
       CAST(CASE WHEN n_chars >= 20
                  AND round({terms}, 6) < 0.6
            THEN 1 ELSE 0 END AS INT) AS is_suspect
FROM e
"""


def q_kg_cardinality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-predicate cardinality profile of the materialized KG [K:
    the OWL-flavored schema QA every KG consumer runs before writing
    queries — is `mentions` one-to-many? is `replies_to` functional
    (<=1 object per subject)? is anything inverse-functional (a
    natural key)? — plus the fan-out maxima that predict join skew]:
    per predicate the triple / distinct-subject / distinct-object
    counts, max out-fan and in-fan, exact mean out-fan in ppm, and
    the functional / inverse_functional flags.

    Shape: one (pred,subj) and one (pred,obj) hash agg (both partial-
    aggregating map-side), re-aggregated per predicate, joined on the
    tiny predicate key — output is predicate-cardinality-sized. The
    fan maxima are exactly the skew signal rel_salted_agg defuses at
    execution time; this op is how you DISCOVER which predicate needs
    the salt at 10^12 triples."""
    t = q_kg_triples(spark, sf_dir)
    out = (t.groupBy("pred", "subj")
           .agg(F.count(F.lit(1)).cast("long").alias("fan"))
           .groupBy("pred")
           .agg(F.count(F.lit(1)).cast("long").alias("n_subj"),
                F.sum("fan").cast("long").alias("n_triples"),
                F.max("fan").cast("long").alias("max_out")))
    inn = (t.groupBy("pred", "obj")
           .agg(F.count(F.lit(1)).cast("long").alias("fan"))
           .groupBy("pred")
           .agg(F.count(F.lit(1)).cast("long").alias("n_obj"),
                F.max("fan").cast("long").alias("max_in")))
    return (out.join(inn, "pred")
            .select("pred", "n_triples", "n_subj", "n_obj",
                    "max_out", "max_in",
                    F.expr("n_triples * 1000000 DIV n_subj")
                    .cast("long").alias("mean_out_ppm"),
                    (F.col("max_out") == 1).cast("int")
                    .alias("functional"),
                    (F.col("max_in") == 1).cast("int")
                    .alias("inverse_functional")))


def _sql_kg_cardinality_profile() -> str:
    return f"""
WITH triples AS ({_sql_kg_triples_body()}),
o AS (
  SELECT pred, CAST(count(*) AS BIGINT) AS n_subj,
         CAST(sum(fan) AS BIGINT) AS n_triples,
         CAST(max(fan) AS BIGINT) AS max_out
  FROM (SELECT pred, subj, CAST(count(*) AS BIGINT) AS fan
        FROM triples GROUP BY 1, 2) GROUP BY pred),
i AS (
  SELECT pred, CAST(count(*) AS BIGINT) AS n_obj,
         CAST(max(fan) AS BIGINT) AS max_in
  FROM (SELECT pred, obj, CAST(count(*) AS BIGINT) AS fan
        FROM triples GROUP BY 1, 2) GROUP BY pred)
SELECT pred, n_triples, n_subj, n_obj, max_out, max_in,
       CAST(n_triples * 1000000 // n_subj AS BIGINT) AS mean_out_ppm,
       CAST(CASE WHEN max_out = 1 THEN 1 ELSE 0 END AS INT)
         AS functional,
       CAST(CASE WHEN max_in = 1 THEN 1 ELSE 0 END AS INT)
         AS inverse_functional
FROM o JOIN i USING (pred)
"""


def q_curation_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning phase assignment over the document corpus
    [K: curriculum training feeds easy documents first — the standard
    proxy orders by surface difficulty; phases are corpus quartiles
    of that score]: difficulty = mean-word-length ppm + digit-ratio
    ppm (exact integers, map-only), quartile boundaries via EXACT
    NESTED MEDIANS (doubled-integer percentile of the full corpus,
    then of the <=median and >=median halves — three O(1)-row aggs,
    no interpolating quantile at .25/.75 whose lerp formula is a
    cross-engine float hazard), and per doc the 1..4 phase plus the
    phase's doc/token totals a scheduler needs.

    Shape: one map-side score projection, three 1-row percentile
    aggs broadcast back, one map-side CASE, one 4-row phase agg
    broadcast-joined back. Only the score projection touches the
    corpus; nothing shuffles by doc."""
    d = _docs(spark, sf_dir)
    t = F.coalesce(F.col("text"), F.lit(""))
    toks = F.filter(F.split(t, r"\s+"), lambda x: x != "")
    base = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.aggregate(toks, F.lit(0).cast("long"),
                    lambda acc, x: acc + F.length(x)).alias("tok_chars"),
        F.length(t).cast("long").alias("n_chars"),
        (F.length(t) - F.length(F.regexp_replace(t, "[0-9]", "")))
        .cast("long").alias("n_digit"))
    sc = base.select(
        "doc_id", "n_tokens",
        (F.when(F.col("n_tokens") > 0,
                F.expr("tok_chars * 1000000 DIV n_tokens"))
         .otherwise(F.lit(0))
         + F.when(F.col("n_chars") > 0,
                  F.expr("n_digit * 1000000 DIV n_chars"))
         .otherwise(F.lit(0))).cast("long").alias("difficulty"))
    v = sc.withColumn("v", (F.col("difficulty") * 2).cast("long"))
    m = v.agg(F.expr("CAST(percentile(v, 0.5) AS BIGINT)").alias("m"))
    vm = v.crossJoin(F.broadcast(m))
    q13 = vm.agg(
        F.expr("CAST(percentile(CASE WHEN v <= m THEN v END, 0.5)"
               " AS BIGINT)").alias("q1"),
        F.expr("CAST(percentile(CASE WHEN v >= m THEN v END, 0.5)"
               " AS BIGINT)").alias("q3"))
    ph = (vm.crossJoin(F.broadcast(q13))
          .select("doc_id", "n_tokens", "difficulty",
                  (F.lit(1) + (F.col("v") > F.col("q1")).cast("int")
                   + (F.col("v") > F.col("m")).cast("int")
                   + (F.col("v") > F.col("q3")).cast("int"))
                  .cast("int").alias("phase")))
    tot = (ph.groupBy("phase")
           .agg(F.count(F.lit(1)).cast("long").alias("phase_docs"),
                F.sum("n_tokens").cast("long").alias("phase_tokens")))
    return (ph.join(F.broadcast(tot), "phase")
            .select("doc_id", "n_tokens", "difficulty", "phase",
                    "phase_docs", "phase_tokens"))


def _sql_curation_curriculum() -> str:
    return """
WITH d AS (SELECT doc_id, coalesce(text, '') AS s FROM documents),
base AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(s, '\\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens,
         CAST(coalesce(list_sum(list_transform(
               list_filter(string_split_regex(s, '\\s+'),
                           x -> x <> ''),
               x -> CAST(length(x) AS BIGINT))), 0) AS BIGINT)
           AS tok_chars,
         CAST(length(s) AS BIGINT) AS n_chars,
         CAST(length(s) - length(regexp_replace(s, '[0-9]', '', 'g'))
              AS BIGINT) AS n_digit
  FROM d),
sc AS (
  SELECT doc_id, n_tokens,
         CAST((CASE WHEN n_tokens > 0
                    THEN tok_chars * 1000000 // n_tokens ELSE 0 END)
              + (CASE WHEN n_chars > 0
                      THEN n_digit * 1000000 // n_chars ELSE 0 END)
              AS BIGINT) AS difficulty
  FROM base),
v AS (SELECT doc_id, n_tokens, difficulty,
             CAST(difficulty * 2 AS BIGINT) AS v FROM sc),
m AS (SELECT CAST(quantile_cont(v, 0.5) AS BIGINT) AS m FROM v),
q13 AS (
  SELECT CAST(quantile_cont(CASE WHEN v <= m THEN v END, 0.5)
              AS BIGINT) AS q1,
         CAST(quantile_cont(CASE WHEN v >= m THEN v END, 0.5)
              AS BIGINT) AS q3
  FROM v CROSS JOIN m),
ph AS (
  SELECT doc_id, n_tokens, difficulty,
         CAST(1 + (CASE WHEN v > q1 THEN 1 ELSE 0 END)
                + (CASE WHEN v > m THEN 1 ELSE 0 END)
                + (CASE WHEN v > q3 THEN 1 ELSE 0 END) AS INT) AS phase
  FROM v CROSS JOIN m CROSS JOIN q13),
tot AS (
  SELECT phase, CAST(count(*) AS BIGINT) AS phase_docs,
         CAST(sum(n_tokens) AS BIGINT) AS phase_tokens
  FROM ph GROUP BY 1)
SELECT doc_id, n_tokens, difficulty, phase, phase_docs, phase_tokens
FROM ph JOIN tot USING (phase)
"""


def q_stats_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test across day-of-week treatments in weekly
    blocks [K: the repeated-measures nonparametric ANOVA — 'does
    day-of-week matter once week-to-week level shifts are blocked
    out?'; the blocked design removes the trend/seasonality that
    would contaminate a pooled Kruskal-Wallis]. The daily series is
    CALENDAR GAP-FILLED (zero-order days count 0 — sequence() /
    generate_series, calendar-bounded) so every interior 7-day block
    is complete; edge-partial blocks are dropped. Ranks within each
    block are DOUBLED average midranks (2*minrank + ties - 1, exact
    integers from two block-partitioned windows — bounded partitions
    of 7, the gate-safe window shape). Emits one row per weekday:
    doubled rank sum, mean rank in exact ppm, plus the classic
    Q = 12/(nk(k+1)) * sum R_j^2 - 3n(k+1) (computed from exact
    integer sums, one double division, round 6) and the tie-
    correction factor C = 1 - sum(t^3-t)/(n k(k^3-k)) as exact ppm.

    Shape: one distributed daily hash agg, a calendar-bounded
    gap-fill explode, two bounded-partition windows, one k-row agg.
    Only the first agg touches the corpus. Block key is epoch-day DIV
    7 (deterministic 7-day windows anchored 1970-01-01, a Thursday —
    no ISO week-year cross-engine hazard)."""
    o = _tbl(spark, sf_dir, "orders")
    daily = (o.select(F.to_date("o_orderdate").alias("day"))
             .groupBy("day")
             .agg(F.count(F.lit(1)).cast("long").alias("x")))
    span = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cal = span.select(F.explode(F.expr("sequence(d0, d1)")).alias("day"))
    filled = (cal.join(daily, "day", "left")
              .select("day", F.coalesce("x", F.lit(0)).cast("long")
                      .alias("x"),
                      (F.datediff("day",
                                  F.lit("1970-01-01").cast("date"))
                       .cast("long")).alias("ed"))
              .withColumn("blk", F.expr("ed DIV 7").cast("long"))
              .withColumn("wd", F.expr("ed % 7").cast("int")))
    full = (filled.groupBy("blk")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
            .filter(F.col("c") == 7).select("blk"))
    fb = filled.join(full, "blk")
    wmin = Window.partitionBy("blk").orderBy("x")
    wtie = Window.partitionBy("blk", "x")
    ranked = (fb.withColumn("minrk", F.rank().over(wmin))
              .withColumn("t", F.count(F.lit(1)).over(wtie))
              .withColumn("r2", (2 * F.col("minrk") + F.col("t") - 1)
                          .cast("long")))
    tie = (fb.groupBy("blk", "x")
           .agg(F.count(F.lit(1)).cast("long").alias("t"))
           .agg(F.sum(F.col("t") * F.col("t") * F.col("t")
                      - F.col("t")).cast("long").alias("tie_sum"),
                F.countDistinct("blk").cast("long").alias("n_blocks")))
    per = (ranked.groupBy("wd")
           .agg(F.sum("r2").cast("long").alias("r2_sum")))
    qsum = per.agg(F.sum(F.col("r2_sum") * F.col("r2_sum"))
                   .cast("long").alias("sq"))
    return (per.crossJoin(F.broadcast(tie))
            .crossJoin(F.broadcast(qsum))
            .select("wd", "r2_sum",
                    F.expr("r2_sum * 1000000 DIV (2 * n_blocks)")
                    .cast("long").alias("mean_rank_ppm"),
                    F.col("n_blocks"),
                    F.round(F.lit(3.0) * F.col("sq").cast("double")
                            / (F.col("n_blocks") * 56).cast("double")
                            - (3 * F.col("n_blocks") * 8).cast("double"),
                            6).alias("q_stat"),
                    (F.lit(1000000)
                     - F.expr("tie_sum * 1000000"
                              " DIV (n_blocks * 7 * 336)"))
                    .cast("long").alias("tie_c_ppm")))


def _sql_stats_friedman() -> str:
    return """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1),
span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
cal AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
           AS day
  FROM span),
filled AS (
  SELECT c.day, CAST(coalesce(d.x, 0) AS BIGINT) AS x,
         CAST(datediff('day', DATE '1970-01-01', c.day) AS BIGINT)
           AS ed
  FROM cal c LEFT JOIN daily d ON d.day = c.day),
blocked AS (
  SELECT x, ed // 7 AS blk, CAST(ed % 7 AS INT) AS wd FROM filled),
full_blocks AS (
  SELECT blk FROM blocked GROUP BY blk HAVING count(*) = 7),
fb AS (SELECT b.* FROM blocked b JOIN full_blocks USING (blk)),
ranked AS (
  SELECT wd,
         CAST(2 * rank() OVER (PARTITION BY blk ORDER BY x)
              + count(*) OVER (PARTITION BY blk, x) - 1 AS BIGINT)
           AS r2
  FROM fb),
tie AS (
  SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie_sum,
         CAST(count(DISTINCT blk) AS BIGINT) AS n_blocks
  FROM (SELECT blk, x, CAST(count(*) AS BIGINT) AS t
        FROM fb GROUP BY 1, 2)),
per AS (
  SELECT wd, CAST(sum(r2) AS BIGINT) AS r2_sum
  FROM ranked GROUP BY wd),
qsum AS (SELECT CAST(sum(r2_sum * r2_sum) AS BIGINT) AS sq FROM per)
SELECT wd, r2_sum,
       CAST(r2_sum * 1000000 // (2 * n_blocks) AS BIGINT)
         AS mean_rank_ppm,
       n_blocks,
       round(3.0 * CAST(sq AS DOUBLE)
             / CAST(n_blocks * 56 AS DOUBLE)
             - CAST(3 * n_blocks * 8 AS DOUBLE), 6) AS q_stat,
       CAST(1000000 - tie_sum * 1000000 // (n_blocks * 7 * 336)
            AS BIGINT) AS tie_c_ppm
FROM per CROSS JOIN tie CROSS JOIN qsum
"""


def q_sim_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness audit of the kNN graph [K: the curse-of-dimensionality
    read — in high-dim embedding spaces a few 'hub' points appear in
    everyone's top-k while antihubs appear in nobody's; a right-skewed
    k-occurrence distribution degrades kNN search/cluster quality and
    is THE standard diagnostic (Radovanovic et al.)]: the k-occurrence
    histogram (in-degree over kNN edges, zero-in-degree nodes
    included) with the distribution's mean in exact ppm and its
    moment skewness from EXACT integer power sums (n^2*S3 - 3n*S1*S2
    + 2*S1^3 over the variance^1.5, written v*sqrt(v) — sqrt is
    IEEE-correctly-rounded where libm pow(x,1.5) is not, a
    cross-engine hash hazard — round 6).

    Shape: the kNN graph's bucketed join, one in-degree hash agg, a
    left join from the node list (antihubs count), one histogram agg,
    two O(1)-row moment aggs broadcast back. Never all-pairs."""
    from ..operators.simsearch import knn_graph
    vecs = _tbl(spark, sf_dir, "embeddings")
    g = knn_graph(vecs, k=KNNG_K, n_planes=KNNG_N_PLANES)
    indeg = g.groupBy("dst").agg(F.count(F.lit(1)).cast("long")
                                 .alias("k_occ"))
    occ = (vecs.select(F.col("vec_id").alias("dst"))
           .join(indeg, "dst", "left")
           .select(F.coalesce("k_occ", F.lit(0)).cast("long")
                   .alias("k_occ")))
    mom = occ.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("k_occ").cast("long").alias("s1"),
        F.sum(F.col("k_occ") * F.col("k_occ")).cast("long").alias("s2"),
        F.sum(F.col("k_occ") * F.col("k_occ") * F.col("k_occ"))
        .cast("long").alias("s3"),
        F.max("k_occ").cast("long").alias("max_k_occ"))
    hist = occ.groupBy("k_occ").agg(F.count(F.lit(1)).cast("long")
                                    .alias("n_nodes"))
    return (hist.crossJoin(F.broadcast(mom))
            .select("k_occ", "n_nodes",
                    F.expr("s1 * 1000000 DIV n").cast("long")
                    .alias("mean_ppm"),
                    "max_k_occ", "n",
                    F.round(F.when(
                        F.col("n") * F.col("s2") - F.col("s1")
                        * F.col("s1") > 0,
                        (F.col("n") * F.col("n") * F.col("s3")
                         - 3 * F.col("n") * F.col("s1") * F.col("s2")
                         + 2 * F.col("s1") * F.col("s1") * F.col("s1"))
                        .cast("double")
                        / (F.col("n").cast("double")
                           * ((F.col("n") * F.col("s2")
                               - F.col("s1") * F.col("s1"))
                              .cast("double")
                              * F.sqrt((F.col("n") * F.col("s2")
                                        - F.col("s1") * F.col("s1"))
                                       .cast("double"))))),
                        6).alias("skew_g")))


def _sql_sim_hubness() -> str:
    from ..operators.simsearch import hyperplanes
    planes = hyperplanes(KNNG_N_PLANES, 64)
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(nv, {_sql_vec_lit(p)}) >= 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes))
    return f"""
WITH v AS (SELECT vec_id AS nid, cast(embedding AS DOUBLE[]) AS nv
           FROM embeddings),
b AS (SELECT nid, nv, {bucket} AS bucket FROM v),
pairs AS (
  SELECT a.nid AS src, c.nid AS dst,
         round(list_cosine_similarity(a.nv, c.nv), 6) AS cos
  FROM b a JOIN b c USING (bucket)
  WHERE a.nid <> c.nid),
topk AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src
                              ORDER BY cos DESC, dst ASC) AS rk
    FROM pairs) WHERE rk <= {KNNG_K}),
occ AS (
  SELECT CAST(coalesce(i.k_occ, 0) AS BIGINT) AS k_occ
  FROM v LEFT JOIN (SELECT dst, CAST(count(*) AS BIGINT) AS k_occ
                    FROM topk GROUP BY dst) i ON i.dst = v.nid),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(k_occ) AS BIGINT) AS s1,
         CAST(sum(k_occ * k_occ) AS BIGINT) AS s2,
         CAST(sum(k_occ * k_occ * k_occ) AS BIGINT) AS s3,
         CAST(max(k_occ) AS BIGINT) AS max_k_occ
  FROM occ),
hist AS (
  SELECT k_occ, CAST(count(*) AS BIGINT) AS n_nodes
  FROM occ GROUP BY 1)
SELECT k_occ, n_nodes,
       CAST(s1 * 1000000 // n AS BIGINT) AS mean_ppm,
       max_k_occ, n,
       round(CASE WHEN n * s2 - s1 * s1 > 0 THEN
             CAST(n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
                  AS DOUBLE)
             / (CAST(n AS DOUBLE)
                * (CAST(n * s2 - s1 * s1 AS DOUBLE)
                   * sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))))
             END, 6) AS skew_g
FROM hist CROSS JOIN mom
"""


def q_stats_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-of-dispersion (Fano factor) per event stream [K: the
    Poisson-ness test for arrival processes — VMR = 1 under Poisson,
    >1 means bursty (retry storms, bot bursts), <1 means regularized
    (rate-limited); capacity models assume Poisson, so this is the
    check that licenses them]: hourly arrival counts per event_type,
    GAP-FILLED over the observed span (zero-event hours count — a
    dispersion statistic over only-nonempty hours is biased low),
    then VMR = (n*S2 - S1^2) / ((n-1)*S1) and the chi-square
    dispersion statistic (n-1)*VMR from EXACT integer sums, one
    double division each (round 6).

    Shape: one distributed (type, hour) hash agg, a calendar-bounded
    hour sequence explode cross-joined with the tiny type dimension,
    a broadcast left join, and one per-type agg. Only the first agg
    touches the corpus."""
    e = _tbl(spark, sf_dir, "events")
    hourly = (e.select(F.col("event_type").alias("et"),
                       F.date_trunc("hour", F.col("ts")).alias("h"))
              .groupBy("et", "h")
              .agg(F.count(F.lit(1)).cast("long").alias("x")))
    span = e.agg(F.date_trunc("hour", F.min("ts")).alias("h0"),
                 F.date_trunc("hour", F.max("ts")).alias("h1"))
    hours = span.select(F.explode(F.expr(
        "sequence(h0, h1, interval 1 hour)")).alias("h"))
    types = e.select(F.col("event_type").alias("et")).distinct()
    grid = hours.crossJoin(F.broadcast(types))
    filled = (grid.join(hourly, ["et", "h"], "left")
              .select("et", F.coalesce("x", F.lit(0)).cast("long")
                      .alias("x")))
    agg = (filled.groupBy("et")
           .agg(F.count(F.lit(1)).cast("long").alias("n_hours"),
                F.sum("x").cast("long").alias("s1"),
                F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
                F.max("x").cast("long").alias("max_hour")))
    return agg.select(
        F.col("et").alias("event_type"), "n_hours", "s1", "max_hour",
        F.expr("s1 * 1000000 DIV n_hours").cast("long")
        .alias("mean_ppm"),
        F.round((F.col("n_hours") * F.col("s2")
                 - F.col("s1") * F.col("s1")).cast("double")
                / ((F.col("n_hours") - 1) * F.col("s1")).cast("double"),
                6).alias("vmr"),
        F.round((F.col("n_hours") * F.col("s2")
                 - F.col("s1") * F.col("s1")).cast("double")
                / F.col("s1").cast("double"), 6).alias("chi_stat"),
        ((F.col("n_hours") * F.col("s2") - F.col("s1") * F.col("s1"))
         > (F.col("n_hours") - 1) * F.col("s1")).cast("int")
        .alias("overdispersed"))


def _sql_stats_dispersion() -> str:
    return """
WITH e AS (SELECT event_type AS et, date_trunc('hour', ts) AS h
           FROM events),
hourly AS (
  SELECT et, h, CAST(count(*) AS BIGINT) AS x FROM e GROUP BY 1, 2),
span AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
hours AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM span),
grid AS (SELECT t.et, hours.h
         FROM hours CROSS JOIN (SELECT DISTINCT et FROM e) t),
filled AS (
  SELECT g.et, CAST(coalesce(hourly.x, 0) AS BIGINT) AS x
  FROM grid g LEFT JOIN hourly ON hourly.et = g.et
                              AND hourly.h = g.h),
agg AS (
  SELECT et, CAST(count(*) AS BIGINT) AS n_hours,
         CAST(sum(x) AS BIGINT) AS s1,
         CAST(sum(x * x) AS BIGINT) AS s2,
         CAST(max(x) AS BIGINT) AS max_hour
  FROM filled GROUP BY 1)
SELECT et AS event_type, n_hours, s1, max_hour,
       CAST(s1 * 1000000 // n_hours AS BIGINT) AS mean_ppm,
       round(CAST(n_hours * s2 - s1 * s1 AS DOUBLE)
             / CAST((n_hours - 1) * s1 AS DOUBLE), 6) AS vmr,
       round(CAST(n_hours * s2 - s1 * s1 AS DOUBLE)
             / CAST(s1 AS DOUBLE), 6) AS chi_stat,
       CAST(CASE WHEN n_hours * s2 - s1 * s1
                      > (n_hours - 1) * s1
            THEN 1 ELSE 0 END AS INT) AS overdispersed
FROM agg
"""


def q_rel_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral entropy per user [K: the user-segmentation signal —
    a user whose events are all one type (a bot hammering 'view', a
    crawler looping 'error') has entropy ~0 bits, an organic user
    mixes types; fraud/abuse triage ranks by exactly this]: per user
    the event count, distinct-type count, Shannon entropy over the
    type distribution, and the dominant type with its share in exact
    ppm. The entropy sum folds over the user's per-type counts in
    DETERMINISTIC event_type order (Spark: aggregate over
    sort_array(collect_list(struct)); DuckDB: list_reduce over
    list(... ORDER BY type)) — per-user type cardinality is bounded
    by the tiny type vocabulary, and the fixed fold order removes the
    cross-engine float-sum-order hazard.

    Shape: one (user, type) hash agg (map-side partial), one per-user
    agg over <=|type| element arrays. Shuffles only by user key."""
    e = _tbl(spark, sf_dir, "events")
    c = (e.groupBy("user_id", "event_type")
         .agg(F.count(F.lit(1)).cast("long").alias("c")))
    per = (c.groupBy("user_id")
           .agg(F.sum("c").cast("long").alias("n_events"),
                F.count(F.lit(1)).cast("long").alias("n_types"),
                F.aggregate(
                    F.sort_array(F.collect_list(
                        F.struct(F.col("event_type").alias("t"),
                                 F.col("c").alias("c")))),
                    F.lit(0.0),
                    lambda acc, s: acc + s.c.cast("double")
                    * F.log2(s.c.cast("double"))).alias("clogc"),
                F.min(F.struct((-F.col("c")).alias("nc"),
                               F.col("event_type").alias("t")))
                .alias("dom")))
    return per.select(
        "user_id", "n_events", "n_types",
        F.round(F.log2(F.col("n_events").cast("double"))
                - F.col("clogc") / F.col("n_events").cast("double"), 6)
        .alias("entropy"),
        F.col("dom.t").alias("dominant_type"),
        F.expr("(-dom.nc) * 1000000 DIV n_events").cast("long")
        .alias("dom_ppm"))


def _sql_rel_user_entropy() -> str:
    return """
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
per AS (
  SELECT user_id,
         CAST(sum(c) AS BIGINT) AS n_events,
         CAST(count(*) AS BIGINT) AS n_types,
         coalesce(list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(list(c ORDER BY event_type),
                            x -> CAST(x AS DOUBLE)
                                 * log2(CAST(x AS DOUBLE)))),
           (a, b) -> a + b), 0.0) AS clogc,
         first(event_type ORDER BY c DESC, event_type ASC) AS dom_t,
         CAST(max(c) AS BIGINT) AS dom_c
  FROM c GROUP BY user_id)
SELECT user_id, n_events, n_types,
       round(log2(CAST(n_events AS DOUBLE))
             - clogc / CAST(n_events AS DOUBLE), 6) AS entropy,
       dom_t AS dominant_type,
       CAST(dom_c * 1000000 // n_events AS BIGINT) AS dom_ppm
FROM per
"""


VELOCITY_WINDOW_S = 600
VELOCITY_FENCE = 5


def q_rel_velocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Velocity fence per user [K: the rate-based abuse check every
    fraud/abuse system runs — 'more than N events inside any sliding
    10-minute window' catches card-testing runs, scraping loops and
    credential stuffing that per-day totals smear out]: per user the
    event count, the MAXIMUM number of events inside any trailing
    600-second window (an exact sliding count via a RANGE frame over
    epoch seconds — every event is its own window anchor, which is
    exactly the set of maxima candidates), and the fence flag.

    Shape: one user-partitioned range-frame window (bounded by the
    user's own event count — the gate-safe shape; hot users are the
    skew to salt at 10^12 events) and one per-user agg. No self-join,
    no explode."""
    e = _tbl(spark, sf_dir, "events")
    s = e.select("user_id",
                 F.unix_timestamp("ts").cast("long").alias("es"))
    w = (Window.partitionBy("user_id").orderBy("es")
         .rangeBetween(-(VELOCITY_WINDOW_S - 1), 0))
    burst = s.withColumn("b", F.count(F.lit(1)).over(w))
    return (burst.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                 F.max("b").cast("long").alias("max_burst_10m"))
            .withColumn("is_velocity_suspect",
                        (F.col("max_burst_10m") >= VELOCITY_FENCE)
                        .cast("int")))


def _sql_rel_velocity() -> str:
    return f"""
WITH s AS (
  SELECT user_id,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
  FROM events),
burst AS (
  SELECT user_id,
         CAST(count(*) OVER (PARTITION BY user_id ORDER BY es
                             RANGE BETWEEN {VELOCITY_WINDOW_S - 1}
                             PRECEDING AND CURRENT ROW) AS BIGINT)
           AS b
  FROM s)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(b) AS BIGINT) AS max_burst_10m,
       CAST(CASE WHEN max(b) >= {VELOCITY_FENCE} THEN 1 ELSE 0 END
            AS INT) AS is_velocity_suspect
FROM burst GROUP BY user_id
"""


def q_curation_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset card for the document corpus [K: the datasheet
    / dataset-card summary a curation team publishes with every
    training corpus — sizes, diversity, emptiness, exact-dup rate —
    and the first sanity read a consumer does before training]:
    document and whitespace-token counts, distinct sources and
    languages, empty-doc count and ppm, char-mass totals and mean,
    the longest document, exact-duplicate text rate via md5 distinct
    (the dedup_exact key), all exact integers.

    Shape: one corpus scan with map-side partial aggs; the distinct
    counts are hash-agg distincts (expressed so Spark's Expand-based
    multi-distinct handles them in one pass). O(1) output."""
    d = _docs(spark, sf_dir)
    t = F.coalesce(F.col("text"), F.lit(""))
    base = d.select(
        "doc_id", "source", "lang",
        F.length(t).cast("long").alias("nc"),
        F.size(F.filter(F.split(t, r"\s+"), lambda x: x != ""))
        .cast("long").alias("nt"),
        F.md5(t).alias("h"))
    return base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("h").cast("long").alias("n_unique_texts"),
        F.sum("nc").cast("long").alias("total_chars"),
        F.sum("nt").cast("long").alias("total_tokens"),
        F.max("nc").cast("long").alias("max_chars"),
        F.sum((F.col("nc") == 0).cast("long")).cast("long")
        .alias("n_empty")).select(
        "n_docs", "n_sources", "n_langs", "n_unique_texts",
        "total_chars", "total_tokens", "max_chars", "n_empty",
        F.expr("total_chars * 1000000 DIV n_docs").cast("long")
        .alias("mean_chars_ppm"),
        F.expr("n_empty * 1000000 DIV n_docs").cast("long")
        .alias("empty_ppm"),
        F.expr("(n_docs - n_unique_texts) * 1000000 DIV n_docs")
        .cast("long").alias("exact_dup_ppm"))


def _sql_curation_dataset_card() -> str:
    return """
WITH base AS (
  SELECT doc_id, source, lang,
         CAST(length(coalesce(text, '')) AS BIGINT) AS nc,
         CAST(len(list_filter(
               string_split_regex(coalesce(text, ''), '\\s+'),
               x -> x <> '')) AS BIGINT) AS nt,
         md5(coalesce(text, '')) AS h
  FROM documents),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(count(DISTINCT h) AS BIGINT) AS n_unique_texts,
         CAST(sum(nc) AS BIGINT) AS total_chars,
         CAST(sum(nt) AS BIGINT) AS total_tokens,
         CAST(max(nc) AS BIGINT) AS max_chars,
         CAST(sum(CASE WHEN nc = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_empty
  FROM base)
SELECT n_docs, n_sources, n_langs, n_unique_texts, total_chars,
       total_tokens, max_chars, n_empty,
       CAST(total_chars * 1000000 // n_docs AS BIGINT)
         AS mean_chars_ppm,
       CAST(n_empty * 1000000 // n_docs AS BIGINT) AS empty_ppm,
       CAST((n_docs - n_unique_texts) * 1000000 // n_docs AS BIGINT)
         AS exact_dup_ppm
FROM agg
"""


def q_rel_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU stickiness per day [K: the product-analytics
    engagement headline — what share of the week's actives showed up
    today; the standard scale trick is that COUNT(DISTINCT user) over
    a sliding 7-day frame is NOT window-computable, so each (user,
    day) activity contributes itself to the 7 forward window anchors
    via a bounded explode and the distinct lands in an ordinary hash
    agg]: per day (full-history days only, gap-filled calendar) the
    DAU, trailing-7-day WAU, and stickiness in exact ppm.

    Shape: one (user, day) distinct hash agg on the corpus, a 7x
    bounded explode, one per-day distinct agg, a calendar-bounded
    gap-fill left join. The explode factor IS the window length —
    at 10^12 events the dedup agg dominates and partial-aggregates
    map-side."""
    e = _tbl(spark, sf_dir, "events")
    ud = (e.select("user_id", F.to_date("ts").alias("day"))
          .distinct())
    span = ud.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    dau = ud.groupBy("day").agg(F.countDistinct("user_id")
                                .cast("long").alias("dau"))
    wau = (ud.select("user_id", F.explode(F.expr(
        "sequence(day, date_add(day, 6))")).alias("wday"))
        .groupBy("wday")
        .agg(F.countDistinct("user_id").cast("long").alias("wau")))
    cal = span.select(
        F.explode(F.expr("sequence(date_add(d0, 6), d1)")).alias("day"))
    return (cal.join(dau, "day", "left")
            .join(wau, cal["day"] == wau["wday"], "left")
            .select(F.date_format(cal["day"], "yyyy-MM-dd")
                    .alias("day"),
                    F.coalesce("dau", F.lit(0)).cast("long")
                    .alias("dau"),
                    F.coalesce("wau", F.lit(0)).cast("long")
                    .alias("wau"))
            .withColumn("stickiness_ppm",
                        F.when(F.col("wau") > 0,
                               F.expr("dau * 1000000 DIV wau"))
                        .otherwise(F.lit(0)).cast("long")))


def _sql_rel_stickiness() -> str:
    return """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ud),
dau AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
  FROM ud GROUP BY 1),
contrib AS (
  SELECT user_id, day + CAST(o AS INT) AS wday
  FROM ud CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS o)),
wau AS (
  SELECT wday, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
  FROM contrib GROUP BY 1),
cal AS (
  SELECT CAST(unnest(generate_series(d0 + 6, d1, INTERVAL 1 DAY))
              AS DATE) AS day
  FROM span)
SELECT strftime(cal.day, '%Y-%m-%d') AS day,
       CAST(coalesce(dau.dau, 0) AS BIGINT) AS dau,
       CAST(coalesce(wau.wau, 0) AS BIGINT) AS wau,
       CAST(CASE WHEN coalesce(wau.wau, 0) > 0
                 THEN coalesce(dau.dau, 0) * 1000000 // wau.wau
                 ELSE 0 END AS BIGINT) AS stickiness_ppm
FROM cal LEFT JOIN dau ON dau.day = cal.day
         LEFT JOIN wau ON wau.wday = cal.day
"""


def q_dedup_population_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture population estimate per source pair [K: the
    Lincoln-Petersen/Chapman estimator applied to corpus coverage —
    treat each source as a 'capture' of the underlying document
    population; the cross-source overlap of exact-dup hashes
    estimates how many unique documents EXIST, telling a crawl team
    how much of the web segment their union has actually covered]:
    for every unordered source pair the per-source distinct-text
    counts, the overlap, the observed union, the Chapman estimate
    (nA+1)(nB+1)/(m+1) - 1 (floored — exact integer DIV, documented),
    and observed coverage of that estimate in ppm.

    Shape: one (source, md5) distinct hash agg, a self-equi-join on
    the hash key (bounded by the tiny source vocabulary per hash —
    never all-pairs across docs), two small aggs, a broadcast join of
    source-level totals. Output is source-pair-sized."""
    d = _docs(spark, sf_dir)
    sh = (d.select("source",
                   F.md5(F.coalesce(F.col("text"), F.lit("")))
                   .alias("h"))
          .distinct())
    per = sh.groupBy("source").agg(F.count(F.lit(1)).cast("long")
                                   .alias("n"))
    a = sh.select(F.col("source").alias("sa"), "h")
    b = sh.select(F.col("source").alias("sb"), "h")
    ov = (a.join(b, "h")
          .filter(F.col("sa") < F.col("sb"))
          .groupBy("sa", "sb")
          .agg(F.count(F.lit(1)).cast("long").alias("overlap")))
    pairs = (per.alias("pa").crossJoin(F.broadcast(per.alias("pb")))
             .filter(F.col("pa.source") < F.col("pb.source"))
             .select(F.col("pa.source").alias("sa"),
                     F.col("pb.source").alias("sb"),
                     F.col("pa.n").alias("n_a"),
                     F.col("pb.n").alias("n_b")))
    j = (pairs.join(ov, ["sa", "sb"], "left")
         .select("sa", "sb", "n_a", "n_b",
                 F.coalesce("overlap", F.lit(0)).cast("long")
                 .alias("overlap")))
    return (j.withColumn("union_obs",
                         (F.col("n_a") + F.col("n_b")
                          - F.col("overlap")).cast("long"))
            .withColumn("chapman_est", F.expr(
                "(n_a + 1) * (n_b + 1) DIV (overlap + 1) - 1")
                .cast("long"))
            .withColumn("coverage_ppm", F.expr(
                "union_obs * 1000000 DIV chapman_est").cast("long"))
            .select(F.col("sa").alias("source_a"),
                    F.col("sb").alias("source_b"),
                    "n_a", "n_b", "overlap", "union_obs",
                    "chapman_est", "coverage_ppm"))


def _sql_dedup_population_est() -> str:
    return """
WITH sh AS (
  SELECT DISTINCT source, md5(coalesce(text, '')) AS h
  FROM documents),
per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
ov AS (
  SELECT a.source AS sa, b.source AS sb,
         CAST(count(*) AS BIGINT) AS overlap
  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2),
pairs AS (
  SELECT pa.source AS sa, pb.source AS sb, pa.n AS n_a, pb.n AS n_b
  FROM per pa CROSS JOIN per pb
  WHERE pa.source < pb.source),
j AS (
  SELECT sa, sb, n_a, n_b,
         CAST(coalesce(ov.overlap, 0) AS BIGINT) AS overlap
  FROM pairs LEFT JOIN ov USING (sa, sb))
SELECT sa AS source_a, sb AS source_b, n_a, n_b, overlap,
       CAST(n_a + n_b - overlap AS BIGINT) AS union_obs,
       CAST((n_a + 1) * (n_b + 1) // (overlap + 1) - 1 AS BIGINT)
         AS chapman_est,
       CAST((n_a + n_b - overlap) * 1000000
            // ((n_a + 1) * (n_b + 1) // (overlap + 1) - 1)
            AS BIGINT) AS coverage_ppm
FROM j
"""


def q_stats_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p-chart over the daily error rate [K: the SPC control chart an
    SRE/data-quality team keeps on a failure proportion — daily
    errors out of daily events against 3-sigma binomial limits around
    the corpus-wide center line, with VARYING daily n (each day gets
    its own limit width)]. The out-of-control test is EXACT INTEGER
    arithmetic end to end: |x/n - S/N| > 3*sqrt(pbar*(1-pbar)/n)
    cross-multiplies to (x*N - S*n)^2 > 9*S*(N-S)*n — no sqrt, no
    division, no float anywhere; the reported rates are exact ppm.

    Shape: one daily conditional hash agg on the corpus, one 1-row
    center-line agg broadcast back, one map-side integer fence.
    Nothing after the first agg is bigger than the calendar."""
    e = _tbl(spark, sf_dir, "events")
    daily = (e.select(F.to_date("ts").alias("day"),
                      (F.col("event_type") == "error").cast("long")
                      .alias("is_err"))
             .groupBy("day")
             .agg(F.count(F.lit(1)).cast("long").alias("n"),
                  F.sum("is_err").cast("long").alias("x")))
    tot = daily.agg(F.sum("n").cast("long").alias("big_n"),
                    F.sum("x").cast("long").alias("s"))
    j = daily.crossJoin(F.broadcast(tot))
    return (j.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "n", "x",
        F.expr("x * 1000000 DIV n").cast("long").alias("rate_ppm"),
        F.expr("s * 1000000 DIV big_n").cast("long")
        .alias("center_ppm"),
        F.expr("CASE WHEN (x * big_n - s * n) * (x * big_n - s * n)"
               " > 9 * s * (big_n - s) * n THEN 1 ELSE 0 END")
        .cast("int").alias("out_of_control"),
        F.expr("CASE WHEN x * big_n > s * n THEN 'high'"
               " WHEN x * big_n < s * n THEN 'low'"
               " ELSE 'center' END").alias("side")))


def _sql_stats_control_chart() -> str:
    return """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM events GROUP BY 1),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS big_n,
         CAST(sum(x) AS BIGINT) AS s
  FROM daily)
SELECT strftime(day, '%Y-%m-%d') AS day, n, x,
       CAST(x * 1000000 // n AS BIGINT) AS rate_ppm,
       CAST(s * 1000000 // big_n AS BIGINT) AS center_ppm,
       CAST(CASE WHEN (x * big_n - s * n) * (x * big_n - s * n)
                      > 9 * s * (big_n - s) * n
            THEN 1 ELSE 0 END AS INT) AS out_of_control,
       CASE WHEN x * big_n > s * n THEN 'high'
            WHEN x * big_n < s * n THEN 'low'
            ELSE 'center' END AS side
FROM daily CROSS JOIN tot
"""


def q_curation_pii_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII exposure audit per source [K: the compliance rollup a
    curation team publishes before release — which ingest sources
    leak emails / URLs / phone numbers, at what per-document density
    — reusing the EXACT redaction patterns of text_redact so the
    audit counts what the scrubber would scrub]: per source the doc
    count, per-category hit totals, documents-with-any-PII count, and
    exposure in exact ppm of docs.

    Shape: map-only regexp_extract_all counting (JVM regex, no UDF)
    + one per-source hash agg. One corpus scan."""
    from ..operators.textstats import RX_EMAIL, RX_PHONE, RX_URL
    d = _docs(spark, sf_dir)
    t = F.coalesce(F.col("text"), F.lit(""))
    base = d.select(
        "source",
        F.size(F.regexp_extract_all(t, F.lit(RX_EMAIL), F.lit(0)))
        .cast("long").alias("em"),
        F.size(F.regexp_extract_all(t, F.lit(RX_URL), F.lit(0)))
        .cast("long").alias("ur"),
        F.size(F.regexp_extract_all(t, F.lit(RX_PHONE), F.lit(0)))
        .cast("long").alias("ph"),
        F.length(t).cast("long").alias("nc"))
    return (base.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("em").cast("long").alias("n_emails"),
                 F.sum("ur").cast("long").alias("n_urls"),
                 F.sum("ph").cast("long").alias("n_phones"),
                 F.sum(((F.col("em") + F.col("ur") + F.col("ph")) > 0)
                       .cast("long")).cast("long")
                 .alias("docs_with_pii"),
                 F.sum("nc").cast("long").alias("total_chars"))
            .select("source", "n_docs", "n_emails", "n_urls",
                    "n_phones", "docs_with_pii",
                    F.expr("docs_with_pii * 1000000 DIV n_docs")
                    .cast("long").alias("exposure_ppm"),
                    F.expr("CASE WHEN total_chars > 0 THEN"
                           " (n_emails + n_urls + n_phones)"
                           " * 1000000000 DIV total_chars"
                           " ELSE 0 END").cast("long")
                    .alias("hits_per_gchar")))


def _sql_curation_pii_audit() -> str:
    from ..operators.textstats import RX_EMAIL, RX_PHONE, RX_URL
    return f"""
WITH base AS (
  SELECT source,
         CAST(len(regexp_extract_all(coalesce(text, ''),
                                     '{RX_EMAIL}')) AS BIGINT) AS em,
         CAST(len(regexp_extract_all(coalesce(text, ''),
                                     '{RX_URL}')) AS BIGINT) AS ur,
         CAST(len(regexp_extract_all(coalesce(text, ''),
                                     '{RX_PHONE}')) AS BIGINT) AS ph,
         CAST(length(coalesce(text, '')) AS BIGINT) AS nc
  FROM documents),
agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(em) AS BIGINT) AS n_emails,
         CAST(sum(ur) AS BIGINT) AS n_urls,
         CAST(sum(ph) AS BIGINT) AS n_phones,
         CAST(sum(CASE WHEN em + ur + ph > 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS docs_with_pii,
         CAST(sum(nc) AS BIGINT) AS total_chars
  FROM base GROUP BY 1)
SELECT source, n_docs, n_emails, n_urls, n_phones, docs_with_pii,
       CAST(docs_with_pii * 1000000 // n_docs AS BIGINT)
         AS exposure_ppm,
       CAST(CASE WHEN total_chars > 0
                 THEN (n_emails + n_urls + n_phones) * 1000000000
                      // total_chars
                 ELSE 0 END AS BIGINT) AS hits_per_gchar
FROM agg
"""


def q_kg_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimator calibration per predicate pair [K:
    the optimizer-engineering read — the textbook uniformity estimate
    |A||B|/max(V(A,obj),V(B,subj)) against the TRUE size of the
    obj=subj join for every ordered predicate pair, with the q-error
    every cardinality-estimation paper reports; pairs with big
    q-error are exactly where a 10^12-triple engine mis-plans join
    order]: true size computed scale-correctly as sum over join keys
    of out-degree x in-degree (a key-keyed equi-join of two degree
    tables — never materializing the join), estimate from per-pred
    totals, q-error = max(act,est)/max(min(act,est),1) in exact ppm.

    Shape: two (pred,key) hash aggs, a key-keyed equi-join + per-pair
    agg, a tiny pred-pair cross of broadcast per-pred stats. Output
    is |preds|^2-sized."""
    t = q_kg_triples(spark, sf_dir)
    outd = (t.groupBy("pred", F.col("obj").alias("k"))
            .agg(F.count(F.lit(1)).cast("long").alias("d1")))
    ind = (t.groupBy("pred", F.col("subj").alias("k"))
           .agg(F.count(F.lit(1)).cast("long").alias("d2")))
    act = (outd.select(F.col("pred").alias("pa"), "k", "d1")
           .join(ind.select(F.col("pred").alias("pb"), "k", "d2"), "k")
           .groupBy("pa", "pb")
           .agg(F.sum(F.col("d1") * F.col("d2")).cast("long")
                .alias("actual")))
    stats = t.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("obj").cast("long").alias("v_obj"),
        F.countDistinct("subj").cast("long").alias("v_subj"))
    pairs = (stats.alias("a").crossJoin(F.broadcast(stats.alias("b")))
             .select(F.col("a.pred").alias("pa"),
                     F.col("b.pred").alias("pb"),
                     F.col("a.n").alias("n_a"),
                     F.col("b.n").alias("n_b"),
                     F.greatest(F.col("a.v_obj"), F.col("b.v_subj"))
                     .alias("v")))
    j = (pairs.join(act, ["pa", "pb"], "left")
         .select("pa", "pb", "n_a", "n_b",
                 F.coalesce("actual", F.lit(0)).cast("long")
                 .alias("actual"),
                 F.expr("n_a * n_b DIV v").cast("long").alias("est")))
    return j.select(
        F.col("pa").alias("pred_a"), F.col("pb").alias("pred_b"),
        "n_a", "n_b", "actual", "est",
        F.expr("greatest(actual, est) * 1000000"
               " DIV greatest(least(actual, est), 1)").cast("long")
        .alias("q_error_ppm"),
        (F.col("est") >= F.col("actual")).cast("int")
        .alias("overestimate"))


def _sql_kg_join_cardinality() -> str:
    return f"""
WITH triples AS ({_sql_kg_triples_body()}),
outd AS (
  SELECT pred AS pa, obj AS k, CAST(count(*) AS BIGINT) AS d1
  FROM triples GROUP BY 1, 2),
ind AS (
  SELECT pred AS pb, subj AS k, CAST(count(*) AS BIGINT) AS d2
  FROM triples GROUP BY 1, 2),
act AS (
  SELECT pa, pb, CAST(sum(d1 * d2) AS BIGINT) AS actual
  FROM outd JOIN ind USING (k) GROUP BY 1, 2),
stats AS (
  SELECT pred, CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT obj) AS BIGINT) AS v_obj,
         CAST(count(DISTINCT subj) AS BIGINT) AS v_subj
  FROM triples GROUP BY 1),
pairs AS (
  SELECT a.pred AS pa, b.pred AS pb, a.n AS n_a, b.n AS n_b,
         greatest(a.v_obj, b.v_subj) AS v
  FROM stats a CROSS JOIN stats b),
j AS (
  SELECT pa, pb, n_a, n_b,
         CAST(coalesce(act.actual, 0) AS BIGINT) AS actual,
         CAST(n_a * n_b // v AS BIGINT) AS est
  FROM pairs LEFT JOIN act USING (pa, pb))
SELECT pa AS pred_a, pb AS pred_b, n_a, n_b, actual, est,
       CAST(greatest(actual, est) * 1000000
            // greatest(least(actual, est), 1) AS BIGINT)
         AS q_error_ppm,
       CAST(CASE WHEN est >= actual THEN 1 ELSE 0 END AS INT)
         AS overestimate
FROM j
"""


CCF_MAX_LAG = 7
CCF_TYPE_X = "error"
CCF_TYPE_Y = "purchase"


def q_stats_ccf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between two event streams at lags
    -7..+7 days [K: the lead/lag discovery read — 'do purchases drop
    N days AFTER error spikes?'; the CCF peak's lag is the causal-
    direction hint every ops postmortem wants]: daily error and
    purchase counts gap-filled over the common span, Pearson r at
    each lag from EXACT integer sums (n*Sxy - Sx*Sy over the two
    exact variance numerators, one double sqrt each at the end,
    round 6), the per-lag overlap length, and the is_peak flag
    (max r, ties allowed).

    Shape: one daily conditional agg on the corpus, a calendar-
    bounded gap-fill, a 15x bounded lag explode + self-join on the
    shifted day key, one per-lag agg. Only the first agg sees the
    corpus."""
    e = _tbl(spark, sf_dir, "events")
    daily = (e.select(F.to_date("ts").alias("day"), "event_type")
             .groupBy("day")
             .agg(F.sum((F.col("event_type") == CCF_TYPE_X)
                        .cast("long")).cast("long").alias("x"),
                  F.sum((F.col("event_type") == CCF_TYPE_Y)
                        .cast("long")).cast("long").alias("y")))
    span = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cal = span.select(F.explode(F.expr("sequence(d0, d1)"))
                      .alias("day"))
    filled = (cal.join(daily, "day", "left")
              .select("day", F.coalesce("x", F.lit(0)).cast("long")
                      .alias("x"),
                      F.coalesce("y", F.lit(0)).cast("long")
                      .alias("y")))
    lags = spark.range(-CCF_MAX_LAG, CCF_MAX_LAG + 1) \
        .select(F.col("id").cast("int").alias("lg"))
    f1 = filled.select(F.col("day").alias("dx"), "x")
    f2 = filled.select(F.col("day").alias("dy"), "y")
    pr = (f1.crossJoin(F.broadcast(lags))
          .join(f2, F.col("dy") == F.expr("date_add(dx, lg)"))
          .groupBy("lg")
          .agg(F.count(F.lit(1)).cast("long").alias("n"),
               F.sum("x").cast("long").alias("sx"),
               F.sum("y").cast("long").alias("sy"),
               F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
               F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
               F.sum(F.col("x") * F.col("y")).cast("long")
               .alias("sxy")))
    r = pr.select(
        "lg", "n",
        F.round(F.when(
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
            & (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
               > 0),
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("double")
            / (F.sqrt((F.col("n") * F.col("sxx")
                       - F.col("sx") * F.col("sx")).cast("double"))
               * F.sqrt((F.col("n") * F.col("syy")
                         - F.col("sy") * F.col("sy"))
                        .cast("double")))), 6).alias("r"))
    mx = r.agg(F.max("r").alias("r_max"))
    # NULL r (zero-variance lag) must flag 0 like the oracle's CASE,
    # not propagate NULL (ADVICE r4).
    return (r.crossJoin(F.broadcast(mx))
            .select(F.col("lg").alias("lag_days"), "n", "r",
                    F.when(F.col("r") == F.col("r_max"), F.lit(1))
                    .otherwise(F.lit(0)).alias("is_peak")))


def _sql_stats_ccf() -> str:
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CASE WHEN event_type = '{CCF_TYPE_X}'
                  THEN 1 ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = '{CCF_TYPE_Y}'
                  THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY 1),
span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
cal AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
              AS DATE) AS day
  FROM span),
filled AS (
  SELECT c.day, CAST(coalesce(d.x, 0) AS BIGINT) AS x,
         CAST(coalesce(d.y, 0) AS BIGINT) AS y
  FROM cal c LEFT JOIN daily d ON d.day = c.day),
lags AS (SELECT CAST(unnest(generate_series(-{CCF_MAX_LAG},
                                            {CCF_MAX_LAG})) AS INT)
           AS lg),
pr AS (
  SELECT lg, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(f1.x) AS BIGINT) AS sx,
         CAST(sum(f2.y) AS BIGINT) AS sy,
         CAST(sum(f1.x * f1.x) AS BIGINT) AS sxx,
         CAST(sum(f2.y * f2.y) AS BIGINT) AS syy,
         CAST(sum(f1.x * f2.y) AS BIGINT) AS sxy
  FROM filled f1 CROSS JOIN lags
  JOIN filled f2 ON f2.day = f1.day + CAST(lg AS INT)
  GROUP BY lg),
r AS (
  SELECT lg, n,
         round(CASE WHEN n * sxx - sx * sx > 0
                     AND n * syy - sy * sy > 0 THEN
               CAST(n * sxy - sx * sy AS DOUBLE)
               / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
               END, 6) AS r
  FROM pr),
mx AS (SELECT max(r) AS r_max FROM r)
SELECT lg AS lag_days, n, r,
       CAST(CASE WHEN r = r_max THEN 1 ELSE 0 END AS INT) AS is_peak
FROM r CROSS JOIN mx
"""


APPORTION_BUDGET = 100000


def q_curation_apportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a token budget
    across sources [K: the sampling-budget allocator — 'spend exactly
    N tokens across sources proportionally to their mass' sounds
    trivial until rounding: floors under-spend, naive rounding over-
    spends; Hamilton's method gives EVERY source its floor and hands
    the leftover units to the largest fractional remainders, so the
    total is exactly N by construction]: per source the token mass,
    the floor share, the exact remainder numerator, the +1 bonus
    flag, and the final allocation (sums to the budget precisely —
    pytest-pinned).

    Shape: one corpus token agg, then everything is source-
    cardinality-sized: a triangular broadcast self-join ranks the
    remainders (no window at all), a 1-row leftover agg broadcast
    back. Deterministic ties by source name."""
    d = _docs(spark, sf_dir)
    t = F.coalesce(F.col("text"), F.lit(""))
    mass = (d.select("source",
                     F.size(F.filter(F.split(t, r"\s+"),
                                     lambda x: x != ""))
                     .cast("long").alias("nt"))
            .groupBy("source")
            .agg(F.sum("nt").cast("long").alias("mass")))
    tot = mass.agg(F.sum("mass").cast("long").alias("m_tot"))
    q = (mass.crossJoin(F.broadcast(tot))
         .select("source", "mass", "m_tot",
                 F.expr(f"{APPORTION_BUDGET}L * mass DIV m_tot")
                 .cast("long").alias("floor_share"),
                 F.expr(f"({APPORTION_BUDGET}L * mass) % m_tot")
                 .cast("long").alias("rem")))
    left = q.agg((F.lit(APPORTION_BUDGET)
                  - F.sum("floor_share")).cast("long").alias("l"))
    rk = (q.alias("a").join(
        F.broadcast(q.alias("b")),
        (F.col("b.rem") > F.col("a.rem"))
        | ((F.col("b.rem") == F.col("a.rem"))
           & (F.col("b.source") < F.col("a.source"))), "left")
        .groupBy(F.col("a.source").alias("source"))
        .agg(F.max(F.col("a.mass")).cast("long").alias("mass"),
             F.max(F.col("a.floor_share")).cast("long")
             .alias("floor_share"),
             F.max(F.col("a.rem")).cast("long").alias("rem"),
             F.count(F.col("b.source")).cast("long").alias("ahead")))
    return (rk.crossJoin(F.broadcast(left))
            .select("source", "mass", "floor_share", "rem",
                    (F.col("ahead") < F.col("l")).cast("int")
                    .alias("bonus"),
                    (F.col("floor_share")
                     + (F.col("ahead") < F.col("l")).cast("long"))
                    .cast("long").alias("alloc")))


def _sql_curation_apportion() -> str:
    return f"""
WITH mass AS (
  SELECT source,
         CAST(sum(len(list_filter(
               string_split_regex(coalesce(text, ''), '\\s+'),
               x -> x <> ''))) AS BIGINT) AS mass
  FROM documents GROUP BY 1),
tot AS (SELECT CAST(sum(mass) AS BIGINT) AS m_tot FROM mass),
q AS (
  SELECT source, mass,
         CAST({APPORTION_BUDGET} * mass // m_tot AS BIGINT)
           AS floor_share,
         CAST(({APPORTION_BUDGET} * mass) % m_tot AS BIGINT) AS rem
  FROM mass CROSS JOIN tot),
lft AS (
  SELECT CAST({APPORTION_BUDGET} - sum(floor_share) AS BIGINT) AS l
  FROM q),
rk AS (
  SELECT a.source, max(a.mass) AS mass,
         max(a.floor_share) AS floor_share, max(a.rem) AS rem,
         CAST(count(b.source) AS BIGINT) AS ahead
  FROM q a LEFT JOIN q b
    ON b.rem > a.rem OR (b.rem = a.rem AND b.source < a.source)
  GROUP BY a.source)
SELECT source, mass, floor_share, rem,
       CAST(CASE WHEN ahead < l THEN 1 ELSE 0 END AS INT) AS bonus,
       CAST(floor_share + CASE WHEN ahead < l THEN 1 ELSE 0 END
            AS BIGINT) AS alloc
FROM rk CROSS JOIN lft
"""


def q_stats_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-day inter-arrival statistics per event stream [K: the
    queueing read under the capacity model — exponential arrivals
    have mean ~= 1.44x median; heavy right tails (mean >> median)
    mean batching/retry storms]: per event_type the same-day gap
    count, exact doubled-integer MEDIAN gap in microseconds (the
    percentile idiom — no .9-interpolation, whose lerp formula
    differs across engines), exact mean (DIV), max, and the
    mean/median burstiness ratio in ppm. Gaps are computed WITHIN
    each (type, day) — the bounded-partition window shape; the
    cross-midnight gap is documented out of scope (at 10^12 events a
    per-day reduce is the only shape that doesn't totally order a
    whole stream).

    Shape: one (type, day)-partitioned lag window (bounded by a
    day's arrivals per type), one per-type agg. Deterministic
    ordering ties broken by event_id."""
    e = _tbl(spark, sf_dir, "events")
    s = e.select("event_type", F.to_date("ts").alias("day"),
                 F.unix_micros(F.col("ts").cast("timestamp"))
                 .alias("us"), "event_id")
    w = Window.partitionBy("event_type", "day") \
        .orderBy("us", "event_id")
    g = (s.withColumn("prev", F.lag("us").over(w))
         .filter(F.col("prev").isNotNull())
         .select("event_type",
                 (F.col("us") - F.col("prev")).cast("long")
                 .alias("gap")))
    agg = (g.groupBy("event_type")
           .agg(F.count(F.lit(1)).cast("long").alias("n_gaps"),
                F.expr("CAST(percentile(gap * 2, 0.5) AS BIGINT)")
                .alias("med2_us"),
                F.sum("gap").cast("long").alias("s_gap"),
                F.max("gap").cast("long").alias("max_us")))
    return agg.select(
        "event_type", "n_gaps", "med2_us",
        F.expr("s_gap DIV n_gaps").cast("long").alias("mean_us"),
        "max_us",
        F.expr("(s_gap DIV n_gaps) * 2000000"
               " DIV greatest(med2_us, 1)").cast("long")
        .alias("burstiness_ppm"))


def _sql_stats_interarrival() -> str:
    return """
WITH s AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         epoch_us(ts) AS us, event_id
  FROM events),
g AS (
  SELECT event_type,
         CAST(us - lag(us) OVER (PARTITION BY event_type, day
                                 ORDER BY us, event_id) AS BIGINT)
           AS gap
  FROM s),
gg AS (SELECT event_type, gap FROM g WHERE gap IS NOT NULL),
agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(quantile_cont(gap * 2, 0.5) AS BIGINT) AS med2_us,
         CAST(sum(gap) AS BIGINT) AS s_gap,
         CAST(max(gap) AS BIGINT) AS max_us
  FROM gg GROUP BY 1)
SELECT event_type, n_gaps, med2_us,
       CAST(s_gap // n_gaps AS BIGINT) AS mean_us, max_us,
       CAST((s_gap // n_gaps) * 2000000 // greatest(med2_us, 1)
            AS BIGINT) AS burstiness_ppm
FROM agg
"""


PSI_DORMANT_DAYS = 14


def q_stats_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half
    of the event span [K: PSI is THE industry drift metric for scored
    populations (credit, fraud, ranking features) — <0.1 stable,
    0.1-0.2 watch, >0.2 act; here applied to the event-value
    distribution so the monitor catches a payments mix shift]:
    power-of-two cent bins (exact bit-length, no libm log in the
    binning), Laplace +1 smoothing over the union bin set (the
    standard zero-cell guard, documented), per-bin contributions
    (pa-pb)*ln(pa/pb) from exact integer counts (round 6), and the
    total PSI as a DETERMINISTIC-ORDER fold over the bin-sorted
    contribution array (the rel_user_entropy idiom) with the >0.2
    action flag.

    Shape: one map-side bin projection + (half, bin) hash agg on the
    corpus; everything after is bin-cardinality-sized (<=64 rows).
    The midpoint split is a pure column predicate — one scan."""
    e = _tbl(spark, sf_dir, "events")
    span = e.agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    s = (e.crossJoin(F.broadcast(span))
         .select(
             (F.unix_timestamp(F.col("ts").cast("timestamp"))
              * 2 >= F.unix_timestamp(F.col("t0").cast("timestamp"))
              + F.unix_timestamp(F.col("t1").cast("timestamp")))
             .cast("int").alias("half"),
             F.expr("CAST(round(coalesce(value, 0.0) * 100, 0)"
                    " AS BIGINT)").alias("cents"))
         .select("half",
                 (F.length(F.bin(F.greatest(F.col("cents"), F.lit(0))
                                 + 1)) - 1).cast("int").alias("bin")))
    c = (s.groupBy("bin")
         .agg(F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
              .cast("long").alias("c_a"),
              F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
              .cast("long").alias("c_b")))
    tot = c.agg(F.sum("c_a").cast("long").alias("na"),
                F.sum("c_b").cast("long").alias("nb"),
                F.count(F.lit(1)).cast("long").alias("n_bins"))
    k = (c.crossJoin(F.broadcast(tot))
         .withColumn("na_s", (F.col("na") + F.col("n_bins"))
                     .cast("long"))
         .withColumn("nb_s", (F.col("nb") + F.col("n_bins"))
                     .cast("long"))
         .withColumn("contrib", F.round(
             ((F.col("c_a") + 1).cast("double")
              / F.col("na_s").cast("double")
              - (F.col("c_b") + 1).cast("double")
              / F.col("nb_s").cast("double"))
             * F.log(((F.col("c_a") + 1).cast("double")
                      * F.col("nb_s").cast("double"))
                     / ((F.col("c_b") + 1).cast("double")
                        * F.col("na_s").cast("double"))), 6)))
    psi = k.agg(F.round(F.aggregate(
        F.sort_array(F.collect_list(
            F.struct(F.col("bin").alias("b"),
                     F.col("contrib").alias("ct")))),
        F.lit(0.0), lambda acc, x: acc + x.ct), 6).alias("psi"))
    return (k.crossJoin(F.broadcast(psi))
            .select("bin", "c_a", "c_b",
                    F.expr("(c_a + 1) * 1000000 DIV na_s")
                    .cast("long").alias("pa_ppm"),
                    F.expr("(c_b + 1) * 1000000 DIV nb_s")
                    .cast("long").alias("pb_ppm"),
                    "contrib", "psi",
                    (F.col("psi") > 0.2).cast("int")
                    .alias("action_flag")))


def _sql_stats_psi() -> str:
    return """
WITH span AS (SELECT min(ts) AS t0, max(ts) AS t1 FROM events),
s AS (
  SELECT CAST(CASE WHEN CAST(epoch(date_trunc('second', ts))
                        AS BIGINT) * 2
                   >= CAST(epoch(date_trunc('second', t0)) AS BIGINT)
                    + CAST(epoch(date_trunc('second', t1)) AS BIGINT)
              THEN 1 ELSE 0 END AS INT) AS half,
         CAST(length(bin(greatest(
               CAST(round(coalesce(value, 0.0) * 100, 0) AS BIGINT),
               0) + 1)) - 1 AS INT) AS bin
  FROM events CROSS JOIN span),
c AS (
  SELECT bin,
         CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS c_a,
         CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS c_b
  FROM s GROUP BY 1),
tot AS (
  SELECT CAST(sum(c_a) AS BIGINT) AS na,
         CAST(sum(c_b) AS BIGINT) AS nb,
         CAST(count(*) AS BIGINT) AS n_bins
  FROM c),
k AS (
  SELECT bin, c_a, c_b,
         CAST(na + n_bins AS BIGINT) AS na_s,
         CAST(nb + n_bins AS BIGINT) AS nb_s,
         round((CAST(c_a + 1 AS DOUBLE) / CAST(na + n_bins AS DOUBLE)
                - CAST(c_b + 1 AS DOUBLE) / CAST(nb + n_bins AS DOUBLE))
               * ln((CAST(c_a + 1 AS DOUBLE)
                     * CAST(nb + n_bins AS DOUBLE))
                    / (CAST(c_b + 1 AS DOUBLE)
                       * CAST(na + n_bins AS DOUBLE))), 6) AS contrib
  FROM c CROSS JOIN tot),
psi AS (
  SELECT round(coalesce(list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(list(contrib ORDER BY bin),
                            x -> CAST(x AS DOUBLE))),
           (a, b) -> a + b), 0.0), 6) AS psi
  FROM k)
SELECT bin, c_a, c_b,
       CAST((c_a + 1) * 1000000 // na_s AS BIGINT) AS pa_ppm,
       CAST((c_b + 1) * 1000000 // nb_s AS BIGINT) AS pb_ppm,
       contrib, psi,
       CAST(CASE WHEN psi > 0.2 THEN 1 ELSE 0 END AS INT)
         AS action_flag
FROM k CROSS JOIN psi
"""


def q_rel_dormancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dormancy / resurrection profile per user [K: lifecycle
    analytics beyond monthly new-vs-returning — the gap structure of
    a user's active days tells retention teams who churned silently
    (long trailing dormancy), who resurrects (gap > 14 days then
    returns), and who is steady]: per user the active-day count,
    span, maximum inter-activity gap, resurrection count (gaps >
    14 days), and the currently-dormant flag against the corpus-wide
    last observed day.

    Shape: one (user, day) distinct agg, one user-partitioned lag
    window (bounded by the user's own active days), one per-user agg,
    a 1-row global-max broadcast. Exact integers throughout."""
    e = _tbl(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = (ud.withColumn("gap",
                       F.datediff(F.col("day"),
                                  F.lag("day").over(w)).cast("long")))
    per = (g.groupBy("user_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_active_days"),
                F.min("day").alias("first_day"),
                F.max("day").alias("last_day"),
                F.max(F.coalesce("gap", F.lit(0))).cast("long")
                .alias("max_gap_days"),
                F.sum((F.coalesce("gap", F.lit(0))
                       > PSI_DORMANT_DAYS).cast("long")).cast("long")
                .alias("n_resurrections")))
    gmax = ud.agg(F.max("day").alias("gday"))
    return (per.crossJoin(F.broadcast(gmax))
            .select("user_id", "n_active_days",
                    F.datediff("last_day", "first_day").cast("long")
                    .alias("span_days"),
                    "max_gap_days", "n_resurrections",
                    (F.datediff("gday", "last_day")
                     > PSI_DORMANT_DAYS).cast("int")
                    .alias("currently_dormant")))


def _sql_rel_dormancy() -> str:
    return f"""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
g AS (
  SELECT user_id, day,
         CAST(datediff('day',
                       lag(day) OVER (PARTITION BY user_id
                                      ORDER BY day), day) AS BIGINT)
           AS gap
  FROM ud),
per AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_active_days,
         min(day) AS first_day, max(day) AS last_day,
         CAST(max(coalesce(gap, 0)) AS BIGINT) AS max_gap_days,
         CAST(sum(CASE WHEN coalesce(gap, 0) > {PSI_DORMANT_DAYS}
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrections
  FROM g GROUP BY 1),
gmax AS (SELECT max(day) AS gday FROM ud)
SELECT user_id, n_active_days,
       CAST(datediff('day', first_day, last_day) AS BIGINT)
         AS span_days,
       max_gap_days, n_resurrections,
       CAST(CASE WHEN datediff('day', last_day, gday)
                      > {PSI_DORMANT_DAYS}
            THEN 1 ELSE 0 END AS INT) AS currently_dormant
FROM per CROSS JOIN gmax
"""


def q_rel_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly growth accounting over the event user base [K: the
    standard MAU decomposition (popularized by Social Capital) every
    growth team reports — this month's actives split into NEW (first
    month ever), RETAINED (active last month too) and RESURRECTED
    (returning after a gap), churn counted against the month the user
    went missing, and the quick ratio (new+resurrected)/churned that
    summarizes whether growth outruns leakage]: per month the four
    counts, MAU, and quick ratio in exact ppm (churn floor 1,
    documented). Months carry as exact integers y*12+(m-1); the last
    observed month cannot yet churn anyone later, handled by joining
    churn events only into observed months.

    Shape: one (user, month) distinct agg, one user-partitioned
    lag/lead window (bounded by a user's active months), two monthly
    hash aggs and a tiny month-keyed join. Exact integers
    throughout."""
    e = _tbl(spark, sf_dir, "events")
    um = (e.select("user_id",
                   (F.year("ts") * 12 + F.month("ts") - 1)
                   .cast("long").alias("mn"))
          .distinct())
    w = Window.partitionBy("user_id").orderBy("mn")
    s = (um.withColumn("prev", F.lag("mn").over(w))
         .withColumn("nxt", F.lead("mn").over(w)))
    status = s.select(
        "mn",
        F.when(F.col("prev").isNull(), F.lit("new"))
        .when(F.col("prev") == F.col("mn") - 1, F.lit("retained"))
        .otherwise(F.lit("resurrected")).alias("st"),
        # the user churns OUT of month mn+1 unless next month is mn+1
        (F.col("nxt").isNull() | (F.col("nxt") > F.col("mn") + 1))
        .cast("int").alias("churns_after"))
    monthly = (status.groupBy("mn")
               .agg(F.count(F.lit(1)).cast("long").alias("mau"),
                    F.sum((F.col("st") == "new").cast("long"))
                    .cast("long").alias("n_new"),
                    F.sum((F.col("st") == "retained").cast("long"))
                    .cast("long").alias("n_retained"),
                    F.sum((F.col("st") == "resurrected").cast("long"))
                    .cast("long").alias("n_resurrected")))
    churn = (status.filter(F.col("churns_after") == 1)
             .select((F.col("mn") + 1).alias("mn"))
             .groupBy("mn")
             .agg(F.count(F.lit(1)).cast("long").alias("n_churned")))
    out = (monthly.join(churn, "mn", "left")
           .select("mn", "mau", "n_new", "n_retained", "n_resurrected",
                   F.coalesce("n_churned", F.lit(0)).cast("long")
                   .alias("n_churned")))
    return out.select(
        F.format_string("%04d-%02d", F.expr("mn DIV 12").cast("int"),
                        (F.col("mn") % 12 + 1).cast("int"))
        .alias("month"),
        "mau", "n_new", "n_retained", "n_resurrected", "n_churned",
        F.expr("(n_new + n_resurrected) * 1000000"
               " DIV greatest(n_churned, 1)").cast("long")
        .alias("quick_ratio_ppm"))


def _sql_rel_growth_accounting() -> str:
    return """
WITH um AS (
  SELECT DISTINCT user_id,
         CAST(year(ts) * 12 + month(ts) - 1 AS BIGINT) AS mn
  FROM events),
s AS (
  SELECT user_id, mn,
         lag(mn) OVER (PARTITION BY user_id ORDER BY mn) AS prev,
         lead(mn) OVER (PARTITION BY user_id ORDER BY mn) AS nxt
  FROM um),
status AS (
  SELECT mn,
         CASE WHEN prev IS NULL THEN 'new'
              WHEN prev = mn - 1 THEN 'retained'
              ELSE 'resurrected' END AS st,
         CAST(CASE WHEN nxt IS NULL OR nxt > mn + 1
              THEN 1 ELSE 0 END AS INT) AS churns_after
  FROM s),
monthly AS (
  SELECT mn, CAST(count(*) AS BIGINT) AS mau,
         CAST(sum(CASE WHEN st = 'new' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
         CAST(sum(CASE WHEN st = 'retained' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_retained,
         CAST(sum(CASE WHEN st = 'resurrected' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_resurrected
  FROM status GROUP BY 1),
churn AS (
  SELECT mn + 1 AS mn, CAST(count(*) AS BIGINT) AS n_churned
  FROM status WHERE churns_after = 1 GROUP BY 1)
SELECT printf('%04d-%02d', CAST(monthly.mn // 12 AS INT),
              CAST(monthly.mn % 12 + 1 AS INT)) AS month,
       mau, n_new, n_retained, n_resurrected,
       CAST(coalesce(churn.n_churned, 0) AS BIGINT) AS n_churned,
       CAST((n_new + n_resurrected) * 1000000
            // greatest(coalesce(churn.n_churned, 0), 1) AS BIGINT)
         AS quick_ratio_ppm
FROM monthly LEFT JOIN churn ON churn.mn = monthly.mn
"""


def q_stats_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-highs/lows test on the daily order series [K: the
    records test — under an exchangeable (trendless) series the
    expected number of running records is the harmonic number H_n
    (~ln n); materially more up-records means upward drift, more
    down-records means decay; it needs NO distributional assumption
    at all]: the observed strict record-high and record-low day
    counts (a day is a record iff it strictly beats every earlier
    day — integer ties kill records, documented), H_n computed by a
    DETERMINISTIC ascending fold over 1..n, and the up/down ratios
    in exact ppm.

    Shape: one distributed daily hash agg, a triangular broadcast
    self-join of the calendar-bounded daily table (the text_gini
    idiom — no running-max window), two O(1) aggs. Only the first
    agg sees the corpus."""
    o = _tbl(spark, sf_dir, "orders")
    daily = (o.select(F.to_date("o_orderdate").alias("day"))
             .groupBy("day")
             .agg(F.count(F.lit(1)).cast("long").alias("x")))
    rec = (daily.alias("a").join(
        F.broadcast(daily.alias("b")),
        F.col("b.day") < F.col("a.day"), "left")
        .groupBy(F.col("a.day").alias("day"))
        .agg(F.max(F.col("a.x")).cast("long").alias("x"),
             F.sum((F.col("b.x") >= F.col("a.x")).cast("long"))
             .alias("n_ge"),
             F.sum((F.col("b.x") <= F.col("a.x")).cast("long"))
             .alias("n_le")))
    cnt = rec.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum((F.coalesce("n_ge", F.lit(0)) == 0).cast("long"))
        .cast("long").alias("n_up_records"),
        F.sum((F.coalesce("n_le", F.lit(0)) == 0).cast("long"))
        .cast("long").alias("n_down_records"))
    return cnt.select(
        "n_days", "n_up_records", "n_down_records",
        F.round(F.aggregate(
            F.sequence(F.lit(1), F.col("n_days").cast("int")),
            F.lit(0.0),
            lambda acc, k: acc + F.lit(1.0) / k.cast("double")), 6)
        .alias("h_n"),
        F.expr("n_up_records * 1000000 DIV n_days").cast("long")
        .alias("up_ppm"),
        F.expr("n_down_records * 1000000 DIV n_days").cast("long")
        .alias("down_ppm"))


def _sql_stats_records() -> str:
    return """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1),
rec AS (
  SELECT a.day, max(a.x) AS x,
         sum(CASE WHEN b.x >= a.x THEN 1 ELSE 0 END) AS n_ge,
         sum(CASE WHEN b.x <= a.x THEN 1 ELSE 0 END) AS n_le
  FROM daily a LEFT JOIN daily b ON b.day < a.day
  GROUP BY a.day),
cnt AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(CASE WHEN coalesce(n_ge, 0) = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_up_records,
         CAST(sum(CASE WHEN coalesce(n_le, 0) = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_down_records
  FROM rec)
SELECT n_days, n_up_records, n_down_records,
       round(coalesce(list_reduce(
         list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(generate_series(1, CAST(n_days AS INT)),
                          k -> 1.0 / CAST(k AS DOUBLE))),
         (a, b) -> a + b), 0.0), 6) AS h_n,
       CAST(n_up_records * 1000000 // n_days AS BIGINT) AS up_ppm,
       CAST(n_down_records * 1000000 // n_days AS BIGINT) AS down_ppm
FROM cnt
"""


def q_stats_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-MIX anomaly detection [K: volume monitors
    (stats_dispersion, stats_anomaly_days) miss days where the total
    held but the composition flipped — an outage that converts
    purchases into errors keeps the count and breaks the mix; the
    divergence of each day's event-type distribution from the corpus
    mix is the composition alarm]: per day the event count, the mix
    entropy in bits, the Jensen-Shannon divergence to the corpus mix
    (base-2, bounded [0,1]), and a >0.1-bit shift flag. Every
    cross-type sum folds in DETERMINISTIC event_type order (the
    rel_user_entropy idiom) — type cardinality is tiny, and the fixed
    order kills the float-sum-order hazard.

    Shape: one (day, type) hash agg on the corpus, one tiny type agg
    broadcast back, per-day bounded-array folds. Only the first agg
    sees the corpus."""
    e = _tbl(spark, sf_dir, "events")
    dt = (e.select(F.to_date("ts").alias("day"), "event_type")
          .groupBy("day", "event_type")
          .agg(F.count(F.lit(1)).cast("long").alias("c")))
    tot = (dt.groupBy("event_type")
           .agg(F.sum("c").cast("long").alias("tc")))
    ntot = tot.agg(F.sum("tc").cast("long").alias("n_all"))
    j = (dt.join(F.broadcast(tot), "event_type")
         .crossJoin(F.broadcast(ntot)))
    per = (j.groupBy("day")
           .agg(F.sum("c").cast("long").alias("n_day"),
                F.sort_array(F.collect_list(F.struct(
                    F.col("event_type").alias("t"),
                    F.col("c").alias("c"),
                    F.col("tc").alias("tc"),
                    F.col("n_all").alias("n_all")))).alias("arr")))
    # H(day) = log2(n) - (1/n) * sum c*log2(c), deterministic fold
    ent = F.round(
        F.log2(F.col("n_day").cast("double"))
        - F.aggregate(F.col("arr"), F.lit(0.0),
                      lambda a, x: a + x.c.cast("double")
                      * F.log2(x.c.cast("double")))
        / F.col("n_day").cast("double"), 6)

    # JSD(P_day || P_corpus), base 2: sum over the day's types of
    # p/2*log2(p/m) + corpus-side q/2*log2(q/m) with m=(p+q)/2 —
    # corpus types absent today contribute via the q-only branch.
    def _pq(x):
        p = x.c.cast("double") / F.col("n_day").cast("double")
        q = x.tc.cast("double") / x.n_all.cast("double")
        m = (p + q) / F.lit(2.0)
        return (p / F.lit(2.0) * F.log2(p / m)
                + q / F.lit(2.0) * F.log2(q / m))

    # types with c=0 today (q-only): handled by folding over ALL
    # corpus types — arr contains only present types, so add the
    # missing-type correction from a second fold over the corpus
    # type table joined as an array.
    jsd_present = F.aggregate(F.col("arr"), F.lit(0.0),
                              lambda a, x: a + _pq(x))
    per2 = (per.crossJoin(F.broadcast(
        tot.crossJoin(F.broadcast(ntot))
        .agg(F.sort_array(F.collect_list(F.struct(
            F.col("event_type").alias("t"),
            F.col("tc").alias("tc"),
            F.col("n_all").alias("n_all")))).alias("all_types")))))
    missing = F.filter(
        F.col("all_types"),
        lambda y: ~F.exists(F.col("arr"), lambda x: x.t == y.t))
    jsd_missing = F.aggregate(
        missing, F.lit(0.0),
        lambda a, y: a + (y.tc.cast("double")
                          / y.n_all.cast("double")) / F.lit(2.0)
        * F.lit(1.0))
    jsd = F.round(jsd_present + jsd_missing, 6)
    return (per2.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_day"), ent.alias("mix_entropy"),
        jsd.alias("jsd_bits"))
        .withColumn("shifted", (F.col("jsd_bits") > 0.1).cast("int")))


def _sql_stats_mix_shift() -> str:
    return """
WITH dt AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
tot AS (
  SELECT event_type, CAST(sum(c) AS BIGINT) AS tc FROM dt GROUP BY 1),
ntot AS (SELECT CAST(sum(tc) AS BIGINT) AS n_all FROM tot),
j AS (
  SELECT dt.day, dt.event_type, dt.c, tot.tc, ntot.n_all
  FROM dt JOIN tot USING (event_type) CROSS JOIN ntot),
per AS (
  SELECT day, CAST(sum(c) AS BIGINT) AS n_day,
         list(struct_pack(t := event_type, c := c, tc := tc,
                          n_all := n_all)
              ORDER BY event_type) AS arr
  FROM j GROUP BY day),
alltypes AS (
  SELECT list(struct_pack(t := event_type, tc := tc, n_all := n_all)
              ORDER BY event_type) AS all_types
  FROM tot CROSS JOIN ntot),
calc AS (
  SELECT day, n_day,
         round(log2(CAST(n_day AS DOUBLE))
               - coalesce(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(arr, x ->
                     CAST(x.c AS DOUBLE)
                     * log2(CAST(x.c AS DOUBLE)))),
                   (a, b) -> a + b), 0.0)
                 / CAST(n_day AS DOUBLE), 6) AS mix_entropy,
         round(coalesce(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(arr, x ->
                   (CAST(x.c AS DOUBLE) / CAST(n_day AS DOUBLE)) / 2.0
                   * log2((CAST(x.c AS DOUBLE) / CAST(n_day AS DOUBLE))
                          / ((CAST(x.c AS DOUBLE)
                              / CAST(n_day AS DOUBLE)
                              + CAST(x.tc AS DOUBLE)
                                / CAST(x.n_all AS DOUBLE)) / 2.0))
                   + (CAST(x.tc AS DOUBLE) / CAST(x.n_all AS DOUBLE))
                     / 2.0
                   * log2((CAST(x.tc AS DOUBLE) / CAST(x.n_all AS DOUBLE))
                          / ((CAST(x.c AS DOUBLE)
                              / CAST(n_day AS DOUBLE)
                              + CAST(x.tc AS DOUBLE)
                                / CAST(x.n_all AS DOUBLE)) / 2.0)))),
                 (a, b) -> a + b), 0.0)
               + coalesce(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(
                     list_filter(all_types, y ->
                       NOT list_has_any(
                         list_transform(arr, x -> x.t), [y.t])),
                     y -> (CAST(y.tc AS DOUBLE)
                           / CAST(y.n_all AS DOUBLE)) / 2.0 * 1.0)),
                   (a, b) -> a + b), 0.0), 6) AS jsd_bits
  FROM per CROSS JOIN alltypes)
SELECT strftime(day, '%Y-%m-%d') AS day, n_day, mix_entropy, jsd_bits,
       CAST(CASE WHEN jsd_bits > 0.1 THEN 1 ELSE 0 END AS INT)
         AS shifted
FROM calc
"""


def q_sim_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding norm-hygiene audit [K: the vector-store intake check
    — zero vectors poison cosine (0/0), near-zero norms amplify
    quantization error, NaN components corrupt every distance; and a
    multimodal norm histogram reveals mixed encoder versions sharing
    one table]: the power-of-two histogram of squared norms in exact
    micro-units (bit-length binning, no libm), with corpus-wide
    zero / near-zero / NaN counts and the extreme norms attached.
    The squared norm folds over the vector's OWN component order
    (deterministic on both engines — arrays are ordered; no sort, no
    cross-engine sum-order hazard).

    Shape: map-only per-vector fold + one bin histogram agg + one
    O(1) corpus agg broadcast back. One scan, no shuffle beyond the
    tiny bin agg."""
    v = _tbl(spark, sf_dir, "embeddings")
    arr = F.expr("CAST(embedding AS ARRAY<DOUBLE>)")
    base = v.select(
        F.expr("CAST(round(aggregate(CAST(embedding AS ARRAY<DOUBLE>),"
               " CAST(0.0 AS DOUBLE), (a, x) -> a + x * x)"
               " * 1000000, 0) AS BIGINT)").alias("n2_u"),
        F.exists(arr, lambda x: F.isnan(x)).cast("int").alias("has_nan"))
    b = base.select(
        (F.length(F.bin(F.col("n2_u") + 1)) - 1).cast("int")
        .alias("bin"), "n2_u", "has_nan")
    hist = b.groupBy("bin").agg(F.count(F.lit(1)).cast("long")
                                .alias("n_vecs"))
    tot = b.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("n2_u") == 0).cast("long")).cast("long")
        .alias("n_zero"),
        F.sum((F.col("n2_u") < 1000).cast("long")).cast("long")
        .alias("n_tiny"),
        F.sum("has_nan").cast("long").alias("n_nan"),
        F.min("n2_u").cast("long").alias("min_n2_u"),
        F.max("n2_u").cast("long").alias("max_n2_u"))
    return (hist.crossJoin(F.broadcast(tot))
            .select("bin", "n_vecs", "n", "n_zero", "n_tiny", "n_nan",
                    "min_n2_u", "max_n2_u"))


def _sql_sim_norm_audit() -> str:
    return """
WITH base AS (
  SELECT CAST(round(coalesce(list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> x * x)),
           (a, b) -> a + b), 0.0) * 1000000, 0) AS BIGINT) AS n2_u,
         CAST(CASE WHEN len(list_filter(CAST(embedding AS DOUBLE[]),
                                        x -> isnan(x))) > 0
              THEN 1 ELSE 0 END AS INT) AS has_nan
  FROM embeddings),
b AS (
  SELECT CAST(length(bin(n2_u + 1)) - 1 AS INT) AS bin, n2_u, has_nan
  FROM base),
hist AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n_vecs FROM b GROUP BY 1),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN n2_u = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_zero,
         CAST(sum(CASE WHEN n2_u < 1000 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_tiny,
         CAST(sum(has_nan) AS BIGINT) AS n_nan,
         CAST(min(n2_u) AS BIGINT) AS min_n2_u,
         CAST(max(n2_u) AS BIGINT) AS max_n2_u
  FROM b)
SELECT bin, n_vecs, n, n_zero, n_tiny, n_nan, min_n2_u, max_n2_u
FROM hist CROSS JOIN tot
"""


def q_kg_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club connectivity of the KG [K: the network-science read
    on elite interconnection — do high-degree concepts link to EACH
    OTHER more densely than chance? a rising phi(k) means hub
    concepts form a core (one shuffle-hot block at query time), a
    flat one means hubs spread]: for each power-of-two degree
    threshold k the surviving node count, the undirected edge count
    among survivors, and the density phi in exact ppm
    (2E / (N(N-1))).

    Shape: one degree agg, a broadcast degree join onto the edge
    list (edges keyed by both endpoints — two joins, never
    all-pairs), one per-threshold conditional agg over the bounded
    threshold list. Exact integers throughout."""
    t = q_kg_triples(spark, sf_dir)
    edges = (t.select(F.col("subj").alias("u"), F.col("obj").alias("v"))
             .filter(F.col("u") != F.col("v")).distinct()
             .select(F.least("u", "v").alias("a"),
                     F.greatest("u", "v").alias("b")).distinct())
    deg = (edges.select(F.col("a").alias("n_id"))
           .unionAll(edges.select(F.col("b").alias("n_id")))
           .groupBy("n_id")
           .agg(F.count(F.lit(1)).cast("long").alias("deg")))
    ks = spark.range(0, 7).select(
        F.expr("shiftleft(1L, CAST(id AS INT))").cast("long")
        .alias("k"))
    nodes = (deg.crossJoin(F.broadcast(ks))
             .filter(F.col("deg") > F.col("k"))
             .groupBy("k")
             .agg(F.count(F.lit(1)).cast("long").alias("n_nodes")))
    da = deg.select(F.col("n_id").alias("a"),
                    F.col("deg").alias("da"))
    db = deg.select(F.col("n_id").alias("b"),
                    F.col("deg").alias("db"))
    ej = edges.join(F.broadcast(da), "a").join(F.broadcast(db), "b")
    ecnt = (ej.crossJoin(F.broadcast(ks))
            .filter((F.col("da") > F.col("k"))
                    & (F.col("db") > F.col("k")))
            .groupBy("k")
            .agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
    return (nodes.join(ecnt, "k", "left")
            .select("k", "n_nodes",
                    F.coalesce("n_edges", F.lit(0)).cast("long")
                    .alias("n_edges"))
            .filter(F.col("n_nodes") >= 2)
            .withColumn("phi_ppm", F.expr(
                "2 * n_edges * 1000000"
                " DIV (n_nodes * (n_nodes - 1))").cast("long")))


def _sql_kg_rich_club() -> str:
    return f"""
WITH triples AS ({_sql_kg_triples_body()}),
edges AS (
  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
  FROM (SELECT DISTINCT subj AS u, obj AS v FROM triples
        WHERE subj <> obj)),
deg AS (
  SELECT n_id, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT a AS n_id FROM edges
        UNION ALL SELECT b AS n_id FROM edges)
  GROUP BY 1),
ks AS (SELECT CAST(1 << CAST(unnest(generate_series(0, 6)) AS INT)
              AS BIGINT) AS k),
nodes AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_nodes
  FROM deg CROSS JOIN ks WHERE deg > k GROUP BY 1),
ej AS (
  SELECT e.a, e.b, da.deg AS da, db.deg AS db
  FROM edges e JOIN deg da ON da.n_id = e.a
               JOIN deg db ON db.n_id = e.b),
ecnt AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_edges
  FROM ej CROSS JOIN ks WHERE da > k AND db > k GROUP BY 1)
SELECT nodes.k, n_nodes,
       CAST(coalesce(ecnt.n_edges, 0) AS BIGINT) AS n_edges,
       CAST(2 * coalesce(ecnt.n_edges, 0) * 1000000
            // (n_nodes * (n_nodes - 1)) AS BIGINT) AS phi_ppm
FROM nodes LEFT JOIN ecnt ON ecnt.k = nodes.k
WHERE n_nodes >= 2
"""


ANOVA_FACTORS = ("o_orderpriority", "o_orderstatus")


def q_rel_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way variance decomposition (eta-squared) of order value by
    categorical factors [K: the 'which dimension explains the
    variance' triage — eta^2 = SS_between/SS_total tells an analyst
    whether priority or status structure order values before any
    modeling; the ANOVA F follows but eta^2 is the effect size that
    matters at 10^9 rows where everything is 'significant']: per
    factor the group count, exact integer cent sums, and eta^2 in
    round-6 — the between-group term folds S_g^2/n_g in
    DETERMINISTIC group-label order (bounded factor cardinality, the
    rel_user_entropy idiom).

    Shape: per factor one (group) hash agg + one O(1) fold — the
    corpus is scanned once per factor (a union keeps it one logical
    scan; Catalyst reuses the exchange). Exact integers until the
    final division."""
    o = _tbl(spark, sf_dir, "orders")
    outs = []
    for fac in ANOVA_FACTORS:
        # whole DOLLARS, not cents: sum(x^2) must stay in BIGINT at
        # sf0.1+ (cents^2 sums overflow); dollar resolution shifts
        # eta2 by < 1e-6 on this price scale and is the documented
        # trade (a 10^12-row build would move to DECIMAL(38) sums).
        dollars = F.expr("CAST(round(o_totalprice, 0) AS BIGINT)")
        g = (o.select(F.col(fac).alias("grp"), dollars.alias("c"))
             .groupBy("grp")
             .agg(F.count(F.lit(1)).cast("long").alias("ng"),
                  F.sum("c").cast("long").alias("sg"),
                  F.sum(F.col("c") * F.col("c")).cast("long")
                  .alias("ssg")))
        agg = g.agg(
            F.lit(fac).alias("factor"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("ng").cast("long").alias("n"),
            F.sum("sg").cast("long").alias("s"),
            F.sum("ssg").cast("long").alias("ss"),
            F.aggregate(
                F.sort_array(F.collect_list(F.struct(
                    F.col("grp").alias("g"), F.col("sg").alias("sg"),
                    F.col("ng").alias("ng")))),
                F.lit(0.0),
                lambda a, x: a + x.sg.cast("double")
                * x.sg.cast("double") / x.ng.cast("double"))
            .alias("between_raw"))
        outs.append(agg.select(
            "factor", "n_groups", "n",
            F.round((F.col("between_raw")
                     - F.col("s").cast("double")
                     * F.col("s").cast("double")
                     / F.col("n").cast("double"))
                    / (F.col("ss").cast("double")
                       - F.col("s").cast("double")
                       * F.col("s").cast("double")
                       / F.col("n").cast("double")), 6)
            .alias("eta2")))
    out = outs[0]
    for x in outs[1:]:
        out = out.unionByName(x)
    return out


def _sql_rel_anova() -> str:
    parts = []
    for fac in ANOVA_FACTORS:
        parts.append(f"""
SELECT '{fac}' AS factor,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(ng) AS BIGINT) AS n,
       round((coalesce(list_reduce(
                list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(
                    list(struct_pack(g := grp, sg := sg, ng := ng)
                         ORDER BY grp),
                    x -> CAST(x.sg AS DOUBLE) * CAST(x.sg AS DOUBLE)
                         / CAST(x.ng AS DOUBLE))),
                (a, b) -> a + b), 0.0)
              - CAST(sum(sg) AS DOUBLE) * CAST(sum(sg) AS DOUBLE)
                / CAST(sum(ng) AS DOUBLE))
             / (CAST(sum(ssg) AS DOUBLE)
                - CAST(sum(sg) AS DOUBLE) * CAST(sum(sg) AS DOUBLE)
                  / CAST(sum(ng) AS DOUBLE)), 6) AS eta2
FROM (
  SELECT {fac} AS grp, CAST(count(*) AS BIGINT) AS ng,
         CAST(sum(CAST(round(o_totalprice, 0) AS BIGINT))
              AS BIGINT) AS sg,
         CAST(sum(CAST(round(o_totalprice, 0) AS BIGINT)
                  * CAST(round(o_totalprice, 0) AS BIGINT))
              AS BIGINT) AS ssg
  FROM orders GROUP BY 1)""")
    return "\nUNION ALL\n".join(parts)


def q_rel_error_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error probability conditioned on the PRECEDING event [K: the
    cascade read — errors cluster behind specific prior actions;
    P(error | prev=purchase) >> P(error) means the payment path is
    the fault line, and the lift column ranks exactly that]: per
    preceding event type the transition count, how many transitioned
    INTO an error, the conditional error rate in exact ppm, the
    corpus base error rate, and the lift in exact ppm (rate/base,
    both exact rationals cross-multiplied into one DIV).

    Shape: one user-partitioned lag window (bounded per user), one
    per-prev-type hash agg, a 1-row base-rate agg broadcast back.
    Exact integers end to end."""
    e = _tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = (e.select("user_id", "ts", "event_id", "event_type")
         .withColumn("prev", F.lag("event_type").over(w))
         .filter(F.col("prev").isNotNull()))
    per = (s.groupBy("prev")
           .agg(F.count(F.lit(1)).cast("long").alias("n_trans"),
                F.sum((F.col("event_type") == "error").cast("long"))
                .cast("long").alias("n_err")))
    base = per.agg(F.sum("n_trans").cast("long").alias("n_all"),
                   F.sum("n_err").cast("long").alias("e_all"))
    return (per.crossJoin(F.broadcast(base))
            .select(F.col("prev").alias("prev_type"), "n_trans",
                    "n_err",
                    F.expr("n_err * 1000000 DIV n_trans").cast("long")
                    .alias("err_rate_ppm"),
                    F.expr("e_all * 1000000 DIV n_all").cast("long")
                    .alias("base_rate_ppm"),
                    F.expr("CASE WHEN e_all > 0 THEN"
                           " n_err * n_all * 1000000"
                           " DIV (n_trans * e_all) ELSE 0 END")
                    .cast("long").alias("lift_ppm")))


def _sql_rel_error_cascade() -> str:
    return """
WITH s AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events),
per AS (
  SELECT prev, CAST(count(*) AS BIGINT) AS n_trans,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_err
  FROM s WHERE prev IS NOT NULL GROUP BY 1),
base AS (
  SELECT CAST(sum(n_trans) AS BIGINT) AS n_all,
         CAST(sum(n_err) AS BIGINT) AS e_all
  FROM per)
SELECT prev AS prev_type, n_trans, n_err,
       CAST(n_err * 1000000 // n_trans AS BIGINT) AS err_rate_ppm,
       CAST(e_all * 1000000 // n_all AS BIGINT) AS base_rate_ppm,
       CAST(CASE WHEN e_all > 0
                 THEN n_err * n_all * 1000000 // (n_trans * e_all)
                 ELSE 0 END AS BIGINT) AS lift_ppm
FROM per CROSS JOIN base
"""


def q_rel_fulfillment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency profile per month [K: the fulfillment
    SLA readout — how long after ordering do line items actually
    ship, tracked monthly so a slipping warehouse shows as a rising
    median]: per order month the line count, exact doubled-integer
    MEDIAN ship-delay days, exact mean (DIV), max, and the share
    shipping within 30/90 days in exact ppm.

    Shape: the orders-lineitem equi-join (the canonical big-fact
    join — shuffle on orderkey; at 10^12 rows bucket both sides),
    map-side day arithmetic, one per-month agg. Exact integers end
    to end."""
    o = _tbl(spark, sf_dir, "orders")
    li = _tbl(spark, sf_dir, "lineitem")
    j = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
         .select((F.year("o_orderdate") * 12
                  + F.month("o_orderdate") - 1).cast("long")
                 .alias("mn"),
                 F.datediff(F.to_date("l_shipdate"),
                            F.to_date("o_orderdate")).cast("long")
                 .alias("delay")))
    agg = (j.groupBy("mn")
           .agg(F.count(F.lit(1)).cast("long").alias("n_lines"),
                F.expr("CAST(percentile(delay * 2, 0.5) AS BIGINT)")
                .alias("med2_days"),
                F.sum("delay").cast("long").alias("s_delay"),
                F.max("delay").cast("long").alias("max_days"),
                F.sum((F.col("delay") <= 30).cast("long")).cast("long")
                .alias("n_30"),
                F.sum((F.col("delay") <= 90).cast("long")).cast("long")
                .alias("n_90")))
    return agg.select(
        F.format_string("%04d-%02d", F.expr("mn DIV 12").cast("int"),
                        (F.col("mn") % 12 + 1).cast("int"))
        .alias("month"),
        "n_lines", "med2_days",
        F.expr("s_delay DIV n_lines").cast("long").alias("mean_days"),
        "max_days",
        F.expr("n_30 * 1000000 DIV n_lines").cast("long")
        .alias("within_30d_ppm"),
        F.expr("n_90 * 1000000 DIV n_lines").cast("long")
        .alias("within_90d_ppm"))


def _sql_rel_fulfillment() -> str:
    return """
WITH j AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
              AS BIGINT) AS mn,
         CAST(datediff('day', CAST(o_orderdate AS DATE),
                       CAST(l_shipdate AS DATE)) AS BIGINT) AS delay
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
agg AS (
  SELECT mn, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(quantile_cont(delay * 2, 0.5) AS BIGINT) AS med2_days,
         CAST(sum(delay) AS BIGINT) AS s_delay,
         CAST(max(delay) AS BIGINT) AS max_days,
         CAST(sum(CASE WHEN delay <= 30 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_30,
         CAST(sum(CASE WHEN delay <= 90 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_90
  FROM j GROUP BY 1)
SELECT printf('%04d-%02d', CAST(mn // 12 AS INT),
              CAST(mn % 12 + 1 AS INT)) AS month,
       n_lines, med2_days,
       CAST(s_delay // n_lines AS BIGINT) AS mean_days, max_days,
       CAST(n_30 * 1000000 // n_lines AS BIGINT) AS within_30d_ppm,
       CAST(n_90 * 1000000 // n_lines AS BIGINT) AS within_90d_ppm
FROM agg
"""


def q_sim_knn_label_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label-noise detection [K: the classic Wilson-editing /
    confident-learning-lite QA on labeled training vectors — if a
    point's k nearest neighbors vote for a DIFFERENT label by a
    clear margin, the point's label is suspect; data teams run
    exactly this before fine-tuning on weak labels]: per node its own
    label, the neighbor-majority label (deterministic tie -> smallest
    label id), the vote counts, and the suspect flag (majority
    disagrees AND wins by >= 2 votes).

    Shape: the kNN graph's bucketed join, one broadcast label join
    onto the edge list, one (node, neighbor-label) agg, one struct-
    max per node (no rank window). Never all-pairs."""
    from ..operators.simsearch import knn_graph
    vecs = _tbl(spark, sf_dir, "embeddings")
    g = knn_graph(vecs, k=KNNG_K, n_planes=KNNG_N_PLANES)
    lbl = vecs.select(F.col("vec_id").alias("dst"),
                      F.col("label").alias("nlbl"))
    own = vecs.select("vec_id", "label")
    votes = (g.join(F.broadcast(lbl), "dst")
             .groupBy(F.col("src").alias("vec_id"), "nlbl")
             .agg(F.count(F.lit(1)).cast("long").alias("v")))
    best = (votes.groupBy("vec_id")
            .agg(F.max(F.struct(F.col("v"),
                                (-F.col("nlbl")).alias("nl")))
                 .alias("top"),
                 F.sum("v").cast("long").alias("k_used")))
    j = (own.join(best, "vec_id", "left")
         .select("vec_id", "label",
                 (-F.col("top.nl")).cast("int").alias("majority_label"),
                 F.coalesce(F.col("top.v"), F.lit(0)).cast("long")
                 .alias("majority_votes"),
                 F.coalesce("k_used", F.lit(0)).cast("long")
                 .alias("k_used")))
    own_votes = (votes.select(F.col("vec_id"),
                              F.col("nlbl").cast("int").alias("label"),
                              F.col("v").alias("own_v")))
    return (j.join(own_votes, ["vec_id", "label"], "left")
            .select("vec_id", "label", "majority_label",
                    "majority_votes",
                    F.coalesce("own_v", F.lit(0)).cast("long")
                    .alias("own_votes"),
                    "k_used",
                    ((F.col("majority_label") != F.col("label"))
                     & (F.col("majority_votes")
                        - F.coalesce("own_v", F.lit(0)) >= 2)
                     & (F.col("k_used") > 0)).cast("int")
                    .alias("suspect")))


def _sql_sim_knn_label_smooth() -> str:
    from ..operators.simsearch import hyperplanes
    planes = hyperplanes(KNNG_N_PLANES, 64)
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(nv, {_sql_vec_lit(p)}) >= 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes))
    return f"""
WITH v AS (SELECT vec_id AS nid, cast(embedding AS DOUBLE[]) AS nv,
                  label FROM embeddings),
b AS (SELECT nid, nv, label, {bucket} AS bucket FROM v),
pairs AS (
  SELECT a.nid AS src, c.nid AS dst, c.label AS nlbl,
         round(list_cosine_similarity(a.nv, c.nv), 6) AS cos
  FROM b a JOIN b c USING (bucket)
  WHERE a.nid <> c.nid),
topk AS (
  SELECT src, dst, nlbl FROM (
    SELECT src, dst, nlbl,
           row_number() OVER (PARTITION BY src
                              ORDER BY cos DESC, dst ASC) AS rk
    FROM pairs) WHERE rk <= {KNNG_K}),
votes AS (
  SELECT src AS vec_id, nlbl, CAST(count(*) AS BIGINT) AS vv
  FROM topk GROUP BY 1, 2),
best AS (
  SELECT vec_id,
         first(nlbl ORDER BY vv DESC, nlbl ASC) AS majority_label,
         CAST(max(vv) AS BIGINT) AS majority_votes,
         CAST(sum(vv) AS BIGINT) AS k_used
  FROM votes GROUP BY vec_id),
own AS (SELECT nid AS vec_id, label FROM v)
SELECT own.vec_id, own.label,
       CAST(best.majority_label AS INT) AS majority_label,
       CAST(coalesce(best.majority_votes, 0) AS BIGINT)
         AS majority_votes,
       CAST(coalesce(ov.vv, 0) AS BIGINT) AS own_votes,
       CAST(coalesce(best.k_used, 0) AS BIGINT) AS k_used,
       CAST(CASE WHEN best.majority_label <> own.label
                  AND coalesce(best.majority_votes, 0)
                      - coalesce(ov.vv, 0) >= 2
                  AND coalesce(best.k_used, 0) > 0
            THEN 1 ELSE 0 END AS INT) AS suspect
FROM own LEFT JOIN best USING (vec_id)
LEFT JOIN votes ov ON ov.vec_id = own.vec_id
                  AND ov.nlbl = own.label
"""


def q_rel_hhi_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue-concentration trend (Herfindahl-Hirschman
    index over customers) [K: the account-concentration risk read —
    a rising HHI means revenue consolidates into a few whales (churn
    risk), a falling one means broadening; antitrust thresholds
    (0.15/0.25) give the standard bands]: per month the customer
    count, total revenue in whole dollars, the HHI in ppm computed as
    sq DIV (R^2 DIV 1e6) — the multiplier inverted into the
    denominator because sq*1e6 overflows BIGINT (observed at sf0.01;
    the floor-of-denominator rounding is mirrored in the oracle) —
    the top-customer share in
    exact ppm, and the HHI band.

    Shape: one (month, customer) hash agg on the corpus, one
    per-month agg of squares. Dollars not cents so the square-sums
    stay in BIGINT at sf0.1+ (the rel_anova trade, documented)."""
    o = _tbl(spark, sf_dir, "orders")
    mc = (o.select((F.year("o_orderdate") * 12
                    + F.month("o_orderdate") - 1).cast("long")
                   .alias("mn"),
                   "o_custkey",
                   F.expr("CAST(round(o_totalprice, 0) AS BIGINT)")
                   .alias("d"))
          .groupBy("mn", "o_custkey")
          .agg(F.sum("d").cast("long").alias("r")))
    agg = (mc.groupBy("mn")
           .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
                F.sum("r").cast("long").alias("rev"),
                F.sum(F.col("r") * F.col("r")).cast("long")
                .alias("sq"),
                F.max("r").cast("long").alias("top_r")))
    return agg.select(
        F.format_string("%04d-%02d", F.expr("mn DIV 12").cast("int"),
                        (F.col("mn") % 12 + 1).cast("int"))
        .alias("month"),
        "n_customers", "rev",
        F.expr("sq DIV greatest(rev * rev DIV 1000000, 1)")
        .cast("long").alias("hhi_ppm"),
        F.expr("top_r * 1000000 DIV rev").cast("long")
        .alias("top_share_ppm"),
        F.expr("CASE WHEN sq DIV greatest(rev * rev DIV 1000000, 1)"
               " >= 250000 THEN 'high'"
               " WHEN sq DIV greatest(rev * rev DIV 1000000, 1)"
               " >= 150000 THEN 'moderate' ELSE 'low' END")
        .alias("band"))


def _sql_rel_hhi_trend() -> str:
    return """
WITH mc AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
              AS BIGINT) AS mn,
         o_custkey,
         CAST(sum(CAST(round(o_totalprice, 0) AS BIGINT)) AS BIGINT)
           AS r
  FROM orders GROUP BY 1, 2),
agg AS (
  SELECT mn, CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(r) AS BIGINT) AS rev,
         CAST(sum(r * r) AS BIGINT) AS sq,
         CAST(max(r) AS BIGINT) AS top_r
  FROM mc GROUP BY 1)
SELECT printf('%04d-%02d', CAST(mn // 12 AS INT),
              CAST(mn % 12 + 1 AS INT)) AS month,
       n_customers, rev,
       CAST(sq // greatest(rev * rev // 1000000, 1) AS BIGINT)
         AS hhi_ppm,
       CAST(top_r * 1000000 // rev AS BIGINT) AS top_share_ppm,
       CASE WHEN sq // greatest(rev * rev // 1000000, 1) >= 250000
            THEN 'high'
            WHEN sq // greatest(rev * rev // 1000000, 1) >= 150000
            THEN 'moderate' ELSE 'low' END AS band
FROM agg
"""


def q_stats_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the user event process [K: the predictability
    read — H(next|prev) from the bigram transition matrix vs the
    marginal H(next); a big gap means behavior is sequence-
    predictable (prefetch, cache, precompute the next screen), a
    tiny one means memoryless]: one row with the transition count,
    marginal next-entropy, prev-entropy, joint bigram entropy,
    conditional entropy H(next|prev) = H(joint) - H(prev), and the
    information gain H(next) - H(next|prev). Every entropy folds its
    c*log2(c) sum in DETERMINISTIC key order (bounded type
    vocabulary — the rel_user_entropy idiom); the joint key is
    prev||'|'||next (types contain no '|').

    Shape: one user-partitioned lag window, one (prev,next) hash agg
    (type-vocabulary-sized output), three ordered folds over that
    tiny table. Only the window sees the corpus."""
    e = _tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (e.select("user_id", "ts", "event_id",
                   F.col("event_type").alias("nxt"))
          .withColumn("prev", F.lag("nxt").over(w))
          .filter(F.col("prev").isNotNull())
          .groupBy("prev", "nxt")
          .agg(F.count(F.lit(1)).cast("long").alias("c")))

    def fold_ent(pairs_col):
        return F.aggregate(pairs_col, F.lit(0.0),
                           lambda a, x: a + x.c.cast("double")
                           * F.log2(x.c.cast("double")))

    agg = tr.agg(
        F.sum("c").cast("long").alias("n"),
        F.sort_array(F.collect_list(F.struct(
            F.concat_ws("|", "prev", "nxt").alias("k"),
            F.col("c").alias("c")))).alias("joint"))
    prev_m = (tr.groupBy("prev").agg(F.sum("c").cast("long").alias("c"))
              .agg(F.sort_array(F.collect_list(F.struct(
                  F.col("prev").alias("k"), F.col("c").alias("c"))))
                  .alias("arr")))
    nxt_m = (tr.groupBy("nxt").agg(F.sum("c").cast("long").alias("c"))
             .agg(F.sort_array(F.collect_list(F.struct(
                 F.col("nxt").alias("k"), F.col("c").alias("c"))))
                 .alias("arr")))
    j = (agg.crossJoin(F.broadcast(prev_m.select(
        F.col("arr").alias("prevm"))))
        .crossJoin(F.broadcast(nxt_m.select(
            F.col("arr").alias("nxtm")))))
    ln = F.log2(F.col("n").cast("double"))
    nd = F.col("n").cast("double")
    h_joint = F.round(ln - fold_ent(F.col("joint")) / nd, 6)
    h_prev = F.round(ln - fold_ent(F.col("prevm")) / nd, 6)
    h_next = F.round(ln - fold_ent(F.col("nxtm")) / nd, 6)
    return j.select(
        F.col("n").alias("n_trans"),
        h_next.alias("h_next"), h_prev.alias("h_prev"),
        h_joint.alias("h_joint"),
        F.round(h_joint - h_prev, 6).alias("h_cond"),
        F.round(h_next - (h_joint - h_prev), 6).alias("info_gain"))


def _sql_stats_entropy_rate() -> str:
    fold = ("coalesce(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
            " list_transform({src}, x -> CAST(x.c AS DOUBLE)"
            " * log2(CAST(x.c AS DOUBLE)))), (a, b) -> a + b), 0.0)")
    return f"""
WITH s AS (
  SELECT event_type AS nxt,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events),
tr AS (
  SELECT prev, nxt, CAST(count(*) AS BIGINT) AS c
  FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
joint AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         list(struct_pack(k := prev || '|' || nxt, c := c)
              ORDER BY prev || '|' || nxt) AS arr
  FROM tr),
prevm AS (
  SELECT list(struct_pack(k := prev, c := c) ORDER BY prev) AS arr
  FROM (SELECT prev, CAST(sum(c) AS BIGINT) AS c FROM tr GROUP BY 1)),
nxtm AS (
  SELECT list(struct_pack(k := nxt, c := c) ORDER BY nxt) AS arr
  FROM (SELECT nxt, CAST(sum(c) AS BIGINT) AS c FROM tr GROUP BY 1))
SELECT joint.n AS n_trans,
       round(log2(CAST(n AS DOUBLE))
             - {fold.format(src='nxtm.arr')} / CAST(n AS DOUBLE), 6)
         AS h_next,
       round(log2(CAST(n AS DOUBLE))
             - {fold.format(src='prevm.arr')} / CAST(n AS DOUBLE), 6)
         AS h_prev,
       round(log2(CAST(n AS DOUBLE))
             - {fold.format(src='joint.arr')} / CAST(n AS DOUBLE), 6)
         AS h_joint,
       round(round(log2(CAST(n AS DOUBLE))
                   - {fold.format(src='joint.arr')}
                     / CAST(n AS DOUBLE), 6)
             - round(log2(CAST(n AS DOUBLE))
                     - {fold.format(src='prevm.arr')}
                       / CAST(n AS DOUBLE), 6), 6) AS h_cond,
       round(round(log2(CAST(n AS DOUBLE))
                   - {fold.format(src='nxtm.arr')}
                     / CAST(n AS DOUBLE), 6)
             - (round(log2(CAST(n AS DOUBLE))
                      - {fold.format(src='joint.arr')}
                        / CAST(n AS DOUBLE), 6)
                - round(log2(CAST(n AS DOUBLE))
                        - {fold.format(src='prevm.arr')}
                          / CAST(n AS DOUBLE), 6)), 6) AS info_gain
FROM joint CROSS JOIN prevm CROSS JOIN nxtm
"""


def q_stats_transition_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-dynamics drift: exact L1 distance between the bigram
    transition distributions of the first and second half of the
    span [K: composition monitors (stats_psi, stats_mix_shift) watch
    WHAT happens; this watches what-FOLLOWS-what — a bot that keeps
    the event mix but loops a fixed sequence flips exactly this
    matrix]: per (prev,next) pair the half-counts and probabilities
    in exact ppm, and the total L1 computed with ZERO floats — the
    common-denominator identity sum|c1*N2 - c2*N1| * 1e6 DIV (N1*N2)
    (BIGINT-safe to ~1e9 transitions per half; beyond that, divide
    first — documented).

    Shape: one user-partitioned lag window, one (prev,next) hash agg
    with conditional half-sums (type-vocabulary-sized), one 1-row
    exact agg broadcast back. Only the window sees the corpus."""
    e = _tbl(spark, sf_dir, "events")
    span = e.agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (e.crossJoin(F.broadcast(span))
          .select("user_id", "ts", "event_id",
                  F.col("event_type").alias("nxt"),
                  (F.unix_timestamp(F.col("ts").cast("timestamp")) * 2
                   >= F.unix_timestamp(F.col("t0").cast("timestamp"))
                   + F.unix_timestamp(F.col("t1").cast("timestamp")))
                  .cast("int").alias("half"))
          .withColumn("prev", F.lag("nxt").over(w))
          .filter(F.col("prev").isNotNull())
          .groupBy("prev", "nxt")
          .agg(F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
               .cast("long").alias("c1"),
               F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
               .cast("long").alias("c2")))
    tot = tr.agg(F.sum("c1").cast("long").alias("n1"),
                 F.sum("c2").cast("long").alias("n2"))
    k = tr.crossJoin(F.broadcast(tot))
    l1 = k.agg(F.sum(F.abs(F.col("c1") * F.col("n2")
                           - F.col("c2") * F.col("n1")))
               .cast("long").alias("num"),
               F.max(F.col("n1") * F.col("n2")).cast("long")
               .alias("den"))
    return (k.crossJoin(F.broadcast(l1))
            .select("prev", "nxt", "c1", "c2",
                    F.expr("c1 * 1000000 DIV greatest(n1, 1)")
                    .cast("long").alias("p1_ppm"),
                    F.expr("c2 * 1000000 DIV greatest(n2, 1)")
                    .cast("long").alias("p2_ppm"),
                    F.expr("num * 1000000 DIV greatest(den, 1)")
                    .cast("long").alias("l1_ppm"),
                    F.expr("CASE WHEN num * 1000000"
                           " DIV greatest(den, 1) > 200000"
                           " THEN 1 ELSE 0 END").cast("int")
                    .alias("drifted")))


def _sql_stats_transition_drift() -> str:
    return """
WITH span AS (SELECT min(ts) AS t0, max(ts) AS t1 FROM events),
s AS (
  SELECT user_id, ts, event_id, event_type AS nxt,
         CAST(CASE WHEN CAST(epoch(date_trunc('second', ts))
                        AS BIGINT) * 2
                   >= CAST(epoch(date_trunc('second', t0)) AS BIGINT)
                    + CAST(epoch(date_trunc('second', t1)) AS BIGINT)
              THEN 1 ELSE 0 END AS INT) AS half
  FROM events CROSS JOIN span),
l AS (
  SELECT half, nxt,
         lag(nxt) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS prev
  FROM s),
tr AS (
  SELECT prev, nxt,
         CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS c1,
         CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS c2
  FROM l WHERE prev IS NOT NULL GROUP BY 1, 2),
tot AS (
  SELECT CAST(sum(c1) AS BIGINT) AS n1,
         CAST(sum(c2) AS BIGINT) AS n2
  FROM tr),
l1 AS (
  SELECT CAST(sum(abs(c1 * n2 - c2 * n1)) AS BIGINT) AS num,
         CAST(max(n1 * n2) AS BIGINT) AS den
  FROM tr CROSS JOIN tot)
SELECT prev, nxt, c1, c2,
       CAST(c1 * 1000000 // greatest(n1, 1) AS BIGINT) AS p1_ppm,
       CAST(c2 * 1000000 // greatest(n2, 1) AS BIGINT) AS p2_ppm,
       CAST(num * 1000000 // greatest(den, 1) AS BIGINT) AS l1_ppm,
       CAST(CASE WHEN num * 1000000 // greatest(den, 1) > 200000
            THEN 1 ELSE 0 END AS INT) AS drifted
FROM tr CROSS JOIN tot CROSS JOIN l1
"""


def q_sim_intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TwoNN intrinsic-dimension estimate of the embedding manifold
    [K: Facco et al.'s two-nearest-neighbor MLE — ID ~= n / sum
    ln(r2/r1); embeddings that nominally live in 64-d usually
    concentrate on a much lower-dimensional manifold, and the ID
    number drives index choice (IVF cell counts, HNSW M) and
    compression budgets]: per anchor the two nearest in-bucket
    cosine DISTANCES as exact ppm integers, the log-ratio
    INTEGERIZED to nano-units per anchor (round(ln(d2/d1)*1e9) —
    an exact BIGINT sum is order-invariant where a raw double sum is
    engine-order-dependent), anchors with d1=0 (exact duplicates) or
    fewer than 2 bucket mates excluded and counted.

    Shape: the kNN graph's bucketed join (never all-pairs), one
    per-anchor agg, one exact integer 1-row sum. The estimator
    quality is bucket-local, same recall trade as ann_lsh_topk."""
    from ..operators.simsearch import knn_graph
    vecs = _tbl(spark, sf_dir, "embeddings")
    g = knn_graph(vecs, k=2, n_planes=KNNG_N_PLANES)
    d = g.select("src", "rk",
                 (F.lit(1000000)
                  - F.expr("CAST(round(cos * 1000000, 0) AS BIGINT)"))
                 .alias("d_ppm"))
    per = (d.groupBy("src")
           .agg(F.count(F.lit(1)).cast("long").alias("k_found"),
                F.min(F.when(F.col("rk") == 1, F.col("d_ppm")))
                .cast("long").alias("d1"),
                F.min(F.when(F.col("rk") == 2, F.col("d_ppm")))
                .cast("long").alias("d2")))
    usable = per.filter((F.col("k_found") >= 2) & (F.col("d1") > 0))
    n_all = vecs.agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
    s = usable.select(F.expr(
        "CAST(round(ln(CAST(d2 AS DOUBLE) / CAST(d1 AS DOUBLE))"
        " * 1000000000, 0) AS BIGINT)").alias("ln_nano"))
    agg = s.agg(F.count(F.lit(1)).cast("long").alias("n_used"),
                F.sum("ln_nano").cast("long").alias("sum_ln_nano"))
    return (agg.crossJoin(F.broadcast(n_all))
            .select("n_used", "sum_ln_nano", "n_vecs",
                    (F.col("n_vecs") - F.col("n_used")).cast("long")
                    .alias("n_skipped"),
                    F.round(F.when(
                        F.col("sum_ln_nano") > 0,
                        F.col("n_used").cast("double") * 1.0e9
                        / F.col("sum_ln_nano").cast("double")), 6)
                    .alias("id_hat")))


def _sql_sim_intrinsic_dim() -> str:
    from ..operators.simsearch import hyperplanes
    planes = hyperplanes(KNNG_N_PLANES, 64)
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(nv, {_sql_vec_lit(p)}) >= 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes))
    return f"""
WITH v AS (SELECT vec_id AS nid, cast(embedding AS DOUBLE[]) AS nv
           FROM embeddings),
b AS (SELECT nid, nv, {bucket} AS bucket FROM v),
pairs AS (
  SELECT a.nid AS src, c.nid AS dst,
         round(list_cosine_similarity(a.nv, c.nv), 6) AS cos
  FROM b a JOIN b c USING (bucket)
  WHERE a.nid <> c.nid),
topk AS (
  SELECT src, rk,
         CAST(1000000 - CAST(round(cos * 1000000, 0) AS BIGINT)
              AS BIGINT) AS d_ppm
  FROM (
    SELECT src, dst, cos,
           row_number() OVER (PARTITION BY src
                              ORDER BY cos DESC, dst ASC) AS rk
    FROM pairs) WHERE rk <= 2),
per AS (
  SELECT src, CAST(count(*) AS BIGINT) AS k_found,
         CAST(min(CASE WHEN rk = 1 THEN d_ppm END) AS BIGINT) AS d1,
         CAST(min(CASE WHEN rk = 2 THEN d_ppm END) AS BIGINT) AS d2
  FROM topk GROUP BY 1),
usable AS (SELECT * FROM per WHERE k_found >= 2 AND d1 > 0),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_used,
         CAST(coalesce(sum(CAST(round(ln(CAST(d2 AS DOUBLE)
                                          / CAST(d1 AS DOUBLE))
                                      * 1000000000, 0) AS BIGINT)),
                       0) AS BIGINT) AS sum_ln_nano
  FROM usable),
na AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs FROM v)
SELECT n_used, sum_ln_nano, n_vecs,
       CAST(n_vecs - n_used AS BIGINT) AS n_skipped,
       round(CASE WHEN sum_ln_nano > 0
             THEN CAST(n_used AS DOUBLE) * 1.0e9
                  / CAST(sum_ln_nano AS DOUBLE) END, 6) AS id_hat
FROM agg CROSS JOIN na
"""


def q_kg_domain_range_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned domain/range conformance audit per predicate [K: the
    OWL domain/range constraint check WITHOUT a declared schema —
    learn each predicate's dominant subject and object NAMESPACE
    (the id prefix before ':'), then count triples that deviate;
    deviations are either modeling drift or extraction bugs, and
    this audit is how a KG team finds them at 10^12 triples]: per
    predicate the dominant domain/range, triple count, conforming
    count (both ends dominant), and violation ppm.

    Shape: map-side namespace projection, one (pred, ns-pair) hash
    agg, per-pred struct-max dominants (no window), one broadcast
    join back. Exact integers end to end."""
    t = q_kg_triples(spark, sf_dir)
    ns = t.select(
        "pred",
        F.substring_index("subj", ":", 1).alias("sns"),
        F.substring_index("obj", ":", 1).alias("ons"))
    cnt = (ns.groupBy("pred", "sns", "ons")
           .agg(F.count(F.lit(1)).cast("long").alias("c")))
    doms = (ns.groupBy("pred", "sns")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
            .groupBy("pred")
            .agg(F.max(F.struct(F.col("c"),
                                F.col("sns").alias("v"))).alias("t"))
            .select("pred", F.col("t.v").alias("dom_ns")))
    rngs = (ns.groupBy("pred", "ons")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
            .groupBy("pred")
            .agg(F.max(F.struct(F.col("c"),
                                F.col("ons").alias("v"))).alias("t"))
            .select("pred", F.col("t.v").alias("rng_ns")))
    per = (cnt.groupBy("pred")
           .agg(F.sum("c").cast("long").alias("n_triples")))
    conf = (cnt.join(F.broadcast(doms), "pred")
            .join(F.broadcast(rngs), "pred")
            .groupBy("pred")
            .agg(F.sum(F.when((F.col("sns") == F.col("dom_ns"))
                              & (F.col("ons") == F.col("rng_ns")),
                              F.col("c")).otherwise(0))
                 .cast("long").alias("n_conform")))
    return (per.join(conf, "pred").join(F.broadcast(doms), "pred")
            .join(F.broadcast(rngs), "pred")
            .select("pred", "dom_ns", "rng_ns", "n_triples",
                    "n_conform",
                    F.expr("(n_triples - n_conform) * 1000000"
                           " DIV n_triples").cast("long")
                    .alias("violation_ppm")))


def _sql_kg_domain_range_audit() -> str:
    return f"""
WITH triples AS ({_sql_kg_triples_body()}),
ns AS (
  SELECT pred, split_part(subj, ':', 1) AS sns,
         split_part(obj, ':', 1) AS ons
  FROM triples),
cnt AS (
  SELECT pred, sns, ons, CAST(count(*) AS BIGINT) AS c
  FROM ns GROUP BY 1, 2, 3),
doms AS (
  SELECT pred, first(sns ORDER BY c DESC, sns ASC) AS dom_ns
  FROM (SELECT pred, sns, CAST(count(*) AS BIGINT) AS c
        FROM ns GROUP BY 1, 2)
  GROUP BY pred),
rngs AS (
  SELECT pred, first(ons ORDER BY c DESC, ons ASC) AS rng_ns
  FROM (SELECT pred, ons, CAST(count(*) AS BIGINT) AS c
        FROM ns GROUP BY 1, 2)
  GROUP BY pred),
per AS (
  SELECT pred, CAST(sum(c) AS BIGINT) AS n_triples
  FROM cnt GROUP BY 1),
conf AS (
  SELECT cnt.pred,
         CAST(sum(CASE WHEN cnt.sns = doms.dom_ns
                        AND cnt.ons = rngs.rng_ns
                  THEN cnt.c ELSE 0 END) AS BIGINT) AS n_conform
  FROM cnt JOIN doms USING (pred) JOIN rngs USING (pred)
  GROUP BY cnt.pred)
SELECT per.pred, dom_ns, rng_ns, n_triples, n_conform,
       CAST((n_triples - n_conform) * 1000000 // n_triples AS BIGINT)
         AS violation_ppm
FROM per JOIN conf USING (pred) JOIN doms USING (pred)
JOIN rngs USING (pred)
"""


HASH_PREFIX_BITS = (8, 16, 24)


def q_dedup_hash_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-prefix collision audit [K: the partition-key QA every
    hash-sharded system needs — dedup keys, shuffle partitions and
    LSH buckets all key on hash PREFIXES, and observed collisions
    far above the birthday bound n(n-1)/2^(k+1) mean a biased hash
    or adversarial keys (hotspot shards at 10^12 rows)]: for each
    prefix width k in {8,16,24} bits the distinct-key count, the
    distinct-prefix count, observed collisions (keys minus
    prefixes), the exact-integer birthday expectation, and the
    observed/expected ratio in ppm (floor-guarded).

    Shape: one distinct-hash agg, a 3x bounded explode, per-k
    distinct aggs. Exact integers end to end."""
    d = _docs(spark, sf_dir)
    keys = d.select(F.md5(F.coalesce(F.col("text"), F.lit("")))
                    .alias("h")).distinct()
    ks = spark.createDataFrame([(k,) for k in HASH_PREFIX_BITS],
                               "k int")
    pref = (keys.crossJoin(F.broadcast(ks))
            .select("k", F.expr("substring(h, 1, k DIV 4)")
                    .alias("p")))
    per = (pref.groupBy("k")
           .agg(F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.countDistinct("p").cast("long").alias("n_prefixes")))
    return per.select(
        "k", "n_keys", "n_prefixes",
        (F.col("n_keys") - F.col("n_prefixes")).cast("long")
        .alias("collisions"),
        F.expr("n_keys * (n_keys - 1)"
               " DIV shiftleft(2L, CAST(k AS INT))").cast("long")
        .alias("expected"),
        F.expr("(n_keys - n_prefixes) * 1000000"
               " DIV greatest(n_keys * (n_keys - 1)"
               " DIV shiftleft(2L, CAST(k AS INT)), 1)").cast("long")
        .alias("ratio_ppm"))


def _sql_dedup_hash_collision_audit() -> str:
    ks = ", ".join(f"({k})" for k in HASH_PREFIX_BITS)
    return f"""
WITH keys AS (
  SELECT DISTINCT md5(coalesce(text, '')) AS h FROM documents),
ks(k) AS (VALUES {ks}),
pref AS (
  SELECT k, substring(h, 1, k // 4) AS p
  FROM keys CROSS JOIN ks),
per AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_keys,
         CAST(count(DISTINCT p) AS BIGINT) AS n_prefixes
  FROM pref GROUP BY 1)
SELECT k, n_keys, n_prefixes,
       CAST(n_keys - n_prefixes AS BIGINT) AS collisions,
       CAST(n_keys * (n_keys - 1) // (CAST(2 AS BIGINT) << k)
            AS BIGINT) AS expected,
       CAST((n_keys - n_prefixes) * 1000000
            // greatest(n_keys * (n_keys - 1)
                        // (CAST(2 AS BIGINT) << k), 1) AS BIGINT)
         AS ratio_ppm
FROM per
"""


def q_rel_sla_inversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority-inversion audit on fulfillment latency [K: the SLA
    fairness check — URGENT orders must not ship SLOWER than
    LOW-priority ones; when the medians invert between adjacent
    priority classes, the scheduler (or the warehouse) is ignoring
    priority and ops wants the exact pair]: per priority class its
    urgency rank (the leading digit of the TPC-H priority string),
    line count, exact doubled-median and mean ship delay, and the
    inversion flag against the NEXT-less-urgent class.

    Shape: the orders-lineitem join, one per-priority agg (5 rows),
    a broadcast self-join on adjacent ranks. Exact integers."""
    o = _tbl(spark, sf_dir, "orders")
    li = _tbl(spark, sf_dir, "lineitem")
    j = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
         .select(F.col("o_orderpriority").alias("prio"),
                 F.datediff(F.to_date("l_shipdate"),
                            F.to_date("o_orderdate")).cast("long")
                 .alias("delay")))
    per = (j.groupBy("prio")
           .agg(F.count(F.lit(1)).cast("long").alias("n_lines"),
                F.expr("CAST(percentile(delay * 2, 0.5) AS BIGINT)")
                .alias("med2_days"),
                F.expr("sum(delay) DIV count(1)").cast("long")
                .alias("mean_days"))
           .withColumn("rank", F.expr(
               "CAST(substring(prio, 1, 1) AS INT)")))
    nxt = per.select(F.col("rank").alias("nrank"),
                     F.col("med2_days").alias("next_med2"))
    return (per.join(F.broadcast(nxt),
                     per["rank"] + 1 == nxt["nrank"], "left")
            .select("prio", "rank", "n_lines", "med2_days",
                    "mean_days",
                    F.coalesce("next_med2", F.lit(None)).cast("long")
                    .alias("next_med2_days"),
                    F.coalesce(F.col("med2_days") > F.col("next_med2"),
                               F.lit(False)).cast("int")
                    .alias("inverted_vs_next")))


def _sql_rel_sla_inversion() -> str:
    return """
WITH j AS (
  SELECT o_orderpriority AS prio,
         CAST(datediff('day', CAST(o_orderdate AS DATE),
                       CAST(l_shipdate AS DATE)) AS BIGINT) AS delay
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
per AS (
  SELECT prio, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(quantile_cont(delay * 2, 0.5) AS BIGINT) AS med2_days,
         CAST(sum(delay) // count(*) AS BIGINT) AS mean_days,
         CAST(substring(prio, 1, 1) AS INT) AS rank
  FROM j GROUP BY 1)
SELECT p.prio, p.rank, p.n_lines, p.med2_days, p.mean_days,
       CAST(n.med2_days AS BIGINT) AS next_med2_days,
       CAST(CASE WHEN n.med2_days IS NOT NULL
                  AND p.med2_days > n.med2_days
            THEN 1 ELSE 0 END AS INT) AS inverted_vs_next
FROM per p LEFT JOIN per n ON n.rank = p.rank + 1
"""


# cos/sin of 2*pi*h/24 in exact nano-units, h = 0..23 — ONE Python
# source of truth injected verbatim into both engines so the circular
# sums are exact BIGINT arithmetic (no per-engine libm trig).
CIRCADIAN_COS_NANO = (1000000000, 965925826, 866025404, 707106781, 500000000, 258819045, 0, -258819045, -500000000, -707106781, -866025404, -965925826, -1000000000, -965925826, -866025404, -707106781, -500000000, -258819045, 0, 258819045, 500000000, 707106781, 866025404, 965925826)
CIRCADIAN_SIN_NANO = (0, 258819045, 500000000, 707106781, 866025404, 965925826, 1000000000, 965925826, 866025404, 707106781, 500000000, 258819045, 0, -258819045, -500000000, -707106781, -866025404, -965925826, -1000000000, -965925826, -866025404, -707106781, -500000000, -258819045)


def q_stats_circadian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circadian concentration per event stream [K: the bot-vs-human
    rhythm read — human activity peaks in a daily cycle (high mean
    resultant length R), scripted traffic is flat (R ~ 0) or
    hyper-peaked cron spikes; abuse triage reads exactly this
    circular statistic]: per event_type the event count, the modal
    hour and its share, and the mean resultant length R in ppm —
    computed from EXACT nano-unit integer cos/sin sums (the 24 trig
    constants are Python-generated literals shared verbatim by both
    engines; only the final sqrt is floating point).

    Shape: one (type, hour) hash agg on the corpus, a 24-entry
    broadcast trig join, one per-type agg. Exact integers until the
    last sqrt."""
    e = _tbl(spark, sf_dir, "events")
    hh = (e.select(F.col("event_type").alias("et"),
                   F.hour("ts").cast("int").alias("h"))
          .groupBy("et", "h")
          .agg(F.count(F.lit(1)).cast("long").alias("c")))
    trig = spark.createDataFrame(
        [(h, CIRCADIAN_COS_NANO[h], CIRCADIAN_SIN_NANO[h])
         for h in range(24)], "h int, cn long, sn long")
    j = hh.join(F.broadcast(trig), "h")
    per = (j.groupBy("et")
           .agg(F.sum("c").cast("long").alias("n"),
                F.sum(F.col("c") * F.col("cn")).cast("long")
                .alias("cx"),
                F.sum(F.col("c") * F.col("sn")).cast("long")
                .alias("cy"),
                F.max(F.struct(F.col("c"), (-F.col("h")).alias("nh")))
                .alias("peak")))
    return per.select(
        F.col("et").alias("event_type"), "n",
        (-F.col("peak.nh")).cast("int").alias("peak_hour"),
        F.expr("peak.c * 1000000 DIV n").cast("long")
        .alias("peak_share_ppm"),
        F.expr("CAST(round(sqrt(CAST(cx AS DOUBLE) * CAST(cx AS DOUBLE)"
               " + CAST(cy AS DOUBLE) * CAST(cy AS DOUBLE))"
               " / (CAST(n AS DOUBLE) * 1000.0), 0) AS BIGINT)")
        .alias("r_ppm"))


def _sql_stats_circadian() -> str:
    rows = ", ".join(
        f"({h}, {CIRCADIAN_COS_NANO[h]}, {CIRCADIAN_SIN_NANO[h]})"
        for h in range(24))
    return f"""
WITH trig(h, cn, sn) AS (VALUES {rows}),
hh AS (
  SELECT event_type AS et, CAST(hour(ts) AS INT) AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
j AS (SELECT et, hh.h, c, cn, sn FROM hh JOIN trig ON trig.h = hh.h),
per AS (
  SELECT et, CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(c * cn) AS BIGINT) AS cx,
         CAST(sum(c * sn) AS BIGINT) AS cy,
         first(h ORDER BY c DESC, h ASC) AS peak_hour,
         CAST(max(c) AS BIGINT) AS peak_c
  FROM j GROUP BY 1)
SELECT et AS event_type, n, CAST(peak_hour AS INT) AS peak_hour,
       CAST(peak_c * 1000000 // n AS BIGINT) AS peak_share_ppm,
       CAST(round(sqrt(CAST(cx AS DOUBLE) * CAST(cx AS DOUBLE)
                       + CAST(cy AS DOUBLE) * CAST(cy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * 1000.0), 0) AS BIGINT)
         AS r_ppm
FROM per
"""


SAMPLE_AUDIT_PCT = 10


def q_curation_sample_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampler-bias audit [K: every pipeline that dev-loops on a
    'deterministic 10% sample' must prove the sample is UNBIASED —
    a hash sampler keyed on doc_id is fine, one keyed on content
    accidentally correlates with dedup keys; this audit compares the
    sample's source mix against the corpus with the exact
    common-denominator L1 (zero floats)]: per source the corpus and
    sample counts, sampling rate in ppm, exact per-source share
    delta, and the corpus-wide L1 in ppm — the number that should
    hover near 0 for an unbiased sampler.

    Shape: one map-side md5-bucket flag, one per-source conditional
    agg, one 1-row exact agg broadcast back. The sampler IS the
    md5-prefix rule used by curation_split (keyed on doc_id, not
    text — key independence is the point)."""
    d = _docs(spark, sf_dir)
    flag = d.select(
        "source",
        (F.expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)),"
                " 1, 4), 16, 10) AS BIGINT)")
         * 100 < 65536 * SAMPLE_AUDIT_PCT).cast("int").alias("s"))
    per = (flag.groupBy("source")
           .agg(F.count(F.lit(1)).cast("long").alias("n_corpus"),
                F.sum("s").cast("long").alias("n_sample")))
    tot = per.agg(F.sum("n_corpus").cast("long").alias("nc"),
                  F.sum("n_sample").cast("long").alias("ns"))
    k = per.crossJoin(F.broadcast(tot))
    l1 = k.agg(F.sum(F.abs(F.col("n_sample") * F.col("nc")
                           - F.col("n_corpus") * F.col("ns")))
               .cast("long").alias("num"),
               F.max(F.col("nc") * F.col("ns")).cast("long")
               .alias("den"))
    return (k.crossJoin(F.broadcast(l1))
            .select("source", "n_corpus", "n_sample",
                    F.expr("n_sample * 1000000 DIV n_corpus")
                    .cast("long").alias("rate_ppm"),
                    F.expr("(n_sample * nc - n_corpus * ns) * 1000000"
                           " DIV (greatest(ns, 1) * nc)")
                    .cast("long").alias("share_delta_ppm"),
                    F.expr("num * 1000000 DIV greatest(den, 1)")
                    .cast("long").alias("l1_ppm")))


def _sql_curation_sample_audit() -> str:
    return f"""
WITH flag AS (
  SELECT source,
         CAST(CASE WHEN CAST((instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096 + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256 + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16 + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) * 1 AS BIGINT) * 100
                   < 65536 * {SAMPLE_AUDIT_PCT}
              THEN 1 ELSE 0 END AS INT) AS s
  FROM documents),
per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_corpus,
         CAST(sum(s) AS BIGINT) AS n_sample
  FROM flag GROUP BY 1),
tot AS (
  SELECT CAST(sum(n_corpus) AS BIGINT) AS nc,
         CAST(sum(n_sample) AS BIGINT) AS ns
  FROM per),
l1 AS (
  SELECT CAST(sum(abs(n_sample * nc - n_corpus * ns)) AS BIGINT)
           AS num,
         CAST(max(nc * ns) AS BIGINT) AS den
  FROM per CROSS JOIN tot)
SELECT source, n_corpus, n_sample,
       CAST(n_sample * 1000000 // n_corpus AS BIGINT) AS rate_ppm,
       CAST((n_sample * nc - n_corpus * ns) * 1000000
            // (greatest(ns, 1) * nc) AS BIGINT)
         AS share_delta_ppm,
       CAST(num * 1000000 // greatest(den, 1) AS BIGINT) AS l1_ppm
FROM per CROSS JOIN tot CROSS JOIN l1
"""


IVF_SWEEP_PROBES = (1, 2, 4, 8)


def q_sim_ivf_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF nprobe recall/cost sweep [K: the index-tuning curve every
    vector-store operator reads before fixing nprobe — recall@k
    climbs with probed cells while scan cost climbs linearly, and
    the knee of this curve IS the production setting; the LSH analog
    is sim_ann_sweep, this is the IVF side]: for each nprobe in
    {1,2,4,8} the mean recall@k vs the exact top-k (exact ppm —
    integer overlap counts over n_queries*k), the mean candidates
    scanned per query (exact DIV), and the total overlap.

    Shape: per nprobe one IVF bucketed join (equi-join on probed
    cell — never all-pairs) plus one broadcast-bounded exact pass
    shared across the sweep; unions of tiny per-probe aggregates.
    The exact side is the same N_QUERY_VECS-bounded brute pass
    sim_recall uses."""
    from ..operators.simsearch import ann_ivf_topk, cosine_topk
    e = _tbl(spark, sf_dir, "embeddings")
    q = (e.filter(F.col("vec_id") < N_QUERY_VECS)
         .select(F.col("vec_id").alias("qid"),
                 F.col("embedding").alias("qv")))
    c = (e.filter(F.col("vec_id") >= N_QUERY_VECS)
         .select(F.col("vec_id").alias("cid"),
                 F.col("embedding").alias("cv")))
    exact = cosine_topk(q, c, k=ANN_K).select(
        "qid", F.col("cid").alias("ecid"))
    outs = []
    for npb in IVF_SWEEP_PROBES:
        approx = ann_ivf_topk(q, c, k=ANN_K, n_cells=IVF_N_CELLS,
                              n_probe=npb)
        hit = (approx.join(exact,
                           (approx["qid"] == exact["qid"])
                           & (approx["cid"] == exact["ecid"]))
               .agg(F.count(F.lit(1)).cast("long").alias("overlap")))
        # candidates scanned = candidate rows inside probed cells
        from ..operators.simsearch import ivf_centroids
        C = ivf_centroids(IVF_N_CELLS, 64)
        cent = spark.createDataFrame(
            [(i, [float(x) for x in C[i]]) for i in range(IVF_N_CELLS)],
            "cell int, cvec array<double>")
        dot = F.expr("aggregate(zip_with(CAST(v AS ARRAY<DOUBLE>),"
                     " cvec, (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
                     " (a, x) -> a + x)")
        ca = (c.select(F.col("cid"), F.col("cv").alias("v"))
              .crossJoin(F.broadcast(cent)).withColumn("d", dot)
              .withColumn("rnk", F.row_number().over(
                  Window.partitionBy("cid")
                  .orderBy(F.desc("d"), F.asc("cell"))))
              .filter(F.col("rnk") == 1)
              .select("cid", "cell"))
        qa = (q.select(F.col("qid"), F.col("qv").alias("v"))
              .crossJoin(F.broadcast(cent)).withColumn("d", dot)
              .withColumn("rnk", F.row_number().over(
                  Window.partitionBy("qid")
                  .orderBy(F.desc("d"), F.asc("cell"))))
              .filter(F.col("rnk") <= npb)
              .select("qid", "cell"))
        scan = (qa.join(ca, "cell")
                .agg(F.count(F.lit(1)).cast("long").alias("scanned")))
        nq = q.agg(F.count(F.lit(1)).cast("long").alias("nq"))
        outs.append(
            hit.crossJoin(F.broadcast(scan)).crossJoin(F.broadcast(nq))
            .select(F.lit(npb).cast("int").alias("n_probe"),
                    F.col("nq").cast("long").alias("n_queries"),
                    "overlap",
                    F.expr(f"overlap * 1000000 DIV (nq * {ANN_K})")
                    .cast("long").alias("recall_ppm"),
                    F.expr("scanned DIV nq").cast("long")
                    .alias("mean_candidates")))
    out = outs[0]
    for x in outs[1:]:
        out = out.unionByName(x)
    return out


def _sql_sim_ivf_sweep() -> str:
    from ..operators.simsearch import ivf_centroids
    C = ivf_centroids(IVF_N_CELLS, 64)
    cent_rows = ",\n    ".join(
        f"({i}, {_sql_vec_lit(C[i])}::DOUBLE[])"
        for i in range(IVF_N_CELLS))
    blocks = []
    for npb in IVF_SWEEP_PROBES:
        blocks.append(f"""
SELECT {npb} AS n_probe,
       (SELECT CAST(count(*) AS BIGINT) FROM q) AS n_queries,
       (SELECT CAST(count(*) AS BIGINT)
        FROM (SELECT p.qid, a.cid,
                     row_number() OVER (PARTITION BY p.qid
                         ORDER BY round(list_cosine_similarity(
                             p.qv, a.cv), 6) DESC, a.cid ASC) AS rk
              FROM (SELECT qid, qv, cell FROM qc
                    WHERE rnk <= {npb}) p
              JOIN cassign a USING (cell)) ap
        JOIN exact ON exact.qid = ap.qid AND exact.ecid = ap.cid
        WHERE ap.rk <= {ANN_K}) AS overlap,
       (SELECT CAST(count(*) AS BIGINT)
        FROM (SELECT p.qid, a.cid,
                     row_number() OVER (PARTITION BY p.qid
                         ORDER BY round(list_cosine_similarity(
                             p.qv, a.cv), 6) DESC, a.cid ASC) AS rk
              FROM (SELECT qid, qv, cell FROM qc
                    WHERE rnk <= {npb}) p
              JOIN cassign a USING (cell)) ap
        JOIN exact ON exact.qid = ap.qid AND exact.ecid = ap.cid
        WHERE ap.rk <= {ANN_K})
       * 1000000 // ((SELECT count(*) FROM q) * {ANN_K})
         AS recall_ppm,
       (SELECT CAST(count(*) AS BIGINT)
        FROM (SELECT qid, cell FROM qc WHERE rnk <= {npb}) pp
        JOIN cassign a USING (cell))
       // (SELECT count(*) FROM q) AS mean_candidates""")
    body = "\nUNION ALL\n".join(blocks)
    return f"""
WITH cent(cell, cvec) AS (
  VALUES
    {cent_rows}
),
q AS (SELECT vec_id AS qid, cast(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < {N_QUERY_VECS}),
c AS (SELECT vec_id AS cid, cast(embedding AS DOUBLE[]) AS cv
      FROM embeddings WHERE vec_id >= {N_QUERY_VECS}),
cc AS (
  SELECT cid, cv, cell,
         row_number() OVER (PARTITION BY cid
             ORDER BY list_dot_product(cv, cvec) DESC, cell ASC)
           AS rnk
  FROM c CROSS JOIN cent),
cassign AS (SELECT cid, cv, cell FROM cc WHERE rnk = 1),
qc AS (
  SELECT qid, qv, cell,
         row_number() OVER (PARTITION BY qid
             ORDER BY list_dot_product(qv, cvec) DESC, cell ASC)
           AS rnk
  FROM q CROSS JOIN cent),
exact AS (
  SELECT qid, cid AS ecid FROM (
    SELECT q.qid, c.cid,
           row_number() OVER (PARTITION BY q.qid
               ORDER BY round(list_cosine_similarity(q.qv, c.cv), 6)
                        DESC, c.cid ASC) AS rk
    FROM q CROSS JOIN c) WHERE rk <= {ANN_K})
{body}
"""


def q_kg_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed reciprocity of the KG [K: the network read that
    separates conversational graphs (replies reciprocate) from
    taxonomic ones (mentions don't) — reciprocity r = share of
    directed edges whose reverse edge also exists, per predicate and
    pooled; high-reciprocity predicates are the ones worth storing
    bidirectionally at 10^12 triples]: per predicate the directed
    edge count, reciprocated count, and r in exact ppm, plus an
    __all__ pooled row.

    Shape: distinct edge projection, one self-equi-join on the
    reversed key (hash join on (obj,subj) — never all-pairs), two
    tiny aggs. Exact integers."""
    t = q_kg_triples(spark, sf_dir)
    ed = (t.select("pred", F.col("subj").alias("u"),
                   F.col("obj").alias("v"))
          .filter(F.col("u") != F.col("v")).distinct())
    rev = ed.select("pred", F.col("v").alias("u"),
                    F.col("u").alias("v"),
                    F.lit(1).alias("has_rev"))
    j = (ed.join(rev, ["pred", "u", "v"], "left")
         .select("pred", F.coalesce("has_rev", F.lit(0)).alias("r")))
    per = (j.groupBy("pred")
           .agg(F.count(F.lit(1)).cast("long").alias("n_edges"),
                F.sum("r").cast("long").alias("n_recip")))
    allr = (j.groupBy(F.lit("__all__").alias("pred"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_edges"),
                 F.sum("r").cast("long").alias("n_recip")))
    return (per.unionByName(allr)
            .select("pred", "n_edges", "n_recip",
                    F.expr("n_recip * 1000000 DIV n_edges")
                    .cast("long").alias("reciprocity_ppm")))


def _sql_kg_reciprocity() -> str:
    return f"""
WITH triples AS ({_sql_kg_triples_body()}),
ed AS (
  SELECT DISTINCT pred, subj AS u, obj AS v
  FROM triples WHERE subj <> obj),
j AS (
  SELECT e.pred,
         CASE WHEN r.u IS NULL THEN 0 ELSE 1 END AS rr
  FROM ed e LEFT JOIN ed r
    ON r.pred = e.pred AND r.u = e.v AND r.v = e.u),
per AS (
  SELECT pred, CAST(count(*) AS BIGINT) AS n_edges,
         CAST(sum(rr) AS BIGINT) AS n_recip
  FROM j GROUP BY 1
  UNION ALL
  SELECT '__all__', CAST(count(*) AS BIGINT),
         CAST(sum(rr) AS BIGINT)
  FROM j)
SELECT pred, n_edges, n_recip,
       CAST(n_recip * 1000000 // n_edges AS BIGINT)
         AS reciprocity_ppm
FROM per
"""


SALT_TARGET_PER_KEY = 4096


def q_kg_salt_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salt planner [K: closes the loop between skew DISCOVERY
    and skew HANDLING — kg_cardinality_profile finds the hot keys,
    rel_salted_agg shows the two-phase fix; this op turns the
    per-predicate fan maxima into the concrete salt factor a job
    config needs: the smallest power of two that brings the hottest
    key under a target rows-per-(key,salt) budget]: per (pred,
    direction) the hottest key's fan, the p-th largest fans summary
    (max + total), the recommended salt (power of two, 1 = none) and
    the post-salt worst-case rows per task.

    Shape: two (pred,key) hash aggs, per-pred maxima, map-side
    bit-length arithmetic (exact — no logs). Output is tiny."""
    t = q_kg_triples(spark, sf_dir)
    outs = []
    for direction, key in (("out", "subj"), ("in", "obj")):
        fan = (t.groupBy("pred", F.col(key).alias("k"))
               .agg(F.count(F.lit(1)).cast("long").alias("fan")))
        per = (fan.groupBy("pred")
               .agg(F.count(F.lit(1)).cast("long").alias("n_keys"),
                    F.sum("fan").cast("long").alias("n_rows"),
                    F.max("fan").cast("long").alias("max_fan")))
        # salt = 2^ceil(log2(max_fan / target)) via bit-length:
        # need = (max_fan + T - 1) DIV T; salt = next pow2 >= need
        outs.append(per.select(
            "pred", F.lit(direction).alias("direction"),
            "n_keys", "n_rows", "max_fan",
            F.expr(
                f"CASE WHEN max_fan <= {SALT_TARGET_PER_KEY} THEN 1L "
                f"ELSE shiftleft(1L, CAST(length(bin("
                f"(max_fan + {SALT_TARGET_PER_KEY} - 1)"
                f" DIV {SALT_TARGET_PER_KEY} - 1)) AS INT)) END")
            .cast("long").alias("salt")))
    out = outs[0]
    for x in outs[1:]:
        out = out.unionByName(x)
    return out.withColumn(
        "post_salt_max",
        F.expr("(max_fan + salt - 1) DIV salt").cast("long"))


def _sql_kg_salt_planner() -> str:
    blocks = []
    for direction, key in (("out", "subj"), ("in", "obj")):
        blocks.append(f"""
SELECT pred, '{direction}' AS direction,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(fan) AS BIGINT) AS n_rows,
       CAST(max(fan) AS BIGINT) AS max_fan,
       CAST(CASE WHEN max(fan) <= {SALT_TARGET_PER_KEY} THEN 1
            ELSE (CAST(1 AS BIGINT) << CAST(length(bin(
                 (max(fan) + {SALT_TARGET_PER_KEY} - 1)
                 // {SALT_TARGET_PER_KEY} - 1)) AS INT)) END
            AS BIGINT) AS salt
FROM (SELECT pred, {key} AS k, CAST(count(*) AS BIGINT) AS fan
      FROM triples GROUP BY 1, 2)
GROUP BY pred""")
    body = "\nUNION ALL\n".join(blocks)
    return f"""
WITH triples AS ({_sql_kg_triples_body()}),
base AS (
{body})
SELECT pred, direction, n_keys, n_rows, max_fan, salt,
       CAST((max_fan + salt - 1) // salt AS BIGINT) AS post_salt_max
FROM base
"""


MEMO_NGRAM_N = 8


def q_text_memorization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document n-gram memorization audit [K: the repeated-
    8-gram measurement behind dedup decisions in RefinedWeb/Gopher —
    what share of the corpus's 8-gram MASS is duplicated across
    documents? high duplicated mass means the model will memorize
    boilerplate; the doc-frequency histogram head shows how bad]:
    one row per doc-frequency band (1, 2, 3-4, 5-8, 9+) with the
    8-gram type and mass counts, plus corpus-wide duplicated-mass
    ppm on every row.

    Shape: token explode -> 8-gram windows per doc via posexplode
    over token arrays (map-side slice, no self-join) -> one
    (gram-hash) hash agg -> a 5-row band agg. The gram kills the
    raw string early (md5 -> 128-bit key), so the shuffle carries
    hashes, not text."""
    d = _docs(spark, sf_dir)
    t = F.coalesce(F.col("text"), F.lit(""))
    toks = F.filter(F.split(F.lower(t), r"\s+"), lambda x: x != "")
    n = MEMO_NGRAM_N
    grams = d.select("doc_id", toks.alias("tk")).select(
        "doc_id",
        F.explode(F.expr(
            f"CASE WHEN size(tk) >= {n} THEN transform("
            f"sequence(0, size(tk) - {n}),"
            f" i -> md5(concat_ws(' ', slice(tk, i + 1, {n}))))"
            f" ELSE CAST(array() AS ARRAY<STRING>) END")).alias("g"))
    per = (grams.groupBy("g")
           .agg(F.count(F.lit(1)).cast("long").alias("mass"),
                F.countDistinct("doc_id").cast("long").alias("df")))
    band = F.expr("CASE WHEN df = 1 THEN '1' WHEN df = 2 THEN '2'"
                  " WHEN df <= 4 THEN '3-4' WHEN df <= 8 THEN '5-8'"
                  " ELSE '9+' END")
    hist = (per.withColumn("band", band)
            .groupBy("band")
            .agg(F.count(F.lit(1)).cast("long").alias("n_types"),
                 F.sum("mass").cast("long").alias("mass")))
    tot = (per.agg(
        F.sum("mass").cast("long").alias("total_mass"),
        F.sum(F.when(F.col("df") > 1, F.col("mass")).otherwise(0))
        .cast("long").alias("dup_mass")))
    return (hist.crossJoin(F.broadcast(tot))
            .select("band", "n_types", "mass", "total_mass",
                    F.expr("dup_mass * 1000000"
                           " DIV greatest(total_mass, 1)")
                    .cast("long").alias("dup_mass_ppm")))


def _sql_text_memorization() -> str:
    n = MEMO_NGRAM_N
    return f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')),
                                        '\\s+'),
                     x -> x <> '') AS tk
  FROM documents),
grams AS (
  SELECT doc_id, unnest(
    CASE WHEN len(tk) >= {n} THEN list_transform(
      generate_series(0, len(tk) - {n}),
      i -> md5(array_to_string(list_slice(tk, i + 1, i + {n}), ' ')))
    ELSE [] END) AS g
  FROM tk),
per AS (
  SELECT g, CAST(count(*) AS BIGINT) AS mass,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM grams GROUP BY 1),
hist AS (
  SELECT CASE WHEN df = 1 THEN '1' WHEN df = 2 THEN '2'
              WHEN df <= 4 THEN '3-4' WHEN df <= 8 THEN '5-8'
              ELSE '9+' END AS band,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(mass) AS BIGINT) AS mass
  FROM per GROUP BY 1),
tot AS (
  SELECT CAST(sum(mass) AS BIGINT) AS total_mass,
         CAST(sum(CASE WHEN df > 1 THEN mass ELSE 0 END) AS BIGINT)
           AS dup_mass
  FROM per)
SELECT band, n_types, mass, total_mass,
       CAST(dup_mass * 1000000 // greatest(total_mass, 1) AS BIGINT)
         AS dup_mass_ppm
FROM hist CROSS JOIN tot
"""


SURVIVAL_CENSOR_DAYS = 14


def q_stats_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve over user lifetimes [K: THE
    censoring-aware retention curve — naive 'average lifetime'
    understates retention because users still active at the
    observation edge haven't died yet; KM multiplies (1 - d/n) over
    event times and handles exactly that]: lifetime = days between a
    user's first and last active day, DEATH if the user has been
    silent for > 14 days at corpus end, CENSORED otherwise; per
    distinct lifetime the at-risk count, deaths, censored, and the
    KM survival estimate S(t) — a DETERMINISTIC ascending-time fold
    over the calendar-bounded lifetime table (the product, like the
    entropy sums, must not be a hash-agg float reduction).

    Shape: one (user) agg from the (user,day) distinct, one tiny
    per-lifetime agg, cumulative at-risk via the triangular
    broadcast idiom, one ordered product fold. Only the first agg
    sees the corpus."""
    e = _tbl(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    gmax = ud.agg(F.max("day").alias("gday"))
    life = (ud.groupBy("user_id")
            .agg(F.min("day").alias("fd"), F.max("day").alias("ld"))
            .crossJoin(F.broadcast(gmax))
            .select(F.datediff("ld", "fd").cast("long").alias("t"),
                    (F.datediff("gday", "ld")
                     > SURVIVAL_CENSOR_DAYS).cast("int").alias("dead")))
    per = (life.groupBy("t")
           .agg(F.sum("dead").cast("long").alias("d"),
                F.sum(1 - F.col("dead")).cast("long").alias("c")))
    # at risk at t = all users with lifetime >= t
    risk = (per.alias("a").join(F.broadcast(per.alias("b")),
                                F.col("b.t") >= F.col("a.t"))
            .groupBy(F.col("a.t").alias("t"))
            .agg(F.max(F.col("a.d")).cast("long").alias("d"),
                 F.max(F.col("a.c")).cast("long").alias("c"),
                 F.sum(F.col("b.d") + F.col("b.c")).cast("long")
                 .alias("n_risk")))
    # S(t) = prod over t' <= t with d>0 of (1 - d/n): ordered fold
    km = (risk.agg(F.sort_array(F.collect_list(F.struct(
        F.col("t"), F.col("d"), F.col("n_risk")))).alias("arr")))
    joined = risk.crossJoin(F.broadcast(km))
    surv = F.round(F.aggregate(
        F.filter(F.col("arr"),
                 lambda x: (x.t <= F.col("t")) & (x.d > 0)),
        F.lit(1.0),
        lambda acc, x: acc * (F.lit(1.0) - x.d.cast("double")
                              / x.n_risk.cast("double"))), 6)
    return joined.select("t", "n_risk", "d", "c",
                         surv.alias("s_km"))


def _sql_stats_survival() -> str:
    return f"""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
gmax AS (SELECT max(day) AS gday FROM ud),
life AS (
  SELECT CAST(datediff('day', fd, ld) AS BIGINT) AS t,
         CAST(CASE WHEN datediff('day', ld, gday)
                        > {SURVIVAL_CENSOR_DAYS}
              THEN 1 ELSE 0 END AS INT) AS dead
  FROM (SELECT user_id, min(day) AS fd, max(day) AS ld
        FROM ud GROUP BY 1) CROSS JOIN gmax),
per AS (
  SELECT t, CAST(sum(dead) AS BIGINT) AS d,
         CAST(sum(1 - dead) AS BIGINT) AS c
  FROM life GROUP BY 1),
risk AS (
  SELECT a.t, max(a.d) AS d, max(a.c) AS c,
         CAST(sum(b.d + b.c) AS BIGINT) AS n_risk
  FROM per a JOIN per b ON b.t >= a.t
  GROUP BY a.t),
km AS (
  SELECT list(struct_pack(t := t, d := d, n_risk := n_risk)
              ORDER BY t) AS arr
  FROM risk)
SELECT r.t, r.n_risk, r.d, r.c,
       round(coalesce(list_reduce(
         list_prepend(CAST(1.0 AS DOUBLE),
           list_transform(
             list_filter(arr, x -> x.t <= r.t AND x.d > 0),
             x -> 1.0 - CAST(x.d AS DOUBLE)
                  / CAST(x.n_risk AS DOUBLE))),
         (a, b) -> a * b), 1.0), 6) AS s_km
FROM risk r CROSS JOIN km
"""


def q_dedup_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-tax attribution per source [K: after keep-first dedup
    someone's corpus shrinks — this op says WHOSE and to WHOM: under
    a deterministic source priority (lexicographic — swap in a real
    quality order in production) each duplicate text survives only
    in its highest-priority source; per source the doc count, kept
    count, shadowed ppm, and the single source that shadows it most]:
    the attribution table a data-sourcing team reads before
    renegotiating a crawl.

    Shape: one (hash) -> min-priority-source agg (struct-min, no
    window), a broadcast join back, one per-(loser,winner) agg and a
    struct-max per loser. Exact integers."""
    d = _docs(spark, sf_dir)
    dh = d.select("source",
                  F.md5(F.coalesce(F.col("text"), F.lit("")))
                  .alias("h"))
    keep = (dh.groupBy("h")
            .agg(F.min("source").alias("keeper")))
    j = dh.join(F.broadcast(keep), "h")
    per = (j.groupBy("source")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum((F.col("source") == F.col("keeper"))
                      .cast("long")).cast("long").alias("n_kept")))
    shadow = (j.filter(F.col("source") != F.col("keeper"))
              .groupBy("source", "keeper")
              .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
              .groupBy("source")
              .agg(F.max(F.struct(F.col("cnt"),
                                  F.col("keeper").alias("k")))
                   .alias("top")))
    return (per.join(F.broadcast(shadow), "source", "left")
            .select("source", "n_docs", "n_kept",
                    (F.col("n_docs") - F.col("n_kept")).cast("long")
                    .alias("n_shadowed"),
                    F.expr("(n_docs - n_kept) * 1000000 DIV n_docs")
                    .cast("long").alias("shadowed_ppm"),
                    F.col("top.k").alias("top_shadower"),
                    F.coalesce(F.col("top.cnt"), F.lit(0))
                    .cast("long").alias("top_shadow_cnt")))


def _sql_dedup_attribution() -> str:
    return """
WITH dh AS (
  SELECT source, md5(coalesce(text, '')) AS h FROM documents),
keep AS (SELECT h, min(source) AS keeper FROM dh GROUP BY 1),
j AS (SELECT dh.source, dh.h, keep.keeper
      FROM dh JOIN keep USING (h)),
per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN source = keeper THEN 1 ELSE 0 END)
              AS BIGINT) AS n_kept
  FROM j GROUP BY 1),
shadow AS (
  SELECT source,
         first(keeper ORDER BY cnt DESC, keeper ASC) AS top_shadower,
         CAST(max(cnt) AS BIGINT) AS top_shadow_cnt
  FROM (SELECT source, keeper, CAST(count(*) AS BIGINT) AS cnt
        FROM j WHERE source <> keeper GROUP BY 1, 2)
  GROUP BY source)
SELECT per.source, n_docs, n_kept,
       CAST(n_docs - n_kept AS BIGINT) AS n_shadowed,
       CAST((n_docs - n_kept) * 1000000 // n_docs AS BIGINT)
         AS shadowed_ppm,
       shadow.top_shadower,
       CAST(coalesce(shadow.top_shadow_cnt, 0) AS BIGINT)
         AS top_shadow_cnt
FROM per LEFT JOIN shadow ON shadow.source = per.source
"""


IMPERATIVE_VERBS = ("answer", "create", "describe", "explain", "find",
                    "generate", "give", "list", "make", "please",
                    "show", "summarize", "tell", "translate", "write")


def q_kg_thread_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation thread-topology profile [K: the transcript-
    structure read a dialogue-data team does before modeling —
    linear back-and-forth threads train turn-taking, branchy threads
    (a turn answered by many) need tree-aware packing; the
    replies_to edges carry exactly this shape]: per conversation the
    turn count, reply-edge count, max reply fan-in, branch-point
    count (turns with >= 2 replies), and the linear flag (no
    branches and every non-root turn replies).

    Shape: map-side conv-key extraction from the turn ids, one
    (conv, target) fan-in agg, one per-conv agg. Exact integers."""
    t = q_kg_triples(spark, sf_dir)
    rep = (t.filter(F.col("pred") == "replies_to")
           .select(F.regexp_extract("subj", "^turn:([^:]+):", 1)
                   .alias("conv"), F.col("obj").alias("tgt")))
    fanin = (rep.groupBy("conv", "tgt")
             .agg(F.count(F.lit(1)).cast("long").alias("fan")))
    per = (fanin.groupBy("conv")
           .agg(F.sum("fan").cast("long").alias("n_reply_edges"),
                F.max("fan").cast("long").alias("max_fanin"),
                F.sum((F.col("fan") >= 2).cast("long")).cast("long")
                .alias("n_branch_points")))
    turns = (t.filter(F.col("pred") == "replies_to")
             .select(F.regexp_extract("subj", "^turn:([^:]+):", 1)
                     .alias("conv"), "subj")
             .unionByName(
                 t.filter(F.col("pred") == "replies_to")
                 .select(F.regexp_extract("obj", "^turn:([^:]+):", 1)
                         .alias("conv"),
                         F.col("obj").alias("subj")))
             .distinct()
             .groupBy("conv")
             .agg(F.count(F.lit(1)).cast("long").alias("n_turns")))
    return (turns.join(per, "conv")
            .select("conv", "n_turns", "n_reply_edges", "max_fanin",
                    "n_branch_points",
                    ((F.col("n_branch_points") == 0)
                     & (F.col("n_reply_edges")
                        == F.col("n_turns") - 1)).cast("int")
                    .alias("is_linear")))


def _sql_kg_thread_stats() -> str:
    return f"""
WITH triples AS ({_sql_kg_triples_body()}),
rep AS (
  SELECT regexp_extract(subj, '^turn:([^:]+):', 1) AS conv,
         obj AS tgt
  FROM triples WHERE pred = 'replies_to'),
fanin AS (
  SELECT conv, tgt, CAST(count(*) AS BIGINT) AS fan
  FROM rep GROUP BY 1, 2),
per AS (
  SELECT conv, CAST(sum(fan) AS BIGINT) AS n_reply_edges,
         CAST(max(fan) AS BIGINT) AS max_fanin,
         CAST(sum(CASE WHEN fan >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_branch_points
  FROM fanin GROUP BY 1),
turns AS (
  SELECT conv, CAST(count(*) AS BIGINT) AS n_turns
  FROM (
    SELECT regexp_extract(subj, '^turn:([^:]+):', 1) AS conv,
           subj AS t
    FROM triples WHERE pred = 'replies_to'
    UNION
    SELECT regexp_extract(obj, '^turn:([^:]+):', 1) AS conv,
           obj AS t
    FROM triples WHERE pred = 'replies_to')
  GROUP BY 1)
SELECT turns.conv, n_turns, n_reply_edges, max_fanin, n_branch_points,
       CAST(CASE WHEN n_branch_points = 0
                  AND n_reply_edges = n_turns - 1
            THEN 1 ELSE 0 END AS INT) AS is_linear
FROM turns JOIN per ON per.conv = turns.conv
"""


def q_text_instruction_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instruction-format detection [K: the router that separates
    instruction-shaped documents (imperative openers, enumerated
    steps, direct questions) from plain prose before building an
    instruction-tuning mix — the SFT analog of text_code_detect's
    code/prose routing]: per doc the imperative-opener flag (first
    token in a broadcast verb list, leet-free lowercase), question
    and list-marker and 'step N' counts (JVM regex, multiline), a
    capped exact-integer score, and the routing flag.

    Shape: pure map-side projection — one scan, zero shuffle, zero
    UDF."""
    d = _docs(spark, sf_dir)
    t = F.coalesce(F.col("text"), F.lit(""))
    first_tok = F.element_at(
        F.filter(F.split(F.lower(t), r"\s+"), lambda x: x != ""), 1)
    imp = F.coalesce(first_tok.isin(*IMPERATIVE_VERBS), F.lit(False)) \
        .cast("int")
    nq = (F.length(t) - F.length(F.regexp_replace(t, r"\?", ""))) \
        .cast("long")
    nlist = F.size(F.regexp_extract_all(
        t, F.lit(r"(?m)^\s*(?:[-*]|\d+[.)])\s"), F.lit(0))) \
        .cast("long")
    nstep = F.size(F.regexp_extract_all(
        F.lower(t), F.lit(r"step [0-9]"), F.lit(0))).cast("long")
    score = (imp.cast("long") * 400000
             + F.least(nq, F.lit(3)) * 100000
             + F.least(nlist, F.lit(5)) * 60000
             + F.least(nstep, F.lit(3)) * 100000)
    return d.select(
        "doc_id", imp.alias("imperative_open"),
        nq.alias("n_questions"), nlist.alias("n_list_markers"),
        nstep.alias("n_steps"),
        score.cast("long").alias("instruct_score"),
        (score >= 400000).cast("int").alias("is_instruction"))


def _sql_text_instruction_detect() -> str:
    verbs = ", ".join(f"'{v}'" for v in IMPERATIVE_VERBS)
    return f"""
WITH t AS (SELECT doc_id, coalesce(text, '') AS s FROM documents),
base AS (
  SELECT doc_id,
         CAST(CASE WHEN len(list_filter(
                 string_split_regex(lower(s), '\\s+'), x -> x <> ''))
                 > 0
               AND list_filter(string_split_regex(lower(s), '\\s+'),
                               x -> x <> '')[1] IN ({verbs})
              THEN 1 ELSE 0 END AS INT) AS imperative_open,
         CAST(length(s) - length(replace(s, '?', '')) AS BIGINT)
           AS n_questions,
         CAST(len(regexp_extract_all(s,
              '(?m)^\\s*(?:[-*]|\\d+[.)])\\s')) AS BIGINT)
           AS n_list_markers,
         CAST(len(regexp_extract_all(lower(s), 'step [0-9]'))
              AS BIGINT) AS n_steps
  FROM t)
SELECT doc_id, imperative_open, n_questions, n_list_markers, n_steps,
       CAST(imperative_open * 400000
            + least(n_questions, 3) * 100000
            + least(n_list_markers, 5) * 60000
            + least(n_steps, 3) * 100000 AS BIGINT)
         AS instruct_score,
       CAST(CASE WHEN imperative_open * 400000
                      + least(n_questions, 3) * 100000
                      + least(n_list_markers, 5) * 60000
                      + least(n_steps, 3) * 100000 >= 400000
            THEN 1 ELSE 0 END AS INT) AS is_instruction
FROM base
"""


SIMPSON_VALUE_FENCE = 100.0


def q_rel_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox detector [K: the aggregation trap —
    'weekends have a higher high-value rate' can hold overall yet
    REVERSE inside every event-type stratum when the mix differs;
    any metrics team comparing two populations must run exactly this
    check before shipping the headline]: per stratum (and a pooled
    __overall__ row) the weekend/weekday trial and success counts,
    the rate-difference SIGN from exact cross-multiplication
    (s_we*n_wd vs s_wd*n_we — no division), and on every row the
    paradox flag: the overall sign is nonzero and every nonzero
    stratum sign opposes it.

    Shape: one conditional hash agg per stratum + pooled, a tiny
    broadcast of the overall sign, one bounded agg for the flag.
    Zero floats."""
    e = _tbl(spark, sf_dir, "events")
    base = e.select(
        F.col("event_type").alias("stratum"),
        (F.expr("weekday(CAST(ts AS DATE))") >= 5).cast("int")
        .alias("we"),
        (F.col("value") >= SIMPSON_VALUE_FENCE).cast("long")
        .alias("hit"))
    per = (base.groupBy("stratum")
           .agg(F.sum(F.when(F.col("we") == 1, 1).otherwise(0))
                .cast("long").alias("n_we"),
                F.sum(F.when(F.col("we") == 1, F.col("hit"))
                      .otherwise(0)).cast("long").alias("s_we"),
                F.sum(F.when(F.col("we") == 0, 1).otherwise(0))
                .cast("long").alias("n_wd"),
                F.sum(F.when(F.col("we") == 0, F.col("hit"))
                      .otherwise(0)).cast("long").alias("s_wd")))
    overall = (per.agg(F.sum("n_we").cast("long").alias("n_we"),
                       F.sum("s_we").cast("long").alias("s_we"),
                       F.sum("n_wd").cast("long").alias("n_wd"),
                       F.sum("s_wd").cast("long").alias("s_wd"))
               .select(F.lit("__overall__").alias("stratum"),
                       "n_we", "s_we", "n_wd", "s_wd"))
    allr = per.unionByName(overall)
    sign = F.expr("CASE WHEN s_we * n_wd > s_wd * n_we THEN 1"
                  " WHEN s_we * n_wd < s_wd * n_we THEN -1"
                  " ELSE 0 END")
    signed = allr.withColumn("sign", sign.cast("int"))
    osign = (signed.filter(F.col("stratum") == "__overall__")
             .select(F.col("sign").alias("o_sign")))
    flag = (signed.filter(F.col("stratum") != "__overall__")
            .crossJoin(F.broadcast(osign))
            .agg(F.min(F.when(F.col("sign") != 0,
                              (F.col("sign") == -F.col("o_sign"))
                              .cast("int")))
                 .alias("all_opposed"),
                 F.max(F.abs(F.col("o_sign"))).alias("o_nonzero")))
    paradox = flag.select(
        ((F.col("all_opposed") == 1) & (F.col("o_nonzero") == 1))
        .cast("int").alias("paradox"))
    return (signed.crossJoin(F.broadcast(paradox))
            .select("stratum", "n_we", "s_we", "n_wd", "s_wd",
                    "sign", "paradox"))


def _sql_rel_simpson() -> str:
    return f"""
WITH base AS (
  SELECT event_type AS stratum,
         CAST(CASE WHEN isodow(CAST(ts AS DATE)) >= 6
              THEN 1 ELSE 0 END AS INT) AS we,
         CAST(CASE WHEN value >= {SIMPSON_VALUE_FENCE}
              THEN 1 ELSE 0 END AS BIGINT) AS hit
  FROM events),
per AS (
  SELECT stratum,
         CAST(sum(CASE WHEN we = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_we,
         CAST(sum(CASE WHEN we = 1 THEN hit ELSE 0 END) AS BIGINT)
           AS s_we,
         CAST(sum(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_wd,
         CAST(sum(CASE WHEN we = 0 THEN hit ELSE 0 END) AS BIGINT)
           AS s_wd
  FROM base GROUP BY 1),
allr AS (
  SELECT * FROM per
  UNION ALL
  SELECT '__overall__', CAST(sum(n_we) AS BIGINT),
         CAST(sum(s_we) AS BIGINT), CAST(sum(n_wd) AS BIGINT),
         CAST(sum(s_wd) AS BIGINT)
  FROM per),
signed AS (
  SELECT *, CAST(CASE WHEN s_we * n_wd > s_wd * n_we THEN 1
                 WHEN s_we * n_wd < s_wd * n_we THEN -1
                 ELSE 0 END AS INT) AS sign
  FROM allr),
osign AS (SELECT sign AS o_sign FROM signed
          WHERE stratum = '__overall__'),
flag AS (
  SELECT CAST(CASE WHEN min(CASE WHEN sign <> 0 THEN
                     CASE WHEN sign = -o_sign THEN 1 ELSE 0 END
                   END) = 1
               AND max(abs(o_sign)) = 1
              THEN 1 ELSE 0 END AS INT) AS paradox
  FROM signed CROSS JOIN osign
  WHERE stratum <> '__overall__')
SELECT stratum, n_we, s_we, n_wd, s_wd, sign, paradox
FROM signed CROSS JOIN flag
"""


def q_rel_pvm_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price/volume/mix revenue bridge, month over month [K: the
    finance-standard explanation of 'why did revenue move' — price
    effect (old volumes at new prices), volume effect (old prices on
    volume change), the cross term, plus new/retired assortment —
    computed at part grain and rolled up]: per month the previous
    and current revenue in exact cents, the five effect components
    in cents, and the residual (nonzero only because per-part unit
    prices are quantized to integer micro-cents before the bridge —
    DIV on both engines, documented; the residual SIZE is the
    honesty meter of that quantization).

    Shape: the orders-lineitem join, one (month, part) agg, a
    month-shifted self-join on part (equi-join), per-month rollup.
    Exact integers end to end."""
    o = _tbl(spark, sf_dir, "orders")
    li = _tbl(spark, sf_dir, "lineitem")
    mp = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
          .select((F.year("o_orderdate") * 12
                   + F.month("o_orderdate") - 1).cast("long")
                  .alias("mn"),
                  F.col("l_partkey").alias("pk"),
                  F.expr("CAST(round(l_extendedprice * 100, 0)"
                         " AS BIGINT)").alias("c"),
                  F.expr("CAST(round(l_quantity, 0) AS BIGINT)")
                  .alias("q"))
          .groupBy("mn", "pk")
          .agg(F.sum("c").cast("long").alias("c"),
               F.sum("q").cast("long").alias("q")))
    cur = mp.select(F.col("mn"), F.col("pk"),
                    F.col("c").alias("c1"), F.col("q").alias("q1"))
    prv = mp.select((F.col("mn") + 1).alias("mn"), F.col("pk"),
                    F.col("c").alias("c0"), F.col("q").alias("q0"))
    j = (cur.join(prv, ["mn", "pk"], "full")
         .select("mn", "pk",
                 F.coalesce("c1", F.lit(0)).cast("long").alias("c1"),
                 F.coalesce("q1", F.lit(0)).cast("long").alias("q1"),
                 F.coalesce("c0", F.lit(0)).cast("long").alias("c0"),
                 F.coalesce("q0", F.lit(0)).cast("long").alias("q0")))
    # integer micro-cent unit prices; effects in exact micro-cents
    eff = j.select(
        "mn", "c0", "c1",
        F.expr("CASE WHEN q0 > 0 AND q1 > 0 THEN"
               " (c1 * 1000000 DIV q1 - c0 * 1000000 DIV q0) * q0"
               " ELSE 0 END").alias("price_u"),
        F.expr("CASE WHEN q0 > 0 AND q1 > 0 THEN"
               " (c0 * 1000000 DIV q0) * (q1 - q0) ELSE 0 END")
        .alias("vol_u"),
        F.expr("CASE WHEN q0 > 0 AND q1 > 0 THEN"
               " (c1 * 1000000 DIV q1 - c0 * 1000000 DIV q0)"
               " * (q1 - q0) ELSE 0 END").alias("cross_u"),
        F.expr("CASE WHEN q0 = 0 AND q1 > 0 THEN c1 * 1000000"
               " ELSE 0 END").alias("new_u"),
        F.expr("CASE WHEN q1 = 0 AND q0 > 0 THEN c0 * 1000000"
               " ELSE 0 END").alias("retired_u"))
    per = (eff.groupBy("mn")
           .agg(F.sum("c0").cast("long").alias("rev0_c"),
                F.sum("c1").cast("long").alias("rev1_c"),
                F.expr("CAST(sum(price_u) DIV 1000000 AS BIGINT)")
                .alias("price_eff_c"),
                F.expr("CAST(sum(vol_u) DIV 1000000 AS BIGINT)")
                .alias("vol_eff_c"),
                F.expr("CAST(sum(cross_u) DIV 1000000 AS BIGINT)")
                .alias("cross_eff_c"),
                F.expr("CAST(sum(new_u) DIV 1000000 AS BIGINT)")
                .alias("new_eff_c"),
                F.expr("CAST(sum(retired_u) DIV 1000000 AS BIGINT)")
                .alias("retired_eff_c")))
    # bound to OBSERVED months: the +1-shifted side would otherwise
    # emit a phantom all-retired month after the series end
    first = mp.agg(F.min("mn").alias("mn0"),
                   F.max("mn").alias("mn_max"))
    return (per.crossJoin(F.broadcast(first))
            .filter((F.col("mn") > F.col("mn0"))
                    & (F.col("mn") <= F.col("mn_max")))
            .select(
                F.format_string("%04d-%02d",
                                F.expr("mn DIV 12").cast("int"),
                                (F.col("mn") % 12 + 1).cast("int"))
                .alias("month"),
                "rev0_c", "rev1_c",
                (F.col("rev1_c") - F.col("rev0_c")).cast("long")
                .alias("delta_c"),
                "price_eff_c", "vol_eff_c", "cross_eff_c",
                "new_eff_c", "retired_eff_c",
                (F.col("rev1_c") - F.col("rev0_c")
                 - F.col("price_eff_c") - F.col("vol_eff_c")
                 - F.col("cross_eff_c") - F.col("new_eff_c")
                 + F.col("retired_eff_c")).cast("long")
                .alias("residual_c")))


def _sql_rel_pvm_bridge() -> str:
    return """
WITH mp AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
              AS BIGINT) AS mn,
         l_partkey AS pk,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
              AS BIGINT) AS c,
         CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
           AS q
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2),
j AS (
  SELECT coalesce(cur.mn, prv.mn) AS mn,
         CAST(coalesce(cur.c, 0) AS BIGINT) AS c1,
         CAST(coalesce(cur.q, 0) AS BIGINT) AS q1,
         CAST(coalesce(prv.c, 0) AS BIGINT) AS c0,
         CAST(coalesce(prv.q, 0) AS BIGINT) AS q0
  FROM mp cur
  FULL JOIN (SELECT mn + 1 AS mn, pk, c, q FROM mp) prv
    ON prv.mn = cur.mn AND prv.pk = cur.pk),
eff AS (
  SELECT mn, c0, c1,
         CASE WHEN q0 > 0 AND q1 > 0 THEN
           (c1 * 1000000 // q1 - c0 * 1000000 // q0) * q0
         ELSE 0 END AS price_u,
         CASE WHEN q0 > 0 AND q1 > 0 THEN
           (c0 * 1000000 // q0) * (q1 - q0) ELSE 0 END AS vol_u,
         CASE WHEN q0 > 0 AND q1 > 0 THEN
           (c1 * 1000000 // q1 - c0 * 1000000 // q0) * (q1 - q0)
         ELSE 0 END AS cross_u,
         CASE WHEN q0 = 0 AND q1 > 0 THEN c1 * 1000000
         ELSE 0 END AS new_u,
         CASE WHEN q1 = 0 AND q0 > 0 THEN c0 * 1000000
         ELSE 0 END AS retired_u
  FROM j),
per AS (
  SELECT mn, CAST(sum(c0) AS BIGINT) AS rev0_c,
         CAST(sum(c1) AS BIGINT) AS rev1_c,
         CAST(sum(price_u) // 1000000 AS BIGINT) AS price_eff_c,
         CAST(sum(vol_u) // 1000000 AS BIGINT) AS vol_eff_c,
         CAST(sum(cross_u) // 1000000 AS BIGINT) AS cross_eff_c,
         CAST(sum(new_u) // 1000000 AS BIGINT) AS new_eff_c,
         CAST(sum(retired_u) // 1000000 AS BIGINT) AS retired_eff_c
  FROM eff GROUP BY 1),
first AS (SELECT min(mn) AS mn0, max(mn) AS mn_max FROM mp)
SELECT printf('%04d-%02d', CAST(mn // 12 AS INT),
              CAST(mn % 12 + 1 AS INT)) AS month,
       rev0_c, rev1_c,
       CAST(rev1_c - rev0_c AS BIGINT) AS delta_c,
       price_eff_c, vol_eff_c, cross_eff_c, new_eff_c, retired_eff_c,
       CAST(rev1_c - rev0_c - price_eff_c - vol_eff_c - cross_eff_c
            - new_eff_c + retired_eff_c AS BIGINT) AS residual_c
FROM per CROSS JOIN first
WHERE mn > mn0 AND mn <= mn_max
"""


def q_sim_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding anisotropy audit [K: Ethayarajh's finding —
    contextual embeddings huddle in a narrow cone, so the MEAN
    PAIRWISE COSINE sits far above 0 and similarity scores lose
    contrast; the fix (mean-centering / whitening) starts from
    exactly this number]: the mean pairwise cosine over all n(n-1)
    ordered pairs WITHOUT an all-pairs join, via the identity
    sum_pairs cos = ||sum u||^2 - n over unit vectors — per-vector
    components are normalized then INTEGERIZED to nano-units so the
    per-dimension sums are exact BIGINTs (order-invariant), and
    ||sum u||^2 folds over the 64 dims in index order. Also emits
    the most biased dimension (the rogue-dimension read) with its
    mean component in ppm.

    Shape: one map-side normalize + posexplode (64x bounded), one
    per-dim hash agg (64 rows), one ordered fold. Never a pair
    join."""
    v = _tbl(spark, sf_dir, "embeddings")
    unit = v.select(
        F.expr(
            "transform(CAST(embedding AS ARRAY<DOUBLE>), x -> "
            "CAST(round(x / sqrt(aggregate(CAST(embedding AS"
            " ARRAY<DOUBLE>), CAST(0.0 AS DOUBLE),"
            " (a, y) -> a + y * y)) * 1000000000, 0) AS BIGINT))")
        .alias("u"))
    dims = (unit.select(F.posexplode("u").alias("pos", "c"))
            .groupBy("pos")
            .agg(F.sum("c").cast("long").alias("s")))
    n = unit.agg(F.count(F.lit(1)).cast("long").alias("n"))
    arr = dims.agg(F.sort_array(F.collect_list(F.struct(
        F.col("pos"), F.col("s")))).alias("arr"))
    j = arr.crossJoin(F.broadcast(n))
    norm2 = F.aggregate(
        F.col("arr"), F.lit(0.0),
        lambda a, x: a + (x.s.cast("double") / 1.0e9)
        * (x.s.cast("double") / 1.0e9))
    biased = dims.agg(F.max(F.struct(F.abs(F.col("s")).alias("a"),
                                     (-F.col("pos")).alias("np"),
                                     F.col("s"))).alias("b"))
    return (j.crossJoin(F.broadcast(biased))
            .crossJoin(F.broadcast(n.select(
                F.col("n").alias("n2"))))
            .select(
                F.col("n"),
                F.round((norm2 - F.col("n").cast("double"))
                        / (F.col("n").cast("double")
                           * (F.col("n") - 1).cast("double")), 6)
                .alias("mean_pairwise_cos"),
                (-F.col("b.np")).cast("int").alias("biased_dim"),
                F.expr("CAST(b.s DIV (n2 * 1000) AS BIGINT)")
                .alias("biased_dim_mean_ppm")))


def _sql_sim_anisotropy() -> str:
    return """
WITH unit AS (
  SELECT list_transform(cast(embedding AS DOUBLE[]), x ->
           CAST(round(x / sqrt(coalesce(list_reduce(
             list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(cast(embedding AS DOUBLE[]),
                              y -> y * y)),
             (a, b) -> a + b), 0.0)) * 1000000000, 0) AS BIGINT))
         AS u
  FROM embeddings),
dims AS (
  SELECT pos - 1 AS pos, CAST(sum(c) AS BIGINT) AS s
  FROM (SELECT unnest(u) AS c,
               generate_subscripts(u, 1) AS pos
        FROM unit)
  GROUP BY 1),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM unit),
arr AS (
  SELECT list(struct_pack(pos := pos, s := s) ORDER BY pos) AS arr
  FROM dims),
biased AS (
  SELECT first(pos ORDER BY abs(s) DESC, pos ASC) AS biased_dim,
         first(s ORDER BY abs(s) DESC, pos ASC) AS bs
  FROM dims)
SELECT n,
       round((coalesce(list_reduce(
                list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(arr, x ->
                    (CAST(x.s AS DOUBLE) / 1.0e9)
                    * (CAST(x.s AS DOUBLE) / 1.0e9))),
                (a, b) -> a + b), 0.0) - CAST(n AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)), 6)
         AS mean_pairwise_cos,
       CAST(biased_dim AS INT) AS biased_dim,
       CAST(bs // (n * 1000) AS BIGINT) AS biased_dim_mean_ppm
FROM arr CROSS JOIN n CROSS JOIN biased
"""


def q_kg_storage_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-encoding storage model for the triple store [K: the
    capacity-planning arithmetic behind every columnar KG layout —
    subj/pred/obj are low-cardinality strings, so dictionary + fixed-
    width codes shrink them to ceil(log2(V)) bits per value plus the
    dictionary itself; this op computes the exact model per column
    and the compression ratio, which is what you quote when sizing
    10^12 triples on object storage]: per column the row count,
    distinct count, code bits (bit_length(V-1), exact), raw UTF-8
    bytes, dictionary bytes, encoded bytes (codes + dict), and the
    compression ratio in ppm.

    Shape: per column one distinct agg + one length sum — three
    column passes over the triple projection, tiny output. Exact
    integers."""
    t = q_kg_triples(spark, sf_dir)
    outs = []
    for col in ("subj", "pred", "obj"):
        c = t.select(F.col(col).alias("v"))
        raw = c.agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                    F.sum(F.length(F.col("v"))).cast("long")
                    .alias("raw_bytes"))
        dc = (c.distinct()
              .agg(F.count(F.lit(1)).cast("long").alias("n_distinct"),
                   F.sum(F.length(F.col("v"))).cast("long")
                   .alias("dict_bytes")))
        outs.append(
            raw.crossJoin(F.broadcast(dc))
            .select(F.lit(col).alias("column"), "n_rows",
                    "n_distinct", "raw_bytes", "dict_bytes",
                    F.expr("CAST(CASE WHEN n_distinct <= 1 THEN 1"
                           " ELSE length(bin(n_distinct - 1)) END"
                           " AS BIGINT)").alias("code_bits"))
            .withColumn("encoded_bytes", F.expr(
                "(n_rows * code_bits + 7) DIV 8 + dict_bytes")
                .cast("long"))
            .withColumn("ratio_ppm", F.expr(
                "encoded_bytes * 1000000 DIV greatest(raw_bytes, 1)")
                .cast("long")))
    out = outs[0]
    for x in outs[1:]:
        out = out.unionByName(x)
    return out


def _sql_kg_storage_model() -> str:
    blocks = []
    for col in ("subj", "pred", "obj"):
        blocks.append(f"""
SELECT '{col}' AS "column",
       (SELECT CAST(count(*) AS BIGINT) FROM triples) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_distinct,
       (SELECT CAST(sum(length({col})) AS BIGINT) FROM triples)
         AS raw_bytes,
       CAST(sum(length(v)) AS BIGINT) AS dict_bytes,
       CAST(CASE WHEN count(*) <= 1 THEN 1
            ELSE length(bin(count(*) - 1)) END AS BIGINT)
         AS code_bits
FROM (SELECT DISTINCT {col} AS v FROM triples)""")
    body = "\nUNION ALL\n".join(blocks)
    return f"""
WITH triples AS ({_sql_kg_triples_body()}),
base AS (
{body})
SELECT "column", n_rows, n_distinct, raw_bytes, dict_bytes, code_bits,
       CAST((n_rows * code_bits + 7) // 8 + dict_bytes AS BIGINT)
         AS encoded_bytes,
       CAST(((n_rows * code_bits + 7) // 8 + dict_bytes) * 1000000
            // greatest(raw_bytes, 1) AS BIGINT) AS ratio_ppm
FROM base
"""


def q_rel_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way variance decomposition with INTERACTION [K: one-way
    eta^2 (rel_anova) misses the cases where a factor only matters
    inside another's levels — weekend orders may price differently
    ONLY for urgent priorities; SS_interaction = SS_cells - SS_A -
    SS_B is the classic detection]: one row per component (factor_a
    = weekend flag, factor_b = order priority, interaction, cells)
    with the exact integer sum bookkeeping and the eta^2 share of
    total variance (round 6). Between-group terms fold S^2/n in
    DETERMINISTIC group order (bounded cells: 2 x 5).

    Shape: ONE (cell) hash agg on the corpus; every SS derives from
    the 10-cell table via ordered folds. Whole-dollar integers (the
    rel_anova overflow trade)."""
    o = _tbl(spark, sf_dir, "orders")
    cells = (o.select(
        (F.expr("weekday(CAST(o_orderdate AS DATE))") >= 5)
        .cast("int").alias("a"),
        F.col("o_orderpriority").alias("b"),
        F.expr("CAST(round(o_totalprice, 0) AS BIGINT)").alias("d"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("ng"),
             F.sum("d").cast("long").alias("sg"),
             F.sum(F.col("d") * F.col("d")).cast("long")
             .alias("ssg")))

    def fold(groupcols):
        # sum of S^2/n over groups defined by groupcols, ordered fold
        g = (cells.groupBy(*groupcols)
             .agg(F.sum("sg").cast("long").alias("s"),
                  F.sum("ng").cast("long").alias("n")))
        key = F.concat_ws("|", *[F.col(c).cast("string")
                                 for c in groupcols])
        return (g.agg(F.aggregate(
            F.sort_array(F.collect_list(F.struct(
                key.alias("k"), F.col("s"), F.col("n")))),
            F.lit(0.0),
            lambda acc, x: acc + x.s.cast("double")
            * x.s.cast("double") / x.n.cast("double"))
            .alias("v")))

    tot = cells.agg(F.sum("ng").cast("long").alias("n"),
                    F.sum("sg").cast("long").alias("s"),
                    F.sum("ssg").cast("long").alias("ss"))
    fa = fold(["a"]).select(F.col("v").alias("fa"))
    fb = fold(["b"]).select(F.col("v").alias("fb"))
    fc = fold(["a", "b"]).select(F.col("v").alias("fc"))
    j = (tot.crossJoin(F.broadcast(fa)).crossJoin(F.broadcast(fb))
         .crossJoin(F.broadcast(fc)))
    grand = (F.col("s").cast("double") * F.col("s").cast("double")
             / F.col("n").cast("double"))
    sst = F.col("ss").cast("double") - grand
    ss_a = F.col("fa") - grand
    ss_b = F.col("fb") - grand
    ss_cells = F.col("fc") - grand
    ss_int = ss_cells - ss_a - ss_b
    rows = [
        ("factor_weekend", ss_a), ("factor_priority", ss_b),
        ("interaction", ss_int), ("cells_total", ss_cells),
    ]
    outs = []
    for name, expr in rows:
        outs.append(j.select(
            F.lit(name).alias("component"),
            F.col("n"),
            F.round(expr, 6).alias("ss"),
            F.round(expr / sst, 6).alias("eta2")))
    out = outs[0]
    for x in outs[1:]:
        out = out.unionByName(x)
    return out


def _sql_rel_interaction() -> str:
    fold = ("coalesce(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
            " list_transform(list(struct_pack(k := {key}, s := s,"
            " n := n) ORDER BY {key}), x -> CAST(x.s AS DOUBLE)"
            " * CAST(x.s AS DOUBLE) / CAST(x.n AS DOUBLE))),"
            " (a, b) -> a + b), 0.0)")
    return f"""
WITH cells AS (
  SELECT CAST(CASE WHEN isodow(CAST(o_orderdate AS DATE)) >= 6
              THEN 1 ELSE 0 END AS INT) AS a,
         o_orderpriority AS b,
         CAST(count(*) AS BIGINT) AS ng,
         CAST(sum(CAST(round(o_totalprice, 0) AS BIGINT)) AS BIGINT)
           AS sg,
         CAST(sum(CAST(round(o_totalprice, 0) AS BIGINT)
                  * CAST(round(o_totalprice, 0) AS BIGINT)) AS BIGINT)
           AS ssg
  FROM orders GROUP BY 1, 2),
tot AS (
  SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(sum(sg) AS BIGINT) AS s,
         CAST(sum(ssg) AS BIGINT) AS ss
  FROM cells),
fa AS (
  SELECT {fold.format(key="CAST(a AS VARCHAR)")} AS v
  FROM (SELECT a, CAST(sum(sg) AS BIGINT) AS s,
               CAST(sum(ng) AS BIGINT) AS n FROM cells GROUP BY 1)),
fb AS (
  SELECT {fold.format(key="b")} AS v
  FROM (SELECT b, CAST(sum(sg) AS BIGINT) AS s,
               CAST(sum(ng) AS BIGINT) AS n FROM cells GROUP BY 1)),
fc AS (
  SELECT {fold.format(key="CAST(a AS VARCHAR) || '|' || b")} AS v
  FROM (SELECT a, b, CAST(sum(sg) AS BIGINT) AS s,
               CAST(sum(ng) AS BIGINT) AS n FROM cells GROUP BY 1, 2)),
j AS (
  SELECT n, s, ss, fa.v AS fa, fb.v AS fb, fc.v AS fc
  FROM tot CROSS JOIN fa CROSS JOIN fb CROSS JOIN fc),
base AS (
  SELECT 'factor_weekend' AS component, n,
         fa - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
              / CAST(n AS DOUBLE) AS ssv,
         ss, s, fa, fb, fc FROM j
  UNION ALL
  SELECT 'factor_priority', n,
         fb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
              / CAST(n AS DOUBLE), ss, s, fa, fb, fc FROM j
  UNION ALL
  SELECT 'interaction', n,
         (fc - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
               / CAST(n AS DOUBLE))
         - (fa - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                 / CAST(n AS DOUBLE))
         - (fb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                 / CAST(n AS DOUBLE)), ss, s, fa, fb, fc FROM j
  UNION ALL
  SELECT 'cells_total', n,
         fc - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
              / CAST(n AS DOUBLE), ss, s, fa, fb, fc FROM j)
SELECT component, n, round(ssv, 6) AS ss,
       round(ssv / (CAST(ss AS DOUBLE)
                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(n AS DOUBLE)), 6) AS eta2
FROM base
"""


QQ_DECILES = (10, 20, 30, 40, 50, 60, 70, 80, 90)


def q_stats_qq_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile QQ-shift table between the two halves of the daily
    series [K: PSI (stats_psi) bins by VALUE and can alias; the
    quantile-by-quantile comparison reads WHERE the distribution
    moved — a pure location shift moves every decile equally, a tail
    event moves only the top]: per decile the TYPE-1 (lower order
    statistic — no interpolation, whose lerp formula is the known
    cross-engine hazard) daily-count quantile of each half and the
    delta in exact per-mille of the first half's median.

    Shape: one daily hash agg split by the span midpoint, a
    triangular broadcast rank on the calendar-bounded halves, a
    9-row decile join. Exact integers end to end."""
    o = _tbl(spark, sf_dir, "orders")
    daily = (o.select(F.to_date("o_orderdate").alias("day"))
             .groupBy("day")
             .agg(F.count(F.lit(1)).cast("long").alias("x")))
    span = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    lab = (daily.crossJoin(F.broadcast(span))
           .select("x", (F.datediff("day", "d0") * 2
                         >= F.datediff("d1", "d0")).cast("int")
                   .alias("half")))
    per = (lab.groupBy("half", "x")
           .agg(F.count(F.lit(1)).cast("long").alias("c")))
    cum = (per.alias("p").join(
        F.broadcast(per.alias("q")),
        (F.col("q.half") == F.col("p.half"))
        & (F.col("q.x") <= F.col("p.x")))
        .groupBy(F.col("p.half").alias("half"),
                 F.col("p.x").alias("x"))
        .agg(F.sum(F.col("q.c")).cast("long").alias("cum")))
    tot = (per.groupBy("half")
           .agg(F.sum("c").cast("long").alias("n")))
    ds = spark.createDataFrame([(d,) for d in QQ_DECILES], "pct int")
    # type-1 quantile: smallest x with cum*100 >= pct*n
    qv = (cum.join(F.broadcast(tot), "half")
          .crossJoin(F.broadcast(ds))
          .filter(F.col("cum") * 100 >= F.col("pct") * F.col("n"))
          .groupBy("half", "pct")
          .agg(F.min("x").cast("long").alias("qx")))
    h0 = qv.filter(F.col("half") == 0).select(
        "pct", F.col("qx").alias("q_first"))
    h1 = qv.filter(F.col("half") == 1).select(
        "pct", F.col("qx").alias("q_second"))
    med0 = h0.filter(F.col("pct") == 50).select(
        F.col("q_first").alias("m0"))
    return (h0.join(h1, "pct").crossJoin(F.broadcast(med0))
            .select("pct", "q_first", "q_second",
                    (F.col("q_second") - F.col("q_first")).cast("long")
                    .alias("delta"),
                    F.expr("(q_second - q_first) * 1000"
                           " DIV greatest(m0, 1)").cast("long")
                    .alias("delta_permille_of_med")))


def _sql_stats_qq_shift() -> str:
    ds = ", ".join(f"({d})" for d in QQ_DECILES)
    return f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1),
span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
lab AS (
  SELECT x, CAST(CASE WHEN datediff('day', d0, day) * 2
                      >= datediff('day', d0, d1)
                 THEN 1 ELSE 0 END AS INT) AS half
  FROM daily CROSS JOIN span),
per AS (
  SELECT half, x, CAST(count(*) AS BIGINT) AS c
  FROM lab GROUP BY 1, 2),
cum AS (
  SELECT p.half, p.x, CAST(sum(q.c) AS BIGINT) AS cum
  FROM per p JOIN per q ON q.half = p.half AND q.x <= p.x
  GROUP BY 1, 2),
tot AS (SELECT half, CAST(sum(c) AS BIGINT) AS n FROM per GROUP BY 1),
ds(pct) AS (VALUES {ds}),
qv AS (
  SELECT cum.half, pct, CAST(min(x) AS BIGINT) AS qx
  FROM cum JOIN tot USING (half) CROSS JOIN ds
  WHERE cum * 100 >= pct * n
  GROUP BY 1, 2),
h0 AS (SELECT pct, qx AS q_first FROM qv WHERE half = 0),
h1 AS (SELECT pct, qx AS q_second FROM qv WHERE half = 1),
med0 AS (SELECT q_first AS m0 FROM h0 WHERE pct = 50)
SELECT pct, q_first, q_second,
       CAST(q_second - q_first AS BIGINT) AS delta,
       CAST((q_second - q_first) * 1000 // greatest(m0, 1) AS BIGINT)
         AS delta_permille_of_med
FROM h0 JOIN h1 USING (pct) CROSS JOIN med0
"""


def q_sim_mahalanobis_ood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagonal-Mahalanobis OOD scoring [K: the model-based
    out-of-distribution detector — score = sum_i (x_i - mu_i)^2 /
    var_i is chi^2(d)-distributed for in-distribution gaussians, so
    anything far above d + 3*sqrt(2d) is OOD; complements the
    NEIGHBOR-based sim_outliers with a parametric read that needs no
    join at query time]: per vector the score (round 6) and the OOD
    flag, plus corpus d and the fence on every row. The per-dim
    mean/variance come from exact integer micro-unit moments
    (n, S, SS per position — the sim_dim_variance idiom) and the
    per-vector score folds over dims in index order (deterministic).

    Shape: one bounded posexplode + per-dim hash agg (64 rows,
    broadcast back as a sorted array), then a map-side fold per
    vector. At 10^12 vectors the stats pass is one scan and scoring
    is embarrassingly parallel."""
    v = _tbl(spark, sf_dir, "embeddings")
    comp = v.select(F.posexplode(
        F.expr("transform(CAST(embedding AS ARRAY<DOUBLE>), x ->"
               " CAST(round(x * 1000000, 0) AS BIGINT))"))
        .alias("pos", "c"))
    stats = (comp.groupBy("pos")
             .agg(F.count(F.lit(1)).cast("long").alias("n"),
                  F.sum("c").cast("long").alias("s"),
                  F.sum(F.col("c") * F.col("c")).cast("long")
                  .alias("ss")))
    arr = stats.agg(F.sort_array(F.collect_list(F.struct(
        "pos", "n", "s", "ss"))).alias("st"),
        F.count(F.lit(1)).cast("long").alias("d"))
    j = v.crossJoin(F.broadcast(arr))
    # mu_u = s/n (micro-units, double); var_u2 = (n*ss - s*s)/(n*(n-1))
    score = F.aggregate(
        F.expr("arrays_zip(transform(CAST(embedding AS ARRAY<DOUBLE>),"
               " x -> CAST(round(x * 1000000, 0) AS BIGINT)), st)"),
        F.lit(0.0),
        lambda a, z: a
        + (z["0"].cast("double") - z.st.s.cast("double")
           / z.st.n.cast("double"))
        * (z["0"].cast("double") - z.st.s.cast("double")
           / z.st.n.cast("double"))
        / ((z.st.n.cast("double") * z.st.ss.cast("double")
            - z.st.s.cast("double") * z.st.s.cast("double"))
           / (z.st.n.cast("double") * (z.st.n.cast("double")
                                       - F.lit(1.0)))))
    fence = (F.col("d").cast("double")
             + F.lit(3.0) * F.sqrt(F.lit(2.0)
                                   * F.col("d").cast("double")))
    return j.select(
        "vec_id",
        F.round(score, 6).alias("m2_score"),
        F.col("d").cast("int").alias("d"),
        F.round(fence, 6).alias("fence"),
        (score > fence).cast("int").alias("is_ood"))


def _sql_sim_mahalanobis_ood() -> str:
    return """
WITH comp AS (
  SELECT pos - 1 AS pos, c
  FROM (SELECT unnest(list_transform(cast(embedding AS DOUBLE[]),
                 x -> CAST(round(x * 1000000, 0) AS BIGINT))) AS c,
               generate_subscripts(cast(embedding AS DOUBLE[]), 1)
                 AS pos
        FROM embeddings)),
stats AS (
  SELECT pos, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS s,
         CAST(sum(c * c) AS BIGINT) AS ss
  FROM comp GROUP BY 1),
arr AS (
  SELECT list(struct_pack(pos := pos, n := n, s := s, ss := ss)
              ORDER BY pos) AS st,
         CAST(count(*) AS BIGINT) AS d
  FROM stats)
SELECT vec_id,
       round(coalesce(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         list_transform(
           list_zip(list_transform(cast(embedding AS DOUBLE[]),
                      x -> CAST(round(x * 1000000, 0) AS BIGINT)),
                    st),
           z -> (CAST(z[1] AS DOUBLE)
                 - CAST(z[2].s AS DOUBLE) / CAST(z[2].n AS DOUBLE))
                * (CAST(z[1] AS DOUBLE)
                   - CAST(z[2].s AS DOUBLE) / CAST(z[2].n AS DOUBLE))
                / ((CAST(z[2].n AS DOUBLE) * CAST(z[2].ss AS DOUBLE)
                    - CAST(z[2].s AS DOUBLE) * CAST(z[2].s AS DOUBLE))
                   / (CAST(z[2].n AS DOUBLE)
                      * (CAST(z[2].n AS DOUBLE) - 1.0))))),
         (a, b) -> a + b), 0.0), 6) AS m2_score,
       CAST(d AS INT) AS d,
       round(CAST(d AS DOUBLE) + 3.0 * sqrt(2.0 * CAST(d AS DOUBLE)),
             6) AS fence,
       CAST(CASE WHEN coalesce(list_reduce(list_prepend(
              CAST(0.0 AS DOUBLE),
              list_transform(
                list_zip(list_transform(cast(embedding AS DOUBLE[]),
                           x -> CAST(round(x * 1000000, 0)
                                     AS BIGINT)),
                         st),
                z -> (CAST(z[1] AS DOUBLE)
                      - CAST(z[2].s AS DOUBLE)
                        / CAST(z[2].n AS DOUBLE))
                     * (CAST(z[1] AS DOUBLE)
                        - CAST(z[2].s AS DOUBLE)
                          / CAST(z[2].n AS DOUBLE))
                     / ((CAST(z[2].n AS DOUBLE)
                         * CAST(z[2].ss AS DOUBLE)
                         - CAST(z[2].s AS DOUBLE)
                           * CAST(z[2].s AS DOUBLE))
                        / (CAST(z[2].n AS DOUBLE)
                           * (CAST(z[2].n AS DOUBLE) - 1.0))))),
              (a, b) -> a + b), 0.0)
            > CAST(d AS DOUBLE) + 3.0 * sqrt(2.0 * CAST(d AS DOUBLE))
            THEN 1 ELSE 0 END AS INT) AS is_ood
FROM embeddings CROSS JOIN arr
"""


def q_rel_calendar_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-month calendar-effect profile [K: billing cycles,
    payday spikes and month-end batch jobs all show as day-of-month
    structure that day-of-week seasonality misses]: per day-of-month
    the order count, share in exact ppm, lift vs the uniform
    expectation (days 29-31 occur in fewer months — the expectation
    weights by how often each dom EXISTS in the observed span,
    computed from the gap-filled calendar), and a MAD-fenced spike
    flag on the lift.

    Shape: one daily hash agg, a calendar-bounded gap-fill for the
    dom-frequency weights, one 31-row profile, the doubled-integer
    MAD fence. Exact integers."""
    o = _tbl(spark, sf_dir, "orders")
    daily = (o.select(F.to_date("o_orderdate").alias("day"))
             .groupBy("day")
             .agg(F.count(F.lit(1)).cast("long").alias("x")))
    span = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cal = span.select(F.explode(F.expr("sequence(d0, d1)"))
                      .alias("day"))
    domc = (cal.select(F.dayofmonth("day").cast("int").alias("dom"))
            .groupBy("dom")
            .agg(F.count(F.lit(1)).cast("long").alias("n_days")))
    per = (daily.select(F.dayofmonth("day").cast("int").alias("dom"),
                        "x")
           .groupBy("dom")
           .agg(F.sum("x").cast("long").alias("n_orders")))
    tot = per.agg(F.sum("n_orders").cast("long").alias("n_tot"))
    caltot = domc.agg(F.sum("n_days").cast("long").alias("cal_tot"))
    j = (per.join(F.broadcast(domc), "dom")
         .crossJoin(F.broadcast(tot))
         .crossJoin(F.broadcast(caltot))
         # lift ppm = (n_orders/n_tot) / (n_days/cal_tot)
         .withColumn("lift_ppm", F.expr(
             "n_orders * cal_tot * 1000000 DIV (n_tot * n_days)")
             .cast("long")))
    m1 = j.agg(F.expr("CAST(percentile(lift_ppm * 2, 0.5) AS BIGINT)")
               .alias("med2"))
    dv = (j.crossJoin(F.broadcast(m1))
          .withColumn("dev2", F.abs(2 * F.col("lift_ppm")
                                    - F.col("med2"))))
    m2 = dv.agg(F.expr("CAST(percentile(2 * dev2, 0.5) AS BIGINT)")
                .alias("mad4"))
    return (dv.crossJoin(F.broadcast(m2))
            .select("dom", "n_orders", "n_days",
                    F.expr("n_orders * 1000000 DIV n_tot")
                    .cast("long").alias("share_ppm"),
                    "lift_ppm",
                    F.expr("CASE WHEN dev2 * 10000 > 22239 * mad4"
                           " THEN 1 ELSE 0 END").cast("int")
                    .alias("is_spike")))


def _sql_rel_calendar_effects() -> str:
    return """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1),
span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
cal AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
              AS DATE) AS day
  FROM span),
domc AS (
  SELECT CAST(day(day) AS INT) AS dom,
         CAST(count(*) AS BIGINT) AS n_days
  FROM cal GROUP BY 1),
per AS (
  SELECT CAST(day(day) AS INT) AS dom,
         CAST(sum(x) AS BIGINT) AS n_orders
  FROM daily GROUP BY 1),
tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS n_tot FROM per),
caltot AS (SELECT CAST(sum(n_days) AS BIGINT) AS cal_tot FROM domc),
j AS (
  SELECT per.dom, n_orders, n_days,
         CAST(n_orders * cal_tot * 1000000 // (n_tot * n_days)
              AS BIGINT) AS lift_ppm,
         n_tot
  FROM per JOIN domc USING (dom)
  CROSS JOIN tot CROSS JOIN caltot),
m1 AS (SELECT CAST(quantile_cont(lift_ppm * 2, 0.5) AS BIGINT)
         AS med2 FROM j),
dv AS (
  SELECT j.*, abs(2 * lift_ppm - med2) AS dev2, med2
  FROM j CROSS JOIN m1),
m2 AS (SELECT CAST(quantile_cont(2 * dev2, 0.5) AS BIGINT) AS mad4
       FROM dv)
SELECT dom, n_orders, n_days,
       CAST(n_orders * 1000000 // n_tot AS BIGINT) AS share_ppm,
       lift_ppm,
       CAST(CASE WHEN dev2 * 10000 > 22239 * mad4
            THEN 1 ELSE 0 END AS INT) AS is_spike
FROM dv CROSS JOIN m2
"""


LONGMEM_BLOCKS = (4, 8, 16)


def q_stats_longmemory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-memory (Hurst) read on the daily series via the
    aggregated-variance method [K: if daily volumes have long-range
    dependence, variance of m-day block MEANS decays like m^(2H-2)
    instead of 1/m — H near 1 means shocks persist for weeks and
    capacity buffers sized from daily sigma are wrong; the
    block-variance ladder is the standard estimator]: per dyadic
    block size m in {4,8,16} the complete-block count, the exact
    integer variance numerator of block SUMS, the block-mean
    variance (round 6), and the Hurst estimate from the adjacent
    size pair H = 1 + log2(var(2m)/var(m))/2 (NULL on the first
    row).

    Shape: one daily agg, a calendar gap-fill, three bounded
    (blk) -> sum aggs, a 3-row ladder self-join. Exact integers
    until the final divisions."""
    o = _tbl(spark, sf_dir, "orders")
    daily = (o.select(F.to_date("o_orderdate").alias("day"))
             .groupBy("day")
             .agg(F.count(F.lit(1)).cast("long").alias("x")))
    span = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    filled = (span.select(F.explode(F.expr("sequence(d0, d1)"))
                          .alias("day"))
              .join(daily, "day", "left")
              .crossJoin(F.broadcast(span))
              .select(F.coalesce("x", F.lit(0)).cast("long").alias("x"),
                      F.datediff("day", "d0").cast("long").alias("i")))
    outs = []
    for m in LONGMEM_BLOCKS:
        blocks = (filled.withColumn("blk", F.expr(f"i DIV {m}"))
                  .groupBy("blk")
                  .agg(F.count(F.lit(1)).cast("long").alias("c"),
                       F.sum("x").cast("long").alias("s"))
                  .filter(F.col("c") == m))
        agg = blocks.agg(
            F.lit(m).cast("int").alias("m"),
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum("s").cast("long").alias("s1"),
            F.sum(F.col("s") * F.col("s")).cast("long").alias("s2"))
        outs.append(agg.select(
            "m", "n_blocks",
            (F.col("n_blocks") * F.col("s2")
             - F.col("s1") * F.col("s1")).cast("long")
            .alias("var_num"),
            # block-MEAN variance = var_num / (n*(n-1)*m^2)
            F.round((F.col("n_blocks") * F.col("s2")
                     - F.col("s1") * F.col("s1")).cast("double")
                    / (F.col("n_blocks").cast("double")
                       * (F.col("n_blocks") - 1).cast("double")
                       * F.lit(float(m * m))), 6).alias("var_mean")))
    out = outs[0]
    for x in outs[1:]:
        out = out.unionByName(x)
    prev = out.select(F.col("m").alias("pm"),
                      F.col("var_mean").alias("prev_var"))
    return (out.join(F.broadcast(prev),
                     out["m"] == prev["pm"] * 2, "left")
            .select("m", "n_blocks", "var_num", "var_mean",
                    F.round(F.lit(1.0)
                            + F.log2(F.col("var_mean")
                                     / F.col("prev_var")) / F.lit(2.0),
                            6).alias("hurst_est")))


def _sql_stats_longmemory() -> str:
    blocks = []
    for m in LONGMEM_BLOCKS:
        blocks.append(f"""
SELECT {m} AS m, CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(count(*) * sum(s * s) - sum(s) * sum(s) AS BIGINT)
         AS var_num,
       round(CAST(count(*) * sum(s * s) - sum(s) * sum(s) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE)
                * CAST(count(*) - 1 AS DOUBLE) * {float(m * m)}), 6)
         AS var_mean
FROM (SELECT i // {m} AS blk, CAST(count(*) AS BIGINT) AS c,
             CAST(sum(x) AS BIGINT) AS s
      FROM filled GROUP BY 1)
WHERE c = {m}""")
    body = "\nUNION ALL\n".join(blocks)
    return f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1),
span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
filled AS (
  SELECT CAST(coalesce(daily.x, 0) AS BIGINT) AS x,
         CAST(datediff('day', d0, c.day) AS BIGINT) AS i
  FROM (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
               AS DATE) AS day, d0
        FROM span) c
  LEFT JOIN daily ON daily.day = c.day),
base AS (
{body})
SELECT b.m, b.n_blocks, b.var_num, b.var_mean,
       round(1.0 + log2(b.var_mean / p.var_mean) / 2.0, 6)
         AS hurst_est
FROM base b LEFT JOIN base p ON b.m = p.m * 2
"""


def q_curation_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out ablation manifest [K: before an ablation
    run a data team needs the exact complements — 'corpus minus
    source X' sizes, token budgets, and unique-text counts, because
    removing a heavily-duplicated source shrinks unique mass less
    than raw mass]: per source the removed doc/token counts, the
    REMAINING docs / tokens / unique texts, and remaining shares in
    exact ppm. The unique-text complement is exact (distinct hashes
    minus hashes exclusive to the removed source), not an estimate.

    Shape: one per-source agg, one (hash) agg for exclusivity, two
    broadcast-sized joins. Exact integers."""
    d = _docs(spark, sf_dir)
    t = F.coalesce(F.col("text"), F.lit(""))
    base = d.select("source",
                    F.size(F.filter(F.split(t, r"\s+"),
                                    lambda x: x != ""))
                    .cast("long").alias("nt"),
                    F.md5(t).alias("h"))
    per = (base.groupBy("source")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("nt").cast("long").alias("n_tokens")))
    tot = per.agg(F.sum("n_docs").cast("long").alias("td"),
                  F.sum("n_tokens").cast("long").alias("tt"))
    uniq = base.select("h").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("tu"))
    # hashes exclusive to one source: distinct-source count == 1
    excl = (base.select("source", "h").distinct()
            .groupBy("h")
            .agg(F.count(F.lit(1)).cast("long").alias("ns"),
                 F.min("source").alias("only_src"))
            .filter(F.col("ns") == 1)
            .groupBy(F.col("only_src").alias("source"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_excl")))
    return (per.join(F.broadcast(excl), "source", "left")
            .crossJoin(F.broadcast(tot))
            .crossJoin(F.broadcast(uniq))
            .select("source", "n_docs", "n_tokens",
                    (F.col("td") - F.col("n_docs")).cast("long")
                    .alias("remaining_docs"),
                    (F.col("tt") - F.col("n_tokens")).cast("long")
                    .alias("remaining_tokens"),
                    (F.col("tu") - F.coalesce("n_excl", F.lit(0)))
                    .cast("long").alias("remaining_unique"),
                    F.expr("(td - n_docs) * 1000000 DIV td")
                    .cast("long").alias("remaining_docs_ppm"),
                    F.expr("(tt - n_tokens) * 1000000"
                           " DIV greatest(tt, 1)").cast("long")
                    .alias("remaining_tokens_ppm")))


def _sql_curation_ablation() -> str:
    return """
WITH base AS (
  SELECT source,
         CAST(len(list_filter(
               string_split_regex(coalesce(text, ''), '\\s+'),
               x -> x <> '')) AS BIGINT) AS nt,
         md5(coalesce(text, '')) AS h
  FROM documents),
per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(nt) AS BIGINT) AS n_tokens
  FROM base GROUP BY 1),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS td,
               CAST(sum(n_tokens) AS BIGINT) AS tt FROM per),
uniq AS (SELECT CAST(count(DISTINCT h) AS BIGINT) AS tu FROM base),
excl AS (
  SELECT only_src AS source, CAST(count(*) AS BIGINT) AS n_excl
  FROM (SELECT h, CAST(count(*) AS BIGINT) AS ns,
               min(source) AS only_src
        FROM (SELECT DISTINCT source, h FROM base) GROUP BY h)
  WHERE ns = 1 GROUP BY 1)
SELECT per.source, n_docs, n_tokens,
       CAST(td - n_docs AS BIGINT) AS remaining_docs,
       CAST(tt - n_tokens AS BIGINT) AS remaining_tokens,
       CAST(tu - coalesce(excl.n_excl, 0) AS BIGINT)
         AS remaining_unique,
       CAST((td - n_docs) * 1000000 // td AS BIGINT)
         AS remaining_docs_ppm,
       CAST((tt - n_tokens) * 1000000 // greatest(tt, 1) AS BIGINT)
         AS remaining_tokens_ppm
FROM per LEFT JOIN excl ON excl.source = per.source
CROSS JOIN tot CROSS JOIN uniq
"""


def q_stats_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's CUSUM sequential changepoint monitor on the daily
    series [K: the offline split test (rel_changepoint) finds ONE
    break after the fact; Page's one-sided CUSUM with reset is the
    ONLINE monitor — it accumulates only above-slack deviations,
    resets at zero, and alarms when the sum crosses h; ops teams run
    exactly this on daily volume]: per day the raw count, the upper
    and lower CUSUM statistics in exact DOUBLED-count units
    (reference mu = corpus median via the doubled idiom, slack k =
    MAD/2, threshold h = 5*MAD — all exact integers; the recurrence
    max(0, S + x - mu - k) folds over the calendar-bounded day array
    in date order), and the alarm flags.

    Shape: one daily agg, two O(1) percentile aggs, ONE ordered fold
    producing the full alarm series as an array, re-exploded with
    its index. Only the first agg sees the corpus."""
    o = _tbl(spark, sf_dir, "orders")
    daily = (o.select(F.to_date("o_orderdate").alias("day"))
             .groupBy("day")
             .agg(F.count(F.lit(1)).cast("long").alias("x")))
    m1 = daily.agg(F.expr("CAST(percentile(x * 2, 0.5) AS BIGINT)")
                   .alias("med2"))
    dv = (daily.crossJoin(F.broadcast(m1))
          .withColumn("dev2", F.abs(2 * F.col("x") - F.col("med2"))))
    m2 = dv.agg(F.expr("CAST(percentile(2 * dev2, 0.5) AS BIGINT)")
                .alias("mad4"))
    arr = (dv.crossJoin(F.broadcast(m2))
           .groupBy("med2", "mad4")
           .agg(F.sort_array(F.collect_list(F.struct(
               "day", "x"))).alias("days")))
    # scale everything x4: x4 = 4x, mu4 = 2*med2, k4 = mad4/2 -> use
    # 8x units to keep k integral: x8 = 8x, mu8 = 4*med2, k8 = mad4,
    # h8 = 10*mad4
    folded = arr.select(
        "med2", "mad4",
        F.expr(
            "aggregate(days, "
            " named_struct('su', CAST(0 AS BIGINT),"
            "              'sl', CAST(0 AS BIGINT),"
            "              'out', CAST(array() AS"
            "   ARRAY<STRUCT<day: DATE, x: BIGINT, su: BIGINT,"
            "                sl: BIGINT>>)),"
            " (acc, d) -> named_struct("
            "   'su', greatest(CAST(0 AS BIGINT),"
            "         acc.su + 8 * d.x - 4 * med2 - mad4),"
            "   'sl', greatest(CAST(0 AS BIGINT),"
            "         acc.sl - 8 * d.x + 4 * med2 - mad4),"
            "   'out', concat(acc.out, array(named_struct("
            "     'day', d.day, 'x', d.x,"
            "     'su', greatest(CAST(0 AS BIGINT),"
            "           acc.su + 8 * d.x - 4 * med2 - mad4),"
            "     'sl', greatest(CAST(0 AS BIGINT),"
            "           acc.sl - 8 * d.x + 4 * med2 - mad4))))),"
            " acc -> acc.out)").alias("out"))
    ex = folded.select("med2", "mad4",
                       F.explode("out").alias("r"))
    return ex.select(
        F.date_format(F.col("r.day"), "yyyy-MM-dd").alias("day"),
        F.col("r.x").cast("long").alias("x"),
        F.col("r.su").cast("long").alias("cusum_up8"),
        F.col("r.sl").cast("long").alias("cusum_dn8"),
        (F.col("r.su") > 10 * F.col("mad4")).cast("int")
        .alias("alarm_up"),
        (F.col("r.sl") > 10 * F.col("mad4")).cast("int")
        .alias("alarm_dn"))


def _sql_stats_cusum() -> str:
    return """
WITH RECURSIVE daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1),
m1 AS (SELECT CAST(quantile_cont(x * 2, 0.5) AS BIGINT) AS med2
       FROM daily),
dv AS (SELECT day, x, abs(2 * x - med2) AS dev2, med2
       FROM daily CROSS JOIN m1),
m2 AS (SELECT CAST(quantile_cont(2 * dev2, 0.5) AS BIGINT) AS mad4
       FROM dv),
di AS (
  SELECT row_number() OVER (ORDER BY day) AS i, day, x, med2, mad4
  FROM dv CROSS JOIN m2),
rec AS (
  SELECT i, day, x, med2, mad4,
         greatest(CAST(0 AS BIGINT), 8 * x - 4 * med2 - mad4) AS su,
         greatest(CAST(0 AS BIGINT), -8 * x + 4 * med2 - mad4) AS sl
  FROM di WHERE i = 1
  UNION ALL
  SELECT d.i, d.day, d.x, d.med2, d.mad4,
         greatest(CAST(0 AS BIGINT),
                  r.su + 8 * d.x - 4 * d.med2 - d.mad4),
         greatest(CAST(0 AS BIGINT),
                  r.sl - 8 * d.x + 4 * d.med2 - d.mad4)
  FROM rec r JOIN di d ON d.i = r.i + 1)
SELECT strftime(day, '%Y-%m-%d') AS day, x,
       CAST(su AS BIGINT) AS cusum_up8,
       CAST(sl AS BIGINT) AS cusum_dn8,
       CAST(CASE WHEN su > 10 * mad4 THEN 1 ELSE 0 END AS INT)
         AS alarm_up,
       CAST(CASE WHEN sl > 10 * mad4 THEN 1 ELSE 0 END AS INT)
         AS alarm_dn
FROM rec
"""


TRUNC_PREFIX_CHARS = 64


def q_dedup_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation-family detection [K: crawler artifacts — the same
    page fetched with different size limits yields docs that agree
    on a long PREFIX but differ in length; exact-hash dedup misses
    them and near-dup may too when the tails diverge enough; keying
    on the first 64 chars finds the families directly]: per prefix
    family with >= 2 docs, the family size, distinct full-text
    count, length spread, and the truncation flag (distinct texts
    AND length spread — same-length same-text families are plain
    exact dups, not truncations).

    Shape: map-side prefix hash -> one family agg -> HAVING >= 2.
    The prefix hash (not the raw prefix) is the shuffle key."""
    d = _docs(spark, sf_dir)
    t = F.coalesce(F.col("text"), F.lit(""))
    base = d.select(
        F.md5(F.substring(t, 1, TRUNC_PREFIX_CHARS)).alias("pk"),
        F.length(t).cast("long").alias("nc"),
        F.md5(t).alias("h"))
    fam = (base.groupBy("pk")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.countDistinct("h").cast("long").alias("n_texts"),
                F.min("nc").cast("long").alias("min_chars"),
                F.max("nc").cast("long").alias("max_chars")))
    return (fam.filter(F.col("n_docs") >= 2)
            .select("pk", "n_docs", "n_texts", "min_chars",
                    "max_chars",
                    ((F.col("n_texts") >= 2)
                     & (F.col("max_chars") > F.col("min_chars")))
                    .cast("int").alias("is_truncation_family")))


def _sql_dedup_truncation() -> str:
    return f"""
WITH base AS (
  SELECT md5(substring(coalesce(text, ''), 1,
                       {TRUNC_PREFIX_CHARS})) AS pk,
         CAST(length(coalesce(text, '')) AS BIGINT) AS nc,
         md5(coalesce(text, '')) AS h
  FROM documents),
fam AS (
  SELECT pk, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT h) AS BIGINT) AS n_texts,
         CAST(min(nc) AS BIGINT) AS min_chars,
         CAST(max(nc) AS BIGINT) AS max_chars
  FROM base GROUP BY 1)
SELECT pk, n_docs, n_texts, min_chars, max_chars,
       CAST(CASE WHEN n_texts >= 2 AND max_chars > min_chars
            THEN 1 ELSE 0 END AS INT) AS is_truncation_family
FROM fam WHERE n_docs >= 2
"""
