"""Shared helpers/constants for the driver query modules.

Generated from plans/driver_queries.py by scripts/split_driver_queries.py
(round 5); original source order preserved. Do not edit the monolith
back into existence — edit here.
"""

from __future__ import annotations


from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ... import semantics as S
from ...operators.linking import canonicalize
from ...operators.wup import concept_similarity
from ...schemas import CONCEPT_SIMILARITY
from ..driver_ontology import (driver_ancestors, driver_concepts,
                              driver_gazetteer, driver_scores, driver_wup,
                              values_sql)

# ---------------------------------------------------------------------------
# Derived transcripts (portable across Spark SQL and DuckDB)
# ---------------------------------------------------------------------------

import math as _math

#: Benford expected share of first significant digit d, in exact ppm —
#: computed ONCE here and inlined into both engines as the same integer
#: literal, so no cross-engine transcendental is ever compared.


__all__ = [
    "N_CONVS",
    "TRANSCRIPTS_CTE",
    "_docs",
    "_tbl",
    "derived_transcripts",
    "_gaz_df",
    "_scores_df",
    "_wup_df",
    "_gaz_values",
    "_mentions_df",
    "_MENTIONS_CTE",
    "SEARCH_QUERY",
    "_onto_versions_pdf",
    "_branch_map_pdf",
    "BATCH_SEARCH_QUERIES",
    "_batch_query_vectors",
    "HH_PHI_INV",
    "_manual_raw_df",
    "_onto_ids_df",
    "_views",
    "ASOF_MAX_BUCKETS",
    "ASOF_BUCKET_MIN",
    "JACCARD_THRESHOLD",
    "JACCARD_MAX_DOC",
    "JACCARD_DF_CAP",
    "SAMPLE_PER_STRATUM",
    "_MEDIA_CTE",
    "_STOPWORDS",
    "N_QUERY_VECS",
    "SIM_TOP_K",
    "ANN_N_PLANES",
    "ANN_K",
    "IVF_N_CELLS",
    "IVF_N_PROBE",
    "EMB_DEDUP_THRESHOLD",
    "MINHASH_THRESHOLD",
    "SIMHASH_MAX_HAMMING",
    "_fast_onto_pdf",
    "_fast_canon_pdf",
    "MAXSIM_TOKENS",
    "PACK_BUDGET",
    "CONTAM_N",
    "CONTAM_PROBE_MOD",
    "SPAN_N",
    "MIXTURE_TARGET",
    "MIXTURE_SCALE",
    "_SQL_REL_MISC_FNS_DUCK",
    "_SQL_REL_ARRAY_FNS_DUCK",
    "PAGERANK_ITERS",
    "BM25_TERMS",
    "BM25_K",
    "BGP_CONCEPT",
    "PATH_DEPTH",
    "VALIDATE_BAD_ROWS",
    "PROFILE_COLS",
    "N_NEG_SAMPLES",
    "WEIGHTED_SAMPLE_N",
    "TS_BASE_S",
    "_transcripts_with_ts",
    "_TS_TRANSCRIPTS_CTE",
    "SOURCE_FILTER_BLOCKLIST",
    "INCR_DEDUP_MOD",
    "EPISODE_JACCARD",
    "NDCG_K",
    "RESIZE_MAX_SIDE",
    "_comention_edges",
    "BOILER_SEG_WORDS",
    "BOILER_DF_CAP",
    "KCORE_K",
    "KCORE_ROUNDS",
    "VOCAB_TOP",
    "OVERLAP_SHINGLE",
    "ATTRITION_MIN_TOKENS",
    "ATTRITION_LANG",
    "ATTRITION_MAX_TOK_SHARE_PPM",
    "ATTRITION_MIN_TTR_PPM",
    "KMEANS_K",
    "KMEANS_ITERS",
    "KMEANS_DIM",
    "CHUNK_TOKENS",
    "CHUNK_STRIDE",
    "PHASH_MAX_HAMMING",
    "KANON_K",
    "HITS_ITERS",
    "BLOOM_N",
    "ASK_CONCEPT",
    "ASK_TOOL",
    "ASK_MISSING",
    "SPLIT_TRAIN_MAX",
    "SPLIT_VAL_MAX",
    "STREAM_TOPK_K",
    "STREAK_MAX_EVENTS",
    "EDIT_PREFIX_TOKS",
    "EDIT_BLOCK_CAP",
    "EDIT_VERIFY_CHARS",
    "EDIT_MAX_DIST",
    "BFS_SEEDS",
    "BFS_MAX_HOPS",
    "LP_ROUNDS",
    "STREAM_LATE_DELAY_MIN",
    "STREAM_LATE_BATCHES",
    "KS_BINS",
    "_PY_STOPWORDS",
    "KEYPHRASE_TOP",
    "BENFORD_PPM",
    "STATEFUL_BATCHES",
    "GAPFILL_PPM",
    "SP_WEIGHTS",
    "SP_ROUNDS",
    "SPARQL_AGG_MIN_TURNS",
    "PQ_SUBS",
    "PQ_CODES",
    "SKIPGRAM_WINDOW",
    "SKIPGRAM_MIN_PAIRS",
    "LINKPRED_MIN_COMMON",
    "LINKPRED_TOP",
    "LINKPRED_HUB_CAP",
    "COLLOC_MIN_COUNT",
    "COLLOC_TOP",
    "CONC_TTL_MIN",
    "WALK_LEN",
    "CONTAIN_THRESHOLD_PPM",
    "DESCRIBE_NODE",
    "TWO_STAGE_SHORTLIST",
    "WALK_PAIR_WINDOW",
    "DIRECT_MAP_MODULUS",
    "SEQ_MIN_SUPPORT",
    "TOKEN_BUDGET",
    "CLOSENESS_MIN_CONVS",
    "CLOSENESS_MAX_HOPS",
    "BINQ_WIDTH_CENTS",
    "BINQ_SHARD_BINS",
    "BINQ_QUANTILES_PPM",
    "COLLECTIVE_TOP_K",
    "COLLECTIVE_W_PRIOR",
    "COLLECTIVE_W_CTX",
    "KMV_K",
    "KMV_PREFIX_HEX",
    "KMV_SPACE",
    "FK_CANDIDATES",
    "PPR_ITERS",
    "PRF_FB_DOCS",
    "PRF_FB_TERMS",
    "PRF_BETA",
    "LINKPRED_EVAL_HITS_K",
    "SAMEAS_PREFIX",
    "MMR_K",
    "MMR_SELECT",
    "MMR_LAMBDA_NUM",
    "RRF_C",
    "RRF_N",
    "RRF_TOP",
    "ATTR_CONV_TYPE",
    "ATTR_U_END_PPM",
    "BASKET_MIN_SUP",
    "RFM_R_DAYS",
    "RFM_F_ORDERS",
    "RFM_M_CENTS",
    "_rfm_case",
    "PREFIX_DIMS",
    "PREFIX_RECALL_K",
    "KEEP_MIN_TOKENS",
    "KEEP_TTR_PCT",
    "POOL_SIGN_BITS",
    "POOL_TOP",
    "HILL_DMIN",
    "BURST_MIN_TOTAL",
    "MM_PATCH",
    "IMPACT_CONV_SUFFIX",
    "VOCAB_COV_SIZES",
    "DOMAIN_WEIGHT_CAP_PPM",
    "NBR_FANOUT_H1",
    "NBR_FANOUT_H2",
    "BOOT_REPLICATES",
    "BOOT_POISSON_THRESH",
    "SWEEP_THRESHOLDS",
    "DRIFT_SCALE",
    "KNNG_K",
    "KNNG_N_PLANES",
    "ACF_MAX_LAG",
    "ANNEAL_EPOCHS",
    "ANNEAL_WEIGHT_SCALE",
    "GUMBEL_EULER",
    "ANN_SWEEP_PLANES",
    "DIAM_MAX_HOPS",
    "HEAPS_GRID_PPM",
    "HHI_SCALE",
    "CAL_BIN_W",
    "CODE_SYMBOLS",
    "EWMA_HORIZON",
    "DIMVAR_SCALE",
    "DIMVAR_DEAD_PPM",
    "BLOCKLIST_TERMS",
    "LEET_SRC",
    "LEET_DST",
    "TRIPLET_MARGIN_PPM",
    "TRIPLET_N_PLANES",
    "_PUNCT_CC",
    "VELOCITY_WINDOW_S",
    "VELOCITY_FENCE",
    "CCF_MAX_LAG",
    "CCF_TYPE_X",
    "CCF_TYPE_Y",
    "APPORTION_BUDGET",
    "PSI_DORMANT_DAYS",
    "ANOVA_FACTORS",
    "HASH_PREFIX_BITS",
    "CIRCADIAN_COS_NANO",
    "CIRCADIAN_SIN_NANO",
    "SAMPLE_AUDIT_PCT",
    "IVF_SWEEP_PROBES",
    "SALT_TARGET_PER_KEY",
    "MEMO_NGRAM_N",
    "SURVIVAL_CENSOR_DAYS",
    "IMPERATIVE_VERBS",
    "SIMPSON_VALUE_FENCE",
    "QQ_DECILES",
    "LONGMEM_BLOCKS",
    "TRUNC_PREFIX_CHARS",
]


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


SEARCH_QUERY = "fast hash join on a big table"


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


def _branch_map_pdf():
    """(concept_id, branch) — each concept's depth-2 ancestor (itself if
    it IS a branch); the root maps to nothing. Shared by the Spark
    broadcast side and the DuckDB VALUES replay."""
    import pandas as pd
    return pd.DataFrame(
        [(c.concept_id, c.path[1]) for c in driver_concepts()
         if len(c.path) >= 2],
        columns=["concept_id", "branch"])


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


HH_PHI_INV = 100  # heavy hitter = token holding >= 1% of all tokens:
# the synthetic vocabulary has 30 tokens near 3.3% and one ('dup') at
# ~0.1%, so the threshold genuinely separates at every sf. (The MG
# counter budget 2*phi_inv exceeds this corpus's 31 distinct tokens;
# the real decrement machinery is exercised by the 502-key pytest.)


def _manual_raw_df(spark: SparkSession) -> DataFrame:
    from ..driver_ontology import driver_manual_tags
    m = driver_manual_tags()
    return spark.createDataFrame(
        m, "conv_id string, concept_id string, weight double").select(
        F.concat(F.lit("conv:"), F.col("conv_id")).alias("subj_key"),
        "concept_id", "weight")


def _onto_ids_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(c.concept_id,) for c in driver_concepts()], "concept_id string")


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        _tbl(spark, sf_dir, n).createOrReplaceTempView(n)


ASOF_MAX_BUCKETS = 200_000
# envelope start: 100 years before epoch (day -36500 ≈ 1870); with
# ASOF_MAX_BUCKETS days the envelope ends ≈ year 2417. Out-of-envelope
# timestamps raise (see q_rel_asof_join) rather than silently dropping.
ASOF_BUCKET_MIN = -36_500


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


SAMPLE_PER_STRATUM = 20


_MEDIA_CTE = """
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image/png'
              WHEN doc_id % 3 = 1 THEN 'audio/wav'
              ELSE 'video/mp4' END AS media_type,
         strlen(text) AS n_bytes
  FROM documents
"""


_STOPWORDS = "('a', 'the', 'of', 'and', 'to', 'in', 'is')"


N_QUERY_VECS = 5
SIM_TOP_K = 5


ANN_N_PLANES = 4
ANN_K = 5
IVF_N_CELLS = 16
IVF_N_PROBE = 4


EMB_DEDUP_THRESHOLD = 0.38


MINHASH_THRESHOLD = 0.5


SIMHASH_MAX_HAMMING = 16


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


def _fast_canon_pdf():
    """The precomputed surface→canonical table build_triples_fast uses,
    recomputed with the same driver-side functions for the oracle."""
    import pandas as pd

    from ...operators.linking import surface_canonical_table
    concepts = list(driver_concepts())
    gaz = S.build_gazetteer(concepts)
    wup_pdf = pd.DataFrame(
        [(a.concept_id, b.concept_id, S.wup_similarity(a, b))
         for a in concepts for b in concepts],
        columns=["concept_a", "concept_b", "wup"])
    return surface_canonical_table(_fast_onto_pdf(), gaz, wup_pdf)


MAXSIM_TOKENS = 4          # 64-dim vectors -> 4 token slices of width 16


PACK_BUDGET = 512


CONTAM_N = 8
CONTAM_PROBE_MOD = 7


SPAN_N = 8


MIXTURE_TARGET = 120
MIXTURE_SCALE = 1_000_000


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


PAGERANK_ITERS = 4


BM25_TERMS = ["join", "filter", "dup", "spark"]
BM25_K = 25


BGP_CONCEPT = "dq:L17"
PATH_DEPTH = 3


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


PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


N_NEG_SAMPLES = 2


WEIGHTED_SAMPLE_N = 50


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


SOURCE_FILTER_BLOCKLIST = ("src13",)


INCR_DEDUP_MOD = 10  # doc_id % 10 == 0 -> the "incoming batch"


EPISODE_JACCARD = 0.5  # boundary when concept overlap with prev turn < this


NDCG_K = 10


RESIZE_MAX_SIDE = 32


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


BOILER_SEG_WORDS = 3
BOILER_DF_CAP = 5


KCORE_K = 20
KCORE_ROUNDS = 6


VOCAB_TOP = 200


OVERLAP_SHINGLE = 3


ATTRITION_MIN_TOKENS = 20
ATTRITION_LANG = "en"
ATTRITION_MAX_TOK_SHARE_PPM = 150_000
ATTRITION_MIN_TTR_PPM = 500_000


KMEANS_K = 8
KMEANS_ITERS = 2
KMEANS_DIM = 64


CHUNK_TOKENS = 16
CHUNK_STRIDE = 12


PHASH_MAX_HAMMING = 24


KANON_K = 5


HITS_ITERS = 2


BLOOM_N = 6


ASK_CONCEPT = "dq:L27"
ASK_TOOL = "tool:tool3"
ASK_MISSING = "dq:NO_SUCH_CONCEPT"


SPLIT_TRAIN_MAX = 204  # of 256 two-hex-digit buckets → ~80 %
SPLIT_VAL_MAX = 230    # next ~10 %; rest is test


STREAM_TOPK_K = 3


STREAK_MAX_EVENTS = None  # full events table; islands keyed per user


EDIT_PREFIX_TOKS = 4     # block key: md5 of the first 4 tokens
EDIT_BLOCK_CAP = 64      # drop hot blocks (candidate recall tradeoff)
EDIT_VERIFY_CHARS = 120  # Levenshtein window — bounds per-pair cost
EDIT_MAX_DIST = 20


BFS_SEEDS = ("dq:L27", "tool:tool3")
BFS_MAX_HOPS = 3


LP_ROUNDS = 2


STREAM_LATE_DELAY_MIN = 37   # odd delay: watermarks never tie a window end
STREAM_LATE_BATCHES = 4


KS_BINS = 256
_PY_STOPWORDS = ["a", "the", "of", "and", "to", "in", "is"]


KEYPHRASE_TOP = 50


BENFORD_PPM = {d: round(_math.log10(1 + 1 / d) * 1_000_000)
               for d in range(1, 10)}


STATEFUL_BATCHES = 4


GAPFILL_PPM = 1_000_000


SP_WEIGHTS = {"mentions": 3, "uses_tool": 2, "replies_to": 1}
SP_ROUNDS = 3


SPARQL_AGG_MIN_TURNS = 2


PQ_SUBS = 4    # 64-dim vectors -> 4 subspaces of width 16
PQ_CODES = 8   # codewords per subspace -> 1 byte of code per subspace


SKIPGRAM_WINDOW = 2
SKIPGRAM_MIN_PAIRS = 2


LINKPRED_MIN_COMMON = 2
LINKPRED_TOP = 5
LINKPRED_HUB_CAP = 64  # middle nodes above this degree generate no pairs


COLLOC_MIN_COUNT = 3
COLLOC_TOP = 100


CONC_TTL_MIN = 10


WALK_LEN = 4


CONTAIN_THRESHOLD_PPM = 800_000


DESCRIBE_NODE = "dq:L27"


TWO_STAGE_SHORTLIST = 15


WALK_PAIR_WINDOW = 2


DIRECT_MAP_MODULUS = 10


SEQ_MIN_SUPPORT = 3
#: curation_token_budget: per-domain whitespace-token budget
TOKEN_BUDGET = 800
#: kg_closeness: co-occurrence edge floor / BFS hop bound
CLOSENESS_MIN_CONVS = 2
CLOSENESS_MAX_HOPS = 4


BINQ_WIDTH_CENTS = 10_000        # $100 bins over l_extendedprice
BINQ_SHARD_BINS = 64             # bins per cumulative-sum shard
BINQ_QUANTILES_PPM = (250_000, 500_000, 750_000, 900_000, 990_000)
COLLECTIVE_TOP_K = 5             # candidate set: self + 4 wup-nearest
COLLECTIVE_W_PRIOR = 2           # linker-prior weight in the blend
COLLECTIVE_W_CTX = 5             # conversation-coherence weight
# (2,5) flips ~11% of fixture picks: a neighbor wins only when its
# average-wup coherence advantage exceeds 2/5 of its prior deficit.


KMV_K = 64                       # k-minimum-values sketch size
KMV_PREFIX_HEX = 12              # 48-bit hash prefix (exact in BIGINT)
KMV_SPACE = 16 ** KMV_PREFIX_HEX


FK_CANDIDATES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("orders", "o_custkey", "supplier", "s_suppkey"),
]


PPR_ITERS = 4


PRF_FB_DOCS = 10   # pseudo-relevant subjects fed back
PRF_FB_TERMS = 3   # expansion concepts taken from the feedback set
PRF_BETA = 0.05    # Rocchio beta / |FB|: expansion weight multiplier


LINKPRED_EVAL_HITS_K = 5


SAMEAS_PREFIX = 32  # utterance-fingerprint length (chars of normalized text)


MMR_K = 20       # candidate pool = the P17 top-K
MMR_SELECT = 5   # reranked results returned
MMR_LAMBDA_NUM = 7   # lambda = 0.7 as the integer pair (7, 3)/10


RRF_C = 60    # the standard RRF damping constant [K]
RRF_N = 25    # per-leg candidate depth
RRF_TOP = 10  # fused results returned


ATTR_CONV_TYPE = "purchase"   # the conversion event
ATTR_U_END_PPM = 400_000      # U-shaped: 40% first, 40% last, 20% middle


BASKET_MIN_SUP = 3  # minimum pair support for an emitted rule


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


PREFIX_DIMS = 16       # truncated head of the 64-dim embedding
PREFIX_RECALL_K = 10   # top-k depth compared


KEEP_MIN_TOKENS = 20   # short-doc gate
KEEP_TTR_PCT = 35      # lexical-diversity gate: distinct*100 < n*35


POOL_SIGN_BITS = 4   # sign-bucket width for the pooled-neighbor join
POOL_TOP = 3         # neighbors returned per conversation


HILL_DMIN = 16  # tail threshold for the Hill estimator


BURST_MIN_TOTAL = 100  # corpus-count floor for emitted tokens


MM_PATCH = 16  # ViT-style square patch side


IMPACT_CONV_SUFFIX = "1"  # the "changed since last build" conv set


VOCAB_COV_SIZES = (1, 2, 4, 8, 16, 32)  # candidate vocabulary sizes


DOMAIN_WEIGHT_CAP_PPM = 3_000_000  # max upweight any domain receives


NBR_FANOUT_H1 = 3  # hop-1 sampled neighbors per seed
NBR_FANOUT_H2 = 2  # hop-2 sampled neighbors per hop-1 node


BOOT_REPLICATES = 48
# floor(CDF_Poisson(lambda=1)(k) * 2^24) for k = 0..6; a draw whose
# 24-bit hash point falls below threshold[k] gets weight k (ELSE 7
# caps the tail). Integer thresholds make the inverse-CDF comparison
# EXACT on every engine — no float CDF evaluation at query time.
BOOT_POISSON_THRESH = (6171992, 12343985, 15429982, 16458647,
                       16715813, 16767247, 16775819)


SWEEP_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9)


DRIFT_SCALE = 1000  # fixed-point quantization for centroid sums: small
# enough that per-(label, half) component sums and their squared dots
# stay far inside BIGINT at the test scales (re-scale when a single
# stratum exceeds ~10^8 rows), large enough that a drift metric loses
# nothing that matters.


KNNG_K = 5
KNNG_N_PLANES = 3


ACF_MAX_LAG = 7


ANNEAL_EPOCHS = 4
ANNEAL_WEIGHT_SCALE = 1000


GUMBEL_EULER = 0.5772156649015329


ANN_SWEEP_PLANES = (2, 3, 4, 5)


DIAM_MAX_HOPS = 12


HEAPS_GRID_PPM = (125000, 250000, 500000, 1000000)


HHI_SCALE = 1000


CAL_BIN_W = 1  # cosine bin width in tenths: [-1,1] -> 20 bins of 0.1


CODE_SYMBOLS = "{}();=<>[]"


EWMA_HORIZON = 30  # days; weights below 2^-30 are exactly zero


DIMVAR_SCALE = 1000
DIMVAR_DEAD_PPM = 100000  # flag dims with < 10% of the mean variance


BLOCKLIST_TERMS = ("casino", "lottery", "viagra", "warez", "xxx")
LEET_SRC = "013457@$"
LEET_DST = "oieastas"


TRIPLET_MARGIN_PPM = 50000
TRIPLET_N_PLANES = 3


_PUNCT_CC = r"[!-/:-@\[-`{-~]"


VELOCITY_WINDOW_S = 600
VELOCITY_FENCE = 5


CCF_MAX_LAG = 7
CCF_TYPE_X = "error"
CCF_TYPE_Y = "purchase"


APPORTION_BUDGET = 100000


PSI_DORMANT_DAYS = 14


ANOVA_FACTORS = ("o_orderpriority", "o_orderstatus")


HASH_PREFIX_BITS = (8, 16, 24)


CIRCADIAN_COS_NANO = (1000000000, 965925826, 866025404, 707106781, 500000000, 258819045, 0, -258819045, -500000000, -707106781, -866025404, -965925826, -1000000000, -965925826, -866025404, -707106781, -500000000, -258819045, 0, 258819045, 500000000, 707106781, 866025404, 965925826)
CIRCADIAN_SIN_NANO = (0, 258819045, 500000000, 707106781, 866025404, 965925826, 1000000000, 965925826, 866025404, 707106781, 500000000, 258819045, 0, -258819045, -500000000, -707106781, -866025404, -965925826, -1000000000, -965925826, -866025404, -707106781, -500000000, -258819045)


SAMPLE_AUDIT_PCT = 10


IVF_SWEEP_PROBES = (1, 2, 4, 8)


SALT_TARGET_PER_KEY = 4096


MEMO_NGRAM_N = 8


SURVIVAL_CENSOR_DAYS = 14


IMPERATIVE_VERBS = ("answer", "create", "describe", "explain", "find",
                    "generate", "give", "list", "make", "please",
                    "show", "summarize", "tell", "translate", "write")


SIMPSON_VALUE_FENCE = 100.0


QQ_DECILES = (10, 20, 30, 40, 50, 60, 70, 80, 90)


LONGMEM_BLOCKS = (4, 8, 16)


TRUNC_PREFIX_CHARS = 64

