"""Round-4 query additions: batch multi-query search and N-Triples
export — invariants beyond the DuckDB pairing."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from otd_semantic_framework_spark.plans.driver_queries import (
    BATCH_SEARCH_QUERIES, SEARCH_QUERY, q_kg_batch_search, q_kg_nt_export,
    q_kg_search, q_kg_triples)

SF = "/root/testdata/sf0.001"


def test_batch_search_query0_matches_single_search(spark):
    """Query 0 of the batch IS the kg_search query string, so the
    batch's per-query top-10 must equal the single-query top-20's first
    ten rows — one pass over CDS serving N queries loses nothing."""
    assert BATCH_SEARCH_QUERIES[0] == SEARCH_QUERY
    batch = {(r.subj_key, r.rank, r.search_score)
             for r in q_kg_batch_search(spark, SF)
             .filter(F.col("query_id") == 0).collect()}
    single = {(r.subj_key, r.rank, r.search_score)
              for r in q_kg_search(spark, SF)
              .filter(F.col("rank") <= 10).collect()}
    assert batch == single


def test_batch_search_every_query_served(spark):
    rows = q_kg_batch_search(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    # every batch query matched concepts in the corpus and ranked 1..k
    assert set(by_q) == set(range(len(BATCH_SEARCH_QUERIES)))
    for qid, rs in by_q.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= 10


_NT_LINE = re.compile(
    r'^<[^ >]+> <[^ >]+> (<[^ >]+>|"(\\.|[^"\\])*") \.$')


def test_nt_export_wellformed_and_complete(spark):
    """Every triple becomes exactly one syntactically valid N-Triples
    line; on this corpus every object is prefixed (concept/tool/turn)
    so all objects render as percent-encoded IRIs."""
    triples = q_kg_triples(spark, SF)
    lines = q_kg_nt_export(spark, SF).collect()
    assert len(lines) == triples.count()
    for r in lines[:2000]:
        assert _NT_LINE.match(r.line), r.line
        assert '"' not in r.line  # all-IRI corpus


def test_nt_export_literal_escaping(spark):
    """The literal branch (non-prefixed objects) quotes and escapes
    backslashes and double quotes."""
    from otd_semantic_framework_spark.sources.rdf import format_ntriples
    t = spark.createDataFrame(
        [("turn:c:1", "says", 'he said "hi" \\ bye'),
         ("turn:c:1", "mentions", "dq:L01")],
        "subj string, pred string, obj string")
    lines = sorted(r.line for r in format_ntriples(t).collect())
    assert lines[0] == (
        '<http://example.org/kg/turn%3Ac%3A1> '
        '<http://example.org/kg/mentions> '
        '<http://example.org/kg/dq%3AL01> .')
    assert lines[1] == (
        '<http://example.org/kg/turn%3Ac%3A1> '
        '<http://example.org/kg/says> '
        '"he said \\"hi\\" \\\\ bye" .')
    for li in lines:
        assert _NT_LINE.match(li), li


# ---------------------------------------------------------------------------
# Multi-vector late interaction (MaxSim)
# ---------------------------------------------------------------------------

def test_token_slices_reassemble(spark):
    """Concatenating the token slices reproduces the original vector —
    the split is lossless and ordered, so MaxSim sees every dimension
    exactly once."""
    from otd_semantic_framework_spark.operators.simsearch import (
        quantize_embeddings, token_slices)
    e = spark.read.parquet(SF + "/embeddings.parquet").limit(50)
    qz = quantize_embeddings(e)
    sliced = token_slices(qz, n_tokens=4)
    bad = (sliced.join(quantize_embeddings(e), "vec_id")
           .filter(F.flatten("toks") != F.col("qvec")).count())
    assert bad == 0


def test_maxsim_matches_numpy_bruteforce(spark):
    """MaxSim scores are exact integers: the JVM HOF expression must
    equal a numpy sum-of-max-of-dots replay bit for bit."""
    import numpy as np
    from otd_semantic_framework_spark.operators.simsearch import (
        maxsim_topk, quantize_embeddings, token_slices)
    e = spark.read.parquet(SF + "/embeddings.parquet").limit(40)
    qz = token_slices(quantize_embeddings(e), n_tokens=4)
    q = (qz.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("qid"), "toks"))
    c = (qz.filter(F.col("vec_id") >= 3)
         .select(F.col("vec_id").alias("cid"), "toks"))
    got = {(r.qid, r.cid): r.maxsim
           for r in maxsim_topk(q, c, k=1000).collect()}
    toks = {r.vec_id: np.array(r.toks, dtype=np.int64)
            for r in qz.collect()}
    for (qid, cid), score in got.items():
        dots = toks[qid] @ toks[cid].T          # (Tq, Tc) token dots
        assert score == int(dots.max(axis=1).sum()), (qid, cid)


def test_maxsim_plan_is_jvm_only(spark):
    """The scoring expression is higher-order functions, not Python:
    the physical plan must contain no Python evaluation node and must
    broadcast the candidate side."""
    from otd_semantic_framework_spark.plans.driver_queries import (
        q_sim_maxsim_topk)
    plan = (q_sim_maxsim_topk(spark, SF)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
