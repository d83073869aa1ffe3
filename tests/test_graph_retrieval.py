"""Unit tests for the round-3 tail operators: exact-integer PageRank,
concept lift, BM25 retrieval, and the corpus-trained bigram LM — all
against hand-computed expectations on tiny inputs, plus the
partitioning-invariance property the exact-integer designs promise.
"""

import math

import pytest
from pyspark.sql import functions as F

from otd_semantic_framework_spark.operators.graph import (
    PPM, concept_lift, pagerank_exact)
from otd_semantic_framework_spark.operators.curation import (
    bigram_lm_cost, bm25_topk)


def _triples(spark, rows):
    return spark.createDataFrame(
        [(s, "mentions", o, "c", 0, 1.0) for s, o in rows],
        "subj string, pred string, obj string, conv_id string, "
        "turn_idx int, score double")


def _hand_pagerank(edges, iterations):
    nodes = sorted({n for e in edges for n in e})
    out_deg = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    rank = {n: PPM for n in nodes}
    for _ in range(iterations):
        inflow = {n: 0 for n in nodes}
        for s, o in edges:
            inflow[o] += rank[s] // out_deg[s]
        rank = {n: 150000 + (850 * inflow[n]) // 1000 for n in nodes}
    return rank


@pytest.mark.parametrize("iterations", [1, 4])
def test_pagerank_matches_hand_model(spark, iterations):
    # a cycle with a chord, a dangling sink, and a two-source hub
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
             ("c", "d"), ("e", "d"), ("e", "b")]
    got = {r.node: r["rank"] for r in
           pagerank_exact(_triples(spark, edges),
                          iterations=iterations).collect()}
    assert got == _hand_pagerank(edges, iterations)


def test_pagerank_partitioning_invariance(spark):
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 23}") for i in range(40)]
    t = _triples(spark, edges)
    base = sorted((r.node, r["rank"])
                  for r in pagerank_exact(t, iterations=3).collect())
    re13 = sorted((r.node, r["rank"])
                  for r in pagerank_exact(t.repartition(13),
                                          iterations=3).collect())
    assert base == re13  # integer arithmetic: merge order can't matter


def test_concept_lift_hand_counts(spark):
    convs = {"c1": ["x", "y"], "c2": ["x", "y", "z"], "c3": ["x", "z"],
             "c4": ["y"]}
    rows = [(c, k) for c, ks in convs.items() for k in ks]
    df = spark.createDataFrame(rows, "conv_id string, concept_id string")
    got = {(r.concept_a, r.concept_b): (r.n_a, r.n_b, r.n_ab, r.lift_ppm)
           for r in concept_lift(df, min_pair=1).collect()}
    # n_convs=4; x:3 y:3 z:2; xy:2 xz:2 yz:1
    assert got[("x", "y")] == (3, 3, 2, (2 * 4 * PPM) // 9)
    assert got[("x", "z")] == (3, 2, 2, (2 * 4 * PPM) // 6)
    assert got[("y", "z")] == (3, 2, 1, (1 * 4 * PPM) // 6)
    # duplicate mentions inside one conv must not inflate support
    df2 = spark.createDataFrame(rows + [("c1", "x"), ("c1", "y")],
                                "conv_id string, concept_id string")
    got2 = {(r.concept_a, r.concept_b): r.n_ab
            for r in concept_lift(df2, min_pair=1).collect()}
    assert got2[("x", "y")] == 2


def test_bm25_hand_model(spark):
    docs = spark.createDataFrame(
        [(1, "join join scan"), (2, "join filter"), (3, "scan scan scan"),
         (4, "filter")],
        "doc_id long, text string")
    k1, b = 1.2, 0.75
    lens = {1: 3, 2: 2, 3: 3, 4: 1}
    avgdl = sum(lens.values()) / 4.0
    tf = {(1, "join"): 2, (2, "join"): 1, (2, "filter"): 1, (4, "filter"): 1}
    df_ = {"join": 2, "filter": 2}

    def term(doc, tok):
        idf = math.log(1.0 + (4.0 - df_[tok] + 0.5) / (df_[tok] + 0.5))
        t = tf[(doc, tok)]
        s = idf * (t * (k1 + 1.0)) / (
            t + k1 * (1.0 - b + b * lens[doc] / avgdl))
        return int(round(s * 1e6))

    want = {1: (term(1, "join"), 1), 2: (term(2, "join")
                                         + term(2, "filter"), 2),
            4: (term(4, "filter"), 1)}
    out = bm25_topk(docs, ["join", "filter"], k=10).collect()
    got = {r.doc_id: (r.score_ppm, r.n_terms) for r in out}
    assert got == want
    # result is sorted by score desc then doc_id
    scores = [(r.score_ppm, r.doc_id) for r in out]
    assert scores == sorted(scores, key=lambda p: (-p[0], p[1]))


def test_bigram_lm_cost_hand_model(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "c")],
        "doc_id long, text string")
    # bigrams: d1: ab ba ab ; d2: ab bc ; d3 none. V=3
    # c12: ab=3 ba=1 bc=1 ; c1: a=3 b=2 (wait: w1 counts from bigrams)
    c12 = {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    c1 = {"a": 3, "b": 2}
    V = 3.0

    def cost(w1, w2):
        return int(round(-math.log((c12[(w1, w2)] + 1.0)
                                   / (c1[w1] + V)) * 1e6))

    want = {
        1: (3, (cost("a", "b") * 2 + cost("b", "a")) // 3),
        2: (2, (cost("a", "b") + cost("b", "c")) // 2),
    }
    got = {r.doc_id: (r.n_bigrams, r.avg_cost_micro)
           for r in bigram_lm_cost(docs).collect()}
    assert got == want


def test_bigram_lm_partitioning_invariance(spark, tiny_pdf):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tiny_pdf["text"].head(60))],
        "doc_id long, text string")
    k = lambda df: sorted((r.doc_id, r.n_bigrams, r.avg_cost_micro)
                          for r in df.collect())
    assert k(bigram_lm_cost(docs)) == k(bigram_lm_cost(docs.repartition(7)))
