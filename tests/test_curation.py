"""Corpus-curation operators: TF-IDF, stratified sampling, keep-best."""

import math

import pytest
from pyspark.sql import functions as F

from otd_semantic_framework_spark.operators.curation import (
    keep_best, stratified_sample, tfidf_top_terms)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "spark spark spark engine", "en", 24),
        (1, "engine room", "en", 11),
        (2, "spark spark spark engine", "en", 24),   # exact dup of 0
        (3, "unique words here", "de", 17),
        (4, "room here", "de", 9),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long").cache()


def test_tfidf_exact_values(spark, corpus):
    out = {(r.doc_id, r.tok): r.tfidf
           for r in tfidf_top_terms(corpus, k=2).collect()}
    # doc 1: 'room' tf=1/2, df=2 (docs 1,4), N=5 → 0.5*ln(2.5)
    assert out[(1, "room")] == pytest.approx(
        round(0.5 * math.log(5 / 2), 6), abs=1e-9)
    # 'spark' in doc 0: tf=3/4, df=2 (docs 0,2)
    assert out[(0, "spark")] == pytest.approx(
        round(0.75 * math.log(5 / 2), 6), abs=1e-9)


def test_tfidf_topk_and_rank(spark, corpus):
    out = tfidf_top_terms(corpus, k=1)
    assert out.count() == 5
    assert {r.rk for r in out.collect()} == {1}


def test_stratified_sample_quota_and_determinism(spark, corpus):
    s1 = sorted(map(tuple, stratified_sample(corpus, "lang", k=1).collect()))
    s2 = sorted(map(tuple, stratified_sample(corpus, "lang", k=1).collect()))
    assert s1 == s2  # seedless determinism
    assert len(s1) == 2  # one per stratum
    assert {row[1] for row in s1} == {"en", "de"}
    # quota larger than a stratum returns the whole stratum, ranked
    s3 = stratified_sample(corpus, "lang", k=10)
    assert s3.filter(F.col("stratum") == "de").count() == 2


def test_keep_best_decisions(spark, corpus):
    pairs = spark.createDataFrame(
        [(1, 4)], "doc_a long, doc_b long")  # near-dup: doc 4 is shorter
    got = {r.doc_id: r.status
           for r in keep_best(corpus, pairs).collect()}
    assert got == {0: "keep", 1: "keep", 2: "drop_exact",
                   3: "keep", 4: "drop_near"}


def test_curation_partitioning_invariance(spark, corpus):
    """Results must not depend on physical input partitioning — the
    Spark-specific correctness property a 1000-executor run relies on."""
    shuffled = corpus.repartition(7)
    for op in (lambda d: tfidf_top_terms(d, k=2),
               lambda d: stratified_sample(d, "lang", k=2),
               lambda d: keep_best(
                   d, d.sparkSession.createDataFrame(
                       [(1, 4)], "doc_a long, doc_b long"))):
        a = sorted(map(tuple, op(corpus).collect()))
        b = sorted(map(tuple, op(shuffled).collect()))
        assert a == b


def test_merge_tag_sources_idempotent_and_commutative(spark):
    from otd_semantic_framework_spark.operators.manual import (
        merge_tag_sources)
    x = spark.createDataFrame(
        [("conv:1", "c:a", 0.7), ("conv:2", "c:b", 0.9)],
        "subj_key string, concept_id string, tag_score double")
    y = spark.createDataFrame(
        [("conv:1", "c:a", 0.8)],
        "subj_key string, concept_id string, tag_score double")
    xy = sorted(map(tuple, merge_tag_sources(x, y).collect()))
    yx = sorted(map(tuple, merge_tag_sources(y, x).collect()))
    # scores commute; provenance labels swap roles ('auto'<->'manual')
    assert [(s, c, t) for s, c, t, _ in xy] == [(s, c, t) for s, c, t, _ in yx]
    # merging a table with itself under one label keeps set semantics
    again = merge_tag_sources(x, x.withColumnRenamed("tag_score", "tag_score"))
    assert sorted((r.subj_key, r.concept_id, r.tag_score)
                  for r in again.collect()) == sorted(
        (r.subj_key, r.concept_id, r.tag_score) for r in x.collect())


def test_keep_best_tie_drops_larger_id(spark):
    docs = spark.createDataFrame(
        [(7, "aaa", 3), (9, "bbb", 3)],
        "doc_id long, text string, n_chars long")
    pairs = spark.createDataFrame([(7, 9)], "doc_a long, doc_b long")
    got = {r.doc_id: r.status for r in keep_best(docs, pairs).collect()}
    assert got == {7: "keep", 9: "drop_near"}
