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


def test_stratified_sample_prune_equals_unpruned(spark):
    """The map-side hash-threshold pre-prune (VERDICT r2 #4) must be
    invisible in the result: prune on/off are hash-identical, for
    quotas around and above the pruning threshold and with a hot
    (skewed) stratum."""
    rows = [(i, f"text body {i} {'hot' if i % 10 else 'rare'}",
             "hot" if i % 10 else "rare", 20) for i in range(500)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long")
    for k in (1, 3, 17, 450):
        on = sorted(map(tuple, stratified_sample(
            docs, "lang", k=k, prune=True).collect()))
        off = sorted(map(tuple, stratified_sample(
            docs, "lang", k=k, prune=False).collect()))
        assert on == off, f"prune changed the sample at k={k}"


def test_stratified_sample_prune_tight_bound_widens(spark):
    """Even a deliberately-undersized initial bound must converge to
    the exact unpruned sample via the verify-and-widen loop."""
    rows = [(i, f"doc {i}", "only", 6) for i in range(200)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long")
    on = sorted(map(tuple, stratified_sample(
        docs, "lang", k=50, prune=True, prune_factor=0.2).collect()))
    off = sorted(map(tuple, stratified_sample(
        docs, "lang", k=50, prune=False).collect()))
    assert on == off


def test_stratified_sample_prune_filter_precedes_window(spark):
    """Plan assertion: the pruning filter must sit BELOW the window
    (applied map-side before the per-stratum shuffle), otherwise the
    hot-stratum funnel it exists to prevent is still there."""
    rows = [(i, f"d{i}", "en", 2) for i in range(100)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long")
    plan = stratified_sample(docs, "lang", k=2,
                             prune=True)._jdf.queryExecution() \
        .executedPlan().toString()
    win = plan.find("Window")
    filt = max(plan.find("Filter", win), plan.find("Filter"))
    # physical plans print top-down: the prune Filter must appear BELOW
    # (= after in the string) the Window operator
    assert win != -1 and filt != -1 and filt > win, plan


def test_stratified_sample_null_text_portable_key(spark):
    """ADVICE r2: NULL text must not degrade the rank key. The Spark key
    coalesces text to '' — verify the sample equals a SQL replay that
    uses `|| coalesce(text,'')` (the oracle form), NULL rows included."""
    rows = [(0, "alpha", "en", 5), (1, None, "en", 0), (2, "beta", "en", 4),
            (3, None, "en", 0), (4, "gamma", "en", 5)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long")
    docs.createOrReplaceTempView("null_docs")
    got = sorted(map(tuple, stratified_sample(
        docs, "lang", k=3, prune=False).collect()))
    want = sorted(map(tuple, spark.sql("""
        SELECT doc_id, lang AS stratum, rk FROM (
          SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
              ORDER BY md5(cast(doc_id AS STRING) || ':' ||
                          coalesce(text, '')), doc_id) AS rk
          FROM null_docs) WHERE rk <= 3""").collect()))
    assert got == want


def test_keep_best_tie_drops_larger_id(spark):
    docs = spark.createDataFrame(
        [(7, "aaa", 3), (9, "bbb", 3)],
        "doc_id long, text string, n_chars long")
    pairs = spark.createDataFrame([(7, 9)], "doc_a long, doc_b long")
    got = {r.doc_id: r.status for r in keep_best(docs, pairs).collect()}
    assert got == {7: "keep", 9: "drop_near"}


def test_bounds_mechanisms_bit_identical(spark):
    """VERDICT r3 item 5: the driver-literal and broadcast-join bounds
    mechanisms must select the IDENTICAL sample — stratified and
    mixture, pruned both ways."""
    from otd_semantic_framework_spark.operators.curation import (
        mixture_sample, stratified_sample)
    rows = [(i, f"doc text {i % 97}", f"s{i % 23}") for i in range(3000)]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")

    lit_s = sorted(map(tuple, stratified_sample(
        d, "source", 7, bounds_mechanism="literal").collect()))
    join_s = sorted(map(tuple, stratified_sample(
        d, "source", 7, bounds_mechanism="join").collect()))
    assert lit_s == join_s and len(lit_s) == 23 * 7

    lit_m = sorted(map(tuple, mixture_sample(
        d, "source", 200, bounds_mechanism="literal").collect()))
    join_m = sorted(map(tuple, mixture_sample(
        d, "source", 200, bounds_mechanism="join").collect()))
    assert lit_m == join_m and len(lit_m) > 0


def test_stratified_sample_50k_strata_no_plan_literal(spark):
    """Above STRATA_LITERAL_MAX strata, auto must take the join path:
    completes with no create_map literal in the plan and exact
    per-stratum quotas."""
    from otd_semantic_framework_spark.operators.curation import (
        STRATA_LITERAL_MAX, stratified_sample)
    n_strata = 50_000
    assert n_strata > STRATA_LITERAL_MAX
    d = (spark.range(100_000)
         .select(F.col("id").alias("doc_id"),
                 F.concat(F.lit("t"), F.col("id")).alias("text"),
                 F.concat(F.lit("h"), (F.col("id") % n_strata))
                 .alias("source")))
    out = stratified_sample(d, "source", 1)
    assert "map_from" not in out._jdf.queryExecution().optimizedPlan() \
        .toString().lower()
    assert out.count() == n_strata
    assert out.filter(F.col("rk") > 1).count() == 0


def test_join_mechanism_tight_bound_widens(spark):
    """The broadcast-join bounds path must converge through the same
    verify-and-widen loop as the literal path — an undersized initial
    bound still yields the exact unpruned sample."""
    from otd_semantic_framework_spark.operators.curation import (
        stratified_sample)
    rows = [(i, f"doc {i}", "only", 6) for i in range(200)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long")
    on = sorted(map(tuple, stratified_sample(
        docs, "lang", k=50, prune=True, prune_factor=0.2,
        bounds_mechanism="join").collect()))
    off = sorted(map(tuple, stratified_sample(
        docs, "lang", k=50, prune=False).collect()))
    assert on == off
