"""Round-3 additions: Gopher repetition metrics, ExactSubstr-lite span
coverage, temperature-scaled domain-mixture sampling."""

import math

import pytest
from pyspark.sql import functions as F

from otd_semantic_framework_spark.operators.curation import mixture_sample
from otd_semantic_framework_spark.operators.dedup import (
    repeated_span_coverage)
from otd_semantic_framework_spark.operators.textstats import repetition_stats


def test_repetition_stats_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x y z w"), (3, "q q q q q q")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_stats(docs).collect()}
    # doc 1: 5 toks, 2 uniq; bigrams {'a b':2,'b a':2} top 2/4;
    # trigrams {'a b a':2,'b a b':1} dup 2/3
    r = out[1]
    assert r.n_tokens == 5
    assert r.uniq_token_frac == pytest.approx(0.4, abs=1e-9)
    assert r.top_bigram_frac == pytest.approx(0.5, abs=1e-9)
    assert r.dup_trigram_frac == pytest.approx(round(2 / 3, 6), abs=1e-9)
    # doc 2: all unique, no repeats
    r = out[2]
    assert r.uniq_token_frac == 1.0
    assert r.top_bigram_frac == pytest.approx(round(1 / 3, 6), abs=1e-9)
    assert r.dup_trigram_frac == 0.0
    # doc 3: total repetition
    r = out[3]
    assert r.uniq_token_frac == pytest.approx(round(1 / 6, 6), abs=1e-9)
    assert r.top_bigram_frac == 1.0
    assert r.dup_trigram_frac == 1.0


def test_repetition_stats_short_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, None), (4, "two toks")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert set(out) == {1, 4}          # zero-token docs are absent
    assert out[1].n_tokens == 1
    assert out[1].top_bigram_frac is None     # no bigrams
    assert out[4].dup_trigram_frac is None    # no trigrams


def test_span_coverage_cross_doc(spark):
    docs = spark.createDataFrame(
        [(1, "x y z"), (2, "x y w"), (3, "p q r")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in repeated_span_coverage(docs, n=2).collect()}
    # 'x y' occurs in docs 1 and 2; doc 3 shares nothing -> absent
    assert set(out) == {1, 2}
    for d in (1, 2):
        assert out[d].n_repeated_spans == 1
        assert out[d].covered_tokens == 2
        assert out[d].coverage_frac == pytest.approx(
            round(2 / 3, 6), abs=1e-9)


def test_span_coverage_overlap_merge(spark):
    # within-doc repeats count; overlapping spans must not double-count
    docs = spark.createDataFrame(
        [(1, "a a a a")], "doc_id long, text string")
    out = repeated_span_coverage(docs, n=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_repeated_spans == 3      # starts 1,2,3
    assert r.covered_tokens == 4        # merged, not 6
    assert r.coverage_frac == 1.0


def test_mixture_sample_exact_quota_math(spark):
    rows = [(i, f"txt {i}", "big" if i < 90 else "small")
            for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    target, scale = 20, 1_000_000
    out = mixture_sample(docs, "lang", target=target, weight_scale=scale)
    got = {r.domain: r.quota for r in out.select("domain", "quota")
           .distinct().collect()}
    w_big = math.floor(math.sqrt(90.0) * scale)
    w_small = math.floor(math.sqrt(10.0) * scale)
    W = w_big + w_small
    assert got == {"big": (target * w_big) // W,
                   "small": (target * w_small) // W}
    # sqrt smoothing up-weights the small domain vs its 10% raw share
    assert got["small"] > 0.1 * sum(got.values()) - 1
    per = {r.domain: r.cnt for r in
           out.groupBy("domain").agg(F.count("*").alias("cnt")).collect()}
    assert per == {d: q for d, q in got.items()}


def test_mixture_sample_prune_invariance(spark):
    rows = [(i, f"doc body {i % 13} {i}", f"d{i % 3}") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    a = sorted(map(tuple, mixture_sample(
        docs, "lang", target=30, prune=False).collect()))
    b = sorted(map(tuple, mixture_sample(
        docs, "lang", target=30, prune=True, prune_factor=1.5).collect()))
    assert a == b and len(a) > 0
