"""The autotag regression test named by BASELINE.json north_star: the
full Spark pipeline's emitted triples vs the pinned mini-oracle tagger
output. Gate: precision >= 0.95 AND recall >= 0.95 (we expect exact
match; the gate is the acceptance bar)."""

import pytest

from otd_semantic_framework_spark.operators.evaluate import precision_recall
from otd_semantic_framework_spark.plans.pipeline import run_pipeline
from tests.oracle_tagger import oracle_cds, oracle_triples


@pytest.fixture(scope="module")
def pipeline_result(spark, tiny_df, tmp_path_factory):
    run_dir = str(tmp_path_factory.mktemp("run"))
    return run_pipeline(spark, tiny_df, run_dir)


@pytest.fixture(scope="module")
def golden(tiny_pdf):
    return oracle_triples(tiny_pdf)


def test_autotag_precision_recall(spark, pipeline_result, golden):
    golden_df = spark.createDataFrame(golden)
    pr = precision_recall(pipeline_result.triples, golden_df)
    assert pr["precision"] >= 0.95, pr
    assert pr["recall"] >= 0.95, pr


def test_autotag_exact_match(spark, pipeline_result, golden):
    got = sorted(
        (r.subj, r.pred, r.obj, r.conv_id, r.turn_idx, round(r.score, 6))
        for r in pipeline_result.triples.collect())
    want = sorted(
        (r.subj, r.pred, r.obj, r.conv_id, r.turn_idx, round(r.score, 6))
        for r in golden.itertuples())
    assert got == want


def test_triples_all_preds_present(pipeline_result):
    preds = {r.pred for r in pipeline_result.triples.select("pred").distinct().collect()}
    assert preds == {"mentions", "uses_tool", "replies_to"}


def test_cds_matches_oracle(spark, pipeline_result, golden):
    want = {(r.subj_key, r.concept_id): round(r.score, 6)
            for r in oracle_cds(golden).itertuples()}
    got = {(r.subj_key, r.concept_id): round(r.score, 6)
           for r in pipeline_result.cds.collect()}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, k


def test_fast_path_equals_checkpointed(spark, tiny_df, pipeline_result):
    from otd_semantic_framework_spark.plans.pipeline import build_triples_fast
    fast = build_triples_fast(spark, tiny_df)
    k1 = sorted((r.subj, r.pred, r.obj, round(r.score, 6))
                for r in fast.collect())
    k2 = sorted((r.subj, r.pred, r.obj, round(r.score, 6))
                for r in pipeline_result.triples.collect())
    assert k1 == k2


def test_autotag_small_corpus_pr_gate(spark, small_df, small_pdf, tmp_path_factory):
    """The BASELINE P/R gate on the larger 'small' corpus (300 convs,
    SURVEY.md §5.3) — fast path vs mini-oracle goldens."""
    from otd_semantic_framework_spark.plans.pipeline import build_triples_fast
    got = spark.createDataFrame(
        build_triples_fast(spark, small_df)
        .select("subj", "pred", "obj").collect(), "subj string, pred string, obj string")
    golden = spark.createDataFrame(oracle_triples(small_pdf))
    pr = precision_recall(got, golden)
    assert pr["precision"] >= 0.95, pr
    assert pr["recall"] >= 0.95, pr
