"""P8 regression test named by BASELINE.json north_star ("its
concept-similarity ... regression tests"): Spark all-pairs Wu-Palmer
table == pure-pandas oracle matrix, atol 1e-9."""

from otd_semantic_framework_spark import semantics as S
from otd_semantic_framework_spark.operators.wup import concept_similarity
from otd_semantic_framework_spark.sources.fixtures import ontology_spark
from tests.oracle_tagger import oracle_concept_similarity


def test_spark_wup_matches_oracle(spark):
    got = {(r.concept_a, r.concept_b): r.wup
           for r in concept_similarity(ontology_spark(spark)).collect()}
    want = {(r.concept_a, r.concept_b): r.wup
            for r in oracle_concept_similarity(S.build_ontology()).itertuples()}
    assert set(got) == set(want)
    assert len(got) == 69 * 69
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, k


def test_wup_symmetry_and_diagonal(spark):
    rows = concept_similarity(ontology_spark(spark)).collect()
    m = {(r.concept_a, r.concept_b): r.wup for r in rows}
    for (a, b), v in m.items():
        assert abs(m[(b, a)] - v) < 1e-12
        if a == b:
            assert v == 1.0
        assert 0.0 < v <= 1.0
