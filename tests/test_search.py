"""P17 search path unit tests."""

import pytest

from otd_semantic_framework_spark.plans.pipeline import run_pipeline
from otd_semantic_framework_spark.plans.search import search
from otd_semantic_framework_spark.sources.fixtures import ontology_pandas


@pytest.fixture(scope="module")
def cds(spark, tiny_df, tmp_path_factory):
    return run_pipeline(spark, tiny_df,
                        str(tmp_path_factory.mktemp("search_run"))).cds.cache()


def test_search_ranking(spark, cds, ontology_pdf):
    hits = search("bus timetable near the station", cds, ontology_pdf, top_n=5)
    rows = hits.collect()
    assert 0 < len(rows) <= 5
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.search_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.matched_concepts for r in rows)


def test_search_deterministic(spark, cds, ontology_pdf):
    a = [(r.subj_key, r.rank) for r in
         search("delay on the metro line", cds, ontology_pdf).collect()]
    b = [(r.subj_key, r.rank) for r in
         search("delay on the metro line", cds, ontology_pdf).collect()]
    assert a == b


def test_search_no_match(spark, cds, ontology_pdf):
    assert search("qqq zzz xyzzy", cds, ontology_pdf).count() == 0
