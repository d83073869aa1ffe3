"""P17 search path unit tests."""

import pytest

from otd_semantic_framework_spark.plans.pipeline import run_pipeline
from otd_semantic_framework_spark.plans.search import search


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


def _wup_pdf(ontology_pdf):
    import pandas as pd

    from otd_semantic_framework_spark import semantics as S
    concepts = [
        S.Concept(r.concept_id, r.pref_label, list(r.alt_labels),
                  r.parent_id, int(r.depth), list(r.path))
        for r in ontology_pdf.itertuples()]
    return pd.DataFrame(
        [(a.concept_id, b.concept_id, S.wup_similarity(a, b))
         for a in concepts for b in concepts],
        columns=["concept_a", "concept_b", "wup"])


def test_search_wup_blend(spark, cds, ontology_pdf):
    """Taxonomic blend on the query side: well-formed ranking, and
    α=1.0 degenerates to the pure-cosine scoring exactly."""
    wup = _wup_pdf(ontology_pdf)
    q = "bus timetable near the station"
    rows = search(q, cds, ontology_pdf, top_n=5, wup_pdf=wup).collect()
    assert 0 < len(rows) <= 5
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    pure = [(r.subj_key, r.rank, r.search_score)
            for r in search(q, cds, ontology_pdf, top_n=5).collect()]
    degen = [(r.subj_key, r.rank, r.search_score)
             for r in search(q, cds, ontology_pdf, top_n=5,
                             wup_pdf=wup, alpha=1.0).collect()]
    assert pure == degen
