"""File-based DCAT catalog ingestion (sources/dcat.py) — the
reference's CKAN dataset/ module at the file level [K]: parse, the
two input shapes agree, and parsed datasets flow through the UNCHANGED
autotag pipeline (datasets get tagged like conversations)."""

import json

import pytest
from pyspark.sql import functions as F

from otd_semantic_framework_spark.sources.dcat import (
    FIXTURE_DCAT, dcat_to_corpus, read_dcat_catalog, read_dcat_jsonl)


@pytest.fixture(scope="module")
def catalog(spark):
    return read_dcat_jsonl(spark, FIXTURE_DCAT).cache()


def test_jsonl_parse(catalog):
    rows = {r.dataset_id: r for r in catalog.collect()}
    assert len(rows) == 8
    ds1 = rows["ds-001"]
    assert ds1.title == "Bus timetable feed"
    assert ds1.keywords == ["bus", "real-time", "timetable"]  # sorted
    assert ds1.publisher == "Metro Transit Authority"
    assert ds1.formats == ["GTFS", "JSON"]
    assert ds1.n_distributions == 2
    assert ds1.issued is not None
    # empty distribution list -> empty formats, zero count (not NULL)
    assert rows["ds-004"].formats == [] and rows["ds-004"].n_distributions == 0


def test_catalog_document_equals_jsonl(spark, catalog, tmp_path):
    """The wholetext catalog-document path ({"dataset": [...]}) must
    parse identically to the line-parallel JSONL path."""
    docs = [json.loads(line) for line in open(FIXTURE_DCAT)]
    doc_path = tmp_path / "catalog.json"
    doc_path.write_text(json.dumps({"dataset": docs}))
    a = sorted(map(tuple, catalog.collect()))
    b = sorted(map(tuple, read_dcat_catalog(spark, str(doc_path)).collect()))
    assert a == b


def test_dcat_to_corpus_shape(spark, catalog):
    corpus = dcat_to_corpus(catalog)
    rows = {r.conv_id: r for r in corpus.collect()}
    assert len(rows) == 8
    r = rows["dataset:ds-001"]
    assert r.turn_idx == 0 and r.role == "doc" and r.tool is None
    assert "bus timetable" in r.text and r.text == r.text.lower()


def test_dcat_tagging_end_to_end(spark, catalog, tmp_path):
    """Datasets through the full autotag pipeline with the transport
    ontology: every dataset mentioning a gazetteer surface must get
    'mentions' triples, i.e. the reference's dataset-tagging lifecycle
    (CKAN fetch → tag) works from a DCAT file."""
    from otd_semantic_framework_spark.plans.pipeline import run_pipeline
    corpus = dcat_to_corpus(catalog)
    res = run_pipeline(spark, corpus, str(tmp_path / "dcat_run"))
    triples = res.triples.filter(F.col("pred") == "mentions")
    tagged = {r.subj for r in triples.select(
        F.col("subj")).distinct().collect()}
    # 'bus', 'ferry', 'tram', 'parking', 'train', 'airport' are all
    # ontology labels; every fixture dataset mentions at least one
    assert "turn:dataset:ds-001:0" in tagged
    assert len(tagged) >= 6
    # and CDS propagates dataset tags like conversation tags
    assert res.cds.filter(
        F.col("subj_key") == "conv:dataset:ds-001").count() > 0


def test_dcat_dataset_search_end_to_end(spark, catalog, tmp_path):
    """The reference's PRIMARY user journey, datasets edition: catalog
    -> autotag -> free-text ontology search returns the matching
    dataset ranked first (ontosearch's 'find datasets about X' [K])."""
    from otd_semantic_framework_spark.plans.pipeline import run_pipeline
    from otd_semantic_framework_spark.plans.search import search
    from otd_semantic_framework_spark.sources.fixtures import (
        ontology_pandas)
    corpus = dcat_to_corpus(catalog)
    res = run_pipeline(spark, corpus, str(tmp_path / "dcat_search_run"))
    hits = search("bus timetable for the metro", res.cds,
                  ontology_pandas(), top_n=5).collect()
    assert hits, "search returned nothing over the tagged catalog"
    assert hits[0].rank == 1
    # ds-001 is the bus-timetable dataset; it must rank top and match
    # through the bus concept (otd:C100)
    assert hits[0].subj_key == "conv:dataset:ds-001"
    assert "otd:C100" in hits[0].matched_concepts
