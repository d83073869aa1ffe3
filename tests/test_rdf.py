"""Spark-native RDF ingestion (sources/rdf.py): Turtle-subset and
N-Triples parsing, SKOS lift, and end-to-end into the Wu-Palmer matrix
— the reference's ontology input path (rdflib .ttl load [K]) without
rdflib or any driver-side parser."""

import pytest
from pyspark.sql import functions as F

from otd_semantic_framework_spark.operators.wup import concept_similarity
from otd_semantic_framework_spark.sources.rdf import (
    FIXTURE_TTL, ontology_table_from_turtle, parse_ntriples, parse_turtle,
    skos_concepts, SKOS)


@pytest.fixture(scope="module")
def triples(spark):
    return parse_turtle(spark, FIXTURE_TTL).cache()


@pytest.fixture(scope="module")
def concepts(spark, triples):
    return skos_concepts(triples).cache()


def test_turtle_parse_shapes(triples):
    rows = triples.collect()
    # every subject/pred fully expanded to IRIs
    assert all(r.subj.startswith("http://") for r in rows)
    assert all(r.pred.startswith("http://") for r in rows)
    # `a` expanded to rdf:type
    types = [r for r in rows if r.pred.endswith("#type")]
    assert len(types) == 15
    assert all(r.obj == SKOS + "Concept" for r in types)
    # object lists split: water has two altLabels from one line
    water_alts = sorted(r.obj for r in rows
                        if r.subj.endswith("/water") and
                        r.pred == SKOS + "altLabel")
    assert water_alts == ["maritime transport", "sea transport"]
    # lang tags stripped into their own column
    pref = [r for r in rows if r.pred == SKOS + "prefLabel"]
    assert all(r.lang == "en" and r.is_literal for r in pref)
    # untagged literals get NULL lang, not ''
    assert {r.lang for r in rows
            if r.subj.endswith("/water")
            and r.pred == SKOS + "altLabel"} == {None}


def test_skos_concepts_depth_and_path(concepts):
    by_id = {r.concept_id.rsplit("/", 1)[1]: r for r in concepts.collect()}
    assert len(by_id) == 15
    assert by_id["root"].depth == 1 and by_id["root"].parent_id is None
    assert by_id["road"].depth == 2
    assert by_id["bus"].depth == 3
    assert by_id["nightbus"].depth == 4
    assert [p.rsplit("/", 1)[1] for p in by_id["nightbus"].path] == [
        "root", "road", "bus", "nightbus"]
    assert by_id["bus"].alt_labels == ["coach", "omnibus"]  # sorted
    # <full-IRI> subject round-trips identically to prefixed ones
    assert by_id["airport"].parent_id.endswith("/root")


def test_turtle_to_wup_matrix_end_to_end(spark, concepts):
    """Fixture .ttl all the way into kg_wup_matrix (P8): values must
    obey the Wu-Palmer formula on the parsed tree."""
    wup = {(a.rsplit("/", 1)[1], b.rsplit("/", 1)[1]): v
           for a, b, v in concept_similarity(
               concepts.select("concept_id", "depth", "path")).collect()}
    assert len(wup) == 15 * 15
    assert wup[("root", "root")] == pytest.approx(1.0)
    assert wup[("bus", "bus")] == pytest.approx(1.0)
    # siblings bus/bicycle: lcs=road depth2, depths 3,3 -> 2*2/6
    assert wup[("bus", "bicycle")] == pytest.approx(2 * 2 / 6)
    # bus(3) vs nightbus(4): lcs=bus depth3 -> 2*3/7
    assert wup[("bus", "nightbus")] == pytest.approx(6 / 7)
    # cross-branch leaves: lcs=root -> 2*1/(3+3)
    assert wup[("bus", "ferry")] == pytest.approx(2 / 6)
    # symmetric
    assert wup[("ferry", "bus")] == wup[("bus", "ferry")]


def test_ontology_table_schema_and_pipeline_compat(spark):
    from otd_semantic_framework_spark.schemas import ONTOLOGY_CONCEPTS
    tbl = ontology_table_from_turtle(spark, FIXTURE_TTL)
    assert tbl.schema == ONTOLOGY_CONCEPTS
    emb = tbl.select(F.size("embedding").alias("d")).distinct().collect()
    assert [r.d for r in emb] == [64]


def test_ntriples_roundtrip(spark, triples, tmp_path):
    """Serialize parsed triples as N-Triples, re-parse with the
    line-parallel scale path, get the identical triple set."""
    nt = tmp_path / "out.nt"
    with open(nt, "w") as fh:
        for r in triples.collect():
            obj = (f'"{r.obj}"' + (f"@{r.lang}" if r.lang else "")
                   ) if r.is_literal else f"<{r.obj}>"
            fh.write(f"<{r.subj}> <{r.pred}> {obj} .\n")
    back = parse_ntriples(spark, str(nt))
    a = sorted(map(tuple, triples.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
    # genuinely line-parallel: no single-partition window in the plan
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_skos_concepts_raises_on_dangling_parent(spark):
    t = spark.createDataFrame(
        [("c:a", SKOS + "prefLabel", "a", True, None),
         ("c:a", SKOS + "broader", "c:GONE", False, None)],
        "subj string, pred string, obj string, is_literal boolean, lang string")
    with pytest.raises(RuntimeError, match="unreachable"):
        skos_concepts(t)


def test_skos_concepts_raises_on_cycle(spark):
    t = spark.createDataFrame(
        [("c:a", SKOS + "prefLabel", "a", True, None),
         ("c:b", SKOS + "prefLabel", "b", True, None),
         ("c:a", SKOS + "broader", "c:b", False, None),
         ("c:b", SKOS + "broader", "c:a", False, None)],
        "subj string, pred string, obj string, is_literal boolean, lang string")
    with pytest.raises(RuntimeError, match="unreachable"):
        skos_concepts(t)


def test_ntriples_export_roundtrip(spark, tmp_path):
    """KG triples → write_ntriples → parse_ntriples: the graph export
    is a faithful N-Triples serialization (engine ids IRI-encoded under
    the base namespace, literals escaped)."""
    from otd_semantic_framework_spark.sources.rdf import (
        format_ntriples, parse_ntriples, write_ntriples)
    triples = spark.createDataFrame(
        [("turn:conv-0001:3", "mentions", "otd:C101"),
         ("turn:conv-0001:3", "uses_tool", "tool:tool4"),
         ("turn:conv-0002:0", "note", 'plain "quoted" text')],
        "subj string, pred string, obj string")
    lines = [r.line for r in format_ntriples(triples).collect()]
    assert all(l.endswith(" .") for l in lines)
    assert any('"plain \\"quoted\\" text"' in l for l in lines)
    out = str(tmp_path / "kg_nt")
    write_ntriples(triples, out)
    back = parse_ntriples(spark, out)
    rows = {(r.subj, r.pred, r.obj, r.is_literal) for r in back.collect()}
    base = "http://example.org/kg/"
    assert (f"{base}turn%3Aconv-0001%3A3", f"{base}mentions",
            f"{base}otd%3AC101", False) in rows
    assert (f"{base}turn%3Aconv-0002%3A0", f"{base}note",
            'plain "quoted" text', True) in rows
    assert len(rows) == 3


def test_ontology_diff_statuses(spark):
    from otd_semantic_framework_spark.sources.rdf import ontology_diff
    cols = "concept_id string, pref_label string, parent_id string"
    v1 = spark.createDataFrame([
        ("o:r", "root", None), ("o:a", "alpha", "o:r"),
        ("o:b", "beta", "o:r"), ("o:c", "gamma", "o:a"),
        ("o:d", "delta", "o:a")], cols)
    v2 = spark.createDataFrame([
        ("o:r", "root", None), ("o:a", "alpha prime", "o:r"),
        ("o:c", "gamma", "o:b"), ("o:d", "delta two", "o:b"),
        ("o:e", "epsilon", "o:b")], cols)
    d = {r.concept_id: r.status for r in ontology_diff(v1, v2).collect()}
    assert d == {"o:a": "relabeled", "o:b": "removed", "o:c": "moved",
                 "o:d": "relabeled+moved", "o:e": "added"}
    # unchanged concepts (o:r, null-parent root included) emit nothing
    assert "o:r" not in d
    # self-diff is empty
    assert ontology_diff(v1, v1).count() == 0
