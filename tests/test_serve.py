"""HTTP front door (serve.py) over a real loopback socket.

The reference's Flask search endpoint + dataset_tagger web lifecycle
[K], served by the stdlib ThreadingHTTPServer twin: search parity with
the engine call, POST-validated curated tagging, and the two-step
tag → refresh → re-search flow end-to-end."""

import json
import threading
import urllib.error
import urllib.request

import pytest

from otd_semantic_framework_spark.plans.pipeline import run_pipeline
from otd_semantic_framework_spark.plans.search import search as engine_search
from otd_semantic_framework_spark.serve import make_server
from otd_semantic_framework_spark.sources.fixtures import ontology_pandas


@pytest.fixture(scope="module")
def server(spark, tiny_df, tmp_path_factory):
    run_dir = str(tmp_path_factory.mktemp("serve_run"))
    run_pipeline(spark, tiny_df, run_dir)
    httpd, svc = make_server(spark, run_dir, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", svc
    httpd.shutdown()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


def test_health_and_concepts(server):
    base, _ = server
    code, body = _get(base, "/health")
    assert code == 200 and body["status"] == "ok" and body["cds_rows"] > 0
    assert body["taxonomic"] is True  # run_pipeline wrote the wup table
    code, concepts = _get(base, "/api/v1/concepts")
    assert code == 200 and len(concepts) == len(ontology_pandas())
    assert {"concept_id", "pref_label"} <= set(concepts[0])


def test_search_parity_with_engine(server, spark):
    """The HTTP payload is the engine result verbatim — same subjects,
    ranks, and scores as calling plans/search.py directly."""
    base, svc = server
    q = "bus timetable delay"
    code, body = _get(base, "/api/v1/search?q=bus+timetable+delay&top_n=5")
    assert code == 200 and body["query"] == q
    direct = [r.asDict() for r in engine_search(
        q, svc.cds, svc.ontology_pdf, top_n=5).collect()]
    assert body["results"] == json.loads(json.dumps(direct, default=str))
    assert [r["rank"] for r in body["results"]] == list(
        range(1, len(direct) + 1))

    # taxonomic=1 engages the WuP blend; payload differs from the pure
    # cosine ranking on at least the scores when a blend applies
    code, tx = _get(base,
                    "/api/v1/search?q=bus+timetable+delay&top_n=5&taxonomic=1")
    assert code == 200 and len(tx["results"]) == len(body["results"])


def test_search_errors(server):
    base, _ = server
    for path, want in [("/api/v1/search", 400),          # missing q
                       ("/api/v1/nope", 404)]:
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(base, path)
        assert e.value.code == want


def test_tag_refresh_search_lifecycle(server):
    """dataset_tagger flow: POST a curated tag for a synthetic subject,
    refresh the CDS, and see the subject surface for that concept's
    query — plus POST-time rejection of an unknown concept (the P19
    validation the reference does in its tagging UI)."""
    base, svc = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/api/v1/tag",
              {"subj_key": "conv:http-demo", "concept_id": "bogus:nope"})
    assert e.value.code == 400

    # pick a concept whose pref_label self-matches as one whole mention
    # (the root's label contains other labels as substrings, so querying
    # it would score a DIFFERENT concept — correct engine behavior)
    from otd_semantic_framework_spark import semantics as S
    onto = ontology_pandas()
    gaz = {S.normalize_text(x): x for x in onto["pref_label"]}
    concept = next(
        c for _, c in onto.iterrows()
        if [m[0] for m in S.find_mentions(
            S.normalize_text(c["pref_label"]), gaz)]
        == [S.normalize_text(c["pref_label"])])
    code, body = _post(base, "/api/v1/tag",
                       {"subj_key": "conv:http-demo",
                        "concept_id": concept["concept_id"],
                        "weight": 0.95})
    assert code == 200 and body["stored"] == 1

    before = svc.cds_rows
    code, body = _post(base, "/api/v1/refresh", {})
    assert code == 200
    assert body["manual_valid"] == 1 and body["manual_rejected"] == 0
    assert body["cds_rows"] >= before  # manual tag adds subject rows

    code, hits = _get(
        base, "/api/v1/search?q=" +
        urllib.request.quote(concept["pref_label"]) + "&top_n=50")
    assert code == 200
    assert "conv:http-demo" in {r["subj_key"] for r in hits["results"]}
