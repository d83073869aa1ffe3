"""SPARQL CONSTRUCT materialization + SHACL-lite graph validation
(operators/graph.py construct_triples / validate_graph)."""

from __future__ import annotations

import pytest

from otd_semantic_framework_spark.operators.graph import (
    construct_triples, validate_graph)

_SCHEMA = ("subj string, pred string, obj string, conv_id string, "
           "turn_idx int, score double")


def _g(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _t(s, p, o, score=1.0):
    return (s, p, o, "c", 0, score)


def test_construct_derives_continues_topic(spark):
    g = _g(spark, [
        _t("turn:c:1", "mentions", "concept:a", 0.9),
        _t("turn:c:1", "replies_to", "turn:c:0"),
        _t("turn:c:0", "mentions", "concept:a", 0.8),
        _t("turn:c:2", "mentions", "concept:b", 0.7),   # different concept
        _t("turn:c:2", "replies_to", "turn:c:1"),
    ])
    out = construct_triples(
        g,
        [("?t", "mentions", "?c"),
         ("?t", "replies_to", "?u"),
         ("?u", "mentions", "?c")],
        ("?t", "continues_topic", "?c"))
    rows = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert rows == {("turn:c:1", "continues_topic", "concept:a")}


def test_construct_distinct_and_unbound_var_raises(spark):
    g = _g(spark, [
        _t("turn:c:1", "mentions", "concept:a", 0.9),
        _t("turn:c:1", "mentions", "concept:b", 0.5),
        _t("turn:c:1", "uses_tool", "tool:x"),
    ])
    out = construct_triples(
        g, [("?t", "mentions", "?c"), ("?t", "uses_tool", "?tool")],
        ("?t", "used_tool_while_on_topic", "?tool"))
    # two bindings (one per concept) collapse to ONE distinct triple
    assert out.count() == 1
    with pytest.raises(ValueError, match="not bound"):
        construct_triples(g, [("?t", "mentions", "?c")],
                          ("?t", "p", "?missing"))


def test_validate_clean_graph_all_zero_but_dangling(spark):
    g = _g(spark, [
        _t("turn:c:0", "mentions", "concept:a", 0.9),
        _t("turn:c:1", "replies_to", "turn:c:0"),
        _t("turn:c:1", "uses_tool", "tool:x"),
    ])
    concepts = spark.createDataFrame([("concept:a",)], "concept_id string")
    v = {r.constraint: r.violations
         for r in validate_graph(g, concepts).collect()}
    assert set(v) == {
        "mentions_obj_in_ontology", "mentions_score_in_unit_range",
        "uses_tool_obj_prefixed", "replies_to_target_exists",
        "no_self_reply", "subj_wellformed"}
    assert all(n == 0 for n in v.values())


def test_validate_flags_every_constraint_class(spark):
    g = _g(spark, [
        _t("turn:c:0", "mentions", "concept:a", 0.9),     # clean
        _t("turn:c:0", "mentions", "bogus:x", 0.5),       # unknown concept
        _t("turn:c:1", "mentions", "concept:a", 1.5),     # score > 1
        _t("turn:c:2", "uses_tool", "hammer"),            # missing prefix
        _t("turn:c:3", "replies_to", "turn:c:3"),         # self loop
        _t("turn:c:4", "replies_to", "turn:c:999"),       # dangling target
        _t("weird", "mentions", "concept:a", 0.5),        # bad subject
    ])
    concepts = spark.createDataFrame([("concept:a",)], "concept_id string")
    v = {r.constraint: r.violations
         for r in validate_graph(g, concepts).collect()}
    assert v["mentions_obj_in_ontology"] == 1
    assert v["mentions_score_in_unit_range"] == 1
    assert v["uses_tool_obj_prefixed"] == 1
    assert v["no_self_reply"] == 1
    assert v["replies_to_target_exists"] == 1   # turn:c:999 only
    assert v["subj_wellformed"] == 1


def test_validate_membership_join_is_broadcast(spark):
    g = _g(spark, [_t("turn:c:0", "mentions", "concept:a", 0.9)])
    concepts = spark.createDataFrame([("concept:a",)], "concept_id string")
    plan = validate_graph(g, concepts)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_validate_inference_soundness(spark):
    """broader_edge_justified: a mentions_broader edge is a violation
    unless SOME asserted mention of the same subject reaches that
    ancestor through the expansion table."""
    g = _g(spark, [
        _t("turn:c:0", "mentions", "o:leaf", 0.9),
        _t("turn:c:0", "mentions_broader", "o:branch", 0.72),  # justified
        _t("turn:c:1", "mentions_broader", "o:branch", 0.8),   # no mention
        _t("turn:c:0", "mentions_broader", "o:other", 0.5),    # wrong anc
    ])
    concepts = spark.createDataFrame(
        [("o:leaf",), ("o:branch",), ("o:other",)], "concept_id string")
    anc = spark.createDataFrame(
        [("o:leaf", "o:branch"), ("o:leaf", "o:root")],
        "concept_id string, anc_id string")
    v = {r.constraint: r.violations
         for r in validate_graph(g, concepts, ancestors=anc).collect()}
    assert v["broader_edge_justified"] == 2
    # without the expansion table the constraint row is absent
    v2 = {r.constraint for r in validate_graph(g, concepts).collect()}
    assert "broader_edge_justified" not in v2
