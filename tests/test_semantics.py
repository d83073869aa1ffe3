"""Unit tests for the shared pure semantic layer."""

import numpy as np

from otd_semantic_framework_spark import semantics as S


def test_vocab_shape():
    assert len(S.VOCAB) == 200
    assert len(set(S.VOCAB)) == 200


def test_token_vector_deterministic_unit():
    v1 = S.token_vector("bus")
    v2 = S.token_vector("bus")
    assert np.array_equal(v1, v2)
    assert abs(float(np.linalg.norm(v1.astype(np.float64))) - 1.0) < 1e-5
    assert not np.array_equal(v1, S.token_vector("train"))


def test_phrase_vector_mean_pool():
    v = S.phrase_vector("bus stop")
    m = (S.token_vector("bus") + S.token_vector("stop")) / 2
    m = m / np.linalg.norm(m)
    assert np.allclose(v, m, atol=1e-6)


def test_normalize():
    assert S.normalize_text("  Hello, World!42 ") == "hello world 42"
    assert S.normalize_text(None) == ""
    assert S.normalize_text("ﬁne") == "fine"  # NFKC ligature


def test_ontology_structure():
    cs = S.build_ontology()
    assert len(cs) == 69  # 1 root + 8 branches + 60 leaves
    by_id = {c.concept_id: c for c in cs}
    for c in cs:
        assert c.path[-1] == c.concept_id
        assert len(c.path) == c.depth
        if c.parent_id:
            assert c.path[-2] == c.parent_id
            assert by_id[c.parent_id].depth == c.depth - 1
    # normalized pref labels unique
    labels = [S.normalize_text(c.pref_label) for c in cs]
    assert len(set(labels)) == len(labels)


def test_wup_properties():
    cs = S.build_ontology()
    by_id = {c.concept_id: c for c in cs}
    root = by_id["otd:C000"]
    for c in cs:
        assert S.wup_similarity(c, c) == 1.0
        assert S.wup_similarity(c, root) == 2.0 / (c.depth + 1)
    # two leaves under the same branch: lcs depth 2, both depth 3 → 4/6
    sibs = [c for c in cs if c.parent_id == "otd:C001"]
    assert len(sibs) >= 2
    assert abs(S.wup_similarity(sibs[0], sibs[1]) - 4.0 / 6.0) < 1e-12


def test_find_mentions_greedy_longest():
    gaz = {"bus": "c1", "bus stop": "c2", "stop": "c3"}
    out = S.find_mentions("the bus stop is near", gaz)
    assert out == [("bus stop", 1, 3)]
    out2 = S.find_mentions("stop the bus", gaz)
    assert out2 == [("stop", 0, 1), ("bus", 2, 3)]


def test_stable_hash_is_stable():
    assert S.stable_hash("a", 1) == S.stable_hash("a", 1)
    assert S.stable_hash("a", 1, mod=10) < 10
