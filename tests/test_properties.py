"""Property-based tests (hypothesis) for the pure semantic layer, plus
algebraic properties of the Spark operators (SURVEY.md §5.2.5)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from otd_semantic_framework_spark import semantics as S

_token = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=6)
_tokens = st.lists(_token, min_size=0, max_size=30)
_gaz_keys = st.lists(
    st.tuples(_token, st.booleans()), min_size=1, max_size=15)


def _mk_gaz(entries):
    gaz = {}
    for i, (w, bigram) in enumerate(entries):
        key = f"{w} {w}x" if bigram else w
        gaz[key] = f"c{i}"
    return gaz


@settings(max_examples=300, deadline=None)
@given(_tokens, _gaz_keys)
def test_regex_equals_walk_on_random_inputs(tokens, gaz_entries):
    gaz = _mk_gaz(gaz_entries)
    text = " ".join(tokens)
    pat = S.gazetteer_pattern(gaz, max_ngram=2)
    assert S.find_mentions_regex(text, pat) == S.find_mentions(text, gaz, 2)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_normalize_idempotent_and_clean(s):
    n = S.normalize_text(s)
    assert S.normalize_text(n) == n
    assert n == n.strip()
    assert "  " not in n
    assert all(c.islower() or c.isdigit() or c == " " for c in n)


@settings(max_examples=100, deadline=None)
@given(_token)
def test_token_vector_unit_and_stable(tok):
    import numpy as np
    v = S.token_vector(tok)
    assert len(v) == S.EMBED_DIM
    assert abs(float(np.linalg.norm(v.astype("float64"))) - 1.0) < 1e-5
    assert np.array_equal(v, S.token_vector(tok))


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2**62), st.integers(1, 1000))
def test_stable_hash_mod_bounds(x, mod):
    assert 0 <= S.stable_hash("k", x, mod=mod) < mod


def test_mentions_never_overlap_property():
    """Greedy matching invariant: returned spans are disjoint and sorted."""
    gaz = S.build_gazetteer(S.build_ontology())
    pat = S.gazetteer_pattern(gaz)
    for i in range(200):
        text = " ".join(
            S.VOCAB[S.stable_hash("pw", i, j, mod=len(S.VOCAB))]
            for j in range(12))
        spans = S.find_mentions_regex(text, pat)
        for (_, s1, e1), (_, s2, e2) in zip(spans, spans[1:]):
            assert e1 <= s2, (text, spans)


def test_dedup_idempotent(spark, tiny_df):
    from otd_semantic_framework_spark.operators.triples import dedup_triples
    from otd_semantic_framework_spark.plans.pipeline import build_triples_fast
    t1 = build_triples_fast(spark, tiny_df)
    t2 = dedup_triples(t1)
    k1 = sorted(map(tuple, t1.collect()))
    k2 = sorted(map(tuple, t2.collect()))
    assert k1 == k2
