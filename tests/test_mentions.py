"""P3/P4/P5 — normalization parity, mention detection, explode."""

from otd_semantic_framework_spark import semantics as S
from otd_semantic_framework_spark.operators.mentions import (
    detect_mentions, explode_mentions)
from otd_semantic_framework_spark.operators.normalize import normalize_turns


def test_normalize_builtin_matches_python(spark, tiny_df, tiny_pdf):
    out = {(r.conv_id, r.turn_idx): r.norm_text
           for r in normalize_turns(tiny_df).collect()}
    for row in tiny_pdf.itertuples():
        assert out[(row.conv_id, row.turn_idx)] == S.normalize_text(row.text)


def test_normalize_nfkc_udf_matches(spark):
    df = spark.createDataFrame(
        [("ﬁne Ligature!",), ("ＨＥＬＬＯ ４２",), (None,)], "text string")
    rows = normalize_turns(df, nfkc=True).select("norm_text").collect()
    assert [r.norm_text for r in rows] == ["fine ligature", "hello 42", ""]


def test_mentions_match_oracle(spark, tiny_df, tiny_pdf, ontology_pdf):
    gaz = S.build_gazetteer(S.build_ontology())
    got = (
        explode_mentions(detect_mentions(normalize_turns(tiny_df), gaz))
        .select("conv_id", "turn_idx", "surface", "tok_start", "tok_end")
        .collect()
    )
    got_set = {(r.conv_id, r.turn_idx, r.surface, r.tok_start, r.tok_end) for r in got}
    want = set()
    for row in tiny_pdf.itertuples():
        for surf, s, e in S.find_mentions(S.normalize_text(row.text), gaz):
            want.add((row.conv_id, row.turn_idx, surf, s, e))
    assert got_set == want
    assert len(want) > 50  # fixture guarantees plenty of hits


def test_mention_id_deterministic(spark, tiny_df):
    gaz = S.build_gazetteer(S.build_ontology())
    m1 = explode_mentions(detect_mentions(normalize_turns(tiny_df), gaz))
    m2 = explode_mentions(detect_mentions(
        normalize_turns(tiny_df.repartition(11)), gaz))
    ids1 = sorted(r.mention_id for r in m1.select("mention_id").collect())
    ids2 = sorted(r.mention_id for r in m2.select("mention_id").collect())
    assert ids1 == ids2
    assert len(ids1) == len(set(ids1))  # unique per mention


def test_regex_detector_equals_python_walk(spark, tiny_df):
    gaz = S.build_gazetteer(S.build_ontology())
    fast = explode_mentions(detect_mentions(
        normalize_turns(tiny_df), gaz, use_regex=True))
    slow = explode_mentions(detect_mentions(
        normalize_turns(tiny_df), gaz, use_regex=False))
    k = lambda df: sorted((r.conv_id, r.turn_idx, r.surface, r.tok_start,
                           r.tok_end, r.mention_id) for r in df.collect())
    assert k(fast) == k(slow)


def test_fused_exploded_detector_equivalence(spark, tiny_df):
    """detect_mentions_exploded (mega-string mapInPandas, the hot path)
    emits exactly explode_mentions(detect_mentions(...)) including
    mention_id, under repartitioning (batch boundaries move)."""
    from otd_semantic_framework_spark.operators.mentions import (
        detect_mentions_exploded)
    gaz = S.build_gazetteer(S.build_ontology())
    k = lambda df: sorted((r.conv_id, r.turn_idx, r.surface, r.tok_start,
                           r.tok_end, r.mention_id) for r in df.collect())
    want = k(explode_mentions(detect_mentions(normalize_turns(tiny_df), gaz)))
    assert k(detect_mentions_exploded(normalize_turns(tiny_df), gaz)) == want
    assert k(detect_mentions_exploded(
        normalize_turns(tiny_df.repartition(13)), gaz)) == want


def test_regex_twin_pure_function_equivalence():
    """Property-ish: the regex twin matches find_mentions on adversarial
    strings (overlaps, prefixes, max_ngram exclusion)."""
    gaz = {"bus": "c1", "bus stop": "c2", "stop": "c3", "night bus": "c4",
           "open transport data": "c5"}
    pat = S.gazetteer_pattern(gaz, max_ngram=2)
    cases = [
        "the bus stop is near the night bus stop",
        "stop bus stop bus",
        "open transport data bus",   # 3-gram excluded at max_ngram=2
        "busy stopper bus",          # no partial-token matches
        "", "bus", "stop stop stop",
    ]
    for text in cases:
        assert S.find_mentions_regex(text, pat) == \
            S.find_mentions(text, gaz, max_ngram=2), text


def test_fused_canonical_detector_equivalence(spark, tiny_df, ontology_pdf):
    """detect_canonical_concepts_exploded (the fully-fused P4+P5+P7-P9
    hot path) emits exactly canonicalize_broadcast(
    detect_mentions_exploded(...)) max-reduced per (turn, concept), with
    matching dedup_triples score rounding — and is invariant under
    repartitioning (batch boundaries move)."""
    import pandas as pd
    from otd_semantic_framework_spark.operators.linking import (
        canonicalize_broadcast, surface_canonical_table)
    from otd_semantic_framework_spark.operators.mentions import (
        detect_canonical_concepts_exploded, detect_mentions_exploded)
    concepts = S.build_ontology()
    gaz = S.build_gazetteer(concepts)
    wup_pdf = pd.DataFrame(
        [(a.concept_id, b.concept_id, S.wup_similarity(a, b))
         for a in concepts for b in concepts],
        columns=["concept_a", "concept_b", "wup"])
    canon_table = surface_canonical_table(ontology_pdf, gaz, wup_pdf)
    ref = canonicalize_broadcast(
        detect_mentions_exploded(normalize_turns(tiny_df), gaz), canon_table)
    want = {}
    for r in ref.collect():
        key = (r.conv_id, r.turn_idx, r.concept_id)
        want[key] = max(want.get(key, 0.0), round(r.link_score, 6))
    k = lambda df: {(r.conv_id, r.turn_idx, r.concept_id):
                    round(r.link_score, 6) for r in df.collect()}
    got = k(detect_canonical_concepts_exploded(
        normalize_turns(tiny_df), gaz, canon_table))
    assert got == want
    got13 = k(detect_canonical_concepts_exploded(
        normalize_turns(tiny_df.repartition(13)), gaz, canon_table))
    assert got13 == want
