"""KG-construction extensions: relational→RDF direct mapping, knowledge
fusion, pattern-based open relation extraction, dialogue-act tagging,
and predicate QA profiling.

The reference's graph is built from a single extraction path (dataset
tagging [K]); a production KG-construction engine also ingests existing
relational data (W3C Direct Mapping [K]), fuses repeated observations of
the same fact into a confidence (Knowledge Vault-style support counting
[K]), mines relations outside the gazetteer (ReVerb-style pattern
extraction with a trigger lexicon [K]), classifies turns into dialogue
acts (cue-phrase heuristic baseline [K]), and QA-profiles the resulting
predicates (LODStats-style property statistics [K]).

Scale shapes: every operator here is a union of projections, a
broadcast-pruned semi-join, an equi-join on (doc, position) keys, or a
two-level hash aggregation — no cross joins, no unpartitioned windows,
no driver-side data movement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000

# Knowledge-fusion source weights: a fact asserted by the human outranks
# the assistant's own restatement, which outranks tool echo.
FUSION_ROLE_WEIGHTS = {"user": 3, "assistant": 2, "tool": 1}
FUSION_PRIOR = 4  # conf = w / (w + PRIOR): saturating pseudo-Bayes support


def direct_mapping_triples(orders: DataFrame, customer: DataFrame,
                           nation: DataFrame, region: DataFrame,
                           modulus: int = 10) -> DataFrame:
    """W3C-Direct-Mapping-lite of a relational slice into RDF triples.

    Each row becomes a subject IRI ``<table>:<pk>``, literal columns
    become literal triples, and each FK becomes a reference triple to
    the target row IRI — then the FK closure (customer → nation →
    region) is mapped for exactly the rows the slice references.

    The slice is the deterministic ``o_orderkey % modulus == 0`` subset
    (engine-portable; bounds test output). Scale shape: the orders scan
    is map-only projections UNION ALL'd; customer pruning is a semi-join
    on the slice's distinct custkeys (broadcast-able: the distinct-key
    side is slice-sized); nation/region are dimension tables. No
    aggregation, one distinct at the end for set semantics.
    """
    o = orders.filter(F.col("o_orderkey") % modulus == 0)
    okey = F.concat(F.lit("order:"), F.col("o_orderkey").cast("string"))

    def lit3(subj, pred, obj):
        return [subj.alias("subj"), F.lit(pred).alias("pred"),
                obj.alias("obj")]

    o_triples = (
        o.select(*lit3(okey, "rdf:type", F.lit("tpch:Order")))
        .unionByName(o.select(*lit3(okey, "tpch:status",
                                    F.col("o_orderstatus"))))
        .unionByName(o.select(*lit3(okey, "tpch:priority",
                                    F.col("o_orderpriority"))))
        .unionByName(o.select(*lit3(
            okey, "tpch:price_cents",
            F.round(F.col("o_totalprice") * 100, 0)
             .cast("long").cast("string"))))
        .unionByName(o.select(*lit3(
            okey, "tpch:orderdate",
            F.col("o_orderdate").cast("date").cast("string"))))
        .unionByName(o.select(*lit3(
            okey, "tpch:customer",
            F.concat(F.lit("customer:"), F.col("o_custkey").cast("string")))))
    )

    custkeys = o.select(F.col("o_custkey").alias("c_custkey")).distinct()
    c = customer.join(F.broadcast(custkeys), "c_custkey")
    ckey = F.concat(F.lit("customer:"), F.col("c_custkey").cast("string"))
    c_triples = (
        c.select(*lit3(ckey, "rdf:type", F.lit("tpch:Customer")))
        .unionByName(c.select(*lit3(ckey, "tpch:mktsegment",
                                    F.col("c_mktsegment"))))
        .unionByName(c.select(*lit3(
            ckey, "tpch:nation",
            F.concat(F.lit("nation:"), F.col("c_nationkey").cast("string")))))
    )

    natkeys = c.select(F.col("c_nationkey").alias("n_nationkey")).distinct()
    n = nation.join(F.broadcast(natkeys), "n_nationkey")
    nkey = F.concat(F.lit("nation:"), F.col("n_nationkey").cast("string"))
    n_triples = (
        n.select(*lit3(nkey, "tpch:name", F.col("n_name")))
        .unionByName(n.select(*lit3(
            nkey, "tpch:region",
            F.concat(F.lit("region:"), F.col("n_regionkey").cast("string")))))
    )

    regkeys = n.select(F.col("n_regionkey").alias("r_regionkey")).distinct()
    r = region.join(F.broadcast(regkeys), "r_regionkey")
    rkey = F.concat(F.lit("region:"), F.col("r_regionkey").cast("string"))
    r_triples = r.select(*lit3(rkey, "tpch:name", F.col("r_name")))

    return (o_triples.unionByName(c_triples).unionByName(n_triples)
            .unionByName(r_triples).distinct())


def fuse_facts(mentions_with_role: DataFrame) -> DataFrame:
    """Knowledge fusion: collapse repeated observations of the same
    conversation-level fact into one row with support counts and a
    saturating confidence.

    Input: one row per mention observation with ``conv_id``,
    ``turn_idx``, ``role``, ``concept_id``. The fused fact is
    (``conv:<conv_id>``, ``discusses``, ``concept:<concept_id>``) with

    - ``n_mentions``  — raw observation count,
    - ``n_turns``     — distinct supporting turns,
    - ``w_support``   — role-weighted support (user 3 / assistant 2 /
      tool 1: FUSION_ROLE_WEIGHTS),
    - ``first_turn`` / ``last_turn`` — provenance span,
    - ``conf_ppm``    — ``w * 1e6 DIV (w + FUSION_PRIOR)``: monotone in
      support, saturating at 1.0, exact-integer on every engine.

    Scale shape: ONE hash aggregation keyed by (conv, concept) with
    map-side partials (count/sum/min/max are all algebraic); the
    distinct-turn count is exact via a two-level agg, still keyed by the
    same group — no unpartitioned windows, no joins.
    """
    w = F.when(F.col("role") == "user",
               F.lit(FUSION_ROLE_WEIGHTS["user"])) \
         .when(F.col("role") == "assistant",
               F.lit(FUSION_ROLE_WEIGHTS["assistant"])) \
         .otherwise(F.lit(FUSION_ROLE_WEIGHTS["tool"]))
    per_turn = (mentions_with_role
                .groupBy("conv_id", "concept_id", "turn_idx")
                .agg(F.count(F.lit(1)).alias("n_obs"),
                     F.max(w).alias("w_turn")))
    fused = (per_turn.groupBy("conv_id", "concept_id")
             .agg(F.sum("n_obs").cast("long").alias("n_mentions"),
                  F.count(F.lit(1)).cast("long").alias("n_turns"),
                  F.sum("w_turn").cast("long").alias("w_support"),
                  F.min("turn_idx").cast("long").alias("first_turn"),
                  F.max("turn_idx").cast("long").alias("last_turn")))
    return fused.select(
        F.concat(F.lit("conv:"), F.col("conv_id")).alias("subj"),
        F.lit("discusses").alias("pred"),
        F.concat(F.lit("concept:"), F.col("concept_id")).alias("obj"),
        "n_mentions", "n_turns", "w_support", "first_turn", "last_turn",
        F.expr(f"w_support * {PPM} DIV (w_support + {FUSION_PRIOR})")
         .cast("long").alias("conf_ppm"))


# Trigger lexicon for pattern-based open IE over the synthetic corpus
# vocabulary; a real deployment swaps in a verb lexicon / POS tagger.
OPENIE_TRIGGERS = ("join", "merge", "filter", "scan", "sort", "group")
OPENIE_STOP = ("the", "a")
OPENIE_MIN_SUPPORT = 2


def open_relation_triples(transcripts: DataFrame,
                          triggers: tuple[str, ...] = OPENIE_TRIGGERS,
                          stop: tuple[str, ...] = OPENIE_STOP,
                          min_support: int = OPENIE_MIN_SUPPORT
                          ) -> DataFrame:
    """Pattern-based open relation extraction (ReVerb-lite [K]): emit
    (left_token, trigger, right_token) for every occurrence of a trigger
    word with content tokens immediately on both sides, aggregated to
    corpus-level support counts.

    Tokenization is position-preserving (split on single space, empties
    keep their slot) so the adjacency join replays bit-identically in
    ANSI SQL via ``unnest ... WITH ORDINALITY``. Arguments must be
    alphabetic, length ≥ 3, and neither triggers nor stopwords.

    Scale shape: one narrow posexplode, then two self-equi-joins keyed
    on (conv, turn, position) — position keys are unique within a turn,
    so the join fans out 1:1; the final support count is a single hash
    agg with map-side partials. The trigger filter prunes the probe side
    BEFORE the joins (predicate pushdown keeps the exploded table's
    scan-side selective).
    """
    toks = transcripts.select(
        "conv_id", "turn_idx",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok"))
    trig = list(triggers)
    v = (toks.filter(F.col("tok").isin(trig))
         .select("conv_id", "turn_idx", F.col("pos").alias("vpos"),
                 F.col("tok").alias("rel")))
    arg_ok = (F.col("tok").rlike("^[a-z]{3,}$")
              & ~F.col("tok").isin(trig) & ~F.col("tok").isin(list(stop)))
    args = toks.filter(arg_ok)
    left = args.select("conv_id", "turn_idx",
                       (F.col("pos") + 1).alias("vpos"),
                       F.col("tok").alias("subj_tok"))
    right = args.select("conv_id", "turn_idx",
                        (F.col("pos") - 1).alias("vpos"),
                        F.col("tok").alias("obj_tok"))
    trip = (v.join(left, ["conv_id", "turn_idx", "vpos"])
            .join(right, ["conv_id", "turn_idx", "vpos"]))
    return (trip.groupBy("subj_tok", "rel", "obj_tok")
            .agg(F.count(F.lit(1)).cast("long").alias("n_support"))
            .filter(F.col("n_support") >= min_support))


# Cue lexicons for the dialogue-act heuristic (cue-phrase baseline [K]).
ACT_QUESTION_CUES = ("query", "filter", "scan")
ACT_DIRECTIVE_CUES = ("sort", "merge", "join", "group", "order")


def dialogue_act_transitions(transcripts: DataFrame) -> DataFrame:
    """Dialogue-act tagging + first-order transition matrix.

    Acts (deterministic cue heuristic): ``question`` if the turn
    contains '?' or opens with a question cue; ``directive`` if it opens
    with an imperative cue; else ``inform``. Transitions are counted per
    conversation in turn order with a ``<start>`` pseudo-act for the
    first turn; ``p_ppm`` is the exact-integer row-normalized transition
    probability.

    Scale shape: the lag window is PARTITIONED BY conv_id (conversation-
    bounded, never one task); the transition count is one hash agg; the
    row normalization windows over the aggregated matrix, whose size is
    |acts|² + |acts| — constant, not data-scaled.
    """
    first_tok = F.element_at(F.split(F.col("text"), " "), 1)
    act = (F.when(F.col("text").contains("?")
                  | first_tok.isin(list(ACT_QUESTION_CUES)), "question")
           .when(first_tok.isin(list(ACT_DIRECTIVE_CUES)), "directive")
           .otherwise("inform"))
    from pyspark.sql import Window
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    tagged = (transcripts.select("conv_id", "turn_idx", act.alias("act"))
              .withColumn("prev_act",
                          F.coalesce(F.lag("act", 1).over(w),
                                     F.lit("<start>"))))
    counts = (tagged.groupBy("prev_act", "act")
              .agg(F.count(F.lit(1)).cast("long").alias("n_trans")))
    wtot = Window.partitionBy("prev_act")
    return (counts
            .withColumn("row_total", F.sum("n_trans").over(wtot))
            .select("prev_act", "act", "n_trans",
                    F.expr(f"n_trans * {PPM} DIV row_total")
                     .cast("long").alias("p_ppm")))


def predicate_profile(triples: DataFrame) -> DataFrame:
    """LODStats-style predicate QA profile: per predicate, the triple
    count, distinct subject/object cardinalities, the maximum subject
    fan-out, and the count of functional-property violations (subjects
    asserting more than one distinct object) — the report a KG curator
    reads to decide which predicates are functional, which are noisy,
    and where extraction over-fires.

    Scale shape: one (pred, subj) hash agg with map-side partials, then
    one pred-level rollup; the distinct-object cardinality rides the
    same two-level aggregation (count_distinct within the first level is
    keyed by the full group). No windows, no joins.
    """
    per_subj = (triples.groupBy("pred", "subj")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.countDistinct("obj").alias("n_obj_subj")))
    prof = (per_subj.groupBy("pred")
            .agg(F.sum("n").cast("long").alias("n_triples"),
                 F.count(F.lit(1)).cast("long").alias("n_subj"),
                 F.max("n").cast("long").alias("max_fanout"),
                 F.sum(F.when(F.col("n_obj_subj") > 1, 1).otherwise(0))
                  .cast("long").alias("n_functional_violations")))
    n_obj = (triples.select("pred", "obj").distinct()
             .groupBy("pred")
             .agg(F.count(F.lit(1)).cast("long").alias("n_obj")))
    return prof.join(n_obj, "pred").select(
        "pred", "n_triples", "n_subj", "n_obj", "max_fanout",
        "n_functional_violations")


# Discourse / linking-quality extensions (wave 12): recency-based
# antecedent propagation, per-conversation entity salience, turn-level
# novelty profiling, and the entity-linking alias dictionary.

SALIENCE_TOP_K = 3
ALIAS_AMBIGUITY_MARGIN_PPM = 100_000


def recency_antecedents(transcripts: DataFrame,
                        turn_concepts: DataFrame) -> DataFrame:
    """Recency-based antecedent propagation (centering-theory baseline
    [K]): every turn that carries NO explicit concept mention inherits
    the concept of the most recent PRIOR mention-bearing turn in the
    same conversation — the discourse carry-over a coreference layer
    contributes to KG construction (pronouns/ellipsis keep discussing
    the last entity) without an NLP model.

    ``turn_concepts`` is one row per mention observation with
    ``conv_id``, ``turn_idx``, ``concept_id``; ties within a turn break
    to the lexicographically greatest concept (a salience model would
    rank — the pick just has to be deterministic).

    Scale shape: one (conv, turn) hash agg, one equi-join back to the
    turn spine, and two ``last(ignorenulls)`` windows PARTITIONED BY
    conv_id — conversation-bounded, never one task. Output is only the
    resolved mention-less turns.
    """
    tc = (turn_concepts.groupBy("conv_id", "turn_idx")
          .agg(F.max("concept_id").alias("turn_concept")))
    spine = (transcripts.select("conv_id", "turn_idx")
             .join(tc, ["conv_id", "turn_idx"], "left"))
    w = (Window.partitionBy("conv_id").orderBy("turn_idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    out = spine.select(
        "conv_id", "turn_idx", "turn_concept",
        F.last("turn_concept", ignorenulls=True).over(w)
         .alias("antecedent_concept"),
        F.last(F.when(F.col("turn_concept").isNotNull(),
                      F.col("turn_idx")), ignorenulls=True).over(w)
         .alias("antecedent_turn"))
    return (out.filter(F.col("turn_concept").isNull()
                       & F.col("antecedent_concept").isNotNull())
            .select("conv_id", "turn_idx", "antecedent_concept",
                    F.col("antecedent_turn").cast("long")
                     .alias("antecedent_turn"),
                    (F.col("turn_idx") - F.col("antecedent_turn"))
                    .cast("long").alias("gap")))


def entity_salience(transcripts: DataFrame, turn_concepts: DataFrame,
                    top_k: int = SALIENCE_TOP_K) -> DataFrame:
    """Per-conversation entity salience: blend of turn coverage (share
    of the conversation's turns that mention the concept) and earliness
    (how soon it first appears) — the score a KG builder uses to pick a
    conversation's HEAD entities for summary nodes and indexing [K].

    salience_ppm = 500000 · n_turns DIV conv_len
                 + 500000 DIV (1 + first_turn)     (exact integers)

    Scale shape: one (conv, concept) hash agg (count / distinct-turn /
    min are all algebraic), one conv-level count joined back on the
    conv key, and one rank window PARTITIONED BY conv_id.
    """
    conv_len = (transcripts.groupBy("conv_id")
                .agg(F.count(F.lit(1)).alias("conv_len")))
    per = (turn_concepts.groupBy("conv_id", "concept_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_mentions"),
                F.countDistinct("turn_idx").cast("long").alias("n_turns"),
                F.min("turn_idx").cast("long").alias("first_turn")))
    scored = (per.join(conv_len, "conv_id")
              .withColumn("salience_ppm", F.expr(
                  "500000 * n_turns DIV conv_len"
                  " + 500000 DIV (1 + first_turn)").cast("long")))
    w = Window.partitionBy("conv_id").orderBy(
        F.desc("salience_ppm"), F.asc("concept_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select("conv_id", "concept_id", "n_mentions", "n_turns",
                    "first_turn", "salience_ppm",
                    F.col("rank").cast("int").alias("rank")))


def turn_novelty(turn_concepts: DataFrame) -> DataFrame:
    """Turn-level novelty profile: for each mention-bearing turn, how
    many distinct concepts it mentions, how many it INTRODUCES (first
    occurrence within the conversation), the running distinct-concept
    count, and the exact-integer novelty ratio — the "new information
    rate" curve that tells a curator where a conversation stops adding
    knowledge (and an incremental KG builder which turns can be
    skipped).

    Scale shape: one distinct on (conv, turn, concept); a first-
    occurrence window PARTITIONED BY (conv, concept); one (conv, turn)
    hash agg; and a running-sum window PARTITIONED BY conv_id.
    """
    cm = turn_concepts.select("conv_id", "turn_idx", "concept_id").distinct()
    w_first = Window.partitionBy("conv_id", "concept_id").orderBy("turn_idx")
    flagged = cm.withColumn(
        "is_new", (F.row_number().over(w_first) == 1).cast("int"))
    per_turn = (flagged.groupBy("conv_id", "turn_idx")
                .agg(F.count(F.lit(1)).cast("long").alias("n_concepts"),
                     F.sum("is_new").cast("long").alias("n_new")))
    w_run = (Window.partitionBy("conv_id").orderBy("turn_idx")
             .rowsBetween(Window.unboundedPreceding, 0))
    return per_turn.select(
        "conv_id", "turn_idx", "n_concepts", "n_new",
        F.sum("n_new").over(w_run).cast("long").alias("cum_concepts"),
        F.expr(f"n_new * {PPM} DIV n_concepts").cast("long")
         .alias("novelty_ppm"))


def alias_table(mentions: DataFrame, scores: DataFrame,
                margin_ppm: int = ALIAS_AMBIGUITY_MARGIN_PPM) -> DataFrame:
    """Entity-linking alias dictionary [K]: one row per surface form
    seen in the corpus — its mention frequency, candidate-concept
    fan-out, best candidate, and the best-vs-runner-up cosine margin
    that flags ambiguous names (small margin = the linker is choosing
    between near-ties and deserves a context model).

    Cosines become exact ppm ints via floor(cos·1e6 + 0.5) — identical
    half-up semantics on every engine (engine round() differs: Spark is
    half-away, DuckDB half-even). A unique candidate's margin is its
    full score (nothing competes).

    Scale shape: the corpus-frequency agg is one surface-keyed hash agg;
    the candidate ranking windows over the broadcast-sized score table
    (ontology-scale, not corpus-scale); the final join is broadcast.
    """
    freq = (mentions.groupBy("surface")
            .agg(F.count(F.lit(1)).cast("long").alias("n_mentions")))
    cos_ppm = F.floor(F.col("cos_sim") * PPM + 0.5).cast("long")
    w = Window.partitionBy("surface").orderBy(
        F.desc("cos_sim"), F.asc("concept_id"))
    ranked = (scores.withColumn("rn", F.row_number().over(w))
              .withColumn("cos_ppm", cos_ppm))
    best = (ranked.filter(F.col("rn") == 1)
            .select("surface", F.col("concept_id").alias("best_concept"),
                    F.col("cos_ppm").alias("best_cos_ppm")))
    second = (ranked.filter(F.col("rn") == 2)
              .select("surface", F.col("cos_ppm").alias("second_cos_ppm")))
    n_cand = (scores.groupBy("surface")
              .agg(F.count(F.lit(1)).cast("long").alias("n_candidates")))
    prof = (best.join(second, "surface", "left").join(n_cand, "surface")
            .withColumn("margin_ppm",
                        (F.col("best_cos_ppm")
                         - F.coalesce("second_cos_ppm", F.lit(0)))
                        .cast("long")))
    return (freq.join(F.broadcast(prof), "surface", "inner")
            .select("surface", "n_mentions", "n_candidates", "best_concept",
                    "best_cos_ppm", "margin_ppm",
                    (F.col("margin_ppm") < margin_ppm).cast("int")
                     .alias("is_ambiguous")))


# KG quality / enrichment extensions (wave 13): AMIE-lite rule mining,
# capture-recapture completeness estimation, and the functional-
# predicate conflict-resolution queue.

RULE_MIN_SUPPORT = 2
RULE_HUB_CAP = 64


def mine_rules(triples: DataFrame, min_support: int = RULE_MIN_SUPPORT,
               hub_cap: int = RULE_HUB_CAP) -> DataFrame:
    """AMIE-lite horn-rule mining [K: Galárraga 2013]: discover
    2-atom forward-chain rules  p(x,y) ∧ q(y,z) ⇒ r(x,z)  with their
    support (distinct (x,z) instances satisfying body AND head) and
    standard confidence (support / distinct body instances) — how a KG
    learns inference rules (e.g. "a reply stays on topic") from its own
    extracted facts.

    Middle nodes y with total degree above ``hub_cap`` are excluded
    from body generation (the d² path blowup lives in hubs, and a chain
    through a hub is near-zero evidence — same cap-as-semantics policy
    as kg_link_predict); x = z chains are dropped (reflexive heads are
    vacuous).

    Scale shape: one degree agg; the body is a single equi-join keyed
    on the capped middle node; the head check is an equi-join on
    (x, z); support/body counts are hash aggs over distinct projections.
    No windows, no cross joins.
    """
    t = triples.select("subj", "pred", "obj").distinct()
    deg = (t.select(F.col("subj").alias("n"))
           .unionAll(t.select(F.col("obj").alias("n")))
           .groupBy("n").agg(F.count(F.lit(1)).alias("deg")))
    mid = deg.filter(F.col("deg") <= hub_cap).select("n")
    t1 = t.select(F.col("subj").alias("x"), F.col("pred").alias("p"),
                  F.col("obj").alias("n"))
    t2 = t.select(F.col("subj").alias("n"), F.col("pred").alias("q"),
                  F.col("obj").alias("z"))
    body = (t1.join(mid, "n").join(t2, "n")
            .filter(F.col("x") != F.col("z"))
            .select("p", "q", "x", "z").distinct())
    body_count = (body.groupBy("p", "q")
                  .agg(F.count(F.lit(1)).alias("n_body")))
    head = t.select(F.col("subj").alias("x"), F.col("pred").alias("r"),
                    F.col("obj").alias("z"))
    support = (body.join(head, ["x", "z"])
               .groupBy("p", "q", "r")
               .agg(F.count(F.lit(1)).alias("support")))
    return (support.join(body_count, ["p", "q"])
            .filter(F.col("support") >= min_support)
            .select(F.col("p").alias("body_p"), F.col("q").alias("body_q"),
                    F.col("r").alias("head_r"),
                    F.col("support").cast("long").alias("support"),
                    F.col("n_body").cast("long").alias("n_body"),
                    F.expr(f"support * {PPM} DIV n_body").cast("long")
                     .alias("conf_ppm")))


def estimate_completeness(observations: DataFrame) -> DataFrame:
    """KB completeness estimation via capture-recapture [K: the
    Lincoln-Petersen estimator, as applied to KB recall by Razniewski
    et al.]: treat user turns and assistant turns as two independent
    observers of the same fact space (conv discusses concept); the
    overlap between their catches estimates how many facts exist that
    NEITHER observed — the "how complete is my KG" number a curator
    cannot get from counts alone.

    est_total = n_user · n_assistant DIV n_overlap, and coverage_ppm =
    n_observed · 1e6 DIV est_total (may exceed 1e6: facts observed only
    by tool turns add to n_observed but not to either observer's
    catch). NULL when the overlap is empty (the estimator is
    undefined).

    Input: one row per mention observation (conv_id, concept_id,
    role). Scale shape: one (conv, concept) hash agg with boolean-max
    partials, then one global algebraic agg — two shuffles, one row
    out.
    """
    per_fact = (observations.groupBy("conv_id", "concept_id")
                .agg(F.max((F.col("role") == "user").cast("int"))
                      .alias("saw_user"),
                     F.max((F.col("role") == "assistant").cast("int"))
                      .alias("saw_asst")))
    agg = per_fact.agg(
        F.sum("saw_user").cast("long").alias("n_user"),
        F.sum("saw_asst").cast("long").alias("n_assistant"),
        F.sum(F.col("saw_user") * F.col("saw_asst")).cast("long")
         .alias("n_overlap"),
        F.count(F.lit(1)).cast("long").alias("n_observed"))
    est = F.when(F.col("n_overlap") > 0,
                 F.expr("n_user * n_assistant DIV n_overlap")).cast("long")
    return (agg.withColumn("est_total", est)
            .withColumn("coverage_ppm",
                        F.when(F.col("est_total") > 0,
                               F.expr(f"n_observed * {PPM} DIV est_total"))
                        .cast("long")))


def fact_conflicts(facts: DataFrame) -> DataFrame:
    """Conflict-resolution queue for a functional predicate: subjects
    asserting MORE THAN ONE distinct object, with per-object support,
    exact-integer share, winner pick (max support, lexicographic
    tiebreak), and rank — the queue a curator (or an automated
    last-writer/majority policy) works through, with evidence.
    predicate_profile COUNTS these violations; this LISTS them.

    Input: one row per observation with ``subj``, ``obj``. Scale shape:
    one (subj, obj) hash agg, then rank/total windows PARTITIONED BY
    subj (subject-bounded, never one task).
    """
    sup = (facts.groupBy("subj", "obj")
           .agg(F.count(F.lit(1)).alias("support")))
    w_rank = Window.partitionBy("subj").orderBy(
        F.desc("support"), F.asc("obj"))
    w_subj = Window.partitionBy("subj")
    out = (sup
           .withColumn("rank", F.row_number().over(w_rank))
           .withColumn("n_alternatives", F.count(F.lit(1)).over(w_subj))
           .withColumn("total_support", F.sum("support").over(w_subj)))
    return (out.filter(F.col("n_alternatives") >= 2)
            .select("subj", "obj", F.col("support").cast("long")
                     .alias("support"),
                    F.col("n_alternatives").cast("long")
                     .alias("n_alternatives"),
                    F.expr(f"support * {PPM} DIV total_support")
                     .cast("long").alias("share_ppm"),
                    (F.col("rank") == 1).cast("int").alias("is_winner"),
                    F.col("rank").cast("int").alias("rank")))


# RDF publishing surface (wave 14): statement reification and the VoID
# dataset self-description.

REIFY_SEP = "#"  # never occurs in this graph's IRIs (pinned in pytest)


def reify_triples(triples: DataFrame) -> DataFrame:
    """RDF reification [K: RDF 1.1 Semantics, rdf:Statement vocabulary]:
    each distinct (subj, pred, obj) becomes an addressable statement
    node — the prerequisite for attaching provenance, confidence, and
    edit history to individual facts (the fusion/conflict operators'
    outputs hang off these IRIs in a full deployment).

    Statement IRIs are content-addressed (first 16 md5 hex chars of the
    '#'-joined triple), so reification is idempotent and engine-
    portable; each statement emits the four standard triples
    (rdf:type rdf:Statement, rdf:subject, rdf:predicate, rdf:object).

    Scale shape: map-only — one distinct, then four projections
    UNION ALL'd; no joins, no aggregation, no windows.
    """
    t = triples.select("subj", "pred", "obj").distinct()
    stmt = F.concat(
        F.lit("stmt:"),
        F.substring(F.md5(F.concat_ws(REIFY_SEP, "subj", "pred", "obj")),
                    1, 16))
    t = t.withColumn("stmt", stmt)

    def emit(pred, obj_col):
        return t.select(F.col("stmt").alias("subj"),
                        F.lit(pred).alias("pred"), obj_col.alias("obj"))

    return (emit("rdf:type", F.lit("rdf:Statement"))
            .unionByName(emit("rdf:subject", F.col("subj")))
            .unionByName(emit("rdf:predicate", F.col("pred")))
            .unionByName(emit("rdf:object", F.col("obj"))))


def void_description(triples: DataFrame,
                     dataset_iri: str = "dataset:kg") -> DataFrame:
    """VoID dataset self-description [K: W3C VoID vocabulary]: the
    standard statistics a published RDF dataset carries about itself —
    total triples, distinct subjects/objects, property count, and one
    property partition per predicate with its triple count. The
    publishing step that lets a consumer size a federated query before
    reading the data.

    Scale shape: one global algebraic+distinct aggregate and one
    predicate-keyed hash agg; output is vocabulary-sized (a handful of
    rows), emitted as (subj, pred, obj) string triples.
    """
    t = triples.select("subj", "pred", "obj").distinct()
    g = t.agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("subj").alias("n_subj"),
        F.countDistinct("obj").alias("n_obj"),
        F.countDistinct("pred").alias("n_pred"))
    d = F.lit(dataset_iri)

    def stat(pred, col):
        return g.select(d.alias("subj"), F.lit(pred).alias("pred"),
                        col.cast("string").alias("obj"))

    global_triples = (
        g.select(d.alias("subj"), F.lit("rdf:type").alias("pred"),
                 F.lit("void:Dataset").alias("obj"))
        .unionByName(stat("void:triples", F.col("n_triples")))
        .unionByName(stat("void:distinctSubjects", F.col("n_subj")))
        .unionByName(stat("void:distinctObjects", F.col("n_obj")))
        .unionByName(stat("void:properties", F.col("n_pred"))))

    per_pred = t.groupBy("pred").agg(F.count(F.lit(1)).alias("n"))
    part = F.concat(d, F.lit(REIFY_SEP), F.col("pred"))
    pred_triples = (
        per_pred.select(part.alias("subj"),
                        F.lit("void:property").alias("pred"),
                        F.col("pred").alias("obj"))
        .unionByName(per_pred.select(
            part.alias("subj"), F.lit("void:triples").alias("pred"),
            F.col("n").cast("string").alias("obj")))
        .unionByName(per_pred.select(
            d.alias("subj"), F.lit("void:propertyPartition").alias("pred"),
            part.alias("obj"))))
    return global_triples.unionByName(pred_triples)
