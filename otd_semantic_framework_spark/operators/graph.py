"""Graph analytics over the constructed knowledge graph: PageRank and
concept co-occurrence association strength.

The reference's autotag graph is consumed as an rdflib Graph a user can
traverse/score arbitrarily [K]; at 100 TB the graph is a distributed
edge table, so the canonical read-side analytics (node importance,
concept association) must be expressed as joins + aggregations.

Both operators here are EXACT-INTEGER by construction — fixed-point
arithmetic (ppm scaling, integer division) instead of floating point —
so the result is independent of partial-aggregation merge order and
bit-identical across engines (the same discipline as the integer-cents
oracles elsewhere in this repo: a distributed float sum is
order-dependent, an integer sum is not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: fixed-point scale: ranks/lifts are parts-per-million integers
PPM = 1_000_000
#: damping factor 0.85 expressed exactly in integer per-mille
DAMPING_PM = 850
BASE_RANK = PPM * 15 // 100  # (1 - d) * PPM = 150000


def kg_edges(triples: DataFrame) -> DataFrame:
    """Directed edge table of the heterogeneous KG: subj→obj over every
    predicate (turn→concept mentions, turn→tool uses, turn→turn
    replies). (subj, obj) is already unique across predicates — the
    obj namespaces (concept ids / ``tool:*`` / ``turn:*``) are
    disjoint and each rule emits one row per key — but the distinct
    is kept so arbitrary triple inputs satisfy the set-semantics
    precondition at the cost of one map-side-partial agg."""
    return triples.select("subj", "obj").distinct()


def pagerank_exact(triples: DataFrame, iterations: int = 4) -> DataFrame:
    """Fixed-point PageRank over the KG edge table — ``iterations``
    synchronous rounds, damping 0.85, no dangling-mass redistribution
    (dangling sinks simply leak mass; both engines agree on the
    definition, which is what the oracle pairing needs).

    Arithmetic is pure BIGINT: ranks start at 1_000_000 (1.0 in ppm);
    each round every node sends ``rank DIV out_degree`` along its out
    edges and receives ``150000 + (850 * inflow) DIV 1000``. Integer
    sums are merge-order-independent, so the distributed aggregation is
    bit-exact — no float tolerance anywhere. Headroom: inflow sums stay
    below 2^63 until ~10^12 nodes; past that, move the scale to ppb⁻¹
    or aggregate as DECIMAL(38,0).

    Scale shape per round: one shuffle-hash join rank⋈edges on the node
    key + one hash agg on the destination key, both map-side-partial.
    ``edges``/``out_deg``/``nodes`` are computed once, cached, and
    reused by every round (at cluster scale: bucket the edge table by
    subj so the per-round join is co-partitioned and shuffle-free).
    The loop is driver-side but touches no data — Spark only sees a
    ``iterations``-deep plan; for deep runs, localCheckpoint every few
    rounds to cut lineage.
    """
    edges = kg_edges(triples)
    out_deg = edges.groupBy("subj").agg(F.count(F.lit(1)).alias("out_deg"))
    nodes = (edges.select(F.col("subj").alias("node"))
             .unionByName(edges.select(F.col("obj").alias("node")))
             .distinct())
    for df in (edges, out_deg, nodes):
        df.persist()
    ranks = nodes.withColumn("rank", F.lit(PPM).cast("long"))
    send = (edges.join(out_deg, "subj")
            .select("subj", "obj", "out_deg").persist())
    for _ in range(iterations):
        inflow = (
            send.join(ranks, send["subj"] == ranks["node"])
            .select(F.col("obj").alias("node"),
                    F.expr("rank DIV out_deg").alias("contrib"))
            .groupBy("node").agg(F.sum("contrib").alias("inflow")))
        ranks = nodes.join(inflow, "node", "left").select(
            "node",
            (F.lit(BASE_RANK)
             + F.expr(f"({DAMPING_PM} * coalesce(inflow, 0L)) DIV 1000")
             ).alias("rank"))
    return ranks


def personalized_pagerank_exact(triples: DataFrame, seeds: DataFrame,
                                iterations: int = 4) -> DataFrame:
    """Personalized PageRank / random-walk-with-restart [K: Haveliwala
    2002] over the KG edge table: restart mass returns ONLY to the
    ``seeds`` node set (one ``node`` column), so the fixed point ranks
    every node by its walk-proximity to the seed cluster — the standard
    KG entity-relatedness primitive (recommendation, query-biased
    importance) that global PageRank can't express.

    Same exact-BIGINT discipline as :func:`pagerank_exact`: rank0 =
    1 ppm-unit (1_000_000) on seeds and 0 elsewhere; each synchronous
    round every node receives ``is_seed * 150000 + (850 * inflow) DIV
    1000``. The restart is UNNORMALIZED (0.15 per seed, not 0.15/|S|) —
    a pure rescaling of the conventional RWR that keeps every operation
    in integer space; both engines share the definition, which is what
    the oracle pairing needs. Nodes the walk never reaches hold rank 0
    and are dropped, so the output is proportional to the seed-reachable
    region, not the node universe.

    Scale shape: identical to :func:`pagerank_exact` — per round one
    shuffle-hash join on the node key + one destination-keyed hash agg,
    both map-side-partial; the seed flag is folded into the persisted
    node table by ONE join before the loop (shuffle, not broadcast:
    seed sets like "every tool-using turn" grow with the corpus).
    """
    edges = kg_edges(triples)
    out_deg = edges.groupBy("subj").agg(F.count(F.lit(1)).alias("out_deg"))
    nodes = (edges.select(F.col("subj").alias("node"))
             .unionByName(edges.select(F.col("obj").alias("node")))
             .distinct())
    seed_nodes = (nodes.join(
        seeds.select("node").distinct().withColumn("_s", F.lit(1)),
        "node", "left")
        .select("node", F.coalesce(F.col("_s"), F.lit(0)).alias("is_seed")))
    send = edges.join(out_deg, "subj").select("subj", "obj", "out_deg")
    for df in (seed_nodes, send):
        df.persist()
    ranks = seed_nodes.select(
        "node", (F.col("is_seed").cast("long") * F.lit(PPM)).alias("rank"))
    for _ in range(iterations):
        inflow = (
            send.join(ranks, send["subj"] == ranks["node"])
            .select(F.col("obj").alias("node"),
                    F.expr("rank DIV out_deg").alias("contrib"))
            .groupBy("node").agg(F.sum("contrib").alias("inflow")))
        ranks = seed_nodes.join(inflow, "node", "left").select(
            "node",
            (F.col("is_seed").cast("long") * F.lit(BASE_RANK)
             + F.expr(f"({DAMPING_PM} * coalesce(inflow, 0L)) DIV 1000")
             ).alias("rank"))
    return ranks.filter(F.col("rank") > 0)


def concept_lift(mentions: DataFrame, min_pair: int = 2,
                 conv_col: str = "conv_id",
                 concept_col: str = "concept_id") -> DataFrame:
    """Concept-association strength from conversation-level
    co-occurrence: for every unordered concept pair (a < b) mentioned
    in the same conversation, emit support counts and the lift ratio
    P(a,b)/(P(a)P(b)) as an exact ppm integer
    ``(n_ab * n_convs * 1e6) DIV (n_a * n_b)`` — the monotone core of
    PMI (PMI = ln(lift)) without a cross-engine transcendental. Input:
    any (conversation, concept) mention table — pipeline triples
    filtered to pred='mentions', or the canonical-link output directly.

    Scale shape: the per-conversation distinct concept set is bounded
    by the ontology size, so the pair self-join is a conv-keyed
    equi-join with tiny per-key fan-out (never all-pairs across
    conversations); the three count aggs partial-aggregate map-side.
    The n_ab * n_convs product needs BIGINT headroom: exact up to
    ~3*10^12 co-occurring conversations at ppm scale.
    """
    conv_concepts = (mentions.select(F.col(conv_col).alias("conv_id"),
                                     F.col(concept_col).alias("concept"))
                     .distinct())
    n_convs = conv_concepts.select("conv_id").distinct().count()
    marg = conv_concepts.groupBy("concept").agg(
        F.count(F.lit(1)).alias("n_docs"))
    a = conv_concepts.select("conv_id", F.col("concept").alias("concept_a"))
    b = conv_concepts.select("conv_id", F.col("concept").alias("concept_b"))
    pairs = (a.join(b, "conv_id")
             .filter(F.col("concept_a") < F.col("concept_b"))
             .groupBy("concept_a", "concept_b")
             .agg(F.count(F.lit(1)).alias("n_ab"))
             .filter(F.col("n_ab") >= min_pair))
    ma = marg.select(F.col("concept").alias("concept_a"),
                     F.col("n_docs").alias("n_a"))
    mb = marg.select(F.col("concept").alias("concept_b"),
                     F.col("n_docs").alias("n_b"))
    return (pairs.join(ma, "concept_a").join(mb, "concept_b")
            .select("concept_a", "concept_b", "n_a", "n_b", "n_ab",
                    F.expr(f"(n_ab * {n_convs}L * {PPM}L) DIV (n_a * n_b)")
                    .alias("lift_ppm")))


def bgp_match(triples: DataFrame, patterns: list[tuple[str, str, str]],
              distinct: bool = True) -> DataFrame:
    """SPARQL-style basic-graph-pattern matching over the distributed
    triple table: each pattern is an (s, p, o) tuple whose elements are
    either constants or ``?var`` variables; the result has one column
    per variable, one row per binding — what rdflib answers with
    ``graph.query()`` on the reference's autotag graph [K], re-expressed
    as relational algebra so Catalyst plans it.

    Compilation: every pattern becomes a filtered projection of the
    triple table (constants → pushed-down equality filters, variables →
    renamed columns); patterns are folded left-to-right with natural
    joins on their shared variables (a pattern sharing no variable with
    the accumulated prefix is a deliberate error — cartesian BGPs are
    almost always query bugs and never scale). Catalyst then reorders /
    broadcast-selects the joins like any other multi-join query; a
    selective constant pattern (small after its filter) becomes the
    broadcast side automatically under AQE.
    """
    if not patterns:
        raise ValueError("empty basic graph pattern")

    def compile_one(idx: int, pat: tuple[str, str, str]) -> DataFrame:
        df = triples
        cols = []
        seen: dict[str, str] = {}
        for name, term in zip(("subj", "pred", "obj"), pat):
            if term.startswith("?"):
                var = term[1:]
                if var in seen:  # same var twice in one pattern
                    df = df.filter(F.col(name) == F.col(seen[var]))
                else:
                    seen[var] = name
                    cols.append(F.col(name).alias(var))
            else:
                df = df.filter(F.col(name) == term)
        if not cols:
            raise ValueError(f"pattern {idx} binds no variable: {pat}")
        return df.select(*cols)

    out = compile_one(0, patterns[0])
    for i, pat in enumerate(patterns[1:], start=1):
        nxt = compile_one(i, pat)
        shared = sorted(set(out.columns) & set(nxt.columns))
        if not shared:
            raise ValueError(
                f"pattern {i} {pat} shares no variable with the prefix "
                f"{sorted(out.columns)} — cartesian BGP refused")
        out = out.join(nxt, shared)
    return out.distinct() if distinct else out


def bounded_path(triples: DataFrame, pred: str,
                 max_depth: int = 3) -> DataFrame:
    """Bounded property-path closure ``pred{1,max_depth}`` (the SPARQL
    ``p+`` operator with an explicit depth cap): all (src, dst, depth)
    pairs connected by 1..max_depth consecutive ``pred`` edges, with
    ``depth`` the MINIMUM hop count (set-semantic union per level, then
    a min-agg — so diamond-shaped multi-path graphs still emit one row
    per pair).

    Iterative frontier expansion: level k+1 joins the level-k frontier
    with the (cached) edge table on the frontier's dst — k-1 shuffle
    joins total, each keyed on the join node. An UNBOUNDED closure at
    10^12 edges is a different algorithm (doubling joins — depth log
    rounds — or the connected-components machinery in dedup.py); the
    explicit cap is the point of this operator: path queries a KG
    consumer runs are depth-bounded.
    """
    if max_depth < 1:
        raise ValueError("max_depth must be >= 1")
    edges = (triples.filter(F.col("pred") == pred)
             .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
             .distinct().persist())
    frontier = edges.withColumn("depth", F.lit(1))
    levels = [frontier]
    for k in range(2, max_depth + 1):
        step = edges.select(F.col("src").alias("dst"),
                            F.col("dst").alias("nxt"))
        frontier = (frontier.join(step, "dst")
                    .select("src", F.col("nxt").alias("dst"),
                            F.lit(k).alias("depth")))
        levels.append(frontier)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return (out.groupBy("src", "dst")
            .agg(F.min("depth").alias("depth")))


def bgp_query(triples: DataFrame, patterns: list[tuple[str, str, str]],
              optional: list[list[tuple[str, str, str]]] | None = None,
              not_exists: list[list[tuple[str, str, str]]] | None = None,
              ) -> DataFrame:
    """``bgp_match`` extended with the other two workhorse SPARQL
    constructs: OPTIONAL groups (left join on shared variables — the
    group's variables stay NULL where it doesn't match) and
    FILTER NOT EXISTS groups (left-anti join — the group's variables
    are purely existential and never appear in the output). Each group
    is itself a BGP compiled by ``bgp_match`` and must share at least
    one variable with the mandatory pattern block.

    Relationally: OPTIONAL is exactly LEFT OUTER JOIN and NOT EXISTS is
    exactly ANTI JOIN, so Catalyst applies the same broadcast/shuffle
    strategy selection as for the mandatory block; a selective
    NOT EXISTS group (e.g. pred-filtered) broadcasts its build side.
    DISTINCT is applied once at the end (SPARQL set semantics over the
    final projection, matching SELECT DISTINCT over LEFT JOINs in SQL).
    """
    out = bgp_match(triples, patterns, distinct=False)

    def _group(grp, kind):
        sub = bgp_match(triples, grp, distinct=False)
        shared = sorted(set(out.columns) & set(sub.columns))
        if not shared:
            raise ValueError(
                f"{kind} group {grp} shares no variable with the "
                f"mandatory patterns {sorted(out.columns)}")
        return sub, shared

    for grp in (optional or []):
        sub, shared = _group(grp, "OPTIONAL")
        out = out.join(sub, shared, "left")
    for grp in (not_exists or []):
        sub, shared = _group(grp, "NOT EXISTS")
        out = out.join(sub.select(*shared), shared, "left_anti")
    return out.distinct()


NEG_POOL_CAP = 4_000_000  # concept pools must broadcast; beyond this, shard


def negative_samples(triples: DataFrame, n_neg: int = 2) -> DataFrame:
    """Deterministic corrupted-tail negative sampling for KG-embedding
    training (TransE-family): for every distinct (subj, obj) mention
    edge, emit ``n_neg`` negatives whose tail is drawn from the concept
    pool by an md5-keyed index — seedless and engine-replayable, like
    every sampler in this repo (no rand(): re-runs, resumes, and the
    DuckDB oracle all see identical rows).

    Draw j for edge (s, o): idx = int(md5(s|o|j)[:8hex]) mod P over the
    sorted concept pool; if the draw hits the true tail, take the next
    pool slot (cyclic) — so obj_neg != obj_pos whenever the pool has
    >= 2 concepts. Rejection-free (exactly n_neg rows per edge, no
    variable-length retry loops to skew partitions).

    Scale shape: the pool is ontology-sized → one row_number window on
    a tiny set + two BROADCAST joins (slot and next-slot lookups); the
    big side is one explode (xn_neg) of the edge table with no shuffle.
    The pool window is partitionless by construction, so its input is
    bounded plan-visibly (orderBy+limit NEG_POOL_CAP+1 → TakeOrdered)
    and a pool larger than the cap raises instead of silently funneling
    an unbounded concept set through one task.
    """
    from pyspark.sql import Window

    m = (triples.filter(F.col("pred") == "mentions")
         .select("subj", "obj").distinct())
    pool = (m.select(F.col("obj").alias("concept")).distinct()
            .orderBy("concept").limit(NEG_POOL_CAP + 1)
            .withColumn("idx", F.row_number().over(
                Window.orderBy("concept")) - 1))
    p = pool.count()
    if p > NEG_POOL_CAP:
        raise ValueError(
            f"negative sampling pool exceeds NEG_POOL_CAP={NEG_POOL_CAP}: "
            "the slot index must stay broadcast-able; shard the pool or "
            "raise the cap deliberately")
    if p < 2:
        raise ValueError("negative sampling needs >= 2 distinct concepts")
    e = m.withColumn("neg_idx", F.explode(
        F.sequence(F.lit(1), F.lit(n_neg))))
    h0 = F.conv(F.substring(F.md5(F.concat_ws(
        "|", "subj", "obj", F.col("neg_idx").cast("string"))), 1, 8),
        16, 10).cast("bigint") % p
    e = e.withColumn("h0", h0)
    p0 = pool.select(F.col("idx").alias("h0"),
                     F.col("concept").alias("c0"))
    p1 = pool.select(F.col("idx").alias("h1"),
                     F.col("concept").alias("c1"))
    return (e.join(F.broadcast(p0), "h0")
            .withColumn("h1", (F.col("h0") + 1) % p)
            .join(F.broadcast(p1), "h1")
            .select("subj", F.col("obj").alias("obj_pos"), "neg_idx",
                    F.when(F.col("c0") == F.col("obj"), F.col("c1"))
                    .otherwise(F.col("c0")).alias("obj_neg")))


def construct_triples(triples: DataFrame,
                      patterns: list[tuple[str, str, str]],
                      template: tuple[str, str, str]) -> DataFrame:
    """SPARQL CONSTRUCT: match a basic graph pattern, then materialize
    one NEW triple per binding from ``template`` (elements are
    constants or ``?var`` bound by the pattern) — rdflib's
    ``CONSTRUCT WHERE`` [K] as bgp_match + projection + set-semantics
    distinct. The derived edges land in the same (subj, pred, obj)
    shape, so they can be merged back into the graph with
    Storage.merge_triples / merge_snapshot."""
    bind = bgp_match(triples, patterns)
    cols = []
    for name, term in zip(("subj", "pred", "obj"), template):
        if term.startswith("?"):
            var = term[1:]
            if var not in bind.columns:
                raise ValueError(
                    f"template var ?{var} is not bound by the pattern")
            cols.append(F.col(var).alias(name))
        else:
            cols.append(F.lit(term).alias(name))
    return bind.select(*cols).distinct()


def validate_graph(triples: DataFrame, concepts: DataFrame,
                   ancestors: DataFrame | None = None) -> DataFrame:
    """SHACL-lite shape validation of the constructed KG — the QA gate
    a 10^12-triple graph needs before it is served. Output: one row per
    constraint, (constraint, violations). Constraints:

    - ``mentions_obj_in_ontology``: every mentions object is a known
      concept id (broadcast anti-join against the ontology —
      ontology-sized, map-side);
    - ``mentions_score_in_unit_range``: 0 < score <= 1;
    - ``uses_tool_obj_prefixed``: uses_tool objects carry ``tool:``;
    - ``replies_to_target_exists``: referential integrity — every
      replies_to object is some existing turn subject (anti-join of
      reply targets against distinct subjects; both sides shrink
      before the shuffle);
    - ``no_self_reply``: replies_to is irreflexive;
    - ``subj_wellformed``: subjects parse as ``turn:<conv>:<idx>``;
    - ``broader_edge_justified`` (only when ``ancestors`` is given —
      the (concept_id, anc_id) expansion from
      triples.ancestor_expansion): inference soundness — every
      ``mentions_broader`` edge (t, anc) must be derivable from some
      ASSERTED mention (t, c) with anc on c's path. Catches a broken
      or stale inference deploy.

    Scalar constraints fold into ONE conditional-aggregation pass over
    the triple table; only the membership/justification checks join."""
    scalar = triples.agg(
        F.sum(F.when((F.col("pred") == "mentions")
                     & ((F.col("score") <= 0) | (F.col("score") > 1)), 1)
              .otherwise(0)).alias("mentions_score_in_unit_range"),
        F.sum(F.when((F.col("pred") == "uses_tool")
                     & ~F.col("obj").startswith("tool:"), 1)
              .otherwise(0)).alias("uses_tool_obj_prefixed"),
        F.sum(F.when((F.col("pred") == "replies_to")
                     & (F.col("obj") == F.col("subj")), 1)
              .otherwise(0)).alias("no_self_reply"),
        F.sum(F.when(~F.col("subj").rlike("^turn:.+:[0-9]+$"), 1)
              .otherwise(0)).alias("subj_wellformed"),
    )
    unpivoted = scalar.unpivot([], scalar.columns, "constraint",
                               "violations")
    m = triples.filter(F.col("pred") == "mentions")
    bad_concept = (m.join(F.broadcast(concepts.select("concept_id")),
                          m.obj == F.col("concept_id"), "left_anti")
                   .agg(F.count(F.lit(1)).alias("violations"))
                   .select(F.lit("mentions_obj_in_ontology")
                           .alias("constraint"), "violations"))
    subjects = triples.select("subj").distinct()
    dangling = (triples.filter(F.col("pred") == "replies_to")
                .select(F.col("obj").alias("target")).distinct()
                .join(subjects, F.col("target") == F.col("subj"),
                      "left_anti")
                .agg(F.count(F.lit(1)).alias("violations"))
                .select(F.lit("replies_to_target_exists")
                        .alias("constraint"), "violations"))
    out = unpivoted.unionByName(bad_concept).unionByName(dangling)
    if ancestors is not None:
        justified = (m.join(F.broadcast(ancestors
                                        .select("concept_id", "anc_id")),
                            m.obj == F.col("concept_id"), "inner")
                     .select("subj", F.col("anc_id").alias("jobj"))
                     .distinct())
        mb = triples.filter(F.col("pred") == "mentions_broader")
        unjustified = (mb.join(justified,
                               (mb.subj == justified.subj)
                               & (mb.obj == F.col("jobj")), "left_anti")
                       .agg(F.count(F.lit(1)).alias("violations"))
                       .select(F.lit("broader_edge_justified")
                               .alias("constraint"), "violations"))
        out = out.unionByName(unjustified)
    return out


def clustering_coefficient(edges: DataFrame,
                           src: str = "src", dst: str = "dst") -> DataFrame:
    """Local clustering coefficient per vertex over an undirected simple
    graph given as (src, dst) pairs (any orientation, duplicates
    tolerated): cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)), the fraction of
    a vertex's neighbor pairs that are themselves connected — the
    standard local-density read on the concept co-occurrence graph
    (which concepts sit in tight co-mention cliques vs hub-and-spoke
    stars).

    EXACT-INTEGER: cc is emitted in ppm via BIGINT ``2·tri·1e6 DIV
    deg·(deg−1)`` — merge-order-independent and bit-identical across
    engines, like every other fixed-point metric in this module.

    Scale shape: triangle enumeration reuses
    ``agentstats.triangle_count`` (ordered 3-way equi-join, never a
    cross product); degrees are one map-side-partial hash agg over the
    canonicalized edge list traversed in both directions; the final
    combine is a broadcast-or-shuffle hash join on the vertex id. Zero
    driver-side data movement. Vertices of degree 1 appear with
    cc_ppm = 0 (undefined denominator pinned to 0 on both engines).
    """
    from .agentstats import triangle_count
    e = (edges
         .select(F.least(F.col(src), F.col(dst)).alias("a"),
                 F.greatest(F.col(src), F.col(dst)).alias("b"))
         .filter(F.col("a") < F.col("b"))
         .distinct())
    deg = (e.select(F.col("a").alias("node"))
           .unionAll(e.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("degree")))
    tri = triangle_count(e, src="a", dst="b")
    return (deg.join(tri, deg.node == tri.concept_id, "left")
            .select(F.col("node").alias("concept_id"),
                    "degree",
                    F.coalesce("n_triangles", F.lit(0).cast("long"))
                    .alias("n_triangles"),
                    F.when(F.col("degree") >= 2,
                           F.expr(f"2 * coalesce(n_triangles, 0)"
                                  f" * {PPM} DIV (degree * (degree - 1))"))
                    .otherwise(F.lit(0)).cast("long").alias("cc_ppm")))


def concept_jaccard(tags: DataFrame,
                    unit_cols: tuple = ("conv_id", "turn_idx"),
                    concept_col: str = "concept_id",
                    min_cooc: int = 1) -> DataFrame:
    """Concept-concept relatedness by co-occurrence Jaccard: for every
    pair of concepts that appear together in at least ``min_cooc``
    units (turns), |units(a) ∩ units(b)| / |units(a) ∪ units(b)| — the
    posting-list similarity behind "related concepts" panels and
    ontology-enrichment suggestions (which taxonomy nodes the corpus
    treats as near-synonyms even when the tree keeps them apart).

    EXACT-INTEGER: jaccard_ppm = ``n_ab·1e6 DIV (n_a + n_b − n_ab)``,
    BIGINT end to end.

    Scale shape: the candidate pairs come from a posting-list
    self-join keyed on the unit id (fanout bounded by the per-unit
    tag-set width squared, never corpus²), followed by one hash agg on
    the pair; the per-concept unit counts are a second hash agg whose
    output is ontology-sized, so both count joins broadcast. No
    windows, no cross products, nothing partitionless.
    """
    unit = F.concat_ws(
        ":", *[F.col(c).cast("string") for c in unit_cols])
    t = (tags.select(unit.alias("unit"),
                     F.col(concept_col).alias("concept_id"))
         .distinct())
    per_concept = t.groupBy("concept_id").agg(
        F.count(F.lit(1)).alias("n_units"))
    a, b = t.alias("a"), t.alias("b")
    pairs = (a.join(b, (F.col("a.unit") == F.col("b.unit"))
                    & (F.col("a.concept_id") < F.col("b.concept_id")))
             .groupBy(F.col("a.concept_id").alias("concept_a"),
                      F.col("b.concept_id").alias("concept_b"))
             .agg(F.count(F.lit(1)).alias("n_ab"))
             .filter(F.col("n_ab") >= min_cooc))
    ca = F.broadcast(per_concept.select(
        F.col("concept_id").alias("concept_a"),
        F.col("n_units").alias("n_a")))
    cb = F.broadcast(per_concept.select(
        F.col("concept_id").alias("concept_b"),
        F.col("n_units").alias("n_b")))
    return (pairs.join(ca, "concept_a").join(cb, "concept_b")
            .select("concept_a", "concept_b", "n_a", "n_b", "n_ab",
                    F.expr(f"n_ab * {PPM} DIV (n_a + n_b - n_ab)")
                    .cast("long").alias("jaccard_ppm")))


def resnik_mics(tags: DataFrame, ancestors: DataFrame,
                unit_cols: tuple = ("conv_id", "turn_idx"),
                concept_col: str = "concept_id") -> DataFrame:
    """Resnik-style semantic similarity over the taxonomy with
    corpus-derived information content: for every co-occurring concept
    pair, the Most Informative Common Subsumer (MICS) — the shared
    ancestor-or-self with the SMALLEST corpus tag mass, i.e. highest
    information content IC(c) = −log p(c). The log is monotone in the
    mass, so the operator emits the mass itself and ``p_mics_ppm`` in
    exact fixed point instead of a float log — rank-equivalent to
    Resnik similarity (lower p_mics_ppm = more similar) and
    bit-identical across engines, following this module's
    integer-math convention.

    ``ancestors`` is the strict-ancestor closure (concept_id, anc_id);
    self-rows are added internally so every pair has at least the
    pair's own nodes' shared subsumers up to the root. Corpus mass of
    a subsumer = number of tag events (unit × concept) whose concept
    is a descendant-or-self — computed by one broadcast join of the
    tag stream against the ontology-sized closure plus one hash agg.
    Pair domain = concepts co-tagged in a unit (posting-list
    self-join, same shape as concept_jaccard). MICS selection is a
    row_number window PARTITIONED BY the pair — per-pair subsumer
    count is bounded by tree depth², never by corpus size. Tie-break:
    (mass ASC, anc_id ASC), fully deterministic.
    """
    closure = (ancestors.select("concept_id", "anc_id")
               .unionByName(
                   ancestors.select("concept_id")
                   .unionByName(ancestors.select(
                       F.col("anc_id").alias("concept_id")))
                   .distinct()
                   .select("concept_id",
                           F.col("concept_id").alias("anc_id")))
               .distinct())
    unit = F.concat_ws(
        ":", *[F.col(c).cast("string") for c in unit_cols])
    t = (tags.select(unit.alias("unit"),
                     F.col(concept_col).alias("concept_id"))
         .distinct())
    # total tag mass as a lazy 1-row aggregate broadcast into the final
    # projection — no eager driver action, the whole operator stays one
    # job graph.
    total = t.agg(F.count(F.lit(1)).alias("total_mass"))
    mass = (t.join(F.broadcast(closure), "concept_id")
            .groupBy("anc_id").agg(F.count(F.lit(1)).alias("mass")))
    a, b = t.alias("a"), t.alias("b")
    pairs = (a.join(b, (F.col("a.unit") == F.col("b.unit"))
                    & (F.col("a.concept_id") < F.col("b.concept_id")))
             .select(F.col("a.concept_id").alias("concept_a"),
                     F.col("b.concept_id").alias("concept_b"))
             .distinct())
    clo_a = F.broadcast(closure.select(
        F.col("concept_id").alias("concept_a"), "anc_id"))
    clo_b = F.broadcast(closure.select(
        F.col("concept_id").alias("concept_b"), "anc_id"))
    common = (pairs.join(clo_a, "concept_a").join(clo_b, ["concept_b", "anc_id"])
              .join(F.broadcast(mass), "anc_id"))
    w = Window.partitionBy("concept_a", "concept_b").orderBy(
        F.col("mass").asc(), F.col("anc_id").asc())
    return (common.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .crossJoin(F.broadcast(total))
            .select("concept_a", "concept_b",
                    F.col("anc_id").alias("mics_id"),
                    F.col("mass").alias("mics_mass"),
                    F.expr(f"mass * {PPM} DIV total_mass")
                    .cast("long").alias("p_mics_ppm")))


def kcore_peel(triples: DataFrame, k: int = 2, rounds: int = 6) -> DataFrame:
    """Bounded-round k-core decomposition of the KG by synchronous
    peeling: treat the triple table as an undirected graph, and each
    round delete every node whose degree within the surviving subgraph
    is below ``k``; after ``rounds`` rounds, return the survivors with
    their within-core degree. The k-core is the standard density
    skeleton (a maximal subgraph where every node keeps ≥ k neighbors)
    — the KG-health read that separates the connected conceptual core
    from pendant turns and one-off tool calls.

    Synchronous peeling is deterministic and monotone (the alive set
    only shrinks), so a bounded unrolling is exact as soon as two
    consecutive rounds agree — pytest pins fixpoint-within-``rounds``
    on the test corpora, and the DuckDB oracle replays the identical
    unrolled rounds, so the pairing never depends on convergence.

    Scale shape per round: the undirected adjacency (built once,
    persisted) is filtered to surviving endpoints with two keyed
    hash joins against the alive set, then one map-side-partial count
    per node — all shuffles keyed on node ids, no windows, no
    broadcast of anything that grows with the graph. The alive set is
    localCheckpoint()ed every round to keep lineage flat. On a real
    cluster, bucket the adjacency by src so the per-round join is
    co-partitioned and shuffle-free.
    """
    und = kg_edges(triples)
    adj = (und.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
           .unionByName(
               und.select(F.col("obj").alias("src"),
                          F.col("subj").alias("dst")))
           .distinct()
           .persist())
    alive = adj.select(F.col("src").alias("node")).distinct()
    deg = None
    for _ in range(rounds):
        alive_edges = (adj
                       .join(alive.withColumnRenamed("node", "src"), "src")
                       .join(alive.withColumnRenamed("node", "dst"), "dst"))
        deg = (alive_edges.groupBy("src")
               .agg(F.count(F.lit(1)).alias("deg")))
        alive = (deg.where(F.col("deg") >= k)
                 .select(F.col("src").alias("node"))
                 .localCheckpoint(eager=False))
    return (deg.where(F.col("deg") >= k)
            .select(F.col("src").alias("node"),
                    F.col("deg").cast("long").alias("core_deg")))


def lin_jc(tags: DataFrame, ancestors: DataFrame,
           unit_cols: tuple = ("conv_id", "turn_idx"),
           concept_col: str = "concept_id") -> DataFrame:
    """Lin similarity and Jiang–Conrath distance for co-tagged concept
    pairs — the two IC-normalized members of the Resnik family the
    ontology-similarity literature pairs with Wu-Palmer [K]. Where
    ``resnik_mics`` stays rank-equivalent in exact integers, these two
    genuinely need the log: lin = 2·IC(mics) / (IC(a) + IC(b)) and
    jc_dist = IC(a) + IC(b) − 2·IC(mics), with IC(x) = ln(total_mass)
    − ln(mass_x) over the same descendant-or-self corpus masses. Floats
    follow the repo's cross-engine convention (one ln per mass, then
    elementwise arithmetic, round(x, 6) + 0.0 — the tfidf/bm25-accepted
    ulp class).

    Plan shape = ``resnik_mics`` (posting-list pair self-join, ontology
    -sized broadcast closure, per-pair bounded window) plus two extra
    BROADCAST joins of the ontology-sized mass table onto the pair
    endpoints — nothing new shuffles. ``lin_sim`` is NULL when
    IC(a) + IC(b) = 0 (both endpoints carry the whole corpus mass, so
    similarity is undefined); jc_dist is always defined.
    """
    mics = resnik_mics(tags, ancestors, unit_cols, concept_col)
    closure = (ancestors.select("concept_id", "anc_id")
               .unionByName(
                   ancestors.select("concept_id")
                   .unionByName(ancestors.select(
                       F.col("anc_id").alias("concept_id")))
                   .distinct()
                   .select("concept_id",
                           F.col("concept_id").alias("anc_id")))
               .distinct())
    unit = F.concat_ws(
        ":", *[F.col(c).cast("string") for c in unit_cols])
    t = (tags.select(unit.alias("unit"),
                     F.col(concept_col).alias("concept_id"))
         .distinct())
    total = t.agg(F.count(F.lit(1)).alias("total_mass"))
    mass = (t.join(F.broadcast(closure), "concept_id")
            .groupBy("anc_id").agg(F.count(F.lit(1)).alias("mass")))
    mass_a = F.broadcast(mass.select(F.col("anc_id").alias("concept_a"),
                                     F.col("mass").alias("mass_a")))
    mass_b = F.broadcast(mass.select(F.col("anc_id").alias("concept_b"),
                                     F.col("mass").alias("mass_b")))
    ic = (mics.join(mass_a, "concept_a").join(mass_b, "concept_b")
          .crossJoin(F.broadcast(total))
          .withColumn("ic_a", F.log(F.col("total_mass"))
                      - F.log(F.col("mass_a")))
          .withColumn("ic_b", F.log(F.col("total_mass"))
                      - F.log(F.col("mass_b")))
          .withColumn("ic_m", F.log(F.col("total_mass"))
                      - F.log(F.col("mics_mass"))))
    return ic.select(
        "concept_a", "concept_b", "mics_id",
        F.when(F.col("ic_a") + F.col("ic_b") > 0,
               F.round(2 * F.col("ic_m") / (F.col("ic_a") + F.col("ic_b")),
                       6) + 0.0).alias("lin_sim"),
        (F.round(F.col("ic_a") + F.col("ic_b") - 2 * F.col("ic_m"), 6)
         + 0.0).alias("jc_dist"))


def hits_exact(triples: DataFrame, iterations: int = 2) -> DataFrame:
    """HITS hubs/authorities over the KG edge table — ``iterations``
    synchronous rounds of the Kleinberg mutual-reinforcement update,
    L1-normalized each half-step so scores stay in ppm fixed point.
    In the heterogeneous KG the split is semantically real: turns are
    the only nodes with out-edges (hubs — conversational loci that
    point at many concepts/tools), while concepts/tools/parent turns
    collect in-links (authorities).

    Arithmetic is pure BIGINT (this module's convention): hubs start at
    1_000_000; each round auth_raw(n) = Σ hub over in-edges, then
    auth(n) = auth_raw · PPM DIV Σ auth_raw, and symmetrically for
    hubs — integer sums are merge-order-independent, so the distributed
    aggregation is bit-exact against DuckDB's unrolled replay.
    Headroom: auth_raw · PPM ≤ PPM² · max_in_degree, so 10⁶-degree hubs
    fit in int64; past that, aggregate as DECIMAL(38,0).

    Scale shape per round: two shuffle-hash joins edges⋈scores on the
    node key + two hash aggs + one scalar-sum broadcast each — no
    windows, nothing driver-side. ``edges``/``nodes`` are computed once
    and persisted; at cluster scale bucket the edge table by subj/obj
    so the per-round joins co-partition.
    """
    # localCheckpoint (eager), not persist: each half-step references
    # edges + nodes + the previous half's frame, so with lazy lineage
    # the logical plan re-embeds the full upstream pipeline tree
    # exponentially in the iteration count — the DRIVER dies
    # stringifying the plan long before an executor runs it.
    # Checkpointing cuts the lineage at every round boundary, keeping
    # every plan O(1); on a real cluster swap in reliable
    # checkpoint() so a lost executor can rebuild the round state.
    edges = kg_edges(triples).localCheckpoint(eager=True)
    nodes = (edges.select(F.col("subj").alias("node"))
             .unionByName(edges.select(F.col("obj").alias("node")))
             .distinct().localCheckpoint(eager=True))
    hub = nodes.withColumn("score", F.lit(PPM).cast("long"))
    auth = None

    def _half(scores: DataFrame, src: str, dst: str) -> DataFrame:
        # raw feeds BOTH the scalar total and the normalization join;
        # checkpointing the node-sized intermediate computes it once.
        raw = (edges.join(scores, edges[src] == scores["node"])
               .select(F.col(dst).alias("node"), "score")
               .groupBy("node").agg(F.sum("score").alias("raw"))
               .localCheckpoint(eager=True))
        tot = raw.agg(F.sum("raw").alias("tot"))
        return (nodes.join(raw, "node", "left")
                .crossJoin(F.broadcast(tot))
                .select("node",
                        F.expr(f"coalesce(raw, 0L) * {PPM} DIV tot")
                        .cast("long").alias("score"))
                .localCheckpoint(eager=True))

    for _ in range(iterations):
        auth = _half(hub, "subj", "obj")
        hub = _half(auth, "obj", "subj")
    return (nodes
            .join(auth.withColumnRenamed("score", "auth_ppm"), "node")
            .join(hub.withColumnRenamed("score", "hub_ppm"), "node")
            .select("node", F.col("auth_ppm").cast("long").alias("auth_ppm"),
                    F.col("hub_ppm").cast("long").alias("hub_ppm")))


def undirected_edges(triples: DataFrame) -> DataFrame:
    """Symmetrized KG edge set (src, dst) — each directed subj→obj
    edge plus its reverse, distinct. The traversal primitives below
    (BFS, label propagation) read connectivity, not direction."""
    e = kg_edges(triples)
    return (e.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
            .unionByName(
                e.select(F.col("obj").alias("src"),
                         F.col("subj").alias("dst")))
            .distinct())


def bfs_depths(triples: DataFrame, seeds: DataFrame,
               max_hops: int = 3) -> DataFrame:
    """Bounded multi-source BFS over the undirected KG: minimum hop
    distance from any seed node, capped at ``max_hops``. ``seeds`` is
    a one-column (node) DataFrame; seeds themselves report depth 0
    whether or not they touch an edge.

    Level-synchronous frontier expansion: each hop is one equi-join
    frontier⋈edges + a distinct + an anti-join against the visited
    set — no windows, no driver-side data. Because expansion is
    breadth-first and the anti-join blocks re-discovery, the FIRST
    depth a node is found at IS its minimum distance; DuckDB's
    recursive-CTE oracle re-derives the same thing as min(depth) over
    a depth-bounded recursion. Eager localCheckpoint per level cuts
    the iterative lineage (same driver-OOM class hits_exact
    documents). One take(1) action per hop for early exit — bounded
    by max_hops, the connected_components convergence-probe
    convention. At cluster scale bucket the edge table by src so the
    per-hop join co-partitions.
    """
    edges = undirected_edges(triples).localCheckpoint(eager=True)
    visited = (seeds.select("node").distinct()
               .withColumn("depth", F.lit(0).cast("long"))
               .localCheckpoint(eager=True))
    frontier = visited.select("node")
    for hop in range(1, max_hops + 1):
        nxt = (edges.join(frontier.withColumnRenamed("node", "src"), "src")
               .select(F.col("dst").alias("node")).distinct()
               .join(visited.select("node"), "node", "left_anti")
               .withColumn("depth", F.lit(hop).cast("long"))
               .localCheckpoint(eager=True))
        if not nxt.take(1):
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return visited


def label_propagation(triples: DataFrame, rounds: int = 2) -> DataFrame:
    """Synchronous label-propagation community detection over the
    undirected KG: every node starts labeled with its own id; each
    round relabels every node with the most frequent label among its
    neighbors (ties broken by lexicographically smallest label;
    isolated nodes keep their current label). Deterministic by
    construction — count argmax + total tie order — so the bounded
    unrolled rounds are exactly replayable by the DuckDB oracle.

    Per round: one edges⋈labels equi-join, one (node, lab) hash agg,
    one per-node bounded window (partitioned by node — neighbor-label
    cardinality per node is bounded by degree), one left join back to
    the node spine. Eager localCheckpoint cuts per-round lineage.
    """
    edges = undirected_edges(triples).localCheckpoint(eager=True)
    nodes = (edges.select(F.col("src").alias("node")).distinct()
             .localCheckpoint(eager=True))
    labels = nodes.withColumn("lab", F.col("node"))
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("lab"))
    for _ in range(rounds):
        nbr = (edges.join(labels.withColumnRenamed("node", "src"), "src")
               .groupBy(F.col("dst").alias("node"), "lab")
               .agg(F.count(F.lit(1)).alias("c")))
        top = (nbr.withColumn("rk", F.row_number().over(w))
               .filter(F.col("rk") == 1)
               .select("node", F.col("lab").alias("new_lab")))
        labels = (labels.join(top, "node", "left")
                  .select("node",
                          F.coalesce("new_lab", "lab").alias("lab"))
                  .localCheckpoint(eager=True))
    return labels.select("node", F.col("lab").alias("community"))


def weighted_edges(triples: DataFrame,
                   pred_weights: dict[str, int]) -> DataFrame:
    """Symmetrized integer-weighted edge set (src, dst, w) from the KG
    triple table: each predicate carries a fixed integer cost from
    ``pred_weights`` (predicates absent from the map are dropped), the
    reverse edge costs the same, and parallel edges between a node
    pair collapse to the cheapest predicate (min — deterministic).
    Map-side projection + one keyed agg; no windows."""
    w = F.lit(None).cast("long")
    for pred, cost in sorted(pred_weights.items()):
        w = F.when(F.col("pred") == pred, F.lit(int(cost)).cast("long")) \
             .otherwise(w)
    e = (triples.select(F.col("subj").alias("src"),
                        F.col("obj").alias("dst"), w.alias("w"))
         .filter(F.col("w").isNotNull()))
    return (e.unionByName(e.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst"), "w"))
            .groupBy("src", "dst").agg(F.min("w").alias("w")))


def shortest_paths(triples: DataFrame, seeds: DataFrame,
                   pred_weights: dict[str, int],
                   rounds: int = 3) -> DataFrame:
    """Bounded multi-source weighted shortest paths (Bellman-Ford,
    ``rounds`` synchronous relaxation rounds) over the symmetrized
    integer-weighted KG: dist(node) = min total edge cost from any
    seed over paths of at most ``rounds`` edges. ``seeds`` is a
    one-column (node) DataFrame; unreached nodes are absent.

    Per round: one dist⋈edges equi-join on src, one union with the
    incumbent distances, one (node) min-agg — all keyed shuffles that
    partition by node/src at any scale (bucket the edge table by src
    on a real cluster and every round co-partitions). Integer weights
    make min() merge-order-free, so the bounded unrolled recursion is
    exactly replayable by a depth-bounded recursive-CTE oracle. Eager
    localCheckpoint per round cuts the iterative lineage (the same
    driver-OOM class bfs_depths documents). Unlike bfs_depths there is
    no early-exit action: a later round can still IMPROVE a known
    distance (cheap long detour), so all ``rounds`` run."""
    edges = weighted_edges(triples, pred_weights).localCheckpoint(eager=True)
    dist = (seeds.select("node").distinct()
            .withColumn("dist", F.lit(0).cast("long"))
            .localCheckpoint(eager=True))
    for _ in range(rounds):
        relaxed = (edges.join(dist.withColumnRenamed("node", "src"), "src")
                   .select(F.col("dst").alias("node"),
                           (F.col("dist") + F.col("w")).alias("dist")))
        dist = (dist.unionByName(relaxed)
                .groupBy("node").agg(F.min("dist").alias("dist"))
                .localCheckpoint(eager=True))
    return dist


def describe_cbd(triples: DataFrame, node: str) -> DataFrame:
    """SPARQL DESCRIBE — concise bounded description of ``node``:
    (a) every triple incident to the node in either role, plus (b) the
    'mentions' attribute triples of adjacent TURN nodes (turns act as
    the anonymous intermediates of this graph, the role blank nodes
    play in rdflib's CBD [K]). Output (subj, pred, obj, via) with via
    in {'incident', 'neighbor'}. Two pushed-down filters of the triple
    table + one semi-join — no traversal state, no windows."""
    n = F.lit(node)
    incident = (triples
                .filter((F.col("subj") == n) | (F.col("obj") == n))
                .select("subj", "pred", "obj",
                        F.lit("incident").alias("via")))
    nbr_turns = (triples
                 .filter((F.col("obj") == n)
                         & F.col("subj").startswith("turn:"))
                 .select(F.col("subj").alias("nbr")).distinct())
    attrs = (triples.join(nbr_turns, triples.subj == nbr_turns.nbr)
             .filter((F.col("pred") == "mentions") & (F.col("obj") != n))
             .select("subj", "pred", "obj",
                     F.lit("neighbor").alias("via")))
    return incident.unionByName(attrs).distinct()


def cooccurrence_edges(mentions: DataFrame, min_convs: int = 2) -> DataFrame:
    """Concept co-occurrence projection of the conversation-concept
    bipartite graph: an undirected edge (src, dst) for every concept
    pair mentioned together in >= ``min_convs`` distinct conversations.

    This is the distributed half of closeness centrality: the
    conv-level distinct + the within-conversation pair self-join do
    the 100-TB work (the self-join is keyed on conv_id, so each
    conversation's concept set — gazetteer-bounded, tens of rows — is
    the task unit), and the output projection is ontology-sized.
    Both orientations are emitted so BFS can treat it as undirected.
    """
    cm = mentions.select("conv_id", "concept_id").distinct()
    a = cm.alias("a")
    b = cm.alias("b")
    return (a.join(b, "conv_id")
            .filter(F.col("a.concept_id") != F.col("b.concept_id"))
            .groupBy(F.col("a.concept_id").alias("src"),
                     F.col("b.concept_id").alias("dst"))
            .agg(F.count(F.lit(1)).alias("n_convs"))
            .filter(F.col("n_convs") >= min_convs)
            .select("src", "dst"))


def closeness_centrality(edges: DataFrame, max_hops: int = 4) -> DataFrame:
    """Bounded-hop closeness + harmonic centrality over an undirected
    edge list (both orientations present): per node, the count of
    nodes reachable within ``max_hops``, the sum of their minimum
    distances, classic closeness (n_reach-1)/sum_dist and harmonic
    centrality sum(1/d) — both as exact-integer ppm (integer division,
    merge-order-independent).

    All-pairs level-synchronous BFS keyed by source: ``dist`` holds
    (src, node, depth); each hop joins the frontier to the edge table
    and anti-joins the visited set per source, so the first depth a
    (src, node) pair appears at is its minimum distance — the same
    min-over-bounded-recursion DuckDB's recursive-CTE oracle computes.
    Intended for projection graphs (ontology-sized node sets) produced
    by distributed aggregation such as ``cooccurrence_edges``; the
    per-hop joins are plain equi-joins, so the same code runs at any
    scale — bucket the edge table by src on a real cluster.
    localCheckpoint per hop cuts iterative lineage (the hits_exact
    convention)."""
    edges = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    visited = (nodes.select(F.col("node").alias("bfs_src"),
                            F.col("node"))
               .withColumn("depth", F.lit(0).cast("long"))
               .localCheckpoint(eager=True))
    frontier = visited.select("bfs_src", "node")
    for hop in range(1, max_hops + 1):
        nxt = (frontier.join(edges,
                             frontier.node == edges.src, "inner")
               .select("bfs_src", F.col("dst").alias("node")).distinct()
               .join(visited.select("bfs_src", "node"),
                     ["bfs_src", "node"], "left_anti")
               .withColumn("depth", F.lit(hop).cast("long"))
               .localCheckpoint(eager=True))
        if not nxt.take(1):
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("bfs_src", "node")
    reached = visited.filter(F.col("depth") > 0)
    per = (reached.groupBy(F.col("bfs_src").alias("node"))
           .agg(F.count(F.lit(1)).alias("n_reach"),
                F.sum("depth").alias("sum_dist"),
                F.sum(F.expr(f"CAST({PPM} AS BIGINT) DIV depth"))
                .alias("harmonic_ppm")))
    return (nodes.join(per, "node", "left")
            .select("node",
                    F.coalesce("n_reach", F.lit(0)).cast("long")
                    .alias("n_reach"),
                    F.coalesce("sum_dist", F.lit(0)).cast("long")
                    .alias("sum_dist"),
                    F.when(F.coalesce("sum_dist", F.lit(0)) > 0,
                           F.expr(f"(n_reach * CAST({PPM} AS BIGINT))"
                                  " DIV sum_dist"))
                    .otherwise(F.lit(0)).cast("long").alias("closeness_ppm"),
                    F.coalesce("harmonic_ppm", F.lit(0)).cast("long")
                    .alias("harmonic_ppm")))


def transitive_reduction(edges: DataFrame,
                         src_col: str = "src",
                         dst_col: str = "dst") -> DataFrame:
    """Transitive reduction of a DAG edge list: drop every edge (a, c)
    for which a 2-step witness a→b→c exists — on a transitively CLOSED
    input this yields the unique minimal (Hasse) edge set, the inverse
    of the closure materialization in triples.ancestor_expansion. One
    self-join keyed on the middle node + one left-anti join keyed on
    the edge — no iteration needed for closed inputs, because any
    redundant edge in a closure always has a direct 2-step witness.
    Cycles would make the reduction non-unique; callers own acyclicity
    (the SHACL-lite validator's irreflexivity check is the guard)."""
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst"))
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    witnessed = (ab.join(bc, "b")
                 .select(F.col("a").alias("src"), F.col("c").alias("dst"))
                 .distinct())
    return (e.join(witnessed, ["src", "dst"], "left_anti")
            .select(F.col("src").alias(src_col),
                    F.col("dst").alias(dst_col)))


def edge_triangle_support(triples: DataFrame) -> DataFrame:
    """Per-edge triangle support over the simple undirected KG graph —
    the k-truss primitive [K: Cohen's trusses; support(u,v) =
    |N(u) ∩ N(v)|, and an edge can sit in the k-truss only if
    support >= k-2, so the one-shot support table IS the first peel
    round and the standard dense-subgraph signal KG QA reads (a
    mention edge with no triangle support is an isolated assertion;
    high-support edges anchor concept communities)].

    Output: one row per canonical (src < dst) undirected edge with its
    exact support plus the k=3 / k=4 pre-peel membership flags.

    Shape: symmetrize + self-loop-drop the deduped edge set, then the
    standard distributed wedge closure — canonical edges equi-joined
    to the adjacency on BOTH endpoints with the common-neighbor key
    matched, one (src, dst) hash agg, and a left join back so
    zero-support edges keep their row. No windows, no driver state.
    At 100 TB: bucket the adjacency by src so both wedge joins
    co-partition, and orient wedges from the lower-degree endpoint
    (degree ordering) to bound the per-task wedge count on hub nodes.
    """
    und = (undirected_edges(triples)
           .filter(F.col("src") != F.col("dst")))
    canon = und.filter(F.col("src") < F.col("dst"))
    sup = (canon.alias("e")
           .join(und.alias("a"), F.col("e.src") == F.col("a.src"))
           .join(und.alias("b"), (F.col("e.dst") == F.col("b.src"))
                 & (F.col("a.dst") == F.col("b.dst")))
           .groupBy(F.col("e.src").alias("src"),
                    F.col("e.dst").alias("dst"))
           .agg(F.count(F.lit(1)).cast("long").alias("support")))
    return (canon.join(sup, ["src", "dst"], "left")
            .select("src", "dst",
                    F.coalesce("support", F.lit(0)).cast("long")
                    .alias("support"))
            .withColumn("in_truss3",
                        (F.col("support") >= 1).cast("int"))
            .withColumn("in_truss4",
                        (F.col("support") >= 2).cast("int")))
