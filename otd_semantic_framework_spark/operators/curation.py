"""Corpus-curation operators for training-data pipelines: TF-IDF term
scoring, deterministic stratified sampling, and dedup-aware keep-best
selection.

All three are pure declarative DataFrame algebra (no UDFs): Catalyst
gets full pushdown/pruning, every aggregation partial-aggregates
map-side, and every output is deterministic (hash-based ordering, no
``rand()``), so re-runs and resume produce identical bytes — the same
property the KG pipeline's xxhash64 ids provide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import semantics as S


def _toks(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.filter(F.split(F.col(text_col), " "),
                           lambda t: t != "")).alias("tok"))


def tfidf_top_terms(docs: DataFrame, k: int = 3, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Top-k TF-IDF terms per document: tf = term count / doc length,
    idf = ln(N / doc-frequency), both exact. Output
    (doc_id, tok, tfidf, rk).

    Scale shape: two hash aggregations (term counts, doc frequencies) —
    both partial-aggregate map-side — a broadcast-small df join side
    only when the vocabulary is bounded, and a per-doc window for the
    top-k (keyed by doc_id: high cardinality, no skewed partitions).
    N comes from a driver-side count (one cheap metadata-friendly job),
    keeping idf a literal so Catalyst constant-folds it.
    """
    toks = _toks(docs, id_col, text_col)
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf_raw"))
    dlen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dlen"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = float(docs.count())
    scored = (
        tf.join(dlen, "doc_id").join(dfreq, "tok")
        .withColumn("tfidf", F.round(
            (F.col("tf_raw") / F.col("dlen"))
            * F.log(F.lit(n_docs) / F.col("df")), S.SCORE_DECIMALS)))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("doc_id", "tok", "tfidf", "rk"))


def _sample_key(id_col: str, text_col: str):
    # text is coalesced to '' explicitly: concat_ws would silently SKIP
    # a NULL text (key degrades to just the id) while `||` in a SQL
    # oracle nulls the whole key — coalescing on both engines keeps the
    # 'identical rows on every engine' guarantee on NULL-text corpora.
    return F.md5(F.concat_ws(":", F.col(id_col).cast("string"),
                             F.coalesce(F.col(text_col), F.lit(""))))


# Above this many strata/domains the samplers switch from a driver dict
# + create_map literal (fast, but driver memory and a megabyte-scale
# plan literal at high cardinality) to a broadcast-joined bounds
# DataFrame that never leaves the cluster (VERDICT r3 item 5). Both
# mechanisms are bit-identical on the same input (pytest-pinned).
STRATA_LITERAL_MAX = 10_000

_PRUNE_SPACE = float(2 ** 32)


def _prune_bounds_caps(counts: DataFrame, strata_col: str,
                       prune_factor: float) -> DataFrame:
    """(strata_col, _n, _cap) -> (strata_col, _bound, _need): the same
    IEEE math as the literal path, expressed column-wise — space when a
    stratum already fits prune_factor*cap, else the keep-fraction of
    the 2^32 md5-prefix key space; need = min(cap, n)."""
    pf = F.lit(float(prune_factor))
    n_d = F.col("_n").cast("double")
    cap_d = F.col("_cap").cast("double")
    return counts.select(
        strata_col,
        F.when(n_d <= pf * cap_d, F.lit(_PRUNE_SPACE))
        .otherwise(pf * cap_d / n_d * F.lit(_PRUNE_SPACE)).alias("_bound"),
        F.least(F.col("_cap"), F.col("_n")).cast("long").alias("_need"))


def _prune_with_bounds_join(pruned: DataFrame, strata_col: str,
                            caps: DataFrame,
                            prune_factor: float) -> DataFrame:
    """Join-based verify-and-widen pre-prune: no per-stratum driver
    state. ``pruned`` carries ``_u`` (uniform md5-prefix draw); ``caps``
    is (strata_col, _n, _cap). The bounds table is |strata| rows —
    broadcast both in the shortfall check and the final filter; widening
    re-checkpoints the tiny bounds table so the (vanishingly rare) loop
    never grows lineage over the corpus."""
    bounds = _prune_bounds_caps(caps, strata_col, prune_factor)
    for _ in range(64):
        short = (pruned.join(F.broadcast(bounds), strata_col)
                 .groupBy(strata_col, "_need")
                 .agg(F.sum((F.col("_u") < F.col("_bound")).cast("long"))
                      .alias("_kept"))
                 .filter(F.col("_kept") < F.col("_need"))
                 .select(strata_col).withColumn("_short", F.lit(1)))
        if short.isEmpty():
            break
        bounds = (bounds.join(short, strata_col, "left")
                  .select(strata_col,
                          F.when(F.col("_short") == 1,
                                 F.least(F.lit(_PRUNE_SPACE),
                                         F.col("_bound") * 4.0))
                          .otherwise(F.col("_bound")).alias("_bound"),
                          "_need")
                  .localCheckpoint(eager=True))
    else:
        raise RuntimeError(
            "sampling pre-prune failed to cover every stratum after 64 "
            "widening rounds — md5 prefix draws are catastrophically "
            "non-uniform, refusing to return a silently short sample")
    return (pruned.join(F.broadcast(bounds.select(strata_col, "_bound")),
                        strata_col)
            .filter(F.col("_u") < F.col("_bound"))
            .drop("_bound"))


def stratified_sample(docs: DataFrame, strata_col: str, k: int,
                      id_col: str = "doc_id",
                      text_col: str = "text",
                      prune: bool = True,
                      prune_factor: float = 3.0,
                      bounds_mechanism: str = "auto") -> DataFrame:
    """Deterministic per-stratum sample of exactly min(k, |stratum|)
    rows: rank by md5(id:text) inside each stratum, keep the first k.
    Engine-portable (md5 exists everywhere) and seedless — re-runs and
    different engines select the identical rows, unlike ``rand(seed)``
    whose stream is engine- and partitioning-specific.

    Output (doc_id, stratum, rk).

    Scale shape (``prune=True``, the default): the per-stratum window
    shuffles by the stratum key, which is low-cardinality and
    potentially skewed — at 10^12 rows a hot stratum would funnel
    10^12/|strata| rows through one partition. So rows are pre-pruned
    MAP-SIDE before the window: the first 8 hex chars of the md5 rank
    key give a uniform u in [0, 2^32), and only rows with
    u < bound(stratum) survive, where bound is sized to keep
    ~prune_factor * k rows. The kept set is a prefix of the key ORDER
    (the 8-char prefix dominates the lexicographic md5 ordering), so as
    long as a stratum keeps >= min(k, |stratum|) rows the top-k is
    EXACTLY the unpruned top-k — not approximately. That survivor count
    is verified by a cheap conditional-count aggregation (map-side
    partial agg, one tiny row per stratum); any stratum whose bound
    proved too tight (astronomically unlikely at factor 3, but hash
    uniformity is probabilistic) is widened 4x and re-verified, so the
    result is GUARANTEED hash-identical for prune in {off, on}
    (pytest-pinned, tests/test_curation.py). Cost: one counting scan +
    one pruned-window scan, vs. the hot-stratum funnel.

    ``bounds_mechanism``: "literal" keeps per-stratum bounds in a driver
    dict + create_map literal (cheap at domain-scale cardinality);
    "join" keeps them in a broadcast-joined DataFrame that never leaves
    the cluster (no driver state, no plan literal — required when the
    stratum key is high-cardinality, e.g. URL host at web scale);
    "auto" picks literal up to STRATA_LITERAL_MAX strata, join above.
    Both produce bit-identical samples (pytest-pinned)."""
    if bounds_mechanism not in ("auto", "literal", "join"):
        raise ValueError(f"unknown bounds_mechanism {bounds_mechanism!r}")
    key = _sample_key(id_col, text_col)
    w = Window.partitionBy(strata_col).orderBy(key, F.asc(id_col))
    base = docs
    if prune:
        u = F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint")
        pruned = docs.withColumn("_u", u)
        # per-stratum total; bound = keep-fraction of the 2^32 key space
        counts = (pruned.groupBy(F.col(strata_col).alias("_s"))
                  .agg(F.count(F.lit(1)).alias("_n")))
        mech = bounds_mechanism
        if mech == "auto":
            mech = ("literal" if counts.limit(STRATA_LITERAL_MAX + 1)
                    .count() <= STRATA_LITERAL_MAX else "join")
        if mech == "join":
            caps = counts.select(F.col("_s").alias(strata_col), "_n",
                                 F.lit(k).cast("long").alias("_cap"))
            base = _prune_with_bounds_join(
                pruned, strata_col, caps, prune_factor).drop("_u")
        else:
            stratum_sizes = dict(counts.toPandas().itertuples(
                index=False, name=None))  # one row per stratum: tiny
            space = _PRUNE_SPACE
            bound = {
                s: space if n <= prune_factor * k
                else prune_factor * k / float(n) * space
                for s, n in stratum_sizes.items()
            }
            need = {s: min(k, int(n)) for s, n in stratum_sizes.items()}
            while True:
                bdf = F.create_map(*[x for s, b in bound.items()
                                     for x in (F.lit(s), F.lit(float(b)))])
                keep = F.col("_u") < bdf[F.col(strata_col)]
                got = dict(
                    pruned.groupBy(F.col(strata_col).alias("_s"))
                    .agg(F.sum(keep.cast("long")).alias("_kept"))
                    .toPandas().itertuples(index=False, name=None))
                short = {s for s, n in need.items() if got.get(s, 0) < n}
                if not short:
                    break
                for s in short:  # widen and re-verify (vanishingly rare)
                    bound[s] = min(space, bound[s] * 4.0)
            base = pruned.filter(keep).drop("_u")
    return (base.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select(F.col(id_col).alias("doc_id"),
                    F.col(strata_col).alias("stratum"), "rk"))


def keep_best(docs: DataFrame, near_pairs: DataFrame,
              id_col: str = "doc_id", text_col: str = "text",
              len_col: str = "n_chars") -> DataFrame:
    """Curation decision per document: drop exact duplicates (keep the
    smallest id of each md5(text) cluster) and the worse member of each
    near-dup pair (shorter text loses; tie → larger id loses). Output
    (doc_id, status) with status ∈ {keep, drop_exact, drop_near}.

    ``near_pairs`` is any (doc_a, doc_b) pair table with doc_a < doc_b
    (MinHash-LSH, SimHash, Jaccard, embedding-cosine — all produce this
    shape). Exact-dup detection is one hash groupBy; the near-dup loser
    set is two joins against the pair table — no iteration, so at scale
    the cost is the pair generator's, not this operator's. (Greedy
    pairwise dropping, not connected components: at web scale the pair
    graph is kept sparse by the LSH generators and greedy matches the
    reference curation behavior of 'remove the detected duplicate'.)"""
    d = docs.select(F.col(id_col).alias("doc_id"),
                    F.md5(F.col(text_col)).alias("text_hash"),
                    F.col(len_col).alias("_len"))
    canon = d.groupBy("text_hash").agg(F.min("doc_id").alias("canonical_doc"))
    with_canon = d.join(canon, "text_hash")
    exact_losers = (with_canon.filter(F.col("doc_id") != F.col("canonical_doc"))
                    .select("doc_id"))
    a = d.select(F.col("doc_id").alias("doc_a"), F.col("_len").alias("len_a"))
    b = d.select(F.col("doc_id").alias("doc_b"), F.col("_len").alias("len_b"))
    near_losers = (
        near_pairs.select("doc_a", "doc_b")
        .join(a, "doc_a").join(b, "doc_b")
        .select(F.when(F.col("len_a") < F.col("len_b"), F.col("doc_a"))
                .when(F.col("len_b") < F.col("len_a"), F.col("doc_b"))
                .otherwise(F.greatest("doc_a", "doc_b")).alias("doc_id")))
    return (
        d.select("doc_id")
        .join(exact_losers.withColumn("_ex", F.lit(1)).distinct(),
              "doc_id", "left")
        .join(near_losers.withColumn("_nr", F.lit(1)).distinct(),
              "doc_id", "left")
        .select("doc_id",
                F.when(F.col("_ex") == 1, "drop_exact")
                .when(F.col("_nr") == 1, "drop_near")
                .otherwise("keep").alias("status")))


def pack_sequences(docs: DataFrame, budget: int,
                   shard_col: str = "source", id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Concat-and-chunk sequence packing (the standard pretraining
    formulation: concatenate documents in deterministic id order,
    split at token-budget boundaries): each document's bin is the
    budget-chunk its FIRST token lands in. Output
    (doc_id, shard, bin, n_tokens).

    Relational shape: one whitespace token count (map-only) + one
    window cumsum per shard — integer math end to end, so results are
    exact on every engine and parallelism. The window partitions by
    the shard key; shard cardinality should comfortably exceed
    executor count at scale (packing is per-shard by definition —
    sequences never cross shards). Greedy no-straddle packing is
    prefix-sequential (per-partition state, applyInPandas); this
    chunking variant is what GPT-style pipelines actually run."""
    n_tokens = F.size(F.filter(F.split(F.coalesce(F.col(text_col),
                                                  F.lit("")), " "),
                               lambda t: t != ""))
    d = docs.select(F.col(id_col).alias("doc_id"),
                    F.col(shard_col).alias("shard"),
                    n_tokens.alias("n_tokens"))
    excl = F.coalesce(F.sum("n_tokens").over(
        Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)), F.lit(0))
    return d.select("doc_id", "shard",
                    F.floor(excl / budget).cast("int").alias("bin"),
                    "n_tokens")


def ngram_contamination(docs: DataFrame, probes: DataFrame, n: int = 8,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Training-data decontamination: flag corpus documents sharing any
    token n-gram with an evaluation-probe set. Output
    (doc_id, n_grams_matched) for flagged docs only.

    Scale shape: the probe side (eval sets are small by nature) reduces
    to a DISTINCT n-gram set and BROADCASTS; the corpus side is a
    map-only n-gram explode (slice windows over the token array — pure
    higher-order functions, no Python) into a broadcast hash join, so
    the 100 TB scan never shuffles. n-grams join as md5 digests: fixed
    16-byte keys instead of arbitrary-length strings in the hash
    table."""
    def grams(df, idc):
        toks = F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
                        lambda t: t != "")
        g = F.when(
            F.size(toks) >= n,
            F.transform(F.sequence(F.lit(0), F.size(toks) - n),
                        lambda i: F.md5(F.concat_ws(
                            " ", F.slice(toks, i + 1, n))))
        ).otherwise(F.array().cast("array<string>"))
        return df.select(F.col(idc), F.explode(g).alias("gram"))

    probe_grams = grams(probes, id_col).select("gram").distinct()
    return (grams(docs, id_col)
            .join(F.broadcast(probe_grams), "gram")
            .groupBy(id_col)
            .agg(F.count_distinct("gram").alias("n_grams_matched")))


def mixture_sample(docs: DataFrame, domain_col: str, target: int,
                   weight_scale: int = 1_000_000,
                   id_col: str = "doc_id", text_col: str = "text",
                   prune: bool = True,
                   prune_factor: float = 3.0,
                   bounds_mechanism: str = "auto") -> DataFrame:
    """Temperature-scaled domain-mixture sampling (the alpha=0.5
    smoothing used for multilingual/multi-domain training mixes, e.g.
    mC4/XLM-R): domain d with count c_d receives a quota proportional
    to sqrt(c_d), so small domains are up-weighted relative to their
    raw share. Rows inside a domain are chosen by the same
    deterministic md5(id:text) rank as ``stratified_sample``.

    Quota math is EXACT and engine-portable: w_d = floor(sqrt(c_d) *
    weight_scale) as int64 (sqrt is IEEE correctly-rounded, identical
    on every engine), W = sum(w_d) exactly in integers, quota_d =
    (target * w_d) div W in integer division — no cross-domain float
    sum whose non-deterministic order could flip a floor() at the
    boundary.

    Output (domain, doc_id, rnk, quota), rows with rnk <= quota.

    Scale shape: the domain-count aggregation partial-aggregates
    map-side into a tiny driver-side table (one row per domain); the
    per-domain ranking window reuses stratified_sample's map-side
    md5-prefix pre-prune with verify-and-widen, so a hot domain never
    funnels its full row set through one window partition.

    ``bounds_mechanism`` as in stratified_sample: "literal" (driver
    dict + create_map, domain-scale cardinality), "join" (broadcast
    bounds/quota DataFrames, no driver state — for high-cardinality
    domain keys), "auto" switches at STRATA_LITERAL_MAX. Bit-identical
    samples either way (pytest-pinned). W (the global weight sum) is a
    one-row collect under both — a scalar, never per-domain state."""
    import math

    if bounds_mechanism not in ("auto", "literal", "join"):
        raise ValueError(f"unknown bounds_mechanism {bounds_mechanism!r}")
    counts_df = (docs.groupBy(F.col(domain_col).alias("_d"))
                 .agg(F.count(F.lit(1)).alias("_n")))
    mech = bounds_mechanism
    if mech == "auto":
        mech = ("literal" if counts_df.limit(STRATA_LITERAL_MAX + 1)
                .count() <= STRATA_LITERAL_MAX else "join")

    key = _sample_key(id_col, text_col)
    win = Window.partitionBy(domain_col).orderBy(key, F.asc(id_col))

    if mech == "join":
        # floor(sqrt(c) * scale) as exact int64 — identical IEEE math to
        # the literal path (sqrt is correctly rounded on both)
        weights = counts_df.select(
            F.col("_d").alias(domain_col), "_n",
            F.floor(F.sqrt(F.col("_n").cast("double"))
                    * F.lit(float(weight_scale))).cast("long").alias("_w"))
        W = weights.agg(F.sum("_w")).collect()[0][0]  # scalar, 1 row
        # DIV: exact int64 floor-division, matching the literal path's
        # Python // (double `/` would lose exactness past 2^53)
        quotas = weights.select(
            domain_col, "_n",
            F.expr(f"CAST((CAST({int(target)} AS BIGINT) * _w) "
                   f"DIV {int(W)} AS BIGINT)").alias("_cap"))
        base = docs
        if prune:
            u = F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint")
            pruned = docs.withColumn("_u", u)
            base = _prune_with_bounds_join(
                pruned, domain_col, quotas, prune_factor).drop("_u")
        return (base
                .withColumn("rnk", F.row_number().over(win))
                .join(F.broadcast(quotas.select(
                    domain_col, F.col("_cap").alias("quota"))), domain_col)
                .filter(F.col("rnk") <= F.col("quota"))
                .select(F.col(domain_col).alias("domain"),
                        F.col(id_col).alias("doc_id"), "rnk", "quota"))

    counts = dict(counts_df.toPandas().itertuples(index=False, name=None))
    w_d = {d: int(math.floor(math.sqrt(float(c)) * weight_scale))
           for d, c in counts.items()}
    W = sum(w_d.values())
    quota = {d: (target * w) // W for d, w in w_d.items()}

    base = docs
    if prune:
        u = F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint")
        pruned = docs.withColumn("_u", u)
        space = _PRUNE_SPACE
        bound = {
            d: space if counts[d] <= prune_factor * quota[d]
            else prune_factor * quota[d] / float(counts[d]) * space
            for d in counts
        }
        need = {d: min(quota[d], int(counts[d])) for d in counts}
        while True:
            bdf = F.create_map(*[x for d, b in bound.items()
                                 for x in (F.lit(d), F.lit(float(b)))])
            keep = F.col("_u") < bdf[F.col(domain_col)]
            got = dict(
                pruned.groupBy(F.col(domain_col).alias("_d"))
                .agg(F.sum(keep.cast("long")).alias("_kept"))
                .toPandas().itertuples(index=False, name=None))
            short = {d for d, nn in need.items() if got.get(d, 0) < nn}
            if not short:
                break
            for d in short:
                bound[d] = min(space, bound[d] * 4.0)
        base = pruned.filter(keep).drop("_u")
    qmap = F.create_map(*[x for d, q in quota.items()
                          for x in (F.lit(d), F.lit(int(q)))])
    return (base.withColumn("rnk", F.row_number().over(win))
            .withColumn("quota", qmap[F.col(domain_col)].cast("bigint"))
            .filter(F.col("rnk") <= F.col("quota"))
            .select(F.col(domain_col).alias("domain"),
                    F.col(id_col).alias("doc_id"), "rnk", "quota"))


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 25,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """BM25 retrieval: top-k documents for a fixed query term set —
    the curation-side "find documents like this" primitive (and the
    lexical half of any retrieval-augmented pipeline).

    Per-term scores are computed in double (idf = ln(1 + (N-df+.5)/
    (df+.5)), Robertson tf saturation), then rounded to an exact ppm
    INTEGER per (doc, term) BEFORE the per-doc sum — an integer sum is
    partial-aggregation-merge-order independent, so the only
    cross-engine float surface is elementwise arithmetic on identical
    inputs (IEEE-exact) plus one ln per distinct df (same accepted
    ulp class as tfidf_top_terms).

    Scale shape: the tf table is filtered to the query's terms before
    any join — a pushed-down isin() prune, so the corpus-wide work is
    one tokenize + two hash aggs; df/N/avgdl are literal constants by
    the time scoring runs. The final top-k is sort+limit
    (TakeOrderedAndProject — per-partition heaps, never a global sort).
    """
    toks = _toks(docs, id_col, text_col)
    tf_all = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("tf"))
    dlen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dlen"))
    stats = dlen.agg(F.count(F.lit(1)).alias("n"),
                     F.sum("dlen").alias("tot")).collect()[0]
    n_docs, avgdl = int(stats["n"]), float(stats["tot"]) / int(stats["n"])
    qtf = tf_all.filter(F.col("tok").isin(query_terms))
    dfreq = qtf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        qtf.join(dfreq, "tok").join(dlen, "doc_id")
        .withColumn("idf", F.log(
            1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5)
            / (F.col("df") + 0.5)))
        .withColumn("term_ppm", F.round(
            F.col("idf") * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dlen") / avgdl))
            * 1e6, 0).cast("long")))
    return (scored.groupBy("doc_id")
            .agg(F.sum("term_ppm").alias("score_ppm"),
                 F.count(F.lit(1)).alias("n_terms"))
            .orderBy(F.desc("score_ppm"), F.asc("doc_id"))
            .limit(k))


def bigram_lm_cost(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """CCNet-style LM quality scoring without an external model: train
    an add-one-smoothed bigram LM on the corpus itself (two hash aggs),
    then score every document by its average per-bigram negative
    log-likelihood — boilerplate/repetitive text scores cheap, rare
    gibberish scores expensive; curation filters on the tails.

    P(w2|w1) = (c12 + 1) / (c1 + V) with V = corpus vocabulary size;
    per-bigram cost = -ln P rounded to an exact MICRO-NAT integer, so
    the per-doc sum and the final integer-division average
    (sum DIV n_bigrams) are bit-exact regardless of aggregation order.
    Output: (doc_id, n_bigrams, avg_cost_micro).

    Scale shape: bigram assembly is one per-doc window (lead over token
    position — doc-keyed, high cardinality, no skew); the LM "model" is
    the (w1,w2)-keyed count table joined back on the bigram key — a
    plain shuffle-hash equi-join that needs no broadcast, so vocabulary
    size is unbounded. Documents shorter than 2 tokens drop out (no
    bigrams to score).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.filter(F.split(F.col(text_col), " "),
                              lambda t: t != "")).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = (toks.withColumn("w2", F.lead("tok", 1).over(w))
               .filter(F.col("w2").isNotNull())
               .select("doc_id", F.col("tok").alias("w1"), "w2"))
    vocab = toks.select("tok").distinct().count()
    c12 = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    lm = c12.join(c1, "w1").withColumn(
        "cost_micro", F.round(
            -F.log((F.col("c12") + 1.0) / (F.col("c1") + F.lit(float(vocab))))
            * 1e6, 0).cast("long"))
    return (bigrams.join(lm.select("w1", "w2", "cost_micro"), ["w1", "w2"])
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.sum("cost_micro").alias("tot"))
            .select("doc_id", "n_bigrams",
                    F.expr("tot DIV n_bigrams").alias("avg_cost_micro")))


def quantile_buckets(scored: DataFrame, score_col: str,
                     n_buckets: int = 10) -> DataFrame:
    """Curriculum / quality bucketing: assign every row a 1..n_buckets
    bucket by exact quantile thresholds of ``score_col`` — how a
    training pipeline splits a corpus into quality tiers for mixture
    weighting or curriculum ordering.

    NOT an ``ntile()`` over a global ORDER BY — that window collapses
    to a single partition and dies at scale. Instead: one aggregation
    computes the n-1 interpolated quantile thresholds (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``, the rel_percentiles
    precedent), broadcast as a 1-row frame, and the bucket is
    ``1 + Σ (score > q_i)`` — a map-side comparison chain, no sort, no
    shuffle of the big side. Boundary ties deterministically fall into
    the lower bucket on both engines (strict >); heavily duplicated
    scores may leave buckets empty rather than split a value across
    buckets — the property that keeps assignment a pure function of
    the value.
    """
    qs = [i / n_buckets for i in range(1, n_buckets)]
    th = scored.agg(*[
        F.expr(f"percentile({score_col}, {q!r})").alias(f"q{i}")
        for i, q in enumerate(qs)])
    bucket = F.lit(1)
    for i in range(len(qs)):
        bucket = bucket + (F.col(score_col) > F.col(f"q{i}")).cast("int")
    return (scored.crossJoin(F.broadcast(th))
            .withColumn("bucket", bucket)
            .drop(*[f"q{i}" for i in range(len(qs))]))


def weighted_sample(docs: DataFrame, weight_col: str, n: int,
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES): each row draws u ∈ (0,1) from an
    md5-keyed uniform (seedless — re-runs, resumes, and the oracle see
    the same sample) and gets key = -ln(u) / w; the n SMALLEST keys are
    the sample, giving inclusion probability proportional to weight.
    Keys are rounded to 6 dp with an id tiebreak, so the selection
    order is engine-portable (the only cross-engine float surface is
    one ln per row — the tfidf-accepted ulp class — and rounding + id
    tiebreak make a flip require landing exactly on a rounding
    boundary).

    Scale shape: the key is a map-side expression; the top-n is
    sort+limit (TakeOrderedAndProject — per-partition heaps, never a
    global sort). Zero/negative weights are rejected rather than
    silently dropped."""
    u = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                16, 10).cast("double") + 1.0) / 4294967297.0
    key = F.round(-F.log(u) / F.col(weight_col).cast("double"), 6)
    return (docs
            .withColumn("_w", F.col(weight_col).cast("double"))
            .filter(F.assert_true(F.col("_w") > 0,
                                  f"non-positive weight in {weight_col}")
                    .isNull())
            .withColumn("es_key", key)
            .orderBy(F.asc("es_key"), F.asc(id_col))
            .limit(n)
            .select(F.col(id_col).alias("doc_id"),
                    F.col("_w").alias("weight"), "es_key"))


N_SHARDS = 16


def assign_shards(docs: DataFrame, n_shards: int = N_SHARDS,
                  id_col: str = "doc_id") -> DataFrame:
    """Deterministic shard assignment for training-data loaders: each
    document hashes (first 8 md5 hex digits of its id — the repo's
    engine-portable hash) to one of ``n_shards`` shards, plus an
    ``order_key`` the loader can sort on for a reproducible
    within-shard shuffle (the same md5 draw, so global order is a
    seedless permutation).

    Scale: entirely map-side — no shuffle, no window, no aggregation.
    A 10^12-row corpus shards in one scan; writers then
    ``partitionBy("shard")`` for one output directory per shard.
    """
    h = F.md5(F.col(id_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        (bucket % n_shards).cast("int").alias("shard"),
        F.substring(h, 9, 8).alias("order_key"))


def source_filter(docs: DataFrame, min_mean_chars: float | None = None,
                  blocklist: tuple[str, ...] = (),
                  id_col: str = "doc_id", source_col: str = "source",
                  len_col: str = "n_chars") -> DataFrame:
    """Source-level quality gating (the RefinedWeb/C4 move of scoring a
    whole domain, not each page): aggregate a mean length score per
    source, then keep only documents whose source clears the threshold
    and is not blocklisted. Returns the kept docs annotated with their
    source score so downstream sampling can stratify on it.

    With ``min_mean_chars=None`` the gate is RELATIVE: keep sources at
    or above the corpus-wide mean. Both means average an integer column
    (exact bigint sum / count), so the comparison is bit-deterministic
    across engines and partitionings — no float-accumulation order in
    the gate.

    Scale: one partial-aggregating groupBy over the low-cardinality
    source key, then the per-source score table (|sources| rows — tiny)
    broadcast-joins back onto the corpus scan; the corpus-mean row is a
    broadcast single-row cross join. The corpus itself never shuffles.
    """
    stats = (docs.groupBy(source_col)
             .agg((F.round(F.avg(len_col), 6) + F.lit(0.0))
                  .alias("source_score"),
                  F.count(F.lit(1)).alias("source_docs")))
    if min_mean_chars is None:
        corpus = docs.agg((F.round(F.avg(len_col), 6) + F.lit(0.0))
                          .alias("_corpus_mean"))
        gate = (stats.crossJoin(F.broadcast(corpus))
                .filter(F.col("source_score") >= F.col("_corpus_mean"))
                .drop("_corpus_mean"))
    else:
        gate = stats.filter(F.col("source_score") >= min_mean_chars)
    if blocklist:
        gate = gate.filter(~F.col(source_col).isin(*blocklist))
    return (docs.join(F.broadcast(gate), source_col, "inner")
            .select(F.col(id_col).alias("doc_id"), F.col(source_col),
                    "source_score", "source_docs"))


def interleave_domains(docs: DataFrame, domain_col: str,
                       id_col: str = "doc_id",
                       text_col: str = "text",
                       n_shards: int = N_SHARDS) -> DataFrame:
    """Deterministic round-robin domain interleaving — the training
    ORDER schedule that keeps consecutive samples from different
    domains (prevents long single-domain runs that destabilize
    training). Sharded (VERDICT r3 item 3 replaced the old global
    Window.orderBy, which serialized the whole corpus through one
    task): each doc hashes to a shard (the assign_shards md5 bucket),
    gets a seedless md5 rank within its (shard, domain), and the
    global order is shard-major — shard 0's interleaved schedule, then
    shard 1's, and so on. Every shard's schedule is itself
    round-robin across domains, so consecutive samples still rotate
    domains everywhere except the n_shards-1 shard seams.
    Returns (doc_id, domain, shard, pos_in_domain, global_pos);
    global_pos is a dense total order.

    Scale: both windows partition by shard — parallelism = n_shards
    (set it to ~cluster cores at 10^12 rows; a distributed loader
    consumes one shard per reader anyway). Cross-shard offsets come
    from a per-shard count agg collected to the driver — O(n_shards)
    rows, never O(data) — and rejoin as a broadcast. No global sort,
    no partitionless window, anywhere.
    """
    h = F.md5(F.col(id_col).cast("string"))
    shard = (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
             % n_shards).cast("int")
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(domain_col).alias("domain"),
                       shard.alias("shard"),
                       _sample_key(id_col, text_col).alias("_k"))
    ranked = (base
              .withColumn("pos_in_domain",
                          F.row_number().over(
                              Window.partitionBy("shard", "domain")
                              .orderBy("_k", F.asc("doc_id"))).cast("long"))
              .withColumn("local_pos",
                          F.row_number().over(
                              Window.partitionBy("shard")
                              .orderBy("pos_in_domain", "domain",
                                       F.asc("doc_id"))).cast("long")))
    # shard -> rows-before-this-shard; the count agg is map-side partial
    # over a pure hash expression, so recomputing it is deterministic.
    counts = {r["shard"]: r["n"] for r in
              base.groupBy("shard").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    offsets, acc = [], 0
    for s in range(n_shards):
        offsets.append((s, acc))
        acc += counts.get(s, 0)
    off = docs.sparkSession.createDataFrame(
        offsets, "shard int, _off long")
    return (ranked.join(F.broadcast(off), "shard")
            .select("doc_id", "domain", "shard", "pos_in_domain",
                    (F.col("_off") + F.col("local_pos")).cast("long")
                    .alias("global_pos")))


def dsir_importance(docs: DataFrame, target_col: str,
                    id_col: str = "doc_id", text_col: str = "text",
                    n_buckets: int = 256) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023
    [K]) re-expressed in this repo's engine-portable fixed point:
    score each raw document by how much its hashed-unigram profile
    looks like the TARGET distribution (rows where ``target_col`` is
    truthy) relative to the RAW distribution (all rows). Classic DSIR
    weights are Σ log p_t(f)/p_r(f); the log is monotone per feature,
    so this operator emits the add-one-smoothed probability ratio per
    feature in ppm and the document score as the exact-integer MEAN
    token ratio — rank-equivalent for selection thresholds at uniform
    document length and bit-identical across engines (the repo's
    no-float-logs convention, same trade recorded for resnik_mics).

    Two corpus passes, exactly like reference DSIR: (1) token stream →
    one hash agg keyed on the md5 feature bucket (output bounded by
    ``n_buckets``), (2) token stream re-scored against the
    broadcast-joined ratio table → one hash agg keyed on the doc.
    Totals fold in as lazy 1-row aggregates; no driver actions, no
    windows. BIGINT fixed point is exact below ~9e18 — beyond ~1e9
    tokens per bucket swap the ppm literals to DECIMAL(38,0), same
    plan shape.
    """
    toks = F.filter(F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                            r"\s+"),
                    lambda t: t != "")
    stream = (docs.select(F.col(id_col).alias("doc_id"),
                          F.col(target_col).cast("int").alias("is_target"),
                          F.explode(toks).alias("tok"))
              .select("doc_id", "is_target",
                      (F.conv(F.substring(F.md5("tok"), 1, 2), 16, 10)
                       .cast("int") % n_buckets).alias("bucket")))
    counts = (stream.groupBy("bucket")
              .agg(F.count(F.lit(1)).alias("raw_cnt"),
                   F.sum("is_target").alias("tgt_cnt")))
    totals = (counts.agg(F.sum("raw_cnt").alias("raw_total"),
                         F.sum("tgt_cnt").alias("tgt_total")))
    ratios = (counts.crossJoin(F.broadcast(totals))
              .select("bucket",
                      F.expr(f"((tgt_cnt + 1) * 1000000"
                             f" DIV (raw_cnt + 1))"
                             f" * (raw_total + {n_buckets})"
                             f" DIV (tgt_total + {n_buckets})")
                      .cast("long").alias("ratio_ppm")))
    return (stream.join(F.broadcast(ratios), "bucket")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.max("is_target").alias("is_target"),
                 F.sum("ratio_ppm").alias("sum_ratio_ppm"))
            .select("doc_id",
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.col("is_target").cast("int").alias("is_target"),
                    F.expr("sum_ratio_ppm DIV n_tokens").cast("long")
                    .alias("dsir_score_ppm")))


def filter_attrition(docs: DataFrame, min_tokens: int = 20,
                     allowed_lang: str = "en",
                     max_tok_share_ppm: int = 150_000,
                     min_ttr_ppm: int = 500_000) -> DataFrame:
    """Sequential quality-filter funnel with per-rule attrition
    accounting — the RefinedWeb/Dolma-style report every curation run
    publishes: for each rule, how many documents entered it, how many
    it dropped, how many survived, and the drop rate in exact ppm.
    Rules run in a fixed order (a document is charged to the FIRST rule
    it fails, matching how sequential filter pipelines actually
    attribute attrition): (1) minimum token count, (2) language gate on
    the ``lang`` column, (3) repetition gate — no single token may
    exceed ``max_tok_share_ppm`` of the document, (4) lexical-diversity
    gate — type-token ratio at least ``min_ttr_ppm``. A final
    ``survived`` row closes the funnel.

    Scale shape: ALL per-document signals come from one (doc, token)
    hash agg + one doc-keyed agg (the same two-agg spine as
    ``lexical_diversity``); the funnel itself is ONE grouping-free
    Aggregate (five conditional counts in a single reduction to one
    row) exploded into the five report rows map-side — no windows, no
    joins after the signal pass, output constant-size regardless of
    corpus size.
    """
    toks = F.filter(F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))),
                            r"\s+"),
                    lambda t: t != "")
    per_tok = (docs.select("doc_id", F.explode_outer(toks).alias("tok"))
               .groupBy("doc_id", "tok")
               .agg(F.count(F.lit(1)).alias("n")))
    sig = (docs.select("doc_id", "lang")
           .join(per_tok.groupBy("doc_id")
                 .agg(F.sum(F.when(F.col("tok").isNotNull(), F.col("n"))
                            .otherwise(0)).alias("n_toks"),
                      F.count(F.when(F.col("tok").isNotNull(), 1))
                      .alias("n_types"),
                      F.max(F.when(F.col("tok").isNotNull(), F.col("n"))
                            .otherwise(0)).alias("max_n")),
                 "doc_id")
           .select("lang",
                   F.coalesce("n_toks", F.lit(0)).alias("n_toks"),
                   F.coalesce("n_types", F.lit(0)).alias("n_types"),
                   F.coalesce("max_n", F.lit(0)).alias("max_n")))
    p1 = F.col("n_toks") >= min_tokens
    p2 = F.col("lang") == allowed_lang
    # the n_toks > 0 guard matters even though zero-token docs always
    # fail p1: under ANSI mode an unguarded DIV raises DIVIDE_BY_ZERO
    # eagerly instead of yielding NULL for three-valued logic to absorb
    p3 = F.expr("CASE WHEN n_toks > 0 THEN max_n * 1000000L DIV n_toks"
                " END") <= max_tok_share_ppm
    p4 = F.expr("CASE WHEN n_toks > 0 THEN n_types * 1000000L DIV n_toks"
                " END") >= min_ttr_ppm
    one = F.lit(1)
    agg = sig.agg(
        F.count(one).alias("n0"),
        F.sum(F.when(~p1, 1).otherwise(0)).alias("d1"),
        F.sum(F.when(p1 & ~p2, 1).otherwise(0)).alias("d2"),
        F.sum(F.when(p1 & p2 & ~p3, 1).otherwise(0)).alias("d3"),
        F.sum(F.when(p1 & p2 & p3 & ~p4, 1).otherwise(0)).alias("d4"))
    return attrition_report(agg)


def attrition_counts(docs: DataFrame, min_tokens: int = 20,
                     allowed_lang: str = "en",
                     max_tok_share_ppm: int = 150_000,
                     min_ttr_ppm: int = 500_000) -> DataFrame:
    """The additive core of ``filter_attrition``: one row of
    (n0, d1..d4) first-fail counts. Per-document first-fail attribution
    is batch-local (it depends only on the document itself), so counts
    over disjoint corpus slices SUM exactly to the whole-corpus counts
    — the property the streaming monitor relies on."""
    report = filter_attrition(docs, min_tokens=min_tokens,
                              allowed_lang=allowed_lang,
                              max_tok_share_ppm=max_tok_share_ppm,
                              min_ttr_ppm=min_ttr_ppm)
    # invert the report back to counts: stage 1 n_in = n0, each rule's
    # n_dropped = d_i (cheap 5-row pivot; keeps one source of truth for
    # the gate math instead of duplicating the predicate spine)
    return report.agg(
        F.max(F.when(F.col("stage") == 1, F.col("n_in"))).alias("n0"),
        F.max(F.when(F.col("stage") == 1, F.col("n_dropped"))).alias("d1"),
        F.max(F.when(F.col("stage") == 2, F.col("n_dropped"))).alias("d2"),
        F.max(F.when(F.col("stage") == 3, F.col("n_dropped"))).alias("d3"),
        F.max(F.when(F.col("stage") == 4, F.col("n_dropped"))).alias("d4"))


def attrition_report(agg: DataFrame) -> DataFrame:
    """Explode a one-row (n0, d1..d4) counts frame into the five-row
    funnel report (shared by the batch operator and the streaming
    monitor's drained sum)."""
    rows = agg.select(F.explode(F.expr("""array(
        struct(1L AS stage, 'min_tokens' AS rule,
               n0 AS n_in, coalesce(d1, 0L) AS n_dropped),
        struct(2L AS stage, 'language' AS rule,
               n0 - coalesce(d1, 0L) AS n_in,
               coalesce(d2, 0L) AS n_dropped),
        struct(3L AS stage, 'repetition' AS rule,
               n0 - coalesce(d1, 0L) - coalesce(d2, 0L) AS n_in,
               coalesce(d3, 0L) AS n_dropped),
        struct(4L AS stage, 'diversity' AS rule,
               n0 - coalesce(d1, 0L) - coalesce(d2, 0L)
                  - coalesce(d3, 0L) AS n_in,
               coalesce(d4, 0L) AS n_dropped),
        struct(5L AS stage, 'survived' AS rule,
               n0 - coalesce(d1, 0L) - coalesce(d2, 0L)
                  - coalesce(d3, 0L) - coalesce(d4, 0L) AS n_in,
               0L AS n_dropped))""")).alias("r"))
    return rows.select(
        F.col("r.stage").cast("long").alias("stage"),
        F.col("r.rule").alias("rule"),
        F.col("r.n_in").cast("long").alias("n_in"),
        F.col("r.n_dropped").cast("long").alias("n_dropped"),
        (F.col("r.n_in") - F.col("r.n_dropped")).cast("long").alias("n_out"),
        F.expr("CASE WHEN r.n_in > 0 THEN r.n_dropped * 1000000L DIV r.n_in"
               " ELSE 0 END").cast("long").alias("drop_ppm"))


def chunk_documents(docs: DataFrame, chunk_tokens: int = 32,
                    stride: int = 24, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Fixed-width token chunking with overlap — the embedding/RAG prep
    step: every document becomes ceil-strided windows of
    ``chunk_tokens`` tokens starting every ``stride`` tokens (so
    consecutive chunks overlap by ``chunk_tokens - stride``), each with
    a deterministic chunk index, its token span, and the chunk text.
    The final window is kept even when short (the tail must not be
    silently dropped), and a document shorter than one chunk yields
    exactly one chunk. Empty documents yield no chunks (join back to
    the id spine downstream if presence matters).

    Scale shape: pure map — tokenize + windowed slice with JVM array
    higher-order functions, one explode; no shuffle at all. Output size
    is input tokens × (chunk/stride) overlap factor, linear and
    partition-local; at 100 TB this is the canonical embarrassingly
    parallel stage.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = F.filter(F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                            r"\s+"),
                    lambda t: t != "")
    n_chunks = F.expr(
        f"CASE WHEN size(tk) = 0 THEN 0"
        f" WHEN size(tk) <= {chunk_tokens} THEN 1"
        f" ELSE (size(tk) - {chunk_tokens} + {stride} - 1)"
        f" DIV {stride} + 1 END")
    return (docs
            .select(F.col(id_col).alias("doc_id"), toks.alias("tk"))
            .select("doc_id", "tk", n_chunks.alias("nc"))
            .select("doc_id", F.size("tk").alias("n_toks"),
                    # sequence(0, -1) would yield [0, -1] (Spark infers
                    # step -1 when start > stop), so nc = 0 must
                    # short-circuit to an empty array
                    F.explode(F.expr(
                        f"CASE WHEN nc = 0 THEN"
                        f" CAST(array() AS array<struct<chunk_idx: int,"
                        f" tok_from: int, tok_to: int, chunk: string>>)"
                        f" ELSE transform(sequence(0, nc - 1), c -> struct("
                        f" c AS chunk_idx,"
                        f" c * {stride} + 1 AS tok_from,"
                        f" least(c * {stride} + {chunk_tokens}, size(tk))"
                        f"   AS tok_to,"
                        f" concat_ws(' ', slice(tk, c * {stride} + 1,"
                        f"                      {chunk_tokens})) AS chunk"
                        f")) END")).alias("c"))
            .select("doc_id",
                    F.col("c.chunk_idx").cast("long").alias("chunk_idx"),
                    F.col("c.tok_from").cast("long").alias("tok_from"),
                    F.col("c.tok_to").cast("long").alias("tok_to"),
                    F.col("c.chunk").alias("chunk")))


def token_budget_mix(docs: DataFrame, budget_tokens: int,
                     domain_col: str = "source",
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Token-budgeted mixture: give every domain the same token budget
    and keep its documents in a deterministic priority order (longest
    first, id ascending on ties — a stand-in for any quality score)
    until the running whitespace-token total would exceed the budget.
    The budget is a hard cap: the document that crosses the line is
    dropped even if later, shorter documents still fit — the greedy
    prefix rule every token-budget sampler actually ships, because it
    keeps the decision a pure function of the running sum.

    Returns one row per domain: documents/tokens kept and dropped and
    the exact-ppm budget fill. The only wide ops are one window
    partitioned BY DOMAIN (the per-domain prefix sum is the task unit
    — no global order) and one hash agg, so the shape survives any
    corpus size; the output is domain-cardinality-sized.
    """
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    w = (Window.partitionBy("domain")
         .orderBy(F.desc("n_toks"), F.asc(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    scored = (docs
              .select(F.col(id_col), F.col(domain_col).alias("domain"),
                      toks.cast("long").alias("n_toks"))
              .withColumn("cum_toks", F.sum("n_toks").over(w))
              .withColumn("kept",
                          (F.col("cum_toks") <= budget_tokens)
                          .cast("int")))
    return (scored.groupBy("domain")
            .agg(F.sum("kept").cast("long").alias("n_kept"),
                 (F.count(F.lit(1)) - F.sum("kept")).cast("long")
                 .alias("n_dropped"),
                 F.sum(F.col("n_toks") * F.col("kept")).cast("long")
                 .alias("tokens_kept"),
                 F.sum(F.col("n_toks") * (1 - F.col("kept"))).cast("long")
                 .alias("tokens_dropped"))
            .withColumn("fill_ppm",
                        F.expr(f"tokens_kept * 1000000"
                               f" DIV {budget_tokens}").cast("long")))
