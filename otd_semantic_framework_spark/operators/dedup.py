"""Deduplication operators for training-data pipelines.

All three are pure DataFrame algebra — no Python UDFs anywhere — so they
stay inside whole-stage codegen and scale by partitioning:

- exact: hash-groupBy on md5(text) (map-side partial agg).
- MinHash + LSH: shingle → minhash signature → band → bucket join →
  Jaccard verify. The classic shingle→minhash→band→bucket-join layout;
  candidate generation never cross-joins — pairs only form inside LSH
  buckets. The production signature path is SHUFFLE-FREE
  (``minhash_signatures_maponly``): shingles are document-local, so the
  64 Carter-Wegman mins fold inside one array ``aggregate`` per row
  instead of an explode + 64-min groupBy exchange.
- SimHash: per-token 64-bit hash, bit-majority vote via 64 conditional
  sums, hamming-near pairs by band join on 4x16-bit chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_HASHES = 64
N_BANDS = 16
ROWS_PER_BAND = N_HASHES // N_BANDS


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """One canonical row per distinct text; keeps the min id."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (docs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def _tokens(text_col: str):
    return F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")


def _shingle_array(text_col: str, k: int = 3):
    """Distinct token k-gram shingles of one document as an array column."""
    toks = _tokens(text_col)
    return F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    ))


def shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             k: int = 3) -> DataFrame:
    """Token k-gram shingles via native slice/transform (no UDF)."""
    return docs.select(F.col(id_col).alias("doc_id"),
                       F.explode(_shingle_array(text_col, k)).alias("shingle"))


def minhash_signatures(sh: DataFrame, n_hashes: int = N_HASHES,
                       portable: bool = False) -> DataFrame:
    """doc_id → array of n_hashes min-hashes. One groupBy with n_hashes
    algebraic min aggregates → single shuffle, map-side combine.

    portable=False (production default): TWO xxhash64 string hashes per
    shingle, expanded to n_hashes values with a Carter-Wegman 2-universal
    family h_i(x) = (a_i*x1 + b_i*x2 + c_i) mod (2^31-1) over the hash's
    32-bit halves — hashing the string n_hashes times is the dominant
    cost of the signature stage at scale, and the affine family is
    min-wise good enough because the base hash already uniformizes.
    All arithmetic stays below 2^49 (ANSI overflow-safe).
    portable=True: ONE md5 per shingle, its first 16 hex digits decoded
    to two 32-bit ints x1/x2 (digit-by-digit, so the construction is
    bit-identical in DuckDB), expanded with the SAME Carter-Wegman
    family — the oracle replays the exact signature math with integer
    arithmetic both engines share."""
    mersenne = (1 << 31) - 1
    if portable:
        from .. import semantics as S
        sh2 = sh.withColumn("_h", F.md5("shingle"))
        for p in range(16):
            sh2 = sh2.withColumn(f"_d{p}", F.expr(
                f"instr('0123456789abcdef', substring(_h, {p + 1}, 1)) - 1"))
        dl = lambda p: F.col(f"_d{p}").cast("long")  # noqa: E731
        x1 = sum((dl(p) * F.lit(16 ** (7 - p)) for p in range(1, 8)),
                 dl(0) * F.lit(16 ** 7))
        x2 = sum((dl(p) * F.lit(16 ** (15 - p)) for p in range(9, 16)),
                 dl(8) * F.lit(16 ** 7))
        sh2 = sh2.withColumn("_x1", x1).withColumn("_x2", x2)
        aggs = []
        for i in range(n_hashes):
            a = S.stable_hash("minhash-a", i, mod=1 << 16) | 1
            b = S.stable_hash("minhash-b", i, mod=1 << 16) | 1
            c = S.stable_hash("minhash-c", i, mod=mersenne)
            aggs.append(F.min(F.pmod(
                F.col("_x1") * F.lit(a) + F.col("_x2") * F.lit(b) + F.lit(c),
                F.lit(mersenne))).alias(f"h{i}"))
        sig = sh2.groupBy("doc_id").agg(*aggs)
    else:
        from .. import semantics as S
        sh2 = (sh.withColumn("_x1", F.shiftrightunsigned(
                   F.xxhash64("shingle"), 32))
               .withColumn("_x2", F.xxhash64(F.col("shingle"), F.lit(1))
                   .bitwiseAND(F.lit((1 << 32) - 1))))
        aggs = []
        for i in range(n_hashes):
            a = S.stable_hash("minhash-a", i, mod=1 << 16) | 1
            b = S.stable_hash("minhash-b", i, mod=1 << 16) | 1
            c = S.stable_hash("minhash-c", i, mod=mersenne)
            aggs.append(F.min(F.pmod(
                F.col("_x1") * F.lit(a) + F.col("_x2") * F.lit(b) + F.lit(c),
                F.lit(mersenne))).alias(f"h{i}"))
        sig = sh2.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("sig"))


def minhash_signatures_maponly(docs: DataFrame, id_col: str = "doc_id",
                               text_col: str = "text", k: int = 3,
                               n_hashes: int = N_HASHES,
                               respread: bool = True,
                               portable: bool = False) -> DataFrame:
    """doc_id → minhash signature with no DATA-SIZED shuffle.

    Shingles are per-document local, so the explode → groupBy(64 mins)
    round trip of :func:`minhash_signatures` moves data it never needed
    to move: at 10^11 shingle rows the exchange ships ~k× the corpus
    bytes (every shingle row). Here the signature is one narrow
    projection — a single ``transform`` computes the two xxhash64
    halves once per shingle, then one ``aggregate`` pass folds all 64
    Carter-Wegman mins in a single array traversal (struct-field reads
    inside the fold are register loads, not re-hashes). Bit-identical
    to ``minhash_signatures(shingles(docs))`` with portable=False —
    pinned by test — and the LSH stages downstream are unchanged.

    ``respread=True`` (default) round-robin-repartitions the RAW
    document rows first: the signature stage is compute-bound, so its
    parallelism must not inherit the scan's file layout (a single
    parquet file would otherwise run the whole corpus on one core).
    That exchange ships 1× the corpus — still k× cheaper than the
    grouped path's exploded-shingle shuffle. Pass respread=False when
    the input is already well-spread (e.g. a bucketed production
    table) for a fully exchange-free plan.

    ``portable=True`` swaps the xxhash64 halves for the md5-derived
    x1/x2 of :func:`minhash_signatures`'s portable family (one md5 per
    shingle, halves via 8-hex-digit conv) — bit-identical to the
    exploded+grouped portable path, so the DuckDB oracle replay is
    unchanged while the Spark side loses the shingle-row exchange.
    """
    from .. import semantics as S
    mersenne = (1 << 31) - 1
    if respread:
        docs = docs.repartition(
            docs.sparkSession.sparkContext.defaultParallelism)
    if portable:
        hs = F.transform(_shingle_array(text_col, k), F.md5)
        xs = F.transform(
            hs,
            lambda h: F.struct(
                F.conv(F.substring(h, 1, 8), 16, 10)
                .cast("long").alias("x1"),
                F.conv(F.substring(h, 9, 8), 16, 10)
                .cast("long").alias("x2")))
    else:
        xs = F.transform(
            _shingle_array(text_col, k),
            lambda s: F.struct(
                F.shiftrightunsigned(F.xxhash64(s), 32).alias("x1"),
                F.xxhash64(s, F.lit(1)).bitwiseAND(
                    F.lit((1 << 32) - 1)).alias("x2")))
    coeffs = []
    for i in range(n_hashes):
        coeffs.append((S.stable_hash("minhash-a", i, mod=1 << 16) | 1,
                       S.stable_hash("minhash-b", i, mod=1 << 16) | 1,
                       S.stable_hash("minhash-c", i, mod=mersenne)))

    def fold(acc, e):
        vals = F.array(*[
            F.pmod(e.x1 * F.lit(a) + e.x2 * F.lit(b) + F.lit(c),
                   F.lit(mersenne))
            for a, b, c in coeffs])
        return F.zip_with(acc, vals, lambda p, q: F.least(p, q))

    init = F.array(*[F.lit(mersenne).cast("long")] * n_hashes)
    return docs.select(F.col(id_col).alias("doc_id"),
                       F.aggregate(xs, init, fold).alias("sig"))


def lsh_candidate_pairs(sig: DataFrame, n_bands: int = N_BANDS,
                        portable: bool = False) -> DataFrame:
    """Band the signature; docs sharing any band-hash become a pair."""
    rpb = N_HASHES // n_bands

    def band_hash(b):
        joined = F.array_join(
            F.transform(F.slice("sig", b * rpb + 1, rpb),
                        lambda x: x.cast("string")), ",")
        return F.md5(joined) if portable else F.xxhash64(joined)

    bands = sig.select(
        "doc_id",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(n_bands - 1)), band_hash,
        )).alias("band", "band_hash"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.band_hash") == F.col("b.band_hash"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())


def minhash_dedup_pairs(docs: DataFrame, threshold: float = 0.8,
                        k_shingle: int = 3,
                        portable: bool = False) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: candidate pairs + exact
    shingle-Jaccard verification, pairs with jaccard >= threshold."""
    sh = shingles(docs, k=k_shingle).cache()
    sig = minhash_signatures_maponly(docs, k=k_shingle, portable=portable)
    pairs = lsh_candidate_pairs(sig, portable=portable)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (pairs.join(a, "doc_a").join(b, ["doc_b", "shingle"])
             .groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("inter")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jaccard", F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def jaccard_near_dup_pairs(docs: DataFrame, threshold: float,
                           df_cap: int | None = None,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Token-set Jaccard near-dup pairs via the posting-list self-join,
    with optional hot-token hygiene (VERDICT r3 item 7): a token in df
    documents contributes O(df^2) candidate pairs, so one
    corpus-frequent token is a quadratic hot key. With ``df_cap`` set,
    tokens with document frequency > df_cap are dropped from CANDIDATE
    GENERATION ONLY — verification recounts the intersection over ALL
    tokens of each candidate pair, so every emitted jaccard is exact.
    The (documented) recall trade: a pair whose shared tokens are ALL
    above the cap is never considered — the standard stop-shingle
    prune; at web scale set df_cap around the corpus's hot-key budget
    (e.g. 10^5), far above any token that discriminates.

    df_cap=None keeps the single-join shape (candidate join == exact
    intersection count, no second pass)."""
    d = docs
    toks = (d.select(F.col(id_col).alias("doc_id"),
                     F.explode(F.split(F.col(text_col), " ")).alias("tok"))
            .filter(F.col("tok") != "").distinct())
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = toks.alias("a")
    b = toks.alias("b")
    if df_cap is None:
        inter = (a.join(b, (F.col("a.tok") == F.col("b.tok"))
                        & (F.col("a.doc_id") < F.col("b.doc_id")))
                 .groupBy(F.col("a.doc_id").alias("doc_a"),
                          F.col("b.doc_id").alias("doc_b"))
                 .agg(F.count(F.lit(1)).alias("inter")))
    else:
        rare = (toks.groupBy("tok")
                .agg(F.count(F.lit(1)).alias("_df"))
                .filter(F.col("_df") <= df_cap).select("tok"))
        ct = toks.join(rare, "tok")  # same shuffle key as the self-join
        ca, cb = ct.alias("a"), ct.alias("b")
        cand = (ca.join(cb, (F.col("a.tok") == F.col("b.tok"))
                        & (F.col("a.doc_id") < F.col("b.doc_id")))
                .select(F.col("a.doc_id").alias("doc_a"),
                        F.col("b.doc_id").alias("doc_b"))
                .distinct())
        av = toks.select(F.col("doc_id").alias("doc_a"), "tok")
        bv = toks.select(F.col("doc_id").alias("doc_b"), "tok")
        inter = (cand.join(av, "doc_a").join(bv, ["doc_b", "tok"])
                 .groupBy("doc_a", "doc_b")
                 .agg(F.count(F.lit(1)).alias("inter")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("sz").alias("sz_b"))
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jaccard", F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def connected_components(pairs: DataFrame, nodes: DataFrame,
                         max_iter: int = 25) -> DataFrame:
    """Dedup-cluster connected components by iterative min-label
    propagation: every node's label converges to the smallest doc_id
    reachable through the pair graph. Output (doc_id, component).

    The loop is DRIVER-side over ITERATIONS (O(graph diameter) rounds,
    each one join + one min-groupBy — both map-side-combining hash
    ops); rows never pass through Python. Dup-cluster graphs are
    shallow (near-clique clusters from LSH/SimHash pair generators), so
    a handful of rounds converges; localCheckpoint() per round cuts the
    exponentially growing lineage that would otherwise re-execute every
    prior round inside each new one. Deterministic: min-labels are
    independent of partitioning and iteration interleaving.

    ``nodes`` is a one-column (doc_id) DataFrame of ALL docs (isolated
    docs form their own singleton component).
    """
    edges = (pairs.select(F.col("doc_a").alias("src"),
                          F.col("doc_b").alias("dst"))
             .unionByName(pairs.select(F.col("doc_b").alias("src"),
                                       F.col("doc_a").alias("dst")))
             .distinct().localCheckpoint(eager=True))
    labels = nodes.select(F.col(nodes.columns[0]).alias("node"),
                          F.col(nodes.columns[0]).alias("label"))
    changed = 0
    for _ in range(max_iter):
        # candidate label for each node: min over its neighbors' labels
        nbr = (edges.join(labels, edges.dst == labels.node)
               .groupBy(F.col("src").alias("node"))
               .agg(F.min("label").alias("nbr_label")))
        new_labels = (
            labels.join(nbr, "node", "left")
            .select("node", F.least(
                F.col("label"),
                F.coalesce("nbr_label", F.col("label"))).alias("label"))
            .localCheckpoint(eager=True))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
                   .filter(F.col("n.label") != F.col("o.label")).count())
        labels = new_labels
        if changed == 0:
            break
    if changed:
        # Falling out of range(max_iter) with labels still moving means
        # the graph diameter exceeds max_iter: the result would silently
        # diverge from the transitive closure. Fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge after {max_iter} "
            f"rounds ({changed} labels still changing); raise max_iter "
            f"(rounds needed ~ graph diameter)")
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("label").alias("component"))


def simhash_chunks_portable(docs: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Engine-portable SimHash: 64 bits derived from each token's md5
    hex digits (bit b = bit b%4 of hex char b//4), bit-majority vote,
    packed as four unsigned 16-bit chunks c0..c3. Identical math is
    expressible in DuckDB (md5 + strpos + shifts), so the driver oracle
    can replay it; the xxhash64 ``simhash`` stays the fast prod default."""
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       F.explode(_tokens(text_col)).alias("tok"))
    hx = toks.withColumn("h", F.md5("tok"))
    # decode each of the 16 hex digits ONCE, then the 64 bit votes are
    # cheap shifts over the digit columns (4x fewer string ops)
    for p in range(16):
        hx = hx.withColumn(f"d{p}", F.expr(
            f"instr('0123456789abcdef', substring(h, {p + 1}, 1)) - 1"))
    votes = []
    for b in range(64):
        bit = F.shiftright(F.col(f"d{b // 4}"), b % 4).bitwiseAND(F.lit(1))
        votes.append(F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"b{b}"))
    agg = hx.groupBy("doc_id").agg(*votes)
    chunk_cols = []
    for i in range(4):
        terms = None
        for j in range(16):
            t = F.when(F.col(f"b{i * 16 + j}") > 0, F.lit(1 << j)).otherwise(0)
            terms = t if terms is None else terms + t
        chunk_cols.append(terms.cast("int").alias(f"c{i}"))
    return agg.select("doc_id", *chunk_cols)


def simhash_near_pairs_chunks(chunks: DataFrame,
                              max_hamming: int = 16) -> DataFrame:
    """Near-dup pairs from the chunked representation: candidates share
    at least one equal 16-bit chunk (pigeonhole), hamming = sum of
    bit_count(xor) over the four chunks."""
    bands = chunks.select(
        "doc_id", "c0", "c1", "c2", "c3",
        F.posexplode(F.array("c0", "c1", "c2", "c3")).alias("chunk_idx", "chunk"))
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (a.join(b, (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
                    & (F.col("a.chunk") == F.col("b.chunk"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     *[F.col(f"a.c{i}").alias(f"a{i}") for i in range(4)],
                     *[F.col(f"b.c{i}").alias(f"b{i}") for i in range(4)])
             .distinct())
    hamming = None
    for i in range(4):
        t = F.bit_count(F.col(f"a{i}").bitwiseXOR(F.col(f"b{i}")))
        hamming = t if hamming is None else hamming + t
    return (pairs.withColumn("hamming", hamming.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))


def simhash(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document, bit-majority over token hashes."""
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       F.explode(_tokens(text_col)).alias("tok"))
    h = F.xxhash64("tok")
    votes = [
        F.sum(F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1)
              .otherwise(-1)).alias(f"b{b}")
        for b in range(64)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    bit_terms = None
    for b in range(64):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(0) * F.lit(1 << b if b < 63 else -(1 << 63)).cast("long")
        bit_terms = term if bit_terms is None else bit_terms + term
    return agg.select("doc_id", bit_terms.alias("simhash"))


def simhash_near_pairs(sim: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by Hamming distance, candidate-generated by exact
    match on one of four 16-bit chunks (pigeonhole: hamming<=3*chunks
    guarantees one equal chunk; at max_hamming>3 it is a recall-traded
    approximation, standard practice)."""
    chunks = sim.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*[
            F.shiftrightunsigned("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF))
            for i in range(4)
        ])).alias("chunk_idx", "chunk"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    pairs = (a.join(b, (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
                    & (F.col("a.chunk") == F.col("b.chunk"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     F.col("a.simhash").alias("sh_a"),
                     F.col("b.simhash").alias("sh_b"))
             .distinct())
    return (pairs.withColumn("hamming", F.bit_count(
        F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming"))


def repeated_span_coverage(docs: DataFrame, n: int = 8,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """ExactSubstr-lite (Lee et al. 2022 "Deduplicating Training Data
    Makes Language Models Better"): for every document, the fraction of
    token positions covered by a token n-gram whose exact text occurs
    at least twice anywhere in the corpus (other docs or a repeat
    within the same doc). The full suffix-array construction is
    replaced by fixed-width n-gram spans — the standard distributed
    relaxation; coverage is computed exactly from the surviving span
    starts with integer interval arithmetic (no approximation past the
    fixed width).

    Output (doc_id, n_tokens, n_repeated_spans, covered_tokens,
    coverage_frac) for docs with at least one repeated span.

    Scale shape: map-only n-gram explode (md5 digests: fixed 16-byte
    join keys) -> one shuffle keyed by gram for the global occurrence
    count (window over the gram partition, partial-combine-free but
    uniformly keyed: dup grams are rare by definition, so no skew) ->
    one shuffle keyed by doc_id for the ordered span-merge window ->
    per-doc agg. No self-join materializing the quadratic pair set."""
    toks = F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
                    lambda t: t != "")
    g = F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, n))))
    ).otherwise(F.array().cast("array<string>"))
    grams = docs.select(
        F.col(id_col).alias("doc_id"), F.size(toks).alias("n_tokens"),
        F.posexplode(g).alias("pos0", "gram"))
    # 1-based span start, matching a SQL oracle's unnest(range(1, ...))
    grams = grams.select("doc_id", "n_tokens",
                         (F.col("pos0") + 1).alias("i"), "gram")
    w_gram = Window.partitionBy("gram")
    shared = (grams.withColumn("occ", F.count(F.lit(1)).over(w_gram))
              .filter(F.col("occ") >= 2))
    w_doc = Window.partitionBy("doc_id").orderBy("i")
    spans = shared.withColumn(
        "cov", F.least(F.lit(n),
                       F.coalesce(F.lead("i").over(w_doc), F.col("i") + n)
                       - F.col("i")))
    return (spans.groupBy("doc_id", "n_tokens")
            .agg(F.count(F.lit(1)).alias("n_repeated_spans"),
                 F.sum("cov").alias("covered_tokens"))
            .select("doc_id", "n_tokens", "n_repeated_spans",
                    "covered_tokens",
                    (F.round(F.col("covered_tokens").cast("double")
                             / F.col("n_tokens").cast("double"), 6)
                     + F.lit(0.0)).alias("coverage_frac")))


def incremental_near_dup(new_docs: DataFrame, old_docs: DataFrame,
                         threshold: float = 0.84,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Incremental ingestion dedup: flag each NEW document whose
    token-set Jaccard similarity against any document already in the
    corpus reaches ``threshold``, and report its best match. The
    batch-vs-corpus shape is what a continuously-fed pipeline actually
    runs — re-deduping the full corpus per batch is the 10^12-row
    anti-pattern.

    Output per new doc: (doc_id, best_match, best_jaccard, is_dup) —
    best_match/best_jaccard NULL/0.0 when the new doc shares no token
    with the corpus. Ranking uses the 6dp-rounded score with an id
    tiebreak, so the winner is engine- and partitioning-deterministic
    (jaccard is a ratio of exact integers — identical doubles in every
    engine).

    Scale: posting-list equi-join on the token — the new batch's token
    set is small, so the join is effectively an index probe into the
    corpus posting list; never a cross join. At web scale the corpus
    side is the pre-materialized token index (write once, probe per
    batch), and frequent-token pruning caps posting-list fan-out.
    """
    def toks(d: DataFrame) -> DataFrame:
        return (d.select(F.col(id_col).alias("doc_id"),
                         F.explode(F.split(F.coalesce(F.col(text_col),
                                                      F.lit("")), " "))
                         .alias("tok"))
                .filter(F.col("tok") != "").distinct())

    nt, ot = toks(new_docs), toks(old_docs)
    n_sizes = nt.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz_n"))
    o_sizes = ot.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz_o"))
    inter = (nt.alias("n").join(ot.alias("o"), F.col("n.tok") == F.col("o.tok"))
             .groupBy(F.col("n.doc_id").alias("new_id"),
                      F.col("o.doc_id").alias("old_id"))
             .agg(F.count(F.lit(1)).alias("inter")))
    scored = (inter
              .join(n_sizes.withColumnRenamed("doc_id", "new_id"), "new_id")
              .join(o_sizes.withColumnRenamed("doc_id", "old_id"), "old_id")
              .withColumn("jaccard", F.round(
                  F.col("inter")
                  / (F.col("sz_n") + F.col("sz_o") - F.col("inter")), 6)))
    w = Window.partitionBy("new_id").orderBy(F.desc("jaccard"),
                                             F.asc("old_id"))
    best = (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") == 1)
            .select("new_id", F.col("old_id").alias("best_match"),
                    F.col("jaccard").alias("best_jaccard")))
    return (new_docs.select(F.col(id_col).alias("doc_id"))
            .join(best, F.col("doc_id") == F.col("new_id"), "left")
            .select("doc_id", "best_match",
                    F.coalesce(F.col("best_jaccard"), F.lit(0.0))
                    .alias("best_jaccard"),
                    (F.coalesce(F.col("best_jaccard"), F.lit(0.0))
                     >= threshold).cast("int").alias("is_dup")))


def semantic_fingerprint_dedup(tags: DataFrame,
                               id_cols: tuple = ("conv_id", "turn_idx"),
                               concept_col: str = "concept_id") -> DataFrame:
    """Ontology-aware dedup: cluster units (turns) by WHAT they talk
    about rather than their surface text — the exact set of linked
    concepts is the unit's semantic fingerprint, and units with
    identical fingerprints are semantic duplicates even when their
    wording differs (the complement of ``exact_dedup``'s md5-of-text
    identity).

    Input is the mention/tag table (one row per unit×concept, dups
    tolerated); output is one row per fingerprint cluster: the sorted
    comma-joined concept set, its size, the number of member units,
    and the lexicographically-first member as the keeper
    (deterministic representative, same convention as exact_dedup).

    Scale shape: two keyed hash aggs — groupBy(unit) collect_set
    (map-side partial on the unit key) then groupBy(fingerprint) — and
    nothing else: no joins, no windows, output linear in the number of
    distinct fingerprints. The fingerprint string is bounded by the
    ontology's branch width (concept sets per turn are small), not by
    corpus size, so the second shuffle key stays short at any sf.
    """
    unit_key = F.concat_ws(
        ":", *[F.col(c).cast("string") for c in id_cols])
    per_unit = (tags
                .groupBy(*id_cols)
                .agg(F.sort_array(F.collect_set(concept_col))
                     .alias("concept_set"))
                .select(unit_key.alias("unit"),
                        F.concat_ws(",", "concept_set").alias("fingerprint"),
                        F.size("concept_set").alias("set_size")))
    return (per_unit
            .groupBy("fingerprint")
            .agg(F.max("set_size").cast("long").alias("set_size"),
                 F.count(F.lit(1)).alias("n_units"),
                 F.min("unit").alias("keeper")))


def boilerplate_segments(docs: DataFrame, seg_words: int = 8,
                         df_cap: int = 20, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """CCNet-style duplicated-segment (boilerplate) removal: split each
    document into consecutive ``seg_words``-token segments, count in how
    many DISTINCT documents each segment string occurs corpus-wide, and
    drop from every document the segments that appear in more than
    ``df_cap`` documents — headers, footers, navigation chrome, cookie
    banners: the text that repeats across pages verbatim. (CCNet does
    this per line; transcripts have no newlines, so the fixed-width
    token segment is the line proxy.) [K: CCNet, Wenzek et al. 2020 —
    dedup by duplicated paragraphs/lines before LM filtering.]

    Output: one row per input document (id spine preserved) with the
    segment count, dropped-segment count, the cleaned text (kept
    segments re-joined in original order), and its length.

    Scale shape: tokenize + segment with JVM array functions (zero
    Python); ONE hash agg keyed on the segment string computes document
    frequency with a map-side partial (distinct (seg, doc) first, so
    repeats inside one doc don't inflate df); the boilerplate set is
    ``df > df_cap`` — by construction small (boilerplate is few distinct
    strings in many docs) — and is BROADCAST left-anti-joined against
    the segment stream, so the big table never shuffles on the segment
    key twice. Reassembly is one groupBy(doc) with array_sort over
    (pos, seg) structs. No windows.
    """
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: t != "")
    segs = (docs
            .select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
            .select("doc_id",
                    F.expr(
                        f"transform(sequence(0, greatest(size(toks) - 1, 0)"
                        f" DIV {seg_words}),"
                        f" i -> struct(i AS pos, concat_ws(' ',"
                        f" slice(toks, i * {seg_words} + 1, {seg_words}))"
                        f" AS seg))").alias("seglist"),
                    F.size("toks").alias("n_toks"))
            .select("doc_id", F.explode_outer(
                F.when(F.col("n_toks") > 0, F.col("seglist"))
                .otherwise(F.expr("array()"))).alias("s"))
            .select("doc_id", F.col("s.pos").alias("pos"),
                    F.col("s.seg").alias("seg")))
    hot = (segs.where(F.col("seg").isNotNull())
           .select("seg", "doc_id").distinct()
           .groupBy("seg").agg(F.count(F.lit(1)).alias("df"))
           .where(F.col("df") > df_cap)
           .select("seg"))
    kept = segs.where(F.col("seg").isNotNull()).join(
        F.broadcast(hot), "seg", "left_anti")
    per_doc = (kept.groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_kept"),
                    F.concat_ws(" ", F.expr(
                        "transform(array_sort(collect_list("
                        "struct(pos, seg))), x -> x.seg)"))
                    .alias("clean_text")))
    totals = (segs.where(F.col("seg").isNotNull())
              .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_segs")))
    spine = docs.select(F.col(id_col).alias("doc_id"))
    return (spine
            .join(totals, "doc_id", "left")
            .join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_segs", F.lit(0)).cast("long")
                    .alias("n_segs"),
                    (F.coalesce("n_segs", F.lit(0))
                     - F.coalesce("n_kept", F.lit(0))).cast("long")
                    .alias("n_dropped"),
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    F.length(F.coalesce("clean_text", F.lit("")))
                    .cast("long").alias("clean_chars")))


def containment_pairs(docs: DataFrame, threshold_ppm: int,
                      df_cap: int | None = None,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Token-set CONTAINMENT near-dup pairs — catches the subset/quote
    case Jaccard misses: a short doc fully embedded in a long one has
    tiny Jaccard (union is dominated by the long doc) but containment
    |A∩B| / min(|A|,|B|) ≈ 1. Same posting-list candidate shape as
    jaccard_near_dup_pairs (including the df_cap hot-token hygiene and
    the exact all-token verify); the score is exact ppm integers, so
    ranking/filtering is merge-order-free. Output one row per candidate
    pair with containment ≥ threshold: (doc_small, doc_big) oriented by
    token-set size (ties → lower id is doc_small), containment_ppm,
    plus jaccard_ppm for contrast."""
    toks = (docs.select(F.col(id_col).alias("doc_id"),
                        F.explode(F.split(F.col(text_col), " "))
                        .alias("tok"))
            .filter(F.col("tok") != "").distinct())
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    src = toks
    if df_cap is not None:
        rare = (toks.groupBy("tok")
                .agg(F.count(F.lit(1)).alias("_df"))
                .filter(F.col("_df") <= df_cap).select("tok"))
        src = toks.join(rare, "tok")
    ca, cb = src.alias("a"), src.alias("b")
    cand = (ca.join(cb, (F.col("a.tok") == F.col("b.tok"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    av = toks.select(F.col("doc_id").alias("doc_a"), "tok")
    bv = toks.select(F.col("doc_id").alias("doc_b"), "tok")
    inter = (cand.join(av, "doc_a").join(bv, ["doc_b", "tok"])
             .groupBy("doc_a", "doc_b")
             .agg(F.count(F.lit(1)).alias("inter")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("sz").alias("sz_b"))
    j = inter.join(sa, "doc_a").join(sb, "doc_b")
    small = F.when(F.col("sz_a") <= F.col("sz_b"), F.col("doc_a")) \
        .otherwise(F.col("doc_b"))
    big = F.when(F.col("sz_a") <= F.col("sz_b"), F.col("doc_b")) \
        .otherwise(F.col("doc_a"))
    out = (j.select(
        small.cast("long").alias("doc_small"),
        big.cast("long").alias("doc_big"),
        F.expr("inter * 1000000 DIV least(sz_a, sz_b)")
        .alias("containment_ppm"),
        F.expr("inter * 1000000 DIV (sz_a + sz_b - inter)")
        .alias("jaccard_ppm"))
        .filter(F.col("containment_ppm") >= threshold_ppm))
    # the useful product is "my best container", not the all-pairs list
    # (with a small shared vocabulary most pairs clear any threshold):
    # keep ONE container per small doc — highest containment, then the
    # LOWEST jaccard (the most asymmetric, i.e. most container-like
    # partner), then lowest id. The window partitions by doc_small.
    w = Window.partitionBy("doc_small").orderBy(
        F.desc("containment_ppm"), F.asc("jaccard_ppm"), F.asc("doc_big"))
    return (out.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1).drop("rk"))


def blocking_audit(docs: DataFrame, threshold: float,
                   k_shingle: int = 3) -> DataFrame:
    """Entity-resolution blocking QUALITY audit of the MinHash-LSH
    blocker: pairs completeness, pairwise precision, and reduction
    ratio — the three standard blocking metrics [K] a dedup pipeline
    owner reads before trusting LSH at scale.

    - truth  = exact shingle-Jaccard ≥ threshold over ALL pairs sharing
      ≥1 shingle (complete for threshold > 0: disjoint pairs have J=0),
      generated by the posting-list self-join — run on a BOUNDED audit
      sample, never the full corpus;
    - cand   = the LSH band candidates (portable md5 flavor, the same
      blocker dedup_minhash_lsh verifies);
    - pairs_completeness_ppm = |cand ∩ truth| · 1e6 DIV |truth| (recall
      of the blocker), precision_ppm = hit · 1e6 DIV |cand|, and
      reduction_ratio_ppm = 1e6 − |cand| · 1e6 DIV C(n,2) (how much of
      the quadratic comparison space blocking eliminates).

    One summary row, exact integers. Scale shape: audit-sample-bounded;
    both pair generators are equi-joins (shingle posting lists / band
    hashes), the intersection is an equi-join on (doc_a, doc_b), and
    the metrics are single algebraic aggregates.
    """
    sh = shingles(docs, k=k_shingle).cache()
    cand = lsh_candidate_pairs(minhash_signatures(sh, portable=True),
                               portable=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (a.join(b, "shingle").filter(F.col("doc_a") < F.col("doc_b"))
             .groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("inter")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("sz").alias("sz_b"))
    truth = (inter.join(sa, "doc_a").join(sb, "doc_b")
             .withColumn("jaccard", F.round(
                 F.col("inter")
                 / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
             .filter(F.col("jaccard") >= threshold)
             .select("doc_a", "doc_b"))
    both = (cand.withColumn("in_cand", F.lit(1))
            .join(truth.withColumn("in_true", F.lit(1)),
                  ["doc_a", "doc_b"], "full_outer")
            .agg(F.sum(F.coalesce("in_cand", F.lit(0))).alias("n_cand"),
                 F.sum(F.coalesce("in_true", F.lit(0))).alias("n_true"),
                 F.sum(F.coalesce("in_cand", F.lit(0))
                       * F.coalesce("in_true", F.lit(0))).alias("n_hit")))
    n_docs = sizes.agg(F.count(F.lit(1)).alias("n_docs"))
    m = n_docs.crossJoin(both)
    return m.select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_cand").cast("long").alias("n_cand"),
        F.col("n_true").cast("long").alias("n_true"),
        F.col("n_hit").cast("long").alias("n_hit"),
        F.expr("n_hit * 1000000 DIV n_true").cast("long")
         .alias("pairs_completeness_ppm"),
        F.expr("n_hit * 1000000 DIV n_cand").cast("long")
         .alias("precision_ppm"),
        F.expr("1000000 - n_cand * 1000000 DIV (n_docs * (n_docs - 1) DIV 2)")
         .cast("long").alias("reduction_ratio_ppm"))


def dedup_savings(components: DataFrame, docs: DataFrame) -> DataFrame:
    """Dedup savings report: per multi-document near-dup cluster — its
    size, survivor (min doc_id, the same survivorship rule as
    dedup_canonical's default order), total bytes, duplicate bytes
    (everything except the survivor's), and exact-integer savings ratio
    — the artifact a pipeline owner reads to decide whether a dedup
    pass pays for itself at 100 TB.

    Scale shape: one equi-join of the component labels to doc lengths
    on doc_id, one component-keyed hash agg (count / sum / min / min_by
    are all algebraic with map-side partials). No windows.
    """
    labeled = components.join(
        docs.select("doc_id", "n_chars"), "doc_id")
    agg = (labeled.groupBy("component")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.min("doc_id").cast("long").alias("rep_doc"),
                F.sum("n_chars").cast("long").alias("total_chars"),
                F.min_by("n_chars", "doc_id").cast("long")
                 .alias("rep_chars")))
    return (agg.filter(F.col("n_docs") >= 2)
            .select(F.col("component").cast("long").alias("component"),
                    "n_docs", "rep_doc", "total_chars",
                    (F.col("total_chars") - F.col("rep_chars"))
                    .cast("long").alias("dup_chars"),
                    F.expr("(total_chars - rep_chars) * 1000000"
                           " DIV total_chars")
                     .cast("long").alias("savings_ppm")))
