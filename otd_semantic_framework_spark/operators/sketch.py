"""Fixed-size sketch structures for corpus-scale membership.

At 100 TB the decontamination / URL-dedup primitive is a Bloom filter:
the probe side (an eval set, a blocklist, yesterday's key set) is folded
into a bit array whose size is FIXED by the chosen false-positive rate —
independent of how large the probe set grows — and the corpus scan
probes it map-side with zero shuffles. ``ngram_contamination``
(operators/curation.py) broadcasts the exact probe-gram set, which is
perfect while eval sets are small; this module is the scale path for
when the membership set itself is large: the broadcast payload is
bounded by ``nbits`` (8 KiB at the default 2¹⁶), never by the data.

Hashing follows the repo's md5-replay convention so DuckDB can rebuild
the identical filter digit-by-digit: position *i* of a gram is the
first 4 hex digits of md5(gram_digest ‖ ':' ‖ i) — exactly 16 bits, so
no modulo is needed and ``nbits`` is pinned at 65536. False positives
are a *property* of the structure, not noise: the operator reports both
the Bloom verdict and the exact ground truth per document, so the
pairing verifies the sketch's false-positive behavior itself is
deterministic and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bit-array width — exactly 4 md5 hex digits, so positions need no mod
BLOOM_NBITS = 65536
#: hash functions per key (k = 3 → fp ≈ fill³: 0.1% at 10% fill,
#: ~1.6% at 25% fill)
BLOOM_K = 3


def _grams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Distinct word n-grams as md5 digests — same tokenizer and slice
    convention as operators/curation.ngram_contamination (split on
    single space, drop empties, md5 of the space-joined window)."""
    toks = F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
                    lambda t: t != "")
    g = F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.md5(F.concat_ws(
                        " ", F.slice(toks, i + 1, n))))
    ).otherwise(F.array().cast("array<string>"))
    return df.select(F.col(id_col), F.explode(g).alias("gram")).distinct()


def _positions(gram_col: str) -> "F.Column":
    """k Bloom positions of a gram digest: int(md5(digest:i)[:4], 16)."""
    return F.array(*[
        F.conv(F.substring(
            F.md5(F.concat_ws(":", F.col(gram_col), F.lit(str(i)))),
            1, 4), 16, 10).cast("long")
        for i in range(BLOOM_K)])


def bloom_build(probes: DataFrame, n: int = 5, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Set bits of the Bloom filter over the probe set's n-grams — a
    DataFrame of distinct positions (≤ BLOOM_NBITS rows, ~8 KiB as a
    bitmap), built with one map-side explode + one distinct. This is
    the whole sketch: its size is capped by the bit width however many
    probe grams stream in."""
    return (_grams(probes, id_col, text_col, n)
            .select(F.explode(_positions("gram")).alias("pos"))
            .distinct())


def bloom_decontaminate(corpus: DataFrame, probes: DataFrame, n: int = 5,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Bloom-filter decontamination with exact false-positive audit.

    Per corpus document: distinct n-gram count, Bloom-positive gram
    count (all k positions set), exact probe-set hits, and the
    structural false positives (bloom − exact). The corpus side is a
    map-only explode into a BROADCAST join against the fixed-size bit
    set — the 100 TB scan never shuffles on anything bigger than its
    own (doc, gram) dedup. The exact-audit join broadcasts the true
    gram set too; in production that column is optional and the scan
    is purely map-side.
    """
    bits = F.broadcast(bloom_build(probes, n, id_col, text_col))
    true_grams = F.broadcast(
        _grams(probes, id_col, text_col, n).select("gram").distinct())
    cg = _grams(corpus, id_col, text_col, n)
    hit = (cg.select(id_col, "gram",
                     F.explode(_positions("gram")).alias("pos"))
           .join(bits, "pos")
           .groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("n_set"))
           .filter(F.col("n_set") == BLOOM_K)
           .groupBy(id_col).agg(F.count(F.lit(1)).alias("n_bloom_hits")))
    true = (cg.join(true_grams, "gram")
            .groupBy(id_col).agg(F.count(F.lit(1)).alias("n_true_hits")))
    per_doc = cg.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    return (corpus.select(id_col).distinct()
            .join(per_doc, id_col, "left")
            .join(hit, id_col, "left")
            .join(true, id_col, "left")
            .select(
                id_col,
                F.coalesce("n_grams", F.lit(0)).cast("long")
                .alias("n_grams"),
                F.coalesce("n_bloom_hits", F.lit(0)).cast("long")
                .alias("n_bloom_hits"),
                F.coalesce("n_true_hits", F.lit(0)).cast("long")
                .alias("n_true_hits"),
                (F.coalesce("n_bloom_hits", F.lit(0))
                 - F.coalesce("n_true_hits", F.lit(0))).cast("long")
                .alias("n_false_pos"),
                (F.coalesce("n_bloom_hits", F.lit(0)) > 0)
                .alias("is_flagged")))


#: count-min sketch shape: depth (independent hash rows) × width (buckets)
CMS_DEPTH = 4
CMS_WIDTH = 64


def _cms_bucket_expr(salt: str, key_sql: str) -> str:
    """Portable bucket: first two md5 hex nibbles of 'cms{salt}:'‖key,
    decoded digit-by-digit (the minhash md5-replay convention), mod
    CMS_WIDTH — identical arithmetic in Spark SQL (instr) and DuckDB
    (strpos, emitted by the paired oracle)."""
    h = f"md5(concat('cms{salt}:', {key_sql}))"
    d0 = f"(instr('0123456789abcdef', substring({h}, 1, 1)) - 1)"
    d1 = f"(instr('0123456789abcdef', substring({h}, 2, 1)) - 1)"
    return f"(({d0} * 16 + {d1}) % {CMS_WIDTH})"


def cms_estimate(df: DataFrame, key_col: str,
                 depth: int = CMS_DEPTH) -> DataFrame:
    """Count-min sketch [K: Cormode & Muthukrishnan 2005] frequency
    estimation with the exact truth alongside: per key — exact count,
    CMS estimate (min over ``depth`` hashed bucket counters), and the
    overestimate (>= 0 ALWAYS; CMS never undercounts — the paired
    oracle and a pytest pin exactly that).

    Why a sketch when the exact groupBy is right there: the sketch
    table is depth × CMS_WIDTH counters — a FIXED-size aggregate
    independent of key cardinality, the streaming/low-memory path for
    heavy-hitter queries over unbounded key domains (URLs, n-grams) at
    100 TB. Shape: one explode of depth (row, bucket) pairs per input
    row → one hash agg into the fixed counter table (map-side partial,
    256 groups) → broadcast join of the probe keys' buckets back onto
    it. Deterministic md5 bucketing, exact integers end to end.
    """
    pairs = df.select(F.col(key_col).alias("k"), F.explode(F.array(*[
        F.struct(F.lit(i).alias("r"),
                 F.expr(_cms_bucket_expr(str(i), key_col))
                 .cast("int").alias("bucket"))
        for i in range(depth)])).alias("rb"))
    sketch = (pairs.groupBy(F.col("rb.r").alias("r"),
                            F.col("rb.bucket").alias("bucket"))
              .agg(F.count(F.lit(1)).alias("c")))
    exact = (df.groupBy(F.col(key_col).alias("k"))
             .agg(F.count(F.lit(1)).alias("exact_n")))
    probe = exact.select("k", "exact_n", F.explode(F.array(*[
        F.struct(F.lit(i).alias("r"),
                 F.expr(_cms_bucket_expr(str(i), "k"))
                 .cast("int").alias("bucket"))
        for i in range(depth)])).alias("rb"))
    return (probe
            .join(F.broadcast(sketch),
                  (probe.rb.r == sketch.r) & (probe.rb.bucket == sketch.bucket))
            .groupBy("k", "exact_n")
            .agg(F.min("c").alias("est_n"))
            .select(F.col("k").alias(key_col),
                    F.col("exact_n").cast("long").alias("exact_n"),
                    F.col("est_n").cast("long").alias("est_n"),
                    (F.col("est_n") - F.col("exact_n")).cast("long")
                    .alias("overestimate")))
