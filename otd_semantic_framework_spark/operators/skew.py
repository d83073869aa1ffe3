"""P11 — salted repartitioning for hot keys.

North star: "salted repartitioning to defuse skew from hot conversations
and frequent concepts". The fixture corpus deliberately contains one
conversation holding ~5% of all turns (FIXTURES.md B1); at 10^12 turns a
single hot conv_id would pin one task for the window/groupBy stages.

Pattern: add ``salt = pmod(xxhash64(key...), n_salt)``, repartition on
(key, salt), aggregate in TWO phases — partial by (key, salt), final by
key. Only algebraic aggregates (max/sum/count/min) are salt-distributive;
rank/row_number are NOT — always de-salt before window ranking
(SURVEY.md §4 risk 2; encoded in tests/test_skew.py: results are
invariant under n_salt ∈ {1, 8, 64}).

AQE skew-join splitting (enabled in session.py) is the backstop for
join-side skew; this module handles aggregation-side skew which AQE does
not cover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ALGEBRAIC = {"max": F.max, "min": F.min, "sum": F.sum, "count": F.count}


def with_salt(df: DataFrame, cols: list[str], n_salt: int = 16,
              salt_col: str = "salt") -> DataFrame:
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salt)))


def salted_repartition(df: DataFrame, key: str, n_salt: int = 16,
                       num_partitions: int | None = None) -> DataFrame:
    """Spread a hot key over n_salt partitions. Salt is a deterministic
    hash of the full row key-set where possible — here of (key, a
    uniform-ish secondary) — so re-runs produce identical placement."""
    sub = F.col("turn_idx") if "turn_idx" in df.columns else F.lit(0)
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(key), sub), F.lit(n_salt)))
    parts = [F.col(key), F.col("_salt")]
    rep = salted.repartition(num_partitions, *parts) if num_partitions \
        else salted.repartition(*parts)
    return rep.drop("_salt")


def salted_agg(df: DataFrame, keys: list[str], aggs: dict[str, tuple[str, str]],
               n_salt: int = 16) -> DataFrame:
    """Two-phase salted aggregation.

    aggs: out_col -> (fn_name, in_col) with fn in max/min/sum/count.
    Phase 1 aggregates by (keys + salt) — the hot key's rows split across
    n_salt reducers; phase 2 merges the n_salt partials per key (tiny).
    """
    for fn, _ in aggs.values():
        if fn not in _ALGEBRAIC:
            raise ValueError(f"{fn} is not salt-distributive; de-salt first")
    salted = with_salt(df, keys, n_salt, "_salt")
    partial = salted.groupBy(*keys, "_salt").agg(*[
        _ALGEBRAIC[fn](c).alias(out) for out, (fn, c) in aggs.items()])
    merge = {"count": F.sum}  # counts merge by summing partials
    return partial.groupBy(*keys).agg(*[
        merge.get(fn, _ALGEBRAIC[fn])(out).alias(out)
        for out, (fn, _) in aggs.items()])


def skew_profile(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """Key-skew diagnostic — the measurement you run BEFORE deciding a
    key needs salting: the ``top_k`` heaviest keys with their row count,
    rank, and corpus share in exact ppm (integer arithmetic — no float
    sum whose merge order could wobble the report).

    Output: (key, n_rows, rank, share_ppm), rank 1 = heaviest, ties
    broken by key ascending so the report is deterministic.

    Scale: one partial-aggregating groupBy on the key (the same shuffle
    the skewed job itself would pay), a 1-row total broadcast back, and
    TakeOrderedAndProject for the top-k (per-partition heaps — never a
    global sort or single-partition window over all keys). The final
    rank window runs over top_k rows only.
    """
    from pyspark.sql import Window
    counts = (df.groupBy(F.col(key_col).alias("key"))
              .agg(F.count(F.lit(1)).alias("n_rows")))
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    top = (counts.orderBy(F.desc("n_rows"), F.asc("key")).limit(top_k)
           .crossJoin(F.broadcast(total)))
    w = Window.orderBy(F.desc("n_rows"), F.asc("key"))
    return top.select(
        "key", "n_rows",
        F.row_number().over(w).cast("int").alias("rank"),
        # floor() explicitly: a bare double->bigint CAST truncates in
        # Spark but rounds in DuckDB — floor is the portable spelling
        F.floor((F.col("n_rows") * 1000000) / F.col("_total"))
        .cast("bigint").alias("share_ppm"))


def heavy_hitters(df: DataFrame, col: str, phi_inv: int) -> DataFrame:
    """EXACT heavy hitters — every value with frequency >= N/phi_inv —
    in bounded memory: the two-pass Misra-Gries shape.

    Pass 1 (candidates): each partition keeps a Misra-Gries summary of
    k = 2*phi_inv counters inside mapInPandas — per-batch counting is a
    vectorized value_counts; the decrement step touches only the O(k)
    counter dict, never rows. A value with global frequency >= N/phi_inv
    MUST survive in at least one partition's summary (if it were
    undercut everywhere, sum over partitions of N_p/k = N/(2*phi_inv)
    would exceed its true count — contradiction), so the union of
    per-partition candidates is a guaranteed superset.

    Pass 2 (exact): broadcast the candidate set (<= k per partition),
    semi-join-prune the scan, exact count, and keep
    count * phi_inv >= N — pure integer comparison, so the result is
    EXACT and independent of partitioning even though the candidate set
    is not.

    Why not just groupBy(col).count()? Over an unbounded key domain
    (URLs, shingles) at 10^12 rows the full aggregate shuffles every
    distinct key; this shape shuffles only candidates. ``phi_inv`` is
    the integer 1/phi (e.g. 25 -> keys holding >= 4% of rows), kept
    integral so the threshold is an exact cross-multiplication on both
    engines (no float boundary).
    """
    from collections.abc import Iterator

    import pandas as pd

    if phi_inv < 1:
        raise ValueError("phi_inv must be a positive integer")
    k = 2 * phi_inv

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():  # O(uniq/batch)
                counters[v] = counters.get(v, 0) + int(c)
            while len(counters) > k:
                m = min(counters.values())
                counters = {key: n - m for key, n in counters.items()
                            if n > m}
        if counters:
            yield pd.DataFrame({col: list(counters)})

    df = df.filter(F.col(col).isNotNull())  # null is never a hitter
    cands = (df.select(col).mapInPandas(mg, schema=f"{col} string")
             .distinct())
    total = df.agg(F.count(F.lit(1)).alias("_n"))
    return (df.join(F.broadcast(cands), col, "left_semi")
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("freq"))
            .crossJoin(F.broadcast(total))
            .filter(F.col("freq") * phi_inv >= F.col("_n"))
            .select(col, "freq"))
