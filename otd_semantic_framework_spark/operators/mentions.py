"""P4/P5 — vectorized mention detection + explode.

North star: "vectorized pandas/Arrow-UDF mention detection". The
reference extracts spaCy noun-chunk terms per document [K]; spaCy is
absent in this sandbox (SURVEY.md §0 [L]) so mention detection is a
gazetteer n-gram matcher: greedy longest-match left-to-right over
normalized tokens against the broadcast ontology label set
(``semantics.find_mentions`` — the same pure function the pandas
mini-oracle uses).

Scale notes: the gazetteer (a few hundred strings) ships inside the UDF
closure — one copy per executor python worker, not per row. The UDF is a
scalar pandas_udf over Arrow batches; per batch it is a tight Python loop
over rows but each row costs O(tokens) dict lookups only. mention_id is
``xxhash64(conv_id, turn_idx, tok_start)`` — deterministic, so re-runs /
resumed runs emit identical ids (SURVEY.md §4 risk 3; never
``monotonically_increasing_id`` in persisted output).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .. import semantics as S
from ..schemas import MENTION_STRUCT

_MENTIONS_TYPE = T.ArrayType(MENTION_STRUCT)


def mention_detector_udf(gazetteer: dict[str, str], max_ngram: int = S.MAX_NGRAM,
                         use_regex: bool = True):
    """Build the pandas_udf closing over the gazetteer.

    use_regex=True (default): compiled leftmost-longest alternation —
    the hot loop runs in the C regex engine, ~3-5x the pure-Python
    token walk; exact-equivalent semantics (pinned by tests)."""
    if use_regex:
        pattern = S.gazetteer_pattern(gazetteer, max_ngram)

        @pandas_udf(_MENTIONS_TYPE)
        def detect(norm_texts: pd.Series) -> pd.Series:
            find = S.find_mentions_regex
            return norm_texts.map(
                lambda t: [] if not t else find(t, pattern))

        return detect

    keys = frozenset(gazetteer)

    @pandas_udf(_MENTIONS_TYPE)
    def detect(norm_texts: pd.Series) -> pd.Series:
        find = S.find_mentions
        return norm_texts.map(
            lambda t: [] if not t else find(t, keys, max_ngram)
        )

    return detect


def detect_mentions(df: DataFrame, gazetteer: dict[str, str],
                    norm_col: str = "norm_text",
                    use_regex: bool = True) -> DataFrame:
    """Add a ``mentions`` array<struct<surface,tok_start,tok_end>> column."""
    return df.withColumn(
        "mentions",
        mention_detector_udf(gazetteer, use_regex=use_regex)(F.col(norm_col)))


def detect_mentions_exploded(df: DataFrame, gazetteer: dict[str, str],
                             max_ngram: int = S.MAX_NGRAM,
                             norm_col: str = "norm_text") -> DataFrame:
    """Fused P4+P5 hot path: mapInPandas that emits exploded mention
    rows directly — output identical to
    ``explode_mentions(detect_mentions(df))`` (test-pinned), including
    the deterministic xxhash64 mention_id, but ~2x faster:

    - ONE regex pass per Arrow batch over a ``\\x00``-joined mega-string
      (normalized text is strictly ``[a-z0-9 ]`` so the separator can
      never match or merge across rows) instead of a per-row
      ``Series.map`` lambda;
    - token offsets via numpy cumulative space counts — O(1) per match
      rather than O(prefix) ``str.count``;
    - no array-of-struct Arrow serialization and no separate explode.

    HARD PRECONDITION: ``norm_col`` must already be normalized to the
    ``[a-z0-9 ]`` single-space alphabet (what both built-in normalizers
    in operators/normalize.py emit). The mega-string encodes as ASCII
    and token offsets count single spaces, so any other input is
    rejected with an explicit error naming the offending row rather
    than an opaque UnicodeEncodeError deep in an executor.
    """
    import numpy as np

    pattern = S.gazetteer_pattern(gazetteer, max_ngram)
    out_schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("surface", T.StringType()),
        T.StructField("tok_start", T.IntegerType()),
        T.StructField("tok_end", T.IntegerType()),
    ])

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            texts = pdf[norm_col].fillna("").tolist()
            mega = "\x00".join(texts)
            try:
                mega_bytes = mega.encode("ascii")
            except UnicodeEncodeError:
                bad = next(t for t in texts if not t.isascii())
                raise ValueError(
                    "detect_mentions_exploded requires [a-z0-9 ]-normalized "
                    f"text (run normalize_turns first); offending row text: "
                    f"{bad[:80]!r}") from None
            starts: list[int] = []
            surfaces: list[str] = []
            for m in pattern.finditer(mega):
                starts.append(m.start())
                surfaces.append(m.group(0))
            if not starts:
                continue
            arr = np.frombuffer(mega_bytes, dtype=np.uint8)
            lens = np.fromiter((len(t) for t in texts), dtype=np.int64,
                               count=len(texts))
            offsets = np.zeros(len(texts), dtype=np.int64)
            if len(texts) > 1:
                np.cumsum(lens[:-1] + 1, out=offsets[1:])
            cumspace = np.concatenate(
                ([0], np.cumsum(arr == 32, dtype=np.int64)))
            st = np.asarray(starts, dtype=np.int64)
            rows = np.searchsorted(offsets, st, side="right") - 1
            tok_start = (cumspace[st] - cumspace[offsets[rows]]).astype("int32")
            n_toks = np.fromiter((s.count(" ") + 1 for s in surfaces),
                                 dtype=np.int32, count=len(surfaces))
            yield pd.DataFrame({
                "conv_id": pdf["conv_id"].to_numpy()[rows],
                "turn_idx": pdf["turn_idx"].to_numpy()[rows],
                "surface": surfaces,
                "tok_start": tok_start,
                "tok_end": tok_start + n_toks,
            })

    exploded = df.select("conv_id", "turn_idx", norm_col).mapInPandas(
        gen, schema=out_schema)
    return exploded.select(
        "conv_id", "turn_idx",
        F.xxhash64("conv_id", "turn_idx", F.col("tok_start")).alias("mention_id"),
        "surface", "tok_start", "tok_end")


def detect_canonical_concepts_exploded(
        df: DataFrame, gazetteer: dict[str, str],
        canonical_pdf: pd.DataFrame,
        max_ngram: int = S.MAX_NGRAM,
        norm_col: str = "norm_text") -> DataFrame:
    """Fully-fused P4+P5+P7–P9 hot path: ONE mapInPandas stage that
    regex-detects mentions (same mega-string machinery as
    ``detect_mentions_exploded``), maps each surface to its precomputed
    canonical (concept_id, link_score) in-batch, and max-dedups per
    (turn, concept) — so every emitted row is already unique within its
    turn.  Output rows equal
    ``canonicalize_broadcast(detect_mentions_exploded(df), canonical_pdf)``
    reduced to one max-score row per (conv_id, turn_idx, concept_id)
    (pinned by tests/test_mentions.py).

    Scale rationale: the per-turn dedup is the ONLY source of duplicate
    (subj, pred, obj) mention triples — a turn's mentions always live in
    one Arrow batch, so collapsing them here makes the downstream triple
    stream globally unique by construction and deletes the full-corpus
    dedup shuffle (the second wide boundary of ``build_triples_fast``).
    At 10^12 turns that shuffle moves ~the whole triple table through
    shared disk/network; this trades it for a vectorized in-batch
    lexsort. The broadcast-join stage disappears with it: the canonical
    table (a few hundred rows) ships once per python worker in the UDF
    closure, exactly like the gazetteer.
    """
    import numpy as np

    pattern = S.gazetteer_pattern(gazetteer, max_ngram)
    # surface -> (dense concept code, link_score); unmatched surfaces
    # (sub-threshold, absent from the canonical table) drop out exactly
    # like the inner broadcast join they replace.
    concept_ids = canonical_pdf["concept_id"].astype(str).unique().tolist()
    code_of = {c: i for i, c in enumerate(concept_ids)}
    canon_map = {
        r.surface: (code_of[r.concept_id], float(r.link_score))
        for r in canonical_pdf.itertuples(index=False)
    }
    concept_arr = np.asarray(concept_ids, dtype=object)

    out_schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("concept_id", T.StringType()),
        T.StructField("link_score", T.DoubleType()),
    ])

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            texts = pdf[norm_col].fillna("").tolist()
            mega = "\x00".join(texts)
            try:
                mega_bytes = mega.encode("ascii")
            except UnicodeEncodeError:
                bad = next(t for t in texts if not t.isascii())
                raise ValueError(
                    "detect_canonical_concepts_exploded requires "
                    "[a-z0-9 ]-normalized text (run normalize_turns "
                    f"first); offending row text: {bad[:80]!r}") from None
            starts: list[int] = []
            codes: list[int] = []
            scores: list[float] = []
            get = canon_map.get
            for m in pattern.finditer(mega):
                hit = get(m.group(0))
                if hit is None:
                    continue
                starts.append(m.start())
                codes.append(hit[0])
                scores.append(hit[1])
            if not starts:
                continue
            del mega_bytes  # ascii guarantee was the only use
            lens = np.fromiter((len(t) for t in texts), dtype=np.int64,
                               count=len(texts))
            offsets = np.zeros(len(texts), dtype=np.int64)
            if len(texts) > 1:
                np.cumsum(lens[:-1] + 1, out=offsets[1:])
            st = np.asarray(starts, dtype=np.int64)
            rows = np.searchsorted(offsets, st, side="right") - 1
            cid = np.asarray(codes, dtype=np.int64)
            sc = np.asarray(scores, dtype=np.float64)
            # per-(row, concept) max: lexsort (primary row, then concept,
            # then score descending) and keep each group's first entry
            order = np.lexsort((-sc, cid, rows))
            r_s, c_s, s_s = rows[order], cid[order], sc[order]
            first = np.ones(len(r_s), dtype=bool)
            first[1:] = (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1])
            r_f, c_f, s_f = r_s[first], c_s[first], s_s[first]
            yield pd.DataFrame({
                "conv_id": pdf["conv_id"].to_numpy()[r_f],
                "turn_idx": pdf["turn_idx"].to_numpy()[r_f],
                "concept_id": concept_arr[c_f],
                "link_score": s_f,
            })

    return df.select("conv_id", "turn_idx", norm_col).mapInPandas(
        gen, schema=out_schema)


def explode_mentions(df: DataFrame) -> DataFrame:
    """P5: one row per mention with a deterministic mention_id."""
    return (
        df.select(
            "conv_id", "turn_idx",
            F.explode("mentions").alias("m"),
        )
        .select(
            "conv_id", "turn_idx",
            F.xxhash64("conv_id", "turn_idx", F.col("m.tok_start")).alias("mention_id"),
            F.col("m.surface").alias("surface"),
            F.col("m.tok_start").alias("tok_start"),
            F.col("m.tok_end").alias("tok_end"),
        )
    )
