"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting — the vectorized-UDF members live here
(SQL-expressible ones are in plans/driver_queries.py with oracles).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# char-bigram profiles for a tiny language-ID heuristic. Deterministic,
# dependency-free stand-in for a real LID model (fasttext etc. absent in
# this sandbox) — the Spark plumbing (vectorized UDF over Arrow batches)
# is the real deliverable.
_PROFILES = {
    "en": ["th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"],
    "de": ["er", "en", "ch", "de", "ei", "te", "in", "nd", "ie", "ge"],
    "es": ["de", "es", "en", "el", "la", "os", "ar", "ue", "ra", "as"],
    "fr": ["es", "le", "de", "en", "re", "nt", "on", "er", "te", "ou"],
}

_BPE_ISH = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]")


@pandas_udf(T.StructType([
    T.StructField("pred_lang", T.StringType()),
    T.StructField("lang_score", T.DoubleType()),
]))
def langid_udf(texts: pd.Series) -> pd.DataFrame:
    """Whole-batch vectorized: per profile bigram one C-speed
    ``str.count`` over the Series (≈40 passes total), never a per-row
    Python loop — ~10x the row-wise value_counts formulation."""
    import numpy as np
    t = texts.fillna("").str.lower()
    n_bigrams = (t.str.len() - 1).clip(lower=0)
    scores = {}
    for lang, profile in _PROFILES.items():
        s = None
        for bg in profile:
            c = t.str.count(re.escape(bg))
            s = c if s is None else s + c
        scores[lang] = np.where(n_bigrams > 0, s / n_bigrams.clip(lower=1), 0.0)
    langs = list(scores)
    mat = np.stack([scores[lang] for lang in langs])  # L x N
    best_idx = mat.argmax(axis=0)
    best = mat.max(axis=0)
    pred = np.where(best > 0, np.asarray(langs)[best_idx], "und")
    from .. import semantics as S
    return pd.DataFrame({"pred_lang": pred,
                         "lang_score": S.round_half_away(best, 6)})


@pandas_udf(T.IntegerType())
def bpe_ish_token_count(texts: pd.Series) -> pd.Series:
    """Sub-word-ish token count: letter runs + digit runs + punctuation,
    a cheap proxy for BPE token counts."""
    return texts.map(lambda t: len(_BPE_ISH.findall(t.lower())) if t else 0).astype("int32")


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    out = docs.withColumn("_lid", langid_udf(F.col(text_col)))
    return (out.withColumn("pred_lang", F.col("_lid.pred_lang"))
            .withColumn("lang_score", F.col("_lid.lang_score")).drop("_lid"))


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    ws = F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != ""))
    return (docs.withColumn("ws_tokens", ws)
            .withColumn("bpe_ish_tokens", bpe_ish_token_count(F.col(text_col))))
