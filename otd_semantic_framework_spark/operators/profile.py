"""Column-level data profiling — the ops-side primitive every
large-table workflow starts with (schema drift detection, null audits,
partition sizing decisions).

Single-pass design: ALL metrics for ALL requested columns are computed
in ONE aggregation over ONE scan (Catalyst plans the multiple
count-distincts via Expand — a constant-factor row multiplication, not
an extra pass), producing a 1-row frame that is then unpivoted
driver-free into the long (column, metrics) shape. No joins, no second
scan, no collect: at 10^12 rows the cost is one map-side-combining
reduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str],
                    decimals: int = 6) -> DataFrame:
    """Profile numeric columns: total rows, nulls, distinct count,
    min / max / exact interpolated median (Spark ``percentile`` ≡
    DuckDB ``quantile_cont``). Output one row per column:
    (col_name, n, n_null, n_distinct, min_v, max_v, median_v)."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.count_if(F.col(c).isNull()).alias(f"{c}__n_null"),
            F.count_distinct(F.col(c)).alias(f"{c}__n_distinct"),
            F.round(F.min(c).cast("double"), decimals).alias(f"{c}__min"),
            F.round(F.max(c).cast("double"), decimals).alias(f"{c}__max"),
            F.round(F.expr(f"percentile({c}, 0.5)"), decimals)
            .alias(f"{c}__med"),
        ]
    row = df.agg(*aggs)
    stacked = F.explode(F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"{c}__n").alias("n"),
            F.col(f"{c}__n_null").alias("n_null"),
            F.col(f"{c}__n_distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_v"),
            F.col(f"{c}__max").alias("max_v"),
            F.col(f"{c}__med").alias("median_v"),
        ) for c in cols]))
    return (row.select(stacked.alias("p"))
            .select("p.col_name", "p.n", "p.n_null", "p.n_distinct",
                    "p.min_v", "p.max_v", "p.median_v"))
