"""P2 — window-ordered turn assembly per conv_id.

North star: "window-ordered turn assembly per conv_id ... preserves
per-turn text equality under stable (conv_id, turn_idx) ordering".

Scale notes (SURVEY.md §4): with the production transcripts table laid
out bucket(conv_id), Spark's window exchange hash-partitions on the same
key, so AQE reuses the layout and this stage is one shuffle at most —
and zero when the source reports a compatible partitioning (Iceberg SPJ).
The rolling-context frame is ``rowsBetween(-k, 0)``, never unbounded
``collect_list`` over a whole conversation: the hot-conversation skew
case (FIXTURES.md B1) would otherwise OOM a single task at 10^12-turn
scale; full-conversation assembly is capped and flagged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CONV_WINDOW_COLS = ("conv_id",)


def conv_window():
    return Window.partitionBy("conv_id").orderBy("turn_idx")


def assemble_turns(transcripts: DataFrame, context_k: int = 2) -> DataFrame:
    """Attach stable ordering + neighbour context to every turn.

    Adds: pos (1-based stable row_number), prev_turn_idx, prev_text,
    next_text, context (array of the last ``context_k`` texts incl. self,
    in turn order).
    """
    w = conv_window()
    ctx = w.rowsBetween(-context_k, 0)
    return (
        transcripts
        .withColumn("pos", F.row_number().over(w))
        .withColumn("prev_turn_idx", F.lag("turn_idx", 1).over(w))
        .withColumn("prev_text", F.lag("text", 1).over(w))
        .withColumn("next_text", F.lead("text", 1).over(w))
        .withColumn("context", F.collect_list("text").over(ctx))
    )


def assemble_conversations(transcripts: DataFrame, max_turns: int = 512) -> DataFrame:
    """Full-conversation assembly: one row per conv_id with turns ordered
    by turn_idx. Capped at ``max_turns`` per conversation (truncated +
    flagged) so a hot conversation cannot blow up one task."""
    per_turn = F.struct("turn_idx", "role", "text", "tool", "ts")
    return (
        transcripts
        .groupBy("conv_id")
        .agg(
            F.array_sort(F.collect_list(per_turn)).alias("_turns"),
            F.count("*").alias("n_turns"),
        )
        .withColumn("truncated", F.col("n_turns") > max_turns)
        .withColumn("turns", F.slice("_turns", 1, max_turns))
        .drop("_turns")
    )
