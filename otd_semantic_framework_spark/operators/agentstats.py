"""Agent-transcript analytics over the (conv_id, turn_idx, role, text,
tool, ts) table — the operational read-side a team running the KG
pipeline on agent transcripts needs: which tools fire, in what order,
and how long they take.

All operators are pure DataFrame/SQL (no UDFs): window functions over
the per-conversation ordering plus hash aggregations, so Catalyst keeps
them whole-stage-codegen'd and every shuffle is keyed by conv_id (the
same partitioning the KG pipeline itself uses — at 10^12 turns these
piggyback on the pipeline's existing clustering instead of adding a new
shuffle shape).

SURVEY.md §2A P2 (window-ordered turn assembly) is the substrate; these
are its read-side consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tool_transitions(transcripts: DataFrame) -> DataFrame:
    """Tool-call bigram (Markov transition) counts per conversation.

    For every conversation, order the tool-invoking turns by turn_idx
    and count (prev_tool -> tool) transitions across the corpus, plus
    the number of distinct conversations exhibiting each transition.

    Scale: one window shuffle keyed by conv_id (narrow after the KG
    pipeline's own repartition) + one partial-aggregated groupBy on the
    (prev_tool, tool) pair — the pair domain is |tools|^2, tiny, so the
    final agg is a broadcast-sized reduce no matter the corpus size.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = (transcripts
         .filter(F.col("tool").isNotNull())
         .select("conv_id", "turn_idx", "tool"))
    pairs = (t.withColumn("prev_tool", F.lag("tool").over(w))
              .filter(F.col("prev_tool").isNotNull()))
    return (pairs.groupBy("prev_tool", "tool")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.countDistinct("conv_id").alias("n_convs")))


def tool_latency(transcripts: DataFrame,
                 ts_col: str = "ts_s") -> DataFrame:
    """Per-tool latency stats: for each tool turn, the gap between its
    timestamp and the immediately preceding turn (any role) in the same
    conversation; aggregated to (n_calls, avg/min/max seconds) per tool.

    ``ts_col`` is an integer epoch-seconds column (keep the hashable
    surface integer; callers with real timestamps pass
    ``F.unix_timestamp(ts)`` projections).

    Scale: identical shape to :func:`tool_transitions` — one conv_id
    window, one tiny-domain groupBy.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lat = (transcripts
           .select("conv_id", "turn_idx", "tool", ts_col)
           .withColumn("lat_s", F.col(ts_col) - F.lag(ts_col).over(w))
           .filter(F.col("tool").isNotNull() & F.col("lat_s").isNotNull()))
    return (lat.groupBy("tool")
            .agg(F.count(F.lit(1)).alias("n_calls"),
                 (F.round(F.avg("lat_s"), 6) + F.lit(0.0)).alias("avg_lat_s"),
                 F.min("lat_s").alias("min_lat_s"),
                 F.max("lat_s").alias("max_lat_s")))


def scd2_history(events: DataFrame, key_col: str, attr_col: str,
                 ts_col: str, tiebreak_col: str) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a change
    stream: collapse consecutive identical ``attr_col`` values per
    ``key_col`` (gaps-and-islands), then derive half-open validity
    intervals [eff_from, eff_to) via lead(); the open row (eff_to NULL)
    is flagged ``is_current``.

    ``tiebreak_col`` makes the per-key ordering total when timestamps
    tie — without it the version numbering would be nondeterministic
    across runs/engines.

    Scale: two windows over the SAME (key, order) spec — Catalyst plans
    a single sort+shuffle keyed by key_col and evaluates both windows
    in one pass; no self-join, no driver state. This is the standard
    CDC-to-dimension materialization shape for a 10^12-row change log.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changes = (events
               .select(key_col, attr_col, ts_col, tiebreak_col)
               .withColumn("_prev", F.lag(attr_col).over(w))
               .filter(F.col("_prev").isNull()
                       | (F.col("_prev") != F.col(attr_col))))
    wc = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return changes.select(
        key_col, attr_col,
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("eff_from_us"),
        F.unix_micros(F.lead(ts_col).over(wc).cast("timestamp"))
         .alias("eff_to_us"),
        F.row_number().over(wc).cast("long").alias("version"),
        F.when(F.lead(ts_col).over(wc).isNull(), 1)
         .otherwise(0).cast("int").alias("is_current"))


def triangle_count(edges: DataFrame,
                   src: str = "src", dst: str = "dst") -> DataFrame:
    """Count triangles each vertex participates in, over an undirected
    simple graph given as (src, dst) pairs (any orientation, duplicates
    tolerated).

    Canonicalizes to src < dst, dedups, then enumerates each triangle
    exactly once via the ordered 3-way equi-join (a<b, b<c, a<c) and
    re-attributes one participation to each corner.

    Scale: the classic MapReduce triangle enumeration — every join is
    an equi-join on a vertex id (shuffle- or broadcast-joinable), never
    a cross product. Degree skew (celebrity vertices) is the known
    hazard at web scale; the ordered-pair canonicalization already
    halves each hub's fan-out, and the joins inherit AQE skew-split.
    """
    e = (edges
         .select(F.least(F.col(src), F.col(dst)).alias("a"),
                 F.greatest(F.col(src), F.col(dst)).alias("b"))
         .filter(F.col("a") < F.col("b"))
         .distinct())
    e1 = e.alias("e1")
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c")).alias("e2")
    e3 = e.select(F.col("a").alias("a3"), F.col("b").alias("c3")).alias("e3")
    tri = (e1.join(e2, "b")
             .join(e3, (F.col("a") == F.col("a3"))
                   & (F.col("c") == F.col("c3")))
             .select("a", "b", "c"))
    corners = (tri.select(F.col("a").alias("v"))
               .unionAll(tri.select(F.col("b").alias("v")))
               .unionAll(tri.select(F.col("c").alias("v"))))
    return corners.groupBy(F.col("v").alias("concept_id")) \
                  .agg(F.count(F.lit(1)).alias("n_triangles"))
