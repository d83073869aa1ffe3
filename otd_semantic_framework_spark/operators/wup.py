"""P8 — all-pairs Wu-Palmer concept-similarity matrix.

wup(a,b) = 2*depth(lcs)/(depth(a)+depth(b)), root depth 1 (so
wup(root,root)=1) — the formula the reference applies over its SKOS tree
to build the cached concept x concept matrix [K] ("the precomputed
ontology concept-similarity matrix", BASELINE.json north_star).

Computed as pure DataFrame algebra (SURVEY.md P8): explode each
concept's root→self ancestor ``path`` with its positional depth, self-join
on shared ancestor, take max ancestor depth per pair = LCS depth, apply
the formula. The ontology is tiny (~10^2 concepts → ~10^4 pairs), so this
runs once, is persisted as the ``concept_similarity`` table, and every
consumer gets it via ``broadcast()`` — it never participates in a
shuffle at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def concept_similarity(ontology: DataFrame) -> DataFrame:
    """ontology_concepts → (concept_a, concept_b, wup) for ALL ordered pairs."""
    anc = ontology.select(
        F.col("concept_id"),
        F.col("depth"),
        F.posexplode("path").alias("anc_pos", "anc_id"),
    ).withColumn("anc_depth", F.col("anc_pos") + 1)

    a = anc.select(
        F.col("concept_id").alias("concept_a"),
        F.col("depth").alias("depth_a"),
        "anc_id", "anc_depth",
    )
    b = anc.select(
        F.col("concept_id").alias("concept_b"),
        F.col("depth").alias("depth_b"),
        "anc_id",
        F.col("anc_depth").alias("anc_depth_b"),
    )
    return (
        a.join(b, (a.anc_id == b.anc_id) & (a.anc_depth == b.anc_depth_b))
        .groupBy("concept_a", "concept_b", "depth_a", "depth_b")
        .agg(F.max("anc_depth").alias("lcs_depth"))
        .select(
            "concept_a", "concept_b",
            (2.0 * F.col("lcs_depth") / (F.col("depth_a") + F.col("depth_b"))).alias("wup"),
        )
    )
