"""P11 — salting: results invariant under n_salt ∈ {1, 8, 64}
(SURVEY.md §5.2.5); two-phase agg equals plain agg; non-algebraic
aggregates are rejected."""

import pytest
from pyspark.sql import functions as F

from otd_semantic_framework_spark.operators.skew import (
    salted_agg, salted_repartition, with_salt)


def _plain(df):
    return sorted(
        (r.conv_id, r.n, r.mx) for r in
        df.groupBy("conv_id").agg(
            F.count("turn_idx").alias("n"), F.max("turn_idx").alias("mx")
        ).collect())


def test_salted_agg_invariant(spark, tiny_df):
    want = _plain(tiny_df)
    for n_salt in (1, 8, 64):
        got = sorted(
            (r.conv_id, r.n, r.mx) for r in
            salted_agg(tiny_df, ["conv_id"],
                       {"n": ("count", "turn_idx"), "mx": ("max", "turn_idx")},
                       n_salt=n_salt).collect())
        assert got == want, f"n_salt={n_salt}"


def test_salted_agg_rejects_nonalgebraic(spark, tiny_df):
    with pytest.raises(ValueError):
        salted_agg(tiny_df, ["conv_id"], {"r": ("rank", "turn_idx")})


def test_salted_repartition_preserves_rows(spark, tiny_df):
    rep = salted_repartition(tiny_df, "conv_id", n_salt=8, num_partitions=16)
    assert rep.count() == tiny_df.count()
    assert sorted(r.conv_id for r in rep.select("conv_id").collect()) == \
        sorted(r.conv_id for r in tiny_df.select("conv_id").collect())


def test_with_salt_bounded_deterministic(spark, tiny_df):
    s1 = with_salt(tiny_df, ["conv_id"], 16).select("conv_id", "salt").collect()
    s2 = with_salt(tiny_df.repartition(9), ["conv_id"], 16).select("conv_id", "salt").collect()
    assert all(0 <= r.salt < 16 for r in s1)
    assert {(r.conv_id, r.salt) for r in s1} == {(r.conv_id, r.salt) for r in s2}


def test_hot_conversation_exists(tiny_pdf):
    # fixture really is skewed: conv-000000 holds >= 5% of turns
    counts = tiny_pdf.groupby("conv_id").size()
    assert counts["conv-000000"] == counts.max()
    assert counts["conv-000000"] >= 0.05 * counts.sum()
