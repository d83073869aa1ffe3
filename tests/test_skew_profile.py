"""Tests for the key-skew profiler (operators/skew.py:skew_profile)."""

from __future__ import annotations

from otd_semantic_framework_spark.operators.skew import skew_profile


def test_skew_profile_ranks_and_shares(spark):
    # key 'hot' 60 rows, 'warm' 30, 'cold' 10 -> shares 600000/300000/100000
    rows = [("hot",)] * 60 + [("warm",)] * 30 + [("cold",)] * 10
    df = spark.createDataFrame(rows, "k string")
    got = {r.key: r for r in skew_profile(df, "k").collect()}
    assert [got[k].rank for k in ("hot", "warm", "cold")] == [1, 2, 3]
    assert got["hot"].n_rows == 60 and got["hot"].share_ppm == 600000
    assert got["warm"].share_ppm == 300000
    assert got["cold"].share_ppm == 100000


def test_skew_profile_top_k_and_tiebreak(spark):
    # 5 keys with equal counts: tie broken by key ascending; top_k=3 cap
    rows = [(f"k{i}",) for i in range(5) for _ in range(4)]
    df = spark.createDataFrame(rows, "k string")
    out = sorted(skew_profile(df, "k", top_k=3).collect(),
                 key=lambda r: r.rank)
    assert [r.key for r in out] == ["k0", "k1", "k2"]
    assert all(r.n_rows == 4 and r.share_ppm == 200000 for r in out)


def test_skew_profile_partition_invariant(spark):
    rows = [(f"k{i % 7}",) for i in range(200)]
    df = spark.createDataFrame(rows, "k string")
    a = sorted(map(tuple, skew_profile(df, "k").collect()))
    b = sorted(map(tuple, skew_profile(df.repartition(13), "k").collect()))
    assert a == b


def test_heavy_hitters_exact_and_partition_invariant(spark):
    """Misra-Gries candidates + exact recount: result equals the plain
    groupBy answer and is identical under different partitionings, even
    with a key domain far larger than the counter budget."""
    from otd_semantic_framework_spark.operators.skew import heavy_hitters
    rows = (["hot"] * 400 + ["warm"] * 100
            + [f"cold{i}" for i in range(500)])  # N=1000, 502 keys
    df = spark.createDataFrame([(v,) for v in rows], "tok string")
    got = {(r.tok, r.freq) for r in heavy_hitters(df, "tok", 10).collect()}
    # threshold N/10 = 100: hot (400) and warm (100, boundary) qualify
    assert got == {("hot", 400), ("warm", 100)}
    again = {(r.tok, r.freq)
             for r in heavy_hitters(df.repartition(13), "tok", 10).collect()}
    assert again == got
    # counter budget (2*phi_inv=20) is far below 502 distinct keys, so
    # the guarantee ran through real decrements, not a degenerate case
    assert df.select("tok").distinct().count() > 20


def test_heavy_hitters_null_and_validation(spark):
    import pytest
    from otd_semantic_framework_spark.operators.skew import heavy_hitters
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), ("b",)], "tok string")
    got = {(r.tok, r.freq) for r in heavy_hitters(df, "tok", 2).collect()}
    assert got == {("a", 2)}  # null excluded; b (1/3) under threshold
    with pytest.raises(ValueError):
        heavy_hitters(df, "tok", 0)
