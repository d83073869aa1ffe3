"""Snapshot versioning / time travel on the Storage parquet branch
(Iceberg VERSION-AS-OF parity; closes the documented read-during-merge
constraint of the backup-rename swap)."""

from __future__ import annotations

import pytest

from otd_semantic_framework_spark.sources.storage import Storage

_SCHEMA = ("subj string, pred string, obj string, conv_id string, "
           "turn_idx int, score double")


def _batch(spark, rows):
    return spark.createDataFrame(
        [(f"turn:c-{c}:{t}", "mentions", o, f"c-{c}", t, s)
         for c, t, o, s in rows], _SCHEMA)


def test_merge_snapshot_versions_and_time_travel(spark, tmp_path):
    st = Storage(str(tmp_path))
    a = _batch(spark, [(0, 0, "x", 0.5), (0, 1, "y", 0.7)])
    b = _batch(spark, [(0, 0, "x", 0.9), (1, 0, "z", 0.4)])
    r1 = {(r.subj, r.obj, r.score) for r in
          st.merge_snapshot(spark, "triples", a).collect()}
    assert st.current_version("triples") == 1
    r2 = {(r.subj, r.obj, r.score) for r in
          st.merge_snapshot(spark, "triples", b).collect()}
    assert st.current_version("triples") == 2
    # time travel: v1 unchanged after the second merge
    v1 = {(r.subj, r.obj, r.score) for r in
          st.read_snapshot(spark, "triples", version=1).collect()}
    assert v1 == r1
    # merge semantics: max score wins, new keys appended
    assert ("turn:c-0:0", "x", 0.9) in r2
    assert ("turn:c-1:0", "z", 0.4) in r2
    assert ("turn:c-0:1", "y", 0.7) in r2
    ops = [s["operation"] for s in st.snapshots("triples")]
    assert ops == ["create", "merge"]


def test_old_reader_survives_later_merges(spark, tmp_path):
    """A DataFrame resolved against v1 must still collect AFTER later
    commits — the exact constraint the swap-based merge_triples
    documents as unsupported on parquet."""
    st = Storage(str(tmp_path))
    st.merge_snapshot(spark, "triples", _batch(spark, [(0, 0, "x", 0.5)]))
    old_reader = st.read_snapshot(spark, "triples")  # resolves v1 files
    st.merge_snapshot(spark, "triples", _batch(spark, [(1, 0, "y", 0.6)]))
    st.merge_snapshot(spark, "triples", _batch(spark, [(2, 0, "z", 0.7)]))
    assert old_reader.count() == 1  # v1 files untouched by v2/v3 commits
    assert st.read_snapshot(spark, "triples").count() == 3


def test_merge_snapshot_content_equals_merge_triples(spark, tmp_path):
    batches = [
        _batch(spark, [(0, 0, "x", 0.5), (0, 1, "y", 0.7)]),
        _batch(spark, [(0, 0, "x", 0.9), (1, 0, "z", 0.4)]),
        _batch(spark, [(0, 0, "x", 0.2), (2, 5, "w", 1.0)]),
    ]
    snap = Storage(str(tmp_path / "snap"))
    swap = Storage(str(tmp_path / "swap"))
    for b in batches:
        got_snap = snap.merge_snapshot(spark, "triples", b)
        got_swap = swap.merge_triples(spark, "triples", b)
    key = lambda r: (r.subj, r.pred, r.obj, r.conv_id, r.turn_idx, r.score)
    assert sorted(map(key, got_snap.collect())) == \
        sorted(map(key, got_swap.collect()))


def test_expire_snapshots_keeps_current(spark, tmp_path):
    st = Storage(str(tmp_path))
    for i in range(4):
        st.merge_snapshot(spark, "triples",
                          _batch(spark, [(i, 0, f"o{i}", 0.5)]))
    assert st.current_version("triples") == 4
    expired = st.expire_snapshots(spark, "triples", keep_last=2)
    assert expired == 2
    assert [s["version"] for s in st.snapshots("triples")] == [3, 4]
    assert st.read_snapshot(spark, "triples").count() == 4  # current fine
    assert st.read_snapshot(spark, "triples", version=3).count() == 3
    with pytest.raises(FileNotFoundError):
        st.read_snapshot(spark, "triples", version=1)


def test_read_snapshot_without_commits_raises(spark, tmp_path):
    st = Storage(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        st.read_snapshot(spark, "missing")
