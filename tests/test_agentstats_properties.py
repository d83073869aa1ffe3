"""Property tests for SCD2 history and triangle counting: random
inputs vs brute-force python references (hypothesis-driven, bounded
sizes so the Spark round-trip stays fast)."""

from __future__ import annotations

import datetime as dt
from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st

from otd_semantic_framework_spark.operators.agentstats import (
    scd2_history, triangle_count)

# a change stream: per user a short list of (ts_offset_s, attr) events
change_streams = st.dictionaries(
    st.integers(min_value=1, max_value=4),              # user_id
    st.lists(st.tuples(st.integers(min_value=0, max_value=50),
                       st.sampled_from(["a", "b", "c"])),
             min_size=1, max_size=8),
    min_size=1, max_size=3)


def _scd2_reference(streams):
    """Brute-force SCD2: sort per user by (ts, event_id), collapse
    consecutive equal attrs, emit [from, to) intervals."""
    out = []
    for user, evs in streams.items():
        rows = sorted(evs, key=lambda e: (e[2], e[3]))  # (ts, event_id)
        changes = []
        prev = None
        for attr, _u, ts, eid in rows:
            if prev is None or attr != prev:
                changes.append((attr, ts))
            prev = attr
        for i, (attr, ts) in enumerate(changes):
            to = changes[i + 1][1] if i + 1 < len(changes) else None
            out.append((user, attr, ts, to, i + 1, int(to is None)))
    # (user, version) is a total key; plain tuple sort would compare a
    # None eff_to against a datetime when same-ts events tie the prefix
    return sorted(out, key=lambda t: (t[0], t[4]))


@settings(max_examples=8, deadline=None)
@given(change_streams)
def test_scd2_matches_bruteforce(spark, streams):
    base = dt.datetime(2025, 1, 1)
    eid = 0
    rows, ref_in = [], {}
    for user, evs in streams.items():
        ref_in[user] = []
        for off, attr in evs:
            eid += 1
            rows.append((eid, base + dt.timedelta(seconds=off), user, attr))
            ref_in[user].append((attr, user,
                                 base + dt.timedelta(seconds=off), eid))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = sorted(
        ((r.user_id, r.event_type,
          dt.datetime(1970, 1, 1)
          + dt.timedelta(microseconds=r.eff_from_us),
          (dt.datetime(1970, 1, 1)
           + dt.timedelta(microseconds=r.eff_to_us))
          if r.eff_to_us is not None else None,
          r.version, r.is_current)
         for r in scd2_history(ev, "user_id", "event_type", "ts",
                               "event_id").collect()),
        key=lambda t: (t[0], t[4]))
    assert got == _scd2_reference(ref_in)


edge_lists = st.lists(
    st.tuples(st.integers(min_value=0, max_value=7),
              st.integers(min_value=0, max_value=7)),
    min_size=0, max_size=20)


def _triangles_reference(edges):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = {v for e in es for v in e}
    part = {}
    for a, b, c in combinations(sorted(nodes), 3):
        if {(a, b), (b, c), (a, c)} <= es:
            for v in (a, b, c):
                part[v] = part.get(v, 0) + 1
    return part


@settings(max_examples=8, deadline=None)
@given(edge_lists)
def test_triangles_match_bruteforce(spark, edges):
    ref = _triangles_reference(edges)
    if not edges:
        return
    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in edges], "src string, dst string")
    got = {int(r.concept_id): r.n_triangles
           for r in triangle_count(df).collect()}
    assert got == ref
