"""P2 — turn assembly: stable ordering invariant (BASELINE.json:
"per-turn text equality under stable (conv_id, turn_idx) ordering")."""

from pyspark.sql import functions as F

from otd_semantic_framework_spark.operators.turns import (
    assemble_conversations, assemble_turns)


def _collect_sorted(df):
    return sorted(
        df.select("conv_id", "turn_idx", "pos", "prev_turn_idx", "prev_text",
                  "next_text", "text").collect(),
        key=lambda r: (r.conv_id, r.turn_idx),
    )


def test_ordering_invariant_under_shuffle(spark, tiny_df):
    a = _collect_sorted(assemble_turns(tiny_df))
    shuffled = tiny_df.orderBy(F.xxhash64("text", "conv_id")).repartition(7)
    b = _collect_sorted(assemble_turns(shuffled))
    assert a == b


def test_neighbours_and_pos(spark, tiny_df, tiny_pdf):
    out = assemble_turns(tiny_df).filter(F.col("conv_id") == "conv-000001")
    rows = sorted(out.collect(), key=lambda r: r.turn_idx)
    texts = (tiny_pdf[tiny_pdf.conv_id == "conv-000001"]
             .sort_values("turn_idx").text.tolist())
    assert [r.text for r in rows] == texts  # per-turn text equality
    assert rows[0].prev_text is None
    for i, r in enumerate(rows):
        assert r.pos == i + 1
        if i > 0:
            assert r.prev_text == texts[i - 1]
        if i < len(rows) - 1:
            assert r.next_text == texts[i + 1]
        assert r.context[-1] == r.text
        assert len(r.context) == min(3, i + 1)


def test_full_conversation_assembly(spark, tiny_df, tiny_pdf):
    out = assemble_conversations(tiny_df)
    row = out.filter(F.col("conv_id") == "conv-000002").collect()[0]
    expected = (tiny_pdf[tiny_pdf.conv_id == "conv-000002"]
                .sort_values("turn_idx"))
    assert [t.turn_idx for t in row.turns] == expected.turn_idx.tolist()
    assert [t.text for t in row.turns] == expected.text.tolist()
    assert not row.truncated


def test_assembly_cap(spark, tiny_df):
    out = assemble_conversations(tiny_df, max_turns=5)
    hot = out.filter(F.col("conv_id") == "conv-000000").collect()[0]
    assert hot.truncated and len(hot.turns) == 5
    # cap keeps the FIRST turns in order
    assert [t.turn_idx for t in hot.turns] == [0, 1, 2, 3, 4]
