"""Round-3 training-pipeline operators: PII redaction, int8 embedding
quantization, sequence packing."""

import pytest
from pyspark.sql import functions as F

from otd_semantic_framework_spark.operators.curation import pack_sequences
from otd_semantic_framework_spark.operators.simsearch import (
    quantize_embeddings, quantized_topk)
from otd_semantic_framework_spark.operators.textstats import redact_pii


def test_redact_pii_categories(spark):
    docs = spark.createDataFrame(
        [(0, "mail me at a.b+c@example.co.uk today"),
         (1, "see https://x.org/a?b=1 and http://y.io"),
         (2, "call +1 (555) 123-4567 now"),
         (3, "clean text, nothing to scrub"),
         (4, None)],
        "doc_id long, text string")
    out = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert out[0].redacted == "mail me at <EMAIL> today"
    assert out[0].n_emails == 1 and out[0].n_urls == 0
    assert out[1].redacted == "see <URL> and <URL>" and out[1].n_urls == 2
    assert out[2].redacted == "call <PHONE> now" and out[2].n_phones == 1
    assert out[3].redacted == out[3].text
    assert out[4].redacted == "" and out[4].n_emails == 0


def test_redact_pii_no_python_in_plan(spark):
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = redact_pii(docs)._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "Exchange" not in plan  # map-only


def test_quantize_embeddings_bounds_and_dequant(spark):
    vecs = spark.createDataFrame(
        [(0, [1.0, -2.0, 0.5]), (1, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in quantize_embeddings(vecs).collect()}
    q0 = out[0].qvec
    assert max(map(abs, q0)) == 127  # max|x| maps to ±127
    assert q0 == [64, -127, 32]      # round(1*127/2)=64, round(0.5*127/2)=32
    assert out[0].scale == pytest.approx(2.0 / 127)
    # dequantization error bounded by scale/2 per component
    deq = [q * out[0].scale for q in q0]
    assert all(abs(d - x) <= out[0].scale / 2 + 1e-12
               for d, x in zip(deq, [1.0, -2.0, 0.5]))
    assert out[1].qvec == [0, 0, 0] and out[1].scale == 0.0


def test_quantized_topk_matches_exact_on_separated_data(spark):
    """On well-separated vectors the quantized ranking equals the exact
    float ranking (quantization noise ≪ margin)."""
    import math
    rows = [(i, [math.cos(i / 7.0), math.sin(i / 7.0), float(i % 3)])
            for i in range(30)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qz = quantize_embeddings(vecs)
    q = (qz.filter(F.col("vec_id") < 2)
         .select(F.col("vec_id").alias("qid"), F.col("qvec").alias("qv")))
    c = (qz.filter(F.col("vec_id") >= 2)
         .select(F.col("vec_id").alias("cid"), F.col("qvec").alias("cv")))
    got = quantized_topk(q, c, k=5)
    assert got.count() == 10
    assert got.schema["qdot"].dataType.simpleString() == "bigint"
    # deterministic across repartitioning
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, quantized_topk(
        q.repartition(5), c.repartition(3), k=5).collect()))
    assert a == b


def test_pack_sequences_chunk_semantics(spark):
    docs = spark.createDataFrame(
        [(0, "a b c", "s"), (1, "d e", "s"), (2, "f g h i", "s"),
         (3, "j", "s"), (10, "x y z w", "t")],
        "doc_id long, text string, source string")
    out = {r.doc_id: r for r in pack_sequences(docs, budget=5).collect()}
    # shard s cumulative: 0:[0,3) bin0, 1:[3,5) bin0, 2:[5,9) bin1, 3:[9,10) bin1
    assert out[0].bin == 0 and out[1].bin == 0
    assert out[2].bin == 1 and out[3].bin == 1
    assert out[10].bin == 0 and out[10].shard == "t"
    assert out[2].n_tokens == 4


def test_pack_sequences_partitioning_invariance(spark):
    rows = [(i, " ".join(["tok"] * (1 + i % 7)), f"src{i % 3}")
            for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    a = sorted(map(tuple, pack_sequences(docs, 16).collect()))
    b = sorted(map(tuple, pack_sequences(docs.repartition(13), 16).collect()))
    assert a == b


def test_ngram_contamination(spark):
    from otd_semantic_framework_spark.operators.curation import (
        ngram_contamination)
    docs = spark.createDataFrame(
        [(1, "a b c d e f"),          # shares the 4-gram 'c d e f' tail
         (2, "x y z w q r"),          # disjoint
         (3, "c d e f g h"),          # shares 'c d e f' head
         (4, None)],
        "doc_id long, text string")
    probes = spark.createDataFrame(
        [(100, "zz c d e f zz")], "doc_id long, text string")
    got = {r.doc_id: r.n_grams_matched
           for r in ngram_contamination(docs, probes, n=4).collect()}
    assert got == {1: 1, 3: 1}  # docs 2 and 4 unflagged


def test_ngram_contamination_broadcast_plan(spark):
    """The probe side must broadcast — the corpus scan never shuffles
    for the join (decontamination is a map-side pass at 100 TB)."""
    from otd_semantic_framework_spark.operators.curation import (
        ngram_contamination)
    docs = spark.createDataFrame(
        [(i, "a b c d e") for i in range(20)], "doc_id long, text string")
    probes = spark.createDataFrame([(99, "a b c d e")],
                                   "doc_id long, text string")
    plan = ngram_contamination(docs, probes, n=4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
