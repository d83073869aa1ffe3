"""P16 — checkpoint/resume: a run killed after stage k and resumed
produces byte-identical final triples, and completed stages are not
re-executed (north rule: "resumable from checkpoint with per-partition
lineage + metrics")."""

import os

import pandas as pd
import pytest

from otd_semantic_framework_spark.plans.pipeline import run_pipeline


def _triples_key(df):
    return sorted((r.subj, r.pred, r.obj, r.conv_id, r.turn_idx, round(r.score, 6))
                  for r in df.collect())


@pytest.mark.parametrize("stop_after", ["mentions", "candidates", "canonical"])
def test_resume_equals_single_run(spark, tiny_df, tmp_path, stop_after):
    single_dir = str(tmp_path / f"single_{stop_after}")
    resumed_dir = str(tmp_path / f"resumed_{stop_after}")

    full = run_pipeline(spark, tiny_df, single_dir)

    partial = run_pipeline(spark, tiny_df, resumed_dir, stop_after=stop_after)
    assert partial.triples is None
    resumed = run_pipeline(spark, tiny_df, resumed_dir)

    assert _triples_key(resumed.triples) == _triples_key(full.triples)
    # stages up to the kill point were resumed, not recomputed
    assert resumed.metrics[stop_after]["resumed"] is True


def test_manifest_lineage_counters(spark, tiny_df, tmp_path):
    run_dir = str(tmp_path / "lineage")
    res = run_pipeline(spark, tiny_df, run_dir)
    m = pd.read_parquet(os.path.join(run_dir, "checkpoint_manifest.parquet"))
    stages = set(m.stage)
    assert {"concept_similarity", "mentions", "candidates", "canonical",
            "triples", "cds_scores"} <= stages
    assert (m.status == "complete").all()
    # per-bucket counters sum to the stage total
    tri = m[m.stage == "triples"]
    assert tri.rows_out.sum() == res.triples.count()
    assert (tri.partition_id >= 0).all()
    assert tri.input_fingerprint.nunique() == 1


def test_rerun_same_dir_skips_everything(spark, tiny_df, tmp_path):
    run_dir = str(tmp_path / "skip")
    run_pipeline(spark, tiny_df, run_dir)
    again = run_pipeline(spark, tiny_df, run_dir)
    assert all(v.get("resumed") for v in again.metrics.values())
