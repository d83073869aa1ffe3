"""P18 — precision/recall of emitted triples vs a reference set.

BASELINE.json acceptance: P ≥ 0.95 AND R ≥ 0.95 on (subj, pred, obj)
vs the reference tagger output (here: the pinned pandas mini-oracle
goldens — SURVEY.md §5.2.1, /root/reference is empty).

Set algebra as joins: TP = inner, FP = ours \\ reference (left_anti),
FN = reference \\ ours (left_anti the other way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_KEY = ["subj", "pred", "obj"]


def precision_recall(ours: DataFrame, reference: DataFrame) -> dict[str, float]:
    o = ours.select(*_KEY).distinct().cache()
    r = reference.select(*_KEY).distinct().cache()
    tp = o.join(r, _KEY, "inner").count()
    fp = o.join(r, _KEY, "left_anti").count()
    fn = r.join(o, _KEY, "left_anti").count()
    precision = tp / (tp + fp) if (tp + fp) else 1.0
    recall = tp / (tp + fn) if (tp + fn) else 1.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) else 0.0
    return {"tp": tp, "fp": fp, "fn": fn,
            "precision": precision, "recall": recall, "f1": f1}
