"""CLI multiplexer — reference parity with ``dataontosearch.py
<subcommand>`` [K: the reference exposes search / autotag / matrix /
evaluate subcommands via argparse; SURVEY.md §3.1].

    python -m otd_semantic_framework_spark autotag   --input T.parquet --run-dir RUN
    python -m otd_semantic_framework_spark matrix    --run-dir RUN
    python -m otd_semantic_framework_spark search    --run-dir RUN "query text"
    python -m otd_semantic_framework_spark evaluate  --run-dir RUN --golden G.parquet
    python -m otd_semantic_framework_spark gen       --convs 1000 --out T.parquet

Each subcommand is a thin shell over the plans/* modules; Spark session
config comes from --master (or spark-submit).
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from .session import get_spark
    return get_spark("otd-cli", master=args.master)


def cmd_gen(args) -> None:
    from .sources.fixtures import transcripts_spark
    spark = _spark(args)
    transcripts_spark(spark, args.convs).write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"written": args.out, "turns": n}))
    spark.stop()


def cmd_autotag(args) -> None:
    """The reference's `autotag` lifecycle: corpus → triples (+ CDS)."""
    from .plans.pipeline import run_pipeline
    spark = _spark(args)
    transcripts = spark.read.parquet(args.input)
    res = run_pipeline(spark, transcripts, args.run_dir, run_id=args.run_id,
                       fused_linking=args.fused)
    print(json.dumps({"triples": res.triples.count(),
                      "cds_rows": res.cds.count(),
                      "metrics": res.metrics}))
    spark.stop()


def cmd_matrix(args) -> None:
    """The reference's `matrix` lifecycle: build + persist the Wu-Palmer
    concept-similarity table."""
    from .operators.wup import concept_similarity
    from .sources.fixtures import ontology_spark
    from .sources.storage import Storage
    spark = _spark(args)
    sim = concept_similarity(ontology_spark(spark))
    Storage(args.run_dir).write_table(sim, "concept_similarity")
    print(json.dumps({"pairs": sim.count()}))
    spark.stop()


def cmd_search(args) -> None:
    """The reference's `ontosearch search` lifecycle."""
    from .plans.search import search
    from .sources.fixtures import ontology_pandas
    from .sources.storage import Storage
    spark = _spark(args)
    cds = Storage(args.run_dir).read_table(spark, "cds_scores")
    hits = search(args.query, cds, ontology_pandas(), top_n=args.top_n)
    rows = [r.asDict() for r in hits.collect()]
    print(json.dumps({"query": args.query, "results": rows}, default=str))
    spark.stop()


def cmd_evaluate(args) -> None:
    """The reference's evaluation lifecycle: P/R vs a golden triple set."""
    from .operators.evaluate import precision_recall
    from .sources.storage import Storage
    spark = _spark(args)
    ours = Storage(args.run_dir).read_table(spark, "triples")
    golden = spark.read.parquet(args.golden)
    print(json.dumps(precision_recall(ours, golden)))
    spark.stop()


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="otd_semantic_framework_spark")
    ap.add_argument("--master", default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen");      g.add_argument("--convs", type=int, required=True)
    g.add_argument("--out", required=True); g.set_defaults(fn=cmd_gen)

    a = sub.add_parser("autotag");  a.add_argument("--input", required=True)
    a.add_argument("--run-dir", required=True); a.add_argument("--run-id", default="run-0")
    a.add_argument("--fused", action="store_true",
                   help="coarse checkpoints via the broadcast canonical "
                        "table (the high-throughput 10^12-turn configuration)")
    a.set_defaults(fn=cmd_autotag)

    m = sub.add_parser("matrix");   m.add_argument("--run-dir", required=True)
    m.set_defaults(fn=cmd_matrix)

    s = sub.add_parser("search");   s.add_argument("--run-dir", required=True)
    s.add_argument("query"); s.add_argument("--top-n", type=int, default=10)
    s.set_defaults(fn=cmd_search)

    e = sub.add_parser("evaluate"); e.add_argument("--run-dir", required=True)
    e.add_argument("--golden", required=True); e.set_defaults(fn=cmd_evaluate)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])
