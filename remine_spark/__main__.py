"""CLI entry point — the `spark-submit --py-files` launch surface.

Subcommands:
  run     full KG-construction pipeline over a pages parquet/Iceberg path
          (resumable: re-running with the same --workdir skips completed
          stage checkpoints; that IS the resume-from-checkpoint CLI)
  synth   write a deterministic synthetic pages corpus (executor-side gen)
  ingest  incremental Structured-Streaming ingest (exactly-once per file)

Cluster launch (north_rule): package the library and submit —
  scripts/package.sh                 # builds dist/remine_spark.zip
  spark-submit --py-files dist/remine_spark.zip \
      --master <cluster> -m remine_spark run --input s3://pages --workdir s3://wd
Locally `python -m remine_spark <cmd>` creates its own local[N] session.
"""

from __future__ import annotations

import argparse
import sys


def _session(args):
    from remine_spark.session import get_spark
    return get_spark(master=args.master)


def cmd_run(args) -> int:
    from remine_spark import pipeline
    spark = _session(args)
    pages = spark.read.parquet(args.input)
    out = pipeline.run_pipeline(
        spark, pages, args.workdir,
        inner_iters=args.inner_iters, transe_epochs=args.transe_epochs,
        resume=not args.no_resume)
    n = out["triples"].count()
    print(f"triples={n} workdir={args.workdir}")
    spark.stop()
    return 0


def cmd_synth(args) -> int:
    from remine_spark import synth
    spark = _session(args)
    synth.pages_df(spark, args.docs, seed=args.seed).write.mode(
        "overwrite").parquet(args.output)
    print(f"wrote {args.docs} pages -> {args.output}")
    spark.stop()
    return 0


def cmd_ingest(args) -> int:
    from remine_spark.streaming import ingest
    spark = _session(args)
    ingest.run_ingest(spark, args.input, args.output, args.checkpoint)
    print(f"drained {args.input} -> {args.output}")
    spark.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="remine_spark")
    ap.add_argument("--master", default=None,
                    help="spark master (default local[$SPARK_GRAFT_CPUS])")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("run", help="full pipeline (resumable)")
    p.add_argument("--input", required=True, help="pages parquet path")
    p.add_argument("--workdir", required=True, help="checkpoint dir")
    p.add_argument("--inner-iters", type=int, default=4)
    p.add_argument("--transe-epochs", type=int, default=20)
    p.add_argument("--no-resume", action="store_true",
                   help="ignore existing stage checkpoints")
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("synth", help="write synthetic pages corpus")
    p.add_argument("--docs", type=int, required=True)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", required=True)
    p.set_defaults(fn=cmd_synth)

    p = sub.add_parser("ingest", help="streaming incremental ingest")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", required=True)
    p.set_defaults(fn=cmd_ingest)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
