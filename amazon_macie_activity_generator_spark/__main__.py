"""CLI: run a blueprint end to end, like the reference's Lambda did per
cycle — ``python -m amazon_macie_activity_generator_spark run <blueprint.json> <out_dir>``.

Commands:
  run <blueprint.json> <out_dir> [--run-id X] [--stride-anomalies]
      generate -> queue -> dispatch -> sinks (plans/pipeline.run_blueprint)
  generate <blueprint.json> <out_parquet> [--run-id X]
      fact table only
  replay <queue_dir> <out_dir>
      stream the queue table to a delivered table (availableNow drain)
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="amazon_macie_activity_generator_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="full cycle: generate -> queue -> sinks")
    runp.add_argument("blueprint")
    runp.add_argument("out_dir")
    runp.add_argument("--run-id", default=None)
    runp.add_argument("--stride-anomalies", action="store_true",
                      help="deterministic stride anomaly slots (default: hash-random)")

    genp = sub.add_parser("generate", help="fact table only")
    genp.add_argument("blueprint")
    genp.add_argument("out_parquet")
    genp.add_argument("--run-id", default=None)

    repp = sub.add_parser("replay", help="drain the queue table via Structured Streaming")
    repp.add_argument("queue_dir")
    repp.add_argument("out_dir")

    args = p.parse_args(argv)

    from amazon_macie_activity_generator_spark.session import get_spark

    spark = get_spark("amazon-macie-activity-generator-spark-cli")
    spark.sparkContext.setLogLevel("WARN")

    if args.cmd == "run":
        from amazon_macie_activity_generator_spark.config import load_blueprint
        from amazon_macie_activity_generator_spark.plans.pipeline import run_blueprint

        bp = load_blueprint(args.blueprint)
        out = run_blueprint(
            spark, bp, args.out_dir, run_id=args.run_id,
            anomaly_mode="stride" if args.stride_anomalies else "hash",
        )
        print(json.dumps(out, indent=2, default=str))
    elif args.cmd == "generate":
        from amazon_macie_activity_generator_spark.config import load_blueprint
        from amazon_macie_activity_generator_spark.plans.generate import generate

        bp = load_blueprint(args.blueprint)
        fact = generate(spark, bp, run_id=args.run_id)
        fact.write.mode("overwrite").parquet(args.out_parquet)
        print(json.dumps({"rows": spark.read.parquet(args.out_parquet).count(),
                          "path": args.out_parquet}))
    elif args.cmd == "replay":
        import os

        from amazon_macie_activity_generator_spark.streaming.replay import replay_to_table

        schema = spark.read.parquet(args.queue_dir).schema
        q = replay_to_table(
            spark, args.queue_dir, schema,
            os.path.join(args.out_dir, "delivered"),
            os.path.join(args.out_dir, "checkpoint"),
            available_now=True,
        )
        q.awaitTermination()
        n = spark.read.parquet(os.path.join(args.out_dir, "delivered")).count()
        print(json.dumps({"delivered": n, "path": os.path.join(args.out_dir, "delivered")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
