"""spark-submit entry point for the full KG build.

Cluster usage (the north rule's deployment shape):

    zip -r wqs.zip wikidata_qrank_spark
    spark-submit --master <cluster> --py-files wqs.zip \
        scripts/run_build.py --input /data/sfN --out /pub --checkpoint /ckpt

No master is hardcoded — spark-submit / the cluster manager supplies it;
``--local-cpus`` exists only for sandbox runs without spark-submit.
Prints one JSON line with the published artifact paths and per-stage
metrics (the reference's per-stage logging, build.go:20-56).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="table directory (sf dir)")
    ap.add_argument(
        "--dumps",
        help="raw Wikimedia dumps tree: run the dumps-directory build "
        "(site discovery -> per-site SQL scans -> weekly pageviews -> "
        "item_signals CSV) instead of the parquet-table pipeline",
    )
    ap.add_argument("--num-weeks", type=int, default=1)
    ap.add_argument("--out", required=True, help="publish directory")
    ap.add_argument("--checkpoint", help="checkpoint directory (required in table mode, optional resumability in dumps mode)")
    ap.add_argument("--code-version", default="v1")
    ap.add_argument(
        "--local-cpus",
        type=int,
        default=0,
        help="sandbox only: build a local[N] session instead of relying "
        "on spark-submit's master",
    )
    args = ap.parse_args()

    # validate the flag combination before paying JVM/session startup
    # (in non-local mode a bad invocation would otherwise attach to the
    # cluster just to error out)
    if bool(args.dumps) == bool(args.input):
        ap.error("exactly one of --input (tables) or --dumps (raw tree) is required")
    if args.input and not args.checkpoint:
        ap.error("--checkpoint is required with --input")

    if args.local_cpus:
        from wikidata_qrank_spark.session import get_session

        spark = get_session("kg-build", cpus=args.local_cpus)
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("kg-build").getOrCreate()

    if args.dumps:
        from wikidata_qrank_spark.plans.dumps_build import run_dumps_build

        out_path = os.path.join(args.out, "item_signals.csv")
        res = run_dumps_build(
            spark,
            args.dumps,
            out_path,
            num_weeks=args.num_weeks,
            checkpoint_dir=args.checkpoint,
        )
        print(
            json.dumps(
                {"outputs": {"item_signals": out_path}, "metrics": res["metrics"]}
            )
        )
        spark.stop()
        return

    from wikidata_qrank_spark.plans.pipeline import run_full_build

    result = run_full_build(
        spark,
        args.input,
        args.out,
        args.checkpoint,
        code_version=args.code_version,
    )
    print(
        json.dumps(
            {
                "outputs": result["outputs"],
                "metrics": result["metrics"],
                "median": result["stats"]["Median"],
                "n_samples": len(result["stats"]["Samples"]),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
