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
    ap.add_argument("--input", required=True, help="table directory (sf dir)")
    ap.add_argument("--out", required=True, help="publish directory")
    ap.add_argument("--checkpoint", required=True, help="checkpoint directory")
    ap.add_argument("--code-version", default="v1")
    ap.add_argument(
        "--local-cpus",
        type=int,
        default=0,
        help="sandbox only: build a local[N] session instead of relying "
        "on spark-submit's master",
    )
    args = ap.parse_args()

    if args.local_cpus:
        from wikidata_qrank_spark.session import get_session

        spark = get_session("kg-build", cpus=args.local_cpus)
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("kg-build").getOrCreate()

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
