"""spark-submit entry point for the KG-construction pipeline.

Cluster usage (north_rule packaging):

    zip -r bfokg.zip bfokg
    spark-submit --py-files bfokg.zip \
        [--master spark://... | yarn | k8s://...] \
        jobs/run_kg.py --transcripts <path-or-table> --out <warehouse-dir> \
        [--resume] [--sf 0.01]

Local smoke:

    env PYTHONPATH=. python jobs/run_kg.py --sf 0.001 --out /tmp/kg_out
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--transcripts", default=None,
                   help="parquet path of the transcripts table; default: the "
                        "deterministic synthetic table at --sf")
    p.add_argument("--sf", type=float, default=0.001)
    p.add_argument("--out", required=True, help="output warehouse directory")
    p.add_argument("--resume", action="store_true",
                   help="skip stages whose snapshot is already committed")
    args = p.parse_args(argv)

    from bfokg.session import get_spark
    from bfokg.plans.pipeline import run_pipeline

    spark = get_spark(app_name="bfokg-kg")
    if args.transcripts:
        transcripts = spark.read.parquet(args.transcripts)
    else:
        from bfokg.datagen import generate_transcripts

        transcripts = spark.read.parquet(generate_transcripts(args.sf))

    res = run_pipeline(spark, transcripts, args.out, resume=args.resume)
    summary = {
        "edges": res["edges"].count(),
        "nodes": res["nodes"].count(),
        "skipped_stages": res["skipped"],
        "lineage_rows": (res["lineage"] or {}).get("rows"),
        "out": args.out,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
