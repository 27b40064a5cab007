"""spark-submit entry point for the corpus-curation pipeline — the
training-data twin of jobs/run_kg.py.

Cluster usage:

    zip -r bfokg.zip bfokg
    spark-submit --py-files bfokg.zip \
        [--master spark://... | yarn | k8s://...] \
        jobs/curate_corpus.py --documents <parquet-path> --out <dir> \
        [--resume] [--min-quality 0.3] [--dup-threshold 0.5] \
        [--lang-cap en=0.5 --lang-cap de=0.9]

Local smoke:

    env PYTHONPATH=. python jobs/curate_corpus.py \
        --documents /root/testdata/sf0.001/documents.parquet --out /tmp/cur
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--documents", required=True,
                   help="parquet path of the (doc_id, text) documents table")
    p.add_argument("--out", required=True, help="output warehouse directory")
    p.add_argument("--resume", action="store_true",
                   help="skip stages whose snapshot is already committed")
    p.add_argument("--min-quality", type=float, default=0.0)
    p.add_argument("--max-dup-line-frac", type=float, default=None,
                   help="drop docs whose duplicate-line fraction exceeds "
                        "this (Gopher-style repetition gate)")
    p.add_argument("--dup-threshold", type=float, default=0.5)
    p.add_argument("--redact-pii", action="store_true",
                   help="scrub URLs / e-mails / IPv4s to sentinel tokens "
                        "in the final corpus")
    p.add_argument("--lang-cap", action="append", default=[],
                   metavar="LANG=FRAC",
                   help="per-language keep fraction (repeatable)")
    args = p.parse_args(argv)

    lang_fractions = {}
    for cap in args.lang_cap:
        lang, _, frac = cap.partition("=")
        if not frac:
            p.error(f"--lang-cap expects LANG=FRAC, got {cap!r}")
        lang_fractions[lang] = float(frac)

    from bfokg.plans.curation import run_curation
    from bfokg.session import get_spark

    spark = get_spark(app_name="bfokg-curate")
    docs = spark.read.parquet(args.documents).select("doc_id", "text")
    res = run_curation(
        spark, docs, args.out, resume=args.resume,
        min_quality=args.min_quality,
        max_dup_line_frac=args.max_dup_line_frac,
        dup_threshold=args.dup_threshold,
        lang_fractions=lang_fractions, redact_pii=args.redact_pii,
    )
    # all counts come from the committed manifest — no extra Spark jobs
    manifest = json.load(open(res["corpus_manifest"]))
    summary = {
        "corpus_rows": manifest["rows"],
        "partition_rows": manifest["partition_rows"],
        "skipped_stages": res["skipped"],
        "lineage_rows": (res["lineage"] or {}).get("rows"),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
