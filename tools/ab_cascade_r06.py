"""Interleaved A/B: cascade per-stage materialization on the round-6 tree.

The eager-vs-lazy decision was last measured BEFORE the LocalRelation-dims
and tokenizer rewrites; both changes shrank every stage's plan, which is
exactly the input to that trade-off (eager pays one localCheckpoint job
per stage to spare the final action from re-planning each stage's DAG —
cheap plans mean less to spare). Re-measure on the current tree, both
bench shapes, interleaved in one session so ambient bursts hit both arms.

Usage: PYTHONPATH=/root/repo python tools/ab_cascade_r06.py [rounds]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bfokg.session import get_spark
from bfokg.util import release_intermediates


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-cascade-r06", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()  # warm

    from bfokg.fixtures import entities_df
    from bfokg.operators.strategies import cascade
    from bfokg.plans.pipeline import classify_entities, default_classifiers

    def fixtures_run(mat: str) -> float:
        t0 = time.time()
        ents = entities_df(spark, include_micro=True)
        out = classify_entities(spark, ents, materialize=mat)
        out.count()
        dt = time.time() - t0
        release_intermediates(out)
        spark.catalog.clearCache()
        return dt

    def docs_run(mat: str) -> float:
        t0 = time.time()
        docs = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select(F.col("doc_id").cast("string").alias("id"), "text",
                    F.lit(None).cast("map<string,array<string>>").alias("claims"))
        )
        matches, _trace = cascade(docs, default_classifiers(spark), top_k=3,
                                  materialize=mat)
        matches.where(F.col("rank") == 1).count()
        dt = time.time() - t0
        release_intermediates(matches)
        spark.catalog.clearCache()
        return dt

    variants = sys.argv[2].split(",") if len(sys.argv) > 2 else ["eager", "lazy"]
    res = {("fix", v): [] for v in variants}
    res.update({("doc", v): [] for v in variants})
    for r in range(rounds):
        for v in variants:
            spark.sparkContext.setJobDescription(f"ab fixtures {v} r{r}")
            res[("fix", v)].append(fixtures_run(v))
            spark.sparkContext.setJobDescription(f"ab docs {v} r{r}")
            res[("doc", v)].append(docs_run(v))
    for (shape, v), xs in res.items():
        print(f"{shape:4s} {v:6s} best={min(xs):.3f} all=" +
              ",".join(f"{x:.2f}" for x in xs))


if __name__ == "__main__":
    main()
