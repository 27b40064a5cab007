"""Recall-vs-cost curve for LSH multi-probe ANN (VERDICT r2 item 9).

Deterministic clustered fixture (2,000 vectors, dim 32, 250 clusters of
8 near-duplicates each, seed 11); ground truth = brute-force cosine
top-1 per query (self excluded). For each (n_planes, probe radius)
configuration we measure:

- recall@1: fraction of queries whose true nearest neighbor appears in
  the LSH result at k=1 (self excluded on both sides);
- candidates/query: average size of the probed candidate pool BEFORE
  ranking — the cost knob multi-probe turns (corpus is never duplicated;
  only the query side fans out).

Writes/overwrites the table in BENCH/ANN.md.

    env PYTHONPATH=/root/repo python tools/ann_recall_bench.py
"""

from __future__ import annotations

import os
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def fixture(spark, n_clusters=250, per_cluster=8, dim=32, seed=11):
    import numpy as np

    rng = np.random.RandomState(seed)
    rows, vid = [], 0
    for _c in range(n_clusters):
        base = rng.standard_normal(dim)
        base /= np.linalg.norm(base)
        for j in range(per_cluster):
            v = base + 0.02 * j * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def main():
    from pyspark.sql import functions as F

    from bfokg.operators.similarity_search import brute_force_topk, lsh_topk
    from bfokg.session import get_spark

    spark = get_spark(app_name="ann-recall", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    e = fixture(spark).persist()
    n = e.count()
    q = e.select(F.col("vec_id").alias("query_id"), "embedding")

    truth = {
        r.query_id: r.vec_id
        for r in brute_force_topk(q, e, k=2).where(
            F.col("query_id") != F.col("vec_id")
        ).collect()
        if r.rank <= 2
    }

    lines = []
    for n_planes in (8, 12):
        for radius in (0, 1, 2):
            got = lsh_topk(q, e, k=2, n_planes=n_planes, multi_probe=radius)
            hits = {
                r.query_id: r.vec_id
                for r in got.where(F.col("query_id") != F.col("vec_id")).collect()
            }
            recall = sum(1 for qq, t in truth.items() if hits.get(qq) == t) / len(truth)
            # candidate-pool size before ranking (cost proxy)
            from bfokg.operators.similarity_search import rademacher_bucket_col

            cb = e.select(
                "vec_id",
                rademacher_bucket_col(F.col("embedding"), n_planes).alias("bucket"),
            )
            sizes = {r.bucket: r.cnt for r in
                     cb.groupBy("bucket").agg(F.count("*").alias("cnt")).collect()}
            qb = {r.vec_id: r.bucket for r in cb.collect()}
            import itertools

            def probes(b):
                out = [b]
                if radius >= 1:
                    out += [b ^ (1 << j) for j in range(n_planes)]
                if radius >= 2:
                    out += [b ^ (1 << j) ^ (1 << k)
                            for j, k in itertools.combinations(range(n_planes), 2)]
                return out

            cand = sum(sum(sizes.get(p, 0) for p in probes(b)) for b in qb.values()) / n
            lines.append((n_planes, radius, recall, cand))
            print(f"n_planes={n_planes} radius={radius} "
                  f"recall@1={recall:.3f} candidates/query={cand:.1f}")

    md = f"""# BENCH/ANN — LSH multi-probe recall vs cost

Generated {datetime.now(timezone.utc).isoformat()} by
`tools/ann_recall_bench.py`: 2,000 vectors (250 clusters × 8, dim 32,
seed 11), ground truth = brute-force cosine top-1 (self excluded),
k=2, xxhash64 Rademacher buckets, seed 42. candidates/query counts the
probed pool BEFORE ranking — the cost multi-probe buys recall with
(query-side fan-out only; the corpus is never duplicated).

| n_planes | probe radius | recall@1 | candidates/query |
|---|---|---|---|
"""
    for n_planes, radius, recall, cand in lines:
        md += f"| {n_planes} | {radius} | {recall:.3f} | {cand:.1f} |\n"
    md += """
Reading: radius 1 recovers most of the recall a single-probe bucket
loses, at ~(n_planes+1)× the probe volume; radius 2 closes most of the
remainder and is the right default only when n_planes is high enough
that buckets are small (n_planes=12, radius=2 probes 79 buckets but
each is tiny). The monotone recall ordering r0 ≤ r1 ≤ r2 and the
superset property of the returned pair sets are pinned in
tests/test_corpus_ops.py::test_lsh_topk_multi_probe_radius2.
"""
    with open(os.path.join(REPO, "BENCH", "ANN.md"), "w") as f:
        f.write(md)
    print("wrote BENCH/ANN.md")


if __name__ == "__main__":
    main()
