"""A/B: parquet-durable vs localCheckpoint rounds in ``dedup_components``
(VERDICT r4 item 2's "A/B the cost" criterion).

Round 5 switched ``dedup_components``' per-round materialization from
``localCheckpoint(eager=True)`` (executor-local RDD blocks — one lost
executor kills a multi-hour iterative job) to reliable parquet under a
checkpoint dir, with superseded rounds deleted as soon as the
convergence probe has consumed them. This measures what that durability
costs on the 640k-doc leg: the ×128-amplified sf0.1 documents table
through ``minhash_lsh_pairs`` (pairs MATERIALIZED first, outside the
timed window), then ``dedup_components`` timed under both modes in one
JVM — warm-up-free but order-alternated (p, l, p, l) so neither mode
owns the cold caches; best per mode reported.

Appends the A/B table to BENCH/DEDUP.md.

    env PYTHONPATH=/root/repo SPARK_GRAFT_DRIVER_MEM=48g \
        python tools/components_ckpt_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("DEDUP_SCALE_FACTOR", "128"))


def main():
    with open("/proc/loadavg") as f:
        load_before = f.read().split()[:3]

    from pyspark.sql import functions as F

    from bfokg.operators.dedup import dedup_components, minhash_lsh_pairs
    from bfokg.session import get_spark
    from bfokg.util import release_intermediates

    spark = get_spark(app_name="components-ckpt-ab", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(SF_DIR + "/documents.parquet").select("doc_id", "text")
    copies = spark.range(FACTOR).select(F.col("id").alias("copy"))
    suffixed = F.array_join(
        F.transform(
            F.split("text", " "),
            lambda t: F.concat(t, F.lit("_"), F.col("copy").cast("string")),
        ),
        " ",
    )
    docs = (base.crossJoin(copies)
            .select((F.col("doc_id") * FACTOR + F.col("copy")).alias("doc_id"),
                    suffixed.alias("text"))
            .repartition(64))
    pairs_lazy = minhash_lsh_pairs(docs, threshold=0.5)
    pairs = pairs_lazy.select("doc_a", "doc_b").persist()
    n_pairs = pairs.count()  # materialize OUTSIDE the timed window
    release_intermediates(pairs_lazy)
    n_docs = FACTOR * base.count()

    best = {"parquet": None, "local": None}
    n_comp = {}
    for mode in ("parquet", "local", "parquet", "local"):
        t0 = time.time()
        comp = dedup_components(pairs, materialize=mode)
        n_comp[mode] = comp.count()
        dt = time.time() - t0
        release_intermediates(comp)
        best[mode] = dt if best[mode] is None else min(best[mode], dt)
        print(json.dumps({"mode": mode, "sec": round(dt, 3)}), flush=True)
    assert n_comp["parquet"] == n_comp["local"], n_comp

    with open("/proc/loadavg") as f:
        load_after = f.read().split()[:3]
    ratio = best["parquet"] / best["local"]
    md = f"""

## dedup_components checkpoint durability A/B — `tools/components_ckpt_ab.py`

Generated {datetime.now(timezone.utc).isoformat()}: {n_docs:,} docs
(sf0.1 documents ×{FACTOR}), {n_pairs:,} near-dup pairs (materialized
before timing), {n_comp['parquet']:,} labeled nodes. local[32], one JVM,
modes alternated, best of two per mode.
loadavg before/after: {load_before} / {load_after}.

| per-round materialization | wall sec |
|---|---|
| reliable parquet checkpoints (shipped default) | {best['parquet']:.3f} |
| `localCheckpoint(eager=True)` (r4 shape; not executor-loss-safe) | {best['local']:.3f} |

Durability costs **{ratio:.2f}×** on this leg. The parquet rounds are
what a 10^9-doc cluster run requires (losing one executor mid-iteration
must lose one task, not the job); the `materialize="local"` escape hatch
remains for single-box ephemeral runs.
"""
    path = os.path.join(REPO, "BENCH", "DEDUP.md")
    with open(path, "a") as f:
        f.write(md)
    print(md)
    print("appended to", path)


if __name__ == "__main__":
    main()
