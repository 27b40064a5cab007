"""A/B: q_dedup_components new auto (driver union-find) vs the loop
forced via materialize='local' (the prior auto behavior's round shape)
— same session, interleaved, best-of-N each. Diagnostic only."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N = int(os.environ.get("PROBE_RUNS", "4"))


def main():
    from bfokg.datagen import generate_transcripts, sf_from_dir
    from bfokg.operators.dedup import dedup_components, minhash_lsh_pairs
    from bfokg.session import get_spark
    from bfokg.util import release_intermediates

    generate_transcripts(sf_from_dir(SF_DIR))
    spark = get_spark(app_name="ab-components", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    def run(mode):
        t0 = time.time()
        pairs = minhash_lsh_pairs(docs, threshold=0.2)
        comp = dedup_components(pairs) if mode == "auto" else \
            dedup_components(pairs, materialize=mode)
        n = comp.count()
        dt = time.time() - t0
        release_intermediates(comp)
        for c in getattr(pairs, "_bfokg_cached", ()):
            try:
                c.unpersist()
            except Exception:
                pass
        spark.catalog.clearCache()
        return dt, n

    best = {"auto": None, "local": None}
    for i in range(N):
        for mode in ("auto", "local"):
            dt, n = run(mode)
            best[mode] = dt if best[mode] is None else min(best[mode], dt)
            print(f"run{i} {mode}: {dt:.3f}s rows={n}", flush=True)
    print("BEST", {k: round(v, 3) for k, v in best.items()},
          "loadavg", open("/proc/loadavg").read().split()[:3])


if __name__ == "__main__":
    main()
