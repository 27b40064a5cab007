"""Round-6 isolation bench (guide §1.4): per-query timing with the same
count() protocol bench.py uses, plus optional noop-sink runs, plus
per-sample 1-min loadavg so bursty external load is visible per sample.

bench.py itself is FROZEN for driver measurement; this file exists so
optimization work can cite clean per-query numbers and phase splits.

    env PYTHONPATH=/root/repo python bench_extra.py [query ...]
    env SPARK_GRAFT_BENCH_RUNS=3 python bench_extra.py minhash_lsh
    env BENCH_EXTRA_SINK=noop python bench_extra.py edges
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
SINK = os.environ.get("BENCH_EXTRA_SINK", "count")  # count | noop

ALL_QUERIES = [
    "mentions", "edges", "wikidata_canon", "cascade_assignments",
    "hierarchical", "dedup_exact", "minhash_lsh", "dedup_components",
    "doc_stats", "doc_semantic", "doc_hierarchy", "doc_cascade",
    "embedding_topk", "embedding_lsh_dups", "embedding_ivf_topk",
    "image_features", "audio_features", "video_features",
    "pricing_summary", "customer_nation_revenue", "events_topn",
]


def _load1() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:
        return -1.0


def main():
    names = sys.argv[1:] or ALL_QUERIES
    import __spark_entry__ as entrymod
    from bfokg.datagen import generate_transcripts, sf_from_dir
    from bfokg.session import get_spark
    from bfokg.util import release_intermediates

    generate_transcripts(sf_from_dir(SF_DIR))
    spark = get_spark(app_name="bfokg-bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    spark.range(1000).count()  # warm JVM

    out = {}
    for name in names:
        samples = []
        loads = []
        for _ in range(N_RUNS):
            loads.append(_load1())
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            if SINK == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            release_intermediates(df)
            spark.catalog.clearCache()
        out[name] = {"min": min(samples), "samples": samples,
                     "load1_per_sample": loads}
        print(json.dumps({name: out[name]}), flush=True)
    total_min = round(sum(v["min"] for v in out.values()), 3)
    print(json.dumps({"metric": "bench_extra_total_min", "value": total_min,
                      "sink": SINK, "queries": {k: v["min"] for k, v in out.items()},
                      "load1_end": _load1()}))


if __name__ == "__main__":
    main()
