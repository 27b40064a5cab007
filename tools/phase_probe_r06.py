"""Round-6 verification-session probe: construction vs action time per query.

For each bench query, times (a) the Python-side DataFrame construction
(driver/py4j/planning surface) and (b) the .count() action, separately,
best-of-N. Prints one JSON line. Not a driver artifact — diagnostic only.

    env PYTHONPATH=/root/repo python tools/phase_probe_r06.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N = int(os.environ.get("PROBE_RUNS", "3"))


def main():
    import __spark_entry__ as entrymod
    from bfokg.datagen import generate_transcripts, sf_from_dir
    from bfokg.session import get_spark
    from bfokg.util import release_intermediates

    generate_transcripts(sf_from_dir(SF_DIR))
    spark = get_spark(app_name="bfokg-probe", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    spark.range(1000).count()

    names = [
        "mentions", "edges", "wikidata_canon", "cascade_assignments",
        "hierarchical", "dedup_exact", "minhash_lsh", "dedup_components",
        "doc_stats", "doc_semantic", "doc_hierarchy", "doc_cascade",
        "embedding_topk", "embedding_lsh_dups", "embedding_ivf_topk",
        "image_features", "audio_features", "video_features",
        "pricing_summary", "customer_nation_revenue", "events_topn",
    ]
    out = {}
    for name in names:
        cons_best = act_best = None
        for _ in range(N):
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            t1 = time.time()
            df.count()
            t2 = time.time()
            release_intermediates(df)
            spark.catalog.clearCache()
            cons_best = min(cons_best or 9e9, t1 - t0)
            act_best = min(act_best or 9e9, t2 - t1)
        out[name] = {"construct": round(cons_best, 3), "action": round(act_best, 3)}
        print(name, out[name], flush=True)
    print(json.dumps({"probe": "construct_vs_action", "cpus": int(CPUS), "results": out}))


if __name__ == "__main__":
    main()
