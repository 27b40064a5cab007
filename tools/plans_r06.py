"""Dump explain("formatted") for every bench.py headline query →
plans/r06/<query>_{before|after}.txt (round-6 optimization evidence).

    env PYTHONPATH=/root/repo python tools/plans_r06.py before|after
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "mentions",
    "edges",
    "wikidata_canon",
    "cascade_assignments",
    "hierarchical",
    "dedup_exact",
    "minhash_lsh",
    "dedup_components",
    "doc_stats",
    "doc_semantic",
    "doc_hierarchy",
    "doc_cascade",
    "embedding_topk",
    "embedding_lsh_dups",
    "embedding_ivf_topk",
    "image_features",
    "audio_features",
    "video_features",
    "pricing_summary",
    "customer_nation_revenue",
    "events_topn",
]


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    import __spark_entry__ as entrymod
    from bfokg.datagen import generate_transcripts, sf_from_dir
    from bfokg.session import get_spark
    from bfokg.util import release_intermediates

    generate_transcripts(sf_from_dir(SF_DIR))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="plans-r06", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in BENCH_QUERIES:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        release_intermediates(df)
        spark.catalog.clearCache()
        print(f"wrote {name}_{tag}.txt")


if __name__ == "__main__":
    main()
