"""A/B the transcript-scan parallelism fix: time mentions/edges at sf0.1
and the sf1 legs, best-of-N, fresh session. Compare against the same
probe on the old 12k-turn layout (run before regeneration). Diagnostic."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N = int(os.environ.get("PROBE_RUNS", "3"))


def main():
    import __spark_entry__ as entrymod
    from bfokg.session import get_spark

    spark = get_spark(app_name="ab-extract", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    qs = entrymod.queries()

    for sf_dir in ("/root/testdata/sf0.1", "/root/testdata/sf1.0"):
        for name in ("mentions", "edges"):
            best = None
            rows = None
            for _ in range(N):
                t0 = time.time()
                rows = qs[name](spark, sf_dir).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            print(f"{sf_dir.split('/')[-1]} {name}: best {best:.3f}s rows={rows}",
                  flush=True)
    print("loadavg", open("/proc/loadavg").read().split()[:3])


if __name__ == "__main__":
    main()
