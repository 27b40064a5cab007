"""Controlled probes separating CPU scaling from shuffle-machinery scaling.

The closure loop's strong-scaling ceiling on this box (BENCH/CLOSURE.md)
needs attribution: is the dataflow serial, or is a shared box resource
saturated? Two microbenchmarks, same harness as the closure bench (fresh
JVM per parallelism, warm-up, best of two):

- **cpu probe** — sha2 hashing over ``spark.range`` with a single scalar
  aggregate: almost no data movement, pure per-row CPU. If local[32] ≈ 4×
  local[8], the box's 32 cores genuinely parallelize Spark tasks.
- **shuffle probe** — two chained wide transforms (repartition by key +
  groupBy count) over synthetic (long, long) pairs sized like one closure
  round: no closure logic at all, just Spark's shuffle write/read/sort
  machinery. Its 8→32 speedup is the box's ceiling for shuffle-dominated
  work — the closure loop cannot beat it.

Appends a section to BENCH/CLOSURE.md.

    env PYTHONPATH=/root/repo python tools/scaling_probes.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROWS_CPU = int(os.environ.get("PROBE_CPU_ROWS", "60000000"))
ROWS_SHUFFLE = int(os.environ.get("PROBE_SHUFFLE_ROWS", "60000000"))

JOB = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from bfokg.session import get_spark

cpus = {cpus}
spark = get_spark(app_name=f"probe-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

def cpu_probe():
    t0 = time.time()
    (spark.range({rows_cpu})
     .select(F.length(F.sha2(F.col("id").cast("string"), 256)).alias("n"))
     .agg(F.sum("n")).collect())
    return time.time() - t0

def shuffle_probe():
    t0 = time.time()
    (spark.range({rows_shuffle})
     .select((F.xxhash64("id")).alias("k"), (F.xxhash64("id", F.lit(1))).alias("v"))
     .repartition(32, "v")
     .groupBy("k").agg(F.count("*").alias("c"))
     .agg(F.sum("c")).collect())
    return time.time() - t0

out = {{"cpus": cpus}}
for name, fn in [("cpu", cpu_probe), ("shuffle", shuffle_probe)]:
    fn()
    out[name] = min(fn() for _ in range(2))
print("RESULT " + json.dumps(out))
"""


def run(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c",
         JOB.format(repo=REPO, cpus=cpus, rows_cpu=ROWS_CPU,
                    rows_shuffle=ROWS_SHUFFLE)],
        capture_output=True, text=True, timeout=3600,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    for line in (out.stdout + out.stderr).replace("\r", "\n").splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line for cpus={cpus}:\n{out.stderr[-2000:]}")


def main():
    r8 = run(8)
    r32 = run(32)
    cpu_sp = r8["cpu"] / r32["cpu"]
    sh_sp = r8["shuffle"] / r32["shuffle"]
    md = f"""

## Attribution probes — `tools/scaling_probes.py`

Same harness (fresh JVM per parallelism, warm-up, best of two), no closure
logic involved:

| probe | local[8] sec | local[32] sec | speedup (of 4× ideal) |
|---|---|---|---|
| cpu (sha2 over range, {ROWS_CPU:,} rows, ~no data movement) | {r8['cpu']:.1f} | {r32['cpu']:.1f} | {cpu_sp:.2f}× ({cpu_sp/4:.2f}) |
| shuffle (repartition+groupBy over {ROWS_SHUFFLE:,} (long,long) pairs) | {r8['shuffle']:.1f} | {r32['shuffle']:.1f} | {sh_sp:.2f}× ({sh_sp/4:.2f}) |

Reading: these are the BOX's ceilings for single-JVM thread scaling, with
zero closure logic involved. Whatever the generic shuffle probe achieves
is the upper bound for any shuffle-dominated operator on this substrate;
compare the closure's measured speedup against it — at or above that line
means the operator's dataflow has nothing left to give on one box. The
per-executor resources that cap a single JVM (memory bus, allocator/GC,
shuffle I/O) are exactly the ones a real N→4N-executor cluster multiplies
with N, which is the regime the north_rule targets; the transcripts
pipeline — whose heavy stages run in per-process Python workers rather
than one shared JVM — measures 0.881 on this same box.
"""
    path = os.path.join(REPO, "BENCH", "CLOSURE.md")
    with open(path, "a") as f:
        f.write(md)
    print(md)
    print("appended to", path)


if __name__ == "__main__":
    main()
