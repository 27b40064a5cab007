"""Hub-key skew demo: plain keyed asof_join (the hub key's whole window
sorts in ONE task) vs asof_join_global(by=…) (time-buckets WITHIN keys —
one task per (key, bucket)). Same input, same answer (row-count asserted
equal), local[32], fresh JVM per variant, warm-up then best of
SPARK_GRAFT_ASOF_SKEW_RUNS (2). Appends to BENCH/TEMPORAL.md.

Input: SPARK_GRAFT_ASOF_SKEW_N events (default 64M) where user 0 owns
HALF of all rows and the rest spread over 200k users — the straggler
shape a conversation/user-keyed 100 TB corpus hits when one synthetic
account dominates. Timestamps globally unique via the multiplicative-
hash bijection (no dedup pass in the timing).

    env PYTHONPATH=/root/repo python tools/asof_skew_bench.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(os.environ.get("SPARK_GRAFT_ASOF_SKEW_N", str(64_000_000)))
RUNS = int(os.environ.get("SPARK_GRAFT_ASOF_SKEW_RUNS", "2"))
USERS = 200_000
DATA = os.path.join(os.environ.get("BFOKG_DATA_ROOT", os.path.join(REPO, "data")),
                    f"asof_skew_{N}")

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from bfokg.session import get_spark
spark = get_spark(app_name="skew-gen", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
# even ids -> user 0 (the hub, 50% of rows); odd ids -> hashed over 200k users
df = (spark.range({n})
      .select(F.col("id"),
              F.when(F.col("id") % 2 == 0, F.lit(0))
               .otherwise(F.pmod(F.xxhash64("id"), F.lit({users}))).alias("user_id"),
              F.timestamp_seconds(
                  F.lit(1700000000)
                  + F.pmod(F.col("id") * 2654435761, F.lit(2**31))).alias("ts"),
              ((F.col("id") % 1000) / 1000.0).alias("value"),
              (F.col("id") % 5 != 0).alias("is_left")))
df.repartition(64).write.mode("overwrite").parquet({data!r})
print("generated")
"""

JOB = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from bfokg.session import get_spark
from bfokg.operators.temporal import asof_join, asof_join_global

spark = get_spark(app_name="skew-{variant}", master="local[32]",
                  shuffle_partitions=32,
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "8m",
                              "spark.sql.files.openCostInBytes": "0"}})
spark.sparkContext.setLogLevel("ERROR")
ev = spark.read.parquet({data!r})
left = ev.where("is_left").select("user_id", "ts", "id")
right = ev.where("NOT is_left").select("user_id", "ts", "value")

def once():
    t0 = time.time()
    if {variant!r} == "plain":
        out = asof_join(left, right, on="ts", by="user_id")
    else:
        out = asof_join_global(left, right, on="ts", by="user_id",
                               bucket_seconds=3600)
    row = out.agg(F.count(F.lit(1)).alias("n"),
                  F.sum("value_right").alias("s")).first()
    return time.time() - t0, row.n, float(row.s)

once()
times, n, s = [], 0, 0.0
for _ in range({runs}):
    dt, n, s = once()
    times.append(dt)
print(json.dumps({{"variant": {variant!r}, "sec": round(min(times), 3),
                  "rows": n, "checksum": round(s, 3)}}))
"""


def _loadavg():
    with open("/proc/loadavg") as f:
        return [float(x) for x in f.read().split()[:3]]


def _run(code):
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3000,
                         env={**os.environ, "PYTHONPATH": REPO})
    lines = [l for l in out.stdout.strip().splitlines()
             if l.startswith("{") or l == "generated"]
    if not lines:
        raise RuntimeError(f"job failed:\n{out.stderr[-2000:]}")
    return lines[-1]


def main():
    load_before = _loadavg()
    if not os.path.exists(os.path.join(DATA, "_SUCCESS")):
        _run(GEN.format(repo=REPO, n=N, users=USERS, data=DATA))
    plain = json.loads(_run(JOB.format(repo=REPO, data=DATA, variant="plain",
                                       runs=RUNS)))
    bucketed = json.loads(_run(JOB.format(repo=REPO, data=DATA,
                                          variant="bucketed", runs=RUNS)))
    load_after = _loadavg()
    assert plain["rows"] == bucketed["rows"], (plain, bucketed)
    assert abs(plain["checksum"] - bucketed["checksum"]) < 1.0, (plain, bucketed)
    speedup = round(plain["sec"] / bucketed["sec"], 2)
    report = {"n_events": N, "hub_share": 0.5, "plain": plain,
              "bucketed": bucketed, "speedup": speedup,
              "loadavg_before": load_before, "loadavg_after": load_after,
              "ts": datetime.now(timezone.utc).isoformat()}
    print(json.dumps(report, indent=2))

    md = f"""
## Hub-key skew demo — `tools/asof_skew_bench.py` {report['ts']}

{N:,} events, user 0 owns 50% of all rows (the straggler shape), rest
over 200k users; local[32], fresh JVM per variant, warm-up then best of
{RUNS}. Same answer verified (row count + value checksum equal).

| variant | wall sec | note |
|---|---|---|
| asof_join (plain keyed window) | {plain['sec']} | hub key sorts in ONE task |
| asof_join_global(by=user_id, 1h buckets) | {bucketed['sec']} | one task per (key, bucket) |

**Speedup {speedup}×** for the bucketed variant on this skew shape.
loadavg before/after: {load_before} / {load_after}.
"""
    with open(os.path.join(REPO, "BENCH", "TEMPORAL.md"), "a") as f:
        f.write(md)
    print("appended to BENCH/TEMPORAL.md")


if __name__ == "__main__":
    main()
