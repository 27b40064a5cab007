"""Two-parallelism scaling evidence for the temporal operators
(asof_join, sessionize) — same protocol as tools/scaling_bench.py:
fresh JVM per parallelism level via subprocess, identical pre-written
parquet input, warm-up pass, best of SPARK_GRAFT_TEMPORAL_RUNS (3)
timed runs, loadavg recorded. Results append to BENCH/TEMPORAL.md.

Input: deterministic synthetic events (no external data) —
SPARK_GRAFT_TEMPORAL_N rows (default 8M), 200k users, globally-unique
timestamps via a multiplicative-hash bijection (so the asof right side
needs no dedup pass that would contaminate the timing), 80/20
left/right split by id.

    env PYTHONPATH=/root/repo python tools/temporal_bench.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(os.environ.get("SPARK_GRAFT_TEMPORAL_N", str(8_000_000)))
RUNS = int(os.environ.get("SPARK_GRAFT_TEMPORAL_RUNS", "3"))
USERS = 200_000
DATA_DIR = os.environ.get("BFOKG_DATA_ROOT", os.path.join(REPO, "data"))
EVENTS = os.path.join(DATA_DIR, f"temporal_bench_{N}")

GEN_JOB = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from bfokg.session import get_spark
spark = get_spark(app_name="temporal-gen", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
# ts bijection: odd multiplier mod 2^31 is injective, so (user_id, ts) is
# unique without any dedup; ids < N < 2^31
df = (spark.range({n})
      .select(F.col("id"),
              F.pmod(F.xxhash64("id"), F.lit({users})).alias("user_id"),
              F.timestamp_seconds(
                  F.lit(1700000000)
                  + F.pmod(F.col("id") * 2654435761, F.lit(2**31))).alias("ts"),
              ((F.col("id") % 1000) / 1000.0).alias("value"),
              (F.col("id") % 5 != 0).alias("is_left")))
df.repartition(64).write.mode("overwrite").parquet({events!r})
print("generated", {events!r})
"""

JOB = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from bfokg.session import get_spark
from bfokg.operators.temporal import (asof_join, asof_join_global,
                                      interval_join, sessionize)

cpus = {cpus}
spark = get_spark(app_name=f"temporal-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=cpus,
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "8m",
                              "spark.sql.files.openCostInBytes": "0"}})
spark.sparkContext.setLogLevel("ERROR")
ev = spark.read.parquet({events!r})
left = ev.where("is_left").select("user_id", "ts", "id")
right = ev.where("NOT is_left").select("user_id", "ts", "value")

def asof_once():
    t0 = time.time()
    out = asof_join(left, right, on="ts", by="user_id")
    row = out.agg(F.count(F.lit(1)).alias("n"),
                  F.sum("value_right").alias("s")).first()
    return time.time() - t0, row.n

def sess_once():
    t0 = time.time()
    out = sessionize(ev, ts_col="ts", by="user_id", gap="INTERVAL 1 HOUR",
                     tiebreak=["id"])
    # crc32-sum forces every session_id without a second wide shuffle
    row = out.agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.crc32(F.col("session_id"))).alias("s")).first()
    return time.time() - t0, row.n

def glob_once():
    # un-keyed as-of over the full span (2^31 s -> ~596k hourly buckets:
    # the carry window runs single-partition over bucket summaries)
    t0 = time.time()
    out = asof_join_global(left.drop("user_id"), right.drop("user_id"),
                           on="ts", bucket_seconds=3600)
    row = out.agg(F.count(F.lit(1)).alias("n"),
                  F.sum("value_right").alias("s")).first()
    return time.time() - t0, row.n

intervals = right.select(
    "user_id", F.col("ts").alias("start"),
    (F.col("ts") + F.make_interval(secs=F.lit(1800) + F.col("value") * 7200)
     ).alias("end"),
    F.col("value").alias("weight"))

def ivl_once():
    # keyed point-in-interval: 51.2M points vs 12.8M intervals (0.5-2.4h)
    t0 = time.time()
    out = interval_join(left, intervals, on="ts", by="user_id",
                        bucket_seconds=3600, guard="off")
    row = out.agg(F.count(F.lit(1)).alias("n"),
                  F.sum("weight_right").alias("s")).first()
    return time.time() - t0, row.n

def best(fn):
    fn()  # warm-up
    times, n = [], 0
    for _ in range({runs}):
        dt, n = fn()
        times.append(dt)
    return min(times), n

asof_sec, n_left = best(asof_once)
sess_sec, n_all = best(sess_once)
glob_sec, n_g = best(glob_once)
ivl_sec, n_iv = best(ivl_once)
print(json.dumps({{"cpus": cpus,
                  "asof_sec": round(asof_sec, 3), "asof_rows": n_left,
                  "asof_rows_per_sec": round(n_left / asof_sec, 1),
                  "sess_sec": round(sess_sec, 3), "sess_rows": n_all,
                  "sess_rows_per_sec": round(n_all / sess_sec, 1),
                  "glob_sec": round(glob_sec, 3), "glob_rows": n_g,
                  "glob_rows_per_sec": round(n_g / glob_sec, 1),
                  "ivl_sec": round(ivl_sec, 3), "ivl_matches": n_iv,
                  "ivl_points": {n} * 4 // 5,
                  "ivl_rows_per_sec": round(({n} * 4 // 5) / ivl_sec, 1)}}))
"""


def _loadavg() -> list[float]:
    with open("/proc/loadavg") as f:
        return [float(x) for x in f.read().split()[:3]]


def _run(code: str, timeout: int = 2400) -> str:
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=timeout,
                         env={**os.environ, "PYTHONPATH": REPO})
    lines = [l for l in out.stdout.strip().splitlines()
             if l.startswith("{") or l.startswith("generated")]
    if not lines:
        raise RuntimeError(f"job failed:\n{out.stderr[-2000:]}")
    return lines[-1]


def main():
    load_before = _loadavg()
    if not os.path.exists(os.path.join(EVENTS, "_SUCCESS")):
        _run(GEN_JOB.format(repo=REPO, n=N, users=USERS, events=EVENTS))
    legs = {}
    for cpus in (8, 32):
        legs[cpus] = json.loads(
            _run(JOB.format(repo=REPO, events=EVENTS, cpus=cpus, runs=RUNS,
                            n=N)))
    load_after = _loadavg()
    r8, r32 = legs[8], legs[32]
    eff_asof = round((r32["asof_rows_per_sec"] / r8["asof_rows_per_sec"]) / 4, 3)
    eff_sess = round((r32["sess_rows_per_sec"] / r8["sess_rows_per_sec"]) / 4, 3)
    eff_glob = round((r32["glob_rows_per_sec"] / r8["glob_rows_per_sec"]) / 4, 3)
    eff_ivl = round((r32["ivl_rows_per_sec"] / r8["ivl_rows_per_sec"]) / 4, 3)
    report = {"n_events": N, "runs_per_leg": RUNS, "local8": r8, "local32": r32,
              "eff_asof": eff_asof, "eff_sess": eff_sess, "eff_glob": eff_glob,
              "eff_ivl": eff_ivl,
              "loadavg_before": load_before, "loadavg_after": load_after,
              "ts": datetime.now(timezone.utc).isoformat()}
    print(json.dumps(report, indent=2))

    md = f"""
## Temporal-operator scaling run — `tools/temporal_bench.py` {report['ts']}

{N:,} synthetic events (200k users, unique timestamps by construction),
fresh JVM per parallelism, warm-up then best of {RUNS}.
asof_join: 80% left rows enriched with the latest preceding right row
per user. sessionize: 1-hour gap sessions over all rows, crc32-sum
forced.

| operator | local[8] sec | local[8] rows/s | local[32] sec | local[32] rows/s | efficiency |
|---|---|---|---|---|---|
| asof_join | {r8['asof_sec']} | {r8['asof_rows_per_sec']:,} | {r32['asof_sec']} | {r32['asof_rows_per_sec']:,} | **{eff_asof}** |
| sessionize | {r8['sess_sec']} | {r8['sess_rows_per_sec']:,} | {r32['sess_sec']} | {r32['sess_rows_per_sec']:,} | **{eff_sess}** |
| asof_join_global (~596k-bucket carry) | {r8['glob_sec']} | {r8['glob_rows_per_sec']:,} | {r32['glob_sec']} | {r32['glob_rows_per_sec']:,} | **{eff_glob}** |
| interval_join (keyed, points/s, {r8['ivl_matches']:,} matches) | {r8['ivl_sec']} | {r8['ivl_rows_per_sec']:,} | {r32['ivl_sec']} | {r32['ivl_rows_per_sec']:,} | **{eff_ivl}** |

loadavg before/after (after includes the run's own JVMs):
{load_before} / {load_after}.
"""
    out_path = os.path.join(REPO, "BENCH", "TEMPORAL.md")
    header = "" if os.path.exists(out_path) else (
        "# Temporal operators — scaling evidence\n\nAppend-only run log; "
        "each section is one two-parallelism measurement (same protocol as "
        "the KG-pipeline runs in BENCH/BASELINE.md).\n")
    with open(out_path, "a") as f:
        f.write(header + md)
    print(f"appended run section to {out_path}")


if __name__ == "__main__":
    main()
