"""Two-parallelism scaling evidence (north_rule: ≥0.8 efficiency N → 4N).

No multi-node cluster exists in this sandbox, so per the driver
instruction the same job runs on the same input at local[8] and local[32]
(fresh JVM each, via subprocess) and we report throughput at both plus
efficiency = (throughput@32 / throughput@8) / 4. Results → BENCH/BASELINE.md.

The measured job is the KG-construction dataflow (extract → link → dedup)
over the deterministic synthetic transcripts at SPARK_GRAFT_SCALE_SF
(default 1.0 → 600k turns, 50 parquet files): large enough that fixed
JVM/worker overheads don't drown the scaling signal. Each JVM does one
warm-up pass, then reports the best of two timed runs.

    env PYTHONPATH=/root/repo python tools/scaling_bench.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALE_SF = float(os.environ.get("SPARK_GRAFT_SCALE_SF", "1.0"))
SCALE_FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "16"))

JOB = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from bfokg.session import get_spark
from bfokg.datagen import generate_transcripts, sf_to_n_turns
from bfokg.operators.linking import alias_dict_df
from bfokg.operators.triples import dedup_triples, extract_triples, link_triples

sf = {sf}
factor = {factor}
cpus = {cpus}
spark = get_spark(app_name=f"scale-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=cpus,
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "8m",
                              "spark.sql.files.openCostInBytes": "0"}})
spark.sparkContext.setLogLevel("ERROR")
from bfokg.datagen import amplify_transcripts
path = amplify_transcripts(spark, sf, factor)
t = spark.read.parquet(path)
alias_dict = alias_dict_df(spark)

def run_once():
    t0 = time.time()
    n = dedup_triples(link_triples(extract_triples(t), alias_dict)).count()
    return time.time() - t0, n

run_once()  # warm-up: JVM JIT, python workers, file listing
times = []
for _ in range(3):
    dt, n_edges = run_once()
    times.append(dt)
best = min(times)
n_turns = sf_to_n_turns(sf) * factor
print(json.dumps({{"cpus": cpus, "sec": round(best, 3), "edges": n_edges,
                  "turns": n_turns,
                  "turns_per_sec": round(n_turns / best, 1)}}))
"""


def run(cpus: int) -> dict:
    code = JOB.format(repo=REPO, sf=SCALE_SF, factor=SCALE_FACTOR, cpus=cpus)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=2400,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"job failed (cpus={cpus}):\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


GEN_JOB = r"""
import sys
sys.path.insert(0, {repo!r})
from bfokg.session import get_spark
from bfokg.datagen import amplify_transcripts
spark = get_spark(app_name="scale-gen", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
print(amplify_transcripts(spark, {sf}, {factor}))
"""


def pregen():
    code = GEN_JOB.format(repo=REPO, sf=SCALE_SF, factor=SCALE_FACTOR)
    subprocess.run([sys.executable, "-c", code], capture_output=True, text=True,
                   timeout=2400, env={**os.environ, "PYTHONPATH": REPO}, check=True)


def _loadavg() -> list[float]:
    with open("/proc/loadavg") as f:
        return [float(x) for x in f.read().split()[:3]]


def main():
    load_before = _loadavg()
    pregen()  # one-time input materialization in its own JVM (not measured)
    r8 = run(8)
    r32 = run(32)
    load_after = _loadavg()
    eff = (r32["turns_per_sec"] / r8["turns_per_sec"]) / 4
    report = {
        "scale_sf": SCALE_SF, "factor": SCALE_FACTOR, "local8": r8, "local32": r32,
        "scaling_efficiency": round(eff, 3),
        "loadavg_before": load_before, "loadavg_after": load_after,
        "ts": datetime.now(timezone.utc).isoformat(),
    }
    print(json.dumps(report, indent=2))

    # Append-only (round 5): an earlier version of this tool REWROTE the
    # file's head section and clobbered the curated multi-run comparison
    # table (including the standing quiet-box 0.806 row). New runs now
    # append a dated section; fold the row into the head table by hand.
    md = f"""

## KG-pipeline scaling run — `tools/scaling_bench.py` {report['ts']}

Same protocol as the head section (sf={SCALE_SF} ×{SCALE_FACTOR} =
{r8['turns']} turns, fresh JVM per parallelism, warm-up, best of two).

| parallelism | wall sec | turns/sec | edges |
|---|---|---|---|
| local[8]  | {r8['sec']} | {r8['turns_per_sec']} | {r8['edges']} |
| local[32] | {r32['sec']} | {r32['turns_per_sec']} | {r32['edges']} |

**Scaling efficiency** = (throughput@32 / throughput@8) / 4 =
**{report['scaling_efficiency']}** (north_rule target ≥ 0.8).
loadavg before/after (after includes the run's own JVMs):
{load_before} / {load_after}.
"""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "a") as f:
        f.write(md)
    print(f"appended run section to {out_path}")


if __name__ == "__main__":
    main()
