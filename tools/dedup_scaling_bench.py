"""Two-parallelism scaling evidence for the corpus-dedup family.

Companion to ``tools/scaling_bench.py`` (KG pipeline) — same harness
(fresh JVM per parallelism via subprocess, one warm-up, best of two timed
runs, same input both sizes), measuring ``minhash_lsh_pairs`` end-to-end:
Arrow-batched signature kernel → banded buckets → candidate join →
estimated-jaccard verify. The documents table is amplified with per-copy
token-suffixed variants: every token gets ``_<copy>`` appended, so copies
of the same doc share NO shingles (no quadratic cross-copy near-dup
cliques) while each copy stratum preserves the base table's genuine
near-dup pairs — doc count and pair count both scale LINEARLY with the
amplification factor, which is the realistic corpus shape.

Appends a section to BENCH/BASELINE.md.

    env PYTHONPATH=/root/repo python tools/dedup_scaling_bench.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("DEDUP_SCALE_FACTOR", "16"))
RUNS = int(os.environ.get("DEDUP_SCALE_RUNS", "2"))

JOB = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from bfokg.session import get_spark
from bfokg.operators.dedup import minhash_lsh_pairs
from bfokg.util import release_intermediates

cpus = {cpus}
spark = get_spark(app_name=f"dedup-scale-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
base = spark.read.parquet({sf_dir!r} + "/documents.parquet").select("doc_id", "text")
n_base = base.count()
copies = spark.range({factor}).select(F.col("id").alias("copy"))
suffixed = F.array_join(
    F.transform(
        F.split("text", " "),
        lambda t: F.concat(t, F.lit("_"), F.col("copy").cast("string")),
    ),
    " ",
)
docs = (base.crossJoin(copies)
        .select((F.col("doc_id") * {factor} + F.col("copy")).alias("doc_id"),
                suffixed.alias("text"))
        .repartition(64).persist())
n_docs = docs.count()

def loadavg1():
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])

def run_once():
    la = loadavg1()
    t0 = time.time()
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    n = pairs.count()
    release_intermediates(pairs)
    return round(time.time() - t0, 3), n, la

run_once()
samples, n_pairs = [], 0
for _ in range({runs}):
    dt, n_pairs, la = run_once()
    samples.append((dt, la))
print("RESULT " + json.dumps({{"cpus": cpus, "docs": n_docs,
                               "pairs": n_pairs,
                               "sec": min(s[0] for s in samples),
                               "samples": samples}}))
"""


def run(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c",
         JOB.format(repo=REPO, cpus=cpus, sf_dir=SF_DIR, factor=FACTOR,
                    runs=RUNS)],
        capture_output=True, text=True, timeout=3600,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    for line in (out.stdout + out.stderr).replace("\r", "\n").splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line for cpus={cpus}:\n{out.stderr[-2000:]}")


def _loadavg():
    with open("/proc/loadavg") as f:
        return [float(x) for x in f.read().split()[:3]]


def main():
    load_before = _loadavg()
    r8 = run(8)
    r32 = run(32)
    load_after = _loadavg()
    tput8 = r8["docs"] / r8["sec"]
    tput32 = r32["docs"] / r32["sec"]
    eff = (tput32 / tput8) / 4
    md = f"""

## Corpus-dedup scaling — `tools/dedup_scaling_bench.py`

Generated {datetime.now(timezone.utc).isoformat()}: ``minhash_lsh_pairs``
(signature kernel → banded buckets → candidate join → verify) over the
sf0.1 documents table amplified ×{FACTOR} with perturbed near-duplicate
copies — {r8['docs']:,} docs, {r8['pairs']:,} verified near-dup pairs.
Fresh JVM per parallelism, warm-up, best of {RUNS} (per-sample
(sec, 1-min-loadavg-at-start) listed so an externally-bursted sample is
visible and excluded by the min).
Samples @8: {r8['samples']}; @32: {r32['samples']}.

| parallelism | wall sec | docs/sec |
|---|---|---|
| local[8]  | {r8['sec']:.3f} | {tput8:,.1f} |
| local[32] | {r32['sec']:.3f} | {tput32:,.1f} |

**Scaling efficiency** = (throughput@32 / throughput@8) / 4 = **{eff:.3f}**.
loadavg before/after: {load_before} / {load_after}.
"""
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "a") as f:
        f.write(md)
    print(md)
    print("appended to", path)


if __name__ == "__main__":
    main()
