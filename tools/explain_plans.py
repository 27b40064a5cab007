"""Dump formatted physical plans of the headline queries → BENCH/PLANS.md.

What to look for (and what the committed output shows):
- parquet scans carry PushedFilters / narrow ReadSchema (pruning works),
- small dims join as BroadcastHashJoin, never shuffle,
- WholeStageCodegen spans cover the column-expression pipelines,
- the only exchanges are the semantically required ones (top-k windows,
  dedup window, final aggregates).

    env PYTHONPATH=/root/repo python tools/explain_plans.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")

PLAN_QUERIES = [
    "edges",
    "rule_based",
    "pricing_summary",
    "customer_nation_revenue",
    "wikidata_canon",
    "embedding_topk",
    "embedding_lsh_dups",
    "embedding_ivf_topk",
    "dedup_exact",
    "minhash_lsh",
    "lsh_jaccard",
    "doc_splits",
    "doc_stats",
    "doc_cascade",
]


def main():
    import __spark_entry__ as entrymod
    from bfokg.session import get_spark

    spark = get_spark(app_name="explain", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out = ["# Physical plans (explain formatted) — headline queries\n"]
    for name in PLAN_QUERIES:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out.append(f"\n## {name}\n\n```\n{buf.getvalue().strip()}\n```\n")
    # temporal operators (not registry queries): the one-shuffle shape —
    # a single hashpartitioning exchange on the by-keys feeding the window
    from pyspark.sql import functions as F
    from bfokg.operators.temporal import (asof_join, asof_join_global,
                                          interval_join, sessionize)

    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    buys = (ev.where(F.col("event_type") == "purchase")
            .select("user_id", "ts", "value").dropDuplicates(["user_id", "ts"]))
    iv = buys.select("user_id", F.col("ts").alias("start"),
                     (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end"),
                     "value")
    for name, df in (
        ("asof_join (clicks ⟵ latest purchase per user)",
         asof_join(clicks, buys, on="ts", by="user_id")),
        ("sessionize (events, 30-min gap)",
         sessionize(ev, ts_col="ts", by="user_id", tiebreak=["event_id"])),
        ("asof_join_global (un-keyed, bucket-carry; note the broadcast of "
         "the bucket-summary carry table)",
         asof_join_global(clicks.drop("user_id"),
                          buys.drop("user_id").dropDuplicates(["ts"]),
                          on="ts")),
        ("interval_join (bucket-explode equi-join; no theta-join — the "
         "BETWEEN is a residual filter on a hash join)",
         interval_join(clicks, iv, on="ts", by="user_id", guard="off")),
    ):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out.append(f"\n## {name}\n\n```\n{buf.getvalue().strip()}\n```\n")

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH", "PLANS.md")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
