"""SparkSession factory tuned for the KG-construction workload.

Scale posture (100 TB target, tested on local[N]):
- AQE on (runtime re-plan, skew-join splitting for the candidate-scoring and
  P279-closure joins — SURVEY.md §4.2).
- Arrow on (every Python kernel is an Arrow-batched pandas UDF).
- shuffle partitions sized to parallelism locally; on a real cluster this is
  set per-job (or left to AQE coalescing, which is enabled here).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "bfokg",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard conf.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or ``local[*]``.
    On a real cluster, spark-submit supplies master/executors and this
    function only layers SQL conf on top.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_NO_MASTER"):
        builder = builder.master(f"local[{cpus}]")

    sp = shuffle_partitions if shuffle_partitions is not None else DEFAULT_SHUFFLE_PARTITIONS
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # allow shuffled-hash joins where a side's per-partition build fits
        # (guide §3.1/§9): skips both sort passes of sort-merge — measured
        # −15% on the MinHash verify tail at 160k docs; AQE additionally
        # rewrites SMJ→SHJ at runtime when every post-shuffle partition is
        # under the local-map threshold, so the choice is size-guarded
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        "spark.sql.shuffle.partitions": str(sp),
        # timestamps in testdata are UTC; keep both engines in agreement
        "spark.sql.session.timeZone": "UTC",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        # deterministic float handling in aggregations we compare to oracles
        "spark.sql.ansi.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
