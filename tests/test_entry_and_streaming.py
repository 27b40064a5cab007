"""Driver-contract smoke (entry/queries/oracle_sql) + streaming variant."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bfokg.datagen import generate_transcripts  # noqa: E402


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every oracle is nonempty SQL
    assert all(s.strip().upper().startswith(("SELECT", "WITH")) for s in oracles.values())


def test_entry_returns_edges(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert {"subj_qid", "pred", "obj_qid"} <= set(df.columns)


def test_streaming_edges_match_batch(spark):
    """The streaming pipeline (availableNow drain) finds the same distinct
    (s,p,o) set as the batch dedup."""
    from bfokg.operators.linking import alias_dict_df
    from bfokg.operators.triples import dedup_triples, extract_triples, link_triples
    from bfokg.streaming.stream_pipeline import run_stream_to_memory

    src = generate_transcripts(0.001)
    batch = spark.read.parquet(src)
    expected = {
        (r.subj_qid, r.pred, r.obj_qid)
        for r in dedup_triples(
            link_triples(extract_triples(batch), alias_dict_df(spark))
        ).collect()
    }
    run_stream_to_memory(spark, src, name="edges_stream_test")
    got = {
        (r.subj_qid, r.pred, r.obj_qid)
        for r in spark.sql(
            "SELECT DISTINCT subj_qid, pred, obj_qid FROM edges_stream_test"
        ).collect()
    }
    assert got == expected


def test_stateful_sessionization_matches_batch(spark):
    """applyInPandasWithState conversation rollup, drained one file per
    micro-batch (state must survive across batches), converges to the
    batch groupBy answer; last emit per conv_id is the final state."""
    import tempfile

    from pyspark.sql import Window
    from bfokg.streaming.stream_pipeline import run_conversation_stats_to_memory

    full = spark.read.parquet(generate_transcripts(0.001))
    # two files, every conversation split across both → state must carry over
    tmp = tempfile.mkdtemp(prefix="conv_stats_src_")
    full.where("turn_idx % 2 = 0").coalesce(1).write.mode("append").parquet(tmp)
    full.where("turn_idx % 2 = 1").coalesce(1).write.mode("append").parquet(tmp)
    src = tmp
    batch = spark.read.parquet(src)
    expected = {
        r.conv_id: (r.n_turns, r.n_tool_calls, r.first_ts, r.last_ts)
        for r in batch.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(
                (F.col("tool").isNotNull() & (F.col("tool") != "")).cast("long")
            ).alias("n_tool_calls"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    run_conversation_stats_to_memory(
        spark, src, name="conv_stats_test", max_files_per_trigger=1
    )
    emits = spark.sql("SELECT * FROM conv_stats_test")
    w = Window.partitionBy("conv_id").orderBy(F.desc("n_turns"))
    final = emits.withColumn("rk", F.row_number().over(w)).where("rk = 1")
    got = {
        r.conv_id: (r.n_turns, r.n_tool_calls, r.first_ts, r.last_ts)
        for r in final.collect()
    }
    assert got == expected
    # state really crossed micro-batches: some conv got >1 emit
    assert emits.count() > len(expected)
