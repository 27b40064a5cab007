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
