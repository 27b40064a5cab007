"""Flagship DAG: datagen → mentions/triples → link → dedup → materialize,
plus checkpoint-resume and the per-turn text-equality invariant."""

import os

from pyspark.sql import functions as F

from bfokg.datagen import generate_transcripts, sf_to_n_turns
from bfokg.operators.linking import alias_dict_df, extract_mentions, link_mentions
from bfokg.operators.triples import dedup_triples, extract_triples, link_triples
from bfokg.plans.pipeline import run_pipeline
from bfokg.sources.warehouse import read_manifest


def _transcripts(spark):
    path = generate_transcripts(0.001)
    return spark.read.parquet(path)


def test_datagen_deterministic_and_stable_order(spark):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering — two reads, identical ordered text."""
    df = _transcripts(spark)
    assert df.count() == sf_to_n_turns(0.001)
    a = [r.text for r in _transcripts(spark).orderBy("conv_id", "turn_idx").collect()]
    b = [r.text for r in _transcripts(spark).orderBy("conv_id", "turn_idx").collect()]
    assert a == b
    # schema matches input_hint exactly
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    ]
    assert dict(df.dtypes)["turn_idx"] == "int"
    assert dict(df.dtypes)["ts"].startswith("timestamp")


def test_mention_extraction_and_linking(spark):
    df = _transcripts(spark)
    mentions = extract_mentions(df)
    assert mentions.count() > 0
    linked = link_mentions(mentions, alias_dict_df(spark))
    # every linked mention resolves to exactly one qid per occurrence
    dup = (
        linked.groupBy("conv_id", "turn_idx", "mention", "mention_pos")
        .count().where(F.col("count") > 1).count()
    )
    assert dup == 0
    # ambiguous surface 'catalyst' must resolve to its label bearer Q_SYNTH_61
    cat = linked.where(F.col("mention") == "catalyst").select("qid").distinct().collect()
    assert [r.qid for r in cat] in ([], [["Q_SYNTH_61"][0]],) or all(
        r.qid == "Q_SYNTH_61" for r in cat
    )


def test_extraction_impls_agree(spark):
    """The JVM regexp_extract_all scale path and the Arrow mapInPandas
    kernel produce identical multisets (mentions and triples)."""
    from collections import Counter

    df = _transcripts(spark)
    m_cols = ["conv_id", "turn_idx", "mention", "mention_pos"]
    m_sql = Counter(map(tuple, extract_mentions(df, impl="sql").select(m_cols).collect()))
    m_pd = Counter(map(tuple, extract_mentions(df, impl="pandas").select(m_cols).collect()))
    assert m_sql == m_pd
    # the O(|text|) dictionary-size-independent Aho-Corasick kernel must
    # reproduce the regex path exactly (leftmost-longest, word boundaries,
    # non-overlapping)
    m_aho = Counter(map(tuple, extract_mentions(df, impl="aho").select(m_cols).collect()))
    assert m_sql == m_aho
    t_cols = ["conv_id", "turn_idx", "subj_mention", "pred", "obj_mention"]
    t_sql = Counter(map(tuple, extract_triples(df, impl="sql").select(t_cols).collect()))
    t_pd = Counter(map(tuple, extract_triples(df, impl="pandas").select(t_cols).collect()))
    assert t_sql == t_pd


def test_aho_corasick_matches_regex_semantics():
    """Driver-side pin: AhoCorasick.search == the word-boundary alternation
    regex (longest-first) on crafted overlap/boundary edge cases."""
    import re

    from bfokg.operators.linking import AhoCorasick, surface_pattern

    pats = ["sahara desert", "sahara", "desert", "ab", "abc", "tour",
            "la tour eiffel", "x y z", "y",
            "-ab", "ab-", "d'or", "'quoted'"]      # non-word edge chars
    ac = AhoCorasick(pats)
    rx = re.compile(surface_pattern(pats))
    texts = [
        "the sahara desert is a desert",          # longest-first + reuse
        "sahara deserts",                          # trailing boundary kills both
        "abcd ab abc",                             # prefix chains + boundaries
        "visit la tour eiffel and the tour",       # multiword containing 'tour'
        "x y z y x",                               # overlap chain
        "xabc",                                    # leading boundary kills
        "", "   ", "ab",                           # degenerate
        "x-ab y-ab- -ab",                          # \b before '-' needs word char
        "mont d'or and d'or. 'quoted' too",        # apostrophe edges
        "-ab",                                     # leading non-word at pos 0
        "ab-",                                     # trailing non-word at EOS
    ]
    for t in texts:
        assert [m for _s, m in ac.search(t)] == rx.findall(t), t


def test_aho_corasick_property_matches_regex():
    """Property pin: on random dictionaries and texts over a tiny alphabet
    (maximizing overlaps/prefix chains), AhoCorasick.search == the
    word-boundary alternation regex for every case hypothesis finds."""
    import re

    from hypothesis import given, settings, strategies as st

    from bfokg.operators.linking import AhoCorasick, surface_pattern

    # '-' and "'" in the WORD alphabet too: patterns with non-word chars at
    # their edges exercise the transition-based \b logic (ADVICE r2)
    word = st.text(alphabet="ab1-'", min_size=1, max_size=4)
    phrase = st.lists(word, min_size=1, max_size=3).map(" ".join)

    @settings(max_examples=200, deadline=None)
    @given(
        pats=st.lists(phrase, min_size=1, max_size=8, unique=True),
        text=st.text(alphabet="ab1 .x-'", min_size=0, max_size=40),
    )
    def check(pats, text):
        ac = AhoCorasick(pats)
        rx = re.compile(surface_pattern(pats))
        assert [m for _s, m in ac.search(text)] == rx.findall(text), (pats, text)

    check()


def test_salted_join_agrees_with_broadcast(spark):
    df = _transcripts(spark)
    mentions = extract_mentions(df).persist()
    a = link_mentions(mentions, alias_dict_df(spark))
    b = link_mentions(mentions, alias_dict_df(spark), salt_buckets=4)
    key = ["conv_id", "turn_idx", "mention", "mention_pos", "qid"]
    assert a.select(key).exceptAll(b.select(key)).count() == 0
    assert b.select(key).exceptAll(a.select(key)).count() == 0


def test_salted_join_on_skewed_hub_alias(spark):
    """Salted == broadcast on a genuinely SKEWED distribution (VERDICT r3
    item 7): one hub alias carries ~50% of mention rows. The timing
    matrix lives in tools/skew_bench.py → BENCH/SKEW.md; this pins
    correctness of the salt on the shape that motivates it."""
    from bfokg.datagen import skewed_mentions

    mentions, dim = skewed_mentions(spark, n_rows=20_000, n_aliases=500)
    mentions = mentions.withColumnRenamed("alias", "mention").persist()
    hub = mentions.where(F.col("mention") == "hub_alias").count()
    assert abs(hub / 20_000 - 0.5) < 0.01  # the hub really is ~50%
    a = link_mentions(mentions, dim)
    b = link_mentions(mentions, dim, salt_buckets=8)
    key = ["conv_id", "turn_idx", "mention", "mention_pos", "qid"]
    assert a.select(key).exceptAll(b.select(key)).count() == 0
    assert b.select(key).exceptAll(a.select(key)).count() == 0
    assert a.where(F.col("qid") == "Q_HUB").count() == hub
    mentions.unpersist()


def test_triples_extract_link_dedup(spark):
    df = _transcripts(spark)
    raw = extract_triples(df)
    assert raw.count() > 0
    preds = {r.pred for r in raw.select("pred").distinct().collect()}
    assert preds <= {"related_to", "located_in", "part_of", "studied_by", "influenced"}
    linked = link_triples(raw, alias_dict_df(spark))
    deduped = dedup_triples(linked)
    # dedup invariant: unique (subj, pred, obj)
    assert (
        deduped.groupBy("subj_qid", "pred", "obj_qid").count()
        .where(F.col("count") > 1).count() == 0
    )
    # keep-first invariant: each kept row is the min (ts, conv_id, turn_idx)
    first = linked.groupBy("subj_qid", "pred", "obj_qid").agg(
        F.min(F.struct("ts", "conv_id", "turn_idx")).alias("m")
    )
    joined = deduped.join(first, ["subj_qid", "pred", "obj_qid"])
    bad = joined.where(
        (F.col("ts") != F.col("m.ts"))
        | (F.col("conv_id") != F.col("m.conv_id"))
        | (F.col("turn_idx") != F.col("m.turn_idx"))
    ).count()
    assert bad == 0


def test_pipeline_end_to_end_and_resume(spark, tmp_path):
    df = _transcripts(spark)
    out = str(tmp_path / "kg")
    res1 = run_pipeline(spark, df, out)
    assert res1["skipped"] == []
    edges1 = {tuple(r) for r in res1["edges"].select("subj_qid", "pred", "obj_qid").collect()}
    assert len(edges1) > 0
    nodes = res1["nodes"]
    assert nodes.where(F.col("bfo_label").isNotNull()).count() > 0
    # lineage rows recorded per stage AND per partition (north_rule)
    assert res1["lineage"] is not None and res1["lineage"]["rows"] >= 3
    lin = spark.read.parquet(res1["lineage"]["data_dir"])
    per_part = lin.where(F.col("part") != "*")
    n_edge_parts = res1["edges"].select("part").distinct().count()
    assert per_part.where(F.col("stage") == "edges").count() == n_edge_parts
    # per-partition counts sum to the stage total
    tot = (
        per_part.where(F.col("stage") == "edges")
        .agg(F.sum("rows_out").alias("s"))
        .first()["s"]
    )
    assert tot == len(edges1)

    # resume: all stages skipped, identical edge set (idempotent re-run)
    res2 = run_pipeline(spark, df, out, resume=True)
    assert set(res2["skipped"]) == {"extract", "edges", "nodes"}
    edges2 = {tuple(r) for r in res2["edges"].select("subj_qid", "pred", "obj_qid").collect()}
    assert edges1 == edges2
    m = read_manifest(os.path.join(out, "edges"))
    assert m["partition_by"] == ["part"] and m["rows"] == len(edges1)


def test_curation_end_to_end_and_resume(spark, tmp_path):
    """Corpus-curation DAG (plans.curation): stats → LSH pairs →
    components keep-list → quality/dedup/split/sample corpus, each stage
    a committed snapshot with lineage; resume skips everything and the
    corpus (including split membership) is byte-identical."""
    import zlib

    from bfokg.plans.curation import run_curation

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "The quick brown fox jumps over the lazy dog!"),   # exact dup
        (3, "the quick brown fox jumps over the lazy cat"),    # near dup
        (4, "completely different text about spark engines and distributed joins"),
        (5, "der schnelle braune fuchs springt und das ist ein test von der sache"),
        (6, "le chat est dans la maison et les oiseaux sont pour le jardin"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "cur")
    res1 = run_curation(spark, docs, out, dup_threshold=0.35)
    assert res1["skipped"] == []
    corpus1 = {r.doc_id: (r.split, r.lang_pred) for r in res1["corpus"].collect()}
    # the {1,2,3} dup cluster collapsed to its min-id keeper
    assert set(corpus1) == {1, 4, 5, 6}
    assert corpus1[5][1] == "de" and corpus1[6][1] == "fr"
    # split membership is the crc32 replay, not partition-dependent RNG
    for doc_id, (split, _) in corpus1.items():
        b = zlib.crc32(f"split:42:{doc_id}".encode()) % 1_000_000
        assert split == ("train" if b < 980000 else
                         ("val" if b < 990000 else "test"))
    m = read_manifest(os.path.join(out, "corpus"))
    assert m["partition_by"] == ["split"]
    assert sum(m["partition_rows"].values()) == len(corpus1)
    # lineage: one row per stage + per-partition rows for stats/corpus
    assert res1["lineage"] is not None and res1["lineage"]["rows"] >= 4

    res2 = run_curation(spark, docs, out, resume=True, dup_threshold=0.35)
    assert set(res2["skipped"]) == {"stats", "pairs", "keep_list", "corpus"}
    corpus2 = {r.doc_id: (r.split, r.lang_pred) for r in res2["corpus"].collect()}
    assert corpus2 == corpus1


def test_resume_after_partial_failure(spark, tmp_path):
    """Crash-after-stage-1 simulation: extract's snapshot is committed but
    edges/nodes are not (their manifests deleted = crash before the commit
    rename). Resume must skip extract, recompute the rest, and converge to
    the same edge set."""
    import shutil

    df = _transcripts(spark)
    out = str(tmp_path / "kg")
    res1 = run_pipeline(spark, df, out)
    edges1 = {tuple(r) for r in res1["edges"].select("subj_qid", "pred", "obj_qid").collect()}

    for stage in ("edges", "nodes"):
        shutil.rmtree(os.path.join(out, stage))

    res2 = run_pipeline(spark, df, out, resume=True)
    assert res2["skipped"] == ["extract"]
    edges2 = {tuple(r) for r in res2["edges"].select("subj_qid", "pred", "obj_qid").collect()}
    assert edges1 == edges2


def test_lineage_costs_no_extra_jobs_and_pipeline_releases_caches(spark, tmp_path):
    """VERDICT r2 items 7+8: (a) write_table's row counts come from parquet
    footers — exactly ONE Spark job (the write) runs; (b) record_partitions
    reads the manifest — ZERO jobs; (c) run_pipeline leaves no persistent
    RDDs behind (operator caches are released after the consuming write)."""
    import time as _time

    from bfokg.datagen import generate_transcripts
    from bfokg.plans.pipeline import run_pipeline
    from bfokg.sources.warehouse import LineageLog, write_table

    sc = spark.sparkContext
    df = spark.createDataFrame(
        [(i, f"p{i % 3}") for i in range(100)], "id long, part string"
    )

    sc.setJobGroup("wt-probe", "write_table")
    manifest = write_table(df, str(tmp_path / "t"), partition_by=["part"])
    sc.setLocalProperty("spark.jobGroup.id", None)
    assert len(sc.statusTracker().getJobIdsForGroup("wt-probe")) == 1  # the write
    assert manifest["rows"] == 100
    assert sorted(manifest["partition_rows"]) == ["part=p0", "part=p1", "part=p2"]
    assert sum(manifest["partition_rows"].values()) == 100

    log = LineageLog(spark)
    sc.setJobGroup("rp-probe", "record_partitions")
    log.record_partitions("t", manifest, _time.time())
    sc.setLocalProperty("spark.jobGroup.id", None)
    assert sc.statusTracker().getJobIdsForGroup("rp-probe") == []
    parts = {r[2]: r[4] for r in log.rows}  # (run, stage, part, in, out, ...)
    assert parts == {"p0": 34, "p1": 33, "p2": 33}

    # (c) full pipeline run → no NEW persistent RDDs remain (the session
    # is shared across tests, so compare against a pre-run snapshot)
    tdir = generate_transcripts(0.001)
    transcripts = spark.read.parquet(tdir)
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    out = run_pipeline(spark, transcripts, str(tmp_path / "kg"))
    assert out["nodes"].count() > 0
    lineage_stages = {r[0] for r in spark.read.parquet(
        out["lineage"]["data_dir"]).select("stage", "part").collect()}
    assert {"extract", "edges", "nodes"} <= lineage_stages
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert after - before == set(), f"run_pipeline leaked cached RDDs: {after - before}"


def test_snapshot_history_time_travel(spark, tmp_path):
    """Iceberg snapshot-log parity: keep_snapshots=2 retains the prior
    snapshot for time-travel reads; the third commit expires the first,
    and reading an expired id raises (listing what IS retained) instead
    of returning wrong data."""
    import pytest

    from bfokg.sources.warehouse import read_table, write_table

    t = str(tmp_path / "tt")

    def df_of(vals):
        return spark.createDataFrame([(v,) for v in vals], "x int")

    m1 = write_table(df_of([1]), t, keep_snapshots=2)
    m2 = write_table(df_of([2, 2]), t, keep_snapshots=2)
    assert [h["snapshot_id"] for h in m2["history"]] == [m1["snapshot_id"]]
    assert read_table(spark, t).count() == 2                      # latest
    assert read_table(spark, t, snapshot=m2["snapshot_id"]).count() == 2
    old = read_table(spark, t, snapshot=m1["snapshot_id"])        # travel
    assert [r.x for r in old.collect()] == [1]

    m3 = write_table(df_of([3, 3, 3]), t, keep_snapshots=2)
    assert [h["snapshot_id"] for h in m3["history"]] == [m2["snapshot_id"]]
    assert read_table(spark, t, snapshot=m2["snapshot_id"]).count() == 2
    with pytest.raises(KeyError, match=m1["snapshot_id"][:6]):
        read_table(spark, t, snapshot=m1["snapshot_id"])          # expired
    assert not os.path.isdir(os.path.join(t, f"data-{m1['snapshot_id']}"))

    # default keep_snapshots=1 expires everything superseded on commit
    m4 = write_table(df_of([4]), t)
    assert m4["history"] == []
    assert not os.path.isdir(os.path.join(t, f"data-{m2['snapshot_id']}"))
    assert read_table(spark, t).count() == 1


def test_footer_counts_fail_loudly_off_local_fs(tmp_path):
    """VERDICT r3 item 1: lineage row counts must never be silently wrong.
    An unsupported/non-existent filesystem scheme and a missing local dir
    both RAISE (previously os.walk found zero files → committed rows=0);
    a dir holding only a _SUCCESS marker is a legitimate empty table."""
    import pytest

    from bfokg.sources.warehouse import _footer_counts

    with pytest.raises(Exception):  # pyarrow: unrecognized filesystem scheme
        _footer_counts("noscheme123://bucket/table/data-abc")

    with pytest.raises(FileNotFoundError):
        _footer_counts(str(tmp_path / "does-not-exist"))

    empty = tmp_path / "empty-table"
    empty.mkdir()
    (empty / "_SUCCESS").write_text("")
    assert _footer_counts(str(empty)) == (0, {})
