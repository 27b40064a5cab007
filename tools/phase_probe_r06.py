"""Round-6 phase probes: split the heavy bench queries into phases and
time each with the noop sink (guide §1.4), labeling jobs (§1.5).

    env PYTHONPATH=/root/repo python tools/phase_probe_r06.py [probe ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _t(spark, name, fn, sink="count"):
    spark.sparkContext.setJobDescription(name)
    t0 = time.time()
    out = fn()
    if hasattr(out, "write") and sink == "noop":
        out.write.format("noop").mode("overwrite").save()
        n = None
    elif hasattr(out, "count"):
        n = out.count()
    else:
        n = out
    dt = round(time.time() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"phase": name, "sec": dt, "n": n}), flush=True)
    return out


def probe_cascade(spark):
    from bfokg.fixtures import entities_df
    from bfokg.functions.text import with_entity_text
    from bfokg.plans.pipeline import default_classifiers
    from bfokg.operators.strategies import cascade
    from pyspark.sql import functions as F

    ents = with_entity_text(entities_df(spark, include_micro=True))
    clf = default_classifiers(spark)
    _t(spark, "cascade/rule_based_alone", lambda: clf["rule_based"](ents, 3))
    _t(spark, "cascade/semantic_alone", lambda: clf["semantic"](ents, 3))
    t0 = time.time()
    matches, _tr = cascade(ents, clf, materialize="eager")
    print(json.dumps({"phase": "cascade/construct_eager",
                      "sec": round(time.time() - t0, 3)}), flush=True)
    _t(spark, "cascade/final_consume", lambda: matches.where(F.col("rank") == 1))


def probe_wikidata(spark):
    from bfokg.operators.wikidata import (canonicalize_qids, p279_closure,
                                          wd_anchors_df, wikidata_claims_df)

    claims = wikidata_claims_df(spark)
    t0 = time.time()
    closure = p279_closure(claims)
    print(json.dumps({"phase": "wd/closure_construct",
                      "sec": round(time.time() - t0, 3)}), flush=True)
    _t(spark, "wd/closure_count", lambda: closure)
    _t(spark, "wd/canon_full", lambda: canonicalize_qids(
        wikidata_claims_df(spark), wd_anchors_df(spark)))


def probe_minhash(spark):
    from pyspark.sql import functions as F

    from bfokg.operators.dedup import minhash_lsh_pairs, minhash_signatures

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text")
    _t(spark, "mh/signatures_noop",
       lambda: minhash_signatures(docs), sink="noop")
    _t(spark, "mh/full", lambda: minhash_lsh_pairs(docs, threshold=0.2))


def probe_components(spark):
    from bfokg.operators.dedup import dedup_components, minhash_lsh_pairs

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text")
    pairs = minhash_lsh_pairs(docs, threshold=0.2)
    _t(spark, "comp/pairs_only", lambda: pairs)
    # rebuild pairs (cold) then components end to end
    pairs2 = minhash_lsh_pairs(docs, threshold=0.2)
    _t(spark, "comp/full_from_pairs", lambda: dedup_components(pairs2))
    # pairs from scratch parquet (warm from prior run's scratch? no — new dir)


def probe_edges(spark):
    from bfokg.datagen import generate_transcripts, sf_from_dir
    from bfokg.operators.linking import alias_dict_df
    from bfokg.operators.triples import (dedup_triples, extract_triples,
                                         link_triples)

    sf = sf_from_dir(SF_DIR)
    generate_transcripts(sf)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "data", "transcripts", f"sf{sf:g}", "*.parquet")
    t = spark.read.parquet(path)
    _t(spark, "edges/extract_noop", lambda: extract_triples(t), sink="noop")
    _t(spark, "edges/extract_link_noop",
       lambda: link_triples(extract_triples(t), alias_dict_df(spark)), sink="noop")
    _t(spark, "edges/full",
       lambda: dedup_triples(link_triples(extract_triples(t), alias_dict_df(spark))))


def probe_ivf(spark):
    from pyspark.sql import functions as F

    from bfokg.operators.similarity_search import (ivf_build, ivf_centroids,
                                                   ivf_search)

    embs = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    t0 = time.time()
    cents = ivf_centroids(embs, n_centroids=8, sample=64)
    print(json.dumps({"phase": "ivf/centroids_collect",
                      "sec": round(time.time() - t0, 3)}), flush=True)
    cells = ivf_build(embs, cents)
    _t(spark, "ivf/build_noop", lambda: cells, sink="noop")
    queries = embs.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    _t(spark, "ivf/search", lambda: ivf_search(
        queries, ivf_build(embs, cents), cents, k=3, nprobe=2, round_to=4))


def probe_lshdups(spark):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    _t(spark, "lshdups/full", lambda: qs["embedding_lsh_dups"](spark, SF_DIR))


PROBES = {
    "cascade": probe_cascade,
    "wikidata": probe_wikidata,
    "minhash": probe_minhash,
    "components": probe_components,
    "edges": probe_edges,
    "ivf": probe_ivf,
    "lshdups": probe_lshdups,
}


def main():
    from bfokg.session import get_spark

    names = sys.argv[1:] or list(PROBES)
    spark = get_spark(app_name="phase-probe-r06", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    for n in names:
        PROBES[n](spark)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
