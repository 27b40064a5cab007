"""P31/P279 superclass-chain canonicalization (north_rule core)."""

from pyspark.sql import functions as F

from bfokg.fixtures import fixtures_df
from bfokg.operators.wikidata import (
    canonicalize_qids,
    p279_closure,
    wd_anchors_df,
    wikidata_claims_df,
)


def test_p279_closure_walks_chains(spark):
    closure = p279_closure(wikidata_claims_df(spark))
    d = {
        (r.descendant_uri, r.ancestor_uri): r.distance
        for r in closure.collect()
    }
    assert d[("wd:human", "wd:organism")] == 3   # human→mammal→animal→organism
    assert d[("wd:human", "wd:human")] == 0      # self at distance 0
    assert ("wd:organism", "wd:human") not in d  # directed, upward only


def test_canonicalization_matches_fixture_ground_truth(spark):
    """Every fixture entity canonicalizes (via its synthetic P31/P279
    chain) to exactly its golden BFO label — the claim-path equivalent of
    the north_rule P/R ≥ 0.95 target (here 29/29 by construction)."""
    canon = canonicalize_qids(wikidata_claims_df(spark), wd_anchors_df(spark))
    joined = canon.join(
        fixtures_df(spark).select(F.col("id").alias("qid"), "gt_bfo_label"), "qid"
    )
    assert joined.count() == 29
    mismatches = joined.where(F.col("bfo_label") != F.col("gt_bfo_label")).collect()
    assert mismatches == []
    one_per_qid = canon.groupBy("qid").count().where(F.col("count") > 1).count()
    assert one_per_qid == 0


def test_canonicalize_driver_route_matches_dataflow(spark):
    """Round-6 driver fold: LocalRelation dims canonicalize in Python
    (LocalRelation result, zero Spark jobs in the consumer), and the
    result is row-identical to the dataflow path forced via RDD-backed
    copies of the same dims (createDataFrame defeats the LocalRelation
    detection, so the broadcast-join + winner-window plan runs)."""
    local = canonicalize_qids(wikidata_claims_df(spark), wd_anchors_df(spark))
    assert "LocalTableScan" in local._jdf.queryExecution().executedPlan().toString()

    claims_rdd = spark.createDataFrame(
        wikidata_claims_df(spark).collect(),
        "qid string, property string, value_qid string",
    )
    anchors_rdd = spark.createDataFrame(
        wd_anchors_df(spark).collect(),
        "wd_class string, bfo_label string, class_uri string",
    )
    dataflow = canonicalize_qids(claims_rdd, anchors_rdd)
    as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert as_set(local) == as_set(dataflow) and local.count() == 29


def test_nearest_anchor_wins(spark):
    """wd:color is 2 hops from wd:property; distance recorded, conf 0.95."""
    canon = {r.qid: r for r in canonicalize_qids(
        wikidata_claims_df(spark), wd_anchors_df(spark)).collect()}
    assert canon["Q_SYNTH_40"].via_class == "wd:property"
    assert canon["Q_SYNTH_40"].distance == 2
    assert canon["Q_SYNTH_25"].distance == 0   # P31 directly at the anchor
    assert canon["Q_SYNTH_25"].confidence == 0.95


def test_synthetic_p279_closure_exact(spark):
    """On the pure-tree variant (hub_pct=0) the iterative self-join closure
    must equal the analytically known ancestor chains {i//8, i//64, ...};
    the skewed variant only ADDS pairs and never exceeds the depth cap."""
    from bfokg.ontology import build_closure
    from bfokg.operators.wikidata import synthetic_p279_graph

    n, fanout = 3000, 8
    tree = synthetic_p279_graph(spark, n_nodes=n, fanout=fanout, hub_pct=0)
    got = {
        (r.descendant_uri, r.ancestor_uri, r.distance)
        for r in build_closure(tree, "child", "parent").collect()
    }
    expected = set()
    for i in range(1, n + 1):  # inclusive bound: Q1..Qn are all children
        a, d = i, 0
        while a > 0:
            a //= fanout
            d += 1
            expected.add((f"Q{i}", f"Q{a}", d))
            if a == 0:
                break
    assert got == expected

    skewed = synthetic_p279_graph(spark, n_nodes=n, fanout=fanout, hub_pct=20)
    sk = build_closure(skewed, "child", "parent")
    assert sk.count() >= len(expected)
    assert sk.agg({"distance": "max"}).first()[0] <= 12
    # skew is real: some hub ancestor has large fan-in
    top = (
        sk.groupBy("ancestor_uri").count().orderBy("count", ascending=False).first()
    )
    assert top["count"] >= n - 1  # Q0 is everyone's ancestor


def test_closure_matches_python_bfs_on_random_dags(spark):
    """build_closure == a driver-side BFS reference on seeded random DAGs
    (edges i→j only when j < i, so acyclic by construction). Checks pair
    set AND min-distance."""
    import random

    from bfokg.ontology import build_closure

    for seed in (7, 21, 99):
        rng = random.Random(seed)
        n = 40
        edges = sorted(
            {
                (f"N{i}", f"N{rng.randrange(i)}")
                for i in range(1, n)
                for _ in range(rng.randrange(3))
            }
        )
        if not edges:
            continue
        parents: dict[str, list[str]] = {}
        for c, p in edges:
            parents.setdefault(c, []).append(p)
        expected = {}
        for start in {c for c, _ in edges}:
            frontier, dist = [start], 0
            seen = {start}
            while frontier:
                dist += 1
                nxt = []
                for u in frontier:
                    for p in parents.get(u, []):
                        if (start, p) not in expected:
                            expected[(start, p)] = dist
                        if p not in seen:
                            seen.add(p)
                            nxt.append(p)
                frontier = nxt
        got = {
            (r.descendant_uri, r.ancestor_uri): r.distance
            for r in build_closure(
                spark.createDataFrame(edges, "child string, parent string"),
                "child", "parent",
            ).collect()
        }
        assert got == expected, f"seed={seed}"


def test_driver_closure_matches_loop(spark):
    """Round-6 size routing: build_closure(impl="auto") computes broadcast-
    small edge sets driver-side as a LocalRelation; the result must be
    pair-and-distance identical to the forced distributed loop — on the
    fixture claims graph and on a seeded random DAG (driven through a
    LocalRelation so auto actually takes the driver route)."""
    import random

    from bfokg.ontology import build_closure
    from bfokg.util import local_df

    rng = random.Random(13)
    rand_edges = sorted(
        {(f"N{i}", f"N{rng.randrange(i)}") for i in range(1, 40)
         for _ in range(rng.randrange(3))}
    )
    p279 = wikidata_claims_df(spark).where(F.col("property") == "P279").select(
        F.col("qid").alias("child"), F.col("value_qid").alias("parent")
    )
    cases = [
        p279,
        local_df(spark, rand_edges, "child string, parent string"),
    ]
    for edges in cases:
        auto = {
            (r.descendant_uri, r.ancestor_uri): r.distance
            for r in build_closure(edges, "child", "parent").collect()
        }
        loop = {
            (r.descendant_uri, r.ancestor_uri): r.distance
            for r in build_closure(edges, "child", "parent", impl="loop").collect()
        }
        assert auto == loop and auto
    # routing: the tiny LocalRelation edge set must have taken the driver
    # path (plan is a LocalTableScan / local-relation scan, no joins)
    plan = build_closure(cases[1], "child", "parent")._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "Join" not in plan
