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


def test_nearest_anchor_wins(spark):
    """wd:color is 2 hops from wd:property; distance recorded, conf 0.95."""
    canon = {r.qid: r for r in canonicalize_qids(
        wikidata_claims_df(spark), wd_anchors_df(spark)).collect()}
    assert canon["Q_SYNTH_40"].via_class == "wd:property"
    assert canon["Q_SYNTH_40"].distance == 2
    assert canon["Q_SYNTH_25"].distance == 0   # P31 directly at the anchor
    assert canon["Q_SYNTH_25"].confidence == 0.95
