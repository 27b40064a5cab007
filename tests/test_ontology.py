"""Mirrors reference tests/test_basic.py:23-36 (test_ontology_loading)."""

from pyspark.sql import functions as F

from bfokg.ontology import (
    OBO,
    ROOT_URI,
    bfo_classes_df,
    bfo_closure_df,
    resolve_uri,
    uri_for_label,
)


def test_class_count_positive(spark):
    classes = bfo_classes_df(spark)
    assert classes.count() > 0  # reference asserts only > 0 (test_basic.py:27)


def test_get_class_by_curie(spark):
    # reference: ontology.get_class("bfo:MaterialEntity") (test_basic.py:28)
    uri = resolve_uri("bfo:MaterialEntity")
    assert uri == OBO + "BFO_0000040"
    row = bfo_classes_df(spark).where(F.col("class_uri") == uri).first()
    assert row.label == "MaterialEntity"
    assert row.parent_uri == uri_for_label("IndependentContinuant")


def test_material_entity_ancestors(spark):
    # reference asserts MaterialEntity's ancestors contain
    # IndependentContinuant and Continuant (test_basic.py:32-35)
    closure = bfo_closure_df(spark)
    anc = {
        r.ancestor_uri
        for r in closure.where(
            F.col("descendant_uri") == uri_for_label("MaterialEntity")
        ).collect()
    }
    assert uri_for_label("IndependentContinuant") in anc
    assert uri_for_label("Continuant") in anc
    assert ROOT_URI in anc
    assert uri_for_label("MaterialEntity") not in anc  # strict ancestors


def test_closure_distances(spark):
    closure = bfo_closure_df(spark)
    d = {
        r.ancestor_uri: r.distance
        for r in closure.where(
            F.col("descendant_uri") == uri_for_label("Object")
        ).collect()
    }
    assert d[uri_for_label("MaterialEntity")] == 1
    assert d[uri_for_label("IndependentContinuant")] == 2
    assert d[uri_for_label("Continuant")] == 3
    assert d[ROOT_URI] == 4


def test_build_closure_matches_static(spark):
    """The distributed iterative-self-join closure builder (used for the
    Wikidata P279 graph) agrees with the static driver-side closure."""
    from bfokg.ontology import build_closure

    classes = bfo_classes_df(spark)
    edges = classes.where(F.col("parent_uri").isNotNull()).select(
        F.col("class_uri").alias("child"), F.col("parent_uri").alias("parent")
    )
    built = {
        (r.descendant_uri, r.ancestor_uri, r.distance)
        for r in build_closure(edges).collect()
    }
    static = {
        (r.descendant_uri, r.ancestor_uri, r.distance)
        for r in bfo_closure_df(spark).collect()
    }
    assert built == static


def test_depth_and_leaves(spark):
    classes = bfo_classes_df(spark)
    root = classes.where(F.col("class_uri") == ROOT_URI).first()
    assert root.depth == 0 and root.parent_uri is None and not root.is_leaf
    obj = classes.where(F.col("label") == "Object").first()
    assert obj.is_leaf and obj.depth == 4
