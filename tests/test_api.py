"""Public API facade (reference README.md:323-353 mirror)."""

from pyspark.sql import functions as F

from bfokg.api import Classifier
from bfokg.fixtures import micro_entities_df


def test_classify_flat_with_parents(spark):
    clf = Classifier(spark)
    out = clf.classify(micro_entities_df(spark), strategy="cascade", top_k=3)
    sources = {r.source for r in out.select("source").distinct().collect()}
    assert "inferred" in sources  # flat mode appends parent matches
    q1 = out.where((F.col("entity_id") == "Q1") & (F.col("source") != "inferred"))
    top = q1.orderBy("rank").first()
    assert top.class_label == "MaterialEntity" and top.confidence == 0.95


def test_classify_hierarchical_ignores_strategy_for_scoring(spark):
    clf = Classifier(spark)
    out = clf.classify(micro_entities_df(spark), strategy="cascade", hierarchical=True)
    rows = out.collect()
    assert len(rows) == 2  # one row per entity
    assert all(r.source == "hierarchical_cascade" for r in rows)
    assert all(r.rank == 1 for r in rows)
