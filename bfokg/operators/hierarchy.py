"""Hierarchical top-down classification (SURVEY.md §2.7 C5).

Reference: src/classifiers/hybrid.py:150-315. Per entity: start at the BFO
root (BFO_0000001, confidence 1.0 — hybrid.py:176-186); each level, score
the current node's children with the SEMANTIC classifier (the ``strategy``
argument is explicitly ignored — hybrid.py:332, 338-342) and either descend
into the best child or stop with a reason:

- LEAF_NODE         current node has no children (hybrid.py:204-212)
- NO_CHILD_MATCH    no child received a score (hybrid.py:222-230)
- LOW_CONFIDENCE    best child conf < min_confidence 0.50 (hybrid.py:241-251)
- CONFIDENCE_DROP   cur_conf − child_conf > adaptive threshold
                    (depth ≤ 1 → 0.50, else 0.15 — hybrid.py:253-277)

Spark design: semantic scores for ALL classes are computed ONCE per entity
up front (mirroring the reference's top_k=50-then-filter at hybrid.py:345)
and persisted; the walk itself is a bounded driver loop (tree depth ≤ 7,
README.md:389) over a compact per-entity state DataFrame — each iteration is
one broadcast join against the 34-row children dim plus one join against the
persisted score table keyed by entity_id. State rows are tiny; the loop's
shuffle is bounded by |entities| per level and shrinks as rows finish.
This is the same iterative-join machinery as the P31/P279 closure
(ontology.build_closure), per the north_rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..config import (
    HIER_CONFIDENCE_DROP,
    HIER_MAX_DEPTH,
    HIER_MIN_CONFIDENCE,
    HIER_SHALLOW_DEPTH,
    HIER_SHALLOW_DROP,
)
from ..ontology import ROOT_URI
from .semantic import classify_semantic

PATH_STRUCT = "array<struct<class_uri:string,class_label:string,confidence:double,decision:string,depth:int>>"


def classify_hierarchical(
    entities: DataFrame,
    children_dim: DataFrame,
    encoder=None,
    min_confidence: float = HIER_MIN_CONFIDENCE,
    drop_threshold: float = HIER_CONFIDENCE_DROP,
    max_depth: int = HIER_MAX_DEPTH,
    source: str = "hierarchical_semantic",
) -> DataFrame:
    """Returns one row per entity:
    (entity_id, class_uri, class_label, confidence, source, rank=1,
    stop_reason, depth, path).
    """
    scores = (
        classify_semantic(entities, encoder=encoder, top_k=None)
        .select("entity_id", "class_uri", "class_label", "confidence")
        .persist()
    )

    state = entities.select(
        F.col("id").alias("entity_id"),
        F.lit(ROOT_URI).alias("cur_uri"),
        F.lit("Entity").alias("cur_label"),
        F.lit(1.0).alias("cur_conf"),
        F.lit(0).alias("depth"),
        F.array(
            F.struct(
                F.lit(ROOT_URI).alias("class_uri"),
                F.lit("Entity").alias("class_label"),
                F.lit(1.0).alias("confidence"),
                F.lit("START").alias("decision"),
                F.lit(0).alias("depth"),
            )
        ).cast(PATH_STRUCT).alias("path"),
        F.lit(None).cast("string").alias("stop_reason"),
    )

    done_parts: list[DataFrame] = []
    children_b = F.broadcast(children_dim)

    for _level in range(max_depth):
        # candidate = children of the current node, scored for this entity
        cand = (
            state.join(children_b, state["cur_uri"] == children_dim["parent_uri"], "left")
            .join(
                scores.select(
                    F.col("entity_id").alias("s_eid"),
                    F.col("class_uri").alias("s_uri"),
                    F.col("class_label").alias("s_label"),
                    F.col("confidence").alias("s_conf"),
                ),
                (F.col("entity_id") == F.col("s_eid"))
                & (F.col("child_uri") == F.col("s_uri")),
                "left",
            )
        )
        best_w = Window.partitionBy("entity_id").orderBy(
            F.desc_nulls_last("s_conf"), F.asc_nulls_last("s_uri")
        )
        best = (
            cand.withColumn("rn", F.row_number().over(best_w))
            .where(F.col("rn") == 1)
            .withColumn("has_children", F.col("child_uri").isNotNull())
            .withColumn("has_scored_child", F.col("s_conf").isNotNull())
        )
        adaptive_drop = F.when(
            F.col("depth") <= HIER_SHALLOW_DEPTH, F.lit(HIER_SHALLOW_DROP)
        ).otherwise(F.lit(drop_threshold))
        decided = best.withColumn(
            "stop_reason",
            F.when(~F.col("has_children"), "LEAF_NODE")
            .when(~F.col("has_scored_child"), "NO_CHILD_MATCH")
            .when(F.col("s_conf") < min_confidence, "LOW_CONFIDENCE")
            .when(F.col("cur_conf") - F.col("s_conf") > adaptive_drop, "CONFIDENCE_DROP")
            .otherwise(F.lit(None).cast("string")),
        )
        finished = decided.where(F.col("stop_reason").isNotNull()).select(
            "entity_id", "cur_uri", "cur_label", "cur_conf", "depth", "path", "stop_reason"
        )
        done_parts.append(finished)
        descending = decided.where(F.col("stop_reason").isNull())
        state = descending.select(
            "entity_id",
            F.col("s_uri").alias("cur_uri"),
            F.col("s_label").alias("cur_label"),
            F.col("s_conf").alias("cur_conf"),
            (F.col("depth") + 1).alias("depth"),
            F.concat(
                "path",
                F.array(
                    F.struct(
                        F.col("s_uri").alias("class_uri"),
                        F.col("s_label").alias("class_label"),
                        F.col("s_conf").alias("confidence"),
                        F.lit("DESCEND").alias("decision"),
                        (F.col("depth") + 1).alias("depth"),
                    )
                ),
            ).alias("path"),
            F.lit(None).cast("string").alias("stop_reason"),
        ).localCheckpoint(eager=False)
        # rows that reached max_depth fall out of the loop below

    # anything still descending at max_depth stops there (tree depth ≤ 7)
    done_parts.append(
        state.withColumn("stop_reason", F.lit("MAX_DEPTH")).select(
            "entity_id", "cur_uri", "cur_label", "cur_conf", "depth", "path", "stop_reason"
        )
    )

    out = done_parts[0]
    for p in done_parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "entity_id",
        F.col("cur_uri").alias("class_uri"),
        F.col("cur_label").alias("class_label"),
        F.col("cur_conf").alias("confidence"),
        F.lit(source).alias("source"),
        F.lit(1).alias("rank"),
        "stop_reason",
        "depth",
        "path",
    )
