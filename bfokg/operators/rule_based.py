"""Rule-based classifier as declarative DataFrame dataflow.

Semantics from reference src/classifiers/rule_based.py (SURVEY.md §2 J1/J2,
P3/P4), re-expressed Spark-first:

- P31 claim rules (rule_based.py:29-37, 89-115): explode claims['P31'] →
  BROADCAST hash join against the p31_rules dim → join bfo_classes on label.
  Confidence fixed 0.95. If an entity has any claim match, its keyword path
  is suppressed (short-circuit, rule_based.py:128-131) — expressed as a
  left-anti join, so the whole "if claims: return" branch is set-at-a-time.
- Keyword scoring (rule_based.py:40-77, 133-165): instead of 93 regex
  evaluations per row, the text is tokenized ONCE into a distinct word-token
  array and intersected with each class's keyword array
  (``array_intersect``) — pure JVM, codegen-eligible, no Python, no regex.
  Word-boundary equivalence argued in functions/text.py.
  score = |unique matched keywords| / |class keyword list|;
  confidence = min(score * 0.9, 0.95)  (rule_based.py:142-144, 160).
  Ties in the score sort are broken by the reference's rule-dict insertion
  order (CPython sorted() is stable) — vendored as ``rule_order``.

Everything here shuffles only for the per-entity top-k window; at scale that
window is partitioned by entity_id, the natural key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..config import RULE_CLAIM_CONFIDENCE, RULE_CONF_CAP, RULE_SCORE_SCALE, TOP_K_DEFAULT
from ..functions.text import word_tokens_col

# rule_based.py:31-37 — the reference ships exactly one P31 rule.
P31_RULES = [("Q5", "MaterialEntity")]

# rule_based.py:40-70 verbatim; rule_order = dict insertion order.
KEYWORD_RULES = {
    "Process": [
        "process", "event", "activity", "action", "happening",
        "war", "revolution", "movement", "ceremony", "competition",
        "development", "growth", "change", "transformation",
    ],
    "MaterialEntity": [
        "object", "entity", "thing", "material", "substance",
        "person", "people", "organism", "creature", "being",
        "structure", "building", "device", "machine", "tool",
        "molecule", "cell", "particle", "body",
    ],
    "Quality": [
        "quality", "property", "characteristic", "attribute",
        "color", "colour", "shape", "size", "temperature",
        "mass", "weight", "density", "speed", "brightness",
    ],
    "Role": [
        "role", "function", "capacity", "position", "status",
        "occupation", "profession", "job", "responsibility",
        "purpose", "duty", "task",
    ],
    "SpatialRegion": [
        "location", "place", "region", "area", "zone",
        "space", "position", "site", "spot", "territory",
        "country", "city", "continent",
    ],
    "IndependentContinuant": [
        "independent", "standalone", "autonomous", "self-sufficient",
    ],
}


def p31_rules_df(spark: SparkSession) -> DataFrame:
    from ..util import local_df

    return local_df(
        spark,
        [(q, l, RULE_CLAIM_CONFIDENCE) for q, l in P31_RULES],
        "wikidata_qid STRING, bfo_label STRING, confidence DOUBLE",
    )


def keyword_rules_df(spark: SparkSession) -> DataFrame:
    from ..util import local_df

    rows = [
        (label, kws, len(kws), i)
        for i, (label, kws) in enumerate(KEYWORD_RULES.items())
    ]
    return local_df(
        spark, rows,
        "bfo_label STRING, keywords ARRAY<STRING>, n_keywords INT, rule_order INT"
    )


def keyword_scores(
    df: DataFrame,
    keyword_rules: DataFrame,
    bfo_classes: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(entity, class) keyword scores — P3/P4 without the top-k cut.

    Returns (entity_id, class_uri, class_label, score, confidence,
    rule_order). One broadcast nested-loop join of 6 rule rows per input
    row; token array computed once per row.
    """
    tokens = df.select(
        F.col(id_col).alias("entity_id"),
        word_tokens_col(text_col).alias("tokens"),
    )
    scored = (
        tokens.join(F.broadcast(keyword_rules))
        .withColumn("n_matched", F.size(F.array_intersect("tokens", "keywords")))
        .where(F.col("n_matched") > 0)
        .withColumn("score", F.col("n_matched") / F.col("n_keywords"))
        .withColumn(
            "confidence", F.least(F.col("score") * RULE_SCORE_SCALE, F.lit(RULE_CONF_CAP))
        )
    )
    return scored.join(
        F.broadcast(bfo_classes.select(F.col("label").alias("bfo_label"), "class_uri")),
        "bfo_label",
    ).select(
        "entity_id",
        "class_uri",
        F.col("bfo_label").alias("class_label"),
        "score",
        "confidence",
        "rule_order",
    )


def classify_rule_based(
    entities: DataFrame,
    bfo_classes: DataFrame,
    p31_rules: DataFrame,
    keyword_rules: DataFrame,
    top_k: int = TOP_K_DEFAULT,
) -> DataFrame:
    """Full rule-based classifier (J1 short-circuit + keyword fallback).

    ``entities`` needs columns (id, text, claims). Returns MATCHES_SCHEMA
    (+ no extras), at most top_k rows per entity.
    """
    # --- claim path (J1) ---------------------------------------------------
    claims = entities.select(
        F.col("id").alias("entity_id"),
        F.posexplode_outer(F.coalesce(F.col("claims")["P31"], F.array())).alias(
            "claim_pos", "value_qid"
        ),
    ).where(F.col("value_qid").isNotNull())
    claim_hits = (
        claims.join(
            F.broadcast(p31_rules),
            claims["value_qid"] == p31_rules["wikidata_qid"],
        )
        .join(
            F.broadcast(bfo_classes.select(F.col("label").alias("bfo_label"), "class_uri")),
            "bfo_label",
        )
        .select(
            "entity_id",
            "class_uri",
            F.col("bfo_label").alias("class_label"),
            F.col("confidence"),
            F.lit("rule_based").alias("source"),
            F.row_number()
            .over(Window.partitionBy("entity_id").orderBy("claim_pos", "wikidata_qid"))
            .alias("rank"),
        )
        .where(F.col("rank") <= top_k)
    )

    # --- keyword path, only for entities with NO claim hit (short-circuit) --
    no_claim = entities.join(
        claim_hits.select("entity_id").distinct(),
        entities["id"] == F.col("entity_id"),
        "left_anti",
    )
    kw = keyword_scores(no_claim, keyword_rules, bfo_classes)
    kw_hits = (
        kw.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("entity_id").orderBy(
                    F.desc("score"), F.asc("rule_order")
                )
            ),
        )
        .where(F.col("rank") <= top_k)
        .select(
            "entity_id",
            "class_uri",
            "class_label",
            "confidence",
            F.lit("rule_based").alias("source"),
            "rank",
        )
    )
    return claim_hits.unionByName(kw_hits)
