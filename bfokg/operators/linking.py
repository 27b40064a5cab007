"""Mention detection + entity linking (north_rule axis).

- Mention detection runs as ONE Arrow-batched ``mapInPandas`` pass over
  turn text with a single compiled alternation regex (longest surface form
  first). No per-row Python outside the vectorized pandas str machinery.
- Linking is a BROADCAST hash join of exploded mentions against the alias
  dictionary (tiny dim); candidate scoring picks the max-prior QID with a
  deterministic (prior DESC, qid ASC) tiebreak.
- For skewed surface forms at scale (one alias appearing in a large share
  of turns), ``link_mentions(..., salt_buckets=N)`` switches to a salted
  repartition join: the mention side gets a random-but-deterministic salt
  (hash of conv_id/turn_idx), the dim side is exploded ×N, so one hot key
  spreads over N reducers (AQE skew-join also covers this when thresholds
  trip; the explicit salt is for the pathological head alias).

Reference counterpart: none — the reference fetches one entity at a time
from the Wikidata API (SURVEY.md §2.1 S1); the north_rule replaces that
with pre-materialized alias/claims dims and set-at-a-time joins.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..fixtures import _FIXTURES

MENTIONS_SCHEMA = (
    "conv_id string, turn_idx int, role string, ts timestamp, "
    "mention string, mention_pos int"
)


def alias_rows() -> list[tuple[str, str, str, float]]:
    """(alias_lower, qid, canonical_label, prior). Labels get prior 1.0,
    aliases 0.8 — so an ambiguous surface form ('catalyst' is both the
    label of Q_SYNTH_61 and an alias of Q_SYNTH_6) resolves to the label
    bearer deterministically."""
    rows = []
    for eid, label, _desc, aliases, _gt in _FIXTURES:
        rows.append((label.lower(), eid, label, 1.0))
        for a in aliases:
            rows.append((a.lower(), eid, label, 0.8))
    return rows


def alias_dict_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        alias_rows(), "alias STRING, qid STRING, label STRING, prior DOUBLE"
    )


def surface_alternation(surfaces: list[str] | None = None) -> str:
    """Bare alternation over all known surface forms, longest first so
    'Sahara Desert' wins over 'Sahara'."""
    if surfaces is None:
        surfaces = [r[0] for r in alias_rows()]
    ordered = sorted(set(surfaces), key=lambda s: (-len(s), s))
    return "|".join(re.escape(s) for s in ordered)


def surface_pattern(surfaces: list[str] | None = None) -> str:
    """Word-boundary-anchored single-group alternation (case-insensitive
    use)."""
    return r"\b(" + surface_alternation(surfaces) + r")\b"


def extract_mentions(
    transcripts: DataFrame,
    surfaces: list[str] | None = None,
    impl: str = "sql",
) -> DataFrame:
    """Text → exploded (mention, position) rows.

    ``impl="sql"`` (default): JVM ``regexp_extract_all`` + ``posexplode`` —
    codegen, no Python, the scale path for dictionary-based detection.
    ``impl="pandas"``: the Arrow-batched kernel (the plug-in shape for a
    model-based mention detector)."""
    pattern = surface_pattern(surfaces)
    if impl == "sql":
        return transcripts.select(
            "conv_id",
            "turn_idx",
            "role",
            "ts",
            F.posexplode(
                F.regexp_extract_all(F.lower("text"), F.lit(pattern), F.lit(1))
            ).alias("mention_pos", "mention"),
        ).select("conv_id", "turn_idx", "role", "ts", "mention", "mention_pos")

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rx = re.compile(pattern, re.IGNORECASE)
        for pdf in batches:
            if pdf.empty:
                continue
            hits = pdf["text"].fillna("").str.findall(rx)
            counts = hits.str.len().to_numpy()
            idx = pdf.index.repeat(counts)
            out = pdf.loc[idx, ["conv_id", "turn_idx", "role", "ts"]].reset_index(drop=True)
            out["mention"] = [m.lower() for row in hits for m in row]
            out["mention_pos"] = [p for c in counts for p in range(c)]
            yield out

    return transcripts.select("conv_id", "turn_idx", "role", "ts", "text").mapInPandas(
        scan, MENTIONS_SCHEMA
    )


def link_mentions(
    mentions: DataFrame,
    alias_dict: DataFrame,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Mentions × alias dict → best QID per mention occurrence.

    Default: broadcast hash join (dim is tiny). ``salt_buckets=N`` forces
    the salted repartition join used when the dim outgrows broadcast and a
    head alias skews a shuffle join.
    """
    m = mentions.withColumnRenamed("mention", "alias")
    if salt_buckets:
        m = m.withColumn(
            "salt", F.pmod(F.xxhash64("conv_id", "turn_idx", "mention_pos"), F.lit(salt_buckets))
        )
        dim = alias_dict.withColumn(
            "salt", F.explode(F.array([F.lit(i) for i in range(salt_buckets)]))
        )
        joined = m.repartition("alias", "salt").join(dim, ["alias", "salt"]).drop("salt")
    else:
        joined = m.join(F.broadcast(alias_dict), "alias")
    best = Window.partitionBy("conv_id", "turn_idx", "alias", "mention_pos").orderBy(
        F.desc("prior"), F.asc("qid")
    )
    return (
        joined.withColumn("cand_rank", F.row_number().over(best))
        .where(F.col("cand_rank") == 1)
        .drop("cand_rank")
        .withColumnRenamed("alias", "mention")
    )
