"""The reference's golden classification fixtures as Spark DataFrames.

29 labeled entities vendored verbatim from the reference's synthetic corpus
(src/utils/synthetic_data.py:16-167; tabulated in /root/repo/FIXTURES.md §4):
8 MaterialEntity, 7 Process, 6 Quality, 4 Role, 4 SpatialRegion.
Plus the two unit-test micro-fixtures from tests/test_basic.py:61-69.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from .ontology import uri_for_label

ENTITY_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("label", StringType(), False),
        StructField("description", StringType(), True),
        StructField("aliases", ArrayType(StringType()), True),
        StructField("claims", MapType(StringType(), ArrayType(StringType())), True),
    ]
)

FIXTURE_SCHEMA = StructType(
    ENTITY_SCHEMA.fields
    + [
        StructField("gt_bfo_label", StringType(), False),
        StructField("gt_bfo_uri", StringType(), False),
    ]
)

# (id, label, description, aliases, gt_label) — synthetic_data.py:16-167 verbatim
_FIXTURES = [
    ("Q_SYNTH_1", "Marie Curie", "Polish-French physicist and chemist (1867-1934)", ["Maria Skłodowska-Curie"], "MaterialEntity"),
    ("Q_SYNTH_2", "Albert Einstein", "German-born theoretical physicist (1879-1955)", ["Einstein"], "MaterialEntity"),
    ("Q_SYNTH_3", "DNA", "molecule that carries genetic information", ["deoxyribonucleic acid"], "MaterialEntity"),
    ("Q_SYNTH_4", "Human", "common name of Homo sapiens", ["person", "human being"], "MaterialEntity"),
    ("Q_SYNTH_5", "Protein", "biological molecule consisting of amino acid chains", ["proteins"], "MaterialEntity"),
    ("Q_SYNTH_6", "Enzyme", "biological molecule that catalyzes chemical reactions", ["catalyst", "biocatalyst"], "MaterialEntity"),
    ("Q_SYNTH_7", "Eiffel Tower", "iron lattice tower in Paris, France", ["La Tour Eiffel"], "MaterialEntity"),
    ("Q_SYNTH_8", "Computer", "programmable electronic device for data processing", ["computing machine"], "MaterialEntity"),
    ("Q_SYNTH_20", "World War II", "global war from 1939 to 1945", ["WW2", "WWII"], "Process"),
    ("Q_SYNTH_21", "French Revolution", "period of radical social and political change in France", ["Revolution"], "Process"),
    ("Q_SYNTH_22", "Cell Division", "process by which a cell divides into two daughter cells", ["mitosis", "cytokinesis"], "Process"),
    ("Q_SYNTH_23", "Photosynthesis", "process used by plants to convert light into energy", [], "Process"),
    ("Q_SYNTH_24", "Olympic Games", "international multi-sport event", ["Olympics"], "Process"),
    ("Q_SYNTH_25", "Industrial Revolution", "period of major industrialization and innovation", [], "Process"),
    ("Q_SYNTH_26", "Evolution", "change in heritable characteristics over generations", ["biological evolution"], "Process"),
    ("Q_SYNTH_40", "Blue", "color between violet and cyan on visible spectrum", ["blue color"], "Quality"),
    ("Q_SYNTH_41", "Temperature", "physical quantity expressing hot and cold", ["thermal energy"], "Quality"),
    ("Q_SYNTH_42", "Mass", "physical property of matter related to inertia", ["weight"], "Quality"),
    ("Q_SYNTH_43", "Color", "visual perception based on electromagnetic spectrum", ["colour"], "Quality"),
    ("Q_SYNTH_44", "Shape", "external form or outline of an object", ["geometry"], "Quality"),
    ("Q_SYNTH_45", "Density", "mass per unit volume", [], "Quality"),
    ("Q_SYNTH_60", "Teacher", "person who helps others to acquire knowledge", ["educator", "instructor"], "Role"),
    ("Q_SYNTH_61", "Catalyst", "substance that increases rate of chemical reaction", ["catalytic agent"], "Role"),
    ("Q_SYNTH_62", "President", "leader of a country or organization", ["chief executive"], "Role"),
    ("Q_SYNTH_63", "Function", "activity or purpose natural to a thing", ["role", "purpose"], "Role"),
    ("Q_SYNTH_80", "Europe", "continent located in Northern Hemisphere", [], "SpatialRegion"),
    ("Q_SYNTH_81", "Pacific Ocean", "largest ocean on Earth", [], "SpatialRegion"),
    ("Q_SYNTH_82", "Sahara", "hot desert in Africa", ["Sahara Desert"], "SpatialRegion"),
    ("Q_SYNTH_83", "North Pole", "northernmost point on Earth", [], "SpatialRegion"),
]

# tests/test_basic.py:61-69 micro-fixtures, with P31 claims exercising J1:
# Q1 carries P31=Q5 (human → MaterialEntity, rule_based.py:31-33).
_MICRO = [
    ("Q1", "Person", "A human being", [], {"P31": ["Q5"]}),
    ("Q2", "War", "Armed conflict or event", [], {}),
]


def fixture_rows():
    """Plain-Python rows (id, label, description, aliases, claims, gt_label, gt_uri)."""
    return [
        (eid, label, desc, aliases, {}, gt, uri_for_label(gt))
        for eid, label, desc, aliases, gt in _FIXTURES
    ]


def fixtures_df(spark: SparkSession) -> DataFrame:
    from .util import local_df

    return local_df(spark, fixture_rows(), FIXTURE_SCHEMA)


def entities_df(spark: SparkSession, include_micro: bool = False) -> DataFrame:
    from .util import local_df

    rows = [(eid, label, desc, aliases, {}) for eid, label, desc, aliases, _ in _FIXTURES]
    if include_micro:
        rows += _MICRO
    return local_df(spark, rows, ENTITY_SCHEMA)


def micro_entities_df(spark: SparkSession) -> DataFrame:
    from .util import local_df

    return local_df(spark, _MICRO, ENTITY_SCHEMA)


def sample_entity(df: DataFrame, seed: int = 42) -> DataFrame:
    """S2 — the reference's fetch_random_entity() as a seeded sample
    (driver-side convenience; ORDER BY rand(seed) LIMIT 1)."""
    from pyspark.sql import functions as F

    return df.orderBy(F.rand(seed)).limit(1)


def save_fixtures_json(path: str) -> None:
    """S6 — JSON corpus persistence, format mirroring the reference
    (synthetic_data.py:170-210): [{"entity": {...}, "ground_truth_uri"}]."""
    import json

    payload = [
        {
            "entity": {
                "id": eid,
                "label": label,
                "description": desc,
                "aliases": list(aliases),
                "claims": {},
            },
            "ground_truth_uri": uri_for_label(gt),
        }
        for eid, label, desc, aliases, gt in _FIXTURES
    ]
    with open(path, "w") as f:
        json.dump(payload, f, ensure_ascii=False, indent=1)


def load_fixtures_json(spark: SparkSession, path: str) -> DataFrame:
    """S6 — load the JSON corpus back into the fixtures schema."""
    import json

    from .ontology import _LABEL_TO_URI

    uri_to_label = {v: k for k, v in _LABEL_TO_URI.items()}
    with open(path) as f:
        payload = json.load(f)
    rows = [
        (
            r["entity"]["id"],
            r["entity"]["label"],
            r["entity"]["description"],
            r["entity"]["aliases"],
            r["entity"].get("claims", {}),
            uri_to_label[r["ground_truth_uri"]],
            r["ground_truth_uri"],
        )
        for r in payload
    ]
    return spark.createDataFrame(rows, FIXTURE_SCHEMA)
