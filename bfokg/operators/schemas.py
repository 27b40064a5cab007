"""Shared output schemas (FIXTURES.md §5)."""

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# Core match row — reference ClassificationMatch (hybrid.py:302-312 et al.)
MATCHES_FIELDS = [
    StructField("entity_id", StringType(), False),
    StructField("class_uri", StringType(), False),
    StructField("class_label", StringType(), False),
    StructField("confidence", DoubleType(), False),
    StructField("source", StringType(), False),
    StructField("rank", IntegerType(), False),
]
MATCHES_SCHEMA = StructType(MATCHES_FIELDS)

# semantic classifier adds similarity diagnostics (semantic.py:126-138)
SEMANTIC_MATCHES_SCHEMA = StructType(
    MATCHES_FIELDS
    + [
        StructField("raw_sim", DoubleType(), False),
        StructField("below_threshold", BooleanType(), False),
    ]
)
