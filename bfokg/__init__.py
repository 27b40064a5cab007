"""bfokg — a from-scratch PySpark-native knowledge-graph construction engine.

Re-expresses the semantics of the reference classifier
(PR0CK0/BFO-Wikidata-Classifier, surveyed in /root/repo/SURVEY.md) as
declarative Spark DataFrame dataflow: batched mention detection and triple
extraction over conversation transcripts, broadcast-join entity linking,
BFO-class canonicalization via iterative self-join closure, windowed triple
dedup, and partitioned node/edge materialization with per-partition lineage.

Design stance (SURVEY.md §7.0): pure ``pyspark.sql`` + Arrow-vectorized
pandas UDFs; no per-row Python in any hot path; all randomness seeded;
no network and no model downloads — the semantic scoring kernel is a
pluggable ``Encoder`` with a deterministic numpy hashing encoder as default.
"""

__version__ = "0.1.0"
