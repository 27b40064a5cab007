"""Deterministic corpus sampling and splitting — pure column expressions.

No reference counterpart (the reference classifies a fixed 29-example
corpus; SURVEY.md §2.4's training-data family) — but a 100 TB curation
pipeline needs REPRODUCIBLE membership: Spark's ``df.sample`` /
``randomSplit`` derive per-row randomness from (seed, partition index),
so any repartition, coalesce, AQE re-plan, or corpus append silently
reassigns rows between splits. These operators key membership on a
seeded crc32 of the document id instead: a pure projection (no shuffle,
no RNG state), identical under any cluster layout, and stable under
corpus growth — a document's split never changes when other documents
are added. Exactly replayable in the DuckDB oracle via the same
recursive-CTE crc32 machinery the MinHash oracle uses
(``__spark_entry__._sql_crc32_ctes``).

All thresholds are INTEGER bucket bounds at the 10^-6 grain, so the SQL
replay compares the same integers — no float-comparison drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: bucket grain: membership decisions resolve fractions to 1e-6
BUCKETS = 1_000_000


def sample_bucket_col(id_col, seed: int = 42, domain: str = "sample") -> Column:
    """Deterministic bucket in [0, BUCKETS): crc32("<domain>:<seed>:" || id)
    % BUCKETS — JVM-side, codegen, no Python. ``domain`` separates
    independent decisions keyed on the same id (split assignment vs
    downsampling) so one never correlates with the other."""
    c = id_col if isinstance(id_col, Column) else F.col(id_col)
    key = F.concat(F.lit(f"{domain}:{seed}:"), c.cast("string"))
    return F.crc32(F.encode(key, "UTF-8")) % BUCKETS


def hash_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Label every row with a reproducible split ("train"/"val"/"test" by
    default, weights 0.98/0.01/0.01). ``weights`` is an ordered
    name→fraction mapping summing to 1 (±1e-9); labels are assigned by
    cumulative integer bucket thresholds over the id hash, so membership
    is a pure projection — no shuffle, order-independent, append-stable."""
    weights = dict(weights or {"train": 0.98, "val": 0.01, "test": 0.01})
    if not weights:
        raise ValueError("weights must be non-empty")
    for name, wgt in weights.items():
        # ADVICE r5: a negative/overweight entry previously slipped
        # through the sum check ({a: -0.5, b: 1.5}) and silently produced
        # an empty split from non-monotone cumulative bounds
        if not 0.0 <= wgt <= 1.0:
            raise ValueError(f"weight for {name!r} not in [0, 1]: {wgt}")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = sample_bucket_col(id_col, seed, "split")
    bounds: list[tuple[str, int]] = []
    cum = 0.0
    for name, wgt in weights.items():
        cum += wgt
        bounds.append((name, int(round(cum * BUCKETS))))
    bounds[-1] = (bounds[-1][0], BUCKETS)
    expr = None
    for name, ub in bounds[:-1]:
        cond = bucket < ub
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(bounds[-1][0]) if expr is None else expr.otherwise(bounds[-1][0])
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str,
    id_col: str = "doc_id",
    default_fraction: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows — capping a
    dominant language / source / template family during curation.
    ``fractions`` maps stratum value → keep fraction; strata not listed
    (including NULL) keep ``default_fraction``. A pure filter over the id
    hash: no shuffle, and independent of ``hash_split`` membership
    (different crc32 domain), so downsampling never skews a split."""
    for value, frac in {**fractions, "__default__": default_fraction}.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} not in [0, 1]: {frac}")
    # ADVICE r5: crc32(NULL) is NULL, so a NULL id made `bucket < thr`
    # NULL and silently DROPPED the row even at default_fraction=1.0 —
    # while hash_split routes the same row into its last split. Coalesce
    # the bucket to 0 so NULL-id rows deterministically follow their
    # stratum's keep decision (kept for any fraction > 0), consistent
    # with hash_split's keep-everything treatment. Non-NULL ids are
    # untouched.
    bucket = F.coalesce(sample_bucket_col(id_col, seed, "sample"), F.lit(0))
    sc = F.col(stratum_col) if isinstance(stratum_col, str) else stratum_col
    thr = F.lit(int(round(default_fraction * BUCKETS)))
    for value, frac in fractions.items():
        thr = F.when(sc == value, F.lit(int(round(frac * BUCKETS)))).otherwise(thr)
    return df.where(bucket < thr)
