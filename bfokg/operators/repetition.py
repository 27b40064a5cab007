"""Top-n-gram repetition statistics — the aggregate half of the
Gopher-style repetition filters (Rae et al. 2021 §A1.1; the projection
half, duplicate-line fraction, lives in ``functions.textstats``).

No reference counterpart (the reference classifies a fixed 29-example
corpus); this is part of the training-data quality family SURVEY.md §2
mandates around the corpus operators.

Scale shape: explode(doc → n-grams) multiplies rows by ~tokens-per-doc
(linear in corpus bytes), then two hash aggregates — (doc_id, gram) and
doc_id — both of which partial-aggregate map-side, so the shuffle carries
one row per DISTINCT (doc, gram), not per occurrence. No window, no
all-pairs, no Python. This is deliberately NOT a per-row array
expression: computing the mode of a doc's n-gram list inside a column
expression is O(distinct·total) per row — quadratic for long documents —
while the explode/agg form stays linear and spreads a single huge
document across tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.textstats import word_ngrams_col


def top_ngram_stats(
    docs: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document ``(id_col, n_ngrams, top_ngram_frac)``: the total
    n-gram count and the fraction claimed by the single most frequent
    n-gram. Docs with fewer than ``n`` tokens emit no row — join back
    with a left join and ``coalesce(top_ngram_frac, 0.0)``.

    High ``top_ngram_frac`` flags template/spam repetition that the
    duplicate-line signal misses when the repetition is intra-line."""
    grams = docs.select(
        F.col(id_col), F.explode(word_ngrams_col(text_col, n)).alias("gram")
    )
    counts = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    return counts.groupBy(id_col).agg(
        F.sum("c").alias("n_ngrams"),
        (F.max("c") / F.sum("c")).alias("top_ngram_frac"),
    )
