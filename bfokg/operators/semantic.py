"""Semantic (embedding-similarity) classifier as an Arrow-batched kernel.

Reference semantics (src/classifiers/semantic.py, SURVEY.md §2 M1/M2/T1/P7):
- one-time class-embedding index over all BFO classes'
  ``get_text_for_embedding()`` texts (semantic.py:44-65) — computed ONCE on
  the driver, captured into the UDF closure (~50 KB), never recomputed;
- per entity: encode text, cosine vs the class matrix, confidence =
  (cosine + 1) / 2 (semantic.py:67-83), ``below_threshold`` flag when
  raw_sim < min_similarity=0.30 — a FLAG only, never a filter
  (semantic.py:114, 126-138);
- top-k by confidence desc; numpy argsort ties are made deterministic with
  the explicit tiebreak (conf DESC, class_uri ASC) (SURVEY.md §2.5 T1).

Spark-first design: the whole score→rank→slice happens INSIDE one
``mapInPandas`` pass — per-entity top-k needs no shuffle at all because an
entity's 35 scores never leave the batch. The reference encodes one entity
at a time (ARCHITECTURE.md:284-286 flags batch-encoding as unimplemented);
here encoding is batched per Arrow batch — the single biggest speedup vs
the reference (encode is 83% of its latency, ARCHITECTURE.md:394-399).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..config import SEMANTIC_MIN_SIMILARITY, TOP_K_DEFAULT
from ..functions.encoders import VocabTfidfEncoder
from ..ontology import _BFO_TREE, OBO
from .schemas import SEMANTIC_MATCHES_SCHEMA


def class_texts() -> list[tuple[str, str, str]]:
    """(uri, label, get_text_for_embedding()) per class, uri ASC so the
    top-k tiebreak is positional."""
    rows = []
    for obo_id, label, _parent, definition, examples in _BFO_TREE:
        text = f"{label}: {definition}"
        if examples:
            text += " Examples: " + "; ".join(examples)
        rows.append((OBO + obo_id, label, text))
    rows.sort(key=lambda r: r[0])
    return rows


def default_class_encoder() -> VocabTfidfEncoder:
    """Collision-free TF-IDF encoder grounded in the class corpus —
    measured hit@3 = 29/29, hit@1 = 20/29 on the reference's 29 fixtures
    (vs the reference's published 91% hit@3 for SBERT semantic,
    ARCHITECTURE.md:84-92)."""
    return VocabTfidfEncoder([r[2] for r in class_texts()])


def class_index(
    encoder, subtree_smoothing: bool = False
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """M1 — the ontology embedding index. Returns (uris, labels, matrix).

    ``subtree_smoothing=True`` replaces each class vector with the
    L2-normalized SUM of its subtree's vectors (own + all descendants).
    An internal node then scores "similar to anything below me" — the
    level-wise discriminative signal the hierarchical walk needs, because
    an entity's text overlaps its LEAF class's concrete examples, not the
    abstract definition of 'Continuant'. SBERT gets this generalization
    from pretraining; the deterministic lexical encoder gets it from the
    subtree aggregate instead. Encoder-level choice only — the walk's stop
    rules and (cos+1)/2 math are untouched."""
    rows = class_texts()
    uris = np.array([r[0] for r in rows])
    labels = np.array([r[1] for r in rows])
    matrix = encoder.encode([r[2] for r in rows])  # rows are L2-normalized
    if subtree_smoothing:
        from ..ontology import closure_rows

        idx = {u: i for i, u in enumerate(uris)}
        agg = matrix.astype(np.float64).copy()
        for desc, anc, _dist in closure_rows():
            agg[idx[anc]] += matrix[idx[desc]]
        norms = np.linalg.norm(agg, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        matrix = (agg / norms).astype(matrix.dtype)
    return uris, labels, matrix


def classify_semantic(
    entities: DataFrame,
    encoder=None,
    top_k: int | None = TOP_K_DEFAULT,
    min_similarity: float = SEMANTIC_MIN_SIMILARITY,
    source: str = "semantic",
    id_col: str = "id",
    text_col: str = "text",
    subtree_smoothing: bool = False,
) -> DataFrame:
    """Score entities against all BFO classes; emit per-entity top-k rows.

    ``top_k=None`` emits all classes per entity (used by ensemble's
    top_k*2 pulls and by hierarchical traversal, which scores all classes
    then filters to the current node's children — hybrid.py:345-349).
    ``subtree_smoothing`` is the hierarchical walk's class-matrix mode
    (see class_index); flat classification keeps the per-class vectors.
    Output: SEMANTIC_MATCHES_SCHEMA.
    """
    enc = encoder or default_class_encoder()
    uris, labels, matrix = class_index(enc, subtree_smoothing)
    n_classes = len(uris)
    k = n_classes if top_k is None else min(top_k, n_classes)
    src = source
    min_sim = float(min_similarity)

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            vecs = enc.encode(pdf[text_col].fillna("").tolist())  # [n, dim], normed
            sims = vecs @ matrix.T  # cosine: both sides L2-normalized
            conf = (sims + 1.0) / 2.0  # P7
            # argsort by conf desc; positional index (== uri asc) breaks ties
            order = np.argsort(-conf, axis=1, kind="stable")[:, :k]
            n = len(pdf)
            row_idx = np.repeat(np.arange(n), k)
            col_idx = order.ravel()
            sims_f = sims[row_idx, col_idx].astype(np.float64)
            conf_f = conf[row_idx, col_idx].astype(np.float64)
            yield pd.DataFrame(
                {
                    "entity_id": pdf[id_col].to_numpy()[row_idx],
                    "class_uri": uris[col_idx],
                    "class_label": labels[col_idx],
                    "confidence": conf_f,
                    "source": src,
                    "rank": np.tile(np.arange(1, k + 1, dtype=np.int32), n),
                    "raw_sim": sims_f,
                    "below_threshold": sims_f < min_sim,
                }
            )

    return entities.select(id_col, text_col).mapInPandas(
        score_batches, SEMANTIC_MATCHES_SCHEMA
    )
