"""Model bake-off — the reference's compare_models harness, set-at-a-time.

Reference: ``scripts/compare_models.py:18-148`` — same entity across every
catalog model of one type (semantic | zeroshot), per-model timing and
top-k table. Here the per-model classify is the Spark kernel
(classify_semantic / classify_zeroshot) with the catalog-resolved encoder;
real SentenceTransformer weights slot in when the library is present, the
deterministic hashing fallback (at each model's embedding dim) keeps the
harness runnable offline.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame

from ..config import list_available_models
from ..functions.encoders import encoder_for_model


def compare_models(
    entities: DataFrame,
    model_type: str = "semantic",
    top_k: int = 3,
) -> list[dict]:
    """Run every catalog model of ``model_type`` over the same entities.

    Returns one dict per model: {name, info, elapsed_ms, matches} where
    matches is the collected rows (entity_id, class_label, confidence,
    rank) ordered by (entity_id, rank). Timing covers the full
    classify+collect per model (the reference times classifier.classify,
    compare_models.py:100-104)."""
    from ..operators.semantic import classify_semantic
    from ..operators.zeroshot import classify_zeroshot

    results = []
    for info in list_available_models(model_type):
        enc = encoder_for_model(info["name"], dim=info["dims"])
        t0 = time.time()
        if model_type == "semantic":
            out = classify_semantic(entities, encoder=enc, top_k=top_k)
        else:
            out = classify_zeroshot(entities, encoder=enc, top_k=top_k)
        rows = sorted(
            out.select("entity_id", "class_label", "confidence", "rank").collect(),
            key=lambda r: (r.entity_id, r.rank),
        )
        results.append(
            {
                "name": info["name"],
                "info": info,
                "resolved_from": getattr(enc, "resolved_from", enc.name),
                "elapsed_ms": (time.time() - t0) * 1000.0,
                "matches": rows,
            }
        )
    return results
