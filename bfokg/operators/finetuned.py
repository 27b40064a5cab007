"""Fine-tuned classifier slot (SURVEY.md §2.6 M4) — stub, disabled by default.

The reference ships a mock fine-tuned classifier (src/classifiers/
finetuned.py:48-91): random class sample with confidence 0.85 − 0.15·i,
disabled in config (configs/classification.yaml:55-57). We keep the slot
with the same contract and a SEEDED deterministic sample (the reference's
``random.sample`` is unseeded; a distributed engine cannot tolerate that),
excluded from the parity surface exactly like the reference excludes it.
A real fine-tuned model plugs in via the ``scorer`` argument.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from ..config import TOP_K_DEFAULT
from ..ontology import _BFO_TREE, OBO
from .schemas import MATCHES_SCHEMA


def classify_finetuned(
    entities: DataFrame,
    top_k: int = TOP_K_DEFAULT,
    seed: int = 42,
    id_col: str = "id",
    text_col: str = "text",
) -> DataFrame:
    """conf = 0.85 − 0.15·rank_index (finetuned.py:48-91), classes drawn by
    a per-entity seeded hash — deterministic across executors."""
    rows = sorted(((OBO + oid, label) for oid, label, *_ in _BFO_TREE))
    uris = np.array([r[0] for r in rows])
    labels = np.array([r[1] for r in rows])
    n_classes = len(uris)
    k = min(top_k, n_classes)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from zlib import crc32

        for pdf in batches:
            out = []
            for eid in pdf[id_col]:
                rng = np.random.RandomState(crc32(f"{seed}:{eid}".encode()) & 0x7FFFFFFF)
                pick = rng.choice(n_classes, size=k, replace=False)
                for i, j in enumerate(pick):
                    out.append(
                        (eid, uris[j], labels[j], max(0.85 - 0.15 * i, 0.0),
                         "finetuned", i + 1)
                    )
            yield pd.DataFrame(out, columns=[f.name for f in MATCHES_SCHEMA.fields])

    return entities.select(id_col, text_col).mapInPandas(kernel, MATCHES_SCHEMA)
