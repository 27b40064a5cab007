"""Pluggable text encoders for the semantic scoring kernel.

The reference encodes texts with SentenceTransformers (semantic.py:99-110).
Model downloads are unavailable in this sandbox (SURVEY.md §7.0), so the
kernel contract — encode → cosine → (sim+1)/2 → top-k — is kept identical
while the encoder itself is pluggable:

- ``HashingEncoder`` (default): deterministic numpy feature hashing over
  word unigrams/bigrams and char trigrams, crc32-indexed, TF-weighted,
  L2-normalized. Fully deterministic across processes/executors (no
  PYTHONHASHSEED dependence), zero model state, vectorizable per Arrow
  batch. This is what tests and benches run.
- ``SentenceTransformerEncoder``: the production adapter, loaded lazily
  once per executor (the reference's model-registry cache,
  model_registry.py:45-69, becomes an executor-local singleton). Gated
  behind an import-try.

Encoders are constructed on the driver and captured (they're tiny) into
``mapInPandas`` closures; heavy model state is created lazily inside the
executor process.
"""

from __future__ import annotations

from zlib import crc32

import numpy as np

_WORD_RE = None  # lazy-compiled


def _word_tokens(text: str) -> list[str]:
    global _WORD_RE
    if _WORD_RE is None:
        import re

        _WORD_RE = re.compile(r"[a-z0-9_\-]+")
    return _WORD_RE.findall(text.lower())


class HashingEncoder:
    """Deterministic bag-of-features hashing encoder (numpy only).

    Features: word unigrams, word bigrams, char trigrams (of the joined
    token stream). Each feature f maps to index crc32(f) % dim with sign
    (-1)^bit — the standard signed feature-hashing trick, which makes
    E[<x,y>] proportional to true feature overlap.
    """

    name = "hashing"

    def __init__(self, dim: int = 384):
        self.dim = dim

    def encode(self, texts) -> np.ndarray:
        dim = self.dim
        out = np.zeros((len(texts), dim), dtype=np.float32)
        for i, text in enumerate(texts):
            toks = _word_tokens(text or "")
            if not toks:
                continue
            feats = list(toks)
            feats.extend(f"{a}_{b}" for a, b in zip(toks, toks[1:]))
            joined = " ".join(toks)
            feats.extend(joined[j : j + 3] for j in range(len(joined) - 2))
            row = out[i]
            for f in feats:
                h = crc32(f.encode("utf-8"))
                idx = h % dim
                row[idx] += 1.0 if (h >> 31) & 1 == 0 else -1.0
            norm = np.linalg.norm(row)
            if norm > 0:
                row /= norm
        return out


class SentenceTransformerEncoder:
    """Production adapter — requires sentence-transformers at runtime.

    Mirrors the reference's default model choice (all-MiniLM-L6-v2, 384d,
    configs/models.yaml:4-14). The model is loaded once per process on
    first ``encode`` call (executor-local singleton)."""

    name = "sbert"

    def __init__(self, model_name: str = "all-MiniLM-L6-v2", dim: int = 384):
        self.model_name = model_name
        self.dim = dim
        self._model = None

    def encode(self, texts) -> np.ndarray:
        if self._model is None:
            from sentence_transformers import SentenceTransformer  # import-gated

            self._model = SentenceTransformer(self.model_name)
        vecs = self._model.encode(list(texts), convert_to_numpy=True)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return (vecs / norms).astype(np.float32)


def default_encoder(dim: int = 384) -> HashingEncoder:
    return HashingEncoder(dim=dim)
