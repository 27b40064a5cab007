"""Vendored classification configuration.

Mirrors the reference's ``configs/classification.yaml`` (values verified in
SURVEY.md Appendix B; reference file: configs/classification.yaml:4-67).
Config values — not code defaults — are the parity target (SURVEY.md §7.3):
e.g. cascade semantic threshold is 0.55 (config) not 0.80 (hybrid.py:383-387
code default).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# cascade — configs/classification.yaml:4-11
CASCADE_ORDER = ["rule_based", "semantic", "zeroshot"]
CASCADE_THRESHOLDS = {"rule_based": 0.90, "semantic": 0.55, "zeroshot": 0.70}
CASCADE_DEFAULT_THRESHOLD = 0.70  # unknown classifier → 0.7 (hybrid.py:406)

# ensemble — configs/classification.yaml:13-19, hybrid.py:453-458
ENSEMBLE_WEIGHTS = {"rule_based": 0.15, "semantic": 0.50, "zeroshot": 0.35, "finetuned": 0.0}

# hybrid_confidence — configs/classification.yaml:21-26, hybrid.py:495-546
HYBRID_BASE_CLASSIFIERS = ["rule_based", "semantic"]
AGREEMENT_BOOST = 0.15
MIN_AGREEMENT = 2

# tiered — configs/classification.yaml:27-35, hybrid.py:548-568
MANY_ALIASES_MIN = 3        # ARCHITECTURE.md:188-191
SHORT_DESCRIPTION_MAX = 50  # README.md:540 (< 50 chars)

# classifier settings — configs/classification.yaml:38-57
SEMANTIC_MIN_SIMILARITY = 0.30      # raw cosine; below_threshold FLAG only (semantic.py:114)
RULE_CLAIM_CONFIDENCE = 0.95        # rule_based.py:106
RULE_SCORE_SCALE = 0.9              # conf = min(score*0.9, 0.95) (rule_based.py:160)
RULE_CONF_CAP = 0.95

# hierarchical — configs/classification.yaml:59-62, hybrid.py:150-315
HIER_MIN_CONFIDENCE = 0.50
HIER_CONFIDENCE_DROP = 0.15
HIER_SHALLOW_DROP = 0.50            # current_depth <= 1 → 0.50 (hybrid.py:257-260)
# The reference increments current_depth to 1 BEFORE the first decision
# (hybrid.py:197) and once more per descent (hybrid.py:291), so ONLY the
# root-level decision sees current_depth <= 1. Our walk state counts node
# depth from 0, so the shallow threshold applies at depth <= 0 exactly.
HIER_SHALLOW_DEPTH = 0
HIER_MAX_DEPTH = 7                  # tree depth 4-7 levels (README.md:389)

# globals — configs/classification.yaml:64-67
TOP_K_DEFAULT = 3
INFER_PARENT_CLASSES = True
PARENT_CONF_DECAY = 0.9             # flat ×0.9, NOT per-level (hybrid.py:595; code wins over docs)
MIN_CONFIDENCE_THRESHOLD = 0.30


# Model presets — vendored from reference configs/models.yaml:133-178 and
# the registry's preset loader (model_registry.py:149-166). Each preset
# selects the semantic encoder model (and its embedding dim, from the
# models.yaml model catalog), whether the zero-shot NLI stage exists at all
# (zeroshot: null disables it), the default combination strategy, and the
# reference's published latency expectation (informational).
MODEL_PRESETS = {
    "production": {
        "description": "Optimized for low latency in production",
        "semantic_model": "all-MiniLM-L6-v2",
        "encoder_dim": 384,
        "zeroshot_model": "typeform/distilbert-base-uncased-mnli",
        "finetuned_base": "distilbert-base-uncased",
        "strategy": "cascade",
        "expected_latency_ms": "50-180",
    },
    "research": {
        "description": "Highest accuracy, slower inference",
        "semantic_model": "all-mpnet-base-v2",
        "encoder_dim": 768,
        "zeroshot_model": "MoritzLaurer/DeBERTa-v3-base-mnli-fever-anli",
        "finetuned_base": "microsoft/deberta-v3-small",
        "strategy": "ensemble",
        "expected_latency_ms": "550",
    },
    "resource_constrained": {
        "description": "Minimal memory and compute requirements",
        "semantic_model": "all-MiniLM-L6-v2",
        "encoder_dim": 384,
        "zeroshot_model": None,  # skip zero-shot to save resources
        "finetuned_base": "distilbert-base-uncased",
        "strategy": "hybrid_confidence",
        "expected_latency_ms": "80",
    },
    "multilingual": {
        "description": "Support for 50+ languages",
        "semantic_model": "paraphrase-multilingual-MiniLM-L12-v2",
        "encoder_dim": 384,
        "zeroshot_model": "MoritzLaurer/mDeBERTa-v3-base-xnli-multilingual-nli-2mil7",
        "finetuned_base": "bert-base-multilingual-uncased",
        "strategy": "cascade",
        "expected_latency_ms": "200",
    },
    "ultra_lightweight": {
        "description": "Minimal models for extreme resource constraints",
        "semantic_model": "all-MiniLM-L6-v2",
        "encoder_dim": 384,
        "zeroshot_model": None,  # skip zero-shot
        "finetuned_base": "Prajjwal1/bert-tiny",
        "strategy": "hybrid_confidence",
        "expected_latency_ms": "30",
    },
}


# Model catalog — vendored from reference configs/models.yaml:4-66
# (the registry's list_available_models surface, model_registry.py). Only
# the fields the bake-off prints; benchmark numbers are the reference's.
MODEL_CATALOG = {
    "semantic": [
        {"name": "all-MiniLM-L6-v2", "description": "Fast, lightweight sentence transformer",
         "size": "80MB", "speed": "fast", "quality": "good", "dims": 384},
        {"name": "all-mpnet-base-v2", "description": "Highest quality sentence transformer",
         "size": "420MB", "speed": "medium", "quality": "best", "dims": 768},
        {"name": "all-distilroberta-v1", "description": "Balanced speed and quality",
         "size": "290MB", "speed": "fast", "quality": "good", "dims": 768},
        {"name": "paraphrase-multilingual-MiniLM-L12-v2",
         "description": "Multilingual support (50+ languages)",
         "size": "420MB", "speed": "medium", "quality": "good", "dims": 384},
    ],
    "zeroshot": [
        {"name": "facebook/bart-large-mnli",
         "description": "SOTA zero-shot classification, industry standard",
         "size": "1.6GB", "speed": "slow", "quality": "excellent", "dims": 1024},
        {"name": "MoritzLaurer/DeBERTa-v3-base-mnli-fever-anli",
         "description": "Best performance, trained on 3 NLI datasets",
         "size": "440MB", "speed": "medium", "quality": "excellent", "dims": 768},
        {"name": "typeform/distilbert-base-uncased-mnli",
         "description": "Fastest option, good for production",
         "size": "260MB", "speed": "fast", "quality": "good", "dims": 768},
    ],
}


def list_available_models(model_type: str) -> list[dict]:
    """The registry's catalog listing (reference model_registry.py /
    models.yaml:4-66). Unknown type → ValueError."""
    if model_type not in MODEL_CATALOG:
        raise ValueError(
            f"unknown model type: {model_type!r} (valid: {sorted(MODEL_CATALOG)})"
        )
    return [dict(m) for m in MODEL_CATALOG[model_type]]


@dataclass
class EngineConfig:
    """Driver-side run configuration (the reference's YAML dict, typed)."""

    top_k: int = TOP_K_DEFAULT
    infer_parent_classes: bool = INFER_PARENT_CLASSES
    cascade_order: list = field(default_factory=lambda: list(CASCADE_ORDER))
    cascade_thresholds: dict = field(default_factory=lambda: dict(CASCADE_THRESHOLDS))
    ensemble_weights: dict = field(default_factory=lambda: dict(ENSEMBLE_WEIGHTS))
    agreement_boost: float = AGREEMENT_BOOST
    min_agreement: int = MIN_AGREEMENT
    hier_min_confidence: float = HIER_MIN_CONFIDENCE
    hier_confidence_drop: float = HIER_CONFIDENCE_DROP
    encoder_dim: int = 384
    zeroshot_enabled: bool = False  # resource_constrained preset: no NLI (models.yaml:153-160)
    preset: str = "resource_constrained"  # sandbox default: no model downloads
    semantic_model: str = "all-MiniLM-L6-v2"
    zeroshot_model: str | None = None
    finetuned_base: str = "distilbert-base-uncased"
    strategy: str = "hybrid_confidence"
    expected_latency_ms: str = "80"

    @classmethod
    def from_preset(cls, name: str, **overrides) -> "EngineConfig":
        """Build a config from one of the reference's 5 model presets
        (configs/models.yaml:133-178). Unknown preset → ValueError with the
        valid names, mirroring the registry's KeyError surface
        (model_registry.py:149-166). CLI-style keyword overrides win over
        the preset (scripts/classify_entity.py:112-123)."""
        if name not in MODEL_PRESETS:
            raise ValueError(
                f"unknown preset: {name!r} (valid: {sorted(MODEL_PRESETS)})"
            )
        p = MODEL_PRESETS[name]
        kwargs = {
            "preset": name,
            "semantic_model": p["semantic_model"],
            "encoder_dim": p["encoder_dim"],
            "zeroshot_model": p["zeroshot_model"],
            "zeroshot_enabled": p["zeroshot_model"] is not None,
            "finetuned_base": p["finetuned_base"],
            "strategy": p["strategy"],
            "expected_latency_ms": p["expected_latency_ms"],
        }
        kwargs.update(overrides)
        return cls(**kwargs)
