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
HIER_SHALLOW_DROP = 0.50            # depth <= 1 → 0.50 (hybrid.py:257-260)
HIER_SHALLOW_DEPTH = 1
HIER_MAX_DEPTH = 7                  # tree depth 4-7 levels (README.md:389)

# globals — configs/classification.yaml:64-67
TOP_K_DEFAULT = 3
INFER_PARENT_CLASSES = True
PARENT_CONF_DECAY = 0.9             # flat ×0.9, NOT per-level (hybrid.py:595; code wins over docs)
MIN_CONFIDENCE_THRESHOLD = 0.30


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
