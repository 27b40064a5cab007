"""Model-preset registry (M5), SBERT adapter path (M3/M5), single-entity
CLI parity (reference scripts/classify_entity.py)."""

import os
import subprocess
import sys
import textwrap

import pytest

from bfokg.config import MODEL_PRESETS, EngineConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_preset_surface_mirrors_reference():
    """The 5 presets from reference configs/models.yaml:133-178."""
    assert set(MODEL_PRESETS) == {
        "production", "research", "resource_constrained",
        "multilingual", "ultra_lightweight",
    }
    prod = EngineConfig.from_preset("production")
    assert prod.zeroshot_enabled                      # NLI stage exists
    assert prod.zeroshot_model == "typeform/distilbert-base-uncased-mnli"
    assert prod.semantic_model == "all-MiniLM-L6-v2" and prod.encoder_dim == 384
    assert prod.strategy == "cascade"

    rc = EngineConfig.from_preset("resource_constrained")
    assert not rc.zeroshot_enabled                    # zeroshot: null
    assert rc.strategy == "hybrid_confidence"

    res = EngineConfig.from_preset("research")
    assert res.semantic_model == "all-mpnet-base-v2" and res.encoder_dim == 768
    assert res.strategy == "ensemble"

    ml = EngineConfig.from_preset("multilingual")
    assert ml.zeroshot_enabled
    assert ml.semantic_model == "paraphrase-multilingual-MiniLM-L12-v2"

    ul = EngineConfig.from_preset("ultra_lightweight")
    assert not ul.zeroshot_enabled
    assert ul.finetuned_base == "Prajjwal1/bert-tiny"

    with pytest.raises(ValueError, match="unknown preset"):
        EngineConfig.from_preset("nope")

    # CLI-style keyword overrides win over the preset
    o = EngineConfig.from_preset("production", top_k=5, zeroshot_enabled=False)
    assert o.top_k == 5 and not o.zeroshot_enabled and o.preset == "production"


def test_preset_gates_zeroshot_stage(spark):
    """production enables the zeroshot classifier; resource_constrained
    (zeroshot: null, reference models.yaml:157) disables it."""
    from bfokg.plans.pipeline import default_classifiers

    prod = default_classifiers(spark, EngineConfig.from_preset("production"))
    rc = default_classifiers(spark, EngineConfig.from_preset("resource_constrained"))
    assert "zeroshot" in prod
    assert "zeroshot" not in rc
    assert set(rc) == {"rule_based", "semantic"}


def test_classifier_api_accepts_preset(spark):
    from bfokg.api import Classifier

    clf = Classifier(spark, preset="ultra_lightweight")
    assert clf.config.preset == "ultra_lightweight"
    assert "zeroshot" not in clf.classifiers


def test_model_catalog_and_bakeoff(spark):
    """M5/bake-off parity (reference scripts/compare_models.py:18-148 +
    models.yaml:4-66): the catalog lists the reference's models, and
    compare_models runs every one over the same entity with timings."""
    from pyspark.sql import functions as F

    from bfokg.config import list_available_models
    from bfokg.fixtures import entities_df
    from bfokg.functions.text import with_entity_text
    from bfokg.plans.bakeoff import compare_models

    sem = list_available_models("semantic")
    assert [m["name"] for m in sem] == [
        "all-MiniLM-L6-v2", "all-mpnet-base-v2", "all-distilroberta-v1",
        "paraphrase-multilingual-MiniLM-L12-v2",
    ]
    assert [m["name"] for m in list_available_models("zeroshot")] == [
        "facebook/bart-large-mnli",
        "MoritzLaurer/DeBERTa-v3-base-mnli-fever-anli",
        "typeform/distilbert-base-uncased-mnli",
    ]
    with pytest.raises(ValueError, match="unknown model type"):
        list_available_models("finetuned")

    ent = with_entity_text(entities_df(spark)).where(F.col("id") == "Q_SYNTH_1")
    results = compare_models(ent, "semantic", top_k=3)
    assert [r["name"] for r in results] == [m["name"] for m in sem]
    for r in results:
        assert r["elapsed_ms"] > 0
        assert len(r["matches"]) == 3
        assert [m.rank for m in r["matches"]] == [1, 2, 3]
        assert "hashing fallback" in r["resolved_from"]  # no SBERT in sandbox


FAKE_SBERT = '''
"""Fake sentence_transformers: deterministic encoder + per-process marker."""
import os
from zlib import crc32

import numpy as np


class SentenceTransformer:
    def __init__(self, name):
        self.name = name
        marker_dir = os.environ.get("FAKE_SBERT_MARKER_DIR")
        if marker_dir:
            open(os.path.join(marker_dir, f"pid_{os.getpid()}"), "w").close()

    def encode(self, texts, convert_to_numpy=True):
        out = np.zeros((len(texts), 16), dtype=np.float32)
        for i, t in enumerate(texts):
            for w in (t or "").lower().split():
                h = crc32(w.encode())
                out[i, h % 16] += 1.0 if (h >> 31) & 1 == 0 else -1.0
        return out
'''

SBERT_DRIVER = '''
import os
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from bfokg.config import EngineConfig
from bfokg.plans.pipeline import _semantic_encoder

cfg = EngineConfig.from_preset("production")
enc = _semantic_encoder(cfg)
assert enc is not None and enc.name == "sbert", enc
assert enc.model_name == "all-MiniLM-L6-v2"

from bfokg.fixtures import entities_df
from bfokg.functions.text import with_entity_text
from bfokg.operators.semantic import classify_semantic

ents = with_entity_text(entities_df(spark)).repartition(2)
rows = classify_semantic(ents, encoder=enc, top_k=3).collect()
assert len(rows) == 29 * 3, len(rows)
assert len({r.entity_id for r in rows}) == 29
assert all(0.0 <= r.confidence <= 1.0 for r in rows)
# driver-side lazy init happened (class_index encoded the 35 class texts)
assert enc._model is not None
print("SBERT_ADAPTER_OK")
spark.stop()
'''


def test_sbert_adapter_end_to_end_with_fake_model(tmp_path):
    """VERDICT r1 item 5: drive the SentenceTransformerEncoder adapter's
    lazy-init / executor-singleton path end-to-end through
    classify_semantic with a fake model injected via PYTHONPATH — proving
    the production encoder slots in with zero dataflow changes. Runs in a
    subprocess so the fake module never leaks into this test session."""
    fake_dir = tmp_path / "fakemods"
    fake_dir.mkdir()
    (fake_dir / "sentence_transformers.py").write_text(FAKE_SBERT)
    marker_dir = tmp_path / "markers"
    marker_dir.mkdir()
    driver = tmp_path / "driver.py"
    driver.write_text(textwrap.dedent(SBERT_DRIVER))

    env = os.environ.copy()
    env["PYTHONPATH"] = f"{fake_dir}:{REPO}"
    env["FAKE_SBERT_MARKER_DIR"] = str(marker_dir)
    out = subprocess.run(
        [sys.executable, str(driver)], capture_output=True, text=True,
        env=env, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "SBERT_ADAPTER_OK" in out.stdout
    # the model was initialized in MORE than one process: once on the
    # driver (class index) and once per executor worker (__getstate__
    # drops _model, so workers re-init their own singleton)
    pids = {p for p in os.listdir(marker_dir) if p.startswith("pid_")}
    assert len(pids) >= 2, pids


def test_cli_golden_output(spark, tmp_path):
    """CLI parity golden test (VERDICT r1 item 6): the single-entity CLI's
    printed matches for Q_SYNTH_1 equal the matches DataFrame the engine
    produces, and the cascade trace is printed."""
    import json

    from bfokg.fixtures import entities_df
    from bfokg.functions.text import with_entity_text
    from bfokg.operators.strategies import cascade
    from bfokg.plans.pipeline import default_classifiers
    from pyspark.sql import functions as F

    ents = with_entity_text(entities_df(spark)).where(F.col("id") == "Q_SYNTH_1")
    matches, _ = cascade(ents, default_classifiers(spark), top_k=3)
    expected = sorted(matches.collect(), key=lambda r: r.rank)

    env = os.environ.copy()
    env["SPARK_GRAFT_CPUS"] = "2"
    out = subprocess.run(
        [sys.executable, "jobs/classify_entity.py", "Q_SYNTH_1",
         "--log", "--log-dir", str(tmp_path)],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "CLASSIFICATION RESULTS" in out.stdout
    assert "CASCADE DECISION TRACE" in out.stdout
    assert "Entity: Marie Curie (Q_SYNTH_1)" in out.stdout
    for i, r in enumerate(expected, 1):
        assert f"{i}. {r.class_label} (confidence: {r.confidence:.3f})" in out.stdout
        assert f"   URI: {r.class_uri}" in out.stdout

    logs = [p for p in os.listdir(tmp_path) if p.endswith(".json")]
    assert len(logs) == 1
    payload = json.load(open(os.path.join(tmp_path, logs[0])))
    assert payload["entity"]["id"] == "Q_SYNTH_1"
    assert [m["class_label"] for m in payload["matches"]] == [
        r.class_label for r in expected
    ]


def test_cli_sample_lookup_and_compare(spark):
    """--sample looks up by label; --compare prints all four strategies."""
    env = os.environ.copy()
    env["SPARK_GRAFT_CPUS"] = "2"
    out = subprocess.run(
        [sys.executable, "jobs/classify_entity.py", "Blue", "--sample", "--compare"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "COMPARISON RESULTS" in out.stdout
    for name in ["CASCADE", "ENSEMBLE", "HYBRID_CONFIDENCE", "TIERED"]:
        assert name in out.stdout


def test_cli_yaml_run_log(tmp_path):
    """--log-format yaml writes the reference's run-log layout AND filename
    scheme (classification_logger.py:50-112: YYYYMMDD_HHMMSS_EntityID.yaml
    with timestamp/entity/classification/system_config keys), so reference
    tooling that parses those files keeps working (SURVEY §2.1 S7)."""
    import re

    import yaml

    env = os.environ.copy()
    env["SPARK_GRAFT_CPUS"] = "2"
    out = subprocess.run(
        [sys.executable, "jobs/classify_entity.py", "Q_SYNTH_1",
         "--log", "--log-format", "yaml", "--log-dir", str(tmp_path)],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    logs = os.listdir(tmp_path)
    assert len(logs) == 1
    assert re.fullmatch(r"\d{8}_\d{6}_Q_SYNTH_1\.yaml", logs[0]), logs[0]
    d = yaml.safe_load(open(os.path.join(tmp_path, logs[0])))
    assert list(d)[:4] == ["timestamp", "entity", "classification", "system_config"]
    assert d["entity"]["id"] == "Q_SYNTH_1" and d["entity"]["text"]
    cls = d["classification"]
    assert cls["strategy"] == "cascade" and cls["processing_time_ms"] > 0
    assert all({"class_uri", "class_label", "confidence", "source",
                "metadata"} <= set(m) for m in cls["top_matches"])
    assert d["system_config"]["models"]["semantic"]
    assert [t["classifier"] for t in d["cascade_trace"]][0] == "rule_based"
    # trace entry keys + ORDER exactly as the reference emits them
    # (hybrid.py:409-415) — ref tools read entry['top_prediction']
    for t in d["cascade_trace"]:
        assert list(t) == ["classifier", "top_prediction", "confidence",
                           "threshold", "decision"], list(t)
        # VALUE parity too (ADVICE r4 #1): the reference's vocabulary is
        # ACCEPT (hybrid.py:414), not the operator-internal ACCEPTED, and
        # NO_RESULTS stages carry confidence 0.0, never null
        # (hybrid.py:432)
        assert t["decision"] in {"ACCEPT", "CONTINUE", "NO_RESULTS"}
        assert isinstance(t["confidence"], float)
