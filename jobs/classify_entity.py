"""Single-entity classification CLI — the reference's front door.

Mirrors ``scripts/classify_entity.py`` (arg surface: :50-83; output layout:
:230-323) on top of the Spark engine: the entity is looked up in the
vendored sample fixtures (the reference's ``--sample`` path /
``create_sample_entities()``; live Wikidata fetch is out of scope in this
sandbox, SURVEY.md §2.1 S1) and classified as a 1-row DataFrame through the
same set-at-a-time operators the batch pipeline uses.

Notes on fidelity: the reference's ``ClassificationResult.format_output``
lives in ``src/models/results.py``, which is absent from the vendored
reference checkout — the numbered-match layout here follows the DETAILED
MATCHES / CASCADE DECISION TRACE / HIERARCHICAL PATH printers that ARE
present (classify_entity.py:238-323).

Usage:
    python jobs/classify_entity.py Q_SYNTH_1
    python jobs/classify_entity.py "Marie Curie" --sample
    python jobs/classify_entity.py Q_SYNTH_20 --strategy ensemble --top-k 5
    python jobs/classify_entity.py Q_SYNTH_1 --hierarchical
    python jobs/classify_entity.py Q_SYNTH_1 --compare
    python jobs/classify_entity.py Q_SYNTH_1 --preset production --log
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

STRATEGIES = ["cascade", "ensemble", "hybrid_confidence", "tiered"]
PRESETS = ["production", "research", "resource_constrained", "multilingual",
           "ultra_lightweight"]


def build_parser() -> argparse.ArgumentParser:
    # arg surface: reference scripts/classify_entity.py:50-83
    p = argparse.ArgumentParser(
        description="Classify a fixture entity to BFO classes")
    p.add_argument("entity",
                   help="fixture id (e.g. Q_SYNTH_1) or entity label if --sample")
    p.add_argument("--strategy", default="cascade", choices=STRATEGIES,
                   help="hybrid strategy to use (default: cascade)")
    p.add_argument("--sample", action="store_true",
                   help="look the entity up by LABEL among the sample fixtures")
    p.add_argument("--top-k", type=int, default=3,
                   help="number of results to return (default: 3)")
    p.add_argument("--compare", action="store_true",
                   help="compare all strategies")
    p.add_argument("--preset", default="resource_constrained", choices=PRESETS,
                   help="model preset (default: resource_constrained — the "
                        "no-model-download sandbox default; the reference "
                        "defaults to production)")
    p.add_argument("--hierarchical", action="store_true",
                   help="hierarchical top-down classification from Entity")
    p.add_argument("--log", action="store_true",
                   help="save the classification to a run-log file")
    p.add_argument("--log-dir", default="logs",
                   help="directory for --log output (default: logs)")
    p.add_argument("--log-format", default="json", choices=["json", "yaml"],
                   help="json (engine-native) or yaml — the reference's "
                        "exact run-log layout AND filename scheme "
                        "(YYYYMMDD_HHMMSS_EntityID.yaml, classification_"
                        "logger.py:28-112), so ref tooling that parses "
                        "those files keeps working")
    return p


def lookup_entity(spark, name: str, by_label: bool):
    from bfokg.fixtures import entities_df

    ents = entities_df(spark)
    col = "label" if by_label else "id"
    one = ents.where(F.col(col) == name)
    row = one.first()
    if row is None:
        available = [r[0] for r in ents.select(col).collect()]
        raise SystemExit(
            f"entity {name!r} not found by {col}; available: {', '.join(available)}"
        )
    return one, row


def format_matches(rows) -> str:
    # layout follows the DETAILED MATCHES printer, classify_entity.py:299-306
    lines = []
    for i, r in enumerate(rows, 1):
        lines.append(f"{i}. {r.class_label} (confidence: {r.confidence:.3f})")
        lines.append(f"   URI: {r.class_uri}")
        lines.append(f"   Source: {r.source}")
    return "\n".join(lines)


def print_cascade_trace(trace_rows) -> None:
    # CASCADE DECISION TRACE printer, classify_entity.py:269-291
    print("\n" + "=" * 80)
    print("CASCADE DECISION TRACE")
    print("=" * 80)
    symbol = {"ACCEPTED": "[ACCEPTED]", "CONTINUE": "-> Continue to next",
              "NO_RESULTS": "[NO_RESULTS]"}
    for step in sorted(trace_rows, key=lambda r: r.stage_idx):
        print(f"\n{step.classifier.upper()}:")
        if step.top_prediction is not None:
            print(f"  Prediction: {step.top_prediction}")
            print(f"  Confidence: {step.confidence:.3f}")
            print(f"  Threshold:  {step.threshold:.3f}")
            print(f"  Decision:   {symbol.get(step.decision, step.decision)}")
        else:
            print(f"  Decision:   {symbol.get(step.decision, step.decision)}")


def print_hierarchical_path(row) -> None:
    # HIERARCHICAL CLASSIFICATION PATH printer, classify_entity.py:238-259
    print("\n" + "=" * 80)
    print("HIERARCHICAL CLASSIFICATION PATH")
    print("=" * 80)
    print(f"Depth: {row.depth} levels")
    print(f"Stop Reason: {row.stop_reason}\n")
    symbol = {"START": "(root)", "DESCEND": "->"}
    for i, step in enumerate(row.path, 1):
        indent = "  " * (i - 1)
        dec = symbol.get(step.decision, step.decision)
        print(f"{indent}Level {i}: {step.class_label} "
              f"(conf: {step.confidence:.3f}) {dec}")


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from bfokg.api import Classifier
    from bfokg.session import get_spark

    print("=" * 80)
    print("BFO-WIKIDATA CLASSIFIER - SINGLE ENTITY DEMO (Spark engine)")
    print("=" * 80)

    print("\n1. Starting Spark...")
    spark = get_spark("bfokg-classify-entity")

    print("\n2. Loading configuration...")
    clf = Classifier(spark, preset=args.preset)
    print(f"   Using strategy: {args.strategy}")
    print(f"   Using preset: {args.preset}")
    print(f"   Semantic model: {clf.config.semantic_model}")
    print(f"   Zero-shot model: {clf.config.zeroshot_model or 'Disabled'}")
    print(f"   Fine-tuned base: {clf.config.finetuned_base}")

    print("\n3. Fetching entity...")
    entity_df, row = lookup_entity(spark, args.entity, by_label=args.sample)
    print(f"   Entity: {row.label} ({row.id})")
    print(f"   Description: {row.description}")
    if row.aliases:
        print(f"   Aliases: {', '.join(row.aliases[:5])}")

    print(f"\n4. Classifying...")  # noqa: F541
    t0 = time.time()

    if args.compare:
        results = clf.compare_strategies(entity_df).collect()
        print("\n" + "=" * 80)
        print("COMPARISON RESULTS")
        print("=" * 80)
        for name in STRATEGIES:
            part = sorted(
                (r for r in results if r.strategy == name), key=lambda r: r.rank
            )
            print(f"\n{name.upper()}:")
            for i, m in enumerate(part, 1):
                print(f"  {i}. {m.class_label} ({m.confidence:.3f}) [{m.source}]")
        spark.stop()
        return 0

    if args.hierarchical:
        out = clf.classify(entity_df, strategy=args.strategy,
                           top_k=args.top_k, hierarchical=True)
        rows = out.collect()
        print("\n" + "=" * 80)
        print("CLASSIFICATION RESULTS")
        print("=" * 80)
        print(format_matches(rows))
        print_hierarchical_path(rows[0])
        matches = rows
        trace_rows = None
    else:
        from bfokg.functions.text import with_entity_text
        from bfokg.operators.strategies import cascade

        if args.strategy == "cascade":
            m, trace = cascade(
                with_entity_text(entity_df), clf.classifiers, top_k=args.top_k
            )
            matches = sorted(m.collect(), key=lambda r: r.rank)
            trace_rows = trace.collect()
        else:
            m = clf.classify(entity_df, strategy=args.strategy, top_k=args.top_k)
            matches = sorted(
                m.where(F.col("source") != "inferred").collect(),
                key=lambda r: r.rank,
            )
            trace_rows = None
        print("\n" + "=" * 80)
        print("CLASSIFICATION RESULTS")
        print("=" * 80)
        print(format_matches(matches))
        if trace_rows:
            print_cascade_trace(trace_rows)

    elapsed_ms = (time.time() - t0) * 1000.0

    if args.log:
        os.makedirs(args.log_dir, exist_ok=True)
        if args.log_format == "yaml":
            # the reference's EXACT YAML layout + filename scheme
            # (classification_logger.py:50-112: timestamp / entity /
            # classification / system_config keys, yaml.dump with
            # sort_keys=False, filename YYYYMMDD_HHMMSS_EntityID.yaml) —
            # closes the declared S7 format gap for ref tooling
            from datetime import datetime

            import yaml

            from bfokg.config import CASCADE_THRESHOLDS
            from bfokg.functions.text import with_entity_text

            ts = datetime.now()
            text = with_entity_text(entity_df).select("text").first().text
            cfg = clf.config
            entry = {
                "timestamp": ts.isoformat(),
                "entity": {
                    "id": row.id, "label": row.label,
                    "description": row.description, "text": text,
                    "aliases": list(row.aliases[:5]) if row.aliases else [],
                },
                "classification": {
                    "strategy": args.strategy,
                    "processing_time_ms": elapsed_ms,
                    "top_matches": [
                        {"class_uri": r.class_uri, "class_label": r.class_label,
                         "confidence": float(r.confidence), "source": r.source,
                         "metadata": {}}
                        for r in matches
                    ],
                },
                "system_config": {
                    "device": "cpu",
                    "models": {
                        "semantic": cfg.semantic_model,
                        "zeroshot": cfg.zeroshot_model,
                        "finetuned_base": cfg.finetuned_base,
                    },
                    "thresholds": dict(CASCADE_THRESHOLDS)
                    if args.strategy == "cascade" else {},
                    "classifier_config": {"preset": args.preset},
                },
            }
            if trace_rows:
                # keys, order AND values match the reference's
                # cascade_decisions entries exactly (hybrid.py:409-415,
                # :430-433 → classification_logger.py:90-91): the repo's
                # internal ACCEPTED vocabulary maps to the reference's
                # ACCEPT at this emit boundary, and NO_RESULTS stages emit
                # confidence 0.0 (not null) like hybrid.py:432 — ref
                # tooling compares both fields, not just key names
                entry["cascade_trace"] = [
                    {"classifier": s.classifier,
                     "top_prediction": s.top_prediction,
                     "confidence": 0.0 if s.confidence is None
                     else float(s.confidence),
                     "threshold": float(s.threshold),
                     "decision": "ACCEPT" if s.decision == "ACCEPTED"
                     else s.decision}
                    for s in sorted(trace_rows, key=lambda r: r.stage_idx)
                ]
            path = os.path.join(
                args.log_dir, f"{ts.strftime('%Y%m%d_%H%M%S')}_{row.id}.yaml"
            )
            with open(path, "w", encoding="utf-8") as f:
                yaml.dump(entry, f, default_flow_style=False,
                          allow_unicode=True, sort_keys=False, indent=2)
        else:
            path = os.path.join(
                args.log_dir, f"classification_{row.id}_{int(time.time())}.json"
            )
            payload = {
                "entity": {"id": row.id, "label": row.label,
                           "description": row.description},
                "strategy": args.strategy,
                "preset": args.preset,
                "hierarchical": args.hierarchical,
                "processing_time_ms": elapsed_ms,
                "matches": [
                    {"class_uri": r.class_uri, "class_label": r.class_label,
                     "confidence": float(r.confidence), "source": r.source,
                     "rank": int(r.rank)}
                    for r in matches
                ],
            }
            with open(path, "w") as f:
                json.dump(payload, f, indent=2)
        print(f"\n[OK] Classification logged to: {path}")

    print("\n" + "=" * 80)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
