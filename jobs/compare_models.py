"""Model bake-off CLI — mirrors reference ``scripts/compare_models.py``.

Usage:
    python jobs/compare_models.py Q_SYNTH_1
    python jobs/compare_models.py "Marie Curie" --sample
    python jobs/compare_models.py Q_SYNTH_20 --type zeroshot --top-k 5

Output layout follows the reference (per-model header, timing, top-k,
SUMMARY table, speed bars — compare_models.py:78-148); the classify core
is the Spark kernel via plans/bakeoff.compare_models.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Compare different models")
    p.add_argument("entity", help="fixture id or entity label if --sample")
    p.add_argument("--sample", action="store_true", help="look up by label")
    p.add_argument("--type", default="semantic", choices=["semantic", "zeroshot"],
                   help="model type to compare (default: semantic)")
    p.add_argument("--top-k", type=int, default=3, help="number of results")
    args = p.parse_args(argv)

    from bfokg.functions.text import with_entity_text
    from bfokg.plans.bakeoff import compare_models
    from bfokg.session import get_spark

    print("=" * 80)
    print("MODEL COMPARISON (Spark engine)")
    print("=" * 80)

    spark = get_spark("bfokg-compare-models")
    from jobs.classify_entity import lookup_entity

    print("\n1. Fetching entity...")
    entity_df, row = lookup_entity(spark, args.entity, by_label=args.sample)
    print(f"   Entity: {row.label}")
    print(f"   Description: {row.description}")

    print(f"\n2. Comparing {args.type} models...")
    results = compare_models(with_entity_text(entity_df), args.type, args.top_k)

    print("\n" + "=" * 80)
    print(f"{args.type.upper()} MODEL COMPARISON")
    print("=" * 80)
    for r in results:
        info = r["info"]
        print(f"\nTesting {r['name']}...")
        print(f"  Size: {info['size']}, Speed: {info['speed']}, "
              f"Quality: {info['quality']}")
        print(f"  Encoder: {r['resolved_from']}")
        print(f"  Time: {r['elapsed_ms']:.1f}ms")
        print("  Top predictions:")
        for m in r["matches"]:
            print(f"    {m.rank}. {m.class_label} ({m.confidence:.3f})")

    print("\n" + "=" * 80)
    print("SUMMARY")
    print("=" * 80)
    print(f"\n{'Model':<50} {'Time (ms)':<12} {'Top Prediction':<20} {'Conf.'}")
    print("-" * 80)
    for r in results:
        top = r["matches"][0] if r["matches"] else None
        if top:
            print(f"{r['name']:<50} {r['elapsed_ms']:>8.1f}      "
                  f"{top.class_label[:18]:<20} {top.confidence:.3f}")
        else:
            print(f"{r['name']:<50} {r['elapsed_ms']:>8.1f}      (no predictions)")
    print("=" * 80)

    print("\nSpeed Comparison (lower is better):")
    for r in sorted(results, key=lambda x: x["elapsed_ms"]):
        bar = "#" * int(min(r["elapsed_ms"] / 10, 50))
        print(f"  {r['name'][:30]:<30} {bar} {r['elapsed_ms']:.0f}ms")
    print("\n" + "=" * 80)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
