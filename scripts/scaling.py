#!/usr/bin/env python3
"""Regenerate the SCALING.md family table from two Bench JSON snapshots.

Usage: python3 scripts/scaling.py <bench_sf0.01.json> <bench_sf0.1.json>

Prints the per-family scale-up table (markdown) plus the worst single
queries — paste into SCALING.md after a paired run:

  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
    SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf001.json sbt "runMain graft.Bench"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1  sbt "runMain graft.Bench"
"""
import json
import re
import sys


def family(q):
    if re.match(r"q\d\d_", q):
        return "relational (q01-q70)"
    return {
        "amqp": "amqp (streaming gates)", "corpus": "corpus", "dedup": "dedup",
        "fmt": "fmt (format round-trips)", "mm": "mm (multimodal)",
        "sim": "sim (vector/graph)", "split": "split", "txt": "txt",
    }.get(q.split("_")[0], "other")


def main():
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    # Bench writes -1.0 for a budget-skipped or failed query: a pairing
    # that silently summed the sentinel would misstate every ratio
    bad = {q for j in (small, big) for q, v in j["queries"].items() if v <= 0}
    if bad:
        print(f"EXCLUDED failed/skipped queries (value <= 0): {sorted(bad)}")
    qs = sorted((set(small["queries"]) & set(big["queries"])) - bad)
    missing = set(small["queries"]) ^ set(big["queries"])
    fams = {}
    for q in qs:
        f = fams.setdefault(family(q), [0, 0.0, 0.0])
        f[0] += 1
        f[1] += small["queries"][q]
        f[2] += big["queries"][q]
    print("| family | queries | sf0.01 total (s) | sf0.1 total (s) | ratio for 10x data |")
    print("|---|---|---|---|---|")
    tn = ts = tb = 0
    for name in sorted(fams):
        n, s, b = fams[name]
        tn += n; ts += s; tb += b
        print(f"| {name} | {n} | {s:.1f} | {b:.1f} | {b / s:.2f} |")
    print(f"| **TOTAL** | **{tn}** | **{ts:.1f}** | **{tb:.1f}** | **{tb / ts:.2f}** |")
    print()
    worst = sorted(qs, key=lambda q: big["queries"][q] / small["queries"][q])[-6:]
    print("worst single-query ratios:")
    for q in reversed(worst):
        print(f"  {q}: {small['queries'][q]:.2f}s -> {big['queries'][q]:.2f}s "
              f"({big['queries'][q] / small['queries'][q]:.1f}x)")
    if missing:
        print(f"\nqueries present in only one run (excluded): {sorted(missing)}")
    for tag, j in (("sf0.01", small), ("sf0.1", big)):
        print(f"{tag}: load1={j.get('load1')} total={j['value']:.1f}s")


if __name__ == "__main__":
    main()
