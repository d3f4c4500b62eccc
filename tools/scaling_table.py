#!/usr/bin/env python3
"""Build the SCALING.md full-surface table: per-family warm totals and
worst per-query ratios from a full sf0.1 BENCH_DETAIL.json and a full
sf1 detail artifact (same schema).

Usage: scaling_table.py BENCH_DETAIL.json BENCH_SF1_FULL.json
"""
import json
import sys


def family(name: str) -> str:
    return name.split("_", 1)[0]


def main(p01: str, p1: str) -> int:
    a = json.load(open(p01))["queries"]
    b = json.load(open(p1))["queries"]
    shared = sorted(set(a) & set(b))
    fams = {}
    for q in shared:
        fams.setdefault(family(q), []).append(q)
    print("| family | n | sf0.1 warm | sf1 warm | ratio |")
    print("|---|---|---|---|---|")
    for f in sorted(fams):
        qs = fams[f]
        s01 = sum(a[q] for q in qs)
        s1 = sum(b[q] for q in qs)
        print(f"| {f} | {len(qs)} | {s01:.2f} s | {s1:.2f} s | {s1 / s01:.1f}x |")
    t01 = sum(a[q] for q in shared)
    t1 = sum(b[q] for q in shared)
    print(f"| **total** | {len(shared)} | **{t01:.2f} s** | **{t1:.2f} s** | **{t1 / t01:.1f}x** |")
    print()
    worst = sorted(shared, key=lambda q: b[q] / max(a[q], 1e-9), reverse=True)[:12]
    print("| query | sf0.1 | sf1 | ratio |")
    print("|---|---|---|---|")
    for q in worst:
        print(f"| {q} | {a[q]:.2f} | {b[q]:.2f} | {b[q] / max(a[q], 1e-9):.1f}x |")
    slow = sorted(shared, key=lambda q: b[q], reverse=True)[:12]
    print()
    print("| slowest at sf1 | seconds |")
    print("|---|---|")
    for q in slow:
        print(f"| {q} | {b[q]:.2f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
