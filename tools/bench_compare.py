#!/usr/bin/env python3
"""Compare two bench JSON records row by row (round-18 record tooling).

Usage: bench_compare.py <before.json> <after.json> [--md]
Prints per-row before/after/ratio (sorted by name), geomeans, and the
largest movers. --md emits the markdown appendix table.
"""
import json
import math
import sys


def main() -> None:
    before = json.load(open(sys.argv[1]))["queries"]
    after = json.load(open(sys.argv[2]))["queries"]
    md = "--md" in sys.argv
    rows = [(k, before[k], after[k], after[k] / before[k])
            for k in sorted(before) if k in after]
    if md:
        print("| query | before s | after s | ratio |")
        print("|---|---|---|---|")
        for k, b, a, r in rows:
            print(f"| {k} | {b:.2f} | {a:.2f} | {r:.2f} |")
    else:
        for k, b, a, r in rows:
            print(f"{k:30s} {b:7.2f} {a:7.2f} {r:6.2f}")
    g = math.exp(sum(math.log(r[3]) for r in rows) / len(rows))
    big = [r for r in rows if r[1] >= 1.0]
    gb = math.exp(sum(math.log(r[3]) for r in big) / len(big))
    tb = sum(r[1] for r in rows)
    ta = sum(r[2] for r in rows)
    print(f"\nshared rows n={len(rows)} total {tb:.1f} -> {ta:.1f} "
          f"({ta / tb:.3f}x)  geomean {g:.3f}  "
          f"geomean(before>=1s, n={len(big)}) {gb:.3f}")


if __name__ == "__main__":
    main()
