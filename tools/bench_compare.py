#!/usr/bin/env python3
"""Compare two Bench metric-line JSONs row by row.

Usage: python3 tools/bench_compare.py <new.json> <old.json>

Prints shared-row median ratio (new/old med-of-medians), the biggest
movers both ways, and rows present on only one side. Rows may be
{"min":..,"med":..,"max":..} triplets or bare seconds.
"""
import json
import statistics
import sys


def med(v):
    return v["med"] if isinstance(v, dict) else float(v)


def main():
    new = json.load(open(sys.argv[1]))["queries"]
    old = json.load(open(sys.argv[2]))["queries"]
    shared = sorted(set(new) & set(old))
    ratios = {k: med(new[k]) / med(old[k]) for k in shared if med(old[k]) > 0}
    overall = statistics.median(ratios.values()) if ratios else float("nan")
    shown = f"{overall:.3f}" if ratios else "n/a"
    print(f"shared rows: {len(shared)}  median ratio new/old: {shown}")
    big = sorted(ratios.items(), key=lambda kv: kv[1])
    print("fastest movers:", [(k, round(r, 2)) for k, r in big[:5]])
    print("slowest movers:", [(k, round(r, 2)) for k, r in big[-5:]])
    only_new = sorted(set(new) - set(old))
    if only_new:
        print("new rows:", [(k, round(med(new[k]), 2)) for k in only_new])
    only_old = sorted(set(old) - set(new))
    if only_old:
        print("removed rows:", only_old)
    slow = sorted(new.items(), key=lambda kv: -med(kv[1]))[:8]
    print("slowest absolute:", [(k, round(med(v), 2)) for k, v in slow])


if __name__ == "__main__":
    main()
