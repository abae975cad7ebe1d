#!/usr/bin/env python3
"""Per-query sf1 slope report: log10(t_sf1 / t_sf0.1) for every query
present in both a full-surface sf1 sweep and the committed sf0.1
headline. Slope 1.0 = linear in the 10x row count; sub-1.0 = sublinear.

Usage: python3 tools/slopes.py [bench_sf1_full.json] [bench_headline.json]
"""
import json
import math
import sys

sf1_path = sys.argv[1] if len(sys.argv) > 1 else "bench_sf1_full_r12.json"
base_path = sys.argv[2] if len(sys.argv) > 2 else "bench_headline.json"

# prefer per-query MINIMA on both sides (the BASELINE floor basis):
# medians of a multi-rep sweep carry one-time costs (e.g. a first-rep
# fixture write) and contention blips that minima exclude
def best(path):
    d = json.load(open(path))
    return d.get("queries_min") or d["queries"]
sf1 = best(sf1_path)
base = best(base_path)

rows = []
for q in sorted(set(sf1) & set(base)):
    t0, t1 = base[q], sf1[q]
    if t0 <= 0 or t1 <= 0:
        continue
    slope = math.log10(max(t1, 1e-4) / max(t0, 1e-4))
    rows.append((slope, q, t0, t1))

rows.sort(reverse=True)
over = [r for r in rows if r[0] > 1.0]
print(f"{len(rows)} comparable queries; {len(over)} above slope 1.0")
print(f"{'query':28s} {'sf0.1 s':>8s} {'sf1 s':>8s} {'slope':>6s}")
for slope, q, t0, t1 in rows[:25]:
    print(f"{q:28s} {t0:8.3f} {t1:8.3f} {slope:6.2f}")
