#!/usr/bin/env python3
"""Regenerate BASELINE.md's per-query floor table from the round's
bench artifacts.

Policy (BASELINE.md "RULES"):
- floor = min(previous floor, this round's idle-run minimum); new
  queries enter at their first idle-run minimum;
- deliberate floor RAISES (algorithm changes) are NOT auto-applied —
  they get a dated note in the "Floor updates" section and the floor
  column takes the new value only when the old query key's floor is
  listed in DELIBERATE below;
- median / cluster / sf1 columns are this round's context readings.

Usage: python3 tools/baseline_table.py [headline] [cluster] [sf1] [old_baseline]
Prints the markdown table + totals to stdout.
"""
import json
import re
import sys

headline = sys.argv[1] if len(sys.argv) > 1 else "bench_headline_r12.json"
cluster = sys.argv[2] if len(sys.argv) > 2 else "bench_cluster_r12.json"
sf1 = sys.argv[3] if len(sys.argv) > 3 else "bench_sf1_full_r12.json"
old_md = sys.argv[4] if len(sys.argv) > 4 else "BASELINE.md"

# Queries whose floor moves by DELIBERATE algorithm change THIS round:
# query -> the expected new floor documented with the re-plan. Each
# entry is scoped to the single regeneration that applies it — once the
# re-set floor is committed into BASELINE.md the entry MUST be pruned
# (the table then carries the new floor and the normal ratchet governs),
# so a later unrelated regression in the same query can never hide
# behind a stale exemption. If the measured minimum lands materially
# above the documented expectation, regeneration FAILS LOUDLY instead of
# recording the overshoot as deliberate.
# (r13 text_quality_model and the r15 DistScan-family re-sets are
# committed in BASELINE.md's table and their entries are pruned.)
# (r13 text_quality_model, the r15 DistScan family, and r16
# ann_silhouette are committed in BASELINE.md's table and pruned.)
# NOTE the q_group_topk rule (BASELINE.md r14 correction): that query
# ranges 0.29-0.60 across idle runs, so one-off minima are NOT
# ratcheted — restore 0.341 manually if a regeneration lowers it.
DELIBERATE: dict = {}  # e.g. {"ann_silhouette": 0.581}
DELIBERATE_TOLERANCE = 1.25

h = json.load(open(headline))
c = json.load(open(cluster))
s = json.load(open(sf1))
# context columns read MINIMA when the artifact has them (a multi-rep
# sf1 sweep's median carries the first-rep fixture write)
c["queries"] = c.get("queries_min") or c["queries"]
s["queries"] = s.get("queries_min") or s["queries"]

old = {}
old_ctx = {}
for line in open(old_md):
    m = re.match(r"\| (\w+) \| ([\d.]+) \| [\d.]+ \| ([^|]+) \| ([^|]+) \|",
                 line)
    if m:
        old[m.group(1)] = float(m.group(2))
        old_ctx[m.group(1)] = (m.group(3).strip(), m.group(4).strip())

rows = []
for q in sorted(h["queries"]):
    new_min = h["queries_min"][q]
    if q in DELIBERATE:
        expected = DELIBERATE[q]
        if new_min > expected * DELIBERATE_TOLERANCE:
            sys.exit(
                f"DELIBERATE re-set for {q} documents an expected floor "
                f"of {expected:.3f} s but this round measured "
                f"{new_min:.3f} s (> {DELIBERATE_TOLERANCE}x): the "
                "re-plan cost is worse than documented — re-measure or "
                "fix before recording it as deliberate")
        floor = new_min
    elif q not in old:
        floor = new_min
    else:
        floor = min(old[q], new_min)
    rows.append((q, floor, h["queries"][q], c["queries"].get(q),
                 s["queries"].get(q)))

print("| query | floor s (sf0.1 min) | median s | cluster s | sf1 s |")
print("| --- | --- | --- | --- | --- |")
for q, f, med, cl, s1 in rows:
    # context columns: fresh reading when this round measured the query
    # (cluster replays only the changed surface), else the prior value
    # carries forward verbatim (incl. any * pre-change marker)
    cl_s = f"{cl:.3f}" if cl is not None else old_ctx.get(q, ("—",))[0]
    s1_s = (f"{s1:.3f}" if s1 is not None
            else old_ctx.get(q, ("—", "—"))[1])
    print(f"| {q} | {f:.3f} | {med:.3f} | {cl_s} | {s1_s} |")

print()
print(f"Totals: floor {sum(r[1] for r in rows):.1f} s over {len(rows)} "
      f"queries (median total {h['value']:.1f} s, loads "
      f"{h['load_start']}/{h['load_end']}); cluster single-shot "
      f"{c['value']:.1f} s over {len(c['queries'])} queries; sf1 "
      f"single-shot {s['value']:.1f} s over {len(s['queries'])} queries.")

# the bench's own floor check (round 13+): surface its verdict so a >2x
# regression is visible in this regeneration step too, not only in the
# headline JSON
if "perf_weak" in h:
    print()
    print(f"Bench floor check (vs the PREVIOUS table): "
          f"worst_floor_ratio {h.get('worst_floor_ratio')}, "
          f"perf_weak {h.get('perf_weak')}, no_floor {h.get('no_floor')}.")
