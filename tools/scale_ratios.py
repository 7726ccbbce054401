#!/usr/bin/env python3
"""Per-query / per-family growth ratios between two bench snapshots.

Usage: python3 tools/scale_ratios.py BENCH_LOCAL.json BENCH_sf1.json [factor=10]

Reads the two one-line bench JSONs (baseline first), joins on query name and
prints a markdown report: per-family median/max growth ratio plus every query
whose ratio exceeds 1.5x the data-scale factor (the shuffle-bound allowance
from the round-8 verdict: "no query growing >~15x on a 10x scale-up").

A ratio is wall-time(scaled)/wall-time(baseline). Sub-linear ratios are
normal for queries dominated by fixed costs (session, model-sized frames,
plan construction) at sf0.1; the audit is about the superlinear tail.
"""
import json, statistics, sys

base_path, scaled_path = sys.argv[1], sys.argv[2]
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
allowance = 1.5 * factor

base = json.load(open(base_path))
scaled = json.load(open(scaled_path))
bq, sq = base["queries"], scaled["queries"]

common = sorted(set(bq) & set(sq))
missing = sorted(set(bq) ^ set(sq))
ratios = {n: sq[n] / bq[n] for n in common if bq[n] > 0}

fams = {}
for n, r in ratios.items():
    fams.setdefault(n.split("_")[0][0], []).append((n, r))

print(f"baseline: {base_path} total={base['value']}s load={base['load']}")
print(f"scaled:   {scaled_path} total={scaled['value']}s load={scaled['load']}")
print(f"queries compared: {len(common)}; missing from one side: {missing}")
print(f"total growth: {scaled['value']/base['value']:.2f}x on a {factor:g}x "
      f"data scale-up (allowance {allowance:g}x per query)\n")

print("| family | n | median ratio | max ratio | max query |")
print("|---|---|---|---|---|")
for f in sorted(fams):
    rs = fams[f]
    mx = max(rs, key=lambda t: t[1])
    print(f"| {f} | {len(rs)} | {statistics.median(r for _, r in rs):.2f}x "
          f"| {mx[1]:.2f}x | {mx[0]} ({bq[mx[0]]:.2f}->{sq[mx[0]]:.2f}s) |")

offenders = sorted((r, n) for n, r in ratios.items() if r > allowance)
print(f"\nqueries over the {allowance:g}x allowance: {len(offenders)}")
for r, n in reversed(offenders):
    print(f"  {n}: {bq[n]:.2f}s -> {sq[n]:.2f}s ({r:.1f}x)")

top = sorted(ratios.items(), key=lambda t: -t[1])[:15]
print("\nslowest-growing 15 (ratio, sf-scaled seconds):")
for n, r in top:
    print(f"  {n}: {r:.1f}x ({bq[n]:.2f}->{sq[n]:.2f}s)")
