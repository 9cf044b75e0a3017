#!/usr/bin/env python3
"""Scaling-slope report (VERDICT r4 #6, extended r8 per VERDICT r7 #5):
compare per-query warm-median3 times across scale factors — sf0.01 ->
sf0.1 (driver fixtures, 10x) and, when bench/BENCH_sf1.json exists
(tools/make_sf1.py), the second decade sf0.1 -> sf1 — plus the
single-file vs 8-shard sf0.1 fixture (tools/reshard.py). Emits the
markdown table recorded in BASELINE.md.

Flag rules, PER DECADE:
  * d1 (sf0.01 -> sf0.1): FLAG when time grows >4x on 10x data AND the
    sf0.1 time exceeds 0.3 s (below that, JVM/plan constants dominate).
    At these sizes nearly every query is overhead-dominated, so >4x
    almost always means an artifact — the 8-shard column diagnoses it:
    if the sharded run collapses the ratio, it was a single-input-split
    scan, not an algorithm.
  * d2 (sf0.1 -> sf1): on FIXED local cores, 10x data through a
    data-dominant query is ~10x time — that is LINEAR scaling (a cluster
    holds time constant by adding executors), so the d1 rule would
    mislabel healthy queries. Ratios in 4-10x are annotated `data-bound`
    (the query has simply crossed from overhead-dominated to
    data-dominated); FLAG d2 fires only above 10x per decade with sf1
    time > 1 s — genuine super-linearity with no split excuse (the sf1
    fixture is 40 files/table by construction).

Driver-side python tooling — NOT part of the Spark library.
Usage: python3 tools/slope.py [benchDir]
"""
import json, os, sys

D = sys.argv[1] if len(sys.argv) > 1 else "bench"

def load(p):
    with open(p) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    q = next(l for l in lines if "queries" in l)["queries"]
    t = next(l for l in lines if l.get("metric") == "total")["value"]
    return q, t

q001, t001 = load(f"{D}/BENCH_sf0.01.json")
q01, t01 = load(f"{D}/BENCH_sf0.1.json")
q8, t8 = load(f"{D}/BENCH_sf0.1x8.json")
has_sf1 = os.path.exists(f"{D}/BENCH_sf1.json")
q1, t1 = load(f"{D}/BENCH_sf1.json") if has_sf1 else ({}, None)

print(f"aggregate: sf0.01 {t001:.1f} s, sf0.1 {t01:.1f} s (slope "
      f"{t01/t001:.2f}x on 10x data), sf0.1x8 {t8:.1f} s"
      + (f", sf1 {t1:.1f} s (second-decade slope {t1/t01:.2f}x)" if has_sf1 else ""))
print()
if has_sf1:
    print("| query | sf0.01 | sf0.1 | slope d1 | sf0.1 x8 | sf1 | slope d2 | flag |")
    print("|---|---|---|---|---|---|---|---|")
else:
    print("| query | sf0.01 | sf0.1 | slope (10x data) | sf0.1 x8 shards | flag |")
    print("|---|---|---|---|---|---|")

rows = [(k, q001.get(k), q01[k], q8.get(k), q1.get(k)) for k in sorted(q01)]
slopes = [(k, a, b, c, d, b / a, (d / b if d else None))
          for k, a, b, c, d in rows if a]

def fmt(v, unit=" s"):
    return f"{v:.2f}{unit}" if v is not None else "—"

n_shown = 0
for k, a, b, c, d, s1, s2 in sorted(slopes, key=lambda r: -max(r[5], r[6] or 0)):
    if s1 <= 2.0 and (s2 is None or s2 <= 2.0):
        continue
    f1 = s1 > 4 and b > 0.3
    f2 = s2 is not None and s2 > 10 and d > 1.0
    db = s2 is not None and 4 < s2 <= 10 and d > 0.3
    flag = "FLAG d1" if f1 else ("FLAG d2" if f2 else ("data-bound" if db else ""))
    if has_sf1:
        print(f"| `{k}` | {fmt(a)} | {fmt(b)} | {s1:.1f}x | {fmt(c)} | {fmt(d)} | "
              f"{fmt(s2, 'x') if s2 else '—'} | {flag} |")
    else:
        print(f"| `{k}` | {fmt(a)} | {fmt(b)} | {s1:.1f}x | {fmt(c)} | {flag} |")
    n_shown += 1
n_hidden = len(slopes) - n_shown
print(f"\n({n_hidden} further queries have every decade slope <= 2.0x and are omitted.)")
