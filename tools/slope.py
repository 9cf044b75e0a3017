#!/usr/bin/env python3
"""Scaling-slope report (VERDICT r4 #6): compare per-query warm-median3
times across two scale factors (10x data: sf0.01 -> sf0.1) and across the
single-file vs 8-shard sf0.1 fixture (tools/reshard.py), and emit the
markdown table recorded in BASELINE.md.

A query is FLAGGED super-linear when its time grows >4x on 10x data AND
its sf0.1 time exceeds 0.3 s (below that, JVM/plan constants dominate and
a ratio is noise). For each flag we also show the sharded-fixture time:
if the sharded run collapses the ratio, the "super-linearity" is a
single-input-split artifact (one parquet file = one scan task) rather
than an algorithmic blow-up.

Driver-side python tooling — NOT part of the Spark library.
Usage: python3 tools/slope.py [benchDir]
"""
import json, sys

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

rows = [(k, q001.get(k), q01[k], q8.get(k)) for k in sorted(q01)]
slopes = [(k, a, b, c, b / a) for k, a, b, c in rows if a]

print(f"aggregate: sf0.01 {t001:.1f} s, sf0.1 {t01:.1f} s (slope "
      f"{t01/t001:.2f}x on 10x data), sf0.1x8 {t8:.1f} s")
print()
print("| query | sf0.01 | sf0.1 | slope (10x data) | sf0.1 x8 shards | flag |")
print("|---|---|---|---|---|---|")
for k, a, b, c, s in sorted(slopes, key=lambda r: -r[4]):
    if s <= 2.0:
        continue
    flag = "FLAG" if (s > 4 and b > 0.3) else ""
    print(f"| `{k}` | {a:.2f} s | {b:.2f} s | {s:.1f}x | {c:.2f} s | {flag} |")
n_hidden = sum(1 for *_, s in slopes if s <= 2.0)
print(f"\n({n_hidden} further queries have slope <= 2.0x and are omitted.)")
