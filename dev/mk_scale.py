#!/usr/bin/env python3
"""Regenerate SCALE.md from two graft.Bench full-JSON dumps.

Usage: mk_scale.py <bench_sf01.json> <bench_10x.json> <round>

Both inputs must be produced the driver's way: one JVM, full suite in
alphabetical sequence, two timed passes per query, per-query minima,
SINGLE invocation (no min-across-runs — that overwrites genuine
in-sequence costs; see round-3 verdict).
"""
import json, sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
rnd = sys.argv[3]
aq, bq = a["queries"], b["queries"]
names = sorted(set(aq) & set(bq))
rows = []
for k in names:
    r = max(1.0, bq[k] / aq[k]) if aq[k] > 0 else float("nan")
    rows.append((k, aq[k], bq[k], r))
worst = sorted(rows, key=lambda t: -t[3])[:5]

out = []
out.append(f"# SCALE — 10× stress measurement (round {rnd})\n")
out.append(f"""Question under test: *would these plans survive a scale-up?* The driver's
bench runs at sf0.1 (~600k-row lineitem); `graft.ScaleUp` materializes a
10× replica (6M-row lineitem, 1M events, 500k docs at ~90% exact-duplicate
density — the adversarial dedup case — 200k vectors; fact keys remapped
per copy, dims kept 1× like a real star schema) and `graft.Bench` runs
the same {len(names)} headline queries against it. local[32], single JVM.

Methodology (matches the driver exactly): ONE bench invocation per
scale — one JVM, full suite in alphabetical sequence, two timed passes
per query, per-query minima, localCheckpoint blocks unpersisted between
queries. No min-across-invocations: that estimator overwrote a genuine
in-sequence cost in round 3 (the q89 measurement-context gap) and is
retired. Numbers here are therefore directly comparable to the driver's
BENCH_r{{N}}.json.

**Totals: {a['value']:.1f} s at sf0.1 → {b['value']:.1f} s at 10× —
{b['value']/a['value']:.2f}× wall-clock for 10× data across {len(names)}
queries.** Worst per-query ratios:
{chr(10).join(f"{k} {ra:.2f}→{rb:.2f} s ({r:.1f}×)" for k, ra, rb, r in worst)}.
Ratios floored at 1.0× (a 10× measurement below the sf0.1 one is
residual noise).\n""")
out.append("| Query | sf0.1 (s) | 10× (s) | ratio |")
out.append("|---|---|---|---|")
for k, ra, rb, r in rows:
    out.append(f"| {k} | {ra:.2f} | {rb:.2f} | {r:.1f}× |")
out.append("")
open("SCALE.md", "w").write("\n".join(out))
print(f"wrote SCALE.md: {len(names)} queries, {a['value']:.1f}s -> {b['value']:.1f}s")
