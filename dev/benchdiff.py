#!/usr/bin/env python3
"""Probe-normalized bench regression check.

Usage: dev/benchdiff.py <baseline.json> <candidate.json> [threshold]

Both files are graft.Bench JSON lines -- either the bare object the
Bench main writes (target/bench_full.json) or the driver's BENCH_r{N}
wrapper (the bare object then lives under "parsed"). Per-query times
are divided by each run's probe_sec (a fixed stock-Spark plan timed in
the same JVM) before comparing, so a uniformly slower host window does
not read as a regression -- rounds 5-7 each burned wall-clock
re-litigating exactly that by hand.

Exit 1 on CONCENTRATED movement: any query whose normalized time grew
by more than `threshold` (default 1.3x) AND by more than 0.2s absolute
(sub-probe-resolution noise on sub-second queries is not a signal).
New/removed queries are listed, never failed on.
"""
import sys, json


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if "queries" not in d:
        sys.exit(f"{path}: no 'queries' key (not a bench JSON?)")
    # the driver's BENCH_r{N} wrapper abbreviates names to the qNN id;
    # local bench output keeps full names -- canonicalize on the id
    d["queries"] = {q.split("_")[0]: t for q, t in d["queries"].items()}
    return d


def main():
    base, cand = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    pb = float(base.get("probe_sec") or 1.0)
    pc = float(cand.get("probe_sec") or 1.0)
    bq, cq = base["queries"], cand["queries"]
    print(f"probe: base {pb:.3f}s  cand {pc:.3f}s  "
          f"(host speed ratio {pc / pb:.2f}x)")
    print(f"total: base {base.get('value', '?')}s  cand {cand.get('value', '?')}s")
    rows, regressions = [], []
    for q in sorted(set(bq) & set(cq)):
        nb, nc = bq[q] / pb, cq[q] / pc
        ratio = nc / nb if nb > 0 else float("inf")
        rows.append((ratio, q, bq[q], cq[q], nb, nc))
        if ratio > threshold and (nc - nb) * pc > 0.2:
            regressions.append((ratio, q))
    rows.sort(reverse=True)
    print(f"\n{'query':<8}{'base_s':>8}{'cand_s':>8}{'norm_b':>8}"
          f"{'norm_c':>8}{'ratio':>7}")
    for ratio, q, b, c, nb, nc in rows[:15]:
        flag = "  <-- REGRESSION" if any(q == r[1] for r in regressions) else ""
        print(f"{q:<8}{b:>8.3f}{c:>8.3f}{nb:>8.3f}{nc:>8.3f}{ratio:>6.2f}x{flag}")
    only_b, only_c = sorted(set(bq) - set(cq)), sorted(set(cq) - set(bq))
    if only_b:
        print(f"\nremoved vs baseline: {', '.join(only_b)}")
    if only_c:
        print(f"new vs baseline: {', '.join(only_c)}")
    med = sorted(r[0] for r in rows)[len(rows) // 2] if rows else 1.0
    print(f"\nmedian normalized ratio: {med:.2f}x over {len(rows)} shared queries")
    if regressions:
        print(f"\nFAIL: {len(regressions)} concentrated regression(s) "
              f"> {threshold}x normalized:")
        for ratio, q in sorted(regressions, reverse=True):
            print(f"  {q}: {ratio:.2f}x")
        sys.exit(1)
    print("OK: no concentrated regressions")


if __name__ == "__main__":
    main()
