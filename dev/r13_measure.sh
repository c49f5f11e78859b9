#!/bin/bash
# Round-13 measurement program — run in a QUIET window (no concurrent
# sbt/spark work): (1) unchanged-code alphabetical A/B for the residue
# gate, (2) same-seed shuffled pair for the q108 adjudication.
set -e
cd /root/repo
for tag in A B; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_r13_$tag.json \
  ./dev/run.sh graft.Bench 2>/tmp/bench_r13_$tag.err | tail -1 \
    > /tmp/bench_r13_${tag}_short.json
done
for tag in C D; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_SHUFFLE=42 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_r13_$tag.json \
  ./dev/run.sh graft.Bench 2>/tmp/bench_r13_$tag.err | tail -1 \
    > /tmp/bench_r13_${tag}_short.json
done
grep residue /tmp/bench_r13_A.err
python3 - <<'EOF'
import json, statistics
def load(p):
    d = json.load(open(p))
    return d.get("parsed", d)
runs = {t: load(f"/tmp/bench_r13_{t}.json") for t in "ABCD"}
for t, d in runs.items():
    print(t, "total %.2f probe %.3f seed %s" %
          (d["value"], d["probe_sec"], d.get("shuffle_seed")))
def qmap(d):
    return {q.split("_")[0]: v for q, v in d["queries"].items()}
qa, qb = qmap(runs["A"]), qmap(runs["B"])
shared = sorted(set(qa) & set(qb))
ratios = sorted(qb[q] / qa[q] for q in shared if qa[q] > 0)
print("A/B shared raw: total ratio %.3f, per-query median %.3f, p90 %.3f"
      % (sum(qb[q] for q in shared) / sum(qa[q] for q in shared),
         statistics.median(ratios), ratios[int(len(ratios) * 0.9)]))
qc, qd = qmap(runs["C"]), qmap(runs["D"])
r11 = qmap(load("BENCH_r11.json")); r12 = qmap(load("BENCH_r12.json"))
for q in ("q108", "q106", "q85", "q98"):
    print(q, "r11=%.3f r12=%.3f A=%.3f B=%.3f C(shuf)=%.3f D(shuf)=%.3f"
          % (r11.get(q, float("nan")), r12.get(q, float("nan")),
             qa.get(q, float("nan")), qb.get(q, float("nan")),
             qc.get(q, float("nan")), qd.get(q, float("nan"))))
EOF
