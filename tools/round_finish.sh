#!/bin/sh
# End-of-round checklist (VERDICT r7 #3/#4: the ALLCHECK mirror and
# CATALOG.md lagged the catalog two rounds running — script them so they
# cannot be forgotten). Usage:  sh tools/round_finish.sh <round-number>
#
# Ordering matters: the bench runs BEFORE the expensive-tail tiers so the
# top-N lists are derived from THIS round's own record — the previous
# latest-committed-record default lagged a round and dropped
# hard_negative_pairs from the r11 sf0.1 tier (VERDICT r11 #2).
set -e
cd "$(dirname "$0")/.."
N="${1:?usage: round_finish.sh <round-number>}"
NN="$(printf '%02d' "$N")"

echo "== 0/8 full pytest suite (the r8 snapshot shipped red — gate it) =="
python -m pytest tests/ -q

echo "== 1/8 full-catalog oracle mirror (sf0.01) =="
SPARK_GRAFT_ALLCHECK_OUT="ALLCHECK_r${NN}.json" \
    python tools/check_correctness.py /root/testdata/sf0.01

echo "== 2/8 bench (sf0.1, 3 runs) + snapshot + cross-round diff =="
# bench.py writes BENCH_LOCAL.json itself; don't redirect stdout onto the
# same file (the redirect's truncation races bench's own write). Its
# stderr carries the vs_prev >1.3x cross-round regressions — keep it on
# the terminal. The baseline is pinned to the PREVIOUS round's record so
# a mid-round re-run never diffs against its own interim snapshot.
PREV_RECORD="BENCH_FULL_r$(printf '%02d' $((N - 1))).json"
if [ -f "$PREV_RECORD" ]; then
    SPARK_GRAFT_BENCH_PREV="$PREV_RECORD" python bench.py > /tmp/bench_stdout.log
else
    python bench.py > /tmp/bench_stdout.log
fi
tail -c 400 BENCH_LOCAL.json
echo ""
# VERDICT r9 #1: the full per-query record must survive the round — the
# r8 record was never committed and its loss made the one open perf
# question (curation_v2 drift) unanswerable from artifacts.
cp BENCH_LOCAL.json "BENCH_FULL_r${NN}.json"
git add "BENCH_FULL_r${NN}.json"
python - "$N" << 'EOF'
import json, sys
r = json.load(open("BENCH_LOCAL.json"))
print(f"headline_total={r['headline_total']}s  window_load={r['window_load']}")
cal = r.get("calibration") or {}
print(f"calibration start={cal.get('start')}")
vsp = cal.get("vs_prev")
if vsp:
    # the mechanical host-factor ratio (VERDICT r13 #2): adjudicate any
    # carried-surface drift against THIS number, not a narrative
    print(f"host_factor={vsp['host_factor']} vs {vsp['baseline']} "
          f"(per-probe {vsp['per_probe']})")
vp = r.get("vs_prev")
if vp:
    print(f"vs {vp['baseline']} (total {vp['prev_total']}s):")
    for n, d in sorted(vp["regressed"].items()):
        print(f"  REGRESSED {n}: {d['prev']} -> {d['cur']} ({d['ratio']}x)")
    for n, d in sorted(vp["improved"].items()):
        print(f"  improved  {n}: {d['prev']} -> {d['cur']} ({d['ratio']}x)")
    if not vp["regressed"] and not vp["improved"]:
        print("  no query moved >1.3x either way")
else:
    print("no prior BENCH_FULL record at this sf — diff skipped")
EOF

echo "== 3/8 sf0.1 oracle tier: this round's 20 most expensive queries =="
# VERDICT r10 #2: scale-dependent divergence (overflow, spill, AQE plan
# changes) is invisible at sf0.01 — run the expensive tail one tier up.
TAIL_QUERIES=$(python tools/expensive_tail.py 20 "BENCH_FULL_r${NN}.json")
SPARK_GRAFT_ALLCHECK_OUT="ALLCHECK_SF01_r${NN}.json" \
    python tools/check_correctness.py /root/testdata/sf0.1 $TAIL_QUERIES
git add "ALLCHECK_SF01_r${NN}.json"

echo "== 4/8 sf1 oracle tier: this round's 10 most expensive queries =="
# VERDICT r11 #7: sf0.1 -> sf1 is where bound-and-correct branches (df
# caps, cell caps, band widths) change regime; grade the expensive tail
# there on the scale_harness-replicated corpus (disjoint ids, bijective
# token remap — the same corpus the SCALE.md growth rows run on).
# VERDICT r12 #5 widened the tier 5 -> 10: the next five include
# capped/blocked operators whose bound-and-correct branches had never
# been value-graded at 10x.
TOP10=$(python tools/expensive_tail.py 10 "BENCH_FULL_r${NN}.json")
SPARK_GRAFT_DRIVER_MEM=24g python tools/scale_harness.py --build-only --keep
SPARK_GRAFT_ALLCHECK_OUT="ALLCHECK_SF1_r${NN}.json" \
    SPARK_GRAFT_DRIVER_MEM=24g \
    python tools/check_correctness.py /root/repo/.scratch/sf1 $TOP10
git add "ALLCHECK_SF1_r${NN}.json"
rm -rf /root/repo/.scratch/sf1

echo "== 5/8 streaming evidence gate =="
# VERDICT r10 #5: the streaming layer's health becomes a round artifact
# (batch-equivalence + crash-injection suites, tagged pass/fail record).
python tools/stream_gate.py "STREAMGATE_r${NN}.json"
git add "STREAMGATE_r${NN}.json"

echo "== 6/8 codec differential gate =="
# VERDICT r12 #3: the Pillow-dependent image differentials skip in this
# container — record the passed/skipped split each round so a coverage
# change (either direction) is visible instead of silent.
python tools/diff_gate.py "DIFFGATE_r${NN}.json"
git add "DIFFGATE_r${NN}.json"

echo "== 7/8 catalog report =="
python tools/catalog_report.py > CATALOG.md

echo "== 8/8 done — review, then commit the artifacts =="
git status --short | head -20
