#!/bin/sh
# End-of-round checklist (VERDICT r7 #3/#4: the ALLCHECK mirror and
# CATALOG.md lagged the catalog two rounds running — script them so they
# cannot be forgotten). Usage:  sh tools/round_finish.sh <round-number>
#
#   1. full-catalog oracle mirror  -> ALLCHECK_r<N>.json  (must be 0 fails)
#   2. catalog report              -> CATALOG.md
#   3. bench triple                -> BENCH_LOCAL.json
set -e
cd "$(dirname "$0")/.."
N="${1:?usage: round_finish.sh <round-number>}"

echo "== 0/6 full pytest suite (the r8 snapshot shipped red — gate it) =="
python -m pytest tests/ -q

echo "== 1/6 full-catalog oracle mirror (sf0.01) =="
SPARK_GRAFT_ALLCHECK_OUT="ALLCHECK_r$(printf '%02d' "$N").json" \
    python tools/check_correctness.py /root/testdata/sf0.01

echo "== 2/6 sf0.1 oracle tier: the 20 most expensive queries =="
# VERDICT r10 #2: scale-dependent divergence (overflow, spill, AQE plan
# changes) is invisible at sf0.01 — run the expensive tail one tier up.
TAIL_QUERIES=$(python tools/expensive_tail.py 20)
SPARK_GRAFT_ALLCHECK_OUT="ALLCHECK_SF01_r$(printf '%02d' "$N").json" \
    python tools/check_correctness.py /root/testdata/sf0.1 $TAIL_QUERIES
git add "ALLCHECK_SF01_r$(printf '%02d' "$N").json"

echo "== 3/6 streaming evidence gate =="
# VERDICT r10 #5: the streaming layer's health becomes a round artifact
# (batch-equivalence + crash-injection suites, tagged pass/fail record).
python tools/stream_gate.py "STREAMGATE_r$(printf '%02d' "$N").json"
git add "STREAMGATE_r$(printf '%02d' "$N").json"

echo "== 4/6 catalog report =="
python tools/catalog_report.py > CATALOG.md

echo "== 5/6 bench (sf0.1, 3 runs) =="
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
echo "== 6/6 snapshot full bench record + cross-round diff =="
# VERDICT r9 #1: the full per-query record must survive the round — the
# r8 record was never committed and its loss made the one open perf
# question (curation_v2 drift) unanswerable from artifacts.
cp BENCH_LOCAL.json "BENCH_FULL_r$(printf '%02d' "$N").json"
git add "BENCH_FULL_r$(printf '%02d' "$N").json"
python - "$N" << 'EOF'
import json, sys
r = json.load(open("BENCH_LOCAL.json"))
print(f"headline_total={r['headline_total']}s  window_load={r['window_load']}")
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
