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

echo "== 0/3 full pytest suite (the r8 snapshot shipped red — gate it) =="
python -m pytest tests/ -q

echo "== 1/3 full-catalog oracle mirror (sf0.01) =="
SPARK_GRAFT_ALLCHECK_OUT="ALLCHECK_r0${N}.json" \
    python tools/check_correctness.py /root/testdata/sf0.01

echo "== 2/3 catalog report =="
python tools/catalog_report.py > CATALOG.md

echo "== 3/3 bench (sf0.1, 3 runs) =="
# bench.py writes BENCH_LOCAL.json itself; don't redirect stdout onto the
# same file (the redirect's truncation races bench's own write)
python bench.py > /tmp/bench_stdout.log
tail -c 400 BENCH_LOCAL.json
