"""Print the N most expensive catalog queries (by the latest committed
BENCH_FULL record's per-query sweep timings), intersected with the live
catalog — the selection for the per-round sf0.1 ALLCHECK tier.

Scale-dependent divergence (overflow, spill, AQE plan changes) is
invisible at sf0.01; the expensive tail is where the heavy plans live,
so one tier up on exactly those queries closes the gap at minutes of
cost (VERDICT r10 #2). Usage::

    python tools/expensive_tail.py [N] [record.json]   # default 20

Pass the CURRENT round's just-snapshotted BENCH_FULL record explicitly —
round_finish.sh does — so the tier is derived from this round's own
timings; the latest-committed-record default can lag a round and drop a
query that newly entered the top-N (VERDICT r11: ``hard_negative_pairs``
slipped the r11 tier exactly this way).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shopify_etl_spark.plans import QUERIES  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if len(sys.argv) > 2:
        record = sys.argv[2]
    else:
        fulls = sorted(
            glob.glob(os.path.join(here, "BENCH_FULL_r*.json")),
            key=lambda p: int(re.search(r"_r0*(\d+)", p).group(1)),
        )
        if not fulls:
            print("no BENCH_FULL record found", file=sys.stderr)
            return 1
        record = fulls[-1]
    with open(record) as fh:
        rec = json.load(fh)
    timings = {
        k: v
        for k, v in rec.get("queries", {}).items()
        if k in QUERIES and isinstance(v, (int, float)) and v > 0
    }
    names = sorted(timings, key=lambda k: -timings[k])[:n]
    print(
        f"expensive tail from {os.path.basename(record)}: "
        + ", ".join(f"{k}={timings[k]}" for k in names),
        file=sys.stderr,
    )
    print(" ".join(names))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
