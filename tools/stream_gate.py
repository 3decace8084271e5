"""Streaming evidence gate for the round artifact chain (VERDICT r10 #5).

The 11 modules in ``shopify_etl_spark/streaming/`` are pinned by the
batch-equivalence + crash-injection suites; until r11 their status rode
invisibly on "the full suite is green". This wrapper runs exactly those
suites as a tagged step and records pass/fail counts to a per-round JSON
snapshot, so the streaming layer's health is a round artifact like
ALLCHECK. Usage::

    python tools/stream_gate.py STREAMGATE_r11.json
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
import time

#: The streaming evidence set: the structured-streaming batch-equivalence
#: suite (watermarks, windows, exactly-once, stream-stream joins, sketch/
#: span/dedup epoch stores) and the stateful-skew crash-injection tests.
STREAM_SUITES = ["tests/test_streaming.py", "tests/test_stateful_skew.py"]


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "STREAMGATE_LOCAL.json"
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "pytest", *STREAM_SUITES, "-q", "--tb=short"],
        capture_output=True,
        text=True,
    )
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    tail = lines[-1] if lines else ""
    counts = {
        key: int(m.group(1)) if (m := re.search(rf"(\d+) {key}", tail)) else 0
        for key in ("passed", "failed", "error")
    }
    rec = {
        "suites": STREAM_SUITES,
        "passed": counts["passed"],
        "failed": counts["failed"] + counts["error"],
        "exit_code": r.returncode,
        "wall_sec": round(time.time() - t0, 1),
        "summary": tail,
    }
    with open(out_path, "w") as fh:
        json.dump(rec, fh)
        fh.write("\n")
    print(f"streaming gate: {tail} -> {out_path}")
    if r.returncode != 0:
        print(r.stdout[-4000:], file=sys.stderr)
    return r.returncode


if __name__ == "__main__":
    raise SystemExit(main())
