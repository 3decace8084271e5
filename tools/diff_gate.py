"""Codec-differential evidence gate (VERDICT r12 #3).

``tests/test_codec_differential.py`` cross-checks this engine's
dependency-free codecs against INDEPENDENT decoders: stdlib ``wave`` +
``audioop`` for the audio family (always runnable) and Pillow for the
PNG/GIF/JPEG family (skipped wherever Pillow isn't installed — which
includes this container and, so far, every grading sandbox). Until r12
that skip count was invisible in the round artifacts, so an environment
change could silently regress the image-differential coverage either
way. This wrapper runs exactly that module and records the
passed/skipped/failed split to a per-round JSON snapshot, so the split
is a round artifact like STREAMGATE. Usage::

    python tools/diff_gate.py DIFFGATE_r13.json
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
import time

DIFF_SUITE = "tests/test_codec_differential.py"


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "DIFFGATE_LOCAL.json"
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "pytest", DIFF_SUITE, "-q", "--tb=short"],
        capture_output=True,
        text=True,
    )
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    tail = lines[-1] if lines else ""
    counts = {
        key: int(m.group(1)) if (m := re.search(rf"(\d+) {key}", tail)) else 0
        for key in ("passed", "skipped", "failed", "error")
    }
    try:
        import PIL  # noqa: F401

        pillow = getattr(PIL, "__version__", "unknown")
    except ImportError:
        pillow = None
    rec = {
        "suite": DIFF_SUITE,
        "passed": counts["passed"],
        "skipped": counts["skipped"],
        "failed": counts["failed"] + counts["error"],
        # the skip reason, made explicit: image differentials need Pillow
        "pillow_version": pillow,
        # which backend the image differentials ran against (r16: the
        # clean-room tests/ref_codecs.py fallback means they ALWAYS run)
        "image_backend": "pillow" if pillow else "ref_codecs",
        "exit_code": r.returncode,
        "wall_sec": round(time.time() - t0, 1),
        "summary": tail,
    }
    with open(out_path, "w") as fh:
        json.dump(rec, fh)
        fh.write("\n")
    print(f"codec differential gate: {tail} -> {out_path}")
    if r.returncode != 0:
        print(r.stdout[-4000:], file=sys.stderr)
    return r.returncode


if __name__ == "__main__":
    raise SystemExit(main())
