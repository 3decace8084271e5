"""Sketch-based join advisor: recommend a join strategy WITHOUT running
the join.

Combines the engine's two planner estimators over fixed-size summaries:

* ``cms_inner_product`` — how many PAIRS the equi-join will emit
  (pair-explosion guard: a join that multiplies rows wants staging or
  pre-aggregation, not a bigger cluster);
* ``hll_overlap`` — how many KEYS participate on each side and in the
  intersection (selectivity: a tiny overlap favors a semi-join
  pre-filter before the wide join);
* a CMS skew read — the hottest cell against the uniform expectation
  (a hot key wants salting / AQE skew handling).

Usage::

    python tools/join_advisor.py [sf_dir] tableA keyA tableB keyB [--check]

``--check`` also runs the exact join count to verify the estimates
(defeats the purpose at scale — it exists for demonstrating the bounds
hold on the test data).

Example (the attribution join)::

    python tools/join_advisor.py /root/testdata/sf0.01 \
        "events[event_type=click]" user_id "events[event_type=purchase]" user_id
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from shopify_etl_spark.operators import sketches  # noqa: E402
from shopify_etl_spark.plans.catalog import load_table  # noqa: E402
from shopify_etl_spark.session import get_spark  # noqa: E402

WIDTH, DEPTH = 2048, 4
BROADCAST_ROWS = 1_000_000  # ~the 64 MB threshold for narrow key tables


def _load(spark, sf_dir: str, spec: str):
    """``table`` or ``table[col=value]`` → filtered DataFrame."""
    m = re.fullmatch(r"(\w+)(?:\[(\w+)=([^\]]+)\])?", spec)
    if not m:
        raise SystemExit(f"bad table spec {spec!r}")
    df = load_table(spark, sf_dir, m.group(1))
    if m.group(2):
        df = df.filter(F.col(m.group(2)) == m.group(3))
    return df


def advise(spark, a, key_a: str, b, key_b: str, check: bool = False) -> dict:
    a = a.filter(F.col(key_a).isNotNull()).select(F.col(key_a).alias("k"))
    b = b.filter(F.col(key_b).isNotNull()).select(F.col(key_b).alias("k"))
    a = a.localCheckpoint(eager=False)
    b = b.localCheckpoint(eager=False)

    rows_a, rows_b = a.count(), b.count()
    sa = sketches.cms_build(a, "k", width=WIDTH, depth=DEPTH)
    sb = sketches.cms_build(b, "k", width=WIDTH, depth=DEPTH)
    est_pairs = sketches.cms_inner_product(sa, sb).collect()[0]["join_size_est"]
    ov = sketches.hll_overlap(a, b, "k").collect()[0]

    # CMS skew read: hottest cell (min across depth rows of each cell's
    # max is a safer upper-ish read; use max-of-min over rows' maxima)
    hot = (
        sa.groupBy("row").agg(F.max("c").alias("m"))
        .agg(F.min("m").alias("hot")).collect()[0]["hot"]
    ) or 0
    uniform = max(rows_a / WIDTH, 1.0)
    skew_ratio = round(hot / uniform, 1)

    fanout = est_pairs / max(min(rows_a, rows_b), 1)
    overlap_frac = ov["est_overlap"] / max(min(ov["est_a"], ov["est_b"]), 1.0)

    recs = []
    if min(rows_a, rows_b) <= BROADCAST_ROWS:
        small = "A" if rows_a <= rows_b else "B"
        recs.append(f"broadcast side {small} ({min(rows_a, rows_b):,} rows)")
    else:
        recs.append("shuffle join (neither side broadcastable); consider "
                    "bucketed layout if this join repeats")
    if fanout > 3:
        recs.append(
            f"pair fan-out ~{fanout:.1f}x the smaller side — pre-aggregate "
            "or stage; the join multiplies rows"
        )
    if overlap_frac < 0.3:
        recs.append(
            f"only ~{overlap_frac:.0%} of the smaller key set joins — "
            "semi-join pre-filter the bigger side first"
        )
    if skew_ratio > 20:
        recs.append(
            f"hot key ~{skew_ratio}x uniform — salt the key or rely on "
            "AQE skew-join"
        )

    out = {
        "rows_a": rows_a,
        "rows_b": rows_b,
        "est_join_rows": est_pairs,
        "est_distinct_a": round(ov["est_a"]),
        "est_distinct_b": round(ov["est_b"]),
        "est_key_overlap": round(ov["est_overlap"]),
        "cms_skew_ratio": skew_ratio,
        "recommendations": recs,
    }
    if check:
        ca = a.groupBy("k").count().withColumnRenamed("count", "na")
        cb = b.groupBy("k").count().withColumnRenamed("count", "nb")
        true = (
            ca.join(cb, "k").agg(F.sum(F.col("na") * F.col("nb")).alias("t"))
            .collect()[0]["t"] or 0
        )
        out["true_join_rows"] = true
        out["estimate_lower_bound_holds"] = bool(est_pairs >= true)
    return out


def main() -> int:
    args = [x for x in sys.argv[1:] if x != "--check"]
    check = "--check" in sys.argv
    if len(args) == 4:
        sf_dir, rest = "/root/testdata/sf0.01", args
    elif len(args) == 5:
        sf_dir, rest = args[0], args[1:]
    else:
        print(__doc__)
        return 2
    spec_a, key_a, spec_b, key_b = rest
    spark = get_spark("join-advisor", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    a = _load(spark, sf_dir, spec_a)
    b = _load(spark, sf_dir, spec_b)
    print(json.dumps(advise(spark, a, key_a, b, key_b, check=check)))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
