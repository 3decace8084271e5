"""Isolation re-measurement for bench regressions (the r7-proven protocol).

Usage::

    python tools/isolate_query.py QUERY [QUERY ...] [--runs N]
        [--prefix q1,q2,...]   # deliberately polluted prefix (1 run each)

Runs each named catalog query N times on a FRESH bench-identical session
(sf from $SPARK_GRAFT_SF_DIR, default sf0.1; local[$SPARK_GRAFT_CPUS]),
releasing persisted blocks between runs exactly like bench.py, and prints
per-run wall time, loadavg at run start, and the persisted-RDD count
after release — the witnesses that separate "this query got slower" from
"the machine was busy" and "state leaked across the sweep".
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shopify_etl_spark.plans.catalog import QUERIES  # noqa: E402
from shopify_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--prefix", default="")
    ap.add_argument(
        "--settle", type=int, default=0,
        help="seconds to sleep after the prefix before measuring — "
        "separates 'trailing async churn from the sweep' from "
        "'accumulated in-session state'",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "shopify-etl-spark-isolate",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    def release() -> int:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
        spark.catalog.clearCache()
        return len(spark.sparkContext._jsc.getPersistentRDDs())

    def run_once(name: str) -> float:
        t0 = time.time()
        QUERIES[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.time() - t0, 3)

    # bench-identical warm-up
    run_once("q1_pricing_summary")
    release()

    def gc_millis() -> int:
        """Cumulative JVM GC time across all collectors."""
        beans = spark._jvm.java.lang.management.ManagementFactory \
            .getGarbageCollectorMXBeans()
        return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))

    def heap_mb() -> int:
        rt = spark._jvm.java.lang.Runtime.getRuntime()
        return int((rt.totalMemory() - rt.freeMemory()) / 1e6)

    def py_workers() -> int:
        """pyspark daemon/worker process count (pool growth witness)."""
        n = 0
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as fh:
                    if b"pyspark.daemon" in fh.read():
                        n += 1
            except OSError:
                pass
        return n

    if args.prefix:
        names = [n for n in args.prefix.split(",") if n]
        t0 = time.time()
        for n in names:
            run_once(n)
            release()
        print(f"prefix: {len(names)} queries in {time.time() - t0:.1f}s "
              f"heap={heap_mb()}MB gc={gc_millis()}ms workers={py_workers()}")
    if args.settle:
        time.sleep(args.settle)
        print(f"settled {args.settle}s: load1={os.getloadavg()[0]:.2f} "
              f"heap={heap_mb()}MB workers={py_workers()}")

    for name in args.queries:
        for i in range(args.runs):
            load = round(os.getloadavg()[0], 2)
            g0 = gc_millis()
            secs = run_once(name)
            gd = gc_millis() - g0
            left = release()
            extra = ""
            try:
                from shopify_etl_spark.operators.clustering import (
                    LAST_FIT_TIMINGS,
                )

                if LAST_FIT_TIMINGS:
                    extra = f" kmeans_fit={LAST_FIT_TIMINGS}"
            except ImportError:
                pass
            print(
                f"{name} run{i}: {secs}s load1={load} gc_delta={gd}ms "
                f"heap={heap_mb()}MB workers={py_workers()} "
                f"rdds_after_release={left}{extra}",
                flush=True,
            )

    spark.stop()


if __name__ == "__main__":
    main()
