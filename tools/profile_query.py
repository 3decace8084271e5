"""Per-stage empirical profile for catalog queries (guide §1.1/§7.1).

Runs each named query once (noop sink, bench-identical session but with
the UI enabled) and prints the stage-level breakdown from the UI REST
API: per-stage wall time, task count, input/shuffle-read/shuffle-write
bytes, and the job count — the witnesses that say WHERE a multi-second
query spends its time (many small sequential jobs vs one shuffle-bound
stage vs Python eval).

Usage::

    python tools/profile_query.py QUERY [QUERY ...] [--warm N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shopify_etl_spark.plans.catalog import QUERIES  # noqa: E402
from shopify_etl_spark.session import get_spark  # noqa: E402


def _api(port: int, app_id: str, path: str):
    url = f"http://localhost:{port}/api/v1/applications/{app_id}{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--warm", type=int, default=1,
                    help="untimed warm runs before the profiled run")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "profile-query",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
        extra_conf={"spark.ui.enabled": "true"},
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    app_id = sc.applicationId
    port = int(sc.uiWebUrl.rsplit(":", 1)[1]) if sc.uiWebUrl else 4040

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # pool pre-warm like bench.py
    def _touch(it):
        import pandas  # noqa: F401
        yield from it

    spark.range(320, numPartitions=32).mapInPandas(_touch, "id long").write \
        .format("noop").mode("overwrite").save()

    for name in args.queries:
        spec = QUERIES[name]
        for _ in range(args.warm):
            try:
                noop(spec.builder(spark, args.sf))
            except Exception as e:  # noqa: BLE001
                print(f"{name}: WARM ERROR {e}")
                break
            for rdd in sc._jsc.getPersistentRDDs().values():
                rdd.unpersist(False)
            spark.catalog.clearCache()

        jobs_before = {j["jobId"] for j in _api(port, app_id, "/jobs")}
        stages_before = {s["stageId"] for s in _api(port, app_id, "/stages")}
        t0 = time.time()
        noop(spec.builder(spark, args.sf))
        wall = time.time() - t0
        for rdd in sc._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
        spark.catalog.clearCache()

        jobs = [j for j in _api(port, app_id, "/jobs")
                if j["jobId"] not in jobs_before]
        stages = [s for s in _api(port, app_id, "/stages")
                  if s["stageId"] not in stages_before]
        stages.sort(key=lambda s: s.get("submissionTime", ""))
        stage_sum = 0.0
        rows = []
        for s in stages:
            try:
                sub = s.get("submissionTime")
                comp = s.get("completionTime")
                dur = (
                    time.mktime(time.strptime(comp[:19], "%Y-%m-%dT%H:%M:%S"))
                    + float(comp[20:23]) / 1e3
                    - time.mktime(time.strptime(sub[:19], "%Y-%m-%dT%H:%M:%S"))
                    - float(sub[20:23]) / 1e3
                ) if sub and comp else -1
            except Exception:  # noqa: BLE001
                dur = -1
            stage_sum += max(dur, 0)
            rows.append((dur, s))
        print(f"\n=== {name}: wall {wall:.2f}s, {len(jobs)} jobs, "
              f"{len(stages)} stages (sum of stage walls "
              f"{stage_sum:.2f}s; gaps = driver/plan time)")
        rows.sort(key=lambda r: -r[0])
        for dur, s in rows[:14]:
            nm = s.get("name", "")[:70].replace("\n", " ")
            print(
                f"  {dur:6.2f}s  tasks={s.get('numCompleteTasks', '?'):>3} "
                f"in={s.get('inputBytes', 0)/1e6:7.1f}MB "
                f"sr={s.get('shuffleReadBytes', 0)/1e6:6.1f}MB "
                f"sw={s.get('shuffleWriteBytes', 0)/1e6:6.1f}MB  {nm}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
