"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for correctness-at-scale first:

* **AQE on** (runtime coalescing, skew-join splitting, dynamic join
  strategy switch) — at 100 TB, static shuffle-partition counts are always
  wrong somewhere; AQE re-plans per stage from actual map output sizes.
* **UTC session timezone** — deterministic timestamp semantics across
  engines (the DuckDB oracle uses naive/UTC timestamps).
* **Arrow** for any pandas interchange (vectorized Pandas UDF path).
* ``spark.sql.shuffle.partitions`` defaults to the local core count; on a
  real cluster leave it high and let AQE coalesce.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "shopify-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with the engine's defaults."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Runtime bloom-filter join pruning: when one join side carries a
        # selective filter, Spark injects bloom_filter_agg on it and
        # pre-filters the big side's scan — rows that can't join never
        # shuffle. The application-side size gate stays at its 10 GB
        # default: it triggers exactly in the 100 TB regime it's built
        # for and stays out of the way on test data (tests that pin the
        # injection lower the gate explicitly).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Write timestamps as TIMESTAMP_MICROS, not legacy INT96: INT96
        # columns carry NO parquet min/max statistics, which silently
        # disables row-group/file skipping on every time predicate — for
        # a time-series fact table at scale that is the single most
        # important pruning dimension (tests/test_layout.py pins it).
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI_ENABLED", "false"))
        # FAIR scheduling: concurrent jobs (parallel staging threads, O1)
        # share executors instead of FIFO head-of-line blocking
        .config("spark.scheduler.mode", "FAIR")
        # read TIMESTAMP(NANOS) parquet as long (testdata events table);
        # also set dynamically in plans.catalog.load_table for sessions
        # not built by this factory (e.g. the driver's)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Parquet TIMESTAMP without isAdjustedToUTC reads as TIMESTAMP_NTZ
        # by default; read it as TimestampType instead so timestamp
        # literals/comparisons/windows behave uniformly and predicates
        # still push down to the scan unchanged. Session tz is UTC, so
        # the values are identical either way.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.maxResultSize", "4g")
        # local-mode driver == all executors: the 1g JVM default is sized
        # for a thin cluster driver, not a 32-thread local engine. Only
        # effective when this factory launches the JVM (ignored on an
        # already-running session, e.g. under an external driver).
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
