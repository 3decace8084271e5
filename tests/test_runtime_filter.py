"""Runtime bloom-filter join pruning (session.py default).

The factory enables ``spark.sql.optimizer.runtime.bloomFilter.enabled``;
the 10 GB application-side gate means it engages only at real scale, so
the test lowers the gate to prove the injection actually happens on this
build and that results are unchanged by the rewrite.
"""

from pyspark.sql import functions as F


def test_bloom_runtime_filter_injected_and_result_unchanged(spark, tmp_path):
    big_p, dim_p = str(tmp_path / "big"), str(tmp_path / "dim")
    spark.range(0, 200000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    ).write.parquet(big_p)
    spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("f")
    ).write.parquet(dim_p)

    saved = {
        c: spark.conf.get(c, None)
        for c in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # open the size gate (local data is far under the 10 GB default)
        # and force a shuffle join — bloom pruning targets exactly the
        # non-broadcast case
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        big = spark.read.parquet(big_p)
        dim = spark.read.parquet(dim_p).filter("f = 3")  # selective creation side
        j = big.join(dim, "k")
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan
        n_pruned = j.count()
    finally:
        for c, v in saved.items():
            if v is None:
                spark.conf.unset(c)
            else:
                spark.conf.set(c, v)

    n_plain = (
        spark.read.parquet(big_p)
        .join(spark.read.parquet(dim_p).filter("f = 3"), "k")
        .count()
    )
    assert n_pruned == n_plain
