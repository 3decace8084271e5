"""Global row numbering: parallel plan, exact numbering."""

from pyspark.sql import functions as F

from shopify_etl_spark.operators.indexing import global_row_numbers


def test_global_row_numbers_exact_and_parallel(spark):
    df = spark.range(0, 10007).select(
        (F.col("id") * 2654435761 % 99991).alias("k")
    ).distinct()
    out = global_row_numbers(df, "k", num_partitions=8)
    rows = sorted((r.k, r.global_idx) for r in out.collect())
    assert [g for _, g in rows] == list(range(1, len(rows) + 1))
    assert [k for k, _ in rows] == sorted(k for k, _ in rows)

    # the ranking window must NOT collapse to a single partition
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
