"""DQ checks catch injected violations exactly."""

from pyspark.sql import functions as F

from shopify_etl_spark.operators import validate


def test_checks_catch_injected_violations(spark):
    child = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (9, "orphan"), (None, "nullkey")],
        "k: long, v: string",
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk: long")

    dup = validate.unique_violations(child, ["k"]).collect()
    assert [(r.k, r.n_rows) for r in dup] == [(1, 2)]

    orphans = sorted(
        r.v for r in validate.referential_violations(child, parent, "k", "pk").collect()
    )
    # NULL keys can't match a parent — they are orphans too (reported, not hidden)
    assert orphans == ["nullkey", "orphan"]

    nulls = validate.null_violations(child, ["k"]).collect()
    assert [r.v for r in nulls] == ["nullkey"]

    bad = sorted(
        r.v
        for r in validate.accepted_values_violations(child, "v", ["a", "b", "c"]).collect()
    )
    assert bad == ["nullkey", "orphan"]

    report = {
        r.check_name: (r.n_violations, r.passed)
        for r in validate.dq_report(
            {
                "uniq": validate.unique_violations(child, ["k"]),
                "fk": validate.referential_violations(child, parent, "k", "pk"),
                "clean": validate.null_violations(parent, ["pk"]),
            }
        ).collect()
    }
    assert report == {"uniq": (1, False), "fk": (2, False), "clean": (0, True)}


def test_freshness_lag(spark):
    df = spark.createDataFrame(
        [("2024-05-01 10:00:00",), ("2024-05-01 11:00:00",)], "ts_s: string"
    ).select(F.col("ts_s").cast("timestamp").alias("ts"))
    row = validate.freshness_lag(
        df, "ts", F.to_timestamp(F.lit("2024-05-01 12:30:00"))
    ).collect()[0]
    assert row.lag_seconds == 90 * 60
