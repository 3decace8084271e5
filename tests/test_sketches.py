"""HLL sketch pre-aggregation: rollup commutes with sketching; exact
in the sparse regime."""

from pyspark.sql import functions as F

from shopify_etl_spark.operators import sketches
from shopify_etl_spark.plans.catalog import load_table


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.date_trunc("week", F.to_date("ts")).cast("date").alias("week_start"),
    )


def test_rollup_commutes_with_sketching(spark, sf_dir):
    """union(daily sketches) must estimate identically to sketching the
    week directly — the property that makes persisted sketch tables
    answer arbitrary rollups without raw-data access."""
    ev = _events(spark, sf_dir)
    daily = sketches.distinct_sketches(ev, "user_id", ["week_start", "day"])
    via_daily = {
        r.week_start: r.distinct_keys
        for r in sketches.rollup_distinct(daily, ["week_start"]).collect()
    }
    direct = {
        r.week_start: r.distinct_keys
        for r in sketches.rollup_distinct(
            sketches.distinct_sketches(ev, "user_id", ["week_start"]), ["week_start"]
        ).collect()
    }
    assert via_daily == direct


def test_sketch_exact_in_sparse_regime(spark, sf_dir):
    ev = _events(spark, sf_dir)
    exact = {
        r.week_start: r.n
        for r in ev.groupBy("week_start")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got = {
        r.week_start: int(r.distinct_keys)
        for r in sketches.rollup_distinct(
            sketches.distinct_sketches(ev, "user_id", ["week_start", "day"]),
            ["week_start"],
        ).collect()
    }
    assert got == exact

    # global rollup (no group): one number, still exact here
    total = sketches.rollup_distinct(
        sketches.distinct_sketches(ev, "user_id", ["day"]), []
    ).collect()[0].distinct_keys
    assert int(total) == ev.select("user_id").distinct().count()
