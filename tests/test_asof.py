"""As-of join edge cases: no-prior-match nulls, equal-ts inclusion,
payload-struct integrity (fields must come from ONE right row)."""

from datetime import datetime

from shopify_etl_spark.operators.joins import asof_join_backward


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "p1"),  # after r1, before r2
            (1, _ts("2024-01-01T12:00:00"), "p2"),  # exactly at r2 → matches r2
            (1, _ts("2024-01-01T08:00:00"), "p0"),  # before any right row → nulls
            (2, _ts("2024-01-01T10:00:00"), "p3"),  # key with no right rows at all
        ],
        ["user_id", "p_ts", "purchase"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), "c1", 10.0),
            (1, _ts("2024-01-01T12:00:00"), "c2", None),  # null value field
        ],
        ["user_id", "c_ts", "click", "value"],
    )
    out = {
        r.purchase: (r.click, r.value)
        for r in asof_join_backward(
            left, right, on="user_id", left_ts="p_ts", right_ts="c_ts",
            payload_cols=["click", "value"],
        ).collect()
    }
    assert out["p0"] == (None, None)  # nothing at or before
    assert out["p1"] == ("c1", 10.0)
    # equal-ts right row is eligible; its null value must NOT be stitched
    # with c1's 10.0 (single-struct carry, not per-column last)
    assert out["p2"] == ("c2", None)
    assert out["p3"] == (None, None)  # key absent from right


def test_asof_null_keys_never_match(spark):
    """SQL ASOF equality never matches NULL = NULL: a null-key left row
    must pass through with a null payload, never pick up a null-key right
    row (window partitionBy groups NULLs together without the guard)."""
    left = spark.createDataFrame(
        [
            (None, _ts("2024-01-01T10:00:00"), "p_null"),
            (1, _ts("2024-01-01T10:00:00"), "p_one"),
        ],
        "user_id: int, p_ts: timestamp, purchase: string",
    )
    right = spark.createDataFrame(
        [
            (None, _ts("2024-01-01T09:00:00"), "c_null"),
            (1, _ts("2024-01-01T09:00:00"), "c_one"),
        ],
        "user_id: int, c_ts: timestamp, click: string",
    )
    out = {
        r.purchase: r.click
        for r in asof_join_backward(
            left, right, on="user_id", left_ts="p_ts", right_ts="c_ts",
            payload_cols=["click"],
        ).collect()
    }
    assert out == {"p_null": None, "p_one": "c_one"}


def test_asof_preserves_left_cardinality(spark, sf_dir):
    from pyspark.sql import functions as F

    from shopify_etl_spark.plans.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("purchase_id")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("click_id")
    )
    joined = asof_join_backward(
        purchases, clicks, "user_id", "p_ts", "c_ts", ["click_id"]
    )
    assert joined.count() == purchases.count()  # exactly one row per left row


def test_range_join_equals_naive(spark, sf_dir):
    from pyspark.sql import functions as F

    from shopify_etl_spark.operators.joins import range_join_window
    from shopify_etl_spark.plans.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    a = ev.filter("event_type = 'purchase'").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("pid")
    )
    b = ev.filter("event_type = 'error'").select(
        "user_id", F.col("ts").alias("e_ts"), F.col("event_id").alias("eid")
    )
    bucketed = range_join_window(a, b, "user_id", "p_ts", "e_ts", 1800)
    naive = a.join(b, "user_id").filter(
        (F.col("e_ts") > F.col("p_ts"))
        & (F.unix_micros("e_ts") <= F.unix_micros("p_ts") + 1800 * 1_000_000)
    )
    got = sorted((r.pid, r.eid) for r in bucketed.collect())
    want = sorted((r.pid, r.eid) for r in naive.collect())
    assert got == want and len(got) > 0
