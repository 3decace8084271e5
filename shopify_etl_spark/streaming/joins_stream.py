"""Stream-stream joins with watermark-bounded state.

The reference has no streaming joins (its attribution-style lookups are
daily batch SQL), but the click→purchase attribution its order pipeline
feeds (SURVEY §2.10 context) is the canonical stream-stream interval
join: match each purchase to clicks by the same user within an
attribution window, while BOTH sides are unbounded streams.

Scale shape: Spark keeps per-side join state keyed by ``user_id``; the
watermarks plus the time-range join condition let it derive an upper
bound on how long a row can still find a partner, so state is evicted
instead of growing with the stream (the unbounded-state trap of an
unconstrained stream-stream join). The equi-key ``user_id`` hashes the
state across executors — no broadcast, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Landing-feed contract: one JSON event per line, ISO-8601 timestamp.
EVENT_FEED_SCHEMA = "user_id BIGINT, event_id STRING, ts TIMESTAMP"


def stream_event_feed(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-landing event stream (schema declared, never inferred — same
    discipline as the batch envelope source)."""
    return spark.readStream.schema(EVENT_FEED_SCHEMA).json(src_dir)


def stream_click_purchase_join(
    spark: SparkSession,
    clicks_dir: str,
    purchases_dir: str,
    attribution_window: str = "30 minutes",
    watermark_delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Purchases joined to same-user clicks at most ``attribution_window``
    earlier — both sides streaming.

    * ``inner``: emits (click, purchase) as soon as both rows arrive.
    * ``left_outer`` (clicks side preserved): a click with no purchase in
      its window emits with null purchase columns — but only once the
      watermark passes the end of its window, because only then is "no
      partner" final. Un-closed windows stay pending; that is the
      correct streaming semantic, not a bug.

    State eviction needs BOTH watermarks and the two-sided time bound in
    the join condition; dropping either makes the state unbounded and
    Spark rejects outer modes outright.
    """
    clicks = (
        stream_event_feed(spark, clicks_dir)
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark_delay)
    )
    purchases = (
        stream_event_feed(spark, purchases_dir)
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark_delay)
    )
    cond = (
        (clicks["user_id"] == purchases["p_user_id"])
        & (purchases["purchase_ts"] >= clicks["click_ts"])
        & (
            purchases["purchase_ts"]
            <= clicks["click_ts"] + F.expr(f"INTERVAL {attribution_window}")
        )
    )
    return clicks.join(purchases, cond, how).select(
        "user_id", "click_id", "click_ts", "purchase_id", "purchase_ts"
    )
