"""Behavioral analytics over event streams: funnels and cohort retention.

The two queries every product-analytics engine ships natively
(Amplitude/Mixpanel-style); both compose from windows and grouped
aggregation in Spark with one shuffle on the user key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_stages(
    df: DataFrame,
    stages: tuple[str, ...],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel conversion: how many users performed stage 1, then
    stage 2 AFTER their first stage-1 event, then stage 3 after that, …

    Per user, the entry time of stage k is the MIN event time of type k
    at-or-after the stage k-1 entry — computed stage by stage with
    conditional aggregates over ONE user-partitioned window (single
    shuffle; each stage adds a window pass, not a join). Output is one
    row per stage with reached-user counts and the conversion rate vs
    stage 1 — monotonically non-increasing by construction.
    """
    w = Window.partitionBy(user_col)
    out = df.select(user_col, type_col, ts_col)
    prev_entry = None
    entry_cols = []
    for i, stage in enumerate(stages):
        cond = F.col(type_col) == stage
        if prev_entry is not None:
            cond = cond & (F.col(ts_col) >= F.col(prev_entry))
        entry = f"_entry_{i}"
        out = out.withColumn(entry, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev_entry = entry
        entry_cols.append(entry)

    per_user = out.groupBy(user_col).agg(
        *[F.min(c).alias(c) for c in entry_cols]
    )
    counts = per_user.agg(
        *[
            F.count(F.col(c)).cast("long").alias(f"_n_{i}")
            for i, c in enumerate(entry_cols)
        ]
    )
    rows = [
        F.struct(
            F.lit(i + 1).cast("long").alias("stage"),
            F.lit(stage).alias("event_type"),
            F.col(f"_n_{i}").alias("n_users"),
            F.round(F.col(f"_n_{i}") / F.col("_n_0"), 4).alias("conversion"),
        )
        for i, stage in enumerate(stages)
    ]
    return counts.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_weeks: int | None = None,
) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their FIRST
    event; for each (cohort_week, week_offset) the number of distinct
    cohort members active that week.

    First-event week comes from a user-partitioned window (no join back);
    the triangle aggregates with map-side combine on
    (cohort_week, offset) — output is cohorts × offsets, independent of
    event volume. Offsets are whole 7-day buckets from the cohort week's
    start (date arithmetic, engine-portable).
    """
    w = Window.partitionBy(user_col)
    base = df.select(
        user_col,
        F.to_date(ts_col).alias("_day"),
    ).withColumn("_first_day", F.min("_day").over(w))
    cohorted = base.select(
        user_col,
        F.date_trunc("week", "_first_day").cast("date").alias("cohort_week"),
        (
            F.datediff(
                F.date_trunc("week", "_day").cast("date"),
                F.date_trunc("week", "_first_day").cast("date"),
            )
            / 7
        )
        .cast("long")
        .alias("week_offset"),
    )
    if max_weeks is not None:
        cohorted = cohorted.filter(F.col("week_offset") <= max_weeks)
    return cohorted.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct(user_col).cast("long").alias("n_active")
    )
