"""Time-series resampling over event streams.

Gap-filling (a row for EVERY period in a key's active span, zero-filled
where nothing happened) is what turns raw event logs into regular
time-series for rate/trend analysis — SQL engines grow ASOF/range
features for it; in Spark it composes from ``sequence`` + ``explode``
with the observed counts carried alongside as a map, so the fill needs
NO join back against the aggregated data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resample_daily(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = None,
) -> DataFrame:
    """Daily counts per key with gap days zero-filled across each key's
    [min_day, max_day] span.

    Shape: groupBy(key, day) count → groupBy(key) packs the observed
    days into a map and takes the span bounds → ``explode(sequence())``
    regenerates the full calendar → ``element_at`` fills from the map.
    Two shuffles on the key (both with map-side partial aggregation);
    the generated calendar rows are never joined, just looked up in the
    carried map — for a key active over Y years that map is ≤ 366·Y
    entries, bounded and local.

    With ``value_col`` the fill also carries ROUND(SUM(value), 2) per
    day (0.0 on gap days).
    """
    day = F.to_date(ts_col).alias("day")
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 2).alias("sum_value"))
    per_day = df.groupBy(key_col, day).agg(*aggs)

    payload = (
        F.struct("n_events", "sum_value") if value_col else F.struct("n_events")
    )
    packed = per_day.groupBy(key_col).agg(
        F.min("day").alias("_lo"),
        F.max("day").alias("_hi"),
        F.map_from_entries(F.collect_list(F.struct(F.col("day"), payload))).alias(
            "_m"
        ),
    )
    cal = packed.select(
        key_col,
        F.explode(F.sequence("_lo", "_hi")).alias("day"),
        "_m",
    )
    got = F.element_at("_m", F.col("day"))
    cols = [
        key_col,
        "day",
        F.coalesce(got["n_events"], F.lit(0)).cast("long").alias("n_events"),
    ]
    if value_col is not None:
        cols.append(
            F.coalesce(got["sum_value"], F.lit(0.0)).alias("sum_value")
        )
    return cal.select(*cols)
