"""Dimension history (SCD2) and incremental aggregate maintenance.

Two warehouse patterns every ETL engine is eventually asked for:

* ``scd2_history`` — turn a change/event log into a type-2 slowly-
  changing-dimension table (validity ranges per attribute value, runs of
  identical values compressed). The gaps-and-islands construction:
  change points via ``lag``, island ids via a running sum, one window +
  one aggregate — both over the same key partition, ONE shuffle.
* ``merge_rollup`` — maintain a combinable aggregate table from a new
  batch WITHOUT rescanning history: merge partial states
  (count/sum/min/max merge by algebra; avg derives from sum/count).
  The 100 TB story: a daily rollup over years of history only ever
  touches |groups| rows + the day's batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
) -> DataFrame:
    """SCD2 validity ranges from a change log: one row per RUN of equal
    ``attr_col`` values per key, with [valid_from, valid_to) bounds and
    an ``is_current`` flag on the open run.

    Consecutive duplicates compress into one row (an "update" that
    doesn't change the attribute doesn't open a new version). Ties on
    the timestamp break by the attribute value to keep the island
    assignment total and deterministic.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, attr_col)
    changed = (
        F.lag(attr_col).over(w).isNull()
        | (F.lag(attr_col).over(w) != F.col(attr_col))
    ).cast("long")
    islands = df.select(
        key_col,
        ts_col,
        attr_col,
        F.sum(changed).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("_island"),
    )
    runs = islands.groupBy(key_col, "_island").agg(
        F.min(F.col(attr_col)).alias(attr_col),  # constant within the island
        F.min(ts_col).alias("valid_from"),
        F.max(ts_col).alias("_last_seen"),
    )
    w2 = Window.partitionBy(key_col).orderBy("_island")
    return runs.select(
        key_col,
        attr_col,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


#: aggregate-state columns maintained by merge_rollup
_ROLLUP_STATE = ("n", "sum_v", "min_v", "max_v")


def rollup_state(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """Combinable per-group aggregate state (count/sum/min/max)."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_rollup(
    prev: DataFrame, batch_state: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Merge two rollup states: groups in both merge by algebra
    (n+n, sum+sum, min of mins, max of maxes); one-sided groups pass
    through. ``merge_rollup(rollup_state(A), rollup_state(B)) ==
    rollup_state(A ∪ B)`` exactly for count/min/max and up to FP
    addition order for sum — pinned in tests.

    Shape: full outer join on the group key (the two states are
    |groups|-sized, NOT corpus-sized) + one projection. History is
    never rescanned.
    """
    p = prev.select(
        *group_cols, *[F.col(c).alias(f"_p_{c}") for c in _ROLLUP_STATE]
    )
    b = batch_state.select(
        *group_cols, *[F.col(c).alias(f"_b_{c}") for c in _ROLLUP_STATE]
    )
    j = p.join(b, group_cols, "full_outer")
    return j.select(
        *group_cols,
        (F.coalesce("_p_n", F.lit(0)) + F.coalesce("_b_n", F.lit(0))).alias("n"),
        (
            F.coalesce("_p_sum_v", F.lit(0.0)) + F.coalesce("_b_sum_v", F.lit(0.0))
        ).alias("sum_v"),
        F.least(
            F.coalesce("_p_min_v", F.col("_b_min_v")),
            F.coalesce("_b_min_v", F.col("_p_min_v")),
        ).alias("min_v"),
        F.greatest(
            F.coalesce("_p_max_v", F.col("_b_max_v")),
            F.coalesce("_b_max_v", F.col("_p_max_v")),
        ).alias("max_v"),
    )
