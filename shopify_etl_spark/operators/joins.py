"""Temporal join operators Spark's DataFrame API lacks as primitives.

``asof_join_backward`` — for each left row, attach the single most recent
right row with the same key and ``right.ts <= left.ts`` (the financial
"ASOF JOIN"; DuckDB/kdb have it natively, Spark does not).

Implementation is the scalable union+window pattern, NOT a range join:
tag both sides, union, one window per key ordered by (ts, side) carrying
``last(right_payload_struct, ignorenulls=True)`` forward, then keep left
rows. Cost: one shuffle + sort over |L|+|R| rows — no range-condition
row explosion, no per-row subqueries. At 100 TB both sides shuffle once
on the key, exactly like a regular sort-merge join.

The payload is carried as ONE struct, not per-column ``last`` calls —
independent per-column carries could stitch fields from different right
rows when some payload values are null.

Ties: a right row at exactly left.ts is eligible (sorts before the left
row via the side tag), matching DuckDB's ``ON l.ts >= r.ts`` semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join: every left row + the latest right payload at or
    before its timestamp (nulls when no prior right row exists).

    ``payload_cols`` are the right-side columns to carry; left columns
    pass through unchanged.

    Null keys: SQL ASOF equality never matches NULL = NULL, but a window
    ``partitionBy`` groups all NULL keys together — without a guard, a
    null-key left row could pick up a null-key right payload. Null-key
    right rows are dropped (they can match nothing); null-key left rows
    pass through with a null payload.
    """
    payload_struct = F.struct(*payload_cols)
    right = right.filter(F.col(on).isNotNull())
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast("struct<>").alias("_left_placeholder"),
        payload_struct.alias("_payload"),
    ).drop("_left_placeholder")
    r_payload_type = r_tag.schema["_payload"].dataType
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts AFTER right at equal ts
        F.struct(*left.columns).alias("_left"),
        F.lit(None).cast(r_payload_type).alias("_payload"),
    )
    r_full = r_tag.withColumn(
        "_left", F.lit(None).cast(l_tag.schema["_left"].dataType)
    ).select("_k", "_ts", "_side", "_left", "_payload")
    unioned = r_full.unionByName(l_tag.select("_k", "_ts", "_side", "_left", "_payload"))
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_side",
        "_left",
        F.last("_payload", ignorenulls=True).over(w).alias("_p"),
    )
    out = carried.filter(F.col("_side") == 1)
    return out.select("_left.*", *[F.col("_p").getField(c).alias(c) for c in payload_cols])


def range_join_window(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """Bounded-window range join: pairs (l, r) sharing ``on`` with
    ``l.ts < r.ts <= l.ts + window``.

    Naive formulations (key equi-join + range post-filter) degrade to
    per-key cross products when keys are dense. Here both sides bucket
    time by the window width; a qualifying right row is always in the
    left row's bucket or the next one, so the left side fans out to two
    (key, bucket) rows and the join becomes a plain equi-join on
    (key, bucket) + an exact range filter — candidate pairs are bounded
    by bucket co-residency, not per-key row counts.
    """
    bucket = lambda c: F.floor(F.unix_micros(F.col(c)) / (window_seconds * 1_000_000))  # noqa: E731
    l_b = left.withColumn(
        "_bucket", F.explode(F.array(bucket(left_ts), bucket(left_ts) + 1))
    )
    r_b = right.withColumn("_bucket", bucket(right_ts))
    joined = l_b.join(r_b, [on, "_bucket"])
    in_window = (F.col(right_ts) > F.col(left_ts)) & (
        F.unix_micros(F.col(right_ts))
        <= F.unix_micros(F.col(left_ts)) + window_seconds * 1_000_000
    )
    return joined.filter(in_window).drop("_bucket")
