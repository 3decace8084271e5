"""Global row numbering at scale.

``ROW_NUMBER() OVER (ORDER BY k)`` with no PARTITION BY collapses the
whole dataset into ONE task — the classic silent scale killer (fine at
sf0.01, dead at 100 TB). The distributed shape: range-partition on the
order key (partition p holds ranks strictly after partition p-1), rank
within each partition in parallel, then add per-partition offsets — the
offsets are a num_partitions-sized driver fold, the only driver-side
data this operator touches.

Training-data use: stable contiguous example ids after a deterministic
sort (the ids depend only on the global order of the unique key, not on
where the sampled range boundaries land).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_numbers(
    df: DataFrame,
    order_col: str,
    out_col: str = "global_idx",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense 1-based global row numbers by ``order_col`` (must be unique —
    ties would make the numbering depend on physical placement).

    One range-exchange + one per-partition sort; no single-task stage.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint pins the range partitioning: RangePartitioner samples
    # boundaries with an RDD-id-dependent seed, so WITHOUT materialization
    # the counts job and the final job could partition DIFFERENTLY and the
    # offsets would be wrong (caught by test — not a theoretical risk).
    # Two-pass algorithms must freeze the first pass.
    parts = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["_pid"]: r["c"]
        for r in parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_expr = F.element_at(
        F.create_map(
            *[F.lit(v) for kv in offsets.items() for v in kv]
        ),
        F.col("_pid"),
    )
    w = Window.partitionBy("_pid").orderBy(order_col)
    return (
        parts.withColumn(
            out_col, (F.row_number().over(w) + offset_expr).cast("long")
        )
        .drop("_pid")
    )
