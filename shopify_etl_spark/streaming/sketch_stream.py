"""Streaming sketch maintenance: merge per-batch CMS grids into a
persisted frequency sketch.

The scale problem: "token/key frequencies over everything ingested so
far" as an exact table grows with the key space and needs a full
re-aggregation (or an ever-larger state store) per refresh. The
mergeable-sketch pattern keeps a FIXED-SIZE answer instead: each
micro-batch builds its own count-min grid — O(batch) work, width×depth
rows out — and cellwise-SUMs it into the persisted sketch
(``operators/sketches.py::cms_merge`` is associative and exact, so
batch-at-a-time merging equals sketching the whole history in one pass;
pinned in tests). Any key's running frequency estimate is then a
``cms_query`` probe against a table of at most width×depth rows, raw
history never re-read.

Exactly-once discipline matches the other foreachBatch sinks here
(near_dedup_stream): each epoch's contribution lands under an
``epoch=<id>`` subdirectory and replayed epochs are skipped, so crash
replays converge instead of double-counting — the property that matters
for a SUM-mergeable state, where a replayed increment is silent
corruption, not a visible duplicate row.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sketches


def _epoch_dir(base: str, epoch: int) -> str:
    return os.path.join(base, f"epoch={epoch}")


def _epoch_committed(spark: SparkSession, epoch_dir: str) -> bool:
    """True only if the epoch's write COMMITTED (``_SUCCESS`` present).

    Bare directory existence is not enough: Spark's output committer
    creates the target dir before committing task files, so a crash
    mid-write leaves the dir present but the grid partial or empty.
    Skipping such an epoch on replay would silently lose that batch's
    contribution to the SUM-merged sketch — the exact corruption the
    replay-skip exists to prevent. Checked via the Hadoop FS API so the
    discipline holds on any filesystem scheme, not just file://.
    """
    from ..pipeline.runner import _hadoop_fs

    fs, marker = _hadoop_fs(spark, os.path.join(epoch_dir, "_SUCCESS"))
    return bool(fs.exists(marker))


def stream_cms(
    feed: DataFrame,
    key_col: str,
    sketch_dir: str,
    checkpoint_dir: str,
    width: int = 2048,
    depth: int = 4,
    seed: int = 41,
):
    """Maintain a CMS over a streaming key column; returns the started query.

    The persisted layout is one parquet subdir per epoch holding that
    batch's grid; the CURRENT sketch is ``read_sketch`` (cellwise SUM over
    epochs — ≤ width×depth rows per epoch, and epochs can be compacted by
    rewriting their merge under a single epoch dir without changing any
    estimate, associativity again).
    """

    def merge_batch(batch: DataFrame, epoch: int) -> None:
        out = _epoch_dir(sketch_dir, epoch)
        spark = batch.sparkSession
        if _epoch_committed(spark, out):  # replayed AND committed — already merged
            return
        # mode("overwrite") below makes the rewrite of a partial epoch safe:
        # the uncommitted dir is replaced wholesale, never appended to.
        grid = sketches.cms_build(
            batch.select(key_col), key_col, width=width, depth=depth, seed=seed
        )
        grid.write.mode("overwrite").parquet(out)

    return (
        feed.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_sketch(spark: SparkSession, sketch_dir: str) -> DataFrame:
    """Current sketch = cellwise SUM across all epoch grids."""
    return (
        spark.read.parquet(sketch_dir)
        .groupBy("row", "cell")
        .agg(F.sum("c").alias("c"))
    )


def stream_distinct_sketches(
    feed: DataFrame,
    key_col: str,
    group_cols: list[str],
    sketch_dir: str,
    checkpoint_dir: str,
    lg_k: int = 14,
):
    """The HLL twin of :func:`stream_cms`: maintain per-group distinct-
    count sketches over a stream. Each micro-batch writes its own
    per-group HLL sketches under an epoch dir (O(batch) work, one row
    per group out); the running answer for any rollup is an
    ``hll_union_agg`` over the epoch sketches (:func:`read_distinct`) —
    union is associative and lossless w.r.t. sketch state, so the
    incremental answer EQUALS sketching the full history (pinned in
    tests, exact in the sparse regime). Same epoch-replay-skip
    discipline: a replayed union would be harmless for HLL (idempotent,
    unlike CMS sums) but skipping keeps the layout canonical.
    """

    def merge_batch(batch: DataFrame, epoch: int) -> None:
        out = _epoch_dir(sketch_dir, epoch)
        spark = batch.sparkSession
        if _epoch_committed(spark, out):
            return
        sketches.distinct_sketches(batch, key_col, group_cols, lg_k).write.mode(
            "overwrite"
        ).parquet(out)

    return (
        feed.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_distinct(
    spark: SparkSession, sketch_dir: str, group_cols: list[str],
    estimate_col: str = "distinct_keys",
) -> DataFrame:
    """Current distinct estimates = sketch-union rollup over all epochs."""
    return sketches.rollup_distinct(
        spark.read.parquet(sketch_dir), group_cols, estimate_col
    )
