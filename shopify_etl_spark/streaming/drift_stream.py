"""Streaming distribution-drift monitoring: merge per-batch value
histograms into a persisted store and score PSI from it.

The fixed-range per-segment histogram (``operators/stats.py::
value_histogram``) is SUM-mergeable — counts over disjoint batches add
— so it rides the sketch store's epoch machinery exactly like the CMS
grid and the DSIR model: one ≤ segments×buckets parquet dir per epoch,
``_SUCCESS``-gated replay, bucket-keyed SUM read, rename-publish
compaction. The fixed bucket edges are what make epochs comparable at
all — a quantile-edged histogram re-fitted per batch could not be
merged OR compared, which is the same reason the batch operator
refuses data-dependent edges.

Operationally: the DQ dashboard's drift score for "everything ingested
so far" (or any compacted window) reads segments×buckets rows, never
raw history, and stays current at O(batch) per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.stats import psi_from_histogram, value_histogram
from .sketch_stream import (
    _epoch_committed,
    _epoch_dir,
    check_store_pairing,
    compact_sketch_epochs,
    live_grid_dirs,
)


def _merge_hists(df: DataFrame) -> DataFrame:
    return df.groupBy("seg", "bucket").agg(F.sum("n_sb").alias("n_sb"))


def stream_value_histogram(
    feed: DataFrame,
    hist_dir: str,
    checkpoint_dir: str,
    value_col: str = "value",
    segment_col: str = "event_type",
    lo: float = 0.0,
    hi: float = 500.0,
    n_buckets: int = 20,
):
    """Maintain per-segment value histograms over a stream; returns the
    started query. Same store/replay contract as ``stream_cms``."""

    def merge_batch(batch: DataFrame, epoch: int) -> None:
        out = _epoch_dir(hist_dir, epoch)
        spark = batch.sparkSession
        check_store_pairing(spark, hist_dir, checkpoint_dir, epoch)
        if _epoch_committed(spark, out):
            return
        hist = value_histogram(batch, value_col, segment_col, lo, hi, n_buckets)
        hist.write.mode("overwrite").parquet(out)

    return (
        feed.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_histogram(spark: SparkSession, hist_dir: str) -> DataFrame:
    """Current histogram = bucket-keyed SUM across the live epoch dirs."""
    dirs = live_grid_dirs(spark, hist_dir)
    if not dirs:
        raise FileNotFoundError(f"no committed histogram epochs under {hist_dir}")
    return _merge_hists(spark.read.parquet(*dirs))


def read_psi(
    spark: SparkSession,
    hist_dir: str,
    segment_col: str = "event_type",
    n_buckets: int = 20,
    alpha: float = 0.5,
) -> DataFrame:
    """PSI per segment over everything the store has ingested — the
    exact score the batch operator produces on the same rows (shared
    ``psi_from_histogram`` core; equality pinned in tests)."""
    return psi_from_histogram(
        read_histogram(spark, hist_dir), segment_col, n_buckets, alpha
    )


def compact_histogram_epochs(spark: SparkSession, hist_dir: str) -> str | None:
    """Fold all-but-newest histogram epochs into one ``compact=`` dir
    (bucket-keyed SUM — associative, so no PSI changes)."""
    return compact_sketch_epochs(spark, hist_dir, merge=_merge_hists)


__all__ = [
    "stream_value_histogram",
    "read_histogram",
    "read_psi",
    "compact_histogram_epochs",
    "read_psi_vs_baseline",
]


def read_psi_vs_baseline(
    spark: SparkSession,
    baseline_dir: str,
    current_dir: str,
    segment_col: str = "event_type",
    n_buckets: int = 20,
    alpha: float = 0.5,
):
    """PSI of one histogram store against another — the production
    pairing: freeze (or compact) a vetted window as ``baseline_dir``,
    keep streaming into ``current_dir``, and every read answers "has
    this week drifted from the blessed distribution" from two
    segments×buckets summaries."""
    from ..operators.stats import psi_between_histograms

    return psi_between_histograms(
        read_histogram(spark, baseline_dir),
        read_histogram(spark, current_dir),
        segment_col,
        n_buckets,
        alpha,
    )
