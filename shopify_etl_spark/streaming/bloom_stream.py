"""Streaming Bloom-filter maintenance: the ingest screen that stays
current as the corpus streams in.

``operators/sketches.py::bloom_build`` materializes a Bloom filter as
its set-position table — DISTINCT-mergeable (the union of two filters'
positions IS the filter of the union), so it rides the sketch store's
epoch machinery exactly like CMS/HLL/DSIR/histogram state: each
micro-batch writes its own batch-filter under an ``epoch=`` dir
(O(batch) work, ≤ m rows out), replays are ``_SUCCESS``-gated, the
current filter is a DISTINCT over the live dirs, and long-lived stores
fold through the rename-publish compaction with ZERO answer changes
(distinct is idempotent + associative).

Operationally: a crawler streams documents in; every ingest batch can
screen itself against the filter-so-far (``read_bloom`` + ``bloom_probe``
= one broadcast join) before paying the exact dedup path — the
membership answer stays bounded at m positions no matter how much
history streamed through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import sketches
from .sketch_stream import (
    _epoch_committed,
    _epoch_dir,
    check_store_pairing,
    compact_sketch_epochs,
    live_grid_dirs,
)


def _merge_positions(df: DataFrame) -> DataFrame:
    return df.select("pos").distinct()


def stream_bloom(
    feed: DataFrame,
    key_col: str,
    bloom_dir: str,
    checkpoint_dir: str,
    m: int = 4096,
    k: int = 3,
    salt: str = "bloom-v1",
):
    """Maintain a Bloom filter over a streaming key column; returns the
    started query. Same store/replay/pairing contract as ``stream_cms``."""

    def merge_batch(batch: DataFrame, epoch: int) -> None:
        out = _epoch_dir(bloom_dir, epoch)
        spark = batch.sparkSession
        check_store_pairing(spark, bloom_dir, checkpoint_dir, epoch)
        if _epoch_committed(spark, out):
            return
        sketches.bloom_build(batch, key_col, m=m, k=k, salt=salt).write.mode(
            "overwrite"
        ).parquet(out)

    return (
        feed.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_bloom(spark: SparkSession, bloom_dir: str) -> DataFrame:
    """Current filter = DISTINCT position set across the live epoch dirs
    (committed, non-superseded — the sketch store's read discipline)."""
    dirs = live_grid_dirs(spark, bloom_dir)
    if not dirs:
        raise FileNotFoundError(f"no committed bloom epochs under {bloom_dir}")
    return _merge_positions(spark.read.parquet(*dirs))


def compact_bloom_epochs(spark: SparkSession, bloom_dir: str) -> str | None:
    """Fold all-but-newest epochs into one ``compact=`` dir via DISTINCT —
    idempotent and associative, so every membership answer is unchanged
    (pinned in tests); the store stays ≤ m rows live."""
    return compact_sketch_epochs(spark, bloom_dir, merge=_merge_positions)
