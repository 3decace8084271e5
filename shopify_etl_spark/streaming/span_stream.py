"""Streaming substring-duplication screen: window-hash state across
micro-batches.

The batch operator ``dedup.duplicate_span_stats`` answers "which token
windows occur in more than one document" over a CLOSED corpus. The
streaming question at ingest time is asymmetric by nature: *how much of
this NEW document already exists* — in the corpus processed so far, or
in another document of the same batch. That is the screen a pipeline
applies before admitting a crawl batch (the span-level analog of
``near_dedup_stream``'s document-level gate).

Semantics, pinned by tests:

* For a SINGLE batch the result equals the batch operator exactly
  (both directions of a within-batch duplicate see each other).
* Across batches the relation is ordered: a later duplicate flags
  against earlier documents; already-emitted per-doc stats are never
  rewritten (append-only outputs — the reporting layer can always
  re-derive symmetric global stats from the window store).

State is the set of DISTINCT window hashes seen so far, stored under
``epoch=<id>`` dirs like every streaming store in this package: each
epoch appends only the hashes history did not already contain, so the
store grows with novel content, not with the feed. Exactly-once via
the ``_SUCCESS`` commit-marker replay gate (``sketch_stream.
_epoch_committed``); a crashed epoch is rewritten on replay, a
committed one skipped. Epoch sprawl compacts with the same
rename-publish discipline as the sketch stores.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import _span_hash_windows
from .dedup_stream import DOC_FEED_SCHEMA


def _epoch_dir(base: str, epoch: int) -> str:
    return os.path.join(base, f"epoch={epoch}")


def stream_span_screen(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    width: int = 16,
):
    """JSONL document feed → per-doc duplicated-window stats → parquet.

    Output rows: (doc_id, n_windows, n_dup_windows, dup_window_frac)
    per ingested doc with >= ``width`` tokens, where a window is
    "duplicated" iff its hash exists in the window store (earlier
    epochs) or in ANOTHER document of the same batch. Returns the
    started query; callers ``awaitTermination()``.
    """
    feed = spark.readStream.schema(DOC_FEED_SCHEMA).json(src_dir)

    def screen_batch(batch: DataFrame, epoch: int) -> None:
        sp = batch.sparkSession
        from .sketch_stream import (
            _epoch_committed,
            check_store_pairing,
            live_grid_dirs,
        )

        check_store_pairing(sp, out_dir, checkpoint_dir, epoch)
        check_store_pairing(sp, state_dir, checkpoint_dir, epoch)
        out_ep, state_ep = _epoch_dir(out_dir, epoch), _epoch_dir(state_dir, epoch)
        if _epoch_committed(sp, out_ep) and _epoch_committed(sp, state_ep):
            return  # replayed epoch: both writes already committed

        base = _span_hash_windows(batch, width, "text", "doc_id")
        pos = base.select("doc", F.posexplode("spans").alias("pos", "h"))

        prior_dirs = [
            d for d in live_grid_dirs(sp, state_dir)
            if os.path.basename(d) != f"epoch={epoch}"
        ]
        seen = (
            sp.read.parquet(*prior_dirs).select("h")
            if prior_dirs
            else sp.createDataFrame([], "h long")
        )

        # within-batch cross-doc hashes (min != max ⟺ >= 2 distinct docs)
        intra = (
            pos.groupBy("h")
            .agg(F.min("doc").alias("_lo"), F.max("doc").alias("_hi"))
            .filter(F.col("_lo") != F.col("_hi"))
            .select("h")
        )
        dup_h = intra.unionByName(seen).distinct()
        flagged = pos.join(dup_h, "h", "left_semi").groupBy("doc").agg(
            F.count(F.lit(1)).alias("n_dup_windows")
        )
        stats = (
            base.select("doc", F.size("spans").alias("n_windows"))
            .join(flagged, "doc", "left")
            .select(
                F.col("doc").alias("doc_id"),
                F.col("n_windows").cast("long").alias("n_windows"),
                F.coalesce("n_dup_windows", F.lit(0))
                .cast("long")
                .alias("n_dup_windows"),
                F.round(
                    F.coalesce("n_dup_windows", F.lit(0)) / F.col("n_windows"),
                    4,
                ).alias("dup_window_frac"),
            )
        )
        stats.write.mode("overwrite").parquet(out_ep)
        # store grows with NOVEL hashes only
        (
            pos.select("h")
            .distinct()
            .join(seen, "h", "left_anti")
            .write.mode("overwrite")
            .parquet(state_ep)
        )

    return (
        feed.writeStream.foreachBatch(screen_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_span_stats(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per-doc stats across COMMITTED epochs only (a crashed epoch's
    partial files are excluded; the stream rewrites them on restart)."""
    from .sketch_stream import live_grid_dirs

    # live_grid_dirs already returns only _SUCCESS-committed dirs
    dirs = live_grid_dirs(spark, out_dir)
    if not dirs:
        return spark.createDataFrame(
            [],
            "doc_id long, n_windows long, n_dup_windows long, dup_window_frac double",
        )
    return spark.read.parquet(*dirs)


def compact_span_epochs(spark: SparkSession, state_dir: str) -> str | None:
    """:func:`sketch_stream.compact_sketch_epochs` for the window-hash
    store: the fold is DISTINCT over the hash column (idempotent-union
    state, so every future screen decision is unchanged — the epochs
    already contain disjoint novel hashes by construction, making the
    distinct a pure file-count collapse). Same rename-publish crash
    discipline; run between stream runs."""
    from .sketch_stream import compact_sketch_epochs

    def merge(df: DataFrame) -> DataFrame:
        return df.distinct()

    return compact_sketch_epochs(spark, state_dir, merge=merge)
