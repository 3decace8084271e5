"""Streaming DSIR model maintenance: merge per-batch hashed-unigram
count models into a persisted selection model.

The DSIR model (``operators/selection.py``) is two bucket-sized counts
— (feature, raw count, target count) — and counts over disjoint batches
SUM to the whole-corpus model. That makes it the same shape of
mergeable state as the CMS grid, so this module is a thin client of the
sketch store's epoch machinery (``sketch_stream.py``): each micro-batch
fits its own ≤ n_buckets-row model under an ``epoch=<id>`` dir, replay
is gated on the ``_SUCCESS`` commit marker, the current model is a
bucket-keyed SUM over the live dirs, and long-lived stores fold with
``compact_sketch_epochs`` under the same rename-publish discipline
(associative merge — no weight changes; pinned in tests).

Why this matters operationally: the selection model for a 100 TB crawl
can be kept CURRENT as batches land — each batch costs O(batch) work
and ≤ n_buckets rows of state — and any scoring run (including one on
a completely different corpus) reads a model of at most n_buckets rows
instead of re-tokenizing history.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.selection import dsir_fit, dsir_token_stream
from .sketch_stream import (
    _epoch_committed,
    _epoch_dir,
    check_store_pairing,
    compact_sketch_epochs,
    live_grid_dirs,
)


def _merge_models(df: DataFrame) -> DataFrame:
    return df.groupBy("f").agg(
        F.sum("c_r").alias("c_r"), F.sum("c_t").alias("c_t")
    )


def stream_dsir_model(
    feed: DataFrame,
    target_pred: Column,
    model_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
):
    """Maintain a DSIR model over a document stream; returns the query.

    Same store/replay contract as ``stream_cms``: one parquet subdir per
    epoch holding that batch's (f, c_r, c_t) model; replayed-and-
    committed epochs are skipped, a crashed partial epoch (dir without
    ``_SUCCESS``) is rewritten wholesale.
    """

    def merge_batch(batch: DataFrame, epoch: int) -> None:
        out = _epoch_dir(model_dir, epoch)
        spark = batch.sparkSession
        check_store_pairing(spark, model_dir, checkpoint_dir, epoch)
        if _epoch_committed(spark, out):
            return
        model = dsir_fit(
            dsir_token_stream(batch, target_pred, text_col, id_col, n_buckets)
        )
        model.write.mode("overwrite").parquet(out)

    return (
        feed.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_dsir_model(spark: SparkSession, model_dir: str) -> DataFrame:
    """Current model = bucket-keyed SUM across the live epoch models.

    Reads only committed, non-superseded dirs (`live_grid_dirs`) — a
    crashed epoch's partial files and a mid-compaction store both read
    consistently, exactly once per epoch.
    """
    dirs = live_grid_dirs(spark, model_dir)
    if not dirs:
        raise FileNotFoundError(f"no committed model epochs under {model_dir}")
    return _merge_models(spark.read.parquet(*dirs))


def compact_dsir_model(spark: SparkSession, model_dir: str) -> str | None:
    """Fold all-but-newest model epochs into one ``compact=`` dir.

    The merge is the bucket-keyed SUM — associative, so every downstream
    importance weight is unchanged (pinned in tests). Same crash-safety
    walkthrough as ``compact_sketch_epochs`` (it IS that function with
    the model fold).
    """
    return compact_sketch_epochs(spark, model_dir, merge=_merge_models)


__all__ = [
    "stream_dsir_model",
    "read_dsir_model",
    "compact_dsir_model",
]
