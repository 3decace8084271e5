"""Streaming quality-probe maintenance: train the linear student ONCE
(on the first committed epoch), score every later batch with the FROZEN
weights, and persist per-epoch teacher-student agreement — the
student-drift monitor a production curation pipeline runs next to its
distilled classifier (``operators/classifier.py``).

Why this shape at 100 TB: the distilled probe exists so the expensive
teacher gate (bigram folds) doesn't run on every document — but a
frozen student silently rots when the corpus distribution moves. The
standard mitigation is to keep scoring a SAMPLE with the teacher and
track agreement; here every epoch stores one row of (n, n_agree,
sum_score) plus the frozen model columns, so the monitor's state is
O(epochs), the alarm is a read-side aggregate, and retraining is an
explicit store rebuild (the same frozen-state discipline as the index
store's pq_books/bq_thresholds).

Store contract (sketch-store epoch machinery): one parquet dir per
epoch holding ONE row — epoch stats + the weights/normalization that
scored it (epoch 0: freshly trained on itself; later epochs: copied
from the earliest committed epoch). Replayed-and-committed epochs are
skipped; a crashed partial epoch is rewritten wholesale; long-lived
stores fold with ``compact_sketch_epochs`` (row-union merge — every
agreement number is unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.classifier import (
    feature_stats,
    probe_score,
    probe_train,
    quality_probe_frame,
)
from .sketch_stream import (
    _epoch_committed,
    _epoch_dir,
    check_store_pairing,
    compact_sketch_epochs,
    live_grid_dirs,
)


def _epoch_row(spark, frame, w, mus, sds, trained):
    """One store row: agreement stats of this batch under (w, mus, sds)
    plus the model itself (model columns ride in every row so any
    single committed epoch reconstructs the frozen scorer)."""
    scored = probe_score(frame, w, mus, sds)
    agg = scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            (F.col("pred_keep") == F.col("keep")).cast("long")
        ).alias("n_agree"),
        F.sum("score").alias("sum_score"),
    ).collect()[0]
    # SUM over zero rows is SQL-null: an empty microbatch (source file
    # with no valid documents) must land as an n_docs=0 row, not a
    # driver-side TypeError that kills the stream.
    return spark.createDataFrame(
        [(
            int(agg["n_docs"]), int(agg["n_agree"] or 0),
            float(agg["sum_score"] or 0.0),
            [float(x) for x in w],
            [float(x) for x in mus],
            [float(x) for x in sds],
            bool(trained),
        )],
        "n_docs long, n_agree long, sum_score double, "
        "w array<double>, mus array<double>, sds array<double>, "
        "trained boolean",
    )


def _frozen_model(spark, store_dir):
    """(w, mus, sds) from the TRAINED epoch row (exactly one exists —
    the first committed epoch's; compaction preserves it), or None if
    the store is empty (first epoch trains)."""
    dirs = live_grid_dirs(spark, store_dir)
    if not dirs:
        return None
    rows = spark.read.parquet(*dirs).filter("trained").limit(1).collect()
    if not rows:
        raise ValueError(
            f"probe store at {store_dir} has committed epochs but no "
            "trained model row — rebuild the store (delete store + "
            "checkpoint dirs and re-ingest the feed)"
        )
    r = rows[0]
    return list(r["w"]), list(r["mus"]), list(r["sds"])


def stream_probe_monitor(
    feed: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    iters: int = 16,
    lr: float = 0.4,
):
    """Maintain the probe drift store over a document stream; returns
    the started query. Epoch 0 trains the student on its own batch
    (deterministic: zero init, fixed iters/lr — any engine re-derives
    the weights from the same feed); every epoch scores its batch with
    the FROZEN model and stores one stats row."""

    def monitor_batch(batch: DataFrame, epoch: int) -> None:
        spark = batch.sparkSession
        check_store_pairing(spark, store_dir, checkpoint_dir, epoch)
        out = _epoch_dir(store_dir, epoch)
        if _epoch_committed(spark, out):
            return
        frame = quality_probe_frame(batch).localCheckpoint()
        model = _frozen_model(spark, store_dir)
        if model is None:
            # Never train on an empty epoch (feature_stats divides by
            # n=0): leave the store untrained and let the FIRST
            # non-empty batch become the training epoch. Skipping the
            # commit is safe — epoch ids only grow, so monotonicity
            # holds, and an uncommitted empty epoch carries no stats.
            if frame.isEmpty():
                return
            mus, sds, n = feature_stats(frame)
            w = probe_train(frame, mus, sds, n, iters=iters, lr=lr)
            trained = True
        else:
            # An empty later batch still commits (as an n_docs=0 row —
            # _epoch_row tolerates null SUMs) so the epoch ledger stays
            # dense for the read-side drift scan.
            w, mus, sds = model
            trained = False
        _epoch_row(spark, frame, w, mus, sds, trained).write.mode(
            "overwrite"
        ).parquet(out)

    return (
        feed.writeStream.foreachBatch(monitor_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_probe_drift(
    spark: SparkSession, store_dir: str, alarm_below: float = 0.15
) -> DataFrame:
    """Per-epoch agreement rates + the drift alarm.

    One row per stored epoch row: (n_docs, n_agree, agreement), plus
    ``baseline`` (the trained epoch's own agreement — what the student
    achieved on its training distribution) and ``drifted`` = agreement
    below ``baseline − alarm_below``. A drifted epoch means the corpus
    moved somewhere the cheap features can't see — the signal to
    retrain (rebuild the store)."""
    dirs = live_grid_dirs(spark, store_dir)
    if not dirs:
        raise FileNotFoundError(
            f"no committed probe epochs under {store_dir}"
        )
    rows = spark.read.parquet(*dirs)
    base = rows.filter("trained").agg(
        (F.sum("n_agree") / F.sum("n_docs")).alias("b")
    ).collect()[0]["b"]
    if base is None:
        raise ValueError(
            f"probe store at {store_dir} has no trained epoch row — "
            "rebuild the store (delete store + checkpoint dirs and "
            "re-ingest the feed)"
        )
    # try_divide: an n_docs=0 epoch (empty microbatch) reads as null
    # agreement instead of an ANSI divide-by-zero error.
    agreement = F.try_divide(F.col("n_agree"), F.col("n_docs"))
    return rows.select(
        "n_docs", "n_agree", "trained",
        F.round(agreement, 4).alias("agreement"),
        F.lit(round(float(base), 4)).alias("baseline"),
        # n_docs=0 epochs (empty microbatch committed under the frozen
        # model) have null agreement — no evidence either way, so they
        # never alarm.
        F.coalesce(
            agreement < F.lit(float(base)) - F.lit(alarm_below),
            F.lit(False),
        ).alias("drifted"),
    )


def rebuild_probe_store(
    spark: SparkSession, store_dir: str, checkpoint_dir: str
) -> None:
    """The drift alarm's remediation, as an explicit API: delete the
    store AND its checkpoint together (the pairing invariant — a fresh
    checkpoint against an old store is exactly the trap
    ``check_store_pairing`` refuses), so the next
    :func:`stream_probe_monitor` run over the feed retrains the student
    on the CURRENT distribution as its epoch 0 and the agreement
    baseline resets with it.

    Rebuild-retrains is the frozen-state discipline every frozen model
    in this engine shares (index store pq_books/bq_thresholds/sq_grid):
    state is never mutated in place — a drifted student is replaced by
    re-deriving from the feed, which any engine can replay and verify.
    Scheme-agnostic recursive deletes via the Hadoop FS API."""
    from ..pipeline.runner import _hadoop_fs

    for d in (store_dir, checkpoint_dir):
        fs, p = _hadoop_fs(spark, d)
        if fs.exists(p):
            fs.delete(p, True)


def compact_probe_store(spark: SparkSession, store_dir: str) -> str | None:
    """Fold all-but-newest epochs into one ``compact=`` dir. Rows are
    per-epoch facts — the merge is a plain row union, so every
    agreement number and the trained-row baseline are unchanged
    (pinned in tests)."""
    return compact_sketch_epochs(spark, store_dir, merge=lambda df: df)


__all__ = [
    "stream_probe_monitor",
    "read_probe_drift",
    "rebuild_probe_store",
    "compact_probe_store",
]
