"""Streaming training-shard maintenance: the incremental twin of the
batch shard export (``operators/shards.py``) — documents arrive as a
stream, each micro-batch packs ITS OWN documents into mmap-ready
uint16 shard blobs under a FROZEN vocabulary, and the trainer-facing
manifest is the union of committed epochs.

Why this shape at 100 TB: a curation pipeline lands cleaned documents
continuously, and re-exporting the whole corpus per delivery is
O(corpus) for O(batch) new data. Two design points make incremental
maintenance exact:

* **Frozen vocabulary** (the index store's pq_books/sq_grid
  discipline): the first non-empty epoch trains the ranked vocab on
  its batch (``shards.train_vocab`` — deterministic: term-freq desc,
  token asc) and every epoch encodes with it, so token ids are stable
  across epochs no matter how the distribution moves. The vocab rides
  in every store row (the probe-store pattern — any single committed
  epoch reconstructs the encoder); a shifted corpus is handled by an
  explicit store rebuild, never an in-place mutation.
* **Epoch-scoped shards**: each epoch packs its own documents from
  position 0 (shard identity = (epoch, source, shard_id)), so packing
  is a pure per-batch function — batch-parity is exact: an epoch's
  rows equal ``shard_blobs(shard_token_stream(batch, vocab=frozen))``
  over that batch alone, and the read side equals the per-epoch batch
  exports unioned. Trainers consume shards in (epoch, source, shard)
  order; no shard is ever rewritten by a later epoch.

Store contract: sketch-store epoch machinery (pairing gate, _SUCCESS
replay skip, crash rewrite, crash-safe compaction); each epoch holds
the shard rows + manifest columns + the frozen vocab + a ``trained``
marker on the training epoch's rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import shards as S
from .sketch_stream import (
    _epoch_committed,
    _epoch_dir,
    check_store_pairing,
    compact_sketch_epochs,
    live_grid_dirs,
)

#: the streamed feed's schema (what the curation layer lands per epoch)
SHARD_FEED_SCHEMA = "doc_id long, source string, text string"


def _frozen_vocab(spark: SparkSession, store_dir: str) -> list[str] | None:
    """The rank-ordered vocab from any committed trained row, or None
    if the store is empty (first non-empty epoch trains)."""
    dirs = live_grid_dirs(spark, store_dir)
    if not dirs:
        return None
    rows = (
        spark.read.parquet(*dirs).filter("trained").limit(1).collect()
    )
    if not rows:
        raise ValueError(
            f"shard store at {store_dir} has committed epochs but no "
            "trained vocab row — rebuild the store (delete store + "
            "checkpoint dirs and re-ingest the feed)"
        )
    return list(rows[0]["vocab"])


def epoch_shards(
    batch: DataFrame,
    vocab: list[str],
    vocab_size: int = 256,
    seq_len: int = 128,
    seqs_per_shard: int = 8,
) -> DataFrame:
    """The pure per-batch function shared by the stream and its parity
    gate: this batch's documents → frozen-vocab token ids → epoch-local
    positions → uint16 blobs + manifest columns."""
    stream = S.shard_token_stream(
        batch, vocab_size=vocab_size, seq_len=seq_len,
        seqs_per_shard=seqs_per_shard, vocab=vocab,
    )
    return S.shard_blobs(stream, vocab_size=vocab_size, seq_len=seq_len)


def stream_shard_export(
    spark: SparkSession,
    src_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    vocab_size: int = 256,
    seq_len: int = 128,
    seqs_per_shard: int = 8,
):
    """Parquet document feed → per-epoch shard blobs under the frozen
    vocab; returns the started query (callers ``awaitTermination()``)."""
    feed = spark.readStream.schema(SHARD_FEED_SCHEMA).parquet(src_dir)

    def export_batch(batch: DataFrame, epoch: int) -> None:
        sp = batch.sparkSession
        check_store_pairing(sp, store_dir, checkpoint_dir, epoch)
        out = _epoch_dir(store_dir, epoch)
        if _epoch_committed(sp, out):
            return  # replayed epoch: already committed
        vocab = _frozen_vocab(sp, store_dir)
        trained = False
        if vocab is None:
            # Never train on an epoch with no tokens: leave the store
            # untrained and let the FIRST token-bearing batch become
            # the training epoch (skipping the commit is safe — epoch
            # ids only grow). The guard is on the VOCAB, not just
            # batch.isEmpty(): a batch of empty/whitespace-only docs
            # would otherwise commit a zero-row epoch with no trained
            # marker and wedge every later epoch on _frozen_vocab's
            # missing-model error.
            vocab = S.train_vocab(
                batch, vocab_size=vocab_size, text_col="text"
            )
            if not vocab:
                return
            trained = True
        rows = epoch_shards(
            batch, vocab, vocab_size=vocab_size, seq_len=seq_len,
            seqs_per_shard=seqs_per_shard,
        )
        # vocab + trained ride every row (probe-store discipline): any
        # single committed epoch reconstructs the frozen encoder. An
        # empty later epoch commits zero rows but still marks the dir.
        rows.withColumn(
            "vocab", F.lit(vocab).cast("array<string>")
        ).withColumn("trained", F.lit(trained)).write.mode(
            "overwrite"
        ).parquet(out)

    return (
        feed.writeStream.foreachBatch(export_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_shard_store(
    spark: SparkSession, store_dir: str, validate: bool = True
) -> DataFrame:
    """Every committed shard row (manifest + blob + frozen vocab).
    With ``validate`` the stored checksums are re-verified against ids
    RE-READ from the stored bytes — bit rot fails loudly before a
    trainer consumes garbage (the batch reader's contract)."""
    import pandas as pd

    dirs = live_grid_dirs(spark, store_dir)
    if not dirs:
        raise FileNotFoundError(
            f"no committed shard epochs under {store_dir}"
        )
    rows = spark.read.parquet(*dirs)
    if validate:
        def recheck(batches):
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "ok": [
                            S.blob_checksum(bytes(row["blob"]))
                            == int(row["checksum"])
                            for _, row in pdf.iterrows()
                        ]
                    }
                )

        bad = (
            rows.select("blob", "checksum")
            .mapInPandas(recheck, "ok boolean")
            .filter(~F.col("ok"))
            .count()
        )
        if bad:
            raise ValueError(
                f"shard store {store_dir}: {bad} shard(s) fail "
                "checksum validation"
            )
    return rows


def compact_shard_store(spark: SparkSession, store_dir: str) -> str | None:
    """Fold all-but-newest epochs into one ``compact=`` dir; shard rows
    are immutable per-epoch facts, so the merge is a plain row union
    and every blob/checksum (and the trained vocab row) survives
    byte-identical (pinned in tests)."""
    return compact_sketch_epochs(spark, store_dir, merge=lambda df: df)


def rebuild_shard_store(
    spark: SparkSession, store_dir: str, checkpoint_dir: str
) -> None:
    """The distribution-shift remediation: delete store AND checkpoint
    together (the pairing invariant), so the next run retrains the
    vocabulary on the current distribution as its epoch 0."""
    from ..pipeline.runner import _hadoop_fs

    for path in (store_dir, checkpoint_dir):
        fs, p = _hadoop_fs(spark, path)
        if fs.exists(p):
            fs.delete(p, True)


__all__ = [
    "SHARD_FEED_SCHEMA",
    "epoch_shards",
    "stream_shard_export",
    "read_shard_store",
    "compact_shard_store",
    "rebuild_shard_store",
]
