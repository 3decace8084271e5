"""Streaming NEAR-dup dedup: MinHash/LSH band state across micro-batches.

``dedup_stream`` handles exact duplicates with engine-managed state;
near-duplicates need content signatures, and Spark's built-in streaming
state can't express "drop if ANY signature band matches anything seen
before". The standard production shape is what this module does:

* per micro-batch (``foreachBatch``), compute MinHash signatures and
  band hashes for the NEW documents only — O(batch), never O(corpus);
* a new doc is a near-dup if any of its band hashes exists in the
  persisted band table (corpus history) or belongs to a smaller-id doc
  in the same batch (greedy within-batch order — deterministic and
  conservative: chained near-dup groups keep exactly their smallest
  id);
* survivors append to the output AND their band rows append to the
  band table — the state grows with the DEDUPED corpus (bands × 8
  bytes per kept doc), not the raw feed.

The lookup is an equi-join on (band, band_hash) — at scale the band
table is bucketed/partitioned by band_hash so each micro-batch touches
only matching buckets. Exactly-once: both writes land under
``epoch=<id>`` subdirectories and a replayed epoch is skipped, so crash
replays converge (same discipline as the partition-scoped upsert).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup
from .dedup_stream import DOC_FEED_SCHEMA


def _epoch_dir(base: str, epoch: int) -> str:
    return os.path.join(base, f"epoch={epoch}")


def stream_near_dedup_docs(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
):
    """JSONL document feed → cross-batch near-dup dedup → parquet.

    Returns the started query; callers ``awaitTermination()``. Documents
    too short to shingle (< ``shingle_n`` tokens) have no signature and
    pass through unexamined — the exact-dedup stream is the backstop
    for trivial content.
    """
    feed = spark.readStream.schema(DOC_FEED_SCHEMA).json(src_dir)

    def dedup_batch(batch: DataFrame, epoch: int) -> None:
        sp = batch.sparkSession
        from .sketch_stream import _epoch_committed, check_store_pairing

        check_store_pairing(sp, out_dir, checkpoint_dir, epoch)
        check_store_pairing(sp, state_dir, checkpoint_dir, epoch)
        out_ep, state_ep = _epoch_dir(out_dir, epoch), _epoch_dir(state_dir, epoch)
        if _epoch_committed(sp, out_ep) and _epoch_committed(sp, state_ep):
            return  # replayed epoch: both writes already committed
        sigs = dedup.minhash_signatures(
            batch, num_perm=num_perm, shingle_n=shingle_n
        )
        new_bands = dedup.band_hashes(sigs, num_perm=num_perm, bands=bands)

        from .sketch_stream import live_grid_dirs

        prior_dirs = [
            d for d in live_grid_dirs(sp, state_dir)
            if os.path.basename(d) != f"epoch={epoch}"
        ]
        if prior_dirs:
            seen = sp.read.parquet(*prior_dirs).select("band", "band_hash")
            hist_hit = (
                new_bands.join(seen, ["band", "band_hash"], "left_semi")
                .select("doc_id")
                .distinct()
            )
        else:
            hist_hit = sp.createDataFrame([], "doc_id long")

        # within-batch: a doc loses to any smaller id sharing a band bucket
        a, b = new_bands.alias("a"), new_bands.alias("b")
        intra_hit = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") > F.col("b.doc_id")),
                "left_semi",
            )
            .select("doc_id")
            .distinct()
        )
        dropped = hist_hit.unionByName(intra_hit).distinct()
        survivors = batch.join(dropped, "doc_id", "left_anti")
        survivors.write.mode("overwrite").parquet(out_ep)
        (
            new_bands.join(dropped, "doc_id", "left_anti")
            .write.mode("overwrite")
            .parquet(state_ep)
        )

    return (
        feed.writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_deduped(spark: SparkSession, out_dir: str) -> DataFrame:
    """All surviving documents across COMMITTED epochs — a crashed
    epoch's partial files are excluded (the stream rewrites them on
    replay), same discipline as the sketch-store readers."""
    from .sketch_stream import live_grid_dirs

    dirs = live_grid_dirs(spark, out_dir)
    if not dirs:
        raise FileNotFoundError(f"no committed output epochs under {out_dir}")
    return spark.read.option("basePath", out_dir).parquet(*dirs)


def compact_band_state(spark: SparkSession, state_dir: str) -> str | None:
    """Fold the band-table epochs into one ``compact=<lo>-<hi>`` dir.

    The band state is looked up by semi-join, so its fold is a plain
    row-union rewrite (duplicate band rows would not even change results
    — only space) — but a long-lived stream still pays one dir-listing +
    file-open per epoch per micro-batch without compaction. Reuses the
    sketch store's crash-safe publish (tmp → single rename → cleanup,
    newest epoch protected for the replay gate).
    """
    from .sketch_stream import compact_sketch_epochs

    return compact_sketch_epochs(spark, state_dir, merge=lambda df: df)
