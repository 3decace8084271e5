"""Streaming exact-dedup over a document feed.

The streaming twin of ``operators.dedup.exact_duplicates`` /
``operators.text.fingerprint``: documents arrive continuously (crawl
output, upload queue) and each fingerprint must pass through exactly
once. ``dropDuplicatesWithinWatermark`` keeps the seen-fingerprint set
as WATERMARK-BOUNDED state — fingerprints older than the delay are
evicted, so state size tracks the ingest rate × window, not corpus
lifetime (the unbounded-state trap of plain ``dropDuplicates`` on a
stream). Duplicates arriving inside the window are dropped even when
their event times differ; a dup arriving after eviction re-emits, which
is the documented trade — downstream batch dedup (exact_duplicates)
remains the corpus-lifetime backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_FEED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ingested_at", T.TimestampType()),
    ]
)


def stream_dedup_docs(
    spark: SparkSession, src_dir: str, watermark_delay: str = "1 hour"
) -> DataFrame:
    """JSONL document feed → fingerprint → watermark-bounded exact dedup.

    The dedup key is the 8-byte ``xxhash64`` of whitespace-normalized
    lowercased text (same normalization as the batch ``fingerprint``
    operator, so batch and streaming dedup agree on what "identical"
    means). State is keyed on the hash, not the text — constant bytes
    per document regardless of document length.
    """
    feed = spark.readStream.schema(DOC_FEED_SCHEMA).json(src_dir)
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    return (
        feed.withColumn("fp64", F.xxhash64(norm))
        .withWatermark("ingested_at", watermark_delay)
        .dropDuplicatesWithinWatermark(["fp64"])
    )
