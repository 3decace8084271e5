"""Streaming crawl ingest: the incremental twin of the batch
crawl→curation chain (``plans/catalog_ext6.py``) — .warc.gz archives
arrive as a stream, each micro-batch splits records, extracts text and
runs the quality gate on the NEW archives only, and the curated corpus
is the union of committed epochs.

Why this shape at 100 TB: a crawl never stops — archives land in object
storage continuously, and re-running the batch chain over the whole
bucket per delivery is O(corpus) for O(batch) new data. Every stage of
the chain is a pure per-archive function (record split, HTML extraction,
the per-document quality rules), so incremental maintenance is exact:
stream state is ZERO, each epoch costs O(new archives), and the read
side over committed epochs must equal the batch chain over the union of
every archive ever fed — the batch-equivalence contract the tests pin
(the same discipline as the index/sketch/probe stores).

Feed contract: a parquet directory of ``(file_id long, warc binary)``
rows — the shape a landing job writes per delivery (Spark's file stream
source handles parquet natively; the archives themselves stay opaque
binary through the plan). Store contract: sketch-store epoch machinery
(pairing gate, ``_SUCCESS`` replay skip, crash rewrite, crash-safe
compaction); each epoch holds the curated rows
``(file_id, doc_id, text_out, n_tokens, keep, reasons)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.html import html_to_text
from ..operators.text import quality_filter
from ..sources.warc import is_decoded, payload_text, warc_records
from .sketch_stream import (
    _epoch_committed,
    _epoch_dir,
    check_store_pairing,
    compact_sketch_epochs,
    live_grid_dirs,
)

#: the streamed feed's schema (what a landing job writes per delivery)
CRAWL_FEED_SCHEMA = "file_id long, warc binary"


def curate_archives(
    files: DataFrame, decoders: dict | None = None
) -> DataFrame:
    """The pure per-archive chain shared by the stream and its parity
    gate: record split → 200-OK responses → transport routing →
    html_to_text → quality gate. One narrow pass; zero state, zero
    corpus dependence.

    ``decoders`` (r17): the transport-decoder registry — labels it
    absorbs are DECODED by the splitter and extract normally; the
    accounting route keeps counting only the labels no decoder
    handles (see ``warc.default_transport_decoders``).

    Transport routing (VERDICT r15 #1): a record whose
    ``http_encoding`` the parser did not fully decode (br, zstd, …)
    must NOT feed still-compressed bytes to extraction — it becomes an
    ACCOUNTING row (``keep=false``, ``reasons='transport:<label>'``,
    null text) so the loss is countable downstream, never silent (the
    permissive-mode philosophy).

    Redirect routing (r17, VERDICT r16 #2): 3xx responses carry a
    Location: header instead of content — they become accounting rows
    too (``reasons='status:<code>'``) so a dump's redirect mass is
    countable at the curation front (chain resolution itself is the
    ``crawl_redirect_resolution`` consumer's job). 404s stay excluded
    by the status gate — the planted dead leg whose exclusion every
    extraction oracle pins."""
    from ..operators.materialize import checkpoint_tracked

    # two routes read the record table: checkpoint so the member split
    # runs once per micro-batch, not once per route
    redirect = F.col("http_status").between(300, 399)
    extra = tuple(sorted(decoders)) if decoders else ()
    ok = checkpoint_tracked(
        warc_records(files, decoders=decoders).filter(
            (F.col("warc_type") == "response")
            & ((F.col("http_status") == 200) | redirect)
        )
    )
    doc_id = F.regexp_extract("target_uri", r"/doc/(\d+)$", 1).cast("long")
    ex = ok.filter(
        ~redirect & is_decoded("http_encoding", extra=extra)
    ).select(
        "file_id",
        doc_id.alias("doc_id"),
        html_to_text(payload_text()).alias("text_out"),
    )
    curated = quality_filter(
        ex, text_col="text_out", id_col="doc_id",
        keep_cols=("file_id", "text_out"),
    ).select(
        "file_id", "doc_id", "text_out",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "keep", "reasons",
    )
    skipped = ok.filter(
        redirect | ~is_decoded("http_encoding", extra=extra)
    ).select(
        "file_id",
        doc_id.alias("doc_id"),
        F.lit(None).cast("string").alias("text_out"),
        F.lit(0).cast("long").alias("n_tokens"),
        F.lit(False).alias("keep"),
        F.when(
            redirect,
            F.concat(F.lit("status:"), F.col("http_status")),
        ).otherwise(
            F.concat(F.lit("transport:"), F.col("http_encoding"))
        ).alias("reasons"),
    )
    return curated.unionByName(skipped)


def curate_archives_mm(
    files: DataFrame, decoders: dict | None = None
) -> DataFrame:
    """Multimodal twin of :func:`curate_archives` (VERDICT r14 #6): the
    pure per-archive chain with MIME routing on the peeled HTTP
    Content-Type — ``text/html`` fetches run extraction + the quality
    gate, ``image/png`` fetches run the REAL PNG decode
    (``multimodal.decode_features``: zlib inflate + unfilter, stats
    over DECODED rasters). One unified row schema; modality-specific
    columns null on the other route. Still zero state, zero corpus
    dependence — exactly the batch chain ``crawl_multimodal_stats``
    composes, so incremental maintenance stays exact.

    Routing closes BOTH silent-drop paths (VERDICT r15 #1 + ADVICE
    r15): a 200-OK fetch whose transport is not fully decoded
    (``is_decoded`` false — e.g. brotli) or whose MIME matches neither
    route (parameterized ``image/png; …`` now matches via startswith,
    like the text branch; anything else — PDFs, JSON APIs — does not)
    becomes a ``modality='other'`` ACCOUNTING row (``keep=false``,
    ``reasons='transport:<enc>'`` or ``'mime:<type>'``) instead of
    vanishing from the curated corpus. 3xx responses (r17) route the
    same way with ``reasons='status:<code>'`` — see
    :func:`curate_archives`."""
    from ..operators.materialize import checkpoint_tracked
    from ..operators.multimodal import decode_features

    # two modality consumers read the record table: checkpoint so the
    # member split runs once per micro-batch, not once per route
    redirect = F.col("http_status").between(300, 399)
    extra = tuple(sorted(decoders)) if decoders else ()
    ok = checkpoint_tracked(
        warc_records(files, decoders=decoders).filter(
            (F.col("warc_type") == "response")
            & ((F.col("http_status") == 200) | redirect)
        )
    )
    doc_id = F.regexp_extract("target_uri", r"/doc/(\d+)$", 1).cast("long")
    dec = is_decoded("http_encoding", extra=extra) & ~redirect
    # null-safe route predicates (ADVICE r16): a 200-OK record with NO
    # Content-Type header has null http_mime, so a bare startswith
    # yields NULL — which fails the html/png filters AND the catch-all
    # ~(dec & (html|png)) filter, vanishing the row from every route
    # (the exact silent-drop path this routing exists to close).
    # Coalesced to false, header-less records fall into the
    # modality='other' accounting route with reasons='mime:?'.
    is_html = F.coalesce(
        F.col("http_mime").startswith("text/html"), F.lit(False)
    )
    is_png = F.coalesce(
        F.col("http_mime").startswith("image/png"), F.lit(False)
    )
    # text/plain route (r17, VERDICT r16 #7): non-HTML textual content
    # (READMEs, robots, data files) curates too — straight to the
    # quality gate, NO tag strip; one shared quality pass with the
    # html route (the text_out projection is the only difference)
    is_plain = F.coalesce(
        F.col("http_mime").startswith("text/plain"), F.lit(False)
    )
    html = quality_filter(
        ok.filter(dec & (is_html | is_plain)).select(
            "file_id",
            doc_id.alias("doc_id"),
            F.when(is_html, html_to_text(payload_text()))
            .otherwise(payload_text())
            .alias("text_out"),
        ),
        text_col="text_out",
        id_col="doc_id",
        keep_cols=("file_id", "text_out"),
    ).select(
        "file_id",
        "doc_id",
        F.lit("text").alias("modality"),
        "text_out",
        F.col("n_tokens").cast("long"),
        "keep",
        "reasons",
        F.lit(None).cast("long").alias("n_pixels"),
        F.lit(None).cast("long").alias("pixel_sum"),
    )
    imgs = ok.filter(dec & is_png)
    assets = imgs.select(
        doc_id.alias("asset_id"),
        "payload",
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("png").alias("format"),
            F.lit(None).cast("long").alias("width"),
            F.lit(None).cast("long").alias("height"),
            F.length("payload").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
    # decode_features drops ride-along columns — recover the archive id
    # by joining back to the (doc, file) map off the same checkpoint
    img_files = imgs.select(
        doc_id.alias("doc_id"), "file_id"
    )
    png = (
        decode_features(assets, fake=False)
        .select(
            F.col("asset_id").alias("doc_id"),
            F.col("n_bytes").cast("long").alias("n_pixels"),
            F.col("byte_sum").cast("long").alias("pixel_sum"),
        )
        .join(img_files, "doc_id")
        .select(
            "file_id",
            "doc_id",
            F.lit("image").alias("modality"),
            F.lit(None).cast("string").alias("text_out"),
            F.lit(None).cast("long").alias("n_tokens"),
            F.lit(True).alias("keep"),
            F.lit("").alias("reasons"),
            "n_pixels",
            "pixel_sum",
        )
    )
    other = ok.filter(~(dec & (is_html | is_plain | is_png))).select(
        "file_id",
        doc_id.alias("doc_id"),
        F.lit("other").alias("modality"),
        F.lit(None).cast("string").alias("text_out"),
        F.lit(None).cast("long").alias("n_tokens"),
        F.lit(False).alias("keep"),
        F.when(
            redirect, F.concat(F.lit("status:"), F.col("http_status"))
        ).when(
            ~is_decoded("http_encoding", extra=extra),
            F.concat(F.lit("transport:"), F.col("http_encoding")),
        ).otherwise(
            F.concat(F.lit("mime:"), F.coalesce("http_mime", F.lit("?")))
        ).alias("reasons"),
        F.lit(None).cast("long").alias("n_pixels"),
        F.lit(None).cast("long").alias("pixel_sum"),
    )
    return html.unionByName(png).unionByName(other)


def stream_crawl_ingest(
    spark: SparkSession,
    src_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    multimodal: bool = False,
    decoders: dict | None = None,
):
    """Parquet archive feed → per-epoch curated corpus rows; returns
    the started query (callers ``awaitTermination()``). With
    ``multimodal`` each epoch holds the MIME-routed union
    (:func:`curate_archives_mm`) instead of the text-only chain.
    ``decoders`` (r17) is the transport-decoder registry, threaded
    into every epoch's splitter — a deployment with brotli installed
    passes ``warc.default_transport_decoders()`` and the stream
    decodes br legs instead of skip-counting them."""
    feed = spark.readStream.schema(CRAWL_FEED_SCHEMA).parquet(src_dir)

    def chain(batch):
        fn = curate_archives_mm if multimodal else curate_archives
        return fn(batch, decoders=decoders)

    def ingest_batch(batch: DataFrame, epoch: int) -> None:
        sp = batch.sparkSession
        check_store_pairing(sp, store_dir, checkpoint_dir, epoch)
        out = _epoch_dir(store_dir, epoch)
        if _epoch_committed(sp, out):
            return  # replayed epoch: already committed
        chain(batch).write.mode("overwrite").parquet(out)

    return (
        feed.writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_crawl_corpus(spark: SparkSession, store_dir: str) -> DataFrame:
    """The curated corpus over everything ingested so far (committed
    epochs only — a crashed epoch's partial files are invisible and the
    stream rewrites them on replay)."""
    dirs = live_grid_dirs(spark, store_dir)
    if not dirs:
        raise FileNotFoundError(
            f"no committed crawl epochs under {store_dir}"
        )
    return spark.read.parquet(*dirs)


def compact_crawl_store(spark: SparkSession, store_dir: str) -> str | None:
    """Fold all-but-newest epochs into one ``compact=`` dir; rows are
    per-document facts, so the merge is a plain row union and every
    curated row survives byte-identical (pinned in tests)."""
    return compact_sketch_epochs(spark, store_dir, merge=lambda df: df)


__all__ = [
    "CRAWL_FEED_SCHEMA",
    "curate_archives",
    "curate_archives_mm",
    "stream_crawl_ingest",
    "read_crawl_corpus",
    "compact_crawl_store",
]
