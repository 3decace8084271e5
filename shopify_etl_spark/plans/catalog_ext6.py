"""Round-14 extension queries: raw-crawl ingest (VERDICT r13 #1) — the
WARC front door between "catalog of curation operators" and "pipeline
you can point at a 100 TB crawl".

Three-stage gate, mirroring the codec-gate discipline (synthesize →
REALLY decode distributed → oracle recomputes from first principles):

* ``warc_ingest_stats`` — archive accounting: the splitter's view of
  every record (types, statuses, URI id ranges) per ``.warc.gz`` file
  must equal the grouping/status formula the synthesizer used, which
  the oracle re-derives from ``documents`` alone.
* ``html_extract_docs`` — the lossless-extraction gate: the full chain
  (gzip member split → WARC parse → HTTP body peel → ``html_to_text``)
  must reproduce each document's text EXACTLY (modulo the declared
  whitespace normalization), because the HTML template is built so the
  round-trip is provably lossless (``operators/html.py``). Value-exact
  on the complete text body — a one-byte extraction bug
  hash-mismatches.
* ``crawl_curation_chain`` — the end-to-end story: crawl archive →
  extraction → the existing Gopher-style quality gate
  (``text.quality_filter``) → per-archive keep accounting; the oracle
  replays extraction AND the gate's five rules in SQL.

Scale shape shared by all three: documents are scanned once; synthesis
is one ``applyInPandas`` over independent archive groups; the splitter
is a zero-shuffle ``mapInPandas`` whose memory bound is ONE record
(per-record gzip members — the Common Crawl splittability property);
extraction + quality are JVM-side projections. The only shuffles are
the synthesis grouping and the final tiny per-file aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table, register

# Synthesis constants — mirrored literally in every oracle below.
_DOCS_PER_FILE = 25
_NOT_FOUND_EVERY = 17

# The provably-lossless extraction formula (operators/html.py::synth_html
# → html_to_text round-trip), as one DuckDB expression over documents.
_XT_SQL = (
    "regexp_replace('Doc ' || CAST(doc_id AS VARCHAR) || ' ' || "
    "trim(text) || ' &copy; example end', '\\s+', ' ', 'g')"
)


def _extracted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared chain: synth archives → split records → keep 200-OK
    responses → extract text. doc_id is recovered from the TARGET URI
    (the crawl-side identity), never trusted from the payload."""
    from ..operators.html import html_to_text
    from ..sources import warc

    docs = load_table(spark, sf_dir, "documents")
    files = warc.synth_warc_files(
        docs, docs_per_file=_DOCS_PER_FILE, not_found_every=_NOT_FOUND_EVERY
    )
    recs = warc.warc_records(files)
    return recs.filter(
        (F.col("warc_type") == "response") & (F.col("http_status") == 200)
    ).select(
        "file_id",
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        html_to_text(F.col("payload").cast("string")).alias("text_out"),
    )


@register(
    "warc_ingest_stats",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, doc_id // {_DOCS_PER_FILE} AS file_id,
             CASE WHEN doc_id % {_NOT_FOUND_EVERY} = 0
                  THEN 404 ELSE 200 END AS status
      FROM documents
    )
    SELECT file_id,
           CAST(1 + 2 * COUNT(*) AS BIGINT) AS n_records,
           CAST(COUNT(*) AS BIGINT)         AS n_responses,
           CAST(COUNT(*) AS BIGINT)         AS n_requests,
           CAST(1 AS BIGINT)                AS n_warcinfo,
           CAST(SUM(status) AS BIGINT)      AS sum_status,
           MIN(doc_id)                      AS min_doc,
           MAX(doc_id)                      AS max_doc
    FROM d GROUP BY file_id
    """,
    doc="WARC archive accounting — the splitter's record inventory per "
    ".warc.gz (warcinfo/request/response counts, HTTP status sums, URI "
    "id ranges) vs the synthesis formula re-derived from documents. A "
    "splitter that drops a gzip member, misparses a header, or "
    "mis-slices a Content-Length changes a count or a status sum and "
    "hash-mismatches. Real multi-member gzip decompression per record "
    "(stdlib zlib), zero-shuffle mapInPandas, memory bounded by one "
    "record — the Common Crawl splittability property. "
    "sources/warc.py::warc_records.",
)
def warc_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import warc

    docs = load_table(spark, sf_dir, "documents")
    files = warc.synth_warc_files(
        docs, docs_per_file=_DOCS_PER_FILE, not_found_every=_NOT_FOUND_EVERY
    )
    recs = warc.warc_records(files)
    is_resp = F.col("warc_type") == "response"
    doc_from_uri = F.when(
        is_resp,
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1).cast("long"),
    )
    return recs.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum(is_resp.cast("long")).alias("n_responses"),
        F.sum((F.col("warc_type") == "request").cast("long")).alias(
            "n_requests"
        ),
        F.sum((F.col("warc_type") == "warcinfo").cast("long")).alias(
            "n_warcinfo"
        ),
        F.sum(F.when(is_resp, F.col("http_status"))).alias("sum_status"),
        F.min(doc_from_uri).alias("min_doc"),
        F.max(doc_from_uri).alias("max_doc"),
    )


@register(
    "html_extract_docs",
    oracle=f"""
    WITH e AS (
      SELECT doc_id, {_XT_SQL} AS text_out
      FROM documents WHERE doc_id % {_NOT_FOUND_EVERY} <> 0
    )
    SELECT doc_id, text_out,
           CAST(LENGTH(text_out) AS BIGINT) AS n_chars
    FROM e
    """,
    doc="Lossless HTML→text extraction through the FULL crawl chain: "
    "archive synthesis (documents → provably-round-trippable HTML → "
    "WARC records → per-record gzip members) then the real ingest path "
    "(member split → WARC/HTTP parse → html_to_text regex chain: head/"
    "script/style/comment drop, block tags → newlines, inline tags "
    "deleted in place, single-pass entity decode). The oracle "
    "recomputes the expected text from documents.text alone — the "
    "complete text body is value-compared, so one double-decoded "
    "entity or a tag-boundary space bug hash-mismatches. 404 fetches "
    "(doc_id % 17 = 0) are error pages and must be filtered by status. "
    "operators/html.py, sources/warc.py.",
)
def html_extract_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _extracted(spark, sf_dir).select(
        "doc_id",
        "text_out",
        F.length("text_out").cast("long").alias("n_chars"),
    )


@register(
    "crawl_curation_chain",
    oracle=f"""
    WITH e AS (
      SELECT doc_id, doc_id // {_DOCS_PER_FILE} AS file_id,
             {_XT_SQL} AS xt
      FROM documents WHERE doc_id % {_NOT_FOUND_EVERY} <> 0
    ), t AS (
      SELECT file_id,
             list_filter(regexp_split_to_array(xt, '\\s+'),
                         x -> x <> '') AS w
      FROM e
    ), b AS (
      SELECT file_id, w,
             CASE WHEN len(w) >= 2
                  THEN list_transform(range(1, len(w)),
                                      i -> w[i] || ' ' || w[i + 1])
                  ELSE [] END AS bg
      FROM t
    ), r AS (
      SELECT file_id, CAST(len(w) AS BIGINT) AS n_tokens,
             (len(w) >= 20 AND len(w) <= 5000
              AND len(list_distinct(w)) / NULLIF(len(w), 0) >= 0.35
              AND COALESCE(
                    list_max(list_transform(list_distinct(bg),
                        x -> len(list_filter(bg, y -> y = x))))
                      / NULLIF(len(bg), 0) <= 0.20, TRUE)
              AND len(list_filter(w,
                        x -> x IN ('the','a','of','and','to')))
                      / NULLIF(len(w), 0) >= 0.01) AS keep
      FROM b
    )
    SELECT file_id,
           CAST(COUNT(*) AS BIGINT) AS n_fetched,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(COALESCE(SUM(CASE WHEN keep THEN n_tokens END), 0)
                AS BIGINT) AS tokens_kept
    FROM r GROUP BY file_id
    """,
    doc="End-to-end crawl→curation chain: .warc.gz archives → record "
    "split → status filter → html_to_text → the existing Gopher-style "
    "composite quality gate (text.quality_filter — length bounds, "
    "distinct-token ratio, top-bigram share, stopword ratio) → "
    "per-archive keep accounting. The oracle replays BOTH halves in "
    "SQL: the lossless extraction formula and all five gate rules over "
    "it. This is the front-door composition a training-data build runs "
    "first at 100 TB: one documents scan, archive-independent synth, "
    "zero-shuffle split+extract+gate, one tiny per-file aggregate. "
    "sources/warc.py, operators/html.py, operators/text.py.",
)
def crawl_curation_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text

    ex = _extracted(spark, sf_dir)
    qf = text.quality_filter(
        ex, text_col="text_out", id_col="doc_id", keep_cols=("file_id",)
    )
    return qf.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_fetched"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.coalesce(
            F.sum(F.when(F.col("keep"), F.col("n_tokens"))), F.lit(0)
        )
        .cast("long")
        .alias("tokens_kept"),
    )


@register(
    "interleaved_mm_spans",
    # Image geometry + pixel sums regenerated in SQL from the synth
    # formula (multimodal.synth_png_assets: w = 8 + d%5, h = 6 + d%4,
    # pixel (r,c) = (d*31 + r*17 + c*7) % 256), patch tokens =
    # ceil(h/4)*ceil(w/4); the packer's prefix/cut arithmetic replayed
    # exactly like the training_sequence_spans oracle.
    oracle=r"""
    WITH geo AS (
      SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 4 AS h
      FROM documents
    ), px AS (
      SELECT g.doc_id,
             SUM((g.doc_id * 31 + r.r * 17 + c.c * 7) % 256) AS ps,
             ANY_VALUE(((g.h + 3) // 4) * ((g.w + 3) // 4)) AS n_img
      FROM geo g, UNNEST(range(g.h)) AS r(r), UNNEST(range(g.w)) AS c(c)
      GROUP BY g.doc_id
    ), txt AS (
      SELECT doc_id, source,
             len(list_filter(regexp_split_to_array(text, '\s+'),
                             x -> x <> '')) AS n_txt
      FROM documents
    ), segs AS (
      SELECT t.source, t.doc_id, t.doc_id * 2 AS seg_key,
             'image' AS modality, p.n_img AS n, p.ps AS img_pixel_sum
      FROM txt t JOIN px p USING (doc_id)
      UNION ALL
      SELECT source, doc_id, doc_id * 2 + 1, 'text', n_txt, NULL
      FROM txt WHERE n_txt > 0
    ), s AS (
      SELECT source, doc_id, modality, n, img_pixel_sum,
             COALESCE(SUM(n) OVER (PARTITION BY source ORDER BY seg_key
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS st
      FROM segs
    ), e AS (
      SELECT *, unnest(range(CAST(st // 64 AS BIGINT),
                             CAST((st + n - 1) // 64 + 1 AS BIGINT)))
                  AS seq_id
      FROM s
    )
    SELECT source, CAST(seq_id AS BIGINT) AS seq_id, doc_id, modality,
           CAST(GREATEST(st, seq_id * 64) - seq_id * 64 AS BIGINT)
             AS seq_start,
           CAST(GREATEST(st, seq_id * 64) - st AS BIGINT) AS seg_offset,
           CAST(LEAST(st + n, seq_id * 64 + 64)
                - GREATEST(st, seq_id * 64) AS BIGINT) AS chunk_len,
           CAST(img_pixel_sum AS BIGINT) AS img_pixel_sum
    FROM e
    """,
    doc="Image-text interleaved training manifest (VERDICT r13 #5) — "
    "the multimodal analog of training_sequence_spans: per document, "
    "REAL PNG decode (synth asset -> png_codec inflate/unfilter -> "
    "png_patch_grid) yields the ViT patch-token count from the DECODED "
    "raster, interleaved [image patches][text tokens] per doc, "
    "concatenated per source and cut every 64 positions into the "
    "(sequence, segment chunk) boundary map a multimodal trainer needs "
    "for attention/loss masks. Image chunks carry the decoded pixel "
    "sum, so the oracle (which regenerates geometry, pixel sums and "
    "the full packing arithmetic from first principles) catches a "
    "one-byte decode error AND a one-token packing error. Shape: one "
    "documents scan per modality side, zero-shuffle decode, the "
    "two-phase bounded prefix scan (never an unbounded corpus window), "
    "bounded explode. operators/multimodal.py::png_patch_grid, "
    "operators/packing.py::pack_interleaved.",
)
def interleaved_mm_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import multimodal, packing
    from ..operators.materialize import checkpoint_tracked
    from ..operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    img = multimodal.png_patch_grid(
        multimodal.synth_png_assets(docs)
    ).withColumnRenamed("asset_id", "doc_id")
    txt = docs.select(
        "doc_id", "source", token_count("text").alias("n_txt")
    )
    # checkpoint the decode+join frame: the segment union reads it twice
    # and the packer's build-time stats agg a third time — without this
    # the Python decode chain re-executes per consumer
    j = checkpoint_tracked(txt.join(img, "doc_id"))
    segs = j.select(
        "source",
        "doc_id",
        (F.col("doc_id") * 2).alias("seg_key"),
        F.lit("image").alias("modality"),
        F.col("n_patches").alias("n_tokens"),
        F.col("pixel_sum").alias("img_pixel_sum"),
    ).unionAll(
        j.select(
            "source",
            "doc_id",
            (F.col("doc_id") * 2 + 1).alias("seg_key"),
            F.lit("text").alias("modality"),
            F.col("n_txt").alias("n_tokens"),
            F.lit(None).cast("long").alias("img_pixel_sum"),
        )
    )
    return packing.pack_interleaved(
        segs, seq_len=64,
        keep_cols=("doc_id", "modality", "img_pixel_sum"),
    )
