"""Round-16 extension queries — closing the remaining real-dump seams
the round-15 verdict ranked (VERDICT r15 asks #1/#3/#4/#5/#6):

* ``crawl_encoding_routing`` — the transport-routing accounting gate:
  archives carry the full real-dump transport mix INCLUDING an
  unknown-codec leg (``Content-Encoding: br`` bodies the parser
  passes through labeled-but-compressed), and every extraction front
  must route undecoded records OUT and COUNT them — the oracle pins
  extracted-vs-skipped counts per encoding label, so a front that
  silently feeds compressed bytes to ``html_to_text`` (garbling chars)
  or silently drops them (losing counts) hash-mismatches either way.
* ``warc_revisit_resolution`` — the real Common Crawl dedup format:
  ``WARC-Type: revisit`` records referencing earlier byte-identical
  responses resolve against them by payload digest, accounting the
  bytes the crawler saved.
* ``robots_agent_groups`` — RFC 9309 §2.2.1 group selection: rules
  live in per-User-agent groups, and a fetcher obeys the MOST SPECIFIC
  matching group only (``*`` as fallback), before longest-match.
* ``cdx_surt_lookup`` — the consumer story CDX exists for: resolve a
  canonical (SURT-keyed) URL to (file, offset, length) through the
  index and recover THE one record by ranged read.
* ``training_shard_export_bpe`` — subword twin of the shard export:
  frozen BPE merges (trained once, broadcast) re-tokenize the corpus
  and the same shard/checksum/publish machinery packs the ids.

Scale shapes are inherited from the ext6/ext7 chains: zero-shuffle
split/extract with tiny per-label aggregates; the revisit resolution is
one digest-keyed join between a revisit-sized side and responses; the
SURT lookup is a broadcast join against the index; the BPE export's
only Python is the KB-sized per-shard packer plus the Arrow BPE-apply
codec already gated elsewhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table, register
from .catalog_ext6 import _DOCS_PER_FILE, _NOT_FOUND_EVERY
from .catalog_ext7 import _UNKNOWN_ENC_EVERY, _XT_LATIN_SQL


@register(
    "crawl_encoding_routing",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % {_UNKNOWN_ENC_EVERY} = 6 THEN 'br'
                  ELSE CASE doc_id % 5
                    WHEN 0 THEN 'identity'
                    WHEN 1 THEN 'chunked'
                    WHEN 2 THEN 'gzip'
                    WHEN 3 THEN 'deflate'
                    ELSE 'chunked+gzip' END END AS enc,
             CASE WHEN doc_id % {_UNKNOWN_ENC_EVERY} = 6 THEN 0
                  ELSE LENGTH({_XT_LATIN_SQL}) END AS chars
      FROM documents WHERE doc_id % {_NOT_FOUND_EVERY} <> 0
    )
    SELECT enc,
           CAST(COUNT(*) AS BIGINT) AS n_fetches,
           CAST(SUM(CASE WHEN enc = 'br' THEN 0 ELSE 1 END) AS BIGINT)
             AS n_extracted,
           CAST(SUM(CASE WHEN enc = 'br' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_skipped,
           CAST(SUM(chars) AS BIGINT) AS extracted_chars
    FROM d GROUP BY enc
    """,
    doc="Transport-encoding routing with skipped-record accounting "
    "(VERDICT r15 #1 — the last silent-corruption path from a real "
    "dump): the synthesis plants the full transport mix PLUS an "
    "unknown-codec leg (doc_id % 9 == 6 ships Content-Encoding: br — "
    "genuinely compressed raw-deflate bytes the parser passes through "
    "LABELED, never decoded), and the ingest front routes on "
    "warc.is_decoded: fully-decoded labels (identity/chunked/gzip/"
    "deflate and + combinations) extract through payload_text → "
    "html_to_text, everything else is SKIPPED AND COUNTED — the "
    "permissive-mode accounting philosophy applied to transport. The "
    "oracle recomputes per-label fetch/extracted/skipped counts and "
    "the extracted char mass from documents alone, so a front that "
    "feeds compressed bytes to extraction (garbled chars) or silently "
    "drops unknown-codec records (lost counts) hash-mismatches either "
    "way. The same predicate guards _extracted, curate_archives, "
    "curate_archives_mm and the language router. ONE shuffle beyond "
    "the synth grouping (the per-label aggregate). "
    "sources/warc.py::is_decoded,parse_record.",
)
def crawl_encoding_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.html import html_to_text
    from ..sources import warc

    docs = load_table(spark, sf_dir, "documents")
    files = warc.synth_warc_files(
        docs, docs_per_file=_DOCS_PER_FILE,
        not_found_every=_NOT_FOUND_EVERY, http_variants=True,
        unknown_encoding_every=_UNKNOWN_ENC_EVERY,
    )
    ok = warc.warc_records(files).filter(
        (F.col("warc_type") == "response") & (F.col("http_status") == 200)
    )
    dec = warc.is_decoded(F.col("http_encoding"))
    routed = ok.select(
        F.col("http_encoding").alias("enc"),
        dec.alias("_dec"),
        F.when(dec, F.length(html_to_text(warc.payload_text())))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("_chars"),
    )
    return routed.groupBy("enc").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum(F.col("_dec").cast("long")).alias("n_extracted"),
        F.sum((~F.col("_dec")).cast("long")).alias("n_skipped"),
        F.sum("_chars").alias("extracted_chars"),
    )
