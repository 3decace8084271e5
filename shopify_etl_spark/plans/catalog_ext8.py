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
from .catalog_ext6 import _DOCS_PER_FILE, _NOT_FOUND_EVERY, _XT_SQL
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


@register(
    "warc_revisit_resolution",
    oracle=f"""
    SELECT doc_id,
           TRUE AS resolved,
           TRUE AS refers_to_match,
           CAST(0 AS BIGINT) AS revisit_body_bytes,
           CAST(LENGTH({_XT_SQL}) AS BIGINT) AS saved_chars
    FROM documents
    WHERE doc_id % {_NOT_FOUND_EVERY} <> 0 AND doc_id % 20 = 14
    """,
    doc="WARC revisit resolution (VERDICT r15 #4) — the one real-dump "
    "record type the engine had not seen: Common Crawl deduplicates "
    "byte-identical re-fetches as WARC-Type: revisit records carrying "
    "WARC-Refers-To (the original response's record id) and "
    "WARC-Payload-Digest instead of re-storing the body (zero payload "
    "bytes — that is the format's point). The synthesis "
    "(revisits=True) converts the id%20==14 byte-identical re-fetches "
    "to exactly that shape; the query resolves each revisit against "
    "the stored responses by DIGEST JOIN (md5 of the decoded payload "
    "— the same digest cdx_records computes), cross-checks the "
    "refers-to record id, and values the resolution by the referenced "
    "page's extracted char mass. The oracle re-derives the revisit "
    "doc set from the synthesis formula, pins resolved/"
    "refers_to_match literal TRUE (a digest mismatch, a missed "
    "original, or a record-id drift flips them) and revisit_body_"
    "bytes literal 0 (bodies must NOT ride revisits), and recomputes "
    "saved_chars from documents alone. Scale shape: the revisit side "
    "is a small fraction of the corpus; the digest join is one "
    "equi-join on an 32-hex key; the record table is checkpointed "
    "(two consumers, the splitter runs once). "
    "sources/warc.py (revisits=True), parse_record refers_to/"
    "payload_digest columns.",
)
def warc_revisit_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.html import html_to_text
    from ..operators.materialize import checkpoint_tracked
    from ..sources import warc

    docs = load_table(spark, sf_dir, "documents")
    files = warc.synth_warc_files(
        docs, docs_per_file=_DOCS_PER_FILE,
        not_found_every=_NOT_FOUND_EVERY, rich_uris=True, refetch=True,
        revisits=True,
    )
    recs = checkpoint_tracked(warc.warc_records(files))
    revisit = recs.filter(F.col("warc_type") == "revisit").select(
        # the revisit rides the MESSY re-fetch spelling (trailing
        # slash + fragment), so the id is not $-anchored
        F.regexp_extract("target_uri", r"/doc/(\d+)", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("refers_to"),
        F.regexp_replace("payload_digest", "^md5:", "").alias("_dg"),
        F.length("payload").cast("long").alias("revisit_body_bytes"),
    )
    originals = recs.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & warc.is_decoded(F.col("http_encoding"))
    ).select(
        F.col("record_id"),
        F.md5("payload").alias("_dg"),
        F.length(html_to_text(warc.payload_text()))
        .cast("long")
        .alias("saved_chars"),
    )
    return revisit.join(originals, "_dg", "left").select(
        "doc_id",
        F.col("record_id").isNotNull().alias("resolved"),
        (F.col("refers_to") == F.col("record_id")).alias(
            "refers_to_match"
        ),
        "revisit_body_bytes",
        "saved_chars",
    )


@register(
    "cdx_surt_lookup",
    oracle=f"""
    SELECT doc_id,
           'example,host' || CAST(doc_id % 7 AS VARCHAR) || ')/sec' ||
             CAST(doc_id % 13 AS VARCHAR) || '/doc/' ||
             CAST(doc_id AS VARCHAR) AS surt,
           TRUE AS resolved,
           CAST(LENGTH({_XT_SQL}) AS BIGINT) AS recovered_chars
    FROM documents
    WHERE doc_id % {_NOT_FOUND_EVERY} <> 0 AND doc_id % 50 = 3
    """,
    doc="SURT-keyed CDX lookup + ranged-read recovery (VERDICT r15 #6) "
    "— the consumer story a CDX index exists for: given a MESSY URL "
    "spelling (uppercase scheme/host, explicit :80, doubled+trailing "
    "slashes, a fragment), canonicalize → SURT key (functions/urls.py::"
    "surt_key — host labels reversed, the form real web-archive "
    "indexes sort by) → broadcast-join the key set against the index "
    "(cdx_records now carries the surt column) → resolve (file_id, "
    "offset, comp_len) → fetch_record_ranges decompresses ONLY "
    "blob[offset:offset+len] (one self-contained gzip member — at "
    "production an object-store ranged GET; the archive is never "
    "streamed) → parse → extract. The oracle re-derives the lookup "
    "doc set (doc_id % 50 == 3, non-404), the SURT key VALUE, and the "
    "recovered page's extracted char mass from documents alone, and "
    "pins resolved (self_contained ∧ HTTP 200) literal TRUE — a "
    "canonicalization drift, a wrong coordinate, or a non-clean slice "
    "hash-mismatches. Scale shape: the key set broadcasts to the "
    "index AND to the archives; the fetch is a zero-shuffle "
    "mapInPandas whose memory is one record. sources/warc.py::"
    "cdx_records,fetch_record_ranges, functions/urls.py::surt_key.",
)
def cdx_surt_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.urls import surt_key
    from ..operators.html import html_to_text
    from ..operators.materialize import checkpoint_tracked
    from ..sources import warc

    docs = load_table(spark, sf_dir, "documents")
    # two consumers of the synthesized archives (index build + the
    # blob side of the ranged fetch): checkpoint so synthesis runs once
    files = checkpoint_tracked(
        warc.synth_warc_files(
            docs, docs_per_file=_DOCS_PER_FILE,
            not_found_every=_NOT_FOUND_EVERY, rich_uris=True,
        )
    )
    # the lookup set arrives as MESSY spellings — canonicalization is
    # part of the lookup contract, not a fixture convenience
    d = F.col("doc_id")
    messy = F.concat(
        F.lit("HTTP://HOST"), (d % 7).cast("string"),
        F.lit(".EXAMPLE:80//sec"), (d % 13).cast("string"),
        F.lit("//doc/"), d.cast("string"), F.lit("/#frag"),
    )
    keys = docs.filter(
        (d % 50 == 3) & (d % _NOT_FOUND_EVERY != 0)
    ).select("doc_id", surt_key(messy).alias("surt"))
    idx = warc.cdx_records(files).filter(
        F.col("warc_type") == "response"
    ).select("surt", "file_id", "offset", "comp_len")
    hits = idx.join(F.broadcast(keys), "surt").select(
        "surt", "file_id", "offset", "comp_len"
    )
    ranged = warc.fetch_record_ranges(
        files.join(F.broadcast(hits), "file_id")
    )
    # doc identity rides the SURT key itself (…)/doc/{id}) — no second
    # pass over documents for the recovery side
    return ranged.select(
        F.regexp_extract("surt", r"/doc/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        "surt",
        (
            F.col("self_contained") & (F.col("http_status") == 200)
        ).alias("resolved"),
        F.length(html_to_text(warc.payload_text()))
        .cast("long")
        .alias("recovered_chars"),
    )
