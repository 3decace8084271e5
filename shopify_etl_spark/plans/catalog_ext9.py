"""Round-17 extension queries — the remaining real-dump seams the
round-16 verdict ranked (VERDICT r16 asks #1-#7):

* ``crawl_decoder_registry`` — transport decoding as a pluggable seam:
  the SAME fixture yields labeled-skip accounting with an empty
  decoder registry and full extraction with a registered codec (the
  fake raw-deflate decoder standing in for brotli), both arms pinned
  in one oracle. Routing-out was r16's correct first step; decoding
  when a codec is available is the end state — on a real dump br is
  ~25-40% of the corpus.
* ``crawl_redirect_resolution`` — 3xx legs with ``Location:`` headers:
  bounded-hop chain following over canonical keys, crediting content
  to the final target and accounting hops/loops/dangling ends.
* ``cdxj_export_roundtrip`` — the CDX derivative as an ARTIFACT:
  SURT-sorted CDXJ text shards written, parsed back, and the ranged
  lookup driven THROUGH the parsed file; per-shard sortedness pinned.
* ``crawl_dedup_revisit`` — revisit-aware curation: the canonical-URL
  dedup chain consuming revisit records (a resolved revisit counts as
  a fetch reference, not a lost page) with digest accounting that
  needs no payload join at all.
* ``warc_request_pairing`` — request records + ``WARC-Concurrent-To``:
  per-fetch request↔response pairing with orphan accounting (the
  lost-response leg a real crawler's failure log carries).
* ``sitemap_recrawl_priority`` — the sitemapindex layer + per-URL
  ``<lastmod>``: index → shard → loc traversal joined against the
  crawl's fetch dates, ranking stale pages per host.

Scale shapes follow the ext6-ext8 chains: zero-shuffle split/extract
with tiny per-label/per-host aggregates; the redirect chase is K
bounded self-joins on canonical keys over a redirect-sized frame; the
CDXJ pack/sort is per-shard (collect_list bounded by one archive's
records); pairing is one equi-join of id-sized rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table, register
from .catalog_ext6 import _DOCS_PER_FILE, _NOT_FOUND_EVERY, _XT_SQL
from .catalog_ext7 import _UNKNOWN_ENC_EVERY, _XT_LATIN_SQL

_ENC_CASE_SQL = f"""
      CASE WHEN doc_id % {_UNKNOWN_ENC_EVERY} = 6 THEN 'br'
           ELSE CASE doc_id % 5
             WHEN 0 THEN 'identity'
             WHEN 1 THEN 'chunked'
             WHEN 2 THEN 'gzip'
             WHEN 3 THEN 'deflate'
             ELSE 'chunked+gzip' END END
"""


@register(
    "crawl_decoder_registry",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             {_ENC_CASE_SQL} AS enc,
             CASE WHEN doc_id % {_UNKNOWN_ENC_EVERY} = 6
                  THEN LENGTH({_XT_SQL})
                  ELSE LENGTH({_XT_LATIN_SQL}) END AS chars
      FROM documents WHERE doc_id % {_NOT_FOUND_EVERY} <> 0
    ), r AS (
      SELECT 'empty' AS registry UNION ALL SELECT 'registered'
    )
    SELECT registry, enc,
           CAST(COUNT(*) AS BIGINT) AS n_fetches,
           CAST(SUM(CASE WHEN enc <> 'br' OR registry = 'registered'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_extracted,
           CAST(SUM(CASE WHEN enc = 'br' AND registry = 'empty'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
           CAST(SUM(CASE WHEN enc <> 'br' OR registry = 'registered'
                    THEN chars ELSE 0 END) AS BIGINT) AS extracted_chars
    FROM d CROSS JOIN r GROUP BY registry, enc
    """,
    doc="Pluggable transport-decoder registry (VERDICT r16 #1 — the "
    "end state of transport routing): r16 routed unknown-codec "
    "records OUT and counted them, but on a real dump ~25-40% of "
    "pages are brotli and a deployment with the codec installed must "
    "DECODE them, not discard a third of the corpus. The seam is a "
    "label→decoder map passed through the splitter's Arrow closure "
    "(warc_records(decoders=…) → parse_record — closure-captured, so "
    "driver and executors can never disagree; module-state mutation "
    "would silently not propagate to Python workers) plus the "
    "matching is_decoded(extra=…) routing labels; "
    "default_transport_decoders() populates from importable optional "
    "dependencies (brotli/zstandard — the Pillow/ref_codecs "
    "two-backend discipline). The gate runs BOTH arms over ONE "
    "checkpointed fixture: with an empty registry the br leg is "
    "skipped-and-counted (the r16 behavior, still pinned), and with "
    "the FAKE registered codec (raw_deflate_decoder under 'br' — the "
    "synth stand-in bytes are raw deflate, so the decode path runs "
    "with zero new dependencies) the same records extract with full "
    "char mass. The oracle pins per-(registry, label) fetch/extracted/"
    "skipped counts and char mass, so silent garbling, silent "
    "dropping, OR a decoder that corrupts bytes all hash-mismatch. "
    "Two zero-shuffle split arms + ONE aggregate. "
    "sources/warc.py::default_transport_decoders,raw_deflate_decoder,"
    "parse_record(decoders=),is_decoded(extra=).",
)
def crawl_decoder_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.html import html_to_text
    from ..operators.materialize import checkpoint_tracked
    from ..sources import warc

    docs = load_table(spark, sf_dir, "documents")
    # two splitter arms consume the same archives: checkpoint so
    # synthesis runs once
    files = checkpoint_tracked(
        warc.synth_warc_files(
            docs, docs_per_file=_DOCS_PER_FILE,
            not_found_every=_NOT_FOUND_EVERY, http_variants=True,
            unknown_encoding_every=_UNKNOWN_ENC_EVERY,
        )
    )

    def arm(tag: str, decoders: dict, extra: tuple) -> DataFrame:
        ok = warc.warc_records(files, decoders=decoders).filter(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
        )
        dec = warc.is_decoded(F.col("http_encoding"), extra=extra)
        return ok.select(
            F.lit(tag).alias("registry"),
            F.col("http_encoding").alias("enc"),
            dec.alias("_dec"),
            F.when(dec, F.length(html_to_text(warc.payload_text())))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("_chars"),
        )

    routed = arm("empty", {}, ()).unionByName(
        arm(
            "registered", {"br": warc.raw_deflate_decoder}, ("br",)
        )
    )
    return routed.groupBy("registry", "enc").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum(F.col("_dec").cast("long")).alias("n_extracted"),
        F.sum((~F.col("_dec")).cast("long")).alias("n_skipped"),
        F.sum("_chars").alias("extracted_chars"),
    )


def _redirect_edges(recs: DataFrame) -> DataFrame:
    """Canonical redirect edge map (src → Location target) shared by
    the redirect queries — LATEST capture wins per source (real dumps
    capture the same 3xx URL repeatedly, sometimes with a CHANGED
    Location; without the per-src collapse every duplicate capture
    multiplies chain rows through each extension join and over-credits
    aliases), and CHECKPOINTED: the bounded chase references the edge
    frame once per round, so materializing the redirect-sized collapse
    keeps each round a scan instead of a re-aggregation."""
    from ..functions.urls import canonicalize_url
    from ..operators.materialize import checkpoint_tracked

    return checkpoint_tracked(
        recs.filter(
            F.col("http_status").between(300, 399)
            & F.col("http_location").isNotNull()
        )
        .select(
            canonicalize_url("target_uri").alias("_s"),
            canonicalize_url("http_location").alias("_d"),
            "file_id",
            "rec_index",
        )
        .groupBy("_s")
        .agg(
            F.max_by(
                "_d", F.struct("file_id", "rec_index")
            ).alias("_d")
        )
    )


def _follow_chains(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Bounded-hop redirect chase shared by the redirect queries:
    ``edges`` is (``_s`` → ``_d``) canonical-key redirect rows; output
    is one row per chain start — (src, dst, hops, looped). Each round
    follows ``dst`` through the edge map when it is itself a redirect
    source; a target already in the visited array flags a loop and
    freezes the chain. ``rounds`` extension joins → chains of up to
    ``rounds + 1`` hops (4 by default — the crawler policy bound, not
    a data-size fixpoint)."""
    chains = edges.select(
        F.col("_s").alias("src"),
        F.col("_d").alias("dst"),
        F.lit(1).cast("long").alias("hops"),
        F.array("_s").alias("_seen"),
        F.lit(False).alias("looped"),
    )
    for _ in range(rounds):
        nxt = edges.select(
            F.col("_s").alias("_ns"), F.col("_d").alias("_nd")
        )
        joined = chains.join(
            nxt, chains["dst"] == nxt["_ns"], "left"
        )
        can = F.col("_nd").isNotNull() & ~F.col("looped")
        revisits_seen = can & F.array_contains("_seen", F.col("_nd"))
        advance = can & ~F.array_contains("_seen", F.col("_nd"))
        chains = joined.select(
            "src",
            F.when(advance, F.col("_nd")).otherwise(F.col("dst")).alias(
                "dst"
            ),
            F.when(advance, F.col("hops") + 1)
            .otherwise(F.col("hops"))
            .alias("hops"),
            F.when(advance, F.array_append("_seen", F.col("dst")))
            .otherwise(F.col("_seen"))
            .alias("_seen"),
            (F.col("looped") | revisits_seen).alias("looped"),
        )
    return chains.select("src", "dst", "hops", "looped")


@register(
    "crawl_redirect_resolution",
    oracle=f"""
    WITH d AS (
      SELECT doc_id FROM documents
      WHERE doc_id % {_NOT_FOUND_EVERY} <> 0
    )
    SELECT doc_id, 'r' AS kind, CAST(1 AS BIGINT) AS hops,
           'resolved' AS outcome
    FROM d WHERE doc_id % 11 = 5
    UNION ALL
    SELECT doc_id, 'rr', CAST(2 AS BIGINT), 'resolved'
    FROM d WHERE doc_id % 33 = 5
    UNION ALL
    SELECT doc_id, 'loopA', CAST(1 AS BIGINT), 'loop'
    FROM d WHERE doc_id % 33 = 16
    UNION ALL
    SELECT doc_id, 'loopB', CAST(1 AS BIGINT), 'loop'
    FROM d WHERE doc_id % 33 = 16
    UNION ALL
    SELECT doc_id, 'dg', CAST(1 AS BIGINT), 'dangling'
    FROM d WHERE doc_id % 33 = 27
    """,
    doc="HTTP redirect-chain resolution (VERDICT r16 #2): real dumps "
    "are ~15-20% 3xx responses carrying Location: headers, and a "
    "crawl consumer must follow chains to credit content to the "
    "final canonical URL — and detect the chains that never get "
    "there. The synthesis (redirects=True) plants four leg shapes "
    "per the oracle formulas: 1-hop 301→canonical (id%11==5), 2-hop "
    "302→301→canonical (id%33==5), a 2-cycle loop (id%33==16, "
    "loopA⇄loopB), and a dangling 301 into a never-fetched URL "
    "(id%33==27). The resolver is a BOUNDED-hop iterated self-join "
    "(4 hops — the policy browsers/crawlers apply, not an unbounded "
    "fixpoint) on CANONICAL keys over the redirect-sized edge frame: "
    "each round follows dst through the redirect map, carries the "
    "visited array, and flags a loop when the next target is already "
    "seen; afterwards the final URL joins the 200-content set to "
    "split resolved from dangling. The oracle re-derives every "
    "chain's hop count and outcome class from the synthesis "
    "formulas, so a mis-followed Location, an uncanonicalized join "
    "key, a missed loop, or an over-deep chase hash-mismatches. "
    "Scale shape: the record table is checkpointed (split once); "
    "chains/edges are redirect-sized (~15% of fetches), each of the "
    "4 bounded rounds is one equi-join of (url,url) rows — payloads "
    "never ride any of it; the content probe is one more key join. "
    "Reference analog: the HTTP layer of S1 follows redirects before "
    "pagination sees a page (extract_table.py _make_request). "
    "sources/warc.py (redirects=True, http_location), "
    "functions/urls.py::canonicalize_url.",
)
def crawl_redirect_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.urls import canonicalize_url
    from ..operators.materialize import checkpoint_tracked
    from ..sources import warc

    docs = load_table(spark, sf_dir, "documents")
    files = warc.synth_warc_files(
        docs, docs_per_file=_DOCS_PER_FILE,
        not_found_every=_NOT_FOUND_EVERY, rich_uris=True, redirects=True,
    )
    recs = checkpoint_tracked(
        warc.warc_records(files).filter(F.col("warc_type") == "response")
    )
    edges = _redirect_edges(recs)
    content = recs.filter(
        (F.col("http_status") == 200)
        & warc.is_decoded(F.col("http_encoding"))
    ).select(canonicalize_url("target_uri").alias("_c")).distinct()

    chains = _follow_chains(edges)
    resolved = chains.join(
        content, chains["dst"] == content["_c"], "left"
    ).select(
        F.regexp_extract("src", r"/doc/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        F.regexp_extract("src", r"/(r|rr|loopA|loopB|dg)/doc/", 1).alias(
            "kind"
        ),
        "hops",
        F.when(F.col("looped"), F.lit("loop"))
        .when(F.col("_c").isNotNull(), F.lit("resolved"))
        .otherwise(F.lit("dangling"))
        .alias("outcome"),
    )
    return resolved


@register(
    "warc_request_pairing",
    oracle=f"""
    SELECT doc_id,
           NOT (doc_id % 23 = 9 AND doc_id % {_NOT_FOUND_EVERY} <> 0)
             AS paired,
           NOT (doc_id % 23 = 9 AND doc_id % {_NOT_FOUND_EVERY} <> 0)
             AS uri_match,
           CASE WHEN doc_id % 23 = 9 AND doc_id % {_NOT_FOUND_EVERY} <> 0
                  THEN NULL
                WHEN doc_id % {_NOT_FOUND_EVERY} = 0 THEN 404
                ELSE 200 END AS status
    FROM documents
    """,
    doc="WARC request records + WARC-Concurrent-To pairing (VERDICT "
    "r16 #5 — the last real-dump record type the engine had not "
    "modeled): real dumps interleave request records whose "
    "WARC-Concurrent-To header names the response captured in the "
    "same fetch, and a consumer joins the two to reconstruct "
    "per-fetch context — and to find ORPHANED requests (the fetch "
    "was attempted, no response was captured: the crawler's failure "
    "log). The synthesis (request_pairing=True) stamps every request "
    "with its response's record id; lost_responses_every=23 OMITS "
    "the response for non-404 docs with id%23==9. The query joins "
    "request→response on the REAL pairing key (concurrent_to == "
    "record_id — not the URI, which is the thing being "
    "cross-checked), then verifies the paired response's target URI "
    "matches the request's (a header pointing at the wrong record "
    "flips uri_match) and surfaces the response status. The oracle "
    "re-derives paired/uri_match/status per doc from the synthesis "
    "formulas — a dropped request record, a mis-parsed header, or a "
    "lossy join flips a row. Scale shape: ONE equi-join on the "
    "record-id key; both sides are id-plus-two-string rows "
    "(payloads projected away before the exchange). "
    "sources/warc.py (request_pairing=True, concurrent_to).",
)
def warc_request_pairing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.materialize import checkpoint_tracked
    from ..sources import warc

    docs = load_table(spark, sf_dir, "documents")
    files = warc.synth_warc_files(
        docs, docs_per_file=_DOCS_PER_FILE,
        not_found_every=_NOT_FOUND_EVERY, rich_uris=True,
        request_pairing=True, lost_responses_every=23,
    )
    recs = checkpoint_tracked(warc.warc_records(files))
    reqs = recs.filter(F.col("warc_type") == "request").select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("target_uri").alias("_req_uri"),
        F.col("concurrent_to"),
    )
    resps = recs.filter(F.col("warc_type") == "response").select(
        F.col("record_id"),
        F.col("target_uri").alias("_resp_uri"),
        F.col("http_status"),
    )
    return reqs.join(
        resps, reqs["concurrent_to"] == resps["record_id"], "left"
    ).select(
        "doc_id",
        F.col("record_id").isNotNull().alias("paired"),
        F.coalesce(
            F.col("_req_uri") == F.col("_resp_uri"), F.lit(False)
        ).alias("uri_match"),
        F.col("http_status").alias("status"),
    )


@register(
    "cdxj_export_roundtrip",
    oracle=f"""
    SELECT doc_id,
           'example,host' || CAST(doc_id % 7 AS VARCHAR) || ')/sec' ||
             CAST(doc_id % 13 AS VARCHAR) || '/doc/' ||
             CAST(doc_id AS VARCHAR) AS surt,
           TRUE AS resolved,
           CAST(LENGTH({_XT_SQL}) AS BIGINT) AS recovered_chars,
           TRUE AS shard_sorted
    FROM documents
    WHERE doc_id % {_NOT_FOUND_EVERY} <> 0 AND doc_id % 40 = 7
    """,
    doc="CDXJ file export round-trip (VERDICT r16 #3 — the derivative "
    "trio AS ARTIFACTS): WET and WAT already round-trip through real "
    ".warc.*.gz archives; CDX existed only as a DataFrame. This chain "
    "writes the index as SURT-SORTED CDXJ text shards (cdxj_shards — "
    "pure JVM collect_list/array_sort/array_join per archive; the "
    "sort is the format's entire point, a CDXJ file is "
    "binary-searchable by key), parses the FILES back (parse_cdxj — "
    "split/regexp/from_json, zero Python), pins per-shard sortedness "
    "SQL-side (the parsed line positions must carry a monotone key "
    "sequence — an unsorted writer flips shard_sorted), and then "
    "drives the FULL lookup chain THROUGH the parsed artifact: messy "
    "URL → surt_key → join against the PARSED index → ranged fetch "
    "of one gzip member → extraction. The oracle re-derives the "
    "lookup set (doc_id % 40 == 7, non-404), the SURT value, and the "
    "recovered char mass from documents alone and pins resolved + "
    "shard_sorted TRUE. Scale shape: the shard pack/sort is bounded "
    "by ONE archive's index lines (KB — coordinates, never "
    "payloads); the lookup key set broadcasts to the parsed index "
    "and the archives; the ranged fetch is zero-shuffle. "
    "sources/warc.py::cdxj_shards,parse_cdxj,fetch_record_ranges.",
)
def cdxj_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.urls import surt_key
    from ..operators.html import html_to_text
    from ..operators.materialize import checkpoint_tracked
    from ..sources import warc

    docs = load_table(spark, sf_dir, "documents")
    # two consumers of the archives (index build + ranged-fetch blobs)
    files = checkpoint_tracked(
        warc.synth_warc_files(
            docs, docs_per_file=_DOCS_PER_FILE,
            not_found_every=_NOT_FOUND_EVERY, rich_uris=True,
        )
    )
    idx = warc.cdx_records(files).filter(
        F.col("warc_type") == "response"
    )
    # write the artifact, then CONSUME ONLY the parsed-back file —
    # the in-memory index frame never feeds the lookup
    parsed = checkpoint_tracked(warc.parse_cdxj(warc.cdxj_shards(idx)))
    w = Window.partitionBy("file_id").orderBy("pos")
    sortedness = parsed.select(
        "file_id",
        (
            F.lag("surt").over(w).isNull()
            | (F.col("surt") >= F.lag("surt").over(w))
        ).alias("_ok"),
    ).groupBy("file_id").agg(F.every("_ok").alias("shard_sorted"))
    d = F.col("doc_id")
    messy = F.concat(
        F.lit("HTTP://HOST"), (d % 7).cast("string"),
        F.lit(".EXAMPLE:80//sec"), (d % 13).cast("string"),
        F.lit("//doc/"), d.cast("string"), F.lit("/#frag"),
    )
    keys = docs.filter(
        (d % 40 == 7) & (d % _NOT_FOUND_EVERY != 0)
    ).select("doc_id", surt_key(messy).alias("surt"))
    hits = parsed.join(F.broadcast(keys.select("surt")), "surt").select(
        "surt", "file_id", "offset", "comp_len"
    )
    ranged = warc.fetch_record_ranges(
        files.join(F.broadcast(hits), "file_id")
    )
    per_doc = ranged.join(
        F.broadcast(
            hits.select("surt", F.col("file_id").alias("_fid"))
        ),
        "surt",
    )
    return per_doc.join(
        F.broadcast(sortedness.withColumnRenamed("file_id", "_fid")),
        "_fid",
    ).select(
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
        "shard_sorted",
    )


@register(
    "crawl_dedup_revisit",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, trim(text) AS t
      FROM documents WHERE doc_id % {_NOT_FOUND_EVERY} <> 0
    )
    SELECT 'http://host' || CAST(doc_id % 7 AS VARCHAR) || '.example/sec'
             || CAST(doc_id % 13 AS VARCHAR) || '/doc/'
             || CAST(doc_id AS VARCHAR) AS canon_url,
           doc_id,
           CAST(CASE WHEN doc_id % 10 = 4 THEN 2 ELSE 1 END AS BIGINT)
             AS n_fetches,
           CAST(CASE WHEN doc_id % 20 = 4 THEN 2 ELSE 1 END AS BIGINT)
             AS n_digests,
           CAST(CASE WHEN doc_id % 20 = 14 THEN 1 ELSE 0 END AS BIGINT)
             AS n_revisits,
           TRUE AS revisits_resolved,
           CAST(LENGTH(regexp_replace(
             'Doc ' || CAST(doc_id AS VARCHAR) || ' ' || t ||
             CASE WHEN doc_id % 20 = 4 THEN ' v2' ELSE '' END ||
             ' &copy; example end', '\\s+', ' ', 'g')) AS BIGINT)
             AS kept_chars
    FROM d
    """,
    doc="Revisit-aware canonical-URL dedup (VERDICT r16 #4) — the "
    "curation integration of the revisit format: a resolved revisit "
    "is a REFERENCE to stored content, not a lost fetch, so the "
    "per-URL accounting must count it as a fetch, fold its digest "
    "into the digest set, and still select the latest FULL response "
    "as the kept revision (a revisit has no body to keep). The chain "
    "consumes revisits=True archives (id%20==4 re-fetches stay full "
    "v2 responses; id%20==14 re-fetches are headers-only revisit "
    "records), aggregates responses and revisits per canonical URL "
    "SEPARATELY, and joins the two small aggregates — NO payload "
    "ever rides a shuffle (extraction chars and md5 digests are "
    "computed in the split projection, an improvement over the "
    "url_canonical_dedup shape whose max_by carries payloads; the "
    "digest-set algebra replaces any payload join entirely). "
    "revisits_resolved pins that every revisit digest is present in "
    "its URL's response digest set (array_except — a revisit "
    "referencing content the crawl never stored would flip it). The "
    "oracle re-derives fetch/digest/revisit counts and the kept "
    "revision's char mass from documents alone. Scale shape: two "
    "per-URL aggregates of (url, 32-hex, long) rows + ONE equi-join "
    "on the canonical key. sources/warc.py (revisits=True), "
    "functions/urls.py::canonicalize_url.",
)
def crawl_dedup_revisit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.urls import canonicalize_url
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
    resp = (
        recs.filter(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            & warc.is_decoded(F.col("http_encoding"))
        )
        .select(
            canonicalize_url("target_uri").alias("canon_url"),
            "file_id",
            "rec_index",
            F.md5("payload").alias("_dg"),
            # extraction BEFORE the shuffle: only chars ride it
            F.length(html_to_text(warc.payload_text()))
            .cast("long")
            .alias("_chars"),
        )
        .groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).alias("_n_resp"),
            F.collect_set("_dg").alias("_resp_dgs"),
            F.max_by(
                "_chars", F.struct("file_id", "rec_index")
            ).alias("kept_chars"),
        )
    )
    rev = (
        recs.filter(F.col("warc_type") == "revisit")
        .select(
            canonicalize_url("target_uri").alias("canon_url"),
            F.regexp_replace("payload_digest", "^md5:", "").alias("_dg"),
        )
        .groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).alias("_n_rev"),
            F.collect_set("_dg").alias("_rev_dgs"),
        )
    )
    j = resp.join(rev, "canon_url", "left")
    empty = F.array().cast("array<string>")
    rev_dgs = F.coalesce(F.col("_rev_dgs"), empty)
    return j.select(
        "canon_url",
        F.regexp_extract("canon_url", r"/doc/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        (F.col("_n_resp") + F.coalesce(F.col("_n_rev"), F.lit(0)))
        .cast("long")
        .alias("n_fetches"),
        F.size(F.array_union("_resp_dgs", rev_dgs))
        .cast("long")
        .alias("n_digests"),
        F.coalesce(F.col("_n_rev"), F.lit(0))
        .cast("long")
        .alias("n_revisits"),
        (F.size(F.array_except(rev_dgs, F.col("_resp_dgs"))) == 0)
        .alias("revisits_resolved"),
        "kept_chars",
    )


@register(
    "sitemap_recrawl_priority",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, doc_id % 7 AS h, doc_id % 28 AS stale_days
      FROM documents
      WHERE doc_id % 3 <> 1 AND doc_id % {_NOT_FOUND_EVERY} <> 0
    )
    SELECT 'host' || CAST(h AS VARCHAR) || '.example' AS host,
           doc_id,
           CAST(stale_days AS BIGINT) AS staleness_days,
           stale_days > 0 AS stale,
           CAST(RANK() OVER (
             PARTITION BY h ORDER BY stale_days DESC, doc_id
           ) AS BIGINT) AS recrawl_rank
    FROM d
    """,
    doc="Sitemap-index traversal + <lastmod> recrawl priority (VERDICT "
    "r16 #6 — the scheduling half of the frontier story the coverage "
    "audit started): real sites publish a sitemapindex REFERENCING "
    "shards (consumers must traverse index → shard, not assume shard "
    "names), and per-URL <lastmod> against the crawl's own fetch "
    "dates is the signal that drives recrawl scheduling. The "
    "synthesis (sitemap_index=True) adds both layers; the query "
    "parses shard locations out of the INDEX responses, semi-joins "
    "the shard responses through that reference set (an unreferenced "
    "shard would be ignored — the traversal is real), zips each "
    "shard's <loc>/<lastmod> pairs (two JVM regexp_extract_all + "
    "arrays_zip — no XML library), joins listed URLs to fetched "
    "pages on the canonical key with the record's WARC-Date, and "
    "ranks each host's pages by staleness (datediff(lastmod, fetch "
    "date) — the synthesis makes id % 28 the staleness in days). The "
    "oracle re-derives host, staleness and the per-host rank from "
    "the formulas, so a skipped index hop, a mis-zipped lastmod, or "
    "a date-arithmetic bug reorders ranks and hash-mismatches. Scale "
    "shape: index/shard frames are archive-count-sized; the "
    "listed↔fetched join exchanges (url, date) rows; the per-host "
    "rank window is the deliverable (a production variant bounds it "
    "to top-N per host — documented, not silently applied). "
    "sources/warc.py (sitemap_index=True, warc_date).",
)
def sitemap_recrawl_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.urls import canonicalize_url
    from ..operators.materialize import checkpoint_tracked
    from ..sources import warc

    docs = load_table(spark, sf_dir, "documents")
    files = warc.synth_warc_files(
        docs, docs_per_file=_DOCS_PER_FILE,
        not_found_every=_NOT_FOUND_EVERY, rich_uris=True, sitemaps=True,
        sitemap_index=True,
    )
    recs = checkpoint_tracked(
        warc.warc_records(files).filter(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
        )
    )
    is_index = F.col("target_uri").rlike(r"/sitemap-index-\d+\.xml$")
    is_shard = F.col("target_uri").rlike(r"/sitemap-\d+\.xml$")
    loc_pat = F.lit(r"<loc>([^<]+)</loc>")
    # 1: the index layer names the shards a consumer may read
    shard_refs = (
        recs.filter(is_index)
        .select(
            F.explode(
                F.regexp_extract_all(
                    F.col("payload").cast("string"), loc_pat, 1
                )
            ).alias("_raw")
        )
        .select(canonicalize_url("_raw").alias("_shard_url"))
        .distinct()
    )
    # 2: shard responses reachable THROUGH the index references
    shards = recs.filter(is_shard).select(
        canonicalize_url("target_uri").alias("_shard_url"),
        F.col("payload").cast("string").alias("_xml"),
    ).join(shard_refs, "_shard_url", "semi")
    # 3: per-entry (loc, lastmod) pairs — two extract_all arrays zipped
    entries = shards.select(
        F.explode(
            F.arrays_zip(
                F.regexp_extract_all("_xml", loc_pat, F.lit(1)).alias(
                    "url"
                ),
                F.regexp_extract_all(
                    "_xml", F.lit(r"<lastmod>([^<]+)</lastmod>"), F.lit(1)
                ).alias("lastmod"),
            )
        ).alias("_e")
    ).select(
        canonicalize_url(F.col("_e.url")).alias("url"),
        F.to_date(F.col("_e.lastmod")).alias("_lastmod"),
    )
    # 4: the crawl's own fetch dates
    fetched = recs.filter(
        ~is_index & ~is_shard & warc.is_decoded(F.col("http_encoding"))
    ).select(
        canonicalize_url("target_uri").alias("url"),
        F.to_date(F.substring("warc_date", 1, 10)).alias("_fetched"),
    )
    j = entries.join(fetched, "url").select(
        F.try_parse_url("url", F.lit("HOST")).alias("host"),
        F.regexp_extract("url", r"/doc/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        F.datediff("_lastmod", "_fetched").cast("long").alias(
            "staleness_days"
        ),
    )
    w = Window.partitionBy("host").orderBy(
        F.col("staleness_days").desc(), F.col("doc_id")
    )
    return j.select(
        "host",
        "doc_id",
        "staleness_days",
        (F.col("staleness_days") > 0).alias("stale"),
        F.rank().over(w).cast("long").alias("recrawl_rank"),
    )


@register(
    "crawl_alias_crediting",
    oracle=f"""
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 33 = 5 THEN 2
                     WHEN doc_id % 11 = 5 THEN 1
                     ELSE 0 END AS BIGINT) AS n_aliases,
           CAST(CASE WHEN doc_id % 33 = 5 THEN 3
                     WHEN doc_id % 11 = 5 THEN 1
                     ELSE 0 END AS BIGINT) AS alias_hops_total,
           CAST(LENGTH({_XT_SQL}) AS BIGINT) AS content_chars
    FROM documents WHERE doc_id % {_NOT_FOUND_EVERY} <> 0
    """,
    doc="Redirect alias crediting (r17 stretch — the consumer side of "
    "chain resolution): once chains resolve, a curation pipeline "
    "credits every alias spelling's traffic/links to the FINAL "
    "canonical URL — the per-page alias count and hop mass are the "
    "link-graph correction a real crawl applies before any URL-keyed "
    "analysis. The chase (_follow_chains, shared with "
    "crawl_redirect_resolution) resolves each redirect source; "
    "resolved non-loop chains aggregate per final target (count + "
    "total hops) and LEFT-join onto the extracted content pages, so "
    "every non-404 page reports its alias mass (zero for pages "
    "nothing redirects to — loops and dangling chains credit "
    "nothing). The oracle re-derives alias counts and hop totals "
    "from the leg formulas (id%33==5 pages are credited by BOTH "
    "their /r and /rr aliases: 1+2 hops). Scale shape: the chase "
    "plus ONE aggregate of (url, hops) rows and one key join against "
    "the extracted frame — the credit table is redirect-sized, "
    "payloads never ride it. plans/catalog_ext9.py::_follow_chains.",
)
def crawl_alias_crediting(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.urls import canonicalize_url
    from ..operators.html import html_to_text
    from ..operators.materialize import checkpoint_tracked
    from ..sources import warc

    docs = load_table(spark, sf_dir, "documents")
    files = warc.synth_warc_files(
        docs, docs_per_file=_DOCS_PER_FILE,
        not_found_every=_NOT_FOUND_EVERY, rich_uris=True, redirects=True,
    )
    recs = checkpoint_tracked(
        warc.warc_records(files).filter(F.col("warc_type") == "response")
    )
    edges = _redirect_edges(recs)
    chains = _follow_chains(edges)
    credits = (
        chains.filter(~F.col("looped"))
        .groupBy("dst")
        .agg(
            F.count(F.lit(1)).alias("n_aliases"),
            F.sum("hops").alias("alias_hops_total"),
        )
    )
    content = recs.filter(
        (F.col("http_status") == 200)
        & warc.is_decoded(F.col("http_encoding"))
    ).select(
        canonicalize_url("target_uri").alias("url"),
        F.length(html_to_text(warc.payload_text()))
        .cast("long")
        .alias("content_chars"),
    )
    return content.join(
        credits, content["url"] == credits["dst"], "left"
    ).select(
        F.regexp_extract("url", r"/doc/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        F.coalesce("n_aliases", F.lit(0)).cast("long").alias("n_aliases"),
        F.coalesce("alias_hops_total", F.lit(0))
        .cast("long")
        .alias("alias_hops_total"),
        "content_chars",
    )
