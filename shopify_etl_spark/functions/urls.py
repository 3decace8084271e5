"""URL canonicalization for crawl ingest (VERDICT r14 #5).

Real crawls re-fetch: the same page arrives under spelling variants —
uppercase scheme/host, an explicit default port, duplicate or trailing
slashes, a ``#fragment`` — and every downstream identity operation
(refetch dedup, per-domain caps, robots matching, URL joins) silently
over-counts unless fetches are keyed by a canonical form first. The
reference keys its envelopes by a cleaned id the same way
(``clean_id``, incremental_loaders.py:63) before any merge touches
them.

Design: ONE Column expression, pure JVM — ``parse_url`` (Spark's
Hive-compatible URL part extractor, java.net.URI under the hood)
splits the URL, string primitives normalize each part, ``concat``
reassembles. Zero Python, zero shuffle, fuses into whatever projection
consumes it; the whole formula is SQL-mirrorable so oracles can
re-derive canonical URLs from first principles.

Normalization rules (a conservative core — but NOT lossless in full
generality: per RFC 3986 ``/a`` and ``/a/`` (or ``//a``) MAY name
distinct resources, so the slash rules below can alias distinct pages
on adversarial real-crawl URL spaces. Keyed latest-wins dedup on this
form trades that rare aliasing for collapsing the overwhelmingly more
common re-fetch spellings; a deployment that must preserve the
distinction should key on the raw URL with only the case/port/fragment
rules applied):

* scheme and host lowercase (RFC 3986 §6.2.2.1 — case-insensitive);
* default port stripped (``http://h:80/`` ≡ ``http://h/``, ``https``
  443); NON-default ports are preserved;
* fragment dropped (``#…`` is client-side only — never sent in the
  request, so two fetches differing only by fragment are the same
  resource);
* path: duplicate slashes collapsed, trailing slash stripped (except
  the root path), empty path becomes ``/``;
* query string preserved verbatim when present (parameter re-ordering
  changes semantics for some endpoints, so it is NOT sorted — the
  documented conservative choice).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _canonical_parts(
    u: Column,
) -> tuple[Column, Column, Column, Column, Column]:
    """(proto, host, port_part, path, query_part) of a URL column with
    every normalization rule applied — the ONE parse both
    :func:`canonicalize_url` and :func:`surt_key` assemble from (the
    r16 self-review: surt_key previously re-parsed the reassembled
    canonical string, doubling the JVM URI parses per row and
    duplicating the port/path/query handling)."""
    proto = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    # parse_url HOST excludes the port; recover it from AUTHORITY and
    # keep it only when non-default for the scheme
    port = F.regexp_extract(
        F.coalesce(F.try_parse_url(u, F.lit("AUTHORITY")), F.lit("")),
        r":(\d+)$",
        1,
    )
    is_default = ((proto == "http") & (port == "80")) | (
        (proto == "https") & (port == "443")
    )
    port_part = F.when(
        (port != "") & ~is_default, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    path = F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, "/{2,}", "/")      # collapse //
    path = F.regexp_replace(path, "/+$", "")         # strip trailing /
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.try_parse_url(u, F.lit("QUERY"))
    query_part = F.when(
        query.isNotNull() & (query != ""), F.concat(F.lit("?"), query)
    ).otherwise(F.lit(""))
    return proto, host, port_part, path, query_part


def canonicalize_url(col: Column | str) -> Column:
    """Canonical form of an absolute URL column (rules above). Null/
    unparseable inputs yield null (``try_parse_url`` returns null parts),
    so malformed URIs drop out of URL-keyed joins instead of grouping
    under a garbage key."""
    u = F.col(col) if isinstance(col, str) else col
    proto, host, port_part, path, query_part = _canonical_parts(u)
    return F.concat(proto, F.lit("://"), host, port_part, path, query_part)


def surt_key(col: Column | str) -> Column:
    """SURT-form index key of a URL column (r16, VERDICT r15 #6): the
    Sort-friendly URI Reordering Transform every web-archive CDX index
    keys on — host labels REVERSED and comma-joined so all of a
    domain's subdomains sort adjacently, then ``)`` + path + query:

        http://www.host3.example/sec5/doc/42?x=1
          → example,host3,www)/sec5/doc/42?x=1

    Built from the SAME normalized parts as :func:`canonicalize_url`
    (case, default port, fragment, slash rules — one parse, shared), so
    two messy spellings of one resource land on one index key — the
    lookup contract ``cdx_surt_lookup`` gates. One JVM expression
    chain; null for unparseable URLs (they cannot be looked up)."""
    u = F.col(col) if isinstance(col, str) else col
    proto, host, port_part, path, query_part = _canonical_parts(u)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.when(
        proto.isNotNull() & host.isNotNull(),
        F.concat(rev, port_part, F.lit(")"), path, query_part),
    )


__all__ = ["canonicalize_url", "surt_key"]
