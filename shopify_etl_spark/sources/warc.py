"""WARC (ISO 28500) crawl-archive ingest: a distributed record splitter
over Common-Crawl-shaped ``.warc.gz`` payloads, plus the deterministic
synthesizer its gates run against.

Why this is the 100 TB front door: a training-data build does not start
at ``documents.parquet`` — it starts at a crawl dump, petabytes of
``.warc.gz`` files each holding thousands of records (warcinfo, then
request/response pairs per fetched URI). The reference engine's front
door is likewise a raw ingest scan (``extract_table.py:134-174`` — S1
pulls raw API envelopes before any transform); this module is that scan
re-shaped for crawl archives.

The distributed-read story rests on the format itself: Common Crawl
compresses **each record as its own gzip member** (concatenated members
are a valid gzip stream — RFC 1952 §2.2). That makes a 1 GB ``.warc.gz``
splittable WITHOUT a central index: any worker can scan to a member
boundary and decompress records independently, memory bounded by ONE
record, never the file. The splitter here does exactly that — a
``zlib.decompressobj`` loop over ``unused_data`` boundaries — inside
``mapInPandas``, so the plan is scan → Arrow batch → records with zero
shuffle and zero driver involvement; files parallelize across tasks
(``spark.read.format("binaryFile")`` at scale, one row per archive) and
records within a file stream through a generator.

Everything is stdlib ``zlib``/bytes — the same dependency-free
discipline as the image/audio codecs (``operators/*_codec.py``), so the
gate is a REAL decompress + parse, not a mock.

Synthesis (:func:`synth_warc_files`) groups documents into archives
(``file_id = doc_id // docs_per_file`` — mirrored by the SQL oracles),
wraps each document's text in the provably-lossless HTML template
(``operators/html.py::synth_html``), adds a request record per fetch and
a 404 error page for every ``doc_id % 404_every == 0`` (so downstream
status filtering is exercised), and gzips record-at-a-time exactly like
Common Crawl. The oracle never sees compressed bytes: the catalog gates
(``warc_ingest_stats``, ``html_extract_docs``, ``crawl_curation_chain``)
recompute record accounting and the extracted text from ``documents``
alone, so a splitter that drops a member, mis-slices a Content-Length,
or double-decodes an entity hash-mismatches.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.html import synth_html

CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"

WARC_FILE_SCHEMA = StructType(
    [
        StructField("file_id", LongType(), False),
        StructField("warc", BinaryType(), False),
        StructField("n_members", LongType(), False),
    ]
)

WARC_RECORD_SCHEMA = StructType(
    [
        StructField("file_id", LongType(), False),
        StructField("rec_index", LongType(), False),
        StructField("warc_type", StringType(), False),
        StructField("record_id", StringType(), False),
        StructField("target_uri", StringType(), True),
        StructField("http_status", LongType(), True),
        StructField("mime", StringType(), True),
        # the PAYLOAD's content type (from the peeled HTTP headers) —
        # what downstream routing dispatches on: text/html → extraction,
        # image/* → codec decode; null for non-HTTP records
        StructField("http_mime", StringType(), True),
        # transport summary of the peeled HTTP envelope, after decoding:
        # "identity", "chunked", "gzip", "deflate", "chunked+gzip", ... —
        # ingest accounting for which transport paths a dump exercised;
        # null for non-HTTP records
        StructField("http_encoding", StringType(), True),
        # revisit-record reference headers (real Common Crawl dedup:
        # WARC-Type: revisit + WARC-Refers-To / WARC-Payload-Digest
        # point at an earlier byte-identical response instead of
        # re-storing the body); null on non-revisit records
        StructField("refers_to", StringType(), True),
        StructField("payload_digest", StringType(), True),
        # the HTTP Location header (r17): 3xx responses carry the
        # redirect target a crawl consumer must follow to credit
        # content to the final canonical URL; null elsewhere
        StructField("http_location", StringType(), True),
        # WARC-Concurrent-To (r17): request records pair to the
        # response captured in the same fetch; null when absent
        StructField("concurrent_to", StringType(), True),
        # WARC-Date (r17): the capture timestamp — what recrawl
        # scheduling compares against sitemap <lastmod>
        StructField("warc_date", StringType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


# ---------------------------------------------------------------------------
# record-level gzip (RFC 1952 multi-member) — the splittability primitive
# ---------------------------------------------------------------------------


def gzip_member(data: bytes, level: int = 6) -> bytes:
    """One self-contained gzip member (wbits=31 adds the gzip wrapper).
    Concatenated members are one valid gzip stream; per-record members
    are what makes a WARC archive splittable."""
    co = zlib.compressobj(level, zlib.DEFLATED, 31)
    return co.compress(data) + co.flush()


def split_gzip_members(blob: bytes) -> Iterator[bytes]:
    """Yield each gzip member's decompressed bytes. Memory is bounded by
    one member (one WARC record), never the archive."""
    rest = bytes(blob)
    while rest:
        do = zlib.decompressobj(31)
        try:
            out = do.decompress(rest)
        except zlib.error as e:
            # corrupt deflate stream / bad CRC: surface the clean
            # ValueError contract (codec-family hardening) so
            # permissive-mode accounting catches it instead of dying
            raise ValueError(
                f"corrupt gzip member in WARC archive: {e}"
            ) from e
        if not do.eof:
            raise ValueError(
                "truncated gzip member in WARC archive "
                f"({len(rest)} bytes remaining)"
            )
        yield out
        rest = do.unused_data


def split_gzip_members_indexed(
    blob: bytes,
) -> Iterator[tuple[bytes, int, int]]:
    """Like :func:`split_gzip_members` but yields ``(member_bytes,
    offset, compressed_length)`` — the byte coordinates a CDX index
    records so consumers can later fetch ONE record with a ranged read
    (``blob[offset:offset+length]`` is a self-contained gzip member)
    instead of streaming the archive. Same memory bound, same
    ValueError contract."""
    # 64 KiB chunked feed over a memoryview: offsets come from consumed
    # byte accounting, the tail is never re-copied per member (a
    # many-member archive stays LINEAR — unused_data is bounded by one
    # chunk), and a truncated final member still raises cleanly.
    mv = memoryview(blob)
    chunk_size = 65536
    pos, n = 0, len(blob)
    while pos < n:
        do = zlib.decompressobj(31)
        out, p = [], pos
        try:
            while not do.eof:
                if p >= n:
                    raise ValueError(
                        "truncated gzip member in WARC archive "
                        f"({n - pos} bytes remaining)"
                    )
                chunk = mv[p:p + chunk_size]
                out.append(do.decompress(chunk))
                p += len(chunk)
        except zlib.error as e:
            raise ValueError(
                f"corrupt gzip member in WARC archive: {e}"
            ) from e
        clen = (p - pos) - len(do.unused_data)
        yield b"".join(out), pos, clen
        pos += clen


def split_plain_records(blob: bytes) -> Iterator[bytes]:
    """Yield records from an UNCOMPRESSED .warc file (concatenated
    records): walk version line → headers → Content-Length → body →
    boundary CRLFCRLF. Local archives and test fixtures ship plain;
    Common Crawl ships per-record gzip (see :func:`split_gzip_members`).
    """
    pos, n = 0, len(blob)
    while pos < n:
        if not blob.startswith(b"WARC/", pos):
            raise ValueError(
                f"expected a WARC version line at offset {pos} "
                f"(got {blob[pos:pos + 12]!r})"
            )
        head_end = blob.index(_HDR_END, pos)
        length = None
        for line in blob[pos:head_end].split(CRLF)[1:]:
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"content-length":
                length = int(v.strip())
        if length is None:
            raise ValueError("WARC record missing Content-Length")
        if length < 0:
            # same framing contract as parse_record (a negative length
            # would slide `end` backwards and yield garbled slices that
            # only fail later with a misleading error)
            raise ValueError(f"WARC record with negative Content-Length {length}")
        end = head_end + len(_HDR_END) + length + len(_HDR_END)
        if end > n:
            raise ValueError(
                f"truncated WARC record at offset {pos}: needs {end - n} "
                "more bytes"
            )
        yield blob[pos:end]
        pos = end


def split_records(blob: bytes) -> Iterator[bytes]:
    """Format auto-detect: gzip magic (1f 8b) → per-member split,
    ``WARC/`` → plain concatenated records."""
    if blob[:2] == b"\x1f\x8b":
        return split_gzip_members(blob)
    if blob[:5] == b"WARC/":
        return split_plain_records(blob)
    raise ValueError(
        f"neither gzip nor plain WARC (leading bytes {blob[:8]!r})"
    )


# ---------------------------------------------------------------------------
# HTTP payload transport decoding (VERDICT r14 #1): real Common Crawl
# response records routinely carry Transfer-Encoding: chunked framing,
# Content-Encoding: gzip/deflate bodies, and non-UTF-8 charsets — the
# layer below absorbs all three before extraction ever sees a byte, the
# same place the reference absorbs its transport (HTTP → JSON envelope
# in ``_make_request``, extract_table.py:101-131, before any
# transform touches a record). Stdlib-only, ValueError-or-parse
# (the codec-family hardening contract permissive mode relies on).
# ---------------------------------------------------------------------------


def _dechunk(body: bytes) -> bytes:
    """Decode ``Transfer-Encoding: chunked`` framing (RFC 9112 §7.1):
    ``hex-size[;extensions] CRLF data CRLF`` repeated, terminated by a
    zero-size chunk plus an optional trailer section (accepted and
    dropped). Malformed framing raises ValueError — never an index or
    struct error."""
    out, pos, n = [], 0, len(body)
    while True:
        eol = body.find(CRLF, pos)
        if eol < 0:
            raise ValueError("chunked body: missing chunk-size line")
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError as e:
            raise ValueError(
                f"chunked body: bad chunk size {size_tok[:16]!r}"
            ) from e
        if size < 0:
            raise ValueError("chunked body: negative chunk size")
        pos = eol + len(CRLF)
        if size == 0:
            # trailer fields (if any) end at the final CRLF; nothing
            # downstream consumes them, so accept-and-drop
            return b"".join(out)
        if pos + size + len(CRLF) > n:
            raise ValueError(
                f"chunked body: truncated chunk data (need {size} bytes)"
            )
        out.append(body[pos:pos + size])
        pos += size
        if body[pos:pos + len(CRLF)] != CRLF:
            raise ValueError("chunked body: missing chunk-data terminator")
        pos += len(CRLF)


def _inflate(body: bytes, encoding: str) -> bytes:
    """Decode a ``Content-Encoding: gzip|deflate`` payload body (stdlib
    zlib — the member splitter's dependency discipline). ``deflate``
    tries zlib-wrapped first, then raw deflate: real servers ship both
    (the RFC 9110 §8.4.1.2 compatibility note)."""
    wbits_options = (31,) if encoding in ("gzip", "x-gzip") else (15, -15)
    err: Exception | None = None
    for wbits in wbits_options:
        do = zlib.decompressobj(wbits)
        try:
            out = do.decompress(body)
            if not do.eof:
                raise zlib.error("truncated stream")
            return out
        except zlib.error as e:
            err = e
    raise ValueError(f"bad {encoding} payload body: {err}") from err


# http_encoding labels whose transport the parser FULLY absorbed —
# every "+"-joined token is one the decode chain handled. Anything else
# (br, zstd, x-custom, …) passed through still-compressed and LABELED;
# extraction fronts must route those records OUT (and count them)
# instead of feeding opaque bytes to a text extractor as if decoded.
_BUILTIN_DECODED = ("chunked", "gzip", "deflate")


def is_decoded(col="http_encoding", extra: tuple = ()):
    """Boolean Column: the record's HTTP transport is fully decoded
    (``http_encoding`` ∈ identity / chunked / gzip / deflate and their
    ``+`` combinations). The routing predicate EVERY extraction front
    applies before ``payload_text`` — on a real dump ~25-40% of pages
    ship Content-Encoding: br, which :func:`parse_record` passes
    through labeled-but-compressed; without this predicate those bytes
    would enter curation as silently garbled text (the failure mode
    the permissive-mode accounting philosophy forbids). Null labels
    (non-HTTP records) are not decoded payloads and return false.

    ``extra`` (r17, VERDICT r16 #1): additional labels the CALLER
    decoded by passing a transport-decoder registry to the splitter —
    a front that ran ``warc_records(files, decoders={'br': …})`` routes
    with ``is_decoded(…, extra=('br',))``. The label set is part of the
    plan (closure-captured like the registry itself), so driver and
    executors can never disagree about what counts as decoded. Labels
    are regex-escaped: content-coding tokens may legally contain
    ``.``/``+``/``!``, and an unescaped ``.`` would classify
    still-compressed near-miss labels as decoded — the silent-garbling
    path this predicate exists to prevent."""
    import re as _re

    toks = "|".join(
        _re.escape(t) for t in _BUILTIN_DECODED + tuple(extra)
    )
    pat = rf"^(identity|({toks})(\+({toks}))*)$"
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & c.rlike(pat)


# ---------------------------------------------------------------------------
# pluggable transport decoders (VERDICT r16 #1): routing unknown labels
# OUT was the correct first step, but on a real dump ~25-40% of pages
# are brotli — a deployment with the codec installed should DECODE
# them, not discard a third of the corpus. The seam is a label→decoder
# mapping passed through the splitter's closure (the Spark-correct
# config path: pickled with the UDF, so driver and executors always
# agree — module-level mutation would silently NOT propagate to Python
# workers). ``default_transport_decoders()`` populates from importable
# optional dependencies (the Pillow/ref_codecs two-backend discipline);
# unregistered labels keep the labeled-skip+count behavior.
# ---------------------------------------------------------------------------


def _decode_br(body: bytes) -> bytes:
    import brotli  # optional dependency — guarded by the default map

    return brotli.decompress(body)


def _decode_zstd(body: bytes) -> bytes:
    import zstandard  # optional dependency — guarded by the default map

    # decompressobj, NOT one-shot decompress(): streamed HTTP zstd
    # bodies are frames WITHOUT an embedded content size (the normal
    # server output), which the one-shot API refuses
    dobj = zstandard.ZstdDecompressor().decompressobj()
    out = dobj.decompress(body)
    out += dobj.flush()
    return out


def raw_deflate_decoder(body: bytes) -> bytes:
    """Raw-DEFLATE (RFC 1951, no zlib/gzip wrapper) decoder — the FAKE
    registered codec the decoder-registry gate runs with: the synth
    ``br`` leg's stand-in bytes are raw deflate, so registering this
    under ``'br'`` exercises the full decode-when-registered path with
    zero new dependencies. Also a real decoder for servers that ship
    raw-deflate under ``Content-Encoding: deflate`` miscounted as a
    custom label."""
    do = zlib.decompressobj(-15)
    out = do.decompress(body)
    if not do.eof:
        raise ValueError("truncated raw-deflate payload body")
    return out


def default_transport_decoders() -> dict:
    """Label→decoder map from IMPORTABLE optional dependencies:
    ``brotli`` registers ``br``, ``zstandard`` registers ``zstd``.
    Deterministic per environment (import-probe only — no state), so
    a cluster whose workers share the driver's image resolves the same
    map everywhere. Callers pass the result (or their own map) to
    ``warc_records(decoders=…)`` and route with the matching
    ``is_decoded(extra=…)`` labels."""
    out: dict = {}
    try:
        import brotli  # noqa: F401

        out["br"] = _decode_br
    except ImportError:
        pass
    try:
        import zstandard  # noqa: F401

        out["zstd"] = _decode_zstd
    except ImportError:
        pass
    return out


def payload_charset(payload_col="payload", mime_col="http_mime"):
    """Effective charset of an HTML payload, plan-side: the HTTP
    header's ``charset=`` parameter when present, else a ``<meta
    charset=…>`` / ``http-equiv`` declaration sniffed from the payload
    head (the tag is pure ASCII, so sniffing through the UTF-8 cast is
    safe whatever the body encoding), else empty (→ UTF-8 default).
    Real dumps declare charsets in BOTH places; header-less pages are
    routine."""
    p = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    m = F.col(mime_col) if isinstance(mime_col, str) else mime_col
    pat = r"(?i)charset=[\"']?([A-Za-z0-9_\-]+)"
    hdr = F.regexp_extract(F.coalesce(m, F.lit("")), pat, 1)
    # the sniff is bounded to the first 1 KiB (the browser prescan
    # bound): a charset-looking string deep in the body — a code
    # sample, a description meta — must not re-route the decoder
    meta = F.regexp_extract(
        F.coalesce(F.substring(p, 1, 1024).cast("string"), F.lit("")),
        r"(?i)<meta[^>]*charset=[\"']?([A-Za-z0-9_\-]+)",
        1,
    )
    return F.lower(F.when(hdr != "", hdr).otherwise(meta))


def payload_text(payload_col="payload", mime_col="http_mime"):
    """Charset-aware payload → string decode, plan-side and pure JVM:
    the effective charset (header ``charset=`` parameter, else the
    sniffed ``<meta charset>`` — :func:`payload_charset`) routes a
    bounded CASE — ISO-8859-1/latin-1 spellings through ``decode()``
    (every byte is valid latin-1, so this path never fails), everything
    else (incl. absent/UTF-8/ASCII) through the binary→string cast. A
    latin-1 page decoded as UTF-8 garbles every byte ≥ 0x80 into the
    replacement character, which is exactly what the fidelity oracle
    catches."""
    p = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    cs = payload_charset(payload_col, mime_col)
    return F.when(
        cs.isin("iso-8859-1", "iso8859-1", "latin-1", "latin1"),
        F.decode(p, "ISO-8859-1"),
    ).otherwise(p.cast("string"))


# ---------------------------------------------------------------------------
# WARC record build / parse
# ---------------------------------------------------------------------------


def build_record(warc_type: str, headers: list, body: bytes) -> bytes:
    """Serialize one WARC/1.0 record (version line, named fields,
    Content-Length, blank line, body, record boundary)."""
    lines = [b"WARC/1.0", f"WARC-Type: {warc_type}".encode()]
    lines += [f"{k}: {v}".encode() for k, v in headers]
    lines.append(b"Content-Length: %d" % len(body))
    return CRLF.join(lines) + _HDR_END + body + _HDR_END


def parse_record(raw: bytes, decoders: dict | None = None) -> dict:
    """Parse one decompressed WARC record into (warc_type, record_id,
    target_uri, http_status, mime, payload).

    For ``application/http`` blocks the HTTP envelope is peeled here —
    status line parsed, headers dropped, body returned as ``payload`` —
    because that is the only part downstream text extraction consumes.

    ``decoders`` (r17): an optional label→decoder map for
    Content-Encoding values beyond the built-in gzip/deflate — a
    registered label's body is DECODED (decoder failures surface the
    ValueError contract); an unregistered label passes through
    still-compressed and labeled, for :func:`is_decoded` routing.
    """
    if not raw.startswith(b"WARC/"):
        raise ValueError(
            f"not a WARC record (leading bytes {raw[:12]!r})"
        )
    head_end = raw.index(_HDR_END)
    hdr_lines = raw[:head_end].split(CRLF)
    fields = {}
    for line in hdr_lines[1:]:
        k, _, v = line.partition(b":")
        fields[k.strip().lower()] = v.strip()
    length = int(fields.get(b"content-length", b"-1"))
    if length < 0:
        raise ValueError("WARC record missing Content-Length")
    block = raw[head_end + len(_HDR_END):head_end + len(_HDR_END) + length]
    if len(block) != length:
        raise ValueError(
            f"WARC block truncated: declared {length}, got {len(block)}"
        )
    ctype = fields.get(b"content-type", b"").decode("ascii", "replace")
    status, payload, http_mime, http_enc = None, block, None, None
    http_location = None
    if ctype.startswith("application/http"):
        try:
            http_end = block.index(_HDR_END)
        except ValueError:
            raise ValueError(
                "application/http block missing header terminator"
            ) from None
        http_head = block[:http_end].split(CRLF)
        first = http_head[0].decode("ascii", "replace").split()
        if first and first[0].startswith("HTTP/"):
            # status-line hardening (ADVICE r14): 'HTTP/1.1\r\n' with no
            # status token must surface the clean ValueError contract,
            # not an IndexError that kills permissive-mode ingest
            if len(first) < 2:
                raise ValueError(
                    f"malformed HTTP status line {http_head[0][:40]!r}"
                )
            try:
                status = int(first[1])
            except ValueError as e:
                raise ValueError(
                    f"malformed HTTP status line {http_head[0][:40]!r}"
                ) from e
        hdrs = {}
        for line in http_head[1:]:
            k, _, v = line.partition(b":")
            hdrs[k.strip().lower()] = v.strip()
        hm = hdrs.get(b"content-type")
        http_mime = (
            hm.decode("ascii", "replace") if hm is not None else None
        )
        loc = hdrs.get(b"location")
        http_location = (
            loc.decode("ascii", "replace") if loc is not None else None
        )
        payload = block[http_end + len(_HDR_END):]
        # transport decoding: dechunk FIRST (framing wraps the encoded
        # body), then content-decode — the wire's nesting order
        te = hdrs.get(b"transfer-encoding", b"").decode(
            "ascii", "replace"
        ).lower()
        ce = hdrs.get(b"content-encoding", b"").decode(
            "ascii", "replace"
        ).lower()
        encs = []
        if "chunked" in te:
            payload = _dechunk(payload)
            encs.append("chunked")
        if ce and ce != "identity":
            if ce in ("gzip", "x-gzip", "deflate"):
                payload = _inflate(payload, ce)
                encs.append("gzip" if ce == "x-gzip" else ce)
            elif decoders and ce in decoders:
                # registered codec (r17): decode, keep the label —
                # the caller routes with is_decoded(extra=(ce,)) since
                # it knows which labels its registry absorbed. A
                # decoder FAILURE (truncated/bit-rotted body — routine
                # on real dumps) degrades to THIS record only: the
                # bytes pass through with an error-marked label
                # ("br(error)" — parentheses are illegal in coding
                # tokens, so it can never match is_decoded even with
                # the label registered) and the record becomes a
                # countable accounting row downstream. Raising here
                # would corrupt-account the archive's entire tail in
                # permissive mode — one bad body must cost one record.
                try:
                    payload = decoders[ce](payload)
                    encs.append(ce)
                except Exception:
                    encs.append(f"{ce}(error)")
            else:
                # unknown codec (e.g. br): bytes pass through LABELED so
                # downstream can count/route them — one exotic record
                # must not corrupt-account a whole archive
                encs.append(ce)
        http_enc = "+".join(encs) if encs else "identity"
    uri = fields.get(b"warc-target-uri")
    refers = fields.get(b"warc-refers-to")
    pdigest = fields.get(b"warc-payload-digest")
    conc = fields.get(b"warc-concurrent-to")
    wdate = fields.get(b"warc-date")
    return {
        "warc_type": fields.get(b"warc-type", b"?").decode(),
        "record_id": fields.get(b"warc-record-id", b"").decode(),
        "target_uri": uri.decode() if uri is not None else None,
        "http_status": status,
        "mime": ctype,
        "http_mime": http_mime,
        "http_encoding": http_enc,
        "refers_to": refers.decode() if refers is not None else None,
        "payload_digest": (
            pdigest.decode() if pdigest is not None else None
        ),
        "http_location": http_location,
        "concurrent_to": conc.decode() if conc is not None else None,
        "warc_date": wdate.decode() if wdate is not None else None,
        "payload": payload,
    }


# ---------------------------------------------------------------------------
# distributed splitter
# ---------------------------------------------------------------------------


def warc_records(
    files: DataFrame,
    warc_col: str = "warc",
    file_col: str = "file_id",
    mode: str = "fail",
    decoders: dict | None = None,
) -> DataFrame:
    """Split WARC archives into records — one output row per record.

    Zero-shuffle ``mapInPandas``: each task streams its archives'
    gzip members through :func:`split_records` (generator — memory
    is one record), parses, and emits Arrow batches. At 100 TB the input
    is a ``binaryFile`` scan with one row per ``.warc.gz``; parallelism
    is the file count, and record parsing never leaves the task.

    ``mode``: ``"fail"`` (default) raises on the first malformed archive
    — the synthesis/test posture, where corruption means a bug.
    ``"permissive"`` is the crawl posture: real dumps carry clipped and
    bit-rotted members, and one bad archive must not kill a 100 TB
    ingest — records parsed BEFORE the corruption point are kept, then
    ONE accounting row (``warc_type='corrupt'``, the error message in
    ``mime``, ``rec_index`` = records salvaged) marks the archive so
    the loss is countable downstream, never silent.

    ``decoders``: optional Content-Encoding label→decoder map (r17,
    VERDICT r16 #1) — closure-captured into the Arrow task, so driver
    and executors always agree; see :func:`default_transport_decoders`.
    """
    if mode not in ("fail", "permissive"):
        raise ValueError(f"mode must be 'fail' or 'permissive', got {mode!r}")

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_RECORD_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for fid, blob in zip(pdf[file_col], pdf[warc_col]):
                i = 0
                try:
                    for member in split_records(bytes(blob)):
                        r = parse_record(member, decoders=decoders)
                        rows.append(
                            (
                                int(fid), i, r["warc_type"], r["record_id"],
                                r["target_uri"], r["http_status"],
                                r["mime"], r["http_mime"],
                                r["http_encoding"], r["refers_to"],
                                r["payload_digest"], r["http_location"],
                                r["concurrent_to"], r["warc_date"],
                                r["payload"],
                            )
                        )
                        i += 1
                except ValueError as e:
                    if mode == "fail":
                        raise
                    rows.append(
                        (int(fid), i, "corrupt", "", None, None,
                         str(e), None, None, None, None, None, None,
                         None, None)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return files.select(file_col, warc_col).mapInPandas(
        split, WARC_RECORD_SCHEMA
    )


# ---------------------------------------------------------------------------
# CDX indexing — random access into archives
# ---------------------------------------------------------------------------

CDX_SCHEMA = StructType(
    [
        StructField("file_id", LongType(), False),
        StructField("rec_index", LongType(), False),
        StructField("offset", LongType(), False),
        StructField("comp_len", LongType(), False),
        StructField("warc_type", StringType(), False),
        StructField("target_uri", StringType(), True),
        StructField("http_status", LongType(), True),
        # md5 hex of the DECODED payload (transport already peeled) —
        # the content-dedup key a CDX consumer joins on
        StructField("digest", StringType(), True),
        # WARC-Date of the indexed record (r17): the capture timestamp
        # a CDXJ line publishes — lookup services pick captures by it
        StructField("warc_date", StringType(), True),
    ]
)


def cdx_records(
    files: DataFrame,
    warc_col: str = "warc",
    file_col: str = "file_id",
    mode: str = "fail",
    decoders: dict | None = None,
) -> DataFrame:
    """Build a CDX-style index over per-record-gzip archives: one row
    per record with its BYTE COORDINATES (``offset``, ``comp_len`` — a
    self-contained gzip member lives at ``blob[offset:offset+len]``),
    identity (URI, type, status) and a payload digest. This is the
    other derivative artifact Common Crawl publishes next to every
    dump: with it, consumers fetch ONE record by ranged read instead
    of streaming the archive — the random-access story for a 100 TB
    store. Zero-shuffle ``mapInPandas``, linear in the archive (the
    indexed splitter feeds 64 KiB chunks — no per-member tail copy).

    Requires the per-record-gzip container (coordinates only exist
    there); a plain ``.warc`` raises the usual ValueError.

    ``mode``: the warc_records contract — ``"fail"`` raises on the
    first malformed archive (synthesis/test posture); ``"permissive"``
    keeps the records indexed BEFORE the corruption point and appends
    ONE accounting row (``warc_type='corrupt'``, the error in
    ``target_uri``, ``offset`` = the failure position, ``comp_len`` =
    the unindexable remainder) so one bit-rotted archive in a 100 TB
    dump costs its tail, not the job."""
    import hashlib

    if mode not in ("fail", "permissive"):
        raise ValueError(f"mode must be 'fail' or 'permissive', got {mode!r}")

    def index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in CDX_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for fid, blob in zip(pdf[file_col], pdf[warc_col]):
                blob = bytes(blob)
                i, pos = 0, 0
                try:
                    if blob[:2] != b"\x1f\x8b":
                        raise ValueError(
                            "cdx_records requires per-record-gzip archives "
                            f"(leading bytes {blob[:4]!r})"
                        )
                    for member, off, clen in split_gzip_members_indexed(
                        blob
                    ):
                        r = parse_record(member, decoders=decoders)
                        digest = (
                            hashlib.md5(r["payload"]).hexdigest()
                            if r["payload"] is not None
                            else None
                        )
                        rows.append(
                            (
                                int(fid), i, off, clen, r["warc_type"],
                                r["target_uri"], r["http_status"], digest,
                                r["warc_date"],
                            )
                        )
                        i += 1
                        pos = off + clen
                except ValueError as e:
                    if mode == "fail":
                        raise
                    rows.append(
                        (
                            int(fid), i, pos, len(blob) - pos,
                            "corrupt", str(e), None, None, None,
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    out = files.select(file_col, warc_col).mapInPandas(index, CDX_SCHEMA)
    # SURT index key (r16): the host-reversed canonical form real CDX
    # files are keyed and sorted by — one JVM expression riding the
    # index projection (canonicalize_url under the hood, so messy URL
    # spellings resolve to the stored record); null where no URI
    # (warcinfo) or the URI does not parse (corrupt accounting rows)
    from ..functions.urls import surt_key

    return out.withColumn("surt", surt_key("target_uri"))


# ---------------------------------------------------------------------------
# CDXJ artifact export — the index as the SURT-sorted text file real
# web archives publish and consume INDEPENDENTLY of any engine
# ---------------------------------------------------------------------------


def cdxj_shards(idx: DataFrame) -> DataFrame:
    """Materialize a CDX index frame as CDXJ text shards — one shard
    per archive, lines ``<surt> <timestamp> <json>`` SORTED BY SURT
    (the sort IS the format's point: a CDXJ file is binary-searchable
    by key, which is how a web-archive lookup service finds a record
    without Spark). Completes the derivative trio AS ARTIFACTS:
    WET/WAT already round-trip through ``.warc.*.gz`` archives
    (VERDICT r16 #3).

    Pure JVM, zero Python: per archive, ``collect_list`` of
    (surt, line) structs → ``array_sort`` (struct ordering compares
    the surt field first) → ``array_join``. Memory per group is one
    archive's index lines (KB-scale — coordinates and digests, never
    payloads); at production each output row maps onto one
    ``.cdxj`` object next to its archive. Rows without a SURT
    (warcinfo, unparseable URIs) are not indexable and are dropped
    here — the in-frame index keeps them for accounting."""
    # CDX timestamp = the record's OWN WARC-Date digits (a capture
    # timestamp is what lookup services select captures by — a
    # constant here would publish wrong capture times for anything
    # not fetched at that instant, e.g. the dup re-fetches the synth
    # dates 2026-02-01)
    ts14 = F.substring(
        F.regexp_replace(
            F.coalesce(F.col("warc_date"), F.lit("19700101000000")),
            "[^0-9]", "",
        ),
        1, 14,
    )
    line = F.concat(
        F.col("surt"),
        F.lit(" "), ts14, F.lit(" "),
        F.to_json(
            F.struct(
                F.col("target_uri").alias("url"),
                F.col("http_status").cast("string").alias("status"),
                F.col("digest"),
                F.col("offset").cast("string").alias("offset"),
                F.col("comp_len").cast("string").alias("length"),
            )
        ),
    )
    rows = idx.filter(F.col("surt").isNotNull()).select(
        "file_id", F.struct(F.col("surt"), line.alias("line")).alias("_e")
    )
    return rows.groupBy("file_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("_e")), lambda e: e["line"]
            ),
            "\n",
        ).alias("cdxj"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def parse_cdxj(shards: DataFrame) -> DataFrame:
    """Parse CDXJ text shards back into index rows — the consumer side
    of :func:`cdxj_shards` (a lookup service reads the FILE, not the
    frame that wrote it). ``pos`` is the line's position within its
    shard, which is what pins the sortedness property SQL-side (the
    per-shard key sequence must be monotone). One JVM split/extract/
    from_json chain; zero Python, zero shuffle."""
    from pyspark.sql.types import StringType as _Str
    from pyspark.sql.types import StructField as _SF
    from pyspark.sql.types import StructType as _ST

    jschema = _ST(
        [
            _SF("url", _Str()),
            _SF("status", _Str()),
            _SF("digest", _Str()),
            _SF("offset", _Str()),
            _SF("length", _Str()),
        ]
    )
    lines = shards.select(
        "file_id",
        F.posexplode(F.split("cdxj", "\n")).alias("pos", "_line"),
    )
    j = F.from_json(
        F.regexp_extract("_line", r"^\S+ \S+ (.*)$", 1), jschema
    )
    return lines.select(
        "file_id",
        "pos",
        F.regexp_extract("_line", r"^(\S+)", 1).alias("surt"),
        F.regexp_extract("_line", r"^\S+ (\S+)", 1).alias("ts"),
        j["url"].alias("target_uri"),
        j["status"].cast("long").alias("http_status"),
        j["digest"].alias("digest"),
        j["offset"].cast("long").alias("offset"),
        j["length"].cast("long").alias("comp_len"),
    )


RANGED_FETCH_SCHEMA = StructType(
    [
        StructField("surt", StringType(), True),
        StructField("warc_type", StringType(), False),
        StructField("target_uri", StringType(), True),
        StructField("http_status", LongType(), True),
        StructField("http_mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        # the CDX contract check: the slice decompressed as EXACTLY one
        # self-contained gzip member (eof reached, zero trailing bytes)
        StructField("self_contained", BooleanType(), False),
    ]
)


def fetch_record_ranges(
    df: DataFrame,
    warc_col: str = "warc",
    offset_col: str = "offset",
    len_col: str = "comp_len",
    key_col: str = "surt",
    decoders: dict | None = None,
) -> DataFrame:
    """Ranged-read record recovery — the consumer side of the CDX
    index: each input row carries a resolved coordinate triple
    (archive bytes, ``offset``, ``comp_len``) plus the lookup key, and
    the fetch decompresses ONLY ``blob[offset:offset+len]`` (one
    self-contained gzip member — at production scale this is an HTTP
    ranged GET against the object store; the archive is never
    streamed). Zero-shuffle ``mapInPandas``; memory is one record. A
    slice that is not a clean single member (stale index, bit rot)
    yields a ``warc_type='corrupt'`` accounting row with
    ``self_contained=false`` — countable, never silent."""

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RANGED_FETCH_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for key, blob, off, clen in zip(
                pdf[key_col], pdf[warc_col], pdf[offset_col], pdf[len_col]
            ):
                sl = bytes(blob)[int(off):int(off) + int(clen)]
                do = zlib.decompressobj(31)
                try:
                    member = do.decompress(sl)
                    if not do.eof or do.unused_data:
                        raise ValueError(
                            "range is not one self-contained gzip member"
                        )
                    r = parse_record(member, decoders=decoders)
                    rows.append(
                        (
                            key, r["warc_type"], r["target_uri"],
                            r["http_status"], r["http_mime"],
                            r["payload"], True,
                        )
                    )
                except (zlib.error, ValueError) as e:
                    rows.append(
                        (key, "corrupt", str(e), None, None, None, False)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.select(
        key_col, warc_col, offset_col, len_col
    ).mapInPandas(fetch, RANGED_FETCH_SCHEMA)


# ---------------------------------------------------------------------------
# revisit resolution — the consumer side of Common Crawl's dedup format
# ---------------------------------------------------------------------------


def resolve_revisits(records: DataFrame, value=None) -> DataFrame:
    """Resolve ``WARC-Type: revisit`` records against the stored
    responses they deduplicate — by ``(payload digest, canonical
    URL)``, the duplicate-digest-safe key (ADVICE r16): on a real dump
    MANY distinct URLs serve byte-identical bodies (boilerplate, error
    pages — that is WHY revisits exist), so a digest-only join fans one
    revisit out across every matching original and can pair it with
    the wrong page. A revisit targets the SAME resource as the
    response it dedupes (its spelling canonicalizes onto the
    original's), and per (digest, url) the LATEST original wins via
    ``max_by`` — one row per key, no fan-out.

    Output: one row per revisit record — ``doc_id`` (recovered from
    the target URI tail), ``refers_to``, ``revisit_body_bytes``
    (pinned 0 by the format), ``record_id`` (the resolved original's,
    null if unresolved) and ``orig_value`` (the ``value`` Column
    evaluated on the original BEFORE the shuffle — extraction never
    rides the exchange; 16-byte digest rows do).

    Scale shape: the revisit side is a small fraction of the corpus
    but grows with it — neither side broadcasts; one equi-join on a
    (32-hex, url) key after a same-keyed collapse aggregate (AQE
    reuses the partitioning between them)."""
    from ..functions.urls import canonicalize_url

    revisit = records.filter(F.col("warc_type") == "revisit").select(
        # the revisit may ride a MESSY re-fetch spelling (trailing
        # slash + fragment), so the id is not $-anchored
        F.regexp_extract("target_uri", r"/doc/(\d+)", 1)
        .cast("long")
        .alias("doc_id"),
        canonicalize_url("target_uri").alias("_cu"),
        F.col("refers_to"),
        F.regexp_replace("payload_digest", "^md5:", "").alias("_dg"),
        F.length("payload").cast("long").alias("revisit_body_bytes"),
    )
    originals = (
        records.filter(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            & is_decoded("http_encoding")
        )
        .select(
            canonicalize_url("target_uri").alias("_cu"),
            F.md5("payload").alias("_dg"),
            F.col("record_id"),
            "file_id",
            "rec_index",
            (value if value is not None else F.lit(None).cast("long"))
            .alias("orig_value"),
        )
        .groupBy("_dg", "_cu")
        .agg(
            F.max_by(
                F.struct("record_id", "orig_value"),
                F.struct("file_id", "rec_index"),
            ).alias("_o")
        )
        .select(
            "_dg", "_cu", F.col("_o.record_id"), F.col("_o.orig_value")
        )
    )
    return revisit.join(originals, ["_dg", "_cu"], "left").select(
        "doc_id",
        "refers_to",
        "revisit_body_bytes",
        "record_id",
        "orig_value",
    )


# ---------------------------------------------------------------------------
# WET export — the writer side of the front door
# ---------------------------------------------------------------------------


def _archive_row(fid: int, kind: str, members: list) -> pd.DataFrame:
    """One packed per-record-gzip archive row: the ``kind``-stamped
    warcinfo member + the given record members — the assembly shared
    by every derivative writer (WET/WAT; the r16 review folded three
    near-identical skeletons into this one)."""
    parts = [
        gzip_member(
            build_record(
                "warcinfo",
                [
                    (
                        "WARC-Record-ID",
                        f"<urn:uuid:0000-{kind}info-{fid:012d}>",
                    ),
                    ("WARC-Date", "2026-01-01T00:00:00Z"),
                    ("Content-Type", "application/warc-fields"),
                ],
                f"software: shopify-etl-spark-{kind}/1.0\r\n".encode(),
            )
        )
    ] + members
    return pd.DataFrame(
        [(fid, b"".join(parts), len(parts))],
        columns=["file_id", "warc", "n_members"],
    )


def wet_archives(
    extracted: DataFrame,
    docs_per_file: int = 25,
    id_col: str = "doc_id",
    text_col: str = "text_out",
    uri_prefix: str = "http://crawl.example/doc/",
) -> DataFrame:
    """Materialize extracted text as WET archives — per-record-gzip
    ``conversion`` records (`Content-Type: text/plain`), the derivative
    format Common Crawl publishes next to every dump and what most
    text-pipeline consumers actually read. One ``warcinfo`` then one
    conversion record per document (ascending id); grouping is
    ``file_id = id // docs_per_file`` (the synthesis formula, so
    oracles re-derive the layout). Every record is its own gzip member
    — the written archives are as splittable as the input ones, and
    :func:`warc_records` reads them back with zero new code (conversion
    records are non-HTTP: payload passes through verbatim).

    Scale shape: one ``applyInPandas`` per archive group (archives are
    independent); memory per task is one archive's text. At production
    scale the output rows map 1:1 onto ``.warc.wet.gz`` objects.
    """
    staged = extracted.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_text"),
        (F.col(id_col) / docs_per_file).cast("long").alias("file_id"),
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(pdf["file_id"].iloc[0])
        members = []
        for _, row in pdf.sort_values("_id").iterrows():
            d = int(row["_id"])
            members.append(
                gzip_member(
                    build_record(
                        "conversion",
                        [
                            (
                                "WARC-Record-ID",
                                f"<urn:uuid:wet-{d:016d}>",
                            ),
                            ("WARC-Date", "2026-01-01T00:00:00Z"),
                            ("WARC-Target-URI", f"{uri_prefix}{d}"),
                            ("Content-Type", "text/plain"),
                        ],
                        str(row["_text"]).encode("utf-8"),
                    )
                )
            )
        return _archive_row(fid, "wet", members)

    from ..operators.text import spread_groups

    return spread_groups(staged, "file_id").groupBy("file_id").applyInPandas(
        build, WARC_FILE_SCHEMA
    )


# ---------------------------------------------------------------------------
# WAT export — the metadata derivative (completes the CC trio with WET/CDX)
# ---------------------------------------------------------------------------


def wat_archives(
    meta: DataFrame,
    file_col: str = "file_id",
    idx_col: str = "rec_index",
    refers_col: str = "record_id",
    json_col: str = "wat_json",
) -> DataFrame:
    """Materialize per-record metadata as WAT archives — per-record-gzip
    ``metadata`` records (``Content-Type: application/json``), each
    carrying ``WARC-Refers-To`` back to the response it describes: the
    third derivative Common Crawl publishes next to every dump
    (WARC → WAT/WET/CDX; this module now writes all three). The JSON
    itself is built JVM-side by the caller (``to_json(struct(...))`` —
    urls, status, outlinks, title), so the only Python is the per-
    archive gzip packer, the wet_archives discipline exactly: one
    ``applyInPandas`` per archive group, memory = one archive's
    metadata, output rows map 1:1 onto ``.warc.wat.gz`` objects, and
    :func:`warc_records` reads them back with zero new code."""
    staged = meta.select(
        F.col(file_col).alias("file_id"),
        F.col(idx_col).alias("_idx"),
        F.col(refers_col).alias("_refers"),
        F.col(json_col).alias("_json"),
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(pdf["file_id"].iloc[0])
        members = []
        for _, row in pdf.sort_values("_idx").iterrows():
            members.append(
                gzip_member(
                    build_record(
                        "metadata",
                        [
                            (
                                "WARC-Record-ID",
                                f"<urn:uuid:wat-{fid:08d}-"
                                f"{int(row['_idx']):08d}>",
                            ),
                            ("WARC-Date", "2026-01-01T00:00:00Z"),
                            ("WARC-Refers-To", str(row["_refers"])),
                            ("Content-Type", "application/json"),
                        ],
                        str(row["_json"]).encode("utf-8"),
                    )
                )
            )
        return _archive_row(fid, "wat", members)

    from ..operators.text import spread_groups

    return spread_groups(staged, "file_id").groupBy("file_id").applyInPandas(
        build, WARC_FILE_SCHEMA
    )


# ---------------------------------------------------------------------------
# synthesis (fixture twin — the oracles recompute its accounting in SQL)
# ---------------------------------------------------------------------------

NOT_FOUND_HTML = "<html><body><p>not found</p></body></html>"


def _chunk_encode(body: bytes) -> bytes:
    """Deterministic chunked framing for synthesis: a small first chunk
    carrying a chunk extension (the ``;ext`` branch must be exercised),
    then 64-byte chunks, a trailer field after the zero chunk — every
    RFC 9112 §7.1 shape :func:`_dechunk` must absorb."""
    out = []
    pos = 0
    first = True
    while pos < len(body):
        size = min(7 if first else 64, len(body) - pos)
        ext = b";synth=1" if first else b""
        out.append(b"%x" % size + ext + CRLF + body[pos:pos + size] + CRLF)
        pos += size
        first = False
    out.append(b"0" + CRLF + b"X-Synth-Trailer: 1" + CRLF + CRLF)
    return b"".join(out)


def _http_response(
    status: int,
    reason: str,
    body: str | bytes,
    ctype: str = "text/html; charset=utf-8",
    content_encoding: str | None = None,
    chunked: bool = False,
    location: str | None = None,
) -> bytes:
    body = body.encode() if isinstance(body, str) else body
    lines = [
        f"HTTP/1.1 {status} {reason}".encode(),
        f"Content-Type: {ctype}".encode(),
    ]
    if location is not None:
        lines.append(f"Location: {location}".encode())
    if content_encoding == "gzip":
        body = gzip_member(body)
        lines.append(b"Content-Encoding: gzip")
    elif content_encoding == "deflate":
        body = zlib.compress(body)
        lines.append(b"Content-Encoding: deflate")
    elif content_encoding == "br":
        # the unknown-codec leg: a deterministic opaque stand-in for a
        # brotli body (raw-deflate bytes — genuinely compressed, so a
        # front that ignores the label feeds garbage to extraction and
        # the routing oracle catches it). parse_record must pass these
        # through LABELED, never attempt a decode.
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        body = co.compress(body) + co.flush()
        lines.append(b"Content-Encoding: br")
    elif content_encoding is not None:
        raise ValueError(f"unsupported synth encoding {content_encoding!r}")
    if chunked:
        # chunked framing wraps the (possibly content-encoded) body and
        # replaces Content-Length — the wire's nesting order
        body = _chunk_encode(body)
        lines.append(b"Transfer-Encoding: chunked")
    else:
        lines.append(b"Content-Length: %d" % len(body))
    return CRLF.join(lines) + _HDR_END + body


def _synth_links(d: int) -> tuple[str, str]:
    """Deterministic outlinks for page ``d`` — the host link graph the
    link-analytics oracles mirror: the ring neighbor host (d+1)%7 and
    the mixing host ((d//7)+2d)%7, whose weight distribution varies
    with the archive index so the graph is NOT regular."""
    return (
        f"http://host{(d + 1) % 7}.example/",
        f"http://host{((d // 7) + 2 * d) % 7}.example/",
    )


def _http_request(uri: str) -> bytes:
    path = uri.split("example", 1)[-1]
    return (
        f"GET {path} HTTP/1.1".encode() + CRLF
        + b"Host: crawl.example" + CRLF
        + b"User-Agent: shopify-etl-spark-synth/1.0" + _HDR_END
    )


def synth_warc_files(
    docs: DataFrame,
    docs_per_file: int = 25,
    not_found_every: int = 17,
    image_every: int = 0,
    plain_text_every: int = 0,
    rich_uris: bool = False,
    robots: bool = False,
    sitemaps: bool = False,
    sitemap_index: bool = False,
    http_variants: bool = False,
    unknown_encoding_every: int = 0,
    refetch: bool = False,
    revisits: bool = False,
    links: bool = False,
    redirects: bool = False,
    request_pairing: bool = False,
    lost_responses_every: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic ``.warc.gz`` synthesis from a document table.

    Archive layout (Common Crawl's): one ``warcinfo`` record, then per
    document (ascending id) a ``request`` + ``response`` pair for
    ``http://crawl.example/doc/{id}``. Documents with
    ``id % not_found_every == 0`` respond 404 with an error page (their
    text must NOT survive extraction); with ``image_every > 0``, the
    remaining documents where ``id % image_every == 2`` respond with an
    ``image/png`` payload instead of HTML (the ``synth_png_assets``
    raster formula, real ``png_codec`` bytes) — the multimodal crawl
    mix a real dump carries; with ``plain_text_every > 0``, documents
    where ``id % N == 3`` (after the 404/image branches) respond
    ``text/plain`` with the raw body ``Doc {{id}} {{text}} end`` — the
    non-HTML textual mix (READMEs, robots, data files) a real corpus
    curates WITHOUT an HTML strip; the rest respond 200 with
    ``synth_html(id, text)``. Every record is its own gzip member.

    Grouping is ``file_id = id // docs_per_file`` — a formula the SQL
    oracles mirror; ``applyInPandas`` builds each archive in one task
    (archives are independent — the 100 TB shape).

    ``http_variants`` turns on the REAL-dump transport mix for the
    HTML-200 responses (404s and images stay identity): transport
    variant ``id % 5`` → 0 identity, 1 chunked, 2 gzip, 3 deflate,
    4 chunked-over-gzip; charset variant ``id % 7 == 3`` → the page is
    served as ISO-8859-1 with ``" caf\\xe9"`` appended to the text (a
    non-ASCII byte that garbles under a UTF-8 misdecode), everything
    else UTF-8. Both formulas are mirrored by the fidelity oracle.
    The latin-1 leg assumes the document text itself is latin-1
    encodable (the driver's synthetic corpus is pure ASCII); a
    non-encodable character fails the build loudly rather than
    corrupting the fixture.

    ``sitemaps`` (requires ``rich_uris``) rides per-archive SHARDED
    sitemaps into the crawl: for each host with documents in an
    archive, a ``sitemap-{{fid}}.xml`` response listing the host's
    canonical doc URLs — docs with ``id % 3 == 1`` are UNLISTED (the
    fetched-but-not-listed coverage gap) while 404 docs ARE listed
    (dead sitemap entries). Consumers union the shards, the real
    sitemap-index semantics; formulas mirrored by the
    ``sitemap_coverage_audit`` oracle.

    ``unknown_encoding_every`` (requires ``http_variants``) plants the
    unknown-transport leg a real dump carries (~25-40% of the live web
    is brotli): non-404 HTML documents with ``id % N == 6`` ship
    ``Content-Encoding: br`` with a raw-deflate body stand-in —
    genuinely compressed bytes :func:`parse_record` passes through
    LABELED (``http_encoding = 'br'``), never decoded. Extraction
    fronts must route these records out via :func:`is_decoded` and
    COUNT them; the ``crawl_encoding_routing`` oracle mirrors the
    formula. The br leg takes precedence over the ``id % 5`` transport
    variant and the charset leg.

    ``refetch`` (requires ``rich_uris``) plants the re-fetch duplicates
    a real crawl carries: non-404 documents with ``id % 10 == 4`` are
    fetched AGAIN in the NEXT archive (``file_id + 1``) under a messy
    spelling of the same URL (uppercase scheme/host, explicit ``:80``,
    doubled + trailing slashes, a fragment) — the input URL
    canonicalization must collapse. ``id % 20 == 4`` re-fetches serve
    UPDATED content (text + ``" v2"`` — latest-wins selection is
    observable); ``id % 20 == 14`` re-fetches are byte-identical
    (digest-aware accounting is observable). Formulas mirrored by the
    ``url_canonical_dedup`` oracle.

    ``revisits`` (requires ``refetch``) switches the byte-identical
    re-fetches (``id % 20 == 14``) to the real Common Crawl dedup
    format: instead of re-storing the body, the second fetch is a
    ``WARC-Type: revisit`` record carrying ``WARC-Refers-To`` (the
    original response's record id), ``WARC-Payload-Digest``
    (``md5:<hex>`` of the original DECODED payload — the digest
    :func:`cdx_records` computes), the identical-payload-digest
    ``WARC-Profile``, and an HTTP block with headers only (zero body
    bytes — that is the point of the format). The ``id % 20 == 4``
    updated re-fetches stay full responses (content changed, nothing
    to deduplicate against). Consumers resolve revisits against
    responses by digest (``warc_revisit_resolution``).

    ``redirects`` (requires ``rich_uris``, r17) plants the 3xx legs a
    real dump carries (~15-20% of responses): for each non-404 doc,
    alias URLs on the doc's host respond 3xx with a ``Location:``
    header — ``id % 11 == 5`` → ``/r/doc/{{id}}`` 301→canonical (a
    1-hop chain); ``id % 33 == 5`` → additionally ``/rr/doc/{{id}}``
    302→``/r/…`` (a 2-hop chain); ``id % 33 == 16`` →
    ``/loopA/doc/{{id}}`` ⇄ ``/loopB/doc/{{id}}`` 301s at each other
    (a redirect LOOP — never reaches content); ``id % 33 == 27`` →
    ``/dg/doc/{{id}}`` 301→``/missing/doc/{{id}}`` which is never
    fetched (a DANGLING end). Redirect responses carry a tiny HTML
    body that must never enter curation. Formulas mirrored by the
    ``crawl_redirect_resolution`` oracle.

    ``request_pairing`` (r17) adds ``WARC-Concurrent-To`` to every
    request record (pointing at its paired response's record id — the
    real-dump pairing header) and, with ``lost_responses_every > 0``,
    OMITS the response for non-404 docs with ``id % N == 9`` (the
    fetch-failed leg a crawler's log carries: the request was made,
    no response was captured) — the ``warc_request_pairing`` oracle
    accounts pairs and orphaned requests.
    """
    if refetch and not rich_uris:
        raise ValueError("refetch=True requires rich_uris=True")
    if revisits and not refetch:
        raise ValueError("revisits=True requires refetch=True")
    if sitemaps and not rich_uris:
        raise ValueError("sitemaps=True requires rich_uris=True")
    if sitemap_index and not sitemaps:
        raise ValueError("sitemap_index=True requires sitemaps=True")
    if unknown_encoding_every and not http_variants:
        raise ValueError(
            "unknown_encoding_every requires http_variants=True"
        )
    if refetch and (http_variants or image_every):
        # the dup branch serves plain-identity HTML only: combining it
        # with transport variants or image routing would silently break
        # the documented byte-identical (id%20==14) re-fetch invariant
        raise ValueError(
            "refetch=True is incompatible with http_variants/image_every"
        )
    if redirects and not rich_uris:
        raise ValueError("redirects=True requires rich_uris=True")
    if lost_responses_every and not request_pairing:
        raise ValueError(
            "lost_responses_every requires request_pairing=True"
        )
    staged = docs.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_text"),
        (F.col(id_col) / docs_per_file).cast("long").alias("file_id"),
        F.lit(False).alias("_dup"),
    )
    if refetch:
        staged = staged.unionByName(
            docs.filter(
                (F.col(id_col) % 10 == 4)
                & (F.col(id_col) % not_found_every != 0)
            ).select(
                F.col(id_col).alias("_id"),
                F.col(text_col).alias("_text"),
                ((F.col(id_col) / docs_per_file).cast("long") + 1).alias(
                    "file_id"
                ),
                F.lit(True).alias("_dup"),
            )
        )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(pdf["file_id"].iloc[0])
        parts = [
            gzip_member(
                build_record(
                    "warcinfo",
                    [
                        (
                            "WARC-Record-ID",
                            f"<urn:uuid:0000-warcinfo-{fid:012d}>",
                        ),
                        ("WARC-Date", "2026-01-01T00:00:00Z"),
                        ("Content-Type", "application/warc-fields"),
                    ],
                    b"software: shopify-etl-spark-synth/1.0\r\n",
                )
            )
        ]
        n = 1
        if robots:
            # per-host robots.txt fetches ride in every archive (real
            # crawlers re-fetch robots per session; consumers dedupe
            # rules): the `*` group of host h disallows sections
            # a=(2h)%13 and b=(2h+1)%13 but ALLOWS the longer prefix
            # /sec{a}/doc/1 (RFC 9309 longest-match override — docs in
            # section a whose id starts with '1' are allowed). EVEN
            # hosts additionally carry a SPECIFIC-agent group
            # (User-agent: shopify-etl-spark) with CONFLICTING rules —
            # section c=(2h+5)%13 disallowed, /sec{c}/doc/1 allowed —
            # which a compliant fetcher must obey INSTEAD of `*`
            # (RFC 9309 §2.2.1 group selection). Formulas mirrored by
            # the compliance-audit oracle.
            for h in range(7):
                uri = f"http://host{h}.example/robots.txt"
                a, b = (2 * h) % 13, (2 * h + 1) % 13
                body = (
                    "User-agent: *\n"
                    f"Disallow: /sec{a}/\n"
                    f"Disallow: /sec{b}/\n"
                    f"Allow: /sec{a}/doc/1\n"
                )
                if h % 2 == 0:
                    c = (2 * h + 5) % 13
                    body += (
                        "\n"
                        "User-agent: shopify-etl-spark\n"
                        f"Disallow: /sec{c}/\n"
                        f"Allow: /sec{c}/doc/1\n"
                    )
                elif h == 1:
                    # STACKED User-agent lines share ONE group
                    # (RFC 9309 §2.2.1) — a parser that starts a new
                    # group per UA line attaches the rule to otherbot
                    # only and wrongly falls back to `*`
                    body += (
                        "\n"
                        "User-agent: otherbot\n"
                        "User-agent: shopify-etl-spark\n"
                        f"Disallow: /sec{(2 * h + 7) % 13}/\n"
                    )
                elif h == 3:
                    # an EMPTY specific group: RFC allow-all for this
                    # agent — it must still SUPPRESS the `*` fallback
                    body += "\nUser-agent: shopify-etl-spark\n"
                parts.append(
                    gzip_member(
                        build_record(
                            "response",
                            [
                                (
                                    "WARC-Record-ID",
                                    f"<urn:uuid:robots-{fid:08d}-{h}>",
                                ),
                                ("WARC-Date", "2026-01-01T00:00:00Z"),
                                ("WARC-Target-URI", uri),
                                (
                                    "Content-Type",
                                    "application/http; msgtype=response",
                                ),
                            ],
                            _http_response(
                                200, "OK", body, ctype="text/plain"
                            ),
                        )
                    )
                )
                n += 1
        if sitemaps:
            # per-archive SHARDED sitemaps (the real format — large
            # sites publish sitemap shards, consumers union them): for
            # each host with docs in THIS archive, a sitemap-{fid}.xml
            # listing the host's canonical doc URLs — except docs with
            # id % 3 == 1 (unlisted-but-fetched, the coverage gap the
            # audit measures); 404 docs ARE listed (dead sitemap
            # entries — the other gap). Formulas mirrored by the
            # sitemap_coverage_audit oracle.
            ids = sorted(int(v) for v in pdf.loc[~pdf["_dup"], "_id"])
            for h in range(7):
                listed = [
                    (d, f"http://host{d % 7}.example/sec{d % 13}/doc/{d}")
                    for d in ids
                    if d % 7 == h and d % 3 != 1
                ]
                if not listed:
                    continue
                body = (
                    '<?xml version="1.0" encoding="UTF-8"?>\n<urlset>\n'
                    + "".join(
                        (
                            f"<url><loc>{u}</loc>"
                            f"<lastmod>2026-01-{1 + d % 28:02d}</lastmod>"
                            "</url>\n"
                            if sitemap_index
                            else f"<url><loc>{u}</loc></url>\n"
                        )
                        for d, u in listed
                    )
                    + "</urlset>\n"
                )
                if sitemap_index:
                    # the index layer: the shard is REFERENCED, never
                    # assumed — consumers traverse index -> shard
                    idx_body = (
                        '<?xml version="1.0" encoding="UTF-8"?>\n'
                        "<sitemapindex>\n"
                        f"<sitemap><loc>http://host{h}.example/"
                        f"sitemap-{fid}.xml</loc></sitemap>\n"
                        "</sitemapindex>\n"
                    )
                    parts.append(
                        gzip_member(
                            build_record(
                                "response",
                                [
                                    (
                                        "WARC-Record-ID",
                                        f"<urn:uuid:smidx-{fid:08d}-{h}>",
                                    ),
                                    ("WARC-Date", "2026-01-01T00:00:00Z"),
                                    (
                                        "WARC-Target-URI",
                                        f"http://host{h}.example/"
                                        f"sitemap-index-{fid}.xml",
                                    ),
                                    (
                                        "Content-Type",
                                        "application/http; msgtype=response",
                                    ),
                                ],
                                _http_response(
                                    200, "OK", idx_body,
                                    ctype="application/xml",
                                ),
                            )
                        )
                    )
                    n += 1
                parts.append(
                    gzip_member(
                        build_record(
                            "response",
                            [
                                (
                                    "WARC-Record-ID",
                                    f"<urn:uuid:sitemap-{fid:08d}-{h}>",
                                ),
                                ("WARC-Date", "2026-01-01T00:00:00Z"),
                                (
                                    "WARC-Target-URI",
                                    f"http://host{h}.example/"
                                    f"sitemap-{fid}.xml",
                                ),
                                (
                                    "Content-Type",
                                    "application/http; msgtype=response",
                                ),
                            ],
                            _http_response(
                                200, "OK", body, ctype="application/xml"
                            ),
                        )
                    )
                )
                n += 1
        for _, row in pdf.sort_values(["_id", "_dup"]).iterrows():
            d = int(row["_id"])
            dup = bool(row["_dup"])
            # rich_uris spreads fetches across hosts/sections (the
            # per-domain-analytics fixture); the /doc/{id} TAIL is
            # invariant so id recovery works in both shapes
            uri = (
                f"http://host{d % 7}.example/sec{d % 13}/doc/{d}"
                if rich_uris
                else f"http://crawl.example/doc/{d}"
            )
            if dup:
                # the messy re-fetch spelling of the SAME resource —
                # canonicalization must collapse it onto `uri`
                uri = (
                    f"HTTP://HOST{d % 7}.EXAMPLE:80"
                    f"//sec{d % 13}//doc/{d}/#frag"
                )
            common = [
                (
                    "WARC-Date",
                    "2026-02-01T00:00:00Z" if dup
                    else "2026-01-01T00:00:00Z",
                ),
                ("WARC-Target-URI", uri),
            ]
            rid_sfx = "-r2" if dup else ""
            pair_hdrs = (
                [("WARC-Concurrent-To", f"<urn:uuid:resp-{d:016d}{rid_sfx}>")]
                if request_pairing
                else []
            )
            parts.append(
                gzip_member(
                    build_record(
                        "request",
                        [("WARC-Record-ID",
                          f"<urn:uuid:req-{d:016d}{rid_sfx}>")]
                        + common
                        + pair_hdrs
                        + [("Content-Type", "application/http; msgtype=request")],
                        _http_request(uri),
                    )
                )
            )
            if (
                lost_responses_every
                and not dup
                and d % not_found_every != 0
                and d % lost_responses_every == 9
            ):
                # the fetch-failed leg: the request rides the archive,
                # the response was never captured — an orphaned request
                # the pairing audit must account, not a parse error
                n += 1
                continue
            rec_type, extra_hdrs = "response", []
            # the dup branches must mirror the ORIGINAL response's body
            # formula exactly (links included) — the byte-identical
            # invariant and the revisit digest both depend on it
            page_links = _synth_links(d) if links else ()
            if dup and revisits and d % 20 == 14:
                # byte-identical re-fetch as the real CC dedup format:
                # a revisit record referencing the original response by
                # record id + payload digest, HTTP headers only (the
                # body is NOT re-stored — zero payload bytes)
                import hashlib

                orig = synth_html(
                    d, str(row["_text"]), links=page_links
                ).encode()
                rec_type = "revisit"
                extra_hdrs = [
                    ("WARC-Refers-To", f"<urn:uuid:resp-{d:016d}>"),
                    (
                        "WARC-Payload-Digest",
                        f"md5:{hashlib.md5(orig).hexdigest()}",
                    ),
                    (
                        "WARC-Profile",
                        "http://netpreserve.org/warc/1.0/revisit/"
                        "identical-payload-digest",
                    ),
                ]
                http = (
                    b"HTTP/1.1 200 OK" + CRLF
                    + b"Content-Type: text/html; charset=utf-8"
                    + _HDR_END
                )
            elif dup:
                # re-fetch: same page, possibly updated (id%20==4 → a
                # " v2" revision; id%20==14 → byte-identical)
                txt = str(row["_text"]) + (" v2" if d % 20 == 4 else "")
                http = _http_response(
                    200, "OK", synth_html(d, txt, links=page_links)
                )
            elif d % not_found_every == 0:
                http = _http_response(404, "Not Found", NOT_FOUND_HTML)
            elif image_every > 0 and d % image_every == 2:
                import numpy as np

                from ..operators.png_codec import encode_png

                w, h = 8 + d % 5, 6 + d % 4
                r_ = np.arange(h, dtype=np.int64)[:, None]
                c_ = np.arange(w, dtype=np.int64)[None, :]
                raster = ((d * 31 + r_ * 17 + c_ * 7) % 256).astype(
                    np.uint8
                )
                http = _http_response(
                    200, "OK", encode_png(raster), ctype="image/png"
                )
            elif plain_text_every and d % plain_text_every == 3:
                # the plain-text leg (r17, VERDICT r16 #7): textual
                # content that is NOT HTML — curation must route it
                # straight to the quality gate, no tag strip
                http = _http_response(
                    200, "OK",
                    f"Doc {d} {str(row['_text']).strip()} end",
                    ctype="text/plain; charset=utf-8",
                )
            elif unknown_encoding_every and d % unknown_encoding_every == 6:
                # the br leg: plain UTF-8 HTML, raw-deflate-compressed,
                # labeled with a codec the parser does not decode
                http = _http_response(
                    200, "OK",
                    synth_html(
                        d, str(row["_text"]),
                        links=_synth_links(d) if links else (),
                    ),
                    content_encoding="br",
                )
            elif http_variants:
                latin = d % 7 == 3
                txt = str(row["_text"]) + (" caf\xe9" if latin else "")
                cs = "iso-8859-1" if latin else "utf-8"
                # real dumps declare the charset in the header OR only
                # in a <meta> tag: latin pages with d % 14 == 10 ship a
                # bare "text/html" header and the meta declaration —
                # the sniffing leg of payload_charset
                meta_only = latin and d % 14 == 10
                v = d % 5
                http = _http_response(
                    200,
                    "OK",
                    synth_html(
                        d, txt,
                        links=_synth_links(d) if links else (),
                        meta_charset=cs if meta_only else None,
                    ).encode(cs),
                    ctype=(
                        "text/html" if meta_only
                        else f"text/html; charset={cs}"
                    ),
                    content_encoding=(
                        "gzip" if v in (2, 4) else "deflate" if v == 3
                        else None
                    ),
                    chunked=v in (1, 4),
                )
            else:
                http = _http_response(
                    200,
                    "OK",
                    synth_html(
                        d, str(row["_text"]),
                        links=_synth_links(d) if links else (),
                    ),
                )
            parts.append(
                gzip_member(
                    build_record(
                        rec_type,
                        [("WARC-Record-ID",
                          f"<urn:uuid:resp-{d:016d}{rid_sfx}>")]
                        + common
                        + extra_hdrs
                        + [("Content-Type", "application/http; msgtype=response")],
                        http,
                    )
                )
            )
            n += 2
            if redirects and not dup and d % not_found_every != 0:
                # the 3xx legs (formulas mirrored by the
                # crawl_redirect_resolution oracle): alias URLs on the
                # doc's host redirecting toward (or around) the
                # canonical content URL
                h7 = f"http://host{d % 7}.example"
                canon = f"{h7}/sec{d % 13}/doc/{d}"
                legs = []
                if d % 11 == 5:
                    legs.append((f"{h7}/r/doc/{d}", 301, canon))
                if d % 33 == 5:
                    legs.append(
                        (f"{h7}/rr/doc/{d}", 302, f"{h7}/r/doc/{d}")
                    )
                if d % 33 == 16:
                    la, lb = f"{h7}/loopA/doc/{d}", f"{h7}/loopB/doc/{d}"
                    legs += [(la, 301, lb), (lb, 301, la)]
                if d % 33 == 27:
                    legs.append(
                        (f"{h7}/dg/doc/{d}", 301, f"{h7}/missing/doc/{d}")
                    )
                for li, (lu, lst, loc) in enumerate(legs):
                    parts.append(
                        gzip_member(
                            build_record(
                                "response",
                                [
                                    (
                                        "WARC-Record-ID",
                                        f"<urn:uuid:redir-{d:016d}-{li}>",
                                    ),
                                    ("WARC-Date", "2026-01-01T00:00:00Z"),
                                    ("WARC-Target-URI", lu),
                                    (
                                        "Content-Type",
                                        "application/http; msgtype=response",
                                    ),
                                ],
                                _http_response(
                                    lst,
                                    "Moved",
                                    "<html><body>moved</body></html>",
                                    location=loc,
                                ),
                            )
                        )
                    )
                    n += 1
        return pd.DataFrame(
            [(fid, b"".join(parts), n)],
            columns=["file_id", "warc", "n_members"],
        )

    from ..operators.text import spread_groups

    return spread_groups(staged, "file_id").groupBy("file_id").applyInPandas(
        build, WARC_FILE_SCHEMA
    )


__all__ = [
    "WARC_FILE_SCHEMA",
    "WARC_RECORD_SCHEMA",
    "NOT_FOUND_HTML",
    "gzip_member",
    "is_decoded",
    "payload_charset",
    "payload_text",
    "split_gzip_members",
    "split_gzip_members_indexed",
    "split_plain_records",
    "split_records",
    "build_record",
    "parse_record",
    "warc_records",
    "default_transport_decoders",
    "raw_deflate_decoder",
    "resolve_revisits",
    "cdx_records",
    "cdxj_shards",
    "parse_cdxj",
    "fetch_record_ranges",
    "CDX_SCHEMA",
    "RANGED_FETCH_SCHEMA",
    "wet_archives",
    "wat_archives",
    "synth_warc_files",
]
