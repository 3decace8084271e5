"""Property tests for the crawl-ingest extraction layer: the lossless
synth→extract round-trip (the claim every catalog oracle in
plans/catalog_ext6.py rests on) and WARC record/member framing, under
adversarial generated inputs."""

import re
import zlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from shopify_etl_spark.operators import html as H
from shopify_etl_spark.sources import warc as W

# Adversarial text: printable ASCII incl. markup metacharacters, entity
# look-alikes, and whitespace runs — everything escape_html must defuse
# and the single-pass decode must restore literally.
_text = st.lists(
    st.sampled_from(
        list("abcdefghij <>&;/\"'\t\n-!#")
        + ["&amp;", "&lt;", "<p>", "-->"]
        # numeric-reference look-alikes (r15): pre-escaped text carrying
        # these must survive extraction LITERALLY (single-pass decode)
        + ["&#38;", "&#x26;", "&#60;", "&#x3C;", "&#8217;", "&#039;",
           "<script>", "<style>", "<!--"]
    ),
    min_size=0,
    max_size=120,
).map("".join)


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.strip())


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.integers(min_value=0, max_value=10**9), _text)
def test_synth_extract_roundtrip_lossless(spark, doc_id, text):
    """For ANY text (markup metacharacters, pre-escaped entities,
    comment terminators, whitespace runs included), extracting
    synth_html(id, text) yields exactly
    'Doc {id} {ws-normalized text} &copy; example end'."""
    got = (
        spark.range(1)
        .select(H.html_to_text(F.lit(H.synth_html(doc_id, text))))
        .collect()[0][0]
    )
    want = _norm(f"Doc {doc_id} {_norm(text)} &copy; example end")
    assert got == want


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.binary(min_size=0, max_size=5000), min_size=1, max_size=8)
)
def test_gzip_member_framing_roundtrip(payloads):
    """Concatenated per-record gzip members split back into exactly the
    original byte strings, for arbitrary binary payloads and member
    counts (incl. empty payloads)."""
    blob = b"".join(W.gzip_member(p) for p in payloads)
    assert list(W.split_gzip_members(blob)) == payloads


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["response", "request", "resource", "metadata"]),
            st.binary(min_size=0, max_size=2000),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_warc_record_framing_roundtrip_both_containers(recs):
    """build_record → (plain | gzip) container → split → parse recovers
    every record's type and payload verbatim; the two containers agree.
    Non-HTTP content types, so payloads (arbitrary bytes, CRLFCRLF
    included) must pass through untouched — the Content-Length slice,
    not a delimiter scan, is what frames the block."""
    raws = [
        W.build_record(t, [("Content-Type", "application/octet-stream")], p)
        for t, p in recs
    ]
    for blob in (b"".join(raws), b"".join(W.gzip_member(r) for r in raws)):
        parsed = [W.parse_record(m) for m in W.split_records(blob)]
        assert [(r["warc_type"], r["payload"]) for r in parsed] == recs


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.binary(min_size=0, max_size=3000))
def test_untrusted_bytes_raise_cleanly(blob):
    """The codec-family hardening contract, applied to the WARC layer:
    arbitrary bytes either parse or raise ValueError (the clean,
    catchable error permissive mode accounts for) — never an index/
    struct/zlib error leaking through, never a hang."""
    try:
        for member in W.split_records(blob):
            W.parse_record(member)
    except ValueError:
        pass


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.binary(min_size=0, max_size=5000), min_size=1, max_size=8)
)
def test_indexed_split_parity_with_plain_split(payloads):
    """The indexed splitter (chunked feed, byte coordinates) yields the
    SAME member sequence as the streaming splitter, with coordinates
    that tile the blob exactly."""
    blob = b"".join(W.gzip_member(p) for p in payloads)
    idx = list(W.split_gzip_members_indexed(blob))
    assert [m for m, _, _ in idx] == list(W.split_gzip_members(blob))
    pos = 0
    for _, off, clen in idx:
        assert off == pos
        pos += clen
    assert pos == len(blob)


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.binary(min_size=256, max_size=2000), st.integers(0, 10**9))
def test_corrupted_indexed_member_raises_cleanly(payload, where):
    """Bit-flip past the gzip header: the indexed splitter keeps the
    ValueError-or-parse contract (never zlib/index errors)."""
    blob = bytearray(W.gzip_member(payload))
    pos = 18 + where % (len(blob) - 22)
    blob[pos] ^= 0xFF
    try:
        list(W.split_gzip_members_indexed(bytes(blob)))
    except ValueError:
        pass


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.binary(min_size=0, max_size=3000))
def test_chunked_framing_roundtrip(body):
    """_dechunk inverts _chunk_encode for arbitrary bodies (empty body,
    extension on the first chunk, trailer section included)."""
    assert W._dechunk(W._chunk_encode(body)) == body


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.binary(min_size=1, max_size=1500), st.integers(0, 10**9))
def test_corrupted_chunked_body_raises_cleanly(body, where):
    """Bit-flip anywhere in a chunked body: the dechunker either still
    yields bytes (flip landed in chunk data / extension / trailer slack)
    or fails with ValueError — never an index/struct error. Same
    discipline that caught the unwrapped zlib.error in r14."""
    blob = bytearray(W._chunk_encode(body))
    blob[where % len(blob)] ^= 0xFF
    try:
        out = W._dechunk(bytes(blob))
        assert isinstance(out, bytes)
    except ValueError:
        pass


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.binary(min_size=1, max_size=1500), st.integers(0, 10**9))
def test_corrupted_content_encoded_body_raises_cleanly(body, where):
    """Bit-flip a gzip/deflate payload body past the header: _inflate
    either decodes (slack) or raises ValueError — never zlib.error."""
    for enc, blob in (
        ("gzip", bytearray(W.gzip_member(body))),
        ("deflate", bytearray(zlib.compress(body))),
    ):
        pos = 4 + where % max(1, len(blob) - 4)
        blob[pos] ^= 0xFF
        try:
            out = W._inflate(bytes(blob), enc)
            assert isinstance(out, bytes)
        except ValueError:
            pass


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.binary(min_size=256, max_size=2000), st.integers(0, 10**9))
def test_corrupted_member_raises_cleanly(payload, where):
    """Bit-flip a byte past the gzip header of a valid member: the
    splitter must either still decode (flip landed in slack) or fail
    with ValueError — never a raw zlib.error. This fuzz CAUGHT the
    unwrapped zlib.error (which would have killed permissive-mode
    ingest on a bit-rotted archive instead of accounting it)."""
    blob = bytearray(W.gzip_member(payload))
    pos = 18 + where % (len(blob) - 22)
    blob[pos] ^= 0xFF
    try:
        list(W.split_gzip_members(bytes(blob)))
    except ValueError:
        pass


# Attribute values for the r16 quoted-attribute-aware tag rules: '>'
# inside quoted values must never split a tag. Double-quoted values
# exclude '"', single-quoted exclude "'"; both exclude '<' (a '<' in an
# attribute can form '<!--', which the comment passes — which run
# BEFORE the tag rules — legitimately treat as a comment opener).
_attr_dq = st.text(alphabet="ab >='!-;/", min_size=0, max_size=24)
_attr_sq = st.text(alphabet="cd >=\"!-;/", min_size=0, max_size=24)


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(_attr_dq, _attr_sq, _text)
def test_gt_in_attribute_pages_extract_exactly(spark, dq, sq, text):
    """Pages whose tags carry '>'/'<'-bearing quoted attribute values
    extract the SAME text as the attribute-free page — the tag span is
    consumed whole, never split at a quoted '>' (r16, former seam)."""
    safe = H.escape_html(text)
    page = (
        f'<div data-x="{dq}"><p title=\'{sq}\'>{safe}</p></div>'
        f'<a rel="{dq}">tail</a>'
    )
    got = (
        spark.range(1)
        .select(H.html_to_text(F.lit(page)))
        .collect()[0][0]
    )
    assert got == _norm(f"{_norm(text)} tail")
