"""HTML → text extraction for raw-crawl ingest, plus the deterministic
HTML synthesizer its oracle gate runs against.

Why this exists: the engine's curation operators (``text.py``) start at
clean ``documents.text`` — but a 100 TB training-data build starts at a
crawl, where every payload is HTML that must be tag-stripped before any
quality gate can run (the reference's own front door is likewise an
ingest scan, ``extract_table.py:134-174``, pulling raw envelopes before
any transform). This module is the missing step between the WARC record
splitter (``sources/warc.py``) and the quality/dedup/tokenize pipeline.

Design: :func:`html_to_text` is ONE Column expression — a fixed chain of
JVM-side ``regexp_replace`` passes, zero Python in the hot path, zero
shuffle, fully fused into whole-stage codegen with whatever projection
consumes it. Per-document regex cost is linear in payload size and the
operator is embarrassingly parallel, so the 100 TB story is simply "as
many tasks as input splits".

Extraction rules (the boilerplate-free core of every production
extractor — trafilatura/jusText handle layout heuristics on top, but the
tag/entity layer below is the deterministic part):

1. drop ``<head>…</head>`` wholesale (title/meta/style/script live
   there; body text is what trains); an UNTERMINATED ``<head>`` (real
   crawl HTML omits closers constantly) drops up to ``<body`` — the
   browser recovery rule — or end-of-input,
2. drop ``<script>``/``<style>`` blocks and ``<!-- comments -->``
   anywhere (their CONTENT must vanish, not just their tags — a comment
   may contain markup); an unterminated opener drops to end-of-input,
3. block-level tags (``p, div, h1-h6, li, ul, ol, tr, td, th, table,
   br, section, article, header, footer, blockquote, pre``) become
   newlines — block boundaries are word boundaries,
4. every remaining (inline) tag is deleted in place — ``<b>word</b>``
   must yield ``word``, not ``word`` split in two,
5. entities decode ONCE (single-pass unescape): the named XML five +
   ``&apos;``/``&nbsp;``, their decimal/hex numeric twins
   (``&#60;``/``&#x3C;`` …, optional leading zeros, case-insensitive
   hex), and the common typographic numerics (dashes, curly quotes,
   ellipsis). Every spelling of ``&`` routes through a noncharacter
   sentinel so ``&amp;copy;`` yields the literal text ``&copy;`` and
   ``&amp;#38;`` the literal ``&#38;`` (double-decoding is a classic
   extractor bug). Numeric references outside the bounded set pass
   through as literal text — the documented seam (COVERAGE.md),
6. optional whitespace normalization (``\\s+`` → one space + trim).

Tag spans are QUOTED-ATTRIBUTE-AWARE (r16 — the former documented
seam, closed): rules 3-4 consume ``="…"`` / ``='…'`` attribute-value
atoms (a quote opens a value only after ``=``, the HTML5 rule) or
plain non-``<``/``>`` characters — one possessive JVM regex, linear —
so ``<a title="a>b">`` is consumed whole instead of mis-splitting at
the quoted ``>``, while a stray apostrophe in an UNQUOTED value
(``<a title=it's>``) stays a plain character and the tag ends at the
first ``>`` (browser behavior — no text is swallowed). A tag whose
span cannot complete (a ``<`` before any ``>``) falls back to the old
first-``>`` deletion in a second pass.

The synthesizer (:func:`synth_html`) is the gate's other half: it embeds
a document's text into a template that exercises every rule above
(head with script/style, a body script, a comment containing tags, an
escaped-entity footer, inline ``<b>`` inside paragraphs), built so the
round-trip is PROVABLY lossless: escaped text contains no ``<``/``>``
and only well-formed ``&…;`` escapes, so tag-stripping never touches it
and the single-pass unescape restores it exactly. The SQL oracle
(``plans``: ``html_extract_docs``) therefore recomputes the expected
output from ``documents.text`` alone — a one-byte extraction bug
hash-mismatches without the oracle ever parsing HTML.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Block-level elements whose boundaries are word boundaries. Kept to a
# fixed public list so the Spark plan and any reimplementation agree.
BLOCK_TAGS = (
    "p|div|h[1-6]|li|ul|ol|table|tr|td|th|section|article|"
    "header|footer|blockquote|pre"
)

# A tag's attribute span: quoted values may contain ">" (the r15
# verdict's extractor seam), so tag regexes consume quoted atoms or
# plain characters — never a bare [^>]*. Two refinements from the r16
# self-review:
# * a quote opens a quoted value ONLY when it follows "=" (the HTML5
#   attribute-value rule) — a stray apostrophe in an UNQUOTED value
#   (<a title=it's>) is a plain character, not a span opener that
#   would swallow text up to the next apostrophe in the document;
# * possessive quantifiers (*+): the alternatives overlap ("=" can
#   start a quoted atom or be a plain char), and without possessive
#   matching a long attribute run with no closing ">" backtracks
#   combinatorially in Java's engine. Possessive = one deterministic
#   pass, fail fast.
# Plain chars exclude "<" (a new tag opener bounds the span; the
# leftover malformed tag is handled by the first-">" fallback pass).
# A properly "="-opened quote may still span ">" — that is the
# feature, and it matches the HTML5 tokenizer (browsers too consume a
# quoted value to its closing quote even across ">").
_TAG_ATTRS = "(?:=\\s*+\"[^\"]*+\"|=\\s*+'[^']*+'|[^<>])*+"

# Single-pass unescape over a REPLACE chain needs every spelling of
# "&" (named + numeric + hex) parked on a sentinel until all other
# entities have decoded — otherwise "&amp;#38;" would decode twice
# ("&#38;" then "&"). The sentinel is U+FFFF, a Unicode NONCHARACTER
# forbidden in interchanged text, so dropping any pre-existing
# occurrence first is lossless on every conforming page.
_SENTINEL = "￿"

# Named entities other than &amp; (literal single-pass replaces; their
# decoded outputs contain no "&", so ordering among them is free).
_NAMED_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&nbsp;", " "),
)

# Numeric character references (VERDICT r14 #2): (decimal, hex,
# replacement) — each becomes ONE case-insensitive regexp accepting
# optional leading zeros in both radixes: (?i)&#(?:0*DEC|x0*HEX);.
# The bounded set = the numeric twins of the named entities plus the
# typographic punctuation real crawls actually carry; references
# outside it pass through as literal text (documented seam,
# COVERAGE.md).
_NUMERIC_ENTITIES = (
    ("60", "3c", "<"),
    ("62", "3e", ">"),
    ("34", "22", '"'),
    ("39", "27", "'"),
    ("160", "a0", " "),
    ("8211", "2013", "–"),   # en dash
    ("8212", "2014", "—"),   # em dash
    ("8216", "2018", "‘"),   # left single quote
    ("8217", "2019", "’"),   # right single quote
    ("8220", "201c", "“"),   # left double quote
    ("8221", "201d", "”"),   # right double quote
    ("8230", "2026", "…"),   # ellipsis
)


def html_to_text(col: Column | str, normalize_ws: bool = True) -> Column:
    """Extract visible text from an HTML string column (rules above).

    Pure JVM ``regexp_replace`` chain — usable inside any projection;
    with ``normalize_ws`` the result is single-spaced and trimmed (the
    form the tokenizer, shinglers and hashes downstream expect).
    """
    c = F.col(col) if isinstance(col, str) else col
    # 1-2: container content drops. (?is) = dot-all + case-insensitive;
    # non-greedy bodies so adjacent blocks don't merge. Each terminated
    # drop is followed by an UNTERMINATED fallback (ADVICE r14: real
    # crawl HTML routinely omits closing tags — without the fallback,
    # title/script/style text would leak into extracted output): a
    # <head> with no </head> drops up to <body> (the browser recovery
    # rule) or end-of-input; an unclosed <script>/<style>/<!-- drops to
    # end-of-input. Best-effort on adversarial markup: a "<body" or
    # "</script>" LITERAL inside JS strings still terminates the drop.
    # Pass order matters: TERMINATED containers first (a script body may
    # itself contain "<!--" — the classic comment-hiding idiom), then
    # terminated comments (so a commented-out "<script>" opener vanishes
    # WITH its comment instead of tripping the unterminated fallback and
    # wiping the rest of the page), then the unterminated fallbacks.
    c = F.regexp_replace(c, r"(?is)<head\b.*?</head>", " ")
    c = F.regexp_replace(c, r"(?is)<script\b.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?is)<head\b[^>]*>.*?(?=<body\b|\z)", " ")
    c = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*\z", " ")
    c = F.regexp_replace(c, r"(?is)<style\b[^>]*>.*\z", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*\z", " ")
    # 3: block boundaries -> newline (covers open, close, self-closing
    # and attribute-bearing forms; <br> folded in via the alternation;
    # quoted-attribute-aware so a ">" inside title="a>b" doesn't split
    # the tag)
    c = F.regexp_replace(
        c, r"(?i)</?(?:br|" + BLOCK_TAGS + r")\b" + _TAG_ATTRS + ">", "\n"
    )
    # 4: remaining tags (inline elements, doctype, stray closers) vanish
    # — quoted-attribute-aware first, then the first-">" fallback for
    # malformed tags (unpaired quote) so sloppy markup still strips
    c = F.regexp_replace(c, r"(?s)<" + _TAG_ATTRS + ">", "")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", "")
    # 5: single-pass entity decode. Every spelling of "&" (&amp;,
    # &#38;, &#x26;) parks on the noncharacter sentinel FIRST so e.g.
    # "&amp;#38;" yields the literal "&#38;" and "&#38;amp;" yields the
    # literal "&amp;" — never a double decode; all other entities then
    # decode (their outputs contain no "&"); the sentinel restores last.
    c = F.replace(c, F.lit(_SENTINEL), F.lit(""))
    c = F.replace(c, F.lit("&amp;"), F.lit(_SENTINEL))
    c = F.regexp_replace(c, r"(?i)&#(?:0*38|x0*26);", _SENTINEL)
    for ent, ch in _NAMED_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    for dec, hx, ch in _NUMERIC_ENTITIES:
        c = F.regexp_replace(c, rf"(?i)&#(?:0*{dec}|x0*{hx});", ch)
    c = F.replace(c, F.lit(_SENTINEL), F.lit("&"))
    if normalize_ws:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def html_title(col: Column | str) -> Column:
    """The ``<title>`` text of an HTML string column — titles live in
    ``<head>``, which :func:`html_to_text` deliberately drops, so
    metadata extraction (the WAT export) reads it separately. Empty
    when absent.

    Applies the SAME container discipline as extraction (the r16
    review): terminated scripts drop first (a script string may
    contain ``<title>`` markup), then terminated comments (a
    commented-out title vanishes WITH its comment), then the
    unterminated fallbacks — so the first *visible* title wins, and
    the title tag's own attribute span is quoted-attribute-aware."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"(?is)<script\b.*?</script>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*\z", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*\z", " ")
    return F.regexp_extract(
        c, r"(?is)<title\b" + _TAG_ATTRS + r">(.*?)</title>", 1
    )


def html_outlinks(col: Column | str) -> Column:
    """Outlink URLs of an HTML string column: ``href`` values with an
    absolute http/https scheme — the ONE link-extraction definition
    shared by the link-graph queries and the WAT export (the r16
    review: two verbatim copies had already appeared; a pattern fix
    must not silently diverge the two consumers).

    Real-page coverage (ADVICE r16): all three HTML attribute-value
    forms match — double-quoted, single-quoted, and unquoted
    (terminated by whitespace/quote/``>``; each alternative excludes
    the other two's opener, so no href double-counts) — and extracted
    URLs are entity-decoded for ``&amp;`` (the one entity HTML
    serializers are required to escape inside attribute values;
    ``&amp;x`` in markup means the literal ``&x`` in the URL). Link
    ORDER is by-form then by-position, not document order — every
    consumer aggregates (edge counts, outlink counts), none is
    order-sensitive. Three JVM ``regexp_extract_all`` + one array
    ``transform``; zero Python."""
    c = F.col(col) if isinstance(col, str) else col
    dq = F.regexp_extract_all(
        c, F.lit(r"href=\"(https?://[^\"]+)\""), 1
    )
    sq = F.regexp_extract_all(c, F.lit(r"href='(https?://[^']+)'"), 1)
    uq = F.regexp_extract_all(
        c, F.lit(r"href=(https?://[^\s\"'<>]+)"), 1
    )
    return F.transform(
        F.concat(dq, sq, uq),
        lambda u: F.replace(u, F.lit("&amp;"), F.lit("&")),
    )


def escape_html(text: str) -> str:
    """Minimal HTML escape (``&`` first — the inverse of the decode
    table's ``&amp;``-last order)."""
    return (
        text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def synth_html(
    doc_id: int,
    text: str,
    words_per_para: int = 40,
    links: tuple[str, ...] = (),
    meta_charset: str | None = None,
) -> str:
    """Deterministic HTML page embedding ``text`` — the fixture twin of
    ``multimodal.synth_png_assets``: every :func:`html_to_text` rule is
    exercised, and the extractable text is exactly
    ``Doc {doc_id} {ws-normalized text} &copy; example end`` (the SQL
    oracle's formula). Paragraphs of ``words_per_para`` words, each
    opening word wrapped in inline ``<b>``.

    ``links`` renders an outlink nav with EMPTY anchor text (the hrefs
    are extractable by the link-graph queries while tag-stripping adds
    zero visible text — the lossless formula above holds unchanged);
    ``meta_charset`` plants a ``<meta charset=…>`` declaration in the
    head (dropped by extraction) for the header-less charset-sniffing
    fixture.
    """
    words = escape_html(text).split()
    paras = []
    for i in range(0, len(words), words_per_para):
        chunk = words[i:i + words_per_para]
        chunk[0] = f"<b>{chunk[0]}</b>"
        paras.append("<p>" + " ".join(chunk) + "</p>")
    body = "\n".join(paras)
    meta = f'<meta charset="{meta_charset}">' if meta_charset else ""
    nav = (
        '<div class="nav">'
        + "".join(f'<a href="{u}"></a>' for u in links)
        + "</div>\n"
        if links
        else ""
    )
    return (
        "<!DOCTYPE html>\n"
        '<html lang="en">\n'
        f"<head>{meta}<title>t{doc_id}</title>"
        "<style>body{color:#000}</style>"
        '<script>var t="<p>head noise</p>";</script></head>\n'
        "<body>\n"
        "<!-- synthetic crawl page with <tags> inside a comment -->\n"
        f"<h1>Doc {doc_id}</h1>\n"
        f'<script type="text/javascript">document.write("n{doc_id}");'
        "</script>\n"
        f"{body}\n"
        f"{nav}"
        '<div class="footer">&amp;copy; example<br/>end</div>\n'
        "</body></html>\n"
    )


__all__ = [
    "html_to_text", "html_title", "html_outlinks", "escape_html",
    "synth_html", "BLOCK_TAGS",
]
