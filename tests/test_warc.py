"""Raw-crawl ingest (sources/warc.py + operators/html.py): gzip-member
splitting, WARC/HTTP parsing, HTML→text extraction rules, and the
lossless synth round-trip the catalog oracles rely on."""

import zlib

import pytest
from pyspark.sql import functions as F

from shopify_etl_spark.operators import html as H
from shopify_etl_spark.sources import warc as W


def _extract(spark, html_str, normalize=True):
    return (
        spark.range(1)
        .select(H.html_to_text(F.lit(html_str), normalize_ws=normalize))
        .collect()[0][0]
    )


class TestHtmlToText:
    def test_head_script_style_comment_dropped(self, spark):
        page = (
            "<html><head><title>skip</title><style>p{}</style>"
            '<script>var a="<p>trap</p>";</script></head>'
            "<body><!-- note with <b>tags</b> -->"
            "<p>keep this</p></body></html>"
        )
        assert _extract(spark, page) == "keep this"

    def test_inline_tags_deleted_in_place(self, spark):
        assert (
            _extract(spark, "<p>wo<b>r</b>d and <i>more</i></p>")
            == "word and more"
        )

    def test_block_tags_are_word_boundaries(self, spark):
        assert (
            _extract(spark, "<div>one</div><div>two</div>three<br>four")
            == "one two three four"
        )

    def test_single_pass_entity_decode(self, spark):
        # &amp;lt; must decode to the LITERAL text "&lt;", never "<"
        got = _extract(
            spark, "<p>&lt;tag&gt; &quot;q&quot; &#39;s&#39; "
            "a&nbsp;b &amp;lt; &amp;amp;</p>"
        )
        assert got == "<tag> \"q\" 's' a b &lt; &amp;"

    def test_attributes_and_doctype(self, spark):
        page = (
            "<!DOCTYPE html>\n<p class='x' data-v=\"<not a tag\">ok</p>"
        )
        # the quoted '<' inside an attribute is inside the tag's <...>
        # span, so the tag-stripper consumes it with the tag
        assert "ok" in _extract(spark, page)

    def test_no_normalization_keeps_newlines(self, spark):
        got = _extract(spark, "<p>a</p><p>b</p>", normalize=False)
        assert "a" in got and "b" in got and "\n" in got

    @pytest.mark.parametrize(
        "text",
        [
            "plain words only",
            "angle <brackets> & ampersands >>",
            "pre-escaped &amp; and &lt;p&gt; stay literal",
            "tabs\tand\nnewlines   collapse",
            "&copy; incomplete &zz; entities &",
        ],
    )
    def test_synth_roundtrip_lossless(self, spark, text):
        """The oracle-bearing property: for ANY text, extraction of
        synth_html(id, text) is exactly 'Doc {id} {ws-norm text} &copy;
        example end'."""
        import re

        got = _extract(spark, H.synth_html(7, text))
        want = "Doc 7 " + re.sub(r"\s+", " ", text.strip()) + \
            " &copy; example end"
        assert got == want


class TestWarcFormat:
    def test_member_split_and_boundaries(self):
        parts = [b"first record", b"second", b"x" * 70000]
        blob = b"".join(W.gzip_member(p) for p in parts)
        assert list(W.split_gzip_members(blob)) == parts

    def test_truncated_member_raises(self):
        blob = W.gzip_member(b"data" * 100)[:-5]
        with pytest.raises(ValueError, match="truncated gzip member"):
            list(W.split_gzip_members(blob))

    def test_record_roundtrip_and_http_peel(self):
        body = W._http_response(200, "OK", "<p>hi</p>")
        rec = W.build_record(
            "response",
            [
                ("WARC-Record-ID", "<urn:uuid:1>"),
                ("WARC-Target-URI", "http://crawl.example/doc/9"),
                ("Content-Type", "application/http; msgtype=response"),
            ],
            body,
        )
        p = W.parse_record(rec)
        assert p["warc_type"] == "response"
        assert p["target_uri"] == "http://crawl.example/doc/9"
        assert p["http_status"] == 200
        assert p["payload"] == b"<p>hi</p>"

    def test_non_http_record_payload_verbatim(self):
        rec = W.build_record(
            "warcinfo",
            [("Content-Type", "application/warc-fields")],
            b"software: x\r\n",
        )
        p = W.parse_record(rec)
        assert p["http_status"] is None
        assert p["payload"] == b"software: x\r\n"

    def test_not_warc_rejected(self):
        with pytest.raises(ValueError, match="not a WARC record"):
            W.parse_record(b"HTTP/1.1 200 OK\r\n\r\n")

    def test_missing_content_length_rejected(self):
        raw = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"
        with pytest.raises(ValueError, match="Content-Length"):
            W.parse_record(raw)

    def test_truncated_block_rejected(self):
        raw = (
            b"WARC/1.0\r\nWARC-Type: resource\r\n"
            b"Content-Type: text/plain\r\nContent-Length: 99\r\n\r\nshort"
        )
        with pytest.raises(ValueError, match="truncated"):
            W.parse_record(raw)


class TestDistributedSplit:
    def test_synth_split_inventory_and_extraction(self, spark):
        docs = spark.createDataFrame(
            [(i, f"word{i} " * 30) for i in range(40)],
            "doc_id long, text string",
        )
        files = W.synth_warc_files(docs, docs_per_file=10)
        assert files.count() == 4
        recs = W.warc_records(files)
        inv = {
            r["warc_type"]: r["n"]
            for r in recs.groupBy("warc_type")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert inv == {"warcinfo": 4, "request": 40, "response": 40}
        # 404 planting: doc 0 and 17 and 34 fail
        bad = recs.filter(F.col("http_status") == 404).count()
        assert bad == 3
        # end-to-end text recovery for one doc
        row = (
            recs.filter(
                (F.col("http_status") == 200)
                & F.col("target_uri").endswith("/doc/5")
            )
            .select(H.html_to_text(F.col("payload").cast("string")))
            .collect()[0][0]
        )
        assert row == "Doc 5 " + ("word5 " * 30).strip() + \
            " &copy; example end"

    def test_records_stream_memory_bounded(self):
        """The splitter never materializes the archive: decompression
        advances member-by-member via unused_data (structural check —
        split is a generator)."""
        import types

        blob = b"".join(W.gzip_member(b"r%d" % i) for i in range(5))
        g = W.split_gzip_members(blob)
        assert isinstance(g, types.GeneratorType)
        assert next(g) == b"r0"


class TestPlainWarc:
    def test_plain_and_gzip_split_agree(self):
        recs = [
            W.build_record(
                "resource",
                [("Content-Type", "text/plain")],
                b"payload %d" % i,
            )
            for i in range(4)
        ]
        plain = b"".join(recs)
        gz = b"".join(W.gzip_member(r) for r in recs)
        assert list(W.split_records(plain)) == list(W.split_records(gz))

    def test_plain_truncated_rejected(self):
        rec = W.build_record(
            "resource", [("Content-Type", "text/plain")], b"abc"
        )
        with pytest.raises(ValueError, match="truncated WARC record"):
            list(W.split_plain_records(rec[:-6]))

    def test_garbage_rejected(self):
        with pytest.raises(ValueError, match="neither gzip nor plain"):
            list(W.split_records(b"\x00\x01junk"))

    def test_http_mime_peeled(self):
        body = W._http_response(200, "OK", b"\x89PNG fake", "image/png")
        rec = W.build_record(
            "response",
            [
                ("WARC-Target-URI", "http://crawl.example/doc/2"),
                ("Content-Type", "application/http; msgtype=response"),
            ],
            body,
        )
        p = W.parse_record(rec)
        assert p["http_mime"] == "image/png"
        assert p["payload"] == b"\x89PNG fake"


class TestPermissiveMode:
    def test_bad_archive_salvages_prefix_and_accounts(self, spark):
        good = [
            W.gzip_member(
                W.build_record(
                    "resource", [("Content-Type", "text/plain")],
                    b"r%d" % i,
                )
            )
            for i in range(3)
        ]
        clipped = b"".join(good) + W.gzip_member(b"x" * 200)[:-4]
        files = spark.createDataFrame(
            [(0, b"".join(good)), (1, clipped)],
            "file_id long, warc binary",
        )
        # fail mode: the clipped member kills the job
        with pytest.raises(Exception, match="truncated gzip member"):
            W.warc_records(files).collect()
        rows = W.warc_records(files, mode="permissive").collect()
        by_file = {}
        for r in rows:
            by_file.setdefault(r.file_id, []).append(r)
        assert len(by_file[0]) == 3
        assert all(r.warc_type == "resource" for r in by_file[0])
        # file 1: the 3 records before the corruption point survive,
        # then ONE accounting row names the error
        assert [r.warc_type for r in by_file[1]] == [
            "resource", "resource", "resource", "corrupt",
        ]
        bad = by_file[1][-1]
        assert bad.rec_index == 3 and "truncated" in bad.mime

    def test_mode_validated(self, spark):
        files = spark.createDataFrame([(0, b"")], "file_id long, warc binary")
        with pytest.raises(ValueError, match="permissive"):
            W.warc_records(files, mode="lenient")
