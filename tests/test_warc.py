"""WARC source (kgkit/sources/warc.py): spec-shaped fixture files
through the Spark reader, malformed-member containment, HTML->text."""

from __future__ import annotations


def _fixture(path, extra=()):
    from kgkit.sources.warc import write_warc

    recs = [
        {"url": "http://a.com/1",
         "body": "<html><head><title>T</title><style>p{}</style></head>"
                 "<body><p>hello &amp; welcome</p><!-- c --></body></html>"},
        {"url": "http://a.com/2", "body": "<b>second  page</b>"},
        {"url": "http://a.com/miss", "body": "gone", "status": 404},
        {"url": "http://a.com/bin", "body": b"\x00\x01\x02",
         "mime": "application/octet-stream"},
        {"url": "http://a.com/meta", "body": "ignored",
         "warc_type": "request"},
    ] + list(extra)
    write_warc(recs, path)
    return recs


class TestParser:
    def test_roundtrip_fields(self, tmp_path):
        from kgkit.sources.warc import parse_warc_bytes

        p = str(tmp_path / "seg.warc")
        _fixture(p)
        recs = parse_warc_bytes(open(p, "rb").read())
        assert [r["url"] for r in recs] == [
            "http://a.com/1", "http://a.com/2", "http://a.com/miss",
            "http://a.com/bin", "http://a.com/meta",
        ]
        assert recs[0]["http_status"] == 200 and recs[0]["mime"] == "text/html"
        assert recs[2]["http_status"] == 404
        assert recs[3]["payload"] == b"\x00\x01\x02"
        assert recs[4]["warc_type"] == "request"

    def test_truncated_tail_keeps_completed_records(self, tmp_path):
        from kgkit.sources.warc import parse_warc_bytes

        p = str(tmp_path / "seg.warc")
        _fixture(p)
        data = open(p, "rb").read()
        recs = parse_warc_bytes(data[: len(data) - 40])  # cut mid-record
        assert 1 <= len(recs) < 5
        assert recs[0]["url"] == "http://a.com/1"

    def test_garbage_is_empty_not_raise(self):
        from kgkit.sources.warc import parse_warc_bytes

        assert parse_warc_bytes(b"not a warc file at all") == []


class TestSparkReader:
    def test_read_warc_rows(self, spark, tmp_path):
        from kgkit.sources.warc import read_warc

        _fixture(str(tmp_path / "a.warc"))
        _fixture(str(tmp_path / "b.warc"))
        df = read_warc(spark, str(tmp_path / "*.warc"))
        assert df.count() == 10  # 5 records x 2 files
        row = df.filter("url = 'http://a.com/bin'").first()
        assert bytes(row["payload"]) == b"\x00\x01\x02"

    def test_warc_pages_extracts_visible_text(self, spark, tmp_path):
        from kgkit.sources.warc import warc_pages

        _fixture(str(tmp_path / "a.warc"))
        rows = {r["url"]: r["text"]
                for r in warc_pages(spark, str(tmp_path / "a.warc")).collect()}
        # 404 / binary / request records are filtered; style+comment gone
        assert rows == {
            "http://a.com/1": "T hello & welcome",
            "http://a.com/2": "second page",
        }

    def test_double_escaped_entities_unescape_once(self, spark, tmp_path):
        """'&amp;lt;' renders as the literal text '&lt;' — the extractor
        must NOT double-unescape it into '<' (amp is replaced last)."""
        from kgkit.sources.warc import warc_pages, write_warc

        p = str(tmp_path / "d.warc")
        write_warc(
            [{"url": "http://x.com/e",
              "body": "<body>a &amp;lt; b &amp;amp; c &lt; d</body>"}],
            p,
        )
        (row,) = warc_pages(spark, p).collect()
        assert row["text"] == "a &lt; b &amp; c < d"

    def test_crawl_hygiene_end_to_end(self, spark, tmp_path):
        """The full crawl-hygiene composition: WARC segments ->
        warc_pages -> robots filter (distributed longest-match) ->
        clean_corpus.  Robots-denied pages and duplicate pages must
        both be gone from the cleaned output, with the drops
        accounted."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from kgkit.operators.corpus_clean import clean_corpus
        from kgkit.operators.urls import robots_apply, robots_rules_df
        from kgkit.sources.warc import warc_pages, write_warc

        body = ("<html><body>" + "the crawl corpus keeps many plain "
                "words about engines and joins across pages " * 3
                + "</body></html>")
        recs = [
            {"url": "http://ok.site.net/a", "body": body},
            {"url": "http://ok.site.net/private/b", "body": body},   # robots
            {"url": "http://ok.site.net/c", "body": body},           # dup of a
            {"url": "http://blocked.net/x", "body": body},           # deny-all
        ]
        write_warc(recs, str(tmp_path / "seg.warc"))
        pages = warc_pages(spark, str(tmp_path / "seg.warc"))
        rules = robots_rules_df(spark, {
            "ok.site.net": "User-agent: *\nDisallow: /private/\n",
            "blocked.net": "User-agent: *\nDisallow: /\n",
        })
        fetched = (
            robots_apply(
                pages.withColumn(
                    "doc_id",
                    F.row_number().over(Window.orderBy("url")).cast("long"),
                ),
                rules,
            )
            .filter(F.col("allowed"))
            .drop("allowed")
        )
        cleaned, stats = clean_corpus(fetched, quality_kwargs={"min_words": 5})
        urls = sorted(r["url"] for r in cleaned.collect())
        assert urls == ["http://ok.site.net/a"]
        assert stats["input"] == 2  # robots already removed 2 of 4
        assert stats["dropped_exact"] == 1  # the duplicate page

    def test_pages_feed_the_ner_pipeline(self, spark, tmp_path):
        """WARC -> pages -> mentions: the ingestion path composes with
        stage 1 end to end."""
        from kgkit.operators.mentions import detect_mentions
        from kgkit.sources.warc import warc_pages, write_warc

        p = str(tmp_path / "c.warc")
        write_warc(
            [{"url": "http://x.com/q",
              "body": "<html><body>the spark hash join runs</body></html>"}],
            p,
        )
        m = detect_mentions(warc_pages(spark, p)).collect()
        assert {(r["surface"], r["tag"]) for r in m} == {
            ("spark", "TECH"), ("hash join", "OP"),
        }
