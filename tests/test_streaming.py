"""Structured Streaming mention detection: stream result == batch result."""

from __future__ import annotations

import shutil
import tempfile

import pytest


@pytest.fixture(scope="module")
def landing_dir(spark):
    """Materialize sf0.001 pages into a landing directory (file source)."""
    from kgkit.sources.pages import load_pages

    d = tempfile.mkdtemp(prefix="kgkit_stream_")
    load_pages(spark, "/root/testdata/sf0.001").repartition(4).write.mode(
        "overwrite"
    ).parquet(f"{d}/pages")
    yield f"{d}/pages"
    shutil.rmtree(d, ignore_errors=True)


class TestStreamingMentions:
    def test_stream_equals_batch(self, spark, landing_dir):
        from kgkit.operators.mentions import detect_mentions
        from kgkit.streaming.mentions_stream import (
            detect_mentions_stream,
            read_pages_stream,
            windowed_tag_counts,
        )

        stream = read_pages_stream(spark, landing_dir)
        assert stream.isStreaming
        mentions = detect_mentions_stream(stream)
        counts = windowed_tag_counts(mentions, window="1 hour", watermark="2 hours")

        q = (
            counts.writeStream.format("memory")
            .queryName("tag_counts")
            .outputMode("append")  # watermark allows append for windows
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        # append mode only emits CLOSED windows; compare complete mode instead
        q2 = (
            detect_mentions_stream(read_pages_stream(spark, landing_dir))
            .groupBy("tag").count()
            .writeStream.format("memory").queryName("tag_totals")
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q2.awaitTermination(120)

        got = {
            r["tag"]: r["count"]
            for r in spark.sql("select * from tag_totals").collect()
        }
        batch_pages = spark.read.parquet(landing_dir)
        want = {
            r["tag"]: r["count"]
            for r in detect_mentions(batch_pages.select("url", "text"))
            .groupBy("tag").count().collect()
        }
        assert got == want and sum(want.values()) > 0

    def test_windowed_counts_schema(self, spark, landing_dir):
        from kgkit.streaming.mentions_stream import (
            detect_mentions_stream,
            read_pages_stream,
            windowed_tag_counts,
        )

        counts = windowed_tag_counts(
            detect_mentions_stream(read_pages_stream(spark, landing_dir))
        )
        assert [f.name for f in counts.schema.fields] == [
            "window_start", "window_end", "tag", "n"
        ]
        assert counts.isStreaming
