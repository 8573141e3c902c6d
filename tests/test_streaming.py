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
        q.awaitTermination(900)

        # append mode only emits CLOSED windows; compare complete mode instead
        q2 = (
            detect_mentions_stream(read_pages_stream(spark, landing_dir))
            .groupBy("tag").count()
            .writeStream.format("memory").queryName("tag_totals")
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q2.awaitTermination(900)

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


class TestStatefulSessions:
    def test_stream_sessions_match_batch_closed_sessions(self, spark, tmp_path):
        """applyInPandasWithState sessions == batch sessionization minus
        each user's open (last) session."""
        from kgkit.queries import QUERIES
        from kgkit.streaming.sessions import sessionize_stream

        sf = "/root/testdata/sf0.001"
        # single file -> one micro-batch -> deterministic per-user order
        landing = str(tmp_path / "events")
        spark.read.parquet(f"{sf}/events.parquet").coalesce(1).write.parquet(landing)

        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string"
            ).parquet(landing)
        )
        q = (
            sessionize_stream(stream)
            .writeStream.format("memory").queryName("sessions")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(900)
        got = {
            (r["user_id"], r["session_start"], r["session_end"]):
                (r["n_events"], round(r["total_value"], 4))
            for r in spark.sql("select * from sessions").collect()
        }

        batch = QUERIES["user_sessions"](spark, sf).collect()
        # drop each user's last (still-open) session
        last_per_user = {}
        for r in batch:
            cur = last_per_user.get(r["user_id"])
            if cur is None or r["session_no"] > cur["session_no"]:
                last_per_user[r["user_id"]] = r
        want = {
            (r["user_id"], r["session_start"], r["session_end"]):
                (r["n_events"], round(r["total_value"], 4))
            for r in batch
            if last_per_user[r["user_id"]]["session_no"] != r["session_no"]
        }
        assert got == want and len(got) > 0
