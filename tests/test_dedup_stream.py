"""Streaming recrawl dedup (kgkit/streaming/dedup_stream.py):
micro-batch semantics == the batch operator, and the grown index makes
later batches dedup against earlier stream content."""

from __future__ import annotations

import pytest


BASE = "the quick brown fox jumps over the lazy dog again and again"
OTHER = "completely different words nothing shared here at all truly"
THIRD = "a third unique body of text with its own tokens entirely new"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestProcessBatchSemantics:
    def test_first_batch_equals_batch_operator(self, spark):
        from kgkit.operators.dedup import incremental_near_dups
        from kgkit.streaming.dedup_stream import IncrementalDedupStream

        corpus = _df(spark, [(1, BASE), (2, OTHER)])
        batch = _df(spark, [(101, BASE), (102, THIRD)])
        stream_pairs = {
            tuple(r)
            for r in IncrementalDedupStream(corpus).process_batch(batch).collect()
        }
        batch_pairs = {
            tuple(r) for r in incremental_near_dups(corpus, batch).collect()
        }
        assert stream_pairs == batch_pairs == {(1, 101, 1.0)}

    def test_grown_index_catches_intra_stream_dups(self, spark):
        from kgkit.streaming.dedup_stream import IncrementalDedupStream

        corpus = _df(spark, [(1, BASE)])
        stm = IncrementalDedupStream(corpus, grow_index=True)
        b1 = _df(spark, [(101, THIRD)])
        b2 = _df(spark, [(201, THIRD), (202, BASE)])

        p1 = {tuple(r) for r in stm.process_batch(b1).collect()}
        assert p1 == set()  # THIRD matches nothing in the corpus
        p2 = {tuple(r) for r in stm.process_batch(b2).collect()}
        # 201 duplicates batch-1's 101 (grown index); 202 duplicates
        # the original corpus doc
        assert p2 == {(101, 201, 1.0), (1, 202, 1.0)}

    def test_static_index_misses_intra_stream_dups(self, spark):
        """The contract boundary: without grow_index, batch-vs-batch
        pairs are (deliberately) not reported."""
        from kgkit.streaming.dedup_stream import IncrementalDedupStream

        stm = IncrementalDedupStream(_df(spark, [(1, BASE)]), grow_index=False)
        stm.process_batch(_df(spark, [(101, THIRD)])).collect()
        p2 = {
            tuple(r)
            for r in stm.process_batch(_df(spark, [(201, THIRD)])).collect()
        }
        assert p2 == set()


class TestStreamingEngine:
    def test_foreachbatch_end_to_end(self, spark, tmp_path):
        from kgkit.streaming.dedup_stream import IncrementalDedupStream

        landing = str(tmp_path / "landing")
        _df(spark, [(101, BASE), (102, THIRD)]).write.parquet(landing)

        corpus = _df(spark, [(1, BASE), (2, OTHER)])
        stm = IncrementalDedupStream(corpus)
        got = []

        def sink(pairs, batch_id):
            got.extend(tuple(r) for r in pairs.collect())

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(landing)
        )
        q = stm.attach(
            stream, sink,
            checkpoint_dir=str(tmp_path / "ckpt"),
            trigger_once=True,
        )
        q.awaitTermination(900)
        assert set(got) == {(1, 101, 1.0)}


class TestIndexMaintenance:
    def test_compaction_preserves_results_and_folds_parts(self, spark):
        """Growing past compact_every folds the part lists into single
        eagerly-materialized frames without changing any answer."""
        from kgkit.streaming.dedup_stream import IncrementalDedupStream

        stm = IncrementalDedupStream(
            _df(spark, [(1, BASE)]), grow_index=True, compact_every=2
        )
        assert (len(stm.sh_parts), len(stm.bt_parts)) == (1, 1)
        p1 = {tuple(r) for r in stm.process_batch(_df(spark, [(101, THIRD)])).collect()}
        assert p1 == set()
        assert len(stm.bt_parts) == 2
        p2 = {tuple(r) for r in stm.process_batch(_df(spark, [(201, OTHER)])).collect()}
        assert p2 == set()
        # second grown batch hits compact_every=2 -> parts folded to one
        assert (len(stm.sh_parts), len(stm.bt_parts)) == (1, 1)
        # post-compaction probes still see ALL earlier stream content
        p3 = {
            tuple(r)
            for r in stm.process_batch(
                _df(spark, [(301, THIRD), (302, OTHER), (303, BASE)])
            ).collect()
        }
        assert p3 == {(101, 301, 1.0), (201, 302, 1.0), (1, 303, 1.0)}

    def test_kill_and_resume_keeps_grown_index(self, spark, tmp_path):
        """A new session resumed from index_dir sees everything the dead
        session indexed — no source replay needed — and matches a
        never-killed stream on the same batches."""
        from kgkit.streaming.dedup_stream import IncrementalDedupStream

        idx = str(tmp_path / "idx")
        stm = IncrementalDedupStream(
            _df(spark, [(1, BASE)]), grow_index=True, index_dir=idx
        )
        assert stm.process_batch(_df(spark, [(101, THIRD)]), batch_id=0).collect() == []
        del stm  # "kill" the session; only idx + source checkpoint survive

        resumed = IncrementalDedupStream.resume(spark, idx, grow_index=True)
        b2 = _df(spark, [(201, THIRD), (202, BASE)])
        p2 = {tuple(r) for r in resumed.process_batch(b2, batch_id=1).collect()}
        # 201 dups the DEAD session's batch doc, 202 the corpus doc
        assert p2 == {(101, 201, 1.0), (1, 202, 1.0)}

        control = IncrementalDedupStream(_df(spark, [(1, BASE)]), grow_index=True)
        control.process_batch(_df(spark, [(101, THIRD)])).collect()
        pc = {tuple(r) for r in control.process_batch(b2).collect()}
        assert p2 == pc

    def test_resume_after_compaction_and_cleanup(self, spark, tmp_path):
        """Compaction writes a gen + manifest and removes folded batch
        dirs; resume loads the gen (once — no pair duplication) and
        continues growing."""
        import os

        from kgkit.streaming.dedup_stream import IncrementalDedupStream

        idx = str(tmp_path / "idx")
        stm = IncrementalDedupStream(
            _df(spark, [(1, BASE)]),
            grow_index=True, compact_every=2, index_dir=idx,
        )
        stm.process_batch(_df(spark, [(101, THIRD)]), batch_id=0).collect()
        stm.process_batch(_df(spark, [(201, OTHER)]), batch_id=1).collect()
        # compact_every=2 reached -> gen=0 written, batch parts folded away
        names = sorted(os.listdir(os.path.join(idx, "shingles")))
        assert names == ["gen=0"]
        assert os.path.exists(os.path.join(idx, "manifest-0.json"))

        resumed = IncrementalDedupStream.resume(
            spark, idx, grow_index=True, compact_every=2
        )
        p3 = {
            tuple(r)
            for r in resumed.process_batch(
                _df(spark, [(301, THIRD), (302, OTHER), (303, BASE)]),
                batch_id=2,
            ).collect()
        }
        assert p3 == {(101, 301, 1.0), (201, 302, 1.0), (1, 303, 1.0)}

    def test_resume_skips_torn_write_and_folded_leftovers(self, spark, tmp_path):
        """The _SUCCESS/manifest discipline: a part dir without _SUCCESS
        (torn write) is ignored, and a folded dir that survived a crash
        before deletion is excluded by the manifest — no double-load,
        hence no duplicated verify pairs."""
        import json
        import os
        import shutil

        from kgkit.streaming.dedup_stream import (
            IncrementalDedupStream,
            _scan_index_dir,
        )

        idx = str(tmp_path / "idx")
        stm = IncrementalDedupStream(
            _df(spark, [(1, BASE)]),
            grow_index=True, compact_every=2, index_dir=idx,
        )
        stm.process_batch(_df(spark, [(101, THIRD)]), batch_id=0).collect()
        stm.process_batch(_df(spark, [(201, OTHER)]), batch_id=1).collect()

        # simulate a crash BETWEEN manifest rename and cleanup: restore a
        # folded batch dir by copying gen=0 under the old name, and plant
        # a torn write (no _SUCCESS)
        for sub in ("shingles", "bands"):
            shutil.copytree(
                os.path.join(idx, sub, "gen=0"),
                os.path.join(idx, sub, "batch=0"),
            )
            os.makedirs(os.path.join(idx, sub, "batch=9"))  # torn: no _SUCCESS
        folded = json.load(open(os.path.join(idx, "manifest-0.json")))["folded"]
        assert "batch=0" in folded

        gen, parts, folded_scan = _scan_index_dir(idx)
        assert gen == "gen=0" and parts == []
        assert "batch=0" in folded_scan

        resumed = IncrementalDedupStream.resume(spark, idx, grow_index=True)
        pairs = resumed.process_batch(
            _df(spark, [(301, BASE)]), batch_id=3
        ).collect()
        assert [tuple(r) for r in pairs] == [(1, 301, 1.0)]  # exactly once

    def test_probe_time_cap_counts_whole_grown_buckets(self, spark):
        """max_bucket is enforced over the GROWN index at probe time:
        a bucket that only exceeds the cap after stream appends stops
        yielding candidates."""
        from kgkit.streaming.dedup_stream import IncrementalDedupStream

        stm = IncrementalDedupStream(
            _df(spark, [(i, BASE) for i in range(3)]),
            grow_index=True, max_bucket=4,
        )
        # grow the BASE bucket past the cap (3 corpus + 2 stream = 5 > 4)
        p1 = {
            tuple(r)
            for r in stm.process_batch(_df(spark, [(101, BASE), (102, BASE)])).collect()
        }
        assert p1 == {(i, j, 1.0) for i in range(3) for j in (101, 102)}
        p2 = {tuple(r) for r in stm.process_batch(_df(spark, [(201, BASE)])).collect()}
        assert p2 == set()


class TestReplayIdempotence:
    """foreachBatch is at-least-once: a replayed batch (sink retry, or
    crash between the durable part write and the offset commit) must
    emit its ORIGINAL pairs — no self-matches — and must not append its
    part to the index a second time."""

    def test_in_session_retry_same_batch_id(self, spark):
        from kgkit.streaming.dedup_stream import IncrementalDedupStream

        stm = IncrementalDedupStream(
            _df(spark, [(1, BASE)]), grow_index=True
        )
        batch = _df(spark, [(101, BASE), (102, THIRD)])
        first = sorted(
            tuple(r) for r in stm.process_batch(batch, batch_id=0).collect()
        )
        n_parts = len(stm.sh_parts)
        # simulated sink failure -> Spark re-invokes the same batch_id
        replay = sorted(
            tuple(r) for r in stm.process_batch(batch, batch_id=0).collect()
        )
        assert replay == first == [(1, 101, 1.0)]
        assert len(stm.sh_parts) == n_parts  # no double-append
        # and the index still works for the NEXT batch
        nxt = stm.process_batch(_df(spark, [(201, THIRD)]), batch_id=1)
        assert sorted(tuple(r) for r in nxt.collect()) == [(102, 201, 1.0)]

    def test_resume_then_replay_uncommitted_batch(self, spark, tmp_path):
        from kgkit.streaming.dedup_stream import IncrementalDedupStream

        idx = str(tmp_path / "idx")
        stm = IncrementalDedupStream(
            _df(spark, [(1, BASE)]), grow_index=True,
            compact_every=100, index_dir=idx,
        )
        batch = _df(spark, [(101, BASE)])
        first = [tuple(r)
                 for r in stm.process_batch(batch, batch_id=0).collect()]
        assert first == [(1, 101, 1.0)]
        # the durable part for batch 0 exists but pretend the offset
        # commit never happened: a restarted stream resumes the index
        # and replays batch 0
        resumed = IncrementalDedupStream.resume(spark, idx, grow_index=True)
        n_parts = len(resumed.sh_parts)
        replay = [tuple(r)
                  for r in resumed.process_batch(batch, batch_id=0).collect()]
        assert replay == first  # no (101, 101) self-pair
        assert len(resumed.sh_parts) == n_parts  # part not re-appended

    def test_fresh_batch_recrawling_same_doc_id_still_pairs(self, spark):
        """The guard is replay-conditional: a FRESH batch that re-uses a
        corpus doc_id (a recrawl of the same document) must still emit
        its cross-version pairs."""
        from kgkit.streaming.dedup_stream import IncrementalDedupStream

        stm = IncrementalDedupStream(
            _df(spark, [(1, BASE), (2, OTHER)]), grow_index=True
        )
        # doc_id 1 comes around again in a new snapshot, same text
        out = stm.process_batch(_df(spark, [(1, BASE)]), batch_id=0)
        assert [tuple(r) for r in out.collect()] == [(1, 1, 1.0)]
