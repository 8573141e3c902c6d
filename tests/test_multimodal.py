"""Python-twin coverage for operators whose oracle slots were retired
in the r5 registry fold (queries.py retirement table): simhash,
byte_histogram_features, frame_sample.  The fold-don't-append rule
keeps the driver's 50-slot window on the highest-information queries;
these twins keep the retired operators pinned regardless.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestSimhash:
    def _twin(self, text, bits=16):
        sig = 0
        votes = [0] * bits
        for w in text.split(" "):
            d = hashlib.md5(w.encode()).hexdigest()
            for j in range(bits):
                votes[j] += 1 if d[j] in "13579bdf" else -1
        for j, v in enumerate(votes):
            if v > 0:
                sig |= 1 << j
        return sig

    def test_matches_python_twin(self, spark):
        from kgkit.operators.dedup import simhash

        rows = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words here entirely"),
            (4, "a"),
        ]
        got = {r["doc_id"]: r["simhash"]
               for r in simhash(_docs(spark, rows)).collect()}
        assert got == {i: self._twin(t) for i, t in rows}

    def test_near_dups_are_close_in_hamming(self, spark):
        from kgkit.operators.dedup import simhash

        base = "alpha beta gamma delta epsilon zeta eta theta " * 4
        rows = [(1, base.strip()), (2, (base + "iota").strip()),
                (3, "one two three four five six seven eight")]
        got = {r["doc_id"]: r["simhash"]
               for r in simhash(_docs(spark, rows)).collect()}
        ham = lambda a, b: bin(a ^ b).count("1")
        assert ham(got[1], got[2]) < ham(got[1], got[3])


class TestByteHistogram:
    def test_matches_numpy_twin(self, spark):
        import numpy as np

        from kgkit.operators.multimodal import byte_histogram_features

        payloads = [(f"u{i}", bytes(range(i, 200, i + 1)) * (i + 1))
                    for i in range(4)] + [("empty", b"")]
        df = spark.createDataFrame(payloads, "url string, html binary")
        got = {(r["url"], r["bin"]): r["weight"]
               for r in byte_histogram_features(df).collect()}
        want = {}
        for url, raw in payloads:
            arr = np.frombuffer(raw, dtype=np.uint8)
            if arr.size == 0:
                continue  # empty payloads emit no rows
            hist = np.bincount(arr // 16, minlength=16)
            for b in np.flatnonzero(hist):
                want[(url, int(b))] = round(float(hist[b]) / arr.size, 6)
        assert got == pytest.approx(want)


class TestFrameSample:
    def test_sampling_arithmetic(self, spark):
        import hashlib

        from kgkit.operators.multimodal import frame_sample

        raw = bytes(range(256)) + b"tail"  # 4 full 64-byte frames + slack
        df = spark.createDataFrame(
            [("v", raw), ("short", b"x" * 10)], "url string, html binary"
        )
        got = {(r["url"], r["frame_idx"]): r["frame_digest"]
               for r in frame_sample(df, frame_bytes=64, every=2).collect()}
        # 4 frames, every 2nd -> idx 0 and 2; 10-byte payload -> 0 frames
        assert set(got) == {("v", 0), ("v", 2)}
        for idx in (0, 2):
            assert got[("v", idx)] == hashlib.md5(
                raw[idx * 64:(idx + 1) * 64]
            ).hexdigest()
