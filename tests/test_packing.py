"""Training-export sequence packing (operators/packing.py).

Differential twin: a pure-python replay of tokenize -> hash-vocab ids
-> shard -> concat-then-chunk over an ASCII fixture, plus partitioning
invariance and the single-python-stage plan pin."""

from __future__ import annotations

import hashlib
import re

import pytest

from kgkit.operators.packing import VOCAB, pack_sequences, token_ids

# ASCII twin of text_quality.BPE_RE (\p{L}/\p{N} restricted to the
# fixture's alphabet: lowercase words, digits, punctuation, spaces)
_BPE_ASCII = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"
)


def _hid(s: str, modulo: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16) % modulo


def _twin(rows, max_len, n_shards, vocab):
    shards: dict = {}
    for doc_id, text in rows:
        ids = [_hid(t, vocab) for t in _BPE_ASCII.findall(text)] + [vocab]
        shards.setdefault(_hid(str(doc_id), n_shards), []).append(
            (doc_id, ids)
        )
    out = {}
    for shard, docs in shards.items():
        docs.sort()
        stream, starts = [], []
        for _, ids in docs:
            starts.append(len(stream))
            stream.extend(ids)
        for c in range(len(stream) // max_len):
            seg = stream[c * max_len:(c + 1) * max_len]
            lo, hi = c * max_len, (c + 1) * max_len
            n_docs = sum(
                1
                for i, s in enumerate(starts)
                if s < hi and (starts[i + 1] if i + 1 < len(starts)
                               else len(stream)) > lo
            )
            out[(shard, c)] = (
                max_len,
                n_docs,
                hashlib.md5(";".join(map(str, seg)).encode()).hexdigest(),
            )
    return out


FIXTURE = [
    (i, f"doc {i} says the quick value {i * 7 % 13} moves, then "
        f"token stream {i} continues with more words apart")
    for i in range(24)
]


class TestPackSequences:
    def test_matches_python_twin(self, spark):
        docs = spark.createDataFrame(FIXTURE, "doc_id long, text string")
        got = {
            (r["shard"], r["seq_id"]): (r["n_tokens"], r["n_docs"],
                                        r["seq_hash"])
            for r in pack_sequences(
                docs, max_len=8, n_shards=4, vocab=97).collect()
        }
        want = _twin(FIXTURE, max_len=8, n_shards=4, vocab=97)
        assert got == want and len(want) > 20
        # windows genuinely span document boundaries (the packing point)
        assert any(v[1] > 1 for v in want.values())

    def test_tail_dropped(self, spark):
        # one tiny doc -> its shard has < max_len tokens -> no output
        docs = spark.createDataFrame([(1, "short text")],
                                     "doc_id long, text string")
        assert pack_sequences(docs, max_len=64, n_shards=4).count() == 0

    def test_partitioning_invariance(self, spark):
        docs = spark.createDataFrame(FIXTURE, "doc_id long, text string")
        a = sorted(
            map(tuple,
                pack_sequences(docs.repartition(3), max_len=8,
                               n_shards=4, vocab=97).collect())
        )
        b = sorted(
            map(tuple,
                pack_sequences(docs.repartition(17), max_len=8,
                               n_shards=4, vocab=97).collect())
        )
        assert a == b and len(a) > 0

    def test_token_ids_appends_eos(self, spark):
        docs = spark.createDataFrame([(7, "a b")], "doc_id long, text string")
        [row] = token_ids(docs, vocab=97).collect()
        assert row["ids"][-1] == 97
        assert all(0 <= i < 97 for i in row["ids"][:-1])

    def test_single_python_stage(self, spark):
        """Tokenize-to-ids must stay JVM-side: exactly one python node
        (the packing mapInPandas) in the executed plan."""
        docs = spark.createDataFrame(FIXTURE, "doc_id long, text string")
        plan = (
            pack_sequences(docs, max_len=8, n_shards=4, vocab=97)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("MapInPandas") == 1, plan
        assert "BatchEvalPython" not in plan, plan
        assert "ArrowEvalPython" not in plan, plan

    def test_registry_row(self, spark):
        from kgkit.queries import QUERIES

        df = QUERIES["pack_sequences"](spark, "/root/testdata/sf0.001")
        assert [f.name for f in df.schema.fields] == [
            "shard", "seq_id", "n_tokens", "n_docs", "seq_hash",
        ]
        rows = df.collect()
        assert all(r["n_tokens"] == 256 and r["n_docs"] >= 1 for r in rows)
