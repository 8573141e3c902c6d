"""Training-export sequence packing — documents -> fixed-length
token-id sequences, the terminal stage of an LLM training-data
pipeline (crawl -> clean -> dedup -> mix -> PACK).

GPT-style concat-then-chunk: each document is pretokenized with the
BPE-ish regex (text_quality.BPE_RE — the segmentation LLM token
budgets are measured in), every token mapped to a hash-vocab id
(md5-prefix % vocab — the shingle convention of operators/dedup.py,
so the DuckDB oracle replays it verbatim), an EOS id (= vocab)
appended per document, and the shard's id stream concatenated in
doc_id order and cut into ``max_len`` windows.  The final partial
window of each shard is dropped (standard pretraining practice); the
corpus-wide loss is bounded by ``n_shards * (max_len - 1)`` tokens.

Scale design: packing is SEQUENTIAL by definition within a stream, so
the parallelism unit is the SHARD (doc-hash buckets, the triple
sink's url-hash discipline).  Shard assignment and tokenize-to-ids
are pure JVM projections (regexp_extract_all + transform + md5 — no
python in the token path); the ONE shuffle is
``repartition(n_shards, shard)`` + ``sortWithinPartitions``, after
which a hash-partitioned shard never splits across partitions and
each packs independently inside one Arrow-batched ``mapInPandas``
pass — no per-token explosion, no driver involvement.  Choose
``n_shards`` well above the executor count: a shard's id stream
(~corpus/n_shards tokens) is the task's working set, exactly like a
packing worker's buffer in a conventional exporter.

Output rows carry ``seq_hash`` (md5 of the ';'-joined ids) rather
than the raw id array so the cross-engine compare needs no
list-canonicalization — the sequences themselves would be written by
the sink in production (``write_table`` on the same frame with the
ids kept).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgkit.operators.text_quality import BPE_RE

VOCAB = 32768          # hash-vocab size; EOS id == VOCAB
PACK_SCHEMA = (
    "shard long, seq_id long, n_tokens long, n_docs long, seq_hash string"
)


def _hash_id(col, modulo: int):
    """md5-7-hex-prefix % modulo — shared verbatim with the oracle
    (('0x' || substr(md5(x), 1, 7))::BIGINT % modulo)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("bigint")
        % F.lit(modulo)
    )


def token_ids(docs: DataFrame, vocab: int = VOCAB) -> DataFrame:
    """(doc_id, ids): BPE-ish pretokens -> hash-vocab ids + trailing
    EOS, one JVM projection."""
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), F.lit(0))
    ids = F.concat(
        F.transform(toks, lambda t: _hash_id(t, vocab)),
        F.array(F.lit(vocab).cast("bigint")),
    )
    return docs.select("doc_id", ids.alias("ids"))


def pack_sequences(
    docs: DataFrame,
    max_len: int = 256,
    n_shards: int = 64,
    vocab: int = VOCAB,
) -> DataFrame:
    """documents(doc_id, text) -> packed sequences
    (shard, seq_id, n_tokens, n_docs, seq_hash).

    ``n_docs`` counts the documents contributing at least one token to
    the window (the doc spanning the window start plus every doc
    starting inside it) — the statistic attention-mask construction
    needs downstream.
    """
    with_shard = token_ids(docs, vocab).withColumn(
        "shard", _hash_id(F.col("doc_id").cast("string"), n_shards)
    )
    arranged = with_shard.repartition(n_shards, "shard").sortWithinPartitions(
        "shard", "doc_id"
    )

    def _pack(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        out = {k: [] for k in
               ("shard", "seq_id", "n_tokens", "n_docs", "seq_hash")}
        cur = None
        ids_list: list = []
        starts: list = []
        total = 0

        def flush() -> None:
            if cur is None:
                return
            ids = (
                np.concatenate(ids_list)
                if ids_list else np.array([], dtype=np.int64)
            )
            starts_arr = np.asarray(starts, dtype=np.int64)
            for c in range(len(ids) // max_len):
                seg = ids[c * max_len:(c + 1) * max_len]
                lo = np.searchsorted(
                    starts_arr, c * max_len, side="right") - 1
                hi = np.searchsorted(
                    starts_arr, (c + 1) * max_len, side="left")
                payload = ";".join(map(str, seg.tolist())).encode()
                out["shard"].append(int(cur))
                out["seq_id"].append(c)
                out["n_tokens"].append(max_len)
                out["n_docs"].append(int(hi - lo))
                out["seq_hash"].append(hashlib.md5(payload).hexdigest())

        for pdf in batches:
            for shard, ids in zip(pdf["shard"], pdf["ids"]):
                if shard != cur:
                    flush()
                    cur, ids_list, starts, total = shard, [], [], 0
                arr = np.asarray(ids, dtype=np.int64)
                starts.append(total)
                ids_list.append(arr)
                total += len(arr)
        flush()
        yield pd.DataFrame(out)

    return arranged.mapInPandas(_pack, schema=PACK_SCHEMA)
