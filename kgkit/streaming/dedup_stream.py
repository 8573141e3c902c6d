"""Streaming near-duplicate detection — the recrawl dedup as a stream.

``incremental_near_dups`` (kgkit/operators/dedup.py) is the batch
recrawl shape: new-snapshot bands probe a static corpus band index.
A live crawl delivers snapshots as micro-batches, so this module wraps
the same operators in Structured Streaming's ``foreachBatch``:

  * the CORPUS index (shingles + band table) is computed ONCE and
    cached — exactly the "indexed when first deduped" state a
    production pipeline keeps as a bucketed table;
  * each micro-batch computes shingles/minhash/bands for ITS documents
    only and equi-joins the index.  Per-trigger COMPUTE is O(batch):
    the index side is a union of already-materialized frames, never
    re-derived from source text;
  * with ``grow_index=True`` each processed batch's shingle and band
    frames are APPENDED to the index as materialized parts (bands are
    per-document, so band(union) == union(bands) — nothing about the
    old index is recomputed).  Every ``compact_every`` batches the
    parts are compacted into one frame via an EAGER localCheckpoint,
    which (a) bounds the union plan depth and (b) guarantees the new
    frame is materialized BEFORE the old parts are released — a lazy
    persist-then-unpersist swap would silently rebuild the whole
    lineage from source on the next trigger.

The MinHash ``max_bucket`` skew cap is global over the index, so it is
applied at PROBE time: the index union is first pruned to the buckets
the batch actually touches (a broadcast of the batch's few band keys),
and bucket sizes are counted within that slice — identical counts to a
full-table cap (an equi-key prune keeps whole buckets), at O(touched
buckets) cost instead of O(index) per trigger.

foreachBatch (not a stateful operator) is the right tool here: the
join is against a large SELF-MANAGED index, not per-key state that
fits the applyInPandasWithState model, and it gives exactly-once per
micro-batch with checkpointLocation like any other sink.  Failure
note: localCheckpoint storage is executor-local, so a crashed session
rebuilds the index by replaying the stream from the checkpoint — the
index is derived state, never the system of record.
"""

from __future__ import annotations

from typing import Callable, List, Optional

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgkit.operators.dedup import (
    _cap_buckets,
    lsh_band_table,
    minhash_signature,
    verify_jaccard,
    with_shingles,
)


def _union_all(parts: List[DataFrame]) -> DataFrame:
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


class IncrementalDedupStream:
    """Recrawl dedup state + per-micro-batch processing."""

    def __init__(
        self,
        corpus: DataFrame,
        k: int = 8,
        bands: int = 4,
        rows: int = 2,
        threshold: float = 0.5,
        max_bucket: int = 1000,
        grow_index: bool = False,
        compact_every: int = 8,
    ):
        self.k, self.bands, self.rows = k, bands, rows
        self.threshold = threshold
        self.max_bucket = max_bucket
        self.grow_index = grow_index
        self.compact_every = compact_every
        sh_c = with_shingles(corpus).persist(StorageLevel.MEMORY_AND_DISK)
        bt_c = self._bands_of(sh_c).persist(StorageLevel.MEMORY_AND_DISK)
        # index = lists of materialized frames; entry 0 is the corpus
        self.sh_parts: List[DataFrame] = [sh_c]
        self.bt_parts: List[DataFrame] = [bt_c]
        self._batches_since_compact = 0
        self._spill: List[DataFrame] = []  # previous batch's scratch frames

    def _bands_of(self, shingled: DataFrame) -> DataFrame:
        """UNCAPPED band table — the max_bucket cap is applied at probe
        time (see module docstring: the cap is global over the grown
        index, so it cannot be baked into per-part tables)."""
        return lsh_band_table(
            minhash_signature(shingled, self.k), self.bands, self.rows
        )

    def _release_spill(self) -> None:
        for df in self._spill:
            df.unpersist()
        self._spill = []

    def process_batch(self, batch: DataFrame) -> DataFrame:
        """(corpus_doc_id, new_doc_id, jaccard) for one micro-batch of
        (doc_id, text) rows against the current index."""
        # the previous batch's pairs have been consumed by the sink
        # (foreachBatch contract), so its scratch frames can go now
        self._release_spill()
        sh_b = with_shingles(batch).persist(StorageLevel.MEMORY_AND_DISK)
        bt_b = self._bands_of(sh_b).persist(StorageLevel.MEMORY_AND_DISK)

        # prune the index union to the buckets this batch touches, then
        # count bucket sizes within the slice (equi-key prune keeps
        # whole buckets, so the counts equal a full-table cap's)
        probe_keys = bt_b.select("band_idx", "band_hash").distinct()
        relevant = _union_all(self.bt_parts).join(
            F.broadcast(probe_keys), ["band_idx", "band_hash"]
        )
        capped = _cap_buckets(relevant, self.max_bucket)

        cand = (
            capped.select(
                F.col("doc_id").alias("doc_a"), "band_idx", "band_hash"
            )
            .join(
                bt_b.select(
                    F.col("doc_id").alias("doc_b"), "band_idx", "band_hash"
                ),
                ["band_idx", "band_hash"],
            )
            .select("doc_a", "doc_b")
            .distinct()
        )
        pairs = verify_jaccard(
            cand, _union_all(self.sh_parts), self.threshold, shingled_b=sh_b
        ).select(
            F.col("doc_a").alias("corpus_doc_id"),
            F.col("doc_b").alias("new_doc_id"),
            "jaccard",
        )
        if self.grow_index:
            # materialize this batch's result NOW (eager localCheckpoint)
            # so it no longer references sh_b/bt_b lineage, then append
            # the batch frames to the index as new parts — nothing is
            # unpersisted here, so there is no lazy-swap window
            pairs = pairs.localCheckpoint()
            self.sh_parts.append(sh_b)
            self.bt_parts.append(bt_b)
            self._batches_since_compact += 1
            if self._batches_since_compact >= self.compact_every:
                self._compact()
        else:
            self._spill = [sh_b, bt_b]
        return pairs

    def _compact(self) -> None:
        """Fold the index parts into one frame each.  localCheckpoint is
        EAGER: the compacted frames are fully materialized before any
        old part is released, and the union lineage is truncated — the
        two properties a lazy persist/unpersist swap lacks."""
        new_sh = _union_all(self.sh_parts).localCheckpoint()
        new_bt = _union_all(self.bt_parts).localCheckpoint()
        for df in self.sh_parts + self.bt_parts:
            df.unpersist()
        self.sh_parts = [new_sh]
        self.bt_parts = [new_bt]
        self._batches_since_compact = 0

    def attach(
        self,
        pages_stream: DataFrame,
        sink: Callable[[DataFrame, int], None],
        checkpoint_dir: Optional[str] = None,
        trigger_once: bool = False,
    ):
        """Wire to a streaming (doc_id, text) DataFrame via foreachBatch;
        ``sink(pairs_df, batch_id)`` receives each batch's pairs."""

        def _process(batch_df: DataFrame, batch_id: int) -> None:
            sink(self.process_batch(batch_df), batch_id)

        writer = pages_stream.writeStream.foreachBatch(_process)
        if checkpoint_dir:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
