"""Streaming near-duplicate detection — the recrawl dedup as a stream.

``incremental_near_dups`` (kgkit/operators/dedup.py) is the batch
recrawl shape: new-snapshot bands probe a static corpus band index.
A live crawl delivers snapshots as micro-batches, so this module wraps
the same operators in Structured Streaming's ``foreachBatch``:

  * the CORPUS index (shingles + capped band table) is computed ONCE
    and persisted — exactly the "indexed when first deduped" state a
    production pipeline keeps as a bucketed table;
  * each micro-batch computes bands for ITS documents only and
    equi-joins the index (O(batch) work per trigger);
  * with ``grow_index=True`` each processed batch's shingles/bands are
    unioned into the index, so later batches also dedup against
    earlier stream content — streaming state as persisted DataFrames,
    swapped atomically per batch (the previous persist is released).

foreachBatch (not a stateful operator) is the right tool here: the
join is against a large SELF-MANAGED index, not per-key state that
fits the applyInPandasWithState model, and it gives exactly-once per
micro-batch with checkpointLocation like any other sink.
"""

from __future__ import annotations

from typing import Callable, Optional

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
    ):
        self.k, self.bands, self.rows = k, bands, rows
        self.threshold = threshold
        self.max_bucket = max_bucket
        self.grow_index = grow_index
        self.sh_c = with_shingles(corpus).persist(StorageLevel.MEMORY_AND_DISK)
        self.bt_c = self._bands_of(self.sh_c).persist(
            StorageLevel.MEMORY_AND_DISK
        )

    def _bands_of(self, shingled: DataFrame) -> DataFrame:
        return _cap_buckets(
            lsh_band_table(
                minhash_signature(shingled, self.k), self.bands, self.rows
            ),
            self.max_bucket,
        )

    def process_batch(self, batch: DataFrame) -> DataFrame:
        """(corpus_doc_id, new_doc_id, jaccard) for one micro-batch of
        (doc_id, text) rows against the current index."""
        sh_b = with_shingles(batch).persist(StorageLevel.MEMORY_AND_DISK)
        bt_b = lsh_band_table(
            minhash_signature(sh_b, self.k), self.bands, self.rows
        )
        cand = (
            self.bt_c.select(
                self.bt_c["doc_id"].alias("doc_a"), "band_idx", "band_hash"
            )
            .join(
                bt_b.select(
                    bt_b["doc_id"].alias("doc_b"), "band_idx", "band_hash"
                ),
                ["band_idx", "band_hash"],
            )
            .select("doc_a", "doc_b")
            .distinct()
        )
        pairs = verify_jaccard(
            cand, self.sh_c, self.threshold, shingled_b=sh_b
        ).select(
            "doc_a", "doc_b", "jaccard",
        ).select(
            F.col("doc_a").alias("corpus_doc_id"),
            F.col("doc_b").alias("new_doc_id"),
            "jaccard",
        )
        if self.grow_index:
            # swap in the grown index; materialize the new persists
            # BEFORE releasing the old ones (the result `pairs` above
            # still reads the pre-swap frames lazily, so the caller
            # must consume it before the next batch — foreachBatch does)
            new_sh = self.sh_c.unionByName(sh_b).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            new_bt = self._bands_of(new_sh).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            pairs = pairs.localCheckpoint()  # cut lineage to old frames
            self.sh_c.unpersist()
            self.bt_c.unpersist()
            sh_b.unpersist()
            self.sh_c, self.bt_c = new_sh, new_bt
        return pairs

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

