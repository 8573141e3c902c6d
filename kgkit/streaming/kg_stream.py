"""Incremental KG construction — the full batch pipeline as a stream.

The batch path (kgkit/queries.py::_triples_df) is

    pages -> detect_mentions -> link_mentions -> assemble_triples

and every stage is PER-PAGE: a page's mentions, links, and triples
(both ``mentions`` edges and the per-url co-occurrence window) derive
only from its own text plus static dimension tables (the alias
dictionary, the embeddings table, the canonical map).  So a crawl
stream where each landed page appears in exactly one micro-batch — the
file-source contract — needs NO cross-batch state for the triples
themselves: foreachBatch runs the UNCHANGED batch operators on each
micro-batch and the union of per-batch outputs equals the one-shot
batch result row-for-row (pinned by tests/test_kg_stream.py).

What DOES need cross-batch state is the downstream aggregates a live
KG keeps hot: entity mention counts (the batch ``kg_entity_counts``
query) and relation-edge counts (the batch ``kg_relations`` query —
its (subj, pred, obj) occurrence stream is per-page too, so per-batch
partial counts merge exactly, and the NPMI annotation is deferred to
read time as a pure function of the merged integers).  Re-aggregating the whole triples store per trigger is O(store)
— at crawl scale that melts.  Instead each batch contributes a PARTIAL
aggregate part (``groupBy(obj).count()`` over the batch's triples —
bounded by the batch, map-side combined), and ``entity_counts()``
merges partials by summing — commutative, so hub entities cost one
bounded row per part instead of a skewed re-shuffle of raw triples.
Every ``compact_every`` batches the parts fold into one frame via an
EAGER localCheckpoint (the dedup_stream discipline: materialize the
new frame BEFORE releasing the old parts, truncate the union lineage).

Durability / exactly-once: with ``triples_dir`` set, each batch's
triples are written to ``batch=<id>`` parquet in overwrite mode —
foreachBatch is at-least-once, and a replayed batch rewrites the SAME
dir with the SAME rows (the pipeline is deterministic), so the store
is idempotent under replay; ``_SUCCESS`` marks a complete part (the
kgkit.plans.stages discipline).  The in-memory counts parts carry a
replay guard (``_counted_ids``) so a replayed batch never double
counts.  ``resume`` rebuilds the stream state from the durable store
without replaying the source: complete parts name the processed batch
ids, and the counts are re-aggregated from the store in one job (one
scan; a production deployment that cannot afford the scan persists the
compacted counts frame with the manifest protocol of
streaming/dedup_stream.py — same code shape, omitted here because the
store re-aggregate is exact and simpler).

Like dedup_stream, foreachBatch (not a stateful operator) is the right
tool: the per-batch work is a composition of whole DataFrame stages
against broadcast dimension tables, not per-key state that fits the
``applyInPandasWithState`` model, and checkpointLocation gives
exactly-once offset tracking on top.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgkit.operators.canonicalize import canonical_map
from kgkit.operators.linking import link_mentions
from kgkit.operators.mentions import detect_mentions
from kgkit.operators.relations import relation_stream, relations_from_counts
from kgkit.operators.triples import assemble_triples
from kgkit.streaming.dedup_stream import _complete, _union_all


def _part_dirs(triples_dir: str, prefix: str = "batch=") -> List[str]:
    """Complete ``<prefix><id>`` part dirs, sorted by batch id."""
    if not os.path.isdir(triples_dir):
        return []
    names = [
        d
        for d in os.listdir(triples_dir)
        if d.startswith(prefix) and _complete(os.path.join(triples_dir, d))
    ]
    return sorted(names, key=lambda n: int(n.split("=")[1]))


class IncrementalKGStream:
    """Crawl stream -> incremental triples store + live entity counts."""

    def __init__(
        self,
        embeddings: DataFrame,
        canon: Optional[DataFrame] = None,
        triples_dir: Optional[str] = None,
        compact_every: int = 8,
        model: str = "gazetteer",
    ):
        self.embeddings = embeddings
        self.canon = canon
        self.triples_dir = triples_dir
        self.compact_every = compact_every
        self.model = model
        self.count_parts: List[DataFrame] = []
        self.rel_parts: List[DataFrame] = []  # (subj,pred,obj,n) partials
        self._parts_since_compact = 0
        self._counted_ids: set = set()  # replay guard for counts parts
        self._spill: List[DataFrame] = []  # previous batch's scratch frames

    @classmethod
    def resume(
        cls, spark: SparkSession, embeddings: DataFrame, triples_dir: str, **kw
    ) -> "IncrementalKGStream":
        """Rebuild from the durable store without replaying the source:
        complete parts name the processed batches; the live counts are
        re-aggregated from the store (one scan, exact).  Pair with the
        same streaming ``checkpoint_dir`` so the restarted query
        continues from the recorded source offsets."""
        stm = cls(embeddings, triples_dir=triples_dir, **kw)
        names = _part_dirs(triples_dir)
        if not names:
            raise FileNotFoundError(f"no complete triples parts in {triples_dir}")
        stored = spark.read.parquet(
            *[os.path.join(triples_dir, n) for n in names]
        )
        stm.count_parts = [
            stored.groupBy("obj").agg(F.count("*").alias("n")).localCheckpoint()
        ]
        rel_names = [
            n for n in _part_dirs(triples_dir, prefix="relbatch=")
            if int(n.split("=")[1]) in {int(m.split("=")[1]) for m in names}
        ]
        if rel_names:
            stm.rel_parts = [
                spark.read.parquet(
                    *[os.path.join(triples_dir, n) for n in rel_names]
                )
                .groupBy("subj", "pred", "obj")
                .agg(F.sum("n").cast("long").alias("n"))
                .localCheckpoint()
            ]
        stm._counted_ids = {int(n.split("=")[1]) for n in names}
        return stm

    def _canon(self, spark: SparkSession) -> DataFrame:
        if self.canon is None:
            self.canon = canonical_map(spark)  # memoized static map
        return self.canon

    def _release_spill(self) -> None:
        for df in self._spill:
            df.unpersist()
        self._spill = []

    def process_batch(
        self, pages: DataFrame, batch_id: Optional[int] = None
    ) -> DataFrame:
        """One micro-batch of pages(url, text, ...) -> that batch's
        triples (same schema as the batch pipeline's), durably appended
        and folded into the live counts."""
        # the previous batch's triples have been consumed by the sink
        # (foreachBatch contract), so its scratch frames can go now
        self._release_spill()
        mentions = detect_mentions(pages, model=self.model).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        linked = link_mentions(mentions, self.embeddings)
        # persist=False: the mention stream both branches share is the
        # persisted frame above; per micro-batch the duplicated
        # broadcast-join + url exchange is batch-sized and cheaper than
        # leaking assemble_triples' internal cache across triggers
        triples = assemble_triples(
            linked, self._canon(pages.sparkSession), persist=False
        ).persist(StorageLevel.MEMORY_AND_DISK)

        # relation partial counts: relation_stream is per-page (the
        # same property that makes the triples stateless), so each
        # batch's groupBy(subj, pred, obj).count() is a commutative
        # partial whose merged sum equals the batch aggregation; the
        # NPMI annotation is deferred to read time (relations()) —
        # it is a pure function of the merged integers
        rel_part = (
            relation_stream(pages, linked, self._canon(pages.sparkSession))
            .groupBy("subj", "pred", "obj")
            .agg(F.count("*").alias("n"))
        )

        if self.triples_dir is not None and batch_id is not None:
            # overwrite mode: a foreachBatch replay of the same batch_id
            # rewrites the same dir with the same rows — idempotent
            triples.write.mode("overwrite").parquet(
                os.path.join(self.triples_dir, f"batch={batch_id}")
            )
            rel_part.write.mode("overwrite").parquet(
                os.path.join(self.triples_dir, f"relbatch={batch_id}")
            )
        if batch_id is None or batch_id not in self._counted_ids:
            # partial aggregate parts: bounded by the batch, map-side
            # combined, eagerly materialized so they outlive the spill
            self.count_parts.append(
                triples.groupBy("obj")
                .agg(F.count("*").alias("n"))
                .localCheckpoint()
            )
            self.rel_parts.append(rel_part.localCheckpoint())
            if batch_id is not None:
                self._counted_ids.add(batch_id)
            self._parts_since_compact += 1
            if self._parts_since_compact >= self.compact_every:
                self._compact()
        self._spill = [mentions, triples]
        return triples

    def _compact(self) -> None:
        """Fold the partial-count parts into one frame each.
        localCheckpoint is eager: the folded frame is materialized
        before any old part is released, and the union lineage is
        truncated."""
        folded = (
            _union_all(self.count_parts)
            .groupBy("obj")
            .agg(F.sum("n").alias("n"))
            .localCheckpoint()
        )
        # rel_parts can lag count_parts when resuming a pre-relations
        # store (no relbatch= dirs) — fold only what exists
        rel_folded = (
            [
                _union_all(self.rel_parts)
                .groupBy("subj", "pred", "obj")
                .agg(F.sum("n").cast("long").alias("n"))
                .localCheckpoint()
            ]
            if self.rel_parts else []
        )
        for p in self.count_parts + self.rel_parts:
            p.unpersist()
        self.count_parts = [folded]
        self.rel_parts = rel_folded
        self._parts_since_compact = 0

    def entity_counts(self) -> DataFrame:
        """Live (obj, n_triples) over everything processed so far —
        merge of the partial parts, never a re-aggregation of raw
        triples."""
        if not self.count_parts:
            return self.embeddings.sparkSession.createDataFrame(
                [], "obj string, n_triples long"
            )
        return (
            _union_all(self.count_parts)
            .groupBy("obj")
            .agg(F.sum("n").cast("long").alias("n_triples"))
        )

    def relations(self) -> DataFrame:
        """Live NPMI-annotated relation edges over everything processed
        so far — the merged (subj, pred, obj) partial counts fed to the
        batch annotator (relations_from_counts); integer sums commute,
        so this equals extract_relations over the whole corpus
        row-for-row."""
        if not self.rel_parts:
            return self.embeddings.sparkSession.createDataFrame(
                [],
                "subj string, pred string, obj string, rel_type string, "
                "n long, pair_n long, npmi double",
            )
        merged = (
            _union_all(self.rel_parts)
            .groupBy("subj", "pred", "obj")
            .agg(F.sum("n").cast("long").alias("n"))
        )
        return relations_from_counts(merged)

    def triples(self, spark: SparkSession) -> DataFrame:
        """The durable triples store (complete parts only)."""
        if self.triples_dir is None:
            raise ValueError("stream has no triples_dir")
        names = _part_dirs(self.triples_dir)
        if not names:
            return spark.createDataFrame(
                [],
                "subj string, pred string, obj string, url string, "
                "char_start int, char_end int, bucket int",
            )
        return spark.read.parquet(
            *[os.path.join(self.triples_dir, n) for n in names]
        )

    def attach(
        self,
        pages_stream: DataFrame,
        sink: Optional[Callable[[DataFrame, int], None]] = None,
        checkpoint_dir: Optional[str] = None,
        trigger_once: bool = False,
    ):
        """Wire to a streaming pages DataFrame via foreachBatch;
        ``sink(triples_df, batch_id)``, when given, receives each
        batch's triples after the durable append."""

        def _process(batch_df: DataFrame, batch_id: int) -> None:
            out = self.process_batch(batch_df, batch_id=batch_id)
            if sink is not None:
                sink(out, batch_id)

        writer = pages_stream.writeStream.foreachBatch(_process)
        if checkpoint_dir:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
