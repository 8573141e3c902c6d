"""Duplicate-cluster resolution (dedup.dup_clusters): near-dup pairs
-> transitive clusters -> canonical survivor, differential against a
pure-python union-find twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _union_find_twin(pairs):
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _clusters(spark, pairs):
    from kgkit.operators.dedup import dup_clusters

    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return {r["doc_id"]: r["canonical_id"]
            for r in dup_clusters(df).collect()}


class TestDupClusters:
    def test_chain_collapses_transitively(self, spark):
        # A~B, B~C but never A~C: a greedy pairwise drop would keep
        # both chain ends; the closure must yield one canonical
        got = _clusters(spark, [(1, 2), (2, 3), (3, 4)])
        assert got == {1: 1, 2: 1, 3: 1, 4: 1}

    def test_disjoint_clusters_and_ordering(self, spark):
        got = _clusters(spark, [(10, 2), (7, 8), (8, 9), (20, 21)])
        assert got == {2: 2, 10: 2, 7: 7, 8: 7, 9: 7, 20: 20, 21: 20}

    def test_matches_union_find_on_minhash_pairs(self, spark):
        from kgkit.operators.dedup import dup_clusters, minhash_near_dups
        from kgkit.queries import _planted_docs

        pairs_df = minhash_near_dups(
            _planted_docs(spark, "/root/testdata/sf0.001")
        )
        pairs = [(r["doc_a"], r["doc_b"]) for r in pairs_df.collect()]
        assert pairs, "planted corpus must produce near-dup pairs"
        got = _clusters(spark, pairs)
        assert got == _union_find_twin(pairs)

    def test_keep_filter_semantics(self, spark):
        """The documented caller contract: survivors = canonical rows
        plus docs absent from the cluster frame."""
        docs = spark.createDataFrame(
            [(i,) for i in range(8)], "doc_id long"
        )
        clusters = spark.createDataFrame(
            [(1, 1), (3, 1), (5, 5), (6, 5)],
            "doc_id long, canonical_id long",
        )
        kept = (
            docs.join(clusters, "doc_id", "left")
            .filter(
                F.col("canonical_id").isNull()
                | (F.col("doc_id") == F.col("canonical_id"))
            )
        )
        assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1, 2, 4, 5, 7]
