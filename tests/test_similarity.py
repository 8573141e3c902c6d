"""ANN operators — k-means IVF invariants on crafted clustered data."""

from __future__ import annotations

import numpy as np
import pytest

from kgkit.operators.similarity import ivf_kmeans_topk, kmeans_centroids


def _clustered(spark, n_per=6, dim=4):
    """Two tight clusters on orthogonal axes + deterministic jitter."""
    rows = []
    for i in range(n_per):
        a = [1.0, 0.02 * i, 0.01, 0.0]
        b = [0.01, 0.0, 1.0, 0.03 * i]
        rows.append((i, [float(x) for x in a]))
        rows.append((100 + i, [float(x) for x in b]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _brute_topk(corpus_rows, query_rows, k):
    out = {}
    for qid, qe in query_rows:
        q = np.array(qe, dtype=np.float64)
        scored = []
        for nid, ce in corpus_rows:
            c = np.array(ce, dtype=np.float64)
            cos = round(float(q @ c / (np.linalg.norm(q) * np.linalg.norm(c))), 6)
            scored.append((-cos, nid))
        out[qid] = [nid for _, nid in sorted(scored)[:k]]
    return out


class TestKmeansIvf:
    def test_probe_all_cells_equals_brute_force(self, spark):
        """n_probe == n_cells probes everything -> IVF must return the
        exact brute-force top-k whatever the centroids converged to."""
        emb = _clustered(spark)
        queries = emb.filter("vec_id in (0, 100)").selectExpr(
            "vec_id as query_id", "embedding")
        corpus = emb.filter("vec_id not in (0, 100)").selectExpr(
            "vec_id as neighbor_id", "embedding")
        got = ivf_kmeans_topk(queries, corpus, k=3, n_cells=2, n_probe=2,
                              iters=2).collect()
        by_q = {}
        for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
            by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
        expected = _brute_topk(
            [(r["neighbor_id"], r["embedding"]) for r in corpus.collect()],
            [(r["query_id"], r["embedding"]) for r in queries.collect()], 3)
        assert by_q == expected

    def test_lloyd_separates_clusters_from_same_cluster_seeds(self, spark):
        """Seeds are the two lowest ids — BOTH in cluster A.  After two
        Lloyd iterations the centroids must straddle the clusters (one
        mostly-A, one mostly-B direction): the refinement the seed-only
        quantizer cannot do."""
        emb = _clustered(spark).selectExpr("vec_id as neighbor_id", "embedding")
        cents = kmeans_centroids(emb, n_cells=2, iters=2).collect()
        assert len(cents) == 2
        dirs = set()
        for r in cents:
            v = np.array([float(x) for x in r["cv"]])
            dirs.add(int(np.argmax(np.abs(v))))  # dominant axis
        assert dirs == {0, 2}  # one centroid per cluster axis

    def test_centroid_shape_and_determinism(self, spark):
        emb = _clustered(spark).selectExpr("vec_id as neighbor_id", "embedding")
        c1 = {r["cell"]: list(r["cv"]) for r in
              kmeans_centroids(emb, n_cells=2, iters=2).collect()}
        c2 = {r["cell"]: list(r["cv"]) for r in
              kmeans_centroids(emb, n_cells=2, iters=2).collect()}
        assert c1 == c2  # integer sums: bit-identical across runs
        assert all(len(v) == 4 for v in c1.values())
