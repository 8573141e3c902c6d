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


class TestHighDimPlanSize:
    """dim-512 fixture: the LSH bucketer must not inline planes*dim
    literals (similarity._dot_plane closed form)."""

    def _emb(self, spark, dim, n=20):
        rows = [
            (i, [(((i * 13 + d * 7) % 19) - 9) / 10.0 for d in range(dim)])
            for i in range(n)
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_buckets_match_literal_formula(self, spark):
        from kgkit.operators.similarity import bucketed, hyperplanes

        dim = 512
        df = self._emb(spark, dim)
        got = {r["vec_id"]: r["bucket"] for r in bucketed(df, 4, dim).collect()}
        hp = hyperplanes(4, dim)
        for r in df.collect():
            want = sum(
                2 ** i
                for i, plane in enumerate(hp)
                if sum(x * p for x, p in zip(r["embedding"], plane)) > 0
            )
            assert got[r["vec_id"]] == want

    def test_plan_size_flat_in_dim(self, spark):
        from kgkit.operators.similarity import bucketed

        p64 = bucketed(self._emb(spark, 64), 4, 64)._jdf.queryExecution() \
            .executedPlan().toString()
        p512 = bucketed(self._emb(spark, 512), 4, 512)._jdf.queryExecution() \
            .executedPlan().toString()
        # round 2's literal arrays made the plan grow ~linearly with dim;
        # the closed form changes only the two dim constants
        assert len(p512) < len(p64) * 1.2, (len(p64), len(p512))


class TestEmbeddingNearDupsCap:
    """max_bucket skew guard on the sign-LSH near-dup join — the
    embedding twin of the MinHash band-bucket cap (dedup._cap_buckets)."""

    def _degenerate(self, spark, n_boiler=40, n_real=4, dim=8):
        """n_boiler identical 'boilerplate' vectors (one mega-bucket)
        plus two planted duplicate pairs in distinct directions."""
        rows = [(i, [1.0] + [0.0] * (dim - 1)) for i in range(n_boiler)]
        for j in range(n_real // 2):
            v = [0.0] * dim
            v[1 + j] = 1.0
            rows.append((1000 + 2 * j, list(v)))
            rows.append((1001 + 2 * j, list(v)))
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_mega_bucket_dropped_real_pairs_kept(self, spark):
        from pyspark.sql import Observation

        from kgkit.operators.similarity import embedding_near_dups

        emb = self._degenerate(spark)
        obs = Observation("emb-cap")
        got = embedding_near_dups(
            emb, threshold=0.999, dim=8, max_bucket=10, observation=obs
        ).collect()
        pairs = {(r["vec_a"], r["vec_b"]) for r in got}
        # boilerplate mega-bucket (40 > cap 10) contributes ZERO pairs…
        assert all(a >= 1000 for a, _ in pairs), pairs
        # …while the planted duplicate pairs below the cap survive
        assert (1000, 1001) in pairs and (1002, 1003) in pairs
        m = obs.get
        assert m["buckets_dropped"] == 1
        assert m["band_rows_dropped"] == 40

    def test_uncapped_mega_bucket_is_quadratic(self, spark):
        """Sanity on the guard's reason to exist: without the cap the
        same corpus yields C(40,2) boilerplate pairs."""
        from kgkit.operators.similarity import embedding_near_dups

        emb = self._degenerate(spark)
        got = embedding_near_dups(
            emb, threshold=0.999, dim=8, max_bucket=10_000
        ).collect()
        boiler = [r for r in got if r["vec_a"] < 1000]
        assert len(boiler) == 40 * 39 // 2
