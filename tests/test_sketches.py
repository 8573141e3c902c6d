"""KMV sketches: python-twin + DuckDB per-key differentials (bit
identity, not tolerance), the lossless-merge property, exact-below-k,
estimator accuracy at 1/sqrt(k), and the salted-window plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def _docs(spark, n=3000, n_hosts=7):
    rows = [(i % n_hosts, f"https://h{i % n_hosts}.example.com/p/{i * 13 % 997}")
            for i in range(n)]
    return spark.createDataFrame(rows, "host long, url string"), rows


K = 64


class TestKMV:
    def test_sketch_matches_python_twin(self, spark):
        from kgkit.operators.sketches import kmv_hash_py, kmv_sketch

        df, rows = _docs(spark)
        got = {r["host"]: r["sketch"]
               for r in kmv_sketch(df, ["host"], "url", k=K).collect()}
        want = {}
        for h in range(7):
            hashes = sorted({kmv_hash_py(u) for hh, u in rows if hh == h})
            want[h] = hashes[:K]
        assert got == want

    def test_sketch_matches_duckdb_bit_identical(self, spark):
        from kgkit.operators.sketches import kmv_sketch

        df, rows = _docs(spark)
        got = {r["host"]: r["sketch"]
               for r in kmv_sketch(df, ["host"], "url", k=K).collect()}
        con = duckdb.connect()
        con.execute("CREATE TABLE d (host BIGINT, url TEXT)")
        con.executemany("INSERT INTO d VALUES (?, ?)", rows)
        want = dict(con.execute(f"""
            WITH h AS (
                SELECT DISTINCT host,
                       ('0x' || substr(md5(url), 1, 15))::BIGINT AS hv
                FROM d
            )
            SELECT host, (list(hv ORDER BY hv))[1:{K}] FROM h GROUP BY host
        """).fetchall())
        assert got == want

    def test_merge_is_lossless(self, spark):
        """sketch(A ∪ B) == merge(sketch(A), sketch(B)) — the KMV
        property that makes partial sketches (per batch, per source)
        exact to combine."""
        from kgkit.operators.sketches import kmv_merge, kmv_sketch

        df, _ = _docs(spark)
        a = df.filter("url like '%1%'")
        b = df.filter("url not like '%1%'")
        whole = {r["host"]: r["sketch"]
                 for r in kmv_sketch(df, ["host"], "url", k=K).collect()}
        parts = kmv_sketch(a, ["host"], "url", k=K).unionByName(
            kmv_sketch(b, ["host"], "url", k=K)
        )
        merged = {r["host"]: r["sketch"]
                  for r in kmv_merge(parts, ["host"], k=K).collect()}
        assert merged == whole

    def test_exact_below_k_and_accuracy_above(self, spark):
        from kgkit.operators.sketches import distinct_estimate

        # host 0: 30 distinct urls (< k=64 -> exact); host 1: 5000
        rows = [(0, f"u{i}") for i in range(30)] * 3
        rows += [(1, f"v{i}") for i in range(5000)]
        df = spark.createDataFrame(rows, "host long, url string")
        got = {r["host"]: r["est_distinct"]
               for r in distinct_estimate(df, ["host"], "url", k=K).collect()}
        assert got[0] == 30.0
        assert abs(got[1] - 5000) / 5000 < 3 / (K ** 0.5)  # ~3 sigma

    def test_estimate_matches_python_twin(self, spark):
        from kgkit.operators.sketches import (
            distinct_estimate,
            kmv_estimate_py,
            kmv_hash_py,
        )

        df, rows = _docs(spark)
        got = {r["host"]: r["est_distinct"]
               for r in distinct_estimate(df, ["host"], "url", k=K).collect()}
        for h in range(7):
            twin = kmv_estimate_py(
                [kmv_hash_py(u) for hh, u in rows if hh == h], k=K
            )
            assert got[h] == round(twin, 4)

    def test_null_values_are_ignored(self, spark):
        """md5(NULL) ranks nulls-first in the window then vanishes in
        collect_list — without the filter, one NULL would ship a k-1
        sketch and collapse the estimate to ~k (regression)."""
        from kgkit.operators.sketches import distinct_estimate, kmv_sketch

        rows = [(0, f"v{i}") for i in range(500)] + [(0, None)]
        df = spark.createDataFrame(rows, "host long, url string")
        [sk] = kmv_sketch(df, ["host"], "url", k=K).collect()
        assert len(sk["sketch"]) == K and None not in sk["sketch"]
        [est] = distinct_estimate(df, ["host"], "url", k=K).collect()
        assert abs(est["est_distinct"] - 500) / 500 < 3 / (K ** 0.5)

    def test_plan_windows_are_salted_then_keyed(self, spark):
        """The first rank must partition by (key, salt) — a plain
        per-key window would serialize a hub key's entire distinct
        stream through one task."""
        from kgkit.operators.sketches import kmv_sketch

        df, _ = _docs(spark)
        plan = (
            kmv_sketch(df, ["host"], "url", k=K, n_salts=16)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the first rank exchanges on (key, salt) — the salt is the
        # pre-projected pmod column (_w0) in the window spec
        assert "hashpartitioning(host" in plan
        salted = [l for l in plan.splitlines()
                  if "WindowGroupLimit [host" in l and "_w0" in l]
        # Spark rewrites row_number()<=k into partial+final top-k
        # (WindowGroupLimit): the hub key's candidates shrink to k per
        # MAP TASK before the salted exchange — even stronger than the
        # designed salting
        assert any("Partial" in l for l in salted), plan
        assert "CartesianProduct" not in plan
