"""Benchmark decontamination: planted contamination recovered exactly,
clean docs untouched, DuckDB differential on the report, min_hits
threshold, and the broadcast-only plan pin."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
N = 5  # small n so the driver corpus's short docs can contaminate


@pytest.fixture(scope="module")
def fixture(spark):
    """Corpus = documents table; benchmark = verbatim excerpts of two
    corpus docs plus one novel eval item nobody trained on."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    victims = [r["text"] for r in
               docs.filter(F.col("doc_id").isin([3, 17])).collect()]
    bench_rows = [
        # an excerpt long enough to share >= one 5-gram with doc 3/17
        (900, " ".join(victims[0].split()[:12])),
        (901, " ".join(victims[1].split()[5:20])),
        (902, "zq yx wv ut sr qp on ml"),  # novel: overlaps nothing
    ]
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    return docs, bench, bench_rows


class TestDecontaminate:
    def test_planted_contamination_dropped_clean_kept(self, spark, fixture):
        from kgkit.operators.dedup import decontaminate

        docs, bench, _ = fixture
        clean, report = decontaminate(docs, bench, n=N)
        dropped = {r["doc_id"] for r in report.collect()}
        assert {3, 17} <= dropped
        kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
        assert kept == {r["doc_id"] for r in docs.collect()} - dropped
        assert 3 not in kept and 17 not in kept
        # auditability: every dropped doc carries a real offending
        # n-gram that appears verbatim in its text
        texts = {r["doc_id"]: r["text"] for r in docs.collect()}
        for r in report.collect():
            assert r["example"] in texts[r["doc_id"]]

    def test_report_matches_duckdb(self, spark, fixture):
        from kgkit.operators.dedup import decontaminate

        docs, bench, bench_rows = fixture
        _, report = decontaminate(docs, bench, n=N)
        got = sorted((r["doc_id"], r["n_hits"], r["example"])
                     for r in report.collect())
        con = duckdb.connect()
        con.execute(
            f"CREATE TABLE docs AS SELECT doc_id, text "
            f"FROM '{SF}/documents.parquet'"
        )
        con.execute("CREATE TABLE bench (doc_id BIGINT, text TEXT)")
        con.executemany("INSERT INTO bench VALUES (?, ?)", bench_rows)
        want = sorted(con.execute(f"""
            WITH csh AS (
                SELECT DISTINCT doc_id, unnest(list_transform(
                    range(1, len(string_split(text, ' ')) - {N} + 2),
                    i -> array_to_string(
                        (string_split(text, ' '))[i:i+{N}-1], ' ')
                )) AS sh
                FROM docs
                WHERE len(string_split(text, ' ')) >= {N}
            ), bsh AS (
                SELECT DISTINCT unnest(list_transform(
                    range(1, len(string_split(text, ' ')) - {N} + 2),
                    i -> array_to_string(
                        (string_split(text, ' '))[i:i+{N}-1], ' ')
                )) AS sh
                FROM bench
                WHERE len(string_split(text, ' ')) >= {N}
            )
            SELECT c.doc_id, count(*) AS n_hits, min(c.sh) AS example
            FROM csh c JOIN bsh b USING (sh)
            GROUP BY c.doc_id
        """).fetchall())
        assert got == want and got

    def test_min_hits_threshold(self, spark, fixture):
        from kgkit.operators.dedup import decontaminate

        docs, bench, _ = fixture
        _, loose = decontaminate(docs, bench, n=N, min_hits=1)
        _, strict = decontaminate(docs, bench, n=N, min_hits=10**6)
        assert strict.count() == 0 and loose.count() > 0

    def test_clean_corpus_composition(self, spark, fixture):
        """Stage 6 of clean_corpus: decontamination runs LAST (on the
        text that ships), accounting stays conserved, and the planted
        victims vanish from the cleaned output."""
        from kgkit.operators.corpus_clean import clean_corpus

        docs, bench, _ = fixture
        cleaned, stats = clean_corpus(
            docs, url_col=None, benchmarks=bench, decontaminate_n=N
        )
        dropped = sum(v for k, v in stats.items() if k.startswith("dropped"))
        assert stats["input"] == stats["after_decontamination"] + dropped
        assert stats["dropped_contaminated"] >= 1
        kept = {r["doc_id"] for r in cleaned.select("doc_id").collect()}
        assert 3 not in kept and 17 not in kept
        # auditability rides along: sample rows of (doc_id, n_hits,
        # offending n-gram) for the dropped docs
        ex = stats["contamination_examples"]
        assert ex and all(len(row) == 3 and row[1] >= 1 for row in ex)
        texts = {r["doc_id"]: r["text"] for r in docs.collect()}
        assert all(row[2] in texts[row[0]] for row in ex)

    def test_plan_is_broadcast_only(self, spark, fixture):
        """The corpus n-gram stream must never shuffle: the benchmark
        shingle set broadcasts and the only wide op is the doc_id
        aggregation of hits (already tiny)."""
        from kgkit.operators.dedup import decontaminate

        docs, bench, _ = fixture
        _, report = decontaminate(docs, bench, n=N)
        plan = report._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
