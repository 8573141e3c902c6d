"""KG-embedding training export: bit-reproducibility, the filtered
guarantee (no negative is a positive), DuckDB differential on the full
tuple set, and coverage of the negative space."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


EDGES = [
    ("Q1", "isa", "Q2", "t", 3, 5, 0.5),
    ("Q1", "uses", "Q3", "t", 2, 4, 0.4),
    ("Q2", "uses", "Q3", "t", 4, 4, 1.0),
    ("Q3", "isa", "Q4", "t", 1, 1, -0.2),
    ("Q4", "uses", "Q1", "t", 2, 2, 0.1),
]
SCHEMA = ("subj string, pred string, obj string, rel_type string, "
          "n long, pair_n long, npmi double")


@pytest.fixture(scope="module")
def rel(spark):
    return spark.createDataFrame(EDGES, SCHEMA)


class TestEmbeddingTuples:
    def test_deterministic_and_filtered(self, spark, rel):
        from kgkit.operators.relations import embedding_tuples

        a = {tuple(r) for r in embedding_tuples(rel, 4).collect()}
        b = {tuple(r) for r in embedding_tuples(rel, 4).collect()}
        assert a == b and a
        positives = {(s, p, o) for s, p, o, *_ in EDGES}
        for s, p, o, neg, j in a:
            assert (s, p, neg) not in positives  # the filtered setting
            assert 0 <= j < 4

    def test_zero_negatives_rejected(self, spark, rel):
        """F.sequence(0, -1) would DESCEND (j in {0, -1}) — reject."""
        from kgkit.operators.relations import embedding_tuples

        with pytest.raises(ValueError, match="n_negatives"):
            embedding_tuples(rel, 0)

    def test_matches_duckdb(self, spark, rel):
        from kgkit.operators.relations import embedding_tuples

        got = sorted(tuple(r) for r in embedding_tuples(rel, 3).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE e (subj TEXT, pred TEXT, obj TEXT)")
        con.executemany(
            "INSERT INTO e VALUES (?,?,?)",
            sorted({(s, p, o) for s, p, o, *_ in EDGES}),
        )
        want = sorted(con.execute("""
            WITH ents AS (
                SELECT e, row_number() OVER (ORDER BY e) - 1 AS eid
                FROM (SELECT subj AS e FROM e UNION SELECT obj FROM e)
            ), cand AS (
                SELECT subj, pred, obj, j,
                       ('0x' || substr(md5(
                            subj || chr(31) || pred || chr(31) || obj
                                 || chr(31) || CAST(j AS VARCHAR)
                        ), 1, 15))::BIGINT % (SELECT count(*) FROM ents)
                           AS neg_eid
                FROM e, unnest([0, 1, 2]) AS t(j)
            )
            SELECT c.subj, c.pred, c.obj, v.e AS neg_obj, c.j
            FROM cand c JOIN ents v ON c.neg_eid = v.eid
            WHERE NOT EXISTS (
                SELECT 1 FROM e
                WHERE e.subj = c.subj AND e.pred = c.pred AND e.obj = v.e
            )
        """).fetchall())
        assert got == want and got

    def test_negative_space_covered(self, spark):
        """With many edges the sampled negatives should touch most of
        the vocabulary — a degenerate constant hash would not."""
        from kgkit.operators.relations import embedding_tuples

        rows = [(f"E{i}", "p", f"E{(i * 7 + 1) % 40}", "t", 1, 1, 0.0)
                for i in range(120)]
        rel = spark.createDataFrame(rows, SCHEMA)
        out = embedding_tuples(rel, 4)
        distinct_negs = out.select("neg_obj").distinct().count()
        vocab = 40 + sum(1 for i in range(120) if f"E{i}" not in
                         {f"E{(j * 7 + 1) % 40}" for j in range(120)})
        assert distinct_negs > 0.5 * vocab

    def test_composes_with_real_relations(self, spark):
        from kgkit.operators.relations import embedding_tuples
        from kgkit.queries import QUERIES

        rel = QUERIES["kg_relations"](spark, "/root/testdata/sf0.001")
        out = embedding_tuples(rel.select("subj", "pred", "obj")
                               .withColumn("rel_type", F.lit("t")), 2)
        assert out.count() > 0
        assert out.columns == ["subj", "pred", "obj", "neg_obj", "j"]
