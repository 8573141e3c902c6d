"""BGP matcher: DuckDB self-join differential over synthetic graphs
(independent engine AND independent compilation — bgp_to_sql does no
join reordering), join-order heuristic, FILTER/select/distinct, and a
composition over the real stage-3 triples table."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F


def _graph(n=400, seed=7):
    """Deterministic LCG triple soup: dense enough for multi-hop
    matches, with repeated (s, p, o) rows so BAG semantics differ
    from set semantics."""
    ents = [f"e{i}" for i in range(24)]
    preds = ["knows", "cites", "typed"]
    rows, x = [], seed
    for _ in range(n):
        x = (x * 1103515245 + 12345) % (1 << 31)
        s = ents[x % len(ents)]
        x = (x * 1103515245 + 12345) % (1 << 31)
        p = preds[x % len(preds)]
        x = (x * 1103515245 + 12345) % (1 << 31)
        rows.append((s, p, ents[x % len(ents)]))
    rows += rows[:25]  # duplicates: bag-semantics coverage
    rows += [  # planted: every BGP shape below is guaranteed non-empty
        ("e5", "knows", "e5"),                                  # self-loop
        ("e6", "knows", "e7"), ("e7", "knows", "e8"),
        ("e8", "knows", "e6"),                                  # triangle
        ("e3", "knows", "e4"), ("e4", "cites", "e5"),           # chain
        ("e1", "cites", "e2"),                                  # e1 subject
        ("e9", "typed", "e2"), ("e10", "typed", "e4"),          # disconnected
        ("e11", "knows", "e3"), ("e11", "cites", "e12"),        # anchor+fan
        ("e6", "knows", "e7"),  # duplicate support for the constant BGP
    ]
    return rows


BGPS = [
    # one pattern, constant pred
    [("?a", "knows", "?b")],
    # 2-hop chain
    [("?a", "knows", "?b"), ("?b", "cites", "?c")],
    # star: two patterns share the subject
    [("?d", "knows", "?x"), ("?d", "typed", "?t")],
    # triangle (cyclic — the join closes back on ?a)
    [("?a", "knows", "?b"), ("?b", "knows", "?c"), ("?c", "knows", "?a")],
    # constant object anchor + fan-out
    [("?d", "knows", "e3"), ("?d", "cites", "?y")],
    # repeated variable WITHIN a pattern: self-loops
    [("?a", "knows", "?a")],
    # variable predicate
    [("e1", "?p", "?o")],
    # disconnected components (genuine cartesian per SPARQL)
    [("?a", "typed", "e2"), ("?b", "typed", "e4")],
    # fully-constant pattern: contributes its support MULTIPLICITY
    # (the e6-knows-e7 triple is planted twice) under bag semantics
    [("e6", "knows", "e7"), ("?a", "typed", "e2")],
    # join on a PREDICATE variable across patterns
    [("?a", "?p", "?b"), ("?c", "?p", "?d")],
    # chain sharing both the node and the predicate variable
    [("?a", "?p", "?b"), ("?b", "?p", "?c")],
    # repeated variable within a pattern, then joined out
    [("?x", "?p", "?x"), ("?x", "typed", "?t")],
]


@pytest.fixture(scope="module")
def graph(spark):
    rows = _graph()
    sdf = spark.createDataFrame(rows, "subj string, pred string, obj string")
    con = duckdb.connect()
    con.execute("CREATE TABLE triples (subj text, pred text, obj text)")
    con.executemany("INSERT INTO triples VALUES (?, ?, ?)", rows)
    return sdf, con


class TestBGPDifferential:
    @pytest.mark.parametrize("i", range(len(BGPS)))
    def test_matches_duckdb(self, spark, graph, i):
        from kgkit.operators.bgp import bgp_to_sql, is_var, match_patterns

        sdf, con = graph
        # the two compilers bind columns in different orders — compare
        # under an explicit shared projection
        vs = sorted({t[1:] for p in BGPS[i] for t in p if is_var(t)})
        got = Counter(
            tuple(r)
            for r in match_patterns(sdf, BGPS[i], select=vs).collect()
        )
        want = Counter(
            tuple(r)
            for r in con.execute(bgp_to_sql(BGPS[i], select=vs)).fetchall()
        )
        assert got == want and sum(want.values()) > 0

    def test_distinct_and_select(self, spark, graph):
        from kgkit.operators.bgp import bgp_to_sql, match_patterns

        sdf, con = graph
        bgp = [("?a", "knows", "?b"), ("?b", "cites", "?c")]
        got = {
            tuple(r)
            for r in match_patterns(
                sdf, bgp, select=["a", "c"], distinct=True
            ).collect()
        }
        want = {
            tuple(r)
            for r in con.execute(
                bgp_to_sql(bgp, select=["a", "c"], distinct=True)
            ).fetchall()
        }
        assert got == want and got

    def test_filter(self, spark, graph):
        from kgkit.operators.bgp import bgp_to_sql, match_patterns

        sdf, con = graph
        bgp = [("?d", "knows", "?x"), ("?d", "knows", "?y")]
        vs = ["d", "x", "y"]
        got = Counter(
            tuple(r)
            for r in match_patterns(
                sdf, bgp, select=vs, where=F.col("x") < F.col("y")
            ).collect()
        )
        want = Counter(
            tuple(r)
            for r in con.execute(
                bgp_to_sql(bgp, select=vs, where="x < y")
            ).fetchall()
        )
        assert got == want and sum(want.values()) > 0


class TestCompilation:
    def test_join_order_starts_most_constant(self):
        from kgkit.operators.bgp import _order

        bgp = [("?a", "knows", "?b"), ("?b", "cites", "e1"),
               ("?a", "typed", "?t")]
        ordered = _order(bgp)
        assert ordered[0] == ("?b", "cites", "e1")
        # second pattern must connect through ?b, not jump to ?a
        assert ordered[1] == ("?a", "knows", "?b")

    def test_unbound_select_raises(self, spark, graph):
        from kgkit.operators.bgp import match_patterns

        sdf, _ = graph
        with pytest.raises(ValueError, match="unbound"):
            match_patterns(sdf, [("?a", "knows", "?b")], select=["zz"])

    def test_empty_patterns_raise(self, spark, graph):
        from kgkit.operators.bgp import match_patterns

        sdf, _ = graph
        with pytest.raises(ValueError):
            match_patterns(sdf, [])

    def test_connected_bgp_plan_has_no_cartesian(self, spark, graph):
        from kgkit.operators.bgp import match_patterns

        sdf, _ = graph
        plan = (
            match_patterns(
                sdf,
                [("?a", "knows", "?b"), ("?b", "knows", "?c"),
                 ("?c", "cites", "?d")],
            )
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan, plan


class TestOverRealTriples:
    def test_comention_pairs_on_stage3_output(self, spark):
        """Co-mention query over the real pipeline's triples: docs
        mentioning Q1, paired with every other entity they mention —
        cross-checked against a pandas recomputation from the same
        materialized table (the fan-out discipline: the UDF lineage is
        cut once, then scanned per pattern)."""
        from kgkit.operators.bgp import match_patterns
        from kgkit.queries import QUERIES

        t = (
            QUERIES["kg_triples"](spark, "/root/testdata/sf0.001")
            .select("subj", "pred", "obj")
            .localCheckpoint()
        )
        got = {
            tuple(r)
            for r in match_patterns(
                t,
                [("?d", "mentions", "Q1"), ("?d", "mentions", "?x")],
                where=F.col("x") != "Q1",
                distinct=True,
            ).collect()
        }
        rows = [(r["subj"], r["obj"]) for r in
                t.filter(F.col("pred") == "mentions").collect()]
        docs_q1 = {d for d, o in rows if o == "Q1"}
        want = {(d, o) for d, o in rows if d in docs_q1 and o != "Q1"}
        assert got == want and got


class TestReservedPrefix:
    def test_const_prefixed_variable_rejected(self, spark):
        import pytest

        from kgkit.operators.bgp import match_patterns

        triples = spark.createDataFrame(
            [("a", "p", "b")], "subj string, pred string, obj string")
        with pytest.raises(ValueError, match="_const"):
            match_patterns(triples, [("?_const0", "p", "?o")])
