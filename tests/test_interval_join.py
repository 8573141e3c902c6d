"""Bucketed interval (range) join: brute-force python twin + DuckDB
inequality-join differential across bucket widths, left-enrichment
mode, per-key intervals, and the sessionization composition."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def _synth(n_points=300, n_intervals=60, n_keys=5, seed=17):
    pts, ivs, x = [], [], seed
    for i in range(n_points):
        x = (x * 1103515245 + 12345) % (1 << 31)
        pts.append((i, x % n_keys, x % 50_000))
    for j in range(n_intervals):
        x = (x * 1103515245 + 12345) % (1 << 31)
        s = x % 50_000
        x = (x * 1103515245 + 12345) % (1 << 31)
        ivs.append((100 + j, x % n_keys, s, s + x % 8_000))
    return pts, ivs


def _brute(pts, ivs, keyed):
    out = []
    for pid, pk, pts_ in pts:
        for iid, ik, s, e in ivs:
            if s <= pts_ <= e and (not keyed or pk == ik):
                out.append((pid, iid))
    return sorted(out)


@pytest.fixture(scope="module")
def frames(spark):
    pts, ivs = _synth()
    pdf = spark.createDataFrame(pts, "pid long, k long, ts long")
    idf = spark.createDataFrame(ivs, "iid long, k2 long, start long, end long")
    return pts, ivs, pdf, idf


class TestIntervalJoin:
    @pytest.mark.parametrize("bucket_s", [64, 1024, 1 << 20])
    def test_matches_brute_force(self, spark, frames, bucket_s):
        from kgkit.operators.asof import interval_join

        pts, ivs, pdf, idf = frames
        got = sorted(
            (r["pid"], r["iid"])
            for r in interval_join(
                pdf, idf.drop("k2"), bucket_s=bucket_s
            ).collect()
        )
        assert got == _brute(pts, ivs, keyed=False) and got

    def test_keyed_matches_duckdb(self, spark, frames):
        from kgkit.operators.asof import interval_join

        pts, ivs, pdf, idf = frames
        got = sorted(
            (r["pid"], r["iid"])
            for r in interval_join(
                pdf,
                idf.withColumnRenamed("k2", "k"),
                on="k",
                bucket_s=512,
            ).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE p (pid BIGINT, k BIGINT, ts BIGINT)")
        con.execute(
            "CREATE TABLE i (iid BIGINT, k BIGINT, s BIGINT, e BIGINT)"
        )
        con.executemany("INSERT INTO p VALUES (?,?,?)", pts)
        con.executemany("INSERT INTO i VALUES (?,?,?,?)", ivs)
        want = sorted(con.execute(
            "SELECT pid, iid FROM p JOIN i ON p.k = i.k "
            "AND p.ts BETWEEN i.s AND i.e"
        ).fetchall())
        assert got == want and got

    def test_left_enrichment_keeps_unmatched(self, spark):
        from kgkit.operators.asof import interval_join

        pdf = spark.createDataFrame(
            [(1, 50), (2, 500)], "pid long, ts long"
        )
        idf = spark.createDataFrame(
            [(9, 40, 60)], "iid long, start long, end long"
        )
        got = {r["pid"]: r["iid"]
               for r in interval_join(pdf, idf, how="left",
                                      bucket_s=32).collect()}
        assert got == {1: 9, 2: None}

    def test_left_mode_null_payload_not_duplicated(self, spark):
        """A matched point with a NULL payload column must appear
        exactly once — the unmatched re-attachment anti-join is
        null-safe (regression: non-null-safe equality emitted the
        point both matched and as a spurious unmatched row)."""
        from kgkit.operators.asof import interval_join

        pdf = spark.createDataFrame(
            [(1, None, 50), (2, "x", 500)], "pid long, tag string, ts long"
        )
        idf = spark.createDataFrame(
            [(9, 40, 60)], "iid long, start long, end long"
        )
        rows = interval_join(pdf, idf, how="left", bucket_s=32).collect()
        assert sorted((r["pid"], r["iid"]) for r in rows) == [(1, 9),
                                                              (2, None)]

    def test_degenerate_and_inverted_intervals(self, spark):
        from kgkit.operators.asof import interval_join

        pdf = spark.createDataFrame([(1, 100)], "pid long, ts long")
        idf = spark.createDataFrame(
            [(7, 100, 100), (8, 200, 150)],  # point interval; inverted
            "iid long, start long, end long",
        )
        got = [r["iid"] for r in interval_join(pdf, idf).collect()]
        assert got == [7]

    def test_session_composition(self, spark):
        """The natural composition: sessionize the events table, then
        range-join each error event into the session that contains it
        — verified against DuckDB computing both steps in SQL."""
        from kgkit.operators.asof import interval_join
        from kgkit.queries import QUERIES

        sf = "/root/testdata/sf0.001"
        sessions = QUERIES["user_sessions"](spark, sf).select(
            "user_id", "session_no",
            F.unix_timestamp("session_start").alias("start"),
            F.unix_timestamp("session_end").alias("end"),
        )
        errors = (
            spark.read.parquet(f"{sf}/events.parquet")
            .filter(F.col("event_type") == "error")
            .select("event_id", "user_id", F.unix_timestamp("ts").alias("ts"))
        )
        got = sorted(
            (r["event_id"], r["session_no"])
            for r in interval_join(
                errors, sessions, on="user_id", bucket_s=1800
            ).collect()
        )
        con = duckdb.connect()
        want = sorted(con.execute(f"""
            WITH e AS (
                SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
                FROM '{sf}/events.parquet'
            ), marked AS (
                SELECT user_id, event_id, event_type, ts, ts_s,
                       CASE WHEN ts_s - lag(ts_s) OVER w IS NULL
                                 OR ts_s - lag(ts_s) OVER w > 1800
                            THEN 1 ELSE 0 END AS new_s
                FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), sess AS (
                SELECT *, SUM(new_s) OVER (
                    PARTITION BY user_id ORDER BY ts
                    ROWS UNBOUNDED PRECEDING) AS session_no
                FROM marked
            )
            SELECT event_id, session_no FROM sess
            WHERE event_type = 'error'
        """).fetchall())
        # every error lands in exactly one session (sessions tile the
        # per-user timeline at second granularity)
        assert got == want and got

    def test_plan_no_cartesian(self, spark, frames):
        from kgkit.operators.asof import interval_join

        _, _, pdf, idf = frames
        plan = (
            interval_join(pdf, idf.withColumnRenamed("k2", "k"), on="k")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan, plan


class TestPointKeyAntiJoin:
    def test_point_key_equals_full_row_path(self, spark):
        from kgkit.operators.asof import interval_join

        points = spark.createDataFrame(
            [(1, 100, "a"), (2, 250, None), (3, 999, "c")],
            "pid long, ts long, payload string",
        )
        intervals = spark.createDataFrame(
            [(90, 120, "x"), (200, 300, "y")],
            "start long, end long, label string",
        )
        full = {tuple(r) for r in interval_join(
            points, intervals, how="left").collect()}
        narrow = {tuple(r) for r in interval_join(
            points, intervals, how="left", point_key="pid").collect()}
        assert full == narrow
        assert (3, 999, "c", None, None, None) in narrow

    def test_point_key_must_exist(self, spark):
        import pytest

        from kgkit.operators.asof import interval_join

        points = spark.createDataFrame([(1, 100)], "pid long, ts long")
        intervals = spark.createDataFrame(
            [(90, 120)], "start long, end long")
        with pytest.raises(ValueError, match="point_key"):
            interval_join(points, intervals, how="left", point_key="nope")
