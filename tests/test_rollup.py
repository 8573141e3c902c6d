"""time_rollup: per-level DuckDB differential over the events table,
pyramid==direct equality (re-aggregation is lossless), keyed rollup,
nesting validation, and the single-raw-scan property."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
LEVELS = (60, 3600, 86_400)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def _spark_rows(df):
    return sorted(
        tuple(round(x, 6) if isinstance(x, float) else x for x in r)
        for r in df.collect()
    )


class TestTimeRollup:
    def test_each_level_matches_duckdb(self, spark, events):
        from kgkit.operators.rollup import time_rollup

        got = _spark_rows(
            time_rollup(events, levels=LEVELS).select(
                "level_s", "bucket_s",
                F.round("sum_value", 6).alias("s"),
                "count_value", "min_value", "max_value",
            )
        )
        con = duckdb.connect()
        want = []
        for w in LEVELS:
            want += con.execute(f"""
                SELECT {w} AS level_s,
                       CAST(floor(floor(epoch(ts)) / {w}) * {w} AS BIGINT)
                           AS bucket_s,
                       round(sum(value), 6) AS s,
                       count(*) AS c, min(value) AS mn, max(value) AS mx
                FROM '{SF}/events.parquet' GROUP BY 2
            """).fetchall()
        assert got == sorted(
            tuple(round(x, 6) if isinstance(x, float) else x for x in r)
            for r in want
        ) and got

    def test_pyramid_equals_direct_per_level(self, spark, events):
        """Coarse levels derived from partials == aggregated straight
        from raw — the losslessness the nesting assert guarantees."""
        from kgkit.operators.rollup import time_rollup

        pyr = time_rollup(events, levels=(300, 86_400))
        day = pyr.filter(F.col("level_s") == 86_400).select(
            "bucket_s", F.round("sum_value", 6).alias("s"), "count_value"
        )
        epoch = F.unix_timestamp("ts")
        direct = events.groupBy(
            (F.floor(epoch / 86_400) * 86_400).alias("bucket_s")
        ).agg(
            F.round(F.sum("value"), 6).alias("s"),
            F.count(F.lit(1)).alias("count_value"),
        )
        assert _spark_rows(day) == _spark_rows(direct)

    def test_keyed_rollup(self, spark, events):
        from kgkit.operators.rollup import time_rollup

        out = time_rollup(
            events, levels=(3600, 86_400), keys=["event_type"],
            aggs=("count",),
        )
        # per-day-per-type counts sum to the table size, at each level
        for w in (3600, 86_400):
            total = (
                out.filter(F.col("level_s") == w)
                .agg(F.sum("count_value")).collect()[0][0]
            )
            assert total == events.count()
        types = {r["event_type"] for r in
                 out.select("event_type").distinct().collect()}
        assert types == {"click", "view", "purchase", "signup", "error"}

    def test_non_nesting_levels_rejected(self, spark, events):
        from kgkit.operators.rollup import time_rollup

        with pytest.raises(ValueError, match="nest"):
            time_rollup(events, levels=(60, 90))
        with pytest.raises(ValueError, match="ascending"):
            time_rollup(events, levels=(3600, 60))
        with pytest.raises(ValueError, match="decomposable"):
            time_rollup(events, aggs=("avg",))

    def test_raw_scanned_once(self, spark, events):
        """The whole point vs per-level scans: only the finest level
        touches the raw table; each coarser level's plan reads the
        previous level's checkpointed partials."""
        from kgkit.operators.rollup import time_rollup

        out = time_rollup(events, levels=LEVELS)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("FileScan parquet") == 0, plan  # all levels cut
        # the union is three checkpointed leaves, nothing else
        assert plan.count("Scan ExistingRDD") == 3, plan
