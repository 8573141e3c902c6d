"""JVM LocalRelation builder for small static row sets.

``spark.createDataFrame(rows, ...)`` on driver-side python data builds
a pickled python RDD that the JVM unpickles per evaluation (the plan
shows ``Scan ExistingRDD ... applySchemaToPythonRDD``, outside
whole-stage codegen, with UnknownPartitioning).  Every query that
unions or broadcast-joins such a fixture re-pays that scan — measured
~0.2-1 s per query at sf0.1 across the ~15 queries that union the
planted NER pages (guide §4: keep constant data out of the python
boundary).  A ``VALUES``-literal relation is a pure JVM LocalRelation:
codegen-friendly, constant-foldable, broadcastable without touching the
python gateway.

Only for SMALL, STATIC, code-level fixtures (tens of rows): the rows
are inlined into SQL text, so the same no-apostrophe invariant the
DuckDB oracle VALUES literals already require applies here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _sql_literal(v, cast: str) -> str:
    if v is None:
        return f"CAST(NULL AS {cast})"
    if isinstance(v, str):
        assert "'" not in v and "\\" not in v, (
            f"VALUES fixture rows must be quote/backslash-free: {v!r}"
        )
        return f"'{v}'"
    # numerics are cast explicitly: a bare 0.9 parses as DECIMAL(1,1)
    # and a bare 5 as INT — the fixture schemas want double/bigint
    return f"CAST({v!r} AS {cast})"


def values_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """rows + 'name type, ...' schema -> a JVM LocalRelation with
    exactly the same column names/types as the createDataFrame twin."""
    cols = []
    for part in schema.split(","):
        name, typ = part.strip().split(" ", 1)
        assert "`" not in name
        cols.append((name, typ.strip().upper()))
    if not rows:
        # VALUES needs >= 1 tuple; an empty fixture keeps the
        # createDataFrame path (still correct, just not LocalRelation)
        return spark.createDataFrame([], schema)
    body = ", ".join(
        "(" + ", ".join(
            _sql_literal(v, cols[i][1]) for i, v in enumerate(row)
        ) + ")"
        for row in rows
    )
    # backtick-quote names: fixture columns may collide with SQL
    # keywords ('true'/'pred' in the metric tables)
    names = ", ".join(f"`{n}`" for n, _ in cols)
    # IF(TRUE, x, NULL): VALUES literals analyze as non-nullable, but the
    # createDataFrame twin this replaces is nullable — keep the schemas
    # bit-identical (the driver compares schemas, and unionByName
    # nullability must not tighten)
    casts = ", ".join(
        f"IF(TRUE, CAST(`{n}` AS {t}), CAST(NULL AS {t})) AS `{n}`"
        for n, t in cols
    )
    return spark.sql(
        f"SELECT {casts} FROM (VALUES {body}) AS _v({names})"
    )
