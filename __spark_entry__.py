"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the full KG
pipeline: pages -> mentions -> linking -> canonicalization -> triples)
on sf0.001.  ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 with its DuckDB oracle; the authoritative
definitions live in kgkit.queries / kgkit.oracles so the same builders
back bench.py and the pytest suite.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: KG triples."""
    from kgkit.queries import QUERIES

    return QUERIES["kg_triples"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from kgkit.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (tables pre-registered)."""
    from kgkit.oracles import ORACLES

    return dict(ORACLES)
