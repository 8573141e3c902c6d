"""Table resolution: Iceberg catalog tables or parquet paths.

The north rule's production input is an Iceberg table of pages.  This
sandbox ships no Iceberg runtime jars, so the engine is written
SINK/SOURCE-AGNOSTIC: every operator takes a DataFrame, and this module
is the only place that knows where it came from.  With
``--packages org.apache.iceberg:iceberg-spark-runtime-...`` and a
catalog configured, the same pipelines run on Iceberg unchanged —
``resolve_table("catalog.db.pages")`` hits ``spark.table`` (snapshot
isolation, partition pruning, hidden-partitioning on url-hash buckets);
a path falls back to the parquet reader used throughout the tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def is_path(ref: str) -> bool:
    return "/" in ref or os.path.exists(ref)


def resolve_table(spark: SparkSession, ref: str) -> DataFrame:
    """'catalog.db.table' -> spark.table; '/path/dir' -> parquet scan."""
    if is_path(ref):
        return spark.read.parquet(ref)
    return spark.table(ref)


def write_table(df: DataFrame, ref: str, partition_cols=("bucket",)) -> None:
    """Partitioned write to a catalog table (Iceberg: writeTo/append with
    fanout) or a parquet path (sandbox)."""
    if is_path(ref):
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(ref)
    else:
        df.writeTo(ref).using("iceberg").partitionedBy(*partition_cols).createOrReplace()
