"""Hypertable-style multi-resolution time rollup.

A metrics/events table at crawl scale is queried at many resolutions
(minute dashboards, hourly alerting, daily reporting).  The naive way
computes every level from the raw table — L full scans.  The
hypertable/continuous-aggregate way (TimescaleDB's design, the classic
OLAP cube rollup) scans raw data ONCE for the finest level and derives
each coarser level by RE-AGGREGATING the previous level's partials:
sum-of-sums, sum-of-counts, min-of-mins, max-of-maxs are exactly the
decomposable aggregates for which partial aggregation is lossless
(avg = sum/count at read time).  Level k's input is |buckets_{k-1}|
rows — orders of magnitude below raw — so the whole pyramid costs one
corpus scan plus graph-sized work.

``time_rollup`` returns ONE frame tagged by ``level_s``; each level is
eagerly materialized (localCheckpoint) before the next derives from it
— that is what guarantees the single raw scan (a lazy union would
re-execute the finest subplan per branch) and mirrors the engine's
other pyramid loops (CC, PageRank).  Levels must nest (each a multiple
of the previous) so bucket boundaries align and the re-aggregation is
exact — asserted, not assumed.

No reference analog; public designs: TimescaleDB continuous
aggregates, Druid/Pinot star-tree rollups.  Bucket arithmetic uses the
same integer-epoch convention as kgkit.operators.asof (unix_timestamp
== DuckDB floor(epoch)), so every level is SQL-twinnable
(tests/test_rollup.py runs a DuckDB differential per level).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgkit.operators.asof import _epoch

#: decomposable aggregates: (finest-from-raw, coarser-from-partial)
_AGGS = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def time_rollup(
    df: DataFrame,
    ts: str = "ts",
    levels: Sequence[int] = (60, 3600, 86_400),
    value: str = "value",
    aggs: Sequence[str] = ("sum", "count", "min", "max"),
    keys: Optional[Sequence[str]] = None,
) -> DataFrame:
    """(rows with ``ts``/``value``/``keys``) -> the rollup pyramid:
    one row per (level_s, bucket_s, *keys) carrying ``<agg>_<value>``
    columns; raw data is scanned exactly once (finest level), coarser
    levels re-aggregate the finer partials.

    ``levels`` are bucket widths in seconds, ascending, each dividing
    the next; ``aggs`` from {sum, count, min, max} (all decomposable —
    avg is sum/count at read time)."""
    levels = list(levels)
    if not levels:
        raise ValueError("need at least one level")
    if sorted(levels) != levels or len(set(levels)) != len(levels):
        raise ValueError(f"levels must be strictly ascending: {levels}")
    for a, b in zip(levels, levels[1:]):
        if b % a:
            raise ValueError(
                f"level {b} does not nest into {a}: coarser buckets must "
                "align with finer ones for partial re-aggregation to be "
                "exact"
            )
    bad = [a for a in aggs if a not in _AGGS]
    if bad:
        raise ValueError(f"non-decomposable aggs {bad}; allowed: "
                         f"{sorted(_AGGS)}")
    keys = list(keys or [])

    epoch = _epoch(F.col(ts), df.schema[ts].dataType)
    cols = lambda a: f"{a}_{value}"  # noqa: E731

    # finest level: the ONE raw scan
    finest = levels[0]
    cur = (
        df.groupBy(
            (F.floor(epoch / F.lit(finest)) * finest).alias("bucket_s"),
            *keys,
        )
        .agg(*[
            _AGGS[a][0](F.col(value)).alias(cols(a)) for a in aggs
        ])
        .withColumn("level_s", F.lit(finest).cast("long"))
        .localCheckpoint()  # materialize: coarser levels derive from THIS
    )
    out: List[DataFrame] = [cur]
    for width in levels[1:]:
        cur = (
            cur.groupBy(
                (F.floor(F.col("bucket_s") / F.lit(width)) * width)
                .alias("bucket_s"),
                *keys,
            )
            .agg(*[
                _AGGS[a][1](F.col(cols(a))).alias(cols(a)) for a in aggs
            ])
            .withColumn("level_s", F.lit(width).cast("long"))
            .localCheckpoint()
        )
        out.append(cur)
    u = out[0]
    for nxt in out[1:]:
        u = u.unionByName(nxt)
    return u.select("level_s", "bucket_s", *keys,
                    *[cols(a) for a in aggs])
