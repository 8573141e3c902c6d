"""KMV (k-minimum-values) distinct sketch — mergeable cardinality.

COUNT(DISTINCT x) per key is one of the expensive questions at crawl
scale (distinct urls per host, distinct hosts per entity): exact
counting shuffles every distinct value.  The KMV sketch (Bar-Yossef et
al. 2002; the theta-sketch family's ancestor) keeps only the k SMALLEST
hash values per key: since hashes are uniform on [0, M), the kth
smallest value t estimates the cardinality as (k-1) * M / t, with
relative error ~ 1/sqrt(k).  Two properties make it the right
distributed primitive:

  * MERGEABLE: sketch(A ∪ B) == k-smallest of sketch(A) ∪ sketch(B) —
    exactly, not approximately.  Partial sketches from partitions,
    micro-batches, or historical parts merge losslessly (the same
    partial-aggregate discipline as the KG stream's counts).
  * EXACT below k: fewer than k distinct values means the sketch IS
    the distinct set, so small keys pay no approximation.

Determinism: hashes are the repo's md5-hex-prefix convention (15 hex
digits = 60 bits; Spark ``conv(substring(md5(x),1,15),16,10)`` ==
DuckDB ``('0x' || substr(md5(x),1,15))::BIGINT``), so sketches and
estimates are BIT-IDENTICAL across engines and partitionings — the
tests run a DuckDB per-key differential, not a tolerance check.

Scale shape: the value stream first dedupes on (key, hash) — a
uniform-key shuffle with map-side combine — then a window ranks within
(key, salt = hash % n_salts) so a hub key's candidate state splits
across ``n_salts`` tasks (the salted_entity_counts discipline; a
plain per-key window would serialize the hub), and a final per-key
pass ranks the ≤ k*n_salts survivors.  Nothing holds unbounded
per-group state.

No reference analog; public designs: Bar-Yossef et al., DataSketches
theta sketches.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: 15 hex digits -> 60-bit non-negative hash
HASH_HEX = 15
HASH_MAX = 1 << 60


def kmv_hash_col(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, HASH_HEX), 16, 10).cast("long")


def kmv_hash_py(value: str) -> int:
    return int(hashlib.md5(value.encode("utf-8")).hexdigest()[:HASH_HEX], 16)


def kmv_sketch(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    k: int = 256,
    n_salts: int = 16,
) -> DataFrame:
    """(keys..., sketch array<long> ascending): the k smallest distinct
    md5 hashes of ``col`` per key group."""
    keys = list(keys)
    h = kmv_hash_col(F.col(col)).alias("_h")
    # NULL values must not enter: md5(NULL) is NULL, ranks FIRST in
    # the ascending windows (nulls-first), eats a top-k slot and then
    # drops out of collect_list — a one-NULL group would ship a k-1
    # sketch and take the exact-below-k estimator branch (a silent
    # collapse to ~k).  SQL COUNT(DISTINCT) ignores NULLs; so do we.
    distinct = (
        df.filter(F.col(col).isNotNull()).select(*keys, h).distinct()
    )
    w_salt = Window.partitionBy(
        *keys, F.pmod(F.col("_h"), F.lit(n_salts))
    ).orderBy("_h")
    w_key = Window.partitionBy(*keys).orderBy("_h")
    survivors = (
        distinct.withColumn("_r1", F.row_number().over(w_salt))
        .filter(F.col("_r1") <= k)
        .withColumn("_r2", F.row_number().over(w_key))
        .filter(F.col("_r2") <= k)
    )
    return survivors.groupBy(*keys).agg(
        F.array_sort(F.collect_list("_h")).alias("sketch")
    )


def kmv_merge(parts: DataFrame, keys: Sequence[str], k: int = 256) -> DataFrame:
    """Merge partial sketch rows (same schema as ``kmv_sketch`` output,
    several rows per key — per-batch parts, per-source parts) into one
    sketch per key: k smallest of the union of distinct hash values.
    Lossless by the KMV merge property."""
    keys = list(keys)
    return parts.groupBy(*keys).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("sketch")))),
            1,
            k,
        ).alias("sketch")
    )


def kmv_estimate_col(sketch: Column, k: int = 256) -> Column:
    """Cardinality estimate from a sketch array: exact when the sketch
    holds fewer than k values, else (k-1) * HASH_MAX / kth-min — one
    IEEE division, identical on any engine."""
    return F.when(
        F.size(sketch) < k, F.size(sketch).cast("double")
    ).otherwise(
        F.lit(float((k - 1) * HASH_MAX)) / F.element_at(sketch, k).cast("double")
    )


def kmv_estimate_py(hashes: List[int], k: int = 256) -> float:
    xs = sorted(set(hashes))[:k]
    if len(xs) < k:
        return float(len(xs))
    return float((k - 1) * HASH_MAX) / float(xs[k - 1])


def distinct_estimate(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    k: int = 256,
    n_salts: int = 16,
) -> DataFrame:
    """(keys..., est_distinct): the composed convenience —
    ``approx COUNT(DISTINCT col) GROUP BY keys`` with mergeable state
    and ~1/sqrt(k) relative error."""
    sk = kmv_sketch(df, keys, col, k=k, n_salts=n_salts)
    return sk.select(
        *keys,
        F.round(kmv_estimate_col(F.col("sketch"), k), 4).alias("est_distinct"),
    )
