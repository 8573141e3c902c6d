"""Stage 3 — canonicalization: connected components over entity synonymy.

SURVEY §2.9 J3 / §4.3.1: entities connected by shared aliases or synonym
edges collapse to one canonical id (the minimum entity id in the
component, lexicographic-numeric on 'Q<n>').

Implementation: iterative min-label propagation as DataFrame self-joins —
the one genuinely iterative operator in the pipeline.  Each round:

    label(v) <- min(label(v), min over neighbours u of label(u))

with ``localCheckpoint()`` per iteration to cut the lineage chain
(otherwise the plan doubles every round), and convergence detected by a
changed-row count.

Two variants:

  * ``variant='doubling'``: each round ALSO pointer-jumps
    ``label(v) <- label(label(v))`` — the shortcutting step of
    large-star/small-star-family CC algorithms (Kiveris et al.,
    "Connected Components in MapReduce and Beyond"; hash-to-min of
    Rastogi et al.).  Labels are monotone non-increasing and every
    label value is itself a node, so the jump is one self-join; the
    distance to the component minimum shrinks multiplicatively and the
    fixpoint lands in O(log diameter) rounds.  On a chain-shaped
    synonym graph (the worst case at 100x scale) this is the
    difference between ~log2(n) rounds and n rounds.
  * ``variant='propagation'``: plain min-label propagation,
    <= diameter rounds — one fewer join per round, fine for the
    shallow alias graph.
  * ``variant='adaptive'`` (default): propagation for the first
    ``jump_after`` rounds, jumps from then on — a shallow graph (the
    alias dictionary converges in <= 3 rounds) never pays the extra
    join, a deep chain still finishes in jump_after + O(log n) rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _entity_key(col):
    """Sort key for 'Q<n>' ids: numeric part as int."""
    return F.substring(col, 2, 10).cast("int")


def connected_components(
    edges: DataFrame,
    max_iter: int = 50,
    variant: str = "adaptive",
    stats: dict = None,
    jump_after: int = 3,
    key_fn=None,
) -> DataFrame:
    """edges(src, dst) undirected -> components(entity_id, canonical_id).

    canonical_id = the member with the smallest ``key_fn`` value —
    default ``_entity_key`` (the numeric part of 'Q<n>' entity ids);
    pass ``key_fn=lambda c: c`` for naturally ordered ids (e.g. the
    near-dup cluster graph over BIGINT doc_ids).  See the module
    docstring for the two variants; pass a dict as ``stats`` to
    receive {'rounds': <iterations until fixpoint>} back (the
    long-chain test pins the doubling variant to O(log n) rounds).

    The loop's shuffle width is sized to the GRAPH, not the session
    default: the entity graph is orders of magnitude smaller than the
    page corpus, and running log(n) tiny iterations at the corpus's
    shuffle width is pure scheduler overhead (measured: the loop at 32
    shuffle partitions dominated the whole pipeline's wall clock).
    ~100k edges per partition keeps each iteration a handful of tasks.
    """
    if variant not in ("doubling", "propagation", "adaptive"):
        raise ValueError(f"unknown CC variant {variant!r}")
    key = key_fn if key_fn is not None else _entity_key
    spark = edges.sparkSession
    n_edges = edges.count()
    n_parts = max(1, min(64, n_edges // 100_000))
    saved_parts = spark.conf.get("spark.sql.shuffle.partitions")
    # everything that runs eager jobs at the loop's shuffle width —
    # including the sym/labels localCheckpoints — sits inside the try so
    # a failure can never leave the session-wide conf overridden
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        sym = (
            edges.select("src", "dst").union(
                edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            .distinct()
            .repartition(n_parts, "src")
            .localCheckpoint()
        )

        labels = (
            sym.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("label", F.col("node"))
            .localCheckpoint()
        )

        rounds = 0
        for _ in range(max_iter):
            rounds += 1
            # min label among each node's neighbours
            neighbour_min = (
                sym.join(labels, sym.dst == labels.node, "inner")
                .groupBy(sym.src.alias("node2"))
                .agg(F.min_by("label", key(F.col("label"))).alias("nmin"))
            )
            prop = (
                labels.join(neighbour_min, labels.node == F.col("node2"), "left")
                .select(
                    "node",
                    F.when(
                        F.col("nmin").isNotNull()
                        & (key(F.col("nmin")) < key(F.col("label"))),
                        F.col("nmin"),
                    ).otherwise(F.col("label")).alias("label"),
                    (F.col("nmin").isNotNull()
                     & (key(F.col("nmin")) < key(F.col("label")))
                     ).alias("changed"),
                )
            )
            jump = variant == "doubling" or (
                variant == "adaptive" and rounds > jump_after
            )
            if jump:
                # pointer jump: label(v) <- label(label(v)).  Labels are
                # monotone non-increasing and every label value IS a
                # node, so the inner self-join matches exactly once and
                # b's label can only be <= a's (take it unconditionally;
                # 'changed' tracks propagation OR shortcutting)
                j = prop.select("node", "label", "changed")
                jumped = (
                    j.alias("a")
                    .join(
                        j.select(
                            F.col("node").alias("jn"),
                            F.col("label").alias("jl"),
                        ),
                        F.col("a.label") == F.col("jn"),
                        "inner",
                    )
                    .select(
                        F.col("a.node").alias("node"),
                        F.col("jl").alias("label"),
                        (F.col("a.changed")
                         | (key(F.col("jl"))
                            < key(F.col("a.label")))).alias("changed"),
                    )
                )
                updated = jumped.localCheckpoint()
            else:
                updated = prop.localCheckpoint()
            n_changed = updated.filter("changed").count()
            labels = updated.select("node", "label")
            if n_changed == 0:
                break
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved_parts)
    if stats is not None:
        stats["rounds"] = rounds

    return labels.select(
        F.col("node").alias("entity_id"), F.col("label").alias("canonical_id")
    )


_CANONICAL_CACHE: dict = {}
_CANONICAL_CACHE_MAX_ROWS = 1_000_000  # size guard: never memoize a map
# larger than what is sane to collect/broadcast (the entity catalog,
# not the page corpus; beyond this the caller should persist the CC
# result as a table instead of relying on the memo)


def canonical_map(spark, edges: DataFrame = None) -> DataFrame:
    """entity_id -> canonical_id for ALL entities (singletons map to
    themselves).  Small by construction — safe to broadcast.

    The default (static alias-dictionary) map is memoized per session:
    the CC fixpoint loop runs once and later calls rebuild the tiny
    result as a local DataFrame — repeated queries must not re-pay the
    iterative loop for an input that cannot have changed.  The memo is
    keyed by the session's applicationId (stable; never aliases a
    recycled Python object the way id(spark) could) and holds only the
    latest session's entry, which evicts prior sessions' rows.
    """
    from kgkit.sources.alias_dict import alias_df, edges_df

    if edges is None:
        key = spark.sparkContext.applicationId
        cached = _CANONICAL_CACHE.get(key)
        if cached is not None:
            return spark.createDataFrame(
                cached, "entity_id string, canonical_id string"
            )
        result = canonical_map(spark, edges_df(spark))
        rows = [tuple(r) for r in result.collect()]
        if len(rows) <= _CANONICAL_CACHE_MAX_ROWS:
            _CANONICAL_CACHE.clear()  # evict dead sessions' entries
            _CANONICAL_CACHE[key] = rows
        return spark.createDataFrame(rows, "entity_id string, canonical_id string")

    comp = connected_components(edges)
    all_entities = alias_df(spark).select("entity_id").distinct()
    return (
        all_entities.join(comp, "entity_id", "left")
        .select(
            "entity_id",
            F.coalesce("canonical_id", "entity_id").alias("canonical_id"),
        )
    )
