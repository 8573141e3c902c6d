"""Stage 2 — entity linking: broadcast alias join + embedding rerank.

SURVEY §2.9 J1/J2 (no analog in the reference — the reference stops at
span extraction; these stages are the KG extension required by the
north rule).

J1: mentions ⋈ alias_dict on lower(surface) — the dictionary is tiny
    (broadcastable by construction), so this is an explicit
    ``F.broadcast`` hash join: no shuffle of the mention stream.
J2: ambiguous aliases (>1 candidate entity) are reranked by cosine
    similarity between the page embedding (embeddings.vec_id == doc_id)
    and the candidate entity embedding (vec_id == entity_num), with
    (score, prior, entity_id) as the deterministic sort key.

Scale design — the mention stream NEVER shuffles in this stage:

  * the dictionary is pre-grouped to one row per alias carrying an
    ARRAY of candidates, so the broadcast join emits exactly one row
    per mention (no fan-out, no re-aggregation).
  * rerank scores are precomputed on the EMBEDDINGS table — one row per
    page, one cosine per (page, ambiguous-entity) pair — which is
    linear in pages and embarrassingly parallel.  Mentions then pick
    their winner from a per-page score map with a pure array-sort
    expression.  Cosine is never evaluated per mention row: mentions of
    hub entities (the skewed keys) take the n_cands==1 fast path and
    touch no expensive expression at all.
  * the per-page score table joins to mentions on doc_id — a uniform,
    skew-free key.  In this sandbox it is broadcastable; at 10^12 pages
    it becomes an ordinary hash join keyed by doc_id while everything
    else in the stage stays map-side.

``link_score`` is NULL for unambiguous mentions (nothing was reranked);
for ambiguous mentions it is the winning cosine (0.0 when either
embedding is missing — same ordering the DuckDB oracle uses).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kgkit.sources.alias_dict import alias_df


def cosine(a, b):
    """Cosine similarity between two float-array columns, computed in
    double precision with deterministic left-to-right accumulation."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    nb = F.sqrt(F.aggregate(
        F.transform(b, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    return dot / (na * nb)


def _float_array_lit(values) -> Column:
    return F.array(*[F.lit(float(v)) for v in values])


def page_entity_scores(embeddings: DataFrame, amb_entity_nums) -> DataFrame:
    """(vec_id, escore: MAP<int,double>) — cosine of each page embedding
    against each ambiguous candidate entity's embedding.  One pass over
    the embeddings table; |amb_entity_nums| cosines per page."""
    ent_rows = {
        int(r["vec_id"]): list(r["embedding"])
        for r in embeddings.filter(
            F.col("vec_id").isin([int(n) for n in amb_entity_nums])
        ).collect()
    }
    entries = [
        F.struct(
            F.lit(num).alias("k"),
            F.round(cosine(F.col("embedding"), _float_array_lit(emb)), 6).alias("v"),
        )
        for num, emb in sorted(ent_rows.items())
    ]
    if not entries:
        return embeddings.select(
            "vec_id",
            F.lit(None).cast("map<int,double>").alias("escore"),
        )
    return embeddings.select(
        "vec_id", F.map_from_entries(F.array(*entries)).alias("escore")
    )


_OUT_COLS = [
    "url", "mention_id", "char_start", "char_end", "surface", "tag",
    "entity_id", "entity_num", "prior", "link_score",
]


def link_mentions(
    mentions: DataFrame,
    embeddings: DataFrame,
    aliases: DataFrame = None,
) -> DataFrame:
    """mentions -> linked mentions with (entity_id, link_score).

    Unlinkable mentions (surface not in the dictionary) are dropped —
    they carry no KG signal downstream.  The output plan is NARROW over
    the mention stream: broadcast joins + array expressions only.
    """
    spark = mentions.sparkSession
    if aliases is None:
        aliases = alias_df(spark)

    # one row per alias with its candidate array (tiny -> broadcast)
    grouped = aliases.groupBy("alias").agg(
        F.sort_array(
            F.collect_list(F.struct("entity_id", "entity_num", "prior"))
        ).alias("cands"),
        F.count("*").alias("n_cands"),
    )

    amb_nums = sorted(
        int(n)
        for r in grouped.filter("n_cands > 1").select("cands").collect()
        for n in [c["entity_num"] for c in r["cands"]]
    )
    scores = page_entity_scores(embeddings, amb_nums).select(
        F.col("vec_id"), F.col("escore")
    )

    doc_id = F.substring_index(F.col("url"), "//", -1).cast("long")
    cands = (
        mentions.join(
            F.broadcast(grouped),
            F.lower(mentions.surface) == grouped["alias"],
            "inner",
        )
        .withColumn("doc_id", doc_id)
        .join(F.broadcast(scores), F.col("doc_id") == F.col("vec_id"), "left")
    )

    # winner per mention: order by (link_score DESC, prior DESC,
    # entity_id ASC) — an array_sort comparator, evaluated only on the
    # (small) ambiguous slice; unambiguous rows take element 1 directly.
    scored = F.transform(
        F.col("cands"),
        lambda c: F.struct(
            F.coalesce(F.col("escore")[c["entity_num"]], F.lit(0.0)).alias("s"),
            c["prior"].alias("prior"),
            c["entity_id"].alias("entity_id"),
            c["entity_num"].alias("entity_num"),
        ),
    )
    cmp = lambda l, r: (  # noqa: E731
        F.when(l["s"] > r["s"], F.lit(-1))
        .when(l["s"] < r["s"], F.lit(1))
        .when(l["prior"] > r["prior"], F.lit(-1))
        .when(l["prior"] < r["prior"], F.lit(1))
        .when(l["entity_id"] < r["entity_id"], F.lit(-1))
        .when(l["entity_id"] > r["entity_id"], F.lit(1))
        .otherwise(F.lit(0))
    )
    best = F.element_at(F.array_sort(scored, cmp), 1)

    return cands.select(
        "url", "mention_id", "char_start", "char_end", "surface", "tag",
        F.when(F.col("n_cands") == 1, F.col("cands")[0]["entity_id"])
        .otherwise(best["entity_id"]).alias("entity_id"),
        F.when(F.col("n_cands") == 1, F.col("cands")[0]["entity_num"])
        .otherwise(best["entity_num"]).alias("entity_num"),
        F.when(F.col("n_cands") == 1, F.col("cands")[0]["prior"])
        .otherwise(best["prior"]).alias("prior"),
        F.when(F.col("n_cands") == 1, F.lit(None).cast("double"))
        .otherwise(best["s"]).alias("link_score"),
    )
