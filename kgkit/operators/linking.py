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
    (score, prior, entity_id) as the deterministic sort key; top-1 per
    mention via a row_number window partitioned by (url, mention_id).

Scale: the only shuffles are the embeddings join (keyed by doc_id — a
uniform key, no skew) and the rerank window (keyed by mention — maximal
cardinality, trivially balanced).  Entity embeddings are broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def link_mentions(
    mentions: DataFrame,
    embeddings: DataFrame,
    aliases: DataFrame = None,
) -> DataFrame:
    """mentions -> linked mentions with (entity_id, link_score).

    Unlinkable mentions (surface not in the dictionary) are dropped —
    they carry no KG signal downstream.
    """
    spark = mentions.sparkSession
    if aliases is None:
        aliases = alias_df(spark)

    cands = mentions.join(
        F.broadcast(aliases),
        F.lower(mentions.surface) == aliases["alias"],
        "inner",
    )

    # page embedding: vec_id == doc_id (url = 'doc://<id>' or 'synth://<id>')
    doc_id = F.substring_index(F.col("url"), "//", -1).cast("long")
    page_emb = embeddings.select(
        F.col("vec_id"), F.col("embedding").alias("page_emb")
    )
    ent_emb = embeddings.select(
        F.col("vec_id").alias("ent_vec_id"), F.col("embedding").alias("ent_emb")
    )

    scored = (
        cands.withColumn("doc_id", doc_id)
        .join(page_emb, F.col("doc_id") == F.col("vec_id"), "left")
        .join(F.broadcast(ent_emb), F.col("entity_num") == F.col("ent_vec_id"), "left")
        .withColumn(
            "link_score",
            F.when(
                F.col("page_emb").isNotNull() & F.col("ent_emb").isNotNull(),
                F.round(cosine(F.col("page_emb"), F.col("ent_emb")), 6),
            ).otherwise(F.lit(0.0)),
        )
    )

    w = Window.partitionBy("url", "mention_id").orderBy(
        F.desc("link_score"), F.desc("prior"), F.asc("entity_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "url", "mention_id", "char_start", "char_end", "surface", "tag",
            "entity_id", "entity_num", "prior", "link_score",
        )
    )
