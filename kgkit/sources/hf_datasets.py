"""S4 — HuggingFace-datasets-layout ingestion (format logic, no network).

The reference's HuggingfaceDatasetsFormatter
(nerblackbox/modules/datasets/formatter/huggingface_datasets_formatter.py)
parses two feature layouts out of ``load_dataset`` output:

  A. pretokenized (e.g. conll2003, :137-147 + :269-277):
       tokens: List[str], ner_tags: List[ClassLabel int]
     -> per-token rows with the ClassLabel ids decoded to tag STRINGS
        via the feature's name list (``self.tags[int(tag_single)]``).

  B. char-span (e.g. ehealth_kd, :148-177 + :279-319):
       sentence: str, entities: List[{ent_text, ent_label(ClassLabel),
                                      start_character, end_character}]
     -> field renaming through the lookup mapping (:156-170), ClassLabel
        decode, DROP disconnected multi-word entities whose text length
        differs from their span (:300-310), then boundary NORMALIZATION
        (:321-348): some datasets give document-level offsets — shift
        every span by (text.find(first_entity) - first_entity.char_start).

Only the download is environment-blocked (no egress here); the format
logic is fully implemented as column expressions over DataFrames of the
same shape ``datasets`` yields.  ``*_fixture`` builders synthesize those
shapes deterministically from the corpus tables so the ingest paths are
oracle-checkable end-to-end (kgkit/oracles.py hf_*).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ClassLabel name lists of the synthetic fixtures (feature metadata in a
# real `datasets` payload).  Order matters: ids are positions.
BIO_CLASS_LABELS = ["O", "B-DIM", "B-OP", "B-TECH", "I-DIM", "I-OP", "I-TECH"]
ENT_CLASS_LABELS = ["DIM", "OP", "TECH"]


def _labels_array(names: Sequence[str]) -> Column:
    return F.array(*[F.lit(n) for n in names])


# ---------------------------------------------------------------------------
# layout A: pretokenized
# ---------------------------------------------------------------------------


def ingest_pretokenized(
    ds: DataFrame, class_labels: List[str] = BIO_CLASS_LABELS
) -> DataFrame:
    """(sentence_id, tokens ARRAY<STRING>, ner_tags ARRAY<INT>) ->
    (sentence_id, pos, token, tag) — the ClassLabel int->string decode of
    huggingface_datasets_formatter.py:269-277, exploded to token rows.
    Pure column expressions: zip the arrays, posexplode, index the
    (broadcast-literal) name list."""
    labels = _labels_array(class_labels)
    zipped = ds.select(
        "sentence_id",
        F.posexplode(F.arrays_zip("tokens", "ner_tags")).alias("pos", "tt"),
    )
    return zipped.select(
        "sentence_id",
        F.col("pos").cast("long").alias("pos"),
        F.col("tt")["tokens"].alias("token"),
        F.element_at(labels, F.col("tt")["ner_tags"].cast("int") + 1).alias("tag"),
    )


def hf_pretokenized_fixture(word_tags: DataFrame) -> DataFrame:
    """Builds the layout-A shape from the engine's word-level tag stream
    (url, pos, word, tag): encode tags to ClassLabel ids by position in
    BIO_CLASS_LABELS, collect per sentence.  Ingest must invert this
    exactly — a wrong id<->name mapping breaks oracle parity."""
    labels = _labels_array(BIO_CLASS_LABELS)
    return (
        word_tags.select(
            F.col("url").alias("sentence_id"),
            "pos", "word",
            (F.array_position(labels, F.col("tag")) - 1).cast("int").alias("tag_id"),
        )
        .groupBy("sentence_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda s: s["word"],
            ).alias("tokens"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tag_id"))),
                lambda s: s["tag_id"],
            ).alias("ner_tags"),
        )
    )


# ---------------------------------------------------------------------------
# layout B: char-span entities
# ---------------------------------------------------------------------------


def ingest_charspan(
    ds: DataFrame, class_labels: List[str] = ENT_CLASS_LABELS
) -> DataFrame:
    """(sentence_id, sentence, entities ARRAY<STRUCT<ent_text STRING,
    ent_label INT, start_character LONG, end_character LONG>>) ->
    (sentence_id, token, tag, char_start, char_end).

    Reproduces huggingface_datasets_formatter.py:279-348 as column
    expressions: mapping rename + ClassLabel decode, disconnected-entity
    filter (len(token) != end-start), and document->sentence boundary
    normalization anchored on the FIRST kept entity's position in the
    sentence (instr is 1-based where str.find is 0-based; for a missing
    token both yield the same -1-based shift).  Sentences whose kept
    entity list is empty produce no rows (the reference would raise on
    its tags[0] access; the relational form degrades gracefully)."""
    labels = _labels_array(class_labels)
    kept = F.filter(
        F.col("entities"),
        lambda e: F.length(e["ent_text"])
        == e["end_character"] - e["start_character"],
    )
    first = F.element_at(kept, 1)
    diff = (
        F.instr(F.col("sentence"), first["ent_text"]).cast("long")
        - 1
        - first["start_character"]
    )
    rows = (
        ds.select(
            "sentence_id",
            F.explode(kept).alias("e"),
            diff.alias("diff"),
        )
        .select(
            "sentence_id",
            F.col("e")["ent_text"].alias("token"),
            F.element_at(labels, F.col("e")["ent_label"].cast("int") + 1).alias("tag"),
            (F.col("e")["start_character"] + F.col("diff")).alias("char_start"),
            (F.col("e")["end_character"] + F.col("diff")).alias("char_end"),
        )
    )
    return rows


def hf_charspan_fixture(
    pages: DataFrame, mentions: DataFrame, doc_offset_shift: int = 1000
) -> DataFrame:
    """Builds the layout-B shape from the mention stream: per page, the
    entities array in char order with DOCUMENT-level offsets (every span
    shifted by ``doc_offset_shift`` — the ehealth_kd-style quirk the
    normalizer must undo), plus one planted DISCONNECTED entity (token
    text one char longer than its span) that the filter must drop."""
    label_id = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(n) for n in ENT_CLASS_LABELS]),
            F.array(*[F.lit(i) for i in range(len(ENT_CLASS_LABELS))]),
        ),
        F.col("m")["tag"],
    )
    ents = (
        mentions.select(
            "url",
            F.struct(
                F.col("surface").alias("ent_text"),
                F.col("tag").alias("tag"),
                F.col("char_start").cast("long").alias("start_character"),
                F.col("char_end").cast("long").alias("end_character"),
            ).alias("m"),
        )
        .select(
            "url",
            F.struct(
                F.col("m")["ent_text"].alias("ent_text"),
                label_id.cast("int").alias("ent_label"),
                (F.col("m")["start_character"] + doc_offset_shift)
                .alias("start_character"),
                (F.col("m")["end_character"] + doc_offset_shift)
                .alias("end_character"),
            ).alias("e"),
        )
        .groupBy("url")
        .agg(
            F.array_sort(
                F.collect_list("e"),
                lambda l, r: F.when(
                    l["start_character"] < r["start_character"], F.lit(-1)
                ).when(l["start_character"] > r["start_character"], F.lit(1))
                .otherwise(F.lit(0)),
            ).alias("ents")
        )
    )
    # plant a disconnected entity at the tail: span length ends up one
    # short of the token text, so the ingest filter must drop it
    planted = F.concat(
        F.col("ents"),
        F.array(
            F.struct(
                F.lit("xx yy").alias("ent_text"),
                F.lit(0).cast("int").alias("ent_label"),
                F.lit(0).cast("long").alias("start_character"),
                F.lit(4).cast("long").alias("end_character"),
            )
        ),
    )
    return pages.select(
        F.col("url").alias("sentence_id"), F.col("text").alias("sentence")
    ).join(
        ents.select(F.col("url").alias("sentence_id"), planted.alias("entities")),
        "sentence_id",
        "inner",
    )
