"""CoNLL-2003-style source (SURVEY §2.1 S3).

Reference: BaseFormatter._read_original_file
(nerblackbox/modules/datasets/formatter/base_formatter.py:175-210) +
CoNLL2003 column layout (conll2003_formatter.py:94-123): 4 space-
separated columns per token line, blank lines split sentences,
``-DOCSTART-`` rows are dropped.  The reference also converts IOB1 tags
to IOB2 afterwards (base_formatter.py:316-369) — exposed here as an
option via the same lag-window used in kgkit.queries.iob1_roundtrip.

Spark shape: one pass over ``spark.read.text`` lines; the sentence id is
a running count of blank lines (window cumsum ordered by file offset —
``monotonically_increasing_id`` preserves single-file line order because
partition ids are assigned by ascending split offset)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def read_conll(spark, path: str, iob2: bool = True) -> DataFrame:
    """-> (sentence_id long, pos long, word string, tag string)."""
    lines = spark.read.text(path).withColumn(
        "line_no", F.monotonically_increasing_id()
    )
    w = Window.orderBy("line_no")
    is_blank = F.trim(F.col("value")) == ""
    parsed = (
        lines.withColumn(
            "sentence_id",
            F.sum(is_blank.cast("long")).over(w),
        )
        .filter(~is_blank)
        .withColumn("cols", F.split(F.trim("value"), r"\s+"))
        .filter(F.col("cols")[0] != "-DOCSTART-")
        .select(
            "sentence_id",
            "line_no",
            F.col("cols")[0].alias("word"),
            F.element_at("cols", -1).alias("tag"),
        )
    )
    ws = Window.partitionBy("sentence_id").orderBy("line_no")
    out = parsed.select(
        "sentence_id",
        (F.row_number().over(ws) - 1).cast("long").alias("pos"),
        "word",
        "tag",
        F.lag("tag").over(ws).alias("_prev"),
    )
    if iob2:
        cls = F.substring_index("tag", "-", -1)
        keep = (F.col("_prev") == F.concat(F.lit("B-"), cls)) | (
            F.col("_prev") == F.concat(F.lit("I-"), cls)
        )
        out = out.withColumn(
            "tag",
            F.when(
                F.col("tag").startswith("I-") & ~F.coalesce(keep, F.lit(False)),
                F.concat(F.lit("B-"), cls),
            ).otherwise(F.col("tag")),
        )
    return out.drop("_prev")


def read_swedish_ner_corpus(spark, path: str) -> DataFrame:
    """swedish_ner_corpus reader: 2-column whitespace rows (word tag),
    blank-line sentences, with the dataset's tag normalization —
    ORG* -> ORG, PRG -> O (and the generic '0' -> 'O')
    (swedish_ner_corpus_formatter.py:44-54, 95-125; the download step
    itself is env-blocked, the format semantics are what matter)."""
    from kgkit.functions.tags import apply_tag_mapping

    base = read_conll(spark, path, iob2=False)
    return base.withColumn(
        "tag", apply_tag_mapping(F.col("tag"), {"ORG*": "ORG", "PRG": "O"})
    )


def read_suc(spark, path: str) -> DataFrame:
    """SUC 3.0 reader: 13-column TAB rows; word is column 2, the tag is
    composed from the BIO kind (column 11) and entity class (column 12)
    — 'O' stays 'O', else '<kind>-<class>'
    (suc_formatter.py:89-124, transform_tags :164-176).  Rows with a
    column count other than 13 are skipped (the reference logs and
    treats them as empty rows)."""
    lines = spark.read.text(path).withColumn(
        "line_no", F.monotonically_increasing_id()
    )
    w = Window.orderBy("line_no")
    is_blank = F.trim(F.col("value")) == ""
    parsed = (
        lines.withColumn("sentence_id", F.sum(is_blank.cast("long")).over(w))
        .filter(~is_blank)
        .withColumn("cols", F.split(F.col("value"), "\t"))
        .filter(F.size("cols") == 13)
        .select(
            "sentence_id",
            "line_no",
            F.col("cols")[1].alias("word"),
            F.when(F.element_at("cols", -3) == "O", F.lit("O"))
            .otherwise(
                F.concat(F.element_at("cols", -3), F.lit("-"),
                         F.element_at("cols", -2))
            ).alias("tag"),
        )
    )
    ws = Window.partitionBy("sentence_id").orderBy("line_no")
    return parsed.select(
        "sentence_id",
        (F.row_number().over(ws) - 1).cast("long").alias("pos"),
        "word",
        "tag",
    )


def read_swe_nerc(spark, path: str) -> DataFrame:
    """Swe-NERC reader (swe_nerc_formatter.py:105-213): rows of 3 or 4
    space/tab-separated fields — word, plain tag, lemma-ish field, and
    an optional trailing 'B' marker.  tag = 'O' for plain O; 'B-<tag>'
    when the 4th field is 'B'; else 'I-<tag>'.  'SKIP-THIS-TOKEN' rows
    are dropped and embedded whitespace/nbsp inside the word is removed
    (the reference's ''.join(word.split())).  Rows matching neither
    3-field nor 4-field-with-B shapes are skipped (the reference's
    _parse_row returns [] for them)."""
    lines = spark.read.text(path).withColumn(
        "line_no", F.monotonically_increasing_id()
    )
    w = Window.orderBy("line_no")
    is_blank = F.trim(F.col("value")) == ""
    cols = F.split(F.regexp_replace(F.trim("value"), "\t", " "), " +")
    parsed = (
        lines.withColumn("sentence_id", F.sum(is_blank.cast("long")).over(w))
        .filter(~is_blank)
        .withColumn("cols", cols)
        .filter(
            (F.size("cols") == 3)
            | ((F.size("cols") == 4) & (F.col("cols")[3] == "B"))
        )
        .filter(F.col("cols")[0] != "SKIP-THIS-TOKEN")
        .select(
            "sentence_id",
            "line_no",
            F.regexp_replace(F.col("cols")[0], r"[\s   ]+", "")
            .alias("word"),
            F.when(F.col("cols")[1] == "O", F.lit("O"))
            .when(F.size("cols") == 4,
                  F.concat(F.lit("B-"), F.col("cols")[1]))
            .otherwise(F.concat(F.lit("I-"), F.col("cols")[1]))
            .alias("tag"),
        )
    )
    ws = Window.partitionBy("sentence_id").orderBy("line_no")
    return parsed.select(
        "sentence_id",
        (F.row_number().over(ws) - 1).cast("long").alias("pos"),
        "word",
        "tag",
    )
