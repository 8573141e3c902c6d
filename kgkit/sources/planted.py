"""Planted OOV/[UNK]-heavy and CJK/emoji pages for the NER corpus.

The driver's ``documents.parquet`` is single-spaced lowercase ASCII, so
the full-corpus oracles never exercised ``restore_unknown_tokens``'s
pathological phases (the reference's own worst cases,
nerblackbox tests/test_api_model.py:329-991) beyond the 12 goldens.
These pages are UNIONed into the NER input on BOTH sides — the Spark
queries (kgkit.queries._pages) and the DuckDB oracles
(kgkit.oracles WORDS_CTE ``ner_docs``) — from this single list, so the
whole mention/word-tag/probability oracle family now hash-checks the
[UNK] restoration path at corpus level, not just in unit goldens.

Every page obeys one invariant, asserted by
tests/test_ner_core.py::TestPlantedPages: ``pretokenize(text)`` equals
``text.split(' ')`` with cumulative offsets (no punctuation, single
spaces).  That is what keeps the word-level SQL view (split + running
length) an exact mirror of the python pipeline even though the pipeline
routes every non-ASCII word through [UNK] -> restore.

What each page exercises:
  * CJK / cyrillic / greek single words between entities ([UNK] restore
    phase 2, k_prev == k_next == 1, predicted tag kept)
  * leading / trailing [UNK]s (margin fallback to 0 / len(text))
  * 4 consecutive [UNK]s (left-to-right margin propagation)
  * emoji words incl. repeated identical ones (index-anchoring with
    duplicate surfaces)
  * repeated identical single-char OOV words surrounding entities
  * a long in-vocab-by-characters ASCII word (multi-piece WordPiece
    merge, anchored restore, no [UNK])
  * bigram/single greedy interplay next to restored words
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PLANTED_DOC_ID_BASE = 200_000

# (text only; doc_ids are PLANTED_DOC_ID_BASE + index).  Texts must be
# single-spaced, punctuation-free, apostrophe-free (they are inlined
# into oracle SQL VALUES literals) — see module docstring invariant.
PLANTED_NER_TEXTS: List[str] = [
    "spark 数据库 hash join 向量 stream",
    "💥 join 🚀🔥 vector θεσσαλονίκη merge",
    "hash join verylongunknownwordwithoutanyvocabpieces spark",
    "данные spark поток stream вектор merge",
    "spark один два три четыре join",
    "数据 hash join",
    "sort merge 終わり",
    "🚀 🚀 table scan 🙂 customer naïve café",
    "merge sort merge vector",
    "ω table scan ω ω customer ω",
]


def planted_ner_docs() -> List[Tuple[int, str]]:
    return [
        (PLANTED_DOC_ID_BASE + i, t) for i, t in enumerate(PLANTED_NER_TEXTS)
    ]


def planted_ner_pages(spark: SparkSession) -> DataFrame:
    """The planted pages in the (url, text, lang) mention-input shape —
    a JVM VALUES LocalRelation (kgkit.sources.localrel): ~15 queries
    union these rows into the NER input, and a createDataFrame fixture
    re-pays a pickled-RDD scan per query (guide §4)."""
    from kgkit.sources.localrel import values_df

    df = values_df(spark, planted_ner_docs(), "doc_id long, text string")
    return df.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        "text",
        F.lit("und").alias("lang"),
    )


def planted_values_sql() -> str:
    """DuckDB VALUES literal of the same (doc_id, text) rows."""
    rows = ", ".join(
        f"({doc_id}, '{text}')" for doc_id, text in planted_ner_docs()
    )
    return f"(VALUES {rows})"


# ---------------------------------------------------------------------------
# Relation-typing pages — planted ONLY into the kg_relations query
# ---------------------------------------------------------------------------
# The driver corpus is a closed synthetic vocabulary with no copulas,
# possession verbs, or -s/-ed/-ing forms (verified over sf0.1: the only
# rule-set words present are 'a'/'the'), so every driver-corpus
# predicate surface types as the 'assoc' fallback.  These pages put one
# positive of each typed class (isa / attr / has_part / action) between
# gazetteer entities, and BOTH the Spark query (kgkit.queries
# ._kg_relations_q) and its DuckDB oracle (kgkit.oracles._relations_sql)
# union them from this single list.  They are NOT in the global NER
# corpus (PLANTED_NER_TEXTS), so every other full-corpus oracle is
# byte-identical to before.  Same invariant: single-spaced, strictly
# [a-z ] (inlined into SQL VALUES literals).
RELATION_DOC_ID_BASE = 300_000

RELATION_TEXTS: List[str] = [
    "spark is a stream",              # isa       (copula + determiner)
    "customer is the spark",          # isa       ('the' determiner)
    "vector was fast merge",          # attr      (copula, no determiner)
    "customer has a vector",          # has_part
    "spark powers the stream",        # action    (-s verb form)
    "join derived from merge",        # action    (-ed verb form)
    "spark uses hash join",           # action    (bigram entity object)
    "customer and the spark",         # assoc     (control: fallback)
    "spark is a stream",              # duplicate: n > 1 for the isa edge
]


def relation_planted_docs() -> List[Tuple[int, str]]:
    return [
        (RELATION_DOC_ID_BASE + i, t) for i, t in enumerate(RELATION_TEXTS)
    ]


def relation_planted_pages(spark: SparkSession) -> DataFrame:
    """The relation-typing pages in the (url, text, lang) shape — a JVM
    VALUES LocalRelation, same rationale as planted_ner_pages."""
    from kgkit.sources.localrel import values_df

    df = values_df(spark, relation_planted_docs(), "doc_id long, text string")
    return df.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        "text",
        F.lit("und").alias("lang"),
    )


def relation_values_sql() -> str:
    """DuckDB VALUES literal of the same (doc_id, text) rows."""
    rows = ", ".join(
        f"({doc_id}, '{text}')" for doc_id, text in relation_planted_docs()
    )
    return f"(VALUES {rows})"
