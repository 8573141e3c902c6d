"""Language-model perplexity quality scoring (the CCNet recipe).

The strongest web-corpus quality signal in production pipelines is not
a rule battery but a small language model trained on known-good text:
documents whose tokens the LM finds surprising (high perplexity) are
boilerplate, gibberish, or the wrong register (CCNet, Wenzek et al.
2020, scores Common Crawl with a Wikipedia KenLM and buckets by
perplexity tertile).  kgkit's twin keeps the same shape with a
deterministic interpolated bigram model:

  * ``train_bigram_lm`` — add-k-smoothed unigram + bigram log2-probs
    from a seed corpus (driver-side counts: the MODEL is small; the
    corpus being scored is the big side);
  * ``lm_score`` — per-document mean negative log2 probability
    (= log2-perplexity) under interpolated backoff
    ``p(w|a) = λ·p_bi(w|a) + (1-λ)·p_uni(w)``, evaluated RELATIONALLY:
    docs explode to (prev, w) pairs, the bigram/unigram tables
    broadcast-join in (they are vocab-sized), and one groupBy averages —
    no python in the scoring path, so 100 TB scores at scan speed;
  * ``perplexity_buckets`` — the CCNet head/middle/tail split by score
    quantile, the mixture key ``sampling.mixture_sample`` consumes.

A pure-python scorer twin backs the differential tests; the Spark path
must match it to float tolerance on every document.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LAMBDA = 0.7          # bigram weight in the interpolation
OOV_LOG2P = -20.0     # floor for words outside the LM vocabulary


def train_bigram_lm(texts: Sequence[str], k: float = 0.5
                    ) -> Dict[str, Dict]:
    """Seed-corpus counts -> {'uni': {w: log2 p}, 'bi': {(a,w): log2 p},
    'vocab_size': V}.  Add-k smoothing; deterministic (no RNG, plain
    dict arithmetic).  Words are whitespace tokens lowercased — the
    same normalization the scorer applies."""
    from collections import Counter

    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in texts:
        ws = [w.lower() for w in t.split(" ") if w]
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    V = len(uni)
    total = sum(uni.values())
    uni_p = {
        w: math.log2((c + k) / (total + k * V)) for w, c in uni.items()
    }
    bi_p = {
        (a, w): math.log2((c + k) / (uni[a] + k * V))
        for (a, w), c in bi.items()
    }
    return {"uni": uni_p, "bi": bi_p, "vocab_size": V}


def score_text_py(text: str, lm: Dict[str, Dict]) -> float:
    """Pure-python twin of the relational scorer (the differential
    oracle): mean -log2 p over positions 1..n-1 (first word has no
    context; empty/1-word docs score the OOV floor)."""
    ws = [w.lower() for w in text.split(" ") if w]
    if len(ws) < 2:
        return -OOV_LOG2P
    logs = []
    for a, w in zip(ws, ws[1:]):
        p_bi = 2.0 ** lm["bi"][(a, w)] if (a, w) in lm["bi"] else 0.0
        p_uni = 2.0 ** lm["uni"][w] if w in lm["uni"] else 2.0 ** OOV_LOG2P
        logs.append(-math.log2(LAMBDA * p_bi + (1 - LAMBDA) * p_uni))
    return sum(logs) / len(logs)


def _lm_tables(spark: SparkSession, lm: Dict[str, Dict]
               ) -> Tuple[DataFrame, DataFrame]:
    uni = spark.createDataFrame(
        [(w, p) for w, p in sorted(lm["uni"].items())], "w string, lp_uni double"
    )
    bi = spark.createDataFrame(
        [(a, w, p) for (a, w), p in sorted(lm["bi"].items())],
        "prev string, w string, lp_bi double",
    )
    return uni, bi


def lm_score(docs: DataFrame, lm: Dict[str, Dict]) -> DataFrame:
    """(doc_id, lm_log2ppl) — mean -log2 p(w|prev) per document.

    Plan: one generator expression builds the (prev, w) pair stream,
    two BROADCAST joins attach the (vocab-sized) probability tables,
    one groupBy(doc_id) averages — the corpus never shuffles except on
    doc_id for the final mean, and AQE coalesces that."""
    spark = docs.sparkSession
    uni, bi = _lm_tables(spark, lm)
    pairs = (
        docs.selectExpr(
            "doc_id",
            "filter(split(lower(text), ' '), x -> x != '') as _ws",
        )
        .selectExpr(
            "doc_id",
            # zip the word stream with itself shifted by one; docs with
            # fewer than 2 words yield no pairs (explode_outer keeps the
            # doc as a null row so the final avg coalesces to the floor)
            "case when size(_ws) < 2 "
            "then cast(array() as array<struct<prev:string,w:string>>) "
            "else zip_with(slice(_ws, 1, size(_ws) - 1), "
            "              slice(_ws, 2, size(_ws) - 1), "
            "              (a, b) -> named_struct('prev', a, 'w', b)) "
            "end as ps",
        )
        .select("doc_id", F.explode_outer("ps").alias("p"))
        .select("doc_id", F.col("p.prev").alias("prev"), F.col("p.w").alias("w"))
    )
    scored = (
        pairs.join(F.broadcast(bi), ["prev", "w"], "left")
        .join(F.broadcast(uni), ["w"], "left")
        .select(
            "doc_id",
            # the explode_outer null row (a doc with < 2 words) must
            # stay NULL so the avg sees no values and coalesces to the
            # floor — scoring it would charge the doc an OOV bigram
            F.when(
                F.col("w").isNotNull(),
                -F.log2(
                    F.lit(LAMBDA)
                    * F.coalesce(F.pow(F.lit(2.0), F.col("lp_bi")), F.lit(0.0))
                    + F.lit(1 - LAMBDA)
                    * F.coalesce(F.pow(F.lit(2.0), F.col("lp_uni")),
                                 F.pow(F.lit(2.0), F.lit(OOV_LOG2P)))
                ),
            ).alias("nl"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.coalesce(F.avg("nl"), F.lit(-OOV_LOG2P)).alias("lm_log2ppl")
    )


def perplexity_buckets(scores: DataFrame, quantiles=(1 / 3, 2 / 3)
                       ) -> DataFrame:
    """CCNet head/middle/tail: bucket by score quantile (lower = more
    fluent).  Quantile cutoffs come from approxQuantile on the SCORE
    column (two doubles to the driver — not a collect of data)."""
    lo, hi = scores.approxQuantile("lm_log2ppl", list(quantiles), 0.001)
    return scores.withColumn(
        "ppl_bucket",
        F.when(F.col("lm_log2ppl") <= lo, "head")
        .when(F.col("lm_log2ppl") <= hi, "middle")
        .otherwise("tail"),
    )
