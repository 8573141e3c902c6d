"""Gopher-style quality rules, repetition signals, PII scrub — crafted
fixtures that FIRE each signal (the synthetic corpus is single-line
PII-free word soup, so the sf-dir oracle checks alone would leave the
bullet/ellipsis/symbol/PII branches untested)."""

from __future__ import annotations

import hashlib

import pytest

from kgkit.operators.text_quality import (
    EMAIL_RE,
    gopher_quality,
    pii_scrub,
    plant_pii,
    top_ngram_stats,
)

GOOD = ("the data table holds a key value row for every batch and "
        "that scan merges with the sort order of the stream column "
        "group so that every filter has a fast hash join path here")


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestGopherQuality:
    def test_good_doc_kept(self, spark):
        row = gopher_quality(_docs(spark, [GOOD])).collect()[0]
        assert row["keep"] == 1
        assert row["n_stopwords"] >= 2
        assert row["frac_alpha_words"] == 1.0
        assert 3.0 <= row["mean_word_len"] <= 10.0

    def test_short_doc_dropped(self, spark):
        row = gopher_quality(_docs(spark, ["too short to keep"])).collect()[0]
        assert row["keep"] == 0 and row["n_words"] == 4

    def test_symbol_heavy_dropped(self, spark):
        text = GOOD + " " + "# " * 10
        row = gopher_quality(_docs(spark, [text.strip()])).collect()[0]
        assert row["symbol_ratio"] > 0.1 and row["keep"] == 0

    def test_bullet_and_ellipsis_lines(self, spark):
        text = "\n".join(["- item one", "* item two", "plain line",
                          "trailing thought..."])
        row = gopher_quality(_docs(spark, [text])).collect()[0]
        assert row["frac_bullet_lines"] == 0.5
        assert row["frac_ellipsis_lines"] == 0.25

    def test_non_alpha_words_dropped(self, spark):
        text = " ".join(["1234"] * 40)
        row = gopher_quality(_docs(spark, [text])).collect()[0]
        assert row["frac_alpha_words"] == 0.0 and row["keep"] == 0


class TestTopNgramStats:
    def test_repeated_bigram_wins(self, spark):
        # "a b" occurs 3x among 5 bigrams; char frac = 3*3 / len(text)
        text = "a b a b a b"
        row = top_ngram_stats(_docs(spark, [text]), n=2).collect()[0]
        assert row["top_ngram"] == "a b"
        assert row["top_ngram_n"] == 3
        assert row["top_ngram_char_frac"] == pytest.approx(9 / 11, abs=1e-6)

    def test_tie_breaks_to_larger_ngram(self, spark):
        # every bigram unique -> all cnt 1 -> deterministic winner is the
        # lexicographically LARGEST ngram (DESC tie order, both engines)
        row = top_ngram_stats(_docs(spark, ["x a z b y c"]), n=2).collect()[0]
        assert row["top_ngram_n"] == 1
        assert row["top_ngram"] == "z b"

    def test_single_word_doc_emits_nothing(self, spark):
        assert top_ngram_stats(_docs(spark, ["lonely"]), n=2).count() == 0


class TestPiiScrub:
    def test_counts_and_scrub(self, spark):
        text = ("write to alice.b+tag@sub.example.co.uk or call 555-0142 "
                "from 192.168.1.10 please")
        row = pii_scrub(_docs(spark, [text])).collect()[0]
        assert (row["n_emails"], row["n_ipv4"], row["n_phones"]) == (1, 1, 1)
        expected = ("write to <EMAIL> or call <PHONE> from <IP> please")
        assert row["scrubbed_hash"] == hashlib.md5(
            expected.encode()).hexdigest()

    def test_clean_text_untouched(self, spark):
        row = pii_scrub(_docs(spark, [GOOD])).collect()[0]
        assert (row["n_emails"], row["n_ipv4"], row["n_phones"]) == (0, 0, 0)
        assert row["scrubbed_hash"] == hashlib.md5(GOOD.encode()).hexdigest()

    def test_plant_pii_deterministic(self, spark):
        planted = plant_pii(
            _docs(spark, ["base"] * 15)
        ).orderBy("doc_id").collect()
        assert "user0@example.com" in planted[0]["text"]
        assert "10.0.0.1" in planted[0]["text"]  # doc 0: 7|0, 11|0, 13|0
        assert "555-0142" in planted[0]["text"]
        assert planted[1]["text"] == "base"
        assert planted[7]["text"].endswith("user7@example.com")
        assert planted[11]["text"].endswith("10.11.0.1")
        assert planted[13]["text"].endswith("call 555-0142")


class TestBpeTokenStats:
    def test_segmentation(self, spark):
        from kgkit.operators.text_quality import bpe_token_stats

        # "Alice" "'s" " 42" " cats" "!" -> 5 tokens, all distinct
        text = "Alice's 42 cats!"
        row = bpe_token_stats(_docs(spark, [text])).collect()[0]
        assert row["n_bpe_tokens"] == 5
        assert row["n_distinct_bpe"] == 5
        assert row["chars_per_token"] == pytest.approx(len(text) / 5, abs=1e-6)

    def test_empty_text_null_ratio(self, spark):
        from kgkit.operators.text_quality import bpe_token_stats

        row = bpe_token_stats(_docs(spark, [""])).collect()[0]
        assert row["n_bpe_tokens"] == 0 and row["chars_per_token"] is None
