"""End-to-end tests for kgkit.ner_core.predict — the reference lifecycle
(nerblackbox/api/model.py:309-544) with the deterministic tokenizer+tagger.

Checks the parity-critical invariants of the north rule:
  * entity surfaces are byte-identical slices of the original text
  * char offsets are string-typed at the boundary (api/model.py:1507-1528)
  * word/entity levels and autocorrect behave like Model.predict
"""

import pytest

from kgkit.ner_core import predict
from kgkit.ner_core.wordpiece import WordPieceTokenizer


class TestPredict:
    def test_entity_level(self):
        text = "the spark table scan runs a hash join fast"
        [result] = predict(text, level="entity", autocorrect=True)
        got = [(r["token"], r["tag"]) for r in result]
        assert got == [("spark", "TECH"), ("table scan", "OP"), ("hash join", "OP")]
        for r in result:
            assert text[int(r["char_start"]): int(r["char_end"])] == r["token"]

    def test_word_level(self):
        text = "spark join"
        [result] = predict(text, level="word")
        assert result == [
            {"char_start": "0", "char_end": "5", "token": "spark", "tag": "B-TECH"},
            {"char_start": "6", "char_end": "10", "token": "join", "tag": "B-OP"},
        ]

    def test_bigram_beats_single(self):
        # 'join' alone is an entity, but 'hash join' wins greedy longest-match
        [result] = predict("hash join join", level="entity", autocorrect=True)
        assert [(r["token"], r["tag"]) for r in result] == [
            ("hash join", "OP"), ("join", "OP"),
        ]

    def test_all_string_values(self):
        [result] = predict("customer data stream", level="entity", autocorrect=True)
        for r in result:
            assert all(isinstance(v, str) for v in r.values())

    def test_empty_and_no_entity_text(self):
        assert predict("", level="entity") == [[]]
        assert predict("the big data value", level="entity") == [[]]

    def test_pretokenized_input(self):
        [result] = predict("spark data", level="word", is_pretokenized=True)
        assert [(r["token"], r["tag"]) for r in result] == [
            ("spark", "B-TECH"), ("data", "O"),
        ]

    def test_unknown_chars_restored(self):
        # non-ASCII word -> [UNK] in WordPiece -> restored with original surface
        text = "spark 懿貴妃 join"
        [result] = predict(text, level="word")
        assert [(r["token"], r["tag"]) for r in result] == [
            ("spark", "B-TECH"), ("懿貴妃", "O"), ("join", "B-OP"),
        ]
        for r in result:
            assert text[int(r["char_start"]): int(r["char_end"])] == r["token"]

    def test_punctuation_handling(self):
        text = "spark, join."
        [result] = predict(text, level="entity", autocorrect=True)
        assert [(r["token"], r["tag"]) for r in result] == [
            ("spark", "TECH"), ("join", "OP"),
        ]

    def test_multi_slice_document(self):
        # force overflow slicing with a tiny max_seq_length; entities away
        # from slice boundaries must still come out right
        tok = WordPieceTokenizer(max_seq_length=8)
        text = "the data spark row value batch join key"
        [result] = predict(text, level="entity", autocorrect=True, tokenizer=tok)
        got = [(r["token"], r["tag"]) for r in result]
        assert ("spark", "TECH") in got
        assert ("join", "OP") in got

    def test_batch_of_texts(self):
        results = predict(["spark here", "no entities here", "join there"],
                          level="entity", autocorrect=True)
        assert len(results) == 3
        assert [(r["token"], r["tag"]) for r in results[0]] == [("spark", "TECH")]
        assert results[1] == []
        assert [(r["token"], r["tag"]) for r in results[2]] == [("join", "OP")]


class TestPredictProba:
    """Model.predict_proba parity (api/model.py:369-400): word level,
    stringified proba dicts in 'tag' (assert_typing quirk)."""

    def test_offsets_match_word_level(self):
        from kgkit.ner_core.pipeline import predict_proba

        text = "the spark hash join runs"
        [words] = predict(text, level="word")
        [probas] = predict_proba(text)
        assert [(r["char_start"], r["char_end"], r["token"]) for r in words] == [
            (r["char_start"], r["char_end"], r["token"]) for r in probas
        ]

    def test_argmax_consistent_with_predict(self):
        import ast

        from kgkit.ner_core.pipeline import predict_proba

        text = "spark join value"
        [words] = predict(text, level="word")
        [probas] = predict_proba(text)
        for w, p in zip(words, probas):
            dist = ast.literal_eval(p["tag"])
            if isinstance(dist, dict):
                assert max(dist, key=dist.get) == w["tag"]
                assert sum(dist.values()) == pytest.approx(1.0, abs=1e-4)
            else:  # restored-span records carry plain 'O'
                assert p["tag"] == "O" == w["tag"]

    def test_unknown_token_restored_with_own_dist(self):
        # a re-anchored [UNK] keeps ITS prediction (the dict) — only
        # leftover inserted spans get plain 'O' (api/model.py:1261-1504)
        import ast

        from kgkit.ner_core.pipeline import predict_proba

        text = "spark 懿貴妃 join"
        [probas] = predict_proba(text)
        by_token = {r["token"]: r for r in probas}
        assert "懿貴妃" in by_token
        r = by_token["懿貴妃"]
        assert text[int(r["char_start"]):int(r["char_end"])] == "懿貴妃"
        dist = ast.literal_eval(r["tag"])
        assert max(dist, key=dist.get) == "O"

    def test_all_values_are_strings(self):
        from kgkit.ner_core.pipeline import predict_proba

        [probas] = predict_proba("customer stream")
        assert all(
            isinstance(v, str) for r in probas for v in r.values()
        )


class TestWordProbasMap:
    def test_map_equals_exploded(self, spark):
        """The MAP<string,double> production shape must carry exactly
        the distributions of the exploded oracle shape (same model,
        same rounding)."""
        from kgkit.operators.mentions import word_probas, word_probas_map
        from pyspark.sql import functions as F

        pages = spark.createDataFrame(
            [("doc://1", "spark hash join stream"),
             ("doc://2", "the customer sort merge table scan")],
            "url string, text string",
        )
        exploded = {
            (r["url"], r["pos"], r["cls"]): round(r["proba"], 6)
            for r in word_probas(pages, model="trained")
            .select("url", "pos", "cls", F.round("proba", 6).alias("proba"))
            .collect()
        }
        mapped = word_probas_map(pages, model="trained").collect()
        got = {
            (r["url"], r["pos"], c): v
            for r in mapped
            for c, v in r["probas"].items()
        }
        assert got == exploded
        # one row per WORD, not per word x class
        n_words = sum(len(t.split(" ")) for _, t in
                      [("", "spark hash join stream"),
                       ("", "the customer sort merge table scan")])
        assert len(mapped) == n_words
