"""Learned WordPiece vocabulary: realistic '##'-split density and
[UNK] behavior through the full pipeline (the default closed vocab
keeps corpus words whole-piece, so these paths needed a vocab with
real morphology — learned here from the repo's own prose)."""

from __future__ import annotations

import pytest

from kgkit.ner_core.wordpiece import (
    UNK,
    WordPieceTokenizer,
    train_wordpiece_vocab,
)

SWEDISH = [
    "arbetsförmedlingen ai-center finns i stockholm",
    "på skidspår kan du hitta spår",
    "det här är ett test i sverige",
]


def _training_texts():
    # SURVEY.md is the largest morphology-rich prose in the repo;
    # BASELINE.md serves as held-out text below
    with open("/root/repo/SURVEY.md", encoding="utf-8") as f:
        prose = f.read()
    return [prose] + SWEDISH


@pytest.fixture(scope="module")
def learned():
    vocab = train_wordpiece_vocab(_training_texts(), vocab_size=1500)
    return WordPieceTokenizer(vocab=vocab)


class TestLearnedVocab:
    def test_deterministic(self):
        a = train_wordpiece_vocab(SWEDISH, vocab_size=80)
        b = train_wordpiece_vocab(SWEDISH, vocab_size=80)
        assert a == b

    def test_produces_multi_piece_words(self, learned):
        """Realistic density: a good share of held-out prose words
        split into >= 2 pieces with '##' continuations, and almost
        none fall back to [UNK] (character coverage)."""
        with open("/root/repo/BASELINE.md", encoding="utf-8") as f:
            heldout = f.read().lower().split()
        words = [w for w in heldout if w.isalpha()][:2000]
        pieces = [learned.tokenize_word(w) for w in words]
        multi = sum(1 for p in pieces if len(p) >= 2 and p != [UNK])
        unk = sum(1 for p in pieces if p == [UNK])
        assert multi / len(words) > 0.2, multi / len(words)
        assert unk / len(words) < 0.02, unk / len(words)
        assert any(p2.startswith("##") for p in pieces for p2 in p[1:])

    def test_roundtrip_detokenization(self, learned):
        for w in ("förmedlingen", "deterministic", "skidspår", "pipeline"):
            pieces = learned.tokenize_word(w)
            if pieces == [UNK]:
                continue
            joined = pieces[0] + "".join(p[2:] for p in pieces[1:])
            assert joined == w, (w, pieces)

    def test_full_pipeline_byte_identity_with_learned_vocab(self, learned):
        """The whole predict lifecycle over a morphology-rich vocab:
        multi-piece words merge back and surfaces stay byte-identical,
        including non-ASCII (å/ä/ö are IN this vocab — unlike the
        default ASCII vocab, these words exercise real subword merges
        rather than the [UNK] path)."""
        from kgkit.ner_core import predict

        for text in SWEDISH:
            recs = predict([text], level="word", tokenizer=learned)[0]
            for r in recs:
                assert text[int(r["char_start"]):int(r["char_end"])] == r["token"]

    def test_unk_only_for_uncovered_characters(self, learned):
        assert learned.tokenize_word("数据库") == [UNK]  # chars unseen
        assert learned.tokenize_word("stockholm") != [UNK]
