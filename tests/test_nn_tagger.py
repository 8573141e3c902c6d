"""NumpyTagger (M1/M2/M3): real tensor-math inference path.

Golden tests pin the logits -> argmax -> softmax numerics; differential
tests prove the model is an exact distillation of the gazetteer (same
tags on every input), which is what keeps the downstream span pipeline
and the DuckDB oracles valid for this model.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from kgkit.ner_core.nn_tagger import NumpyTagger, default_numpy_tagger
from kgkit.ner_core.tagger import GazetteerTagger
from kgkit.ner_core.wordpiece import CLS, PAD, SEP, default_tokenizer

SLICE = [CLS, "the", "spark", "hash", "join", SEP, PAD]


@pytest.fixture(scope="module")
def model():
    return default_numpy_tagger()


class TestForward:
    def test_logits_shape_contract(self, model):
        """[n_slices, seq_length, num_labels] — api/model.py:472-475."""
        logits = model.forward([SLICE, SLICE[:4]])
        assert logits.shape == (2, len(SLICE), len(model.annotation_classes))
        assert logits.dtype == np.float32

    def test_golden_logits(self, model):
        """Exact margins: O bias 2; spark B-TECH 4; hash B-OP 8 (bigram
        start); join I-OP 6 + B-OP 4 (continuation + single alias)."""
        lab = model.label2id
        z = model.forward([SLICE])[0]

        def row(pos):
            return {c: float(z[pos, i]) for c, i in lab.items() if z[pos, i] != 0}

        assert row(0) == {"O": 2.0}            # [CLS]: bias only
        assert row(1) == {"O": 2.0}            # 'the'
        assert row(2) == {"O": 2.0, "B-TECH": 4.0}
        assert row(3) == {"O": 2.0, "B-OP": 8.0}
        assert row(4) == {"O": 2.0, "B-OP": 4.0, "I-OP": 6.0}
        assert row(5) == {"O": 2.0}            # [SEP]
        assert row(6) == {"O": 2.0}            # [PAD]

    def test_noise_subspace_carries_no_weight(self, model):
        """Out-of-dictionary embeddings live where W is zero — the
        exactness precondition."""
        lo = model._noise_lo
        assert np.all(model.W[lo:32] == 0)
        assert np.all(model.W[32 + lo:64] == 0)
        assert np.all(model.W[64 + lo:] == 0)
        v = model._embed("zzz-unknown-token")
        assert np.all(v[:lo] == 0) and abs(np.linalg.norm(v) - 1.0) < 1e-6

    def test_embedding_deterministic(self):
        a, b = NumpyTagger(), NumpyTagger()
        assert np.allclose(a._embed("whatever"), b._embed("whatever"))


class TestDecode:
    def test_argmax_decode(self, model):
        tags = model.tag_slice(SLICE)
        assert tags == ["O", "O", "B-TECH", "B-OP", "I-OP", "O", "O"]

    def test_softmax_golden(self, model):
        """Pin one softmax value end-to-end: P(I-OP) at 'join' =
        e^6 / (e^6 + e^4 + e^2 + 4*e^0)."""
        probas = model.tag_slice_proba(SLICE)
        den = math.exp(6) + math.exp(4) + math.exp(2) + 4.0
        assert probas[4]["I-OP"] == pytest.approx(math.exp(6) / den, rel=1e-12)
        assert sum(probas[4].values()) == pytest.approx(1.0, abs=1e-12)

    def test_proba_argmax_consistent(self, model):
        probas = model.tag_slice_proba(SLICE)
        tags = model.tag_slice(SLICE)
        for dist, tag in zip(probas, tags):
            assert max(dist, key=dist.get) == tag

    def test_annotation_classes_order(self, model):
        assert model.annotation_classes == GazetteerTagger().annotation_classes
        assert model.id2label[0] == "O"


class TestDifferential:
    """The distillation claim: identical tags on every input."""

    WORDS = ["hash", "join", "table", "scan", "sort", "merge", "spark",
             "stream", "vector", "customer", "the", "a", "data", "big",
             "query", "row"]

    def test_matches_gazetteer_on_generated_corpus(self, model):
        tok = default_tokenizer()
        gaz = GazetteerTagger()
        n = len(self.WORDS)
        for doc in range(200):
            words = [self.WORDS[(doc * 31 + j * 17 + j * j) % n]
                     for j in range(1 + doc % 40)]
            for s in tok.encode_words(words):
                assert model.tag_slice(s) == gaz.tag_slice(s), words

    def test_pipeline_end_to_end_equal(self, model):
        from kgkit.ner_core import predict

        texts = ["the spark hash join", "sort merge join customer",
                 "stream vector table scan big data", "join join join",
                 "hash hash join merge", "sort sort merge"]
        got = predict(texts, level="entity", autocorrect=True, tagger=model)
        want = predict(texts, level="entity", autocorrect=True)
        assert got == want

    def test_overlap_guard(self):
        with pytest.raises(ValueError, match="overlap"):
            NumpyTagger({("a", "b"): "X", ("b", "c"): "X"})


class TestCheckpoint:
    """S7: on-disk checkpoint save/load with executor-local memoization."""

    def test_save_load_roundtrip(self, model, tmp_path):
        path = str(tmp_path / "tagger.npz")
        model.save(path)
        loaded = NumpyTagger.load(path)
        assert np.array_equal(loaded.W, model.W)
        assert np.array_equal(loaded.b, model.b)
        assert loaded.annotation_classes == model.annotation_classes
        assert loaded.tag_slice(SLICE) == model.tag_slice(SLICE)

    def test_corrupted_checkpoint_fails_loudly(self, model, tmp_path):
        path = str(tmp_path / "bad.npz")
        model.save(path)
        data = dict(np.load(path))
        data["W"] = data["W"] + 1.0
        np.savez(path, **data)
        with pytest.raises(ValueError, match="does not match"):
            NumpyTagger.load(path)

    def test_spark_pipeline_from_checkpoint(self, model, tmp_path, spark):
        """detect_mentions(model='ckpt:...') must equal the in-memory
        model end-to-end."""
        from kgkit.operators.mentions import detect_mentions
        from kgkit.sources.pages import load_pages, pages_for_mentions

        path = str(tmp_path / "tagger.npz")
        model.save(path)
        pages = pages_for_mentions(load_pages(spark, "/root/testdata/sf0.001"))
        a = sorted(map(tuple, detect_mentions(pages, model=f"ckpt:{path}").collect()))
        b = sorted(map(tuple, detect_mentions(pages, model="numpy").collect()))
        assert a == b and len(a) > 0
