"""Differential tests: kgkit.ner_core vs the REFERENCE's own code.

Loads the reference's pure tag-algebra modules (tags.py, token_tags.py —
numpy/stdlib only) straight from /root/reference via importlib, bypassing
the package __init__ (which needs mlflow/torch, absent here), and fuzzes
our ports against them on thousands of seeded random sequences.  This is
the strongest parity evidence available without torch: the exact code
paths the reference's Model.predict post-processing calls
(api/model.py:527-544) are compared output-for-output.
"""

from __future__ import annotations

import importlib.util
import os
import random
import sys
import types

import pytest

REF_TAGS = "/root/reference/nerblackbox/modules/ner_training/annotation_tags"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_TAGS), reason="reference unavailable"
)


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    """Reference Tags/TokenTags, loaded without the heavy package init."""
    tags_mod = _load("ref_tags_mod", f"{REF_TAGS}/tags.py")
    # register the module under its package name so token_tags.py's
    # absolute import resolves to it
    for pkg in [
        "nerblackbox",
        "nerblackbox.modules",
        "nerblackbox.modules.ner_training",
        "nerblackbox.modules.ner_training.annotation_tags",
    ]:
        sys.modules.setdefault(pkg, types.ModuleType(pkg))
    sys.modules["nerblackbox.modules.ner_training.annotation_tags.tags"] = tags_mod
    tt_mod = _load("ref_token_tags_mod", f"{REF_TAGS}/token_tags.py")
    return types.SimpleNamespace(Tags=tags_mod.Tags, TokenTags=tt_mod.TokenTags)


CLASSES = ["PER", "ORG", "LOC"]


def _random_tags(rng: random.Random, scheme: str, n: int):
    prefixes = {"plain": [""], "bio": ["B-", "I-"], "bilou": ["B-", "I-", "L-", "U-"]}
    out = []
    for _ in range(n):
        if rng.random() < 0.4:
            out.append("O")
        else:
            p = rng.choice(prefixes[scheme])
            out.append(f"{p}{rng.choice(CLASSES)}")
    return out


def _random_valid_bio(rng: random.Random, n: int):
    """Well-formed BIO (for conversions that assert consistency)."""
    out = []
    i = 0
    while i < n:
        if rng.random() < 0.5:
            out.append("O")
            i += 1
        else:
            c = rng.choice(CLASSES)
            ln = min(rng.randint(1, 3), n - i)
            out.append(f"B-{c}")
            out.extend(f"I-{c}" for _ in range(ln - 1))
            i += ln
    return out


class TestSchemeConversionDifferential:
    @pytest.mark.parametrize("source,target", [
        ("plain", "bio"), ("plain", "bilou"), ("bio", "plain"),
        ("bilou", "plain"), ("bilou", "bio"), ("bio", "bilou"),
    ])
    def test_fuzz_conversions(self, ref, source, target):
        from kgkit.ner_core import convert_scheme

        rng = random.Random(1234)
        for trial in range(400):
            n = rng.randint(0, 12)
            if source == "plain":
                tags = _random_tags(rng, "plain", n)
            elif source == "bio":
                tags = _random_valid_bio(rng, n)
            else:
                # valid bilou via reference's own plain2bilou
                tags = ref.Tags(_random_tags(rng, "plain", n)).convert_scheme(
                    "plain", "bilou"
                )
            want = ref.Tags(tags).convert_scheme(source, target)
            got = convert_scheme(tags, source, target)
            assert got == want, f"{source}->{target} trial {trial}: {tags}"

    @pytest.mark.parametrize("scheme", ["bio", "bilou"])
    def test_fuzz_asr(self, ref, scheme):
        """restore_annotation_scheme_consistency == fix_scheme, including
        the abidance fraction, on arbitrary (possibly invalid) input."""
        from kgkit.ner_core import fix_scheme

        rng = random.Random(99)
        for trial in range(600):
            tags = _random_tags(rng, scheme, rng.randint(0, 12))
            want_tags, want_ab = ref.Tags(tags).restore_annotation_scheme_consistency(
                scheme=scheme
            )
            got_tags, got_ab = fix_scheme(tags, scheme)
            assert got_tags == want_tags, f"{scheme} trial {trial}: {tags}"
            if want_ab == want_ab:  # reference yields nan (np.mean of [])
                assert got_ab == pytest.approx(want_ab), f"abidance {tags}"
            else:  # deliberate divergence: we define empty -> 1.0
                assert got_ab == 1.0


def _records(rng: random.Random, text_words, scheme="bio"):
    """Word-level records with char offsets into a reconstructed text."""
    recs, pos = [], 0
    tags = _random_valid_bio(rng, len(text_words))
    for w, t in zip(text_words, tags):
        recs.append({
            "char_start": str(pos), "char_end": str(pos + len(w)),
            "token": w, "tag": t,
        })
        pos += len(w) + 1
    text = " ".join(text_words)
    return recs, text


class TestTokenTagsDifferential:
    WORDS = ["spark", "runs", "fast", "joins", "tables", "a", "big", "scan"]

    def test_fuzz_merge_tokens_to_entities(self, ref):
        from kgkit.ner_core import merge_tokens_to_entities

        rng = random.Random(7)
        for trial in range(400):
            n = rng.randint(1, 8)
            words = [rng.choice(self.WORDS) for _ in range(n)]
            recs, text = _records(rng, words)
            tt = ref.TokenTags(
                [dict(r) for r in recs], scheme="bio", level="word"
            )
            tt.merge_tokens_to_entities(original_text=text, verbose=False)
            want = tt.as_list()
            got = merge_tokens_to_entities([dict(r) for r in recs], "bio", text)
            assert got == want, f"trial {trial}: {recs}"

    def test_fuzz_merge_tokens_to_words(self, ref):
        from kgkit.ner_core import merge_tokens_to_words

        rng = random.Random(21)
        for trial in range(400):
            # subword-ish records: adjacent records sometimes touch
            # (char_start == prev char_end) and then merge
            recs, pos = [], 0
            for _ in range(rng.randint(1, 8)):
                w = rng.choice(self.WORDS)
                touch = recs and rng.random() < 0.5
                start = pos if touch else pos + 1
                recs.append({
                    "char_start": str(start), "char_end": str(start + len(w)),
                    "token": w,
                    "tag": rng.choice(["O", "B-PER", "I-PER", "B-ORG"]),
                })
                pos = start + len(w)
            tt = ref.TokenTags([dict(r) for r in recs], scheme="bio", level="token")
            tt.merge_tokens_to_words()
            want = tt.as_list()
            got = merge_tokens_to_words([dict(r) for r in recs])
            assert got == want, f"trial {trial}: {recs}"

    def test_fuzz_unpretokenize(self, ref):
        from kgkit.ner_core import unpretokenize

        rng = random.Random(5)
        for _ in range(200):
            n = rng.randint(1, 6)
            words = [rng.choice(self.WORDS) for _ in range(n)]
            recs, _ = _records(rng, words)
            # pretokenization offsets: shifted spans in the original raw text
            offsets, base = [], 0
            for w in words:
                base += rng.randint(0, 2)
                offsets.append((base, base + len(w)))
                base += len(w)
            tt = ref.TokenTags([dict(r) for r in recs], scheme="bio", level="word")
            tt.unpretokenize(list(offsets))
            want = tt.as_list()
            got = unpretokenize([dict(r) for r in recs], list(offsets))
            assert got == want


class TestSentencePieceDifferential:
    """Ġ-convention paths vs the reference's own code."""

    def test_fuzz_strip_marker_vs_correct_sentence_piece_tokens(self, ref):
        """W7: our strip_sentencepiece_marker == the reference's
        TokenTags.correct_sentence_piece_tokens on random records with
        and without Ġ markers (token_tags.py:334-352)."""
        from kgkit.ner_core import strip_sentencepiece_marker

        rng = random.Random(99)
        words = ["Ġspark", "spark", "Ġjoin", "scan", "Ġtables", "a"]
        for trial in range(400):
            recs, pos = [], 0
            for _ in range(rng.randint(1, 8)):
                w = rng.choice(words)
                recs.append({
                    "char_start": str(pos), "char_end": str(pos + len(w)),
                    "token": w,
                    "tag": rng.choice(["O", "B-ORG", "I-ORG"]),
                })
                pos += len(w) + 1
            tt = ref.TokenTags([dict(r) for r in recs], scheme="bio", level="token")
            tt.correct_sentence_piece_tokens()
            want = tt.as_list()
            got = strip_sentencepiece_marker([dict(r) for r in recs])
            assert got == want, f"trial {trial}: {recs}"

    def test_fuzz_sp_pipeline_equals_wordpiece(self):
        """End-to-end: the Ġ-convention tokenizer twin must extract
        byte-identical records to the WordPiece run on random texts
        mixing vocabulary words, OOV ASCII, CJK and emoji — the same
        invariance the kg_mentions_sp oracle checks corpus-wide."""
        from kgkit.ner_core.pipeline import predict
        from kgkit.ner_core.wordpiece import default_sp_tokenizer

        rng = random.Random(4242)
        pool = ["spark", "hash", "join", "customer", "zzqx", "naïve",
                "日本", "🎉", "table", "scan", "x" * 30, "a-b.c"]
        texts = [
            " ".join(rng.choice(pool) for _ in range(rng.randint(1, 12)))
            for _ in range(120)
        ]
        wp = predict(texts, level="entity", autocorrect=True)
        sp = predict(texts, level="entity", autocorrect=True,
                     tokenizer=default_sp_tokenizer())
        assert wp == sp
        for t, recs in zip(texts, sp):
            for r in recs:
                assert t[int(r["char_start"]):int(r["char_end"])] == r["token"]
