"""Property-based tests (hypothesis) for the parity-critical invariants.

The north rule's byte-identity requirement must hold on ARBITRARY text,
not just fixtures: for any input, every record predict() emits satisfies
``text[char_start:char_end] == token`` (word level covers the whole
text's non-space content; entity surfaces are exact slices)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from kgkit.ner_core import predict
from kgkit.ner_core.schemes import convert_scheme, fix_scheme

# text alphabet mixes ascii words, gazetteer aliases, CJK, punctuation,
# emoji and runs of whitespace — the restore_unknown_tokens hot paths
_tokens = st.sampled_from([
    "spark", "join", "hash", "merge", "table", "scan", "the", "a",
    "x", "yz", "Q5", "1.5", "...", "(", ")", ",", "!",
    "懿貴妃", "동대", "í", "ü", "✓", "\U0001F600",
])
_texts = st.lists(_tokens, min_size=0, max_size=12).map(" ".join)


class TestByteIdentityProperty:
    @settings(max_examples=200, deadline=None)
    @given(_texts)
    def test_word_level_offsets_slice_back(self, text):
        [records] = predict(text, level="word")
        for r in records:
            cs, ce = int(r["char_start"]), int(r["char_end"])
            assert text[cs:ce] == r["token"], (text, r)

    @settings(max_examples=200, deadline=None)
    @given(_texts)
    def test_entity_level_offsets_slice_back(self, text):
        [records] = predict(text, level="entity", autocorrect=True)
        for r in records:
            cs, ce = int(r["char_start"]), int(r["char_end"])
            assert text[cs:ce] == r["token"], (text, r)

    @settings(max_examples=200, deadline=None)
    @given(_texts)
    def test_word_level_partitions_nonspace_text(self, text):
        """Word records are ordered, non-overlapping, and cover every
        non-space character exactly once (punctuation splits into its
        own records, like the reference's HF pre-tokenizer)."""
        [records] = predict(text, level="word")
        covered = []
        prev_end = -1
        for r in records:
            cs, ce = int(r["char_start"]), int(r["char_end"])
            assert cs >= prev_end, (text, records)
            prev_end = ce
            covered.extend(range(cs, ce))
        nonspace = [i for i, ch in enumerate(text) if not ch.isspace()]
        assert covered == nonspace, (text, records)


_plain = st.lists(
    st.sampled_from(["O", "PER", "ORG"]), min_size=0, max_size=10
)


class TestSchemeProperties:
    @settings(max_examples=300, deadline=None)
    @given(_plain)
    def test_plain_bio_roundtrip(self, tags):
        assert convert_scheme(
            convert_scheme(tags, "plain", "bio"), "bio", "plain"
        ) == list(tags)

    @settings(max_examples=300, deadline=None)
    @given(_plain)
    def test_plain_bilou_roundtrip(self, tags):
        assert convert_scheme(
            convert_scheme(tags, "plain", "bilou"), "bilou", "plain"
        ) == list(tags)

    @settings(max_examples=300, deadline=None)
    @given(_plain)
    def test_fix_scheme_idempotent_on_valid(self, tags):
        bio = convert_scheme(tags, "plain", "bio")
        fixed, abidance = fix_scheme(bio, "bio")
        assert fixed == bio and abidance == 1.0
        bilou = convert_scheme(tags, "plain", "bilou")
        fixed, abidance = fix_scheme(bilou, "bilou")
        assert fixed == bilou and abidance == 1.0
