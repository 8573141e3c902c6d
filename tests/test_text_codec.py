"""P9 text codec: differential against the reference's TextEncoder."""

from __future__ import annotations

import importlib.util
import os
import random
import sys

import pytest

from kgkit.ner_core.text_codec import TextCodec

REF = ("/root/reference/nerblackbox/modules/ner_training/"
       "data_preprocessing/text_encoder.py")


@pytest.fixture(scope="module")
def ref_codec():
    if not os.path.isfile(REF):
        pytest.skip("reference unavailable")
    spec = importlib.util.spec_from_file_location("ref_text_encoder", REF)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_text_encoder"] = mod
    spec.loader.exec_module(mod)
    return mod.TextEncoder


ENCODING = {"\n": "[NEWLINE]", "\t": "[TAB]"}
TOKENS = ["[NEWLINE]", "[TAB]"]


class TestTextCodec:
    def test_docstring_example(self):
        codec = TextCodec(ENCODING, TOKENS)
        enc, maps = codec.encode(["an\n example"])
        assert enc == ["an[NEWLINE] example"]
        assert maps == [[(2, "\n", "[NEWLINE]")]]
        texts, preds = codec.decode(
            enc, maps,
            [[{"char_start": "12", "char_end": "19", "token": "example",
               "tag": "TAG"}]],
        )
        assert texts == ["an\n example"]
        assert preds == [[{"char_start": "4", "char_end": "11",
                           "token": "example", "tag": "TAG"}]]

    def test_fuzz_encode_matches_reference(self, ref_codec):
        ref = ref_codec(ENCODING, TOKENS)
        ours = TextCodec(ENCODING, TOKENS)
        rng = random.Random(31)
        chars = list("ab \n\t")
        for _ in range(300):
            text = "".join(rng.choice(chars) for _ in range(rng.randint(0, 20)))
            want_enc, want_maps = ref.encode([text])
            got_enc, got_maps = ours.encode([text])
            assert got_enc == want_enc and got_maps == want_maps, repr(text)

    def test_fuzz_decode_matches_reference(self, ref_codec):
        ref = ref_codec(ENCODING, TOKENS)
        ours = TextCodec(ENCODING, TOKENS)
        rng = random.Random(77)
        chars = list("xy \n\t")
        for _ in range(300):
            text = "".join(rng.choice(chars) for _ in range(rng.randint(0, 16)))
            enc, maps = ours.encode([text])
            # predictions over random whitespace-free spans of the encoded text
            preds = []
            e = enc[0]
            i = 0
            while i < len(e):
                j = rng.randint(i, min(i + 5, len(e)))
                if j > i and rng.random() < 0.6:
                    preds.append({
                        "char_start": str(i), "char_end": str(j),
                        "token": e[i:j], "tag": "T",
                    })
                i = j + 1
            want_t, want_p = ref.decode([e], maps, [[dict(p) for p in preds]])
            got_t, got_p = ours.decode([e], maps, [[dict(p) for p in preds]])
            assert got_t == want_t and got_p == want_p, repr(text)
            assert got_t[0] == text  # roundtrip
