"""Golden parity tests for kgkit.ner_core, ported from the reference suite.

Case sources (flxst/nerblackbox, read-only at /root/reference):
  * merge_slices            <- nerblackbox/tests/test_api_model.py:137-211
  * merge_subtokens         <- test_api_model.py:213-326
  * restore_unknown_tokens  <- test_api_model.py:329-991 (all 12 golden cases)
  * merge_tokens_to_entities<- nerblackbox/tests/test_token_tags.py:399-958
  * scheme conversions      <- nerblackbox/tests/test_tags.py semantics
  * predict() e2e           <- api/model.py:318-349 docstring examples
"""

import pytest

from kgkit.ner_core import (
    autocorrect_scheme,
    bilou_to_bio,
    convert_scheme,
    fix_bio_tag,
    fix_bilou_tag,
    fix_scheme,
    iob1_to_iob2,
    merge_slices,
    merge_subtokens,
    merge_tokens_to_entities,
    merge_tokens_to_words,
    plain_to_bio,
    plain_to_bilou,
    pretokenize,
    resolve_overlapping_tags,
    restore_unknown_tokens,
    to_plain,
    unpretokenize,
)


def rec(cs, ce, token, tag):
    return {"char_start": str(cs), "char_end": str(ce), "token": token, "tag": tag}


# ---------------------------------------------------------------------------
# scheme algebra
# ---------------------------------------------------------------------------

class TestSchemes:
    def test_plain_to_bio(self):
        assert plain_to_bio(["O", "ORG", "ORG", "O", "PER"]) == [
            "O", "B-ORG", "I-ORG", "O", "B-PER",
        ]
        assert plain_to_bio(["ORG", "PER"]) == ["B-ORG", "B-PER"]

    def test_plain_to_bilou(self):
        assert plain_to_bilou(["O", "ORG", "ORG", "O", "PER"]) == [
            "O", "B-ORG", "L-ORG", "O", "U-PER",
        ]
        assert plain_to_bilou(["ORG", "ORG", "ORG"]) == ["B-ORG", "I-ORG", "L-ORG"]

    def test_to_plain(self):
        assert to_plain(["O", "B-ORG", "I-ORG", "U-PER", "L-PER"]) == [
            "O", "ORG", "ORG", "PER", "PER",
        ]

    def test_bilou_to_bio(self):
        assert bilou_to_bio(["O", "B-ORG", "I-ORG", "L-ORG", "U-PER"]) == [
            "O", "B-ORG", "I-ORG", "I-ORG", "B-PER",
        ]

    def test_convert_roundtrip(self):
        plain = ["O", "ORG", "ORG", "O", "PER"]
        assert convert_scheme(convert_scheme(plain, "plain", "bio"), "bio", "plain") == plain
        assert convert_scheme(convert_scheme(plain, "plain", "bilou"), "bilou", "plain") == plain

    def test_convert_bio_to_bilou(self):
        assert convert_scheme(["O", "B-ORG", "I-ORG"], "bio", "bilou") == [
            "O", "B-ORG", "L-ORG",
        ]
        assert convert_scheme(["B-PER"], "bio", "bilou") == ["U-PER"]

    def test_convert_rejects_bad_scheme(self):
        with pytest.raises(ValueError):
            convert_scheme(["B-ORG"], "plain", "bio")

    # reference: tags.py:271-303
    @pytest.mark.parametrize(
        "current, previous, expected",
        [
            ("O", None, ("O", False)),
            ("B-ORG", "O", ("B-ORG", False)),
            ("I-ORG", None, ("B-ORG", True)),
            ("I-ORG", "O", ("B-ORG", True)),
            ("I-ORG", "B-PER", ("B-ORG", True)),
            ("I-ORG", "B-ORG", ("I-ORG", False)),
            ("I-ORG", "I-ORG", ("I-ORG", False)),
        ],
    )
    def test_fix_bio_tag(self, current, previous, expected):
        assert fix_bio_tag(current, previous) == expected

    # reference: tags.py:305-374 — note the fixpoint cascade I->L->B / B->U
    @pytest.mark.parametrize(
        "current, previous, subsequent, expected_tag",
        [
            ("O", None, None, "O"),
            ("U-ORG", "O", "O", "U-ORG"),
            ("I-ORG", "B-ORG", "I-ORG", "I-ORG"),
            ("I-ORG", "B-ORG", "L-ORG", "I-ORG"),
            ("I-ORG", "B-ORG", "O", "L-ORG"),    # rule 1
            ("I-ORG", "O", "I-ORG", "B-ORG"),    # rule 2
            ("I-ORG", "O", "O", "U-ORG"),        # rules 1+3+4 cascade
            ("L-ORG", "I-ORG", None, "L-ORG"),
            ("L-ORG", "O", None, "U-ORG"),       # rule 3 then rule 4 cascade
            ("B-ORG", None, "I-ORG", "B-ORG"),
            ("B-ORG", None, "O", "U-ORG"),       # rule 4
        ],
    )
    def test_fix_bilou_tag(self, current, previous, subsequent, expected_tag):
        tag, _ = fix_bilou_tag(current, previous, subsequent)
        assert tag == expected_tag

    def test_fix_bilou_lone_l_becomes_u(self):
        # L with bad prev -> B, then B with bad next -> U (cascade)
        assert fix_bilou_tag("L-ORG", "O", "O") == ("U-ORG", True)

    def test_fix_scheme_bio(self):
        repaired, abidance = fix_scheme(["O", "I-ORG", "I-ORG", "O"], "bio")
        assert repaired == ["O", "B-ORG", "I-ORG", "O"]
        assert abidance == 0.75

    def test_fix_scheme_uses_original_context(self):
        # second I-ORG keeps I- because the ORIGINAL previous tag was I-ORG
        repaired, _ = fix_scheme(["I-ORG", "I-ORG"], "bio")
        assert repaired == ["B-ORG", "I-ORG"]

    # reference: base_formatter.py:316-369
    @pytest.mark.parametrize(
        "iob1, iob2",
        [
            (["I-PER", "I-PER", "O"], ["B-PER", "I-PER", "O"]),
            (["O", "I-PER", "B-PER"], ["O", "B-PER", "B-PER"]),
            (["B-PER", "I-PER"], ["B-PER", "I-PER"]),
            (["I-ORG", "I-PER"], ["B-ORG", "B-PER"]),
            (["O", "0", "I-LOC"], ["O", "0", "B-LOC"]),
        ],
    )
    def test_iob1_to_iob2(self, iob1, iob2):
        assert iob1_to_iob2(iob1) == iob2


# ---------------------------------------------------------------------------
# slice & subtoken merging (test_api_model.py:137-326)
# ---------------------------------------------------------------------------

class TestMerges:
    @pytest.mark.parametrize(
        "slices, merged",
        [
            (
                [["[CLS]", "this", "is", "one", "slice", "[SEP]"]],
                ["[CLS]", "this", "is", "one", "slice", "[SEP]"],
            ),
            (
                [
                    ["[CLS]", "this", "is", "one", "slice", "[SEP]"],
                    ["[CLS]", "and", "a", "second", "one", "[SEP]"],
                ],
                ["[CLS]", "this", "is", "one", "slice", "and", "a", "second", "one", "[SEP]"],
            ),
            (
                [
                    ["[CLS]", "slice", "1", "[SEP]"],
                    ["[CLS]", "slice", "2", "[SEP]"],
                    ["[CLS]", "slice", "3", "[SEP]"],
                ],
                ["[CLS]", "slice", "1", "slice", "2", "slice", "3", "[SEP]"],
            ),
            (
                [
                    ["O", "B-PER", "I-PER", "[S]"],
                    ["[S]", "B-LOC", "I-LOC", "[SEP]"],
                    ["[S]", "B-ORG", "I-ORG", "O"],
                ],
                ["O", "B-PER", "I-PER", "B-LOC", "I-LOC", "B-ORG", "I-ORG", "O"],
            ),
        ],
    )
    def test_merge_slices(self, slices, merged):
        assert merge_slices(slices) == merged

    @pytest.mark.parametrize(
        "tokens, predictions, expected",
        [
            (
                ["[CLS]", "arbetsförmedl", "##ingen", "finns", "i", "stockholm", "[SEP]", "[PAD]"],
                ["[S]", "ORG", "ORG", "O", "O", "O", "[S]", "[S]"],
                [("arbetsförmedlingen", "ORG"), ("finns", "O"), ("i", "O"), ("stockholm", "O")],
            ),
            (
                # first subtoken's tag wins
                ["[CLS]", "arbetsförmedl", "##ingen", "finns", "i", "stockholm", "[SEP]", "[PAD]"],
                ["[S]", "ORG", "PER", "O", "O", "O", "[S]", "[S]"],
                [("arbetsförmedlingen", "ORG"), ("finns", "O"), ("i", "O"), ("stockholm", "O")],
            ),
            (
                ["[CLS]", "1996", "-", "08", "-", "30", "[PAD]"],
                ["[S]", "ORG", "ORG", "O", "ORG", "O", "[S]"],
                [("1996", "ORG"), ("-", "ORG"), ("08", "O"), ("-", "ORG"), ("30", "O")],
            ),
        ],
    )
    def test_merge_subtokens(self, tokens, predictions, expected):
        got = merge_subtokens(tokens, predictions, ["[CLS]", "[SEP]", "[PAD]"], "WordPiece")
        assert got == expected

    def test_merge_subtokens_sentencepiece(self):
        got = merge_subtokens(
            ["<s>", "ĠIncorp", "orations", "Ġrule", "</s>"],
            ["[S]", "ORG", "O", "O", "[S]"],
            ["</s>", "<s>", "<pad>"],
            "SentencePiece",
        )
        assert got == [("Incorporations", "ORG"), ("rule", "O")]


# ---------------------------------------------------------------------------
# restore_unknown_tokens — 12 golden cases from test_api_model.py:329-991
# ---------------------------------------------------------------------------

RESTORE_CASES = [
    # 1
    (
        [("arbetsförmedlingen", "ORG"), ("[UNK]", "O"), ("i", "O"), ("stockholm", "O")],
        "arbetsförmedlingen finns i stockholm",
        [rec(0, 18, "arbetsförmedlingen", "ORG"), rec(19, 24, "finns", "O"),
         rec(25, 26, "i", "O"), rec(27, 36, "stockholm", "O")],
    ),
    # 2
    (
        [("arbetsförmedlingen", "ORG"), ("finns", "O"), ("i", "O"), ("[UNK]", "O")],
        "arbetsförmedlingen finns i stockholm",
        [rec(0, 18, "arbetsförmedlingen", "ORG"), rec(19, 24, "finns", "O"),
         rec(25, 26, "i", "O"), rec(27, 36, "stockholm", "O")],
    ),
    # 3
    (
        [("arbetsförmedlingen", "ORG"), ("[UNK]", "O"), ("i", "O"), ("[UNK]", "O")],
        "arbetsförmedlingen finns i stockholm",
        [rec(0, 18, "arbetsförmedlingen", "ORG"), rec(19, 24, "finns", "O"),
         rec(25, 26, "i", "O"), rec(27, 36, "stockholm", "O")],
    ),
    # 4
    (
        [("Du", "O"), ("behöver", "O"), ("[UNK]", "O"), ("kunna", "O"),
         ("programmera", "B-SKILL")],
        "Du behöver ✓ kunna programmera",
        [rec(0, 2, "Du", "O"), rec(3, 10, "behöver", "O"), rec(11, 12, "✓", "O"),
         rec(13, 18, "kunna", "O"), rec(19, 30, "programmera", "B-SKILL")],
    ),
    # 5
    (
        [("arbetsförmedlingen", "ORG"), ("[UNK]", "O"), ("i", "O"), ("[UNK]", "O")],
        "arbetsförmedlingen íi i í",
        [rec(0, 18, "arbetsförmedlingen", "ORG"), rec(19, 21, "íi", "O"),
         rec(22, 23, "i", "O"), rec(24, 25, "í", "O")],
    ),
    # 6
    (
        [("arbetsförmedlingen", "ORG"), ("[UNK]", "O"), (".", "O"), ("i", "O"),
         ("[UNK]", "O")],
        "arbetsförmedlingen íi. i í",
        [rec(0, 18, "arbetsförmedlingen", "ORG"), rec(19, 21, "íi", "O"),
         rec(21, 22, ".", "O"), rec(23, 24, "i", "O"), rec(25, 26, "í", "O")],
    ),
    # 7
    (
        [("arbetsförmedlingen", "ORG"), ("[UNK]", "O"), ("!", "O"), ("i", "O"),
         ("[UNK]", "O")],
        "arbetsförmedlingen íi! i í",
        [rec(0, 18, "arbetsförmedlingen", "ORG"), rec(19, 21, "íi", "O"),
         rec(21, 22, "!", "O"), rec(23, 24, "i", "O"), rec(25, 26, "í", "O")],
    ),
    # 8 — emoji/ZWJ + literal special tokens
    (
        [("medarbetare", "O"), ("i", "O"), ("Stockholm", "O"), (".", "O"),
         ("[UNK]", "O"), ("[NEWLINE]", "O"), ("[NEWLINE]", "O"), ("På", "O"),
         ("Företaget", "O")],
        "medarbetare i Stockholm. ‍‍\U0001F468\U0001F469[NEWLINE][NEWLINE]På Företaget",
        [rec(0, 11, "medarbetare", "O"), rec(12, 13, "i", "O"),
         rec(14, 23, "Stockholm", "O"), rec(23, 24, ".", "O"),
         rec(25, 29, "‍‍\U0001F468\U0001F469", "O"),
         rec(29, 38, "[NEWLINE]", "O"), rec(38, 47, "[NEWLINE]", "O"),
         rec(47, 49, "På", "O"), rec(50, 59, "Företaget", "O")],
    ),
    # 9 — accents dropped by the model (ä->a etc), no [UNK]
    (
        [("diese", "O"), ("großraumwagen", "O"), ("2", "O"), (".", "O"),
         ("klasse", "O"), ("mit", "O"), ("62", "O"), ("sitzplatzen", "O"),
         ("in", "O"), ("vis", "O"), ("-", "O"), ("a", "O"), ("-", "O"),
         ("vis", "O"), ("-", "O"), ("anordnung", "O"), ("vom", "O")],
        "diese großraumwagen 2. klasse mit 62 sitzplätzen in vis-à-vis-anordnung vom",
        [rec(0, 5, "diese", "O"), rec(6, 19, "großraumwagen", "O"),
         rec(20, 21, "2", "O"), rec(21, 22, ".", "O"), rec(23, 29, "klasse", "O"),
         rec(30, 33, "mit", "O"), rec(34, 36, "62", "O"),
         rec(37, 48, "sitzplätzen", "O"), rec(49, 51, "in", "O"),
         rec(52, 55, "vis", "O"), rec(55, 56, "-", "O"), rec(56, 57, "à", "O"),
         rec(57, 58, "-", "O"), rec(58, 61, "vis", "O"), rec(61, 62, "-", "O"),
         rec(62, 71, "anordnung", "O"), rec(72, 75, "vom", "O")],
    ),
    # 10 — CJK run collapses to one restored word
    (
        [("der", "O"), ("titel", "O"), (",", "O"), ("den", "O"), ("sie", "O"),
         ("mit", "O"), ("ihrer", "O"), ("erhohung", "O"), ("erhielt", "O"),
         (",", "O"), ("lautete", "O"), ("yi", "B-PER"), ("guifei", "O"),
         ("(", "O"), ("[UNK]", "O"), ("[UNK]", "O"), ("[UNK]", "O"), (")", "O")],
        "der titel , den sie mit ihrer erhöhung erhielt , lautete yi guifei ( 懿貴妃 )",
        [rec(0, 3, "der", "O"), rec(4, 9, "titel", "O"), rec(10, 11, ",", "O"),
         rec(12, 15, "den", "O"), rec(16, 19, "sie", "O"), rec(20, 23, "mit", "O"),
         rec(24, 29, "ihrer", "O"), rec(30, 38, "erhöhung", "O"),
         rec(39, 46, "erhielt", "O"), rec(47, 48, ",", "O"),
         rec(49, 56, "lautete", "O"), rec(57, 59, "yi", "B-PER"),
         rec(60, 66, "guifei", "O"), rec(67, 68, "(", "O"),
         rec(69, 72, "懿貴妃", "O"), rec(73, 74, ")", "O")],
    ),
    # 11 — Hangul + Hanja
    (
        [("auf", "O"), ("dem", "O"), ("berg", "O"), ("gibt", "O"), ("es", "O"),
         ("zwei", "O"), ("aussichtspavillions", "O"), (",", "O"),
         ("tongdae", "B-LOC"), ("(", "O"), ("[UNK]", "B-LOC"), ("[UNK]", "I-LOC"),
         ("[UNK]", "O"), (")", "O"), ("und", "O"), ("hakpyollu", "B-LOC"),
         ("(", "O"), ("[UNK]", "B-LOC"), ("[UNK]", "I-LOC"), ("[UNK]", "I-LOC"),
         ("[UNK]", "O"), (")", "O"), (".", "O")],
        "auf dem berg gibt es zwei aussichtspavillions , tongdae ( 동대 東台 ) und "
        "hakpyŏllu ( 학별루 鶴別樓 ) .",
        [rec(0, 3, "auf", "O"), rec(4, 7, "dem", "O"), rec(8, 12, "berg", "O"),
         rec(13, 17, "gibt", "O"), rec(18, 20, "es", "O"), rec(21, 25, "zwei", "O"),
         rec(26, 45, "aussichtspavillions", "O"), rec(46, 47, ",", "O"),
         rec(48, 55, "tongdae", "B-LOC"), rec(56, 57, "(", "O"),
         rec(58, 60, "동대", "O"), rec(61, 63, "東台", "O"), rec(64, 65, ")", "O"),
         rec(66, 69, "und", "O"), rec(70, 79, "hakpyŏllu", "B-LOC"),
         rec(80, 81, "(", "O"), rec(82, 85, "학별루", "O"), rec(86, 89, "鶴別樓", "O"),
         rec(90, 91, ")", "O"), rec(92, 93, ".", "O")],
    ),
    # 12 — model output diverges from raw text (0NKEL.RUO vs 0#NKEL.RUO)
    (
        [("The", "O"), ("official", "O"), ("Itar-Tass", "B-ORG"), ("news", "O"),
         ("agency", "O"), ("quoted", "O"), ("Livshits", "B-PER"), ("as", "O"),
         ("telling", "O"), ("parliamentary", "O"), ("deputies", "O"),
         ("that", "O"), ("RAO", "B-ORG"), ("Norilsky", "I-ORG"),
         ("Nikel", "I-ORG"), ("0NKEL.RUO", "O"), ("had", "O"), ("to", "O"),
         ("pay", "O"), ("its", "O"), ("tax", "O")],
        "The official Itar-Tass news agency quoted Livshits as telling parliamentary "
        "deputies that RAO Norilsky Nikel 0#NKEL.RUO had to pay its tax",
        [rec(0, 3, "The", "O"), rec(4, 12, "official", "O"),
         rec(13, 22, "Itar-Tass", "B-ORG"), rec(23, 27, "news", "O"),
         rec(28, 34, "agency", "O"), rec(35, 41, "quoted", "O"),
         rec(42, 50, "Livshits", "B-PER"), rec(51, 53, "as", "O"),
         rec(54, 61, "telling", "O"), rec(62, 75, "parliamentary", "O"),
         rec(76, 84, "deputies", "O"), rec(85, 89, "that", "O"),
         rec(90, 93, "RAO", "B-ORG"), rec(94, 102, "Norilsky", "I-ORG"),
         rec(103, 108, "Nikel", "I-ORG"), rec(109, 119, "0#NKEL.RUO", "O"),
         rec(120, 123, "had", "O"), rec(124, 126, "to", "O"),
         rec(127, 130, "pay", "O"), rec(131, 134, "its", "O"),
         rec(135, 138, "tax", "O")],
    ),
]


@pytest.mark.parametrize("word_predictions, input_text, expected", RESTORE_CASES)
def test_restore_unknown_tokens(word_predictions, input_text, expected):
    assert restore_unknown_tokens(word_predictions, input_text) == expected


# ---------------------------------------------------------------------------
# word & entity merging (test_token_tags.py:399-958, 968-1127)
# ---------------------------------------------------------------------------

class TestTokenTags:
    def test_merge_tokens_to_words(self):
        records = [
            rec(0, 4, "2020", "B-TAG"), rec(4, 5, "-", "I-TAG"),
            rec(5, 7, "04", "I-TAG"), rec(8, 10, "xy", "O"),
        ]
        assert merge_tokens_to_words(records) == [
            rec(0, 7, "2020-04", "B-TAG"), rec(8, 10, "xy", "O"),
        ]

    def test_unpretokenize(self):
        records = [
            rec(0, 4, "2021", "B-PI"), rec(5, 6, "-", "I-PI"), rec(7, 9, "10", "I-PI"),
            rec(10, 11, "-", "I-PI"), rec(12, 14, "14", "I-PI"), rec(15, 20, "Mamma", "O"),
        ]
        offsets = [(0, 4), (4, 5), (5, 7), (7, 8), (8, 10), (11, 16)]
        assert unpretokenize(records, offsets) == [
            rec(0, 4, "2021", "B-PI"), rec(4, 5, "-", "I-PI"), rec(5, 7, "10", "I-PI"),
            rec(7, 8, "-", "I-PI"), rec(8, 10, "14", "I-PI"), rec(11, 16, "Mamma", "O"),
        ]

    ENTITY_CASES = [
        # scheme, records, text, expected  (test_token_tags.py:399-958)
        ("bio",
         [rec(0, 18, "arbetsförmedlingen", "B-ORG"), rec(19, 24, "finns", "O"),
          rec(25, 26, "i", "O"), rec(27, 36, "stockholm", "O")],
         "arbetsförmedlingen finns i stockholm",
         [rec(0, 18, "arbetsförmedlingen", "ORG")]),
        ("bio",
         [rec(0, 18, "arbetsförmedlingen", "B-ORG"), rec(19, 24, "finns", "B-PER"),
          rec(25, 26, "i", "O"), rec(27, 36, "stockholm", "O")],
         "arbetsförmedlingen finns i stockholm",
         [rec(0, 18, "arbetsförmedlingen", "ORG"), rec(19, 24, "finns", "PER")]),
        ("bio",
         [rec(0, 18, "arbetsförmedlingen", "B-ORG"), rec(19, 24, "finns", "B-PER"),
          rec(25, 26, "i", "I-PER"), rec(27, 36, "stockholm", "B-PER")],
         "arbetsförmedlingen finns i stockholm",
         [rec(0, 18, "arbetsförmedlingen", "ORG"), rec(19, 26, "finns i", "PER"),
          rec(27, 36, "stockholm", "PER")]),
        ("bio",  # orphan I- dropped
         [rec(0, 18, "arbetsförmedlingen", "I-ORG"), rec(19, 24, "finns", "B-PER"),
          rec(25, 26, "i", "I-PER"), rec(27, 36, "stockholm", "B-PER")],
         "arbetsförmedlingen finns i stockholm",
         [rec(19, 26, "finns i", "PER"), rec(27, 36, "stockholm", "PER")]),
        ("plain",
         [rec(0, 8, "annotera", "O"), rec(9, 12, "den", "ORG"),
          rec(13, 16, "här", "O"), rec(17, 23, "texten", "O")],
         "annotera den här texten",
         [rec(9, 12, "den", "ORG")]),
        ("plain",
         [rec(0, 8, "annotera", "O"), rec(9, 12, "den", "ORG"),
          rec(13, 16, "här", "ORG"), rec(17, 23, "texten", "O")],
         "annotera den här texten",
         [rec(9, 16, "den här", "ORG")]),
        ("bilou",
         [rec(0, 18, "arbetsförmedlingen", "U-ORG"), rec(19, 24, "finns", "B-PER"),
          rec(25, 26, "i", "L-PER"), rec(27, 36, "stockholm", "U-PER")],
         "arbetsförmedlingen finns i stockholm",
         [rec(0, 18, "arbetsförmedlingen", "ORG"), rec(19, 26, "finns i", "PER"),
          rec(27, 36, "stockholm", "PER")]),
        ("plain",  # tag at the very end
         [rec(0, 2, "Du", "O"), rec(3, 8, "måste", "O"), rec(9, 14, "kunna", "O"),
          rec(15, 26, "programmera", "SKILL_HARD"), rec(27, 30, "och", "O"),
          rec(31, 35, "koka", "SKILL_HARD"), rec(36, 41, "kaffe", "SKILL_HARD")],
         "Du måste kunna programmera och koka kaffe",
         [rec(15, 26, "programmera", "SKILL_HARD"), rec(31, 41, "koka kaffe", "SKILL_HARD")]),
        ("bio",  # I-tag at the very end
         [rec(0, 2, "Du", "O"), rec(3, 8, "måste", "O"), rec(9, 14, "kunna", "O"),
          rec(15, 26, "programmera", "B-SKILL_HARD"), rec(27, 30, "och", "O"),
          rec(31, 35, "koka", "B-SKILL_HARD"), rec(36, 41, "kaffe", "I-SKILL_HARD")],
         "Du måste kunna programmera och koka kaffe",
         [rec(15, 26, "programmera", "SKILL_HARD"), rec(31, 41, "koka kaffe", "SKILL_HARD")]),
        ("bilou",  # L-tag at the very end
         [rec(0, 2, "Du", "O"), rec(3, 8, "måste", "O"), rec(9, 14, "kunna", "O"),
          rec(15, 26, "programmera", "B-SKILL_HARD"), rec(27, 30, "och", "O"),
          rec(31, 35, "koka", "B-SKILL_HARD"), rec(36, 41, "kaffe", "L-SKILL_HARD")],
         "Du måste kunna programmera och koka kaffe",
         [rec(15, 26, "programmera", "SKILL_HARD"), rec(31, 41, "koka kaffe", "SKILL_HARD")]),
        ("bilou",  # lost I- at start
         [rec(0, 18, "arbetsförmedlingen", "I-ORG"), rec(19, 24, "finns", "B-PER"),
          rec(25, 26, "i", "L-PER"), rec(27, 36, "stockholm", "U-PER")],
         "arbetsförmedlingen finns i stockholm",
         [rec(19, 26, "finns i", "PER"), rec(27, 36, "stockholm", "PER")]),
        ("bilou",  # lost L- at start
         [rec(0, 18, "arbetsförmedlingen", "L-ORG"), rec(19, 24, "finns", "B-PER"),
          rec(25, 26, "i", "L-PER"), rec(27, 36, "stockholm", "U-PER")],
         "arbetsförmedlingen finns i stockholm",
         [rec(19, 26, "finns i", "PER"), rec(27, 36, "stockholm", "PER")]),
        ("bilou",  # trailing lost I-
         [rec(0, 18, "arbetsförmedlingen", "I-ORG"), rec(19, 24, "finns", "B-PER"),
          rec(25, 26, "i", "L-PER"), rec(27, 36, "stockholm", "I-PER")],
         "arbetsförmedlingen finns i stockholm",
         [rec(19, 26, "finns i", "PER")]),
    ]

    @pytest.mark.parametrize("scheme, records, text, expected", ENTITY_CASES)
    def test_merge_tokens_to_entities(self, scheme, records, text, expected):
        assert merge_tokens_to_entities(records, scheme, text) == expected

    def test_autocorrect_bio(self):
        records = [rec(0, 18, "arbetsförmedlingen", "I-ORG"), rec(19, 24, "finns", "O")]
        fixed = autocorrect_scheme(records, "bio")
        assert [r["tag"] for r in fixed] == ["B-ORG", "O"]

    def test_resolve_overlapping_tags(self):
        tags = [
            {"token": "Bajo peso", "tag": "Concept", "char_start": 4651, "char_end": 4660},
            {"token": "peso", "tag": "Concept", "char_start": 4656, "char_end": 4660},
            {"token": "más", "tag": "Predicate", "char_start": 4681, "char_end": 4684},
        ]
        assert resolve_overlapping_tags(tags) == [tags[0], tags[2]]


# ---------------------------------------------------------------------------
# pretokenize (HF BertPreTokenizer semantics)
# ---------------------------------------------------------------------------

class TestPretokenize:
    def test_basic(self):
        assert pretokenize("ai-center finns") == [
            ("ai", (0, 2)), ("-", (2, 3)), ("center", (3, 9)), ("finns", (10, 15)),
        ]

    def test_punctuation_runs(self):
        assert pretokenize("a!!b") == [
            ("a", (0, 1)), ("!", (1, 2)), ("!", (2, 3)), ("b", (3, 4)),
        ]

    def test_whitespace_variants(self):
        assert pretokenize("  x\ty ") == [("x", (2, 3)), ("y", (4, 5))]

    def test_offsets_slice_back(self):
        text = "we are in stockholm."
        for word, (s, e) in pretokenize(text):
            assert text[s:e] == word


# ---------------------------------------------------------------------------
# planted OOV/CJK/emoji corpus pages (kgkit/sources/planted.py)
# ---------------------------------------------------------------------------

class TestPlantedPages:
    """The corpus-level [UNK]-restoration fixtures must keep the
    word-level SQL mirror valid (see the planted.py module docstring)."""

    def test_single_space_invariant(self):
        from kgkit.sources.planted import PLANTED_NER_TEXTS

        for t in PLANTED_NER_TEXTS:
            assert "'" not in t and "  " not in t
            got = pretokenize(t)
            words = t.split(" ")
            offs, c = [], 0
            for w in words:
                offs.append((c, c + len(w)))
                c += len(w) + 1
            assert got == list(zip(words, offs)), t

    def test_word_level_restore_is_exact(self):
        """predict(level='word') over every planted page returns exactly
        the whitespace words with cumulative offsets — i.e. the
        restoration heuristics recover every [UNK] surface."""
        from kgkit.ner_core import predict
        from kgkit.sources.planted import PLANTED_NER_TEXTS

        results = predict(list(PLANTED_NER_TEXTS), level="word")
        for t, recs in zip(PLANTED_NER_TEXTS, results):
            words = t.split(" ")
            assert [r["token"] for r in recs] == words, t
            c = 0
            for w, r in zip(words, recs):
                assert (int(r["char_start"]), int(r["char_end"])) == (c, c + len(w))
                c += len(w) + 1

    def test_unk_paths_actually_exercised(self):
        """The fixtures must really route words through [UNK] (else they
        test nothing): count OOV words and consecutive-OOV runs."""
        from kgkit.ner_core.wordpiece import UNK, default_tokenizer
        from kgkit.sources.planted import PLANTED_NER_TEXTS

        tok = default_tokenizer()
        n_unk = 0
        max_run = 0
        for t in PLANTED_NER_TEXTS:
            run = 0
            for w in t.split(" "):
                if tok.tokenize_word(w) == [UNK]:
                    n_unk += 1
                    run += 1
                    max_run = max(max_run, run)
                else:
                    run = 0
        assert n_unk >= 15, n_unk      # plenty of restore work
        assert max_run >= 4, max_run   # multi-[UNK] margin propagation

    def test_entity_byte_identity_on_planted(self):
        from kgkit.ner_core import predict
        from kgkit.sources.planted import PLANTED_NER_TEXTS

        for t in PLANTED_NER_TEXTS:
            for r in predict([t], level="entity", autocorrect=True)[0]:
                assert t[int(r["char_start"]):int(r["char_end"])] == r["token"]
