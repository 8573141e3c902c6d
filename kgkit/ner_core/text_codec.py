"""Reversible text encoding for special characters (SURVEY §2.3 P9).

Reference: nerblackbox/modules/ner_training/data_preprocessing/
text_encoder.py:40-178.  Characters like ``\\n`` are replaced by model
special tokens (``[NEWLINE]``) before tokenization; after prediction the
replacement is undone and every span's char offsets are shifted back.

Observable semantics preserved exactly:
  * encode replaces per encoding key, one occurrence at a time, left to
    right, recording (index, original, encoded) with the index taken in
    the PARTIALLY ENCODED text at replacement time; the mapping list is
    returned newest-first.
  * decode replays the mappings in that order; a prediction exactly
    covering an encoded token is rewritten to the original character,
    and any prediction ending beyond the replacement index is shifted
    by the length delta.  Offsets are strings at this boundary.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

EncodeDecodeMappings = List[Tuple[int, str, str]]


class TextCodec:
    def __init__(
        self,
        encoding: Dict[str, str],
        model_special_tokens: Optional[List[str]] = None,
    ):
        if model_special_tokens is not None:
            if sorted(set(encoding.values())) != sorted(set(model_special_tokens)):
                raise ValueError(
                    "encoding values must equal model_special_tokens"
                )
        self.encoding = dict(encoding)

    # -- encode -------------------------------------------------------------

    def encode_single(self, text: str) -> Tuple[str, EncodeDecodeMappings]:
        mappings: EncodeDecodeMappings = []
        for original, encoded in self.encoding.items():
            while original in text:
                index = text.find(original)
                text = text[:index] + encoded + text[index + len(original):]
                mappings.append((index, original, encoded))
        mappings.reverse()
        return text, mappings

    def encode(self, texts: List[str]) -> Tuple[List[str], List[EncodeDecodeMappings]]:
        pairs = [self.encode_single(t) for t in texts]
        return [p[0] for p in pairs], [p[1] for p in pairs]

    # -- decode -------------------------------------------------------------

    @staticmethod
    def decode_single(
        text_encoded: str,
        mappings: EncodeDecodeMappings,
        predictions: List[Dict[str, str]],
    ) -> Tuple[str, List[Dict[str, str]]]:
        text = text_encoded
        preds = [dict(p) for p in predictions]
        for index, original, encoded in mappings:
            if text[index: index + len(encoded)] != encoded:
                raise ValueError(
                    f"text[{index}:{index + len(encoded)}] != {encoded!r}"
                )
            text = text[:index] + original + text[index + len(encoded):]
            delta = len(encoded) - len(original)
            for p in preds:
                start, end = int(p["char_start"]), int(p["char_end"])
                if start == index and end == index + len(encoded):
                    p["char_end"] = str(end - delta)
                    p["token"] = original
                elif end > index:
                    p["char_start"] = str(start - delta)
                    p["char_end"] = str(end - delta)
        return text, preds

    def decode(
        self,
        texts_encoded: List[str],
        mappings_list: List[EncodeDecodeMappings],
        predictions_list: List[List[Dict[str, str]]],
    ) -> Tuple[List[str], List[List[Dict[str, str]]]]:
        pairs = [
            self.decode_single(t, m, p)
            for t, m, p in zip(texts_encoded, mappings_list, predictions_list)
        ]
        return [p[0] for p in pairs], [p[1] for p in pairs]
