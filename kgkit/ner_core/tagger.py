"""Deterministic gazetteer "model": per-subtoken BIO tags for one slice.

Plays the role of the reference's AutoModelForTokenClassification forward
pass + argmax decode (nerblackbox/api/model.py:464-505).  Instead of
transformer logits (torch is unavailable here) it assigns tags by greedy
longest-match of reconstructed words against a fixed gazetteer — a
perfectly deterministic stand-in that keeps every downstream
post-processing code path identical (SURVEY.md §7.2.6).

Like the real model it sees ONLY the subtoken sequence of one slice: words
are reconstructed from '##' continuations, matched left-to-right with
longest-phrase-first precedence, and the word's tag is emitted on each of
its subtokens (the pipeline keeps the first subtoken's tag when merging,
api/model.py:1224-1258).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from kgkit.ner_core.wordpiece import CLS, PAD, SEP, UNK

# (phrase words) -> entity type; longest phrases win.  Second words of
# bigrams never start another phrase, so greedy left-to-right matching is
# exactly reproducible in SQL (see kgkit/sources/alias_dict.py and the
# DuckDB oracles in __spark_entry__.py).
DEFAULT_GAZETTEER: Dict[Tuple[str, ...], str] = {
    ("hash", "join"): "OP",
    ("table", "scan"): "OP",
    ("sort", "merge"): "OP",
    ("join",): "OP",
    ("merge",): "OP",
    ("spark",): "TECH",
    ("stream",): "TECH",
    ("vector",): "TECH",
    ("customer",): "DIM",
}


class GazetteerTagger:
    """Deterministic slice tagger with a gazetteer of 1- and 2-word phrases."""

    def __init__(self, gazetteer: Optional[Dict[Tuple[str, ...], str]] = None):
        self.gazetteer = dict(gazetteer) if gazetteer is not None else dict(DEFAULT_GAZETTEER)
        self.max_phrase_len = max((len(k) for k in self.gazetteer), default=1)

    def tag_slice(
        self, subtokens: Sequence[str], tokenizer_type: str = "WordPiece"
    ) -> List[str]:
        """Per-subtoken tags for one framed slice — words reconstructed
        by the shared grouping (wordpiece.group_subtokens), so either
        piece convention ('##' continuations or 'Ġ' word starts) yields
        the same word stream and therefore the same tags."""
        from kgkit.ner_core.wordpiece import group_subtokens

        words, word_of_subtoken = group_subtokens(subtokens, tokenizer_type)
        word_tags = self._tag_words(words)

        return [
            "O" if wi < 0 else word_tags[wi]
            for wi in word_of_subtoken
        ]

    def _tag_words(self, words: List[str]) -> List[str]:
        """Greedy left-to-right longest-match BIO tagging over words."""
        lowered = [w.lower() for w in words]  # once, not per phrase probe
        tags = ["O"] * len(words)
        i = 0
        while i < len(words):
            matched = False
            for ln in range(min(self.max_phrase_len, len(words) - i), 0, -1):
                phrase = tuple(lowered[i: i + ln])
                etype = self.gazetteer.get(phrase)
                if etype is not None:
                    tags[i] = f"B-{etype}"
                    for k in range(1, ln):
                        tags[i + k] = f"I-{etype}"
                    i += ln
                    matched = True
                    break
            if not matched:
                i += 1
        return tags


    @property
    def annotation_classes(self) -> List[str]:
        """Label universe in reference order: 'O' first, rest lexicographic
        (nerblackbox annotation.py:51-85)."""
        plain = sorted({t for t in self.gazetteer.values()})
        return ["O"] + [f"{p}-{c}" for p in ("B", "I") for c in plain]

    def tag_slice_proba(
        self, subtokens: Sequence[str], tokenizer_type: str = "WordPiece"
    ) -> List[Dict[str, float]]:
        """Per-subtoken probability distributions (M3 stand-in for the
        reference's softmax decode, api/model.py:1161-1186): the chosen
        tag gets 0.82, the rest share the remainder uniformly —
        deterministic, argmax-consistent with tag_slice."""
        classes = self.annotation_classes
        rest = round(0.18 / (len(classes) - 1), 6)
        out = []
        for tag in self.tag_slice(subtokens, tokenizer_type):
            out.append({c: (0.82 if c == tag else rest) for c in classes})
        return out


_DEFAULT: Optional[GazetteerTagger] = None


def default_gazetteer() -> GazetteerTagger:
    """Process-wide singleton (executor-local model cache, SURVEY §4.3.4)."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = GazetteerTagger()
    return _DEFAULT
