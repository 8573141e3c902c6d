"""T2 — train-time label alignment (first-subtoken selection, −100 mask).

Port of ``InputExamplesToTensors._encode_tags``
(nerblackbox/modules/ner_training/data_preprocessing/tools/
input_examples_to_tensors.py:136-179): word-level tags are projected
onto subtoken slices via the tokenizer's offset_mapping — the tag id
lands on each word's FIRST subtoken (offset (0, !=0)); continuations,
specials and padding get −100 (train/val/test) or the O id (predict).

``offset_mappings`` reproduces the HuggingFace fast-tokenizer
``return_offsets_mapping=True`` output for this repo's WordPiece
tokenizer (input_examples_to_tensors.py:110-119): per-subtoken
(start, end) char offsets WITHIN the word, (0, 0) for special/pad
tokens, whole-word span for [UNK], sliced exactly like
``encode_words`` (stride 0, overflow slices).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from kgkit.ner_core.wordpiece import UNK, WordPieceTokenizer

Offsets = List[Tuple[int, int]]


def offset_mappings(
    tokenizer: WordPieceTokenizer, words: Sequence[str]
) -> List[Offsets]:
    """Per-slice (start, end) offsets aligned 1:1 with
    ``tokenizer.encode_words(words)`` subtokens."""
    flat: List[Tuple[int, int]] = []
    for w in words:
        pieces = tokenizer.tokenize_word(w)
        if pieces == [UNK]:
            flat.append((0, len(w)))
            continue
        pos = 0
        for p in pieces:
            plen = len(p[2:]) if p.startswith("##") else len(p)
            flat.append((pos, pos + plen))
            pos += plen
    body = tokenizer.max_seq_length - 2
    out: List[Offsets] = []
    for off in range(0, max(len(flat), 1), body):
        chunk = flat[off: off + body]
        padded = [(0, 0)] + chunk + [(0, 0)]  # [CLS] ... [SEP]
        padded += [(0, 0)] * (tokenizer.max_seq_length - len(padded))
        out.append(padded)
    return out


def encode_tags(
    tags_split_into_words: Sequence[str],
    all_offsets: Sequence[Offsets],
    tag2id: Dict[str, int],
    predict: bool = False,
) -> List[List[int]]:
    """input_examples_to_tensors.py:136-179, line for line: special and
    continuation positions get −100 (or the id 0 == 'O' when predicting),
    first-subtoken positions consume the word tag ids in order across
    overflow slices."""
    tag_ids_split_into_words = [tag2id[tag] for tag in tags_split_into_words]
    tag_id_special = 0 if predict else -100

    index = 0
    all_tag_ids: List[List[int]] = []
    for offsets in all_offsets:
        arr_tag_ids = np.ones(len(offsets), dtype=int) * tag_id_special
        arr_offsets = np.array(offsets)
        if len(arr_offsets):
            first = (arr_offsets[:, 0] == 0) & (arr_offsets[:, 1] != 0)
            nr_matches = int(first.sum())
            arr_tag_ids[first] = tag_ids_split_into_words[
                index: index + nr_matches
            ]
            index += nr_matches
        all_tag_ids.append([int(t) for t in arr_tag_ids])
    return all_tag_ids
