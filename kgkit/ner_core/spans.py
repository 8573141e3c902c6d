"""Within-document span post-processing with reference parity.

These operators run strictly ordered over one document; in Spark they
live inside a single Arrow-vectorized UDF (a document never spans rows).

Parity targets in flxst/nerblackbox:
  * merge_slices            -> nerblackbox/api/model.py:1189-1221
  * merge_subtokens         -> api/model.py:1224-1258
  * restore_unknown_tokens  -> api/model.py:1261-1504 (byte-identity hot spot)
  * merge_tokens_to_words   -> modules/ner_training/annotation_tags/token_tags.py:108-143
  * unpretokenize           -> token_tags.py:145-180
  * autocorrect_scheme      -> token_tags.py:51-106
  * merge_tokens_to_entities-> token_tags.py:182-332, 364-403
  * strip_sentencepiece_marker -> token_tags.py:334-352
  * resolve_overlapping_tags-> modules/ner_training/data_preprocessing/data_preprocessor.py:293-316

Record convention (the reference's public output type, api/model.py:1507-1528):
a "record" is {"char_start": str, "char_end": str, "token": str, "tag": str}
— offsets are STRING-typed integers at this boundary, exactly like the
reference.  Callers that want integers cast at the edge.
"""

from __future__ import annotations

import string as _string
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

from kgkit.ner_core.schemes import fix_bio_tag, fix_bilou_tag

Record = Dict[str, str]
WordPred = Tuple[str, Any]  # (token, tag) or (token, proba_dist)


# ---------------------------------------------------------------------------
# slice & subtoken merging
# ---------------------------------------------------------------------------

def merge_slices(slices: Sequence[List[Any]]) -> List[Any]:
    """Concatenate the overflow slices of one document (api/model.py:1189-1221).

    Inner [CLS]/[SEP] positions are dropped: first slice keeps everything
    but its last element, middle slices drop first+last, last slice drops
    its first element.  A single slice passes through unchanged.
    """
    if len(slices) == 1:
        return slices[0]
    flat: List[Any] = []
    last = len(slices) - 1
    for i, piece in enumerate(slices):
        if i == 0:
            flat.extend(piece[:-1])
        elif i < last:
            flat.extend(piece[1:-1])
        else:
            flat.extend(piece[1:])
    return flat


def merge_subtokens(
    tokens: Sequence[str],
    predictions: Sequence[Any],
    special_tokens: Sequence[str],
    tokenizer_type: str = "WordPiece",
) -> List[WordPred]:
    """Join subword pieces back into tokens, keeping the FIRST piece's tag
    (api/model.py:1224-1258).

    WordPiece: '##'-prefixed pieces continue the previous token.
    SentencePiece: a 'Ġ'-prefixed piece starts a new token, others continue.
    Special tokens ([CLS]/[SEP]/[PAD] or <s>/</s>/<pad>) are dropped.
    """
    merged: List[List[Any]] = []
    special = set(special_tokens)
    for token, pred in zip(tokens, predictions):
        if token in special:
            continue
        if tokenizer_type == "WordPiece":
            if token.startswith("##"):
                merged[-1][0] += token.lstrip("#")
            else:
                merged.append([token, pred])
        elif tokenizer_type == "SentencePiece":
            if token.startswith("Ġ"):
                merged.append([token.strip("Ġ"), pred])
            else:
                merged[-1][0] += token
        else:
            raise ValueError(f"unknown tokenizer_type {tokenizer_type!r}")
    return [(tok, pred) for tok, pred in merged]


# ---------------------------------------------------------------------------
# [UNK] restoration + char-offset anchoring (api/model.py:1261-1504)
# ---------------------------------------------------------------------------

def restore_unknown_tokens(
    word_predictions: Sequence[WordPred],
    input_text: str,
) -> List[Dict[str, Any]]:
    """Anchor each predicted token to char offsets in ``input_text`` and
    reconstruct the surface of [UNK] tokens from the gaps between anchored
    neighbours.  Byte-for-byte replica of the reference heuristics
    (api/model.py:1261-1504) — this is what makes per-url extracted text
    byte-identical, so the control flow below intentionally mirrors the
    reference step by step.
    """
    restored: List[Dict[str, Any]] = []

    # -- phase 1: anchor known tokens, left to right -----------------------
    margins: List[Tuple[Optional[int], Optional[int]]] = []
    char_start = 0
    unknown_counter = 0
    invalid_counter = 0
    for token, _ in word_predictions:
        if token == "[UNK]":
            margins.append((None, None))
            unknown_counter += 1
            continue
        # skip ahead over the span the preceding [UNK]s occupy: advance to
        # the next occurrence of this token (len!=1 or punctuation) or of
        # " token" (single non-punct char), once per pending [UNK]
        while unknown_counter > 0:
            try:
                if token in _string.punctuation or len(token) != 1:
                    char_start = input_text.index(token, char_start)
                else:
                    char_start = input_text.index(f" {token}", char_start)
            except ValueError:
                pass
            unknown_counter -= 1

        try:
            anchor_from = char_start
            # start of the 2nd whitespace at/after anchor_from
            _t = input_text[anchor_from:].replace(" ", "-", 1).find(" ")
            second_ws = _t + anchor_from if _t > -1 else -1
            char_start = input_text.index(token, anchor_from)
            ws_before = len(input_text[:char_start]) - len(
                input_text[:char_start].rstrip()
            )
            ws_after = len(input_text[char_start:]) - len(
                input_text[char_start:].lstrip()
            )
            plausible = char_start <= anchor_from + invalid_counter + ws_before + ws_after and (
                second_ws == -1 or second_ws > char_start
            )
            if plausible:
                margins.append((char_start, char_start + len(token)))
                invalid_counter = 0
            else:
                invalid_counter += 1
                char_start = anchor_from
                margins.append((None, None))
        except ValueError:
            invalid_counter += 1
            margins.append((None, None))
        char_start += len(token)
        unknown_counter = 0

    # -- phase 2: reconstruct un-anchored tokens between known margins -----
    # deliberate totality divergence from the reference: its search
    # is bounded at 9 steps (api/model.py:1394-1415) and ASSERTS
    # when >=10 consecutive tokens are un-anchored (e.g. ten OOV
    # CJK words — hypothesis found it), which would kill a crawl
    # job on one pathological page.  Scanning to the sequence ends
    # only changes inputs where the reference RAISES, so byte
    # parity on the reference's defined domain is untouched
    # (tests/test_properties.py + the goldens pin both facts).
    #
    # Both scans are O(1) amortized, not O(run) (ADVICE r5: a long
    # unresolved run — candidate=='' keeps margins None — made this
    # phase O(run^2) on exactly the pathological pages the totality
    # fix targets).  Margins AFTER i are phase-1 state (this loop only
    # rewrites index i before moving right), so the nearest resolved
    # right index is precomputed once; the nearest resolved LEFT index
    # is tracked incrementally and sees this loop's own resolutions,
    # exactly like the original backward scan did.
    n_m = len(margins)
    nearest_right_idx: List[Optional[int]] = [None] * (n_m + 1)
    nr: Optional[int] = None
    for j in range(n_m - 1, -1, -1):
        nearest_right_idx[j + 1] = nr  # nearest resolved idx >= j + 1
        if margins[j][0] is not None:
            nr = j
    last_left_idx: Optional[int] = None

    unresolved: List[Tuple[int, int]] = []
    for i, (token, tag) in enumerate(word_predictions):
        if i > 0 and margins[i - 1][1] is not None:
            last_left_idx = i - 1
        m_start, m_end = margins[i]
        if m_start is not None and m_end is not None:
            restored.append(
                {
                    "char_start": str(m_start),
                    "char_end": str(m_end),
                    "token": token,
                    "tag": tag,
                }
            )
            continue

        if last_left_idx is None:
            left_margin, k_prev = 0, i + 1
        else:
            left_margin = margins[last_left_idx][1]
            k_prev = i - last_left_idx
        ridx = nearest_right_idx[i + 1] if i + 1 <= n_m else None
        if ridx is None:
            right_margin, k_next = len(input_text), n_m - i
        else:
            right_margin, k_next = margins[ridx][0], ridx - i
        if left_margin is None or right_margin is None:
            raise RuntimeError("could not locate margins around unknown token")

        candidate = input_text[left_margin:right_margin].strip()
        if k_prev != 1 or k_next != 1:
            parts = candidate.split()
            # the gap must contain exactly one word per un-anchored token
            if len(parts) == k_prev + k_next - 1:
                candidate = parts[k_prev - 1]
            else:
                candidate = ""

        if candidate:
            cs = input_text.index(candidate, left_margin)
            ce = cs + len(candidate)
            restored.append(
                {
                    "char_start": str(cs),
                    "char_end": str(ce),
                    "token": candidate,
                    "tag": tag,
                }
            )
            margins[i] = (cs, ce)  # visible to later iterations
        else:
            unresolved.append((left_margin, right_margin))

    # -- phase 3: whatever is left becomes 'O'-tagged words ----------------
    if unresolved:
        for left_margin, right_margin in set(unresolved):
            cursor = left_margin
            for word in input_text[left_margin:right_margin].split():
                cs = cursor + input_text[cursor:right_margin].index(word)
                ce = cs + len(word)
                cursor = ce
                restored.append(
                    {
                        "char_start": str(cs),
                        "char_end": str(ce),
                        "token": word,
                        "tag": "O",
                    }
                )
        restored = sorted(restored, key=lambda r: int(r["char_start"]))

    return restored


# ---------------------------------------------------------------------------
# token -> word -> entity merging (token_tags.py)
# ---------------------------------------------------------------------------

def merge_tokens_to_words(records: List[Record]) -> List[Record]:
    """Merge adjacent records where cur.char_start == prev.char_end,
    keeping the first record's tag (token_tags.py:108-143).

    Scans right-to-left like the reference so chains collapse onto the
    leftmost record.  Returns a new list; does not mutate inputs.
    """
    recs = [dict(r) for r in records]
    drop = [False] * len(recs)
    for i in range(len(recs) - 1, 0, -1):
        if recs[i]["char_start"] == recs[i - 1]["char_end"]:
            drop[i] = True
            recs[i - 1]["char_end"] = recs[i]["char_end"]
            recs[i - 1]["token"] += recs[i]["token"]
    return [r for r, d in zip(recs, drop) if not d]


def unpretokenize(
    records: List[Record], offsets: Sequence[Tuple[int, int]]
) -> List[Record]:
    """Replace each word's offsets by the saved pretokenization offsets
    (token_tags.py:145-180)."""
    if len(records) != len(offsets):
        raise ValueError(
            f"{len(records)} records vs {len(offsets)} pretokenization offsets"
        )
    out = []
    for rec, (cs, ce) in zip(records, offsets):
        r = dict(rec)
        r["char_start"] = str(cs)
        r["char_end"] = str(ce)
        out.append(r)
    return out


def autocorrect_scheme(records: List[Record], scheme: str) -> List[Record]:
    """Repair BIO/BILOU consistency over a record list (token_tags.py:51-106).

    plain records pass through untouched.  Context tags are read from the
    (mutating) list exactly like the reference: for BIO the previous tag
    is the already-repaired one; for BILOU the subsequent tag is the
    not-yet-repaired one.
    """
    if scheme == "plain":
        return records
    if scheme not in ("bio", "bilou"):
        raise ValueError(f"autocorrect not defined for scheme {scheme!r}")
    recs = [dict(r) for r in records]
    for i, rec in enumerate(recs):
        prev = recs[i - 1]["tag"] if i > 0 else None
        if scheme == "bio":
            rec["tag"] = fix_bio_tag(rec["tag"], prev)[0]
        else:
            nxt = recs[i + 1]["tag"] if i < len(recs) - 1 else None
            rec["tag"] = fix_bilou_tag(rec["tag"], prev, nxt)[0]
    return recs


def _entity_record(
    recs: List[Record], start: int, extra: int, original_text: str
) -> Record:
    """Collapse recs[start : start+extra+1] into one entity record
    (token_tags.py:364-403).  The surface is re-sliced from
    ``original_text`` so it is byte-identical to the source document.
    """
    out = dict(recs[start])
    out["tag"] = out["tag"].split("-")[-1]
    if extra > 0:
        out["char_end"] = recs[start + extra]["char_end"]
        out["token"] = original_text[int(out["char_start"]): int(out["char_end"])]
    return out


def merge_tokens_to_entities(
    records: List[Record], scheme: str, original_text: str
) -> List[Record]:
    """Collapse tagged words into entity spans (token_tags.py:182-332).

    plain : run-length merge of equal tags; 'O' dropped
    bio   : B-X followed by I-X* merges; orphan I- dropped
    bilou : B-X .. L-X merges (stop AT the L); U-X standalone; orphan I-/L- dropped
    """
    if scheme not in ("plain", "bio", "bilou"):
        raise ValueError(f"unknown scheme {scheme!r}")
    continuation = {"bio": ("I-",), "bilou": ("I-", "L-")}
    merged: List[Record] = []
    consumed_until = 0  # index before which tokens are part of an emitted entity
    n = len(records)
    for i in range(n):
        tag = records[i]["tag"]
        if tag == "O" or i < consumed_until:
            continue
        if scheme == "plain":
            extra = 0
            for j in range(i + 1, n):
                if records[j]["tag"] == tag:
                    extra += 1
                else:
                    consumed_until = j
                    break
                if j == n - 1:
                    consumed_until = j + 1
            merged.append(_entity_record(records, i, extra, original_text))
        else:
            if tag.startswith("B-"):
                plain = tag.split("-")[-1]
                extra = 0
                for j in range(i + 1, n):
                    jt = records[j]["tag"]
                    if (
                        len(jt) > 2
                        and jt[:2] in continuation[scheme]
                        and jt[2:] == plain
                    ):
                        extra += 1
                        if jt[:2] == "L-":  # bilou: L closes the entity
                            consumed_until = j + 1
                            break
                    else:
                        consumed_until = j
                        break
                    if j == n - 1:
                        consumed_until = j + 1
                merged.append(_entity_record(records, i, extra, original_text))
            elif tag.startswith("U-"):
                merged.append(_entity_record(records, i, 0, original_text))
            # orphan I- / L- are dropped
    return merged


def strip_sentencepiece_marker(records: List[Record]) -> List[Record]:
    """Remove a leading 'Ġ' and bump char_start (token_tags.py:334-352)."""
    out = []
    for rec in records:
        r = dict(rec)
        if r["token"].startswith("Ġ"):
            r["char_start"] = str(int(r["char_start"]) + 1)
            r["token"] = r["token"].lstrip("Ġ")
        out.append(r)
    return out


# ---------------------------------------------------------------------------
# char-span input normalization (data_preprocessor.py:293-316)
# ---------------------------------------------------------------------------

def resolve_overlapping_tags(tags: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """Greedy order-preserving overlap resolution: keep a span only if it
    starts at or after the previous kept span's end."""
    kept: List[Dict[str, Any]] = []
    for i, tag in enumerate(tags):
        if i == 0 or tags[i - 1]["char_end"] <= tag["char_start"]:
            kept.append(tag)
    return kept
