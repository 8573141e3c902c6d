"""Tag-scheme algebra: plain / BIO / BILOU conversions and repairs.

Parity targets (reference = flxst/nerblackbox, read-only at /root/reference):
  * scheme conversions   -> nerblackbox/modules/ner_training/annotation_tags/tags.py:15-222
  * BIO autocorrect      -> tags.py:271-303 (convert_tag_bio2bio)
  * BILOU autocorrect    -> tags.py:305-374 (convert_tag_bilou2bilou)
  * IOB1 -> IOB2         -> nerblackbox/modules/datasets/formatter/base_formatter.py:316-369

Tags are plain Python strings; sequences are lists.  A tag is either
"O" or "<prefix>-<class>" with prefix in {B, I, L, U} (scheme-dependent),
or a bare "<class>" in the plain scheme.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

SCHEMES = ("plain", "bio", "bilou")


def _cls(tag: str) -> str:
    """Plain class of a tag: 'B-ORG' -> 'ORG', 'ORG' -> 'ORG'."""
    return tag.split("-")[-1]


# ---------------------------------------------------------------------------
# scheme validation (reference: tags.py:73-96)
# ---------------------------------------------------------------------------

def _check_tags(tags: Sequence[str], scheme: str) -> None:
    for i, tag in enumerate(tags):
        if tag == "O":
            continue
        prefixed = len(tag) > 2 and tag[1] == "-"
        if scheme == "plain":
            ok = not prefixed
        elif scheme == "bio":
            ok = prefixed and tag[0] in "BI"
        elif scheme == "bilou":
            ok = prefixed and tag[0] in "BILU"
        else:
            raise ValueError(f"unknown scheme {scheme!r}")
        if not ok:
            raise ValueError(
                f"tag {tag!r} at index {i} does not match scheme {scheme!r}"
            )


# ---------------------------------------------------------------------------
# directed conversions (reference: tags.py:98-222)
# ---------------------------------------------------------------------------

def plain_to_bio(tags: Sequence[str]) -> List[str]:
    """['O','ORG','ORG'] -> ['O','B-ORG','I-ORG'] (tags.py:98-132)."""
    out: List[str] = []
    prev: Optional[str] = None
    for tag in tags:
        if tag == "O":
            out.append("O")
        elif prev is None or tag != prev:
            out.append(f"B-{tag}")
        else:
            out.append(f"I-{tag}")
        prev = tag
    return out


def plain_to_bilou(tags: Sequence[str]) -> List[str]:
    """['O','ORG','ORG'] -> ['O','B-ORG','L-ORG'] (tags.py:134-180)."""
    n = len(tags)
    out: List[str] = []
    for i, tag in enumerate(tags):
        if tag == "O":
            out.append("O")
            continue
        starts = i == 0 or tags[i - 1] != tag
        ends = i == n - 1 or tags[i + 1] != tag
        if starts and ends:
            out.append(f"U-{tag}")
        elif starts:
            out.append(f"B-{tag}")
        elif ends:
            out.append(f"L-{tag}")
        else:
            out.append(f"I-{tag}")
    return out


def to_plain(tags: Sequence[str]) -> List[str]:
    """Strip any prefix: ['O','B-ORG','I-ORG'] -> ['O','ORG','ORG'] (tags.py:182-192)."""
    return [_cls(t) for t in tags]


def bilou_to_bio(tags: Sequence[str]) -> List[str]:
    """U- -> B-, L- -> I-, rest unchanged (tags.py:194-222)."""
    out: List[str] = []
    for tag in tags:
        if tag.startswith("U-"):
            out.append(f"B-{_cls(tag)}")
        elif tag.startswith("L-"):
            out.append(f"I-{_cls(tag)}")
        else:
            out.append(tag)
    return out


def convert_scheme(tags: Sequence[str], source: str, target: str) -> List[str]:
    """Dispatch over the 6 directed conversions (tags.py:15-53).

    bio -> bilou goes through the repair pass, exactly like the reference.
    """
    _check_tags(tags, source)
    if source == target:
        return list(tags)
    if source == "plain" and target == "bio":
        return plain_to_bio(tags)
    if source == "plain" and target == "bilou":
        return plain_to_bilou(tags)
    if source in ("bio", "bilou") and target == "plain":
        return to_plain(tags)
    if source == "bio" and target == "bilou":
        return fix_scheme(tags, "bilou")[0]
    if source == "bilou" and target == "bio":
        return bilou_to_bio(tags)
    raise ValueError(f"conversion {source} -> {target} not supported")


# ---------------------------------------------------------------------------
# annotation-scheme repair / autocorrect (ASR)
# ---------------------------------------------------------------------------

def fix_bio_tag(current: str, previous: Optional[str]) -> Tuple[str, bool]:
    """Repair one BIO tag given its predecessor (tags.py:271-303).

    Rule: I-X whose predecessor is neither B-X nor I-X becomes B-X.
    Returns (repaired_tag, was_changed).
    """
    if current == "O" or current.startswith("B-"):
        return current, False
    if not (current.startswith("I-") and len(current) > 2):
        raise ValueError(f"bad bio tag {current!r}")
    plain = _cls(current)
    if previous is None or previous not in (f"B-{plain}", f"I-{plain}"):
        return f"B-{plain}", True
    return f"I-{plain}", False


def fix_bilou_tag(
    current: str, previous: Optional[str], subsequent: Optional[str]
) -> Tuple[str, bool]:
    """Repair one BILOU tag given its neighbours (tags.py:305-374).

    The reference applies its four rewrite rules in a fixpoint loop with
    this precedence (replicated here exactly):
      I + bad-next      -> L      (then the L/B rules may fire again)
      bad-prev + I      -> B
      bad-prev + L      -> B
      B + bad-next      -> U
    """
    if current == "O" or current.startswith("U-"):
        return current, False
    if not (len(current) > 2 and current[0] in "BIL" and current[1] == "-"):
        raise ValueError(f"bad bilou tag {current!r}")
    plain = _cls(current)
    bad_prev = previous is None or previous not in (f"B-{plain}", f"I-{plain}")
    bad_next = subsequent is None or subsequent not in (f"I-{plain}", f"L-{plain}")
    changed = False
    while True:
        if current.startswith("I-"):
            if bad_next:
                current, changed = f"L-{plain}", True
            elif bad_prev:
                current, changed = f"B-{plain}", True
            else:
                break
        elif current.startswith("L-"):
            if bad_prev:
                current, changed = f"B-{plain}", True
            else:
                break
        elif current.startswith("B-"):
            if bad_next:
                current, changed = f"U-{plain}", True
            else:
                break
        else:  # U-
            break
    return current, changed


def fix_scheme(tags: Sequence[str], scheme: str) -> Tuple[List[str], float]:
    """Repair a whole sequence; returns (repaired, abidance) (tags.py:224-266).

    abidance = fraction of tags that did NOT need repair.  Neighbour
    context is always taken from the ORIGINAL sequence (like the
    reference, which indexes self.tag_list, not the repaired output).

    Deliberate divergence: on an EMPTY sequence the reference returns
    nan (np.mean of an empty array, tags.py:265); we define abidance as
    1.0 there — nothing needed repair — so downstream aggregations
    never see NaN.
    """
    n = len(tags)
    repaired: List[str] = []
    changed_flags: List[bool] = []
    for i in range(n):
        prev = tags[i - 1] if i > 0 else None
        if scheme == "bio":
            new, changed = fix_bio_tag(tags[i], prev)
        elif scheme == "bilou":
            nxt = tags[i + 1] if i < n - 1 else None
            new, changed = fix_bilou_tag(tags[i], prev, nxt)
        else:
            raise ValueError(f"fix_scheme not defined for scheme {scheme!r}")
        repaired.append(new)
        changed_flags.append(changed)
    abidance = 1.0 if n == 0 else float(1 - sum(changed_flags) / n)
    return repaired, abidance


# ---------------------------------------------------------------------------
# IOB1 -> IOB2 (reference: base_formatter.py:316-369)
# ---------------------------------------------------------------------------

def iob1_to_iob2(tags: Sequence[str]) -> List[str]:
    """Convert one sentence of IOB1 tags to IOB2.

    An I-X tag becomes B-X unless the previous tag is I-X or B-X.
    Tags that are 'O', un-prefixed, or already B-* pass through.
    """
    out: List[str] = []
    for i, tag in enumerate(tags):
        if tag == "O" or "-" not in tag or tag.startswith("B-"):
            out.append(tag)
        elif tag.startswith("I-"):
            prev = tags[i - 1] if i > 0 else None
            if prev not in (tag, tag.replace("I-", "B-", 1)):
                out.append(tag.replace("I-", "B-", 1))
            else:
                out.append(tag)
        else:
            out.append(tag)
    return out
