"""TRAINED numpy token-classification head — the non-distilled M1/M2/M3 path.

Where kgkit.ner_core.nn_tagger.NumpyTagger is a provably-lossless
distillation of the gazetteer (its argmax can never disagree with the
rule tagger), this model is the real thing the reference lifecycle
implies (nerblackbox/api/model.py:464-505): a checkpoint of weights fit
by seeded gradient descent on a synthetic distantly-supervised corpus
(tools/train_tagger.py), whose predictions CAN and DO disagree with the
gazetteer — the whole W1-W8 post-processing lifecycle downstream of it
therefore runs on genuinely model-derived tags, and the DuckDB oracle
checks the forward pass itself (embedding lookup -> matmul -> argmax /
softmax re-computed relationally, kgkit/oracles.py trained CTEs).

Architecture (identical feature definition in numpy and SQL):
  * four context channels per word position — (word|next), (prev|word),
    (word), and the trigram CONJUNCTION (prev|word|next) — with '' at
    slice boundaries and '[unk]' for words the WordPiece vocabulary
    cannot tokenize, exactly the view ``_words_of_slice`` gives the
    distilled model.  The trigram channel is what makes the head more
    than a sum of pairwise cues: a pattern that only holds when BOTH
    neighbours match (e.g. X between two specific words) is linearly
    representable through its hashed key, so the error profile is no
    longer token-local;
  * FEATURE-HASHED sparse sign embeddings: key k activates N_HASH=4
    dims of an EMB_DIM=32-wide channel with ±1 signs, both derived from
    md5(k) hex bytes — md5 is the one hash Spark-side python and DuckDB
    evaluate identically, which is what makes the forward pass itself
    oracle-checkable (the distilled model's gaussian-noise embeddings
    were not);
  * a TWO-LAYER head (r4): z1 = X @ W1 + b1 -> h = relu(z1) ->
    logits = h @ W2 + b2 over H=32 hidden units.  The nonlinearity is
    what a linear head structurally lacks: hidden units fire on
    CONJUNCTIONS of hashed context features and the second layer reads
    them out, so the model is no longer a sum of per-feature votes.

Exact cross-engine arithmetic: all weights are QUANTIZED to 1/Q grids
(Wq integer, |Wq| < 2^15).  Every entry of X is a small integer (sum of
±1 over <= N_HASH dims), so z1 is an integer multiple of 1/Q below
2^19; relu is exact on that grid (max with 0); h*W2 products are
integer multiples of 1/Q^2 below 2^34 and their sums below 2^39 — all
exactly representable in float64 (53-bit mantissa), independent of
summation order.  The float64 logits are therefore bit-equal to the
BIGINT arithmetic the oracle runs in units of 1/Q^2:
``sum(max(h1_num, 0) * w2q) + b2q*Q``, and argmax (numpy takes the
FIRST maximal index == ORDER BY z DESC, cls_id ASC) matches
tie-for-tie.
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from kgkit.ner_core.nn_tagger import NumpyTagger

EMB_DIM = 32       # dims per channel
N_CH = 4           # (w|n), (p|w), (w), (p|w|n) -> 128 features
N_HASH = 4         # active dims per feature key
N_HIDDEN = 32      # relu units of the two-layer head
Q = 1024           # weight quantization grid (power of two: /Q is exact)
Z_GRID = Q * Q     # logits live on the 1/Q^2 grid (two quantized layers)

_ODD_HEX = set("13579bdf")

DEFAULT_CKPT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "checkpoints", "trained_v3.npz"
)


def feature_dims(key: str) -> List[tuple]:
    """The N_HASH (dim, sign) activations of a feature key.

    dim_i = int(md5hex[2i:2i+2], 16) % EMB_DIM   for i in 0..N_HASH-1
    sign_i = +1 iff md5hex[8+i] is an odd hex digit else -1

    The same bytes are read by the oracle SQL
    (kgkit/oracles.py trained_contrib fragment) — change BOTH or neither.
    """
    h = hashlib.md5(key.encode("utf-8")).hexdigest()
    return [
        (int(h[2 * i: 2 * i + 2], 16) % EMB_DIM,
         1 if h[8 + i] in _ODD_HEX else -1)
        for i in range(N_HASH)
    ]


def embed_key(key: str) -> np.ndarray:
    """Dense EMB_DIM vector of one key (duplicate dims accumulate)."""
    v = np.zeros(EMB_DIM, dtype=np.float32)
    for dim, sign in feature_dims(key):
        v[dim] += sign
    return v


class TrainedTagger:
    """Checkpoint-loaded trained head with the NumpyTagger surface
    (tag_slice / tag_slice_proba / annotation_classes / forward /
    decode_argmax / decode_proba / id2label)."""

    def __init__(self, W1: np.ndarray, b1: np.ndarray, W2: np.ndarray,
                 b2: np.ndarray, classes: Sequence[str]):
        W1 = np.asarray(W1, dtype=np.float64)
        b1 = np.asarray(b1, dtype=np.float64)
        W2 = np.asarray(W2, dtype=np.float64)
        b2 = np.asarray(b2, dtype=np.float64)
        L = len(classes)
        if (W1.shape != (N_CH * EMB_DIM, N_HIDDEN) or b1.shape != (N_HIDDEN,)
                or W2.shape != (N_HIDDEN, L) or b2.shape != (L,)):
            raise ValueError(
                f"bad trained head shapes {W1.shape}/{b1.shape}/"
                f"{W2.shape}/{b2.shape}"
            )
        for arr in (W1 * Q, b1 * Q, W2 * Q, b2 * Q):
            if not (np.array_equal(arr, np.rint(arr))
                    and np.abs(arr).max() < 2 ** 15):
                raise ValueError(
                    "trained weights must lie on the 1/%d grid with "
                    "|Wq| < 2^15 (the exact-arithmetic precondition of "
                    "the oracle twin)" % Q
                )
        self.W1, self.b1, self.W2, self.b2 = W1, b1, W2, b2
        self.annotation_classes: List[str] = list(classes)
        self.id2label: Dict[int, str] = dict(enumerate(self.annotation_classes))
        self.label2id = {v: k for k, v in self.id2label.items()}
        self._emb_cache: Dict[str, np.ndarray] = {}

    # -- embedding ---------------------------------------------------------
    def _embed(self, key: str) -> np.ndarray:
        vec = self._emb_cache.get(key)
        if vec is None:
            vec = embed_key(key)
            if len(self._emb_cache) < 262_144:
                self._emb_cache[key] = vec
        return vec

    # -- M1: forward pass --------------------------------------------------
    def forward(
        self,
        slices: Sequence[Sequence[str]],
        tokenizer_type: str = "WordPiece",
    ) -> np.ndarray:
        """subtoken slices -> logits [n_slices, seq, num_labels]; two
        batched float64 matmuls with a relu between, exact on the 1/Q^2
        grid (module docstring).  Features are word-keyed (the shared
        grouping handles either piece convention), so the SQL oracle's
        word-level forward pass is convention-independent."""
        n = len(slices)
        seq = max((len(s) for s in slices), default=0)
        X = np.zeros((n, seq, N_CH * EMB_DIM), dtype=np.float64)
        for si, subtokens in enumerate(slices):
            words, word_of = NumpyTagger._words_of_slice(subtokens, tokenizer_type)
            lowered = [w.lower() for w in words]
            for pos, wi in enumerate(word_of):
                if wi < 0:
                    continue  # special token: zero features -> bias decides
                w = lowered[wi]
                nxt = lowered[wi + 1] if wi + 1 < len(lowered) else ""
                prv = lowered[wi - 1] if wi > 0 else ""
                X[si, pos, 0:EMB_DIM] = self._embed(f"{w}|{nxt}")
                X[si, pos, EMB_DIM:2 * EMB_DIM] = self._embed(f"{prv}|{w}")
                X[si, pos, 2 * EMB_DIM:3 * EMB_DIM] = self._embed(w)
                X[si, pos, 3 * EMB_DIM:] = self._embed(f"{prv}|{w}|{nxt}")
        h = np.maximum(X.reshape(n * seq, N_CH * EMB_DIM) @ self.W1
                       + self.b1, 0.0)
        logits = h @ self.W2 + self.b2
        return logits.reshape(n, seq, len(self.annotation_classes))

    # -- M2/M3 decode: identical semantics to the distilled model ----------
    decode_argmax = NumpyTagger.decode_argmax
    decode_proba = NumpyTagger.decode_proba
    _content_len = staticmethod(NumpyTagger._content_len)
    tag_slice = NumpyTagger.tag_slice
    tag_slice_proba = NumpyTagger.tag_slice_proba

    def _pad_dist(self):
        cached = getattr(self, "_pad_dist_cache", None)
        if cached is None:
            z = np.maximum(self.b1, 0.0) @ self.W2 + self.b2
            cached = self.decode_proba(
                z.reshape(1, 1, len(self.annotation_classes))
            )[0][0]
            self._pad_dist_cache = cached
        return cached

    # -- S7 checkpoint lifecycle -------------------------------------------
    def save(self, path: str) -> None:
        np.savez(
            path if path.endswith(".npz") else path + ".npz",
            kind=np.array("trained"),
            W1=self.W1, b1=self.b1, W2=self.W2, b2=self.b2,
            classes=np.array(self.annotation_classes),
            emb_dim=np.int64(EMB_DIM),
            n_ch=np.int64(N_CH),
            n_hidden=np.int64(N_HIDDEN),
            n_hash=np.int64(N_HASH),
            q=np.int64(Q),
        )

    @classmethod
    def load(cls, path: str) -> "TrainedTagger":
        ckpt = np.load(path if path.endswith(".npz") else path + ".npz")
        if str(ckpt.get("kind", "")) != "trained":
            raise ValueError(f"{path} is not a trained-head checkpoint")
        if (int(ckpt["emb_dim"]) != EMB_DIM or int(ckpt["n_hash"]) != N_HASH
                or int(ckpt.get("n_ch", 3)) != N_CH or int(ckpt["q"]) != Q
                or "W1" not in ckpt
                or int(ckpt.get("n_hidden", 0)) != N_HIDDEN):
            raise ValueError(
                f"checkpoint {path} was written for a different feature "
                "spec — retrain with tools/train_tagger.py"
            )
        return cls(ckpt["W1"], ckpt["b1"], ckpt["W2"], ckpt["b2"],
                   [str(c) for c in ckpt["classes"]])


_DEFAULT: Optional[TrainedTagger] = None


def default_trained_tagger() -> TrainedTagger:
    """Process-wide singleton over the packaged checkpoint (executor-
    local model cache, SURVEY §4.3.4); the checkpoint file ships with
    the package (it lives inside kgkit/), so --py-files delivery covers
    it on a real cluster."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = TrainedTagger.load(DEFAULT_CKPT)
    return _DEFAULT


# oracle preconditions (kgkit/oracles.py _trained_tags_cte): the SQL
# twin recomputes the forward pass with DOCUMENT-level lag/lead
# contexts and assumes every printable-ASCII word WordPiece-tokenizes
# to real pieces.  Both assumptions have bounds the current corpora sit
# far inside; assert them in the query path so a corpus change fails
# loudly instead of silently drifting from the oracle.
_MAX_ASCII_WORD = 99    # >= 100 pieces -> [UNK] (wordpiece cap), but the
                        # oracle keys lower(word) for any '^[!-~]+$' match
_MAX_DOC_CHARS = 1022   # pieces-per-doc <= chars-per-doc; one slice holds
                        # 1022 content subtokens, and multi-slice docs use
                        # slice-bounded '' contexts the SQL does not


def assert_oracle_bounds(texts: Sequence[str]) -> None:
    """Raise if a document could diverge from the trained-head SQL
    oracle: a multi-slice doc (conservatively: > 1022 chars, since a
    word never yields more pieces than characters) or a printable-ASCII
    word long enough to hit the tokenizer's [UNK] piece cap."""
    for t in texts:
        if t is None:
            continue
        if len(t) > _MAX_DOC_CHARS:
            raise ValueError(
                f"document of {len(t)} chars may span WordPiece slices; "
                "the trained-head oracle assumes single-slice documents "
                f"(<= {_MAX_DOC_CHARS} chars is the safe bound)"
            )
        for w in t.split(" "):
            if len(w) > _MAX_ASCII_WORD and w.isascii() and w.isprintable():
                raise ValueError(
                    f"printable-ASCII word of {len(w)} chars exceeds the "
                    f"tokenizer's piece cap; the oracle would key "
                    "lower(word) while the model sees [UNK]"
                )
