"""Numpy token-classification model — the real tensor-math M1/M2/M3 path.

Plays the reference's AutoModelForTokenClassification inference lifecycle
(nerblackbox/api/model.py:464-505) with actual float tensors, torch-free:

    subtoken slices
      -> embedding lookup (context-window features)        [n, seq, 3d]
      -> linear head  logits = X @ W + b                   [n, seq, L]
      -> argmax decode via id2label                        (M2, :500-505)
      -> softmax probability distributions                 (M3, :1161-1186)

The WEIGHTS are constructed, not trained: the linear head is the exact
distillation of the alias gazetteer (kgkit/ner_core/tagger.py) into an
embedding table + weight matrix — the stand-in for loading a trained
checkpoint (no torch, no HF weights in this environment).  The MATH is
the real inference path: every logit comes out of a batched matmul over
float32 tensors, argmax/softmax run on the logits tensor exactly like
the reference's decode, and golden tests pin the numerics.

Exactness: dictionary feature keys embed as reserved orthogonal basis
dimensions; out-of-dictionary tokens embed as seeded pseudo-random noise
confined to the complementary subspace, where every weight is zero.  The
margins (8 bigram-start > 6 bigram-continuation > 4 single-word > 2
O-bias) therefore reproduce the gazetteer's greedy-longest-match
priority bit-exactly — argmax(logits) == GazetteerTagger.tag_slice on
every input, which keeps the whole downstream span pipeline and the
DuckDB oracles valid for this model (differential test:
tests/test_nn_tagger.py).
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from kgkit.ner_core.tagger import DEFAULT_GAZETTEER
from kgkit.ner_core.wordpiece import CLS, PAD, SEP, UNK

EMB_DIM = 32          # d; features are a 3-channel window -> hidden 3d
_MARGIN_BIGRAM_B = 8.0
_MARGIN_BIGRAM_I = 6.0
_MARGIN_SINGLE = 4.0
_O_BIAS = 2.0


class NumpyTagger:
    """Batched numpy forward pass + argmax/softmax decode.

    Drop-in for GazetteerTagger inside kgkit.ner_core.pipeline (same
    tag_slice / tag_slice_proba / annotation_classes surface) plus the
    tensor API the reference exposes: ``forward`` -> logits,
    ``decode_argmax``, ``decode_proba``, ``id2label``.
    """

    def __init__(self, gazetteer: Optional[Dict[Tuple[str, ...], str]] = None,
                 seed: int = 1234):
        gaz = dict(gazetteer) if gazetteer is not None else dict(DEFAULT_GAZETTEER)
        self.seed = seed
        self._bigrams = {k: v for k, v in gaz.items() if len(k) == 2}
        self._singles = {k[0]: v for k, v in gaz.items() if len(k) == 1}
        if any(len(k) > 2 for k in gaz):
            raise ValueError("NumpyTagger distills 1- and 2-word phrases only")
        # exactness precondition (same property the DuckDB oracles rely
        # on, kgkit/oracles.py module docstring): a word must never be
        # both a consumed bigram second-word and a bigram first-word,
        # or greedy matching stops being a local decision
        firsts = {k[0] for k in self._bigrams}
        seconds = {k[1] for k in self._bigrams}
        if firsts & seconds:
            raise ValueError(
                "gazetteer bigram first-words and second-words overlap: "
                f"{sorted(firsts & seconds)} — greedy matching is not "
                "locally decidable, linear distillation would diverge"
            )

        plain = sorted(set(gaz.values()))
        self.annotation_classes: List[str] = (
            ["O"] + [f"{p}-{c}" for p in ("B", "I") for c in plain]
        )
        self.id2label: Dict[int, str] = dict(enumerate(self.annotation_classes))
        self.label2id = {v: k for k, v in self.id2label.items()}
        L = len(self.annotation_classes)

        # embedding table: one reserved orthogonal dim per dictionary
        # feature key; everything else hashes into the noise subspace
        keys = ["|".join(k) for k in sorted(self._bigrams)] + sorted(self._singles)
        if len(keys) >= EMB_DIM:
            raise ValueError("EMB_DIM must exceed the dictionary feature count")
        self._key_dim = {k: i for i, k in enumerate(keys)}
        self._noise_lo = len(keys)
        self._emb_cache: Dict[str, np.ndarray] = {}

        # linear head [3d, L]: channel 0 = (word|next) bigram features,
        # channel 1 = (prev|word), channel 2 = word
        W = np.zeros((3 * EMB_DIM, L), dtype=np.float32)
        for bg, cls in self._bigrams.items():
            dim = self._key_dim["|".join(bg)]
            W[0 * EMB_DIM + dim, self.label2id[f"B-{cls}"]] = _MARGIN_BIGRAM_B
            W[1 * EMB_DIM + dim, self.label2id[f"I-{cls}"]] = _MARGIN_BIGRAM_I
        for w, cls in self._singles.items():
            dim = self._key_dim[w]
            W[2 * EMB_DIM + dim, self.label2id[f"B-{cls}"]] = _MARGIN_SINGLE
        self.W = W
        self.b = np.zeros(L, dtype=np.float32)
        self.b[self.label2id["O"]] = _O_BIAS

    # -- embedding ---------------------------------------------------------
    def _embed(self, key: str) -> np.ndarray:
        """Deterministic embedding: basis vector for dictionary keys,
        seeded unit noise in the weight-free subspace otherwise."""
        vec = self._emb_cache.get(key)
        if vec is not None:
            return vec
        vec = np.zeros(EMB_DIM, dtype=np.float32)
        dim = self._key_dim.get(key)
        if dim is not None:
            vec[dim] = 1.0
        else:
            h = int.from_bytes(
                hashlib.md5(f"{self.seed}:{key}".encode()).digest()[:8], "big"
            )
            rng = np.random.default_rng(h)
            noise = rng.standard_normal(EMB_DIM - self._noise_lo)
            noise /= np.linalg.norm(noise) or 1.0
            vec[self._noise_lo:] = noise
        if len(self._emb_cache) < 262_144:
            self._emb_cache[key] = vec
        return vec

    @staticmethod
    def _words_of_slice(
        subtokens: Sequence[str], tokenizer_type: str = "WordPiece"
    ) -> Tuple[List[str], List[int]]:
        """Reconstruct words under either piece convention; -1 marks
        specials (the shared grouping of wordpiece.group_subtokens —
        same words as GazetteerTagger.tag_slice by construction)."""
        from kgkit.ner_core.wordpiece import group_subtokens

        return group_subtokens(subtokens, tokenizer_type)

    # -- M1: forward pass --------------------------------------------------
    def forward(
        self,
        slices: Sequence[Sequence[str]],
        tokenizer_type: str = "WordPiece",
    ) -> np.ndarray:
        """slices of subtokens -> logits [n_slices, seq_length, num_labels]
        (the shape contract of api/model.py:472-475).  One batched matmul;
        python only assembles integer feature lookups.  Features are
        word-keyed, so either piece convention yields the same logits
        for the same text."""
        n = len(slices)
        seq = max((len(s) for s in slices), default=0)
        X = np.zeros((n, seq, 3 * EMB_DIM), dtype=np.float32)
        for si, subtokens in enumerate(slices):
            words, word_of = self._words_of_slice(subtokens, tokenizer_type)
            lowered = [w.lower() for w in words]
            for pos, wi in enumerate(word_of):
                if wi < 0:
                    continue  # special token: zero features -> O wins on bias
                w = lowered[wi]
                nxt = lowered[wi + 1] if wi + 1 < len(lowered) else ""
                prv = lowered[wi - 1] if wi > 0 else ""
                X[si, pos, 0:EMB_DIM] = self._embed(f"{w}|{nxt}")
                X[si, pos, EMB_DIM:2 * EMB_DIM] = self._embed(f"{prv}|{w}")
                X[si, pos, 2 * EMB_DIM:] = self._embed(w)
        logits = X.reshape(n * seq, 3 * EMB_DIM) @ self.W + self.b
        return logits.reshape(n, seq, len(self.annotation_classes))

    # -- M2: argmax decode -------------------------------------------------
    def decode_argmax(self, logits: np.ndarray) -> List[List[str]]:
        """argmax over the label axis, mapped through id2label
        (api/model.py:497-505)."""
        ids = np.argmax(logits, axis=2)
        return [[self.id2label[int(i)] for i in row] for row in ids]

    # -- M3: softmax proba -------------------------------------------------
    def decode_proba(self, logits: np.ndarray) -> List[List[Dict[str, float]]]:
        """Numerically-stable softmax over the label axis, returned as
        per-position {class: probability} dicts
        (turn_tensors_into_tag_probability_distributions,
        api/model.py:1161-1186)."""
        z = logits.astype(np.float64)
        z -= z.max(axis=2, keepdims=True)
        e = np.exp(z)
        p = e / e.sum(axis=2, keepdims=True)
        classes = self.annotation_classes
        return [
            [dict(zip(classes, row.tolist())) for row in doc]
            for doc in p
        ]

    # -- pipeline-compatible surface ---------------------------------------
    # trailing [PAD] positions all share the bias-only logits, so the
    # fast path trims them before the forward pass and back-fills the
    # (shared, never-mutated) constant result — with padding to
    # max_seq_length=1024 the padded tail dominates realistic slices
    @staticmethod
    def _content_len(subtokens: Sequence[str]) -> int:
        n = len(subtokens)
        while n > 0 and subtokens[n - 1] in (PAD, "<pad>"):
            n -= 1
        return n

    def _pad_dist(self) -> Dict[str, float]:
        cached = getattr(self, "_pad_dist_cache", None)
        if cached is None:
            z = (np.zeros((1, self.W.shape[0]), dtype=np.float32)
                 @ self.W + self.b)  # width from W: trained head has
            # one more (trigram) channel than the distilled model
            cached = self.decode_proba(
                z.reshape(1, 1, len(self.annotation_classes))
            )[0][0]
            self._pad_dist_cache = cached
        return cached

    def tag_slice(
        self, subtokens: Sequence[str], tokenizer_type: str = "WordPiece"
    ) -> List[str]:
        n = self._content_len(subtokens)
        tags = self.decode_argmax(
            self.forward([subtokens[:n]], tokenizer_type)
        )[0][:n]
        return tags + ["O"] * (len(subtokens) - n)

    def tag_slice_proba(
        self, subtokens: Sequence[str], tokenizer_type: str = "WordPiece"
    ) -> List[Dict[str, float]]:
        n = self._content_len(subtokens)
        out = self.decode_proba(
            self.forward([subtokens[:n]], tokenizer_type)
        )[0][:n]
        return out + [self._pad_dist()] * (len(subtokens) - n)


    # -- S7: checkpoint source ---------------------------------------------
    # the reference loads trained weights from an on-disk checkpoint
    # (AutoModelForTokenClassification.from_pretrained); same lifecycle
    # here over an .npz — save() the constructed weights once, ship the
    # file with --files, and every executor load()s it locally (memoized
    # via checkpoint_tagger below)
    def save(self, path: str) -> None:
        """Serialize the full model state to one .npz checkpoint."""
        np.savez(
            path if path.endswith(".npz") else path + ".npz",
            W=self.W,
            b=self.b,
            seed=np.int64(self.seed),
            classes=np.array(self.annotation_classes),
            keys=np.array(sorted(self._key_dim, key=self._key_dim.get)),
            bigrams=np.array(
                [f"{a}|{b_}\t{c}" for (a, b_), c in sorted(self._bigrams.items())]
            ),
            singles=np.array(
                [f"{w}\t{c}" for w, c in sorted(self._singles.items())]
            ),
        )

    @classmethod
    def load(cls, path: str) -> "NumpyTagger":
        """Rebuild from a checkpoint; loaded tensors must equal the
        reconstruction bit-for-bit (asserted) — a corrupted or
        version-skewed checkpoint fails loudly, not silently."""
        ckpt = np.load(path if path.endswith(".npz") else path + ".npz")
        gaz = {}
        for row in ckpt["bigrams"]:
            phrase, c = str(row).split("\t")
            a, b = phrase.split("|")
            gaz[(a, b)] = c
        for row in ckpt["singles"]:
            w, c = str(row).split("\t")
            gaz[(w,)] = c
        model = cls(gaz, seed=int(ckpt["seed"]))
        if not (np.array_equal(model.W, ckpt["W"])
                and np.array_equal(model.b, ckpt["b"])
                and model.annotation_classes == [str(c) for c in ckpt["classes"]]):
            raise ValueError(f"checkpoint {path} does not match this model version")
        model.W = ckpt["W"]
        model.b = ckpt["b"]
        return model


_DEFAULT: Optional[NumpyTagger] = None
_CKPT_CACHE: Dict[str, NumpyTagger] = {}


def default_numpy_tagger() -> NumpyTagger:
    """Process-wide singleton (executor-local model cache, SURVEY §4.3.4)."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = NumpyTagger()
    return _DEFAULT


def load_checkpoint(path: str):
    """S7 checkpoint dispatch by the npz ``kind`` field: 'trained' ->
    kgkit.ner_core.trained.TrainedTagger (hash-feature trained head),
    anything else -> the distilled NumpyTagger format."""
    ckpt = np.load(path if path.endswith(".npz") else path + ".npz")
    if "kind" in getattr(ckpt, "files", []) and str(ckpt["kind"]) == "trained":
        from kgkit.ner_core.trained import TrainedTagger

        return TrainedTagger.load(path)
    return NumpyTagger.load(path)


def checkpoint_tagger(path: str):
    """Executor-local checkpoint load, memoized per path: each python
    worker deserializes the weights once, like the reference's
    per-process from_pretrained model cache."""
    model = _CKPT_CACHE.get(path)
    if model is None:
        model = load_checkpoint(path)
        if len(_CKPT_CACHE) < 16:
            _CKPT_CACHE[path] = model
    return model
