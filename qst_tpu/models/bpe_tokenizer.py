"""Byte-level BPE tokenizer (GPT-2 / RoBERTa scheme), self-contained.

The reference's cross-encoder relevance labeler is
``cross-encoder/stsb-roberta-large`` (reference models/evaluators.py:31),
whose vocab is byte-level BPE (``vocab.json`` + ``merges.txt``), not
WordPiece — this module closes the tokenizer side of that weights-present
path without HF tokenizers at runtime. Same batch API as
:class:`qst_tpu.models.tokenizer.WordPieceTokenizer` (fixed-shape int32
ids/mask/type arrays), RoBERTa framing: ``<s> A </s>`` and
``<s> A </s></s> B </s>`` for pairs, token types all zero
(RoBERTa is segment-blind).
"""

from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# GPT-2's pre-tokenization regex (contractions, " ?letters", " ?digits",
# " ?other", whitespace runs). The `regex` module (a transformers
# dependency, present in the image) provides the \p unicode classes.
import regex as re

_PRETOKENIZE = re.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"""
    r""" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")


@lru_cache(maxsize=1)
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte→printable-unicode table: printable latin
    bytes map to themselves, the rest shift into U+0100.."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


class RobertaBPETokenizer:
    """Greedy lowest-rank-first byte-pair merging over a GPT-2 vocab."""

    def __init__(self, vocab: Dict[str, int],
                 merges: Sequence[Tuple[str, str]],
                 bos_token: str = "<s>", eos_token: str = "</s>",
                 pad_token: str = "<pad>", unk_token: str = "<unk>",
                 mask_token: str = "<mask>"):
        self.vocab = dict(vocab)
        self.inv_vocab = {v: k for k, v in self.vocab.items()}
        self._ranks = {tuple(m): i for i, m in enumerate(merges)}
        self._byte_map = bytes_to_unicode()
        self._cache: Dict[str, List[str]] = {}
        self.cls_id = self.vocab[bos_token]
        self.sep_id = self.vocab[eos_token]
        self.pad_id = self.vocab[pad_token]
        self.unk_id = self.vocab.get(unk_token, self.vocab[eos_token])
        self.mask_id = self.vocab.get(mask_token, self.unk_id)

    @classmethod
    def from_files(cls, vocab_json: str, merges_txt: Optional[str] = None,
                   **kw) -> "RobertaBPETokenizer":
        """``merges_txt`` defaults to ``merges.txt`` next to the vocab."""
        if merges_txt is None:
            merges_txt = os.path.join(os.path.dirname(vocab_json),
                                      "merges.txt")
        with open(vocab_json, encoding="utf-8") as f:
            vocab = json.load(f)
        merges: List[Tuple[str, str]] = []
        with open(merges_txt, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#version"):
                    continue
                a, _, b = line.partition(" ")
                merges.append((a, b))
        return cls(vocab, merges, **kw)

    # ------------------------------------------------------------------
    def _bpe(self, token: str) -> List[str]:
        """Standard BPE merge loop: repeatedly merge the lowest-rank
        adjacent pair until none is mergeable."""
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        parts = list(token)
        while len(parts) > 1:
            pairs = {(parts[i], parts[i + 1]) for i in range(len(parts) - 1)}
            best = min(pairs,
                       key=lambda p: self._ranks.get(p, float("inf")))
            if best not in self._ranks:
                break
            a, b = best
            merged: List[str] = []
            i = 0
            while i < len(parts):
                if (i < len(parts) - 1 and parts[i] == a
                        and parts[i + 1] == b):
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            parts = merged
        self._cache[token] = parts
        return parts

    def tokenize(self, text: str) -> List[str]:
        out: List[str] = []
        bm = self._byte_map
        for piece in _PRETOKENIZE.findall(text):
            mapped = "".join(bm[b] for b in piece.encode("utf-8"))
            out.extend(self._bpe(mapped))
        return out

    def _token_ids(self, text: str) -> List[int]:
        return [self.vocab.get(t, self.unk_id) for t in self.tokenize(text)]

    # ---------------- WordPieceTokenizer-compatible batch API ----------
    def encode(self, text: str, text_pair: Optional[str] = None,
               max_length: int = 128
               ) -> Tuple[List[int], List[int], List[int]]:
        """→ (ids, mask, token_type_ids), unpadded. RoBERTa framing:
        ``<s> A </s>`` / ``<s> A </s></s> B </s>``; types all zero."""
        ids = [self.cls_id] + self._token_ids(text) + [self.sep_id]
        if text_pair is not None:
            ids += [self.sep_id] + self._token_ids(text_pair) + [self.sep_id]
        if len(ids) > max_length:
            ids = ids[: max_length - 1] + [self.sep_id]
        return ids, [1] * len(ids), [0] * len(ids)

    def batch_encode(self, texts: Sequence[str], max_length: int = 128,
                     text_pairs: Optional[Sequence[str]] = None
                     ) -> Tuple[np.ndarray, np.ndarray]:
        n = len(texts)
        ids_arr = np.full((n, max_length), self.pad_id, np.int32)
        mask_arr = np.zeros((n, max_length), np.int32)
        for i, text in enumerate(texts):
            pair = text_pairs[i] if text_pairs is not None else None
            ids, mask, _ = self.encode(text, pair, max_length)
            ids_arr[i, : len(ids)] = ids
            mask_arr[i, : len(mask)] = mask
        return ids_arr, mask_arr

    def batch_encode_pairs(self, pairs: Sequence[Tuple[str, str]],
                           max_length: int = 128
                           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        n = len(pairs)
        ids_arr = np.full((n, max_length), self.pad_id, np.int32)
        mask_arr = np.zeros((n, max_length), np.int32)
        type_arr = np.zeros((n, max_length), np.int32)
        for i, (a, b) in enumerate(pairs):
            ids, mask, types = self.encode(a, b, max_length)
            ids_arr[i, : len(ids)] = ids
            mask_arr[i, : len(mask)] = mask
            type_arr[i, : len(types)] = types
        return ids_arr, mask_arr, type_arr
