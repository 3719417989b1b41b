"""MLM insert/substitute augmentation, batched on device.

Equivalent of ``nlpaug.ContextualWordEmbsAug(action="substitute"|"insert")``
as the reference configures it (aug ranges at
positive_examples_selection.py:162-168,
partially_positive_examples_selection.py:125-132,173-180): mask or insert
positions at the word level, score ALL texts in one TPU forward, sample
replacements from the top-k vocabulary predictions.

Requires an invertible tokenizer (WordPieceTokenizer); quality tracks the MLM
checkpoint loaded into the head — with random weights the mechanism still
exercises end-to-end (hermetic tests).
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax.numpy as jnp
import numpy as np

from qst_tpu.core.config import EncoderConfig
from qst_tpu.models.mlm import mlm_logits_fn
from qst_tpu.models.tokenizer import WordPieceTokenizer


class MLMAugmenter:
    def __init__(
        self,
        cfg: EncoderConfig,
        params: Any,
        tokenizer: WordPieceTokenizer,
        action: str = "substitute",
        aug_min: int = 1,
        aug_max: int = 2,
        top_k: int = 10,
        seed: int = 14,
    ):
        if action not in ("substitute", "insert"):
            raise ValueError(f"action must be substitute/insert, {action} given")
        if aug_min < 0 or aug_max < aug_min:
            raise ValueError(f"invalid aug range [{aug_min}, {aug_max}]")
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.action = action
        self.aug_min = aug_min
        self.aug_max = aug_max
        self.top_k = top_k
        self._fwd = mlm_logits_fn(cfg)
        self._rng = np.random.default_rng(seed)
        self._special = {tokenizer.pad_id, tokenizer.cls_id, tokenizer.sep_id,
                         tokenizer.unk_id, tokenizer.mask_id}

    def _prepare(self, text: str):
        """→ (ids-with-masks, mask positions). Word-level masking: each
        chosen word's first piece becomes [MASK] (substitute) or a [MASK] is
        spliced before a word boundary (insert)."""
        tok = self.tokenizer
        words = text.split(" ")
        if not words:
            return None
        n = int(self._rng.integers(self.aug_min, self.aug_max + 1))
        n = min(max(n, 0), len(words))
        if n == 0:
            return None
        positions = sorted(
            int(i) for i in self._rng.choice(len(words), size=n, replace=False))

        ids: List[int] = [tok.cls_id]
        mask_slots: List[int] = []
        for wi, word in enumerate(words):
            pieces = [tok.vocab.get(p, tok.unk_id) for p in tok.wordpiece(word)]
            if self.action == "insert" and wi in positions:
                mask_slots.append(len(ids))
                ids.append(tok.mask_id)
                ids.extend(pieces)
            elif self.action == "substitute" and wi in positions:
                mask_slots.append(len(ids))
                ids.append(tok.mask_id)
                ids.extend(pieces[1:])  # keep continuation pieces
            else:
                ids.extend(pieces)
        ids.append(tok.sep_id)
        max_len = self.cfg.max_seq_length
        if len(ids) > max_len:
            ids = ids[: max_len - 1] + [tok.sep_id]
            mask_slots = [s for s in mask_slots if s < max_len - 1]
        return ids, mask_slots

    def _decode(self, ids: Sequence[int]) -> str:
        tok = self.tokenizer
        words: List[str] = []
        for i in ids:
            if i in (tok.cls_id, tok.sep_id, tok.pad_id):
                continue
            piece = tok.inv_vocab.get(int(i), tok.unk_token)
            if piece.startswith("##") and words:
                words[-1] += piece[2:]
            else:
                words.append(piece)
        return " ".join(words)

    def augment(self, texts) -> List[str]:
        if isinstance(texts, str):
            texts = [texts]
        prepared = [self._prepare(t) for t in texts]
        S = self.cfg.max_seq_length
        batch_ids = np.full((len(texts), S), self.tokenizer.pad_id, np.int32)
        batch_mask = np.zeros((len(texts), S), np.int32)
        for row, prep in enumerate(prepared):
            if prep is None:
                continue
            ids, _ = prep
            batch_ids[row, : len(ids)] = ids
            batch_mask[row, : len(ids)] = 1

        logits = np.asarray(self._fwd(self.params, jnp.asarray(batch_ids),
                                      jnp.asarray(batch_mask)))
        out: List[str] = []
        for row, (text, prep) in enumerate(zip(texts, prepared)):
            if prep is None:
                out.append(text)
                continue
            ids, slots = prep
            new_ids = list(ids)
            for slot in slots:
                scores = logits[row, slot].copy()
                for sp in self._special:
                    scores[sp] = -np.inf
                top = np.argpartition(-scores, self.top_k)[: self.top_k]
                pick = int(top[self._rng.integers(0, len(top))])
                new_ids[slot] = pick
            out.append(self._decode(new_ids))
        return out
