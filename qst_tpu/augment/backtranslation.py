"""Backtranslation augmentation (en→fr→en roundtrip).

Capability match for reference ``dataset/backtranslation.py``: two MarianMT
models held as lazily-constructed singletons behind locks (:8-49), a
``>>fr<<`` batch formatter (:65-69), batched tokenize→generate→decode
(:72-94), and the roundtrip chain (:97-113).

Zero-egress design: the translator backend is pluggable —

- ``IdentityBacktranslator``: the mock (the reference notebook's
  ``mock_back_translation`` pattern) so every pipeline runs hermetically;
- ``ParaphraseBacktranslator``: a deterministic synonym+reorder paraphraser
  that approximates the *effect* of a roundtrip (lexical variation at
  preserved meaning) with no model;
- ``MarianBacktranslator``: loads local HF MarianMT checkpoints when present
  (gated torch import), batched generation. Augmentation is offline dataset
  construction, not the training hot path, so a host-side torch stage is an
  acceptable backend (SURVEY.md §7 risk note).

``get_backtranslator`` returns the best available backend and memoizes it —
the explicit-context replacement for the reference's ``@synchronized`` global
singletons.
"""

from __future__ import annotations

import os
import threading
from typing import List, Optional, Sequence

from qst_tpu.augment.synonyms import SynonymAugmenter

LANGUAGE_PREFIX = ">>fr<<"


def format_batch_texts(texts: Sequence[str],
                       language_code: str = "fr") -> List[str]:
    """Prepend the Marian multilingual target-language token (reference
    backtranslation.py:65-69)."""
    return [f">>{language_code}<< {t}" for t in texts]


class IdentityBacktranslator:
    """Mock roundtrip: returns inputs unchanged."""

    def backtranslate(self, texts: Sequence[str]) -> List[str]:
        return list(texts)


class ParaphraseBacktranslator:
    """Model-free approximation: synonym substitution emulating the lexical
    drift a fr-roundtrip produces."""

    def __init__(self, seed: int = 14):
        self._aug = SynonymAugmenter(aug_min=1, aug_max=3, seed=seed)

    def backtranslate(self, texts: Sequence[str]) -> List[str]:
        return self._aug.augment(list(texts))


class MarianBacktranslator:
    """Local-checkpoint MarianMT roundtrip (batched, host-side)."""

    def __init__(self, en_fr_path: str, fr_en_path: str,
                 batch_size: int = 32, max_length: int = 128):
        from transformers import MarianMTModel, MarianTokenizer  # gated

        self.tok_fwd = MarianTokenizer.from_pretrained(en_fr_path)
        self.model_fwd = MarianMTModel.from_pretrained(en_fr_path).eval()
        self.tok_bwd = MarianTokenizer.from_pretrained(fr_en_path)
        self.model_bwd = MarianMTModel.from_pretrained(fr_en_path).eval()
        self.batch_size = batch_size
        self.max_length = max_length

    def _translate(self, texts: Sequence[str], tok, model) -> List[str]:
        import torch

        out: List[str] = []
        for start in range(0, len(texts), self.batch_size):
            chunk = list(texts[start:start + self.batch_size])
            enc = tok(chunk, return_tensors="pt", padding=True,
                      truncation=True, max_length=self.max_length)
            with torch.no_grad():
                gen = model.generate(**enc, max_length=self.max_length)
            out.extend(tok.batch_decode(gen, skip_special_tokens=True))
        return out

    def backtranslate(self, texts: Sequence[str]) -> List[str]:
        fr = self._translate(format_batch_texts(texts), self.tok_fwd,
                             self.model_fwd)
        return self._translate(fr, self.tok_bwd, self.model_bwd)


_lock = threading.Lock()
_singleton = None


def get_backtranslator(
    en_fr_path: Optional[str] = None,
    fr_en_path: Optional[str] = None,
    allow_paraphrase_fallback: bool = True,
):
    """Best-available backend, constructed once (thread-safe)."""
    global _singleton
    with _lock:
        if _singleton is not None:
            return _singleton
        if en_fr_path and fr_en_path and os.path.isdir(en_fr_path) \
                and os.path.isdir(fr_en_path):
            _singleton = MarianBacktranslator(en_fr_path, fr_en_path)
        elif allow_paraphrase_fallback:
            _singleton = ParaphraseBacktranslator()
        else:
            _singleton = IdentityBacktranslator()
        return _singleton


def reset_backtranslator() -> None:
    global _singleton
    with _lock:
        _singleton = None


def perform_back_translation(texts: Sequence[str], **kw) -> List[str]:
    """Convenience roundtrip with the default backend (reference
    backtranslation.py:97-113 surface)."""
    return get_backtranslator(**kw).backtranslate(list(texts))
