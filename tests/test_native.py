"""Native WordPiece tokenizer: build, exact parity with the Python
implementation, non-ASCII routing, and a speedup sanity check."""

import time

import numpy as np
import pytest

from qst_tpu.models.tokenizer import WordPieceTokenizer
from qst_tpu.native import FastWordPieceTokenizer, native_available

VOCAB = {t: i for i, t in enumerate(
    ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
     "a", "an", "the", "cat", "dog", "sat", "ran", "on", "in", "mat",
     "park", "big", "small", "un", "##related", "##s", "##ing", "run",
     "walk", ",", ".", "!", "red", "car", "drive", "##r"])}

TEXTS = [
    "A cat sat on the mat.",
    "the dog ran in the park!",
    "an unrelated driver, walking",
    "cats dogs runs",
    "",
    "a " * 200,  # triggers truncation
]

needs_native = pytest.mark.skipif(not native_available(),
                                  reason="g++ build unavailable")


@needs_native
def test_native_matches_python_exactly():
    py = WordPieceTokenizer(dict(VOCAB))
    fast = FastWordPieceTokenizer(dict(VOCAB))
    for max_length in (8, 16, 64):
        ids_p, mask_p = py.batch_encode(TEXTS, max_length=max_length)
        ids_f, mask_f = fast.batch_encode(TEXTS, max_length=max_length)
        np.testing.assert_array_equal(ids_f, ids_p)
        np.testing.assert_array_equal(mask_f, mask_p)


@needs_native
def test_native_non_ascii_falls_back():
    py = WordPieceTokenizer(dict(VOCAB))
    fast = FastWordPieceTokenizer(dict(VOCAB))
    texts = ["a cat", "café naïve résumé", "日本語のテキスト", "the dog"]
    ids_p, mask_p = py.batch_encode(texts, max_length=16)
    ids_f, mask_f = fast.batch_encode(texts, max_length=16)
    np.testing.assert_array_equal(ids_f, ids_p)
    np.testing.assert_array_equal(mask_f, mask_p)


@needs_native
def test_native_pairs_delegate():
    fast = FastWordPieceTokenizer(dict(VOCAB))
    py = WordPieceTokenizer(dict(VOCAB))
    ids_f, mask_f = fast.batch_encode(["a cat"], max_length=16,
                                      text_pairs=["the dog"])
    ids_p, mask_p = py.batch_encode(["a cat"], max_length=16,
                                    text_pairs=["the dog"])
    np.testing.assert_array_equal(ids_f, ids_p)


@needs_native
def test_native_empty_batch():
    fast = FastWordPieceTokenizer(dict(VOCAB))
    ids, mask = fast.batch_encode([], max_length=8)
    assert ids.shape == (0, 8)


@needs_native
def test_native_speedup():
    texts = ["the big cat sat on the red mat in the park"] * 4096
    py = WordPieceTokenizer(dict(VOCAB))
    fast = FastWordPieceTokenizer(dict(VOCAB))
    fast.batch_encode(texts[:16], max_length=32)  # warm
    t0 = time.perf_counter(); py.batch_encode(texts, max_length=32)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter(); fast.batch_encode(texts, max_length=32)
    t_fast = time.perf_counter() - t0
    assert t_fast < t_py, f"native slower: {t_fast:.3f}s vs {t_py:.3f}s"
