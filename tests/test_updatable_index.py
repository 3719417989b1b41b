"""Mutable index tests: add/remove/search semantics at fixed capacity."""

import numpy as np
import pytest

from qst_tpu.retrieval import UpdatableIndex

from helpers import hash_embed

DOCS = {
    "cat1": "a cat sits on the mat",
    "cat2": "the cat rests on a mat",
    "dog1": "a dog runs in the park",
    "pasta1": "a plate of pasta with sauce",
    "plane1": "a plane above the clouds",
}


def _emb(texts):
    return hash_embed(list(texts))


def test_add_search():
    idx = UpdatableIndex(dim=128, capacity=16)
    idx.add(_emb(DOCS.values()), list(DOCS))
    assert len(idx) == 5
    s, ids = idx.search(_emb(["a small cat lying on a rug"]), k=2)
    assert set(ids[0]) == {"cat1", "cat2"}
    assert s[0][0] >= s[0][1]


def test_remove_swaps_and_search_excludes():
    idx = UpdatableIndex(dim=128, capacity=16)
    idx.add(_emb(DOCS.values()), list(DOCS))
    idx.remove(["cat1"])
    assert len(idx) == 4
    s, ids = idx.search(_emb(["the cat rests"]), k=4)
    assert "cat1" not in ids[0]
    assert ids[0][0] == "cat2"
    # incremental add after remove
    idx.add(_emb(["a young cat on the carpet"]), ["cat3"])
    s, ids = idx.search(_emb(["a cat"]), k=2)
    assert set(ids[0]) <= {"cat2", "cat3"}


def test_remove_last_and_errors():
    idx = UpdatableIndex(dim=128, capacity=8)
    idx.add(_emb(["a cat sits"]), ["only"])
    idx.remove(["only"])
    assert len(idx) == 0
    with pytest.raises(RuntimeError):
        idx.search(_emb(["x"]))
    with pytest.raises(KeyError):
        idx.remove(["missing"])


def test_capacity_and_duplicate_errors():
    idx = UpdatableIndex(dim=128, capacity=2)
    idx.add(_emb(["a", "b"]), [1, 2])
    with pytest.raises(RuntimeError):
        idx.add(_emb(["c"]), [3])
    idx.remove([1])
    with pytest.raises(KeyError):
        idx.add(_emb(["dup"]), [2])
    with pytest.raises(ValueError):
        idx.add(_emb(["x"]), [4, 5])
    with pytest.raises(ValueError):
        UpdatableIndex(dim=0)


def test_search_matches_static_index():
    from qst_tpu.retrieval import ExactIndex

    texts = list(DOCS.values())
    emb = _emb(texts)
    idx = UpdatableIndex(dim=emb.shape[1], capacity=32)
    idx.add(emb, list(range(5)))
    static = ExactIndex(emb, normalize=True)
    q = _emb(["the dog sprints across the grass"])
    s_u, ids_u = idx.search(q, k=3)
    s_s, ids_s = static.search_ids(np.asarray(
        q / np.linalg.norm(q, axis=1, keepdims=True)), k=3)
    assert ids_u[0] == ids_s[0]


def test_batch_remove_single_gather_correctness():
    """remove() applies all swap-with-last moves as one gather; chained
    swaps (removing many ids incl. re-moved survivors) must end with every
    surviving id's original row at its new position."""
    import numpy as np

    from qst_tpu.retrieval.updatable import UpdatableIndex

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((12, 16)).astype(np.float32)
    idx = UpdatableIndex(dim=16, capacity=32)
    ids = [f"id{i}" for i in range(12)]
    idx.add(emb, ids)
    norm = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    # remove a mix: middle, ends, and ids that were themselves moved
    idx.remove(["id3", "id11", "id0", "id10", "id5"])
    buffer, cur_ids, pos = idx._state
    assert set(cur_ids) == set(ids) - {"id3", "id11", "id0", "id10", "id5"}
    buf = np.asarray(buffer)
    for p, i in enumerate(cur_ids):
        orig = int(i[2:])
        np.testing.assert_allclose(buf[p], norm[orig], rtol=1e-6,
                                   err_msg=f"{i} at {p}")
        assert pos[i] == p
