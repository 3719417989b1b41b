"""Retrieval engine tests: exact top-k (tiled + sharded) vs numpy golden."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qst_tpu.retrieval import ExactIndex, exact_topk


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    corpus = rng.standard_normal((500, 48)).astype(np.float32)
    queries = rng.standard_normal((13, 48)).astype(np.float32)
    return corpus, queries


def _golden(queries, corpus, k, score):
    if score == "cos_sim":
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        cn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
        S = qn @ cn.T
    elif score == "dot_score":
        S = queries @ corpus.T
    else:  # euclid_score
        d = np.sqrt(((queries[:, None] - corpus[None]) ** 2).sum(-1))
        S = 1.0 / (1.0 + d)
    idx = np.argsort(-S, axis=1)[:, :k]
    return np.take_along_axis(S, idx, axis=1), idx


@pytest.mark.parametrize("score", ["cos_sim", "dot_score", "euclid_score"])
def test_exact_topk_matches_golden(data, score):
    corpus, queries = data
    gs, gi = _golden(queries, corpus, 10, score)
    s, i = exact_topk(jnp.asarray(queries), jnp.asarray(corpus), 10, score,
                      tile=128)  # force the scan/merge path
    np.testing.assert_array_equal(np.asarray(i), gi)
    np.testing.assert_allclose(np.asarray(s), gs, rtol=1e-4, atol=1e-5)


def test_exact_topk_tiled_scan_path(rng):
    """Corpus large enough to force the bucket-max scan path; includes an
    adversarial block where several global top-k docs share one 128-bucket."""
    N, D, k = 20_000, 32, 10
    corpus = rng.standard_normal((N, D)).astype(np.float32) * 0.01
    q = rng.standard_normal((3, D)).astype(np.float32)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    # plant the true top-k for query 0: 6 of them inside ONE bucket
    planted = [5000, 5001, 5002, 5003, 5004, 5005, 9999, 12345, 17001, 19000]
    for rank, docid in enumerate(planted):
        corpus[docid] = qn[0] * (10.0 - 0.1 * rank)
    # dot_score: planted magnitudes define a strict ranking (cosine would
    # normalize them into ties)
    gs, gi = _golden(q, corpus, k, "dot_score")
    s, i = exact_topk(jnp.asarray(q), jnp.asarray(corpus), k, "dot_score",
                      tile=8192)
    np.testing.assert_array_equal(np.asarray(i), gi)
    np.testing.assert_allclose(np.asarray(s), gs, rtol=1e-4, atol=1e-5)
    assert list(np.asarray(i)[0]) == planted


def test_exact_topk_tiled_non_divisible(rng):
    """Scan path with N not divisible by the tile (padding correctness)."""
    N, D, k = 9_777, 16, 5
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    q = rng.standard_normal((4, D)).astype(np.float32)
    gs, gi = _golden(q, corpus, k, "dot_score")
    s, i = exact_topk(jnp.asarray(q), jnp.asarray(corpus), k, "dot_score",
                      tile=4096)
    np.testing.assert_array_equal(np.asarray(i), gi)
    assert int(np.asarray(i).max()) < N


def test_exact_topk_single_tile(data):
    corpus, queries = data
    gs, gi = _golden(queries, corpus, 5, "cos_sim")
    s, i = exact_topk(jnp.asarray(queries), jnp.asarray(corpus), 5, "cos_sim",
                      tile=100_000)  # single-tile path
    np.testing.assert_array_equal(np.asarray(i), gi)


def test_k_larger_than_corpus():
    corpus = np.eye(4, 8, dtype=np.float32)
    queries = corpus[:2]
    idx = ExactIndex(corpus)
    s, i = idx.search(queries, k=100)
    assert i.shape == (2, 4)
    assert i[0, 0] == 0 and i[1, 0] == 1


def test_sharded_index_matches_single(data, mesh8):
    corpus, queries = data
    single = ExactIndex(corpus)
    sharded = ExactIndex(corpus, mesh=mesh8)
    for score in ("cos_sim", "dot_score", "euclid_score"):
        s1, i1 = single.search(queries, k=7, score=score)
        s2, i2 = sharded.search(queries, k=7, score=score)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, rtol=1e-4, atol=1e-5)


def test_sharded_index_non_divisible(mesh8):
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((101, 16)).astype(np.float32)  # 101 % 8 != 0
    queries = rng.standard_normal((3, 16)).astype(np.float32)
    gs, gi = _golden(queries, corpus, 5, "cos_sim")
    idx = ExactIndex(corpus, mesh=mesh8)
    s, i = idx.search(queries, k=5)
    np.testing.assert_array_equal(i, gi)
    # padded rows must never be returned
    assert i.max() < 101


def test_search_ids_mapping():
    corpus = np.eye(3, 4, dtype=np.float32)
    idx = ExactIndex(corpus, ids=["doc_a", "doc_b", "doc_c"])
    _, ids = idx.search_ids(corpus[:1], k=1)
    assert ids == [["doc_a"]]


def test_index_validation():
    with pytest.raises(ValueError):
        ExactIndex(np.zeros((0, 4), np.float32))
    with pytest.raises(ValueError):
        ExactIndex(np.zeros((4, 4), np.float32), ids=["a"])
    idx = ExactIndex(np.eye(4, dtype=np.float32))
    with pytest.raises(ValueError):
        idx.search(np.eye(4, dtype=np.float32), score="bogus")


def test_sharded_index_large_shards_bucketed(mesh8, rng):
    """Shards wide enough to trigger the bucketed local top-k path
    (>4096 and 128-divisible per shard) must stay exact."""
    N, D, k = 8 * 4096 + 128, 16, 7  # 33k docs → >4k rows per shard
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    queries = rng.standard_normal((5, D)).astype(np.float32)
    gs, gi = _golden(queries, corpus, k, "cos_sim")
    idx = ExactIndex(corpus, mesh=mesh8)
    assert idx.shard_rows > 4096  # bucketed path engaged
    s, i = idx.search(queries, k=k)
    np.testing.assert_array_equal(i, gi)
    np.testing.assert_allclose(s, gs, rtol=1e-4, atol=1e-5)


def test_search_stream_matches_search(rng):
    corpus = rng.standard_normal((500, 32)).astype(np.float32)
    idx = ExactIndex(corpus, normalize=True)
    batches = [rng.standard_normal((7, 32)).astype(np.float32)
               for _ in range(5)]
    got = list(idx.search_stream(iter(batches), k=4, depth=2))
    assert len(got) == 5
    for q, (s, i) in zip(batches, got):
        es, ei = idx.search(q, k=4)
        np.testing.assert_array_equal(i, ei)
        np.testing.assert_allclose(s, es, rtol=1e-6)


def test_search_stream_depth_validation(rng):
    idx = ExactIndex(rng.standard_normal((10, 8)).astype(np.float32))
    with pytest.raises(ValueError, match="depth"):
        list(idx.search_stream([np.zeros((2, 8), np.float32)], depth=0))


def _route_pallas(idx, monkeypatch):
    """Force the fused-pallas dispatch branch with a jnp stand-in kernel."""
    import qst_tpu.retrieval.index as index_mod
    import qst_tpu.ops.topk_pallas as tp

    monkeypatch.setattr(idx, "_pallas_eligible", lambda k, s: True)
    monkeypatch.setattr(
        index_mod, "exact_topk", None)  # must not be used on this path
    monkeypatch.setattr(
        tp, "pallas_topk_v2",
        lambda q, c, k, **kw: tp.reference_topk(q, c, k))


def test_cos_corpus_cache_opt_in_normalizes_once(rng, monkeypatch):
    # cache_cos_corpus=True: the un-normalized pallas cos path builds the
    # normalized corpus ONCE and reuses it (explicit 2x-HBM opt-in)
    corpus = rng.standard_normal((256, 16)).astype(np.float32)
    idx = ExactIndex(corpus, cache_cos_corpus=True)  # normalize=False
    calls = {"n": 0}
    import qst_tpu.retrieval.index as index_mod
    real = index_mod.l2_normalize

    def counting(x):
        calls["n"] += 1
        return real(x)

    monkeypatch.setattr(index_mod, "l2_normalize", counting)
    _route_pallas(idx, monkeypatch)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    idx.search(q, k=2)
    first = calls["n"]
    assert idx._cos_corpus is not None
    idx.search(q, k=2)
    # second call normalizes only the queries, not the corpus again
    assert calls["n"] == first + 1


def test_cos_unnormalized_default_keeps_no_corpus_copy(rng, monkeypatch):
    # DEFAULT: no corpus-sized buffer survives a cos search on a
    # normalize=False index — forced pallas normalizes transiently per
    # call, and auto dispatch refuses pallas for this combination
    corpus = rng.standard_normal((256, 16)).astype(np.float32)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    ref_s, ref_i = ExactIndex(corpus, normalize=True).search(q, k=3)

    idx = ExactIndex(corpus)
    s, i = idx.search(q, k=3)   # auto → XLA scan path
    assert idx._cos_corpus is None
    np.testing.assert_array_equal(i, ref_i)
    np.testing.assert_allclose(s, ref_s, rtol=1e-5, atol=1e-6)

    _route_pallas(idx, monkeypatch)
    s2, i2 = idx.search(q, k=3)  # forced pallas → transient copy only
    assert idx._cos_corpus is None
    np.testing.assert_array_equal(i2, ref_i)
    np.testing.assert_allclose(s2, ref_s, rtol=1e-5, atol=1e-6)


def test_cos_unnormalized_auto_stays_off_pallas():
    # the eligibility gate itself: needs-a-copy cos is pallas-ineligible
    # unless cached or pre-normalized (platform-independent logic check)
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((64, 8)).astype(np.float32)

    class _Probe(ExactIndex):
        PALLAS_MIN_DOCS = 1

    import unittest.mock as mock
    with mock.patch("jax.devices") as dv:
        dv.return_value = [type("D", (), {"platform": "tpu"})()]
        assert not _Probe(corpus)._pallas_eligible(8, "cos_sim")
        assert _Probe(corpus)._pallas_eligible(8, "dot_score")
        assert _Probe(corpus, normalize=True)._pallas_eligible(8, "cos_sim")
        assert _Probe(corpus, cache_cos_corpus=True)._pallas_eligible(
            8, "cos_sim")


def test_pack_pair_round_trip_exact():
    # the one-transfer (scores, ids) pack must be bit-exact: ids stay in
    # the int32 domain (an f32 bitcast would make ids < 2^23 denormal bit
    # patterns, which TPU float paths flush to zero — regression guard)
    from qst_tpu.retrieval.index import _pack_pair, _unpack_host, fetch_pair

    s = np.array([[0.5, -1e-30, np.inf], [1e30, -0.0, 3.25]], np.float32)
    i = np.array([[0, 1, 2], [4_000_000, 2**30, 7]], np.int32)
    ss, ii = _unpack_host(np.asarray(_pack_pair(jnp.asarray(s),
                                                jnp.asarray(i))))
    np.testing.assert_array_equal(ii, i)
    np.testing.assert_array_equal(ss, s)
    ss2, ii2 = fetch_pair(jnp.asarray(s), jnp.asarray(i))
    np.testing.assert_array_equal(ii2, i)
    np.testing.assert_array_equal(ss2, s)
