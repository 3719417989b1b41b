"""IVF approximate index: recall vs exact search, spill handling, kmeans."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qst_tpu.retrieval import ExactIndex, IVFIndex, kmeans


@pytest.fixture(scope="module")
def clustered_corpus():
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((16, 32)) * 4
    docs = np.concatenate([
        centers[i] + rng.standard_normal((64, 32)) * 0.3 for i in range(16)
    ]).astype(np.float32)
    return docs


def test_kmeans_partitions(clustered_corpus):
    c, assign = kmeans(jnp.asarray(clustered_corpus), jax.random.key(0), 16,
                       n_iters=15)
    assign = np.asarray(assign)
    # docs from the same planted blob should mostly share a cluster
    agree = 0
    for i in range(16):
        blob = assign[i * 64:(i + 1) * 64]
        agree += (blob == np.bincount(blob).argmax()).mean()
    assert agree / 16 > 0.9


def test_ivf_recall_vs_exact(clustered_corpus):
    rng = np.random.default_rng(1)
    queries = clustered_corpus[rng.choice(len(clustered_corpus), 32)] \
        + rng.standard_normal((32, 32)).astype(np.float32) * 0.1
    exact = ExactIndex(clustered_corpus, normalize=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    _, exact_ids = exact.search_ids(qn, k=10)

    ivf = IVFIndex(clustered_corpus, n_clusters=16, seed=0)
    _, ivf_ids = ivf.search(queries, k=10, n_probe=4)
    recall = np.mean([
        len(set(a) & set(b)) / 10 for a, b in zip(exact_ids, ivf_ids)])
    assert recall > 0.9, f"recall@10 too low: {recall}"
    # full probe → exact (all cells scanned)
    _, ivf_all = ivf.search(queries, k=10, n_probe=16)
    recall_full = np.mean([
        len(set(a) & set(b)) / 10 for a, b in zip(exact_ids, ivf_all)])
    assert recall_full > 0.999


def test_ivf_nothing_dropped(clustered_corpus):
    ivf = IVFIndex(clustered_corpus, n_clusters=16, seed=0)
    stored = set(int(j) for j in np.asarray(ivf.cell_ids).ravel() if j >= 0)
    assert stored == set(range(len(clustered_corpus)))


def test_ivf_validation(clustered_corpus):
    with pytest.raises(ValueError):
        IVFIndex(clustered_corpus[:8], n_clusters=16)
    with pytest.raises(ValueError):
        IVFIndex(clustered_corpus, n_clusters=4, ids=[1, 2])


def test_ivf_search_stream_matches_search(rng):
    corpus = rng.standard_normal((400, 16)).astype(np.float32)
    idx = IVFIndex(corpus, n_clusters=8, seed=0)
    batches = [rng.standard_normal((5, 16)).astype(np.float32)
               for _ in range(4)]
    got = list(idx.search_stream(iter(batches), k=3, n_probe=4, depth=2))
    assert len(got) == 4
    for q, (s, ids) in zip(batches, got):
        es, eids = idx.search(q, k=3, n_probe=4)
        np.testing.assert_allclose(s, es)
        assert ids == eids
    with pytest.raises(ValueError, match="depth"):
        list(idx.search_stream(batches[:1], depth=0))
