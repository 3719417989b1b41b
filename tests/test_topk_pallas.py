"""Pallas exact-top-k pipeline tests (interpreter mode on the CPU mesh;
compiled-mode correctness is exercised on real TPU hardware in verification
drivers — Mosaic does not compile for the CPU backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qst_tpu.ops.topk_pallas import (
    BUCKET,
    bucket_maxima,
    pallas_topk_v2,
    reference_topk,
    rescore_buckets,
)


@pytest.mark.parametrize("shape", [(5000, 64, 300), (9000, 32, 40),
                                   (1024, 128, 8)])
def test_pallas_topk_v2_matches_reference(rng, shape):
    N, D, Q = shape
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    queries = rng.standard_normal((Q, D)).astype(np.float32)
    k = 10
    gs, gi = reference_topk(jnp.asarray(queries), jnp.asarray(corpus), k)
    s, i = pallas_topk_v2(jnp.asarray(queries), jnp.asarray(corpus), k,
                          interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(gi))
    np.testing.assert_allclose(np.asarray(s), np.asarray(gs), rtol=1e-4,
                               atol=1e-5)


def test_pallas_topk_v2_same_bucket_collisions(rng):
    """Several global top-k docs inside one 128-bucket must all be found."""
    N, D, Q, k = 6000, 48, 16, 10
    corpus = rng.standard_normal((N, D)).astype(np.float32) * 0.01
    queries = rng.standard_normal((Q, D)).astype(np.float32)
    qn = queries[0] / np.linalg.norm(queries[0])
    planted = [256, 257, 258, 259, 260, 261, 262, 4000, 5000, 5999]
    for r, d in enumerate(planted):
        corpus[d] = qn * (100.0 - r)
    s, i = pallas_topk_v2(jnp.asarray(queries), jnp.asarray(corpus), k,
                          interpret=True)
    assert list(np.asarray(i)[0]) == planted


def test_bucket_maxima_packed_layout(rng):
    """The packed output (several grid steps per 128-lane block) must put
    global bucket b's maximum at column b exactly."""
    N, D, Q = 7000, 32, 24  # N not a multiple of the corpus tile
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    queries = rng.standard_normal((Q, D)).astype(np.float32)
    bm = np.asarray(bucket_maxima(jnp.asarray(queries), jnp.asarray(corpus),
                                  interpret=True))
    scores = queries @ corpus.T
    n_buckets = -(-N // BUCKET)
    assert bm.shape == (Q, n_buckets)
    pad = np.full((Q, n_buckets * BUCKET - N), -np.inf, np.float32)
    golden = np.concatenate([scores, pad], axis=1).reshape(
        Q, n_buckets, BUCKET).max(axis=2)
    np.testing.assert_allclose(bm, golden, rtol=1e-4, atol=1e-5)


def test_rescore_buckets_exact(rng):
    """The dynamic-DMA rescore kernel must reproduce the true scores of
    every (query, winning-bucket) pair, including with Q not a multiple of
    the 8-row block."""
    N, D, Q, k = 2048, 64, 13, 3
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    queries = rng.standard_normal((Q, D)).astype(np.float32)
    bucket_ids = rng.integers(0, N // BUCKET, (Q, k)).astype(np.int32)
    out = np.asarray(rescore_buckets(
        jnp.asarray(queries), jnp.asarray(corpus), jnp.asarray(bucket_ids),
        k, interpret=True))
    assert out.shape == (Q, k * BUCKET)
    for q in range(Q):
        for j in range(k):
            rows = corpus[bucket_ids[q, j] * BUCKET:
                          (bucket_ids[q, j] + 1) * BUCKET]
            np.testing.assert_allclose(
                out[q, j * BUCKET:(j + 1) * BUCKET], queries[q] @ rows.T,
                rtol=1e-4, atol=1e-5)


def test_index_pallas_backend_validation(rng):
    from qst_tpu.retrieval import ExactIndex

    idx = ExactIndex(rng.standard_normal((64, 16)).astype(np.float32))
    with pytest.raises(ValueError):
        idx.search(np.zeros((2, 16), np.float32), backend="pallas",
                   score="euclid_score")
    with pytest.raises(ValueError):
        idx.search(np.zeros((2, 16), np.float32), backend="nope")
    with pytest.raises(ValueError):
        ExactIndex(rng.standard_normal((8, 4)).astype(np.float32),
                   dtype="float16")


def test_index_auto_backend_on_cpu_uses_xla(rng):
    """On the CPU test mesh, auto must fall back to the XLA scan (Mosaic
    does not compile for CPU) and still be exact."""
    from qst_tpu.retrieval import ExactIndex

    corpus = rng.standard_normal((300, 32)).astype(np.float32)
    queries = rng.standard_normal((5, 32)).astype(np.float32)
    idx = ExactIndex(corpus)
    s, i = idx.search(queries, k=7)  # backend="auto"
    gs, gi = reference_topk(jnp.asarray(queries / np.linalg.norm(
        queries, axis=1, keepdims=True)),
        jnp.asarray(corpus / np.linalg.norm(corpus, axis=1, keepdims=True)),
        7)
    np.testing.assert_array_equal(i, np.asarray(gi))


def test_index_bf16_dtype(rng):
    """A bf16 index must return the same top-1 as f32 on well-separated
    corpora and expose bf16 storage."""
    from qst_tpu.retrieval import ExactIndex

    corpus = rng.standard_normal((256, 32)).astype(np.float32) * 4
    queries = corpus[:5] + 0.01
    idx16 = ExactIndex(corpus, dtype="bfloat16")
    assert idx16.embeddings.dtype == jnp.bfloat16
    s, i = idx16.search(queries, k=1)
    np.testing.assert_array_equal(i[:, 0], np.arange(5))


def test_dim_mismatch_raises(rng):
    q = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((300, 64)).astype(np.float32))
    with pytest.raises(ValueError, match="corpus dim"):
        pallas_topk_v2(q, c, 3, interpret=True)
    with pytest.raises(ValueError, match="corpus dim"):
        rescore_buckets(q, jnp.zeros((384, 64)),
                        jnp.zeros((4, 3), jnp.int32), 3, interpret=True)


@pytest.mark.parametrize("n_docs,score", [(5000, "cos_sim"),
                                          (9000, "dot_score"),
                                          (800, "dot_score")])
def test_sharded_pallas_search_exact(rng, mesh8, n_docs, score):
    """The fused pipeline under shard_map (interpret mode on the CPU mesh)
    must be exact, including: k larger than a shard's bucket count (5000 docs
    → 5 buckets/shard < k=10, exercising the clamp+invalidate path) and a
    FULLY padded trailing shard (800 docs over 8 shards of 128)."""
    from qst_tpu.retrieval import ExactIndex

    D, Q, k = 32, 12, 10
    corpus = rng.standard_normal((n_docs, D)).astype(np.float32)
    queries = rng.standard_normal((Q, D)).astype(np.float32)
    idx = ExactIndex(corpus, mesh=mesh8)
    s, i = idx.search(queries, k=k, score=score, backend="pallas")
    if score == "cos_sim":
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        cn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    else:
        qn, cn = queries, corpus
    gs, gi = reference_topk(jnp.asarray(qn), jnp.asarray(cn), k)
    np.testing.assert_array_equal(i, np.asarray(gi))
    np.testing.assert_allclose(s, np.asarray(gs), rtol=1e-4, atol=1e-5)


def test_sharded_pallas_matches_xla_backend(rng, mesh8):
    """Sharded fused vs sharded XLA scan: identical ids on the same index."""
    from qst_tpu.retrieval import ExactIndex

    corpus = rng.standard_normal((4096, 48)).astype(np.float32)
    queries = rng.standard_normal((7, 48)).astype(np.float32)
    idx = ExactIndex(corpus, mesh=mesh8)
    s_p, i_p = idx.search(queries, k=5, backend="pallas")
    s_x, i_x = idx.search(queries, k=5, backend="xla")
    np.testing.assert_array_equal(i_p, i_x)
    np.testing.assert_allclose(s_p, s_x, rtol=1e-4, atol=1e-5)


def test_bucket_maxima_dynamic_n_real(rng):
    """A traced n_real must mask exactly like the static row count."""
    corpus = rng.standard_normal((1024, 32)).astype(np.float32)
    queries = rng.standard_normal((8, 32)).astype(np.float32)
    got = bucket_maxima(jnp.asarray(queries), jnp.asarray(corpus),
                        interpret=True,
                        n_real=jnp.full((1,), 700, jnp.int32))
    golden = np.asarray(bucket_maxima(
        jnp.asarray(queries), jnp.asarray(corpus[:700]), interpret=True))
    nb = golden.shape[1]
    np.testing.assert_allclose(np.asarray(got)[:, :nb], golden,
                               rtol=1e-5)
    assert np.all(np.isneginf(np.asarray(got)[:, nb:]))


def test_bucket_maxima_grid_order_and_blocks(rng):
    """corpus_outer / qb2 / cb2 knobs must not change results."""
    corpus = rng.standard_normal((3000, 64)).astype(np.float32)
    queries = rng.standard_normal((40, 64)).astype(np.float32)
    base = bucket_maxima(jnp.asarray(queries), jnp.asarray(corpus),
                         interpret=True)
    for kw in (dict(corpus_outer=True),
               dict(qb2=16),
               dict(corpus_outer=True, qb2=16)):
        got = bucket_maxima(jnp.asarray(queries), jnp.asarray(corpus),
                            interpret=True, **kw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   rtol=1e-5, err_msg=str(kw))
    with pytest.raises(ValueError, match="cb2"):
        bucket_maxima(jnp.asarray(queries), jnp.asarray(corpus),
                      interpret=True, cb2=2048)
