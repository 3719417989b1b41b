"""Pallas streaming-top-k kernel tests (interpreter mode on the CPU mesh;
compiled-mode correctness is exercised on real TPU hardware in verification
drivers — Mosaic does not compile for the CPU backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qst_tpu.ops.topk_pallas import K_PAD, pallas_topk, reference_topk


@pytest.mark.parametrize("shape", [(500, 64, 37), (3000, 128, 256),
                                   (1024, 32, 8)])
def test_pallas_topk_matches_reference(rng, shape):
    N, D, Q = shape
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    queries = rng.standard_normal((Q, D)).astype(np.float32)
    k = 10
    gs, gi = reference_topk(jnp.asarray(queries), jnp.asarray(corpus), k)
    s, i = pallas_topk(jnp.asarray(queries), jnp.asarray(corpus), k,
                       interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(gi))
    np.testing.assert_allclose(np.asarray(s), np.asarray(gs), rtol=1e-4,
                               atol=1e-5)


def test_pallas_topk_same_bucket_collisions(rng):
    """Several global top-k docs inside one 128-bucket must all be found."""
    N, D, Q, k = 4000, 48, 64, 10
    corpus = rng.standard_normal((N, D)).astype(np.float32) * 0.01
    queries = rng.standard_normal((Q, D)).astype(np.float32)
    qn = queries[0] / np.linalg.norm(queries[0])
    planted = [512, 513, 514, 515, 516, 517, 518, 2000, 3000, 3999]
    for r, d in enumerate(planted):
        corpus[d] = qn * (100.0 - r)
    s, i = pallas_topk(jnp.asarray(queries), jnp.asarray(corpus), k,
                       interpret=True)
    assert list(np.asarray(i)[0]) == planted


def test_pallas_topk_k_validation(rng):
    corpus = rng.standard_normal((300, 16)).astype(np.float32)
    queries = rng.standard_normal((4, 16)).astype(np.float32)
    with pytest.raises(ValueError):
        pallas_topk(jnp.asarray(queries), jnp.asarray(corpus), K_PAD + 1,
                    interpret=True)


def test_index_pallas_backend_validation(rng):
    from qst_tpu.retrieval import ExactIndex

    idx = ExactIndex(rng.standard_normal((64, 16)).astype(np.float32))
    with pytest.raises(ValueError):
        idx.search(np.zeros((2, 16), np.float32), backend="pallas",
                   score="euclid_score")


@pytest.mark.parametrize("shape", [(5000, 64, 300), (9000, 32, 40)])
def test_pallas_topk_v2_matches_reference(rng, shape):
    from qst_tpu.ops.topk_pallas import pallas_topk_v2

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
    from qst_tpu.ops.topk_pallas import pallas_topk_v2

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
