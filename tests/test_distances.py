"""Distance/score-function golden tests vs torch and numpy."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from qst_tpu.ops.distances import (
    cdist2,
    cos_sim,
    dot_score,
    euclid_score,
    l2_normalize,
    pairwise_distance,
)


@pytest.mark.parametrize("p", [1.0, 2.0, 3.0])
def test_pairwise_distance_matches_torch(rng, p):
    x = rng.standard_normal((8, 16)).astype(np.float32)
    y = rng.standard_normal((8, 16)).astype(np.float32)
    ours = np.asarray(pairwise_distance(jnp.asarray(x), jnp.asarray(y), p=p))
    golden = F.pairwise_distance(torch.from_numpy(x), torch.from_numpy(y), p=p).numpy()
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-6)


def test_cos_sim_matches_manual(rng):
    a = rng.standard_normal((5, 8)).astype(np.float32)
    b = rng.standard_normal((7, 8)).astype(np.float32)
    ours = np.asarray(cos_sim(jnp.asarray(a), jnp.asarray(b)))
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    np.testing.assert_allclose(ours, an @ bn.T, rtol=1e-5, atol=1e-6)
    assert ours.shape == (5, 7)


def test_dot_score(rng):
    a = rng.standard_normal((5, 8)).astype(np.float32)
    b = rng.standard_normal((7, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(dot_score(jnp.asarray(a), jnp.asarray(b))), a @ b.T,
        rtol=1e-5, atol=1e-6)


def test_cdist2_matches_torch(rng):
    a = rng.standard_normal((6, 12)).astype(np.float32)
    b = rng.standard_normal((9, 12)).astype(np.float32)
    ours = np.asarray(cdist2(jnp.asarray(a), jnp.asarray(b)))
    golden = torch.cdist(torch.from_numpy(a), torch.from_numpy(b), p=2).numpy()
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)


def test_euclid_score_matches_reference_formula(rng):
    # reference models/evaluators.py:392-405: 1/(1+cdist(a,b))
    a = rng.standard_normal((4, 8)).astype(np.float32)
    b = rng.standard_normal((6, 8)).astype(np.float32)
    ours = np.asarray(euclid_score(jnp.asarray(a), jnp.asarray(b)))
    golden = 1.0 / (1.0 + torch.cdist(torch.from_numpy(a), torch.from_numpy(b)).numpy())
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)
    assert np.all(ours > 0) and np.all(ours <= 1.0)


def test_l2_normalize_matches_torch(rng):
    x = rng.standard_normal((10, 16)).astype(np.float32)
    ours = np.asarray(l2_normalize(jnp.asarray(x)))
    golden = F.normalize(torch.from_numpy(x), dim=-1).numpy()
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-6)
    # zero vector must not NaN
    z = np.asarray(l2_normalize(jnp.zeros((2, 4))))
    assert np.all(np.isfinite(z))
