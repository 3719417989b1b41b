"""Fused quadruplet-loss kernel vs the jnp golden twin (values + gradients),
in interpreter mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qst_tpu.ops.losses import gamma_quadruplet_loss
from qst_tpu.ops.quadruplet_pallas import fused_gamma_quadruplet_loss

B, D = 48, 96


def _quads(rng, b=B):
    return [jnp.asarray(rng.standard_normal((b, D)).astype(np.float32))
            for _ in range(4)]


@pytest.mark.parametrize("reduction", ["mean", "sum", "none"])
def test_fused_matches_jnp(rng, reduction):
    a, p, t, n = _quads(rng)
    fused = fused_gamma_quadruplet_loss(
        a, p, t, n, 0.6, 1.0, 0.5, 0.5, reduction, True)
    golden = gamma_quadruplet_loss(a, p, t, n, gamma=0.6, margin_pos_neg=1.0,
                                   margin_pos_part=0.5, margin_part_neg=0.5,
                                   reduction=reduction)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(golden),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("gamma", [0.0, 0.6, 1.0])
def test_fused_gradients_match(rng, gamma):
    a, p, t, n = _quads(rng)

    def f_fused(*xs):
        return fused_gamma_quadruplet_loss(*xs, gamma, 1.0, 0.5, 0.5,
                                           "mean", True)

    def f_ref(*xs):
        return gamma_quadruplet_loss(*xs, gamma=gamma, margin_pos_neg=1.0,
                                     margin_pos_part=0.5, margin_part_neg=0.5,
                                     reduction="mean")

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2, 3))(a, p, t, n)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(a, p, t, n)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-6)


def test_fused_non_block_multiple(rng):
    """Batch not a multiple of the kernel block (exercises padding)."""
    a, p, t, n = _quads(rng, b=300)
    fused = fused_gamma_quadruplet_loss(a, p, t, n, 0.6, 1.0, 0.5, 0.5,
                                        "none", True)
    golden = gamma_quadruplet_loss(a, p, t, n, gamma=0.6, margin_pos_neg=1.0,
                                   margin_pos_part=0.5, margin_part_neg=0.5,
                                   reduction="none")
    assert fused.shape == (300,)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(golden),
                               rtol=1e-5, atol=1e-6)


def test_fused_grad_none_reduction(rng):
    a, p, t, n = _quads(rng, b=16)
    # vjp with per-example cotangent
    ct = jnp.asarray(np.linspace(0.1, 1.0, 16).astype(np.float32))

    def f(a_):
        return fused_gamma_quadruplet_loss(a_, p, t, n, 0.6, 1.0, 0.5, 0.5,
                                           "none", True)

    def f_ref(a_):
        return gamma_quadruplet_loss(a_, p, t, n, gamma=0.6,
                                     margin_pos_neg=1.0, margin_pos_part=0.5,
                                     margin_part_neg=0.5, reduction="none")

    _, vjp = jax.vjp(f, a)
    _, vjp_ref = jax.vjp(f_ref, a)
    np.testing.assert_allclose(np.asarray(vjp(ct)[0]),
                               np.asarray(vjp_ref(ct)[0]),
                               rtol=1e-4, atol=1e-6)
