"""Golden-value tests: jnp quadruplet losses vs torch reference formulas.

The reference validated its losses only in a notebook
(``quadruplet_loss_test.ipynb``, SURVEY.md §4); here the same numerical
checks run as pytest golden tests against torch.nn.functional directly.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from qst_tpu.ops.losses import (
    GammaQuadrupletLoss,
    DRegularizedQuadrupletLoss,
    bce_with_logits,
    d_regularized_quadruplet_loss,
    gamma_quadruplet_loss,
    triplet_margin_loss,
)

B, D = 16, 32


def _quads(rng):
    return [rng.standard_normal((B, D)).astype(np.float32) for _ in range(4)]


def _torch_gamma(a, pos, part, neg, gamma, m_pn, m_pt, m_tn, p, swap, reduction):
    ta, tp, tt, tn = map(torch.from_numpy, (a, pos, part, neg))
    la = F.triplet_margin_loss(ta, tp, tn, margin=m_pn, p=p, swap=swap, reduction="none")
    lb = F.triplet_margin_loss(ta, tt, tn, margin=m_tn, p=p, swap=swap, reduction="none")
    lc = F.triplet_margin_loss(ta, tp, tt, margin=m_pt, p=p, swap=swap, reduction="none")
    if reduction == "none":
        return (la + gamma * lb + (1 - gamma) * lc).numpy()
    if reduction == "sum":
        return (la.sum() + (gamma * lb).sum() + ((1 - gamma) * lc).sum()).numpy()
    return (la.mean() + (gamma * lb).mean() + ((1 - gamma) * lc).mean()).numpy()


@pytest.mark.parametrize("p", [1.0, 2.0, 3.0])
@pytest.mark.parametrize("swap", [False, True])
def test_triplet_margin_matches_torch(rng, p, swap):
    a, pos, _, neg = _quads(rng)
    ours = np.asarray(triplet_margin_loss(jnp.asarray(a), jnp.asarray(pos),
                                          jnp.asarray(neg), 1.0, p, swap))
    golden = F.triplet_margin_loss(
        torch.from_numpy(a), torch.from_numpy(pos), torch.from_numpy(neg),
        margin=1.0, p=p, swap=swap, reduction="none").numpy()
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("reduction", ["mean", "sum", "none"])
@pytest.mark.parametrize("gamma", [0.0, 0.6, 0.8, 1.0])
def test_gamma_quadruplet_matches_torch(rng, reduction, gamma):
    a, pos, part, neg = _quads(rng)
    ours = np.asarray(
        gamma_quadruplet_loss(
            jnp.asarray(a), jnp.asarray(pos), jnp.asarray(part), jnp.asarray(neg),
            gamma=gamma, margin_pos_neg=1.0, margin_pos_part=0.5,
            margin_part_neg=0.5, p=2.0, reduction=reduction,
        )
    )
    golden = _torch_gamma(a, pos, part, neg, gamma, 1.0, 0.5, 0.5, 2.0, False, reduction)
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-6)


def test_gamma_quadruplet_swap(rng):
    a, pos, part, neg = _quads(rng)
    ours = np.asarray(
        gamma_quadruplet_loss(
            jnp.asarray(a), jnp.asarray(pos), jnp.asarray(part), jnp.asarray(neg),
            gamma=0.6, swap=True, reduction="mean",
        )
    )
    golden = _torch_gamma(a, pos, part, neg, 0.6, 1.0, 0.5, 0.5, 2.0, True, "mean")
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-6)


def test_bce_with_logits_matches_torch(rng):
    logits = rng.standard_normal((B, 2)).astype(np.float32) * 3
    targets = (rng.random((B, 2)) > 0.5).astype(np.float32)
    ours = np.asarray(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    golden = F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets), reduction="none"
    ).numpy()
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("reduction", ["mean", "sum", "none"])
def test_d_regularized_matches_torch(rng, reduction):
    a, pos, part, neg = _quads(rng)
    lp = rng.standard_normal((B, 1)).astype(np.float32)
    lt = rng.standard_normal((B, 1)).astype(np.float32)
    lmbd = 0.1

    ours = np.asarray(
        d_regularized_quadruplet_loss(
            jnp.asarray(a), jnp.asarray(pos), jnp.asarray(part), jnp.asarray(neg),
            margin_pos_neg=1.0, margin_part_neg=1.0, lmbd=lmbd,
            discr_logits_pos=jnp.asarray(lp), discr_logits_part=jnp.asarray(lt),
            reduction=reduction,
        )
    )

    ta, tp, tt, tn = map(torch.from_numpy, (a, pos, part, neg))
    la = F.triplet_margin_loss(ta, tp, tn, margin=1.0, reduction="none")
    lb = F.triplet_margin_loss(ta, tt, tn, margin=1.0, reduction="none")
    lcat = torch.cat([torch.from_numpy(lp).unsqueeze(1),
                      torch.from_numpy(lt).unsqueeze(1)], dim=1)
    tcat = torch.cat([torch.ones(B, 1, 1), torch.zeros(B, 1, 1)], dim=1)
    bce = F.binary_cross_entropy_with_logits(lcat, tcat, reduction="none")
    bce = bce.sum(dim=1, keepdim=True).squeeze(-1).squeeze(-1)
    if reduction == "none":
        golden = (la + lb - lmbd * bce).numpy()
    elif reduction == "sum":
        golden = (la.sum() + lb.sum() - lmbd * bce.sum()).numpy()
    else:
        golden = (la.mean() + lb.mean() - lmbd * bce.mean()).numpy()
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-6)


def test_validation_errors():
    z = jnp.zeros((2, 4))
    with pytest.raises(ValueError):
        gamma_quadruplet_loss(z, z, z, z, gamma=1.5)
    with pytest.raises(ValueError):
        gamma_quadruplet_loss(z, z, z, z, margin_pos_neg=0.0)
    with pytest.raises(ValueError):
        gamma_quadruplet_loss(z, z, z, z, reduction="bogus")
    with pytest.raises(ValueError):
        gamma_quadruplet_loss(z, z, z, z, p=-1.0)
    with pytest.raises(ValueError):
        d_regularized_quadruplet_loss(z, z, z, z)  # no discr and no logits
    with pytest.raises(ValueError):
        GammaQuadrupletLoss(gamma=-0.1)
    with pytest.raises(ValueError):
        DRegularizedQuadrupletLoss(lmbd=0.0)


def test_class_wrappers_match_functions(rng):
    a, pos, part, neg = map(jnp.asarray, _quads(rng))
    loss = GammaQuadrupletLoss(gamma=0.8, margin_pos_neg=1.0,
                               margin_pos_part=0.5, margin_part_neg=0.5)
    np.testing.assert_allclose(
        np.asarray(loss(a, pos, part, neg)),
        np.asarray(gamma_quadruplet_loss(a, pos, part, neg, gamma=0.8,
                                         margin_pos_part=0.5, margin_part_neg=0.5)),
    )
    # per-call reduction override (reference losses.py:283-291)
    out = loss(a, pos, part, neg, reduction="none")
    assert out.shape == (B,)


def test_loss_is_differentiable(rng):
    import jax

    a, pos, part, neg = map(jnp.asarray, _quads(rng))
    g = jax.grad(
        lambda x: gamma_quadruplet_loss(x, pos, part, neg, reduction="mean")
    )(a)
    assert g.shape == a.shape
    assert bool(jnp.all(jnp.isfinite(g)))
