"""Quadruplet losses — jnp reference implementations.

Semantics re-derived from the reference's loss module
(``/root/reference/models/losses/losses.py``):

- ``triplet_margin_loss(a, p, n, margin, p_norm, swap)`` =
  ``max(d(a,p) - d(a,n) + margin, 0)`` with torch's eps-in-difference
  distance; ``swap`` uses ``d_n = min(d(a,n), d(p,n))`` (distance swap,
  Balntas et al. 2016) — matching torch ``F.triplet_margin_loss``.
- ``gamma_quadruplet_loss`` (losses.py:9-69):
  ``L = T(a,pos,neg; m_pn) + γ·T(a,part,neg; m_tn) + (1-γ)·T(a,pos,part; m_pt)``
  with reductions mean/sum/none applied per-term (identical algebra).
- ``d_regularized_quadruplet_loss`` (losses.py:72-151):
  ``T(a,pos,neg) + T(a,part,neg) - λ·[BCE(D(a,pos),1) + BCE(D(a,part),0)]``.

These are the golden-value twins for the fused Pallas kernel in
``qst_tpu.ops.quadruplet_pallas`` and are themselves jit/grad-safe (static
validation happens at trace time on Python floats).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from qst_tpu.core.config import DEFAULT_GAMMA, REDUCTIONS
from qst_tpu.ops.distances import pairwise_distance


def _validate_common(p: float, reduction: str) -> None:
    if p <= 0:
        raise ValueError(f"p must be positive, {p} given")
    if reduction not in REDUCTIONS:
        raise ValueError(
            f"reduction must be one of: {sorted(REDUCTIONS)}, {reduction} given"
        )


def triplet_margin_loss(
    anchor: jax.Array,
    positive: jax.Array,
    negative: jax.Array,
    margin: float = 1.0,
    p: float = 2.0,
    swap: bool = False,
    eps: float = 1e-6,
) -> jax.Array:
    """Per-example (unreduced) triplet margin loss, shape (B,)."""
    d_pos = pairwise_distance(anchor, positive, p=p, eps=eps)
    d_neg = pairwise_distance(anchor, negative, p=p, eps=eps)
    if swap:
        d_swap = pairwise_distance(positive, negative, p=p, eps=eps)
        d_neg = jnp.minimum(d_neg, d_swap)
    return jnp.maximum(d_pos - d_neg + margin, 0.0)


def _reduce3(a: jax.Array, b: jax.Array, c: jax.Array, gamma: float,
             reduction: str) -> jax.Array:
    # Reference reduces each term independently (losses.py:64-69); with these
    # linear weights the algebra is identical either way, but keep the same
    # association order for bitwise-stable golden tests.
    if reduction == "none":
        return a + gamma * b + (1.0 - gamma) * c
    if reduction == "sum":
        return a.sum() + (gamma * b).sum() + ((1.0 - gamma) * c).sum()
    return a.mean() + (gamma * b).mean() + ((1.0 - gamma) * c).mean()


def gamma_quadruplet_loss(
    x_anchor: jax.Array,
    x_pos: jax.Array,
    x_part: jax.Array,
    x_neg: jax.Array,
    gamma: float = DEFAULT_GAMMA,
    margin_pos_neg: float = 1.0,
    margin_pos_part: float = 0.5,
    margin_part_neg: float = 0.5,
    p: float = 2.0,
    swap: bool = False,
    reduction: str = "mean",
) -> jax.Array:
    """γ-quadruplet loss (reference losses.py:9-69)."""
    if gamma < 0 or gamma > 1:
        raise ValueError(f"gamma must be between 0 and 1, {gamma} given")
    for name, m in (("margin_pos_neg", margin_pos_neg),
                    ("margin_pos_part", margin_pos_part),
                    ("margin_part_neg", margin_part_neg)):
        if m <= 0:
            raise ValueError(f"{name} must be positive, {m} given")
    _validate_common(p, reduction)

    a = triplet_margin_loss(x_anchor, x_pos, x_neg, margin_pos_neg, p, swap)
    b = triplet_margin_loss(x_anchor, x_part, x_neg, margin_part_neg, p, swap)
    c = triplet_margin_loss(x_anchor, x_pos, x_part, margin_pos_part, p, swap)
    return _reduce3(a, b, c, gamma, reduction)


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Numerically stable elementwise BCE-with-logits (torch semantics)."""
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def d_regularized_quadruplet_loss(
    x_anchor: jax.Array,
    x_pos: jax.Array,
    x_part: jax.Array,
    x_neg: jax.Array,
    margin_pos_neg: float = 1.0,
    margin_part_neg: float = 1.0,
    lmbd: float = 0.1,
    discr: Optional[Callable[[jax.Array, jax.Array], jax.Array]] = None,
    discr_logits_pos: Optional[jax.Array] = None,
    discr_logits_part: Optional[jax.Array] = None,
    p: float = 2.0,
    swap: bool = False,
    reduction: str = "mean",
) -> jax.Array:
    """Discriminator-regularized quadruplet loss (reference losses.py:72-151).

    ``a + b - λ·[BCE(D(anchor,pos)=1) + BCE(D(anchor,part)=0)]`` where each
    BCE term is summed over the two (pos, part) slots per example; logits may
    be supplied directly or computed by ``discr(anchor, x)`` → (B, 1).
    """
    if lmbd <= 0:
        raise ValueError(f"lmbd must be positive, {lmbd} given")
    for name, m in (("margin_pos_neg", margin_pos_neg),
                    ("margin_part_neg", margin_part_neg)):
        if m <= 0:
            raise ValueError(f"{name} must be positive, {m} given")
    _validate_common(p, reduction)
    if discr is None and (discr_logits_pos is None or discr_logits_part is None):
        raise ValueError("Either discriminator or discriminator logits must be given")

    a = triplet_margin_loss(x_anchor, x_pos, x_neg, margin_pos_neg, p, swap)
    b = triplet_margin_loss(x_anchor, x_part, x_neg, margin_part_neg, p, swap)

    if discr_logits_pos is None or discr_logits_part is None:
        assert discr is not None
        discr_logits_pos = discr(x_anchor, x_pos)
        discr_logits_part = discr(x_anchor, x_part)

    lp = discr_logits_pos.reshape(discr_logits_pos.shape[0], -1)
    lt = discr_logits_part.reshape(discr_logits_part.shape[0], -1)
    bce = bce_with_logits(lp, jnp.ones_like(lp)) + bce_with_logits(
        lt, jnp.zeros_like(lt)
    )  # (B, 1): per-example sum over the two slots
    bce = bce.squeeze(-1)

    if reduction == "none":
        return a + b - lmbd * bce
    if reduction == "sum":
        return a.sum() + b.sum() - lmbd * bce.sum()
    return a.mean() + b.mean() - lmbd * bce.mean()


class GammaQuadrupletLoss:
    """Configured callable mirroring the reference's ``GammaQuadrupletLoss``
    module (losses.py:241-303), with the same constructor validation; stateless
    and jit-friendly (a pytree-free closure)."""

    def __init__(
        self,
        gamma: float = DEFAULT_GAMMA,
        margin_pos_neg: float = 1.0,
        margin_pos_part: float = 1.0,
        margin_part_neg: float = 1.0,
        p: float = 2.0,
        swap: bool = False,
        reduction: str = "mean",
    ):
        if gamma < 0 or gamma > 1:
            raise ValueError(f"gamma must be between 0 and 1, {gamma} given")
        for name, m in (("margin_pos_neg", margin_pos_neg),
                        ("margin_pos_part", margin_pos_part),
                        ("margin_part_neg", margin_part_neg)):
            if m <= 0:
                raise ValueError(f"{name} must be positive, {m} given")
        _validate_common(p, reduction)
        self.gamma = gamma
        self.margin_pos_neg = margin_pos_neg
        self.margin_pos_part = margin_pos_part
        self.margin_part_neg = margin_part_neg
        self.p = p
        self.swap = swap
        self.reduction = reduction

    def __call__(self, x_anchor, x_pos, x_part, x_neg,
                 reduction: Optional[str] = None, **kwargs) -> jax.Array:
        return gamma_quadruplet_loss(
            x_anchor, x_pos, x_part, x_neg,
            gamma=self.gamma,
            margin_pos_neg=self.margin_pos_neg,
            margin_pos_part=self.margin_pos_part,
            margin_part_neg=self.margin_part_neg,
            p=self.p,
            swap=self.swap,
            reduction=self.reduction if reduction is None else reduction,
        )


class DRegularizedQuadrupletLoss:
    """Configured callable for the discriminator-regularized variant."""

    def __init__(
        self,
        margin_pos_neg: float = 1.0,
        margin_part_neg: float = 1.0,
        lmbd: float = 0.1,
        p: float = 2.0,
        swap: bool = False,
        reduction: str = "mean",
    ):
        if lmbd <= 0:
            raise ValueError(f"lmbd must be positive, {lmbd} given")
        for name, m in (("margin_pos_neg", margin_pos_neg),
                        ("margin_part_neg", margin_part_neg)):
            if m <= 0:
                raise ValueError(f"{name} must be positive, {m} given")
        _validate_common(p, reduction)
        self.margin_pos_neg = margin_pos_neg
        self.margin_part_neg = margin_part_neg
        self.lmbd = lmbd
        self.p = p
        self.swap = swap
        self.reduction = reduction

    def __call__(self, x_anchor, x_pos, x_part, x_neg, discr=None,
                 discr_logits_pos=None, discr_logits_part=None,
                 reduction: Optional[str] = None, **kwargs) -> jax.Array:
        return d_regularized_quadruplet_loss(
            x_anchor, x_pos, x_part, x_neg,
            margin_pos_neg=self.margin_pos_neg,
            margin_part_neg=self.margin_part_neg,
            lmbd=self.lmbd,
            discr=discr,
            discr_logits_pos=discr_logits_pos,
            discr_logits_part=discr_logits_part,
            p=self.p,
            swap=self.swap,
            reduction=self.reduction if reduction is None else reduction,
        )
