"""Pallas TPU kernel: fused pairwise-distance + three-margin quadruplet loss.

The north-star training kernel (BASELINE.json): one VMEM pass over the four
embedding blocks computes all pairwise L2 distances (torch eps-in-difference
semantics), the three margin hinges, and the γ-combination — no intermediate
(B, D) difference tensors ever reach HBM. Semantics identical to
``qst_tpu.ops.losses.gamma_quadruplet_loss`` (the jnp golden twin, itself
bit-matched to the reference ``models/losses/losses.py:9-69``).

``fused_gamma_quadruplet_loss`` wraps the kernel in a ``jax.custom_vjp``
whose backward pass reuses the saved distances, so training steps get an
analytic gradient without re-tracing the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6
BB = 256  # batch rows per grid step


def _dist_sq_rows(x, y):
    d = x - y + _EPS
    return jnp.sum(d * d, axis=1, keepdims=True)  # (B, 1)


def _kernel(a_ref, p_ref, t_ref, n_ref, loss_ref, d_ref, *,
            gamma: float, m_pn: float, m_pt: float, m_tn: float, swap: bool):
    a, p, t, n = a_ref[:], p_ref[:], t_ref[:], n_ref[:]
    d_ap = jnp.sqrt(_dist_sq_rows(a, p))
    d_at = jnp.sqrt(_dist_sq_rows(a, t))
    d_an = jnp.sqrt(_dist_sq_rows(a, n))
    if swap:
        d_pn = jnp.sqrt(_dist_sq_rows(p, n))
        d_tn = jnp.sqrt(_dist_sq_rows(t, n))
        d_pt_sw = jnp.sqrt(_dist_sq_rows(p, t))
        an_eff = jnp.minimum(d_an, d_pn)       # for (a,pos,neg)
        tn_eff = jnp.minimum(d_an, d_tn)       # for (a,part,neg)
        pt_eff = jnp.minimum(d_at, d_pt_sw)    # for (a,pos,part)
    else:
        an_eff, tn_eff, pt_eff = d_an, d_an, d_at
    la = jnp.maximum(d_ap - an_eff + m_pn, 0.0)
    lb = jnp.maximum(d_at - tn_eff + m_tn, 0.0)
    lc = jnp.maximum(d_ap - pt_eff + m_pt, 0.0)
    loss_ref[:] = la + gamma * lb + (1.0 - gamma) * lc
    # residual distances for the backward pass: [d_ap, d_at, d_an]
    d_ref[:, 0:1] = d_ap
    d_ref[:, 1:2] = d_at
    d_ref[:, 2:3] = d_an


def _pad_rows(x, rows):
    if x.shape[0] == rows:
        return x
    return jnp.pad(x, ((0, rows - x.shape[0]), (0, 0)))


@functools.partial(
    jax.jit, static_argnames=("gamma", "m_pn", "m_pt", "m_tn", "swap",
                              "interpret"))
def _forward(a, p, t, n, gamma, m_pn, m_pt, m_tn, swap, interpret=False):
    B, D = a.shape
    Bp = ((B + BB - 1) // BB) * BB
    args = [_pad_rows(x.astype(jnp.float32), Bp) for x in (a, p, t, n)]
    kernel = functools.partial(_kernel, gamma=gamma, m_pn=m_pn, m_pt=m_pt,
                               m_tn=m_tn, swap=swap)
    grid = (Bp // BB,)
    spec = pl.BlockSpec((BB, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    loss, dists = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=(
            pl.BlockSpec((BB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 3), jnp.float32),
        ),
        interpret=interpret,
    )(*args)
    return loss[:B, 0], dists[:B]


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9))
def fused_gamma_quadruplet_loss(
    x_anchor, x_pos, x_part, x_neg,
    gamma: float = 0.6,
    margin_pos_neg: float = 1.0,
    margin_pos_part: float = 0.5,
    margin_part_neg: float = 0.5,
    reduction: str = "mean",
    interpret: bool = False,
):
    """Fused γ-quadruplet loss (p=2, swap=False). For p≠2 or swap use the
    jnp twin ``qst_tpu.ops.losses.gamma_quadruplet_loss``."""
    per_example, _ = _forward(x_anchor, x_pos, x_part, x_neg, gamma,
                              margin_pos_neg, margin_pos_part,
                              margin_part_neg, False, interpret)
    if reduction == "mean":
        return per_example.mean()
    if reduction == "sum":
        return per_example.sum()
    return per_example


def _fwd(x_anchor, x_pos, x_part, x_neg, gamma, m_pn, m_pt, m_tn,
         reduction, interpret):
    per_example, dists = _forward(x_anchor, x_pos, x_part, x_neg, gamma,
                                  m_pn, m_pt, m_tn, False, interpret)
    out = (per_example.mean() if reduction == "mean"
           else per_example.sum() if reduction == "sum" else per_example)
    return out, (x_anchor, x_pos, x_part, x_neg, dists)


def _bwd(gamma, m_pn, m_pt, m_tn, reduction, interpret, residuals, g):
    a, p, t, n, dists = residuals
    a32, p32, t32, n32 = (x.astype(jnp.float32) for x in (a, p, t, n))
    B = a32.shape[0]
    d_ap = dists[:, 0:1]
    d_at = dists[:, 1:2]
    d_an = dists[:, 2:3]
    # unit gradients of each distance w.r.t. its first argument
    u_ap = (a32 - p32 + _EPS) / jnp.maximum(d_ap, 1e-12)
    u_at = (a32 - t32 + _EPS) / jnp.maximum(d_at, 1e-12)
    u_an = (a32 - n32 + _EPS) / jnp.maximum(d_an, 1e-12)
    # hinge activation masks, (B, 1) — d_* already carry keepdims
    act_a = (d_ap - d_an + m_pn > 0).astype(jnp.float32)
    act_b = (d_at - d_an + m_tn > 0).astype(jnp.float32)
    act_c = (d_ap - d_at + m_pt > 0).astype(jnp.float32)

    if reduction == "mean":
        scale = jnp.full((B, 1), 1.0 / B) * g
    elif reduction == "sum":
        scale = jnp.full((B, 1), 1.0) * g
    else:
        scale = g[:, None]

    w_b = gamma
    w_c = 1.0 - gamma
    # dL/d(d_ap) = act_a + w_c*act_c ; dL/d(d_at) = w_b*act_b - w_c*act_c ;
    # dL/d(d_an) = -act_a - w_b*act_b
    c_ap = (act_a + w_c * act_c) * scale
    c_at = (w_b * act_b - w_c * act_c) * scale
    c_an = (-act_a - w_b * act_b) * scale

    da = c_ap * u_ap + c_at * u_at + c_an * u_an
    dp = -c_ap * u_ap
    dt = -c_at * u_at
    dn = -c_an * u_an
    return (da.astype(a.dtype), dp.astype(p.dtype), dt.astype(t.dtype),
            dn.astype(n.dtype))


fused_gamma_quadruplet_loss.defvjp(_fwd, _bwd)
