"""Fused BERT transformer layer: one Pallas TPU kernel per layer.

Round-2 encode lever (benchmarks/RESULTS.md): at B=2048/S=128 the XLA
forward moves ~50.6 GB of HBM traffic per call — the (B, 12, S, S) f32
attention probs (~19 GB) plus f32 layernorm round-trips between fragmented
elementwise kernels — against only 6.09 TFLOP of compute, making MiniLM-L6
(hidden 384) bandwidth-bound at ~16% MFU. This kernel keeps an entire
encoder layer's working set in VMEM per grid step:

- grid over blocks of ``nb`` sequences; the layer's weights (~4 MB bf16)
  use constant index maps so Pallas fetches them once and keeps them
  VMEM-resident across grid steps;
- QKV / output / FFN projections run as single (nb*S, H) x (H, ·) MXU
  matmuls over the whole block;
- attention scores + softmax (f32) + probs·V run per (sequence, head)
  inside VMEM — the (S, S) probs NEVER reach HBM;
- both residual layernorms (f32 statistics) and the exact-erf GELU are
  fused into the same kernel, so per layer the only HBM traffic is the
  (B·S, H) activations in/out plus the one-time weights.

Semantics identical to ``qst_tpu.models.bert.BertLayer`` /
``MPNetLayer`` with ``deterministic=True``. For training, the layer also
carries a custom VJP (``_make_diff_layer``): a second Pallas kernel
recomputes the forward in VMEM (remat semantics — only layer inputs are
saved) and produces dx plus every weight gradient, accumulated across
grid steps in constant-index f32 output blocks. Non-zero dropout rates run
as in-kernel counter-based dropout (``_drop_mask``) at the reference's
three sites, with the backward recompute regenerating bit-identical
masks. Replaces the transformer forward/backward the
reference consumes from torch CUDA kernels via sentence-transformers
(reference ir_evauation_script.py:130-131, training hot loop
quadruplet_sentence_transformer.py:42-60).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Callable, Dict, List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qst_tpu.core.config import EncoderConfig

MASK_BIAS = -1e9  # additive bias for padded key positions (matches bert.py)

# Weight-input order for the kernel (after x and mask-bias).
_WEIGHT_NAMES = (
    "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
    "ln1_g", "ln1_b", "w1", "b1", "w2", "b2", "ln2_g", "ln2_b",
)


def _layernorm_f32(x, gamma, beta, eps):
    """LayerNorm with f32 statistics over the last axis (x already f32)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


def _gelu_erf(x):
    """Exact-erf GELU with an in-kernel erf.

    Mosaic has no erf/erfc lowering, so erf uses the Abramowitz–Stegun
    7.1.26 rational approximation (|err| ≤ 1.5e-7 — far below bf16
    resolution and below the f32 parity tolerance of the tests).
    """
    z = x * jnp.float32(0.7071067811865476)   # x / sqrt(2)
    a = jnp.abs(z)
    t = 1.0 / (1.0 + jnp.float32(0.3275911) * a)
    poly = t * (jnp.float32(0.254829592) + t * (
        jnp.float32(-0.284496736) + t * (jnp.float32(1.421413741) + t * (
            jnp.float32(-1.453152027) + t * jnp.float32(1.061405429)))))
    erf_abs = 1.0 - poly * jnp.exp(-a * a)
    erf = jnp.sign(z) * erf_abs
    return 0.5 * x * (1.0 + erf)


def _drop_mask(shape, seed, rate: float, tag: int):
    """Deterministic dropout keep-mask (f32, pre-scaled by 1/keep).

    Stateless counter-based RNG: murmur3-fmix32 over (element index ⊕ seed
    ⊕ site tag). Identical bits in compiled and interpret mode and across
    the forward kernel and the backward kernel's recompute, with no PRNG
    stream ordering to keep in sync (``pltpu.prng_*`` also has no CPU
    interpret-mode lowering in this JAX version). ``seed`` is a traced
    int32 scalar already folded with the grid step; ``tag`` is a static
    per-site stream id."""
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    h = rows * jnp.int32(shape[1]) + cols
    h = h ^ (seed + jnp.int32(tag) * jnp.int32(-1640531527))   # 0x9E3779B9
    h = h ^ jax.lax.shift_right_logical(h, 16)
    h = h * jnp.int32(-2048144789)                             # 0x85EBCA6B
    h = h ^ jax.lax.shift_right_logical(h, 13)
    h = h * jnp.int32(-1028477387)                             # 0xC2B2AE35
    h = h ^ jax.lax.shift_right_logical(h, 16)
    u = h & jnp.int32(0x7FFFFFFF)                              # 31 uniform bits
    keep = u < jnp.int32(int((1.0 - rate) * 2147483647.0))
    return keep.astype(jnp.float32) * jnp.float32(1.0 / (1.0 - rate))


def _step_seed(seed_ref):
    """Per-grid-step base seed from the (1,) SMEM seed input."""
    return seed_ref[0] ^ (pl.program_id(0) * jnp.int32(-1640531527))


def _layer_kernel(*refs, nb: int, seq: int, num_heads: int, head_dim: int,
                  eps: float, has_rel: bool,
                  attn_drop: float = 0.0, hid_drop: float = 0.0):
    stoch = attn_drop > 0.0 or hid_drop > 0.0
    rest = list(refs)
    x_ref = rest.pop(0)
    mask_ref = rest.pop(0)
    seed_ref = rest.pop(0) if stoch else None
    rel_ref = rest.pop(0) if has_rel else None
    (wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
     g1_ref, be1_ref, w1_ref, bi1_ref, w2_ref, bi2_ref, g2_ref, be2_ref,
     out_ref) = rest
    dt = x_ref.dtype
    x = x_ref[:]                                   # (nb*seq, H)
    mask_bias = mask_ref[:]                        # (nb, seq) f32
    scale = 1.0 / math.sqrt(head_dim)
    seed = _step_seed(seed_ref) if stoch else None

    # Block-wide projections: (nb*seq, H) @ (H, H) on the MXU.
    def proj(w_ref, b_ref):
        acc = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
        return (acc + b_ref[:]).astype(dt)

    q = proj(wq_ref, bq_ref)
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)

    # Per-(sequence, head) attention, fully in VMEM. nb and num_heads are
    # small static constants; the unrolled (S, hd)x(hd, S) / (S, S)x(S, hd)
    # dots pipeline onto the MXU while probs/softmax stay on the VPU in f32.
    seq_rows: List[jax.Array] = []
    for i in range(nb):
        r0, r1 = i * seq, (i + 1) * seq
        qi, ki, vi = q[r0:r1, :], k[r0:r1, :], v[r0:r1, :]
        bias_i = mask_bias[i:i + 1, :]             # (1, seq) → key axis
        heads: List[jax.Array] = []
        for h in range(num_heads):
            c0, c1 = h * head_dim, (h + 1) * head_dim
            scores = jax.lax.dot_general(
                qi[:, c0:c1], ki[:, c0:c1],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            scores = scores * scale + bias_i       # (seq, seq) f32
            if rel_ref is not None:                # MPNet per-head rel bias
                scores = scores + rel_ref[h * seq:(h + 1) * seq, :]
            m = jnp.max(scores, axis=-1, keepdims=True)
            p = jnp.exp(scores - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            if attn_drop > 0.0:
                p = p * _drop_mask((seq, seq), seed, attn_drop,
                                   16 + i * num_heads + h)
            heads.append(jnp.dot(p.astype(dt), vi[:, c0:c1],
                                 preferred_element_type=jnp.float32))
        seq_rows.append(jnp.concatenate(heads, axis=1))
    ctx = jnp.concatenate(seq_rows, axis=0).astype(dt)   # (nb*seq, H)

    attn = jnp.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32)
    attn = attn + bo_ref[:]
    if hid_drop > 0.0:
        attn = attn * _drop_mask(attn.shape, seed, hid_drop, 0)
    y = _layernorm_f32(attn + x.astype(jnp.float32), g1_ref[:], be1_ref[:],
                       eps).astype(dt)

    inter = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32)
    inter = _gelu_erf(inter + bi1_ref[:]).astype(dt)
    ffn = jnp.dot(inter, w2_ref[:], preferred_element_type=jnp.float32)
    ffn = ffn + bi2_ref[:]
    if hid_drop > 0.0:
        ffn = ffn * _drop_mask(ffn.shape, seed, hid_drop, 1)
    out = _layernorm_f32(ffn + y.astype(jnp.float32), g2_ref[:], be2_ref[:],
                         eps)
    out_ref[:] = out.astype(dt)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "nb", "eps", "interpret",
                     "attn_dropout", "hidden_dropout"))
def fused_bert_layer(x: jax.Array, mask_bias: jax.Array,
                     weights: Dict[str, jax.Array], *, num_heads: int,
                     rel_bias: jax.Array | None = None,
                     nb: int = 8, eps: float = 1e-12,
                     attn_dropout: float = 0.0, hidden_dropout: float = 0.0,
                     seed: jax.Array | None = None,
                     interpret: bool = False) -> jax.Array:
    """One full BERT/MPNet encoder layer (attention + FFN + layernorms).

    Parameters
    ----------
    x : (B, S, H) activations (bf16 on TPU; any float for tests)
    mask_bias : (B, S) f32 additive attention bias (0 attended / -1e9 pad)
    weights : dict with 2-D kernels ``wq wk wv wo`` (H, H), ``w1`` (H, F),
        ``w2`` (F, H); biases/LN params as (1, H) / (1, F) f32.
    rel_bias : optional (num_heads*S, S) f32 per-head additive logit bias —
        MPNet's shared T5-style relative position bias (models/mpnet.py).
    nb : sequences per grid step (VMEM working set scales with nb*S).
    attn_dropout / hidden_dropout : static dropout rates. When either is
        > 0 a ``seed`` (shape-(1,) int32) is required and the kernel applies
        in-kernel counter-based dropout at the reference's three sites
        (attention probs; attention output and FFN output before their
        residual layernorms — models/bert.py:105,111,130).
    seed : (1,) int32 dropout seed (ignored when both rates are 0).

    B must be a multiple of ``nb`` (pad upstream — ``fused_encoder_forward``
    does). Returns (B, S, H) in x.dtype.
    """
    B, S, H = x.shape
    stoch = attn_dropout > 0.0 or hidden_dropout > 0.0
    if stoch and seed is None:
        raise ValueError("dropout rates > 0 require a seed")
    if B % nb != 0:
        raise ValueError(f"batch {B} not a multiple of nb={nb}")
    if not interpret and nb % 8 != 0:
        # Mosaic block sublane constraint: the (nb, S) mask block's
        # second-to-last dim must be divisible by 8 on hardware.
        raise ValueError(f"compiled path needs nb % 8 == 0, got {nb}")
    F = weights["w1"].shape[1]
    x2 = x.reshape(B * S, H)
    grid = (B // nb,)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    w_specs = [
        const((H, H)), const((1, H)),      # wq bq
        const((H, H)), const((1, H)),      # wk bk
        const((H, H)), const((1, H)),      # wv bv
        const((H, H)), const((1, H)),      # wo bo
        const((1, H)), const((1, H)),      # ln1
        const((H, F)), const((1, F)),      # w1 b1
        const((F, H)), const((1, H)),      # w2 b2
        const((1, H)), const((1, H)),      # ln2
    ]
    has_rel = rel_bias is not None
    seed_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] if stoch else [])
    seed_args = ([jnp.asarray(seed, jnp.int32).reshape(1)] if stoch else [])
    rel_specs = [const((num_heads * S, S))] if has_rel else []
    rel_args = [rel_bias.astype(jnp.float32)] if has_rel else []
    kernel = functools.partial(
        _layer_kernel, nb=nb, seq=S, num_heads=num_heads,
        head_dim=H // num_heads, eps=eps, has_rel=has_rel,
        attn_drop=attn_dropout, hid_drop=hidden_dropout)
    flops_proj = 2 * B * S * H * H * 4
    flops_attn = 2 * B * num_heads * S * S * (H // num_heads) * 2
    flops_ffn = 2 * B * S * H * F * 2
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb * S, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *seed_specs,
            *rel_specs,
            *w_specs,
        ],
        out_specs=pl.BlockSpec((nb * S, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * S, H), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_proj + flops_attn + flops_ffn,
            bytes_accessed=2 * B * S * H * x.dtype.itemsize
            + (4 * H * H + 2 * H * F) * x.dtype.itemsize,
            transcendentals=B * S * (num_heads * S + F),
        ),
        compiler_params=pltpu.CompilerParams(
            # the full layer's weights + double-buffered activations +
            # f32 FFN temporaries exceed Mosaic's default VMEM budget;
            # v5e has 128 MiB of physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x2, mask_bias, *seed_args, *rel_args,
      *[weights[n] for n in _WEIGHT_NAMES])
    return out.reshape(B, S, H)


# ---------------------------------------------------------------------------
# Backward: one Pallas kernel per layer computes dx and ALL weight grads.
# Remat-style — only the layer INPUT is saved by the VJP; the kernel
# recomputes q/k/v/probs/LN statistics in VMEM (the standard FLOPs-for-HBM
# trade), then runs the full chain rule. Weight-grad outputs use constant
# index maps and accumulate across grid steps (TPU grids are sequential,
# so the read-modify-write is race-free).
# ---------------------------------------------------------------------------

_GRAD_NAMES = _WEIGHT_NAMES  # one grad output per weight, same order


def _gelu_grad(x):
    """d/dx gelu(x) = Φ(x) + x·φ(x), with Φ from the in-kernel erf."""
    # Φ(x) via the same A&S erf approximation the forward uses
    z = x * jnp.float32(0.7071067811865476)
    a = jnp.abs(z)
    t = 1.0 / (1.0 + jnp.float32(0.3275911) * a)
    poly = t * (jnp.float32(0.254829592) + t * (
        jnp.float32(-0.284496736) + t * (jnp.float32(1.421413741) + t * (
            jnp.float32(-1.453152027) + t * jnp.float32(1.061405429)))))
    erf = jnp.sign(z) * (1.0 - poly * jnp.exp(-a * a))
    phi_cdf = 0.5 * (1.0 + erf)
    pdf = jnp.exp(-0.5 * x * x) * jnp.float32(0.3989422804014327)
    return phi_cdf + x * pdf


def _ln_stats(r, eps):
    mu = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(r - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (r - mu) * inv, inv


def _ln_bwd(dy, nhat, inv, gamma):
    """→ dr given upstream dy; also returns (dgamma, dbeta) contributions."""
    dgamma = jnp.sum(dy * nhat, axis=0, keepdims=True)
    dbeta = jnp.sum(dy, axis=0, keepdims=True)
    dn = dy * gamma
    dr = inv * (dn - jnp.mean(dn, axis=-1, keepdims=True)
                - nhat * jnp.mean(dn * nhat, axis=-1, keepdims=True))
    return dr, dgamma, dbeta


def _rows_T_dot(a, b):
    """(N, P)ᵀ·(N, Q) → (P, Q), contracting the row axis on the MXU."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_rhs_T(a, b):
    """(N, P)·(Q, P)ᵀ → (N, Q)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _layer_bwd_kernel(*refs, nb: int, seq: int, num_heads: int,
                      head_dim: int, eps: float, has_rel: bool,
                      attn_drop: float = 0.0, hid_drop: float = 0.0):
    stoch = attn_drop > 0.0 or hid_drop > 0.0
    n_in = 19 + (1 if has_rel else 0) + (1 if stoch else 0)
    ins, outs = list(refs[:n_in]), refs[n_in:]
    x_ref = ins.pop(0)
    mask_ref = ins.pop(0)
    seed_ref = ins.pop(0) if stoch else None
    rel_ref = ins.pop(0) if has_rel else None
    (wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
     g1_ref, be1_ref, w1_ref, bi1_ref, w2_ref, bi2_ref, g2_ref, be2_ref,
     g_ref) = ins
    dx_ref = outs[0]
    grad_refs = outs[1:17]
    drel_ref = outs[17] if has_rel else None
    (dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref, dwo_ref, dbo_ref,
     dg1_ref, dbe1_ref, dw1_ref, dbi1_ref, dw2_ref, dbi2_ref, dg2_ref,
     dbe2_ref) = grad_refs

    dt = x_ref.dtype
    x = x_ref[:]
    mask_bias = mask_ref[:]
    g = g_ref[:].astype(jnp.float32)
    scale = 1.0 / math.sqrt(head_dim)
    seed = _step_seed(seed_ref) if stoch else None
    # dropout keep-masks regenerate bit-identically from (seed, site tag) —
    # see _drop_mask; no state is threaded between forward and backward
    attn_mask_for = (
        (lambda i, h: _drop_mask((seq, seq), seed, attn_drop,
                                 16 + i * num_heads + h))
        if attn_drop > 0.0 else None)

    # ---- forward recompute (mirrors _layer_kernel exactly) ----
    def proj(w_ref, b_ref):
        acc = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
        return (acc + b_ref[:]).astype(dt)

    q = proj(wq_ref, bq_ref)
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)

    def head_probs(i, h):
        r0, r1 = i * seq, (i + 1) * seq
        c0, c1 = h * head_dim, (h + 1) * head_dim
        scores = jax.lax.dot_general(
            q[r0:r1, c0:c1], k[r0:r1, c0:c1],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        scores = scores * scale + mask_bias[i:i + 1, :]
        if has_rel:
            scores = scores + rel_ref[h * seq:(h + 1) * seq, :]
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        return p / jnp.sum(p, axis=-1, keepdims=True)

    seq_rows: List[jax.Array] = []
    for i in range(nb):
        r0, r1 = i * seq, (i + 1) * seq
        heads = []
        for h in range(num_heads):
            c0, c1 = h * head_dim, (h + 1) * head_dim
            p = head_probs(i, h)
            if attn_mask_for is not None:
                p = p * attn_mask_for(i, h)
            heads.append(jnp.dot(p.astype(dt), v[r0:r1, c0:c1],
                                 preferred_element_type=jnp.float32))
        seq_rows.append(jnp.concatenate(heads, axis=1))
    ctx = jnp.concatenate(seq_rows, axis=0).astype(dt)

    a = jnp.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32)
    a = a + bo_ref[:]
    m_attn_out = m_ffn = None
    if hid_drop > 0.0:
        m_attn_out = _drop_mask(a.shape, seed, hid_drop, 0)
        a = a * m_attn_out
    n1, inv1 = _ln_stats(a + x.astype(jnp.float32), eps)
    y = (n1 * g1_ref[:] + be1_ref[:]).astype(dt)
    ipre = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32)
    ipre = ipre + bi1_ref[:]
    i_dt = _gelu_erf(ipre).astype(dt)
    f = jnp.dot(i_dt, w2_ref[:], preferred_element_type=jnp.float32)
    f = f + bi2_ref[:]
    if hid_drop > 0.0:
        m_ffn = _drop_mask(f.shape, seed, hid_drop, 1)
        f = f * m_ffn
    n2, inv2 = _ln_stats(f + y.astype(jnp.float32), eps)

    # ---- backward chain ----
    dr2, dg2, dbe2 = _ln_bwd(g, n2, inv2, g2_ref[:])
    # through the FFN-output dropout: df is the grad at the PRE-dropout f
    df = dr2 * m_ffn if m_ffn is not None else dr2
    df_dt = df.astype(dt)
    dw2 = _rows_T_dot(i_dt, df_dt)
    dbi2 = jnp.sum(df, axis=0, keepdims=True)
    di = _dot_rhs_T(df_dt, w2_ref[:])
    dipre = di * _gelu_grad(ipre)
    dipre_dt = dipre.astype(dt)
    dw1 = _rows_T_dot(y, dipre_dt)
    dbi1 = jnp.sum(dipre, axis=0, keepdims=True)
    dy = dr2 + _dot_rhs_T(dipre_dt, w1_ref[:])

    dr1, dg1, dbe1 = _ln_bwd(dy, n1, inv1, g1_ref[:])
    # through the attention-output dropout
    da = dr1 * m_attn_out if m_attn_out is not None else dr1
    da_dt = da.astype(dt)
    dwo = _rows_T_dot(ctx, da_dt)
    dbo = jnp.sum(da, axis=0, keepdims=True)
    dctx = _dot_rhs_T(da_dt, wo_ref[:])  # (nb*seq, H) f32
    dx_total = dr1  # residual into x (dropout does not touch the residual)

    dq_rows, dk_rows, dv_rows = [], [], []
    drel_heads = ([jnp.zeros((seq, seq), jnp.float32)
                   for _ in range(num_heads)] if has_rel else None)
    for i in range(nb):
        r0, r1 = i * seq, (i + 1) * seq
        dq_h, dk_h, dv_h = [], [], []
        for h in range(num_heads):
            c0, c1 = h * head_dim, (h + 1) * head_dim
            p = head_probs(i, h)
            m_p = attn_mask_for(i, h) if attn_mask_for is not None else None
            p_dt = (p * m_p if m_p is not None else p).astype(dt)
            dc_dt = dctx[r0:r1, c0:c1].astype(dt)
            dv_h.append(_rows_T_dot(p_dt, dc_dt))           # (S, hd)
            dp = _dot_rhs_T(dc_dt, v[r0:r1, c0:c1])         # (S, S) f32
            if m_p is not None:
                dp = dp * m_p  # through the probs dropout
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            if has_rel:
                drel_heads[h] = drel_heads[h] + ds
            dss_dt = (ds * scale).astype(dt)
            dq_h.append(jnp.dot(dss_dt, k[r0:r1, c0:c1],
                                preferred_element_type=jnp.float32))
            dk_h.append(_rows_T_dot(dss_dt, q[r0:r1, c0:c1]))
        dq_rows.append(jnp.concatenate(dq_h, axis=1))
        dk_rows.append(jnp.concatenate(dk_h, axis=1))
        dv_rows.append(jnp.concatenate(dv_h, axis=1))
    dq = jnp.concatenate(dq_rows, axis=0)
    dk = jnp.concatenate(dk_rows, axis=0)
    dv = jnp.concatenate(dv_rows, axis=0)

    contribs = {}
    for name, d, w_ref in (("q", dq, wq_ref), ("k", dk, wk_ref),
                           ("v", dv, wv_ref)):
        d_dt = d.astype(dt)
        contribs["dw" + name] = _rows_T_dot(x, d_dt)
        contribs["db" + name] = jnp.sum(d, axis=0, keepdims=True)
        dx_total = dx_total + _dot_rhs_T(d_dt, w_ref[:])
    dx_ref[:] = dx_total.astype(dt)

    step = pl.program_id(0)
    pairs = [
        (dwq_ref, contribs["dwq"]), (dbq_ref, contribs["dbq"]),
        (dwk_ref, contribs["dwk"]), (dbk_ref, contribs["dbk"]),
        (dwv_ref, contribs["dwv"]), (dbv_ref, contribs["dbv"]),
        (dwo_ref, dwo), (dbo_ref, dbo),
        (dg1_ref, dg1), (dbe1_ref, dbe1),
        (dw1_ref, dw1), (dbi1_ref, dbi1),
        (dw2_ref, dw2), (dbi2_ref, dbi2),
        (dg2_ref, dg2), (dbe2_ref, dbe2),
    ]
    if has_rel:
        pairs.append((drel_ref, jnp.concatenate(drel_heads, axis=0)))

    @pl.when(step == 0)
    def _init():
        for ref, val in pairs:
            ref[:] = val

    @pl.when(step != 0)
    def _acc():
        for ref, val in pairs:
            ref[:] = ref[:] + val


def _fused_layer_bwd(x2: jax.Array, mask_bias: jax.Array,
                     weights: Dict[str, jax.Array],
                     rel_bias, g2: jax.Array, *, num_heads: int, nb: int,
                     eps: float, interpret: bool,
                     attn_dropout: float = 0.0, hidden_dropout: float = 0.0,
                     seed: jax.Array | None = None):
    """→ (dx (B*S, H), {grad per weight}, drel or None)."""
    BS, H = x2.shape
    B = mask_bias.shape[0]
    S = BS // B
    F = weights["w1"].shape[1]
    has_rel = rel_bias is not None
    stoch = attn_dropout > 0.0 or hidden_dropout > 0.0
    seed_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] if stoch else [])
    seed_args = ([jnp.asarray(seed, jnp.int32).reshape(1)] if stoch else [])

    def const(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    blocked = pl.BlockSpec((nb * S, H), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    w_specs = [
        const((H, H)), const((1, H)), const((H, H)), const((1, H)),
        const((H, H)), const((1, H)), const((H, H)), const((1, H)),
        const((1, H)), const((1, H)), const((H, F)), const((1, F)),
        const((F, H)), const((1, H)), const((1, H)), const((1, H)),
    ]
    grad_shapes = [
        ((H, H)), ((1, H)), ((H, H)), ((1, H)), ((H, H)), ((1, H)),
        ((H, H)), ((1, H)), ((1, H)), ((1, H)), ((H, F)), ((1, F)),
        ((F, H)), ((1, H)), ((1, H)), ((1, H)),
    ]
    out_specs = [blocked] + [const(s) for s in grad_shapes]
    out_shapes = [jax.ShapeDtypeStruct((BS, H), x2.dtype)] + [
        jax.ShapeDtypeStruct(s, jnp.float32) for s in grad_shapes]
    rel_specs, rel_args = [], []
    if has_rel:
        rel_specs = [const((num_heads * S, S))]
        rel_args = [rel_bias.astype(jnp.float32)]
        out_specs.append(const((num_heads * S, S)))
        out_shapes.append(
            jax.ShapeDtypeStruct((num_heads * S, S), jnp.float32))

    kernel = functools.partial(
        _layer_bwd_kernel, nb=nb, seq=S, num_heads=num_heads,
        head_dim=H // num_heads, eps=eps, has_rel=has_rel,
        attn_drop=attn_dropout, hid_drop=hidden_dropout)
    outs = pl.pallas_call(
        kernel,
        grid=(B // nb,),
        in_specs=[blocked,
                  pl.BlockSpec((nb, S), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  *seed_specs, *rel_specs, *w_specs, blocked],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x2, mask_bias, *seed_args, *rel_args,
      *[weights[n] for n in _WEIGHT_NAMES], g2)
    dx = outs[0]
    dweights = dict(zip(_GRAD_NAMES, outs[1:17]))
    drel = outs[17] if has_rel else None
    return dx, dweights, drel


@functools.lru_cache(maxsize=None)
def _make_diff_layer(num_heads: int, nb: int, eps: float, interpret: bool,
                     has_rel: bool, attn_dropout: float = 0.0,
                     hidden_dropout: float = 0.0) -> Callable:
    """custom-vjp fused layer: differentiable w.r.t. x, weights (and
    rel_bias for MPNet). Residuals are just the inputs — the backward
    kernel recomputes the forward in VMEM (remat semantics). With dropout
    rates > 0 the layer takes a trailing ``seed`` (1,) int32 argument; the
    backward kernel regenerates the same counter-based masks from it."""
    import numpy as np

    stoch = attn_dropout > 0.0 or hidden_dropout > 0.0

    def run_fwd(x, mask_bias, weights, rel_bias, seed):
        return fused_bert_layer(
            x, mask_bias, weights, num_heads=num_heads, rel_bias=rel_bias,
            nb=nb, eps=eps, attn_dropout=attn_dropout,
            hidden_dropout=hidden_dropout, seed=seed, interpret=interpret)

    def run_bwd(res, gout):
        x, mask_bias, weights, rel_bias, seed = res
        B, S, H = x.shape
        dx, dw, drel = _fused_layer_bwd(
            x.reshape(B * S, H), mask_bias, weights, rel_bias,
            gout.reshape(B * S, H), num_heads=num_heads, nb=nb, eps=eps,
            interpret=interpret, attn_dropout=attn_dropout,
            hidden_dropout=hidden_dropout, seed=seed)
        dw = {k: dw[k].astype(weights[k].dtype) for k in dw}
        dseed = (np.zeros((1,), dtype=jax.dtypes.float0),) if stoch else ()
        if has_rel:
            return (dx.reshape(B, S, H), jnp.zeros_like(mask_bias), dw,
                    drel.astype(rel_bias.dtype), *dseed)
        return (dx.reshape(B, S, H), jnp.zeros_like(mask_bias), dw, *dseed)

    if has_rel and stoch:
        @jax.custom_vjp
        def layer(x, mask_bias, weights, rel_bias, seed):
            return run_fwd(x, mask_bias, weights, rel_bias, seed)

        def fwd(x, mask_bias, weights, rel_bias, seed):
            return (run_fwd(x, mask_bias, weights, rel_bias, seed),
                    (x, mask_bias, weights, rel_bias, seed))
    elif has_rel:
        @jax.custom_vjp
        def layer(x, mask_bias, weights, rel_bias):
            return run_fwd(x, mask_bias, weights, rel_bias, None)

        def fwd(x, mask_bias, weights, rel_bias):
            return (run_fwd(x, mask_bias, weights, rel_bias, None),
                    (x, mask_bias, weights, rel_bias, None))
    elif stoch:
        @jax.custom_vjp
        def layer(x, mask_bias, weights, seed):
            return run_fwd(x, mask_bias, weights, None, seed)

        def fwd(x, mask_bias, weights, seed):
            return (run_fwd(x, mask_bias, weights, None, seed),
                    (x, mask_bias, weights, None, seed))
    else:
        @jax.custom_vjp
        def layer(x, mask_bias, weights):
            return run_fwd(x, mask_bias, weights, None, None)

        def fwd(x, mask_bias, weights):
            return (run_fwd(x, mask_bias, weights, None, None),
                    (x, mask_bias, weights, None, None))

    layer.defvjp(fwd, run_bwd)
    return layer


def layer_weights_from_params(layer_params: Any, hidden_size: int,
                              dtype, arch: str = "bert"
                              ) -> Dict[str, jax.Array]:
    """Flatten one Flax ``BertLayer``/``MPNetLayer`` param subtree to the
    kernel's layout.

    DenseGeneral kernels are head-major — query/key/value (H, nh, hd) →
    (H, H) with column h*hd+d, output_dense (nh, hd, H) → (H, H) with row
    h*hd+d — exactly the slicing order the kernel uses.
    """
    H = hidden_size
    att = layer_params["attention"]

    def wb(p, shape_w):
        return (jnp.asarray(p["kernel"]).reshape(shape_w).astype(dtype),
                jnp.asarray(p["bias"]).reshape(1, -1).astype(jnp.float32))

    qn, kn, vn, on = (("q", "k", "v", "o") if arch == "mpnet"
                      else ("query", "key", "value", "output_dense"))
    wq, bq = wb(att[qn], (H, H))
    wk, bk = wb(att[kn], (H, H))
    wv, bv = wb(att[vn], (H, H))
    wo, bo = wb(att[on], (H, H))
    w1, b1 = wb(layer_params["intermediate"], (H, -1))
    w2, b2 = wb(layer_params["output"], (-1, H))

    def ln(p):
        return (jnp.asarray(p["scale"]).reshape(1, H).astype(jnp.float32),
                jnp.asarray(p["bias"]).reshape(1, H).astype(jnp.float32))

    ln1_g, ln1_b = ln(layer_params["attention_layer_norm"])
    ln2_g, ln2_b = ln(layer_params["output_layer_norm"])
    return dict(wq=wq, bq=bq, wk=wk, bk=bk, wv=wv, bv=bv, wo=wo, bo=bo,
                ln1_g=ln1_g, ln1_b=ln1_b, w1=w1, b1=b1, w2=w2, b2=b2,
                ln2_g=ln2_g, ln2_b=ln2_b)


def fused_encoder_forward(cfg: EncoderConfig, params: Any,
                          input_ids: jax.Array, attention_mask: jax.Array,
                          *, nb: int = 8, interpret: bool = False,
                          differentiable: bool = False,
                          dropout_rng: jax.Array | None = None) -> jax.Array:
    """ids/mask → last hidden state (B, S, H) through fused Pallas layers.

    Numerically matches ``BertEncoder`` / ``MPNetEncoder`` (deterministic) —
    embeddings, and for MPNet the shared relative-position bias table, stay
    in XLA (gathers XLA already handles well); the transformer layers run
    through ``fused_bert_layer``.

    ``dropout_rng``: when given AND the config has non-zero dropout rates,
    the forward is the TRAINING forward — embedding dropout runs in XLA
    (models/bert.py:51 / models/mpnet.py:121 semantics) and the per-layer
    attention-probs / attention-output / FFN-output dropouts run inside the
    Pallas kernels from per-layer integer seeds derived from the rng.
    """
    if cfg.arch not in ("bert", "mpnet"):
        raise ValueError(
            f"fused layer supports arch='bert'/'mpnet', {cfg.arch} given")
    dt = jnp.dtype(cfg.dtype)
    enc = params["encoder"]
    B, S = input_ids.shape
    rel_bias = None
    train = (dropout_rng is not None
             and (cfg.hidden_dropout > 0 or cfg.attention_dropout > 0))
    attn_drop = cfg.attention_dropout if train else 0.0
    hid_drop = cfg.hidden_dropout if train else 0.0

    if cfg.arch == "mpnet":
        from qst_tpu.models.mpnet import (
            padding_aware_position_ids,
            relative_position_bucket,
        )

        pos_ids = padding_aware_position_ids(input_ids, cfg.pad_token_id)
        word = jnp.take(jnp.asarray(enc["word_embeddings"]["embedding"]),
                        input_ids, axis=0).astype(dt)
        pos = jnp.take(jnp.asarray(enc["position_embeddings"]["embedding"]),
                       pos_ids, axis=0).astype(dt)
        x = _layernorm_f32(
            (word + pos).astype(jnp.float32),
            jnp.asarray(enc["embed_layer_norm"]["scale"]).astype(jnp.float32),
            jnp.asarray(enc["embed_layer_norm"]["bias"]).astype(jnp.float32),
            cfg.layer_norm_eps).astype(dt)
        # shared per-head relative bias, laid out (num_heads*S, S) so the
        # kernel slices head h's (S, S) block statically
        ctx_pos = jnp.arange(S)[:, None]
        mem_pos = jnp.arange(S)[None, :]
        buckets = relative_position_bucket(mem_pos - ctx_pos)      # (S, S)
        table = jnp.asarray(
            enc["relative_attention_bias"]["embedding"]).astype(jnp.float32)
        rel = jnp.take(table, buckets, axis=0)                     # (S, S, NH)
        rel_bias = rel.transpose(2, 0, 1).reshape(cfg.num_heads * S, S)
    else:
        emb = enc["embeddings"]
        word = jnp.take(jnp.asarray(emb["word_embeddings"]["embedding"]),
                        input_ids, axis=0).astype(dt)
        pos = jnp.asarray(
            emb["position_embeddings"]["embedding"])[:S].astype(dt)[None]
        typ = jnp.asarray(
            emb["token_type_embeddings"]["embedding"])[0].astype(dt)[None, None]
        x = (word + pos + typ).astype(jnp.float32)
        x = _layernorm_f32(
            x, jnp.asarray(emb["layer_norm"]["scale"]).astype(jnp.float32),
            jnp.asarray(emb["layer_norm"]["bias"]).astype(jnp.float32),
            cfg.layer_norm_eps).astype(dt)

    mask_bias = jnp.where(attention_mask > 0, 0.0, MASK_BIAS)
    mask_bias = mask_bias.astype(jnp.float32)

    seeds = None
    if train:
        # embedding dropout stays in XLA (same site as the Flax modules);
        # per-layer int32 seeds drive the in-kernel counter-based masks
        emb_key, seed_key = jax.random.split(dropout_rng)
        if cfg.hidden_dropout > 0:
            keepp = 1.0 - cfg.hidden_dropout
            keep = jax.random.bernoulli(emb_key, keepp, x.shape)
            x = (x * keep.astype(x.dtype) / keepp).astype(dt)
        seeds = jax.random.randint(
            seed_key, (cfg.num_layers, 1), 0, 2**31 - 1, dtype=jnp.int32)

    # Pad the batch to a multiple of nb; pad rows are fully masked (their
    # softmax degenerates to uniform — finite — and they are sliced off).
    pad = (-B) % nb
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        mask_bias = jnp.pad(mask_bias, ((0, pad), (0, 0)),
                            constant_values=MASK_BIAS)

    diff_layer = None
    if differentiable:
        # custom-vjp layer: grads for x/weights (+ rel bias) flow back
        # through the Pallas backward kernel; grads to the original param
        # tree compose via XLA autodiff of the reshape/cast in
        # layer_weights_from_params and the embedding gathers above.
        diff_layer = _make_diff_layer(cfg.num_heads, nb,
                                      cfg.layer_norm_eps, interpret,
                                      rel_bias is not None,
                                      attn_drop, hid_drop)
    for i in range(cfg.num_layers):
        w = layer_weights_from_params(enc[f"layer_{i}"], cfg.hidden_size,
                                      dt, arch=cfg.arch)
        seed_i = (seeds[i],) if train else ()
        if differentiable:
            x = (diff_layer(x, mask_bias, w, rel_bias, *seed_i)
                 if rel_bias is not None
                 else diff_layer(x, mask_bias, w, *seed_i))
        else:
            x = fused_bert_layer(x, mask_bias, w, num_heads=cfg.num_heads,
                                 rel_bias=rel_bias, nb=nb,
                                 eps=cfg.layer_norm_eps,
                                 attn_dropout=attn_drop,
                                 hidden_dropout=hid_drop,
                                 seed=seeds[i] if train else None,
                                 interpret=interpret)
    return x[:B]


def fused_embed_fn(cfg: EncoderConfig, *, nb: int = 8,
                   interpret: bool | None = None,
                   differentiable: bool = False,
                   with_dropout: bool = False) -> Callable:
    """The fused-path pure forward: (params, ids, mask) → (B, D) embeddings.

    Drop-in replacement for ``sentence_encoder.embed_fn`` on the encode
    path. With ``differentiable=True`` the layers carry a custom VJP
    (Pallas backward kernel) so the whole function is ``jax.grad``-able —
    the fused TRAINING trunk. With ``with_dropout=True`` the returned
    function takes a trailing ``dropout_rng`` argument and applies the
    config's dropout rates (in-kernel counter-based masks; reference
    training semantics). ``interpret=None`` auto-selects interpreter mode
    off-TPU so the same code runs in CPU tests.
    """
    from qst_tpu.ops.distances import l2_normalize
    from qst_tpu.ops.pooling import POOLERS

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"

    def fwd(params, input_ids, attention_mask, dropout_rng=None):
        hidden = fused_encoder_forward(cfg, params, input_ids,
                                       attention_mask, nb=nb,
                                       interpret=interpret,
                                       differentiable=differentiable,
                                       dropout_rng=dropout_rng)
        pooled = POOLERS[cfg.pooling](hidden, attention_mask)
        if cfg.normalize:
            pooled = l2_normalize(pooled)
        return pooled

    if with_dropout:
        return fwd
    return lambda params, input_ids, attention_mask: fwd(
        params, input_ids, attention_mask)
