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

Semantics identical to ``qst_tpu.models.bert.BertLayer`` with
``deterministic=True`` (the encode/inference path — this kernel has no
custom VJP; training keeps the Flax path, whose 4-role fused forward is
grad-checked in tests). Replaces the transformer-forward capability the
reference consumes from torch CUDA kernels via sentence-transformers
``encode`` (reference ir_evauation_script.py:130-131,
positive_examples_selection.py:53-54).
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


def _layer_kernel(*refs, nb: int, seq: int, num_heads: int, head_dim: int,
                  eps: float, has_rel: bool):
    if has_rel:
        (x_ref, mask_ref, rel_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
         bv_ref, wo_ref, bo_ref, g1_ref, be1_ref, w1_ref, bi1_ref, w2_ref,
         bi2_ref, g2_ref, be2_ref, out_ref) = refs
    else:
        (x_ref, mask_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
         wo_ref, bo_ref, g1_ref, be1_ref, w1_ref, bi1_ref, w2_ref, bi2_ref,
         g2_ref, be2_ref, out_ref) = refs
        rel_ref = None
    dt = x_ref.dtype
    x = x_ref[:]                                   # (nb*seq, H)
    mask_bias = mask_ref[:]                        # (nb, seq) f32
    scale = 1.0 / math.sqrt(head_dim)

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
            heads.append(jnp.dot(p.astype(dt), vi[:, c0:c1],
                                 preferred_element_type=jnp.float32))
        seq_rows.append(jnp.concatenate(heads, axis=1))
    ctx = jnp.concatenate(seq_rows, axis=0).astype(dt)   # (nb*seq, H)

    attn = jnp.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32)
    attn = attn + bo_ref[:]
    y = _layernorm_f32(attn + x.astype(jnp.float32), g1_ref[:], be1_ref[:],
                       eps).astype(dt)

    inter = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32)
    inter = _gelu_erf(inter + bi1_ref[:]).astype(dt)
    ffn = jnp.dot(inter, w2_ref[:], preferred_element_type=jnp.float32)
    ffn = ffn + bi2_ref[:]
    out = _layernorm_f32(ffn + y.astype(jnp.float32), g2_ref[:], be2_ref[:],
                         eps)
    out_ref[:] = out.astype(dt)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "nb", "eps", "interpret"))
def fused_bert_layer(x: jax.Array, mask_bias: jax.Array,
                     weights: Dict[str, jax.Array], *, num_heads: int,
                     rel_bias: jax.Array | None = None,
                     nb: int = 4, eps: float = 1e-12,
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

    B must be a multiple of ``nb`` (pad upstream — ``fused_encoder_forward``
    does). Returns (B, S, H) in x.dtype.
    """
    B, S, H = x.shape
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
    rel_specs = [const((num_heads * S, S))] if has_rel else []
    rel_args = [rel_bias.astype(jnp.float32)] if has_rel else []
    kernel = functools.partial(
        _layer_kernel, nb=nb, seq=S, num_heads=num_heads,
        head_dim=H // num_heads, eps=eps, has_rel=has_rel)
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
    )(x2, mask_bias, *rel_args, *[weights[n] for n in _WEIGHT_NAMES])
    return out.reshape(B, S, H)


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
                          *, nb: int = 4,
                          interpret: bool = False) -> jax.Array:
    """ids/mask → last hidden state (B, S, H) through fused Pallas layers.

    Numerically matches ``BertEncoder`` / ``MPNetEncoder`` (deterministic) —
    embeddings, and for MPNet the shared relative-position bias table, stay
    in XLA (gathers XLA already handles well); the transformer layers run
    through ``fused_bert_layer``.
    """
    if cfg.arch not in ("bert", "mpnet"):
        raise ValueError(
            f"fused layer supports arch='bert'/'mpnet', {cfg.arch} given")
    dt = jnp.dtype(cfg.dtype)
    enc = params["encoder"]
    B, S = input_ids.shape
    rel_bias = None

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

    # Pad the batch to a multiple of nb; pad rows are fully masked (their
    # softmax degenerates to uniform — finite — and they are sliced off).
    pad = (-B) % nb
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        mask_bias = jnp.pad(mask_bias, ((0, pad), (0, 0)),
                            constant_values=MASK_BIAS)

    for i in range(cfg.num_layers):
        w = layer_weights_from_params(enc[f"layer_{i}"], cfg.hidden_size,
                                      dt, arch=cfg.arch)
        x = fused_bert_layer(x, mask_bias, w, num_heads=cfg.num_heads,
                             rel_bias=rel_bias, nb=nb,
                             eps=cfg.layer_norm_eps, interpret=interpret)
    return x[:B]


def fused_embed_fn(cfg: EncoderConfig, *, nb: int = 4,
                   interpret: bool | None = None) -> Callable:
    """The fused-path pure forward: (params, ids, mask) → (B, D) embeddings.

    Drop-in replacement for ``sentence_encoder.embed_fn`` on the encode
    path (inference only — no VJP). ``interpret=None`` auto-selects
    interpreter mode off-TPU so the same code runs in CPU tests.
    """
    from qst_tpu.ops.distances import l2_normalize
    from qst_tpu.ops.pooling import POOLERS

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"

    def fwd(params, input_ids, attention_mask):
        hidden = fused_encoder_forward(cfg, params, input_ids,
                                       attention_mask, nb=nb,
                                       interpret=interpret)
        pooled = POOLERS[cfg.pooling](hidden, attention_mask)
        if cfg.normalize:
            pooled = l2_normalize(pooled)
        return pooled

    return fwd
