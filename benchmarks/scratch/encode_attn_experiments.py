"""Encode-MFU decomposition experiments (VERDICT r2 #4).

Times ONE fused MiniLM-L6 layer at the encode shape (B=2048, S=128, H=384,
12 heads) across kernel variants that strip or restructure parts of the
attention block, all in one process (relay slow-episodes make cross-process
comparison meaningless):

  full            production kernel body (per-(seq, head) dots + softmax)
  no_softmax      keep both attention dots, skip max/exp/sum (VPU cost)
  no_attn         ctx = v (skip scores+softmax+pv entirely)
  batched_soft    per-head dots -> one stacked (nh*S, S) softmax -> pv
  batched_dots    3-D batched dot_general over (nb*nh) for scores and pv
  matmul_probe    just the 6 block matmuls (proj/ffn) - MXU roofline

The deltas between variants give the time share of each structural piece;
if (full - no_attn) is dominated by (full - no_softmax), the VPU softmax —
not the 32-deep MXU dots — is the MFU limiter.
"""

import functools
import math
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, S, H, NH, F = 2048, 128, 384, 12, 1536
HD = H // NH
NB = 8
EPS = 1e-12


def _ln(x, g, b):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + EPS) * g + b


def _gelu(x):
    z = x * jnp.float32(0.7071067811865476)
    a = jnp.abs(z)
    t = 1.0 / (1.0 + jnp.float32(0.3275911) * a)
    poly = t * (jnp.float32(0.254829592) + t * (
        jnp.float32(-0.284496736) + t * (jnp.float32(1.421413741) + t * (
            jnp.float32(-1.453152027) + t * jnp.float32(1.061405429)))))
    erf = jnp.sign(z) * (1.0 - poly * jnp.exp(-a * a))
    return 0.5 * x * (1.0 + erf)


def _kernel(x_ref, mask_ref, wq, bq, wk, bk, wv, bv, wo, bo, g1, be1,
            w1, bi1, w2, bi2, g2, be2, out_ref, *, mode: str):
    dt = x_ref.dtype
    x = x_ref[:]
    mask_bias = mask_ref[:]
    scale = 1.0 / math.sqrt(HD)

    def proj(w, b):
        return (jnp.dot(x, w[:], preferred_element_type=jnp.float32)
                + b[:]).astype(dt)

    q = proj(wq, bq)
    k = proj(wk, bk)
    v = proj(wv, bv)

    if mode == "matmul_probe" or mode == "no_attn":
        ctx = v
    elif mode == "batched_dots":
        q3 = q.reshape(NB, S, NH, HD).transpose(0, 2, 1, 3).reshape(
            NB * NH, S, HD)
        k3 = k.reshape(NB, S, NH, HD).transpose(0, 2, 1, 3).reshape(
            NB * NH, S, HD)
        v3 = v.reshape(NB, S, NH, HD).transpose(0, 2, 1, 3).reshape(
            NB * NH, S, HD)
        scores = jax.lax.dot_general(
            q3, k3, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # (NB*NH, S, S)
        bias = jnp.repeat(mask_bias, NH, axis=0)[:, None, :]
        scores = scores * scale + bias
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        ctx3 = jax.lax.dot_general(
            p.astype(dt), v3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # (NB*NH, S, HD)
        ctx = ctx3.reshape(NB, NH, S, HD).transpose(0, 2, 1, 3).reshape(
            NB * S, H).astype(dt)
    else:
        rows = []
        for i in range(NB):
            r0, r1 = i * S, (i + 1) * S
            qi, ki, vi = q[r0:r1], k[r0:r1], v[r0:r1]
            bias_i = mask_bias[i:i + 1, :]
            if mode == "batched_soft":
                all_scores = []
                for h in range(NH):
                    c0, c1 = h * HD, (h + 1) * HD
                    s = jax.lax.dot_general(
                        qi[:, c0:c1], ki[:, c0:c1],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    all_scores.append(s * scale + bias_i)
                stacked = jnp.concatenate(all_scores, axis=0)  # (NH*S, S)
                m = jnp.max(stacked, axis=-1, keepdims=True)
                p = jnp.exp(stacked - m)
                p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(dt)
                heads = [jnp.dot(p[h * S:(h + 1) * S], vi[:, h * HD:(h + 1) * HD],
                                 preferred_element_type=jnp.float32)
                         for h in range(NH)]
            else:
                heads = []
                qis = (qi.astype(jnp.float32) * scale).astype(dt) \
                    if mode.startswith("opt") else qi
                for h in range(NH):
                    c0, c1 = h * HD, (h + 1) * HD
                    if mode.startswith("opt"):
                        # scale folded into q: (S, hd) multiply instead of
                        # the (S, S) score multiply
                        s = jax.lax.dot_general(
                            qis[:, c0:c1], ki[:, c0:c1],
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        s = s + bias_i
                        if mode == "opt_nomax":
                            # clamp replaces the row-max reduce (exp
                            # overflows f32 only past ~88)
                            p = jnp.exp(jnp.minimum(s, 60.0))
                        else:  # opt_safe
                            m = jnp.max(s, axis=-1, keepdims=True)
                            p = jnp.exp(s - m)
                        p = p * jax.lax.reciprocal(
                            jnp.sum(p, axis=-1, keepdims=True))
                    else:
                        s = jax.lax.dot_general(
                            qi[:, c0:c1], ki[:, c0:c1],
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        s = s * scale + bias_i
                        if mode == "full":
                            m = jnp.max(s, axis=-1, keepdims=True)
                            p = jnp.exp(s - m)
                            p = p / jnp.sum(p, axis=-1, keepdims=True)
                        else:  # no_softmax
                            p = s
                    heads.append(jnp.dot(p.astype(dt), vi[:, c0:c1],
                                         preferred_element_type=jnp.float32))
            rows.append(jnp.concatenate(heads, axis=1))
        ctx = jnp.concatenate(rows, axis=0).astype(dt)

    attn = jnp.dot(ctx, wo[:], preferred_element_type=jnp.float32) + bo[:]
    if mode == "matmul_probe":
        y = attn.astype(dt)
    else:
        y = _ln(attn + x.astype(jnp.float32), g1[:], be1[:]).astype(dt)
    inter = jnp.dot(y, w1[:], preferred_element_type=jnp.float32) + bi1[:]
    inter = (inter if mode == "matmul_probe" else _gelu(inter)).astype(dt)
    ffn = jnp.dot(inter, w2[:], preferred_element_type=jnp.float32) + bi2[:]
    if mode == "matmul_probe":
        out_ref[:] = ffn.astype(dt)
    else:
        out_ref[:] = _ln(ffn + y.astype(jnp.float32), g2[:],
                         be2[:]).astype(dt)


@functools.partial(jax.jit, static_argnames=("mode",))
def run_layer(x, mask_bias, weights, mode):
    def const(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    w_specs = [const(w.shape) for w in weights]
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid=(B // NB,),
        in_specs=[
            pl.BlockSpec((NB * S, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((NB * S, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * S, H), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, mask_bias, *weights)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B * S, H)) * 0.05, jnp.bfloat16)
    mask = jnp.zeros((B, S), jnp.float32)
    ws = []
    for shape in [(H, H), (1, H)] * 4 + [(1, H), (1, H), (H, F), (1, F),
                                         (F, H), (1, H), (1, H), (1, H)]:
        ws.append(jnp.asarray(rng.standard_normal(shape) * 0.03,
                              jnp.bfloat16 if len(shape) == 2 and
                              shape[0] > 1 else jnp.float32))

    modes = ["full", "no_softmax", "no_attn", "batched_soft",
             "opt_safe", "opt_nomax", "matmul_probe"]
    results = {}
    for mode in modes:
        try:
            out = run_layer(x, mask, ws, mode)
            np.asarray(out[:1, :1])
        except Exception as e:
            print(f"{mode}: FAILED compile/run: {type(e).__name__}: "
                  f"{str(e)[:200]}")
            continue
        # amortize the ~30 ms relay round-trip: 10 async dispatches,
        # one materialization at the end (device executes in order)
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            outs = [run_layer(x, mask, ws, mode) for _ in range(10)]
            np.asarray(outs[-1][:1, :1])
            ts.append((time.perf_counter() - t0) / 10)
        best = min(ts[1:])
        results[mode] = best
        print(f"{mode:14s}: {best * 1e3:7.2f} ms/layer", flush=True)

    if "full" in results:
        f = results["full"]
        for mode, t in results.items():
            if mode != "full":
                print(f"full - {mode:13s} = {(f - t) * 1e3:6.2f} ms")
        # MiniLM-L6 layer FLOPs at this shape
        flops = 2 * B * S * H * H * 4 + 2 * B * NH * S * S * HD * 2 \
            + 2 * B * S * H * F * 2
        peak = 197e12
        print(f"full-layer MFU estimate: "
              f"{flops / results['full'] / peak * 100:.1f}% "
              f"(of 197 TFLOPs bf16)")


if __name__ == "__main__":
    main()
