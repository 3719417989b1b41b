"""4-bit ("fast-scan") product quantization — the TPU decode-roofline fix.

8-bit PQ decode is a batch of per-subspace (T, 256)×(256, ds) matmuls; at
ds = 8 the outputs occupy 8 of the MXU's 128 lanes, so each decoded doc
costs ~16× its algorithmic FLOPs in silicon (~3.2 MFLOP/doc measured — the
roofline that caps `PQIndex` at 425 QPS over 100M docs and would cap an
IVF-PQ probe scan the same way; see benchmarks/RESULTS.md "Decode
roofline").

The classic CPU escape is 4-bit codes with SIMD shuffle lookups (FAISS
"fast scan"). The TPU-native equivalent reshapes the decode itself: with
16-way codebooks over ds = D/(2m)-dim subspaces, GROUP adjacent subspaces
fold into ONE matmul against a block-diagonal codebook —

    one_hot(codes)  (T, GROUP·16)  @  cb_block (GROUP·16, GROUP·ds)

K = 512 contraction depth and a 128-wide output tile at GROUP = 32, ds = 4:
every MXU lane is live. Silicon per doc drops to GROUP-packed
~0.4 MFLOP — an ~8× decode-roofline win at identical bytes/doc (two codes
per byte ⇒ 2m subspaces at m bytes/doc, the same memory as 8-bit PQ with
m subspaces).

The finer-grained codebooks (16 centroids over 4 dims vs 256 over 8) sit
at a slightly coarser quantization point; the intended use is inside
:class:`qst_tpu.retrieval.ivfpq.IVFPQIndex` (``bits=4``) where residual
encoding shrinks the signal being quantized and ``refine_factor`` re-ranks
exactly, recovering end recall (measured in benchmarks/RESULTS.md).

No reference counterpart: the reference brute-force scans torch chunks
(reference training/main.py:178-179); this is the rebuilt engine's
serving-scale envelope.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from qst_tpu.retrieval.pq import _aniso_fit, _compute_dtype

K4 = 16          # centroids per 4-bit subspace
GROUP = 32       # subspaces folded per block-diagonal decode matmul


def n_groups(n_sub: int) -> int:
    """Number of decode packs for ``n_sub`` subspaces (last may be short —
    callers keep n_sub % GROUP == 0 or n_sub < GROUP)."""
    g = min(GROUP, n_sub)
    if n_sub % g:
        raise ValueError(f"n_sub={n_sub} not a multiple of group={g}")
    return n_sub // g


@functools.partial(jax.jit, static_argnames=("m", "n_iters"))
def pq4_train(sample: jax.Array, key: jax.Array, m: int,
              n_iters: int = 16) -> jax.Array:
    """Per-subspace 16-way Lloyd k-means in RAW space (callers pass
    residuals or unit rows — no re-normalization, matching
    :func:`qst_tpu.retrieval.ivfpq.pq_train_raw`). → (m, 16, ds) f32."""
    s, d = sample.shape
    ds = d // m
    xs = jnp.transpose(sample.astype(jnp.float32).reshape(s, m, ds),
                       (1, 0, 2))                           # (m, S, ds)
    init_idx = jax.random.choice(key, s, (K4,), replace=False)
    cb0 = xs[:, init_idx, :]

    def step(cb, _):
        assign = jnp.argmax(_aniso_fit(xs, cb, 0.0), axis=-1)   # (m, S)
        onehot = jax.nn.one_hot(assign, K4, dtype=jnp.float32)
        sums = jnp.einsum("msk,msd->mkd", onehot, xs,
                          preferred_element_type=jnp.float32)
        counts = jnp.sum(onehot, axis=1)
        new = sums / jnp.maximum(counts[:, :, None], 1)
        return jnp.where(counts[:, :, None] > 0, new, cb), None

    cb, _ = jax.lax.scan(step, cb0, None, length=n_iters)
    return cb


@jax.jit
def pq4_encode(vectors: jax.Array, codebooks: jax.Array) -> jax.Array:
    """Encode raw vectors against (m, 16, ds) codebooks and PACK two codes
    per byte → (B, m // 2) uint8 (even subspace in the low nibble)."""
    m = codebooks.shape[0]
    if m % 2:
        raise ValueError(f"4-bit packing needs an even subspace count, "
                         f"got {m}")
    ds = codebooks.shape[-1]
    x = vectors.astype(jnp.float32)
    xs = jnp.transpose(x.reshape(x.shape[0], m, ds), (1, 0, 2))
    codes = jnp.argmax(_aniso_fit(xs, codebooks, 0.0), axis=-1).T  # (B, m)
    lo = codes[:, 0::2]
    hi = codes[:, 1::2]
    return (lo | (hi << 4)).astype(jnp.uint8)


def unpack_nibbles(packed: jax.Array) -> jax.Array:
    """(…, m/2) uint8 → (…, m) int32 codes in original subspace order."""
    lo = (packed & 0xF).astype(jnp.int32)
    hi = (packed >> 4).astype(jnp.int32)
    return jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)


def block_codebooks(codebooks: jax.Array) -> jax.Array:
    """(m, 16, ds) → (packs, g·16, g·ds) block-diagonal decode matrices
    (pack p, block j holds subspace p·g+j's codebook at row block j·16,
    column block j·ds; zeros elsewhere). Built once per index."""
    m, k, ds = codebooks.shape
    p = n_groups(m)
    g = m // p
    cb = codebooks.reshape(p, g, k, ds)
    eye = jnp.eye(g, dtype=cb.dtype)                       # (g, g)
    # out[p, j·16+c, i·ds+d] = cb[p, j, c, d] · eye[j, i]
    blk = jnp.einsum("pjkd,ji->pjkid", cb, eye)
    return blk.reshape(p, g * k, g * ds)


def decode4_rows(packed: jax.Array, cb_block: jax.Array) -> jax.Array:
    """(T, m/2) uint8 packed codes → (T, D) reconstructions through the
    block-diagonal matmul (K = g·16 contraction, g·ds-wide output — full
    MXU lanes at g=32, ds=4). ``cb_block`` from :func:`block_codebooks`,
    cast by the caller to the compute dtype."""
    p, gk, gd = cb_block.shape
    g = gk // K4
    T = packed.shape[0]
    codes = unpack_nibbles(packed).reshape(T, p, g)        # (T, p, g)
    oh = jax.nn.one_hot(codes, K4, dtype=cb_block.dtype)   # (T, p, g, 16)
    oh = oh.reshape(T, p, gk)
    rec = jnp.einsum("tpk,pkd->tpd", oh, cb_block,
                     preferred_element_type=jnp.float32)
    return rec.reshape(T, p * gd).astype(cb_block.dtype)


@functools.partial(jax.jit, static_argnames=())
def pq4_reconstruct(packed: jax.Array, codebooks: jax.Array) -> jax.Array:
    """Convenience f32 reconstruction (tests / goldens): packed (B, m/2)
    uint8 → (B, D) f32."""
    blk = block_codebooks(codebooks.astype(jnp.float32))
    return decode4_rows(packed, blk).astype(jnp.float32)


def compute_block_codebooks(codebooks: jax.Array) -> jax.Array:
    """Device-resident blocked codebooks in the TPU compute dtype — the
    per-index cache the search path feeds to :func:`decode4_rows`."""
    return block_codebooks(codebooks).astype(_compute_dtype())


def pq4_mse(sample: jax.Array, codebooks: jax.Array) -> float:
    """Mean squared reconstruction error of ``sample`` under the
    codebooks (build-time quality probe)."""
    packed = pq4_encode(sample, codebooks)
    rec = pq4_reconstruct(packed, codebooks)
    return float(jnp.mean((rec - sample.astype(jnp.float32)) ** 2))


def validate_pq4_dims(d: int, n_sub: int) -> Tuple[int, int]:
    """Check (D, subspace-count) compatibility → (ds, packs)."""
    if n_sub % 2:
        raise ValueError(f"4-bit subspace count must be even, got {n_sub}")
    if d % n_sub:
        raise ValueError(f"dim {d} not divisible by {n_sub} subspaces")
    return d // n_sub, n_groups(n_sub)
