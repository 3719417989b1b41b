"""Pallas TPU kernel: fused tiled matmul + streaming bucket-top-k.

The north-star retrieval kernel (BASELINE.json): query-time exact top-k over
an HBM-resident corpus as ONE kernel — scores are computed on the MXU block
by block, reduced to 128-wide bucket maxima, and merged into a running
per-query top-K bucket set held in VMEM scratch, so the (Q, N) score matrix
NEVER round-trips through HBM (the dominant cost of the XLA scan version:
~17 GB of score traffic per 4096-query×1M-doc search).

Exactness argument (same as qst_tpu.retrieval.index.exact_topk): if e is one
of the top-k elements, at most k−1 buckets can have a max greater than e's
bucket max, so the top-K≥k buckets by max always contain the top-k elements;
a final narrow top-k over the carried (Q, K·128) bucket rows resolves exact
element ranks.

The merge is branch-free VPU code: per candidate bucket, replace the current
minimum slot via argmin + one-hot select (no sorts, no data-dependent
control flow).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BUCKET = 128   # lane width; bucket-max granularity
K_PAD = 16     # carried bucket slots (supports k <= 16)
QB = 256       # query block rows per grid step
CB = 1024      # corpus rows per grid step (8 buckets)


def _kernel(q_ref, c_ref, max_out, id_out, rows_out,
            smax, sid, srows, *, n_real: int, n_ct: int):
    ct = pl.program_id(1)

    @pl.when(ct == 0)
    def _init():
        smax[:] = jnp.full_like(smax, -jnp.inf)
        sid[:] = jnp.full_like(sid, -1)
        srows[:] = jnp.full_like(srows, -jnp.inf)

    # scores for this (query block, corpus block): MXU matmul, f32 accum
    s = jax.lax.dot_general(
        q_ref[:], c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (QB, CB)

    # mask padded corpus rows (static corpus size baked in)
    base = ct * CB
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + base
    s = jnp.where(col < n_real, s, -jnp.inf)

    n_buckets = CB // BUCKET
    rows3 = s.reshape(QB, n_buckets, BUCKET)
    bmax = jnp.max(rows3, axis=2)  # (QB, n_buckets)

    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (QB, K_PAD), 1)
    # 3-D selection predicate built from int32 comparisons: Mosaic cannot
    # insert a minor dim on i1 vectors, so never reshape a 2-D bool to 3-D
    slot_iota3 = jax.lax.broadcasted_iota(jnp.int32, (QB, K_PAD, BUCKET), 1)
    for j in range(n_buckets):  # static unroll; branch-free merge
        # in-place scratch read-modify-write keeps ONE live rows buffer
        # (functional threading kept n_buckets live copies → VMEM OOM)
        cur_max = smax[:]
        val = bmax[:, j]                    # (QB,)
        row = rows3[:, j, :]                # (QB, BUCKET)
        cur_min = jnp.min(cur_max, axis=1)  # (QB,)
        # manual argmin (first slot holding the min): Mosaic-safe int ops
        is_min = cur_max == cur_min[:, None]
        slot = jnp.min(jnp.where(is_min, slot_iota, K_PAD), axis=1)
        better = val > cur_min
        sel = better[:, None] & (slot_iota == slot[:, None])  # (QB, K_PAD)
        gid = base // BUCKET + j
        smax[:] = jnp.where(sel, val[:, None], cur_max)
        sid[:] = jnp.where(sel, gid, sid[:])
        better_i = better.astype(jnp.int32)
        sel3 = (slot_iota3 == slot[:, None, None]) & (
            better_i[:, None, None] > 0)
        srows[:] = jnp.where(sel3, row[:, None, :], srows[:])

    @pl.when(ct == n_ct - 1)
    def _emit():
        max_out[:] = smax[:]
        id_out[:] = sid[:]
        rows_out[:] = srows[:]


def _pad_to(x: jax.Array, rows: int, fill=0.0) -> jax.Array:
    if x.shape[0] == rows:
        return x
    return jnp.pad(x, ((0, rows - x.shape[0]), (0, 0)),
                   constant_values=fill)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def pallas_topk(queries: jax.Array, corpus: jax.Array, k: int,
                interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k by dot-product score (pre-normalize for cosine).

    queries (Q, D) f32/bf16; corpus (N, D). → (scores (Q, k) f32,
    indices (Q, k) i32). Requires k <= K_PAD.
    """
    if k > K_PAD:
        raise ValueError(f"pallas_topk supports k <= {K_PAD}, got {k}")
    Q, D = queries.shape
    N = corpus.shape[0]

    q_pad = ((Q + QB - 1) // QB) * QB
    c_pad = ((N + CB - 1) // CB) * CB
    queries_p = _pad_to(queries, q_pad)
    corpus_p = _pad_to(corpus, c_pad)
    n_qb, n_ct = q_pad // QB, c_pad // CB

    compute_dtype = jnp.bfloat16 if corpus.dtype == jnp.bfloat16 else jnp.float32
    queries_p = queries_p.astype(compute_dtype)
    corpus_p = corpus_p.astype(compute_dtype)

    kernel = functools.partial(_kernel, n_real=N, n_ct=n_ct)
    grid = (n_qb, n_ct)
    max_o, id_o, rows_o = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((QB, D), lambda qb, ct: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, D), lambda qb, ct: (ct, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((QB, K_PAD), lambda qb, ct: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QB, K_PAD), lambda qb, ct: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QB, K_PAD, BUCKET), lambda qb, ct: (qb, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q_pad, K_PAD), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, K_PAD), jnp.int32),
            jax.ShapeDtypeStruct((q_pad, K_PAD, BUCKET), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((QB, K_PAD), jnp.float32),
            pltpu.VMEM((QB, K_PAD), jnp.int32),
            pltpu.VMEM((QB, K_PAD, BUCKET), jnp.float32),
        ],
        interpret=interpret,
    )(queries_p, corpus_p)

    # final exact resolution over the carried bucket rows (narrow top-k)
    flat = rows_o.reshape(q_pad, K_PAD * BUCKET)
    top_s, flat_pos = jax.lax.top_k(flat, k)
    slot = flat_pos // BUCKET
    within = flat_pos % BUCKET
    bucket_id = jnp.take_along_axis(id_o, slot, axis=1)
    top_i = bucket_id * BUCKET + within
    return top_s[:Q], top_i[:Q]


def reference_topk(queries: jax.Array, corpus: jax.Array,
                   k: int) -> Tuple[jax.Array, jax.Array]:
    """jnp twin for golden tests."""
    s = jnp.dot(queries.astype(jnp.float32), corpus.astype(jnp.float32).T,
                preferred_element_type=jnp.float32)
    return jax.lax.top_k(s, k)


# ---------------------------------------------------------------------------
# v2: deferred merge — the kernel only fuses matmul + bucket-max (no VPU
# merge loop, scores never reach HBM); bucket selection happens hierarchically
# in XLA over the (Q, N/128) maxima, and winning buckets are re-scored from a
# small corpus gather. Exactness: top-k bucket maxima cover the top-k docs
# (see module docstring), applied once per hierarchy level.
# ---------------------------------------------------------------------------

QB2 = 256   # query rows per grid step
CB2 = 2048  # corpus rows per grid step (16 buckets); sized with the f32
            # scores block + double-buffered corpus inside the 16MB VMEM


def _bucket_max_kernel(q_ref, c_ref, out_ref, *, n_real: int):
    ct = pl.program_id(1)
    s = jax.lax.dot_general(
        q_ref[:], c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (QB2, CB2)
    base = ct * CB2
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + base
    s = jnp.where(col < n_real, s, -jnp.inf)
    bmax = jnp.max(s.reshape(QB2, CB2 // BUCKET, BUCKET), axis=2)
    # output blocks are 128 lanes wide (Mosaic tiling); pad the CB2/128
    # real maxima with -inf filler columns
    nb = CB2 // BUCKET
    out_ref[:] = jnp.pad(bmax, ((0, 0), (0, BUCKET - nb)),
                         constant_values=-jnp.inf)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bucket_maxima(queries: jax.Array, corpus: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """Fused scores→128-bucket maxima, (Q, ceil(N/128)) f32."""
    Q, D = queries.shape
    N = corpus.shape[0]
    q_pad = ((Q + QB2 - 1) // QB2) * QB2
    c_pad = ((N + CB2 - 1) // CB2) * CB2
    queries_p = _pad_to(queries, q_pad)
    corpus_p = _pad_to(corpus, c_pad)
    compute_dtype = jnp.bfloat16 if corpus.dtype == jnp.bfloat16 else jnp.float32
    queries_p = queries_p.astype(compute_dtype)
    corpus_p = corpus_p.astype(compute_dtype)
    n_qb, n_ct = q_pad // QB2, c_pad // CB2
    nb_tile = CB2 // BUCKET

    out = pl.pallas_call(
        functools.partial(_bucket_max_kernel, n_real=N),
        grid=(n_qb, n_ct),
        in_specs=[
            pl.BlockSpec((QB2, D), lambda qb, ct: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CB2, D), lambda qb, ct: (ct, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((QB2, BUCKET), lambda qb, ct: (qb, ct),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q_pad, n_ct * BUCKET), jnp.float32),
        interpret=interpret,
    )(queries_p, corpus_p)
    # strip the per-tile filler columns: (Q, n_ct, 128)[..., :nb_tile]
    out = out[:Q].reshape(Q, n_ct, BUCKET)[:, :, :nb_tile]
    out = out.reshape(Q, n_ct * nb_tile)
    n_buckets = -(-N // BUCKET)
    return out[:, :n_buckets]


def _hierarchical_top_buckets(bm: jax.Array, k: int) -> jax.Array:
    """→ (Q, k) winning bucket ids from (Q, NB) bucket maxima without a wide
    top_k: super-bucket maxima → narrow top_k → slice gather → narrow top_k."""
    Q, NB = bm.shape
    nb_pad = ((NB + BUCKET - 1) // BUCKET) * BUCKET
    if nb_pad != NB:
        bm = jnp.pad(bm, ((0, 0), (0, nb_pad - NB)),
                     constant_values=-jnp.inf)
    n_super = nb_pad // BUCKET
    tiles = bm.reshape(Q, n_super, BUCKET)
    smax = jnp.max(tiles, axis=2)                       # (Q, n_super)
    kk = min(k, n_super)
    _, s_idx = jax.lax.top_k(smax, kk)                  # (Q, kk)
    cand = jnp.take_along_axis(tiles, s_idx[:, :, None], axis=1)
    cand = cand.reshape(Q, kk * BUCKET)                 # (Q, kk*128)
    _, pos = jax.lax.top_k(cand, k)
    super_id = jnp.take_along_axis(s_idx, pos // BUCKET, axis=1)
    return super_id * BUCKET + pos % BUCKET             # bucket ids (Q, k)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def pallas_topk_v2(queries: jax.Array, corpus: jax.Array, k: int,
                   interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k, v2 pipeline: Pallas fused bucket-maxima → hierarchical
    bucket selection → re-score winning buckets from a (Q·k·128, D) corpus
    gather → final narrow top-k. Supports any k ≤ 128."""
    Q, D = queries.shape
    N = corpus.shape[0]
    k = min(k, N)
    bm = bucket_maxima(queries, corpus, interpret=interpret)
    bucket_ids = _hierarchical_top_buckets(bm, k)       # (Q, k)

    # gather the winning buckets' docs and re-score exactly
    doc_ids = (bucket_ids[:, :, None] * BUCKET
               + jnp.arange(BUCKET)[None, None, :])     # (Q, k, 128)
    doc_ids_flat = doc_ids.reshape(Q, k * BUCKET)
    valid = doc_ids_flat < N
    safe_ids = jnp.minimum(doc_ids_flat, N - 1)
    docs = corpus[safe_ids]                             # (Q, k*128, D)
    scores = jnp.einsum("qd,qmd->qm", queries.astype(jnp.float32),
                        docs.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    scores = jnp.where(valid, scores, -jnp.inf)
    top_s, pos = jax.lax.top_k(scores, k)
    top_i = jnp.take_along_axis(doc_ids_flat, pos, axis=1)
    return top_s, top_i
