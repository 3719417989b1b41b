"""Pallas TPU kernel: IVF probed-cell scoring via dynamic-DMA gather.

XLA lowers the IVF probe gather (``cells[probe]`` — (Q, L, D) rows from the
(C, L, D) cell tensor) to a row-gather that runs at single-digit percent of
HBM bandwidth (the same pathology the exact-search pipeline's
``rescore_buckets`` kernel replaced in round 2: a 4 GB gather cost +125 ms).
This kernel fetches each query's probed cell straight from HBM with
scalar-prefetch-indexed BlockSpecs and scores it on the MXU at full-depth
contraction — the gather rides the DMA engines at line rate.

Grid step = (QR queries, one probe slot): QR aliases of the flat cell
tensor each fetch one (L, D) cell block whose index comes from the
prefetched probe table. All QR rows are scored against every alias (Mosaic
cannot prove dynamic sublane alignment, so no dynamic row slicing — the
redundant MACs are a rounding error at IVF shapes) and only the owning row
lands in the output.

IVF's batch-size envelope (benchmarks/RESULTS.md): per-query DMA is
n_probe·L·D bytes, so IVF beats exact streaming only while
Q·n_probe·L ≪ N — the small-batch / low-latency serving regime. Large
batches should use the exact pipeline (one corpus stream serves ALL
queries).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _cell_score_kernel(probe_ref, q_ref, *cell_refs_and_out, qr: int):
    cell_refs, out_ref = cell_refs_and_out[:-1], cell_refs_and_out[-1]
    q = q_ref[:]                                   # (qr, D)
    L = out_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (qr, L), 0)
    acc = jnp.zeros((qr, L), jnp.float32)
    for j, c_ref in enumerate(cell_refs):
        s = jax.lax.dot_general(
            q, c_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # (qr, L)
        acc = jnp.where(rows == j, s, acc)
    out_ref[:] = acc


def ivf_cell_scores_fn(interpret: bool = False, qr: int = 8):
    """Build the jitted probed-cell scorer.

    → ``fn(queries (Q, D), cells (C, L, D), probe (Q, P)) → (Q, P·L)`` f32
    scores (query rows padded to a multiple of 8 internally; L — the cell
    budget — must be a multiple of 128, which IVFIndex's auto budget
    guarantees but a hand-set ``cell_budget`` may not — those indexes fall
    back to the XLA path under backend="auto"). Scores are raw dot
    products in the cell dtype; the caller masks padded slots via its fill
    counts and resolves doc ids."""

    @jax.jit
    def fn(queries, cells, probe):
        C, L, D = cells.shape
        if L % 128 != 0:
            raise ValueError(f"cell budget L must be a multiple of 128, "
                             f"got {L}")
        Q = queries.shape[0]
        P = probe.shape[1]
        # tile cells into <=1024-row blocks: Mosaic's compiler crashes on
        # dynamically-indexed blocks past ~1024 sublanes (L=1024 compiles,
        # L=2048 aborts — measured); the largest <=8x128 divisor keeps DMA
        # block counts minimal
        m = L // 128
        d = max(dd for dd in range(1, 9) if m % dd == 0)
        LT = d * 128
        n_t = L // LT
        cells_flat = cells.reshape(C * L, D)  # free inside jit
        q_pad = ((Q + qr - 1) // qr) * qr
        if q_pad != Q:
            queries = jnp.pad(queries, ((0, q_pad - Q), (0, 0)))
            probe = jnp.pad(probe, ((0, q_pad - Q), (0, 0)))
        queries = queries.astype(cells.dtype)
        # prefetched (P, Q) layout keeps the SMEM footprint tiny
        probe_t = probe.T.astype(jnp.int32)

        cell_spec = [
            pl.BlockSpec(
                (LT, D),
                (lambda g, p, t, ids, j=j:
                 (ids[p, g * qr + j] * n_t + t, 0)),
                memory_space=pltpu.VMEM)
            for j in range(qr)
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(q_pad // qr, P, n_t),
            in_specs=[
                pl.BlockSpec((qr, D), lambda g, p, t, ids: (g, 0),
                             memory_space=pltpu.VMEM),
                *cell_spec,
            ],
            out_specs=pl.BlockSpec(
                (qr, LT), lambda g, p, t, ids: (g, p * n_t + t),
                memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            functools.partial(_cell_score_kernel, qr=qr),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((q_pad, P * L), jnp.float32),
            interpret=interpret,
        )(probe_t, queries, *([cells_flat] * qr))
        return out[:Q]

    return fn
