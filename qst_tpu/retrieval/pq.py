"""Product-quantization (PQ) index — beyond-reference capability.

The exact index stores the corpus at 2 bytes/dim (bf16) and the int8 index
at 1 byte/dim; both cap the in-HBM corpus at single-digit millions of docs
per 16 GB chip at D=384. PQ stores each document as ``m`` one-byte codes
(one per D/m-dim subspace, 256 centroids each) — at the default m=48 that
is **16× smaller than bf16** (48 bytes/doc vs 768), putting ~100M docs
in one chip's HBM with approximate scores and an optional exact re-rank.

TPU-first formulation (no lookup-table gathers in the hot loop):

- **training** is ``m`` independent 256-way Lloyd k-means, vmapped over the
  subspace axis — every iteration is one batched MXU matmul;
- **encoding** is chunked batched matmul + argmax (assignment by the
  identity ``argmin ||x−c||² = argmax (x·c − ||c||²/2)``);
- **search decompresses, then matmuls**: per corpus tile, codes expand to
  bf16 reconstructions through a batched one-hot matmul
  ``(T, m, 256) @ (m, 256, ds)`` — contraction depth 256, MXU-native —
  followed by one ``(Q, D) × (D, T)`` scoring matmul. Decompression costs
  ``256/Q`` of the scoring FLOPs, so at serving batch sizes it is noise;
  the classic ADC lookup-table formulation would instead do ``256/ds`` =
  32× the scoring FLOPs (or per-element gathers, which TPUs hate).
  Queries stay full-precision (asymmetric distance computation).
- optional **exact re-rank** (``refine_factor``): the PQ scan returns
  ``k·refine_factor`` candidates, their original rows are fetched from a
  host-resident matrix and re-scored exactly in one device call — the
  standard quantize-then-rescore recipe, host RAM holding what HBM cannot.
- ``mesh=`` shards the code matrix over all mesh devices on the doc axis
  (same all-gather candidate merge as ``ExactIndex``/``IVFIndex``).

Scores follow the int8 index's contract: the corpus is stored
unit-normalized (cos ≡ dot), ``cos_sim`` / ``dot_score`` only.

Reference context: the reference's exact-search evaluator streams 50k-doc
chunks from host RAM (reference training/main.py:178-179, driven from
ir_evauation_script.py:107-131) and has no compressed-index capability at
all; PQ extends the rebuilt engine's corpus-scale envelope the TPU way —
HBM-resident codes scored on the MXU instead of host-streamed floats.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qst_tpu.core.meshes import DATA_AXIS, MODEL_AXIS
from qst_tpu.ops.distances import l2_normalize

K_CENTROIDS = 256  # one byte per code — fixed, like every classic PQ


def random_rotation(d: int, seed: int = 0) -> jax.Array:
    """Random orthogonal (d, d) matrix (QR of a Gaussian) — the cheap OPQ:
    rotating embeddings before subspace splitting spreads variance evenly
    across subspaces, which lowers per-subspace quantization error when the
    data's principal directions are axis-concentrated. One extra (Q, D)
    matmul per search; the corpus rotation folds into encoding."""
    g = jax.random.normal(jax.random.key(seed), (d, d), jnp.float32)
    q, r = jnp.linalg.qr(g)
    # fix QR's sign ambiguity so the rotation is deterministic
    return q * jnp.sign(jnp.diagonal(r))[None, :]


def _aniso_fit(xs: jax.Array, cb: jax.Array, eta: float) -> jax.Array:
    """Negated per-(point, centroid) assignment loss, batched over
    subspaces: classic −‖v−c‖² plus, for eta > 0, the score-aware
    penalty −eta·(vᵀ(v−c))² that weights reconstruction error ALONG the
    datapoint direction (the component that moves dot-product scores;
    the ScaNN anisotropic-loss idea applied per subspace, with each
    subvector's own magnitude as its weight). Both terms come from the
    same MXU dots. xs (m, S, ds) or (S, m, ds) with matching einsum —
    callers pass (m, S, ds)."""
    dots = jnp.einsum("msd,mkd->msk", xs, cb,
                      preferred_element_type=jnp.float32)   # v·c
    cc = jnp.sum(cb * cb, axis=-1)[:, None, :]              # ‖c‖²
    vv = jnp.sum(xs * xs, axis=-1)[:, :, None]              # ‖v‖²
    fit = dots - 0.5 * cc                                   # −½‖v−c‖² + const
    if eta > 0.0:
        # (vᵀ(v−c))² = (‖v‖² − v·c)²
        fit = fit - 0.5 * eta * (vv - dots) ** 2
    return fit


@functools.partial(jax.jit, static_argnames=("m", "n_iters", "eta"))
def pq_train(sample: jax.Array, key: jax.Array, m: int,
             n_iters: int = 12, eta: float = 0.0) -> jax.Array:
    """Train per-subspace codebooks on a (unit-normalized) sample.

    → (m, 256, ds) float32. Each subspace runs an independent 256-way
    Lloyd's k-means (the PQ objective: minimize per-subvector
    reconstruction MSE, which maximizes dot-product fidelity of the
    reconstruction). vmapped over subspaces: assignment is one batched
    (S, ds)×(ds, 256) matmul per iteration; update one (256, S)×(S, ds).
    Empty clusters keep their previous centroid (same policy as
    :func:`qst_tpu.retrieval.ivf.kmeans`).

    ``eta > 0`` trains SCORE-AWARE (anisotropic) codebooks: the
    assignment minimizes ‖v−c‖² + eta·(vᵀ(v−c))² and the centroid update
    solves the corresponding per-cluster weighted least squares
    ([n I + eta Σ v vᵀ] c = Σ v + eta Σ v ‖v‖², a (ds, ds) solve per
    (subspace, cluster)) — reconstruction error parallel to the
    datapoint, which is what shifts dot-product rankings, is penalized
    (1+eta)× relative to orthogonal error.
    """
    s, d = sample.shape
    ds = d // m
    x = l2_normalize(sample.astype(jnp.float32))
    xs = jnp.transpose(x.reshape(s, m, ds), (1, 0, 2))      # (m, S, ds)
    init_idx = jax.random.choice(key, s, (K_CENTROIDS,), replace=False)
    cb0 = xs[:, init_idx, :]                                # (m, 256, ds)

    def step(cb, _):
        assign = jnp.argmax(_aniso_fit(xs, cb, eta), axis=-1)   # (m, S)
        onehot = jax.nn.one_hot(assign, K_CENTROIDS, dtype=jnp.float32)
        sums = jnp.einsum("msk,msd->mkd", onehot, xs,
                          preferred_element_type=jnp.float32)
        counts = jnp.sum(onehot, axis=1)                    # (m, 256)
        if eta == 0.0:
            new = sums / jnp.maximum(counts[:, :, None], 1)
        else:
            # weighted LS per (subspace, cluster): A c = b with
            # A = n I + eta Σ v vᵀ, b = Σ v (1 + eta ‖v‖²)
            vv = jnp.sum(xs * xs, axis=-1)                  # (m, S)
            A = (jnp.einsum("msk,msd,mse->mkde", onehot, xs, xs,
                            preferred_element_type=jnp.float32) * eta
                 + counts[:, :, None, None]
                 * jnp.eye(ds, dtype=jnp.float32))
            b = sums + eta * jnp.einsum(
                "msk,ms,msd->mkd", onehot, vv, xs,
                preferred_element_type=jnp.float32)
            # regularize empty/degenerate clusters; keep previous centroid
            A = A + 1e-6 * jnp.eye(ds, dtype=jnp.float32)
            new = jnp.linalg.solve(A, b[..., None])[..., 0]
        return jnp.where(counts[:, :, None] > 0, new, cb), None

    cb, _ = jax.lax.scan(step, cb0, None, length=n_iters)
    return cb


@functools.partial(jax.jit, static_argnames=("eta",))
def pq_encode(chunk: jax.Array, codebooks: jax.Array,
              eta: float = 0.0) -> jax.Array:
    """Encode one corpus chunk → (B, m) uint8 codes.

    The chunk is unit-normalized first (the index's storage contract);
    assignment is one batched MXU matmul + argmax per subspace. ``eta``
    must match the training objective (see :func:`pq_train`).
    """
    m, _, ds = codebooks.shape
    x = l2_normalize(chunk.astype(jnp.float32))
    xs = jnp.transpose(x.reshape(x.shape[0], m, ds), (1, 0, 2))
    fit = _aniso_fit(xs, codebooks, eta)                    # (m, B, K)
    return jnp.argmax(fit, axis=-1).T.astype(jnp.uint8)


def _compute_dtype() -> jnp.dtype:
    """bf16 on TPU (MXU-native decode + scoring); f32 on CPU — the CPU
    thunk runtime rejects BATCHED bf16×bf16→f32 dots (plain dots work),
    and the CPU mesh is the test substrate, not a performance target."""
    return jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16


def _decode_onehot(codes: jax.Array, cb: jax.Array) -> jax.Array:
    """(T, m) uint8 → (T, m, ds) reconstructions via batched one-hot
    matmul — contraction depth 256, runs on the MXU; the one-hot transient
    is (T, m, 256), which bounds the tile size (see PQ_TILE)."""
    oh = jax.nn.one_hot(codes, K_CENTROIDS, dtype=cb.dtype)
    return jnp.einsum("tmk,mkd->tmd", oh, cb,
                      preferred_element_type=jnp.float32).astype(cb.dtype)


def _decode_gather(codes: jax.Array, cb: jax.Array) -> jax.Array:
    """Same decode through per-subspace table gathers — the A/B twin for
    measuring XLA's dynamic-gather lowering against the one-hot matmul."""
    take = jax.vmap(lambda t, c: jnp.take(t, c, axis=0),
                    in_axes=(0, 1), out_axes=1)
    return take(cb, codes.astype(jnp.int32))


_DECODERS = {"onehot": _decode_onehot, "gather": _decode_gather}

# Two-level tiling (measured on one v5e, 1M×384 m=48 Q=4096):
# - PQ_TILE (4096) bounds the DECODE transient — the one-hot expansion is
#   4096·48·256·2 B ≈ 100 MB per sub-chunk;
# - PQ_SCORE_TILE (65536) sets the SCORING+SELECTION granularity — a
#   per-4096-tile top-k merge pays a wide ``lax.top_k`` every tile (256
#   merges over 1M docs ≈ 400 ms, 2.8× the whole exact search), while a
#   65536-wide tile goes through the 128-bucket-maxima selection path and
#   merges only 16 times.
PQ_TILE = 4096
PQ_SCORE_TILE = 65536


def pq_pad_quantum(n: int) -> int:
    """Row-padding quantum for a code matrix of n real rows (see tiling
    constants above): full score tiles once the corpus is big enough to
    fill one, a single decode chunk otherwise."""
    return PQ_SCORE_TILE if n > PQ_SCORE_TILE else PQ_TILE


@functools.partial(jax.jit, static_argnames=("k", "decode"))
def pq_topk(queries: jax.Array, codes: jax.Array, codebooks: jax.Array,
            n_real: jax.Array, k: int, decode: str = "onehot",
            base: int | jax.Array = 0) -> Tuple[jax.Array, jax.Array]:
    """Scan the code matrix in PQ_SCORE_TILE tiles — per tile: decode the
    sub-chunks (inner ``lax.map`` bounds the one-hot transient to PQ_TILE
    rows), one (Q, D)×(D, tile) scoring matmul, bucket-maxima top-k, merge
    into the running carry. ``codes`` must be row-padded per
    :func:`pq_pad_quantum`; rows at position ≥ n_real are masked. ``base``
    offsets the returned indices (sharded callers pass their shard's first
    global row).

    → (scores (Q, k) f32, indices (Q, k) int32 global positions).
    """
    from qst_tpu.retrieval.index import _local_topk

    Q = queries.shape[0]
    n_pad, m = codes.shape
    ST = PQ_SCORE_TILE if n_pad % PQ_SCORE_TILE == 0 else n_pad
    DC = min(PQ_TILE, ST)
    cd = _compute_dtype()
    cb = codebooks.astype(cd)
    q = l2_normalize(queries.astype(jnp.float32)).astype(cd)
    tiles = codes.reshape(n_pad // ST, ST, m)
    kk = min(k, ST)

    def decode_tile(tile_codes):
        sub = tile_codes.reshape(ST // DC, DC, m)
        recon = jax.lax.map(
            lambda c: _DECODERS[decode](c, cb).reshape(DC, -1), sub)
        return recon.reshape(ST, -1)

    def body(carry, inputs):
        cs, ci = carry
        tile_codes, tile_idx = inputs
        recon = decode_tile(tile_codes)
        s = jax.lax.dot_general(q, recon, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # mask is on LOCAL rows: n_real counts this code matrix's real rows
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + tile_idx * ST
        s = jnp.where(col < n_real[0], s, -jnp.inf)
        s1, p1 = _local_topk(s, kk)
        i1 = p1 + tile_idx * ST
        s2, pos = jax.lax.top_k(jnp.concatenate([cs, s1], axis=1), kk)
        i2 = jnp.take_along_axis(jnp.concatenate([ci, i1], axis=1), pos,
                                 axis=1)
        return (s2, i2), None

    if n_pad // ST == 1:
        # single tile: no scan, no carry merge
        s1, i1 = body((jnp.full((Q, kk), -jnp.inf, jnp.float32),
                       jnp.full((Q, kk), -1, jnp.int32)),
                      (tiles[0], jnp.int32(0)))[0]
        cs, ci = s1, i1
    else:
        init = (jnp.full((Q, kk), -jnp.inf, jnp.float32),
                jnp.full((Q, kk), -1, jnp.int32))
        (cs, ci), _ = jax.lax.scan(
            body, init, (tiles, jnp.arange(n_pad // ST, dtype=jnp.int32)))
    ci = jnp.where(ci >= 0, ci + base, ci)
    if kk < k:   # tiny corpus: top up to k with -inf rows
        pad = k - kk
        cs = jnp.pad(cs, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        ci = jnp.pad(ci, ((0, 0), (0, pad)), constant_values=-1)
    return cs, ci


@functools.partial(jax.jit, static_argnames=("k", "decode", "interpret"))
def _pq_super_tile_topk(queries, codes_slice, codebooks, n_local, base,
                        k: int, decode: str, interpret: bool):
    """One super-tile of the fused-path PQ search: decode the slice to a
    bf16 reconstruction (inner lax.map bounds the one-hot transient to
    PQ_TILE rows), then run the fused Pallas exact pipeline over it
    (bucket-maxima kernel + hierarchical selection + dynamic-DMA rescore —
    the scores never visit HBM, unlike the XLA scan's (Q, tile) blocks).
    → (scores (Q, k), GLOBAL ids (Q, k))."""
    from qst_tpu.ops.topk_pallas import pallas_topk_local

    rows, m = codes_slice.shape
    cd = _compute_dtype()
    cb = codebooks.astype(cd)
    q = l2_normalize(queries.astype(jnp.float32)).astype(cd)
    DC = min(PQ_TILE, rows)
    sub = codes_slice.reshape(rows // DC, DC, m)
    recon = jax.lax.map(
        lambda c: _DECODERS[decode](c, cb).reshape(DC, -1), sub)
    recon = recon.reshape(rows, -1)
    s, i = pallas_topk_local(q, recon, k, n_local, interpret=interpret)
    return s, jnp.where(i >= 0, i + base, i)


@functools.partial(jax.jit, static_argnames=("k",))
def _merge_topk(cs, ci, s, i, k: int):
    s2, pos = jax.lax.top_k(jnp.concatenate([cs, s], axis=1), k)
    return s2, jnp.take_along_axis(jnp.concatenate([ci, i], axis=1), pos,
                                   axis=1)


# fused-path super-tile: 2M rows decode to a 1.5 GB bf16 reconstruction
# transient at D=384 — two may be in flight under async dispatch
PQ_SUPER_TILE = 1 << 21


def _sharded_pq_search_fn(mesh: Mesh, k: int, shard_rows: int, decode: str,
                          pallas: bool = False, interpret: bool = False):
    """shard_map search over a doc-sharded code matrix: replicated queries,
    per-shard PQ search, all-gather candidate merge (identical results to
    the single-device paths — same pattern as ``index._sharded_search_fn``).

    ``pallas=True`` runs the FUSED path per shard (decode super-tiles →
    ``pallas_topk_local`` → exact in-shard merge) instead of the XLA scan —
    the same one-fused-path-from-1-chip-to-a-pod-slice story as the exact
    index; ``interpret`` runs the kernels interpreted (CPU-mesh tests)."""
    axes = (DATA_AXIS, MODEL_AXIS)

    def body(q, codes_shard, codebooks, n_real):
        from qst_tpu.core.meshes import flat_shard_index

        base = flat_shard_index(axes) * shard_rows
        n_local = jnp.clip(n_real - base, 0, shard_rows)
        if pallas:
            Q = q.shape[0]
            cs = jnp.full((Q, k), -jnp.inf, jnp.float32)
            ci = jnp.full((Q, k), -1, jnp.int32)
            for lo in range(0, shard_rows, PQ_SUPER_TILE):
                hi = min(lo + PQ_SUPER_TILE, shard_rows)
                tile_n = jnp.clip(n_local - lo, 0, hi - lo)
                s, i = _pq_super_tile_topk(
                    q, jax.lax.slice_in_dim(codes_shard, lo, hi),
                    codebooks, tile_n, base + lo, k, decode, interpret)
                cs, ci = _merge_topk(cs, ci, s, i, k)
            s1, i1 = cs, ci
        else:
            s1, i1 = pq_topk(q, codes_shard, codebooks, n_local, k,
                             decode=decode, base=base)
        all_s = jax.lax.all_gather(s1, axes, axis=1, tiled=True)
        all_i = jax.lax.all_gather(i1, axes, axis=1, tiled=True)
        s2, pos = jax.lax.top_k(all_s, k)
        i2 = jnp.take_along_axis(all_i, pos, axis=1)
        return s2, i2

    return jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P((DATA_AXIS, MODEL_AXIS)), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )


# Exact-refine placement: the candidate pool is tiny (k*refine_factor
# rows/query), so the re-rank is ~10-100 MFLOP — host BLAS does it in
# milliseconds WITHOUT uploading the gathered rows back to the device.
# On-host is the default: the upload otherwise rides the host<->device
# link and serializes against the next batches' query dispatches
# (measured on the dev relay at 100M docs: +156 ms per 256-query call,
# vs ~20 ms host rescore). Set False to route through the device einsum
# (:func:`_refine_rescore`) — e.g. when host cores are the scarce
# resource.
REFINE_ON_HOST = True


def _refine_rescore_host(queries, cand_rows: np.ndarray,
                         cand_idx: np.ndarray, k: int, inv_scale: float
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-BLAS exact re-rank: same contract as :func:`_refine_rescore`
    (scores desc, -1-masked candidates excluded), numpy in/out."""
    q = np.asarray(queries, np.float32)
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    cand = np.asarray(cand_rows, np.float32)
    if inv_scale != 1.0:
        cand *= np.float32(inv_scale)
    s = np.matmul(cand, q[:, :, None]).squeeze(-1)       # (Q, K')
    s[cand_idx < 0] = -np.inf
    k = min(k, s.shape[1])
    if k < s.shape[1]:
        part = np.argpartition(-s, k - 1, axis=1)[:, :k]
    else:
        part = np.broadcast_to(np.arange(k), s.shape[:1] + (k,))
    ps = np.take_along_axis(s, part, axis=1)
    order = np.argsort(-ps, axis=1, kind="stable")
    pos = np.take_along_axis(part, order, axis=1)
    return (np.take_along_axis(s, pos, axis=1),
            np.take_along_axis(cand_idx, pos, axis=1))


def refine_pair(queries, rows_table, idx: np.ndarray, k: int,
                scale: float, n_docs: int
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Gather candidate rows from the host refine table and exact-re-rank:
    the one refine entry point every index family and the Retriever route
    through. Host BLAS by default (:data:`REFINE_ON_HOST`), device einsum
    otherwise."""
    cand = rows_table[np.clip(idx, 0, n_docs - 1)]
    k = min(k, idx.shape[1])
    if REFINE_ON_HOST:
        return _refine_rescore_host(queries, cand, idx, k, 1.0 / scale)
    from qst_tpu.retrieval.index import fetch_pair

    return fetch_pair(*_refine_rescore(
        jnp.asarray(queries, jnp.float32), jnp.asarray(cand),
        jnp.asarray(idx), k, jnp.float32(1.0 / scale)))


@functools.partial(jax.jit, static_argnames=("k",))
def _refine_rescore(queries: jax.Array, cand_rows: jax.Array,
                    cand_idx: jax.Array, k: int,
                    inv_scale: jax.Array
                    ) -> Tuple[jax.Array, jax.Array]:
    """Exact re-rank of gathered candidate rows: one einsum over the
    (Q, K', D) candidate tensor, masked where the PQ scan returned -1.
    ``inv_scale`` de-quantizes int8 refine rows (1.0 for float rows)."""
    q = l2_normalize(queries.astype(jnp.float32))
    s = jnp.einsum("qd,qkd->qk", q,
                   cand_rows.astype(jnp.float32) * inv_scale,
                   preferred_element_type=jnp.float32)
    s = jnp.where(cand_idx >= 0, s, -jnp.inf)
    s2, pos = jax.lax.top_k(s, k)
    i2 = jnp.take_along_axis(cand_idx, pos, axis=1)
    return s2, i2


class PQIndex:
    """Product-quantized cosine index: m bytes/doc, optional exact re-rank.

    ``embeddings`` may be a host numpy array (possibly memmapped) or a
    device array; encoding streams it through the device in chunks. With
    ``keep_rows=True`` the unit-normalized originals are retained on HOST
    RAM (bf16) for ``refine_factor`` re-ranking — HBM holds only codes.

    ``mesh`` shards the code matrix over all mesh devices on the doc axis.
    """

    def __init__(self, embeddings, m: int = 48, ids: Optional[list] = None,
                 n_iters: int = 12, train_sample: int = 131072,
                 seed: int = 0, mesh: Optional[Mesh] = None,
                 keep_rows=False, encode_chunk: int = 1 << 16,
                 codebooks: Optional[jax.Array] = None,
                 rotate: bool = False,
                 rotation: Optional[jax.Array] = None,
                 anisotropic: float = 0.0):
        # encode_chunk bounds pq_encode's (B, m, 256) f32 fit transient
        # (~3.2 GB at the default 65536 rows, m=48)
        # rotate=True (the cheap OPQ, see random_rotation) quantizes in a
        # rotated basis; refine rows and refined scores stay in the
        # ORIGINAL basis (rotation is orthogonal, cosines are unchanged)
        # anisotropic=eta > 0 trains/encodes with the score-aware loss
        # (see pq_train) — reconstruction error along the datapoint is
        # penalized (1+eta)x, trading MSE for dot-product ranking recall
        emb = embeddings if isinstance(embeddings, jax.Array) \
            else np.asarray(embeddings)
        n, d = emb.shape
        if n == 0:
            raise ValueError("empty corpus")
        if d % m != 0:
            raise ValueError(f"dim {d} not divisible by m={m}")
        if m % 8 != 0:
            # the (m·ds = D) reshape is layout-free only when both factors
            # tile the VPU lanes; keep m a sublane multiple
            raise ValueError(f"m must be a multiple of 8, got {m}")
        self.m, self.dim, self.n_docs = m, d, n
        if anisotropic < 0:
            raise ValueError(f"anisotropic must be >= 0, got {anisotropic}")
        self._eta = float(anisotropic)
        self.ids = list(ids) if ids is not None else list(range(n))
        if len(self.ids) != n:
            raise ValueError("ids length mismatch")

        self._rotation = None
        if rotation is not None:
            self._rotation = jnp.asarray(rotation, jnp.float32)
            if self._rotation.shape != (d, d):
                raise ValueError(
                    f"rotation shape {self._rotation.shape} != {(d, d)}")
        elif rotate:
            self._rotation = random_rotation(d, seed)

        key = jax.random.key(seed)
        if codebooks is not None:
            self.codebooks = jnp.asarray(codebooks, jnp.float32)
            if self.codebooks.shape != (m, K_CENTROIDS, d // m):
                raise ValueError(
                    f"codebooks shape {self.codebooks.shape} != "
                    f"{(m, K_CENTROIDS, d // m)}")
        else:
            if n < K_CENTROIDS:
                raise ValueError(
                    f"need ≥{K_CENTROIDS} docs to train codebooks (got {n}); "
                    "pass codebooks= to reuse pre-trained ones")
            if n > train_sample:
                sk, key = jax.random.split(key)
                idx = np.sort(np.asarray(jax.random.choice(
                    sk, n, (train_sample,), replace=False)))
                sample = jnp.asarray(np.asarray(emb[idx], np.float32)) \
                    if not isinstance(emb, jax.Array) else jnp.asarray(emb[idx])
            else:
                sample = jnp.asarray(emb)
            if self._rotation is not None:
                sample = jnp.asarray(sample, jnp.float32) @ self._rotation
            self.codebooks = pq_train(sample, key, m, n_iters,
                                      eta=self._eta)

        # chunked encode with a 2-deep pipeline (same overlap pattern as the
        # IVF assignment loop): only the (N, m) uint8 code table accumulates
        quantum = pq_pad_quantum(n)
        n_pad = ((n + quantum - 1) // quantum) * quantum
        host_codes = np.zeros((n_pad, m), np.uint8)
        # keep_rows: True/"bfloat16" retains the unit-normalized originals
        # in host RAM at 2 B/dim; "int8" at 1 B/dim under the fixed scale
        # 127 (valid: unit rows have |component| <= 1), halving both host
        # RAM and the per-search candidate upload at int8-level score noise
        if keep_rows not in (False, True, "bfloat16", "int8"):
            raise ValueError(
                f"keep_rows must be bool | 'bfloat16' | 'int8', "
                f"got {keep_rows!r}")
        self._refine_rows: Optional[np.ndarray] = None
        self._refine_scale = 1.0
        if keep_rows == "int8":
            self._refine_rows = np.empty((n, d), np.int8)
            self._refine_scale = 127.0
        elif keep_rows:
            self._refine_rows = np.empty((n, d), jnp.bfloat16)
        pending: List[Tuple[int, int, jax.Array, Optional[jax.Array]]] = []

        def drain(slot):
            lo, hi, dev, rows = slot
            host_codes[lo:hi] = np.asarray(dev)
            if rows is not None:
                self._refine_rows[lo:hi] = np.asarray(rows)

        for lo in range(0, n, encode_chunk):
            hi = min(lo + encode_chunk, n)
            chunk = jnp.asarray(emb[lo:hi])
            enc_in = chunk if self._rotation is None \
                else chunk.astype(jnp.float32) @ self._rotation
            codes_dev = pq_encode(enc_in, self.codebooks, eta=self._eta)
            rows_dev = None
            if keep_rows == "int8":
                norm = l2_normalize(chunk.astype(jnp.float32))
                rows_dev = jnp.clip(jnp.round(norm * 127.0),
                                    -127, 127).astype(jnp.int8)
            elif keep_rows:
                rows_dev = l2_normalize(
                    chunk.astype(jnp.float32)).astype(jnp.bfloat16)
            pending.append((lo, hi, codes_dev, rows_dev))
            if len(pending) >= 2:
                drain(pending.pop(0))
        for slot in pending:
            drain(slot)

        self._install_codes(host_codes, mesh)

    def _install_codes(self, host_codes: np.ndarray,
                       mesh: Optional[Mesh]) -> None:
        """Place the (PQ_TILE-padded) code matrix on device, doc-sharded
        over the mesh when given."""
        self.mesh = mesh
        self._search_fns = {}
        n_pad = host_codes.shape[0]
        if mesh is not None and int(np.prod(list(mesh.shape.values()))) > 1:
            n_dev = int(np.prod(list(mesh.shape.values())))
            raw = -(-n_pad // n_dev)
            q = pq_pad_quantum(raw)
            self.shard_rows = ((raw + q - 1) // q) * q
            full = self.shard_rows * n_dev
            if full != n_pad:
                host_codes = np.pad(host_codes,
                                    ((0, full - n_pad), (0, 0)))
            sharding = NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS)))
            self.codes = jax.device_put(host_codes, sharding)
        else:
            self.mesh = None
            self.codes = jnp.asarray(host_codes)

    @classmethod
    def from_chunks(cls, chunks, m: int = 48, ids: Optional[list] = None,
                    mesh: Optional[Mesh] = None, n_iters: int = 12,
                    train_sample: int = 131072, seed: int = 0,
                    rotate: bool = False,
                    anisotropic: float = 0.0) -> "PQIndex":
        """Build from an ITERABLE of (B, D) host chunks — the corpus never
        needs to exist as one array, so the in-HBM code capacity (~m bytes
        per doc) is reachable even when the full f32 corpus would not fit
        host RAM. Chunks are buffered only until ``train_sample`` rows are
        seen (codebook training needs a sample up front); everything after
        that point streams straight through ``pq_encode``. No refine rows
        (there is nowhere to keep them — persist the corpus to disk and
        use ``from_codes(refine_rows=np.memmap(...))`` for that)."""
        it = iter(chunks)
        buffered: List[np.ndarray] = []
        buffered_rows = 0
        for chunk in it:
            buffered.append(np.asarray(chunk, np.float32))
            buffered_rows += buffered[-1].shape[0]
            if buffered_rows >= train_sample:
                break
        if buffered_rows < K_CENTROIDS:
            raise ValueError(
                f"need ≥{K_CENTROIDS} docs to train codebooks "
                f"(got {buffered_rows})")
        sample = np.concatenate(buffered)[:train_sample]
        d = sample.shape[1]
        if d % m != 0:
            raise ValueError(f"dim {d} not divisible by m={m}")
        if m % 8 != 0:
            raise ValueError(f"m must be a multiple of 8, got {m}")
        rot = random_rotation(d, seed) if rotate else None
        train_in = jnp.asarray(sample) if rot is None \
            else jnp.asarray(sample) @ rot
        codebooks = pq_train(train_in, jax.random.key(seed), m, n_iters,
                             eta=anisotropic)

        code_parts: List[np.ndarray] = []
        pending: List[jax.Array] = []
        import itertools

        for chunk in itertools.chain(buffered, it):
            x = jnp.asarray(chunk, jnp.float32)
            if rot is not None:
                x = x @ rot
            pending.append(pq_encode(x, codebooks, eta=anisotropic))
            if len(pending) >= 2:     # 2-deep overlap, as in __init__
                code_parts.append(np.asarray(pending.pop(0)))
        code_parts.extend(np.asarray(p) for p in pending)
        host_codes = np.concatenate(code_parts)
        n = host_codes.shape[0]

        self = cls.__new__(cls)
        self.m, self.dim, self.n_docs = m, d, n
        self.codebooks = codebooks
        self._rotation = rot
        self._eta = float(anisotropic)
        self.ids = list(ids) if ids is not None else list(range(n))
        if len(self.ids) != n:
            raise ValueError("ids length mismatch")
        self._refine_rows = None
        self._refine_scale = 1.0
        quantum = pq_pad_quantum(n)
        n_pad = ((n + quantum - 1) // quantum) * quantum
        if n_pad != n:
            host_codes = np.pad(host_codes, ((0, n_pad - n), (0, 0)))
        self._install_codes(host_codes, mesh)
        return self

    @classmethod
    def from_codes(cls, codes, codebooks, ids: Optional[list] = None,
                   mesh: Optional[Mesh] = None,
                   refine_rows: Optional[np.ndarray] = None,
                   rotation: Optional[jax.Array] = None) -> "PQIndex":
        """Rebuild an index from persisted artifacts — no retraining or
        re-encoding (the Retriever reload path). ``refine_rows``, when
        given, are the unit-normalized original vectors (host-resident,
        any float dtype; stored bf16). A DEVICE ``codes`` array (uint8) is
        adopted in place for single-device indexes — at 100M-doc scale the
        host round-trip through a slow relay would dominate the build."""
        adopt_device = (isinstance(codes, jax.Array)
                        and codes.dtype == jnp.uint8
                        and (mesh is None
                             or int(np.prod(list(mesh.shape.values()))) == 1))
        if not adopt_device:
            codes = np.asarray(codes, np.uint8)
        self = cls.__new__(cls)
        n, m = codes.shape
        cb = jnp.asarray(codebooks, jnp.float32)
        if cb.ndim != 3 or cb.shape[0] != m or cb.shape[1] != K_CENTROIDS:
            raise ValueError(f"codebooks shape {cb.shape} does not match "
                             f"codes with m={m}")
        self.m, self.dim, self.n_docs = m, m * cb.shape[2], n
        self.codebooks = cb
        self._eta = 0.0   # search is eta-free; matters only for re-encoding
        self._rotation = None
        if rotation is not None:
            self._rotation = jnp.asarray(rotation, jnp.float32)
            if self._rotation.shape != (self.dim, self.dim):
                raise ValueError(
                    f"rotation shape {self._rotation.shape} != "
                    f"{(self.dim, self.dim)}")
        self.ids = list(ids) if ids is not None else list(range(n))
        if len(self.ids) != n:
            raise ValueError("ids length mismatch")
        self._refine_rows = None
        self._refine_scale = 1.0
        if refine_rows is not None:
            rows = np.asarray(refine_rows)
            if rows.shape != (n, self.dim):
                raise ValueError(
                    f"refine_rows shape {rows.shape} != {(n, self.dim)}")
            if rows.dtype == np.int8:    # scale-127 scheme (see __init__)
                self._refine_rows = rows
                self._refine_scale = 127.0
            else:
                self._refine_rows = rows.astype(jnp.bfloat16) \
                    if rows.dtype != jnp.bfloat16 else rows
        quantum = pq_pad_quantum(n)
        n_pad = ((n + quantum - 1) // quantum) * quantum
        if adopt_device:
            self.mesh = None
            self._search_fns = {}
            self.codes = jnp.pad(codes, ((0, n_pad - n), (0, 0))) \
                if n_pad != n else codes
            return self
        if n_pad != n:
            codes = np.pad(codes, ((0, n_pad - n), (0, 0)))
        self._install_codes(codes, mesh)
        return self

    @property
    def bytes_per_doc(self) -> int:
        return self.m

    def refine_rows_f32(self) -> Optional[np.ndarray]:
        """→ the refine rows as float32 unit vectors (de-quantized for
        int8 storage) — the to_updatable / export surface."""
        if self._refine_rows is None:
            return None
        rows = np.asarray(self._refine_rows, np.float32)
        if self._refine_scale != 1.0:
            rows = rows / np.float32(self._refine_scale)
        return rows

    def reconstruction_mse(self, sample) -> float:
        """Mean squared reconstruction error of a sample — the PQ training
        objective; tests assert it drops as m grows."""
        x = l2_normalize(jnp.asarray(sample, jnp.float32))
        if self._rotation is not None:
            x = x @ self._rotation
        codes = pq_encode(x, self.codebooks, eta=self._eta)
        recon = _decode_onehot(codes, self.codebooks.astype(_compute_dtype()))
        recon = recon.reshape(x.shape[0], -1).astype(jnp.float32)
        return float(jnp.mean((x - recon) ** 2))

    def _device_search(self, queries, k: int, score: str = "cos_sim",
                       tile: int = 0, backend: str = "auto",
                       decode: str = "onehot"
                       ) -> Tuple[jax.Array, jax.Array]:
        """Same positional contract as ``ExactIndex._device_search`` so the
        Retriever's streaming path drives either index; ``tile``/``backend``
        are accepted for compatibility (PQ always scans PQ_TILE tiles)."""
        if score not in ("cos_sim", "dot_score"):
            raise ValueError("PQ index supports cos_sim/dot_score only "
                             "(rows are normalized at encode time)")
        if decode not in _DECODERS:
            raise ValueError(f"unknown decode {decode!r}; "
                             f"choices: {sorted(_DECODERS)}")
        if backend not in ("auto", "pallas", "xla"):
            raise ValueError(f"unknown backend {backend!r}")
        k = min(k, self.n_docs)
        q = jnp.asarray(queries, jnp.float32)
        if self._rotation is not None:
            # rotation is orthogonal: normalize-then-rotate == rotate-then-
            # normalize, so pq_topk's internal normalization stays correct
            q = q @ self._rotation
        n_real = jnp.full((1,), self.n_docs, jnp.int32)
        use_pallas = (backend == "pallas"
                      or (backend == "auto"
                          and self._pallas_eligible(k, q.shape[0])))
        if use_pallas and self.mesh is None:
            return self._pallas_search(q, k, decode)
        if self.mesh is not None:
            interpret = jax.default_backend() == "cpu"
            key = (k, decode, use_pallas, interpret)
            if key not in self._search_fns:
                self._search_fns[key] = _sharded_pq_search_fn(
                    self.mesh, k, self.shard_rows, decode,
                    pallas=use_pallas, interpret=interpret)
            return self._search_fns[key](q, self.codes, self.codebooks,
                                         n_real)
        return pq_topk(q, self.codes, self.codebooks, n_real, k,
                       decode=decode)

    PALLAS_MIN_DOCS = 65536        # below this the XLA scan wins
    PALLAS_MIN_SHARD_DOCS = 16384  # per-shard threshold (as ExactIndex)
    PALLAS_MIN_QUERIES = 256       # the fused kernels pad queries to 512
    # rows internally, so a small batch pays the full 512-query decode +
    # score; the XLA scan's cost scales with Q and wins below this
    # (measured at the serving shape: mean-18-query batches ran 206 req/s
    # fused vs 310 on the scan)

    def _pallas_eligible(self, k: int, n_queries: int) -> bool:
        if self.mesh is None:
            big_enough = self.n_docs >= self.PALLAS_MIN_DOCS
        else:
            big_enough = self.shard_rows >= self.PALLAS_MIN_SHARD_DOCS
        return (k <= 128 and big_enough
                and n_queries >= self.PALLAS_MIN_QUERIES
                and jax.default_backend() != "cpu")

    QUERY_QUANTUM = 512   # pad the query batch so every serving-bucket
    # batch size shares ONE compiled fused pipeline: the kernels pad
    # queries to 512 rows internally anyway, but each distinct pre-pad Q
    # produces a distinct XLA module whose embedded Mosaic kernels
    # recompile (~40 s each) — under the server's power-of-two batch
    # bucketing that meant 6 batch shapes × k buckets of warmup compiles

    def _pallas_search(self, q, k: int, decode: str):
        """Fused-path search: decode PQ_SUPER_TILE-row slices to bf16 on
        device and run the fused Pallas exact pipeline per slice, merging
        the (Q, k) winners exactly across slices (all dispatches async —
        slice N+1's decode overlaps slice N's selection)."""
        interpret = jax.default_backend() == "cpu"
        n_pad = self.codes.shape[0]
        Q = q.shape[0]
        qq = ((Q + self.QUERY_QUANTUM - 1)
              // self.QUERY_QUANTUM) * self.QUERY_QUANTUM
        if qq != Q:
            q = jnp.pad(q, ((0, qq - Q), (0, 0)))
        cs = jnp.full((qq, k), -jnp.inf, jnp.float32)
        ci = jnp.full((qq, k), -1, jnp.int32)
        for lo in range(0, n_pad, PQ_SUPER_TILE):
            hi = min(lo + PQ_SUPER_TILE, n_pad)
            n_local = jnp.clip(jnp.int32(self.n_docs) - lo, 0, hi - lo)
            s, i = _pq_super_tile_topk(
                q, jax.lax.slice_in_dim(self.codes, lo, hi),
                self.codebooks, n_local, jnp.int32(lo), k, decode,
                interpret)
            cs, ci = _merge_topk(cs, ci, s, i, k)
        return cs[:Q], ci[:Q]

    DEFAULT_REFINE = 8

    def search(self, queries, k: int = 10,
               refine_factor: Optional[int] = None,
               decode: str = "onehot", score: str = "cos_sim",
               backend: str = "auto") -> Tuple[np.ndarray, np.ndarray]:
        """→ (scores (Q, k), indices (Q, k)). ``refine_factor=r`` re-ranks
        the top r·k PQ candidates exactly from the host-resident originals
        (requires ``keep_rows=True``); scores are then exact cosines.
        Default (None): DEFAULT_REFINE when refine rows exist, else the
        raw PQ scores; pass 0 to force PQ-only. ``score`` accepts
        cos_sim/dot_score (identical here: the stored rows are
        unit-normalized, matching the int8 index's contract)."""
        from qst_tpu.retrieval.index import fetch_pair

        if refine_factor is None:
            refine_factor = (self.DEFAULT_REFINE
                             if self._refine_rows is not None else 0)
        if refine_factor:
            if self._refine_rows is None:
                raise ValueError(
                    "refine_factor needs keep_rows=True at build time")
            kk = min(k * refine_factor, self.n_docs)
            s, i = self._device_search(queries, kk, score, decode=decode,
                                       backend=backend)
            return refine_pair(queries, self._refine_rows, np.asarray(i),
                               min(k, self.n_docs), self._refine_scale,
                               self.n_docs)
        return fetch_pair(*self._device_search(queries, k, score,
                                               decode=decode,
                                               backend=backend))

    def search_ids(self, queries, k: int = 10,
                   refine_factor: Optional[int] = None,
                   score: str = "cos_sim"):
        s, i = self.search(queries, k, refine_factor, score=score)
        ids = [[self.ids[j] if j >= 0 else None for j in row] for row in i]
        return s, ids

    def search_stream(self, query_batches, k: int = 10, depth: int = 4,
                      decode: str = "onehot",
                      refine_factor: Optional[int] = None):
        """Pipelined serving loop (same dispatch pattern as
        ``ExactIndex.search_stream``). ``refine_factor`` (default: 0 —
        PQ-only scores; the throughput path) re-ranks each popped batch
        exactly from the host-resident rows: the candidate gather +
        rescore of batch N runs while batches N+1..N+depth−1 compute on
        device, so the pipeline overlap survives refinement (the gather
        rides the host link — budget for it on slow links)."""
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        refine = refine_factor or 0
        if refine and self._refine_rows is None:
            raise ValueError(
                "refine_factor needs keep_rows=True at build time")
        from qst_tpu.retrieval.index import _pack_pair, _unpack_host

        def finish(queries, packed):
            s, i = _unpack_host(np.asarray(packed))
            if not refine:
                return s, i
            return refine_pair(queries, self._refine_rows, i,
                               min(k, self.n_docs), self._refine_scale,
                               self.n_docs)

        kk = min(k * refine, self.n_docs) if refine else k
        pending: list = []
        for q in query_batches:
            pending.append(
                (q, _pack_pair(*self._device_search(q, kk, decode=decode))))
            if len(pending) >= depth:
                yield finish(*pending.pop(0))
        while pending:
            yield finish(*pending.pop(0))
