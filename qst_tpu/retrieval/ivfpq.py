"""IVF-PQ hybrid index — beyond-reference capability.

``PQIndex`` puts ~100M docs in one chip's HBM (m bytes/doc) but every
search decodes the ENTIRE code matrix: at 100M docs the one-hot decode is
~2× the scoring matmul's silicon (the measured roofline in
benchmarks/RESULTS.md) and throughput is decode-bound. ``IVFIndex`` prunes
scoring to ``n_probe`` cells but stores full-precision rows (bf16 caps it
at single-digit millions per chip). This module combines them the classic
way — inverted cells whose entries are PQ codes — so that only *probed*
cells are ever decoded, with the decode shared across the query batch
wherever the batch's probes overlap:

- **coarse quantizer**: spherical k-means cells (reused from
  :mod:`qst_tpu.retrieval.ivf` — sample training, chunked assignment,
  vectorized budgeted fill with spill);
- **fine quantizer**: per-subspace PQ codebooks (reused Lloyd machinery
  from :mod:`qst_tpu.retrieval.pq`), by default trained/encoded on
  **residuals** ``r = x − c_cell`` — residual magnitudes shrink with cell
  radius, so the same m bytes/doc quantize markedly finer than global PQ;
  scores recombine exactly as ``q·x̂ = q·c_cell + q·r̂`` where ``q·c_cell``
  falls out of the probe-selection matmul for free;
- **search** scans the ``n_probe`` probed cells per query with a running
  top-k carry (the :func:`qst_tpu.retrieval.ivf._probe_scan` shape):
  each step gathers the probed cells' CODES ((Q, L, m) uint8 — m bytes/doc
  of gather traffic, 16× less than the float cell gather at m=48), decodes
  them through the one-hot MXU matmul in PQ_TILE-bounded chunks, and
  scores one einsum;
- optional **exact re-rank** from host-resident original rows
  (``keep_rows`` / ``refine_factor``, same contract as ``PQIndex``);
- ``mesh=`` shards the cell tensors over all mesh devices on the cell
  axis; every shard computes the same global probe list from replicated
  centroids, scans the probed cells it owns, and the per-shard candidates
  merge via all_gather + re-rank — identical results to single-device.

Reference context: the reference has no index structure at all (its
evaluator brute-force scans 50k-doc torch chunks,
reference training/main.py:178-179); IVF-PQ is the serving-scale envelope
of the rebuilt engine — decode work per search drops from O(N) to
O(n_probe·L) per query at a measured recall trade-off
(:meth:`IVFPQIndex.tune_n_probe`).
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
from qst_tpu.retrieval.ivf import _assign_choices, _fill_cells, kmeans
from qst_tpu.retrieval.pq import (
    K_CENTROIDS,
    PQ_TILE,
    _aniso_fit,
    _compute_dtype,
    _decode_onehot,
    refine_pair,
)
from qst_tpu.retrieval.pq4 import (
    K4,
    block_codebooks,
    decode4_rows,
    pq4_encode,
    pq4_train,
    validate_pq4_dims,
)


@functools.partial(jax.jit, static_argnames=("m", "n_iters"))
def pq_train_raw(sample: jax.Array, key: jax.Array, m: int,
                 n_iters: int = 12) -> jax.Array:
    """Per-subspace 256-way Lloyd k-means WITHOUT input normalization —
    the residual-space twin of :func:`qst_tpu.retrieval.pq.pq_train`
    (residuals are not unit vectors; normalizing them would train
    codebooks in the wrong space). → (m, 256, ds) float32."""
    s, d = sample.shape
    ds = d // m
    xs = jnp.transpose(sample.astype(jnp.float32).reshape(s, m, ds),
                       (1, 0, 2))                           # (m, S, ds)
    init_idx = jax.random.choice(key, s, (K_CENTROIDS,), replace=False)
    cb0 = xs[:, init_idx, :]

    def step(cb, _):
        assign = jnp.argmax(_aniso_fit(xs, cb, 0.0), axis=-1)   # (m, S)
        onehot = jax.nn.one_hot(assign, K_CENTROIDS, dtype=jnp.float32)
        sums = jnp.einsum("msk,msd->mkd", onehot, xs,
                          preferred_element_type=jnp.float32)
        counts = jnp.sum(onehot, axis=1)
        new = sums / jnp.maximum(counts[:, :, None], 1)
        return jnp.where(counts[:, :, None] > 0, new, cb), None

    cb, _ = jax.lax.scan(step, cb0, None, length=n_iters)
    return cb


@jax.jit
def pq_encode_raw(vectors: jax.Array, codebooks: jax.Array) -> jax.Array:
    """Encode raw (non-normalized) vectors → (B, m) uint8 — the residual
    twin of :func:`qst_tpu.retrieval.pq.pq_encode`."""
    m, _, ds = codebooks.shape
    x = vectors.astype(jnp.float32)
    xs = jnp.transpose(x.reshape(x.shape[0], m, ds), (1, 0, 2))
    fit = _aniso_fit(xs, codebooks, 0.0)
    return jnp.argmax(fit, axis=-1).T.astype(jnp.uint8)


def _decode_rows(codes_flat: jax.Array, cb: jax.Array) -> jax.Array:
    """(T, m) uint8 → (T, D) reconstructions; the one-hot transient is
    bounded to PQ_TILE rows by an inner ``lax.map`` (T is padded to the
    chunk quantum by the caller)."""
    T, m = codes_flat.shape
    DC = min(PQ_TILE, T)
    sub = codes_flat.reshape(T // DC, DC, m)
    recon = jax.lax.map(lambda c: _decode_onehot(c, cb).reshape(DC, -1),
                        sub)
    return recon.reshape(T, -1)


def _decode_any(codes_flat: jax.Array, cb: jax.Array,
                bits: int) -> jax.Array:
    """Dispatch the row decode on the code width. ``bits=8``: per-subspace
    256-way one-hot matmuls against (m, 256, ds) codebooks. ``bits=4``:
    the fast-scan block-diagonal matmul against blocked codebooks from
    :func:`qst_tpu.retrieval.pq4.block_codebooks` — ~8× less decode
    silicon at the same bytes/doc (see pq4 module docstring)."""
    if bits == 8:
        return _decode_rows(codes_flat, cb)
    T = codes_flat.shape[0]
    DC = min(PQ_TILE, T)
    sub = codes_flat.reshape(T // DC, DC, codes_flat.shape[1])
    recon = jax.lax.map(lambda c: decode4_rows(c, cb), sub)
    return recon.reshape(T, -1)


def _pad_to(x: jax.Array, quantum: int) -> jax.Array:
    T = x.shape[0]
    pad = (-T) % quantum
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


def _probe_scan(qc, psim, probe, gather, cb, bits: int, residual: bool,
                k: int, L: int) -> Tuple[jax.Array, jax.Array]:
    """The per-probe scan shared by the single-device and sharded searches:
    for each probed cell, ``gather(global_cell_ids) -> ((Q, L, m) codes,
    (Q, L) ids)`` fetches the cell, the codes decode through the
    one-hot-matmul decoder, scores accumulate the residual centroid term,
    and a running top-k folds the cell's candidates in. The two searches
    differ ONLY in the gather (the sharded one clamps to the local shard
    and masks out-of-range cells), so the scan body lives here once —
    a fix applied to one path cannot desynchronize the other."""
    Q = qc.shape[0]
    n_probe = probe.shape[1]
    kk = min(k, L)
    kc = min(k, n_probe * L)

    def body(carry, p):
        cs, ci = carry
        codes, ids = gather(probe[:, p])                    # (Q, L, m/L)
        m = codes.shape[-1]
        flat = _pad_to(codes.reshape(Q * L, m), PQ_TILE)
        recon = _decode_any(flat, cb, bits)[: Q * L].reshape(Q, L, -1)
        s = jnp.einsum("qd,qld->ql", qc, recon,
                       preferred_element_type=jnp.float32)
        if residual:
            s = s + psim[:, p][:, None]
        s = jnp.where(ids >= 0, s, -jnp.inf)
        s1, pos = jax.lax.top_k(s, kk)
        i1 = jnp.take_along_axis(ids, pos, axis=1)
        s2, pos2 = jax.lax.top_k(jnp.concatenate([cs, s1], axis=1), kc)
        i2 = jnp.take_along_axis(jnp.concatenate([ci, i1], axis=1), pos2,
                                 axis=1)
        return (s2, i2), None

    init = (jnp.full((Q, kc), -jnp.inf, jnp.float32),
            jnp.full((Q, kc), -1, jnp.int32))
    (cs, ci), _ = jax.lax.scan(body, init,
                               jnp.arange(n_probe, dtype=jnp.int32))
    return cs, ci


@functools.partial(jax.jit,
                   static_argnames=("n_probe", "k", "residual", "bits"))
def _ivfpq_search(queries, centroids, cell_codes, cell_ids, codebooks,
                  n_probe: int, k: int, residual: bool, bits: int = 8
                  ) -> Tuple[jax.Array, jax.Array]:
    """queries (Q, D); cell_codes (C, L, m) uint8 (packed nibble pairs
    when bits=4); cell_ids (C, L) int32 (-1 = padding); ``codebooks`` is
    (m, 256, ds) for bits=8 and the BLOCKED (packs, g·16, g·ds) decode
    matrices for bits=4; → (scores (Q, kc) f32, global doc ids (Q, kc))."""
    C, L, m = cell_codes.shape
    qf = l2_normalize(queries.astype(jnp.float32))
    csim = jnp.dot(qf, centroids.T, preferred_element_type=jnp.float32)
    psim, probe = jax.lax.top_k(csim, n_probe)              # (Q, P) ×2
    cd = _compute_dtype()
    return _probe_scan(qf.astype(cd), psim, probe,
                       lambda pid: (cell_codes[pid], cell_ids[pid]),
                       codebooks.astype(cd), bits, residual, k, L)


def _sharded_ivfpq_search_fn(mesh: Mesh, n_probe: int, k: int,
                             cells_per_shard: int, budget: int,
                             residual: bool, bits: int = 8):
    """Cell tensors sharded over ALL mesh devices on the cell axis: every
    shard computes the SAME global probe list from replicated centroids,
    scans only the probed cells it owns (masked clamp-gather on the code
    tensor), and the per-shard candidates merge via all_gather + re-rank —
    identical results to the single-device search (the
    :func:`qst_tpu.retrieval.ivf._sharded_ivf_search_fn` recipe with the
    float cell gather replaced by code gather + one-hot decode)."""
    axes = (DATA_AXIS, MODEL_AXIS)
    L = budget

    def body(q, centroids, codes_shard, ids_shard, codebooks):
        from qst_tpu.core.meshes import flat_shard_index

        base = flat_shard_index(axes) * cells_per_shard
        qf = l2_normalize(q.astype(jnp.float32))
        csim = jnp.dot(qf, centroids.T, preferred_element_type=jnp.float32)
        psim, probe = jax.lax.top_k(csim, n_probe)          # global ids
        cd = _compute_dtype()
        kc = min(k, n_probe * L)

        def gather(gpid):
            pid = gpid - base                               # local cell id
            in_range = (pid >= 0) & (pid < cells_per_shard)
            pid_c = jnp.clip(pid, 0, cells_per_shard - 1)
            codes = codes_shard[pid_c]                      # (Q, L, m)
            ids = jnp.where(in_range[:, None], ids_shard[pid_c], -1)
            return codes, ids

        cs, ci = _probe_scan(qf.astype(cd), psim, probe, gather,
                             codebooks.astype(cd), bits, residual, k, L)
        all_s = jax.lax.all_gather(cs, axes, axis=1, tiled=True)
        all_i = jax.lax.all_gather(ci, axes, axis=1, tiled=True)
        s2, pos = jax.lax.top_k(all_s, kc)
        i2 = jnp.take_along_axis(all_i, pos, axis=1)
        return s2, i2

    return jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(), P((DATA_AXIS, MODEL_AXIS)),
                      P((DATA_AXIS, MODEL_AXIS)), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )


class IncrementalCellFill:
    """Host-side budgeted cell fill for CHUNKED builds (corpora beyond
    host RAM, generated or streamed chunk by chunk): the vectorized
    round-based spill policy of :func:`qst_tpu.retrieval.ivf._fill_cells`
    applied incrementally — each chunk's docs take their best remaining
    choice, ranked stably within a cell, spilling to later choices when
    the running fill hits the budget. Only (B, R) int32 choice tables and
    (B,) placements touch the host; codes scatter on device."""

    def __init__(self, n_clusters: int, budget: int):
        self.fill = np.zeros(n_clusters, np.int64)
        self.budget = int(budget)
        self.spilled = 0

    def place(self, choices: np.ndarray
              ) -> Tuple[np.ndarray, np.ndarray]:
        """(B, R) best-first cell choices → (cell (B,), slot (B,)) int64.
        Raises if any doc exhausts its R choices (budget too small)."""
        choices = np.asarray(choices)
        B, R = choices.shape
        cell = np.full(B, -1, np.int64)
        slot = np.full(B, -1, np.int64)
        un = np.arange(B)
        for r in range(R):
            if not len(un):
                break
            cand = choices[un, r].astype(np.int64)
            order = np.argsort(cand, kind="stable")
            sc = cand[order]
            # rank within each equal-cell run
            starts = np.r_[0, np.nonzero(np.diff(sc))[0] + 1]
            run_len = np.diff(np.r_[starts, len(sc)])
            rank = np.arange(len(sc)) - np.repeat(starts, run_len)
            pos = self.fill[sc] + rank
            ok = pos < self.budget
            placed = un[order[ok]]
            cell[placed] = sc[ok]
            slot[placed] = pos[ok]
            self.fill += np.bincount(sc[ok], minlength=len(self.fill))
            if r > 0:
                self.spilled += int(ok.sum())
            un = un[order[~ok]]
        if len(un):
            raise ValueError(
                f"{len(un)} docs exhausted their {R} cell choices — "
                f"raise cell_budget or spill_rounds")
        return cell, slot


class IVFPQIndex:
    """Approximate cosine index: k-means cells holding PQ codes.

    m bytes/doc in HBM like ``PQIndex``, but a search decodes only the
    ``n_probe`` probed cells per query instead of the whole code matrix.
    ``residual=True`` (default) encodes ``x − c_cell`` — finer
    quantization at identical size; scores recombine exactly as
    ``q·c_cell + q·r̂``. ``keep_rows`` retains the unit-normalized
    originals on HOST RAM for ``refine_factor`` exact re-ranking (same
    contract as ``PQIndex``: True/"bfloat16" at 2 B/dim, "int8" at
    1 B/dim). ``mesh=`` shards the cell tensors over all mesh devices on
    the cell axis."""

    def __init__(self, embeddings, n_clusters: int = 256, m: int = 48,
                 ids: Optional[list] = None, n_iters: int = 10,
                 pq_iters: int = 12, cell_budget: Optional[int] = None,
                 seed: int = 0, train_sample: int = 262144,
                 spill_rounds: int = 4, mesh: Optional[Mesh] = None,
                 assign_chunk: int = 1 << 20, encode_chunk: int = 1 << 16,
                 default_n_probe: int = 8, residual: bool = True,
                 keep_rows=False, bits: int = 8):
        emb = embeddings if isinstance(embeddings, jax.Array) \
            else np.asarray(embeddings)
        n, d = emb.shape
        if n_clusters >= n:
            raise ValueError("n_clusters must be < number of docs")
        if bits not in (4, 8):
            raise ValueError(f"bits must be 4 or 8, got {bits}")
        if m % 8 != 0:
            raise ValueError(f"m must be a multiple of 8, got {m}")
        if bits == 4:
            # m stays BYTES per doc: 2m nibble subspaces of d/(2m) dims
            validate_pq4_dims(d, 2 * m)
        elif d % m != 0:
            raise ValueError(f"dim {d} not divisible by m={m}")
        if n < (K4 if bits == 4 else K_CENTROIDS):
            raise ValueError(
                f"need >= {K4 if bits == 4 else K_CENTROIDS} docs to "
                f"train PQ codebooks (got {n})")
        if n > train_sample and n_clusters > train_sample:
            raise ValueError(
                f"n_clusters={n_clusters} exceeds train_sample="
                f"{train_sample}")
        self.m, self.dim, self.n_docs = m, d, n
        self.bits = bits
        self.residual = bool(residual)
        self.default_n_probe = default_n_probe
        self.ids = list(ids) if ids is not None else list(range(n))
        if len(self.ids) != n:
            raise ValueError("ids length mismatch")

        # 1) coarse quantizer on a device-resident sample
        key = jax.random.key(seed)
        if n > train_sample:
            sk, key = jax.random.split(key)
            sample_idx = np.sort(np.asarray(
                jax.random.choice(sk, n, (train_sample,), replace=False)))
            sample = jnp.asarray(np.asarray(emb[sample_idx], np.float32)) \
                if not isinstance(emb, jax.Array) \
                else jnp.asarray(emb[sample_idx])
        else:
            sample = jnp.asarray(emb)
        centroids, sample_assign = kmeans(sample, key, n_clusters, n_iters)
        self.centroids = centroids

        # 2) fine quantizer trained on the SAME sample (residual space by
        #    default: subtract each sample row's own cell centroid)
        pk, key = jax.random.split(key)
        sample_n = l2_normalize(sample.astype(jnp.float32))
        train_vecs = sample_n - centroids[sample_assign] \
            if self.residual else sample_n
        if bits == 4:
            self.codebooks = pq4_train(train_vecs, pk, 2 * m, pq_iters)
        else:
            self.codebooks = pq_train_raw(train_vecs, pk, m, pq_iters)
        self._cb_search = block_codebooks(self.codebooks) \
            if bits == 4 else self.codebooks
        del sample, sample_n

        # 3) chunked full-corpus assignment (only the (N, R) int32 choice
        #    table reaches the host — the IVFIndex recipe)
        n_choices = min(spill_rounds, n_clusters)
        assign_chunk = min(assign_chunk,
                           max(8192, (1 << 30) // (4 * n_clusters)))
        choices = np.empty((n, n_choices), np.int32)
        pending: List[Tuple[int, int, jax.Array]] = []
        for lo in range(0, n, assign_chunk):
            hi = min(lo + assign_chunk, n)
            pending.append((lo, hi, _assign_choices(
                jnp.asarray(emb[lo:hi]), centroids, n_choices)))
            if len(pending) >= 2:
                plo, phi, dev = pending.pop(0)
                choices[plo:phi] = np.asarray(dev)
        for plo, phi, dev in pending:
            choices[plo:phi] = np.asarray(dev)

        # 4) budget + vectorized budgeted fill with spill (IVFIndex steps)
        counts = np.bincount(choices[:, 0], minlength=n_clusters)
        if cell_budget is None:
            cell_budget = max(128, int(np.quantile(counts[counts > 0],
                                                   0.95)))
            cell_budget = ((cell_budget + 127) // 128) * 128
        else:
            cell_budget = ((cell_budget + 7) // 8) * 8
        L = cell_budget
        cell, slot, self.spilled = _fill_cells(choices, n_clusters, L)
        self.fill = jnp.asarray(
            np.bincount(cell, minlength=n_clusters).astype(np.int32))

        # 5) chunked encode + host scatter of CODES (m bytes/doc — the
        #    only corpus-sized artifact; the one-hot fit transient is
        #    bounded by encode_chunk)
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

        flat_pos = (cell * L + slot).astype(np.int64)
        host_codes = np.zeros((n_clusters * L, m), np.uint8)
        cell_dev = jnp.asarray(cell.astype(np.int32))
        pend2: List[Tuple[int, int, jax.Array, Optional[jax.Array]]] = []

        def drain(slotv):
            lo, hi, dev, rows = slotv
            host_codes[flat_pos[lo:hi]] = np.asarray(dev)
            if rows is not None:
                self._refine_rows[lo:hi] = np.asarray(rows)

        for lo in range(0, n, encode_chunk):
            hi = min(lo + encode_chunk, n)
            chunk = jnp.asarray(emb[lo:hi])
            rows_n = l2_normalize(chunk.astype(jnp.float32))
            enc_in = rows_n - centroids[cell_dev[lo:hi]] \
                if self.residual else rows_n
            codes_dev = pq4_encode(enc_in, self.codebooks) if bits == 4 \
                else pq_encode_raw(enc_in, self.codebooks)
            rows_dev = None
            if keep_rows == "int8":
                rows_dev = jnp.clip(jnp.round(rows_n * 127.0),
                                    -127, 127).astype(jnp.int8)
            elif keep_rows:
                rows_dev = rows_n.astype(jnp.bfloat16)
            pend2.append((lo, hi, codes_dev, rows_dev))
            if len(pend2) >= 2:
                drain(pend2.pop(0))
        for slotv in pend2:
            drain(slotv)

        cell_ids = np.full((n_clusters * L,), -1, np.int32)
        cell_ids[flat_pos] = np.arange(n, dtype=np.int32)
        self._install_cells(
            host_codes.reshape(n_clusters, L, m),
            cell_ids.reshape(n_clusters, L), mesh)
        self.cell_budget = L

    def _install_cells(self, cell_codes, cell_ids,
                       mesh: Optional[Mesh]) -> None:
        n_clusters = cell_codes.shape[0]
        self.mesh = mesh
        self._search_fns = {}
        if mesh is not None and int(np.prod(list(mesh.shape.values()))) > 1:
            n_dev = int(np.prod(list(mesh.shape.values())))
            self.cells_per_shard = -(-n_clusters // n_dev)
            c_pad = self.cells_per_shard * n_dev
            if c_pad != n_clusters:
                cell_codes = np.pad(
                    np.asarray(cell_codes),
                    ((0, c_pad - n_clusters), (0, 0), (0, 0)))
                cell_ids = np.pad(np.asarray(cell_ids),
                                  ((0, c_pad - n_clusters), (0, 0)),
                                  constant_values=-1)
            sharding = NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS)))
            self.cell_codes = jax.device_put(np.asarray(cell_codes),
                                             sharding)
            self.cell_ids = jax.device_put(
                np.asarray(cell_ids, np.int32), sharding)
        else:
            self.mesh = None
            self.cell_codes = jnp.asarray(np.asarray(cell_codes))
            self.cell_ids = jnp.asarray(np.asarray(cell_ids, np.int32))

    @classmethod
    def from_arrays(cls, centroids, cell_codes, cell_ids, codebooks, fill,
                    ids: Optional[list] = None, mesh: Optional[Mesh] = None,
                    default_n_probe: int = 8, residual: bool = True,
                    refine_rows: Optional[np.ndarray] = None,
                    bits: int = 8) -> "IVFPQIndex":
        """Rebuild from persisted arrays — no k-means, no encode (the
        Retriever reload path)."""
        self = cls.__new__(cls)
        if bits not in (4, 8):
            raise ValueError(f"bits must be 4 or 8, got {bits}")
        cell_codes = np.asarray(cell_codes, np.uint8)
        cell_ids = np.asarray(cell_ids, np.int32)
        if cell_codes.ndim != 3 or cell_ids.shape != cell_codes.shape[:2]:
            raise ValueError(
                f"cell_codes {cell_codes.shape} / cell_ids "
                f"{cell_ids.shape} mismatch")
        self.centroids = jnp.asarray(centroids, jnp.float32)
        self.codebooks = jnp.asarray(codebooks, jnp.float32)
        m = cell_codes.shape[-1]
        d = int(self.centroids.shape[1])
        want = (2 * m, K4, d // (2 * m)) if bits == 4 \
            else (m, K_CENTROIDS, d // m)
        if self.codebooks.shape != want:
            raise ValueError(
                f"codebooks shape {self.codebooks.shape} != {want}")
        self.m, self.dim = m, d
        self.bits = bits
        self._cb_search = block_codebooks(self.codebooks) \
            if bits == 4 else self.codebooks
        self.residual = bool(residual)
        self.default_n_probe = default_n_probe
        self.fill = jnp.asarray(np.asarray(fill, np.int32))
        n = int((cell_ids >= 0).sum())
        self.ids = list(ids) if ids is not None else list(range(n))
        if len(self.ids) != n:
            raise ValueError("ids length mismatch")
        self.spilled = 0
        self.n_docs = n
        self.cell_budget = int(cell_codes.shape[1])
        self._refine_rows = None
        self._refine_scale = 1.0
        if refine_rows is not None:
            refine_rows = np.asarray(refine_rows)
            if refine_rows.shape != (n, d):
                raise ValueError(
                    f"refine_rows shape {refine_rows.shape} != {(n, d)}")
            if refine_rows.dtype == np.int8:
                self._refine_rows = refine_rows
                self._refine_scale = 127.0
            else:
                self._refine_rows = refine_rows.astype(jnp.bfloat16)
        self._install_cells(cell_codes, cell_ids, mesh)
        return self

    @classmethod
    def from_device_arrays(cls, centroids, cell_codes, cell_ids, codebooks,
                           ids=None, default_n_probe: int = 8,
                           residual: bool = True, bits: int = 8,
                           refine_rows: Optional[np.ndarray] = None
                           ) -> "IVFPQIndex":
        """Adopt DEVICE-resident cell tensors in place (single-device) —
        the 100M-scale build path: codes are generated, encoded, and
        scattered on device and never round-trip through the host relay
        (the :meth:`qst_tpu.retrieval.pq.PQIndex.from_codes` adoption
        pattern). ``ids=None`` stores a ``range`` (O(1) host memory at
        any corpus size)."""
        if bits not in (4, 8):
            raise ValueError(f"bits must be 4 or 8, got {bits}")
        if not (isinstance(cell_codes, jax.Array)
                and cell_codes.dtype == jnp.uint8 and cell_codes.ndim == 3):
            raise ValueError("cell_codes must be a device (C, L, m) uint8 "
                             "array — use from_arrays for host arrays")
        self = cls.__new__(cls)
        self.centroids = jnp.asarray(centroids, jnp.float32)
        self.codebooks = jnp.asarray(codebooks, jnp.float32)
        C, L, m = cell_codes.shape
        d = int(self.centroids.shape[1])
        want = (2 * m, K4, d // (2 * m)) if bits == 4 \
            else (m, K_CENTROIDS, d // m)
        if self.codebooks.shape != want:
            raise ValueError(
                f"codebooks shape {self.codebooks.shape} != {want}")
        self.m, self.dim, self.bits = m, d, bits
        self._cb_search = block_codebooks(self.codebooks) \
            if bits == 4 else self.codebooks
        self.residual = bool(residual)
        self.default_n_probe = default_n_probe
        self.mesh = None
        self._search_fns = {}
        self.cell_codes = cell_codes
        self.cell_ids = jnp.asarray(cell_ids, jnp.int32)
        if self.cell_ids.shape != (C, L):
            raise ValueError(
                f"cell_ids {self.cell_ids.shape} != {(C, L)}")
        self.fill = jnp.sum(self.cell_ids >= 0, axis=1).astype(jnp.int32)
        n = int(jnp.sum(self.fill))
        self.n_docs = n
        self.cell_budget = L
        self.spilled = 0
        self.ids = list(ids) if ids is not None else range(n)
        if len(self.ids) != n:
            raise ValueError("ids length mismatch")
        self._refine_rows = None
        self._refine_scale = 1.0
        if refine_rows is not None:
            refine_rows = np.asarray(refine_rows)
            if refine_rows.shape != (n, d):
                raise ValueError(
                    f"refine_rows shape {refine_rows.shape} != {(n, d)}")
            if refine_rows.dtype == np.int8:
                self._refine_rows = refine_rows
                self._refine_scale = 127.0
            else:
                self._refine_rows = refine_rows.astype(jnp.bfloat16)
        return self

    def bytes_per_doc(self) -> int:
        return self.m

    def refine_rows_f32(self) -> Optional[np.ndarray]:
        if self._refine_rows is None:
            return None
        rows = np.asarray(self._refine_rows, np.float32)
        if self._refine_scale != 1.0:
            rows = rows / np.float32(self._refine_scale)
        return rows

    def reconstruct_rows(self) -> np.ndarray:
        """→ (n_docs, D) float32 host matrix of the PQ *reconstructions*
        in id order (centroid + decoded residual when ``residual``) — the
        exactness golden for tests and the full-probe ground truth."""
        C, L, m = self.cell_codes.shape
        cb = self._cb_search.astype(jnp.float32) if self.bits == 4 \
            else self.codebooks.astype(jnp.float32)
        out = np.empty((self.n_docs, self.dim), np.float32)
        cent = np.asarray(self.centroids, np.float32)
        codes = np.asarray(self.cell_codes).reshape(C * L, m)
        flat_ids = np.asarray(self.cell_ids).reshape(-1)
        chunk = 1 << 16
        for lo in range(0, C * L, chunk):
            hi = min(lo + chunk, C * L)
            ids = flat_ids[lo:hi]
            valid = ids >= 0
            if not valid.any():
                continue
            dec = np.asarray(_decode_any(
                _pad_to(jnp.asarray(codes[lo:hi]), PQ_TILE),
                cb, self.bits))[: hi - lo].astype(np.float32)
            if self.residual:
                # clamp: _install_cells pads C past n_clusters for mesh
                # sharding; padded cells are all ids<0 (masked by `valid`)
                # but the gather itself must stay in range
                cell_of = np.minimum(np.arange(lo, hi) // L,
                                     cent.shape[0] - 1)
                dec = dec + cent[cell_of]
            out[ids[valid]] = dec[valid]
        return out

    def _device_search(self, q, k: int, n_probe: int):
        if self.mesh is not None:
            key = (n_probe, k)
            if key not in self._search_fns:
                self._search_fns[key] = _sharded_ivfpq_search_fn(
                    self.mesh, n_probe, k, self.cells_per_shard,
                    self.cell_budget, self.residual, self.bits)
            return self._search_fns[key](q, self.centroids,
                                         self.cell_codes, self.cell_ids,
                                         self._cb_search)
        return _ivfpq_search(q, self.centroids, self.cell_codes,
                             self.cell_ids, self._cb_search, n_probe, k,
                             self.residual, self.bits)

    def _device_search_retriever(self, q, k: int, score: str = "cos_sim",
                                 tile: int = 0, backend: str = "auto"):
        """The Retriever streaming contract (same positional shape as
        ``ExactIndex._device_search``)."""
        if score not in ("cos_sim", "dot_score"):
            raise ValueError("IVF-PQ index supports cos_sim/dot_score only "
                             "(rows are normalized at encode time)")
        return self._device_search(jnp.asarray(q, jnp.float32),
                                   min(k, self.n_docs),
                                   min(self.default_n_probe,
                                       int(self.centroids.shape[0])))

    # the decode transient per probe step is (Q·L, PQ_TILE-chunked) but
    # the gathered codes + (Q, L, D) reconstruction einsum peak at
    # Q·L·(m + 2·D) bytes — bound the per-dispatch query chunk
    RECON_BUDGET_BYTES = 1 << 29

    def _q_chunk(self) -> int:
        row = self.cell_budget * (self.m + 2 * self.dim)
        return max(8, min(4096, self.RECON_BUDGET_BYTES // row))

    DEFAULT_REFINE = 8

    def search(self, queries, k: int = 10, n_probe: Optional[int] = None,
               refine_factor: Optional[int] = None,
               score: str = "cos_sim"
               ) -> Tuple[np.ndarray, List[list]]:
        """→ (scores, per-query external-id lists); the column width is
        ``min(k, n_probe * cell_budget)`` — the probed pool can be
        narrower than ``k`` at tiny probe settings.

        ``refine_factor=r`` re-ranks the top r·k IVF-PQ candidates exactly
        from the host-resident originals (requires ``keep_rows`` at build
        time); default: DEFAULT_REFINE when refine rows exist, else raw
        IVF-PQ scores (pass 0 to force). ``score`` accepts
        cos_sim/dot_score (identical: stored rows are unit-normalized)."""
        from qst_tpu.retrieval.index import fetch_pair

        if score not in ("cos_sim", "dot_score"):
            raise ValueError("IVF-PQ index supports cos_sim/dot_score only "
                             "(rows are normalized at encode time)")
        n_probe = min(n_probe or self.default_n_probe,
                      int(self.centroids.shape[0]))
        if refine_factor is None:
            refine_factor = (self.DEFAULT_REFINE
                             if self._refine_rows is not None else 0)
        if refine_factor and self._refine_rows is None:
            raise ValueError(
                "refine_factor needs keep_rows=True at build time")
        k = min(k, self.n_docs)
        kk = min(k * refine_factor, self.n_docs) if refine_factor else k
        q = jnp.asarray(queries, jnp.float32)
        chunk = self._q_chunk()
        pairs = [fetch_pair(*self._device_search(q[lo:lo + chunk], kk,
                                                 n_probe))
                 for lo in range(0, q.shape[0], chunk)]
        s = np.concatenate([p[0] for p in pairs])
        i = np.concatenate([p[1] for p in pairs])
        if refine_factor:
            s, i = refine_pair(
                q, self._refine_rows, i,
                min(k, i.shape[1]),   # probed pool may be < k at tiny P·L
                self._refine_scale, self.n_docs)
        ids = [[self.ids[j] if j >= 0 else None for j in row]
               for row in i]
        return s, ids

    def search_ids(self, queries, k: int = 10,
                   n_probe: Optional[int] = None,
                   refine_factor: Optional[int] = None,
                   score: str = "cos_sim"):
        """Alias of :meth:`search` (ids are the native return here —
        parity with the other index families' surfaces)."""
        return self.search(queries, k, n_probe, refine_factor, score)

    def search_stream(self, query_batches, k: int = 10,
                      n_probe: Optional[int] = None, depth: int = 4,
                      refine_factor: Optional[int] = None):
        """Pipelined serving loop (the ``ExactIndex.search_stream``
        dispatch pattern): yields one ``(scores, ids int32 positions)``
        pair per batch in input order, up to ``depth`` searches in
        flight; refinement of batch N runs while batches N+1.. compute
        on device. As in :meth:`search`, the column width is
        ``min(k, n_probe * cell_budget)`` — the probed candidate pool
        can be narrower than ``k`` at tiny probe settings."""
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        n_probe = min(n_probe or self.default_n_probe,
                      int(self.centroids.shape[0]))
        refine = refine_factor or 0
        if refine and self._refine_rows is None:
            raise ValueError(
                "refine_factor needs keep_rows=True at build time")
        from qst_tpu.retrieval.index import _pack_pair, _unpack_host

        def finish(queries, packed):
            s, i = _unpack_host(np.asarray(packed))
            if not refine:
                return s, i
            return refine_pair(
                queries, self._refine_rows, i,
                min(k, i.shape[1]),   # probed pool may be < k at tiny P·L
                self._refine_scale, self.n_docs)

        kk = min(k * refine, self.n_docs) if refine else min(k, self.n_docs)
        pending: list = []
        for q in query_batches:
            qj = jnp.asarray(q, jnp.float32)
            pending.append(
                (qj, _pack_pair(*self._device_search(qj, kk, n_probe))))
            if len(pending) >= depth:
                yield finish(*pending.pop(0))
        while pending:
            yield finish(*pending.pop(0))

    def tune_n_probe(self, queries, k: int = 10,
                     target_recall: float = 0.95,
                     candidates: Optional[List[int]] = None,
                     set_default: bool = True) -> Tuple[int, dict]:
        """Pick the smallest ``n_probe`` meeting a recall target against
        this index's own exhaustive full probe (which scans every cell —
        exact w.r.t. the PQ reconstructions). Same contract and guards as
        :meth:`qst_tpu.retrieval.ivf.IVFIndex.tune_n_probe`."""
        if not 0.0 < target_recall <= 1.0:
            raise ValueError(
                f"target_recall must be in (0, 1], got {target_recall}")
        n_cells = int(self.centroids.shape[0])
        if candidates is None:
            candidates = []
            p = 1
            while p < n_cells:
                candidates.append(p)
                p *= 2
        else:
            given = list(candidates)
            candidates = sorted({int(p) for p in given
                                 if 1 <= int(p) < n_cells})
            if not candidates:
                raise ValueError(
                    f"no candidates in [1, {n_cells}) after filtering "
                    f"{given!r}; pass n_probe values below the cell count")
        k = min(k, self.n_docs)
        q = np.asarray(queries, np.float32)
        if q.ndim != 2 or q.shape[0] == 0:
            raise ValueError(
                f"queries must be a non-empty (Q, D) sample, got {q.shape}")
        _, truth = self.search(q, k=k, n_probe=n_cells, refine_factor=0)
        truth_sets = [set(i for i in row if i is not None) for row in truth]

        curve: dict = {}
        best = n_cells
        for p in candidates:
            _, got = self.search(q, k=k, n_probe=p, refine_factor=0)
            recall = float(np.mean([
                len(t & {i for i in row if i is not None}) / max(len(t), 1)
                for t, row in zip(truth_sets, got)]))
            curve[p] = recall
            if recall >= target_recall:
                best = p
                break
        if best == n_cells:
            curve[n_cells] = 1.0
            import warnings

            warnings.warn(
                f"tune_n_probe: no candidate in {candidates} reached "
                f"recall@{k} >= {target_recall}; "
                + ("installing" if set_default else "returning")
                + f" the exhaustive full probe (n_probe={n_cells})",
                stacklevel=2)
        if set_default:
            self.default_n_probe = best
        return best, curve
