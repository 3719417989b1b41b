"""IVF (inverted-file) approximate index — beyond-reference capability.

Exact search is O(N·D) per query; at very large corpora an IVF index trades
a little recall for a large constant-factor win: k-means partitions the
corpus into ``n_clusters`` cells, and a query only scores documents in its
``n_probe`` closest cells.

TPU-first formulation, built to scale to 10M+ docs (round-3 redesign — the
round-2 build ran a per-doc Python loop over a full (N, C) host similarity
matrix):

- **k-means trains on a sample** (``train_sample`` docs) as jitted Lloyd
  iterations (assignment = one cosine matmul + argmax on the MXU; centroid
  update = one segment-sum matmul);
- **full-corpus assignment is chunked on device**: each chunk is one
  matmul + top-R choice list; only the (N, R) int32 choice table ever
  reaches the host;
- **cell fill is vectorized** (argsort/searchsorted rank-within-cell, one
  round per spill level — no per-doc loop): docs overflowing their primary
  cell's budget spill to their next-best cell so nothing is dropped;
- **cells are scattered ON device** from the device-resident embeddings
  (one ``.at[pos].set`` — the corpus never round-trips through host numpy),
  stored ``float32`` or MXU-native ``bfloat16``, optionally SHARDED over a
  mesh on the cell axis with an all-gather candidate merge at search time;
- **search scans probes** with a running top-k carry (static shapes, no
  (Q, P·L, D) materialization), chunking large query batches.
"""

from __future__ import annotations

import functools
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qst_tpu.core.meshes import DATA_AXIS, MODEL_AXIS
from qst_tpu.ops.distances import l2_normalize


@functools.partial(jax.jit, static_argnames=("n_clusters", "n_iters",
                                             "compute_dtype"))
def kmeans(data: jax.Array, key: jax.Array, n_clusters: int,
           n_iters: int = 10, compute_dtype: Optional[str] = None
           ) -> Tuple[jax.Array, jax.Array]:
    """Spherical k-means (cosine): → (centroids (C, D), assignment (N,)).

    ``compute_dtype="bfloat16"`` runs both Lloyd matmuls with bf16 inputs
    (f32 accumulation) — ~4× MXU throughput at large sample×C×D; centroids
    stay f32."""
    n = data.shape[0]
    cd = jnp.dtype(compute_dtype) if compute_dtype else jnp.float32
    x = l2_normalize(data.astype(jnp.float32))
    xc = x.astype(cd)
    init_idx = jax.random.choice(key, n, (n_clusters,), replace=False)
    centroids = x[init_idx]

    def step(centroids, _):
        sim = jnp.dot(xc, centroids.astype(cd).T,
                      preferred_element_type=jnp.float32)
        assign = jnp.argmax(sim, axis=1)                    # (N,)
        onehot = jax.nn.one_hot(assign, n_clusters, dtype=cd)
        sums = jnp.dot(onehot.T, xc, preferred_element_type=jnp.float32)
        counts = onehot.astype(jnp.float32).sum(axis=0)[:, None]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), centroids)
        return l2_normalize(new), None

    centroids, _ = jax.lax.scan(step, centroids, None, length=n_iters)
    assign = jnp.argmax(
        jnp.dot(xc, centroids.astype(cd).T,
                preferred_element_type=jnp.float32), axis=1)
    return centroids, assign


@functools.partial(jax.jit, static_argnames=("n_choices",))
def _assign_choices(emb_chunk: jax.Array, centroids: jax.Array,
                    n_choices: int) -> jax.Array:
    """→ (B, n_choices) int32: each doc's closest cells, best first. The
    score matmul runs in the corpus dtype (bf16 corpora assign at MXU
    rate, f32 accumulation)."""
    x = l2_normalize(emb_chunk.astype(jnp.float32))
    if emb_chunk.dtype == jnp.bfloat16:
        x = x.astype(jnp.bfloat16)
    sim = jnp.dot(x, centroids.astype(x.dtype).T,
                  preferred_element_type=jnp.float32)
    _, idx = jax.lax.top_k(sim, n_choices)
    return idx.astype(jnp.int32)


def _fill_cells(choices: np.ndarray, n_clusters: int, budget: int
                ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Vectorized budgeted cell fill. ``choices`` is the (N, R) host choice
    table; → (cell (N,), slot (N,), spilled). Round r places every
    still-unplaced doc into its r-th choice if capacity remains, using a
    stable argsort to rank docs within a cell — O(N log N) per round, no
    per-doc loop. Docs unplaced after R rounds raise (budget too small)."""
    n, n_rounds = choices.shape
    fill = np.zeros(n_clusters, np.int64)
    cell = np.full(n, -1, np.int64)
    slot = np.full(n, -1, np.int64)
    remaining = np.arange(n)
    for r in range(n_rounds):
        if remaining.size == 0:
            break
        choice = choices[remaining, r].astype(np.int64)
        order = np.argsort(choice, kind="stable")
        docs = remaining[order]
        cs = choice[order]
        start = np.searchsorted(cs, np.arange(n_clusters))
        rank = np.arange(cs.size) - start[cs]
        ok = rank < (budget - fill)[cs]
        placed = docs[ok]
        cell[placed] = cs[ok]
        slot[placed] = fill[cs[ok]] + rank[ok]
        fill += np.bincount(cs[ok], minlength=n_clusters)
        remaining = docs[~ok]
    if remaining.size:
        # guaranteed-placement pass: any cell with free capacity (the
        # budget is a high quantile of cell sizes, so total capacity
        # C·budget exceeds N — a handful of stragglers whose top-R choices
        # all filled land in arbitrary cells rather than aborting a
        # multi-million-doc build; recall impact is O(stragglers/N))
        caps = budget - fill
        if caps.sum() < remaining.size:
            raise RuntimeError(
                f"cell budget exhausted for {remaining.size} docs "
                f"(total free capacity {int(caps.sum())}); raise "
                f"cell_budget")
        cell_for = np.repeat(np.arange(n_clusters), caps)[: remaining.size]
        start = np.searchsorted(cell_for, np.arange(n_clusters))
        rank = np.arange(cell_for.size) - start[cell_for]
        cell[remaining] = cell_for
        slot[remaining] = fill[cell_for] + rank
    spilled = int(np.sum(cell != choices[:, 0]))
    return cell, slot, spilled


@functools.partial(jax.jit, donate_argnames=("cells_flat",),
                   static_argnames=("n_clusters", "budget"))
def _reshape_cells(cells_flat: jax.Array, n_clusters: int,
                   budget: int) -> jax.Array:
    """(C·L, D) → (C, L, D) WITHOUT a second cells-sized buffer: the
    reshape of a contiguous leading dim is a bitcast, and donating the
    input lets XLA alias it in place (see the build-path comment)."""
    return cells_flat.reshape(n_clusters, budget, -1)


@functools.partial(jax.jit, donate_argnames=("cells_flat",))
def _scatter_chunk(cells_flat: jax.Array, chunk: jax.Array,
                   pos: jax.Array) -> jax.Array:
    """Normalize one corpus chunk and scatter it into the flat cell tensor
    (donated — the build is one in-place pass; the corpus never visits host
    numpy and the f32 normalize transient is one chunk, not the corpus)."""
    rows = l2_normalize(chunk.astype(jnp.float32)).astype(cells_flat.dtype)
    return cells_flat.at[pos].set(rows)


def _probe_scan(qc, probe, fetch, k: int, budget: int, n_probe: int):
    """The exactness-critical probe loop shared by the single-device and
    sharded XLA searches: scan the ``n_probe`` probed cells with a running
    top-k carry — peak memory one (Q, L, D) gather, independent of
    n_probe. ``fetch(pid_col) -> (cand (Q, L, D), ids (Q, L))`` supplies
    each probe column's cell rows + doc ids (-1 = masked/padding)."""
    Q = qc.shape[0]
    kk = min(k, budget)            # per-cell: a cell holds only L docs
    kc = min(k, n_probe * budget)  # carry: total probed candidate pool

    def body(carry, p):
        cs, ci = carry
        cand, ids = fetch(probe[:, p])
        s = jnp.einsum("qd,qld->ql", qc, cand,
                       preferred_element_type=jnp.float32)
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


@functools.partial(jax.jit, static_argnames=("n_probe", "k"))
def _ivf_search(queries, centroids, cells, cell_ids, n_probe, k):
    """queries (Q, D); cells (C, L, D) padded per-cell doc matrix;
    cell_ids (C, L) global doc ids (-1 = padding)."""
    qf = l2_normalize(queries.astype(jnp.float32))
    csim = jnp.dot(qf, centroids.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(csim, n_probe)                 # (Q, P)
    qc = qf.astype(cells.dtype)
    return _probe_scan(qc, probe,
                       lambda pid: (cells[pid], cell_ids[pid]),
                       k, cells.shape[1], n_probe)


def _sharded_ivf_search_fn(mesh: Mesh, n_probe: int, k: int,
                           cells_per_shard: int, budget: int):
    """Cells sharded over ALL mesh devices on the cell axis: every shard
    computes the SAME global probe list from the replicated centroids, scans
    only the probed cells it owns (masked clamp-gather), and the per-shard
    top-k candidates merge via all_gather + re-rank — identical results to
    the single-device search."""
    axes = (DATA_AXIS, MODEL_AXIS)

    def body(q, centroids, cells_shard, ids_shard):
        from qst_tpu.core.meshes import flat_shard_index

        base = flat_shard_index(axes) * cells_per_shard
        qf = l2_normalize(q.astype(jnp.float32))
        csim = jnp.dot(qf, centroids.T, preferred_element_type=jnp.float32)
        _, probe = jax.lax.top_k(csim, n_probe)             # (Q, P) global
        qc = qf.astype(cells_shard.dtype)

        def fetch(pid_col):
            pid = pid_col - base                            # local cell id
            in_range = (pid >= 0) & (pid < cells_per_shard)
            pid_c = jnp.clip(pid, 0, cells_per_shard - 1)
            return (cells_shard[pid_c],
                    jnp.where(in_range[:, None], ids_shard[pid_c], -1))

        cs, ci = _probe_scan(qc, probe, fetch, k, budget, n_probe)
        kc = min(k, n_probe * budget)
        all_s = jax.lax.all_gather(cs, axes, axis=1, tiled=True)
        all_i = jax.lax.all_gather(ci, axes, axis=1, tiled=True)
        s2, pos = jax.lax.top_k(all_s, kc)
        i2 = jnp.take_along_axis(all_i, pos, axis=1)
        return s2, i2

    return jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(), P((DATA_AXIS, MODEL_AXIS)),
                      P((DATA_AXIS, MODEL_AXIS))),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )


def _sharded_ivf_pallas_fn(mesh: Mesh, k: int, n_probe: int,
                           cells_per_shard: int, budget: int,
                           interpret: bool):
    """Sharded IVF through the dynamic-DMA cell scorer: every shard
    computes the same global probe list, runs the Pallas scorer over the
    probed cells it owns (out-of-range probes clamp to local cell 0 and
    are masked to -inf via a zero fill count), and the per-shard top-k
    candidates merge via all_gather + re-rank — identical results to the
    single-device Pallas search, so the fast path covers the pod-slice
    configuration too (the XLA probe gather it replaces runs at
    single-digit % of HBM bandwidth)."""
    from qst_tpu.ops.ivf_pallas import ivf_cell_scores_fn
    from qst_tpu.retrieval.index import _local_topk

    scorer = ivf_cell_scores_fn(interpret=interpret)
    axes = (DATA_AXIS, MODEL_AXIS)
    L = budget

    def body(q, centroids, cells_shard, ids_shard, fill):
        from qst_tpu.core.meshes import flat_shard_index

        base = flat_shard_index(axes) * cells_per_shard
        Q = q.shape[0]
        qf = l2_normalize(q.astype(jnp.float32))
        csim = jnp.dot(qf, centroids.T, preferred_element_type=jnp.float32)
        _, probe = jax.lax.top_k(csim, n_probe)         # (Q, P) global
        probe = probe.astype(jnp.int32)
        pid = probe - base                              # local cell id
        in_range = (pid >= 0) & (pid < cells_per_shard)
        pid_c = jnp.clip(pid, 0, cells_per_shard - 1)
        scores = scorer(qf, cells_shard, pid_c)         # (Q, P·L) f32
        fillp = jnp.where(in_range, fill[probe], 0)     # (Q, P)
        iota = jnp.arange(L, dtype=jnp.int32)
        ok = iota[None, None, :] < fillp[:, :, None]
        scores = jnp.where(ok.reshape(Q, n_probe * L), scores, -jnp.inf)
        kc = min(k, n_probe * L)
        s, pos = _local_topk(scores, kc)
        p_idx = pos // L
        slot = pos % L
        cell_local = jnp.take_along_axis(pid_c, p_idx, axis=1)
        doc = ids_shard[cell_local, slot]               # (Q, kc)
        doc = jnp.where(jnp.isneginf(s), -1, doc)
        all_s = jax.lax.all_gather(s, axes, axis=1, tiled=True)
        all_i = jax.lax.all_gather(doc, axes, axis=1, tiled=True)
        s2, pos2 = jax.lax.top_k(all_s, kc)
        i2 = jnp.take_along_axis(all_i, pos2, axis=1)
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


def _ivf_pallas_search_fn(k: int, n_probe: int, interpret: bool):
    """Single-device IVF search through the dynamic-DMA cell scorer
    (qst_tpu.ops.ivf_pallas): probe selection on the MXU, per-(query,
    probe) cell blocks fetched by scalar-prefetch-indexed DMA, padded
    slots masked via the per-cell occupancy counts, one bucketed top-k
    over the (Q, P·L) scores."""
    from qst_tpu.ops.ivf_pallas import ivf_cell_scores_fn
    from qst_tpu.retrieval.index import _local_topk

    scorer = ivf_cell_scores_fn(interpret=interpret)

    @jax.jit
    def fn(q, centroids, cells, cell_ids, fill):
        Q = q.shape[0]
        L = cells.shape[1]
        qf = l2_normalize(q.astype(jnp.float32))
        csim = jnp.dot(qf, centroids.T, preferred_element_type=jnp.float32)
        _, probe = jax.lax.top_k(csim, n_probe)         # (Q, P)
        probe = probe.astype(jnp.int32)
        scores = scorer(qf, cells, probe)               # (Q, P·L) f32
        fillp = fill[probe]                             # (Q, P)
        iota = jnp.arange(L, dtype=jnp.int32)
        ok = iota[None, None, :] < fillp[:, :, None]
        scores = jnp.where(ok.reshape(Q, n_probe * L), scores, -jnp.inf)
        kc = min(k, n_probe * L)
        s, pos = _local_topk(scores, kc)
        p_idx = pos // L
        slot = pos % L
        cellid = jnp.take_along_axis(probe, p_idx, axis=1)
        doc = cell_ids[cellid, slot]                    # (Q, kc)
        doc = jnp.where(jnp.isneginf(s), -1, doc)
        return s, doc

    return fn


class IVFIndex:
    """Approximate cosine index: k-means cells + n_probe search.

    Cells are stored as a fixed (C, L, D) padded tensor (L = per-cell budget,
    95th-percentile cell size by default); overflowing docs spill into their
    next-best cell so nothing is dropped. ``embeddings`` may be a host array
    or a device array (the build never copies the corpus to host);
    ``dtype="bfloat16"`` halves cell HBM + gather bytes; ``mesh`` shards the
    cell tensor over all mesh devices (search merges per-shard candidates
    over ICI, identical results to single-device)."""

    def __init__(self, embeddings, n_clusters: int = 256,
                 ids: Optional[list] = None, n_iters: int = 10,
                 cell_budget: Optional[int] = None, seed: int = 0,
                 train_sample: int = 262144, spill_rounds: int = 4,
                 dtype: str = "float32", mesh: Optional[Mesh] = None,
                 assign_chunk: int = 1 << 20, default_n_probe: int = 8):
        self.default_n_probe = default_n_probe
        if dtype not in ("float32", "bfloat16"):
            raise ValueError(f"dtype must be float32|bfloat16, got {dtype}")
        emb = embeddings if isinstance(embeddings, jax.Array) \
            else np.asarray(embeddings, np.float32)
        n, d = emb.shape
        if n_clusters >= n:
            raise ValueError("n_clusters must be < number of docs")
        if n > train_sample and n_clusters > train_sample:
            raise ValueError(
                f"n_clusters={n_clusters} exceeds train_sample="
                f"{train_sample}: k-means trains on the sample, which must "
                "contain at least one point per cluster — raise "
                "train_sample or lower n_clusters")
        self.ids = list(ids) if ids is not None else list(range(n))
        if len(self.ids) != n:
            raise ValueError("ids length mismatch")

        # 1) k-means on a device-resident sample
        key = jax.random.key(seed)
        if n > train_sample:
            sk, key = jax.random.split(key)
            sample_idx = np.sort(np.asarray(
                jax.random.choice(sk, n, (train_sample,), replace=False)))
            sample = jnp.asarray(emb[sample_idx])
        else:
            sample = jnp.asarray(emb)
        centroids, _ = kmeans(
            sample, key, n_clusters, n_iters,
            compute_dtype="bfloat16" if dtype == "bfloat16" else None)
        self.centroids = centroids

        # 2) chunked full-corpus assignment: only the (N, R) int32 choice
        #    table reaches the host. The (chunk, C) f32 similarity transient
        #    is the peak-memory driver — bound it to ~1 GB (at C=2048 a
        #    1M-row chunk is an 8 GB transient: instant OOM next to a
        #    device-resident corpus)
        n_choices = min(spill_rounds, n_clusters)
        assign_chunk = min(assign_chunk,
                           max(8192, (1 << 30) // (4 * n_clusters)))
        choices = np.empty((n, n_choices), np.int32)
        pending: List[Tuple[int, int, jax.Array]] = []
        for lo in range(0, n, assign_chunk):
            hi = min(lo + assign_chunk, n)
            pending.append((lo, hi, _assign_choices(
                jnp.asarray(emb[lo:hi]), centroids, n_choices)))
            if len(pending) >= 2:   # overlap: 2 in-flight bounds the
                                    # (chunk, C) f32 transients to ~2 GB
                plo, phi, dev = pending.pop(0)
                choices[plo:phi] = np.asarray(dev)
        for plo, phi, dev in pending:
            choices[plo:phi] = np.asarray(dev)

        # 3) budget from the sample's cell-size distribution (the round-2
        #    exact bincount needs the full assignment anyway — the first
        #    choice column provides it for free)
        counts = np.bincount(choices[:, 0], minlength=n_clusters)
        if cell_budget is None:
            # align the auto budget to 128: the Pallas cell scorer wants
            # 8-row blocks and the wide top-k wants 128-lane multiples
            cell_budget = max(128, int(np.quantile(counts[counts > 0],
                                                   0.95)))
            cell_budget = ((cell_budget + 127) // 128) * 128
        else:
            cell_budget = ((cell_budget + 7) // 8) * 8
        L = cell_budget

        # 4) vectorized budgeted fill + spill (host, O(N log N) per round)
        cell, slot, self.spilled = _fill_cells(choices, n_clusters, L)
        # per-cell occupancy, for masking padded slots in the Pallas path
        self.fill = jnp.asarray(
            np.bincount(cell, minlength=n_clusters).astype(np.int32))

        # 5) chunked device scatter into the (C, L, D) cell tensor
        flat_pos = (cell * L + slot).astype(np.int32)
        cells = jnp.zeros((n_clusters * L, d), jnp.dtype(dtype))
        for lo in range(0, n, assign_chunk):
            hi = min(lo + assign_chunk, n)
            cells = _scatter_chunk(cells, jnp.asarray(emb[lo:hi]),
                                   jnp.asarray(flat_pos[lo:hi]))
            # synchronize when the cell tensor is a large fraction of HBM:
            # _scatter_chunk donates, but a runtime that does not honor
            # donation end-to-end (observed through the dev relay) turns
            # the chain into alloc-new/free-old churn, and with async
            # dispatch the frees LAG the allocations — several cells-sized
            # buffers can be transiently live and exhaust the arena.
            # Blocking bounds the churn to one extra buffer.
            if cells.nbytes > 1 << 32:
                cells.block_until_ready()
        # donated reshape: a plain .reshape() materializes a SECOND
        # cells-sized buffer whose free lands asynchronously — on a chip
        # where the cell tensor is most of HBM, the next upload races that
        # free and dies. Donation lets XLA alias the bitcast in place;
        # the barrier keeps anything from racing the transition.
        cells = _reshape_cells(cells, n_clusters, L)
        if cells.nbytes > 1 << 32:
            cells.block_until_ready()
        cell_ids = np.full((n_clusters * L,), -1, np.int32)
        cell_ids[flat_pos] = np.arange(n, dtype=np.int32)
        cell_ids = jnp.asarray(cell_ids.reshape(n_clusters, L))

        self._install_cells(cells, cell_ids, mesh)
        self.n_docs = n
        self.cell_budget = L

    def _install_cells(self, cells, cell_ids, mesh: Optional[Mesh]) -> None:
        """Place the (C, L, D) cell tensors on device, cell-sharded over
        the mesh when given (padded cells are never probed — the centroid
        top-k covers only real cells — but their ids stay -1 so a gather
        cannot surface them)."""
        n_clusters = cells.shape[0]
        self.mesh = mesh
        self._sharded_fns = {}
        if mesh is not None and int(np.prod(list(mesh.shape.values()))) > 1:
            n_dev = int(np.prod(list(mesh.shape.values())))
            self.cells_per_shard = -(-n_clusters // n_dev)
            c_pad = self.cells_per_shard * n_dev
            if c_pad != n_clusters:
                cells = jnp.pad(cells,
                                ((0, c_pad - n_clusters), (0, 0), (0, 0)))
                cell_ids = jnp.pad(cell_ids,
                                   ((0, c_pad - n_clusters), (0, 0)),
                                   constant_values=-1)
            sharding = NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS)))
            self.cells = jax.device_put(cells, sharding)
            self.cell_ids = jax.device_put(cell_ids, sharding)
        else:
            self.mesh = None
            self.cells = jnp.asarray(cells)
            self.cell_ids = jnp.asarray(cell_ids)

    @classmethod
    def from_arrays(cls, centroids, cells, cell_ids, fill,
                    ids: Optional[list] = None, mesh: Optional[Mesh] = None,
                    default_n_probe: int = 8) -> "IVFIndex":
        """Rebuild from persisted arrays — no k-means, no assignment (the
        Retriever reload path). ``cells`` is the (C, L, D) padded cell
        tensor (any float dtype), ``cell_ids`` (C, L) int32 with -1
        padding, ``fill`` (C,) per-cell occupancy."""
        self = cls.__new__(cls)
        self.default_n_probe = default_n_probe
        cells = cells if isinstance(cells, jax.Array) else np.asarray(cells)
        cell_ids = np.asarray(cell_ids, np.int32)
        if cells.ndim != 3 or cell_ids.shape != cells.shape[:2]:
            raise ValueError(
                f"cells {cells.shape} / cell_ids {cell_ids.shape} mismatch")
        self.centroids = jnp.asarray(centroids, jnp.float32)
        self.fill = jnp.asarray(np.asarray(fill, np.int32))
        n = int((cell_ids >= 0).sum())
        self.ids = list(ids) if ids is not None else list(range(n))
        if len(self.ids) != n:
            raise ValueError("ids length mismatch")
        self.spilled = 0
        self._install_cells(jnp.asarray(cells), cell_ids, mesh)
        self.n_docs = n
        self.cell_budget = int(cells.shape[1])
        return self

    def reconstruct_rows(self) -> np.ndarray:
        """→ (n_docs, D) float32 host matrix of the stored (normalized)
        rows in id order — the cells hold the whole corpus, scattered."""
        cells = np.asarray(self.cells, np.float32).reshape(
            -1, self.cells.shape[-1])
        flat_ids = np.asarray(self.cell_ids).reshape(-1)
        out = np.empty((self.n_docs, cells.shape[1]), np.float32)
        valid = flat_ids >= 0
        out[flat_ids[valid]] = cells[valid]
        return out

    def compact(self) -> None:
        """Re-pack the index's device memory after a build that churned HBM.

        The >HBM build path (host-resident corpus, cells-only device
        storage) allocates and frees gigabytes of assignment/scatter
        transients around the near-HBM-sized cell tensor; on a nearly-full
        chip the surviving free space can be fragmented enough that the
        first search's (Q, P·L) score transient fails to allocate even
        though total free HBM suffices (STATUS known-limitation #7,
        observed at 8.4M docs / 9.7 GB of cells on a 16 GB v5e). This
        round-trips the two large tensors through host RAM — freeing their
        device buffers first so the allocator can coalesce the whole arena
        — then re-puts them into the defragmented space. Costs one
        cells-sized host↔device round trip; call it once between build and
        first search when HBM is close to full. Results are unchanged
        (verified by tests): only buffer placement moves."""
        sharding = None
        if self.mesh is not None:
            sharding = NamedSharding(self.mesh, P((DATA_AXIS, MODEL_AXIS)))
        repacked = []
        stage_cap = 1 << 27     # ≤128 MB of device staging per transfer
        for arr in (self.cells, self.cell_ids):
            # download in bounded slices: a whole-tensor np.asarray makes
            # the runtime linearize via a device-side copy of the FULL
            # tensor, which cannot fit beside a near-HBM-sized original
            # (observed: ResourceExhausted at 13.1 GB of cells on 16 GB).
            # Each slice buffer is delete()d immediately — JAX frees
            # asynchronously, and on a ≥95%-full fragmented arena even two
            # live slices can fail to place; halve the step and retry on
            # ResourceExhausted rather than die mid-defrag.
            host = np.empty(arr.shape, arr.dtype)   # ml_dtypes bf16 exact
            row_bytes = max(1, arr.nbytes // max(1, arr.shape[0]))
            step = max(1, stage_cap // row_bytes)
            lo = 0
            attempts = 0
            while lo < arr.shape[0]:
                sl = None
                try:
                    sl = arr[lo:lo + step]
                    host[lo:lo + step] = np.asarray(sl)
                except jax.errors.JaxRuntimeError:
                    # runtimes (observed: the remote TPU server behind the
                    # dev relay) reclaim freed buffers ASYNCHRONOUSLY; on
                    # a ≥95%-full arena right after a build, even a small
                    # staging slice can fail until the build transients'
                    # frees land. Back off and retry — that is compact()'s
                    # whole job — shrinking the slice as a second lever.
                    if sl is not None:
                        sl.delete()
                    attempts += 1
                    if attempts > 20:
                        raise
                    time.sleep(15.0)
                    if attempts % 4 == 0:
                        step = max(1, step // 2)
                    continue
                sl.delete()
                lo += step
            arr.delete()
            repacked.append(host)

        def _put(h):
            for attempt in range(20):
                try:
                    return (jax.device_put(h, sharding)
                            if sharding is not None else jnp.asarray(h))
                except jax.errors.JaxRuntimeError:
                    time.sleep(15.0)    # same deferred-free backoff
            return (jax.device_put(h, sharding) if sharding is not None
                    else jnp.asarray(h))

        self.cells, self.cell_ids = (_put(h) for h in repacked)

    def tune_n_probe(self, queries, k: int = 10,
                     target_recall: float = 0.95,
                     candidates: Optional[List[int]] = None,
                     backend: str = "auto",
                     set_default: bool = True) -> Tuple[int, dict]:
        """Pick the smallest ``n_probe`` meeting a recall target.

        Ground truth is this index's own exhaustive search
        (``n_probe = n_cells`` scans every cell, which is EXACT — the
        cells hold the whole corpus, see :meth:`reconstruct_rows`), so no
        separate exact index or original corpus is needed. Candidates
        default to powers of two up to the cell count; they are probed in
        ascending order and the sweep stops at the first one whose
        recall@k on the given query sample reaches ``target_recall``
        (falling back to the exact full probe when none does).
        ``set_default=True`` installs the winner as ``default_n_probe``
        (the value the Retriever/serving path uses).

        → ``(n_probe, {candidate: recall})`` — the measured curve is
        returned so callers can log the recall/cost trade-off they chose.
        """
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
                # a silently-empty sweep would install the exhaustive full
                # probe — the O(N·D) scan IVF exists to avoid
                raise ValueError(
                    f"no candidates in [1, {n_cells}) after filtering "
                    f"{given!r}; pass n_probe values below the cell count")
        k = min(k, self.n_docs)
        q = np.asarray(queries, np.float32)
        if q.ndim != 2 or q.shape[0] == 0:
            raise ValueError(
                f"queries must be a non-empty (Q, D) sample, got {q.shape}")
        _, truth = self.search(q, k=k, n_probe=n_cells, backend=backend)
        truth_sets = [set(i for i in row if i is not None) for row in truth]

        curve: dict = {}
        best = n_cells
        for p in candidates:
            _, got = self.search(q, k=k, n_probe=p, backend=backend)
            recall = float(np.mean([
                len(t & {i for i in row if i is not None}) / max(len(t), 1)
                for t, row in zip(truth_sets, got)]))
            curve[p] = recall
            if recall >= target_recall:
                best = p
                break
        if best == n_cells:   # nothing met the target: exact full probe
            curve[n_cells] = 1.0
            import warnings

            warnings.warn(
                f"tune_n_probe: no candidate in {candidates} reached "
                f"recall@{k} >= {target_recall}; "
                + ("installing" if set_default else "returning")
                + f" the exhaustive full probe (n_probe={n_cells}), which "
                "scans every cell — widen the candidate list or lower "
                "target_recall", stacklevel=2)
        if set_default:
            self.default_n_probe = best
        return best, curve

    def search_ids(self, queries, k: int = 10, score: str = "cos_sim",
                   n_probe: Optional[int] = None):
        """→ (scores, external-id lists). Cells store normalized rows, so
        cos ≡ dot; euclid is rejected (same contract as the quantized
        indexes)."""
        if score not in ("cos_sim", "dot_score"):
            raise ValueError("IVF index supports cos_sim/dot_score only "
                             "(cells store normalized rows)")
        return self.search(queries, k=k,
                           n_probe=n_probe or self.default_n_probe)

    def _device_search_retriever(self, q, k: int, score: str = "cos_sim",
                                 tile: int = 0, backend: str = "auto"):
        """The Retriever streaming contract (same positional shape as
        ``ExactIndex._device_search``): one dispatched search at the
        index's default_n_probe, device arrays returned."""
        if score not in ("cos_sim", "dot_score"):
            raise ValueError("IVF index supports cos_sim/dot_score only "
                             "(cells store normalized rows)")
        return self._device_search(jnp.asarray(q, jnp.float32),
                                   min(k, self.n_docs),
                                   self.default_n_probe, backend)

    def _pallas_eligible(self) -> bool:
        return (self.cell_budget % 128 == 0
                and jax.devices()[0].platform != "cpu")

    def _device_search(self, q, k: int, n_probe: int,
                       backend: str = "auto"):
        if backend not in ("auto", "pallas", "xla"):
            raise ValueError(f"unknown backend {backend!r}")
        use_pallas = (backend == "pallas"
                      or (backend == "auto" and self._pallas_eligible()))
        if use_pallas:
            interpret = jax.devices()[0].platform == "cpu"
            if self.mesh is not None:
                key = ("pallas", k, n_probe, interpret, "sharded")
                if key not in self._sharded_fns:
                    self._sharded_fns[key] = _sharded_ivf_pallas_fn(
                        self.mesh, k, n_probe, self.cells_per_shard,
                        self.cell_budget, interpret)
                return self._sharded_fns[key](q, self.centroids, self.cells,
                                              self.cell_ids, self.fill)
            key = ("pallas", k, n_probe, interpret)
            if key not in self._sharded_fns:
                self._sharded_fns[key] = _ivf_pallas_search_fn(
                    k, n_probe, interpret)
            return self._sharded_fns[key](q, self.centroids, self.cells,
                                          self.cell_ids, self.fill)
        if self.mesh is not None:
            key = (n_probe, k)
            if key not in self._sharded_fns:
                self._sharded_fns[key] = _sharded_ivf_search_fn(
                    self.mesh, n_probe, k, self.cells_per_shard,
                    self.cell_budget)
            return self._sharded_fns[key](q, self.centroids, self.cells,
                                          self.cell_ids)
        return _ivf_search(q, self.centroids, self.cells, self.cell_ids,
                           n_probe, k)

    GATHER_BUDGET_BYTES = 1 << 30  # bounds the XLA (Q, L, D) probe gather
    SCORES_BUDGET_BYTES = 1 << 29  # bounds the Pallas (Q, P·L) f32 scores

    def _q_chunk(self, backend: str, n_probe: int) -> int:
        """Per-dispatch query chunk. The XLA path materializes a (Q, L, D)
        probe gather → bound by GATHER_BUDGET; the Pallas scorer only
        materializes the (Q, P·L) f32 scores → a far larger chunk (each
        dispatch costs a full host round-trip, so over-chunking is the
        dominant loss at serving batch sizes)."""
        use_pallas = (backend == "pallas"
                      or (backend == "auto" and self._pallas_eligible()))
        if use_pallas:
            row = n_probe * self.cell_budget * 4
            return max(8, min(8192, self.SCORES_BUDGET_BYTES // row))
        row = self.cell_budget * self.cells.shape[-1] * self.cells.dtype.itemsize
        return max(8, min(1024, self.GATHER_BUDGET_BYTES // row))

    def search(self, queries, k: int = 10, n_probe: int = 8,
               backend: str = "auto") -> Tuple[np.ndarray, List[list]]:
        """backend: "auto" picks the dynamic-DMA Pallas cell scorer
        (ops/ivf_pallas.py) on TPU for single-device indexes — the XLA
        probe gather runs at single-digit % of HBM bandwidth; "pallas" /
        "xla" force one (pallas runs interpreted on CPU)."""
        n_probe = min(n_probe, self.centroids.shape[0])
        q = jnp.asarray(queries, jnp.float32)
        chunk = self._q_chunk(backend, n_probe)
        from qst_tpu.retrieval.index import fetch_pair
        outs = [self._device_search(q[lo:lo + chunk], k, n_probe, backend)
                for lo in range(0, q.shape[0], chunk)]
        pairs = [fetch_pair(*o) for o in outs]
        s = np.concatenate([p[0] for p in pairs])
        i = np.concatenate([p[1] for p in pairs])
        ids = [[self.ids[j] if j >= 0 else None for j in row] for row in i]
        return s, ids

    def search_stream(self, query_batches, k: int = 10, n_probe: int = 8,
                      depth: int = 4, backend: str = "auto"):
        """Pipelined serving loop over batches of queries: yields one
        ``(scores, ids)`` pair per batch in input order, keeping up to
        ``depth`` searches in flight (same dispatch pattern as
        ``ExactIndex.search_stream`` — the device round trip of batch N
        overlaps the compute of the next batches)."""
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        n_probe = min(n_probe, self.centroids.shape[0])
        from qst_tpu.retrieval.index import _pack_pair, _unpack_host

        def finish(packed):
            s, i = _unpack_host(np.asarray(packed))
            ids = [[self.ids[j] if j >= 0 else None for j in row]
                   for row in i]
            return s, ids

        pending: List = []
        for q in query_batches:
            pending.append(_pack_pair(*self._device_search(
                jnp.asarray(q, jnp.float32), k, n_probe, backend)))
            if len(pending) >= depth:
                yield finish(pending.pop(0))
        while pending:
            yield finish(pending.pop(0))
