"""IVF (inverted-file) approximate index — beyond-reference capability.

Exact search is O(N·D) per query; at very large corpora an IVF index trades
a little recall for a large constant-factor win: k-means partitions the
corpus into ``n_clusters`` cells, and a query only scores documents in its
``n_probe`` closest cells.

TPU-first formulation: k-means runs as jitted Lloyd iterations (assignment =
one cosine matmul + argmax on the MXU; centroid update = one segment-sum
matmul), and search is TWO dense top-k problems (query×centroids, then
query×candidates gathered at a fixed per-cell budget) — no host-side
inverted lists in the hot path, all static shapes.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qst_tpu.ops.distances import l2_normalize


@functools.partial(jax.jit, static_argnames=("n_clusters", "n_iters"))
def kmeans(data: jax.Array, key: jax.Array, n_clusters: int,
           n_iters: int = 10) -> Tuple[jax.Array, jax.Array]:
    """Spherical k-means (cosine): → (centroids (C, D), assignment (N,))."""
    n = data.shape[0]
    x = l2_normalize(data.astype(jnp.float32))
    init_idx = jax.random.choice(key, n, (n_clusters,), replace=False)
    centroids = x[init_idx]

    def step(centroids, _):
        sim = jnp.dot(x, centroids.T, preferred_element_type=jnp.float32)
        assign = jnp.argmax(sim, axis=1)                    # (N,)
        onehot = jax.nn.one_hot(assign, n_clusters, dtype=jnp.float32)
        sums = jnp.dot(onehot.T, x, preferred_element_type=jnp.float32)
        counts = onehot.sum(axis=0)[:, None]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), centroids)
        return l2_normalize(new), None

    centroids, _ = jax.lax.scan(step, centroids, None, length=n_iters)
    assign = jnp.argmax(
        jnp.dot(x, centroids.T, preferred_element_type=jnp.float32), axis=1)
    return centroids, assign


@functools.partial(jax.jit, static_argnames=("n_probe", "k"))
def _ivf_search(queries, centroids, cells, cell_ids, n_probe, k):
    """queries (Q, D); cells (C, L, D) padded per-cell doc matrix;
    cell_ids (C, L) global doc ids (-1 = padding)."""
    q = l2_normalize(queries.astype(jnp.float32))
    csim = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(csim, n_probe)                 # (Q, P)
    cand = cells[probe]                                     # (Q, P, L, D)
    cand_ids = cell_ids[probe]                              # (Q, P, L)
    Q, P, L, D = cand.shape
    cand = cand.reshape(Q, P * L, D)
    cand_ids = cand_ids.reshape(Q, P * L)
    scores = jnp.einsum("qd,qmd->qm", q, cand,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(cand_ids >= 0, scores, -jnp.inf)
    kk = min(k, P * L)
    top_s, pos = jax.lax.top_k(scores, kk)
    top_i = jnp.take_along_axis(cand_ids, pos, axis=1)
    return top_s, top_i


class IVFIndex:
    """Approximate cosine index: k-means cells + n_probe search.

    Cells are stored as a fixed (C, L, D) padded tensor (L = per-cell budget,
    95th-percentile cell size by default); overflowing docs spill into their
    next-best cell so nothing is dropped.
    """

    def __init__(self, embeddings, n_clusters: int = 256,
                 ids: Optional[list] = None, n_iters: int = 10,
                 cell_budget: Optional[int] = None, seed: int = 0):
        emb = np.asarray(embeddings, np.float32)
        n, d = emb.shape
        if n_clusters >= n:
            raise ValueError("n_clusters must be < number of docs")
        self.ids = list(ids) if ids is not None else list(range(n))
        if len(self.ids) != n:
            raise ValueError("ids length mismatch")

        emb_n = np.asarray(l2_normalize(jnp.asarray(emb)))
        centroids, assign = kmeans(jnp.asarray(emb_n), jax.random.key(seed),
                                   n_clusters, n_iters)
        self.centroids = centroids
        assign = np.asarray(assign)

        counts = np.bincount(assign, minlength=n_clusters)
        if cell_budget is None:
            cell_budget = max(8, int(np.quantile(counts[counts > 0], 0.95)))
        L = cell_budget

        # fill cells; spill overflow to next-best cells
        sim = emb_n @ np.asarray(centroids).T               # (N, C)
        order = np.argsort(-sim, axis=1)
        cells = np.zeros((n_clusters, L, d), np.float32)
        cell_ids = np.full((n_clusters, L), -1, np.int64)
        fill = np.zeros(n_clusters, np.int32)
        spilled = 0
        for doc in range(n):
            placed = False
            for c in order[doc]:
                if fill[c] < L:
                    cells[c, fill[c]] = emb_n[doc]
                    cell_ids[c, fill[c]] = doc
                    fill[c] += 1
                    placed = bool(c == assign[doc])
                    if not placed:
                        spilled += 1
                    placed = True
                    break
            if not placed:  # pragma: no cover - budget too small everywhere
                raise RuntimeError("cell budget exhausted; raise cell_budget")
        self.spilled = spilled
        self.cells = jnp.asarray(cells)
        self.cell_ids = jnp.asarray(cell_ids)
        self.n_docs = n

    def search(self, queries, k: int = 10, n_probe: int = 8
               ) -> Tuple[np.ndarray, List[list]]:
        n_probe = min(n_probe, self.centroids.shape[0])
        s, i = _ivf_search(jnp.asarray(queries, jnp.float32), self.centroids,
                           self.cells, self.cell_ids, n_probe, k)
        s, i = np.asarray(s), np.asarray(i)
        ids = [[self.ids[j] if j >= 0 else None for j in row] for row in i]
        return s, ids

    def search_stream(self, query_batches, k: int = 10, n_probe: int = 8,
                      depth: int = 4):
        """Pipelined serving loop over batches of queries: yields one
        ``(scores, ids)`` pair per batch in input order, keeping up to
        ``depth`` searches in flight (same dispatch pattern as
        ``ExactIndex.search_stream`` — the device round trip of batch N
        overlaps the compute of the next batches)."""
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        n_probe = min(n_probe, self.centroids.shape[0])

        def finish(pair):
            s, i = np.asarray(pair[0]), np.asarray(pair[1])
            ids = [[self.ids[j] if j >= 0 else None for j in row]
                   for row in i]
            return s, ids

        pending: List = []
        for q in query_batches:
            pending.append(_ivf_search(
                jnp.asarray(q, jnp.float32), self.centroids, self.cells,
                self.cell_ids, n_probe, k))
            if len(pending) >= depth:
                yield finish(pending.pop(0))
        while pending:
            yield finish(pending.pop(0))
