"""Mutable exact index for serving: add/remove documents without recompiles.

Production corpora change; the static ``ExactIndex`` would recompile per
size. ``UpdatableIndex`` keeps a fixed-capacity device buffer (one compiled
search program) with a dynamic valid-count: adds are ``dynamic_update_slice``
writes, removes are O(1) swap-with-last, and search masks slots ≥ count.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qst_tpu.ops.distances import l2_normalize


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_rows(buffer: jax.Array, rows: jax.Array, start: jax.Array):
    return jax.lax.dynamic_update_slice(buffer, rows, (start, 0))


@functools.partial(jax.jit, donate_argnums=(0,))
def _move_row(buffer: jax.Array, src: jax.Array, dst: jax.Array):
    row = jax.lax.dynamic_slice(buffer, (src, 0), (1, buffer.shape[1]))
    return jax.lax.dynamic_update_slice(buffer, row, (dst, 0))


@functools.partial(jax.jit, static_argnames=("k",))
def _masked_search(queries, buffer, n_valid, k):
    """Dot-product top-k over the first ``n_valid`` rows (dynamic count,
    static shapes). Buffer rows are pre-normalized for cosine semantics."""
    q = l2_normalize(queries.astype(jnp.float32))
    s = jnp.dot(q, buffer.T, preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_valid, s, -jnp.inf)
    return jax.lax.top_k(s, k)


class UpdatableIndex:
    def __init__(self, dim: int, capacity: int = 65536):
        if capacity < 1 or dim < 1:
            raise ValueError("dim and capacity must be >= 1")
        self.dim = dim
        self.capacity = capacity
        self._buffer = jnp.zeros((capacity, dim), jnp.float32)
        self._ids: List = []
        self._pos: Dict = {}

    def __len__(self) -> int:
        return len(self._ids)

    def add(self, embeddings, ids: Sequence) -> None:
        emb = np.asarray(embeddings, np.float32)
        if emb.ndim != 2 or emb.shape[1] != self.dim:
            raise ValueError(f"expected (N, {self.dim}) embeddings")
        if len(ids) != emb.shape[0]:
            raise ValueError("ids length mismatch")
        dupes = [i for i in ids if i in self._pos]
        if dupes:
            raise KeyError(f"ids already present: {dupes[:5]}")
        if len(self._ids) + len(ids) > self.capacity:
            raise RuntimeError(
                f"capacity {self.capacity} exceeded "
                f"({len(self._ids)} + {len(ids)})")
        start = len(self._ids)
        rows = np.asarray(l2_normalize(jnp.asarray(emb)))
        self._buffer = _write_rows(self._buffer, jnp.asarray(rows),
                                   jnp.int32(start))
        for j, i in enumerate(ids):
            self._pos[i] = start + j
            self._ids.append(i)

    def remove(self, ids: Sequence) -> None:
        for i in ids:
            if i not in self._pos:
                raise KeyError(f"unknown id: {i!r}")
            pos = self._pos.pop(i)
            last = len(self._ids) - 1
            last_id = self._ids[last]
            if pos != last:  # swap-with-last, O(1)
                self._buffer = _move_row(self._buffer, jnp.int32(last),
                                         jnp.int32(pos))
                self._ids[pos] = last_id
                self._pos[last_id] = pos
            self._ids.pop()

    def search(self, queries, k: int = 10) -> Tuple[np.ndarray, List[list]]:
        """→ (scores (Q, k'), per-query id lists), k' = min(k, len(self))."""
        if not self._ids:
            raise RuntimeError("index is empty")
        k = min(k, len(self._ids))
        s, i = _masked_search(jnp.asarray(queries, jnp.float32),
                              self._buffer, jnp.int32(len(self._ids)), k)
        s, i = np.asarray(s), np.asarray(i)
        ids = [[self._ids[j] for j in row] for row in i]
        return s, ids
