"""Mutable exact index for serving: add/remove documents without recompiles.

Production corpora change; the static ``ExactIndex`` would recompile per
size. ``UpdatableIndex`` keeps a fixed-capacity device buffer (one compiled
search program) with a dynamic valid-count: adds are ``dynamic_update_slice``
writes, removes are O(1) swap-with-last, and search masks slots ≥ count.

Concurrency: the whole index state (buffer, id tuple, id→pos map) lives in
ONE attribute swapped atomically under the GIL, and the update kernels do
NOT donate their input buffer — an in-flight search that snapshotted the
previous state keeps valid arrays and a consistent id mapping while an
add/remove publishes the next state (the ``RetrievalServer``'s batched
searches run on collector threads concurrent with ``POST/DELETE /docs``).
Updates themselves are NOT thread-safe against each other — serialize
writers (the HTTP server funnels them through one lock).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qst_tpu.ops.distances import l2_normalize


@jax.jit
def _write_rows(buffer: jax.Array, rows: jax.Array, start: jax.Array):
    # no donation: concurrent searches may still hold the previous buffer
    return jax.lax.dynamic_update_slice(buffer, rows, (start, 0))


@jax.jit
def _permute_rows(buffer: jax.Array, perm: jax.Array):
    # one full-buffer gather applies ALL of a remove()'s swap-with-last
    # moves at once (per-id dynamic_update_slice copies would each stream
    # the whole buffer; with a multi-GB serving buffer that made a batch
    # delete O(R × capacity) of HBM traffic)
    return jnp.take(buffer, perm, axis=0)


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
        # (buffer, ids tuple, id->pos dict) — replaced wholesale per update
        self._state: Tuple[jax.Array, tuple, Dict] = (
            jnp.zeros((capacity, dim), jnp.float32), (), {})

    def __len__(self) -> int:
        return len(self._state[1])

    @property
    def n_docs(self) -> int:
        """Current live document count (the serving /healthz figure)."""
        return len(self._state[1])

    @property
    def _buffer(self) -> jax.Array:  # kept for introspection/tests
        return self._state[0]

    @property
    def ids(self) -> tuple:
        return self._state[1]

    def add(self, embeddings, ids: Sequence) -> None:
        buffer, cur_ids, pos = self._state
        emb = np.asarray(embeddings, np.float32)
        if emb.ndim != 2 or emb.shape[1] != self.dim:
            raise ValueError(f"expected (N, {self.dim}) embeddings")
        if len(ids) != emb.shape[0]:
            raise ValueError("ids length mismatch")
        dupes = [i for i in ids if i in pos]
        if dupes:
            raise KeyError(f"ids already present: {dupes[:5]}")
        if len(set(ids)) != len(ids):
            raise KeyError("duplicate ids within one add")
        if len(cur_ids) + len(ids) > self.capacity:
            raise RuntimeError(
                f"capacity {self.capacity} exceeded "
                f"({len(cur_ids)} + {len(ids)})")
        start = len(cur_ids)
        rows = l2_normalize(jnp.asarray(emb))
        new_buffer = _write_rows(buffer, rows, jnp.int32(start))
        new_pos = dict(pos)
        for j, i in enumerate(ids):
            new_pos[i] = start + j
        self._state = (new_buffer, cur_ids + tuple(ids), new_pos)

    def remove(self, ids: Sequence) -> None:
        buffer, cur_ids, pos = self._state
        id_list: List = list(cur_ids)
        new_pos = dict(pos)
        # simulate every swap-with-last on the host id list first …
        for i in ids:
            if i not in new_pos:
                raise KeyError(f"unknown id: {i!r}")
            p = new_pos.pop(i)
            last = len(id_list) - 1
            last_id = id_list[last]
            if p != last:
                id_list[p] = last_id
                new_pos[last_id] = p
            id_list.pop()
        # … then apply all row moves as ONE device gather: slot p must end
        # up holding the row of the id that now lives there (identity for
        # untouched slots; old positions come from the pre-remove map)
        perm = np.arange(self.capacity, dtype=np.int32)
        for p, i in enumerate(id_list):
            old_p = pos[i]
            if old_p != p:
                perm[p] = old_p
        new_buffer = (buffer if (perm == np.arange(self.capacity)).all()
                      else _permute_rows(buffer, jnp.asarray(perm)))
        self._state = (new_buffer, tuple(id_list), new_pos)

    def search(self, queries, k: int = 10) -> Tuple[np.ndarray, List[list]]:
        """→ (scores (Q, k'), per-query id lists), k' = min(k, len(self))."""
        from qst_tpu.retrieval.index import _pack_pair, _unpack_host

        buffer, cur_ids, _ = self._state    # one consistent snapshot
        if not cur_ids:
            raise RuntimeError("index is empty")
        k = min(k, len(cur_ids))
        packed = _pack_pair(*_masked_search(
            jnp.asarray(queries, jnp.float32), buffer,
            jnp.int32(len(cur_ids)), k))
        # one packed host transfer (scores bitcast alongside ids) — same
        # fetch_pair fix as every other search path
        s, i = _unpack_host(np.asarray(packed))
        ids = [[cur_ids[j] for j in row] for row in i]
        return s, ids
