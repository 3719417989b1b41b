"""Exact-kNN retrieval engine.

TPU-native replacement for the exact-search loop inside sentence-transformers'
``InformationRetrievalEvaluator`` (driven from reference
ir_evauation_script.py:107-131: encode queries, then per 50k-doc corpus chunk
score + running top-k). Here:

- ``exact_topk``: a jitted ``lax.scan`` over corpus tiles with an on-device
  running top-k merge — the whole search is one XLA program, scores ride the
  MXU, no host round-trips per chunk;
- ``ShardedIndex``: the corpus matrix lives HBM-resident, sharded over ALL
  mesh devices on the doc axis (ICI-sharded index); search runs under
  ``shard_map`` — per-shard top-k, ``all_gather`` of the k·n_devices
  candidates over ICI, global re-rank merge (SURVEY.md §2.2 north-star
  design).

All score functions are "larger is better" (cos / dot / 1/(1+euclid)).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qst_tpu.core.meshes import DATA_AXIS, MODEL_AXIS
from qst_tpu.ops.distances import SCORE_FUNCTIONS, l2_normalize


def _pad_rows(x: jax.Array, multiple: int) -> Tuple[jax.Array, int]:
    n = x.shape[0]
    padded = ((n + multiple - 1) // multiple) * multiple
    if padded != n:
        x = jnp.pad(x, ((0, padded - n), (0, 0)))
    return x, n


@functools.partial(jax.jit, static_argnames=("k", "score", "tile"))
def exact_topk(
    queries: jax.Array,   # (Q, D)
    corpus: jax.Array,    # (N, D)
    k: int,
    score: str = "cos_sim",
    tile: int = 8192,
) -> Tuple[jax.Array, jax.Array]:
    """→ (scores (Q, k), indices (Q, k)) of the top-k corpus rows per query."""
    score_fn = SCORE_FUNCTIONS[score]
    n = corpus.shape[0]
    k = min(k, n)
    if n <= tile:
        s = score_fn(queries, corpus)
        return jax.lax.top_k(s, k)

    corpus_p, n_real = _pad_rows(corpus, tile)
    n_tiles = corpus_p.shape[0] // tile
    tiles = corpus_p.reshape(n_tiles, tile, corpus.shape[1])
    Q = queries.shape[0]

    init = (
        jnp.full((Q, k), -jnp.inf, jnp.float32),
        jnp.full((Q, k), -1, jnp.int32),
    )

    def body(carry, inputs):
        best_s, best_i = carry
        tile_data, tile_idx = inputs
        s = score_fn(queries, tile_data)  # (Q, tile)
        base = tile_idx * tile
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + base
        s = jnp.where(col < n_real, s, -jnp.inf)  # mask padded rows
        s1, i1 = jax.lax.top_k(s, k)
        cat_s = jnp.concatenate([best_s, s1], axis=1)
        cat_i = jnp.concatenate([best_i, i1 + base], axis=1)
        s2, pos = jax.lax.top_k(cat_s, k)
        i2 = jnp.take_along_axis(cat_i, pos, axis=1)
        return (s2, i2), None

    (best_s, best_i), _ = jax.lax.scan(
        body, init, (tiles, jnp.arange(n_tiles, dtype=jnp.int32)))
    return best_s, best_i


def _sharded_search_fn(mesh: Mesh, k: int, score: str, shard_rows: int):
    """Build the shard_map search: replicated queries, doc-sharded corpus →
    replicated global top-k."""
    score_fn = SCORE_FUNCTIONS[score]
    axes = (DATA_AXIS, MODEL_AXIS)

    def shard_search(q, c_shard, n_real):
        # flattened linear shard id over both axes
        di = jax.lax.axis_index(DATA_AXIS)
        mi = jax.lax.axis_index(MODEL_AXIS)
        shard_id = di * jax.lax.axis_size(MODEL_AXIS) + mi
        base = shard_id * shard_rows
        s = score_fn(q, c_shard)  # (Q, shard_rows)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + base
        s = jnp.where(col < n_real[0], s, -jnp.inf)
        s1, i1 = jax.lax.top_k(s, k)          # per-shard candidates
        i1 = i1 + base
        # gather candidates from every shard over ICI, then global re-rank
        all_s = jax.lax.all_gather(s1, axes, axis=1, tiled=True)  # (Q, k·n)
        all_i = jax.lax.all_gather(i1, axes, axis=1, tiled=True)
        s2, pos = jax.lax.top_k(all_s, k)
        i2 = jnp.take_along_axis(all_i, pos, axis=1)
        return s2, i2

    return jax.jit(
        jax.shard_map(
            shard_search,
            mesh=mesh,
            in_specs=(P(), P(axes), P()),
            out_specs=(P(), P()),
            # outputs ARE replicated (identical all_gather+top_k on every
            # shard) but the varying-axes checker can't prove it
            check_vma=False,
        )
    )


class ExactIndex:
    """Single-host exact index over an embedding matrix (optionally sharded
    over a mesh). Use :meth:`search` for top-k ids + scores."""

    def __init__(self, embeddings, ids: Optional[list] = None,
                 mesh: Optional[Mesh] = None, normalize: bool = False):
        emb = jnp.asarray(embeddings, dtype=jnp.float32)
        if emb.ndim != 2 or emb.shape[0] == 0:
            raise ValueError(f"embeddings must be (N, D), got {emb.shape}")
        if normalize:
            emb = l2_normalize(emb)
        self.n_docs = emb.shape[0]
        self.dim = emb.shape[1]
        self.ids = list(ids) if ids is not None else list(range(self.n_docs))
        if len(self.ids) != self.n_docs:
            raise ValueError("ids length mismatch")
        self.mesh = mesh
        self._search_fns = {}
        if mesh is not None and np.prod(list(mesh.shape.values())) > 1:
            n_dev = int(np.prod(list(mesh.shape.values())))
            self.shard_rows = ((self.n_docs + n_dev - 1) // n_dev)
            padded = self.shard_rows * n_dev
            if padded != self.n_docs:
                emb = jnp.pad(emb, ((0, padded - self.n_docs), (0, 0)))
            sharding = NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS)))
            self.embeddings = jax.device_put(emb, sharding)
        else:
            self.mesh = None
            self.embeddings = emb

    def search(self, queries, k: int = 10, score: str = "cos_sim",
               tile: int = 8192) -> Tuple[np.ndarray, np.ndarray]:
        """→ (scores (Q, k), indices (Q, k)) as numpy. k is clamped to N."""
        if score not in SCORE_FUNCTIONS:
            raise ValueError(
                f"unknown score {score!r}; choices: {sorted(SCORE_FUNCTIONS)}")
        q = jnp.asarray(queries, dtype=jnp.float32)
        k = min(k, self.n_docs)
        if self.mesh is not None:
            key = (k, score)
            if key not in self._search_fns:
                self._search_fns[key] = _sharded_search_fn(
                    self.mesh, k, score, self.shard_rows)
            n_real = jnp.full((1,), self.n_docs, jnp.int32)
            s, i = self._search_fns[key](q, self.embeddings, n_real)
        else:
            s, i = exact_topk(q, self.embeddings, k, score, tile)
        return np.asarray(s), np.asarray(i)

    def search_ids(self, queries, k: int = 10, score: str = "cos_sim"):
        """→ (scores, doc-id lists) using the external ids."""
        s, i = self.search(queries, k, score)
        ids = [[self.ids[j] for j in row] for row in i]
        return s, ids
