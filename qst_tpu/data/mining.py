"""Negative mining — batched and device-resident.

The reference mines negatives *inside* ``__getitem__`` with a per-item SBERT
encode (reference quadruplet_dataset.py:229-234) — model inference in the
input pipeline, its biggest architectural liability (SURVEY.md §3.4). Here
mining is a batched device operation over an embedding table:

- ``mine_negatives``: one cosine matmul (B, N) on the MXU + masked selection,
  preserving the reference's semantics — candidates with cos ≤ threshold are
  valid (quadruplet_dataset.py:233-239), selection is either uniform-random
  among valid candidates or hard-contrastive top-k (largest cos among valid,
  quadruplet_dataset.py:31-47,242-253), with replicate-if-short fallback
  (quadruplet_dataset.py:266-268).
- ``EmbeddingTable``: a device-resident caption-pool embedding matrix
  refreshed every N steps by batched encode.

Random selection among valid candidates uses the Gumbel-top-k trick so the
whole operation stays inside one jit with static shapes.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from qst_tpu.core.config import NEGATIVE_SIM_THRESHOLD
from qst_tpu.ops.distances import l2_normalize

# Mining modes (reference quadruplet_dataset.py:17-19).
HARD_CONTRASTIVE_TRAIN = 1
HARD_CONTRASTIVE_TEST = 0
RANDOM = -1


@functools.partial(jax.jit, static_argnames=("n_neg", "hard"))
def mine_negatives(
    anchor_emb: jax.Array,      # (B, D)
    table_emb: jax.Array,       # (N, D) candidate-pool embeddings
    key: jax.Array,
    n_neg: int,
    hard: bool,
    threshold: float = NEGATIVE_SIM_THRESHOLD,
    forbidden: Optional[jax.Array] = None,  # (B, N) bool: True = exclude
) -> tuple[jax.Array, jax.Array]:
    """→ (indices (B, n_neg) into the table, validity mask (B, n_neg)).

    Valid candidates have cos(anchor, cand) ≤ threshold and are not
    forbidden. Hard mode picks the valid candidates with the LARGEST cosine
    (hardest negatives); random mode picks uniformly among valid. If fewer
    than ``n_neg`` are valid, the least-invalid candidates fill the rest and
    the mask marks them (host replicates valid picks instead — the
    reference's replicate-if-short fallback).
    """
    a = l2_normalize(anchor_emb.astype(jnp.float32))
    t = l2_normalize(table_emb.astype(jnp.float32))
    cos = jnp.dot(a, t.T, preferred_element_type=jnp.float32)  # (B, N)
    valid = cos <= threshold
    if forbidden is not None:
        valid = valid & ~forbidden

    if hard:
        # hardest = largest cos among valid; push invalid to -inf
        scores = jnp.where(valid, cos, -jnp.inf)
    else:
        gumbel = jax.random.gumbel(key, cos.shape, dtype=jnp.float32)
        scores = jnp.where(valid, gumbel, -jnp.inf)

    k = min(n_neg, table_emb.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    ok = jnp.isfinite(top_scores)
    if k < n_neg:  # tiny pool: pad; host replicate_short fills from valid
        pad = n_neg - k
        top_idx = jnp.concatenate(
            [top_idx, jnp.repeat(top_idx[:, :1], pad, axis=1)], axis=1)
        ok = jnp.concatenate(
            [ok, jnp.zeros((ok.shape[0], pad), bool)], axis=1)
    return top_idx, ok


def replicate_short(indices: np.ndarray, ok: np.ndarray,
                    rng: np.random.Generator) -> np.ndarray:
    """Host fallback mirroring reference quadruplet_dataset.py:266-268:
    rows with < n valid picks repeat their valid picks; rows with none keep
    the (least-bad) device picks."""
    out = indices.copy()
    for i in range(out.shape[0]):
        good = indices[i][ok[i]]
        if 0 < len(good) < out.shape[1]:
            bad_slots = np.where(~ok[i])[0]
            out[i, bad_slots] = rng.choice(good, size=len(bad_slots))
    return out


class EmbeddingTable:
    """Device-resident caption-pool embeddings with periodic refresh.

    ``refresh`` re-encodes the pool with the CURRENT model parameters so
    hard-negative difficulty tracks training (the reference's per-item
    mining always used the frozen SBERT singleton; refreshing is strictly
    stronger and is the idiomatic TPU design — one big batched encode every
    ``refresh_steps`` instead of tiny encodes every sample).
    """

    def __init__(self, captions: Sequence[str],
                 encode_fn: Callable[[Sequence[str]], np.ndarray],
                 refresh_steps: int = 500,
                 max_pool: int = 100_000,
                 rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng(0)
        captions = list(captions)
        if len(captions) > max_pool:
            sel = rng.choice(len(captions), size=max_pool, replace=False)
            captions = [captions[i] for i in sel]
        if not captions:
            raise ValueError("empty caption pool")
        self.captions: List[str] = captions
        self.encode_fn = encode_fn
        self.refresh_steps = refresh_steps
        self._emb: Optional[jax.Array] = None
        self._last_refresh = -1

    @property
    def embeddings(self) -> jax.Array:
        if self._emb is None:
            self.refresh(step=0)
        assert self._emb is not None
        return self._emb

    def maybe_refresh(self, step: int) -> None:
        if self._emb is None or step - self._last_refresh >= self.refresh_steps:
            self.refresh(step)

    def refresh(self, step: int) -> None:
        self._emb = jnp.asarray(self.encode_fn(self.captions))
        self._last_refresh = step

    def lookup(self, indices: np.ndarray) -> List[List[str]]:
        return [[self.captions[int(j)] for j in row] for row in indices]


class NegativeMiner:
    """End-to-end batched miner: anchors (text) → negative captions.

    Combines the embedding table, the jitted selection kernel, retry
    semantics, and the replicate-if-short host fallback.

    Retry semantics match the reference (quadruplet_dataset.py:199-239):
    each attempt draws a FRESH random candidate sub-pool (the reference
    samples a new random chunk and ≤5·n candidate captions per attempt), so
    a row whose attempt-1 pool had zero valid candidates can succeed on
    attempt 2 against different candidates — ``max_attempts`` observably
    changes outcomes in both random and hard-contrastive mode. Mining over
    the full table in one shot would make retries a no-op: validity
    (cos ≤ threshold) is deterministic given a fixed pool.
    """

    def __init__(self, table: EmbeddingTable,
                 encode_fn: Callable[[Sequence[str]], np.ndarray],
                 mode: int = RANDOM,
                 threshold: float = NEGATIVE_SIM_THRESHOLD,
                 max_attempts: int = 3,
                 pool_factor: int = 5,
                 seed: int = 14):
        if pool_factor < 1:
            raise ValueError(f"pool_factor must be >= 1, got {pool_factor}")
        self.table = table
        self.encode_fn = encode_fn
        self.mode = mode
        self.threshold = threshold
        self.max_attempts = max_attempts
        # Reference draws <= 5*n candidates per attempt
        # (quadruplet_dataset.py:213-225); pool size = pool_factor * n_neg.
        self.pool_factor = pool_factor
        self._key = jax.random.key(seed)
        self._rng = np.random.default_rng(seed)
        self._calls = 0

    def mine(self, anchors: Sequence[str], n_neg: int, step: int = 0,
             anchor_emb: Optional[np.ndarray] = None) -> List[List[str]]:
        self.table.maybe_refresh(step)
        if anchor_emb is None:
            anchor_emb = self.encode_fn(list(anchors))
        a = jnp.asarray(anchor_emb)
        hard = self.mode in (HARD_CONTRASTIVE_TRAIN, HARD_CONTRASTIVE_TEST)
        n_table = len(self.table.captions)
        pool_size = min(n_table, self.pool_factor * n_neg)
        idx = ok = None
        for _ in range(max(1, self.max_attempts)):
            self._calls += 1
            key = jax.random.fold_in(self._key, self._calls)
            # Fresh candidate sub-pool per attempt (one shared pool for the
            # batch — the batched analogue of the reference's fresh random
            # chunk per item per attempt).
            sub = self._rng.choice(n_table, size=pool_size, replace=False)
            sub_emb = jnp.take(self.table.embeddings, jnp.asarray(sub),
                               axis=0)
            idx_j, ok_j = mine_negatives(
                a, sub_emb, key, n_neg, hard, threshold=self.threshold)
            idx_np = sub[np.array(idx_j)]  # map sub-pool → table indices
            ok_np = np.array(ok_j)         # (writable host copies)
            if idx is None:
                idx, ok = idx_np, ok_np
            else:  # keep previous rows that were already fully valid
                need = ~ok.all(axis=1)
                idx[need], ok[need] = idx_np[need], ok_np[need]
            if ok.all():
                break
        assert idx is not None and ok is not None
        idx = replicate_short(idx, ok, self._rng)
        return self.table.lookup(idx)
