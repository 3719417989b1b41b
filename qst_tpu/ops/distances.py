"""Distance / similarity ops (jnp reference implementations).

Semantics match the functions the reference consumes from torch /
sentence-transformers:

- ``pairwise_distance`` — torch ``F.pairwise_distance(x, y, p, eps=1e-6)``:
  ``||x - y + eps||_p`` (the eps is added to the *difference*, matching torch,
  so golden tests against torch pass bit-for-bit at f32).
- ``cos_sim`` / ``dot_score`` — sentence_transformers.util score functions
  used by the IR evaluator (driven from reference ir_evauation_script.py:107).
- ``euclid_score`` — reference models/evaluators.py:392-405:
  ``1 / (1 + cdist(a, b, p=2))``.

All pairwise-matrix ops are expressed as single large matmuls so XLA maps
them onto the MXU; inputs are upcast-accumulated in f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6


def pairwise_distance(x: jax.Array, y: jax.Array, p: float = 2.0,
                      eps: float = _EPS) -> jax.Array:
    """Row-wise Minkowski distance ``||x - y + eps||_p``, shape (...,)."""
    diff = jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32) + eps)
    if p == 2.0:
        return jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    if p == 1.0:
        return jnp.sum(diff, axis=-1)
    return jnp.power(jnp.sum(jnp.power(diff, p), axis=-1), 1.0 / p)


def l2_normalize(x: jax.Array, eps: float = 1e-12, axis: int = -1) -> jax.Array:
    """Torch-style F.normalize: x / max(||x||_2, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def cos_sim(a: jax.Array, b: jax.Array) -> jax.Array:
    """Full pairwise cosine-similarity matrix, shape (A, B). One MXU matmul
    after normalization."""
    a = l2_normalize(a.astype(jnp.float32))
    b = l2_normalize(b.astype(jnp.float32))
    return jnp.dot(a, b.T, preferred_element_type=jnp.float32)


def dot_score(a: jax.Array, b: jax.Array) -> jax.Array:
    """Full pairwise dot-product matrix, shape (A, B)."""
    return jnp.dot(a.astype(jnp.float32), b.astype(jnp.float32).T,
                   preferred_element_type=jnp.float32)


def cdist2(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise Euclidean distance matrix via the expanded-square identity —
    one matmul + rank-1 corrections instead of a (A, B, D) broadcast, so it
    stays MXU-bound and O(A*B) memory."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    aa = jnp.sum(a * a, axis=-1)[:, None]
    bb = jnp.sum(b * b, axis=-1)[None, :]
    ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    sq = jnp.maximum(aa + bb - 2.0 * ab, 0.0)
    return jnp.sqrt(sq)


def euclid_score(a: jax.Array, b: jax.Array) -> jax.Array:
    """Similarity-from-distance: 1/(1+cdist) (reference evaluators.py:392-405)."""
    return 1.0 / (1.0 + cdist2(a, b))


SCORE_FUNCTIONS = {
    "cos_sim": cos_sim,
    "dot_score": dot_score,
    "euclid_score": euclid_score,
}
