"""Context parallelism: sequence-sharded attention over the mesh.

Green-field capability (the reference never exceeds caption lengths,
SURVEY.md §5.7); enables long-document retrieval where the KV sequence no
longer fits one chip. Two standard schemes, both expressed as shard_map
programs whose collectives ride ICI:

- ``context_parallel_attention``: each chip computes flash-style partial
  attention against its LOCAL KV shard (running max/sum statistics), then a
  cross-chip online-softmax combine (``pmax`` + two ``psum``) merges the
  partials — only O(d_head + 2) values cross the wire per query.
- ``ring_attention``: KV blocks rotate around the mesh axis with
  ``ppermute`` (point-to-point, both neighbors only) while each chip folds
  the block in front of it into its online-softmax state — communication
  overlaps compute, bandwidth-optimal for very long sequences.

Both are exact: outputs match full (unsharded) attention to numerical
precision (verified on the 8-device CPU mesh).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_NEG = -1e30


def _partial_attention(q, k, v, scale):
    """Local attention with softmax statistics.

    q (B, H, Sq, D); k, v (B, H, Skv_local, D) →
    (o_unnorm (B,H,Sq,D), m (B,H,Sq), l (B,H,Sq)) where
    ``o_unnorm = sum(exp(s - m) v)`` and ``l = sum(exp(s - m))``.
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return o, m, l


def full_attention(q, k, v):
    """Unsharded reference: softmax(QK^T/sqrt(d)) V."""
    scale = q.shape[-1] ** -0.5
    o, m, l = _partial_attention(q.astype(jnp.float32),
                                 k.astype(jnp.float32), v, scale)
    return o / l[..., None]


def context_parallel_attention(q, k, v, mesh: Mesh, axis: str = "data"):
    """KV sharded on ``axis`` (sequence dim), Q replicated → full attention.

    Per chip: partial attention on the local shard; then cross-chip combine
    with the online-softmax correction (guide: pmax + psum of corrected
    stats).
    """
    scale = q.shape[-1] ** -0.5

    def body(q_l, k_l, v_l):
        o_l, m_l, l_l = _partial_attention(
            q_l.astype(jnp.float32), k_l.astype(jnp.float32), v_l, scale)
        m_g = jax.lax.pmax(m_l, axis_name=axis)
        alpha = jnp.exp(m_l - m_g)
        l_g = jax.lax.psum(alpha * l_l, axis_name=axis)
        o_g = jax.lax.psum(alpha[..., None] * o_l, axis_name=axis)
        return o_g / l_g[..., None]

    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(None, None, axis, None), P(None, None, axis, None)),
        out_specs=P(),
        check_vma=False,  # combine makes outputs replicated
    ))(q, k, v)


def ring_attention(q, k, v, mesh: Mesh, axis: str = "data"):
    """Both Q and KV sharded on ``axis``: KV blocks rotate with ppermute
    while each chip folds them into its online-softmax state → output
    sharded like Q. Bidirectional-equivalent bandwidth via N-1 neighbor
    hops; compute and transfer overlap under XLA scheduling."""
    scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis]

    def body(q_l, k_l, v_l):
        B, H, Sq, D = q_l.shape
        q32 = q_l.astype(jnp.float32)
        m = jnp.full((B, H, Sq), -jnp.inf, jnp.float32)
        l = jnp.zeros((B, H, Sq), jnp.float32)
        o = jnp.zeros((B, H, Sq, D), jnp.float32)
        k_blk, v_blk = k_l, v_l
        perm = [(i, (i + 1) % n) for i in range(n)]
        for step in range(n):
            s = jnp.einsum("bhqd,bhkd->bhqk", q32,
                           k_blk.astype(jnp.float32),
                           preferred_element_type=jnp.float32) * scale
            m_c = jnp.max(s, axis=-1)
            m_n = jnp.maximum(m, m_c)
            alpha = jnp.exp(m - m_n)
            p = jnp.exp(s - m_n[..., None])
            l = alpha * l + jnp.sum(p, axis=-1)
            o = alpha[..., None] * o + jnp.einsum(
                "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32),
                preferred_element_type=jnp.float32)
            m = m_n
            if step < n - 1:  # rotate KV to the next chip
                k_blk = jax.lax.ppermute(k_blk, axis, perm)
                v_blk = jax.lax.ppermute(v_blk, axis, perm)
        return (o / l[..., None]).astype(q_l.dtype)

    spec = P(None, None, axis, None)
    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    ))(q, k, v)
