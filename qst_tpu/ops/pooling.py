"""Pooling ops — the SentenceTransformer head equivalents.

The reference gets mean pooling from the sentence-transformers ``Pooling``
module inside every ``st_model(...)`` call (consumed at reference
quadruplet_sentence_transformer.py:42-60). Implemented here as pure jnp
functions; XLA fuses the mask-multiply/sum into the surrounding encoder
epilogue, so no Pallas is needed for these.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mean_pool(hidden: jax.Array, attention_mask: jax.Array) -> jax.Array:
    """Masked mean over the sequence axis.

    hidden: (B, S, D); attention_mask: (B, S) in {0,1} → (B, D) float32.
    Matches sentence-transformers' mean pooling: sum(h*m)/clamp(sum(m), 1e-9).
    """
    mask = attention_mask[..., None].astype(jnp.float32)
    h = hidden.astype(jnp.float32)
    summed = jnp.sum(h * mask, axis=1)
    counts = jnp.clip(jnp.sum(mask, axis=1), 1e-9, None)
    return summed / counts


def cls_pool(hidden: jax.Array, attention_mask: jax.Array) -> jax.Array:
    return hidden[:, 0, :].astype(jnp.float32)


def max_pool(hidden: jax.Array, attention_mask: jax.Array) -> jax.Array:
    mask = attention_mask[..., None].astype(bool)
    h = jnp.where(mask, hidden.astype(jnp.float32), -jnp.inf)
    return jnp.max(h, axis=1)


POOLERS = {"mean": mean_pool, "cls": cls_pool, "max": max_pool}
