"""Pair discriminator for the D-regularized quadruplet loss.

The reference prototyped this as ``DummyDiscriminator`` in
``quadruplet_loss_test.ipynb`` cell 8: concat(anchor, x) → linear → logit,
consumed by ``d_regularized_quadruplet_loss`` (reference losses.py:122-124).
Here it is a small configurable MLP (depth 1 reproduces the notebook).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class PairDiscriminator(nn.Module):
    hidden_sizes: Sequence[int] = ()

    @nn.compact
    def __call__(self, anchor: jax.Array, x: jax.Array) -> jax.Array:
        h = jnp.concatenate([anchor, x], axis=-1).astype(jnp.float32)
        for i, size in enumerate(self.hidden_sizes):
            h = nn.Dense(size, name=f"hidden_{i}")(h)
            h = jax.nn.relu(h)
        logit = nn.Dense(1, name="logit")(h)
        return logit  # (B, 1)


def init_discriminator(embed_dim: int, rng: jax.Array,
                       hidden_sizes: Sequence[int] = ()):
    model = PairDiscriminator(tuple(hidden_sizes))
    z = jnp.zeros((2, embed_dim), jnp.float32)
    return model.init({"params": rng}, z, z)["params"]
