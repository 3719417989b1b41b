"""RNG streams.

Replaces the reference's global-seed-14 side effects at import time
(``/root/reference/dataset/__init__.py:9-21``) with explicit, threaded
``jax.random`` key streams: no hidden global state, reproducible across
process restarts, and safe under jit/pjit.
"""

from __future__ import annotations

import os
import random as _pyrandom
from typing import Iterator

import jax
import numpy as np


class RngStream:
    """A named, fork-on-demand stream of JAX PRNG keys.

    Each call to :meth:`next` returns a fresh key derived by folding an
    incrementing counter into the base key; :meth:`fork` derives an
    independent child stream from a string tag.
    """

    def __init__(self, key: jax.Array | int, name: str = "root"):
        if isinstance(key, int):
            key = jax.random.key(key)
        self._key = key
        self._counter = 0
        self.name = name

    def next(self) -> jax.Array:
        self._counter += 1
        return jax.random.fold_in(self._key, self._counter)

    def fork(self, tag: str) -> "RngStream":
        h = hash(tag) & 0x7FFFFFFF
        return RngStream(jax.random.fold_in(self._key, h), name=tag)

    def numpy(self) -> np.random.Generator:
        """A host-side numpy Generator seeded from this stream (for data
        sampling off the device path)."""
        seed = int(jax.random.randint(self.next(), (), 0, 2**31 - 1))
        return np.random.default_rng(seed)


def seed_everything(seed: int) -> RngStream:
    """Seed host-side RNGs (python/numpy/PYTHONHASHSEED) and return the root
    device stream. The host seeding mirrors the reference's intent
    (dataset/__init__.py:14-21) but happens explicitly, never at import."""
    _pyrandom.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return RngStream(seed)


def key_iter(seed: int) -> Iterator[jax.Array]:
    stream = RngStream(seed)
    while True:
        yield stream.next()
