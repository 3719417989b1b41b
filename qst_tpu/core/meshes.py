"""Mesh and dtype-policy runtime initialization.

The reference has no distributed layer (SURVEY.md §2.2) — device selection is
a single ``torch.device("cuda" if available else "cpu")``. Here the runtime is
mesh-first: every entry point creates a ``jax.sharding.Mesh`` (even a 1-device
one) so that data-parallel training and corpus-sharded retrieval are the same
code path from one chip to a pod slice.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

DEFAULT_COMPILATION_CACHE = os.path.expanduser("~/.cache/jax_comp")


def enable_compilation_cache(path: str = DEFAULT_COMPILATION_CACHE) -> None:
    """Turn on JAX's persistent compilation cache (idempotent). Remote/AOT
    compiles of large programs can take minutes; every entry point calls
    this so repeated runs are instant.

    TPU-only: XLA:CPU AOT cache entries bake in host machine features and
    loading them on a different host risks SIGILL (observed as cpu_aot_loader
    feature-mismatch errors), so the cache stays off for the CPU backend."""
    try:
        platform = jax.default_backend()
    except Exception:  # backend init failure → leave config untouched
        return
    if platform == "cpu":
        return
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a 2-D (data, model) mesh over the available devices.

    ``data=-1`` consumes all devices not taken by ``model``. Collectives over
    either axis compile to ICI transfers within a slice (XLA inserts them from
    sharding annotations — the scaling-book recipe).
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if model <= 0:
        raise ValueError(f"model axis must be >= 1, got {model}")
    if data <= 0:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs more than {n} devices")
    # a smaller-than-world mesh takes a device prefix (e.g. 1x1 debug mesh)
    arr = np.asarray(devs[: data * model]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(data=1, model=1, devices=jax.devices()[:1])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def corpus_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a (num_docs, dim) corpus matrix over ALL mesh devices on the doc
    axis — the layout for ICI-sharded exact search."""
    return NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS)))


@dataclass(frozen=True)
class DTypePolicy:
    """Mixed-precision policy: params in f32, compute in bf16 (MXU-native),
    reductions/accumulation in f32."""

    param_dtype: jnp.dtype
    compute_dtype: jnp.dtype
    output_dtype: jnp.dtype

    def cast_compute(self, x):
        return jax.tree.map(
            lambda a: a.astype(self.compute_dtype)
            if hasattr(a, "astype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            x,
        )


def dtype_policy(compute: str = "bfloat16") -> DTypePolicy:
    cd = jnp.dtype(compute)
    return DTypePolicy(
        param_dtype=jnp.dtype("float32"),
        compute_dtype=cd,
        output_dtype=jnp.dtype("float32"),
    )
