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


COORDINATOR_ENV = "QST_COORDINATOR_ADDRESS"
NUM_PROCESSES_ENV = "QST_NUM_PROCESSES"
PROCESS_ID_ENV = "QST_PROCESS_ID"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-process (multi-host) runtime hook (SURVEY.md §5.8).

    Calls ``jax.distributed.initialize`` so every process sees the global
    device set and collectives ride ICI within a slice / DCN across hosts.
    Must run before the first JAX backend use. Gated: activates when the
    coordinator is given explicitly or via ``$QST_COORDINATOR_ADDRESS`` (+
    ``$QST_NUM_PROCESSES`` / ``$QST_PROCESS_ID``); on managed clusters
    (SLURM / TPU pods) where JAX can auto-detect, set the coordinator env to
    ``auto`` to initialize with no explicit arguments. Returns True when
    initialization happened, False when the gate is closed (single-process
    mode — the default everywhere in this repo).
    """
    coordinator_address = coordinator_address or os.environ.get(
        COORDINATOR_ENV)
    if not coordinator_address:
        return False
    if coordinator_address == "auto":
        jax.distributed.initialize()
        return True
    if num_processes is None:
        if NUM_PROCESSES_ENV not in os.environ:
            raise ValueError(
                f"{COORDINATOR_ENV} is set but {NUM_PROCESSES_ENV} is not; "
                f"set {NUM_PROCESSES_ENV} and {PROCESS_ID_ENV} too (or use "
                f"{COORDINATOR_ENV}=auto for single-controller discovery)")
        num_processes = int(os.environ[NUM_PROCESSES_ENV])
    if process_id is None:
        if PROCESS_ID_ENV not in os.environ:
            raise ValueError(
                f"{COORDINATOR_ENV} is set but {PROCESS_ID_ENV} is not; "
                f"set {NUM_PROCESSES_ENV} and {PROCESS_ID_ENV} too")
        process_id = int(os.environ[PROCESS_ID_ENV])
    jax.distributed.initialize(coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def process_shard_bounds(n: int, process_index: Optional[int] = None,
                         process_count: Optional[int] = None
                         ) -> tuple[int, int]:
    """Per-process data-loading slice [start, stop) of a global dataset of
    ``n`` items: each process loads only its own contiguous shard (SURVEY.md
    §5.8 'host-side distributed data loading per process'). Uneven remainders
    go to the leading processes."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if not 0 <= pi < pc:
        raise ValueError(f"process_index {pi} outside [0, {pc})")
    base, rem = divmod(n, pc)
    start = pi * base + min(pi, rem)
    return start, start + base + (1 if pi < rem else 0)


def global_array_from_local(local, mesh: Mesh, spec: P) -> jax.Array:
    """Assemble a GLOBAL jax.Array from this process's local shard (the
    multi-process analogue of ``jax.device_put(x, sharding)``): each process
    passes only the rows it loaded; JAX stitches the global array without
    any host gathering."""
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local))


def flat_shard_index(axes=(DATA_AXIS, MODEL_AXIS)):
    """Row-major linear shard id over the given mesh axes — for use INSIDE
    a ``shard_map`` body (every sharded-retrieval kernel derives its row
    offset from this)."""
    import jax

    idx = jax.lax.axis_index(axes[0])
    for ax in axes[1:]:
        idx = idx * jax.lax.axis_size(ax) + jax.lax.axis_index(ax)
    return idx


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
