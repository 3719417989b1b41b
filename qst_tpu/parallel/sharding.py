"""Parameter/state sharding rules — tensor parallelism for the encoder.

The reference has no distributed layer at all (SURVEY.md §2.2); this module
is new first-class capability: Megatron-style tensor parallelism expressed
the XLA way — PartitionSpec rules over the parameter tree, applied as
``out_shardings``/``in_shardings`` on the jitted create/train/eval functions.
XLA derives the collectives (all-gather/reduce-scatter on the ``model`` axis,
gradient psum on the ``data`` axis) from these annotations (the scaling-book
recipe: pick a mesh, annotate, let the compiler insert collectives).

Rules (BERT-family encoder):
- attention q/k/v kernels (H, heads, head_dim) → heads sharded on ``model``
- attention output kernel (heads, head_dim, H) → heads sharded on ``model``
- MLP intermediate kernel (H, I) → I sharded (column parallel)
- MLP output kernel (I, H) → I sharded (row parallel)
- embeddings / layernorms / biases of row-parallel layers → replicated

The same rules map optimizer moments (their paths embed the param paths), so
one function shards the whole TrainState.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qst_tpu.core.meshes import MODEL_AXIS

# (path regex, spec by rank) — first match wins; pattern matches the
# '/'-joined path of the leaf.
_RULES: Tuple[Tuple[str, dict], ...] = (
    # attention projections: DenseGeneral (H, heads, hd) kernel / (heads, hd)
    # bias — BERT names (query/key/value/output_dense) and MPNet names (q/k/v/o)
    (r"attention/(query|key|value|q|k|v)/kernel$", {3: P(None, MODEL_AXIS, None)}),
    (r"attention/(query|key|value|q|k|v)/bias$", {2: P(MODEL_AXIS, None)}),
    (r"attention/(output_dense|o)/kernel$", {3: P(MODEL_AXIS, None, None)}),
    (r"attention/(output_dense|o)/bias$", {1: P()}),
    # MLP column/row parallel
    (r"/intermediate/kernel$", {2: P(None, MODEL_AXIS)}),
    (r"/intermediate/bias$", {1: P(MODEL_AXIS)}),
    (r"layer_\d+/output/kernel$", {2: P(MODEL_AXIS, None)}),
    (r"layer_\d+/output/bias$", {1: P()}),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for_param(path_str: str, ndim: int) -> P:
    for pattern, by_rank in _RULES:
        if re.search(pattern, path_str) and ndim in by_rank:
            return by_rank[ndim]
    return P()  # replicated


def tree_param_specs(tree: Any) -> Any:
    """→ pytree of PartitionSpec matching ``tree`` (params, grads, or
    optimizer moments — anything whose leaf paths embed the param names)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: spec_for_param(_path_str(path),
                                          getattr(leaf, "ndim", 0)),
        tree,
    )


def tree_shardings(mesh: Mesh, tree: Any) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, spec_for_param(_path_str(path), getattr(leaf, "ndim", 0))),
        tree,
    )


def state_shardings(mesh: Mesh, create_fn: Callable, *args, **kwargs):
    """Shard a TrainState-producing function's output: evaluate shapes
    abstractly, then map the param rules over every leaf (params AND
    optimizer moments share path suffixes)."""
    shapes = jax.eval_shape(create_fn, *args, **kwargs)
    return tree_shardings(mesh, shapes)


def create_sharded(mesh: Mesh, create_fn: Callable, *args, **kwargs):
    """Run ``create_fn`` under jit with rule-derived out_shardings → the
    state materializes directly in its sharded layout (no host round-trip)."""
    out_sh = state_shardings(mesh, create_fn, *args, **kwargs)
    return jax.jit(create_fn, out_shardings=out_sh)(*args, **kwargs), out_sh
