from qst_tpu.parallel.sharding import (
    spec_for_param,
    tree_param_specs,
    tree_shardings,
    state_shardings,
    create_sharded,
)

__all__ = [
    "spec_for_param",
    "tree_param_specs",
    "tree_shardings",
    "state_shardings",
    "create_sharded",
]
from qst_tpu.parallel.context import (
    full_attention,
    context_parallel_attention,
    ring_attention,
)

__all__ += ["full_attention", "context_parallel_attention", "ring_attention"]
