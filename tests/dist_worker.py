"""Worker script for the 2-process distributed-runtime test.

Each process: initialize the multi-process runtime via the qst_tpu hook,
build a DP mesh over the GLOBAL device set, load only its own per-process
batch shard, assemble the global batch with ``global_array_from_local``, run
one REAL quadruplet train step (gradient psum crosses the process boundary),
and print the loss — which must be identical across processes.

Invoked by tests/test_distributed.py as:
    python dist_worker.py <process_id> <num_processes> <port>
with JAX_PLATFORMS=cpu and --xla_force_host_platform_device_count=2.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["QST_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["QST_NUM_PROCESSES"] = str(nproc)
os.environ["QST_PROCESS_ID"] = str(pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from qst_tpu.core.meshes import (  # noqa: E402
    initialize_distributed,
    global_array_from_local,
    make_mesh,
    process_shard_bounds,
)

assert initialize_distributed(), "env gate should be open"
assert jax.process_count() == nproc, jax.process_count()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from qst_tpu.core.config import EncoderConfig, LossConfig, TrainConfig  # noqa: E402
from qst_tpu.train.train_step import (  # noqa: E402
    create_train_state_sharded,
    make_train_step,
)

n_global_dev = len(jax.devices())
mesh = make_mesh(data=n_global_dev, model=1)

cfg = EncoderConfig.tiny()
loss_cfg = LossConfig(margin_pos_part=0.5, margin_part_neg=0.5)
train_cfg = TrainConfig(batch_size=n_global_dev, learning_rate=1e-4,
                        scheduler="warmuplinear", warmup_steps=2)
state, tx, _ = create_train_state_sharded(
    cfg, train_cfg, jax.random.key(0), 10, mesh, loss_cfg)
step = make_train_step(cfg, loss_cfg, tx, mesh=mesh)

# Per-process data loading: every process materializes ONLY its own shard of
# the global batch (same deterministic global source, disjoint slices).
B, S = n_global_dev, cfg.max_seq_length
rng = np.random.default_rng(0)
global_ids = rng.integers(5, cfg.vocab_size, (4, B, S)).astype(np.int32)
lo, hi = process_shard_bounds(B)
local_ids = global_ids[:, lo:hi]

ids = global_array_from_local(local_ids, mesh, P(None, "data"))
mask = global_array_from_local(np.ones_like(local_ids), mesh,
                               P(None, "data"))
state, loss = step(state, ids, mask, jax.random.key(1))
print(f"RESULT pid={pid} nproc={jax.process_count()} "
      f"ndev={n_global_dev} loss={float(loss):.6f}", flush=True)
