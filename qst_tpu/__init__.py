"""qst_tpu — a TPU-native quadruplet sentence-transformer / dense-retrieval framework.

A ground-up JAX / XLA / Pallas / pjit re-design of the capabilities of
``lucastrefezza/quadruplet-sentence-transformer`` (the reference harness over
PyTorch ``sentence-transformers``): quadruplet-loss encoder fine-tuning over
(anchor, positive, partially-positive, negative) text tuples, dataset
construction with similarity mining and augmentation, and exact-kNN IR
evaluation — all designed TPU-first:

- compute path: Flax encoders under ``jax.jit``/``pjit`` over a device mesh,
  bf16 matmuls on the MXU, fused Pallas kernels for the quadruplet loss and
  streaming top-k retrieval;
- data path: fixed-shape batched pipelines, device-resident hard-negative
  mining (no model inference inside ``__getitem__`` like the reference's
  ``dataset/quadruplet_dataset.py:229-232``);
- scale path: ``jax.sharding.Mesh`` + ``shard_map`` collectives over ICI
  (data-parallel training, corpus-sharded exact search with top-k merge).

Subpackages
-----------
core       mesh/runtime init, configs, RNG streams, telemetry sinks
ops        jnp reference ops + Pallas TPU kernels (losses, distances, top-k)
models     Flax BERT-family encoders, pooling heads, cross-encoder, tokenizers
data       chunked quadruplet datasets, batched mining, fixed-shape collation
train      jitted train step, schedules, trainer loop, checkpoints, callbacks
evals      IR metrics + evaluators (loss / quadruplet / IR / sequential)
retrieval  exact-kNN index, single-chip and ICI-sharded search
parallel   sharding helpers and mesh-aware wrappers
augment    positive mining, partial-positive synthesis, backtranslation, MLM
cli        dataset-build / train / ir-eval entry points
"""

__version__ = "0.1.0"
