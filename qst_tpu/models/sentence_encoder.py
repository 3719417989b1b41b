"""Sentence encoder — the SentenceTransformer equivalent.

Rebuilds the capability the reference gets from
``SentenceTransformer(model_name)(features)['sentence_embedding']``
(consumed at reference quadruplet_sentence_transformer.py:42-60) and
``SentenceTransformer.encode`` (reference positive_examples_selection.py:53-54,
and the IR evaluator's chunked corpus encode): transformer forward → masked
mean pooling → optional L2 normalization.

The jitted compute path is a pure function of (params, ids, mask); the
``SentenceEncoder`` convenience class owns tokenization and fixed-shape
batching on the host and keeps a cache of jitted entry points per shape
bucket so XLA never recompiles in the steady state.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import FrozenDict

from qst_tpu.core.config import EncoderConfig
from qst_tpu.models.bert import BertEncoder
from qst_tpu.ops.distances import l2_normalize
from qst_tpu.ops.pooling import POOLERS


class SentenceEncoderModule(nn.Module):
    """ids/mask → pooled (and optionally normalized) sentence embedding."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        token_type_ids: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Dict[str, jax.Array]:
        if self.cfg.arch == "mpnet":
            from qst_tpu.models.mpnet import MPNetEncoder

            trunk = MPNetEncoder(self.cfg, name="encoder")
        else:
            trunk = BertEncoder(self.cfg, name="encoder")
        hidden = trunk(input_ids, attention_mask, token_type_ids,
                       deterministic)
        pooled = POOLERS[self.cfg.pooling](hidden, attention_mask)
        if self.cfg.normalize:
            pooled = l2_normalize(pooled)
        return {
            "token_embeddings": hidden,
            "sentence_embedding": pooled,
        }


def init_params(cfg: EncoderConfig, rng: jax.Array,
                batch: int = 2) -> FrozenDict:
    model = SentenceEncoderModule(cfg)
    ids = jnp.zeros((batch, cfg.max_seq_length), jnp.int32)
    mask = jnp.ones((batch, cfg.max_seq_length), jnp.int32)
    return model.init({"params": rng}, ids, mask)["params"]


def embed_fn(cfg: EncoderConfig) -> Callable:
    """The pure forward: (params, ids, mask) → (B, D) f32 embeddings.

    With ``cfg.use_fused_layer`` (bert/mpnet arch), the trunk runs through
    the fused per-layer Pallas kernel (ops/fused_layer_pallas.py) — the
    bandwidth-optimal encode path; otherwise the Flax/XLA module."""
    if cfg.use_fused_layer and cfg.arch in ("bert", "mpnet"):
        from qst_tpu.ops.fused_layer_pallas import fused_embed_fn

        return fused_embed_fn(cfg, nb=cfg.fused_nb)
    model = SentenceEncoderModule(cfg)

    def fwd(params, input_ids, attention_mask):
        out = model.apply({"params": params}, input_ids, attention_mask,
                          deterministic=True)
        return out["sentence_embedding"]

    return fwd


def embed_many_fn(cfg: EncoderConfig) -> Callable:
    """Multi-batch forward: (params, ids (K, B, S), mask (K, B, S)) →
    (K, B, D) — K encoder forwards in ONE dispatch via ``lax.scan``.

    The encode-side analogue of ``train_step.make_multi_step``: amortizes
    per-dispatch overhead (the dev relay adds ~30 ms per call; production
    stacks see reduced launch/host costs too) while keeping the per-step
    activation footprint at one batch."""
    fwd = embed_fn(cfg)

    def many(params, input_ids, attention_mask):
        def body(_, batch):
            ids, mask = batch
            return None, fwd(params, ids, mask)

        _, out = jax.lax.scan(body, None, (input_ids, attention_mask))
        return out

    return many


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class SentenceEncoder:
    """Host-side convenience wrapper: texts → embeddings.

    Parameters
    ----------
    cfg : encoder config
    params : flax param pytree
    tokenizer : object with ``batch_encode(texts, max_length) -> (ids, mask)``
        returning fixed-shape int32 numpy arrays (see qst_tpu.models.tokenizer)
    """

    SEQ_BUCKETS = (16, 32, 64, 128, 256, 512)

    def __init__(self, cfg: EncoderConfig, params: Any, tokenizer: Any,
                 out_sharding: Any = None, mesh: Any = None):
        """mesh: shard each encode batch over the mesh's data axis
        (data-parallel corpus encoding — the index-build workload)."""
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self._fwd = embed_fn(cfg)
        in_shardings = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from qst_tpu.core.meshes import DATA_AXIS

            batch_sh = NamedSharding(mesh, P(DATA_AXIS))
            in_shardings = (None, batch_sh, batch_sh)
            self._n_data = mesh.shape[DATA_AXIS]
        else:
            self._n_data = 1
        self._jitted = jax.jit(self._fwd, in_shardings=in_shardings,
                               out_shardings=out_sharding)
        self._many = embed_many_fn(cfg)
        many_in = None
        if in_shardings is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from qst_tpu.core.meshes import DATA_AXIS

            kbatch_sh = NamedSharding(mesh, P(None, DATA_AXIS))
            many_in = (None, kbatch_sh, kbatch_sh)
        # the many-forward's output has an extra leading K axis: shift a
        # NamedSharding's spec right by one so the BATCH dim (not K) keeps
        # the single-batch partitioning
        many_out = out_sharding
        if out_sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if isinstance(out_sharding, NamedSharding):
                many_out = NamedSharding(out_sharding.mesh,
                                         P(None, *out_sharding.spec))
        self._jitted_many = jax.jit(self._many, in_shardings=many_in,
                                    out_shardings=many_out)

    def encode_ids(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        return self._jitted(self.params, input_ids, attention_mask)

    def encode_ids_many(self, input_ids: jax.Array,
                        attention_mask: jax.Array) -> jax.Array:
        """(K, B, S) ids/mask → (K, B, D): K batches in one dispatch."""
        return self._jitted_many(self.params, input_ids, attention_mask)

    def encode(
        self,
        texts: Sequence[str],
        batch_size: int = 256,
        convert_to_numpy: bool = True,
        pipeline_batches: int = 1,
        dispatch_depth: int = 4,
    ):
        """Batched encode with shape bucketing (pad batch AND seq length to
        fixed buckets so XLA compiles once per bucket, replacing the
        reference's dynamic smart batching).

        ``pipeline_batches=K > 1`` dispatches K full batches per device call
        through the scanned multi-batch forward (``embed_many_fn``) —
        amortizes per-dispatch overhead for bulk corpus encoding; the tail
        that doesn't fill K full batches takes the single-batch path.

        ``convert_to_numpy=False`` keeps every batch ON DEVICE and returns
        a jnp array — the corpus-indexing path: embeddings feed the
        HBM-resident index directly with no device→host→device round trip
        (through the dev relay the (N, 384) f32 transfer alone runs at
        ~40 MB/s each way).

        ``dispatch_depth`` (host-output path only): keep up to this many
        encode dispatches in flight before materializing the oldest result,
        so the device→host embedding transfer of batch N overlaps the
        compute of batches N+1..N+depth−1 instead of serializing after
        every call (same pipelining as ``ExactIndex.search_stream``)."""
        if pipeline_batches < 1:
            raise ValueError(
                f"pipeline_batches must be >= 1, got {pipeline_batches}")
        if dispatch_depth < 1:
            raise ValueError(
                f"dispatch_depth must be >= 1, got {dispatch_depth}")
        seq_buckets = [b for b in self.SEQ_BUCKETS if b <= self.cfg.max_seq_length]
        if not seq_buckets or seq_buckets[-1] != self.cfg.max_seq_length:
            seq_buckets.append(self.cfg.max_seq_length)
        outs: List[np.ndarray] = []
        pending: List[jax.Array] = []  # in-flight device results

        def push(emb) -> None:
            if not convert_to_numpy:
                outs.append(emb)
                return
            pending.append(emb)
            if len(pending) >= dispatch_depth:
                outs.append(np.asarray(pending.pop(0)))

        start0 = 0
        if pipeline_batches > 1:
            K = pipeline_batches
            B = -(-batch_size // self._n_data) * self._n_data
            group = K * B
            n_groups = len(texts) // group
            for g in range(n_groups):
                chunk = list(texts[g * group:(g + 1) * group])
                ids, mask = self.tokenizer.batch_encode(
                    chunk, max_length=self.cfg.max_seq_length)
                longest = int(mask.sum(axis=1).max())
                S = _bucket(longest, seq_buckets)
                ids = ids[:, :S].reshape(K, B, S)
                mask = mask[:, :S].reshape(K, B, S)
                emb = self.encode_ids_many(jnp.asarray(ids),
                                           jnp.asarray(mask))
                push(emb.reshape(group, -1))
            start0 = n_groups * group
        for start in range(start0, len(texts), batch_size):
            chunk = list(texts[start:start + batch_size])
            ids, mask = self.tokenizer.batch_encode(
                chunk, max_length=self.cfg.max_seq_length)
            # trim to longest real length, then pad up to a bucket
            longest = int(mask.sum(axis=1).max()) if len(chunk) else 1
            S = _bucket(longest, seq_buckets)
            ids, mask = ids[:, :S], mask[:, :S]
            n = len(chunk)
            B = _bucket(n, [8, 16, 32, 64, 128, 256, batch_size])
            # data-parallel encode: batch must split evenly over the mesh
            B = -(-B // self._n_data) * self._n_data
            if n < B:
                pad = B - n
                ids = np.concatenate([ids, np.zeros((pad, S), ids.dtype)])
                mask = np.concatenate([mask, np.zeros((pad, S), mask.dtype)])
                mask[n:, 0] = 1  # avoid 0/0 in mean pooling for pad rows
            emb = self.encode_ids(jnp.asarray(ids), jnp.asarray(mask))
            push(emb[:n])
        while pending:
            outs.append(np.asarray(pending.pop(0)))
        if not outs:
            dim = self.cfg.hidden_size
            zero = np.zeros((0, dim), np.float32)
            return zero if convert_to_numpy else jnp.asarray(zero)
        if convert_to_numpy:
            return np.concatenate(outs, axis=0)
        return jnp.concatenate(outs, axis=0)

    def similarity(self, a: Sequence[str], b: Sequence[str]) -> np.ndarray:
        from qst_tpu.ops.distances import cos_sim

        ea = self.encode(a, convert_to_numpy=False)
        eb = self.encode(b, convert_to_numpy=False)
        return np.asarray(cos_sim(ea, eb))
