"""Masked-language-model head over the BERT trunk.

Backs the MLM insert/substitute augmentation the reference pulls from
``nlpaug.ContextualWordEmbsAug(model_path='roberta-base', action=...)``
(reference positive_examples_selection.py:162-168,
partially_positive_examples_selection.py:125-132) — rebuilt as batched masked
scoring on the TPU encoder (SURVEY.md §2.3).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from qst_tpu.core.config import EncoderConfig
from qst_tpu.models.bert import BertEncoder


class BertMLMModule(nn.Module):
    """ids/mask → per-position vocab logits (BERT MLM head: dense → gelu →
    layernorm → vocab projection)."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic: bool = True):
        c = self.cfg
        hidden = BertEncoder(c, name="encoder")(
            input_ids, attention_mask, deterministic=deterministic)
        h = nn.Dense(c.hidden_size, name="transform")(
            hidden.astype(jnp.float32))
        h = jax.nn.gelu(h, approximate=False)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="transform_layer_norm")(h)
        logits = nn.Dense(c.vocab_size, name="decoder")(h)
        return logits  # (B, S, V)


def init_mlm_params(cfg: EncoderConfig, rng: jax.Array):
    model = BertMLMModule(cfg)
    z = jnp.zeros((2, cfg.max_seq_length), jnp.int32)
    return model.init({"params": rng}, z, jnp.ones_like(z))["params"]


def mlm_logits_fn(cfg: EncoderConfig):
    model = BertMLMModule(cfg)

    @jax.jit
    def fwd(params, input_ids, attention_mask):
        return model.apply({"params": params}, input_ids, attention_mask,
                           deterministic=True)

    return fwd
