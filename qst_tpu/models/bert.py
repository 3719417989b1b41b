"""Flax BERT-family encoder.

TPU-native replacement for the transformer-forward capability the reference
consumes from the sentence-transformers/HF stack on CUDA (every
``st_model(...)`` / ``encode(...)`` call, e.g. reference
quadruplet_sentence_transformer.py:42-60, positive_examples_selection.py:53-54).

Design notes (TPU-first):
- static shapes everywhere: (B, S) int32 ids + mask, no dynamic padding;
- params live in f32, matmuls run in the configured compute dtype (bf16 on
  TPU → MXU-native), layernorm/softmax accumulate in f32;
- attention is a single fused einsum chain XLA maps onto the MXU; for the
  short sequences of this workload (captions, S ≤ 128) this is already
  bandwidth-optimal, a Pallas flash-attention path is gated behind
  ``EncoderConfig.use_flash_attention`` for long-document retrieval;
- numerics match HF ``BertModel`` exactly at f32 so imported
  sentence-transformers checkpoints (MiniLM-L6, mpnet-base) reproduce the
  reference embeddings (verified in tests/test_models.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from qst_tpu.core.config import EncoderConfig


def _dtype(cfg: EncoderConfig):
    return jnp.dtype(cfg.dtype)


class BertEmbeddings(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids, position_ids, deterministic: bool):
        c = self.cfg
        word = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings",
                        dtype=_dtype(c))(input_ids)
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size,
                       name="position_embeddings", dtype=_dtype(c))(position_ids)
        # clamp: RoBERTa checkpoints carry type_vocab_size=1 while pair
        # tokenizers emit segment 1 for the second text — the embedding is
        # segment-blind there by construction, not out-of-bounds
        typ = nn.Embed(c.type_vocab_size, c.hidden_size,
                       name="token_type_embeddings", dtype=_dtype(c))(
            jnp.minimum(token_type_ids, c.type_vocab_size - 1))
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm",
                         dtype=jnp.float32)(x)
        x = nn.Dropout(c.hidden_dropout)(x, deterministic=deterministic)
        return x.astype(_dtype(c))


def _flash_attention_available(cfg: EncoderConfig, seq_len: int,
                               deterministic: bool) -> bool:
    """Flash path applies for long sequences on TPU: S must satisfy the
    kernel's 128-lane tiling, and attention dropout (unsupported inside the
    kernel) must be inactive."""
    if not cfg.use_flash_attention:
        return False
    if seq_len < 128 or seq_len % 128 != 0:
        return False
    if not deterministic and cfg.attention_dropout > 0.0:
        return False
    return True


class BertSelfAttention(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, hidden, attention_bias, attention_mask,
                 deterministic: bool):
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        dense = lambda name: nn.DenseGeneral(
            (c.num_heads, head_dim), axis=-1, name=name, dtype=_dtype(c))
        q = dense("query")(hidden)
        k = dense("key")(hidden)
        v = dense("value")(hidden)
        S = hidden.shape[1]
        if _flash_attention_available(c, S, deterministic):
            # fused online-softmax kernel (jax pallas ops): O(S) memory for
            # long-document retrieval; padding handled via segment ids
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds,
                flash_attention,
            )

            seg = attention_mask.astype(jnp.int32)
            ctx = flash_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                segment_ids=SegmentIds(q=seg, kv=seg),
                sm_scale=float(head_dim) ** -0.5,
            ).transpose(0, 2, 1, 3).astype(_dtype(c))
        else:
            # (B, H, S, S) logits accumulated in f32 for softmax stability.
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits / jnp.sqrt(jnp.float32(head_dim))
            logits = logits + attention_bias  # mask as additive bias
            probs = jax.nn.softmax(logits, axis=-1).astype(_dtype(c))
            probs = nn.Dropout(c.attention_dropout)(
                probs, deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                             preferred_element_type=jnp.float32).astype(_dtype(c))
        out = nn.DenseGeneral(c.hidden_size, axis=(-2, -1), name="output_dense",
                              dtype=_dtype(c))(ctx)
        out = nn.Dropout(c.hidden_dropout)(out, deterministic=deterministic)
        return out


class BertLayer(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, hidden, attention_bias, attention_mask,
                 deterministic: bool):
        c = self.cfg
        attn = BertSelfAttention(c, name="attention")(
            hidden, attention_bias, attention_mask, deterministic)
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attention_layer_norm",
                              dtype=jnp.float32)(attn + hidden).astype(_dtype(c))
        inter = nn.Dense(c.intermediate_size, name="intermediate", dtype=_dtype(c))(hidden)
        inter = jax.nn.gelu(inter.astype(jnp.float32), approximate=False)
        inter = inter.astype(_dtype(c))
        out = nn.Dense(c.hidden_size, name="output", dtype=_dtype(c))(inter)
        out = nn.Dropout(c.hidden_dropout)(out, deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, name="output_layer_norm",
                              dtype=jnp.float32)(out + hidden).astype(_dtype(c))
        return hidden


class BertEncoder(nn.Module):
    """Token-level encoder: ids/mask → last hidden state (B, S, D)."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        token_type_ids: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        c = self.cfg
        B, S = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        if c.arch == "roberta":
            # fairseq-style padding-aware positions offset by pad_token_id
            # (HF RobertaEmbeddings.create_position_ids_from_input_ids)
            from qst_tpu.models.mpnet import padding_aware_position_ids

            position_ids = padding_aware_position_ids(input_ids,
                                                      c.pad_token_id)
        else:
            position_ids = jnp.broadcast_to(
                jnp.arange(S, dtype=jnp.int32)[None, :], (B, S))
        hidden = BertEmbeddings(c, name="embeddings")(
            input_ids, token_type_ids, position_ids, deterministic)
        # additive mask bias: 0 where attended, large-negative where padded
        bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)
        bias = bias.astype(jnp.float32)
        layer_cls = BertLayer
        if c.remat:
            # recompute layer activations in the backward pass — the
            # standard FLOPs-for-HBM trade for long sequences / big batches
            layer_cls = nn.remat(BertLayer, static_argnums=(4,))
        for i in range(c.num_layers):
            hidden = layer_cls(c, name=f"layer_{i}")(
                hidden, bias, attention_mask, deterministic)
        return hidden
