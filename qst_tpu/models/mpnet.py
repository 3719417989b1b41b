"""Flax MPNet encoder.

The reference's stronger checkpoint family (all-mpnet-base-v2) is MPNet, not
BERT: RoBERTa-style padding-aware learned positions plus a T5-style relative
position bias shared across layers and added to every attention-logit matrix.
Numerics match HF ``MPNetModel`` (parity-tested with random weights in
tests/test_mpnet.py) so sentence-transformers mpnet checkpoints import
exactly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from qst_tpu.core.config import EncoderConfig

RELATIVE_BUCKETS = 32
RELATIVE_MAX_DISTANCE = 128


def _dtype(cfg: EncoderConfig):
    return jnp.dtype(cfg.dtype)


def padding_aware_position_ids(input_ids: jax.Array, pad_id: int) -> jax.Array:
    """fairseq/RoBERTa position ids: positions count non-pad tokens starting
    at pad_id+1; pad positions get pad_id."""
    mask = (input_ids != pad_id).astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=1) * mask
    return incremental + pad_id


def relative_position_bucket(relative_position: jax.Array,
                             num_buckets: int = RELATIVE_BUCKETS,
                             max_distance: int = RELATIVE_MAX_DISTANCE
                             ) -> jax.Array:
    """Bidirectional T5-style bucketing (HF MPNet semantics)."""
    n = -relative_position
    num_buckets //= 2
    ret = (n < 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(n)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class MPNetAttention(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, hidden, bias, deterministic: bool):
        c = self.cfg
        hd = c.hidden_size // c.num_heads
        dense = lambda name: nn.DenseGeneral(
            (c.num_heads, hd), axis=-1, name=name, dtype=_dtype(c))
        q = dense("q")(hidden)
        k = dense("k")(hidden)
        v = dense("v")(hidden)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.float32(hd)) + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(_dtype(c))
        probs = nn.Dropout(c.attention_dropout)(probs,
                                                deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32).astype(_dtype(c))
        out = nn.DenseGeneral(c.hidden_size, axis=(-2, -1), name="o",
                              dtype=_dtype(c))(ctx)
        out = nn.Dropout(c.hidden_dropout)(out, deterministic=deterministic)
        return out


class MPNetLayer(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, hidden, bias, deterministic: bool):
        c = self.cfg
        attn = MPNetAttention(c, name="attention")(hidden, bias, deterministic)
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps,
                              name="attention_layer_norm",
                              dtype=jnp.float32)(attn + hidden).astype(_dtype(c))
        inter = nn.Dense(c.intermediate_size, name="intermediate",
                         dtype=_dtype(c))(hidden)
        inter = jax.nn.gelu(inter.astype(jnp.float32), approximate=False)
        inter = inter.astype(_dtype(c))
        out = nn.Dense(c.hidden_size, name="output", dtype=_dtype(c))(inter)
        out = nn.Dropout(c.hidden_dropout)(out, deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps,
                              name="output_layer_norm",
                              dtype=jnp.float32)(out + hidden).astype(_dtype(c))
        return hidden


class MPNetEncoder(nn.Module):
    """ids/mask → last hidden state (B, S, D); HF MPNetModel-equivalent."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask,
                 token_type_ids=None, deterministic: bool = True):
        c = self.cfg
        B, S = input_ids.shape
        pos_ids = padding_aware_position_ids(input_ids, c.pad_token_id)
        word = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings",
                        dtype=_dtype(c))(input_ids)
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size,
                       name="position_embeddings", dtype=_dtype(c))(pos_ids)
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embed_layer_norm",
                              dtype=jnp.float32)(word + pos)
        hidden = nn.Dropout(c.hidden_dropout)(hidden,
                                              deterministic=deterministic)
        hidden = hidden.astype(_dtype(c))

        # shared relative position bias (B, H, S, S)
        ctx_pos = jnp.arange(S)[:, None]
        mem_pos = jnp.arange(S)[None, :]
        buckets = relative_position_bucket(mem_pos - ctx_pos)  # (S, S)
        rel_bias = nn.Embed(RELATIVE_BUCKETS, c.num_heads,
                            name="relative_attention_bias",
                            dtype=jnp.float32)(buckets)       # (S, S, H)
        rel_bias = rel_bias.transpose(2, 0, 1)[None]           # (1, H, S, S)
        pad_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)
        bias = rel_bias + pad_bias.astype(jnp.float32)

        layer_cls = MPNetLayer
        if c.remat:
            layer_cls = nn.remat(MPNetLayer, static_argnums=(3,))
        for i in range(c.num_layers):
            hidden = layer_cls(c, name=f"layer_{i}")(hidden, bias,
                                                     deterministic)
        return hidden


def import_mpnet_params(state_dict, cfg: EncoderConfig):
    """HF MPNetModel state dict → MPNetEncoder params."""
    import numpy as np

    def _np(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return np.asarray(x, dtype=np.float32)

    sd = {k: _np(v) for k, v in state_dict.items()}
    # strip sentence-transformers prefixes if present
    for prefix in ("0.auto_model.", "auto_model.", "mpnet."):
        if prefix + "embeddings.word_embeddings.weight" in sd:
            sd = {k[len(prefix):]: v for k, v in sd.items()
                  if k.startswith(prefix)}
            break
    H, nh = cfg.hidden_size, cfg.num_heads
    hd = H // nh

    def dense(prefix):
        return {"kernel": sd[prefix + ".weight"].T,
                "bias": sd[prefix + ".bias"]}

    def head_dense(prefix):
        w, b = sd[prefix + ".weight"], sd[prefix + ".bias"]
        return {"kernel": w.T.reshape(H, nh, hd), "bias": b.reshape(nh, hd)}

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    params = {
        "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "position_embeddings": {
            "embedding": sd["embeddings.position_embeddings.weight"]},
        "embed_layer_norm": ln("embeddings.LayerNorm"),
        "relative_attention_bias": {
            "embedding": sd["encoder.relative_attention_bias.weight"]},
    }
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}"
        o_w = sd[f"{p}.attention.attn.o.weight"]
        params[f"layer_{i}"] = {
            "attention": {
                "q": head_dense(f"{p}.attention.attn.q"),
                "k": head_dense(f"{p}.attention.attn.k"),
                "v": head_dense(f"{p}.attention.attn.v"),
                "o": {"kernel": o_w.T.reshape(nh, hd, H),
                      "bias": sd[f"{p}.attention.attn.o.bias"]},
            },
            "attention_layer_norm": ln(f"{p}.attention.LayerNorm"),
            "intermediate": dense(f"{p}.intermediate.dense"),
            "output": dense(f"{p}.output.dense"),
            "output_layer_norm": ln(f"{p}.output.LayerNorm"),
        }
    return params
