"""Flax Marian-equivalent seq2seq with jitted greedy decode.

TPU-native replacement for the MarianMT generation the reference's
backtranslation consumes through torch (``model.generate`` at reference
backtranslation.py:84; SURVEY.md §2.3 "JAX greedy/beam decode loop over a
Flax Marian-equivalent"). Architecture matches HF ``MarianMTModel``
(BART-style post-LN encoder/decoder, sinusoidal positions, shared embeddings,
scaled query attention, final-logits bias) so local checkpoints import with
numerical parity (tested against a random-weight ``transformers.MarianMTModel``
— no network needed).

Decoding is a ``lax.fori_loop`` over positions with static shapes (the
XLA-friendly formulation). Both full-prefix decoders and KV-cached variants
(``greedy_decode_cached``, ``beam_decode_cached`` — O(1) decoder work per
token) are provided and token-identical.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass(frozen=True)
class Seq2SeqConfig:
    vocab_size: int = 58101
    d_model: int = 512
    encoder_layers: int = 6
    decoder_layers: int = 6
    num_heads: int = 8
    ffn_dim: int = 2048
    max_position_embeddings: int = 512
    pad_token_id: int = 58100
    eos_token_id: int = 0
    decoder_start_token_id: int = 58100
    scale_embedding: bool = True
    activation: str = "swish"  # Helsinki-NLP checkpoints use swish (silu)
    layer_norm_eps: float = 1e-5

    @staticmethod
    def tiny(**overrides: Any) -> "Seq2SeqConfig":
        base = dict(vocab_size=100, d_model=32, encoder_layers=2,
                    decoder_layers=2, num_heads=4, ffn_dim=64,
                    max_position_embeddings=64, pad_token_id=99,
                    eos_token_id=0, decoder_start_token_id=99,
                    scale_embedding=False, activation="gelu")
        base.update(overrides)
        return Seq2SeqConfig(**base)


def sinusoidal_positions(n_pos: int, dim: int) -> np.ndarray:
    """HF Marian sinusoidal table: sin block then cos block."""
    pos_enc = np.array(
        [[p / np.power(10000, 2 * (j // 2) / dim) for j in range(dim)]
         for p in range(n_pos)], dtype=np.float32)
    out = np.zeros((n_pos, dim), np.float32)
    sentinel = dim // 2 + dim % 2
    out[:, :sentinel] = np.sin(pos_enc[:, 0::2])
    out[:, sentinel:] = np.cos(pos_enc[:, 1::2])
    return out


def _act(name: str):
    if name in ("swish", "silu"):
        return jax.nn.silu
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"unknown activation {name}")


class MarianAttention(nn.Module):
    cfg: Seq2SeqConfig

    def setup(self):
        c = self.cfg
        self.q_proj = nn.Dense(c.d_model, name="q_proj")
        self.k_proj = nn.Dense(c.d_model, name="k_proj")
        self.v_proj = nn.Dense(c.d_model, name="v_proj")
        self.out_proj = nn.Dense(c.d_model, name="out_proj")

    def _heads(self, x):
        c = self.cfg
        hd = c.d_model // c.num_heads
        return x.reshape(*x.shape[:-1], c.num_heads, hd)

    def _attend(self, q, k, v, bias):
        c = self.cfg
        B, Tq = q.shape[0], q.shape[1]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits + bias, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32)
        return self.out_proj(ctx.reshape(B, Tq, c.d_model))

    def __call__(self, hidden, kv, bias):
        hd = self.cfg.d_model // self.cfg.num_heads
        q = self._heads(self.q_proj(hidden) * (hd ** -0.5))
        k = self._heads(self.k_proj(kv))
        v = self._heads(self.v_proj(kv))
        return self._attend(q, k, v, bias)

    def project_kv(self, kv):
        """Precompute (k, v) heads — cross-attention cache entries."""
        return self._heads(self.k_proj(kv)), self._heads(self.v_proj(kv))

    def step(self, hidden_t, k_cache, v_cache, bias):
        """Single-token attention against a cached (B, L, nh, hd) k/v."""
        hd = self.cfg.d_model // self.cfg.num_heads
        q = self._heads(self.q_proj(hidden_t) * (hd ** -0.5))  # (B, 1, nh, hd)
        return self._attend(q, k_cache, v_cache, bias)

    def append_kv(self, hidden_t, k_cache, v_cache, t):
        """Write this token's k/v into position t of the caches."""
        k_new = self._heads(self.k_proj(hidden_t))  # (B, 1, nh, hd)
        v_new = self._heads(self.v_proj(hidden_t))
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_new.astype(k_cache.dtype), (0, t, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_new.astype(v_cache.dtype), (0, t, 0, 0))
        return k_cache, v_cache


class MarianEncoderLayer(nn.Module):
    cfg: Seq2SeqConfig

    @nn.compact
    def __call__(self, hidden, bias):
        c = self.cfg
        attn = MarianAttention(c, name="self_attn")(hidden, hidden, bias)
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps,
                              name="self_attn_layer_norm")(hidden + attn)
        ff = nn.Dense(c.ffn_dim, name="fc1")(hidden)
        ff = _act(c.activation)(ff)
        ff = nn.Dense(c.d_model, name="fc2")(ff)
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps,
                              name="final_layer_norm")(hidden + ff)
        return hidden


class MarianDecoderLayer(nn.Module):
    cfg: Seq2SeqConfig

    def setup(self):
        c = self.cfg
        self.self_attn = MarianAttention(c, name="self_attn")
        self.self_attn_layer_norm = nn.LayerNorm(
            epsilon=c.layer_norm_eps, name="self_attn_layer_norm")
        self.encoder_attn = MarianAttention(c, name="encoder_attn")
        self.encoder_attn_layer_norm = nn.LayerNorm(
            epsilon=c.layer_norm_eps, name="encoder_attn_layer_norm")
        self.fc1 = nn.Dense(c.ffn_dim, name="fc1")
        self.fc2 = nn.Dense(c.d_model, name="fc2")
        self.final_layer_norm = nn.LayerNorm(
            epsilon=c.layer_norm_eps, name="final_layer_norm")

    def _ffn(self, hidden):
        ff = self.fc2(_act(self.cfg.activation)(self.fc1(hidden)))
        return self.final_layer_norm(hidden + ff)

    def __call__(self, hidden, enc_out, self_bias, cross_bias):
        attn = self.self_attn(hidden, hidden, self_bias)
        hidden = self.self_attn_layer_norm(hidden + attn)
        cross = self.encoder_attn(hidden, enc_out, cross_bias)
        hidden = self.encoder_attn_layer_norm(hidden + cross)
        return self._ffn(hidden)

    def step(self, hidden_t, cache, cross_bias, self_bias, t):
        """Single-token step with KV cache: → (hidden_t, updated cache).

        cache = {"self_k", "self_v" (B, L, nh, hd), "cross_k", "cross_v"}.
        """
        k_c, v_c = self.self_attn.append_kv(
            hidden_t, cache["self_k"], cache["self_v"], t)
        attn = self.self_attn.step(hidden_t, k_c, v_c, self_bias)
        hidden_t = self.self_attn_layer_norm(hidden_t + attn)
        cross = self.encoder_attn.step(
            hidden_t, cache["cross_k"], cache["cross_v"], cross_bias)
        hidden_t = self.encoder_attn_layer_norm(hidden_t + cross)
        new_cache = {**cache, "self_k": k_c, "self_v": v_c}
        return self._ffn(hidden_t), new_cache

    def init_cross_cache(self, enc_out):
        k, v = self.encoder_attn.project_kv(enc_out)
        return k, v


def _mask_bias(mask):  # (B, T) → (B, 1, 1, T) additive
    return jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9).astype(jnp.float32)


def _suppress_bias(vocab_size: int, suppress_tokens) -> jnp.ndarray:
    """(V,) additive bias: -1e9 at suppressed ids, 0 elsewhere.

    Matches HF's ``bad_words_ids`` / ``NoBadWordsLogitsProcessor`` for
    single-token bad words (real Marian checkpoints ship
    ``bad_words_ids=[[pad_token_id]]``). HF applies the processor AFTER
    ``log_softmax`` in beam search, so the bias is added to log-probs
    without renormalization — we do the same.
    """
    bias = np.zeros((vocab_size,), np.float32)
    for t in suppress_tokens:
        bias[int(t)] = -1e9
    return jnp.asarray(bias)


def _forced_eos_mask(logp, t, max_length: int, eos_id: int):
    """HF ``ForcedEOSTokenLogitsProcessor``: at the final generated slot,
    every non-EOS continuation is -inf while EOS keeps its score."""
    V = logp.shape[-1]
    is_last = t == (max_length - 2)
    non_eos = jax.lax.broadcasted_iota(jnp.int32, (V,), 0) != eos_id
    return jnp.where(is_last & non_eos, -1e9, 0.0).astype(logp.dtype) + logp


def _forced_eos_id(forced_eos, cfg) -> Optional[int]:
    """Resolve the HF ``forced_eos_token_id`` setting: ``False``/``None`` →
    off, ``True`` → ``cfg.eos_token_id`` (the common Marian case), an int →
    that token id — HF allows ``forced_eos_token_id != eos_token_id``, so
    the forced token must come from the checkpoint config, not ``cfg``."""
    if forced_eos is False or forced_eos is None:
        return None
    if forced_eos is True:
        return cfg.eos_token_id
    return int(forced_eos)


class MarianModule(nn.Module):
    """Full encoder-decoder; __call__ → decoder vocab logits."""

    cfg: Seq2SeqConfig

    def setup(self):
        c = self.cfg
        self.shared = nn.Embed(c.vocab_size, c.d_model, name="shared")
        self.positions = self.param(
            "embed_positions",
            lambda key, shape: jnp.asarray(
                sinusoidal_positions(c.max_position_embeddings, c.d_model)),
            (c.max_position_embeddings, c.d_model))
        self.encoder_layers_ = [
            MarianEncoderLayer(c, name=f"encoder_layer_{i}")
            for i in range(c.encoder_layers)]
        self.decoder_layers_ = [
            MarianDecoderLayer(c, name=f"decoder_layer_{i}")
            for i in range(c.decoder_layers)]
        self.final_logits_bias = self.param(
            "final_logits_bias", nn.initializers.zeros, (c.vocab_size,))

    def _embed(self, ids):
        c = self.cfg
        scale = float(np.sqrt(c.d_model)) if c.scale_embedding else 1.0
        x = self.shared(ids) * scale
        T = ids.shape[1]
        return x + self.positions[None, :T, :]

    def encode(self, input_ids, attention_mask):
        hidden = self._embed(input_ids)
        bias = _mask_bias(attention_mask)
        for layer in self.encoder_layers_:
            hidden = layer(hidden, bias)
        return hidden

    def decode(self, decoder_ids, decoder_mask, enc_out, enc_mask):
        hidden = self._embed(decoder_ids)
        T = decoder_ids.shape[1]
        causal = jnp.tril(jnp.ones((T, T), jnp.float32))[None, None]
        pad = decoder_mask[:, None, None, :].astype(jnp.float32)
        self_bias = jnp.where((causal * pad) > 0, 0.0, -1e9)
        cross_bias = _mask_bias(enc_mask)
        for layer in self.decoder_layers_:
            hidden = layer(hidden, enc_out, self_bias, cross_bias)
        logits = jnp.einsum("btd,vd->btv", hidden,
                            self.shared.embedding,
                            preferred_element_type=jnp.float32)
        return logits + self.final_logits_bias[None, None, :]

    def __call__(self, input_ids, attention_mask, decoder_ids, decoder_mask):
        enc = self.encode(input_ids, attention_mask)
        return self.decode(decoder_ids, decoder_mask, enc, attention_mask)

    # -- KV-cached single-token decoding (O(L) generation) ------------------
    def init_decode_cache(self, enc_out, max_length: int):
        """Per-layer KV caches: empty self-attn slots + precomputed
        cross-attn projections of the encoder output."""
        c = self.cfg
        B = enc_out.shape[0]
        nh, hd = c.num_heads, c.d_model // c.num_heads
        caches = []
        for layer in self.decoder_layers_:
            ck, cv = layer.init_cross_cache(enc_out)
            caches.append({
                "self_k": jnp.zeros((B, max_length, nh, hd), jnp.float32),
                "self_v": jnp.zeros((B, max_length, nh, hd), jnp.float32),
                "cross_k": ck,
                "cross_v": cv,
            })
        return caches

    def decode_token(self, tok_t, t, enc_mask, caches):
        """One decoder step: tok_t (B, 1) at position t → (logits (B, V),
        updated caches)."""
        c = self.cfg
        scale = float(np.sqrt(c.d_model)) if c.scale_embedding else 1.0
        x = self.shared(tok_t) * scale
        pos = jax.lax.dynamic_slice(self.positions, (t, 0), (1, c.d_model))
        hidden_t = x + pos[None, :, :]
        L = caches[0]["self_k"].shape[1]
        # attend over cache slots 0..t only
        slot = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, L), 3)
        self_bias = jnp.where(slot <= t, 0.0, -1e9).astype(jnp.float32)
        cross_bias = _mask_bias(enc_mask)
        new_caches = []
        for layer, cache in zip(self.decoder_layers_, caches):
            hidden_t, cache = layer.step(hidden_t, cache, cross_bias,
                                         self_bias, t)
            new_caches.append(cache)
        logits = jnp.einsum("btd,vd->btv", hidden_t, self.shared.embedding,
                            preferred_element_type=jnp.float32)
        return (logits + self.final_logits_bias[None, None, :])[:, 0, :], \
            new_caches


def init_seq2seq(cfg: Seq2SeqConfig, rng: jax.Array):
    model = MarianModule(cfg)
    z = jnp.zeros((2, 8), jnp.int32)
    m = jnp.ones((2, 8), jnp.int32)
    return model.init({"params": rng}, z, m, z, m)["params"]


@functools.partial(jax.jit, static_argnames=("cfg", "max_length",
                                              "suppress_tokens", "forced_eos"))
def greedy_decode(params, input_ids, attention_mask, cfg: Seq2SeqConfig,
                  max_length: int = 64, suppress_tokens: tuple = (),
                  forced_eos: bool = False) -> jax.Array:
    """Greedy generation, static shapes: → (B, max_length) token ids
    (decoder-start prefix included; pads after EOS).

    ``suppress_tokens`` / ``forced_eos`` mirror HF ``bad_words_ids`` (single
    tokens) and ``forced_eos_token_id`` — real Marian checkpoints use both.
    """
    model = MarianModule(cfg)
    B = input_ids.shape[0]
    enc = model.apply({"params": params}, input_ids, attention_mask,
                      method=MarianModule.encode)
    sup = _suppress_bias(cfg.vocab_size, suppress_tokens)
    feos = _forced_eos_id(forced_eos, cfg)

    tokens = jnp.full((B, max_length), cfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(cfg.decoder_start_token_id)
    done = jnp.zeros((B,), bool)

    def body(t, carry):
        tokens, done = carry
        dec_mask = (jnp.arange(max_length)[None, :] <= t).astype(jnp.int32)
        dec_mask = jnp.broadcast_to(dec_mask, (B, max_length))
        logits = model.apply({"params": params}, tokens, dec_mask, enc,
                             attention_mask, method=MarianModule.decode)
        step = logits[:, t, :] + sup[None, :]
        if feos is not None:
            step = _forced_eos_mask(step, t, max_length, feos)
        nxt = jnp.argmax(step, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.pad_token_id, nxt)
        tokens = tokens.at[:, t + 1].set(nxt)
        done = done | (nxt == cfg.eos_token_id)
        return tokens, done

    tokens, _ = jax.lax.fori_loop(0, max_length - 1, body, (tokens, done))
    return tokens


@functools.partial(jax.jit, static_argnames=("cfg", "max_length",
                                              "suppress_tokens", "forced_eos"))
def greedy_decode_cached(params, input_ids, attention_mask,
                         cfg: Seq2SeqConfig,
                         max_length: int = 64, suppress_tokens: tuple = (),
                         forced_eos: bool = False) -> jax.Array:
    """KV-cached greedy generation: one O(1) decoder step per token instead
    of re-running the full prefix (O(L) total vs O(L²)); token-identical to
    :func:`greedy_decode`."""
    model = MarianModule(cfg)
    B = input_ids.shape[0]
    enc = model.apply({"params": params}, input_ids, attention_mask,
                      method=MarianModule.encode)
    caches = model.apply({"params": params}, enc, max_length,
                         method=MarianModule.init_decode_cache)
    sup = _suppress_bias(cfg.vocab_size, suppress_tokens)
    feos = _forced_eos_id(forced_eos, cfg)

    tokens = jnp.full((B, max_length), cfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(cfg.decoder_start_token_id)
    done = jnp.zeros((B,), bool)

    def body(t, carry):
        tokens, done, caches = carry
        tok_t = jax.lax.dynamic_slice(tokens, (0, t), (B, 1))
        logits, caches = model.apply(
            {"params": params}, tok_t, t, attention_mask, caches,
            method=MarianModule.decode_token)
        step = logits + sup[None, :]
        if feos is not None:
            step = _forced_eos_mask(step, t, max_length, feos)
        nxt = jnp.argmax(step, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.pad_token_id, nxt)
        tokens = tokens.at[:, t + 1].set(nxt)
        done = done | (nxt == cfg.eos_token_id)
        return tokens, done, caches

    tokens, _, _ = jax.lax.fori_loop(0, max_length - 1, body,
                                     (tokens, done, caches))
    return tokens


@functools.partial(jax.jit,
                   static_argnames=("cfg", "max_length", "num_beams",
                                    "length_penalty", "suppress_tokens",
                                    "forced_eos"))
def beam_decode(params, input_ids, attention_mask, cfg: Seq2SeqConfig,
                max_length: int = 64, num_beams: int = 4,
                length_penalty: float = 1.0, suppress_tokens: tuple = (),
                forced_eos: bool = False) -> jax.Array:
    """Beam-search generation (static shapes): → (B, max_length) best beam.

    Standard sequence beam search with HF-style length penalty
    ``score / ((5+len)/6)^alpha``-free simple form ``score / len^alpha``
    applied at finalization; finished beams (emitted EOS) hold their score
    and emit only PAD afterwards. Matches ``MarianMTModel.generate`` with
    ``num_beams=n, do_sample=False, length_penalty=1.0`` on short sequences
    (parity-tested with random weights).
    """
    model = MarianModule(cfg)
    B = input_ids.shape[0]
    V = cfg.vocab_size
    K = num_beams
    NEG = -1e9

    enc = model.apply({"params": params}, input_ids, attention_mask,
                      method=MarianModule.encode)
    # expand encoder state per beam: (B*K, S, D)
    enc_k = jnp.repeat(enc, K, axis=0)
    mask_k = jnp.repeat(attention_mask, K, axis=0)
    sup = _suppress_bias(cfg.vocab_size, suppress_tokens)
    feos = _forced_eos_id(forced_eos, cfg)

    tokens = jnp.full((B, K, max_length), cfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, :, 0].set(cfg.decoder_start_token_id)
    # beam 0 active, others start at -inf so step 1 fans out from beam 0
    scores = jnp.tile(jnp.array([0.0] + [NEG] * (K - 1), jnp.float32), (B, 1))
    done = jnp.zeros((B, K), bool)
    lengths = jnp.ones((B, K), jnp.int32)  # generated-token counts

    def body(t, carry):
        tokens, scores, done, lengths = carry
        flat_tokens = tokens.reshape(B * K, max_length)
        dec_mask = (jnp.arange(max_length)[None, :] <= t).astype(jnp.int32)
        dec_mask = jnp.broadcast_to(dec_mask, (B * K, max_length))
        logits = model.apply({"params": params}, flat_tokens, dec_mask,
                             enc_k, mask_k, method=MarianModule.decode)
        logp = jax.nn.log_softmax(logits[:, t, :].astype(jnp.float32), -1)
        logp = logp + sup[None, :]
        if feos is not None:
            logp = _forced_eos_mask(logp, t, max_length, feos)
        logp = logp.reshape(B, K, V)
        # finished beams may only extend with PAD at zero cost
        pad_only = jnp.full((V,), NEG).at[cfg.pad_token_id].set(0.0)
        logp = jnp.where(done[:, :, None], pad_only[None, None, :], logp)

        cand = scores[:, :, None] + logp                 # (B, K, V)
        flat = cand.reshape(B, K * V)
        top_s, top_i = jax.lax.top_k(flat, K)            # (B, K)
        beam_idx = top_i // V
        tok_idx = (top_i % V).astype(jnp.int32)

        tokens = jnp.take_along_axis(
            tokens, beam_idx[:, :, None], axis=1)
        done = jnp.take_along_axis(done, beam_idx, axis=1)
        lengths = jnp.take_along_axis(lengths, beam_idx, axis=1)
        tokens = tokens.at[:, :, t + 1].set(
            jnp.where(done, cfg.pad_token_id, tok_idx))
        lengths = jnp.where(done, lengths, lengths + 1)
        done = done | (tok_idx == cfg.eos_token_id)
        return tokens, top_s, done, lengths

    tokens, scores, done, lengths = jax.lax.fori_loop(
        0, max_length - 1, body, (tokens, scores, done, lengths))
    final = scores / jnp.power(lengths.astype(jnp.float32), length_penalty)
    best = jnp.argmax(final, axis=1)
    return jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0, :]


@functools.partial(jax.jit,
                   static_argnames=("cfg", "max_length", "num_beams",
                                    "length_penalty", "suppress_tokens",
                                    "forced_eos"))
def beam_decode_cached(params, input_ids, attention_mask, cfg: Seq2SeqConfig,
                       max_length: int = 64, num_beams: int = 4,
                       length_penalty: float = 1.0,
                       suppress_tokens: tuple = (),
                       forced_eos: bool = False) -> jax.Array:
    """KV-cached beam search: O(1) decoder work per (beam, token); beam
    reordering gathers the self-attention caches along the beam axis.
    Token-identical to :func:`beam_decode`."""
    model = MarianModule(cfg)
    B = input_ids.shape[0]
    V, K = cfg.vocab_size, num_beams
    NEG = -1e9

    enc = model.apply({"params": params}, input_ids, attention_mask,
                      method=MarianModule.encode)
    enc_k = jnp.repeat(enc, K, axis=0)                    # (B*K, S, D)
    mask_k = jnp.repeat(attention_mask, K, axis=0)
    caches = model.apply({"params": params}, enc_k, max_length,
                         method=MarianModule.init_decode_cache)
    sup = _suppress_bias(cfg.vocab_size, suppress_tokens)
    feos = _forced_eos_id(forced_eos, cfg)

    tokens = jnp.full((B, K, max_length), cfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, :, 0].set(cfg.decoder_start_token_id)
    scores = jnp.tile(jnp.array([0.0] + [NEG] * (K - 1), jnp.float32), (B, 1))
    done = jnp.zeros((B, K), bool)
    lengths = jnp.ones((B, K), jnp.int32)

    def reorder(cache_leaf, beam_idx):
        # (B*K, L, nh, hd) gathered along the beam axis per batch row
        BK = cache_leaf.shape[0]
        leaf = cache_leaf.reshape(B, K, *cache_leaf.shape[1:])
        idx = beam_idx.reshape(B, K, 1, 1, 1)
        leaf = jnp.take_along_axis(leaf, idx, axis=1)
        return leaf.reshape(BK, *cache_leaf.shape[1:])

    def body(t, carry):
        tokens, scores, done, lengths, caches = carry
        tok_t = jax.lax.dynamic_slice(
            tokens.reshape(B * K, max_length), (0, t), (B * K, 1))
        logits, caches = model.apply(
            {"params": params}, tok_t, t, mask_k, caches,
            method=MarianModule.decode_token)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        logp = logp + sup[None, :]
        if feos is not None:
            logp = _forced_eos_mask(logp, t, max_length, feos)
        logp = logp.reshape(B, K, V)
        pad_only = jnp.full((V,), NEG).at[cfg.pad_token_id].set(0.0)
        logp = jnp.where(done[:, :, None], pad_only[None, None, :], logp)

        cand = scores[:, :, None] + logp
        top_s, top_i = jax.lax.top_k(cand.reshape(B, K * V), K)
        beam_idx = top_i // V
        tok_idx = (top_i % V).astype(jnp.int32)

        tokens = jnp.take_along_axis(tokens, beam_idx[:, :, None], axis=1)
        done = jnp.take_along_axis(done, beam_idx, axis=1)
        lengths = jnp.take_along_axis(lengths, beam_idx, axis=1)
        # reorder self-attention caches to follow the surviving beams
        caches = [
            {**c,
             "self_k": reorder(c["self_k"], beam_idx),
             "self_v": reorder(c["self_v"], beam_idx)}
            for c in caches
        ]
        tokens = tokens.at[:, :, t + 1].set(
            jnp.where(done, cfg.pad_token_id, tok_idx))
        lengths = jnp.where(done, lengths, lengths + 1)
        done = done | (tok_idx == cfg.eos_token_id)
        return tokens, top_s, done, lengths, caches

    tokens, scores, done, lengths, _ = jax.lax.fori_loop(
        0, max_length - 1, body, (tokens, scores, done, lengths, caches))
    final = scores / jnp.power(lengths.astype(jnp.float32), length_penalty)
    best = jnp.argmax(final, axis=1)
    return jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0, :]


# ---------------------------------------------------------------------------
# HF MarianMTModel import
# ---------------------------------------------------------------------------

def import_marian_params(state_dict: Mapping[str, Any],
                         cfg: Seq2SeqConfig) -> Dict[str, Any]:
    def _np(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return np.asarray(x, dtype=np.float32)

    sd = {k: _np(v) for k, v in state_dict.items()}

    def dense(prefix):
        return {"kernel": sd[prefix + ".weight"].T,
                "bias": sd[prefix + ".bias"]}

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    def attn(prefix):
        return {
            "q_proj": dense(prefix + ".q_proj"),
            "k_proj": dense(prefix + ".k_proj"),
            "v_proj": dense(prefix + ".v_proj"),
            "out_proj": dense(prefix + ".out_proj"),
        }

    def first(*keys):
        for k in keys:
            if k in sd:
                return sd[k]
        return None

    # tied-weight dedup (safetensors drops duplicates) and non-persistent
    # buffers make these keys vary across save paths; fall back gracefully
    shared = first("model.shared.weight", "model.encoder.embed_tokens.weight",
                   "model.decoder.embed_tokens.weight", "lm_head.weight")
    if shared is None:
        raise KeyError("no shared-embedding weight in Marian state dict")
    positions = first("model.encoder.embed_positions.weight",
                      "model.decoder.embed_positions.weight")
    if positions is None:  # deterministic sinusoids — recompute
        positions = sinusoidal_positions(cfg.max_position_embeddings,
                                         cfg.d_model)
    bias = first("final_logits_bias")
    if bias is None:
        bias = np.zeros((cfg.vocab_size,), np.float32)
    params: Dict[str, Any] = {
        "shared": {"embedding": shared},
        "embed_positions": positions[: cfg.max_position_embeddings],
        "final_logits_bias": bias.reshape(-1),
    }
    for i in range(cfg.encoder_layers):
        p = f"model.encoder.layers.{i}"
        params[f"encoder_layer_{i}"] = {
            "self_attn": attn(p + ".self_attn"),
            "self_attn_layer_norm": ln(p + ".self_attn_layer_norm"),
            "fc1": dense(p + ".fc1"),
            "fc2": dense(p + ".fc2"),
            "final_layer_norm": ln(p + ".final_layer_norm"),
        }
    for i in range(cfg.decoder_layers):
        p = f"model.decoder.layers.{i}"
        params[f"decoder_layer_{i}"] = {
            "self_attn": attn(p + ".self_attn"),
            "self_attn_layer_norm": ln(p + ".self_attn_layer_norm"),
            "encoder_attn": attn(p + ".encoder_attn"),
            "encoder_attn_layer_norm": ln(p + ".encoder_attn_layer_norm"),
            "fc1": dense(p + ".fc1"),
            "fc2": dense(p + ".fc2"),
            "final_layer_norm": ln(p + ".final_layer_norm"),
        }
    return params


class JaxBacktranslator:
    """en→fr→en roundtrip on the JAX seq2seq (TPU generation path).

    tokenizers must provide ``batch_encode(texts, max_length) -> (ids, mask)``
    and ``decode(ids) -> str``; models are (cfg, params) pairs.
    """

    def __init__(self, fwd: Tuple[Seq2SeqConfig, Any], bwd, tok_fwd, tok_bwd,
                 max_length: int = 64):
        self.fwd_cfg, self.fwd_params = fwd
        self.bwd_cfg, self.bwd_params = bwd
        self.tok_fwd, self.tok_bwd = tok_fwd, tok_bwd
        self.max_length = max_length

    def _translate(self, texts, cfg, params, tok):
        ids, mask = tok.batch_encode(list(texts), max_length=self.max_length)
        out = greedy_decode_cached(params, jnp.asarray(ids),
                                   jnp.asarray(mask), cfg, self.max_length)
        out = np.asarray(out)
        results = []
        for row in out:
            toks = []
            for t in row[1:]:  # skip decoder-start
                if t == cfg.eos_token_id or t == cfg.pad_token_id:
                    break
                toks.append(int(t))
            results.append(tok.decode(toks))
        return results

    def backtranslate(self, texts):
        fr = self._translate(texts, self.fwd_cfg, self.fwd_params, self.tok_fwd)
        return self._translate(fr, self.bwd_cfg, self.bwd_params, self.tok_bwd)
