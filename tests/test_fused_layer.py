"""Fused transformer-layer Pallas kernel vs the Flax/XLA encoder.

Runs in interpreter mode on the CPU mesh; the kernel's compiled path is
exercised on the real chip by benchmarks/encode_bench.py. Parity target:
``fused_encoder_forward`` must reproduce ``BertEncoder`` (deterministic)
— the transformer-forward capability the reference consumes from
sentence-transformers/torch (reference ir_evauation_script.py:130-131).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qst_tpu.core.config import EncoderConfig
from qst_tpu.models.sentence_encoder import embed_fn, init_params
from qst_tpu.ops.fused_layer_pallas import fused_embed_fn


def _cfg(**kw):
    base = dict(name="t", vocab_size=512, hidden_size=128, num_layers=2,
                num_heads=4, intermediate_size=256,
                max_position_embeddings=64, max_seq_length=32,
                dtype="float32")
    base.update(kw)
    return EncoderConfig(**base)


def _batch(cfg, B, S, seed=0, ragged=True):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, cfg.vocab_size, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    if ragged:
        lens = rng.integers(2, S + 1, B)
        for i in range(B):
            mask[i, lens[i]:] = 0
    return jnp.asarray(ids), jnp.asarray(mask)


class TestFusedLayerParity:
    def test_f32_parity_with_padding_mask(self):
        cfg = _cfg()
        params = init_params(cfg, jax.random.key(0))
        ids, mask = _batch(cfg, 8, 32)
        ref = embed_fn(cfg)(params, ids, mask)
        fus = fused_embed_fn(cfg, nb=4, interpret=True)(params, ids, mask)
        # in-kernel erf approximation contributes ≤1.5e-7 per GELU
        np.testing.assert_allclose(np.asarray(fus), np.asarray(ref),
                                   atol=5e-5, rtol=1e-4)

    def test_batch_not_multiple_of_nb_is_padded(self):
        cfg = _cfg()
        params = init_params(cfg, jax.random.key(1))
        ids, mask = _batch(cfg, 6, 32, seed=1)
        ref = embed_fn(cfg)(params, ids, mask)
        fus = fused_embed_fn(cfg, nb=4, interpret=True)(params, ids, mask)
        assert fus.shape == ref.shape == (6, cfg.hidden_size)
        np.testing.assert_allclose(np.asarray(fus), np.asarray(ref),
                                   atol=5e-5, rtol=1e-4)

    def test_bf16_parity(self):
        cfg = _cfg(dtype="bfloat16", normalize=True)
        params = init_params(cfg, jax.random.key(2))
        ids, mask = _batch(cfg, 8, 32, seed=2)
        ref = np.asarray(embed_fn(cfg)(params, ids, mask), np.float32)
        fus = np.asarray(
            fused_embed_fn(cfg, nb=8, interpret=True)(params, ids, mask),
            np.float32)
        cos = (ref * fus).sum(1) / (
            np.linalg.norm(ref, axis=1) * np.linalg.norm(fus, axis=1))
        assert cos.min() > 0.999, cos.min()

    def test_config_flag_routes_embed_fn(self):
        cfg = _cfg(use_fused_layer=True, fused_nb=4)
        params = init_params(cfg, jax.random.key(3))
        ids, mask = _batch(cfg, 4, 32, seed=3)
        via_flag = embed_fn(cfg)(params, ids, mask)
        direct = fused_embed_fn(cfg, nb=4, interpret=True)(params, ids, mask)
        np.testing.assert_allclose(np.asarray(via_flag), np.asarray(direct),
                                   atol=1e-6)

    def test_mpnet_parity(self):
        """MPNet variant: padding-aware positions + shared per-head relative
        bias through the same fused kernel (rel_bias input)."""
        cfg = EncoderConfig(
            name="t-mpnet", arch="mpnet", vocab_size=512, hidden_size=128,
            num_layers=2, num_heads=4, intermediate_size=256,
            max_position_embeddings=66, max_seq_length=32, dtype="float32",
            pad_token_id=1)
        params = init_params(cfg, jax.random.key(4))
        rng = np.random.default_rng(4)
        B, S = 6, 32
        ids = rng.integers(2, cfg.vocab_size, (B, S)).astype(np.int32)
        mask = np.ones((B, S), np.int32)
        for i in range(B):
            ln = rng.integers(2, S + 1)
            ids[i, ln:] = cfg.pad_token_id  # mpnet positions key off pad id
            mask[i, ln:] = 0
        ids, mask = jnp.asarray(ids), jnp.asarray(mask)
        ref = embed_fn(cfg)(params, ids, mask)
        fus = fused_embed_fn(cfg, nb=4, interpret=True)(params, ids, mask)
        np.testing.assert_allclose(np.asarray(fus), np.asarray(ref),
                                   atol=5e-5, rtol=1e-4)

    def test_unknown_arch_rejected(self):
        cfg = EncoderConfig.mpnet_base()
        object.__setattr__(cfg, "arch", "rnn")
        with pytest.raises(ValueError, match="bert"):
            fused_embed_fn(cfg)(None, None, None)

    def test_compiled_path_requires_nb_multiple_of_8(self):
        from qst_tpu.ops.fused_layer_pallas import fused_bert_layer

        x = jnp.zeros((4, 32, 128), jnp.float32)
        mb = jnp.zeros((4, 32), jnp.float32)
        with pytest.raises(ValueError, match="nb % 8"):
            fused_bert_layer(x, mb, {}, num_heads=4, nb=4, interpret=False)


class TestGeluErf:
    def test_erf_gelu_matches_exact(self):
        from qst_tpu.ops.fused_layer_pallas import _gelu_erf

        x = jnp.asarray(np.linspace(-6, 6, 4096), jnp.float32)
        got = np.asarray(_gelu_erf(x))
        want = np.asarray(jax.nn.gelu(x, approximate=False))
        np.testing.assert_allclose(got, want, atol=1e-6)
