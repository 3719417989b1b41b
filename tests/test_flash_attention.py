"""Flash-attention encoder path: gating logic + (on CPU) fallback parity.

The fused kernel itself only compiles for TPU; on the CPU test mesh we verify
the gate decisions and that short sequences use the einsum path. TPU parity
is exercised in verification drivers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qst_tpu.core.config import EncoderConfig
from qst_tpu.models.bert import _flash_attention_available
from qst_tpu.models.sentence_encoder import SentenceEncoderModule, init_params


def test_flash_gate():
    on = EncoderConfig.tiny(use_flash_attention=True)
    off = EncoderConfig.tiny(use_flash_attention=False)
    assert not _flash_attention_available(off, 128, True)
    assert _flash_attention_available(on, 128, True)
    assert _flash_attention_available(on, 256, True)
    assert not _flash_attention_available(on, 64, True)    # too short
    assert not _flash_attention_available(on, 130, True)   # not 128-aligned
    # dropout active during training → fallback
    assert not _flash_attention_available(on, 128, False)
    nodrop = EncoderConfig.tiny(use_flash_attention=True,
                                attention_dropout=0.0)
    assert _flash_attention_available(nodrop, 128, False)


def test_flash_config_short_seq_runs_on_cpu():
    """With flash enabled but S < 128 the einsum fallback must be used, so
    the model runs on the CPU backend unchanged."""
    cfg = EncoderConfig.tiny(use_flash_attention=True)
    params = init_params(cfg, jax.random.key(0))
    ids = jnp.ones((2, cfg.max_seq_length), jnp.int32)
    mask = jnp.ones((2, cfg.max_seq_length), jnp.int32)
    out = SentenceEncoderModule(cfg).apply({"params": params}, ids, mask)
    assert np.isfinite(np.asarray(out["sentence_embedding"])).all()


def test_flash_params_identical_to_einsum_path():
    """The flash flag must not change the parameter tree (same checkpoint
    loads either way)."""
    p1 = init_params(EncoderConfig.tiny(use_flash_attention=True),
                     jax.random.key(0))
    p2 = init_params(EncoderConfig.tiny(use_flash_attention=False),
                     jax.random.key(0))
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
