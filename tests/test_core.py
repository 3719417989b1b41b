"""Core config / rng / mesh tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from qst_tpu.core.config import (
    ExperimentConfig,
    LossConfig,
    EncoderConfig,
    config_hash,
    load_config,
    save_config,
)
from qst_tpu.core.meshes import batch_sharding, corpus_sharding, make_mesh
from qst_tpu.core.rng import RngStream, seed_everything


def test_config_roundtrip(tmp_path):
    cfg = ExperimentConfig(loss=LossConfig(gamma=0.8, margin_pos_part=0.7))
    path = os.path.join(tmp_path, "cfg.json")
    save_config(cfg, path)
    loaded = load_config(path)
    assert loaded.loss.gamma == 0.8
    assert loaded.loss.margin_pos_part == 0.7
    assert loaded == cfg


def test_config_hash_stable_and_sensitive():
    a = ExperimentConfig()
    b = ExperimentConfig(loss=LossConfig(gamma=0.9))
    assert config_hash(a) == config_hash(ExperimentConfig())
    assert config_hash(a) != config_hash(b)
    assert len(config_hash(a)) == 64  # sha256 hex


def test_loss_config_validation():
    with pytest.raises(ValueError):
        LossConfig(gamma=2.0)
    with pytest.raises(ValueError):
        LossConfig(reduction="bad")


def test_encoder_presets():
    m = EncoderConfig.minilm_l6()
    assert (m.hidden_size, m.num_layers) == (384, 6)
    mp = EncoderConfig.mpnet_base()
    assert (mp.hidden_size, mp.num_layers) == (768, 12)
    t = EncoderConfig.tiny()
    assert t.hidden_size == 64


def test_rng_stream_deterministic():
    s1, s2 = RngStream(14), RngStream(14)
    k1, k2 = s1.next(), s2.next()
    assert jnp.array_equal(jax.random.key_data(k1), jax.random.key_data(k2))
    fork = s1.fork("mining")
    k3 = fork.next()
    assert not jnp.array_equal(jax.random.key_data(k3), jax.random.key_data(s1.next()))


def test_seed_everything_reproducible():
    seed_everything(14)
    a = np.random.rand(3)
    seed_everything(14)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)


def test_make_mesh_shapes(devices):
    m = make_mesh(data=4, model=2, devices=devices)
    assert m.shape == {"data": 4, "model": 2}
    m1 = make_mesh(devices=devices)  # data=-1 → all 8
    assert m1.shape == {"data": 8, "model": 1}
    # sub-world meshes take a device prefix
    m2 = make_mesh(data=3, model=2, devices=devices)
    assert m2.shape == {"data": 3, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=5, model=2, devices=devices)  # needs 10 > 8


def test_sharded_batch_put(mesh8):
    x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)
    xs = jax.device_put(x, batch_sharding(mesh8))
    assert xs.sharding == NamedSharding(mesh8, P("data"))
    y = jax.jit(lambda a: a * 2)(xs)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 2)


def test_corpus_sharding_covers_all_devices(mesh8):
    c = jnp.ones((64, 16))
    cs = jax.device_put(c, corpus_sharding(mesh8))
    assert len(cs.sharding.device_set) == 8
