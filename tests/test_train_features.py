"""Gradient accumulation + rematerialization features."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qst_tpu.core.config import EncoderConfig, LossConfig, TrainConfig
from qst_tpu.models.sentence_encoder import SentenceEncoderModule, init_params
from qst_tpu.train.train_step import create_train_state, make_train_step

TINY = EncoderConfig.tiny()
LOSS = LossConfig(margin_pos_part=0.5, margin_part_neg=0.5)


def test_remat_outputs_and_grads_match():
    cfg_plain = EncoderConfig.tiny(hidden_dropout=0.0, attention_dropout=0.0)
    cfg_remat = EncoderConfig.tiny(hidden_dropout=0.0, attention_dropout=0.0,
                                   remat=True)
    params = init_params(cfg_plain, jax.random.key(0))
    ids = jnp.ones((2, cfg_plain.max_seq_length), jnp.int32) * 7
    mask = jnp.ones_like(ids)

    def emb(cfg):
        def f(p):
            return SentenceEncoderModule(cfg).apply(
                {"params": p}, ids, mask)["sentence_embedding"].sum()
        return f

    # remat must not change the parameter tree, outputs, or gradients
    v1, g1 = jax.value_and_grad(emb(cfg_plain))(params)
    v2, g2 = jax.value_and_grad(emb(cfg_remat))(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_gradient_accumulation_matches_full_batch():
    """N micro-steps with accumulation == 1 step on the concatenated batch
    (mean loss => averaged grads; update fires on the N-th micro-step)."""
    rng = np.random.default_rng(0)
    S = TINY.max_seq_length
    micro1 = rng.integers(5, TINY.vocab_size, (4, 4, S)).astype(np.int32)
    micro2 = rng.integers(5, TINY.vocab_size, (4, 4, S)).astype(np.int32)
    full = np.concatenate([micro1, micro2], axis=1)  # (4, 8, S)
    mask4 = np.ones_like(micro1)
    mask8 = np.ones_like(full)

    # accumulated: 2 micro-steps
    tcfg_acc = TrainConfig(batch_size=4, learning_rate=1e-3,
                           scheduler="constantlr",
                           gradient_accumulation_steps=2)
    # dropout must be off for exact parity
    cfg = EncoderConfig.tiny(hidden_dropout=0.0, attention_dropout=0.0)
    state_a, tx_a = create_train_state(cfg, tcfg_acc, jax.random.key(0), 50,
                                       LOSS)
    step_a = make_train_step(cfg, LOSS, tx_a)
    state_a, l1 = step_a(state_a, jnp.asarray(micro1), jnp.asarray(mask4),
                         jax.random.key(1))
    state_a, l2 = step_a(state_a, jnp.asarray(micro2), jnp.asarray(mask4),
                         jax.random.key(1))

    # full batch single step
    tcfg_full = TrainConfig(batch_size=8, learning_rate=1e-3,
                            scheduler="constantlr")
    state_f, tx_f = create_train_state(cfg, tcfg_full, jax.random.key(0), 50,
                                       LOSS)
    step_f = make_train_step(cfg, LOSS, tx_f)
    state_f, lf = step_f(state_f, jnp.asarray(full), jnp.asarray(mask8),
                         jax.random.key(1))

    np.testing.assert_allclose(float(lf), (float(l1) + float(l2)) / 2,
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
    # crucially: after only ONE micro-step params must be unchanged
    state_c, tx_c = create_train_state(cfg, tcfg_acc, jax.random.key(0), 50,
                                       LOSS)
    init_leaf = np.array(jax.tree.leaves(state_c.params)[0])
    step_c = make_train_step(cfg, LOSS, tx_c)
    state_c, _ = step_c(state_c, jnp.asarray(micro1), jnp.asarray(mask4),
                        jax.random.key(1))
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state_c.params)[0]), init_leaf)


def test_accumulation_inside_multi_step_scan():
    """optax.MultiSteps state must advance correctly inside the scanned
    multi-step driver: with accumulation=2 and K=4 scanned steps, exactly
    2 optimizer updates fire."""
    from qst_tpu.train.train_step import make_multi_step

    cfg = EncoderConfig.tiny(hidden_dropout=0.0, attention_dropout=0.0)
    tcfg = TrainConfig(batch_size=4, learning_rate=1e-3,
                       scheduler="constantlr",
                       gradient_accumulation_steps=2)
    state, tx = create_train_state(cfg, tcfg, jax.random.key(0), 50, LOSS)
    init_leaf = np.array(jax.tree.leaves(state.params)[0])
    K = 4
    rng = np.random.default_rng(0)
    S = cfg.max_seq_length
    ids = jnp.asarray(rng.integers(5, cfg.vocab_size, (K, 4, 4, S)), jnp.int32)
    mask = jnp.ones((K, 4, 4, S), jnp.int32)
    keys = jax.random.split(jax.random.key(1), K)
    multi = make_multi_step(cfg, LOSS, tx, K)
    state, losses = multi(state, ids, mask, keys)
    # params changed (updates fired) …
    new_leaf = np.asarray(jax.tree.leaves(state.params)[0])
    assert not np.allclose(new_leaf, init_leaf)
    # … and the MultiSteps mini-step counter ended back at 0 (4 % 2)
    ms_state = state.opt_state
    counters = [np.asarray(x) for x in jax.tree.leaves(ms_state)
                if np.asarray(x).shape == ()]
    assert any(int(c) == 0 for c in counters)
