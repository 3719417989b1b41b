"""Pipeline parallelism (qst_tpu.parallel.pipeline) on the virtual CPU mesh.

Exactness bar: the pipelined trunk is the SAME math as the sequential
encoder, so forward outputs, losses, and gradients must match the
single-device reference to float tolerance — across stage counts, with and
without a data axis, and with ragged masks.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qst_tpu.core.config import EncoderConfig, LossConfig, TrainConfig
from qst_tpu.models.sentence_encoder import embed_fn, init_params
from qst_tpu.parallel.pipeline import (
    make_pipe_mesh,
    make_pp_embed_fn,
    make_pp_train_step,
    pp_params_from_encoder,
    stack_stage_params,
    unstack_stage_params,
)

CFG = dataclasses.replace(EncoderConfig.tiny(), num_layers=4,
                          hidden_dropout=0.0, attention_dropout=0.0)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.key(0))


def _batch(B, seed=0):
    rng = np.random.default_rng(seed)
    S = CFG.max_seq_length
    ids = rng.integers(5, CFG.vocab_size, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    mask[0, S // 2:] = 0  # ragged row
    return jnp.asarray(ids), jnp.asarray(mask)


def test_stack_unstack_roundtrip(params):
    enc = params["encoder"]
    stacked = stack_stage_params(enc, CFG.num_layers, 2)
    flat = unstack_stage_params(stacked, CFG.num_layers)
    for i in range(CFG.num_layers):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            flat[f"layer_{i}"], enc[f"layer_{i}"])
    with pytest.raises(ValueError):
        stack_stage_params(enc, CFG.num_layers, 3)


@pytest.mark.parametrize("pipe,data,microbatches", [(2, 1, 4), (4, 1, 2),
                                                    (2, 2, 2)])
def test_pp_forward_matches_sequential(params, pipe, data, microbatches):
    mesh = make_pipe_mesh(pipe, data)
    pp_params = pp_params_from_encoder(params["encoder"], CFG, pipe, mesh)
    fwd_pp = jax.jit(make_pp_embed_fn(CFG, mesh, pipe, microbatches))
    fwd_ref = jax.jit(embed_fn(CFG))
    ids, mask = _batch(8)
    out_pp = np.asarray(fwd_pp(pp_params, ids, mask))
    out_ref = np.asarray(fwd_ref(params, ids, mask))
    np.testing.assert_allclose(out_pp, out_ref, rtol=2e-5, atol=2e-5)


def test_pp_gradients_match_sequential(params):
    """AD through scan+ppermute must reproduce the sequential gradients."""
    pipe, M = 2, 2
    mesh = make_pipe_mesh(pipe, 1)
    pp_params = pp_params_from_encoder(params["encoder"], CFG, pipe, mesh)
    fwd_pp = make_pp_embed_fn(CFG, mesh, pipe, M)
    fwd_ref = embed_fn(CFG)
    ids, mask = _batch(4)

    def loss_pp(p):
        return (fwd_pp(p, ids, mask) ** 2).sum()

    def loss_ref(p):
        return (fwd_ref(p, ids, mask) ** 2).sum()

    g_pp = jax.jit(jax.grad(loss_pp))(pp_params)
    g_ref = jax.jit(jax.grad(loss_ref))(params)

    # embeddings grads line up directly
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        g_pp["embeddings"], g_ref["encoder"]["embeddings"])
    # stage grads line up after unstacking
    flat = unstack_stage_params(g_pp["stages"], CFG.num_layers)
    for i in range(CFG.num_layers):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
            flat[f"layer_{i}"], g_ref["encoder"][f"layer_{i}"])


def test_pp_train_step_learns(params):
    from qst_tpu.train.train_step import TrainState, make_optimizer

    pipe, M = 2, 2
    mesh = make_pipe_mesh(pipe, 2)
    pp_params = pp_params_from_encoder(params["encoder"], CFG, pipe, mesh)
    tcfg = TrainConfig(batch_size=8, learning_rate=1e-3,
                       scheduler="constantlr")
    loss_cfg = LossConfig(margin_pos_part=0.5, margin_part_neg=0.5)
    tx = make_optimizer(tcfg, 100)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=pp_params,
                       opt_state=tx.init(pp_params))
    step = make_pp_train_step(CFG, loss_cfg, tx, mesh, pipe, M)
    rng = np.random.default_rng(3)
    S = CFG.max_seq_length
    ids = jnp.asarray(rng.integers(5, CFG.vocab_size, (4, 8, S)), jnp.int32)
    mask = jnp.ones((4, 8, S), jnp.int32)
    losses = []
    for i in range(8):
        state, loss = step(state, ids, mask, jax.random.key(i))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # optimizes the same objective


def test_pp_validation_errors(params):
    mesh = make_pipe_mesh(2, 1)
    with pytest.raises(ValueError, match="pipe"):
        make_pp_embed_fn(CFG, make_pipe_mesh(4, 1), n_stages=2,
                         n_microbatches=2)
    fwd = make_pp_embed_fn(CFG, mesh, 2, n_microbatches=3)
    pp_params = pp_params_from_encoder(params["encoder"], CFG, 2, mesh)
    ids, mask = _batch(8)  # 8 % 3 != 0
    with pytest.raises(ValueError, match="microbatches"):
        fwd(pp_params, ids, mask)


# ------------------------------------------------- circular (interleaved)
def test_circular_stack_unstack_roundtrip(params):
    """v=2 chunk assignment: device p's slots are chunks p, p+S, … — the
    round trip must restore every layer."""
    enc = params["encoder"]
    stacked = stack_stage_params(enc, CFG.num_layers, 2, n_rounds=2)
    flat = unstack_stage_params(stacked, CFG.num_layers, n_rounds=2)
    for i in range(CFG.num_layers):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            flat[f"layer_{i}"], enc[f"layer_{i}"])
    # same leaf shapes as v=1 — only the layer→slot mapping differs
    v1 = stack_stage_params(enc, CFG.num_layers, 2)
    jax.tree.map(lambda a, b: (a.shape == b.shape) or (_ for _ in ()).throw(
        AssertionError((a.shape, b.shape))), stacked, v1)


@pytest.mark.parametrize("pipe,data,microbatches,rounds",
                         [(2, 1, 2, 2), (2, 1, 4, 2), (4, 1, 4, 1),
                          (2, 2, 2, 2)])
def test_pp_circular_forward_matches_sequential(params, pipe, data,
                                                microbatches, rounds):
    """The circular schedule is the same math as the sequential encoder:
    forward outputs must match to float tolerance (incl. composed with a
    data axis and M == S, the tightest wrap timing)."""
    mesh = make_pipe_mesh(pipe, data)
    pp_params = pp_params_from_encoder(params["encoder"], CFG, pipe, mesh,
                                       n_rounds=rounds)
    fwd_pp = jax.jit(make_pp_embed_fn(CFG, mesh, pipe, microbatches,
                                      n_rounds=rounds))
    fwd_ref = jax.jit(embed_fn(CFG))
    ids, mask = _batch(8)
    out_pp = np.asarray(fwd_pp(pp_params, ids, mask))
    out_ref = np.asarray(fwd_ref(params, ids, mask))
    np.testing.assert_allclose(out_pp, out_ref, rtol=2e-5, atol=2e-5)


def test_pp_circular_gradients_match_sequential(params):
    """AD through the circular scan (wrap bank included) must reproduce
    the sequential gradients for every layer."""
    pipe, M, V = 2, 2, 2
    mesh = make_pipe_mesh(pipe, 1)
    pp_params = pp_params_from_encoder(params["encoder"], CFG, pipe, mesh,
                                       n_rounds=V)
    fwd_pp = make_pp_embed_fn(CFG, mesh, pipe, M, n_rounds=V)
    fwd_ref = embed_fn(CFG)
    ids, mask = _batch(4)

    g_pp = jax.jit(jax.grad(lambda p: (fwd_pp(p, ids, mask) ** 2).sum()))(
        pp_params)
    g_ref = jax.jit(jax.grad(lambda p: (fwd_ref(p, ids, mask) ** 2).sum()))(
        params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        g_pp["embeddings"], g_ref["encoder"]["embeddings"])
    flat = unstack_stage_params(g_pp["stages"], CFG.num_layers, n_rounds=V)
    for i in range(CFG.num_layers):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
            flat[f"layer_{i}"], g_ref["encoder"][f"layer_{i}"])


def test_pp_circular_validation(params):
    mesh = make_pipe_mesh(2, 1)
    with pytest.raises(ValueError, match="n_microbatches >= n_stages"):
        make_pp_embed_fn(CFG, mesh, 2, n_microbatches=1, n_rounds=2)
    with pytest.raises(ValueError, match="divisible"):
        make_pp_embed_fn(CFG, mesh, 2, n_microbatches=4, n_rounds=3)
    with pytest.raises(ValueError, match="divisible"):
        stack_stage_params(params["encoder"], CFG.num_layers, 2, n_rounds=3)


# ------------------------------------------------- stochastic (dropout) PP
DCFG = dataclasses.replace(CFG, hidden_dropout=0.3, attention_dropout=0.2)


def _sequential_dropout_twin(enc_params, ids, mask, rng, n_microbatches):
    """Sequential forward drawing the EXACT same per-(microbatch, layer)
    dropout keys the pipelined trunk derives (data shard 0):
    fold_in(fold_in(fold_in(rng, 0), m), l); embeddings use
    fold_in(rng, num_layers)."""
    from qst_tpu.models.bert import BertEmbeddings, BertLayer
    from qst_tpu.ops.distances import l2_normalize
    from qst_tpu.ops.pooling import POOLERS

    B, S = ids.shape
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :], (B, S))
    hidden = BertEmbeddings(DCFG).apply(
        {"params": enc_params["embeddings"]}, ids, jnp.zeros_like(ids), pos,
        False, rngs={"dropout": jax.random.fold_in(rng, DCFG.num_layers)})
    bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9).astype(
        jnp.float32)
    layer = BertLayer(DCFG)
    rng0 = jax.random.fold_in(rng, 0)  # data-axis index 0
    mb = B // n_microbatches
    outs = []
    for m in range(n_microbatches):
        h = hidden[m * mb:(m + 1) * mb]
        bi = bias[m * mb:(m + 1) * mb]
        ma = mask[m * mb:(m + 1) * mb]
        km = jax.random.fold_in(rng0, m)
        for l in range(DCFG.num_layers):
            h = layer.apply(
                {"params": enc_params[f"layer_{l}"]}, h, bi, ma, False,
                rngs={"dropout": jax.random.fold_in(km, l)})
        outs.append(h)
    hidden = jnp.concatenate(outs)
    pooled = POOLERS[DCFG.pooling](hidden, mask)
    return l2_normalize(pooled) if DCFG.normalize else pooled


def test_pp_dropout_forward_matches_sequential_same_masks(params):
    """PP WITH dropout must equal a sequential forward drawing identical
    counter-derived masks — PP training now runs reference dropout rates."""
    pipe, M = 2, 2
    mesh = make_pipe_mesh(pipe, 1)
    pp_params = pp_params_from_encoder(params["encoder"], DCFG, pipe, mesh)
    fwd_pp = make_pp_embed_fn(DCFG, mesh, pipe, M)
    ids, mask = _batch(4)
    rng = jax.random.key(7)
    out_pp = np.asarray(jax.jit(fwd_pp)(pp_params, ids, mask, rng))
    out_ref = np.asarray(_sequential_dropout_twin(
        params["encoder"], ids, mask, rng, M))
    np.testing.assert_allclose(out_pp, out_ref, rtol=2e-5, atol=2e-5)
    # two different keys must give different (stochastic) outputs
    out_pp2 = np.asarray(jax.jit(fwd_pp)(pp_params, ids, mask,
                                         jax.random.key(8)))
    assert np.abs(out_pp2 - out_pp).max() > 1e-4
    # rng=None stays the deterministic forward
    det = np.asarray(jax.jit(fwd_pp)(pp_params, ids, mask))
    det_cfg_fwd = jax.jit(embed_fn(DCFG))
    np.testing.assert_allclose(
        det, np.asarray(det_cfg_fwd(params, ids, mask)), rtol=2e-5,
        atol=2e-5)


def test_pp_dropout_gradients_match_sequential(params):
    """Gradient parity WITH dropout: identical masks → identical grads."""
    pipe, M = 2, 2
    mesh = make_pipe_mesh(pipe, 1)
    pp_params = pp_params_from_encoder(params["encoder"], DCFG, pipe, mesh)
    fwd_pp = make_pp_embed_fn(DCFG, mesh, pipe, M)
    ids, mask = _batch(4)
    rng = jax.random.key(11)

    def loss_pp(p):
        return (fwd_pp(p, ids, mask, rng) ** 2).sum()

    def loss_ref(p):
        return (_sequential_dropout_twin(p, ids, mask, rng, M) ** 2).sum()

    g_pp = jax.jit(jax.grad(loss_pp))(pp_params)
    g_ref = jax.jit(jax.grad(loss_ref))(params["encoder"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5),
        g_pp["embeddings"], g_ref["embeddings"])
    flat = unstack_stage_params(g_pp["stages"], DCFG.num_layers)
    for i in range(DCFG.num_layers):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5),
            flat[f"layer_{i}"], g_ref[f"layer_{i}"])


def test_pp_circular_dropout_matches_sequential_masks(params):
    """Circular schedule WITH dropout: chunk slots map to GLOBAL layer ids
    in the key derivation, so masks (and outputs) must equal the same
    sequential twin the v=1 schedule matches."""
    pipe, M, V = 2, 2, 2
    mesh = make_pipe_mesh(pipe, 1)
    pp_params = pp_params_from_encoder(params["encoder"], DCFG, pipe, mesh,
                                       n_rounds=V)
    fwd_pp = make_pp_embed_fn(DCFG, mesh, pipe, M, n_rounds=V)
    ids, mask = _batch(4)
    rng = jax.random.key(7)
    out_pp = np.asarray(jax.jit(fwd_pp)(pp_params, ids, mask, rng))
    out_ref = np.asarray(_sequential_dropout_twin(
        params["encoder"], ids, mask, rng, M))
    np.testing.assert_allclose(out_pp, out_ref, rtol=2e-5, atol=2e-5)


def test_pp_train_step_stochastic_learns(params):
    """The PP train step at reference dropout rates (composed with DP) must
    be stochastic in the rng and still optimize."""
    from qst_tpu.train.train_step import TrainState, make_optimizer

    pipe, M = 2, 2
    mesh = make_pipe_mesh(pipe, 2)
    pp_params = pp_params_from_encoder(params["encoder"], DCFG, pipe, mesh)
    tcfg = TrainConfig(batch_size=8, learning_rate=1e-3,
                       scheduler="constantlr")
    loss_cfg = LossConfig(margin_pos_part=0.5, margin_part_neg=0.5)
    tx = make_optimizer(tcfg, 100)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=pp_params,
                       opt_state=tx.init(pp_params))
    step = make_pp_train_step(DCFG, loss_cfg, tx, mesh, pipe, M)
    rng = np.random.default_rng(3)
    S = DCFG.max_seq_length
    ids = jnp.asarray(rng.integers(5, DCFG.vocab_size, (4, 8, S)), jnp.int32)
    mask = jnp.ones((4, 8, S), jnp.int32)
    # same state, different rng → different stochastic loss
    _, l_a = step(jax.tree.map(jnp.copy, state), ids, mask, jax.random.key(0))
    _, l_b = step(jax.tree.map(jnp.copy, state), ids, mask, jax.random.key(1))
    assert abs(float(l_a) - float(l_b)) > 1e-6
    losses = []
    for i in range(8):
        state, loss = step(state, ids, mask, jax.random.key(i))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_pp_circular_v4_matches_sequential(params):
    """v=4 (8 layers, 2 stages): four wrap rounds through the bank must
    still reproduce the sequential forward exactly."""
    cfg8 = dataclasses.replace(CFG, num_layers=8)
    p8 = init_params(cfg8, jax.random.key(2))
    mesh = make_pipe_mesh(2, 1)
    pp_params = pp_params_from_encoder(p8["encoder"], cfg8, 2, mesh,
                                       n_rounds=4)
    fwd_pp = jax.jit(make_pp_embed_fn(cfg8, mesh, 2, n_microbatches=2,
                                      n_rounds=4))
    fwd_ref = jax.jit(embed_fn(cfg8))
    ids, mask = _batch(4)
    np.testing.assert_allclose(
        np.asarray(fwd_pp(pp_params, ids, mask)),
        np.asarray(fwd_ref(p8, ids, mask)), rtol=2e-5, atol=2e-5)
