"""Tensor-parallel sharding tests on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from qst_tpu.core.config import EncoderConfig, LossConfig, TrainConfig
from qst_tpu.models.sentence_encoder import init_params
from qst_tpu.parallel import (
    create_sharded,
    spec_for_param,
    tree_param_specs,
)
from qst_tpu.train import make_eval_loss_fn, make_train_step
from qst_tpu.train.train_step import (
    create_train_state,
    create_train_state_sharded,
)

TINY = EncoderConfig.tiny()  # 4 heads, intermediate 128 → divisible by model=2
LOSS = LossConfig(margin_pos_part=0.5, margin_part_neg=0.5)


def test_spec_rules():
    assert spec_for_param("encoder/layer_0/attention/query/kernel", 3) == \
        P(None, "model", None)
    assert spec_for_param("encoder/layer_3/attention/output_dense/kernel", 3) == \
        P("model", None, None)
    assert spec_for_param("encoder/layer_0/intermediate/kernel", 2) == \
        P(None, "model")
    assert spec_for_param("encoder/layer_0/output/kernel", 2) == \
        P("model", None)
    # replicated: embeddings, layernorms, unknown
    assert spec_for_param("encoder/embeddings/word_embeddings/embedding", 2) == P()
    assert spec_for_param("encoder/layer_0/output_layer_norm/scale", 1) == P()
    # optimizer-moment paths embed the param paths → same rule fires
    assert spec_for_param(
        "1/0/mu/encoder/layer_0/attention/query/kernel", 3) == \
        P(None, "model", None)
    # MPNet attention naming (q/k/v/o)
    assert spec_for_param("encoder/layer_0/attention/q/kernel", 3) == \
        P(None, "model", None)
    assert spec_for_param("encoder/layer_0/attention/o/kernel", 3) == \
        P("model", None, None)


def test_mpnet_tp_state(mesh8):
    """Tensor-parallel state creation works for the MPNet architecture."""
    from qst_tpu.core.config import EncoderConfig

    mpnet_tiny = EncoderConfig(
        name="mpnet-tp", arch="mpnet", vocab_size=128, hidden_size=32,
        num_layers=1, num_heads=4, intermediate_size=64,
        max_position_embeddings=64, max_seq_length=16, dtype="float32",
        pad_token_id=1)
    tcfg = TrainConfig(batch_size=8, scheduler="constantlr")
    state, tx, _ = create_train_state_sharded(
        mpnet_tiny, tcfg, jax.random.key(0), 10, mesh8, LOSS)
    qk = state.params["encoder"]["layer_0"]["attention"]["q"]["kernel"]
    assert "model" in tuple(qk.sharding.spec)


def test_tree_param_specs_structure():
    params = init_params(TINY, jax.random.key(0))
    specs = tree_param_specs(params)
    flat = dict(
        (("/".join(str(getattr(k, "key", k)) for k in path)), s)
        for path, s in jax.tree_util.tree_flatten_with_path(
            specs, is_leaf=lambda x: isinstance(x, P))[0]
    )
    assert any("query/kernel" in k and v == P(None, "model", None)
               for k, v in flat.items())


def test_create_sharded_state(mesh8):
    tcfg = TrainConfig(batch_size=8, scheduler="constantlr")
    state, tx, shardings = create_train_state_sharded(
        TINY, tcfg, jax.random.key(0), 10, mesh8, LOSS)
    qk = state.params["encoder"]["layer_0"]["attention"]["query"]["kernel"]
    assert qk.sharding.spec == P(None, "model", None)
    # optimizer moments sharded identically
    mu = jax.tree.leaves(
        jax.tree.map(lambda x: x, state.opt_state),
    )
    assert int(state.step) == 0
    # embeddings replicated
    emb = state.params["encoder"]["embeddings"]["word_embeddings"]["embedding"]
    assert emb.sharding.spec == P()


def test_tp_train_step_matches_unsharded(mesh8):
    """One DP+TP step must produce the same model as the single-device step."""
    tcfg = TrainConfig(batch_size=8, learning_rate=1e-3,
                       scheduler="constantlr")
    rng = np.random.default_rng(0)
    S = TINY.max_seq_length
    ids = jnp.asarray(rng.integers(5, TINY.vocab_size, (4, 8, S)), jnp.int32)
    mask = jnp.ones((4, 8, S), jnp.int32)

    state_tp, tx_tp, _ = create_train_state_sharded(
        TINY, tcfg, jax.random.key(0), 10, mesh8, LOSS)
    step_tp = make_train_step(TINY, LOSS, tx_tp, mesh=mesh8)
    state_tp, loss_tp = step_tp(state_tp, ids, mask, jax.random.key(3))

    state_ref, tx_ref = create_train_state(
        TINY, tcfg, jax.random.key(0), 10, LOSS)
    step_ref = make_train_step(TINY, LOSS, tx_ref)
    state_ref, loss_ref = step_ref(state_ref, ids, mask, jax.random.key(3))

    eval_loss = make_eval_loss_fn(TINY, LOSS)
    l_tp = float(eval_loss(state_tp.params, ids, mask))
    l_ref = float(eval_loss(state_ref.params, ids, mask))
    np.testing.assert_allclose(l_tp, l_ref, rtol=2e-4)

    # params stay sharded after the step (donated layout preserved);
    # note XLA may normalize away trailing-None spec entries
    qk = state_tp.params["encoder"]["layer_0"]["attention"]["query"]["kernel"]
    assert tuple(qk.sharding.spec)[:2] == (None, "model")


def test_mesh_encode_pipeline_matches_single(mesh8):
    """Data-parallel encode with the K-batch scanned pipeline: identical
    results to the unsharded single-batch path."""
    import numpy as np

    from qst_tpu.core.config import EncoderConfig
    from qst_tpu.models import HashTokenizer, SentenceEncoder, init_params

    cfg = EncoderConfig.tiny()
    params = init_params(cfg, jax.random.key(0))
    tok = HashTokenizer(cfg.vocab_size)
    texts = [f"sentence {i} topic {i % 7}" for i in range(70)]
    plain = SentenceEncoder(cfg, params, tok).encode(texts, batch_size=16)
    sharded = SentenceEncoder(cfg, params, tok, mesh=mesh8).encode(
        texts, batch_size=16, pipeline_batches=2)
    np.testing.assert_allclose(sharded, plain, atol=1e-5)


def test_mesh_encode_pipeline_with_out_sharding(mesh8):
    """out_sharding partitions the BATCH dim of the many-forward's (K, B, D)
    output, not the leading K axis (regression: the single-batch sharding
    was reused verbatim, which fails whenever K % n_devices != 0)."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from qst_tpu.core.config import EncoderConfig
    from qst_tpu.core.meshes import DATA_AXIS
    from qst_tpu.models import HashTokenizer, SentenceEncoder, init_params

    cfg = EncoderConfig.tiny()
    params = init_params(cfg, jax.random.key(0))
    tok = HashTokenizer(cfg.vocab_size)
    texts = [f"sentence {i} topic {i % 7}" for i in range(96)]
    plain = SentenceEncoder(cfg, params, tok).encode(texts, batch_size=16)
    out_sh = NamedSharding(mesh8, P(DATA_AXIS))
    enc = SentenceEncoder(cfg, params, tok, mesh=mesh8, out_sharding=out_sh)
    # K=3 batches per dispatch: 3 % 8 != 0, so sharding K would fail
    got = enc.encode(texts, batch_size=16, pipeline_batches=3)
    np.testing.assert_allclose(got, plain, atol=1e-5)
