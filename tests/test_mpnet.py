"""MPNet encoder tests: HF numerical parity, position buckets, integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qst_tpu.core.config import EncoderConfig
from qst_tpu.models.mpnet import (
    import_mpnet_params,
    padding_aware_position_ids,
    relative_position_bucket,
)
from qst_tpu.models.sentence_encoder import SentenceEncoderModule, init_params

MPNET_TINY = EncoderConfig(
    name="mpnet-tiny", arch="mpnet", vocab_size=100, hidden_size=32,
    num_layers=2, num_heads=4, intermediate_size=64,
    max_position_embeddings=64, max_seq_length=16, dtype="float32",
    hidden_dropout=0.0, attention_dropout=0.0, pad_token_id=1,
    normalize=False,
)


def test_padding_aware_position_ids():
    ids = jnp.asarray([[5, 6, 7, 1, 1], [5, 1, 6, 7, 1]], jnp.int32)
    pos = np.asarray(padding_aware_position_ids(ids, pad_id=1))
    np.testing.assert_array_equal(pos[0], [2, 3, 4, 1, 1])
    # pads inside the sequence don't advance the counter
    np.testing.assert_array_equal(pos[1], [2, 1, 3, 4, 1])


def test_relative_position_bucket_matches_hf():
    torch = pytest.importorskip("torch")
    from transformers.models.mpnet.modeling_mpnet import MPNetEncoder as HFEnc

    rel = np.arange(-50, 51)[None, :] - np.zeros((1, 1), np.int64)
    golden = HFEnc.relative_position_bucket(
        torch.from_numpy(np.arange(-50, 51)[None, :])).numpy()
    ours = np.asarray(relative_position_bucket(
        jnp.asarray(np.arange(-50, 51)[None, :])))
    np.testing.assert_array_equal(ours, golden)


def test_hf_mpnet_parity(rng):
    torch = pytest.importorskip("torch")
    from transformers import MPNetConfig, MPNetModel

    hf_cfg = MPNetConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, pad_token_id=1,
    )
    torch.manual_seed(0)
    hf = MPNetModel(hf_cfg).eval()
    params = {"encoder": import_mpnet_params(hf.state_dict(), MPNET_TINY)}

    ids = rng.integers(2, 100, (3, 12)).astype(np.int32)
    mask = np.ones((3, 12), np.int32)
    mask[1, 8:] = 0
    ids[1, 8:] = 1  # pad token

    with torch.no_grad():
        golden = hf(input_ids=torch.from_numpy(ids).long(),
                    attention_mask=torch.from_numpy(mask).long()
                    ).last_hidden_state.numpy()

    out = SentenceEncoderModule(MPNET_TINY).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    tok = np.asarray(out["token_embeddings"], np.float32)
    m = mask.astype(bool)
    np.testing.assert_allclose(tok[m], golden[m], rtol=3e-4, atol=3e-5)


def test_mpnet_random_init_runs():
    params = init_params(MPNET_TINY, jax.random.key(0))
    ids = jnp.full((2, MPNET_TINY.max_seq_length), 5, jnp.int32)
    mask = jnp.ones_like(ids)
    out = SentenceEncoderModule(MPNET_TINY).apply({"params": params}, ids, mask)
    assert np.isfinite(np.asarray(out["sentence_embedding"])).all()


def test_mpnet_preset_arch():
    assert EncoderConfig.mpnet_base().arch == "mpnet"
    assert EncoderConfig.minilm_l6().arch == "bert"
