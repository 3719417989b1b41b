"""HF export round-trip: import → export reproduces the original state dict,
and an HF model loaded from the export matches forward outputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qst_tpu.core.config import EncoderConfig
from qst_tpu.models.hf_export import export_state_dict
from qst_tpu.models.hf_import import import_sentence_encoder_params
from qst_tpu.models.mpnet import import_mpnet_params

torch = pytest.importorskip("torch")


def test_bert_roundtrip_exact():
    from transformers import BertConfig, BertModel

    cfg = EncoderConfig(
        name="rt", vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=32, max_seq_length=16,
        dtype="float32", hidden_dropout=0.0, attention_dropout=0.0,
        normalize=False)
    hf_cfg = BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=32, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = BertModel(hf_cfg, add_pooling_layer=False).eval()

    params = import_sentence_encoder_params(hf.state_dict(), cfg)
    exported = export_state_dict(params, cfg)

    original = {k: v.numpy() for k, v in hf.state_dict().items()}
    assert set(exported) == set(original)
    for k in original:
        np.testing.assert_allclose(exported[k], original[k], rtol=1e-6,
                                   atol=1e-7, err_msg=k)

    # reload export into a fresh HF model → identical forward
    hf2 = BertModel(hf_cfg, add_pooling_layer=False).eval()
    hf2.load_state_dict({k: torch.from_numpy(v) for k, v in exported.items()})
    ids = torch.randint(0, 128, (2, 10))
    with torch.no_grad():
        o1 = hf(ids).last_hidden_state.numpy()
        o2 = hf2(ids).last_hidden_state.numpy()
    np.testing.assert_allclose(o1, o2, atol=1e-6)


def test_mpnet_roundtrip_exact():
    from transformers import MPNetConfig, MPNetModel

    cfg = EncoderConfig(
        name="rt-mpnet", arch="mpnet", vocab_size=100, hidden_size=32,
        num_layers=2, num_heads=4, intermediate_size=64,
        max_position_embeddings=64, max_seq_length=16, dtype="float32",
        hidden_dropout=0.0, attention_dropout=0.0, pad_token_id=1,
        normalize=False)
    hf_cfg = MPNetConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, pad_token_id=1)
    torch.manual_seed(0)
    hf = MPNetModel(hf_cfg, add_pooling_layer=False).eval()

    params = {"encoder": import_mpnet_params(hf.state_dict(), cfg)}
    exported = export_state_dict(params, cfg)
    original = {k: v.numpy() for k, v in hf.state_dict().items()}
    assert set(exported) == set(original)
    for k in original:
        np.testing.assert_allclose(exported[k], original[k], rtol=1e-6,
                                   atol=1e-7, err_msg=k)


def test_export_trained_params_loadable(tmp_path):
    """Random-init (as-if-trained) qst_tpu params export into a loadable
    HF BertModel whose hidden states match our encoder."""
    from transformers import BertConfig, BertModel

    from qst_tpu.models.sentence_encoder import SentenceEncoderModule, init_params

    cfg = EncoderConfig(
        name="trained", vocab_size=128, hidden_size=32, num_layers=2,
        num_heads=4, intermediate_size=64, max_position_embeddings=32,
        max_seq_length=16, dtype="float32", hidden_dropout=0.0,
        attention_dropout=0.0, normalize=False)
    params = init_params(cfg, jax.random.key(3))
    exported = export_state_dict(params, cfg)

    hf_cfg = BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=32, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    hf = BertModel(hf_cfg, add_pooling_layer=False).eval()
    missing, unexpected = hf.load_state_dict(
        {k: torch.from_numpy(v) for k, v in exported.items()}, strict=True)
    assert not missing and not unexpected

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, (2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.int32)
    with torch.no_grad():
        hf_out = hf(torch.from_numpy(ids).long(),
                    attention_mask=torch.from_numpy(mask).long()
                    ).last_hidden_state.numpy()
    ours = SentenceEncoderModule(cfg).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(ours["token_embeddings"], np.float32), hf_out,
        rtol=2e-4, atol=2e-5)
