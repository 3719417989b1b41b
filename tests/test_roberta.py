"""RoBERTa trunk + byte-level BPE tokenizer + cross-encoder import parity.

The reference's relevance labeler is ``cross-encoder/stsb-roberta-large``
(reference models/evaluators.py:31) — a RoBERTa trunk with a
dense+tanh+out_proj classification head over byte-level BPE input. These
tests pin the whole weights-present path against transformers with random
weights (the same zero-network pattern as test_models.test_hf_bert_parity).
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from qst_tpu.core.config import EncoderConfig
from qst_tpu.models.bpe_tokenizer import RobertaBPETokenizer, bytes_to_unicode


def _tiny_roberta_cfg():
    return dict(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        pad_token_id=1, layer_norm_eps=1e-5,
    )


def _our_cfg(**overrides):
    base = dict(
        name="parity-roberta", arch="roberta", vocab_size=128,
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=1, layer_norm_eps=1e-5,
        pad_token_id=1, max_seq_length=16, dtype="float32",
        hidden_dropout=0.0, attention_dropout=0.0, normalize=False,
    )
    base.update(overrides)
    return EncoderConfig(**base)


def _padded_inputs(rng, B=3, S=16, vocab=128, pad=1):
    ids = rng.integers(5, vocab, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    mask[0, 10:] = 0
    mask[2, 5:] = 0
    ids[mask == 0] = pad   # HF derives positions from ids != pad
    return ids, mask


def test_hf_roberta_parity():
    """Random-weight transformers.RobertaModel vs our roberta-arch trunk:
    padding-aware position offset + eps 1e-5 + single token type."""
    torch = pytest.importorskip("torch")
    from transformers import RobertaConfig, RobertaModel

    from qst_tpu.models.hf_import import import_sentence_encoder_params
    from qst_tpu.models.sentence_encoder import SentenceEncoderModule

    torch.manual_seed(0)
    hf = RobertaModel(RobertaConfig(**_tiny_roberta_cfg())).eval()
    cfg = _our_cfg()
    params = import_sentence_encoder_params(hf.state_dict(), cfg)

    rng = np.random.default_rng(1)
    ids, mask = _padded_inputs(rng)
    with torch.no_grad():
        hf_out = hf(input_ids=torch.from_numpy(ids).long(),
                    attention_mask=torch.from_numpy(mask).long()
                    ).last_hidden_state.numpy()
    ours = SentenceEncoderModule(cfg).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    tok = np.asarray(ours["token_embeddings"], np.float32)
    m = mask.astype(bool)
    np.testing.assert_allclose(tok[m], hf_out[m], rtol=2e-4, atol=2e-5)


def test_cross_encoder_roberta_head_parity():
    """RobertaForSequenceClassification (num_labels=1) — the exact layout
    of stsb-roberta-large — imports head + trunk and matches logits."""
    torch = pytest.importorskip("torch")
    from transformers import RobertaConfig, RobertaForSequenceClassification

    from qst_tpu.models.cross_encoder import CrossEncoderModule
    from qst_tpu.models.hf_import import import_cross_encoder_params

    torch.manual_seed(3)
    hf = RobertaForSequenceClassification(
        RobertaConfig(num_labels=1, **_tiny_roberta_cfg())).eval()
    cfg = _our_cfg()
    params = import_cross_encoder_params(hf.state_dict(), cfg)

    rng = np.random.default_rng(2)
    ids, mask = _padded_inputs(rng)
    with torch.no_grad():
        hf_logits = hf(input_ids=torch.from_numpy(ids).long(),
                       attention_mask=torch.from_numpy(mask).long()
                       ).logits.numpy().squeeze(-1)
    ours = np.asarray(CrossEncoderModule(cfg).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
        jnp.zeros_like(jnp.asarray(ids))), np.float32)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-4, atol=2e-5)


def _tiny_bpe_files(tmp_path):
    """A minimal but REAL byte-level BPE vocab: all 256 byte symbols +
    specials + a few merges, loadable by both our tokenizer and HF's."""
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
              ("Ġ", "w"), ("o", "r"), ("Ġw", "or"), ("l", "d"),
              ("Ġwor", "ld")]
    tokens = ["<s>", "<pad>", "</s>", "<unk>", "<mask>"]
    tokens += list(bytes_to_unicode().values())
    tokens += [a + b for a, b in merges]
    vocab = {t: i for i, t in enumerate(tokens)}
    vp = os.path.join(tmp_path, "vocab.json")
    mp = os.path.join(tmp_path, "merges.txt")
    with open(vp, "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(mp, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return vp, mp


def test_bpe_matches_hf_tokenizer(tmp_path):
    pytest.importorskip("torch")
    from transformers import RobertaTokenizer

    vp, mp = _tiny_bpe_files(str(tmp_path))
    ours = RobertaBPETokenizer.from_files(vp)
    hf = RobertaTokenizer(vocab_file=vp, merges_file=mp)

    texts = ["hello world", "hello hello world!", "world? hello...",
             "it's a hello world", "  hello   world  "]
    for t in texts:
        got = ours.encode(t, max_length=32)[0]
        want = hf.encode(t, add_special_tokens=True)
        assert got == want, (t, got, want)
    # pair framing: <s> A </s></s> B </s>
    got = ours.encode("hello", "world", max_length=32)[0]
    want = hf.encode("hello", "world", add_special_tokens=True)
    assert got == want

    # batch API shape contract (same as WordPieceTokenizer)
    ids, mask, types = ours.batch_encode_pairs(
        [("hello", "world"), ("world", "hello")], max_length=16)
    assert ids.shape == (2, 16) and types.max() == 0
    assert (ids[:, 0] == ours.cls_id).all()


def test_load_roberta_checkpoint_dir(tmp_path):
    """A synthesized roberta checkpoint dir (pytorch_model.bin +
    config.json + vocab.json/merges.txt) loads end-to-end: arch resolved,
    forward parity, BPE tokenizer picked up via the .json path."""
    torch = pytest.importorskip("torch")
    from transformers import RobertaConfig, RobertaModel

    from qst_tpu.models.hf_import import load_hf_checkpoint_dir
    from qst_tpu.models.sentence_encoder import SentenceEncoderModule
    from qst_tpu.models.tokenizer import load_tokenizer

    torch.manual_seed(5)
    hf_cfg = _tiny_roberta_cfg()
    hf = RobertaModel(RobertaConfig(**hf_cfg)).eval()
    d = str(tmp_path / "ckpt")
    os.makedirs(d)
    torch.save(hf.state_dict(), os.path.join(d, "pytorch_model.bin"))
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({"model_type": "roberta",
                   "vocab_size": hf_cfg["vocab_size"],
                   "hidden_size": hf_cfg["hidden_size"],
                   "num_hidden_layers": hf_cfg["num_hidden_layers"],
                   "num_attention_heads": hf_cfg["num_attention_heads"],
                   "intermediate_size": hf_cfg["intermediate_size"],
                   "max_position_embeddings":
                       hf_cfg["max_position_embeddings"],
                   "type_vocab_size": 1,
                   "layer_norm_eps": 1e-5, "pad_token_id": 1}, f)
    _tiny_bpe_files(d)

    cfg, params, vocab_path = load_hf_checkpoint_dir(d)
    assert cfg.arch == "roberta" and cfg.pad_token_id == 1
    assert vocab_path.endswith("vocab.json")
    tok = load_tokenizer(vocab_path)
    assert isinstance(tok, RobertaBPETokenizer)
    # token-level parity is an f32 claim; the loaded config defaults to the
    # bf16 TPU compute dtype
    import dataclasses

    cfg = dataclasses.replace(cfg, dtype="float32")

    rng = np.random.default_rng(4)
    ids, mask = _padded_inputs(rng, vocab=hf_cfg["vocab_size"])
    with torch.no_grad():
        hf_out = hf(input_ids=torch.from_numpy(ids).long(),
                    attention_mask=torch.from_numpy(mask).long()
                    ).last_hidden_state.numpy()
    ours = SentenceEncoderModule(cfg).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    tok_emb = np.asarray(ours["token_embeddings"], np.float32)
    m = mask.astype(bool)
    np.testing.assert_allclose(tok_emb[m], hf_out[m], rtol=2e-4, atol=2e-5)


def test_cross_encoder_predict_with_bpe(tmp_path):
    """End-to-end CrossEncoder.predict over the BPE tokenizer with a
    random roberta trunk — the reference's labeling call shape
    (reference models/evaluators.py:501-509)."""
    import jax

    from qst_tpu.models.cross_encoder import CrossEncoder, init_cross_encoder

    vp, _ = _tiny_bpe_files(str(tmp_path))
    tok = RobertaBPETokenizer.from_files(vp)
    cfg = _our_cfg(vocab_size=len(tok.vocab), max_seq_length=16)
    params = init_cross_encoder(cfg, jax.random.key(0))
    ce = CrossEncoder(cfg, params, tok)
    scores = ce.predict([("hello world", "world hello"),
                         ("hello", "hello")], batch_size=4)
    assert scores.shape == (2,)
    assert np.all((scores >= 0) & (scores <= 1))


def test_load_cross_encoder_dir_end_to_end(tmp_path):
    """A synthesized stsb-roberta-large-layout checkpoint dir (config +
    *ForSequenceClassification weights + BPE vocab) loads into a working
    CrossEncoder whose sigmoid scores match an independent torch forward —
    the executable form of the runbook's --use_cross_encoder section."""
    torch = pytest.importorskip("torch")
    from transformers import RobertaConfig, RobertaForSequenceClassification

    from qst_tpu.models.cross_encoder import CrossEncoder
    from qst_tpu.models.hf_import import load_cross_encoder_dir
    from qst_tpu.models.tokenizer import load_tokenizer

    d = str(tmp_path / "ce")
    os.makedirs(d)
    vp, _ = _tiny_bpe_files(d)
    tok_probe = load_tokenizer(vp)
    hf_cfg = _tiny_roberta_cfg()
    hf_cfg["vocab_size"] = len(tok_probe.vocab)
    torch.manual_seed(9)
    hf = RobertaForSequenceClassification(
        RobertaConfig(num_labels=1, **hf_cfg)).eval()
    torch.save(hf.state_dict(), os.path.join(d, "pytorch_model.bin"))
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({"model_type": "roberta",
                   "vocab_size": hf_cfg["vocab_size"],
                   "hidden_size": hf_cfg["hidden_size"],
                   "num_hidden_layers": hf_cfg["num_hidden_layers"],
                   "num_attention_heads": hf_cfg["num_attention_heads"],
                   "intermediate_size": hf_cfg["intermediate_size"],
                   "max_position_embeddings":
                       hf_cfg["max_position_embeddings"],
                   "type_vocab_size": 1,
                   "layer_norm_eps": 1e-5, "pad_token_id": 1}, f)

    import dataclasses

    cfg, params, vocab_path = load_cross_encoder_dir(d, max_seq_length=16)
    cfg = dataclasses.replace(cfg, dtype="float32", hidden_dropout=0.0,
                              attention_dropout=0.0)
    assert cfg.arch == "roberta" and vocab_path.endswith("vocab.json")
    ce = CrossEncoder(cfg, params, load_tokenizer(vocab_path))
    pairs = [("hello world", "world hello"), ("hello", "hello world")]
    ours = ce.predict(pairs, batch_size=4)

    # independent torch pipeline over the same pairs
    from transformers import RobertaTokenizer

    hf_tok = RobertaTokenizer(vocab_file=vocab_path,
                              merges_file=os.path.join(d, "merges.txt"))
    enc = hf_tok([p[0] for p in pairs], [p[1] for p in pairs],
                 padding="max_length", max_length=16, truncation=True,
                 return_tensors="pt")
    with torch.no_grad():
        want = torch.sigmoid(hf(**enc).logits.squeeze(-1)).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-5)
