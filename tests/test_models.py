"""Model tests: encoder forward, HF numerical parity, tokenizers, heads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qst_tpu.core.config import EncoderConfig
from qst_tpu.models import (
    CrossEncoderModule,
    HashTokenizer,
    PairDiscriminator,
    SentenceEncoder,
    SentenceEncoderModule,
    WordPieceTokenizer,
    import_sentence_encoder_params,
    init_cross_encoder,
    init_discriminator,
    init_params,
)

TINY = EncoderConfig.tiny()


@pytest.fixture(scope="module")
def tiny_params():
    return init_params(TINY, jax.random.key(0))


def test_sentence_encoder_shapes(tiny_params):
    B, S = 4, TINY.max_seq_length
    ids = jnp.ones((B, S), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    out = SentenceEncoderModule(TINY).apply({"params": tiny_params}, ids, mask)
    assert out["token_embeddings"].shape == (B, S, TINY.hidden_size)
    assert out["sentence_embedding"].shape == (B, TINY.hidden_size)
    norms = jnp.linalg.norm(out["sentence_embedding"], axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, rtol=1e-5)


def test_padding_invariance(tiny_params):
    """Embeddings must not depend on pad content/extent (masked mean)."""
    S = TINY.max_seq_length
    ids = np.zeros((2, S), np.int32)
    mask = np.zeros((2, S), np.int32)
    ids[:, :5] = [[7, 8, 9, 10, 11]] * 2
    mask[:, :5] = 1
    ids2 = ids.copy()
    ids2[0, 5:] = 99  # garbage in padded region
    m = SentenceEncoderModule(TINY)
    e1 = m.apply({"params": tiny_params}, jnp.asarray(ids), jnp.asarray(mask))
    e2 = m.apply({"params": tiny_params}, jnp.asarray(ids2), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(e1["sentence_embedding"]), np.asarray(e2["sentence_embedding"]),
        atol=1e-5)


def test_hf_bert_parity():
    """Random-weight transformers.BertModel vs our encoder after import —
    the checkpoint-parity guarantee without any network access."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=32, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = BertModel(hf_cfg).eval()

    cfg = EncoderConfig(
        name="parity", vocab_size=128, hidden_size=32, num_layers=2,
        num_heads=4, intermediate_size=64, max_position_embeddings=32,
        max_seq_length=16, dtype="float32", hidden_dropout=0.0,
        attention_dropout=0.0, normalize=False,
    )
    params = import_sentence_encoder_params(hf.state_dict(), cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 128, (3, 16)).astype(np.int32)
    mask = np.ones((3, 16), np.int32)
    mask[0, 10:] = 0
    mask[2, 5:] = 0

    with torch.no_grad():
        hf_out = hf(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()

    ours = SentenceEncoderModule(cfg).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    tok = np.asarray(ours["token_embeddings"], dtype=np.float32)

    # compare only unmasked positions (masked ones are unconstrained)
    m = mask.astype(bool)
    np.testing.assert_allclose(tok[m], hf_out[m], rtol=2e-4, atol=2e-5)

    # pooled embedding == manual masked mean of HF hidden states
    golden_pool = (hf_out * mask[..., None]).sum(1) / mask.sum(1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(ours["sentence_embedding"]), golden_pool, rtol=2e-4, atol=2e-5)


def test_wordpiece_tokenizer():
    vocab = {t: i for i, t in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "a", "cat", "sat", "on", "the", "mat", "un", "##related", "##s", "."])}
    tok = WordPieceTokenizer(vocab)
    assert tok.tokenize("A cat sat.") == ["a", "cat", "sat", "."]
    assert tok.tokenize("unrelated") == ["un", "##related"]
    assert tok.tokenize("cats") == ["cat", "##s"]
    assert tok.tokenize("zebra") == ["[UNK]"]
    ids, mask, types = tok.encode("the cat", "a mat")
    assert ids[0] == tok.cls_id and ids[-1] == tok.sep_id
    assert types[:4] == [0, 0, 0, 0] and types[-1] == 1
    arr_ids, arr_mask = tok.batch_encode(["a cat", "the mat sat"], max_length=8)
    assert arr_ids.shape == (2, 8) and arr_mask.shape == (2, 8)
    assert arr_mask[0].sum() == 4  # CLS a cat SEP
    # truncation keeps trailing [SEP]
    ids_t, _, _ = tok.encode("a cat sat on the mat " * 10, max_length=8)
    assert len(ids_t) == 8 and ids_t[-1] == tok.sep_id


def test_hash_tokenizer_deterministic():
    tok = HashTokenizer(vocab_size=256)
    a1, m1 = tok.batch_encode(["hello world"], max_length=8)
    a2, m2 = tok.batch_encode(["hello world"], max_length=8)
    np.testing.assert_array_equal(a1, a2)
    b, _ = tok.batch_encode(["different text"], max_length=8)
    assert not np.array_equal(a1, b)
    assert a1.max() < 256 and a1.min() >= 0


def test_sentence_encoder_end_to_end():
    tok = HashTokenizer(vocab_size=TINY.vocab_size)
    enc = SentenceEncoder(TINY, init_params(TINY, jax.random.key(0)), tok)
    texts = ["a cat sat on the mat", "dogs run fast", "a cat sat on a mat"]
    emb = enc.encode(texts, batch_size=8)
    assert emb.shape == (3, TINY.hidden_size)
    sim = enc.similarity(texts[:1], texts)
    assert sim.shape == (1, 3)
    # same-word-overlap sentence should be most similar to itself
    assert np.argmax(sim[0]) == 0
    # identical text → identical embedding regardless of batch position
    emb2 = enc.encode(["dogs run fast"])
    np.testing.assert_allclose(emb[1], emb2[0], atol=1e-5)
    # empty input
    assert enc.encode([]).shape == (0, TINY.hidden_size)


def test_cross_encoder_shapes():
    cfg = EncoderConfig.tiny()
    params = init_cross_encoder(cfg, jax.random.key(0))
    from qst_tpu.models import CrossEncoder

    ce = CrossEncoder(cfg, params, HashTokenizer(vocab_size=cfg.vocab_size))
    scores = ce.predict([("a cat", "a feline"), ("a cat", "quantum flux")],
                        batch_size=4)
    assert scores.shape == (2,)
    assert np.all((scores >= 0) & (scores <= 1))


def test_discriminator():
    params = init_discriminator(16, jax.random.key(0), hidden_sizes=(8,))
    d = PairDiscriminator((8,))
    a = jnp.ones((4, 16))
    out = d.apply({"params": params}, a, a * 2)
    assert out.shape == (4, 1)


def test_encode_device_resident(tiny_params):
    """convert_to_numpy=False must return a DEVICE array (the encoder →
    HBM-index handoff path: no device→host→device round trip) with the
    same values as the numpy path."""
    enc = SentenceEncoder(TINY, tiny_params, HashTokenizer(TINY.vocab_size))
    texts = [f"sentence {i}" for i in range(11)]
    host = enc.encode(texts, batch_size=4)
    dev = enc.encode(texts, batch_size=4, convert_to_numpy=False)
    assert isinstance(dev, jax.Array)
    np.testing.assert_allclose(np.asarray(dev), host, atol=1e-6)
    empty = enc.encode([], convert_to_numpy=False)
    assert isinstance(empty, jax.Array) and empty.shape == (0, TINY.hidden_size)


def test_encode_pipeline_batches_matches_single(tiny_params):
    """pipeline_batches=K (scanned multi-batch dispatch) must produce
    exactly the single-batch results, including the non-full tail."""
    enc = SentenceEncoder(TINY, tiny_params, HashTokenizer(TINY.vocab_size))
    texts = [f"sentence number {i} about topic {i % 5}" for i in range(29)]
    base = enc.encode(texts, batch_size=4)
    piped = enc.encode(texts, batch_size=4, pipeline_batches=3)
    np.testing.assert_allclose(piped, base, atol=1e-6)
    with pytest.raises(ValueError):
        enc.encode(texts, pipeline_batches=0)


def test_encode_dispatch_depth_pipelines_and_validates(tiny_params):
    cfg, params = TINY, tiny_params
    from qst_tpu.models.tokenizer import HashTokenizer
    from qst_tpu.models.sentence_encoder import SentenceEncoder

    enc = SentenceEncoder(cfg, params, HashTokenizer(vocab_size=cfg.vocab_size))
    texts = [f"sentence number {i}" for i in range(37)]
    base = enc.encode(texts, batch_size=8, dispatch_depth=1)
    piped = enc.encode(texts, batch_size=8, dispatch_depth=4)
    np.testing.assert_allclose(piped, base, rtol=1e-6)
    assert piped.shape == (37, cfg.hidden_size)
    with pytest.raises(ValueError, match="dispatch_depth"):
        enc.encode(texts, dispatch_depth=0)
