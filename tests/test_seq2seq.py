"""JAX Marian-equivalent seq2seq tests: numerical parity with a random-weight
transformers.MarianMTModel (forward logits + greedy generation), plus the
decode-loop mechanics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qst_tpu.models.seq2seq import (
    JaxBacktranslator,
    MarianModule,
    Seq2SeqConfig,
    beam_decode,
    greedy_decode,
    import_marian_params,
    init_seq2seq,
    sinusoidal_positions,
)

TINY = Seq2SeqConfig.tiny()


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import MarianConfig, MarianMTModel

    hf_cfg = MarianConfig(
        vocab_size=TINY.vocab_size, d_model=TINY.d_model,
        encoder_layers=TINY.encoder_layers, decoder_layers=TINY.decoder_layers,
        encoder_attention_heads=TINY.num_heads,
        decoder_attention_heads=TINY.num_heads,
        encoder_ffn_dim=TINY.ffn_dim, decoder_ffn_dim=TINY.ffn_dim,
        max_position_embeddings=TINY.max_position_embeddings,
        pad_token_id=TINY.pad_token_id, eos_token_id=TINY.eos_token_id,
        decoder_start_token_id=TINY.decoder_start_token_id,
        activation_function=TINY.activation, scale_embedding=TINY.scale_embedding,
        activation_dropout=0.0, attention_dropout=0.0, dropout=0.0,
        forced_eos_token_id=None,
    )
    torch.manual_seed(0)
    hf = MarianMTModel(hf_cfg).eval()
    params = import_marian_params(hf.state_dict(), TINY)
    return hf, params


def _inputs(rng, B=3, S=10):
    ids = rng.integers(1, TINY.vocab_size - 1, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    mask[1, 7:] = 0
    ids[1, 7:] = TINY.pad_token_id
    return ids, mask


def test_sinusoidal_matches_hf(hf_pair):
    hf, _ = hf_pair
    golden = hf.model.encoder.embed_positions.weight.detach().numpy()
    ours = sinusoidal_positions(TINY.max_position_embeddings, TINY.d_model)
    np.testing.assert_allclose(ours, golden, atol=1e-5)


def test_forward_logits_parity(hf_pair, rng):
    torch = pytest.importorskip("torch")
    hf, params = hf_pair
    ids, mask = _inputs(rng)
    dec_ids = rng.integers(1, TINY.vocab_size - 1, (3, 6)).astype(np.int32)
    dec_mask = np.ones((3, 6), np.int32)

    with torch.no_grad():
        golden = hf(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
            decoder_input_ids=torch.from_numpy(dec_ids).long(),
            decoder_attention_mask=torch.from_numpy(dec_mask).long(),
        ).logits.numpy()

    ours = MarianModule(TINY).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(dec_ids), jnp.asarray(dec_mask))
    np.testing.assert_allclose(np.asarray(ours), golden, rtol=2e-4, atol=2e-4)


def test_greedy_decode_matches_hf_generate(hf_pair, rng):
    torch = pytest.importorskip("torch")
    hf, params = hf_pair
    ids, mask = _inputs(rng)
    max_len = 12

    with torch.no_grad():
        golden = hf.generate(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
            num_beams=1, do_sample=False, max_length=max_len,
        ).numpy()

    ours = np.asarray(greedy_decode(params, jnp.asarray(ids),
                                    jnp.asarray(mask), TINY, max_len))
    # compare up to each golden row's length (HF may stop earlier)
    for g_row, o_row in zip(golden, ours):
        n = len(g_row)
        np.testing.assert_array_equal(o_row[:n], g_row)


def test_beam_decode_matches_hf_generate(hf_pair, rng):
    torch = pytest.importorskip("torch")
    hf, params = hf_pair
    ids, mask = _inputs(rng)
    max_len = 10

    with torch.no_grad():
        golden = hf.generate(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
            num_beams=4, do_sample=False, max_length=max_len,
            length_penalty=1.0, early_stopping=True,
        ).numpy()

    ours = np.asarray(beam_decode(params, jnp.asarray(ids),
                                  jnp.asarray(mask), TINY, max_len,
                                  num_beams=4, length_penalty=1.0))
    for g_row, o_row in zip(golden, ours):
        n = len(g_row)
        np.testing.assert_array_equal(o_row[:n], g_row)


def test_beam_decode_beats_or_matches_greedy(hf_pair, rng):
    """Beam-1 must equal greedy; beam-4 must score >= greedy under the
    model's own log-likelihood."""
    _, params = hf_pair
    ids, mask = _inputs(rng)
    g = np.asarray(greedy_decode(params, jnp.asarray(ids), jnp.asarray(mask),
                                 TINY, 10))
    b1 = np.asarray(beam_decode(params, jnp.asarray(ids), jnp.asarray(mask),
                                TINY, 10, num_beams=1))
    np.testing.assert_array_equal(b1, g)


def test_greedy_decode_shapes_and_eos():
    params = init_seq2seq(TINY, jax.random.key(0))
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    out = greedy_decode(params, ids, mask, TINY, max_length=16)
    out = np.asarray(out)
    assert out.shape == (2, 16)
    assert (out[:, 0] == TINY.decoder_start_token_id).all()


class _IdTok:
    """Trivial tokenizer over small ids for roundtrip mechanics."""

    def batch_encode(self, texts, max_length=16):
        ids = np.full((len(texts), max_length), TINY.pad_token_id, np.int32)
        mask = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            toks = [min(ord(c) % 90 + 1, TINY.vocab_size - 2) for c in t[:max_length - 1]]
            toks.append(TINY.eos_token_id)
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return ids, mask

    def decode(self, token_ids):
        return " ".join(str(t) for t in token_ids)


def test_jax_backtranslator_roundtrip():
    params = init_seq2seq(TINY, jax.random.key(1))
    bt = JaxBacktranslator((TINY, params), (TINY, params), _IdTok(), _IdTok(),
                           max_length=12)
    out = bt.backtranslate(["hello world", "a cat"])
    assert len(out) == 2
    assert all(isinstance(o, str) for o in out)


def test_cached_greedy_matches_uncached(hf_pair, rng):
    """KV-cached decode must be token-identical to full-prefix greedy."""
    from qst_tpu.models.seq2seq import greedy_decode_cached

    _, params = hf_pair
    ids, mask = _inputs(rng)
    g = np.asarray(greedy_decode(params, jnp.asarray(ids), jnp.asarray(mask),
                                 TINY, 14))
    c = np.asarray(greedy_decode_cached(params, jnp.asarray(ids),
                                        jnp.asarray(mask), TINY, 14))
    np.testing.assert_array_equal(c, g)


def test_cached_beam_matches_uncached(hf_pair, rng):
    """KV-cached beam search must be token-identical to the full-prefix
    beam search (incl. cache reordering across surviving beams)."""
    from qst_tpu.models.seq2seq import beam_decode_cached

    _, params = hf_pair
    ids, mask = _inputs(rng)
    b = np.asarray(beam_decode(params, jnp.asarray(ids), jnp.asarray(mask),
                               TINY, 12, num_beams=4))
    c = np.asarray(beam_decode_cached(params, jnp.asarray(ids),
                                      jnp.asarray(mask), TINY, 12,
                                      num_beams=4))
    np.testing.assert_array_equal(c, b)
