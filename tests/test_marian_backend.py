"""End-to-end TPU-native backtranslation parity.

Synthesizes two random-weight MarianMT checkpoint DIRECTORIES on disk
(the en→fr / fr→en pair the reference's backtranslation downloads,
reference dataset/backtranslation.py:8-49), loads them through
``load_marian_dir`` + ``JaxMarianBacktranslator``, and asserts
token-for-token / text-for-text parity with torch
``MarianMTModel.generate`` across BOTH hops of the roundtrip — including
the checkpoint-shipped generation settings real Marian models use
(``num_beams``, ``bad_words_ids=[[pad]]``, ``forced_eos_token_id``).

sentencepiece is absent in-container, so a deterministic word-level
tokenizer with the HF surface (``__call__`` / ``batch_decode``) is injected
into both backends; the weights-present path swaps in ``MarianTokenizer``
(PARITY_RUNBOOK.md).
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from qst_tpu.models.seq2seq import Seq2SeqConfig, beam_decode, \
    beam_decode_cached, greedy_decode, greedy_decode_cached

torch = pytest.importorskip("torch")

from transformers import MarianConfig, MarianMTModel  # noqa: E402

from qst_tpu.augment.backtranslation import (  # noqa: E402
    JaxMarianBacktranslator,
    format_batch_texts,
    get_backtranslator,
    reset_backtranslator,
)
from qst_tpu.models.hf_import import load_marian_dir  # noqa: E402

V = 100          # tiny vocab
PAD, EOS = 99, 0
NUM_BEAMS = 3


def _hf_config(**over):
    kw = dict(
        vocab_size=V, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_position_embeddings=64,
        pad_token_id=PAD, eos_token_id=EOS, decoder_start_token_id=PAD,
        activation_function="gelu", scale_embedding=False,
        activation_dropout=0.0, attention_dropout=0.0, dropout=0.0,
        # real Helsinki-NLP settings: suppress pad, force EOS at max_length
        bad_words_ids=[[PAD]], forced_eos_token_id=EOS,
        num_beams=NUM_BEAMS, max_length=16, length_penalty=1.0,
    )
    kw.update(over)
    return MarianConfig(**kw)


class WordTok:
    """Deterministic word-level tokenizer with the HF Marian surface:
    ``"tok<N>" ↔ id N``, EOS appended, right-padded. Injected into both the
    torch and JAX backends so parity is measured on generation alone."""

    def __call__(self, texts, padding=True, truncation=True, max_length=64,
                 return_tensors="np"):
        rows = []
        for t in texts:
            ids = []
            for w in t.split():
                if w.startswith(">>"):  # language prefix >>fr<<
                    ids.append(2)
                elif w.startswith("tok") and w[3:].isdigit():
                    ids.append(min(int(w[3:]), V - 2))
                else:
                    ids.append(1)
            ids = ids[: max_length - 1] + [EOS]
            rows.append(ids)
        L = max(len(r) for r in rows)
        input_ids = np.full((len(rows), L), PAD, np.int64)
        mask = np.zeros((len(rows), L), np.int64)
        for i, r in enumerate(rows):
            input_ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        if return_tensors == "pt":
            return {"input_ids": torch.from_numpy(input_ids),
                    "attention_mask": torch.from_numpy(mask)}
        return {"input_ids": input_ids.astype(np.int32),
                "attention_mask": mask.astype(np.int32)}

    def batch_decode(self, ids, skip_special_tokens=True):
        ids = np.asarray(ids)
        out = []
        for row in ids:
            words = [f"tok{int(t)}" for t in row
                     if int(t) not in (PAD, EOS)]
            out.append(" ".join(words))
        return out


def _save_marian(tmp_path, name: str, seed: int, **cfg_over) -> str:
    d = os.path.join(str(tmp_path), name)
    torch.manual_seed(seed)
    model = MarianMTModel(_hf_config(**cfg_over)).eval()
    model.save_pretrained(d, safe_serialization=False)
    return d


@pytest.fixture(scope="module")
def ckpt_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("marian")
    return (_save_marian(root, "opus-mt-en-fr", seed=3),
            _save_marian(root, "opus-mt-fr-en", seed=7))


def test_load_marian_dir_parses_generation_defaults(ckpt_dirs):
    cfg, params, gen = load_marian_dir(ckpt_dirs[0])
    assert cfg.vocab_size == V and cfg.pad_token_id == PAD
    assert gen["num_beams"] == NUM_BEAMS
    assert gen["suppress_tokens"] == (PAD,)
    # the forced TOKEN ID itself (HF allows forced_eos_token_id !=
    # eos_token_id, so a bool would force the wrong token)
    assert gen["forced_eos"] == EOS
    assert "shared" in params and "decoder_layer_1" in params


def test_load_marian_dir_rejects_non_marian(tmp_path):
    d = tmp_path / "not_marian"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({"model_type": "bert"}))
    (d / "pytorch_model.bin").write_bytes(b"")
    with pytest.raises(ValueError, match="not a MarianMT"):
        load_marian_dir(str(d))


def _torch_roundtrip(texts, dirs, tok, max_length):
    """The reference's perform_back_translation semantics
    (reference dataset/backtranslation.py:72-113) with checkpoint-shipped
    generation settings — the golden for the JAX backend."""
    out_texts = texts
    hop_tokens = []
    for i, d in enumerate(dirs):
        model = MarianMTModel.from_pretrained(d).eval()
        batch = format_batch_texts(out_texts) if i == 0 else out_texts
        enc = tok(batch, return_tensors="pt", max_length=max_length)
        with torch.no_grad():
            gen = model.generate(**enc, max_length=max_length)
        hop_tokens.append(gen.numpy())
        out_texts = tok.batch_decode(gen, skip_special_tokens=True)
    return out_texts, hop_tokens


def test_jax_marian_backend_token_parity_with_torch(ckpt_dirs):
    """Full roundtrip through JaxMarianBacktranslator == torch generate,
    per-hop token-for-token and final text-for-text."""
    tok = WordTok()
    max_length = 16
    texts = ["tok11 tok5 tok9", "tok40 tok41 tok42 tok43 tok44", "tok7"]

    golden_texts, golden_hops = _torch_roundtrip(
        texts, ckpt_dirs, tok, max_length)

    bt = JaxMarianBacktranslator(ckpt_dirs[0], ckpt_dirs[1],
                                 max_length=max_length,
                                 tokenizers=(tok, tok))
    # hop 1 tokens (the torch golden may stop all rows before max_length —
    # compare the overlapping prefix)
    enc = tok(format_batch_texts(texts), max_length=max_length)
    ours_hop1 = np.asarray(beam_decode_cached(
        bt.fwd_params, jnp.asarray(enc["input_ids"]),
        jnp.asarray(enc["attention_mask"]), bt.fwd_cfg,
        max_length=max_length, num_beams=NUM_BEAMS,
        suppress_tokens=(PAD,), forced_eos=True))
    g = golden_hops[0]
    np.testing.assert_array_equal(ours_hop1[:, : g.shape[1]], g)

    ours_texts = bt.backtranslate(texts)
    assert ours_texts == golden_texts


def test_suppress_tokens_keeps_cached_variants_identical(ckpt_dirs):
    cfg, params, gen = load_marian_dir(ckpt_dirs[0])
    tok = WordTok()
    enc = tok(["tok8 tok9 tok10", "tok55"], max_length=12)
    ids, mask = jnp.asarray(enc["input_ids"]), jnp.asarray(
        enc["attention_mask"])
    kw = dict(max_length=12, suppress_tokens=(PAD,), forced_eos=True)
    g = np.asarray(greedy_decode(params, ids, mask, cfg, **kw))
    gc = np.asarray(greedy_decode_cached(params, ids, mask, cfg, **kw))
    np.testing.assert_array_equal(gc, g)
    assert not np.any(g[:, 1:-1] == PAD) or np.any(g == EOS)
    b = np.asarray(beam_decode(params, ids, mask, cfg, num_beams=3, **kw))
    bc = np.asarray(beam_decode_cached(params, ids, mask, cfg, num_beams=3,
                                       **kw))
    np.testing.assert_array_equal(bc, b)


def test_forced_eos_terminates_every_row(ckpt_dirs):
    cfg, params, _ = load_marian_dir(ckpt_dirs[0])
    tok = WordTok()
    enc = tok(["tok8 tok9 tok10 tok11 tok12"], max_length=10)
    out = np.asarray(greedy_decode_cached(
        params, jnp.asarray(enc["input_ids"]),
        jnp.asarray(enc["attention_mask"]), cfg, max_length=8,
        forced_eos=True))
    assert (out == EOS).any(axis=1).all()


def test_get_backtranslator_autoselects_jax_backend(ckpt_dirs):
    reset_backtranslator()
    try:
        tok = WordTok()
        bt = get_backtranslator(en_fr_path=ckpt_dirs[0],
                                fr_en_path=ckpt_dirs[1],
                                tokenizers=(tok, tok))
        assert isinstance(bt, JaxMarianBacktranslator)
        out = bt.backtranslate(["tok5 tok6"])
        assert len(out) == 1 and isinstance(out[0], str)
    finally:
        reset_backtranslator()


def test_source_bucket_padding_does_not_change_output(ckpt_dirs):
    """Masked pad columns added by length bucketing must not perturb
    generation (the bucketing exists purely to bound XLA recompiles)."""
    cfg, params, _ = load_marian_dir(ckpt_dirs[0])
    tok = WordTok()
    enc = tok(["tok8 tok9", "tok10 tok11 tok12"], max_length=32)
    ids = np.asarray(enc["input_ids"], np.int32)
    mask = np.asarray(enc["attention_mask"], np.int32)
    a = np.asarray(beam_decode_cached(params, jnp.asarray(ids),
                                      jnp.asarray(mask), cfg,
                                      max_length=12, num_beams=3))
    pad_w = ((0, 0), (0, 16 - ids.shape[1]))
    ids_p = np.pad(ids, pad_w, constant_values=PAD)
    mask_p = np.pad(mask, pad_w, constant_values=0)
    b = np.asarray(beam_decode_cached(params, jnp.asarray(ids_p),
                                      jnp.asarray(mask_p), cfg,
                                      max_length=12, num_beams=3))
    np.testing.assert_array_equal(a, b)


def test_get_backtranslator_rejects_bad_backend(monkeypatch):
    """Backend typos must not silently fall through to auto-selection,
    and forcing a Marian backend without checkpoint dirs must fail with
    a clear message instead of a deep TypeError."""
    monkeypatch.delenv("QST_MARIAN_EN_FR", raising=False)
    monkeypatch.delenv("QST_MARIAN_FR_EN", raising=False)
    reset_backtranslator()
    try:
        with pytest.raises(ValueError, match="unknown backtranslation"):
            get_backtranslator(backend="Jax")
        for forced in ("jax", "torch"):
            with pytest.raises(ValueError, match="checkpoint dirs"):
                get_backtranslator(backend=forced)
    finally:
        reset_backtranslator()


def test_forced_eos_token_id_differs_from_eos(tmp_path):
    """HF allows forced_eos_token_id != eos_token_id — the decode must
    force the CHECKPOINT's token, not cfg.eos_token_id, to keep
    token-for-token parity with torch ``generate``."""
    FEOS = 5
    d = _save_marian(tmp_path, "opus-mt-feos", seed=11,
                     forced_eos_token_id=FEOS)
    cfg, params, gen = load_marian_dir(d)
    assert gen["forced_eos"] == FEOS
    tok = WordTok()
    enc = tok(["tok8 tok9 tok10 tok11 tok12", "tok40 tok41"], max_length=10)
    max_length = 8
    model = MarianMTModel.from_pretrained(d).eval()
    with torch.no_grad():
        golden = model.generate(
            input_ids=torch.from_numpy(np.asarray(enc["input_ids"],
                                                  np.int64)),
            attention_mask=torch.from_numpy(
                np.asarray(enc["attention_mask"], np.int64)),
            max_length=max_length, num_beams=1, do_sample=False).numpy()
    ours = np.asarray(greedy_decode_cached(
        params, jnp.asarray(enc["input_ids"]),
        jnp.asarray(enc["attention_mask"]), cfg, max_length=max_length,
        suppress_tokens=gen["suppress_tokens"],
        forced_eos=gen["forced_eos"]))
    np.testing.assert_array_equal(ours[:, : golden.shape[1]], golden)
    # the forced token actually appears at the final slot of unfinished rows
    assert (ours[:, max_length - 1] == FEOS).any() or \
        (ours == EOS).any(axis=1).all()


def test_load_marian_dir_warns_on_multitoken_bad_words(tmp_path):
    d = _save_marian(tmp_path, "opus-mt-badwords", seed=13,
                     bad_words_ids=[[PAD], [5, 7]])
    with pytest.warns(UserWarning, match="multi-token bad_words_ids"):
        _, _, gen = load_marian_dir(d)
    assert gen["suppress_tokens"] == (PAD,)


def test_forced_backend_not_masked_by_memoized_singleton(ckpt_dirs):
    """A forced backend= must never be satisfied by an earlier memoized
    instance of a DIFFERENT kind (e.g. an auto-selected paraphraser
    masquerading as forced Marian output)."""
    from qst_tpu.augment.backtranslation import (
        IdentityBacktranslator, ParaphraseBacktranslator)

    reset_backtranslator()
    try:
        first = get_backtranslator()  # no checkpoints -> paraphrase
        assert isinstance(first, ParaphraseBacktranslator)
        forced = get_backtranslator(backend="identity")
        assert isinstance(forced, IdentityBacktranslator)
        # auto-mode callers now see the latest constructed singleton
        assert get_backtranslator() is forced
        # forcing jax with a memoized identity singleton builds Marian
        tok = WordTok()
        bt = get_backtranslator(backend="jax", en_fr_path=ckpt_dirs[0],
                                fr_en_path=ckpt_dirs[1],
                                tokenizers=(tok, tok))
        assert isinstance(bt, JaxMarianBacktranslator)
    finally:
        reset_backtranslator()
