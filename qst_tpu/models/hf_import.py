"""HF → Flax checkpoint import.

Converts a HuggingFace ``BertModel`` state dict (the trunk inside
sentence-transformers checkpoints such as all-MiniLM-L6-v2, the reference's
default model at training/main.py:242) into the parameter tree of
``qst_tpu.models.bert.BertEncoder``, so reference embeddings are reproduced
exactly (parity verified against ``transformers.BertModel`` in
tests/test_models.py with random weights — no network needed).

Accepts raw numpy state dicts; ``load_torch_state_dict`` adds a gated torch
loader for on-disk ``pytorch_model.bin`` files.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from qst_tpu.core.config import EncoderConfig

_PREFIXES = ("", "bert.", "roberta.", "0.auto_model.", "auto_model.")


def _strip_prefix(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    for prefix in _PREFIXES:
        probe = prefix + "embeddings.word_embeddings.weight"
        if probe in sd:
            n = len(prefix)
            return {k[n:]: v for k, v in sd.items() if k.startswith(prefix)}
    raise KeyError(
        "state dict does not look like a BERT trunk: no "
        "embeddings.word_embeddings.weight under known prefixes"
    )


def _np(x: Any) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def import_bert_params(
    state_dict: Mapping[str, Any], cfg: EncoderConfig
) -> Dict[str, Any]:
    """→ params pytree for ``BertEncoder`` (the ``encoder`` subtree of
    ``SentenceEncoderModule``)."""
    sd = {k: _np(v) for k, v in _strip_prefix(state_dict).items()}
    H, nh = cfg.hidden_size, cfg.num_heads
    hd = H // nh

    def dense(name: str) -> Dict[str, np.ndarray]:
        w = sd[f"{name}.weight"]  # (out, in)
        b = sd[f"{name}.bias"]
        return {"kernel": w.T, "bias": b}

    def qkv(name: str) -> Dict[str, np.ndarray]:
        w = sd[f"{name}.weight"]  # (H, H)
        b = sd[f"{name}.bias"]
        return {"kernel": w.T.reshape(H, nh, hd), "bias": b.reshape(nh, hd)}

    def ln(name: str) -> Dict[str, np.ndarray]:
        return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}

    params: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
            "position_embeddings": {
                "embedding": sd["embeddings.position_embeddings.weight"]
            },
            "token_type_embeddings": {
                "embedding": sd["embeddings.token_type_embeddings.weight"]
            },
            "layer_norm": ln("embeddings.LayerNorm"),
        }
    }
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}"
        attn_out = sd[f"{p}.attention.output.dense.weight"]  # (H, H)
        params[f"layer_{i}"] = {
            "attention": {
                "query": qkv(f"{p}.attention.self.query"),
                "key": qkv(f"{p}.attention.self.key"),
                "value": qkv(f"{p}.attention.self.value"),
                "output_dense": {
                    # DenseGeneral over (heads, head_dim) → kernel (nh, hd, H)
                    "kernel": attn_out.T.reshape(nh, hd, H),
                    "bias": sd[f"{p}.attention.output.dense.bias"],
                },
            },
            "attention_layer_norm": ln(f"{p}.attention.output.LayerNorm"),
            "intermediate": dense(f"{p}.intermediate.dense"),
            "output": dense(f"{p}.output.dense"),
            "output_layer_norm": ln(f"{p}.output.LayerNorm"),
        }
    return params


def import_cross_encoder_params(
    state_dict: Mapping[str, Any], cfg: EncoderConfig
) -> Dict[str, Any]:
    """→ params pytree for ``CrossEncoderModule`` from an HF
    ``*ForSequenceClassification`` state dict (num_labels=1) — the layout
    of sentence-transformers CrossEncoder checkpoints like the reference's
    ``cross-encoder/stsb-roberta-large`` (reference models/evaluators.py:31).
    The trunk maps through :func:`import_bert_params`; the head maps to the
    architecture's classification head (roberta: dense+tanh+out_proj;
    bert-style single linear otherwise)."""
    raw = {k: _np(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {
        "encoder": import_bert_params(state_dict, cfg)}
    if cfg.arch == "roberta":
        params["head_dense"] = {
            "kernel": raw["classifier.dense.weight"].T,
            "bias": raw["classifier.dense.bias"]}
        params["out_proj"] = {
            "kernel": raw["classifier.out_proj.weight"].T,
            "bias": raw["classifier.out_proj.bias"]}
    else:
        params["classifier"] = {
            "kernel": raw["classifier.weight"].T,
            "bias": raw["classifier.bias"]}
    return params


def import_sentence_encoder_params(
    state_dict: Mapping[str, Any], cfg: EncoderConfig
) -> Dict[str, Any]:
    """→ params pytree for ``SentenceEncoderModule`` (wraps the trunk);
    dispatches on the configured architecture (roberta state dicts share
    BERT's key layout — position handling differs only in the forward)."""
    if cfg.arch == "mpnet":
        from qst_tpu.models.mpnet import import_mpnet_params

        return {"encoder": import_mpnet_params(state_dict, cfg)}
    return {"encoder": import_bert_params(state_dict, cfg)}


def _resolve_checkpoint_files(ckpt_dir: str):
    """→ (weights path, parsed trunk config.json, finder fn). Weights may
    live at the root or under a ``0_*``-style module subdirectory; the
    trunk's config.json sits NEXT TO the weights (never 1_Pooling's)."""
    import glob
    import json
    import os

    if not os.path.isdir(ckpt_dir):
        raise FileNotFoundError(f"checkpoint dir not found: {ckpt_dir}")

    def find(name: str):
        cands = [os.path.join(ckpt_dir, name)]
        cands += sorted(glob.glob(os.path.join(ckpt_dir, "*", name)))
        for c in cands:
            if os.path.isfile(c):
                return c
        return None

    weights = find("model.safetensors") or find("pytorch_model.bin")
    if weights is None:
        raise FileNotFoundError(
            f"no model.safetensors / pytorch_model.bin under {ckpt_dir}")
    cfg_path = os.path.join(os.path.dirname(weights), "config.json")
    if not os.path.isfile(cfg_path):
        raise FileNotFoundError(f"no config.json next to {weights}")
    with open(cfg_path) as f:
        hf_cfg = json.load(f)
    return weights, hf_cfg, find


def _encoder_cfg_kwargs(ckpt_dir: str, hf_cfg: dict) -> dict:
    import os

    model_type = hf_cfg.get("model_type", "bert")
    if model_type not in ("bert", "mpnet", "roberta"):
        raise ValueError(f"unsupported model_type {model_type!r} "
                         "(bert, roberta and mpnet trunks are supported)")
    kw = dict(
        name=os.path.basename(os.path.normpath(ckpt_dir)),
        arch=model_type,
        vocab_size=int(hf_cfg["vocab_size"]),
        hidden_size=int(hf_cfg["hidden_size"]),
        num_layers=int(hf_cfg["num_hidden_layers"]),
        num_heads=int(hf_cfg["num_attention_heads"]),
        intermediate_size=int(hf_cfg["intermediate_size"]),
        max_position_embeddings=int(hf_cfg["max_position_embeddings"]),
        layer_norm_eps=float(hf_cfg.get("layer_norm_eps", 1e-12)),
        pad_token_id=int(hf_cfg.get("pad_token_id", 0)),
    )
    if model_type == "bert":
        kw["type_vocab_size"] = int(hf_cfg.get("type_vocab_size", 2))
    elif model_type == "roberta":
        kw["type_vocab_size"] = int(hf_cfg.get("type_vocab_size", 1))
    return kw


def _vocab_path(find) -> "str | None":
    vocab_path = find("vocab.txt")
    if vocab_path is None:
        # byte-level BPE checkpoints (roberta family): vocab.json +
        # merges.txt — load_tokenizer dispatches on the .json suffix
        vocab_path = find("vocab.json")
    return vocab_path


def load_cross_encoder_dir(ckpt_dir: str,
                           max_seq_length: "int | None" = None):
    """Load a local HF ``*ForSequenceClassification`` checkpoint DIRECTORY
    (num_labels=1) — the layout of sentence-transformers CrossEncoder
    checkpoints like the reference's ``cross-encoder/stsb-roberta-large``
    (reference models/evaluators.py:31) — into
    (EncoderConfig, CrossEncoderModule params, vocab path or None)."""
    from qst_tpu.core.config import EncoderConfig

    weights, hf_cfg, find = _resolve_checkpoint_files(ckpt_dir)
    kw = _encoder_cfg_kwargs(ckpt_dir, hf_cfg)
    if max_seq_length is not None:
        kw["max_seq_length"] = int(max_seq_length)
    cfg = EncoderConfig(**kw)
    params = import_cross_encoder_params(load_torch_state_dict(weights), cfg)
    return cfg, params, _vocab_path(find)


def load_hf_checkpoint_dir(ckpt_dir: str):
    """Load a local sentence-transformers / HF checkpoint DIRECTORY
    (e.g. a clone of ``sentence-transformers/all-MiniLM-L6-v2``, the
    reference's default at training/main.py:242) into
    (EncoderConfig, params pytree, vocab path or None).

    Resolution (no network):
    - weights: ``model.safetensors`` or ``pytorch_model.bin`` at the root or
      under a ``0_*``-style module subdirectory;
    - architecture: ``config.json`` (model_type bert/roberta/mpnet);
    - ``sentence_bert_config.json`` → max_seq_length when present;
    - ``1_Pooling/config.json`` → pooling mode when present;
    - ``vocab.txt`` (WordPiece) or ``vocab.json`` (byte-level BPE) → tokenizer.

    This is the weights-present path of the parity harness (PARITY_RUNBOOK.md):
    set ``QST_HF_CHECKPOINT_DIR`` or pass ``--hf_checkpoint_dir`` and the
    train/ir-eval CLIs call through here.
    """
    import json
    import os

    from qst_tpu.core.config import EncoderConfig

    weights, hf_cfg, _find = _resolve_checkpoint_files(ckpt_dir)
    kw = _encoder_cfg_kwargs(ckpt_dir, hf_cfg)

    sbert_cfg = _find("sentence_bert_config.json")
    if sbert_cfg:
        with open(sbert_cfg) as f:
            kw["max_seq_length"] = int(
                json.load(f).get("max_seq_length", 128))
    pool_cfg = _find(os.path.join("1_Pooling", "config.json")) or _find(
        "pooling_config.json")
    if pool_cfg:
        with open(pool_cfg) as f:
            pooling = json.load(f)
        if pooling.get("pooling_mode_cls_token"):
            kw["pooling"] = "cls"
        elif pooling.get("pooling_mode_max_tokens"):
            kw["pooling"] = "max"
        else:
            kw["pooling"] = "mean"

    cfg = EncoderConfig(**kw)
    params = import_sentence_encoder_params(
        load_torch_state_dict(weights), cfg)
    return cfg, params, _vocab_path(_find)


def load_marian_dir(ckpt_dir: str):
    """Load a local HF MarianMT checkpoint DIRECTORY (the layout of
    ``Helsinki-NLP/opus-mt-en-fr`` clones — the models the reference's
    backtranslation downloads at reference dataset/backtranslation.py:8-49)
    into ``(Seq2SeqConfig, params pytree, generation defaults dict)``.

    The params feed :class:`qst_tpu.models.seq2seq.MarianModule`; generation
    defaults capture the checkpoint's ``generation_config.json`` /
    ``config.json`` decode settings (``num_beams``, ``max_length``, pad
    suppression via single-token ``bad_words_ids``, ``forced_eos_token_id``)
    so on-device decode matches torch ``MarianMTModel.generate``
    token-for-token (tests/test_marian_backend.py).
    """
    import json
    import os

    from qst_tpu.models.seq2seq import Seq2SeqConfig
    from qst_tpu.models.seq2seq import import_marian_params as _imp

    weights, hf_cfg, find = _resolve_checkpoint_files(ckpt_dir)
    if hf_cfg.get("model_type", "marian") != "marian":
        raise ValueError(
            f"{ckpt_dir}: model_type {hf_cfg.get('model_type')!r} is not a "
            "MarianMT checkpoint")
    cfg = Seq2SeqConfig(
        vocab_size=int(hf_cfg["vocab_size"]),
        d_model=int(hf_cfg["d_model"]),
        encoder_layers=int(hf_cfg["encoder_layers"]),
        decoder_layers=int(hf_cfg["decoder_layers"]),
        num_heads=int(hf_cfg["encoder_attention_heads"]),
        ffn_dim=int(hf_cfg["encoder_ffn_dim"]),
        max_position_embeddings=int(hf_cfg["max_position_embeddings"]),
        pad_token_id=int(hf_cfg["pad_token_id"]),
        eos_token_id=int(hf_cfg["eos_token_id"]),
        decoder_start_token_id=int(hf_cfg["decoder_start_token_id"]),
        scale_embedding=bool(hf_cfg.get("scale_embedding", True)),
        activation=hf_cfg.get("activation_function", "swish"),
    )
    params = _imp(load_torch_state_dict(weights), cfg)

    # generation defaults: generation_config.json overrides config.json
    gen = dict(hf_cfg)
    gen_path = find("generation_config.json")
    if gen_path:
        with open(gen_path) as f:
            gen.update(json.load(f))
    suppress = []
    dropped = []
    for word in gen.get("bad_words_ids") or []:
        if len(word) == 1:  # Marian ships [[pad_token_id]]
            suppress.append(int(word[0]))
        else:
            dropped.append(word)
    if dropped:
        import warnings

        warnings.warn(
            f"{ckpt_dir}: {len(dropped)} multi-token bad_words_ids entries "
            f"(e.g. {dropped[0]}) are not supported by the on-device decode "
            "and were DROPPED — generation may differ from torch for this "
            "checkpoint (only single-token suppression is implemented)",
            stacklevel=2)
    feos = gen.get("forced_eos_token_id")
    defaults = {
        "num_beams": int(gen.get("num_beams") or 1),
        "max_length": int(gen.get("max_length") or 512),
        "length_penalty": float(gen.get("length_penalty") or 1.0),
        "suppress_tokens": tuple(suppress),
        # the forced token itself: HF allows forced_eos_token_id !=
        # eos_token_id, so a bool would force the wrong token
        "forced_eos": int(feos) if feos is not None else False,
        "name": os.path.basename(os.path.normpath(ckpt_dir)),
    }
    return cfg, params, defaults


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a ``pytorch_model.bin`` / ``.safetensors`` file from disk
    (no network). torch import is gated here so the rest of the framework
    never depends on it."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file  # type: ignore

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy().astype(np.float32) for k, v in sd.items()}
