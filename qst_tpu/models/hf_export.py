"""Flax → HF state-dict export (the inverse of qst_tpu.models.hf_import).

Interop completeness: a model fine-tuned here exports back to a HuggingFace
``BertModel``/``MPNetModel`` state dict (numpy tensors; convertible to torch
with ``torch.from_numpy``), so reference users can load qst_tpu-trained
encoders into sentence-transformers. Round-trip parity is tested
(import → export → HF forward equality).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from qst_tpu.core.config import EncoderConfig


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def export_bert_state_dict(params: Mapping[str, Any],
                           cfg: EncoderConfig) -> Dict[str, np.ndarray]:
    """BertEncoder params → HF ``BertModel`` state dict (no pooler)."""
    p = params["encoder"] if "encoder" in params else params
    H, nh = cfg.hidden_size, cfg.num_heads
    hd = H // nh
    sd: Dict[str, np.ndarray] = {}

    emb = p["embeddings"]
    sd["embeddings.word_embeddings.weight"] = _np(emb["word_embeddings"]["embedding"])
    sd["embeddings.position_embeddings.weight"] = _np(
        emb["position_embeddings"]["embedding"])
    sd["embeddings.token_type_embeddings.weight"] = _np(
        emb["token_type_embeddings"]["embedding"])
    sd["embeddings.LayerNorm.weight"] = _np(emb["layer_norm"]["scale"])
    sd["embeddings.LayerNorm.bias"] = _np(emb["layer_norm"]["bias"])

    for i in range(cfg.num_layers):
        layer = p[f"layer_{i}"]
        out = f"encoder.layer.{i}"
        attn = layer["attention"]
        for name in ("query", "key", "value"):
            k = _np(attn[name]["kernel"]).reshape(H, H).T  # (out, in)
            b = _np(attn[name]["bias"]).reshape(H)
            sd[f"{out}.attention.self.{name}.weight"] = k
            sd[f"{out}.attention.self.{name}.bias"] = b
        od_k = _np(attn["output_dense"]["kernel"]).reshape(H, H).T
        sd[f"{out}.attention.output.dense.weight"] = od_k
        sd[f"{out}.attention.output.dense.bias"] = _np(
            attn["output_dense"]["bias"])
        sd[f"{out}.attention.output.LayerNorm.weight"] = _np(
            layer["attention_layer_norm"]["scale"])
        sd[f"{out}.attention.output.LayerNorm.bias"] = _np(
            layer["attention_layer_norm"]["bias"])
        sd[f"{out}.intermediate.dense.weight"] = _np(
            layer["intermediate"]["kernel"]).T
        sd[f"{out}.intermediate.dense.bias"] = _np(layer["intermediate"]["bias"])
        sd[f"{out}.output.dense.weight"] = _np(layer["output"]["kernel"]).T
        sd[f"{out}.output.dense.bias"] = _np(layer["output"]["bias"])
        sd[f"{out}.output.LayerNorm.weight"] = _np(
            layer["output_layer_norm"]["scale"])
        sd[f"{out}.output.LayerNorm.bias"] = _np(
            layer["output_layer_norm"]["bias"])
    return sd


def export_mpnet_state_dict(params: Mapping[str, Any],
                            cfg: EncoderConfig) -> Dict[str, np.ndarray]:
    """MPNetEncoder params → HF ``MPNetModel`` state dict (no pooler)."""
    p = params["encoder"] if "encoder" in params else params
    H, nh = cfg.hidden_size, cfg.num_heads
    sd: Dict[str, np.ndarray] = {}
    sd["embeddings.word_embeddings.weight"] = _np(
        p["word_embeddings"]["embedding"])
    sd["embeddings.position_embeddings.weight"] = _np(
        p["position_embeddings"]["embedding"])
    sd["embeddings.LayerNorm.weight"] = _np(p["embed_layer_norm"]["scale"])
    sd["embeddings.LayerNorm.bias"] = _np(p["embed_layer_norm"]["bias"])
    sd["encoder.relative_attention_bias.weight"] = _np(
        p["relative_attention_bias"]["embedding"])
    for i in range(cfg.num_layers):
        layer = p[f"layer_{i}"]
        out = f"encoder.layer.{i}"
        attn = layer["attention"]
        for name in ("q", "k", "v"):
            sd[f"{out}.attention.attn.{name}.weight"] = _np(
                attn[name]["kernel"]).reshape(H, H).T
            sd[f"{out}.attention.attn.{name}.bias"] = _np(
                attn[name]["bias"]).reshape(H)
        sd[f"{out}.attention.attn.o.weight"] = _np(
            attn["o"]["kernel"]).reshape(H, H).T
        sd[f"{out}.attention.attn.o.bias"] = _np(attn["o"]["bias"])
        sd[f"{out}.attention.LayerNorm.weight"] = _np(
            layer["attention_layer_norm"]["scale"])
        sd[f"{out}.attention.LayerNorm.bias"] = _np(
            layer["attention_layer_norm"]["bias"])
        sd[f"{out}.intermediate.dense.weight"] = _np(
            layer["intermediate"]["kernel"]).T
        sd[f"{out}.intermediate.dense.bias"] = _np(layer["intermediate"]["bias"])
        sd[f"{out}.output.dense.weight"] = _np(layer["output"]["kernel"]).T
        sd[f"{out}.output.dense.bias"] = _np(layer["output"]["bias"])
        sd[f"{out}.output.LayerNorm.weight"] = _np(
            layer["output_layer_norm"]["scale"])
        sd[f"{out}.output.LayerNorm.bias"] = _np(
            layer["output_layer_norm"]["bias"])
    return sd


def export_state_dict(params: Mapping[str, Any],
                      cfg: EncoderConfig) -> Dict[str, np.ndarray]:
    """Architecture-dispatching export."""
    if cfg.arch == "mpnet":
        return export_mpnet_state_dict(params, cfg)
    return export_bert_state_dict(params, cfg)


def save_torch_state_dict(params: Mapping[str, Any], cfg: EncoderConfig,
                          path: str) -> None:
    """Write a ``pytorch_model.bin`` loadable by transformers (gated torch)."""
    import torch

    # np.copy: jax arrays export as read-only views, which torch rejects
    sd = {k: torch.from_numpy(np.copy(v))
          for k, v in export_state_dict(params, cfg).items()}
    torch.save(sd, path)
