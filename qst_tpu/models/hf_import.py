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

_PREFIXES = ("", "bert.", "0.auto_model.", "auto_model.")


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


def import_sentence_encoder_params(
    state_dict: Mapping[str, Any], cfg: EncoderConfig
) -> Dict[str, Any]:
    """→ params pytree for ``SentenceEncoderModule`` (wraps the trunk);
    dispatches on the configured architecture."""
    if cfg.arch == "mpnet":
        from qst_tpu.models.mpnet import import_mpnet_params

        return {"encoder": import_mpnet_params(state_dict, cfg)}
    return {"encoder": import_bert_params(state_dict, cfg)}


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
