"""Cross-encoder pair scorer.

TPU-native equivalent of the ``CrossEncoder("cross-encoder/stsb-roberta-large")``
relevance labeler the reference uses to build IR relevance sets (reference
models/evaluators.py:31,501-509, threshold 0.4): the same BERT-family trunk
run over [CLS] query [SEP] doc [SEP] with token-type segmentation, a CLS-token
regression head, and a sigmoid to [0, 1].
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from qst_tpu.core.config import EncoderConfig
from qst_tpu.models.bert import BertEncoder


class CrossEncoderModule(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids,
                 deterministic: bool = True) -> jax.Array:
        hidden = BertEncoder(self.cfg, name="encoder")(
            input_ids, attention_mask, token_type_ids, deterministic)
        cls = hidden[:, 0, :].astype(jnp.float32)
        cls = nn.Dropout(self.cfg.hidden_dropout)(cls, deterministic=deterministic)
        if self.cfg.arch == "roberta":
            # HF RobertaClassificationHead (the exact head of the
            # reference's cross-encoder/stsb-roberta-large): dense → tanh
            # → dropout → out_proj
            cls = jnp.tanh(nn.Dense(self.cfg.hidden_size, name="head_dense",
                                    dtype=jnp.float32)(cls))
            cls = nn.Dropout(self.cfg.hidden_dropout)(
                cls, deterministic=deterministic)
            logit = nn.Dense(1, name="out_proj", dtype=jnp.float32)(cls)
        else:
            logit = nn.Dense(1, name="classifier", dtype=jnp.float32)(cls)
        return logit.squeeze(-1)  # (B,)


def init_cross_encoder(cfg: EncoderConfig, rng: jax.Array):
    model = CrossEncoderModule(cfg)
    S = cfg.max_seq_length
    z = jnp.zeros((2, S), jnp.int32)
    return model.init({"params": rng}, z, jnp.ones_like(z), z)["params"]


class CrossEncoder:
    """Host wrapper: (query, doc) pairs → relevance scores in [0, 1]."""

    def __init__(self, cfg: EncoderConfig, params: Any, tokenizer: Any):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        model = CrossEncoderModule(cfg)
        self._jitted = jax.jit(
            lambda p, ids, mask, types: jax.nn.sigmoid(
                model.apply({"params": p}, ids, mask, types, deterministic=True)
            )
        )

    def predict(self, pairs: Sequence[Tuple[str, str]],
                batch_size: int = 128) -> np.ndarray:
        scores = []
        for start in range(0, len(pairs), batch_size):
            chunk = list(pairs[start:start + batch_size])
            ids, mask, types = self.tokenizer.batch_encode_pairs(
                chunk, max_length=self.cfg.max_seq_length)
            n = len(chunk)
            if n < batch_size:  # pad batch to fixed shape
                pad = batch_size - n
                ids = np.concatenate([ids, np.zeros((pad, ids.shape[1]), ids.dtype)])
                mask_pad = np.zeros((pad, mask.shape[1]), mask.dtype)
                mask_pad[:, 0] = 1
                mask = np.concatenate([mask, mask_pad])
                types = np.concatenate([types, np.zeros((pad, types.shape[1]), types.dtype)])
            out = self._jitted(self.params, jnp.asarray(ids), jnp.asarray(mask),
                               jnp.asarray(types))
            scores.append(np.asarray(out[:n]))
        return np.concatenate(scores) if scores else np.zeros((0,), np.float32)
