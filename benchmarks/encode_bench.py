"""Secondary benchmark: encode throughput (sentences/sec/chip).

MiniLM-L6-size sentence encoder, bf16 compute, S=128, batch 2048 — the
corpus-indexing workload (BASELINE.md "encode sents/sec/chip, to be measured
and tracked"). Prints one JSON line.
"""

from __future__ import annotations

import json
import time

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, S, ITERS = 2048, 128, 8


def main() -> None:
    import jax
    import jax.numpy as jnp

    from qst_tpu.core.config import EncoderConfig
    from qst_tpu.core.meshes import enable_compilation_cache
    from qst_tpu.models.sentence_encoder import embed_fn, init_params

    enable_compilation_cache()
    cfg = EncoderConfig.minilm_l6()
    params = init_params(cfg, jax.random.key(0))
    fwd = jax.jit(embed_fn(cfg))

    rng = np.random.default_rng(0)
    batches = [
        (jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)), jnp.int32),
         jnp.ones((B, S), jnp.int32))
        for _ in range(4)
    ]
    _ = np.asarray(fwd(params, *batches[0]))  # compile

    t0 = time.perf_counter()
    for i in range(ITERS):
        emb = fwd(params, *batches[i % len(batches)])
        _ = np.asarray(emb[0, :1])  # force completion through the relay
    elapsed = time.perf_counter() - t0
    sents_per_sec = B * ITERS / elapsed
    print(json.dumps({
        "metric": "encode_sents_per_sec_minilm_l6_s128",
        "value": round(sents_per_sec, 1),
        "unit": "sents/sec/chip",
    }))


if __name__ == "__main__":
    main()
