"""Secondary benchmark: encode throughput (sentences/sec/chip) + MFU.

MiniLM-L6-size sentence encoder, bf16 compute, S=128 — the corpus-indexing
workload (BASELINE.md "encode sents/sec/chip, to be measured and tracked").
Variants (VERDICT r1 #6): single-batch dispatch, the K-batch scanned
pipeline (``embed_many_fn`` — encode's analogue of the train multi-step
driver), larger single batches, and the flash-attention path. Prints one
JSON line per variant plus a summary with model FLOPs utilization.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/encode_bench.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

S = 128
V5E_BF16_PEAK = 197e12  # TPU v5e peak bf16 FLOP/s (public spec)


def encoder_flops_per_sentence(cfg, seq_len: int) -> float:
    """Matmul FLOPs of one forward pass per sentence: per layer
    8*H^2 (QKV+out proj) + 4*H*I (MLP) + 4*S*H (QK^T and AV), x2 for
    multiply+add, per token; embeddings/norms excluded (non-MXU)."""
    per_token = cfg.num_layers * (
        8 * cfg.hidden_size ** 2
        + 4 * cfg.hidden_size * cfg.intermediate_size
        + 4 * seq_len * cfg.hidden_size)
    return float(per_token * seq_len)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--variants", type=str,
                    default="b2048,b8192,fused2048,fused8192,"
                            "b8192_dev,fused8192_dev")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qst_tpu.core.config import EncoderConfig
    from qst_tpu.core.meshes import enable_compilation_cache
    from qst_tpu.models.sentence_encoder import (
        embed_fn,
        embed_many_fn,
        init_params,
    )

    enable_compilation_cache()
    cfg = EncoderConfig.minilm_l6()
    params = init_params(cfg, jax.random.key(0))
    fps = encoder_flops_per_sentence(cfg, S)
    rng = np.random.default_rng(0)

    def make_batches(shape, n=4):
        return [
            (jnp.asarray(rng.integers(0, cfg.vocab_size, shape), jnp.int32),
             jnp.ones(shape, jnp.int32))
            for _ in range(n)
        ]

    results = {}

    def bench(name, fn, batches, sents_per_call):
        emb = fn(params, *batches[0])
        _ = np.asarray(emb).reshape(-1)[:4]
        t0 = time.perf_counter()
        for i in range(args.iters):
            emb = fn(params, *batches[i % len(batches)])
            _ = np.asarray(emb).reshape(-1)[:1]  # force completion
        dt = (time.perf_counter() - t0) / args.iters
        sps = sents_per_call / dt
        mfu = sps * fps / V5E_BF16_PEAK
        results[name] = (sps, mfu, dt)
        print(json.dumps({
            "metric": f"encode_{name}", "value": round(sps, 1),
            "unit": "sents/sec/chip", "ms_per_call": round(dt * 1e3, 1),
            "mfu": round(mfu, 3)}), flush=True)
        return sps

    def bench_piped(name, fn, batches, sents_per_call, depth=4):
        """Host-materializing encode with depth-pipelined dispatch (the
        SentenceEncoder.encode dispatch_depth path): the device→host
        embedding transfer of batch N overlaps the compute of batches
        N+1..N+depth−1."""
        emb = fn(params, *batches[0])
        _ = np.asarray(emb)
        t0 = time.perf_counter()
        pending = []
        for i in range(args.iters):
            pending.append(fn(params, *batches[i % len(batches)]))
            if len(pending) >= depth:
                _ = np.asarray(pending.pop(0))
        while pending:
            _ = np.asarray(pending.pop(0))
        dt = (time.perf_counter() - t0) / args.iters
        sps = sents_per_call / dt
        mfu = sps * fps / V5E_BF16_PEAK
        results[name] = (sps, mfu, dt)
        print(json.dumps({
            "metric": f"encode_{name}", "value": round(sps, 1),
            "unit": "sents/sec/chip", "ms_per_call": round(dt * 1e3, 1),
            "mfu": round(mfu, 3)}), flush=True)
        return sps

    chosen = set(args.variants.split(","))
    if "b2048_piped" in chosen:
        bench_piped("b2048_piped", jax.jit(embed_fn(cfg)),
                    make_batches((2048, S)), 2048)
    if "fused2048_piped" in chosen:
        ucfg = EncoderConfig.minilm_l6(use_fused_layer=True)
        bench_piped("fused_b2048_piped", jax.jit(embed_fn(ucfg)),
                    make_batches((2048, S)), 2048)
    if "b2048" in chosen:
        bench("b2048", jax.jit(embed_fn(cfg)), make_batches((2048, S)), 2048)
    if "many8" in chosen:
        bench("many8_b2048", jax.jit(embed_many_fn(cfg)),
              make_batches((8, 2048, S), n=2), 8 * 2048)
    if "b8192" in chosen:
        bench("b8192", jax.jit(embed_fn(cfg)), make_batches((8192, S), n=2),
              8192)
    if "flash2048" in chosen:
        fcfg = EncoderConfig.minilm_l6(use_flash_attention=True)
        bench("flash_b2048", jax.jit(embed_fn(fcfg)),
              make_batches((2048, S)), 2048)
    if "flash_many8" in chosen:
        fcfg = EncoderConfig.minilm_l6(use_flash_attention=True)
        bench("flash_many8_b2048", jax.jit(embed_many_fn(fcfg)),
              make_batches((8, 2048, S), n=2), 8 * 2048)
    # fused per-layer Pallas kernel (ops/fused_layer_pallas.py): attention
    # probs + layernorms + GELU never reach HBM — the round-2 answer to the
    # bandwidth bound documented in RESULTS.md
    if "fused2048" in chosen:
        ucfg = EncoderConfig.minilm_l6(use_fused_layer=True)
        bench("fused_b2048", jax.jit(embed_fn(ucfg)),
              make_batches((2048, S)), 2048)
    if "fused8192" in chosen:
        ucfg = EncoderConfig.minilm_l6(use_fused_layer=True)
        bench("fused_b8192", jax.jit(embed_fn(ucfg)),
              make_batches((8192, S), n=2), 8192)
    if "fused_many8" in chosen:
        ucfg = EncoderConfig.minilm_l6(use_fused_layer=True)
        bench("fused_many8_b2048", jax.jit(embed_many_fn(ucfg)),
              make_batches((8, 2048, S), n=2), 8 * 2048)
    # device-resident variants: embeddings stay in HBM (the corpus-indexing
    # workload hands them straight to the on-device ExactIndex); only a
    # scalar checksum leaves the chip to force completion. Through the dev
    # relay the (B, 384) f32 host transfer alone costs ~75 ms per 2048-batch
    # (~40 MB/s tunnel) — production deployments see the _dev numbers.
    if "b8192_dev" in chosen:
        f = embed_fn(cfg)
        bench("b8192_dev",
              jax.jit(lambda p, i, m: jnp.sum(f(p, i, m))),
              make_batches((8192, S), n=2), 8192)
    if "fused8192_dev" in chosen:
        ucfg = EncoderConfig.minilm_l6(use_fused_layer=True)
        uf = embed_fn(ucfg)
        bench("fused_b8192_dev",
              jax.jit(lambda p, i, m: jnp.sum(uf(p, i, m))),
              make_batches((8192, S), n=2), 8192)

    best = max(results.items(), key=lambda kv: kv[1][0])
    print(json.dumps({
        "metric": "encode_sents_per_sec_minilm_l6_s128",
        "value": round(best[1][0], 1), "unit": "sents/sec/chip",
        "variant": best[0], "mfu": round(best[1][1], 3)}))


if __name__ == "__main__":
    main()
