"""Secondary benchmark: quadruplet train-step throughput.

MiniLM-L6-size encoder, batch 32 quadruplets (the reference's default,
training/main.py:221), S=128, bf16 compute — one fused (4·32, 128) forward +
backward + AdamW per step. Prints one JSON line (steps/sec and the implied
quadruplets/sec).
"""

from __future__ import annotations

import json
import time

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, S, ITERS = 32, 128, 10


def main() -> None:
    import jax
    import jax.numpy as jnp

    from qst_tpu.core.config import EncoderConfig, LossConfig, TrainConfig
    from qst_tpu.core.meshes import enable_compilation_cache
    from qst_tpu.train.train_step import create_train_state, make_train_step

    enable_compilation_cache()
    cfg = EncoderConfig.minilm_l6()
    loss_cfg = LossConfig(margin_pos_part=0.5, margin_part_neg=0.5)
    tcfg = TrainConfig(batch_size=B, learning_rate=2e-5,
                       scheduler="warmuplinear", warmup_steps=100)
    state, tx = create_train_state(cfg, tcfg, jax.random.key(0), 1000,
                                   loss_cfg)
    step = make_train_step(cfg, loss_cfg, tx)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, B, S)), jnp.int32)
    mask = jnp.ones((4, B, S), jnp.int32)

    state, loss = step(state, ids, mask, jax.random.key(1))  # compile
    _ = float(loss)

    t0 = time.perf_counter()
    for i in range(ITERS):
        state, loss = step(state, ids, mask,
                           jax.random.fold_in(jax.random.key(2), i))
        _ = float(loss)  # force completion through the relay
    elapsed = time.perf_counter() - t0
    steps_per_sec = ITERS / elapsed
    print(json.dumps({
        "metric": "train_steps_per_sec_minilm_l6_b32_s128",
        "value": round(steps_per_sec, 2),
        "unit": "steps/sec/chip",
        "quadruplets_per_sec": round(steps_per_sec * B, 1),
    }))

    # multi-step driver: K steps per dispatch (amortizes launch overhead)
    from qst_tpu.train.train_step import make_multi_step

    K = 8
    multi = make_multi_step(cfg, loss_cfg, tx, K)
    sids = jnp.broadcast_to(ids, (K, *ids.shape))
    smask = jnp.broadcast_to(mask, (K, *mask.shape))
    keys = jax.random.split(jax.random.key(5), K)
    state, losses = multi(state, sids, smask, keys)
    _ = float(losses[-1])
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, losses = multi(state, sids, smask, keys)
        _ = float(losses[-1])
    elapsed = time.perf_counter() - t0
    sps = ITERS * K / elapsed
    print(json.dumps({
        "metric": "train_steps_per_sec_multistep_k8",
        "value": round(sps, 2),
        "unit": "steps/sec/chip",
        "quadruplets_per_sec": round(sps * B, 1),
    }))

    # fused-kernel training path: forward AND backward through the Pallas
    # layer kernels (custom VJP, ops/fused_layer_pallas.py); dropout rates
    # set to 0 for an apples-to-apples FLOP comparison with the Flax path
    # (the kernels support in-kernel counter-based dropout)
    for fb in (B, 256):
        fcfg = EncoderConfig.minilm_l6(use_fused_layer=True,
                                       hidden_dropout=0.0,
                                       attention_dropout=0.0)
        ftcfg = TrainConfig(batch_size=fb, learning_rate=2e-5,
                            scheduler="warmuplinear", warmup_steps=100)
        fstate, ftx = create_train_state(fcfg, ftcfg, jax.random.key(0),
                                         1000, loss_cfg)
        fstep = make_train_step(fcfg, loss_cfg, ftx)
        fids = jnp.asarray(rng.integers(0, fcfg.vocab_size, (4, fb, S)),
                           jnp.int32)
        fmask = jnp.ones((4, fb, S), jnp.int32)
        fstate, loss = fstep(fstate, fids, fmask, jax.random.key(1))
        _ = float(loss)
        t0 = time.perf_counter()
        for i in range(ITERS):
            fstate, loss = fstep(fstate, fids, fmask,
                                 jax.random.fold_in(jax.random.key(2), i))
        _ = float(loss)  # steps chain via donated state; fetch once
        elapsed = time.perf_counter() - t0
        sps = ITERS / elapsed
        print(json.dumps({
            "metric": f"train_steps_per_sec_fused_b{fb}",
            "value": round(sps, 2),
            "unit": "steps/sec/chip",
            "quadruplets_per_sec": round(sps * fb, 1),
        }))


if __name__ == "__main__":
    main()
