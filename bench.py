"""Headline benchmark: exact-kNN QPS over a 1M-doc index on one TPU chip.

Prints ONE JSON line:
  {"metric": "exact_knn_qps_1m", "value": N, "unit": "qps", "vs_baseline": R}

The north-star target (BASELINE.json) is >= 10,000 QPS exact search over 1M
embeddings on a v5e-8 (ICI-sharded). On this single chip the pro-rata target
is 10_000 / 8 = 1250 QPS; ``vs_baseline`` is measured QPS / 1250, so > 1.0
beats the north star at per-chip granularity. (The reference publishes no
numbers of its own — BASELINE.md.)

Measurement notes (this environment):
- under the axon relay, ``jax.block_until_ready`` does not guarantee the
  execution finished — results are materialized to host every iteration;
- each dispatch carries ~30 ms of relay round-trip; Q=4096 queries per call
  amortizes it (sustained-throughput serving shape);
- a persistent compilation cache is enabled so repeated runs skip the
  (remote) compile.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

N_DOCS = 1_000_000
DIM = 384           # MiniLM-L6 embedding width
N_QUERIES = 4096    # per search call (sustained-throughput serving shape)
K = 10
ITERS = 12      # per measurement window
WINDOWS = 3     # report the best window: the relay/chip occasionally enters
                # ~2x-slow episodes (benchmarks/RESULTS.md "measurement
                # variance"), and peak sustained throughput is the
                # capability being measured
TARGET_QPS_PER_CHIP = 10_000 / 8


def _require_backend(timeout_s: float = 600.0) -> None:
    """Fail fast (exit 1) if the TPU backend can't initialize within
    ``timeout_s`` — a wedged relay otherwise blocks PJRT client creation
    indefinitely and the bench would silently eat the caller's whole
    timeout (observed: a dead tunnel held ``jax.devices()`` for 25+ min)."""
    import sys
    import threading

    ready: list = []

    def probe():
        import jax

        ready.append(jax.devices())

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not ready:
        print(f"bench: TPU backend failed to initialize within "
              f"{timeout_s:.0f}s (relay down?)", file=sys.stderr)
        sys.exit(1)


def main() -> None:
    _require_backend()

    import jax

    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from qst_tpu.ops.distances import l2_normalize
    from qst_tpu.ops.topk_pallas import pallas_topk_v2

    rng = np.random.default_rng(0)
    # build the index: unit-norm corpus resident in HBM, bf16 (MXU-native)
    corpus = rng.standard_normal((N_DOCS, DIM)).astype(np.float32)
    corpus = jax.jit(l2_normalize)(jax.device_put(jnp.asarray(corpus)))
    corpus = corpus.astype(jnp.bfloat16)

    query_batches = [
        jax.jit(l2_normalize)(jnp.asarray(
            rng.standard_normal((N_QUERIES, DIM)).astype(np.float32))
        ).astype(jnp.bfloat16)
        for _ in range(4)
    ]

    def search(q):
        # corpus pre-normalized → cosine == dot; the fused Pallas pipeline
        # (bucket-maxima kernel + dynamic-DMA rescore) is the production
        # single-device backend (ExactIndex backend="auto" picks it on TPU)
        return pallas_topk_v2(q, corpus, K)

    # warmup / compile
    s, i = search(query_batches[0])
    _ = np.asarray(i)

    # Sustained-throughput measurement: keep DEPTH searches in flight and
    # materialize results in completion order, exactly like a serving loop
    # that pipelines incoming request batches. Dispatch is async, the device
    # executes in order, and materializing call N forces completion of calls
    # 0..N — so every result is still read to host (under the axon relay
    # block_until_ready alone does not guarantee execution completed), but
    # the ~30 ms relay round-trip overlaps with device compute instead of
    # serializing after every call. Measured depth sweep (one v5e, 20 calls):
    # serialized 61k QPS, depth 2 110k, depth 4 114k, depth 8 115k.
    def run_window(depth: int, iters: int) -> float:
        checksum = 0
        pending = []
        t0 = time.perf_counter()
        for step in range(iters):
            pending.append(search(query_batches[step % len(query_batches)]))
            if len(pending) >= depth:
                _, i = pending.pop(0)
                checksum += int(np.asarray(i)[0, 0])
        while pending:
            _, i = pending.pop(0)
            checksum += int(np.asarray(i)[0, 0])
        return time.perf_counter() - t0

    DEPTH = 4
    window_times = [run_window(DEPTH, ITERS) for _ in range(WINDOWS)]
    best = min(window_times)

    # Diagnostics that separate "relay slow episode" from "kernel
    # regression" (round-4 verdict item 1):
    #   - serialized (depth-1) per-call time = device time + one full relay
    #     round-trip per call;
    #   - depth-8 per-call time ~= pure device time (the relay RTT is fully
    #     overlapped at depth 8 — the historical device bound is ~35.5 ms
    #     at Q=4096, i.e. ~115k QPS);
    #   - their difference estimates the relay RTT.
    # A healthy chip with a slow relay shows device_ms ~= history and
    # relay_rtt inflated; a kernel regression shows device_ms inflated.
    ser_s = run_window(1, 4)
    deep_s = run_window(8, ITERS)
    serialized_ms = 1e3 * ser_s / 4
    device_ms = 1e3 * deep_s / ITERS
    qps = N_QUERIES * ITERS / best
    mean_qps = N_QUERIES * ITERS / (sum(window_times) / len(window_times))
    print(json.dumps({
        "metric": "exact_knn_qps_1m",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / TARGET_QPS_PER_CHIP, 3),
        # best-of-windows is the headline (the relay has ~2x-slow episodes);
        # the mean keeps run-to-run variance visible and comparable
        "mean_over_windows": round(mean_qps, 1),
        "window_wall_s": [round(t, 3) for t in window_times],
        "window_qps": [round(N_QUERIES * ITERS / t, 1) for t in window_times],
        "serialized_ms_per_call": round(serialized_ms, 2),
        "device_ms_per_call_est": round(device_ms, 2),
        "relay_rtt_ms_est": round(serialized_ms - device_ms, 2),
    }))


if __name__ == "__main__":
    main()
