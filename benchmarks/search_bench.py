"""Search backend shootout: XLA bucket-max scan vs Pallas v2 pipeline.

Compares the two exact-kNN backends over a 1M x 384 corpus on the real chip,
in f32 and bf16, at serving batch Q. Prints QPS per backend. Measurement
follows the relay rules: results materialized to host every iteration,
persistent compilation cache enabled.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/search_bench.py
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

N_DOCS = 1_000_000
DIM = 384
K = 10


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--q", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--n_docs", type=int, default=N_DOCS)
    ap.add_argument("--backends", type=str,
                    default="scan_bf16,v2_bf16,v2_f32")
    args = ap.parse_args()

    import jax

    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from qst_tpu.ops.distances import l2_normalize
    from qst_tpu.ops.topk_pallas import pallas_topk_v2
    from qst_tpu.retrieval.index import exact_topk

    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((args.n_docs, DIM)).astype(np.float32)
    corpus_f32 = jax.jit(l2_normalize)(jax.device_put(jnp.asarray(corpus)))
    corpus_bf16 = corpus_f32.astype(jnp.bfloat16)

    qbatches_f32 = [
        jax.jit(l2_normalize)(jnp.asarray(
            rng.standard_normal((args.q, DIM)).astype(np.float32)))
        for _ in range(4)
    ]
    qbatches_bf16 = [q.astype(jnp.bfloat16) for q in qbatches_f32]

    def bench(name, fn, batches):
        s, i = fn(batches[0])
        ref = np.asarray(i)[:4, 0].tolist()
        checksum = 0
        t0 = time.perf_counter()
        for step in range(args.iters):
            s, i = fn(batches[step % len(batches)])
            checksum += int(np.asarray(i)[0, 0])
        dt = time.perf_counter() - t0
        qps = args.q * args.iters / dt
        print(f"{name:12s}  {qps:10.1f} QPS   "
              f"{dt / args.iters * 1e3:7.1f} ms/call   top1[:4]={ref}")
        return qps

    chosen = set(args.backends.split(","))
    if "scan_bf16" in chosen:
        bench("scan_bf16",
              lambda q: exact_topk(q, corpus_bf16, K, "dot_score",
                                   tile=131072),
              qbatches_bf16)
    if "scan_f32" in chosen:
        bench("scan_f32",
              lambda q: exact_topk(q, corpus_f32, K, "dot_score",
                                   tile=131072),
              qbatches_f32)
    if "v2_bf16" in chosen:
        bench("v2_bf16",
              lambda q: pallas_topk_v2(q, corpus_bf16, K),
              qbatches_bf16)
    if "v2_f32" in chosen:
        bench("v2_f32",
              lambda q: pallas_topk_v2(q, corpus_f32, K),
              qbatches_f32)


if __name__ == "__main__":
    main()
