"""Component-level timing of the search backends (VERDICT r1 #2).

Times each stage of the Pallas v2 pipeline and the XLA scan separately so
RESULTS.md can state what the search is actually bound by. Relay rules: host
materialization per iteration, persistent compile cache, subtract nothing —
every number includes the ~30 ms relay round-trip.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/search_profile.py
"""

from __future__ import annotations

import argparse
import functools
import os
import time

import numpy as np

DIM = 384
K = 10


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--q", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--n_docs", type=int, default=1_000_000)
    args = ap.parse_args()

    import jax

    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from qst_tpu.ops.distances import l2_normalize
    from qst_tpu.ops.topk_pallas import (
        _hierarchical_top_buckets,
        bucket_maxima,
    )
    from qst_tpu.retrieval.index import exact_topk

    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((args.n_docs, DIM)).astype(np.float32)
    corpus = jax.jit(l2_normalize)(jax.device_put(jnp.asarray(corpus)))
    corpus_bf16 = corpus.astype(jnp.bfloat16)
    qs = [jax.jit(l2_normalize)(jnp.asarray(
        rng.standard_normal((args.q, DIM)).astype(np.float32))
    ).astype(jnp.bfloat16) for _ in range(4)]

    def timeit(name, fn, reads):
        out = fn(qs[0])
        _ = [np.asarray(r) for r in reads(out)]
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = fn(qs[i % len(qs)])
            _ = [np.asarray(r)[:1] for r in reads(out)]
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:28s} {dt * 1e3:8.1f} ms/call")
        return dt

    # stage 1: fused matmul + bucket maxima kernel only
    timeit("bucket_maxima (kernel)",
           lambda q: bucket_maxima(q, corpus_bf16), lambda o: [o])

    # stage 1+2: + hierarchical bucket selection
    @jax.jit
    def through_select(q):
        bm = bucket_maxima(q, corpus_bf16)
        return _hierarchical_top_buckets(bm, K)

    timeit("+ hierarchical select", through_select, lambda o: [o])

    # stage 3 variants: rescore of winning buckets
    @jax.jit
    def full_f32_gather(q):
        bm = bucket_maxima(q, corpus_bf16)
        bucket_ids = _hierarchical_top_buckets(bm, K)
        BUCKET = 128
        Q = q.shape[0]
        N = corpus_bf16.shape[0]
        doc_ids = (bucket_ids[:, :, None] * BUCKET
                   + jnp.arange(BUCKET)[None, None, :])
        flat = doc_ids.reshape(Q, K * BUCKET)
        valid = flat < N
        safe = jnp.minimum(flat, N - 1)
        docs = corpus_bf16[safe]
        scores = jnp.einsum("qd,qmd->qm", q.astype(jnp.float32),
                            docs.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
        scores = jnp.where(valid, scores, -jnp.inf)
        top_s, pos = jax.lax.top_k(scores, K)
        return top_s, jnp.take_along_axis(flat, pos, axis=1)

    timeit("+ gather rescore f32", full_f32_gather, lambda o: list(o))

    @jax.jit
    def full_bf16_vpu(q):
        bm = bucket_maxima(q, corpus_bf16)
        bucket_ids = _hierarchical_top_buckets(bm, K)
        BUCKET = 128
        Q = q.shape[0]
        N = corpus_bf16.shape[0]
        doc_ids = (bucket_ids[:, :, None] * BUCKET
                   + jnp.arange(BUCKET)[None, None, :])
        flat = doc_ids.reshape(Q, K * BUCKET)
        valid = flat < N
        safe = jnp.minimum(flat, N - 1)
        docs = corpus_bf16[safe]  # (Q, k*128, D) bf16
        # VPU broadcast-multiply + reduce in f32, no dtype blowup
        scores = jnp.sum(q[:, None, :].astype(jnp.float32)
                         * docs.astype(jnp.float32), axis=-1)
        scores = jnp.where(valid, scores, -jnp.inf)
        top_s, pos = jax.lax.top_k(scores, K)
        return top_s, jnp.take_along_axis(flat, pos, axis=1)

    timeit("+ gather rescore vpu-sum", full_bf16_vpu, lambda o: list(o))

    # the XLA scan for comparison
    timeit("xla scan (bf16, tile 131k)",
           lambda q: exact_topk(q, corpus_bf16, K, "dot_score", tile=131072),
           lambda o: list(o))


if __name__ == "__main__":
    main()
