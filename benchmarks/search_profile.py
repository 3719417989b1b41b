"""Component-level timing of the search backends (VERDICT r1 #2).

Times each stage-prefix of the Pallas v2 pipeline and the XLA scan so
RESULTS.md can state what the search is actually bound by. Marginal stage
cost = difference between consecutive prefixes.

Relay rules respected:
- outputs are reduced to SCALARS inside the jit before the host read (a raw
  (4096, 7813) stage output is 128 MB ≈ 4 s of relay transfer — that would
  measure the tunnel, not the chip);
- the corpus is an explicit jit argument, never a closed-over constant (a
  captured 768 MB constant blows the relay's remote-compile request limit:
  HTTP 413);
- persistent compile cache on; every number includes the ~30 ms relay
  round-trip.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/search_profile.py
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

DIM = 384
K = 10
BUCKET = 128


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
        pallas_topk_v2,
    )
    from qst_tpu.retrieval.index import exact_topk

    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((args.n_docs, DIM)).astype(np.float32)
    corpus = jax.jit(l2_normalize)(jax.device_put(jnp.asarray(corpus)))
    corpus_bf16 = corpus.astype(jnp.bfloat16)
    qs = [jax.jit(l2_normalize)(jnp.asarray(
        rng.standard_normal((args.q, DIM)).astype(np.float32))
    ).astype(jnp.bfloat16) for _ in range(4)]

    def timeit(name, fn):
        out = fn(qs[0], corpus_bf16)
        _ = [np.asarray(r) for r in jax.tree.leaves(out)]
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = fn(qs[i % len(qs)], corpus_bf16)
            _ = [np.asarray(r) for r in jax.tree.leaves(out)]
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:30s} {dt * 1e3:8.1f} ms/call", flush=True)
        return dt

    @jax.jit
    def s1_kernel(q, c):
        return bucket_maxima(q, c).sum()

    @jax.jit
    def s2_select(q, c):
        bm = bucket_maxima(q, c)
        return _hierarchical_top_buckets(bm, K).sum()

    @jax.jit
    def s3_full(q, c):
        top_s, top_i = pallas_topk_v2(q, c, K)
        return top_s.sum(), top_i.sum()

    @jax.jit
    def scan_full(q, c):
        top_s, top_i = exact_topk(q, c, K, "dot_score", tile=131072)
        return top_s.sum(), top_i.sum()

    @jax.jit
    def matmul_only(q, c):
        # pure MXU roofline probe: same FLOPs as scoring, max-reduced
        s = jax.lax.dot_general(q, c, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return s.max()

    timeit("matmul+max only (roofline)", matmul_only)
    timeit("v2 s1: bucket_maxima kernel", s1_kernel)
    timeit("v2 s2: + hierarchical select", s2_select)
    timeit("v2 s3: + gather rescore (full)", s3_full)
    timeit("xla scan (bf16, tile 131k)", scan_full)


if __name__ == "__main__":
    main()
