"""int8-quantized ExactIndex: capacity + throughput + recall on one v5e.

Two experiments (run separately — each sizes its corpus to HBM):

1. default: same-process A/B at the headline shape (1M x 384, Q=4096,
   k=10) — bf16 vs int8 sustained QPS (depth-4 search_stream) and int8
   recall@10 against the bf16 ranking.
2. --capacity: build the LARGEST in-HBM exact index the chip can hold —
   20M x 384 int8 = 7.7 GB (the same corpus in bf16 would be 15.4 GB and
   not leave room to search) — and measure sustained QPS. This is the
   capability int8 buys: 2x docs per chip at ~equal speed.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/int8_bench.py \
    [--capacity] [--n_docs N] [--q 4096] [--iters 12]
"""

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qst_tpu.retrieval import ExactIndex


def make_corpus(n_docs, dim, chunk=1 << 21):
    """Unit-norm bf16 corpus built in chunks (20M rows of f32 normal would
    be a 30 GB transient)."""
    parts = []
    key = jax.random.key(0)
    normalize = jax.jit(lambda x: (
        x / jnp.linalg.norm(x.astype(jnp.float32), axis=1, keepdims=True)
    ).astype(jnp.bfloat16))
    for lo in range(0, n_docs, chunk):
        key, kk = jax.random.split(key)
        parts.append(normalize(
            jax.random.normal(kk, (min(chunk, n_docs - lo), dim),
                              jnp.bfloat16)))
    out = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    out.block_until_ready()
    return out


def sustained_qps(index, q, k, iters, depth=4):
    batches = (q for _ in range(iters))
    list(index.search_stream((q,), k=k))            # warm
    t0 = time.perf_counter()
    for _ in index.search_stream(batches, k=k, depth=depth):
        pass
    dt = time.perf_counter() - t0
    return q.shape[0] * iters / dt, dt / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", action="store_true")
    ap.add_argument("--n_docs", type=int, default=0)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--q", type=int, default=4096)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    if args.capacity:
        # quantize CHUNK-WISE on device: a monolithic 20M x 384 f32
        # normalize transient would be 30 GB — the int8 index (7.7 GB) is
        # assembled directly, never holding more than one bf16 chunk extra
        n_docs = args.n_docs or 20_000_000
        chunk = 1 << 20
        scale = 127.0   # unit-norm rows: |component| <= 1

        @jax.jit
        def quant_chunk(key):
            x = jax.random.normal(key, (chunk, args.dim), jnp.float32)
            x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
            return jnp.clip(jnp.round(x * scale), -127, 127
                            ).astype(jnp.int8)

        @functools.partial(jax.jit, donate_argnums=0)
        def fill(buf, rows, lo):
            return jax.lax.dynamic_update_slice(buf, rows, (lo, 0))

        key = jax.random.key(0)
        t0 = time.perf_counter()
        emb8 = jnp.zeros((n_docs, args.dim), jnp.int8)
        for i in range(n_docs // chunk):
            key, kk = jax.random.split(key)
            emb8 = fill(emb8, quant_chunk(kk),
                        jnp.int32(i * chunk))   # donated: in-place
            if i % 2 == 1:
                # throttle async dispatch: each quant_chunk holds a ~1.6 GB
                # f32 transient; letting many queue alongside the 7.7 GB
                # buffer OOMs the 16 GB chip
                emb8.block_until_ready()
        emb8.block_until_ready()
        print(f"int8 corpus {emb8.shape} assembled in "
              f"{time.perf_counter()-t0:.0f}s", flush=True)
        idx = ExactIndex(emb8, dtype="int8", int8_scale=scale)
        print(f"int8 index: {idx.embeddings.nbytes/1e9:.1f} GB in HBM "
              f"({n_docs:,} docs; bf16 would be "
              f"{idx.embeddings.nbytes*2/1e9:.1f} GB)", flush=True)
        # depth 2 / Q=2048 at this scale: each in-flight search holds a
        # (Q, N/128) f32 bucket-maxima block (~1.3 GB at Q=2048/20M) next
        # to the 7.7 GB index — depth 4 at Q=4096 would need ~10 GB of
        # in-flight transients and OOM the 16 GB chip
        Q = min(args.q, 2048)
        q = np.asarray(jax.random.normal(jax.random.key(1),
                                         (Q, args.dim), jnp.float32))
        qps, ms = sustained_qps(idx, q, args.k, args.iters, depth=2)
        print(f"sustained: {qps:.0f} QPS ({ms:.1f} ms/call, Q={Q}, "
              f"k={args.k}, depth 2) over {n_docs:,} docs on ONE chip",
              flush=True)
        return

    n_docs = args.n_docs or 1_000_000
    emb = make_corpus(n_docs, args.dim)
    q = np.asarray(jax.random.normal(jax.random.key(1),
                                     (args.q, args.dim), jnp.float32))
    bf = ExactIndex(emb, dtype="bfloat16", normalize=False)
    i8 = ExactIndex(emb, dtype="int8")
    print(f"index bytes bf16 {bf.embeddings.nbytes/1e9:.2f} GB, "
          f"int8 {i8.embeddings.nbytes/1e9:.2f} GB", flush=True)

    _, ib = bf.search(q, k=args.k)
    _, i9 = i8.search(q, k=args.k)
    recall = np.mean([len(set(a) & set(b)) / args.k
                      for a, b in zip(ib, i9)])
    print(f"int8 recall@{args.k} vs bf16 ranking: {recall:.4f} "
          "(random unit vectors — adversarially tight score range)",
          flush=True)

    for name, idx in (("bf16", bf), ("int8", i8), ("bf16", bf),
                      ("int8", i8)):
        qps, ms = sustained_qps(idx, q, args.k, args.iters)
        print(f"{name}: sustained {qps:.0f} QPS ({ms:.1f} ms/call)",
              flush=True)


if __name__ == "__main__":
    main()
