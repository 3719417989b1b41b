"""PQIndex: recall / throughput / capacity on one v5e.

Two experiments (run separately — each sizes its corpus to HBM):

1. default: 1M x 384 same-process A/B — exact-bf16 vs PQ (m=48, 16x
   smaller) per-call + sustained QPS, decode onehot-vs-gather A/B, and
   recall@10 at refine factors 0/4/8/16 on two corpus distributions:
   *structured* (rank-64 latent mixing + noise — the realistic shape of
   sentence embeddings) and *iid-normal* (the adversarial worst case for
   any quantizer: all variance is unquantizable noise).
2. --capacity: build the largest code matrix worth bragging about —
   100,663,296 docs x 48 B = 4.7 GB of HBM (the same corpus exact would
   be 77 GB bf16, 5x over the chip) — generated and encoded entirely
   on device, then measure sustained search QPS. This is the capability
   PQ buys: ~13x the bf16 in-HBM ceiling, searched at MXU rate instead
   of host-link rate.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/pq_bench.py \
    [--capacity] [--n_docs N] [--q 4096] [--iters 8]
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
from qst_tpu.retrieval.pq import PQIndex, pq_encode, pq_train


def structured_corpus(key, n, d, rank=64, noise=0.05):
    """Rank-`rank` latent corpus: the realistic regime (sentence embeddings
    have low intrinsic dimension), where PQ subspaces capture signal."""
    kw, kl, kn = jax.random.split(key, 3)
    w = jax.random.normal(kw, (rank, d), jnp.float32) / np.sqrt(rank)

    @functools.partial(jax.jit, static_argnames=("rows",))
    def gen(k1, k2, rows):
        lat = jax.random.normal(k1, (rows, rank), jnp.float32)
        return lat @ w + noise * jax.random.normal(k2, (rows, d),
                                                   jnp.float32)

    parts = []
    chunk = 1 << 20
    for lo in range(0, n, chunk):
        kl, ka = jax.random.split(kl)
        kn, kb = jax.random.split(kn)
        parts.append(gen(ka, kb, min(chunk, n - lo)))
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


def recall(truth_ids, got_ids, k):
    return float(np.mean([len(set(a[:k]) & set(b[:k])) / k
                          for a, b in zip(truth_ids, got_ids)]))


def sustained_qps(search_stream, q, k, iters, depth=4):
    list(search_stream((q,), k=k))                    # warm
    t0 = time.perf_counter()
    for _ in search_stream((q for _ in range(iters)), k=k, depth=depth):
        pass
    dt = time.perf_counter() - t0
    return q.shape[0] * iters / dt, dt / iters * 1e3


def run_default(args):
    n, d, k = args.n_docs or 1_000_000, args.dim, args.k
    dists = (("structured", "iid-normal") if args.dist == "both"
             else (args.dist,))
    for dist in dists:
        key = jax.random.key(0)
        if dist == "structured":
            corpus = structured_corpus(key, n, d)
        else:
            corpus = jax.random.normal(key, (n, d), jnp.float32)
        # queries = perturbed corpus rows: every query has true near
        # neighbors, so recall@10 measures neighbor recovery, not noise
        qk1, qk2 = jax.random.split(jax.random.key(1))
        rows = jax.random.choice(qk1, n, (args.q,), replace=False)
        q = np.asarray(corpus[rows]
                       + 0.03 * jax.random.normal(qk2, (args.q, d)))

        exact = ExactIndex(corpus, normalize=True, dtype="bfloat16")
        t0 = time.perf_counter()
        pq = PQIndex(corpus, m=args.m, keep_rows=True,
                     encode_chunk=1 << 16, anisotropic=args.anisotropic)
        t_build = time.perf_counter() - t0
        print(f"[{dist}] PQ build {n:,}x{d} m={args.m}: {t_build:.1f}s "
              f"(codes {pq.codes.nbytes/1e9:.2f} GB vs bf16 "
              f"{exact.embeddings.nbytes/1e9:.2f} GB)", flush=True)

        _, i_true = exact.search(q, k=k)
        for rf in (0, 4, 8, 16):
            _, i_pq = pq.search(q, k=k, refine_factor=rf)
            print(f"[{dist}] recall@{k} refine x{rf}: "
                  f"{recall(i_true, i_pq, k):.3f}", flush=True)

        def timed(fn, rep=6):
            fn()
            t0 = time.perf_counter()
            for _ in range(rep):
                fn()
            return (time.perf_counter() - t0) / rep * 1e3

        t_ex = timed(lambda: exact.search(q, k=k))
        t_oh = timed(lambda: pq.search(q, k=k, refine_factor=0))
        t_ga = timed(lambda: pq.search(q, k=k, refine_factor=0,
                                       decode="gather"))
        print(f"[{dist}] per-call ms @Q={args.q}: exact={t_ex:.1f} "
              f"pq-onehot={t_oh:.1f} pq-gather={t_ga:.1f}", flush=True)
        qps_ex, _ = sustained_qps(exact.search_stream, q, k, args.iters)
        qps_pq, _ = sustained_qps(pq.search_stream, q, k, args.iters)
        print(f"[{dist}] sustained QPS: exact={qps_ex:.0f} "
              f"pq={qps_pq:.0f}", flush=True)
        # serving-shape refined latency (refine gather rides the host link,
        # so quote it at a serving batch, not the throughput batch)
        qs = q[:256]
        t_rf = timed(lambda: pq.search(qs, k=k, refine_factor=8), rep=4)
        print(f"[{dist}] refined x8 @Q=256: {t_rf:.1f} ms/call "
              f"({256/t_rf*1e3:.0f} QPS)", flush=True)
        del corpus, exact, pq


def run_capacity(args):
    # 1536 full score tiles: zero padding
    n = args.n_docs or 1536 * 65536
    d, m, chunk = args.dim, args.m, 1 << 20
    key = jax.random.key(0)
    kw, key = jax.random.split(key)
    w = jax.random.normal(kw, (64, d), jnp.float32) / 8.0

    @jax.jit
    def gen(k1, k2):
        lat = jax.random.normal(k1, (chunk, 64), jnp.float32)
        return (lat @ w + 0.05 * jax.random.normal(k2, (chunk, d),
                                                   jnp.float32))

    k1, k2 = jax.random.split(jax.random.key(1))
    cb = pq_train(gen(k1, k2)[:131072], jax.random.key(2), m)

    @functools.partial(jax.jit, donate_argnums=0)
    def fill(buf, rows, lo):
        return jax.lax.dynamic_update_slice(buf, rows, (lo, 0))

    t0 = time.perf_counter()
    codes = jnp.zeros((n, m), jnp.uint8)
    enc = 1 << 16   # pq_encode's (B, m, 256) fit transient stays ~800 MB
    for i in range(n // chunk):
        key, ka = jax.random.split(key)
        ka, kb = jax.random.split(ka)
        x = gen(ka, kb)
        for lo in range(0, chunk, enc):
            codes = fill(codes, pq_encode(x[lo:lo + enc], cb),
                         jnp.int32(i * chunk + lo))
        if i % 2 == 1:
            codes.block_until_ready()   # bound in-flight gen transients
    codes.block_until_ready()
    print(f"encoded {n:,} docs in {time.perf_counter()-t0:.0f}s "
          f"(on-device generation + encode; codes "
          f"{codes.nbytes/1e9:.2f} GB in HBM — exact bf16 would be "
          f"{n*d*2/1e9:.0f} GB, {n*d*2/16e9:.1f}x the chip)", flush=True)

    idx = PQIndex.from_codes(codes, cb)   # device adoption: no host trip
    Q = min(args.q, 2048)
    kq1, kq2 = jax.random.split(jax.random.key(3))
    q = np.asarray(gen(kq1, kq2)[:Q])
    qps, ms = sustained_qps(idx.search_stream, q, args.k, args.iters,
                            depth=2)
    print(f"sustained: {qps:.0f} QPS ({ms:.1f} ms/call, Q={Q}, "
          f"k={args.k}, depth 2) over {n:,} docs on ONE chip", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", action="store_true")
    ap.add_argument("--n_docs", type=int, default=0)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--m", type=int, default=48)
    ap.add_argument("--q", type=int, default=4096)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dist", default="both",
                    choices=["both", "structured", "iid-normal"])
    ap.add_argument("--anisotropic", type=float, default=0.0,
                    help="score-aware training weight eta (see pq_train)")
    args = ap.parse_args()
    (run_capacity if args.capacity else run_default)(args)


if __name__ == "__main__":
    main()
