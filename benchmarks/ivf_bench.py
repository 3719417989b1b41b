"""IVF index at scale: build-time breakdown + recall/QPS curve.

Round-3 redesign target (VERDICT round 2, weak #3): the round-2 build ran a
per-doc Python loop over a full (N, C) host similarity matrix — hours at
multi-million-doc corpora. The new build is: sampled bf16 k-means + chunked
MXU assignment + vectorized host fill + on-device cell scatter.

The corpus is generated ON DEVICE as ~65k-blob clustered data (IVF recall is
meaningless on isotropic gaussian data) and never visits the host. Ground
truth for recall comes from the exact fused pipeline on the same corpus.

Usage: PYTHONPATH=/root/repo python benchmarks/ivf_bench.py \
    [--n_docs 8000000] [--n_clusters 2048] [--q 1024]
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qst_tpu.ops.topk_pallas import pallas_topk_v2
from qst_tpu.retrieval import IVFIndex


@jax.jit
def _blob_chunk(key, centers, scale):
    kc, kn = jax.random.split(key)
    cid = jax.random.randint(kc, (1 << 20,), 0, centers.shape[0])
    noise = jax.random.normal(kn, (1 << 20, centers.shape[1]), jnp.bfloat16)
    x = (centers[cid] + scale * noise).astype(jnp.float32)
    # pre-normalized corpus: cos == dot everywhere downstream, and no
    # full-corpus f32 normalize transient is ever needed
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(jnp.bfloat16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_docs", type=int, default=8_000_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--n_clusters", type=int, default=2048)
    ap.add_argument("--q", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cell_budget", type=int, default=0,
                    help="override the 95th-percentile budget")
    ap.add_argument("--host_corpus", action="store_true",
                    help="build from a HOST-resident corpus (cells-only "
                    "HBM; the scalable >HBM build path)")
    ap.add_argument("--n_blobs", type=int, default=1024,
                    help="cluster blobs in the synthetic corpus; IVF "
                    "presumes corpus structure at roughly the cell scale")
    ap.add_argument("--compact", action="store_true",
                    help="IVFIndex.compact() after the build: re-pack HBM "
                    "so near-full-chip searches don't trip over build "
                    "fragmentation (the >HBM cells-only configuration)")
    args = ap.parse_args()
    assert args.n_docs % (1 << 20) == 0, "n_docs must be a multiple of 2^20"

    key = jax.random.key(0)
    kc, key = jax.random.split(key)
    centers = jax.random.normal(kc, (args.n_blobs, args.dim), jnp.float32)

    t0 = time.perf_counter()
    chunks = []
    for t in range(args.n_docs >> 20):
        key, kk = jax.random.split(key)
        chunks.append(_blob_chunk(kk, centers, 0.35))
    corpus = jnp.concatenate(chunks)
    del chunks
    corpus.block_until_ready()
    print(f"device corpus {corpus.shape} bf16 "
          f"({corpus.size * 2 / 1e9:.1f} GB) in "
          f"{time.perf_counter() - t0:.0f}s", flush=True)

    key, kq = jax.random.split(key)
    q_noise = jax.random.normal(kq, (args.q, args.dim), jnp.float32) * 0.25
    queries = (corpus[: args.q].astype(jnp.float32) + q_noise)
    qn = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)
    qn16 = qn.astype(jnp.bfloat16)

    # exact ground truth on the same (pre-normalized) corpus
    t0 = time.perf_counter()
    gs, gi = pallas_topk_v2(qn16, corpus, args.k)
    truth = [set(map(int, row)) for row in np.asarray(gi)]
    t_exact = time.perf_counter() - t0
    print(f"exact truth over {args.n_docs:,}: {t_exact:.1f}s "
          f"(includes compile)", flush=True)
    # exact QPS reference (warm)
    t0 = time.perf_counter()
    s, i = pallas_topk_v2(qn16, corpus, args.k)
    np.asarray(s)
    t_exact_warm = time.perf_counter() - t0
    print(f"exact warm: {t_exact_warm*1e3:.0f} ms "
          f"-> {args.q / t_exact_warm:.0f} QPS", flush=True)
    del s, i

    if args.host_corpus:
        corpus_for_build = np.asarray(corpus)   # host RAM; cells-only HBM
        corpus_dev = None
        del corpus
    else:
        corpus_for_build = corpus
        corpus_dev = corpus
    t0 = time.perf_counter()
    ivf = IVFIndex(corpus_for_build, n_clusters=args.n_clusters,
                   dtype="bfloat16", train_sample=131072, n_iters=10,
                   cell_budget=args.cell_budget or None)
    t_build = time.perf_counter() - t0
    cells_gb = ivf.cells.size * 2 / 1e9
    print(f"IVF build: {t_build:.1f}s total "
          f"(C={args.n_clusters}, L={ivf.cell_budget}, cells "
          f"{cells_gb:.1f} GB, spilled={ivf.spilled})", flush=True)
    del corpus_for_build
    if args.compact:
        t0 = time.perf_counter()
        ivf.compact()
        print(f"compact(): {time.perf_counter() - t0:.1f}s "
              "(cells re-packed through host RAM)", flush=True)

    # IVF wins in the SMALL-batch serving regime (per-query DMA is
    # n_probe*L*D bytes vs exact's one corpus stream for ALL queries) —
    # sweep Q and n_probe for both backends
    for Q in (64, 256, args.q):
        sub = qn[:Q]           # device f32, like the serving encode handoff
        sub16 = qn16[:Q]
        # exact reference at this Q
        np.asarray(pallas_topk_v2(sub16, corpus_dev, args.k)[0]) \
            if corpus_dev is not None else None
        if corpus_dev is not None:
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(pallas_topk_v2(sub16, corpus_dev, args.k)[0])
                ts.append(time.perf_counter() - t0)
            print(f"Q={Q:5d} exact:   {min(ts)*1e3:7.1f} ms -> "
                  f"{Q/min(ts):7.0f} QPS", flush=True)
        for backend in ("pallas", "xla"):
            for n_probe in (4, 16, 64):
                try:
                    s, ids = ivf.search(sub, k=args.k, n_probe=n_probe,
                                        backend=backend)   # warm
                except Exception as e:
                    print(f"Q={Q} {backend} n_probe={n_probe}: FAILED "
                          f"{type(e).__name__}: {str(e)[:150]}", flush=True)
                    continue
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    s, ids = ivf.search(sub, k=args.k, n_probe=n_probe,
                                        backend=backend)
                    ts.append(time.perf_counter() - t0)
                best = min(ts)
                recall = np.mean([
                    len(truth[j] & set(x for x in ids[j] if x is not None))
                    / args.k for j in range(Q)])
                print(f"Q={Q:5d} {backend:6s} n_probe={n_probe:3d}: "
                      f"recall@{args.k} {recall:.3f}, {best*1e3:7.1f} ms "
                      f"-> {Q/best:7.0f} QPS", flush=True)
    # pipelined serving comparison at the small-batch regime (the relay
    # round-trip dominates per-call numbers; depth-4 streams amortize it)
    Q = 64
    sub = qn[:Q]
    sub16 = qn16[:Q]
    BATCHES = 40
    if corpus_dev is not None:
        pend = []
        for _ in range(4):
            np.asarray(pallas_topk_v2(sub16, corpus_dev, args.k)[0][:1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            pend = []
            for _ in range(BATCHES):
                pend.append(pallas_topk_v2(sub16, corpus_dev, args.k))
                if len(pend) >= 4:
                    np.asarray(pend.pop(0)[0][:1, :1])
            while pend:
                np.asarray(pend.pop(0)[0][:1, :1])
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"stream Q={Q} exact:        {Q*BATCHES/best:8.0f} QPS "
              f"({best/BATCHES*1e3:6.2f} ms/batch)", flush=True)
    for n_probe in (4, 16):
        list(ivf.search_stream((sub for _ in range(4)), k=args.k,
                               n_probe=n_probe, backend="pallas"))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            got = list(ivf.search_stream((sub for _ in range(BATCHES)),
                                         k=args.k, n_probe=n_probe,
                                         backend="pallas", depth=4))
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        ids = got[0][1]
        rec = np.mean([len(truth[j] & set(x for x in ids[j]
                                          if x is not None)) / args.k
                       for j in range(Q)])
        print(f"stream Q={Q} ivf P={n_probe:2d}:   {Q*BATCHES/best:8.0f} QPS "
              f"({best/BATCHES*1e3:6.2f} ms/batch, recall {rec:.3f})",
              flush=True)
    print("done")


if __name__ == "__main__":
    main()
