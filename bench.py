"""Headline benchmark: exact-kNN QPS over a 1M-doc index on one TPU chip.

Prints ONE JSON line:
  {"metric": "exact_knn_qps_1m", "value": N, "unit": "qps", "vs_baseline": R}

The north-star target (BASELINE.json) is >= 10,000 QPS exact search over 1M
embeddings on a v5e-8 (ICI-sharded). On this single chip the pro-rata target
is 10_000 / 8 = 1250 QPS; ``vs_baseline`` is measured QPS / 1250, so > 1.0
beats the north star at per-chip granularity. (The reference publishes no
numbers of its own — BASELINE.md.)
"""

from __future__ import annotations

import json
import time

import numpy as np

N_DOCS = 1_000_000
DIM = 384           # MiniLM-L6 embedding width
N_QUERIES = 256     # per search call
K = 10
TARGET_QPS_PER_CHIP = 10_000 / 8


def main() -> None:
    import jax
    import jax.numpy as jnp

    from qst_tpu.ops.distances import l2_normalize
    from qst_tpu.retrieval.index import exact_topk

    rng = np.random.default_rng(0)
    # build the index: unit-norm corpus resident in HBM
    corpus = rng.standard_normal((N_DOCS, DIM)).astype(np.float32)
    corpus = jax.device_put(jnp.asarray(corpus))
    corpus = jax.jit(l2_normalize)(corpus)
    # rotating query batches so no dispatch-level caching can elide work
    query_batches = [
        jax.jit(l2_normalize)(jnp.asarray(
            rng.standard_normal((N_QUERIES, DIM)).astype(np.float32)))
        for _ in range(4)
    ]

    def search(q):
        # corpus pre-normalized → cosine == dot
        return exact_topk(q, corpus, K, "dot_score", tile=131072)

    # warmup / compile
    s, i = search(query_batches[0])
    _ = np.asarray(i)

    iters = 20
    checksum = 0
    t0 = time.perf_counter()
    for step in range(iters):
        s, i = search(query_batches[step % len(query_batches)])
        # materialize to host: under the axon relay block_until_ready alone
        # does not guarantee execution completed, so read the result
        checksum += int(np.asarray(i)[0, 0])
    elapsed = time.perf_counter() - t0

    qps = N_QUERIES * iters / elapsed
    print(json.dumps({
        "metric": "exact_knn_qps_1m",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / TARGET_QPS_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
