"""Component-level timing of the Pallas IVF search path (scratch).

Finds where the non-cell-DMA time goes: scorer kernel alone vs probe
selection vs masking/top-k vs the assembled `_ivf_pallas_search_fn`.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qst_tpu.ops.distances import l2_normalize
from qst_tpu.ops.ivf_pallas import ivf_cell_scores_fn
from qst_tpu.retrieval.index import _local_topk
from qst_tpu.retrieval.ivf import IVFIndex, _ivf_pallas_search_fn


def timeit(f, n=10):
    f()  # warm/compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    N, D, C = 1 << 20, 384, 2048
    key = jax.random.key(0)
    kc, kd, kq = jax.random.split(key, 3)
    centers = jax.random.normal(kc, (1024, D), jnp.float32)
    cid = jax.random.randint(kd, (N,), 0, 1024)
    x = centers[cid] + 0.35 * jax.random.normal(kd, (N, D), jnp.bfloat16
                                                ).astype(jnp.float32)
    x = (x / jnp.linalg.norm(x, axis=1, keepdims=True)).astype(jnp.bfloat16)
    x.block_until_ready()

    t0 = time.perf_counter()
    ivf = IVFIndex(x, n_clusters=C, dtype="bfloat16", train_sample=131072,
                   n_iters=10)
    print(f"build {time.perf_counter() - t0:.1f}s  L={ivf.cell_budget} "
          f"cells {ivf.cells.size * 2 / 1e9:.2f} GB", flush=True)
    L = ivf.cell_budget

    q = jax.random.normal(kq, (1024, D), jnp.float32)
    qn = l2_normalize(q)

    for Q in (64, 1024):
        qq = qn[:Q]
        for P in (4, 16):
            # probe selection only
            @jax.jit
            def probes(qf):
                csim = jnp.dot(qf, ivf.centroids.T,
                               preferred_element_type=jnp.float32)
                return jax.lax.top_k(csim, P)[1].astype(jnp.int32)

            pr = probes(qq)
            t_probe = timeit(lambda: probes(qq).block_until_ready())

            # scorer kernel alone (probe table fixed on device)
            scorer = ivf_cell_scores_fn()
            sc = scorer(qq, ivf.cells, pr)
            t_score = timeit(
                lambda: scorer(qq, ivf.cells, pr).block_until_ready())

            # mask + local top-k on the scorer output
            @jax.jit
            def mask_topk(scores, probe):
                fillp = ivf.fill[probe]
                iota = jnp.arange(L, dtype=jnp.int32)
                ok = iota[None, None, :] < fillp[:, :, None]
                s = jnp.where(ok.reshape(Q, P * L), scores, -jnp.inf)
                return _local_topk(s, 10)

            mask_topk(sc, pr)
            t_topk = timeit(
                lambda: jax.block_until_ready(mask_topk(sc, pr)))

            # assembled single-dispatch search fn
            fn = _ivf_pallas_search_fn(10, P, False)
            fn(qq, ivf.centroids, ivf.cells, ivf.cell_ids, ivf.fill)
            t_full = timeit(lambda: jax.block_until_ready(
                fn(qq, ivf.centroids, ivf.cells, ivf.cell_ids, ivf.fill)))

            dma_mb = Q * P * L * D * 2 / 1e6
            print(f"Q={Q:5d} P={P:2d}: probe {t_probe*1e3:6.1f} | scorer "
                  f"{t_score*1e3:6.1f} ({dma_mb/t_score/1e3:5.1f} GB/s) | "
                  f"mask+topk {t_topk*1e3:6.1f} | full {t_full*1e3:6.1f} ms",
                  flush=True)
    print("done")


if __name__ == "__main__":
    main()
