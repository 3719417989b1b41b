"""Scorer-only timing vs cell budget L (tile geometry) — scratch.

The 4M-doc bench (L=3584 → LT=896, n_t=4) showed ~20x worse effective
bandwidth at Q=64 than the 1M profile (L=1152 → LT=384). Sweep L on
synthetic cells to find the geometry cliff.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qst_tpu.ops.ivf_pallas import ivf_cell_scores_fn


def main():
    D, C = 384, 2048
    key = jax.random.key(0)
    scorer = ivf_cell_scores_fn()
    for L in (1024, 1152, 2048, 3584):
        kc, key = jax.random.split(key)
        cells = jax.random.normal(kc, (C, L, D), jnp.bfloat16)
        for Q, P in ((64, 4), (64, 16), (1024, 4)):
            kq, kp, key = jax.random.split(key, 3)
            q = jax.random.normal(kq, (Q, D), jnp.float32)
            pr = jax.random.randint(kp, (Q, P), 0, C, jnp.int32)
            np.asarray(scorer(q, cells, pr)[:1, :1])
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(scorer(q, cells, pr)[:1, :1])
                ts.append(time.perf_counter() - t0)
            t = min(ts)
            mb = Q * P * L * D * 2 / 1e6
            print(f"L={L:5d} Q={Q:5d} P={P:2d}: {t*1e3:7.1f} ms "
                  f"({mb/t/1e3:6.1f} GB/s, {mb:.0f} MB)", flush=True)
        del cells
    print("done")


if __name__ == "__main__":
    main()
