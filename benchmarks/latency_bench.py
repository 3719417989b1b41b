"""Serving latency: per-call exact-search latency at small query batches.

The online-serving shape (one query to a few dozen per request) through the
fused Pallas pipeline over the 1M-doc bf16 index. All numbers include the
~30 ms relay round-trip of this environment; device time is the remainder.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/latency_bench.py
"""
import os, time
import numpy as np, jax
os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from qst_tpu.ops.distances import l2_normalize
from qst_tpu.ops.topk_pallas import pallas_topk_v2

N, D, K = 1_000_000, 384, 10
rng = np.random.default_rng(0)
corpus = jax.jit(l2_normalize)(jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))).astype(jnp.bfloat16)
for Q in (1, 8, 64, 256, 1024):
    qs = [jax.jit(l2_normalize)(jnp.asarray(rng.standard_normal((Q, D)).astype(np.float32))).astype(jnp.bfloat16) for _ in range(4)]
    s, i = pallas_topk_v2(qs[0], corpus, K); _ = np.asarray(i)[0, 0]
    lat = []
    for it in range(15):
        t0 = time.perf_counter()
        s, i = pallas_topk_v2(qs[it % 4], corpus, K)
        _ = np.asarray(i)[0, 0]
        lat.append((time.perf_counter() - t0) * 1e3)
    lat.sort()
    print(f"Q={Q:5d}: p50={lat[len(lat)//2]:7.1f} ms  min={lat[0]:7.1f}  "
          f"p90={lat[int(len(lat)*0.9)]:7.1f}  QPS@p50={Q/lat[len(lat)//2]*1e3:9.0f}", flush=True)
