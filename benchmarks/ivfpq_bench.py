"""IVFPQIndex: recall / throughput / capacity on one v5e.

The serving-scale envelope bench (VERDICT r3 item 3): IVF cells holding
PQ codes, decode bounded to probed cells. Two experiments:

1. default (--n_docs N, default 4M): same-process A/B —
   IVFPQ bits=4 vs bits=8 vs PQIndex full scan on an identical
   structured (rank-64) corpus: build time, recall@10 at refine 0/8
   against streamed exact ground truth, n_probe sweep, sustained QPS at
   serving batch sizes. Refine rows are real (int8, host).
2. --capacity: 100,663,296 docs x 48 B — generated, encoded, and
   scattered entirely ON DEVICE (the host relay never sees the corpus;
   IncrementalCellFill sees only (B, 4) int32 choice tables). Measures
   build, sustained QPS, and recall@10 both raw and exact-refined —
   refined recall re-ranks candidates against rows REGENERATED
   chunk-by-chunk from the corpus seed (exact math, no 150 GB host
   table); refined serving latency is timed against a same-shape int8
   host table so the gather+upload cost is real (--refine_table makes
   the table contents real too, at the cost of generating 38 GB).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/ivfpq_bench.py \
    [--capacity] [--n_docs N] [--bits 4] [--q 256] [--n_probe 0=tune]
"""

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qst_tpu.ops.distances import l2_normalize
from qst_tpu.retrieval.ivf import kmeans
from qst_tpu.retrieval.ivfpq import (
    IVFPQIndex,
    IncrementalCellFill,
    pq_encode_raw,
    pq_train_raw,
)
from qst_tpu.retrieval.pq import PQIndex, pq_encode, pq_train
from qst_tpu.retrieval.pq4 import pq4_encode, pq4_train

CHUNK = 1 << 20
RANK = 64


def make_gen(d: int, seed: int = 0):
    """Seeded rank-RANK corpus chunk generator (the pq_bench recipe):
    chunk i is reproducible from (seed, i) alone — ground truth and
    refine rows can be regenerated instead of stored.

    NOTE: iid latents are the IVF-ADVERSARIAL worst case — true
    neighbors of a query spread near-uniformly across cells (measured:
    probe-oracle recall 0.82 at 3.1% of 8192 cells probed, 33M docs), so
    any cell-pruning index pays most of its recall budget to the data,
    not the quantizer. Real embedding corpora are the opposite shape
    (topical clusters, near-duplicates): see :func:`make_clustered_gen`.
    """
    kw = jax.random.key(seed)
    w = jax.random.normal(kw, (RANK, d), jnp.float32) / 8.0

    @functools.partial(jax.jit, static_argnames=("rows",))
    def gen(i: jax.Array, rows: int = CHUNK):
        k1 = jax.random.fold_in(jax.random.key(seed + 1), i)
        k2 = jax.random.fold_in(jax.random.key(seed + 2), i)
        lat = jax.random.normal(k1, (rows, RANK), jnp.float32)
        return lat @ w + 0.05 * jax.random.normal(k2, (rows, d),
                                                  jnp.float32)

    return gen


def make_clustered_gen(d: int, n_centers: int = 1 << 16, seed: int = 0,
                       noise: float = 0.35):
    """Clustered corpus generator: each doc is a latent cluster center
    plus within-cluster noise, mapped through the same fixed rank-RANK
    projection — the shape of real sentence-embedding corpora (encoders
    map text onto topical manifolds: clusters and near-duplicates), and
    the workload IVF exists for. Within-cluster cosine ≈ 0.89 at
    noise=0.35 (well-conditioned ranking, NOT near-duplicate ties).
    Deterministic from (seed, chunk) like :func:`make_gen`.

    ``n_centers`` must scale with the corpus (callers pass ~n/32): a
    fixed center count at 100M docs gives every doc ~1,500 cos≈0.89
    near-duplicates, and recall saturates on within-cluster TIE
    RESOLUTION regardless of n_probe (measured: flat 0.548 refined
    recall from n_probe 8 to 64) — an adversarial duplicate pileup, not
    the topical-cluster shape this generator models."""
    kw, kc = jax.random.split(jax.random.key(seed))
    w = jax.random.normal(kw, (RANK, d), jnp.float32) / 8.0
    centers = jax.random.normal(kc, (n_centers, RANK), jnp.float32)

    # centers/w enter as ARGUMENTS, not closure constants: jit embeds
    # closed-over concrete arrays as HLO literals, and at capacity scale
    # (n/32 centers -> hundreds of MB) the literal-carrying compile
    # request exceeds the dev relay's remote_compile body limit
    # (HTTP 413) — and is pathologically slow well before that
    @functools.partial(jax.jit, static_argnames=("rows",))
    def _gen(i: jax.Array, centers: jax.Array, w: jax.Array,
             rows: int = CHUNK):
        k1 = jax.random.fold_in(jax.random.key(seed + 1), i)
        k2 = jax.random.fold_in(jax.random.key(seed + 2), i)
        k3 = jax.random.fold_in(jax.random.key(seed + 3), i)
        cid = jax.random.randint(k1, (rows,), 0, centers.shape[0])
        lat = centers[cid] + noise * jax.random.normal(
            k2, (rows, RANK), jnp.float32)
        return lat @ w + 0.05 * jax.random.normal(k3, (rows, d),
                                                  jnp.float32)

    def gen(i: jax.Array, rows: int = CHUNK):
        return _gen(i, centers, w, rows=rows)

    return gen


@functools.partial(jax.jit, static_argnames=("n_choices", "sub"))
def assign_scan(chunk, centroids, n_choices: int = 4, sub: int = 8192):
    """(B, D) -> (B, n_choices) best-first cells; one dispatch per chunk,
    the (sub, C) score transient bounded by lax.map."""
    B = chunk.shape[0]
    x = l2_normalize(chunk.astype(jnp.float32)).astype(jnp.bfloat16)
    c = centroids.astype(jnp.bfloat16)

    def f(xs):
        sim = jax.lax.dot_general(xs, c.T, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return jax.lax.top_k(sim, n_choices)[1].astype(jnp.int32)

    return jax.lax.map(f, x.reshape(B // sub, sub, -1)).reshape(
        B, n_choices)


def encode_scan(bits: int):
    @functools.partial(jax.jit, static_argnames=("residual", "sub"))
    def enc(chunk, cell, centroids, codebooks, residual: bool = True,
            sub: int = 65536):
        # normalize + centroid gather + residual all INSIDE the per-block
        # body: at 100M-doc builds three full-chunk f32 transients
        # (~4.8 GB) alongside the codes buffer OOM the 16 GB chip;
        # per-block they are ~100 MB and freed between blocks.
        B = chunk.shape[0]

        def f(args):
            xs, cs = args
            rows = l2_normalize(xs.astype(jnp.float32))
            x = rows - centroids[cs] if residual else rows
            return (pq4_encode(x, codebooks) if bits == 4
                    else pq_encode_raw(x, codebooks))

        m_bytes = codebooks.shape[0] // 2 if bits == 4 \
            else codebooks.shape[0]
        return jax.lax.map(
            f, (chunk.reshape(B // sub, sub, -1),
                cell.reshape(B // sub, sub))).reshape(B, m_bytes)

    return enc


@functools.partial(jax.jit, donate_argnums=(0,))
def scatter_rows(buf, pos, vals):
    return buf.at[pos].set(vals)


@functools.partial(jax.jit, donate_argnums=(0,))
def scatter_ids(buf, pos, vals):
    return buf.at[pos].set(vals)


def build_on_device(gen, n_docs, d, n_clusters, budget, m, bits,
                    residual=True, train_sample=1 << 20, seed=0,
                    verbose=True):
    """Chunked 100M-scale build: corpus chunks never leave the device."""
    t0 = time.perf_counter()
    key = jax.random.key(seed)
    sample = gen(jnp.int32(0), rows=min(train_sample, CHUNK))
    k1, k2 = jax.random.split(key)
    centroids, sample_assign = kmeans(sample, k1, n_clusters, 8,
                                      compute_dtype="bfloat16")
    rows_n = l2_normalize(sample.astype(jnp.float32))
    train_vecs = rows_n - centroids[sample_assign] if residual else rows_n
    codebooks = (pq4_train(train_vecs, k2, 2 * m)
                 if bits == 4 else pq_train_raw(train_vecs, k2, m))
    del sample, rows_n, train_vecs
    if verbose:
        print(f"  trained C={n_clusters} + PQ{bits} in "
              f"{time.perf_counter()-t0:.0f}s", flush=True)

    # ---- pass A: assign every chunk, then pick the smallest cell budget
    # that places the WHOLE corpus (spill trials on the host-resident
    # choice tables). A fixed headroom guess cannot survive clustered
    # corpora — their per-cell demand is heavy-tailed (measured: 1.30×
    # mean with 8 spill choices still exhausts near the 80% fill mark at
    # 100M docs), and the budget must be known before the (C·L, m) codes
    # buffer is allocated. Choices download as int16 (C ≤ 32768) — half
    # the relay bytes of int32.
    n_chunks = n_docs // CHUNK
    cdtype = np.int16 if n_clusters <= 32768 else np.int32
    all_choices = []
    for i in range(n_chunks):
        a = assign_scan(gen(jnp.int32(i)), centroids, n_choices=16)
        if cdtype is np.int16:
            a = a.astype(jnp.int16)   # cast ON DEVICE: half the relay bytes
        all_choices.append(np.asarray(a))
    if verbose:
        print(f"  assigned {n_chunks} chunks in "
              f"{time.perf_counter()-t0:.0f}s", flush=True)
    mean_fill = n_docs / n_clusters
    placements = None
    for mult in (budget / mean_fill, 1.5, 1.75, 2.0):
        L = int(np.ceil(mean_fill * mult / 128)) * 128
        if n_clusters * L * m > 9e9:    # codes-buffer HBM cap
            break
        filler = IncrementalCellFill(n_clusters, L)
        try:
            placements = [filler.place(c.astype(np.int64))
                          for c in all_choices]
            budget = L
            break
        except ValueError:
            placements = None
    if placements is None:
        raise RuntimeError("no cell budget under the HBM cap places the "
                           "corpus — raise n_clusters")
    if verbose:
        print(f"  placed with budget L={budget} "
              f"({budget / mean_fill:.2f}x mean, spilled "
              f"{filler.spilled:,}) at {time.perf_counter()-t0:.0f}s",
              flush=True)

    # ---- pass B: regenerate chunks, encode against their placed cells,
    # scatter into the now-correctly-sized buffers
    codes_buf = jnp.zeros((n_clusters * budget, m), jnp.uint8)
    ids_buf = jnp.full((n_clusters * budget,), -1, jnp.int32)
    enc = encode_scan(bits)
    for i, (cell, slot) in enumerate(placements):
        chunk = gen(jnp.int32(i))
        pos = jnp.asarray(cell * budget + slot)
        codes = enc(chunk, jnp.asarray(cell), centroids, codebooks,
                    residual)
        codes_buf = scatter_rows(codes_buf, pos, codes)
        ids_buf = scatter_ids(
            ids_buf, pos,
            jnp.arange(i * CHUNK, (i + 1) * CHUNK, dtype=jnp.int32))
        if verbose and (i + 1) % 16 == 0:
            codes_buf.block_until_ready()
            print(f"  chunk {i+1}/{n_chunks} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
    codes_buf.block_until_ready()
    t_build = time.perf_counter() - t0
    idx = IVFPQIndex.from_device_arrays(
        centroids, codes_buf.reshape(n_clusters, budget, m),
        ids_buf.reshape(n_clusters, budget), codebooks,
        residual=residual, bits=bits)
    if verbose:
        print(f"  build total {t_build:.0f}s — codes "
              f"{codes_buf.nbytes/1e9:.2f} GB in HBM for {n_docs:,} docs "
              f"(exact bf16: {n_docs*d*2/1e9:.0f} GB)", flush=True)
    return idx, t_build


def exact_ground_truth(gen, n_docs, q, k):
    """Streamed exact cosine top-k over regenerated chunks (no corpus in
    memory): one (Q, CHUNK) score matmul per chunk + running merge."""
    from qst_tpu.retrieval.index import fetch_pair

    @jax.jit
    def step(carry, chunk, base):
        cs, ci = carry
        rows = l2_normalize(chunk.astype(jnp.float32)).astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            l2_normalize(jnp.asarray(q, jnp.float32)).astype(jnp.bfloat16),
            rows.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        s1, p1 = jax.lax.top_k(s, k)
        i1 = p1 + base
        s2, pos = jax.lax.top_k(jnp.concatenate([cs, s1], axis=1), k)
        i2 = jnp.take_along_axis(jnp.concatenate([ci, i1], axis=1), pos,
                                 axis=1)
        return s2, i2

    Q = q.shape[0]
    carry = (jnp.full((Q, k), -jnp.inf, jnp.float32),
             jnp.full((Q, k), -1, jnp.int32))
    for i in range(n_docs // CHUNK):
        carry = step(carry, gen(jnp.int32(i)), jnp.int32(i * CHUNK))
    return fetch_pair(*carry)


def regen_rows(gen, ids, d):
    """Gather exact unit-normalized corpus rows for arbitrary doc ids by
    regenerating their chunks ON DEVICE and downloading only the selected
    rows (a few MB — never a full chunk through the relay)."""
    ids = np.asarray(ids, np.int64)
    rows = np.empty((len(ids), d), np.float32)

    @jax.jit
    def pick(chunk, local):
        return l2_normalize(chunk.astype(jnp.float32))[local]

    for c in np.unique(ids // CHUNK):
        sel = np.nonzero(ids // CHUNK == c)[0]
        local = jnp.asarray((ids[sel] % CHUNK).astype(np.int32))
        rows[sel] = np.asarray(pick(gen(jnp.int32(c)), local))
    return rows


def refined_recall(gen, idx, q, truth_ids, k, n_probe, refine_factor):
    """Exact re-rank of the raw IVFPQ pool against REGENERATED rows —
    identical math to the keep_rows refine path, with the candidate rows
    computed instead of stored. All queries' candidates batch into one
    regeneration pass."""
    _, pool = idx.search(q, k=k * refine_factor, n_probe=n_probe,
                         refine_factor=0)
    cand_ids = sorted({int(j) for row in pool for j in row
                       if j is not None})
    pos_of = {j: p for p, j in enumerate(cand_ids)}
    rows = regen_rows(gen, cand_ids, q.shape[1])
    qn = np.asarray(l2_normalize(jnp.asarray(q, jnp.float32)))
    hits = 0
    for r, row in enumerate(pool):
        cand = [int(j) for j in row if j is not None]
        crows = rows[[pos_of[j] for j in cand]]
        order = np.argsort(-(crows @ qn[r]))[:k]
        got = {cand[o] for o in order}
        hits += len(got & set(int(t) for t in truth_ids[r]))
    return hits / (len(pool) * k)


def recall_of(truth_ids, got_lists, k):
    return float(np.mean([
        len(set(int(t) for t in a[:k]) & set(b[:k])) / k
        for a, b in zip(truth_ids, got_lists)]))


def sustained(idx, q, k, n_probe, refine_factor, iters=16, depth=4):
    list(idx.search_stream((q,), k=k, n_probe=n_probe,
                           refine_factor=refine_factor))
    t0 = time.perf_counter()
    for _ in idx.search_stream((q for _ in range(iters)), k=k,
                               n_probe=n_probe, depth=depth,
                               refine_factor=refine_factor):
        pass
    dt = time.perf_counter() - t0
    return q.shape[0] * iters / dt, dt / iters * 1e3


def run(args):
    d, k, m = 384, 10, 48
    n = args.n_docs or (1536 * 65536 if args.capacity else 4 * CHUNK)
    if n % CHUNK:
        # the corpus generator works in CHUNK-sized blocks; round DOWN so
        # the printed config matches what is actually indexed/evaluated
        n = max(CHUNK, (n // CHUNK) * CHUNK)
        print(f"n_docs rounded to {n:,} (multiple of {CHUNK})", flush=True)
    n_clusters = args.n_clusters or max(256, 1 << int(
        np.log2(max(1, n // 3072))))
    budget = args.budget or int(np.ceil(n / n_clusters * 1.30 / 128)) * 128
    gen = (make_clustered_gen(d, n_centers=max(1 << 16, n // 32))
           if args.dist == "clustered" else make_gen(d))
    kq = jax.random.split(jax.random.key(9))[0]
    rows0 = gen(jnp.int32(0))
    sel = jax.random.choice(kq, CHUNK, (args.q,), replace=False)
    q = np.asarray(rows0[sel] + 0.03 * jax.random.normal(
        jax.random.key(10), (args.q, d)))
    del rows0

    print(f"config: n={n:,} d={d} m={m} C={n_clusters} L={budget} "
          f"Q={args.q} dist={args.dist}", flush=True)
    t0 = time.perf_counter()
    s_true, i_true = exact_ground_truth(gen, n, q, k)
    print(f"exact ground truth streamed in "
          f"{time.perf_counter()-t0:.0f}s", flush=True)

    bit_list = [int(b) for b in str(args.bits).split(",")]
    for bits in bit_list:
        print(f"== IVFPQ bits={bits} ==", flush=True)
        idx, t_build = build_on_device(gen, n, d, n_clusters, budget, m,
                                       bits)
        probes = ([args.n_probe] if args.n_probe
                  else [p for p in (8, 16, 32, 64) if p < n_clusters])
        # serving refine timing per probe: same-shape int8 host table
        # (uninit — the gather/rescore cost is identical; --refine_table
        # for real contents). Host-BLAS refine (pq.REFINE_ON_HOST) is
        # the production default being timed here.
        if args.refine_timing:
            idx._refine_rows = np.empty((n, d), np.int8)
            idx._refine_scale = 127.0
        for p in probes:
            _, got = idx.search(q, k=k, n_probe=p, refine_factor=0)
            r_raw = recall_of(i_true, got, k)
            r_ref = refined_recall(gen, idx, q, i_true, k, p,
                                   args.refine)
            qps, ms = sustained(idx, q, k, p, 0, iters=args.iters)
            line = (f"  n_probe={p}: recall@10 raw={r_raw:.3f} "
                    f"refined x{args.refine}={r_ref:.3f}  raw-path "
                    f"{qps:,.0f} QPS ({ms:.1f} ms/call)")
            if args.refine_timing:
                rqps, rms = sustained(idx, q, k, p, args.refine,
                                      iters=max(4, args.iters // 2))
                line += (f"  refined-serving {rqps:,.0f} QPS "
                         f"({rms:.1f} ms/call)")
            print(line, flush=True)
        if args.refine_timing:
            idx._refine_rows = None
        del idx

    if args.with_pq:
        print("== PQIndex full scan (same corpus, same process) ==",
              flush=True)
        key = jax.random.key(7)
        cb = pq_train(gen(jnp.int32(0))[:131072], key, m)

        @functools.partial(jax.jit, donate_argnums=0)
        def fill(buf, rows, lo):
            return jax.lax.dynamic_update_slice(buf, rows, (lo, 0))

        t0 = time.perf_counter()
        codes = jnp.zeros((n, m), jnp.uint8)
        for i in range(n // CHUNK):
            x = gen(jnp.int32(i))
            for lo in range(0, CHUNK, 1 << 16):
                codes = fill(codes, pq_encode(x[lo:lo + (1 << 16)], cb),
                             jnp.int32(i * CHUNK + lo))
        codes.block_until_ready()
        print(f"  encoded in {time.perf_counter()-t0:.0f}s", flush=True)
        pq = PQIndex.from_codes(codes, cb)
        _, got = pq.search(q, k=k, refine_factor=0)
        print(f"  recall@10 raw={recall_of(i_true, got, k):.3f}",
              flush=True)
        list(pq.search_stream((q,), k=k))
        it = max(2, args.iters // 4)
        t0 = time.perf_counter()
        for _ in pq.search_stream((q for _ in range(it)), k=k, depth=2):
            pass
        dt = (time.perf_counter() - t0) / it
        print(f"  full-scan {args.q/dt:,.0f} QPS ({dt*1e3:.1f} ms/call) "
              f"at Q={args.q}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", action="store_true")
    ap.add_argument("--dist", default="clustered",
                    choices=["clustered", "iid"],
                    help="corpus shape: clustered = realistic embedding "
                    "corpus (topical clusters; the IVF workload), iid = "
                    "the cell-pruning-adversarial worst case")
    ap.add_argument("--n_docs", type=int, default=0)
    ap.add_argument("--n_clusters", type=int, default=0)
    ap.add_argument("--budget", type=int, default=0)
    ap.add_argument("--bits", default="4,8")
    ap.add_argument("--q", type=int, default=256)
    ap.add_argument("--n_probe", type=int, default=0)
    ap.add_argument("--refine", type=int, default=8)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--refine_timing", action="store_true")
    ap.add_argument("--with_pq", action="store_true")
    args = ap.parse_args()
    run(args)


if __name__ == "__main__":
    main()
