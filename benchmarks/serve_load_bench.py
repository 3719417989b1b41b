"""Serving layer under concurrency: batched QPS, tail latency, batch sizes.

VERDICT r2 #6: the only HTTP number so far was one warm 98 ms search. This
drives RetrievalServer with N concurrent closed-loop clients issuing
mixed-k searches over a 1M x 384 bf16 index (the headline serving corpus),
reporting:

- end-to-end HTTP QPS and p50/p95/p99 request latency,
- the DynamicBatcher's realized batch-size distribution,
- the direct `ExactIndex.search_stream` device bound on the same index
  (what the HTTP + batching layers wrap), measured in the SAME process.

Closed-loop clients cap throughput at clients/latency, so server capacity
only shows at high client counts — sweep them (and batcher worker counts)
in ONE process to amortize the compile warmup:

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/serve_load_bench.py \
    [--clients 64,256] [--workers 1,2] [--seconds 20] [--n_docs 1000000]
"""

import argparse
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qst_tpu.core.config import EncoderConfig
from qst_tpu.models.sentence_encoder import SentenceEncoder, init_params
from qst_tpu.models.tokenizer import HashTokenizer
from qst_tpu.ops.distances import l2_normalize
from qst_tpu.retrieval import ExactIndex, Retriever
from qst_tpu.serve.server import RetrievalServer

WORDS = ("cat dog car road mat park plane sky beach sand red small "
         "young pasta sauce cloud scene variant river tree").split()

KS = (5, 10, 32, 64)        # per-request k mix
BATCH_SHAPES = (8, 16, 32, 64, 128, 256)

# Pure-stdlib client worker run via `python -c` in SUBPROCESSES: one
# Python process of client threads is itself GIL-bound near ~600 req/s
# (measured — the server had 3-4x headroom at the realized batch size),
# so --client_procs fans the closed-loop clients over N processes. The
# worker deliberately imports no jax (a fresh interpreter re-registering
# the TPU plugin would contend for the chip).
_CLIENT_WORKER = r"""
import json, random, sys, threading, time, urllib.request
url, n_threads, seconds, seed = (sys.argv[1], int(sys.argv[2]),
                                 float(sys.argv[3]), int(sys.argv[4]))
words = %r
ks = %r
lat = []
lock = threading.Lock()
# epoch-based window bounds so the parent can compute throughput over the
# UNION of actual load windows (wall time in the parent would also count
# serialized interpreter spawn — tens of seconds on a busy 1-core host)
t_start = time.time()
stop_at = time.perf_counter() + seconds
def client(tid):
    r = random.Random(seed * 1000 + tid)
    my = []
    while time.perf_counter() < stop_at:
        q = " ".join(r.choice(words) for _ in range(6))
        k = r.choice(ks)
        body = json.dumps({"queries": [q], "k": k}).encode()
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/json"})
        t0 = time.perf_counter()
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = json.loads(resp.read())
        my.append(time.perf_counter() - t0)
        assert len(out["results"][0]) == k
    with lock:
        lat.extend(my)
threads = [threading.Thread(target=client, args=(i,))
           for i in range(n_threads)]
for t in threads: t.start()
for t in threads: t.join()
print(json.dumps({"lat": lat, "t0": t_start, "t1": time.time()}))
""" % (WORDS, list(KS))


def run_load_procs(url, n_procs, threads_per_proc, seconds):
    """Closed-loop load from n_procs OS processes × threads_per_proc.

    Throughput is computed over the union of the workers' OWN load windows
    (earliest start → latest finish), not the parent's wall clock — on a
    loaded 1-core host, serialized interpreter spawn otherwise inflates the
    denominator by tens of seconds."""
    import subprocess
    import sys

    procs = [subprocess.Popen(
        [sys.executable, "-c", _CLIENT_WORKER, url,
         str(threads_per_proc), str(seconds), str(i)],
        stdout=subprocess.PIPE, text=True) for i in range(n_procs)]
    lat, t0s, t1s = [], [], []
    for p in procs:
        out, _ = p.communicate(timeout=seconds + 300)
        rec = json.loads(out)
        lat.extend(rec["lat"])
        t0s.append(rec["t0"])
        t1s.append(rec["t1"])
    window = max(t1s) - min(t0s)
    return np.sort(np.asarray(lat)) * 1e3, window


def run_batcher_flood(batcher, clients, seconds):
    """Closed-loop load submitted DIRECTLY to the search DynamicBatcher —
    no HTTP, no JSON, no sockets. Isolates the batching+device capacity
    from the transport: (HTTP req/s) / (flood items/s) is the transport's
    share of the roofline on this host."""
    lat = []
    lock = threading.Lock()
    stop_at = time.perf_counter() + seconds

    def client(seed):
        r = np.random.default_rng(seed)
        my = []
        while time.perf_counter() < stop_at:
            q = " ".join(r.choice(WORDS, 6))
            k = int(r.choice(KS))
            t0 = time.perf_counter()
            out = batcher.submit((q, k, False))
            my.append(time.perf_counter() - t0)
            assert len(out) == k
        with lock:
            lat.extend(my)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    return np.sort(np.asarray(lat)) * 1e3, wall


def run_load(url, clients, seconds, rng):
    lat = []
    lock = threading.Lock()
    stop_at = time.perf_counter() + seconds

    def post(payload, timeout=120):
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=timeout) as r:
                return json.loads(r.read())
        except urllib.error.HTTPError as e:
            raise RuntimeError(f"HTTP {e.code}: {e.read().decode()}") from e

    def client(seed):
        r = np.random.default_rng(seed)
        my = []
        while time.perf_counter() < stop_at:
            q = " ".join(r.choice(WORDS, 6))
            k = int(r.choice(KS))
            t0 = time.perf_counter()
            out = post({"queries": [q], "k": k})
            my.append(time.perf_counter() - t0)
            assert len(out["results"][0]) == k
        with lock:
            lat.extend(my)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    return np.sort(np.asarray(lat)) * 1e3, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=str, default="64",
                    help="comma list: one load phase per count "
                         "(same process, warmup amortized)")
    ap.add_argument("--workers", type=str, default="2",
                    help="comma list of batcher worker counts to sweep")
    ap.add_argument("--client_procs", type=int, default=0,
                    help=">0: drive each load phase from this many client "
                         "SUBPROCESSES (clients/procs threads each) so the "
                         "measurement client is not a single GIL-bound "
                         "process")
    ap.add_argument("--no_http", action="store_true",
                    help="flood the search DynamicBatcher directly "
                    "(submit/result, no HTTP/JSON/sockets) — isolates "
                    "batching+device capacity from transport cost")
    ap.add_argument("--also_flood", action="store_true",
                    help="after the HTTP phases, run a flood phase per "
                    "client count against the SAME live server — both "
                    "transport-inclusive and capacity numbers from one "
                    "build/process (the expensive-index configuration)")
    ap.add_argument("--max_wait_ms", type=float, default=5.0,
                    help="batcher max_wait_s in ms (batch-coalescing "
                    "window)")
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--n_docs", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--index_dtype", default="bfloat16",
                    choices=["bfloat16", "int8", "pq", "ivfpq"],
                    help="serve a compressed index instead of bf16 (pq "
                    "serves PQ-only scores: the exact re-rank's candidate "
                    "gather rides the dev relay's ~40 MB/s host link and "
                    "would measure the relay, not the server; ivfpq "
                    "builds a residual IVF-PQ bits=4 index ON DEVICE from "
                    "the clustered generator — the >=50M-doc capacity "
                    "envelope — WITH the default exact refine against an "
                    "int8 host table, so every request pays the full "
                    "probe + decode + gather + rescore serving path)")
    ap.add_argument("--n_probe", type=int, default=0,
                    help="ivfpq: probed cells per query (0 = index "
                    "default 8)")
    ap.add_argument("--refine_table", default="surrogate",
                    choices=["surrogate", "real"],
                    help="ivfpq: int8 refine-table contents. 'surrogate' "
                    "allocates the (n_docs, dim) int8 table uninitialized "
                    "— the gather + upload + rescore COST is identical, "
                    "result contents are not meaningful; 'real' downloads "
                    "the quantized corpus through the relay first "
                    "(~n_docs*dim bytes at ~40 MB/s — minutes at 50M)")
    args = ap.parse_args()
    client_counts = [int(c) for c in args.clients.split(",")]
    worker_counts = [int(w) for w in args.workers.split(",")]

    rng = np.random.default_rng(0)
    cfg = EncoderConfig.minilm_l6()
    enc = SentenceEncoder(cfg, init_params(cfg, jax.random.key(0)),
                          HashTokenizer(vocab_size=cfg.vocab_size))

    retr = Retriever(enc, score="dot_score")
    if args.index_dtype == "ivfpq":
        # >= 50M-doc capacity envelope: corpus generated + encoded on
        # device (never materialized as embeddings), served through the
        # full probe -> 4-bit decode -> int8 host gather -> exact rescore
        # path every request takes in production
        import os
        import sys

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from ivfpq_bench import (  # noqa: E402
            CHUNK,
            build_on_device,
            make_clustered_gen,
        )

        n = max(CHUNK, (args.n_docs // CHUNK) * CHUNK)
        d = args.dim
        # C ≈ n/1536: the 100M capacity run measured finer cells beating
        # the √n folklore on recall AND QPS simultaneously (RESULTS.md r5)
        n_clusters = max(256, 1 << int(np.log2(max(1, n // 1536))))
        budget = int(np.ceil(n / n_clusters * 1.30 / 128)) * 128
        gen = make_clustered_gen(d, n_centers=max(1 << 16, n // 32))
        print(f"building IVF-PQ bits=4: n={n:,} C={n_clusters} "
              f"L={budget}", flush=True)
        idx, t_build = build_on_device(gen, n, d, n_clusters, budget,
                                       m=48, bits=4)
        if args.n_probe:
            idx.default_n_probe = args.n_probe
        tbl = np.empty((n, d), np.int8)
        if args.refine_table == "real":
            qz = jax.jit(lambda x: jnp.clip(jnp.round(l2_normalize(
                x.astype(jnp.float32)) * 127.0), -127, 127
            ).astype(jnp.int8))
            t0 = time.perf_counter()
            for i in range(n // CHUNK):
                tbl[i * CHUNK:(i + 1) * CHUNK] = np.asarray(
                    qz(gen(jnp.int32(i))))
            print(f"real int8 refine table downloaded in "
                  f"{time.perf_counter() - t0:.0f}s", flush=True)
        idx._refine_rows, idx._refine_scale = tbl, 127.0
        retr.index = idx
        args.n_docs = n
        print(f"serving IVF-PQ over {n:,} docs: build {t_build:.0f}s, "
              f"n_probe={idx.default_n_probe}, refine "
              f"x{idx.DEFAULT_REFINE} ({args.refine_table} int8 table, "
              f"{tbl.nbytes / 1e9:.1f} GB host)", flush=True)
    else:
        # index over random unit bf16 embeddings (the serving
        # configuration); doc texts skipped — search returns ids+scores
        emb = jax.random.normal(jax.random.key(1),
                                (args.n_docs, args.dim), jnp.bfloat16)
        emb = jax.jit(lambda x: l2_normalize(
            x.astype(jnp.float32)).astype(jnp.bfloat16))(emb)
        if args.index_dtype == "pq":
            from qst_tpu.retrieval import PQIndex

            retr.index = PQIndex(emb, m=48)
            retr.index.DEFAULT_REFINE = 0   # see --index_dtype help
        else:
            retr.index = ExactIndex(emb, normalize=False,
                                    dtype=args.index_dtype)
    print(f"serving a {args.index_dtype} index over {args.n_docs:,} docs",
          flush=True)

    # warm every compile shape the load phases can realize: the server
    # buckets both batch size and k to powers of two, so the shape set is
    # (B in BATCH_SHAPES) x (k-bucket). The jit caches are process-wide —
    # warming through retr.search covers every server below. (Warmup is
    # not part of any measurement; fresh remote compiles take minutes.)
    t0 = time.perf_counter()
    for k in sorted({RetrievalServer._bucket(k, 128) for k in KS}):
        for B in BATCH_SHAPES:
            # warm the SPLIT-PHASE path the server actually runs
            # (search_async dispatches a different program than search:
            # the encode stays on device) — an unwarmed shape otherwise
            # compiles mid-measurement and shows up as 5-20 s p99s
            retr.search_async([" ".join(rng.choice(WORDS, 6))] * B, k=k)()
    print(f"warmed all (B, k) shapes in {time.perf_counter() - t0:.0f}s",
          flush=True)

    for workers in worker_counts:
        server = RetrievalServer(retr, max_batch=256,
                                 max_wait_s=args.max_wait_ms / 1e3,
                                 workers=workers)
        batch_sizes = []
        orig = server._search_dispatch

        def recording(payloads):
            # split-phase batcher: batch_fn is the non-blocking dispatch —
            # each call is still exactly one realized batch
            batch_sizes.append(len(payloads))
            return orig(payloads)

        server._search_batcher._batch_fn = recording
        if not args.no_http:
            port = server.start()
            url = f"http://127.0.0.1:{port}/search"
        phases = (["flood"] if args.no_http
                  else ["http"] + (["flood"] if args.also_flood else []))
        for phase in phases:
            for clients in client_counts:
                batch_sizes.clear()
                if phase == "flood":
                    lat_ms, wall = run_batcher_flood(
                        server._search_batcher, clients, args.seconds)
                elif args.client_procs > 0:
                    lat_ms, wall = run_load_procs(
                        url, args.client_procs,
                        max(1, clients // args.client_procs),
                        args.seconds)
                else:
                    lat_ms, wall = run_load(url, clients, args.seconds,
                                            rng)
                bs = np.asarray(batch_sizes)
                print(f"workers={workers} clients={clients} {phase} "
                      f"reqs={len(lat_ms)} wall={wall:.1f}s "
                      f"-> {len(lat_ms) / wall:.0f} req/s (1 query/req)",
                      flush=True)
                print(f"  latency ms: p50 {np.percentile(lat_ms, 50):.1f} "
                      f"p95 {np.percentile(lat_ms, 95):.1f} "
                      f"p99 {np.percentile(lat_ms, 99):.1f} "
                      f"max {lat_ms[-1]:.1f}", flush=True)
                if bs.size:
                    print(f"  batch sizes: mean {bs.mean():.1f} p50 "
                          f"{np.percentile(bs, 50):.0f} max {bs.max()} "
                          f"over {bs.size} device calls", flush=True)
        if args.no_http:
            server._search_batcher.close()
            server._encode_batcher.close()
        else:
            server.stop()

    # direct device bound: pipelined search_stream on the same index with
    # pre-encoded queries, at the shapes the batcher realizes under load.
    # On ivfpq the served path refines — pass the same refine factor so
    # the bound includes the host gather + rescore the server pays.
    stream_kw = ({"refine_factor": retr.index.DEFAULT_REFINE}
                 if args.index_dtype == "ivfpq" else {})
    for B in (32, 64, 128, 256):
        qtexts = [" ".join(rng.choice(WORDS, 6)) for _ in range(B)]
        q_emb = np.asarray(enc.encode(qtexts))
        n_batches = 50
        it = (q_emb for _ in range(n_batches))
        list(retr.index.search_stream((q_emb,), k=64, **stream_kw))  # warm
        t0 = time.perf_counter()
        for _ in retr.index.search_stream(it, k=64, depth=4, **stream_kw):
            pass
        direct = time.perf_counter() - t0
        print(f"direct search_stream bound @ Q={B}: "
              f"{B * n_batches / direct:.0f} QPS "
              f"({direct / n_batches * 1e3:.1f} ms/batch)", flush=True)
    print("done")


if __name__ == "__main__":
    main()
