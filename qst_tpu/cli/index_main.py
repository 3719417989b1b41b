"""``python -m qst_tpu.cli.index_main`` — retrieval-index CLI.

The serving-facing fourth entry point (beyond the reference's three): build
a persistent embedding index from a chunked quadruplet dataset or a plain
text file (one doc per line), then query it.

  # build (encodes docs; saves embeddings + ids + docs next to the index)
  python -m qst_tpu.cli.index_main build --texts docs.txt --index_dir idx \
      --encoder_preset minilm-l6 --model_path trained/exp1

  # query (reloads without re-encoding the corpus)
  python -m qst_tpu.cli.index_main query --index_dir idx --k 5 \
      --queries "a cat on a mat" "a dog in a park"
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

from qst_tpu.cli.common import (
    dump_args,
    encoder_from_args,
    load_best_params,
    tokenizer_from_args,
)

logger = logging.getLogger("qst_tpu.cli.index")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    b = sub.add_parser("build", help="encode docs and persist an index")
    b.add_argument("--texts", help="plain text file, one document per line")
    b.add_argument("--dataset_root",
                   help="chunked quadruplet dataset (uses all captions)")
    b.add_argument("--index_dir", required=True)
    b.add_argument("--index_dtype", default="float32",
                   choices=["float32", "bfloat16", "int8", "pq", "ivf",
                            "ivfpq", "streaming"],
                   help="index storage dtype/kind: bfloat16 scores at MXU "
                   "rate; int8 halves HBM again (2x corpus per chip, "
                   "quantized-exact ranking); pq stores m bytes/doc "
                   "(16x smaller than bf16 at m=48) with exact re-rank "
                   "from host-resident rows; ivf is the approximate "
                   "k-means-cell index (n_probe cells scanned per query); "
                   "ivfpq holds PQ codes inside IVF cells — m bytes/doc "
                   "AND only probed cells decode per query")
    b.add_argument("--pq_m", type=int, default=48,
                   help="PQ subspaces (= bytes/doc) for --index_dtype pq")
    b.add_argument("--ivf_clusters", type=int, default=256,
                   help="k-means cells for --index_dtype ivf")
    b.add_argument("--ivf_probe", type=int, default=8,
                   help="cells scanned per query for --index_dtype ivf "
                   "(persisted as the index default)")
    b.add_argument("--ivfpq_bits", type=int, default=8, choices=[4, 8],
                   help="code width for --index_dtype ivfpq: 8 = one "
                   "256-way subspace per byte, 4 = two packed 16-way "
                   "nibble subspaces per byte (fast-scan decode)")
    b.add_argument("--encoder_preset", default="minilm-l6")
    b.add_argument("--vocab_path", default=None)
    b.add_argument("--model_path",
                   help="experiment dir with a trained best checkpoint")
    b.add_argument("--batch_size", type=int, default=256)
    b.add_argument("--seed", type=int, default=14)
    b.add_argument("--use_fused_layer", action=argparse.BooleanOptionalAction,
                   default=False, help="encode through the fused per-layer "
                   "Pallas kernel (TPU inference path)")

    s = sub.add_parser("serve", help="serve a persisted index over HTTP "
                       "(POST /search, POST /encode, GET /healthz; "
                       "dynamic micro-batching across concurrent requests)")
    s.add_argument("--index_dir", required=True)
    s.add_argument("--index_dtype", default="float32",
                   choices=["float32", "bfloat16", "int8", "pq", "ivf",
                            "ivfpq", "streaming"],
                   help="index storage dtype/kind: bfloat16 scores at MXU "
                   "rate; int8 halves HBM again (2x corpus per chip, "
                   "quantized-exact ranking); pq stores m bytes/doc "
                   "(16x smaller than bf16 at m=48) with exact re-rank "
                   "from host-resident rows; ivf is the approximate "
                   "k-means-cell index (n_probe cells scanned per query); "
                   "ivfpq holds PQ codes inside IVF cells — m bytes/doc "
                   "AND only probed cells decode per query")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8080)
    s.add_argument("--max_batch", type=int, default=256)
    s.add_argument("--max_wait_ms", type=float, default=5.0,
                   help="dynamic-batching straggler window")
    s.add_argument("--workers", type=int, default=2,
                   help="batcher collector threads; >1 keeps a second "
                   "batch in flight so host transfers overlap device "
                   "compute")
    s.add_argument("--updatable", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="serve a MUTABLE corpus: load the index into a "
                   "fixed-capacity UpdatableIndex so POST/DELETE /docs "
                   "add/remove documents online (requires docs.json in "
                   "the index dir; cos/dot scores only)")
    s.add_argument("--capacity", type=int, default=0,
                   help="updatable buffer capacity (default: 2x the "
                   "loaded corpus, min 65536)")
    s.add_argument("--encoder_preset", default="minilm-l6")
    s.add_argument("--vocab_path", default=None)
    s.add_argument("--model_path", default=None)
    s.add_argument("--seed", type=int, default=14)
    s.add_argument("--use_fused_layer", action=argparse.BooleanOptionalAction,
                   default=False, help="encode through the fused per-layer "
                   "Pallas kernel (TPU inference path)")

    q = sub.add_parser("query", help="search a persisted index")
    q.add_argument("--index_dir", required=True)
    q.add_argument("--index_dtype", default="float32",
                   choices=["float32", "bfloat16", "int8", "pq", "ivf",
                            "ivfpq", "streaming"],
                   help="index storage dtype/kind: bfloat16 scores at MXU "
                   "rate; int8 halves HBM again (2x corpus per chip, "
                   "quantized-exact ranking); pq stores m bytes/doc "
                   "(16x smaller than bf16 at m=48) with exact re-rank "
                   "from host-resident rows; ivf is the approximate "
                   "k-means-cell index (n_probe cells scanned per query); "
                   "ivfpq holds PQ codes inside IVF cells — m bytes/doc "
                   "AND only probed cells decode per query")
    q.add_argument("--queries", nargs="+", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--encoder_preset", default="minilm-l6")
    q.add_argument("--vocab_path", default=None)
    q.add_argument("--model_path", default=None)
    q.add_argument("--seed", type=int, default=14)
    q.add_argument("--use_fused_layer", action=argparse.BooleanOptionalAction,
                   default=False, help="encode through the fused per-layer "
                   "Pallas kernel (TPU inference path)")
    return p


def _encoder(args):
    import jax

    from qst_tpu.core.meshes import enable_compilation_cache
    from qst_tpu.models.sentence_encoder import SentenceEncoder, init_params

    enable_compilation_cache()
    cfg = encoder_from_args(args.encoder_preset,
                            use_fused_layer=args.use_fused_layer)
    tok = tokenizer_from_args(args.vocab_path, cfg.vocab_size)
    if args.model_path:
        params = load_best_params(args.model_path)
    else:
        params = init_params(cfg, jax.random.key(args.seed))
    return SentenceEncoder(cfg, params, tok)


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)

    from qst_tpu.retrieval import Retriever

    if args.command == "build":
        if bool(args.texts) == bool(args.dataset_root):
            raise SystemExit("give exactly one of --texts / --dataset_root")
        if args.texts:
            with open(args.texts) as f:
                docs = [line.rstrip("\n") for line in f if line.strip()]
        else:
            from qst_tpu.data.chunks import ChunkStore

            docs = ChunkStore(args.dataset_root).all_positive_captions()
        if not docs:
            raise SystemExit("no documents to index")
        retriever = Retriever(_encoder(args),
                              index_dtype=args.index_dtype,
                              pq_m=args.pq_m,
                              ivf_clusters=args.ivf_clusters,
                              ivf_probe=args.ivf_probe,
                              ivfpq_bits=args.ivfpq_bits)
        if args.index_dtype == "streaming":
            # incremental build-to-disk: the embedding matrix never exists
            # in RAM/HBM whole — index corpora beyond both, then serve with
            # the same --index_dtype streaming
            retriever.build_to_disk(docs, args.index_dir)
        else:
            retriever.build(docs)
            retriever.save(args.index_dir)
        dump_args(args, args.index_dir)
        logger.info("indexed %d docs into %s", len(docs), args.index_dir)
        return 0

    if args.command == "serve":
        from qst_tpu.serve import RetrievalServer

        retriever = Retriever(
            _encoder(args),
            index_dtype=args.index_dtype).load(args.index_dir)
        if args.updatable:
            retriever.to_updatable(capacity=args.capacity)
            logger.info("updatable serving: capacity %d (POST/DELETE /docs "
                        "enabled)", retriever.index.capacity)
        server = RetrievalServer(
            retriever, host=args.host, port=args.port,
            max_batch=args.max_batch, max_wait_s=args.max_wait_ms / 1e3,
            workers=args.workers)
        port = server.start()
        logger.info("serving %d docs on http://%s:%d (POST /search, "
                    "POST /encode, GET /healthz)",
                    retriever.index.n_docs, args.host, port)
        try:
            import threading

            threading.Event().wait()  # run until interrupted
        except KeyboardInterrupt:
            logger.info("shutting down")
        finally:
            server.stop()
        return 0

    retriever = Retriever(_encoder(args),
                          index_dtype=args.index_dtype).load(args.index_dir)
    hits = retriever.search(list(args.queries), k=args.k, return_texts=True)
    for query, row in zip(args.queries, hits):
        print(json.dumps({
            "query": query,
            "hits": [{"id": h[0], "score": round(h[1], 4), "text": h[2]}
                     for h in row],
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
