"""IR-evaluation wall-clock: device-resident vs host-relay embedding handoff.

VERDICT r2 #7: `evals/ir_evaluator.py` used to round-trip corpus embeddings
through host numpy (`np.asarray(encode_fn(...))`) before building the index
— at the reference-default 50k-doc corpus the ~40 MB/s dev-relay transfer
dominated evaluation wall-clock. The evaluator now hands device arrays
straight to the index; this bench A/Bs both paths in ONE process on the
same 50k corpus and reports the cached-index variant too.

Usage: PYTHONPATH=/root/repo python benchmarks/ir_eval_bench.py
"""

import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qst_tpu.core.config import EncoderConfig, IREvalConfig
from qst_tpu.evals.ir_evaluator import InformationRetrievalEvaluator
from qst_tpu.models.sentence_encoder import SentenceEncoder, init_params
from qst_tpu.models.tokenizer import HashTokenizer

WORDS = ("cat dog car road mat park plane sky beach sand red small "
         "young pasta sauce cloud scene variant river tree house boat "
         "light dark fast slow").split()


def main():
    rng = np.random.default_rng(0)
    cfg = EncoderConfig.minilm_l6()
    enc = SentenceEncoder(cfg, init_params(cfg, jax.random.key(0)),
                          HashTokenizer(vocab_size=cfg.vocab_size))

    n_corpus, n_queries = 50_000, 256
    corpus = {f"c{i}": " ".join(rng.choice(WORDS, 8)) + f" {i}"
              for i in range(n_corpus)}
    queries = {f"q{i}": corpus[f"c{i}"] for i in range(n_queries)}
    relevant = {f"q{i}": {f"c{i}"} for i in range(n_queries)}
    ir_cfg = IREvalConfig(accuracy_at_k=(1, 10), precision_recall_at_k=(10,),
                          mrr_at_k=(10,), ndcg_at_k=(10,), map_at_k=(100,),
                          score_functions=("cos_sim",))

    def host_fn(texts):
        # the round-2 path: force the embeddings through host numpy
        return np.asarray(enc.encode(list(texts)))

    dev_fn = enc.encode   # explicit convert_to_numpy param → device arrays

    results = {}
    for label, fn, kw in (
            ("device-resident", dev_fn, {}),
            ("host-relay (old path)", host_fn, {}),
            ("device + cached index", dev_fn, {"cache_corpus_index": True}),
    ):
        ev = InformationRetrievalEvaluator(queries, corpus, relevant,
                                           cfg=ir_cfg, **kw)
        score = ev(fn)  # warm: compiles + (for cached) builds the index
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            score = ev(fn)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        results[label] = best
        print(f"{label:24s}: best {best:6.2f}s/eval "
              f"(map@100 {score:.4f})", flush=True)
    base = results["host-relay (old path)"]
    for label, t in results.items():
        if label != "host-relay (old path)":
            print(f"speedup vs host-relay: {label}: {base / t:.2f}x")
    print("done")


if __name__ == "__main__":
    main()
