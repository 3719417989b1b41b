"""End-to-end framework experiment on real hardware.

Exercises the full pipeline at realistic scale (the BASELINE.json
"quadruplet-loss fine-tune" config shape): synthesize a 2,000-instance
topical caption corpus → chunked dataset on disk → MiniLM-L6-size encoder
trained with the γ-quadruplet loss and device-side hard-negative mining →
IR A/B (random-init baseline vs trained) over Recall@10 / NDCG@10 / MAP.

Prints a JSON summary line; run with the repo root on PYTHONPATH.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TOPICS = 200
PER_TOPIC = 10
EPOCHS = 1
BATCH = 32
LR = 5e-5  # from-scratch contrastive training collapses at higher rates

NOUNS = ("cat dog horse bird fish car truck train plane boat house tower "
         "bridge river mountain forest beach desert island valley pizza "
         "pasta salad bread cheese doctor teacher farmer artist pilot").split()
VERBS = ("runs jumps sleeps flies swims drives climbs falls sings dances "
         "reads writes builds paints cooks").split()
PLACES = ("park street field sky ocean kitchen garden station harbor "
          "meadow market library studio farm court").split()
FILLER = ("quietly slowly quickly happily often rarely gently boldly "
          "calmly eagerly").split()


def make_corpus(rng):
    instances = []
    iid = 0
    for t in range(N_TOPICS):
        noun = NOUNS[t % len(NOUNS)]
        verb = VERBS[(t // len(NOUNS)) % len(VERBS)]
        place = PLACES[(t * 7) % len(PLACES)]
        for _ in range(PER_TOPIC):
            f = lambda: FILLER[int(rng.integers(0, len(FILLER)))]
            ref = f"a {noun} {verb} {f()} in the {place}"
            positives = [
                f"the {noun} {verb} {f()} at the {place}",
                f"a {noun} {f()} {verb} near the {place}",
                f"one {noun} {verb} in a {place} {f()}",
            ]
            part = [f"a {noun} in the {place}", f"the {noun} {verb}"]
            instances.append({
                "id": iid, "reference": ref, "positive": positives,
                "part_positive": part,
            })
            iid += 1
    return instances


def main() -> None:
    import jax

    from qst_tpu.core.config import (
        EncoderConfig, IREvalConfig, LossConfig, TrainConfig)
    from qst_tpu.core.meshes import enable_compilation_cache
    from qst_tpu.data import (
        EmbeddingTable, NegativeMiner, QuadrupletCollator, QuadrupletDataset,
        HARD_CONTRASTIVE_TRAIN, write_chunk, write_meta)
    from qst_tpu.evals import (
        InformationRetrievalEvaluator, create_ir_evaluation_set)
    from qst_tpu.models import HashTokenizer, SentenceEncoder, init_params
    from qst_tpu.train import Trainer

    enable_compilation_cache()
    rng = np.random.default_rng(14)
    root = os.path.join(tempfile.mkdtemp(), "chunks")
    instances = make_corpus(rng)
    for c in range(0, len(instances), 500):
        write_chunk(root, c // 500, instances[c:c + 500], "synthetic-2k")
    write_meta(root, -(-len(instances) // 500))
    print(f"dataset: {len(instances)} instances", flush=True)

    cfg = EncoderConfig.minilm_l6(max_seq_length=32)
    loss_cfg = LossConfig(margin_pos_part=0.5, margin_part_neg=0.5)
    tok = HashTokenizer(vocab_size=cfg.vocab_size)

    init = init_params(cfg, jax.random.key(14))
    mining_enc = SentenceEncoder(cfg, init, tok)
    encode_init = lambda texts: mining_enc.encode(list(texts))

    ds = QuadrupletDataset(root, n_pos=2, n_part_pos=2, n_neg=1, seed=14)
    pool = ds.store.all_positive_captions()
    # refresh the mining table frequently so negative difficulty tracks the
    # drifting encoder (stale tables → trivially-easy negatives → collapse)
    table = EmbeddingTable(pool, encode_init, refresh_steps=20, max_pool=20000)
    miner = NegativeMiner(table, encode_init, mode=HARD_CONTRASTIVE_TRAIN,
                          seed=14)
    ds.miner = miner

    # IR eval set over a held-out slice
    ir_set = create_ir_evaluation_set(instances[:400], n_queries=100, seed=14)
    ir_set_pos = create_ir_evaluation_set(
        instances[:400], n_queries=100, seed=14,
        use_part_pos_examples=False)
    ir_cfg = IREvalConfig(
        accuracy_at_k=(1, 5, 10), precision_recall_at_k=(1, 5, 10),
        mrr_at_k=(10,), ndcg_at_k=(10,), map_at_k=(100,),
        score_functions=("cos_sim",))
    ir_eval = InformationRetrievalEvaluator(
        ir_set.queries, ir_set.corpus, ir_set.relevant, cfg=ir_cfg)
    ir_eval_pos = InformationRetrievalEvaluator(
        ir_set_pos.queries, ir_set_pos.corpus, ir_set_pos.relevant,
        cfg=ir_cfg)

    def encode_with(params):
        enc = SentenceEncoder(cfg, params, tok)
        return lambda texts: enc.encode(list(texts))

    baseline = ir_eval(encode_with(init))
    base_metrics = dict(ir_eval.last_results["cos_sim"])
    ir_eval_pos(encode_with(init))
    base_pos = dict(ir_eval_pos.last_results["cos_sim"])
    print(f"baseline: map@100={baseline:.4f} "
          f"recall@10={base_metrics['recall@10']:.4f} "
          f"ndcg@10={base_metrics['ndcg@10']:.4f}", flush=True)

    tcfg = TrainConfig(
        batch_size=BATCH, epochs=EPOCHS, learning_rate=LR,
        scheduler="warmuplinear", warmup_steps=30, evaluation_steps=0,
        checkpoint_save_steps=0, use_amp=True,
        experiment_dir=os.path.join(tempfile.mkdtemp(), "exp"))
    collator = QuadrupletCollator(tok, max_length=cfg.max_seq_length)
    trainer = Trainer(cfg, loss_cfg, tcfg, ds, collator, evaluator=None)
    t0 = time.perf_counter()
    result = trainer.train()
    train_s = time.perf_counter() - t0
    print(f"trained {trainer.total_steps} steps in {train_s:.0f}s "
          f"({result.steps_per_sec:.2f} steps/s)", flush=True)

    trained = ir_eval(encode_with(result.state.params))
    tr_metrics = dict(ir_eval.last_results["cos_sim"])
    ir_eval_pos(encode_with(result.state.params))
    tr_pos = dict(ir_eval_pos.last_results["cos_sim"])
    print(f"trained:  map@100={trained:.4f} "
          f"recall@10={tr_metrics['recall@10']:.4f} "
          f"ndcg@10={tr_metrics['ndcg@10']:.4f}", flush=True)

    print(json.dumps({
        "metric": "e2e_ir_improvement",
        "baseline": {"map@100": round(baseline, 4),
                     "recall@10": round(base_metrics["recall@10"], 4),
                     "ndcg@10": round(base_metrics["ndcg@10"], 4)},
        "trained": {"map@100": round(trained, 4),
                    "recall@10": round(tr_metrics["recall@10"], 4),
                    "ndcg@10": round(tr_metrics["ndcg@10"], 4)},
        "baseline_pos_only": {"recall@10": round(base_pos["recall@10"], 4),
                              "ndcg@10": round(base_pos["ndcg@10"], 4)},
        "trained_pos_only": {"recall@10": round(tr_pos["recall@10"], 4),
                             "ndcg@10": round(tr_pos["ndcg@10"], 4)},
        "steps": trainer.total_steps,
        "steps_per_sec": round(result.steps_per_sec, 2),
    }))


if __name__ == "__main__":
    main()
