"""Quadruplet-vs-triplet ablation — the reference's core scientific claim.

The reference's thesis (its γ-quadruplet loss, models/losses/losses.py:9-69)
is that adding a *partially-positive* term models graded relevance better
than a plain triplet loss. This experiment tests exactly that, end to end,
through the framework's own pipeline:

1. synthesize a COCO-style captions annotation file (topical caption groups
   per image, graded structure);
2. build the quadruplet dataset through the REAL construction path
   (``create_coco_dataset``: positive mining at cos ≥ 0.6 with retries +
   adaptive-crop partially-positive synthesis) using the deterministic
   hash embedder (the mock-embedder pattern, SURVEY.md §4);
3. train TWO models from the SAME random init on the SAME data stream:
   (a) γ-quadruplet loss (γ=0.6, reference defaults) and (b) plain triplet
   loss (the ``kind="triplet"`` ablation baseline — ignores part-positives);
4. evaluate both (plus the untrained baseline) on held-out instances:
   IR metrics under three relevance definitions (pos+part / pos-only /
   part-only) and the quadruplet ORDERING accuracies (pos-vs-part,
   pos-vs-neg, part-vs-neg + the reference's global formula,
   evaluators.py:367) — the graded-relevance measurement.

Prints progress lines and one final JSON summary; a markdown table for
RESULTS.md is printed at the end.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python \
    benchmarks/ablation_quadruplet_vs_triplet.py [--steps 500]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOPICS = ("cat dog horse bird fish car truck train plane boat house tower "
          "bridge river mountain forest beach desert island valley pizza "
          "pasta salad bread cheese doctor teacher farmer artist pilot "
          "guitar piano violin drum flute tiger lion bear wolf deer").split()
VERBS = ("runs jumps sleeps flies swims drives climbs falls sings dances "
         "reads writes builds paints cooks waits stands rests turns").split()
PLACES = ("park street field sky ocean kitchen garden station harbor "
          "meadow market library studio farm court plaza valley dock").split()
FILLER = ("quietly slowly quickly happily often rarely gently boldly "
          "calmly eagerly brightly early late softly loudly").split()


def hash_embed(texts, dim=128):
    """Deterministic topic-correlated unit vectors (same-topic cos ≈ 0.95,
    cross-topic ≈ 0) — the dataset-construction embedder stand-in."""
    out = np.zeros((len(texts), dim), np.float32)
    for i, t in enumerate(texts):
        words = t.lower().split()
        topic = next((w for w in words if w in TOPICS), "")
        bs = int.from_bytes(hashlib.md5(topic.encode()).digest()[:4], "little")
        ts = int.from_bytes(hashlib.md5(t.encode()).digest()[:4], "little")
        base = np.random.default_rng(bs).standard_normal(dim)
        noise = np.random.default_rng(ts).standard_normal(dim)
        v = base + 0.15 * noise if topic else noise
        out[i] = v / np.linalg.norm(v)
    return out


def make_coco_annotations(path: str, n_images: int, rng) -> None:
    """COCO captions JSON: 5 topical captions per image."""
    images, annotations = [], []
    aid = 0
    for img_id in range(n_images):
        topic = TOPICS[img_id % len(TOPICS)]
        verb = VERBS[(img_id * 3) % len(VERBS)]
        place = PLACES[(img_id * 7) % len(PLACES)]
        variant = img_id // len(TOPICS)
        f = lambda: FILLER[int(rng.integers(0, len(FILLER)))]
        captions = [
            f"a {topic} {verb} {f()} in the {place} area {variant}",
            f"the {topic} {verb} {f()} at the {place} spot {variant}",
            f"one {topic} {f()} {verb} near the {place} side {variant}",
            f"a {topic} that {verb} {f()} by the {place} zone {variant}",
            f"some {topic} {verb} {f()} around the {place} corner {variant}",
        ]
        images.append({"id": img_id})
        for c in captions:
            annotations.append({"id": aid, "image_id": img_id, "caption": c})
            aid += 1
    with open(path, "w") as fobj:
        json.dump({"images": images, "annotations": annotations}, fobj)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500,
                    help="train steps per arm (>= 500 per the round-2 bar)")
    ap.add_argument("--n_images", type=int, default=4000)
    ap.add_argument("--n_eval", type=int, default=600)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--use_fused_layer", action="store_true",
                    help="train both arms through the fused Pallas layer "
                    "kernels + custom-VJP backward (in-kernel dropout)")
    ap.add_argument("--wordpiece", action="store_true",
                    help="tokenize with a real WordPiece vocab built from "
                    "the constructed dataset (greedy longest-match, "
                    "subword fallback) instead of the hash tokenizer — "
                    "the VERDICT r3 item-2 configuration")
    ap.add_argument("--gammas", type=str, default="",
                    help="comma list of gamma values: sweep mode (VERDICT "
                    "r4 item 5) — trains the triplet baseline once plus one "
                    "gamma arm per (gamma, margin-set) cell and prints a "
                    "sweep table characterizing the part-only R@10 vs "
                    "graded-ordering trade-off")
    ap.add_argument("--margin_sets", type=str, default="1.0:0.5:0.5",
                    help="comma list of pos_neg:pos_part:part_neg margin "
                    "triples for the sweep (reference default 1.0:0.5:0.5, "
                    "models/losses/losses.py:9-19)")
    ap.add_argument("--preset", default="minilm_l6",
                    choices=["minilm_l6", "tiny"],
                    help="encoder preset (tiny = CPU smoke testing)")
    args = ap.parse_args()

    import jax

    from qst_tpu.core.config import (
        EncoderConfig, IREvalConfig, LossConfig, TrainConfig)
    from qst_tpu.core.meshes import enable_compilation_cache
    from qst_tpu.augment.partial_positive import ADAPTIVE_CROP
    from qst_tpu.data import (
        EmbeddingTable, NegativeMiner, QuadrupletCollator, QuadrupletDataset,
        HARD_CONTRASTIVE_TRAIN)
    from qst_tpu.data.coco import CocoCaptionsSource, create_coco_dataset
    from qst_tpu.evals import (
        InformationRetrievalEvaluator, create_ir_evaluation_set)
    from qst_tpu.evals.quadruplet_evaluator import QuadrupletEvaluator
    from qst_tpu.models import HashTokenizer, SentenceEncoder, init_params
    from qst_tpu.train import Trainer

    enable_compilation_cache()
    rng = np.random.default_rng(14)
    work = tempfile.mkdtemp(prefix="ablation_")

    # --- 1+2: dataset through the real construction pipeline -------------
    ann = os.path.join(work, "captions.json")
    make_coco_annotations(ann, args.n_images, rng)
    src = CocoCaptionsSource(ann, dataset_name="synthetic-coco")
    t0 = time.perf_counter()
    last_ok = create_coco_dataset(
        os.path.join(work, "chunks"), src, encode_fn=hash_embed,
        n_pos_examples=4, n_part_pos_examples=4, augment=False,
        part_pos_algorithm=ADAPTIVE_CROP, seed=14)
    assert last_ok >= 0, "dataset construction failed (see log above)"
    root = os.path.join(work, "chunks", src.dataset_name)
    ds_probe = QuadrupletDataset(root, seed=14)
    instances = list(ds_probe.store.iter_instances())
    print(f"dataset: {len(instances)} mined instances in "
          f"{time.perf_counter() - t0:.0f}s "
          f"(pos/inst={np.mean([len(i['positive']) for i in instances]):.1f},"
          f" part/inst="
          f"{np.mean([len(i['part_positive']) for i in instances]):.1f})",
          flush=True)

    # held-out eval slice vs training slice
    eval_instances = instances[:args.n_eval]

    overrides = {"max_seq_length": 32}
    if args.use_fused_layer:
        overrides["use_fused_layer"] = True
    if args.wordpiece:
        # real WordPiece over the dataset's own text: whole words by
        # frequency + single-char and ##-continuation pieces so crops and
        # substitutions never hit [UNK] — the reference tokenizes with
        # the checkpoint's WordPiece vocab; with zero egress we train the
        # vocab from the corpus instead (same greedy longest-match code
        # path as checkpoint vocabs, models/tokenizer.py)
        from collections import Counter

        from qst_tpu.models.tokenizer import WordPieceTokenizer, basic_tokenize

        all_texts = [c for inst in instances
                     for c in ([inst["reference"]] + inst["positive"]
                               + inst["part_positive"])]
        counts = Counter(w for t in all_texts for w in basic_tokenize(t))
        chars = sorted({c for w in counts for c in w})
        vocab: dict = {}
        for tkn in (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                    + chars + ["##" + c for c in chars]
                    + [w for w, _ in counts.most_common()]):
            vocab.setdefault(tkn, len(vocab))
        overrides["vocab_size"] = -(-len(vocab) // 128) * 128
        tok = WordPieceTokenizer(vocab)
        print(f"wordpiece vocab: {len(vocab)} tokens "
              f"(embedding table {overrides['vocab_size']})", flush=True)
    cfg = getattr(EncoderConfig, args.preset)(**overrides)
    if not args.wordpiece:
        tok = HashTokenizer(vocab_size=cfg.vocab_size)
    init = init_params(cfg, jax.random.key(14))

    # --- 4: evaluators ----------------------------------------------------
    ir_cfg = IREvalConfig(
        accuracy_at_k=(1, 5, 10), precision_recall_at_k=(1, 5, 10),
        mrr_at_k=(10,), ndcg_at_k=(10,), map_at_k=(100,),
        score_functions=("cos_sim",))
    sets = {
        "pos+part": create_ir_evaluation_set(
            eval_instances, n_queries=200, seed=14),
        "pos_only": create_ir_evaluation_set(
            eval_instances, n_queries=200, seed=14,
            use_part_pos_examples=False),
        "part_only": create_ir_evaluation_set(
            eval_instances, n_queries=200, seed=14,
            use_pos_examples=False),
    }
    ir_evals = {
        name: InformationRetrievalEvaluator(
            s.queries, s.corpus, s.relevant, cfg=ir_cfg)
        for name, s in sets.items()
    }
    # ordering accuracies need a negative per instance: a caption from a
    # DIFFERENT-topic instance, matching the mined-negative distribution
    # training sees (cos ≤ 0.2 → cross-topic). Image topics cycle
    # TOPICS[img_id % len(TOPICS)], so the j+1 neighbor is always a
    # different topic — the previous offset of len(TOPICS) landed on the
    # SAME topic and silently turned this metric into same-topic
    # instance discrimination, a distribution training never labels
    def cross_topic_neg(j: int) -> int:
        # the j+1 neighbor is a different topic EXCEPT at the wrap: when
        # n_eval ≡ 1 (mod len(TOPICS)) the last instance wraps onto index
        # 0, which shares its topic — skip forward until topics differ
        n_ev = len(eval_instances)
        o = 1
        while (j + o) % n_ev % len(TOPICS) == j % len(TOPICS):
            o += 1
        return (j + o) % n_ev

    quad_eval = QuadrupletEvaluator(
        anchors=[i["reference"] for i in eval_instances],
        positives=[i["positive"][0] for i in eval_instances],
        part_positives=[i["part_positive"][0] for i in eval_instances],
        negatives=[eval_instances[cross_topic_neg(j)]["positive"][1]
                   for j in range(len(eval_instances))],
    )

    def evaluate(params, label):
        enc = SentenceEncoder(cfg, params, tok)
        encode = lambda texts: enc.encode(list(texts))
        out = {}
        for name, ev in ir_evals.items():
            ev(encode)
            m = ev.last_results["cos_sim"]
            out[name] = {k: round(float(m[k]), 4)
                         for k in ("recall@10", "ndcg@10", "map@100")}
        quad_eval(encode)
        out["ordering"] = {k: round(float(v), 4)
                           for k, v in quad_eval.last_scores.items()}
        print(f"[{label}] {json.dumps(out)}", flush=True)
        return out

    results = {"baseline": evaluate(init, "baseline (random init)")}

    # --- 3: train the two arms from the SAME init ------------------------
    def train_arm(loss_cfg, label):
        ds = QuadrupletDataset(root, n_pos=1, n_part_pos=1, n_neg=1, seed=14)
        # Mine negatives with the SAME semantically-meaningful embedder
        # the construction stage used (hash_embed = the pretrained-SBERT
        # stand-in; the reference shares one SBERT singleton between
        # positive mining and negative mining). Mining with a frozen
        # RANDOM-INIT encoder instead was measured to be actively harmful
        # at long horizons: random-encoder cosine tracks lexical overlap,
        # so its "hard negatives" are near-lexical-duplicates of the
        # anchor, and part-positives (crops = lexical subsets) generalize
        # into the negative region — acc(part,neg) fell BELOW chance
        # (0.10 quadruplet / 0.49 triplet at 2000 steps) until the miner
        # was given the topical embedder. See RESULTS.md.
        mine_embed = lambda texts: hash_embed(list(texts))
        pool = ds.store.all_positive_captions()
        table = EmbeddingTable(pool, mine_embed, refresh_steps=10**9,
                               max_pool=20000)
        ds.miner = NegativeMiner(table, mine_embed,
                                 mode=HARD_CONTRASTIVE_TRAIN, seed=14)
        epochs = max(1, -(-args.steps * args.batch // len(ds)))
        spe = -(-args.steps // epochs)
        tcfg = TrainConfig(
            batch_size=args.batch, epochs=epochs, learning_rate=args.lr,
            scheduler="warmuplinear", warmup_steps=50, evaluation_steps=0,
            checkpoint_save_steps=0, use_amp=True, seed=14,
            experiment_dir=os.path.join(work, f"exp_{label}"))
        collator = QuadrupletCollator(tok, max_length=cfg.max_seq_length)
        trainer = Trainer(cfg, loss_cfg, tcfg, ds, collator, evaluator=None,
                          steps_per_epoch=spe)
        t0 = time.perf_counter()
        result = trainer.train(rng=jax.random.key(14))
        print(f"[{label}] trained {trainer.total_steps} steps in "
              f"{time.perf_counter() - t0:.0f}s "
              f"({result.steps_per_sec:.1f} steps/s)", flush=True)
        return result.state.params, trainer.total_steps

    if args.gammas:
        # --- sweep mode (VERDICT r4 item 5): gamma x margin-set grid ------
        gammas = [float(g) for g in args.gammas.split(",")]
        msets = [tuple(float(x) for x in m.split(":"))
                 for m in args.margin_sets.split(",")]
        triplet_params, triplet_steps = train_arm(
            LossConfig(kind="triplet"), "triplet")
        results["triplet"] = evaluate(triplet_params, "triplet")
        for g in gammas:
            for (m_pn, m_pp, m_pn2) in msets:
                label = f"gamma={g} margins={m_pn}/{m_pp}/{m_pn2}"
                params, steps = train_arm(
                    LossConfig(kind="gamma", gamma=g, margin_pos_neg=m_pn,
                               margin_pos_part=m_pp, margin_part_neg=m_pn2),
                    label)
                results[label] = evaluate(params, label)
        print(json.dumps({
            "metric": "ablation_gamma_margin_sweep",
            "steps_per_arm": triplet_steps,
            "results": results,
        }))
        # sweep table: does graded ordering trade off against part-pos
        # rank-band retention, and where?
        rows = ["| cell | R@10 (part) | acc(part,neg) | NDCG@10 (pos+part) "
                "| R@10 (pos+part) | acc(pos,part) | global |",
                "|---|---|---|---|---|---|---|"]
        for label, r in results.items():
            o = r["ordering"]
            rows.append(
                f"| {label} | {r['part_only']['recall@10']} | "
                f"{o.get('acc_part_neg')} | {r['pos+part']['ndcg@10']} | "
                f"{r['pos+part']['recall@10']} | {o.get('acc_pos_part')} | "
                f"{o.get('global_accuracy')} |")
        print("\n".join(rows))
        return

    gamma_params, gamma_steps = train_arm(
        LossConfig(kind="gamma", margin_pos_part=0.5, margin_part_neg=0.5),
        "gamma-quadruplet")
    results["quadruplet"] = evaluate(gamma_params, "gamma-quadruplet")
    triplet_params, triplet_steps = train_arm(
        LossConfig(kind="triplet"), "triplet")
    results["triplet"] = evaluate(triplet_params, "triplet")

    print(json.dumps({
        "metric": "ablation_quadruplet_vs_triplet",
        "steps_per_arm": {"quadruplet": gamma_steps, "triplet": triplet_steps},
        "results": results,
    }))

    # markdown table for RESULTS.md
    rows = ["| model | R@10 (pos+part) | NDCG@10 (pos+part) | "
            "R@10 (pos) | R@10 (part) | acc(pos,part) | acc(part,neg) | "
            "acc(pos,neg) | global |",
            "|---|---|---|---|---|---|---|---|---|"]
    for label in ("baseline", "quadruplet", "triplet"):
        r = results[label]
        o = r["ordering"]
        rows.append(
            f"| {label} | {r['pos+part']['recall@10']} | "
            f"{r['pos+part']['ndcg@10']} | {r['pos_only']['recall@10']} | "
            f"{r['part_only']['recall@10']} | {o.get('acc_pos_part')} | "
            f"{o.get('acc_part_neg')} | {o.get('acc_pos_neg')} | "
            f"{o.get('global_accuracy')} |")
    print("\n".join(rows))


if __name__ == "__main__":
    main()
