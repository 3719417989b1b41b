"""The full user journey through the three CLIs, timed on real hardware.

Mirrors the reference's documented workflow (README.md:96-98 / the three
entry points): `dataset/main.py` → `training/main.py` →
`ir_evauation_script.py`, here as

1. ``python -m qst_tpu.cli.dataset_main``  — mine quadruplets from a
   COCO-style captions annotation file (device-side positive mining +
   adaptive-crop part-pos synthesis);
2. ``python -m qst_tpu.cli.train_main``    — quadruplet fine-tune with
   evaluation/checkpointing (MiniLM-L6 architecture);
3. ``python -m qst_tpu.cli.ir_eval_main``  — baseline-vs-trained IR A/B.

Each stage runs as a separate OS process exactly as a user would run it.
Prints per-stage wall time and the final A/B scores as JSON.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/cli_journey.py
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ablation_quadruplet_vs_triplet import make_coco_annotations  # noqa: E402

import numpy as np  # noqa: E402


def run_stage(name: str, args: list) -> float:
    t0 = time.perf_counter()
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run([sys.executable, "-m"] + args, env=env,
                          capture_output=True, text=True)
    dt = time.perf_counter() - t0
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:] + proc.stderr[-4000:])
        raise RuntimeError(f"stage {name} failed (rc={proc.returncode})")
    print(f"[{name}] {dt:.0f}s", flush=True)
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_images", type=int, default=1000)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--n_queries", type=int, default=100)
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="journey_")
    ann = os.path.join(work, "captions.json")
    make_coco_annotations(ann, args.n_images, np.random.default_rng(14))
    chunks_root = os.path.join(work, "chunks")
    exp = os.path.join(work, "exp")
    out_root = os.path.join(work, "ir_eval")

    times = {}
    times["dataset"] = run_stage("dataset_main", [
        "qst_tpu.cli.dataset_main",
        "--dataset_type", "coco",
        "--ann_file", ann,
        "--output_root", chunks_root,
        "--dataset_name", "journey",
        "--n_pos_examples", "4",
        "--n_part_pos_examples", "4",
        "--no-augment",
        "--no-verbose_check",
    ])
    dataset_root = os.path.join(chunks_root, "journey")

    times["train"] = run_stage("train_main", [
        "qst_tpu.cli.train_main",
        "--dataset_root", dataset_root,
        "--experiment_dir", exp,
        "--encoder_preset", "minilm-l6",
        "--max_seq_length", "32",
        "--batch_size", "32",
        "--epochs", str(args.epochs),
        "--learning_rate", "5e-5",
        "--scheduler", "warmuplinear",
        "--warmup_steps", "10",
        "--evaluation_steps", "50",
        "--checkpoint_save_steps", "50",
        "--manual_notes", "cli user journey",
    ])

    times["ir_eval"] = run_stage("ir_eval_main", [
        "qst_tpu.cli.ir_eval_main",
        "--dataset_root", dataset_root,
        "--model_path", exp,
        "--output_root", out_root,
        "--encoder_preset", "minilm-l6",
        "--n_queries", str(args.n_queries),
        "--accuracy_at_k", "1", "5", "10",
        "--precision_recall_at_k", "1", "5", "10",
        "--mrr_at_k", "10",
        "--ndcg_at_k", "10",
        "--map_at_k", "100",
        "--score_functions", "cos_sim",
    ])

    (exp_dir,) = [os.path.join(out_root, d) for d in os.listdir(out_root)]
    with open(os.path.join(exp_dir, "results.json")) as f:
        results = json.load(f)
    summary = {
        "metric": "cli_user_journey",
        "stage_seconds": {k: round(v, 1) for k, v in times.items()},
        "baseline_ndcg@10":
            results["baseline"]["metrics"]["cos_sim"]["ndcg@10"],
        "trained_ndcg@10":
            results["trained"]["metrics"]["cos_sim"]["ndcg@10"],
        "baseline_recall@10":
            results["baseline"]["metrics"]["cos_sim"]["recall@10"],
        "trained_recall@10":
            results["trained"]["metrics"]["cos_sim"]["recall@10"],
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
