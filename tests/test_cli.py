"""CLI end-to-end tests: dataset build → train → IR A/B eval, tiny configs."""

import json
import os

import numpy as np
import pytest

from qst_tpu.cli import dataset_main, ir_eval_main, train_main

from helpers import write_synthetic_dataset


def _write_coco_ann(path, n_images=8):
    groups = [
        ["a cat sits on the mat", "the cat rests on a mat",
         "a small cat lying on the rug", "a young cat on the carpet",
         "a cat on a mat indoors"],
        ["a dog runs in the park", "the dog sprints across the grass",
         "a young dog playing in the field", "a dog chasing a ball outside",
         "a dog running outdoors"],
    ]
    anns, images, aid = [], [], 0
    for i in range(n_images):
        images.append({"id": i})
        for cap in groups[i % 2]:
            anns.append({"id": aid, "image_id": i, "caption": cap})
            aid += 1
    with open(path, "w") as f:
        json.dump({"images": images, "annotations": anns}, f)


def test_dataset_cli_coco(tmp_path):
    ann = str(tmp_path / "ann.json")
    _write_coco_ann(ann)
    rc = dataset_main.main([
        "--dataset_type", "coco",
        "--ann_file", ann,
        "--output_root", str(tmp_path / "out"),
        "--dataset_name", "mini",
        "--chunk_dim", "4",
        "--n_pos_examples", "2",
        "--n_part_pos_examples", "2",
        "--encoder_preset", "tiny",
        "--part_pos_algorithm", "adaptive_crop",
    ])
    assert rc == 0
    root = tmp_path / "out" / "mini"
    assert (root / "chunk_0.json").is_file()
    assert (root / "chunk_1.json").is_file()
    assert (root / "chunk_n.json").is_file()
    assert (tmp_path / "out" / "command_line_args.json").is_file()


def test_dataset_cli_sentence_compression(tmp_path):
    records = [
        {"sentence": "the quick brown fox jumps over the lazy dog today",
         "compression": "the fox jumps over the dog",
         "compression_ratio": 0.7},
        {"sentence": "a man rides a bright red bicycle through the busy town",
         "compression": "man rides bicycle",
         "compression_ratio": 0.3},
    ] * 3
    rec_file = str(tmp_path / "records.json")
    with open(rec_file, "w") as f:
        json.dump(records, f)
    rc = dataset_main.main([
        "--dataset_type", "sentence_compression",
        "--records_file", rec_file,
        "--output_root", str(tmp_path / "out"),
        "--chunk_dim", "4",
        "--n_pos_examples", "2",
        "--n_part_pos_examples", "2",
        "--no-verbose_check",
    ])
    assert rc == 0
    assert (tmp_path / "out" / "sent_compr" / "chunk_0.json").is_file()


def test_dataset_cli_requires_input(tmp_path):
    with pytest.raises(SystemExit):
        dataset_main.main(["--dataset_type", "coco",
                           "--output_root", str(tmp_path)])


def test_train_and_ir_eval_cli(tmp_path):
    root = str(tmp_path / "chunks")
    write_synthetic_dataset(root, n_chunks=3, chunk_dim=8)
    exp = str(tmp_path / "exp")

    rc = train_main.main([
        "--dataset_root", root,
        "--experiment_dir", exp,
        "--encoder_preset", "tiny",
        "--batch_size", "8",
        "--epochs", "1",
        "--learning_rate", "1e-3",
        "--scheduler", "warmuplinear",
        "--warmup_steps", "2",
        "--evaluation_steps", "2",
        "--checkpoint_save_steps", "2",
        "--early_stopping_patience", "5",
        "--val_fraction", "0.3",
        "--mesh_data", "1",
        "--manual_notes", "cli smoke test",
    ])
    assert rc == 0
    assert os.path.isfile(os.path.join(exp, "command_line_args.json"))
    with open(os.path.join(exp, "command_line_args.json")) as f:
        assert json.load(f)["manual_notes"] == "cli smoke test"
    assert os.path.isdir(os.path.join(exp, "checkpoints", "best"))

    rc = ir_eval_main.main([
        "--dataset_root", root,
        "--model_path", exp,
        "--output_root", str(tmp_path / "ir"),
        "--encoder_preset", "tiny",
        "--n_queries", "6",
        "--accuracy_at_k", "1", "3",
        "--precision_recall_at_k", "1", "3",
        "--mrr_at_k", "5",
        "--ndcg_at_k", "5",
        "--map_at_k", "5",
        "--score_functions", "cos_sim",
        "--mesh_data", "1",
    ])
    assert rc == 0
    out_dirs = os.listdir(str(tmp_path / "ir"))
    assert len(out_dirs) == 1  # sha256-keyed dir
    with open(os.path.join(str(tmp_path / "ir"), out_dirs[0],
                           "results.json")) as f:
        results = json.load(f)
    assert "baseline" in results and "trained" in results
    assert "cos_sim" in results["baseline"]["metrics"]
    assert "map@5" in results["baseline"]["metrics"]["cos_sim"]


def test_train_cli_pipeline_parallel(tmp_path):
    """--pp_stages 2 trains through the pipelined trunk end-to-end and
    still exports a flat best artifact the ir-eval CLI can consume."""
    root = str(tmp_path / "chunks")
    write_synthetic_dataset(root, n_chunks=2, chunk_dim=8)
    exp = str(tmp_path / "exp_pp")
    rc = train_main.main([
        "--dataset_root", root,
        "--experiment_dir", exp,
        "--encoder_preset", "tiny",
        "--batch_size", "8",
        "--epochs", "1",
        "--learning_rate", "1e-3",
        "--scheduler", "constantlr",
        "--evaluation_steps", "2",
        "--checkpoint_save_steps", "0",
        "--val_fraction", "0.3",
        "--pp_stages", "2",
        "--pp_microbatches", "2",
        "--mesh_data", "2",
    ])
    assert rc == 0
    assert os.path.isdir(os.path.join(exp, "checkpoints", "best"))
    from qst_tpu.cli.common import load_best_params

    best = load_best_params(exp)
    assert "encoder" in best and "layer_1" in best["encoder"]


def test_ir_eval_cli_sharded_mesh(tmp_path):
    """IR evaluation through the CLI over the full 8-device mesh (corpus
    sharded across all devices)."""
    root = str(tmp_path / "chunks")
    write_synthetic_dataset(root, n_chunks=2, chunk_dim=8)
    rc = ir_eval_main.main([
        "--dataset_root", root,
        "--output_root", str(tmp_path / "ir"),
        "--encoder_preset", "tiny",
        "--n_queries", "4",
        "--accuracy_at_k", "1",
        "--precision_recall_at_k", "1",
        "--mrr_at_k", "3",
        "--ndcg_at_k", "3",
        "--map_at_k", "3",
        "--score_functions", "cos_sim",
        "--mesh_data", "8",
    ])
    assert rc == 0


def test_index_cli_build_and_query(tmp_path, capsys):
    from qst_tpu.cli import index_main

    texts = str(tmp_path / "docs.txt")
    with open(texts, "w") as f:
        f.write("a cat sits on the mat\n"
                "the dog runs in the park\n"
                "pasta with tomato sauce\n\n"
                "a plane above the clouds\n")
    idx_dir = str(tmp_path / "idx")
    rc = index_main.main(["build", "--texts", texts, "--index_dir", idx_dir,
                          "--encoder_preset", "tiny"])
    assert rc == 0
    assert os.path.isfile(os.path.join(idx_dir, "embeddings.npy"))

    rc = index_main.main(["query", "--index_dir", idx_dir,
                          "--encoder_preset", "tiny",
                          "--queries", "a cat on a rug", "--k", "2"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    assert payload["query"] == "a cat on a rug"
    assert len(payload["hits"]) == 2
    assert all("text" in h for h in payload["hits"])


def test_index_cli_validation(tmp_path):
    from qst_tpu.cli import index_main

    with pytest.raises(SystemExit):
        index_main.main(["build", "--index_dir", str(tmp_path / "x")])
    empty = str(tmp_path / "empty.txt")
    open(empty, "w").close()
    with pytest.raises(SystemExit):
        index_main.main(["build", "--texts", empty,
                         "--index_dir", str(tmp_path / "y"),
                         "--encoder_preset", "tiny"])


def test_index_cli_int8_build_and_query(tmp_path, capsys):
    """--index_dtype int8 builds a quantized artifact that queries and
    reloads without re-quantization (int8 on disk + scale in metadata)."""
    from qst_tpu.cli import index_main

    texts = str(tmp_path / "docs.txt")
    with open(texts, "w") as f:
        f.write("a cat sits on the mat\n"
                "the dog runs in the park\n"
                "pasta with tomato sauce\n")
    idx_dir = str(tmp_path / "idx8")
    rc = index_main.main(["build", "--texts", texts, "--index_dir", idx_dir,
                          "--encoder_preset", "tiny",
                          "--index_dtype", "int8"])
    assert rc == 0
    emb = np.load(os.path.join(idx_dir, "embeddings.npy"))
    assert emb.dtype == np.int8
    with open(os.path.join(idx_dir, "index_meta.json")) as f:
        meta = json.load(f)
    assert meta["dtype"] == "int8" and meta["int8_scale"] > 0

    rc = index_main.main(["query", "--index_dir", idx_dir,
                          "--encoder_preset", "tiny",
                          "--queries", "a cat on a rug", "--k", "2"])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(payload["hits"]) == 2


def test_ir_eval_cli_approximate_index(tmp_path):
    """--eval_index ivf runs the IR A/B over the approximate index; the
    default euclid score function is silently dropped (cos/dot kept)."""
    from qst_tpu.cli import ir_eval_main

    root = str(tmp_path / "chunks")
    write_synthetic_dataset(root, n_chunks=2, chunk_dim=8)
    rc = ir_eval_main.main([
        "--dataset_root", root,
        "--output_root", str(tmp_path / "ir"),
        "--encoder_preset", "tiny",
        "--n_queries", "6",
        "--accuracy_at_k", "1", "3",
        "--precision_recall_at_k", "3",
        "--mrr_at_k", "3",
        "--ndcg_at_k", "3",
        "--map_at_k", "3",
        "--eval_index", "ivf",
        "--eval_ivf_clusters", "4",
        "--eval_ivf_probe", "4",
    ])
    assert rc == 0
