"""Pretrained-checkpoint-dir parity harness (PARITY_RUNBOOK.md).

Exercises the weights-present path end-to-end with a locally-initialized HF
model (no network): save_pretrained checkpoint dir → load_hf_checkpoint_dir →
numerical parity vs transformers, and the ir-eval CLI driven purely by
$QST_HF_CHECKPOINT_DIR. The day real all-MiniLM-L6-v2 weights exist on disk,
the same code path produces the reference-config Recall@10/NDCG@10 A/B with
zero new code (reference ir_evauation_script.py:126-131).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from helpers import write_synthetic_dataset

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "a", "the", "cat", "dog", "car", "red", "sits", "runs", "on",
         "in", "mat", "park", "road", "plate", "of", "pasta", "beach",
         "plane", "sky", "people", "sand", "young", "small", "with",
         "sauce", "drives", "down", "clouds", "variant", "scene", "0",
         "1", "2", "3", "4", "5"]


@pytest.fixture(scope="module")
def hf_checkpoint_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    d = tmp_path_factory.mktemp("minilm_like")
    hf_cfg = BertConfig(
        vocab_size=len(VOCAB), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=32, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(7)
    hf = BertModel(hf_cfg, add_pooling_layer=False).eval()
    hf.save_pretrained(str(d))
    with open(d / "vocab.txt", "w") as f:
        f.write("\n".join(VOCAB) + "\n")
    with open(d / "sentence_bert_config.json", "w") as f:
        json.dump({"max_seq_length": 16, "do_lower_case": True}, f)
    pool_dir = d / "1_Pooling"
    pool_dir.mkdir()
    with open(pool_dir / "config.json", "w") as f:
        json.dump({"word_embedding_dimension": 32,
                   "pooling_mode_cls_token": False,
                   "pooling_mode_mean_tokens": True,
                   "pooling_mode_max_tokens": False}, f)
    return str(d), hf


def test_load_hf_checkpoint_dir_parity(hf_checkpoint_dir):
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from qst_tpu.models.hf_import import load_hf_checkpoint_dir
    from qst_tpu.models.sentence_encoder import SentenceEncoderModule

    ckpt_dir, hf = hf_checkpoint_dir
    cfg, params, vocab_path = load_hf_checkpoint_dir(ckpt_dir)
    assert cfg.arch == "bert"
    assert cfg.hidden_size == 32 and cfg.num_layers == 2
    assert cfg.max_seq_length == 16      # from sentence_bert_config.json
    assert cfg.pooling == "mean"         # from 1_Pooling/config.json
    assert vocab_path and os.path.isfile(vocab_path)

    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg.vocab_size, (2, 16)).astype(np.int32)
    mask = np.ones((2, 16), np.int32)
    mask[1, 9:] = 0
    with torch.no_grad():
        hf_out = hf(input_ids=torch.from_numpy(ids).long(),
                    attention_mask=torch.from_numpy(mask).long(),
                    ).last_hidden_state.numpy()
    import dataclasses

    fcfg = dataclasses.replace(cfg, dtype="float32", normalize=False)
    ours = SentenceEncoderModule(fcfg).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    golden = (hf_out * mask[..., None]).sum(1) / mask.sum(1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(ours["sentence_embedding"]), golden, rtol=2e-4, atol=2e-5)


def test_load_hf_checkpoint_dir_errors(tmp_path):
    from qst_tpu.models.hf_import import load_hf_checkpoint_dir

    with pytest.raises(FileNotFoundError):
        load_hf_checkpoint_dir(str(tmp_path / "missing"))
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        load_hf_checkpoint_dir(str(empty))


def test_ir_eval_cli_with_checkpoint_dir_env(hf_checkpoint_dir, tmp_path,
                                             monkeypatch):
    """The exact parity-runbook invocation: $QST_HF_CHECKPOINT_DIR set, no
    model flags — the CLI derives architecture/weights/vocab from the dir
    and runs the baseline A/B path."""
    from qst_tpu.cli import ir_eval_main

    ckpt_dir, _ = hf_checkpoint_dir
    root = str(tmp_path / "chunks")
    write_synthetic_dataset(root, n_chunks=2, chunk_dim=6)
    out_root = str(tmp_path / "out")
    monkeypatch.setenv("QST_HF_CHECKPOINT_DIR", ckpt_dir)
    rc = ir_eval_main.main([
        "--dataset_root", root,
        "--output_root", out_root,
        "--n_queries", "4",
        "--accuracy_at_k", "1", "3",
        "--precision_recall_at_k", "1", "3",
        "--mrr_at_k", "3",
        "--ndcg_at_k", "3",
        "--map_at_k", "3",
        "--score_functions", "cos_sim",
        "--seed", "3",
    ])
    assert rc == 0
    (exp_dir,) = [os.path.join(out_root, d) for d in os.listdir(out_root)]
    with open(os.path.join(exp_dir, "results.json")) as f:
        results = json.load(f)
    assert "baseline" in results
    metrics = results["baseline"]["metrics"]["cos_sim"]
    assert "ndcg@3" in metrics and 0.0 <= metrics["ndcg@3"] <= 1.0
    # provenance records the checkpoint dir
    with open(os.path.join(exp_dir, "command_line_args.json")) as f:
        assert json.load(f)["hf_checkpoint_dir"] == ckpt_dir


@pytest.mark.parity
def test_ir_eval_cli_rankings_match_torch_pipeline(hf_checkpoint_dir,
                                                   tmp_path, monkeypatch):
    """PARITY_RUNBOOK rehearsal (VERDICT r2 #9): the ACTUAL ir-eval CLI —
    WordPiece tokenizer → JAX encoder → exact index → metric grid — must
    reproduce, metric for metric, a fully INDEPENDENT torch/transformers
    pipeline (HF BertTokenizer + torch BertModel + numpy ranking) run on
    the very eval set the CLI built. Metric-dict equality across the grid
    certifies identical rankings end-to-end; with real all-MiniLM-L6-v2
    weights in $QST_HF_CHECKPOINT_DIR the same path yields the
    reference-config Recall@10/NDCG@10 numbers with zero new code."""
    torch = pytest.importorskip("torch")
    from transformers import BertTokenizer

    from qst_tpu.cli import ir_eval_main
    from qst_tpu.evals.ir_metrics import ir_metrics

    ckpt_dir, hf = hf_checkpoint_dir
    root = str(tmp_path / "chunks")
    write_synthetic_dataset(root, n_chunks=2, chunk_dim=6)
    out_root = str(tmp_path / "out")
    monkeypatch.setenv("QST_HF_CHECKPOINT_DIR", ckpt_dir)
    grid = ["1", "3", "5"]
    rc = ir_eval_main.main([
        "--dataset_root", root,
        "--output_root", out_root,
        "--n_queries", "6",
        "--accuracy_at_k", *grid,
        "--precision_recall_at_k", *grid,
        "--mrr_at_k", *grid,
        "--ndcg_at_k", *grid,
        "--map_at_k", *grid,
        "--score_functions", "cos_sim",
        "--seed", "5",
    ])
    assert rc == 0
    (exp_dir,) = [os.path.join(out_root, d) for d in os.listdir(out_root)]
    with open(os.path.join(exp_dir, "results.json")) as f:
        cli_metrics = json.load(f)["baseline"]["metrics"]["cos_sim"]
    # the EXACT eval set the CLI built (seed-keyed cache, reference
    # evaluators.py:416-433 behavior)
    with open(os.path.join(exp_dir, "ir_eval_set.json")) as f:
        es = json.load(f)
    queries, corpus, relevant = es["queries"], es["corpus"], es["relevant"]
    q_ids = [q for q in queries if relevant.get(q)]
    c_ids = list(corpus.keys())

    # independent pipeline: HF tokenizer + torch forward + numpy ranking
    tok = BertTokenizer(vocab_file=os.path.join(ckpt_dir, "vocab.txt"),
                        do_lower_case=True)

    def torch_encode(texts):
        batch = tok(texts, padding=True, truncation=True, max_length=16,
                    return_tensors="pt")
        with torch.no_grad():
            out = hf(input_ids=batch["input_ids"],
                     attention_mask=batch["attention_mask"])
        h = out.last_hidden_state.numpy()
        m = batch["attention_mask"].numpy()[..., None]
        emb = (h * m).sum(1) / np.maximum(m.sum(1), 1)
        return emb / np.linalg.norm(emb, axis=1, keepdims=True)

    q_emb = torch_encode([queries[q] for q in q_ids])
    c_emb = torch_encode([corpus[c] for c in c_ids])
    sims = q_emb @ c_emb.T
    order = np.argsort(-sims, axis=1)
    k = min(5, len(c_ids))
    ranked = [[c_ids[j] for j in row[:k]] for row in order]
    golden = ir_metrics(
        ranked, [set(relevant[q]) for q in q_ids],
        accuracy_at_k=(1, 3, 5), precision_recall_at_k=(1, 3, 5),
        mrr_at_k=(1, 3, 5), ndcg_at_k=(1, 3, 5), map_at_k=(1, 3, 5))
    assert set(golden) == set(cli_metrics)
    for name, val in golden.items():
        np.testing.assert_allclose(
            cli_metrics[name], val, atol=1e-6,
            err_msg=f"{name}: CLI {cli_metrics[name]} != torch {val}")
