"""Telemetry sink tests + mesh-aware data-parallel encoding."""

import csv
import os

import jax
import numpy as np

from qst_tpu.core.telemetry import CsvSink, JsonLogSink, StepTimer


def test_csv_sink(tmp_path):
    p = str(tmp_path / "r.csv")
    sink = CsvSink(p, ["epoch", "score"])
    sink.append([0, 0.5])
    sink.append([1, 0.7])
    # header written once even when reopened
    sink2 = CsvSink(p, ["epoch", "score"])
    sink2.append([2, 0.9])
    rows = list(csv.reader(open(p)))
    assert rows[0] == ["epoch", "score"] and len(rows) == 4


def test_json_log_sink(tmp_path):
    p = str(tmp_path / "log.json")
    sink = JsonLogSink(p)
    sink.append({"steps": 1})
    sink.append({"steps": 2})
    assert [e["steps"] for e in sink.read()] == [1, 2]
    # corrupted file → starts fresh instead of crashing
    with open(p, "w") as f:
        f.write("{broken")
    sink.append({"steps": 3})
    assert [e["steps"] for e in sink.read()] == [3]


def test_step_timer():
    t = StepTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    assert t.counts["a"] == 2
    assert t.mean("a") >= 0
    assert "a" in t.summary()
    assert t.mean("missing") == 0.0


def test_mesh_parallel_encode(mesh8):
    """SentenceEncoder(mesh=...) shards the batch over the data axis and
    produces identical embeddings to the single-device encoder."""
    from qst_tpu.core.config import EncoderConfig
    from qst_tpu.models import HashTokenizer, SentenceEncoder, init_params

    cfg = EncoderConfig.tiny()
    params = init_params(cfg, jax.random.key(0))
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    plain = SentenceEncoder(cfg, params, tok)
    sharded = SentenceEncoder(cfg, params, tok, mesh=mesh8)
    texts = [f"a cat number {i} sits on the mat" for i in range(13)]
    e1 = plain.encode(texts)
    e2 = sharded.encode(texts)
    np.testing.assert_allclose(e2, e1, atol=1e-5)
