"""Host-streamed exact search: tile-merge exactness on the CPU backend.

The streaming index restores the reference's stream-any-corpus envelope
(reference training/main.py:178-179's 50k-doc chunked evaluator loop); here
it must be EXACT vs the brute-force reference for every tile geometry,
score, backend, and dtype combination."""

import numpy as np
import pytest

import jax.numpy as jnp

from qst_tpu.ops.topk_pallas import reference_topk
from qst_tpu.retrieval import StreamingExactIndex


def _golden(queries, corpus, k, score):
    if score == "cos_sim":
        queries = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        corpus = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    return reference_topk(jnp.asarray(queries), jnp.asarray(corpus), k)


@pytest.mark.parametrize("n_docs,tile_rows", [(5000, 1024), (3000, 4096),
                                              (4096, 2048), (700, 128)])
@pytest.mark.parametrize("score", ["cos_sim", "dot_score"])
def test_streaming_exact_vs_reference(rng, n_docs, tile_rows, score):
    """Partial last tiles, single-tile corpora, and tiny tiles must all be
    exact (f32 transfers so scores bit-match the f32 reference)."""
    D, Q, k = 32, 9, 7
    corpus = rng.standard_normal((n_docs, D)).astype(np.float32)
    queries = rng.standard_normal((Q, D)).astype(np.float32)
    idx = StreamingExactIndex(corpus, tile_rows=tile_rows,
                              transfer_dtype="float32")
    s, i = idx.search(queries, k=k, score=score)
    gs, gi = _golden(queries, corpus, k, score)
    np.testing.assert_array_equal(i, np.asarray(gi))
    np.testing.assert_allclose(s, np.asarray(gs), rtol=1e-4, atol=1e-5)


def test_streaming_pallas_backend_interpret(rng):
    """The fused per-tile pipeline (interpret mode on CPU) must agree with
    the XLA tile path exactly."""
    corpus = rng.standard_normal((2600, 48)).astype(np.float32)
    queries = rng.standard_normal((5, 48)).astype(np.float32)
    idx = StreamingExactIndex(corpus, tile_rows=1024,
                              transfer_dtype="float32")
    s_p, i_p = idx.search(queries, k=6, backend="pallas")
    s_x, i_x = idx.search(queries, k=6, backend="xla")
    np.testing.assert_array_equal(i_p, i_x)
    np.testing.assert_allclose(s_p, s_x, rtol=1e-4, atol=1e-5)


def test_streaming_bf16_transfer_matches_bf16_truth(rng):
    """bf16 transfer halves host-link bytes; ranking must equal the truth
    computed on the same bf16-quantized corpus."""
    corpus = rng.standard_normal((2000, 32)).astype(np.float32)
    queries = rng.standard_normal((4, 32)).astype(np.float32)
    idx = StreamingExactIndex(corpus, tile_rows=512)  # bf16 default
    s, i = idx.search(queries, k=5, score="dot_score")
    c16 = jnp.asarray(corpus, jnp.bfloat16)
    q16 = jnp.asarray(queries, jnp.bfloat16)
    gs, gi = reference_topk(q16, c16, 5)
    np.testing.assert_array_equal(i, np.asarray(gi))


def test_streaming_memmap_from_npy(rng, tmp_path):
    """A disk-backed memmap corpus must search without loading into RAM."""
    corpus = rng.standard_normal((1500, 16)).astype(np.float32)
    path = str(tmp_path / "corpus.npy")
    np.save(path, corpus)
    idx = StreamingExactIndex.from_npy(path, tile_rows=512,
                                       transfer_dtype="float32")
    assert isinstance(idx.embeddings, np.memmap)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    s, i = idx.search(q, k=4)
    gs, gi = _golden(q, corpus, 4, "cos_sim")
    np.testing.assert_array_equal(i, np.asarray(gi))


def test_streaming_ids_and_k_clamp(rng):
    corpus = rng.standard_normal((300, 8)).astype(np.float32)
    ids = [f"doc{j}" for j in range(300)]
    idx = StreamingExactIndex(corpus, tile_rows=128,
                              transfer_dtype="float32", ids=ids)
    q = corpus[:2]
    s, out_ids = idx.search_ids(q, k=500)  # clamps to N
    assert len(out_ids[0]) == 300
    assert out_ids[0][0] == "doc0" and out_ids[1][0] == "doc1"


@pytest.mark.parametrize("n_docs,tile_rows", [(5000, 1024), (3000, 2048),
                                              (2048, 2048), (900, 1024)])
@pytest.mark.parametrize("score", ["cos_sim", "dot_score"])
def test_streaming_sharded_exact_vs_reference(rng, mesh8, n_docs,
                                              tile_rows, score):
    """Streaming × ICI sharding: row-sharded tiles + all_gather merge must
    stay exact for partial tiles (incl. tiles where trailing SHARDS are
    fully padded) on the 8-device mesh."""
    D, Q, k = 32, 6, 7
    corpus = rng.standard_normal((n_docs, D)).astype(np.float32)
    queries = rng.standard_normal((Q, D)).astype(np.float32)
    idx = StreamingExactIndex(corpus, tile_rows=tile_rows,
                              transfer_dtype="float32", mesh=mesh8)
    s, i = idx.search(queries, k=k, score=score)
    gs, gi = _golden(queries, corpus, k, score)
    np.testing.assert_array_equal(i, np.asarray(gi))
    np.testing.assert_allclose(s, np.asarray(gs), rtol=1e-4, atol=1e-5)


def test_streaming_sharded_pallas_interpret_matches_xla(rng, mesh8):
    """The fused per-shard pipeline (interpret mode) must agree with the
    sharded XLA tile path exactly — the pod-slice streaming fast path."""
    corpus = rng.standard_normal((2100, 48)).astype(np.float32)
    queries = rng.standard_normal((4, 48)).astype(np.float32)
    idx = StreamingExactIndex(corpus, tile_rows=1024,
                              transfer_dtype="float32", mesh=mesh8)
    s_p, i_p = idx.search(queries, k=6, backend="pallas")
    s_x, i_x = idx.search(queries, k=6, backend="xla")
    np.testing.assert_array_equal(i_p, i_x)
    np.testing.assert_allclose(s_p, s_x, rtol=1e-4, atol=1e-5)


def test_streaming_sharded_matches_unsharded(rng, mesh8):
    """mesh=None and mesh=8 must return identical results (bf16 transfer)."""
    corpus = rng.standard_normal((3100, 32)).astype(np.float32)
    queries = rng.standard_normal((5, 32)).astype(np.float32)
    plain = StreamingExactIndex(corpus, tile_rows=1024)
    shard = StreamingExactIndex(corpus, tile_rows=1024, mesh=mesh8)
    s0, i0 = plain.search(queries, k=9, score="dot_score")
    s1, i1 = shard.search(queries, k=9, score="dot_score")
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, rtol=1e-4, atol=1e-5)


def test_streaming_sharded_tile_quantum(rng, mesh8):
    """With a mesh, tile_rows must quantize to BUCKET × n_devices."""
    corpus = rng.standard_normal((3000, 16)).astype(np.float32)
    with pytest.raises(ValueError, match="mesh devices"):
        StreamingExactIndex(corpus, tile_rows=512, mesh=mesh8)  # 512 < 1024


def test_streaming_validation(rng):
    corpus = rng.standard_normal((100, 8)).astype(np.float32)
    with pytest.raises(ValueError, match="tile_rows"):
        StreamingExactIndex(corpus, tile_rows=100)
    with pytest.raises(ValueError, match="transfer_dtype"):
        StreamingExactIndex(corpus, transfer_dtype="float16")
    with pytest.raises(ValueError, match="must be"):
        StreamingExactIndex(corpus[0])
    with pytest.raises(ValueError, match="ids length"):
        StreamingExactIndex(corpus, tile_rows=128, ids=["a"])
    idx = StreamingExactIndex(corpus, tile_rows=128,
                              transfer_dtype="float32")
    with pytest.raises(ValueError, match="supports"):
        idx.search(corpus[:1], score="euclid_score")
    with pytest.raises(ValueError, match="backend"):
        idx.search(corpus[:1], backend="nope")


def test_streaming_normalize_flag_applies_to_dot(rng):
    """normalize=True gives ExactIndex(normalize=True) semantics: dot
    searches see the NORMALIZED vectors (the flag was previously dead)."""
    corpus = (rng.standard_normal((600, 16)) * rng.uniform(
        0.1, 5.0, (600, 1))).astype(np.float32)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    idx = StreamingExactIndex(corpus, tile_rows=256,
                              transfer_dtype="float32", normalize=True)
    s_dot, i_dot = idx.search(q, k=5, score="dot_score")
    gs, gi = _golden(q / np.linalg.norm(q, axis=1, keepdims=True),
                     corpus, 5, "cos_sim")
    # dot over normalized docs ranks like cosine-of-docs (queries raw,
    # which scales each row uniformly so the ORDER matches the golden cos
    # ranking of that query)
    np.testing.assert_array_equal(i_dot, np.asarray(gi))


def _int8_stream_golden(queries, corpus, k, score, tile_rows):
    """Numpy twin of the int8 streaming scheme: PER-TILE corpus scales
    (127/max|tile|), per-call query scale, per-tile descale before merge."""
    qf = (queries / np.linalg.norm(queries, axis=1, keepdims=True)
          if score == "cos_sim" else queries.astype(np.float64))
    qscale = 127.0 / np.abs(qf).max()
    qi = np.clip(np.round(qf * qscale), -127, 127).astype(np.int64)
    cols = []
    for lo in range(0, corpus.shape[0], tile_rows):
        tile = corpus[lo:lo + tile_rows].astype(np.float32)
        tile = tile / np.maximum(
            np.linalg.norm(tile, axis=1, keepdims=True), 1e-12)
        scale = 127.0 / max(float(np.abs(tile).max()), 1e-12)
        cq = np.clip(np.round(tile * scale), -127, 127).astype(np.int64)
        cols.append((qi @ cq.T).astype(np.float32) / np.float32(
            qscale * scale))
    return np.concatenate(cols, axis=1)


@pytest.mark.parametrize("n_docs,tile_rows", [(5000, 1024), (3000, 4096),
                                              (700, 128)])
@pytest.mark.parametrize("score", ["cos_sim", "dot_score"])
def test_streaming_int8_matches_integer_golden(rng, n_docs, tile_rows,
                                               score):
    """int8 tiles (half the host-link bytes) must rank integer-exactly:
    top-k scores and per-id scores match the numpy int64 golden across
    partial last tiles and single-tile corpora."""
    D, Q, k = 32, 9, 7
    corpus = rng.standard_normal((n_docs, D)).astype(np.float32)
    queries = rng.standard_normal((Q, D)).astype(np.float32)
    idx = StreamingExactIndex(corpus, tile_rows=tile_rows,
                              transfer_dtype="int8")
    s, i = idx.search(queries, k=k, score=score)
    S = _int8_stream_golden(queries, corpus, k, score, tile_rows)
    np.testing.assert_allclose(s, np.sort(S, axis=1)[:, ::-1][:, :k],
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(s, np.take_along_axis(S, i, axis=1),
                               rtol=1e-5, atol=1e-7)


def test_streaming_int8_prequantized_host_matches_golden(rng):
    """An already-int8 host corpus (quantize_host output — half the host
    RAM/disk too) streams verbatim at the FIXED scale: results match the
    fixed-scale numpy golden (coarser than the on-the-fly per-tile path)."""
    corpus = rng.standard_normal((3000, 32)).astype(np.float32)
    queries = rng.standard_normal((5, 32)).astype(np.float32)
    b = StreamingExactIndex(StreamingExactIndex.quantize_host(corpus),
                            tile_rows=1024, transfer_dtype="int8")
    sb, ib = b.search(queries, k=7)
    qf = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    qscale = 127.0 / np.abs(qf).max()
    qi = np.clip(np.round(qf * qscale), -127, 127).astype(np.int64)
    cq = StreamingExactIndex.quantize_host(corpus).astype(np.int64)
    S = (qi @ cq.T) / (qscale * StreamingExactIndex.INT8_SCALE)
    np.testing.assert_allclose(sb, np.take_along_axis(S, ib, axis=1),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(sb, np.sort(S, axis=1)[:, ::-1][:, :7],
                               rtol=1e-5, atol=1e-7)


def test_streaming_int8_pallas_interpret_matches_xla(rng):
    corpus = rng.standard_normal((2000, 32)).astype(np.float32)
    queries = rng.standard_normal((5, 32)).astype(np.float32)
    idx = StreamingExactIndex(corpus, tile_rows=512, transfer_dtype="int8")
    s_x, i_x = idx.search(queries, k=6, backend="xla")
    s_p, i_p = idx.search(queries, k=6, backend="pallas")
    np.testing.assert_allclose(s_p, s_x, rtol=1e-6, atol=1e-8)
    np.testing.assert_array_equal(i_p, i_x)


def test_streaming_int8_sharded_matches_unsharded(rng, mesh8):
    corpus = rng.standard_normal((4096, 32)).astype(np.float32)
    queries = rng.standard_normal((5, 32)).astype(np.float32)
    single = StreamingExactIndex(corpus, tile_rows=2048,
                                 transfer_dtype="int8")
    sharded = StreamingExactIndex(corpus, tile_rows=2048,
                                  transfer_dtype="int8", mesh=mesh8)
    s1, i1 = single.search(queries, k=7)
    s8, i8 = sharded.search(queries, k=7)
    np.testing.assert_allclose(s8, s1, rtol=1e-6, atol=1e-8)
    S = _int8_stream_golden(queries, corpus, 7, "cos_sim", 2048)
    np.testing.assert_allclose(s8, np.take_along_axis(S, i8, axis=1),
                               rtol=1e-5, atol=1e-7)


def test_streaming_int8_validation(rng):
    corpus = rng.standard_normal((1000, 32)).astype(np.float32)
    with pytest.raises(ValueError, match="normalize"):
        StreamingExactIndex(corpus, tile_rows=512, transfer_dtype="int8",
                            normalize=True)
    with pytest.raises(ValueError, match="too wide"):
        StreamingExactIndex(np.ones((256, 2048), np.float32),
                            tile_rows=128, transfer_dtype="int8")
