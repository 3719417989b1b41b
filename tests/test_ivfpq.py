"""IVF-PQ hybrid index: exactness vs reconstruction golden, residual
quality, refine, sharding, streaming, tuning, persistence arrays."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qst_tpu.retrieval import ExactIndex
from qst_tpu.retrieval.ivfpq import IVFPQIndex


@pytest.fixture(scope="module")
def clustered_corpus():
    # Noise 1.0 (vs center scale 4): clustered but NOT near-duplicate.
    # Tighter clusters make within-cluster top-10 ranking ill-conditioned
    # (cosine ties ~1e-4, below PQ quantization noise), which measures the
    # data's degeneracy rather than the index's recall.
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((16, 32)) * 4
    docs = np.concatenate([
        centers[i] + rng.standard_normal((64, 32)) * 1.0 for i in range(16)
    ]).astype(np.float32)
    return docs


@pytest.fixture(scope="module")
def queries(clustered_corpus):
    rng = np.random.default_rng(1)
    return clustered_corpus[rng.choice(len(clustered_corpus), 24)] \
        + rng.standard_normal((24, 32)).astype(np.float32) * 0.1


def _norm(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _golden_over_recon(index, q, k):
    recon = index.reconstruct_rows()          # (N, D) reconstructions
    S = _norm(q) @ recon.T
    idx = np.argsort(-S, axis=1)[:, :k]
    return np.take_along_axis(S, idx, axis=1), idx


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("residual", [True, False])
def test_full_probe_matches_reconstruction_golden(clustered_corpus,
                                                  queries, residual, bits):
    """n_probe = n_cells scans every cell — scores must equal brute-force
    cosine over the index's own PQ reconstructions (the exactness
    contract tune_n_probe's ground truth relies on), for both the 8-bit
    decode and the 4-bit fast-scan block-diagonal decode."""
    idx = IVFPQIndex(clustered_corpus, n_clusters=16, m=8, seed=0,
                     residual=residual, bits=bits)
    gs, gi = _golden_over_recon(idx, queries, 5)
    s, ids = idx.search(queries, k=5, n_probe=16, refine_factor=0)
    got = np.array([[j for j in row] for row in ids])
    np.testing.assert_allclose(s, gs, rtol=2e-4, atol=2e-4)
    # ids must match rank-for-rank except where reconstructions tie
    # exactly (4-bit non-residual: docs sharing a code word share a score)
    recon = idx.reconstruct_rows()
    S = _norm(queries) @ recon.T
    mismatch = got != gi
    if mismatch.any():
        rows, cols = np.nonzero(mismatch)
        np.testing.assert_allclose(S[rows, got[rows, cols]],
                                   S[rows, gi[rows, cols]],
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("bits", [8, 4])
def test_recall_vs_exact_with_refine(clustered_corpus, queries, bits):
    exact = ExactIndex(clustered_corpus, normalize=True)
    _, exact_ids = exact.search_ids(_norm(queries), k=10)
    idx = IVFPQIndex(clustered_corpus, n_clusters=16, m=8, seed=0,
                     keep_rows=True, bits=bits)
    s, got = idx.search(queries, k=10, n_probe=4, refine_factor=4)
    recall = np.mean([
        len(set(a) & set(b)) / 10 for a, b in zip(exact_ids, got)])
    assert recall > 0.85, f"refined recall@10 too low: {recall}"
    # refined scores are exact cosines of the returned docs
    cn = _norm(clustered_corpus)
    qn = _norm(queries)
    for r, (srow, irow) in enumerate(zip(s, got)):
        for sc, j in zip(srow, irow):
            np.testing.assert_allclose(sc, qn[r] @ cn[j], rtol=2e-2,
                                       atol=2e-2)  # bf16 refine rows


def test_residual_encoding_reconstructs_finer(clustered_corpus):
    """The point of residual encoding: same m bytes/doc, lower
    reconstruction error (residual magnitudes shrink with cell radius)."""
    base = IVFPQIndex(clustered_corpus, n_clusters=16, m=8, seed=0,
                      residual=False)
    res = IVFPQIndex(clustered_corpus, n_clusters=16, m=8, seed=0,
                     residual=True)
    rows = _norm(clustered_corpus)
    mse_base = float(np.mean((base.reconstruct_rows() - rows) ** 2))
    mse_res = float(np.mean((res.reconstruct_rows() - rows) ** 2))
    assert mse_res < mse_base, (mse_res, mse_base)


def test_nothing_dropped(clustered_corpus):
    idx = IVFPQIndex(clustered_corpus, n_clusters=16, m=8, seed=0)
    stored = set(int(j) for j in np.asarray(idx.cell_ids).ravel() if j >= 0)
    assert stored == set(range(len(clustered_corpus)))


@pytest.mark.parametrize("bits", [8, 4])
def test_sharded_matches_single(clustered_corpus, queries, mesh8, bits):
    single = IVFPQIndex(clustered_corpus, n_clusters=16, m=8, seed=0,
                        bits=bits)
    sharded = IVFPQIndex(clustered_corpus, n_clusters=16, m=8, seed=0,
                         mesh=mesh8, bits=bits)
    for n_probe in (4, 16):
        s1, i1 = single.search(queries, k=5, n_probe=n_probe,
                               refine_factor=0)
        s2, i2 = sharded.search(queries, k=5, n_probe=n_probe,
                                refine_factor=0)
        assert i1 == i2
        np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-5)


def test_search_stream_matches_search(clustered_corpus, queries):
    idx = IVFPQIndex(clustered_corpus, n_clusters=16, m=8, seed=0,
                     keep_rows=True)
    batches = [queries[:8], queries[8:16], queries[16:]]
    streamed = list(idx.search_stream(iter(batches), k=5, n_probe=4,
                                      depth=2, refine_factor=4))
    s_all, ids_all = idx.search(queries, k=5, n_probe=4, refine_factor=4)
    got_s = np.concatenate([s for s, _ in streamed])
    got_i = np.concatenate([i for _, i in streamed])
    np.testing.assert_allclose(got_s, s_all, rtol=1e-5, atol=1e-5)
    flat_ids = np.array([[j for j in row] for row in ids_all])
    np.testing.assert_array_equal(got_i, flat_ids)


def test_tune_n_probe(clustered_corpus, queries):
    idx = IVFPQIndex(clustered_corpus, n_clusters=16, m=8, seed=0)
    best, curve = idx.tune_n_probe(queries, k=10, target_recall=0.9)
    assert best in curve and curve[best] >= 0.9
    assert idx.default_n_probe == best
    with pytest.raises(ValueError, match="no candidates"):
        idx.tune_n_probe(queries, candidates=[16, 0])
    with pytest.raises(ValueError, match="non-empty"):
        idx.tune_n_probe(np.zeros((0, 32), np.float32))
    with pytest.warns(UserWarning, match="exhaustive full probe"):
        idx.tune_n_probe(queries, k=10, target_recall=1.0, candidates=[1],
                         set_default=False)


@pytest.mark.parametrize("bits", [8, 4])
def test_from_arrays_roundtrip(clustered_corpus, queries, bits):
    idx = IVFPQIndex(clustered_corpus, n_clusters=16, m=8, seed=0,
                     keep_rows=True, default_n_probe=4, bits=bits)
    re = IVFPQIndex.from_arrays(
        np.asarray(idx.centroids), np.asarray(idx.cell_codes),
        np.asarray(idx.cell_ids), np.asarray(idx.codebooks),
        np.asarray(idx.fill), ids=idx.ids, default_n_probe=4,
        residual=idx.residual, bits=bits,
        refine_rows=np.asarray(idx._refine_rows, np.float32))
    s1, i1 = idx.search(queries, k=5, refine_factor=4)
    s2, i2 = re.search(queries, k=5, refine_factor=4)
    assert i1 == i2
    np.testing.assert_allclose(s1, s2, rtol=1e-2, atol=1e-2)


def test_4bit_quality_close_to_8bit(clustered_corpus):
    """Same bytes/doc: the 4-bit reconstruction error may exceed 8-bit's
    but must stay the same order of magnitude (the refine stage absorbs
    the difference — measured end-to-end on chip in RESULTS.md)."""
    rows = _norm(clustered_corpus)
    e8 = IVFPQIndex(clustered_corpus, n_clusters=16, m=8, seed=0)
    e4 = IVFPQIndex(clustered_corpus, n_clusters=16, m=8, seed=0, bits=4)
    mse8 = float(np.mean((e8.reconstruct_rows() - rows) ** 2))
    mse4 = float(np.mean((e4.reconstruct_rows() - rows) ** 2))
    assert mse4 < 10 * mse8, (mse4, mse8)


def test_pq4_roundtrip_unit():
    """pack/unpack/decode plumbing: encoding the codebook centroids
    themselves reconstructs them exactly."""
    from qst_tpu.retrieval.pq4 import (
        pq4_encode, pq4_reconstruct, pq4_train, unpack_nibbles)
    rng = np.random.default_rng(3)
    sample = rng.standard_normal((512, 32)).astype(np.float32)
    cb = pq4_train(jnp.asarray(sample), jax.random.key(0), 16)
    packed = pq4_encode(jnp.asarray(sample), cb)
    assert packed.shape == (512, 8) and packed.dtype == jnp.uint8
    codes = np.asarray(unpack_nibbles(packed))
    assert codes.shape == (512, 16) and codes.max() < 16
    # centroids encode to themselves
    cents = np.asarray(cb).transpose(1, 0, 2).reshape(16, 32)
    rec = np.asarray(pq4_reconstruct(
        pq4_encode(jnp.asarray(cents), cb), cb))
    np.testing.assert_allclose(rec, cents, rtol=1e-5, atol=1e-5)


def test_validation(clustered_corpus):
    with pytest.raises(ValueError, match="not divisible"):
        IVFPQIndex(clustered_corpus, n_clusters=16, m=24)
    with pytest.raises(ValueError, match="multiple of 8"):
        IVFPQIndex(clustered_corpus, n_clusters=16, m=4)
    with pytest.raises(ValueError, match="n_clusters"):
        IVFPQIndex(clustered_corpus, n_clusters=len(clustered_corpus))
    with pytest.raises(ValueError, match="keep_rows"):
        IVFPQIndex(clustered_corpus, n_clusters=16, m=8, keep_rows="f64")
    with pytest.raises(ValueError, match="ids length"):
        IVFPQIndex(clustered_corpus, n_clusters=16, m=8, ids=[1, 2])
    idx = IVFPQIndex(clustered_corpus, n_clusters=16, m=8)
    with pytest.raises(ValueError, match="cos_sim/dot_score"):
        idx.search(np.zeros((2, 32), np.float32), score="euclid_score")
    with pytest.raises(ValueError, match="refine_factor needs"):
        idx.search(np.zeros((2, 32), np.float32), refine_factor=2)
    with pytest.raises(ValueError, match="depth"):
        list(idx.search_stream([np.zeros((2, 32), np.float32)], depth=0))


def test_incremental_fill_matches_global(clustered_corpus):
    """One-chunk IncrementalCellFill == the global _fill_cells placement;
    chunked placement keeps every doc within budget and drops nothing."""
    from qst_tpu.retrieval.ivf import _assign_choices, _fill_cells, kmeans
    from qst_tpu.retrieval.ivfpq import IncrementalCellFill

    docs = jnp.asarray(clustered_corpus)
    cents, _ = kmeans(docs, jax.random.key(0), 16, 5)
    choices = np.asarray(_assign_choices(docs, cents, 4))
    budget = 128
    g_cell, g_slot, g_spill = _fill_cells(choices, 16, budget)

    inc = IncrementalCellFill(16, budget)
    c1, s1 = inc.place(choices)
    np.testing.assert_array_equal(c1, g_cell)
    np.testing.assert_array_equal(s1, g_slot)
    assert inc.spilled == g_spill

    inc2 = IncrementalCellFill(16, budget)
    parts = [inc2.place(choices[:400]), inc2.place(choices[400:])]
    cell = np.concatenate([p[0] for p in parts])
    slot = np.concatenate([p[1] for p in parts])
    assert (cell >= 0).all() and (slot < budget).all()
    # (cell, slot) pairs unique -> no doc overwrites another
    flat = cell * budget + slot
    assert len(np.unique(flat)) == len(flat)
    np.testing.assert_array_equal(
        np.bincount(cell, minlength=16), inc2.fill)

    tiny = IncrementalCellFill(16, 2)
    with pytest.raises(ValueError, match="exhausted"):
        tiny.place(choices)


@pytest.mark.parametrize("bits", [8, 4])
def test_from_device_arrays_adoption(clustered_corpus, queries, bits):
    idx = IVFPQIndex(clustered_corpus, n_clusters=16, m=8, seed=0,
                     default_n_probe=4, bits=bits)
    re = IVFPQIndex.from_device_arrays(
        idx.centroids, jnp.asarray(np.asarray(idx.cell_codes)),
        idx.cell_ids, idx.codebooks, default_n_probe=4,
        residual=idx.residual, bits=bits)
    assert isinstance(re.ids, range) and re.n_docs == idx.n_docs
    s1, i1 = idx.search(queries, k=5, refine_factor=0)
    s2, i2 = re.search(queries, k=5, refine_factor=0)
    assert i1 == i2
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-5)
    with pytest.raises(ValueError, match="device"):
        IVFPQIndex.from_device_arrays(
            idx.centroids, np.asarray(idx.cell_codes), idx.cell_ids,
            idx.codebooks, bits=bits)


# ---------------------------------------------------------------------------
# Retriever / CLI integration (the index-kind parity surface: persistence,
# streaming, updatable conversion, end-to-end CLI build+query)
# ---------------------------------------------------------------------------

class _HashEncoder:
    def encode(self, texts):
        from helpers import hash_embed

        return hash_embed(list(texts))


def _many_docs(n=300):
    topics = ["cat", "dog", "pasta", "plane", "river"]
    return [f"{topics[i % len(topics)]} document number {i}"
            for i in range(n)]


def test_retriever_ivfpq_build_save_load(tmp_path):
    from qst_tpu.retrieval import Retriever, load_index

    docs = _many_docs()
    r = Retriever(_HashEncoder(), index_dtype="ivfpq", pq_m=16,
                  ivf_clusters=8, ivf_probe=8)
    r.build(docs, ids=[f"d{i}" for i in range(len(docs))])
    assert isinstance(r.index, IVFPQIndex)
    before = r.search(["a cat rests"], k=5, return_texts=True)
    assert before[0][0][2].startswith("cat")

    r.save(str(tmp_path / "idx"))
    import os
    assert os.path.isfile(tmp_path / "idx" / "ivfpq_cell_codes.npy")
    assert not os.path.isfile(tmp_path / "idx" / "embeddings.npy")

    r2 = Retriever(_HashEncoder(), index_dtype="ivfpq").load(
        str(tmp_path / "idx"))
    assert isinstance(r2.index, IVFPQIndex)
    assert r2.index.default_n_probe == 8
    after = r2.search(["a cat rests"], k=5, return_texts=True)
    assert [h[0] for h in before[0]] == [h[0] for h in after[0]]
    np.testing.assert_allclose([h[1] for h in before[0]],
                               [h[1] for h in after[0]], rtol=1e-5)

    # dtype cross-loading is rejected both ways
    with pytest.raises(ValueError, match="IVF-PQ"):
        load_index(str(tmp_path / "idx"), dtype="bfloat16")
    r3 = Retriever(_HashEncoder()).build(docs[:5])
    r3.save(str(tmp_path / "f32"))
    with pytest.raises(ValueError, match="IVF-PQ"):
        load_index(str(tmp_path / "f32"), dtype="ivfpq")


def test_retriever_ivfpq_search_stream_and_updatable():
    from qst_tpu.retrieval import Retriever

    docs = _many_docs()
    r = Retriever(_HashEncoder(), index_dtype="ivfpq", pq_m=16,
                  ivf_clusters=8, ivf_probe=8).build(docs)
    got = list(r.search_stream([["a dog runs"], ["pasta dish"]], k=3))
    assert len(got) == 2 and len(got[0][0]) == 3
    assert all(isinstance(h[0], int) for h in got[0][0])

    r.to_updatable(capacity=1024)
    assert r.index.n_docs == len(docs)
    hits = r.search(["a plane flies"], k=3)
    assert len(hits[0]) == 3


def test_index_cli_ivfpq_build_and_query(tmp_path, capsys):
    """--index_dtype ivfpq persists cells+codebooks+refine rows; query
    reloads them without retraining."""
    import json as _json
    import os

    from qst_tpu.cli import index_main

    texts = str(tmp_path / "docs.txt")
    topics = ["cat", "dog", "pasta", "plane", "river"]
    with open(texts, "w") as f:
        for i in range(300):
            f.write(f"{topics[i % 5]} doc number {i}\n")
    idx_dir = str(tmp_path / "hyidx")
    rc = index_main.main(["build", "--texts", texts, "--index_dir", idx_dir,
                          "--encoder_preset", "tiny",
                          "--index_dtype", "ivfpq", "--pq_m", "8",
                          "--ivf_clusters", "8", "--ivf_probe", "4"])
    assert rc == 0
    codes = np.load(os.path.join(idx_dir, "ivfpq_cell_codes.npy"))
    assert codes.dtype == np.uint8 and codes.ndim == 3 and codes.shape[2] == 8
    with open(os.path.join(idx_dir, "index_meta.json")) as f:
        meta = _json.load(f)
    assert meta["dtype"] == "ivfpq" and meta["m"] == 8 and meta["refine"]
    assert meta["n_probe"] == 4 and meta["bits"] == 8 and meta["residual"]

    rc = index_main.main(["query", "--index_dir", idx_dir,
                          "--encoder_preset", "tiny",
                          "--index_dtype", "ivfpq",
                          "--queries", "a cat on a rug", "--k", "2"])
    assert rc == 0
    payload = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(payload["hits"]) == 2


def test_search_stream_refine_narrow_pool(clustered_corpus, queries):
    """k·refine above the probed pool width: the stream finisher must
    clamp its top-k to the pool like search() does (regression: it used
    min(k, n_docs) and lax.top_k raised on k > n_probe·cell_budget)."""
    idx = IVFPQIndex(clustered_corpus, n_clusters=16, m=8, seed=0,
                     cell_budget=64, keep_rows=True)
    k = 100   # pool = n_probe·cell_budget = 64 < k: width clamps to 64
    streamed = list(idx.search_stream([queries], k=k, n_probe=1,
                                      refine_factor=4))
    s_all, ids_all = idx.search(queries, k=k, n_probe=1, refine_factor=4)
    got_s, got_i = streamed[0]
    assert got_s.shape[1] == s_all.shape[1] <= k
    np.testing.assert_allclose(got_s, s_all, rtol=1e-5, atol=1e-5)


def test_reconstruct_rows_with_padded_cells(clustered_corpus, mesh8):
    """Mesh sharding pads the cell count past n_clusters; the residual
    reconstruction must clamp its centroid gather to the real centroids
    (regression: IndexError on padded cell ids)."""
    idx = IVFPQIndex(clustered_corpus, n_clusters=6, m=8, seed=0,
                     mesh=mesh8)
    assert idx.cell_codes.shape[0] > idx.centroids.shape[0]  # padded
    rows = idx.reconstruct_rows()
    assert rows.shape == clustered_corpus.shape
    # every real doc's reconstruction correlates with its original
    cos = np.sum(_norm(rows) * _norm(clustered_corpus), axis=1)
    assert float(np.median(cos)) > 0.8
