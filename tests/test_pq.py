"""PQIndex: product-quantization correctness, refine re-rank, shard parity.

The PQ score is an approximation by construction, so these tests pin the
parts that ARE deterministic: codes match a numpy argmin golden, search
scores equal the reconstruction dot-products for the returned ids, both
decode paths agree bit-for-bit, the sharded search equals single-device,
and exact re-ranking restores true cosine ranking on clustered data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qst_tpu.core.meshes import make_mesh
from qst_tpu.retrieval import ExactIndex, PQIndex
from qst_tpu.retrieval.pq import PQ_TILE, pq_encode


def _clustered(rng, n, d, n_centers=32, noise=0.05):
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    assign = rng.integers(0, n_centers, n)
    return (centers[assign]
            + noise * rng.standard_normal((n, d)).astype(np.float32))


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    corpus = _clustered(rng, 700, 32)
    queries = _clustered(rng, 9, 32)
    return corpus, queries


def _np_encode(corpus, codebooks):
    """Numpy golden of pq_encode: per-subspace L2 argmin."""
    m, k, ds = codebooks.shape
    x = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    xs = x.reshape(len(x), m, ds)
    d2 = (np.sum(xs * xs, axis=2)[:, :, None]
          - 2 * np.einsum("bmd,mkd->bmk", xs, codebooks)
          + np.sum(codebooks * codebooks, axis=2)[None])
    return np.argmin(d2, axis=2).astype(np.uint8)


def test_codes_match_numpy_golden(data):
    corpus, _ = data
    idx = PQIndex(corpus, m=8, n_iters=6)
    cb = np.asarray(idx.codebooks)
    codes = np.asarray(pq_encode(jnp.asarray(corpus), idx.codebooks))
    golden = _np_encode(corpus, cb)
    # ties broken differently are legal: check the chosen centroid's
    # distance equals the golden minimum
    m, _, ds = cb.shape
    x = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    xs = x.reshape(len(x), m, ds)
    got = np.linalg.norm(
        xs - np.take_along_axis(cb[None], codes[:, :, None, None],
                                axis=2).squeeze(2), axis=2)
    want = np.linalg.norm(
        xs - np.take_along_axis(cb[None], golden[:, :, None, None],
                                axis=2).squeeze(2), axis=2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_scores_are_reconstruction_dots(data):
    """Every returned score equals q_norm · reconstruction(id) (bf16)."""
    corpus, queries = data
    idx = PQIndex(corpus, m=8, n_iters=6)
    s, i = idx.search(queries, k=10)
    cb = np.asarray(idx.codebooks, np.float32)
    codes = _np_encode(corpus, cb)
    m, _, ds = cb.shape
    recon = np.take_along_axis(
        cb[None], codes[:, :, None, None], axis=2).squeeze(2)
    recon = recon.reshape(len(corpus), -1)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    golden = qn @ recon.T
    picked = np.take_along_axis(golden, i, axis=1)
    np.testing.assert_allclose(s, picked, rtol=2e-2, atol=2e-2)


def test_refine_restores_exact_cosine(data):
    corpus, queries = data
    pq = PQIndex(corpus, m=8, n_iters=6, keep_rows=True)
    exact = ExactIndex(corpus, normalize=True)
    s_e, i_e = exact.search(queries, k=10)
    s_r, i_r = pq.search(queries, k=10, refine_factor=8)
    # refined scores are TRUE cosines of the returned ids
    cn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    golden = qn @ cn.T
    np.testing.assert_allclose(
        s_r, np.take_along_axis(golden, i_r, axis=1), rtol=2e-2, atol=2e-2)
    # and recall@10 vs exact must be high on clustered data
    recall = np.mean([len(set(a) & set(b)) / 10.0
                      for a, b in zip(i_e, i_r)])
    assert recall >= 0.9, f"refined recall@10 {recall:.2f}"


def test_refine_host_and_device_paths_agree(data):
    """refine_pair's host-BLAS default must return the same ids and
    (near-identical) scores as the device-einsum path it replaces."""
    from qst_tpu.retrieval import pq as pq_mod

    corpus, queries = data
    pq = PQIndex(corpus, m=8, n_iters=6, keep_rows=True)
    assert pq_mod.REFINE_ON_HOST    # host BLAS is the default
    s_h, i_h = pq.search(queries, k=10, refine_factor=8)
    pq_mod.REFINE_ON_HOST = False
    try:
        s_d, i_d = pq.search(queries, k=10, refine_factor=8)
    finally:
        pq_mod.REFINE_ON_HOST = True
    np.testing.assert_array_equal(i_h, i_d)
    np.testing.assert_allclose(s_h, s_d, rtol=1e-5, atol=1e-5)


def test_decode_paths_agree(data):
    corpus, queries = data
    idx = PQIndex(corpus, m=8, n_iters=6)
    s1, i1 = idx.search(queries, k=10, decode="onehot")
    s2, i2 = idx.search(queries, k=10, decode="gather")
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6, atol=1e-6)


def test_sharded_matches_single_device(data):
    corpus, queries = data
    mesh = make_mesh()   # all 8 virtual devices
    single = PQIndex(corpus, m=8, n_iters=6)
    sharded = PQIndex(corpus, m=8, n_iters=6, mesh=mesh)
    s1, i1 = single.search(queries, k=10)
    s2, i2 = sharded.search(queries, k=10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6, atol=1e-6)


def test_multi_tile_scan(data):
    """Corpus spanning several PQ tiles: indices stay global."""
    corpus, queries = data
    rng = np.random.default_rng(11)
    big = np.concatenate(
        [corpus] * ((2 * PQ_TILE) // len(corpus) + 1))[: 2 * PQ_TILE + 37]
    big += 1e-3 * rng.standard_normal(big.shape).astype(np.float32)
    idx = PQIndex(big, m=8, n_iters=4, train_sample=2048, seed=3)
    s, i = idx.search(queries, k=5)
    assert i.min() >= 0 and i.max() < len(big)
    # scores non-increasing per row
    assert np.all(np.diff(s, axis=1) <= 1e-6)


def test_search_stream_matches_search(data):
    corpus, queries = data
    idx = PQIndex(corpus, m=8, n_iters=6)
    batches = [queries[:4], queries[4:7], queries[7:]]
    got = list(idx.search_stream(batches, k=7, depth=2))
    assert len(got) == 3
    for q, (s, i) in zip(batches, got):
        s1, i1 = idx.search(q, k=7)
        np.testing.assert_array_equal(i, i1)
        np.testing.assert_allclose(s, s1, rtol=1e-6)


def test_reconstruction_mse_drops_with_m(data):
    corpus, _ = data
    lo = PQIndex(corpus, m=8, n_iters=6).reconstruction_mse(corpus[:200])
    hi = PQIndex(corpus, m=16, n_iters=6).reconstruction_mse(corpus[:200])
    assert hi < lo


def test_ids_and_validation(data):
    corpus, queries = data
    ids = [f"d{j}" for j in range(len(corpus))]
    idx = PQIndex(corpus, m=8, n_iters=4, ids=ids)
    _, rows = idx.search_ids(queries, k=3)
    assert all(r.startswith("d") for row in rows for r in row)

    with pytest.raises(ValueError, match="not divisible"):
        PQIndex(corpus, m=24)             # 32 % 24 != 0
    with pytest.raises(ValueError, match="multiple of 8"):
        PQIndex(corpus[:, :30], m=10)
    with pytest.raises(ValueError, match="keep_rows"):
        idx.search(queries, k=3, refine_factor=2)
    with pytest.raises(ValueError, match="ids length"):
        PQIndex(corpus, m=8, ids=["a"])
    with pytest.raises(ValueError, match="cos_sim/dot_score"):
        idx.search(queries, k=3, score="euclid_score")
    with pytest.raises(ValueError, match="unknown decode"):
        idx.search(queries, k=3, decode="magic")
    with pytest.raises(ValueError, match=r"need ≥|need >=|need"):
        PQIndex(corpus[:100], m=8)        # fewer docs than centroids

    # pre-trained codebooks are adoptable (small corpora)
    reuse = PQIndex(corpus[:100], m=8, codebooks=idx.codebooks)
    s, i = reuse.search(queries, k=3)
    assert i.shape == (len(queries), 3)
    with pytest.raises(ValueError, match="codebooks shape"):
        PQIndex(corpus[:100], m=8,
                codebooks=np.zeros((8, 16, 4), np.float32))


def test_k_clamped_to_n(data):
    corpus, queries = data
    idx = PQIndex(corpus[:300], m=8, n_iters=4)
    s, i = idx.search(queries, k=2048)
    assert s.shape == (len(queries), 300)


# ---------------- Retriever / persistence integration ----------------

class _HashEncoder:
    def encode(self, texts):
        from helpers import hash_embed

        return hash_embed(list(texts))


def _many_docs(n=300):
    topics = ["cat", "dog", "pasta", "plane", "river"]
    return [f"{topics[i % len(topics)]} document number {i}"
            for i in range(n)]


def test_retriever_pq_build_save_load(tmp_path):
    from qst_tpu.retrieval import Retriever

    docs = _many_docs()
    r = Retriever(_HashEncoder(), index_dtype="pq", pq_m=16)
    r.build(docs, ids=[f"d{i}" for i in range(len(docs))])
    before = r.search(["a cat rests"], k=5, return_texts=True)
    assert before[0][0][2].startswith("cat")

    r.save(str(tmp_path / "idx"))
    import os
    assert os.path.isfile(tmp_path / "idx" / "pq_codes.npy")
    assert not os.path.isfile(tmp_path / "idx" / "embeddings.npy")

    r2 = Retriever(_HashEncoder(), index_dtype="pq").load(
        str(tmp_path / "idx"))
    after = r2.search(["a cat rests"], k=5, return_texts=True)
    assert [h[0] for h in before[0]] == [h[0] for h in after[0]]
    np.testing.assert_allclose([h[1] for h in before[0]],
                               [h[1] for h in after[0]], rtol=1e-5)

    # dtype cross-loading is rejected both ways
    from qst_tpu.retrieval import load_index

    with pytest.raises(ValueError, match="product-quantized"):
        load_index(str(tmp_path / "idx"), dtype="bfloat16")
    r3 = Retriever(_HashEncoder()).build(docs[:5])
    r3.save(str(tmp_path / "f32"))
    with pytest.raises(ValueError, match="product-quantized"):
        load_index(str(tmp_path / "f32"), dtype="pq")


def test_retriever_pq_search_stream(tmp_path):
    from qst_tpu.retrieval import Retriever

    docs = _many_docs()
    r = Retriever(_HashEncoder(), index_dtype="pq", pq_m=16).build(docs)
    got = list(r.search_stream([["a dog runs"], ["pasta dish"]], k=3))
    assert len(got) == 2 and len(got[0][0]) == 3
    # streaming path is PQ-only (no refine) — ids must still be valid
    assert all(isinstance(h[0], int) for h in got[0][0])


def test_retriever_pq_to_updatable():
    from qst_tpu.retrieval import Retriever

    docs = _many_docs()
    r = Retriever(_HashEncoder(), index_dtype="pq", pq_m=16).build(docs)
    r.to_updatable(capacity=1024)
    assert r.index.n_docs == len(docs)
    hits = r.search(["a plane flies"], k=3)
    assert len(hits[0]) == 3


def test_index_cli_pq_build_and_query(tmp_path, capsys):
    """--index_dtype pq persists codes+codebooks+refine rows; query
    reloads them without retraining."""
    import json as _json
    import os

    from qst_tpu.cli import index_main

    texts = str(tmp_path / "docs.txt")
    topics = ["cat", "dog", "pasta", "plane", "river"]
    with open(texts, "w") as f:
        for i in range(300):
            f.write(f"{topics[i % 5]} doc number {i}\n")
    idx_dir = str(tmp_path / "pqidx")
    rc = index_main.main(["build", "--texts", texts, "--index_dir", idx_dir,
                          "--encoder_preset", "tiny",
                          "--index_dtype", "pq", "--pq_m", "8"])
    assert rc == 0
    codes = np.load(os.path.join(idx_dir, "pq_codes.npy"))
    assert codes.dtype == np.uint8 and codes.shape == (300, 8)
    with open(os.path.join(idx_dir, "index_meta.json")) as f:
        meta = _json.load(f)
    assert meta["dtype"] == "pq" and meta["m"] == 8 and meta["refine"]

    rc = index_main.main(["query", "--index_dir", idx_dir,
                          "--encoder_preset", "tiny", "--index_dtype", "pq",
                          "--queries", "a cat on a rug", "--k", "2"])
    assert rc == 0
    payload = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(payload["hits"]) == 2


def test_from_chunks_matches_array_build(data):
    """Streamed build == one-shot build (same sample ⇒ same codebooks ⇒
    same codes ⇒ same searches)."""
    corpus, queries = data
    # train_sample covers the corpus: both builds train on all rows in the
    # same order with the same key, so codebooks are bit-identical
    one = PQIndex(corpus, m=8, n_iters=6, train_sample=1024)
    chunks = [corpus[i:i + 150] for i in range(0, len(corpus), 150)]
    streamed = PQIndex.from_chunks(iter(chunks), m=8, n_iters=6,
                                   train_sample=1024)
    assert streamed.n_docs == len(corpus)
    s1, i1 = one.search(queries, k=10)
    s2, i2 = streamed.search(queries, k=10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)

    with pytest.raises(ValueError, match="need"):
        PQIndex.from_chunks(iter([corpus[:100]]), m=8)


def test_rotation_roundtrip_and_recall(data, tmp_path):
    """rotate=True quantizes in a rotated basis; persistence restores it
    (same ids/scores after reload), and refined scores stay true cosines
    in the ORIGINAL basis."""
    corpus, queries = data
    rot = PQIndex(corpus, m=8, n_iters=6, keep_rows=True, rotate=True,
                  seed=3)
    assert rot._rotation is not None
    # rotation is orthogonal
    r = np.asarray(rot._rotation)
    np.testing.assert_allclose(r @ r.T, np.eye(r.shape[0]), atol=1e-5)

    s, i = rot.search(queries, k=10, refine_factor=8)
    cn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    golden = qn @ cn.T
    np.testing.assert_allclose(s, np.take_along_axis(golden, i, axis=1),
                               rtol=2e-2, atol=2e-2)

    # persistence: save through a Retriever-shaped artifact dir
    from qst_tpu.retrieval import Retriever

    rr = Retriever(_HashEncoder(), index_dtype="pq", pq_m=16,
                   pq_rotate=True)
    docs = _many_docs()
    rr.build(docs)
    before = rr.search(["a cat rests"], k=5)
    rr.save(str(tmp_path / "rotidx"))
    import os
    assert os.path.isfile(tmp_path / "rotidx" / "pq_rotation.npy")
    r2 = Retriever(_HashEncoder(), index_dtype="pq").load(
        str(tmp_path / "rotidx"))
    after = r2.search(["a cat rests"], k=5)
    assert [h[0] for h in before[0]] == [h[0] for h in after[0]]
    np.testing.assert_allclose([h[1] for h in before[0]],
                               [h[1] for h in after[0]], rtol=1e-5)


def test_rotation_from_chunks(data):
    corpus, queries = data
    one = PQIndex(corpus, m=8, n_iters=6, train_sample=1024, rotate=True)
    chunks = [corpus[i:i + 150] for i in range(0, len(corpus), 150)]
    streamed = PQIndex.from_chunks(iter(chunks), m=8, n_iters=6,
                                   train_sample=1024, rotate=True)
    s1, i1 = one.search(queries, k=10)
    s2, i2 = streamed.search(queries, k=10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_int8_refine_rows(data, tmp_path):
    """keep_rows='int8' halves refine-row bytes; refined ranking must
    match the bf16-row ranking on clustered data (int8-level score
    noise), and the rows persist/reload verbatim."""
    corpus, queries = data
    bf = PQIndex(corpus, m=8, n_iters=6, keep_rows=True)
    i8 = PQIndex(corpus, m=8, n_iters=6, keep_rows="int8")
    assert i8._refine_rows.dtype == np.int8
    assert i8._refine_rows.nbytes * 2 == bf._refine_rows.nbytes
    s_b, i_b = bf.search(queries, k=10, refine_factor=8)
    s_i, i_i = i8.search(queries, k=10, refine_factor=8)
    # D=32 clusters hold many near-ties, so int8-level noise legitimately
    # swaps a tail rank or two; the atol cosine check below is the real
    # correctness pin
    overlap = np.mean([len(set(a) & set(b)) / 10.0
                       for a, b in zip(i_b, i_i)])
    assert overlap >= 0.8
    np.testing.assert_allclose(s_i, np.sort(s_i, axis=1)[:, ::-1])
    # int8 refined scores are cosines up to quantization noise
    np.testing.assert_allclose(
        np.take_along_axis(
            (queries / np.linalg.norm(queries, axis=1, keepdims=True))
            @ (corpus / np.linalg.norm(corpus, axis=1,
                                       keepdims=True)).T, i_i, axis=1),
        s_i, atol=0.05)

    with pytest.raises(ValueError, match="keep_rows"):
        PQIndex(corpus, m=8, keep_rows="float64")

    # round-trip through from_codes with int8 rows (the reload path)
    re = PQIndex.from_codes(np.asarray(i8.codes)[:len(corpus)],
                            i8.codebooks, refine_rows=i8._refine_rows)
    s_r, i_r = re.search(queries, k=10, refine_factor=8)
    np.testing.assert_array_equal(i_r, i_i)
    np.testing.assert_allclose(s_r, s_i, rtol=1e-6)
    # f32 export de-quantizes
    rows = re.refine_rows_f32()
    assert rows.dtype == np.float32 and abs(
        np.linalg.norm(rows[0]) - 1.0) < 0.05


def test_memmap_refine_rows(data, tmp_path):
    """Refine rows may live on DISK (np.memmap): host RAM holds nothing,
    the candidate gather reads only the touched rows."""
    corpus, queries = data
    pq = PQIndex(corpus, m=8, n_iters=6, keep_rows=True)
    path = str(tmp_path / "rows.f32")
    mm = np.memmap(path, dtype=np.float32, mode="w+", shape=corpus.shape)
    mm[:] = np.asarray(pq._refine_rows, np.float32)
    mm.flush()
    ro = np.memmap(path, dtype=np.float32, mode="r", shape=corpus.shape)
    disk = PQIndex.from_codes(np.asarray(pq.codes)[:len(corpus)],
                              pq.codebooks, refine_rows=ro)
    s1, i1 = pq.search(queries, k=10, refine_factor=8)
    s2, i2 = disk.search(queries, k=10, refine_factor=8)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-5)


def test_pallas_backend_matches_xla(data):
    """The fused-path backend (decode → pallas_topk_local per super-tile,
    interpret-mode kernels on CPU) returns the XLA scan's results."""
    corpus, queries = data
    idx = PQIndex(corpus, m=8, n_iters=6)
    s_x, i_x = idx.search(queries, k=10, backend="xla")
    s_p, i_p = idx.search(queries, k=10, backend="pallas")
    np.testing.assert_array_equal(i_p, i_x)
    np.testing.assert_allclose(s_p, s_x, rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match="unknown backend"):
        idx.search(queries, k=3, backend="magic")


def test_pallas_backend_multi_super_tile(data, monkeypatch):
    """Force several super-tiles so the cross-tile merge path runs."""
    import qst_tpu.retrieval.pq as pq_mod

    corpus, queries = data
    big = np.concatenate([corpus] * 12)[: 2 * PQ_TILE + 100]
    rng = np.random.default_rng(5)
    big = big + 1e-3 * rng.standard_normal(big.shape).astype(np.float32)
    idx = PQIndex(big, m=8, n_iters=4, train_sample=2048)
    monkeypatch.setattr(pq_mod, "PQ_SUPER_TILE", PQ_TILE)
    s_p, i_p = idx.search(queries, k=7, backend="pallas")
    s_x, i_x = idx.search(queries, k=7, backend="xla")
    np.testing.assert_array_equal(i_p, i_x)
    np.testing.assert_allclose(s_p, s_x, rtol=1e-5, atol=1e-6)


def test_sharded_pallas_backend_matches_xla(data):
    """The fused path per shard under shard_map (interpret-mode kernels on
    the CPU mesh) must agree with the sharded XLA scan."""
    corpus, queries = data
    mesh = make_mesh()
    idx = PQIndex(corpus, m=8, n_iters=6, mesh=mesh)
    s_x, i_x = idx.search(queries, k=10, backend="xla")
    s_p, i_p = idx.search(queries, k=10, backend="pallas")
    np.testing.assert_array_equal(i_p, i_x)
    np.testing.assert_allclose(s_p, s_x, rtol=1e-5, atol=1e-6)


def test_anisotropic_training(data):
    """eta > 0 trains score-aware codebooks: reconstruction error ALONG
    the datapoint (the component that moves dot-product scores) drops
    relative to classic training, and the anisotropic assignment matches
    its numpy golden."""
    from qst_tpu.retrieval.pq import pq_encode

    corpus, queries = data
    classic = PQIndex(corpus, m=8, n_iters=8, seed=2)
    aniso = PQIndex(corpus, m=8, n_iters=8, seed=2, anisotropic=4.0)
    assert aniso._eta == 4.0

    def parallel_err(idx):
        cb = np.asarray(idx.codebooks)
        codes = np.asarray(pq_encode(jnp.asarray(corpus), idx.codebooks,
                                     eta=idx._eta))
        m, _, ds = cb.shape
        x = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
        xs = x.reshape(len(x), m, ds)
        recon = np.take_along_axis(
            cb[None], codes[:, :, None, None], axis=2).squeeze(2)
        # per-subspace parallel component of the error
        return float(np.mean(np.sum(xs * (xs - recon), axis=2) ** 2))

    assert parallel_err(aniso) < parallel_err(classic)

    # numpy golden of the anisotropic assignment rule
    cb = np.asarray(aniso.codebooks)
    m, K, ds = cb.shape
    x = corpus[:50] / np.linalg.norm(corpus[:50], axis=1, keepdims=True)
    xs = x.reshape(50, m, ds)
    dots = np.einsum("bmd,mkd->bmk", xs, cb)
    vv = np.sum(xs * xs, axis=2)[:, :, None]
    cc = np.sum(cb * cb, axis=2)[None]
    fit = dots - 0.5 * cc - 0.5 * 4.0 * (vv - dots) ** 2
    golden = np.argmax(fit, axis=2)
    got = np.asarray(pq_encode(jnp.asarray(corpus[:50]), aniso.codebooks,
                               eta=4.0))
    # compare achieved fit (ties legal)
    np.testing.assert_allclose(
        np.take_along_axis(fit, got[:, :, None].astype(np.int64),
                           axis=2).squeeze(2),
        np.take_along_axis(fit, golden[:, :, None], axis=2).squeeze(2),
        rtol=1e-4, atol=1e-5)

    with pytest.raises(ValueError, match="anisotropic"):
        PQIndex(corpus, m=8, anisotropic=-1.0)

    # search works over the anisotropic index
    s, i = aniso.search(queries, k=5)
    assert i.shape == (len(queries), 5)


def test_search_stream_with_refine(data):
    corpus, queries = data
    idx = PQIndex(corpus, m=8, n_iters=6, keep_rows=True)
    batches = [queries[:4], queries[4:]]
    got = list(idx.search_stream(batches, k=6, depth=2, refine_factor=8))
    for q, (s, i) in zip(batches, got):
        s1, i1 = idx.search(q, k=6, refine_factor=8)
        np.testing.assert_array_equal(i, i1)
        np.testing.assert_allclose(s, s1, rtol=1e-6)
    with pytest.raises(ValueError, match="keep_rows"):
        list(PQIndex(corpus, m=8, n_iters=4).search_stream(
            batches, k=3, refine_factor=4))


def test_sharded_with_rotation_matches_single(data):
    """Rotation + mesh sharding compose: queries rotate before dispatch,
    codes shard after rotated encoding — parity with single-device."""
    corpus, queries = data
    mesh = make_mesh()
    single = PQIndex(corpus, m=8, n_iters=6, rotate=True, seed=4)
    sharded = PQIndex(corpus, m=8, n_iters=6, rotate=True, seed=4,
                      mesh=mesh)
    s1, i1 = single.search(queries, k=10)
    s2, i2 = sharded.search(queries, k=10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6, atol=1e-6)
