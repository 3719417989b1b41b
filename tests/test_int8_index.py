"""int8-quantized ExactIndex: integer-exact scoring, backend/shard parity.

dtype="int8" stores the corpus unit-normalized under one global symmetric
scale at HALF the bf16 bytes (2× in-HBM capacity); queries quantize per call
with their own scale. Scores are computed exactly in the integer domain
(int8 values are exact in bf16; f32 accumulates sums < 2^24), so ranking is
deterministic w.r.t. the quantized vectors — these tests pin the scheme to
a numpy integer golden and prove all backends agree.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from qst_tpu.ops.topk_pallas import bucket_maxima
from qst_tpu.retrieval import ExactIndex


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(17)
    corpus = rng.standard_normal((500, 48)).astype(np.float32)
    queries = rng.standard_normal((13, 48)).astype(np.float32)
    return corpus, queries


def _int8_golden_scores(queries, corpus, score):
    """The quantization scheme replicated in numpy int64 (no rounding)."""
    cn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    cscale = 127.0 / np.abs(cn).max()
    cq = np.clip(np.round(cn * cscale), -127, 127).astype(np.int64)
    qf = (queries / np.linalg.norm(queries, axis=1, keepdims=True)
          if score == "cos_sim" else queries.astype(np.float64))
    qscale = 127.0 / np.abs(qf).max()
    qq = np.clip(np.round(qf * qscale), -127, 127).astype(np.int64)
    return (qq @ cq.T) / (qscale * cscale)


@pytest.mark.parametrize("score", ["cos_sim", "dot_score"])
def test_int8_matches_integer_golden(data, score):
    corpus, queries = data
    S = _int8_golden_scores(queries, corpus, score)
    want = np.sort(S, axis=1)[:, ::-1][:, :10]
    idx = ExactIndex(corpus, dtype="int8")
    s, i = idx.search(queries, k=10, score=score)
    # top-k scores match the integer golden's top-k...
    np.testing.assert_allclose(s, want, rtol=1e-5, atol=1e-7)
    # ...and every returned id carries ITS OWN golden score (exact ranking
    # modulo permutation of integer ties)
    np.testing.assert_allclose(s, np.take_along_axis(S, i, axis=1),
                               rtol=1e-5, atol=1e-7)


def test_int8_close_to_f32_ranking(data):
    """Quantization noise on 48-dim unit vectors must barely move top-10."""
    corpus, queries = data
    f32 = ExactIndex(corpus, normalize=True)
    q8 = ExactIndex(corpus, dtype="int8")
    _, i_f = f32.search(queries, k=10)
    _, i_q = q8.search(queries, k=10)
    recall = np.mean([len(set(a) & set(b)) / 10.0
                      for a, b in zip(i_f, i_q)])
    assert recall >= 0.9, f"int8 recall@10 vs f32 = {recall}"


def test_int8_pallas_backend_matches_xla(data):
    corpus, queries = data
    S = _int8_golden_scores(queries, corpus, "cos_sim")
    idx = ExactIndex(corpus, dtype="int8")
    s_x, i_x = idx.search(queries, k=10, backend="xla")
    s_p, i_p = idx.search(queries, k=10, backend="pallas")  # interpret on CPU
    np.testing.assert_allclose(s_p, s_x, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(s_p, np.take_along_axis(S, i_p, axis=1),
                               rtol=1e-5, atol=1e-7)


def test_int8_sharded_matches_single(data, mesh8):
    corpus, queries = data
    S = _int8_golden_scores(queries, corpus, "cos_sim")
    single = ExactIndex(corpus, dtype="int8")
    sharded = ExactIndex(corpus, dtype="int8", mesh=mesh8)
    s1, i1 = single.search(queries, k=7)
    s8, i8 = sharded.search(queries, k=7)
    np.testing.assert_allclose(s8, s1, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(s8, np.take_along_axis(S, i8, axis=1),
                               rtol=1e-5, atol=1e-7)


def test_int8_sharded_pallas_matches_xla(data, mesh8):
    corpus, queries = data
    sharded = ExactIndex(corpus, dtype="int8", mesh=mesh8)
    s_x, i_x = sharded.search(queries, k=7, backend="xla")
    s_p, i_p = sharded.search(queries, k=7, backend="pallas")
    np.testing.assert_allclose(s_p, s_x, rtol=1e-6, atol=1e-8)
    S = _int8_golden_scores(queries, corpus, "cos_sim")
    np.testing.assert_allclose(s_p, np.take_along_axis(S, i_p, axis=1),
                               rtol=1e-5, atol=1e-7)


def test_int8_validation(data):
    corpus, queries = data
    idx = ExactIndex(corpus, dtype="int8")
    with pytest.raises(ValueError, match="cos_sim/dot_score"):
        idx.search(queries, k=5, score="euclid_score")
    with pytest.raises(ValueError, match="too wide"):
        ExactIndex(np.ones((4, 2048), np.float32), dtype="int8")
    with pytest.raises(ValueError, match="int8 queries"):
        bucket_maxima(jnp.asarray(queries),
                      jnp.zeros((256, 48), jnp.int8), interpret=True)


def test_int8_search_stream_matches_search(data):
    corpus, queries = data
    idx = ExactIndex(corpus, dtype="int8")
    s0, i0 = idx.search(queries, k=5)
    outs = list(idx.search_stream([queries, queries], k=5, depth=2))
    assert len(outs) == 2
    for s, i in outs:
        np.testing.assert_allclose(s, s0, rtol=1e-6, atol=1e-8)
        np.testing.assert_array_equal(i, i0)
