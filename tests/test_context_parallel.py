"""Context-parallel attention on the 8-device mesh: both schemes must match
full attention exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from qst_tpu.core.meshes import make_mesh
from qst_tpu.parallel import (
    context_parallel_attention,
    full_attention,
    ring_attention,
)


@pytest.fixture(scope="module")
def mesh_ctx():
    import jax

    return make_mesh(data=8, model=1, devices=jax.devices())


@pytest.fixture
def qkv(rng):
    B, H, S, D = 2, 4, 64, 16  # S divisible by 8 shards
    mk = lambda: jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32))
    return mk(), mk(), mk()


def test_context_parallel_matches_full(mesh_ctx, qkv):
    q, k, v = qkv
    golden = np.asarray(full_attention(q, k, v))
    out = np.asarray(context_parallel_attention(q, k, v, mesh_ctx, axis="data"))
    np.testing.assert_allclose(out, golden, rtol=1e-5, atol=1e-5)


def test_ring_attention_matches_full(mesh_ctx, qkv):
    q, k, v = qkv
    golden = np.asarray(full_attention(q, k, v))
    out = np.asarray(ring_attention(q, k, v, mesh_ctx, axis="data"))
    np.testing.assert_allclose(out, golden, rtol=1e-5, atol=1e-5)


def test_ring_attention_output_stays_sharded(mesh_ctx, qkv):
    q, k, v = qkv
    out = ring_attention(q, k, v, mesh_ctx, axis="data")
    assert len(out.sharding.device_set) == 8  # seq-sharded like Q


def test_context_parallel_grad(mesh_ctx, qkv):
    """Both schemes must be differentiable (training long-doc encoders)."""
    q, k, v = qkv
    g = jax.grad(lambda x: ring_attention(x, k, v, mesh_ctx, "data").sum())(q)
    assert np.isfinite(np.asarray(g)).all()
