"""Test harness: run the whole suite on a virtual 8-device CPU mesh.

This substitutes for a real TPU pod slice (SURVEY.md §4): XLA's CPU backend
with ``--xla_force_host_platform_device_count=8`` exercises every sharding,
collective, and pjit path without TPU hardware.
"""

import os

# Must be set before jax is imported anywhere. Force-override: the session
# environment may point JAX_PLATFORMS at a tunneled TPU; the test suite always
# runs on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The container's sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon latched; override the latched config value too.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs


@pytest.fixture(scope="session")
def mesh8(devices):
    from qst_tpu.core.meshes import make_mesh

    return make_mesh(data=4, model=2, devices=devices)


@pytest.fixture
def rng():
    return np.random.default_rng(14)
