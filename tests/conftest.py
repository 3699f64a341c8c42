"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
(ring all-pairs, data-parallel training) is testable without TPU hardware
(SURVEY.md §4). Pallas kernels run in interpret mode on CPU.

NOTE: the environment pins JAX_PLATFORMS=axon (TPU tunnel); the in-process
``jax.config.update`` below is what actually forces the CPU platform.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from nbody_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8
    return make_mesh(8)
