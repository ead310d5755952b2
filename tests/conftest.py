"""Test configuration: force JAX onto a virtual 8-device CPU mesh (the
multi-chip story without hardware — SURVEY.md §4) with float64 enabled for
tight parity bounds.

In axon-tunnel environments a sitecustomize pre-initializes the TPU
backend at interpreter start and JAX_PLATFORMS=axon sits in the global
env, so plain env tweaks are too late/ignored; instead the platform is
switched through jax.config and the backend cache is cleared."""

import os

import jax
import jax._src.xla_bridge as _xb

if os.environ.get("TOPS_TEST_TPU") != "1":
    # the axon remote-compile hook must not see CPU-mesh compiles (TPU
    # interpret-mode programs hang/fail through it; found debugging the
    # ring-collective tests)
    os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    _xb._clear_backends()
    assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
# TOPS_TEST_TPU=1 leaves the ambient (TPU) backend in place: the whole
# suite then runs against real hardware (slow through a tunnel; multi-
# device tests skip themselves when only one chip is visible).

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402

import tensor_ops_tpu as T  # noqa: E402


@pytest.fixture(scope="session")
def nb():
    return T.NumpyBackend()


@pytest.fixture(scope="session")
def jb():
    return T.JaxBackend(dtype=jnp.float64)


@pytest.fixture(scope="session")
def backends(nb, jb):
    return [nb, jb]
