"""Test configuration: run JAX on CPU with a virtual 8-device mesh (the
multi-chip story without hardware — SURVEY.md §4) and float64 enabled for
tight parity bounds."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# NOTE: in axon-tunnel environments the sitecustomize pre-initializes JAX
# backends at interpreter start, which locks the CPU client to 1 device no
# matter what this file sets.  Launch pytest as
#   PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
#   XLA_FLAGS=--xla_force_host_platform_device_count=8 python -m pytest ...
# to get the virtual 8-device mesh; mesh tests skip themselves otherwise.

import jax  # noqa: E402

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
