"""Pallas ring all-reduce (inter-chip RDMA collective) under the TPU
interpret mode on the virtual 8-device CPU mesh — VERDICT round-1 item 4:
bit-for-bit agreement with ``jax.lax.psum`` and dp-megakernel composition
with ``fused_mlp_train_step``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from tensor_ops_tpu.parallel.collective_kernels import (
    dp_megakernel_train_step,
    ring_all_reduce,
)

N_DEV = 8

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < N_DEV, reason="needs the 8-device CPU mesh")


def _mesh(axis="data"):
    return Mesh(np.array(jax.devices()[:N_DEV]), (axis,))


def _run_ring(x, mesh):
    f = jax.shard_map(lambda v: ring_all_reduce(v, "data"), mesh=mesh,
                      in_specs=P("data"), out_specs=P("data"),
                      check_vma=False)
    return np.asarray(jax.jit(f)(x))


def _run_psum(x, mesh):
    f = jax.shard_map(lambda v: lax.psum(v, "data"), mesh=mesh,
                      in_specs=P("data"), out_specs=P("data"),
                      check_vma=False)
    return np.asarray(jax.jit(f)(x))


def test_ring_matches_psum_bitexact_int32():
    mesh = _mesh()
    x = jnp.arange(N_DEV * 16 * 128, dtype=jnp.int32).reshape(N_DEV * 16, 128)
    got, want = _run_ring(x, mesh), _run_psum(x, mesh)
    assert (got == want).all()


def test_ring_matches_psum_bitexact_f32_exact_values():
    """f32 inputs that are exact in a few mantissa bits sum exactly in
    any association order, so ring == psum BIT-FOR-BIT."""
    mesh = _mesh()
    r = np.random.default_rng(0)
    x = jnp.asarray(
        r.integers(-512, 512, size=(N_DEV * 8, 128)) / 256.0, jnp.float32)
    got, want = _run_ring(x, mesh), _run_psum(x, mesh)
    assert got.dtype == np.float32
    assert (got.view(np.int32) == want.view(np.int32)).all()


def test_ring_random_f32_close():
    mesh = _mesh()
    r = np.random.default_rng(1)
    x = jnp.asarray(r.normal(size=(N_DEV * 4, 128)), jnp.float32)
    got, want = _run_ring(x, mesh), _run_psum(x, mesh)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_ring_pads_awkward_shapes():
    """Non-tile-multiple and non-2D payloads go through the zero-pad
    path; padding must not leak into the sum."""
    mesh = _mesh()
    r = np.random.default_rng(2)
    for shape in [(N_DEV * 8, 3, 7), (N_DEV * 8, 50), (N_DEV * 8,)]:
        x = jnp.asarray(r.integers(-100, 100, size=shape), jnp.int32)
        got, want = _run_ring(x, mesh), _run_psum(x, mesh)
        assert (got == want).all(), shape


def test_ring_race_detector_clean():
    """The credit-based flow control keeps the interpreter's race
    detector quiet (the bare 2-slot rotation without credits would
    WAR-race when one neighbour runs ahead)."""
    from jax.experimental.pallas import tpu as pltpu

    mesh = _mesh()
    x = jnp.arange(N_DEV * 8 * 128, dtype=jnp.int32).reshape(N_DEV * 8, 128)
    f = jax.shard_map(
        lambda v: ring_all_reduce(
            v, "data", interpret=pltpu.InterpretParams(detect_races=True)),
        mesh=mesh, in_specs=P("data"), out_specs=P("data"), check_vma=False)
    got = np.asarray(jax.jit(f)(x))
    assert (got == _run_psum(x, mesh)).all()


def test_dp_megakernel_matches_single_device_step():
    """dp megakernel step (local fused fwd+bwd+SGD + ring parameter
    mean) == one fused step on the concatenated batch: averaging the
    updated params IS the mean-gradient SGD step."""
    from tensor_ops_tpu.ops.pallas_kernels import fused_mlp_train_step

    mesh = _mesh()
    r = np.random.default_rng(3)
    dims = [16, 32, 10]
    acts = ["logistic", "identity"]
    ws = [jnp.asarray(r.normal(size=(dims[k + 1], dims[k])) * 0.3, jnp.float32)
          for k in range(2)]
    bs = [jnp.asarray(r.normal(size=(dims[k + 1],)) * 0.1, jnp.float32)
          for k in range(2)]
    B = N_DEV * 4
    xb = jnp.asarray(r.uniform(0, 1, size=(B, dims[0])), jnp.float32)
    yb = jnp.asarray(np.eye(dims[-1])[r.integers(0, dims[-1], size=B)],
                     jnp.float32)

    step = dp_megakernel_train_step(mesh, acts, lr=0.05)
    loss_dp, ws_dp, bs_dp = step(xb, yb, tuple(ws), tuple(bs))

    loss_1, ws_1, bs_1 = fused_mlp_train_step(
        xb, yb, list(ws), list(bs), 0.05, acts)

    assert np.isclose(float(loss_dp), float(loss_1), atol=1e-6)
    for a, b in zip(ws_dp, ws_1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-6)
    for a, b in zip(bs_dp, bs_1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-6)
