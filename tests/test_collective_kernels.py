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
    ring_all_gather,
    ring_all_reduce,
    ring_all_reduce_bidir,
    ring_reduce_scatter,
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


def _run_bidir(x, mesh):
    f = jax.shard_map(lambda v: ring_all_reduce_bidir(v, "data"), mesh=mesh,
                      in_specs=P("data"), out_specs=P("data"),
                      check_vma=False)
    return np.asarray(jax.jit(f)(x))


def test_bidir_ring_matches_psum_bitexact_int32():
    """Both-directions ring all-reduce == psum bit-for-bit (each
    chunk's halves travel opposite ways; the reassembly must be
    exact)."""
    mesh = _mesh()
    x = jnp.arange(N_DEV * 16 * 128, dtype=jnp.int32).reshape(N_DEV * 16,
                                                              128)
    assert (_run_bidir(x, mesh) == _run_psum(x, mesh)).all()


def test_bidir_ring_matches_psum_bitexact_f32_exact_values():
    mesh = _mesh()
    r = np.random.default_rng(4)
    x = jnp.asarray(
        r.integers(-512, 512, size=(N_DEV * 8, 128)) / 256.0, jnp.float32)
    got, want = _run_bidir(x, mesh), _run_psum(x, mesh)
    assert (got.view(np.int32) == want.view(np.int32)).all()


def test_bidir_ring_pads_awkward_shapes():
    mesh = _mesh()
    r = np.random.default_rng(5)
    for shape in [(N_DEV * 8, 3, 7), (N_DEV * 8, 50), (N_DEV * 8,)]:
        x = jnp.asarray(r.integers(-100, 100, size=shape), jnp.int32)
        got, want = _run_bidir(x, mesh), _run_psum(x, mesh)
        assert (got == want).all(), shape


def test_bidir_ring_race_detector_clean():
    """Two independent credit streams (one per direction) keep the
    interpreter's race detector quiet."""
    from jax.experimental.pallas import tpu as pltpu

    mesh = _mesh()
    x = jnp.arange(N_DEV * 8 * 128, dtype=jnp.int32).reshape(N_DEV * 8, 128)
    f = jax.shard_map(
        lambda v: ring_all_reduce_bidir(
            v, "data", interpret=pltpu.InterpretParams(detect_races=True)),
        mesh=mesh, in_specs=P("data"), out_specs=P("data"), check_vma=False)
    got = np.asarray(jax.jit(f)(x))
    assert (got == _run_psum(x, mesh)).all()


def test_bidir_ring_two_devices():
    """n=2 degenerate ring: left == right neighbour, both directions
    share the single link pair; the slot/credit machinery must still
    balance (drain == step count)."""
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    x = jnp.arange(2 * 8 * 128, dtype=jnp.int32).reshape(2 * 8, 128)
    assert (_run_bidir(x, mesh) == _run_psum(x, mesh)).all()


def test_reduce_scatter_matches_psum_scatter_bitexact():
    """ring_reduce_scatter == lax.psum_scatter(tiled) bit-for-bit:
    device i keeps exactly the summed i-th leading block (the ZeRO-2
    gradient primitive)."""
    mesh = _mesh()
    r = np.random.default_rng(6)
    # local shard shape[0] (global / N_DEV) must itself divide by the
    # ring size — the same contract lax.psum_scatter(tiled) imposes
    for shape in [(N_DEV * 16, 128), (N_DEV * 8, 3, 7), (N_DEV * 8,)]:
        x = jnp.asarray(r.integers(-100, 100, size=shape), jnp.int32)

        def rs(v):
            return ring_reduce_scatter(v, "data")

        def want_fn(v):
            return lax.psum_scatter(v, "data", scatter_dimension=0,
                                    tiled=True)

        got = np.asarray(jax.jit(jax.shard_map(
            rs, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
            check_vma=False))(x))
        want = np.asarray(jax.jit(jax.shard_map(
            want_fn, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
            check_vma=False))(x))
        assert (got == want).all(), shape


def test_reduce_scatter_rejects_indivisible_leading_axis():
    mesh = _mesh()
    x = jnp.ones((N_DEV * 8 + 8, 4), jnp.float32)
    with pytest.raises(ValueError, match="divisible by the ring size"):
        jax.jit(jax.shard_map(
            lambda v: ring_reduce_scatter(v, "data"), mesh=mesh,
            in_specs=P("data"), out_specs=P("data"), check_vma=False))(x)


def test_all_gather_matches_lax_all_gather_bitexact():
    """ring_all_gather == lax.all_gather(tiled) bit-for-bit (the ZeRO
    param-update primitive)."""
    mesh = _mesh()
    r = np.random.default_rng(7)
    for shape in [(N_DEV * 8, 128), (N_DEV * 2, 3, 5), (N_DEV * 8,)]:
        x = jnp.asarray(r.integers(-100, 100, size=shape), jnp.int32)

        got = np.asarray(jax.jit(jax.shard_map(
            lambda v: ring_all_gather(v, "data"), mesh=mesh,
            in_specs=P("data"), out_specs=P("data"),
            check_vma=False))(x))
        want = np.asarray(jax.jit(jax.shard_map(
            lambda v: lax.all_gather(v, "data", axis=0, tiled=True),
            mesh=mesh, in_specs=P("data"), out_specs=P("data"),
            check_vma=False))(x))
        assert (got == want).all(), shape


def test_rs_then_ag_composes_to_all_reduce():
    """reduce-scatter |> all-gather == all-reduce — the decomposition
    ZeRO-2 rides (grads reduce-scatter down; params all-gather up)."""
    mesh = _mesh()
    x = jnp.arange(N_DEV * 16 * 128, dtype=jnp.int32).reshape(N_DEV * 16,
                                                              128)

    def rs_ag(v):
        return ring_all_gather(ring_reduce_scatter(v, "data"), "data")

    got = np.asarray(jax.jit(jax.shard_map(
        rs_ag, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
        check_vma=False))(x))
    assert (got == _run_psum(x, mesh)).all()


def test_rs_ag_race_detector_clean():
    from jax.experimental.pallas import tpu as pltpu

    mesh = _mesh()
    ip = pltpu.InterpretParams(detect_races=True)
    x = jnp.arange(N_DEV * 8 * 128, dtype=jnp.int32).reshape(N_DEV * 8, 128)

    def rs_ag(v):
        return ring_all_gather(
            ring_reduce_scatter(v, "data", interpret=ip), "data",
            interpret=ip)

    got = np.asarray(jax.jit(jax.shard_map(
        rs_ag, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
        check_vma=False))(x))
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
