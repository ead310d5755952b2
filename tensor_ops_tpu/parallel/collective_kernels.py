"""Hand-rolled Pallas TPU collectives: a ring all-reduce over ICI.

The framework's standard multi-chip path never writes collectives — XLA
emits them from shardings alone (SURVEY.md §2.5, the designed seam).
This module is the exception that proves the hardware story: a
bandwidth-optimal ring all-reduce (reduce-scatter phase + all-gather
phase, 2(n-1) steps moving 2(n-1)/n of the buffer per link) written
directly against the inter-chip RDMA primitives
(``pltpu.make_async_remote_copy``), used to compose data-parallel
gradient/parameter reduction with the whole-training-step megakernel
(``fused_mlp_train_step``) without leaving Pallas-land.

Flow control: a receiver frees a communication slot by signalling a
REGULAR semaphore back to its left neighbour; a sender consumes one
credit per send once the two slots have cycled.  This closes the
write-after-read race the bare double-buffer rotation has when one
neighbour runs ahead (guide: "Patterns: Ring Collectives").

Correctness gate (VERDICT round-1 item 4): under the TPU interpret mode
on the 8-device CPU mesh this all-reduce matches ``jax.lax.psum``
bit-for-bit for int32 and for exactly-representable f32 inputs
(``tests/test_collective_kernels.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8


def _interpret_params():
    if jax.default_backend() == "tpu":
        return False
    return pltpu.InterpretParams()


def _ring_kernel(x_ref, out_ref, comm, send_sem, recv_sem, free_sem, *,
                 n: int, axis_name: str):
    """Reduce-scatter + all-gather ring over axis-sharded (n, R, 128)
    buffers.  Chunk c is accumulated in ring order starting at device
    c+1 and lands fully reduced on device c after phase 1; phase 2
    rotates each reduced chunk around the ring."""
    i32 = lambda v: jnp.asarray(v, jnp.int32)  # index math stays int32
    nn = i32(n)
    me = i32(lax.axis_index(axis_name))
    right = lax.rem(me + i32(1), nn)
    left = lax.rem(me + nn - i32(1), nn)

    out_ref[...] = x_ref[...]

    def step(s, _):
        s = i32(s)
        slot = lax.rem(s, i32(2))
        is_p1 = s < nn - 1
        s2 = s - (nn - i32(1))
        send_idx = jnp.where(is_p1,
                             lax.rem(me - s + i32(2) * nn, nn),
                             lax.rem(me + i32(1) - s2 + i32(2) * nn, nn))
        recv_idx = jnp.where(is_p1,
                             lax.rem(me - s - i32(1) + i32(2) * nn, nn),
                             lax.rem(me - s2 + i32(2) * nn, nn))

        # flow control: once both slots have been used, each further
        # send needs a "slot freed" credit from the right neighbour
        @pl.when(s >= 2)
        def _():
            pltpu.semaphore_wait(free_sem, 1)

        rdma = pltpu.make_async_remote_copy(
            src_ref=out_ref.at[send_idx],
            dst_ref=comm.at[slot],
            send_sem=send_sem.at[slot],
            recv_sem=recv_sem.at[slot],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()

        received = comm[slot]
        current = out_ref[recv_idx]
        out_ref[recv_idx] = jnp.where(is_p1, current + received, received)

        # tell the left neighbour its send slot is consumable again
        pltpu.semaphore_signal(free_sem, inc=1, device_id=left,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        return 0

    lax.fori_loop(0, 2 * (n - 1), step, 0)
    # drain outstanding credits so the semaphore ends at zero (the
    # final two receives each signalled a credit nobody consumes)
    pltpu.semaphore_wait(free_sem, 2)


def ring_all_reduce(x, axis_name: str, *, interpret=None):
    """Sum ``x`` across ``axis_name`` with a Pallas ring (call inside
    ``shard_map``).  Drop-in for ``lax.psum(x, axis_name)``.

    The buffer is zero-padded and viewed as (n, rows, 128) so every
    chunk is a whole number of TPU tiles; padding contributes zeros to
    the sum and is stripped on return.
    """
    n = lax.axis_size(axis_name)
    if n == 1:
        return x
    orig_shape = x.shape
    orig_dtype = x.dtype
    flat = x.reshape(-1)
    chunk_elems = LANE * SUBLANE
    per_dev = ((flat.size + n * chunk_elems - 1) // (n * chunk_elems)) * chunk_elems
    flat = jnp.pad(flat, (0, n * per_dev - flat.size))
    buf = flat.reshape(n, per_dev // LANE, LANE)

    kernel = functools.partial(_ring_kernel, n=n, axis_name=axis_name)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(buf.shape, buf.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2,) + buf.shape[1:], buf.dtype),  # comm slots
            pltpu.SemaphoreType.DMA((2,)),                 # send
            pltpu.SemaphoreType.DMA((2,)),                 # recv
            pltpu.SemaphoreType.REGULAR,                   # slot credits
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=7),
        interpret=_interpret_params() if interpret is None else interpret,
    )(buf)
    return out.reshape(-1)[: np.prod(orig_shape) if orig_shape else 1].reshape(
        orig_shape).astype(orig_dtype)


def dp_megakernel_train_step(mesh, acts, *, lr, axis: str = "data",
                             precision: str = "default"):
    """Data-parallel whole-step training: per-device the fused
    fwd+bwd+SGD megakernel (``fused_mlp_train_step``), cross-device the
    Pallas ring all-reduce — gradient reduction without leaving
    Pallas-land.

    Averaging the megakernel's *updated* parameters across ranks is
    algebraically the mean-gradient SGD step: every rank computes
    ``w - lr * g_rank`` with ``g_rank`` the mean gradient over its
    equal-size local batch, so ``mean_rank(w - lr * g_rank)
    = w - lr * mean(g)`` — bit-for-the-math identical to one device
    stepping on the concatenated batch.

    Returns ``step(xb, yb, ws, bs) -> (loss, new_ws, new_bs)`` where
    ``xb``/``yb`` are globally batched (sharded over ``axis``) and the
    parameters are replicated.
    """
    from jax.sharding import PartitionSpec as P

    from ..ops.pallas_kernels import fused_mlp_train_step

    n = mesh.shape[axis]

    def local_step(xb, yb, ws, bs):
        loss, new_ws, new_bs = fused_mlp_train_step(
            xb, yb, list(ws), list(bs), lr, list(acts), precision=precision)
        inv = 1.0 / n
        new_ws = tuple(ring_all_reduce(w, axis) * inv for w in new_ws)
        new_bs = tuple(ring_all_reduce(b, axis) * inv for b in new_bs)
        loss = lax.psum(loss, axis) * inv
        return loss, new_ws, new_bs

    shard = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(shard)
