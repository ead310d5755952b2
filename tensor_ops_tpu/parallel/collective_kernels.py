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


def _bidir_ring_kernel(x_ref, out_ref, comm_cw, comm_ccw, send_cw, recv_cw,
                       send_ccw, recv_ccw, free_cw, free_ccw, *, n: int,
                       axis_name: str, phase: str):
    """Bidirectional ring over (n, 2, R2, 128) buffers: half 0 of every
    chunk travels clockwise (to the RIGHT neighbour), half 1 travels
    counter-clockwise — both ICI directions of the ring link carry
    traffic every step (~2x link utilization over the one-way ring).
    The two directions are independent streams: separate comm slots,
    DMA semaphores, and credit semaphores; each step STARTS both RDMAs
    before waiting either, so the sends overlap on the wire.

    ``phase``:
      'ar' — fused all-reduce: n-1 reduce-scatter steps then n-1
             all-gather steps (2(n-1) total, moving 2(n-1)/n of the
             buffer per direction).
      'rs' — reduce-scatter only (n-1 steps); chunk ``me`` ends fully
             reduced on device ``me`` (``lax.psum_scatter`` layout).
      'ag' — all-gather only (n-1 steps); starts from out[me] = x.

    Index math per direction is the proven one-way ring's with the
    relative offsets negated for ccw (mirror symmetry); the rs layout
    uses offset -1 so the owned chunk is ``me`` itself."""
    i32 = lambda v: jnp.asarray(v, jnp.int32)
    nn = i32(n)
    me = i32(lax.axis_index(axis_name))
    right = lax.rem(me + i32(1), nn)
    left = lax.rem(me + nn - i32(1), nn)
    n_steps = 2 * (n - 1) if phase == "ar" else (n - 1)

    if phase == "ag":
        # start with only the local shard in place — the rotation fills
        # the rest (garbage elsewhere is overwritten, never read)
        out_ref[me] = x_ref[...]
    else:
        out_ref[...] = x_ref[...]

    def step(s, _):
        s = i32(s)
        slot = lax.rem(s, i32(2))
        if phase == "ar":
            is_p1 = s < nn - 1
            s2 = s - (nn - i32(1))
            cw_send = jnp.where(is_p1,
                                lax.rem(me - s + i32(2) * nn, nn),
                                lax.rem(me + i32(1) - s2 + i32(2) * nn, nn))
            cw_recv = jnp.where(is_p1,
                                lax.rem(me - s - i32(1) + i32(2) * nn, nn),
                                lax.rem(me - s2 + i32(2) * nn, nn))
            accum = is_p1
        elif phase == "rs":
            cw_send = lax.rem(me - s - i32(1) + i32(2) * nn, nn)
            cw_recv = lax.rem(me - s - i32(2) + i32(2) * nn, nn)
            accum = jnp.bool_(True)
        else:  # ag
            cw_send = lax.rem(me - s + i32(2) * nn, nn)
            cw_recv = lax.rem(me - s - i32(1) + i32(2) * nn, nn)
            accum = jnp.bool_(False)
        # ccw mirrors cw: me -> -me relative offsets (2n - (x - me) + me)
        ccw_send = lax.rem(i32(2) * me + i32(2) * nn - cw_send, nn)
        ccw_recv = lax.rem(i32(2) * me + i32(2) * nn - cw_recv, nn)

        @pl.when(s >= 2)
        def _():
            pltpu.semaphore_wait(free_cw, 1)
            pltpu.semaphore_wait(free_ccw, 1)

        rd_cw = pltpu.make_async_remote_copy(
            src_ref=out_ref.at[cw_send, 0],
            dst_ref=comm_cw.at[slot],
            send_sem=send_cw.at[slot],
            recv_sem=recv_cw.at[slot],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rd_ccw = pltpu.make_async_remote_copy(
            src_ref=out_ref.at[ccw_send, 1],
            dst_ref=comm_ccw.at[slot],
            send_sem=send_ccw.at[slot],
            recv_sem=recv_ccw.at[slot],
            device_id=left,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rd_cw.start()
        rd_ccw.start()  # both directions in flight before either wait

        rd_cw.wait()
        got = comm_cw[slot]
        out_ref[cw_recv, 0] = jnp.where(accum, out_ref[cw_recv, 0] + got,
                                        got)
        # my cw comm slot is written by LEFT — credit it
        pltpu.semaphore_signal(free_cw, inc=1, device_id=left,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)

        rd_ccw.wait()
        got = comm_ccw[slot]
        out_ref[ccw_recv, 1] = jnp.where(accum, out_ref[ccw_recv, 1] + got,
                                         got)
        # my ccw comm slot is written by RIGHT — credit it
        pltpu.semaphore_signal(free_ccw, inc=1, device_id=right,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        return 0

    lax.fori_loop(0, n_steps, step, 0)
    # drain: every receive signalled a credit; the `s >= 2` waits
    # consumed all but the last min(2, n_steps) per direction
    drain = min(2, n_steps)
    pltpu.semaphore_wait(free_cw, drain)
    pltpu.semaphore_wait(free_ccw, drain)


def _pad_to_halves(flat, n: int):
    """Pad a flat buffer so it views as (n, 2, R2, LANE) whole-tile
    chunks: every chunk is two sublane-aligned halves, one per ring
    direction."""
    half_elems = LANE * SUBLANE  # one (8, 128) tile per half minimum
    per_half = ((flat.size + n * 2 * half_elems - 1)
                // (n * 2 * half_elems)) * half_elems
    flat = jnp.pad(flat, (0, n * 2 * per_half - flat.size))
    return flat.reshape(n, 2, per_half // LANE, LANE)


def _bidir_call(buf, n: int, axis_name: str, phase: str, out_chunks: int,
                interpret, collective_id: int):
    kernel = functools.partial(_bidir_ring_kernel, n=n, axis_name=axis_name,
                               phase=phase)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_chunks,) + buf.shape[-3:],
                                       buf.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2,) + buf.shape[-2:], buf.dtype),  # cw comm slots
            pltpu.VMEM((2,) + buf.shape[-2:], buf.dtype),  # ccw comm slots
            pltpu.SemaphoreType.DMA((2,)),                 # cw send
            pltpu.SemaphoreType.DMA((2,)),                 # cw recv
            pltpu.SemaphoreType.DMA((2,)),                 # ccw send
            pltpu.SemaphoreType.DMA((2,)),                 # ccw recv
            pltpu.SemaphoreType.REGULAR,                   # cw credits
            pltpu.SemaphoreType.REGULAR,                   # ccw credits
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id),
        interpret=_interpret_params() if interpret is None else interpret,
    )(buf)


def ring_all_reduce_bidir(x, axis_name: str, *, interpret=None):
    """Sum ``x`` across ``axis_name`` with a BIDIRECTIONAL Pallas ring
    (call inside ``shard_map``) — drop-in for ``lax.psum``; each chunk's
    two halves travel opposite ring directions so both ICI links carry
    half the bytes (~2x the one-way ``ring_all_reduce`` utilization)."""
    n = lax.axis_size(axis_name)
    if n == 1:
        return x
    orig_shape, orig_dtype = x.shape, x.dtype
    buf = _pad_to_halves(x.reshape(-1), n)
    out = _bidir_call(buf, n, axis_name, "ar", n, interpret, 8)
    size = int(np.prod(orig_shape)) if orig_shape else 1
    return out.reshape(-1)[:size].reshape(orig_shape).astype(orig_dtype)


def ring_reduce_scatter(x, axis_name: str, *, interpret=None):
    """Bidirectional ring reduce-scatter (call inside ``shard_map``):
    drop-in for ``lax.psum_scatter(x, axis_name, scatter_dimension=0,
    tiled=True)`` — every device contributes its full ``x`` and keeps
    only the summed ``me``-th block of the leading axis (1/n of the
    all-reduce's output bytes; the ZeRO-2 gradient primitive).
    ``x.shape[0]`` must be divisible by the axis size."""
    n = lax.axis_size(axis_name)
    if n == 1:
        return x
    if x.shape[0] % n != 0:
        raise ValueError(
            f"ring_reduce_scatter splits the leading axis: shape[0] "
            f"({x.shape[0]}) must be divisible by the ring size ({n})")
    orig_dtype = x.dtype
    k = x.shape[0] // n
    part_shape = (k,) + x.shape[1:]
    part_size = int(np.prod(part_shape))
    # pad each leading-axis block separately so chunk c of the ring IS
    # block c of the psum_scatter contract
    parts = x.reshape((n, part_size))
    half_elems = LANE * SUBLANE
    per_half = ((part_size + 2 * half_elems - 1)
                // (2 * half_elems)) * half_elems
    parts = jnp.pad(parts, ((0, 0), (0, 2 * per_half - part_size)))
    buf = parts.reshape(n, 2, per_half // LANE, LANE)
    out = _bidir_call(buf, n, axis_name, "rs", n, interpret, 9)
    me = lax.axis_index(axis_name)
    mine = lax.dynamic_index_in_dim(out, me, axis=0, keepdims=False)
    return mine.reshape(-1)[:part_size].reshape(part_shape).astype(
        orig_dtype)


def ring_all_gather(x, axis_name: str, *, interpret=None):
    """Bidirectional ring all-gather (call inside ``shard_map``):
    drop-in for ``lax.all_gather(x, axis_name, axis=0, tiled=True)`` —
    every device contributes its local shard and receives the
    leading-axis concatenation in ring order (the ZeRO param-update
    all-gather primitive)."""
    n = lax.axis_size(axis_name)
    if n == 1:
        return x
    orig_dtype = x.dtype
    shard_size = int(np.prod(x.shape)) if x.shape else 1
    flat = x.reshape(-1)
    half_elems = LANE * SUBLANE
    per_half = ((shard_size + 2 * half_elems - 1)
                // (2 * half_elems)) * half_elems
    flat = jnp.pad(flat, (0, 2 * per_half - shard_size))
    buf = flat.reshape(2, per_half // LANE, LANE)
    out = _bidir_call(buf, n, axis_name, "ag", n, interpret, 10)
    shards = out.reshape(n, -1)[:, :shard_size]
    return shards.reshape((n * x.shape[0],) + x.shape[1:]).astype(
        orig_dtype)


def dp_megakernel_train_step(mesh, acts, *, lr, axis: str = "data",
                             precision: str = "default",
                             bidirectional: bool = True):
    """Data-parallel whole-step training: per-device the fused
    fwd+bwd+SGD megakernel (``fused_mlp_train_step``), cross-device the
    Pallas ring all-reduce — gradient reduction without leaving
    Pallas-land.  ``bidirectional=True`` (default) reduces over both
    ICI ring directions at once (``ring_all_reduce_bidir``, ~2x link
    utilization); ``False`` keeps the one-way ring.

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
    all_reduce = ring_all_reduce_bidir if bidirectional else ring_all_reduce

    def local_step(xb, yb, ws, bs):
        loss, new_ws, new_bs = fused_mlp_train_step(
            xb, yb, list(ws), list(bs), lr, list(acts), precision=precision)
        inv = 1.0 / n
        new_ws = tuple(all_reduce(w, axis) * inv for w in new_ws)
        new_bs = tuple(all_reduce(b, axis) * inv for b in new_bs)
        loss = lax.psum(loss, axis) * inv
        return loss, new_ws, new_bs

    shard = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(shard)
