"""Pallas TPU kernels: fused linear+bias+activation layers and a
whole-MLP fused forward.

This is the rebuild's native-kernel layer — the role C BLAS plays under
the reference's hmatrix backend (``src/TensorOps/BLAS/HMat.hs`` reaching
``dgemm``/``dgemv``), redone for the MXU: one kernel computes
``act(x @ w.T + b)`` for a batch tile with the matmul on the MXU and the
bias+activation fused on the VPU (no HBM round-trip for the
pre-activation), and a whole-network variant keeps every ffLayer weight
resident in VMEM across the chain (total flagship weights ~1.1 MB << 16 MB
VMEM), so activations never touch HBM between layers.

Feature dims are padded to the 128-lane grid (the flagship's awkward
784/300/100/10 dims — SURVEY.md §7.3 hard part 5); padded output lanes are
masked to -inf before softmax so logits are exact.

Training uses ``jax.custom_vjp``: the backward matmuls
(``dz @ w``, ``dz.T @ x``) lower to ``lax.dot_general`` — also MXU — with
the activation derivative fused by XLA.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _f32_kernel_scope(fn):
    """Trace the wrapped pallas invocation with x64 disabled: under
    jax_enable_x64 the grid index maps emit i64 indices that Mosaic
    rejects (remote-compile HTTP 500); all these kernels are f32/bf16
    internally anyway, so narrowing the trace is semantics-preserving."""
    import functools as _ft

    @_ft.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.enable_x64(False):
            return fn(*args, **kwargs)

    return wrapped


def _interpret() -> bool:
    """Pallas interpret mode off-TPU so the same kernels run (slowly but
    exactly) under the CPU test mesh."""
    return jax.default_backend() != "tpu"


def _precision(name: str):
    return {
        "default": lax.Precision.DEFAULT,   # bf16 multiplies on the MXU (fast path)
        "highest": lax.Precision.HIGHEST,   # full f32 (parity suites)
    }[name]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _act_fn(name: str) -> Callable:
    if name == "logistic":
        return lambda z: 1.0 / (1.0 + jnp.exp(-z))
    if name == "relu":
        return lambda z: jnp.maximum(z, 0.0)
    if name == "tanh":
        return jnp.tanh
    if name == "identity":
        return lambda z: z
    raise ValueError(f"unknown activation {name!r}")


def _act_grad(name: str) -> Callable:
    """d act / d z expressed in terms of z."""
    if name == "logistic":
        def g(z):
            s = 1.0 / (1.0 + jnp.exp(-z))
            return s * (1.0 - s)
        return g
    if name == "relu":
        return lambda z: (z > 0).astype(z.dtype)
    if name == "tanh":
        return lambda z: 1.0 - jnp.tanh(z) ** 2
    if name == "identity":
        return lambda z: jnp.ones_like(z)
    raise ValueError(f"unknown activation {name!r}")


# ---------------------------------------------------------------------------
# single fused layer: act(x @ w.T + b)
# ---------------------------------------------------------------------------


def _linear_act_kernel(x_ref, w_ref, b_ref, y_ref, *rest,
                       act: str, save_z: bool, nk: int,
                       precision: str = "default"):
    """Tiled matmul with K-loop accumulation in a VMEM f32 scratch; bias +
    activation fused into the final K step (grid = (batch, out, k) with k
    innermost so the accumulator carries across sequential steps).

    The weight block arrives in its native ``(o, i)`` ffLayer layout and is
    contracted on its second axis — no transposed copy of the weight is
    ever materialized (dot_general drives the MXU either way)."""
    if save_z:
        z_ref, acc_ref = rest
    else:
        (acc_ref,) = rest
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(precision),
    )

    @pl.when(k == nk - 1)
    def _():
        z = acc_ref[:] + b_ref[:]
        if save_z:
            z_ref[:] = z
        y_ref[:] = _act_fn(act)(z).astype(y_ref.dtype)


def pick_tiles(B: int, K: int, O: int, save_z: bool = False,
               dtype=None, kernel: str = "linear") -> Tuple[int, int, int]:
    """Measured-cache lookup, then the static heuristic.

    A prior ``autotune.autotune_linear`` run for this exact
    (B, K, O, save_z, dtype, device kind) persisted its winner to the
    on-disk tile cache — that wins here (a dict probe at trace time,
    never a measurement).  Otherwise the heuristic from the on-device
    sweep (BENCH.md): 512^2 output tiles with the FULL contraction dim
    in one pass — the MXU streams the whole K extent without
    accumulator revisits — reach 186-188 TFLOP/s (94-95% of bf16 peak)
    at K=2048..4096, vs ~170 for 1024^2 tiles with a 512-deep K loop.
    Needs the raised VMEM limit (the 512xK input blocks are 4-8 MB
    each, double-buffered).  K beyond 8192 falls back to a 512-deep K
    loop to bound block size."""
    from .autotune import get_tuned

    dname = jnp.dtype(dtype).name if dtype is not None else "float32"
    # ``kernel`` keys variants with different VMEM/arithmetic profiles
    # (e.g. the int8-dequant "linear_w8") so a winner tuned on the f32
    # kernel is never silently adopted by a different kernel body
    tuned = get_tuned(kernel, B=B, K=K, O=O, save_z=int(save_z),
                      dtype=dname)
    if tuned is not None:
        return tuned
    tb = min(_round_up(B, 8), 512)
    to = min(_round_up(O, LANE), 512)
    tk = _round_up(K, LANE) if K <= 8192 else 512
    return tb, to, tk


@_f32_kernel_scope
def _fused_linear_padded(x, w, b, act: str, block_b: int, save_z: bool,
                         precision: str = "default", tiles=None):
    """x:(B,K) @ w:(O,K)^T + b:(1,O), all padded to tile multiples.
    ``tiles`` (the caller's full pick_tiles/autotune triple) keeps the
    padded-dim re-derivation from diverging from the tuned entry the
    caller padded for."""
    B, K = x.shape
    O = w.shape[0]
    if tiles is not None:
        block_b, block_o, block_k = tiles
    else:
        _, block_o, block_k = pick_tiles(B, K, O, save_z)
    nk = K // block_k
    grid = (B // block_b, O // block_o, nk)
    kernel = functools.partial(_linear_act_kernel, act=act, save_z=save_z,
                               nk=nk, precision=precision)
    y_spec = pl.BlockSpec((block_b, block_o), lambda i, j, k: (i, j),
                          memory_space=pltpu.VMEM)
    if save_z:
        out_shape = (jax.ShapeDtypeStruct((B, O), x.dtype),
                     jax.ShapeDtypeStruct((B, O), jnp.float32))
        out_specs = (y_spec, y_spec)
    else:
        # inference path emits a single output — no dead z block to DMA
        out_shape = jax.ShapeDtypeStruct((B, O), x.dtype)
        out_specs = y_spec
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, block_k), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_o), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((block_b, block_o), jnp.float32)],
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * O,
            bytes_accessed=(B * K + K * O + B * O) * 4,
            transcendentals=B * O if act in ("logistic", "tanh") else 0,
        ),
        # full-K input blocks are up to 8 MB each; raise Mosaic's default
        # VMEM budget so their double-buffering fits.  56 MB is a measured
        # sweet spot (189.5 TF): past ~64 MB Mosaic switches to a deeper
        # buffering strategy that LOSES ~15 TF (see BENCH.md sweep).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=56 * 1024 * 1024),
        interpret=_interpret(),
    )(x, w, b)
    return out if save_z else (out, None)


def _pad2(a, r0: int, r1: int):
    p0 = _round_up(a.shape[0], r0) - a.shape[0]
    p1 = _round_up(a.shape[1], r1) - a.shape[1]
    if p0 or p1:
        a = jnp.pad(a, ((0, p0), (0, p1)))
    return a


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_linear(x, w, b, act: str = "identity", precision: str = "default"):
    """``act(x @ w.T + b)`` as a fused Pallas kernel.

    x: (B, i), w: (o, i) (the reference ffLayer weight layout,
    ``FeedForward.hs:209-213``), b: (o,).  Differentiable via custom VJP.
    """
    y, _ = _fused_linear_fwd_impl(x, w, b, act, save_z=False,
                                  precision=precision)
    return y


def _fused_linear_fwd_impl(x, w, b, act: str, save_z: bool,
                           precision: str = "default"):
    B, i = x.shape
    o = w.shape[0]
    # keep bf16 operands in bf16 (half the HBM/VMEM traffic; the kernel
    # accumulates in f32 either way); other dtypes go through f32
    op_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    tiles = pick_tiles(B, i, o, save_z, dtype=op_dtype)
    block_b, block_o, block_k = tiles
    xp = _pad2(x.astype(op_dtype), block_b, block_k)
    wp = _pad2(w.astype(op_dtype), block_o, block_k)
    bp = jnp.pad(b.astype(jnp.float32), (0, wp.shape[0] - o)).reshape(1, -1)
    y, z = _fused_linear_padded(xp, wp, bp, act, block_b, save_z, precision,
                                tiles=tiles)
    return y[:B, :o].astype(x.dtype), (z[:B, :o] if save_z else None)


def _fused_linear_fwd(x, w, b, act, precision):
    y, z = _fused_linear_fwd_impl(x, w, b, act, save_z=True, precision=precision)
    return y, (x, w, b, z)


def _fused_linear_bwd(act, precision, res, dy):
    x, w, b, z = res
    prec = _precision(precision)
    dz = (dy.astype(jnp.float32) * _act_grad(act)(z)).astype(x.dtype)
    dx = lax.dot_general(dz, w, (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32,
                         precision=prec).astype(x.dtype)
    dw = lax.dot_general(dz, x, (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32,
                         precision=prec).astype(w.dtype)
    db = jnp.sum(dz, axis=0).astype(b.dtype)
    return dx, dw, db


fused_linear.defvjp(_fused_linear_fwd, _fused_linear_bwd)


# ---------------------------------------------------------------------------
# whole-MLP fused forward (all weights resident in VMEM)
# ---------------------------------------------------------------------------


def _mlp_kernel(x_ref, *refs, acts: Sequence[str],
                softmax_out: bool, out_dim: int, precision: str = "default"):
    n_layers = len(acts)
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers : 2 * n_layers]
    y_ref = refs[2 * n_layers]
    h = x_ref[:]
    for k in range(n_layers):
        z = (
            jnp.dot(h, w_refs[k][:], preferred_element_type=jnp.float32,
                    precision=_precision(precision))
            + b_refs[k][:]
        )
        if k == n_layers - 1 and softmax_out:
            # mask padded lanes so softmax normalizes over real classes only
            lanes = lax.broadcasted_iota(jnp.int32, z.shape, 1)
            z = jnp.where(lanes < out_dim, z, -jnp.inf)
            zmax = jnp.max(z, axis=1, keepdims=True)
            e = jnp.exp(z - zmax)
            h = e / jnp.sum(e, axis=1, keepdims=True)
        else:
            h = _act_fn(acts[k])(z)
    y_ref[:] = h.astype(y_ref.dtype)


@_f32_kernel_scope
def fused_mlp_forward(x, weights, biases, acts: Sequence[str],
                      softmax_out: bool = True,
                      block_b: Optional[int] = None,
                      precision: str = "default"):
    """Whole ffLayer-chain forward in ONE Pallas kernel: weights stay in
    VMEM across layers, activations never round-trip HBM.

    weights[k]: (o_k, i_k) with i_{k+1} == o_k; acts[k] applied after
    layer k (last layer uses masked softmax when ``softmax_out``).
    ``block_b=None`` takes a prior ``autotune.autotune_mlp_forward``
    winner for this (B, dims, device) from the tile cache, else 256.
    """
    B = x.shape[0]
    out_dim = weights[-1].shape[0]
    if block_b is None:
        from .autotune import get_tuned

        dims = "x".join(str(d) for d in
                        [weights[0].shape[1]] + [w.shape[0] for w in weights])
        tuned = get_tuned("mlp_fwd", B=B, dims=dims,
                          softmax=int(softmax_out), precision=precision)
        block_b = tuned[0] if tuned else 256
    block_b = min(_round_up(B, 8), block_b)
    xp = _pad2(x.astype(jnp.float32), block_b, LANE)
    wts, bs = [], []
    for w, b in zip(weights, biases):
        wt = _pad2(w.astype(jnp.float32).T, LANE, LANE)
        wts.append(wt)
        bs.append(jnp.pad(b.astype(jnp.float32), (0, wt.shape[1] - b.shape[0])).reshape(1, -1))
    Bp = xp.shape[0]
    Op = wts[-1].shape[1]
    grid = (Bp // block_b,)
    kernel = functools.partial(
        _mlp_kernel,
        acts=tuple(acts),
        softmax_out=softmax_out,
        out_dim=out_dim,
        precision=precision,
    )
    in_specs = [pl.BlockSpec((block_b, xp.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for wt in wts:
        in_specs.append(pl.BlockSpec(wt.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for b in bs:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    flops = 2 * Bp * sum(wt.shape[0] * wt.shape[1] for wt in wts)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, Op), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Op), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(Bp * xp.shape[1] + sum(wt.size for wt in wts)
                            + Bp * Op) * 4,
            transcendentals=Bp * sum(wt.shape[1] for wt in wts),
        ),
        interpret=_interpret(),
    )(xp, *wts, *bs)
    return y[:B, :out_dim]


# ---------------------------------------------------------------------------
# whole-training-step fused kernel
# ---------------------------------------------------------------------------


def _mlp_train_kernel(*refs, n_layers: int, acts, nb_tiles: int,
                      batch_total: int, out_dim: int, precision: str,
                      loss_kind: str = "softmax_xent"):
    """One FULL training step for an MLP, fused: forward, backward, SGD.
    Grid = batch tiles; every weight/bias and every weight-gradient
    accumulator lives in VMEM for the entire step, so HBM traffic is
    just the batch (x, y) and one read+write of the parameters.

    ``loss_kind="softmax_xent"``: masked softmax output + cross-entropy
    (the flagship MNIST configuration).  ``loss_kind="squared_error"``:
    the last layer applies ``acts[-1]`` and the loss is the reference's
    ``squaredError`` summed over output dims, meaned over the batch —
    the autoencoder training configuration (``AutoEncoder.hs:87-110``
    with target = input).

    refs layout:
      in : x, y, lr(1,1 SMEM), w1..wL, b1..bL
      out: loss(1,1), nw1..nwL, nb1..nbL
      scratch: gw1..gwL, gb1..gbL (f32)
    """
    prec = _precision(precision)
    x_ref, y_ref, lr_ref = refs[0], refs[1], refs[2]
    w_refs = refs[3 : 3 + n_layers]
    b_refs = refs[3 + n_layers : 3 + 2 * n_layers]
    base = 3 + 2 * n_layers
    loss_ref = refs[base]
    nw_refs = refs[base + 1 : base + 1 + n_layers]
    nb_refs = refs[base + 1 + n_layers : base + 1 + 2 * n_layers]
    sbase = base + 1 + 2 * n_layers
    gw_refs = refs[sbase : sbase + n_layers]
    gb_refs = refs[sbase + n_layers : sbase + 2 * n_layers]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        loss_ref[0, 0] = 0.0
        for k in range(n_layers):
            gw_refs[k][:] = jnp.zeros_like(gw_refs[k])
            gb_refs[k][:] = jnp.zeros_like(gb_refs[k])

    # ---- forward (save activations in registers/VMEM values) ----
    h = x_ref[:]
    hs = [h]          # inputs to each layer
    zs = []
    for k in range(n_layers):
        z = lax.dot_general(h, w_refs[k][:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec) + b_refs[k][:]
        zs.append(z)
        if k == n_layers - 1:
            lanes = lax.broadcasted_iota(jnp.int32, z.shape, 1)
            if loss_kind == "softmax_xent":
                zm = jnp.where(lanes < out_dim, z, -jnp.inf)
                zmax = jnp.max(zm, axis=1, keepdims=True)
                e = jnp.exp(zm - zmax)
                p = e / jnp.sum(e, axis=1, keepdims=True)
            else:
                # mask padded output lanes to exactly zero so they
                # contribute nothing to the squared error (act(0) need
                # not be 0 — logistic(0) = 0.5)
                p = jnp.where(lanes < out_dim, _act_fn(acts[k])(z), 0.0)
            h = p
        else:
            h = _act_fn(acts[k])(z)
            hs.append(h)

    y = y_ref[:]
    if loss_kind == "softmax_xent":
        # cross-entropy: -<y, log p>; log p safe where y > 0
        logp = jnp.log(jnp.where(p > 0, p, 1.0))
        loss_tile = -jnp.sum(y * logp)
        dz = (p - y) / batch_total  # softmax+CE fused gradient
    else:
        d = p - y  # padded lanes: p == 0 and y-pad == 0 -> no leak
        # padded batch rows DO leak into a squared loss (x-pad rows give
        # p = act(b) != 0 with y = 0) — mask them out of d entirely
        rids = i * p.shape[0] + lax.broadcasted_iota(jnp.int32, p.shape, 0)
        d = jnp.where(rids < batch_total, d, 0.0)
        loss_tile = jnp.sum(d * d)
        dz = (2.0 * d) * _act_grad(acts[n_layers - 1])(zs[-1]) / batch_total
        lanes = lax.broadcasted_iota(jnp.int32, dz.shape, 1)
        dz = jnp.where(lanes < out_dim, dz, 0.0)
    loss_ref[0, 0] += loss_tile / batch_total

    # ---- backward ----
    # zero the batch-padding rows (their p is nonzero but they are not
    # real samples)
    tile_rows = p.shape[0]
    row_ids = i * tile_rows + lax.broadcasted_iota(jnp.int32, p.shape, 0)
    dz = jnp.where(row_ids < batch_total, dz, 0.0)
    for k in range(n_layers - 1, -1, -1):
        # dW_k += dz.T @ h_in ; db_k += sum dz
        gw_refs[k][:] += lax.dot_general(
            dz, hs[k], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        gb_refs[k][:] += jnp.sum(dz, axis=0, keepdims=True)
        if k > 0:
            dh = lax.dot_general(dz, w_refs[k][:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=prec)
            dz = dh * _act_grad(acts[k - 1])(zs[k - 1])

    # ---- SGD update on the last tile ----
    @pl.when(i == nb_tiles - 1)
    def _():
        lr = lr_ref[0, 0]
        for k in range(n_layers):
            nw_refs[k][:] = w_refs[k][:] - lr * gw_refs[k][:]
            nb_refs[k][:] = b_refs[k][:] - lr * gb_refs[k][:]


@_f32_kernel_scope
def fused_mlp_train_step(x, y, weights, biases, lr, acts: Sequence[str],
                         block_b: Optional[int] = None,
                         precision: str = "default",
                         loss_kind: str = "softmax_xent"):
    """Entire MLP SGD step in ONE pallas_call.

    x: (B, i) inputs, y: (B, o) targets, weights[k]: (o_k, i_k),
    lr: scalar learning rate.  Returns (mean_loss, new_weights,
    new_biases).  Weights, activations gradients and accumulators stay
    VMEM-resident across all batch tiles — HBM sees the batch once and the
    parameters twice.  ``loss_kind="softmax_xent"`` (flagship): masked
    softmax output + cross-entropy, ``acts[-1]`` ignored.
    ``loss_kind="squared_error"``: ``acts[-1]`` applied, summed squared
    error — pass ``y = x`` for the fused autoencoder step.
    """
    n_layers = len(weights)
    out_dim = weights[-1].shape[0]
    B = x.shape[0]
    if block_b is None:
        # a prior autotune.autotune_mlp_train_step winner for this
        # (B, dims, device), else the hand-tuned 1024
        from .autotune import get_tuned

        dims = "x".join(str(d) for d in
                        [weights[0].shape[1]] + [w.shape[0] for w in weights])
        tuned = get_tuned("mlp_train", B=B, dims=dims, precision=precision)
        block_b = tuned[0] if tuned else 1024
    block_b = min(_round_up(B, 8), block_b)
    xp = _pad2(x.astype(jnp.float32), block_b, LANE)
    yp = _pad2(y.astype(jnp.float32), block_b, LANE)
    wps, bps = [], []
    din = xp.shape[1]
    for w, b in zip(weights, biases):
        wp = _pad2(w.astype(jnp.float32), LANE, LANE)
        # ensure input dim matches previous padded output dim
        if wp.shape[1] < din:
            wp = jnp.pad(wp, ((0, 0), (0, din - wp.shape[1])))
        wps.append(wp)
        bps.append(jnp.pad(b.astype(jnp.float32),
                           (0, wp.shape[0] - b.shape[0])).reshape(1, -1))
        din = wp.shape[0]
    vmem_bytes = sum(2 * w.size * 4 for w in wps)
    if vmem_bytes > 8 * 1024 * 1024:
        raise ValueError(
            f"fused_mlp_train_step: weights+grads need {vmem_bytes} bytes of "
            "VMEM (>8MB); use the XLA path for models this large")
    Bp = xp.shape[0]
    nb_tiles = Bp // block_b
    grid = (nb_tiles,)
    lr_arr = jnp.asarray(lr, jnp.float32).reshape(1, 1)

    kernel = functools.partial(
        _mlp_train_kernel, n_layers=n_layers, acts=tuple(acts),
        nb_tiles=nb_tiles, batch_total=B, out_dim=out_dim,
        precision=precision, loss_kind=loss_kind)

    in_specs = [
        pl.BlockSpec((block_b, xp.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, yp.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    for w in wps:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for b in bps:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    out_shape = [jax.ShapeDtypeStruct((1, 1), jnp.float32)]
    out_specs = [pl.BlockSpec((1, 1), lambda i: (0, 0),
                              memory_space=pltpu.SMEM)]
    for w in wps:
        out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
    for b in bps:
        out_shape.append(jax.ShapeDtypeStruct(b.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
    scratch = [pltpu.VMEM(w.shape, jnp.float32) for w in wps]
    scratch += [pltpu.VMEM(b.shape, jnp.float32) for b in bps]

    flops = 6 * Bp * sum(w.shape[0] * w.shape[1] for w in wps)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(Bp * (xp.shape[1] + yp.shape[1])
                            + 3 * sum(w.size for w in wps)) * 4,
            transcendentals=Bp * sum(w.shape[0] for w in wps),
        ),
        interpret=_interpret(),
    )(xp, yp, lr_arr, *wps, *bps)
    loss = outs[0][0, 0]
    new_ws = [outs[1 + k][: w.shape[0], : w.shape[1]].astype(weights[k].dtype)
              for k, w in enumerate(weights)]
    new_bs = [outs[1 + n_layers + k][0, : b.shape[0]].astype(biases[k].dtype)
              for k, b in enumerate(biases)]
    return loss, new_ws, new_bs


# ---------------------------------------------------------------------------
# weight-only int8 quantized inference
# ---------------------------------------------------------------------------


def quantize_weights_int8(w) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8 quantization of an ffLayer weight
    ``w: (o, i)``: returns (int8 values (o, i), f32 scales (o, 1)) with
    ``w ~= values * scales``.  Halves (vs bf16) or quarters (vs f32) the
    weight HBM traffic — the serving-path bandwidth win."""
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _linear_w8_kernel(x_ref, wq_ref, scale_ref, b_ref, y_ref, acc_ref, *,
                      act: str, nk: int, precision: str):
    """Weight-only int8 fused linear: dequantize the weight tile on the
    VPU (int8 -> f32 multiply by per-row scale) and feed the MXU."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # dequantize to bf16: int8 magnitudes (<=127) are exact in bf16's
    # 8-bit mantissa, the per-row scale costs one rounding — negligible
    # next to the quantization error itself — and the MXU runs at full
    # bf16 rate instead of half-rate f32.  precision="highest" demands
    # f32 operands (Mosaic rejects HIGHEST with bf16 lhs), so the
    # full-precision path keeps the f32 dequant.
    w_deq = wq_ref[:].astype(jnp.float32) * scale_ref[:]
    if precision == "highest":
        lhs, rhs = x_ref[:], w_deq
    else:
        lhs, rhs = x_ref[:].astype(jnp.bfloat16), w_deq.astype(jnp.bfloat16)
    acc_ref[:] += lax.dot_general(
        lhs, rhs,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(precision),
    )

    @pl.when(k == nk - 1)
    def _():
        z = acc_ref[:] + b_ref[:]
        y_ref[:] = _act_fn(act)(z).astype(y_ref.dtype)


@_f32_kernel_scope
def fused_linear_w8(x, wq, scale, b, act: str = "identity",
                    precision: str = "default", tiles=None):
    """``act(x @ (wq * scale).T + b)`` with int8 weights dequantized
    in-kernel.  x: (B, i), wq: (o, i) int8, scale: (o, 1) f32, b: (o,).
    ``tiles`` overrides the tuned/heuristic (block_b, block_o, block_k)
    — the autotuner's sweep hook (``autotune.autotune_linear_w8``)."""
    B, i = x.shape
    o = wq.shape[0]
    if tiles is None:
        tiles = pick_tiles(B, i, o, kernel="linear_w8")
    block_b, block_o, block_k = tiles
    xp = _pad2(x.astype(jnp.float32), block_b, block_k)
    wqp = _pad2(wq, block_o, block_k)
    sp = jnp.pad(scale.astype(jnp.float32), ((0, wqp.shape[0] - o), (0, 0)),
                 constant_values=1.0)
    bp = jnp.pad(b.astype(jnp.float32), (0, wqp.shape[0] - o)).reshape(1, -1)
    K = xp.shape[1]
    O = wqp.shape[0]
    nk = K // block_k
    grid = (xp.shape[0] // block_b, O // block_o, nk)
    kernel = functools.partial(_linear_w8_kernel, act=act, nk=nk,
                               precision=precision)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, block_k), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, 1), lambda i, j, k: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_o), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, block_o), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_b, block_o), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], O), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * xp.shape[0] * K * O,
            bytes_accessed=xp.shape[0] * K * 4 + K * O + xp.shape[0] * O * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=56 * 1024 * 1024),
        interpret=_interpret(),
    )(xp, wqp, sp, bp)
    return y[:B, :o]


# ---------------------------------------------------------------------------
# int8 x int8 -> int32 MXU-direct quantized linear (w8a8)
# ---------------------------------------------------------------------------


def quantize_acts_int8(x) -> Tuple[jax.Array, jax.Array]:
    """Per-row (per-token) symmetric dynamic int8 quantization of an
    activation batch ``x: (B, i)``: returns (int8 values, f32 scales
    (B, 1)) with ``x ~= values * scales``.  One cheap VPU pass over the
    activations — negligible next to the weight streaming it unlocks."""
    x = jnp.asarray(x, jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _linear_w8a8_kernel(xq_ref, wq_ref, sx_ref, sw_ref, b_ref, y_ref,
                        acc_ref, *, act: str, nk: int):
    """Both operands enter the MXU as int8 (int8 x int8 -> int32
    accumulate — the MXU's native low-precision mode, no dequantize on
    the VPU and half the bf16 weight traffic); the int32 accumulator is
    rescaled by the rank-1 outer product of the per-row activation scale
    and per-column weight scale only once, at the final K step."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += lax.dot_general(
        xq_ref[:], wq_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == nk - 1)
    def _():
        z = acc_ref[:].astype(jnp.float32) * sx_ref[:] * sw_ref[:] + b_ref[:]
        y_ref[:] = _act_fn(act)(z).astype(y_ref.dtype)


@_f32_kernel_scope
def fused_linear_w8a8(x, wq, scale, b, act: str = "identity", tiles=None):
    """``act((xq @ wq.T) * sx * sw.T + b)`` with BOTH operands int8 on the
    MXU (``int8 x int8 -> int32``) — the serving path VERDICT item 5 asked
    for, replacing the dequantize-to-bf16 detour of ``fused_linear_w8``.

    x: (B, i) float (quantized per-row on the fly), wq: (o, i) int8 from
    ``quantize_weights_int8``, scale: (o, 1) f32, b: (o,).  int8 weight
    blocks quarter the f32 HBM traffic, and int8 sublane tiles (32 x 128)
    pack 4x denser in VMEM, so weight-streaming-bound shapes (wide layer,
    small batch) run at HBM speed-of-light on a quarter of the bytes."""
    B, i = x.shape
    o = wq.shape[0]
    if tiles is None:
        from .autotune import get_tuned

        tiles = get_tuned("linear_w8a8", B=B, K=i, O=o)
    if tiles is not None:
        block_b, block_o, block_k = tiles
    else:
        # int8 tile heuristic from the on-device sweep (BENCH.md int8
        # table): 2048x1024 weight blocks stream at ~990 GB/s (vs ~820
        # for the f32 heuristic's 512 x full-K); int8 minimum sublane
        # tile is 32, so the batch tile rounds UP to a 32-multiple
        # (not just clamps at 32)
        block_b = min(_round_up(B, 32), 512)
        block_o = min(_round_up(o, LANE), 2048)
        block_k = min(_round_up(i, LANE), 1024)
    xq, sx = quantize_acts_int8(x)
    xqp = _pad2(xq, block_b, block_k)
    sxp = jnp.pad(sx, ((0, xqp.shape[0] - B), (0, 0)), constant_values=1.0)
    wqp = _pad2(wq, block_o, block_k)
    O = wqp.shape[0]
    # weight scale enters as a (1, O) row so the final rescale broadcasts
    # acc * sx(col) * sw(row) without any in-kernel transpose
    swp = jnp.pad(scale.astype(jnp.float32), ((0, O - o), (0, 0)),
                  constant_values=1.0).reshape(1, -1)
    bp = jnp.pad(b.astype(jnp.float32), (0, O - o)).reshape(1, -1)
    K = xqp.shape[1]
    nk = K // block_k
    grid = (xqp.shape[0] // block_b, O // block_o, nk)
    kernel = functools.partial(_linear_w8a8_kernel, act=act, nk=nk)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, block_k), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_o), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_o), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, block_o), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_b, block_o), jnp.int32)],
        out_shape=jax.ShapeDtypeStruct((xqp.shape[0], O), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * xqp.shape[0] * K * O,
            bytes_accessed=xqp.shape[0] * K + K * O + xqp.shape[0] * O * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=56 * 1024 * 1024),
        interpret=_interpret(),
    )(xqp, wqp, sxp, swp, bp)
    return y[:B, :o].astype(x.dtype)


def _mlp_w8a8_kernel(xq_ref, sx_ref, wq_ref, sw_ref, b_ref, y_ref,
                     h_i8, h_f32, sx_cur, amax, acc, *,
                     n_layers: int, nj: int, nk: int,
                     block_o: int, block_k: int, hidden_act: str):
    """Whole uniform-width MLP, int8 end to end, in ONE pallas_call.

    Grid (layer, out-tile, k-tile), sequential.  Weight blocks stream
    from HBM (Mosaic double-buffers them); activations NEVER leave VMEM:
    each layer's f32 output tile lands in the ``h_f32`` scratch, its
    per-row absmax accumulates into ``amax``, and the first grid step of
    the next layer requantizes the whole row to int8 in-VMEM — the
    per-layer XLA quantize/pad round-trips of the layer-at-a-time path
    (~7 us/layer at the 4096-wide serving shape) disappear."""
    l = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when((l == 0) & (j == 0) & (k == 0))
    def _():
        h_i8[:] = xq_ref[:]
        sx_cur[:] = sx_ref[:]

    @pl.when((l > 0) & (j == 0) & (k == 0))
    def _():
        # requantize the previous layer's f32 activations (all in VMEM)
        s = jnp.where(amax[:] > 0, amax[:] / 127.0, 1.0)
        sx_cur[:] = s
        h_i8[:] = jnp.clip(jnp.round(h_f32[:] / s), -127, 127).astype(jnp.int8)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += lax.dot_general(
        h_i8[:, pl.ds(k * block_k, block_k)], wq_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == nk - 1)
    def _():
        z = acc[:].astype(jnp.float32) * sx_cur[:] * sw_ref[0] + b_ref[0]

        @pl.when(l < n_layers - 1)
        def _():
            h = _act_fn(hidden_act)(z)
            h_f32[:, pl.ds(j * block_o, block_o)] = h
            rowmax = jnp.max(jnp.abs(h), axis=1, keepdims=True)
            amax[:] = jnp.where(j == 0, rowmax, jnp.maximum(amax[:], rowmax))

        @pl.when(l == n_layers - 1)
        def _():
            y_ref[:] = z  # logits; softmax/argmax stay outside


@_f32_kernel_scope
def fused_mlp_w8a8_forward(x, wqs, sws, bs, hidden_act: str = "relu",
                           tiles=None):
    """Whole-MLP int8 serving megakernel for a uniform-width stack.

    x: (B, N) float; wqs: (L, N, N) int8 (per-channel quantized, layer-
    stacked); sws: (L, N) f32 scales; bs: (L, N) f32 biases.  Hidden
    layers apply ``hidden_act``; the last layer emits raw logits (B, N).
    Requires N % 128 == 0 (the serving sweep's padded uniform width) —
    non-uniform nets use the per-layer ``fused_linear_w8a8``."""
    B, N = x.shape
    L = wqs.shape[0]
    if wqs.shape[1] != N or wqs.shape[2] != N or N % LANE:
        raise ValueError(
            f"fused_mlp_w8a8_forward needs uniform 128-multiple dims, got "
            f"x {x.shape}, wqs {wqs.shape}")
    block_b = min(_round_up(B, 32), 512)  # int8 sublane tile is 32
    if tiles is None:
        from .autotune import get_tuned

        # the megakernel's real tunables are the weight-block tiles
        # (``tiles`` = (block_o, block_k)): the batch is VMEM-resident
        # whole (the grid never tiles it), so block_b is just padding
        tiles = get_tuned("mlp_w8a8", B=B, N=N, L=int(wqs.shape[0]))
    if tiles is not None:
        block_o, block_k = tiles
    else:
        block_o = min(N, 2048)
        block_k = min(N, 1024)
    nj, nk = N // block_o, N // block_k
    xq, sx = quantize_acts_int8(x)
    xqp = _pad2(xq, block_b, LANE)
    Bp = xqp.shape[0]
    sxp = jnp.pad(sx, ((0, Bp - B), (0, 0)), constant_values=1.0)
    sws = jnp.asarray(sws, jnp.float32).reshape(L, 1, N)
    bs = jnp.asarray(bs, jnp.float32).reshape(L, 1, N)
    kernel = functools.partial(
        _mlp_w8a8_kernel, n_layers=L, nj=nj, nk=nk,
        block_o=block_o, block_k=block_k, hidden_act=hidden_act)
    y = pl.pallas_call(
        kernel,
        grid=(L, nj, nk),
        in_specs=[
            pl.BlockSpec((Bp, N), lambda l, j, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, 1), lambda l, j, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_o, block_k), lambda l, j, k: (l, j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_o), lambda l, j, k: (l, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_o), lambda l, j, k: (l, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bp, block_o), lambda l, j, k: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Bp, N), jnp.int8),      # h_i8: current layer input
            pltpu.VMEM((Bp, N), jnp.float32),   # h_f32: current layer output
            pltpu.VMEM((Bp, 1), jnp.float32),   # sx_cur: per-row input scale
            pltpu.VMEM((Bp, 1), jnp.float32),   # amax: running row absmax
            pltpu.VMEM((Bp, block_o), jnp.int32),  # acc
        ],
        out_shape=jax.ShapeDtypeStruct((Bp, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * L * Bp * N * N,
            bytes_accessed=L * N * N + Bp * N * 5,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=56 * 1024 * 1024),
        interpret=_interpret(),
    )(xqp, sxp, wqs, sws, bs)
    return y[:B]


# ---------------------------------------------------------------------------
# fused recurrent (Elman) step
# ---------------------------------------------------------------------------


def _rnn_step_kernel(x_ref, s_ref, wx_ref, ws_ref, b_ref, y_ref, snew_ref, *,
                     act: str, precision: str):
    """One Elman step for a batch tile: ``z = x @ Wx^T + s @ Ws^T + b``;
    output y = z (pre-activation, the reference's ``fullyConnected``
    convention, ``Recurrent.hs:97-125``), new state = act(z).  Both
    weights stay VMEM-resident; the two matmuls and the activation fuse
    into one kernel."""
    prec = _precision(precision)
    z = (
        lax.dot_general(x_ref[:], wx_ref[:], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec)
        + lax.dot_general(s_ref[:], ws_ref[:], (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32, precision=prec)
        + b_ref[:]
    )
    y_ref[:] = z.astype(y_ref.dtype)
    snew_ref[:] = _act_fn(act)(z).astype(snew_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_rnn_step(x, s, wx, ws, b, act: str = "logistic",
                   precision: str = "default"):
    """Fused Elman recurrent step (batched over sequences):
    x: (B, i), s: (B, o), wx: (o, i), ws: (o, o), b: (o,) ->
    (y: (B, o) pre-activation, s_new: (B, o) = act(z)).  Differentiable
    (custom VJP); drive over time with ``lax.scan`` for fused BPTT."""
    y, snew, _ = _rnn_step_impl(x, s, wx, ws, b, act, precision)
    return y, snew


#: The Elman kernel keeps BOTH weight matrices VMEM-resident whole
#: (its contraction never blocks I/O); current libtpu enforces a
#: ~16 MiB scoped-VMEM stack limit per kernel, so the f32 weights
#: alone cap hidden size around sqrt(16MiB/2/4B) ~= 1448.  Checked
#: eagerly with a clear error (the autotuner's sweep rejects every
#: candidate at such shapes for the same reason); use FusedRNN's
#: default ``impl="xla"`` there — measured faster at EVERY size
#: anyway (BENCH.md "Recurrent (Elman) sequence step").
_RNN_SCOPED_VMEM_LIMIT = 16 * 1024 * 1024


@_f32_kernel_scope
def _rnn_step_impl(x, s, wx, ws, b, act, precision, block_b=None):
    B, i = x.shape
    o = wx.shape[0]
    _w_bytes = 4 * (_round_up(o, LANE) * _round_up(i, LANE)
                    + _round_up(o, LANE) ** 2)
    if _w_bytes > _RNN_SCOPED_VMEM_LIMIT and not _interpret():
        raise ValueError(
            f"fused_rnn_step: resident f32 weights need {_w_bytes/2**20:.1f}"
            f" MiB of VMEM, over the ~16 MiB scoped limit (hidden={o}, "
            f"in={i}); use FusedRNN(impl='xla') — measured faster at "
            f"every size (BENCH.md)")
    if block_b is None:
        from .autotune import get_tuned

        tuned = get_tuned("rnn_step", B=B, I=i, O=o)
        block_b = tuned[0] if tuned else min(_round_up(B, 8), 512)
    block_b = min(_round_up(B, 8), block_b)
    I = _round_up(i, LANE)
    O = _round_up(o, LANE)
    xp = _pad2(x.astype(jnp.float32), block_b, LANE)          # (Bp, I)
    sp = _pad2(s.astype(jnp.float32), block_b, LANE)          # (Bp, O)
    wxp = jnp.pad(wx.astype(jnp.float32), ((0, O - o), (0, I - i)))
    wsp = jnp.pad(ws.astype(jnp.float32), ((0, O - o), (0, O - o)))
    bp = jnp.pad(b.astype(jnp.float32), (0, O - o)).reshape(1, -1)
    grid = (xp.shape[0] // block_b,)
    kernel = functools.partial(_rnn_step_kernel, act=act, precision=precision)
    y, snew = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, xp.shape[1]), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, sp.shape[1]), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wxp.shape, lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wsp.shape, lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bp.shape, lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, O), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, O), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((xp.shape[0], O), x.dtype),
            jax.ShapeDtypeStruct((xp.shape[0], O), x.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * xp.shape[0] * (xp.shape[1] + sp.shape[1]) * O,
            bytes_accessed=(xp.size + sp.size + wxp.size + wsp.size) * 4,
            transcendentals=xp.shape[0] * O,
        ),
        interpret=_interpret(),
    )(xp, sp, wxp, wsp, bp)
    z = y[:B, :o]
    return z, snew[:B, :o], z


def _rnn_step_fwd(x, s, wx, ws, b, act, precision):
    y, snew, z = _rnn_step_impl(x, s, wx, ws, b, act, precision)
    return (y, snew), (x, s, wx, ws, b, z)


def _rnn_step_bwd(act, precision, res, cts):
    x, s, wx, ws, b, z = res
    dy, dsnew = cts
    prec = _precision(precision)
    dz = (dy.astype(jnp.float32)
          + dsnew.astype(jnp.float32) * _act_grad(act)(z.astype(jnp.float32)))
    dz = dz.astype(x.dtype)
    dx = lax.dot_general(dz, wx, (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32,
                         precision=prec).astype(x.dtype)
    ds = lax.dot_general(dz, ws, (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32,
                         precision=prec).astype(s.dtype)
    dwx = lax.dot_general(dz, x, (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32,
                          precision=prec).astype(wx.dtype)
    dws = lax.dot_general(dz, s, (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32,
                          precision=prec).astype(ws.dtype)
    db = jnp.sum(dz, axis=0).astype(b.dtype)
    return dx, ds, dwx, dws, db


fused_rnn_step.defvjp(_rnn_step_fwd, _rnn_step_bwd)
