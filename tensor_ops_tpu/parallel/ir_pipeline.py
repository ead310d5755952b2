"""Pipeline parallelism over the staged IR itself.

The reference's network-composition points (``~*~``,
``src/TensorOps/Learn/NeuralNet/FeedForward.hs:82-90``) are the designated
pipeline cut points (SURVEY.md §2.5).  A :class:`~tensor_ops_tpu.models.
feedforward.Network` built with ``then``/``gen_net`` has exactly that
shape in its op graph — ``Compose(First(prefix, rest), layer)`` per
composition — so :func:`unchain` recovers the per-layer sub-graphs, and
:func:`ir_pipeline_train_step` shards a uniform run of them over a
``stage`` mesh axis as a GPipe microbatch pipeline (``lax.scan`` +
``lax.ppermute`` ring inside ``shard_map``, like
:mod:`tensor_ops_tpu.parallel.pipeline`).

Unlike ``pipeline.PipelineMLP`` (a hand-written MLP), every stage here
evaluates its *actual staged-IR sub-graph*, and its backward pass is the
framework's own graph transposition: each segment is wrapped in a
``jax.custom_vjp`` whose forward runs ``op.apply_tape`` and whose backward
runs ``op.transpose`` — ``jax.grad`` only orchestrates the pipeline
schedule (transposing ``ppermute``/``scan``), never differentiates the
model itself.  Gradients are therefore exactly the sequential staged-IR
gradients (tested to 1e-9).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from ..backend.base import Backend
from ..ops.ir import Compose, First, TOp
from ..ops.shapes import ShapeError
from ..models.feedforward import Network
from .mesh import DATA_AXIS
from .pipeline import STAGE_AXIS, shard_map


# ---------------------------------------------------------------------------
# unchaining a Network op at its composition points
# ---------------------------------------------------------------------------


def unchain(op: TOp) -> List[TOp]:
    """Split an op graph at its ``lead``-composition seams (the build
    pattern of ``Network.then`` / ``gen_net``: ``Compose(First(prefix,
    rest), layer)`` with ``rest`` = the layer's params) into the list of
    per-layer sub-ops, each ``([x] + params_k) -> [y]``.  An op with no
    such seam is returned whole."""
    if (
        isinstance(op, Compose)
        and isinstance(op.f, First)
        and len(op.f.op.out_stack) == 1
        and len(op.g.out_stack) == 1
        and op.f.rest == op.g.in_stack[1:]
    ):
        return unchain(op.f.op) + [op.g]
    return [op]


def network_segments(net: Network) -> List[Tuple[TOp, Tuple[Any, ...]]]:
    """The network's layer sub-graphs paired with their parameter slices
    (in stack order)."""
    segs = unchain(net.op)
    out = []
    cursor = 0
    for seg in segs:
        k = len(seg.in_stack) - 1
        out.append((seg, tuple(net.params[cursor : cursor + k])))
        cursor += k
    if cursor != len(net.params):
        raise ShapeError(
            f"unchain consumed {cursor} params but network has "
            f"{len(net.params)}"
        )
    return out


# ---------------------------------------------------------------------------
# the framework-AD seam: custom_vjp around a staged sub-graph
# ---------------------------------------------------------------------------


def ir_call(op: TOp, be: Backend) -> Callable:
    """``fn(*xs) -> ys tuple`` evaluating ``op`` with gradients supplied
    by the op's OWN transposition rule: the custom_vjp forward tapes
    residuals via ``apply_tape`` and the backward runs ``op.transpose`` —
    jax AD never sees inside the sub-graph."""

    @jax.custom_vjp
    def f(*xs):
        return op.apply(be, xs)

    def fwd(*xs):
        ys, tape = op.apply_tape(be, xs, with_tape=True)
        return ys, tape

    def bwd(tape, cts):
        return tuple(op.transpose(be, tape, tuple(cts)))

    f.defvjp(fwd, bwd)
    return f


def batched_ir_call(op: TOp, be: Backend) -> Callable:
    """``fn(xb, *params) -> yb``: the per-sample sub-graph vmapped over a
    leading batch axis (params broadcast), framework AD inside."""
    call = ir_call(op, be)
    n_params = len(op.in_stack) - 1

    def single(x, *params):
        return call(x, *params)[0]

    return jax.vmap(single, in_axes=(0,) + (None,) * n_params)


# ---------------------------------------------------------------------------
# stage partitioning
# ---------------------------------------------------------------------------


@dataclass
class PipelinedNetwork:
    """A Network split for pipelining: replicated ``pre`` segments, a
    uniform ``body`` (one op evaluated with per-stage stacked params),
    replicated ``post`` segments."""

    pre: List[Tuple[TOp, Tuple[Any, ...]]]
    body_op: Optional[TOp]
    body_params: Tuple[Any, ...]  # each (n_body, *param_shape)
    n_body: int
    post: List[Tuple[TOp, Tuple[Any, ...]]]

    def flat_params(self) -> Tuple[Any, ...]:
        ps: List[Any] = []
        for _, p in self.pre:
            ps.extend(p)
        ps.extend(self.body_params)
        for _, p in self.post:
            ps.extend(p)
        return tuple(ps)

    def unflatten(self, flat: Tuple[Any, ...]) -> "PipelinedNetwork":
        it = iter(flat)
        pre = [(op, tuple(next(it) for _ in p)) for op, p in self.pre]
        body = tuple(next(it) for _ in self.body_params)
        post = [(op, tuple(next(it) for _ in p)) for op, p in self.post]
        return PipelinedNetwork(pre, self.body_op, body, self.n_body, post)

    def skeleton(self) -> "PipelinedNetwork":
        """Structure-only copy (param arrays replaced by None): safe to
        capture in long-lived closures/jit caches without pinning a full
        parameter copy — ``unflatten``/``flat_params`` only count."""
        return PipelinedNetwork(
            [(op, tuple(None for _ in p)) for op, p in self.pre],
            self.body_op,
            tuple(None for _ in self.body_params),
            self.n_body,
            [(op, tuple(None for _ in p)) for op, p in self.post])

    def to_network_params(self) -> Tuple[Any, ...]:
        """Back to the original Network param stack (body unstacked in
        segment order)."""
        ps: List[Any] = []
        for _, p in self.pre:
            ps.extend(p)
        for k in range(self.n_body):
            ps.extend(b[k] for b in self.body_params)
        for _, p in self.post:
            ps.extend(p)
        return tuple(ps)


def split_network(net: Network, n_stages: int) -> PipelinedNetwork:
    """Cut the network at its composition points: find the maximal run of
    structurally identical segments (the uniform ffLayer body), require
    its length divisible by ``n_stages``, and stack its params with a
    leading segment axis; segments before/after run replicated."""
    segs = network_segments(net)
    keys = [op.struct_key() for op, _ in segs]
    # longest run of equal keys
    best_start, best_len = 0, 1
    start = 0
    for i in range(1, len(keys) + 1):
        if i == len(keys) or keys[i] != keys[start]:
            if i - start > best_len:
                best_start, best_len = start, i - start
            start = i
    n_body = (best_len // n_stages) * n_stages
    if n_body < n_stages:
        raise ShapeError(
            f"pipeline needs >= {n_stages} structurally identical layer "
            f"segments; longest uniform run is {best_len} "
            f"(segments: {[tuple(op.in_stack) for op, _ in segs]})"
        )
    body = segs[best_start : best_start + n_body]
    body_op = body[0][0]
    body_params = tuple(
        jnp.stack([seg_params[j] for _, seg_params in body])
        for j in range(len(body[0][1]))
    )
    return PipelinedNetwork(
        pre=segs[:best_start],
        body_op=body_op,
        body_params=body_params,
        n_body=n_body,
        post=segs[best_start + n_body :],
    )


# ---------------------------------------------------------------------------
# the pipelined step
# ---------------------------------------------------------------------------


def _ir_pipeline_specs(mesh: Mesh, n_body_params: int):
    has_data = DATA_AXIS in mesh.axis_names
    mb_spec = PSpec(None, DATA_AXIS, None) if has_data else PSpec()
    param_specs = tuple(PSpec(STAGE_AXIS) for _ in range(n_body_params))
    return param_specs + (mb_spec,), mb_spec


def _make_spmd_body(body_op: TOp, be: Backend, L: int, n_body_params: int):
    """The shard_map-ed GPipe loop: each device holds L consecutive body
    segments' params; microbatches ring-shift with ppermute; every
    segment evaluates its staged sub-graph via framework AD."""
    seg_call = batched_ir_call(body_op, be)

    def stage_forward(params_local, x):
        h = x
        for l in range(L):
            h = seg_call(h, *(p[l] for p in params_local))
        return h

    def spmd(*args):
        params_local = args[:n_body_params]  # each (L, *shape)
        mb_inputs = args[n_body_params]      # (M, mb, h)
        s = lax.axis_index(STAGE_AXIS)
        S = lax.axis_size(STAGE_AXIS)
        M = mb_inputs.shape[0]
        T = M + S - 1
        state = jnp.zeros_like(mb_inputs[0])
        outputs = jnp.zeros_like(mb_inputs)

        def step(carry, t):
            state, outputs = carry
            inject = mb_inputs[jnp.minimum(t, M - 1)]
            x_in = jnp.where(s == 0, inject, state)
            y = stage_forward(params_local, x_in)
            oidx = t - (S - 1)
            updated = lax.dynamic_update_index_in_dim(
                outputs, y, jnp.maximum(oidx, 0), 0)
            outputs = jnp.where((s == S - 1) & (oidx >= 0), updated, outputs)
            state = lax.ppermute(
                y, STAGE_AXIS, [(i, (i + 1) % S) for i in range(S)])
            return (state, outputs), None

        (state, outputs), _ = lax.scan(step, (state, outputs), jnp.arange(T))
        return lax.psum(outputs, STAGE_AXIS)

    return spmd


def make_ir_pipeline_loss(
    net: Network,
    loss: TOp,
    be: Backend,
    mesh: Mesh,
    n_microbatches: int,
    pnet: Optional[PipelinedNetwork] = None,
) -> Tuple[Callable, PipelinedNetwork]:
    """``(loss_fn, pnet)``: the pipelined batch-mean loss over the
    stage-partitioned flat params — ``loss_fn(flat_params, xb, yb)`` —
    differentiable under ``jax.grad`` (every segment evaluates through
    the framework's own transposition AD via ``ir_call``; jax only
    transposes the schedule).  Building block for both the SGD
    ``ir_pipeline_train_step`` and the optimizer-generic ``fit(mesh=
    <stage mesh>)`` path.

    ``pnet`` may be a prebuilt partition (or a skeleton of one — the
    closure uses only its STRUCTURE: ops and per-segment param counts,
    never the array values), avoiding a second ``split_network`` and
    keeping no extra parameter copy alive."""
    if be.name != "jax":
        raise ValueError("ir pipeline requires the jax backend")
    S = mesh.shape[STAGE_AXIS]
    if pnet is None:
        pnet = split_network(net, S)
    L = pnet.n_body // S
    n_bp = len(pnet.body_params)
    M = n_microbatches

    in_specs, out_spec = _ir_pipeline_specs(mesh, n_bp)
    pipelined = shard_map(
        _make_spmd_body(pnet.body_op, be, L, n_bp),
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_spec,
        check_vma=False,
    )

    pre_calls = [batched_ir_call(op, be) for op, _ in pnet.pre]
    post_calls = [batched_ir_call(op, be) for op, _ in pnet.post]
    loss_call = ir_call(loss, be)
    loss_batched = jax.vmap(lambda o, y: loss_call(o, y)[0])

    def loss_fn(flat_params, xb, yb):
        p = pnet.unflatten(flat_params)
        h = xb
        for call, (_, seg_p) in zip(pre_calls, p.pre):
            h = call(h, *seg_p)
        B = h.shape[0]
        mb = h.reshape(M, B // M, -1)
        h = pipelined(*p.body_params, mb).reshape(B, -1)
        for call, (_, seg_p) in zip(post_calls, p.post):
            h = call(h, *seg_p)
        return jnp.mean(loss_batched(h, yb))

    return loss_fn, pnet


def ir_pipeline_train_step(
    net: Network,
    loss: TOp,
    be: Backend,
    mesh: Mesh,
    n_microbatches: int,
) -> Tuple[Callable, PipelinedNetwork]:
    """Jitted pipeline-parallel SGD step over the staged IR:
    ``fn(lr, xb, yb, *flat_params) -> (mean_loss, new_flat_params)``.

    Returns ``(step, pnet)`` where ``pnet`` is the stage-partitioned
    parameter container (``pnet.flat_params()`` feeds the step;
    ``pnet.unflatten(new).to_network_params()`` rebuilds a Network stack).
    Gradients equal the sequential staged-IR gradients exactly: every
    segment — pre, body stages, post, and the loss — evaluates through
    ``ir_call`` (forward ``apply_tape``, backward ``op.transpose``)."""
    loss_fn, pnet = make_ir_pipeline_loss(net, loss, be, mesh,
                                          n_microbatches)

    @jax.jit
    def step(lr, xb, yb, *flat_params):
        v, grads = jax.value_and_grad(loss_fn)(tuple(flat_params), xb, yb)
        new_params = tuple(p - lr * g for p, g in zip(flat_params, grads))
        return v, new_params

    return step, pnet


def ir_pipeline_grads(
    net: Network,
    loss: TOp,
    be: Backend,
    mesh: Mesh,
    n_microbatches: int,
) -> Callable:
    """``fn(xb, yb, *flat_params) -> (mean_loss, grads)`` — the raw
    pipelined batch-mean gradient, for direct comparison against the
    sequential staged-IR gradient."""
    step, pnet = ir_pipeline_train_step(net, loss, be, mesh, n_microbatches)

    @jax.jit
    def grads(xb, yb, *flat_params):
        # recover grads from one SGD step with lr=1: g = p - new_p
        v, new_params = step(1.0, xb, yb, *flat_params)
        return v, tuple(p - np_ for p, np_ in zip(flat_params, new_params))

    return grads


def shard_pipelined_params(pnet: PipelinedNetwork, mesh: Mesh) -> PipelinedNetwork:
    """Place the body param stacks over the stage axis, pre/post
    replicated."""
    repl = NamedSharding(mesh, PSpec())
    stage_sh = NamedSharding(mesh, PSpec(STAGE_AXIS))
    pre = [(op, tuple(jax.device_put(x, repl) for x in p))
           for op, p in pnet.pre]
    post = [(op, tuple(jax.device_put(x, repl) for x in p))
            for op, p in pnet.post]
    body = tuple(jax.device_put(x, stage_sh) for x in pnet.body_params)
    return PipelinedNetwork(pre, pnet.body_op, body, pnet.n_body, post)
