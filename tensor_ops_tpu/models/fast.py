"""FusedMLP: the flagship fast path — ffLayer chains running on the
Pallas fused kernels.

Bridges the staged-IR :class:`~tensor_ops_tpu.models.feedforward.Network`
(built by ``gen_net`` with the reference's exact composition) to a
kernel-fused executor: each layer is one Pallas ``fused_linear`` (matmul on
the MXU + bias + activation on the VPU, custom VJP), inference can use the
single-kernel whole-network ``fused_mlp_forward``, and the training step
(softmax + cross-entropy + SGD update) jits into one XLA program around
the kernels.  Numerics parity with the IR path is tested at
``precision="highest"``; the benchmark runs the bf16-MXU default.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.pallas_kernels import _act_fn, fused_linear, fused_mlp_forward
from .feedforward import Network


@dataclass
class FusedMLP:
    """weights[k]: (o_k, i_k) — the reference ffLayer layout; acts[k] in
    {logistic, relu, tanh, identity}; final softmax applied in-graph."""

    weights: Tuple[Any, ...]
    biases: Tuple[Any, ...]
    acts: Tuple[str, ...]
    softmax_out: bool = True
    precision: str = "default"
    loss_kind: str = "ce"  # "ce" (cross-entropy) or "mse" (squared error)

    _cache: dict = None

    def __post_init__(self):
        self.weights = tuple(jnp.asarray(w) for w in self.weights)
        self.biases = tuple(jnp.asarray(b) for b in self.biases)
        self.acts = tuple(self.acts)
        if self._cache is None:
            object.__setattr__(self, "_cache", {})

    # -- conversion ------------------------------------------------------
    @classmethod
    def from_network(cls, net: Network, acts: Optional[Sequence[str]] = None,
                     softmax_out: Optional[bool] = None,
                     precision: str = "default") -> "FusedMLP":
        """From a gen_net-built Network: params alternate (w, b) per layer
        (``ff_layer``; the softmax layer contributes no params).  When the
        Network carries ``act_names`` (set by gen_net) the kernel
        activations are inferred: softmax output -> masked in-kernel
        softmax, elementwise names pass through."""
        if acts is None:
            if net.act_names is None:
                raise ValueError("acts not given and net has no act_names")
            names = list(net.act_names)
            if softmax_out is None:
                softmax_out = names[-1] == "softmax"
            if names[-1] == "softmax":
                names[-1] = "identity"
            acts = names
        if softmax_out is None:
            softmax_out = True
        ps = net.params
        ws = tuple(ps[i] for i in range(0, len(ps), 2))
        bs = tuple(ps[i] for i in range(1, len(ps), 2))
        return cls(ws, bs, tuple(acts), softmax_out, precision)

    def astype(self, dtype) -> "FusedMLP":
        """Serving-precision variant: weights/biases stored in ``dtype``
        (e.g. ``jnp.bfloat16`` — half the weight HBM footprint, so twice
        the replicas per chip).  Measured (BENCH.md "weight-storage
        dtype study"): at the weight-bound serving shape, bf16 storage
        is latency-PARITY with f32 — storage dtype is a capacity knob,
        not a latency one — and int8 (``QuantizedMLP``) remains the 4x
        capacity point.  Activations still compute at the model's
        ``precision``; the final softmax runs in f32."""
        ws = tuple(w.astype(dtype) for w in self.weights)
        bs = tuple(b.astype(dtype) for b in self.biases)
        return FusedMLP(ws, bs, self.acts, self.softmax_out,
                        self.precision, self.loss_kind)

    def to_params(self) -> Tuple[Any, ...]:
        out: List[Any] = []
        for w, b in zip(self.weights, self.biases):
            out += [w, b]
        return tuple(out)

    # -- forward -----------------------------------------------------------
    def _layers_forward(self, x, weights, biases):
        h = x
        n = len(weights)
        for k in range(n):
            act = self.acts[k]
            if k == n - 1 and self.softmax_out:
                z = fused_linear(h, weights[k], biases[k], "identity",
                                 self.precision)
                h = jax.nn.softmax(z, axis=-1)
            else:
                h = fused_linear(h, weights[k], biases[k], act, self.precision)
        return h

    def forward_fn(self) -> Callable:
        """Jitted layer-by-layer fused forward (differentiable)."""
        fn = self._cache.get("fwd")
        if fn is None:
            fn = jax.jit(lambda x, ws, bs: self._layers_forward(x, ws, bs))
            self._cache["fwd"] = fn
        return fn

    def run(self, x) -> Any:
        return self.forward_fn()(x, self.weights, self.biases)

    def _xla_layers_forward(self, x, weights, biases):
        """Same network via raw XLA ops — the compiler's own GEMM+epilogue
        fusion wins over the hand kernels at batch >=64 (BENCH.md)."""
        h = x
        n = len(weights)
        for k in range(n):
            z = h @ weights[k].T + biases[k]
            if k == n - 1 and self.softmax_out:
                h = jax.nn.softmax(z, axis=-1)
            else:
                h = _act_fn(self.acts[k])(z)
        return h

    def run_xla(self, x) -> Any:
        fn = self._cache.get("fwd_xla")
        if fn is None:
            fn = jax.jit(lambda x, ws, bs: self._xla_layers_forward(x, ws, bs))
            self._cache["fwd_xla"] = fn
        return fn(x, self.weights, self.biases)

    def run_fused_inference(self, x) -> Any:
        """Whole-network single-kernel forward (weights VMEM-resident)."""
        fn = self._cache.get("fwd1")
        if fn is None:
            fn = jax.jit(
                lambda x, ws, bs: fused_mlp_forward(
                    x, ws, bs, self.acts, self.softmax_out,
                    precision=self.precision,
                )
            )
            self._cache["fwd1"] = fn
        return fn(x, self.weights, self.biases)

    # -- training -----------------------------------------------------------
    def _loss(self, x, y, weights, biases):
        p = self._layers_forward(x, weights, biases)
        if self.loss_kind == "mse":
            return jnp.mean(jnp.sum((y - p) ** 2, axis=-1))
        eps = jnp.asarray(1e-30, p.dtype)  # match crossEntropy = -<log p, y>
        return -jnp.mean(jnp.sum(y * jnp.log(p + eps), axis=-1))

    def step_fn(self) -> Callable:
        """Jitted fused minibatch SGD step
        ``fn(rate, xb, yb, ws, bs) -> (loss, ws', bs')``."""
        fn = self._cache.get("step")
        if fn is None:

            def step(rate, xb, yb, ws, bs):
                v, (gw, gb) = jax.value_and_grad(
                    lambda ws, bs: self._loss(xb, yb, ws, bs), argnums=(0, 1)
                )(ws, bs)
                ws = tuple(w - rate * g for w, g in zip(ws, gw))
                bs = tuple(b - rate * g for b, g in zip(bs, gb))
                return v, ws, bs

            fn = jax.jit(step)
            self._cache["step"] = fn
        return fn

    def train(self, rate: float, xb, yb) -> Tuple[float, "FusedMLP"]:
        v, ws, bs = self.step_fn()(rate, xb, yb, self.weights, self.biases)
        m = FusedMLP(ws, bs, self.acts, self.softmax_out, self.precision,
                     self.loss_kind, self._cache)
        return v, m

    def train_fullfused(self, rate: float, xb, yb) -> Tuple[float, "FusedMLP"]:
        """The ENTIRE SGD step (forward, backward, update) as one Pallas
        kernel — weights and gradient accumulators VMEM-resident for the
        whole step (``fused_mlp_train_step``).  softmax output +
        cross-entropy (the flagship configuration), or — with
        ``softmax_out=False`` and ``loss_kind="mse"`` — ``acts[-1]``
        output + squared error (the autoencoder configuration); exact to
        f32 ulp vs XLA autodiff, ~1.3x faster at large batch."""
        if self.softmax_out:
            kind = "softmax_xent"
            if self.loss_kind == "mse":
                raise ValueError("mse loss needs softmax_out=False")
        elif self.loss_kind == "mse":
            kind = "squared_error"
        else:
            raise ValueError(
                "train_fullfused supports softmax+ce or mse without softmax")
        from ..ops.pallas_kernels import fused_mlp_train_step

        fn = self._cache.get(("fullstep", kind))
        if fn is None:
            fn = jax.jit(
                lambda xb, yb, ws, bs, rate: fused_mlp_train_step(
                    xb, yb, list(ws), list(bs), rate, self.acts,
                    precision=self.precision, loss_kind=kind,
                )
            )
            self._cache[("fullstep", kind)] = fn
        v, ws, bs = fn(xb, yb, self.weights, self.biases, rate)
        m = FusedMLP(tuple(ws), tuple(bs), self.acts, self.softmax_out,
                     self.precision, self.loss_kind, self._cache)
        return float(v), m


@dataclass
class FusedAutoencoder:
    """Fused autoencoder: the encoder>>decoder ffLayer chain as one
    FusedMLP trained on reconstruction (target = input) with the
    whole-step Pallas kernel — the kernel-fused executor for
    ``Encoder``/``trainEncoder`` (``AutoEncoder.hs:87-110``).

    ``n_enc`` records where the encoder's layer stack ends so the model
    converts back to the staged-IR ``Encoder`` for parity checks."""

    mlp: FusedMLP
    n_enc: int

    @classmethod
    def from_encoder(cls, enc, precision: str = "default"
                     ) -> "FusedAutoencoder":
        fe = FusedMLP.from_network(enc.encoder, softmax_out=False,
                                   precision=precision)
        fd = FusedMLP.from_network(enc.decoder, softmax_out=False,
                                   precision=precision)
        mlp = FusedMLP(fe.weights + fd.weights, fe.biases + fd.biases,
                       fe.acts + fd.acts, softmax_out=False,
                       precision=precision, loss_kind="mse")
        return cls(mlp, len(fe.weights))

    def to_encoder(self, enc):
        """Write trained params back into a template staged-IR Encoder."""
        from .feedforward import Network

        ps = self.mlp.to_params()
        ne = 2 * self.n_enc
        return type(enc)(
            Network(enc.encoder.op, ps[:ne], enc.encoder.act_names),
            Network(enc.decoder.op, ps[ne:], enc.decoder.act_names),
        )

    def encode_decode(self, x):
        return self.mlp.run(x)

    def train(self, rate: float, xb) -> Tuple[float, "FusedAutoencoder"]:
        """One whole-step-fused joint SGD step on reconstruction loss."""
        v, m = self.mlp.train_fullfused(rate, xb, xb)
        return v, FusedAutoencoder(m, self.n_enc)


@dataclass
class QuantizedMLP:
    """int8 serving model: per-channel symmetric quantization of every
    ffLayer weight, with two kernel modes:

    - ``mode="w8a8"`` (default): activations dynamically quantized
      per-row and BOTH operands fed to the MXU as int8
      (``int8 x int8 -> int32`` accumulate, ``fused_linear_w8a8``) —
      quarter the f32 weight HBM traffic AND no in-kernel dequantize.
      Measured v5e latency at the weight-streaming-bound shape
      (4096x4096x4 layers, batch 16): see BENCH.md serving table.
    - ``mode="w8"``: weight-only int8, dequantized to bf16 in-kernel
      (``fused_linear_w8``) — keeps f32-grade activation precision.
    """

    wqs: Tuple[Any, ...]
    scales: Tuple[Any, ...]
    biases: Tuple[Any, ...]
    acts: Tuple[str, ...]
    softmax_out: bool = True
    mode: str = "w8a8"

    _cache: dict = None

    def __post_init__(self):
        if self._cache is None:
            object.__setattr__(self, "_cache", {})
        if self.mode not in ("w8", "w8a8"):
            raise ValueError(f"unknown QuantizedMLP mode {self.mode!r}")

    @classmethod
    def from_fused(cls, fm: FusedMLP, mode: str = "w8a8") -> "QuantizedMLP":
        from ..ops.pallas_kernels import quantize_weights_int8

        qs, ss = zip(*(quantize_weights_int8(w) for w in fm.weights))
        return cls(tuple(qs), tuple(ss), fm.biases, fm.acts, fm.softmax_out,
                   mode)

    def run(self, x) -> Any:
        from ..ops.pallas_kernels import fused_linear_w8, fused_linear_w8a8

        if self.mode == "w8a8":
            layer = lambda h, wq, s, b, act: fused_linear_w8a8(h, wq, s, b, act)
        else:
            layer = lambda h, wq, s, b, act: fused_linear_w8(h, wq, s, b, act)

        fn = self._cache.get(("fwd", self.mode))
        if fn is None:

            def forward(x, wqs, scales, biases):
                h = x
                n = len(wqs)
                for k in range(n):
                    act = self.acts[k]
                    if k == n - 1 and self.softmax_out:
                        z = layer(h, wqs[k], scales[k], biases[k], "identity")
                        h = jax.nn.softmax(z, axis=-1)
                    else:
                        h = layer(h, wqs[k], scales[k], biases[k], act)
                return h

            fn = jax.jit(forward)
            self._cache[("fwd", self.mode)] = fn
        return fn(x, self.wqs, self.scales, self.biases)

    def run_fused(self, x) -> Any:
        """Whole-MLP int8 megakernel (``fused_mlp_w8a8_forward``): one
        pallas_call for ALL layers, activations VMEM-resident, in-kernel
        requantization between layers.  Requires a uniform-width stack
        (every layer N x N with N % 128 == 0) and one shared hidden
        activation — the serving-sweep shape; other nets use ``run``."""
        from ..ops.pallas_kernels import fused_mlp_w8a8_forward

        N = self.wqs[0].shape[1]
        if any(q.shape != (N, N) for q in self.wqs) or N % 128:
            raise ValueError("run_fused needs a uniform 128-multiple stack")
        hidden = set(self.acts[:-1])
        if len(hidden) > 1:
            raise ValueError(f"run_fused needs one hidden activation, got {hidden}")
        fn = self._cache.get("fwd_fused")
        if fn is None:
            from ..ops.pallas_kernels import _act_fn

            act = next(iter(hidden)) if hidden else "identity"
            last = self.acts[-1]

            def forward(x, wq3, sw2, b2):
                z = fused_mlp_w8a8_forward(x, wq3, sw2, b2, act)
                if self.softmax_out:
                    return jax.nn.softmax(z, axis=-1)
                # the kernel emits raw logits; the final elementwise
                # activation applies here so run_fused == run exactly
                return _act_fn(last)(z)

            fn = jax.jit(forward)
            self._cache["fwd_fused"] = fn
        stacked = self._cache.get("fwd_fused_stacked")
        if stacked is None:
            # pure function of the immutable model — stack once, not per
            # request (64 MB of device copies per call at serving sizes)
            stacked = (jnp.stack(self.wqs),
                       jnp.stack([s.reshape(-1) for s in self.scales]),
                       jnp.stack(self.biases))
            self._cache["fwd_fused_stacked"] = stacked
        return fn(x, *stacked)


@dataclass
class FusedRNN:
    """Fused Elman recurrent layer (the ``fullyConnected`` cell,
    ``Recurrent.hs:97-125``) driven by ``lax.scan`` over the fused Pallas
    step kernel; batched over sequences.  Parameters follow the reference
    layout: wS (o, o), wX (o, i), b (o,)."""

    wX: Any
    wS: Any
    b: Any
    s0: Any            # initial state (o,)
    act: str = "logistic"
    precision: str = "default"
    # "xla" fuses the two mat-vecs + bias + activation natively and wins
    # at every measured size (BENCH.md: 1.7 vs 2.4 us/step at o=256, 92
    # vs 103 us at o=2048); "pallas" keeps the hand kernel (custom VJP).
    impl: str = "xla"

    _cache: dict = None

    def __post_init__(self):
        if self._cache is None:
            object.__setattr__(self, "_cache", {})

    @classmethod
    def from_recurrent(cls, net, act: str = "logistic",
                       precision: str = "default") -> "FusedRNN":
        """From a single-layer ``fully_connected`` RecurrentNetwork."""
        wS, wX, b = (jnp.asarray(p, jnp.float32) for p in net.params)
        (s0,) = net.states
        return cls(wX, wS, jnp.asarray(b, jnp.float32),
                   jnp.asarray(s0, jnp.float32), act, precision)

    def _step_builder(self):
        """(wX, wS, b) -> scan step ``(s, xt) -> (s', y)`` with y = z
        pre-activation and s' = act(z), per the chosen ``impl``."""
        if self.impl == "pallas":
            from ..ops.pallas_kernels import fused_rnn_step

            def make(wX, wS, b):
                def step(s, xt):
                    y, snew = fused_rnn_step(xt[None], s[None], wX, wS, b,
                                             self.act, self.precision)
                    return snew[0], y[0]
                return step
        else:
            from ..ops.pallas_kernels import _act_fn
            act = _act_fn(self.act)

            def make(wX, wS, b):
                def step(s, xt):
                    z = wX @ xt + wS @ s + b
                    return act(z), z
                return step
        return make

    def seq_forward(self, xs):
        """xs: (n, i) -> (ys: (n, o) pre-activations, final state)."""
        fn = self._cache.get(("seq", self.impl))
        if fn is None:
            make = self._step_builder()

            def run(xs, wX, wS, b, s0):
                s_final, ys = jax.lax.scan(make(wX, wS, b), s0, xs)
                return ys, s_final

            fn = jax.jit(run)
            self._cache[("seq", self.impl)] = fn
        return fn(jnp.asarray(xs, jnp.float32), self.wX, self.wS, self.b, self.s0)

    def train(self, rate_state: float, rate_param: float, xs, targets
              ) -> Tuple[float, "FusedRNN"]:
        """One SGD step on the summed squared sequence loss with the
        reference's dual state/param rates (``trainNetwork'``)."""
        fn = self._cache.get(("train", self.impl))
        if fn is None:
            make = self._step_builder()

            def loss(wX, wS, b, s0, xs, tg):
                _, ys = jax.lax.scan(make(wX, wS, b), s0, xs)
                return jnp.sum((tg - ys) ** 2)

            def stepfn(rS, rP, wX, wS, b, s0, xs, tg):
                v, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
                    wX, wS, b, s0, xs, tg)
                return v, wX - rP * g[0], wS - rP * g[1], b - rP * g[2], \
                    s0 - rS * g[3]

            fn = jax.jit(stepfn)
            self._cache[("train", self.impl)] = fn
        v, wX, wS, b, s0 = fn(rate_state, rate_param, self.wX, self.wS,
                              self.b, self.s0,
                              jnp.asarray(xs, jnp.float32),
                              jnp.asarray(targets, jnp.float32))
        return float(v), FusedRNN(wX, wS, b, s0, self.act, self.precision,
                                  impl=self.impl, _cache=self._cache)
