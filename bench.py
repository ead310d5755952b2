#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Configs (BASELINE.md):
  1. Headline: flagship MNIST MLP (784->300->100->10, logistic + softmax,
     cross-entropy — ``/root/reference/app/MNIST.hs:89-104``) training
     throughput, framework transposition-AD path, batch 1024.
  2. Deep-MLP sweep: 8 fused 4096x4096 ffLayers (Pallas fused_linear),
     forward+backward, reported as TFLOP/s and % of v5e bf16 roofline.

Methodology: the accelerator sits behind a high-latency tunnel (~25 ms
per dispatch), so every measured loop runs *inside* one jitted program
(``lax.fori_loop``) and is synced by fetching a scalar.  The remaining
constant per-dispatch cost is cancelled by DIFFERENTIAL timing: each
bench times the same loop at two step counts and divides the wall-clock
DIFFERENCE by the step difference — the RTT term subtracts out exactly.
Every wall-clock sample is best-of-N (contention on the shared device
comes in bursts).  All loops carry their state (params / activations)
through the ``fori_loop`` so XLA cannot hoist the computation out as
loop-invariant.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
headline baseline is a BLAS-backed per-sample SGD on the same host (numpy
``@`` -> dgemv/dger, hand-written VJP) — the speed class of the
reference's actual hmatrix/C-BLAS path (``BTensor.hs:141-175``).  The
framework's own NumPy-oracle per-sample SGD (deliberately naive, the
NTensor analog) is reported separately as ``vs_numpy_oracle_baseline``.
"""

from __future__ import annotations

import json
import math
import os
import time

import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0


def _diff_time_per_step(make_loop, small: int, big: int, reps: int = 4) -> float:
    """Seconds per loop step with the constant dispatch cost cancelled.

    ``make_loop(steps)`` returns a zero-arg callable that runs the jitted
    loop and BLOCKS on a scalar fetch.  Timing ``big`` and ``small`` step
    counts and dividing the wall-clock difference by ``big - small``
    removes the tunnel RTT term that would otherwise inflate per-step
    time by RTT/steps."""
    lo, hi = make_loop(small), make_loop(big)
    lo(); hi()  # compile + warm both programs
    def wall(fn):
        best = math.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best
    return (wall(hi) - wall(lo)) / (big - small)


def make_net(be, seed=0):
    from tensor_ops_tpu.backend.rng import Rng
    from tensor_ops_tpu.models import act_logistic, act_softmax, gen_net

    rng = Rng(be, seed=seed)
    return gen_net(
        be, 784, 10,
        [(300, act_logistic()), (100, act_logistic())],
        act_softmax(), rng,
    )


def make_data(n, seed=1):
    r = np.random.default_rng(seed)
    x = r.uniform(0, 1, size=(n, 784))
    y = np.eye(10)[r.integers(0, 10, size=n)]
    return x, y


def bench_mnist_train(batch=1024, steps=2000):
    # steps must be large enough that the compute DIFFERENCE between the
    # two timed loops (4*steps*10us ~ 80ms) dwarfs tunnel jitter (~2ms).
    """IR transposition-AD minibatch SGD, whole loop in one XLA program."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    import tensor_ops_tpu as T
    from tensor_ops_tpu.models import cross_entropy
    from tensor_ops_tpu.ops import ir

    be = T.JaxBackend()
    net = make_net(be)
    loss = cross_entropy(10)
    composed = net._loss_op(loss)
    n_params = len(net.params)

    def sample_vag(x, y, *params):
        v, grads = ir.value_and_grad(composed, be, (x,) + params + (y,))
        return v, grads[1:-1]

    vmapped = jax.vmap(sample_vag, in_axes=(0, 0) + (None,) * n_params)

    x, y = make_data(batch)
    xb, yb = be.asarray(x), be.asarray(y)

    params = tuple(net.params)

    def make_loop(n_steps):
        @jax.jit
        def run_steps(xb, yb, params):
            def body(i, params):
                _, grads = vmapped(xb, yb, *params)
                return tuple(p - 0.02 * jnp.mean(g, axis=0)
                             for p, g in zip(params, grads))
            return lax.fori_loop(0, n_steps, body, params)
        return lambda: float(jnp.sum(run_steps(xb, yb, params)[0]))

    dt = _diff_time_per_step(make_loop, steps, 5 * steps)
    return 1.0 / dt, batch / dt


def bench_mnist_train_mixed(batch=4096, steps=500):
    """The flagship trained under fit's FORCED bf16 recipe
    (mixed_precision="bf16" — mixed_precision=True now auto-routes to
    f32 at this width, BENCH.md "crossover"): bf16
    forward/backward through the staged-IR transposition AD via the
    BATCHED-GRAPH lowering (models/batched.py — weight gradients are
    GEMMs by construction; the vmapped per-sample path materializes B
    stacked bf16 outer products that XLA-TPU only rewrites for f32,
    measured 70x slower), f32 master params updated from upcast
    gradients.

    The batch enters as f32 and is cast to bf16 IN-GRAPH — exactly
    what fit()'s recipe compiles.  Rounds 3-4 pre-cast the batch and
    passed a bf16 jit argument instead: XLA assigns that entry
    parameter a transposed {0,1} layout and every loop iteration's
    GEMMs pay ~14us/step reading it (BENCH.md round-5 "Mixed-precision
    reconciliation", scratch/mp_bisect.py) — this row read 45.9us/step
    (89.2M samples/s) under that artifact vs ~32us measured with the
    cast in-graph."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    import tensor_ops_tpu as T
    from tensor_ops_tpu.models import cross_entropy
    from tensor_ops_tpu.models.batched import batched_loss_graph
    from tensor_ops_tpu.ops import ir

    be = T.JaxBackend()
    be_c = T.JaxBackend(dtype=jnp.bfloat16)
    net = make_net(be)
    loss = cross_entropy(10)
    g = batched_loss_graph(net, loss, batch)
    assert g is not None

    x, y = make_data(batch)
    xf = jnp.asarray(x, jnp.float32)
    yf = jnp.asarray(y, jnp.float32)
    params = tuple(jnp.asarray(p, jnp.float32) for p in net.params)

    def make_loop(n_steps):
        @jax.jit
        def run_steps(xf, yf, params):
            def body(i, params):
                lp = tuple(p.astype(jnp.bfloat16) for p in params)
                _, grads = ir.value_and_grad(
                    g, be_c, (xf.astype(jnp.bfloat16),) + lp
                    + (yf.astype(jnp.bfloat16),))
                return tuple(
                    p - 0.02 * gg.astype(jnp.float32)
                    for p, gg in zip(params, grads[1:-1]))
            return lax.fori_loop(0, n_steps, body, params)
        return lambda: float(jnp.sum(run_steps(xf, yf, params)[0]))

    dt = _diff_time_per_step(make_loop, steps, 5 * steps)
    return 1.0 / dt, batch / dt


def bench_fused_deep(n=4096, layers=8, batch=4096, steps=10):
    """Deep fused-ffLayer sweep (BASELINE config 5): fwd+bwd through
    `layers` Pallas fused 4096x4096 linear+relu layers in bf16 (the
    TPU-native training dtype; the kernel accumulates in f32)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tensor_ops_tpu.ops.pallas_kernels import fused_linear

    r = np.random.default_rng(0)
    ws = tuple(
        jnp.asarray(r.normal(size=(n, n)) * (1.0 / np.sqrt(n)), dtype=jnp.bfloat16)
        for _ in range(layers)
    )
    bs = tuple(jnp.zeros((n,), jnp.bfloat16) for _ in range(layers))
    x = jnp.asarray(r.normal(size=(batch, n)), dtype=jnp.bfloat16)

    def net_loss(ws, bs, x):
        h = x
        for w, b in zip(ws, bs):
            h = fused_linear(h, w, b, "relu")
        return jnp.mean((h * h).astype(jnp.float32))

    grad_fn = jax.value_and_grad(net_loss, argnums=(0, 1))

    def make_loop(n_steps):
        @jax.jit
        def run_steps(ws, bs, x):
            def body(i, carry):
                ws, bs = carry
                _, (gw, gb) = grad_fn(ws, bs, x)
                ws = tuple(w - 1e-6 * g for w, g in zip(ws, gw))
                bs = tuple(b - 1e-6 * g for b, g in zip(bs, gb))
                return (ws, bs)
            return lax.fori_loop(0, n_steps, body, (ws, bs))
        return lambda: float(jnp.sum(run_steps(ws, bs, x)[0][0].astype(jnp.float32)))

    dt = _diff_time_per_step(make_loop, steps, 4 * steps)
    # fwd (2BNK) + bwd (2 matmuls: 4BNK) per layer
    flops = layers * 6 * batch * n * n
    tflops = flops / dt / 1e12
    return tflops, tflops / V5E_BF16_PEAK_TFLOPS


def bench_fused_matmul_roofline(n=4096, steps=60):
    """Single fused 4096x4096 linear+relu Pallas kernel on independent
    invocations (the standard throughput setting — no inter-layer
    dependency): the BASELINE 'fused matmul >=80% of v5e roofline' gate."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tensor_ops_tpu.ops.pallas_kernels import fused_linear

    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(n, n)), dtype=jnp.bfloat16)
    # Kaiming scale: a relu chain keeps unit variance, so x stays well
    # conditioned in bf16 no matter how many steps the loop runs.
    w = jnp.asarray(r.normal(size=(n, n)) * math.sqrt(2.0 / n),
                    dtype=jnp.bfloat16)
    b = jnp.zeros((n,), jnp.bfloat16)

    def make_loop(n_steps):
        # Each output IS the next input: the kernel is loop-carried, so XLA
        # cannot hoist it as loop-invariant, and the dependence costs nothing.
        @jax.jit
        def loop(x, w, b):
            return lax.fori_loop(
                0, n_steps, lambda i, x: fused_linear(x, w, b, "relu"), x)
        return lambda: float(loop(x, w, b)[0, 0].astype(jnp.float32))

    dt = _diff_time_per_step(make_loop, steps, 5 * steps)
    tflops = 2 * n * n * n / dt / 1e12
    return tflops, tflops / V5E_BF16_PEAK_TFLOPS


def bench_megakernel_train(batch=8192, steps=200):
    """Whole-training-step mega-kernel (fwd+bwd+SGD in ONE pallas_call,
    weights + grad accumulators VMEM-resident)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tensor_ops_tpu.ops.pallas_kernels import fused_mlp_train_step

    r = np.random.default_rng(0)
    dims = [784, 300, 100, 10]
    ws = tuple(
        jnp.asarray(r.normal(size=(dims[k + 1], dims[k])) * 0.1, jnp.float32)
        for k in range(3)
    )
    bs = tuple(jnp.asarray(r.normal(size=(dims[k + 1],)) * 0.1, jnp.float32)
               for k in range(3))
    x, y = make_data(batch)
    xb = jnp.asarray(x, jnp.float32)
    yb = jnp.asarray(y, jnp.float32)

    def make_loop(n_steps):
        @jax.jit
        def loop(ws, bs, xb, yb):
            def body(i, carry):
                ws, bs = carry
                _, nws, nbs = fused_mlp_train_step(
                    xb, yb, list(ws), list(bs), 0.02,
                    ["logistic", "logistic", "identity"])
                return (tuple(nws), tuple(nbs))
            return lax.fori_loop(0, n_steps, body, (ws, bs))
        return lambda: float(jnp.sum(loop(ws, bs, xb, yb)[0][0]))

    dt = _diff_time_per_step(make_loop, steps, 5 * steps)
    return 1.0 / dt, batch / dt


def bench_int8_serving(n=4096, layers=4, batch=16):
    """int8 serving megakernel at the weight-streaming-bound shape
    (BENCH.md int8 table): whole uniform MLP in one pallas_call,
    int8 x int8 -> int32 on the MXU, activations VMEM-resident."""
    import jax.numpy as jnp

    from tensor_ops_tpu.ops.pallas_kernels import (
        fused_mlp_w8a8_forward,
        quantize_weights_int8,
    )
    from tensor_ops_tpu.utils.profiling import measure_loop

    r = np.random.default_rng(0)
    ws = [jnp.asarray(r.normal(size=(n, n)) * math.sqrt(2.0 / n), jnp.float32)
          for _ in range(layers)]
    qs, ss = zip(*(quantize_weights_int8(w) for w in ws))
    wq3 = jnp.stack(qs)
    sw2 = jnp.stack([s.reshape(-1) for s in ss])
    b2 = jnp.stack([jnp.zeros((n,), jnp.float32) for _ in range(layers)])
    x = jnp.asarray(r.normal(size=(batch, n)), jnp.float32)
    m = measure_loop(
        lambda h, wq3, sw2, b2: fused_mlp_w8a8_forward(h, wq3, sw2, b2, "relu"),
        x, steps=(50, 250), reps=6, args=(wq3, sw2, b2))
    dt = m["per_step_s"]
    return dt * 1e6, layers * n * n / dt / 1e9  # us/fwd, GB/s int8 stream


def bench_fit_realized(n=65536, batch=4096, epochs=51200):
    """Realized end-to-end ``fit()`` throughput: wall clock over the FULL
    production loop (loader, lr schedule, log cadence, snapshot rebind)
    with step chaining + shuffle-once device batches — the number a user
    of ``fit()`` actually gets, next to the fori_loop step-rate headline
    (BENCH.md 'fit() realized end-to-end throughput').  The loop being
    productionized matches ``/root/reference/app/MNIST.hs:390-396``."""
    import tensor_ops_tpu as T
    from tensor_ops_tpu.models import cross_entropy, fit, sgd

    be = T.JaxBackend()
    net = make_net(be)
    X, Y = make_data(n)
    steps = epochs * (n // batch)
    t0 = time.perf_counter()
    res = fit(net, cross_entropy(10), be, X, Y, epochs=epochs,
              batch_size=batch, lr=0.02, optimizer=sgd(),
              chain_steps="auto", chain_shuffle="device_fixed",
              log_every=3200, verbose=False)
    for p in res.net.params:
        np.asarray(p)  # sync: realized wall includes the final fetch
    wall = time.perf_counter() - t0
    return steps, steps * batch / wall


def _wait_for_quiet(max_wait_s: float = 90.0) -> bool:
    """Block (bounded) until the 1-minute load average drops below the
    core count; returns True if the host is quiet.  Contention only
    ever SLOWS the CPU denominator benches, so measuring into a loaded
    host halves the baseline and doubles the headline multiplier (the
    round-2 228k-vs-117k swing, BENCH.md)."""
    deadline = time.monotonic() + max_wait_s
    while True:
        try:
            quiet = os.getloadavg()[0] < (os.cpu_count() or 1)
        except OSError:
            return True
        if quiet or time.monotonic() > deadline:
            return quiet
        time.sleep(5.0)


def _stable_reps(fn, reps: int = 5, extra_under_load: int = 2):
    """Best-of-``reps`` samples of a CPU throughput benchmark, with a
    wait-for-quiet load guard.

    Contention noise is strictly one-sided (a loaded host cannot make
    BLAS faster), so the MAX over reps estimates the machine's true
    capability and is far more stable than any single draw; the guard
    waits (bounded) for background load to drain first, and takes extra
    reps if it never does.  Returns ``(best, lo, hi, quiet)`` — the
    range shows honest rep-to-rep spread, ``quiet`` records whether the
    host ever went idle (False = the baseline may still be depressed
    and the headline multiplier overstated)."""
    quiet = _wait_for_quiet()
    if not quiet:
        reps += extra_under_load
    vals = sorted(fn() for _ in range(reps))
    return vals[-1], vals[0], vals[-1], quiet


def bench_cpu_baseline(n_samples=60):
    """Per-sample SGD on the NumPy float64 oracle — the reference-shaped
    CPU path (per-sample SGD over dense kernels)."""
    import tensor_ops_tpu as T
    from tensor_ops_tpu.models import cross_entropy

    be = T.NumpyBackend()
    net = make_net(be)
    loss = cross_entropy(10)
    x, y = make_data(n_samples, seed=2)
    net = net.train(loss, 0.02, be, x[0], y[0])
    t0 = time.perf_counter()
    m = net
    for k in range(1, n_samples):
        m = m.train(loss, 0.02, be, x[k], y[k])
    dt = time.perf_counter() - t0
    return (n_samples - 1) / dt


def bench_cpu_blas_baseline(n_samples=3000):
    """Per-sample SGD with every matmul a BLAS ``dgemv``/``dger`` via
    numpy ``@`` — the HONEST stand-in for the reference's actual hmatrix
    path (``BTensor.hs:141-175`` dispatching to C BLAS): hand-written
    forward + backward for the flagship 784/300/100/10 logistic/softmax/
    cross-entropy net, one sample at a time, f64 like hmatrix's HMatD."""
    r = np.random.default_rng(0)
    dims = [784, 300, 100, 10]
    Ws = [r.normal(0, 0.5, size=(dims[k + 1], dims[k])) for k in range(3)]
    bs = [r.normal(0, 0.5, size=(dims[k + 1],)) for k in range(3)]
    x, y = make_data(n_samples, seed=2)
    lr = 0.02

    def sigmoid(z):
        return 1.0 / (1.0 + np.exp(-z))

    def step(xi, yi):
        z1 = Ws[0] @ xi + bs[0]; a1 = sigmoid(z1)
        z2 = Ws[1] @ a1 + bs[1]; a2 = sigmoid(z2)
        z3 = Ws[2] @ a2 + bs[2]
        e = np.exp(z3 - z3.max()); p = e / e.sum()
        d3 = p - yi                       # softmax+CE fused gradient
        d2 = (Ws[2].T @ d3) * a2 * (1 - a2)
        d1 = (Ws[1].T @ d2) * a1 * (1 - a1)
        Ws[2] -= lr * np.outer(d3, a2); bs[2] -= lr * d3
        Ws[1] -= lr * np.outer(d2, a1); bs[1] -= lr * d2
        Ws[0] -= lr * np.outer(d1, xi); bs[0] -= lr * d1

    step(x[0], y[0])  # warm caches
    t0 = time.perf_counter()
    for k in range(1, n_samples):
        step(x[k], y[k])
    dt = time.perf_counter() - t0
    return (n_samples - 1) / dt


_PROBE_SRC = """
import json
import jax
import jax.extend.backend
import jax.numpy as jnp
import jaxlib

d = jax.devices()[0]
assert float(jnp.ones((8,)).sum()) == 8.0  # real round-trip
backend = jax.extend.backend.get_backend()
print("PROVENANCE " + json.dumps(dict(
    device_kind=d.device_kind,
    platform=d.platform,
    n_devices=jax.device_count(),
    jax_version=jax.__version__,
    jaxlib_version=jaxlib.__version__,
    # for TPU this carries the libtpu build the runtime actually
    # loaded -- the mismatch detector
    platform_version=str(getattr(backend, "platform_version", "unknown")),
)))
"""


def _provenance(timeout_s: float = 300.0, attempts: int = 3) -> dict:
    """Device + client version stamp for the bench JSON — and a LOUD
    preflight.  A libtpu client/terminal version mismatch (or a wedged
    tunnel) can make the device silently unreachable mid-session
    (observed round 4: every call hung); a bench that half-runs or
    reports stale numbers in that state is worse than one that fails.
    The probe runs a real tiny computation in a SUBPROCESS under a
    watchdog — a hung backend init is process-global, so retrying in a
    fresh process is the only retry that can succeed (a transiently
    wedged tunnel recovers between attempts; observed round 5).  All
    attempts exhausted => exit(2) with a diagnostic, never a partial
    JSON line."""
    import subprocess
    import sys

    last = "timeout"
    for i in range(attempts):
        if i:
            print(f"bench.py: preflight attempt {i} failed ({last}); "
                  f"retrying in 30s...", file=sys.stderr)
            time.sleep(30.0)
        try:
            out = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                capture_output=True, text=True, timeout=timeout_s)
        except subprocess.TimeoutExpired:
            last = f"no device round-trip within {timeout_s:.0f}s"
            continue
        for line in out.stdout.splitlines():
            if line.startswith("PROVENANCE "):
                return json.loads(line[len("PROVENANCE "):])
        last = (f"probe exited rc={out.returncode}: "
                f"{(out.stderr or out.stdout).strip()[-300:]}")
    print(
        f"bench.py: device preflight FAILED after {attempts} attempts "
        f"(last: {last}) — the accelerator is unreachable (wedged tunnel "
        f"or libtpu client/runtime version mismatch).  Refusing to emit "
        f"numbers.", file=sys.stderr)
    raise SystemExit(2)


def main():
    provenance = _provenance()
    steps_per_sec, samples_per_sec = bench_mnist_train()
    steps4k, samples4k = bench_mnist_train(batch=4096, steps=500)
    steps_bf16, samples_bf16 = bench_mnist_train_mixed()
    mk_steps, mk_samples = bench_megakernel_train()
    deep_tflops, roofline = bench_fused_deep()
    mm_tflops, mm_roofline = bench_fused_matmul_roofline()
    int8_us, int8_gbps = bench_int8_serving()
    fit_steps, fit_rate = bench_fit_realized()
    base = bench_cpu_baseline()
    # the headline denominator: best-of-5 behind a wait-for-quiet load
    # guard, so the multiplier is the machine's capability instead of a
    # per-run lottery against host contention (round-2 saw a 2x swing
    # from a single-run baseline; contention noise is one-sided)
    blas_base, blas_lo, blas_hi, blas_quiet = _stable_reps(
        bench_cpu_blas_baseline)
    # bf16-mixed counts: it is fit(mixed_precision="bf16")'s production
    # recipe (bf16 compute, f32 masters), not a degraded configuration;
    # mixed_precision=True auto-routes AWAY from it at this width
    # (measured crossover ~2048-wide, BENCH.md round 4)
    best_samples = max(samples_per_sec, samples4k, samples_bf16, mk_samples)
    result = {
        "metric": "mnist_mlp_train_throughput",
        "value": round(best_samples, 1),
        "unit": "samples/s",
        # headline denominator: the BLAS per-sample path (the reference's
        # hmatrix-class speed), NOT the deliberately naive oracle
        "vs_baseline": round(best_samples / blas_base, 2),
        "detail": {
            "cpu_blas_per_sample_sgd_samples_per_sec": round(blas_base, 1),
            "cpu_blas_baseline_range_samples_per_sec": [
                round(blas_lo, 1), round(blas_hi, 1)],
            "cpu_baseline_host_was_quiet": blas_quiet,
            "vs_baseline_range": [round(best_samples / blas_hi, 2),
                                  round(best_samples / blas_lo, 2)],
            "vs_numpy_oracle_baseline": round(best_samples / base, 2),
            "ir_xla_batch1024_steps_per_sec": round(steps_per_sec, 2),
            "ir_xla_batch1024_samples_per_sec": round(samples_per_sec, 1),
            "ir_xla_batch4096_steps_per_sec": round(steps4k, 2),
            "ir_xla_batch4096_samples_per_sec": round(samples4k, 1),
            "ir_xla_bf16mixed_batch4096_steps_per_sec": round(steps_bf16, 2),
            "ir_xla_bf16mixed_batch4096_samples_per_sec": round(samples_bf16, 1),
            "megakernel_batch8192_steps_per_sec": round(mk_steps, 2),
            "megakernel_batch8192_samples_per_sec": round(mk_samples, 1),
            "cpu_oracle_per_sample_sgd_samples_per_sec": round(base, 1),
            "deep_fused_mlp_tflops": round(deep_tflops, 1),
            "deep_fused_mlp_pct_of_v5e_bf16_peak": round(100 * roofline, 1),
            "fused_matmul_tflops": round(mm_tflops, 1),
            "fused_matmul_pct_of_v5e_bf16_peak": round(100 * mm_roofline, 1),
            "serving_w8a8_megakernel_us_per_fwd_4x4096": round(int8_us, 1),
            "serving_w8a8_weight_stream_gbps": round(int8_gbps, 0),
            # realized PRODUCT number: full fit() loop wall clock (not a
            # fori_loop step rate) — see BENCH.md "fit() realized
            # end-to-end throughput"
            "fit_realized_samples_per_sec": round(fit_rate, 1),
            "fit_realized_steps": fit_steps,
            "provenance": provenance,
        },
    }
    print(json.dumps(result))


def autotune_main():
    """``bench.py --autotune``: re-derive the tile cache for this
    device — sweep the three bench kernels (fused matmul roofline,
    deep-sweep save_z layer, flagship megakernel), persist winners to
    ``~/.cache/tensor_ops_tpu/tiles.json``, and print the entries.  Run
    once per device generation; subsequent bench/train runs consume the
    winners through ``pick_tiles``' trace-time cache probe."""
    import jax.numpy as jnp

    from tensor_ops_tpu.ops.autotune import (
        autotune_linear,
        autotune_mlp_train_step,
        default_cache_path,
    )

    print("tuning fused matmul 4096^3 bf16 (no z)...")
    w0 = autotune_linear(4096, 4096, 4096, save_z=False,
                         dtype=jnp.bfloat16, act="relu", verbose=True)
    print("tuning deep-sweep layer 4096^3 bf16 (save_z)...")
    w1 = autotune_linear(4096, 4096, 4096, save_z=True,
                         dtype=jnp.bfloat16, act="relu", verbose=True)
    print("tuning megakernel 784/300/100/10 @ 8192...")
    w2 = autotune_mlp_train_step(
        8192, [784, 300, 100, 10],
        ["logistic", "logistic", "logistic"], verbose=True)
    print(json.dumps({"cache": default_cache_path(),
                      "linear": list(w0), "linear_save_z": list(w1),
                      "megakernel_block_b": w2}))


if __name__ == "__main__":
    import sys

    if "--autotune" in sys.argv[1:]:
        autotune_main()
    else:
        main()
