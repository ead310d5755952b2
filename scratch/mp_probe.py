"""Probe: where does the flagship bf16 mixed-precision gap come from?
Arms (all batch 4096, flagship 784/300/100/10 unless noted):
  A vmapped-f32      (the round-3 headline path)
  B batched-f32      (batched-graph lowering, f32)
  C batched-bf16     (mixed_precision recipe: batch cast IN-GRAPH from
                      the f32 argument, per-step param casts — exactly
                      what make_opt_step(mixed_precision=True) compiles)
  C_arg batched-bf16 with the batch PRE-CAST to bf16 and passed as a
                      jit argument — the round-4 sweep's arm C.  XLA
                      assigns the bf16[4096,784] ENTRY parameter a
                      transposed {0,1} layout and every loop GEMM pays
                      for it (~+12-14us/step at the flagship); kept as
                      the artifact-control arm (BENCH.md round-5 MP
                      reconciliation, scratch/mp_bisect.py).
  D batched-bf16-res (bf16 params carried across steps — cast-free
                      steady state; batch still cast in-graph)
Interleaved min-of-N differential timing per BENCH.md.
"""
import json, math, sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import tensor_ops_tpu as T
from tensor_ops_tpu.models import cross_entropy
from tensor_ops_tpu.models.batched import batched_loss_graph
from tensor_ops_tpu.models.training import make_vmapped_grads
from tensor_ops_tpu.ops import ir
sys.path.insert(0, "/root/repo")
from bench import make_net, make_data

def make_arms(dims, batch):
    be = T.JaxBackend(); be_c = T.JaxBackend(dtype=jnp.bfloat16)
    from tensor_ops_tpu.backend.rng import Rng
    from tensor_ops_tpu.models import gen_net, act_logistic, act_softmax
    i, o = dims[0], dims[-1]
    net = gen_net(be, i, o, [(h, act_logistic()) for h in dims[1:-1]],
                  act_softmax(), Rng(be, seed=0))
    loss = cross_entropy(o)
    g = batched_loss_graph(net, loss, batch)
    assert g is not None
    r = np.random.default_rng(1)
    x = r.uniform(0, 1, size=(batch, i)).astype(np.float32)
    y = np.eye(o)[r.integers(0, o, size=batch)].astype(np.float32)
    xf, yf = jnp.asarray(x), jnp.asarray(y)
    xb, yb = jnp.asarray(x, jnp.bfloat16), jnp.asarray(y, jnp.bfloat16)
    pf = tuple(jnp.asarray(p, jnp.float32) for p in net.params)
    pb = tuple(jnp.asarray(p, jnp.bfloat16) for p in net.params)
    vmapped = make_vmapped_grads(net, loss, be)

    def arm_A(n_steps):
        @jax.jit
        def run(xf, yf, params):
            def body(i_, params):
                _, grads = vmapped(xf, yf, *params)
                return tuple(p - 0.02 * jnp.mean(gg, axis=0) for p, gg in zip(params, grads))
            return lax.fori_loop(0, n_steps, body, params)
        return lambda: float(jnp.sum(run(xf, yf, pf)[0]))

    def arm_B(n_steps):
        @jax.jit
        def run(xf, yf, params):
            def body(i_, params):
                _, grads = ir.value_and_grad(g, be, (xf,) + params + (yf,))
                return tuple(p - 0.02 * gg for p, gg in zip(params, grads[1:-1]))
            return lax.fori_loop(0, n_steps, body, params)
        return lambda: float(jnp.sum(run(xf, yf, pf)[0]))

    def arm_C(n_steps):
        @jax.jit
        def run(xf, yf, params):
            def body(i_, params):
                lp = tuple(p.astype(jnp.bfloat16) for p in params)
                _, grads = ir.value_and_grad(
                    g, be_c, (xf.astype(jnp.bfloat16),) + lp
                    + (yf.astype(jnp.bfloat16),))
                return tuple(p - 0.02 * gg.astype(jnp.float32) for p, gg in zip(params, grads[1:-1]))
            return lax.fori_loop(0, n_steps, body, params)
        return lambda: float(jnp.sum(run(xf, yf, pf)[0]))

    def arm_C_arg(n_steps):
        @jax.jit
        def run(xb, yb, params):
            def body(i_, params):
                lp = tuple(p.astype(jnp.bfloat16) for p in params)
                _, grads = ir.value_and_grad(g, be_c, (xb,) + lp + (yb,))
                return tuple(p - 0.02 * gg.astype(jnp.float32) for p, gg in zip(params, grads[1:-1]))
            return lax.fori_loop(0, n_steps, body, params)
        return lambda: float(jnp.sum(run(xb, yb, pf)[0]))

    def arm_D(n_steps):
        @jax.jit
        def run(xf, yf, params):
            def body(i_, params):
                _, grads = ir.value_and_grad(
                    g, be_c, (xf.astype(jnp.bfloat16),) + params
                    + (yf.astype(jnp.bfloat16),))
                return tuple(p - 0.02 * gg for p, gg in zip(params, grads[1:-1]))
            return lax.fori_loop(0, n_steps, body, params)
        return lambda: float(jnp.sum(run(xf, yf, pb)[0].astype(jnp.float32)))

    return dict(A=arm_A, B=arm_B, C=arm_C, C_arg=arm_C_arg, D=arm_D)

def interleaved_diff(arms, small, big, rounds=8):
    made = {k: (f(small), f(big)) for k, f in arms.items()}
    for lo, hi in made.values():
        lo(); hi()  # compile
    best = {k: [math.inf, math.inf] for k in made}
    for _ in range(rounds):
        for k, (lo, hi) in made.items():
            t0 = time.perf_counter(); lo(); best[k][0] = min(best[k][0], time.perf_counter() - t0)
            t0 = time.perf_counter(); hi(); best[k][1] = min(best[k][1], time.perf_counter() - t0)
    return {k: (b[1] - b[0]) / (big - small) for k, b in best.items()}

if __name__ == "__main__":
    batch = 4096
    dims = [int(d) for d in (sys.argv[1].split(",") if len(sys.argv) > 1 else "784,300,100,10".split(","))]
    small, big = 60, 300
    dts = interleaved_diff(make_arms(dims, batch), small, big)
    out = {k: round(batch / dt / 1e6, 2) for k, dt in dts.items()}
    print(json.dumps({"dims": dims, "batch": batch, "Msamples_per_s": out,
                      "us_per_step": {k: round(dt * 1e6, 2) for k, dt in dts.items()}}))
