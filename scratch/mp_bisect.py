"""Bisect WHY the same bf16 payload reads 46us in mp_probe's loop and
34us in _measure_mp_route's loop (both differentials >> tunnel jitter,
so this is a compiled-program difference, not a timing artifact).

Axes between the two loop constructions (payload identical: batched
graph `g` via be_c, f32 master params carried, f32 update):

  inputs:  xb/yb passed ALREADY bf16 (old)  vs  f32 + cast in body (router)
  n:       static python int, one compile per n (old)  vs  traced bound (router)
  lr:      0.02 python const closed over (old)  vs  traced f32 scalar (router)

Arms (all timed identically: min-of-6 interleaved walls at n=600/3000,
per-step = slope):

  base_old        bf16 inputs, static n, const lr    (mp_probe arm C)
  cast_in_body    f32 inputs cast in body, static n, const lr
  traced_n        bf16 inputs, TRACED n, const lr
  traced_all      f32 inputs, traced n, traced lr    (router construction)

Also dumps compiled-HLO op histograms (dot/convert/fusion counts and
the dot operand dtypes) for base_old vs traced_all.

Run on the TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scratch/mp_bisect.py
"""
from __future__ import annotations

import json
import math
import re
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

import tensor_ops_tpu as T  # noqa: E402
from bench import make_data, make_net  # noqa: E402
from tensor_ops_tpu.backend.jax_backend import JaxBackend  # noqa: E402
from tensor_ops_tpu.models import cross_entropy  # noqa: E402
from tensor_ops_tpu.models.batched import batched_loss_graph  # noqa: E402
from tensor_ops_tpu.ops import ir  # noqa: E402

BATCH = 4096
SMALL, BIG = 600, 3000


def main():
    be = T.JaxBackend()
    be_c = JaxBackend(dtype=jnp.bfloat16)
    net = make_net(be)
    loss = cross_entropy(10)
    x, y = make_data(BATCH)
    xf, yf = jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)
    xb, yb = xf.astype(jnp.bfloat16), yf.astype(jnp.bfloat16)
    pf = tuple(jnp.asarray(p, jnp.float32) for p in net.params)
    g = batched_loss_graph(net, loss, BATCH)
    assert g is not None

    def body_update(params, grads):
        return tuple(p - 0.02 * gg.astype(jnp.float32)
                     for p, gg in zip(params, grads[1:-1]))

    def make_base_old(n):
        @jax.jit
        def run(xb, yb, params):
            def body(_i, params):
                lp = tuple(p.astype(jnp.bfloat16) for p in params)
                _, grads = ir.value_and_grad(g, be_c, (xb,) + lp + (yb,))
                return body_update(params, grads)
            return lax.fori_loop(0, n, body, params)
        return run, lambda: float(jnp.sum(run(xb, yb, pf)[0]))

    def make_cast_in_body(n):
        @jax.jit
        def run(xf, yf, params):
            def body(_i, params):
                lp = tuple(p.astype(jnp.bfloat16) for p in params)
                _, grads = ir.value_and_grad(
                    g, be_c, (xf.astype(jnp.bfloat16),) + lp
                    + (yf.astype(jnp.bfloat16),))
                return body_update(params, grads)
            return lax.fori_loop(0, n, body, params)
        return run, lambda: float(jnp.sum(run(xf, yf, pf)[0]))

    def make_traced_n():
        @jax.jit
        def run(xb, yb, params, n):
            def body(_i, params):
                lp = tuple(p.astype(jnp.bfloat16) for p in params)
                _, grads = ir.value_and_grad(g, be_c, (xb,) + lp + (yb,))
                return body_update(params, grads)
            return lax.fori_loop(0, n, body, params)
        return run, lambda n: float(jnp.sum(run(xb, yb, pf, n)[0]))

    def make_traced_all():
        @jax.jit
        def run(lr, xf, yf, params, n):
            def body(_i, params):
                lp = tuple(p.astype(jnp.bfloat16) for p in params)
                _, grads = ir.value_and_grad(
                    g, be_c, (xf.astype(jnp.bfloat16),) + lp
                    + (yf.astype(jnp.bfloat16),))
                return tuple(p - lr * gg.astype(jnp.float32)
                             for p, gg in zip(params, grads[1:-1]))
            return lax.fori_loop(0, n, body, params)
        return run, lambda n: float(jnp.sum(run(0.02, xf, yf, pf, n)[0]))

    arms = {}
    run_lo, lo = make_base_old(SMALL)
    run_hi, hi = make_base_old(BIG)
    arms["base_old"] = (lo, hi, run_hi)
    _, lo = make_cast_in_body(SMALL)
    run_hi2, hi = make_cast_in_body(BIG)
    arms["cast_in_body"] = (lo, hi, run_hi2)
    run_tn, f = make_traced_n()
    arms["traced_n"] = (lambda: f(SMALL), lambda: f(BIG), run_tn)
    run_ta, f2 = make_traced_all()
    arms["traced_all"] = (lambda: f2(SMALL), lambda: f2(BIG), run_ta)

    for lo, hi, _ in arms.values():
        lo(); hi()  # compile
    best = {k: [math.inf, math.inf] for k in arms}
    for _ in range(6):
        for k, (lo, hi, _) in arms.items():
            t0 = time.perf_counter(); lo()
            best[k][0] = min(best[k][0], time.perf_counter() - t0)
            t0 = time.perf_counter(); hi()
            best[k][1] = min(best[k][1], time.perf_counter() - t0)
    out = {k: round((b[1] - b[0]) / (BIG - SMALL) * 1e6, 2)
           for k, b in best.items()}
    print(json.dumps({"us_per_step": out}), flush=True)

    # HLO histograms of the two endpoints
    def histo(run, args):
        txt = jax.jit(run).lower(*args).compile().as_text()
        dots = re.findall(r"= *(\w+\[[^\]]*\]) (?:dot|convolution)\(", txt)
        convs = len(re.findall(r" convert\(", txt))
        fus = len(re.findall(r" fusion\(", txt))
        # count dtype of every dot output
        from collections import Counter
        return dict(dot_outs=dict(Counter(d.split("[")[0] for d in dots)),
                    n_dot=len(dots), n_convert=convs, n_fusion=fus,
                    bytes=len(txt))
    h_old = histo(lambda xb, yb, p: arms["base_old"][2](xb, yb, p),
                  (xb, yb, pf))
    h_new = histo(lambda lr, xf, yf, p, n: arms["traced_all"][2](
        lr, xf, yf, p, n), (0.02, xf, yf, pf, BIG))
    print(json.dumps({"hlo_base_old": h_old, "hlo_traced_all": h_new}))


if __name__ == "__main__":
    main()
