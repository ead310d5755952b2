"""Reconcile the two flagship mixed-precision measurements (VERDICT r4 #2).

BENCH.md held two numbers for "the flagship step, f32 vs bf16" that a
reader could not reconcile:

  * the round-4 width sweep (scratch/mp_probe.py): RAW SGD GRADIENT
    steps — value_and_grad + `p - lr*g`, no optimizer object, own
    interleaved-differential harness -> f32 32.4us vs bf16 45.0us
    (bf16 loses 39%);
  * the shipped router (trainer._measure_mp_route): the FULL
    PRODUCTION optimizer step fit() compiles (make_opt_step: loss
    value + grads + optimizer update, donation) -> f32 31.6us vs
    bf16 31.1us (near-tie).

This probe runs ALL arms through the ONE harness the router itself
uses (`_measure_mp_route`, loop-carried differential, interleaved
min-of-3, escalating n) at the identical flagship
(784->300->100->10, batch 4096):

  raw_sgd      value_and_grad + p-lr*g   (the width sweep's arm class)
  optstep_sgd  make_opt_step(..., sgd()) (production step, no moments)
  optstep_adam make_opt_step(..., adam())(production step, f32 moments)

each as an (f32, bf16) pair, where bf16 is the mixed_precision recipe
(batched-graph lowering, bf16 compute, f32 masters) and f32 is the
same path make_opt_step(mixed_precision=False) compiles.

Run serially on the TPU:  python scratch/mp_reconcile.py
"""
from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402

import tensor_ops_tpu as T  # noqa: E402
from bench import make_data, make_net  # noqa: E402
from tensor_ops_tpu.models import adam, cross_entropy, sgd  # noqa: E402
from tensor_ops_tpu.models.batched import batched_loss_graph  # noqa: E402
from tensor_ops_tpu.models.trainer import (  # noqa: E402
    _measure_mp_route, make_opt_step)
from tensor_ops_tpu.models.training import make_vmapped_grads  # noqa: E402
from tensor_ops_tpu.ops import ir  # noqa: E402

BATCH = 4096


def main():
    be = T.JaxBackend()
    net = make_net(be)
    loss = cross_entropy(10)
    x, y = make_data(BATCH)
    xb, yb = jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)
    params = tuple(jnp.asarray(p, jnp.float32) for p in net.params)
    out = {}

    # --- raw SGD gradient step (the width sweep's arm class) ---------
    vmapped = make_vmapped_grads(net, loss, be)
    g_batched = batched_loss_graph(net, loss, BATCH)
    assert g_batched is not None

    def raw_f32(lr, xb, yb, *ps):
        _, grads = vmapped(xb, yb, *ps)
        return (0.0,) + tuple(p - lr * jnp.mean(gg, axis=0)
                              for p, gg in zip(ps, grads))

    def raw_bf16(lr, xb, yb, *ps):
        lp = tuple(p.astype(jnp.bfloat16) for p in ps)
        _, grads = ir.value_and_grad(
            g_batched, be, (xb.astype(jnp.bfloat16),) + lp
            + (yb.astype(jnp.bfloat16),))
        return (0.0,) + tuple(
            p - lr * gg.astype(jnp.float32)
            for p, gg in zip(ps, grads[1:-1]))

    f32_us, bf16_us = _measure_mp_route(
        raw_f32, raw_bf16, (0.02, xb, yb) + params, carry_from=3)
    out["raw_sgd"] = dict(f32_us=round(f32_us, 2), bf16_us=round(bf16_us, 2))
    print(json.dumps({"raw_sgd": out["raw_sgd"]}), flush=True)

    # --- full production optimizer steps (the router's arm class) ----
    for name, opt_f in (("optstep_sgd", sgd), ("optstep_adam", adam)):
        opt = opt_f()
        sf = make_opt_step(net, loss, be, opt, mixed_precision=False)
        sb = make_opt_step(net, loss, be, opt, mixed_precision=True)
        opt_state = opt.init(params)
        f32_us, bf16_us = _measure_mp_route(
            sf, sb, (0.02, xb, yb, opt_state, params), carry_from=3)
        out[name] = dict(f32_us=round(f32_us, 2),
                         bf16_us=round(bf16_us, 2))
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps(dict(tag="ALL", batch=BATCH, **out)))


if __name__ == "__main__":
    main()
