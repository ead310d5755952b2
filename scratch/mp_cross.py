"""Cross harness x payload to finish the flagship MP reconciliation.

mp_reconcile.py's raw_bf16 arm passed the f32 backend `be` to
ir.value_and_grad — the cotangent seed is be.ones (f32) and gmul
casts through be.dtype, so the whole backward PROMOTED to f32: that
arm measured an f32 program wearing bf16 leaves (34.9us ~= f32).
This probe redoes the raw arms with the CORRECT bf16 backend (the
production recipe's be_c) and runs every payload under the router's
loop-carried harness, so the one remaining axis is payload:

  raw_f32        vmapped f32 grads + p-lr*g        (width sweep arm A)
  raw_f32_bat    batched-graph f32 + p-lr*g        (width sweep arm B)
  raw_bf16_bec   batched-graph via be_c + f32 upd  (width sweep arm C,
                                                    = production recipe)
  optstep_sgd    make_opt_step f32 vs bf16         (the router's arms)

If raw_bf16_bec reads ~46us here (matching mp_probe's own harness),
the payloads genuinely differ and the gap is inside make_opt_step;
if it reads ~34us, mp_probe.py's 240-step differential was within
tunnel jitter and the width sweep's flagship bf16 row is the artifact.

Run on the TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scratch/mp_cross.py
"""
from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402

import tensor_ops_tpu as T  # noqa: E402
from bench import make_data, make_net  # noqa: E402
from tensor_ops_tpu.backend.jax_backend import JaxBackend  # noqa: E402
from tensor_ops_tpu.models import cross_entropy, sgd  # noqa: E402
from tensor_ops_tpu.models.batched import batched_loss_graph  # noqa: E402
from tensor_ops_tpu.models.trainer import (  # noqa: E402
    _measure_mp_route, make_opt_step)
from tensor_ops_tpu.models.training import make_vmapped_grads  # noqa: E402
from tensor_ops_tpu.ops import ir  # noqa: E402

BATCH = 4096


def main():
    be = T.JaxBackend()
    be_c = JaxBackend(dtype=jnp.bfloat16)
    net = make_net(be)
    loss = cross_entropy(10)
    x, y = make_data(BATCH)
    xb, yb = jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)
    params = tuple(jnp.asarray(p, jnp.float32) for p in net.params)
    g = batched_loss_graph(net, loss, BATCH)
    assert g is not None
    vmapped = make_vmapped_grads(net, loss, be)
    out = {}

    def raw_vmap_f32(lr, xb, yb, *ps):
        _, grads = vmapped(xb, yb, *ps)
        return (0.0,) + tuple(p - lr * jnp.mean(gg, axis=0)
                              for p, gg in zip(ps, grads))

    def raw_bat_f32(lr, xb, yb, *ps):
        _, grads = ir.value_and_grad(g, be, (xb,) + ps + (yb,))
        return (0.0,) + tuple(p - lr * gg for p, gg in zip(ps, grads[1:-1]))

    def raw_bat_bf16(lr, xb, yb, *ps):
        lp = tuple(p.astype(jnp.bfloat16) for p in ps)
        _, grads = ir.value_and_grad(
            g, be_c, (xb.astype(jnp.bfloat16),) + lp
            + (yb.astype(jnp.bfloat16),))
        return (0.0,) + tuple(p - lr * gg.astype(jnp.float32)
                              for p, gg in zip(ps, grads[1:-1]))

    a, b = _measure_mp_route(raw_vmap_f32, raw_bat_bf16,
                             (0.02, xb, yb) + params, carry_from=3)
    out["raw_vmapf32_vs_bf16bec"] = dict(f32_us=round(a, 2),
                                         bf16_us=round(b, 2))
    print(json.dumps({"raw_vmapf32_vs_bf16bec":
                      out["raw_vmapf32_vs_bf16bec"]}), flush=True)

    a, b = _measure_mp_route(raw_bat_f32, raw_bat_bf16,
                             (0.02, xb, yb) + params, carry_from=3)
    out["raw_batf32_vs_bf16bec"] = dict(f32_us=round(a, 2),
                                        bf16_us=round(b, 2))
    print(json.dumps({"raw_batf32_vs_bf16bec":
                      out["raw_batf32_vs_bf16bec"]}), flush=True)

    opt = sgd()
    sf = make_opt_step(net, loss, be, opt, mixed_precision=False)
    sb = make_opt_step(net, loss, be, opt, mixed_precision=True)
    opt_state = opt.init(params)
    a, b = _measure_mp_route(sf, sb, (0.02, xb, yb, opt_state, params),
                             carry_from=3)
    out["optstep_sgd"] = dict(f32_us=round(a, 2), bf16_us=round(b, 2))
    print(json.dumps({"optstep_sgd": out["optstep_sgd"]}), flush=True)

    print(json.dumps(dict(tag="ALL", batch=BATCH, **out)))


if __name__ == "__main__":
    main()
