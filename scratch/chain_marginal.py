"""Where does the chained window's in-graph marginal go? (round 5)

The realized-fit decomposition puts the device-shuffled chained step at
~176 us/step while bench.py's fixed-batch fori_loop step reads ~34 us.
Both are single dispatches, so the delta is IN-GRAPH work.  Arms, all
lax.scan windows over the identical SGD flagship step (784/300/100/10,
batch 4096, 64k-row resident dataset), differential-timed:

  fixed      xb/yb constant (the headline's regime, scan not fori)
  pregather  xb = take(Xd, idxw[i]) with idxw precomputed ON device
  devidx     full in-graph index path (_device_window_indices)
  slicing    xb = dynamic_slice(Xshuf, ...) on a pre-shuffled dataset
             (the lower bound for any batch-selection scheme: pure
             contiguous reads, no gather)

Run serially on the TPU:  python scratch/chain_marginal.py
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

import tensor_ops_tpu as T  # noqa: E402
from tensor_ops_tpu.models import cross_entropy, sgd  # noqa: E402
from tensor_ops_tpu.models.trainer import (_device_window_indices,  # noqa: E402
                                           make_opt_step)
from bench import make_data, make_net  # noqa: E402

BATCH = 4096
N = 65536
SPE = N // BATCH


def diff_time(loop_fn, small=200, big=600, reps=4):
    loop_fn(small)
    loop_fn(big)
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter(); loop_fn(small); ws = time.perf_counter() - t0
        t0 = time.perf_counter(); loop_fn(big); wb = time.perf_counter() - t0
        walls.append((wb - ws) / (big - small))
    return min(walls) * 1e6


def main():
    be = T.JaxBackend()
    net = make_net(be)
    X, Y = make_data(N)
    Xd = jnp.asarray(X, jnp.float32)
    Yd = jnp.asarray(Y, jnp.float32)
    params = tuple(jnp.asarray(p, jnp.float32) for p in net.params)
    step = make_opt_step(net, cross_entropy(10), be, sgd())
    lr = jnp.float32(0.02)

    out = {}

    def scan_arm(name, get_batch, extra_args=()):
        @jax.jit
        def loop(steps_arr, params, *args):
            def body(carry, i):
                p = carry
                xb, yb = get_batch(i, *args)
                v, _, p = step(lr, xb, yb, (), p)
                return p, v

            p, vs = jax.lax.scan(body, params, steps_arr)
            return p, vs[-1]

        arrs = {}

        def loop_arr(k):
            if k not in arrs:
                arrs[k] = jnp.arange(k)
            return arrs[k]

        def loop_fn(k):
            p, v = loop(loop_arr(k), params, *extra_args)
            jax.block_until_ready(p)

        us = diff_time(loop_fn)
        out[name] = round(us, 2)
        print(json.dumps({name: out[name]}), flush=True)

    # fixed batch (headline regime, but scan + per-step loss output)
    xb0, yb0 = Xd[:BATCH], Yd[:BATCH]
    scan_arm("fixed", lambda i: (xb0, yb0))

    # gather by device-resident precomputed indices
    key = jax.random.key(0)
    idxw = jax.random.randint(key, (600, BATCH), 0, N, dtype=jnp.int32)
    scan_arm("pregather",
             lambda i, iw: (jnp.take(Xd, iw[i], axis=0),
                            jnp.take(Yd, iw[i], axis=0)),
             extra_args=(idxw,))

    # the SHIPPED device mode's structure: whole-window index block
    # computed once in-graph, scan gathers from it
    def window_loop_factory():
        compiled = {}

        def loop_fn(k):
            if k not in compiled:
                @jax.jit
                def loop(step0, params):
                    idxw = _device_window_indices(0, N, BATCH, SPE,
                                                  step0, k)

                    def body(carry, per):
                        p = carry
                        idx = per
                        xb = jnp.take(Xd, idx, axis=0)
                        yb = jnp.take(Yd, idx, axis=0)
                        v, _, p = step(lr, xb, yb, (), p)
                        return p, v

                    p, vs = jax.lax.scan(body, params, idxw)
                    return p, vs[-1]

                compiled[k] = loop
            p, v = compiled[k](jnp.int32(0), params)
            jax.block_until_ready(p)

        return loop_fn

    us = diff_time(window_loop_factory())
    out["devidx_window"] = round(us, 2)
    print(json.dumps({"devidx_window": out["devidx_window"]}), flush=True)

    # contiguous dynamic_slice on a pre-shuffled copy (lower bound)
    perm = jax.random.permutation(key, N)
    Xs, Ys = jnp.take(Xd, perm, axis=0), jnp.take(Yd, perm, axis=0)

    def slice_batch(i):
        o = (i % SPE) * BATCH
        return (jax.lax.dynamic_slice(Xs, (o, 0), (BATCH, Xs.shape[1])),
                jax.lax.dynamic_slice(Ys, (o, 0), (BATCH, Ys.shape[1])))

    scan_arm("slicing", slice_batch)

    # one whole-epoch gather, amortized: how fast IS the row gather?
    @jax.jit
    def epoch_gather(p):
        return jnp.take(Xd, p, axis=0).sum() + 0.0

    epoch_gather(perm)
    t0 = time.perf_counter()
    for _ in range(20):
        epoch_gather(perm).block_until_ready()
    us = (time.perf_counter() - t0) / 20 / SPE * 1e6
    out["whole_epoch_gather_per_step_us"] = round(us, 2)
    print(json.dumps({"whole_epoch_gather_per_step_us": out[
        "whole_epoch_gather_per_step_us"]}), flush=True)

    print(json.dumps(dict(tag="ALL", **out)))


if __name__ == "__main__":
    main()
