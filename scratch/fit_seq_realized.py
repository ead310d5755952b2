"""Realized end-to-end fit_sequences() throughput (VERDICT r4 #7).

The recurrent loop's jitted step already amortizes dispatch over the
whole sequence scan (n timesteps per dispatch) — but the first run of
this probe measured that amortization is NOT enough: the per-step
dispatch + 8.4 MB sequence-batch upload still dominated (realized rate
59% of the raw fori_loop step rate).  So fit_sequences grew the same
chaining fit() has (``chain_steps``/``chain_shuffle``), and this probe
now sweeps all four modes: wall-clock over the whole production loop
(loader shuffle, lr bookkeeping, logging, snapshot rebind),
device-synced, against the raw jitted-step rate of the same compiled
step.

Workload: Elman fully_connected stack 32 -> [512 logistic/logistic] ->
32, sequences of n=64 timesteps, batch 256, dual-rate SGD (the
reference's trainNetwork' semantics, Recurrent.hs:326-354) — a
mid-sized recurrent job whose step is ~ms-scale, so per-dispatch
overhead is visible if it matters.

Run serially on the TPU:  python scratch/fit_seq_realized.py
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import tensor_ops_tpu as T  # noqa: E402
from tensor_ops_tpu.models import (act_logistic, fit_sequences,  # noqa: E402
                                   squared_error)
from tensor_ops_tpu.models import recurrent as R  # noqa: E402
from tensor_ops_tpu.backend.rng import Rng  # noqa: E402

I = O = 32
HID = 512
SEQ = 64
BATCH = 256
NSEQ = 4096  # 16 steps/epoch


def make(be):
    return R.gen_net(be, I, O, [(HID, act_logistic(), act_logistic())],
                     act_logistic(), None, Rng(be, seed=7))


def main():
    be = T.JaxBackend()
    rng = np.random.default_rng(0)
    XS = rng.standard_normal((NSEQ, SEQ, I)).astype(np.float32)
    TS = rng.standard_normal((NSEQ, SEQ, O)).astype(np.float32)
    net = make(be)
    steps_per_epoch = NSEQ // BATCH  # 16

    def run(epochs, log_every, **kw):
        t0 = time.perf_counter()
        res = fit_sequences(net, squared_error(O), be, XS, TS,
                            epochs=epochs, batch_size=BATCH,
                            rate_state=0.01, rate_param=0.05,
                            log_every=log_every, verbose=False, **kw)
        for p in res.net.params:
            np.asarray(p)
        return time.perf_counter() - t0

    rows = []
    # (tag, fit kwargs, log_every, epochs): the unchained arm pays the
    # full per-step dispatch+upload so it gets fewer epochs — its
    # per-step rate converges immediately
    modes = [
        ("unchained", dict(chain_steps=1), 10, 6),
        ("chain_host", dict(chain_steps="auto", chain_shuffle="host"),
         10, 40),
        ("chain_device", dict(chain_steps="auto",
                              chain_shuffle="device"), 10, 40),
        ("chain_device_fixed", dict(chain_steps="auto",
                                    chain_shuffle="device_fixed"), 10, 40),
        ("chain_device_fixed_log100",
         dict(chain_steps="auto", chain_shuffle="device_fixed"), 100, 40),
    ]
    for tag, kw, log_every, epochs in modes:
        run(1, log_every, **kw)  # warmup: compile + caches
        wall = min(run(epochs, log_every, **kw) for _ in range(2))
        steps = epochs * steps_per_epoch
        row = dict(tag=tag, steps=steps, wall_s=round(wall, 3),
                   ms_per_step=round(1e3 * wall / steps, 3),
                   seqs_per_s=round(steps * BATCH / wall, 1),
                   timesteps_per_s=round(steps * BATCH * SEQ / wall, 1))
        rows.append(row)
        print(json.dumps(row), flush=True)

    # raw jitted-step rate of the SAME scan-BPTT step: a fori_loop over
    # the compiled one-batch step, no loader/logging/rebinding.
    import jax
    import jax.numpy as jnp
    from tensor_ops_tpu.models.trainer import _seq_train_step

    step = _seq_train_step(net, squared_error(O), be, SEQ)
    xb = jnp.asarray(XS[:BATCH])
    tb = jnp.asarray(TS[:BATCH])
    states = tuple(jnp.asarray(s) for s in net.states)
    params = tuple(jnp.asarray(p) for p in net.params)

    @jax.jit
    def loop(n, states, params):
        def body(i, c):
            st, pa = c
            _, st2, pa2 = step(0.01, 0.05, xb, tb, st, pa)
            return (st2, pa2)
        return jax.lax.fori_loop(0, n, body, (states, params))

    r = loop(3, states, params)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = loop(200, states, params)
    jax.block_until_ready(r)
    raw = (time.perf_counter() - t0) / 200
    raw_row = dict(tag="raw_fori_step", ms_per_step=round(1e3 * raw, 3),
                   seqs_per_s=round(BATCH / raw, 1),
                   timesteps_per_s=round(BATCH * SEQ / raw, 1))
    print(json.dumps(raw_row), flush=True)

    best = min(rows, key=lambda r: r["ms_per_step"])
    print(json.dumps(dict(tag="ALL", rows=rows, raw=raw_row,
                          realized_over_raw=round(
                              raw_row["ms_per_step"] / best["ms_per_step"],
                              4))))


if __name__ == "__main__":
    main()
