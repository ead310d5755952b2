"""Realized end-to-end fit() throughput at the flagship (VERDICT r4 #1).

Measures what a USER of fit() gets — wall-clock samples/s over the whole
production loop (loader, lr schedule, logging, snapshot rebind, optional
checkpointing), device-synced — next to bench.py's fori_loop step-rate
headline.  Two axes:

  * chained (chain_steps='auto', one dispatch per observation window)
    vs unchained (chain_steps=1, one dispatch per step);
  * observation cadence (log_every): through the axon tunnel every
    window boundary costs one ~25 ms round trip, which is an
    ENVIRONMENT constant, not framework work — so alongside the raw
    realized rates this probe fits   wall = a * steps + b * windows
    across the log_every sweep and reports a (the marginal per-step
    cost, comparable to the benched step rate) and b (the per-boundary
    overhead, = tunnel RTT + host bookkeeping) separately.

Flagship: 784->300->100->10, act_logistic/softmax, cross-entropy, SGD
lr=0.02, batch 4096 (the bench.py headline row), synthetic MNIST-shaped
data (64k rows, resident; chain auto-applies at 208 MB).

Run serially on the TPU (one process on the chip at a time):
    python scratch/fit_realized.py
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import tensor_ops_tpu as T  # noqa: E402
from tensor_ops_tpu.models import cross_entropy, fit, sgd  # noqa: E402

from bench import make_data, make_net  # noqa: E402  (repo-root bench.py)


def run(be, net0, X, Y, *, epochs, batch, log_every, chain_steps,
        checkpoint_path=None, checkpoint_every=0, metrics_path=None):
    """One warm fit() wall-clock: params start fresh each call (fit does
    not mutate net0), compiled steps are cached on net0.op._compiled."""
    t0 = time.perf_counter()
    res = fit(net0, cross_entropy(10), be, X, Y, epochs=epochs,
              batch_size=batch, lr=0.02, optimizer=sgd(),
              chain_steps=chain_steps, log_every=log_every,
              verbose=False, metrics_path=metrics_path,
              checkpoint_path=checkpoint_path,
              checkpoint_every=checkpoint_every)
    # device-sync: materialize the trained params
    for p in res.net.params:
        np.asarray(p)
    return time.perf_counter() - t0


def main():
    be = T.JaxBackend()
    net = make_net(be)
    n = 65536
    batch = 4096
    X, Y = make_data(n)
    steps_per_epoch = n // batch  # 16, exact — no ragged tail

    rows = []

    def measure(tag, *, epochs, log_every, chain_steps, reps=3, **kw):
        total_steps = epochs * steps_per_epoch
        # warmup (compile + loader caches) at tiny epochs, same shapes
        run(be, net, X, Y, epochs=1, batch=batch, log_every=log_every,
            chain_steps=chain_steps, **kw)
        wall = min(run(be, net, X, Y, epochs=epochs, batch=batch,
                       log_every=log_every, chain_steps=chain_steps, **kw)
                   for _ in range(reps))
        n_windows = (total_steps + log_every - 1) // log_every + 1
        row = dict(tag=tag, chain=chain_steps, log_every=log_every,
                   steps=total_steps, windows=n_windows, wall_s=round(wall, 3),
                   us_per_step=round(1e6 * wall / total_steps, 2),
                   samples_per_s=round(total_steps * batch / wall, 1))
        rows.append(row)
        print(json.dumps(row), flush=True)
        return wall

    # --- chained, log_every sweep (defaults first) ---
    sweep = []
    for le, ep in [(50, 800), (200, 800), (1000, 1600), (6400, 3200)]:
        w = measure(f"chain_auto_log{le}", epochs=ep, log_every=le,
                    chain_steps="auto")
        sweep.append((ep * steps_per_epoch, le, w))

    # --- fit wall = a*steps + b*windows least-squares over the sweep ---
    A = np.array([[s, (s + le - 1) // le + 1] for s, le, _ in sweep],
                 dtype=np.float64)
    wvec = np.array([w for _, _, w in sweep])
    (a, b), *_ = np.linalg.lstsq(A, wvec, rcond=None)
    decomp = dict(tag="decomposition",
                  marginal_us_per_step=round(1e6 * a, 2),
                  per_window_overhead_ms=round(1e3 * b, 2),
                  marginal_samples_per_s=round(batch / a, 1))
    print(json.dumps(decomp), flush=True)

    # --- unchained (one dispatch per step) at default cadence ---
    measure("unchained_log50", epochs=50, log_every=50, chain_steps=1)

    # --- chained + production extras: metrics JSONL + checkpoints ---
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        measure("chain_prod_ckpt1000_log200", epochs=800, log_every=200,
                chain_steps="auto", checkpoint_path=d + "/ck.npz",
                checkpoint_every=1000, metrics_path=d + "/m.jsonl")

    print(json.dumps(dict(tag="ALL", rows=rows, **decomp)))


if __name__ == "__main__":
    main()
