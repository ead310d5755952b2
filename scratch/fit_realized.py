"""Realized end-to-end fit() throughput at the flagship (VERDICT r4 #1).

Measures what a USER of fit() gets — wall-clock samples/s over the whole
production loop (loader, lr schedule, logging, snapshot rebind, optional
checkpointing), device-synced — next to bench.py's fori_loop step-rate
headline.  Axes:

  * chained (chain_steps='auto', one dispatch per observation window)
    vs unchained (chain_steps=1, one dispatch per step);
  * observation cadence (log_every): every window boundary costs one
    host round trip (through the axon tunnel that RTT is an ENVIRONMENT
    constant, not framework work), and every fit() call pays one
    dataset upload (~200 MB through the tunnel) — so alongside the raw
    realized rates this probe fits
        wall = a * steps + b * windows + c
    across a (log_every, epochs) grid and reports a (marginal per-step
    cost, comparable to the benched step rate), b (per-boundary
    overhead = RTT + host bookkeeping), and c (per-run constant =
    dataset upload + setup).

The grid REUSES window lengths across epoch counts (each distinct
window length k compiles a separate chained program — ~85 s each
through the tunnel, server-cached across processes), and the JAX
persistent compilation cache is enabled so reruns skip compiles.

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

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import tensor_ops_tpu as T  # noqa: E402
from tensor_ops_tpu.models import cross_entropy, fit, sgd  # noqa: E402

from bench import make_data, make_net  # noqa: E402  (repo-root bench.py)


def run(be, net0, X, Y, *, epochs, batch, log_every, chain_steps,
        chain_shuffle="host", checkpoint_path=None, checkpoint_every=0,
        metrics_path=None):
    """One warm fit() wall-clock: params start fresh each call (fit does
    not mutate net0), compiled steps are cached on net0.op._compiled."""
    t0 = time.perf_counter()
    res = fit(net0, cross_entropy(10), be, X, Y, epochs=epochs,
              batch_size=batch, lr=0.02, optimizer=sgd(),
              chain_steps=chain_steps, chain_shuffle=chain_shuffle,
              log_every=log_every,
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

    # the per-run constant's dominant part, measured alone: one 200 MB
    # host->HBM dataset upload through the tunnel
    xd = be.asarray(X)
    yd = be.asarray(Y)
    del xd, yd
    t0 = time.perf_counter()
    xd = be.asarray(X + 1.0)  # fresh buffer: no transfer cache
    yd = be.asarray(Y)
    np.asarray(xd[0, 0]); np.asarray(yd[0, 0])
    upload_s = time.perf_counter() - t0
    print(json.dumps(dict(tag="dataset_upload", seconds=round(upload_s, 2),
                          mb=round((X.nbytes + Y.nbytes) / 1e6, 1))),
          flush=True)
    del xd, yd

    rows = []

    def measure(tag, *, epochs, log_every, chain_steps, reps=2,
                chain_shuffle="host", **kw):
        total_steps = epochs * steps_per_epoch
        # warmup at the SAME (log_every, epochs-window set): epochs is a
        # multiple of log_every/steps_per_epoch below, so the warmup at
        # the smaller same-k epoch count introduces no new window length
        wall = min(run(be, net, X, Y, epochs=epochs, batch=batch,
                       log_every=log_every, chain_steps=chain_steps,
                       chain_shuffle=chain_shuffle, **kw)
                   for _ in range(reps + 1))  # first rep doubles as warmup
        n_windows = ((total_steps + log_every - 1) // log_every
                     + (1 if total_steps % log_every else 0) + 1)
        row = dict(tag=tag, chain=chain_steps, log_every=log_every,
                   steps=total_steps, windows=n_windows, wall_s=round(wall, 3),
                   us_per_step=round(1e6 * wall / total_steps, 2),
                   samples_per_s=round(total_steps * batch / wall, 1))
        rows.append(row)
        print(json.dumps(row), flush=True)
        return wall

    # --- chained: (log_every, epochs) grid, window lengths shared ----
    sweep = []
    for le, ep in [(50, 200), (50, 800),
                   (400, 200), (400, 800),
                   (3200, 400), (3200, 1600)]:
        w = measure(f"chain_auto_log{le}_ep{ep}", epochs=ep, log_every=le,
                    chain_steps="auto")
        sweep.append((ep * steps_per_epoch, le, w))

    # --- wall = a*steps + b*windows + c over the grid ---
    A = np.array([[s, s // le + 1, 1.0] for s, le, _ in sweep],
                 dtype=np.float64)
    wvec = np.array([w for _, _, w in sweep])
    (a, b, c), *_ = np.linalg.lstsq(A, wvec, rcond=None)
    decomp = dict(tag="decomposition",
                  marginal_us_per_step=round(1e6 * a, 2),
                  per_window_overhead_ms=round(1e3 * b, 2),
                  per_run_constant_s=round(c, 2),
                  marginal_samples_per_s=round(batch / a, 1))
    print(json.dumps(decomp), flush=True)

    # --- device-side shuffle (chain_shuffle='device'): zero host index
    # traffic — the same grid's corners, then the decomposition again ---
    dsweep = []
    for le, ep in [(50, 200), (50, 800),
                   (400, 200), (400, 800),
                   (3200, 400), (3200, 1600)]:
        w = measure(f"chain_dev_log{le}_ep{ep}", epochs=ep, log_every=le,
                    chain_steps="auto", chain_shuffle="device")
        dsweep.append((ep * steps_per_epoch, le, w))
    A = np.array([[s, s // le + 1, 1.0] for s, le, _ in dsweep],
                 dtype=np.float64)
    wvec = np.array([w for _, _, w in dsweep])
    (da, db, dc), *_ = np.linalg.lstsq(A, wvec, rcond=None)
    ddecomp = dict(tag="decomposition_device",
                   marginal_us_per_step=round(1e6 * da, 2),
                   per_window_overhead_ms=round(1e3 * db, 2),
                   per_run_constant_s=round(dc, 2),
                   marginal_samples_per_s=round(batch / da, 1))
    print(json.dumps(ddecomp), flush=True)

    # --- unchained (one dispatch per step) at default cadence ---
    measure("unchained_log50", epochs=25, log_every=50, chain_steps=1)

    # --- chained + production extras: metrics JSONL + checkpoints ---
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        measure("chain_prod_ckpt3200_log400", epochs=800, log_every=400,
                chain_steps="auto", checkpoint_path=d + "/ck.npz",
                checkpoint_every=3200, metrics_path=d + "/m.jsonl")
    with tempfile.TemporaryDirectory() as d:
        measure("dev_prod_ckpt3200_log400", epochs=800, log_every=400,
                chain_steps="auto", chain_shuffle="device",
                checkpoint_path=d + "/ck.npz",
                checkpoint_every=3200, metrics_path=d + "/m.jsonl")

    summary = dict(tag="ALL", rows=rows, upload_s=round(upload_s, 2),
                   host=decomp, device=ddecomp)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
